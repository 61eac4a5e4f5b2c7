"""Driver entry points stay healthy: the multichip dry run must execute on the
virtual 8-device mesh (entry() is full-size CvT-21 and is exercised by bench/driver
on the real chip instead)."""

import jax
import pytest


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    import __graft_entry__ as g

    g.dryrun_multichip(8)

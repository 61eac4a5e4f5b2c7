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


def test_bench_json_contract(monkeypatch, capsys):
    """bench.py must keep printing ONE final JSON line with the driver's keys
    (the driver records it as BENCH_r{N}.json) — exercised with run() stubbed
    so no device work happens."""
    import json
    import sys

    monkeypatch.syspath_prepend(__file__.rsplit("/tests/", 1)[0])
    import bench

    monkeypatch.setattr(bench, "run", lambda *a, **k: (42.0, 1.0))
    monkeypatch.setattr(bench, "cpu_baseline", lambda: 0.05)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline", "beam4_studies_per_sec",
                "beam4_ref_batch_studies_per_sec", "p50_study_latency_ms", "config"):
        assert key in data, key
    assert data["unit"] == "studies/sec" and data["value"] == 42.0

"""Auxiliary subsystems: multi-host init guard, monitor fallback, tracing."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_initialize_if_needed_single_host_noop(monkeypatch):
    from cxrmate_tpu.parallel import multihost

    calls = []
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setattr(jax.distributed, "initialize", lambda **kw: calls.append(kw))
    assert multihost.initialize_if_needed() is False
    assert calls == []  # the backend must not be touched on a single-host launch


def test_initialize_if_needed_with_coordinator(monkeypatch):
    from cxrmate_tpu.parallel import multihost

    calls = []
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    monkeypatch.setattr(jax.distributed, "initialize", lambda **kw: calls.append(kw))
    assert multihost.initialize_if_needed() is True
    assert calls == [{"coordinator_address": "localhost:1234"}]


def test_initialize_if_needed_idempotent(monkeypatch):
    """Repeated calls are detected by jax.distributed's global state, not by
    matching error text (a gRPC 'Address already in use' must propagate)."""
    from cxrmate_tpu.parallel import multihost

    def boom(**kw):
        raise AssertionError("initialize must not be called again")

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    from jax._src import distributed as jax_dist

    monkeypatch.setattr(jax_dist.global_state, "client", object(), raising=False)
    assert multihost.initialize_if_needed() is False  # no second init attempt


def test_initialize_if_needed_propagates_real_failures(monkeypatch):
    """Only the already-initialised error is idempotent; a real init failure
    (unreachable coordinator) must raise, not silently fall back to
    single-host (which would duplicate training across hosts)."""
    from cxrmate_tpu.parallel import multihost

    def boom(**kw):
        raise RuntimeError("connection to coordinator failed: UNAVAILABLE")

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "badhost:1")
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        multihost.initialize_if_needed()


def test_resolve_monitor_prefers_configured():
    from cxrmate_tpu.cli.stages import resolve_monitor

    scores = {"val_report_chexbert_f1_macro": 0.4, "val_report_nlg_cider": 1.0}
    value, key = resolve_monitor(scores, "val_report_chexbert_f1_macro")
    assert (value, key) == (0.4, "val_report_chexbert_f1_macro")


def test_resolve_monitor_falls_back_loudly():
    from cxrmate_tpu.cli.stages import resolve_monitor

    scores = {"val_report_nlg_cider": 1.25, "val_report_nlg_bleu_4": 0.3}
    with pytest.warns(RuntimeWarning, match="falling back to surrogate"):
        value, key = resolve_monitor(scores, "val_report_chexbert_f1_macro")
    assert (value, key) == (1.25, "val_report_nlg_cider")


def test_resolve_monitor_warns_when_unrankable():
    from cxrmate_tpu.cli.stages import resolve_monitor

    with pytest.warns(RuntimeWarning, match="UNRANKED"):
        value, key = resolve_monitor({}, "val_report_chexbert_f1_macro")
    assert (value, key) == (None, None)


def test_optional_warns_on_missing_zoo():
    from cxrmate_tpu.cli.config import TaskConfig
    from cxrmate_tpu.cli.stages import _optional, build_chexbert_fn

    task = TaskConfig(ckpt_zoo_dir="/nonexistent/zoo")
    with pytest.warns(RuntimeWarning, match="build_chexbert_fn unavailable"):
        assert _optional(build_chexbert_fn, task) is None


def test_tracing_annotate_and_profile(tmp_path):
    from cxrmate_tpu.utils.tracing import StepTimer, annotate, profile

    @jax.jit
    def f(x):
        return x * 2.0

    timer = StepTimer()
    log_dir = str(tmp_path / "trace")
    with profile(log_dir):
        with annotate("bench-iter"):
            with timer.measure(fence_value=f(jnp.ones((4,)))):
                out = f(jnp.ones((4,)))
    np.testing.assert_allclose(np.asarray(out), 2.0)
    assert timer.summary()["mean_s"] > 0
    assert os.path.isdir(log_dir) and any(os.scandir(log_dir))

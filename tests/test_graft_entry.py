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


def _stub_bench_sections(monkeypatch, bench):
    """Stub EVERY device/host-heavy bench section so main() runs instantly on
    the CPU test box — each new bench section MUST gain a stub here, or the
    contract tests fall through to the real (hours-long) implementation."""
    monkeypatch.setattr(bench, "run_train", lambda *a, **k: (0.115, 34.8, 2.6e12))
    monkeypatch.setattr(bench, "run_scst", lambda *a, **k: (0.175, 5.7))
    monkeypatch.setattr(bench, "run_scst_e2e", lambda *a, **k: (0.358, 2.8, object()))
    monkeypatch.setattr(bench, "build_jpeg_corpus", lambda *a, **k: ["stub.jpg"])
    monkeypatch.setattr(
        bench, "run_loader_only",
        lambda *a, **k: {"fast": 28.0, "train": 25.0, "eval_pil": 12.0,
                         "fast_cached": 9000.0})
    monkeypatch.setattr(
        bench, "run_input_pipeline",
        lambda *a, **k: {"cold": (12.4, 7.7), "cached": (41.4, 2.32)})
    monkeypatch.setattr(bench, "cpu_baseline", lambda: 0.05)


def test_bench_json_contract(monkeypatch, capsys):
    """bench.py must keep printing ONE final JSON line with the driver's keys
    (the driver records it as BENCH_r{N}.json) — exercised with every section
    stubbed so no device work happens."""
    import json
    import sys

    monkeypatch.syspath_prepend(__file__.rsplit("/tests/", 1)[0])
    import bench

    monkeypatch.setattr(bench, "run", lambda *a, **k: (42.0, 1.0))
    _stub_bench_sections(monkeypatch, bench)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline", "beam4_studies_per_sec",
                "beam4_ref_batch_studies_per_sec",
                "longitudinal_beam4_studies_per_sec",
                "train_step_ms", "train_studies_per_sec", "train_mfu",
                "greedy_fast_studies_per_sec", "greedy_fast_note",
                "greedy_q8_studies_per_sec", "greedy_q8_note",
                "scst_step_ms", "scst_studies_per_sec", "scst_b8_studies_per_sec",
                "scst_e2e_step_ms", "scst_e2e_studies_per_sec",
                "scst_e2e_b8_studies_per_sec", "scst_e2e_q8_b8_studies_per_sec",
                "input_bound_studies_per_sec", "input_cached_studies_per_sec",
                "loader_images_per_sec",
                "p50_study_latency_ms", "config"):
        assert key in data, key
    assert data["unit"] == "studies/sec" and data["value"] == 42.0
    assert data["train_step_ms"] == 115.0
    assert data["greedy_fast_studies_per_sec"] == 42.0
    assert data["scst_step_ms"] == 175.0
    assert data["scst_b8_studies_per_sec"] == 5.7
    assert data["scst_e2e_step_ms"] == 358.0  # stubbed: the real section is
    # full-size SCST + BERT-base reward — hours on the CPU test box
    assert data["input_bound_studies_per_sec"] == 12.4
    assert data["input_cached_studies_per_sec"] == 41.4
    assert data["loader_images_per_sec"] == 28.0
    assert "errors" not in data
    assert data["config"]["longitudinal_beam4_by_prompt_width"] is not None
    assert set(data["config"]["train_sweep_accum32"]) == {"4", "8", "16"}
    assert data["config"]["loader_images_per_sec_by_path"]["fast_cached"] == 9000.0


def test_bench_json_reports_section_failures(monkeypatch, capsys):
    """ADVICE r2: a failing bench section must surface — explicit errors field in
    the JSON + nonzero exit — never silently null metrics with exit 0."""
    import json
    import sys

    monkeypatch.syspath_prepend(__file__.rsplit("/tests/", 1)[0])
    import bench

    def flaky_run(*a, **k):
        if k.get("beam") or k.get("longitudinal_prompt_width") is not None:
            raise RuntimeError("beam decode regressed")
        return (42.0, 1.0)

    monkeypatch.setattr(bench, "run", flaky_run)
    _stub_bench_sections(monkeypatch, bench)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 1
    line = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(line)
    assert data["value"] == 42.0  # healthy sections still reported
    assert data["beam4_studies_per_sec"] is None
    assert any("beam decode regressed" in e for e in data["errors"])

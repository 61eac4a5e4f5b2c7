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
    monkeypatch.setattr(bench, "run_train", lambda *a, **k: (0.115, 34.8))
    monkeypatch.setattr(bench, "cpu_baseline", lambda: 0.05)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline", "beam4_studies_per_sec",
                "beam4_ref_batch_studies_per_sec",
                "longitudinal_beam4_studies_per_sec",
                "train_step_ms", "train_studies_per_sec",
                "p50_study_latency_ms", "config"):
        assert key in data, key
    assert data["unit"] == "studies/sec" and data["value"] == 42.0
    assert data["train_step_ms"] == 115.0
    assert "errors" not in data
    assert data["config"]["longitudinal_beam4_by_prompt_width"] is not None


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
    monkeypatch.setattr(bench, "run_train", lambda *a, **k: (0.115, 34.8))
    monkeypatch.setattr(bench, "cpu_baseline", lambda: 0.05)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 1
    line = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(line)
    assert data["value"] == 42.0  # healthy sections still reported
    assert data["beam4_studies_per_sec"] is None
    assert any("beam decode regressed" in e for e in data["errors"])

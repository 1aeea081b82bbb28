"""bench.py orchestration logic (the driver-captured perf artifact).

The parent process never imports jax; it probes backend availability in
subprocesses, retries with backoff, and must never mislabel a CPU
fallback measurement as an accelerator number. These tests stub the
subprocess layer — no backend is touched.
"""

import importlib.util
import json
import os
import subprocess
import sys
import types

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # no waiting in tests
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    monkeypatch.setenv("BENCH_WINDOW", "1")
    return mod


def _fake_run(stdout="", returncode=0, hang=False):
    def run(cmd, **kw):
        if hang:
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))
        return types.SimpleNamespace(returncode=returncode,
                                     stdout=stdout, stderr="")
    return run


def _capture_emit(mod):
    out = []
    mod._emit = out.append
    return out


def test_probe_parses_platform(bench, monkeypatch):
    monkeypatch.setattr(bench.subprocess, "run", _fake_run("axon 1\n"))
    res, err = bench._probe({}, 1.0)
    assert res == ("axon", 1) and err is None


def test_probe_hang_is_retryable_error(bench, monkeypatch):
    monkeypatch.setattr(bench.subprocess, "run", _fake_run(hang=True))
    res, err = bench._probe({}, 1.0)
    assert res is None and "hang" in err


def test_no_accelerator_emits_structured_error(bench, monkeypatch):
    monkeypatch.setattr(bench.subprocess, "run",
                        _fake_run("cpu 8\n"))
    out = _capture_emit(bench)
    assert bench.main() == 0
    (obj,) = out
    assert obj["value"] == 0.0 and obj["vs_baseline"] == 0.0
    assert "error" in obj and obj["attempts"]


def test_allow_cpu_accepts_cpu_measurement(bench, monkeypatch):
    monkeypatch.setenv("BENCH_ALLOW_CPU", "1")
    child = {"metric": "train_rays_per_sec_per_chip", "value": 9.0,
             "unit": "rays/s", "vs_baseline": 0.001, "platform": "cpu"}

    def run(cmd, **kw):
        if "--child" in cmd:
            return types.SimpleNamespace(
                returncode=0, stdout=json.dumps(child) + "\n", stderr="")
        return types.SimpleNamespace(returncode=0, stdout="cpu 8\n",
                                     stderr="")
    monkeypatch.setattr(bench.subprocess, "run", run)
    out = _capture_emit(bench)
    assert bench.main() == 0
    assert out[0]["platform"] == "cpu" and out[0]["value"] == 9.0


def test_child_cpu_fallback_is_rejected(bench, monkeypatch):
    """Probe sees the accelerator, but the tunnel drops before the
    measurement child runs: the child's own platform report (cpu) must
    veto the result instead of being emitted under the probe's label."""
    child = {"metric": "train_rays_per_sec_per_chip", "value": 9.0,
             "unit": "rays/s", "vs_baseline": 0.001, "platform": "cpu"}

    def run(cmd, **kw):
        if "--child" in cmd:
            return types.SimpleNamespace(
                returncode=0, stdout=json.dumps(child) + "\n", stderr="")
        return types.SimpleNamespace(returncode=0, stdout="axon 1\n",
                                     stderr="")
    monkeypatch.setattr(bench.subprocess, "run", run)
    out = _capture_emit(bench)
    assert bench.main() == 0
    (obj,) = out
    assert obj["value"] == 0.0
    assert "fell back to CPU" in obj["error"]


def test_accelerator_result_keeps_child_platform(bench, monkeypatch):
    child = {"metric": "train_rays_per_sec_per_chip", "value": 56349.0,
             "unit": "rays/s", "vs_baseline": 8.8, "platform": "axon"}

    def run(cmd, **kw):
        if "--child" in cmd:
            return types.SimpleNamespace(
                returncode=0, stdout="noise\n" + json.dumps(child) + "\n",
                stderr="")
        return types.SimpleNamespace(returncode=0, stdout="axon 1\n",
                                     stderr="")
    monkeypatch.setattr(bench.subprocess, "run", run)
    out = _capture_emit(bench)
    assert bench.main() == 0
    assert out[0]["platform"] == "axon"
    assert out[0]["value"] == 56349.0

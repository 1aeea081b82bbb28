"""Trace-capture subsystem (utils/profiling.py).

The reference has no profiling at all (SURVEY §5); this framework
wires jax.profiler trace windows into the training loop. These tests
run the real profiler on the CPU backend: start/stop around jitted
steps must produce a TensorBoard-compatible trace directory.
"""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from i2sdf_tpu.utils.profiling import TraceProfiler, annotate


def test_from_spec_parsing(tmp_path):
    p = TraceProfiler.from_spec(str(tmp_path), None)
    assert p.done and p.n_steps == 0
    p = TraceProfiler.from_spec(str(tmp_path), "100")
    assert p.start_step == 100 and p.n_steps == 5
    p = TraceProfiler.from_spec(str(tmp_path), "7:3")
    assert p.start_step == 7 and p.n_steps == 3
    assert p.logdir == os.path.join(str(tmp_path), "profile")


def test_disabled_profiler_is_noop(tmp_path):
    p = TraceProfiler(str(tmp_path))
    p.maybe_start(0)
    with p.step(0):
        pass
    p.maybe_stop(0)
    p.close()
    assert not os.path.isdir(os.path.join(str(tmp_path), "profile"))


def test_window_capture_writes_trace(tmp_path):
    f = jax.jit(lambda x: jnp.sin(x) @ jnp.cos(x).T)
    x = jnp.ones((64, 64))
    p = TraceProfiler(str(tmp_path), start_step=2, n_steps=2)
    out = None
    for step in range(6):
        p.maybe_start(step)
        assert p.active == (2 <= step < 4)
        with p.step(step):
            with annotate("unit_phase"):
                out = f(x)
        p.maybe_stop(step, wait_for=out)
    assert p.done and not p.active
    # jax writes plugins/profile/<run>/ with at least a .trace.json.gz
    traces = glob.glob(os.path.join(
        str(tmp_path), "profile", "plugins", "profile", "*", "*"))
    assert traces, "no trace files written"


def test_close_flushes_open_window(tmp_path):
    p = TraceProfiler(str(tmp_path), start_step=0, n_steps=100)
    p.maybe_start(0)
    assert p.active
    p.close(wait_for=jnp.ones(()))
    assert p.done and not p.active
    assert glob.glob(os.path.join(
        str(tmp_path), "profile", "plugins", "profile", "*", "*"))

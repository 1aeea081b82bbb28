"""On-device trace capture for the training loop.

The reference ships no profiling at all (SURVEY §5: "Tracing /
profiling: none" — only rich/tqdm progress UI,
`/root/reference/utils/__init__.py:12-18`). On TPU the profiler is the
primary instrument for finding HBM-bandwidth and kernel-launch
bottlenecks, so this framework treats it as a first-class subsystem:

- `TraceProfiler` captures a window of training steps with
  `jax.profiler.start_trace` / `stop_trace` into a
  TensorBoard-compatible directory (`<exp_dir>/profile/`), viewable
  with `tensorboard --logdir` (Profile tab / trace_viewer) or by
  loading the `.trace.json.gz` in Perfetto.
- Each step inside the window is wrapped in a
  `jax.profiler.StepTraceAnnotation`, so the trace viewer groups
  device work per training step; named host phases (bubble pdf init,
  validation) show up via `annotate()`.

Usage (wired into the CLI as `--profile START:COUNT`):

    prof = TraceProfiler(exp_dir, start_step=100, n_steps=5)
    for step in range(max_steps):
        prof.maybe_start(step)
        with prof.step(step):
            state, metrics = train_step(...)
        prof.maybe_stop(step, wait_for=state)
"""

from __future__ import annotations

import contextlib
import os

import jax


class TraceProfiler:
    """Captures `n_steps` training steps starting at `start_step`.

    Inactive (all methods no-ops) when `start_step` is None, so the
    trainer can hold one unconditionally.
    """

    def __init__(self, exp_dir: str, start_step: int | None = None,
                 n_steps: int = 5, logdir: str | None = None):
        self.start_step = start_step
        self.n_steps = max(int(n_steps), 1) if start_step is not None else 0
        self.logdir = logdir or os.path.join(exp_dir, "profile")
        self.active = False
        self.done = start_step is None

    @classmethod
    def from_spec(cls, exp_dir: str, spec: str | None) -> "TraceProfiler":
        """Parse the CLI `--profile` spec: "START:COUNT" or "START"
        (COUNT defaults to 5). Empty/None disables."""
        if not spec:
            return cls(exp_dir)
        parts = spec.split(":")
        start = int(parts[0])
        count = int(parts[1]) if len(parts) > 1 and parts[1] else 5
        return cls(exp_dir, start_step=start, n_steps=count)

    def maybe_start(self, step: int) -> None:
        if self.done or self.active or step < self.start_step:
            return
        os.makedirs(self.logdir, exist_ok=True)
        jax.profiler.start_trace(self.logdir)
        self.active = True
        print(f"[INFO] profiler: tracing steps "
              f"[{step}, {step + self.n_steps}) -> {self.logdir}")

    def step(self, step: int):
        """Context annotating one training step inside the window."""
        if not self.active:
            return contextlib.nullcontext()
        return jax.profiler.StepTraceAnnotation("train", step_num=step)

    def maybe_stop(self, step: int, wait_for=None) -> None:
        """Stop after the window; `wait_for` (any pytree of arrays) is
        blocked on first so the trace includes the device work of the
        final captured step, not just its dispatch."""
        if not self.active or step < self.start_step + self.n_steps - 1:
            return
        if wait_for is not None:
            jax.block_until_ready(wait_for)
        jax.profiler.stop_trace()
        self.active = False
        self.done = True
        print(f"[INFO] profiler: trace written to {self.logdir}")

    def close(self, wait_for=None) -> None:
        """Flush an open trace (e.g. training ended mid-window)."""
        if self.active:
            if wait_for is not None:
                jax.block_until_ready(wait_for)
            jax.profiler.stop_trace()
            self.active = False
            self.done = True


def annotate(name: str):
    """Named host-side phase annotation (shows in the trace viewer's
    host track): `with annotate("bubble_pdf_init"): ...`"""
    return jax.profiler.TraceAnnotation(name)

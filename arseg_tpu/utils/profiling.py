"""Tracing / profiling hooks (SURVEY.md §5).

The reference's only instrumentation is ad-hoc time.time() loops
(`model/pspnet.py:487-493`, `model/attention.py:65-70`); here we provide
structured equivalents: a jax.profiler trace context (view in XProf /
TensorBoard), a step timer that reports the north-star frames/sec/chip
metric, and annotate() for named trace regions.
"""

import contextlib
import json
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Capture a device trace under `log_dir` (open with xprof/tensorboard).

    with profiling.trace("/tmp/arseg-trace"):
        pipe(hr_params, lr_params, keyframe, frames, flows)
    """
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region in device traces (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock per-step timing with frames/sec reporting.

    Blocks on `sync` (a small output) per step; on the axon remote platform
    block_until_ready is unreliable, so callers pass an output leaf to
    host-transfer instead (see bench.py _sync).
    """

    def __init__(self, frames_per_step=1):
        self.frames_per_step = frames_per_step
        self.times = []
        self.frames = []
        self._t0 = None
        self._next_frames = None

    def step(self, frames):
        """Context for a step covering `frames` frames (variable-size steps,
        e.g. multi-GOP stacks + a single-GOP tail): `with timer.step(n): ...`"""
        self._next_frames = frames
        return self

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        self.frames.append(
            self.frames_per_step if self._next_frames is None else self._next_frames
        )
        self._next_frames = None

    @property
    def fps(self):
        if not self.times:
            return 0.0
        return sum(self.frames) / sum(self.times)

    def summary(self, skip_warmup=1):
        ts = self.times[skip_warmup:] or self.times
        fs = self.frames[skip_warmup:] or self.frames
        srt = sorted(ts)
        return {
            "steps": len(self.times),
            "mean_ms": 1e3 * sum(ts) / len(ts),
            "min_ms": 1e3 * min(ts),
            # serving-ops percentiles (per step = per GOP/stack dispatch;
            # warmup step excluded like the rest of the summary)
            "p50_ms": 1e3 * srt[len(srt) // 2],
            "p95_ms": 1e3 * srt[min(len(srt) - 1, int(len(srt) * 0.95))],
            "max_ms": 1e3 * max(ts),
            "frames_per_sec": sum(fs) / sum(ts),
        }

    def dump(self, path):
        with open(path, "w") as f:
            json.dump(self.summary(), f)

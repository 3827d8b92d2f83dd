"""Tracing and throughput observability.

The reference's only instrumentation is a featgen wall-clock print and
ESPnet tensorboard dirs (SURVEY.md §5). TPU-native equivalents: jax.profiler
trace capture around any block, named trace annotations, and a throughput
meter for utterances/sec / audio-seconds-per-second counters that the
trainer and CLIs can log.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation inside a trace."""
    return jax.profiler.TraceAnnotation(name)


class ThroughputMeter:
    """Accumulates items (utterances / frames / audio seconds) per second."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.time()
        self._items = 0.0
        self._audio_seconds = 0.0

    def update(self, items: float = 0.0, audio_seconds: float = 0.0):
        self._items += items
        self._audio_seconds += audio_seconds

    @property
    def elapsed(self):
        return time.time() - self._t0

    def rate(self):
        dt = max(self.elapsed, 1e-9)
        return {
            "items_per_sec": self._items / dt,
            "realtime_factor": self._audio_seconds / dt,
        }

    def summary(self):
        r = self.rate()
        return (
            f"{self._items:.0f} items in {self.elapsed:.1f}s "
            f"({r['items_per_sec']:.1f}/s, {r['realtime_factor']:.0f}x RT)"
        )

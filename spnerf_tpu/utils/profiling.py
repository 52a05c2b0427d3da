"""Tracing / profiling hooks.

The reference's only profiling is Lightning's `profiler="simple"` wall-time
summary (/root/reference/main.py:333). The TPU-native equivalents here:

  * `trace(logdir)` — context manager around `jax.profiler` traces, viewable in
    TensorBoard's profile plugin or Perfetto;
  * `StepTimer` — sustained rays/sec + ms/step over sliding windows, the number
    the bench harness reports;
  * `annotate(name)` — `jax.profiler.TraceAnnotation` wrapper so host-side
    phases (data prep, validation, DSM extraction) show up on the trace.
"""

import contextlib
import time


@contextlib.contextmanager
def trace(logdir):
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as exc:  # some remote backends cannot trace
        print(f"profiler trace unavailable: {exc}")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Sliding-window throughput: call tick(step, rays) at sync points."""

    def __init__(self):
        self._last_t = time.perf_counter()
        self._last_step = None

    def tick(self, step, rays_per_step):
        now = time.perf_counter()
        if self._last_step is None:
            self._last_step, self._last_t = step, now
            return None
        dsteps = step - self._last_step
        dt = now - self._last_t
        self._last_step, self._last_t = step, now
        if dsteps <= 0 or dt <= 0:
            return None
        return {
            "ms_per_step": dt / dsteps * 1000.0,
            "rays_per_sec": dsteps * rays_per_step / dt,
        }

"""
Tracing / profiling subsystem.

The reference's tracing story is TensorBoard scalars plus ad-hoc wall-clock timing
(SURVEY.md §5); the TPU-native equivalents here are:

- ``StepTimer``: per-step wall-clock statistics with device synchronization,
- ``trace()``: context manager around ``jax.profiler`` producing TensorBoard-viewable
  XLA traces,
- ``ScalarLog``: lightweight append-only scalar log (JSONL) usable from any trainer,
- ``compiled_stats()``: FLOPs / memory analysis of a jitted function via XLA's cost
  analysis.
"""
import contextlib
import json
import os
import time

import numpy as np


class StepTimer:
    """Wall-clock timing of train steps with percentile summaries.

    Synchronizes on a representative output (pass it to ``stop``) so asynchronous
    dispatch does not hide device time."""

    def __init__(self, warmup=2):
        self.warmup = warmup
        self.times = []
        self._t0 = None
        self._seen = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None):
        if sync_value is not None:
            import jax
            jax.block_until_ready(sync_value)
        elapsed = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(elapsed)
        return elapsed

    @contextlib.contextmanager
    def step(self):
        self.start()
        yield
        self.stop()

    def summary(self):
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            'steps': len(arr),
            'mean_s': float(arr.mean()),
            'p50_s': float(np.percentile(arr, 50)),
            'p95_s': float(np.percentile(arr, 95)),
            'steps_per_sec': float(1.0 / arr.mean()),
        }


@contextlib.contextmanager
def trace(log_dir='/tmp/ni_tpu_trace', host_tracer_level=2):
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class ScalarLog:
    """Append-only JSONL scalar log: one record per step ({step, name: value, ...}).
    The TPU build's stand-in for the reference's TensorBoard scalar summaries."""

    def __init__(self, filename):
        self.filename = filename
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        self._fh = open(filename, 'a')

    def log(self, step, **scalars):
        record = {'step': int(step)}
        for k, v in scalars.items():
            record[k] = float(np.asarray(v))
        self._fh.write(json.dumps(record) + '\n')
        self._fh.flush()

    def close(self):
        self._fh.close()

    @staticmethod
    def read(filename):
        with open(filename) as f:
            return [json.loads(line) for line in f if line.strip()]


def compiled_stats(fn, *args, **kwargs):
    """Compile a jittable fn and return XLA cost analysis (FLOPs, bytes accessed)
    plus compile memory stats when the backend reports them."""
    import jax
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    out = {}
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost:
            out['flops'] = cost.get('flops')
            out['bytes_accessed'] = cost.get('bytes accessed')
    except Exception:
        pass
    try:
        mem = compiled.memory_analysis()
        if mem is not None:
            out['temp_size_bytes'] = getattr(mem, 'temp_size_in_bytes', None)
            out['argument_size_bytes'] = getattr(mem, 'argument_size_in_bytes', None)
            out['output_size_bytes'] = getattr(mem, 'output_size_in_bytes', None)
    except Exception:
        pass
    return out

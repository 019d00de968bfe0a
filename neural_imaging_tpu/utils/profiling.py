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


# Peak dense-matmul throughput and HBM bandwidth per chip, keyed by substrings
# of jax `device_kind`. bf16 peaks (the MXU's native precision; f32 is emulated).
# Sources: public TPU spec sheets (v4: 275 TF, v5e: 197 TF / 819 GB/s,
# v5p: 459 TF, v6e: 918 TF).
_CHIP_PEAKS = {
    'v2': (46e12, 700e9),
    'v3': (123e12, 900e9),
    'v4': (275e12, 1228e9),
    'v5 lite': (197e12, 819e9),
    'v5e': (197e12, 819e9),
    'v5p': (459e12, 2765e9),
    'v5': (459e12, 2765e9),      # plain 'v5' after the lite variants
    'v6 lite': (918e12, 1640e9),
    'v6e': (918e12, 1640e9),
}


def chip_peaks(device=None):
    """(peak_bf16_flops_per_s, peak_hbm_bytes_per_s) for a device, or (None, None)
    when the chip is not in the table (e.g. CPU)."""
    import jax
    device = device or jax.devices()[0]
    kind = (device.device_kind or '').lower()
    for key, peaks in _CHIP_PEAKS.items():
        if key in kind:
            return peaks
    return None, None


def step_cost(jitted_or_fn, *args):
    """FLOPs + bytes accessed of one compiled step (XLA cost analysis). Works on
    an already-jitted function (reuses the compilation cache) or a plain fn."""
    import jax
    fn = jitted_or_fn
    if not hasattr(fn, 'lower'):
        fn = jax.jit(fn)
    compiled = fn.lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    cost = cost or {}
    return {'flops': cost.get('flops'), 'bytes_accessed': cost.get('bytes accessed')}


def utilization(flops_per_step, bytes_per_step, seconds_per_step, device=None):
    """Achieved MFU and HBM-bandwidth fraction vs the chip's peaks.

    Returns {} on chips without a peak entry. MFU uses the bf16 peak — the
    honest denominator on TPU, where every matmul the MXU runs is (multi-pass)
    bf16 regardless of the logical precision."""
    peak_flops, peak_bw = chip_peaks(device)
    out = {}
    if peak_flops and flops_per_step and seconds_per_step:
        out['mfu'] = flops_per_step / seconds_per_step / peak_flops
    if peak_bw and bytes_per_step and seconds_per_step:
        out['hbm_util'] = bytes_per_step / seconds_per_step / peak_bw
    return out


_DTYPE_BYTES = {'f64': 8, 's64': 8, 'u64': 8, 'f32': 4, 's32': 4, 'u32': 4,
                'bf16': 2, 'f16': 2, 's16': 2, 'u16': 2, 's8': 1, 'u8': 1,
                'pred': 1, 'f8e4m3fn': 1, 'f8e5m2': 1}


def _shape_bytes(shape_str):
    """Bytes of one HLO shape string, e.g. 'f32[20,256,256,3]{3,2,1,0}' or a
    tuple '(f32[8]{0}, bf16[2,2]{1,0})'. Token types (s32[]) count their scalar."""
    import re
    total = 0
    for dt, dims in re.findall(r'(\w+)\[([\d,]*)\]', shape_str):
        size = _DTYPE_BYTES.get(dt, 4)
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * size
    return total


def hlo_traffic(jitted_or_fn, *args, top=30):
    """Per-instruction HBM-traffic ranking of a compiled program.

    Parses the post-optimization HLO's ENTRY computation and scores every
    instruction by output bytes + operand bytes — a logical-traffic proxy that
    (post-fusion) approximates physical HBM reads/writes per instruction. Each
    entry carries the originating JAX op (HLO metadata op_name), so the ranking
    attributes bytes to model components. Returns a list of dicts sorted by
    bytes (descending), truncated to ``top``; aggregate totals ride on the
    first entry ('total_bytes', 'n_instructions').

    This is the "where do the 28 GB/step actually go" tool the roofline
    analysis in docs/benchmarks.md calls for — cost_analysis() gives only the
    aggregate."""
    import re

    import jax
    fn = jitted_or_fn
    if not hasattr(fn, 'lower'):
        fn = jax.jit(fn)
    compiled = fn.lower(*args).compile()
    text = compiled.as_text()

    # isolate the ENTRY computation (instructions elsewhere are fusion bodies —
    # VMEM-resident, not HBM traffic)
    m = re.search(r'^ENTRY [^{]*\{(.*?)^\}', text, re.S | re.M)
    if m is None:
        raise ValueError('Could not locate the ENTRY computation in the HLO')
    entry = m.group(1)

    # first pass: instruction name -> result shape
    inst_re = re.compile(
        r'^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^)]*\)|[\w]+\[[^\]]*\](?:\{[^}]*\})?))\s+'
        r'([\w\-]+)\(', re.M)
    shapes = {}
    for m2 in inst_re.finditer(entry):
        shapes[m2.group(1)] = m2.group(2)

    records = []
    total = 0
    for match in inst_re.finditer(entry):
        name, shape, opcode = match.groups()
        line_end = entry.find('\n', match.start())
        line = entry[match.start():line_end if line_end > 0 else None]
        out_bytes = _shape_bytes(shape)
        # operand bytes: resolve referenced instruction names. The operand list
        # starts exactly at the regex end (just past the opcode's '(') — layout
        # annotations like {1,0:T(8,128)} contain parens, so searching the line
        # for '(' is wrong.
        operands = 0
        oplist = entry[match.end():entry.find(')', match.end())]
        for ref in re.findall(r'%([\w.\-]+)', oplist):
            if ref in shapes and ref != name:
                operands += _shape_bytes(shapes[ref])
        if opcode in ('parameter', 'constant', 'get-tuple-element', 'tuple',
                      'bitcast'):
            continue  # aliases/bookkeeping, not traffic
        meta = re.search(r'op_name="([^"]*)"', line)
        records.append({'name': name, 'op': opcode,
                        'bytes': out_bytes + operands,
                        'out_bytes': out_bytes,
                        'op_name': meta.group(1) if meta else ''})
        total += out_bytes + operands

    records.sort(key=lambda r: -r['bytes'])
    out = records[:top]
    if out:
        out[0] = dict(out[0], total_bytes=total, n_instructions=len(records))
    return out


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

#!/usr/bin/env python3
"""
End-to-end config probe for the flagship step: times bench.py's exact loop
with one-knob overrides, so layout/precision hypotheses from the device trace
are tested on the REAL step (fusion context included), not isolated ops.

Usage: python bench_probe.py "{'nip_args': {'conv_precision': 'exact'}}" ...
Each positional arg is a dict of ManipulationClassification ctor overrides;
'baseline' runs the unmodified bench config.
"""
import ast
import json
import sys
import time

sys.path.insert(0, '.')

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax(cache_writes=False)  # reads only: a cache WRITE downloads the executable over the tunnel (runtime.py)

import jax
import numpy as np

BATCH, RAW_PATCH, WARMUP, ITERS, REPEATS = 20, 128, 3, 30, 3

BASE = dict(
    manipulations=['sharpen', 'resample', 'gaussian', 'jpeg'],
    distribution={'downsampling': 'pool:2', 'compression': 'jpeg',
                  'compression_params': {'quality': 50, 'codec': 'soft'}},
    fan_args={'dtype': 'bfloat16'},
    trainable={'nip'},
    raw_patch_size=RAW_PATCH,
    channel_dtype='bfloat16',
    nip_args={'conv_precision': 'exact'},
    channel_jpeg_dtype='bfloat16',
    manip_jpeg_dtype='bfloat16',
    pool_impl='flat')


def run(overrides):
    from neural_imaging_tpu.workflows import ManipulationClassification
    cfg = {**BASE}
    for k, v in overrides.items():
        if isinstance(v, dict) and isinstance(cfg.get(k), dict):
            cfg[k] = {**cfg[k], **v}
        else:
            cfg[k] = v
    flow = ManipulationClassification('INet', **cfg)
    flow.nan_check = False
    rng = np.random.default_rng(0)
    bx = jax.device_put(rng.random((BATCH, RAW_PATCH, RAW_PATCH, 4)).astype(np.float32))
    by = jax.device_put(rng.random((BATCH, 2 * RAW_PATCH, 2 * RAW_PATCH, 3)).astype(np.float32))
    from neural_imaging_tpu.utils.runtime import fetch_with_timeout
    for _ in range(WARMUP):
        loss, _ = flow.training_step(bx, by, lambda_nip=0.1, learning_rate=1e-4)
    jax.block_until_ready(loss)
    # real-fetch barrier: block_until_ready is not a trustworthy sync when the
    # tunnel downlink is wedged (see bench.py) — every window ends on a fetch
    if fetch_with_timeout(loss, timeout_s=120.0) is None:
        raise RuntimeError('downlink wedged: timing would be fiction')
    windows = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            loss, _ = flow.training_step(bx, by, lambda_nip=0.1, learning_rate=1e-4)
        if fetch_with_timeout(loss, timeout_s=300.0) is None:
            raise RuntimeError('downlink died mid-probe')
        windows.append(ITERS / (time.perf_counter() - t0))
    flow.assert_finite(timeout_s=20.0)  # downlink-tolerant (see workflow docstring)
    return max(windows), windows


def main():
    specs = sys.argv[1:] or ['baseline']
    for spec in specs:
        overrides = {} if spec == 'baseline' else ast.literal_eval(spec)
        try:
            best, windows = run(overrides)
            print(json.dumps({'overrides': spec, 'steps_per_sec': round(best, 2),
                              'windows': [round(w, 2) for w in windows]}),
                  flush=True)
        except Exception as e:
            print(json.dumps({'overrides': spec,
                              'error': f'{type(e).__name__}: {e}'}), flush=True)


if __name__ == '__main__':
    main()

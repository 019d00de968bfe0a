#!/usr/bin/env python3
"""
Extended benchmark suite covering the BASELINE.json tracked configs:

1. dJPEG round-trip throughput on Kodak-sized images (img/s)
2. NIP demosaicing throughput (INet and UNet, MP/s)
3. Joint NIP+dJPEG+FAN manipulation-classification training (steps/s)
4. DCN training step + bitstream codec throughput

Prints one JSON line per metric (the single-line flagship contract lives in
bench.py). Run on the target hardware: `python bench_suite.py`.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax(cache_writes=False)  # reads only: a cache WRITE downloads the executable over the tunnel (runtime.py)


def timeit(fn, *args, iters=20, warmup=3):
    """Time fn over distinct input variants: repeated identical calls can be
    deduplicated/cached by the runtime and report impossibly fast times."""
    import jax
    import jax.numpy as jnp
    variants = [tuple(jnp.asarray(a) * (1.0 - 0.001 * k) if hasattr(a, 'dtype')
                      and jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a
                      for a in args) for k in range(4)]
    for v in variants:
        out = fn(*v)
    jax.block_until_ready(out)
    outs = []
    t0 = time.perf_counter()
    for i in range(iters):
        outs.append(fn(*variants[i % 4]))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def emit(metric, value, unit, baseline=None):
    record = {'metric': metric, 'value': round(value, 3), 'unit': unit}
    if baseline:
        record['vs_baseline'] = round(value / baseline, 2)
    print(json.dumps(record), flush=True)


def bench_djpeg():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neural_imaging_tpu.compression.jpeg_helpers import jpeg_qtable
    from neural_imaging_tpu.models.jpeg import jpeg_forward

    rng = np.random.default_rng(0)
    # Kodak frame size (768x512), batch of 8
    x = jax.device_put(rng.random((8, 512, 768, 3)).astype(np.float32))
    ql = jnp.asarray(jpeg_qtable(50, 0))
    qc = jnp.asarray(jpeg_qtable(50, 1))
    fn = jax.jit(lambda v: jpeg_forward(v, ql, qc)[0])
    dt = timeit(fn, x)
    emit('dJPEG round-trip, Kodak 768x512 (QF50, soft rounding)', 8 / dt, 'img/s')


def bench_nip(cls_name='INet', **kwargs):
    import jax
    import numpy as np
    from neural_imaging_tpu.models import pipelines
    rng = np.random.default_rng(0)
    batch, p = 8, 256                      # 8 x 512x512 RGB output
    model = getattr(pipelines, cls_name)(patch_size=p, **kwargs)
    x = jax.device_put(rng.random((batch, p, p, 4)).astype(np.float32))
    dt = timeit(lambda v: model._jit_apply(model.params, v), x)
    mp = batch * (2 * p) * (2 * p) / 1e6
    emit(f'{cls_name} demosaicing throughput (512x512 outputs)', mp / dt, 'MP/s')


def bench_joint(nip='INet'):
    import jax
    import numpy as np
    from neural_imaging_tpu.workflows import ManipulationClassification
    flow = ManipulationClassification(
        nip, manipulations=['sharpen', 'resample', 'gaussian', 'jpeg'],
        distribution={'downsampling': 'pool:2', 'compression': 'jpeg',
                      'compression_params': {'quality': 50, 'codec': 'soft'}},
        fan_args={}, trainable={'nip'}, raw_patch_size=64)
    flow.nan_check = False
    rng = np.random.default_rng(0)
    bx = jax.device_put(rng.random((20, 64, 64, 4)).astype(np.float32))
    by = jax.device_put(rng.random((20, 128, 128, 3)).astype(np.float32))

    for _ in range(3):
        loss, _ = flow.training_step(bx, by, lambda_nip=0.1)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    iters = 30
    for _ in range(iters):
        loss, _ = flow.training_step(bx, by, lambda_nip=0.1)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    flow.assert_finite()  # after timing: each flag read is a host round trip
    emit(f'joint {nip}+dJPEG+FAN train step (batch 20, raw patch 64, 5 classes)',
         1 / dt, 'steps/s', baseline=2.0)


def bench_dcn():
    import jax
    import numpy as np
    from neural_imaging_tpu.compression import codec
    from neural_imaging_tpu.models.compression import TwitterDCN
    rng = np.random.default_rng(0)
    dcn = TwitterDCN(patch_size=128, n_features=32)
    x = jax.device_put(rng.random((16, 128, 128, 3)).astype(np.float32))

    for _ in range(3):
        out = dcn.training_step(x, 1e-4)
    jax.block_until_ready(out['entropy'])
    t0 = time.perf_counter()
    for _ in range(20):
        out = dcn.training_step(x, 1e-4)
    jax.block_until_ready(out['entropy'])
    emit('TwitterDCN-32C train step (batch 16, 128px)', 20 / (time.perf_counter() - t0),
         'steps/s')

    # real bitstream round trip (host vq + rANS + device decode)
    img = np.asarray(rng.random((1, 128, 128, 3)).astype(np.float32))
    codec.simulate_compression(img, dcn)  # warm
    t0 = time.perf_counter()
    for _ in range(10):
        codec.simulate_compression(img, dcn)
    emit('bitstream codec round trip (128px, 32C)', 10 / (time.perf_counter() - t0),
         'img/s')


if __name__ == '__main__':
    bench_djpeg()
    bench_nip('INet')
    bench_nip('UNet')
    bench_joint('INet')
    bench_joint('UNet')
    bench_dcn()

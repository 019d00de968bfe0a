#!/usr/bin/env python3
"""
Layout microbench: channels-LAST (NHWC, the current dataflow) vs
channels-FIRST (NCHW) for the flagship step's hot small-C ops.

Motivation (round-5 device trace, docs/trace_confirmation.json): the fixed
small-channel convolutions and their surrounding elementwise chains run at
~75 GB/s useful HBM bandwidth — 10% of the v5e's peak — because XLA assigns
(…, C)-minor tensors a T(8,128) tile that pads C=3→128 or 12→128, so ~10× of
every HBM access is padding. With W minor instead (NCHW), W=256 fills the 128
lanes exactly and C sits in sublanes (3→8 or 12→16 padding only).

Measures, fwd AND fwd+bwd, on the bench step's real shapes:
  1. 5x5 conv 3→3 f32 on (20,256,256)   — INet's demosaic conv
  2. 1x1 conv 12→12 + tanh chain        — INet's gamma stage
  3. depthwise 5x5 blur on (100,256,256,3) — the manipulation expansion
Each in: conv2d (MXU, HIGHEST), small_conv2d (VPU shift-add, NHWC),
and the NCHW shift-add variant.

Prints one JSON line per case; exits nonzero if NCHW doesn't win so the
integration decision stays measurement-gated.
"""
import functools
import json
import sys
import time

sys.path.insert(0, '.')

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax(cache_writes=False)  # reads only: a cache WRITE downloads the executable over the tunnel (runtime.py)

import jax
import jax.numpy as jnp
import numpy as np

from neural_imaging_tpu.ops import ops


def conv_chw(x, kernel, padding='SAME'):
    """Shift-add conv on channels-FIRST input (N, Cin, H, W) → (N, Cout, H, W).

    Same math as ops.small_conv2d (exact f32 VPU accumulation), but every
    slice/FMA runs on W-minor tiles with zero lane padding."""
    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    kernel = jnp.asarray(kernel, dtype=jnp.float32)
    kh, kw, cin, cout = kernel.shape
    if padding == 'SAME':
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        x = jnp.pad(x, ((0, 0), (0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw)))
    h = x.shape[2] - kh + 1
    w = x.shape[3] - kw + 1
    out = jnp.zeros((x.shape[0], cout, h, w), dtype=jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            patch = jax.lax.slice(x, (0, 0, dy, dx),
                                  (x.shape[0], cin, dy + h, dx + w))
            # contract Cin on the sublane-adjacent axis: (N,Cin,H,W),(Cin,Cout)
            out = out + jnp.einsum('nihw,io->nohw', patch, kernel[dy, dx],
                                   precision=jax.lax.Precision.HIGHEST)
    return out.astype(in_dtype)


def conv_chw_fma(x, kernel, padding='SAME'):
    """Channels-first shift-add conv with the Cin contraction as explicit
    scalar FMAs (no einsum/dot — nothing for XLA to re-layout onto the MXU)."""
    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    kernel = jnp.asarray(kernel, dtype=jnp.float32)
    kh, kw, cin, cout = kernel.shape
    if padding == 'SAME':
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        x = jnp.pad(x, ((0, 0), (0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw)))
    h = x.shape[2] - kh + 1
    w = x.shape[3] - kw + 1
    outs = []
    for co in range(cout):
        acc = jnp.zeros((x.shape[0], h, w), dtype=jnp.float32)
        for dy in range(kh):
            for dx in range(kw):
                patch = jax.lax.slice(x, (0, 0, dy, dx),
                                      (x.shape[0], cin, dy + h, dx + w))
                for ci in range(cin):
                    acc = acc + patch[:, ci] * kernel[dy, dx, ci, co]
        outs.append(acc)
    return jnp.stack(outs, axis=1).astype(in_dtype)


def time_fn(fn, *args, iters=30, repeats=3):
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def fwd_bwd(fn):
    def loss(*args):
        return jnp.sum(fn(*args) ** 2)
    return jax.grad(loss)


def report(case, variants, check_pairs=()):
    best = min(variants, key=lambda kv: kv[1])
    print(json.dumps({'case': case,
                      **{k: round(v, 3) for k, v in variants},
                      'winner': best[0]}))
    return best[0]


def main():
    rng = np.random.default_rng(0)
    results = {}

    # --- case 1: INet 5x5 conv, 3->3, f32, (20,256,256) -----------------------
    x_hwc = jnp.asarray(rng.random((20, 256, 256, 3)), jnp.float32)
    x_chw = jnp.transpose(x_hwc, (0, 3, 1, 2))
    k = jnp.asarray(rng.random((5, 5, 3, 3)), jnp.float32) * 0.1

    mxu = functools.partial(ops.conv2d, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(conv_chw(x_chw, k)),
                               np.transpose(np.asarray(ops.small_conv2d(x_hwc, k)),
                                            (0, 3, 1, 2)), rtol=0, atol=1e-4)

    for tag, wrap in (('fwd', lambda f: f), ('fwd+bwd', fwd_bwd)):
        results[f'conv5x5_3to3/{tag}'] = report(f'conv5x5_3to3/{tag}', [
            ('mxu_nhwc', time_fn(wrap(lambda x: mxu(x, k)), x_hwc)),
            ('vpu_nhwc', time_fn(wrap(lambda x: ops.small_conv2d(x, k)), x_hwc)),
            ('vpu_nchw', time_fn(wrap(lambda x: conv_chw(x, k)), x_chw)),
            ('vpu_nchw_fma', time_fn(wrap(lambda x: conv_chw_fma(x, k)), x_chw)),
        ])

    # --- case 2: gamma stage 1x1 12->12 + tanh --------------------------------
    g_hwc = jnp.asarray(rng.random((20, 256, 256, 12)), jnp.float32)
    g_chw = jnp.transpose(g_hwc, (0, 3, 1, 2))
    k1 = jnp.asarray(rng.random((1, 1, 12, 12)), jnp.float32) * 0.3

    def gamma_hwc(x):
        return jnp.tanh(ops.small_conv2d(x, k1))

    def gamma_chw(x):
        return jnp.tanh(conv_chw(x, k1))

    def gamma_mxu(x):
        return jnp.tanh(mxu(x, k1))

    for tag, wrap in (('fwd', lambda f: f), ('fwd+bwd', fwd_bwd)):
        results[f'gamma1x1_12/{tag}'] = report(f'gamma1x1_12/{tag}', [
            ('mxu_nhwc', time_fn(wrap(gamma_mxu), g_hwc)),
            ('vpu_nhwc', time_fn(wrap(gamma_hwc), g_hwc)),
            ('vpu_nchw', time_fn(wrap(gamma_chw), g_chw)),
            ('vpu_nchw_fma', time_fn(wrap(lambda x: jnp.tanh(conv_chw_fma(x, k1))), g_chw)),
        ])

    # --- case 3: depthwise 5x5 blur on the expanded batch ---------------------
    m_hwc = jnp.asarray(rng.random((100, 256, 256, 3)), jnp.float32)
    m_chw = jnp.transpose(m_hwc, (0, 3, 1, 2))
    g1d = jnp.asarray(rng.random(5), jnp.float32)
    kd = jnp.einsum('i,j->ij', g1d, g1d)
    kd_full = jnp.zeros((5, 5, 3, 3), jnp.float32).at[:, :, [0, 1, 2], [0, 1, 2]] \
        .set(kd[:, :, None])

    for tag, wrap in (('fwd', lambda f: f), ('fwd+bwd', fwd_bwd)):
        results[f'blur5x5_depthwise/{tag}'] = report(f'blur5x5_depthwise/{tag}', [
            ('mxu_nhwc', time_fn(wrap(lambda x: mxu(x, kd_full)), m_hwc)),
            ('vpu_nhwc', time_fn(wrap(lambda x: ops.small_conv2d(x, kd_full)), m_hwc)),
            ('vpu_nchw', time_fn(wrap(lambda x: conv_chw(x, kd_full)), m_chw)),
            ('vpu_nchw_dw', time_fn(wrap(lambda x: sum(
                jax.lax.slice(jnp.pad(x, ((0,0),(0,0),(2,2),(2,2))), (0,0,dy,dx),
                              (x.shape[0], x.shape[1], dy+x.shape[2], dx+x.shape[3]))
                * kd[dy, dx] for dy in range(5) for dx in range(5))), m_chw)),
        ])

    # --- transpose overhead: what a one-shot relayout costs -------------------
    t_in = time_fn(lambda x: jnp.transpose(x, (0, 3, 1, 2)), x_hwc)
    t_out = time_fn(lambda x: jnp.transpose(x, (0, 2, 3, 1)), m_chw)
    print(json.dumps({'case': 'transpose_cost_ms',
                      'nhwc_to_nchw_20x256': round(t_in, 3),
                      'nchw_to_nhwc_100x256': round(t_out, 3)}))

    wins = sum(1 for v in results.values() if v == 'vpu_nchw')
    print(json.dumps({'summary': 'nchw_wins', 'cases_won': wins,
                      'cases_total': len(results)}))


if __name__ == '__main__':
    main()

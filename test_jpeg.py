#!/usr/bin/env python3
"""
Compare the differentiable JPEG codec against libjpeg: PSNR/SSIM scatter over a QF
sweep and visual side-by-sides (parity with the reference test_jpeg.py, which
produced docs/dJPEG.png).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax()

import numpy as np


def main():
    parser = argparse.ArgumentParser(description='dJPEG vs libJPEG comparison')
    parser.add_argument('--dir', dest='data_dir', default=None,
                        help='directory with test images (default: procedural batch)')
    parser.add_argument('--images', type=int, default=4)
    parser.add_argument('--rounding', default='soft', choices=['soft', 'sin', 'harmonic'])
    parser.add_argument('--out', default=None, help='output figure path')
    parser.add_argument('--qmin', type=int, default=10)
    parser.add_argument('--qmax', type=int, default=95)
    parser.add_argument('--step', type=int, default=5)
    args = parser.parse_args()

    from neural_imaging_tpu.compression import jpeg_helpers
    from neural_imaging_tpu.data import fixtures, loading
    from neural_imaging_tpu.models.jpeg import JPEG
    from neural_imaging_tpu.utils import metrics, plots

    if args.data_dir:
        files, _ = loading.discover_images(args.data_dir, n_images=-1, v_images=0)
        batch = loading.load_images(files[:args.images], args.data_dir, load='y')['y']
        batch = batch.astype(np.float32) / 255.0
        h, w = (batch.shape[1] // 8) * 8, (batch.shape[2] // 8) * 8
        batch = batch[:, :h, :w]
    else:
        batch = fixtures.kodak_like_batch(n=args.images, height=256, width=384)

    codec = JPEG(50, args.rounding)
    qfs = list(range(args.qmin, args.qmax + 1, args.step))
    rows = []
    for qf in qfs:
        soft = np.asarray(codec.process(batch, qf))
        hard, _ = jpeg_helpers.compress_batch(batch, qf)
        psnr_soft = float(np.mean(metrics.psnr(batch, soft)))
        psnr_hard = float(np.mean(metrics.psnr(batch, hard)))
        rows.append((qf, psnr_soft, psnr_hard))
        print(f'QF {qf:3d}: dJPEG {psnr_soft:6.2f} dB | libJPEG {psnr_hard:6.2f} dB | '
              f'Δ {psnr_soft - psnr_hard:+.2f}')

    fig, axes = plots.sub(2, figwidth=12, ncols=2)
    qf_arr = [r[0] for r in rows]
    axes[0].plot(qf_arr, [r[1] for r in rows], 'o-', label=f'dJPEG ({args.rounding})')
    axes[0].plot(qf_arr, [r[2] for r in rows], 's-', label='libJPEG')
    axes[0].set_xlabel('JPEG quality'); axes[0].set_ylabel('PSNR [dB]'); axes[0].legend()
    axes[1].plot([r[2] for r in rows], [r[1] for r in rows], '.')
    lims = [min(r[2] for r in rows) - 1, max(r[2] for r in rows) + 1]
    axes[1].plot(lims, lims, 'k:')
    axes[1].set_xlabel('libJPEG PSNR [dB]'); axes[1].set_ylabel('dJPEG PSNR [dB]')

    out = args.out or 'djpeg_vs_libjpeg.png'
    plots.save_figure(fig, out)
    print(f'figure -> {out}')


if __name__ == '__main__':
    main()

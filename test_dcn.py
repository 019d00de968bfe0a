#!/usr/bin/env python3
"""
Inspect trained DCN codecs: latent histograms + reconstructions ('batch' mode),
side-by-side comparisons against libjpeg matched by SSIM or bpp
('jpeg-match-ssim' / 'jpeg-match-bpp'), and R/D trade-off tables ('rate-dist').
Parity with the reference test_dcn.py.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax()

import numpy as np


def load_batch(args):
    from neural_imaging_tpu.data import fixtures, loading
    if args.data:
        files, _ = loading.discover_images(args.data, n_images=-1, v_images=0)
        batch = loading.load_images(files[:args.images], args.data, load='y')['y']
        batch = batch.astype(np.float32) / 255.0
    else:
        batch = fixtures.kodak_like_batch(n=args.images, height=256, width=256)
    h = (batch.shape[1] // 8) * 8
    w = (batch.shape[2] // 8) * 8
    return batch[:, :h, :w]


def mode_batch(dcn, batch, args):
    from neural_imaging_tpu.compression import codec as codec_mod
    from neural_imaging_tpu.utils import plots, stats
    batch_z = np.asarray(dcn.compress(batch))
    batch_y, st = codec_mod.compress_n_stats(batch, dcn)

    fig, axes = plots.sub(2 * len(batch) + 1, figwidth=16)
    for i in range(len(batch)):
        plots.image(batch[i], 'input', axes=axes[2 * i])
        ssim_i = np.atleast_1d(st['ssim'])[i] if len(batch) > 1 else st['ssim']
        bpp_i = np.atleast_1d(st['bpp'])[i] if len(batch) > 1 else st['bpp']
        plots.image(batch_y[i], f'ssim {ssim_i:.3f} / {bpp_i:.2f} bpp',
                    axes=axes[2 * i + 1])
    axes[-1].hist(batch_z.reshape(-1), bins=dcn.get_codebook().shape[0] * 2)
    axes[-1].set_title(f'latent histogram (H={stats.entropy(batch_z, dcn.get_codebook()):.2f})')
    out = args.out or f'dcn_batch_{dcn.n_features}c.png'
    plots.save_figure(fig, out)
    print(f'figure -> {out}')
    print({k: np.round(np.mean(v), 3) for k, v in st.items()})


def mode_jpeg_match(dcn, batch, args, match):
    from neural_imaging_tpu.compression import codec as codec_mod, jpeg_helpers
    from neural_imaging_tpu.utils import metrics, plots
    rows = []
    fig, axes = plots.sub(3 * len(batch), figwidth=16, ncols=3)
    for i, img in enumerate(batch):
        recon, nbytes = codec_mod.simulate_compression(img[None], dcn)
        dcn_ssim = metrics.ssim(img, recon[0])
        dcn_bpp = 8 * nbytes / (img.shape[0] * img.shape[1])
        target = dcn_ssim if match == 'ssim' else dcn_bpp
        qf = jpeg_helpers.match_quality(img, target=target, match=match)
        jimg, jbytes = jpeg_helpers.compress_batch(img, qf)
        j_ssim = metrics.ssim(img, jimg)
        j_bpp = 8 * jbytes / (img.shape[0] * img.shape[1])
        rows.append((i, dcn_ssim, dcn_bpp, qf, j_ssim, j_bpp))
        plots.image(img, 'input', axes=axes[3 * i])
        plots.image(recon[0], f'DCN {dcn_ssim:.3f} @ {dcn_bpp:.2f} bpp', axes=axes[3 * i + 1])
        plots.image(jimg, f'JPEG q{qf} {j_ssim:.3f} @ {j_bpp:.2f} bpp', axes=axes[3 * i + 2])
        print(f'image {i}: DCN ssim {dcn_ssim:.3f} @ {dcn_bpp:.2f} bpp | '
              f'JPEG q{qf} ssim {j_ssim:.3f} @ {j_bpp:.2f} bpp')
    out = args.out or f'dcn_vs_jpeg_{match}.png'
    plots.save_figure(fig, out)
    print(f'figure -> {out}')


def mode_rate_dist(dcn, batch, args):
    from neural_imaging_tpu.compression import codec as codec_mod
    from neural_imaging_tpu.utils import metrics
    import pandas as pd
    rows = []
    for i, img in enumerate(batch):
        recon, nbytes = codec_mod.simulate_compression(img[None], dcn)
        rows.append({'image_id': i, 'codec': dcn.model_code,
                     'ssim': metrics.ssim(img, recon[0]),
                     'psnr': metrics.psnr(img, recon[0]),
                     'bpp': 8 * nbytes / (img.shape[0] * img.shape[1])})
    df = pd.DataFrame(rows)
    print(df.to_string(index=False))
    if args.out:
        df.to_csv(args.out, index=False)
        print(f'table -> {args.out}')


def main():
    parser = argparse.ArgumentParser(description='Inspect trained DCN codecs')
    parser.add_argument('mode', choices=['batch', 'jpeg-match-ssim', 'jpeg-match-bpp',
                                         'rate-dist'])
    parser.add_argument('--dcn', default='32c', help='model dir or preset name')
    parser.add_argument('--data', default=None)
    parser.add_argument('--images', type=int, default=4)
    parser.add_argument('--out', default=None)
    args = parser.parse_args()

    from neural_imaging_tpu.compression import codec as codec_mod
    dcn = codec_mod.restore(args.dcn)
    batch = load_batch(args)

    if args.mode == 'batch':
        mode_batch(dcn, batch, args)
    elif args.mode == 'jpeg-match-ssim':
        mode_jpeg_match(dcn, batch, args, 'ssim')
    elif args.mode == 'jpeg-match-bpp':
        mode_jpeg_match(dcn, batch, args, 'bpp')
    else:
        mode_rate_dist(dcn, batch, args)


if __name__ == '__main__':
    main()

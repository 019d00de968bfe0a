#!/usr/bin/env python3
"""
Develop validation images (or a single RAW file) with a trained ISP and report
PSNR/SSIM (parity with the reference test_nip.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax()

import numpy as np


def main():
    parser = argparse.ArgumentParser(description='Test a trained NIP')
    parser.add_argument('--nip', default='INet')
    parser.add_argument('--cam', default='D90')
    parser.add_argument('--data', default=None)
    parser.add_argument('--model-dir', default=None,
                        help='trained model dir (default: data/models/nip/<cam>/<code>)')
    parser.add_argument('--raw', default=None, help='develop a single RAW file instead')
    parser.add_argument('--patch', type=int, default=64)
    parser.add_argument('--images', type=int, default=4)
    parser.add_argument('--out', default=None, help='output figure path')
    args = parser.parse_args()

    from neural_imaging_tpu.models import base, pipelines
    from neural_imaging_tpu.utils import metrics, plots

    if args.model_dir:
        model = base.restore(args.model_dir, pipelines, patch_size=None)
    else:
        model = getattr(pipelines, args.nip)(patch_size=None)
        candidate = os.path.join('data/models/nip', args.cam, model.model_code,
                                 model.scoped_name)
        if os.path.isdir(candidate):
            model.load_model(candidate)
        else:
            print(f'(no checkpoint at {candidate}; using the initialized model)')

    if args.raw:
        from neural_imaging_tpu.data import raw as raw_mod
        stack, cfa, cam2srgb, _ = raw_mod.unpack(args.raw)
        developed = np.asarray(model.process(stack[None].astype(np.float32)))[0]
        out = args.out or os.path.splitext(args.raw)[0] + f'_{model.class_name}.png'
        import imageio.v2 as imageio
        imageio.imwrite(out, (np.clip(developed, 0, 1) * 255).astype(np.uint8))
        print(f'developed -> {out}')
        return

    from neural_imaging_tpu.data.dataset import Dataset
    data = Dataset(args.data or args.cam, n_images=0, v_images=-1,
                   val_rgb_patch_size=2 * args.patch, val_n_patches=1)
    vx, vy = data.next_validation_batch(0, min(args.images, data.count_validation))
    developed = np.asarray(model.process(vx)).clip(0, 1)

    fig, axes = plots.sub(len(vx), figwidth=16)
    for i in range(len(vx)):
        psnr = metrics.psnr(vy[i], developed[i])
        ssim = metrics.ssim(vy[i], developed[i])
        plots.image(np.concatenate([vy[i], developed[i]], axis=1),
                    f'{psnr:.1f} dB / {ssim:.3f}', axes=axes[i])
        print(f'patch {i}: {psnr:.2f} dB / SSIM {ssim:.3f}')
    out = args.out or f'nip_validation_{model.class_name}.png'
    plots.save_figure(fig, out)
    print(f'figure -> {out}')


if __name__ == '__main__':
    main()

#!/usr/bin/env python3
"""
A/B comparison of two ISP models on the same inputs, with difference maps and FFT
spectra (parity with the reference diff_nip.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax()

import numpy as np


def load_model(spec, cam):
    from neural_imaging_tpu.models import base, pipelines
    if os.path.isdir(spec):
        return base.restore(spec, pipelines, patch_size=None)
    model = getattr(pipelines, spec)(patch_size=None)
    candidate = os.path.join('data/models/nip', cam, model.model_code, model.scoped_name)
    if os.path.isdir(candidate):
        model.load_model(candidate)
    return model


def main():
    parser = argparse.ArgumentParser(description='A/B compare two ISPs')
    parser.add_argument('--a', required=True, help='model A: class name or checkpoint dir')
    parser.add_argument('--b', default=None, help='model B: class name or checkpoint dir')
    parser.add_argument('--cam', default='D90')
    parser.add_argument('--data', default=None)
    parser.add_argument('--patch', type=int, default=128)
    parser.add_argument('--image', type=int, default=0)
    parser.add_argument('--extras', action='store_true', help='include FFT spectra')
    parser.add_argument('--out', default='diff_nip.png')
    args = parser.parse_args()

    from neural_imaging_tpu.data.dataset import Dataset
    from neural_imaging_tpu.utils import imdiff, plots

    data = Dataset(args.data or args.cam, n_images=0, v_images=-1,
                   val_rgb_patch_size=2 * args.patch, val_n_patches=1)
    vx, vy = data.next_validation_batch(args.image, 1)

    model_a = load_model(args.a, args.cam)
    out_a = np.asarray(model_a.process(vx))[0]
    out_b = None
    if args.b:
        model_b = load_model(args.b, args.cam)
        out_b = np.asarray(model_b.process(vx))[0]

    fig = imdiff.compare_ab_ref(vy[0], out_a, out_b, extras=args.extras)
    plots.save_figure(fig, args.out, dpi=150)
    print(f'figure -> {args.out}')


if __name__ == '__main__':
    main()

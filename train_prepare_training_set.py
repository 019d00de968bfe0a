#!/usr/bin/env python3
"""
Prepare RAW→RGB training pairs.

Parity with the reference train_prepare_training_set.py: RAW files (camera files
when libRAW/rawpy is present, or synthetic ``*.nraw.npz`` containers) are unpacked
into uint16 RGGB ``*.npy`` stacks and developed into ``*.png`` targets via either
the automatic pipeline or the from-scratch Python pipeline. Additionally supports
``--synthesize N`` to generate a fully synthetic training set on machines without
camera data.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import imageio.v2 as imageio
import numpy as np

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax()

from neural_imaging_tpu.utils.utils import logger, setup_logging

RAW_EXTENSIONS = ('.nef', '.dng', '.cr2', '.arw', '.raf', '.nraw.npz')


def main():
    parser = argparse.ArgumentParser(description='Prepare RAW→RGB training pairs')
    parser.add_argument('--dir', dest='data_dir', default=None,
                        help='directory with RAW files')
    parser.add_argument('--out', default=None, help='output directory (default: in place)')
    parser.add_argument('--dev', default='auto', choices=['auto', 'manual'],
                        help='development pipeline: libRAW-auto or the scratch pipeline')
    parser.add_argument('--synthesize', type=int, default=0,
                        help='generate N synthetic RAW/RGB pairs instead of reading files')
    parser.add_argument('--height', type=int, default=512)
    parser.add_argument('--width', type=int, default=768)
    parser.add_argument('--seed', type=int, default=2023)
    parser.add_argument('--cfa', default='GBRG')
    args = parser.parse_args()

    setup_logging()
    out_dir = args.out or args.data_dir
    if out_dir is None:
        parser.error('Either --dir or --out (with --synthesize) is required')
    os.makedirs(out_dir, exist_ok=True)

    if args.synthesize > 0:
        from neural_imaging_tpu.data import fixtures
        fixtures.make_dataset(out_dir, n_images=args.synthesize, height=args.height,
                              width=args.width, seed=args.seed, cfa_pattern=args.cfa)
        logger.info('Synthesized %d RAW/RGB pairs in %s', args.synthesize, out_dir)
        return

    from neural_imaging_tpu.data import bayer, raw

    files = sorted(f for f in os.listdir(args.data_dir)
                   if f.lower().endswith(RAW_EXTENSIONS))
    if not files:
        logger.warning('No RAW files found in %s', args.data_dir)
        return

    for filename in files:
        path = os.path.join(args.data_dir, filename)
        stem = filename
        for ext in RAW_EXTENSIONS:
            if stem.lower().endswith(ext):
                stem = stem[:-len(ext)]
                break

        stack, cfa, cam2srgb, cam_mul = raw.unpack(path)
        # keep only landscape-like orientation consistent with the reference filter
        if stack.shape[0] > stack.shape[1]:
            logger.info('skipping portrait-oriented %s', filename)
            continue

        np.save(os.path.join(out_dir, stem + '.npy'),
                np.clip(stack * (2 ** 16 - 1), 0, 2 ** 16 - 1).round().astype(np.uint16))

        if args.dev == 'auto':
            rgb = raw.process_auto(path)
        else:
            rgb = (255 * raw.process(path, demosaicing='bilinear',
                                     brightness=None)).round().astype(np.uint8)
        imageio.imwrite(os.path.join(out_dir, stem + '.png'), rgb)
        logger.info('%s -> %s.npy + %s.png', filename, stem, stem)


if __name__ == '__main__':
    main()

#!/usr/bin/env python3
"""
Batch-develop RAW images via the automatic pipeline, the from-scratch Python
pipeline, or a trained neural ISP (parity with the reference develop_images.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax()

import imageio.v2 as imageio
import numpy as np

from neural_imaging_tpu.utils.utils import logger, setup_logging

RAW_EXTENSIONS = ('.nef', '.dng', '.cr2', '.arw', '.raf', '.nraw.npz')


def main():
    parser = argparse.ArgumentParser(description='Batch-develop RAW images')
    parser.add_argument('--dir', dest='data_dir', required=True)
    parser.add_argument('--out', default=None)
    parser.add_argument('--pipeline', default='auto',
                        help="'auto', 'manual', or a NIP class (INet/UNet/DNet/ClassicISP)")
    parser.add_argument('--model-dir', default=None, help='trained NIP checkpoint dir')
    parser.add_argument('--cam', default=None, help='camera name for NIP checkpoints')
    parser.add_argument('--devices', default=None,
                        help="spatially shard full-resolution NIP development over "
                             "devices: an int, 'auto' (all local devices) or "
                             "'none' (default) — the image height axis is split "
                             "over the mesh; XLA inserts the conv halo exchanges")
    args = parser.parse_args()

    setup_logging()
    from neural_imaging_tpu.data import raw as raw_mod
    out_dir = args.out or args.data_dir
    os.makedirs(out_dir, exist_ok=True)

    files = sorted(f for f in os.listdir(args.data_dir)
                   if f.lower().endswith(RAW_EXTENSIONS))
    if not files:
        logger.warning('No RAW files found in %s', args.data_dir)
        return

    # Spatial sharding for full-resolution neural development: one image's rows
    # split across the mesh (parallel/mesh.py::spatial_sharding). This is the
    # production consumer of the 2-D ('data','space') mesh — full-res RAWs are
    # the one input whose activations outgrow a single chip's HBM.
    spatial_mesh = None
    if args.devices not in (None, 'none') and args.pipeline not in ('auto', 'manual'):
        import jax
        from jax.sharding import Mesh
        n = len(jax.devices()) if args.devices == 'auto' else int(args.devices)
        if n > 1:
            # images are developed one at a time → all devices on the 'space'
            # (image height) axis
            spatial_mesh = Mesh(np.array(jax.devices()[:n]).reshape(1, n),
                                ('data', 'space'))
            logger.info('Spatially sharding development over %d devices', n)

    model = None
    if args.pipeline not in ('auto', 'manual'):
        from neural_imaging_tpu.models import pipelines
        model = getattr(pipelines, args.pipeline)(patch_size=None)
        ckpt = args.model_dir
        if ckpt is None and args.cam:
            ckpt = os.path.join('data/models/nip', args.cam, model.model_code,
                                model.scoped_name)
        if ckpt and os.path.isdir(ckpt):
            model.load_model(ckpt)
        else:
            logger.warning('no checkpoint found — developing with the initialized model')

    for filename in files:
        path = os.path.join(args.data_dir, filename)
        stem = filename
        for ext in RAW_EXTENSIONS:
            if stem.lower().endswith(ext):
                stem = stem[:-len(ext)]
                break
        suffix = args.pipeline if model is None else model.class_name

        if args.pipeline == 'auto':
            rgb = raw_mod.process_auto(path)
        elif args.pipeline == 'manual':
            rgb = (255 * raw_mod.process(path, demosaicing='bilinear',
                                         brightness=None)).round().astype(np.uint8)
        else:
            stack, *_ = raw_mod.unpack(path)
            batch = stack[None].astype(np.float32)
            out_h = 2 * batch.shape[1]  # NIPs upsample the Bayer stack 2x
            if spatial_mesh is not None:
                import jax
                from neural_imaging_tpu.parallel.mesh import spatial_sharding
                n = spatial_mesh.shape['space']
                pad = (-batch.shape[1]) % n  # equal shards along the height axis
                if pad:
                    batch = np.pad(batch, ((0, 0), (0, pad), (0, 0), (0, 0)),
                                   mode='reflect')
                batch = jax.device_put(batch, spatial_sharding(spatial_mesh))
            developed = np.asarray(model.process(batch))[0, :out_h]
            rgb = (np.clip(developed, 0, 1) * 255).round().astype(np.uint8)

        out_path = os.path.join(out_dir, f'{stem}_{suffix}.png')
        imageio.imwrite(out_path, rgb)
        logger.info('%s -> %s', filename, out_path)


if __name__ == '__main__':
    main()

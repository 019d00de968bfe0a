#!/usr/bin/env python3
"""
Joint optimization of the full acquisition/distribution/forensics workflow.

CLI parity with the reference train_manipulation.py: --nip, --cam, channel spec
(--jpeg Q | --dcn model, --ds), --train nip dcn, λ sweeps --ln/--lc, repetitions
--start/--end, --manip list, --split/--patch/--epochs.
"""
import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax()

from neural_imaging_tpu.utils.utils import setup_logging
from train_nip import parse_json_arg, parse_split


def main():
    parser = argparse.ArgumentParser(description='Joint workflow optimization')
    parser.add_argument('--nip', default='UNet')
    parser.add_argument('--cam', dest='cameras', action='append', default=None,
                        help='camera/dataset name (repeat for multiple cameras)')
    parser.add_argument('--data', default=None)
    parser.add_argument('--loss', dest='loss_metric', default='L2',
                        choices=['L2', 'L1', 'SSIM'], help='NIP loss metric')
    parser.add_argument('--scratch', action='store_true',
                        help='train the NIP from scratch (skip pre-trained weights)')
    parser.add_argument('--jpeg_mode', default='soft',
                        choices=['soft', 'sin', 'harmonic'],
                        help='dJPEG rounding approximation for the channel')
    parser.add_argument('--split', default='120:30:4')
    parser.add_argument('--epochs', type=int, default=1001)
    parser.add_argument('--patch', type=int, default=64, help='RAW patch size')
    parser.add_argument('--batch', type=int, default=10)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--dir', default='./data/m', help='output root')
    parser.add_argument('--nip-dir', default='./data/models/nip', help='NIP snapshots root')
    parser.add_argument('--jpeg', default=None,
                        help='JPEG channel: quality Q or range Q1,Q2')
    parser.add_argument('--jpeg-trainable', action='store_true',
                        help="make the channel JPEG's quantization tables "
                             "trainable; optimize them with --train dcn "
                             "(the generic trainable-codec slot) weighted by "
                             "--lc. Beyond-reference: the reference CLI only "
                             "exposes trainable DCN codecs")
    parser.add_argument('--dcn', default=None, help='DCN channel: model dir / preset')
    parser.add_argument('--ds', default='pool', choices=['pool', 'bilinear', 'none'],
                        help='channel downsampling')
    parser.add_argument('--train', nargs='*', default=[],
                        help='components to fine-tune: nip dcn')
    parser.add_argument('--ln', nargs='*', type=float, default=[0.1],
                        help='NIP regularization λ sweep')
    parser.add_argument('--lc', nargs='*', type=float, default=[0.1],
                        help='DCN regularization λ sweep')
    parser.add_argument('--start', type=int, default=0, help='first repetition')
    parser.add_argument('--end', type=int, default=1, help='last repetition (exclusive)')
    parser.add_argument('--manip', default=None,
                        help='comma-separated manipulations, e.g. sharpen:1,gaussian')
    parser.add_argument('--fan', default=None, help='JSON with FAN hyper-params')
    parser.add_argument('--augment', action='store_true')
    parser.add_argument('--channel-dtype', default='float32',
                        choices=['float32', 'bfloat16'],
                        help='distribution-channel compute dtype (bfloat16 halves '
                             'HBM traffic at large patches; losses stay f32)')
    parser.add_argument('--channel-jpeg-dtype', default=None,
                        choices=['float32', 'bfloat16'],
                        help='channel dJPEG compute dtype; bfloat16 runs the '
                             'channel codec at DEFAULT matmul precision '
                             '(default: f32 at HIGHEST — oracle parity)')
    parser.add_argument('--manip-jpeg-dtype', default=None,
                        choices=['float32', 'bfloat16'],
                        help="same trade for the 'jpeg' MANIPULATION branch, "
                             'which runs at full pre-pooling resolution '
                             '(default: f32 at HIGHEST — oracle parity)')
    parser.add_argument('--nip-params', default=None,
                        help="JSON with NIP constructor kwargs, e.g. "
                             "\"{'conv_precision': 'high'}\"")
    parser.add_argument('--val-schedule', type=int, default=50)
    parser.add_argument('--overwrite', action='store_true')
    parser.add_argument('--device-data', action='store_true',
                        help='upload the full training set to HBM once and '
                             'sample patches in-graph (fastest single-chip path)')
    parser.add_argument('--nan-check', action='store_true',
                        help='check gradients for NaNs on every step (debug; '
                             'forces a per-step host sync — the default defers '
                             'the check to validation boundaries)')
    from neural_imaging_tpu.parallel.train import add_cli_args, from_cli_args
    add_cli_args(parser)
    args = parser.parse_args()

    setup_logging()
    parallel = from_cli_args(args, batch_size=args.batch)

    from neural_imaging_tpu.data.dataset import Dataset
    from neural_imaging_tpu.training.manipulation import train_manipulation_nip
    from neural_imaging_tpu.workflows import ManipulationClassification

    # distribution channel spec
    if args.dcn is not None:
        distribution = {'downsampling': args.ds, 'compression': 'dcn',
                        'compression_params': {'dirname': args.dcn}}
    elif args.jpeg is not None:
        quality = ([int(q) for q in args.jpeg.split(',')] if ',' in args.jpeg
                   else int(args.jpeg))
        if args.jpeg_trainable and (not isinstance(quality, int)
                                    or args.jpeg_mode == 'libjpeg'):
            parser.error('--jpeg-trainable needs a scalar --jpeg quality (the '
                         'tables initialize from it) and a differentiable '
                         '--jpeg_mode (soft/sin/harmonic)')
        distribution = {'downsampling': args.ds, 'compression': 'jpeg',
                        'compression_params': {'quality': quality,
                                               'codec': args.jpeg_mode,
                                               'trainable': args.jpeg_trainable}}
    else:
        distribution = {'downsampling': args.ds, 'compression': 'none'}

    trainable = set(args.train)
    manipulations = args.manip.split(',') if args.manip else None
    fan_args = parse_json_arg(args.fan)
    nip_params = parse_json_arg(args.nip_params)

    n_images, v_images, val_n_patches = parse_split(args.split)
    load = 'y' if args.nip == 'ONet' else 'xy'
    cameras = args.cameras or ['D90']
    ln_sweep = args.ln if 'nip' in trainable else [0.0]
    lc_sweep = args.lc if 'dcn' in trainable else [0.0]

    for cam in cameras:
      data = Dataset(args.data or cam, load=load, n_images=n_images,
                     v_images=v_images, val_rgb_patch_size=2 * args.patch,
                     val_n_patches=val_n_patches)

      flow = None
      for run, ln, lc in itertools.product(range(args.start, args.end), ln_sweep, lc_sweep):
        print(f'\n# {cam} run {run}: λ_nip={ln} λ_dcn={lc} trainable={sorted(trainable)}')
        if flow is None:
            flow = ManipulationClassification(
                args.nip, manipulations=manipulations, distribution=distribution,
                fan_args=fan_args, trainable=trainable, raw_patch_size=args.patch,
                loss_metric=args.loss_metric, channel_dtype=args.channel_dtype,
                nip_args=nip_params, channel_jpeg_dtype=args.channel_jpeg_dtype,
                manip_jpeg_dtype=args.manip_jpeg_dtype)
        else:
            # sweep points share the flow's compiled programs (λ and lr are
            # traced arguments); only the trainable state resets
            flow.reinitialize()

        training = {
            'camera_name': cam,
            'use_pretrained_nip': args.nip != 'ONet' and not args.scratch,
            'patch_size': args.patch,
            'batch_size': args.batch,
            'n_epochs': args.epochs,
            'learning_rate': args.lr,
            'lambda_nip': ln,
            'lambda_dcn': lc,
            'run_number': run,
            'augment': args.augment,
            'validation_schedule': args.val_schedule,
        }
        train_manipulation_nip(flow, training, data,
                               directories={'root': args.dir,
                                            'nip_snapshots': args.nip_dir},
                               overwrite=args.overwrite, parallel=parallel,
                               nan_check=args.nan_check,
                               device_data=args.device_data)


if __name__ == '__main__':
    main()

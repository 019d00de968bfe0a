#!/usr/bin/env python3
"""
Train learned compression codecs (DCNs).

CLI parity with the reference train_dcn.py: scenario tables via --param_list
(config/twitter.csv), --split, patch/batch/epochs and output control.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax()

from neural_imaging_tpu.utils.utils import setup_logging
from train_nip import get_scenarios, parse_json_arg, parse_split


def main():
    parser = argparse.ArgumentParser(description='Train learned compression (DCN)')
    parser.add_argument('--data', default='data/rgb/native12k/')
    parser.add_argument('--split', default='200:50:1')
    parser.add_argument('--epochs', type=int, default=500)
    parser.add_argument('--patch', type=int, default=64, help='RGB patch size')
    parser.add_argument('--batch', type=int, default=50)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--out', default='./data/models/dcn/playground')
    parser.add_argument('--params', default=None, help='JSON with model hyper-parameters')
    parser.add_argument('--param_list', default=None, help='CSV scenario table')
    parser.add_argument('--group', type=int, default=None, help='run_group filter for the CSV')
    parser.add_argument('--val-schedule', type=int, default=50)
    parser.add_argument('--overwrite', action='store_true')
    parser.add_argument('--dry', action='store_true')
    parser.add_argument('--device-data', action='store_true',
                        help='upload the training set to HBM once; scanned '
                             'chunks with in-graph sampling + augmentations')
    from neural_imaging_tpu.parallel.train import add_cli_args, from_cli_args
    add_cli_args(parser)
    args = parser.parse_args()

    setup_logging()
    parallel = from_cli_args(args, batch_size=args.batch)

    from neural_imaging_tpu.data.dataset import Dataset
    from neural_imaging_tpu.models.compression import TwitterDCN
    from neural_imaging_tpu.training.compression import train_dcn

    if args.param_list:
        scenarios = get_scenarios(args.param_list, run_group=args.group)
    else:
        scenarios = [parse_json_arg(args.params)]

    n_images, v_images, val_n_patches = parse_split(args.split)
    data = None

    for params in scenarios:
        params = {k: v for k, v in params.items() if v == v}  # drop NaN cells
        print(f'\n# Scenario: TwitterDCN {params}')
        if args.dry:
            continue
        if data is None:
            data = Dataset(args.data, load='y', n_images=n_images, v_images=v_images,
                           val_rgb_patch_size=args.patch, val_n_patches=val_n_patches)
        dcn = TwitterDCN(patch_size=args.patch, **params)
        train_dcn(dcn,
                  {'n_epochs': args.epochs, 'batch_size': args.batch,
                   'patch_size': args.patch, 'learning_rate': args.lr,
                   'validation_schedule': args.val_schedule},
                  data, directory=args.out, overwrite=args.overwrite,
                  parallel=parallel, device_data=args.device_data)


if __name__ == '__main__':
    main()

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
    parser.add_argument('--dcn', default='TwitterDCN',
                        help='DCN class name (models.compression; ref train_dcn.py:38)')
    parser.add_argument('--params', default=None, help='JSON with model hyper-parameters')
    parser.add_argument('--param_list', default=None, help='CSV scenario table')
    parser.add_argument('--group', type=int, default=None, help='run_group filter for the CSV')
    parser.add_argument('--val-schedule', type=int, default=50)
    parser.add_argument('--overwrite', action='store_true')
    parser.add_argument('--resume', action='store_true',
                        help='continue a previous run: npz weights + orbax '
                             'optimizer state + epoch counter (ref train_dcn.py:55)')
    parser.add_argument('--fill', default=None,
                        help="results table output: '-' prints the scenario table "
                             "with ssim/loss/entropy columns, '<path>.csv' saves "
                             "it (ref train_dcn.py:61)")
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
    from neural_imaging_tpu.models import compression as compression_models
    from neural_imaging_tpu.training.compression import train_dcn

    dcn_cls = getattr(compression_models, args.dcn, None)
    if dcn_cls is None or not isinstance(dcn_cls, type) or \
            not issubclass(dcn_cls, compression_models.DCN):
        print(f'Unknown DCN class: {args.dcn}')
        sys.exit(1)

    if args.fill is not None and args.fill != '-' and not args.fill.endswith('.csv'):
        print(f"--fill must be '-' or a .csv path, got {args.fill}")
        sys.exit(1)

    if args.param_list:
        scenarios = get_scenarios(args.param_list, run_group=args.group)
    else:
        scenarios = [parse_json_arg(args.params)]

    n_images, v_images, val_n_patches = parse_split(args.split)
    data = None
    results_rows = []

    for params in scenarios:
        params = {k: v for k, v in params.items() if v == v}  # drop NaN cells
        print(f'\n# Scenario: {args.dcn} {params}')
        if args.dry:
            continue
        if data is None:
            data = Dataset(args.data, load='y', n_images=n_images, v_images=v_images,
                           val_rgb_patch_size=args.patch, val_n_patches=val_n_patches)
        dcn = dcn_cls(patch_size=args.patch, **params)
        train_dcn(dcn,
                  {'n_epochs': args.epochs, 'batch_size': args.batch,
                   'patch_size': args.patch, 'learning_rate': args.lr,
                   'validation_schedule': args.val_schedule},
                  data, directory=args.out, overwrite=args.overwrite,
                  parallel=parallel, device_data=args.device_data,
                  resume=args.resume)

        if args.fill is not None:
            # append the trained model's final metrics to the scenario row
            # (ref train_dcn.py:180-189)
            import json as json_mod
            row = dict(params)
            row['model_code'] = dcn.model_code
            progress = os.path.join(args.out, dcn.model_code, dcn.scoped_name,
                                    'progress.json')
            if os.path.isfile(progress):
                with open(progress) as f:
                    perf = json_mod.load(f)['codec']['performance']
                row['ssim'] = (perf['ssim']['validation'] or [float('nan')])[-1]
                row['loss'] = (perf['loss']['validation'] or [float('nan')])[-1]
                row['entropy'] = (perf['entropy']['training'] or [float('nan')])[-1]
            results_rows.append(row)

    if args.fill is not None and results_rows:
        import pandas as pd
        table = pd.DataFrame(results_rows)
        if args.fill == '-':
            print('\n# Training Results')
            print(table.to_string())
        else:
            print(f'Saving the results table to {args.fill}')
            table.to_csv(args.fill, index=False)


if __name__ == '__main__':
    main()

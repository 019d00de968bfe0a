#!/usr/bin/env python3
"""
Train camera ISP models (NIPs).

CLI parity with the reference train_nip.py: --cam/--nip/--split/--epochs/--patch/
--out/--resume/--dry, JSON hyper-params via --params, CSV hyper-param scenarios via
--hp, and ClassicISP camera-config injection.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax()

from neural_imaging_tpu.utils.utils import match_option, setup_logging


def parse_json_arg(text):
    """Parse a JSON CLI argument tolerating single quotes."""
    if text is None:
        return {}
    return json.loads(text.replace("'", '"'))


def parse_split(split):
    """'n:v:p' → (n_images, v_images, val_n_patches)."""
    parts = [int(x) for x in split.split(':')]
    while len(parts) < 3:
        parts.append(1)
    return tuple(parts[:3])


def get_scenarios(csv_path, run_group=None):
    """Load hyper-param scenarios from a CSV table (columns map to model args;
    an 'active' column selects rows; a 'run_group' column sub-selects via
    --group, ref train_nip.py:70,99-104; '@'-prefixed cells are evaluated)."""
    import pandas as pd
    df = pd.read_csv(csv_path)
    if run_group is not None:
        if 'run_group' not in df.columns:
            raise ValueError(f'--group given but {csv_path} has no run_group column')
        df = df[df['run_group'] == run_group]
    if 'active' in df.columns:
        df = df[df['active'] != 0]
    scenarios = []
    for _, row in df.iterrows():
        params = {}
        for key, value in row.items():
            if key in ('active', 'run_group'):
                continue
            if isinstance(value, str) and value.startswith('@'):
                value = eval(value[1:])  # noqa: S307 - explicit scenario-table escape
            params[key] = value
        scenarios.append(params)
    return scenarios


def main():
    parser = argparse.ArgumentParser(description='Train camera ISPs (NIP models)')
    parser.add_argument('--nip', default='INet', help='NIP model class')
    parser.add_argument('--cam', default='D90', help='camera / dataset name')
    parser.add_argument('--data', default=None, help='explicit data directory')
    parser.add_argument('--split', default='120:30:1', help='n_images:v_images:v_patches')
    parser.add_argument('--epochs', type=int, default=10000)
    parser.add_argument('--patch', type=int, default=64, help='RAW patch size')
    parser.add_argument('--batch', type=int, default=20)
    parser.add_argument('--lr', type=float, default=1e-4)
    parser.add_argument('--out', default='./data/models/nip')
    parser.add_argument('--resume', action='store_true')
    parser.add_argument('--dry', action='store_true', help='print the setup and exit')
    parser.add_argument('--params', '--ha', dest='params', default=None,
                        help='JSON with model hyper-parameters')
    parser.add_argument('--hp', default=None, help='CSV with hyper-param scenarios')
    parser.add_argument('--group', type=int, default=None,
                        help='run_group to sub-select scenarios from the CSV')
    parser.add_argument('--val-schedule', type=int, default=100)
    parser.add_argument('--lr-schedule', default=None,
                        help="JSON {epoch: lr} decay schedule, e.g. "
                             "\"{'0': 1e-4, '4000': 5e-5}\" (overrides --lr)")
    parser.add_argument('--val-threshold', default=None,
                        help="early-stop threshold on relative validation-loss "
                             "change (default 1e-3; 'none' disables early stop)")
    parser.add_argument('--device-data', action='store_true',
                        help='upload the full training set to HBM once and '
                             'sample patches in-graph (fastest single-chip path)')
    parser.add_argument('--cameras-config', default='config/cameras.json')
    parser.add_argument('-f', '--fill', default=None,
                        help="summarize trained models: '-' to print, or a CSV path")
    from neural_imaging_tpu.parallel.train import add_cli_args, from_cli_args
    add_cli_args(parser)
    args = parser.parse_args()

    setup_logging()
    parallel = from_cli_args(args, batch_size=args.batch)

    from neural_imaging_tpu.data.dataset import Dataset
    from neural_imaging_tpu.models import pipelines
    from neural_imaging_tpu.training.pipeline import train_nip_model

    if args.fill is not None:
        from neural_imaging_tpu.utils import results_data
        df = results_data.nip_stats(args.out)
        if args.fill == '-':
            print(df.to_string(index=False))
        elif args.fill.endswith('.csv'):
            df.to_csv(args.fill, index=False)
            print(f'Saved results to {args.fill}')
        else:
            raise ValueError(f'Invalid value for the results file: {args.fill}')
        return

    nip_name = match_option(args.nip, pipelines.supported_models)
    scenarios = (get_scenarios(args.hp, run_group=args.group) if args.hp
                 else [parse_json_arg(args.params)])
    n_images, v_images, val_n_patches = parse_split(args.split)

    data_dir = args.data or args.cam
    data = None

    for params in scenarios:
        print(f'\n# Scenario: {nip_name} {params}')
        if args.dry:
            continue
        if data is None:
            data = Dataset(data_dir, n_images=n_images, v_images=v_images,
                           val_rgb_patch_size=2 * args.patch, val_n_patches=val_n_patches)
        model = getattr(pipelines, nip_name)(patch_size=args.patch, **params)

        if nip_name == 'ClassicISP' and os.path.isfile(args.cameras_config):
            with open(args.cameras_config) as f:
                cameras = json.load(f)
            if args.cam in cameras:
                model.set_cfa_pattern(cameras[args.cam]['cfa'])
                import numpy as np
                model.set_srgb_conversion(np.array(cameras[args.cam]['srgb']))

        lr_schedule = ({int(k): float(v) for k, v in parse_json_arg(args.lr_schedule).items()}
                       if args.lr_schedule else {0: args.lr})
        threshold = (1e-3 if args.val_threshold is None
                     else None if args.val_threshold == 'none'
                     else float(args.val_threshold))
        train_nip_model(model, args.cam, n_epochs=args.epochs,
                        lr_schedule=lr_schedule, validation_schedule=args.val_schedule,
                        validation_loss_threshold=threshold,
                        resume=args.resume, patch_size=args.patch,
                        batch_size=args.batch, data=data,
                        out_directory_root=args.out, parallel=parallel,
                        device_data=args.device_data)


if __name__ == '__main__':
    main()

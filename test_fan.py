#!/usr/bin/env python3
"""
Re-validate trained manipulation-classification workflows on other datasets, with
optional channel overrides (JPEG quality / codec / DCN model).

Parity with the reference test_fan.py: either a single run (``--run-dir``) or a
directory scan over ``**/training.json`` with a regex selector
(``--dir``/``--re``, ref test_fan.py:77-124), printing validated vs expected
accuracy and a confusion table per run.
"""
import argparse
import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax()

import numpy as np


def restore_flow(training_json, args):
    """Rebuild a ManipulationClassification flow from a run's training.json,
    applying any channel overrides; returns (flow, expected_accuracy)."""
    from neural_imaging_tpu.workflows import ManipulationClassification

    run_dir = os.path.dirname(training_json)
    with open(training_json) as f:
        log = json.load(f)

    distribution = dict(log['distribution'])
    if args.jpeg is not None:
        distribution.update(compression='jpeg',
                            compression_params={'quality': args.jpeg,
                                                'codec': args.codec or 'soft'})
    elif args.codec is not None:
        params = dict(distribution.get('compression_params') or {})
        params['codec'] = args.codec
        distribution.update(compression='jpeg', compression_params=params)
    if args.dcn is not None:
        distribution.update(compression='dcn', compression_params={'dirname': args.dcn})
    if args.ds is not None:
        distribution['downsampling'] = args.ds

    manipulations = (args.manip.split(',') if args.manip is not None else
                     [m for m in log['manipulations'] if m != 'native'])
    nip_model = log['nip']['model']
    fan_args = {k: v for k, v in log['forensics']['args'].items() if k != 'n_classes'}

    # reconstruct the trained channel precision (recorded since round 5; older
    # logs default to f32 — matching their training), unless overridden
    precision = log.get('channel_precision', {})
    channel_dtype = args.channel_dtype or precision.get('channel_dtype', 'float32')
    channel_jpeg_dtype = (args.channel_jpeg_dtype
                          or precision.get('channel_jpeg_dtype', 'float32'))
    manip_jpeg_dtype = (args.manip_jpeg_dtype
                        or precision.get('manip_jpeg_dtype', 'float32'))

    flow = ManipulationClassification(nip_model, manipulations=manipulations,
                                      distribution=distribution, fan_args=fan_args,
                                      raw_patch_size=args.patch,
                                      channel_dtype=channel_dtype,
                                      channel_jpeg_dtype=channel_jpeg_dtype,
                                      manip_jpeg_dtype=manip_jpeg_dtype)
    models_dir = os.path.join(run_dir, 'models')
    flow.fan.load_model(os.path.join(models_dir, 'fan'))
    nip_ckpt = os.path.join(models_dir, flow.nip.scoped_name)
    if os.path.isdir(nip_ckpt) and flow.nip.count_parameters() > 0:
        flow.nip.load_model(nip_ckpt)
    flow.params = flow._collect_params()

    expected = np.nan
    history = (log['forensics'].get('performance', {})
               .get('accuracy', {}).get('validation', []))
    if history:
        expected = float(history[-1])
    return flow, expected


def main():
    parser = argparse.ArgumentParser(description='Cross-dataset FAN validation')
    parser.add_argument('--run-dir', default=None,
                        help='single workflow run directory (contains training.json + models/)')
    parser.add_argument('--dir', default=None,
                        help='root directory to scan for **/training.json runs')
    parser.add_argument('--re', dest='regex', default=None,
                        help='regex filter on training.json paths found under --dir')
    parser.add_argument('--data', required=True, help='dataset directory to validate on')
    parser.add_argument('--split', default='0:-1:2', help='n:v:p — validation-only by default')
    parser.add_argument('--patch', type=int, default=64, help='RAW patch size')
    parser.add_argument('--jpeg', type=int, default=None, help='override channel JPEG quality')
    parser.add_argument('--codec', default=None, choices=['soft', 'sin', 'harmonic', 'libjpeg'],
                        help='override channel JPEG codec')
    parser.add_argument('--dcn', default=None, help='override channel DCN model dir')
    parser.add_argument('--ds', default=None, choices=['pool', 'bilinear', 'none'],
                        help='override downsampling')
    parser.add_argument('--manip', default=None,
                        help='override manipulation list, e.g. sharpen,jpeg,gaussian')
    parser.add_argument('--channel-dtype', default=None,
                        choices=['float32', 'bfloat16'],
                        help='override the recorded distribution-channel dtype')
    parser.add_argument('--channel-jpeg-dtype', default=None,
                        choices=['float32', 'bfloat16'],
                        help='override the recorded channel-dJPEG dtype')
    parser.add_argument('--manip-jpeg-dtype', default=None,
                        choices=['float32', 'bfloat16'],
                        help='override the recorded manipulation-dJPEG dtype')
    parser.add_argument('--randomize', action='store_true',
                        help='validate with randomized manipulation strengths (the '
                             'distribution `--augment` training optimizes) instead '
                             'of the fixed canonical strengths')
    parser.add_argument('--repeats', type=int, default=1,
                        help='validation passes to aggregate (independent strength '
                             'draws when --randomize)')
    args = parser.parse_args()

    if (args.run_dir is None) == (args.dir is None):
        parser.error('specify exactly one of --run-dir or --dir')

    if args.run_dir is not None:
        json_files = [os.path.join(args.run_dir, 'training.json')]
    else:
        json_files = sorted(str(f) for f in Path(args.dir).glob('**/training.json'))
        if not json_files:
            print(f'No training sessions under {args.dir}')
            sys.exit(0)
        print(f'Found {len(json_files)} candidate training sessions ({args.dir})')

    from neural_imaging_tpu.data.dataset import Dataset
    from neural_imaging_tpu.training import validation
    from neural_imaging_tpu.utils import results_data
    from train_nip import parse_split

    n_images, v_images, val_n_patches = parse_split(args.split)
    # A scan directory can mix ONet (RGB-only, load='y') and raw-input NIP runs
    # (load='xy'); the right load mode is detected PER RUN and datasets are
    # cached per mode, so mixed scans validate every run with the right batches.
    datasets = {}

    for filename in json_files:
        if args.regex is not None and not re.findall(args.regex, filename):
            print(f'Skipping {filename}...')
            continue

        flow, expected = restore_flow(filename, args)
        print(flow.summary())

        load = 'y' if flow.nip.class_name == 'ONet' else 'xy'
        if load not in datasets:
            try:
                datasets[load] = Dataset(args.data, load=load, n_images=n_images,
                                         v_images=v_images,
                                         val_rgb_patch_size=2 * args.patch,
                                         val_n_patches=val_n_patches)
                print(f'Data ({load}): {datasets[load].summary()}')
            except Exception as e:
                print(f"Skipping {filename}: cannot load the dataset in "
                      f"'{load}' mode ({e})")
                datasets[load] = None
        data = datasets[load]
        if data is None:
            print(f"Skipping {filename}: no dataset available in '{load}' mode")
            continue

        accuracy, conf = validation.validate_fan(flow, data,
                                                 randomize=args.randomize,
                                                 repeats=args.repeats)
        mode = ' [randomized strengths]' if args.randomize else ''
        print(f'\nAccuracy validated/expected{mode}: '
              f'{accuracy:.4f} / {expected:.4f}\n')
        print(results_data.confusion_to_text(100 * conf, flow._forensics_classes,
                                             title=filename))


if __name__ == '__main__':
    main()

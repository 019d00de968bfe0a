#!/usr/bin/env python3
"""
Re-validate trained manipulation-classification workflows on other datasets, with
optional channel overrides (JPEG quality / codec / DCN model).
Parity with the reference test_fan.py.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_imaging_tpu.utils.runtime import configure_jax
configure_jax()

import numpy as np


def main():
    parser = argparse.ArgumentParser(description='Cross-dataset FAN validation')
    parser.add_argument('--run-dir', required=True,
                        help='workflow run directory (contains training.json + models/)')
    parser.add_argument('--data', required=True, help='dataset directory to validate on')
    parser.add_argument('--split', default='0:-1:2', help='n:v:p — validation-only by default')
    parser.add_argument('--patch', type=int, default=64, help='RAW patch size')
    parser.add_argument('--jpeg', type=int, default=None, help='override channel JPEG quality')
    parser.add_argument('--dcn', default=None, help='override channel DCN model dir')
    parser.add_argument('--ds', default=None, choices=['pool', 'bilinear', 'none'],
                        help='override downsampling')
    args = parser.parse_args()

    from neural_imaging_tpu.data.dataset import Dataset
    from neural_imaging_tpu.training import validation
    from neural_imaging_tpu.utils import results_data
    from neural_imaging_tpu.workflows import ManipulationClassification
    from train_nip import parse_split

    with open(os.path.join(args.run_dir, 'training.json')) as f:
        log = json.load(f)

    distribution = dict(log['distribution'])
    if args.jpeg is not None:
        distribution.update(compression='jpeg',
                            compression_params={'quality': args.jpeg, 'codec': 'soft'})
    if args.dcn is not None:
        distribution.update(compression='dcn', compression_params={'dirname': args.dcn})
    if args.ds is not None:
        distribution['downsampling'] = args.ds

    manipulations = [m for m in log['manipulations'] if m != 'native']
    nip_model = log['nip']['model']
    fan_args = {k: v for k, v in log['forensics']['args'].items() if k != 'n_classes'}

    flow = ManipulationClassification(nip_model, manipulations=manipulations,
                                      distribution=distribution, fan_args=fan_args,
                                      raw_patch_size=args.patch)
    models_dir = os.path.join(args.run_dir, 'models')
    flow.fan.load_model(os.path.join(models_dir, 'fan'))
    nip_ckpt = os.path.join(models_dir, flow.nip.scoped_name)
    if os.path.isdir(nip_ckpt) and flow.nip.count_parameters() > 0:
        flow.nip.load_model(nip_ckpt)
    flow.params = flow._collect_params()

    n_images, v_images, val_n_patches = parse_split(args.split)
    load = 'y' if nip_model == 'ONet' else 'xy'
    data = Dataset(args.data, load=load, n_images=n_images, v_images=v_images,
                   val_rgb_patch_size=2 * args.patch, val_n_patches=val_n_patches)

    accuracy, conf = validation.validate_fan(flow, data)
    print(f'\nAccuracy: {accuracy:.3f}\n')
    print(results_data.confusion_to_text(100 * conf, flow._forensics_classes,
                                         title=f'{nip_model} on {args.data}'))


if __name__ == '__main__':
    main()

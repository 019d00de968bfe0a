#!/usr/bin/env python3
"""
End-to-end framework test harness.

Parity with the reference test_framework.py + config/tests/framework.json: each
scenario runs a real CLI trainer as a subprocess into a scratch root, then asserts
(a) expected artifact files exist and (b) JSON-logged metrics exceed thresholds.
Synthetic data fixtures are generated on the fly, so the suite is hermetic.
"""
import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_imaging_tpu.utils import utils
from neural_imaging_tpu.utils.utils import setup_logging

REPO = os.path.dirname(os.path.abspath(__file__))
DEFAULT_ROOT = '/tmp/neural-imaging-tpu'
DEFAULT_CAM = 'SyntheticCam'


def prepare_data(root, cam):
    from neural_imaging_tpu.data import fixtures
    raw_dir = os.path.join(root, 'data', cam)
    rgb_dir = os.path.join(root, 'data', 'rgb')
    if not os.path.isdir(raw_dir) or not os.listdir(raw_dir):
        fixtures.make_dataset(raw_dir, n_images=8, height=192, width=256, seed=1000)
    if not os.path.isdir(rgb_dir) or not os.listdir(rgb_dir):
        fixtures.make_dataset(rgb_dir, n_images=18, height=192, width=256, seed=2000,
                              rgb_only=True)


def run_scenario(name, spec, root, cam, platform='cpu'):
    command = spec['command'].format(root=root, cam=cam, repo=REPO)
    print(f'\n=== {name} ===\n$ {command}')
    import shlex
    import subprocess
    env = dict(os.environ)
    if platform:
        env['NI_TPU_PLATFORM'] = platform
    proc = subprocess.run(shlex.split(command), stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True, env=env, cwd=REPO)
    code, lines = proc.returncode, proc.stdout.splitlines()
    if code != 0:
        print('\n'.join(lines[-40:]))
        return False, f'command exited with {code}'

    for rel in spec.get('files', []):
        path = os.path.join(root, rel.format(root=root, cam=cam))
        if not os.path.isfile(path):
            return False, f'missing artifact: {path}'

    perf = spec.get('performance')
    if perf:
        path = os.path.join(root, perf['file'].format(root=root, cam=cam))
        with open(path) as f:
            log = json.load(f)
        for key, threshold in perf['values'].items():
            values = utils.get(log, key)
            value = values[-1] if isinstance(values, list) else values
            if value < threshold:
                return False, f'{key} = {value} < {threshold}'
            print(f'  ✓ {key} = {value:.3f} (>= {threshold})')
    return True, 'ok'


def main():
    parser = argparse.ArgumentParser(description='E2E framework test')
    parser.add_argument('--root', default=DEFAULT_ROOT)
    parser.add_argument('--cam', default=DEFAULT_CAM)
    parser.add_argument('--spec', default=os.path.join(REPO, 'config/tests/framework.json'))
    parser.add_argument('--scenario', default=None, help='run only one scenario')
    parser.add_argument('--fresh', action='store_true', help='wipe the scratch root first')
    parser.add_argument('--platform', default='cpu',
                        help="JAX backend for the trainers ('' keeps the default)")
    args = parser.parse_args()

    setup_logging()
    if args.fresh and os.path.isdir(args.root):
        shutil.rmtree(args.root)
    os.makedirs(args.root, exist_ok=True)
    prepare_data(args.root, args.cam)

    with open(args.spec) as f:
        scenarios = json.load(f)
    if args.scenario:
        scenarios = {args.scenario: scenarios[args.scenario]}

    results = {}
    for name, spec in scenarios.items():
        ok, message = run_scenario(name, spec, args.root, args.cam, args.platform)
        results[name] = (ok, message)
        print(f'--- {name}: {"PASS" if ok else "FAIL"} ({message})')

    print('\n=== Summary ===')
    failed = 0
    for name, (ok, message) in results.items():
        print(f'{"PASS" if ok else "FAIL":4s}  {name:24s} {message}')
        failed += not ok
    sys.exit(1 if failed else 0)


if __name__ == '__main__':
    main()

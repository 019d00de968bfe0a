"""A fast end-to-end gate inside the unit suite: the train-nip scenario of the
framework harness (full CLI → training loop → JSON contract → PSNR threshold).
The complete six-scenario suite runs via `python test_framework.py --fresh`."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_train_nip_gate(tmp_path):
    sys.path.insert(0, REPO)
    import test_framework as harness

    root = str(tmp_path)
    harness.prepare_data(root, 'SyntheticCam')
    spec = json.load(open(os.path.join(REPO, 'config/tests/framework.json')))
    ok, message = harness.run_scenario('train-nip', spec['train-nip'], root,
                                       'SyntheticCam', platform='cpu')
    assert ok, message
    progress = json.load(open(os.path.join(
        root, 'models/nip/SyntheticCam/INet_gbrg_5x5/inet/progress.json')))
    assert progress['performance']['psnr']['validation'][-1] > 39

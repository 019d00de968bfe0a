"""
The repo ships pre-trained reference-scale checkpoints (data/models/,
data/m_quality*/). These tests pin that every shipped artifact restores and
runs — guarding against checkpoint-format drift and accidental artifact
corruption (ref ships its models as external downloads; here they are in-tree).
"""
import json
import os

import numpy as np
import pytest

# compile-heavy: excluded from the sub-5-minute smoke profile
# (`pytest -m 'not slow'`); the full default suite still runs these
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bayer(key, n=1, size=16):
    rng = np.random.default_rng(key)
    return rng.uniform(0.1, 0.9, (n, size, size, 4)).astype(np.float32)


@pytest.mark.parametrize('dirname, model_name', [
    ('data/models/nip/QualityRef/INet_gbrg_5x5/inet', 'INet'),
    ('data/models/nip/QualityRef/UNet_5/unet', 'UNet'),
    ('data/models/nip/QualityRef/DNet_3x3_15x64f/dnet', 'DNet'),
    ('data/models/nip/QualityRef/ClassicISP_gbrg_5x5_-3R/classicisp', 'ClassicISP'),
])
def test_shipped_nip_restores_and_develops(dirname, model_name):
    from neural_imaging_tpu.models import base, pipelines
    path = os.path.join(REPO, dirname)
    if not os.path.isdir(path):
        pytest.skip(f'{dirname} not shipped in this checkout')
    model = base.restore(path, pipelines)
    assert type(model).__name__ == model_name
    rgb = np.asarray(model.process(_bayer(7, size=32)))
    assert rgb.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(rgb)) and rgb.min() >= 0 and rgb.max() <= 1

    # the shipped checkpoints must keep their documented quality (the UNet is
    # the converged 37.6 dB round-3 run, docs/quality_runs.md)
    log = json.load(open(os.path.join(path, 'progress.json')))
    psnr = log['performance']['psnr']['validation'][-1]
    floor = {'UNet': 37.0, 'INet': 36.0, 'DNet': 36.0, 'ClassicISP': 33.5}[model_name]
    assert psnr >= floor, f'shipped {model_name} regressed to {psnr:.2f} dB'


@pytest.mark.parametrize('preset, min_ssim', [
    ('8c', 0.60), ('16c', 0.70), ('32c', 0.70), ('64c', 0.70),
    ('lq', 0.70), ('mq', 0.70), ('hq', 0.70),
])
def test_shipped_dcn_baseline_restores_and_roundtrips(preset, min_ssim):
    """Every preset in config/presets/compression.json (ref keeps 16c/32c/64c +
    lq/mq/hq aliases) restores, keeps its documented validation quality, and
    round-trips a real bitstream losslessly vs simulate_compression."""
    from neural_imaging_tpu.compression import codec

    with open(os.path.join(REPO, 'config/presets/compression.json')) as fh:
        path = os.path.join(REPO, json.load(fh)[preset])
    if not os.path.isdir(path):
        pytest.skip(f'{preset} baseline not shipped in this checkout')

    dcn = codec.restore(preset, patch_size=64)
    log = json.load(open(os.path.join(path, 'twitterdcn', 'progress.json')))
    ssim = log['codec']['performance']['ssim']['validation'][-1]
    assert ssim >= min_ssim, f'shipped {preset} regressed to SSIM {ssim:.3f}'

    rng = np.random.default_rng(11)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    blob = codec.compress(x, dcn)
    decoded = np.asarray(codec.decompress(blob, dcn))
    y, n_bytes = codec.simulate_compression(x, dcn)
    assert n_bytes == len(blob)
    np.testing.assert_array_equal(np.asarray(y), decoded)
    assert np.all(np.isfinite(decoded))


@pytest.mark.parametrize('run_dir', [
    'data/m_quality/QualityRef/INet/fixed-nip/fixed-codec/000',
    'data/m_quality_full/QualityRef/INet/fixed-nip/fixed-codec/000',
])
def test_shipped_fan_restores_and_classifies(run_dir):
    from neural_imaging_tpu.models import forensics
    path = os.path.join(REPO, run_dir)
    if not os.path.isdir(path):
        pytest.skip(f'{run_dir} not shipped in this checkout')

    with open(os.path.join(path, 'training.json')) as fh:
        log = json.load(fh)
    acc = log['forensics']['performance']['accuracy']['validation']
    # The shipped flagship run must actually demonstrate the documented regime.
    if 'm_quality_full' in run_dir:
        assert max(acc) >= 0.85, 'flagship artifact no longer clears the 0.85 regime'

    # FAN artifacts restore through the run's training.json (same contract
    # test_fan.py::restore_flow uses — the npz carries weights only).
    fan = forensics.FAN(**log['forensics']['args'])
    fan.load_model(os.path.join(path, 'models', 'fan'))
    n_classes = log['forensics']['args']['n_classes']
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    probs = np.asarray(fan.process(x))
    assert probs.shape == (2, n_classes)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-4)

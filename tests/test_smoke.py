"""
Smoke coverage for the areas whose full test modules carry the ``slow`` marker
(`pytest -m "not slow"` must still import and lightly exercise EVERY layer).
Each test here avoids large jit compiles — construction, tiny pure ops, host
paths and one CLI --help — so the whole file stays in seconds.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_import_every_package_module():
    import importlib
    import pkgutil

    import neural_imaging_tpu
    failures = []
    for mod in pkgutil.walk_packages(neural_imaging_tpu.__path__,
                                     prefix='neural_imaging_tpu.'):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001 - collect all failures
            failures.append((mod.name, repr(e)))
    assert not failures, failures


def test_workflow_constructs_with_flagship_options():
    from neural_imaging_tpu.workflows import ManipulationClassification
    flow = ManipulationClassification(
        'INet', manipulations=['sharpen:1', 'gaussian:1'],
        fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 0,
                  'dtype': 'bfloat16'},
        channel_dtype='bfloat16', channel_jpeg_dtype='bfloat16',
        nip_args={'conv_precision': 'default'}, raw_patch_size=16)
    assert flow.n_classes == 3
    assert 'INet' in flow.summary()


def test_pipelines_construct_and_describe():
    from neural_imaging_tpu.models import pipelines
    for name in pipelines.supported_models:
        m = getattr(pipelines, name)(patch_size=16)
        assert m.summary()


def test_parallel_mesh_and_sharding_helpers():
    import jax
    from neural_imaging_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh(min(2, len(jax.devices())))
    sh = mesh_lib.batch_sharding(mesh)
    out = mesh_lib.put_global(np.zeros((4, 3), np.float32), sh)
    assert out.shape == (4, 3)
    rep = mesh_lib.replicate({'w': np.ones(3, np.float32)}, mesh)
    assert np.asarray(rep['w']).sum() == 3.0


def test_multihost_single_process_noops():
    from neural_imaging_tpu.parallel import multihost
    assert multihost.initialize() is False
    assert multihost.is_primary()
    assert multihost.sync_global_value(0.5) == 0.5


def test_training_module_surfaces():
    from neural_imaging_tpu.training import compression, manipulation, pipeline
    assert callable(pipeline.train_nip_model)
    assert callable(compression.train_dcn)
    assert callable(manipulation.train_manipulation_nip)


def test_reference_parity_constants():
    from neural_imaging_tpu.compression.jpeg_helpers import jpeg_qtable
    q50 = jpeg_qtable(50, 0)
    assert q50.shape == (8, 8) and q50[0, 0] == 16  # IJG luma table at QF 50


def test_one_cli_help():
    p = subprocess.run([sys.executable, os.path.join(REPO, 'train_nip.py'),
                        '--help'], capture_output=True, text=True, timeout=120)
    assert p.returncode == 0 and '--device-data' in p.stdout

"""Tests for the parallel layer: mesh creation, sharded training and inference on
the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from neural_imaging_tpu.parallel import make_mesh, mesh as mesh_lib, train as ptrain

# compile-heavy: excluded from the sub-5-minute smoke profile
# (`pytest -m 'not slow'`); the full default suite still runs these
pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip('needs the 8-device virtual CPU mesh')
    return make_mesh(8)


class TestMesh:
    def test_make_mesh_1d(self, mesh8):
        assert mesh8.shape == {'data': 8}

    def test_make_mesh_2d(self):
        if len(jax.devices()) < 8:
            pytest.skip('needs 8 devices')
        m = make_mesh(8, axes=('data', 'space'))
        assert m.shape['data'] * m.shape['space'] == 8
        assert m.shape['space'] > 1

    def test_shard_and_replicate(self, mesh8, rng):
        batch = rng.random((16, 8, 8, 3)).astype(np.float32)
        sharded = mesh_lib.shard_batch(batch, mesh8)
        assert len(sharded.sharding.device_set) == 8
        params = {'w': np.ones((4, 4), np.float32)}
        rep = mesh_lib.replicate(params, mesh8)
        assert rep['w'].sharding.is_fully_replicated

    def test_pad_batch(self, mesh8, rng):
        batch = rng.random((13, 4, 4, 3)).astype(np.float32)
        padded, orig = ptrain.pad_batch_to_devices(batch, mesh8)
        assert padded.shape[0] == 16 and orig == 13


class TestDataParallelTraining:
    def test_nip_step_on_mesh(self, mesh8, rng):
        """The same jitted train step must run SPMD when inputs are sharded, and
        produce the same loss as the single-device run."""
        from neural_imaging_tpu.models import pipelines
        bx = rng.random((8, 8, 8, 4)).astype(np.float32)
        by = rng.random((8, 16, 16, 3)).astype(np.float32)

        m1 = pipelines.INet(patch_size=8)
        loss_single = float(m1.training_step(bx, by, 1e-4))

        m2 = pipelines.INet(patch_size=8)
        ptrain.distribute_model(m2, mesh8)
        sbx, sby = ptrain.shard_batch_args(mesh8, bx, by)
        loss_sharded = float(m2.training_step(sbx, sby, 1e-4))

        assert abs(loss_single - loss_sharded) / loss_single < 1e-4
        # parameters remain replicated after the update
        leaf = jax.tree.leaves(m2.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_workflow_step_on_mesh(self, mesh8, rng):
        from neural_imaging_tpu.workflows import ManipulationClassification
        flow = ManipulationClassification(
            'INet', manipulations=['sharpen:1'],
            distribution={'downsampling': 'none', 'compression': 'none'},
            fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 1},
            trainable={'nip'}, raw_patch_size=16)
        ptrain.distribute_workflow(flow, mesh8)
        bx = rng.random((8, 16, 16, 4)).astype(np.float32)
        by = rng.random((8, 32, 32, 3)).astype(np.float32)
        sbx, sby = ptrain.shard_batch_args(mesh8, bx, by)
        loss, parts = flow.training_step(sbx, sby, lambda_nip=0.1)
        assert np.isfinite(float(loss))

    def test_sharded_inference(self, mesh8, rng):
        from neural_imaging_tpu.models import pipelines
        m = pipelines.INet(patch_size=8)
        batch = rng.random((11, 8, 8, 4)).astype(np.float32)
        out = ptrain.sharded_inference(m, batch, mesh8)
        assert np.asarray(out).shape == (11, 16, 16, 3)
        ref = np.asarray(m.process(batch))
        assert np.allclose(np.asarray(out), ref, atol=1e-5)


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert np.asarray(out).shape[1] == 4  # (K+1) classes

    def test_dryrun_multichip(self):
        if len(jax.devices()) < 4:
            pytest.skip('needs multiple devices')
        import __graft_entry__ as ge
        try:
            ge.dryrun_multichip(4)
        finally:
            # dryrun force-reconfigures the process to 4 CPU devices; restore
            # the suite's 8-device virtual mesh for the tests that follow
            ge._force_cpu_devices(8)


def _tiny_dataset(tmp_path, n_images=10, load='xy', val_patch=16, seed=5):
    from neural_imaging_tpu.data import fixtures
    from neural_imaging_tpu.data.dataset import Dataset
    d = str(tmp_path / f'cam-{load}-{n_images}')
    import os
    if not os.path.isdir(d):
        fixtures.make_dataset(d, n_images=n_images + 8, height=64, width=64,
                              seed=seed, rgb_only=(load == 'y'))
    return Dataset(d, load=load, n_images=n_images, v_images=8,
                   val_rgb_patch_size=val_patch, val_n_patches=1)


class TestTrainerParallelParity:
    """The production training loops (not just the raw jitted steps) must run on
    the mesh and match the single-device loss trajectory — the user-reachable
    SPMD path (SURVEY.md §2.9)."""

    def test_train_nip_parallel_parity(self, tmp_path, mesh8):
        from neural_imaging_tpu.models import pipelines
        from neural_imaging_tpu.parallel.train import DataParallel
        from neural_imaging_tpu.training.pipeline import train_nip_model

        losses = {}
        for name, parallel in (('single', None), ('mesh', DataParallel(mesh8))):
            data = _tiny_dataset(tmp_path, load='xy')
            model = pipelines.INet(patch_size=8)
            train_nip_model(model, 'cam', n_epochs=3, validation_schedule=2,
                            patch_size=8, batch_size=8, data=data,
                            out_directory_root=str(tmp_path / f'out-{name}'),
                            parallel=parallel)
            losses[name] = model.performance['loss']['training']

        np.testing.assert_allclose(losses['mesh'], losses['single'], rtol=1e-3)

    def test_train_dcn_parallel_parity(self, tmp_path, mesh8):
        from neural_imaging_tpu.models.compression import TwitterDCN
        from neural_imaging_tpu.parallel.train import DataParallel
        from neural_imaging_tpu.training.compression import train_dcn

        losses = {}
        for name, parallel in (('single', None), ('mesh', DataParallel(mesh8))):
            data = _tiny_dataset(tmp_path, load='y', val_patch=32)
            dcn = TwitterDCN(patch_size=32, n_features=4)
            train_dcn(dcn, {'n_epochs': 2, 'batch_size': 8, 'patch_size': 32,
                            'validation_schedule': 1},
                      data, directory=str(tmp_path / f'dcn-{name}'),
                      rng=np.random.default_rng(7), scalar_log=False,
                      parallel=parallel)
            losses[name] = dcn.performance['loss']['training']

        np.testing.assert_allclose(losses['mesh'], losses['single'], rtol=1e-3)

    def test_train_manipulation_parallel_parity(self, tmp_path, mesh8):
        from neural_imaging_tpu.parallel.train import DataParallel
        from neural_imaging_tpu.training.manipulation import train_manipulation_nip
        from neural_imaging_tpu.workflows import ManipulationClassification

        losses = {}
        for name, parallel in (('single', None), ('mesh', DataParallel(mesh8))):
            data = _tiny_dataset(tmp_path, load='xy')
            flow = ManipulationClassification(
                'INet', manipulations=['sharpen:1'],
                distribution={'downsampling': 'pool:2', 'compression': 'jpeg',
                              'compression_params': {'quality': 50, 'codec': 'soft'}},
                fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 0},
                trainable={'nip'}, raw_patch_size=16)
            train_manipulation_nip(
                flow,
                {'camera_name': 'cam', 'use_pretrained_nip': False, 'patch_size': 16,
                 'batch_size': 8, 'n_epochs': 2, 'validation_schedule': 1,
                 'learning_rate': 1e-4, 'lambda_nip': 0.1, 'lambda_dcn': 0,
                 'run_number': 0, 'augment': False},
                data, directories={'root': str(tmp_path / f'm-{name}'),
                                   'nip_snapshots': str(tmp_path / 'nip')},
                parallel=parallel)
            losses[name] = flow.fan.performance['loss']['training']

        np.testing.assert_allclose(losses['mesh'], losses['single'], rtol=1e-3)

    def test_batch_divisibility_guard(self, mesh8):
        from neural_imaging_tpu.parallel.train import DataParallel
        dp = DataParallel(mesh8)
        with pytest.raises(ValueError):
            dp.check_batch(10)


class TestScannedDeviceDataParallel:
    """--device-data composed with --devices: the device-resident lax.scan
    trainers run SPMD (images replicated on the mesh, sampled batches
    shard-constrained). The sample stream is key-deterministic, so losses must
    match the single-device scan up to reduction order."""

    def _samplers(self, tmp_path, mesh8, load, batch, patch, **kw):
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        from neural_imaging_tpu.parallel.train import DataParallel
        dp = DataParallel(mesh8)
        data = _tiny_dataset(tmp_path, load=load, **kw)
        single = DeviceSampler(data, batch, patch)
        sharded = DeviceSampler(data, batch, patch, sharding=dp.batch_sharding)
        return single, sharded, dp

    def test_sampler_draws_match_across_mesh(self, tmp_path, mesh8):
        """Same key → identical batches whether or not the sampler is meshed."""
        single, sharded, _ = self._samplers(tmp_path, mesh8, 'xy', 8, 16)
        raw_s, rgb_s = single(3)
        raw_m, rgb_m = sharded(3)
        assert len(raw_m.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(raw_m), np.asarray(raw_s))
        np.testing.assert_array_equal(np.asarray(rgb_m), np.asarray(rgb_s))

    def test_nip_training_scan_mesh_parity(self, tmp_path, mesh8):
        from neural_imaging_tpu.models import pipelines
        single, sharded, dp = self._samplers(tmp_path, mesh8, 'xy', 8, 16)

        m1 = pipelines.INet(patch_size=8)
        losses1 = np.asarray(m1.training_scan(single, 6, 1e-4))
        m2 = pipelines.INet(patch_size=8)
        dp.distribute(m2)
        losses2 = np.asarray(m2.training_scan(sharded, 6, 1e-4))

        np.testing.assert_allclose(losses2, losses1, rtol=2e-3)
        assert jax.tree.leaves(m2.params)[0].sharding.is_fully_replicated

    def test_dcn_training_scan_mesh_parity(self, tmp_path, mesh8):
        from neural_imaging_tpu.models.compression import TwitterDCN
        single, sharded, dp = self._samplers(tmp_path, mesh8, 'y', 8, 32,
                                             val_patch=32)
        d1 = TwitterDCN(patch_size=32, n_features=4)
        l1 = np.asarray(d1.training_scan(single, 4)['loss'])
        d2 = TwitterDCN(patch_size=32, n_features=4)
        dp.distribute(d2)
        l2 = np.asarray(d2.training_scan(sharded, 4)['loss'])
        np.testing.assert_allclose(l2, l1, rtol=2e-3)

    def test_workflow_training_scan_mesh_parity(self, tmp_path, mesh8):
        from neural_imaging_tpu.parallel.train import DataParallel
        from neural_imaging_tpu.workflows import ManipulationClassification

        def build():
            return ManipulationClassification(
                'INet', manipulations=['sharpen:1'],
                distribution={'downsampling': 'pool:2', 'compression': 'jpeg',
                              'compression_params': {'quality': 50, 'codec': 'soft'}},
                fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 0},
                trainable={'nip'}, raw_patch_size=16)

        single, sharded, dp = self._samplers(tmp_path, mesh8, 'xy', 8, 32)
        f1 = build()
        l1, _ = f1.training_scan(single, 4, lambda_nip=0.1)
        f2 = build()
        dp.distribute(f2)
        l2, _ = f2.training_scan(sharded, 4, lambda_nip=0.1)
        f1.assert_finite()
        f2.assert_finite()
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=2e-3)

    def test_train_nip_model_device_data_on_mesh(self, tmp_path, mesh8):
        """The trainer loop accepts BOTH flags together and matches the
        single-device device-data loss trajectory."""
        from neural_imaging_tpu.models import pipelines
        from neural_imaging_tpu.parallel.train import DataParallel
        from neural_imaging_tpu.training.pipeline import train_nip_model

        losses = {}
        for name, parallel in (('single', None), ('mesh', DataParallel(mesh8))):
            data = _tiny_dataset(tmp_path, load='xy')
            model = pipelines.INet(patch_size=8)
            train_nip_model(model, 'cam', n_epochs=3, validation_schedule=2,
                            patch_size=8, batch_size=8, data=data,
                            out_directory_root=str(tmp_path / f'dd-{name}'),
                            parallel=parallel, device_data=True)
            losses[name] = model.performance['loss']['training']
        np.testing.assert_allclose(losses['mesh'], losses['single'], rtol=2e-3)

    def test_sampler_rejects_indivisible_batch(self, tmp_path, mesh8):
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        from neural_imaging_tpu.parallel.train import DataParallel
        dp = DataParallel(mesh8)
        data = _tiny_dataset(tmp_path, load='xy')
        with pytest.raises(ValueError):
            DeviceSampler(data, 6, 16, sharding=dp.batch_sharding)


class TestDataParallelSpec:
    def test_from_spec_shrinks_to_divisor(self):
        from neural_imaging_tpu.parallel.train import DataParallel
        dp = DataParallel.from_spec(8, batch_size=12)
        assert dp.n_devices == 6  # largest divisor of 12 that is <= 8
        assert DataParallel.from_spec('none') is None
        assert DataParallel.from_spec(None) is None
        assert DataParallel.from_spec(8, batch_size=1) is None  # single device


class TestParallelCLI:
    def test_train_nip_cli_devices_flag(self, tmp_path):
        """The user-facing --devices --device-data path: full CLI run on the
        8-device virtual mesh through the scanned device-resident trainer,
        artifacts + JSON contract written."""
        import json
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        from neural_imaging_tpu.data import fixtures
        cam_dir = str(tmp_path / 'SynthCam')
        fixtures.make_dataset(cam_dir, n_images=16, height=64, width=64, seed=5)

        env = dict(os.environ)
        env['NI_TPU_PLATFORM'] = 'cpu'
        flags = env.get('XLA_FLAGS', '')
        if 'xla_force_host_platform_device_count' not in flags:
            env['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
        out = subprocess.run(
            [sys.executable, os.path.join(repo, 'train_nip.py'),
             '--data', cam_dir, '--cam', 'SynthCam', '--nip', 'INet',
             '--split', '8:8:1', '--epochs', '3', '--val-schedule', '2',
             '--patch', '8', '--batch', '8', '--devices', '8', '--device-data',
             '--out', str(tmp_path / 'models')],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo, timeout=600)
        assert out.returncode == 0, out.stdout[-3000:]
        assert 'data-parallel over 8 devices' in out.stdout
        progress = list((tmp_path / 'models').glob('**/progress.json'))
        assert progress, 'no progress.json written by the parallel CLI run'
        log = json.load(open(progress[0]))
        assert np.isfinite(log['performance']['loss']['training'][-1])


class TestSpatialSharding:
    def test_full_image_isp_spatially_sharded(self, rng):
        """Full-resolution ISP inference with the image height sharded over a 2-D
        ('data','space') mesh must match the unsharded result (XLA inserts the
        conv halo exchanges)."""
        import jax
        from neural_imaging_tpu.models import pipelines
        if len(jax.devices()) < 8:
            pytest.skip('needs 8 devices')
        mesh = make_mesh(8, axes=('data', 'space'))
        m = pipelines.INet(patch_size=None)
        image = rng.random((2, 64, 64, 4)).astype(np.float32)

        ref = np.asarray(m.process(image))
        sharded = jax.device_put(image, mesh_lib.spatial_sharding(mesh))
        out = np.asarray(m.process(sharded))
        assert np.allclose(out, ref, atol=1e-5)


class TestMultihost:
    def test_single_process_noops(self):
        from neural_imaging_tpu.parallel import multihost
        assert multihost.initialize() is False
        assert multihost.is_primary() is True
        start, size = multihost.local_batch_slice(32)
        assert (start, size) == (0, 32)
        assert multihost.sync_global_value(3.5) == 3.5

    def test_primary_only_decorator(self):
        from neural_imaging_tpu.parallel import multihost
        calls = []

        @multihost.primary_only
        def write(x):
            calls.append(x)
            return x
        assert write(1) == 1
        assert calls == [1]

    def test_global_mesh(self):
        from neural_imaging_tpu.parallel import multihost
        mesh = multihost.global_mesh()
        assert mesh.shape['data'] >= 1


class TestShardedCheckpointRestore:
    def test_restore_replicated_on_mesh(self, tmp_path):
        """Orbax restore can materialize the state directly with a mesh sharding
        (no single-device staging), and values survive the round trip."""
        import jax
        from neural_imaging_tpu.models.pipelines import INet
        from neural_imaging_tpu.parallel.mesh import make_mesh, replicated_sharding

        m = INet(patch_size=16)
        m.save_checkpoint(str(tmp_path), step=3)

        m2 = INet(patch_size=16)
        mesh = make_mesh(8)
        sharding = replicated_sharding(mesh)
        step = m2.load_checkpoint(str(tmp_path), sharding=sharding)
        assert step == 3

        leaves = jax.tree.leaves(m2.params)
        assert all(leaf.sharding.is_equivalent_to(sharding, leaf.ndim)
                   for leaf in leaves)
        for a, b in zip(jax.tree.leaves(m.params), leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

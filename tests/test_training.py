"""Tests for the training layer: loops, validation, JSON-log schema, aggregation."""
import json
import os

import numpy as np
import pytest

from neural_imaging_tpu.data import fixtures
from neural_imaging_tpu.data.dataset import Dataset

# compile-heavy: excluded from the sub-5-minute smoke profile
# (`pytest -m 'not slow'`); the full default suite still runs these
pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('train_data')
    fixtures.make_dataset(str(d), n_images=6, height=128, width=160, seed=21)
    return str(d)


@pytest.fixture(scope='module')
def data(data_dir):
    return Dataset(data_dir, n_images=4, v_images=2, val_rgb_patch_size=64,
                   val_n_patches=2, randomize=7)


class TestTrainNIP:
    def test_loop_artifacts_and_resume(self, data, tmp_path_factory):
        from neural_imaging_tpu.models import pipelines
        from neural_imaging_tpu.training.pipeline import train_nip_model
        out_root = str(tmp_path_factory.mktemp('nip_out'))
        model = pipelines.INet(patch_size=32)
        out = train_nip_model(model, 'TestCam', n_epochs=4, validation_schedule=2,
                              patch_size=32, batch_size=2, data=data,
                              out_directory_root=out_root)
        assert os.path.isfile(os.path.join(out, 'progress.json'))
        assert os.path.isfile(os.path.join(out, 'inet.npz'))
        prog = json.load(open(os.path.join(out, 'progress.json')))
        assert prog['model'] == 'INet'
        assert len(prog['performance']['psnr']['validation']) >= 2
        assert prog['performance']['psnr']['validation'][-1] > 30

        # resume continues the epoch counter
        out2 = train_nip_model(model, 'TestCam', n_epochs=6, validation_schedule=2,
                               patch_size=32, batch_size=2, data=data, resume=True,
                               out_directory_root=out_root)
        prog2 = json.load(open(os.path.join(out2, 'progress.json')))
        assert prog2['summary']['Epoch'] == 5

    def test_skips_existing_dir(self, data, tmp_path_factory):
        from neural_imaging_tpu.models import pipelines
        from neural_imaging_tpu.training.pipeline import train_nip_model
        out_root = str(tmp_path_factory.mktemp('nip_skip'))
        m = pipelines.INet(patch_size=32)
        train_nip_model(m, 'X', n_epochs=2, validation_schedule=1, patch_size=32,
                        batch_size=2, data=data, out_directory_root=out_root)
        # second call without --resume must skip (no exception, no retrain)
        out = train_nip_model(m, 'X', n_epochs=2, validation_schedule=1, patch_size=32,
                              batch_size=2, data=data, out_directory_root=out_root)
        assert os.path.isdir(out)


class TestTrainDCN:
    def test_loop_artifacts(self, data_dir, tmp_path_factory):
        from neural_imaging_tpu.models.compression import TwitterDCN
        from neural_imaging_tpu.training.compression import train_dcn
        rgb = Dataset(data_dir, load='y', n_images=4, v_images=2,
                      val_rgb_patch_size=32, val_n_patches=2, randomize=3)
        out_root = str(tmp_path_factory.mktemp('dcn_out'))
        dcn = TwitterDCN(patch_size=32, n_features=8)
        out = train_dcn(dcn, {'n_epochs': 3, 'batch_size': 2, 'patch_size': 32,
                              'validation_schedule': 2}, rgb, directory=out_root)
        prog = json.load(open(os.path.join(out, 'progress.json')))
        assert prog['codec']['model'] == 'TwitterDCN'
        assert 'codebook' in prog['codec']
        assert len(prog['codec']['performance']['ssim']['validation']) >= 1
        assert os.path.isfile(os.path.join(out, 'twitterdcn.npz'))

    def test_resume_continues_state(self, data_dir, tmp_path_factory):
        """--resume parity gate (ref train_dcn.py:55), mirroring the NIP
        `resume-nip` gate: epoch counter, metric history, weights AND the
        orbax optimizer state (Adam moments) must all continue."""
        import jax
        from neural_imaging_tpu.models.compression import TwitterDCN
        from neural_imaging_tpu.training.compression import train_dcn
        rgb = Dataset(data_dir, load='y', n_images=4, v_images=2,
                      val_rgb_patch_size=32, val_n_patches=2, randomize=3)
        out_root = str(tmp_path_factory.mktemp('dcn_resume'))
        spec = {'n_epochs': 3, 'batch_size': 2, 'patch_size': 32,
                'validation_schedule': 2}
        dcn = TwitterDCN(patch_size=32, n_features=8)
        out = train_dcn(dcn, dict(spec), rgb, directory=out_root)
        prog = json.load(open(os.path.join(out, 'progress.json')))
        assert prog['training_spec']['current_epoch'] == 2
        n_train_points = len(prog['codec']['performance']['loss']['training'])
        assert os.path.isdir(os.path.join(out, 'orbax'))

        # fresh model object, as a new process would construct it
        dcn2 = TwitterDCN(patch_size=32, n_features=8)
        out2 = train_dcn(dcn2, dict(spec, n_epochs=5), rgb, directory=out_root,
                         resume=True)
        assert out2 == out
        # Adam moments restored and advanced (not a fresh optimizer)
        counts = [int(x) for x in jax.tree_util.tree_leaves(dcn2.opt_state)
                  if getattr(x, 'ndim', None) == 0 and x.dtype.kind == 'i']
        assert counts and max(counts) > 0
        prog2 = json.load(open(os.path.join(out, 'progress.json')))
        assert prog2['training_spec']['current_epoch'] == 4
        assert len(prog2['codec']['performance']['loss']['training']) > n_train_points

        # without --resume the existing directory is skipped, not retrained
        dcn3 = TwitterDCN(patch_size=32, n_features=8)
        out3 = train_dcn(dcn3, dict(spec), rgb, directory=out_root)
        prog3 = json.load(open(os.path.join(out, 'progress.json')))
        assert out3 == out and prog3 == prog2


class TestValidationAndLogs:
    @pytest.fixture(scope='class')
    def flow(self):
        from neural_imaging_tpu.workflows import ManipulationClassification
        return ManipulationClassification(
            'INet', manipulations=['sharpen:1'],
            distribution={'downsampling': 'none', 'compression': 'none'},
            fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 1},
            trainable={'nip'}, raw_patch_size=32)

    def test_validate_fan(self, flow, data):
        from neural_imaging_tpu.training import validation
        accuracy, conf = validation.validate_fan(flow, data)
        assert 0 <= accuracy <= 1
        assert conf.shape == (2, 2)
        assert np.allclose(conf.sum(axis=1), 1, atol=1e-6)

    def test_validate_fan_randomized(self, flow, data):
        # randomized-strength validation: repeats aggregate independent draws
        from neural_imaging_tpu.training import validation
        accuracy, conf = validation.validate_fan(flow, data, randomize=True,
                                                 repeats=2)
        assert 0 <= accuracy <= 1
        assert conf.shape == (2, 2)
        assert np.allclose(conf.sum(axis=1), 1, atol=1e-6)

    def test_validate_nip(self, flow, data, tmp_path):
        from neural_imaging_tpu.training import validation
        ssims, psnrs, losses = validation.validate_nip(flow.nip, data, str(tmp_path))
        assert len(ssims) == data.count_validation
        assert all(0 < s <= 1 for s in ssims)
        assert any(f.startswith('nip_validation') for f in os.listdir(tmp_path))

    def test_validate_jpeg(self, data):
        from neural_imaging_tpu.models.jpeg import JPEG
        from neural_imaging_tpu.training import validation
        out = validation.validate_jpeg(JPEG(80, 'soft'), data)
        assert out['psnr'] > 25 and 0.5 < out['ssim'] <= 1

    def test_training_json_schema(self, flow, data, tmp_path):
        from neural_imaging_tpu.training import validation
        flow.fan.log_metric('accuracy', 'validation', 0.5)
        flow.fan.performance['confusion'] = np.eye(2).tolist()
        validation.save_training_progress({'Classes': str(flow._forensics_classes)},
                                          flow, str(tmp_path))
        log = json.load(open(tmp_path / 'training.json'))
        for key in ('summary', 'distribution', 'manipulations', 'nip', 'forensics'):
            assert key in log, key
        assert log['forensics']['performance']['accuracy']['validation'] == [0.5]

    def test_visualization(self, flow, tmp_path):
        from neural_imaging_tpu.training import validation
        flow.fan.performance['confusion'] = np.eye(2).tolist()
        validation.visualize_manipulation_training(flow, 0, str(tmp_path))
        assert any(f.startswith('manip_validation') for f in os.listdir(tmp_path))


class TestResultsData:
    def test_nip_stats_and_cache(self, data, tmp_path):
        from neural_imaging_tpu.models import pipelines
        from neural_imaging_tpu.training.pipeline import train_nip_model
        from neural_imaging_tpu.utils import results_data

        out_root = str(tmp_path / 'models' / 'nip')
        m = pipelines.INet(patch_size=32)
        train_nip_model(m, 'CamA', n_epochs=2, validation_schedule=1, patch_size=32,
                        batch_size=2, data=data, out_directory_root=out_root)
        df = results_data.nip_stats(out_root)
        assert len(df) == 1 and df.iloc[0]['camera'] == 'CamA'
        assert df.iloc[0]['psnr'] > 30

    def test_confusion_to_text(self):
        from neural_imaging_tpu.utils import results_data
        conf = np.array([[90.0, 10.0], [20.0, 80.0]])
        txt = results_data.confusion_to_text(conf, ['native', 'sharpen'])
        assert 'native' in txt and '90' in txt
        tex = results_data.confusion_to_text(conf, ['native', 'sharpen'], fmt='tex')
        assert '\\begin{tabular}' in tex

    def test_convert_table_formats(self):
        from neural_imaging_tpu.utils import results_data
        conf = np.arange(6, dtype=float).reshape(2, 3) * 10
        txt = results_data.convert_table(conf, ['a', 'b', 'c'], labels_rows=['r1', 'r2'])
        assert 'r1' in txt
        df = results_data.convert_table(conf, ['a', 'b', 'c'], fmt='df',
                                        labels_rows=['r1', 'r2'])
        assert df.shape == (2, 3)
        csv = results_data.convert_table(conf, ['a', 'b', 'c'], fmt='csv',
                                         labels_rows=['r1', 'r2'])
        assert csv.count(',') >= 6

    def test_result_cache(self, tmp_path):
        from neural_imaging_tpu.utils import results_data
        cache = results_data.ResultCache(['exp_{name}', '{size}px', 'results.json'],
                                         str(tmp_path), name='demo')
        cache.save({'value': 42}, size=64)
        assert cache.load(size=64)['value'] == 42
        found = cache.find()
        assert len(found) == 1
        with pytest.raises(FileExistsError):
            cache.save({'value': 1}, size=64)


class TestProfiling:
    def test_step_timer(self):
        from neural_imaging_tpu.utils.profiling import StepTimer
        t = StepTimer(warmup=1)
        for _ in range(4):
            with t.step():
                sum(range(1000))
        s = t.summary()
        assert s['steps'] == 3 and s['steps_per_sec'] > 0

    def test_scalar_log(self, tmp_path):
        from neural_imaging_tpu.utils.profiling import ScalarLog
        log = ScalarLog(str(tmp_path / 'scalars.jsonl'))
        log.log(0, loss=1.5)
        log.log(1, loss=1.2, acc=0.7)
        log.close()
        records = ScalarLog.read(str(tmp_path / 'scalars.jsonl'))
        assert records[1]['acc'] == 0.7

    def test_compiled_stats(self):
        import jax.numpy as jnp
        from neural_imaging_tpu.utils.profiling import compiled_stats
        stats = compiled_stats(lambda x: x @ x, jnp.ones((64, 64)))
        assert isinstance(stats, dict)

    def test_hlo_traffic_ranking(self):
        """Per-instruction traffic report: the matmul must rank first and its
        byte count must equal operands + output exactly."""
        import jax.numpy as jnp
        import numpy as np
        from neural_imaging_tpu.utils.profiling import hlo_traffic

        def f(x, w):
            return jnp.tanh(x @ w).sum()

        x = np.ones((256, 512), np.float32)
        w = np.ones((512, 128), np.float32)
        rep = hlo_traffic(f, x, w, top=4)
        assert rep and rep[0]['total_bytes'] > 0
        by_op = {r['op_name']: r for r in rep}
        dot = next(r for k, r in by_op.items() if 'dot' in k)
        assert dot['bytes'] == (256 * 512 + 512 * 128 + 256 * 128) * 4


class TestScannedDeviceDataTraining:
    """The lax.scan multi-step trainers with in-graph sampling (device_data):
    one dispatch per chunk, per-step losses returned on device."""

    def test_nip_training_scan_learns(self, data):
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        from neural_imaging_tpu.models import pipelines

        m = pipelines.UNet(patch_size=8, n_steps=2)
        sampler = DeviceSampler(data, batch_size=2, rgb_patch_size=16, seed=3)
        losses = np.asarray(m.training_scan(sampler, 12, 1e-3))
        assert losses.shape == (12,)
        assert np.isfinite(losses).all()
        more = np.asarray(m.training_scan(sampler, 12, 1e-3))
        assert more[-4:].mean() < losses[:4].mean()  # loss decreases over 24 steps

    def test_workflow_training_scan(self, data):
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        from neural_imaging_tpu.workflows import ManipulationClassification

        flow = ManipulationClassification(
            'INet', manipulations=['sharpen:1'],
            distribution={'downsampling': 'none', 'compression': 'none'},
            fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 0},
            trainable={'nip'}, raw_patch_size=16)
        sampler = DeviceSampler(data, batch_size=2, rgb_patch_size=32, seed=5)
        losses, nip_losses = flow.training_scan(sampler, 6, lambda_nip=0.1,
                                                learning_rate=1e-4)
        assert np.asarray(losses).shape == (6,)
        assert np.isfinite(np.asarray(losses)).all()
        flow.assert_finite()  # consumes the stacked finite flags

    def test_train_nip_model_device_data_loop(self, data, tmp_path_factory):
        """The full train_nip_model loop on the device_data path: per-epoch
        loss history, validation metrics and artifacts all produced."""
        from neural_imaging_tpu.models import pipelines
        from neural_imaging_tpu.training.pipeline import train_nip_model

        out = str(tmp_path_factory.mktemp('nip_dd'))
        m = pipelines.INet(patch_size=8)
        train_nip_model(m, 'cam', n_epochs=5, validation_schedule=2,
                        patch_size=8, batch_size=2, data=data,
                        out_directory_root=out, device_data=True)
        assert len(m.performance['loss']['training']) == 5
        assert m.performance['psnr']['validation']
        assert os.path.isfile(os.path.join(out, 'cam', m.model_code,
                                           'inet', 'progress.json'))

    def test_dcn_training_scan(self, data_dir):
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        from neural_imaging_tpu.models.compression import TwitterDCN

        data = Dataset(data_dir, load='y', n_images=4, v_images=2,
                       val_rgb_patch_size=32, val_n_patches=1, randomize=9)
        dcn = TwitterDCN(patch_size=32, n_features=4)
        sampler = DeviceSampler(data, batch_size=2, rgb_patch_size=32)
        out = dcn.training_scan(sampler, 6, 1e-3)
        for key in ('loss', 'ssim', 'entropy'):
            arr = np.asarray(out[key])
            assert arr.shape == (6,) and np.isfinite(arr).all()


class TestSweepCompileReuse:
    """λ/repetition sweeps reuse compiled programs across points: structural
    sampler signatures (data as traced args) + flow.reinitialize()."""

    def test_sampler_signature_is_structural(self, data):
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        a = DeviceSampler(data, batch_size=2, rgb_patch_size=32, seed=1)
        b = DeviceSampler(data, batch_size=2, rgb_patch_size=32, seed=99)
        assert a.signature() == b.signature()  # seed is not structural
        c = DeviceSampler(data, batch_size=4, rgb_patch_size=32, seed=1)
        assert a.signature() != c.signature()

    def test_workflow_reinitialize_repeats_trajectory_without_recompiles(self, data):
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        from neural_imaging_tpu.workflows import ManipulationClassification

        flow = ManipulationClassification(
            'INet', manipulations=['sharpen:1'],
            distribution={'downsampling': 'none', 'compression': 'none'},
            fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 0},
            trainable={'nip'}, raw_patch_size=16, rng_seed=3)
        sampler = DeviceSampler(data, batch_size=2, rgb_patch_size=32, seed=5)
        first, _ = flow.training_scan(sampler, 5, lambda_nip=0.1,
                                      learning_rate=1e-4)
        first = np.asarray(first)
        n_compiled = len(flow._jitted)

        # second sweep point: fresh sampler object, same geometry
        flow.reinitialize()
        sampler2 = DeviceSampler(data, batch_size=2, rgb_patch_size=32, seed=5)
        second, _ = flow.training_scan(sampler2, 5, lambda_nip=0.1,
                                       learning_rate=1e-4)
        np.testing.assert_array_equal(first, np.asarray(second))
        assert len(flow._jitted) == n_compiled  # no new executables

        # a different λ at the SAME executable (λ is a traced argument)
        flow.reinitialize()
        third, _ = flow.training_scan(sampler2, 5, lambda_nip=0.3,
                                      learning_rate=1e-4)
        assert len(flow._jitted) == n_compiled
        assert not np.array_equal(first, np.asarray(third))
        flow.assert_finite()

    def test_nip_scan_cache_shared_across_samplers(self, data):
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        from neural_imaging_tpu.models import pipelines

        m = pipelines.INet(patch_size=8)
        s1 = DeviceSampler(data, batch_size=2, rgb_patch_size=16, seed=3)
        s2 = DeviceSampler(data, batch_size=2, rgb_patch_size=16, seed=4)
        m.training_scan(s1, 4, 1e-3)
        m.training_scan(s2, 4, 1e-3)
        assert len(m._scan_jits) == 1

    def test_dcn_scan_cache_shared_across_samplers(self, data_dir):
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        from neural_imaging_tpu.models.compression import TwitterDCN

        data = Dataset(data_dir, load='y', n_images=4, v_images=2,
                       val_rgb_patch_size=32, val_n_patches=1, randomize=9)
        dcn = TwitterDCN(patch_size=32, n_features=4)
        s1 = DeviceSampler(data, batch_size=2, rgb_patch_size=32, seed=1)
        s2 = DeviceSampler(data, batch_size=2, rgb_patch_size=32, seed=2)
        dcn.training_scan(s1, 3, 1e-3)
        dcn.training_scan(s2, 3, 1e-3)
        assert len(dcn._scan_jits) == 1

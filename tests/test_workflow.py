"""Tests for the joint manipulation-classification workflow."""
import numpy as np
import pytest

from neural_imaging_tpu.workflows import ManipulationClassification


@pytest.fixture(scope='module')
def batch():
    rng = np.random.default_rng(11)
    bx = rng.random((2, 16, 16, 4)).astype(np.float32)
    by = rng.random((2, 32, 32, 3)).astype(np.float32)
    return bx, by


@pytest.fixture(scope='module')
def flow():
    return ManipulationClassification(
        'INet', manipulations=['sharpen:1', 'gaussian:1'],
        distribution={'downsampling': 'none', 'compression': 'none'},
        fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 1},
        trainable={'nip'}, raw_patch_size=16)


class TestConstruction:
    def test_classes(self, flow):
        assert flow.n_classes == 3
        assert flow._forensics_classes == ['native', 'sharpen:1', 'gaussian:1']
        assert set(flow.trainable_models) == {'fan', 'nip'}

    def test_default_distribution(self):
        f = ManipulationClassification(
            'INet', manipulations=['sharpen'], raw_patch_size=16,
            fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 1})
        assert f.downsampling_factor == 2
        assert f.codec is not None and f.codec.quality == 50

    def test_invalid_nip(self):
        with pytest.raises((ValueError, AttributeError)):
            ManipulationClassification('NopeNet', raw_patch_size=16)

    def test_invalid_manipulation(self):
        with pytest.raises(ValueError):
            ManipulationClassification('INet', manipulations=['warp'], raw_patch_size=16)

    def test_patch_size_guard(self):
        with pytest.raises(ValueError):
            ManipulationClassification('INet', raw_patch_size=8)

    def test_summaries(self, flow):
        assert 'INet' in flow.summary()
        assert 'FAN' in flow.summary_compact()
        assert 'Manipulations : 3' in flow.details()


@pytest.mark.slow
class TestForward:
    def test_run_workflow_shapes(self, flow, batch):
        bx, _ = batch
        Y, c, C, entropy, probs = flow.run_workflow(bx)
        assert np.asarray(Y).shape == (2, 32, 32, 3)
        assert np.asarray(c).shape == (6, 32, 32, 3)   # (K+1) * batch
        assert np.asarray(C).shape == (6, 32, 32, 3)
        assert np.asarray(probs).shape == (6, 3)
        assert np.allclose(np.asarray(probs).sum(axis=1), 1, atol=1e-5)

    def test_decisions(self, flow, batch):
        bx, _ = batch
        decisions = flow.run_workflow_to_decisions(bx)
        assert decisions.shape == (6,)
        assert ((decisions >= 0) & (decisions < 3)).all()

    def test_labels(self, flow):
        assert np.array_equal(flow._batch_labels(2), [0, 0, 1, 1, 2, 2])

    def test_manipulations_expand_batch(self, flow, batch):
        _, by = batch
        out = np.asarray(flow.run_manipulations(by))
        assert out.shape == (6, 32, 32, 3)
        assert np.allclose(out[:2], by)  # first copy is native

    def test_randomized_manipulations(self, flow, batch):
        _, by = batch
        a = np.asarray(flow.run_manipulations(by, randomize=True))
        b = np.asarray(flow.run_manipulations(by, randomize=True))
        assert a.shape == (6, 32, 32, 3)
        assert not np.allclose(a[2:], b[2:])  # different random strengths


@pytest.mark.slow
class TestChannels:
    def test_jpeg_channel(self, batch):
        bx, _ = batch
        f = ManipulationClassification(
            'INet', manipulations=['sharpen'],
            distribution={'downsampling': 'pool:2', 'compression': 'jpeg',
                          'compression_params': {'quality': 60, 'codec': 'soft'}},
            fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 1},
            raw_patch_size=16)
        Y, c, C, entropy, probs = f.run_workflow(bx)
        assert np.asarray(c).shape == (4, 16, 16, 3)  # downsampled by 2
        assert np.asarray(probs).shape == (4, 2)

    def test_bilinear_downsampling(self, batch):
        bx, _ = batch
        f = ManipulationClassification(
            'INet', manipulations=['sharpen'],
            distribution={'downsampling': 'bilinear', 'compression': 'none'},
            fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 1},
            raw_patch_size=16)
        _, c, *_ = f.run_workflow(bx)
        assert np.asarray(c).shape == (4, 16, 16, 3)

    def test_fused_pooled_expansion_matches_two_op_form(self):
        """_manipulate(pool=True) — per-branch pooling with exact folded
        gaussian/resample kernels — must equal pool(_manipulate(...)). Kept as
        a correct alternative even though the two-op form measured FASTER on
        TPU (XLA fuses concat into the pooling reduce-window; per-branch
        pooling fragments it — docs/benchmarks.md)."""
        import jax
        import jax.numpy as jnp
        from neural_imaging_tpu.ops import ops
        f = ManipulationClassification(
            'INet', manipulations=['sharpen', 'resample', 'gaussian', 'jpeg'],
            distribution={'downsampling': 'pool:2', 'compression': 'none'},
            fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 1},
            raw_patch_size=16)
        y = jnp.asarray(np.random.default_rng(3).random((2, 32, 32, 3)),
                        jnp.float32)
        key = jax.random.PRNGKey(0)
        ref = ops.avg_pool(f._manipulate(y, key), 2)
        fused = f._manipulate(y, key, pool=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.slow
class TestTraining:
    def test_training_step_runs_and_syncs(self, flow, batch):
        bx, by = batch
        loss, parts = flow.training_step(bx, by, lambda_nip=0.1)
        assert np.isfinite(float(loss))
        assert set(parts) == {'ce', 'nip', 'dcn'}
        # shells see the updated params
        assert flow.fan.params is flow.params['fan']

    def test_fan_learns_identity_vs_blur(self):
        """Joint training should separate native from a strong gaussian blur."""
        rng = np.random.default_rng(0)
        f = ManipulationClassification(
            'ONet', manipulations=['gaussian:3'],
            distribution={'downsampling': 'none', 'compression': 'none'},
            fan_args={'n_convolutions': 2, 'n_filters': 16, 'n_dense': 1},
            raw_patch_size=16)
        bx = rng.random((8, 32, 32, 3)).astype(np.float32)
        for i in range(120):
            loss, _ = f.training_step(bx, bx, learning_rate=2e-3)
        decisions = f.run_workflow_to_decisions(bx)
        labels = f._batch_labels(8)
        accuracy = np.mean(decisions == labels)
        assert accuracy > 0.85, f'accuracy {accuracy}'

    def test_augmented_training_step(self, flow, batch):
        bx, by = batch
        loss, _ = flow.training_step(bx, by, augment=True)
        assert np.isfinite(float(loss))

    def test_trainable_dcn_guard(self):
        with pytest.raises(ValueError):
            ManipulationClassification(
                'INet', manipulations=['sharpen'],
                distribution={'downsampling': 'none', 'compression': 'none'},
                trainable={'dcn'}, raw_patch_size=16,
                fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 1})


@pytest.mark.slow
class TestRemat:
    def test_remat_matches_default(self, batch):
        """jax.checkpoint over the acquisition stage must not change results."""
        bx, by = batch
        kwargs = dict(manipulations=['sharpen:1'],
                      distribution={'downsampling': 'none', 'compression': 'none'},
                      fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 1},
                      trainable={'nip'}, raw_patch_size=16)
        f1 = ManipulationClassification('INet', **kwargs)
        f2 = ManipulationClassification('INet', remat=True, **kwargs)
        l1, _ = f1.training_step(bx, by, lambda_nip=0.1)
        l2, _ = f2.training_step(bx, by, lambda_nip=0.1)
        assert abs(float(l1) - float(l2)) / max(abs(float(l1)), 1e-9) < 1e-5


@pytest.mark.slow
class TestTrainableJPEG:
    def test_qtables_update_in_joint_training(self, batch):
        """A trainable dJPEG channel must receive gradients through the chain."""
        bx, by = batch
        f = ManipulationClassification(
            'INet', manipulations=['sharpen:1'],
            distribution={'downsampling': 'none', 'compression': 'jpeg',
                          'compression_params': {'quality': 50, 'codec': 'soft',
                                                 'trainable': True}},
            fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 1},
            trainable={'dcn'}, raw_patch_size=16)
        q0 = np.array(f.codec._model.q_mtx_luma)
        for _ in range(3):
            loss, parts = f.training_step(bx, by, lambda_dcn=0.5)
        assert np.isfinite(float(loss))
        q1 = np.array(f.codec._model.q_mtx_luma)
        assert not np.allclose(q0, q1), 'quantization tables did not update'
        assert 1 <= f.codec.estimate_qf() <= 100


@pytest.mark.slow
class TestOtherNIPsInWorkflow:
    @pytest.mark.parametrize('nip', ['ClassicISP', 'UNet', 'DNet'])
    def test_workflow_with_nip(self, nip, batch):
        bx, by = batch
        f = ManipulationClassification(
            nip, manipulations=['sharpen:1'],
            distribution={'downsampling': 'none', 'compression': 'none'},
            fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 1},
            trainable={'nip'} if nip != 'ClassicISP' else None,
            raw_patch_size=16)
        loss, _ = f.training_step(bx, by, lambda_nip=0.1)
        assert np.isfinite(float(loss))


@pytest.mark.slow
class TestDeterminism:
    def test_same_seed_same_trajectory(self, batch):
        bx, by = batch
        kwargs = dict(manipulations=['sharpen:1', 'gaussian:1'],
                      distribution={'downsampling': 'none', 'compression': 'none'},
                      fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 1},
                      trainable={'nip'}, raw_patch_size=16, rng_seed=42)
        f1 = ManipulationClassification('INet', **kwargs)
        f2 = ManipulationClassification('INet', **kwargs)
        for _ in range(3):
            l1, _ = f1.training_step(bx, by, lambda_nip=0.1)
            l2, _ = f2.training_step(bx, by, lambda_nip=0.1)
        assert float(l1) == float(l2)


@pytest.mark.slow
class TestChannelDtype:
    def test_bfloat16_channel_tracks_float32(self):
        """bfloat16 distribution channel: finite training, CE trajectory within
        noise of the f32 path (losses/dJPEG internals stay f32)."""
        import jax.numpy as jnp
        from neural_imaging_tpu.workflows import ManipulationClassification

        def make(dt):
            f = ManipulationClassification(
                'INet', manipulations=['sharpen:1', 'gaussian:0.83', 'jpeg:80'],
                distribution={'downsampling': 'pool:2', 'compression': 'jpeg',
                              'compression_params': {'quality': 50, 'codec': 'soft'}},
                fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 0},
                trainable={'nip'}, raw_patch_size=16, channel_dtype=dt, rng_seed=7)
            f.nan_check = False
            return f

        rng = np.random.default_rng(0)
        bx = rng.random((4, 16, 16, 4)).astype(np.float32)
        by = rng.random((4, 32, 32, 3)).astype(np.float32)
        losses = {}
        for dt in ('float32', 'bfloat16'):
            f = make(dt)
            losses[dt] = [float(f.training_step(bx, by, lambda_nip=0.1,
                                                learning_rate=1e-3)[0])
                          for _ in range(4)]
            f.assert_finite()
            # FAN sees the channel dtype; probabilities are f32
            *_, probs = f.run_workflow(bx)
            assert probs.dtype == jnp.float32
        for a, b in zip(losses['float32'], losses['bfloat16']):
            assert abs(a - b) / abs(a) < 1e-3

    def test_invalid_dtype_rejected(self):
        from neural_imaging_tpu.workflows import ManipulationClassification
        with pytest.raises(ValueError):
            ManipulationClassification('INet', raw_patch_size=16,
                                       channel_dtype='float16')


@pytest.mark.slow
class TestManipJpegDtype:
    """manip_jpeg_dtype='bfloat16': the 'jpeg' MANIPULATION branch runs its
    dJPEG in bf16 at DEFAULT matmul precision (the round-5 device trace showed
    the default f32/HIGHEST transform there as the largest single segment of
    the benched step). Unlike channel_dtype, this genuinely changes the branch
    compute dtype, so outputs track f32 at bf16 tolerance, not exactly."""

    def _make(self, manip_dt, randomizable=False):
        return ManipulationClassification(
            'INet', manipulations=['sharpen:1', 'jpeg:80'],
            distribution={'downsampling': 'pool:2', 'compression': 'none'},
            fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 0},
            trainable={'nip'}, raw_patch_size=16, rng_seed=7,
            manip_jpeg_dtype=manip_dt)

    def test_bf16_branch_tracks_float32(self):
        rng = np.random.default_rng(4)
        by = rng.random((2, 32, 32, 3)).astype(np.float32)
        outs = {}
        for dt in (None, 'bfloat16'):
            f = self._make(dt)
            outs[dt] = np.asarray(f.run_manipulations(by)).astype(np.float32)
        # native + sharpen branches are untouched by the knob
        np.testing.assert_allclose(outs[None][:4], outs['bfloat16'][:4],
                                   atol=1e-6)
        # jpeg branch agrees within bf16 round-trip tolerance. Random noise is
        # the adversarial input here: DCT coefficients land near quantization
        # boundaries and individual ones flip sides under bf16 rounding, so a
        # few pixels differ by a sizeable fraction of a quantization step —
        # the bulk of the image must still agree tightly.
        jp32, jp16 = outs[None][4:], outs['bfloat16'][4:]
        assert np.abs(jp32 - jp16).mean() < 0.02
        assert np.quantile(np.abs(jp32 - jp16), 0.99) < 0.08
        assert np.abs(jp32 - jp16).max() < 0.3

    def test_training_and_randomized_paths_finite(self):
        rng = np.random.default_rng(5)
        bx = rng.random((2, 16, 16, 4)).astype(np.float32)
        by = rng.random((2, 32, 32, 3)).astype(np.float32)
        f = self._make('bfloat16')
        f.nan_check = False
        loss, _ = f.training_step(bx, by, lambda_nip=0.1, learning_rate=1e-3)
        assert np.isfinite(float(loss))
        loss, _ = f.training_step(bx, by, lambda_nip=0.1, learning_rate=1e-3,
                                  augment=True)  # traced-strength bf16 branch
        assert np.isfinite(float(loss))
        f.assert_finite()
        a = np.asarray(f.run_manipulations(by, randomize=True))
        b = np.asarray(f.run_manipulations(by, randomize=True))
        assert a.shape == (6, 32, 32, 3)
        assert not np.allclose(a[4:], b[4:])  # jpeg strength still randomizes

    def test_invalid_value_rejected(self):
        with pytest.raises(ValueError):
            ManipulationClassification('INet', raw_patch_size=16,
                                       manip_jpeg_dtype='float16')

"""
Golden-oracle numeric parity with the reference implementation (the 0.1 dB
north-star, BASELINE.md).

Float64 NumPy re-derivations of the reference math:

- dJPEG: pad-trick color affines, 8x8 blockify, DCT as matmuls against the
  reference's 4-decimal DCT matrix, per-channel quantization-table tiling and
  sin/soft/harmonic rounding (ref models/jpeg.py:91-159, models/layers.py:122-141);
- INet: fixed-init upsample conv -> depth_to_space -> reflect pad -> bilinear
  demosaic conv -> sRGB 1x1 -> 2-layer tanh gamma net with straight-through clip
  (ref models/pipelines.py:233-295, helpers/kernels.py:9-106).

The JAX paths must match the oracle within 0.1 dB PSNR (and agree with its output
pixel-for-pixel at >=50 dB), across the quality range. These tests fail if the
framework's numerics drift.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_imaging_tpu.compression.jpeg_helpers import jpeg_qtable
from neural_imaging_tpu.models.jpeg import jpeg_forward

# compile-heavy: excluded from the sub-5-minute smoke profile
# (`pytest -m 'not slow'`); the full default suite still runs these
pytestmark = pytest.mark.slow

# ------------------------------------------------------------------------------
# Reference constants (models/jpeg.py:74-86) — independent of the framework's own
# ops modules on purpose: these are transcribed from the reference so the oracle
# cannot inherit a framework bug.
# ------------------------------------------------------------------------------

REF_COLOR_F = np.array([[0, 0.299, 0.587, 0.114],
                        [128, -0.168736, -0.331264, 0.5],
                        [128, 0.5, -0.418688, -0.081312]], dtype=np.float64)
REF_COLOR_I = np.array([[-1.402 * 128, 1, 0, 1.402],
                        [1.058272 * 128, 1, -0.344136, -0.714136],
                        [-1.772 * 128, 1, 1.772, 0]], dtype=np.float64)
REF_DCT = np.array(
    [[0.3536, 0.3536, 0.3536, 0.3536, 0.3536, 0.3536, 0.3536, 0.3536],
     [0.4904, 0.4157, 0.2778, 0.0975, -0.0975, -0.2778, -0.4157, -0.4904],
     [0.4619, 0.1913, -0.1913, -0.4619, -0.4619, -0.1913, 0.1913, 0.4619],
     [0.4157, -0.0975, -0.4904, -0.2778, 0.2778, 0.4904, 0.0975, -0.4157],
     [0.3536, -0.3536, -0.3536, 0.3536, 0.3536, -0.3536, -0.3536, 0.3536],
     [0.2778, -0.4904, 0.0975, 0.4157, -0.4157, -0.0975, 0.4904, -0.2778],
     [0.1913, -0.4619, 0.4619, -0.1913, -0.1913, 0.4619, -0.4619, 0.1913],
     [0.0975, -0.2778, 0.4157, -0.4904, 0.4904, -0.4157, 0.2778, -0.0975]],
    dtype=np.float64)


def psnr(a, b, max_value=1.0):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10.0 * np.log10(max_value ** 2 / mse)


def _round_approx(x, rounding, taylor_terms=5):
    """Reference rounding approximations (models/layers.py:122-141) in f64.
    Forward values only (gradients are exercised separately)."""
    if rounding == 'sin':
        return x - np.sin(2 * np.pi * x) / (2 * np.pi)
    if rounding == 'soft':
        return np.round(x)  # forward pass of the straight-through estimator
    if rounding == 'harmonic':
        xa = x - np.sin(2 * np.pi * x) / np.pi
        for k in range(2, taylor_terms):
            xa = xa + (-1.0) ** k * np.sin(2 * np.pi * k * x) / (k * np.pi)
        return xa
    raise ValueError(rounding)


def oracle_djpeg(x, q_luma, q_chroma, rounding='soft', taylor_terms=5):
    """Reference DifferentiableJPEG.call (models/jpeg.py:91-159) in float64."""
    x = np.asarray(x, np.float64)
    n, h, w, _ = x.shape
    ql = np.asarray(q_luma, np.float64)
    qc = np.asarray(q_chroma, np.float64)

    # RGB -> YCbCr via the pad-trick conv: out[k] = F[k,0] + sum_c F[k,c+1]*255*x_c
    xc = np.concatenate([np.ones((n, h, w, 1)), 255.0 * x], axis=-1)
    ycc = np.einsum('nhwc,kc->nhwk', xc, REF_COLOR_F)

    # blockify (N,H,W,3) -> (N,3,hb,wb,8,8) and DCT: D X D^T
    p = (ycc - 127.0).transpose(0, 3, 1, 2)
    blocks = p.reshape(n, 3, h // 8, 8, w // 8, 8).transpose(0, 1, 2, 4, 3, 5)
    X = np.einsum('ij,ncuvjk,lk->ncuvil', REF_DCT, blocks, REF_DCT)

    # per-channel table tiling: Y -> luma, Cb/Cr -> chroma
    Q = np.stack([ql, qc, qc])[None, :, None, None, :, :]
    Xq = _round_approx(X / Q, rounding, taylor_terms) * Q

    # IDCT: D^T X D, deblockify, inverse color transform
    xi = np.einsum('ji,ncuvjk,kl->ncuvil', REF_DCT, Xq, REF_DCT)
    q = xi.transpose(0, 2, 4, 3, 5, 1).reshape(n, h, w, 3)
    qc4 = np.concatenate([np.ones((n, h, w, 1)), q + 127.0], axis=-1)
    y = np.einsum('nhwc,kc->nhwk', qc4, REF_COLOR_I) / 255.0
    return np.clip(y, 0.0, 1.0), Xq


@pytest.fixture(scope='module')
def rgb_batch():
    rng = np.random.default_rng(42)
    # smooth-ish content (random lowpass) + noise: exercises both DC-heavy and
    # high-frequency blocks
    base = rng.random((2, 32, 32, 3)).astype(np.float32)
    k = np.ones((5, 5)) / 25.0
    smooth = np.stack([[
        np.convolve(im[:, :, c].ravel(), k.ravel(), 'same').reshape(32, 32)
        for c in range(3)] for im in base]).transpose(0, 2, 3, 1)
    x = np.clip(0.6 * base + 0.4 * (smooth - smooth.min()) / np.ptp(smooth), 0, 1)
    return x.astype(np.float32)


class TestDJPEGReferenceParity:
    @pytest.mark.parametrize('quality', [10, 30, 50, 75, 90, 95])
    def test_psnr_parity_soft(self, rgb_batch, quality):
        ql, qc = jpeg_qtable(quality, 0), jpeg_qtable(quality, 1)
        y_ref, _ = oracle_djpeg(rgb_batch, ql, qc, 'soft')
        y_jax, _ = jpeg_forward(jnp.asarray(rgb_batch), jnp.asarray(ql),
                                jnp.asarray(qc), rounding='soft')
        y_jax = np.asarray(y_jax)

        # 1) the compression quality metric agrees within the 0.1 dB north-star
        d_ref = psnr(rgb_batch, y_ref)
        d_jax = psnr(rgb_batch, y_jax)
        assert abs(d_ref - d_jax) <= 0.1, (
            f'QF{quality}: PSNR {d_jax:.3f} vs oracle {d_ref:.3f}')
        # 2) outputs agree pixel-for-pixel far above the distortion level
        assert psnr(y_jax, y_ref) >= d_ref + 20.0

    @pytest.mark.parametrize('rounding', ['sin', 'harmonic'])
    def test_psnr_parity_approximations(self, rgb_batch, rounding):
        ql, qc = jpeg_qtable(50, 0), jpeg_qtable(50, 1)
        y_ref, _ = oracle_djpeg(rgb_batch, ql, qc, rounding)
        y_jax, _ = jpeg_forward(jnp.asarray(rgb_batch), jnp.asarray(ql),
                                jnp.asarray(qc), rounding=rounding)
        assert abs(psnr(rgb_batch, y_ref) - psnr(rgb_batch, np.asarray(y_jax))) <= 0.1

    def test_coefficients_match(self, rgb_batch):
        """Dequantized DCT coefficients (the (y, X) second output the workflow's
        rate estimate consumes) match the oracle closely."""
        ql, qc = jpeg_qtable(50, 0), jpeg_qtable(50, 1)
        _, X_ref = oracle_djpeg(rgb_batch, ql, qc, 'soft')
        _, X_jax = jpeg_forward(jnp.asarray(rgb_batch), jnp.asarray(ql),
                                jnp.asarray(qc), rounding='soft')
        # reference layout (N*3*nblocks, 8, 8) == ours (N, 3, hb, wb, 8, 8) flattened
        assert np.mean(np.abs(np.asarray(X_jax) - X_ref)) < 0.05
        # quantization levels: identical bucket for ~all coefficients
        Q = np.stack([ql, qc, qc])[None, :, None, None, :, :].astype(np.float64)
        mismatch = np.mean(np.round(np.asarray(X_jax) / Q) != np.round(X_ref / Q))
        assert mismatch < 5e-3


# ------------------------------------------------------------------------------
# INet forward oracle
# ------------------------------------------------------------------------------

# helpers/kernels.py:9-44 — CFA upsampling kernels (4 -> 12 features)
_UPK = {
    'gbrg': [[0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0],
             [0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
             [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0],
             [0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0]],
    'rggb': [[1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
             [0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0],
             [0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0],
             [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1]],
    'bggr': [[0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0],
             [0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0],
             [0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0],
             [0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0]],
}

# helpers/kernels.py:47-69 — pre-trained toy gamma net
_G1K = np.array([2.9542332, 17.780445, 0.6280197, 0.40384966])
_G1B = np.array([0.4047071, 1.1489044, -0.17624384, 0.47826886])
_G2K = np.array([0.44949612, 0.78081024, 0.97692937, -0.24265033])
_G2B = np.array([-0.4702738])

# models/pipelines.py:268-271 — example sRGB conversion (stored transposed)
_SRGB_T = np.array([[1.82691061, -0.65497452, -0.17193617],
                    [-0.00683982, 1.33216381, -0.32532394],
                    [0.06269717, -0.40055895, 1.33786178]], np.float64).T


def _ref_bilin_kernel(kernel):
    """helpers/kernels.py:72-95 in f64."""
    g = np.array([[0, .25, 0], [.25, 1, .25], [0, .25, 0]])
    rb = np.array([[.25, .5, .25], [.5, 1, .5], [.25, .5, .25]])
    dmf = np.zeros((3, 3, 3, 3))
    dmf[:, :, 0, 0] = rb
    dmf[:, :, 1, 1] = g
    dmf[:, :, 2, 2] = rb
    if kernel > 3:
        pad = (kernel - 3) // 2
        dmf = np.pad(dmf, ((pad, pad), (pad, pad), (0, 0), (0, 0)))
    return dmf


def _gamma_kernels64():
    d1k = np.zeros((3, 12))
    d1b = np.zeros(12)
    d2k = np.zeros((12, 3))
    d2b = np.zeros(3)
    for r in range(3):
        d1k[r, r * 4:r * 4 + 4] = _G1K
        d1b[r * 4:r * 4 + 4] = _G1B
        d2k[r * 4:r * 4 + 4, r] = _G2K
        d2b[r] = _G2B[0]
    return d1k, d1b, d2k, d2b


def _depth_to_space(x, block):
    n, h, w, c = x.shape
    co = c // (block * block)
    x = x.reshape(n, h, w, block, block, co)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * block, w * block, co)


def _corr2d_valid(x, k):
    """Cross-correlation (tf.nn.conv2d semantics), VALID padding, f64."""
    n, h, w, ci = x.shape
    kh, kw, _, co = k.shape
    out = np.zeros((n, h - kh + 1, w - kw + 1, co))
    for dy in range(kh):
        for dx in range(kw):
            patch = x[:, dy:dy + out.shape[1], dx:dx + out.shape[2], :]
            out += np.einsum('nhwc,co->nhwo', patch, k[dy, dx])
    return out


def oracle_inet(x, kernel=5, cfa_pattern='gbrg'):
    """Reference INet forward (models/pipelines.py:233-295) in float64."""
    x = np.asarray(x, np.float64)
    upk = np.asarray(_UPK[cfa_pattern], np.float64)
    h12 = np.einsum('nhwc,co->nhwo', x, upk)
    bayer = _depth_to_space(h12, 2)
    pad = (kernel - 1) // 2
    bayer = np.pad(bayer, ((0, 0), (pad, pad), (pad, pad), (0, 0)), 'reflect')
    rgb = _corr2d_valid(bayer, _ref_bilin_kernel(kernel))
    srgb = np.einsum('nhwc,co->nhwo', rgb, _SRGB_T)
    d1k, d1b, d2k, d2b = _gamma_kernels64()
    g = np.tanh(np.einsum('nhwc,co->nhwo', srgb, d1k) + d1b)
    y = np.einsum('nhwc,co->nhwo', g, d2k) + d2b
    return np.clip(y, 0.0, 1.0)


class TestINetReferenceParity:
    @pytest.mark.parametrize('cfa', ['gbrg', 'rggb', 'bggr'])
    def test_forward_matches_oracle(self, cfa):
        from neural_imaging_tpu.models.pipelines import INet
        rng = np.random.default_rng(7)
        x = rng.random((2, 16, 16, 4)).astype(np.float32)

        model = INet(cfa_pattern=cfa)
        y_jax = np.asarray(model.process(x))
        y_ref = oracle_inet(x, kernel=5, cfa_pattern=cfa)

        assert y_jax.shape == y_ref.shape == (2, 32, 32, 3)
        assert psnr(y_jax, y_ref) >= 60.0, f'INet({cfa}) diverges from the oracle'

    def test_kernel_sizes(self):
        from neural_imaging_tpu.models.pipelines import INet
        rng = np.random.default_rng(8)
        x = rng.random((1, 8, 8, 4)).astype(np.float32)
        for k in (3, 7):
            y_jax = np.asarray(INet(kernel=k).process(x))
            y_ref = oracle_inet(x, kernel=k)
            assert psnr(y_jax, y_ref) >= 60.0, f'INet(kernel={k})'


class TestEndToEndQualityParity:
    def test_jpeg_quality_sweep_monotonic_parity(self, rgb_batch):
        """Across the full QF range, the JAX dJPEG's distortion curve tracks the
        oracle's within 0.1 dB everywhere (not just at spot qualities)."""
        deltas = []
        for quality in range(10, 100, 10):
            ql, qc = jpeg_qtable(quality, 0), jpeg_qtable(quality, 1)
            y_ref, _ = oracle_djpeg(rgb_batch, ql, qc, 'soft')
            y_jax, _ = jpeg_forward(jnp.asarray(rgb_batch), jnp.asarray(ql),
                                    jnp.asarray(qc), rounding='soft')
            deltas.append(abs(psnr(rgb_batch, y_ref) -
                              psnr(rgb_batch, np.asarray(y_jax))))
        assert max(deltas) <= 0.1, f'max PSNR delta {max(deltas):.4f} dB'


class TestJointGradients:
    """Finite-difference verification of the ANALYTIC gradients of the full
    joint loss (round-2 VERDICT weak #7: the f64 forward oracles cannot see
    backward-pass bugs).

    Scope: the smooth ('sin') rounding modes, whose analytic gradient IS the
    true derivative — so central differences must match. The straight-through
    modes ('soft', 'soft-codebook') are *defined* to backpropagate a different
    function than they forward (hard round fwd / sin bwd), so FD cannot agree
    there by construction; their backward uses exactly the same code path as
    'sin' (ops/quantization.py::quantize), which these checks pin down.
    """

    def _flow(self, trainable, quality_params):
        from neural_imaging_tpu.workflows import ManipulationClassification
        return ManipulationClassification(
            'INet', manipulations=['sharpen:0.5', 'gaussian:0.8'],
            distribution={'downsampling': 'pool:2', 'compression': 'jpeg',
                          'compression_params': quality_params},
            fan_args={'n_convolutions': 2, 'n_filters': 8, 'n_dense': 0},
            trainable=set(trainable), raw_patch_size=16)

    def _check(self, flow, trainable_keys, l_nip=0.1, l_dcn=0.1):
        import jax
        from jax.test_util import check_grads

        rng = np.random.default_rng(17)
        # keep values mid-range so the clip straight-throughs stay inactive
        # (where clipping engages, forward slope 0 vs STE slope 1 by design)
        bx = (0.3 + 0.3 * rng.random((2, 16, 16, 4))).astype(np.float32)
        by = (0.3 + 0.3 * rng.random((2, 32, 32, 3))).astype(np.float32)
        key = jax.random.PRNGKey(3)
        ql, qc = (jnp.asarray(jpeg_qtable(50, 0)), jnp.asarray(jpeg_qtable(50, 1)))

        frozen = {k: v for k, v in flow.params.items() if k not in trainable_keys}
        tparams = {k: v for k, v in flow.params.items() if k in trainable_keys}

        def loss_fn(tp):
            loss, _ = flow._losses({**frozen, **tp}, jnp.asarray(bx),
                                   jnp.asarray(by), key, ql, qc,
                                   jnp.float32(l_nip), jnp.float32(l_dcn))
            return loss

        check_grads(loss_fn, (tparams,), order=1, modes=['rev'],
                    atol=5e-2, rtol=5e-2)

    def test_fd_joint_loss_wrt_nip_and_fan(self):
        flow = self._flow({'nip'}, {'quality': 50, 'codec': 'sin'})
        self._check(flow, ('nip', 'fan'))

    def test_fd_joint_loss_wrt_trainable_qtables(self):
        flow = self._flow({'dcn'}, {'quality': 50, 'codec': 'sin',
                                    'trainable': True})
        self._check(flow, ('dcn',))

    def test_fd_dcn_loss_wrt_all_params(self):
        """TwitterDCN's full rate-distortion loss (L2 + entropy estimator) wrt
        encoder/decoder/latent-scale params, smooth rounding."""
        import jax
        from jax.test_util import check_grads
        from neural_imaging_tpu.models.compression import TwitterDCN

        dcn = TwitterDCN(patch_size=16, n_features=4, rounding='sin')
        rng = np.random.default_rng(23)
        x = jnp.asarray(0.2 + 0.6 * rng.random((2, 16, 16, 3)), jnp.float32)

        def loss_fn(params):
            y, entropy = dcn._apply(params, x)
            return dcn.loss(x, y, entropy)

        check_grads(loss_fn, (dcn.params,), order=1, modes=['rev'],
                    atol=5e-2, rtol=5e-2)

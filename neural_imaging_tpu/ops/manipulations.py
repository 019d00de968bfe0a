"""
Differentiable image manipulations — the photo-editing operations the forensic
workflow learns to classify (reference helpers/tf_helpers.py:68-213).

All functions are pure NHWC → NHWC maps, safe under jit/vmap/grad. The stochastic
AWGN manipulation takes an explicit PRNG key.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from neural_imaging_tpu.ops import color, ops
from neural_imaging_tpu.ops.kernels import gkern, repeat_2dfilter


@functools.lru_cache()
def _resize_matrix(n_in, n_out):
    """(n_out, n_in) operator of jax.image.resize's 1-D 'bilinear' resize
    (half-pixel centers, antialiased downsampling), extracted EXACTLY by
    probing the (linear, separable) resize with an identity matrix."""
    def probe():
        # escape any enclosing trace — this is a compile-time constant
        with jax.ensure_compile_time_eval():
            return jax.image.resize(jnp.eye(n_in, dtype=jnp.float32),
                                    (n_out, n_in), method='bilinear')
    try:  # build on the host CPU
        with jax.default_device(jax.devices('cpu')[0]):
            m = probe()
    except RuntimeError:
        m = probe()
    return np.asarray(m, np.float32)


@functools.lru_cache()
def _resize_matrix_grouped(n_in, n_out, c):
    """(n_in·c, n_out·c) right-operand form Mᵀ ⊗ I_c: resizes the W axis of a
    flattened (…, W·C) tensor at c-group granularity."""
    return np.kron(_resize_matrix(n_in, n_out).T,
                   np.eye(c, dtype=np.float32)).astype(np.float32)


def resize_bilinear_flat(x, h_out, w_out):
    """jax.image.resize(..., 'bilinear') computed as two DENSE matmuls on the
    flattened (N, H, W·C) layout.

    The stock lowering contracts the spatial axes of C=3-minor NHWC tensors
    whose TPU tile layout is >90% lane padding (round-5 trace); here both
    1-D resizes are canonical minor-dim matmuls on dense tiles. Exact to f32
    roundoff (operators probed from jax.image.resize itself;
    tests/test_ops.py)."""
    n, h, w, c = x.shape
    if h_out == h and w_out == w:
        return x
    dt = x.dtype
    hi = jax.lax.Precision.HIGHEST
    flat = x.reshape(n, h, w * c)
    if h_out != h:
        flat = jnp.matmul(jnp.asarray(_resize_matrix(h, h_out), dt), flat,
                          precision=hi, preferred_element_type=jnp.float32
                          ).astype(dt)
    if w_out != w:
        flat = jnp.matmul(flat, jnp.asarray(_resize_matrix_grouped(w, w_out, c), dt),
                          precision=hi, preferred_element_type=jnp.float32
                          ).astype(dt)
    return flat.reshape(n, h_out, w_out, c)


def resample(x, factor=50, method='bilinear'):
    """Down-and-back-up resampling by a percentage factor (50 → half size)."""
    if 0 < factor <= 1:
        factor = 100 * factor
    size = x.shape[1] * int(factor) // 100
    if method == 'bilinear':
        down = resize_bilinear_flat(x, size, size)
        return resize_bilinear_flat(down, x.shape[1], x.shape[1])
    down = jax.image.resize(x, (x.shape[0], size, size, x.shape[3]), method=method)
    return jax.image.resize(down, (x.shape[0], x.shape[1], x.shape[1], x.shape[3]), method=method)


def awgn(x, strength=0.025, key=None):
    """Additive white Gaussian noise + soft uint8 quantization."""
    if key is None:
        key = jax.random.PRNGKey(0)
    y = x + strength * jax.random.normal(key, x.shape, dtype=x.dtype)
    y = ops.soft_quantization(y)
    return jnp.clip(y, 0, 1)


def gamma(x, strength=2.0):
    """Gamma round-trip: x^s, quantize, then back with x^(1/s)."""
    y = jnp.power(jnp.clip(x, 1e-9, None), strength)
    y = ops.soft_quantization(y)
    return jnp.power(jnp.clip(y, 1.0 / 255, 1), 1.0 / strength)


def median(x, kernel=3):
    """Median filter via sorted sliding-window patches (reflect padded)."""
    kernel = int(kernel)
    if kernel % 2 == 0:
        kernel += 1
    kernel = max(kernel, 1)
    pad = kernel // 2
    xp = ops.pad2d(x, pad, 'reflect')
    # Gather the kernel² shifted views; kernel is a static (small) Python int.
    h, w = x.shape[1], x.shape[2]
    views = [xp[:, dy:dy + h, dx:dx + w, :] for dy in range(kernel) for dx in range(kernel)]
    stack = jnp.stack(views, axis=-1)                    # (N, H, W, C, k²)
    sorted_vals = jnp.sort(stack, axis=-1)
    return sorted_vals[..., (kernel * kernel) // 2]


def gaussian(x, kernel=5, std=0.83, skip_clip=False):
    """Depthwise Gaussian blur (reflect padded)."""
    kernel = int(kernel)
    gk = gkern(kernel, std)
    y = ops.depthwise_conv2d(x, gk, pad_mode='reflect')
    return y if skip_clip else jnp.clip(y, 0, 1)


def _sharpen_filter(strength, hsv):
    gk = np.array([[-0.0833, -0.1667, -0.0833],
                   [-0.1667, 0.0, -0.1667],
                   [-0.0833, -0.1667, -0.0833]])
    gk = strength * gk / np.abs(gk.sum())
    gk[1, 1] = strength + 1
    gfilter = repeat_2dfilter(gk, 3)
    if hsv:
        # identity kernel on the HSV saturation channel (only H and V sharpened)
        gfilter[:, :, 1:2, 1:2] = 0
        gfilter[2, 2, 1:2, 1:2] = 1
    return gfilter.astype(np.float32)


def sharpen(x, strength=1.0, hsv=True):
    """Unsharp-mask style sharpening, optionally applied in HSV space."""
    gfilter = _sharpen_filter(float(strength), hsv)
    kpc = gfilter[:, :, range(3), range(3)]          # diagonal: (k, k, 3)
    if hsv:
        y = color.rgb_to_hsv(x)
        y = ops.depthwise_conv2d(y, kpc, pad_mode='symmetric')
        y = color.hsv_to_rgb(y)
    else:
        y = ops.depthwise_conv2d(x, kpc, pad_mode='symmetric')
    return jnp.clip(y, 0, 1)


def gaussian_pooled(x, kernel=5, std=0.83):
    """Exact ``avg_pool(gaussian(x), 2)`` as ONE strided conv.

    avg-pool(2) after a conv is itself a conv: the composite kernel is the
    blur convolved with a 2x2 box (verified exact to f32 eps against the
    two-op form). Halves the branch's HBM writes in the pooled-channel
    workflow — the full-resolution blurred tensor never materializes. The
    trailing clip of :func:`gaussian` is a mathematical no-op (normalized
    non-negative kernel on [0,1] data), so folding across it is exact."""
    from scipy.signal import convolve2d
    kernel = int(kernel)
    gk = gkern(kernel, std)
    k2 = convolve2d(gk, np.ones((2, 2)) / 4.0, 'full')     # (k+1, k+1)
    gfilter = np.zeros((kernel + 1, kernel + 1, 3, 3), dtype=np.float32)
    for r in range(3):
        gfilter[:, :, r, r] = k2
    xp = ops.pad2d(x, kernel // 2, 'reflect')
    return ops.conv2d(xp, jnp.asarray(gfilter, x.dtype), stride=2, padding='VALID',
                      precision=None)


def resample_pooled(x, factor=50, method='bilinear'):
    """Exact ``avg_pool(resample(x), 2)`` when the up-scale is exactly 2x
    (factor=50): pool2 ∘ bilinear-up2 is the fixed separable 3-tap stencil
    [1/8, 3/4, 1/8] with edge clamping, applied to the downsampled image —
    the full-resolution upsampled tensor never materializes. Other factors
    fall back to the two-op form."""
    if 0 < factor <= 1:
        factor = 100 * factor
    size = x.shape[1] * int(factor) // 100
    if method != 'bilinear' or 2 * size != x.shape[1]:
        return ops.avg_pool(resample(x, factor, method), 2)
    down = jax.image.resize(x, (x.shape[0], size, size, x.shape[3]), method=method)
    k1 = np.array([0.125, 0.75, 0.125], np.float32)
    k2 = np.outer(k1, k1)
    rf = np.zeros((3, 3, 3, 3), np.float32)
    for r in range(3):
        rf[:, :, r, r] = k2
    dp = jnp.pad(down, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='edge')
    return ops.conv2d(dp, jnp.asarray(rf, x.dtype), stride=1, padding='VALID',
                      precision=None)


# Exact fused manipulate→pool:2 variants (static strengths); used by the
# workflow's pooled channel so those branches never write full resolution.
POOLED_MANIPULATIONS = {
    'gaussian': lambda x, s, key=None: gaussian_pooled(x, 5, s),
    'resample': lambda x, s, key=None: resample_pooled(x, s),
}


def residual(x, hsv=False):
    """High-pass residual filter (for fingerprint-style analyses)."""
    gk = np.array([[-0.0833, -0.1667, -0.0833],
                   [-0.1667, 1.0, -0.1667],
                   [-0.0833, -0.1667, -0.0833]])
    gfilter = repeat_2dfilter(gk, 3)
    if hsv:
        gfilter[:, :, 1:2, 1:2] = 0
        gfilter[2, 2, 1:2, 1:2] = 1
    y = ops.pad2d(x, 1, 'reflect')
    if hsv:
        y = color.rgb_to_hsv(y)
    y = ops.small_conv2d(y, gfilter.astype(np.float32), padding='VALID')
    if hsv:
        y = color.hsv_to_rgb(y)
    return y


# ----------------------------------------------------------------------------------
# Traced-strength variants: filters are built with jnp from a *traced* scalar, so a
# jitted workflow can randomize strengths per step without recompilation. (The
# reference randomizes on the host and re-runs eagerly,
# workflows/manipulation_classification.py:199-208.)
# ----------------------------------------------------------------------------------

def sharpen_traced(x, strength, hsv=True):
    """Sharpen with a traced strength scalar."""
    base = jnp.array([[-0.0833, -0.1667, -0.0833],
                      [-0.1667, 0.0, -0.1667],
                      [-0.0833, -0.1667, -0.0833]], dtype=x.dtype)
    gk = strength * base / jnp.abs(base.sum())
    gk = gk.at[1, 1].set(strength + 1.0)
    eye3 = jnp.eye(3, dtype=x.dtype)
    kpc = jnp.stack([gk, gk, gk], axis=-1)           # (3, 3, C) per-channel
    if hsv:
        # S-channel kernel: the reference's quirk places the passthrough tap at
        # kernel position (2,2), not the center (ref helpers/tf_helpers.py)
        ident = jnp.zeros((3, 3), dtype=x.dtype).at[2, 2].set(1.0)
        kpc = kpc.at[:, :, 1].set(ident)
        y = color.rgb_to_hsv(x)
        y = ops.depthwise_conv2d(y, kpc, pad_mode='symmetric')
        y = color.hsv_to_rgb(y)
    else:
        y = ops.depthwise_conv2d(x, kpc, pad_mode='symmetric')
    return jnp.clip(y, 0, 1)


def gaussian_traced(x, std, kernel=5):
    """Gaussian blur with a traced std scalar (static kernel size)."""
    coords = jnp.arange(kernel, dtype=x.dtype) - (kernel - 1) / 2.0
    g1 = jnp.exp(-0.5 * (coords / std) ** 2)
    g2 = jnp.outer(g1, g1)
    g2 = g2 / g2.sum()
    y = ops.depthwise_conv2d(x, g2, pad_mode='reflect')
    return jnp.clip(y, 0, 1)


def resample_switch(x, index, candidates):
    """Resample selected from static candidate factors via lax.switch (each branch
    has its own static intermediate shape)."""
    branches = [lambda v, f=f: resample(v, f) for f in candidates]
    return jax.lax.switch(index, branches, x)


def median_switch(x, index, candidates):
    """Median filter selected from static candidate kernel sizes via lax.switch."""
    branches = [lambda v, k=k: median(v, k) for k in candidates]
    return jax.lax.switch(index, branches, x)


def jpeg_traced(x, quality):
    """Differentiable JPEG with a traced quality scalar (qtables built in-graph)."""
    from neural_imaging_tpu.models.jpeg import jpeg_forward, jpeg_qtable_traced
    y, _ = jpeg_forward(x, jpeg_qtable_traced(quality, 0), jpeg_qtable_traced(quality, 1))
    return y


TRACED_MANIPULATIONS = {
    'sharpen': lambda x, s, key=None: sharpen_traced(x, s, hsv=True),
    'gaussian': lambda x, s, key=None: gaussian_traced(x, s, 5),
    'jpeg': lambda x, s, key=None: jpeg_traced(x, s),
    'awgn': lambda x, s, key=None: awgn(x, s / 255.0, key),
    'gamma': lambda x, s, key=None: gamma(x, s),
}


# Registry used by the manipulation-classification workflow. Each entry maps
# (x, strength, key) → manipulated image; default strengths / randomization ranges
# follow the reference workflow (workflows/manipulation_classification.py:80-90).
def _jpeg_manipulation(x, strength, key=None):
    from neural_imaging_tpu.models.jpeg import differentiable_jpeg
    return differentiable_jpeg(x, strength)


MANIPULATIONS = {
    'sharpen': lambda x, s, key=None: sharpen(x, s, hsv=True),
    'resample': lambda x, s, key=None: resample(x, s),
    'gaussian': lambda x, s, key=None: gaussian(x, 5, s),
    'jpeg': _jpeg_manipulation,
    'awgn': lambda x, s, key=None: awgn(x, s / 255.0, key),
    'gamma': lambda x, s, key=None: gamma(x, s),
    'median': lambda x, s, key=None: median(x, s),
}

DEFAULT_STRENGTHS = {'sharpen': 1, 'resample': 50, 'gaussian': 0.83, 'jpeg': 80,
                     'awgn': 5.1, 'gamma': 3, 'median': 3}

STRENGTH_RANGES = {
    'sharpen': (0.25, 1.5),
    'resample': (40, 90),
    'gaussian': (0.5, 7),
    'jpeg': (50, 90),
    'awgn': (1, 5),
    'gamma': (1, 5),
    'median': (3, 9),
}

"""
Differentiable SSIM / MS-SSIM on device (tf.image.ssim parity: 11x11 Gaussian window
with sigma 1.5, k1=0.01, k2=0.03). Used by training losses; for host-side evaluation
with skimage semantics see utils.metrics.
"""
import jax
import jax.numpy as jnp

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size=11, sigma=1.5, dtype=jnp.float32):
    coords = jnp.arange(size, dtype=dtype) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (coords / sigma) ** 2)
    g = g / g.sum()
    return jnp.outer(g, g)


def _filter2d(x, window):
    """Depthwise VALID convolution of NHWC x with a 2-D window."""
    c = x.shape[-1]
    kernel = jnp.tile(window[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)


def ssim_per_channel(a, b, max_val=1.0, filter_size=11, filter_sigma=1.5,
                     k1=0.01, k2=0.03):
    """Returns (luminance*cs mean, cs mean) per image per channel — shape (N, C)."""
    window = _gaussian_window(filter_size, filter_sigma, a.dtype)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_a = _filter2d(a, window)
    mu_b = _filter2d(b, window)
    mu_aa = _filter2d(a * a, window)
    mu_bb = _filter2d(b * b, window)
    mu_ab = _filter2d(a * b, window)

    sigma_aa = mu_aa - mu_a * mu_a
    sigma_bb = mu_bb - mu_b * mu_b
    sigma_ab = mu_ab - mu_a * mu_b

    luminance = (2 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1)
    cs = (2 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)

    ssim_val = jnp.mean(luminance * cs, axis=(1, 2))
    cs_val = jnp.mean(cs, axis=(1, 2))
    return ssim_val, cs_val


def ssim(a, b, max_val=1.0, **kwargs):
    """Per-image SSIM, shape (N,) — mean over channels (tf.image.ssim parity)."""
    ssim_val, _ = ssim_per_channel(a, b, max_val, **kwargs)
    return jnp.mean(ssim_val, axis=-1)


def _downsample2(x):
    """2x2 average pooling with SAME padding (MS-SSIM pyramid step)."""
    n, h, w, c = x.shape
    pad_h, pad_w = h % 2, w % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode='edge')
    out = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')
    return out / 4.0


def ms_ssim(a, b, max_val=1.0, power_factors=_MSSSIM_WEIGHTS, filter_size=11):
    """Multi-scale SSIM per image (N,). Scales are truncated if images get too small."""
    levels = len(power_factors)
    mcs = []
    ssim_val = None
    for level in range(levels):
        if min(a.shape[1], a.shape[2]) < filter_size:
            # image became smaller than the window; stop the pyramid early
            power_factors = power_factors[:level]
            mcs = mcs[:max(level - 1, 0)]
            break
        ssim_l, cs_l = ssim_per_channel(a, b, max_val, filter_size=filter_size)
        ssim_val = jnp.mean(ssim_l, axis=-1)
        if level < levels - 1:
            mcs.append(jnp.mean(jax.nn.relu(cs_l), axis=-1))
            a, b = _downsample2(a), _downsample2(b)

    result = jax.nn.relu(ssim_val) ** power_factors[-1]
    for cs_l, w in zip(mcs, power_factors[:-1]):
        result = result * (cs_l ** w)
    return result

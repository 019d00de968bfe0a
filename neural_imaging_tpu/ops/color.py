"""
Color space conversions: JPEG-standard RGB↔YCbCr affine transforms and RGB↔HSV
(tf.image parity, used by the sharpen manipulation).
"""
import jax.numpy as jnp
import numpy as np

# JPEG (JFIF) color transform constants (ref models/jpeg.py:74-75). 255-scale, with
# the chroma channels offset by +128; the inverse folds the offsets into the affine.
# Kept as HOST (numpy) arrays: a module-level jnp.array lands on the default
# accelerator, and XLA lowering then has to FETCH it to embed the constant —
# a device→host round trip per compile that stalls entirely when a tunneled
# device's downlink degrades (round-5 notes).
_F_MATRIX = np.array([[0.299, 0.587, 0.114],
                      [-0.168736, -0.331264, 0.5],
                      [0.5, -0.418688, -0.081312]], dtype=np.float32)
_F_OFFSET = np.array([0.0, 128.0, 128.0], dtype=np.float32)

_I_MATRIX = np.array([[1.0, 0.0, 1.402],
                      [1.0, -0.344136, -0.714136],
                      [1.0, 1.772, 0.0]], dtype=np.float32)
_I_OFFSET = np.array([-1.402 * 128, 1.058272 * 128, -1.772 * 128], dtype=np.float32)


def rgb_to_ycbcr(x255, precision=None):
    """255-scaled RGB → YCbCr (Y in [0,255], Cb/Cr centered at 128)."""
    import jax
    return jnp.einsum('...c,kc->...k', x255, _F_MATRIX.astype(x255.dtype),
                      precision=precision or jax.lax.Precision.HIGHEST
                      ) + _F_OFFSET.astype(x255.dtype)


def ycbcr_to_rgb(ycc, precision=None):
    """YCbCr → 255-scaled RGB."""
    import jax
    return jnp.einsum('...c,kc->...k', ycc, _I_MATRIX.astype(ycc.dtype),
                      precision=precision or jax.lax.Precision.HIGHEST
                      ) + _I_OFFSET.astype(ycc.dtype)


def rgb_to_hsv(rgb):
    """RGB [0,1] → HSV with H in [0,1] (tf.image.rgb_to_hsv parity)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    rng = v - mn
    safe_rng = jnp.where(rng > 0, rng, 1.0)

    h_r = jnp.mod((g - b) / safe_rng, 6.0)
    h_g = (b - r) / safe_rng + 2.0
    h_b = (r - g) / safe_rng + 4.0
    h = jnp.where(v == r, h_r, jnp.where(v == g, h_g, h_b))
    h = jnp.where(rng > 0, h / 6.0, 0.0)

    s = jnp.where(v > 0, rng / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    """HSV (H in [0,1]) → RGB [0,1] (tf.image.hsv_to_rgb parity)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    dh = jnp.mod(h, 1.0) * 6.0
    dr = jnp.clip(jnp.abs(dh - 3.0) - 1.0, 0.0, 1.0)
    dg = jnp.clip(-jnp.abs(dh - 2.0) + 2.0, 0.0, 1.0)
    db = jnp.clip(-jnp.abs(dh - 4.0) + 2.0, 0.0, 1.0)
    one_minus_s = 1.0 - s
    rgb = jnp.stack([one_minus_s + s * dr, one_minus_s + s * dg, one_minus_s + s * db], axis=-1)
    return v[..., None] * rgb

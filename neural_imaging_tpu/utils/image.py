"""
Host-side image helpers: sliding windows, gamma augmentation, crops, log-FFT and
concatenation utilities. Capability parity with reference helpers/image.py.
"""
import numpy as np


def sliding_window(arr, window):
    """Split a (h,w,c) image into non-overlapping (window,window,c) tiles."""
    if arr.ndim != 3:
        raise ValueError('The input array needs to be 3-D (h,w,c)!')
    ny, nx = arr.shape[0] // window, arr.shape[1] // window
    tiles = (arr[:ny * window, :nx * window]
             .reshape(ny, window, nx, window, arr.shape[-1])
             .transpose(2, 0, 1, 3, 4)          # column-major order like the reference
             .reshape(nx * ny, window, window, arr.shape[-1]))
    return np.ascontiguousarray(tiles)


def batch_gamma(batch_p, gamma=None, rng=None):
    """Random per-image gamma augmentation: x**(1/gamma), gamma ~ U(0.25, 3)."""
    rng = rng or np.random.default_rng()
    if gamma is None:
        gamma = rng.uniform(0.25, 3, size=(len(batch_p), 1, 1, 1)).astype(np.float32)
    elif isinstance(gamma, float):
        gamma = gamma * np.ones((len(batch_p), 1, 1, 1), dtype=np.float32)
    return np.power(batch_p, 1.0 / gamma).clip(0, 1)


def crop_middle(image, patch=128):
    image = image.squeeze()
    xx = (image.shape[0] - patch) // 2
    yy = (image.shape[1] - patch) // 2
    if image.ndim == 2:
        return image[xx:xx + patch, yy:yy + patch]
    if image.ndim == 3:
        return image[xx:xx + patch, yy:yy + patch, :]
    raise ValueError('Invalid image size!')


def fft_log_norm(x, boost=10, perc=0):
    """Log-magnitude centered FFT per channel (for A/B diff visualizations)."""
    x = x.squeeze()
    if x.ndim != 3:
        raise ValueError('Only single images can be accepted as input.')
    y = np.zeros_like(x, dtype=np.float64)
    for i in range(x.shape[-1]):
        mag = np.abs(np.fft.fftshift(np.fft.fft2(x[:, :, i])))
        y[:, :, i] = normalize(np.log(boost + mag), perc)
    return y


def cati(*args):
    """Concatenate images/batches along the batch dimension."""
    arrays = []
    for i, item in enumerate(args):
        if isinstance(item, np.ndarray):
            if item.ndim == 3:
                item = item[None]
            if item.ndim != 4:
                raise ValueError(f'Shape of element {i} ({item.shape}) is not supported!')
        else:
            item = np.concatenate([x if x.ndim == 4 else x[None] for x in item])
            if item.ndim != 4:
                item = item.squeeze()
            if item.ndim != 4:
                raise ValueError(f'Shape of element {i} ({item.shape}) is not supported!')
        arrays.append(item)
    out = np.concatenate(arrays, axis=0)
    return out if out.ndim == 4 else out.squeeze()


def catc(*args):
    return np.concatenate(args, axis=-1)


def normalize(x, perc=0):
    """Normalize to [0,1], optionally clipping percentile outliers."""
    if perc == 0:
        return ((x - np.min(x)) / (np.max(x) - np.min(x) + 1e-9)).clip(0, 1)
    mn, mx = np.percentile(x, perc), np.percentile(x, 100 - perc)
    return ((x - mn) / (mx - mn + 1e-9)).clip(0, 1)

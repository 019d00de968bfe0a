"""
RAW development: a from-scratch numpy pipeline, libRAW-backed ingestion (optional),
and a portable synthetic-RAW container for hermetic operation.

Capability parity with reference helpers/raw.py. The reference unpacks camera files
through rawkit/libRAW and demosaics via colour_demosaicing (Menon/bilinear); this
build uses rawpy when present and ships its own demosaicers:

- ``bilinear``: classic 3x3 bilinear interpolation
- ``malvar``: Malvar-He-Cutler high-quality linear demosaicing
- ``menon``: Menon2007 DDFAPD directional demosaicing (data/menon.py), the same
  algorithm class the reference requests via colour_demosaicing — measured ~3 dB
  above Malvar on real photographic content (tests/test_raw_ingestion.py)

Camera files are parsed natively, no libRAW needed: ``.dng`` (data/dng.py —
uncompressed AND lossless-JPEG compressed CFA), ``.cr2`` (data/camera_raw.py —
sliced SOF3 payload + MakerNote WB), ``.nef``/``.arw`` (uncompressed/bit-packed
TIFF-EP, Nikon type-34713 lossless AND lossy codings via data/nikon.py, Sony
cRAW/ARW2 incl. the encrypted SR2 metadata via data/sony.py, tiled/stripped
SOF3 ARW via the shared lossless-JPEG machinery). Structurally unexpected
real-world files still fall back to rawpy when it is installed.

Synthetic RAW container (``*.nraw.npz``): mosaic (uint16 h×w), black, saturation,
cam_mul (4,), cfa (str), cam2srgb (3×3). Produced by
``neural_imaging_tpu.data.fixtures`` so the full ingestion path is testable without
camera files.
"""
import os

import numpy as np

from neural_imaging_tpu.data import bayer

try:
    import rawpy  # pragma: no cover - optional native dependency
    HAS_RAWPY = True
except ImportError:
    rawpy = None
    HAS_RAWPY = False


# ---------------------------------------------------------------------------------
# Demosaicing (pure numpy, convolution-based)
# ---------------------------------------------------------------------------------

def _conv2(x, k):
    from scipy.ndimage import convolve
    return convolve(x, k, mode='mirror')


def demosaic_bilinear(mosaic, cfa_pattern):
    """Bilinear demosaic of a single-channel Bayer mosaic into (h, w, 3) RGB."""
    masks = _cfa_masks(mosaic.shape, cfa_pattern)
    g_kernel = np.array([[0, 1, 0], [1, 4, 1], [0, 1, 0]], dtype=np.float64) / 4
    rb_kernel = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=np.float64) / 4
    out = np.zeros((*mosaic.shape, 3), dtype=np.float64)
    out[..., 0] = _conv2(mosaic * masks[0], rb_kernel)
    out[..., 1] = _conv2(mosaic * masks[1], g_kernel)
    out[..., 2] = _conv2(mosaic * masks[2], rb_kernel)
    return out


def demosaic_malvar(mosaic, cfa_pattern):
    """Malvar-He-Cutler (2004) high-quality linear demosaicing."""
    m = mosaic.astype(np.float64)
    R_m, G_m, B_m = _cfa_masks(mosaic.shape, cfa_pattern)

    GR_GB = np.array([
        [0, 0, -1, 0, 0],
        [0, 0, 2, 0, 0],
        [-1, 2, 4, 2, -1],
        [0, 0, 2, 0, 0],
        [0, 0, -1, 0, 0]]) / 8

    Rg_RB_Bg_BR = np.array([
        [0, 0, 0.5, 0, 0],
        [0, -1, 0, -1, 0],
        [-1, 4, 5, 4, -1],
        [0, -1, 0, -1, 0],
        [0, 0, 0.5, 0, 0]]) / 8

    Rg_BR_Bg_RB = Rg_RB_Bg_BR.T

    Rb_BB_Br_RR = np.array([
        [0, 0, -1.5, 0, 0],
        [0, 2, 0, 2, 0],
        [-1.5, 0, 6, 0, -1.5],
        [0, 2, 0, 2, 0],
        [0, 0, -1.5, 0, 0]]) / 8

    R = m * R_m
    G = m * G_m
    B = m * B_m

    G = np.where(np.logical_or(R_m == 1, B_m == 1), _conv2(m, GR_GB), G)

    RBg_RBBR = _conv2(m, Rg_RB_Bg_BR)
    RBg_BRRB = _conv2(m, Rg_BR_Bg_RB)
    RBgr_BBRR = _conv2(m, Rb_BB_Br_RR)

    # Row/column phase masks
    R_r = np.any(R_m == 1, axis=1)[:, None] * np.ones_like(R)
    R_c = np.any(R_m == 1, axis=0)[None] * np.ones_like(R)
    B_r = np.any(B_m == 1, axis=1)[:, None] * np.ones_like(B)
    B_c = np.any(B_m == 1, axis=0)[None] * np.ones_like(B)

    R = np.where(np.logical_and(R_r == 1, B_c == 1), RBg_RBBR, R)
    R = np.where(np.logical_and(B_r == 1, R_c == 1), RBg_BRRB, R)
    B = np.where(np.logical_and(B_r == 1, R_c == 1), RBg_RBBR, B)
    B = np.where(np.logical_and(R_r == 1, B_c == 1), RBg_BRRB, B)
    R = np.where(np.logical_and(B_r == 1, B_c == 1), RBgr_BBRR, R)
    B = np.where(np.logical_and(R_r == 1, R_c == 1), RBgr_BBRR, B)

    return np.stack([R, G, B], axis=-1)


def _cfa_masks(shape, cfa_pattern):
    """Boolean sampling masks (R, G, B) for a CFA pattern over a (h, w) grid."""
    off = bayer.CFA_OFFSETS[cfa_pattern.upper()]
    masks = [np.zeros(shape, dtype=np.float64) for _ in range(3)]
    for plane in bayer.STACK_PLANES:
        r, c = off[plane]
        masks[bayer.PLANE_RGB[plane]][r::2, c::2] = 1
    return masks


def _demosaic_menon(mosaic, cfa_pattern):
    from neural_imaging_tpu.data.menon import demosaic_menon
    return demosaic_menon(mosaic, cfa_pattern, refine=True)


_DEMOSAICERS = {
    'bilinear': demosaic_bilinear,
    'malvar': demosaic_malvar,
    'menon': _demosaic_menon,  # DDFAPD, parity with the reference's default
}


# ---------------------------------------------------------------------------------
# Synthetic RAW container IO
# ---------------------------------------------------------------------------------

def save_nraw(filename, mosaic_u16, cfa_pattern='GBRG', black=0, saturation=2 ** 16 - 1,
              cam_mul=(1.0, 1.0, 1.0, 1.0), cam2srgb=None):
    if cam2srgb is None:
        cam2srgb = np.eye(3)
    np.savez_compressed(filename, mosaic=mosaic_u16.astype(np.uint16),
                        black=np.uint32(black), saturation=np.uint32(saturation),
                        cam_mul=np.asarray(cam_mul, dtype=np.float32),
                        cfa=np.bytes_(cfa_pattern.upper().encode()),
                        cam2srgb=np.asarray(cam2srgb, dtype=np.float64))


def _load_raw_data(filename):
    """Return (mosaic float[0,1] pre-WB, cfa, cam2srgb, cam_mul) from camera or nraw file."""
    if filename.endswith('.npz'):
        z = np.load(filename)
        mosaic = z['mosaic'].astype(np.float32)
        black, saturation = float(z['black']), float(z['saturation'])
        mosaic = np.clip((mosaic - black) / (saturation - black), 0, 1)
        cfa = bytes(z['cfa']).decode() if z['cfa'].dtype.kind == 'S' else str(z['cfa'])
        return mosaic, cfa, np.asarray(z['cam2srgb']), np.asarray(z['cam_mul'], dtype=np.float32)

    ext = os.path.splitext(filename)[1].lower()
    if ext == '.dng':
        from neural_imaging_tpu.data import dng
        try:
            d = dng.read_dng(filename)
        except dng.DNGError:
            if not HAS_RAWPY:
                raise
            d = None  # unsupported DNG variant: fall through to rawpy
        if d is not None:
            return _normalize_parsed(d)

    if ext in ('.cr2', '.nef', '.arw'):
        from neural_imaging_tpu.data import camera_raw
        try:
            d = camera_raw.read_camera_raw(filename)
        except camera_raw.DNGError:
            # Unsupported codings AND structural surprises from real-world
            # vendor files (odd slice layouts, non-2x2 CFA, truncated
            # MakerNotes, ...) fall through to rawpy when available — the
            # native reader must never reduce format coverage below libRAW's.
            if not HAS_RAWPY:
                raise
            d = None
        if d is not None:
            return _normalize_parsed(d)

    if not HAS_RAWPY:
        raise RuntimeError(
            'rawpy/libRAW is not available in this environment; camera RAW files cannot '
            'be unpacked. Use the synthetic .nraw.npz container (data.fixtures) instead.')

    with rawpy.imread(filename) as raw:  # pragma: no cover - needs libRAW
        mosaic = raw.raw_image_visible.astype(np.float32)
        black = float(np.mean(raw.black_level_per_channel))
        saturation = float(raw.white_level)
        mosaic = np.clip((mosaic - black) / (saturation - black), 0, 1)
        desc = raw.color_desc.decode()
        pattern = ''.join(desc[i] for i in raw.raw_pattern.flatten())
        cam_mul = np.asarray(raw.camera_whitebalance, dtype=np.float32)
        cam2srgb = np.asarray(raw.color_matrix[:3, :3], dtype=np.float64)
        if not cam2srgb.any():
            cam2srgb = np.eye(3)
        return mosaic, pattern, cam2srgb, cam_mul


def _normalize_parsed(d):
    """(mosaic [0,1], cfa, cam2srgb, cam_mul) from a parsed dng/camera_raw dict."""
    mosaic = d['mosaic'].astype(np.float32)
    mosaic = np.clip((mosaic - d['black']) / (d['white'] - d['black']), 0, 1)
    cam_mul = np.asarray(d['cam_mul'][:4], dtype=np.float32)
    return mosaic, d['cfa_pattern'], d['cam2srgb'], cam_mul


def _apply_wb(mosaic, cfa_pattern, cam_mul):
    """White-balance R and B sites in place (G multiplier normalized to 1)."""
    cam_mul = np.asarray(cam_mul, dtype=np.float32).copy()
    if cam_mul[1] == 0:
        cam_mul[1] = 1
    cam_mul /= cam_mul[1]
    off = bayer.CFA_OFFSETS[cfa_pattern.upper()]
    r, c = off['R']
    mosaic[r::2, c::2] *= cam_mul[0]
    r, c = off['B']
    mosaic[r::2, c::2] *= cam_mul[2]
    return np.clip(mosaic, 0, 1)


def unpack(filename, stack=True, use_wb=True, expand=False):
    """
    Read a RAW image → normalized mosaic (or RGGB stack) + (cfa, cam2srgb, cam_mul).
    Parity with ref helpers/raw.py:110.
    """
    mosaic, cfa, cam2srgb, cam_mul = _load_raw_data(filename)
    if use_wb:
        mosaic = _apply_wb(mosaic, cfa, cam_mul)
    if stack:
        rgb_like = np.zeros((*mosaic.shape, 3), dtype=mosaic.dtype)
        masks = _cfa_masks(mosaic.shape, cfa)
        for ch in range(3):
            rgb_like[..., ch] = mosaic * masks[ch]
        image = bayer.stack_bayer(rgb_like, cfa).clip(0, 1)
    else:
        image = mosaic
    if expand:
        image = image[None]
    return image, cfa, cam2srgb, cam_mul


def process(filename, use_srgb=True, use_gamma=True, brightness='percentile',
            demosaicing='bilinear', expand=False):
    """
    Develop a RAW file with the from-scratch pipeline: normalize → white balance →
    demosaic → camera-to-sRGB matrix → brightness → gamma 1/2.2.
    Parity with ref helpers/raw.py:10.
    """
    if brightness not in ('percentile', 'shift', None):
        raise ValueError('Unsupported brightness correction mode!')
    if demosaicing not in _DEMOSAICERS:
        raise ValueError('Unsupported demosaicing method!')

    mosaic, cfa, cam2srgb, cam_mul = _load_raw_data(filename)
    mosaic = _apply_wb(mosaic, cfa, cam_mul)
    rgb = develop_mosaic(mosaic, cfa, cam2srgb if use_srgb else None,
                         brightness=brightness, use_gamma=use_gamma,
                         demosaicing=demosaicing)
    return rgb[None] if expand else rgb


def develop_mosaic(mosaic, cfa_pattern, cam2srgb=None, brightness=None, use_gamma=True,
                   demosaicing='bilinear'):
    """Core development from a normalized [0,1] mosaic. Shared by process() and fixtures."""
    rgb = _DEMOSAICERS[demosaicing](mosaic.astype(np.float64), cfa_pattern)
    rgb = np.clip(rgb, 0, 1)

    if cam2srgb is not None:
        rgb = np.einsum('ij,hwj->hwi', np.asarray(cam2srgb, dtype=np.float64), rgb)
        rgb = np.clip(rgb, 0, 1)

    if brightness == 'percentile':
        percentile = 0.5
        rgb = rgb - np.percentile(rgb, percentile)
        rgb = rgb / max(np.percentile(rgb, 100 - percentile), 1e-9)
    elif brightness == 'shift':
        rgb = rgb * (0.25 / max(np.mean(rgb), 1e-9))

    rgb = np.clip(rgb, 0, 1)
    if use_gamma:
        rgb = np.power(rgb, 1 / 2.2)
    return rgb


def process_auto(filename):
    """Develop via libRAW defaults (or the scratch pipeline for synthetic containers)."""
    if filename.endswith('.npz') or not HAS_RAWPY:
        rgb = process(filename, brightness=None)
        return (rgb * 255).round().astype(np.uint8)
    with rawpy.imread(filename) as raw:  # pragma: no cover - needs libRAW
        return raw.postprocess()


# Re-export the Bayer helpers under the reference's module-level names.
stack_bayer = bayer.stack_bayer
simulate_bayer = bayer.simulate_bayer
merge_bayer = bayer.merge_bayer

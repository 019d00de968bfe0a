"""
Menon-Andriani-Calvagno (2007) DDFAPD demosaicing — directional filtering with
a-posteriori decision — implemented from the paper (IEEE TIP 16(1):132-141).

The reference develops RAW files with ``colour_demosaicing``'s Menon2007
(helpers/raw.py:61); this is an independent implementation of the same published
algorithm so the framework's host-side develop path offers the same quality class
without that dependency. Steps:

1. directional green estimates G_H/G_V with the 5-tap FIR + Laplacian correction,
2. chrominance-gradient classifier over an asymmetric 5x5 window picks the
   interpolation direction per pixel,
3. R/B reconstruction from directional color-difference averages,
4. optional refining step on the color-difference planes.

Operates on a single-channel [0,1] float mosaic; returns (h, w, 3) RGB.
"""
import numpy as np
from scipy.ndimage import convolve, convolve1d

_H0 = np.array([0.0, 0.5, 0.0, 0.5, 0.0])
_H1 = np.array([-0.25, 0.0, 0.5, 0.0, -0.25])

# classifier window (paper eq. 9: sum over the causal 5x5 neighborhood)
_K = np.array([[0.0, 0.0, 1.0, 0.0, 1.0],
               [0.0, 0.0, 0.0, 1.0, 0.0],
               [0.0, 0.0, 3.0, 0.0, 3.0],
               [0.0, 0.0, 0.0, 1.0, 0.0],
               [0.0, 0.0, 1.0, 0.0, 1.0]])


def _shift(x, dy, dx):
    """Shift with edge replication: out(i,j) = x(i+dy, j+dx)."""
    h, w = x.shape
    pad = max(abs(dy), abs(dx))
    xp = np.pad(x, pad, mode='edge')
    return xp[pad + dy:pad + dy + h, pad + dx:pad + dx + w]


def _dir_avg(x, horizontal):
    """Average of the two distance-1 neighbors along the given direction."""
    if horizontal:
        return 0.5 * (_shift(x, 0, -1) + _shift(x, 0, 1))
    return 0.5 * (_shift(x, -1, 0) + _shift(x, 1, 0))


def demosaic_menon(mosaic, cfa_pattern, refine=True):
    """DDFAPD demosaic of a [0,1] float mosaic into (h, w, 3) RGB."""
    from neural_imaging_tpu.data.raw import _cfa_masks

    m = np.asarray(mosaic, dtype=np.float64)
    R_m, G_m, B_m = (mk.astype(bool) for mk in _cfa_masks(m.shape, cfa_pattern))
    X_m = R_m | B_m  # sites where green is missing

    # --- 1. directional green estimates --------------------------------------
    fir = _H0 + _H1
    g_h = convolve1d(m, fir, axis=1, mode='mirror')
    g_v = convolve1d(m, fir, axis=0, mode='mirror')
    G_H = np.where(X_m, g_h, m)
    G_V = np.where(X_m, g_v, m)

    # --- 2. decision: chrominance gradients over a causal window -------------
    C_H = np.where(X_m, m - G_H, 0.0)
    C_V = np.where(X_m, m - G_V, 0.0)
    D_H = np.abs(C_H - _shift(C_H, 0, 2))
    D_V = np.abs(C_V - _shift(C_V, 2, 0))
    del_H = convolve(D_H, _K, mode='mirror')
    del_V = convolve(D_V, _K.T, mode='mirror')
    horiz = del_V >= del_H  # choose horizontal when vertical gradient dominates

    G = np.where(X_m, np.where(horiz, G_H, G_V), m)

    # --- 3. R/B reconstruction ------------------------------------------------
    # phase masks: rows/columns containing R (resp. B) samples
    R_rows = R_m.any(axis=1)[:, None] & np.ones_like(R_m)
    B_rows = B_m.any(axis=1)[:, None] & np.ones_like(B_m)

    R = np.where(R_m, m, 0.0)
    B = np.where(B_m, m, 0.0)

    # at G sites: average the in-row (or in-column) color difference
    dR = np.where(R_m, R - G, 0.0)
    dB = np.where(B_m, B - G, 0.0)
    R = np.where(G_m & R_rows, G + _dir_avg(dR, True), R)
    R = np.where(G_m & B_rows, G + _dir_avg(dR, False), R)
    B = np.where(G_m & B_rows, G + _dir_avg(dB, True), B)
    B = np.where(G_m & R_rows, G + _dir_avg(dB, False), B)

    # at B sites (R unknown) / R sites (B unknown): directional average of the
    # just-completed color difference, along the classifier's direction
    dR = np.where(R_m | G_m, R - G, 0.0)
    dB = np.where(B_m | G_m, B - G, 0.0)
    R = np.where(B_m, G + np.where(horiz, _dir_avg(dR, True), _dir_avg(dR, False)), R)
    B = np.where(R_m, G + np.where(horiz, _dir_avg(dB, True), _dir_avg(dB, False)), B)

    if refine:
        R, G, B = _refine(m, R, G, B, R_m, G_m, B_m, horiz, R_rows, B_rows)

    return np.stack([R, G, B], axis=-1)


def _refine(m, R, G, B, R_m, G_m, B_m, horiz, R_rows, B_rows):
    """Refining step (paper §V): low-pass the color-difference planes along the
    decision direction and re-derive each channel from the refined differences."""
    # 1. refine G at R/B sites: G = X + directional 2-tap mean of (G - X)
    dGR = G - R
    dGB = G - B
    G = np.where(R_m, R + np.where(horiz, _dir_avg(dGR, True), _dir_avg(dGR, False)), G)
    G = np.where(B_m, B + np.where(horiz, _dir_avg(dGB, True), _dir_avg(dGB, False)), G)

    # 2. re-derive R/B at G sites from the refined green
    dR = np.where(R_m, R - G, 0.0)
    dB = np.where(B_m, B - G, 0.0)
    R = np.where(G_m & R_rows, G + _dir_avg(dR, True), R)
    R = np.where(G_m & B_rows, G + _dir_avg(dR, False), R)
    B = np.where(G_m & B_rows, G + _dir_avg(dB, True), B)
    B = np.where(G_m & R_rows, G + _dir_avg(dB, False), B)

    # 3. re-derive R at B sites and B at R sites
    dR = np.where(~B_m, R - G, 0.0)
    dB = np.where(~R_m, B - G, 0.0)
    R = np.where(B_m, G + np.where(horiz, _dir_avg(dR, True), _dir_avg(dR, False)), R)
    B = np.where(R_m, G + np.where(horiz, _dir_avg(dB, True), _dir_avg(dB, False)), B)
    return R, G, B

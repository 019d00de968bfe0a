"""
JPEG 2000 helpers: codestream payload measurement and targeted encoding.

The reference measures *effective* JPEG 2000 payload by summing tile-part lengths
with jpylyzer and targets quality through glymur PSNR layers
(compression/ratedistortion.py:87-162, compression/jpeg_helpers.py:117-125). This
module implements both natively:

- :func:`jp2_payload_bytes` walks the JP2 box structure / raw codestream and sums
  the ``Psot`` tile-part lengths (zero-Psot last tile-parts measured to EOC) — the
  same quantity jpylyzer reports, no external tool;
- :func:`encode_jp2` encodes through OpenJPEG (via OpenCV) with either an exact
  rate target (bpp) or a bisection-matched PSNR target (the reference's
  ``psnr=[q]`` glymur mode).
"""
import struct

import numpy as np

SOC = 0xFF4F
SIZ = 0xFF51
SOT = 0xFF90
SOD = 0xFF93
EOC = 0xFFD9

# marker segments without a length field
_NO_SEGMENT = {SOC, SOD, EOC, 0xFF92}


def _find_codestream(buf):
    """Return the offset of the contiguous codestream inside a JP2 file (or 0 for
    a raw codestream)."""
    if len(buf) >= 2 and struct.unpack('>H', buf[:2])[0] == SOC:
        return 0, len(buf)
    # JP2 box walk: each box is (LBox u32, TBox 4cc[, XLBox u64]) + payload
    pos = 0
    n = len(buf)
    while pos + 8 <= n:
        (lbox,) = struct.unpack_from('>I', buf, pos)
        tbox = buf[pos + 4:pos + 8]
        header = 8
        if lbox == 1:
            (lbox,) = struct.unpack_from('>Q', buf, pos + 8)
            header = 16
        elif lbox == 0:
            lbox = n - pos
        if tbox == b'jp2c':
            return pos + header, pos + lbox
        if lbox < header:
            break
        pos += lbox
    raise ValueError('No JPEG 2000 codestream found (not a JP2 file?)')


def jp2_payload_bytes(data):
    """
    Effective payload size of a JPEG 2000 file/buffer: the sum of all tile-part
    lengths (``Psot``), i.e. entropy-coded data + tile headers, excluding the main
    header and file-format boxes. Matches jpylyzer's ``psot`` accounting used by
    the reference (compression/jpeg_helpers.py:117-125).
    """
    if isinstance(data, str):
        with open(data, 'rb') as fh:
            data = fh.read()
    data = bytes(data)
    start, end = _find_codestream(data)

    total = 0
    pos = start
    while pos + 2 <= end:
        (marker,) = struct.unpack_from('>H', data, pos)
        if marker == SOT:
            # Lsot(2) Isot(2) Psot(4) TPsot(1) TNsot(1)
            (psot,) = struct.unpack_from('>I', data, pos + 6)
            if psot == 0:  # last tile-part of the stream: extends to EOC
                psot = (end - 2) - pos
            total += psot
            pos += psot
            continue
        if marker == EOC:
            break
        if marker == SOC:
            pos += 2
            continue
        if pos + 4 > end:
            break
        (seg_len,) = struct.unpack_from('>H', data, pos + 2)
        pos += 2 + seg_len

    if total == 0:
        raise ValueError('No tile-parts found in codestream')
    return total


def encode_jp2(image_u8_rgb, rate_bpp=None, psnr_target=None, tol=0.1, max_iter=12):
    """
    Encode an RGB uint8 image as JPEG 2000 through OpenJPEG.

    Exactly one of:
    - ``rate_bpp``: target bits-per-pixel (OpenCV's quality knob is a linear rate
      control: quality q -> q/1000 of the raw size);
    - ``psnr_target``: match the reconstruction PSNR (dB) by bisection on the rate
      knob, the reference's glymur ``psnr=[q]`` behavior.

    Returns (buffer_bytes, decoded_rgb_float01).
    """
    import cv2

    if (rate_bpp is None) == (psnr_target is None):
        raise ValueError('Specify exactly one of rate_bpp / psnr_target')

    bgr = cv2.cvtColor(np.asarray(image_u8_rgb), cv2.COLOR_RGB2BGR)

    def enc(q):
        ok, buf = cv2.imencode('.jp2', bgr, [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000,
                                             int(np.clip(q, 1, 1000))])
        if not ok:
            raise RuntimeError('JPEG 2000 encoding failed')
        dec = cv2.cvtColor(cv2.imdecode(buf, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
        return bytes(buf), dec.astype(np.float32) / 255.0

    if rate_bpp is not None:
        # raw size is 24 bpp; quality = fraction-of-raw x 1000
        q = 1000.0 * rate_bpp / 24.0
        return enc(q)

    ref = np.asarray(image_u8_rgb).astype(np.float64) / 255.0

    def psnr_of(dec):
        mse = np.mean((dec.astype(np.float64) - ref) ** 2)
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    lo, hi = 1.0, 1000.0
    buf, dec = enc(hi)
    if psnr_of(dec) < psnr_target:  # even (near-)lossless can't reach the target
        return buf, dec
    best = (buf, dec)
    for _ in range(max_iter):
        mid = 0.5 * (lo + hi)
        buf, dec = enc(mid)
        p = psnr_of(dec)
        if abs(p - psnr_target) <= tol:
            return buf, dec
        if p < psnr_target:
            lo = mid
        else:
            hi = mid
            best = (buf, dec)
    return best

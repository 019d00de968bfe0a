"""
Host-side JPEG utilities: IJG quantization tables, quality-factor estimation,
libjpeg encoding (via PIL), quality matching by SSIM/bpp bisection, and a JPEG
bitstream marker walker for effective-payload measurement.

Capability parity with reference compression/jpeg_helpers.py. The quantization
tables and quality scaling law are the public Annex-K / IJG standard.
"""
import io
from collections import OrderedDict

import numpy as np
from PIL import Image

from neural_imaging_tpu.utils import metrics

# Annex K (IJG) base quantization tables — public JPEG standard constants.
K1_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float32)

K2_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.float32)

_SUBSAMPLING = {'4:4:4': 0, '4:2:2': 1, '4:2:0': 2}


def jpeg_qtable(quality, channel=0):
    """DCT quantization matrix for an IJG quality level (1-100)."""
    quality = float(np.clip(quality, 1, 100))
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    t = K1_LUMA if channel == 0 else K2_CHROMA
    t = np.floor((t * scale + 50.0) / 100.0)
    return np.clip(t, 1, 255).astype(np.float32)


def jpeg_qf_estimation(q_mtx, channel=0):
    """Estimate the quality factor whose IJG table is nearest (mean abs diff)."""
    q_mtx = np.asarray(q_mtx)
    errors = [np.mean(np.abs(jpeg_qtable(qf, channel) - q_mtx)) for qf in range(1, 101)]
    return int(np.argmin(errors)) + 1


def zigzag(n=8):
    """Zigzag scan-order index matrix of size n×n."""
    zz = np.zeros((n, n), dtype=np.uint16)
    order = sorted(((x, y) for x in range(n) for y in range(n)),
                   key=lambda xy: (xy[0] + xy[1], -xy[1] if (xy[0] + xy[1]) % 2 else xy[1]))
    for i, (x, y) in enumerate(order):
        zz[x, y] = i
    return zz


def _encode_one(image_u8, quality, subsampling):
    buf = io.BytesIO()
    Image.fromarray(image_u8).save(buf, format='JPEG', quality=int(quality),
                                   subsampling=_SUBSAMPLING.get(subsampling, 0))
    data = buf.getvalue()
    decoded = np.asarray(Image.open(io.BytesIO(data)).convert('RGB'))
    return decoded, data


def compress_batch(batch_x, jpeg_quality, effective=False, subsampling='4:4:4'):
    """
    Compress images with libjpeg. Accepts float [0,1] (or uint8-scale) arrays of
    shape (h, w, 3) or (n, h, w, 3). Returns (images float [0,1], bytes or list).
    """
    batch_x = np.asarray(batch_x)
    if batch_x.max() > 1:
        batch_x = batch_x.astype(np.float32) / 255.0

    def run(img):
        u8 = np.clip(255 * img, 0, 255).astype(np.uint8)
        decoded, data = _encode_one(u8, jpeg_quality, subsampling)
        nbytes = JPEGMarkerStats(data).get_effective_bytes() if effective else len(data)
        return decoded.astype(np.float32) / 255.0, nbytes

    if batch_x.ndim == 3:
        return run(batch_x)
    if batch_x.ndim == 4:
        out = np.zeros_like(batch_x, dtype=np.float32)
        sizes = []
        for i in range(batch_x.shape[0]):
            out[i], nb = run(batch_x[i])
            sizes.append(nb)
        return out, sizes
    raise ValueError('Expected (h,w,3) or (n,h,w,3) input')


def match_quality(image, target=0.95, match='ssim', subsampling='4:4:4'):
    """Bisection search for the JPEG quality matching an SSIM or bpp target."""
    assert image.ndim == 3, 'Only RGB images supported'

    def objective(q):
        decoded, nbytes = compress_batch(image, q, subsampling=subsampling)
        if match == 'ssim':
            return metrics.ssim(image, decoded) - target
        if match == 'bpp':
            return 8.0 * nbytes / (image.shape[0] * image.shape[1]) - target
        raise ValueError('Invalid argument: match')

    low, high = 1, 95
    low_obj, high_obj = objective(low), objective(high)
    if low_obj * high_obj > 0:
        # target lies outside what QF 1-95 can reach on this image (e.g. an
        # SSIM below JPEG's floor) — return the nearest achievable endpoint
        from neural_imaging_tpu.utils.utils import logger
        best = low if abs(low_obj) < abs(high_obj) else high
        logger.warning(
            f'match_quality: target {target} ({match}) outside the achievable '
            f'range at QF {low}-{high}; clamping to QF {best}')
        return best
    while high - low > 1:
        if low_obj * high_obj > 0:
            raise ValueError(f'Same deviation at both end-points {low} - {high}')
        mid = (low + high) // 2
        mid_obj = objective(mid)
        if mid_obj * high_obj > 0:
            high, high_obj = mid, mid_obj
        else:
            low, low_obj = mid, mid_obj
    return low if abs(high_obj) > abs(low_obj) else high


APP_MARKERS = tuple(range(0xFFE0, 0xFFF0))


class JPEGMarkerStats:
    """
    Walk a JPEG bitstream and record byte offsets of its markers (SOI/DQT/DHT/
    SOS/ECD/EOI), extracting the quantization tables. Enables effective-payload
    accounting for rate-distortion analysis (payload = total - pre-Huffman header).
    """

    def __init__(self, image):
        if isinstance(image, str):
            with open(image, 'rb') as f:
                image = f.read()
        if not isinstance(image, (bytes, bytearray)):
            raise ValueError('Image not supported! Supported: str (path) or bytes')

        self.blocks = OrderedDict()
        self.quantization_tables = {}
        self._walk(bytes(image))
        self.shape = np.asarray(Image.open(io.BytesIO(bytes(image)))).shape

    def _walk(self, data):
        pos = 0
        app_index = 0
        total = len(data)
        zz = zigzag(8).ravel()
        if data[0:2] != b'\xff\xd8':
            raise IOError('Parsing error: missing SOI marker')
        self.blocks['SOI'] = 0
        pos = 2
        while pos < total - 1:
            marker = int.from_bytes(data[pos:pos + 2], 'big')
            if marker == 0xFFD9:  # EOI
                self.blocks['EOI'] = pos + 2
                return
            seg_len = int.from_bytes(data[pos + 2:pos + 4], 'big')
            payload = data[pos + 4:pos + 2 + seg_len]

            if marker == 0xFFDB:  # DQT — may contain several 65-byte tables
                chunk = payload
                while len(chunk) >= 65:
                    table_id = chunk[0] & 0x0F
                    self.blocks[f'DQT:{table_id}'] = pos
                    flat = np.frombuffer(chunk[1:65], np.uint8)
                    self.quantization_tables[table_id] = flat[zz].reshape(8, 8)
                    chunk = chunk[65:]
            elif marker == 0xFFC0:
                self.blocks['DCT'] = pos
            elif marker == 0xFFC2:
                raise NotImplementedError('Progressive JPEG images not supported yet')
            elif marker == 0xFFC4:  # DHT — may hold several tables
                chunk = payload
                while chunk:
                    table_id = chunk[0]
                    self.blocks.setdefault(f'DHT:{table_id & 0x0F}', pos)
                    counts = list(chunk[1:17])
                    chunk = chunk[17 + sum(counts):]
            elif marker == 0xFFDA:  # SOS — entropy-coded data follows until EOI
                self.blocks['SOS'] = pos
                self.blocks['ECD'] = pos + 2 + seg_len
                # scan for EOI from the end
                eoi = data.rfind(b'\xff\xd9')
                self.blocks['EOI'] = eoi + 2 if eoi >= 0 else total
                return
            elif marker in APP_MARKERS:
                self.blocks[f'APP:{marker & 0xF}/{app_index}'] = pos
                app_index += 1
            elif marker in (0xFFFE, 0xFFDD):
                self.blocks['RST'] = pos
            else:
                raise IOError(f'Parsing error: unknown marker {marker:#x} at {pos}')
            pos += 2 + seg_len

    def get_bytes(self):
        return self.blocks['EOI']

    def get_effective_bytes(self):
        """Bytes excluding headers up to the first Huffman table (ref behavior)."""
        return self.blocks['EOI'] - self.blocks['DHT:0']

    def get_bpp(self):
        return 8.0 * self.get_bytes() / (self.shape[0] * self.shape[1])

    def get_effective_bpp(self):
        return 8.0 * self.get_effective_bytes() / (self.shape[0] * self.shape[1])

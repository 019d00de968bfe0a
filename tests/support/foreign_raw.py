"""
Foreign-bytes RAW fixtures: byte streams built INDEPENDENTLY of the package's
own container writers, so container tests don't rely on writer↔reader symmetry.

No real camera files are obtainable in this environment (zero egress; no
rawpy/dcraw/exiftool/ffmpeg — probed in docs/datasets.md), so these builders
are the closest available substitute for vendor-written bytes: every byte is
derived directly from the format specifications (TIFF 6.0, DNG 1.4, ITU T.81
Annex H lossless) using different algorithms and different code paths than
`neural_imaging_tpu.data.dng.write_dng` / `neural_imaging_tpu.data.ljpeg.encode`
(big-int bit packing instead of grouped-uint64 numpy; a from-scratch canonical
Huffman SOF3 encoder instead of the C/py LJPEG core). A symmetric bug shared by
the package's writer and reader cannot cancel out here.
"""
import struct

import numpy as np

# TIFF field types
_BYTE, _ASCII, _SHORT, _LONG, _RATIONAL = 1, 2, 3, 4, 5
_SRATIONAL = 10

_TYPE_SIZE = {_BYTE: 1, _ASCII: 1, _SHORT: 2, _LONG: 4, _RATIONAL: 8, _SRATIONAL: 8}
_TYPE_FMT = {_BYTE: 'B', _SHORT: 'H', _LONG: 'I'}


def pack_bits_msb_first(values, bits):
    """MSB-first bit packing via a single Python big integer — an intentionally
    different algorithm from data.dng._pack_bitpacked (numpy group folding)."""
    acc = 0
    for v in values:
        if not 0 <= int(v) < (1 << bits):
            raise ValueError(f'value {v} out of {bits}-bit range')
        acc = (acc << bits) | int(v)
    total_bits = bits * len(values)
    pad = (-total_bits) % 8
    acc <<= pad
    return int(acc).to_bytes((total_bits + pad) // 8, 'big')


def build_tiff_dng(entries, pixel_data, endian='<'):
    """Assemble a single-IFD TIFF/DNG byte stream with struct.pack.

    ``entries``: list of (tag, type, values) — values is a tuple of ints, a
    str (ASCII) or a tuple of floats (RATIONAL/SRATIONAL as value*10000/10000).
    Strip offset entries use the placeholder value None and are patched to the
    pixel data location. Supports both byte orders ('<' intel / '>' motorola —
    real cameras ship both)."""
    magic = b'II' if endian == '<' else b'MM'
    u16 = lambda v: struct.pack(endian + 'H', v)
    u32 = lambda v: struct.pack(endian + 'I', v)

    header = magic + u16(42) + u32(8)
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    overflow_start = 8 + ifd_size

    overflow = b''
    records = []
    for tag, ftype, values in sorted(entries, key=lambda e: e[0]):
        if values is None:                       # strip-offset placeholder
            records.append((tag, ftype, 1, None))
            continue
        if ftype == _ASCII:
            payload = values.encode() + b'\x00'
            count = len(payload)
        elif ftype in (_RATIONAL, _SRATIONAL):
            kind = 'iI'[ftype == _RATIONAL] * 2
            payload = b''.join(struct.pack(endian + kind,
                                           int(round(v * 10000)), 10000)
                               for v in values)
            count = len(values)
        else:
            payload = b''.join(struct.pack(endian + _TYPE_FMT[ftype], int(v))
                               for v in values)
            count = len(values)
        if len(payload) <= 4:
            records.append((tag, ftype, count, payload.ljust(4, b'\x00')))
        else:
            records.append((tag, ftype, count, u32(overflow_start + len(overflow))))
            overflow += payload
    if len(overflow) % 2:
        overflow += b'\x00'

    pixel_offset = overflow_start + len(overflow)
    ifd = u16(n)
    for tag, ftype, count, value in records:
        if value is None:
            value = u32(pixel_offset)
        ifd += u16(tag) + u16(ftype) + u32(count) + value
    ifd += u32(0)                                # no next IFD
    return header + ifd + overflow + pixel_data


def foreign_dng(mosaic, bits=16, endian='<', compression=1, pixel_data=None,
                cfa=(1, 0, 2, 1), black=0, white=None, fill_order=None):
    """A complete Bayer DNG from spec-derived bytes (CFA codes: 0=R 1=G 2=B;
    default GBRG). ``pixel_data`` overrides the payload (for compression=7)."""
    mosaic = np.asarray(mosaic)
    h, w = mosaic.shape
    if white is None:
        white = (1 << bits) - 1
    if pixel_data is None:
        if bits == 16:
            kind = '<u2' if endian == '<' else '>u2'
            pixel_data = mosaic.astype(kind).tobytes()
        else:
            pixel_data = b''.join(pack_bits_msb_first(row, bits)
                                  for row in mosaic.tolist())
    entries = [
        (254, _LONG, (0,)),                      # NewSubfileType
        (256, _LONG, (w,)), (257, _LONG, (h,)),
        (258, _SHORT, (bits,)),
        (259, _SHORT, (compression,)),
        (262, _SHORT, (32803,)),                 # Photometric = CFA
        (271, _ASCII, 'ForeignBytes'), (272, _ASCII, 'SpecCam'),
        (273, _LONG, None),                      # StripOffsets (patched)
        (277, _SHORT, (1,)),
        (278, _LONG, (h,)),
        (279, _LONG, (len(pixel_data),)),
        (33421, _SHORT, (2, 2)),                 # CFARepeatPatternDim
        (33422, _BYTE, cfa),                     # CFAPattern
        (50706, _BYTE, (1, 4, 0, 0)),            # DNGVersion
        (50714, _SHORT, (black,)),               # BlackLevel
        (50717, _SHORT, (white,)),               # WhiteLevel
    ]
    if fill_order is not None:
        entries.append((266, _SHORT, (fill_order,)))
    return build_tiff_dng(entries, pixel_data, endian=endian)


# ------------------------------------------------------------------------------
# Clean-room lossless JPEG (ITU T.81 process 14, SOF3) encoder
# ------------------------------------------------------------------------------

# Canonical Huffman table covering SSSS categories 0..16: the Annex K DC
# luminance length pattern extended to the lossless maximum category
# (Kraft sum 2^-2 + 5*2^-3 + sum_{l=4..14} 2^-l < 1).
_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0)  # codes per length 1..16
_HUFFVAL = tuple(range(17))                                 # categories 0..16


def _canonical_codes():
    """JPEG canonical code assignment (T.81 Annex C)."""
    codes, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(_BITS[length - 1]):
            codes[_HUFFVAL[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:             # byte stuffing (T.81 F.1.2.3)
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.acc <<= (8 - self.nbits)
            self.acc |= (1 << (8 - self.nbits)) - 1   # pad with 1-bits
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def encode_sof3(samples, precision, predictor=1):
    """Encode (lines, cols, ncomp) samples as a lossless JPEG (SOF3) stream.

    Interleaved scan when ncomp > 1 (one sample per component per MCU — the
    DNG/CR2 layout), predictor 1 (Ra) by default with the spec's boundary
    rules: the first line predicts from 2^(P-1) then Ra; later lines start
    from Rb. Written from the T.81 text alone — shares no code with
    native/ljpeg.cpp or data/ljpeg.py."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 2:
        samples = samples[:, :, None]
    lines, cols, ncomp = samples.shape
    codes = _canonical_codes()

    def marker(m, payload=b''):
        return struct.pack('>HH', m, len(payload) + 2) + payload

    sof = struct.pack('>BHHB', precision, lines, cols, ncomp)
    for c in range(ncomp):
        sof += struct.pack('>BBB', c + 1, 0x11, 0)
    dht = struct.pack('>B', 0x00) + bytes(_BITS) + bytes(_HUFFVAL)
    sos = struct.pack('>B', ncomp)
    for c in range(ncomp):
        sos += struct.pack('>BB', c + 1, 0x00)
    sos += struct.pack('>BBB', predictor, 0, 0)

    bw = _BitWriter()
    default_pred = 1 << (precision - 1)
    for y in range(lines):
        for x in range(cols):
            for c in range(ncomp):
                if y == 0 and x == 0:
                    pred = default_pred
                elif x == 0:
                    pred = int(samples[y - 1, 0, c])      # Rb at line start
                elif predictor == 1 or y == 0:
                    pred = int(samples[y, x - 1, c])      # Ra
                elif predictor == 2:
                    pred = int(samples[y - 1, x, c])      # Rb
                else:
                    raise ValueError(f'predictor {predictor} not implemented')
                diff = (int(samples[y, x, c]) - pred) & 0xFFFF
                if diff >= 0x8000:
                    diff -= 0x10000
                ssss = 0 if diff == 0 else max(abs(diff), 1).bit_length() \
                    if diff != -32768 else 16
                code, length = codes[ssss]
                bw.put(code, length)
                if ssss and ssss != 16:
                    extra = diff if diff >= 0 else diff + (1 << ssss) - 1
                    bw.put(extra & ((1 << ssss) - 1), ssss)
    entropy = bw.flush()

    return (b'\xff\xd8' + marker(0xFFC3, sof) + marker(0xFFC4, dht)
            + marker(0xFFDA, sos) + entropy + b'\xff\xd9')

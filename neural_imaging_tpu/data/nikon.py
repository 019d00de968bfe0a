"""
Nikon type-34713 (lossless) NEF entropy coding.

The reference reads compressed NEFs through libRAW (ref helpers/raw.py:110-181);
this module implements the coding natively. The bitstream format is publicly
documented (dcraw's ``nikon_load_raw``, the canonical open description of
Compression=34713): a raw MSB-first Huffman bitstream (no JPEG byte stuffing or
markers) of per-sample differences with

- fixed per-(bit-depth, variant) Huffman trees whose symbols pack
  ``(shl << 4) | len`` (``shl`` is 0 in the lossless trees — the symbol is then
  exactly a JPEG SSSS category),
- the first two columns of each row predicted vertically from the same-parity
  row two above (``vpred``, seeded from the metadata block), all other columns
  predicted from the same-CFA-column sample two to the left (``hpred``), and
- a final linearization curve (identity for the lossless variant).

The compression metadata lives in MakerNote tag 0x0096: version bytes, the four
``vpred`` seeds and a curve block. This build implements the **lossless**
variant (version byte 0x46) end-to-end — encoder (for hermetic round-trip
fixtures) + decoder with a native C++ scan core (``native/ljpeg/ljpeg.cpp:
nikon_decode_scan``) and a pure-Python fallback. Lossy variants (curve +
tree-split) raise :class:`NikonFormatError` and fall through to rawpy upstream.
"""
import struct

import numpy as np

from neural_imaging_tpu.data import ljpeg


class NikonFormatError(ValueError):
    pass


# Fixed Huffman trees for the lossless variants: (BITS[1..16], HUFFVAL).
# These are published format constants of the NEF coding (identical in every
# open decoder); symbols are plain SSSS categories (shl nibble = 0).
LOSSLESS_TREES = {
    12: ((0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0),
         (5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10, 11, 12)),
    14: ((0, 1, 4, 2, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0),
         (7, 6, 8, 5, 9, 4, 10, 3, 11, 12, 2, 0, 1, 13, 14)),
}

_VER_LOSSLESS = 0x46


def parse_meta(blob, endian='<'):
    """Parse a MakerNote tag 0x0096 block → dict(ver0, ver1, vpred, curve_size).

    Only the lossless layout is fully parsed; lossy versions raise."""
    if len(blob) < 12:
        raise NikonFormatError('Nikon compression metadata block is truncated')
    ver0, ver1 = blob[0], blob[1]
    pos = 2
    if ver0 == 0x49 or ver1 == 0x58:
        pos += 2110  # documented skip for these versions' padding block
    if len(blob) < pos + 10:
        raise NikonFormatError('Nikon compression metadata block is truncated')
    vpred = np.array(struct.unpack_from(endian + '4H', blob, pos), dtype=np.int32)
    pos += 8
    (csize,) = struct.unpack_from(endian + 'H', blob, pos)
    if ver0 != _VER_LOSSLESS:
        raise NikonFormatError(
            f'Nikon compressed NEF version {ver0:#x}/{ver1:#x} (lossy) is not '
            'natively supported; only the lossless variant (0x46) is.')
    return {'ver0': ver0, 'ver1': ver1, 'vpred': vpred, 'curve_size': csize}


def build_meta(mosaic, endian='<'):
    """Metadata block for :func:`encode`: lossless version bytes + vpred seeds
    (the first two samples of rows 0 and 1, so their coded diffs are zero)."""
    m = np.asarray(mosaic)
    vpred = [int(m[0, 0]), int(m[0, 1]),
             int(m[1, 0]) if m.shape[0] > 1 else 0,
             int(m[1, 1]) if m.shape[0] > 1 else 0]
    return (bytes((_VER_LOSSLESS, 0x30))
            + struct.pack(endian + '4H', *vpred)
            + struct.pack(endian + 'H', 1))  # csize 1: no curve (identity)


# ----------------------------------------------------------------------------------
# Encoder (fixture synthesis; pure numpy)
# ----------------------------------------------------------------------------------

def _pack_bits(values, lengths):
    """MSB-first concatenation of (value, bit-length) pairs → bytes."""
    lengths = lengths.astype(np.int64)
    total = int(lengths.sum())
    out = np.zeros(-(-total // 8) * 8, dtype=np.uint8)
    pos = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    for b in range(int(lengths.max(initial=0))):
        mask = lengths > b
        shift = (lengths[mask] - 1 - b).astype(np.uint32)
        out[pos[mask] + b] = ((values[mask] >> shift) & 1).astype(np.uint8)
    return np.packbits(out).tobytes()


def encode(mosaic, bits):
    """Encode a uint16 mosaic as a lossless type-34713 bitstream.

    Returns (payload bytes, metadata blob for MakerNote tag 0x0096)."""
    if bits not in LOSSLESS_TREES:
        raise NikonFormatError(f'No lossless Nikon tree for {bits}-bit data')
    m = np.asarray(mosaic, dtype=np.int32)
    if m.ndim != 2 or m.shape[0] < 1 or m.shape[1] < 2:
        raise NikonFormatError('Mosaic must be 2D with width >= 2')
    if m.max(initial=0) >= (1 << bits):
        raise NikonFormatError(f'Mosaic exceeds the {bits}-bit range')
    h, w = m.shape

    diffs = np.empty((h, w), dtype=np.int32)
    diffs[:, 2:] = m[:, 2:] - m[:, :-2]           # horizontal, same CFA column
    diffs[2:, :2] = m[2:, :2] - m[:-2, :2]        # vertical seeds, same parity row
    diffs[:2, :2] = 0                             # absorbed into the vpred seeds

    flat = diffs.reshape(-1)
    mag = np.abs(flat)
    ssss = np.zeros(flat.shape, dtype=np.int32)
    nz = mag > 0
    ssss[nz] = np.floor(np.log2(mag[nz])).astype(np.int32) + 1

    tree_bits, tree_vals = LOSSLESS_TREES[bits]
    codes = ljpeg._canonical_codes(list(tree_bits), list(tree_vals))
    code_lut = np.zeros(17, dtype=np.uint32)
    len_lut = np.zeros(17, dtype=np.int64)
    for sym, (code, length) in codes.items():
        code_lut[sym], len_lut[sym] = code, length

    # JPEG-style magnitude bits: d >= 0 → d, d < 0 → d + 2^ssss - 1
    magbits = np.where(flat >= 0, flat, flat + (1 << ssss) - 1).astype(np.uint32)
    pairs_v = np.empty(flat.size * 2, dtype=np.uint32)
    pairs_l = np.empty(flat.size * 2, dtype=np.int64)
    pairs_v[0::2] = code_lut[ssss]
    pairs_l[0::2] = len_lut[ssss]
    pairs_v[1::2] = magbits
    pairs_l[1::2] = ssss
    return _pack_bits(pairs_v, pairs_l), build_meta(m)


# ----------------------------------------------------------------------------------
# Decoder — native C++ core with a pure-Python differential-test fallback
# ----------------------------------------------------------------------------------

def _decode_python(data, lines, width, bits, vpred_init):
    tree_bits, tree_vals = LOSSLESS_TREES[bits]
    lut_val, lut_len = ljpeg._decode_table(list(tree_bits), list(tree_vals))
    max_val = (1 << bits) - 1

    # raw bitstream (no 0xFF stuffing): simple accumulator reader
    arr = np.frombuffer(data, dtype=np.uint8)
    acc, nbits, pos = 0, 0, 0

    out = np.empty((lines, width), dtype=np.uint16)
    vpred = [[int(vpred_init[0]), int(vpred_init[1])],
             [int(vpred_init[2]), int(vpred_init[3])]]
    for row in range(lines):
        hpred = [0, 0]
        for col in range(width):
            while nbits < 32:
                byte = int(arr[pos]) if pos < len(arr) else 0
                acc = ((acc << 8) | byte) & 0xFFFFFFFFFFFF
                nbits += 8
                pos += 1
            look = (acc >> (nbits - 16)) & 0xFFFF
            clen = int(lut_len[look])
            if clen == 0:
                raise NikonFormatError('Invalid Huffman code in NEF bitstream')
            sym = int(lut_val[look])
            nbits -= clen
            slen = sym & 15
            if slen:
                v = (acc >> (nbits - slen)) & ((1 << slen) - 1)
                nbits -= slen
                diff = ljpeg._extend(int(v), slen)
            else:
                diff = 0
            if col < 2:
                vpred[row & 1][col] += diff
                hpred[col] = vpred[row & 1][col]
            else:
                hpred[col & 1] += diff
            out[row, col] = min(max(hpred[col & 1], 0), max_val)
    return out


def _decode_native(data, lines, width, bits, vpred_init):
    import ctypes
    lib = ljpeg._load_native()
    if lib is None or not hasattr(lib, 'nikon_decode_scan'):
        return None
    if not getattr(lib, '_nikon_configured', False):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.nikon_decode_scan.restype = ctypes.c_int
        lib.nikon_decode_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            u8p, u8p, ctypes.c_int,
            u8p, u8p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint16)]
        lib._nikon_configured = True

    tree_bits, tree_vals = LOSSLESS_TREES[bits]
    bits_arr = np.asarray(tree_bits, dtype=np.uint8)
    vals_arr = np.asarray(tree_vals, dtype=np.uint8)
    vpred = np.asarray(vpred_init, dtype=np.int32)
    curve = np.arange(1 << bits, dtype=np.uint16)  # lossless: identity curve
    out = np.empty((lines, width), dtype=np.uint16)

    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.nikon_decode_scan(
        data, len(data),
        bits_arr.ctypes.data_as(u8p), vals_arr.ctypes.data_as(u8p), len(vals_arr),
        bits_arr.ctypes.data_as(u8p), vals_arr.ctypes.data_as(u8p), len(vals_arr),
        lines, width, 0,
        vpred.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        curve.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), len(curve),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    if rc != 0:
        raise NikonFormatError(f'Malformed Nikon NEF bitstream (native rc={rc})')
    return out


def decode(data, lines, width, bits, meta_blob, endian='<'):
    """Decode a type-34713 lossless bitstream → (lines, width) uint16 mosaic.

    ``meta_blob`` is the raw MakerNote tag 0x0096 payload."""
    if bits not in LOSSLESS_TREES:
        raise NikonFormatError(f'No lossless Nikon tree for {bits}-bit data')
    meta = parse_meta(meta_blob, endian)
    out = _decode_native(bytes(data), lines, width, bits, meta['vpred'])
    if out is None:
        out = _decode_python(bytes(data), lines, width, bits, meta['vpred'])
    return out

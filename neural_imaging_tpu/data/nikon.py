"""
Nikon type-34713 NEF entropy coding (lossless AND lossy variants).

The reference reads compressed NEFs through libRAW (ref helpers/raw.py:110-181);
this module implements the coding natively. The bitstream format is publicly
documented (dcraw's ``nikon_load_raw``, the canonical open description of
Compression=34713): a raw MSB-first Huffman bitstream (no JPEG byte stuffing or
markers) of per-sample differences with

- fixed per-(bit-depth, variant) Huffman trees whose symbols pack
  ``(shl << 4) | len`` (``shl`` is 0 in the lossless trees — the symbol is then
  exactly a JPEG SSSS category; the lossy after-split trees use ``shl > 0``
  symbols that requantize mid-size differences, which is where the loss is),
- the first two columns of each row predicted vertically from the same-parity
  row two above (``vpred``, seeded from the metadata block), all other columns
  predicted from the same-CFA-column sample two to the left (``hpred``), and
- a final linearization curve (identity for the lossless variant; stored
  verbatim in the type-1 lossy layout, sampled on a uniform grid + linearly
  interpolated in the type-2 layout, which also carries the row where the
  decoder switches to the after-split tree).

The compression metadata lives in MakerNote tag 0x0096: version bytes, the
four ``vpred`` seeds and the curve block. Both variants are implemented end to
end — encoders (for hermetic round-trip fixtures; the lossy one runs the
decoder's reconstruction closed-loop) + decoder with a native C++ scan core
(``native/ljpeg/ljpeg.cpp: nikon_decode_scan``) and a pure-Python fallback.
"""
import struct

import numpy as np

from neural_imaging_tpu.data import ljpeg


class NikonFormatError(ValueError):
    pass


# Fixed Huffman trees of the NEF coding: (BITS[1..16], HUFFVAL), keyed by
# (variant, bit depth). These are published format constants (identical in
# every open decoder). Lossless symbols are plain SSSS categories (shl nibble
# = 0); the lossy after-split trees drop the mid categories and replace them
# with shifted symbols ``(shl << 4) | len`` that quantize large differences —
# that quantization is what makes the variant lossy. All six BITS rows are
# Kraft-complete (verified by tests).
TREES = {
    ('lossy', 12): ((0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0),
                    (5, 4, 3, 6, 2, 7, 1, 0, 8, 9, 11, 10, 12, 0)),
    ('lossy_split', 12): ((0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0),
                          (0x39, 0x5A, 0x38, 0x27, 0x16, 5, 4, 3, 2, 1, 0,
                           11, 12, 12)),
    ('lossless', 12): ((0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0),
                       (5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10, 11, 12)),
    ('lossy', 14): ((0, 1, 4, 3, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0),
                    (5, 6, 4, 7, 8, 3, 9, 2, 1, 0, 10, 11, 12, 13, 14)),
    ('lossy_split', 14): ((0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0),
                          (8, 0x5C, 0x4B, 0x3A, 0x29, 7, 6, 5, 4, 3, 2, 1, 0,
                           13, 14)),
    ('lossless', 14): ((0, 1, 4, 2, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0),
                       (7, 6, 8, 5, 9, 4, 10, 3, 11, 12, 2, 0, 1, 13, 14)),
}
LOSSLESS_TREES = {b: TREES[('lossless', b)] for b in (12, 14)}

_VER_LOSSLESS = 0x46
_SPLIT_OFFSET = 562   # blob offset of the split row (0x44/0x20 layout)


def parse_meta(blob, endian='<', bits=None):
    """Parse a MakerNote tag 0x0096 block →
    dict(ver0, ver1, vpred, curve_size, curve, split, variant).

    Layouts (the documented 34713 metadata block): version bytes, the four
    vpred seeds, a curve-size short, then

    - **lossless** (ver0 0x46): no curve (identity linearization);
    - **lossy type 2** (ver0 0x44, ver1 0x20 — split-capable bodies):
      ``csize`` curve samples on a uniform grid of step ``(1 << bits) //
      (csize - 1)``, linearly interpolated to the full input range, plus the
      tree-split row stored at blob offset 562;
    - **lossy type 1** (any other version): the full curve of ``csize``
      entries stored verbatim.

    ``bits`` is required to interpolate the type-2 curve grid."""
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
    pos += 2
    meta = {'ver0': ver0, 'ver1': ver1, 'vpred': vpred, 'curve_size': csize,
            'curve': None, 'split': 0, 'variant': 'lossless'}
    if ver0 == _VER_LOSSLESS:
        return meta
    meta['variant'] = 'lossy'

    def read_shorts(n):
        if len(blob) < pos + 2 * n:
            raise NikonFormatError('Nikon curve block is truncated')
        return np.frombuffer(blob, dtype=np.dtype(endian + 'u2'),
                             count=n, offset=pos)

    step = 0
    if ver0 == 0x44 and ver1 == 0x20 and csize > 1:
        if bits is None:
            raise NikonFormatError('bit depth required for the type-2 curve')
        vmax = (1 << bits) & 0x7FFF
        step = vmax // (csize - 1)
    if step > 0:
        # type 2: samples on a uniform grid, linearly interpolated; the tail
        # beyond the sampled span stays identity, as open decoders pre-fill
        samples = read_shorts(csize).astype(np.uint32)
        curve = np.arange(vmax + step, dtype=np.uint32)
        curve[np.arange(csize) * step] = samples
        i = np.arange(vmax)
        frac = i % step
        base = i - frac
        curve[:vmax] = (curve[base] * (step - frac)
                        + curve[base + step] * frac) // step
        meta['curve'] = curve[:vmax].astype(np.uint16)
        if len(blob) >= _SPLIT_OFFSET + 2:
            (meta['split'],) = struct.unpack_from(endian + 'H', blob,
                                                  _SPLIT_OFFSET)
    elif 1 < csize <= 0x4001:
        # type 1: the full curve stored verbatim
        meta['curve'] = read_shorts(csize).astype(np.uint16)
    return meta


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


def build_meta_lossy(vpred, curve_samples=None, split=0, full_curve=None,
                     endian='<'):
    """Metadata block for a lossy fixture.

    ``curve_samples`` → the type-2 layout (ver 0x44/0x20): grid samples +
    split row at offset 562. ``full_curve`` → the type-1 layout (ver
    0x42/0x10): the curve stored verbatim. Neither → lossy with identity
    linearization (csize 1)."""
    head = struct.pack(endian + '4H', *[int(v) for v in vpred])
    if curve_samples is not None:
        samples = np.asarray(curve_samples, np.uint16)
        body = (head + struct.pack(endian + 'H', len(samples))
                + samples.astype(np.dtype(endian + 'u2')).tobytes())
        blob = bytes((0x44, 0x20)) + body
        blob += b'\0' * max(0, _SPLIT_OFFSET - len(blob))
        return blob + struct.pack(endian + 'H', int(split))
    if full_curve is not None:
        curve = np.asarray(full_curve, np.uint16)
        return (bytes((0x42, 0x10)) + head
                + struct.pack(endian + 'H', len(curve))
                + curve.astype(np.dtype(endian + 'u2')).tobytes())
    return bytes((0x42, 0x10)) + head + struct.pack(endian + 'H', 1)


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


def _symbol_table(tree_bits, tree_vals):
    """Per-category encoding choice: {len: (shl, code, codelen)} — plain
    (shl=0) symbols preferred, else the least-shifted symbol of that length."""
    codes = ljpeg._canonical_codes(list(tree_bits), list(tree_vals))
    best = {}
    for sym, (code, codelen) in codes.items():
        slen, shl = sym & 15, sym >> 4
        if slen not in best or shl < best[slen][0]:
            best[slen] = (shl, code, codelen)
    return best


def encode_lossy(indices, bits, split=0):
    """Encode curve-domain indices as a lossy type-34713 bitstream.

    Pre-split rows use the plain-category lossy tree (every SSSS category is
    present → exact); rows from ``split`` on use the after-split tree, whose
    shifted symbols ``(shl << 4) | len`` quantize mid-size differences by up
    to ``2**shl``. The encoder runs the decoder's reconstruction closed-loop
    (standard DPCM), so the stream decodes to the returned reconstruction
    exactly. Returns (payload, reconstructed, vpred_seeds)."""
    m = np.asarray(indices, dtype=np.int32)
    if m.ndim != 2 or m.shape[0] < 2 or m.shape[1] < 2:
        raise NikonFormatError('Mosaic must be 2D with height/width >= 2')
    h, w = m.shape
    table = _symbol_table(*TREES[('lossy', bits)])
    table_split = _symbol_table(*TREES[('lossy_split', bits)])

    vals, lens = [], []

    def emit(value, length):
        vals.append(value)
        lens.append(length)

    def code_diff(d, tab):
        """Encode one difference; return the decoder's reconstruction."""
        if d == 0:
            shl, code, codelen = tab[0]
            emit(code, codelen)
            return 0
        c = int(abs(d)).bit_length()
        shl, code, codelen = tab[c]
        emit(code, codelen)
        if shl == 0:
            v = d if d > 0 else d + (1 << c) - 1
            emit(v & ((1 << c) - 1), c)
            return d
        if d > 0:
            v = d >> shl
        else:
            v = min((d + (1 << c)) >> shl, (1 << (c - 1 - shl)) - 1)
        emit(v, c - shl)
        raw = (((v << 1) + 1) << shl) >> 1
        return raw if raw & (1 << (c - 1)) else raw - (1 << c)

    vpred_seed = [int(m[0, 0]), int(m[0, 1]), int(m[1, 0]), int(m[1, 1])]
    vpred = [vpred_seed[:2], vpred_seed[2:]]
    recon = np.empty((h, w), dtype=np.int32)
    for row in range(h):
        tab = table_split if split and row >= split else table
        hpred = [0, 0]
        for col in range(w):
            target = int(m[row, col])
            pred = vpred[row & 1][col] if col < 2 else hpred[col & 1]
            d = code_diff(target - pred, tab)
            if col < 2:
                vpred[row & 1][col] += d
                hpred[col] = vpred[row & 1][col]
            else:
                hpred[col & 1] += d
            recon[row, col] = hpred[col & 1]
    payload = _pack_bits(np.asarray(vals, np.uint32), np.asarray(lens, np.int64))
    return payload, recon, vpred_seed


# ----------------------------------------------------------------------------------
# Decoder — native C++ core with a pure-Python differential-test fallback
# ----------------------------------------------------------------------------------

def _decode_python(data, lines, width, bits, vpred_init,
                   variant='lossless', split=0, curve=None):
    tree_bits, tree_vals = TREES[(variant, bits)]
    lut_val, lut_len = ljpeg._decode_table(list(tree_bits), list(tree_vals))
    if curve is None:
        clamp = (1 << bits) - 1
    else:
        curve = np.asarray(curve, np.uint16)
        clamp = len(curve) - 1

    # raw bitstream (no 0xFF stuffing): simple accumulator reader
    arr = np.frombuffer(data, dtype=np.uint8)
    acc, nbits, pos = 0, 0, 0

    out = np.empty((lines, width), dtype=np.uint16)
    vpred = [[int(vpred_init[0]), int(vpred_init[1])],
             [int(vpred_init[2]), int(vpred_init[3])]]
    for row in range(lines):
        if split and row == split:
            tree_bits, tree_vals = TREES[(variant + '_split', bits)]
            lut_val, lut_len = ljpeg._decode_table(list(tree_bits),
                                                   list(tree_vals))
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
            shl = sym >> 4
            if slen:
                v = (acc >> (nbits - (slen - shl))) & ((1 << (slen - shl)) - 1)
                nbits -= slen - shl
                # shifted reconstruction: mid-rise requantization of the
                # dropped shl low bits, then the usual SSSS sign extension
                diff = (((v << 1) + 1) << shl) >> 1
                if (diff & (1 << (slen - 1))) == 0:
                    diff -= (1 << slen) - (0 if shl else 1)
            else:
                diff = 0
            if col < 2:
                vpred[row & 1][col] += diff
                hpred[col] = vpred[row & 1][col]
            else:
                hpred[col & 1] += diff
            v = min(max(hpred[col & 1], 0), clamp)
            out[row, col] = v if curve is None else curve[v]
    return out


def _decode_native(data, lines, width, bits, vpred_init,
                   variant='lossless', split=0, curve=None):
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

    tree_bits, tree_vals = TREES[(variant, bits)]
    bits_arr = np.asarray(tree_bits, dtype=np.uint8)
    vals_arr = np.asarray(tree_vals, dtype=np.uint8)
    sp_key = (variant + '_split', bits)
    sp_bits, sp_vals = TREES[sp_key] if split and sp_key in TREES \
        else (tree_bits, tree_vals)
    sp_bits_arr = np.asarray(sp_bits, dtype=np.uint8)
    sp_vals_arr = np.asarray(sp_vals, dtype=np.uint8)
    vpred = np.asarray(vpred_init, dtype=np.int32)
    if curve is None:
        curve = np.arange(1 << bits, dtype=np.uint16)  # identity curve
    else:
        curve = np.ascontiguousarray(curve, dtype=np.uint16)
    out = np.empty((lines, width), dtype=np.uint16)

    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.nikon_decode_scan(
        data, len(data),
        bits_arr.ctypes.data_as(u8p), vals_arr.ctypes.data_as(u8p), len(vals_arr),
        sp_bits_arr.ctypes.data_as(u8p), sp_vals_arr.ctypes.data_as(u8p),
        len(sp_vals_arr),
        lines, width, int(split),
        vpred.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        curve.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), len(curve),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    if rc != 0:
        raise NikonFormatError(f'Malformed Nikon NEF bitstream (native rc={rc})')
    return out


def decode(data, lines, width, bits, meta_blob, endian='<'):
    """Decode a type-34713 bitstream → (lines, width) uint16 mosaic.

    ``meta_blob`` is the raw MakerNote tag 0x0096 payload; its version bytes
    select the variant — lossless (0x46), lossy type 2 (0x44/0x20:
    interpolated curve + tree split) or lossy type 1 (verbatim curve)."""
    if bits not in (12, 14):
        raise NikonFormatError(f'No Nikon trees for {bits}-bit data')
    meta = parse_meta(meta_blob, endian, bits=bits)
    args = (bytes(data), lines, width, bits, meta['vpred'])
    kw = {'variant': meta['variant'], 'split': meta['split'],
          'curve': meta['curve']}
    out = _decode_native(*args, **kw)
    if out is None:
        out = _decode_python(*args, **kw)
    return out

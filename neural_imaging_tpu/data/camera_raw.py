"""
Native camera-RAW container support: CR2, NEF and ARW without libRAW/rawpy.

The reference ingests every camera format through rawkit/libRAW
(ref helpers/raw.py:110-181); this build already reads DNGs natively
(data/dng.py) and this module extends native coverage to the three most common
vendor containers, all of which are TIFF variants:

- **CR2** (Canon): TIFF with a ``CR\\x02\\x00`` marker at byte 8 and a direct
  pointer to the raw IFD. The CFA payload is a single lossless-JPEG (SOF3)
  stream — decoded by ``data/ljpeg.py`` — whose pixel stream is rearranged into
  vertical *slices* described by tag 0xc640. As-shot white balance is read from
  the Canon MakerNote ColorData block (tag 0x4001) when present.
- **NEF** (Nikon): TIFF-EP with the raw image in a SubIFD
  (Photometric=CFA). Uncompressed 12/14-bit NEFs pack samples as an MSB-first
  bitstream; 16-bit containers are plain words. Nikon's type-34713 entropy
  coding is decoded natively in **both** variants (``data/nikon.py`` + the C++
  scan core): lossless (ver 0x46), and lossy with the linearization curve
  (type-1 verbatim / type-2 interpolated grid) and the after-split Huffman
  trees whose shifted symbols quantize mid-size differences.
- **ARW** (Sony): TIFF-EP, uncompressed 12/14/16-bit raw SubIFD. Sony's
  cRAW/ARW2 coding (Compression=32767) is decoded natively (``data/sony.py``):
  16-pixel max/min/delta blocks, the segmented tone curve from private tag
  0x7010, and the XOR-encrypted SR2 metadata chain (tags 0x7200/0x7201/0x7221
  → curve, per-channel black 0x7310, as-shot WB 0x7313). The
  lossless-compressed ARW of the newest bodies (Compression=7) is read as
  standard TIFF tiled/stripped SOF3 via the shared lossless-JPEG machinery
  (``data/dng.py`` + ``data/ljpeg.py``).

Pixel decode is exact and covered by hermetic round-trip tests (each writer
below produces spec-layout files the reader must invert, and the same mosaic
written as a DNG must develop identically). Colorimetry caveat: unlike DNG,
the vendor containers do not carry a standard color matrix — real-world
pipelines (dcraw included) use built-in per-camera matrices. When a file has
no usable color metadata the reader returns ``cam2srgb=I`` and unit WB; the
framework's camera profiles (``config/cameras.json``, ClassicISP camera
injection) are the supported way to attach colorimetry, matching how the
reference trains per-camera NIPs.
"""
import os
import struct

import numpy as np

from neural_imaging_tpu.data import dng as _dng
from neural_imaging_tpu.data.dng import (
    DNGError, _all_ifds, _read_ifd, _tag,
    _TAG_BITS, _TAG_BLACK_LEVEL, _TAG_CFA_PATTERN, _TAG_CFA_REPEAT_DIM,
    _TAG_COMPRESSION, _TAG_LENGTH, _TAG_MAKE, _TAG_MODEL, _TAG_PHOTOMETRIC,
    _TAG_ROWS_PER_STRIP, _TAG_STRIP_BYTE_COUNTS, _TAG_STRIP_OFFSETS,
    _TAG_SUB_IFDS, _TAG_WHITE_LEVEL, _TAG_WIDTH, _CFA_CODE, _CFA_CODE_INV,
    _PHOTOMETRIC_CFA, _ASCII, _BYTE, _LONG, _SHORT,
    _pack_bitpacked, _unpack_bitpacked,
)

_TAG_NEW_SUBFILE_TYPE = 254
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_PLANAR_CONFIG = 284
_TAG_EXIF_IFD = 34665
_TAG_MAKERNOTE = 37500
_TAG_CR2_SLICE = 50752          # 0xc640: (N, slice_width, last_slice_width)
_TAG_CANON_COLOR_DATA = 0x4001  # MakerNote: ColorData block with as-shot WB

_COMPRESSION_NONE = 1
_COMPRESSION_OLD_JPEG = 6       # CR2 uses the legacy tag id for its SOF3 payload
_COMPRESSION_LJPEG = 7          # lossless JPEG (SOF3) strips/tiles — newest ARWs
_COMPRESSION_NIKON = 34713
_COMPRESSION_SONY = 32767

_TAG_SONY_BLACK = 0x7310        # Sony: per-channel black levels (SHORT[4])
_TAG_SONY_CURVE = 0x7010        # Sony: cRAW tone-curve breakpoints (SHORT[4])
_TAG_SONY_WB = 0x7313           # Sony: as-shot WB levels R,G1,G2,B (SHORT[4])
_TAG_SR2_OFFSET = 0x7200        # Sony: encrypted SR2 sub-IFD offset
_TAG_SR2_LENGTH = 0x7201        # Sony: encrypted SR2 sub-IFD byte length
_TAG_SR2_KEY = 0x7221           # Sony: SR2 decryption key
_TAG_DNG_PRIVATE = 0xC634       # IFD0 → vendor private IFD (Sony: SR2Private)

# Per-vendor black-level floors applied when a file carries NO usable level
# metadata. Real vendor containers do not use the DNG BlackLevel tag: Canon
# stores levels in opaque vendor blocks (typ. ~2048 at 14 bit, ~256 at 12 bit),
# Sony in tag 0x7310 (typ. 512 at 14 bit, 128 at 12 bit), while Nikon sensors
# clamp black on-chip (NEF black is genuinely 0 for most bodies). The reference
# gets these through libRAW's per-camera knowledge (ref helpers/raw.py:126-133);
# without vendor metadata we fall back to these defaults WITH A WARNING rather
# than silently normalizing with black=0.
_VENDOR_BLACK_DEFAULTS = {
    ('Canon', 14): 2048, ('Canon', 12): 256,
    ('ARW', 14): 512, ('ARW', 12): 128, ('ARW', 16): 512,
    ('NEF', 14): 0, ('NEF', 12): 0, ('NEF', 16): 0,
}


def _default_black(vendor, bits, camera):
    black = _VENDOR_BLACK_DEFAULTS.get((vendor, bits), 0)
    if black:
        from neural_imaging_tpu.utils.utils import logger
        logger.warning(
            '%s (%s) carries no black-level metadata — using the per-make '
            'default %d for %d-bit data; verify against a reference developer '
            'if colorimetric accuracy matters.', vendor, camera, black, bits)
    return black


class UnsupportedRawError(DNGError):
    """Structurally valid camera file whose payload encoding is not implemented."""


# ----------------------------------------------------------------------------------
# Shared helpers
# ----------------------------------------------------------------------------------

def _open_tiff(filename):
    with open(filename, 'rb') as fh:
        buf = fh.read()
    if len(buf) < 16:
        raise DNGError('Truncated camera RAW file')
    order = buf[:2]
    if order == b'II':
        endian = '<'
    elif order == b'MM':
        endian = '>'
    else:
        raise DNGError('Not a TIFF-based RAW file (bad byte-order mark)')
    magic, first_ifd = struct.unpack_from(endian + 'HI', buf, 2)
    if magic != 42:
        raise DNGError('Not a TIFF-based RAW file (bad magic)')
    return buf, endian, first_ifd


def _cfa_from_ifd(ifd, default='RGGB'):
    dim = _tag(ifd, _TAG_CFA_REPEAT_DIM, (2, 2))
    if tuple(dim) != (2, 2):
        raise DNGError(f'Only 2x2 CFA patterns are supported, got {dim}')
    codes = _tag(ifd, _TAG_CFA_PATTERN)
    if codes is None:
        return default
    return ''.join(_CFA_CODE.get(c, '?') for c in codes)


def _result(mosaic, cfa, black, white, cam_mul, cam2srgb, camera):
    return {'mosaic': mosaic, 'cfa_pattern': cfa, 'black': float(black),
            'white': float(white), 'cam_mul': np.asarray(cam_mul, np.float32),
            'cam2srgb': np.asarray(cam2srgb, np.float64), 'camera': str(camera)}


# ----------------------------------------------------------------------------------
# CR2 (Canon)
# ----------------------------------------------------------------------------------

def _canon_wb_from_makernote(buf, endian, ifd0):
    """Best-effort as-shot WB: EXIF IFD -> MakerNote IFD -> ColorData (0x4001).

    The ColorData block is a SHORT array whose WB_AsShot quadruple sits at a
    byte offset that depends on the block generation — 50 (count 582),
    68 (count 653), 126 (larger blocks), stored as (R, G1, G2, B) levels
    (dcraw's ``c ^ (c >> 1)`` permutation of cam_mul)."""
    exif_ptr = _tag(ifd0, _TAG_EXIF_IFD)
    if not exif_ptr:
        return None
    # The MakerNote is an UNDEFINED blob holding a bare Canon IFD (same
    # endianness, no TIFF header) at the tag's data offset.
    try:
        mk_off = _find_tag_data_offset(buf, exif_ptr[0], endian, _TAG_MAKERNOTE)
    except struct.error:
        return None  # malformed/truncated EXIF IFD pointer → no WB, not a crash
    if mk_off is None:
        return None
    try:
        canon, _ = _read_ifd(buf, mk_off, endian)
    except struct.error:
        return None
    cd = canon.get(_TAG_CANON_COLOR_DATA)
    if cd is None:
        return None
    typ, values = cd
    count = len(values)
    byte_off = 50 if count == 582 else 68 if count == 653 else 126
    word = byte_off // 2
    if count < word + 4:
        return None
    r, g1, g2, b = (float(values[word + i]) for i in range(4))
    if min(r, g1, g2, b) <= 0:
        return None
    g = (g1 + g2) / 2.0
    return np.array([r / g, 1.0, b / g, 1.0], dtype=np.float32)


def _find_tag_data_offset(buf, ifd_offset, endian, wanted_tag, data_base=0):
    """Return the file offset of a tag's out-of-line data within one IFD.
    ``data_base`` shifts out-of-line pointers (MakerNotes with an embedded
    TIFF header store offsets relative to that header)."""
    found = _find_tag_data_span(buf, ifd_offset, endian, wanted_tag, data_base)
    return None if found is None else found[0]


def _find_tag_data_span(buf, ifd_offset, endian, wanted_tag, data_base=0):
    """Like :func:`_find_tag_data_offset` but returns (offset, byte_size)."""
    (n_entries,) = struct.unpack_from(endian + 'H', buf, ifd_offset)
    pos = ifd_offset + 2
    for _ in range(n_entries):
        tag, typ, count = struct.unpack_from(endian + 'HHI', buf, pos)
        if tag == wanted_tag:
            size = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2}.get(typ, 4)
            nbytes = size * count
            if nbytes <= 4:
                return pos + 8, nbytes
            (off,) = struct.unpack_from(endian + 'I', buf, pos + 8)
            return data_base + off, nbytes
        pos += 12
    return None


def read_cr2(filename):
    """Parse a Canon CR2: SOF3 payload + slice reassembly. Returns the same
    dict shape as :func:`neural_imaging_tpu.data.dng.read_dng`."""
    buf, endian, first_ifd = _open_tiff(filename)
    if buf[8:10] != b'CR':
        raise DNGError('Not a CR2 file (missing CR marker at byte 8)')
    (raw_ifd_off,) = struct.unpack_from(endian + 'I', buf, 12)
    raw_ifd, _ = _read_ifd(buf, raw_ifd_off, endian)
    ifd0, _ = _read_ifd(buf, first_ifd, endian)

    compression = _tag(raw_ifd, _TAG_COMPRESSION, (_COMPRESSION_OLD_JPEG,))[0]
    if compression != _COMPRESSION_OLD_JPEG:
        raise UnsupportedRawError(
            f'CR2 compression={compression} is not supported (expected the '
            'lossless-JPEG raw IFD); convert to DNG for native ingestion.')

    offsets = _tag(raw_ifd, _TAG_STRIP_OFFSETS)
    counts = _tag(raw_ifd, _TAG_STRIP_BYTE_COUNTS)
    if offsets is None or counts is None:
        raise DNGError('CR2 raw IFD is missing its strip offset/byte count')
    from neural_imaging_tpu.data import ljpeg
    dec, precision = ljpeg.decode(buf[offsets[0]:offsets[0] + counts[0]])
    lines, samples, ncomp = dec.shape
    total = lines * samples * ncomp

    slice_info = _tag(raw_ifd, _TAG_CR2_SLICE)
    flat = dec.reshape(-1)
    if slice_info and slice_info[0]:
        n_extra, ws, w_last = int(slice_info[0]), int(slice_info[1]), int(slice_info[2])
        widths = [ws] * n_extra + [w_last]
    else:
        widths = [samples * ncomp]
    width = sum(widths)
    if total % width:
        raise DNGError(f'CR2 slice widths {widths} do not divide the decoded '
                       f'sample count {total}')
    height = total // width
    mosaic = np.empty((height, width), dtype=np.uint16)
    pos = 0
    x0 = 0
    for w in widths:
        block = flat[pos:pos + height * w].reshape(height, w)
        mosaic[:, x0:x0 + w] = block
        pos += height * w
        x0 += w

    cfa = _cfa_from_ifd(raw_ifd, default='RGGB')
    camera = _tag(ifd0, _TAG_MODEL, ('Canon',))
    camera = camera if isinstance(camera, str) else camera[0]
    black = _tag(raw_ifd, _TAG_BLACK_LEVEL)
    if black is None:  # real CR2s keep levels in vendor blocks, not DNG tags
        black = (_default_black('Canon', precision, camera),)
    white = _tag(raw_ifd, _TAG_WHITE_LEVEL, ((1 << precision) - 1,))[0]
    cam_mul = _canon_wb_from_makernote(buf, endian, ifd0)
    if cam_mul is None:
        cam_mul = np.ones(4, dtype=np.float32)
    return _result(mosaic, cfa, np.mean(black), white, cam_mul, np.eye(3), camera)


# ----------------------------------------------------------------------------------
# NEF (Nikon) / ARW (Sony) — TIFF-EP with an uncompressed (possibly bit-packed)
# or Nikon-compressed (type 34713) CFA SubIFD
# ----------------------------------------------------------------------------------

_TAG_NIKON_COMPRESSION_META = 0x0096  # MakerNote: vpred seeds + curve block


def _nikon_compression_meta(buf, endian, ifd0):
    """Locate the MakerNote tag 0x0096 payload (type-34713 metadata).

    Real NEF MakerNotes start with ``Nikon\\0`` followed by an embedded TIFF
    header at +10, with tag data offsets relative to that header; synthetic
    fixtures write a bare IFD. Returns the raw blob, or None."""
    exif_ptr = _tag(ifd0, _TAG_EXIF_IFD)
    if not exif_ptr:
        return None
    try:
        mk_off = _find_tag_data_offset(buf, exif_ptr[0], endian, _TAG_MAKERNOTE)
        if mk_off is None:
            return None
        if buf[mk_off:mk_off + 5] == b'Nikon':
            base = mk_off + 10
            order = buf[base:base + 2]
            mk_endian = '<' if order == b'II' else '>' if order == b'MM' else None
            if mk_endian is None:
                return None
            (first_ifd,) = struct.unpack_from(mk_endian + 'I', buf, base + 4)
            span = _find_tag_data_span(buf, base + first_ifd, mk_endian,
                                       _TAG_NIKON_COMPRESSION_META, data_base=base)
        else:  # bare Nikon IFD (same endianness, absolute offsets)
            span = _find_tag_data_span(buf, mk_off, endian,
                                       _TAG_NIKON_COMPRESSION_META)
    except struct.error:
        return None
    if span is None:
        return None
    off, nbytes = span
    return buf[off:off + nbytes]

def _sony_private_ifd(buf, endian, ifds):
    """Decrypt + parse the Sony SR2 private metadata sub-IFD, if present.

    Real ARWs chain IFD0 tag 0xC634 (DNGPrivateData) → the plain "SR2Private"
    IFD carrying tags 0x7200/0x7201/0x7221 (offset/length/key of the encrypted
    block) → the encrypted SR2 sub-IFD with the cRAW tone curve (0x7010),
    per-channel black (0x7310) and as-shot WB (0x7313). The encrypted IFD's
    out-of-line data offsets are absolute file offsets, so the block is
    decrypted in place (in a copy) before parsing. Returns the sub-IFD dict,
    or None when any link of the chain is absent/malformed."""
    scan = list(ifds)
    priv_ptr = _tag(ifds[0], _TAG_DNG_PRIVATE) if ifds else None
    if priv_ptr:
        try:
            entries, _ = _read_ifd(buf, int(priv_ptr[0]), endian)
            scan.insert(0, entries)
        except (struct.error, ValueError, IndexError):
            pass
    for ifd in scan:
        off = _tag(ifd, _TAG_SR2_OFFSET)
        ln = _tag(ifd, _TAG_SR2_LENGTH)
        key = _tag(ifd, _TAG_SR2_KEY)
        if not (off and ln and key):
            continue
        off, ln, key = int(off[0]), int(ln[0]), int(key[0])
        if not (0 < off < len(buf) and 0 < ln <= len(buf) - off):
            return None
        from neural_imaging_tpu.data import sony
        patched = buf[:off] + sony.decrypt(buf[off:off + ln], key) \
            + buf[off + ln:]
        try:
            entries, _ = _read_ifd(patched, off, endian)
        except (struct.error, ValueError, IndexError):
            return None
        return entries
    return None


def _read_tiff_ep_raw(filename, default_cfa, vendor):
    buf, endian, first_ifd = _open_tiff(filename)
    ifds = _all_ifds(buf, endian, first_ifd)
    raw_ifd = None
    for ifd in ifds:
        if _tag(ifd, _TAG_PHOTOMETRIC, (0,))[0] == _PHOTOMETRIC_CFA:
            raw_ifd = ifd
            break
    if raw_ifd is None:
        raise DNGError(f'No CFA raw IFD found in this {vendor} file')

    compression = _tag(raw_ifd, _TAG_COMPRESSION, (_COMPRESSION_NONE,))[0]
    nikon_meta = None
    sony_priv = sony_curve = None
    if compression == _COMPRESSION_NIKON:
        nikon_meta = _nikon_compression_meta(buf, endian, ifds[0])
        if nikon_meta is None:
            raise UnsupportedRawError(
                'Nikon type-34713 NEF carries no MakerNote compression '
                'metadata (tag 0x0096); convert to DNG for native ingestion.')
    if compression == _COMPRESSION_SONY:
        from neural_imaging_tpu.data import sony
        sony_priv = _sony_private_ifd(buf, endian, ifds)
        posts = _tag(sony_priv, _TAG_SONY_CURVE) if sony_priv else None
        if posts is not None:
            try:
                sony_curve = sony.build_curve(posts)
            except sony.SonyFormatError:
                # garbage private block (e.g. wrong key) → same graceful path
                # as an absent chain: linear 11-bit codes + default levels
                sony_priv = sony_curve = None
    if compression not in (_COMPRESSION_NONE, _COMPRESSION_LJPEG,
                           _COMPRESSION_NIKON, _COMPRESSION_SONY):
        raise UnsupportedRawError(
            f'{vendor} compression={compression} is not natively supported.')

    width = _tag(raw_ifd, _TAG_WIDTH)[0]
    length = _tag(raw_ifd, _TAG_LENGTH)[0]
    bits = _tag(raw_ifd, _TAG_BITS, (16,))[0]
    # cRAW codes 11-bit values in 8 bits/pixel on average; real ARW2 files
    # declare BitsPerSample=8, so the depth check only applies to uncompressed
    if compression != _COMPRESSION_SONY and bits not in (12, 14, 16):
        raise DNGError(f'Unsupported {vendor} bit depth: {bits}')

    if compression == _COMPRESSION_LJPEG:
        # SOF3 strips or tiles — the newest Sony bodies' lossless-compressed
        # ARW; decoded by the same machinery as lossless-JPEG DNGs
        mosaic = _dng._read_lossless_jpeg_cfa(buf, raw_ifd, length, width)
    else:
        offsets = _tag(raw_ifd, _TAG_STRIP_OFFSETS)
        counts = _tag(raw_ifd, _TAG_STRIP_BYTE_COUNTS)
        if offsets is None or counts is None:
            raise DNGError(
                f'{vendor} raw IFD is missing strip offsets/byte counts')
        data = b''.join(buf[o:o + c] for o, c in zip(offsets, counts))

        n = width * length
        if nikon_meta is not None:
            from neural_imaging_tpu.data import nikon
            try:
                mosaic = nikon.decode(data, length, width, bits, nikon_meta,
                                      endian)
            except nikon.NikonFormatError as e:
                raise UnsupportedRawError(str(e)) from e
        elif compression == _COMPRESSION_SONY:
            from neural_imaging_tpu.data import sony
            try:
                mosaic = sony.decode(data, length, width, curve=sony_curve)
            except sony.SonyFormatError as e:
                raise UnsupportedRawError(str(e)) from e
        elif len(data) >= 2 * n:
            dtype = np.dtype(('<' if endian == '<' else '>') + 'u2')
            mosaic = np.frombuffer(data, dtype=dtype,
                                   count=n).reshape(length, width)
            mosaic = mosaic.astype(np.uint16)
        elif len(data) * 8 >= n * bits:
            mosaic = _unpack_bitpacked(data, n, bits).reshape(length, width)
        else:
            raise DNGError(
                f'{vendor} strip data ({len(data)} bytes) is too short for a '
                f'{length}x{width}x{bits}-bit mosaic')

    cfa = _cfa_from_ifd(raw_ifd, default=default_cfa)
    ifd0 = ifds[0]
    camera = _tag(ifd0, _TAG_MODEL, (vendor,))
    camera = camera if isinstance(camera, str) else camera[0]
    black_vals = _tag(raw_ifd, _TAG_BLACK_LEVEL, _tag(ifd0, _TAG_BLACK_LEVEL))
    if black_vals is None and vendor == 'ARW':
        # Sony stores per-channel black levels in tag 0x7310 — in the
        # encrypted SR2 sub-IFD on real bodies, in a plain IFD otherwise
        for ifd in ([sony_priv] if sony_priv else []) + ifds:
            black_vals = _tag(ifd, _TAG_SONY_BLACK)
            if black_vals is not None:
                break
    if black_vals is None:
        if compression == _COMPRESSION_SONY:
            black_vals = (_default_black(vendor, 14 if sony_curve is not None
                                         else 12, camera),)
        else:
            black_vals = (_default_black(vendor, bits, camera),)
    cam_mul = np.ones(4, np.float32)
    if sony_priv is not None:
        wb = _tag(sony_priv, _TAG_SONY_WB)
        if wb is not None and len(wb) >= 4 and min(wb[:4]) > 0:
            # file order (R, G1, G2, B) → framework order (R, G, B, G2)
            cam_mul = np.array([wb[0], wb[1], wb[3], wb[2]], np.float32)
    if compression == _COMPRESSION_SONY:
        # the bits tag is nominal (8) for cRAW: the coded domain is 11-bit,
        # mapped through the tone curve when present
        from neural_imaging_tpu.data import sony
        default_white = (sony.curve_white(sony_curve)
                         if sony_curve is not None else sony.CODE_MAX)
    else:
        default_white = (1 << bits) - 1
    white = _tag(raw_ifd, _TAG_WHITE_LEVEL,
                 _tag(ifd0, _TAG_WHITE_LEVEL, (default_white,)))[0]
    return _result(mosaic, cfa, np.mean(black_vals), white,
                   cam_mul, np.eye(3), camera)


def read_nef(filename):
    """Parse a Nikon NEF (uncompressed / bit-packed CFA SubIFD)."""
    return _read_tiff_ep_raw(filename, default_cfa='GBRG', vendor='NEF')


def read_arw(filename):
    """Parse a Sony ARW (uncompressed / bit-packed CFA SubIFD)."""
    return _read_tiff_ep_raw(filename, default_cfa='RGGB', vendor='ARW')


_READERS = {'.cr2': read_cr2, '.nef': read_nef, '.arw': read_arw}


def read_camera_raw(filename):
    """Dispatch on extension: .cr2 / .nef / .arw → parsed raw dict."""
    ext = os.path.splitext(filename)[1].lower()
    reader = _READERS.get(ext)
    if reader is None:
        raise DNGError(f'Unrecognized camera RAW extension: {ext}')
    return reader(filename)


# ----------------------------------------------------------------------------------
# Writers (spec-layout files for hermetic round-trip tests and dataset synthesis)
# ----------------------------------------------------------------------------------

def _entry_blob(entries, endian, base_offset):
    """Pack IFD entries; returns (ifd_bytes_without_next_ptr, overflow, size)."""
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_start = base_offset + ifd_size
    overflow = b''
    packed = []
    for tag, typ, values in sorted(entries, key=lambda e: e[0]):
        data, _ = _dng._pack_values(typ, values, endian)
        count = len(values) if typ != _ASCII else len(data)
        if len(data) <= 4:
            packed.append(struct.pack(endian + 'HHI', tag, typ, count)
                          + data + b'\0' * (4 - len(data)))
        else:
            off = overflow_start + len(overflow)
            packed.append(struct.pack(endian + 'HHII', tag, typ, count, off))
            overflow += data + (b'\0' if len(data) % 2 else b'')
    body = struct.pack(endian + 'H', len(entries)) + b''.join(packed)
    return body, overflow, ifd_size


def write_cr2(filename, mosaic_u16, cfa_pattern='RGGB', precision=14,
              cam_mul=(1.0, 1.0, 1.0, 1.0), n_slices=3, black=0, white=None,
              camera='Canon EOS (synthetic)'):
    """Write a CR2-layout file: CR marker, raw IFD pointer at byte 12, sliced
    SOF3 payload, Canon MakerNote ColorData WB. The reader must invert it.

    ``black``/``white`` are emitted as DNG-style level tags in the raw IFD —
    real CR2s carry levels in vendor blocks instead, and the reader falls back
    to (0, 2^precision-1) when the tags are absent."""
    mosaic = np.ascontiguousarray(np.asarray(mosaic_u16, dtype=np.uint16))
    h, w = mosaic.shape
    if mosaic.max(initial=0) >= (1 << precision):
        raise DNGError(f'mosaic exceeds the {precision}-bit CR2 precision')
    if w % 2:
        raise DNGError('CR2 writing needs an even mosaic width')
    # vertical slices: n_slices-1 equal slices (even widths) + remainder
    ws = max(2, (w // n_slices) & ~1)
    widths = [ws] * (n_slices - 1)
    w_last = w - sum(widths)
    if w_last <= 0:
        widths, w_last = [], w
    flat = np.concatenate([mosaic[:, x0:x0 + sw].reshape(-1)
                           for x0, sw in _slice_spans(widths + [w_last])])
    from neural_imaging_tpu.data import ljpeg
    payload = ljpeg.encode(flat.reshape(h, w // 2, 2), precision=precision)

    cam_mul = np.asarray(cam_mul, dtype=np.float64)
    g = cam_mul[1] or 1.0
    # ColorData block: 126 zero bytes then WB_AsShot (R, G1, G2, B) levels
    wb_levels = [int(round(1024 * cam_mul[0] / g)), 1024, 1024,
                 int(round(1024 * cam_mul[2] / g))]
    color_data = tuple([0] * 63 + wb_levels + [0] * 8)

    endian = '<'
    # Layout (offsets resolved manually — the CR2 header needs the raw IFD
    # offset at byte 12): [header 16] [canon IFD] [exif IFD] [ifd0] [raw] [payload]
    header_size = 16

    def sized(entries, base):
        body, overflow, size = _entry_blob(entries, endian, base)
        return body + struct.pack('<I', 0) + overflow

    canon_off = header_size
    canon_blob = sized([(_TAG_CANON_COLOR_DATA, _SHORT, color_data)], canon_off)
    exif_off = canon_off + len(canon_blob)
    # MakerNote as an UNDEFINED (type 7) blob whose payload is the Canon IFD
    exif_blob = (struct.pack('<H', 1)
                 + struct.pack('<HHII', _TAG_MAKERNOTE, 7, len(canon_blob), canon_off)
                 + struct.pack('<I', 0))
    ifd0_off = exif_off + len(exif_blob)
    ifd0_blob = sized([
        (_TAG_MAKE, _ASCII, 'Canon'),
        (_TAG_MODEL, _ASCII, camera),
        (_TAG_EXIF_IFD, _LONG, (exif_off,)),
    ], ifd0_off)
    raw_off = ifd0_off + len(ifd0_blob)
    if white is None:
        white = (1 << precision) - 1
    raw_entries = [
        (_TAG_COMPRESSION, _SHORT, (_COMPRESSION_OLD_JPEG,)),
        (_TAG_STRIP_OFFSETS, _LONG, (0,)),  # patched below
        (_TAG_STRIP_BYTE_COUNTS, _LONG, (len(payload),)),
        (_TAG_CR2_SLICE, _SHORT, (len(widths), widths[0] if widths else 0, w_last)),
        (_TAG_CFA_REPEAT_DIM, _SHORT, (2, 2)),
        (_TAG_CFA_PATTERN, _BYTE,
         tuple(_CFA_CODE_INV[c] for c in cfa_pattern.upper())),
        (_TAG_BLACK_LEVEL, _SHORT, (int(black),)),
        (_TAG_WHITE_LEVEL, _SHORT if white < 65536 else _LONG, (int(white),)),
    ]
    raw_blob = sized(raw_entries, raw_off)
    payload_off = raw_off + len(raw_blob)
    raw_entries[1] = (_TAG_STRIP_OFFSETS, _LONG, (payload_off,))
    raw_blob = sized(raw_entries, raw_off)

    with open(filename, 'wb') as fh:
        fh.write(b'II' + struct.pack('<HI', 42, ifd0_off))
        fh.write(b'CR' + bytes((2, 0)) + struct.pack('<I', raw_off))
        fh.write(canon_blob + exif_blob + ifd0_blob + raw_blob + payload)
    return filename


def _slice_spans(widths):
    x0 = 0
    for w in widths:
        yield x0, w
        x0 += w


def _write_tiff_ep(filename, mosaic, cfa_pattern, bits, make, camera, black, white,
                   black_style='dng', compression='none', nikon_split=0,
                   nikon_curve_samples=None, nikon_curve=None, tile_width=0):
    """``black_style``: 'dng' emits the DNG BlackLevel tag; 'sony' the vendor
    tag 0x7310 (what real ARWs carry); 'none' omits level metadata entirely so
    the reader's per-make default path is exercised.

    ``compression='nikon-lossless'`` writes a type-34713 entropy-coded payload
    plus the MakerNote tag 0x0096 metadata chain the reader must follow;
    ``'nikon-lossy'`` the lossy variant (``mosaic`` is then in the curve-index
    domain): ``nikon_split``/``nikon_curve_samples`` emit the type-2 layout
    (interpolated curve + tree split), ``nikon_curve`` the type-1 verbatim
    curve, neither an identity-linearization lossy stream.
    ``compression='ljpeg'`` writes SOF3 payloads — one strip, or full-height
    column-band tiles of ``tile_width`` (the newest Sony ARW layout)."""
    mosaic = np.ascontiguousarray(np.asarray(mosaic, dtype=np.uint16))
    h, w = mosaic.shape
    if mosaic.max(initial=0) >= (1 << bits):
        raise DNGError(f'mosaic exceeds the {bits}-bit container range')
    nikon_meta = None
    if compression == 'nikon-lossless':
        from neural_imaging_tpu.data import nikon
        pixel_data, nikon_meta = nikon.encode(mosaic, bits)
        compression_tag = _COMPRESSION_NIKON
    elif compression == 'nikon-lossy':
        from neural_imaging_tpu.data import nikon
        pixel_data, _, vpred = nikon.encode_lossy(mosaic, bits,
                                                  split=nikon_split)
        if nikon_split or nikon_curve_samples is not None:
            if nikon_curve_samples is None:  # identity curve on a 17-pt grid
                step = ((1 << bits) & 0x7FFF) // 16
                nikon_curve_samples = (np.arange(17) * step).astype(np.uint16)
            nikon_meta = nikon.build_meta_lossy(
                vpred, curve_samples=nikon_curve_samples, split=nikon_split)
        elif nikon_curve is not None:
            nikon_meta = nikon.build_meta_lossy(vpred, full_curve=nikon_curve)
        else:
            nikon_meta = nikon.build_meta_lossy(vpred)
        compression_tag = _COMPRESSION_NIKON
    elif compression == 'ljpeg':
        # SOF3, two column-interleaved components (as lossless DNG/CR2 code
        # them); one strip, or column bands of ``tile_width`` when tiled —
        # the layout of the newest Sony lossless-compressed ARWs
        from neural_imaging_tpu.data import ljpeg
        if w % 2:
            raise DNGError('ljpeg TIFF-EP writing needs an even mosaic width')

        def encode_band(band):
            comps = np.stack([band[:, 0::2], band[:, 1::2]], axis=-1)
            return ljpeg.encode(np.ascontiguousarray(comps), precision=bits)

        if tile_width:
            if tile_width % 2:
                raise DNGError('ljpeg tile width must be even')
            tiles = []
            for x0 in range(0, w, tile_width):
                band = mosaic[:, x0:x0 + tile_width]
                if band.shape[1] < tile_width:   # pad; the reader crops
                    band = np.pad(band,
                                  ((0, 0), (0, tile_width - band.shape[1])))
                tiles.append(encode_band(band))
            pixel_data = b''.join(tiles)
            tile_counts = [len(t) for t in tiles]
        else:
            pixel_data = encode_band(mosaic)
        compression_tag = _COMPRESSION_LJPEG
    elif compression == 'none':
        if bits == 16:
            pixel_data = mosaic.astype('<u2').tobytes()
        else:
            pixel_data = _pack_bitpacked(mosaic, bits)
        compression_tag = _COMPRESSION_NONE
    else:
        raise DNGError(f'Unknown TIFF-EP writer compression {compression}')
    if white is None:
        white = (1 << bits) - 1

    endian = '<'

    def sized(entries, base):
        body, overflow, _ = _entry_blob(entries, endian, base)
        return body + struct.pack('<I', 0) + overflow

    header_size = 8
    # optional MakerNote chain (bare Nikon IFD, as _nikon_compression_meta reads)
    mk_blob = exif_blob = b''
    mk_off = exif_off = 0
    if nikon_meta is not None:
        mk_off = header_size
        mk_blob = sized([(_TAG_NIKON_COMPRESSION_META, 7, tuple(nikon_meta))],
                        mk_off)
        exif_off = mk_off + len(mk_blob)
        exif_blob = (struct.pack('<H', 1)
                     + struct.pack('<HHII', _TAG_MAKERNOTE, 7, len(mk_blob), mk_off)
                     + struct.pack('<I', 0))

    tiled = compression == 'ljpeg' and tile_width
    if tiled:
        segment_entries = [
            (_dng._TAG_TILE_WIDTH, _LONG, (tile_width,)),
            (_dng._TAG_TILE_LENGTH, _LONG, (h,)),
            (_dng._TAG_TILE_OFFSETS, _LONG, (0,) * len(tile_counts)),  # patched
            (_dng._TAG_TILE_BYTE_COUNTS, _LONG, tuple(tile_counts)),
        ]
    else:
        segment_entries = [
            (_TAG_STRIP_OFFSETS, _LONG, (0,)),  # patched
            (_TAG_ROWS_PER_STRIP, _LONG, (h,)),
            (_TAG_STRIP_BYTE_COUNTS, _LONG, (len(pixel_data),)),
        ]
    raw_entries = [
        (_TAG_NEW_SUBFILE_TYPE, _LONG, (0,)),
        (_TAG_WIDTH, _LONG, (w,)),
        (_TAG_LENGTH, _LONG, (h,)),
        (_TAG_BITS, _SHORT, (bits,)),
        (_TAG_COMPRESSION, _SHORT, (compression_tag,)),
        (_TAG_PHOTOMETRIC, _SHORT, (_PHOTOMETRIC_CFA,)),
        *segment_entries,
        (_TAG_SAMPLES_PER_PIXEL, _SHORT, (1,)),
        (_TAG_PLANAR_CONFIG, _SHORT, (1,)),
        (_TAG_CFA_REPEAT_DIM, _SHORT, (2, 2)),
        (_TAG_CFA_PATTERN, _BYTE,
         tuple(_CFA_CODE_INV[c] for c in cfa_pattern.upper())),
        (_TAG_WHITE_LEVEL, _SHORT if white < 65536 else _LONG, (int(white),)),
    ]
    if black_style == 'dng':
        raw_entries.append((_TAG_BLACK_LEVEL, _SHORT, (int(black),)))
    elif black_style == 'sony':
        raw_entries.append((_TAG_SONY_BLACK, _SHORT, (int(black),) * 4))
    elif black_style != 'none':
        raise DNGError(f'Unknown black_style {black_style}')
    ifd0_entries = [
        (_TAG_NEW_SUBFILE_TYPE, _LONG, (1,)),
        (_TAG_MAKE, _ASCII, make),
        (_TAG_MODEL, _ASCII, camera),
        (_TAG_SUB_IFDS, _LONG, (0,)),  # patched
    ]
    if nikon_meta is not None:
        ifd0_entries.append((_TAG_EXIF_IFD, _LONG, (exif_off,)))
    ifd0_off = header_size + len(mk_blob) + len(exif_blob)
    ifd0_blob = sized(ifd0_entries, ifd0_off)
    raw_off = ifd0_off + len(ifd0_blob)
    ifd0_entries[3] = (_TAG_SUB_IFDS, _LONG, (raw_off,))
    ifd0_blob = sized(ifd0_entries, ifd0_off)
    raw_blob = sized(raw_entries, raw_off)
    payload_off = raw_off + len(raw_blob)
    if tiled:
        offs, acc = [], payload_off
        for c in tile_counts:
            offs.append(acc)
            acc += c
        patch = (_dng._TAG_TILE_OFFSETS, _LONG, tuple(offs))
    else:
        patch = (_TAG_STRIP_OFFSETS, _LONG, (payload_off,))
    idx = next(i for i, e in enumerate(raw_entries) if e[0] == patch[0])
    raw_entries[idx] = patch
    raw_blob = sized(raw_entries, raw_off)

    with open(filename, 'wb') as fh:
        fh.write(b'II' + struct.pack('<HI', 42, ifd0_off))
        fh.write(mk_blob + exif_blob + ifd0_blob + raw_blob + pixel_data)
    return filename


def write_nef(filename, mosaic_u16, cfa_pattern='GBRG', bits=14, black=0,
              white=None, camera='NIKON (synthetic)', black_style='dng',
              compression='none', **nikon_kw):
    """Write a NEF-layout file: uncompressed (bit-packed for bits<16), or
    ``compression='nikon-lossless'`` / ``'nikon-lossy'`` for type-34713
    entropy-coded payloads (lossy takes ``nikon_split`` /
    ``nikon_curve_samples`` / ``nikon_curve`` — see :func:`_write_tiff_ep`)."""
    return _write_tiff_ep(filename, mosaic_u16, cfa_pattern, bits,
                          'NIKON CORPORATION', camera, black, white,
                          black_style=black_style, compression=compression,
                          **nikon_kw)


def write_arw(filename, mosaic_u16, cfa_pattern='RGGB', bits=16, black=0,
              white=None, camera='SONY (synthetic)', black_style='dng',
              compression='none', sr2_meta=None, tile_width=0):
    """Write an ARW-layout file: uncompressed, ``compression='sony-craw'``
    for the ARW2 block coding (with ``sr2_meta`` for the real-style encrypted
    metadata chain — see :func:`write_arw_craw`), or ``'ljpeg'`` for the
    SOF3-coded layout of the newest bodies (full-height column-band tiles
    when ``tile_width`` is set, one strip otherwise)."""
    if compression == 'sony-craw':
        return write_arw_craw(filename, mosaic_u16, cfa_pattern=cfa_pattern,
                              camera=camera, sr2_meta=sr2_meta)
    if compression not in ('none', 'ljpeg'):
        raise DNGError(f'Unknown ARW writer compression {compression}')
    return _write_tiff_ep(filename, mosaic_u16, cfa_pattern, bits,
                          'SONY', camera, black, white, black_style=black_style,
                          compression=compression, tile_width=tile_width)


def write_arw_craw(filename, mosaic_u16, cfa_pattern='RGGB',
                   camera='SONY (synthetic)', sr2_meta=None):
    """Write a Compression=32767 (cRAW/ARW2) ARW the reader must invert.

    Mirrors the real-file topology end to end: IFD0 → SubIFD raw image with
    the block-coded payload (BitsPerSample=8, as real bodies declare), and —
    when ``sr2_meta`` is given — IFD0 tag 0xC634 → plain SR2Private IFD
    (0x7200/0x7201/0x7221) → XOR-encrypted SR2 sub-IFD holding the tone curve
    (0x7010), per-channel black (0x7310) and as-shot WB (0x7313).

    ``sr2_meta`` keys: ``curve_posts`` (4 raw SHORTs, i.e. breakpoints << 2),
    ``black`` (scalar or 4-tuple), ``wb`` (R, G1, G2, B levels), ``key``
    (uint32). Without ``sr2_meta`` the payload holds plain 11-bit codes and no
    private chain is emitted. Coding is lossy; see ``data/sony.py``.
    """
    from neural_imaging_tpu.data import sony
    mosaic = np.ascontiguousarray(np.asarray(mosaic_u16, dtype=np.uint16))
    h, w = mosaic.shape
    curve = None
    if sr2_meta and sr2_meta.get('curve_posts') is not None:
        curve = sony.build_curve(sr2_meta['curve_posts'])
    pixel_data = sony.encode(mosaic, curve=curve)

    endian = '<'

    def sized(entries, base):
        body, overflow, _ = _entry_blob(entries, endian, base)
        return body + struct.pack('<I', 0) + overflow

    header_size = 8
    ifd0_entries = [
        (_TAG_NEW_SUBFILE_TYPE, _LONG, (1,)),
        (_TAG_MAKE, _ASCII, 'SONY'),
        (_TAG_MODEL, _ASCII, camera),
        (_TAG_SUB_IFDS, _LONG, (0,)),       # patched
    ]
    if sr2_meta:
        ifd0_entries.append((_TAG_DNG_PRIVATE, _LONG, (0,)))  # patched
    raw_entries = [
        (_TAG_NEW_SUBFILE_TYPE, _LONG, (0,)),
        (_TAG_WIDTH, _LONG, (w,)),
        (_TAG_LENGTH, _LONG, (h,)),
        (_TAG_BITS, _SHORT, (8,)),          # nominal, as real ARW2 files
        (_TAG_COMPRESSION, _SHORT, (_COMPRESSION_SONY,)),
        (_TAG_PHOTOMETRIC, _SHORT, (_PHOTOMETRIC_CFA,)),
        (_TAG_STRIP_OFFSETS, _LONG, (0,)),  # patched
        (_TAG_SAMPLES_PER_PIXEL, _SHORT, (1,)),
        (_TAG_ROWS_PER_STRIP, _LONG, (h,)),
        (_TAG_STRIP_BYTE_COUNTS, _LONG, (len(pixel_data),)),
        (_TAG_PLANAR_CONFIG, _SHORT, (1,)),
        (_TAG_CFA_REPEAT_DIM, _SHORT, (2, 2)),
        (_TAG_CFA_PATTERN, _BYTE,
         tuple(_CFA_CODE_INV[c] for c in cfa_pattern.upper())),
    ]

    # two passes: sizes are value-independent, so lay out, then patch offsets
    for _ in range(2):
        ifd0_blob = sized(ifd0_entries, header_size)
        raw_off = header_size + len(ifd0_blob)
        raw_blob = sized(raw_entries, raw_off)
        payload_off = raw_off + len(raw_blob)
        sr2_sub_off = payload_off + len(pixel_data)
        sr2_blob = priv_blob = b''
        if sr2_meta:
            black = sr2_meta.get('black', 512)
            black4 = tuple(int(b) for b in (black if hasattr(black, '__len__')
                                            else (black,) * 4))
            sub_entries = [(_TAG_SONY_BLACK, _SHORT, black4)]
            if sr2_meta.get('curve_posts') is not None:
                sub_entries.append((_TAG_SONY_CURVE, _SHORT,
                                    tuple(int(p) for p in sr2_meta['curve_posts'])))
            if sr2_meta.get('wb') is not None:
                sub_entries.append((_TAG_SONY_WB, _SHORT,
                                    tuple(int(v) for v in sr2_meta['wb'])))
            # out-of-line data lands right after the sub-IFD: inside the
            # encrypted span, with absolute offsets — as in real files
            plain = sized(sub_entries, sr2_sub_off)
            plain += b'\0' * (-len(plain) % 4)      # word-align for the cipher
            key = int(sr2_meta.get('key', 0x1A2B3C4D)) & 0xFFFFFFFF
            sr2_blob = sony.decrypt(plain, key)     # symmetric XOR cipher
            priv_off = sr2_sub_off + len(sr2_blob)
            priv_blob = sized([
                (_TAG_SR2_OFFSET, _LONG, (sr2_sub_off,)),
                (_TAG_SR2_LENGTH, _LONG, (len(sr2_blob),)),
                (_TAG_SR2_KEY, _LONG, (key,)),
            ], priv_off)
            ifd0_entries[-1] = (_TAG_DNG_PRIVATE, _LONG, (priv_off,))
        ifd0_entries[3] = (_TAG_SUB_IFDS, _LONG, (raw_off,))
        raw_entries[6] = (_TAG_STRIP_OFFSETS, _LONG, (payload_off,))

    with open(filename, 'wb') as fh:
        fh.write(b'II' + struct.pack('<HI', 42, header_size))
        fh.write(ifd0_blob + raw_blob + pixel_data + sr2_blob + priv_blob)
    return filename

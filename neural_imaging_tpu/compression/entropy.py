"""
Entropy-coding backend: ctypes binding to the native C++ rANS coder
(native/ans/ans.cpp), with a pure-numpy fallback implementing the identical
stream format.

API parity with the reference's pyfse usage (compression/codec.py:11,134-140):
``compress(bytes) -> bytes`` and ``decompress(bytes, n) -> bytes`` with typed
exceptions for the all-identical-symbols and not-compressible cases that the
bitstream codec handles via RLE / raw fallbacks.
"""
import ctypes
import os
import subprocess

import numpy as np

from neural_imaging_tpu.utils.utils import logger

PROB_BITS = 12
PROB_SCALE = 1 << PROB_BITS
RANS_L = 1 << 23


class ANSException(Exception):
    """Base class for entropy-coding errors (pyfse.FSEException analog)."""


class ANSSymbolRepetitionError(ANSException):
    """All input bytes are identical — use RLE instead."""


class ANSNotCompressibleError(ANSException):
    """The stream does not compress — store raw bytes instead."""


class ANSCorruptStreamError(ANSException):
    """Malformed stream encountered during decoding."""


# Aliases keeping the reference exception vocabulary available
FSEException = ANSException
FSESymbolRepetitionError = ANSSymbolRepetitionError
FSENotCompressibleError = ANSNotCompressibleError

_ERR = {-1: ANSNotCompressibleError, -2: ANSSymbolRepetitionError,
        -3: MemoryError, -4: ANSCorruptStreamError, -5: ValueError}

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'native', 'ans')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libans.so')

_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH):
        try:
            subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                           stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        except Exception:  # no toolchain — fall back to numpy
            logger.warning('native ANS build failed; using the numpy fallback coder')
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ans_compress.restype = ctypes.c_int
        lib.ans_compress.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.ans_decompress.restype = ctypes.c_int
        lib.ans_decompress.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.ans_compress_bound.restype = ctypes.c_int
        lib.ans_compress_bound.argtypes = [ctypes.c_int]
        _lib = lib
    except OSError:
        logger.warning('could not load %s; using the numpy fallback coder', _LIB_PATH)
        _lib = None
    return _lib


def backend():
    return 'native' if _load_native() is not None else 'numpy'


# A coded stream is never shorter than its header: 4 (raw length) + 1 (symbol
# count) + 3 per present symbol >= 8 bytes. The bitstream layer relies on this to
# disambiguate its 3-byte RLE fallback records (codec.py).
MIN_STREAM_BYTES = 8


def compress(data):
    """Entropy-code a byte string. Raises ANSSymbolRepetitionError /
    ANSNotCompressibleError for degenerate streams (caller falls back)."""
    data = bytes(data)
    if len(data) == 0:
        raise ValueError('Cannot compress an empty stream')

    lib = _load_native()
    if lib is not None:
        cap = lib.ans_compress_bound(len(data))
        dst = (ctypes.c_uint8 * cap)()
        rc = lib.ans_compress(data, len(data), dst, cap)
        if rc < 0:
            raise _ERR[rc]('ans_compress failed')
        return bytes(bytearray(dst[:rc]))
    return _compress_py(data)


def decompress(data, n=None):
    """Decode an entropy-coded byte string; ``n`` (expected size) is an upper
    bound hint for buffer allocation (kept for pyfse API parity)."""
    data = bytes(data)
    lib = _load_native()
    if lib is not None:
        if len(data) >= 4:
            n_raw = int.from_bytes(data[:4], 'little')
        else:
            raise ANSCorruptStreamError('stream too short')
        cap = max(n_raw, n or 0)
        dst = (ctypes.c_uint8 * max(cap, 1))()
        rc = lib.ans_decompress(data, len(data), dst, cap)
        if rc < 0:
            raise _ERR[rc]('ans_decompress failed')
        return bytes(bytearray(dst[:rc]))
    return _decompress_py(data)


# ------------------------------------------------------------------------------------
# Pure-numpy fallback (bit-identical stream format to the C++ implementation)
# ------------------------------------------------------------------------------------

def _normalize_freqs(counts, n):
    freq = np.zeros(256, dtype=np.uint32)
    present = np.nonzero(counts)[0]
    f = (counts[present].astype(np.uint64) * PROB_SCALE) // n
    f = np.maximum(f, 1).astype(np.int64)
    drift = PROB_SCALE - int(f.sum())
    best = int(np.argmax(f))
    f[best] += drift
    if f[best] < 1:
        raise ANSCorruptStreamError('normalization failed')
    freq[present] = f
    return freq


def _compress_py(data):
    src = np.frombuffer(data, dtype=np.uint8)
    n = len(src)
    counts = np.bincount(src, minlength=256)
    present = np.nonzero(counts)[0]
    if len(present) == 1:
        raise ANSSymbolRepetitionError('all symbols identical')
    freq = _normalize_freqs(counts, n)
    cum = np.zeros(257, dtype=np.uint32)
    cum[1:] = np.cumsum(freq)

    header = bytearray()
    header += int(n).to_bytes(4, 'little')
    header.append(len(present) - 1)
    for s in present:
        header.append(int(s))
        header += int(freq[s]).to_bytes(2, 'little')

    payload = bytearray()
    x = RANS_L
    f_arr, c_arr = freq, cum
    for s in src[::-1]:
        f = int(f_arr[s])
        x_max = ((RANS_L >> PROB_BITS) << 8) * f
        while x >= x_max:
            payload.append(x & 0xFF)
            x >>= 8
        x = ((x // f) << PROB_BITS) + (x % f) + int(c_arr[s])
    for b in range(3, -1, -1):
        payload.append((x >> (8 * b)) & 0xFF)

    out = bytes(header) + bytes(payload[::-1])
    if len(out) >= n:
        raise ANSNotCompressibleError('stream does not compress')
    return out


def _decompress_py(data):
    if len(data) < 10:
        raise ANSCorruptStreamError('stream too short')
    n_raw = int.from_bytes(data[0:4], 'little')
    n_present = data[4] + 1
    pos = 5
    freq = np.zeros(256, dtype=np.uint32)
    for _ in range(n_present):
        s = data[pos]
        freq[s] = int.from_bytes(data[pos + 1:pos + 3], 'little')
        pos += 3
    cum = np.zeros(257, dtype=np.uint32)
    cum[1:] = np.cumsum(freq)
    if cum[256] != PROB_SCALE:
        raise ANSCorruptStreamError('bad frequency table')
    slot2sym = np.repeat(np.arange(256, dtype=np.uint8), freq)

    x = int.from_bytes(data[pos:pos + 4], 'little')
    pos += 4
    out = bytearray(n_raw)
    for i in range(n_raw):
        low = x & (PROB_SCALE - 1)
        s = int(slot2sym[low])
        out[i] = s
        x = int(freq[s]) * (x >> PROB_BITS) + low - int(cum[s])
        while x < RANS_L:
            if pos >= len(data):
                raise ANSCorruptStreamError('truncated stream')
            x = (x << 8) | data[pos]
            pos += 1
    return bytes(out)

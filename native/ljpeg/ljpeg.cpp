// Lossless JPEG (ITU-T T.81 process 14, SOF3) scan codec — the hot entropy
// loops behind neural_imaging_tpu/data/ljpeg.py. The Python layer parses/emits
// markers and tables; this library runs the per-sample Huffman + prediction
// loops, which are the difference between ~1 s and ~1 min on a 24 MP camera
// file. Mirrors the Python implementation exactly (it is the fallback and the
// differential-test oracle).
//
// Build: make -C native/ljpeg   (produces libljpeg_scan.so, loaded via ctypes)
#include <cstdint>
#include <cstring>

namespace {

struct BitReader {
    const uint8_t* data;
    int len;
    int pos = 0;
    uint64_t acc = 0;
    int nbits = 0;
    bool bad = false;

    void fill() {
        while (nbits <= 48) {
            uint8_t byte = 0;
            if (pos < len) {
                byte = data[pos];
                if (byte == 0xFF) {
                    uint8_t nxt = (pos + 1 < len) ? data[pos + 1] : 0xD9;
                    if (nxt == 0x00) {
                        pos += 2;           // stuffed byte
                    } else {
                        byte = 0;           // marker: pad with zeros, don't consume
                    }
                } else {
                    pos += 1;
                }
            }
            acc = (acc << 8) | byte;
            nbits += 8;
        }
    }
    inline uint32_t peek16() {
        if (nbits < 16) fill();
        return (uint32_t)((acc >> (nbits - 16)) & 0xFFFF);
    }
    inline void skip(int n) { nbits -= n; }
    inline uint32_t read(int n) {
        if (n == 0) return 0;
        if (nbits < n) fill();
        nbits -= n;
        return (uint32_t)((acc >> nbits) & ((1u << n) - 1));
    }
    // skip to just past the next restart marker, clear the buffer
    void resync() {
        pos -= nbits / 8;   // return unconsumed whole bytes
        if (pos < 0) pos = 0;
        acc = 0;
        nbits = 0;
        while (pos + 1 < len) {
            if (data[pos] == 0xFF && data[pos + 1] >= 0xD0 && data[pos + 1] <= 0xD7) {
                pos += 2;
                return;
            }
            pos++;
        }
        bad = true;
    }
};

inline int32_t extend(uint32_t bits, int ssss) {
    if (ssss == 0) return 0;
    if (bits < (1u << (ssss - 1))) return (int32_t)bits - (1 << ssss) + 1;
    return (int32_t)bits;
}

inline int32_t predict(int32_t ra, int32_t rb, int32_t rc, int predictor) {
    switch (predictor) {
        case 1: return ra;
        case 2: return rb;
        case 3: return rc;
        case 4: return ra + rb - rc;
        case 5: return ra + ((rb - rc) >> 1);
        case 6: return rb + ((ra - rc) >> 1);
        case 7: return (ra + rb) >> 1;
        default: return 0;
    }
}

struct BitWriter {
    uint8_t* out;
    int cap;
    int n = 0;
    uint64_t acc = 0;
    int nbits = 0;
    bool overflow = false;

    inline void put_byte(uint8_t b) {
        if (n >= cap) { overflow = true; return; }
        out[n++] = b;
        if (b == 0xFF) {
            if (n >= cap) { overflow = true; return; }
            out[n++] = 0x00;
        }
    }
    inline void write(uint32_t value, int bits) {
        acc = (acc << bits) | (value & ((bits >= 32) ? 0xFFFFFFFFu : ((1u << bits) - 1)));
        nbits += bits;
        while (nbits >= 8) {
            nbits -= 8;
            put_byte((uint8_t)((acc >> nbits) & 0xFF));
        }
    }
    void flush() {
        if (nbits) {
            int pad = 8 - nbits;
            write((1u << pad) - 1, pad);  // pad with 1s
        }
    }
};

}  // namespace

extern "C" {

// Decode an interleaved SOF3 scan.
//   data/len:       entropy-coded bytes (starting right after the SOS header)
//   bits16/huffval: per-table DHT arrays; table t occupies bits16[16*t..] and
//                   huffval[17*t..] (lengths in table_sizes[t])
//   comp_table:     table index per scan component
// Returns 0, or <0 on malformed data.
int ljpeg_decode_scan(const uint8_t* data, int len,
                      const uint8_t* bits16, const uint8_t* huffval,
                      const int* table_sizes, int n_tables,
                      const int* comp_table, int ncomp,
                      int lines, int width, int predictor, int point_transform,
                      int precision, int restart_interval,
                      int32_t* out) {
    if (ncomp <= 0 || ncomp > 4 || n_tables <= 0 || n_tables > 4) return -5;

    // 16-bit lookahead LUTs per table
    static thread_local int16_t lut_val[4][1 << 16];
    static thread_local int8_t lut_len[4][1 << 16];
    for (int t = 0; t < n_tables; t++) {
        memset(lut_len[t], 0, sizeof(lut_len[t]));
        uint32_t code = 0;
        int k = 0;
        for (int length = 1; length <= 16; length++) {
            for (int i = 0; i < bits16[16 * t + length - 1]; i++) {
                if (k >= table_sizes[t]) return -4;
                uint32_t prefix = code << (16 - length);
                uint32_t span = 1u << (16 - length);
                for (uint32_t s = 0; s < span; s++) {
                    lut_val[t][prefix + s] = huffval[17 * t + k];
                    lut_len[t][prefix + s] = (int8_t)length;
                }
                code++;
                k++;
            }
            code <<= 1;
        }
    }

    BitReader br{data, len};
    const int32_t default_pred = 1 << (precision - point_transform - 1);
    long mcu = 0;
    const long total = (long)lines * width;

    for (int y = 0; y < lines; y++) {
        for (int x = 0; x < width; x++) {
            for (int c = 0; c < ncomp; c++) {
                const int t = comp_table[c];
                uint32_t look = br.peek16();
                int ssss = lut_val[t][look];
                int clen = lut_len[t][look];
                if (clen == 0) return -4;
                br.skip(clen);
                int32_t diff;
                if (ssss == 16) diff = 32768;
                else diff = extend(br.read(ssss), ssss);

                int32_t pred;
                const long idx = ((long)y * width + x) * ncomp + c;
                if (y == 0 && x == 0) pred = default_pred;
                else if (x == 0) pred = out[idx - (long)width * ncomp];
                else if (y == 0) pred = out[idx - ncomp];
                else {
                    int32_t ra = out[idx - ncomp];
                    int32_t rb = out[idx - (long)width * ncomp];
                    int32_t rc = out[idx - (long)width * ncomp - ncomp];
                    pred = predict(ra, rb, rc, predictor);
                }
                out[idx] = (pred + diff) & 0xFFFF;
            }
            mcu++;
            if (restart_interval && (mcu % restart_interval) == 0 &&
                mcu != total) {
                br.resync();
                if (br.bad) return -4;
            }
        }
    }
    if (point_transform) {
        for (long i = 0; i < total * ncomp; i++) out[i] <<= point_transform;
    }
    return 0;
}

// Encode pre-computed scan-order differences with a canonical code table.
//   diffs:       n values in scan order, already wrapped to [-32767, 32768]
//   codes/lens:  canonical code per SSSS symbol 0..16
// Returns bytes written, or -3 if the output buffer is too small.
int ljpeg_encode_scan(const int32_t* diffs, long n,
                      const uint32_t* codes, const uint8_t* lens,
                      uint8_t* out, int cap) {
    BitWriter bw{out, cap};
    for (long i = 0; i < n; i++) {
        int32_t d = diffs[i];
        int ssss;
        if (d == 32768) {
            ssss = 16;
        } else {
            uint32_t mag = (uint32_t)(d < 0 ? -d : d);
            ssss = 0;
            while (mag) { ssss++; mag >>= 1; }
        }
        bw.write(codes[ssss], lens[ssss]);
        if (ssss && ssss != 16) {
            uint32_t bits = (d >= 0) ? (uint32_t)d
                                     : (uint32_t)(d + (1 << ssss) - 1);
            bw.write(bits, ssss);
        }
        if (bw.overflow) return -3;
    }
    bw.flush();
    if (bw.overflow) return -3;
    return bw.n;
}

// Decode a Nikon type-34713 compressed NEF bitstream (the entropy coding
// behind Compression=34713; publicly documented via dcraw's nikon_load_raw).
// Differences from SOF3: raw MSB-first bitstream (no 0xFF stuffing, no
// markers); fixed Huffman trees whose symbols pack (shl << 4 | len); the
// first two columns of each row predict vertically from the same-parity row
// two above (vpred), all other columns predict from the same-CFA-column
// sample two to the left (hpred); decoded values pass through a
// linearization curve (identity for the lossless variant).
//   bits16/huffval/table_size:     tree for rows [0, split)
//   bits16_b/huffval_b/table_b:    tree for rows [split, lines) (lossy-split
//                                  files; pass split=0 to use tree A throughout)
//   vpred_init: 4 shorts [row&1][col]
//   curve/curve_len: linearization LUT (applied as curve[clamp(v)])
// Returns 0, or <0 on malformed data.
int nikon_decode_scan(const uint8_t* data, int len,
                      const uint8_t* bits16, const uint8_t* huffval, int table_size,
                      const uint8_t* bits16_b, const uint8_t* huffval_b, int table_b,
                      int lines, int width, int split,
                      const int32_t* vpred_init,
                      const uint16_t* curve, int curve_len,
                      uint16_t* out) {
    static thread_local int16_t lut_val[1 << 16];
    static thread_local int8_t lut_len[1 << 16];

    auto build = [&](const uint8_t* bits, const uint8_t* vals, int n) -> int {
        memset(lut_len, 0, sizeof(lut_len));
        uint32_t code = 0;
        int k = 0;
        for (int length = 1; length <= 16; length++) {
            for (int i = 0; i < bits[length - 1]; i++) {
                if (k >= n) return -4;
                uint32_t prefix = code << (16 - length);
                uint32_t span = 1u << (16 - length);
                for (uint32_t s = 0; s < span; s++) {
                    lut_val[prefix + s] = vals[k];
                    lut_len[prefix + s] = (int8_t)length;
                }
                code++;
                k++;
            }
            code <<= 1;
        }
        return 0;
    };
    if (build(bits16, huffval, table_size) < 0) return -4;

    // raw bitstream reader: no stuffing, zero-pad past the end
    long pos = 0;
    uint64_t acc = 0;
    int nbits = 0;
    auto fill = [&]() {
        while (nbits <= 48) {
            uint8_t byte = (pos < len) ? data[pos++] : 0;
            acc = (acc << 8) | byte;
            nbits += 8;
        }
    };
    auto peek16 = [&]() -> uint32_t {
        if (nbits < 16) fill();
        return (uint32_t)((acc >> (nbits - 16)) & 0xFFFF);
    };
    auto getbits = [&](int n) -> uint32_t {
        if (n == 0) return 0;
        if (nbits < n) fill();
        nbits -= n;
        return (uint32_t)((acc >> nbits) & ((1u << n) - 1));
    };

    int32_t vpred[2][2] = {{vpred_init[0], vpred_init[1]},
                           {vpred_init[2], vpred_init[3]}};
    for (int row = 0; row < lines; row++) {
        if (split && row == split) {
            if (build(bits16_b, huffval_b, table_b) < 0) return -4;
        }
        int32_t hpred[2] = {0, 0};
        for (int col = 0; col < width; col++) {
            uint32_t look = peek16();
            int clen = lut_len[look];
            if (clen == 0) return -4;
            int sym = lut_val[look];
            nbits -= clen;
            int slen = sym & 15;
            int shl = sym >> 4;
            int32_t diff = 0;
            if (slen) {
                diff = (int32_t)((((getbits(slen - shl) << 1) + 1) << shl) >> 1);
                if ((diff & (1 << (slen - 1))) == 0)
                    diff -= (1 << slen) - (shl ? 0 : 1);
            }
            if (col < 2) hpred[col] = (vpred[row & 1][col] += diff);
            else hpred[col & 1] += diff;
            int32_t v = hpred[col & 1];
            if (v < 0) v = 0;
            if (v >= curve_len) v = curve_len - 1;
            out[(long)row * width + col] = curve[v];
        }
    }
    return 0;
}

}  // extern "C"

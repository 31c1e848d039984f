// Native twin of the zarray delta-varint codec (icebin_tpu/io/zarray.py).
//
// The reference stores global elevation-class matrices through C++
// (ibmisc zarray / linear::Weighted_Compressed [U]); here the host-side
// codec hot loop (delta + zigzag + LEB128 varint, both directions) is a
// single-pass C++ routine -- byte-identical streams to the numpy
// implementation, ~50x faster at global_ec scale (1e8 nnz).  zlib framing
// stays in Python (the zlib module is already C).
#include <cstdint>

extern "C" {

// rows must be sorted ascending (row-major entry order).  out_r/out_c
// must hold >= 10*n bytes each.  Writes stream lengths to len_r/len_c.
void ib_zarray_encode(const int64_t* rows, const int64_t* cols, int64_t n,
                      uint8_t* out_r, int64_t* len_r,
                      uint8_t* out_c, int64_t* len_c) {
    int64_t pr = 0, pc = 0, nr = 0, nc = 0;
    for (int64_t i = 0; i < n; ++i) {
        uint64_t dr = (uint64_t)(rows[i] - pr);
        pr = rows[i];
        do {
            uint8_t b = dr & 0x7F;
            dr >>= 7;
            out_r[nr++] = b | (dr ? 0x80 : 0);
        } while (dr);
        int64_t d = cols[i] - pc;
        pc = cols[i];
        uint64_t dc = ((uint64_t)d << 1) ^ (uint64_t)(d >> 63);  // zigzag
        do {
            uint8_t b = dc & 0x7F;
            dc >>= 7;
            out_c[nc++] = b | (dc ? 0x80 : 0);
        } while (dc);
    }
    *len_r = nr;
    *len_c = nc;
}

// Inverse: returns 0 on success, nonzero on corrupt/overlong streams.
int ib_zarray_decode(const uint8_t* br, int64_t nbr,
                     const uint8_t* bc, int64_t nbc,
                     int64_t n, int64_t* rows, int64_t* cols) {
    int64_t ir = 0, ic = 0, pr = 0, pc = 0;
    for (int64_t i = 0; i < n; ++i) {
        uint64_t v = 0;
        int sh = 0;
        uint8_t b;
        do {
            if (ir >= nbr || sh > 63) return 1;
            b = br[ir++];
            v |= (uint64_t)(b & 0x7F) << sh;
            sh += 7;
        } while (b & 0x80);
        pr += (int64_t)v;
        rows[i] = pr;
        v = 0;
        sh = 0;
        do {
            if (ic >= nbc || sh > 63) return 2;
            b = bc[ic++];
            v |= (uint64_t)(b & 0x7F) << sh;
            sh += 7;
        } while (b & 0x80);
        pc += (int64_t)((v >> 1) ^ (~(v & 1) + 1));               // unzigzag
        cols[i] = pc;
    }
    if (ir != nbr || ic != nbc) return 3;   // trailing bytes
    return 0;
}

}  // extern "C"

// 2-bit read packing for device upload (hot host path).
//
// Mirrors dna.pack_reads_host: base j of a row lands at bits 2*(j%16) of
// uint32 word j/16; ambiguity bit j at bit j%32 of word j/32.  The numpy
// log-ladder version costs ~30-40ms per 65K x 128 chunk; this loop
// auto-vectorizes under -O3 and runs in a few ms.

#include <cstdint>
#include <cstring>

extern "C" long pack_reads_2bit(
    const uint8_t* codes,   // [R, L]
    int64_t R, int64_t L,
    uint32_t* words,        // [R, W] out, W = ceil(L/16)
    int64_t W,
    const uint8_t* ambig,   // [R, L] or null
    uint32_t* amask,        // [R, A] out or null, A = ceil(L/32)
    int64_t A
) {
    for (int64_t r = 0; r < R; ++r) {
        const uint8_t* row = codes + r * L;
        uint32_t* wout = words + r * W;
        std::memset(wout, 0, W * sizeof(uint32_t));
        int64_t full = L & ~int64_t(15);
        for (int64_t j = 0; j < full; j += 16) {
            uint32_t acc = 0;
            for (int k = 0; k < 16; ++k)
                acc |= uint32_t(row[j + k] & 3) << (2 * k);
            wout[j >> 4] = acc;
        }
        for (int64_t j = full; j < L; ++j)
            wout[j >> 4] |= uint32_t(row[j] & 3) << ((j & 15) << 1);
        if (ambig) {
            const uint8_t* arow = ambig + r * L;
            uint32_t* aout = amask + r * A;
            std::memset(aout, 0, A * sizeof(uint32_t));
            for (int64_t j = 0; j < L; ++j)
                aout[j >> 5] |= uint32_t(arow[j] != 0) << (j & 31);
        }
    }
    return 0;
}

// Batched banded DP for indel event proposal — exact port of the
// reference core_dynamic_align (/root/reference/src/core-indel.c:4573-4787:
// match +2, mismatch 0, gap open -1, extend 0, band +-max_indel, the
// reference's tie ladder and backtrack).  One call aligns every window of
// a chunk; the python fallback (align/indelevent.py core_dynamic_align)
// is the semantic oracle this must match cell-for-cell.
#include <cstdint>
#include <cstring>
#include <vector>

namespace {
constexpr int8_t M_MATCH = 0, M_DEL = 1, M_INS = 2, M_MISM = 3;
constexpr int32_t NEG = -9999;
}

extern "C" long dp_align_batch(
    const uint8_t* reads,    // [W, Mmax]
    const int32_t* mlens,    // [W]
    const uint8_t* genomes,  // [W, Rmax]
    const int32_t* glens,    // [W]
    const int32_t* offsets,  // [W]
    int32_t W, int32_t Mmax, int32_t Rmax, int32_t max_indel,
    int8_t* moves_out,       // [W, Mmax + Rmax]
    int32_t* nmoves_out      // [W]; -1 = no alignment
) {
    const int32_t stride_mv = Mmax + Rmax;
    std::vector<int32_t> table;
    std::vector<int8_t> mask;
    for (int32_t w = 0; w < W; w++) {
        nmoves_out[w] = -1;
        const int32_t m = mlens[w];
        const int32_t off = offsets[w];
        if (m < 3 || off > max_indel || off < -max_indel) continue;
        if (off < 0 && m < (3 - off)) continue;
        const int32_t rows = m + off;
        if (rows <= 0 || rows > glens[w]) continue;
        const uint8_t* rd = reads + (size_t)w * Mmax;
        const uint8_t* gn = genomes + (size_t)w * Rmax;
        table.assign((size_t)rows * m, NEG);
        mask.assign((size_t)rows * m, 0);
        for (int32_t i = 0; i < rows; i++) {
            const uint8_t gch = gn[i];
            int32_t lo = i - max_indel; if (lo < 0) lo = 0;
            int32_t hi = i + max_indel; if (hi > m - 1) hi = m - 1;
            int32_t* trow = table.data() + (size_t)i * m;
            int8_t* mrow = mask.data() + (size_t)i * m;
            const int32_t* tup = trow - m;   // row i-1 (valid iff i>0)
            const int8_t* mup = mrow - m;
            for (int32_t j = lo; j <= hi; j++) {
                int32_t from_upper = NEG, from_left = NEG, from_ul;
                if (i > 0)
                    from_upper = tup[j] + ((mup[j] == M_DEL) ? 0 : -1);
                if (j > 0)
                    from_left = trow[j - 1] + ((mrow[j - 1] == M_INS) ? 0 : -1);
                const int32_t sc = (gch == rd[j]) ? 2 : 0;
                if (i > 0 && j > 0) from_ul = tup[j - 1] + sc;
                else if (i == 0 && j == 0) from_ul = sc;
                else from_ul = NEG;
                // the reference's tie ladder, verbatim
                if (from_ul == from_upper && from_ul > from_left) {
                    mrow[j] = M_DEL; trow[j] = from_upper;
                } else if (from_ul == from_left && from_ul > from_upper) {
                    mrow[j] = M_INS; trow[j] = from_left;
                } else if (from_ul > from_left && from_ul > from_upper) {
                    mrow[j] = (gch == rd[j]) ? M_MATCH : M_MISM;
                    trow[j] = from_ul;
                } else if (from_ul == from_left && from_ul == from_upper) {
                    mrow[j] = (gch == rd[j]) ? M_MATCH : M_MISM;
                    trow[j] = from_ul;
                } else if (from_left > from_upper) {
                    mrow[j] = M_INS; trow[j] = from_left;
                } else {
                    mrow[j] = M_DEL; trow[j] = from_upper;
                }
            }
        }
        // backtrack (core-indel.c:4707-4735), reversed in place at the end
        int32_t pi = rows - 1, j = m - 1, delta = 0, n = 0;
        int8_t* mv = moves_out + (size_t)w * stride_mv;
        bool bad = false;
        while (true) {
            const int8_t mk = mask[(size_t)pi * m + j];
            if (n >= stride_mv) { bad = true; break; }
            if (mk == M_INS) { j--; delta--; mv[n++] = 2; }
            else if (mk == M_DEL) { pi--; delta++; mv[n++] = 1; }
            else { mv[n++] = (mk == M_MATCH) ? 0 : 3; pi--; j--; }
            if (pi == -1 && j == -1) break;
            if (j < 0 || pi < 0) { bad = true; break; }
        }
        if (bad || delta != off) continue;
        for (int32_t a = 0, b = n - 1; a < b; a++, b--) {
            int8_t t = mv[a]; mv[a] = mv[b]; mv[b] = t;
        }
        nmoves_out[w] = n;
    }
    return 0;
}

// Movement walk -> indel events, the find_new_indels section walk
// (core-indel.c:1936-2086; python oracle _events_from_moves):
// small_side = last chromosome base before the indel; windows with >2
// mismatches are rejected.  Runs straight off dp_align_batch's buffers.
extern "C" long dp_events_batch(
    const int8_t* moves,       // [W, stride_mv]
    const int32_t* nmoves,     // [W]; -1 = no alignment
    const int64_t* chro_start, // [W]
    const int32_t* read_start, // [W]
    int32_t W, int32_t stride_mv, int32_t max_events,
    int64_t* ev_small,         // [W, max_events]
    int32_t* ev_len,           // [W, max_events]
    int32_t* ev_rcur,          // [W, max_events]
    int32_t* n_events          // [W]; -1 = rejected window
) {
    for (int32_t w = 0; w < W; w++) {
        n_events[w] = -1;
        const int32_t n = nmoves[w];
        if (n < 0) continue;
        const int8_t* mv = moves + (size_t)w * stride_mv;
        int32_t mm = 0;
        for (int32_t k = 0; k < n; k++) mm += (mv[k] == 3);
        if (mm > 2) continue;
        int64_t cursor_chro = chro_start[w];
        int32_t cursor_read = read_start[w];
        int8_t last_mv = 0;
        bool in_indel = false;
        int32_t cur_len = 0, ne = 0;
        int64_t left_boundary = 0;
        for (int32_t k = 0; k < n; k++) {
            const int8_t m = mv[k];
            if (last_mv != m) {
                if ((m == 1 || m == 2) && !in_indel) {
                    left_boundary = cursor_chro;
                    in_indel = true;
                    cur_len = 0;
                } else if (in_indel && (m == 0 || m == 3)) {
                    if (ne < max_events) {
                        ev_small[(size_t)w * max_events + ne] =
                            left_boundary - 1;
                        ev_len[(size_t)w * max_events + ne] = cur_len;
                        ev_rcur[(size_t)w * max_events + ne] =
                            cursor_read + (cur_len < 0 ? cur_len : 0);
                        ne++;
                    }
                    in_indel = false;
                }
                if (m == 0 || m == 3) in_indel = false;
            }
            if (in_indel && m == 1) cur_len++;
            if (in_indel && m == 2) cur_len--;
            if (m == 1 || m == 3 || m == 0) cursor_chro++;
            if (m == 2 || m == 3 || m == 0) cursor_read++;
            last_mv = m;
        }
        n_events[w] = ne;
    }
    return 0;
}

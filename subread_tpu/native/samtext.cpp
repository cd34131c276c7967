// Native SAM text emitter — the host-side hot loop of the aligner output
// path.  Reference equivalent: write_single_fragment (core.c:1888) and the
// BGZF writer's record formatting (sambam-file.c).  The device produces
// small int arrays per read; this routine turns them into SAM lines at
// memcpy speed instead of Python string-building speed.
//
// Build: g++ -O3 -shared -fPIC -o libsamtext.so samtext.cpp

#include <cstdint>
#include <cstring>
#include <cstdio>

static const char CODE2BASE[4] = {'A', 'G', 'C', 'T'};

static inline char *put_str(char *p, const char *s, long n) {
    memcpy(p, s, n);
    return p + n;
}

static inline char *put_u32(char *p, uint32_t v) {
    char tmp[12];
    int n = 0;
    if (v == 0) tmp[n++] = '0';
    while (v) { tmp[n++] = '0' + (v % 10); v /= 10; }
    while (n) *p++ = tmp[--n];
    return p;
}

static inline char *put_i32(char *p, int32_t v) {
    if (v < 0) { *p++ = '-'; v = -v; }
    return put_u32(p, (uint32_t)v);
}

extern "C" long format_sam_records(
    int32_t n_reads,
    const char *names, const int64_t *name_off,        // [n+1] offsets
    const uint8_t *codes, const uint8_t *quals,        // [n, Lmax]
    const int32_t *lens, int32_t Lmax,
    const int32_t *flags, const int32_t *cidx,
    const int32_t *pos1, const int32_t *mapqs,
    const int32_t *indel, const int32_t *split,
    const int32_t *junc_gap,
    const int32_t *clip_l, const int32_t *clip_r,
    const uint8_t *mapped, const int32_t *nm,
    const char *contigs, const int64_t *contig_off,    // [n_contigs+1]
    const uint8_t *suppress,                           // may be null
    // PE mate columns (all null for single-end): rnext_cidx -1 = "*",
    // -2 = "="; pnext 1-based; tlen signed
    const int32_t *rnext_cidx, const int32_t *pnext, const int32_t *tlen,
    // HI/NH tags (reference write_single_fragment core.c:2047 emits
    // "HI:i:x\tNH:i:y" whenever either end of the fragment mapped);
    // null = never emit, nh[i]==0 = suppress for this record
    const int32_t *hi, const int32_t *nh,
    char *out, int64_t outcap)
{
    char *p = out;
    char *end = out + outcap - 16;

    for (int32_t i = 0; i < n_reads; i++) {
        if (suppress && suppress[i]) continue;  // caller emits these itself
        int32_t L = lens[i];
        if (p + 2 * L + 256 + (name_off[i + 1] - name_off[i]) > end) return -1;

        // QNAME
        p = put_str(p, names + name_off[i], name_off[i + 1] - name_off[i]);
        *p++ = '\t';
        int32_t flag = flags[i];
        bool is_mapped = mapped[i] != 0;
        bool rev = (flag & 0x10) != 0;
        p = put_i32(p, flag);
        *p++ = '\t';
        if (!is_mapped) {
            // PE: an unmapped end still prints its mate's RNEXT/PNEXT
            // (reference emits out_chro2/out_offset2 regardless of this
            // end's state, core.c:2140-2164)
            p = put_str(p, "*\t0\t0\t*\t", 8);
            if (rnext_cidx) {
                int32_t rn = rnext_cidx[i];
                if (rn == -1) *p++ = '*';
                else if (rn == -2) *p++ = '=';
                else p = put_str(p, contigs + contig_off[rn],
                                 contig_off[rn + 1] - contig_off[rn]);
                *p++ = '\t';
                p = put_i32(p, pnext[i]);
                *p++ = '\t';
                p = put_i32(p, tlen[i]);
                *p++ = '\t';
            } else {
                p = put_str(p, "*\t0\t0\t", 6);
            }
        } else {
            int32_t c = cidx[i];
            p = put_str(p, contigs + contig_off[c], contig_off[c + 1] - contig_off[c]);
            *p++ = '\t';
            p = put_i32(p, pos1[i]);
            *p++ = '\t';
            p = put_i32(p, mapqs[i]);
            *p++ = '\t';
            // CIGAR from (split, indel, junc_gap)
            int32_t ind = indel[i], sp = split[i], jg = junc_gap ? junc_gap[i] : 0;
            if (jg > 0) {
                // clipped junction: clS spM jgN (L-cl-sp-cr)M crS
                int32_t cl = clip_l ? clip_l[i] : 0;
                int32_t cr = clip_r ? clip_r[i] : 0;
                if (cl > 0) { p = put_i32(p, cl); *p++ = 'S'; }
                p = put_i32(p, sp); *p++ = 'M';
                p = put_i32(p, jg); *p++ = 'N';
                p = put_i32(p, L - cl - sp - cr); *p++ = 'M';
                if (cr > 0) { p = put_i32(p, cr); *p++ = 'S'; }
            } else if (ind > 0) {
                // clS (sp-cl)M dD (L-sp-cr)M crS  (sp = unclipped split)
                int32_t cl = clip_l ? clip_l[i] : 0;
                int32_t cr = clip_r ? clip_r[i] : 0;
                if (cl > 0) { p = put_i32(p, cl); *p++ = 'S'; }
                p = put_i32(p, sp - cl); *p++ = 'M';
                p = put_i32(p, ind); *p++ = 'D';
                p = put_i32(p, L - sp - cr); *p++ = 'M';
                if (cr > 0) { p = put_i32(p, cr); *p++ = 'S'; }
            } else if (ind < 0) {
                int32_t cl = clip_l ? clip_l[i] : 0;
                int32_t cr = clip_r ? clip_r[i] : 0;
                if (cl > 0) { p = put_i32(p, cl); *p++ = 'S'; }
                p = put_i32(p, sp - cl); *p++ = 'M';
                p = put_i32(p, -ind); *p++ = 'I';
                p = put_i32(p, L - sp + ind - cr); *p++ = 'M';
                if (cr > 0) { p = put_i32(p, cr); *p++ = 'S'; }
            } else {
                int32_t cl = clip_l ? clip_l[i] : 0;
                int32_t cr = clip_r ? clip_r[i] : 0;
                if (cl > 0) { p = put_i32(p, cl); *p++ = 'S'; }
                p = put_i32(p, L - cl - cr); *p++ = 'M';
                if (cr > 0) { p = put_i32(p, cr); *p++ = 'S'; }
            }
            if (rnext_cidx) {
                *p++ = '\t';
                int32_t rn = rnext_cidx[i];
                if (rn == -1) *p++ = '*';
                else if (rn == -2) *p++ = '=';
                else p = put_str(p, contigs + contig_off[rn],
                                 contig_off[rn + 1] - contig_off[rn]);
                *p++ = '\t';
                p = put_i32(p, pnext[i]);
                *p++ = '\t';
                p = put_i32(p, tlen[i]);
                *p++ = '\t';
            } else {
                p = put_str(p, "\t*\t0\t0\t", 7);
            }
        }
        // SEQ (+ QUAL), reverse-complemented for reverse-strand alignments
        const uint8_t *cd = codes + (int64_t)i * Lmax;
        const uint8_t *qu = quals + (int64_t)i * Lmax;
        if (is_mapped && rev) {
            for (int32_t j = L - 1; j >= 0; j--) *p++ = CODE2BASE[3 - (cd[j] & 3)];
            *p++ = '\t';
            for (int32_t j = L - 1; j >= 0; j--) *p++ = (char)qu[j];
        } else {
            for (int32_t j = 0; j < L; j++) *p++ = CODE2BASE[cd[j] & 3];
            *p++ = '\t';
            for (int32_t j = 0; j < L; j++) *p++ = (char)qu[j];
        }
        if (hi && nh && nh[i] > 0) {
            p = put_str(p, "\tHI:i:", 6);
            p = put_i32(p, hi[i]);
            p = put_str(p, "\tNH:i:", 6);
            p = put_i32(p, nh[i]);
        }
        if (is_mapped) {
            p = put_str(p, "\tNM:i:", 6);
            p = put_i32(p, nm[i]);
        }
        *p++ = '\n';
    }
    return p - out;
}

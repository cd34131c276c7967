// Native featureCounts fast path — single-end records, default overlap
// semantics.  Reference equivalents: parse_bin + process_line_buffer +
// vote_and_add_count (readSummary.c:2363, 2924, 4611) restricted to the
// option subset where assignment reduces to "distinct overlapped targets
// == 1" (no -O / fractional / largestOverlap / minOverlap>1 / PE gates).
// The Python engine handles every other configuration; the caller only
// invokes this when the active options are inside the subset, so golden
// outputs are identical by construction.
//
// Feature lookup mirrors _ChromIndex: per chromosome, features sorted by
// start with a running prefix max of ends; a record section scans
// backwards from upper_bound(start <= section_end) while
// prefix_max_end >= section_start (the reference's block max_end bound,
// readSummary.c:1592-1680).

#include <cstdint>
#include <cstring>
#include <cstdlib>

namespace {

// summary slot order (must match python _FC_SUMMARY_SLOTS)
enum {
    S_ASSIGNED = 0, S_UNMAPPED, S_NOFEAT, S_AMBIG, S_MULTI, S_MAPQ, S_DUP,
    S_N_SLOTS
};

static inline bool str_eq(const char *a, long alen, const char *b, long blen) {
    return alen == blen && memcmp(a, b, alen) == 0;
}

}  // namespace

extern "C" long fc_count_sam_simple(
    const char *buf, long buflen,
    const char *chrom_blob, const int64_t *chrom_off, int32_t n_chroms,
    const int32_t *feat_start, const int32_t *feat_end,
    const int32_t *feat_pmax_end, const int64_t *feat_target,
    const int8_t *feat_strand,
    const int64_t *chrom_feat_off,  // [n_chroms+1]
    int64_t n_targets,
    int32_t min_mapq, int32_t primary_only, int32_t ignore_dup,
    int32_t count_multi,            // 0: NH>1 -> Unassigned_MultiMapping
    int32_t strandness,             // 0 none, 1 stranded, 2 reversed
    int32_t max_mop,                // --maxMOp M-operation cap
    double *counts, int64_t *summary)
{
    (void)n_targets;
    // chromosome lookup cache: SAM files cluster records by chromosome
    int last_chrom = -1;
    const char *last_name = nullptr;
    long last_name_len = -1;

    const char *p = buf;
    const char *end = buf + buflen;
    long n_rec = 0;

    const int MAX_HIT = 64;
    int64_t hits[MAX_HIT];

    while (p < end) {
        const char *line_end = (const char *)memchr(p, '\n', end - p);
        if (!line_end) line_end = end;
        if (*p == '@' || line_end == p) { p = line_end + 1; continue; }

        // locate the first 6 fields (qname flag rname pos mapq cigar)
        const char *f[7];
        int nf = 0;
        f[nf++] = p;
        for (const char *q = p; q < line_end && nf < 7; q++)
            if (*q == '\t') f[nf++] = q + 1;
        if (nf < 6) return -1;  // malformed: let python handle the file
        n_rec++;

        // gate order follows the python engine (_assign): unmapped,
        // mapq, duplicate, NH multi-mapping, primary
        long flag = strtol(f[1], nullptr, 10);
        bool skip = false;
        if ((flag & 0x4) || *f[5] == '*') { summary[S_UNMAPPED]++; skip = true; }
        else if (min_mapq && strtol(f[4], nullptr, 10) < min_mapq) {
            summary[S_MAPQ]++; skip = true;
        }
        else if (ignore_dup && (flag & 0x400)) { summary[S_DUP]++; skip = true; }
        if (!skip && !count_multi) {
            // NH:i: tag scan over the remainder of the line
            const char *t = nf >= 7 ? f[6] : line_end;
            for (const char *q = t; q + 5 <= line_end; q++) {
                if (q[0]=='N' && q[1]=='H' && q[2]==':' && q[3]=='i' && q[4]==':') {
                    if (strtol(q + 5, nullptr, 10) > 1) {
                        summary[S_MULTI]++; skip = true;
                    }
                    break;
                }
            }
        }
        if (!skip && primary_only && (flag & 0x100)) {
            summary[S_MULTI]++; skip = true;
        }
        if (skip) { p = line_end + 1; continue; }

        // chromosome id
        const char *rn = f[2];
        long rn_len = (f[3] - 1) - rn;
        int ci = -1;
        if (last_name && str_eq(rn, rn_len, last_name, last_name_len)) {
            ci = last_chrom;
        } else {
            for (int c = 0; c < n_chroms; c++) {
                const char *nm = chrom_blob + chrom_off[c];
                long nl = chrom_off[c + 1] - chrom_off[c];
                if (str_eq(rn, rn_len, nm, nl)) { ci = c; break; }
            }
            last_chrom = ci; last_name = rn; last_name_len = rn_len;
        }
        if (ci < 0) { summary[S_NOFEAT]++; p = line_end + 1; continue; }

        int read_strand = (flag & 0x10) ? 1 : 0;
        int want_strand = -1;  // required feature strand (2 always matches)
        if (strandness == 1) want_strand = read_strand;
        else if (strandness == 2) want_strand = read_strand ^ 1;

        int n_hit = 0;
        bool overflow = false;
        auto scan_section = [&](long ss, long ee) {
            long lo = chrom_feat_off[ci], hi = chrom_feat_off[ci + 1];
            long a = lo, b = hi;  // upper_bound over feat_start <= ee
            while (a < b) {
                long m = (a + b) >> 1;
                if ((long)feat_start[m] <= ee) a = m + 1; else b = m;
            }
            for (long j = a - 1; j >= lo && (long)feat_pmax_end[j] >= ss; j--) {
                if ((long)feat_end[j] < ss) continue;
                if (want_strand >= 0 && feat_strand[j] != 2 &&
                    feat_strand[j] != want_strand) continue;
                int64_t t = feat_target[j];
                bool seen = false;
                for (int k = 0; k < n_hit; k++)
                    if (hits[k] == t) { seen = true; break; }
                if (!seen) {
                    if (n_hit == MAX_HIT) { overflow = true; return; }
                    hits[n_hit++] = t;
                }
            }
        };

        // CIGAR -> genomic sections (split at N; M/D/=/X consume ref)
        long gp = strtol(f[3], nullptr, 10);
        long sec_start = -1;
        bool bad_cigar = false;
        int n_mop = 0;
        const char *q = f[5];
        while (q < line_end && *q != '\t') {
            long n = 0;
            while (q < line_end && *q >= '0' && *q <= '9') n = n * 10 + (*q++ - '0');
            char op = *q++;
            if ((op == 'M' || op == '=' || op == 'X') && ++n_mop > max_mop)
                break;  // python _sections: stop honouring M ops past the cap
            switch (op) {
                case 'M': case '=': case 'X':
                    if (sec_start < 0) sec_start = gp;
                    gp += n; break;
                case 'D':
                    gp += n; break;
                case 'N':
                    if (sec_start >= 0) { scan_section(sec_start, gp - 1); sec_start = -1; }
                    gp += n; break;
                case 'I': case 'S': case 'H': case 'P':
                    break;
                default:
                    bad_cigar = true; break;
            }
            if (bad_cigar || overflow) break;
        }
        if (bad_cigar || overflow) return -1;
        if (sec_start >= 0) scan_section(sec_start, gp - 1);
        if (overflow) return -1;

        if (n_hit == 0) summary[S_NOFEAT]++;
        else if (n_hit > 1) summary[S_AMBIG]++;
        else { counts[hits[0]] += 1.0; summary[S_ASSIGNED]++; }
        p = line_end + 1;
    }
    return n_rec;
}

// BAM-record variant: walks uncompressed BAM records (the caller BGZF-
// inflates and strips the header).  ref2chrom maps BAM reference ids to
// the chromosome table used above; -1 = not annotated.
extern "C" long fc_count_bam_simple(
    const uint8_t *buf, long buflen,
    const int32_t *ref2chrom, int32_t n_refs,
    const int32_t *feat_start, const int32_t *feat_end,
    const int32_t *feat_pmax_end, const int64_t *feat_target,
    const int8_t *feat_strand,
    const int64_t *chrom_feat_off,
    int64_t n_targets,
    int32_t min_mapq, int32_t primary_only, int32_t ignore_dup,
    int32_t count_multi, int32_t strandness, int32_t max_mop,
    double *counts, int64_t *summary)
{
    (void)n_targets;
    const uint8_t *p = buf;
    const uint8_t *end = buf + buflen;
    long n_rec = 0;
    const int MAX_HIT = 64;
    int64_t hits[MAX_HIT];

    auto rd_i32 = [](const uint8_t *q) {
        int32_t v; memcpy(&v, q, 4); return v;
    };
    auto rd_u32 = [](const uint8_t *q) {
        uint32_t v; memcpy(&v, q, 4); return v;
    };
    auto rd_u16 = [](const uint8_t *q) {
        uint16_t v; memcpy(&v, q, 2); return v;
    };

    while (p + 4 <= end) {
        int32_t block = rd_i32(p);
        const uint8_t *rec = p + 4;
        p = rec + block;
        if (p > end || block < 32) break;
        n_rec++;

        int32_t ref_id = rd_i32(rec);
        int32_t pos0 = rd_i32(rec + 4);
        uint8_t l_qname = rec[8];
        uint8_t mapq = rec[9];
        uint16_t n_cigar = rd_u16(rec + 12);
        uint16_t flag = rd_u16(rec + 14);
        int32_t l_seq = rd_i32(rec + 16);
        const uint8_t *cig = rec + 32 + l_qname;
        const uint8_t *seqp = cig + 4 * n_cigar;
        const uint8_t *tagp = seqp + (l_seq + 1) / 2 + l_seq;

        bool skip = false;
        if ((flag & 0x4) || n_cigar == 0) { summary[S_UNMAPPED]++; skip = true; }
        else if (min_mapq && mapq < min_mapq) { summary[S_MAPQ]++; skip = true; }
        else if (ignore_dup && (flag & 0x400)) { summary[S_DUP]++; skip = true; }
        if (!skip && !count_multi) {
            // binary tag walk for NH
            const uint8_t *t = tagp;
            while (t + 3 <= rec + block) {
                char c1 = t[0], c2 = t[1], typ = t[2];
                long vlen = 0;
                long nh = -1;
                switch (typ) {
                    case 'A': case 'c': case 'C': vlen = 1; break;
                    case 's': case 'S': vlen = 2; break;
                    case 'i': case 'I': case 'f': vlen = 4; break;
                    case 'Z': case 'H': {
                        const uint8_t *z = t + 3;
                        while (z < rec + block && *z) z++;
                        vlen = z - (t + 3) + 1;
                        break;
                    }
                    case 'B': {
                        // subtype(1) + count(u32) + count*esz payload
                        if (t + 8 > rec + block) { vlen = -1; break; }
                        uint8_t st = t[3];
                        int esz = (st=='c'||st=='C')?1:((st=='s'||st=='S')?2:4);
                        vlen = 1 + 4 + esz * (long)rd_u32(t + 4);
                        break;
                    }
                    default: vlen = -1; break;
                }
                if (vlen < 0) break;
                if (c1 == 'N' && c2 == 'H') {
                    switch (typ) {
                        case 'c': nh = *(const int8_t *)(t + 3); break;
                        case 'C': nh = t[3]; break;
                        case 's': { int16_t v; memcpy(&v, t+3, 2); nh = v; break; }
                        case 'S': { uint16_t v; memcpy(&v, t+3, 2); nh = v; break; }
                        case 'i': case 'I': nh = rd_i32(t + 3); break;
                        default: break;
                    }
                    if (nh > 1) { summary[S_MULTI]++; skip = true; }
                    break;
                }
                t += 3 + vlen;
            }
        }
        if (!skip && primary_only && (flag & 0x100)) {
            summary[S_MULTI]++; skip = true;
        }
        if (skip) continue;

        int ci = (ref_id >= 0 && ref_id < n_refs) ? ref2chrom[ref_id] : -1;
        if (ci < 0) { summary[S_NOFEAT]++; continue; }

        int want_strand = -1;
        int read_strand = (flag & 0x10) ? 1 : 0;
        if (strandness == 1) want_strand = read_strand;
        else if (strandness == 2) want_strand = read_strand ^ 1;

        int n_hit = 0;
        bool overflow = false;
        auto scan_section = [&](long ss, long ee) {
            long lo = chrom_feat_off[ci], hi = chrom_feat_off[ci + 1];
            long a = lo, b = hi;
            while (a < b) {
                long m = (a + b) >> 1;
                if ((long)feat_start[m] <= ee) a = m + 1; else b = m;
            }
            for (long j = a - 1; j >= lo && (long)feat_pmax_end[j] >= ss; j--) {
                if ((long)feat_end[j] < ss) continue;
                if (want_strand >= 0 && feat_strand[j] != 2 &&
                    feat_strand[j] != want_strand) continue;
                int64_t t = feat_target[j];
                bool seen = false;
                for (int k = 0; k < n_hit; k++)
                    if (hits[k] == t) { seen = true; break; }
                if (!seen) {
                    if (n_hit == MAX_HIT) { overflow = true; return; }
                    hits[n_hit++] = t;
                }
            }
        };

        long gp = pos0 + 1;  // 1-based
        long sec_start = -1;
        int n_mop = 0;
        bool bad = false;
        for (int k = 0; k < n_cigar && !bad && !overflow; k++) {
            uint32_t cv = rd_u32(cig + 4 * k);
            long n = cv >> 4;
            int op = cv & 0xF;  // MIDNSHP=X
            if ((op == 0 || op == 7 || op == 8) && ++n_mop > max_mop) break;
            switch (op) {
                case 0: case 7: case 8:         // M,=,X
                    if (sec_start < 0) sec_start = gp;
                    gp += n; break;
                case 2: gp += n; break;          // D
                case 3:                           // N
                    if (sec_start >= 0) { scan_section(sec_start, gp - 1); sec_start = -1; }
                    gp += n; break;
                case 1: case 4: case 5: case 6: break;  // I,S,H,P
                default: bad = true; break;
            }
        }
        if (bad || overflow) return -1;
        if (sec_start >= 0) scan_section(sec_start, gp - 1);
        if (overflow) return -1;

        if (n_hit == 0) summary[S_NOFEAT]++;
        else if (n_hit > 1) summary[S_AMBIG]++;
        else { counts[hits[0]] += 1.0; summary[S_ASSIGNED]++; }
    }
    return n_rec;
}

// Multithreaded whole-file BGZF inflate.
//
// Reference equivalent: the serial BGZF chunk reader (SamBam_fgets,
// sambam-file.h:195) and its master/worker decompression pool.  BGZF
// blocks are independent raw-deflate streams whose compressed size (BC
// subfield) and uncompressed size (ISIZE trailer) are recorded per block,
// so the file can be scanned once and inflated fully in parallel into a
// preallocated buffer.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Span {
  long comp_off;
  long comp_len;
  long out_off;
  long out_len;
};

// Walk block headers; returns false on malformed input.
static bool scan_blocks(const uint8_t* raw, long n, std::vector<Span>& spans,
                        long* total) {
  long off = 0, out_off = 0;
  while (off + 18 <= n) {
    if (raw[off] != 0x1f || raw[off + 1] != 0x8b) return false;
    const uint16_t xlen = raw[off + 10] | (raw[off + 11] << 8);
    long bsize = -1;
    long e = off + 12;
    const long e_end = e + xlen;
    if (e_end > n) return false;
    while (e + 4 <= e_end) {
      const uint8_t si1 = raw[e], si2 = raw[e + 1];
      const uint16_t slen = raw[e + 2] | (raw[e + 3] << 8);
      if (si1 == 66 && si2 == 67 && slen >= 2)
        bsize = (long)(raw[e + 4] | (raw[e + 5] << 8)) + 1;
      e += 4 + slen;
    }
    if (bsize < 0 || off + bsize > n) return false;
    const long isize_off = off + bsize - 4;
    uint32_t isize;
    std::memcpy(&isize, raw + isize_off, 4);
    spans.push_back(Span{off + 12 + xlen, bsize - 12 - xlen - 8, out_off,
                         (long)isize});
    out_off += (long)isize;
    off += bsize;
  }
  if (off != n) return false;
  *total = out_off;
  return true;
}

static void inflate_range(const uint8_t* raw, uint8_t* out,
                          const std::vector<Span>& spans, size_t lo,
                          size_t hi, int* err) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -15) != Z_OK) {
    *err = 1;
    return;
  }
  for (size_t i = lo; i < hi; ++i) {
    const Span& s = spans[i];
    if (s.out_len == 0) continue;
    inflateReset(&zs);
    zs.next_in = const_cast<Bytef*>(raw + s.comp_off);
    zs.avail_in = (uInt)s.comp_len;
    zs.next_out = out + s.out_off;
    zs.avail_out = (uInt)s.out_len;
    const int rv = inflate(&zs, Z_FINISH);
    if (rv != Z_STREAM_END || zs.avail_out != 0) {
      *err = 1;
      break;
    }
  }
  inflateEnd(&zs);
}

}  // namespace

extern "C" {

// Total uncompressed size of a BGZF byte stream, or -1 if malformed.
long bgzf_total_isize(const uint8_t* raw, long n) {
  std::vector<Span> spans;
  long total = 0;
  if (!scan_blocks(raw, n, spans, &total)) return -1;
  return total;
}

// Inflate every block into `out` (preallocated, `out_cap` >= total isize).
// Returns bytes written, or -1 on malformed input / inflate error.
long bgzf_inflate_all(const uint8_t* raw, long n, uint8_t* out, long out_cap,
                      int threads) {
  std::vector<Span> spans;
  long total = 0;
  if (!scan_blocks(raw, n, spans, &total)) return -1;
  if (total > out_cap) return -1;
  if (threads < 1) threads = 1;
  const size_t nb = spans.size();
  if (threads == 1 || nb < 8) {
    int err = 0;
    inflate_range(raw, out, spans, 0, nb, &err);
    return err ? -1 : total;
  }
  std::vector<std::thread> pool;
  std::vector<int> errs((size_t)threads, 0);
  const size_t per = (nb + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const size_t lo = (size_t)t * per;
    const size_t hi = lo + per < nb ? lo + per : nb;
    if (lo >= hi) break;
    pool.emplace_back(inflate_range, raw, out, std::cref(spans), lo, hi,
                      &errs[(size_t)t]);
  }
  for (auto& th : pool) th.join();
  for (int e : errs)
    if (e) return -1;
  return total;
}

}  // extern "C"

// dvnative: host-side native kernels for deepvariant_tpu.
//
// This library holds the CPU hot loops that sit outside the JAX/TPU compute
// path: CRC32C for TFRecord framing, BGZF block inflation, and BAM record
// decoding into columnar arrays. Exposed through a plain C ABI and bound via
// ctypes (deepvariant_tpu/io/native.py) — no pybind dependency.
//
// Role parity: replaces what the reference gets from htslib + nucleus C++
// (sam_reader.cc, tfrecord_writer.h); the design differs — records decode
// straight into structure-of-arrays buffers supplied by the caller.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <emmintrin.h>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// CRC32C (Castagnoli). Uses SSE4.2 hardware instruction when available.
// ---------------------------------------------------------------------------

#if defined(__x86_64__)
__attribute__((target("sse4.2")))
static uint32_t crc32c_hw(const uint8_t* data, uint64_t n, uint32_t crc) {
  uint64_t c = crc ^ 0xFFFFFFFFu;
  while (n >= 8) {
    uint64_t word;
    std::memcpy(&word, data, 8);
    c = __builtin_ia32_crc32di(c, word);
    data += 8;
    n -= 8;
  }
  uint32_t c32 = static_cast<uint32_t>(c);
  while (n > 0) {
    c32 = __builtin_ia32_crc32qi(c32, *data);
    ++data;
    --n;
  }
  return c32 ^ 0xFFFFFFFFu;
}
#endif

static uint32_t kCrcTable[256];
static bool kCrcInit = false;

static void crc_table_init() {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int k = 0; k < 8; ++k) {
      crc = (crc >> 1) ^ ((crc & 1) ? 0x82F63B78u : 0);
    }
    kCrcTable[i] = crc;
  }
  kCrcInit = true;
}

static uint32_t crc32c_sw(const uint8_t* data, uint64_t n, uint32_t crc) {
  if (!kCrcInit) crc_table_init();
  uint32_t c = crc ^ 0xFFFFFFFFu;
  for (uint64_t i = 0; i < n; ++i) {
    c = (c >> 8) ^ kCrcTable[(c ^ data[i]) & 0xFF];
  }
  return c ^ 0xFFFFFFFFu;
}

uint32_t dv_crc32c(const uint8_t* data, uint64_t n, uint32_t crc) {
#if defined(__x86_64__)
  if (__builtin_cpu_supports("sse4.2")) {
    return crc32c_hw(data, n, crc);
  }
#endif
  return crc32c_sw(data, n, crc);
}

// ---------------------------------------------------------------------------
// BGZF: inflate a whole BGZF file image into a caller-grown buffer.
// Returns uncompressed size, or -1 on error. If out == nullptr, only sizes.
// ---------------------------------------------------------------------------

int64_t dv_bgzf_inflate_all(const uint8_t* src, int64_t src_len, uint8_t* out,
                            int64_t out_cap) {
  int64_t pos = 0;
  int64_t written = 0;
  while (pos + 18 <= src_len) {
    if (src[pos] != 0x1f || src[pos + 1] != 0x8b) return -1;
    uint16_t xlen;
    std::memcpy(&xlen, src + pos + 10, 2);
    // Find the BC subfield for the block size.
    int64_t xpos = pos + 12;
    int64_t xend = xpos + xlen;
    int bsize = -1;
    while (xpos + 4 <= xend) {
      uint8_t si1 = src[xpos], si2 = src[xpos + 1];
      uint16_t slen;
      std::memcpy(&slen, src + xpos + 2, 2);
      if (si1 == 'B' && si2 == 'C' && slen == 2) {
        uint16_t bs;
        std::memcpy(&bs, src + xpos + 4, 2);
        bsize = bs + 1;
        break;
      }
      xpos += 4 + slen;
    }
    if (bsize < 0 || pos + bsize > src_len) return -1;
    uint32_t isize;
    std::memcpy(&isize, src + pos + bsize - 4, 4);
    if (out != nullptr) {
      if (written + isize > out_cap) return -1;
      if (isize > 0) {
        z_stream zs;
        std::memset(&zs, 0, sizeof(zs));
        if (inflateInit2(&zs, -15) != Z_OK) return -1;
        zs.next_in = const_cast<uint8_t*>(src + pos + 18);
        zs.avail_in = bsize - 18 - 8;
        zs.next_out = out + written;
        zs.avail_out = isize;
        int rc = inflate(&zs, Z_FINISH);
        inflateEnd(&zs);
        if (rc != Z_STREAM_END) return -1;
      }
    }
    written += isize;
    pos += bsize;
  }
  return written;
}

// ---------------------------------------------------------------------------
// BAM record scan: decode records from an inflated BAM byte stream into
// columnar output arrays. The caller passes the uncompressed bytes starting
// at a record boundary plus capacity-bounded output arrays; we return the
// number of records decoded and fill counts. Filtering happens here so
// Python never touches rejected records.
// ---------------------------------------------------------------------------

struct DvBamFilter {
  int32_t ref_id;           // -1 = accept all contigs
  int64_t start;            // overlap window on ref_id
  int64_t end;
  int32_t min_mapq;
  uint16_t flag_reject;     // records with any of these flags are dropped
};

// Output arrays sized by caller: n_max records, seq_cap bases, cigar_cap ops.
// name bytes are written packed with offsets.
struct DvBamOut {
  uint16_t* flag;
  int32_t* ref_id;
  int64_t* pos;
  uint8_t* mapq;
  int32_t* mate_ref_id;
  int64_t* mate_pos;
  int32_t* tlen;
  uint8_t* seq;          // ASCII
  uint8_t* qual;
  int64_t* seq_offsets;  // n+1
  int8_t* cigar_ops;     // proto codes
  int32_t* cigar_lens;
  int64_t* cigar_offsets;  // n+1
  uint8_t* names;        // packed, NUL separated
  int64_t* name_offsets;  // n+1
  int64_t* aux_offsets;   // n+1 (offsets into src for lazy aux parsing)
  int64_t* aux_src_start;  // n (absolute src offset of aux blob)
};

static const char kSeqCode[17] = "=ACMGRSVTWYHKDBN";

int64_t dv_bam_scan(const uint8_t* src, int64_t src_len, DvBamFilter filter,
                    int64_t n_max, int64_t seq_cap, int64_t cigar_cap,
                    int64_t name_cap, DvBamOut* o, int64_t* consumed) {
  int64_t pos = 0;
  int64_t n = 0;
  int64_t seq_off = 0, cig_off = 0, name_off = 0;
  o->seq_offsets[0] = 0;
  o->cigar_offsets[0] = 0;
  o->name_offsets[0] = 0;
  while (pos + 4 <= src_len && n < n_max) {
    int32_t block_size;
    std::memcpy(&block_size, src + pos, 4);
    if (pos + 4 + block_size > src_len) break;
    const uint8_t* rec = src + pos + 4;
    int32_t rid, rpos, next_rid, next_pos, tlen32, l_seq;
    uint32_t lrn_mq_bin, flag_nc;
    std::memcpy(&rid, rec, 4);
    std::memcpy(&rpos, rec + 4, 4);
    std::memcpy(&lrn_mq_bin, rec + 8, 4);
    std::memcpy(&flag_nc, rec + 12, 4);
    std::memcpy(&l_seq, rec + 16, 4);
    std::memcpy(&next_rid, rec + 20, 4);
    std::memcpy(&next_pos, rec + 24, 4);
    std::memcpy(&tlen32, rec + 28, 4);
    uint32_t l_read_name = lrn_mq_bin & 0xFF;
    uint32_t mapq = (lrn_mq_bin >> 8) & 0xFF;
    uint32_t n_cigar = flag_nc & 0xFFFF;
    uint32_t flag = (flag_nc >> 16) & 0xFFFF;

    pos += 4 + block_size;

    if (filter.ref_id >= 0) {
      if (rid != filter.ref_id) {
        if (rid > filter.ref_id || rid < 0) { break; }
        continue;
      }
      if (rpos >= filter.end) break;
    }
    if (flag & filter.flag_reject) continue;
    if (static_cast<int32_t>(mapq) < filter.min_mapq) continue;

    const uint8_t* p = rec + 32;
    const uint8_t* name_p = p;
    p += l_read_name;
    const uint8_t* cigar_p = p;
    p += 4 * n_cigar;

    // Reference span for overlap check.
    if (filter.ref_id >= 0 && n_cigar > 0) {
      int64_t span = 0;
      for (uint32_t k = 0; k < n_cigar; ++k) {
        uint32_t unit;
        std::memcpy(&unit, cigar_p + 4 * k, 4);
        uint32_t op = unit & 0xF;
        // BAM ops consuming ref: M(0) D(2) N(3) =(7) X(8)
        if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8) {
          span += unit >> 4;
        }
      }
      if (rpos + span <= filter.start) continue;
    }

    // Capacity checks.
    if (seq_off + l_seq > seq_cap || cig_off + n_cigar > cigar_cap ||
        name_off + static_cast<int64_t>(l_read_name) > name_cap) {
      pos -= 4 + block_size;  // rewind; caller regrows and resumes
      break;
    }

    o->flag[n] = static_cast<uint16_t>(flag);
    o->ref_id[n] = rid;
    o->pos[n] = rpos;
    o->mapq[n] = static_cast<uint8_t>(mapq);
    o->mate_ref_id[n] = next_rid;
    o->mate_pos[n] = next_pos;
    o->tlen[n] = tlen32;

    std::memcpy(o->names + name_off, name_p, l_read_name);
    name_off += l_read_name;  // includes trailing NUL
    o->name_offsets[n + 1] = name_off;

    for (uint32_t k = 0; k < n_cigar; ++k) {
      uint32_t unit;
      std::memcpy(&unit, cigar_p + 4 * k, 4);
      o->cigar_ops[cig_off + k] = static_cast<int8_t>((unit & 0xF) + 1);
      o->cigar_lens[cig_off + k] = static_cast<int32_t>(unit >> 4);
    }
    cig_off += n_cigar;
    o->cigar_offsets[n + 1] = cig_off;

    const uint8_t* seq_p = p;
    uint32_t nbytes = (l_seq + 1) / 2;
    p += nbytes;
    for (int32_t k = 0; k < l_seq; ++k) {
      uint8_t b = seq_p[k >> 1];
      o->seq[seq_off + k] =
          kSeqCode[(k & 1) ? (b & 0xF) : (b >> 4)];
    }
    std::memcpy(o->qual + seq_off, p, l_seq);
    p += l_seq;
    seq_off += l_seq;
    o->seq_offsets[n + 1] = seq_off;

    // Aux blob location in src for lazy parse.
    o->aux_src_start[n] = (p - src);
    o->aux_offsets[n + 1] = (rec + block_size) - src;

    ++n;
  }
  *consumed = pos;
  return n;
}

}  // extern "C"

#include <vector>
#include <cstdio>
#include <algorithm>

// ---------------------------------------------------------------------------
// Affine-gap local alignment (Smith-Waterman) with traceback.
//
// Native replacement for the Python DP in deepvariant_tpu/realign/ssw.py
// (which mirrors libssw's role in the reference realigner). Scores and
// cigars are identical to the Python implementation: H/E/F recurrences with
// gap_open >= gap_extend, traceback priority diag > E(del) > F(ins),
// soft-clipped query ends, "=XIDS" cigar alphabet.
// ---------------------------------------------------------------------------

static inline int imax2(int a, int b) { return a > b ? a : b; }

// Appends "<len><op>" to the cigar buffer; returns new length or -1.
static int cigar_append(char* buf, int buf_size, int len_sofar, int count,
                        char op) {
  if (count <= 0) return len_sofar;
  int written = snprintf(buf + len_sofar, buf_size - len_sofar, "%d%c",
                         count, op);
  if (written < 0 || len_sofar + written >= buf_size) return -1;
  return len_sofar + written;
}

// Returns 0 on success (score > 0), 1 when no positive-scoring alignment,
// -1 on buffer overflow. Outputs mirror ssw.py Alignment fields.
// Local affine-gap alignment with the SSW library family's reported-
// alignment semantics (see deepvariant_tpu/realign/ssw.py for the
// behavioral spec pinned by the realigner goldens):
//   phase 1  forward local DP; endpoint = lexicographically smallest
//            (ref_end, query_end) among maximum cells;
//   phase 2  reverse local DP over the reversed prefixes, stopping at
//            the first reversed-ref row that reaches the best score
//            -> shortest span among co-optimal begin points;
//   phase 3  banded global DP over the [begin..end] subsegment with
//            the library's direction tie-breaks (diagonal beats gaps,
//            deletion beats insertion, extension beats re-opening),
//            'M' runs split into '='/'X' by base comparison.
// Returns 0 on success (score > 0), 1 when no positive-scoring
// alignment, -1 on buffer overflow.
namespace {

// Forward/reverse local DP: finds best score and the lexicographically
// smallest (end_ref, end_query) pair; when `target > 0`, stops at the
// first ref row containing a cell equal to `target` (reverse pass).
static void ssw_local_ends(const char* ref, int32_t n, const char* q,
                           int32_t m, int32_t mt, int32_t mm, int32_t go,
                           int32_t ge, int32_t target, int32_t* out_best,
                           int32_t* out_i, int32_t* out_j) {
  const int32_t NEG = -(1 << 28);
  std::vector<int32_t> Hprev(m + 1, 0), Hcur(m + 1, 0), E(m + 1, NEG);
  int32_t best = 0, bi = 0, bj = 0;
  for (int32_t i = 1; i <= n; ++i) {
    const char rc = ref[i - 1];
    int32_t f = NEG;
    Hcur[0] = 0;
    int32_t row_hit = 0;
    for (int32_t j = 1; j <= m; ++j) {
      int32_t e = std::max(Hprev[j] - go, E[j] - ge);
      E[j] = e;
      int32_t diag = Hprev[j - 1] + (rc == q[j - 1] ? mt : -mm);
      f = std::max(Hcur[j - 1] - go, f - ge);
      int32_t h = diag > e ? diag : e;
      if (f > h) h = f;
      if (h < 0) h = 0;
      Hcur[j] = h;
      if (h > best) {
        best = h;
        bi = i;
        bj = j;
      }
      if (target > 0 && h == target && row_hit == 0) row_hit = j;
    }
    if (target > 0 && row_hit > 0) {
      *out_best = target;
      *out_i = i;
      *out_j = row_hit;
      return;
    }
    std::swap(Hprev, Hcur);
  }
  *out_best = best;
  *out_i = bi;
  *out_j = bj;
}

// AVX2 striped variant of ssw_local_ends (defined with the other AVX2
// kernels at the bottom of this file); identical outputs.
void ssw_local_ends_avx2(const char* ref, int32_t n, const char* q,
                         int32_t m, int32_t mt, int32_t mm, int32_t go,
                         int32_t ge, int32_t target, int32_t* out_best,
                         int32_t* out_i, int32_t* out_j);

static inline void ssw_local_ends_fast(
    const char* ref, int32_t n, const char* q, int32_t m, int32_t mt,
    int32_t mm, int32_t go, int32_t ge, int32_t target,
    int32_t* out_best, int32_t* out_i, int32_t* out_j) {
  static const bool kHasAvx2 = __builtin_cpu_supports("avx2");
  // u16 lanes: bail to scalar when scores could overflow (never for
  // realigner windows; defensive for arbitrary callers).
  const int64_t max_score =
      static_cast<int64_t>(std::min(n, m)) * mt + mm;
  // The scalar DP scores raw byte identity (N matches N, R matches
  // R). The 5-letter SIMD profile preserves that for ACGTN only, so
  // any exotic character routes to the scalar path.
  auto acgtn_only = [](const char* s, int32_t len) {
    for (int32_t i = 0; i < len; ++i) {
      switch (s[i]) {
        case 'A': case 'C': case 'G': case 'T': case 'N': break;
        default: return false;
      }
    }
    return true;
  };
  if (kHasAvx2 && m >= 16 && max_score < 65000 &&
      acgtn_only(q, m) && acgtn_only(ref, n)) {
    ssw_local_ends_avx2(ref, n, q, m, mt, mm, go, ge, target, out_best,
                        out_i, out_j);
  } else {
    ssw_local_ends(ref, n, q, m, mt, mm, go, ge, target, out_best,
                   out_i, out_j);
  }
}

// Banded global DP over the matched subsegment; emits per-base ops
// 'M'/'I'/'D' ('I' consumes query, 'D' consumes ref). Returns false
// only if the band never reaches the target score (cannot happen for
// a well-formed subsegment, guarded anyway).
static bool ssw_banded_ops(const char* ref, int32_t ref_len, const char* q,
                           int32_t read_len, int32_t score, int32_t mt,
                           int32_t mm, int32_t go, int32_t ge,
                           std::vector<char>* out_ops) {
  int32_t band_width = std::abs(ref_len - read_len) + 1;
  std::vector<int32_t> h_b, e_b, h_c;
  std::vector<int8_t> direction;
  while (true) {
    const int64_t width = (int64_t)band_width * 2 + 3;
    const int64_t width_d = (int64_t)band_width * 2 + 1;
    h_b.assign(width, 0);
    e_b.assign(width, 0);
    h_c.assign(width, 0);
    direction.assign((size_t)width_d * 3 * read_len, 0);
    int32_t max_score = 0;
    int64_t u = 0;
    for (int32_t i = 0; i < read_len; ++i) {
      int32_t beg = std::max(0, i - band_width);
      int32_t end = std::min(ref_len - 1, i + band_width);
      int64_t edge = std::min<int64_t>(end + 1, width - 1);
      int32_t f = 0;
      h_b[0] = e_b[0] = h_b[edge] = e_b[edge] = h_c[0] = 0;
      int8_t* dline = &direction[(size_t)width_d * 3 * i];
      const int32_t off_i = std::max(0, i - band_width);
      const int32_t off_p = std::max(0, i - 1 - band_width);
      for (int32_t j = beg; j <= end; ++j) {
        u = j - off_i + 1;
        const int64_t eu = j - off_p + 1;
        const int64_t b = j - 1 - off_i + 1;
        const int64_t d = j - 1 - off_p + 1;
        const int64_t x3 = (int64_t)(j - off_i) * 3;
        int32_t t1 = (i == 0) ? -go : h_b[eu] - go;
        int32_t t2 = (i == 0) ? -ge : e_b[eu] - ge;
        const int32_t e_val = t1 > t2 ? t1 : t2;
        const int8_t e_dir = t1 > t2 ? 3 : 2;
        e_b[u] = e_val;
        dline[x3] = e_dir;

        t1 = h_c[b] - go;
        t2 = f - ge;
        f = t1 > t2 ? t1 : t2;
        const int8_t f_dir = t1 > t2 ? 5 : 4;
        dline[x3 + 1] = f_dir;

        const int32_t e1 = e_val > 0 ? e_val : 0;
        const int32_t f1 = f > 0 ? f : 0;
        t1 = e1 > f1 ? e1 : f1;
        t2 = h_b[d] + (ref[j] == q[i] ? mt : -mm);
        h_c[u] = t1 > t2 ? t1 : t2;
        if (h_c[u] > max_score) max_score = h_c[u];
        if (t1 <= t2) {
          dline[x3 + 2] = 1;
        } else {
          dline[x3 + 2] = e1 > f1 ? e_dir : f_dir;
        }
      }
      for (int64_t jj = 0; jj <= u; ++jj) h_b[jj] = h_c[jj];
    }
    if (max_score >= score) break;
    if ((int64_t)band_width * 2 > ref_len + read_len) return false;
    band_width *= 2;
  }
  const int64_t width_d = (int64_t)band_width * 2 + 1;
  out_ops->clear();
  int32_t i = read_len - 1, j = ref_len - 1;
  int32_t p = 2;  // 0=E, 1=F, 2=H
  while (i > 0 || j > 0) {
    const int64_t x = j - std::max(0, i - band_width);
    const int8_t dval = direction[(size_t)width_d * 3 * i + x * 3 + p];
    switch (dval) {
      case 1:
        out_ops->push_back('M');
        --i;
        --j;
        p = 2;
        break;
      case 2:
        out_ops->push_back('I');
        --i;
        p = 0;
        break;
      case 3:
        out_ops->push_back('I');
        --i;
        p = 2;
        break;
      case 4:
        out_ops->push_back('D');
        --j;
        p = 1;
        break;
      case 5:
        out_ops->push_back('D');
        --j;
        p = 2;
        break;
      default:
        return false;  // trace error (out of band)
    }
  }
  out_ops->push_back('M');  // cell (0, 0): the first aligned pair
  std::reverse(out_ops->begin(), out_ops->end());
  return true;
}

}  // namespace

extern "C" int dv_ssw_align(const char* ref, int32_t n, const char* query, int32_t m,
                 int32_t match, int32_t mismatch, int32_t gap_open,
                 int32_t gap_extend, int32_t* out_score,
                 int32_t* out_ref_begin, int32_t* out_ref_end,
                 int32_t* out_query_begin, int32_t* out_query_end,
                 char* cigar_buf, int32_t cigar_buf_size) {
  if (n <= 0 || m <= 0) return 1;
  // Phase 1: forward endpoint.
  int32_t best = 0, re_i = 0, re_j = 0;
  ssw_local_ends_fast(ref, n, query, m, match, mismatch, gap_open, gap_extend,
                 0, &best, &re_i, &re_j);
  if (best <= 0) return 1;
  // Phase 2: reverse begins (shortest span among co-optimal).
  std::vector<char> ref_rev(re_i), q_rev(re_j);
  for (int32_t i = 0; i < re_i; ++i) ref_rev[i] = ref[re_i - 1 - i];
  for (int32_t j = 0; j < re_j; ++j) q_rev[j] = query[re_j - 1 - j];
  int32_t rbest = 0, ri = 0, rj = 0;
  ssw_local_ends_fast(ref_rev.data(), re_i, q_rev.data(), re_j, match, mismatch,
                 gap_open, gap_extend, best, &rbest, &ri, &rj);
  if (rbest != best) return 1;  // defensive; cannot happen
  const int32_t ref_begin = re_i - ri;
  const int32_t query_begin = re_j - rj;
  // Phase 3: banded global cigar over the subsegment.
  std::vector<char> ops;
  if (!ssw_banded_ops(ref + ref_begin, re_i - ref_begin, query + query_begin,
                      re_j - query_begin, best, match, mismatch, gap_open,
                      gap_extend, &ops)) {
    return 1;
  }
  *out_score = best;
  *out_ref_begin = ref_begin;
  *out_ref_end = re_i;
  *out_query_begin = query_begin;
  *out_query_end = re_j;
  int len = 0;
  if (query_begin > 0) {
    len = cigar_append(cigar_buf, cigar_buf_size, len, query_begin, 'S');
    if (len < 0) return -1;
  }
  // Emit ops with '='/'X' substitution for 'M', run-length encoded.
  int32_t pi = query_begin, pj = ref_begin;
  size_t kidx = 0;
  while (kidx < ops.size()) {
    char op = ops[kidx];
    char emit;
    if (op == 'M') {
      emit = (ref[pj] == query[pi]) ? '=' : 'X';
    } else {
      emit = op;
    }
    int count = 0;
    while (kidx < ops.size()) {
      char cur = ops[kidx];
      char cur_emit;
      if (cur == 'M') {
        cur_emit = (ref[pj] == query[pi]) ? '=' : 'X';
      } else {
        cur_emit = cur;
      }
      if (cur_emit != emit) break;
      if (cur != 'D') ++pi;
      if (cur != 'I') ++pj;
      ++count;
      ++kidx;
    }
    len = cigar_append(cigar_buf, cigar_buf_size, len, count, emit);
    if (len < 0) return -1;
  }
  if (m - re_j > 0) {
    len = cigar_append(cigar_buf, cigar_buf_size, len, m - re_j, 'S');
    if (len < 0) return -1;
  }
  if (len < cigar_buf_size) cigar_buf[len] = '\0';
  return 0;
}


// Whole-read comparison for the fast pass (FastAlignStrings,
// fast_pass_aligner.cc:304-327): score = matches*match -
// mismatches*mismatch_pen, 0 when the mismatch cap is reached.
extern "C" int32_t dv_fast_align_strings(const char* s1, const char* s2,
                                         int32_t n, int32_t max_mismatches,
                                         int32_t match_score,
                                         int32_t mismatch_pen,
                                         int32_t* num_mismatches) {
  // SSE2 16-byte blocks: a pair mismatches iff bytes differ and
  // neither is 'N' (N pairs count as matches, as in the scalar spec
  // above). Early-exits per block once the cap is reached.
  int32_t mm = 0;
  const __m128i vN = _mm_set1_epi8('N');
  int32_t i = 0;
  for (; i + 16 <= n; i += 16) {
    const __m128i a =
        _mm_loadu_si128(reinterpret_cast<const __m128i*>(s1 + i));
    const __m128i b =
        _mm_loadu_si128(reinterpret_cast<const __m128i*>(s2 + i));
    const __m128i eq = _mm_cmpeq_epi8(a, b);
    const __m128i anyn = _mm_or_si128(_mm_cmpeq_epi8(a, vN),
                                      _mm_cmpeq_epi8(b, vN));
    const int bad = _mm_movemask_epi8(
        _mm_andnot_si128(_mm_or_si128(eq, anyn),
                         _mm_set1_epi8(static_cast<char>(0xFF))));
    if (bad) {
      mm += __builtin_popcount(static_cast<unsigned>(bad));
      if (mm >= max_mismatches) {
        // Replay the block scalar to report the exact capped count.
        mm -= __builtin_popcount(static_cast<unsigned>(bad));
        for (int32_t j = i; j < i + 16; ++j) {
          const char c1 = s1[j], c2 = s2[j];
          if (c1 != c2 && c1 != 'N' && c2 != 'N' &&
              ++mm == max_mismatches) {
            *num_mismatches = mm;
            return 0;
          }
        }
      }
    }
  }
  for (; i < n; ++i) {
    const char c1 = s1[i], c2 = s2[i];
    if (c1 != c2 && c1 != 'N' && c2 != 'N') {
      if (++mm == max_mismatches) {
        *num_mismatches = mm;
        return 0;
      }
    }
  }
  *num_mismatches = mm;
  return (n - mm) * match_score - mm * mismatch_pen;
}

// ---------------------------------------------------------------------------
// Full fast-pass read-to-haplotype alignment
// (FastAlignReadsToHaplotypes, fast_pass_aligner.cc:202-301).
//
// Builds a 2-bit-packed k-mer index over the reads, then for each haplotype
// scans its k-mers, extends hits to whole-read comparisons with a mismatch
// cap, and records best score/position per (haplotype, read). Iteration
// order matches the Python implementation exactly (reads in order, positions
// ascending), so results are identical whenever all sequences are ACGT-only
// (callers fall back to Python otherwise).
// ---------------------------------------------------------------------------

#include <unordered_map>

namespace {

struct KmerHit {
  int32_t read_id;
  int32_t read_pos;
};

inline bool pack_kmer(const char* s, int k, uint64_t* out) {
  uint64_t v = 0;
  for (int i = 0; i < k; ++i) {
    uint64_t code;
    switch (s[i]) {
      case 'A': code = 0; break;
      case 'C': code = 1; break;
      case 'G': code = 2; break;
      case 'T': code = 3; break;
      default: return false;
    }
    v = (v << 2) | code;
  }
  *out = v;
  return true;
}

}  // namespace

extern "C" int dv_fast_pass_align(
    const char* reads_buf, const int32_t* read_offsets, int32_t n_reads,
    const char* hap_buf, const int32_t* hap_offsets, int32_t n_haps,
    int32_t ref_hap_index, int32_t k, int32_t max_mm, int32_t match_score,
    int32_t mismatch_pen, int32_t ref_prefix_len, int32_t ref_suffix_len,
    int32_t* out_scores, int32_t* out_positions,
    int32_t* out_hap_scores) {
  if (k < 3 || k > 32) return -1;
  // Build the read k-mer index as a flat open-addressing table with
  // order-preserving chains (head/tail + next array): zero per-insert
  // allocation, and hits iterate in exactly the insertion order the
  // unordered_map<.., vector> formulation produced (reads ascending,
  // positions ascending), which pins tie-break winners.
  const int64_t total_cap = read_offsets[n_reads];
  std::vector<uint64_t> ent_key(static_cast<size_t>(total_cap));
  std::vector<KmerHit> ent_hit(static_cast<size_t>(total_cap));
  std::vector<int32_t> ent_next(static_cast<size_t>(total_cap), -1);
  int32_t n_ent = 0;
  size_t table_size = 64;
  while (table_size < static_cast<size_t>(total_cap) * 2) {
    table_size <<= 1;
  }
  const size_t table_mask = table_size - 1;
  struct Slot { uint64_t key; int32_t head, tail; };
  std::vector<Slot> table(table_size, Slot{0, -1, -1});
  auto hash_key = [](uint64_t key) -> size_t {
    key ^= key >> 33;
    key *= 0xff51afd7ed558ccdULL;
    key ^= key >> 33;
    return static_cast<size_t>(key);
  };
  for (int32_t r = 0; r < n_reads; ++r) {
    const char* read = reads_buf + read_offsets[r];
    int32_t len = read_offsets[r + 1] - read_offsets[r];
    if (len <= k) continue;
    // Rolling 2-bit pack: restart after any non-ACGT base.
    const uint64_t mask_k =
        (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
    uint64_t roll = 0;
    int32_t run = 0;
    for (int32_t i = 0; i < len; ++i) {
      uint64_t code;
      switch (read[i]) {
        case 'A': code = 0; break;
        case 'C': code = 1; break;
        case 'G': code = 2; break;
        case 'T': code = 3; break;
        default: run = 0; roll = 0; continue;
      }
      roll = ((roll << 2) | code) & mask_k;
      if (++run < k) continue;
      const uint64_t key = roll;
      size_t slot = hash_key(key) & table_mask;
      while (table[slot].head >= 0 && table[slot].key != key) {
        slot = (slot + 1) & table_mask;
      }
      const int32_t e = n_ent++;
      ent_key[e] = key;
      ent_hit[e] = {r, i - k + 1};
      if (table[slot].head < 0) {
        table[slot].key = key;
        table[slot].head = e;
      } else {
        ent_next[table[slot].tail] = e;
      }
      table[slot].tail = e;
    }
  }
  // No coverage-based haplotype discard: the reference's current code
  // gates haplotypes on fast-aligned read coverage
  // (fast_pass_aligner.cc:293-299) but its own goldens contradict the
  // gate (see fast_pass_aligner.py _fast_align_reads_to_haplotype).
  (void)ref_hap_index;
  (void)ref_prefix_len;
  (void)ref_suffix_len;
  for (int32_t h = 0; h < n_haps; ++h) {
    const char* hap = hap_buf + hap_offsets[h];
    const int32_t hap_len = hap_offsets[h + 1] - hap_offsets[h];
    int32_t* scores = out_scores + (size_t)h * n_reads;
    int32_t* positions = out_positions + (size_t)h * n_reads;
    for (int32_t r = 0; r < n_reads; ++r) {
      scores[r] = 0;
      positions[r] = -1;
    }
    int64_t hap_score = 0;
    const uint64_t mask_k = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
    uint64_t roll = 0;
    int32_t run = 0;
    for (int32_t i = 0; i < hap_len; ++i) {
      uint64_t code;
      switch (hap[i]) {
        case 'A': code = 0; break;
        case 'C': code = 1; break;
        case 'G': code = 2; break;
        case 'T': code = 3; break;
        default: run = 0; roll = 0; continue;
      }
      roll = ((roll << 2) | code) & mask_k;
      if (++run < k) continue;
      const uint64_t key = roll;
      const int32_t kstart = i - k + 1;
      size_t slot = hash_key(key) & table_mask;
      while (table[slot].head >= 0 && table[slot].key != key) {
        slot = (slot + 1) & table_mask;
      }
      if (table[slot].head < 0) continue;
      for (int32_t e = table[slot].head; e >= 0; e = ent_next[e]) {
        const KmerHit& hit = ent_hit[e];
        int32_t target_start = kstart - hit.read_pos;
        if (target_start < 0) target_start = 0;
        const char* read = reads_buf + read_offsets[hit.read_id];
        int32_t span = read_offsets[hit.read_id + 1] -
                       read_offsets[hit.read_id];
        if (target_start + span > hap_len) continue;
        if (positions[hit.read_id] == target_start) continue;
        int32_t mm = 0;
        int32_t score = dv_fast_align_strings(
            hap + target_start, read, span, max_mm + 1, match_score,
            mismatch_pen, &mm);
        if (mm <= max_mm) {
          if (scores[hit.read_id] < score) {
            hap_score += score - scores[hit.read_id];
            scores[hit.read_id] = score;
            positions[hit.read_id] = target_start;
          }
        }
      }
    }
    out_hap_scores[h] = (int32_t)hap_score;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// CRAM rANS 4x8 decoder (hts-specs CRAMv3 section 13): order-0 and
// order-1, 12-bit normalized frequencies, 4 interleaved states.
// Mirrors deepvariant_tpu/io/cram.py rans_decode (the Python fallback).
// ---------------------------------------------------------------------------

namespace {

constexpr uint32_t kTfShift = 12;
constexpr uint32_t kTotFreq = 1u << kTfShift;
constexpr uint32_t kRansLow = 1u << 23;

// itf8 read; returns value, advances *pos. Bounds are the caller's duty.
static inline int64_t rans_itf8(const uint8_t* buf, int64_t* pos) {
  uint8_t b0 = buf[(*pos)++];
  if (b0 < 0x80) return b0;
  if (b0 < 0xC0) {
    int64_t v = ((int64_t)(b0 & 0x7F) << 8) | buf[(*pos)];
    *pos += 1;
    return v;
  }
  if (b0 < 0xE0) {
    int64_t v = ((int64_t)(b0 & 0x3F) << 16) | ((int64_t)buf[*pos] << 8) |
                buf[*pos + 1];
    *pos += 2;
    return v;
  }
  if (b0 < 0xF0) {
    int64_t v = ((int64_t)(b0 & 0x1F) << 24) | ((int64_t)buf[*pos] << 16) |
                ((int64_t)buf[*pos + 1] << 8) | buf[*pos + 2];
    *pos += 3;
    return v;
  }
  int64_t v = ((int64_t)(b0 & 0x0F) << 28) | ((int64_t)buf[*pos] << 20) |
              ((int64_t)buf[*pos + 1] << 12) |
              ((int64_t)buf[*pos + 2] << 4) | (buf[*pos + 3] & 0x0F);
  *pos += 4;
  return v;
}

// Order-0 frequency table (RLE symbol list) -> freq/cum arrays.
static void rans_read_freqs0(const uint8_t* buf, int64_t* pos,
                             uint32_t freq[256], uint32_t cum[257]) {
  for (int i = 0; i < 256; ++i) freq[i] = 0;
  int sym = buf[(*pos)++];
  int last = sym;
  int rle = 0;
  for (;;) {
    freq[sym] = (uint32_t)rans_itf8(buf, pos);
    if (rle > 0) {
      --rle;
      ++sym;
    } else {
      sym = buf[(*pos)++];
      if (sym == last + 1) rle = buf[(*pos)++];
      last = sym;
    }
    if (sym == 0 && rle == 0) break;
  }
  cum[0] = 0;
  for (int i = 0; i < 256; ++i) cum[i + 1] = cum[i] + freq[i];
}

}  // namespace

// Decode one rANS 4x8 block (starting at the order byte). Returns the
// number of output bytes, or -1 on error. out must hold the block's
// declared uncompressed size.
extern "C" int64_t dv_rans_decode(const uint8_t* buf, int64_t buf_len,
                                  uint8_t* out, int64_t out_cap) {
  if (buf_len < 9) return -1;
  int order = buf[0];
  uint32_t comp_size, out_size;
  memcpy(&comp_size, buf + 1, 4);
  memcpy(&out_size, buf + 5, 4);
  if (out_size == 0) return 0;
  if ((int64_t)out_size > out_cap) return -1;
  const uint8_t* p = buf + 9;
  int64_t n = comp_size;
  if (9 + n > buf_len) n = buf_len - 9;
  int64_t pos = 0;

  if (order == 0) {
    uint32_t freq[256], cum[257];
    rans_read_freqs0(p, &pos, freq, cum);
    static thread_local uint8_t lookup0[kTotFreq];
    for (int s = 0; s < 256; ++s)
      for (uint32_t k = cum[s]; k < cum[s + 1] && k < kTotFreq; ++k)
        lookup0[k] = (uint8_t)s;
    uint32_t st[4];
    memcpy(st, p + pos, 16);
    pos += 16;
    for (uint32_t i = 0; i < out_size; ++i) {
      int j = i & 3;
      uint32_t x = st[j];
      uint32_t slot = x & (kTotFreq - 1);
      uint8_t s = lookup0[slot];
      out[i] = s;
      x = freq[s] * (x >> kTfShift) + slot - cum[s];
      while (x < kRansLow && pos < n) x = (x << 8) | p[pos++];
      st[j] = x;
    }
    return out_size;
  }

  if (order == 1) {
    // Per-context tables; heap-allocate the 256x4096 lookup.
    static thread_local uint32_t freq[256][256];
    static thread_local uint32_t cum[256][257];
    static thread_local uint8_t lookup[256][kTotFreq];
    for (int c = 0; c < 256; ++c) {
      for (int s = 0; s < 256; ++s) freq[c][s] = 0;
    }
    int ctx = p[pos++];
    int last_ctx = ctx;
    int rle_ctx = 0;
    for (;;) {
      rans_read_freqs0(p, &pos, freq[ctx], cum[ctx]);
      for (int s = 0; s < 256; ++s)
        for (uint32_t k = cum[ctx][s];
             k < cum[ctx][s + 1] && k < kTotFreq; ++k)
          lookup[ctx][k] = (uint8_t)s;
      if (rle_ctx > 0) {
        --rle_ctx;
        ++ctx;
      } else {
        ctx = p[pos++];
        if (ctx == last_ctx + 1) rle_ctx = p[pos++];
        last_ctx = ctx;
      }
      if (ctx == 0 && rle_ctx == 0) break;
    }
    uint32_t st[4];
    memcpy(st, p + pos, 16);
    pos += 16;
    int64_t q = out_size >> 2;
    int64_t idx[4] = {0, q, 2 * q, 3 * q};
    int64_t end[4] = {q, 2 * q, 3 * q, (int64_t)out_size};
    int ctxs[4] = {0, 0, 0, 0};
    for (int64_t step = 0; step < q; ++step) {
      for (int j = 0; j < 4; ++j) {
        int64_t i = idx[j];
        if (i >= end[j]) continue;
        uint32_t x = st[j];
        int c = ctxs[j];
        uint32_t slot = x & (kTotFreq - 1);
        uint8_t s = lookup[c][slot];
        out[i] = s;
        x = freq[c][s] * (x >> kTfShift) + slot - cum[c][s];
        while (x < kRansLow && pos < n) x = (x << 8) | p[pos++];
        st[j] = x;
        ctxs[j] = s;
        idx[j] = i + 1;
      }
    }
    while (idx[3] < end[3]) {
      int64_t i = idx[3];
      uint32_t x = st[3];
      int c = ctxs[3];
      uint32_t slot = x & (kTotFreq - 1);
      uint8_t s = lookup[c][slot];
      out[i] = s;
      x = freq[c][s] * (x >> kTfShift) + slot - cum[c][s];
      while (x < kRansLow && pos < n) x = (x << 8) | p[pos++];
      st[3] = x;
      ctxs[3] = s;
      idx[3] = i + 1;
    }
    return out_size;
  }
  return -1;
}

// ---------------------------------------------------------------------------
// Pileup row downsampling shuffle.
//
// The crowded-window read downsample is a std::shuffle of read indices
// with std::mt19937_64 seeded from the pileup options' random_seed
// (DownsampleReadIndices, pileup_image_native.cc:153-165). std::shuffle's
// index distribution is implementation-defined, and the goldens pin the
// LIBC++ algorithm (DeepVariant release builds use clang/libc++; verified
// against golden_child.calling_examples crowded parent bands): a forward
// Fisher-Yates where each bounded draw masks the engine output to
// ceil(log2(range)) bits and rejects values >= range
// (libc++ uniform_int_distribution over a 64-bit engine).
// ---------------------------------------------------------------------------
#include <algorithm>
#include <numeric>
#include <random>

static uint64_t dv_bounded_draw(std::mt19937_64& g, uint64_t range) {
  if (range == 1) return 0;
  int w = 64 - __builtin_clzll(range) - 1;
  if ((range & (UINT64_MAX >> (64 - w))) != 0) ++w;
  const uint64_t mask = (w >= 64) ? UINT64_MAX : ((1ULL << w) - 1);
  uint64_t u;
  do {
    u = g() & mask;
  } while (u >= range);
  return u;
}

extern "C" void dv_shuffle_indices(int32_t n, uint64_t seed, int32_t* out) {
  std::vector<int32_t> idx(n);
  std::iota(idx.begin(), idx.end(), 0);
  std::mt19937_64 g(seed);
  if (n > 1) {
    int64_t d = n - 1;
    for (int32_t first = 0; first < n - 1; ++first, --d) {
      const int64_t i = (int64_t)dv_bounded_draw(g, (uint64_t)d + 1);
      if (i != 0) std::swap(idx[first], idx[first + i]);
    }
  }
  std::copy(idx.begin(), idx.end(), out);
}

// ---------------------------------------------------------------------------
// Striped Smith-Waterman scores (Farrar 2007), batch interface.
//
// The realigner's SSW fallback evaluates every unaligned read against
// every supported haplotype, but only each read's best-scoring
// haplotype alignment is ever projected back to the reference
// (GetBestReadAlignment). So the hot loop only needs SCORES; the full
// scalar DP with traceback runs once per read on the winner. This
// kernel computes local-alignment scores for a batch of reads against
// one haplotype with 8-lane u16 SSE2 striping (affine gaps costing
// gap_open for the first base and gap_extend per further base, the
// DeepVariant/libssw convention).
// ---------------------------------------------------------------------------
#include <emmintrin.h>
#include <smmintrin.h>
#include <cstring>

extern "C" void dv_ssw_score_batch(
    const char* ref, int32_t ref_len,
    const char* reads_concat, const int32_t* read_offsets,
    int32_t n_reads,
    int32_t match, int32_t mismatch, int32_t gap_open,
    int32_t gap_extend,
    int32_t* out_scores) {
  const int bias = mismatch;  // profile values shifted non-negative
  for (int r = 0; r < n_reads; ++r) {
    const char* q = reads_concat + read_offsets[r];
    const int m = read_offsets[r + 1] - read_offsets[r];
    if (m == 0) { out_scores[r] = 0; continue; }
    const int seg = (m + 7) / 8;
    // Build the striped query profile for A/C/G/T/other.
    std::vector<__m128i> prof(5 * seg);
    auto code = [](char c) -> int {
      switch (c) {
        case 'A': return 0; case 'C': return 1;
        case 'G': return 2; case 'T': return 3;
        default: return 4;
      }
    };
    {
      int16_t tmp[8];
      for (int a = 0; a < 5; ++a) {
        for (int i = 0; i < seg; ++i) {
          for (int j = 0; j < 8; ++j) {
            int idx = i + j * seg;
            int v = 0;
            if (idx < m) {
              int qa = code(q[idx]);
              // 'N'/other never matches (FastAlign treats N as
              // wildcard, but SSW scores it as mismatch like libssw).
              v = (a == qa && a != 4) ? match + bias : -mismatch + bias;
            }
            tmp[j] = static_cast<int16_t>(v);
          }
          prof[a * seg + i] =
              _mm_loadu_si128(reinterpret_cast<__m128i*>(tmp));
        }
      }
    }
    std::vector<__m128i> H(seg), E(seg), Hstore(seg);
    const __m128i vZero = _mm_setzero_si128();
    for (int i = 0; i < seg; ++i) { H[i] = vZero; E[i] = vZero; }
    const __m128i vBias = _mm_set1_epi16(static_cast<int16_t>(bias));
    const __m128i vGapO = _mm_set1_epi16(static_cast<int16_t>(gap_open));
    const __m128i vGapE =
        _mm_set1_epi16(static_cast<int16_t>(gap_extend));
    __m128i vMax = vZero;

    for (int j = 0; j < ref_len; ++j) {
      const __m128i* P = &prof[code(ref[j]) * seg];
      __m128i vF = vZero;
      // H[seg-1] shifted one lane left (u16) = H(i-1, j-1) feed.
      __m128i vH = _mm_slli_si128(H[seg - 1], 2);
      for (int i = 0; i < seg; ++i) {
        vH = _mm_adds_epu16(vH, P[i]);
        vH = _mm_subs_epu16(vH, vBias);
        vH = _mm_max_epu16(vH, E[i]);
        vH = _mm_max_epu16(vH, vF);
        vMax = _mm_max_epu16(vMax, vH);
        Hstore[i] = vH;
        const __m128i vHgo = _mm_subs_epu16(vH, vGapO);
        E[i] = _mm_max_epu16(_mm_subs_epu16(E[i], vGapE), vHgo);
        vF = _mm_max_epu16(_mm_subs_epu16(vF, vGapE), vHgo);
        vH = H[i];
      }
      // Lazy-F correction (Farrar): propagate F across segment wrap.
      for (int k = 0; k < 8; ++k) {
        vF = _mm_slli_si128(vF, 2);
        bool any = false;
        for (int i = 0; i < seg; ++i) {
          const __m128i vHf = _mm_max_epu16(Hstore[i], vF);
          const __m128i neq = _mm_cmpeq_epi16(vHf, Hstore[i]);
          if (_mm_movemask_epi8(neq) != 0xFFFF) any = true;
          Hstore[i] = vHf;
          vMax = _mm_max_epu16(vMax, vHf);
          vF = _mm_max_epu16(
              _mm_subs_epu16(vF, vGapE),
              _mm_subs_epu16(_mm_subs_epu16(vHf, vGapO), vZero));
          vF = _mm_subs_epu16(vF, vZero);
        }
        if (!any) break;
      }
      std::swap(H, Hstore);
    }
    int best = 0;
    alignas(16) int16_t lanes[8];
    _mm_storeu_si128(reinterpret_cast<__m128i*>(lanes), vMax);
    for (int j = 0; j < 8; ++j) {
      best = std::max(best, static_cast<int>(
          static_cast<uint16_t>(lanes[j])));
    }
    out_scores[r] = best;
  }
}

// ---------------------------------------------------------------------------
// De Bruijn window assembler (debruijn_graph.py's exact semantics,
// natively): k-scan from the first repeat-free reference k, graph over
// reference + high-quality read k-mer runs, cycle check, weak-edge +
// unreachable-vertex pruning, source->sink path enumeration capped at
// max_num_paths, haplotypes returned lexicographically sorted.
// ---------------------------------------------------------------------------
#include <string_view>
#include <unordered_map>
#include <unordered_set>
#include <deque>
#include <array>

namespace {

struct DbgGraph {
  // vertex ids in insertion order; adjacency as vectors of ids.
  // Two id-lookup modes: a packed-u64 open-addressing table when
  // k <= 32 and every inserted k-mer is ACGT-only (the common case —
  // read k-mer runs are canonical by construction; the caller checks
  // the reference), else the generic string_view hash map. `kmers`
  // stays string_view either way, so haplotype reconstruction and the
  // topology code below are mode-blind.
  std::unordered_map<std::string_view, int32_t> ids;
  std::vector<std::string_view> kmers;
  std::vector<std::vector<int32_t>> succ, pred;
  // edge (u,v) -> [weight, is_ref]
  std::unordered_map<int64_t, std::pair<int32_t, bool>> edges;
  int32_t k = 0;
  bool packed = false;
  std::vector<uint64_t> tkeys;
  std::vector<int32_t> tvals;
  size_t tmask = 0;

  void reserve_packed(size_t expected_kmers) {
    packed = true;
    size_t size = 64;
    while (size < expected_kmers * 2) size <<= 1;
    tmask = size - 1;
    tkeys.assign(size, 0);
    tvals.assign(size, -1);
    kmers.reserve(expected_kmers);
  }

  static size_t hash_u64(uint64_t key) {
    key ^= key >> 33;
    key *= 0xff51afd7ed558ccdULL;
    key ^= key >> 33;
    return static_cast<size_t>(key);
  }

  int32_t ensure_pk(uint64_t key, std::string_view km) {
    size_t slot = hash_u64(key) & tmask;
    while (tvals[slot] >= 0 && tkeys[slot] != key) {
      slot = (slot + 1) & tmask;
    }
    if (tvals[slot] >= 0) return tvals[slot];
    int32_t id = static_cast<int32_t>(kmers.size());
    tkeys[slot] = key;
    tvals[slot] = id;
    kmers.push_back(km);
    succ.emplace_back();
    pred.emplace_back();
    return id;
  }

  // Rolling-packed variant of add_kmers; bases[start..end+k) must be
  // ACGT-only (callers pass canonical runs).
  void add_kmers_packed(std::string_view bases, int32_t start,
                        int32_t end, bool is_ref) {
    if (end <= 0 || end < start) return;
    const uint64_t mask_k =
        (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
    auto code2 = [](char c) -> uint64_t {
      switch (c) {
        case 'A': return 0; case 'C': return 1;
        case 'G': return 2; default: return 3;
      }
    };
    uint64_t roll = 0;
    for (int32_t i = start; i < start + k; ++i) {
      roll = (roll << 2) | code2(bases[i]);
    }
    int32_t prev = ensure_pk(roll, bases.substr(start, k));
    for (int32_t i = start + 1; i <= end; ++i) {
      roll = ((roll << 2) | code2(bases[i + k - 1])) & mask_k;
      int32_t cur = ensure_pk(roll, bases.substr(i, k));
      add_edge(prev, cur, is_ref);
      prev = cur;
    }
  }

  int32_t ensure(std::string_view km) {
    auto it = ids.find(km);
    if (it != ids.end()) return it->second;
    int32_t id = static_cast<int32_t>(kmers.size());
    ids.emplace(km, id);
    kmers.push_back(km);
    succ.emplace_back();
    pred.emplace_back();
    return id;
  }

  static int64_t ekey(int32_t u, int32_t v) {
    return (static_cast<int64_t>(u) << 32) | static_cast<uint32_t>(v);
  }

  void add_edge(int32_t u, int32_t v, bool is_ref) {
    auto it = edges.find(ekey(u, v));
    if (it == edges.end()) {
      edges.emplace(ekey(u, v), std::make_pair(1, is_ref));
      succ[u].push_back(v);
      pred[v].push_back(u);
    } else {
      it->second.first += 1;
      it->second.second = it->second.second || is_ref;
    }
  }

  void add_kmers(std::string_view bases, int32_t start, int32_t end,
                 bool is_ref) {
    if (end <= 0) return;
    int32_t prev = ensure(bases.substr(start, k));
    for (int32_t i = start + 1; i <= end; ++i) {
      int32_t cur = ensure(bases.substr(i, k));
      add_edge(prev, cur, is_ref);
      prev = cur;
    }
  }

  bool has_cycle() const {
    std::vector<uint8_t> color(kmers.size(), 0);  // 0 white 1 gray 2 black
    std::vector<std::pair<int32_t, size_t>> stack;
    for (size_t root = 0; root < kmers.size(); ++root) {
      if (color[root]) continue;
      color[root] = 1;
      stack.clear();
      stack.emplace_back(static_cast<int32_t>(root), 0);
      while (!stack.empty()) {
        auto& [node, idx] = stack.back();
        if (idx < succ[node].size()) {
          int32_t nxt = succ[node][idx++];
          if (color[nxt] == 1) return true;
          if (color[nxt] == 0) {
            color[nxt] = 1;
            stack.emplace_back(nxt, 0);
          }
        } else {
          color[node] = 2;
          stack.pop_back();
        }
      }
    }
    return false;
  }

  void prune(int32_t min_edge_weight, int32_t source, int32_t sink) {
    // Weak non-ref edges out.
    for (size_t u = 0; u < succ.size(); ++u) {
      auto& out = succ[u];
      out.erase(std::remove_if(out.begin(), out.end(), [&](int32_t v) {
        auto it = edges.find(ekey(static_cast<int32_t>(u), v));
        if (it == edges.end()) return true;
        if (!it->second.second &&
            it->second.first < min_edge_weight) {
          edges.erase(it);
          auto& pv = pred[v];
          pv.erase(std::remove(pv.begin(), pv.end(),
                               static_cast<int32_t>(u)), pv.end());
          return true;
        }
        return false;
      }), out.end());
    }
    // Keep only vertices on some source->sink path.
    auto reach = [&](int32_t start,
                     const std::vector<std::vector<int32_t>>& adj) {
      std::vector<uint8_t> seen(kmers.size(), 0);
      std::deque<int32_t> dq{start};
      seen[start] = 1;
      while (!dq.empty()) {
        int32_t n = dq.front(); dq.pop_front();
        for (int32_t nx : adj[n]) if (!seen[nx]) {
          seen[nx] = 1; dq.push_back(nx);
        }
      }
      return seen;
    };
    auto fwd = reach(source, succ);
    auto rev = reach(sink, pred);
    for (size_t v = 0; v < kmers.size(); ++v) {
      if (!(fwd[v] && rev[v])) {
        for (int32_t u : pred[v]) {
          auto& out = succ[u];
          out.erase(std::remove(out.begin(), out.end(),
                                static_cast<int32_t>(v)), out.end());
          edges.erase(ekey(u, static_cast<int32_t>(v)));
        }
        for (int32_t w : succ[v]) {
          auto& in = pred[w];
          in.erase(std::remove(in.begin(), in.end(),
                               static_cast<int32_t>(v)), in.end());
          edges.erase(ekey(static_cast<int32_t>(v), w));
        }
        pred[v].clear();
        succ[v].clear();
      }
    }
  }
};

}  // namespace

extern "C" int32_t dv_dbg_haplotypes(
    const char* ref_in, int32_t ref_len,
    const char* reads_concat, const int32_t* read_offsets,
    int32_t n_reads,
    const uint8_t* quals_concat, const int32_t* mapqs,
    int32_t min_k, int32_t max_k, int32_t step_k,
    int32_t min_mapq, int32_t min_base_quality,
    int32_t min_edge_weight, int32_t max_num_paths,
    int32_t disable_pruning,
    char* out_buf, int64_t out_cap, int64_t* out_len) {
  *out_len = 0;
  std::string ref(ref_in, ref_len);
  for (auto& c : ref) c = static_cast<char>(toupper(c));
  auto canonical = [](char c) {
    return c == 'A' || c == 'C' || c == 'G' || c == 'T';
  };
  // k_min_max_from_reference.
  int32_t hi_k = std::min(max_k, ref_len - 1);
  int32_t lo_k = -1;
  for (int32_t k = min_k; k <= hi_k; k += step_k) {
    std::unordered_set<std::string_view> seen;
    seen.reserve(ref_len);
    bool repeat = false;
    std::string_view rv(ref);
    for (int32_t i = 0; i + k <= ref_len; ++i) {
      if (!seen.insert(rv.substr(i, k)).second) { repeat = true; break; }
    }
    if (!repeat) { lo_k = k; break; }
  }
  if (lo_k < 0) return -1;

  // Uppercased read copies (kept alive for the string_view keys).
  std::vector<std::string> reads_up;
  reads_up.reserve(n_reads);
  for (int32_t r = 0; r < n_reads; ++r) {
    reads_up.emplace_back(reads_concat + read_offsets[r],
                          read_offsets[r + 1] - read_offsets[r]);
    for (auto& c : reads_up.back()) c = static_cast<char>(toupper(c));
  }

  const bool ref_clean = std::all_of(
      ref.begin(), ref.end(),
      [&](char c) { return canonical(c); });
  int64_t total_read_len = read_offsets[n_reads];
  for (int32_t k = lo_k; k <= hi_k; k += step_k) {
    DbgGraph g;
    g.k = k;
    const bool use_packed = ref_clean && k <= 32;
    if (use_packed) {
      g.reserve_packed(
          static_cast<size_t>(ref_len) + total_read_len);
      g.add_kmers_packed(ref, 0, ref_len - k, true);
    } else {
      g.add_kmers(ref, 0, ref_len - k, true);
    }
    std::string_view rv(ref);
    int32_t source, sink;
    if (use_packed) {
      // Both substrings are already vertices (added by the ref pass).
      uint64_t key0 = 0, key1 = 0;
      for (int32_t i = 0; i < k; ++i) {
        auto c2 = [&](char c) -> uint64_t {
          switch (c) {
            case 'A': return 0; case 'C': return 1;
            case 'G': return 2; default: return 3;
          }
        };
        key0 = (key0 << 2) | c2(ref[i]);
        key1 = (key1 << 2) | c2(ref[ref_len - k + i]);
      }
      source = g.ensure_pk(key0, rv.substr(0, k));
      sink = g.ensure_pk(key1, rv.substr(ref_len - k, k));
    } else {
      source = g.ensure(rv.substr(0, k));
      sink = g.ensure(rv.substr(ref_len - k, k));
    }
    for (int32_t r = 0; r < n_reads; ++r) {
      if (mapqs[r] < min_mapq) continue;
      const std::string& bases = reads_up[r];
      const uint8_t* quals = quals_concat + read_offsets[r];
      int32_t n = static_cast<int32_t>(bases.size());
      int32_t stop = n - k;
      int32_t i = 0;
      while (i < stop) {
        int32_t bad = i;
        while (bad < n && canonical(bases[bad]) &&
               quals[bad] >= min_base_quality) ++bad;
        if (use_packed) {
          g.add_kmers_packed(bases, i, bad - k, false);
        } else {
          g.add_kmers(bases, i, bad - k, false);
        }
        i = bad + 1;
      }
    }
    if (g.has_cycle()) continue;
    if (disable_pruning) {
      // prune_lite: isolated vertices are irrelevant to paths; no-op
      // for enumeration.
    } else {
      g.prune(min_edge_weight, source, sink);
    }
    // Path enumeration (BFS with cap; terminated paths end at the sink
    // or any dead end).
    std::vector<std::vector<int32_t>> terminated;
    std::deque<std::vector<int32_t>> extendable;
    if (g.succ[source].empty()) {
      return 0;  // graph exists, no haplotypes
    }
    extendable.push_back({source});
    while (!extendable.empty()) {
      if (static_cast<int32_t>(terminated.size() + extendable.size()) >
          max_num_paths) {
        return 0;
      }
      std::vector<int32_t> path = std::move(extendable.front());
      extendable.pop_front();
      int32_t last = path.back();
      for (int32_t nxt : g.succ[last]) {
        std::vector<int32_t> ext = path;
        ext.push_back(nxt);
        if (nxt == sink || g.succ[nxt].empty()) {
          terminated.push_back(std::move(ext));
        } else {
          extendable.push_back(std::move(ext));
        }
      }
    }
    std::vector<std::string> haps;
    haps.reserve(terminated.size());
    for (const auto& path : terminated) {
      std::string h;
      h.reserve(path.size() + k);
      for (int32_t v : path) h.push_back(g.kmers[v][0]);
      h.append(g.kmers[path.back()].substr(1));
      haps.push_back(std::move(h));
    }
    std::sort(haps.begin(), haps.end());
    int64_t need = 0;
    for (const auto& h : haps) need += h.size() + 1;
    if (need > out_cap) return -2;  // caller retries with bigger buffer
    char* p = out_buf;
    for (const auto& h : haps) {
      memcpy(p, h.data(), h.size());
      p += h.size();
      *p++ = '\n';
    }
    *out_len = need;
    return static_cast<int32_t>(haps.size());
  }
  return -1;
}

// ---------------------------------------------------------------------------
// BAM record scan: decompressed-record-buffer -> structure-of-arrays.
//
// Replaces the Python per-record parse loop in BamReader._scan_records
// (htslib's sam_read1 analog). Two passes over the chunk buffer: count
// (dv_bam_scan_count) sizes the output arrays, fill (dv_bam_scan_fill)
// writes them. Filtering mirrors ReadRequirements: records matching
// drop_flag_mask or below min_mapq are skipped; with a ref_id filter
// the scan stops at the first record past `end` (BAI chunk semantics)
// and skips reads whose reference span ends at or before `beg`.
// ---------------------------------------------------------------------------
namespace {

const char kSeqLut[17] = "=ACMGRSVTWYHKDBN";

struct BamRec {
  int32_t rid, pos, l_seq, next_rid, next_pos, tlen;
  uint32_t flag;
  int32_t mapq, l_read_name, n_cigar;
  const uint8_t* name;
  const uint8_t* cigar;
  const uint8_t* seq;
  const uint8_t* qual;
  const uint8_t* aux;
  int64_t aux_len;
};

// Parses the record at p (block_size already read); returns ref span.
inline int64_t bam_ref_span(const uint8_t* cigar, int32_t n_cigar) {
  // BAM op codes: M=0 I D N S H P = X; ref-consuming: M D N = X.
  int64_t span = 0;
  for (int32_t i = 0; i < n_cigar; ++i) {
    uint32_t u;
    memcpy(&u, cigar + 4 * i, 4);
    uint32_t op = u & 0xF;
    if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
      span += u >> 4;
  }
  return span;
}

template <typename Emit>
int64_t bam_scan(const uint8_t* buf, int64_t buf_len,
                 int64_t stop_offset, int32_t ref_id,
                 int32_t beg, int32_t end, uint32_t drop_flag_mask,
                 int32_t min_mapq, Emit&& emit,
                 int64_t* truncated = nullptr) {
  int64_t p = 0;
  int64_t n = 0;
  if (truncated) *truncated = 0;
  // Records STARTING at or past stop_offset belong to the next BAI
  // chunk (python's stop_vo rule) — without this, the decode tail
  // would double-count reads on long-read BAMs.
  while (p + 4 <= buf_len && p < stop_offset) {
    int32_t block_size;
    memcpy(&block_size, buf + p, 4);
    if (block_size < 32 || p + 4 + block_size > buf_len) {
      // A record header that extends beyond the buffer: the caller's
      // decompressed span ended mid-record (possible with very long
      // reads) — report so it can retry with a larger tail margin.
      if (truncated && block_size >= 32 &&
          p + 4 + block_size > buf_len) {
        *truncated = 1;
      }
      break;
    }
    const uint8_t* rec = buf + p + 4;
    p += 4 + block_size;
    BamRec r;
    memcpy(&r.rid, rec, 4);
    memcpy(&r.pos, rec + 4, 4);
    uint32_t lrn_mq_bin, flag_nc;
    memcpy(&lrn_mq_bin, rec + 8, 4);
    memcpy(&flag_nc, rec + 12, 4);
    memcpy(&r.l_seq, rec + 16, 4);
    memcpy(&r.next_rid, rec + 20, 4);
    memcpy(&r.next_pos, rec + 24, 4);
    memcpy(&r.tlen, rec + 28, 4);
    r.l_read_name = lrn_mq_bin & 0xFF;
    r.mapq = (lrn_mq_bin >> 8) & 0xFF;
    r.n_cigar = flag_nc & 0xFFFF;
    r.flag = (flag_nc >> 16) & 0xFFFF;
    if (ref_id >= 0) {
      if (r.rid != ref_id) {
        if (r.rid > ref_id || r.rid < 0) break;
        continue;
      }
      if (r.pos >= end) break;
    }
    if ((r.flag & drop_flag_mask) != 0) continue;
    if (r.mapq < min_mapq) continue;
    const uint8_t* q = rec + 32;
    r.name = q;
    q += r.l_read_name;
    r.cigar = q;
    q += 4 * r.n_cigar;
    if (ref_id >= 0 && r.n_cigar) {
      if (r.pos + bam_ref_span(r.cigar, r.n_cigar) <= beg) continue;
    }
    r.seq = q;
    q += (r.l_seq + 1) / 2;
    r.qual = q;
    q += r.l_seq;
    r.aux = q;
    r.aux_len = (rec + block_size) - q;
    if (r.aux_len < 0) continue;  // corrupt record tail
    emit(r);
    ++n;
  }
  return n;
}

}  // namespace

extern "C" int64_t dv_bam_scan_count(
    const uint8_t* buf, int64_t buf_len, int64_t stop_offset,
    int32_t ref_id, int32_t beg,
    int32_t end, uint32_t drop_flag_mask, int32_t min_mapq,
    int64_t* out_totals) {
  int64_t seq_bytes = 0, cigar_ops = 0, name_bytes = 0, aux_bytes = 0;
  int64_t truncated = 0;
  int64_t n = bam_scan(
      buf, buf_len, stop_offset, ref_id, beg, end, drop_flag_mask,
      min_mapq,
      [&](const BamRec& r) {
        seq_bytes += r.l_seq;
        cigar_ops += r.n_cigar;
        name_bytes += r.l_read_name - 1;
        aux_bytes += r.aux_len;
      },
      &truncated);
  out_totals[0] = n;
  out_totals[1] = seq_bytes;
  out_totals[2] = cigar_ops;
  out_totals[3] = name_bytes;
  out_totals[4] = aux_bytes;
  out_totals[5] = truncated;
  return n;
}

extern "C" int64_t dv_bam_scan_fill(
    const uint8_t* buf, int64_t buf_len, int64_t stop_offset,
    int32_t ref_id, int32_t beg,
    int32_t end, uint32_t drop_flag_mask, int32_t min_mapq,
    uint16_t* flags, int32_t* refids, int32_t* poss, uint8_t* mapqs,
    int32_t* mrefs, int32_t* mposs, int32_t* tlens,
    int64_t* seq_off, uint8_t* seqs, uint8_t* quals,
    int64_t* cig_off, int8_t* cig_ops, int32_t* cig_lens,
    int64_t* name_off, uint8_t* names,
    int64_t* aux_off, uint8_t* auxs) {
  int64_t i = 0;
  seq_off[0] = 0;
  cig_off[0] = 0;
  name_off[0] = 0;
  aux_off[0] = 0;
  bam_scan(
      buf, buf_len, stop_offset, ref_id, beg, end, drop_flag_mask,
      min_mapq,
      [&](const BamRec& r) {
        flags[i] = static_cast<uint16_t>(r.flag);
        refids[i] = r.rid;
        poss[i] = r.pos;
        mapqs[i] = static_cast<uint8_t>(r.mapq);
        mrefs[i] = r.next_rid;
        mposs[i] = r.next_pos;
        tlens[i] = r.tlen;
        int64_t so = seq_off[i];
        for (int32_t b = 0; b < r.l_seq; ++b) {
          uint8_t packed = r.seq[b >> 1];
          uint8_t nib = (b & 1) ? (packed & 0xF) : (packed >> 4);
          seqs[so + b] = static_cast<uint8_t>(kSeqLut[nib]);
        }
        memcpy(quals + so, r.qual, r.l_seq);
        seq_off[i + 1] = so + r.l_seq;
        int64_t co = cig_off[i];
        for (int32_t c = 0; c < r.n_cigar; ++c) {
          uint32_t u;
          memcpy(&u, r.cigar + 4 * c, 4);
          cig_ops[co + c] = static_cast<int8_t>((u & 0xF) + 1);
          cig_lens[co + c] = static_cast<int32_t>(u >> 4);
        }
        cig_off[i + 1] = co + r.n_cigar;
        int64_t no = name_off[i];
        memcpy(names + no, r.name, r.l_read_name - 1);
        name_off[i + 1] = no + r.l_read_name - 1;
        int64_t ao = aux_off[i];
        memcpy(auxs + ao, r.aux, r.aux_len);
        aux_off[i + 1] = ao + r.aux_len;
        ++i;
      });
  return i;
}

// ---------------------------------------------------------------------------
// Batch pileup row painter.
//
// Paints the (width, n_channels) uint8 row for every selected read of one
// candidate in a single call — the host hot loop of stage 1's example
// encoding (role parity: EncodeRead + CalculateBaseLevelData,
// pileup_image_native.cc:243-396 / pileup_channel_lib.cc:170-260; design
// differs: SoA inputs, per-channel mode dispatch, per-read-constant colors
// precomputed by the caller).
//
// Channel modes (per output channel):
//   0 = read base color      (base_lut[base])
//   1 = base quality color   (254 * min(q, cap) / cap, float32 semantics)
//   2 = base-differs-from-ref (match_color / mismatch_color)
//   3 = per-read constant    (const_colors[read, channel])
//
// Event semantics mirror the python walk exactly: M/=/X paint each in-window
// base; I paints a '*' anchor at ref_i-1 (only when ref_i>0) with the first
// inserted base's quality; D/N paint a '*' anchor at ref_i-1 (only when
// read_i>0) with the preceding base's quality; S consumes read bases but
// paints nothing; H/P ignored. Reads bail (keep=0) on mapq below threshold,
// on zero painted events, or on any event at the call column whose quality
// is below min_base_quality. Painting stops after max_keep reads survive.

extern "C" int dv_encode_rows(
    const int32_t* sel, int32_t n_sel, int32_t max_keep,
    const int64_t* pos, const uint8_t* mapq,
    const uint8_t* seq, const uint8_t* qual, const int64_t* seq_off,
    const int8_t* cig_ops, const int32_t* cig_lens, const int64_t* cig_off,
    const uint8_t* ref_window, int32_t width,
    int64_t image_start_pos, int64_t variant_start,
    const int32_t* modes, int32_t n_ch,
    const uint8_t* const_colors,
    int32_t min_mapq, int32_t min_baseq, float bq_cap,
    uint8_t star_char, const uint8_t* base_lut,
    uint8_t match_color, uint8_t mismatch_color,
    uint8_t* rows, uint8_t* keep) {
  // Precompute the base-quality color LUT once (quality bytes are 0-93).
  uint8_t bq_lut[256];
  for (int q = 0; q < 256; ++q) {
    float v = static_cast<float>(q);
    if (v > bq_cap) v = bq_cap;
    bq_lut[q] = static_cast<uint8_t>(254.0f * (v / bq_cap));
  }
  const int64_t call_col = variant_start - image_start_pos;
  int32_t n_kept = 0;
  for (int32_t r = 0; r < n_sel; ++r) {
    keep[r] = 0;
    if (n_kept >= max_keep) continue;
    const int32_t idx = sel[r];
    if (static_cast<int32_t>(mapq[idx]) < min_mapq) continue;
    const uint8_t* rseq = seq + seq_off[idx];
    const uint8_t* rqual = qual + seq_off[idx];
    const int64_t c0 = cig_off[idx], c1 = cig_off[idx + 1];
    uint8_t* row = rows + static_cast<int64_t>(r) * width * n_ch;
    const uint8_t* consts = const_colors + static_cast<int64_t>(r) * n_ch;
    int64_t ref_i = pos[idx];
    int64_t read_i = 0;
    bool painted = false, low_qual_at_call = false;
    for (int64_t c = c0; c < c1 && !low_qual_at_call; ++c) {
      const int op = cig_ops[c];
      const int64_t op_len = cig_lens[c];
      int64_t col = -1;
      uint8_t base = 0, q = 0;
      if (op == 1 || op == 8 || op == 9) {  // M / = / X
        for (int64_t k = 0; k < op_len; ++k) {
          col = ref_i + k - image_start_pos;
          if (col < 0 || col >= width) continue;
          base = rseq[read_i + k];
          q = rqual[read_i + k];
          if (col == call_col && static_cast<int32_t>(q) < min_baseq) {
            low_qual_at_call = true;
            break;
          }
          painted = true;
          uint8_t* cell = row + col * n_ch;
          for (int32_t ch = 0; ch < n_ch; ++ch) {
            switch (modes[ch]) {
              case 0: cell[ch] = base_lut[base]; break;
              case 1: cell[ch] = bq_lut[q]; break;
              case 2:
                cell[ch] = (base == ref_window[col]) ? match_color
                                                     : mismatch_color;
                break;
              default: cell[ch] = consts[ch];
            }
          }
        }
        ref_i += op_len;
        read_i += op_len;
        continue;
      } else if (op == 2 || op == 5) {  // I / S
        if (op == 2 && ref_i > 0) {
          col = ref_i - 1 - image_start_pos;
          base = star_char;
          q = rqual[read_i];
        }
        read_i += op_len;
      } else if (op == 3 || op == 4) {  // D / N
        if (read_i > 0) {
          col = ref_i - 1 - image_start_pos;
          base = star_char;
          q = rqual[read_i - 1];
        }
        ref_i += op_len;
      } else {
        continue;  // H / P
      }
      if (col < 0 || col >= width) continue;
      if (col == call_col && static_cast<int32_t>(q) < min_baseq) {
        low_qual_at_call = true;
        break;
      }
      painted = true;
      uint8_t* cell = row + col * n_ch;
      for (int32_t ch = 0; ch < n_ch; ++ch) {
        switch (modes[ch]) {
          case 0: cell[ch] = base_lut[base]; break;
          case 1: cell[ch] = bq_lut[q]; break;
          case 2:
            cell[ch] = (base == ref_window[col]) ? match_color
                                                 : mismatch_color;
            break;
          default: cell[ch] = consts[ch];
        }
      }
    }
    if (low_qual_at_call || !painted) {
      // Zero any partial paint so the caller's buffer stays clean.
      memset(row, 0, static_cast<size_t>(width) * n_ch);
      continue;
    }
    keep[r] = 1;
    ++n_kept;
  }
  return n_kept;
}

// ---------------------------------------------------------------------------
// Multi-haplotype striped SSW scores: one call scores every (haplotype,
// read) pair of a realigner window. Builds each read's striped query
// profile ONCE and reuses it across haplotypes (the per-hap batch
// interface above rebuilds it per haplotype); hap_mask skips haplotypes
// whose fast-pass support is zero, leaving their scores at 0.
// ---------------------------------------------------------------------------

extern "C" void dv_ssw_score_multi(
    const char* haps_concat, const int32_t* hap_offsets, int32_t n_haps,
    const uint8_t* hap_mask,
    const char* reads_concat, const int32_t* read_offsets,
    int32_t n_reads,
    int32_t match, int32_t mismatch, int32_t gap_open,
    int32_t gap_extend,
    int32_t* out_scores) {
  const int bias = mismatch;
  auto code = [](char c) -> int {
    switch (c) {
      case 'A': return 0; case 'C': return 1;
      case 'G': return 2; case 'T': return 3;
      default: return 4;
    }
  };
  std::vector<__m128i> prof, H, E, Hstore;
  for (int r = 0; r < n_reads; ++r) {
    const char* q = reads_concat + read_offsets[r];
    const int m = read_offsets[r + 1] - read_offsets[r];
    if (m == 0) {
      for (int h = 0; h < n_haps; ++h) out_scores[h * n_reads + r] = 0;
      continue;
    }
    const int seg = (m + 7) / 8;
    prof.assign(5 * seg, _mm_setzero_si128());
    {
      int16_t tmp[8];
      for (int a = 0; a < 5; ++a) {
        for (int i = 0; i < seg; ++i) {
          for (int j = 0; j < 8; ++j) {
            int idx = i + j * seg;
            int v = 0;
            if (idx < m) {
              int qa = code(q[idx]);
              v = (a == qa && a != 4) ? match + bias : -mismatch + bias;
            }
            tmp[j] = static_cast<int16_t>(v);
          }
          prof[a * seg + i] =
              _mm_loadu_si128(reinterpret_cast<__m128i*>(tmp));
        }
      }
    }
    H.resize(seg); E.resize(seg); Hstore.resize(seg);
    const __m128i vZero = _mm_setzero_si128();
    const __m128i vBias = _mm_set1_epi16(static_cast<int16_t>(bias));
    const __m128i vGapO = _mm_set1_epi16(static_cast<int16_t>(gap_open));
    const __m128i vGapE =
        _mm_set1_epi16(static_cast<int16_t>(gap_extend));
    for (int h = 0; h < n_haps; ++h) {
      if (!hap_mask[h]) { out_scores[h * n_reads + r] = 0; continue; }
      const char* ref = haps_concat + hap_offsets[h];
      const int ref_len = hap_offsets[h + 1] - hap_offsets[h];
      for (int i = 0; i < seg; ++i) { H[i] = vZero; E[i] = vZero; }
      __m128i vMax = vZero;
      for (int j = 0; j < ref_len; ++j) {
        const __m128i* P = &prof[code(ref[j]) * seg];
        __m128i vF = vZero;
        __m128i vH = _mm_slli_si128(H[seg - 1], 2);
        for (int i = 0; i < seg; ++i) {
          vH = _mm_adds_epu16(vH, P[i]);
          vH = _mm_subs_epu16(vH, vBias);
          vH = _mm_max_epu16(vH, E[i]);
          vH = _mm_max_epu16(vH, vF);
          vMax = _mm_max_epu16(vMax, vH);
          Hstore[i] = vH;
          const __m128i vHgo = _mm_subs_epu16(vH, vGapO);
          E[i] = _mm_max_epu16(_mm_subs_epu16(E[i], vGapE), vHgo);
          vF = _mm_max_epu16(_mm_subs_epu16(vF, vGapE), vHgo);
          vH = H[i];
        }
        for (int k = 0; k < 8; ++k) {
          vF = _mm_slli_si128(vF, 2);
          bool any = false;
          for (int i = 0; i < seg; ++i) {
            const __m128i vHf = _mm_max_epu16(Hstore[i], vF);
            const __m128i neq = _mm_cmpeq_epi16(vHf, Hstore[i]);
            if (_mm_movemask_epi8(neq) != 0xFFFF) any = true;
            Hstore[i] = vHf;
            vMax = _mm_max_epu16(vMax, vHf);
            vF = _mm_max_epu16(
                _mm_subs_epu16(vF, vGapE),
                _mm_subs_epu16(vHf, vGapO));
          }
          if (!any) break;
        }
        std::swap(H, Hstore);
      }
      int best = 0;
      alignas(16) int16_t lanes[8];
      _mm_storeu_si128(reinterpret_cast<__m128i*>(lanes), vMax);
      for (int j = 0; j < 8; ++j) {
        best = std::max(best, static_cast<int>(
            static_cast<uint16_t>(lanes[j])));
      }
      out_scores[h * n_reads + r] = best;
    }
  }
}

// ---------------------------------------------------------------------------
// AVX2 (16-lane u16) variant of the multi-haplotype striped SSW scorer,
// selected at runtime when the CPU supports it. Same algorithm as the
// SSE2 kernel above with twice the stripe width.
// ---------------------------------------------------------------------------
#include <immintrin.h>

namespace {

__attribute__((target("avx2")))
static inline __m256i avx2_shift_left2(__m256i a) {
  // Whole-register byte shift left by 2 (zero fill at byte 0).
  __m256i lo = _mm256_permute2x128_si256(a, a, 0x08);
  return _mm256_alignr_epi8(a, lo, 14);
}

__attribute__((target("avx2")))
static void ssw_score_multi_avx2(
    const char* haps_concat, const int32_t* hap_offsets, int32_t n_haps,
    const uint8_t* hap_mask,
    const char* reads_concat, const int32_t* read_offsets,
    int32_t n_reads,
    int32_t match, int32_t mismatch, int32_t gap_open,
    int32_t gap_extend,
    int32_t* out_scores) {
  const int bias = mismatch;
  auto code = [](char c) -> int {
    switch (c) {
      case 'A': return 0; case 'C': return 1;
      case 'G': return 2; case 'T': return 3;
      default: return 4;
    }
  };
  std::vector<__m256i> prof, H, E, Hstore;
  for (int r = 0; r < n_reads; ++r) {
    const char* q = reads_concat + read_offsets[r];
    const int m = read_offsets[r + 1] - read_offsets[r];
    if (m == 0) {
      for (int h = 0; h < n_haps; ++h) out_scores[h * n_reads + r] = 0;
      continue;
    }
    const int seg = (m + 15) / 16;
    prof.assign(5 * seg, _mm256_setzero_si256());
    {
      alignas(32) int16_t tmp[16];
      for (int a = 0; a < 5; ++a) {
        for (int i = 0; i < seg; ++i) {
          for (int j = 0; j < 16; ++j) {
            int idx = i + j * seg;
            int v = 0;
            if (idx < m) {
              int qa = code(q[idx]);
              v = (a == qa && a != 4) ? match + bias : -mismatch + bias;
            }
            tmp[j] = static_cast<int16_t>(v);
          }
          prof[a * seg + i] =
              _mm256_load_si256(reinterpret_cast<__m256i*>(tmp));
        }
      }
    }
    H.resize(seg); E.resize(seg); Hstore.resize(seg);
    const __m256i vZero = _mm256_setzero_si256();
    const __m256i vBias = _mm256_set1_epi16(static_cast<int16_t>(bias));
    const __m256i vGapO =
        _mm256_set1_epi16(static_cast<int16_t>(gap_open));
    const __m256i vGapE =
        _mm256_set1_epi16(static_cast<int16_t>(gap_extend));
    for (int h = 0; h < n_haps; ++h) {
      if (!hap_mask[h]) { out_scores[h * n_reads + r] = 0; continue; }
      const char* ref = haps_concat + hap_offsets[h];
      const int ref_len = hap_offsets[h + 1] - hap_offsets[h];
      for (int i = 0; i < seg; ++i) { H[i] = vZero; E[i] = vZero; }
      __m256i vMax = vZero;
      for (int j = 0; j < ref_len; ++j) {
        const __m256i* P = &prof[code(ref[j]) * seg];
        __m256i vF = vZero;
        __m256i vH = avx2_shift_left2(H[seg - 1]);
        for (int i = 0; i < seg; ++i) {
          vH = _mm256_adds_epu16(vH, P[i]);
          vH = _mm256_subs_epu16(vH, vBias);
          vH = _mm256_max_epu16(vH, E[i]);
          vH = _mm256_max_epu16(vH, vF);
          vMax = _mm256_max_epu16(vMax, vH);
          Hstore[i] = vH;
          const __m256i vHgo = _mm256_subs_epu16(vH, vGapO);
          E[i] = _mm256_max_epu16(_mm256_subs_epu16(E[i], vGapE), vHgo);
          vF = _mm256_max_epu16(_mm256_subs_epu16(vF, vGapE), vHgo);
          vH = H[i];
        }
        for (int k = 0; k < 16; ++k) {
          vF = avx2_shift_left2(vF);
          bool any = false;
          for (int i = 0; i < seg; ++i) {
            const __m256i vHf = _mm256_max_epu16(Hstore[i], vF);
            const __m256i neq = _mm256_cmpeq_epi16(vHf, Hstore[i]);
            if (static_cast<unsigned>(_mm256_movemask_epi8(neq))
                != 0xFFFFFFFFu) {
              any = true;
            }
            Hstore[i] = vHf;
            vMax = _mm256_max_epu16(vMax, vHf);
            vF = _mm256_max_epu16(
                _mm256_subs_epu16(vF, vGapE),
                _mm256_subs_epu16(vHf, vGapO));
          }
          if (!any) break;
        }
        std::swap(H, Hstore);
      }
      int best = 0;
      alignas(32) int16_t lanes[16];
      _mm256_store_si256(reinterpret_cast<__m256i*>(lanes), vMax);
      for (int j = 0; j < 16; ++j) {
        best = std::max(best, static_cast<int>(
            static_cast<uint16_t>(lanes[j])));
      }
      out_scores[h * n_reads + r] = best;
    }
  }
}

// Inter-sequence lane parallelism: 16 READS per __m256i (u16 lanes)
// against one haplotype, walking the DP column by column. Each lane is
// an independent DP matrix, so the vertical-gap recurrence F is exact
// within the column sweep — no striping, no lazy-F correction loop —
// and the per-read query profile collapses to one base-equality blend
// per cell. Same Gotoh recurrence and saturating-u16 semantics as the
// striped kernels above, so scores are bit-identical.
__attribute__((target("avx2")))
static void ssw_score_multi_inter_avx2(
    const char* haps_concat, const int32_t* hap_offsets, int32_t n_haps,
    const uint8_t* hap_mask,
    const char* reads_concat, const int32_t* read_offsets,
    int32_t n_reads,
    int32_t match, int32_t mismatch, int32_t gap_open,
    int32_t gap_extend,
    int32_t* out_scores) {
  const int bias = mismatch;
  auto rcode = [](char c) -> int16_t {
    switch (c) {
      case 'A': return 0; case 'C': return 1;
      case 'G': return 2; case 'T': return 3;
      default: return 4;   // read N / lane padding: never matches
    }
  };
  auto hcode = [](char c) -> int16_t {
    switch (c) {
      case 'A': return 0; case 'C': return 1;
      case 'G': return 2; case 'T': return 3;
      default: return 5;   // hap N: never equal to any read code
    }
  };
  const __m256i vBias = _mm256_set1_epi16(static_cast<int16_t>(bias));
  const __m256i vMatchBias =
      _mm256_set1_epi16(static_cast<int16_t>(match + bias));
  const __m256i vGapO = _mm256_set1_epi16(static_cast<int16_t>(gap_open));
  const __m256i vGapE =
      _mm256_set1_epi16(static_cast<int16_t>(gap_extend));
  const __m256i vZero = _mm256_setzero_si256();

  // Raw int16 backing stores accessed with unaligned intrinsics:
  // std::vector<__m256i> drops the 32-byte alignment attribute
  // (-Wignored-attributes) and aligned member moves then fault.
  std::vector<int16_t> Q, Hcol, Ecol;
  for (int g = 0; g < n_reads; g += 16) {
    const int lanes = std::min(16, n_reads - g);
    int max_len = 0;
    for (int l = 0; l < lanes; ++l) {
      max_len = std::max(
          max_len, read_offsets[g + l + 1] - read_offsets[g + l]);
    }
    if (max_len == 0) {
      for (int h = 0; h < n_haps; ++h) {
        for (int l = 0; l < lanes; ++l) {
          out_scores[h * n_reads + g + l] = 0;
        }
      }
      continue;
    }
    // Transposed lane codes: Q[16*i ..] holds read position i of all
    // 16 lanes; built once per group, reused across every haplotype.
    Q.assign(static_cast<size_t>(max_len) * 16, 4);
    for (int l = 0; l < lanes; ++l) {
      const int m = read_offsets[g + l + 1] - read_offsets[g + l];
      const char* rd = reads_concat + read_offsets[g + l];
      for (int i = 0; i < m; ++i) Q[16 * i + l] = rcode(rd[i]);
    }
    // Two independent DP state sets: masked haplotypes are processed
    // in PAIRS, interleaving two columns per inner iteration so the
    // two serial F-dependency chains hide each other's latency.
    Hcol.resize(static_cast<size_t>(max_len) * 32);
    Ecol.resize(static_cast<size_t>(max_len) * 32);
    std::vector<int> active;
    active.reserve(n_haps);
    for (int h = 0; h < n_haps; ++h) {
      if (hap_mask[h]) {
        active.push_back(h);
      } else {
        for (int l = 0; l < lanes; ++l) {
          out_scores[h * n_reads + g + l] = 0;
        }
      }
    }
    for (size_t a = 0; a < active.size(); a += 2) {
      const int h0 = active[a];
      const bool paired = a + 1 < active.size();
      const int h1 = paired ? active[a + 1] : h0;
      const char* ref0 = haps_concat + hap_offsets[h0];
      const char* ref1 = haps_concat + hap_offsets[h1];
      const int len0 = hap_offsets[h0 + 1] - hap_offsets[h0];
      const int len1 = paired ? hap_offsets[h1 + 1] - hap_offsets[h1]
                              : 0;
      const int ref_len = std::max(len0, len1);
      std::fill(Hcol.begin(), Hcol.end(), 0);
      std::fill(Ecol.begin(), Ecol.end(), 0);
      __m256i vMax0 = vZero, vMax1 = vZero;
      for (int j = 0; j < ref_len; ++j) {
        // Past a haplotype's end, feed the never-matching code 5 so
        // its lanes only decay (scores already peaked are kept by
        // vMax; cheaper than predicating the whole column).
        const __m256i vRef0 =
            _mm256_set1_epi16(j < len0 ? hcode(ref0[j]) : 5);
        const __m256i vRef1 =
            _mm256_set1_epi16(j < len1 ? hcode(ref1[j]) : 5);
        __m256i vF0 = vZero, vF1 = vZero;
        __m256i vDiag0 = vZero, vDiag1 = vZero;
        for (int i = 0; i < max_len; ++i) {
          __m256i* hp = reinterpret_cast<__m256i*>(&Hcol[32 * i]);
          __m256i* ep = reinterpret_cast<__m256i*>(&Ecol[32 * i]);
          const __m256i vQ = _mm256_loadu_si256(
              reinterpret_cast<const __m256i*>(&Q[16 * i]));
          const __m256i vHup0 = _mm256_loadu_si256(hp);
          const __m256i vHup1 = _mm256_loadu_si256(hp + 1);
          const __m256i vP0 = _mm256_and_si256(
              _mm256_cmpeq_epi16(vQ, vRef0), vMatchBias);
          const __m256i vP1 = _mm256_and_si256(
              _mm256_cmpeq_epi16(vQ, vRef1), vMatchBias);
          __m256i vH0 = _mm256_subs_epu16(
              _mm256_adds_epu16(vDiag0, vP0), vBias);
          __m256i vH1 = _mm256_subs_epu16(
              _mm256_adds_epu16(vDiag1, vP1), vBias);
          const __m256i vE0 = _mm256_max_epu16(
              _mm256_subs_epu16(_mm256_loadu_si256(ep), vGapE),
              _mm256_subs_epu16(vHup0, vGapO));
          const __m256i vE1 = _mm256_max_epu16(
              _mm256_subs_epu16(_mm256_loadu_si256(ep + 1), vGapE),
              _mm256_subs_epu16(vHup1, vGapO));
          vH0 = _mm256_max_epu16(vH0, vE0);
          vH1 = _mm256_max_epu16(vH1, vE1);
          vH0 = _mm256_max_epu16(vH0, vF0);
          vH1 = _mm256_max_epu16(vH1, vF1);
          vMax0 = _mm256_max_epu16(vMax0, vH0);
          vMax1 = _mm256_max_epu16(vMax1, vH1);
          vF0 = _mm256_max_epu16(
              _mm256_subs_epu16(vF0, vGapE),
              _mm256_subs_epu16(vH0, vGapO));
          vF1 = _mm256_max_epu16(
              _mm256_subs_epu16(vF1, vGapE),
              _mm256_subs_epu16(vH1, vGapO));
          _mm256_storeu_si256(ep, vE0);
          _mm256_storeu_si256(ep + 1, vE1);
          _mm256_storeu_si256(hp, vH0);
          _mm256_storeu_si256(hp + 1, vH1);
          vDiag0 = vHup0;
          vDiag1 = vHup1;
        }
      }
      alignas(32) int16_t out16[16];
      _mm256_store_si256(reinterpret_cast<__m256i*>(out16), vMax0);
      for (int l = 0; l < lanes; ++l) {
        out_scores[h0 * n_reads + g + l] =
            static_cast<int>(static_cast<uint16_t>(out16[l]));
      }
      if (paired) {
        _mm256_store_si256(reinterpret_cast<__m256i*>(out16), vMax1);
        for (int l = 0; l < lanes; ++l) {
          out_scores[h1 * n_reads + g + l] =
              static_cast<int>(static_cast<uint16_t>(out16[l]));
        }
      }
    }
  }
}

// AVX2 striped (16 u16 lanes, lazy-F) variant of ssw_local_ends with
// the same reported-endpoint semantics:
//  * target == 0 (forward): best score with the lexicographically
//    smallest (row, query_pos) endpoint. Row-level equivalent of the
//    scalar scan: a row improving the running best saves its H row;
//    the winning row is rescanned once at the end for the smallest
//    query position attaining the final best.
//  * target > 0 (reverse / known-score): stop at the FIRST row with a
//    cell equal to target and report the smallest such query position.
// Lane padding cells carry live H values but are masked out of the
// row-max / target checks, so they can never win.
__attribute__((target("avx2")))
void ssw_local_ends_avx2(const char* ref, int32_t n, const char* q,
                         int32_t m, int32_t mt, int32_t mm, int32_t go,
                         int32_t ge, int32_t target, int32_t* out_best,
                         int32_t* out_i, int32_t* out_j) {
  const int bias = mm;
  const int seg = (m + 15) / 16;
  auto code = [](char c) -> int {
    switch (c) {
      case 'A': return 0; case 'C': return 1;
      case 'G': return 2; case 'T': return 3;
      default: return 4;
    }
  };
  // Striped query profile and valid-lane mask (raw int16 backing +
  // unaligned intrinsics; see ssw_score_multi_inter_avx2).
  std::vector<int16_t> prof(static_cast<size_t>(5) * seg * 16, 0);
  std::vector<int16_t> lane_mask(static_cast<size_t>(seg) * 16, 0);
  for (int s = 0; s < seg; ++s) {
    for (int l = 0; l < 16; ++l) {
      const int idx = s + l * seg;
      if (idx >= m) continue;
      lane_mask[s * 16 + l] = -1;
      const int qa = code(q[idx]);
      for (int a = 0; a < 5; ++a) {
        // Byte-identity scoring like the scalar pass: N matches N
        // (the dispatch guard keeps non-ACGTN inputs off this path).
        prof[(static_cast<size_t>(a) * seg + s) * 16 + l] =
            static_cast<int16_t>(
                a == qa ? mt + bias : -mm + bias);
      }
    }
  }
  std::vector<int16_t> H(static_cast<size_t>(seg) * 16, 0);
  std::vector<int16_t> E(static_cast<size_t>(seg) * 16, 0);
  std::vector<int16_t> Hnew(static_cast<size_t>(seg) * 16, 0);
  std::vector<int16_t> best_row(static_cast<size_t>(seg) * 16, 0);
  const __m256i vZero = _mm256_setzero_si256();
  const __m256i vBias = _mm256_set1_epi16(static_cast<int16_t>(bias));
  const __m256i vGapO = _mm256_set1_epi16(static_cast<int16_t>(go));
  const __m256i vGapE = _mm256_set1_epi16(static_cast<int16_t>(ge));
  const __m256i vTarget =
      _mm256_set1_epi16(static_cast<int16_t>(target));
  auto vec = [](std::vector<int16_t>& v, int s) {
    return reinterpret_cast<__m256i*>(&v[static_cast<size_t>(s) * 16]);
  };
  auto cvec = [](const std::vector<int16_t>& v, int s) {
    return reinterpret_cast<const __m256i*>(
        &v[static_cast<size_t>(s) * 16]);
  };
  int32_t best = 0, bi = 0, best_rowmax_valid = 0;
  for (int32_t i = 1; i <= n; ++i) {
    const int16_t* P =
        &prof[static_cast<size_t>(code(ref[i - 1])) * seg * 16];
    __m256i vF = vZero;
    __m256i vH = avx2_shift_left2(
        _mm256_loadu_si256(cvec(H, seg - 1)));
    __m256i vRowMax = vZero;
    __m256i vHit = vZero;
    for (int s = 0; s < seg; ++s) {
      vH = _mm256_adds_epu16(
          vH, _mm256_loadu_si256(
                  reinterpret_cast<const __m256i*>(&P[s * 16])));
      vH = _mm256_subs_epu16(vH, vBias);
      const __m256i vEs = _mm256_loadu_si256(cvec(E, s));
      vH = _mm256_max_epu16(vH, vEs);
      vH = _mm256_max_epu16(vH, vF);
      _mm256_storeu_si256(vec(Hnew, s), vH);
      const __m256i vHgo = _mm256_subs_epu16(vH, vGapO);
      _mm256_storeu_si256(
          vec(E, s),
          _mm256_max_epu16(_mm256_subs_epu16(vEs, vGapE), vHgo));
      vF = _mm256_max_epu16(_mm256_subs_epu16(vF, vGapE), vHgo);
      vH = _mm256_loadu_si256(cvec(H, s));
    }
    // Lazy-F correction.
    for (int k = 0; k < 16; ++k) {
      vF = avx2_shift_left2(vF);
      bool any = false;
      for (int s = 0; s < seg; ++s) {
        const __m256i vHs = _mm256_loadu_si256(cvec(Hnew, s));
        const __m256i vHf = _mm256_max_epu16(vHs, vF);
        if (static_cast<unsigned>(_mm256_movemask_epi8(
                _mm256_cmpeq_epi16(vHf, vHs))) != 0xFFFFFFFFu) {
          any = true;
        }
        _mm256_storeu_si256(vec(Hnew, s), vHf);
        vF = _mm256_max_epu16(
            _mm256_subs_epu16(vF, vGapE),
            _mm256_subs_epu16(vHf, vGapO));
      }
      if (!any) break;
    }
    // Masked row statistics.
    for (int s = 0; s < seg; ++s) {
      const __m256i masked = _mm256_and_si256(
          _mm256_loadu_si256(cvec(Hnew, s)),
          _mm256_loadu_si256(cvec(lane_mask, s)));
      vRowMax = _mm256_max_epu16(vRowMax, masked);
      if (target > 0) {
        vHit = _mm256_or_si256(
            vHit, _mm256_and_si256(
                      _mm256_cmpeq_epi16(masked, vTarget),
                      _mm256_loadu_si256(cvec(lane_mask, s))));
      }
    }
    if (target > 0 &&
        _mm256_movemask_epi8(vHit) != 0) {
      // First row reaching the target: smallest query pos in it.
      for (int j = 1; j <= m; ++j) {
        const int idx = (j - 1) % seg * 16 + (j - 1) / seg;
        if (Hnew[idx] == target) {
          *out_best = target;
          *out_i = i;
          *out_j = j;
          return;
        }
      }
    }
    if (target == 0) {
      alignas(32) int16_t rm[16];
      _mm256_store_si256(reinterpret_cast<__m256i*>(rm), vRowMax);
      int32_t rowmax = 0;
      for (int l = 0; l < 16; ++l) {
        rowmax = std::max(
            rowmax, static_cast<int32_t>(
                        static_cast<uint16_t>(rm[l])));
      }
      if (rowmax > best) {
        best = rowmax;
        bi = i;
        best_row.assign(Hnew.begin(), Hnew.end());
        best_rowmax_valid = 1;
      }
    }
    std::swap(H, Hnew);
  }
  if (target > 0) {
    // Target never reached (defensive; mirrors the scalar fall-through
    // which reports the plain best/endpoint of the full scan).
    ssw_local_ends(ref, n, q, m, mt, mm, go, ge, 0, out_best, out_i,
                   out_j);
    if (*out_best > 0) return;
    *out_best = 0; *out_i = 0; *out_j = 0;
    return;
  }
  *out_best = best;
  *out_i = bi;
  if (best > 0 && best_rowmax_valid) {
    for (int j = 1; j <= m; ++j) {
      const int idx = (j - 1) % seg * 16 + (j - 1) / seg;
      if (static_cast<uint16_t>(best_row[idx]) ==
          static_cast<uint32_t>(best)) {
        *out_j = j;
        return;
      }
    }
  }
  *out_j = 0;
}

}  // namespace

extern "C" void dv_ssw_score_multi2(
    const char* haps_concat, const int32_t* hap_offsets, int32_t n_haps,
    const uint8_t* hap_mask,
    const char* reads_concat, const int32_t* read_offsets,
    int32_t n_reads,
    int32_t match, int32_t mismatch, int32_t gap_open,
    int32_t gap_extend,
    int32_t* out_scores) {
  static const bool kHasAvx2 = __builtin_cpu_supports("avx2");
  if (kHasAvx2) {
    ssw_score_multi_inter_avx2(haps_concat, hap_offsets, n_haps,
                               hap_mask, reads_concat, read_offsets,
                               n_reads, match, mismatch, gap_open,
                               gap_extend, out_scores);
  } else {
    dv_ssw_score_multi(haps_concat, hap_offsets, n_haps, hap_mask,
                       reads_concat, read_offsets, n_reads, match,
                       mismatch, gap_open, gap_extend, out_scores);
  }
}

// ---------------------------------------------------------------------------
// Read->ref cigar merge (CalculateReadToRefAlignment,
// fast_pass_aligner.cc:861-993): merge a read->haplotype cigar with the
// haplotype->reference cigar. Scalar port of
// realign/fast_pass_aligner.py calculate_read_to_ref_alignment /
// left_trim_hap_to_ref / merge_cigar_op / _merge_one_base, which stays
// as the behavioral oracle. Returns the merged op count, -1 for the
// "no alignment" cases (python returns []), -2 on output overflow.
// Op codes are the proto enum (M=1 I=2 D=3 S=5).
// ---------------------------------------------------------------------------

namespace {

constexpr int32_t kOpM = 1, kOpI = 2, kOpD = 3, kOpS = 5;

struct CigarBuf {
  std::vector<std::array<int32_t, 2>> ops;
  int64_t aligned = 0;  // sum of non-D lengths

  void recount_pop_back() {
    if (ops.back()[0] != kOpD) aligned -= ops.back()[1];
    ops.pop_back();
  }

  // MergeCigarOp (fast_pass_aligner.cc:712-776).
  void merge(int32_t op, int32_t len, int32_t read_len) {
    const int32_t last_op = ops.empty() ? 0 : ops.back()[0];
    int64_t new_len;
    if (op != kOpD) {
      new_len = std::min<int64_t>(len, read_len - aligned);
    } else {
      new_len = len;
    }
    if (new_len <= 0 || aligned == read_len) return;
    if ((op == kOpI && last_op == kOpD) ||
        (op == kOpD && last_op == kOpI)) {
      // INS and DEL annihilate one base; a MATCH grows before the
      // trailing indel.
      if (ops.size() > 1 && ops[ops.size() - 2][0] == kOpM) {
        ops[ops.size() - 2][1] += 1;
      } else {
        ops.insert(ops.end() - 1, {kOpM, 1});
      }
      aligned += 1;
      if (ops.back()[1] == 1) {
        recount_pop_back();
      } else {
        ops.back()[1] -= 1;
        if (ops.back()[0] != kOpD) aligned -= 1;
      }
    } else if (op == last_op) {
      ops.back()[1] += static_cast<int32_t>(new_len);
      if (op != kOpD) aligned += new_len;
    } else {
      ops.push_back({op, static_cast<int32_t>(new_len)});
      if (op != kOpD) aligned += new_len;
    }
  }

  void merge_one_base(int32_t rh_op, int32_t hr_op, int32_t read_len) {
    for (int32_t op : {kOpS, kOpD, kOpI, kOpM}) {
      if (rh_op == op || hr_op == op) {
        merge(op, 1, read_len);
        return;
      }
    }
  }
};

}  // namespace

extern "C" int32_t dv_merge_read_to_ref_cigar(
    int32_t read_len,
    const int32_t* rh_ops, const int32_t* rh_lens, int32_t n_rh,
    const int32_t* hr_ops, const int32_t* hr_lens, int32_t n_hr,
    int32_t read_to_hap_pos,
    int32_t* out_ops, int32_t* out_lens, int32_t out_cap) {
  std::deque<std::array<int32_t, 2>> rh, hr;
  for (int32_t i = 0; i < n_rh; ++i) rh.push_back({rh_ops[i], rh_lens[i]});
  for (int32_t i = 0; i < n_hr; ++i) hr.push_back({hr_ops[i], hr_lens[i]});

  // LeftTrimHaplotypeToRefAlignment (fast_pass_aligner.cc:783-822).
  int32_t cur_pos = 0;
  while (cur_pos != read_to_hap_pos) {
    if (hr.empty()) return -1;  // "ran out of cigar while trimming"
    std::array<int32_t, 2> cur = hr.front();
    hr.pop_front();
    if (cur[0] == kOpM || cur[0] == kOpS || cur[0] == kOpI) {
      if (cur[1] + cur_pos > read_to_hap_pos) {
        hr.push_front({cur[0], cur[1] - (read_to_hap_pos - cur_pos)});
      }
      cur_pos = std::min(cur[1] + cur_pos, read_to_hap_pos);
    }
  }
  if (!hr.empty() && hr.front()[0] == kOpD) hr.pop_front();
  if (hr.empty()) return -1;  // "read must overlap haplotype"

  CigarBuf out;
  if (!rh.empty() && rh.front()[0] == kOpS) {
    out.merge(kOpS, rh.front()[1], read_len);
    rh.pop_front();
  }
  std::array<int32_t, 2> cur_rh{0, 0}, cur_hr{0, 0};
  while ((!rh.empty() || !hr.empty()) && out.aligned < read_len) {
    if (!rh.empty() && hr.empty() && cur_hr[1] == 0) {
      std::array<int32_t, 2> op = rh.front();
      rh.pop_front();
      out.merge(op[0], op[1], read_len);
      continue;
    }
    if (rh.empty() && cur_rh[1] == 0 && !hr.empty()) break;
    if (cur_rh[1] == 0) {
      cur_rh = rh.front();
      rh.pop_front();
    }
    if (cur_hr[1] == 0) {
      cur_hr = hr.front();
      hr.pop_front();
    }
    while (cur_rh[1] > 0 && cur_hr[1] > 0) {
      if (cur_rh[0] == kOpM && cur_hr[0] == kOpM) {
        const int32_t n = std::min(cur_rh[1], cur_hr[1]);
        out.merge(kOpM, n, read_len);
        cur_rh[1] -= n;
        cur_hr[1] -= n;
        continue;
      }
      if ((cur_rh[0] == kOpD && cur_hr[0] == kOpI) ||
          (cur_rh[0] == kOpI && cur_hr[0] == kOpD)) {
        cur_hr[1] -= 1;
        cur_rh[1] -= 1;
        if (cur_hr[0] == kOpD) {
          hr.push_front({kOpM, 1});
          rh.push_front({kOpM, 1});
        }
        continue;
      }
      out.merge_one_base(cur_rh[0], cur_hr[0], read_len);
      if (cur_rh[0] == kOpI) {
        cur_rh[1] -= 1;
      } else if (cur_hr[0] == kOpD) {
        cur_hr[1] -= 1;
      } else {
        cur_hr[1] -= 1;
        cur_rh[1] -= 1;
      }
    }
  }
  if (cur_rh[1] > 0 && cur_rh[0] == kOpS) {
    while (cur_rh[1] > 0) {
      out.merge_one_base(cur_rh[0], cur_hr[0], read_len);
      cur_rh[1] -= 1;
    }
  }
  if (!rh.empty() || cur_rh[1] > 0) return -3;  // python "return []"
  if (static_cast<int32_t>(out.ops.size()) > out_cap) return -2;
  for (size_t i = 0; i < out.ops.size(); ++i) {
    out_ops[i] = out.ops[i][0];
    out_lens[i] = out.ops[i][1];
  }
  return static_cast<int32_t>(out.ops.size());
}

// The striped AVX2 kernel stays exported for cross-validation tests.
extern "C" void dv_ssw_score_multi_striped_avx2(
    const char* haps_concat, const int32_t* hap_offsets, int32_t n_haps,
    const uint8_t* hap_mask,
    const char* reads_concat, const int32_t* read_offsets,
    int32_t n_reads,
    int32_t match, int32_t mismatch, int32_t gap_open,
    int32_t gap_extend,
    int32_t* out_scores) {
  ssw_score_multi_avx2(haps_concat, hap_offsets, n_haps, hap_mask,
                       reads_concat, read_offsets, n_reads, match,
                       mismatch, gap_open, gap_extend, out_scores);
}

// ---------------------------------------------------------------------------
// dv_ssw_align with a caller-known best score: when known_score > 0 is
// the alignment's exact SW optimum (e.g. from dv_ssw_score_multi2), the
// forward pass early-exits at the first row attaining it — the same
// lexicographically-smallest endpoint the full scan would report.
// ---------------------------------------------------------------------------
extern "C" int dv_ssw_align_scored(
    const char* ref, int32_t n, const char* query, int32_t m,
    int32_t match, int32_t mismatch, int32_t gap_open,
    int32_t gap_extend, int32_t known_score, int32_t* out_score,
    int32_t* out_ref_begin, int32_t* out_ref_end,
    int32_t* out_query_begin, int32_t* out_query_end,
    char* cigar_buf, int32_t cigar_buf_size) {
  if (n <= 0 || m <= 0) return 1;
  int32_t best = 0, re_i = 0, re_j = 0;
  ssw_local_ends_fast(ref, n, query, m, match, mismatch, gap_open, gap_extend,
                 known_score > 0 ? known_score : 0, &best, &re_i, &re_j);
  if (best <= 0) return 1;
  std::vector<char> ref_rev(re_i), q_rev(re_j);
  for (int32_t i = 0; i < re_i; ++i) ref_rev[i] = ref[re_i - 1 - i];
  for (int32_t j = 0; j < re_j; ++j) q_rev[j] = query[re_j - 1 - j];
  int32_t rbest = 0, ri = 0, rj = 0;
  ssw_local_ends_fast(ref_rev.data(), re_i, q_rev.data(), re_j, match, mismatch,
                 gap_open, gap_extend, best, &rbest, &ri, &rj);
  if (rbest != best) return 1;
  const int32_t ref_begin = re_i - ri;
  const int32_t query_begin = re_j - rj;
  std::vector<char> ops;
  if (!ssw_banded_ops(ref + ref_begin, re_i - ref_begin, query + query_begin,
                      re_j - query_begin, best, match, mismatch, gap_open,
                      gap_extend, &ops)) {
    return 1;
  }
  *out_score = best;
  *out_ref_begin = ref_begin;
  *out_ref_end = re_i;
  *out_query_begin = query_begin;
  *out_query_end = re_j;
  int len = 0;
  if (query_begin > 0) {
    len = cigar_append(cigar_buf, cigar_buf_size, len, query_begin, 'S');
    if (len < 0) return -1;
  }
  int32_t pi = query_begin, pj = ref_begin;
  size_t kidx = 0;
  while (kidx < ops.size()) {
    char op = ops[kidx];
    char emit;
    if (op == 'M') {
      emit = (ref[pj] == query[pi]) ? '=' : 'X';
    } else {
      emit = op;
    }
    int count = 0;
    while (kidx < ops.size()) {
      char cur = ops[kidx];
      char cur_emit;
      if (cur == 'M') {
        cur_emit = (ref[pj] == query[pi]) ? '=' : 'X';
      } else {
        cur_emit = cur;
      }
      if (cur_emit != emit) break;
      if (cur != 'D') ++pi;
      if (cur != 'I') ++pj;
      ++count;
      ++kidx;
    }
    len = cigar_append(cigar_buf, cigar_buf_size, len, count, emit);
    if (len < 0) return -1;
  }
  if (m - re_j > 0) {
    len = cigar_append(cigar_buf, cigar_buf_size, len, m - re_j, 'S');
    if (len < 0) return -1;
  }
  if (len < cigar_buf_size) cigar_buf[len] = '\0';
  return 0;
}

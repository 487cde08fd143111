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
extern "C" int dv_ssw_align(const char* ref, int32_t n, const char* query, int32_t m,
                 int32_t match, int32_t mismatch, int32_t gap_open,
                 int32_t gap_extend, int32_t* out_score,
                 int32_t* out_ref_begin, int32_t* out_ref_end,
                 int32_t* out_query_begin, int32_t* out_query_end,
                 char* cigar_buf, int32_t cigar_buf_size) {
  if (n <= 0 || m <= 0) return 1;
  const int NEG = -(1 << 28);
  const int W = m + 1;
  // Full matrices for traceback (n+1) x (m+1), int32.
  std::vector<int32_t> H((size_t)(n + 1) * W, 0);
  std::vector<int32_t> E((size_t)(n + 1) * W, NEG);
  std::vector<int32_t> F((size_t)(n + 1) * W, NEG);
  int best = 0, best_i = 0, best_j = 0;
  for (int i = 1; i <= n; ++i) {
    const char rc = ref[i - 1];
    int32_t* Hrow = &H[(size_t)i * W];
    int32_t* Hprev = &H[(size_t)(i - 1) * W];
    int32_t* Erow = &E[(size_t)i * W];
    int32_t* Eprev = &E[(size_t)(i - 1) * W];
    int32_t* Frow = &F[(size_t)i * W];
    int32_t f = NEG;
    for (int j = 1; j <= m; ++j) {
      int32_t e = imax2(Hprev[j] - gap_open, Eprev[j] - gap_extend);
      Erow[j] = e;
      int32_t diag =
          Hprev[j - 1] + (rc == query[j - 1] ? match : -mismatch);
      f = imax2(Hrow[j - 1] - gap_open, f - gap_extend);
      Frow[j] = f;
      int32_t h = diag > e ? diag : e;
      if (f > h) h = f;
      if (h < 0) h = 0;
      Hrow[j] = h;
      if (h > best) {
        best = h;
        best_i = i;
        best_j = j;
      }
    }
  }
  if (best <= 0) return 1;
  // Traceback (matches ssw.py state machine).
  int i = best_i, j = best_j;
  // Ops are collected in reverse; run-length encode on the way out.
  std::vector<char> ops;
  ops.reserve(m + 16);
  char state = 'H';
  while (i > 0 && j > 0) {
    size_t idx = (size_t)i * W + j;
    if (state == 'H') {
      if (H[idx] == 0) break;
      int32_t diag_score =
          H[(size_t)(i - 1) * W + (j - 1)] +
          (ref[i - 1] == query[j - 1] ? match : -mismatch);
      if (H[idx] == diag_score) {
        ops.push_back(ref[i - 1] == query[j - 1] ? '=' : 'X');
        --i;
        --j;
      } else if (H[idx] == E[idx]) {
        state = 'E';
      } else {
        state = 'F';
      }
    } else if (state == 'E') {
      ops.push_back('D');
      bool ext = E[idx] == E[(size_t)(i - 1) * W + j] - gap_extend;
      --i;
      if (!ext) state = 'H';
    } else {  // F
      ops.push_back('I');
      bool ext = F[idx] == F[(size_t)i * W + (j - 1)] - gap_extend;
      --j;
      if (!ext) state = 'H';
    }
  }
  *out_score = best;
  *out_ref_begin = i;
  *out_ref_end = best_i;
  *out_query_begin = j;
  *out_query_end = best_j;
  int len = 0;
  if (j > 0) {
    len = cigar_append(cigar_buf, cigar_buf_size, len, j, 'S');
    if (len < 0) return -1;
  }
  // Reverse-iterate ops with RLE.
  for (int k = (int)ops.size() - 1; k >= 0;) {
    char op = ops[k];
    int count = 0;
    while (k >= 0 && ops[k] == op) {
      ++count;
      --k;
    }
    len = cigar_append(cigar_buf, cigar_buf_size, len, count, op);
    if (len < 0) return -1;
  }
  if (m - best_j > 0) {
    len = cigar_append(cigar_buf, cigar_buf_size, len, m - best_j, 'S');
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
  int32_t mm = 0, matches = 0;
  for (int32_t i = 0; i < n; ++i) {
    const char c1 = s1[i], c2 = s2[i];
    if (c1 != c2 && c1 != 'N' && c2 != 'N') {
      if (++mm == max_mismatches) {
        *num_mismatches = mm;
        return 0;
      }
    } else {
      ++matches;
    }
  }
  *num_mismatches = mm;
  return matches * match_score - mm * mismatch_pen;
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
  // Build read k-mer index.
  std::unordered_map<uint64_t, std::vector<KmerHit>> index;
  index.reserve((size_t)n_reads * 64);
  for (int32_t r = 0; r < n_reads; ++r) {
    const char* read = reads_buf + read_offsets[r];
    int32_t len = read_offsets[r + 1] - read_offsets[r];
    if (len <= k) continue;
    for (int32_t i = 0; i + k <= len; ++i) {
      uint64_t key;
      if (pack_kmer(read + i, k, &key)) {
        index[key].push_back({r, i});
      }
    }
  }
  std::vector<int32_t> coverage;
  for (int32_t h = 0; h < n_haps; ++h) {
    const char* hap = hap_buf + hap_offsets[h];
    const int32_t hap_len = hap_offsets[h + 1] - hap_offsets[h];
    int32_t* scores = out_scores + (size_t)h * n_reads;
    int32_t* positions = out_positions + (size_t)h * n_reads;
    for (int32_t r = 0; r < n_reads; ++r) {
      scores[r] = 0;
      positions[r] = -1;
    }
    coverage.assign(hap_len, 0);
    int64_t hap_score = 0;
    const bool is_ref = (h == ref_hap_index);
    bool aborted = false;
    for (int32_t i = 0; i + k <= hap_len && !aborted; ++i) {
      uint64_t key;
      if (pack_kmer(hap + i, k, &key)) {
        auto it = index.find(key);
        if (it != index.end()) {
          for (const KmerHit& hit : it->second) {
            int32_t target_start = i - hit.read_pos;
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
              for (int32_t p = target_start; p < target_start + span; ++p)
                coverage[p]++;
              if (scores[hit.read_id] < score) {
                hap_score += score - scores[hit.read_id];
                scores[hit.read_id] = score;
                positions[hit.read_id] = target_start;
              }
            }
          }
        }
      }
      if (coverage[i] == 0 && i >= ref_prefix_len &&
          i < hap_len - ref_suffix_len && !is_ref) {
        hap_score = 0;
        aborted = true;
      }
    }
    if (aborted) {
      for (int32_t r = 0; r < n_reads; ++r) {
        scores[r] = 0;
        positions[r] = -1;
      }
      out_hap_scores[h] = 0;
    } else {
      out_hap_scores[h] = (int32_t)hap_score;
    }
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
// index distribution is implementation-defined, so bit-reproducing the
// reference's goldens requires running the same libstdc++ algorithm with
// the same generator — which this does by construction.
// ---------------------------------------------------------------------------
#include <algorithm>
#include <numeric>
#include <random>

extern "C" void dv_shuffle_indices(int32_t n, uint64_t seed, int32_t* out) {
  std::vector<int32_t> idx(n);
  std::iota(idx.begin(), idx.end(), 0);
  std::shuffle(idx.begin(), idx.end(), std::mt19937_64(seed));
  std::copy(idx.begin(), idx.end(), out);
}

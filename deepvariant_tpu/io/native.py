"""ctypes bindings for the dvnative C++ library (native/dvnative.cc).

Builds lazily with `make -C native` if the .so is missing; all callers fall
back to pure-Python paths when the native library can't be loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_SO_PATH = os.path.join(os.path.dirname(__file__), "_dvnative.so")
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)


def _build():
    subprocess.run(
        ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
    )


def _load() -> ctypes.CDLL:
    if not os.path.exists(_SO_PATH):
        _build()
    lib = ctypes.CDLL(_SO_PATH)
    lib.dv_crc32c.restype = ctypes.c_uint32
    lib.dv_crc32c.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint32,
    ]
    lib.dv_bgzf_inflate_all.restype = ctypes.c_int64
    lib.dv_bgzf_inflate_all.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
    ]
    if hasattr(lib, "dv_rans_decode"):
        lib.dv_rans_decode.restype = ctypes.c_int64
        lib.dv_rans_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64,
        ]
    if hasattr(lib, "dv_fast_pass_align"):
        lib.dv_fast_pass_align.restype = ctypes.c_int
        lib.dv_fast_pass_align.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
    if hasattr(lib, "dv_bam_scan_count"):
        I64P = ctypes.POINTER(ctypes.c_int64)
        I32P = ctypes.POINTER(ctypes.c_int32)
        U8P = ctypes.POINTER(ctypes.c_uint8)
        lib.dv_bam_scan_count.restype = ctypes.c_int64
        lib.dv_bam_scan_count.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_uint32,
            ctypes.c_int32, I64P,
        ]
        lib.dv_bam_scan_fill.restype = ctypes.c_int64
        lib.dv_bam_scan_fill.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_uint32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint16), I32P, I32P, U8P,
            I32P, I32P, I32P,
            I64P, U8P, U8P,
            I64P, ctypes.POINTER(ctypes.c_int8), I32P,
            I64P, U8P,
            I64P, U8P,
        ]
    if hasattr(lib, "dv_dbg_haplotypes"):
        lib.dv_dbg_haplotypes.restype = ctypes.c_int32
        lib.dv_dbg_haplotypes.argtypes = [
            ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
    if hasattr(lib, "dv_ssw_score_batch"):
        lib.dv_ssw_score_batch.restype = None
        lib.dv_ssw_score_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
    for _multi in ("dv_ssw_score_multi", "dv_ssw_score_multi2"):
      if hasattr(lib, _multi):
        fn = getattr(lib, _multi)
        fn.restype = None
        fn.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
    if hasattr(lib, "dv_encode_rows"):
        I64P = ctypes.POINTER(ctypes.c_int64)
        I32P = ctypes.POINTER(ctypes.c_int32)
        U8P = ctypes.POINTER(ctypes.c_uint8)
        lib.dv_encode_rows.restype = ctypes.c_int
        lib.dv_encode_rows.argtypes = [
            I32P, ctypes.c_int32, ctypes.c_int32,      # sel, n_sel, max_keep
            I64P, U8P,                                 # pos, mapq
            U8P, U8P, I64P,                            # seq, qual, seq_off
            ctypes.POINTER(ctypes.c_int8), I32P, I64P,  # cigar
            U8P, ctypes.c_int32,                       # ref_window, width
            ctypes.c_int64, ctypes.c_int64,            # start, variant
            I32P, ctypes.c_int32, U8P,                 # modes, n_ch, consts
            ctypes.c_int32, ctypes.c_int32,            # min_mapq, min_baseq
            ctypes.c_float, ctypes.c_uint8,            # bq_cap, star
            U8P, ctypes.c_uint8, ctypes.c_uint8,       # base_lut, match, mis
            U8P, U8P,                                  # rows, keep
        ]
    if hasattr(lib, "dv_shuffle_indices"):
        lib.dv_shuffle_indices.restype = None
        lib.dv_shuffle_indices.argtypes = [
            ctypes.c_int32, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32),
        ]
    if hasattr(lib, "dv_fast_align_strings"):
        lib.dv_fast_align_strings.restype = ctypes.c_int32
        lib.dv_fast_align_strings.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
    if hasattr(lib, "dv_ssw_align"):
        lib.dv_ssw_align.restype = ctypes.c_int
        lib.dv_ssw_align.argtypes = [
            ctypes.c_char_p, ctypes.c_int32,   # ref
            ctypes.c_char_p, ctypes.c_int32,   # query
            ctypes.c_int32, ctypes.c_int32,    # match, mismatch
            ctypes.c_int32, ctypes.c_int32,    # gap open, gap extend
            ctypes.POINTER(ctypes.c_int32),    # score
            ctypes.POINTER(ctypes.c_int32),    # ref_begin
            ctypes.POINTER(ctypes.c_int32),    # ref_end
            ctypes.POINTER(ctypes.c_int32),    # query_begin
            ctypes.POINTER(ctypes.c_int32),    # query_end
            ctypes.c_char_p, ctypes.c_int32,   # cigar buf
        ]
    if hasattr(lib, "dv_ssw_align_scored"):
        lib.dv_ssw_align_scored.restype = ctypes.c_int
        lib.dv_ssw_align_scored.argtypes = [
            ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,                    # known_score
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p, ctypes.c_int32,
        ]
    return lib


_LIB = _load()


def crc32c(data: bytes, crc: int = 0) -> int:
    return _LIB.dv_crc32c(data, len(data), crc)


def has_ssw() -> bool:
    return hasattr(_LIB, "dv_ssw_align")


def has_fast_align() -> bool:
    return hasattr(_LIB, "dv_fast_align_strings")


def has_fast_pass() -> bool:
    return hasattr(_LIB, "dv_fast_pass_align")


def has_bam_scan() -> bool:
    return hasattr(_LIB, "dv_bam_scan_count")


def bam_scan(data: bytes, stop_offset: int, ref_id: int, beg: int,
             end: int, drop_flag_mask: int, min_mapq: int):
    """Scan BAM records from a decompressed buffer into SoA arrays.
    Returns (n, flags, refids, poss, mapqs, mrefs, mposs, tlens,
    seq_off, seqs, quals, cig_off, cig_ops, cig_lens, name_off, names,
    aux_off, auxs)."""
    import numpy as np

    totals = np.zeros(6, np.int64)
    I64P = ctypes.POINTER(ctypes.c_int64)
    _LIB.dv_bam_scan_count(
        data, len(data), stop_offset, ref_id, beg, end,
        drop_flag_mask, min_mapq,
        totals.ctypes.data_as(I64P),
    )
    if totals[5]:
        # The span ended mid-record (very long read); caller must
        # retry with a larger decompressed tail.
        return None
    n, seq_bytes, cigar_ops, name_bytes, aux_bytes = (
        int(totals[0]), int(totals[1]), int(totals[2]),
        int(totals[3]), int(totals[4]),
    )
    flags = np.zeros(n, np.uint16)
    refids = np.zeros(n, np.int32)
    poss = np.zeros(n, np.int32)
    mapqs = np.zeros(n, np.uint8)
    mrefs = np.zeros(n, np.int32)
    mposs = np.zeros(n, np.int32)
    tlens = np.zeros(n, np.int32)
    seq_off = np.zeros(n + 1, np.int64)
    seqs = np.zeros(seq_bytes, np.uint8)
    quals = np.zeros(seq_bytes, np.uint8)
    cig_off = np.zeros(n + 1, np.int64)
    cig_ops = np.zeros(cigar_ops, np.int8)
    cig_lens = np.zeros(cigar_ops, np.int32)
    name_off = np.zeros(n + 1, np.int64)
    names = np.zeros(name_bytes, np.uint8)
    aux_off = np.zeros(n + 1, np.int64)
    auxs = np.zeros(aux_bytes, np.uint8)

    def P(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    _LIB.dv_bam_scan_fill(
        data, len(data), stop_offset, ref_id, beg, end,
        drop_flag_mask, min_mapq,
        P(flags, ctypes.c_uint16), P(refids, ctypes.c_int32),
        P(poss, ctypes.c_int32), P(mapqs, ctypes.c_uint8),
        P(mrefs, ctypes.c_int32), P(mposs, ctypes.c_int32),
        P(tlens, ctypes.c_int32),
        P(seq_off, ctypes.c_int64), P(seqs, ctypes.c_uint8),
        P(quals, ctypes.c_uint8),
        P(cig_off, ctypes.c_int64), P(cig_ops, ctypes.c_int8),
        P(cig_lens, ctypes.c_int32),
        P(name_off, ctypes.c_int64), P(names, ctypes.c_uint8),
        P(aux_off, ctypes.c_int64), P(auxs, ctypes.c_uint8),
    )
    return (n, flags, refids, poss, mapqs, mrefs, mposs, tlens,
            seq_off, seqs, quals, cig_off, cig_ops, cig_lens,
            name_off, names, aux_off, auxs)


def has_dbg() -> bool:
    return hasattr(_LIB, "dv_dbg_haplotypes")


def dbg_haplotypes(ref: bytes, reads, quals, mapqs,
                   min_k: int, max_k: int, step_k: int,
                   min_mapq: int, min_base_quality: int,
                   min_edge_weight: int, max_num_paths: int,
                   disable_pruning: bool = False):
    """Native De Bruijn assembly (dv_dbg_haplotypes). Returns the
    sorted haplotype list, [] when the graph yields none, or None when
    no acyclic k exists (the Python build()'s None)."""
    import numpy as np

    offsets = np.zeros(len(reads) + 1, np.int32)
    for i, rd in enumerate(reads):
        offsets[i + 1] = offsets[i] + len(rd)
    concat = b"".join(reads)
    qconcat = b"".join(bytes(q) for q in quals)
    mq = np.asarray(mapqs, np.int32)
    cap = max(1 << 16, 8 * (len(ref) + 64) * max(1, max_num_paths))
    buf = ctypes.create_string_buffer(cap)
    out_len = ctypes.c_int64(0)
    n = _LIB.dv_dbg_haplotypes(
        ref, len(ref), concat,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(reads), qconcat,
        mq.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        min_k, max_k, step_k, min_mapq, min_base_quality,
        min_edge_weight, max_num_paths, int(disable_pruning),
        buf, cap, ctypes.byref(out_len),
    )
    if n == -1:
        return None
    if n == -2:
        raise MemoryError("dbg haplotype buffer too small")
    if n == 0:
        return []
    return buf.raw[: out_len.value].decode().split("\n")[:-1]


def has_ssw_batch() -> bool:
    return hasattr(_LIB, "dv_ssw_score_batch")


def ssw_score_batch(ref: bytes, reads, match: int, mismatch: int,
                    gap_open: int, gap_extend: int):
    """Striped local-alignment SCORES of many reads vs one reference
    (dv_ssw_score_batch; Farrar striping, same affine-gap convention
    as dv_ssw_align)."""
    import numpy as np

    offsets = np.zeros(len(reads) + 1, np.int32)
    for i, rd in enumerate(reads):
        offsets[i + 1] = offsets[i] + len(rd)
    concat = b"".join(reads)
    out = np.zeros(len(reads), np.int32)
    _LIB.dv_ssw_score_batch(
        ref, len(ref), concat,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(reads), match, mismatch, gap_open, gap_extend,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def has_encode_rows() -> bool:
    return hasattr(_LIB, "dv_encode_rows")


def encode_rows(sel, max_keep, pos, mapq, seq, qual, seq_off,
                cig_ops, cig_lens, cig_off, ref_window,
                image_start_pos, variant_start, modes, const_colors,
                min_mapq, min_baseq, bq_cap, star, base_lut,
                match_color, mismatch_color):
    """Batch pileup row painter (dv_encode_rows). Returns
    (rows, keep): rows is (n_sel, W, C) uint8, keep a uint8 mask of
    reads that painted at least one in-window event, passed the
    mapq/base-quality gates, and landed under the max_keep cap."""
    import numpy as np

    n_sel = len(sel)
    width = len(ref_window)
    n_ch = len(modes)
    rows = np.zeros((n_sel, width, n_ch), np.uint8)
    keep = np.zeros(n_sel, np.uint8)

    def P(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    _LIB.dv_encode_rows(
        P(sel, ctypes.c_int32), n_sel, max_keep,
        P(pos, ctypes.c_int64), P(mapq, ctypes.c_uint8),
        P(seq, ctypes.c_uint8), P(qual, ctypes.c_uint8),
        P(seq_off, ctypes.c_int64),
        P(cig_ops, ctypes.c_int8), P(cig_lens, ctypes.c_int32),
        P(cig_off, ctypes.c_int64),
        P(ref_window, ctypes.c_uint8), width,
        image_start_pos, variant_start,
        P(modes, ctypes.c_int32), n_ch,
        P(const_colors, ctypes.c_uint8),
        min_mapq, min_baseq, ctypes.c_float(bq_cap),
        ctypes.c_uint8(star),
        P(base_lut, ctypes.c_uint8),
        ctypes.c_uint8(match_color), ctypes.c_uint8(mismatch_color),
        P(rows, ctypes.c_uint8), P(keep, ctypes.c_uint8),
    )
    return rows, keep


def has_ssw_multi() -> bool:
    return hasattr(_LIB, "dv_ssw_score_multi")


def ssw_score_multi(haplotypes, hap_mask, reads, match: int,
                    mismatch: int, gap_open: int, gap_extend: int):
    """Striped local-alignment SCORES of every (haplotype, read) pair
    in one call (dv_ssw_score_multi); each read's query profile is
    built once and reused across haplotypes. hap_mask rows left 0."""
    import numpy as np

    def offs(seqs):
        o = np.zeros(len(seqs) + 1, np.int32)
        np.cumsum([len(s) for s in seqs], out=o[1:])
        return o

    hap_offsets = offs(haplotypes)
    read_offsets = offs(reads)
    mask = np.asarray(hap_mask, np.uint8)
    out = np.zeros((len(haplotypes), len(reads)), np.int32)
    I32P = ctypes.POINTER(ctypes.c_int32)
    # dv_ssw_score_multi2 dispatches to the AVX2 stripe when the CPU
    # has it; fall back to the SSE2 symbol on older builds of the .so.
    fn = getattr(_LIB, "dv_ssw_score_multi2", None) \
        or _LIB.dv_ssw_score_multi
    fn(
        b"".join(haplotypes), hap_offsets.ctypes.data_as(I32P),
        len(haplotypes),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b"".join(reads), read_offsets.ctypes.data_as(I32P),
        len(reads), match, mismatch, gap_open, gap_extend,
        out.ctypes.data_as(I32P),
    )
    return out


def has_merge_cigar() -> bool:
    return hasattr(_LIB, "dv_merge_read_to_ref_cigar")


# Scratch buffers for the (tiny, very frequent) cigar-merge calls:
# per-call numpy construction would cost more than the merge itself.
_MC_CAP = 65536
_mc_bufs = None


def merge_read_to_ref_cigar(read_len: int, read_to_hap, hap_to_ref,
                            read_to_hap_pos: int):
    """CalculateReadToRefAlignment merge (dv_merge_read_to_ref_cigar).
    read_to_hap / hap_to_ref: sequences of [op, len]. Returns the
    merged [[op, len], ...], [] for the leftover-read case (the Python
    implementation's `return []`), or None for its AssertionError
    paths."""
    global _mc_bufs
    if _mc_bufs is None:
        arr = ctypes.c_int32 * _MC_CAP
        _mc_bufs = (arr(), arr(), arr(), arr(), arr(), arr())
    rh_o, rh_l, hr_o, hr_l, out_o, out_l = _mc_bufs
    n_rh, n_hr = len(read_to_hap), len(hap_to_ref)
    if n_rh > _MC_CAP or n_hr > _MC_CAP:
        return None
    for i, (o, l) in enumerate(read_to_hap):
        rh_o[i] = o
        rh_l[i] = l
    for i, (o, l) in enumerate(hap_to_ref):
        hr_o[i] = o
        hr_l[i] = l
    n = _LIB.dv_merge_read_to_ref_cigar(
        read_len, rh_o, rh_l, n_rh, hr_o, hr_l, n_hr,
        read_to_hap_pos, out_o, out_l, _MC_CAP,
    )
    if n == -3:
        return []  # python "return []" (leftover read cigar)
    if n < 0:
        return None  # python AssertionError paths
    return [[out_o[i], out_l[i]] for i in range(n)]


def has_shuffle() -> bool:
    return hasattr(_LIB, "dv_shuffle_indices")


def shuffle_indices(n: int, seed: int):
    """std::shuffle(iota(n), mt19937_64(seed)) with LIBC++ draw
    semantics — the exact crowded-pileup downsample permutation of the
    reference's release builds (pileup_image_native.cc:153; pinned by
    the crowded trio parent-band goldens)."""
    import numpy as np

    out = np.empty(n, np.int32)
    _LIB.dv_shuffle_indices(
        n, ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def fast_pass_align(reads, haplotypes, ref_hap_index: int, k: int,
                    max_mm: int, match: int, mismatch_pen: int,
                    ref_prefix_len: int, ref_suffix_len: int):
    """Full fast pass over all (haplotype, read) pairs.

    reads/haplotypes: lists of bytes (ACGT-only; caller checks).
    Returns (scores, positions, hap_scores): scores/positions are
    (n_haps, n_reads) int32 arrays, position -1 = unaligned.
    """
    import numpy as np

    reads_buf = b"".join(reads)
    read_offsets = np.zeros(len(reads) + 1, np.int32)
    np.cumsum([len(r) for r in reads], out=read_offsets[1:])
    hap_buf = b"".join(haplotypes)
    hap_offsets = np.zeros(len(haplotypes) + 1, np.int32)
    np.cumsum([len(h) for h in haplotypes], out=hap_offsets[1:])
    n_haps, n_reads = len(haplotypes), len(reads)
    scores = np.zeros((n_haps, n_reads), np.int32)
    positions = np.full((n_haps, n_reads), -1, np.int32)
    hap_scores = np.zeros(n_haps, np.int32)
    rc = _LIB.dv_fast_pass_align(
        reads_buf, read_offsets.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)), n_reads,
        hap_buf, hap_offsets.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)), n_haps,
        ref_hap_index, k, max_mm, match, mismatch_pen,
        ref_prefix_len, ref_suffix_len,
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        hap_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"dv_fast_pass_align failed: {rc}")
    return scores, positions, hap_scores


def fast_align_strings(s1: bytes, s2: bytes, max_mismatches: int,
                       match: int, mismatch_pen: int):
    """(score, num_mismatches) — native FastAlignStrings."""
    mm = ctypes.c_int32()
    score = _LIB.dv_fast_align_strings(
        s1, s2, min(len(s1), len(s2)), max_mismatches, match,
        mismatch_pen, ctypes.byref(mm),
    )
    return score, mm.value


def fast_align_strings_at(haystack: bytes, offset: int, needle: bytes,
                          max_mismatches: int, match: int,
                          mismatch_pen: int):
    """Like fast_align_strings but compares needle against
    haystack[offset:offset+len(needle)] without slicing (pointer
    arithmetic; haystack must outlive the call)."""
    mm = ctypes.c_int32()
    base = ctypes.cast(ctypes.c_char_p(haystack), ctypes.c_void_p).value
    s1 = ctypes.cast(base + offset, ctypes.c_char_p)
    score = _LIB.dv_fast_align_strings(
        s1, needle, len(needle), max_mismatches, match, mismatch_pen,
        ctypes.byref(mm),
    )
    return score, mm.value


def ssw_align(ref: bytes, query: bytes, match: int, mismatch: int,
              gap_open: int, gap_extend: int, known_score: int = 0):
    """Native affine-gap SW. Returns (score, ref_begin, ref_end,
    query_begin, query_end, cigar_string) or None when score <= 0.

    known_score > 0 must be the alignment's exact SW optimum (e.g.
    from ssw_score_multi); the forward pass then early-exits at the
    first row attaining it — identical output, ~half the DP."""
    score = ctypes.c_int32()
    rb = ctypes.c_int32()
    re_ = ctypes.c_int32()
    qb = ctypes.c_int32()
    qe = ctypes.c_int32()
    buf = ctypes.create_string_buffer(4 * max(len(query), 16) + 64)
    if known_score > 0 and hasattr(_LIB, "dv_ssw_align_scored"):
        rc = _LIB.dv_ssw_align_scored(
            ref, len(ref), query, len(query), match, mismatch,
            gap_open, gap_extend, known_score, ctypes.byref(score),
            ctypes.byref(rb), ctypes.byref(re_), ctypes.byref(qb),
            ctypes.byref(qe), buf, len(buf),
        )
    else:
        rc = _LIB.dv_ssw_align(
            ref, len(ref), query, len(query), match, mismatch, gap_open,
            gap_extend, ctypes.byref(score), ctypes.byref(rb),
            ctypes.byref(re_), ctypes.byref(qb), ctypes.byref(qe),
            buf, len(buf),
        )
    if rc == 1:
        return None
    if rc != 0:
        raise RuntimeError("dv_ssw_align cigar buffer overflow")
    return (score.value, rb.value, re_.value, qb.value, qe.value,
            buf.value.decode())


def bgzf_decompress_all(raw: bytes) -> bytes:
    import numpy as np

    # First pass: compute total uncompressed size from ISIZE fields.
    size = _LIB.dv_bgzf_inflate_all(raw, len(raw), None, 0)
    if size < 0:
        raise ValueError("invalid BGZF stream")
    out = np.empty(size, dtype=np.uint8)
    got = _LIB.dv_bgzf_inflate_all(
        raw, len(raw), out.ctypes.data_as(ctypes.c_void_p), size
    )
    if got != size:
        raise ValueError("BGZF inflate failed")
    return out.tobytes()


def rans_decode_native(buf: bytes):
    """CRAM rANS 4x8 block decode via dv_rans_decode; None if the
    native library is unavailable or decode fails."""
    import struct

    lib = _LIB
    if lib is None or not hasattr(lib, "dv_rans_decode"):
        return None
    if len(buf) < 9:
        return None
    (out_size,) = struct.unpack_from("<I", buf, 5)
    out = ctypes.create_string_buffer(out_size or 1)
    n = lib.dv_rans_decode(buf, len(buf), out, max(out_size, 1))
    if n < 0:
        return None
    return out.raw[:n]

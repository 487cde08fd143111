"""Affine-gap local alignment (striped-Smith-Waterman semantics).

Replaces the reference's libssw wrapper (deepvariant/realigner/ssw.{h,cc},
WORKSPACE libssw). Same scoring convention: positive match score, positive
mismatch/gap penalties; alignment yields (score, ref_begin, cigar over
"=XIDS") with soft clips for unaligned query ends — the shape
FastPassAligner consumes.

The exact alignment REPORTED for a given optimal score is not unique;
the realigner goldens pin the choices the SSW library family makes, so
this module reproduces that three-phase procedure semantically:

1. Forward pass: full local DP. Endpoint = the lexicographically
   smallest (ref_end, query_end) among maximum-score cells (the striped
   scan keeps the first column where the running maximum strictly
   increases, then the smallest de-striped query index in that column).
2. Reverse pass: local DP over the reversed prefixes ending at the
   chosen endpoint, terminated at the first reversed-ref column that
   reaches the best score. Net effect: among co-optimal start points,
   the largest (ref_begin, query_begin) — the shortest span — wins.
3. Banded global alignment of the [begin..end] subsegments produces the
   cigar. Tie-breaks: diagonal beats gaps on equal score, a deletion
   (ref gap) beats an insertion on equal gap scores, and gap extension
   beats re-opening on equal scores. 'M' runs are split into '='/'X' by
   base comparison afterwards (the ssw_cpp post-pass behavior).

Phases 1-2 are numpy DPs; phase 3 is a small banded DP over the matched
subsegment. The native path (native/dvnative.cc dv_ssw_align) implements
the identical procedure in C++. Only reads that fail the k-mer fast pass
reach this code; a batched Pallas DP kernel is the planned upgrade for
long-read profiles.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

_NEG = np.int32(-(1 << 28))


@dataclasses.dataclass
class Alignment:
    sw_score: int = 0
    ref_begin: int = 0
    ref_end: int = 0       # exclusive on ref
    query_begin: int = 0
    query_end: int = 0     # exclusive on query
    cigar_string: str = ""


def _rle(ops: List[str]) -> str:
    out = []
    i = 0
    while i < len(ops):
        j = i
        while j < len(ops) and ops[j] == ops[i]:
            j += 1
        out.append(f"{j - i}{ops[i]}")
        i = j
    return "".join(out)


class SswAligner:
    """match/mismatch/gap_open/gap_extend local aligner."""

    def __init__(self, match: int = 4, mismatch: int = 6,
                 gap_open: int = 8, gap_extend: int = 2):
        assert gap_open >= gap_extend >= 0, \
            "prefix-scan F recurrence requires gap_open >= gap_extend"
        self.match = int(match)
        self.mismatch = int(mismatch)
        self.gap_open = int(gap_open)
        self.gap_extend = int(gap_extend)
        self._ref: Optional[np.ndarray] = None

    def set_reference_sequence(self, reference: str):
        self._ref_bytes = reference.upper().encode()
        self._ref = np.frombuffer(self._ref_bytes, np.uint8)

    def _align_native(self, query: str, known_score: int = 0):
        """Native C DP (native/dvnative.cc dv_ssw_align) — identical
        scores/cigars, ~100x faster than the numpy path."""
        try:
            from deepvariant_tpu.io import native
        except Exception:
            return NotImplemented
        if not native.has_ssw():
            return NotImplemented
        result = native.ssw_align(
            self._ref_bytes, query.upper().encode(), self.match,
            self.mismatch, self.gap_open, self.gap_extend,
            known_score=known_score,
        )
        if result is None:
            return Alignment()
        score, rb, re_, qb, qe, cigar = result
        return Alignment(
            sw_score=score, ref_begin=rb, ref_end=re_,
            query_begin=qb, query_end=qe, cigar_string=cigar,
        )

    # -- numpy local DP ----------------------------------------------------

    def _dp_matrix(self, ref: np.ndarray, q: np.ndarray) -> np.ndarray:
        """Full H matrix of local SW; rows = ref positions (1-based)."""
        n, m = len(ref), len(q)
        o, e = self.gap_open, self.gap_extend
        H = np.zeros((n + 1, m + 1), np.int32)
        E = np.full(m + 1, _NEG, np.int32)
        sub = np.where(
            ref[:, None] == q[None, :], self.match, -self.mismatch
        ).astype(np.int32)
        col_idx = np.arange(m, dtype=np.int32)
        for i in range(1, n + 1):
            E = np.maximum(H[i - 1] - o, E - e)
            diag = np.empty(m + 1, np.int32)
            diag[0] = _NEG
            diag[1:] = H[i - 1, :-1] + sub[i - 1]
            h0 = np.maximum(0, np.maximum(diag, E))
            # F[j] = max_{k<j} (h0[k] - o - (j-1-k)*e), via prefix max
            run = np.maximum.accumulate(h0[:-1] + col_idx * e)
            F = run - o - col_idx * e
            H[i, 0] = 0
            H[i, 1:] = np.maximum(h0[1:], F)
        return H

    def _banded_global(self, ref: np.ndarray, q: np.ndarray,
                       score: int) -> List[str]:
        """Banded global DP over the matched subsegment, reproducing the
        band/rolling-buffer procedure of the SSW library's cigar stage
        (out-of-band neighbors read as 0, band doubling until the target
        score is reached). Returns per-base ops 'M'/'I'/'D' (query-major:
        'I' consumes query, 'D' consumes ref)."""
        ref_len, read_len = len(ref), len(q)
        go, ge = self.gap_open, self.gap_extend
        mt, mm = self.match, self.mismatch
        band_width = abs(ref_len - read_len) + 1
        while True:
            width = band_width * 2 + 3
            width_d = band_width * 2 + 1
            h_b = [0] * width
            e_b = [0] * width
            h_c = [0] * width
            # direction[i][x*3 + p]; p: 0=E entry, 1=F entry, 2=H entry
            direction = [[0] * (width_d * 3) for _ in range(read_len)]
            max_score = 0
            u = 0
            for i in range(read_len):
                beg = max(0, i - band_width)
                end = min(ref_len - 1, i + band_width)
                edge = min(end + 1, width - 1)
                f = h_b[0] = e_b[0] = h_b[edge] = e_b[edge] = h_c[0] = 0
                dline = direction[i]
                off_i = max(0, i - band_width)
                off_p = max(0, i - 1 - band_width)
                for j in range(beg, end + 1):
                    u = j - off_i + 1
                    eu = j - off_p + 1
                    b = j - 1 - off_i + 1
                    d = j - 1 - off_p + 1
                    x3 = (j - off_i) * 3
                    if i == 0:
                        t1, t2 = -go, -ge
                    else:
                        t1 = h_b[eu] - go
                        t2 = e_b[eu] - ge
                    e_val = t1 if t1 > t2 else t2
                    e_dir = 3 if t1 > t2 else 2
                    e_b[u] = e_val
                    dline[x3] = e_dir

                    t1 = h_c[b] - go
                    t2 = f - ge
                    f = t1 if t1 > t2 else t2
                    f_dir = 5 if t1 > t2 else 4
                    dline[x3 + 1] = f_dir

                    e1 = e_val if e_val > 0 else 0
                    f1 = f if f > 0 else 0
                    t1 = e1 if e1 > f1 else f1
                    t2 = h_b[d] + (mt if ref[j] == q[i] else -mm)
                    h_c[u] = t1 if t1 > t2 else t2
                    if h_c[u] > max_score:
                        max_score = h_c[u]
                    if t1 <= t2:
                        dline[x3 + 2] = 1
                    else:
                        dline[x3 + 2] = e_dir if e1 > f1 else f_dir
                h_b[:u + 1] = h_c[:u + 1]
            if max_score >= score:
                break
            band_width *= 2
        # Traceback from (read_len-1, ref_len-1) in H state.
        ops: List[str] = []
        i, j = read_len - 1, ref_len - 1
        p = 2  # 0=E, 1=F, 2=H
        while i > 0 or j > 0:
            x = j - max(0, i - band_width)
            dval = direction[i][x * 3 + p]
            if dval == 1:
                ops.append('M')
                i -= 1
                j -= 1
                p = 2
            elif dval == 2:
                ops.append('I')
                i -= 1
                p = 0
            elif dval == 3:
                ops.append('I')
                i -= 1
                p = 2
            elif dval == 4:
                ops.append('D')
                j -= 1
                p = 1
            else:  # 5
                ops.append('D')
                j -= 1
                p = 2
        ops.append('M')  # cell (0, 0): the first aligned pair
        ops.reverse()
        return ops

    def align(self, query: str, known_score: int = 0) -> Alignment:
        """known_score > 0 must be this alignment's exact SW optimum
        (e.g. from the batch score kernel); the native forward pass
        then early-exits with identical output."""
        assert self._ref is not None, "call set_reference_sequence first"
        q = np.frombuffer(query.upper().encode(), np.uint8)
        ref = self._ref
        n, m = len(ref), len(q)
        if n == 0 or m == 0:
            return Alignment()
        native_result = self._align_native(query, known_score)
        if native_result is not NotImplemented:
            return native_result
        # Phase 1: forward endpoint.
        H = self._dp_matrix(ref, q)
        best = int(H.max())
        if best <= 0:
            return Alignment()
        flat = int(H.argmax())  # row-major: smallest ref row, then query
        re_i, re_j = divmod(flat, m + 1)  # 1-based inclusive end + 1 - 1
        # Phase 2: reverse-pass begins (shortest span among co-optimal).
        ref_rev = ref[:re_i][::-1]
        q_rev = q[:re_j][::-1]
        Hr = self._dp_matrix(ref_rev, q_rev)
        hit_rows = np.flatnonzero((Hr == best).any(axis=1))
        ri = int(hit_rows[0])
        rj = int(np.flatnonzero(Hr[ri] == best)[0])
        ref_begin = re_i - ri      # 0-based inclusive start on ref
        query_begin = re_j - rj    # 0-based inclusive start on query
        # Phase 3: banded global cigar over the subsegment.
        ops = self._banded_global(
            ref[ref_begin:re_i], q[query_begin:re_j], best
        )
        # Split 'M' into '='/'X' by base comparison (ssw_cpp post-pass).
        out_ops: List[str] = []
        pi, pj = query_begin, ref_begin
        for op in ops:
            if op == 'M':
                out_ops.append("=" if ref[pj] == q[pi] else "X")
                pi += 1
                pj += 1
            elif op == 'I':
                out_ops.append('I')
                pi += 1
            else:
                out_ops.append('D')
                pj += 1
        cigar = []
        if query_begin > 0:
            cigar.append(f"{query_begin}S")
        if out_ops:
            cigar.append(_rle(out_ops))
        if m - re_j > 0:
            cigar.append(f"{m - re_j}S")
        return Alignment(
            sw_score=best,
            ref_begin=ref_begin,
            ref_end=re_i,
            query_begin=query_begin,
            query_end=re_j,
            cigar_string="".join(cigar),
        )

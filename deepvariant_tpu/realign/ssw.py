"""Affine-gap local alignment (Smith-Waterman) with traceback.

Replaces the reference's libssw wrapper (deepvariant/realigner/ssw.{h,cc},
WORKSPACE libssw). Same scoring convention: positive match score, positive
mismatch/gap penalties; alignment yields (score, ref_begin, cigar over
"=XIDS") with soft clips for unaligned query ends — the shape
FastPassAligner consumes.

Implementation: numpy DP vectorized along the query axis with one Python
loop over reference rows. The in-row F (insertion) recurrence is solved
exactly with a prefix-max scan — valid whenever gap_open >= gap_extend
(true for the DeepVariant scoring 8/2): re-opening a gap from a cell that
was itself gap-updated can never beat extending the original gap.
Matrices here are small (reads 100-300bp x windows <=1.3kb) and only
reads that fail the k-mer fast pass reach this code; a batched Pallas DP
kernel is the planned upgrade for long-read profiles.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

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

    def _align_native(self, query: str):
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
        )
        if result is None:
            return Alignment()
        score, rb, re_, qb, qe, cigar = result
        return Alignment(
            sw_score=score, ref_begin=rb, ref_end=re_,
            query_begin=qb, query_end=qe, cigar_string=cigar,
        )

    def align(self, query: str) -> Alignment:
        assert self._ref is not None, "call set_reference_sequence first"
        q = np.frombuffer(query.upper().encode(), np.uint8)
        n, m = len(self._ref), len(q)
        if n == 0 or m == 0:
            return Alignment()
        native_result = self._align_native(query)
        if native_result is not NotImplemented:
            return native_result
        o, e = self.gap_open, self.gap_extend
        H = np.zeros((n + 1, m + 1), np.int32)
        E = np.full((n + 1, m + 1), _NEG, np.int32)  # del (consumes ref)
        F = np.full((n + 1, m + 1), _NEG, np.int32)  # ins (consumes query)
        sub = np.where(
            self._ref[:, None] == q[None, :], self.match, -self.mismatch
        ).astype(np.int32)
        col_idx = np.arange(m, dtype=np.int32)  # k = 0..m-1 source columns
        for i in range(1, n + 1):
            E[i] = np.maximum(H[i - 1] - o, E[i - 1] - e)
            diag = np.empty(m + 1, np.int32)
            diag[0] = _NEG
            diag[1:] = H[i - 1, :-1] + sub[i - 1]
            h0 = np.maximum(0, np.maximum(diag, E[i]))
            # F[j] = max_{k<j} (h0[k] - o - (j-1-k)*e)
            #      = running_max(h0[k] + k*e) - o - (j-1)*e
            run = np.maximum.accumulate(h0[:-1] + col_idx * e)
            F[i, 1:] = run - o - col_idx * e
            H[i] = np.maximum(h0, F[i])
        best = int(H.max())
        if best <= 0:
            return Alignment()
        i, j = np.unravel_index(int(H.argmax()), H.shape)
        i, j = int(i), int(j)
        end_i, end_j = i, j
        ops: List[str] = []
        state = "H"
        while i > 0 and j > 0:
            if state == "H":
                if H[i, j] == 0:
                    break
                diag_score = H[i - 1, j - 1] + sub[i - 1, j - 1]
                if H[i, j] == diag_score:
                    ops.append(
                        "=" if self._ref[i - 1] == q[j - 1] else "X"
                    )
                    i -= 1
                    j -= 1
                elif H[i, j] == E[i, j]:
                    state = "E"
                else:
                    state = "F"
            elif state == "E":
                ops.append("D")
                came_from_ext = E[i, j] == E[i - 1, j] - e
                i -= 1
                if not came_from_ext:
                    state = "H"
            else:  # F
                ops.append("I")
                came_from_ext = F[i, j] == F[i, j - 1] - e
                j -= 1
                if not came_from_ext:
                    state = "H"
        ops.reverse()
        cigar = []
        if j > 0:
            cigar.append(f"{j}S")
        if ops:
            cigar.append(_rle(ops))
        if m - end_j > 0:
            cigar.append(f"{m - end_j}S")
        return Alignment(
            sw_score=best,
            ref_begin=i,
            ref_end=end_i,
            query_begin=j,
            query_end=end_j,
            cigar_string="".join(cigar),
        )

"""Assembly-window selection from allele-count evidence.

Behavior parity with reference window_selector.{py,cc}:
  * per-position candidate scores from the AlleleCounter over the region
    expanded by `region_expansion_in_bp` (window_selector.py:39-87);
  * VARIANT_READS model: each kept alt allele spreads its read count over
    positions by CIGAR type — SUB [i, i+1), INS/CLIP [i+1-(len-1), i+len),
    DEL [i+1, i+len) (window_selector.cc:105-146); positions with
    min<=count<=max become candidates;
  * ALLELE_COUNT_LINEAR model: weighted sum with learned coefficients,
    threshold at decision_boundary (window_selector.cc:149-208);
  * candidates merge into windows of radius min_windows_distance, merged
    when within 2*distance (window_selector.py:163-210).

The per-position accumulation is vectorized with np.add.at over
(start,end) difference arrays rather than the reference's per-position
loops.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from deepvariant_tpu.core.types import Range
from deepvariant_tpu.io.bam import ReadBatch
from deepvariant_tpu.make_examples.allele_counter import (
    AlleleCounter,
    AlleleCounterOptions,
    DELETION,
    INSERTION,
    REFERENCE,
    SOFT_CLIP,
    SUBSTITUTION,
)
from deepvariant_tpu.realign.config import WindowSelectorOptions


def _allele_filter(allele, total_count: int,
                   config: WindowSelectorOptions) -> bool:
    """window_selector.cc:63-82 AlleleFilter."""
    if allele.type == REFERENCE:
        return False
    if allele.count < config.min_allele_support:
        return False
    if config.enable_strict_insertion_filter:
        if allele.type == INSERTION and len(allele.bases) <= 2:
            return total_count > 0 and \
                allele.count / total_count >= 0.08
    return True


def _range_update(acc: np.ndarray, start: int, end: int, by):
    start = max(start, 0)
    end = min(end, len(acc))
    if start < end:
        acc[start:end] += by


def variant_reads_counts(
    counter: AlleleCounter, config: WindowSelectorOptions
) -> np.ndarray:
    """Per-position supporting-read counts (window_selector.cc:105-146)."""
    width = len(counter.interval)
    counts = np.zeros(width, np.int64)
    for i in counter.positions_with_alleles():
        total = counter.total_allele_count(i)
        for allele in counter.sum_allele_counts(i):
            if not _allele_filter(allele, total, config):
                continue
            if allele.type == SUBSTITUTION:
                _range_update(counts, i, i + 1, allele.count)
            elif allele.type in (SOFT_CLIP, INSERTION):
                n = len(allele.bases)
                _range_update(counts, i + 1 - (n - 1), i + n, allele.count)
            elif allele.type == DELETION:
                n = len(allele.bases)
                _range_update(counts, i + 1, i + n, allele.count)
    return counts


def allele_count_linear_scores(
    counter: AlleleCounter, config: WindowSelectorOptions
) -> np.ndarray:
    """Per-position linear-model scores (window_selector.cc:149-208)."""
    model = config.allele_count_linear_model
    width = len(counter.interval)
    scores = np.full(width, model.bias, np.float64)
    # Reference-supporting reads contribute at their own position.
    scores += counter.ref_count * model.coeff_reference
    coeff = {
        SUBSTITUTION: model.coeff_substitution,
        SOFT_CLIP: model.coeff_soft_clip,
        INSERTION: model.coeff_insertion,
        DELETION: model.coeff_deletion,
    }
    for i in counter.positions_with_alleles():
        pc = counter.position_count(i)
        # The C++ kernel iterates raw read alleles (incl. low-quality).
        for rec in pc.read_alleles.values():
            c = coeff.get(rec.type)
            if c is None:
                continue
            if rec.type == SUBSTITUTION:
                _range_update(scores, i, i + 1, c)
            elif rec.type in (SOFT_CLIP, INSERTION):
                n = len(rec.bases)
                _range_update(scores, i + 1 - (n - 1), i + n, c)
            elif rec.type == DELETION:
                n = len(rec.bases)
                _range_update(scores, i + 1, i + n, c)
    return scores


def candidates_from_reads(
    config: WindowSelectorOptions,
    ref_query,
    batch: ReadBatch,
    region: Range,
    contig_length: Optional[int] = None,
) -> List[int]:
    """Candidate realignment positions in `region` (expanded)."""
    start = max(0, region.start - config.region_expansion_in_bp)
    end = region.end + config.region_expansion_in_bp
    if contig_length is not None:
        end = min(end, contig_length)
    expanded = Range(region.reference_name, start, end)
    ref_bases = ref_query(expanded)
    if isinstance(ref_bases, str):
        ref_bases = np.frombuffer(ref_bases.encode(), np.uint8)
    prev = "N"
    if start > 0:
        prev_arr = ref_query(Range(region.reference_name, start - 1, start))
        prev = prev_arr if isinstance(prev_arr, str) else \
            bytes(prev_arr).decode()
    counter = AlleleCounter(
        ref_bases,
        expanded,
        AlleleCounterOptions(
            min_base_quality=config.min_base_quality,
            min_mapping_quality=config.min_mapq,
            keep_legacy_behavior=config.keep_legacy_behavior,
        ),
        ref_prev_base=prev,
    )
    keep = batch.mapq >= config.min_mapq
    counter.add_batch(batch.subset(np.nonzero(keep)[0]))

    if config.model_type == "variant_reads":
        model = config.variant_reads_model
        counts = variant_reads_counts(counter, config)
        return [
            expanded.start + i
            for i, c in enumerate(counts)
            if model.min_num_supporting_reads <= c
            <= model.max_num_supporting_reads
        ]
    elif config.model_type == "allele_count_linear":
        model = config.allele_count_linear_model
        scores = allele_count_linear_scores(counter, config)
        return [
            expanded.start + i
            for i, s in enumerate(scores)
            if s > model.decision_boundary
        ]
    raise ValueError(f"unknown window selector model {config.model_type}")


def candidates_to_windows(
    config: WindowSelectorOptions,
    candidate_pos: Sequence[int],
    ref_name: str,
) -> List[Range]:
    """Merge candidate positions into assembly windows
    (window_selector.py:163-210)."""
    windows: List[Range] = []

    def add_window(start_pos: int, end_pos: int):
        windows.append(Range(
            ref_name,
            start_pos - config.min_windows_distance,
            end_pos + config.min_windows_distance,
        ))

    start_pos, end_pos = None, None
    for pos in sorted(candidate_pos):
        if start_pos is None:
            start_pos, end_pos = pos, pos
        elif pos > end_pos + 2 * config.min_windows_distance:
            add_window(start_pos, end_pos)
            start_pos, end_pos = pos, pos
        else:
            end_pos = pos
    if start_pos is not None:
        add_window(start_pos, end_pos)
    return sorted(windows, key=lambda r: (r.reference_name, r.start, r.end))


def select_windows(
    config: WindowSelectorOptions,
    ref_query,
    batch: ReadBatch,
    region: Range,
    contig_length: Optional[int] = None,
) -> List[Range]:
    """Candidate windows for local assembly (window_selector.py:212)."""
    if config.realign_all:
        return candidates_to_windows(
            config, list(range(region.start, region.end)),
            region.reference_name,
        )
    candidates = candidates_from_reads(
        config, ref_query, batch, region, contig_length
    )
    return candidates_to_windows(config, candidates, region.reference_name)

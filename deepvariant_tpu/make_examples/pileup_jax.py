"""Batched device-side pileup encoding (JAX).

TPU-first split of the pileup encoder (pileup.py): the irregular,
data-dependent work — per-read CIGAR walks, read drop rules, row
sorting/downsampling — runs once per region on the host and produces
dense tensors; the per-pixel channel math (LUTs, scaling, masking) runs
as one jitted gather+elementwise program over ALL candidates of the
region at once, emitting (N, H, W, C) uint8 ready to feed the CNN
without leaving the device (see parallel.distribute.fused_encode_infer).

Numerics are identical to the numpy encoder for the core channel set
{read_base, base_quality, mapping_quality, strand,
read_supports_variant, base_differs_from_ref, insert_size,
haplotype_tag} — asserted by tests against real data.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from deepvariant_tpu.io.bam import FLAG_FIRST, FLAG_PAIRED, ReadBatch
from deepvariant_tpu.make_examples.pileup import (
    CH_ALLELE_FREQUENCY,
    CH_BASE_DIFFERS_FROM_REF,
    CH_BASE_QUALITY,
    CH_HAPLOTYPE_TAG,
    CH_INSERT_SIZE,
    CH_MAPPING_QUALITY,
    CH_READ_BASE,
    CH_READ_SUPPORTS_VARIANT,
    CH_STRAND,
    CH_SUPPLEMENTARY_ALIGNMENT,
    MAX_PIXEL_FLOAT,
    PileupEncoder,
    PileupOptions,
    reads_overlapping_variant,
)
from deepvariant_tpu.make_examples.variant_caller import DeepVariantCall


@dataclasses.dataclass
class RegionTensors:
    """Host-prepared dense view of a region's reads."""

    span_start: int             # genome position of column 0
    bases: np.ndarray           # (K, Wr) uint8, 0 = uncovered
    quals: np.ndarray           # (K, Wr) uint8 (final event per col)
    min_quals: np.ndarray       # (K, Wr) uint8 (min event qual per col)
    mapq: np.ndarray            # (K,) uint8
    reverse: np.ndarray         # (K,) bool
    hp: np.ndarray              # (K,) int8
    tlen: np.ndarray            # (K,) int32
    supplementary: np.ndarray = None  # (K,) bool (flag 0x800)


def build_region_tensors(
    encoder: PileupEncoder,
    batch: ReadBatch,
    span_start: int,
    span_end: int,
) -> RegionTensors:
    """One CIGAR walk per read per REGION over [span_start, span_end).

    Round-5 stream-economics finding (deploy/stream_study_r05.json):
    the naive version re-walked every read's cigar for every
    candidate, making row PLANNING 61% of device-encode stage-1. Two
    fixes, both exact: (a) only reads overlapping the span are
    touched, (b) each read's walk is computed once per batch in
    GLOBAL coordinates and memoized on the batch, so the ~6
    candidates per partition slice instead of re-walking."""
    width = span_end - span_start
    k = len(batch)
    bases = np.zeros((k, width), np.uint8)
    quals = np.zeros((k, width), np.uint8)
    min_quals = np.full((k, width), 255, np.uint8)
    cache = getattr(batch, "_plan_walk_cache", None)
    if cache is None:
        cache = {}
        batch._plan_walk_cache = cache
        batch._plan_ref_ends = batch.reference_ends()
    ends = batch._plan_ref_ends
    overlapping = np.flatnonzero(
        (batch.pos < span_end) & (ends > span_start)
    )
    for r in overlapping:
        r = int(r)
        entry = cache.get(r)
        if entry is None:
            pos = int(batch.pos[r])
            span = max(int(ends[r]) - pos, 1)
            c_local, b, q = encoder._walk_events(batch, r, pos, span)
            if c_local is None:
                entry = (None, None, None)
            else:
                entry = (c_local + pos, b, q)  # global columns
            cache[r] = entry
        cols_g, b, q = entry
        if cols_g is None:
            continue
        sel = (cols_g >= span_start) & (cols_g < span_end)
        if not sel.any():
            continue
        cols = cols_g[sel] - span_start
        bases[r, cols] = b[sel]
        quals[r, cols] = q[sel]
        np.minimum.at(min_quals[r], cols, q[sel])
    return RegionTensors(
        span_start=span_start,
        bases=bases,
        quals=quals,
        min_quals=min_quals,
        mapq=batch.mapq.copy(),
        reverse=np.asarray(batch.is_reverse()),
        hp=batch.hp.copy()
        if len(batch.hp) == k else np.zeros(k, np.int8),
        tlen=batch.tlen.copy(),
        supplementary=np.asarray((batch.flag & 0x800) != 0),
    )


@dataclasses.dataclass
class CandidatePlan:
    """Row layout for one (candidate, alt-combo) example."""

    window_start: int             # genome position of window col 0
    row_reads: np.ndarray         # (H - band,) int32, -1 = empty row
    support_codes: np.ndarray     # (K,) int8
    af_colors: np.ndarray         # (K,) uint8
    ref_window: np.ndarray        # (W,) uint8


def plan_candidate(
    encoder: PileupEncoder,
    tensors: RegionTensors,
    dv_call: DeepVariantCall,
    batch: ReadBatch,
    alt_alleles: Sequence[str],
    ref_window: np.ndarray,
    read_indices: Optional[Sequence[int]] = None,
    sort_positions: Optional[np.ndarray] = None,
) -> CandidatePlan:
    """Mirror build_pileup's read selection/sort (pileup.py:350-447).

    `read_indices` overrides the overlap query (alt-aligned pileups
    take ALL realigned reads, examples_builder.py _build_alt_images);
    `sort_positions` overrides the position sort component (trimmed
    pileups sort by ORIGINAL alignment positions)."""
    o = encoder.options
    variant = dv_call.variant
    image_start = variant.start - o.half_width
    call_col = variant.start - tensors.span_start
    if read_indices is None:
        read_indices = reads_overlapping_variant(
            batch, variant, o.read_overlap_buffer_bp
        )
    indices = list(read_indices)
    max_reads = o.max_reads
    if len(indices) > max_reads:
        # Same crowded-window shuffle as the host painter (libc++
        # std::shuffle via the native library when present,
        # pileup.py build_pileup permute()).
        order = None
        try:
            from deepvariant_tpu.io import native

            if native.has_shuffle():
                order = native.shuffle_indices(
                    len(indices), o.random_seed
                )
        except Exception:
            pass
        if order is None:
            rng = np.random.Generator(np.random.Philox(o.random_seed))
            order = rng.permutation(len(indices))
        indices = [indices[i] for i in order]

    alt_order = {a: i for i, a in enumerate(variant.alternate_bases)}
    support_group = {}
    if o.sort_by_alt_allele_support:
        for alt, ids in dv_call.allele_support.items():
            gi = alt_order.get(alt)
            if gi is not None:
                for rid in ids:
                    support_group[rid] = gi

    k = len(batch)
    support_codes = np.zeros(k, np.int8)
    af_colors = np.zeros(k, np.uint8)
    rows = []
    for idx in indices:
        if len(rows) >= max_reads:
            break
        if int(tensors.mapq[idx]) < o.min_mapping_quality:
            continue
        # Does the read produce any event in the window?
        w0 = image_start - tensors.span_start
        window = tensors.bases[idx, max(w0, 0): w0 + o.width]
        if not window.any():
            continue
        # Low-quality base at the call site -> drop.
        if 0 <= call_col < tensors.bases.shape[1] and \
                tensors.bases[idx, call_col] != 0 and \
                tensors.min_quals[idx, call_col] < o.min_base_quality:
            continue
        support_codes[idx] = encoder._read_supports_alt(
            dv_call, idx, alt_alleles
        )
        if CH_ALLELE_FREQUENCY in o.channels:
            af_colors[idx] = encoder._allele_frequency_color(
                encoder._read_allele_frequency(dv_call, idx, alt_alleles)
            )
        hap_idx = encoder._hap_index(int(tensors.hp[idx]))
        group = support_group.get(idx, len(alt_order)) if \
            o.sort_by_alt_allele_support else 0
        rows.append((
            hap_idx, group,
            int(sort_positions[idx]) if sort_positions is not None
            else int(batch.pos[idx]),
            batch.name[idx],
            0 if batch.flag[idx] & FLAG_FIRST or not (
                batch.flag[idx] & FLAG_PAIRED
            ) else 1,
            idx,
        ))
    rows.sort(key=lambda t: t[:5])
    row_reads = np.full(max_reads, -1, np.int32)
    for i, (_, _, _, _, _, idx) in enumerate(rows):
        row_reads[i] = idx
    return CandidatePlan(
        window_start=image_start,
        row_reads=row_reads,
        support_codes=support_codes,
        af_colors=af_colors,
        ref_window=ref_window,
    )


#: Channels the jitted device encoder implements with numerics identical to
#: the host encoder. Anything else must go through the host path; the factory
#: refuses to build rather than emit silently-wrong zero planes.
DEVICE_CHANNELS = frozenset({
    CH_READ_BASE,
    CH_BASE_QUALITY,
    CH_MAPPING_QUALITY,
    CH_STRAND,
    CH_READ_SUPPORTS_VARIANT,
    CH_BASE_DIFFERS_FROM_REF,
    CH_INSERT_SIZE,
    CH_HAPLOTYPE_TAG,
    CH_ALLELE_FREQUENCY,
    CH_SUPPLEMENTARY_ALIGNMENT,
})


def make_encode_fn(options: PileupOptions):
    """Build the jitted device encoder for a fixed channel set."""
    o = options
    channels = list(o.channels)
    unsupported = [ch for ch in channels if ch not in DEVICE_CHANNELS]
    if unsupported:
        raise ValueError(
            "device pileup encoder does not implement channel(s) "
            f"{unsupported}; supported: {sorted(DEVICE_CHANNELS)}. Use the "
            "host encoder (pileup.PileupEncoder) for this channel set."
        )
    base_lut = np.zeros(256, np.uint8)
    base_lut[ord("A")] = o.base_color_offset_a_and_g + \
        o.base_color_stride * 3
    base_lut[ord("G")] = o.base_color_offset_a_and_g + \
        o.base_color_stride * 2
    base_lut[ord("T")] = o.base_color_offset_t_and_c + \
        o.base_color_stride * 1
    base_lut[ord("C")] = o.base_color_offset_t_and_c + \
        o.base_color_stride * 0
    support_lut = np.array([
        int(MAX_PIXEL_FLOAT * o.allele_unsupporting_read_alpha),
        int(MAX_PIXEL_FLOAT * o.allele_supporting_read_alpha),
        int(MAX_PIXEL_FLOAT * o.other_allele_supporting_read_alpha),
    ], np.uint8)
    strand_lut = np.array(
        [o.positive_strand_color, o.negative_strand_color], np.uint8
    )
    match_color = int(MAX_PIXEL_FLOAT * o.reference_matching_read_alpha)
    mismatch_color = int(
        MAX_PIXEL_FLOAT * o.reference_mismatching_read_alpha
    )
    band = o.reference_band_height
    width = o.width
    height = o.height

    def scale(v, cap):
        return (MAX_PIXEL_FLOAT * (
            jnp.minimum(v.astype(jnp.float32), cap) / cap
        )).astype(jnp.uint8)

    def hp_value(hp):
        if o.hp_tag_for_assembly_polishing == 2:
            hp = jnp.where(hp == 1, 2, jnp.where(hp == 2, 1, hp))
        hp = jnp.clip(hp, 0, 2)
        return (MAX_PIXEL_FLOAT * hp.astype(jnp.float32) / 2.0).astype(
            jnp.uint8
        )

    supp_lut = np.array([
        int(MAX_PIXEL_FLOAT * o.allele_unsupporting_read_alpha),
        int(MAX_PIXEL_FLOAT * o.allele_supporting_read_alpha),
    ], np.uint8)

    def encode(region_bases, region_quals, mapq, reverse, hp, tlen,
               supplementary, window_offsets, row_reads, support_codes,
               af_colors, ref_windows):
        """All candidates at once.

        region_bases/quals: (K, Wr) uint8; mapq/reverse/hp/tlen/
        supplementary: (K,); window_offsets: (N,) int32 (window col0 -
        span col0); row_reads: (N, H-band) int32; support_codes/
        af_colors: (N, K); ref_windows: (N, W) uint8.
        Returns (N, H, W, C) uint8.
        """
        n = row_reads.shape[0]
        cols = window_offsets[:, None] + jnp.arange(width)[None, :]
        cols = jnp.clip(cols, 0, region_bases.shape[1] - 1)
        # (N, rows, W) gathers; empty rows (read -1) masked later.
        safe_rows = jnp.maximum(row_reads, 0)
        b = region_bases[safe_rows[:, :, None], cols[:, None, :]]
        q = region_quals[safe_rows[:, :, None], cols[:, None, :]]
        row_valid = (row_reads >= 0)[:, :, None]
        covered = (b != 0) & row_valid
        read_mapq = mapq[safe_rows]          # (N, rows)
        read_rev = reverse[safe_rows].astype(jnp.int32)
        read_hp = hp[safe_rows].astype(jnp.int32)
        read_tlen = jnp.minimum(
            jnp.abs(tlen[safe_rows]), 1000
        ).astype(jnp.float32)
        read_support = jnp.take_along_axis(
            support_codes, safe_rows, axis=1
        )
        read_af = jnp.take_along_axis(af_colors, safe_rows, axis=1)
        read_supp = supplementary[safe_rows].astype(jnp.int32)

        planes = []
        ref_b = ref_windows  # (N, W)
        for ch in channels:
            if ch == CH_READ_BASE:
                plane = jnp.asarray(base_lut)[b]
                ref_plane = jnp.asarray(base_lut)[ref_b]
            elif ch == CH_BASE_QUALITY:
                plane = scale(q, o.base_quality_cap)
                ref_plane = jnp.full_like(ref_b, int(
                    MAX_PIXEL_FLOAT * min(
                        o.reference_base_quality, o.base_quality_cap
                    ) / o.base_quality_cap
                ))
            elif ch == CH_MAPPING_QUALITY:
                plane = scale(read_mapq, o.mapping_quality_cap)[
                    :, :, None
                ] * jnp.ones((1, 1, width), jnp.uint8)
                ref_plane = jnp.full_like(ref_b, int(
                    MAX_PIXEL_FLOAT * min(
                        o.reference_base_quality, o.base_quality_cap
                    ) / o.base_quality_cap
                ))
            elif ch == CH_STRAND:
                plane = jnp.asarray(strand_lut)[read_rev][:, :, None] * \
                    jnp.ones((1, 1, width), jnp.uint8)
                ref_plane = jnp.full_like(
                    ref_b, o.positive_strand_color
                )
            elif ch == CH_READ_SUPPORTS_VARIANT:
                plane = jnp.asarray(support_lut)[read_support][
                    :, :, None
                ] * jnp.ones((1, 1, width), jnp.uint8)
                ref_plane = jnp.full_like(ref_b, int(support_lut[0]))
            elif ch == CH_BASE_DIFFERS_FROM_REF:
                plane = jnp.where(
                    b == ref_b[:, None, :], match_color, mismatch_color
                ).astype(jnp.uint8)
                ref_plane = jnp.full_like(ref_b, match_color)
            elif ch == CH_INSERT_SIZE:
                plane = (MAX_PIXEL_FLOAT * read_tlen / 1000.0).astype(
                    jnp.uint8
                )[:, :, None] * jnp.ones((1, 1, width), jnp.uint8)
                ref_plane = jnp.full_like(ref_b, int(MAX_PIXEL_FLOAT))
            elif ch == CH_HAPLOTYPE_TAG:
                plane = hp_value(read_hp)[:, :, None] * jnp.ones(
                    (1, 1, width), jnp.uint8
                )
                ref_plane = jnp.zeros_like(ref_b)
            elif ch == CH_ALLELE_FREQUENCY:
                plane = read_af.astype(jnp.uint8)[:, :, None] * \
                    jnp.ones((1, 1, width), jnp.uint8)
                ref_plane = jnp.zeros_like(ref_b)
            elif ch == CH_SUPPLEMENTARY_ALIGNMENT:
                plane = jnp.asarray(supp_lut)[read_supp][:, :, None] * \
                    jnp.ones((1, 1, width), jnp.uint8)
                # FillRefBase stores the raw alpha cast to uchar:
                # int(0.6) == 0 (supplementary_alignment_channel.cc).
                ref_plane = jnp.full_like(
                    ref_b, int(o.allele_unsupporting_read_alpha)
                )
            else:
                raise AssertionError(
                    f"channel {ch} passed factory validation but has no "
                    "device implementation"
                )
            plane = jnp.where(covered, plane, 0)
            ref_rows = jnp.broadcast_to(
                ref_plane[:, None, :], (n, band, width)
            )
            planes.append(jnp.concatenate([ref_rows, plane], axis=1))
        image = jnp.stack(planes, axis=-1)  # (N, H, W, C)
        return image

    return jax.jit(encode)


def encode_region_candidates(
    encoder: PileupEncoder,
    dv_calls: Sequence[DeepVariantCall],
    alt_combos: Sequence[Sequence[str]],
    batch: ReadBatch,
    ref_query,
    encode_fn=None,
) -> np.ndarray:
    """Convenience wrapper: host prep + one device call for a region.

    dv_calls[i] pairs with alt_combos[i]; ref_query(variant) must return
    the (W,) uint8 pileup reference window.
    Returns (N, H, W, C) uint8.
    """
    o = encoder.options
    if not dv_calls:
        return np.zeros((0, o.height, o.width, len(o.channels)), np.uint8)
    span_start = min(
        c.variant.start - o.half_width for c in dv_calls
    )
    span_end = max(
        c.variant.start - o.half_width + o.width for c in dv_calls
    )
    tensors = build_region_tensors(encoder, batch, span_start, span_end)
    plans = []
    for dv_call, combo in zip(dv_calls, alt_combos):
        plans.append(plan_candidate(
            encoder, tensors, dv_call, batch, combo,
            ref_query(dv_call.variant),
        ))
    if encode_fn is None:
        encode_fn = make_encode_fn(o)
    out = encode_fn(
        jnp.asarray(tensors.bases),
        jnp.asarray(tensors.quals),
        jnp.asarray(tensors.mapq),
        jnp.asarray(tensors.reverse),
        jnp.asarray(tensors.hp),
        jnp.asarray(tensors.tlen),
        jnp.asarray(tensors.supplementary),
        jnp.asarray(np.array(
            [p.window_start - span_start for p in plans], np.int32
        )),
        jnp.asarray(np.stack([p.row_reads for p in plans])),
        jnp.asarray(np.stack([p.support_codes for p in plans])),
        jnp.asarray(np.stack([p.af_colors for p in plans])),
        jnp.asarray(np.stack([p.ref_window for p in plans])),
    )
    return np.asarray(out)


# ---------------------------------------------------------------------------
# Long-read (PacBio/ONT preset) device encoding: trimmed per-candidate
# batches, haplotype-sorted rows, and diff_channels alt-aligned planes
# (enum 9/10). The irregular host side (read trimming, realignment to
# alt haplotypes via FastPassAligner, row selection/sort) reuses the
# exact production code paths (examples_builder.prepare_candidate_batch
# / iter_alt_batches, plan_candidate); the device paints every channel
# plane from pre-gathered (N, R, W) row tensors — ~5x less host->device
# traffic than shipping painted images, and the output fuses with the
# CNN without leaving HBM.
# Reference equivalents: alt_aligned_pileup_lib.h:75 (realign to
# haplotype), pileup_image_native.cc:74-153 (row assembly).
# ---------------------------------------------------------------------------


def gather_plan_rows(
    tensors: RegionTensors,
    plan: CandidatePlan,
    width: int,
) -> dict:
    """Host-side gather of a plan's rows into dense (R, W) tensors."""
    rows = plan.row_reads
    w0 = plan.window_start - tensors.span_start
    if w0 != 0 or tensors.bases.shape[1] != width:
        raise ValueError(
            "long-read plans must be built over exactly the pileup "
            f"window (span offset {w0}, span width "
            f"{tensors.bases.shape[1]}, window width {width})"
        )
    safe = np.maximum(rows, 0)
    valid = rows >= 0
    return {
        "bases": tensors.bases[safe],
        "quals": tensors.quals[safe],
        "mapq": tensors.mapq[safe],
        "rev": tensors.reverse[safe],
        "hp": tensors.hp[safe],
        "tlen": tensors.tlen[safe],
        "supp": tensors.supplementary[safe],
        "support": plan.support_codes[safe],
        "af": plan.af_colors[safe],
        "row_valid": valid,
    }


def make_longread_encode_fn(options: PileupOptions):
    """Jitted painter over pre-gathered rows (+ diff alt planes)."""
    o = options
    channels = list(o.channels)
    unsupported = [ch for ch in channels if ch not in DEVICE_CHANNELS]
    if unsupported:
        raise ValueError(
            "device long-read encoder does not implement channel(s) "
            f"{unsupported}; supported: {sorted(DEVICE_CHANNELS)}"
        )
    if o.alt_aligned_pileup not in ("", "none", "diff_channels"):
        raise ValueError(
            "device long-read encoder implements alt_aligned_pileup "
            f"in {{none, diff_channels}}, not {o.alt_aligned_pileup!r}"
        )
    diff_mode = o.alt_aligned_pileup == "diff_channels"

    base_lut = np.zeros(256, np.uint8)
    base_lut[ord("A")] = o.base_color_offset_a_and_g + \
        o.base_color_stride * 3
    base_lut[ord("G")] = o.base_color_offset_a_and_g + \
        o.base_color_stride * 2
    base_lut[ord("T")] = o.base_color_offset_t_and_c + \
        o.base_color_stride * 1
    base_lut[ord("C")] = o.base_color_offset_t_and_c + \
        o.base_color_stride * 0
    support_lut = np.array([
        int(MAX_PIXEL_FLOAT * o.allele_unsupporting_read_alpha),
        int(MAX_PIXEL_FLOAT * o.allele_supporting_read_alpha),
        int(MAX_PIXEL_FLOAT * o.other_allele_supporting_read_alpha),
    ], np.uint8)
    strand_lut = np.array(
        [o.positive_strand_color, o.negative_strand_color], np.uint8
    )
    supp_lut = np.array([
        int(MAX_PIXEL_FLOAT * o.allele_unsupporting_read_alpha),
        int(MAX_PIXEL_FLOAT * o.allele_supporting_read_alpha),
    ], np.uint8)
    match_color = int(MAX_PIXEL_FLOAT * o.reference_matching_read_alpha)
    mismatch_color = int(
        MAX_PIXEL_FLOAT * o.reference_mismatching_read_alpha
    )
    band = o.reference_band_height
    width = o.width

    def scale(v, cap):
        return (MAX_PIXEL_FLOAT * (
            jnp.minimum(v.astype(jnp.float32), cap) / cap
        )).astype(jnp.uint8)

    def hp_value(hp):
        if o.hp_tag_for_assembly_polishing == 2:
            hp = jnp.where(hp == 1, 2, jnp.where(hp == 2, 1, hp))
        hp = jnp.clip(hp, 0, 2)
        return (MAX_PIXEL_FLOAT * hp.astype(jnp.float32) / 2.0).astype(
            jnp.uint8
        )

    def encode(bases, quals, mapq, rev, hp, tlen, supp, support, af,
               row_valid, ref_windows, alt_bases, alt_row_valid,
               alt_ref, alt_present):
        """bases..row_valid: (N, R, ...) gathered rows; ref_windows:
        (N, W); alt_bases: (N, 2, R, W); alt_row_valid: (N, 2, R);
        alt_ref: (N, 2, W); alt_present: (N, 2) bool.
        Returns (N, H, W, C [+2 diff planes]) uint8."""
        n = bases.shape[0]
        covered = (bases != 0) & row_valid[:, :, None]
        rev_i = rev.astype(jnp.int32)
        hp_i = hp.astype(jnp.int32)
        supp_i = supp.astype(jnp.int32)
        tlen_f = jnp.minimum(jnp.abs(tlen), 1000).astype(jnp.float32)
        ones_w = jnp.ones((1, 1, width), jnp.uint8)
        planes = []
        ref_b = ref_windows
        for ch in channels:
            if ch == CH_READ_BASE:
                plane = jnp.asarray(base_lut)[bases]
                ref_plane = jnp.asarray(base_lut)[ref_b]
            elif ch == CH_BASE_QUALITY:
                plane = scale(quals, o.base_quality_cap)
                ref_plane = jnp.full_like(ref_b, int(
                    MAX_PIXEL_FLOAT * min(
                        o.reference_base_quality, o.base_quality_cap
                    ) / o.base_quality_cap
                ))
            elif ch == CH_MAPPING_QUALITY:
                plane = scale(mapq, o.mapping_quality_cap)[
                    :, :, None
                ] * ones_w
                ref_plane = jnp.full_like(ref_b, int(
                    MAX_PIXEL_FLOAT * min(
                        o.reference_base_quality, o.base_quality_cap
                    ) / o.base_quality_cap
                ))
            elif ch == CH_STRAND:
                plane = jnp.asarray(strand_lut)[rev_i][:, :, None] * \
                    ones_w
                ref_plane = jnp.full_like(
                    ref_b, o.positive_strand_color
                )
            elif ch == CH_READ_SUPPORTS_VARIANT:
                plane = jnp.asarray(support_lut)[
                    support.astype(jnp.int32)
                ][:, :, None] * ones_w
                ref_plane = jnp.full_like(ref_b, int(support_lut[0]))
            elif ch == CH_BASE_DIFFERS_FROM_REF:
                plane = jnp.where(
                    bases == ref_b[:, None, :], match_color,
                    mismatch_color,
                ).astype(jnp.uint8)
                ref_plane = jnp.full_like(ref_b, match_color)
            elif ch == CH_INSERT_SIZE:
                plane = (MAX_PIXEL_FLOAT * tlen_f / 1000.0).astype(
                    jnp.uint8
                )[:, :, None] * ones_w
                ref_plane = jnp.full_like(ref_b, int(MAX_PIXEL_FLOAT))
            elif ch == CH_HAPLOTYPE_TAG:
                plane = hp_value(hp_i)[:, :, None] * ones_w
                ref_plane = jnp.zeros_like(ref_b)
            elif ch == CH_ALLELE_FREQUENCY:
                plane = af.astype(jnp.uint8)[:, :, None] * ones_w
                ref_plane = jnp.zeros_like(ref_b)
            elif ch == CH_SUPPLEMENTARY_ALIGNMENT:
                plane = jnp.asarray(supp_lut)[supp_i][:, :, None] * \
                    ones_w
                ref_plane = jnp.full_like(
                    ref_b, int(o.allele_unsupporting_read_alpha)
                )
            else:
                raise AssertionError(
                    f"channel {ch} passed factory validation but has "
                    "no device implementation"
                )
            plane = jnp.where(covered, plane, 0)
            ref_rows = jnp.broadcast_to(
                ref_plane[:, None, :], (n, band, width)
            )
            planes.append(jnp.concatenate([ref_rows, plane], axis=1))
        image = jnp.stack(planes, axis=-1)  # (N, H, W, C)
        if not diff_mode:
            return image
        # diff planes (enum 9/10): the alt image's base_differs plane,
        # ref band included (compose_alt_aligned copies plane index 5
        # of the alt pileup, alt_aligned.py ALT_CHANNEL_INDEX).
        alt_cov = (alt_bases != 0) & alt_row_valid[:, :, :, None]
        alt_diff = jnp.where(
            alt_bases == alt_ref[:, :, None, :], match_color,
            mismatch_color,
        ).astype(jnp.uint8)
        alt_diff = jnp.where(alt_cov, alt_diff, 0)  # (N, 2, R, W)
        alt_band = jnp.full((n, 2, band, width), match_color, jnp.uint8)
        alt_planes = jnp.concatenate([alt_band, alt_diff], axis=2)
        alt_planes = jnp.where(
            alt_present[:, :, None, None], alt_planes, 0
        )
        return jnp.concatenate(
            [image, jnp.moveaxis(alt_planes, 1, -1)], axis=-1
        )

    return jax.jit(encode)


def plan_longread_example(
    builder,
    dv_call: DeepVariantCall,
    batch: ReadBatch,
    combo: Sequence[str],
) -> Optional[dict]:
    """Host planning for one (candidate, alt-combo) long-read example.

    Runs the production trimming/realignment/row-selection paths and
    returns the gathered input dict for make_longread_encode_fn, or
    None when the reference window is unavailable."""
    encoder = builder.encoder
    o = encoder.options
    variant = dv_call.variant
    ref_window = builder.reference_window(variant)
    if ref_window is None or len(ref_window) != o.width:
        return None
    dv_call, batch, read_indices, sort_positions = \
        builder.prepare_candidate_batch(dv_call, batch)
    image_start = variant.start - o.half_width
    tensors = build_region_tensors(
        encoder, batch, image_start, image_start + o.width
    )
    plan = plan_candidate(
        encoder, tensors, dv_call, batch, combo, ref_window,
        read_indices=read_indices, sort_positions=sort_positions,
    )
    rows = gather_plan_rows(tensors, plan, o.width)
    rows["ref_window"] = np.asarray(ref_window, np.uint8)

    r = o.max_reads
    alt_bases = np.zeros((2, r, o.width), np.uint8)
    alt_row_valid = np.zeros((2, r), bool)
    alt_ref = np.zeros((2, o.width), np.uint8)
    alt_present = np.zeros(2, bool)
    if o.alt_aligned_pileup == "diff_channels" and \
            builder.need_alt_alignment(variant):
        items = list(builder.iter_alt_batches(
            dv_call, batch, combo, sort_positions=sort_positions
        ))
        for i, item in enumerate(items[:2]):
            if item is None:
                continue
            remapped, alt_batch, alt_sort_pos, hap_window = item
            alt_tensors = build_region_tensors(
                encoder, alt_batch, image_start, image_start + o.width
            )
            alt_plan = plan_candidate(
                encoder, alt_tensors, remapped, alt_batch, combo,
                np.asarray(hap_window, np.uint8),
                read_indices=np.arange(len(alt_batch)),
                sort_positions=alt_sort_pos,
            )
            g = gather_plan_rows(alt_tensors, alt_plan, o.width)
            alt_bases[i] = g["bases"]
            alt_row_valid[i] = g["row_valid"]
            alt_ref[i] = np.asarray(hap_window, np.uint8)
            alt_present[i] = True
        # alt2 falls back to alt1 (pileup_image_native.h:232-242).
        if len(items) < 2 or (alt_present[0] and not alt_present[1]):
            alt_bases[1] = alt_bases[0]
            alt_row_valid[1] = alt_row_valid[0]
            alt_ref[1] = alt_ref[0]
            alt_present[1] = alt_present[0]
    rows["alt_bases"] = alt_bases
    rows["alt_row_valid"] = alt_row_valid
    rows["alt_ref"] = alt_ref
    rows["alt_present"] = alt_present
    return rows


def encode_longread_examples(
    builder,
    planned: Sequence[dict],
    encode_fn=None,
) -> np.ndarray:
    """Batch-encode planned long-read examples on device."""
    o = builder.encoder.options
    n_ch = len(o.channels) + (
        2 if o.alt_aligned_pileup == "diff_channels" else 0
    )
    if not planned:
        return np.zeros((0, o.height, o.width, n_ch), np.uint8)
    if encode_fn is None:
        encode_fn = make_longread_encode_fn(o)

    def stack(key):
        return jnp.asarray(np.stack([p[key] for p in planned]))

    out = encode_fn(
        stack("bases"), stack("quals"), stack("mapq"), stack("rev"),
        stack("hp"), stack("tlen"), stack("supp"), stack("support"),
        stack("af"), stack("row_valid"), stack("ref_window"),
        stack("alt_bases"), stack("alt_row_valid"), stack("alt_ref"),
        stack("alt_present"),
    )
    return np.asarray(out)

"""Port of the multisample CallVariant corpora:

* variant_calling_multisample_trio_test.cc:895-1122 — pooled-sample
  candidate semantics for trio calling (target-sample allele fraction
  basis, cross-sample allele rescue, the min_fraction_multiplier trio
  coefficient, samples missing positions, duplicate read ids).
* variant_calling_multisample_somatic_test.cc:157-316 — the
  max_fraction_*_for_non_target_sample normal cap and the tumor call's
  matched-normal NDP/NAD/NAF fields.

Synthetic per-sample AlleleCounters (MakeTestAlleleCount analog) are
driven through VerySensitiveCaller.calls_in_region/call_position with
context_counters carrying every sample's counts.
"""

import dataclasses
import math

import numpy as np
import pytest

from deepvariant_tpu.core.types import Range
from deepvariant_tpu.make_examples.allele_counter import (
    AlleleCounter,
    AlleleCounterOptions,
    ReadAlleleRecord,
    SUBSTITUTION,
)
from deepvariant_tpu.make_examples.variant_caller import (
    VariantCallerOptions,
    VerySensitiveCaller,
)

CHR = "chr1"


def make_options(min_count=0, min_fraction=0.0, **extra):
    """MakeOptions (variant_calling_multisample_trio_test.cc:119-139)."""
    kwargs = dict(
        min_count_snps=min_count,
        min_count_indels=min_count,
        min_fraction_snps=min_fraction,
        min_fraction_indels=min_fraction,
        min_fraction_multiplier=1.0,
        sample_name="MySampleName",
        p_error=0.01,
        max_gq=50,
        gq_resolution=1,
        ploidy=2,
    )
    kwargs.update(extra)
    return VariantCallerOptions(**kwargs)


def make_counter(start, ref_bases, sites, rid_start=0):
    """MakeTestAlleleCount analog (trio_test.cc:80-104) over an
    interval: `sites` maps interval position -> (total_n, alt_n, alt)
    with ref-supporting counts total_n - alt_n. Read ids are unique
    per counter, counting up from rid_start."""
    ref = np.frombuffer(ref_bases.encode(), np.uint8)
    ac = AlleleCounter(
        ref, Range(CHR, start, start + len(ref_bases)),
        AlleleCounterOptions(),
    )
    rid = rid_start
    for pos, (total_n, alt_n, alt) in sites.items():
        assert total_n >= alt_n
        n_ref = total_n - alt_n
        ac.ref_count[pos] += n_ref
        if alt_n:
            pc = ac._pc(pos)
            for _ in range(n_ref):
                pc.ref_supporting_read_ids.append(rid)
                rid += 1
            for _ in range(alt_n):
                pc.read_alleles[rid] = ReadAlleleRecord(
                    read_idx=rid, bases=alt, type=SUBSTITUTION,
                    is_low_quality=False, mapping_quality=60,
                    avg_base_quality=30, is_reverse_strand=False,
                )
                rid += 1
    return ac


def check_variant(dv_call, start, ref_bases, alts, ad):
    v = dv_call.variant
    assert v.reference_name == CHR
    assert v.reference_bases == ref_bases
    assert v.alternate_bases == list(alts)
    assert v.start == start
    assert v.end == start + len(ref_bases)
    c = v.calls[0]
    assert c.call_set_name == "MySampleName"
    assert c.genotype == [-1, -1]
    dp = sum(ad)
    assert c.info["AD"] == list(ad)
    assert c.info["DP"] == [dp]
    assert c.info["VAF"] == pytest.approx([x / dp for x in ad[1:]])


# -- trio corpus -----------------------------------------------------------------


def test_calls_from_allele_counts():
    """TestCallsFromAlleleCounts (trio_test.cc:895-924): five positions,
    variants only where alt reads exist, in order."""
    counter = make_counter(10, "AGGGT", {
        1: (10, 10, "C"),   # G/C variant at 11
        4: (11, 9, "C"),    # T/C variant at 14
    })
    caller = VerySensitiveCaller(make_options())
    candidates = caller.calls_in_region(
        counter, context_counters=[counter]
    )
    assert len(candidates) == 2
    check_variant(candidates[0], 11, "G", ["C"], ad=[0, 10])
    check_variant(candidates[1], 14, "T", ["C"], ad=[2, 9])


def test_calls_from_allele_counts_uneven_coverage():
    """TestCallsFromAlleleCountsUnevenCoverage (trio_test.cc:926-962):
    the allele-fraction threshold applies to the TARGET sample's own
    depth (2/4 here), not the pooled trio depth (2/10) — a parent
    candidate survives a high-coverage child."""
    parent_1 = make_counter(10, "A", {0: (4, 2, "T")})
    child = make_counter(10, "A", {0: (3, 0, "T")})
    parent_2 = make_counter(10, "A", {0: (3, 0, "T")})
    caller = VerySensitiveCaller(make_options(0, 0.2))
    candidates = caller.calls_in_region(
        parent_1, context_counters=[parent_1, child, parent_2]
    )
    assert len(candidates) == 1
    check_variant(candidates[0], 10, "A", ["T"], ad=[2, 2])


def _trio_counters():
    """parent_1 2/20 alt, child 7/10 alt, parent_2 0/10 alt — pooled
    alt fraction 9/40 = 0.225."""
    parent_1 = make_counter(10, "A", {0: (20, 2, "T")})
    child = make_counter(10, "A", {0: (10, 7, "T")})
    parent_2 = make_counter(10, "A", {0: (10, 0, "T")})
    return parent_1, [parent_1, child, parent_2]


def test_allele_fraction_trio_coefficient():
    """TestCallsFromAlleleCountsWithAlleleFractionTrioCoefficient
    (trio_test.cc:964-1010): with multiplier 1.0 the pooled fraction
    0.225 misses a 0.226 threshold; multiplier 0.5 rescues it."""
    target, counters = _trio_counters()
    caller = VerySensitiveCaller(make_options(0, 0.226))
    assert caller.calls_in_region(
        target, context_counters=counters
    ) == []

    target, counters = _trio_counters()
    caller = VerySensitiveCaller(
        make_options(0, 0.226, min_fraction_multiplier=0.5)
    )
    candidates = caller.calls_in_region(
        target, context_counters=counters
    )
    assert len(candidates) == 1
    check_variant(candidates[0], 10, "A", ["T"], ad=[18, 2])


def test_alt_support_in_multiple_samples():
    """TestCallsFromAlleleCountsAltSupportInMultipleSamples
    (trio_test.cc:1012-1050): parent_1's 2/20 = 0.1 fails 0.1999, but
    the pooled 9/40 = 0.225 passes — the allele is rescued and the
    candidate reports the TARGET sample's counts."""
    target, counters = _trio_counters()
    caller = VerySensitiveCaller(make_options(0, 0.1999))
    candidates = caller.calls_in_region(
        target, context_counters=counters
    )
    assert len(candidates) == 1
    check_variant(candidates[0], 10, "A", ["T"], ad=[18, 2])


def test_alt_support_some_positions_missing_allele_counts():
    """TestCallsFromAlleleCountsAltSupportSomePositionsMissAlleleCounter
    (trio_test.cc:1052-1101): parent_2 has no reads at position 11;
    the pooled rescue at position 10 still works and position 11
    produces nothing."""
    parent_1 = make_counter(10, "AA", {0: (20, 2, "T"), 1: (3, 0, "T")})
    child = make_counter(10, "AA", {0: (10, 7, "T"), 1: (3, 0, "T")})
    parent_2 = make_counter(10, "AA", {0: (10, 0, "T")})
    caller = VerySensitiveCaller(make_options(0, 0.1999))
    candidates = caller.calls_in_region(
        parent_1, context_counters=[parent_1, child, parent_2]
    )
    assert len(candidates) == 1
    check_variant(candidates[0], 10, "A", ["T"], ad=[18, 2])


def test_duplicate_read_ids_support_is_per_sample():
    """TestCallsFromAlleleCountsDuplicateReadIds (trio_test.cc:1103-1133)
    pins that a read name shared between samples is counted once in the
    reference's merged support map. This design keys support by
    per-sample read INDEX instead of a global name map, so collisions
    are impossible by construction: the candidate's allele_support
    holds the target sample's reads only, and each other sample's
    support comes from its own counter via support_from_counter."""
    child = make_counter(10, "A", {0: (3, 2, "T")})
    parent_1 = make_counter(10, "A", {0: (4, 3, "T")}, rid_start=100)
    parent_2 = make_counter(10, "A", {0: (3, 0, "T")}, rid_start=200)
    caller = VerySensitiveCaller(make_options())
    candidates = caller.calls_in_region(
        child, context_counters=[parent_1, child, parent_2]
    )
    assert len(candidates) == 1
    got = candidates[0]
    # Target (child) support: exactly its own two alt reads, once each.
    assert sorted(got.allele_support["T"]) == [1, 2]
    assert got.ref_support == [0]
    # Each sample's support is extracted independently and never
    # aliases another sample's reads.
    p1_support, p1_ref = caller.support_from_counter(parent_1, got)
    assert sorted(p1_support["T"]) == [101, 102, 103]
    assert p1_ref == [100]
    p2_support, p2_ref = caller.support_from_counter(parent_2, got)
    assert p2_support == {}


# -- somatic corpus ---------------------------------------------------------------


def _somatic_call(options, tumor, normal, role="tumor"):
    caller = VerySensitiveCaller(
        dataclasses.replace(options, target_sample_role=role)
    )
    return caller.calls_in_region(
        tumor, context_counters=[tumor, normal]
    )


def test_max_fraction_for_normal():
    """TestCallVariantWithMaxFractionForNormal (somatic_test.cc:157-228):
    normal carries the allele at fraction 0.7; a cap of 0 is disabled,
    0.7+eps keeps the tumor candidate, 0.7-eps drops it."""
    eps = 1e-6
    base = make_options(
        0, 0.1, min_fraction_multiplier=math.inf,
    )
    for cap, expected in [(0.0, 1), (0.7 + eps, 1), (0.7 - eps, 0)]:
        tumor = make_counter(10, "A", {0: (20, 19, "T")})
        normal = make_counter(10, "A", {0: (10, 7, "T")})
        options = dataclasses.replace(
            base, max_fraction_snps_for_non_target_sample=cap,
        )
        # The reference runs this corpus with an unset (empty) role.
        candidates = _somatic_call(options, tumor, normal, role="")
        assert len(candidates) == expected, cap
        if expected:
            check_variant(candidates[0], 10, "A", ["T"], ad=[1, 19])
            assert "NDP" not in candidates[0].variant.calls[0].info


@pytest.mark.parametrize(
    "normal_alt,ndp,nad,naf",
    [
        # TestAllelesInNormal (somatic_test.cc:230-274).
        (1, 25, [24, 1], [0.04]),
        # TestNoAllelesInNormal (somatic_test.cc:276-316).
        (0, 25, [25, 0], [0.0]),
    ],
)
def test_matched_normal_read_depths(normal_alt, ndp, nad, naf):
    tumor = make_counter(190, "A", {0: (20, 15, "T")})
    normal = make_counter(190, "A", {0: (25, normal_alt, "T")})
    candidates = _somatic_call(
        VariantCallerOptions(sample_name="MySampleName", ploidy=2),
        tumor, normal,
    )
    assert len(candidates) == 1
    info = candidates[0].variant.calls[0].info
    assert info["NDP"] == [ndp]
    assert info["NAD"] == nad
    assert info["NAF"] == pytest.approx(naf)


def test_no_normal_fields_without_tumor_role():
    """target_role_ gates the NDP/NAD/NAF emission
    (variant_calling_multisample.cc:1131)."""
    tumor = make_counter(190, "A", {0: (20, 15, "T")})
    normal = make_counter(190, "A", {0: (25, 1, "T")})
    candidates = _somatic_call(
        VariantCallerOptions(sample_name="MySampleName", ploidy=2),
        tumor, normal, role="",
    )
    assert len(candidates) == 1
    info = candidates[0].variant.calls[0].info
    assert "NDP" not in info and "NAD" not in info and "NAF" not in info


# -- small-model context VAFs ----------------------------------------------------


def _context_vaf_counter():
    """Seven positions around a candidate at absolute position 10
    (TestCallVariantAddAdjacentAlleleFractionsAtPosition*,
    variant_calling_multisample_test.cc:190-295)."""
    return make_counter(7, "AAAAAAA", {
        0: (20, 5, "T"),    # pos 7
        1: (20, 19, "T"),   # pos 8  -> VAF 95
        2: (20, 17, "T"),   # pos 9  -> VAF 85
        3: (20, 19, "T"),   # pos 10 -> VAF 95 (the candidate)
        4: (20, 20, "T"),   # pos 11 -> VAF 100
        5: (20, 0, "T"),    # pos 12 -> VAF 0
        6: (20, 10, "T"),   # pos 13
    })


def _candidate_at(candidates, start):
    return next(c for c in candidates if c.variant.start == start)


def test_context_vafs_window_5():
    """Window 5: map holds exactly positions 8..12 with integer VAFs
    (variant_calling_multisample_test.cc:231-236)."""
    caller = VerySensitiveCaller(
        make_options(small_model_vaf_context_window_size=5)
    )
    candidates = caller.calls_in_region(
        _context_vaf_counter(), context_counters=[_context_vaf_counter()]
    )
    call = _candidate_at(candidates, 10)
    assert call.allele_frequency_at_position == {
        8: 95, 9: 85, 10: 95, 11: 100, 12: 0,
    }


def test_context_vafs_window_3():
    """Window 3 (variant_calling_multisample_test.cc:282-285)."""
    caller = VerySensitiveCaller(
        make_options(small_model_vaf_context_window_size=3)
    )
    candidates = caller.calls_in_region(
        _context_vaf_counter(), context_counters=[_context_vaf_counter()]
    )
    call = _candidate_at(candidates, 10)
    assert call.allele_frequency_at_position == {9: 85, 10: 95, 11: 100}


def test_context_vafs_window_0():
    """Window 0 disables the map
    (variant_calling_multisample_test.cc:291-325)."""
    caller = VerySensitiveCaller(make_options())
    candidates = caller.calls_in_region(
        _context_vaf_counter(), context_counters=[_context_vaf_counter()]
    )
    call = _candidate_at(candidates, 10)
    assert call.allele_frequency_at_position == {}


def test_context_vafs_clamped_at_interval_edge():
    """The window clamps to the counter interval
    (start/end arithmetic, variant_calling_multisample.cc:1297-1301)."""
    caller = VerySensitiveCaller(
        make_options(small_model_vaf_context_window_size=5)
    )
    counter = make_counter(7, "AAA", {
        0: (20, 19, "T"),   # pos 7 (the candidate)
        1: (20, 17, "T"),   # pos 8
        2: (20, 10, "T"),   # pos 9
    })
    candidates = caller.calls_in_region(
        counter, context_counters=[counter]
    )
    call = _candidate_at(candidates, 7)
    assert call.allele_frequency_at_position == {7: 95, 8: 85, 9: 50}

"""Genotype-resolution numeric tables.

Ported corpus: deepvariant/postprocess_variants_test.py —
test_compute_quals (+ numerical-stability rows), the
most_likely_genotype table, test_maybe_phase_genotype (5 named
cases), the triallelic add_call_to_variant GL-order table, and
correct_nonautosome_probabilities.
"""

import pytest

from deepvariant_tpu.core import genomics_math
from deepvariant_tpu.core.types import Variant, VariantCall
from deepvariant_tpu.postprocess import genotype as gt


@pytest.mark.parametrize("probs,call,expected_gq,expected_qual", [
    # Q20 tests.
    ([0.01, 0.0, 0.99], 0, 0, 20.0),
    ([0.01, 0.0, 0.99], 1, 0, 20.0),
    ([0.01, 0.0, 0.99], 2, 20, 20.0),
    # Q30 tests.
    ([0.001, 0.0, 0.999], 0, 0, 30.0),
    ([0.001, 0.0, 0.999], 1, 0, 30.0),
    ([0.001, 0.0, 0.999], 2, 30, 30.0),
    # Q40 tests.
    ([0.0001, 0.0, 0.9999], 0, 0, 40.0),
    ([0.0001, 0.0, 0.9999], 1, 0, 40.0),
    ([0.0001, 0.0, 0.9999], 2, 40, 40.0),
    # Any sized genotype vector.
    ([0.0001, 0.0, 0.0, 0.9999], 0, 0, 40.0),
    ([0.0001, 0.0, 0.0, 0.0, 0.9999], 0, 0, 40.0),
    ([0.0001, 0.0, 0.0, 0.0, 0.0, 0.9999], 0, 0, 40.0),
    ([0.0001, 0.0, 0.0, 0.0, 0.0, 0.9999], 5, 40, 40.0),
    ([0.0001, 0.0, 0.0, 0.0, 0.0, 0.0, 0.9999], 0, 0, 40.0),
    # Probabilities beyond _MAX_CONFIDENCE round to the bound.
    ([1e-11, 1 - 1e-11, 0.0], 0, 0, 99.03089987),
    ([1e-11, 1 - 1e-11, 0.0], 1, 99, 99.03089987),
    ([1e-11, 1 - 1e-11, 0.0], 2, 0, 99.03089987),
    ([1e-15, 1 - 1e-15, 0.0], 0, 0, 99.03089987),
    ([1e-15, 1 - 1e-15, 0.0], 1, 99, 99.03089987),
    ([1e-15, 1 - 1e-15, 0.0], 2, 0, 99.03089987),
])
def test_compute_quals(probs, call, expected_gq, expected_qual):
    got_gq, got_qual = gt.compute_quals(probs, call)
    assert got_gq == expected_gq
    assert got_qual == pytest.approx(expected_qual, abs=1e-6)


@pytest.mark.parametrize("probs,call,expected_gq", [
    # Robustness to vectors whose sum is not exactly 1.0.
    ([0.0, 0.0001, 0.9999], 2, 40),
    ([0.0, 0.00011, 0.9999], 2, 40),
])
def test_compute_quals_numerical_stability(probs, call, expected_gq):
    max_qual = round(
        genomics_math.ptrue_to_bounded_phred(1.0), 7
    )
    got_gq, got_qual = gt.compute_quals(probs, call)
    assert got_gq == expected_gq
    assert got_qual == max_qual


@pytest.mark.parametrize("probs,expected", [
    # Diploid, 1 alt allele.
    ([1, 0, 0], (0, [0, 0])),
    ([0, 1, 0], (1, [0, 1])),
    ([0, 0, 1], (2, [1, 1])),
    # Diploid, 2 alt alleles.
    ([1, 0, 0, 0, 0, 0], (0, [0, 0])),
    ([0, 1, 0, 0, 0, 0], (1, [0, 1])),
    ([0, 0, 1, 0, 0, 0], (2, [1, 1])),
    ([0, 0, 0, 1, 0, 0], (3, [0, 2])),
    ([0, 0, 0, 0, 1, 0], (4, [1, 2])),
    ([0, 0, 0, 0, 0, 1], (5, [2, 2])),
])
def test_most_likely_genotype(probs, expected):
    index, genotype = gt.most_likely_genotype(probs)
    assert (index, list(genotype)) == (expected[0], expected[1])


def _phased_variant(phasing_info):
    return Variant(
        reference_name="chr1", start=10, end=11,
        reference_bases="A",
        alternate_bases=["C"] * (len(phasing_info) - 1),
        info={
            gt.VARIANT_PHASE_SET: ["0-1"],
            gt.PHASED_GENOTYPE: list(phasing_info),
        },
        calls=[VariantCall()],
    )


@pytest.mark.parametrize(
    "genotype,phasing_info,expected_is_phased,expected_genotype",
    [
        # het call with two phased alleles.
        ([0, 1], [1, 2], True, [0, 1]),
        # het call with one unphased allele.
        ([0, 1], [1, 0], False, [0, 1]),
        # het call, phases in reverse order.
        ([0, 1], [2, 1], True, [1, 0]),
        # multi-allelic het, different phases.
        ([0, 2], [2, 2, 1, 1], True, [2, 0]),
        # ref and alt share a phase: not phased.
        ([0, 1], [2, 2, 1, 1], False, [0, 1]),
    ],
)
def test_maybe_phase_genotype(genotype, phasing_info,
                              expected_is_phased, expected_genotype):
    variant = _phased_variant(phasing_info)
    is_phased, got = gt.maybe_phase_genotype(variant, list(genotype))
    assert is_phased == expected_is_phased
    assert list(got) == expected_genotype


@pytest.mark.parametrize("highest_prob_position,expected_genotype", [
    (0, [0, 0]),
    (1, [0, 1]),
    (2, [1, 1]),
    (3, [0, 2]),
    (4, [1, 2]),
    (5, [2, 2]),
])
def test_triallelic_genotype_in_add_call_to_variant(
    highest_prob_position, expected_genotype
):
    """GL order is interpreted correctly for triallelic sites."""
    variant = Variant(
        reference_name="chr1", start=10, end=14,
        reference_bases="CACA", alternate_bases=["C", "A"],
        calls=[VariantCall(info={"AD": [1, 1, 1]})],
    )
    probs = [0.001] * 6
    probs[highest_prob_position] = 0.995
    out = gt.add_call_to_variant(
        variant, probs, qual_filter=0.0, sample_name="HG002"
    )
    assert out.calls[0].genotype == expected_genotype


def test_correct_nonautosome_probabilities():
    variant = Variant(
        reference_name="chrY", start=10, end=11,
        reference_bases="A", alternate_bases=["C"],
        calls=[VariantCall()],
    )
    out = gt.correct_nonautosome_probabilities(
        [0.25, 0.5, 0.25], variant
    )
    # Het probability zeroed, remainder renormalized.
    assert out[1] == 0.0
    assert out[0] == pytest.approx(0.5)
    assert out[2] == pytest.approx(0.5)
    assert sum(out) == pytest.approx(1.0)

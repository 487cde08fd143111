"""Port of nucleus util/variant_utils_test.py's numeric/semantic
tables that map onto this package's equivalents:
simplify_alleles (:420-451), simplify_variant_alleles (:473-511),
genotype_ordering_in_likelihoods (:691-711), genotype_likelihood
index math (:713-770), and allele_indices_with_num_alts (:780-804)."""

import pytest

from deepvariant_tpu.core.types import Variant, VariantCall
from deepvariant_tpu.postprocess import genotype as gt
from deepvariant_tpu.postprocess.haplotypes import (
    allele_indices_with_num_alts,
)
from deepvariant_tpu.postprocess.merge import (
    genotype_ordering_in_likelihoods,
)


def _variant(ref, alts, start=0):
    return Variant(
        reference_name="chr1", start=start, end=start + len(ref),
        reference_bases=ref, alternate_bases=list(alts),
    )


@pytest.mark.parametrize("alleles,expected", [
    (["A", "C"], ["A", "C"]),
    (["AA", "CA"], ["A", "C"]),
    (["AAG", "CAG"], ["A", "C"]),
    (["AAGAG", "CAGAG"], ["A", "C"]),
    (["AACAG", "CAGAG"], ["AAC", "CAG"]),
    (["AACAC", "CAGAG"], ["AACAC", "CAGAG"]),
    (["ACT", "A"], ["ACT", "A"]),
    (["ACTCT", "ACT"], ["ACT", "A"]),
    (["ACTCT", "A"], ["ACTCT", "A"]),
    (["CAG", "GAG"], ["C", "G"]),
    (["AT", "ATAT"], ["A", "ATA"]),
    (["ATT", "AT", "ATTT"], ["AT", "A", "ATT"]),
    (["CAG", "GAG", "TCG"], ["CA", "GA", "TC"]),
    (["ATTT", "ATT", "ATTTT"], ["AT", "A", "ATT"]),
    (["CAG", "GAG", "TCA"], ["CAG", "GAG", "TCA"]),
    (["CGGCGG", "CGG", "CAACGG"], ["CGGC", "C", "CAAC"]),
])
def test_simplify_alleles(alleles, expected):
    assert gt.simplify_alleles(*alleles) == tuple(expected)
    assert gt.simplify_alleles(*reversed(alleles)) == tuple(
        reversed(expected)
    )


@pytest.mark.parametrize("alleles,start,expected_alleles,expected_end", [
    (["CAA", "CA", "C"], 5, ["CAA", "CA", "C"], 8),
    (["CAA", "CA"], 4, ["CA", "C"], 6),
    (["CAA", "C"], 3, ["CAA", "C"], 6),
    (["CCA", "CA"], 2, ["CC", "C"], 4),
])
def test_simplify_variant_alleles(
    alleles, start, expected_alleles, expected_end
):
    simplified = gt.simplify_variant_alleles(
        _variant(alleles[0], alleles[1:], start=start)
    )
    assert simplified.reference_bases == expected_alleles[0]
    assert simplified.alternate_bases == expected_alleles[1:]
    assert simplified.start == start
    assert simplified.end == expected_end


@pytest.mark.parametrize("alleles,expected", [
    (["A", "C"], [(0, 0, "A", "A"), (0, 1, "A", "C"), (1, 1, "C", "C")]),
    (["A", "C", "G"], [
        (0, 0, "A", "A"), (0, 1, "A", "C"), (1, 1, "C", "C"),
        (0, 2, "A", "G"), (1, 2, "C", "G"), (2, 2, "G", "G"),
    ]),
    (["A", "C", "G", "T"], [
        (0, 0, "A", "A"), (0, 1, "A", "C"), (1, 1, "C", "C"),
        (0, 2, "A", "G"), (1, 2, "C", "G"), (2, 2, "G", "G"),
        (0, 3, "A", "T"), (1, 3, "C", "T"), (2, 3, "G", "T"),
        (3, 3, "T", "T"),
    ]),
])
def test_genotype_ordering_in_likelihoods(alleles, expected):
    variant = _variant(alleles[0], alleles[1:])
    assert list(genotype_ordering_in_likelihoods(variant)) == expected


@pytest.mark.parametrize("gls,allele_indices,expected", [
    ([0.0], [0, 0], 0.0),
    ([-1, -2, -3], [0, 0], -1),
    ([-1, -2, -3], [0, 1], -2),
    ([-1, -2, -3], [1, 0], -2),
    ([-1, -2, -3], [1, 1], -3),
    ([-1, -2, -3, -4, -5, -6], [0, 0], -1),
    ([-1, -2, -3, -4, -5, -6], [0, 1], -2),
    ([-1, -2, -3, -4, -5, -6], [1, 0], -2),
    ([-1, -2, -3, -4, -5, -6], [1, 1], -3),
    ([-1, -2, -3, -4, -5, -6], [0, 2], -4),
    ([-1, -2, -3, -4, -5, -6], [2, 0], -4),
    ([-1, -2, -3, -4, -5, -6], [1, 2], -5),
    ([-1, -2, -3, -4, -5, -6], [2, 1], -5),
    ([-1, -2, -3, -4, -5, -6], [2, 2], -6),
    (list(range(10)), [0, 3], 6),
    (list(range(10)), [1, 3], 7),
    (list(range(10)), [2, 3], 8),
    (list(range(10)), [3, 3], 9),
])
def test_diploid_genotype_likelihood_index(gls, allele_indices, expected):
    assert gls[gt.genotype_index(*allele_indices)] == expected


def test_diploid_index_roundtrip():
    """allele_indices_for_genotype_likelihood_index round trip
    (variant_utils_test.py:757-770) via genotype_order."""
    for aix in range(20):
        for bix in range(20):
            ix = gt.genotype_index(aix, bix)
            # Recover the pair from the index using the ordering.
            n = max(aix, bix) + 1
            pairs = list(gt.genotype_order(n))
            assert pairs[ix] == tuple(sorted((aix, bix)))


@pytest.mark.parametrize("alt_bases,num_alts,expected", [
    ([], 0, [(0, 0)]),
    (["A"], 0, [(0, 0)]),
    (["A"], 1, [(0, 1)]),
    (["A"], 2, [(1, 1)]),
    (["A", "C"], 0, [(0, 0)]),
    (["A", "C"], 1, [(0, 1), (0, 2)]),
    (["A", "C"], 2, [(1, 1), (1, 2), (2, 2)]),
])
def test_allele_indices_with_num_alts(alt_bases, num_alts, expected):
    variant = _variant("G", alt_bases)
    assert allele_indices_with_num_alts(
        variant, num_alts, ploidy=2
    ) == expected


@pytest.mark.parametrize("mf,expected", [
    # variantcall_utils_test.py:284-295 determine_methylation_type.
    ([0.0, 0.0], "0/0"),
    ([0.2, 0.2], "0/0"),
    ([0.1, 0.9], "0/1"),
    ([0.5, 0.5], "0/0"),
    ([0.9, 0.1], "0/1"),
    ([0.8, 0.8], "1/1"),
    ([1.0, 1.0], "1/1"),
    ([], ""),
    (None, ""),
])
def test_determine_methylation_type(mf, expected):
    assert gt.determine_methylation_type(mf) == expected


@pytest.mark.parametrize("genotype,expected", [
    # variantcall_utils_test.py:211-283 has_variation/genotype classes
    # mapped onto genotype_type.
    ([0, 0], "hom_ref"),
    ([0, 1], "het"),
    ([0, 2], "het"),
    ([1, 1], "hom_alt"),
    ([2, 2], "hom_alt"),
    ([1, 2], "het"),
    ([-1, -1], "no_call"),
    ([-1, 0], "no_call"),
    ([], "no_call"),
])
def test_genotype_type_classes(genotype, expected):
    v = _variant("A", ["C", "G"])
    v.calls.append(VariantCall(call_set_name="s", genotype=list(genotype)))
    assert gt.genotype_type(v) == expected


@pytest.mark.parametrize("num_alts,ploidy,exc", [
    (0, 1, NotImplementedError),
    (0, 3, NotImplementedError),
    (-1, 2, ValueError),
    (3, 2, ValueError),
])
def test_invalid_allele_indices_with_num_alts(num_alts, ploidy, exc):
    with pytest.raises(exc):
        allele_indices_with_num_alts(
            _variant("G", ["A"]), num_alts, ploidy=ploidy
        )

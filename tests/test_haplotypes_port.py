"""Port of haplotypes_test.py's ResolveOverlappingVariantsTest corpus
(877 LoC): exact resolved genotypes, rescaled genotype likelihoods,
and PASS/LowQual filters for compatible, resolvable-incompatible,
multiallelic, unresolvable, and too-many-variants overlap groups."""

import pytest

from deepvariant_tpu.core.types import Variant, VariantCall
from deepvariant_tpu.postprocess import haplotypes

MIN_QUAL_FILTER = 1.0


def _var(chrom="1", start=5, end=None, ref=None, alt=None, qual=50,
         filters=None, genotype=None, likelihoods=None,
         sample_name="NA12878"):
    if ref is None and end is None:
        ref = "A"
    elif ref is None:
        ref = "A" * (end - start)
    if alt is None:
        alt = ["C"]
    if genotype is None:
        genotype = [0, 1]
    if likelihoods is None:
        likelihoods = [-1.0, -0.0506099933550872, -2.0]
    v = Variant(
        reference_name=chrom, start=start, end=start + len(ref),
        reference_bases=ref, alternate_bases=list(alt),
    )
    v.quality = qual
    if filters:
        v.filter = list(filters)
    v.calls.append(VariantCall(
        call_set_name=sample_name, genotype=list(genotype),
        genotype_likelihood=list(likelihoods),
    ))
    return v


def _check(got, expected):
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert (g.reference_name, g.start, g.reference_bases,
                g.alternate_bases) == (
            e.reference_name, e.start, e.reference_bases,
            e.alternate_bases)
        assert g.calls[0].genotype == e.calls[0].genotype
        assert g.calls[0].genotype_likelihood == pytest.approx(
            e.calls[0].genotype_likelihood, abs=1e-10
        )
        if e.filter:
            assert g.filter == e.filter


def resolve(variants):
    return list(haplotypes.maybe_resolve_conflicting_variants(
        variants, qual_filter=MIN_QUAL_FILTER
    ))


def _resolvable_incompatible_inputs():
    return [
        _var(start=20, ref="ACCCCC", alt=["A"], genotype=[0, 1],
             likelihoods=[-2.0, -0.0506099933550872, -1.0]),
        _var(start=23, ref="C", alt=["T"], genotype=[1, 1],
             likelihoods=[-2.0, -0.3098039199714863,
                          -0.3010299956639812]),
    ]


def _resolved_compatible_outputs(qual=50,
                                 filters=("PASS",)):
    return [
        _var(start=20, ref="ACCCCC", alt=["A"], qual=qual,
             filters=list(filters), genotype=[0, 1],
             likelihoods=[-1.658964842664435, -0.010604831683503404,
                          -2.6589648426644352]),
        _var(start=23, ref="C", alt=["T"], qual=qual,
             filters=list(filters), genotype=[0, 1],
             likelihoods=[-1.658964842664435, -0.014526253196596468,
                          -1.9599948383284163]),
    ]


def test_can_disable_haplotype_resolution():
    variants = _resolvable_incompatible_inputs()
    got = list(haplotypes.maybe_resolve_conflicting_variants(
        variants, qual_filter=MIN_QUAL_FILTER, disable=True
    ))
    _check(got, _resolvable_incompatible_inputs())


def test_single_variant_passthrough():
    v = [_var(start=10, ref="A", alt=["C"], genotype=[0, 1],
              likelihoods=[-2.0, -0.0506099933550872, -1.0])]
    _check(resolve(v), v)


@pytest.mark.parametrize("starts_refs", [
    # compatible het del + later het snp inside it
    [(20, "ACCCCC", ["A"]), (23, "C", ["T"])],
    [(20, "ACCCCC", ["A"]), (21, "C", ["G"]), (23, "C", ["T"])],
    [(20, "ACCC", ["A"]), (22, "CCCGAGAGAG", ["C"]), (25, "G", ["T"])],
])
def test_compatible_calls_pass_through(starts_refs):
    variants = [
        _var(start=s, ref=r, alt=a, genotype=[0, 1],
             likelihoods=[-2.0, -0.0506099933550872, -1.0]
             if i == 0 else
             [-3.0, -0.004803708402820599, -2.0])
        for i, (s, r, a) in enumerate(starts_refs)
    ]
    expected = [
        _var(start=s, ref=r, alt=a, genotype=[0, 1],
             likelihoods=list(v.calls[0].genotype_likelihood))
        for (s, r, a), v in zip(starts_refs, variants)
    ]
    _check(resolve(variants), expected)


def test_incompatible_del_and_homalt_snp_resolved():
    """haplotypes_test.py: het deletion + hom-alt SNP inside it is
    rescaled to two PASS hets with exact joint likelihoods."""
    _check(resolve(_resolvable_incompatible_inputs()),
           _resolved_compatible_outputs())


def test_incompatible_multiallelic_resolved():
    variants = [
        _var(start=20, ref="ACCCCC", alt=["A"], genotype=[0, 1],
             likelihoods=[-2.0, -0.0506099933550872, -1.0]),
        _var(start=23, ref="C", alt=["T", "G"], genotype=[1, 2],
             likelihoods=[-2.0, -1.0, -0.6989700043360187,
                          -0.958607314841775, -0.4814860601221125,
                          -0.6020599913279624]),
    ]
    expected = [
        _var(start=20, ref="ACCCCC", alt=["A"], filters=["PASS"],
             genotype=[0, 1],
             likelihoods=[-1.315550534421905, -0.02373784695478589,
                          -2.315550534421905]),
        _var(start=23, ref="C", alt=["T", "G"], filters=["PASS"],
             genotype=[0, 2],
             likelihoods=[-1.315550534421905, -0.36130802498257997,
                          -2.0145205387579237, -0.319915339824355,
                          -1.7970365945440174, -1.9176105257498672]),
    ]
    _check(resolve(variants), expected)


def test_lowqual_filter_on_modified_variants():
    variants = [
        _var(start=20, ref="ACCCCC", alt=["A"], qual=0.5,
             genotype=[0, 1],
             likelihoods=[-2.0, -0.0506099933550872, -1.0]),
        _var(start=23, ref="C", alt=["T"], qual=0.5, genotype=[1, 1],
             likelihoods=[-2.0, -0.3098039199714863,
                          -0.3010299956639812]),
    ]
    got = resolve(variants)
    _check(got, _resolved_compatible_outputs(qual=0.5,
                                             filters=("LowQual",)))


def test_unresolvable_three_homalts_untouched():
    variants = [
        _var(start=20, ref="ACCCCC", alt=["A"], genotype=[1, 1],
             likelihoods=[-1.5228787452803376, -0.09691001300805639,
                          -0.7695510786217261]),
        _var(start=23, ref="CCCGATGAT", alt=["C"], genotype=[1, 1],
             likelihoods=[-1.3979400086720375, -0.1366771398795441,
                          -0.638272163982407]),
        _var(start=24, ref="C", alt=["G"], genotype=[1, 1],
             likelihoods=[-1.5228787452803376, -0.13076828026902382,
                          -0.638272163982407]),
    ]
    _check(resolve(variants), [
        _var(start=v.start, ref=v.reference_bases,
             alt=v.alternate_bases,
             genotype=list(v.calls[0].genotype),
             likelihoods=list(v.calls[0].genotype_likelihood))
        for v in variants
    ])


def test_too_many_variants_punts():
    variants = [_var(start=1, end=30, genotype=[0, 1],
                     likelihoods=[-2, -1, -3])] + [
        _var(start=i, genotype=[1, 1], likelihoods=[-3, -2, -1])
        for i in range(3, 25)
    ]
    got = resolve(variants)
    assert len(got) == len(variants)
    for g, v in zip(got, variants):
        assert g.calls[0].genotype == v.calls[0].genotype
        assert g.calls[0].genotype_likelihood == pytest.approx(
            v.calls[0].genotype_likelihood
        )


# -- helper-level semantics (haplotypes_test.py:622-849) -------------------

def test_group_overlapping_variants():
    a = _var(start=10, ref="AAA")
    b = _var(start=11, ref="A")
    c = _var(start=20, ref="A")
    groups = list(haplotypes.group_overlapping_variants(iter([a, b, c])))
    assert [[v.start for v in g] for g in groups] == [[10, 11], [20]]


@pytest.mark.parametrize("genotype,expected", [
    ([0, 0], 0), ([0, 1], 1), ([1, 0], 1), ([1, 1], 2),
    ([0, 2], 1), ([2, 2], 2), ([1, 2], 2),
])
def test_nonref_genotype_count(genotype, expected):
    v = _var(alt=["C", "G"], genotype=genotype,
             likelihoods=[-1.0] * 6)
    assert haplotypes._nonref_genotype_count(v) == expected


def test_all_variants_compatible():
    dele = _var(start=20, ref="ACCCCC", alt=["A"])
    snp = _var(start=23, ref="C", alt=["T"])
    calc = haplotypes.VariantCompatibilityCalculator([dele, snp])
    # 1 nonref copy each fits in a diploid genome.
    assert calc.all_variants_compatible([1, 1])
    # 2 del copies + 1 snp copy would need 3 haplotypes at 23.
    assert not calc.all_variants_compatible([2, 1])
    assert calc.all_variants_compatible([2, 0])
    assert calc.all_variants_compatible([0, 2])

"""Ported labeler corpora: variant_labeler_test.py (genotype tables,
truth filtering), positional_labeler_test.py (match semantics),
customized_classes_labeler_test.py (class labels),
soft_labeler_test.py (truth modification + soft haplotype matching).
"""

import pytest

from deepvariant_tpu.core.ranges import RangeSet
from deepvariant_tpu.core.types import Range, Variant, VariantCall
from deepvariant_tpu.labeler import variant_labeler as vl

CHROM = "chr20"


def mkvar(start=10, alleles=("A", "C"), gt=None, chrom=CHROM,
          filters=None, info=None):
    v = Variant(
        reference_name=chrom,
        start=start,
        end=start + len(alleles[0]),
        reference_bases=alleles[0],
        alternate_bases=list(alleles[1:]),
        filter=list(filters) if filters else [],
        info=dict(info) if info else {},
    )
    if gt is not None:
        v.calls.append(VariantCall(genotype=list(gt)))
    return v


class InMemoryVcf:
    def __init__(self, variants):
        self.variants = list(variants)

    def query(self, region):
        return [v for v in self.variants
                if v.reference_name == region.reference_name
                and v.start < region.end and v.end > region.start]


def make_positional(variants, confident):
    return vl.PositionalVariantLabeler(InMemoryVcf(variants), confident)


class TestGetTruthVariants:
    """variant_labeler_test.py test_get_truth_variants."""

    def setup_method(self):
        self.v1 = mkvar(chrom="1", start=10, gt=[0, 1])
        self.v2 = mkvar(chrom="1", start=20, gt=[0, 1])
        self.v3_filtered = mkvar(chrom="1", start=30, gt=[0, 1],
                                 filters=["FAIL"])
        self.v4_del = mkvar(chrom="1", start=40, alleles=["AAAA", "A"],
                            gt=[0, 1])
        self.v5_non_confident = mkvar(chrom="1", start=150, gt=[0, 1])
        self.labeler = make_positional(
            [self.v1, self.v2, self.v3_filtered, self.v4_del,
             self.v5_non_confident],
            RangeSet([Range("1", 1, 100)]),
        )

    def _get(self, start, end):
        return list(self.labeler._get_truth_variants(
            Range("1", start, end)))

    def test_point_queries(self):
        assert self._get(1, 15) == [self.v1]
        assert self._get(15, 25) == [self.v2]

    def test_filtered_truth_excluded(self):
        assert self._get(25, 35) == []

    def test_overlapping_deletion_found_from_any_overlap(self):
        for q in [(35, 45), (42, 43), (38, 42), (42, 50)]:
            assert self._get(*q) == [self.v4_del]

    def test_wide_query_gets_unfiltered_confident_only(self):
        assert self._get(1, 100) == [self.v1, self.v2, self.v4_del]
        # v5 is covered by the query but outside confident regions.
        assert self._get(1, 1000) == [self.v1, self.v2, self.v4_del]


# (variant_alleles, example_alts, truth_alleles, truth_gt,
#  expected_genotype, expected_label) — variant_labeler_test.py:92-254.
GENOTYPE_TABLE = [
    (["A", "C"], ["C"], ["A", "C"], [0, 0], (0, 0), 0),
    (["A", "C"], ["C"], ["A", "C"], [0, 1], (0, 1), 1),
    (["A", "C"], ["C"], ["A", "C"], [1, 0], (0, 1), 1),
    (["A", "C"], ["C"], ["A", "C"], [1, 1], (1, 1), 2),
    (["A"], [], ["A"], [0, 0], (0, 0), 0),
    (["A", "C", "G"], ["C"], ["A", "C"], [0, 1], (0, 1), 1),
    (["A", "C", "G"], ["C"], ["A", "C"], [1, 1], (1, 1), 2),
    (["A", "C", "G"], ["G"], ["A", "C"], [0, 1], (0, 1), 0),
    (["A", "C", "G"], ["G"], ["A", "C"], [1, 1], (1, 1), 0),
    (["A", "C", "G"], ["C", "G"], ["A", "C"], [0, 1], (0, 1), 1),
    (["A", "C", "G"], ["C", "G"], ["A", "C"], [1, 1], (1, 1), 2),
    (["A", "C"], ["C"], ["A", "C", "G"], [0, 0], (0, 0), 0),
    (["A", "C"], ["C"], ["A", "C", "G"], [0, 1], (0, 1), 1),
    (["A", "C"], ["C"], ["A", "C", "G"], [1, 1], (1, 1), 2),
    (["A", "G"], ["G"], ["A", "C", "G"], [0, 0], (0, 0), 0),
    (["A", "G"], ["G"], ["A", "C", "G"], [0, 2], (0, 1), 1),
    (["A", "G"], ["G"], ["A", "C", "G"], [2, 2], (1, 1), 2),
    (["A", "C", "G"], ["C"], ["A", "C", "G"], [1, 2], (1, 2), 1),
    (["A", "C", "G"], ["G"], ["A", "C", "G"], [1, 2], (1, 2), 1),
    (["A", "C", "G"], ["C", "G"], ["A", "C", "G"], [1, 2], (1, 2), 2),
    (["A", "C", "G", "T"], ["C"], ["A", "C", "G"], [1, 2], (1, 2), 1),
    (["A", "C", "G", "T"], ["G"], ["A", "C", "G"], [1, 2], (1, 2), 1),
    (["A", "C", "G", "T"], ["T"], ["A", "C", "G"], [1, 2], (1, 2), 0),
    (["A", "C", "G", "T"], ["C", "G"], ["A", "C", "G"], [1, 2], (1, 2), 2),
    (["A", "C", "G", "T"], ["C", "T"], ["A", "C", "G"], [1, 2], (1, 2), 1),
    (["A", "C", "G", "T"], ["G", "T"], ["A", "C", "G"], [1, 2], (1, 2), 1),
    (["A", "AC"], ["AC"], ["A", "AC"], [0, 0], (0, 0), 0),
    (["A", "AC"], ["AC"], ["A", "AC"], [0, 1], (0, 1), 1),
    (["A", "AC"], ["AC"], ["A", "AC"], [1, 1], (1, 1), 2),
    (["A", "AC"], ["AC"], ["A", "AC", "ACC"], [0, 0], (0, 0), 0),
    (["A", "AC"], ["AC"], ["A", "AC", "ACC"], [0, 1], (0, 1), 1),
    (["A", "AC"], ["AC"], ["A", "AC", "ACC"], [1, 1], (1, 1), 2),
    (["A", "AC"], ["AC"], ["A", "AC", "ACC"], [0, 2], (0, 0), 0),
    (["A", "AC"], ["AC"], ["A", "AC", "ACC"], [1, 2], (0, 1), 1),
    (["A", "AC"], ["AC"], ["A", "AC", "ACC"], [2, 2], (0, 0), 0),
    (["A", "AC"], ["AC"], ["AC", "A", "ACC"], [0, 2], (0, 1), 1),
    (["A", "AC"], ["AC"], ["AC", "A", "ACC"], [2, 2], (1, 1), 2),
    (["A", "AC"], ["AC"], ["AC", "A", "ACC"], [0, 1], (0, 0), 0),
    (["A", "AC"], ["AC"], ["AC", "A", "ACC"], [1, 1], (0, 0), 0),
    (["A", "AC"], ["AC"], ["AC", "A", "ACC"], [1, 2], (0, 1), 1),
    (["ACT", "A", "AACT"], ["A"], ["A", "AA"], [0, 1], (0, 2), 0),
    (["ACT", "A", "AACT"], ["A"], ["A", "AA"], [1, 1], (2, 2), 0),
    (["ACT", "A", "AACT"], ["AACT"], ["A", "AA"], [0, 1], (0, 2), 1),
    (["ACT", "A", "AACT"], ["AACT"], ["A", "AA"], [1, 1], (2, 2), 2),
    (["ACT", "A", "AACT"], ["A", "AACT"], ["A", "AA"], [0, 1], (0, 2), 1),
    (["ACT", "A", "AACT"], ["A", "AACT"], ["A", "AA"], [1, 1], (2, 2), 2),
    (["AGTGT", "A", "AGT", "AGTGTGT"], ["A"],
     ["AGT", "A", "AGTGT", "AGTGTGT"], [1, 2], (2, 3), 0),
    (["AGTGT", "A", "AGT", "AGTGTGT"], ["AGT"],
     ["AGT", "A", "AGTGT", "AGTGTGT"], [1, 2], (2, 3), 1),
    (["AGTGT", "A", "AGT", "AGTGTGT"], ["AGTGTGT"],
     ["AGT", "A", "AGTGT", "AGTGTGT"], [1, 2], (2, 3), 1),
    (["AGTGT", "A", "AGT", "AGTGTGT"], ["A", "AGT"],
     ["AGT", "A", "AGTGT", "AGTGTGT"], [1, 2], (2, 3), 1),
    (["AGTGT", "A", "AGT", "AGTGTGT"], ["A", "AGTGTGT"],
     ["AGT", "A", "AGTGT", "AGTGTGT"], [1, 2], (2, 3), 1),
]


class TestGenotypeFromMatchedTruth:
    @pytest.mark.parametrize(
        "variant_alleles,alt_alleles,truth_alleles,truth_gt,"
        "expected_genotype,expected_label", GENOTYPE_TABLE)
    def test_table(self, variant_alleles, alt_alleles, truth_alleles,
                   truth_gt, expected_genotype, expected_label):
        variant = mkvar(start=10, alleles=variant_alleles)
        truth = mkvar(start=10, alleles=truth_alleles, gt=truth_gt)
        got = vl._genotype_from_matched_truth(variant, truth)
        assert got == expected_genotype
        label = vl.VariantLabel(
            is_confident=True, variant=variant, genotype=expected_genotype
        )
        indices = [variant_alleles.index(a) - 1 for a in alt_alleles]
        assert label.label_for_alt_alleles(indices) == expected_label

    def test_none_truth_raises(self):
        with pytest.raises(ValueError, match="truth_variant cannot"):
            vl._genotype_from_matched_truth(mkvar(), None)

    def test_no_call_truth_raises(self):
        with pytest.raises(ValueError, match="Expected exactly one"):
            vl._genotype_from_matched_truth(mkvar(), mkvar(start=10))

    def test_uncalled_gt_truth_raises(self):
        with pytest.raises(ValueError, match="needs genotypes"):
            vl._genotype_from_matched_truth(
                mkvar(), mkvar(start=10, gt=[-1, -1]))

    def test_none_variant_raises(self):
        with pytest.raises(ValueError, match="variant cannot"):
            vl._genotype_from_matched_truth(None, mkvar(gt=[0, 1]))


class TestPositionalLabeler:
    """positional_labeler_test.py corpus."""

    snp = mkvar(start=10, alleles=["A", "C"], gt=[0, 1])
    deletion = mkvar(start=20, alleles=["ACG", "A"], gt=[1, 1])
    multiallelic = mkvar(start=30, alleles=["ACT", "ACTGT", "A"],
                         gt=[1, 2])
    non_confident = mkvar(start=200, alleles=["A", "C"], gt=[0, 1])
    filtered = mkvar(start=40, gt=[0, 1], filters=["FAILED"])
    variants = [snp, deletion, multiallelic, non_confident, filtered]

    def _labeler(self):
        return make_positional(
            self.variants, RangeSet([Range(CHROM, 10, 100)]))

    @pytest.mark.parametrize(
        "candidate,expected_confident,expected_truth,expected_genotype", [
            (snp, True, snp, None),
            (deletion, True, deletion, None),
            (multiallelic, True, multiallelic, None),
            # Outside confident regions: no truth comes back even
            # though a (non-confident) truth record exists there.
            (non_confident, False, None, None),
            (mkvar(start=300, alleles=["A", "C"]), False, None, None),
            # No match but confident: synthetic hom-ref.
            (mkvar(start=15, alleles=["C", "A"]), True,
             mkvar(start=15, alleles=["C", "A"], gt=[0, 0]), (0, 0)),
            # Same start, different alleles: truth returned, (0,0).
            (mkvar(start=10, alleles=["A", "G"]), True, snp, (0, 0)),
            (mkvar(start=10, alleles=["AC", "C"]), True, snp, (0, 0)),
            (mkvar(start=10, alleles=["A", "CA"]), True, snp, (0, 0)),
            # FILTERed truth is never matched: synthetic hom-ref.
            (mkvar(start=40), True, mkvar(start=40, gt=[0, 0]), (0, 0)),
        ])
    def test_label_variants(self, candidate, expected_confident,
                            expected_truth, expected_genotype):
        labeler = self._labeler()
        is_confident, truth = labeler._match(candidate)
        assert truth == expected_truth
        assert is_confident == expected_confident

        if expected_genotype is None and expected_truth is not None:
            expected_genotype = tuple(expected_truth.calls[0].genotype)
        labels = list(labeler.label_variants([candidate]))
        assert len(labels) == 1
        assert labels[0].variant == candidate
        assert labels[0].is_confident == expected_confident
        assert labels[0].genotype == expected_genotype

    def test_match_selects_variant_by_start(self):
        overlapping = [
            mkvar(start=20, alleles=["CC", "A"], gt=[1, 1]),
            mkvar(start=21, alleles=["AAA", "A"], gt=[0, 1]),
            mkvar(start=22, alleles=["AA", "A"], gt=[1, 1]),
        ]
        labeler = make_positional(
            overlapping, RangeSet([Range(CHROM, 0, 100)]))
        is_confident, truth = labeler._match(
            mkvar(start=21, alleles=["CC", "A"]))
        assert is_confident is True
        assert truth == overlapping[1]

    @pytest.mark.parametrize("candidate_alleles,truth_idx", [
        # Exact alt match wins over position-only matches.
        (["A", "AAA"], 1),
        # No allele match: fall back to the first.
        (["A", "TT"], 0),
    ])
    def test_match_multiple_at_same_start(self, candidate_alleles,
                                          truth_idx):
        overlapping = [
            mkvar(start=20, alleles=["A", "CC"], gt=[1, 1]),
            mkvar(start=20, alleles=["A", "AAA"], gt=[0, 1]),
            mkvar(start=20, alleles=["A", "AA"], gt=[1, 1]),
        ]
        labeler = make_positional(
            overlapping, RangeSet([Range(CHROM, 0, 100)]))
        is_confident, truth = labeler._match(
            mkvar(start=20, alleles=candidate_alleles))
        assert is_confident is True
        assert truth == overlapping[truth_idx]

    def test_match_simplifies_alleles_before_comparing(self):
        """GAAA->GAA equals GA->G after simplification; without it the
        match would wrongly fall back to the first record."""
        overlapping = [
            mkvar(start=20, alleles=["GAA", "G"], gt=[1, 1]),
            mkvar(start=20, alleles=["GA", "G"], gt=[0, 1]),
        ]
        labeler = make_positional(
            overlapping, RangeSet([Range(CHROM, 0, 100)]))
        is_confident, truth = labeler._match(
            mkvar(start=20, alleles=["GAAA", "GAA"]))
        assert is_confident is True
        # The matched truth comes back allele-simplified.
        assert truth.start == 20
        assert truth.calls[0].genotype == [0, 1]
        assert (truth.reference_bases, truth.alternate_bases) == \
            ("GA", ["G"])


class TestCustomizedClassesLabeler:
    """customized_classes_labeler_test.py corpus."""

    snp_class1 = mkvar(start=10, alleles=["A", "C"], gt=[0, 1],
                       info={"type": ["class1"]})
    snp_class2 = mkvar(start=20, alleles=["ACG", "A"], gt=[1, 1],
                       info={"type": ["class2"]})
    multiallelic = mkvar(start=30, alleles=["ACT", "ACTGT", "A"],
                         gt=[1, 2], info={"type": ["class2"]})
    non_confident = mkvar(start=200, alleles=["A", "C"], gt=[0, 1],
                          info={"type": ["class1"]})
    filtered = mkvar(start=40, gt=[0, 1], filters=["FAILED"],
                     info={"type": ["class1"]})
    variants = [snp_class1, snp_class2, multiallelic, non_confident,
                filtered]

    def _labeler(self, variants=None, confident=None):
        from deepvariant_tpu.labeler.customized_classes_labeler import (
            CustomizedClassesVariantLabeler,
        )

        return CustomizedClassesVariantLabeler(
            InMemoryVcf(variants or self.variants),
            confident or RangeSet([Range(CHROM, 10, 100)]),
            classes_list="ref,class1,class2",
            info_field_name="type",
        )

    @pytest.mark.parametrize(
        "candidate,expected_confident,expected_truth,expected_label,"
        "alt_indices", [
            (snp_class1, True, snp_class1, 1, [0]),
            (snp_class2, True, snp_class2, 2, [0]),
            (multiallelic, True, multiallelic, 2, [0]),
            (non_confident, False, None, 0, [0]),
            (mkvar(start=300, alleles=["A", "C"]), False, None, 0, [0]),
            (mkvar(start=15, alleles=["C", "A"]), True,
             mkvar(start=15, alleles=["C", "A"], gt=[0, 0]), 0, [0]),
            # Same start, different allele: class is unknown -> 0.
            (mkvar(start=10, alleles=["A", "G"]), True, snp_class1, 0,
             [0]),
            (mkvar(start=10, alleles=["AC", "C"]), True, snp_class1, 0,
             [0]),
            (mkvar(start=10, alleles=["A", "CA"]), True, snp_class1, 0,
             [0]),
            # FILTERed truth not matched.
            (mkvar(start=40), True, mkvar(start=40, gt=[0, 0]), 0, [0]),
            # Second alt matches the truth alt -> labeled through the
            # alt index that covers it.
            (mkvar(start=10, alleles=["A", "G", "C"]), True, snp_class1,
             1, [1]),
            (mkvar(start=10, alleles=["A", "G", "C"]), True, snp_class1,
             1, [0, 1]),
            (mkvar(start=10, alleles=["A", "G", "C"]), True, snp_class1,
             0, [0]),
        ])
    def test_label_variants(self, candidate, expected_confident,
                            expected_truth, expected_label, alt_indices):
        labeler = self._labeler()
        is_confident, truth = labeler._match(candidate)
        assert truth == expected_truth
        assert is_confident == expected_confident

        labels = list(labeler.label_variants([candidate]))
        assert len(labels) == 1
        assert labels[0].variant == candidate
        assert labels[0].is_confident == expected_confident
        assert labels[0].label_for_alt_alleles(alt_indices) == \
            expected_label

    def test_match_selects_variant_by_start(self):
        overlapping = [
            mkvar(start=20, alleles=["CC", "A"], gt=[1, 1],
                  info={"type": ["class1"]}),
            mkvar(start=21, alleles=["AAA", "A"], gt=[0, 1],
                  info={"type": ["class1"]}),
            mkvar(start=22, alleles=["AA", "A"], gt=[1, 1],
                  info={"type": ["class1"]}),
        ]
        labeler = self._labeler(
            overlapping, RangeSet([Range(CHROM, 0, 100)]))
        is_confident, truth = labeler._match(
            mkvar(start=21, alleles=["CC", "A"]))
        assert is_confident is True
        assert truth == overlapping[1]


class TestSoftLabelerPorts:
    """soft_labeler_test.py: modify_truth_variant + soft matching."""

    def test_modify_truth_variant_snp_skipped(self):
        from deepvariant_tpu.labeler import soft_labeler as sl
        from deepvariant_tpu.labeler import haplotype_labeler as hl

        ref = hl.ReferenceRegion("GATTACA", 0)
        v = mkvar(chrom="1", start=1, alleles=["A", "C"], gt=[0, 1])
        assert list(sl.modify_truth_variant(v, ref)) == []

    def test_modify_insertion(self):
        from deepvariant_tpu.labeler import soft_labeler as sl
        from deepvariant_tpu.labeler import haplotype_labeler as hl

        ref = hl.ReferenceRegion("GATTACA", 0)
        v = mkvar(chrom="1", start=0, alleles=["G", "GTT"], gt=[0, 1])
        got = sorted(
            (mv.reference_bases, tuple(mv.alternate_bases), p)
            for mv, p in sl.modify_truth_variant(v, ref)
        )
        assert got == sorted([
            ("G", ("G",), 0.2),
            ("G", ("GT",), 0.1),
            ("G", ("GTTT",), 0.1),
            ("G", ("GTTTT",), 0.2),
        ])

    def test_modify_deletion(self):
        from deepvariant_tpu.labeler import soft_labeler as sl
        from deepvariant_tpu.labeler import haplotype_labeler as hl

        ref = hl.ReferenceRegion("GATTACA", 0)
        v = mkvar(chrom="1", start=0, alleles=["GATT", "G"], gt=[0, 1])
        got = sorted(
            (mv.reference_bases, tuple(mv.alternate_bases), p)
            for mv, p in sl.modify_truth_variant(v, ref)
        )
        assert got == sorted([
            ("GATTAC", ("G",), 0.2),
            ("GATTA", ("G",), 0.1),
            ("GAT", ("G",), 0.1),
            ("GA", ("G",), 0.2),
        ])

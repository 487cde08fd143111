"""Haplotype labeler tests (scenarios from haplotype_labeler_test.py) +
training-mode integration on real chr20 data."""

import os

import pytest

from deepvariant_tpu.core.ranges import RangeSet, read_bed
from deepvariant_tpu.core.types import Range, Variant, VariantCall
from deepvariant_tpu.labeler import haplotype_labeler as hl

CHROM = "chr20"


def variant(start, ref, alts, gt=None):
    v = Variant(
        reference_name=CHROM, start=start, end=start + len(ref),
        reference_bases=ref, alternate_bases=list(alts),
    )
    if gt is not None:
        v.calls.append(VariantCall(genotype=list(gt)))
    return v


class FakeRef:
    def __init__(self, bases, start):
        self.region = hl.ReferenceRegion(bases, start)

    def query(self, r):
        return self.region.bases(r.start, r.end)

    def contig_length(self, name):
        return self.region.end


class FakeTruth:
    def __init__(self, variants):
        self.variants = variants

    def query(self, region):
        return [v for v in self.variants
                if v.start < region.end and v.end > region.start]


def make_labeler(truths, ref_bases="ACGTACGTACGTACGTACGT", ref_start=0,
                 confident=None):
    ref = FakeRef(ref_bases, ref_start)
    confident = confident or RangeSet(
        [Range(CHROM, ref_start, ref_start + len(ref_bases))]
    )
    return hl.HaplotypeLabeler(FakeTruth(truths), ref, confident)


class TestBuildHaplotype:
    REF = hl.ReferenceRegion("CAGC", 10)

    def test_snp_haplotypes(self):
        v1 = variant(10, "C", ["A"])
        v2 = variant(11, "A", ["T"])
        hap = hl.build_haplotype([v1, v2], [0, 1], self.REF, 10, 14)
        assert hap == "CTGC"
        hap = hl.build_haplotype([v1, v2], [1, 0], self.REF, 10, 14)
        assert hap == "AAGC"

    def test_deletion(self):
        v = variant(10, "CAG", ["C"])
        assert hl.build_haplotype([v], [1], self.REF, 10, 14) == "CC"
        assert hl.build_haplotype([v], [0], self.REF, 10, 14) == "CAGC"

    def test_insertion(self):
        v = variant(10, "C", ["CTT"])
        assert hl.build_haplotype([v], [1], self.REF, 10, 14) == "CTTAGC"


class TestFalseNegativeGenotypes:
    def test_expansion(self):
        assert hl.with_false_negative_genotypes((0, 0)) == [(0, 0)]
        assert hl.with_false_negative_genotypes((0, 1)) == [(0, 0), (0, 1)]
        assert hl.with_false_negative_genotypes((1, 1)) == [
            (0, 0), (0, 1), (1, 1)
        ]
        assert hl.with_false_negative_genotypes((1, 2)) == [
            (0, 0), (0, 1), (0, 2), (1, 2)
        ]


class TestLabeling:
    def test_exact_match_het(self):
        truth = variant(5, "C", ["A"], gt=(0, 1))
        labeler = make_labeler([truth])
        cand = variant(5, "C", ["A"])
        labels = list(labeler.label_variants([cand], Range(CHROM, 0, 20)))
        assert len(labels) == 1
        assert labels[0].is_confident
        assert tuple(labels[0].genotype) == (0, 1)
        assert labels[0].label_for_alt_alleles([0]) == 1

    def test_exact_match_homalt(self):
        truth = variant(5, "C", ["A"], gt=(1, 1))
        labeler = make_labeler([truth])
        cand = variant(5, "C", ["A"])
        labels = list(labeler.label_variants([cand], Range(CHROM, 0, 20)))
        assert labels[0].label_for_alt_alleles([0]) == 2

    def test_false_positive_gets_homref(self):
        labeler = make_labeler([])
        cand = variant(5, "C", ["A"])
        labels = list(labeler.label_variants([cand], Range(CHROM, 0, 20)))
        assert tuple(labels[0].genotype) == (0, 0)
        assert labels[0].label_for_alt_alleles([0]) == 0

    def test_representation_difference(self):
        # ref is a period-4 repeat (ACGT)*5: deleting any aligned 4-mer
        # inside the repeat yields the same sequence, so truth del at 0
        # and candidate del at 1 are equivalent representations.
        truth = variant(0, "ACGTA", ["A"], gt=(0, 1))
        labeler = make_labeler([truth])
        cand = variant(1, "CGTAC", ["C"])
        labels = list(labeler.label_variants([cand], Range(CHROM, 0, 20)))
        assert tuple(labels[0].genotype) == (0, 1)

    def test_nearby_variants_grouped(self):
        truths = [
            variant(4, "A", ["T"], gt=(0, 1)),
            variant(8, "A", ["G"], gt=(1, 1)),
        ]
        labeler = make_labeler(truths)
        cands = [variant(4, "A", ["T"]), variant(8, "A", ["G"])]
        labels = list(labeler.label_variants(cands, Range(CHROM, 0, 20)))
        assert [tuple(l.genotype) for l in labels] == [(0, 1), (1, 1)]

    def test_multiallelic(self):
        truth = variant(5, "C", ["A", "G"], gt=(1, 2))
        labeler = make_labeler([truth])
        cand = variant(5, "C", ["A", "G"])
        labels = list(labeler.label_variants([cand], Range(CHROM, 0, 20)))
        assert sorted(labels[0].genotype) == [1, 2]
        assert labels[0].label_for_alt_alleles([0]) == 1
        assert labels[0].label_for_alt_alleles([0, 1]) == 2


class TestGrouping:
    def test_distant_variants_in_separate_groups(self):
        cands = [variant(10, "A", ["T"]), variant(500, "A", ["G"])]
        groups = hl.group_variants(cands, [])
        assert len(groups) == 2

    def test_close_variants_in_one_group(self):
        cands = [variant(10, "A", ["T"]), variant(20, "A", ["G"])]
        groups = hl.group_variants(cands, [])
        assert len(groups) == 1

    def test_max_group_size(self):
        cands = [variant(10 + 2 * i, "A", ["T"]) for i in range(12)]
        groups = hl.group_variants(cands, [], max_group_size=8)
        assert len(groups) == 2
        assert len(groups[0][0]) == 8


@pytest.mark.integration
def test_training_mode_with_haplotype_labeler(testdata_dir, tmp_path):
    """Training-mode make_examples on real chr20 data with NIST truth."""
    from deepvariant_tpu.io import examples as example_codec
    from deepvariant_tpu.io.tfrecord import TFRecordReader
    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        make_examples_runner,
    )

    options = MakeExamplesOptions(
        reads_filename=os.path.join(
            testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
        ),
        ref_filename=os.path.join(
            testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ),
        examples_filename=str(tmp_path / "training.tfrecord"),
        mode="training",
        regions=["chr20:10,000,000-10,004,000"],
        truth_variants_filename=os.path.join(
            testdata_dir, "input/test_nist.b37_chr20_100kbp_at_10mb.vcf.gz"
        ),
        confident_regions_filename=os.path.join(
            testdata_dir, "input/test_nist.b37_chr20_100kbp_at_10mb.bed"
        ),
        labeler_algorithm="haplotype_labeler",
    )
    counts = make_examples_runner(options)
    assert counts["examples"] > 10
    labels = []
    with TFRecordReader(str(tmp_path / "training.tfrecord")) as reader:
        for buf in reader:
            ex = example_codec.parse_example(buf)
            assert ex.label is not None
            labels.append(ex.label)
    # Real data: a mix of hom-ref/het/hom-alt labels.
    assert set(labels) <= {0, 1, 2}
    assert len(set(labels)) >= 2


class TestCustomizedClassesLabeler:
    def test_labels_from_info_field(self):
        from deepvariant_tpu.labeler.customized_classes_labeler import (
            CustomizedClassesVariantLabeler,
        )

        truth = variant(5, "C", ["A"], gt=(0, 1))
        truth.info["type"] = ["class2"]
        labeler = CustomizedClassesVariantLabeler(
            FakeTruth([truth]), RangeSet([Range(CHROM, 0, 100)]),
            classes_list="ref,class1,class2",
        )
        cand = variant(5, "C", ["A"])
        labels = list(labeler.label_variants([cand]))
        assert labels[0].is_confident
        assert labels[0].label_for_alt_alleles([0]) == 2

    def test_no_truth_gives_ref_class(self):
        from deepvariant_tpu.labeler.customized_classes_labeler import (
            CustomizedClassesVariantLabeler,
        )

        labeler = CustomizedClassesVariantLabeler(
            FakeTruth([]), RangeSet([Range(CHROM, 0, 100)]),
            classes_list="ref,class1,class2",
        )
        cand = variant(5, "C", ["A"])
        labels = list(labeler.label_variants([cand]))
        assert labels[0].label_for_alt_alleles([0]) == 0

    @pytest.mark.integration
    def test_real_with_types_vcf(self, testdata_dir):
        import os

        from deepvariant_tpu.io.vcf import VcfReader
        from deepvariant_tpu.labeler.customized_classes_labeler import (
            CustomizedClassesVariantLabeler,
        )

        truth_path = os.path.join(
            testdata_dir,
            "input/with_types.test_nist.b37_chr20_4kbp_at_10mb.vcf.gz",
        )
        truths = list(VcfReader(truth_path))
        labeler = CustomizedClassesVariantLabeler(
            VcfReader(truth_path), None,
            classes_list="ref,class1,class2",
        )
        # Candidates identical to truths must get their INFO class.
        n_classed = 0
        for tv in truths:
            cand = variant(tv.start, tv.reference_bases,
                           list(tv.alternate_bases))
            cand.reference_name = tv.reference_name
            label = next(iter(labeler.label_variants([cand])))
            got = label.label_for_alt_alleles([0])
            if "type" in tv.info and tv.calls and \
                    tv.calls[0].genotype != [0, 0]:
                want = {"ref": 0, "class1": 1, "class2": 2}[
                    str(tv.info["type"][0])
                ]
                assert got == want, (tv.start, got, want)
                n_classed += got > 0
        assert n_classed > 0


class TestLabelingMetrics:
    """Metric counting scenarios (haplotype_labeler_test.py:790+ style)."""

    def test_exact_tp(self):
        truth = variant(5, "C", ["A"], gt=(0, 1))
        labeler = make_labeler([truth])
        list(labeler.label_variants(
            [variant(5, "C", ["A"])], Range(CHROM, 0, 20)
        ))
        m = labeler.metrics
        assert m.n_truth_variant_sites == 1
        assert m.n_truth_variant_alleles == 1
        assert m.n_candidate_variant_sites == 1
        assert m.n_true_positive_sites == 1
        assert m.n_true_positive_alleles == 1
        assert m.n_false_positive_sites == 0
        assert m.n_false_negative_sites == 0
        assert m.n_exact_position_matches == 1
        assert m.n_exact_position_and_allele_matches == 1
        assert m.n_exact_position_and_allele_and_genotype_matches == 1

    def test_false_positive_candidate(self):
        labeler = make_labeler([])
        list(labeler.label_variants(
            [variant(5, "C", ["A"])], Range(CHROM, 0, 20)
        ))
        m = labeler.metrics
        assert m.n_candidate_variant_sites == 1
        assert m.n_false_positive_sites == 1
        assert m.n_false_positive_alleles == 1
        assert m.n_truth_variant_sites == 0
        assert m.n_true_positive_sites == 0

    def test_false_negative_truth(self):
        # Truth exists; candidate misses the allele entirely (different
        # position, different allele).
        truth = variant(5, "C", ["A"], gt=(1, 1))
        labeler = make_labeler([truth])
        list(labeler.label_variants(
            [variant(13, "C", ["G"])], Range(CHROM, 0, 20)
        ))
        m = labeler.metrics
        assert m.n_truth_variant_sites == 1
        assert m.n_false_negative_sites == 1
        assert m.n_false_negative_alleles == 2
        assert m.n_false_positive_sites == 1  # the spurious candidate

    def test_non_confident_candidate_counted_separately(self):
        truth = variant(5, "C", ["A"], gt=(0, 1))
        labeler = make_labeler(
            [truth], confident=RangeSet([Range(CHROM, 0, 10)])
        )
        list(labeler.label_variants(
            [variant(5, "C", ["A"]), variant(17, "C", ["G"])],
            Range(CHROM, 0, 20),
        ))
        m = labeler.metrics
        assert m.n_candidate_variant_sites == 1
        assert m.n_non_confident_candidate_variant_sites == 1

    def test_metrics_accumulate_and_serialize(self):
        truth = variant(5, "C", ["A"], gt=(0, 1))
        labeler = make_labeler([truth])
        list(labeler.label_variants(
            [variant(5, "C", ["A"])], Range(CHROM, 0, 20)
        ))
        list(labeler.label_variants(
            [variant(5, "C", ["A"])], Range(CHROM, 0, 20)
        ))
        m = labeler.metrics.as_dict()
        assert m["n_truth_variant_sites"] == 2
        assert set(m) == {
            "n_truth_variant_sites", "n_truth_variant_alleles",
            "n_candidate_variant_sites", "n_candidate_variant_alleles",
            "n_non_confident_candidate_variant_sites",
            "n_true_positive_sites", "n_true_positive_alleles",
            "n_false_negative_sites", "n_false_negative_alleles",
            "n_false_positive_sites", "n_false_positive_alleles",
            "n_inexact_position_matches", "n_exact_position_matches",
            "n_exact_position_and_allele_matches",
            "n_exact_position_and_allele_and_genotype_matches",
            "n_truth_multiallelics_sites_with_missed_alleles",
        }


@pytest.mark.integration
def test_labeling_metrics_sidecar(testdata_dir, tmp_path):
    """Training run writes <examples>.labeling_metrics.json."""
    import json

    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        make_examples_runner,
    )

    options = MakeExamplesOptions(
        reads_filename=os.path.join(
            testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
        ),
        ref_filename=os.path.join(
            testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ),
        examples_filename=str(tmp_path / "t.tfrecord"),
        mode="training",
        regions=["chr20:10,000,000-10,004,000"],
        truth_variants_filename=os.path.join(
            testdata_dir, "input/test_nist.b37_chr20_100kbp_at_10mb.vcf.gz"
        ),
        confident_regions_filename=os.path.join(
            testdata_dir, "input/test_nist.b37_chr20_100kbp_at_10mb.bed"
        ),
    )
    make_examples_runner(options)
    metrics_path = str(tmp_path / "t.tfrecord.labeling_metrics.json")
    assert os.path.exists(metrics_path)
    with open(metrics_path) as f:
        m = json.load(f)
    assert m["n_truth_variant_sites"] > 0
    assert m["n_candidate_variant_sites"] > 0
    assert m["n_true_positive_sites"] > 0


class TestCombinedLabeler:
    def _make(self, truths, confident=None):
        from deepvariant_tpu.labeler.combined_labeler import (
            CombinedLabeler,
        )

        ref = FakeRef("ACGTACGTACGTACGTACGT", 0)
        confident = confident or RangeSet([Range(CHROM, 0, 20)])
        return CombinedLabeler(FakeTruth(truths), ref, confident)

    def test_snp_uses_haplotype_label(self):
        truth = variant(5, "C", ["A"], gt=(0, 1))
        labeler = self._make([truth])
        labels = list(labeler.label_variants(
            [variant(5, "C", ["A"])], Range(CHROM, 0, 20)
        ))
        assert len(labels) == 1
        assert tuple(labels[0].genotype) == (0, 1)

    def test_indel_falls_back_to_positional_when_hap_homref(self):
        # Truth indel at the same position but with a non-equivalent
        # alt: the haplotype labeler cannot reconcile haplotypes and
        # calls the candidate hom-ref; the positional labeler matches
        # by position and rescues a non-ref genotype.
        truth = variant(4, "AC", ["A"], gt=(1, 1))
        labeler = self._make([truth])
        cand = variant(4, "ACG", ["A"])
        labels = list(labeler.label_variants(
            [cand], Range(CHROM, 0, 20)
        ))
        assert len(labels) == 1
        hap_only = list(
            self._make([truth])._haplotype.label_variants(
                [cand], Range(CHROM, 0, 20)
            )
        )
        pos_only = list(
            self._make([truth])._positional.label_variants([cand])
        )
        if tuple(hap_only[0].genotype) == (0, 0):
            assert labels[0].genotype == pos_only[0].genotype
        else:
            assert labels[0].genotype == hap_only[0].genotype

    def test_dispatch_by_name(self):
        from deepvariant_tpu.labeler.combined_labeler import (
            CombinedLabeler,
        )
        from deepvariant_tpu.labeler.variant_labeler import make_labeler

        class Opts:
            labeler_algorithm = "combined_labeler"
            truth_variants_filename = ""
            confident_regions_filename = ""

        # make_labeler needs a VCF; use a fake by monkeypatching is
        # heavier than it is worth — construct directly instead and
        # just assert the class wiring exists in the dispatch table.
        import inspect

        src = inspect.getsource(make_labeler)
        assert "combined_labeler" in src
        assert CombinedLabeler is not None


class TestSoftLabeler:
    def test_modify_truth_variant_insertion(self):
        from deepvariant_tpu.labeler.soft_labeler import (
            modify_truth_variant,
        )

        ref = hl.ReferenceRegion("ACGTACGTACGT", 0)
        tv = variant(2, "G", ["GTT"], gt=(0, 1))
        mods = list(modify_truth_variant(tv, ref))
        # -2 removes too much (len 3 alt, -2 leaves 1 = "G" ok?
        # allele[:-2] = "G" -> len 1 > 0 so allowed), -1, +1, +2.
        assert len(mods) == 4
        penalties = sorted(p for _, p in mods)
        assert penalties == [0.1, 0.1, 0.2, 0.2]
        alleles = sorted(m.alternate_bases[0] for m, _ in mods)
        assert alleles == ["G", "GT", "GTTT", "GTTTT"]

    def test_modify_truth_variant_deletion(self):
        from deepvariant_tpu.labeler.soft_labeler import (
            modify_truth_variant,
        )

        ref = hl.ReferenceRegion("ACGTACGTACGT", 0)
        tv = variant(2, "GTA", ["G"], gt=(0, 1))
        mods = list(modify_truth_variant(tv, ref))
        refs = sorted(m.reference_bases for m, _ in mods)
        # +1/+2 trim the ref (+2 degenerates to ref == alt, which the
        # reference guard permits); -1/-2 extend with reference bases.
        assert refs == ["G", "GT", "GTAC", "GTACG"]

    def test_snp_not_modified(self):
        from deepvariant_tpu.labeler.soft_labeler import (
            modify_truth_variant,
        )

        ref = hl.ReferenceRegion("ACGTACGT", 0)
        assert list(modify_truth_variant(
            variant(2, "G", ["C"], gt=(0, 1)), ref
        )) == []

    def test_exact_match_still_labels(self):
        from deepvariant_tpu.labeler.soft_labeler import SoftLabeler

        truth = variant(5, "C", ["A"], gt=(0, 1))
        ref = FakeRef("ACGTACGTACGTACGTACGT", 0)
        labeler = SoftLabeler(
            FakeTruth([truth]), ref,
            RangeSet([Range(CHROM, 0, 20)]),
        )
        labels = list(labeler.label_variants(
            [variant(5, "C", ["A"])], Range(CHROM, 0, 20)
        ))
        assert len(labels) >= 1
        assert all(tuple(l.genotype) == (0, 1) for l in labels)

    def test_near_indel_truth_matches_with_penalty(self):
        """Candidate 2bp insertion vs truth 3bp insertion: hard
        haplotype labeling calls it hom-ref; soft labeling finds the
        modified-truth match."""
        from deepvariant_tpu.labeler.soft_labeler import (
            find_all_matching_haplotypes,
        )

        ref = hl.ReferenceRegion("ACGTACGTACGT", 0)
        truth = variant(2, "G", ["GTTT"], gt=(1, 1))
        cand = variant(2, "G", ["GTT"])
        hard = hl.find_best_matching_haplotypes([cand], [truth], ref)
        assert tuple(hard.candidate_genotypes[0]) == (0, 0)
        matches = find_all_matching_haplotypes([cand], [truth], ref)
        best = matches[0]
        assert best.is_soft_label
        assert tuple(best.candidate_genotypes[0]) == (1, 1)
        assert best.truth_mod_penalties == [0.1]
        # Non-ambiguous candidate keeps a hard one-hot label.
        assert best.candidate_probabilities[0] == (0.0, 0.0, 1.0)


@pytest.mark.integration
def test_customized_classes_golden_label_parity(testdata_dir, tmp_path):
    """Labels match customized_classes.golden.training_examples 19/19
    (reference make_examples_test.py customized-classes end2end)."""
    from deepvariant_tpu.io import examples as example_codec
    from deepvariant_tpu.io.tfrecord import TFRecordReader
    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        make_examples_runner,
    )

    def load(path):
        out = {}
        with TFRecordReader(path) as r:
            for buf in r:
                ex = example_codec.parse_example(buf)
                v = ex.variant
                out[(v.start, v.reference_bases,
                     tuple(v.alternate_bases),
                     tuple(ex.alt_allele_indices))] = ex.label
        return out

    golden = load(os.path.join(
        testdata_dir,
        "customized_classes.golden.training_examples.tfrecord.gz",
    ))
    options = MakeExamplesOptions(
        reads_filename=os.path.join(
            testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
        ),
        ref_filename=os.path.join(
            testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ),
        examples_filename=str(tmp_path / "cc.tfrecord"),
        mode="training",
        regions=["chr20:10,000,000-10,004,000"],
        truth_variants_filename=os.path.join(
            testdata_dir,
            "input/with_types.test_nist.b37_chr20_4kbp_at_10mb.vcf.gz",
        ),
        confident_regions_filename=os.path.join(
            testdata_dir,
            "input/test_nist.b37_chr20_100kbp_at_10mb.bed",
        ),
        labeler_algorithm="customized_classes_labeler",
    )
    options.pileup_options.channels = (1, 2, 3, 4, 5, 6)
    make_examples_runner(options)
    ours = load(str(tmp_path / "cc.tfrecord"))
    assert set(golden) == set(ours)
    assert all(golden[k] == ours[k] for k in golden)
    assert len(golden) == 19


@pytest.mark.integration
def test_training_examples_golden_label_parity(testdata_dir, tmp_path):
    """Labels match golden.training_examples 49/49 (haplotype labeler
    default flow)."""
    from deepvariant_tpu.io import examples as example_codec
    from deepvariant_tpu.io.tfrecord import TFRecordReader
    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        make_examples_runner,
    )

    def load_records(path):
        out = {}
        from deepvariant_tpu.io import tfrecord as tfr

        for buf in tfr.read_tfrecords(path):
            ex = example_codec.parse_example(buf)
            v = ex.variant
            out[(v.start, v.reference_bases,
                 tuple(v.alternate_bases),
                 tuple(ex.alt_allele_indices))] = ex.label
        return out

    golden = load_records(os.path.join(
        testdata_dir, "golden.training_examples.tfrecord.gz"
    ))
    options = MakeExamplesOptions(
        reads_filename=os.path.join(
            testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
        ),
        ref_filename=os.path.join(
            testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ),
        examples_filename=str(tmp_path / "tr.tfrecord"),
        mode="training",
        regions=["chr20:10,000,000-10,010,000"],
        truth_variants_filename=os.path.join(
            testdata_dir, "input/test_nist.b37_chr20_100kbp_at_10mb.vcf.gz"
        ),
        confident_regions_filename=os.path.join(
            testdata_dir, "input/test_nist.b37_chr20_100kbp_at_10mb.bed"
        ),
    )
    make_examples_runner(options)
    ours = load_records(str(tmp_path / "tr.tfrecord"))
    common = set(golden) & set(ours)
    assert len(common) == len(golden) == 49
    assert all(golden[k] == ours[k] for k in common)


class TestReferenceRegressionExamples:
    """haplotype_labeler_test.py:1839-2001 real-pileup regression
    examples (exact expected genotypes for tricky equivalent
    representations) plus the overlapping-deletion and false-variant
    sweeps (:1606-1680)."""

    def _check(self, candidates, truths, ref_bases, ref_start,
               expected_genotypes):
        lo = ref_start
        hi = ref_start + len(ref_bases)
        labeler = make_labeler(
            truths, ref_bases=ref_bases, ref_start=lo,
            confident=RangeSet([Range(CHROM, lo, hi)]),
        )
        labels = list(labeler.label_variants(
            candidates, Range(CHROM, lo, hi)
        ))
        assert [list(l.genotype) for l in labels] == expected_genotypes

    def test_example1(self):
        self._check(
            [variant(3528531, "ATAG", ["A"]),
             variant(3528537, "A", ["ATT"])],
            [variant(3528533, "A", ["T"], gt=(1, 1)),
             variant(3528534, "G", ["A"], gt=(1, 1)),
             variant(3528536, "TA", ["T"], gt=(1, 1))],
            "xATAGTTATC", 3528530,
            [[1, 1], [1, 1]],
        )

    def test_example2(self):
        self._check(
            [variant(4030067, "TC", ["T"]),
             variant(4030072, "C", ["G"])],
            [variant(4030071, "CC", ["G"], gt=(1, 1))],
            "xTCCCCCA", 4030066,
            [[1, 1], [1, 1]],
        )

    def test_example3(self):
        self._check(
            [variant(4568151, "AC", ["A"]),
             variant(4568154, "TG", ["T"]),
             variant(4568156, "G", ["T"]),
             variant(4568157, "A", ["ATACCCTTT"])],
            [variant(4568152, "C", ["A"], gt=(1, 1)),
             variant(4568153, "A", ["T"], gt=(1, 1)),
             variant(4568155, "G", ["A"], gt=(1, 1)),
             variant(4568156, "G", ["T"], gt=(1, 1)),
             variant(4568157, "A", ["ACCCTTT"], gt=(1, 1))],
            "xACATGGATGGA", 4568150,
            [[1, 1], [1, 1], [1, 1], [1, 1]],
        )

    def test_example4(self):
        self._check(
            [variant(1689633, "C", ["CT"]),
             variant(1689635, "TG", ["T"]),
             variant(1689638, "ATG", ["A"]),
             variant(1689641, "A", ["ACAG"])],
            [variant(1689633, "C", ["CT"], gt=(1, 0)),
             variant(1689636, "G", ["A"], gt=(1, 0)),
             variant(1689639, "T", ["C"], gt=(1, 0)),
             variant(1689640, "G", ["A"], gt=(1, 0)),
             variant(1689641, "A", ["G"], gt=(1, 0))],
            "xCGTGAATGAAA", 1689632,
            [[0, 1], [0, 1], [0, 1], [0, 1]],
        )

    def test_example5(self):
        self._check(
            [variant(2401510, "ATGT", ["A"]),
             variant(2401515, "C", ["T"])],
            [variant(2401511, "TG", ["A"], gt=(1, 1)),
             variant(2401513, "TAC", ["T"], gt=(1, 1))],
            "xATGTACACAG", 2401509,
            [[1, 1], [1, 1]],
        )

    def test_example6_overlapping_candidates(self):
        self._check(
            [variant(2525696, "AAT", ["A"]),
             variant(2525697, "AT", ["T"])],
            [variant(2525696, "AAT", ["A"], gt=(0, 1))],
            "xAATT", 2525695,
            [[0, 1], [0, 0]],
        )

    def test_example7_complex_multiallelic(self):
        self._check(
            [variant(279768, "G", ["C"]),
             variant(279773, "ATA", ["C", "CTA"])],
            [variant(279773, "A", ["C"], gt=(0, 1))],
            "CGCCCCATACCTTTT", 279767,
            [[0, 0], [0, 2]],
        )

    def test_overlapping_deletions_followed_by_snp(self):
        self._check(
            [variant(61, "GAA", ["G", "GA"]),
             variant(62, "A", ["G"]),
             variant(63, "A", ["G"])],
            [variant(61, "GA", ["G"], gt=(1, 1)),
             variant(63, "A", ["G"], gt=(0, 1))],
            "GGAAAAAAAAAAAAAAAAGGTATAA", 60,
            [[2, 2], [0, 0], [0, 1]],
        )

    def test_deletion_insertion_same_position(self):
        self._check(
            [variant(61, "GAA", ["G", "GAAA"])],
            [variant(61, "GAA", ["G", "GAAA"], gt=(1, 2))],
            "GGAAAAAAAAAAAAAAAAGGTATAA", 60,
            [[1, 2]],
        )

    def test_false_variants_get_homref_genotype(self):
        import itertools

        ref_bases, ref_start = "xACGTAy", 10
        v1 = variant(11, "A", ["T"], gt=(0, 1))
        v2 = variant(13, "G", ["GG"], gt=(1, 1))
        all_fps = [
            variant(12, "C", ["G"], gt=(0, 0)),
            variant(14, "T", ["A"], gt=(0, 0)),
            variant(15, "A", ["AA"], gt=(0, 0)),
        ]
        for n_fps in range(1, len(all_fps) + 1):
            for fps in itertools.combinations(all_fps, n_fps):
                cands = sorted(
                    [v1, v2] + list(fps),
                    key=lambda v: (v.start, v.end),
                )
                expected = [list(v.calls[0].genotype) for v in cands]
                self._check(
                    [variant(v.start, v.reference_bases,
                             v.alternate_bases) for v in cands],
                    [v1, v2], ref_bases, ref_start, expected,
                )

"""Population allele frequency tests (reference allele_frequency_test.py
scenarios) + end-to-end AF-channel run on real cohort data."""

import os

import numpy as np
import pytest

from deepvariant_tpu.core.types import Range, Variant
from deepvariant_tpu.io.fasta import InMemoryFasta
from deepvariant_tpu.make_examples.allele_frequency import (
    find_matching_allele_frequency,
    get_allele_frequency,
    get_ref_allele_frequency,
    make_population_vcf_readers,
    match_candidate_and_cohort_haplotypes,
    update_haplotype,
)

CHROM = "chr20"


def cohort_variant(start, ref, alts, afs):
    return Variant(
        reference_name=CHROM, start=start, end=start + len(ref),
        reference_bases=ref, alternate_bases=list(alts),
        info={"AF": list(afs)},
    )


class FakeVcf:
    def __init__(self, variants):
        self.variants = variants

    def query(self, region):
        return [v for v in self.variants
                if v.start < region.end and v.end > region.start]


class TestAfMath:
    def test_get_allele_frequency(self):
        v = cohort_variant(10, "A", ["C", "G"], [0.1, 0.25])
        assert get_allele_frequency(v, 0) == 0.1
        assert get_allele_frequency(v, 1) == 0.25
        assert get_ref_allele_frequency(v) == pytest.approx(0.65)

    def test_update_haplotype(self):
        v = cohort_variant(12, "A", ["T"], [0.5])
        haps = update_haplotype(v, "GGAAGG", 10)
        assert haps[0]["haplotype"] == "GGTAGG"


class TestMatching:
    def test_exact_snp_match(self):
        ref = InMemoryFasta({CHROM: "ACGTACGTACGTACGTACGT"})
        candidate = Variant(
            reference_name=CHROM, start=5, end=6,
            reference_bases="C", alternate_bases=["T"],
        )
        cohort = FakeVcf([cohort_variant(5, "C", ["T"], [0.125])])
        afs = find_matching_allele_frequency(candidate, cohort, ref)
        assert afs["T"] == 0.125
        assert afs["C"] == pytest.approx(0.875)

    def test_representation_difference_match(self):
        # Same deletion expressed at different anchor in a repeat:
        # ref (ACGT)*5; candidate del at 1 (CGTAC->C), cohort at 0
        # (ACGTA->A).
        ref = InMemoryFasta({CHROM: "ACGTACGTACGTACGTACGT"})
        candidate = Variant(
            reference_name=CHROM, start=1, end=6,
            reference_bases="CGTAC", alternate_bases=["C"],
        )
        cohort = FakeVcf([cohort_variant(0, "ACGTA", ["A"], [0.03])])
        afs = find_matching_allele_frequency(candidate, cohort, ref)
        assert afs["C"] == pytest.approx(0.03)

    def test_no_match_gives_zero(self):
        ref = InMemoryFasta({CHROM: "ACGTACGTACGTACGTACGT"})
        candidate = Variant(
            reference_name=CHROM, start=5, end=6,
            reference_bases="C", alternate_bases=["T"],
        )
        afs = find_matching_allele_frequency(
            candidate, FakeVcf([]), ref
        )
        assert afs["T"] == 0
        assert afs["C"] == 1


@pytest.mark.integration
class TestRealCohort:
    def test_population_vcf_readers(self, testdata_dir):
        readers = make_population_vcf_readers([os.path.join(
            testdata_dir, "input/cohort-chr20_100k.vcf.gz"
        )])
        # defaultdict: any contig name resolves to the single reader.
        assert readers["chr20"] is readers["chrX"]

    def test_af_channel_end_to_end(self, testdata_dir, tmp_path):
        from deepvariant_tpu.io import examples as example_codec
        from deepvariant_tpu.io.tfrecord import TFRecordReader
        from deepvariant_tpu.make_examples.core import (
            MakeExamplesOptions,
            make_examples_runner,
        )
        from deepvariant_tpu.make_examples.pileup import (
            CH_ALLELE_FREQUENCY,
            DEFAULT_CHANNELS,
        )

        options = MakeExamplesOptions(
            reads_filename=os.path.join(
                testdata_dir, "input/grch38_1k_subset_chr20_and_chr21.bam"
            ),
            ref_filename=os.path.join(
                testdata_dir, "input/grch38.chr20_and_21_10M.fa.gz"
            ),
            examples_filename=str(tmp_path / "af.tfrecord"),
            mode="calling",
            regions=["chr20:61,000-100,000"],
            realigner_enabled=False,
            population_vcf_filenames=[os.path.join(
                testdata_dir, "input/cohort-chr20_100k.vcf.gz"
            )],
        )
        options.pileup_options.channels = tuple(
            DEFAULT_CHANNELS + [CH_ALLELE_FREQUENCY]
        )
        counts = make_examples_runner(options)
        assert counts["examples"] > 0
        af_nonzero = 0
        with TFRecordReader(str(tmp_path / "af.tfrecord")) as reader:
            for buf in reader:
                ex = example_codec.parse_example(buf)
                # AF channel is the last channel.
                if ex.image[5:, :, -1].any():
                    af_nonzero += 1
        assert af_nonzero > 0, "no example carries AF channel data"

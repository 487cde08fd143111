"""Alt-aligned pileup tests: cigar trimming, composition shapes, and a
real-data integration run in diff_channels mode."""

import os

import numpy as np
import pytest

from deepvariant_tpu.core.cigar import format_cigar, parse_cigar_string
from deepvariant_tpu.core.types import Range, Read, Variant
from deepvariant_tpu.make_examples.alt_aligned import (
    calculate_alignment_region,
    compose_alt_aligned,
    create_haplotype,
    trim_cigar,
    trim_read,
    trim_reads,
)

CHROM = "chr1"


def make_read(start, bases, cigar, name="r"):
    return Read(
        fragment_name=name,
        aligned_sequence=bases,
        aligned_quality=bytes([30] * len(bases)),
        reference_name=CHROM,
        position=start,
        mapping_quality=60,
        cigar=parse_cigar_string(cigar),
    )


class TestTrimCigar:
    def test_simple_match(self):
        cigar, read_start, read_len = trim_cigar(
            parse_cigar_string("100M"), 10, 30
        )
        assert format_cigar(cigar) == "30M"
        assert read_start == 10 and read_len == 30

    def test_trim_through_insertion(self):
        # 20M 10I 70M; trim 30 ref bases: consumes 20M + 10 of 70M,
        # read offset = 20 + 10(I) + 10 = 40.
        cigar, read_start, read_len = trim_cigar(
            parse_cigar_string("20M10I70M"), 30, 40
        )
        assert format_cigar(cigar) == "40M"
        assert read_start == 40 and read_len == 40

    def test_trim_through_deletion(self):
        # 20M 10D 70M; trim 25 ref: 20M + 5 of D (no read), then cover
        # 40: rest of D (5, no read) + 35M.
        cigar, read_start, read_len = trim_cigar(
            parse_cigar_string("20M10D70M"), 25, 40
        )
        assert format_cigar(cigar) == "5D35M"
        assert read_start == 20 and read_len == 35

    def test_window_inside_deletion_only(self):
        cigar, read_start, read_len = trim_cigar(
            parse_cigar_string("20M20D20M"), 22, 5
        )
        assert format_cigar(cigar) == "5D"
        assert read_len == 0


class TestTrimRead:
    def test_overlapping_left(self):
        read = make_read(100, "A" * 50, "50M")
        out = trim_read(read, Range(CHROM, 120, 140))
        assert out.position == 120
        assert out.aligned_sequence == "A" * 20
        assert format_cigar(out.cigar) == "20M"

    def test_contained_read_untrimmed_position(self):
        read = make_read(125, "A" * 10, "10M")
        out = trim_read(read, Range(CHROM, 120, 140))
        assert out.position == 125
        assert out.aligned_sequence == "A" * 10

    def test_trim_reads_drops_short_overlap(self):
        reads = [
            make_read(100, "A" * 50, "50M", "long"),
            make_read(130, "A" * 50, "50M", "short_overlap"),
        ]
        # Region 100-140: second read overlaps only 10bp < 15.
        out, idx = trim_reads(reads, Range(CHROM, 100, 140))
        assert [r.fragment_name for r in out] == ["long"]
        assert idx == [0]


class TestHaplotype:
    def test_create_haplotype_substitutes_alt(self):
        ref = "ACGTACGTACGTACGTACGT"

        def query(r):
            return ref[r.start:r.end]

        variant = Variant(reference_name=CHROM, start=10, end=11,
                          reference_bases=ref[10],
                          alternate_bases=["G"])
        hap, ref_start, ref_end = create_haplotype(
            variant, "G", 5, query, len(ref)
        )
        assert ref_start == 5 and ref_end == 16
        assert hap == ref[5:10] + "G" + ref[11:16]

    def test_alignment_region_clamped(self):
        variant = Variant(reference_name=CHROM, start=3, end=4,
                          reference_bases="A", alternate_bases=["T"])
        region = calculate_alignment_region(variant, 110, 500)
        assert region.start == 0 and region.end == 114


class TestCompose:
    def _imgs(self, h=10, w=21, c=6):
        ref = np.full((h, w, c), 7, np.uint8)
        alt1 = np.full((h, w, c), 50, np.uint8)
        alt2 = np.full((h, w, c), 90, np.uint8)
        return ref, alt1, alt2

    def test_diff_channels(self):
        ref, alt1, alt2 = self._imgs()
        out = compose_alt_aligned(ref, [alt1, alt2], "diff_channels",
                                  ["A", "C"])
        assert out.shape == (10, 21, 8)
        assert (out[..., 6] == 50).all() and (out[..., 7] == 90).all()

    def test_diff_channels_missing_alt2_copies_alt1(self):
        ref, alt1, _ = self._imgs()
        out = compose_alt_aligned(ref, [alt1, None], "diff_channels",
                                  ["A"])
        assert (out[..., 6] == 50).all() and (out[..., 7] == 50).all()

    def test_diff_channels_no_alts_zero(self):
        ref, _, _ = self._imgs()
        out = compose_alt_aligned(ref, [None, None], "diff_channels",
                                  ["A"])
        assert (out[..., 6] == 0).all() and (out[..., 7] == 0).all()

    def test_rows(self):
        ref, alt1, alt2 = self._imgs()
        out = compose_alt_aligned(ref, [alt1, alt2], "rows", ["A", "C"])
        assert out.shape == (30, 21, 6)
        assert (out[:10] == 7).all() and (out[10:20] == 50).all()

    def test_single_row_prefers_longer_alt(self):
        ref, alt1, alt2 = self._imgs()
        out = compose_alt_aligned(ref, [alt1, alt2], "single_row",
                                  ["A", "CTT"])
        assert out.shape == (20, 21, 6)
        assert (out[10:] == 90).all()

    def test_none_passthrough(self):
        ref, _, _ = self._imgs()
        out = compose_alt_aligned(ref, [], "none", ["A"])
        assert out is ref


@pytest.mark.integration
def test_diff_channels_end_to_end(testdata_dir, tmp_path):
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
        examples_filename=str(tmp_path / "alt.tfrecord"),
        mode="calling",
        regions=["chr20:10,000,000-10,002,500"],
    )
    options.pileup_options.alt_aligned_pileup = "diff_channels"
    # Golden contract uses the 6 base channels (enums 1-6).
    options.pileup_options.channels = (1, 2, 3, 4, 5, 6)
    make_examples_runner(options)
    info = example_codec.read_example_info(str(tmp_path / "alt.tfrecord"))
    # Golden contract: diff_channels => (100, 221, 8), channels + [9, 10]
    assert info["shape"] == [100, 221, 8]
    assert info["channels"][-2:] == [9, 10]
    snp_zero = indel_nonzero = 0
    with TFRecordReader(str(tmp_path / "alt.tfrecord")) as reader:
        for buf in reader:
            ex = example_codec.parse_example(buf)
            assert ex.image.shape == (100, 221, 8)
            is_indel = len(ex.variant.reference_bases) > 1 or any(
                len(a) > 1 for a in ex.variant.alternate_bases
            )
            alt_planes = ex.image[..., 6:]
            if is_indel and alt_planes.any():
                indel_nonzero += 1
            if not is_indel and not alt_planes.any():
                snp_zero += 1
    assert indel_nonzero > 0, "no indel example has alt-aligned data"
    assert snp_zero > 0, "SNP examples should have zero alt planes"

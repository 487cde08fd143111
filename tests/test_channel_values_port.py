"""Port of the reference's pileup_channel_lib_test.cc pinned channel
values (955 LoC: per-read scalar channels, homopolymer vectors, scale
functions) onto our PileupEncoder."""

import numpy as np
import pytest

from deepvariant_tpu.core.cigar import parse_cigar_string
from deepvariant_tpu.core.types import Range, Read, Variant
from deepvariant_tpu.io.bam import ReadBatch
from deepvariant_tpu.make_examples.pileup import (
    CH_AVG_BASE_QUALITY,
    CH_BASE_QUALITY,
    CH_GAP_COMPRESSED_IDENTITY,
    CH_GC_CONTENT,
    CH_IDENTITY,
    CH_IS_HOMOPOLYMER,
    CH_HOMOPOLYMER_WEIGHTED,
    CH_READ_BASE,
    CH_READ_MAPPING_PERCENT,
    CH_READ_SUPPORTS_VARIANT,
    CH_STRAND,
    CH_SUPPLEMENTARY_ALIGNMENT,
    MAX_PIXEL_FLOAT,
    PileupEncoder,
    PileupOptions,
    _homopolymer_flags,
    _homopolymer_weights,
    _scale_color,
    _scale_int,
)
from deepvariant_tpu.make_examples.variant_caller import DeepVariantCall

CHROM = "chr1"


def make_read(start, bases, cigar, name="r", quals=None, mapq=60,
              flags=0, tlen=0):
    return Read(
        fragment_name=name,
        aligned_sequence=bases,
        aligned_quality=bytes(
            quals if quals is not None else [30] * len(bases)
        ),
        reference_name=CHROM,
        position=start,
        mapping_quality=mapq,
        cigar=parse_cigar_string(cigar),
        reverse_strand=bool(flags & 0x10),
        fragment_length=tlen,
    )


def encode_one(read, channels, ref="A" * 40, start=0, variant_start=5,
               dv_call=None, extra_flags=0):
    opts = PileupOptions(width=21, height=9, channels=tuple(channels))
    enc = PileupEncoder(opts)
    batch = ReadBatch.from_reads([read], [CHROM])
    if extra_flags:
        batch.flag = batch.flag | extra_flags
    ref_window = np.frombuffer(ref[:21].encode(), np.uint8)
    row = enc.encode_read_row(
        batch, 0, ref_window, start, variant_start,
        support_code=0, dv_call=dv_call, alt_alleles=(),
    )
    assert row is not None
    return row


def channel_value(read, channel, **kw):
    """The constant per-read channel pixel (first covered column)."""
    row = encode_one(read, [CH_READ_BASE, channel], **kw)
    covered = np.nonzero(row[:, 0])[0]
    return int(row[covered[0], 1])


class TestScaleFunctions:
    def test_scale_color_vector(self):
        # ScaleColorVector(vec, 50): 254 * min(v, 50) / 50.
        vec = np.array([0, 10, 25, 50, 60])
        got = _scale_color(vec, 50)
        expected = [0, 50, 127, 254, 254]
        assert got.tolist() == expected

    def test_scale_over_max_clamps(self):
        vec = np.arange(0, 300)
        got = _scale_color(vec, 254)
        assert int(got[254]) == 254
        assert int(got[299]) == 254


class TestPerReadScalars:
    def test_read_mapping_percent(self):
        read = make_read(1, "AAAAATTTTT", "5M5D")
        assert channel_value(read, CH_READ_MAPPING_PERCENT) == \
            _scale_int(50, 100)

    def test_avg_base_quality(self):
        read = make_read(
            1, "AAAAATTTTT", "10M", quals=list(range(1, 11))
        )
        # variant_start outside the read: the low-qual-at-call-site
        # drop rule must not engage for this per-read scalar check.
        assert channel_value(
            read, CH_AVG_BASE_QUALITY, variant_start=15
        ) == _scale_int(5, 93)

    def test_identity_basic(self):
        read = make_read(1, "AAAAATTTTT", "5M1I4M")
        assert channel_value(read, CH_IDENTITY) == _scale_int(90, 100)

    def test_identity_pacbio_cigar(self):
        read = make_read(1, "AAAAATTTTT", "5=1X4=")
        assert channel_value(read, CH_IDENTITY) == _scale_int(90, 100)

    def test_gap_compressed_identity_insertion(self):
        read = make_read(1, "AAAAATTTTT", "3M4I3M")
        assert channel_value(read, CH_GAP_COMPRESSED_IDENTITY) == \
            _scale_int(85, 100)

    def test_gap_compressed_identity_deletion(self):
        read = make_read(1, "AAAAATTTTT", "3M4D3M")
        assert channel_value(read, CH_GAP_COMPRESSED_IDENTITY) == \
            _scale_int(85, 100)

    def test_gap_compressed_identity_pacbio(self):
        read = make_read(1, "AAAAATTTTT", "3=2X2I3=")
        assert channel_value(read, CH_GAP_COMPRESSED_IDENTITY) == \
            _scale_int(66, 100)

    def test_gc_content_all(self):
        read = make_read(1, "GGGGGCCCCC", "10M")
        assert channel_value(read, CH_GC_CONTENT) == _scale_int(100, 100)

    def test_gc_content_half(self):
        read = make_read(1, "GGGGGTTTTT", "10M")
        assert channel_value(read, CH_GC_CONTENT) == _scale_int(50, 100)

    def test_supplementary_alignment(self):
        opts = PileupOptions()
        read = make_read(1, "AAAAATTTTT", "10M")
        supp = channel_value(
            read, CH_SUPPLEMENTARY_ALIGNMENT, extra_flags=0x800
        )
        plain = channel_value(read, CH_SUPPLEMENTARY_ALIGNMENT)
        assert supp == int(
            MAX_PIXEL_FLOAT * opts.allele_supporting_read_alpha
        )
        assert plain == int(
            MAX_PIXEL_FLOAT * opts.allele_unsupporting_read_alpha
        )


class TestHomopolymer:
    # (bases, expected flags) — pileup_channel_lib_test.cc:506-541.
    CASES = [
        ("GGGATAATA", [1, 1, 1, 0, 0, 0, 0, 0, 0]),
        ("ATTGGGTTA", [0, 0, 0, 1, 1, 1, 0, 0, 0]),
        ("ATAATAGGG", [0, 0, 0, 0, 0, 0, 1, 1, 1]),
        ("AAAAAAAAA", [1, 1, 1, 1, 1, 1, 1, 1, 1]),
    ]

    @pytest.mark.parametrize("bases,expected", CASES)
    def test_is_homopolymer(self, bases, expected):
        flags = _homopolymer_flags(
            np.frombuffer(bases.encode(), np.uint8)
        )
        assert flags.astype(int).tolist() == expected

    def test_homopolymer_weighted(self):
        bases = "GATTGGGCCCCAAAAA"
        weights = _homopolymer_weights(
            np.frombuffer(bases.encode(), np.uint8)
        )
        expected = [1, 1, 2, 2, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 5]
        assert weights.astype(int).tolist() == expected

    def test_homopolymer_weighted_capped_at_30(self):
        bases = "G" * 10 + "A" * 40
        read = make_read(1, bases, "50M")
        row = encode_one(
            read, [CH_READ_BASE, CH_HOMOPOLYMER_WEIGHTED],
            ref="A" * 60,
        )
        covered = np.nonzero(row[:, 0])[0]
        # The A-run is 40 long but the weight saturates at 30.
        vals = row[covered, 1]
        assert vals.max() == int(MAX_PIXEL_FLOAT * 30 / 30.0)


class TestBaseAndStrandColors:
    def test_base_colors(self):
        # BaseColor semantics via the read_base LUT (Appendix A):
        # A=250, G=180, T=100, C=30.
        opts = PileupOptions(width=9, height=9,
                             channels=(CH_READ_BASE,))
        enc = PileupEncoder(opts)
        read = make_read(0, "ATGC", "4M")
        batch = ReadBatch.from_reads([read], [CHROM])
        ref_window = np.frombuffer(b"AAAAAAAAA", np.uint8)
        row = enc.encode_read_row(
            batch, 0, ref_window, 0, 4, support_code=0,
        )
        assert row[:4, 0].tolist() == [250, 100, 180, 30]

    def test_strand_colors(self):
        opts = PileupOptions()
        fwd = make_read(1, "AAAA", "4M")
        rev = make_read(1, "AAAA", "4M", flags=0x10)
        assert channel_value(fwd, CH_STRAND) == \
            opts.positive_strand_color
        assert channel_value(rev, CH_STRAND) == \
            opts.negative_strand_color


class TestReadSupportsAlt:
    def _dv_call(self, support):
        v = Variant(
            reference_name=CHROM, start=5, end=6,
            reference_bases="A", alternate_bases=["C", "G"],
        )
        return DeepVariantCall(variant=v, allele_support=support)

    def _support_pixel(self, dv_call, support_code_alts):
        opts = PileupOptions(
            width=21, height=9,
            channels=(CH_READ_BASE, CH_READ_SUPPORTS_VARIANT),
        )
        enc = PileupEncoder(opts)
        read = make_read(1, "A" * 10, "10M")
        batch = ReadBatch.from_reads([read], [CHROM])
        ref_window = np.frombuffer(b"A" * 21, np.uint8)
        code = enc._read_supports_alt(dv_call, 0, support_code_alts)
        row = enc.encode_read_row(
            batch, 0, ref_window, 0, 5, support_code=code,
        )
        covered = np.nonzero(row[:, 0])[0]
        return int(row[covered[0], 1])

    def test_unsupporting(self):
        opts = PileupOptions()
        dv = self._dv_call({})
        assert self._support_pixel(dv, ["C"]) == int(
            MAX_PIXEL_FLOAT * opts.allele_unsupporting_read_alpha
        )

    def test_supporting(self):
        opts = PileupOptions()
        dv = self._dv_call({"C": [0]})
        assert self._support_pixel(dv, ["C"]) == int(
            MAX_PIXEL_FLOAT * opts.allele_supporting_read_alpha
        )

    def test_other_allele_supporting(self):
        opts = PileupOptions()
        dv = self._dv_call({"G": [0]})
        assert self._support_pixel(dv, ["C"]) == int(
            MAX_PIXEL_FLOAT * opts.other_allele_supporting_read_alpha
        )

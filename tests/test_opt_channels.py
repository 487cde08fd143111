"""Opt-channel tests (deepvariant/channels/*_channel.cc formulas)."""

import numpy as np
import pytest

from deepvariant_tpu.core.cigar import parse_cigar_string
from deepvariant_tpu.core.types import Range, Read, Variant
from deepvariant_tpu.io.bam import ReadBatch
from deepvariant_tpu.make_examples.pileup import (
    CH_AVG_BASE_QUALITY,
    CH_GAP_COMPRESSED_IDENTITY,
    CH_GC_CONTENT,
    CH_HOMOPOLYMER_WEIGHTED,
    CH_IDENTITY,
    CH_IS_HOMOPOLYMER,
    CH_READ_MAPPING_PERCENT,
    CH_SUPPLEMENTARY_ALIGNMENT,
    MAX_PIXEL_FLOAT,
    PileupEncoder,
    PileupOptions,
    _homopolymer_flags,
    _homopolymer_weights,
)
from deepvariant_tpu.make_examples.variant_caller import DeepVariantCall

CHROM = "chr1"


def test_homopolymer_flags():
    seq = np.frombuffer(b"ATCGGGAG", np.uint8)
    np.testing.assert_array_equal(
        _homopolymer_flags(seq), [0, 0, 0, 1, 1, 1, 0, 0]
    )


def test_homopolymer_weights():
    seq = np.frombuffer(b"ATCGGGAA", np.uint8)
    np.testing.assert_array_equal(
        _homopolymer_weights(seq), [1, 1, 1, 3, 3, 3, 2, 2]
    )


def _encode_one_read(channels, bases="ACGGGGTACG", cigar="10M",
                     qual=30, flag=0):
    opts = PileupOptions(width=21, channels=tuple(channels))
    encoder = PileupEncoder(opts)
    read = Read(
        fragment_name="r1",
        aligned_sequence=bases,
        aligned_quality=bytes([qual] * len(bases)),
        reference_name=CHROM,
        position=100,
        mapping_quality=60,
        cigar=parse_cigar_string(cigar),
    )
    batch = ReadBatch.from_reads([read], [CHROM])
    if flag:
        batch.flag = np.array([flag], np.uint16)
    ref_window = np.frombuffer(b"A" * 21, np.uint8)
    dv_call = DeepVariantCall(
        variant=Variant(reference_name=CHROM, start=105, end=106,
                        reference_bases="A", alternate_bases=["T"]),
        allele_support={}, ref_support=[],
    )
    row = encoder.encode_read_row(
        batch, 0, ref_window, 95, 105, 0
    )
    return row


class TestOptChannels:
    def test_avg_base_quality(self):
        row = _encode_one_read([CH_AVG_BASE_QUALITY], qual=31)
        # 254 * 31 / 93 = 84
        covered = row[row[:, 0] > 0, 0]
        assert (covered == int(254 * 31 / 93)).all()

    def test_mapping_percent_and_identity(self):
        row = _encode_one_read(
            [CH_READ_MAPPING_PERCENT, CH_IDENTITY],
            bases="ACGTACGTAC", cigar="5M2I3M",
        )
        # matched = 8 of 10 -> 80% -> 254*80/100 = 203
        nz = row[:, 0][row[:, 0] > 0]
        assert (nz == int(254 * 80 / 100)).all()
        nz1 = row[:, 1][row[:, 1] > 0]
        assert (nz1 == int(254 * 80 / 100)).all()

    def test_gap_compressed_identity(self):
        row = _encode_one_read(
            [CH_GAP_COMPRESSED_IDENTITY],
            bases="ACGTACGTAC", cigar="5M2I3M",
        )
        # match 8, gap-compressed len 8 + 1 = 9 -> 88%
        nz = row[:, 0][row[:, 0] > 0]
        assert (nz == int(254 * int(100 * 8 / 9) / 100)).all()

    def test_gc_content(self):
        row = _encode_one_read([CH_GC_CONTENT], bases="GGGGGCCCCC")
        nz = row[:, 0][row[:, 0] > 0]
        assert (nz == 254).all()
        row = _encode_one_read([CH_GC_CONTENT], bases="ATATATATAT")
        assert (row[:, 0] == 0).all()

    def test_is_homopolymer_per_base(self):
        row = _encode_one_read(
            [CH_IS_HOMOPOLYMER], bases="ACGGGGTACG"
        )
        # cols 95.. read at ref 100: cols 5..14; GGGG at read pos 2-5.
        assert (row[7:11, 0] == 254).all()
        assert row[5, 0] == 0 and row[6, 0] == 0

    def test_supplementary_alignment(self):
        row = _encode_one_read(
            [CH_SUPPLEMENTARY_ALIGNMENT], flag=0x800
        )
        nz = row[:, 0][row[:, 0] > 0]
        assert (nz == 254).all()
        row = _encode_one_read([CH_SUPPLEMENTARY_ALIGNMENT])
        nz = row[:, 0][row[:, 0] > 0]
        assert (nz == int(254 * 0.6)).all()

    def test_reference_rows(self):
        opts = PileupOptions(width=10, channels=(
            CH_AVG_BASE_QUALITY, CH_GC_CONTENT, CH_IS_HOMOPOLYMER,
        ))
        encoder = PileupEncoder(opts)
        ref = np.frombuffer(b"GGGGGAATTC", np.uint8)
        row = encoder.encode_reference_row(ref)
        assert (row[:, 0] == 254).all()          # avg base quality
        assert (row[:, 1] == int(254 * 60 / 100)).all()  # 60% GC
        assert (row[:5, 2] == 254).all()         # GGGGG homopolymer
        assert (row[7:9, 2] == 0).all() or (row[5:7, 2] == 0).all()


class TestMethylation:
    def test_mm_ml_decoding_forward(self):
        from deepvariant_tpu.io.methylation import (
            decode_base_modifications,
        )

        # seq C at positions 0, 2, 5, 7; MM deltas 1,0 -> skip 1 C
        # (pos 0) mod at pos 2, then next C (pos 5).
        mods = decode_base_modifications(
            "CACGACAC", "C+m,1,0;", np.array([200, 100], np.uint8),
            is_reverse=False,
        )
        values = mods["C+m"]
        assert values[2] == 200 and values[5] == 100
        assert values[0] == 0 and values[7] == 0

    def test_mm_ml_decoding_reverse(self):
        from deepvariant_tpu.io.methylation import (
            decode_base_modifications,
        )

        # Reverse strand: C+m refers to G on the aligned strand, walked
        # from the 3' end. seq GAGAG -> G at aligned 0, 2, 4; from the
        # end: 4, 2, 0. delta 0 -> first = pos 4; delta 0 again -> 2.
        mods = decode_base_modifications(
            "GAGAG", "C+m,0,0;", np.array([150, 90], np.uint8),
            is_reverse=True,
        )
        values = mods["C+m"]
        assert values[4] == 150 and values[2] == 90

    def test_methylation_channel(self):
        from deepvariant_tpu.make_examples.pileup import (
            CH_BASE_METHYLATION,
            PileupEncoder,
            PileupOptions,
        )
        from deepvariant_tpu.make_examples.variant_caller import (
            DeepVariantCall,
        )
        from deepvariant_tpu.core.types import Variant

        opts = PileupOptions(width=21, channels=(CH_BASE_METHYLATION,))
        encoder = PileupEncoder(opts)
        read = Read(
            fragment_name="r1",
            aligned_sequence="ACGTACGTAC",
            aligned_quality=bytes([30] * 10),
            reference_name=CHROM,
            position=100,
            mapping_quality=60,
            cigar=parse_cigar_string("10M"),
        )
        batch = ReadBatch.from_reads([read], [CHROM])
        meth = np.zeros(10, np.uint8)
        meth[3] = 255
        batch.meth = [meth]
        dv_call = DeepVariantCall(
            variant=Variant(reference_name=CHROM, start=105, end=106,
                            reference_bases="A",
                            alternate_bases=["T"]),
            allele_support={}, ref_support=[],
        )
        row = encoder.encode_read_row(
            batch, 0, np.frombuffer(b"A" * 21, np.uint8), 95, 105, 0
        )
        # read pos 3 -> ref 103 -> col 8; 255 -> 254.
        assert row[8, 0] == 254
        assert row[7, 0] == 0 and row[9, 0] == 0

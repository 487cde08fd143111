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


def _mk_read(bases="ACGTACGTAC", cigar="10M", qual=30):
    return Read(
        fragment_name="r1",
        aligned_sequence=bases,
        aligned_quality=bytes([qual] * len(bases)),
        reference_name=CHROM,
        position=100,
        mapping_quality=60,
        cigar=parse_cigar_string(cigar),
    )


def _mk_dv_call(alts=("T",), allele_support=None, ref_support=(),
                info=None):
    v = Variant(reference_name=CHROM, start=105, end=106,
                reference_bases="A", alternate_bases=list(alts))
    if info:
        v.info.update(info)
    return DeepVariantCall(
        variant=v,
        allele_support=allele_support or {},
        ref_support=list(ref_support),
    )


def _encode_with_call(channels, dv_call, batch=None, read_idx=0):
    from deepvariant_tpu.make_examples.pileup import PileupEncoder, PileupOptions

    opts = PileupOptions(width=21, channels=tuple(channels))
    encoder = PileupEncoder(opts)
    if batch is None:
        batch = ReadBatch.from_reads([_mk_read()], [CHROM])
    ref_window = np.frombuffer(b"A" * 21, np.uint8)
    alts = list(dv_call.variant.alternate_bases) if dv_call else []
    return encoder.encode_read_row(
        batch, read_idx, ref_window, 95, 105, 0, dv_call=dv_call,
        alt_alleles=alts,
    )


class TestNewChannels:
    def test_base_6ma(self):
        from deepvariant_tpu.make_examples.pileup import CH_BASE_6MA

        batch = ReadBatch.from_reads([_mk_read()], [CHROM])
        m6a = np.zeros(10, np.uint8)
        m6a[4] = 255
        batch.meth6ma = [m6a]
        row = _encode_with_call([CH_BASE_6MA], None, batch=batch)
        # read pos 4 -> ref 104 -> col 9; 255 -> 254.
        assert row[9, 0] == 254
        assert row[8, 0] == 0 and row[10, 0] == 0

    def test_fuzzy_exact_support(self):
        from deepvariant_tpu.make_examples.pileup import (
            CH_READ_SUPPORTS_VARIANT_FUZZY,
        )

        dv_call = _mk_dv_call(allele_support={"T": {0}})
        row = _encode_with_call(
            [CH_READ_SUPPORTS_VARIANT_FUZZY], dv_call
        )
        nz = row[row[:, 0] > 0, 0]
        assert (nz == 254).all()  # alpha 1.0

    def test_fuzzy_near_indel_support(self):
        from deepvariant_tpu.make_examples.pileup import (
            CH_READ_SUPPORTS_VARIANT_FUZZY,
        )

        # Candidate has 2 alts; image holds only 'AT' (1bp ins); the
        # read supports off-image 'ATT' (2bp ins) -> length diff 1,
        # phases unset -> fuzzy color 0.90 * 254 = 228.
        dv_call = _mk_dv_call(
            alts=("AT", "ATT"), allele_support={"ATT": {0}}
        )
        from deepvariant_tpu.make_examples.pileup import (
            PileupEncoder,
            PileupOptions,
        )

        opts = PileupOptions(
            width=21, channels=(CH_READ_SUPPORTS_VARIANT_FUZZY,)
        )
        encoder = PileupEncoder(opts)
        batch = ReadBatch.from_reads([_mk_read()], [CHROM])
        row = encoder.encode_read_row(
            batch, 0, np.frombuffer(b"A" * 21, np.uint8), 95, 105, 0,
            dv_call=dv_call, alt_alleles=["AT"],
        )
        nz = row[row[:, 0] > 0, 0]
        assert (nz == int(254 * 0.90)).all()

    def test_fuzzy_phase_mismatch_blocks(self):
        from deepvariant_tpu.make_examples.pileup import (
            CH_READ_SUPPORTS_VARIANT_FUZZY,
            PileupEncoder,
            PileupOptions,
        )

        # ALT_PS: [ps_id, phase_alt0, phase_alt1] = [0, 1, 2]; read
        # HP=2 but image-alt phase is 1 -> no fuzzy, falls to
        # other-alt (0.6).
        dv_call = _mk_dv_call(
            alts=("AT", "ATT"), allele_support={"ATT": {0}},
            info={"ALT_PS": [0, 1, 2]},
        )
        opts = PileupOptions(
            width=21, channels=(CH_READ_SUPPORTS_VARIANT_FUZZY,)
        )
        encoder = PileupEncoder(opts)
        batch = ReadBatch.from_reads([_mk_read()], [CHROM])
        batch.hp = np.array([2], np.int8)
        row = encoder.encode_read_row(
            batch, 0, np.frombuffer(b"A" * 21, np.uint8), 95, 105, 0,
            dv_call=dv_call, alt_alleles=["AT"],
        )
        nz = row[row[:, 0] > 0, 0]
        assert (nz == int(254 * 0.6)).all()

    def test_allele_sample_probability(self):
        from deepvariant_tpu.make_examples.pileup import (
            CH_ALLELE_SAMPLE_PROBABILITY,
        )

        # Read 0 in a 3-read support group, 1 ref read: p = 3/4.
        dv_call = _mk_dv_call(
            allele_support={"T": {0, 1, 2}}, ref_support=[3]
        )
        row = _encode_with_call(
            [CH_ALLELE_SAMPLE_PROBABILITY], dv_call
        )
        nz = row[row[:, 0] > 0, 0]
        assert (nz == int(254 * np.sqrt(3 / 4))).all()

    def test_hmer_indel_quality(self):
        from deepvariant_tpu.make_examples.pileup import (
            CH_HOMOPOLYMER_DELETION_QUALITY,
            CH_HOMOPOLYMER_INSERTION_QUALITY,
        )

        batch = ReadBatch.from_reads(
            [_mk_read(bases="AAATTTTTCC", qual=20)], [CHROM]
        )
        tp = np.zeros(10, np.int8)
        tp[0] = -1  # deletion-direction quality on the AAA hmer
        batch.tp = [tp]
        row = _encode_with_call(
            [CH_HOMOPOLYMER_DELETION_QUALITY,
             CH_HOMOPOLYMER_INSERTION_QUALITY],
            None, batch=batch,
        )
        # AAA hmer (cols 5-7): del err = 10^-2 -> q20 -> 254*20/93.
        assert (row[5:8, 0] == int(254 * 20 / 93)).all()
        # Other hmers: no del-direction tp -> q93 -> 254.
        assert (row[8:13, 0] == 254).all()
        # Insertion channel: no positive tp anywhere -> all 254.
        assert (row[5:13, 1] == 254).all()

    def test_inter_hmer_insertion_quality(self):
        from deepvariant_tpu.make_examples.pileup import (
            CH_INTER_HOMOPOLYMER_INSERTION_QUALITY,
        )

        batch = ReadBatch.from_reads([_mk_read()], [CHROM])
        batch.t0 = [np.full(10, 20, np.uint8)]
        row = _encode_with_call(
            [CH_INTER_HOMOPOLYMER_INSERTION_QUALITY], None,
            batch=batch,
        )
        nz = row[row[:, 0] > 0, 0]
        assert (nz == int(254 * 20 / 93)).all()

    def test_mean_coverage_bar(self):
        from deepvariant_tpu.make_examples.pileup import (
            CH_MEAN_COVERAGE,
            CH_READ_BASE,
            PileupEncoder,
            PileupOptions,
        )

        opts = PileupOptions(
            width=21, height=12, reference_band_height=2,
            mean_coverage=3.0,
            channels=(CH_READ_BASE, CH_MEAN_COVERAGE),
        )
        encoder = PileupEncoder(opts)
        dv_call = _mk_dv_call()
        batch = ReadBatch.from_reads([_mk_read()], [CHROM])
        image = encoder.build_pileup(
            dv_call, np.frombuffer(b"A" * 21, np.uint8), batch, [0],
            ["T"],
        )
        assert (image[:2, :, 1] == 255).all()       # ref band
        assert (image[2:5, :, 1] == 200).all()      # coverage bar
        assert (image[5:, :, 1] == 0).all()


class TestUltimaTagParsing:
    def test_parse_ultima_tags(self):
        import struct

        from deepvariant_tpu.io.bam import BamReader

        batch = ReadBatch.from_reads([_mk_read()], [CHROM])
        # tp:B:c with 10 int8 values; t0:Z ASCII phred.
        tp_vals = [1, -1, 0, 0, 1, 0, 0, -1, 0, 0]
        blob = (b"tpBc" + struct.pack("<I", 10)
                + struct.pack("10b", *tp_vals))
        blob += b"t0Z" + bytes([33 + 20] * 10) + b"\x00"
        batch.aux = [blob]
        n = BamReader.parse_ultima_tags(None, batch)
        assert n == 1
        np.testing.assert_array_equal(batch.tp[0], tp_vals)
        np.testing.assert_array_equal(batch.t0[0], [20] * 10)

    def test_6ma_decoding(self):
        from deepvariant_tpu.io.methylation import (
            base_modification_values,
        )

        values = base_modification_values(
            "AACGAT", {"MM": "A+a,1;", "ML": np.array([99], np.uint8)},
            False, "a",
        )
        # skip 1 A (pos 0), mod at second A (pos 1).
        assert values[1] == 99 and values[0] == 0

import numpy as np
import pytest

from deepvariant_tpu.core.cigar import parse_cigar_string
from deepvariant_tpu.core.types import Range, Read, Variant
from deepvariant_tpu.io.bam import ReadBatch
from deepvariant_tpu.io.fasta import InMemoryFasta
from deepvariant_tpu.make_examples.examples_builder import (
    ExamplesBuilder,
    alt_allele_combinations,
    encoded_variant_type,
)
from deepvariant_tpu.make_examples.pileup import (
    CH_BASE_DIFFERS_FROM_REF,
    CH_BASE_QUALITY,
    CH_INSERT_SIZE,
    CH_MAPPING_QUALITY,
    CH_READ_BASE,
    CH_READ_SUPPORTS_VARIANT,
    CH_STRAND,
    DEFAULT_CHANNELS,
    PileupEncoder,
    PileupOptions,
)
from deepvariant_tpu.make_examples.variant_caller import DeepVariantCall

CHROM = "chr1"


def small_options(width=11, height=9):
    return PileupOptions(width=width, height=height, channels=tuple(
        DEFAULT_CHANNELS + [CH_INSERT_SIZE]))


def make_read(start, bases, cigar, name="r", qual=30, mapq=60, reverse=False,
              tlen=0):
    return Read(
        fragment_name=name,
        aligned_sequence=bases,
        aligned_quality=bytes([qual] * len(bases)),
        reference_name=CHROM,
        position=start,
        mapping_quality=mapq,
        cigar=parse_cigar_string(cigar),
        reverse_strand=reverse,
        fragment_length=tlen,
    )


REF = "ACGTACGTACGTACGTACGT"


def simple_call(start=5, ref="C", alts=("T",), support=None):
    v = Variant(
        reference_name=CHROM, start=start, end=start + len(ref),
        reference_bases=ref, alternate_bases=list(alts),
    )
    return DeepVariantCall(variant=v, allele_support=support or {})


def test_reference_rows():
    opts = small_options()
    enc = PileupEncoder(opts)
    ref_window = np.frombuffer(b"ACGTN*ACGTA", np.uint8)
    row = enc.encode_reference_row(ref_window)
    # read_base: A=250 C=30 G=180 T=100, N/*=0 (read_base_channel.cc:54-71)
    np.testing.assert_array_equal(
        row[:, 0], [250, 30, 180, 100, 0, 0, 250, 30, 180, 100, 250]
    )
    assert np.all(row[:, 1] == 254)  # base quality 60 capped at 40 -> 254
    assert np.all(row[:, 2] == 254)  # mapping quality ref row
    assert np.all(row[:, 3] == 70)  # positive strand
    assert np.all(row[:, 4] == 152)  # 0.6 * 254
    assert np.all(row[:, 5] == 50)  # match alpha 0.2
    assert np.all(row[:, 6] == 254)  # insert size ref row


def test_read_row_values():
    opts = small_options()
    enc = PileupEncoder(opts)
    # Variant at position 5 (image center for width 11 -> start_pos 0).
    call = simple_call(support={"T": [0]})
    ref_window = np.frombuffer(REF[:11].encode(), np.uint8)
    seq = REF[0:5] + "T" + REF[6:11]
    batch = ReadBatch.from_reads(
        [make_read(0, seq, "11M", qual=20, mapq=30, tlen=500)], [CHROM]
    )
    row = enc.encode_read_row(batch, 0, ref_window, 0, 5, support_code=1)
    assert row is not None
    # base colors: T at col 5, matches elsewhere
    assert row[5, 0] == 100
    assert row[0, 0] == 250
    # base quality: 254*20/40 = 127
    assert np.all(row[:, 1] == 127)
    # mapping quality: 254*30/60 = 127
    assert np.all(row[:, 2] == 127)
    assert np.all(row[:, 3] == 70)
    assert np.all(row[:, 4] == 254)  # supports alt in image
    assert row[5, 5] == 254  # mismatch
    assert row[4, 5] == 50
    # insert size 254*500/1000 = 127
    assert np.all(row[:, 6] == 127)


def test_read_row_reverse_strand_and_nonsupport():
    opts = small_options()
    enc = PileupEncoder(opts)
    ref_window = np.frombuffer(REF[:11].encode(), np.uint8)
    batch = ReadBatch.from_reads(
        [make_read(0, REF[:11], "11M", reverse=True)], [CHROM]
    )
    row = enc.encode_read_row(batch, 0, ref_window, 0, 5, support_code=0)
    assert np.all(row[:, 3] == 240)
    assert np.all(row[:, 4] == 152)


@pytest.mark.parametrize("hp,expected,polish_tag", [
    # HPValueColor table (pileup_image_test.py:202-240;
    # haplotype_tag_channel.cc): 0 -> 0, 1 -> 127, 2 -> 254, and the
    # 1<->2 swap under hp_tag_for_assembly_polishing=2.
    (0, 0, 0),
    (1, 127, 0),
    (2, 254, 0),
    (0, 0, 2),
    (1, 254, 2),
    (2, 127, 2),
])
def test_hp_channel_color_table(hp, expected, polish_tag):
    import dataclasses

    opts = dataclasses.replace(
        small_options(), hp_tag_for_assembly_polishing=polish_tag,
    )
    enc = PileupEncoder(opts)
    assert enc._hp_channel_value(hp) == expected


def test_read_dropped_low_mapq():
    opts = small_options()
    enc = PileupEncoder(opts)
    ref_window = np.frombuffer(REF[:11].encode(), np.uint8)
    batch = ReadBatch.from_reads([make_read(0, REF[:11], "11M", mapq=5)],
                                 [CHROM])
    assert enc.encode_read_row(batch, 0, ref_window, 0, 5, 0) is None


def test_read_dropped_low_qual_at_call_site():
    opts = small_options()
    enc = PileupEncoder(opts)
    ref_window = np.frombuffer(REF[:11].encode(), np.uint8)
    batch = ReadBatch.from_reads([make_read(0, REF[:11], "11M", qual=5)],
                                 [CHROM])
    # Low qual everywhere incl. call site -> dropped.
    assert enc.encode_read_row(batch, 0, ref_window, 0, 5, 0) is None
    # But fine if variant start is outside the read.
    assert enc.encode_read_row(batch, 0, ref_window, 0, 50, 0) is not None


def test_insertion_anchor_overwrite():
    opts = small_options()
    enc = PileupEncoder(opts)
    ref_window = np.frombuffer(REF[:11].encode(), np.uint8)
    # 5M2I4M: insertion anchor at ref position 4 overwrites the match.
    seq = REF[0:5] + "GG" + REF[5:9]
    batch = ReadBatch.from_reads([make_read(0, seq, "5M2I4M")], [CHROM])
    row = enc.encode_read_row(batch, 0, ref_window, 0, 20, 0)
    assert row[4, 0] == 0  # '*' has base color 0
    assert row[4, 5] == 254  # '*' differs from ref
    assert row[3, 0] == 100  # T at col 3 intact
    assert row[5, 0] == 30  # C at col 5 (read continues aligned)
    assert row[9, 0] == 0 and row[10, 0] == 0  # read ends at col 8


def test_deletion_anchor_overwrite():
    opts = small_options()
    enc = PileupEncoder(opts)
    ref_window = np.frombuffer(REF[:11].encode(), np.uint8)
    # 5M2D4M: deletion of cols 5,6; anchor overwrite at col 4.
    seq = REF[0:5] + REF[7:11]
    batch = ReadBatch.from_reads([make_read(0, seq, "5M2D4M")], [CHROM])
    row = enc.encode_read_row(batch, 0, ref_window, 0, 20, 0)
    assert row[4, 0] == 0  # '*'
    assert row[4, 5] == 254
    assert row[5, 0] == 0 and row[6, 0] == 0  # deleted cols not drawn
    assert row[7, 0] == 100  # T at col 7


def test_build_pileup_layout_and_sorting():
    opts = small_options(width=11, height=9)  # 5 ref rows + 4 read rows
    enc = PileupEncoder(opts)
    call = simple_call(support={"T": [1, 2]})
    ref_window = np.frombuffer(REF[:11].encode(), np.uint8)
    seq_alt = REF[0:5] + "T" + REF[6:11]
    reads = [
        make_read(2, REF[2:11], "9M", name="late"),
        make_read(0, seq_alt, "11M", name="alt_b"),
        make_read(0, seq_alt, "11M", name="alt_a"),
    ]
    batch = ReadBatch.from_reads(reads, [CHROM])
    img = enc.build_pileup(call, ref_window, batch, [0, 1, 2], ["T"])
    assert img.shape == (9, 11, 7)
    # 5 ref rows identical.
    for i in range(1, 5):
        np.testing.assert_array_equal(img[i], img[0])
    # Reads sorted by (pos, name): alt_a, alt_b (pos 0), late (pos 2).
    assert img[5, 0, 0] == 250  # starts at col 0
    assert img[6, 0, 0] == 250
    assert img[7, 0, 0] == 0 and img[7, 2, 0] == 180  # starts at col 2
    # Row 8 empty.
    assert np.all(img[8] == 0)
    # Support channel: alt reads 254, ref-supporting read 152.
    assert img[5, 5, 4] == 254 and img[6, 5, 4] == 254
    assert img[7, 5, 4] == 152


def test_build_pileup_downsamples():
    opts = small_options(width=11, height=9)
    enc = PileupEncoder(opts)
    call = simple_call()
    ref_window = np.frombuffer(REF[:11].encode(), np.uint8)
    reads = [make_read(0, REF[:11], "11M", name=f"r{i}") for i in range(20)]
    batch = ReadBatch.from_reads(reads, [CHROM])
    img = enc.build_pileup(call, ref_window, batch, list(range(20)), ["T"])
    # Only 4 read rows fit; all filled.
    assert np.all(img[5:9, 0, 0] == 250)


def test_alt_allele_combinations():
    v = Variant(reference_bases="A", alternate_bases=["C"])
    assert alt_allele_combinations(v) == [["C"]]
    v2 = Variant(reference_bases="A", alternate_bases=["C", "G"])
    assert alt_allele_combinations(v2) == [["C"], ["G"], ["C", "G"]]
    assert alt_allele_combinations(v2, "no_het_alt") == [["C"], ["G"]]


def test_encoded_variant_type():
    assert encoded_variant_type(
        Variant(reference_bases="A", alternate_bases=["C"])
    ) == 1
    assert encoded_variant_type(
        Variant(reference_bases="AC", alternate_bases=["A"])
    ) == 2
    assert encoded_variant_type(
        Variant(reference_bases="A", alternate_bases=["AC"])
    ) == 2
    assert encoded_variant_type(
        Variant(reference_bases="A", alternate_bases=["."])
    ) == 1


def test_examples_builder_end_to_end():
    fa = InMemoryFasta({CHROM: REF})
    builder = ExamplesBuilder(fa, small_options(width=11, height=9))
    call = simple_call(support={"T": [0]})
    seq_alt = REF[0:5] + "T" + REF[6:11]
    batch = ReadBatch.from_reads(
        [make_read(0, seq_alt, "11M", name="a")], [CHROM]
    )
    built = list(builder.build_examples_for_candidate(call, batch))
    assert len(built) == 1
    from deepvariant_tpu.io import examples as exio

    ex = exio.parse_example(built[0].encoded)
    assert ex.shape == (9, 11, 7)
    assert ex.locus == "chr1:6-6"
    assert ex.alt_allele_indices == [0]
    assert ex.variant.reference_bases == "C"
    np.testing.assert_array_equal(ex.image, built[0].image)


def test_reference_window_n_padding():
    fa = InMemoryFasta({CHROM: REF})
    builder = ExamplesBuilder(fa, small_options(width=11, height=9))
    v = Variant(reference_name=CHROM, start=1, end=2, reference_bases="C",
                alternate_bases=["T"])
    win = builder.reference_window(v)
    assert win.tobytes().decode() == "NNNN" + REF[:7]

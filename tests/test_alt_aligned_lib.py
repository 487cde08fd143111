"""Alt-aligned pileup trim/realign semantics.

Ported corpus: deepvariant/alt_aligned_pileup_lib_test.cc — TrimCigar
(6 cases), TrimRead (5), RealignReadsToHaplotype (4),
CalculateAlignmentRegion (5), TrimReads (5). The reference sequence
and every read/cigar/quality literal follow the C++ test fixtures.
"""

import pytest

from deepvariant_tpu.core.types import CHAR_TO_PROTO_OP, Read, Variant
from deepvariant_tpu.core.ranges import Range
from deepvariant_tpu.make_examples.alt_aligned import (
    calculate_alignment_region,
    realign_reads_to_haplotype,
    trim_cigar,
    trim_read,
    trim_reads,
)

CHR1_SEQ = "TTTTTTTTTTACGTACGTAAAAAAGTGTGATCCCCCCCCCCCC"  # 43 bases


def cig(elements):
    out = []
    for el in elements:
        out.append((CHAR_TO_PROTO_OP[el[-1]], int(el[:-1])))
    return out


def make_read(ref_start, bases, cigar, name="test_read", quals=None):
    if quals is None:
        quals = [60] * len(bases)
    return Read(
        fragment_name=name,
        aligned_sequence=bases,
        aligned_quality=bytes(quals),
        reference_name="chr1",
        position=ref_start,
        mapping_quality=90,
        cigar=cig(cigar),
    )


@pytest.mark.parametrize(
    "ref_start,ref_length,input_cigar,expected_cigar,"
    "exp_read_start,exp_read_length",
    [
        # Trim cigar with INS.
        (10, 20, ["20M", "5I", "10M"], ["10M", "5I", "10M"], 10, 25),
        # Trim cigar with DEL.
        (10, 20, ["20M", "5D", "10M"], ["10M", "5D", "5M"], 10, 15),
        # ref_start falls into the INS.
        (22, 10, ["20M", "5I", "20M"], ["10M"], 27, 10),
        # ref_start falls into the DEL.
        (22, 10, ["20M", "5D", "20M"], ["3D", "7M"], 20, 7),
        # ref_start beyond the end of the read.
        (50, 20, ["20M", "5I", "10M"], [], 35, 0),
        # ref_length beyond the read's end.
        (10, 40, ["20M", "5I", "10M"], ["10M", "5I", "10M"], 10, 25),
    ],
)
def test_trim_cigar(ref_start, ref_length, input_cigar, expected_cigar,
                    exp_read_start, exp_read_length):
    new_cigar, read_start, read_length = trim_cigar(
        cig(input_cigar), ref_start, ref_length
    )
    assert new_cigar == cig(expected_cigar)
    assert read_start == exp_read_start
    assert read_length == exp_read_length


@pytest.mark.parametrize(
    "read_ref_start,trim_start,trim_length,bases,cigar,quals,"
    "exp_start,exp_bases,exp_cigar,exp_quals",
    [
        (10, 15, 5, "ACGTACGTAAAAAAGTGTGATC", ["22M"],
         list(range(1, 23)),
         15, "CGTAA", ["5M"], [6, 7, 8, 9, 10]),
        (10, 15, 5, "ACGTACGTAAAAAAGTGTGATC", ["2M", "3I", "17M"],
         list(range(1, 23)),
         15, "AAAAA", ["5M"], [9, 10, 11, 12, 13]),
        (10, 15, 5, "ACGTACGTAAAAAAGTGTGATC", ["2M", "3D", "20M"],
         list(range(1, 23)),
         15, "GTACG", ["5M"], [3, 4, 5, 6, 7]),
        (10, 8, 5, "ACGTACGTAAAAAAGTGTGATC", ["22M"],
         list(range(1, 23)),
         10, "ACG", ["3M"], [1, 2, 3]),
        (10, 10, 22, "ACGTACGTAAAAAAGTGTGATC", ["22M"],
         list(range(1, 23)),
         10, "ACGTACGTAAAAAAGTGTGATC", ["22M"], list(range(1, 23))),
    ],
)
def test_trim_read(read_ref_start, trim_start, trim_length, bases, cigar,
                   quals, exp_start, exp_bases, exp_cigar, exp_quals):
    read = make_read(read_ref_start, bases, cigar, quals=quals)
    region = Range("chr1", trim_start, trim_start + trim_length)
    trimmed = trim_read(read, region)
    assert trimmed.position == exp_start
    assert trimmed.aligned_sequence == exp_bases
    assert trimmed.cigar == cig(exp_cigar)
    assert list(trimmed.aligned_quality) == exp_quals


def _ref_query(rng: Range) -> str:
    assert rng.reference_name == "chr1"
    return CHR1_SEQ[rng.start:rng.end]


REALIGN_CASES = [
    # Haplotype has INS, read_1 matches haplotype.
    (
        "ACGTACGTGGGAAAAAAGTGTGATC",
        [
            (20, "ACGTACGTGGGAAAAAAGTGTGATC", ["8M", "3I", "14M"],
             "read_1"),
            (20, "ACGTACGTAAAAAAGTGTGATC", ["22M"], "read_2"),
        ],
        20, 42,
        [
            (20, "ACGTACGTGGGAAAAAAGTGTGATC", ["25M"], "read_1"),
            (20, "ACGTACGTAAAAAAGTGTGATC", ["8M", "3D", "14M"],
             "read_2"),
        ],
    ),
    # Read starts inside haplotype.
    (
        "ACGTACGTGGGAAAAAAGTGTGATC",
        [
            (26, "GTGGGAAAAAAGTGTGA", ["2M", "3I", "12M"], "read_1"),
            (20, "ACGTACGTAAAAAAGTGTGATC", ["22M"], "read_2"),
        ],
        20, 42,
        [
            (26, "GTGGGAAAAAAGTGTGA", ["17M"], "read_1"),
            (20, "ACGTACGTAAAAAAGTGTGATC", ["8M", "3D", "14M"],
             "read_2"),
        ],
    ),
    # Read ends inside haplotype: local alignment cannot resolve the
    # GGG deletion; it becomes a soft clip at the front instead.
    (
        "ACGTACGTGGGAAAAAAGTGTGATC",
        [
            (1, "TTTTTTTTTACGTACGTAAAAAA", ["23M"], "read_1"),
            (20, "ACGTACGTAAAAAAGTGTGATC", ["22M"], "read_2"),
        ],
        20, 42,
        [
            (20, "TTTTTTTTTACGTACGTAAAAAA", ["9S", "8M", "3D", "6M"],
             "read_1"),
            (20, "ACGTACGTAAAAAAGTGTGATC", ["8M", "3D", "14M"],
             "read_2"),
        ],
    ),
    # Haplotype goes to the end of the contig.
    (
        "ACGTACGTGGGAAAAAAGTGTGATCCCCCCCCCCCC",
        [
            (10, "ACGTACGTGGGAAAAAAGTGTGATC", ["8M", "3I", "14M"],
             "read_1"),
            (10, "ACGTACGTAAAAAAGTGTGATC", ["22M"], "read_2"),
        ],
        10, 43,
        [
            (10, "ACGTACGTGGGAAAAAAGTGTGATC", ["25M"], "read_1"),
            (10, "ACGTACGTAAAAAAGTGTGATC", ["8M", "3D", "14M"],
             "read_2"),
        ],
    ),
]


@pytest.mark.parametrize("haplotype,reads,ref_start,ref_end,expected",
                         REALIGN_CASES)
def test_realign_reads_to_haplotype(haplotype, reads, ref_start, ref_end,
                                    expected):
    input_reads = [make_read(*r[:3], name=r[3]) for r in reads]
    realigned = realign_reads_to_haplotype(
        haplotype, input_reads, "chr1", ref_start, ref_end,
        _ref_query, len(CHR1_SEQ),
    )
    assert len(realigned) == len(expected)
    for got, exp in zip(realigned, expected):
        exp_start, exp_bases, exp_cigar, exp_name = exp
        assert got.fragment_name == exp_name
        assert got.position == exp_start, exp_name
        assert got.aligned_sequence == exp_bases
        assert got.cigar == cig(exp_cigar), exp_name


@pytest.mark.parametrize(
    "variant_start,half_width,exp_start,exp_end",
    [
        (11, 10, 1, 22),
        (5, 10, 0, 16),
        (40, 10, 30, 43),
        (20, 100, 0, 43),
        (40, 20, 20, 43),
    ],
)
def test_calculate_alignment_region(variant_start, half_width,
                                    exp_start, exp_end):
    variant = Variant(
        reference_name="chr1", start=variant_start,
        reference_bases="A", alternate_bases=["C"],
    )
    region = calculate_alignment_region(
        variant, half_width, len(CHR1_SEQ)
    )
    assert region.reference_name == "chr1"
    assert region.start == exp_start
    assert region.end == exp_end


TRIM_READS_CASES = [
    # Reads fit into the region.
    (
        [(1, "TTTTTTTTTACGTACGTAAA", ["20M"]),
         (1, "CCCCCAAAAAAGTGTGATCC", ["20M"])],
        [(1, "TTTTTTTTTACGTACGTAAA", ["20M"]),
         (1, "CCCCCAAAAAAGTGTGATCC", ["20M"])],
        [1, 1], 15, (1, 22),
    ),
    # One read fits, one read is trimmed.
    (
        [(1, "TTTTTTTTTACGTACGTAAA", ["20M"]),
         (1, "CCCCCAAAAAAGTGTGATCCCCCGTA", ["26M"])],
        [(1, "TTTTTTTTTACGTACGTAAA", ["20M"]),
         (1, "CCCCCAAAAAAGTGTGATCCC", ["21M"])],
        [1, 1], 15, (1, 22),
    ),
    # Shorter than min_overlap => dropped.
    (
        [(1, "TTTTTTTTTACGTACGTAAA", ["20M"]),
         (10, "CCCCCAAAAAAGTGTGATCCCCCGTA", ["26M"])],
        [(1, "TTTTTTTTTACGTACGTAAA", ["20M"])],
        [1], 15, (1, 22),
    ),
    # alignment_positions are correct after trimming.
    (
        [(1, "TTTTTTTTTACGTACGTAAA", ["20M"]),
         (2, "CCCCCAAAAAAGTGTGATCCCCCGTA", ["26M"])],
        [(5, "TTTTTACGTACGTAAA", ["16M"]),
         (5, "CCAAAAAAGTGTGATCC", ["17M"])],
        [1, 2], 15, (5, 22),
    ),
    # Read dropped when the trim region overlaps a large deletion.
    (
        [(1, "TTTTTTTTTACGTACGTAAA", ["20M"]),
         (1, "CCCCCAAAAAAGTGTGATCCCCCGTA", ["3M", "20D", "23M"])],
        [(5, "TTTTTACGTACGTAAA", ["16M"])],
        [1], 15, (5, 22),
    ),
]


@pytest.mark.parametrize(
    "input_reads,expected,exp_positions,min_overlap,region_span",
    TRIM_READS_CASES,
)
def test_trim_reads(input_reads, expected, exp_positions, min_overlap,
                    region_span):
    reads = [make_read(*r) for r in input_reads]
    region = Range("chr1", *region_span)
    trimmed, indices = trim_reads(reads, region, min_overlap)
    assert len(trimmed) == len(expected)
    for got, exp in zip(trimmed, expected):
        assert got.position == exp[0]
        assert got.aligned_sequence == exp[1]
        assert got.cigar == cig(exp[2])
    # The reference reports the ORIGINAL alignment position of every
    # kept read; we report original indices — same information.
    assert [reads[i].position for i in indices] == exp_positions

"""Port of allelecounter_test.cc's CIGAR-walk corpus (1582 LoC) onto
our vectorized AlleleCounter: per-position allele expectations on the
nucleus test.fasta chr1 fixture (interval chr1:10-15, seq TCCGT,
min_base_quality 21), covering matches, substitutions, insertions,
deletions, soft clips, contig edges, base/mapping quality gates, and
paired reads (allelecounter_test.cc:258-1033)."""

import numpy as np
import pytest

from deepvariant_tpu.core.cigar import parse_cigar_string
from deepvariant_tpu.core.types import Range, Read
from deepvariant_tpu.io.bam import ReadBatch
from deepvariant_tpu.make_examples.allele_counter import (
    AlleleCounter,
    AlleleCounterOptions,
    DELETION,
    INSERTION,
    REFERENCE,
    SOFT_CLIP,
    SUBSTITUTION,
)

CHROM = "chr1"
# nucleus testdata/test.fasta chr1 (76 bp); chr1[10:15] == "TCCGT".
CHR1 = (
    "ACCACCATCCTCCGTGAAATCAATATCCCGCACAAGAGTGCTACTCTCCT"
    "CGCTCTGTCCGGGGGGATGA"
)
assert CHR1[10:15] == "TCCGT"
START, END = 10, 15
MIN_BASE_QUALITY = 21

_counter = [0]


def make_read(start, bases, cigar, quals=None, mapq=90):
    _counter[0] += 1
    if quals is None:
        quals = [30] * len(bases)
    return Read(
        fragment_name=f"read_{_counter[0]}",
        aligned_sequence=bases,
        aligned_quality=bytes(quals),
        reference_name=CHROM,
        position=start,
        mapping_quality=mapq,
        cigar=parse_cigar_string(cigar),
    )


def make_counter(start=START, end=END, **opts):
    ref = np.frombuffer(CHR1.encode(), np.uint8)[start:end]
    opts.setdefault("min_base_quality", MIN_BASE_QUALITY)
    return AlleleCounter(
        ref, Range(CHROM, start, end), AlleleCounterOptions(**opts),
        ref_prev_base=CHR1[start - 1] if start > 0 else "N",
        ref_bases_after=np.frombuffer(CHR1.encode(), np.uint8)[end:],
    )


def add_and_check(reads, expected, counter=None):
    """AddAndCheckReads analog: `expected` is one list per interval
    position of (bases, type, count); REFERENCE entries assert the
    ref-supporting count, others the summed non-ref alleles."""
    if isinstance(reads, Read):
        reads = [reads]
    ac = counter or make_counter()
    ac.add_batch(ReadBatch.from_reads(reads, [CHROM]))
    assert ac.n_reads_counted == len(reads)
    for i, exp in enumerate(expected):
        want_ref = sum(c for _, t, c in exp if t == REFERENCE)
        assert int(ac.ref_count[i]) == want_ref, f"ref count at {i}"
        want_alt = sorted(
            (b, t, c) for b, t, c in exp if t != REFERENCE
        )
        got_alt = sorted(
            (a.bases, a.type, a.count)
            for a in ac.sum_allele_counts(i)
        )
        assert got_alt == want_alt, f"alleles at {i}"
        total = sum(c for _, _, c in exp)
        assert ac.total_allele_count(i) == total, f"total at {i}"
    return ac


ALL_REF = [[(b, REFERENCE, 1)] for b in "TCCGT"]


@pytest.mark.parametrize("op", ["M", "X", "="])
def test_add_simple_read(op):
    add_and_check(make_read(START, "TCCGT", f"5{op}"), ALL_REF)


def test_read_spanning_beyond_interval():
    add_and_check(make_read(START - 2, "AATCCGTAA", "9M"), ALL_REF)


def test_add_read_every_subspan():
    """TestAddRead: every (start, end) subread of the interval counts
    reference bases exactly on its covered positions."""
    seq = "TCCGT"
    for s in range(len(seq)):
        for e in range(len(seq), s, -1):
            expected = [
                [(seq[i], REFERENCE, 1)] if s <= i < e else []
                for i in range(len(seq))
            ]
            add_and_check(
                make_read(START + s, seq[s:e], f"{e - s}M"), expected
            )


@pytest.mark.parametrize("subi", range(5))
def test_add_substitution_read(subi):
    bases = list("TCCGT")
    bases[subi] = "A"
    expected = [
        [(b, SUBSTITUTION if i == subi else REFERENCE, 1)]
        for i, b in enumerate(bases)
    ]
    add_and_check(make_read(START, "".join(bases), "5M"), expected)


def test_simple_insertion1():
    add_and_check(
        make_read(START, "TCAAACGT", "2M3I3M"),
        [[("T", REFERENCE, 1)], [("CAAA", INSERTION, 1)],
         [("C", REFERENCE, 1)], [("G", REFERENCE, 1)],
         [("T", REFERENCE, 1)]],
    )


def test_simple_insertion2():
    add_and_check(
        make_read(START, "TAAACCGT", "1M3I4M"),
        [[("TAAA", INSERTION, 1)], [("C", REFERENCE, 1)],
         [("C", REFERENCE, 1)], [("G", REFERENCE, 1)],
         [("T", REFERENCE, 1)]],
    )


def test_simple_insertion3():
    add_and_check(
        make_read(START, "TCCGTAAA", "5M3I"),
        [[("T", REFERENCE, 1)], [("C", REFERENCE, 1)],
         [("C", REFERENCE, 1)], [("G", REFERENCE, 1)],
         [("TAAA", INSERTION, 1)]],
    )


@pytest.mark.parametrize("size", range(1, 10))
def test_diff_insertion_sizes(size):
    ins = "A" * size
    add_and_check(
        make_read(START, f"TC{ins}CGT", f"2M{size}I3M"),
        [[("T", REFERENCE, 1)], [("C" + ins, INSERTION, 1)],
         [("C", REFERENCE, 1)], [("G", REFERENCE, 1)],
         [("T", REFERENCE, 1)]],
    )


def test_start_insertion_dropped_at_interval_start():
    add_and_check(make_read(START, "AAATCCGT", "3I5M"), ALL_REF)


def test_start_insertion_kept_within_interval():
    add_and_check(
        make_read(START + 1, "AAACCGT", "3I4M"),
        [[("TAAA", INSERTION, 1)], [("C", REFERENCE, 1)],
         [("C", REFERENCE, 1)], [("G", REFERENCE, 1)],
         [("T", REFERENCE, 1)]],
    )


@pytest.mark.parametrize("cigar,seq,expected", [
    ("2M1D2M", "TCGT",
     [[("T", REFERENCE, 1)], [("CC", DELETION, 1)], [],
      [("G", REFERENCE, 1)], [("T", REFERENCE, 1)]]),
    ("1M1D3M", "TCGT",
     [[("TC", DELETION, 1)], [], [("C", REFERENCE, 1)],
      [("G", REFERENCE, 1)], [("T", REFERENCE, 1)]]),
    ("3M1D1M", "TCCT",
     [[("T", REFERENCE, 1)], [("C", REFERENCE, 1)],
      [("CG", DELETION, 1)], [], [("T", REFERENCE, 1)]]),
    ("1M2D2M", "TGT",
     [[("TCC", DELETION, 1)], [], [], [("G", REFERENCE, 1)],
      [("T", REFERENCE, 1)]]),
    ("1M3D1M", "TT",
     [[("TCCG", DELETION, 1)], [], [], [], [("T", REFERENCE, 1)]]),
    ("1M4D", "T",
     [[("TCCGT", DELETION, 1)], [], [], [], []]),
])
def test_simple_deletions(cigar, seq, expected):
    add_and_check(make_read(START, seq, cigar), expected)


def test_starting_deletions():
    # At the interval start the deletion's anchor is off-interval:
    # coverage over the deleted base is lost along with the event.
    add_and_check(
        make_read(START, "CCGT", "1D4M"),
        [[], [("C", REFERENCE, 1)], [("C", REFERENCE, 1)],
         [("G", REFERENCE, 1)], [("T", REFERENCE, 1)]],
    )
    # One base in, the event is recorded.
    add_and_check(
        make_read(START + 1, "CGT", "1D3M"),
        [[("TC", DELETION, 1)], [], [("C", REFERENCE, 1)],
         [("G", REFERENCE, 1)], [("T", REFERENCE, 1)]],
    )


def test_deletion_spanning_to_end_of_interval():
    add_and_check(
        make_read(START, "TCCG", "4M1D"),
        [[("T", REFERENCE, 1)], [("C", REFERENCE, 1)],
         [("C", REFERENCE, 1)], [("GT", DELETION, 1)], []],
    )


def test_deletion_spanning_off_interval():
    # Deleted bases beyond the interval come from the full reference
    # (allelecounter.cc RefBases); chr1[15:17] == "GA".
    add_and_check(
        make_read(START, "TCCG", "4M3D"),
        [[("T", REFERENCE, 1)], [("C", REFERENCE, 1)],
         [("C", REFERENCE, 1)], [("GTGA", DELETION, 1)], []],
    )


def test_multiple_reads():
    add_and_check(
        [
            make_read(START, "TCCGT", "5M"),
            make_read(START, "TCGT", "2M1D2M"),
            make_read(START + 2, "CGT", "3M"),
            make_read(START, "TCCAGT", "3M1I2M"),
            make_read(START + 2, "CG", "2M"),
        ],
        [
            [("T", REFERENCE, 3)],
            [("C", REFERENCE, 2), ("CC", DELETION, 1)],
            [("C", REFERENCE, 3), ("CA", INSERTION, 1)],
            [("G", REFERENCE, 5)],
            [("T", REFERENCE, 4)],
        ],
    )


def test_soft_clips():
    add_and_check(
        make_read(START + 2, "AACGT", "2S3M"),
        [[], [("CAA", SOFT_CLIP, 1)], [("C", REFERENCE, 1)],
         [("G", REFERENCE, 1)], [("T", REFERENCE, 1)]],
    )
    add_and_check(
        make_read(START + 1, "ACCGT", "1S4M"),
        [[("TA", SOFT_CLIP, 1)], [("C", REFERENCE, 1)],
         [("C", REFERENCE, 1)], [("G", REFERENCE, 1)],
         [("T", REFERENCE, 1)]],
    )
    # Clip at the interval start is dropped.
    add_and_check(make_read(START, "AATCCGT", "2S5M"), ALL_REF)
    add_and_check(
        make_read(START, "TCCGTAA", "5M2S"),
        [[("T", REFERENCE, 1)], [("C", REFERENCE, 1)],
         [("C", REFERENCE, 1)], [("G", REFERENCE, 1)],
         [("TAA", SOFT_CLIP, 1)]],
    )


@pytest.mark.parametrize("op,atype", [("2S", SOFT_CLIP), ("2I", INSERTION)])
def test_insertion_at_chr_start(op, atype):
    # A leading INS/CLIP at position 0 has no anchor: dropped.
    add_and_check(
        make_read(0, "AAAC", f"{op}2M"),
        [[("A", REFERENCE, 1)], [("C", REFERENCE, 1)]],
        counter=make_counter(0, 2),
    )


@pytest.mark.parametrize("op,atype", [("2S", SOFT_CLIP), ("2I", INSERTION)])
def test_at_chr_end(op, atype):
    chr_end = len(CHR1)
    chr_start = chr_end - 2
    add_and_check(
        make_read(chr_start, "GAAA", f"2M{op}"),
        [[("G", REFERENCE, 1)], [("AAA", atype, 1)]],
        counter=make_counter(chr_start, chr_end),
    )


def test_at_chr_end_deletion_off_contig():
    chr_end = len(CHR1)
    chr_start = chr_end - 2
    # Deletion running off the chromosome: allele dropped, coverage ok.
    add_and_check(
        make_read(chr_start, "GA", "2M2D"),
        [[("G", REFERENCE, 1)], [("A", REFERENCE, 1)]],
        counter=make_counter(chr_start, chr_end),
    )


def test_at_chr_end_matches_off_contig():
    chr_end = len(CHR1)
    chr_start = chr_end - 2
    add_and_check(
        make_read(chr_start, "GAAAAAAA", "8M"),
        [[("G", REFERENCE, 1)], [("A", REFERENCE, 1)]],
        counter=make_counter(chr_start, chr_end),
    )


def test_deletion_at_chr_start():
    add_and_check(
        make_read(0, "CA", "2D2M"),
        [[], [], [("C", REFERENCE, 1)], [("A", REFERENCE, 1)]],
        counter=make_counter(0, 4),
    )


def test_low_mapq_reads_ignored():
    ac = make_counter(0, 4, min_mapping_quality=10)
    ac.add_batch(ReadBatch.from_reads(
        [make_read(0, "ACCA", "4M", mapq=0)], [CHROM]
    ))
    for i in range(4):
        assert ac.total_allele_count(i) == 0


@pytest.mark.parametrize("bad_pos", range(5))
def test_min_base_qual_snp(bad_pos):
    quals = [30] * 5
    quals[bad_pos] = MIN_BASE_QUALITY - 1
    expected = [list(e) for e in ALL_REF]
    expected[bad_pos] = []
    add_and_check(make_read(START, "TCCGT", "5M", quals=quals), expected)


@pytest.mark.parametrize("bad_pos", [1, 2, 3])
def test_min_base_qual_insertion(bad_pos):
    # A bad base inside the insertion drops the allele AND the anchor
    # match event it replaced (allelecounter_test.cc:884-905).
    quals = [MIN_BASE_QUALITY + 1] * 5
    quals[bad_pos] = MIN_BASE_QUALITY - 3
    add_and_check(
        make_read(START, "TAAAC", "1M3I1M", quals=quals),
        [[], [("C", REFERENCE, 1)], [], [], []],
    )


def test_min_base_qual_indel_bad_initial_base():
    # allelecounter_test.cc:907-955: four quality configurations of a
    # 2M3I3M read.
    good = [MIN_BASE_QUALITY + 1] * 8
    add_and_check(
        make_read(START, "TCAAACGT", "2M3I3M", quals=list(good)),
        [[("T", REFERENCE, 1)], [("CAAA", INSERTION, 1)],
         [("C", REFERENCE, 1)], [("G", REFERENCE, 1)],
         [("T", REFERENCE, 1)]],
    )
    bad_ins = list(good)
    bad_ins[3] = MIN_BASE_QUALITY - 4
    add_and_check(
        make_read(START, "TCAAACGT", "2M3I3M", quals=bad_ins),
        [[("T", REFERENCE, 1)], [], [("C", REFERENCE, 1)],
         [("G", REFERENCE, 1)], [("T", REFERENCE, 1)]],
    )
    bad_both = list(bad_ins)
    bad_both[1] = MIN_BASE_QUALITY - 1
    add_and_check(
        make_read(START, "TCAAACGT", "2M3I3M", quals=bad_both),
        [[("T", REFERENCE, 1)], [], [("C", REFERENCE, 1)],
         [("G", REFERENCE, 1)], [("T", REFERENCE, 1)]],
    )
    bad_anchor = list(good)
    bad_anchor[1] = MIN_BASE_QUALITY - 1
    add_and_check(
        make_read(START, "TCAAACGT", "2M3I3M", quals=bad_anchor),
        [[("T", REFERENCE, 1)], [("CAAA", INSERTION, 1)],
         [("C", REFERENCE, 1)], [("G", REFERENCE, 1)],
         [("T", REFERENCE, 1)]],
    )


def test_snp_then_indel():
    add_and_check(
        make_read(START, "TAAAACGT", "2M3I3M"),
        [[("T", REFERENCE, 1)], [("AAAA", INSERTION, 1)],
         [("C", REFERENCE, 1)], [("G", REFERENCE, 1)],
         [("T", REFERENCE, 1)]],
    )


def test_paired_reads():
    r1 = make_read(START, "TCCAT", "5M")
    r2 = make_read(START, "TCAAT", "5M")
    add_and_check(
        [r1, r2],
        [
            [("T", REFERENCE, 2)],
            [("C", REFERENCE, 2)],
            [("C", REFERENCE, 1), ("A", SUBSTITUTION, 1)],
            [("A", SUBSTITUTION, 2)],
            [("T", REFERENCE, 2)],
        ],
    )


def test_canonical_bases():
    # An N base never generates an event, matching or not.
    add_and_check(
        make_read(START, "TCNGT", "5M"),
        [[("T", REFERENCE, 1)], [("C", REFERENCE, 1)], [],
         [("G", REFERENCE, 1)], [("T", REFERENCE, 1)]],
    )

"""Port of the reference's fast_pass_aligner_test.cc numeric corpus
(1249 LoC of pinned scores, cigars, position maps, and merge
semantics) onto our FastPassAligner."""

import pytest

from deepvariant_tpu.realign.config import AlignerOptions
from deepvariant_tpu.realign.fast_pass_aligner import (
    NOT_ALIGNED,
    FastPassAligner,
    HaplotypeReadsAlignment,
    ReadAlignment,
    calculate_read_to_ref_alignment,
    cigar_string_to_ops,
    merge_cigar_op,
    set_positions_map,
    OP_D,
    OP_I,
    OP_M,
    OP_S,
)
from deepvariant_tpu.realign.ssw import SswAligner

REF = ("ATCAAGGGAAAAAGTGCCCAGGGCCAAATATGTTTTGGGTTTTGCAGGACAAAGTATGGTT"
       "GAAACTGAGCTGAAGATATG")


def make_aligner(reads, kmer_size=3, max_mismatches=2, reference=REF,
                 ref_prefix=None, ref_suffix=None):
    opts = AlignerOptions(kmer_size=kmer_size,
                          max_num_of_mismatches=max_mismatches)
    al = FastPassAligner(opts)
    al.set_reference(reference)
    al._reads = list(reads)
    # The coverage-discard rule is exercised only by the tests that set
    # explicit flank lengths (the reference fixture leaves the members
    # unset); everywhere else the flanks span the whole haplotype.
    al.set_ref_prefix_len(10**6 if ref_prefix is None else ref_prefix)
    al.set_ref_suffix_len(10**6 if ref_suffix is None else ref_suffix)
    al._build_index()
    return al


def fast_align(al, haplotype):
    read_alignments = [ReadAlignment() for _ in al._reads]
    score = al._fast_align_reads_to_haplotype(haplotype, read_alignments)
    return score, read_alignments


class TestKmerIndex:
    def test_index_integration(self):
        al = make_aligner(["AAACCC", "CTCTCT", "TGAGCTGAAG"])
        expected = {
            "AAA": [(0, 0)], "AAC": [(0, 1)], "ACC": [(0, 2)],
            "CCC": [(0, 3)],
            "CTC": [(1, 0), (1, 2)], "TCT": [(1, 1), (1, 3)],
            "TGA": [(2, 0), (2, 5)], "GAG": [(2, 1)], "AGC": [(2, 2)],
            "GCT": [(2, 3)], "CTG": [(2, 4)], "GAA": [(2, 6)],
            "AAG": [(2, 7)],
        }
        assert al._kmer_index == expected

    def test_reads_shorter_than_kmer_ignored(self):
        al = make_aligner(["AAC", "TGAGCTG"], kmer_size=4)
        expected = {
            "TGAG": [(1, 0)], "GAGC": [(1, 1)], "AGCT": [(1, 2)],
            "GCTG": [(1, 3)],
        }
        assert al._kmer_index == expected


class TestFastAlignReadsToHaplotype:
    MATCH = 4
    MISMATCH = 6

    def test_two_reads_aligned(self):
        al = make_aligner(["AAACCC", "CTCTCT", "TGAGCTGAAG"])
        score, ras = fast_align(al, "TGAGCTGAAGTTAAACCC")
        assert score == 10 * self.MATCH + 6 * self.MATCH
        assert (ras[0].position, ras[0].cigar, ras[0].score) == \
            (12, "6=", 6 * self.MATCH)
        assert ras[1].position == NOT_ALIGNED
        assert (ras[2].position, ras[2].cigar, ras[2].score) == \
            (0, "10=", 10 * self.MATCH)

    def test_partial_overlap_read_skipped(self):
        al = make_aligner(["TGAGCTGAAGTT", "AAACCC", "AGTTAAAC"])
        score, ras = fast_align(al, "TGAGCTGAAGTTAAAC")
        assert score == 12 * self.MATCH + 8 * self.MATCH
        assert (ras[0].position, ras[0].cigar) == (0, "12=")
        assert ras[1].position == NOT_ALIGNED
        assert (ras[2].position, ras[2].cigar) == (8, "8=")

    def test_one_mismatch(self):
        al = make_aligner(["AAACCC", "CTCTCT", "TGAGCTGAAG"])
        score, ras = fast_align(al, "TGAGCCGAAGTTAAACCC")
        expected_read2 = 9 * self.MATCH - 1 * self.MISMATCH
        assert score == expected_read2 + 6 * self.MATCH
        assert (ras[2].position, ras[2].cigar, ras[2].score) == \
            (0, "10=", expected_read2)

    def test_too_many_mismatches(self):
        al = make_aligner(
            ["TTTGCCGAAGTTAAACCC", "CTCTCT", "TGAGCTGAAG"],
            ref_prefix=0, ref_suffix=0,
        )
        score, ras = fast_align(al, "TTTGCCGAAGTTAAACCC")
        assert score == 18 * self.MATCH
        assert (ras[0].position, ras[0].cigar) == (0, "18=")
        assert ras[1].position == NOT_ALIGNED
        assert ras[2].position == NOT_ALIGNED

    def test_zero_coverage_outside_flanks_ok(self):
        al = make_aligner(
            [
                "ATCAAGGGAAAAAGTGCCCA",
                "GGGCCAAATATGTTTTG",
                "ATATGTTATGGGTTATGCAGGA",
                "GTTTTGGGTTTTGCAGGTCA",
                "AGGACAAAGTATGGTT",
                "CAAAGTATGGTTGTGAGCT",
            ],
            ref_prefix=11, ref_suffix=11,
            reference=REF,
        )
        hap = ("ATCAAGGGAAAAAGTGCCCAGGGCCAAATATGTTTTGGGTTTTGCAGGACAAAG"
               "TATGGTTGAAACTGAGCT")
        score, ras = fast_align(al, hap)
        assert score == 350
        expected = [
            (0, "20=", 80), (20, "17=", 68), (27, "22=", 68),
            (31, "20=", 70), (45, "16=", 64), (NOT_ALIGNED, "", 0),
        ]
        got = [(r.position, r.cigar, r.score) for r in ras]
        assert got == expected

    def test_zero_coverage_inside_keeps_haplotype(self):
        """The reference's CURRENT code discards a haplotype whose scan
        hits an uncovered non-flank position (fast_pass_aligner.cc
        :293-299), but its own golden examples contradict that gate —
        partition-edge assembly windows have uncovered leading
        positions on every haplotype yet still realign reads against
        non-reference haplotypes (see realign/fast_pass_aligner.py).
        The gate is therefore not applied: a haplotype keeps the score
        accumulated from whatever reads do fast-align to it."""
        al = make_aligner(
            [
                "ATCAAGGGAAAAAGTGCCCA",
                "GGGAAACCAAATATGTTTTG",
                "ATATGTTATGGGTTATGCAGGA",
                "GTTTTGGGTTTTGCAGGTCA",
                "AGGACAAAGTATGGTT",
                "CAAAGTATGGTTGTGAGCT",
            ],
            ref_prefix=11, ref_suffix=11,
            reference=REF,
        )
        hap = ("ATCAAGGGAAAAAGTGCCCAGGGCCAAATATGTTTTGGGTTTTGCAGGACAAAG"
               "TATGGTTGAAACTGAGCT")
        score, _ = fast_align(al, hap)
        assert score == 282


class TestSsw:
    def test_sanity(self):
        ssw = SswAligner(4, 6, 8, 2)
        ssw.set_reference_sequence("TTTGCCGAAGTTAAACCC")
        alignment = ssw.align("GCCGAAGTTA")
        assert alignment.cigar_string == "10="
        assert alignment.ref_begin == 3

    def test_align_haplotypes_to_reference(self):
        ref_seq = "AGAAGGTCCCTTTGCCGAAGTTAAACCCTTTCGCGC"
        ssw = SswAligner(4, 6, 8, 2)
        ssw.set_reference_sequence(ref_seq)
        cases = [
            ("GTCCCTTTGCCGAAGTTAAACCCTTT", "26=", 5),
            ("GTCCCTTTGCCGAGTTAAACCCTTT", "12=1D13=", 5),
            ("GTCCCTATGCCGAAGTTAAACCCTTT", "6=1X19=", 5),
        ]
        for hap, cigar, ref_begin in cases:
            a = ssw.align(hap)
            assert a.cigar_string == cigar
            assert a.ref_begin == ref_begin


class TestSetPositionsMap:
    def _map(self, cigar, size):
        ha = HaplotypeReadsAlignment(0, 0, [])
        ha.cigar = cigar
        set_positions_map(size, ha)
        return ha.hap_to_ref_positions_map

    def test_no_structural(self):
        assert self._map("10=1X3=", 24) == [0] * 24

    def test_with_ins(self):
        assert self._map("3=4I2=", 9) == [0, 0, 0, 0, -1, -2, -3, -4, -4]

    def test_with_del(self):
        assert self._map("3=4D2=", 5) == [0, 0, 0, 4, 4]

    def test_del_then_ins(self):
        assert self._map("3=4D2=2I2=", 9) == [0, 0, 0, 4, 4, 4, 3, 2, 2]

    def test_ins_then_del(self):
        assert self._map("3=4I2=2D2=", 11) == \
            [0, 0, 0, 0, -1, -2, -3, -4, -4, -2, -2]


class TestSswFallbackAlignments:
    """SswAlignReadsToHaplotypes pinned outputs (the scalar fallback
    path, which stores per-haplotype score/cigar/position)."""

    def test_pinned_alignments(self, monkeypatch):
        import deepvariant_tpu.io.native as native

        monkeypatch.setattr(native, "has_ssw_batch", lambda: False)
        haplotypes = [
            "AAGTGCCCAGGGCCAAATGTTTTGGGTTTTGCAGGACAAAGTATGGTT",
            "AAGTGCCCAGGGCCAAATATGCACAGGGTTTTGCAGGACAAAGTATGGTT",
        ]
        reads = [
            "CAGGGCCAAATGTTT",
            "GCCATATATGCACAGGGTTATG",
            "TTGGGTTGCAGGACA",
            "ACAGGGTTTTTTGCAGGACAA",
            "TGTTGGGTTCAGCAGTTTT",
        ]
        al = make_aligner(reads, reference=REF)
        al.set_haplotypes(haplotypes)
        # Haplotypes -> hap_alignments skeleton with nonzero hap scores
        # so the fallback tries both.
        al._hap_alignments = [
            HaplotypeReadsAlignment(
                i, 1, [ReadAlignment() for _ in reads]
            )
            for i in range(len(haplotypes))
        ]
        # Run just the SSW fallback with threshold 40 by invoking
        # realign's fallback block via the public path pieces.
        ssws = {}
        for ha in al._hap_alignments:
            # The reference test runs on the aligner's BUILT-IN scoring
            # (gap_extend 1, fast_pass_aligner.h:378), not the
            # production flag default of 2.
            ssw = SswAligner(al.options.match, al.options.mismatch,
                             al.options.gap_open, 1)
            ssw.set_reference_sequence(haplotypes[ha.haplotype_index])
            ssws[ha.haplotype_index] = ssw
        for read_id, read in enumerate(reads):
            for ha in al._hap_alignments:
                alignment = ssws[ha.haplotype_index].align(read)
                if alignment.sw_score > 0 and alignment.sw_score >= 40:
                    ra = ha.read_alignments[read_id]
                    ra.score = alignment.sw_score
                    ra.cigar = alignment.cigar_string
                    ra.position = alignment.ref_begin
        expected_h1 = [
            (7, "15=", 60), (NOT_ALIGNED, "", 0), (21, "5=2D10=", 51),
            (23, "3S3=2I13=", 55), (NOT_ALIGNED, "", 0),
        ]
        expected_h2 = [
            (7, "11=4S", 44), (11, "4=1X14=1X2=", 68),
            (25, "2S3=2D10=", 43), (22, "6=2I13=", 67),
            (NOT_ALIGNED, "", 0),
        ]
        got_h1 = [(r.position, r.cigar, r.score)
                  for r in al._hap_alignments[0].read_alignments]
        got_h2 = [(r.position, r.cigar, r.score)
                  for r in al._hap_alignments[1].read_alignments]
        assert got_h1 == expected_h1
        assert got_h2 == expected_h2


def _hap_to_ref_ops(reference, haplotype):
    ssw = SswAligner(4, 6, 8, 2)
    ssw.set_reference_sequence(reference)
    return cigar_string_to_ops(ssw.align(haplotype).cigar_string)


class TestCalculateReadToRefAlignment:
    REF_COMMON = ("CTCTGTAATCGGATCATGTTTTGGGTTTTGCAGGACAAAGTATGGTTGAAA"
                  "CTGAGCTGAAGATATG")

    CASES = [
        ("ins_snp_merge",
         "CGGATCATGTTTTTTGGGTTTTCAGGACAAAGTATGGTTGAAACTG",
         "GATCATGATTTTTGGGTTTTCAG", (2, "7=1X15="),
         [(OP_M, 7), (OP_I, 2), (OP_M, 11), (OP_D, 1), (OP_M, 3)]),
        ("ins_ins_merge",
         "CGGATCATGTTTTTTGGGTTTTCAGGACAAAGTATGGTTGAAACTG",
         "GATCATGTTTTTTTGGGTTTTCAG", (2, "7=1I16="),
         [(OP_M, 7), (OP_I, 3), (OP_M, 11), (OP_D, 1), (OP_M, 3)]),
        ("del_del_merge",
         "CGGATCATGTTTGGGTTTTCAGGACAAAGTATGGTTGAAACTG",
         "GATCATGTTGGGTTTTCAGGACAAA", (2, "7=1D18="),
         [(OP_M, 7), (OP_D, 2), (OP_M, 9), (OP_D, 1), (OP_M, 9)]),
        ("del_ins_merge",
         "CGGATCATGTTTGGGTTTTCAGGACAAAGTATGGTTGAAACTG",
         "GATCATGTTTTTGGGTTTTCAGGACAAA", (2, "7=2I19="),
         [(OP_M, 7), (OP_I, 1), (OP_M, 11), (OP_D, 1), (OP_M, 9)]),
        ("del_ins_merge2",
         "CGGATCATGTGGGTTTTCAGGACAAAGTATGGTTGAAACTG",
         "GATCATGTTTGGGTTTTCAGGACAAA", (2, "7=2I17="),
         [(OP_M, 7), (OP_D, 1), (OP_M, 10), (OP_D, 1), (OP_M, 9)]),
        ("ins_del_merge",
         "CGGATCATGTTTTTTGGGTTTTCAGGACAAAGTATGGTTGAAACTG",
         "GATCATGTTTTTGGGTTTTCAGGACAAA", (2, "7=1D21="),
         [(OP_M, 7), (OP_I, 1), (OP_M, 11), (OP_D, 1), (OP_M, 9)]),
        ("2ins_3del_merge",
         "CGGATCATGTTTTTTGGGTTTTCAGGACAAAGTATGGTTGAAACTG",
         "GATCATGTTTGGGTTTTCAGGACAAA", (2, "7=3D19="),
         [(OP_M, 7), (OP_D, 1), (OP_M, 10), (OP_D, 1), (OP_M, 9)]),
        ("1ins_1del_back_to_back",
         "CGGATCATGTTTTGGGTTTTCAGGACAAAGTATGGTTGAAACTG",
         "GATCATGTTTTGGGTTTTCCAGGACAAA", (2, "18=1I9="),
         [(OP_M, 28)]),
        ("1ins_1del_consecutive",
         "CGGATCATGTTTTGGGTTTTTTGCAGGACAAAGTATGGTTGAAACTG",
         "GATCATGTTTTGGGTTTTGCAGGACAAA", (2, "16=2D12="),
         [(OP_M, 28)]),
        ("1del_1ins_consecutive2",
         "CGGATCATGTTTTGGGTTTTGCGCAGGACAAAGTATGGTTGAAACTG",
         "GATCATGTTTTGGGTTGCGCAGGACAAA", (2, "16=2D12="),
         [(OP_M, 28)]),
        ("two_dels_different_positions",
         "CGGATCATGTTTGGGTTTTGCAGGACAAAGTATGGTTGAAACTG",
         "GATCATGTTTGGTTTT", (2, "10=1D6="),
         [(OP_M, 7), (OP_D, 1), (OP_M, 3), (OP_D, 1), (OP_M, 6)]),
    ]

    @pytest.mark.parametrize(
        "name,hap,read,read_alignment,expected",
        CASES, ids=[c[0] for c in CASES],
    )
    def test_common_cases(self, name, hap, read, read_alignment,
                          expected):
        hap_ops = _hap_to_ref_ops(self.REF_COMMON, hap)
        pos, cigar = read_alignment
        got = calculate_read_to_ref_alignment(
            read, ReadAlignment(score=100, position=pos, cigar=cigar),
            hap_ops,
        )
        assert [tuple(x) for x in got] == expected

    def test_match_mismatch(self):
        hap_ops = _hap_to_ref_ops(
            REF, "TGTTTAGGGTTTTGCAGGACAAAGTATGGTTGAAACTG"
        )
        got = calculate_read_to_ref_alignment(
            "TGTTTAGGGTTTTGCAGGA",
            ReadAlignment(score=100, position=7, cigar="19="),
            hap_ops,
        )
        # The reference pins 19M here with read-to-hap position 7;
        # a pure hap-mismatch merges into match ops.
        assert [tuple(x) for x in got] == [(OP_M, 19)]


class TestMergeCigarOp:
    def test_empty_cigar(self):
        cigar = []
        merge_cigar_op([OP_M, 3], 10, cigar)
        assert cigar == [[OP_M, 3]]

    def test_merge_different_op(self):
        cigar = [[OP_M, 3], [OP_I, 5]]
        merge_cigar_op([OP_M, 2], 10, cigar)
        assert cigar == [[OP_M, 3], [OP_I, 5], [OP_M, 2]]

    def test_merge_same_op(self):
        cigar = [[OP_M, 3], [OP_I, 5]]
        merge_cigar_op([OP_I, 2], 10, cigar)
        assert cigar == [[OP_M, 3], [OP_I, 7]]

    def test_aligned_length_overflow_clamped(self):
        cigar = [[OP_M, 3], [OP_I, 5]]
        merge_cigar_op([OP_I, 20], 10, cigar)
        assert cigar == [[OP_M, 3], [OP_I, 7]]

    def test_del_ignores_aligned_length(self):
        cigar = [[OP_M, 3], [OP_D, 5]]
        merge_cigar_op([OP_D, 20], 10, cigar)
        assert cigar == [[OP_M, 3], [OP_D, 25]]

    def test_no_merge_when_read_exhausted(self):
        cigar = [[OP_M, 3], [OP_D, 5], [OP_M, 5]]
        merge_cigar_op([OP_I, 20], 8, cigar)
        assert cigar == [[OP_M, 3], [OP_D, 5], [OP_M, 5]]


class TestScoreThreshold:
    def test_threshold_never_negative(self):
        opts = AlignerOptions(
            read_size=10, realignment_similarity_threshold=0.1
        )
        al = FastPassAligner(opts)
        t = al._ssw_score_threshold()
        assert t >= 0
        assert t <= 10 * opts.match


class TestIsAlignmentNormalized:
    REF_NORM = "ATGCTGCACTCTCTCTCAGCTGTCACC"

    def _check(self, cigar, ref_offset, read_seq):
        al = FastPassAligner(AlignerOptions())
        al.set_reference(self.REF_NORM)
        return al._is_alignment_normalized(cigar, ref_offset, read_seq)

    def test_match(self):
        assert self._check([[OP_M, 14]], 7, "ACTCTCTCTCAGCT")

    def test_del_not_normalized(self):
        assert not self._check(
            [[OP_M, 4], [OP_D, 2], [OP_M, 10]], 7, "ACTCTCTCAGCTGT"
        )

    def test_del_normalized(self):
        assert self._check(
            [[OP_M, 1], [OP_D, 2], [OP_M, 13]], 7, "ACTCTCTCAGCTGT"
        )

    def test_ins_not_normalized(self):
        assert not self._check(
            [[OP_M, 4], [OP_I, 2], [OP_M, 8]], 7, "ACTCTCTCTCTCAGCTGT"
        )

    def test_ins_normalized(self):
        assert self._check(
            [[OP_M, 1], [OP_I, 2], [OP_M, 10]], 7, "ACTCTCTCTCTCAGCTGT"
        )

"""Realigner tests: window selection, De Bruijn assembly, SSW,
fast-pass alignment, and end-to-end read realignment around an indel.

Scenarios modeled on reference debruijn_graph_test.cc /
window_selector_test.py / realigner_test.py behavior.
"""

import os
import numpy as np
import pytest

from deepvariant_tpu.core.cigar import format_cigar, parse_cigar_string
from deepvariant_tpu.core.types import Range, Read
from deepvariant_tpu.io.bam import ReadBatch
from deepvariant_tpu.io.fasta import InMemoryFasta
from deepvariant_tpu.realign import debruijn_graph
from deepvariant_tpu.realign.config import (
    AlignerOptions,
    DeBruijnGraphOptions,
    RealignerOptions,
    WindowSelectorOptions,
)
from deepvariant_tpu.realign.fast_pass_aligner import (
    FastPassAligner,
    cigar_string_to_ops,
    set_positions_map,
    HaplotypeReadsAlignment,
)
from deepvariant_tpu.realign.realigner import (
    AssemblyRegion,
    CandidateHaplotypes,
    Realigner,
    assign_reads_to_assembled_regions,
    split_reads,
)
from deepvariant_tpu.realign.ssw import SswAligner
from deepvariant_tpu.realign.window_selector import (
    candidates_to_windows,
    select_windows,
)

CHROM = "chr1"

# 120bp reference with distinct 10-mers (no repeats).
REF = (
    "GATTACAGGCTTGCAAGTCCGTAACGGCATTCGGAATGCCTTGAGCGATCC"
    "TAGCCTAAGGTCAACTGTCCGATTGCACTGGACCTTAGCAATCGGTATCCG"
    "AGGCTCAATCGGTACCTG"
)


def make_read(start, bases, cigar, name="r", qual=35, mapq=60):
    return Read(
        fragment_name=name,
        aligned_sequence=bases,
        aligned_quality=bytes([qual] * len(bases)),
        reference_name=CHROM,
        position=start,
        mapping_quality=mapq,
        cigar=parse_cigar_string(cigar),
    )


def reads_tiling(seq, start0, read_len=30, step=3, prefix="t", mapq=60):
    """Perfectly matching reads tiling `seq` anchored at ref pos start0."""
    reads = []
    for i in range(0, len(seq) - read_len + 1, step):
        reads.append(make_read(
            start0 + i, seq[i:i + read_len], f"{read_len}M",
            name=f"{prefix}{i}", mapq=mapq,
        ))
    return reads


class TestWindowSelector:
    def _windows(self, reads, region, **opts):
        fasta = InMemoryFasta({CHROM: REF})
        cfg = WindowSelectorOptions(**opts)
        batch = ReadBatch.from_reads(reads, [CHROM])
        return select_windows(
            cfg, fasta.query, batch, region,
            contig_length=len(REF),
        )

    def test_no_variation_no_windows(self):
        reads = reads_tiling(REF[20:80], 20)
        assert self._windows(reads, Range(CHROM, 20, 80)) == []

    def test_snp_creates_window(self):
        # Plant a SNP at ref pos 50 in every read.
        alt = REF[:50] + ("A" if REF[50] != "A" else "C") + REF[51:]
        reads = reads_tiling(alt[30:75], 30)
        wins = self._windows(reads, Range(CHROM, 30, 75))
        assert len(wins) == 1
        w = wins[0]
        assert w.start <= 50 < w.end
        # radius = min_windows_distance (80)
        assert w.start == 50 - 80 and w.end == 50 + 80

    def test_single_read_below_support_threshold(self):
        alt = REF[:50] + ("A" if REF[50] != "A" else "C") + REF[51:]
        reads = [make_read(40, alt[40:70], "30M")]
        assert self._windows(reads, Range(CHROM, 30, 75)) == []

    def test_candidates_to_windows_merging(self):
        cfg = WindowSelectorOptions(min_windows_distance=10)
        wins = candidates_to_windows(cfg, [100, 105, 300], CHROM)
        assert len(wins) == 2
        assert (wins[0].start, wins[0].end) == (90, 115)
        assert (wins[1].start, wins[1].end) == (290, 310)


class TestDeBruijnGraph:
    def test_ref_only_single_haplotype(self):
        options = DeBruijnGraphOptions(min_k=10)
        graph = debruijn_graph.build(REF[:60], [], options)
        assert graph is not None
        assert graph.candidate_haplotypes() == [REF[:60]]

    def test_snp_yields_two_haplotypes(self):
        ref = REF[:60]
        alt = ref[:30] + ("T" if ref[30] != "T" else "G") + ref[31:]
        reads = reads_tiling(alt, 0, read_len=25, step=2)
        graph = debruijn_graph.build(ref, reads, DeBruijnGraphOptions())
        haps = graph.candidate_haplotypes()
        assert ref in haps and alt in haps and len(haps) == 2

    def test_low_weight_edges_pruned(self):
        ref = REF[:60]
        alt = ref[:30] + ("T" if ref[30] != "T" else "G") + ref[31:]
        # Single read of support < min_edge_weight (2): alt pruned away.
        reads = [make_read(10, alt[10:45], "35M")]
        graph = debruijn_graph.build(ref, reads, DeBruijnGraphOptions())
        assert graph.candidate_haplotypes() == [ref]

    def test_low_quality_bases_excluded(self):
        ref = REF[:60]
        alt = ref[:30] + ("T" if ref[30] != "T" else "G") + ref[31:]
        reads = reads_tiling(alt, 0, read_len=25, step=2)
        for r in reads:
            r.aligned_quality = bytes([5] * len(r.aligned_sequence))
        graph = debruijn_graph.build(ref, reads, DeBruijnGraphOptions())
        assert graph.candidate_haplotypes() == [ref]

    def test_cycle_forces_larger_k(self):
        # Repeat of length 12 => k=10 has repeated ref kmers, k must grow.
        ref = REF[:20] + REF[:20] + REF[40:80]
        graph = debruijn_graph.build(ref, [], DeBruijnGraphOptions())
        assert graph is not None
        assert graph.k > 10
        assert graph.candidate_haplotypes() == [ref]


class TestPositionsMap:
    def test_shift_map(self):
        ha = HaplotypeReadsAlignment(0, 1, [])
        ha.cigar = "3=2D4=2I3="
        set_positions_map(12, ha)
        # 3 match: shift 0; deletion adds +2 to following; insertion
        # of 2 subtracts for following positions.
        assert ha.hap_to_ref_positions_map[:3] == [0, 0, 0]
        assert ha.hap_to_ref_positions_map[3:7] == [2, 2, 2, 2]
        assert ha.hap_to_ref_positions_map[7:9] == [2, 1]
        assert ha.hap_to_ref_positions_map[9:12] == [0, 0, 0]


class TestFastPassAligner:
    def _aligner(self, ref_seq, haplotypes, ref_start=0):
        fpa = FastPassAligner(AlignerOptions(kmer_size=15))
        fpa.set_reference(ref_seq)
        fpa.set_ref_start(CHROM, ref_start)
        fpa.set_ref_prefix_len(0)
        fpa.set_ref_suffix_len(0)
        fpa.set_haplotypes(haplotypes)
        return fpa

    def test_perfect_reads_keep_alignment(self):
        ref = REF[:80]
        reads = reads_tiling(ref, 0, read_len=30, step=5)
        fpa = self._aligner(ref, [ref])
        out = fpa.realign_reads(reads)
        assert len(out) == len(reads)
        for orig, new in zip(reads, out):
            assert new.position == orig.position
            assert format_cigar(new.cigar) == "30M"

    def test_deletion_reads_get_del_cigar(self):
        ref = REF[:80]
        # 6bp deletion at position 40.
        hap = ref[:40] + ref[46:]
        reads = reads_tiling(hap, 0, read_len=30, step=4, prefix="d")
        # Original alignments are all-M (wrong); realigner should
        # produce 'xM6DyM' for reads spanning the deletion.
        fpa = self._aligner(ref, [ref, hap])
        out = fpa.realign_reads(reads)
        spanning = [
            r for r in out
            if r.position < 35 and any(op_l[0] == 3 for op_l in
                                       [list(c) for c in r.cigar])
        ]
        assert spanning, "no realigned read carries the deletion"
        for r in spanning:
            cig = format_cigar(r.cigar)
            assert "6D" in cig, cig

    def test_read_to_ref_position_shift(self):
        ref = REF[:80]
        hap = ref[:40] + ref[46:]  # ref[40:46] deleted; hap pos 40 == ref 46
        spanning = make_read(30, hap[38:68], "30M", name="spanning")
        after = make_read(30, hap[40:70], "30M", name="after")
        reads = reads_tiling(hap, 0, read_len=30, step=4)
        fpa = self._aligner(ref, [ref, hap])
        out = fpa.realign_reads(reads + [spanning, after])
        by_name = {r.fragment_name: r for r in out}
        # Spanning read: starts at hap 38 (= ref 38), carries the deletion
        # (left-normalized: ref[39]==ref[45] makes 1M6D29M == 2M6D28M).
        assert by_name["spanning"].position == 38
        assert format_cigar(by_name["spanning"].cigar) in (
            "1M6D29M", "2M6D28M"
        )
        # After-deletion read: hap 40 maps to ref 46, plain match.
        assert by_name["after"].position == 46
        assert format_cigar(by_name["after"].cigar) == "30M"


class TestSplitReads:
    def test_split_at_skip(self):
        read = make_read(10, "A" * 40, "20M100N20M")
        parts = split_reads([read])
        assert len(parts) == 2
        assert parts[0].position == 10
        assert format_cigar(parts[0].cigar) == "20M"
        assert parts[1].position == 130
        assert format_cigar(parts[1].cigar) == "20M"
        assert parts[0].aligned_sequence == "A" * 20

    def test_short_parts_dropped(self):
        read = make_read(10, "A" * 24, "10M100N14M")
        parts = split_reads([read])
        # 10bp part < MIN_SPLIT_LEN dropped; 14bp part < 15 dropped too.
        assert parts == []

    def test_no_skip_passthrough(self):
        read = make_read(10, "A" * 30, "30M")
        assert split_reads([read]) == [read]


class TestAssignment:
    def test_max_overlap_assignment(self):
        regions = [
            AssemblyRegion(CandidateHaplotypes(Range(CHROM, 0, 50), ["x"])),
            AssemblyRegion(CandidateHaplotypes(Range(CHROM, 40, 100),
                                               ["y"])),
        ]
        r1 = make_read(10, "A" * 20, "20M")   # only region 0
        r2 = make_read(45, "A" * 40, "40M")   # overlaps both, more in 1
        r3 = make_read(200, "A" * 20, "20M")  # neither
        unassigned = assign_reads_to_assembled_regions(
            regions, [r1, r2, r3]
        )
        assert [r.fragment_name for r in regions[0].reads] == ["r"]
        assert len(regions[1].reads) == 1
        assert unassigned == [r3]


class TestRealignerEndToEnd:
    def test_deletion_region(self):
        # Long contig so the +/-80bp assembly window fits on-reference
        # (the reference realigner also drops off-contig windows,
        # realigner.py:715-717).
        rng = np.random.RandomState(7)
        long_ref = "".join("ACGT"[i] for i in rng.randint(0, 4, 500))
        fasta = InMemoryFasta({CHROM: long_ref})
        # 6bp deletion at 250.
        hap = long_ref[:250] + long_ref[256:]
        reads = reads_tiling(
            hap[150:350], 150, read_len=35, step=2, prefix="e2e"
        )
        realigner = Realigner(RealignerOptions(), fasta)
        windows_haps, realigned = realigner.realign_reads(
            reads, Range(CHROM, 0, len(long_ref))
        )
        assert windows_haps, "expected an assembly window"
        # At least one non-reference haplotype assembled.
        assert any(len(wh.haplotypes) >= 2 for wh in windows_haps)
        assert len(realigned) == len(reads)
        deletion_reads = [
            r for r in realigned
            if "6D" in format_cigar(r.cigar)
        ]
        assert deletion_reads, "no read realigned with the 6bp deletion"

    def test_empty_reads(self):
        fasta = InMemoryFasta({CHROM: REF})
        realigner = Realigner(RealignerOptions(), fasta)
        assert realigner.realign_reads([], Range(CHROM, 0, 100)) == ([], [])


@pytest.mark.integration
class TestReferenceOracleRegions:
    """Window + haplotype parity against the reference's own expectations.

    The cases mirror realigner_test.py test_realigner_example_region
    (which runs with ws_use_window_selector_model=True, i.e. the
    ALLELE_COUNT_LINEAR window selector): identical assembly window and
    bit-identical candidate haplotype sets on real chr20 data.
    """

    CASES = [
        # (region, expected window, expected haplotype pair)
        (
            (10_095_379, 10_095_500),
            (10_095_351, 10_095_553),
            {
                "TAGTGATCTAGTCCTTTTTGTTGTGCAAAAGGAAGTGCTAAAATCAGAATGAGAACC"
                "ATGGTCACCTGACATAGACACAAGTGATGATGATGATGATGATGATGATGATGATGA"
                "TGATATCCATGTTCAAGTACTAATTCTGGGCAAGACACTGTTCTAAGTGCTATGAAT"
                "ATATTACCTCATTTAATCATCT",
                "TAGTGATCTAGTCCTTTTTGTTGTGCAAAAGGAAGTGCTAAAATCAGAATGAGAACC"
                "ATGGTCACCTGACATAGACACAAGTGATGATGATGATGATGATGATGATGATGATGA"
                "TGATGATGATGATATCCATGTTCAAGTACTAATTCTGGGCAAGACACTGTTCTAAGT"
                "GCTATGAATATATTACCTCATTTAATCATCT",
            },
        ),
        (
            (10_046_080, 10_046_307),
            (10_046_095, 10_046_267),
            {
                "CCCAAAAAAAGAGTTAGGGATGCTGGAAAGGCAGAAAGAAAAGGGAAGGGAAGAGGA"
                "AGGGGAAAAGGAAAGAAAAAAAAGAAAGAAAGAAAGAGAAAGAAAGAGAAAGAGAAA"
                "GAAAGAGGAAAGAGAGAAAGAGAAAGAGAAGGAAAGAGAAAGAAAGAGAAGGAAAGAG",
                "CCCAAAAAAAGAGTTAGGGATGCTGGAAAGGCAGAAAGAAAAGGGAAGGGAAGAGGA"
                "AGGGGAAAAGGAAAGAAAAAAAAGAAAGAAAGAAAGAGAAAGAGAAAGAAAGAGGAA"
                "AGAGAGAAAGAGAAAGAGAAGGAAAGAGAAAGAAAGAGAAGGAAAGAG",
            },
        ),
    ]

    @pytest.mark.parametrize("case_idx", [0, 1])
    def test_window_and_haplotypes_match_reference(
        self, testdata_dir, case_idx
    ):
        import os

        from deepvariant_tpu.io.bam import BamReader
        from deepvariant_tpu.io.fasta import FastaReader
        from deepvariant_tpu.realign.config import RealignerOptions

        (rs, re_), (ws, we), expected_haps = self.CASES[case_idx]
        fa = FastaReader(os.path.join(
            testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ))
        bam = BamReader(os.path.join(
            testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
        ))
        opts = RealignerOptions()
        opts.ws_config.model_type = "allele_count_linear"
        realigner = Realigner(opts, fa)
        region = Range("chr20", rs, re_)
        reads = bam.query(region).to_reads()
        windows_haps, realigned = realigner.realign_reads(reads, region)
        assert len(realigned) == len(reads)
        assert len(windows_haps) == 1
        wh = windows_haps[0]
        assert (wh.span.start, wh.span.end) == (ws, we)
        assert set(wh.haplotypes) == expected_haps


@pytest.mark.integration
def test_native_dbg_matches_python(testdata_dir):
    """dv_dbg_haplotypes vs the Python graph on real windows."""
    from deepvariant_tpu.io import native
    from deepvariant_tpu.io.bam import BamReader
    from deepvariant_tpu.io.fasta import FastaReader
    from deepvariant_tpu.realign import debruijn_graph
    from deepvariant_tpu.realign.config import DeBruijnGraphOptions

    if not native.has_dbg():
        pytest.skip("native dbg unavailable")
    fa = FastaReader(os.path.join(
        testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
    ))
    bam = BamReader(os.path.join(
        testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
    ))
    opts = DeBruijnGraphOptions()
    n_checked = 0
    for start in range(10_000_000, 10_010_000, 500):
        region = Range("chr20", start, start + 500)
        reads = bam.query(region).to_reads()
        if not reads:
            continue
        ref = fa.query(region)
        py_graph = debruijn_graph.build(ref, reads, opts)
        py = None if py_graph is None else py_graph.candidate_haplotypes()
        nat = native.dbg_haplotypes(
            ref.upper().encode(),
            [r.aligned_sequence.encode() for r in reads],
            [r.aligned_quality for r in reads],
            [r.mapping_quality for r in reads],
            opts.min_k, opts.max_k, opts.step_k,
            opts.min_mapq, opts.min_base_quality,
            opts.min_edge_weight, opts.max_num_paths,
        )
        assert nat == py, f"window {start}: native != python"
        n_checked += 1
    assert n_checked >= 15


def test_ssw_score_multi_matches_striped_and_python():
    """The dispatched multi-pair scorer (inter-sequence AVX2 lanes on
    capable CPUs) is bit-identical to the SSE2 striped kernel and to
    the scalar Python SSW on random pairs with Ns, empty reads,
    masked haplotypes, and >16 reads (lane-group remainders)."""
    import ctypes

    from deepvariant_tpu.io import native

    if not native.has_ssw_multi():
        pytest.skip("native multi-SSW unavailable")
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)

    def rseq(n, with_n=False):
        s = rng.choice(bases, n).tobytes()
        if with_n and rng.random() < 0.3:
            b = bytearray(s)
            b[rng.integers(0, n)] = ord("N")
            s = bytes(b)
        return s

    lib = native._LIB
    i32p = ctypes.POINTER(ctypes.c_int32)

    def offsets(seqs):
        o = np.zeros(len(seqs) + 1, np.int32)
        np.cumsum([len(s) for s in seqs], out=o[1:])
        return o

    m, mm, go, ge = 4, 6, 8, 1
    for trial in range(20):
        nh = int(rng.integers(1, 7))
        nr = int(rng.integers(1, 50))
        haps = [rseq(int(rng.integers(40, 350)), True)
                for _ in range(nh)]
        reads = [
            b"" if rng.random() < 0.05
            else rseq(int(rng.integers(15, 180)), True)
            for _ in range(nr)
        ]
        mask = [int(rng.random() < 0.8) for _ in range(nh)]
        got = native.ssw_score_multi(haps, mask, reads, m, mm, go, ge)
        ho, ro = offsets(haps), offsets(reads)
        mk = np.asarray(mask, np.uint8)
        want = np.zeros((nh, nr), np.int32)
        lib.dv_ssw_score_multi(
            b"".join(haps), ho.ctypes.data_as(i32p), nh,
            mk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            b"".join(reads), ro.ctypes.data_as(i32p), nr,
            m, mm, go, ge, want.ctypes.data_as(i32p),
        )
        assert (got == want).all(), trial
        # Scalar cross-check on a few (hap, read) pairs per trial.
        hi = int(rng.integers(0, nh))
        if mask[hi]:
            aligner = SswAligner(m, mm, go, ge)
            aligner.set_reference_sequence(haps[hi].decode())
            for ri in map(int, rng.integers(0, nr, size=3)):
                if not reads[ri]:
                    continue
                py = aligner.align(reads[ri].decode())
                assert got[hi, ri] == py.sw_score


@pytest.mark.integration
def test_window_counts_vectorized_matches_counter(testdata_dir):
    """The unit-table window scorer must equal the counter-based
    variant_reads_counts on real windows (same anchored-indel,
    dedup, and HQ-sum semantics)."""
    import numpy as np

    from deepvariant_tpu.io.bam import BamReader
    from deepvariant_tpu.io.fasta import FastaReader
    from deepvariant_tpu.make_examples.allele_counter import (
        AlleleCounter,
        AlleleCounterOptions,
    )
    from deepvariant_tpu.realign import window_selector as ws
    from deepvariant_tpu.realign.config import WindowSelectorOptions

    fa = FastaReader(os.path.join(
        testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
    ))
    bam = BamReader(os.path.join(
        testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
    ))
    cfg = WindowSelectorOptions()
    pad = cfg.region_expansion_in_bp
    for start in range(10_000_000, 10_012_000, 1000):
        s, e = start - pad, start + 1000 + pad
        expanded = Range("chr20", s, e)
        batch = bam.query(expanded)
        ref = fa.query(expanded)
        if isinstance(ref, str):
            ref = np.frombuffer(ref.encode(), np.uint8)
        prev = fa.query(Range("chr20", s - 1, s))
        prev = prev if isinstance(prev, str) else bytes(prev).decode()
        keep = np.nonzero(batch.mapq >= cfg.min_mapq)[0]
        fast = ws._variant_reads_counts_vectorized(
            batch, keep, ref, expanded, prev, cfg
        )
        counter = AlleleCounter(
            ref, expanded,
            AlleleCounterOptions(
                min_base_quality=cfg.min_base_quality,
                min_mapping_quality=cfg.min_mapq,
                keep_legacy_behavior=cfg.keep_legacy_behavior,
            ),
            ref_prev_base=prev,
        )
        counter.add_batch(batch.subset(keep))
        slow = ws.variant_reads_counts(counter, cfg)
        assert (fast == slow).all(), start


class TestReadAssignment:
    """Port of nucleus ranges_test.py overlap_len (:530-565) and
    find_max_overlapping (:567-668) via the realigner's max-overlap
    read assignment (ReadAssigner analog). The repo's assigner works
    within one contig (regions come from a single calling window), so
    the cross-contig case does not apply."""

    def _regions(self, spans):
        from deepvariant_tpu.realign.realigner import (
            CandidateHaplotypes,
        )

        return [
            AssemblyRegion(CandidateHaplotypes(
                Range("1", lo, hi), ["A"]
            ))
            for lo, hi in spans
        ]

    @pytest.mark.parametrize("a,b,expected", [
        ((0, 10), (10, 20), 0),
        ((0, 10), (100, 200), 0),
        ((10, 10), (0, 20), 0),
        ((0, 100), (50, 99), 49),
        ((0, 10), (0, 1), 1),
        ((0, 10), (0, 2), 2),
        ((1, 10), (0, 1), 0),
    ])
    def test_overlap_len(self, a, b, expected):
        from deepvariant_tpu.realign.realigner import _overlap_len

        assert _overlap_len(a[0], a[1], Range("1", *b)) == expected
        assert _overlap_len(b[0], b[1], Range("1", *a)) == expected

    @pytest.mark.parametrize("query,spans,expected", [
        # find_max_overlapping table (ranges_test.py:567-640).
        ((20, 30), [], None),
        ((20, 30), [(0, 10), (5, 10)], None),
        ((4, 10), [(0, 10), (5, 10)], 0),
        ((9, 20), [(0, 10), (5, 15)], 1),
        ((9, 20), [(0, 10), (0, 15), (5, 20)], 2),
        ((5, 13), [(0, 10), (0, 15), (10, 20)], 1),
        # Equal overlap -> least index.
        ((5, 15), [(0, 10), (10, 20), (12, 20)], 0),
        ((0, 10), [(0, 5), (5, 10)], 0),
    ])
    def test_max_overlap_assignment(self, query, spans, expected):
        regions = self._regions(spans)
        read = make_read(query[0], "A" * (query[1] - query[0]),
                         f"{query[1] - query[0]}M")
        unassigned = assign_reads_to_assembled_regions(regions, [read])
        if expected is None:
            assert unassigned == [read]
            assert all(not r.reads for r in regions)
        else:
            assert unassigned == []
            assert [bool(r.reads) for r in regions] == [
                i == expected for i in range(len(regions))
            ]

    def test_unordered_search_ranges(self):
        import itertools

        spans = [(0, 10), (10, 20), (12, 20)]
        for perm in itertools.permutations(spans):
            regions = self._regions(perm)
            read = make_read(4, "A" * 8, "8M")
            assign_reads_to_assembled_regions(regions, [read])
            assert [bool(r.reads) for r in regions] == [
                s == (0, 10) for s in perm
            ]

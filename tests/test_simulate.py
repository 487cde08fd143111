"""Tests for the synthetic diploid read simulator.

The simulator's correctness contract: reads are emitted pre-aligned
with EXACT alignments (POS + CIGAR derived from the haplotype
coordinate map), truth records describe exactly the haplotypes the
reads were drawn from, and with errors disabled every read
reconstructs the reference through its own CIGAR at non-variant
positions.
"""

import os

import numpy as np
import pytest

from deepvariant_tpu.core.types import Range
from deepvariant_tpu.training.simulate import (
    SimConfig,
    SimVariant,
    build_haplotype,
    cigar_from_refpos,
    homopolymer_runs,
    sample_variants,
    simulate_corpus,
)

REF_FASTA = (
    "/root/reference/deepvariant/testdata/input/"
    "ucsc.hg19.chr20.unittest.fasta.gz"
)
WINDOW = (10_150_000, 10_158_000)

_OP_M, _OP_I, _OP_D, _OP_S = 1, 2, 3, 5


class TestCigarFromRefpos:
    def test_all_match(self):
        pos, cigar = cigar_from_refpos(np.arange(100, 110, dtype=np.int64))
        assert pos == 100
        assert cigar == [(_OP_M, 10)]

    def test_interior_insertion(self):
        rp = np.array([5, 6, -1, -1, 7, 8], np.int64)
        pos, cigar = cigar_from_refpos(rp)
        assert pos == 5
        assert cigar == [(_OP_M, 2), (_OP_I, 2), (_OP_M, 2)]

    def test_interior_deletion(self):
        rp = np.array([5, 6, 10, 11], np.int64)
        pos, cigar = cigar_from_refpos(rp)
        assert pos == 5
        assert cigar == [(_OP_M, 2), (_OP_D, 3), (_OP_M, 2)]

    def test_edge_insertions_become_soft_clips(self):
        rp = np.array([-1, -1, 7, 8, 9, -1], np.int64)
        pos, cigar = cigar_from_refpos(rp)
        assert pos == 7
        assert cigar == [(_OP_S, 2), (_OP_M, 3), (_OP_S, 1)]

    def test_all_insertion_is_unalignable(self):
        assert cigar_from_refpos(np.full(5, -1, np.int64)) is None


class TestBuildHaplotype:
    REF = np.frombuffer(b"ACGTACGTACGTACGT", np.uint8)

    def test_snv(self):
        v = SimVariant(pos=4, ref="A", alt="G", genotype=(1, 0))
        seq, rp = build_haplotype(self.REF, 0, 16, [v], hap=0)
        assert bytes(seq) == b"ACGTGCGTACGTACGT"
        assert list(rp) == list(range(16))
        # hap 1 carries the reference allele
        seq1, _ = build_haplotype(self.REF, 0, 16, [v], hap=1)
        assert bytes(seq1) == b"ACGTACGTACGTACGT"

    def test_insertion(self):
        v = SimVariant(pos=3, ref="T", alt="TGG", genotype=(1, 1))
        seq, rp = build_haplotype(self.REF, 0, 16, [v], hap=0)
        assert bytes(seq) == b"ACGTGGACGTACGTACGT"
        assert list(rp[:7]) == [0, 1, 2, 3, -1, -1, 4]

    def test_deletion(self):
        v = SimVariant(pos=3, ref="TAC", alt="T", genotype=(0, 1))
        seq, rp = build_haplotype(self.REF, 0, 16, [v], hap=1)
        assert bytes(seq) == b"ACGTGTACGTACGT"
        assert list(rp[:6]) == [0, 1, 2, 3, 6, 7]

    def test_window_offset(self):
        v = SimVariant(pos=10, ref="G", alt="C", genotype=(1, 1))
        seq, rp = build_haplotype(self.REF, 8, 16, [v], hap=0)
        assert bytes(seq) == b"ACCTACGT"
        assert list(rp) == list(range(8, 16))


def test_homopolymer_runs():
    seq = np.frombuffer(b"AAAAACGTTTTTTGC", np.uint8)
    assert list(homopolymer_runs(seq, 5)) == [0, 7]
    assert list(homopolymer_runs(seq, 6)) == [7]


def test_sample_variants_non_overlapping_and_in_window():
    rng = np.random.default_rng(7)
    ref = np.frombuffer(
        bytes(np.random.default_rng(0).choice(
            np.frombuffer(b"ACGT", np.uint8), 50_000
        )), np.uint8,
    )
    cfg = SimConfig(ref_path="", contig="x", windows=[], snv_rate=1 / 100)
    variants = sample_variants(rng, ref, 1_000, 49_000, cfg)
    assert len(variants) > 200
    last_end = -1
    for v in variants:
        assert 1_000 <= v.pos < 49_000
        assert v.pos > last_end  # REF intervals never touch
        assert bytes(ref[v.pos: v.pos + len(v.ref)]).decode() == v.ref
        assert v.genotype in ((0, 1), (1, 0), (1, 1))
        last_end = v.pos + len(v.ref) - 1


@pytest.fixture(scope="module")
def clean_corpus(tmp_path_factory):
    """Error-free corpus: every read must exactly reconstruct its
    haplotype, i.e. match the reference at every aligned non-variant
    base."""
    outdir = str(tmp_path_factory.mktemp("sim_clean"))
    cfg = SimConfig(
        ref_path=REF_FASTA,
        contig="chr20",
        windows=[WINDOW],
        seed=3,
        coverage=12.0,
        error_rate_scale=0.0,
        hotspot_rate=0.0,
        slip_site_fraction=0.0,
        allele_sampling_bias=False,
    )
    return cfg, simulate_corpus(cfg, outdir)


def test_clean_reads_reconstruct_reference(clean_corpus):
    from deepvariant_tpu.io.bam import BamReader
    from deepvariant_tpu.io.fasta import FastaReader

    cfg, out = clean_corpus
    ref = FastaReader(REF_FASTA).query(
        Range("chr20", WINDOW[0] - 1000, WINDOW[1] + 1000)
    ).upper()
    off = WINDOW[0] - 1000
    variant_positions = set()
    for v in out["variants"]:
        variant_positions.update(range(v.pos, v.pos + len(v.ref)))
    reads = BamReader(out["bam"]).query(
        Range("chr20", *WINDOW)
    ).to_reads()
    assert len(reads) == out["n_reads"]
    checked_m = checked_reads = 0
    for rd in reads:
        qpos, rpos = 0, rd.position
        for op, n in rd.cigar:
            if op == _OP_M:
                for k in range(n):
                    if (rpos + k) not in variant_positions:
                        assert rd.aligned_sequence[qpos + k] == \
                            ref[rpos + k - off], rd.fragment_name
                        checked_m += 1
                qpos += n
                rpos += n
            elif op in (_OP_I, _OP_S):
                qpos += n
            elif op == _OP_D:
                rpos += n
        assert qpos == len(rd.aligned_sequence)
        checked_reads += 1
    assert checked_reads > 500
    assert checked_m > 50_000


def test_clean_reads_carry_variant_alleles(clean_corpus):
    """At het/hom SNV sites the allele fraction must track genotype."""
    from deepvariant_tpu.io.bam import BamReader

    cfg, out = clean_corpus
    reads = BamReader(out["bam"]).query(
        Range("chr20", *WINDOW)
    ).to_reads()
    snvs = [v for v in out["variants"]
            if len(v.ref) == 1 and len(v.alt) == 1]
    assert len(snvs) > 10
    het_counts = []
    for v in snvs:
        alt_n = ref_n = 0
        for rd in reads:
            if not (rd.position <= v.pos < rd.position + 150):
                continue
            qpos, rpos = 0, rd.position
            base = None
            for op, n in rd.cigar:
                if op == _OP_M:
                    if rpos <= v.pos < rpos + n:
                        base = rd.aligned_sequence[qpos + v.pos - rpos]
                    qpos += n
                    rpos += n
                elif op in (_OP_I, _OP_S):
                    qpos += n
                elif op == _OP_D:
                    rpos += n
            if base == v.alt:
                alt_n += 1
            elif base == v.ref:
                ref_n += 1
        total = alt_n + ref_n
        if total < 6:
            continue
        if v.genotype == (1, 1):
            # Hom-alt with no errors: every read carries the alt.
            assert alt_n / total == 1.0, (v, alt_n, ref_n)
        else:
            het_counts.append((alt_n, ref_n))
    # Hets are binomial(p=0.5) per site, so assert on the pool: the
    # aggregate VAF concentrates tightly around 0.5 even when single
    # low-coverage sites land 7:1.
    assert len(het_counts) > 10
    alt_total = sum(a for a, _ in het_counts)
    n_total = sum(a + r for a, r in het_counts)
    assert 0.42 < alt_total / n_total < 0.58, (alt_total, n_total)


def test_corpus_determinism(tmp_path):
    cfg = SimConfig(
        ref_path=REF_FASTA, contig="chr20",
        windows=[(10_150_000, 10_153_000)], seed=11, coverage=8.0,
    )
    a = simulate_corpus(cfg, str(tmp_path / "a"))
    b = simulate_corpus(cfg, str(tmp_path / "b"))
    assert a["n_variants"] == b["n_variants"]
    assert a["n_reads"] == b["n_reads"]
    with open(a["bam"], "rb") as fa, open(b["bam"], "rb") as fb:
        assert fa.read() == fb.read()


def test_truth_vcf_round_trips(clean_corpus):
    from deepvariant_tpu.io.vcf import VcfReader

    cfg, out = clean_corpus
    records = list(VcfReader(out["truth_vcf"]))
    assert len(records) == out["n_variants"]
    starts = [r.start for r in records]
    assert starts == sorted(starts)
    for rec, v in zip(records, sorted(out["variants"], key=lambda x: x.pos)):
        assert rec.start == v.pos
        assert rec.reference_bases == v.ref
        assert rec.alternate_bases == [v.alt]
        assert sorted(rec.calls[0].genotype) == sorted(v.genotype)


def test_make_examples_training_on_sim(tmp_path):
    """Full integration: simulated corpus through the real labeled-
    example path. The labels must cover all three classes and nearly
    every het/hom truth variant must surface as a candidate."""
    import collections

    from deepvariant_tpu.io import tfrecord
    from deepvariant_tpu.io.examples import parse_example
    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        make_examples_runner,
    )

    cfg = SimConfig(
        ref_path=REF_FASTA, contig="chr20",
        windows=[(10_150_000, 10_165_000)], seed=5, coverage=40.0,
        snv_rate=1 / 150,
    )
    out = simulate_corpus(cfg, str(tmp_path))
    examples_path = str(tmp_path / "train.tfrecord.gz")
    options = MakeExamplesOptions(
        reads_filename=out["bam"],
        ref_filename=REF_FASTA,
        examples_filename=examples_path,
        mode="training",
        regions=["chr20:10,150,000-10,165,000"],
        realigner_enabled=True,
        truth_variants_filename=out["truth_vcf"],
        confident_regions_filename=out["confident_bed"],
    )
    counts = make_examples_runner(options)
    assert counts["examples"] > 50
    labels = collections.Counter()
    candidate_starts = set()
    for rec in tfrecord.read_tfrecords(examples_path):
        ex = parse_example(rec)
        labels[ex.label] += 1
        candidate_starts.add(ex.variant.start)
    assert set(labels) == {0, 1, 2}
    hit = sum(1 for v in out["variants"] if v.pos in candidate_starts)
    assert hit / out["n_variants"] > 0.9


def test_hom_alt_contamination_and_het_skew(tmp_path):
    """allele_sampling_bias: contaminated hom-alt SNV sites must show
    ref-supporting reads at roughly their p_ref_draw rate, and pure
    (p_ref_draw == 0) hom sites must stay pure (no sequencing errors
    in this corpus)."""
    from deepvariant_tpu.io.bam import BamReader

    cfg = SimConfig(
        ref_path=REF_FASTA, contig="chr20",
        windows=[(10_150_000, 10_200_000)], seed=9, coverage=60.0,
        error_rate_scale=0.0, hotspot_rate=0.0, slip_site_fraction=0.0,
        snv_rate=1 / 350,
    )
    out = simulate_corpus(cfg, str(tmp_path))
    reads = BamReader(out["bam"]).query(
        Range("chr20", 10_150_000, 10_200_000)
    ).to_reads()

    def allele_counts(v):
        alt_n = ref_n = 0
        for rd in reads:
            if not (rd.position <= v.pos < rd.position + 200):
                continue
            qpos, rpos = 0, rd.position
            base = None
            for op, n in rd.cigar:
                if op == _OP_M:
                    if rpos <= v.pos < rpos + n:
                        base = rd.aligned_sequence[qpos + v.pos - rpos]
                    qpos += n
                    rpos += n
                elif op in (_OP_I, _OP_S):
                    qpos += n
                elif op == _OP_D:
                    rpos += n
            if base == v.alt:
                alt_n += 1
            elif base == v.ref:
                ref_n += 1
        return alt_n, ref_n

    hom_snvs = [v for v in out["variants"]
                if v.genotype == (1, 1) and len(v.ref) == 1
                and len(v.alt) == 1]
    contaminated = [v for v in hom_snvs if v.p_ref_draw > 0.05]
    # Fragment source follows the FIRST covered variant, so a
    # contaminated/het neighbor within fragment range leaks ref reads
    # onto downstream sites (realistic local correlation); assert
    # purity only for isolated pure sites.
    all_pos = sorted(v.pos for v in out["variants"])

    def isolated(v):
        # Only LEFT neighbors leak: a fragment's source follows its
        # leftmost covered variant, and fragments are at most 800 bp.
        import bisect

        i = bisect.bisect_left(all_pos, v.pos)
        return i == 0 or v.pos - all_pos[i - 1] > 820

    pure = [v for v in hom_snvs
            if v.p_ref_draw == 0.0 and isolated(v)]
    assert contaminated and pure
    ref_seen = 0
    for v in contaminated:
        alt_n, ref_n = allele_counts(v)
        ref_seen += ref_n
        assert alt_n > 0
    assert ref_seen > 0  # contamination really produces ref reads
    for v in pure:
        _, ref_n = allele_counts(v)
        assert ref_n == 0, v

    # Het skew: pooled alt fraction below 0.5 but still het-like.
    hets = [v for v in out["variants"]
            if v.genotype != (1, 1) and len(v.ref) == 1
            and len(v.alt) == 1]
    counts = [allele_counts(v) for v in hets]
    alt_total = sum(a for a, _ in counts)
    n_total = sum(a + r for a, r in counts)
    assert 0.40 < alt_total / n_total < 0.53

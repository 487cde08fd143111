"""Tests for the long-read (PacBio/ONT) read simulator.

Correctness contract (mirrors tests/test_simulate.py for the Illumina
path): the error model fitted from a real template BAM reproduces the
template's per-base indel event rates in the simulated output; with
errors disabled every read exactly reconstructs its haplotype through
its own CIGAR; reads are single-end with valid alignments; and the
labeled-example path (ONT_R104 preset: phased haplotype-sorted
diff_channels pileups) consumes the corpus end to end.
"""

import os

import numpy as np
import pytest

from deepvariant_tpu.core.types import Range
from deepvariant_tpu.training.simulate_longread import (
    LongReadModel,
    LongReadSimConfig,
    simulate_corpus_longread,
)

TESTDATA = "/root/reference/deepvariant/testdata/input"
TRIO_TESTDATA = "/root/reference/deeptrio/testdata/input"
GRCH38_10M = f"{TESTDATA}/grch38.chr20_and_21_10M.fa.gz"
ONT_BAM = f"{TRIO_TESTDATA}/HG002_R10_chr20_5050000_5075000.bam"
ONT_REF = f"{TRIO_TESTDATA}/grch38.chr20_5050000_5075000.masked.fa.gz"
PACBIO_BAM = f"{TESTDATA}/test_pacbio.chr20_100kbp_at_9mb.bam"

WINDOW = (1_000_000, 1_060_000)

_OP_M, _OP_I, _OP_D, _OP_S = 1, 2, 3, 5


@pytest.fixture(scope="module")
def ont_model():
    return LongReadModel.from_bam(
        ONT_BAM, Range("chr20", 5_050_000, 5_075_000),
        ref_path=ONT_REF,
    )


def _config(**kw):
    base = dict(
        ref_path=GRCH38_10M,
        contig="chr20",
        windows=[WINDOW],
        template_bam=ONT_BAM,
        template_region=("chr20", 5_050_000, 5_075_000),
        template_ref_path=ONT_REF,
        seed=11,
        coverage=18.0,
    )
    base.update(kw)
    return LongReadSimConfig(**base)


def test_fit_matches_known_template_statistics(ont_model):
    """The R10 template's measured rates (events/base ~0.003 each,
    ~30 kb median reads, indel errors concentrated in homopolymers)."""
    m = ont_model
    assert 0.002 < m.ins_event_rate < 0.004
    assert 0.002 < m.del_event_rate < 0.005
    assert 0.5 < m.hp_fraction < 0.95
    assert 20_000 < np.median(m.lengths) < 45_000
    assert len(m.quality_pool) > 50
    # Event lengths are dominated by 1-2 bp.
    assert np.median(m.ins_lengths) <= 2
    assert np.median(m.del_lengths) <= 2


def test_simulated_error_rates_match_template(ont_model, tmp_path):
    from deepvariant_tpu.io.bam import BamReader

    out = simulate_corpus_longread(_config(), str(tmp_path))
    reads = BamReader(out["bam"]).query(
        Range("chr20", *WINDOW)
    ).to_reads()
    assert len(reads) == out["n_reads"]
    n_i = n_d = m_bases = 0
    for rd in reads:
        assert rd.number_reads == 1  # single-end
        assert rd.read_number == 0
        assert rd.next_mate_position is None
        for op, n in rd.cigar:
            if op == _OP_I:
                n_i += 1
            elif op == _OP_D:
                n_d += 1
            elif op == _OP_M:
                m_bases += n
    # Simulated per-base event rates within 35% of the template fit
    # (truth indels contribute a little on top of the error process).
    assert m_bases > 500_000
    assert abs(n_i / m_bases - ont_model.ins_event_rate) \
        < 0.35 * ont_model.ins_event_rate
    assert abs(n_d / m_bases - ont_model.del_event_rate) \
        < 0.35 * ont_model.del_event_rate


def test_clean_long_reads_reconstruct_reference(tmp_path):
    """With the error process off, every aligned non-variant base
    must equal the reference base its CIGAR maps it to."""
    from deepvariant_tpu.io.bam import BamReader
    from deepvariant_tpu.io.fasta import FastaReader

    cfg = _config(
        error_rate_scale=0.0, hotspot_rate=0.0,
        ref_contamination=0.0, coverage=8.0, seed=5,
    )
    out = simulate_corpus_longread(cfg, str(tmp_path))
    lo, hi = WINDOW
    ref = FastaReader(GRCH38_10M).query(
        Range("chr20", lo - 1000, hi + 1000)
    ).upper()
    off = lo - 1000
    variant_positions = set()
    for v in out["variants"]:
        variant_positions.update(range(v.pos, v.pos + len(v.ref)))
    reads = BamReader(out["bam"]).query(
        Range("chr20", lo, hi)
    ).to_reads()
    checked = 0
    for rd in reads:
        qpos, rpos = 0, rd.position
        for op, n in rd.cigar:
            if op == _OP_M:
                for k in range(n):
                    if (rpos + k) not in variant_positions:
                        assert rd.aligned_sequence[qpos + k] == \
                            ref[rpos + k - off], rd.fragment_name
                        checked += 1
                qpos += n
                rpos += n
            elif op in (_OP_I, _OP_S):
                qpos += n
            elif op == _OP_D:
                rpos += n
        assert qpos == len(rd.aligned_sequence)
    assert checked > 200_000


def test_pacbio_template_fits(tmp_path):
    """The HiFi template fits with much lower indel rates than ONT."""
    m = LongReadModel.from_bam(
        PACBIO_BAM, Range("chr20", 8_980_000, 9_100_000),
        ref_path=GRCH38_10M,
    )
    assert 0.0003 < m.ins_event_rate < 0.002
    assert 0.0005 < m.del_event_rate < 0.002
    assert 12_000 < np.median(m.lengths) < 18_000
    # HiFi qualities are high (median Q93 in the template).
    assert np.median(np.concatenate(m.quality_pool[:50])) > 60


def test_corpus_determinism(tmp_path):
    a = simulate_corpus_longread(
        _config(coverage=4.0), str(tmp_path / "a")
    )
    b = simulate_corpus_longread(
        _config(coverage=4.0), str(tmp_path / "b")
    )
    assert a["n_reads"] == b["n_reads"]
    assert a["n_variants"] == b["n_variants"]
    with open(a["bam"], "rb") as fa, open(b["bam"], "rb") as fb:
        assert fa.read() == fb.read()


def test_make_examples_ont_preset_on_sim_corpus(tmp_path):
    """End-to-end: simulated ONT reads -> make_examples training mode
    with the ONT_R104 preset (phasing + diff_channels) -> labeled
    examples with the preset's tensor shape and both variant types."""
    from collections import Counter

    from deepvariant_tpu.io import examples as exio, tfrecord
    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        make_examples_runner,
    )
    from deepvariant_tpu.make_examples.presets import apply_model_preset

    cfg = _config(
        windows=[(1_000_000, 1_030_000)], coverage=25.0, seed=23,
    )
    out = simulate_corpus_longread(cfg, str(tmp_path))
    examples_path = str(tmp_path / "ex.tfrecord.gz")
    options = MakeExamplesOptions(
        reads_filename=out["bam"],
        ref_filename=GRCH38_10M,
        examples_filename=examples_path,
        mode="training",
        regions=["chr20:1,000,000-1,030,000"],
        truth_variants_filename=out["truth_vcf"],
        confident_regions_filename=out["confident_bed"],
        write_run_info=False,
    )
    apply_model_preset(options, "ONT_R104")
    counts = make_examples_runner(options)
    assert counts["examples"] > 100
    labels = Counter()
    types = Counter()
    for rec in tfrecord.read_tfrecords(examples_path):
        ex = exio.parse_example(rec)
        # ONT preset: 147 wide, 8 channels + 2 diff_channels planes.
        assert ex.image.shape == (100, 147, 10)
        labels[ex.label] += 1
        types[ex.variant_type] += 1
    # All three classes and both variant types are represented — the
    # round-2 failure mode was a corpus with ~one het / ~five indels.
    assert all(labels[c] > 5 for c in (0, 1, 2)), labels
    assert all(types[t] > 10 for t in (1, 2)), types

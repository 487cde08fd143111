"""Unit tests for the round-5 family-accuracy driver plumbing."""

import os

import numpy as np
import pytest


def test_non_colliding_guard():
    from deepvariant_tpu.training.simulate import SimVariant
    from deepvariant_tpu.training.simulate_family import _non_colliding

    taken = [
        SimVariant(100, "A", "T", (0, 1)),
        SimVariant(200, "ACGTACGTACG", "A", (0, 1)),  # 11 bp ref
    ]
    cands = [
        SimVariant(98, "C", "G", (0, 1)),    # inside guard of 100
        SimVariant(150, "C", "G", (0, 1)),   # clear
        SimVariant(209, "G", "C", (0, 1)),   # inside taken[1] interval
        SimVariant(215, "G", "C", (0, 1)),   # clear (guard 2)
    ]
    out = _non_colliding(cands, taken, guard=2)
    positions = [v.pos for v in out]
    assert 150 in positions and 215 in positions
    assert 98 not in positions and 209 not in positions


def test_transmit_deterministic_and_mendelian():
    from deepvariant_tpu.training.simulate_family import _transmit

    rng = np.random.default_rng(3)
    pos = np.arange(0, 1_000_000, 1000)
    t = _transmit(rng, pos, 0, 1_000_000, rate=1e-5)
    assert set(np.unique(t)) <= {0, 1}
    # crossovers are sorted switch points: consecutive equal runs
    switches = int((np.diff(t) != 0).sum())
    assert switches < 50  # Poisson(10) with wide margin


def test_merge_tfrecords_capped_stride(tmp_path):
    from deepvariant_tpu.io import tfrecord
    from deepvariant_tpu.scripts.accuracy_trio import (
        _merge_tfrecords_capped,
    )

    parts = []
    for p in range(3):
        path = str(tmp_path / f"part{p}.tfrecord.gz")
        with tfrecord.TFRecordWriter(path) as w:
            for i in range(50):
                w.write(bytes([p]) * 4 + i.to_bytes(2, "little"))
        parts.append(path)
    merged = str(tmp_path / "merged.tfrecord.gz")
    n = _merge_tfrecords_capped(parts, merged, cap=60)
    assert n == 60
    recs = list(tfrecord.read_tfrecords(merged))
    assert len(recs) == 60
    # Even stride across ALL parts, not a truncation to the first.
    sources = {r[0] for r in recs}
    assert sources == {0, 1, 2}
    # No cap -> plain merge of everything.
    n2 = _merge_tfrecords_capped(
        parts, str(tmp_path / "m2.tfrecord.gz"), cap=None
    )
    assert n2 == 150


def test_somatic_truth_class_convention(tmp_path):
    """truth_training encodes germline as 0/1 (class 1 = GERMLINE)
    and somatic as 1/1 (class 2 = SOMATIC) regardless of real
    zygosity — the WriteSomatic postprocess contract."""
    from deepvariant_tpu.io.vcf import VcfReader
    from deepvariant_tpu.training.simulate_family import (
        SomaticSimConfig,
        simulate_somatic_corpus,
    )

    sim = simulate_somatic_corpus(SomaticSimConfig(
        ref_path="/root/reference/deepvariant/testdata/input/"
                 "ucsc.hg19.chr20.unittest.fasta.gz",
        contig="chr20", windows=[(10_100_000, 10_130_000)], seed=5,
        coverage_tumor=8.0, coverage_normal=4.0,
    ), str(tmp_path))
    somatic_pos = {v.pos for v in sim["somatic_variants"]}
    with VcfReader(sim["truth_training"]) as r:
        recs = list(r)
    assert recs
    for rec in recs:
        gt = sorted(rec.calls[0].genotype)
        if rec.start in somatic_pos:
            assert gt == [1, 1], f"somatic at {rec.start} not 1/1"
        else:
            assert gt == [0, 1], f"germline at {rec.start} not 0/1"
    with VcfReader(sim["truth_somatic"]) as r:
        for rec in r:
            assert sorted(rec.calls[0].genotype) == [1, 1]
            assert "VAF" in rec.info


def test_resolve_channels_appends_without_dupes():
    from deepvariant_tpu.scripts.accuracy_longread import (
        resolve_channels,
    )

    assert resolve_channels("ont", "") is None
    chans = resolve_channels("ont", "16,17,26")
    # preset already has 26; appended set keeps order, no dupes
    assert chans.count(26) == 1
    assert chans[-2:] == [16, 17]

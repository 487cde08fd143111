"""Accuracy-demo scaffolding: fold geometry + ONT/trio stage-1 labels.

These pin the pieces of scripts/accuracy_{ont,deeptrio} that unit
tests can cover quickly: cross-eval fold construction (train/tune/
eval must tile the window without overlap) and training-mode label
correctness on known GIAB het sites (the full train->eval loops run
as offline artifacts, reported in ACCURACY.md).
"""

import os

import pytest

TRIO_TD = "/root/reference/deeptrio/testdata/input"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TRIO_TD), reason="deeptrio testdata unavailable"
)


def test_ont_fold_regions_tile_window():
    from deepvariant_tpu.scripts.accuracy_ont import (
        WINDOW,
        _fold_regions,
    )

    contig, lo, hi = WINDOW

    def spans(regions):
        out = []
        for r in regions:
            body = r.split(":", 1)[1]
            a, b = (int(x) for x in body.split("-"))
            out.append((a, b))
        return out

    for train_rs, tune_r, eval_r in _fold_regions(3):
        train = spans(train_rs)
        (tune,) = spans([tune_r])
        (ev,) = spans([eval_r])
        pieces = sorted(train + [tune, ev])
        # Tile the window exactly: no gaps, no overlaps.
        assert pieces[0][0] == lo
        assert pieces[-1][1] == hi
        for (_, e1), (s2, _) in zip(pieces, pieces[1:]):
            assert e1 == s2
        # Tune never overlaps eval.
        assert tune[1] <= ev[0] or tune[0] >= ev[1]


def test_ont_training_labels_match_giab_het_sites(tmp_path):
    """The ONT_R104 training flow labels the known GIAB v4.2.1 het
    cluster at chr20:5,067,400-5,068,100 as het (label 1)."""
    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        make_examples_runner,
    )
    from deepvariant_tpu.make_examples.presets import apply_model_preset
    from deepvariant_tpu.io import examples as exio, tfrecord

    out = str(tmp_path / "ont.tfrecord.gz")
    options = MakeExamplesOptions(
        reads_filename=f"{TRIO_TD}/HG002_R10_chr20_5050000_5075000.bam",
        ref_filename=(
            f"{TRIO_TD}/grch38.chr20_5050000_5075000.masked.fa.gz"
        ),
        examples_filename=out,
        mode="training",
        regions=["chr20:5067400-5068100"],
    )
    apply_model_preset(options, "ONT_R104")
    options.truth_variants_filename = (
        f"{TRIO_TD}/HG002_GRCh38_1_22_v4.2.1_benchmark.chr20.vcf.gz"
    )
    options.confident_regions_filename = (
        f"{TRIO_TD}/HG002_GRCh38_1_22_v4.2.1_benchmark.chr20.bed"
    )
    make_examples_runner(options)
    labels = {}
    for rec in tfrecord.read_tfrecords(out):
        ex = exio.parse_example(rec)
        labels[ex.variant.start] = ex.label
    for pos in (5067503, 5067603, 5067670, 5067709, 5068057):
        assert labels.get(pos) == 1, (pos, labels)


def test_trio_training_mode_labels_child_examples(tmp_path):
    """Multisample trio make_examples in training mode emits labeled
    300-row stacked child examples (HG001 truth)."""
    from deepvariant_tpu.make_examples.core import MakeExamplesOptions
    from deepvariant_tpu.make_examples.multisample import (
        make_multisample_examples_runner,
        trio_samples,
    )
    from deepvariant_tpu.io import examples as exio, tfrecord

    out = str(tmp_path / "child.tfrecord.gz")
    options = MakeExamplesOptions(
        reads_filename="",
        ref_filename=f"{TRIO_TD}/hs37d5.chr20.fa.gz",
        examples_filename=out,
        mode="training",
        regions=["20:10,000,000-10,004,000"],
        truth_variants_filename=(
            f"{TRIO_TD}/test_hg001_giab_grch37_chr20_100kbp_at_10mb"
            ".vcf.gz"
        ),
        confident_regions_filename=(
            f"{TRIO_TD}/test_giab.b37_chr20_100kbp_at_10mb.bed"
        ),
    )
    samples = trio_samples(
        reads_child=f"{TRIO_TD}/HG001.chr20.10_10p1mb_sorted.bam",
        reads_parent1=f"{TRIO_TD}/NA12891.chr20.10_10p1mb_sorted.bam",
        reads_parent2=f"{TRIO_TD}/NA12892.chr20.10_10p1mb_sorted.bam",
    )
    counts = make_multisample_examples_runner(
        options, samples, main_sample_index=1
    )
    assert counts["examples"] > 0
    seen_labels = set()
    for rec in tfrecord.read_tfrecords(out):
        ex = exio.parse_example(rec)
        assert ex.image.shape == (300, 221, 7)
        assert ex.label in (0, 1, 2)
        seen_labels.add(ex.label)
    assert seen_labels - {None}

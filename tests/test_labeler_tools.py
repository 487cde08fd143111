"""Tests for labeled_examples_to_vcf + compare_labelers tools.

Ports the behavioral pins of the reference's
labeler/labeled_examples_to_vcf_test.py (label->GT backfill, locus
dedup across alt combinations, unlabeled handling, sample-name
peek/override) and compare_labelers' diff semantics.
"""

import os

import numpy as np
import pytest

from deepvariant_tpu.core.types import Variant, VariantCall
from deepvariant_tpu.io import examples as examples_io
from deepvariant_tpu.io import tfrecord
from deepvariant_tpu.labeler import compare_labelers
from deepvariant_tpu.labeler import labeled_examples_to_vcf as le2v

REF_FASTA = (
    "/root/reference/deepvariant/testdata/input/hs37d5_chr20_1_1000000.fa.gz"
)


def _variant(start, ref, alts, gt=None, sample="HG001"):
    calls = []
    if gt is not None or sample:
        call = VariantCall(call_set_name=sample)
        if gt is not None:
            call.genotype = list(gt)
        calls.append(call)
    return Variant(
        reference_name="20",
        start=start,
        end=start + len(ref),
        reference_bases=ref,
        alternate_bases=list(alts),
        calls=calls,
    )


def _example(variant, alt_indices=(0,), label=None):
    img = np.zeros((4, 5, 3), np.uint8)
    return examples_io.make_example(
        variant,
        img,
        list(alt_indices),
        f"20:{variant.start + 1}-{variant.end}",
        label=label,
    )


def _write(path, records):
    tfrecord.write_tfrecords(records, path)


class TestExamplesToVariants:
    def test_label_backfills_gt(self, tmp_path):
        path = str(tmp_path / "ex.tfrecord.gz")
        _write(path, [
            _example(_variant(10, "A", ["C"]), label=0),
            _example(_variant(20, "A", ["C"]), label=1),
            _example(_variant(30, "A", ["C"]), label=2),
        ])
        got = list(le2v.examples_to_variants(path))
        assert [v.calls[0].genotype for v in got] == [[0, 0], [0, 1], [1, 1]]

    def test_existing_gt_wins_over_label(self, tmp_path):
        path = str(tmp_path / "ex.tfrecord.gz")
        _write(path, [_example(_variant(10, "A", ["C"], gt=(1, 1)), label=1)])
        (got,) = list(le2v.examples_to_variants(path))
        assert got.calls[0].genotype == [1, 1]

    def test_multiallelic_locus_deduped(self, tmp_path):
        # Three examples per multiallelic site (alt combos) -> one VCF row.
        v = _variant(10, "A", ["C", "G"])
        path = str(tmp_path / "ex.tfrecord.gz")
        _write(path, [
            _example(v, alt_indices=[0], label=1),
            _example(v, alt_indices=[1], label=1),
            _example(v, alt_indices=[0, 1], label=2),
        ])
        got = list(le2v.examples_to_variants(path))
        assert len(got) == 1

    def test_sorted_by_coordinate(self, tmp_path):
        path = str(tmp_path / "ex.tfrecord.gz")
        _write(path, [
            _example(_variant(30, "A", ["C"]), label=1),
            _example(_variant(10, "A", ["C"]), label=1),
            _example(_variant(20, "A", ["C"]), label=1),
        ])
        got = list(le2v.examples_to_variants(path))
        assert [v.start for v in got] == [10, 20, 30]

    def test_unlabeled_raises_by_default(self, tmp_path):
        path = str(tmp_path / "ex.tfrecord.gz")
        _write(path, [_example(_variant(10, "A", ["C"]))])
        with pytest.raises(ValueError, match="neither a genotype nor a label"):
            list(le2v.examples_to_variants(path))

    def test_unlabeled_allowed_writes_missing_gt(self, tmp_path):
        path = str(tmp_path / "ex.tfrecord.gz")
        _write(path, [_example(_variant(10, "A", ["C"]))])
        (got,) = list(le2v.examples_to_variants(path, allow_unlabeled=True))
        assert got.calls[0].genotype == [-1, -1]

    def test_bad_label_raises(self, tmp_path):
        path = str(tmp_path / "ex.tfrecord.gz")
        _write(path, [_example(_variant(10, "A", ["C"]), label=3)])
        with pytest.raises(ValueError, match="invalid label"):
            list(le2v.examples_to_variants(path))

    def test_max_records(self, tmp_path):
        path = str(tmp_path / "ex.tfrecord.gz")
        _write(path, [
            _example(_variant(10 * i, "A", ["C"]), label=1) for i in range(1, 6)
        ])
        got = list(le2v.examples_to_variants(path, max_records=2))
        assert len(got) == 2


class TestEndToEndVcf:
    def test_writes_vcf_with_peeked_sample(self, tmp_path):
        if not os.path.exists(REF_FASTA):
            pytest.skip("reference testdata not available")
        path = str(tmp_path / "ex.tfrecord.gz")
        _write(path, [
            _example(_variant(10, "A", ["C"], sample="NA12878"), label=1),
            _example(_variant(20, "AC", ["A"], sample="NA12878"), label=2),
        ])
        out = str(tmp_path / "out.vcf")
        n = le2v.run(path, REF_FASTA, out)
        assert n == 2
        lines = open(out).read().splitlines()
        header = [l for l in lines if l.startswith("#CHROM")]
        assert header and header[0].endswith("NA12878")
        body = [l for l in lines if not l.startswith("#")]
        assert len(body) == 2
        assert body[0].split("\t")[1] == "11"  # 1-based position
        gt0 = body[0].split("\t")[9].split(":")[0]
        gt1 = body[1].split("\t")[9].split(":")[0]
        assert (gt0, gt1) == ("0/1", "1/1")

    def test_sample_name_override_and_cli(self, tmp_path):
        if not os.path.exists(REF_FASTA):
            pytest.skip("reference testdata not available")
        path = str(tmp_path / "ex.tfrecord.gz")
        _write(path, [_example(_variant(10, "A", ["C"]), label=1)])
        out = str(tmp_path / "out.vcf")
        rc = le2v.main([
            "--examples", path, "--ref", REF_FASTA, "--output_vcf", out,
            "--sample_name", "CUSTOM",
        ])
        assert rc == 0
        header = [l for l in open(out) if l.startswith("#CHROM")][0]
        assert header.rstrip().endswith("CUSTOM")


class TestCompareLabelers:
    def test_variant_key_sorts_alleles(self):
        v = _variant(10, "AC", ["ACC", "A"])
        assert compare_labelers.variant_key(v) == "20:11:AC->A/ACC"
        assert (
            compare_labelers.variant_key(v, sort_alleles=False)
            == "20:11:AC->ACC/A"
        )

    def test_diff_report(self, tmp_path):
        a = str(tmp_path / "a.tfrecord.gz")
        b = str(tmp_path / "b.tfrecord.gz")
        same = _variant(10, "A", ["C"], gt=(0, 1))
        # Same genotype in a different order is NOT a difference.
        flip_a = _variant(20, "A", ["G"], gt=(1, 0))
        flip_b = _variant(20, "A", ["G"], gt=(0, 1))
        diff_a = _variant(30, "A", ["T"], gt=(0, 1))
        diff_b = _variant(30, "A", ["T"], gt=(1, 1))
        only_a = _variant(40, "A", ["C"], gt=(0, 0))
        _write(a, [_example(v) for v in (same, flip_a, diff_a, only_a)])
        _write(b, [_example(v) for v in (same, flip_b, diff_b)])

        labels_a = compare_labelers.read_example_labels(a)
        labels_b = compare_labelers.read_example_labels(b)
        out = str(tmp_path / "diffs.txt")
        n = compare_labelers.write_differences(labels_a, labels_b, out)
        assert n == 2  # diff site + a-only site
        text = open(out).read()
        assert "20:31:A->T" in text and "20:41:A->C" in text
        assert "20:21:A->G" not in text

    def test_cli(self, tmp_path):
        a = str(tmp_path / "a.tfrecord.gz")
        b = str(tmp_path / "b.tfrecord.gz")
        _write(a, [_example(_variant(10, "A", ["C"], gt=(0, 1)))])
        _write(b, [_example(_variant(10, "A", ["C"], gt=(1, 1)))])
        out = str(tmp_path / "d.txt")
        rc = compare_labelers.main([
            "--labeled_examples_a", a, "--labeled_examples_b", b,
            "--output", out,
        ])
        assert rc == 0
        assert "Variant: 20:11:A->C" in open(out).read()

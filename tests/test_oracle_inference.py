"""run_oracle_inference one-step CLI (reference
scripts/run_oracle_inference.py): training-mode make_examples +
labeled_examples_to_vcf, run for real on the chr20 testdata slice."""

import os

import pytest

TESTDATA = "/root/reference/deepvariant/testdata"
BAM = f"{TESTDATA}/input/NA12878_S1.chr20.10_10p1mb.bam"
REF = f"{TESTDATA}/input/ucsc.hg19.chr20.unittest.fasta.gz"
TRUTH_VCF = f"{TESTDATA}/input/test_nist.b37_chr20_100kbp_at_10mb.vcf.gz"
TRUTH_BED = f"{TESTDATA}/input/test_nist.b37_chr20_100kbp_at_10mb.bed"
REGION = "chr20:10,000,000-10,010,000"


def test_extra_args_parsing():
    from deepvariant_tpu.scripts.run_oracle_inference import (
        extra_args_to_argv,
    )

    assert extra_args_to_argv(None) == []
    assert extra_args_to_argv(
        "phase_reads=true,realign_reads=false,min_base_quality=7"
    ) == ["--phase_reads", "--no-realign_reads",
          "--min_base_quality", "7"]
    # Quoted values may contain commas.
    assert extra_args_to_argv("regions='chr20:1-5,chr20:9-12'") == [
        "--regions", "chr20:1-5,chr20:9-12"
    ]


def test_dry_run_prints_without_running(tmp_path, capsys):
    from deepvariant_tpu.scripts.run_oracle_inference import main

    out_vcf = str(tmp_path / "oracle.vcf.gz")
    rc = main([
        "--model_type", "PACBIO",
        "--ref", REF,
        "--reads", BAM,
        "--output_vcf", out_vcf,
        "--truth_variants", TRUTH_VCF,
        "--confident_regions", TRUTH_BED,
        "--intermediate_results_dir", str(tmp_path / "inter"),
        "--dry_run",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    # Long-read preset partition size (run_oracle_inference.py:311-313).
    assert "--partition_size 25000" in text
    assert "--max_reads_per_partition 1500" in text
    assert "--mode training" in text
    assert not os.path.exists(out_vcf)


@pytest.mark.integration
def test_oracle_inference_end_to_end(tmp_path):
    """Oracle VCF genotypes must match the truth set exactly inside
    the confident regions: the labels ARE the truth."""
    from deepvariant_tpu.scripts.run_oracle_inference import main
    from deepvariant_tpu.io.vcf import VcfReader

    out_vcf = str(tmp_path / "oracle.vcf.gz")
    rc = main([
        "--model_type", "WGS",
        "--ref", REF,
        "--reads", BAM,
        "--output_vcf", out_vcf,
        "--truth_variants", TRUTH_VCF,
        "--confident_regions", TRUTH_BED,
        "--labeler_algorithm", "positional_labeler",
        "--regions", REGION,
        "--sample_name", "oracle_sample",
        "--num_shards", "2",
        "--intermediate_results_dir", str(tmp_path / "inter"),
        "--logging_dir", str(tmp_path / "logs"),
    ])
    assert rc == 0
    assert os.path.exists(out_vcf)
    assert os.path.exists(out_vcf + ".tbi")
    assert os.path.exists(
        str(tmp_path / "logs" / "make_examples.log")
    )

    truth = {}
    with VcfReader(TRUTH_VCF) as r:
        for v in r:
            if v.start < 10_000_000 or v.start >= 10_010_000:
                continue
            gt = sorted(v.calls[0].genotype) if v.calls else None
            truth[(v.reference_name, v.start)] = (
                v.reference_bases, v.alternate_bases, gt
            )
    assert truth, "fixture must cover truth variants"

    n_called = n_overlap = n_truth_matched = 0
    with VcfReader(out_vcf) as r:
        for v in r:
            n_called += 1
            assert v.calls and v.calls[0].call_set_name == "oracle_sample"
            key = (v.reference_name, v.start)
            if key not in truth:
                continue
            n_overlap += 1
            t_ref, t_alts, t_gt = truth[key]
            called_gt = sorted(v.calls[0].genotype)
            called_alleles = sorted(
                ([v.reference_bases] + list(v.alternate_bases))[i]
                for i in called_gt
            )
            truth_alleles = sorted(
                ([t_ref] + list(t_alts))[i] for i in t_gt
            )
            if called_alleles == truth_alleles:
                n_truth_matched += 1
    assert n_called > 0
    # The oracle property: candidates co-located with a truth variant
    # must carry the truth genotype. (Truth sites with no candidate —
    # coverage/representation misses — are a candidate-generation
    # question, not a labeling one, and are not penalized here.)
    assert n_overlap >= 30
    assert n_truth_matched >= 0.9 * n_overlap

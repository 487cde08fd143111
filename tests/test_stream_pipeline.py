"""Fused streaming pipeline: VCF parity with the staged pipeline.

The product contract (reference fast_pipeline.cc:248): a streamed run
— make_examples workers feeding device inference directly, CVOs held
in memory, no intermediate example/CVO files — must emit a VCF
byte-identical to the three-stage TFRecord-glued run.
"""

import os

import numpy as np
import pytest

TESTDATA = "/root/reference/deepvariant/testdata"
READS = f"{TESTDATA}/input/NA12878_S1.chr20.10_10p1mb.bam"
REF = f"{TESTDATA}/input/ucsc.hg19.chr20.unittest.fasta.gz"
REGION = "chr20:10,000,000-10,006,000"


def _read_vcf_bytes(path: str) -> bytes:
    from deepvariant_tpu.io.bgzf import BgzfReader

    return BgzfReader(path).read_all()


def test_postprocess_accepts_in_memory_cvos(tmp_path):
    """postprocess_variants(list-of-CVOs) == postprocess_variants(file)."""
    from deepvariant_tpu.core.types import (
        CallVariantsOutput,
        ContigInfo,
        Variant,
        VariantCall,
    )
    from deepvariant_tpu.io.tfrecord import TFRecordWriter
    from deepvariant_tpu.postprocess.pipeline import postprocess_variants

    contigs = [ContigInfo("chr20", 63_025_520, 0)]
    cvos = []
    for i, (start, probs) in enumerate([
        (10_000_100, [0.05, 0.9, 0.05]),
        (10_000_050, [0.1, 0.2, 0.7]),   # out of order on purpose
        (10_000_200, [0.98, 0.01, 0.01]),
    ]):
        cvos.append(CallVariantsOutput(
            variant=Variant(
                reference_name="chr20", start=start, end=start + 1,
                reference_bases="A", alternate_bases=["T"],
                calls=[VariantCall(call_set_name="S")],
            ),
            alt_allele_indices=[0],
            genotype_probabilities=probs,
        ))
    cvo_file = str(tmp_path / "cvo.tfrecord.gz")
    with TFRecordWriter(cvo_file) as w:
        for c in cvos:
            w.write(c.encode())

    out_a = str(tmp_path / "from_file.vcf.gz")
    out_b = str(tmp_path / "from_memory.vcf.gz")
    postprocess_variants(cvo_file, out_a, contigs, sample_name="S")
    postprocess_variants(list(cvos), out_b, contigs, sample_name="S")
    assert _read_vcf_bytes(out_a) == _read_vcf_bytes(out_b)


@pytest.mark.integration
def test_stream_matches_staged_pipeline(tmp_path, capsys):
    """run_deepvariant --stream on real chr20 data emits the exact VCF
    of the staged run (same flags, uninitialized model, 2 workers) —
    with BOTH stream encoders: 'device' (workers ship candidate plans,
    the TPU paints pileups fused with the CNN) and 'host' (workers
    paint images). WGS is device-encodable, so auto == device."""
    import deepvariant_tpu.scripts.run_deepvariant as rdv

    staged_vcf = str(tmp_path / "staged.vcf.gz")
    common = [
        "--reads", READS,
        "--ref", REF,
        "--regions", REGION,
        "--num_shards", "2",
        "--batch_size", "8",
        "--allow_uninitialized_model",
        "--sample_name", "NA12878",
    ]
    rc = rdv.main(common + [
        "--output_vcf", staged_vcf,
        "--intermediate_results_dir", str(tmp_path / "staged_inter"),
    ])
    assert rc == 0
    staged = _read_vcf_bytes(staged_vcf)
    capsys.readouterr()
    for encoder in ("auto", "host"):
        stream_vcf = str(tmp_path / f"stream_{encoder}.vcf.gz")
        rc = rdv.main(common + [
            "--stream", "--stream_encoder", encoder,
            "--output_vcf", stream_vcf,
        ])
        assert rc == 0
        out = capsys.readouterr().out
        expected = "device" if encoder == "auto" else "host"
        assert f"encoder={expected}" in out
        assert staged == _read_vcf_bytes(stream_vcf), encoder
    # And genuinely no intermediate example/CVO file was produced.
    produced = {
        name for name in os.listdir(str(tmp_path))
        if "tfrecord" in name
    }
    assert not produced


@pytest.mark.integration
def test_stream_gvcf_and_small_model_match_staged(tmp_path):
    """--stream --output_gvcf --call_small_model_examples is a drop-in
    replacement: gVCF records and small-model CVOs travel the worker
    queues (no TFRecords) and both output files are byte-identical to
    the staged pipeline's."""
    import deepvariant_tpu.scripts.run_deepvariant as rdv

    staged_vcf = str(tmp_path / "staged.vcf.gz")
    staged_gvcf = str(tmp_path / "staged.g.vcf.gz")
    stream_vcf = str(tmp_path / "stream.vcf.gz")
    stream_gvcf = str(tmp_path / "stream.g.vcf.gz")
    common = [
        "--reads", READS,
        "--ref", REF,
        "--regions", "chr20:10,000,000-10,004,000",
        "--num_shards", "2",
        "--batch_size", "8",
        "--allow_uninitialized_model",
        "--sample_name", "NA12878",
        "--call_small_model_examples",
    ]
    rc = rdv.main(common + [
        "--output_vcf", staged_vcf,
        "--output_gvcf", staged_gvcf,
        "--intermediate_results_dir", str(tmp_path / "staged_inter"),
    ])
    assert rc == 0
    rc = rdv.main(common + [
        "--stream",
        "--output_vcf", stream_vcf,
        "--output_gvcf", stream_gvcf,
    ])
    assert rc == 0
    assert _read_vcf_bytes(staged_vcf) == _read_vcf_bytes(stream_vcf)
    assert _read_vcf_bytes(staged_gvcf) == _read_vcf_bytes(stream_gvcf)

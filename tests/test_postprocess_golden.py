"""Stage-3 golden parity: postprocess on the reference's golden CVO
input must reproduce its golden VCF and gVCF byte-for-byte
(postprocess_variants_test.py:320-335 equivalent acceptance)."""

import os

import pytest

from deepvariant_tpu.core.types import Range
from deepvariant_tpu.io.fasta import FastaReader
from deepvariant_tpu.postprocess.pipeline import postprocess_variants


def _body(path):
    return [l for l in open(path) if not l.startswith("#")]


@pytest.mark.integration
def test_golden_vcf_and_gvcf_byte_parity(testdata_dir, tmp_path):
    ref = FastaReader(
        os.path.join(testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz")
    )

    def ref_lookup(contig, pos):
        return ref.query(Range(contig, pos, pos + 1))

    out_vcf = str(tmp_path / "out.vcf")
    out_gvcf = str(tmp_path / "out.g.vcf")
    stats = postprocess_variants(
        os.path.join(
            testdata_dir,
            "golden.postprocess_single_site_input-00000-of-00001"
            ".tfrecord.gz",
        ),
        out_vcf,
        ref.contigs,
        sample_name="NA12878",
        nonvariant_site_path=os.path.join(
            testdata_dir, "golden.postprocess_gvcf_input.tfrecord.gz"
        ),
        output_gvcf=out_gvcf,
        ref_lookup=ref_lookup,
    )
    assert stats["vcf_records"] == 78

    golden_vcf = _body(os.path.join(
        testdata_dir, "golden.postprocess_single_site_output.vcf"
    ))
    assert _body(out_vcf) == golden_vcf

    golden_gvcf = _body(os.path.join(
        testdata_dir, "golden.postprocess_gvcf_output.g.vcf"
    ))
    assert _body(out_gvcf) == golden_gvcf


@pytest.mark.integration
def test_sharded_input_with_empty_shards(testdata_dir, tmp_path):
    """Empty CVO shards must not crash or change output
    (postprocess_variants_test.py:481
    test_reading_sharded_input_with_empty_shards_does_not_crash)."""
    from deepvariant_tpu.core.types import ContigInfo
    from deepvariant_tpu.io.tfrecord import TFRecordWriter, read_tfrecords

    src = os.path.join(
        testdata_dir,
        "golden.postprocess_single_site_input-00000-of-00001.tfrecord.gz",
    )
    with TFRecordWriter(
        str(tmp_path / "cvo-00000-of-00002.tfrecord.gz")
    ) as w:
        for rec in read_tfrecords(src):
            w.write(rec)
    with TFRecordWriter(
        str(tmp_path / "cvo-00001-of-00002.tfrecord.gz")
    ):
        pass
    out = str(tmp_path / "out.vcf")
    stats = postprocess_variants(
        str(tmp_path / "cvo@2.tfrecord.gz"), out,
        [ContigInfo("chr20", 63_025_520, 0)], sample_name="HG002",
    )
    assert stats["vcf_records"] == 78


def test_vcf_candidate_importer_postprocess_byte_parity(
    testdata_dir, tmp_path
):
    """postprocess --no-group_variants on the importer CVOs is
    byte-identical to the reference golden (22/22 lines)."""
    from deepvariant_tpu.io.fasta import FastaReader
    from deepvariant_tpu.postprocess.pipeline import (
        postprocess_variants,
    )

    ref = FastaReader(os.path.join(
        testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
    ))
    out = str(tmp_path / "vci.vcf")
    postprocess_variants(
        os.path.join(
            testdata_dir,
            "golden.vcf_candidate_importer_postprocess_single_site_"
            "input-00000-of-00001.tfrecord.gz",
        ),
        out,
        ref.contigs,
        sample_name="NA12878",
        group_variants=False,
    )
    golden_path = os.path.join(
        testdata_dir,
        "golden.vcf_candidate_importer_postprocess_single_site_"
        "output.vcf",
    )
    golden_lines = [
        l for l in open(golden_path) if not l.startswith("#")
    ]
    mine = [l for l in open(out) if not l.startswith("#")]
    assert len(mine) == len(golden_lines) == 22
    assert mine == golden_lines

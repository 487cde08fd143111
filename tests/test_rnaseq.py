"""RNASEQ model type: spliced (N-CIGAR) alignments end to end.

The reference exposes RNASEQ in run_deepvariant (run_deepvariant.py:
63-64,307-308) with split_skip_reads=true as the critical
make_examples flag (docs/deepvariant-rnaseq-case-study.md:230-236,
realigner.py:230). These tests build a spliced BAM over the real chr20
reference and drive the one-step CLI with --model_type RNASEQ.
"""

import os

import pytest

from deepvariant_tpu.core.types import Range, Read
from deepvariant_tpu.io.bam_writer import BamWriter, build_bam_index
from deepvariant_tpu.io.fasta import FastaReader

TESTDATA = "/root/reference/deepvariant/testdata"
REF = f"{TESTDATA}/input/ucsc.hg19.chr20.unittest.fasta.gz"

_OP_M, _OP_N = 1, 4

EXON1 = (10_010_000, 10_010_050)
EXON2 = (10_010_250, 10_010_300)
SNP_POS = 10_010_270


def _make_spliced_bam(path: str) -> str:
    """Paired spliced reads across a 200 bp intron; half the reads
    carry an alt SNP in exon 2 (a het through spliced alignments)."""
    ref_reader = FastaReader(REF)
    e1 = ref_reader.query(Range("chr20", *EXON1)).upper()
    e2 = ref_reader.query(Range("chr20", *EXON2)).upper()
    ref_base = e2[SNP_POS - EXON2[0]]
    alt_base = "A" if ref_base != "A" else "C"
    reads = []
    for i in range(30):
        use_alt = i % 2 == 0
        exon2_seq = (
            e2[: SNP_POS - EXON2[0]]
            + (alt_base if use_alt else ref_base)
            + e2[SNP_POS - EXON2[0] + 1:]
        )
        seq = e1 + exon2_seq
        reads.append(Read(
            fragment_name=f"rna{i}",
            aligned_sequence=seq,
            aligned_quality=bytes([35] * len(seq)),
            reference_name="chr20",
            position=EXON1[0],
            mapping_quality=60,
            cigar=[
                (_OP_M, EXON1[1] - EXON1[0]),
                (_OP_N, EXON2[0] - EXON1[1]),
                (_OP_M, EXON2[1] - EXON2[0]),
            ],
            reverse_strand=i % 4 >= 2,
            read_number=0,
            number_reads=1,
        ))
    writer = BamWriter(path, ref_reader.contigs, sample_name="RNA")
    for rd in reads:
        writer.write_read(rd)
    writer.close()
    build_bam_index(path)
    return alt_base


def test_rnaseq_preset_sets_split_skip_reads():
    from deepvariant_tpu.make_examples.core import MakeExamplesOptions
    from deepvariant_tpu.make_examples.presets import apply_model_preset

    options = MakeExamplesOptions()
    apply_model_preset(options, "RNASEQ")
    assert options.realigner_options.split_skip_reads
    assert tuple(options.pileup_options.channels) == (1, 2, 3, 4, 5, 6)


def test_all_seven_reference_model_types_accepted():
    import deepvariant_tpu.scripts.run_deepvariant as rdv

    # run_deepvariant.py:63-64 — the reference's full model-type set.
    assert set(rdv.MODEL_TYPES) == {
        "WGS", "WES", "PACBIO", "ONT_R104", "HYBRID_PACBIO_ILLUMINA",
        "MASSEQ", "RNASEQ",
    }
    parser = rdv.build_parser()
    for mt in rdv.MODEL_TYPES:
        args = parser.parse_args([
            "--model_type", mt, "--ref", "r", "--reads", "b",
            "--output_vcf", "o.vcf.gz",
        ])
        assert args.model_type == mt


def test_split_skip_reads_cli_flag_reaches_realigner():
    from deepvariant_tpu.scripts.make_examples import (
        build_parser,
        options_from_args,
    )

    args = build_parser().parse_args([
        "--mode", "calling", "--reads", "x.bam", "--ref", "r.fa",
        "--examples", "e.gz", "--split_skip_reads",
    ])
    options = options_from_args(args)
    assert options.realigner_options.split_skip_reads


@pytest.mark.integration
def test_rnaseq_end_to_end_spliced_bam(tmp_path):
    """One-step RNASEQ run over a spliced BAM: the het SNP reachable
    only through N-CIGAR reads must surface as a candidate and a VCF
    row; every emitted example must carry the RNASEQ channel set."""
    import deepvariant_tpu.scripts.run_deepvariant as rdv

    bam = str(tmp_path / "rna.bam")
    _make_spliced_bam(bam)
    out_vcf = str(tmp_path / "out.vcf.gz")
    inter = str(tmp_path / "intermediate")
    rc = rdv.main([
        "--model_type", "RNASEQ",
        "--reads", bam,
        "--ref", REF,
        "--regions", "chr20:10,009,900-10,010,400",
        "--output_vcf", out_vcf,
        "--num_shards", "1",
        "--batch_size", "8",
        "--allow_uninitialized_model",
        "--intermediate_results_dir", inter,
    ])
    assert rc == 0

    from deepvariant_tpu.io.vcf import VcfReader

    positions = {v.start for v in VcfReader(out_vcf)}
    assert SNP_POS in positions

    # The intermediate examples carry the RNASEQ 6-channel contract.
    import glob
    import json

    info_files = glob.glob(os.path.join(inter, "*.example_info.json"))
    assert info_files
    with open(info_files[0]) as f:
        info = json.load(f)
    assert info["shape"][2] == 6
    assert info["channels"] == [1, 2, 3, 4, 5, 6]

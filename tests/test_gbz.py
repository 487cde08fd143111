"""GBZ pangenome container tests: simple-sds roundtrip, GBWT path
extraction, haplotype-panel projection, and pipeline integration."""

import os

import numpy as np
import pytest

from deepvariant_tpu.core.types import Range
from deepvariant_tpu.io.gbz import (
    GbwtMetadata,
    PathName,
    read_gbz,
    write_gbz,
)


def gnode(node, reverse=False):
    return (node << 1) | int(reverse)


@pytest.fixture()
def tiny_gbz(tmp_path):
    """A bubble graph over one contig:

    ref:   1(ACGTA) - 2(C) - 4(GGAT) - 6(TT)  - 7(ACGT)
    hap1:  1        - 3(T) - 4       - 6      - 7        (SNP C->T)
    hap2:  1        - 2    - 4       - 5(AA) - 6 - 7     (insertion)
    hap3:  1        - 2    - 4       - 7                 (deletion TT)
    """
    node_sequences = {
        1: "ACGTA", 2: "C", 3: "T", 4: "GGAT", 5: "AA", 6: "TT",
        7: "ACGT",
    }
    paths = [
        [gnode(1), gnode(2), gnode(4), gnode(6), gnode(7)],   # ref
        [gnode(1), gnode(3), gnode(4), gnode(6), gnode(7)],   # hap1
        [gnode(1), gnode(2), gnode(4), gnode(5), gnode(6), gnode(7)],
        [gnode(1), gnode(2), gnode(4), gnode(7)],             # hap3
    ]
    metadata = GbwtMetadata(
        sample_names=["GRCh38", "HG002", "HG002", "HG003"],
        contig_names=["chr20"],
        path_names=[
            PathName(sample=0, contig=0, phase=0, fragment=0),
            PathName(sample=1, contig=0, phase=1, fragment=0),
            PathName(sample=2, contig=0, phase=2, fragment=0),
            PathName(sample=3, contig=0, phase=1, fragment=0),
        ],
    )
    path = str(tmp_path / "tiny.gbz")
    write_gbz(path, node_sequences, paths, metadata)
    return path, node_sequences, paths


def test_roundtrip_paths_and_metadata(tiny_gbz):
    path, node_sequences, paths = tiny_gbz
    gbz = read_gbz(path)
    assert gbz.gbwt.sequences == 4
    md = gbz.gbwt.metadata
    assert md.sample_names == ["GRCh38", "HG002", "HG002", "HG003"]
    assert md.contig_names == ["chr20"]
    for seq_id, expected in enumerate(paths):
        assert gbz.path_nodes(seq_id) == expected
    assert gbz.path_bases(0) == "ACGTA" + "C" + "GGAT" + "TT" + "ACGT"
    assert gbz.path_bases(1) == "ACGTA" + "T" + "GGAT" + "TT" + "ACGT"
    assert gbz.path_bases(3) == "ACGTA" + "C" + "GGAT" + "ACGT"


def test_reverse_complement_orientation(tmp_path):
    node_sequences = {1: "ACGTA", 2: "GGC", 3: "TT"}
    paths = [
        [gnode(1), gnode(2), gnode(3)],
        [gnode(1), gnode(2, reverse=True), gnode(3)],
    ]
    metadata = GbwtMetadata(
        sample_names=["GRCh38", "S1"],
        contig_names=["c"],
        path_names=[PathName(0, 0, 0, 0), PathName(1, 0, 1, 0)],
    )
    path = str(tmp_path / "rc.gbz")
    write_gbz(path, node_sequences, paths, metadata)
    gbz = read_gbz(path)
    assert gbz.path_bases(0) == "ACGTA" + "GGC" + "TT"
    assert gbz.path_bases(1) == "ACGTA" + "GCC" + "TT"


def test_haplotype_projection(tiny_gbz):
    path, _, _ = tiny_gbz
    gbz = read_gbz(path)
    reads = gbz.haplotype_reads("GRCh38")
    by_name = {r.fragment_name: r for r in reads}
    assert len(reads) == 3
    # hap1: SNP bubble -> del 1 + ins 1 around node 2's slot, flanked
    # by matches (node-anchored projection).
    hap1 = by_name["HG002_chr20_1_0"]
    assert hap1.position == 0
    assert hap1.aligned_sequence == "ACGTATGGATTTACGT"
    # 5M (node1), bubble: 1D+1I (T replaces C), 4M+2M+4M
    ops = hap1.cigar
    ref_span = sum(l for op, l in ops if op in (1, 3, 4, 8, 9))
    assert ref_span == 16  # full reference length
    # hap2: pure insertion of AA between nodes 4 and 6.
    hap2 = by_name["HG002_chr20_2_0"]
    assert hap2.aligned_sequence == "ACGTACGGATAATTACGT"
    assert (2, 2) in [tuple(x) for x in hap2.cigar]  # 2I
    # hap3: deletion of TT.
    hap3 = by_name["HG003_chr20_1_0"]
    assert hap3.aligned_sequence == "ACGTACGGATACGT"
    assert (3, 2) in [tuple(x) for x in hap3.cigar]  # 2D


def test_extract_panel_bam_and_pipeline(tmp_path, tiny_gbz):
    """GBZ -> panel BAM -> readable with our BamReader; positions and
    sequences survive the round trip."""
    from deepvariant_tpu.io.bam import BamReader
    from deepvariant_tpu.io.gbz import extract_panel_bam

    gbz_path, _, _ = tiny_gbz
    # The contig must exist in the FASTA; write a matching one.
    ref_seq = "ACGTA" + "C" + "GGAT" + "TT" + "ACGT"
    fa_path = str(tmp_path / "ref.fa")
    with open(fa_path, "w") as f:
        f.write(">chr20\n" + ref_seq + "\n")
    # faidx sidecar.
    with open(fa_path + ".fai", "w") as f:
        f.write(f"chr20\t{len(ref_seq)}\t7\t{len(ref_seq)}\t"
                f"{len(ref_seq) + 1}\n")
    out_bam = str(tmp_path / "panel.bam")
    extract_panel_bam(gbz_path, fa_path, out_bam,
                      reference_sample="GRCh38")
    reader = BamReader(out_bam)
    batch = reader.query(Range("chr20", 0, len(ref_seq)))
    assert len(batch) == 3
    seqs = {bytes(batch.seq_of(i)).decode() for i in range(3)}
    assert "ACGTATGGATTTACGT" in seqs
    assert "ACGTACGGATAATTACGT" in seqs

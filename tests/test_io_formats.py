"""BAM writer + BED/bedGraph/FASTQ/GFF IO tests."""

import os

import numpy as np
import pytest

from deepvariant_tpu.core.types import ContigInfo, Range, Read
from deepvariant_tpu.core.cigar import parse_cigar_string
from deepvariant_tpu.io.bam import BamReader
from deepvariant_tpu.io.bam_writer import BamWriter
from deepvariant_tpu.io.genomics_io import (
    BedGraphReader,
    BedGraphRecord,
    BedGraphWriter,
    BedReader,
    BedRecord,
    BedWriter,
    FastqReader,
    FastqRecord,
    FastqWriter,
    GffReader,
    GffRecord,
    GffWriter,
)


class TestBamWriter:
    def test_write_reads_roundtrip(self, tmp_path):
        contigs = [ContigInfo("chr1", 10000, 0)]
        reads = [
            Read(
                fragment_name=f"read{i}",
                aligned_sequence="ACGTACGTAC",
                aligned_quality=bytes([30] * 10),
                reference_name="chr1",
                position=100 + i,
                mapping_quality=60,
                cigar=parse_cigar_string("5M2I3M"),
                reverse_strand=(i % 2 == 1),
            )
            for i in range(5)
        ]
        path = str(tmp_path / "out.bam")
        with BamWriter(path, contigs) as w:
            for r in reads:
                w.write_read(r)
        back = BamReader(path).iterate()
        assert len(back) == 5
        assert back.name == [f"read{i}" for i in range(5)]
        np.testing.assert_array_equal(
            back.pos, np.arange(100, 105)
        )
        assert back.seq_of(0).tobytes() == b"ACGTACGTAC"
        assert bool(back.is_reverse()[1])
        ops, lens = back.cigar_of(0)
        assert lens.tolist() == [5, 2, 3]

    @pytest.mark.integration
    def test_real_bam_roundtrip(self, testdata_dir, tmp_path):
        src = BamReader(os.path.join(
            testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
        ))
        batch = src.query(Range("chr20", 10_000_000, 10_001_000))
        path = str(tmp_path / "rt.bam")
        with BamWriter(path, src.header.contigs) as w:
            w.write_batch(batch)
        back = BamReader(path).iterate()
        assert len(back) == len(batch)
        assert back.name == batch.name
        np.testing.assert_array_equal(back.seq, batch.seq)
        np.testing.assert_array_equal(back.qual, batch.qual)
        np.testing.assert_array_equal(back.cigar_ops, batch.cigar_ops)
        assert back.aux == batch.aux


class TestBed:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.bed")
        recs = [
            BedRecord("chr1", 10, 20, "feat1", 0.5, "+"),
            BedRecord("chr2", 30, 40, "feat2", 1.0, "-"),
        ]
        with BedWriter(path, num_fields=6) as w:
            for r in recs:
                w.write(r)
        back = list(BedReader(path))
        assert [(r.reference_name, r.start, r.end, r.name, r.strand)
                for r in back] == [
            ("chr1", 10, 20, "feat1", "+"),
            ("chr2", 30, 40, "feat2", "-"),
        ]

    def test_gzip_and_comments(self, tmp_path):
        import gzip

        path = str(tmp_path / "x.bed.gz")
        with gzip.open(path, "wt") as f:
            f.write("# comment\ntrack name=x\nchr1\t5\t9\n")
        back = list(BedReader(path))
        assert len(back) == 1 and back[0].start == 5


class TestBedGraph:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.bedgraph")
        with BedGraphWriter(path) as w:
            w.write(BedGraphRecord("chr1", 0, 100, 12.5))
        back = list(BedGraphReader(path))
        assert back[0].data_value == 12.5


class TestFastq:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.fastq")
        recs = [
            FastqRecord("r1", "desc here", "ACGT", "IIII"),
            FastqRecord("r2", "", "GGCC", "!!!!"),
        ]
        with FastqWriter(path) as w:
            for r in recs:
                w.write(r)
        back = list(FastqReader(path))
        assert back == recs

    def test_malformed_raises(self, tmp_path):
        path = str(tmp_path / "bad.fastq")
        open(path, "w").write("not_a_header\nACGT\n+\nIIII\n")
        with pytest.raises(ValueError, match="malformed"):
            list(FastqReader(path))


class TestGff:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.gff")
        rec = GffRecord(
            "chr1", "test", "gene", 99, 200, 0.9, "+", 0,
            {"ID": "gene1", "Name": "FOO"},
        )
        with GffWriter(path) as w:
            w.write(rec)
        back = list(GffReader(path))
        assert len(back) == 1
        b = back[0]
        # 1-based text representation converts back to 0-based start.
        assert (b.start, b.end) == (99, 200)
        assert b.attributes == {"ID": "gene1", "Name": "FOO"}
        assert b.score == 0.9

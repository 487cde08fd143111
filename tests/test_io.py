import gzip
import os

import numpy as np
import pytest

from deepvariant_tpu.core.cigar import read_span_array, ref_span_array
from deepvariant_tpu.core.types import Range
from deepvariant_tpu.io import bgzf, examples, tfrecord
from deepvariant_tpu.io.bam import BamReader, ReadBatch, ReadRequirements, parse_aux
from deepvariant_tpu.io.fasta import FastaReader, InMemoryFasta


BAM = "input/NA12878_S1.chr20.10_10p1mb.bam"
FASTA = "input/hs37d5_chr20_1_1000000.fa.gz"
GRCH38_FASTA = "input/grch38.chr20_and_21_10M.fa.gz"


# ---------------------------------------------------------------------------
# BGZF
# ---------------------------------------------------------------------------

def test_bgzf_roundtrip(tmp_path):
    path = str(tmp_path / "test.bgzf")
    payload = bytes(range(256)) * 2000  # > one block
    with bgzf.BgzfWriter(path) as w:
        w.write(payload)
    with bgzf.BgzfReader(path) as r:
        assert r.read_all() == payload
    assert bgzf.is_bgzf(path)
    # Whole-file decompress helpers agree.
    assert bgzf.decompress_all(path) == payload


def test_bgzf_reads_reference_fasta(testdata_dir):
    path = os.path.join(testdata_dir, FASTA)
    ours = bgzf.decompress_all(path)
    with gzip.open(path, "rb") as f:
        theirs = f.read()
    assert ours == theirs


def test_native_bgzf_matches(testdata_dir):
    native = pytest.importorskip("deepvariant_tpu.io.native")
    path = os.path.join(testdata_dir, FASTA)
    with open(path, "rb") as f:
        raw = f.read()
    assert native.bgzf_decompress_all(raw) == bgzf.decompress_all(path)


# ---------------------------------------------------------------------------
# FASTA
# ---------------------------------------------------------------------------

def test_fasta_reader(testdata_dir):
    fa = FastaReader(os.path.join(testdata_dir, FASTA))
    (chrom,) = fa.contig_names()
    length = fa.contig_length(chrom)
    # Independent check against raw text.
    with gzip.open(os.path.join(testdata_dir, FASTA), "rt") as f:
        lines = f.read().splitlines()
    assert lines[0].lstrip(">").split()[0] == chrom
    seq = "".join(lines[1:]).upper()
    assert length == len(seq)
    assert fa.query(Range(chrom, 0, 100)) == seq[:100]
    assert fa.query(Range(chrom, 500000, 500050)) == seq[500000:500050]
    assert fa.query(Range(chrom, length - 10, length)) == seq[-10:]
    assert fa.is_valid(Range(chrom, 0, length))
    assert not fa.is_valid(Range(chrom, 0, length + 1))
    assert not fa.is_valid(Range("chrX", 0, 10))


def test_in_memory_fasta():
    fa = InMemoryFasta({"chr1": "acgtACGT"})
    assert fa.query(Range("chr1", 0, 8)) == "ACGTACGT"
    assert fa.contig_length("chr1") == 8
    fa2 = InMemoryFasta({"chr1": "ACGT"}, starts={"chr1": 100})
    assert fa2.query(Range("chr1", 100, 104)) == "ACGT"
    assert fa2.is_valid(Range("chr1", 100, 104))
    assert not fa2.is_valid(Range("chr1", 99, 104))


# ---------------------------------------------------------------------------
# BAM
# ---------------------------------------------------------------------------

def test_bam_header(testdata_dir):
    with BamReader(os.path.join(testdata_dir, BAM)) as bam:
        names = bam.ref_names
        assert "20" in names or "chr20" in names
        assert bam.header.sample_names()


def test_bam_query(testdata_dir):
    with BamReader(os.path.join(testdata_dir, BAM)) as bam:
        chrom = "chr20" if "chr20" in bam.ref_names else "20"
        region = Range(chrom, 10000000, 10000100)
        batch = bam.query(region)
        assert len(batch) > 10
        ends = batch.reference_ends()
        # Every read overlaps the queried window.
        assert np.all(batch.pos < region.end)
        assert np.all(ends > region.start)
        # seq/cigar consistency: read bases consumed == seq length.
        for i in range(len(batch)):
            ops, lens = batch.cigar_of(i)
            assert read_span_array(ops, lens) == len(batch.seq_of(i))
        # Sorted by position within the region scan.
        assert np.all(np.diff(batch.pos) >= 0)
        # Flags: no unmapped/secondary/dup under default requirements.
        assert np.all(batch.flag & 0x4 == 0)
        assert np.all(batch.flag & 0x100 == 0)
        assert np.all(batch.flag & 0x400 == 0)


def test_bam_query_matches_iterate(testdata_dir):
    path = os.path.join(testdata_dir, BAM)
    with BamReader(path) as bam:
        chrom = "chr20" if "chr20" in bam.ref_names else "20"
        region = Range(chrom, 10000500, 10001000)
        via_index = bam.query(region)
        everything = bam.iterate()
    ref_id = everything.ref_names.index(chrom)
    ends = everything.reference_ends()
    mask = (
        (everything.ref_id == ref_id)
        & (everything.pos < region.end)
        & (ends > region.start)
    )
    expected = {
        (everything.name[i], int(everything.pos[i]))
        for i in np.nonzero(mask)[0]
    }
    got = {(via_index.name[i], int(via_index.pos[i]))
           for i in range(len(via_index))}
    assert got == expected


def test_bam_subset_and_roundtrip(testdata_dir):
    with BamReader(os.path.join(testdata_dir, BAM)) as bam:
        chrom = "chr20" if "chr20" in bam.ref_names else "20"
        batch = bam.query(Range(chrom, 10000000, 10000200))
    sub = batch.subset(np.arange(0, len(batch), 2))
    assert len(sub) == (len(batch) + 1) // 2
    reads = sub.to_reads()
    back = ReadBatch.from_reads(reads, batch.ref_names)
    assert back.name == sub.name
    np.testing.assert_array_equal(back.pos, sub.pos)
    np.testing.assert_array_equal(back.seq, sub.seq)
    np.testing.assert_array_equal(back.cigar_lens, sub.cigar_lens)


def test_bam_aux_parse(testdata_dir):
    with BamReader(os.path.join(testdata_dir, BAM)) as bam:
        chrom = "chr20" if "chr20" in bam.ref_names else "20"
        batch = bam.query(Range(chrom, 10000000, 10000050))
    found_any = False
    for blob in batch.aux[:20]:
        tags = parse_aux(blob)
        if tags:
            found_any = True
    assert found_any


def test_bam_mapq_filter(testdata_dir):
    path = os.path.join(testdata_dir, BAM)
    with BamReader(path, ReadRequirements(min_mapping_quality=60)) as bam:
        chrom = "chr20" if "chr20" in bam.ref_names else "20"
        batch = bam.query(Range(chrom, 10000000, 10000500))
    assert np.all(batch.mapq >= 60)


def test_bam_downsample(testdata_dir):
    path = os.path.join(testdata_dir, BAM)
    with BamReader(path) as bam:
        chrom = "chr20" if "chr20" in bam.ref_names else "20"
        full = bam.query(Range(chrom, 10000000, 10010000))
    with BamReader(path, downsample_fraction=0.5, random_seed=7) as bam:
        half = bam.query(Range(chrom, 10000000, 10010000))
    assert 0.35 * len(full) < len(half) < 0.65 * len(full)


# ---------------------------------------------------------------------------
# TFRecord + tf.Example
# ---------------------------------------------------------------------------

def test_crc32c_known_values():
    # Known CRC-32C test vectors (RFC 3720 appendix B.4 style).
    assert tfrecord.crc32c(b"") == 0
    assert tfrecord.crc32c(b"123456789") == 0xE3069283
    assert tfrecord._crc32c_py(b"123456789") == 0xE3069283
    data = bytes(range(256)) * 5
    assert tfrecord.crc32c(data) == tfrecord._crc32c_py(data)


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "test.tfrecord.gz")
    records = [b"hello", b"", b"x" * 100000]
    tfrecord.write_tfrecords(records, path)
    got = list(tfrecord.TFRecordReader(path, verify_crc=True))
    assert got == records


def test_example_roundtrip():
    from deepvariant_tpu.core.types import Variant

    img = np.arange(100 * 221 * 7, dtype=np.uint8).reshape(100, 221, 7)
    v = Variant(
        reference_name="chr20", start=100, end=101,
        reference_bases="A", alternate_bases=["C"],
    )
    buf = examples.make_example(v, img, [0], "chr20:51-271", label=1)
    ex = examples.parse_example(buf)
    assert ex.shape == (100, 221, 7)
    np.testing.assert_array_equal(ex.image, img)
    assert ex.variant.reference_bases == "A"
    assert ex.alt_allele_indices == [0]
    assert ex.label == 1
    assert ex.locus == "chr20:51-271"
    assert ex.variant_type == examples.VARIANT_TYPE_SNP


def test_decode_reference_golden_examples(testdata_dir):
    """Interop: decode the reference's golden calling examples."""
    path = os.path.join(testdata_dir, "golden.calling_examples.tfrecord.gz")
    info = examples.read_example_info(path)
    shape = tuple(info["shape"])
    n = 0
    starts = []
    for rec in tfrecord.read_tfrecords(path, max_records=20):
        ex = examples.parse_example(rec)
        assert ex.shape == shape
        assert ex.image is not None and ex.image.dtype == np.uint8
        assert ex.variant is not None
        assert ex.variant.reference_name in ("chr20", "20")
        assert len(ex.variant.alternate_bases) >= 1
        assert ex.alt_allele_indices
        starts.append(ex.variant.start)
        n += 1
    assert n == 20
    assert all(9_990_000 < s < 10_100_000 for s in starts)


def test_example_info_roundtrip(tmp_path):
    path = str(tmp_path / "examples.tfrecord.gz")
    examples.write_example_info(path, (100, 221, 7), [1, 2, 3, 4, 5, 6, 19])
    info = examples.read_example_info(path)
    assert info["shape"] == [100, 221, 7]
    assert info["channels"] == [1, 2, 3, 4, 5, 6, 19]


class TestGziPartialLoads:
    """.gzi-indexed partial FASTA loads (htslib bgzf index)."""

    def test_partial_equals_full(self, testdata_dir):
        import numpy as np

        from deepvariant_tpu.core.types import Range
        from deepvariant_tpu.io.fasta import FastaReader

        p = os.path.join(
            testdata_dir, "input/grch38.chr20_and_21_10M.fa.gz"
        )
        partial = FastaReader(p)
        assert partial._gzi is not None
        full = FastaReader(p, gzi_path="/nonexistent")
        for contig in partial.contig_names():
            r = Range(contig, 0, partial.contig_length(contig))
            np.testing.assert_array_equal(
                partial.bases(r), full.bases(r)
            )

    def test_decompress_range_spans_blocks(self, tmp_path):
        import numpy as np

        from deepvariant_tpu.io import bgzf

        # Write multi-block bgzf + hand-build the .gzi.
        payload = bytes(range(256)) * 2048  # 512 KiB > one 64K block
        path = str(tmp_path / "x.gz")
        with bgzf.BgzfWriter(path) as w:
            for i in range(0, len(payload), 60000):
                w.write(payload[i : i + 60000])
        # Build gzi by walking blocks.
        import struct, zlib

        entries = []
        data = open(path, "rb").read()
        off = 0
        uoff = 0
        while off < len(data):
            xlen = struct.unpack_from("<H", data, off + 10)[0]
            xoff = off + 12
            bsize = None
            while xoff < off + 12 + xlen:
                si1, si2, slen = data[xoff], data[xoff + 1], \
                    struct.unpack_from("<H", data, xoff + 2)[0]
                if si1 == 66 and si2 == 67:
                    bsize = struct.unpack_from(
                        "<H", data, xoff + 4
                    )[0] + 1
                xoff += 4 + slen
            isize = struct.unpack_from("<I", data, off + bsize - 4)[0]
            off += bsize
            uoff += isize
            if off < len(data):
                entries.append((off, uoff))
        gzi = str(tmp_path / "x.gz.gzi")
        with open(gzi, "wb") as f:
            f.write(struct.pack("<Q", len(entries)))
            for c, u in entries:
                f.write(struct.pack("<QQ", c, u))
        index = bgzf.read_gzi(gzi)
        # Range crossing block boundaries.
        got = bgzf.decompress_range(path, index, 59000, 190000)
        assert got == payload[59000:190000]
        assert bgzf.decompress_range(path, index, 0, 10) == payload[:10]
        tail = bgzf.decompress_range(
            path, index, len(payload) - 7, len(payload)
        )
        assert tail == payload[-7:]


class TestBgzfIoThreads:
    """io_threads: host BGZF inflation pool (htslib bgzf-threads
    analog). Must be byte-identical to inline decode on every access
    pattern, and only engage on sequential streaming."""

    @staticmethod
    def _bam(testdata_dir):
        return os.path.join(
            testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
        )

    def test_read_all_identical(self, testdata_dir):
        from deepvariant_tpu.io.bgzf import BgzfReader

        bam = self._bam(testdata_dir)
        inline = BgzfReader(bam).read_all()
        threaded = BgzfReader(bam, io_threads=2).read_all()
        assert inline == threaded

    def test_query_and_iterate_identical(self, testdata_dir):
        from deepvariant_tpu.io.bam import BamReader
        from deepvariant_tpu.core.types import Range

        b0 = BamReader(self._bam(testdata_dir))
        b4 = BamReader(self._bam(testdata_dir), io_threads=4)
        for rg in (
            Range("chr20", 10_000_000, 10_010_000),
            Range("chr20", 10_090_000, 10_100_000),
        ):
            x, y = b0.query(rg), b4.query(rg)
            assert len(x) == len(y)
            assert x.seq.tobytes() == y.seq.tobytes()
            assert (x.pos == y.pos).all()

    def test_interleaved_seeks_identical(self, testdata_dir):
        from deepvariant_tpu.io.bgzf import BgzfReader

        bam = self._bam(testdata_dir)
        r0 = BgzfReader(bam)
        r2 = BgzfReader(bam, io_threads=2)
        # stream a bit, jump back, stream again
        a0, a2 = r0.read(300_000), r2.read(300_000)
        assert a0 == a2
        vo = 0
        r0.seek_virtual(vo)
        r2.seek_virtual(vo)
        assert r0.read(200_000) == r2.read(200_000)

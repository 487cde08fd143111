"""Tabix index writer/reader tests, incl. cross-validation against
htslib-produced .tbi files from the reference testdata."""

import os
import struct

import pytest

from deepvariant_tpu.io.bgzf import BgzfReader
from deepvariant_tpu.io.tabix import (
    TBI_MAGIC,
    TabixReader,
    _iter_lines_with_voffsets,
    _reg2bin,
    _reg2bins,
    build_index,
)
from deepvariant_tpu.io.vcf import VcfReader


def test_reg2bin_bins_overlap():
    # A record's own bin must be in the candidate bins of any query
    # overlapping it.
    for beg, end in [(0, 1), (100, 200), (16383, 16385),
                     (1 << 20, (1 << 20) + 50)]:
        b = _reg2bin(beg, end)
        assert b in _reg2bins(beg, end)
        assert b in _reg2bins(max(0, beg - 5), end + 5)


@pytest.mark.integration
class TestTabix:
    def test_query_htslib_index(self, testdata_dir):
        """Our reader over an htslib-built .tbi must match a full scan."""
        path = os.path.join(
            testdata_dir, "input/test_nist.b37_chr20_100kbp_at_10mb.vcf.gz"
        )
        reader = TabixReader(path)
        got = sorted(
            int(line.split("\t")[1])
            for line in reader.query("chr20", 10_000_000, 10_004_000)
        )
        expected = sorted(
            v.start + 1 for v in VcfReader(path)
            if v.start < 10_004_000 and v.end > 10_000_000
        )
        assert got == expected

    def test_build_and_query_own_index(self, testdata_dir, tmp_path):
        from deepvariant_tpu.core.types import Range
        from deepvariant_tpu.io.fasta import FastaReader
        from deepvariant_tpu.postprocess.pipeline import (
            postprocess_variants,
        )

        ref = FastaReader(os.path.join(
            testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ))
        vcf_gz = str(tmp_path / "indexed.vcf.gz")
        postprocess_variants(
            os.path.join(
                testdata_dir,
                "golden.postprocess_single_site_input-00000-of-00001"
                ".tfrecord.gz",
            ),
            vcf_gz, ref.contigs, sample_name="NA12878",
        )
        idx = build_index(vcf_gz)
        assert os.path.exists(idx)
        data = BgzfReader(idx).read_all()
        assert data[:4] == TBI_MAGIC

        # Virtual offsets must seek back to exact line starts.
        r = BgzfReader(vcf_gz)
        for vo, text in list(_iter_lines_with_voffsets(vcf_gz))[:40]:
            r.seek_virtual(vo)
            assert r.read(len(text.encode())).decode() == text

        reader = TabixReader(vcf_gz)
        got = sorted(
            int(line.split("\t")[1])
            for line in reader.query("chr20", 10_004_000, 10_008_000)
        )
        expected = sorted(
            v.start + 1 for v in VcfReader(vcf_gz)
            if v.start < 10_008_000 and v.end > 10_004_000
        )
        assert got == expected and len(got) > 0


class TestCsi:
    """CSI index (postprocess_variants_test.py:466 test_build_index):
    --use_csi writes .csi (no .tbi), same query results as .tbi."""

    def _make_vcf(self, testdata_dir, tmp_path):
        from deepvariant_tpu.io.fasta import FastaReader
        from deepvariant_tpu.postprocess.pipeline import (
            postprocess_variants,
        )

        ref = FastaReader(os.path.join(
            testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ))
        vcf_gz = str(tmp_path / "csi.vcf.gz")
        postprocess_variants(
            os.path.join(
                testdata_dir,
                "golden.postprocess_single_site_input-00000-of-00001"
                ".tfrecord.gz",
            ),
            vcf_gz, ref.contigs, sample_name="NA12878",
        )
        return vcf_gz

    def test_build_csi_and_query_parity(self, testdata_dir, tmp_path):
        from deepvariant_tpu.io.tabix import CSI_MAGIC

        vcf_gz = self._make_vcf(testdata_dir, tmp_path)
        tbi = build_index(vcf_gz)
        csi = build_index(vcf_gz, use_csi=True)
        assert csi.endswith(".csi") and os.path.exists(csi)
        assert BgzfReader(csi).read_all()[:4] == CSI_MAGIC

        via_tbi = sorted(
            line for line in TabixReader(vcf_gz, tbi).query(
                "chr20", 10_000_000, 10_100_000
            )
        )
        via_csi = sorted(
            line for line in TabixReader(vcf_gz, csi).query(
                "chr20", 10_000_000, 10_100_000
            )
        )
        assert via_tbi and via_csi == via_tbi
        # Narrow window parity too.
        for lo, hi in [(10_000_000, 10_001_000),
                       (10_002_337, 10_002_338)]:
            a = list(TabixReader(vcf_gz, tbi).query("chr20", lo, hi))
            b = list(TabixReader(vcf_gz, csi).query("chr20", lo, hi))
            assert a == b

    def test_reader_autodetects_csi(self, testdata_dir, tmp_path):
        vcf_gz = self._make_vcf(testdata_dir, tmp_path)
        build_index(vcf_gz, use_csi=True)  # only .csi on disk
        assert not os.path.exists(vcf_gz + ".tbi")
        reader = TabixReader(vcf_gz)
        assert list(reader.query("chr20", 10_000_000, 10_100_000))

    def test_postprocess_cli_use_csi(self, testdata_dir, tmp_path):
        from deepvariant_tpu.scripts.postprocess_variants import main

        out = str(tmp_path / "out.vcf.gz")
        rc = main([
            "--ref", os.path.join(
                testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
            ),
            "--infile", os.path.join(
                testdata_dir,
                "golden.postprocess_single_site_input-00000-of-00001"
                ".tfrecord.gz",
            ),
            "--outfile", out,
            "--sample_name", "NA12878",
            "--use_csi",
        ])
        assert rc == 0
        assert os.path.exists(out + ".csi")
        assert not os.path.exists(out + ".tbi")

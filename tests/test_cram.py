"""CRAM 3.0 reader tests: embedded/external reference decoding vs the
SAM ground truth, rANS codec, and BAM parity on real data."""

import os

import numpy as np
import pytest

from deepvariant_tpu.core.types import Range
from deepvariant_tpu.io.cram import (
    CramBatchReader,
    CramReader,
    read_itf8,
    read_ltf8,
)

NUCLEUS_TD = "/root/reference/third_party/nucleus/testdata"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(NUCLEUS_TD), reason="nucleus testdata unavailable"
)

EXPECTED = [
    # (name, pos1, cigar, seq, qual_string) from test_cram.sam.
    ("cram1", 34, "29M6S", "CCCTAACCCTAACCCTAACCCTAACCCTANNNNNN",
     "AAA7<<7FAFA..FFFF7FFFF))F<FFF######"),
    ("cram2", 49, "41M33S",
     "TAACCCTAACCCTAACCCTAACCCTAACCCTAACCCTAACCAAAACGAATCAAAAAAGAAAA"
     "ACGAAAAAAAAA",
     "AA)AAFA<.FAFAF.FF<FAFFFF)AFF<F.))A.F).FA<.7<..)))))))))))))))F"
     ".<.).F.))).)"),
    ("cram3", 55, "11M", "CACAGACGCTT", ";...88..,/)"),
]


def _cigar_str(cigar):
    return "".join(f"{n}{'?MIDNSHP=X'[op]}" for op, n in cigar)


class TestVarints:
    def test_itf8(self):
        assert read_itf8(b"\x7f", 0) == (127, 1)
        assert read_itf8(b"\x80\x80", 0) == (128, 2)
        assert read_itf8(b"\xff\xff\xff\xff\x0f", 0) == (-1, 5)

    def test_ltf8(self):
        assert read_ltf8(b"\x7f", 0) == (127, 1)
        val, pos = read_ltf8(b"\x80\xff", 0)
        assert val == 255 and pos == 2


class TestDecodeVsSam:
    def test_embedded_reference(self):
        reads = list(CramReader(
            f"{NUCLEUS_TD}/test_cram.embed_ref_1_version_3.0.cram"
        ).iterate())
        assert len(reads) == 3
        for r, (name, pos1, cig, seq, qual) in zip(reads, EXPECTED):
            assert r.fragment_name == name
            assert int(r.position) + 1 == pos1
            assert _cigar_str(r.cigar) == cig
            assert r.aligned_sequence == seq
            assert "".join(
                chr(q + 33) for q in r.aligned_quality
            ) == qual

    def test_external_reference(self):
        from deepvariant_tpu.io.fasta import FastaReader

        ref = FastaReader(f"{NUCLEUS_TD}/test.fasta")
        reads = list(CramReader(
            f"{NUCLEUS_TD}/test_cram.embed_ref_0_version_3.0.cram",
            ref_reader=ref,
        ).iterate())
        for r, (name, pos1, cig, seq, _q) in zip(reads, EXPECTED):
            assert r.aligned_sequence == seq
            assert _cigar_str(r.cigar) == cig

    def test_tags_decoded(self):
        reads = list(CramReader(
            f"{NUCLEUS_TD}/test_cram.embed_ref_1_version_3.0.cram"
        ).iterate())
        r3 = reads[2]
        zp = r3.info["ZP"][0]
        np.testing.assert_allclose(
            zp, [0.000127674, 0.00169955, 3.16844e-06], rtol=1e-5
        )
        assert r3.info["ZA"][0] == 275
        assert r3.info["PG"][0] == "tmap"


@pytest.mark.integration
class TestBamParity:
    def test_real_cram_matches_bam(self, testdata_dir):
        from deepvariant_tpu.io.bam import BamReader
        from deepvariant_tpu.io.fasta import FastaReader

        ref = FastaReader(os.path.join(
            testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ))
        cram = CramBatchReader(
            os.path.join(
                testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.cram"
            ),
            ref_reader=ref,
        )
        bam = BamReader(os.path.join(
            testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
        ))
        region = Range("chr20", 10_000_000, 10_002_000)
        cb = cram.query(region)
        bb = bam.query(region)
        assert len(cb) == len(bb) > 100

        def keyed(batch):
            out = {}
            for i in range(len(batch)):
                key = (batch.name[i], int(batch.pos[i]),
                       int(batch.flag[i]) & 0xC0)
                out[key] = (
                    batch.seq_of(i).tobytes(),
                    batch.qual_of(i).tobytes(),
                    tuple(batch.cigar_of(i)[0].tolist()),
                    int(batch.mapq[i]),
                )
            return out

        ck, bk = keyed(cb), keyed(bb)
        assert set(ck) == set(bk)
        for key in ck:
            assert ck[key] == bk[key], key


@pytest.mark.integration
def test_crai_random_access(testdata_dir):
    """.crai-indexed query touches only overlapping containers and
    agrees with a full scan."""
    from deepvariant_tpu.io.fasta import FastaReader

    ref = FastaReader(os.path.join(
        testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
    ))
    path = os.path.join(
        testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.cram"
    )
    cram = CramReader(path, ref_reader=ref)
    assert cram._load_crai(), "crai sidecar should parse"
    region = Range("chr20", 10_050_000, 10_052_000)
    via_crai = cram.query(region)
    assert len(via_crai) > 100
    # Same query with the index disabled.
    cram2 = CramReader(path, ref_reader=ref)
    cram2._crai = []
    full = cram2.query(region)
    keyfn = lambda r: (r.fragment_name, int(r.position))
    assert sorted(map(keyfn, via_crai)) == sorted(map(keyfn, full))


def test_native_rans_matches_python():
    """dv_rans_decode agrees with the pure-Python decoder on real
    blocks from the test CRAM."""
    import struct

    from deepvariant_tpu.io import cram as cram_mod
    from deepvariant_tpu.io.native import rans_decode_native

    if rans_decode_native(b"\x00" + b"\x00" * 8) is None:
        pytest.skip("native library unavailable")
    path = f"{NUCLEUS_TD}/test_cram.embed_ref_1_version_3.0.cram"
    data = open(path, "rb").read()
    pos = 26
    checked = 0
    while pos + 4 <= len(data):
        (length,) = struct.unpack_from("<i", data, pos)
        p2 = pos + 4
        for _ in range(4):
            _, p2 = cram_mod.read_itf8(data, p2)
        _, p2 = cram_mod.read_ltf8(data, p2)
        _, p2 = cram_mod.read_ltf8(data, p2)
        _, p2 = cram_mod.read_itf8(data, p2)
        nl, p2 = cram_mod.read_itf8(data, p2)
        for _ in range(nl):
            _, p2 = cram_mod.read_itf8(data, p2)
        p2 += 4
        body = data[p2 : p2 + length]
        bpos = 0
        while bpos < len(body):
            method = body[bpos]
            q = bpos + 2
            _cid, q = cram_mod.read_itf8(body, q)
            csize, q = cram_mod.read_itf8(body, q)
            _rsize, q = cram_mod.read_itf8(body, q)
            if method == 4:
                blob = body[q : q + csize]
                order = blob[0]
                comp = struct.unpack_from("<I", blob, 1)[0]
                outn = struct.unpack_from("<I", blob, 5)[0]
                py_fn = (cram_mod._rans_decode_0 if order == 0
                         else cram_mod._rans_decode_1)
                assert rans_decode_native(blob) == py_fn(
                    blob[9 : 9 + comp], outn
                )
                checked += 1
            bpos = q + csize + 4
        pos = p2 + length
        if length == 15 or checked > 10:
            break
    assert checked >= 1

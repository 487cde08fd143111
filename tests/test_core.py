import math

import numpy as np
import pytest

from deepvariant_tpu.core import genomics_math, protowire as pw
from deepvariant_tpu.core.cigar import (
    format_cigar,
    parse_cigar_string,
    read_span,
    ref_span,
)
from deepvariant_tpu.core.ranges import RangeSet
from deepvariant_tpu.core.sharded_files import (
    generate_sharded_filenames,
    maybe_sharded_output_path,
    parse_sharded_file_spec,
    sharded_filename,
)
from deepvariant_tpu.core.types import (
    CallVariantsOutput,
    Range,
    Read,
    Variant,
    VariantCall,
)


def test_varint_roundtrip():
    for v in [0, 1, 127, 128, 300, 2**32, 2**63 - 1]:
        buf = pw.encode_varint(v)
        got, pos = pw.decode_varint(buf, 0)
        assert got == v and pos == len(buf)
    # Negative int64 encodes as 10-byte varint.
    buf = pw.encode_varint(-1)
    got, _ = pw.decode_varint(buf, 0)
    assert pw.varint_to_signed64(got) == -1


def test_range_basics():
    r = Range("chr20", 100, 200)
    assert len(r) == 100
    assert r.overlaps(Range("chr20", 199, 300))
    assert not r.overlaps(Range("chr20", 200, 300))
    assert not r.overlaps(Range("chr1", 150, 160))
    assert r.to_region_string() == "chr20:101-200"
    assert Range.from_region_string("chr20:101-200") == r
    assert Range.decode(r.encode()) == r


def test_variant_roundtrip():
    v = Variant(
        reference_name="chr20",
        start=9999,
        end=10000,
        reference_bases="A",
        alternate_bases=["T", "C"],
        quality=31.5,
        filter=["PASS"],
        info={"DP": [42]},
        calls=[
            VariantCall(
                call_set_name="sample",
                genotype=[0, 1],
                genotype_likelihood=[-1.0, -0.1, -2.0],
                info={"AD": [10, 5], "VAF": [0.333]},
            )
        ],
    )
    got = Variant.decode(v.encode())
    assert got.reference_name == "chr20"
    assert got.start == 9999 and got.end == 10000
    assert got.alternate_bases == ["T", "C"]
    assert got.quality == pytest.approx(31.5)
    assert got.calls[0].genotype == [0, 1]
    assert got.calls[0].genotype_likelihood == pytest.approx(
        [-1.0, -0.1, -2.0]
    )
    assert got.calls[0].info["AD"] == [10, 5]
    assert got.info["DP"] == [42]


def test_variant_negative_genotype():
    v = Variant(calls=[VariantCall(genotype=[-1, -1])])
    got = Variant.decode(v.encode())
    assert got.calls[0].genotype == [-1, -1]


def test_read_roundtrip():
    r = Read(
        fragment_name="read1",
        aligned_sequence="ACGT",
        aligned_quality=bytes([30, 31, 32, 33]),
        reference_name="chr1",
        position=1000,
        mapping_quality=60,
        cigar=[(1, 2), (2, 1), (1, 1)],
        reverse_strand=True,
        number_reads=2,
        read_number=1,
        fragment_length=-300,
        next_mate_position=("chr1", 800, False),
    )
    got = Read.decode(r.encode())
    assert got.fragment_name == "read1"
    assert got.cigar == [(1, 2), (2, 1), (1, 1)]
    assert got.reverse_strand
    assert got.fragment_length == -300
    assert got.end() == 1003
    assert got.cigar_string() == "2M1I1M"


def test_cvo_roundtrip():
    cvo = CallVariantsOutput(
        variant=Variant(reference_name="chr1", start=5, end=6,
                        reference_bases="A", alternate_bases=["G"]),
        alt_allele_indices=[0],
        genotype_probabilities=[0.01, 0.98, 0.01],
    )
    got = CallVariantsOutput.decode(cvo.encode())
    assert got.alt_allele_indices == [0]
    assert got.genotype_probabilities == pytest.approx([0.01, 0.98, 0.01])
    assert got.variant.reference_bases == "A"


def test_cigar_utils():
    units = parse_cigar_string("10M2I5D3S")
    assert format_cigar(units) == "10M2I5D3S"
    assert ref_span(units) == 15
    assert read_span(units) == 15


def test_genomics_math():
    assert genomics_math.ptrue_to_bounded_phred(0.0) == 0.0
    assert genomics_math.ptrue_to_bounded_phred(0.9) == pytest.approx(10.0)
    probs = genomics_math.normalize_log10_probs([-1.0, -1.0, -1.0])
    np.testing.assert_allclose(10.0 ** probs, [1 / 3] * 3, rtol=1e-12)
    gls = genomics_math.round_gls([0.3333333333333, 0.3333333333333,
                                   0.3333333333334])
    assert sum(gls) == pytest.approx(1.0, abs=1e-12)
    with pytest.raises(ValueError):
        genomics_math.round_gls([0.5, 0.6])


def test_rangeset():
    rs = RangeSet(
        [Range("chr1", 0, 10), Range("chr1", 5, 20), Range("chr2", 0, 5)]
    )
    assert len(rs) == 2  # merged
    assert rs.total_bp() == 25
    assert rs.overlaps("chr1", 19)
    assert not rs.overlaps("chr1", 20)
    assert rs.envelops("chr1", 3, 18)
    assert not rs.envelops("chr2", 3, 8)
    inter = rs.intersection(RangeSet([Range("chr1", 8, 30)]))
    assert list(inter) == [Range("chr1", 8, 20)]
    parts = list(RangeSet([Range("chr1", 0, 2500)]).partition(1000))
    assert parts == [
        Range("chr1", 0, 1000),
        Range("chr1", 1000, 2000),
        Range("chr1", 2000, 2500),
    ]
    ex = rs.exclude_regions(RangeSet([Range("chr1", 5, 8)]))
    assert list(ex) == [
        Range("chr1", 0, 5), Range("chr1", 8, 20), Range("chr2", 0, 5)
    ]


def test_sharded_files():
    assert parse_sharded_file_spec("out.tfrecord@3.gz") == (
        "out.tfrecord", 3, ".gz",
    )
    assert sharded_filename("x", 2, 10) == "x-00002-of-00010"
    assert generate_sharded_filenames("x@2.gz") == [
        "x-00000-of-00002.gz",
        "x-00001-of-00002.gz",
    ]
    assert maybe_sharded_output_path("x@4", 3) == "x-00003-of-00004"
    assert maybe_sharded_output_path("plain.vcf", 0) == "plain.vcf"


class TestContigConsistency:
    def _contig(self, name, n):
        from deepvariant_tpu.core.types import ContigInfo

        return ContigInfo(name, n, 0)

    def test_common_contigs(self):
        from deepvariant_tpu.make_examples.core import common_contigs

        ref = [self._contig("chr1", 100), self._contig("chr2", 50)]
        sam = [self._contig("chr1", 100), self._contig("chr2", 60)]
        out = common_contigs([ref, sam])
        assert [c.name for c in out] == ["chr1"]  # length must match

    def test_consistent_passes(self):
        from deepvariant_tpu.make_examples.core import (
            ensure_consistent_contigs,
        )

        ref = [self._contig("chr1", 100)]
        out = ensure_consistent_contigs(ref, ref)
        assert [c.name for c in out] == ["chr1"]

    def test_mismatch_raises_readable_error(self):
        from deepvariant_tpu.make_examples.core import (
            ensure_consistent_contigs,
        )

        ref = [self._contig("chr20", 100)]
        sam = [self._contig("20", 100)]
        with pytest.raises(ValueError, match="chr-prefix"):
            ensure_consistent_contigs(ref, sam)

    def test_excluded_contigs_ignored(self):
        from deepvariant_tpu.make_examples.core import (
            EXCLUDED_HUMAN_CONTIGS,
            ensure_consistent_contigs,
        )

        assert "hs37d5" in EXCLUDED_HUMAN_CONTIGS
        ref = [self._contig("chr1", 100),
               self._contig("hs37d5", 1000)]
        sam = [self._contig("chr1", 100)]
        out = ensure_consistent_contigs(ref, sam)
        assert [c.name for c in out] == ["chr1"]

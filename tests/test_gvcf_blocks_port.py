"""gVCF block construction semantics on synthetic allele counts.

Ported corpus: deepvariant/variant_caller_trio_test.py (identical
tables in variant_caller_test.py) — test_gvcf_basic, the IUPAC
skip/raise cases, test_make_gvcfs (7 merge tables), test_quantize_gvcfs
(5 resolutions over the 9-position fixture) and the gvcf side of
test_gvcfs_counts. The fake counter mirrors the reference's mocked
AlleleCountSummary rows: each count is (n_alt, n_ref, ref_base).
"""

import numpy as np
import pytest

from deepvariant_tpu.core.ranges import Range
from deepvariant_tpu.make_examples.variant_caller import (
    VariantCallerOptions,
    VerySensitiveCaller,
)


class FakeCounter:
    """Duck-typed AlleleCounter: interval + per-position summaries."""

    def __init__(self, start, counts, chrom="chr1"):
        self.interval = Range(chrom, start, start + len(counts))
        self.ref = "".join(c[2] for c in counts).encode()
        self._ref_count = np.array([c[1] for c in counts], np.int32)
        self._total = np.array(
            [c[0] + c[1] for c in counts], np.int32
        )

    def summary_counts(self):
        return self._ref_count, self._total


def make_caller(p_error=0.01, max_gq=100, gq_resolution=1):
    return VerySensitiveCaller(VariantCallerOptions(
        sample_name="UNKNOWN", p_error=p_error, max_gq=max_gq,
        gq_resolution=gq_resolution, ploidy=2,
    ))


def assert_gvcf(gvcf, ref, gq, start, end, min_dp, gls=None, gts=None):
    call = gvcf.calls[0]
    assert gvcf.reference_name == "chr1"
    assert gvcf.reference_bases == ref
    assert gvcf.alternate_bases == ["<*>"]
    assert gvcf.start == start
    assert gvcf.end == end
    assert call.info["GQ"] == [gq]
    assert call.info["MIN_DP"] == [min_dp]
    assert call.call_set_name == "UNKNOWN"
    if gls is not None:
        np.testing.assert_allclose(
            call.genotype_likelihood, gls, atol=1e-6
        )
    if gts is not None:
        assert call.genotype == gts


FLAT_GLS = [-0.47712125472] * 3


@pytest.mark.parametrize("ref", list("ACGT"))
def test_gvcf_basic(ref):
    caller = make_caller()
    gvcfs = list(caller.make_gvcfs(FakeCounter(100, [(0, 0, ref)])))
    assert len(gvcfs) == 1
    assert_gvcf(gvcfs[0], ref=ref, gq=1, start=100, end=101,
                min_dp=0, gls=FLAT_GLS)


@pytest.mark.parametrize("ref", list("NRWB"))
def test_gvcf_basic_skips_iupac_ref_base(ref):
    caller = make_caller()
    assert list(caller.make_gvcfs(FakeCounter(100, [(0, 0, ref)]))) == []


@pytest.mark.parametrize("ref", ["X", ">", "!"])
def test_gvcf_basic_raises_with_bad_ref_base(ref):
    caller = make_caller()
    with pytest.raises(ValueError, match="reference base"):
        list(caller.make_gvcfs(FakeCounter(100, [(0, 0, ref)])))


MAKE_GVCFS_CASES = [
    # Check some basics.
    ([(0, 0, "A")],
     [dict(start=1, end=2, ref="A", gq=1, min_dp=0)]),
    # Two equal records merge; the reference base is the first one.
    ([(0, 0, "A"), (0, 0, "C")],
     [dict(start=1, end=3, ref="A", gq=1, min_dp=0)]),
    ([(0, 0, "C"), (0, 0, "A")],
     [dict(start=1, end=3, ref="C", gq=1, min_dp=0)]),
    # Three equal records merge into a single block.
    ([(0, 0, "A"), (0, 0, "C"), (0, 0, "T")],
     [dict(start=1, end=4, ref="A", gq=1, min_dp=0)]),
    # Different GQ blocks do not merge.
    ([(0, 0, "A"), (0, 100, "C")],
     [dict(start=1, end=2, ref="A", gq=1, min_dp=0),
      dict(start=2, end=3, ref="C", gq=100, min_dp=100)]),
    ([(0, 100, "A"), (0, 0, "C")],
     [dict(start=1, end=2, ref="A", gq=100, min_dp=100),
      dict(start=2, end=3, ref="C", gq=1, min_dp=0)]),
    ([(0, 0, "A"), (0, 20, "C"), (0, 100, "T")],
     [dict(start=1, end=2, ref="A", gq=1, min_dp=0),
      dict(start=2, end=3, ref="C", gq=59, min_dp=20),
      dict(start=3, end=4, ref="T", gq=100, min_dp=100)]),
]


@pytest.mark.parametrize("counts,expecteds", MAKE_GVCFS_CASES)
def test_make_gvcfs(counts, expecteds):
    caller = make_caller()
    gvcfs = list(caller.make_gvcfs(FakeCounter(1, counts)))
    assert len(gvcfs) == len(expecteds)
    for actual, expected in zip(gvcfs, expecteds):
        assert_gvcf(actual, **expected)


# Each count is (n_alt, n_ref, ref_base). Positions 3-5 (1-based
# offsets from start=1) must never merge: het or hom_alt outranks
# hom_ref there, so they are emitted as uncalled single-position
# records regardless of binning.
QUANTIZE_COUNTS = [
    (0, 18, "A"),
    (0, 19, "C"),
    (35, 0, "A"),
    (10, 10, "T"),
    (4, 12, "A"),
    (1, 30, "A"),
    (1, 34, "C"),
    (0, 20, "T"),
    (0, 19, "G"),
]

QUANTIZE_CASES = [
    (1, [dict(start=1, end=2, ref="A", gq=53, min_dp=18),
         dict(start=2, end=3, ref="C", gq=56, min_dp=19),
         dict(start=3, end=4, ref="A", gq=0, min_dp=35),
         dict(start=4, end=5, ref="T", gq=0, min_dp=20),
         dict(start=5, end=6, ref="A", gq=0, min_dp=16),
         dict(start=6, end=7, ref="A", gq=72, min_dp=31),
         dict(start=7, end=8, ref="C", gq=83, min_dp=35),
         dict(start=8, end=9, ref="T", gq=59, min_dp=20),
         dict(start=9, end=10, ref="G", gq=56, min_dp=19)]),
    # Binning by 3 does not cause any records to be merged.
    (3, [dict(start=1, end=2, ref="A", gq=53, min_dp=18),
         dict(start=2, end=3, ref="C", gq=56, min_dp=19),
         dict(start=3, end=4, ref="A", gq=0, min_dp=35),
         dict(start=4, end=5, ref="T", gq=0, min_dp=20),
         dict(start=5, end=6, ref="A", gq=0, min_dp=16),
         dict(start=6, end=7, ref="A", gq=72, min_dp=31),
         dict(start=7, end=8, ref="C", gq=83, min_dp=35),
         dict(start=8, end=9, ref="T", gq=59, min_dp=20),
         dict(start=9, end=10, ref="G", gq=56, min_dp=19)]),
    # Binning by 4 merges the first two records.
    (4, [dict(start=1, end=3, ref="A", gq=53, min_dp=18),
         dict(start=3, end=4, ref="A", gq=0, min_dp=35),
         dict(start=4, end=5, ref="T", gq=0, min_dp=20),
         dict(start=5, end=6, ref="A", gq=0, min_dp=16),
         dict(start=6, end=7, ref="A", gq=72, min_dp=31),
         dict(start=7, end=8, ref="C", gq=83, min_dp=35),
         dict(start=8, end=9, ref="T", gq=59, min_dp=20),
         dict(start=9, end=10, ref="G", gq=56, min_dp=19)]),
    (10, [dict(start=1, end=3, ref="A", gq=53, min_dp=18),
          dict(start=3, end=4, ref="A", gq=0, min_dp=35),
          dict(start=4, end=5, ref="T", gq=0, min_dp=20),
          dict(start=5, end=6, ref="A", gq=0, min_dp=16),
          dict(start=6, end=7, ref="A", gq=72, min_dp=31),
          dict(start=7, end=8, ref="C", gq=83, min_dp=35),
          dict(start=8, end=10, ref="T", gq=56, min_dp=19)]),
    (45, [dict(start=1, end=3, ref="A", gq=53, min_dp=18),
          dict(start=3, end=4, ref="A", gq=0, min_dp=35),
          dict(start=4, end=5, ref="T", gq=0, min_dp=20),
          dict(start=5, end=6, ref="A", gq=0, min_dp=16),
          dict(start=6, end=10, ref="A", gq=56, min_dp=19)]),
]


@pytest.mark.parametrize("gq_resolution,expecteds", QUANTIZE_CASES)
def test_quantize_gvcfs(gq_resolution, expecteds):
    caller = make_caller(gq_resolution=gq_resolution)
    gvcfs = list(
        caller.make_gvcfs(FakeCounter(1, QUANTIZE_COUNTS))
    )
    assert len(gvcfs) == len(expecteds)
    for actual, expected in zip(gvcfs, expecteds):
        assert_gvcf(actual, **expected)


def test_gvcfs_counts():
    # The gvcf side of calls_and_gvcfs: position 10 flat, 11 is an
    # uncalled het-dominant site (gts ./.), 12-13 merge into a 2 bp
    # block, 14 is uncalled again.
    counts = [
        (0, 0, "A"),
        (10, 10, "G"),
        (0, 0, "G"),
        (0, 0, "G"),
        (10, 10, "T"),
    ]
    caller = make_caller()
    gvcfs = list(caller.make_gvcfs(FakeCounter(10, counts)))
    assert len(gvcfs) == 4
    assert_gvcf(gvcfs[0], ref="A", start=10, end=11, gq=1, min_dp=0,
                gls=FLAT_GLS)
    assert_gvcf(
        gvcfs[1], ref="G", start=11, end=12, gq=0, min_dp=20,
        gls=[-14.0230482368, -7.993606e-15, -14.0230482368],
        gts=[-1, -1],
    )
    assert_gvcf(gvcfs[2], ref="G", start=12, end=14, gq=1, min_dp=0,
                gls=FLAT_GLS)
    assert_gvcf(gvcfs[3], ref="T", start=14, end=15, gq=0, min_dp=20,
                gts=[-1, -1])

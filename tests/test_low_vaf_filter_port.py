"""Low-VAF candidate filter semantics.

Ported corpus: deepvariant/make_examples_core_test.py
ShouldFilterLowVafTest (10 cases) — disabled passthrough, missing
target alt reads, the VAF threshold boundary at exactly 0.1, the
base-quality and mapping-quality rescue criteria, and the
multiallelic any-valid-allele rule. Read metadata (average base
quality, mapping quality) comes from the real ReadBatch arrays here
instead of proto read_infos.
"""

from types import SimpleNamespace

import pytest

from deepvariant_tpu.core.types import Read, Variant
from deepvariant_tpu.io.bam import ReadBatch
from deepvariant_tpu.make_examples.core import (
    MakeExamplesOptions,
    RegionProcessor,
)
from deepvariant_tpu.make_examples.variant_caller import DeepVariantCall


def _options(**overrides):
    o = MakeExamplesOptions(
        reads_filename="unused.bam",
        ref_filename="unused.fa",
        examples_filename="unused.tfrecord",
        filter_low_vaf_candidates=True,
        low_vaf_threshold=0.1,
        low_vaf_max_base_quality=20,
        low_vaf_max_mapping_quality=30,
    )
    for k, v in overrides.items():
        setattr(o, k, v)
    return o


def _make_read(bq: int, mapq: int, name: str) -> Read:
    seq = "ACGTACGT"
    return Read(
        fragment_name=name,
        aligned_sequence=seq,
        aligned_quality=bytes([bq] * len(seq)),
        reference_name="chr1",
        position=10,
        mapping_quality=mapq,
        cigar=[(0, len(seq))],
    )


def _candidate_and_batch(ref_reads, alt_reads_list, alt_alleles=None):
    """ref_reads: count of target ref reads; alt_reads_list: one list
    of (bq, mapq) per alt allele."""
    if alt_alleles is None:
        alt_alleles = ["T"]
    reads = []
    ref_support = []
    for _ in range(ref_reads):
        ref_support.append(len(reads))
        reads.append(_make_read(40, 60, f"ref{len(reads)}"))
    allele_support = {}
    for alt, infos in zip(alt_alleles, alt_reads_list):
        ids = []
        for bq, mapq in infos:
            ids.append(len(reads))
            reads.append(_make_read(bq, mapq, f"alt{len(reads)}"))
        allele_support[alt] = ids
    # An empty batch still needs one read for valid array shapes.
    batch = ReadBatch.from_reads(
        reads or [_make_read(1, 1, "pad")], ["chr1"]
    )
    candidate = DeepVariantCall(
        variant=Variant(
            reference_name="chr1", start=10, end=11,
            reference_bases="A", alternate_bases=list(alt_alleles),
        ),
        allele_support=allele_support,
        ref_support=ref_support,
    )
    return candidate, batch


def _should_filter(options, candidate, batch) -> bool:
    proc = SimpleNamespace(options=options)
    return RegionProcessor.should_filter_low_vaf(proc, candidate, batch)


def test_filter_disabled():
    candidate, batch = _candidate_and_batch(0, [[]])
    assert not _should_filter(
        _options(filter_low_vaf_candidates=False), candidate, batch
    )


def test_no_target_alt_reads_filtered():
    candidate, batch = _candidate_and_batch(1, [[]])
    assert _should_filter(_options(), candidate, batch)


def test_dp_zero_filtered():
    candidate, batch = _candidate_and_batch(0, [[]])
    assert _should_filter(_options(), candidate, batch)


def test_vaf_above_threshold_not_filtered():
    # 1 alt, 1 ref => vaf = 0.5 > 0.1.
    candidate, batch = _candidate_and_batch(1, [[(30, 40)]])
    assert not _should_filter(_options(), candidate, batch)


def test_vaf_below_threshold_low_bq_filtered():
    # 1 alt / (9 ref + 1 alt) = 0.1 <= 0.1; avg_bq 10 < 20 => filter.
    candidate, batch = _candidate_and_batch(9, [[(10, 40)]])
    assert _should_filter(_options(), candidate, batch)


def test_vaf_below_threshold_low_mapq_filtered():
    # vaf 0.1; bq 30 >= 20 but mapq 10 < 30 => filter.
    candidate, batch = _candidate_and_batch(9, [[(30, 10)]])
    assert _should_filter(_options(), candidate, batch)


def test_vaf_below_threshold_not_filtered():
    # 2 alt / (8 ref + 2 alt) = 0.2 > 0.1 => not filtered.
    candidate, batch = _candidate_and_batch(
        8, [[(30, 40), (30, 40)]]
    )
    assert not _should_filter(_options(), candidate, batch)


def test_vaf_below_threshold_good_quality_not_filtered():
    # 2 alt / (18 ref + 2 alt) = 0.1 <= 0.1; bq 25 >= 20 and
    # mapq 35 >= 30 rescue the allele.
    candidate, batch = _candidate_and_batch(
        18, [[(25, 35), (25, 35)]]
    )
    assert not _should_filter(_options(), candidate, batch)


def test_multiallelic_one_allele_high_vaf_not_filtered():
    # Allele A: vaf 0.2 > 0.1 => valid; allele C fails quality but
    # any valid allele keeps the candidate.
    candidate, batch = _candidate_and_batch(
        8,
        [[(30, 40), (30, 40)], [(10, 10)]],
        alt_alleles=["A", "C"],
    )
    assert not _should_filter(_options(), candidate, batch)


def test_multiallelic_one_allele_good_quality_not_filtered():
    # Allele A: vaf 0.1 but rescued by quality; allele C invalid.
    candidate, batch = _candidate_and_batch(
        18,
        [[(25, 35), (25, 35)], [(10, 10)]],
        alt_alleles=["A", "C"],
    )
    assert not _should_filter(_options(), candidate, batch)


def test_multiallelic_all_alleles_fail_filtered():
    # A: bq 10 < 20 invalid; C: mapq 10 < 30 invalid => filter.
    candidate, batch = _candidate_and_batch(
        9,
        [[(10, 40)], [(30, 10)]],
        alt_alleles=["A", "C"],
    )
    assert _should_filter(_options(), candidate, batch)

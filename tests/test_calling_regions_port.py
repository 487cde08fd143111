"""Port of calling_regions_utils_test.py (:102-330):
build_calling_regions include/exclude algebra and the exact
partition_calling_regions grouping tables over the 5-contig fixture."""

import pytest

from deepvariant_tpu.core.ranges import RangeSet, partition_calling_regions
from deepvariant_tpu.core.types import ContigInfo, Range
from deepvariant_tpu.make_examples.core import (
    MakeExamplesOptions,
    calling_regions_from_options,
)

# Total bps: 2100 (calling_regions_utils_test.py:40-66).
CONTIGS = [
    ContigInfo("chr1", 1000, 0),
    ContigInfo("chr2", 500, 1),
    ContigInfo("chr3", 300, 2),
    ContigInfo("chr4", 200, 3),
    ContigInfo("chr5", 100, 4),
]


def _parse_literal(lit):
    """1-based inclusive literal ('1:5-10') -> Range."""
    if ":" not in lit:
        raise ValueError(lit)
    name, span = lit.split(":")
    lo, hi = span.split("-")
    return Range(name, int(lo) - 1, int(hi))


@pytest.mark.parametrize("includes,excludes,expected", [
    ([], [], ["1:1-100", "2:1-200"]),
    (["1"], [], ["1:1-100"]),
    ([], ["1"], ["2:1-200"]),
    ([], ["2"], ["1:1-100"]),
    ([], ["1", "2"], []),
    (["1"], ["1:1-10"], ["1:11-100"]),
    (["1", "2"], ["1:5-10", "1:20-50", "2:10-20"],
     ["1:1-4", "1:11-19", "1:51-100", "2:1-9", "2:21-200"]),
    (["1"], ["1:5-10", "1:20-50", "2:10-20"],
     ["1:1-4", "1:11-19", "1:51-100"]),
    (["2"], ["1:5-10", "1:20-50", "2:10-20"],
     ["2:1-9", "2:21-200"]),
    (["1:10-20", "2:50-60", "2:70-80"],
     ["1:1-13", "1:19-50", "2:10-65"],
     ["1:14-18", "2:70-80"]),
])
def test_build_calling_regions(includes, excludes, expected):
    contigs = [ContigInfo("1", 100, 0), ContigInfo("2", 200, 1)]
    options = MakeExamplesOptions(
        reads_filename="", ref_filename="", examples_filename="",
        regions=list(includes) or None,
        exclude_regions=list(excludes) or None,
    )
    actual = calling_regions_from_options(options, contigs)
    if actual is None:  # None = unrestricted = the full contig space
        actual = RangeSet.from_contigs(contigs)
    got = sorted(
        (r.reference_name, r.start, r.end) for r in actual
    )
    want = sorted(
        (r.reference_name, r.start, r.end)
        for r in map(_parse_literal, expected)
    )
    assert got == want


PARTITION_CASES = [
    (1, [
        [("chr1", 0, 1000), ("chr2", 0, 500), ("chr3", 0, 300),
         ("chr4", 0, 200), ("chr5", 0, 100)],
    ]),
    (2, [
        [("chr1", 0, 1000), ("chr2", 0, 500)],
        [("chr3", 0, 300), ("chr4", 0, 200), ("chr5", 0, 100)],
    ]),
    (3, [
        [("chr1", 0, 700), ("chr1", 700, 1000)],
        [("chr2", 0, 500), ("chr3", 0, 300)],
        [("chr4", 0, 200), ("chr5", 0, 100)],
    ]),
    (4, [
        [("chr1", 0, 525)],
        [("chr1", 525, 1000)],
        [("chr2", 0, 500), ("chr3", 0, 300)],
        [("chr4", 0, 200), ("chr5", 0, 100)],
    ]),
    (10, [
        [("chr1", 0, 210)],
        [("chr1", 210, 420)],
        [("chr1", 420, 630)],
        [("chr1", 630, 840)],
        [("chr1", 840, 1000)],
        [("chr2", 0, 210)],
        [("chr2", 210, 420), ("chr2", 420, 500)],
        [("chr3", 0, 210), ("chr3", 210, 300)],
        [("chr4", 0, 200)],
        [("chr5", 0, 100)],
    ]),
    (11, [
        [("chr1", 0, 190)],
        [("chr1", 190, 380)],
        [("chr1", 380, 570)],
        [("chr1", 570, 760)],
        [("chr1", 760, 950), ("chr1", 950, 1000)],
        [("chr2", 0, 190)],
        [("chr2", 190, 380)],
        [("chr2", 380, 500)],
        [("chr3", 0, 190)],
        [("chr3", 190, 300), ("chr4", 0, 190)],
        [("chr4", 190, 200), ("chr5", 0, 100)],
    ]),
]


@pytest.mark.parametrize("num_partitions,expected", PARTITION_CASES)
def test_partition_calling_regions(num_partitions, expected):
    groups = partition_calling_regions(
        RangeSet.from_contigs(CONTIGS), num_partitions
    )
    assert len(groups) == num_partitions
    got = [
        [(r.reference_name, r.start, r.end) for r in g] for g in groups
    ]
    assert got == expected


@pytest.mark.parametrize("seq,expected,min_region_len", [
    # make_examples_core_test.py:720-757 test_find_ref_n_regions.
    ("GATACA", [], 3),
    ("NNNGATACA", [("chr1", 0, 3)], 3),
    ("GATACANNN", [("chr1", 6, 9)], 3),
    ("GATACANNNTTT", [("chr1", 6, 9)], 3),
    ("GATACANNNAAAAANNN", [("chr1", 6, 9), ("chr1", 14, 17)], 3),
    # Runs shorter than the threshold are kept.
    ("GANNCA", [], 3),
])
def test_find_ref_n_regions(seq, expected, min_region_len):
    from deepvariant_tpu.io.fasta import InMemoryFasta
    from deepvariant_tpu.make_examples.core import find_ref_n_regions

    reader = InMemoryFasta({"chr1": seq})
    got = [
        (r.reference_name, r.start, r.end)
        for r in find_ref_n_regions(reader, min_region_len)
    ]
    assert got == expected


@pytest.mark.parametrize("region_lits,variant_lits,keep_indices", [
    # make_examples_core_test.py:843-876 test_filter_regions_by_vcf.
    (["x:100-200"], ["x:150-151"], [0]),
    (["x:100-200"], ["y:150-151"], []),
    (["x:100-200", "x:201-300"], ["x:100-101"], [0]),
    (["x:1-10", "x:11-20", "x:21-30"], ["x:11-12"], [1]),
    (["x:11-20", "x:20-30"], ["x:1-2"], []),
    (["x:1-10", "x:11-20", "x:21-30"], ["x:40-50"], []),
    (["x:11-20", "x:21-30"],
     ["x:1-2", "x:25-26", "x:25-26", "x:26-27", "x:40-50"], [1]),
    # A variant spanning multiple regions belongs where it starts.
    (["x:1-10", "x:11-20", "x:21-30", "x:31-40", "x:41-50", "x:51-60"],
     ["x:15-66"], [1]),
])
def test_filter_regions_by_vcf(region_lits, variant_lits, keep_indices):
    from deepvariant_tpu.make_examples.core import filter_regions_by_vcf

    regions = [_parse_literal(l) for l in region_lits]
    variants = [_parse_literal(l) for l in variant_lits]
    got = filter_regions_by_vcf(regions, variants)
    assert got == [regions[i] for i in keep_indices]


@pytest.mark.parametrize("includes,excludes,num_partitions,expected", [
    (["chr1", "chr2", "chr3"], [], 4, [
        [("chr1", 0, 450)],
        [("chr1", 450, 900)],
        [("chr1", 900, 1000), ("chr2", 0, 450)],
        [("chr2", 450, 500), ("chr3", 0, 300)],
    ]),
    (["chr1", "chr2"], ["chr1:0-200"], 3, [
        [("chr1", 200, 633)],
        [("chr1", 633, 1000)],
        [("chr2", 0, 433), ("chr2", 433, 500)],
    ]),
])
def test_build_and_partition_calling_regions(
    includes, excludes, num_partitions, expected
):
    options = MakeExamplesOptions(
        reads_filename="", ref_filename="", examples_filename="",
        regions=list(includes) or None,
        exclude_regions=list(excludes) or None,
    )
    regions = calling_regions_from_options(options, CONTIGS)
    groups = partition_calling_regions(regions, num_partitions)
    got = [
        [(r.reference_name, r.start, r.end) for r in g] for g in groups
    ]
    assert got == expected

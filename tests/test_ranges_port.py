"""Port of nucleus util/ranges_test.py's RangeSet semantic tables
(:106-455, 505-529): merge-on-construction, the position-overlap
detector, intersection, exclude_regions, partitioning, contig
validation, and the iteration-order contract."""

import pytest

from deepvariant_tpu.core.ranges import RangeSet
from deepvariant_tpu.core.types import ContigInfo, Range


def _lit(lit):
    """1-based inclusive literal: '1:5-10', '1:13' (single bp), '1'."""
    name, _, span = lit.partition(":")
    if not span:
        raise ValueError(lit)
    lo, _, hi = span.partition("-")
    return Range(name, int(lo) - 1, int(hi or lo))


def _set(literals, contigs=None):
    return RangeSet(map(_lit, literals), contigs)


def _tuples(range_set):
    return [(r.reference_name, r.start, r.end) for r in range_set]


@pytest.mark.parametrize("regions,expected", [
    (["1:1-5", "1:3-8"], ["1:1-8"]),
    (["1:1-5", "1:3-8", "1:6-9"], ["1:1-9"]),
    (["1:1-5", "1:5-8"], ["1:1-8"]),
    (["1:1-5", "1:5-8", "1:8-10"], ["1:1-10"]),
    (["1:1-5", "1:6-8"], ["1:1-5", "1:6-8"]),
])
def test_overlapping_and_adjacent_ranges_are_merged(regions, expected):
    assert _tuples(_set(regions)) == _tuples(_set(expected))


def test_detector_ranges():
    range_set = RangeSet([
        Range("chr1", 0, 5), Range("chr1", 8, 10),
        Range("chr1", 12, 13), Range("chr2", 2, 5),
    ])
    assert bool(range_set) is True
    assert len(range_set) == 4
    expected_chr1 = {0, 1, 2, 3, 4, 8, 9, 12}
    for pos in list(range(14)) + [100, 1000]:
        assert range_set.overlaps("chr1", pos) == (pos in expected_chr1)
    for pos in range(7):
        assert range_set.overlaps("chr2", pos) == (2 <= pos < 5)
    assert not range_set.overlaps("chr3", 3)


def test_unrecognized_contig_triggers_exception():
    with pytest.raises(ValueError):
        RangeSet(
            [Range("bogus_chromosome", 1, 10)],
            [ContigInfo("chr1", 10, 0)],
        )


INTERSECTION_CASES = [
    ([["1:1-10"]], ["1:1-10"]),
    ([["1:1-10"], ["1:1-10"]], ["1:1-10"]),
    ([["1:1-10"], ["1:1-10"], ["1:1-10"]], ["1:1-10"]),
    ([["1:1-10"], ["1:11-15"]], []),
    ([["1:1-10"], ["1:10-15"]], ["1:10-10"]),
    ([["1:1-10"], ["1:9-15"]], ["1:9-10"]),
    ([["1:5-10"], ["1:1-15"]], ["1:5-10"]),
    ([["1:5-10"], ["1:1-4"]], []),
    ([["1:5-10"], ["1:1-5"]], ["1:5-5"]),
    ([["1:5-15"], ["1:6-8", "1:10-12"]], ["1:6-8", "1:10-12"]),
    ([["1:5-15"], ["1:3-8", "1:10-12"]], ["1:5-8", "1:10-12"]),
    ([["1:5-15"], ["1:3-8", "1:10-20"]], ["1:5-8", "1:10-15"]),
    ([["1:5-15"], ["1:3-8", "1:6-10"]], ["1:5-10"]),
    ([["1:5-15"], ["1:3-8", "1:6-10", "1:13-13"]], ["1:5-10", "1:13-13"]),
    ([["1:5-15", "1:20-25"], ["1:3-8", "1:16-23"]], ["1:5-8", "1:20-23"]),
    ([["1:5-15", "1:20-25"], ["1:3-8", "1:50-60"]], ["1:5-8"]),
    ([["1:5-15", "1:20-25"], ["1:3-4", "1:16-23"]], ["1:20-23"]),
    ([["1:10-20"], ["1:5-15"]], ["1:10-15"]),
    ([["1:10-20"], ["1:5-15"], ["1:13-30"]], ["1:13-15"]),
    ([["1:10-20"], ["1:5-15"], ["1:25-30"]], []),
    ([["1:10-20"], ["2:10-20"]], []),
    ([["1:10-20", "2:11-14"], ["1:11-14"]], ["1:11-14"]),
    ([["1:10-20", "2:11-14"], ["2:10-20"]], ["2:11-14"]),
]


@pytest.mark.parametrize("regions,expected", INTERSECTION_CASES)
def test_intersection(regions, expected):
    sets = [_set(r) for r in regions]
    result = sets[0]
    for s in sets[1:]:
        result = result.intersection(s)
    assert _tuples(result) == _tuples(_set(expected))
    # Same result intersecting in the reverse direction.
    rev = sets[-1]
    for s in reversed(sets[:-1]):
        rev = rev.intersection(s)
    assert _tuples(rev) == _tuples(_set(expected))


@pytest.mark.parametrize("lhs,rhs,expected", [
    (["1:1-100"], ["1:10-20"], ["1:1-9", "1:21-100"]),
    (["1:1-100"], [], ["1:1-100"]),
    (["1:1-100", "2:1-10"], ["2:1-100"], ["1:1-100"]),
    (["1:1-100"], ["1:10-20", "1:15-30"], ["1:1-9", "1:31-100"]),
    (["1:1-100"], ["1:10-20", "1:30-40"],
     ["1:1-9", "1:21-29", "1:41-100"]),
    (["1:1-100"], ["2:1-100"], ["1:1-100"]),
    (["1:1-100"], ["1:1-100"], []),
    ([], ["1:1-100"], []),
])
def test_exclude_regions(lhs, rhs, expected):
    got = _set(lhs).exclude_regions(_set(rhs))
    assert _tuples(got) == _tuples(_set(expected))


@pytest.mark.parametrize("interval_size,expected", [
    (50, [("chr1", 0, 50), ("chr1", 50, 76), ("chr2", 0, 50),
          ("chr2", 50, 100), ("chr2", 100, 121), ("chrM", 0, 50),
          ("chrM", 50, 100)]),
    (120, [("chr1", 0, 76), ("chr2", 0, 120), ("chr2", 120, 121),
           ("chrM", 0, 100)]),
    (500, [("chr1", 0, 76), ("chr2", 0, 121), ("chrM", 0, 100)]),
])
def test_partitions(interval_size, expected):
    rangeset = RangeSet([
        Range("chrM", 0, 100), Range("chr1", 0, 76), Range("chr2", 0, 121),
    ])
    got = [
        (r.reference_name, r.start, r.end)
        for r in rangeset.partition(interval_size)
    ]
    assert got == expected


def test_partitions_bad_interval_size_raises():
    rs = RangeSet([Range("chrM", 0, 100)])
    with pytest.raises(ValueError, match="size"):
        list(rs.partition(-10))
    with pytest.raises(ValueError, match="size"):
        list(rs.partition(0))


@pytest.mark.parametrize("interval_size,expected", [
    (10, [("1", 0, 10), ("1", 20, 30), ("1", 30, 40), ("1", 45, 50)]),
    (7, [("1", 0, 7), ("1", 7, 10), ("1", 20, 27), ("1", 27, 34),
         ("1", 34, 40), ("1", 45, 50)]),
    (50, [("1", 0, 10), ("1", 20, 40), ("1", 45, 50)]),
])
def test_partition_of_multiple_intervals(interval_size, expected):
    rangeset = RangeSet([
        Range("1", 0, 10), Range("1", 20, 40), Range("1", 45, 50),
    ])
    got = [
        (r.reference_name, r.start, r.end)
        for r in rangeset.partition(interval_size)
    ]
    assert got == expected


def test_from_contigs_preserves_fasta_order():
    contigs = [ContigInfo("chr1", 10, 0), ContigInfo("chr2", 5, 1)]
    got = _tuples(RangeSet.from_contigs(contigs))
    assert got == [("chr1", 0, 10), ("chr2", 0, 5)]


def test_rangeset_iteration_order():
    """ranges_test.py:505-529: contigs metadata orders by FASTA
    position; no metadata orders contig names lexicographically."""
    unsorted = [
        Range("a", 9, 10), Range("c", 19, 20), Range("b", 29, 30),
        Range("b", 9, 15), Range("a", 4, 5),
    ]
    contigs = [
        ContigInfo("c", 100, 0), ContigInfo("a", 76, 1),
        ContigInfo("b", 121, 2),
    ]
    with_contigs = RangeSet(unsorted, contigs)
    assert _tuples(with_contigs) == [
        ("c", 19, 20), ("a", 4, 5), ("a", 9, 10),
        ("b", 9, 15), ("b", 29, 30),
    ]
    no_contigs = RangeSet(unsorted)
    assert _tuples(no_contigs) == [
        ("a", 4, 5), ("a", 9, 10), ("b", 9, 15),
        ("b", 29, 30), ("c", 19, 20),
    ]

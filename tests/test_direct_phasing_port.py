"""Port of the reference's direct_phasing_test.cc behavioral corpus
(1240 LoC: read phase assignments, error correction, broken phase
blocks, score ties, candidate filters) onto our DirectPhasing."""

import pytest

from deepvariant_tpu.core.types import Variant
from deepvariant_tpu.make_examples.variant_caller import DeepVariantCall
from deepvariant_tpu.phasing.direct_phasing import (
    DirectPhasing,
    DirectPhasingOptions,
)

# The reference test fixture runs with min_alleles_to_phase=2
# (direct_phasing_test.cc:72-73), while production uses the flag
# default of 1 (make_examples_options.py:676-683).
TEST_OPTIONS = DirectPhasingOptions(min_alleles_to_phase=2)


def cand(start, end, support, ref_support=()):
    """MakeCandidate analog: support maps alt bases -> 1-based read ids
    (the reference's readN names), stored as 0-based indices."""
    v = Variant(
        reference_name="chr1", start=start, end=end,
        reference_bases="A" * (end - start),
        alternate_bases=list(support),
    )
    return DeepVariantCall(
        variant=v,
        allele_support={
            alt: [r - 1 for r in reads] for alt, reads in support.items()
        },
        ref_support=[r - 1 for r in ref_support],
    )


def phase(candidates, n_reads):
    return DirectPhasing(TEST_OPTIONS).phase_reads(candidates, n_reads)


def test_phase_read_simple():
    candidates = [
        cand(100, 101, {"A": [1, 2, 3], "C": [4, 5]}),
        cand(105, 106, {"C": [1, 2, 4, 5]}),
        cand(110, 111, {"T": [1, 2, 3], "G": [4, 5]}),
    ]
    assert phase(candidates, 5) == [1, 1, 1, 2, 2]


def test_phase_read_with_error_correction():
    # read3 supports phase 1 at 100 but phase 2 at 110; the majority
    # vote still phases it 1.
    candidates = [
        cand(100, 101, {"A": [1, 2, 3], "C": [4, 5]}),
        cand(105, 106, {"C": [1, 2, 3, 4, 5]}),
        cand(110, 111, {"T": [1, 2], "G": [3, 4, 5]}),
        cand(120, 121, {"T": [1, 2, 3], "G": [4, 5]}),
    ]
    assert phase(candidates, 5) == [1, 1, 1, 2, 2]


def test_phase_read_changed_order_of_alleles():
    # The phase-1 allele flips from first to second position in later
    # candidates; assignments must stay consistent.
    candidates = [
        cand(100, 101, {"A": [1, 2, 3], "C": [4, 5]}),
        cand(105, 106, {"C": [1, 2, 3, 4, 5]}),
        cand(110, 111, {"T": [4, 5], "G": [1, 2, 3]}),
        cand(120, 121, {"G": [4, 5], "T": [1, 2, 3]}),
    ]
    assert phase(candidates, 5) == [1, 1, 1, 2, 2]


def test_phase_read_unphased_read():
    # read3 splits its support between both phases: unassigned.
    candidates = [
        cand(100, 101, {"A": [1, 2, 3], "C": [4, 5]}),
        cand(105, 106, {"C": [1, 2, 3, 4, 5]}),
        cand(110, 111, {"T": [1, 2], "G": [4, 5, 3]}),
    ]
    assert phase(candidates, 5) == [1, 1, 0, 2, 2]


def test_phase_read_broken_path():
    # No edge between A@100 and G@105. The connected component phases
    # consistently (reads 4,5 -> 2; 6,7 -> 1). The dangling A@100
    # vertex still receives phase 1 through the zero-weight bridge
    # edges, but its reads each overlap only ONE phased allele, below
    # the fixture's min_alleles_to_phase=2, so they stay unphased --
    # which is how the reference's assertion (phases 0 for reads 1-3,
    # direct_phasing_test.cc:636-650) coexists with its comment that
    # the alleles "can be assigned any phase".
    candidates = [
        cand(100, 101, {"A": [1, 2, 3], "C": [4, 5]}),
        cand(105, 106, {"C": [4, 5], "G": [6, 7]}),
        cand(110, 111, {"T": [6, 7], "G": [4, 5]}),
    ]
    assert phase(candidates, 7) == [0, 0, 0, 2, 2, 1, 1]


def test_phase_read_broken_path_no_connection():
    # Two disconnected phase blocks each get phased independently.
    candidates = [
        cand(100, 101, {"A": [1, 2, 3], "C": [4, 5]}),
        cand(105, 106, {"C": [1, 2, 3], "G": [4, 5]}),
        cand(110, 111, {"C": [6, 7], "G": [8, 9]}),
        cand(120, 121, {"T": [6, 7], "G": [8, 9]}),
    ]
    assert phase(candidates, 9) == [1, 1, 1, 2, 2, 1, 1, 2, 2]


def test_phase_read_fully_connected_graph():
    candidates = [
        cand(100, 101, {"A": [1, 2, 3], "C": [4, 5, 6]}),
        cand(105, 106, {"C": [4, 5, 1], "G": [2, 3, 6]}),
        cand(110, 111, {"T": [1, 2, 3], "G": [4, 5, 6]}),
    ]
    assert phase(candidates, 6) == [1, 1, 1, 2, 2, 2]


def test_two_blocks_with_score_tie():
    # The second block (single candidate at 120) has no connecting
    # evidence: its reads stay unphased and the phased variants span
    # only the first block.
    candidates = [
        cand(100, 101, {"A": [1, 2], "C": [3, 4]}),
        cand(110, 111, {"G": [1, 2], "T": [3, 4]}),
        cand(120, 121, {
            "A": [5, 6, 7, 8], "C": [9, 10, 11, 12],
        }),
    ]
    dp = DirectPhasing(TEST_OPTIONS)
    phases = dp.phase_reads(candidates, 12)
    assert phases == [1, 1, 2, 2, 0, 0, 0, 0, 0, 0, 0, 0]
    pv = dp.phased_variants()
    assert [(p.position, p.phase_1_bases, p.phase_2_bases,
             p.is_first_in_block) for p in pv] == [
        (100, "A", "C", True),
        (110, "G", "T", False),
    ]


def test_filter_one_allele_candidate():
    # A candidate with a single alt allele and almost no ref support
    # is uninformative for phasing (likely homozygous) and is
    # filtered from the graph; reads keep phases from the flanking
    # het candidates.
    candidates = [
        cand(100, 101, {"A": [1, 2, 3], "C": [4, 5]}),
        cand(105, 106, {"C": [4, 5, 6]}, ref_support=[7]),
        cand(110, 111, {"T": [1, 2, 3], "G": [4, 5]}),
    ]
    phases = phase(candidates, 7)
    assert phases[:5] == [1, 1, 1, 2, 2]


def test_reuse_object():
    dp = DirectPhasing(TEST_OPTIONS)
    candidates = [
        cand(100, 101, {"A": [1, 2, 3], "C": [4, 5]}),
        cand(105, 106, {"C": [1, 2, 4, 5]}),
        cand(110, 111, {"T": [1, 2, 3], "G": [4, 5]}),
    ]
    first = dp.phase_reads(candidates, 5)
    second = dp.phase_reads(candidates, 5)
    assert first == second == [1, 1, 1, 2, 2]

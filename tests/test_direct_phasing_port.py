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


# -- helper-function semantics (direct_phasing_test.cc:108-190) -----------

from deepvariant_tpu.phasing.direct_phasing import (  # noqa: E402
    DELETION,
    INSERTION,
    SUBSTITUTION,
    allele_type_from_candidate,
    num_of_indel_alleles,
    num_of_substitution_alleles,
    substitution_alleles_depth,
)
from deepvariant_tpu.make_examples.variant_caller import (  # noqa: E402
    SUPPORTING_UNCALLED_ALLELE,
)


@pytest.mark.parametrize("bases,start,end,expected", [
    ("CC", 100, 102, SUBSTITUTION),
    ("C", 100, 102, DELETION),
    ("CCC", 100, 101, INSERTION),
    ("A", 100, 101, SUBSTITUTION),
])
def test_allele_type_from_candidate(bases, start, end, expected):
    assert allele_type_from_candidate(
        bases, cand(start, end, {})
    ) == expected


def test_num_substitution_alleles_multiple_sub():
    c = cand(100, 101, {"A": [1, 2, 3], "C": [4, 5], "CC": [6, 7]})
    assert num_of_substitution_alleles(c) == 2


def test_num_substitution_alleles_uncalled_present():
    c = cand(100, 101, {
        SUPPORTING_UNCALLED_ALLELE: [1, 2, 3],
        "C": [4, 5], "CC": [6, 7],
    })
    assert num_of_substitution_alleles(c) == 1


def test_num_indel_alleles_2sub_1indel():
    c = cand(100, 101, {"A": [1, 2, 3], "C": [4, 5], "CC": [6, 7]})
    assert num_of_indel_alleles(c) == 1


def test_num_indel_alleles_uncalled_present():
    c = cand(100, 103, {
        SUPPORTING_UNCALLED_ALLELE: [1, 2, 3],
        "C": [4, 5], "CCCC": [6, 7],
    })
    assert num_of_indel_alleles(c) == 2


def test_substitution_alleles_depth_2sub():
    c = cand(100, 101, {"A": [1, 2, 3], "C": [4, 5], "CC": [6, 7]})
    assert substitution_alleles_depth(c) == 5


def test_substitution_alleles_depth_uncalled_and_indels():
    c = cand(100, 103, {
        SUPPORTING_UNCALLED_ALLELE: [1, 2, 3],
        "C": [4, 5], "CCCC": [6, 7],
    })
    assert substitution_alleles_depth(c) == 0


# -- graph construction + scoring (direct_phasing_test.cc:243-489) --------

def _vid(dp, position, bases):
    for vid in dp.vertices_by_position.get(position, []):
        if dp.vertices[vid].bases == bases:
            return vid
    raise AssertionError(f"no vertex {bases!r} at {position}")


def _three_candidate_graph():
    return [
        cand(100, 101, {"A": [1, 2, 3], "C": [4, 5]}),
        cand(105, 106, {"C": [1, 2, 4, 5]}, ref_support=[6, 7, 8]),
        cand(110, 111, {"T": [1, 2, 3], "G": [4, 5]}),
    ]


def test_build_graph_simple():
    """BuildGraphSimple (direct_phasing_test.cc:243): vertices for both
    alleles at het positions plus the REF vertex at 105, edges along
    shared reads between consecutive positions."""
    dp = DirectPhasing(TEST_OPTIONS)
    dp.build(_three_candidate_graph())
    v_100_a = _vid(dp, 100, "A")
    v_100_c = _vid(dp, 100, "C")
    v_105_c = _vid(dp, 105, "C")
    v_105_ref = _vid(dp, 105, "REF")
    v_110_t = _vid(dp, 110, "T")
    v_110_g = _vid(dp, 110, "G")
    assert (v_100_a, v_105_c) in dp.edges
    assert (v_100_c, v_105_c) in dp.edges
    assert (v_105_c, v_110_t) in dp.edges
    assert (v_105_c, v_110_g) in dp.edges
    # No edge skips a position, and no edge reaches the REF vertex
    # from reads 1-5 (its support is reads 6-8).
    assert (v_100_a, v_110_t) not in dp.edges
    assert not any(e[1] == v_105_ref for e in dp.edges)


def test_calculate_score_first_iteration():
    """CalculateScoreFirstIteration (direct_phasing_test.cc:366)."""
    dp = DirectPhasing(TEST_OPTIONS)
    dp.build(_three_candidate_graph())
    v_100_a = _vid(dp, 100, "A")
    v_100_c = _vid(dp, 100, "C")
    v_105_c = _vid(dp, 105, "C")
    dp._starting_score([v_100_a, v_100_c])
    score = dp._calculate_score(
        (v_100_a, v_105_c), (v_100_c, v_105_c)
    )
    assert score.score == 5 + 4
    assert score.from_pair == (v_100_a, v_100_c)
    assert score.read_support == ({0, 1}, {3, 4})


def test_calculate_score_with_previous_score():
    """CalculateScoreWithPreviousScore (direct_phasing_test.cc:414):
    all four edge combinations out of the shared 105 vertex."""
    dp = DirectPhasing(TEST_OPTIONS)
    dp.build(_three_candidate_graph())
    v_100_a = _vid(dp, 100, "A")
    v_100_c = _vid(dp, 100, "C")
    v_105_c = _vid(dp, 105, "C")
    v_110_t = _vid(dp, 110, "T")
    v_110_g = _vid(dp, 110, "G")
    dp._starting_score([v_100_a, v_100_c])
    dp.scores[(v_105_c, v_105_c)] = dp._calculate_score(
        (v_100_a, v_105_c), (v_100_c, v_105_c)
    )
    e1 = (v_105_c, v_110_t)
    e2 = (v_105_c, v_110_g)
    s11 = dp._calculate_score(e1, e1)
    assert (s11.score, s11.read_support) == (5 + 4 + 2, ({0, 1}, set()))
    s22 = dp._calculate_score(e2, e2)
    assert (s22.score, s22.read_support) == (5 + 4 + 2, (set(), {3, 4}))
    s12 = dp._calculate_score(e1, e2)
    assert (s12.score, s12.read_support) == (5 + 4 + 4, ({0, 1}, {3, 4}))
    s21 = dp._calculate_score(e2, e1)
    assert (s21.score, s21.read_support) == (5 + 4 + 0, (set(), set()))


# -- behavioral (direct_phasing_test.cc:752-1032) --------------------------

def test_not_phasable_position():
    """NotPhasablePosition (direct_phasing_test.cc:752): a position
    whose partitions all tie stays unphased and restarts scoring."""
    candidates = [
        cand(100, 101, {"A": [1, 2, 3, 10], "C": [4, 5]}),
        cand(105, 106, {"C": [1, 2, 3, 10, 11],
                        "G": [4, 5, 12, 13]}),
        cand(110, 111, {"C": [10, 13], "G": [11, 12]}),
        cand(120, 121, {"T": [6, 7], "G": [8, 9]}),
        cand(125, 126, {"A": [6, 7], "T": [8, 9]}),
    ]
    dp = DirectPhasing(TEST_OPTIONS)
    dp.phase_reads(candidates, 13)
    v_110_c = _vid(dp, 110, "C")
    v_110_g = _vid(dp, 110, "G")
    assert dp.scores[(v_110_c, v_110_g)].score == 4
    assert dp.scores[(v_110_c, v_110_c)].score == 2
    assert dp.scores[(v_110_g, v_110_g)].score == 2
    assert dp.vertices[v_110_c].phase == 0
    assert dp.vertices[v_110_g].phase == 0


def test_unordered_input_rejected():
    """PhaseReadUnorderedInputFail (direct_phasing_test.cc:853): the
    reference CHECK-fails; we raise."""
    candidates = [
        cand(105, 106, {"C": [4, 5, 1], "G": [2, 3, 6]}),
        cand(100, 101, {"A": [1, 2, 3], "C": [4, 5, 6]}),
        cand(110, 111, {"T": [1, 2, 3], "G": [4, 5, 6]}),
    ]
    with pytest.raises(ValueError):
        phase(candidates, 6)


def test_out_of_order_in_the_middle_rejected():
    """PhaseReadCandidateOutOfOrderInTheMiddle
    (direct_phasing_test.cc:881)."""
    candidates = [
        cand(100, 101, {"A": [1, 2, 3], "C": [4, 5, 6]}),
        cand(105, 106, {"C": [4, 5, 1], "G": [2, 3, 6]}),
        cand(104, 105, {"T": [1, 2, 3], "G": [4, 5, 6]}),
        cand(110, 111, {"T": [1, 2, 3], "G": [4, 5, 6]}),
    ]
    with pytest.raises(ValueError):
        phase(candidates, 6)


def test_filter_candidate_with_indel():
    """FilterCandidateWithIndel (direct_phasing_test.cc:998): a
    candidate carrying an indel allele creates no vertices."""
    candidates = [
        cand(100, 102, {"CC": [4, 5, 6], "A": [1, 2]},
             ref_support=[7]),
        cand(110, 111, {"T": [1, 2, 3], "G": [4, 5, 6]}),
    ]
    dp = DirectPhasing(TEST_OPTIONS)
    dp.build(candidates)
    assert 100 not in dp.vertices_by_position
    assert 110 in dp.vertices_by_position


# -- phased-variant reporting (direct_phasing_test.cc:1081-1240) -----------

def _pv_tuples(dp):
    return [
        (pv.position, pv.phase_1_bases, pv.phase_2_bases,
         pv.is_first_in_block)
        for pv in dp.phased_variants()
    ]


def test_get_phased_variants_sanity():
    candidates = [
        cand(100, 101, {"A": [1, 2, 3], "C": [4, 5, 6]}),
        cand(105, 106, {"C": [4, 5, 1], "G": [2, 3, 6]}),
        cand(110, 111, {"T": [1, 2, 3], "G": [4, 5, 6]}),
    ]
    dp = DirectPhasing(TEST_OPTIONS)
    dp.phase_reads(candidates, 6)
    assert _pv_tuples(dp) == [
        (100, "A", "C", True),
        (105, "G", "C", False),
        (110, "T", "G", False),
    ]


def test_get_phased_variants_with_broken_phase():
    candidates = [
        cand(100, 101, {"A": [1, 2, 3, 10], "C": [4, 5]}),
        cand(105, 106, {"C": [1, 2, 3, 10, 11],
                        "G": [4, 5, 12, 13]}),
        cand(110, 111, {"C": [10, 13], "G": [11, 12]}),
        cand(120, 121, {"T": [6, 7], "G": [8, 9]}),
        cand(125, 126, {"A": [6, 7], "T": [8, 9]}),
    ]
    dp = DirectPhasing(TEST_OPTIONS)
    dp.phase_reads(candidates, 13)
    assert _pv_tuples(dp) == [
        (100, "A", "C", True),
        (105, "C", "G", False),
        # 110 unphasable -> absent
        (120, "G", "T", True),
        (125, "T", "A", False),
    ]


def test_get_phased_variants_broken_phase_no_connection():
    candidates = [
        cand(100, 101, {"A": [1, 2, 3], "C": [4, 5, 6]}),
        cand(105, 106, {"C": [4, 5, 1], "G": [2, 3, 6]}),
        cand(110, 111, {"C": [7, 8, 9], "G": [10, 11, 12]}),
        cand(120, 121, {"T": [10, 11, 9], "G": [7, 8, 12]}),
    ]
    dp = DirectPhasing(TEST_OPTIONS)
    dp.phase_reads(candidates, 12)
    assert _pv_tuples(dp) == [
        (100, "A", "C", True),
        (105, "G", "C", False),
        (110, "C", "G", True),
        (120, "G", "T", False),
    ]

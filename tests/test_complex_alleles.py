"""Port of the reference's complex-allele corpus
(variant_calling_multisample_test.cc:639-1135:
CreateComplexAllelesSupportTests + ComplexVariantTests) onto our
VerySensitiveCaller --create_complex_alleles path."""

import numpy as np
import pytest

from deepvariant_tpu.core.types import Range
from deepvariant_tpu.make_examples.allele_counter import (
    DELETION,
    INSERTION,
    REFERENCE,
    SUBSTITUTION,
    AlleleCounter,
    AlleleCounterOptions,
    PositionCount,
    ReadAlleleRecord,
)
from deepvariant_tpu.make_examples.variant_caller import (
    AlleleAtPosition,
    VariantCallerOptions,
    VerySensitiveCaller,
    create_complex_alleles_support,
)


def aap(bases, type_, pos):
    return AlleleAtPosition(bases, type_, pos)


class TestCreateComplexAllelesSupport:
    """Pinned cases from CreateComplexAllelesSupportTests (:710-790).
    Read names become integer ids (readN -> N)."""

    DEL = dict(del_start=8, del_len=6, ref="CCGAATG")

    def run(self, read_to_alt, **kw):
        cfg = dict(self.DEL)
        cfg.update(kw)
        return create_complex_alleles_support(
            read_to_alt, cfg["del_start"], cfg["del_len"], cfg["ref"]
        )

    def test_two_snps_same_reads(self):
        out = self.run({
            1: [aap("A", SUBSTITUTION, 10), aap("C", SUBSTITUTION, 13)],
            2: [aap("A", SUBSTITUTION, 10), aap("C", SUBSTITUTION, 13)],
            3: [aap("A", SUBSTITUTION, 10), aap("T", REFERENCE, 13)],
        })
        assert {k: sorted(v) for k, v in out.items()} == {
            "CCAAACG": [1, 2], "CCAAATG": [3],
        }

    def test_insertion_plus_snp(self):
        out = self.run({
            1: [aap("GATT", INSERTION, 10), aap("C", SUBSTITUTION, 13)],
            2: [aap("GATT", INSERTION, 10), aap("C", SUBSTITUTION, 13)],
            3: [aap("A", SUBSTITUTION, 10), aap("T", REFERENCE, 13)],
        })
        assert {k: sorted(v) for k, v in out.items()} == {
            "CCGATTAACG": [1, 2], "CCAAATG": [3],
        }

    def test_three_distinct_complex_alleles(self):
        out = self.run({
            1: [aap("A", SUBSTITUTION, 10), aap("C", SUBSTITUTION, 13)],
            2: [aap("A", SUBSTITUTION, 10), aap("A", SUBSTITUTION, 13)],
            3: [aap("A", SUBSTITUTION, 10), aap("T", REFERENCE, 13)],
        })
        assert {k: sorted(v) for k, v in out.items()} == {
            "CCAAACG": [1], "CCAAAAG": [2], "CCAAATG": [3],
        }

    def test_allele_past_deletion_end_drops_site(self):
        # read1's SNP at 15 falls outside [8, 14): the whole site drops
        # (:769-775).
        out = self.run({
            1: [aap("A", SUBSTITUTION, 10), aap("C", SUBSTITUTION, 15)],
            2: [aap("A", SUBSTITUTION, 10), aap("A", SUBSTITUTION, 13)],
            3: [aap("A", SUBSTITUTION, 10), aap("T", REFERENCE, 13)],
        })
        assert out == {}

    def test_snp_at_deletion_start(self):
        out = self.run({
            1: [aap("A", SUBSTITUTION, 8), aap("C", SUBSTITUTION, 13)],
            2: [aap("A", SUBSTITUTION, 8), aap("C", SUBSTITUTION, 13)],
            3: [aap("A", SUBSTITUTION, 10), aap("T", REFERENCE, 13)],
        })
        assert {k: sorted(v) for k, v in out.items()} == {
            "ACGAACG": [1, 2], "CCAAATG": [3],
        }


def build_counter(ref_seq, start, entries):
    """AlleleCounter with hand-authored per-position records
    (MakeTestMultiAlleleCount analog). entries: list of
    (interval_pos, [(read_id, bases, type)], [ref_read_ids])."""
    counter = AlleleCounter(
        np.frombuffer(ref_seq.encode(), np.uint8),
        Range("chr1", start, start + len(ref_seq)),
        AlleleCounterOptions(track_ref_reads=True),
    )
    for pos, alt_records, ref_ids in entries:
        pc = counter._pc(pos)
        for rid, bases, type_ in alt_records:
            pc.read_alleles[rid] = ReadAlleleRecord(
                read_idx=rid, bases=bases, type=type_,
                is_low_quality=False, mapping_quality=60,
                avg_base_quality=30, is_reverse_strand=False,
            )
        for rid in ref_ids:
            pc.ref_supporting_read_ids.append(rid)
            pc.ref_supporting_read_count += 1
        counter.ref_count[pos] += len(ref_ids)
    return counter


def make_caller(**kw):
    return VerySensitiveCaller(VariantCallerOptions(
        create_complex_alleles=True, **kw,
    ))


class TestComplexVariant:
    """Pinned cases from ComplexVariantTests (:797-1135). Ref window
    'NNNNNNNACTGGATCANNNNNNN' places the deletion at genomic 7."""

    REF = "AAAAAAAACTGGATCAAAAAAAA"  # A-filled stand-in for N flanks

    def call(self, entries, pos=7, prev_deletion_end=0):
        counter = build_counter(self.REF, 0, entries)
        caller = make_caller()
        state = {"prev_deletion_end": prev_deletion_end,
                 "skip_until": -1}
        return caller.call_position(counter, pos, _state=state), state

    def test_deletion_overlapping_one_snp(self):
        # Del ACTGGATCA->A (reads 1-3), SNP T->G at 9 (reads 4-6 which
        # are REF at the deletion): expect complex alt ACGGGATCA.
        call, _ = self.call([
            (7, [(1, "ACTGGATCA", DELETION), (2, "ACTGGATCA", DELETION),
                 (3, "ACTGGATCA", DELETION)], [4, 5, 6]),
            (9, [(4, "G", SUBSTITUTION), (5, "G", SUBSTITUTION),
                 (6, "G", SUBSTITUTION)], []),
        ])
        assert call is not None
        v = call.variant
        assert v.reference_bases == "ACTGGATCA"
        assert sorted(v.alternate_bases) == ["A", "ACGGGATCA"]
        assert sorted(call.allele_support["ACGGGATCA"]) == [4, 5, 6]
        assert sorted(call.allele_support["A"]) == [1, 2, 3]

    def test_deletion_overlapping_two_snps(self):
        call, _ = self.call([
            (7, [(r, "ACTGGATCA", DELETION) for r in (1, 2, 3)],
             [4, 5, 6]),
            (9, [(r, "G", SUBSTITUTION) for r in (4, 5, 6)], []),
            (12, [(r, "T", SUBSTITUTION) for r in (4, 5, 6)], []),
        ])
        v = call.variant
        assert sorted(v.alternate_bases) == ["A", "ACGGGTTCA"]

    def test_two_snps_different_reads(self):
        call, _ = self.call([
            (7, [(r, "ACTGGATCA", DELETION) for r in (1, 2, 3)],
             [4, 5, 6, 7, 8, 9]),
            (9, [(r, "G", SUBSTITUTION) for r in (4, 5, 6)],
             [7, 8, 9]),
            (12, [(r, "T", SUBSTITUTION) for r in (7, 8, 9)],
             [4, 5, 6]),
        ])
        assert sorted(call.variant.alternate_bases) == [
            "A", "ACGGGATCA", "ACTGGTTCA",
        ]

    def test_snp_and_insertion(self):
        call, _ = self.call([
            (7, [(r, "ACTGGATCA", DELETION) for r in (1, 2, 3)],
             [4, 5, 6, 7, 8, 9]),
            (9, [(r, "G", SUBSTITUTION) for r in (4, 5, 6)],
             [7, 8, 9]),
            (12, [(r, "ATT", INSERTION) for r in (7, 8, 9)],
             [4, 5, 6]),
        ])
        assert sorted(call.variant.alternate_bases) == [
            "A", "ACGGGATCA", "ACTGGATTTCA",
        ]

    def test_snp_before_deletion_not_complex(self):
        # SNP strictly before the deletion start: normal candidate.
        call, _ = self.call([
            (7, [(r, "T", SUBSTITUTION) for r in (4, 5, 6)], [1, 2, 3]),
            (8, [(r, "CT", DELETION) for r in (1, 2, 3)], [4, 5, 6]),
        ], pos=8)
        assert call.variant.alternate_bases == ["C"]
        assert call.variant.reference_bases == "CT"

    def test_one_base_deletion_with_snp(self):
        call, _ = self.call([
            (7, [(r, "AC", DELETION) for r in (1, 2, 3)], [4, 5, 6]),
            (8, [(r, "A", SUBSTITUTION) for r in (4, 5, 6)], []),
        ])
        assert sorted(call.variant.alternate_bases) == ["A", "AA"]
        assert call.variant.reference_bases == "AC"

    def test_two_deletions_no_complex(self):
        # Overlapping deletions of different lengths: no complex
        # variant; both deletions called normally.
        call, _ = self.call([
            (7, [(1, "ACTG", DELETION), (2, "ACTG", DELETION),
                 (3, "ACTG", DELETION), (4, "ACT", DELETION),
                 (5, "ACT", DELETION), (6, "ACT", DELETION)], []),
        ])
        assert sorted(call.variant.alternate_bases) == ["A", "AG"]
        assert call.variant.reference_bases == "ACTG"

    def test_two_deletions_plus_snp_no_complex(self):
        call, _ = self.call([
            (7, [(1, "ACTG", DELETION), (2, "ACTG", DELETION),
                 (3, "ACTG", DELETION), (4, "ACT", DELETION),
                 (5, "ACT", DELETION), (6, "ACT", DELETION)], []),
            (10, [(r, "A", SUBSTITUTION) for r in (4, 5, 6)], []),
        ])
        assert sorted(call.variant.alternate_bases) == ["A", "AG"]

    def test_prev_deletion_gates_complex(self):
        # Same as the first case but prev_deletion_end covers this
        # position: complex creation is skipped (test case 9).
        call, _ = self.call([
            (7, [(r, "ACTGGATCA", DELETION) for r in (1, 2, 3)],
             [4, 5, 6]),
            (9, [(r, "G", SUBSTITUTION) for r in (4, 5, 6)], []),
        ], prev_deletion_end=8)
        assert call.variant.alternate_bases == ["A"]

    def test_state_updates(self):
        call, state = self.call([
            (7, [(r, "ACTGGATCA", DELETION) for r in (1, 2, 3)],
             [4, 5, 6]),
            (9, [(r, "G", SUBSTITUTION) for r in (4, 5, 6)], []),
        ])
        # Deletion present: prev_deletion_end = start + len(ref_bases);
        # complex multi-alt: skip the covered positions.
        assert state["prev_deletion_end"] == 7 + 9
        assert state["skip_until"] == 7 + 9

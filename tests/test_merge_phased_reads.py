"""merge_phased_reads tests (merge_phased_reads_test.cc scenarios)."""

import pytest

from deepvariant_tpu.phasing.merge_phased_reads import (
    ComparisonResult,
    Merger,
    UnmergedRead,
)


def reads(shard, region, phased):
    return [
        UnmergedRead(name, phase, region, shard)
        for name, phase in phased
    ]


class TestMerger:
    def test_consistent_groups_merge_directly(self):
        merger = Merger()
        merger.add_reads(
            reads(0, 1, [("r1", 1), ("r2", 2), ("r3", 1)])
            + reads(0, 2, [("r2", 2), ("r3", 1), ("r4", 2)])
        )
        merger.merge_reads()
        phases = {m.fragment_name: m.phase for m in merger.merged_reads}
        assert phases == {"r1": 1, "r2": 2, "r3": 1, "r4": 2}

    def test_switched_group_gets_reversed(self):
        # Region 2 has opposite phases for the shared reads -> SWITCH.
        merger = Merger()
        merger.add_reads(
            reads(0, 1, [("r1", 1), ("r2", 2), ("r3", 1)])
            + reads(0, 2, [("r1", 2), ("r2", 1), ("r3", 2), ("r4", 1)])
        )
        merger.merge_reads()
        phases = {m.fragment_name: m.phase for m in merger.merged_reads}
        # After reversal r4's phase 1 becomes 2.
        assert phases["r4"] == 2
        assert phases["r1"] == 1 and phases["r2"] == 2

    def test_not_enough_overlap_no_switch(self):
        merger = Merger()
        merger.add_reads(
            reads(0, 1, [("r1", 1)])
            + reads(0, 2, [("r1", 2), ("r9", 1)])  # only 1 mismatch
        )
        merger.merge_reads()
        results = [r for _, _, r in merger.switches]
        assert results[1] == ComparisonResult.NOT_ENOUGH_OVERLAP

    def test_correct_phasing_majority(self):
        merger = Merger()
        merger.add_reads(
            reads(0, 1, [("r1", 1)])
            + reads(0, 2, [("r1", 1)])
            + reads(0, 3, [("r1", 2), ("r2", 1), ("rX", 1),
                           ("rY", 2), ("rZ", 1)])
        )
        merger.merge_reads()
        merger.correct_phasing()
        phases = {m.fragment_name: m.phase for m in merger.merged_reads}
        assert phases["r1"] == 1  # 2 votes for 1, 1 for 2

    def test_multi_shard_round_robin_order(self):
        merger = Merger()
        merger.add_reads(
            reads(0, 1, [("a", 1), ("b", 2), ("c", 1)])
            + reads(1, 1, [("b", 2), ("c", 1), ("d", 2), ("e", 1)])
            + reads(0, 2, [("d", 1), ("e", 2), ("f", 1), ("g", 2)])
        )
        merger.merge_reads()
        phases = {m.fragment_name: m.phase for m in merger.merged_reads}
        # Shard 0 region 2 conflicts with shard 1 region 1 on d/e ->
        # reversed, so f/g flip too.
        assert phases["d"] == 2 and phases["e"] == 1
        assert phases["f"] == 2 and phases["g"] == 1

    def _merged(self, merger):
        return {
            m.fragment_name: (m.phase, dict(m.phase_dist))
            for m in merger.merged_reads
        }

    def test_merge_one_read(self):
        # merge_phased_reads_test.cc MergeOneRead.
        merger = Merger()
        merger.add_reads(
            reads(0, 1, [("read_1", 1)]) + reads(1, 1, [("read_1", 1)])
        )
        merger.merge_reads()
        assert self._merged(merger) == {"read_1": (1, {1: 2})}

    def test_merge_reverse_phase_twice(self):
        # MergeReversePhaseTwice: shard 1 flips, then shard 2 flips
        # back relative to shard 1.
        merger = Merger()
        merger.add_reads(
            reads(0, 1, [("read_1", 1), ("read_2", 1), ("read_3", 2),
                         ("read_4", 1)])
            + reads(1, 1, [("read_1", 2), ("read_2", 2), ("read_3", 2),
                           ("read_4", 2)])
            + reads(2, 1, [("read_2", 1), ("read_3", 1), ("read_4", 1),
                           ("read_5", 2)])
        )
        merger.merge_reads()
        assert self._merged(merger) == {
            "read_1": (1, {1: 2}),
            "read_2": (1, {1: 3}),
            "read_3": (2, {1: 2, 2: 1}),
            "read_4": (1, {1: 3}),
            "read_5": (2, {2: 1}),
        }

    def test_full_cycle_shards(self):
        # FullCycleShards: shard_0/region_2 merges after
        # shard_1/region_1 in round-robin order.
        merger = Merger()
        merger.add_reads(
            reads(0, 1, [("read_1", 1), ("read_2", 1), ("read_3", 2)])
            + reads(1, 1, [("read_1", 2), ("read_2", 2), ("read_3", 1)])
            + reads(0, 2, [("read_2", 1), ("read_3", 1), ("read_4", 2)])
        )
        merger.merge_reads()
        assert self._merged(merger) == {
            "read_1": (1, {1: 2}),
            "read_2": (1, {1: 3}),
            "read_3": (2, {1: 1, 2: 2}),
            "read_4": (2, {2: 1}),
        }

    def test_disconnected_groups(self):
        # DisconnectedGroups: no shared reads, phases kept as-is.
        merger = Merger()
        merger.add_reads(
            reads(0, 1, [("read_1", 1), ("read_2", 1), ("read_3", 2)])
            + reads(1, 1, [("read_4", 1), ("read_5", 2), ("read_6", 2)])
        )
        merger.merge_reads()
        assert self._merged(merger) == {
            "read_1": (1, {1: 1}),
            "read_2": (1, {1: 1}),
            "read_3": (2, {2: 1}),
            "read_4": (1, {1: 1}),
            "read_5": (2, {2: 1}),
            "read_6": (2, {2: 1}),
        }

    def test_skipped_group(self):
        # SkippedGroup: shard 1 is absent; shard 2 still merges
        # against shard 0 (majority flip: 3 of 4 reads reversed).
        merger = Merger()
        merger.add_reads(
            reads(0, 1, [("read_1", 1), ("read_2", 1), ("read_3", 2),
                         ("read_4", 2)])
            + reads(2, 1, [("read_1", 2), ("read_2", 2), ("read_3", 2),
                           ("read_4", 1)])
        )
        merger.merge_reads()
        assert self._merged(merger) == {
            "read_1": (1, {1: 2}),
            "read_2": (1, {1: 2}),
            "read_3": (2, {1: 1, 2: 1}),
            "read_4": (2, {2: 2}),
        }

    def test_empty_input(self):
        merger = Merger()
        merger.add_reads([])
        merger.merge_reads()
        assert merger.merged_reads == []

    def test_tsv_roundtrip(self, tmp_path):
        for shard in range(2):
            with open(tmp_path / f"phases-0000{shard}-of-00002.tsv",
                      "w") as f:
                f.write("fragment_name\tphase\tregion_order\n")
                f.write(f"r{shard}\t1\t1\n")
        merger = Merger()
        merger.load_from_files(str(tmp_path / "phases@2.tsv"))
        assert len(merger.unmerged_reads) == 2
        merger.merge_reads(str(tmp_path / "switches.tsv"))
        merger.write_merged(str(tmp_path / "merged.tsv"))
        lines = open(tmp_path / "merged.tsv").read().splitlines()
        assert lines[0] == "fragment_name\tphase"
        assert len(lines) == 3

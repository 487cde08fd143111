"""Indel left-alignment tests (allelecounter.cc NormalizeCigar
scenarios; variant-normalization recurrence)."""

import numpy as np
import pytest

from deepvariant_tpu.core.cigar import parse_cigar_string
from deepvariant_tpu.core.types import Range, Read
from deepvariant_tpu.io.bam import ReadBatch
from deepvariant_tpu.make_examples.normalize import (
    normalize_batch_cigars,
    normalize_cigar,
)

_M, _I, _D, _S = 1, 2, 3, 5


def _arr(s):
    return np.frombuffer(s.encode(), np.uint8)


class TestNormalizeCigar:
    def test_no_indel_untouched(self):
        cigar, shift, modified = normalize_cigar(
            _arr("ACGT"), 0, [(_M, 4)], _arr("ACGTACGT")
        )
        assert cigar == [(_M, 4)] and shift == 0 and not modified

    def test_del_shifts_left_in_homopolymer(self):
        # ref  AAAAC, read AAAC aligned 3M1D1M: deletion of an A in a
        # homopolymer left-aligns to position 0 -> 1D... but a heading
        # deletion is absorbed into the alignment start (read_shift).
        ref = _arr("AAAAC")
        read = _arr("AAAC")
        cigar, shift, modified = normalize_cigar(
            read, 0, [(_M, 3), (_D, 1), (_M, 1)], ref
        )
        assert modified
        # Fully left-shifted: leading DEL removed, start shifts by 1.
        assert shift == 1
        assert cigar == [(_M, 4)]

    def test_ins_shifts_left(self):
        # ref CATTTG, read CATTTTG with 5M1I1M: the T insertion
        # left-aligns to after the C (2M1I4M).
        ref = _arr("CATTTG")
        read = _arr("CATTTTG")
        cigar, shift, modified = normalize_cigar(
            read, 0, [(_M, 5), (_I, 1), (_M, 1)], ref
        )
        assert modified and shift == 0
        assert cigar == [(_M, 2), (_I, 1), (_M, 4)]

    def test_del_ins_merge(self):
        # Adjacent 3D5I collapses to 3M2I (allelecounter.cc:704).
        ref = _arr("GGGTTTGGG")
        read = _arr("GGGCCCCCGGG")
        cigar, shift, modified = normalize_cigar(
            read, 0, [(_M, 3), (_D, 3), (_I, 5), (_M, 3)], ref
        )
        assert modified
        assert cigar == [(_M, 6), (_I, 2), (_M, 3)]

    def test_soft_clip_preserved(self):
        ref = _arr("CATTTG")
        read = _arr("NNCATTTTG")
        cigar, shift, modified = normalize_cigar(
            read, 0, [(_S, 2), (_M, 5), (_I, 1), (_M, 1)], ref
        )
        assert modified
        assert cigar[0] == (_S, 2)
        assert cigar[1:] == [(_M, 2), (_I, 1), (_M, 4)]


class TestNormalizeBatch:
    def test_batch_rewrite(self):
        ref = _arr("CCATTTGCC")
        reads = [
            Read(
                fragment_name="ins",
                aligned_sequence="CCATTTTGC",
                aligned_quality=bytes([30] * 9),
                reference_name="chr1",
                position=100,
                mapping_quality=60,
                cigar=[(_M, 7), (_I, 1), (_M, 1)],
            ),
            Read(
                fragment_name="plain",
                aligned_sequence="CCATTTGCC",
                aligned_quality=bytes([30] * 9),
                reference_name="chr1",
                position=100,
                mapping_quality=60,
                cigar=[(_M, 9)],
            ),
        ]
        batch = ReadBatch.from_reads(reads, ["chr1"])
        changed = normalize_batch_cigars(batch, ref, 100)
        assert changed == 1
        ops, lens = batch.cigar_of(0)
        got = list(zip(ops.tolist(), lens.tolist()))
        # T-insertion left-aligns to before the T-run (after CCA).
        assert got == [(_M, 3), (_I, 1), (_M, 5)]
        ops1, lens1 = batch.cigar_of(1)
        assert list(zip(ops1.tolist(), lens1.tolist())) == [(_M, 9)]

    @pytest.mark.integration
    def test_real_data_idempotent_and_consistent(self, testdata_dir):
        """On real reads: normalization converges (second pass is a
        no-op) and never changes read length bookkeeping."""
        import os

        from deepvariant_tpu.io.bam import BamReader
        from deepvariant_tpu.io.fasta import FastaReader

        bam = BamReader(os.path.join(
            testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
        ))
        fasta = FastaReader(os.path.join(
            testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ))
        region = Range("chr20", 10_000_000, 10_010_000)
        batch = bam.query(region)
        ref = fasta.bases(region)
        n1 = normalize_batch_cigars(batch, ref, region.start)
        # BWA already left-aligns indels, so n1 is usually 0 here; the
        # properties under test are bookkeeping + convergence.
        assert n1 >= 0
        # Read-consuming cigar length still matches sequence length.
        for i in range(len(batch)):
            ops, lens = batch.cigar_of(i)
            read_len = sum(
                int(l) for o, l in zip(ops, lens) if o in (1, 2, 5, 8, 9)
            )
            assert read_len == batch.seq_offsets[i + 1] - \
                batch.seq_offsets[i]
        n2 = normalize_batch_cigars(batch, ref, region.start)
        assert n2 == 0  # converged

"""Candidate-sweep mode, candidate-balanced partitioning, and
vcf_candidate_importer tests."""

import os

import numpy as np
import pytest

from deepvariant_tpu.core.types import ContigInfo, Range
from deepvariant_tpu.make_examples.core import (
    END_OF_REGION,
    MAX_PARTITION_LEN,
    MakeExamplesOptions,
    candidate_sweep_runner,
    load_candidate_positions,
    make_examples_runner,
    partition_by_candidates,
)

TD_INPUT = "input/NA12878_S1.chr20.10_10p1mb.bam"
TD_REF = "input/ucsc.hg19.chr20.unittest.fasta.gz"


class TestPartitionByCandidates:
    def test_splits_at_max_size(self):
        regions = [Range("chr1", 0, 1000)]
        candidates = [10, 20, 30, 40, 50, END_OF_REGION]
        parts = partition_by_candidates(regions, candidates, 2)
        # Partitions of <=2 candidates each; full span covered.
        assert parts[0].start == 0
        assert parts[-1].end == 1000
        for i in range(len(parts) - 1):
            assert parts[i].end <= parts[i + 1].start or \
                parts[i].end == parts[i + 1].start

    def test_no_candidates_splits_by_max_len(self):
        regions = [Range("chr1", 0, 2 * MAX_PARTITION_LEN + 5)]
        parts = partition_by_candidates(
            regions, [END_OF_REGION], 200
        )
        assert len(parts) == 3
        assert parts[0].end - parts[0].start == MAX_PARTITION_LEN

    def test_missing_sentinel_raises(self):
        with pytest.raises(ValueError, match="truncated"):
            partition_by_candidates([Range("chr1", 0, 100)], [10], 2)

    def test_bad_max_size(self):
        with pytest.raises(ValueError):
            partition_by_candidates([], [], 0)


@pytest.mark.integration
class TestSweepAndImporter:
    def test_candidate_sweep_then_balanced_partitions(
        self, testdata_dir, tmp_path
    ):
        options = MakeExamplesOptions(
            reads_filename=os.path.join(testdata_dir, TD_INPUT),
            ref_filename=os.path.join(testdata_dir, TD_REF),
            examples_filename="",
            mode="candidate_sweep",
            regions=["chr20:10,000,000-10,010,000"],
            realigner_enabled=False,
        )
        sweep_path = str(tmp_path / "candidates.pos")
        n = candidate_sweep_runner(options, sweep_path)
        assert n > 50  # very-sensitive caller finds many
        positions = load_candidate_positions([sweep_path])
        assert (positions == END_OF_REGION).sum() >= 1
        real = positions[positions != END_OF_REGION]
        assert ((10_000_000 <= real) & (real < 10_010_000)).all()

    def test_vcf_candidate_importer(self, testdata_dir, tmp_path):
        # Use the NIST truth VCF as the proposal source.
        options = MakeExamplesOptions(
            reads_filename=os.path.join(testdata_dir, TD_INPUT),
            ref_filename=os.path.join(testdata_dir, TD_REF),
            examples_filename=str(tmp_path / "imported.tfrecord"),
            candidates_filename=str(tmp_path / "cand.tfrecord"),
            mode="calling",
            regions=["chr20:10,000,000-10,004,000"],
            realigner_enabled=False,
            proposed_variants_filename=os.path.join(
                testdata_dir,
                "input/test_nist.b37_chr20_100kbp_at_10mb.vcf.gz",
            ),
        )
        counts = make_examples_runner(options)
        assert counts["examples"] > 0
        # Candidates must exactly mirror the proposal positions.
        from deepvariant_tpu.core.types import Variant
        from deepvariant_tpu.io.tfrecord import TFRecordReader
        from deepvariant_tpu.io.vcf import VcfReader

        with TFRecordReader(str(tmp_path / "cand.tfrecord")) as reader:
            produced = {Variant.decode(buf).start for buf in reader}
        truth = VcfReader(os.path.join(
            testdata_dir, "input/test_nist.b37_chr20_100kbp_at_10mb.vcf.gz"
        ))
        proposed = {
            v.start for v in truth
            if 10_000_000 <= v.start < 10_004_000
        }
        assert produced == proposed


@pytest.mark.integration
def test_candidate_positions_golden_byte_parity(testdata_dir, tmp_path):
    """Sweep output is byte-identical to golden.candidate_positions
    (END_OF_PARTITION/-2 between partitions, END_OF_REGION/-1 at the
    calling-region close)."""
    import numpy as np

    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        candidate_sweep_runner,
    )

    options = MakeExamplesOptions(
        reads_filename=os.path.join(
            testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
        ),
        ref_filename=os.path.join(
            testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ),
        examples_filename="",
        mode="candidate_sweep",
        regions=["chr20:10,000,000-10,010,000"],
        partition_size=1000,
    )
    out = str(tmp_path / "cand_pos")
    candidate_sweep_runner(options, out)
    mine = np.fromfile(out, np.int32)
    golden = np.fromfile(os.path.join(
        testdata_dir, "golden.candidate_positions"
    ), np.int32)
    np.testing.assert_array_equal(mine, golden)


@pytest.mark.integration
def test_vcf_candidate_importer_golden_bit_parity(testdata_dir, tmp_path):
    """Importer calling flow is BIT-IDENTICAL to
    golden.vcf_candidate_importer_calling_examples (22/22 images; the
    flow runs without the realigner, so no heuristic divergence)."""
    import numpy as np

    from deepvariant_tpu.io import examples as exio
    from deepvariant_tpu.io import tfrecord

    def load(path):
        out = {}
        for rec in tfrecord.read_tfrecords(path):
            ex = exio.parse_example(rec)
            v = ex.variant
            out[(v.start, v.reference_bases,
                 tuple(v.alternate_bases),
                 tuple(ex.alt_allele_indices))] = ex.image
        return out

    golden = load(os.path.join(
        testdata_dir,
        "golden.vcf_candidate_importer_calling_examples.tfrecord.gz",
    ))
    options = MakeExamplesOptions(
        reads_filename=os.path.join(testdata_dir, TD_INPUT),
        ref_filename=os.path.join(testdata_dir, TD_REF),
        examples_filename=str(tmp_path / "vci.tfrecord"),
        mode="calling",
        regions=["chr20:59,777,000-60,000,000"],
        realigner_enabled=False,
        proposed_variants_filename=os.path.join(
            testdata_dir,
            "input/vcf_candidate_importer.indels.chr20.vcf.gz",
        ),
    )
    make_examples_runner(options)
    ours = load(str(tmp_path / "vci.tfrecord"))
    assert set(golden) == set(ours)
    assert len(golden) == 22
    for key in golden:
        np.testing.assert_array_equal(golden[key], ours[key])


@pytest.mark.integration
def test_vcf_candidate_importer_training_golden_parity(
    testdata_dir, tmp_path
):
    """Training-mode importer vs golden (223/223 keys + labels; 125
    bit-exact images, mean pixel diff 0.43% from realigner-path
    differences)."""
    import numpy as np

    from deepvariant_tpu.io import examples as exio
    from deepvariant_tpu.io import tfrecord

    def load(path):
        out = {}
        for rec in tfrecord.read_tfrecords(path):
            ex = exio.parse_example(rec)
            v = ex.variant
            out[(v.start, v.reference_bases,
                 tuple(v.alternate_bases),
                 tuple(ex.alt_allele_indices))] = (ex.label, ex.image)
        return out

    golden = load(os.path.join(
        testdata_dir,
        "golden.vcf_candidate_importer.training_examples.tfrecord.gz",
    ))
    truth = os.path.join(
        testdata_dir, "input/test_nist.b37_chr20_100kbp_at_10mb.vcf.gz"
    )
    options = MakeExamplesOptions(
        reads_filename=os.path.join(testdata_dir, TD_INPUT),
        ref_filename=os.path.join(testdata_dir, TD_REF),
        examples_filename=str(tmp_path / "vcit.tfrecord"),
        mode="training",
        proposed_variants_filename=truth,
        truth_variants_filename=truth,
    )
    make_examples_runner(options)
    ours = load(str(tmp_path / "vcit.tfrecord"))
    assert set(golden) == set(ours)
    assert len(golden) == 223
    assert all(golden[k][0] == ours[k][0] for k in golden)  # labels
    fracs = [
        float(np.mean(golden[k][1] != ours[k][1])) for k in golden
    ]
    assert sum(f == 0 for f in fracs) >= 100
    assert float(np.mean(fracs)) < 0.01

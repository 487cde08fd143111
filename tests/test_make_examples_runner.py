"""make_examples runner integration tests against reference goldens.

The reference's acceptance harness (make_examples_test.py:467-498)
compares runner output to golden.calling_examples over
chr20:10,000,000-10,010,000 of the NA12878 chr20 BAM. We assert
candidate-set parity: every golden example's
(position, ref, alts, alt_allele_indices) must be reproduced.
"""

import os

import numpy as np
import pytest

from deepvariant_tpu.core.types import Range
from deepvariant_tpu.io import examples as example_codec
from deepvariant_tpu.io.tfrecord import TFRecordReader
from deepvariant_tpu.make_examples.core import (
    MakeExamplesOptions,
    RegionProcessor,
    make_examples_runner,
    regions_to_process,
    reservoir_sample_indices,
)
from deepvariant_tpu.core.types import ContigInfo

GOLDEN_REGION = "chr20:10,000,000-10,010,000"


def _variant_keys(path):
    out = []
    with TFRecordReader(path) as reader:
        for buf in reader:
            ex = example_codec.parse_example(buf)
            v = ex.variant
            out.append((
                v.start, v.reference_bases, tuple(v.alternate_bases),
                tuple(ex.alt_allele_indices),
            ))
    return out


class TestRegionsToProcess:
    CONTIGS = [
        ContigInfo(name="chr1", n_bases=2500, pos_in_fasta=0),
        ContigInfo(name="chr2", n_bases=1000, pos_in_fasta=1),
    ]

    def test_partitioning(self):
        regions = regions_to_process(self.CONTIGS, 1000)
        assert [
            (r.reference_name, r.start, r.end) for r in regions
        ] == [
            ("chr1", 0, 1000), ("chr1", 1000, 2000), ("chr1", 2000, 2500),
            ("chr2", 0, 1000),
        ]

    def test_sharding_covers_everything(self):
        all_regions = regions_to_process(self.CONTIGS, 300)
        sharded = []
        for task in range(3):
            sharded.extend(
                regions_to_process(self.CONTIGS, 300, None, task, 3)
            )
        keyfn = lambda r: (r.reference_name, r.start)
        assert sorted(sharded, key=keyfn) == sorted(all_regions, key=keyfn)

    def test_bad_shards(self):
        with pytest.raises(ValueError):
            regions_to_process(self.CONTIGS, 300, None, 5, 3)
        with pytest.raises(ValueError):
            regions_to_process(self.CONTIGS, 300, None, 1, None)


def test_reservoir_sampling():
    rng = np.random.RandomState(0)
    idx = reservoir_sample_indices(10, 20, rng)
    np.testing.assert_array_equal(idx, np.arange(10))
    idx = reservoir_sample_indices(1000, 100, rng)
    assert len(idx) == 100
    assert len(set(idx.tolist())) == 100
    assert np.all(np.diff(idx) > 0)  # order preserved


@pytest.mark.parametrize("samples,expected", [
    # make_examples_core_test.py:288-323 extract_sample_name semantics.
    (["sample_name"], "sample_name"),
    ([], "default"),
    ([""], "default"),
    (["sample1", "sample2"], "sample1"),
    (["", "sample2"], "sample2"),
])
def test_extract_sample_name_from_bam_header(samples, expected):
    from deepvariant_tpu.make_examples.core import (
        extract_sample_name_from_bam_header,
    )

    class FakeHeader:
        def sample_names(self):
            return list(samples)

    assert extract_sample_name_from_bam_header(FakeHeader()) == expected


@pytest.mark.integration
def test_runner_derives_sample_name_from_bam(testdata_dir, tmp_path):
    """Without --sample_name the runner uses the BAM's @RG SM
    (make_examples_core.py:205-211)."""
    options = MakeExamplesOptions(
        reads_filename=os.path.join(
            testdata_dir, "input", "NA12878_S1.chr20.10_10p1mb.bam"
        ),
        ref_filename=os.path.join(
            testdata_dir, "input", "ucsc.hg19.chr20.unittest.fasta.gz"
        ),
        examples_filename=str(tmp_path / "ex.tfrecord"),
        mode="calling", regions=["chr20:10,000,000-10,001,000"],
        realigner_enabled=False, write_run_info=False,
    )
    from deepvariant_tpu.make_examples.core import make_examples_runner

    make_examples_runner(options)
    assert options.sample_name == "NA12878"


@pytest.mark.parametrize("n,k", [(10, 0), (1, 1), (10, 1), (1, 3),
                                 (3, 3), (6, 3), (10, 3)])
def test_reservoir_sampling_is_uniform(n, k):
    """Observed inclusion frequency ~= min(k/n, 1) for every index
    (nucleus utils_test.py:119-149; sampling_util_test.cc:72
    ReservoirSampleIsUniform). 20k replicates, atol 0.02."""
    rng = np.random.RandomState(123456789)
    replicates = 20_000
    counts = np.zeros(n, np.int64)
    for _ in range(replicates):
        counts[reservoir_sample_indices(n, k, rng)] += 1
    expected = min(k / n, 1.0)
    np.testing.assert_allclose(
        counts / replicates, expected, atol=0.02
    )


@pytest.mark.integration
class TestGoldenParity:
    def test_calling_examples_candidate_parity(self, testdata_dir, tmp_path):
        options = MakeExamplesOptions(
            reads_filename=os.path.join(
                testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
            ),
            ref_filename=os.path.join(
                testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
            ),
            examples_filename=str(tmp_path / "examples.tfrecord"),
            gvcf_filename=str(tmp_path / "gvcf.tfrecord"),
            mode="calling",
            regions=[GOLDEN_REGION],
        )
        counts = make_examples_runner(options)
        golden = set(_variant_keys(os.path.join(
            testdata_dir, "golden.calling_examples.tfrecord.gz"
        )))
        mine = set(_variant_keys(str(tmp_path / "examples.tfrecord")))
        missing = golden - mine
        assert not missing, f"golden examples not reproduced: {missing}"
        extra = mine - golden
        # Realigner heuristic differences may add a few extra candidates,
        # but never more than a couple per 10kb.
        assert len(extra) <= 2, f"too many extra candidates: {extra}"
        assert counts["gvcfs"] > 0
        # example_info.json sidecar written with the 6-channel default.
        info = example_codec.read_example_info(
            str(tmp_path / "examples.tfrecord")
        )
        assert info["shape"][:2] == [100, 221]


class TestPhasingOutputs:
    def test_phased_genotype_from_counts_thresholds(self):
        """_get_phased_genotype_from_counts semantics
        (make_examples_core.py:2636-2668): needs a margin of >3 reads
        and at most 2 opposing."""
        from deepvariant_tpu.make_examples.core import (
            _phased_genotype_from_counts,
        )

        assert _phased_genotype_from_counts(6, 2) == 1
        assert _phased_genotype_from_counts(2, 6) == 2
        # Margin of exactly 3 is not enough (strict >).
        assert _phased_genotype_from_counts(5, 2) == 0
        # Opposing count above 2 blocks assignment.
        assert _phased_genotype_from_counts(10, 3) == 0
        assert _phased_genotype_from_counts(0, 0) == 0
        assert _phased_genotype_from_counts(4, 0) == 1

    def test_phasing_tsv_outputs(self, testdata_dir, tmp_path):
        """--output_phasing_error_stats / --output_local_read_phasing
        produce header-bearing TSVs with one stats row per phased
        region and one phase row per read."""
        stats_path = str(tmp_path / "phasing_stats.tsv")
        reads_path = str(tmp_path / "read_phases.tsv")
        options = MakeExamplesOptions(
            reads_filename=os.path.join(
                testdata_dir,
                "input/test_pacbio.chr20_100kbp_at_9mb.bam",
            ),
            ref_filename=os.path.join(
                testdata_dir, "input/grch38.chr20_and_21_10M.fa.gz"
            ),
            examples_filename=str(tmp_path / "examples.tfrecord"),
            mode="calling",
            regions=["chr20:9,000,000-9,010,000"],
            realigner_enabled=False,
            write_run_info=False,
            phase_reads=True,
            sort_by_haplotypes=True,
            output_phasing_error_stats_filename=stats_path,
            output_local_read_phasing_filename=reads_path,
        )
        make_examples_runner(options)
        stats_lines = open(stats_path).read().splitlines()
        assert stats_lines[0] == (
            "region\tnum_reads_phase_1\tnum_reads_phase_2"
            "\tnum_reads_phase_0\tnum_phase_errors"
        )
        assert len(stats_lines) > 1
        for line in stats_lines[1:]:
            cols = line.split("\t")
            assert len(cols) == 5
            assert cols[0].startswith("chr20:")
        read_lines = open(reads_path).read().splitlines()
        assert read_lines[0] == "fragment_name\tphase\tregion_order"
        assert len(read_lines) > 1
        for line in read_lines[1:3]:
            frag, phase, region_n = line.split("\t")
            assert "/" in frag
            assert phase in ("0", "1", "2")
            assert region_n.isdigit()


def test_downsample_fraction_deterministic(testdata_dir, tmp_path):
    """--downsample_fraction: same seed -> byte-identical examples;
    fewer reads survive than at full coverage (make_examples.py:78
    read-time Bernoulli keep)."""
    from deepvariant_tpu.io import tfrecord
    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        make_examples_runner,
    )

    def run(name, fraction, seed=2101079370):
        out = str(tmp_path / name)
        make_examples_runner(MakeExamplesOptions(
            reads_filename=os.path.join(
                testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
            ),
            ref_filename=os.path.join(
                testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
            ),
            examples_filename=out,
            mode="calling",
            regions=["chr20:10,000,000-10,002,000"],
            realigner_enabled=False,
            write_run_info=False,
            downsample_fraction=fraction,
            random_seed=seed,
        ))
        return list(tfrecord.read_tfrecords(out))

    a = run("a.tfrecord.gz", 0.5)
    b = run("b.tfrecord.gz", 0.5)
    assert a == b  # deterministic under a fixed seed
    full = run("full.tfrecord.gz", 0.0)
    assert a != full  # downsampling actually changed the input reads

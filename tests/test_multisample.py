"""Multi-sample (DeepTrio/DeepSomatic) example generation tests."""

import os

import numpy as np
import pytest

from deepvariant_tpu.io import examples as example_codec
from deepvariant_tpu.io.tfrecord import TFRecordReader
from deepvariant_tpu.make_examples.core import MakeExamplesOptions
from deepvariant_tpu.make_examples.multisample import (
    SampleSpec,
    TRIO_MAIN_SAMPLE_INDEX,
    make_multisample_examples_runner,
    somatic_samples,
    trio_samples,
)

TRIO_TESTDATA = "/root/reference/deeptrio/testdata/input"


def test_trio_sample_order():
    samples = trio_samples("c.bam", "p1.bam", "p2.bam")
    assert [s.role for s in samples] == ["parent1", "child", "parent2"]
    assert samples[TRIO_MAIN_SAMPLE_INDEX].role == "child"
    assert sum(s.pileup_height for s in samples) == 300


def test_somatic_sample_order():
    samples = somatic_samples("t.bam", "n.bam")
    assert [s.role for s in samples] == ["normal", "tumor"]


@pytest.mark.integration
def test_real_ceph_trio(testdata_dir, tmp_path):
    """Real CEPH trio: HG001 child + NA12891/NA12892 parents."""
    if not os.path.isdir(TRIO_TESTDATA):
        pytest.skip("deeptrio testdata not available")
    options = MakeExamplesOptions(
        reads_filename=os.path.join(
            TRIO_TESTDATA, "HG001.chr20.10_10p1mb_sorted.bam"
        ),
        ref_filename=os.path.join(
            TRIO_TESTDATA, "hs37d5.chr20.fa.gz"
        ),
        examples_filename=str(tmp_path / "trio.tfrecord"),
        mode="calling",
        regions=["20:10,000,000-10,002,500"],
    )
    samples = trio_samples(
        os.path.join(TRIO_TESTDATA, "HG001.chr20.10_10p1mb_sorted.bam"),
        os.path.join(TRIO_TESTDATA, "NA12891.chr20.10_10p1mb_sorted.bam"),
        os.path.join(TRIO_TESTDATA, "NA12892.chr20.10_10p1mb_sorted.bam"),
    )
    counts = make_multisample_examples_runner(
        options, samples, TRIO_MAIN_SAMPLE_INDEX
    )
    assert counts["examples"] > 0
    info = example_codec.read_example_info(str(tmp_path / "trio.tfrecord"))
    assert info["shape"][0] == 300  # 100 parent1 + 100 child + 100 parent2
    with TFRecordReader(str(tmp_path / "trio.tfrecord")) as reader:
        for buf in reader:
            ex = example_codec.parse_example(buf)
            assert ex.image.shape[0] == 300
            # Each sample band should contain read rows (non-zero data
            # beyond the reference band).
            for band in range(3):
                sub = ex.image[band * 100:(band + 1) * 100]
                assert sub.any(), f"sample band {band} empty"
            break

"""Integration: pileup tensors vs the reference's golden examples.

Goldens were generated WITH the realigner; until ours lands, reads whose
alignments the realigner shifts produce small pixel diffs. We assert strong
thresholds that ratchet when the realigner is in.
"""

import os

import numpy as np
import pytest

from deepvariant_tpu.core.types import Range
from deepvariant_tpu.io import examples as exio, tfrecord
from deepvariant_tpu.io.bam import BamReader
from deepvariant_tpu.io.fasta import FastaReader
from deepvariant_tpu.make_examples.allele_counter import (
    AlleleCounter,
    AlleleCounterOptions,
)
from deepvariant_tpu.make_examples.examples_builder import ExamplesBuilder
from deepvariant_tpu.make_examples.pileup import PileupOptions, WGS_CHANNELS
from deepvariant_tpu.make_examples.variant_caller import VerySensitiveCaller


@pytest.fixture(scope="module")
def parity(testdata_dir):
    fa = FastaReader(
        os.path.join(testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz")
    )
    bam = BamReader(
        os.path.join(testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam")
    )
    golden = {}
    for rec in tfrecord.read_tfrecords(
        os.path.join(testdata_dir, "golden.calling_examples.tfrecord.gz")
    ):
        ex = exio.parse_example(rec)
        v = ex.variant
        key = (
            v.start, v.reference_bases, tuple(v.alternate_bases),
            tuple(ex.alt_allele_indices),
        )
        golden[key] = ex.image

    caller = VerySensitiveCaller()
    builder = ExamplesBuilder(fa, PileupOptions(channels=tuple(WGS_CHANNELS)))
    ours = {}
    for rstart in range(10_000_000, 10_010_000, 1000):
        region = Range("chr20", rstart, rstart + 1000)
        batch = bam.query(region)
        ac = AlleleCounter(
            fa.bases(region), region, AlleleCounterOptions(),
            ref_prev_base=fa.query(Range("chr20", rstart - 1, rstart)),
        )
        ac.add_batch(batch)
        for c in caller.calls_in_region(ac):
            for be in builder.build_examples_for_candidate(c, batch):
                key = (
                    be.variant.start, be.variant.reference_bases,
                    tuple(be.variant.alternate_bases),
                    tuple(be.alt_indices),
                )
                ours[key] = be.image
    bam.close()
    return golden, ours


def test_example_schema_parity(parity):
    golden, ours = parity
    assert len(golden) == 84
    common = set(golden) & set(ours)
    assert len(common) >= 74


def test_pixel_parity(parity):
    golden, ours = parity
    common = sorted(set(golden) & set(ours))
    exact = 0
    fracs = []
    for key in common:
        g, o = golden[key], ours[key]
        assert g.shape == o.shape
        frac_diff = float(np.mean(g != o))
        fracs.append(frac_diff)
        # Realigner-less bound: windows near indels are where the
        # reference's realigner shifts reads (affects any nearby example).
        assert frac_diff < 0.20, f"{key[:3]}: {frac_diff:.4f} pixels differ"
        if frac_diff == 0.0:
            exact += 1
    assert exact >= 5  # ratchet upward once the realigner lands
    assert float(np.mean(fracs)) < 0.04


def test_reference_band_always_exact(parity):
    """Rows 0-4 (reference band) must be bit-exact everywhere."""
    golden, ours = parity
    for key in set(golden) & set(ours):
        np.testing.assert_array_equal(
            golden[key][:5], ours[key][:5], err_msg=str(key[:3])
        )


@pytest.mark.integration
def test_pixel_parity_with_realigner(testdata_dir, tmp_path):
    """Full runner WITH the realigner against the golden examples:
    all 84 examples are BIT-EXACT (requires the SSW-library alignment
    semantics in realign/ssw.py, no fast-pass coverage gate, and the
    improperly-placed read filter; the realigner window/haplotype
    layer is additionally pinned by tests/test_realigner.py
    TestReferenceOracleRegions)."""
    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        make_examples_runner,
    )

    golden = {}
    for rec in tfrecord.read_tfrecords(os.path.join(
        testdata_dir, "golden.calling_examples.tfrecord.gz"
    )):
        ex = exio.parse_example(rec)
        v = ex.variant
        golden[(v.start, v.reference_bases, tuple(v.alternate_bases),
                tuple(ex.alt_allele_indices))] = ex.image

    options = MakeExamplesOptions(
        reads_filename=os.path.join(
            testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
        ),
        ref_filename=os.path.join(
            testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ),
        examples_filename=str(tmp_path / "ex.tfrecord"),
        mode="calling",
        regions=["chr20:10,000,000-10,010,000"],
        realigner_enabled=True,
    )
    make_examples_runner(options)
    ours = {}
    for rec in tfrecord.read_tfrecords(str(tmp_path / "ex.tfrecord")):
        ex = exio.parse_example(rec)
        v = ex.variant
        ours[(v.start, v.reference_bases, tuple(v.alternate_bases),
              tuple(ex.alt_allele_indices))] = ex.image

    common = sorted(set(golden) & set(ours))
    assert len(common) == len(golden) == 84
    fracs = []
    exact = 0
    for key in common:
        g, o = golden[key], ours[key]
        assert g.shape == o.shape
        frac = float(np.mean(g != o))
        fracs.append(frac)
        exact += frac == 0.0
    assert exact == 84
    assert float(np.mean(fracs)) == 0.0


@pytest.mark.integration
def test_pacbio_golden_parity(testdata_dir, tmp_path):
    """Phased PacBio flow vs golden.pacbio_examples (the reference's
    test_make_examples_training_end2end_phased_candidates config:
    base six + haplotype + base_methylation channels, diff_channels
    alt-align, width 147, phasing + haplotype sorting, no realigner).

    Measured: 401/401 examples BIT-EXACT (the alt-aligned read set is
    the variant +/- read_overlap_buffer_bp query trimmed to the
    alignment region, realigned with kRefAlignMargin=0)."""
    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        make_examples_runner,
    )
    from deepvariant_tpu.make_examples.presets import apply_model_preset

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
        testdata_dir, "golden.pacbio_examples.tfrecord.gz"
    ))
    options = MakeExamplesOptions(
        reads_filename=os.path.join(
            testdata_dir, "input/test_pacbio.chr20_100kbp_at_9mb.bam"
        ),
        ref_filename=os.path.join(
            testdata_dir, "input/grch38.chr20_and_21_10M.fa.gz"
        ),
        examples_filename=str(tmp_path / "pb.tfrecord"),
        mode="calling",
        regions=["chr20:9,000,000-9,100,000"],
    )
    apply_model_preset(options, "PACBIO")
    options.pileup_options.channels = (1, 2, 3, 4, 5, 6, 7, 23)
    counts = make_examples_runner(options)
    assert counts["examples"] == len(golden) == 401
    ours = load(str(tmp_path / "pb.tfrecord"))
    assert set(ours) == set(golden)
    info = exio.read_example_info(str(tmp_path / "pb.tfrecord"))
    assert info["shape"] == [100, 147, 10]
    assert info["channels"] == [1, 2, 3, 4, 5, 6, 7, 23, 9, 10]
    fracs = []
    exact = 0
    for key in sorted(golden):
        g, o = golden[key], ours[key]
        assert g.shape == o.shape
        f = float(np.mean(g != o))
        fracs.append(f)
        exact += f == 0.0
        assert f < 0.25, f"{key[:3]}: {f:.4f}"
    assert exact == 401
    assert float(np.mean(fracs)) == 0.0


@pytest.mark.integration
@pytest.mark.parametrize("alt_mode,golden_name", [
    ("diff_channels",
     "golden.alt_aligned_pileup_diff_channels_examples.tfrecord.gz"),
    ("rows", "golden.alt_aligned_pileup_rows_examples.tfrecord.gz"),
])
def test_alt_aligned_golden_parity(testdata_dir, tmp_path, alt_mode,
                                   golden_name):
    """Training-mode alt-aligned flows vs the reference goldens
    (make_examples_test.py end2end_with_alt_aligned_pileup config).
    All 49 examples BIT-EXACT in both modes."""
    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        make_examples_runner,
    )

    def load(path):
        out = {}
        for rec in tfrecord.read_tfrecords(path):
            ex = exio.parse_example(rec)
            v = ex.variant
            out[(v.start, v.reference_bases,
                 tuple(v.alternate_bases),
                 tuple(ex.alt_allele_indices))] = ex.image
        return out

    golden = load(os.path.join(testdata_dir, golden_name))
    options = MakeExamplesOptions(
        reads_filename=os.path.join(
            testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
        ),
        ref_filename=os.path.join(
            testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ),
        examples_filename=str(tmp_path / "aa.tfrecord"),
        mode="training",
        regions=["chr20:10,000,000-10,010,000"],
        truth_variants_filename=os.path.join(
            testdata_dir,
            "input/test_nist.b37_chr20_100kbp_at_10mb.vcf.gz",
        ),
        confident_regions_filename=os.path.join(
            testdata_dir,
            "input/test_nist.b37_chr20_100kbp_at_10mb.bed",
        ),
    )
    options.pileup_options.channels = (1, 2, 3, 4, 5, 6)
    options.pileup_options.alt_aligned_pileup = alt_mode
    make_examples_runner(options)
    ours = load(str(tmp_path / "aa.tfrecord"))
    common = set(golden) & set(ours)
    assert len(common) == len(golden) == 49
    fracs = []
    exact = 0
    for key in sorted(common):
        g, o = golden[key], ours[key]
        assert g.shape == o.shape
        f = float(np.mean(g != o))
        fracs.append(f)
        exact += f == 0.0
    assert exact == 49
    assert float(np.mean(fracs)) == 0.0


@pytest.mark.integration
def test_allele_frequency_golden_parity(testdata_dir, tmp_path):
    """AF-channel flow vs golden.allele_frequency_examples: all 78
    examples BIT-EXACT (requires the libc++ downsampling shuffle and
    the allele counter's reference tail for region-edge deletions)."""
    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        make_examples_runner,
    )

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
        testdata_dir, "golden.allele_frequency_examples.tfrecord.gz"
    ))
    options = MakeExamplesOptions(
        reads_filename=os.path.join(
            testdata_dir, "input/grch38_1k_subset_chr20_and_chr21.bam"
        ),
        ref_filename=os.path.join(
            testdata_dir, "input/grch38.chr20_and_21_10M.fa.gz"
        ),
        examples_filename=str(tmp_path / "af.tfrecord"),
        mode="calling",
        regions=["chr20:61001-62000"],
        population_vcf_filenames=[os.path.join(
            testdata_dir, "input/cohort-chr20_and_chr21_100k.vcf.gz"
        )],
    )
    options.pileup_options.channels = (1, 2, 3, 4, 5, 6, 19, 8)
    make_examples_runner(options)
    ours = load(str(tmp_path / "af.tfrecord"))
    assert set(ours) == set(golden)
    assert len(golden) == 78
    info = exio.read_example_info(str(tmp_path / "af.tfrecord"))
    assert info["channels"] == [1, 2, 3, 4, 5, 6, 19, 8]
    for key in sorted(golden):
        np.testing.assert_array_equal(
            golden[key], ours[key], err_msg=str(key[:3])
        )

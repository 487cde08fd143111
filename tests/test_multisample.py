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


class TestSomaticCli:
    """Port of make_examples_somatic_test.py:54-156: flag -> sample
    mapping, tumor-only mode, and unsuffixed calling-mode outputs."""

    def _parse(self, extra):
        from deepvariant_tpu.scripts.multisample_make_examples import (
            build_parser,
        )

        return build_parser().parse_args([
            "somatic", "--ref", "r.fa", "--examples", "ex.tfrecord",
            "--reads_tumor", "t.bam",
        ] + extra)

    def test_options_and_sample_names(self):
        # test_options_and_sample_names (:54-71): normal at index 0,
        # tumor (the calling sample) at index 1, names from flags.
        samples = somatic_samples(
            "t.bam", "n.bam",
            sample_name_tumor="TUMOR", sample_name_normal="NORMAL",
        )
        assert len(samples) == 2
        assert samples[0].sample_name == "NORMAL"
        assert samples[1].sample_name == "TUMOR"
        assert samples[1].role == "tumor"

    def test_tumor_only_flag_options(self):
        # test_tumor_only_flag_options (:103-115): no --reads_normal
        # -> a single tumor sample.
        args = self._parse(["--sample_name_tumor", "TUMOR"])
        assert args.reads_normal == ""

    def test_tumor_normal_flag_options(self):
        args = self._parse([
            "--reads_normal", "n.bam",
            "--sample_name_tumor", "TUMOR",
            "--sample_name_normal", "NORMAL",
        ])
        assert args.reads_normal == "n.bam"

    @pytest.mark.integration
    def test_calling_mode_writes_unsuffixed_examples(
        self, testdata_dir, tmp_path
    ):
        """make_examples_somatic end2end suffix check (:73-101): in
        calling mode only the tumor sample emits examples, to the
        plain --examples path (no _tumor/_normal suffixes)."""
        from deepvariant_tpu.scripts.multisample_make_examples import main

        bam = os.path.join(
            testdata_dir, "input", "NA12878_S1.chr20.10_10p1mb.bam"
        )
        ref = os.path.join(
            testdata_dir, "input", "ucsc.hg19.chr20.unittest.fasta.gz"
        )
        out = str(tmp_path / "TEST_SUFFIX.tfrecord.gz")
        rc = main([
            "somatic", "--ref", ref, "--examples", out,
            "--reads_tumor", bam, "--reads_normal", bam,
            "--sample_name_tumor", "TUMOR",
            "--sample_name_normal", "NORMAL",
            "--regions", "chr20:10,000,000-10,002,000",
            "--no-realign_reads",
        ])
        assert rc == 0
        assert os.path.exists(out)
        assert not os.path.exists(
            str(tmp_path / "TEST_SUFFIX_normal.tfrecord.gz")
        )
        assert not os.path.exists(
            str(tmp_path / "TEST_SUFFIX_tumor.tfrecord.gz")
        )
        assert len(list(TFRecordReader(out))) > 0

    @pytest.mark.integration
    def test_tumor_only_end2end(self, testdata_dir, tmp_path):
        from deepvariant_tpu.scripts.multisample_make_examples import main

        bam = os.path.join(
            testdata_dir, "input", "NA12878_S1.chr20.10_10p1mb.bam"
        )
        ref = os.path.join(
            testdata_dir, "input", "ucsc.hg19.chr20.unittest.fasta.gz"
        )
        out = str(tmp_path / "tumor_only.tfrecord.gz")
        rc = main([
            "somatic", "--ref", ref, "--examples", out,
            "--reads_tumor", bam,
            "--regions", "chr20:10,000,000-10,002,000",
            "--no-realign_reads",
        ])
        assert rc == 0
        assert len(list(TFRecordReader(out))) > 0


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


class TestPangenomeAware:
    """Pangenome-aware sample semantics
    (make_examples_pangenome_aware_dv.py:207-289)."""

    def test_sample_spec(self):
        from deepvariant_tpu.make_examples.multisample import (
            PANGENOME_MAIN_SAMPLE_INDEX,
            pangenome_samples,
        )
        from deepvariant_tpu.make_examples.pileup import (
            CH_BASE_QUALITY,
            CH_HAPLOTYPE_TAG,
            CH_MAPPING_QUALITY,
        )

        samples = pangenome_samples(
            "reads.bam", "pangenome.bam",
            variant_types_to_blank=["snp"],
        )
        assert [s.role for s in samples] == ["pangenome", "reads"]
        assert PANGENOME_MAIN_SAMPLE_INDEX == 1
        pangenome = samples[0]
        assert pangenome.keep_only_window_spanning_reads
        assert CH_HAPLOTYPE_TAG in pangenome.channels_to_blank
        assert CH_BASE_QUALITY in pangenome.channels_to_blank
        assert CH_MAPPING_QUALITY in pangenome.channels_to_blank
        assert pangenome.variant_types_to_blank == ("SNP",)
        assert not samples[1].channels_to_blank

    def test_variant_type(self):
        from deepvariant_tpu.core.types import Variant
        from deepvariant_tpu.make_examples.multisample import (
            _variant_type,
        )

        snp = Variant(reference_name="c", start=0, end=1,
                      reference_bases="A", alternate_bases=["T"])
        indel = Variant(reference_name="c", start=0, end=3,
                        reference_bases="ACG", alternate_bases=["A"])
        assert _variant_type(snp) == "SNP"
        assert _variant_type(indel) == "INDEL"

    @pytest.mark.integration
    def test_stacked_examples_real(self, testdata_dir, tmp_path):
        """Panel rows stack above read rows; panel bq/mapq blanked;
        chrom_prefix maps chr20 -> 20 for the b37-named panel."""
        import numpy as np

        from deepvariant_tpu.io import examples as ec
        from deepvariant_tpu.io.tfrecord import TFRecordReader
        from deepvariant_tpu.make_examples.core import (
            MakeExamplesOptions,
        )
        from deepvariant_tpu.make_examples.multisample import (
            PANGENOME_MAIN_SAMPLE_INDEX,
            make_multisample_examples_runner,
            pangenome_samples,
        )

        samples = pangenome_samples(
            os.path.join(
                testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
            ),
            os.path.join(
                testdata_dir,
                "input/HG002_NIST_150bp_downsampled_30x."
                "chr20.10_10p1mb.bam",
            ),
            keep_only_window_spanning_haplotypes=False,
        )
        samples[0].chrom_prefix = "chr"
        options = MakeExamplesOptions(
            reads_filename=samples[1].reads_filename,
            ref_filename=os.path.join(
                testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
            ),
            examples_filename=str(tmp_path / "pang.tfrecord"),
            mode="calling",
            regions=["chr20:10,000,000-10,003,000"],
            realigner_enabled=False,
        )
        counts = make_multisample_examples_runner(
            options, samples, PANGENOME_MAIN_SAMPLE_INDEX
        )
        assert counts["examples"] > 5
        with TFRecordReader(str(tmp_path / "pang.tfrecord")) as r:
            img = ec.parse_example(next(iter(r))).image
        assert img.shape[0] == 200
        top, bottom = img[:100], img[100:]
        assert (top[5:, :, 0].sum(axis=1) > 0).sum() > 5
        assert not top[:, :, 1].any()      # base_quality blanked
        assert not top[:, :, 2].any()      # mapping_quality blanked
        assert bottom[:, :, 1].any()


@pytest.mark.integration
def test_trio_golden_child_examples_parity(testdata_dir, tmp_path):
    """DeepTrio child calling examples vs golden_child.calling_examples
    (create_golden_deeptrio.sh: WGS preset heights child 60/parent 40,
    channels base six + insert_size, min_fraction_multiplier 0.67).

    All 88 examples BIT-EXACT across all three bands (requires the
    libc++ downsampling shuffle for the crowded parent bands and the
    CLI min_mapping_quality=5 funneled into the pileup encoder)."""
    import numpy as np

    from deepvariant_tpu.io import tfrecord
    from deepvariant_tpu.make_examples.multisample import (
        TRIO_MAIN_SAMPLE_INDEX,
        make_multisample_examples_runner,
        trio_samples,
    )

    trio_dir = TRIO_TESTDATA

    def load(path):
        out = {}
        for rec in tfrecord.read_tfrecords(path):
            ex = example_codec.parse_example(rec)
            v = ex.variant
            out[(v.start, v.reference_bases, tuple(v.alternate_bases),
                 tuple(ex.alt_allele_indices))] = ex.image
        return out

    golden = load(os.path.join(
        os.path.dirname(trio_dir),
        "golden_child.calling_examples.tfrecord.gz",
    ))
    assert len(golden) == 88
    options = MakeExamplesOptions(
        reads_filename=os.path.join(
            trio_dir, "HG001.chr20.10_10p1mb_sorted.bam"
        ),
        ref_filename=os.path.join(trio_dir, "hs37d5.chr20.fa.gz"),
        examples_filename=str(tmp_path / "trio.tfrecord"),
        mode="calling",
        regions=["20:10,000,000-10,010,000"],
        sample_name="child",
    )
    options.pileup_options.channels = (1, 2, 3, 4, 5, 6, 19)
    options.variant_caller_options.min_fraction_multiplier = 0.67
    samples = trio_samples(
        os.path.join(trio_dir, "HG001.chr20.10_10p1mb_sorted.bam"),
        os.path.join(trio_dir, "NA12891.chr20.10_10p1mb_sorted.bam"),
        os.path.join(trio_dir, "NA12892.chr20.10_10p1mb_sorted.bam"),
        height_child=60, height_parent=40,
    )
    make_multisample_examples_runner(
        options, samples, TRIO_MAIN_SAMPLE_INDEX
    )
    ours = load(str(tmp_path / "trio.tfrecord"))
    common = sorted(set(golden) & set(ours))
    assert len(common) == len(golden) == 88
    assert len(ours) <= len(golden) + 2  # pooled-rescue tail

    g = np.stack([golden[k] for k in common])
    o = np.stack([ours[k] for k in common])
    assert g.shape[1:] == (140, 221, 7)
    np.testing.assert_array_equal(g, o)


@pytest.mark.integration
def test_trio_production_geometry_pins_to_golden_geometry(
    testdata_dir, tmp_path
):
    """Production DeepTrio geometry (100/100/100, dt_constants.py)
    structurally pinned to the golden-anchored 60/40 geometry.

    No 100/100 golden exists in-image (create_golden_deeptrio.sh only
    ships 60/40), so this test derives the pin: candidates are height-
    independent, the per-band row sort is deterministic, and extra
    band height only APPENDS rows — so for every band that needed no
    crowding downsampling, the 100-height band must start with the
    60/40 band's rows PIXEL-IDENTICALLY, with its own 5-row reference
    band at each band top (pileup_image_native.cc:74-101 row order;
    dt_constants.py heights)."""
    if not os.path.isdir(TRIO_TESTDATA):
        pytest.skip("deeptrio testdata not available")

    def run(tag, height_child, height_parent):
        options = MakeExamplesOptions(
            reads_filename=os.path.join(
                TRIO_TESTDATA, "HG001.chr20.10_10p1mb_sorted.bam"
            ),
            ref_filename=os.path.join(TRIO_TESTDATA, "hs37d5.chr20.fa.gz"),
            examples_filename=str(tmp_path / f"{tag}.tfrecord"),
            mode="calling",
            regions=["20:10,000,000-10,005,000"],
        )
        samples = trio_samples(
            os.path.join(
                TRIO_TESTDATA, "HG001.chr20.10_10p1mb_sorted.bam"
            ),
            os.path.join(
                TRIO_TESTDATA, "NA12891.chr20.10_10p1mb_sorted.bam"
            ),
            os.path.join(
                TRIO_TESTDATA, "NA12892.chr20.10_10p1mb_sorted.bam"
            ),
            height_child=height_child, height_parent=height_parent,
        )
        counts = make_multisample_examples_runner(
            options, samples, TRIO_MAIN_SAMPLE_INDEX
        )
        out = {}
        with TFRecordReader(str(tmp_path / f"{tag}.tfrecord")) as r:
            for buf in r:
                ex = example_codec.parse_example(buf)
                v = ex.variant
                out[(v.start, v.reference_bases,
                     tuple(v.alternate_bases),
                     tuple(ex.alt_allele_indices))] = ex.image
        assert counts["examples"] == len(out)
        return out

    golden_geom = run("g6040", 60, 40)
    production = run("p100", 100, 100)
    assert set(golden_geom) == set(production)
    assert len(production) >= 10
    ref_band = 5
    # (offset in 60/40 image, band height, offset in 100/100 image)
    bands = [(0, 40, 0), (40, 60, 100), (100, 40, 200)]
    compared = 0
    for key in sorted(golden_geom):
        small, big = golden_geom[key], production[key]
        assert small.shape == (140, 221, 7)
        assert big.shape == (300, 221, 7)
        for off_s, h, off_b in bands:
            small_band = small[off_s: off_s + h]
            big_band = big[off_b: off_b + 100]
            # Each band carries its own reference band at the top.
            assert (small_band[:ref_band] == big_band[:ref_band]).all()
            # Skip bands where the SMALL geometry downsampled (its
            # last read row occupied => reads may exceed h - 5).
            if small_band[h - 1].any():
                continue
            assert (big_band[:h] == small_band).all(), key
            # The appended region holds only (possibly) more reads for
            # crowded windows; here it must be empty padding.
            assert not big_band[h:].any(), key
            compared += 1
    assert compared >= 20

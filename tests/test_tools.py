"""Reporting tool tests: vcf_stats, show_examples, runtime_by_region_vis."""

import json
import os

import numpy as np
import pytest

from deepvariant_tpu.core.types import Variant, VariantCall
from deepvariant_tpu.tools.vcf_stats import (
    compute_stats,
    variant_type,
    write_report,
)
from deepvariant_tpu.tools.show_examples import channel_panels, save_example_png
from deepvariant_tpu.tools.runtime_by_region_vis import (
    read_runtime_tsv,
    write_report as write_runtime_report,
)


def _variant(ref="A", alts=("G",), qual=30.0, gt=(0, 1), flt=("PASS",)):
    return Variant(
        reference_name="chr1", start=10, end=10 + len(ref),
        reference_bases=ref, alternate_bases=list(alts), quality=qual,
        filter=list(flt),
        calls=[VariantCall(genotype=list(gt),
                           info={"GQ": [40], "DP": [30], "VAF": [0.5]})],
    )


class TestVariantTypePort:
    """Port of vcf_stats_test.py test_get_variant_type (:60-148) and
    the genotype/filter gating from test_get_variant_stats (:150-255)."""

    CASES = [
        (("A", ["C"]), "Biallelic_SNP"),
        (("A", ["C", "<*>"]), "Biallelic_SNP"),
        (("A", ["AG"]), "Biallelic_Insertion"),
        (("A", ["AG", "<*>"]), "Biallelic_Insertion"),
        (("AG", ["A"]), "Biallelic_Deletion"),
        (("AG", ["A", "<*>"]), "Biallelic_Deletion"),
        (("A", ["C", "G"]), "Multiallelic_SNP"),
        (("A", ["C", "G", "<*>"]), "Multiallelic_SNP"),
        (("A", ["AC", "AG"]), "Multiallelic_Insertion"),
        (("A", ["AC", "AG", "<*>"]), "Multiallelic_Insertion"),
        (("AGC", ["AC", "A", "AG"]), "Multiallelic_Deletion"),
        (("AGC", ["AC", "A", "AG", "<*>"]), "Multiallelic_Deletion"),
        (("AG", ["AC", "A"]), "Multiallelic_Complex"),
        (("AG", ["AC", "A", "<*>"]), "Multiallelic_Complex"),
        (("A", ["G", "AT"]), "Multiallelic_Complex"),
        (("A", ["G", "AT", "<*>"]), "Multiallelic_Complex"),
        (("AG", ["TC"]), "Biallelic_MNP"),
        (("AG", ["TC", "<*>"]), "Biallelic_MNP"),
        (("A", []), "RefCall"),
        (("A", ["<*>"]), "RefCall"),
    ]

    def test_get_variant_type_table(self):
        from deepvariant_tpu.tools.vcf_stats import variant_type

        for (ref, alts), expected in self.CASES:
            v = Variant(
                reference_name="chr1", start=10, end=10 + len(ref),
                reference_bases=ref, alternate_bases=list(alts),
            )
            assert variant_type(v) == expected, (ref, alts)

    def test_failing_filter_is_refcall(self):
        from deepvariant_tpu.tools.vcf_stats import variant_type

        for filters in (["FAIL"], ["RefCall"]):
            v = Variant(
                reference_name="chr1", start=10, end=11,
                reference_bases="A", alternate_bases=["G"],
                filter=list(filters),
            )
            assert variant_type(v) == "RefCall"
        for filters in (["PASS"], ["."], []):
            v = Variant(
                reference_name="chr1", start=10, end=11,
                reference_bases="A", alternate_bases=["G"],
                filter=list(filters),
            )
            assert variant_type(v) == "Biallelic_SNP"

    def test_homref_genotype_is_refcall(self):
        from deepvariant_tpu.core.types import VariantCall
        from deepvariant_tpu.tools.vcf_stats import variant_type

        v = Variant(
            reference_name="chr1", start=10, end=11,
            reference_bases="A", alternate_bases=["G"],
            calls=[VariantCall(call_set_name="s", genotype=[0, 0])],
        )
        assert variant_type(v) == "RefCall"
        v.calls[0].genotype = [0, 1]
        assert variant_type(v) == "Biallelic_SNP"


class TestVcfStats:
    def test_variant_type(self):
        assert variant_type(_variant()) == "Biallelic_SNP"
        assert variant_type(_variant(alts=("ATT",))) == \
            "Biallelic_Insertion"
        assert variant_type(_variant(ref="ATT", alts=("A",))) == \
            "Biallelic_Deletion"
        assert variant_type(_variant(alts=("G", "C"))) == \
            "Multiallelic_SNP"
        assert variant_type(_variant(flt=("RefCall",))) == "RefCall"

    def test_titv(self):
        # A->G transition x2, A->C transversion x1.
        stats = compute_stats([
            _variant(alts=("G",)), _variant(alts=("G",)),
            _variant(alts=("C",)),
        ])
        assert stats.transitions == 2 and stats.transversions == 1
        assert stats.titv_ratio == 2.0

    def test_report_files(self, tmp_path):
        stats = compute_stats([_variant(), _variant(alts=("ATT",))])
        base = str(tmp_path / "report")
        write_report(stats, base)
        d = json.load(open(base + ".stats.json"))
        assert d["record_count"] == 2
        html = open(base + ".visual_report.html").read()
        assert "Biallelic_SNP" in html and "<svg" in html


class TestShowExamples:
    def test_channel_panels(self):
        img = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
        strip = channel_panels(img, pad=1)
        assert strip.shape == (2, 4 * 4)
        np.testing.assert_array_equal(strip[:, :3], img[..., 0])

    def test_save_png(self, tmp_path):
        img = np.random.RandomState(0).randint(
            0, 255, (10, 20, 3), np.uint8
        )
        path = str(tmp_path / "x.png")
        save_example_png(img, path)
        from PIL import Image

        loaded = Image.open(path)
        assert loaded.size == (2 * 3 * 22, 20)

    def test_get_short_id_long_alleles(self):
        # show_examples.py get_short_id: long alleles shorten to
        # INS/DEL/MNP sizes; same-length alts get index prefixes.
        from deepvariant_tpu.core.types import Variant
        from deepvariant_tpu.tools.show_examples import get_short_id

        v = Variant(reference_name="20", start=62456134,
                    reference_bases="A" * 10,
                    alternate_bases=["A" * 113])
        assert get_short_id(v, [0]) == "20:62456134_INS103bp"
        v2 = Variant(reference_name="20", start=62481177,
                     reference_bases="G" * 61, alternate_bases=["G" * 10])
        assert get_short_id(v2, [0]) == "20:62481177_DEL51bp"
        v3 = Variant(reference_name="1", start=55424996,
                     reference_bases="CT", alternate_bases=["C", "CTT"])
        assert get_short_id(v3, [0, 1]) == "1:55424996_CT->C|CTT"

    def test_cli_filters_curation_and_tfrecords(self, testdata_dir,
                                                tmp_path):
        from deepvariant_tpu.io import tfrecord
        from deepvariant_tpu.tools.show_examples import main

        golden = os.path.join(
            testdata_dir, "golden.calling_examples.tfrecord.gz"
        )
        out = str(tmp_path / "imgs")
        main([
            "--examples", golden, "--output", out,
            "--num_records", "3", "--image_type", "both",
            "--curate", "--write_tfrecords",
            "--regions", "chr20:10,000,000-10,001,000",
        ])
        pngs = [f for f in os.listdir(out) if f.endswith(".png")]
        assert len(pngs) == 6  # 3 loci x (channels + RGB)
        tsv = open(os.path.join(out, "curation.tsv")).read()
        assert tsv.startswith("id\tlabel\tBaseQuality")
        assert len(tsv.splitlines()) == 4
        recs = list(tfrecord.read_tfrecords(
            os.path.join(out, "examples.tfrecord.gz")
        ))
        assert len(recs) == 3


class TestRuntimeVis:
    def test_roundtrip(self, tmp_path):
        tsv = tmp_path / "rt.tsv"
        tsv.write_text(
            "region\tget reads\trealignment\tfind candidates\t"
            "make pileup images\ttotal\n"
            "chr1:1-100\t0.1\t0.2\t0.3\t0.4\t1.0\n"
            "chr1:101-200\t0.5\t0.1\t0.1\t0.1\t0.8\n"
        )
        cols, rows = read_runtime_tsv(str(tsv))
        assert len(rows) == 2 and "total" in cols
        out = str(tmp_path / "rt.html")
        write_runtime_report(str(tsv), out)
        html = open(out).read()
        assert "chr1:1-100" in html and "<svg" in html


class TestResourceMonitor:
    def test_metrics(self):
        import time

        from deepvariant_tpu.utils.resources import ResourceMonitor

        with ResourceMonitor() as monitor:
            time.sleep(0.02)
            m = monitor.metrics()
        assert m["wall_time_seconds"] >= 0.02
        assert m["cpu_user_time_seconds"] >= 0
        assert m["memory_peak_rss_mb"] > 0
        assert m["host_name"]

    def test_requires_start(self):
        import pytest as _pytest

        from deepvariant_tpu.utils.resources import ResourceMonitor

        with _pytest.raises(RuntimeError):
            ResourceMonitor().metrics()

    def test_run_info_sidecar(self, tmp_path):
        import json

        import numpy as np

        from deepvariant_tpu.make_examples.core import (
            MakeExamplesOptions,
            make_examples_runner,
        )

        # No reads/regions: zero-work run still writes run_info.
        ref = tmp_path / "ref.fa"
        ref.write_text(">c1\nACGTACGTACGTACGTACGT\n")
        (tmp_path / "ref.fa.fai").write_text("c1\t20\t4\t20\t21\n")
        import deepvariant_tpu.io.bam_writer as bw
        from deepvariant_tpu.core.types import ContigInfo

        bam = str(tmp_path / "r.bam")
        with bw.BamWriter(bam, [ContigInfo("c1", 20, 0)]):
            pass
        bw.build_bam_index(bam)
        options = MakeExamplesOptions(
            reads_filename=bam,
            ref_filename=str(ref),
            examples_filename=str(tmp_path / "x.tfrecord"),
            mode="calling",
            realigner_enabled=False,
        )
        make_examples_runner(options)
        with open(str(tmp_path / "x.tfrecord.run_info.json")) as f:
            info = json.load(f)
        assert "resource_metrics" in info
        assert info["resource_metrics"]["wall_time_seconds"] > 0
        assert info["counts"]["examples"] == 0

"""One-step product CLIs (run_deeptrio / run_deepsomatic /
run_pangenome_aware_deepvariant): stage-1 runs for real on chr20 data;
the call_variants and postprocess stages are stubbed to capture their
argv so the orchestration (paths, sample names, somatic flags) is
pinned without paying three InceptionV3 CPU compiles.

Mirrors scripts/run_deeptrio.py / run_deepsomatic (reference) wiring.
"""

import os

import pytest

TESTDATA = "/root/reference/deepvariant/testdata"
TRIO_TESTDATA = "/root/reference/deeptrio/testdata/input"
BAM = f"{TESTDATA}/input/NA12878_S1.chr20.10_10p1mb.bam"
REF = f"{TESTDATA}/input/ucsc.hg19.chr20.unittest.fasta.gz"
REGION = "chr20:10,000,000-10,002,000"


def _stub_stages(monkeypatch, module, calls):
    """The one-step CLIs do `from scripts.call_variants import main as
    cv_main` inside their main(), so patch the SOURCE modules — the
    local import then resolves to the stubs at call time."""
    import deepvariant_tpu.scripts.call_variants as cv_mod
    import deepvariant_tpu.scripts.postprocess_variants as pp_mod

    def fake_cv(argv):
        calls.setdefault("cv", []).append(list(argv))
        # Produce the CVO file the postprocess stage expects.
        out = argv[argv.index("--outfile") + 1]
        from deepvariant_tpu.io.tfrecord import TFRecordWriter

        with TFRecordWriter(out):
            pass
        return 0

    def fake_pp(argv):
        calls.setdefault("pp", []).append(list(argv))
        out = argv[argv.index("--outfile") + 1]
        with open(out, "w") as f:
            f.write("##fileformat=VCFv4.2\n")
        return 0

    monkeypatch.setattr(cv_mod, "main", fake_cv)
    monkeypatch.setattr(pp_mod, "main", fake_pp)
    # Also cover CLIs that imported the mains at module import time.
    monkeypatch.setattr(module, "cv_main", fake_cv, raising=False)
    monkeypatch.setattr(module, "pp_main", fake_pp, raising=False)
    return calls


@pytest.mark.integration
def test_run_deepsomatic_tumor_normal(tmp_path, monkeypatch):
    import deepvariant_tpu.scripts.run_deepsomatic as rds

    calls = _stub_stages(monkeypatch, rds, {})
    out_vcf = str(tmp_path / "somatic.vcf.gz")
    rc = rds.main([
        "--ref", REF,
        "--reads_tumor", BAM,
        "--reads_normal", BAM,
        "--sample_name_tumor", "TUMOR",
        "--regions", REGION,
        "--output_vcf", out_vcf,
        "--intermediate_results_dir", str(tmp_path / "im"),
        "--allow_uninitialized_model",
    ])
    assert rc == 0
    # Stage-1 really produced tumor/normal stacked examples.
    examples = os.path.join(
        str(tmp_path / "im"), "make_examples_somatic.tfrecord.gz"
    )
    from deepvariant_tpu.io.tfrecord import TFRecordReader

    assert len(list(TFRecordReader(examples))) > 0
    # call_variants got the examples; postprocess got --process_somatic
    # and the tumor sample name.
    assert calls["cv"][0][calls["cv"][0].index("--examples") + 1] == \
        examples
    pp = calls["pp"][0]
    assert "--process_somatic" in pp
    assert pp[pp.index("--sample_name") + 1] == "TUMOR"


@pytest.mark.integration
def test_run_deepsomatic_tumor_only(tmp_path, monkeypatch):
    import deepvariant_tpu.scripts.run_deepsomatic as rds

    calls = _stub_stages(monkeypatch, rds, {})
    rc = rds.main([
        "--ref", REF,
        "--reads_tumor", BAM,
        "--regions", REGION,
        "--output_vcf", str(tmp_path / "somatic.vcf.gz"),
        "--intermediate_results_dir", str(tmp_path / "im"),
        "--allow_uninitialized_model",
    ])
    assert rc == 0
    assert "--process_somatic" in calls["pp"][0]


@pytest.mark.integration
def test_run_deeptrio(tmp_path, monkeypatch):
    if not os.path.isdir(TRIO_TESTDATA):
        pytest.skip("deeptrio testdata unavailable")
    import deepvariant_tpu.scripts.run_deeptrio as rdt

    calls = _stub_stages(monkeypatch, rdt, {})
    rc = rdt.main([
        "--ref", f"{TRIO_TESTDATA}/hs37d5.chr20.fa.gz",
        "--reads_child", f"{TRIO_TESTDATA}/HG001.chr20.10_10p1mb_sorted.bam",
        "--reads_parent1",
        f"{TRIO_TESTDATA}/NA12891.chr20.10_10p1mb_sorted.bam",
        "--reads_parent2",
        f"{TRIO_TESTDATA}/NA12892.chr20.10_10p1mb_sorted.bam",
        "--sample_name_child", "HG001",
        "--sample_name_parent1", "NA12891",
        "--sample_name_parent2", "NA12892",
        "--regions", "20:10,000,000-10,002,000",
        "--output_vcf_child", str(tmp_path / "child.vcf.gz"),
        "--output_vcf_parent1", str(tmp_path / "p1.vcf.gz"),
        "--output_vcf_parent2", str(tmp_path / "p2.vcf.gz"),
        "--intermediate_results_dir", str(tmp_path / "im"),
        "--allow_uninitialized_model",
    ])
    assert rc == 0
    # Three per-sample pipelines ran: child + two parents.
    assert len(calls["cv"]) == 3
    assert len(calls["pp"]) == 3
    sample_names = {
        pp[pp.index("--sample_name") + 1] for pp in calls["pp"]
    }
    assert sample_names == {"HG001", "NA12891", "NA12892"}


@pytest.mark.integration
def test_run_pangenome_aware(tmp_path, monkeypatch):
    import deepvariant_tpu.scripts.run_pangenome_aware_deepvariant as rpg

    calls = _stub_stages(monkeypatch, rpg, {})
    rc = rpg.main([
        "--ref", REF,
        "--reads", BAM,
        "--pangenome", BAM,  # panel as alignments (BAM form)
        "--regions", REGION,
        "--output_vcf", str(tmp_path / "pg.vcf.gz"),
        "--intermediate_results_dir", str(tmp_path / "im"),
        "--allow_uninitialized_model",
    ])
    assert rc == 0
    assert calls["cv"] and calls["pp"]

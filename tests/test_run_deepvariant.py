"""run_deepvariant one-step CLI: fan-out failure semantics.

The reference fans make_examples out with GNU parallel --halt 2
(scripts/run_deepvariant.py:457-462): the first failing shard kills
the remaining ones and fails the run. These tests pin the same
behavior for the multiprocessing fan-out.
"""

import os
import time

import pytest

import deepvariant_tpu.scripts.run_deepvariant as rdv

TESTDATA = "/root/reference/deepvariant/testdata"

# Communicated to forked pool workers via module globals (the pool is
# created after monkeypatching, so fork children see these values).
_SENTINEL_DIR = None


def _failing_shard(args_tuple):
    argv, task = args_tuple
    if task == 0:
        return 42, f"shard {task}: injected failure\n"
    # Surviving shards would take much longer than the failing one;
    # if halt-on-failure works they are terminated before finishing.
    time.sleep(8)
    with open(os.path.join(_SENTINEL_DIR, f"done{task}"), "w") as f:
        f.write("finished\n")
    return 0, f"shard {task}: ok\n"


def test_fanout_halts_on_first_shard_failure(tmp_path, monkeypatch):
    global _SENTINEL_DIR
    sentinel_dir = tmp_path / "sentinels"
    sentinel_dir.mkdir()
    _SENTINEL_DIR = str(sentinel_dir)
    monkeypatch.setattr(rdv, "_run_make_examples_shard", _failing_shard)

    t0 = time.time()
    rc = rdv.main([
        "--reads", f"{TESTDATA}/input/NA12878_S1.chr20.10_10p1mb.bam",
        "--ref", f"{TESTDATA}/input/ucsc.hg19.chr20.unittest.fasta.gz",
        "--output_vcf", str(tmp_path / "out.vcf.gz"),
        "--num_shards", "4",
    ])
    elapsed = time.time() - t0

    assert rc == 42  # the failing shard's code propagates
    # The surviving shards were terminated, not run to completion.
    assert not list(sentinel_dir.iterdir())
    assert elapsed < 8


def test_single_shard_failure_propagates(tmp_path, monkeypatch):
    monkeypatch.setattr(
        rdv, "_run_make_examples_shard",
        lambda args_tuple: (7, "injected single-shard failure\n"),
    )
    rc = rdv.main([
        "--reads", f"{TESTDATA}/input/NA12878_S1.chr20.10_10p1mb.bam",
        "--ref", f"{TESTDATA}/input/ucsc.hg19.chr20.unittest.fasta.gz",
        "--output_vcf", str(tmp_path / "out.vcf.gz"),
        "--num_shards", "1",
    ])
    assert rc == 7


@pytest.mark.integration
def test_one_step_pipeline_end_to_end(tmp_path):
    """Full one-step run on real chr20 data: sharded make_examples ->
    jit inference (uninitialized model) -> postprocess -> bgzf VCF +
    gVCF with .tbi; the sharded fan-out and every stage's CLI wiring
    run for real."""
    out_vcf = str(tmp_path / "out.vcf.gz")
    out_gvcf = str(tmp_path / "out.g.vcf.gz")
    rc = rdv.main([
        "--reads", f"{TESTDATA}/input/NA12878_S1.chr20.10_10p1mb.bam",
        "--ref", f"{TESTDATA}/input/ucsc.hg19.chr20.unittest.fasta.gz",
        "--regions", "chr20:10,000,000-10,004,000",
        "--output_vcf", out_vcf,
        "--output_gvcf", out_gvcf,
        "--num_shards", "2",
        "--batch_size", "8",
        "--allow_uninitialized_model",
        "--intermediate_results_dir", str(tmp_path / "intermediate"),
    ])
    assert rc == 0
    from deepvariant_tpu.io.vcf import VcfReader

    records = list(VcfReader(out_vcf))
    assert len(records) > 0
    gvcf_records = list(VcfReader(out_gvcf))
    # gVCF covers the region with ref blocks + variant rows.
    assert len(gvcf_records) > len(records)
    assert os.path.exists(out_vcf + ".tbi")


def test_resolve_checkpoint_path(tmp_path):
    """--checkpoint accepts a model directory (dv-export-model output)
    and resolves model.msgpack, then best.msgpack."""
    from deepvariant_tpu.scripts.call_variants import (
        resolve_checkpoint_path,
    )

    assert resolve_checkpoint_path("") == ""
    f = tmp_path / "ckpt-3.msgpack"
    f.write_bytes(b"x")
    assert resolve_checkpoint_path(str(f)) == str(f)
    d = tmp_path / "model_dir"
    d.mkdir()
    import pytest

    with pytest.raises(SystemExit, match="neither"):
        resolve_checkpoint_path(str(d))
    (d / "best.msgpack").write_bytes(b"x")
    assert resolve_checkpoint_path(str(d)) == str(d / "best.msgpack")
    (d / "model.msgpack").write_bytes(b"x")
    assert resolve_checkpoint_path(str(d)) == str(d / "model.msgpack")

"""Device pileup encoder: numerics equality vs the numpy encoder on
real chr20 data, for the full WGS channel set."""

import os

import numpy as np
import pytest

from deepvariant_tpu.core.types import Range
from deepvariant_tpu.io.bam import BamReader
from deepvariant_tpu.io.fasta import FastaReader
from deepvariant_tpu.make_examples.core import (
    MakeExamplesOptions,
    RegionProcessor,
)
from deepvariant_tpu.make_examples.examples_builder import (
    alt_allele_combinations,
)
from deepvariant_tpu.make_examples.pileup import (
    PileupEncoder,
    reads_overlapping_variant,
)
from deepvariant_tpu.make_examples.pileup_jax import (
    encode_region_candidates,
    make_encode_fn,
)


@pytest.mark.integration
def test_device_encoder_matches_numpy(testdata_dir):
    options = MakeExamplesOptions(
        reads_filename=os.path.join(
            testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
        ),
        ref_filename=os.path.join(
            testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ),
        examples_filename="/tmp/unused.tfrecord",
        mode="calling",
        realigner_enabled=False,
    )
    proc = RegionProcessor(options)
    region = Range("chr20", 10_000_000, 10_004_000)
    batch = proc.region_reads(region)
    candidates, _, _ = proc.candidates_in_region(region, batch, False)
    assert candidates, "need candidates for the comparison"

    encoder = proc.examples_builder.encoder
    builder = proc.examples_builder

    dv_calls, combos, expected = [], [], []
    for dv_call in candidates:
        ref_window = builder.reference_window(dv_call.variant)
        if ref_window is None:
            continue
        for combo in alt_allele_combinations(dv_call.variant):
            indices = reads_overlapping_variant(
                batch, dv_call.variant,
                encoder.options.read_overlap_buffer_bp,
            )
            expected.append(encoder.build_pileup(
                dv_call, ref_window, batch, indices, combo
            ))
            dv_calls.append(dv_call)
            combos.append(combo)

    got = encode_region_candidates(
        encoder, dv_calls, combos, batch,
        lambda v: builder.reference_window(v),
    )
    assert got.shape == (len(expected),) + expected[0].shape
    mismatched = 0
    for i, exp in enumerate(expected):
        if not np.array_equal(got[i], exp):
            mismatched += 1
            diff = np.argwhere(got[i] != exp)
            print(f"example {i}: {len(diff)} differing pixels, "
                  f"first {diff[0]} got={got[i][tuple(diff[0])]} "
                  f"exp={exp[tuple(diff[0])]}")
    assert mismatched == 0, f"{mismatched}/{len(expected)} images differ"


def test_encode_fn_shapes():
    from deepvariant_tpu.make_examples.pileup import PileupOptions

    o = PileupOptions(width=21, height=10)
    fn = make_encode_fn(o)
    k, n, rows = 4, 3, o.height - o.reference_band_height
    import jax.numpy as jnp

    out = fn(
        jnp.zeros((k, 50), jnp.uint8),
        jnp.zeros((k, 50), jnp.uint8),
        jnp.full((k,), 60, jnp.uint8),
        jnp.zeros((k,), bool),
        jnp.zeros((k,), jnp.int8),
        jnp.zeros((k,), jnp.int32),
        jnp.zeros((k,), bool),
        jnp.zeros((n,), jnp.int32),
        jnp.full((n, rows), -1, jnp.int32),
        jnp.zeros((n, k), jnp.int8),
        jnp.zeros((n, k), jnp.uint8),
        jnp.full((n, o.width), ord("A"), jnp.uint8),
    )
    assert out.shape == (n, o.height, o.width, len(o.channels))
    # Empty rows -> zeros; ref band present.
    out = np.asarray(out)
    assert (out[:, o.reference_band_height:, :, :] == 0).all()
    assert out[:, 0, :, 0].max() > 0  # ref band read_base nonzero


def test_fold_batch_norm_exact():
    """BN folding (export-time) is exact to float32 rounding and the
    folded tree carries no bn params/stats."""
    import jax.numpy as jnp
    from flax import traverse_util

    from deepvariant_tpu.models.inception_v3 import (
        create_model,
        fold_batch_norm,
        normalize_pileup,
    )

    model, variables = create_model(7, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    stats = traverse_util.flatten_dict(variables["batch_stats"])
    stats = {
        k: (rng.normal(0, 0.5, v.shape).astype(np.float32)
            if k[-1] == "mean"
            else np.abs(rng.normal(1, 0.3, v.shape)).astype(np.float32))
        for k, v in stats.items()
    }
    params = traverse_util.flatten_dict(variables["params"])
    params = {
        k: rng.normal(0, 0.05, v.shape).astype(np.float32)
        for k, v in params.items()
    }
    variables = {
        "params": traverse_util.unflatten_dict(params),
        "batch_stats": traverse_util.unflatten_dict(stats),
    }
    x = normalize_pileup(jnp.asarray(
        rng.integers(0, 255, (2, 100, 221, 7), dtype=np.uint8)
    )).astype(jnp.float32)
    ref = model.apply(variables, x, train=False)
    fmodel, fvars = fold_batch_norm(model, variables)
    out = fmodel.apply(fvars, x, train=False)
    assert float(jnp.abs(ref - out).max()) < 2e-4
    flat = traverse_util.flatten_dict(fvars["params"])
    assert not any("bn" in path for path in flat)
    assert any(path[-1] == "bias" and path[-2] == "conv"
               for path in flat)

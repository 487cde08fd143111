"""Model + inference-stage tests (InceptionV3, Predictor, CVO round-trip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepvariant_tpu.core.types import CallVariantsOutput, Variant, VariantCall
from deepvariant_tpu.io import examples as example_codec
from deepvariant_tpu.io.tfrecord import TFRecordWriter, read_tfrecords
from deepvariant_tpu.models.inception_v3 import (
    InceptionV3,
    adapt_input_channels,
    create_model,
    normalize_pileup,
)


@pytest.fixture(scope="module")
def small_model():
    # float32 on CPU for test determinism.
    return create_model(6, dtype=jnp.float32)


def test_forward_shape_and_probabilities(small_model):
    model, variables = small_model
    x = normalize_pileup(
        jnp.asarray(
            np.random.RandomState(0).randint(
                0, 255, (4, 100, 221, 6), np.uint8
            )
        )
    ).astype(jnp.float32)
    probs = model.apply(variables, x, train=False)
    assert probs.shape == (4, 3)
    np.testing.assert_allclose(np.sum(np.asarray(probs), -1), 1.0, atol=1e-5)
    assert np.all(np.asarray(probs) >= 0)


def test_param_count_inception_scale(small_model):
    # Keras InceptionV3(include_top=False) has ~21.8M params; the exact
    # total here includes the 6-channel stem and the 3-way head.
    _, variables = small_model
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert 21_700_000 < n < 21_900_000


def test_normalize_pileup_range():
    x = np.array([0, 128, 254], np.uint8).reshape(1, 1, 3, 1)
    out = np.asarray(normalize_pileup(jnp.asarray(x)), np.float32)
    np.testing.assert_allclose(
        out.ravel(), [(0 - 128) / 128, 0.0, (254 - 128) / 128], atol=1e-2
    )


def test_adapt_input_channels(small_model):
    _, variables = small_model
    params7 = adapt_input_channels(variables["params"], 7)
    k = params7["stem1"]["conv"]["kernel"]
    assert k.shape == (3, 3, 7, 32)
    np.testing.assert_array_equal(
        np.asarray(k)[:, :, :6, :],
        np.asarray(variables["params"]["stem1"]["conv"]["kernel"]),
    )


def test_predictor_stream_padding(small_model, tmp_path):
    from deepvariant_tpu.calling.call_variants import (
        Predictor,
        call_variants,
        read_cvos,
    )

    model, variables = small_model
    # Write 5 examples (not a multiple of batch) to a TFRecord.
    path = str(tmp_path / "examples.tfrecord")
    rng = np.random.RandomState(1)
    with TFRecordWriter(path) as w:
        for i in range(5):
            variant = Variant(
                reference_name="chr1",
                start=100 + i,
                end=101 + i,
                reference_bases="A",
                alternate_bases=["T"],
                calls=[VariantCall(call_set_name="s1",
                                   info={"AD": [3, 4], "DP": [7]})],
            )
            img = rng.randint(0, 255, (100, 221, 6), np.uint8)
            w.write(
                example_codec.make_example(
                    variant, img, alt_allele_indices=[0],
                    locus_region=f"chr1:{100 + i}-{101 + i}",
                )
            )
    out = str(tmp_path / "cvo.tfrecord")
    stats = call_variants(
        path, out, variables, batch_size=8, model=model
    )
    assert stats["num_examples"] == 5
    cvos = list(read_cvos(out))
    assert len(cvos) == 5
    for cvo in cvos:
        assert cvo.variant.reference_name == "chr1"
        assert cvo.alt_allele_indices == [0]
        assert abs(sum(cvo.genotype_probabilities) - 1.0) < 1e-9
        assert len(cvo.genotype_probabilities) == 3


def test_parallel_writer_pool_matches_inline(small_model, tmp_path):
    """num_writers=2 shards the CVO output across a spawn-based writer
    pool (reference writer-process pool, call_variants.py:934-1053);
    the merged record set must equal the inline single-writer output."""
    from deepvariant_tpu.calling.call_variants import (
        call_variants,
        read_cvos,
    )
    from deepvariant_tpu.calling.cvo_writer import shard_paths

    model, variables = small_model
    path = str(tmp_path / "examples.tfrecord")
    rng = np.random.RandomState(7)
    with TFRecordWriter(path) as w:
        for i in range(11):
            variant = Variant(
                reference_name="chr1",
                start=100 + i,
                end=101 + i,
                reference_bases="A",
                alternate_bases=["T"],
                calls=[VariantCall(call_set_name="s1",
                                   info={"AD": [3, 4], "DP": [7]})],
            )
            img = rng.randint(0, 255, (100, 221, 6), np.uint8)
            w.write(
                example_codec.make_example(
                    variant, img, alt_allele_indices=[0],
                    locus_region=f"chr1:{100 + i}-{101 + i}",
                )
            )

    inline_out = str(tmp_path / "cvo_inline.tfrecord.gz")
    stats1 = call_variants(
        path, inline_out, variables, batch_size=4, model=model
    )
    pool_out = str(tmp_path / "cvo_pool.tfrecord.gz")
    stats2 = call_variants(
        path, pool_out, variables, batch_size=4, model=model,
        num_writers=2,
    )
    assert stats1["num_examples"] == stats2["num_examples"] == 11
    assert stats2["output_paths"] == shard_paths(pool_out, 2)

    def key(cvo):
        return (cvo.variant.start, tuple(cvo.genotype_probabilities))

    inline = sorted(key(c) for c in read_cvos(inline_out))
    # Batches round-robin across shards; the base path globs the family.
    pooled = sorted(key(c) for c in read_cvos(
        str(tmp_path / "cvo_pool-?????-of-?????.tfrecord.gz")))
    assert pooled == inline
    # Within-shard order is FIFO: starts ascend inside each shard file.
    for p in stats2["output_paths"]:
        starts = [c.variant.start for c in read_cvos(p)]
        assert starts == sorted(starts) and starts

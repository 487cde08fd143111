"""Exactness of the inference-graph stem rewrites
(models/inception_v3.py convert_stem_to_s2d / pad_stem_input_channels).

These are throughput optimizations for the TPU MXU (the 7-channel 3x3
stem kernel fills k=63 of a 128-wide contraction tile; space-to-depth
packs k=2*2*4C and padding to 8 channels makes the packed k exactly
128) — they MUST be bit-for-bit-meaning-preserving rewrites, verified
here in float32 where equality is exact.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from deepvariant_tpu.models.inception_v3 import (
    InceptionV3,
    convert_stem_to_s2d,
    create_model,
    fold_batch_norm,
    normalize_pileup,
    pad_stem_input_channels,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (2, 100, 221, 7)).astype(np.uint8)
    model, variables = create_model(7, dtype=jnp.float32)
    x = normalize_pileup(img).astype(jnp.float32)
    base = np.array(model.apply(variables, x, train=False))
    return img, model, variables, x, base


def test_s2d_stem_exact(setup):
    img, model, variables, x, base = setup
    m2, v2 = convert_stem_to_s2d(model, variables)
    out = np.array(m2.apply(v2, x, train=False))
    np.testing.assert_array_equal(out, base)


def test_pad_channels_exact(setup):
    img, model, variables, x, base = setup
    v8 = pad_stem_input_channels(variables, 8)
    img8 = np.concatenate(
        [img, np.zeros((2, 100, 221, 1), np.uint8)], axis=-1
    )
    x8 = normalize_pileup(img8).astype(jnp.float32)
    out = np.array(model.apply(v8, x8, train=False))
    np.testing.assert_array_equal(out, base)


def test_pad_plus_s2d_on_folded_graph(setup):
    img, model, variables, x, base = setup
    fm, fv = fold_batch_norm(model, variables)
    folded = np.array(fm.apply(fv, x, train=False))
    fv8 = pad_stem_input_channels(fv, 8)
    m2, v2 = convert_stem_to_s2d(fm, fv8)
    img8 = np.concatenate(
        [img, np.zeros((2, 100, 221, 1), np.uint8)], axis=-1
    )
    x8 = normalize_pileup(img8).astype(jnp.float32)
    out = np.array(m2.apply(v2, x8, train=False))
    np.testing.assert_array_equal(out, folded)


def test_backbone_truncation_shapes(setup):
    img, model, variables, x, base = setup
    stem = model.apply(
        variables, x, False, "stem", method=InceptionV3.backbone,
    )
    assert stem.shape[0] == 2 and stem.shape[-1] == 192
    m3 = model.apply(
        variables, x, False, "mixed3", method=InceptionV3.backbone,
    )
    # ReductionA concat: 288 passthrough pool + 384 + 96.
    assert m3.shape[-1] == 288 + 384 + 96
    full = model.apply(
        variables, x, False, method=InceptionV3.backbone,
    )
    assert full.shape == (2, 2048)


def test_s2d_rejects_non_3x3(setup):
    img, model, variables, x, base = setup
    m2, v2 = convert_stem_to_s2d(model, variables)
    with pytest.raises(ValueError):
        convert_stem_to_s2d(m2, v2)


def test_predictor_fold_pad_equivalence():
    """Predictor(fold_bn=True, pad_stem_to=8) matches the plain
    graph (calling/call_variants.py — the production fast path the
    round-5 study selected)."""
    from deepvariant_tpu.calling.call_variants import Predictor

    rng = np.random.RandomState(3)
    model, variables = create_model(7, dtype=jnp.float32)
    images = rng.randint(0, 255, (8, 100, 221, 7)).astype(np.uint8)
    base = np.asarray(Predictor(
        variables, batch_size=8, model=model
    )(images))
    fast = np.asarray(Predictor(
        variables, batch_size=8, model=model,
        fold_bn=True, pad_stem_to=8,
    )(images))
    np.testing.assert_allclose(fast, base, atol=3e-5)

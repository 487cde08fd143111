"""Example-utility semantics (shape discovery, image normalization).

Ported corpus: deepvariant/dv_utils_test.py — the shape-from-path
pattern table (plain, @N spec, ?????-of glob, *), empty-path None,
invalid-path raise, failed image/shape, preprocess/unpreprocess pins,
channel ablation — and deepvariant/exclude_contigs_test.py.
TF-tensor-only helpers (string_to_int_tensor and friends) have no
equivalent here by design; call_variant_to_tfexample has no
production consumer in the reference and is not ported.
"""

import numpy as np
import pytest

from deepvariant_tpu.io import examples as exio, tfrecord


def _write_examples(path, shapes):
    with tfrecord.TFRecordWriter(path) as w:
        for shape in shapes:
            w.write(exio.encode_example({"image/shape": list(shape)}))


@pytest.mark.parametrize("file_name,spec", [
    ("test_shape.gz", "test_shape.gz"),
    ("test_shape-00000-of-00001.gz", "test_shape@1.gz"),
    ("test_shape-00000-of-00001.gz", "test_shape-?????-of-00001.gz"),
    ("test_shape-00000-of-00001.gz", "test_shape-*.gz"),
    ("output", "output"),
    ("test_shape-00000-of-00001", "test_shape@1"),
    ("test_shape-00000-of-00001", "test_shape-?????-of-00001"),
    ("test_shape-00000-of-00001", "test_shape-*"),
])
def test_get_shape_from_examples_path(tmp_path, file_name, spec):
    _write_examples(str(tmp_path / file_name), [[1, 2, 3]])
    assert exio.shape_from_examples_path(
        str(tmp_path / spec)
    ) == [1, 2, 3]


@pytest.mark.parametrize("file_name,spec", [
    ("test_shape.gz", "test_shape.gz"),
    ("test_shape-00000-of-00001.gz", "test_shape@1.gz"),
    ("test_shape-00000-of-00001.gz", "test_shape-?????-of-00001.gz"),
    ("test_shape-00000-of-00001.gz", "test_shape-*.gz"),
    ("output", "output"),
    ("test_shape-00000-of-00001", "test_shape@1"),
    ("test_shape-00000-of-00001", "test_shape-?????-of-00001"),
    ("test_shape-00000-of-00001", "test_shape-*"),
])
def test_get_none_shape_from_empty_examples_path(tmp_path, file_name,
                                                 spec):
    _write_examples(str(tmp_path / file_name), [])
    assert exio.shape_from_examples_path(str(tmp_path / spec)) is None


@pytest.mark.parametrize("source", [
    "/this/path/does/not/exist",
    "/bad/pathA/a,/bad/pathB/b",
])
def test_get_shape_from_examples_path_invalid_path(source):
    with pytest.raises(Exception, match="/bad/pathA|/this/path"):
        exio.shape_from_examples_path(source)


def test_failed_example_image_shape():
    with pytest.raises(ValueError, match="image/shape"):
        exio.example_image_shape({})
    with pytest.raises(ValueError, match="image/shape"):
        exio.example_image_shape({"image/shape": [1, 2]})


def test_preprocess_images():
    import jax.numpy as jnp

    from deepvariant_tpu.models.inception_v3 import normalize_pileup

    test_input = jnp.array([[0, 128, 255]], dtype=jnp.uint8)
    out = np.asarray(
        normalize_pileup(test_input).astype(jnp.float32)
    )
    np.testing.assert_array_equal(
        out, np.array([[-1.0, 0.0, 0.9921875]], np.float32)
    )
    assert (out >= -1.0).all() and (out <= 1.0).all()


def test_unpreprocess_images():
    # The inverse map x*128+128 restores the original uint8 planes.
    norm = np.array([[-1.0, 0.0, 0.9921875]], np.float32)
    restored = norm * 128.0 + 128.0
    np.testing.assert_array_equal(
        restored, np.array([[0.0, 128.0, 255.0]], np.float32)
    )


def test_channel_ablation():
    # 7-channel image restricted to channel indices [1, 2, 3]: the
    # Predictor applies normalize + keep-index slice inside its jitted
    # forward (calling/call_variants.py Predictor.__init__); this pins
    # that transformation's shape semantics.
    import jax.numpy as jnp

    from deepvariant_tpu.models.inception_v3 import normalize_pileup

    keep = np.array([1, 2, 3], np.int32)
    x = normalize_pileup(jnp.ones((1, 1, 1, 7), jnp.uint8))[..., keep]
    assert x.shape == (1, 1, 1, 3)


def test_excluded_contigs_keep_standard_human_contigs():
    from deepvariant_tpu.make_examples.core import (
        EXCLUDED_HUMAN_CONTIGS,
    )

    for chrom in range(1, 22):
        for prefix in ["", "chr", "Chr"]:
            assert f"{prefix}{chrom}" not in EXCLUDED_HUMAN_CONTIGS
    assert "chrX" not in EXCLUDED_HUMAN_CONTIGS
    assert "chrY" not in EXCLUDED_HUMAN_CONTIGS

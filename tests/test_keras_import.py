"""keras -> flax weight-import validation (requires tensorflow)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")


@pytest.mark.integration
def test_converted_model_matches_keras(tmp_path):
    import jax.numpy as jnp

    from deepvariant_tpu.models.inception_v3 import InceptionV3
    from deepvariant_tpu.models.keras_import import (
        load_keras_into_flax,
    )

    tf.random.set_seed(7)
    backbone = tf.keras.applications.InceptionV3(
        include_top=False, weights=None, input_shape=(100, 221, 3),
        pooling="avg",
    )
    hid = tf.keras.layers.Dropout(0.2)(backbone.output)
    out = tf.keras.layers.Dense(3, activation="softmax")(hid)
    keras_model = tf.keras.Model(inputs=backbone.input, outputs=out)

    _, variables = load_keras_into_flax(keras_model, num_channels=3)
    rng = np.random.RandomState(0)
    x = rng.rand(4, 100, 221, 3).astype(np.float32) * 2 - 1
    keras_out = keras_model(x, training=False).numpy()
    flax_out = np.asarray(
        InceptionV3(dtype=jnp.float32).apply(
            variables, jnp.asarray(x), train=False
        )
    )
    np.testing.assert_allclose(keras_out, flax_out, atol=5e-4)


@pytest.mark.integration
def test_channel_adaptation():
    from deepvariant_tpu.models.keras_import import (
        convert_keras_inception,
    )

    backbone = tf.keras.applications.InceptionV3(
        include_top=False, weights=None, input_shape=(100, 221, 3),
        pooling="avg",
    )
    params, batch_stats, head = convert_keras_inception(
        backbone, num_channels=7
    )
    assert params["stem1"]["conv"]["kernel"].shape == (3, 3, 7, 32)
    assert head is None  # backbone only

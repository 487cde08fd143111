"""Small-model training: MLP over candidate summary features.

Reference parity: small_model/small_model_config.py hyperparameters
(relu MLP (750, 750), adam lr 1e-4 with per-epoch exponential decay
0.99, weight decay 1e-7) and make_small_model_examples.py's training
tf.Example schema (features/encoded int64 list + one-hot
label/encoded, :45-48, :710-786). Training runs as a jitted
optax.adamw loop; the resulting params serve the pure-numpy inference
gate (small_model.model.numpy_mlp_forward) inside make_examples.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from deepvariant_tpu.io import examples as example_codec
from deepvariant_tpu.io.tfrecord import TFRecordReader, TFRecordWriter

FEATURES_ENCODED = "features/encoded"
IDS_ENCODED = "ids/encoded"
LABEL_ENCODED = "label/encoded"
GENOTYPE_ENCODED = "genotype/encoded"
NUM_CLASSES = 3


@dataclasses.dataclass
class SmallModelTrainConfig:
    """small_model_config.py:79-110 defaults."""

    hidden_layer_sizes: Tuple[int, ...] = (750, 750)
    learning_rate: float = 1e-4
    learning_rate_decay_rate: float = 0.99
    weight_decay: float = 1e-7
    batch_size: int = 1024
    num_epochs: int = 10


def get_config(name: str = "wgs") -> SmallModelTrainConfig:
    """Presets (wgs/pacbio/ont share hyperparameters; the products
    differ in expand_by_haplotype at example-generation time)."""
    if name not in ("wgs", "pacbio", "ont", "test"):
        raise ValueError(f"unknown small-model config {name!r}")
    if name == "test":
        return SmallModelTrainConfig(
            hidden_layer_sizes=(32, 32), batch_size=16,
            num_epochs=30, learning_rate=1e-2,
        )
    return SmallModelTrainConfig()


# -- training-example codec ---------------------------------------------------

def encode_training_example(
    features: Sequence[int], label: int, ids: Sequence[str] = ()
) -> bytes:
    """tf.Example wire bytes (make_small_model_examples.py:710-755)."""
    one_hot = [0] * NUM_CLASSES
    one_hot[label] = 1
    payload: Dict[str, object] = {
        FEATURES_ENCODED: [int(f) for f in features],
        LABEL_ENCODED: one_hot,
        GENOTYPE_ENCODED: [int(label)],
    }
    if ids:
        payload[IDS_ENCODED] = [s.encode() for s in ids]
    return example_codec.encode_example(payload)


def decode_training_example(buf: bytes) -> Tuple[np.ndarray, int]:
    feats = example_codec.decode_example(buf)
    x = np.asarray(feats[FEATURES_ENCODED], np.float32)
    label = int(np.argmax(feats[LABEL_ENCODED]))
    return x, label


def read_training_examples(path: str):
    """(features (N, F) float32, labels (N,) int32) from TFRecords."""
    from deepvariant_tpu.core.sharded_files import glob_sharded_inputs

    xs, ys = [], []
    for p in glob_sharded_inputs(path):
        with TFRecordReader(p) as reader:
            for buf in reader:
                x, y = decode_training_example(buf)
                xs.append(x)
                ys.append(y)
    if not xs:
        return np.zeros((0, 0), np.float32), np.zeros(0, np.int32)
    return np.stack(xs), np.asarray(ys, np.int32)


# -- training loop -------------------------------------------------------------

def train_small_model(
    train_path: str,
    output_dir: str,
    config: Optional[SmallModelTrainConfig] = None,
    tune_path: str = "",
    seed: int = 0,
) -> Dict[str, float]:
    """Train and write <output_dir>/small_model.msgpack (+ features
    sidecar). Returns final metrics."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from deepvariant_tpu.small_model.model import SmallModelMLP

    config = config or get_config()
    x_train, y_train = read_training_examples(train_path)
    if not len(x_train):
        raise ValueError(f"no training examples in {train_path}")
    n, num_features = x_train.shape
    # Feature normalization: fit mean/scale on train (keras pipelines
    # normalize counts; the inference gate applies the same affine).
    mean = x_train.mean(axis=0)
    scale = x_train.std(axis=0)
    scale[scale == 0] = 1.0
    x_train = (x_train - mean) / scale

    model = SmallModelMLP(
        hidden_layer_sizes=tuple(config.hidden_layer_sizes)
    )
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.zeros((1, num_features)))
    steps_per_epoch = max(1, n // config.batch_size)
    schedule = optax.exponential_decay(
        config.learning_rate, steps_per_epoch,
        config.learning_rate_decay_rate,
    )
    tx = optax.adamw(schedule, weight_decay=config.weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            # The MLP emits probabilities (softmax head); NLL on the
            # clipped log-probs.
            probs = model.apply(p, xb)
            logp = jnp.log(jnp.clip(probs, 1e-9, 1.0))
            one_hot = jax.nn.one_hot(yb, NUM_CLASSES)
            return -(one_hot * logp).sum(axis=-1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng_np = np.random.RandomState(seed)
    metrics: Dict[str, float] = {}
    # A corpus smaller than one batch must still train: cap the batch
    # at n (a 1024 default batch over a few hundred rows previously
    # produced ZERO steps and silently returned the random init).
    batch_size = min(config.batch_size, n)
    for epoch in range(config.num_epochs):
        order = rng_np.permutation(n)
        losses = []
        for start in range(0, n - batch_size + 1, batch_size):
            idx = order[start : start + batch_size]
            params, opt_state, loss = step(
                params, opt_state, x_train[idx], y_train[idx]
            )
            losses.append(float(loss))
        preds = np.argmax(
            np.asarray(model.apply(params, jnp.asarray(x_train))),
            axis=1,
        )
        metrics = {
            "epoch": epoch,
            "train_loss": float(np.mean(losses)) if losses else 0.0,
            "train_accuracy": float((preds == y_train).mean()),
        }
    if tune_path:
        x_tune, y_tune = read_training_examples(tune_path)
        if len(x_tune):
            x_tune = (x_tune - mean) / scale
            preds = np.argmax(
                np.asarray(model.apply(params, jnp.asarray(x_tune))),
                axis=1,
            )
            metrics["tune_accuracy"] = float((preds == y_tune).mean())

    os.makedirs(output_dir, exist_ok=True)
    bundle = {
        "params": jax.device_get(params),
        "mean": mean,
        "scale": scale,
    }
    with open(os.path.join(output_dir, "small_model.msgpack"),
              "wb") as f:
        f.write(serialization.to_bytes(bundle))
    with open(os.path.join(output_dir, "small_model.json"), "w") as f:
        json.dump({
            "num_features": int(num_features),
            "hidden_layer_sizes": list(config.hidden_layer_sizes),
            "metrics": metrics,
        }, f, indent=2)
    return metrics

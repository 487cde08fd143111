"""Device-resident training: the whole dataset lives in HBM.

The reference streams TFRecords through tf.data into the accelerator
every step (train.py:98-127 + data_providers.py). On this image the
host->device link is a ~8 MB/s tunnel, so per-step batch transfer
(batch 512 x 155 KB/example) would starve the MXU by three orders of
magnitude. The TPU-native restructuring:

  * ship the full uint8 example tensor to HBM ONCE (a corpus of ~20k
    pileups is ~3 GB, a fraction of one chip's 16 GB);
  * run each epoch as ONE jitted executable — `lax.scan` over steps,
    each step gathering its shuffled batch from the resident arrays
    on-device (HBM gather, no host round-trip) and reusing the exact
    train step from training/train.py;
  * keep a running best-checkpoint COPY on device, updated by tune
    metric; fetch state to host only at the end (one ~200 MB pull
    instead of one per epoch).

Per-epoch host traffic: one (steps, B) int32 permutation up, one
scalar-loss + two 3x3 confusion matrices down.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepvariant_tpu.core.sharded_files import glob_sharded_inputs
from deepvariant_tpu.io import examples as example_codec
from deepvariant_tpu.io.tfrecord import TFRecordReader
from deepvariant_tpu.models.inception_v3 import create_model
from deepvariant_tpu.training import metrics as metrics_lib
from deepvariant_tpu.training import train as train_lib
from deepvariant_tpu.training.config import TrainConfig


def load_dataset_arrays(
    tfrecord_path: str, config: TrainConfig
) -> Dict[str, np.ndarray]:
    """Parse a labeled TFRecord corpus into packed host arrays."""
    class_weights = config.class_weight_list()
    images, labels, vtypes = [], [], []
    for path in glob_sharded_inputs(tfrecord_path):
        with TFRecordReader(path) as reader:
            for buf in reader:
                ex = example_codec.parse_example(buf)
                images.append(ex.image)
                labels.append(int(ex.label or 0))
                vtypes.append(int(ex.variant_type or 0))
    labels_arr = np.asarray(labels, np.int32)
    if class_weights:
        weights = np.asarray(class_weights, np.float32)[
            np.clip(labels_arr, 0, len(class_weights) - 1)
        ]
    else:
        weights = np.ones(len(labels_arr), np.float32)
    return {
        "images": np.stack(images),
        "labels": labels_arr,
        "sample_weights": weights,
        "variant_types": np.asarray(vtypes, np.int32),
    }


def _epoch_fns(model, tx, config: TrainConfig):
    """Build jitted whole-epoch train and tune executables."""
    train_step = train_lib.make_train_step(model, tx, config)
    eval_step = train_lib.make_eval_step(model, config)

    def run_epoch(state, data, perm):
        """perm: (steps, B) int32 — shuffled batch indices."""

        def body(state, idx):
            batch = {k: v[idx] for k, v in data.items()
                     if k != "images"}
            batch["images"] = data["images"][idx]
            state, loss, cms = train_step(state, batch)
            return state, (loss, cms["all"], cms["snp"], cms["indel"])

        state, (losses, cm_all, cm_snp, cm_indel) = jax.lax.scan(
            body, state, perm
        )
        return state, losses.mean(), cm_all.sum(0), cm_snp.sum(0), \
            cm_indel.sum(0)

    def run_tune(state, data, idx, weights):
        """idx: (steps, B) indices padded at tail; weights mask pads."""

        def body(_, step_in):
            step_idx, step_w = step_in
            batch = {
                "images": data["images"][step_idx],
                "labels": data["labels"][step_idx],
                "sample_weights": step_w,
                "variant_types": data["variant_types"][step_idx],
            }
            loss, cm = eval_step(state, batch)
            return None, (loss, cm)

        _, (losses, cms) = jax.lax.scan(body, None, (idx, weights))
        return losses.mean(), cms.sum(0)

    return (
        jax.jit(run_epoch, donate_argnums=(0,)),
        jax.jit(run_tune),
    )


def _tune_index_plan(
    n: int, batch_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Fixed-shape tune schedule: pad the tail batch with masked rows."""
    steps = max((n + batch_size - 1) // batch_size, 1)
    idx = np.zeros((steps, batch_size), np.int32)
    mask = np.zeros((steps, batch_size), np.float32)
    flat = np.arange(n, dtype=np.int32)
    for s in range(steps):
        chunk = flat[s * batch_size: (s + 1) * batch_size]
        idx[s, : len(chunk)] = chunk
        mask[s, : len(chunk)] = 1.0
    return idx, mask


def train_resident(
    config: TrainConfig,
    experiment_dir: str,
    device: Optional[jax.Device] = None,
    log_fn=print,
) -> Dict[str, float]:
    """Full device-resident training run; returns final metrics.

    Also reports measured per-epoch step time / examples-per-second
    (the whole epoch is one executable, so the wall time IS the train
    time; the returned loss fetch data-depends on every step).
    """
    from deepvariant_tpu.training.data import DatasetConfig

    device = device or jax.devices()[0]
    train_cfg = DatasetConfig.read(config.train_dataset_config)
    tune_cfg = DatasetConfig.read(config.tune_dataset_config)

    from deepvariant_tpu.io.examples import read_example_info

    first = train_cfg.tfrecord_path.split(",")[0]
    example_info = read_example_info(first)
    input_shape = example_info["shape"]

    host_train = load_dataset_arrays(train_cfg.tfrecord_path, config)
    host_tune = load_dataset_arrays(tune_cfg.tfrecord_path, config)
    # Tune rows carry weight 1 regardless of class weighting: class
    # weights shape the LOSS, not the tune confusion counts.
    host_tune["sample_weights"] = np.ones_like(
        host_tune["sample_weights"]
    )
    n_train = len(host_train["labels"])
    n_tune = len(host_tune["labels"])
    batch = min(config.batch_size, n_train)
    steps_per_epoch = n_train // batch

    dtype = jnp.bfloat16 if config.use_mixed_precision else jnp.float32
    model, variables = create_model(
        input_shape[2], height=input_shape[0], width=input_shape[1],
        dtype=dtype, bn_momentum=config.bn_momentum,
    )
    tx, _ = train_lib.make_optimizer(config, steps_per_epoch)
    state = train_lib.init_state(model, variables, tx)
    if config.init_checkpoint:
        state = train_lib.load_checkpoint(config.init_checkpoint, state)

    with jax.default_device(device):
        data = {k: jax.device_put(v, device)
                for k, v in host_train.items()}
        tune_data = {k: jax.device_put(v, device)
                     for k, v in host_tune.items()}
        state = jax.device_put(state, device)
    log_fn(
        f"resident dataset on {device}: train {n_train} x "
        f"{tuple(input_shape)} ({host_train['images'].nbytes / 1e6:.0f}"
        f" MB), tune {n_tune}; batch {batch}, "
        f"{steps_per_epoch} steps/epoch"
    )

    epoch_fn, tune_fn = _epoch_fns(model, tx, config)
    tune_idx, tune_mask = _tune_index_plan(n_tune, batch)
    tune_idx = jax.device_put(tune_idx, device)
    tune_mask = jax.device_put(tune_mask, device)

    # On-device snapshot of the tune-best inference state.
    def snapshot(state):
        return {
            "params": state["params"],
            "batch_stats": state["batch_stats"],
            "ema_params": state["ema_params"],
            "step": state["step"],
        }

    copy_best = jax.jit(
        lambda s: jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), snapshot(s)
        )
    )

    rng = np.random.default_rng(config.seed)
    best_metric = -float("inf")
    best_state_dev = None
    best_epoch = -1
    patience = 0
    results: Dict[str, float] = {}
    ckpt_dir = os.path.join(experiment_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    history = []

    for epoch in range(config.num_epochs):
        perm = rng.permutation(n_train)[: steps_per_epoch * batch]
        perm = perm.reshape(steps_per_epoch, batch).astype(np.int32)
        t0 = time.time()
        # Retry the first-epoch compile: the tunneled remote compiler
        # intermittently dies with HTTP 500 / tpu_compile_helper exit 1
        # (observed repeatedly in round 4); the failure does not cache,
        # so a re-invocation recompiles.
        for attempt in range(3):
            try:
                state, loss, cm_all, cm_snp, cm_indel = epoch_fn(
                    state, data, jax.device_put(perm, device)
                )
                break
            except Exception as e:
                if epoch > 0 or attempt == 2 or \
                        "500" not in str(e):
                    raise
                log_fn(f"epoch-compile retry {attempt + 1}: "
                       f"{str(e)[:120]}")
                time.sleep(10.0)
        # Scalar fetch: data-depends on every scanned step, so this IS
        # the epoch barrier (block_until_ready is a no-op on the
        # tunneled backend).
        loss_val = float(jax.device_get(loss))
        dt = time.time() - t0
        train_metrics = metrics_lib.metrics_from_confusion(
            np.asarray(jax.device_get(cm_all)), prefix="train/"
        )
        train_metrics["train/loss"] = loss_val
        train_metrics["train/examples_per_sec"] = (
            steps_per_epoch * batch / max(dt, 1e-9)
        )
        train_metrics["train/epoch_seconds"] = dt

        tune_loss, tune_cm = tune_fn(state, tune_data, tune_idx,
                                     tune_mask)
        tune_metrics = metrics_lib.metrics_from_confusion(
            np.asarray(jax.device_get(tune_cm)), prefix="tune/"
        )
        tune_metrics["tune/loss"] = float(jax.device_get(tune_loss))
        results = {**train_metrics, **tune_metrics}
        history.append({"epoch": epoch, **{
            k: round(float(v), 5) for k, v in results.items()
        }})
        log_fn(f"epoch {epoch}: " + json.dumps(
            {k: round(float(v), 5) for k, v in results.items()}
        ))

        metric_val = results.get(config.best_checkpoint_metric, 0.0)
        if metric_val > best_metric:
            best_metric = metric_val
            best_epoch = epoch
            best_state_dev = copy_best(state)
            patience = 0
        else:
            patience += 1
            if patience >= config.early_stopping_patience:
                log_fn(f"early stopping at epoch {epoch}")
                break

    # Single host fetch at the end: final + tune-best inference states.
    final_snap = jax.device_get(snapshot(state))
    final_path = os.path.join(ckpt_dir, "final.msgpack")
    _save_inference_state(final_path, final_snap, example_info)
    if best_state_dev is not None:
        best_snap = jax.device_get(best_state_dev)
        _save_inference_state(
            os.path.join(ckpt_dir, "best.msgpack"), best_snap,
            example_info,
        )
    with open(os.path.join(experiment_dir, "history.json"), "w") as f:
        json.dump(history, f)
    results["best_epoch"] = best_epoch
    results["best_metric"] = best_metric
    return results


def _save_inference_state(path: str, snap: Dict, example_info: dict):
    """Persist an inference checkpoint compatible with
    scripts/call_variants.load_variables_for_examples (params +
    batch_stats [+ ema]), plus the example_info.json contract."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(snap))
    info_path = os.path.join(os.path.dirname(path), "example_info.json")
    with open(info_path, "w") as f:
        json.dump(example_info, f)

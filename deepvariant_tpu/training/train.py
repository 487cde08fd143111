"""TPU-native training loop for the InceptionV3 genotype classifier.

Re-designs the reference's TF2 custom loop (train.py:98-773) with JAX:

  * `tf.distribute.TPUStrategy` + `strategy.run` -> one jitted SPMD
    train step over a `jax.sharding.Mesh` data axis; XLA inserts the
    gradient all-reduce over ICI.
  * keras SGD(nesterov, momentum, use_ema) -> optax chain + explicit
    EMA tree (`ema_momentum` 0.99, dv_config.py:75).
  * ExponentialDecay(staircase) + LinearWarmup (train.py:231-260) ->
    optax.join_schedules.
  * CategoricalCrossentropy(label_smoothing) with per-example sample
    weights + L2 regularization over conv/dense kernels
    (keras_modeling.add_l2_regularizers) -> explicit loss fn.
  * Checkpoints: flax msgpack state (params/batch_stats/opt/ema/step)
    + example_info.json sidecar (the model's data contract,
    train.py:139-185); best-ckpt selection on `tune/f1_weighted`
    with early stopping (dv_config.py:66,79).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import time
from functools import partial
from typing import Any, Dict, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization
from flax import traverse_util

from deepvariant_tpu.models.inception_v3 import (
    InceptionV3,
    create_model,
    normalize_pileup,
)
from deepvariant_tpu.training import metrics as metrics_lib
from deepvariant_tpu.training.config import TrainConfig
from deepvariant_tpu.training.data import Batch, DatasetConfig, input_fn

NUM_CLASSES = 3


# ---------------------------------------------------------------------------
# Train state
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray  # scalar int32

    def tree(self):
        return dataclasses.asdict(self)


def make_lr_schedule(config: TrainConfig, steps_per_epoch: int):
    """LinearWarmup into staircase ExponentialDecay (train.py:231-260)."""
    decay_steps = max(
        int(steps_per_epoch * config.learning_rate_num_epochs_per_decay), 1
    )

    def exp_decay(step):
        return config.learning_rate * jnp.power(
            config.learning_rate_decay_rate, step // decay_steps
        )

    if config.warmup_steps <= 0:
        return exp_decay
    warmup = optax.linear_schedule(
        init_value=config.learning_rate / 10,
        end_value=config.learning_rate,
        transition_steps=config.warmup_steps,
    )
    return optax.join_schedules(
        [warmup, exp_decay], boundaries=[config.warmup_steps]
    )


def make_optimizer(config: TrainConfig, steps_per_epoch: int):
    schedule = make_lr_schedule(config, steps_per_epoch)
    if config.optimizer == "sgd":
        tx = optax.sgd(schedule, momentum=config.momentum, nesterov=True)
    elif config.optimizer == "adam":
        tx = optax.adamw(
            schedule,
            b1=config.beta_1,
            b2=config.beta_2,
            eps=config.epsilon,
            weight_decay=config.optimizer_weight_decay,
        )
    elif config.optimizer == "rmsprop":
        tx = optax.rmsprop(
            schedule,
            decay=config.rho,
            momentum=config.momentum,
            eps=config.epsilon,
        )
    else:
        raise ValueError(f"Unknown optimizer: {config.optimizer}")
    return tx, schedule


def _l2_kernel_penalty(params, weight_decay: float):
    """Sum of L2 over every conv/dense kernel (keras add_l2_regularizers)."""
    if not weight_decay:
        return 0.0
    flat = traverse_util.flatten_dict(params)
    total = 0.0
    for path, value in flat.items():
        if path[-1] == "kernel":
            total = total + jnp.sum(jnp.square(value.astype(jnp.float32)))
    return weight_decay * total


def loss_fn(
    probabilities: jnp.ndarray,
    labels: jnp.ndarray,
    sample_weights: jnp.ndarray,
    label_smoothing: float,
) -> jnp.ndarray:
    """Weighted categorical cross-entropy over softmax outputs."""
    onehot = jax.nn.one_hot(labels, NUM_CLASSES, dtype=jnp.float32)
    if label_smoothing:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / \
            NUM_CLASSES
    logp = jnp.log(jnp.clip(probabilities, 1e-7, 1.0))
    per_example = -jnp.sum(onehot * logp, axis=-1) * sample_weights
    # compute_average_loss semantics: sum / global weight sum.
    return jnp.sum(per_example) / jnp.maximum(jnp.sum(sample_weights), 1e-6)


# ---------------------------------------------------------------------------
# Steps
# ---------------------------------------------------------------------------

def make_train_step(model: InceptionV3, tx, config: TrainConfig):
    """Returns the jittable train step (donated state, sharded batch).

    With config.gradient_accumulation_steps > 1 the incoming batch is
    split into that many sequential micro-batches inside ONE lax.scan;
    gradients average across micro-steps and the optimizer applies a
    single update — the reference's 16384 global batch
    (dv_config.py:57) on one chip without 16384 examples' activations
    ever being live. Batch-norm statistics thread through the scan
    (each micro-batch updates the running stats, like 16 consecutive
    reference replica steps)."""
    accum = max(int(getattr(
        config, "gradient_accumulation_steps", 1) or 1), 1)

    def micro_grad(params, batch_stats, micro_batch, dropout_rng):
        def compute(params):
            x = normalize_pileup(micro_batch["images"])
            (probs, mutated) = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            loss = loss_fn(
                probs,
                micro_batch["labels"],
                micro_batch["sample_weights"],
                config.label_smoothing,
            ) + _l2_kernel_penalty(params, config.weight_decay)
            return loss, (probs, mutated["batch_stats"])

        return jax.value_and_grad(compute, has_aux=True)(params)

    def train_step(state: Dict, batch: Dict):
        dropout_rng = jax.random.fold_in(
            jax.random.PRNGKey(config.seed), state["step"]
        )

        if accum == 1:
            (loss, (probs, new_batch_stats)), grads = micro_grad(
                state["params"], state["batch_stats"], batch,
                dropout_rng,
            )
        else:
            micros = jax.tree_util.tree_map(
                lambda x: x.reshape((accum, x.shape[0] // accum)
                                    + x.shape[1:]),
                batch,
            )

            def body(carry, inputs):
                bs, grad_sum, loss_sum = carry
                mb, i = inputs
                (l, (p, new_bs)), g = micro_grad(
                    state["params"], bs, mb,
                    jax.random.fold_in(dropout_rng, i),
                )
                grad_sum = jax.tree_util.tree_map(
                    jnp.add, grad_sum, g
                )
                return (new_bs, grad_sum, loss_sum + l), p

            zero_grads = jax.tree_util.tree_map(
                lambda x: jnp.zeros_like(x, dtype=jnp.float32),
                state["params"],
            )
            (new_batch_stats, grad_sum, loss_sum), probs_stack = \
                jax.lax.scan(
                    body,
                    (state["batch_stats"], zero_grads,
                     jnp.float32(0.0)),
                    (micros, jnp.arange(accum)),
                )
            inv = jnp.float32(1.0 / accum)
            grads = jax.tree_util.tree_map(
                lambda g: (g * inv).astype(g.dtype), grad_sum
            )
            loss = loss_sum * inv
            probs = probs_stack.reshape(
                (-1,) + probs_stack.shape[2:]
            )
        updates, new_opt_state = tx.update(
            grads, state["opt_state"], state["params"]
        )
        new_params = optax.apply_updates(state["params"], updates)
        decay = config.ema_momentum
        new_ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            state["ema_params"],
            new_params,
        ) if config.use_ema else new_params
        preds = jnp.argmax(probs, axis=-1)
        new_state = {
            "params": new_params,
            "batch_stats": new_batch_stats,
            "opt_state": new_opt_state,
            "ema_params": new_ema,
            "step": state["step"] + 1,
        }
        cm_updates = {
            "all": metrics_lib.confusion_update(
                jnp.zeros((3, 3), jnp.float32), batch["labels"], preds
            ),
            "snp": metrics_lib.confusion_update(
                jnp.zeros((3, 3), jnp.float32), batch["labels"], preds,
                batch["variant_types"] == metrics_lib.VARIANT_TYPE_SNP,
            ),
            "indel": metrics_lib.confusion_update(
                jnp.zeros((3, 3), jnp.float32), batch["labels"], preds,
                batch["variant_types"] == metrics_lib.VARIANT_TYPE_INDEL,
            ),
        }
        return new_state, loss, cm_updates

    return train_step


def make_eval_step(model: InceptionV3, config: TrainConfig):
    def eval_step(state: Dict, batch: Dict):
        params = state["ema_params"] if config.use_ema else state["params"]
        x = normalize_pileup(batch["images"])
        probs = model.apply(
            {"params": params, "batch_stats": state["batch_stats"]},
            x,
            train=False,
        )
        loss = loss_fn(
            probs,
            batch["labels"],
            batch["sample_weights"],
            config.label_smoothing,
        )
        preds = jnp.argmax(probs, axis=-1)
        cm = metrics_lib.confusion_update(
            jnp.zeros((3, 3), jnp.float32), batch["labels"], preds,
            mask=batch["sample_weights"] > 0,
        )
        return loss, cm

    return eval_step


# ---------------------------------------------------------------------------
# Sharding / jit
# ---------------------------------------------------------------------------

def data_parallel_mesh(devices: Optional[Sequence[jax.Device]] = None):
    devices = list(devices or jax.devices())
    return jax.sharding.Mesh(np.array(devices), ("data",))


def shard_train_step(train_step, mesh: jax.sharding.Mesh):
    """jit the step with batch sharded over `data`, state replicated."""
    replicated = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()
    )
    data_sharded = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")
    )
    batch_shardings = {
        "images": data_sharded,
        "labels": data_sharded,
        "sample_weights": data_sharded,
        "variant_types": data_sharded,
    }
    return jax.jit(
        train_step,
        in_shardings=(replicated, batch_shardings),
        out_shardings=(replicated, replicated, replicated),
        donate_argnums=(0,),
    ), data_sharded, replicated


# ---------------------------------------------------------------------------
# Checkpointing
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state: Dict, example_info: Optional[dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_state))
    if example_info is not None:
        with open(os.path.join(os.path.dirname(path),
                               "example_info.json"), "w") as f:
            json.dump(example_info, f)


def load_checkpoint(path: str, template_state: Dict) -> Dict:
    with open(path, "rb") as f:
        return serialization.from_bytes(template_state, f.read())


def init_state(
    model: InceptionV3, variables: Dict, tx
) -> Dict:
    params = variables["params"]
    return {
        "params": params,
        "batch_stats": variables["batch_stats"],
        "opt_state": tx.init(params),
        # Materialize a copy: aliasing params here would donate the same
        # buffer twice under donate_argnums.
        "ema_params": jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params
        ),
        "step": jnp.zeros((), jnp.int32),
    }


# ---------------------------------------------------------------------------
# Main loop
# ---------------------------------------------------------------------------

def train(
    config: TrainConfig,
    experiment_dir: str,
    devices: Optional[Sequence[jax.Device]] = None,
    max_steps: Optional[int] = None,
    log_fn=print,
) -> Dict[str, float]:
    """Full training run; returns final tune metrics."""
    train_ds_cfg = DatasetConfig.read(config.train_dataset_config)
    tune_ds_cfg = DatasetConfig.read(config.tune_dataset_config)

    # example_info.json contract (train.py:139-185).
    from deepvariant_tpu.io.examples import read_example_info

    first_train_file = train_ds_cfg.tfrecord_path.split(",")[0]
    example_info = read_example_info(first_train_file)
    input_shape = example_info["shape"]

    steps_per_epoch = max(
        train_ds_cfg.num_examples // config.batch_size, 1
    )
    steps_per_tune = max(
        (min(config.num_validation_examples, tune_ds_cfg.num_examples)
         or tune_ds_cfg.num_examples) // config.batch_size, 1
    )
    if config.limit:
        steps_per_epoch = min(steps_per_epoch, config.limit)
        steps_per_tune = min(steps_per_tune, config.limit)

    dtype = jnp.bfloat16 if config.use_mixed_precision else jnp.float32
    model, variables = create_model(
        input_shape[2], height=input_shape[0], width=input_shape[1],
        dtype=dtype, bn_momentum=config.bn_momentum,
    )
    tx, schedule = make_optimizer(config, steps_per_epoch)
    state = init_state(model, variables, tx)
    if config.init_checkpoint:
        state = load_checkpoint(config.init_checkpoint, state)

    mesh = data_parallel_mesh(devices)
    step_fn, data_sharding, replicated = shard_train_step(
        make_train_step(model, tx, config), mesh
    )
    eval_fn = jax.jit(
        make_eval_step(model, config),
        in_shardings=(replicated, {
            "images": data_sharding, "labels": data_sharding,
            "sample_weights": data_sharding,
            "variant_types": data_sharding,
        }),
    )
    state = jax.device_put(state, replicated)

    ckpt_dir = os.path.join(experiment_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    train_iter = input_fn(train_ds_cfg.tfrecord_path, config, mode="train")
    best_metric = -float("inf")
    patience = 0
    total_steps = 0
    results: Dict[str, float] = {}

    for epoch in range(config.num_epochs):
        cm_all = np.zeros((3, 3))
        losses = []
        t0 = time.time()
        for _ in range(steps_per_epoch):
            batch = next(train_iter)
            state, loss, cms = step_fn(state, _batch_dict(batch))
            losses.append(loss)
            cm_all += np.asarray(cms["all"])
            total_steps += 1
            if max_steps and total_steps >= max_steps:
                break
        train_metrics = metrics_lib.metrics_from_confusion(
            cm_all, prefix="train/"
        )
        train_metrics["train/loss"] = float(np.mean(jax.device_get(losses)))
        dt = time.time() - t0
        train_metrics["train/examples_per_sec"] = (
            steps_per_epoch * config.batch_size / max(dt, 1e-9)
        )

        # Tune pass.
        tune_cm = np.zeros((3, 3))
        tune_losses = []
        for i, batch in enumerate(
            input_fn(tune_ds_cfg.tfrecord_path, config, mode="tune")
        ):
            if i >= steps_per_tune:
                break
            loss, cm = eval_fn(state, _batch_dict(batch))
            tune_losses.append(loss)
            tune_cm += np.asarray(cm)
        tune_metrics = metrics_lib.metrics_from_confusion(
            tune_cm, prefix="tune/"
        )
        if tune_losses:
            tune_metrics["tune/loss"] = float(
                np.mean(jax.device_get(tune_losses))
            )
        results = {**train_metrics, **tune_metrics}
        log_fn(f"epoch {epoch}: " + json.dumps(
            {k: round(v, 5) for k, v in results.items()}))

        save_checkpoint(
            os.path.join(ckpt_dir, f"ckpt-{epoch}.msgpack"),
            state, example_info,
        )
        # Keep only the latest epoch checkpoint plus best.msgpack
        # (the reference's CheckpointManager max_to_keep analog);
        # a full InceptionV3 state is ~260 MB per epoch otherwise.
        prev = os.path.join(ckpt_dir, f"ckpt-{epoch - 1}.msgpack")
        if epoch > 0 and os.path.exists(prev):
            os.unlink(prev)
        metric_val = results.get(config.best_checkpoint_metric, 0.0)
        if metric_val > best_metric:
            best_metric = metric_val
            patience = 0
            shutil.copyfile(
                os.path.join(ckpt_dir, f"ckpt-{epoch}.msgpack"),
                os.path.join(ckpt_dir, "best.msgpack"),
            )
        else:
            patience += 1
            if patience >= config.early_stopping_patience:
                log_fn(f"early stopping at epoch {epoch}")
                break
        if max_steps and total_steps >= max_steps:
            break
    return results


def _batch_dict(batch: Batch) -> Dict[str, np.ndarray]:
    return {
        "images": batch.images,
        "labels": batch.labels,
        "sample_weights": batch.sample_weights,
        "variant_types": batch.variant_types,
    }

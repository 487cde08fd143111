"""Fused device pileup-encode + CNN inference over candidate plans.

This is the TPU half of the device-encode streaming pipeline: workers
ship compact PlannedExample payloads (pre-gathered pileup row tensors,
~2-4x smaller than painted images), and ONE jitted program paints every
channel plane AND runs the InceptionV3 forward without the image ever
leaving HBM. Replaces the reference's shared-memory image stream into
the NN (stream_examples_kernel.cc, fast_pipeline.cc:248) with an
architecture the reference cannot express: the pileup encoder itself
runs on the accelerator (pileup_jax.make_longread_encode_fn, bit-exact
vs the host painter on every supported channel set).
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import jax

from deepvariant_tpu.make_examples.pileup import PileupOptions
from deepvariant_tpu.make_examples.pileup_jax import (
    make_longread_encode_fn,
)
from deepvariant_tpu.models.inception_v3 import (
    InceptionV3,
    normalize_pileup,
)

# Per-plan tensor keys in make_longread_encode_fn argument order.
PLAN_KEYS = (
    "bases", "quals", "mapq", "rev", "hp", "tlen", "supp", "support",
    "af", "row_valid", "ref_window",
)
ALT_KEYS = ("alt_bases", "alt_row_valid", "alt_ref", "alt_present")


def compact_plan(plan: dict, diff_mode: bool) -> dict:
    """Strip the alt planes when the preset doesn't use them — no point
    shipping (2, R, W) zeros through the worker queue."""
    if diff_mode:
        return plan
    return {k: v for k, v in plan.items() if k not in ALT_KEYS}


class PlanPredictor:
    """Jitted, device-sharded fused encode+call over plan payloads.

    The analog of calling.call_variants.Predictor with the pileup
    painting moved onto the device: `plans -> (B, 3) probabilities` is
    one XLA program (encode planes, normalize, CNN forward)."""

    def __init__(
        self,
        variables,
        pileup_options: PileupOptions,
        batch_size: int = 512,
        model: Optional[InceptionV3] = None,
        devices: Optional[Sequence[jax.Device]] = None,
        fold_bn: bool = False,
    ):
        o = pileup_options
        self.options = o
        self.diff_mode = o.alt_aligned_pileup == "diff_channels"
        self.model = model or InceptionV3()
        self.variables = variables
        if fold_bn and not getattr(self.model, "fold_bn", False) and \
                "batch_stats" in variables:
            from deepvariant_tpu.models.inception_v3 import (
                fold_batch_norm,
            )

            self.model, self.variables = fold_batch_norm(
                self.model, variables
            )
        devices = list(devices or jax.devices())
        self.mesh = jax.sharding.Mesh(np.array(devices), ("data",))
        self.batch_size = batch_size - batch_size % len(devices) or len(
            devices
        )
        self.data_sharding = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec("data")
        )
        replicated = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec()
        )
        self.variables = jax.device_put(self.variables, replicated)
        encode_fn = make_longread_encode_fn(o)  # inlines under jit

        def fused(variables, *plan_tensors):
            images = encode_fn(*plan_tensors)
            x = normalize_pileup(images)
            return self.model.apply(variables, x, train=False)

        n_args = len(PLAN_KEYS) + len(ALT_KEYS)
        self._fused = jax.jit(
            fused,
            in_shardings=(replicated,) + (self.data_sharding,) * n_args,
            out_shardings=self.data_sharding,
        )
        # Template zero plan for batch padding / stripped alt keys.
        rows = o.height - o.reference_band_height
        self._zero_plan = {
            "bases": np.zeros((rows, o.width), np.uint8),
            "quals": np.zeros((rows, o.width), np.uint8),
            "mapq": np.zeros(rows, np.uint8),
            "rev": np.zeros(rows, bool),
            "hp": np.zeros(rows, np.int8),
            "tlen": np.zeros(rows, np.int32),
            "supp": np.zeros(rows, bool),
            "support": np.zeros(rows, np.int8),
            "af": np.zeros(rows, np.uint8),
            "row_valid": np.zeros(rows, bool),
            "ref_window": np.zeros(o.width, np.uint8),
            "alt_bases": np.zeros((2, rows, o.width), np.uint8),
            "alt_row_valid": np.zeros((2, rows), bool),
            "alt_ref": np.zeros((2, o.width), np.uint8),
            "alt_present": np.zeros(2, bool),
        }

    def _stack(self, plans: List[dict]):
        """Stack B plan dicts (padding to batch_size) into the fused
        program's argument tuple."""
        pad = self.batch_size - len(plans)
        padded = list(plans) + [self._zero_plan] * pad
        args = []
        for key in PLAN_KEYS + ALT_KEYS:
            args.append(np.stack([
                p.get(key, self._zero_plan[key]) for p in padded
            ]))
        return tuple(args)

    def __call__(self, plans: List[dict]) -> np.ndarray:
        """plans (<= batch_size dicts) -> (len(plans), 3) float probs."""
        out = self._fused(self.variables, *self._stack(plans))
        return np.asarray(out)[: len(plans)]

    def predict_plan_stream(
        self,
        payloads: Iterable,
        prefetch: int = 2,
    ) -> Iterator[Tuple[object, np.ndarray]]:
        """Yield (payload, probs[3]); payloads carry `.plan` dicts
        (PlannedExample or anything with a plan attribute). Up to
        `prefetch` device batches stay in flight so H2D transfer and
        host stacking overlap MXU compute."""
        inflight: collections.deque = collections.deque()

        def batches():
            buf = []
            for p in payloads:
                buf.append(p)
                if len(buf) == self.batch_size:
                    yield buf
                    buf = []
            if buf:
                yield buf

        def submit(batch):
            args = self._stack([p.plan for p in batch])
            return batch, self._fused(self.variables, *args)

        gen = batches()
        try:
            for _ in range(prefetch):
                inflight.append(submit(next(gen)))
        except StopIteration:
            pass
        while inflight:
            batch, probs_dev = inflight.popleft()
            try:
                inflight.append(submit(next(gen)))
            except StopIteration:
                pass
            probs = np.asarray(probs_dev)[: len(batch)]
            for payload, p in zip(batch, probs):
                yield payload, p

"""Stage 2: call_variants — batched CNN genotype inference on TPU.

Re-designs the reference driver (call_variants.py:766-1053) TPU-first:

  * The reference streams tf.Examples through `tf.distribute.
    MirroredStrategy` with a tf.function predict step. Here a single
    jitted forward over a `jax.sharding.NamedSharding` data axis serves
    1 chip or a full pod slice — XLA inserts the collectives.
  * Static shapes: batches are padded to `batch_size` with a validity
    mask, so every step hits the same compiled executable.
  * Host→device overlap: JAX dispatch is async; we keep up to
    `prefetch` batches in flight and drain results in order, which
    double-buffers H2D DMA against MXU compute (replaces the
    reference's shm stream + writer process pool,
    call_variants.py:934-1053).
  * Probabilities are rounded like the reference's `round_gls`
    (call_variants.py:248-263) before CVO write.
"""

from __future__ import annotations

import collections
import dataclasses
import json
import os
import time
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from deepvariant_tpu.core.sharded_files import glob_sharded_inputs
from deepvariant_tpu.core.types import CallVariantsOutput, Variant
from deepvariant_tpu.io import examples as example_codec
from deepvariant_tpu.io.tfrecord import TFRecordReader, TFRecordWriter
from deepvariant_tpu.models.inception_v3 import (
    InceptionV3,
    create_model,
    normalize_pileup,
)

from deepvariant_tpu.core.genomics_math import round_gls


@dataclasses.dataclass
class ExampleRecord:
    """One parsed pileup example awaiting classification."""

    image: np.ndarray  # (H, W, C) uint8
    variant: Variant
    alt_allele_indices: List[int]
    label: Optional[int] = None  # training examples only


def iter_examples(paths: Sequence[str]) -> Iterator[ExampleRecord]:
    for path in paths:
        with TFRecordReader(path) as reader:
            for buf in reader:
                ex = example_codec.parse_example(buf)
                yield ExampleRecord(
                    image=ex.image,
                    variant=ex.variant,
                    alt_allele_indices=ex.alt_allele_indices,
                    label=ex.label,
                )


def check_example_info(
    examples_path: str, expected_shape: Sequence[int],
    expected_channels: Optional[Sequence[int]] = None,
) -> None:
    """Shape/channel contract check (call_variants.py:648-746 parity)."""
    info_path = example_codec.example_info_path(examples_path) \
        if hasattr(example_codec, "example_info_path") else None
    if info_path is None:
        for cand in (examples_path + ".example_info.json",):
            if os.path.exists(cand):
                info_path = cand
    if not info_path or not os.path.exists(info_path):
        return
    with open(info_path) as f:
        info = json.load(f)
    if list(info.get("shape", [])) != list(expected_shape):
        raise ValueError(
            f"example_info shape {info.get('shape')} != model input "
            f"shape {list(expected_shape)}"
        )
    if expected_channels is not None and "channels" in info:
        if list(info["channels"]) != list(expected_channels):
            raise ValueError("channel enum mismatch vs example_info.json")


class Predictor:
    """Jitted, device-sharded InceptionV3 forward over uint8 pileups."""

    def __init__(
        self,
        variables,
        batch_size: int = 512,
        model: Optional[InceptionV3] = None,
        devices: Optional[Sequence[jax.Device]] = None,
        ablation_channels: Optional[Sequence[int]] = None,
        fold_bn: bool = False,
        pad_stem_to: Optional[int] = None,
    ):
        self.model = model or InceptionV3()
        self.variables = variables
        if fold_bn and not getattr(self.model, "fold_bn", False) and \
                "batch_stats" in variables:
            # Export-time BN folding (keras_modeling.py:246's BN layers
            # vanish from the inference graph): conv+bias+relu stays
            # bfloat16 end to end. Exact to float32 rounding.
            # Round-5 interleaved A/B trials (deploy/infer_study_r05
            # .json, 6 rounds, same-session compiles): folded
            # 46.1k +/- 0.06k vs unfolded 45.7k +/- 1.7k ex/s at batch
            # 1024 — folded is slightly faster AND 30x more stable;
            # the earlier "folding is slower" readings (r3/r4) were
            # unfolded-side tunnel noise, not a real effect.
            from deepvariant_tpu.models.inception_v3 import (
                fold_batch_norm,
            )

            self.model, self.variables = fold_batch_norm(
                self.model, variables
            )
            variables = self.variables
        self.pad_stem_to = None
        if pad_stem_to:
            # MXU tile packing: zero-pad the stem kernel's input-
            # channel dim (exact — models/inception_v3.py
            # pad_stem_input_channels) and pad the images to match on
            # DEVICE inside the jitted forward. Measured +1.2% at
            # batch 1024 (infer_study_r05 phase=stem, folded_pad8).
            from deepvariant_tpu.models.inception_v3 import (
                pad_stem_input_channels,
            )

            kernel = variables["params"]["stem1"]["conv"]["kernel"]
            if kernel.shape[2] < pad_stem_to:
                self.variables = pad_stem_input_channels(
                    variables, pad_stem_to
                )
                variables = self.variables
                self.pad_stem_to = pad_stem_to
        devices = list(devices or jax.devices())
        # Data-parallel mesh: batch sharded over every device
        # (replaces MirroredStrategy, call_variants.py:782).
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
        self.variables = jax.device_put(variables, replicated)
        keep = None
        if ablation_channels:
            keep = np.array(ablation_channels, np.int32)

        pad_to = self.pad_stem_to

        def forward(variables, images_u8):
            x = normalize_pileup(images_u8)
            if keep is not None:
                x = x[..., keep]
            if pad_to and x.shape[-1] < pad_to:
                x = jnp.pad(
                    x, ((0, 0),) * 3 + ((0, pad_to - x.shape[-1]),)
                )
            return self.model.apply(variables, x, train=False)

        self._forward = jax.jit(
            forward,
            in_shardings=(replicated, self.data_sharding),
            out_shardings=self.data_sharding,
        )

    def __call__(self, images_u8: np.ndarray) -> np.ndarray:
        """(B,H,W,C) uint8 -> (B,3) float32 probabilities (async)."""
        return self._forward(self.variables, images_u8)

    def predict_stream(
        self,
        records: Iterable[ExampleRecord],
        prefetch: int = 2,
    ) -> Iterator[Tuple[ExampleRecord, np.ndarray]]:
        """Yield (record, probs[3]) with up to `prefetch` batches in flight."""
        inflight: collections.deque = collections.deque()

        def batches():
            buf: List[ExampleRecord] = []
            for rec in records:
                buf.append(rec)
                if len(buf) == self.batch_size:
                    yield buf
                    buf = []
            if buf:
                yield buf

        def submit(batch):
            n = len(batch)
            images = np.stack([r.image for r in batch])
            if n < self.batch_size:
                pad = np.zeros(
                    (self.batch_size - n,) + images.shape[1:], images.dtype
                )
                images = np.concatenate([images, pad])
            return batch, self._forward(self.variables, images)

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
            for rec, p in zip(batch, probs):
                yield rec, p


def call_variants(
    examples_path: str,
    output_path: str,
    variables,
    batch_size: int = 512,
    model: Optional[InceptionV3] = None,
    ablation_channels: Optional[Sequence[int]] = None,
    writer_cls=TFRecordWriter,
    log_every: int = 100,
    num_writers: int = 1,
    include_debug_info: bool = False,
    limit: int = 0,
    max_batches: int = 0,
    fast_graph: bool = False,
) -> dict:
    """Run inference over sharded example TFRecords, write CVO TFRecord.

    num_writers > 1 drains predictions through a round-robin pool of
    writer processes, each owning one `-KKKKK-of-NNNNN` output shard
    (reference writer-process pool, call_variants.py:934-1053; see
    calling/cvo_writer.py). Downstream readers take the base path and
    glob the family.

    Returns {"num_examples": N, "examples_per_sec": r,
             "output_paths": [...]}.
    """
    paths = glob_sharded_inputs(examples_path)
    # fast_graph: the round-5 measured winner (folded BN + stem pad8,
    # deploy/infer_study_r05.json) — +1.2% throughput and ~30x lower
    # run-to-run variance; numerics exact to f32 rounding, so it is
    # opt-in where byte-stable output across graph versions matters.
    predictor = Predictor(
        variables,
        batch_size=batch_size,
        model=model,
        ablation_channels=ablation_channels,
        fold_bn=fast_graph,
        pad_stem_to=8 if fast_graph else None,
    )
    n = 0
    start = time.time()
    # --limit / --max_batches (reference call_variants.py:199,124):
    # hard caps on examples processed.
    cap = limit if limit > 0 else 0
    if max_batches > 0:
        batch_cap = max_batches * predictor.batch_size
        cap = min(cap, batch_cap) if cap else batch_cap

    def capped(records):
        for i, item in enumerate(records):
            if cap and i >= cap:
                break
            yield item

    def make_debug_info(rec, gls):
        """DebugInfo under --include_debug_info (reference
        call_variants.py:373-388 via variant_utils)."""
        import numpy as _np

        from deepvariant_tpu.core.types import CvoDebugInfo

        v = rec.variant
        ref_len = len(v.reference_bases)
        alts = v.alternate_bases
        return CvoDebugInfo(
            predicted_label=int(_np.argmax(gls)),
            has_insertion=any(len(a) > ref_len for a in alts),
            has_deletion=any(len(a) < ref_len for a in alts),
            is_snp=ref_len == 1 and all(len(a) == 1 for a in alts),
            true_label=int(rec.label) if rec.label is not None else 0,
        )
    if num_writers > 1:
        from deepvariant_tpu.calling.cvo_writer import CvoWriterPool

        pool = CvoWriterPool(output_path, num_writers)
        out_paths = pool.paths
        buf = []
        for rec, probs in predictor.predict_stream(
                capped(iter_examples(paths))):
            buf.append(
                (rec.variant, rec.alt_allele_indices,
                 [float(p) for p in probs])
            )
            n += 1
            if len(buf) >= predictor.batch_size:
                pool.put_batch(buf)
                buf = []
        if buf:
            pool.put_batch(buf)
        written = pool.close()
        if written != n:
            raise RuntimeError(
                f"writer pool wrote {written} CVOs, expected {n}"
            )
    else:
        out_paths = [output_path]
        with writer_cls(output_path) as writer:
            for rec, probs in predictor.predict_stream(
                    capped(iter_examples(paths))):
                gls = round_gls([float(p) for p in probs])
                cvo = CallVariantsOutput(
                    variant=rec.variant,
                    alt_allele_indices=rec.alt_allele_indices,
                    genotype_probabilities=gls,
                    debug_info=(
                        make_debug_info(rec, gls)
                        if include_debug_info else None
                    ),
                )
                writer.write(cvo.encode())
                n += 1
    dt = max(time.time() - start, 1e-9)
    return {"num_examples": n, "examples_per_sec": n / dt,
            "output_paths": out_paths}


def read_cvos(path: str) -> Iterator[CallVariantsOutput]:
    for p in glob_sharded_inputs(path):
        with TFRecordReader(p) as reader:
            for buf in reader:
                yield CallVariantsOutput.decode(buf)

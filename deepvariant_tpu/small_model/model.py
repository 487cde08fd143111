"""Small-model MLP classifier + variant-calling gate.

Reference parity: keras Sequential MLP with hidden layers (750, 750),
relu, 3-way softmax (small_model/keras_config.py:133-147,
small_model_config.py:83-99) re-implemented in flax; the inference gate
(`SmallModelVariantCaller`, small_model/inference.py:75-200) accepts a
candidate when the phred-scaled max class probability clears the
per-type GQ threshold, writing a CVO directly and skipping the CNN.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from deepvariant_tpu.core import genomics_math
from deepvariant_tpu.core.types import CallVariantsOutput, Variant
from deepvariant_tpu.make_examples.variant_caller import DeepVariantCall

NUM_CLASSES = 3
DEFAULT_HIDDEN = (750, 750)


class SmallModelMLP(nn.Module):
    hidden_layer_sizes: Tuple[int, ...] = DEFAULT_HIDDEN

    @nn.compact
    def __call__(self, x):
        for size in self.hidden_layer_sizes:
            x = nn.relu(nn.Dense(size)(x))
        return jax.nn.softmax(nn.Dense(NUM_CLASSES)(x), axis=-1)


def create_small_model(
    num_features: int,
    hidden_layer_sizes: Tuple[int, ...] = DEFAULT_HIDDEN,
    rng=None,
    seed: int = 0,
):
    """Numpy-initialized variables in flax's param-tree layout.

    Inference inside make_examples runs in pure numpy (the small model
    is a host-side filter; the reference's keras MLP also runs on CPU
    in the make_examples workers) — touching jax here would initialize
    accelerator backends in every stage-1 process.
    """
    np_rng = np.random.RandomState(seed)
    sizes = [num_features, *hidden_layer_sizes, NUM_CLASSES]
    params = {}
    for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        # lecun_normal (flax Dense default initializer).
        scale = np.sqrt(1.0 / fan_in)
        params[f"Dense_{i}"] = {
            "kernel": (np_rng.randn(fan_in, fan_out) * scale).astype(
                np.float32
            ),
            "bias": np.zeros(fan_out, np.float32),
        }
    model = SmallModelMLP(hidden_layer_sizes)
    return model, {"params": params}


def numpy_mlp_forward(variables, x: np.ndarray) -> np.ndarray:
    """Pure-numpy forward identical to SmallModelMLP.__call__."""
    params = variables["params"]
    h = x.astype(np.float32)
    n_layers = len(params)
    for i in range(n_layers):
        layer = params[f"Dense_{i}"]
        h = h @ np.asarray(layer["kernel"]) + np.asarray(layer["bias"])
        if i < n_layers - 1:
            h = np.maximum(h, 0.0)
    h = h - h.max(axis=-1, keepdims=True)
    e = np.exp(h)
    return e / e.sum(axis=-1, keepdims=True)


def passes_confidence_threshold(
    class_probabilities: Sequence[float], threshold: float
) -> bool:
    """small_model/inference.py:55-65."""
    return genomics_math.ptrue_to_bounded_phred(
        max(class_probabilities)
    ) >= threshold


def _is_snp(variant: Variant) -> bool:
    return (len(variant.reference_bases) == 1
            and bool(variant.alternate_bases)
            and all(len(a) == 1 for a in variant.alternate_bases))


@dataclasses.dataclass
class SmallModelCallResult:
    cvos: List[CallVariantsOutput]
    filtered_indices: List[int]  # candidate indices accepted (skip CNN)
    # (candidate_index, alt_allele_indices) per ACCEPTED row: partially
    # accepted multiallelic candidates go to the CNN with only their
    # remaining alt-index sets (make_examples_alt_allele_indices,
    # small_model/inference.py:186-193, make_examples_native.cc:194).
    accepted_sets: List[Tuple[int, Tuple[int, ...]]] = None


class SmallModelVariantCaller:
    """Accept/forward gate over small-model probabilities
    (small_model/inference.py:75)."""

    def __init__(
        self,
        model: SmallModelMLP,
        variables,
        snp_gq_threshold: float = 25.0,
        indel_gq_threshold: float = 30.0,
        batch_size: int = 4096,
        emit_all_candidates: bool = False,
    ):
        self.model = model
        self.variables = variables
        # Optional feature normalization from a trained bundle
        # (small_model.train writes mean/scale alongside params).
        self.feature_mean = None
        self.feature_scale = None
        self.snp_gq_threshold = snp_gq_threshold
        self.indel_gq_threshold = indel_gq_threshold
        self.batch_size = batch_size
        self.emit_all_candidates = emit_all_candidates

    def classify(self, examples: np.ndarray) -> np.ndarray:
        if self.feature_mean is not None:
            examples = (
                (examples - self.feature_mean) / self.feature_scale
            ).astype(np.float32)
        out = []
        for i in range(0, len(examples), self.batch_size):
            out.append(numpy_mlp_forward(
                self.variables, examples[i:i + self.batch_size]
            ))
        return np.concatenate(out) if out else np.zeros((0, NUM_CLASSES))

    def _accept(self, candidate: DeepVariantCall,
                probabilities: Sequence[float]) -> bool:
        threshold = (self.snp_gq_threshold
                     if _is_snp(candidate.variant)
                     else self.indel_gq_threshold)
        return passes_confidence_threshold(probabilities, threshold)

    def call_variants(
        self,
        candidates_with_alt_indices: Sequence[
            Tuple[int, DeepVariantCall, Tuple[int, ...]]
        ],
        examples: np.ndarray,
    ) -> SmallModelCallResult:
        """Classify feature rows; accepted candidates become CVOs.

        `candidates_with_alt_indices`: (candidate_index, candidate,
        alt_allele_indices) aligned with `examples` rows.
        """
        if len(examples) == 0:
            return SmallModelCallResult([], [], [])
        probs = self.classify(examples.astype(np.float32))
        cvos: List[CallVariantsOutput] = []
        accepted: List[int] = []
        accepted_sets: List[Tuple[int, Tuple[int, ...]]] = []
        for (cand_idx, candidate, alt_indices), p in zip(
            candidates_with_alt_indices, probs
        ):
            p = [float(x) for x in p]
            total = sum(p) or 1.0
            p = [x / total for x in p]
            accept = self._accept(candidate, p)
            if self.emit_all_candidates or accept:
                cvos.append(CallVariantsOutput(
                    variant=candidate.variant,
                    alt_allele_indices=list(alt_indices),
                    genotype_probabilities=genomics_math.round_gls(p),
                ))
            if accept and not self.emit_all_candidates:
                # emit_all_candidates (debug) keeps EVERY candidate on
                # the CNN path too (inference.py:185-193).
                accepted.append(cand_idx)
                accepted_sets.append((cand_idx, tuple(alt_indices)))
        return SmallModelCallResult(cvos, accepted, accepted_sets)

"""Streaming classification metrics (reference metrics.py parity).

Per-class F1 (f1_homref/f1_het/f1_homalt), micro/weighted F1,
precision/recall/accuracy, all split by variant type (snp/indel) —
accumulated as a 3x3 confusion matrix plus per-type matrices inside the
jitted step (device-side, no host sync per batch).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

NUM_CLASSES = 3
VARIANT_TYPE_SNP = 1
VARIANT_TYPE_INDEL = 2


def confusion_update(
    cm: jnp.ndarray,
    labels: jnp.ndarray,
    predictions: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Add one batch to a (3,3) confusion matrix [true, pred]."""
    weights = jnp.ones_like(labels, jnp.float32) if mask is None else \
        mask.astype(jnp.float32)
    onehot_true = jax.nn.one_hot(labels, NUM_CLASSES, dtype=jnp.float32)
    onehot_pred = jax.nn.one_hot(predictions, NUM_CLASSES,
                                 dtype=jnp.float32)
    return cm + jnp.einsum(
        "bi,bj,b->ij", onehot_true, onehot_pred, weights
    )


def empty_confusion() -> jnp.ndarray:
    return jnp.zeros((NUM_CLASSES, NUM_CLASSES), jnp.float32)


def metrics_from_confusion(cm: np.ndarray, prefix: str = "") -> Dict[str, float]:
    """Derive accuracy / per-class F1 / weighted F1 from a confusion matrix."""
    cm = np.asarray(cm, np.float64)
    total = cm.sum() or 1.0
    tp = np.diag(cm)
    support = cm.sum(axis=1)
    pred_pos = cm.sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(pred_pos > 0, tp / pred_pos, 0.0)
        recall = np.where(support > 0, tp / support, 0.0)
        f1 = np.where(
            precision + recall > 0,
            2 * precision * recall / (precision + recall),
            0.0,
        )
    weighted_f1 = float((f1 * support).sum() / (support.sum() or 1.0))
    out = {
        f"{prefix}categorical_accuracy": float(tp.sum() / total),
        f"{prefix}f1_homref": float(f1[0]),
        f"{prefix}f1_het": float(f1[1]),
        f"{prefix}f1_homalt": float(f1[2]),
        f"{prefix}f1_micro": float(tp.sum() / total),
        f"{prefix}f1_weighted": weighted_f1,
        f"{prefix}precision": float(
            (precision * support).sum() / (support.sum() or 1.0)
        ),
        f"{prefix}recall": float(
            (recall * support).sum() / (support.sum() or 1.0)
        ),
    }
    return out

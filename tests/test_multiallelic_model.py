"""Learned multiallelic resolver tests (postprocess_variants.py
get_multiallelic_distributions + the bundled trained MLP)."""

import numpy as np
import pytest

from deepvariant_tpu.core.types import CallVariantsOutput, Variant
from deepvariant_tpu.postprocess.multiallelic_model import (
    get_multiallelic_distributions,
    load_multiallelic_model,
)


def _cvo(alts, indices, probs):
    return CallVariantsOutput(
        variant=Variant(
            reference_name="chr1", start=10, end=11,
            reference_bases="A", alternate_bases=list(alts),
        ),
        alt_allele_indices=list(indices),
        genotype_probabilities=list(probs),
    )


class TestModel:
    def test_matches_reference_savedmodel_probe(self):
        # Golden vector captured from the reference SavedModel
        # (tf.saved_model serving_default on uniform input).
        model = load_multiallelic_model()
        out = model(np.full((1, 9), 1 / 3, np.float32))[0]
        np.testing.assert_allclose(
            out,
            [0.15395929, 0.1191617, 0.27542865, 0.30287728,
             0.11721767, 0.03135543],
            atol=1e-6,
        )

    def test_output_is_distribution(self):
        model = load_multiallelic_model()
        rng = np.random.RandomState(3)
        x = rng.dirichlet([1.0] * 3, size=60).reshape(20, 9)
        out = model(x)
        assert out.shape == (20, 6)
        np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-5)
        assert (out >= 0).all()


class TestDistributions:
    ALTS = ["T", "G"]

    def _three_cvos(self):
        return [
            _cvo(self.ALTS, [0], [0.7, 0.2, 0.1]),
            _cvo(self.ALTS, [1], [0.6, 0.3, 0.1]),
            _cvo(self.ALTS, [0, 1], [0.5, 0.25, 0.25]),
        ]

    def test_ordering(self):
        probs = get_multiallelic_distributions(self._three_cvos(), set())
        np.testing.assert_allclose(
            probs[0],
            [0.7, 0.2, 0.1, 0.6, 0.3, 0.1, 0.5, 0.25, 0.25],
        )

    def test_pruned_alleles_skipped(self):
        alts = ["T", "G", "C"]
        cvos = [
            _cvo(alts, [0], [0.7, 0.2, 0.1]),
            _cvo(alts, [1], [0.6, 0.3, 0.1]),
            _cvo(alts, [2], [0.9, 0.05, 0.05]),   # pruned
            _cvo(alts, [0, 1], [0.5, 0.25, 0.25]),
            _cvo(alts, [0, 2], [0.8, 0.1, 0.1]),  # pruned
            _cvo(alts, [1, 2], [0.8, 0.1, 0.1]),  # pruned
        ]
        probs = get_multiallelic_distributions(cvos, {"C"})
        np.testing.assert_allclose(
            probs[0],
            [0.7, 0.2, 0.1, 0.6, 0.3, 0.1, 0.5, 0.25, 0.25],
        )

    def test_missing_joint_cvo_returns_none(self):
        assert get_multiallelic_distributions(
            [_cvo(self.ALTS, [0], [1, 0, 0])], set()
        ) is None

    def test_merge_predictions_uses_model(self):
        from deepvariant_tpu.postprocess.merge import merge_predictions

        model = load_multiallelic_model()
        variant, probs = merge_predictions(
            self._three_cvos(), multiallelic_model=model
        )
        expected = model(np.array(
            [[0.7, 0.2, 0.1, 0.6, 0.3, 0.1, 0.5, 0.25, 0.25]],
            np.float32,
        ))[0]
        np.testing.assert_allclose(probs, expected, atol=1e-6)
        assert len(probs) == 6
        # Biallelic groups keep the normal path.
        v2, p2 = merge_predictions(
            [_cvo(["T"], [0], [0.1, 0.8, 0.1])],
            multiallelic_model=model,
        )
        np.testing.assert_allclose(p2, [0.1, 0.8, 0.1])

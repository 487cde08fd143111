"""Port of postprocess_variants_test.py's merge_predictions numeric
tables (:760-1285): min-mode genotype merging, product mode, the
learned multiallelic MLP (bundled weights match the reference's), the
qual-filter prune path, normalize_predictions, and the sanity-check
exception table. Every multi-CVO case runs over ALL input permutations
(order independence is part of the contract)."""

import itertools

import numpy as np
import pytest

from deepvariant_tpu.core.types import (
    CallVariantsOutput,
    Variant,
    VariantCall,
)
from deepvariant_tpu.postprocess import genotype as gt
from deepvariant_tpu.postprocess.merge import merge_predictions
from deepvariant_tpu.postprocess.multiallelic_model import (
    load_multiallelic_model,
)


def _variant(alts, ref="N"):
    # The reference helper leaves reference_bases unset
    # (postprocess_variants_test.py:148-158); "N" keeps the ref
    # distinct from every alt so overlap counting is unaffected.
    n = 1 + len(alts)
    return Variant(
        reference_name="chr1", start=10, end=10 + len(ref),
        reference_bases=ref, alternate_bases=list(alts),
        calls=[VariantCall(
            call_set_name="s1",
            info={"AD": [5] * n, "DP": [5 * n]},
        )],
    )


def _cvo(alts, indices, probs, ref="N"):
    """_create_call_variants_output analog
    (postprocess_variants_test.py:214-238)."""
    return CallVariantsOutput(
        variant=_variant(alts, ref=ref),
        alt_allele_indices=list(indices),
        genotype_probabilities=list(probs),
    )


def _check_all_permutations(cvos, expected_unnormalized, **kwargs):
    expected = np.asarray(expected_unnormalized, float)
    expected = expected / expected.sum()
    for permuted in itertools.permutations(cvos):
        _, predictions = merge_predictions(list(permuted), **kwargs)
        np.testing.assert_almost_equal(predictions, expected, decimal=5)


# -- min mode (test_merge_predictions_probs, :760-868) ----------------------------

MIN_MODE_CASES = [
    (
        [(["C", "T"], [0], [0.19, 0.75, 0.06]),
         (["C", "T"], [1], [0.03, 0.93, 0.04]),
         (["C", "T"], [0, 1], [0.03, 0.92, 0.05])],
        [0.03, 0.75, 0.05, 0.92, 0.05, 0.04],
    ),
    (
        [(["C", "T"], [1], [0.978, 0.03, 0.002]),
         (["C", "T"], [0, 1], [0.992, 0.007, 0.001]),
         (["C", "T"], [0], [0.99997, 0.00002, 0.00001])],
        [0.978, 0.00002, 0.00001, 0.007, 0.001, 0.001],
    ),
    # Degenerate all-zero min -> uniform (ZeroDivisionError guard).
    (
        [(["C", "T"], [0], [0.0, 1.0, 0.0]),
         (["C", "T"], [1], [0.0, 1.0, 0.0]),
         (["C", "T"], [0, 1], [1.0, 0.0, 0.0])],
        [1.0 / 6] * 6,
    ),
    (
        [(["A"], [0], [0.19, 0.75, 0.06])],
        [0.19, 0.75, 0.06],
    ),
    (
        [(["C", "G", "T"], [0], [0.999, 0.001, 0]),
         (["C", "G", "T"], [0, 1], [0, 1, 0]),
         (["C", "G", "T"], [0, 2], [0.0001, 0.9996, 0.0003]),
         (["C", "G", "T"], [1], [0, 1, 0]),
         (["C", "G", "T"], [1, 2], [0.0001, 0.0002, 0.9997]),
         (["C", "G", "T"], [2], [0.00004, 0.9999, 0.00006])],
        [0, 0.001, 0, 0.0002, 0, 0, 0.0002, 0.0003, 0.9997, 0.00006],
    ),
]


@pytest.mark.parametrize("specs,expected", MIN_MODE_CASES)
def test_merge_predictions_probs_min_mode(specs, expected):
    cvos = [_cvo(*s) for s in specs]
    if len(cvos) > 3:
        # 720 permutations is overkill; the reference's own order
        # independence is covered by the 3-CVO cases — spot-check a
        # rotation set here.
        perms = [cvos, cvos[::-1], cvos[2:] + cvos[:2]]
        expected_arr = np.asarray(expected, float)
        expected_arr = expected_arr / expected_arr.sum()
        for p in perms:
            _, predictions = merge_predictions(
                list(p), multiallelic_mode="min"
            )
            np.testing.assert_almost_equal(
                predictions, expected_arr, decimal=7
            )
    else:
        _check_all_permutations(cvos, expected, multiallelic_mode="min")


# -- product mode (test_merge_predictions_multiallelics_probs_product,
#    :908-983) ---------------------------------------------------------------------


def test_merge_predictions_product_mode_three_alts():
    cvos = [
        _cvo(["A", "B", "C"], [0], [0.03, 0.97, 0.0]),
        _cvo(["A", "B", "C"], [1], [0.23, 0.77, 0.0]),
        _cvo(["A", "B", "C"], [2], [0.03, 0.97, 0.0]),
        _cvo(["A", "B", "C"], [0, 1], [0.01, 0.29, 0.70]),
        _cvo(["A", "B", "C"], [0, 2], [0.01, 0.36, 0.63]),
        _cvo(["A", "B", "C"], [1, 2], [0.0, 1.00, 0.00]),
    ]
    expected = np.asarray([
        0.0, 0.0, 0.0, 4.44523e-05, 1.24896e-01, 0.0,
        5.32950e-04, 8.74527e-01, 0.0, 0.0,
    ])
    expected = expected / expected.sum()
    for p in (cvos, cvos[::-1], cvos[3:] + cvos[:3]):
        _, predictions = merge_predictions(
            list(p), multiallelic_mode="product"
        )
        np.testing.assert_almost_equal(predictions, expected, decimal=5)


# -- learned multiallelic model (test_merge_predictions_multiallelics_probs,
#    :1003-1146; bundled MLP weights reproduce these exactly) ----------------------

MLP_CASES = [
    (
        [(["C", "T"], [0], [0.19, 0.75, 0.06]),
         (["C", "T"], [1], [0.03, 0.93, 0.04]),
         (["C", "T"], [0, 1], [0.03, 0.92, 0.05])],
        [0.033062, 0.10498016, 0.00496365,
         0.5842303, 0.2543793, 0.01838462],
        None,
    ),
    (
        [(["C", "T"], [1], [0.978, 0.03, 0.002]),
         (["C", "T"], [0, 1], [0.992, 0.007, 0.001]),
         (["C", "T"], [0], [0.99997, 0.00002, 0.00001])],
        [9.3330729e-01, 1.5126608e-02, 6.1836297e-04,
         4.9650513e-02, 2.9180625e-05, 1.2679433e-03],
        None,
    ),
    (
        [(["C", "T"], [0], [0.0, 1.0, 0.0]),
         (["C", "T"], [1], [0.0, 1.0, 0.0]),
         (["C", "T"], [0, 1], [1.0, 0.0, 0.0])],
        [1.3300395e-03, 9.5756045e-03, 1.9776919e-05,
         7.6043198e-04, 9.3802148e-01, 5.0292656e-02],
        None,
    ),
    # All alts below qual_filter: the best-of-the-filtered allele is
    # kept and the site collapses to a biallelic merge (no MLP).
    (
        [(["C", "T"], [0, 1], [1, 0, 0]),
         (["C", "T"], [0], [0.99, 0.01, 0]),
         (["C", "T"], [1], [1, 0, 0])],
        [0.99, 0.01, 0.0],
        6,
    ),
]


@pytest.mark.parametrize("specs,expected,qual_filter", MLP_CASES)
def test_merge_predictions_multiallelic_model(
    specs, expected, qual_filter
):
    cvos = [_cvo(*s) for s in specs]
    _check_all_permutations(
        cvos, expected,
        multiallelic_model=load_multiallelic_model(),
        qual_filter=qual_filter,
    )


# -- normalize_predictions (:902-910) ----------------------------------------------


def test_normalize_predictions_with_filtered_placeholder():
    norm = gt.normalize_predictions(
        [0.001, 0.017, 0.30, gt._FILTERED_ALT_PROB, 0.327]
    )
    np.testing.assert_almost_equal(
        norm, [0.0015504, 0.0263566, 0.4651163, 0.0, 0.5069767]
    )


# -- sanity-check exceptions (test_exception_merge_predictions, :1148-1267) --------

EXCEPTION_CASES = [
    # 1 alt but wrong indices.
    [(["A"], [1], [0.19, 0.75, 0.06])],
    # 2 alts with only 2 of the 3 required index sets.
    [(["G", "T"], [0], [0.19, 0.75, 0.06]),
     (["G", "T"], [1], [0.03, 0.93, 0.04])],
    # Duplicate [0] instead of [1].
    [(["G", "T"], [0], [0.19, 0.75, 0.06]),
     (["G", "T"], [0], [0.03, 0.93, 0.04]),
     (["G", "T"], [0, 1], [0.03, 0.93, 0.04])],
    # 2 alts, single CVO.
    [(["G", "T"], [0], [0.19, 0.75, 0.06])],
    # 3 alts need 6 CVOs, got 3.
    [(["AA", "T", "AAA"], [0], [0.999, 0.001, 0]),
     (["AA", "T", "AAA"], [0, 1], [0, 1, 0]),
     (["AA", "T", "AAA"], [0, 2], [0.0001, 0.9996, 0.0003])],
]


@pytest.mark.parametrize("specs", EXCEPTION_CASES)
def test_merge_predictions_sanity_check(specs):
    cvos = [_cvo(*s) for s in specs]
    with pytest.raises(ValueError, match="sanity check"):
        merge_predictions(cvos)


def test_merge_predictions_empty_raises():
    with pytest.raises(ValueError, match="1 or more"):
        merge_predictions([])


def test_merge_predictions_mismatched_ref_raises():
    cvos = [
        _cvo(["T", "C"], [0], [0.999, 0.001, 0], ref="A"),
        _cvo(["T", "C"], [1], [0.2, 0.8, 0], ref="A"),
        _cvo(["T", "C"], [0, 1], [0.2, 0.8, 0], ref="G"),
    ]
    with pytest.raises(ValueError, match="sanity check"):
        merge_predictions(cvos)


def test_merge_predictions_mismatched_alt_order_raises():
    cvos = [
        _cvo(["T", "C"], [0], [0.999, 0.001, 0]),
        _cvo(["T", "C"], [1], [0.2, 0.8, 0]),
        _cvo(["C", "T"], [0, 1], [0.2, 0.8, 0]),
    ]
    with pytest.raises(ValueError, match="sanity check"):
        merge_predictions(cvos)

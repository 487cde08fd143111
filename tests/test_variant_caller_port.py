"""Port of variant_caller_test.py's numeric corpus (gVCF reference
confidence): the full GQ / genotype-likelihood table over coverage,
alt counts, p_error values, max-GQ saturation and haploid rows
(variant_caller_test.py:135-218), read-count rescaling
(:221-256), and large-coverage stability (:257-272)."""

import numpy as np
import pytest

from deepvariant_tpu.make_examples.variant_caller import (
    ReferenceConfidence,
    VariantCallerOptions,
    rescale_read_counts_if_necessary,
)


def make_rc(p_error, max_gq, ploidy=2):
    return ReferenceConfidence(VariantCallerOptions(
        p_error=p_error, max_gq=max_gq, gq_resolution=1, ploidy=ploidy,
    ))


REF_CALC_CASES = [
    # (total_n, alt_n, p_error, max_gq, expected_likelihoods,
    #  expected_gq, is_haploid)
    (0, 0, 0.01, 100, [-0.477121, -0.477121, -0.477121], 1, False),
    (10, 0, 0.01, 100, [-0.000469, -2.967121, -19.956821], 29, False),
    (10, 1, 0.01, 100, [-0.044109, -1.015126, -16.009190], 10, False),
    (10, 2, 0.01, 100, [-1.063830, -0.039211, -13.037641], 0, False),
    (10, 3, 0.01, 100, [-3.020668, -0.000414, -11.003209], 0, False),
    (10, 4, 0.01, 100, [-5.015893, -0.000004, -9.007163], 0, False),
    (10, 5, 0.01, 100, [-7.011524, -0.000000, -7.011524], 0, False),
    (10, 6, 0.01, 100, [-9.007163, -0.000004, -5.015893], 0, False),
    (10, 7, 0.01, 100, [-11.003209, -0.000414, -3.020668], 0, False),
    (10, 8, 0.01, 100, [-13.037641, -0.039211, -1.063830], 0, False),
    (10, 9, 0.01, 100, [-16.009190, -1.015126, -0.044109], 0, False),
    (10, 10, 0.01, 100, [-19.956821, -2.967121, -0.000469], 0, False),
    (20, 0, 0.01, 100, [-0.000001, -5.933304, -39.912704], 59, False),
    (20, 1, 0.01, 100, [-0.000050, -3.937719, -35.921484], 39, False),
    (20, 2, 0.01, 100, [-0.004935, -1.946968, -31.935098], 19, False),
    (20, 3, 0.01, 100, [-0.328657, -0.275056, -28.267550], 2, False),
    (20, 4, 0.01, 100, [-2.053097, -0.003860, -26.000720], 0, False),
    (20, 5, 0.01, 100, [-4.044911, -0.000039, -24.001263], 0, False),
    (20, 10, 0.01, 100, [-14.023048, -0.000000, -14.023048], 0, False),
    (20, 15, 0.01, 100, [-24.001263, -0.000039, -4.044911], 0, False),
    (20, 17, 0.01, 100, [-28.267550, -0.275056, -0.328657], 0, False),
    (20, 19, 0.01, 100, [-35.921484, -3.937719, -0.000050], 0, False),
    (20, 20, 0.01, 100, [-39.912704, -5.933304, -0.000001], 0, False),
    # p_error sweep
    (10, 0, 0.1, 100, [-0.001215, -2.553940, -9.543640], 25, False),
    (10, 1, 0.1, 100, [-0.010811, -1.609294, -7.644752], 16, False),
    (10, 0, 0.001, 100, [-0.000428, -3.006383, -29.996083], 30, False),
    (10, 1, 0.001, 100, [-0.297847, -0.304236, -24.294371], 3, False),
    (10, 0, 1e-04, 100, [-0.000424, -3.010290, -39.999990], 30, False),
    (10, 1, 1e-04, 100, [-1.032394, -0.042303, -33.032046], 0, False),
    # coverage scaling to max_gq
    (30, 0, 0.01, 100, [-0.000000, -8.899956, -59.869056], 88, False),
    (40, 0, 0.01, 100, [-0.000000, -11.866608, -79.825408], 100, False),
    (50, 0, 0.01, 100, [-0.000000, -14.833260, -99.781760], 100, False),
    (100, 0, 0.01, 100, [0.000000, -29.666519, -199.563519], 100,
     False),
    # haploid rows
    (10, 8, 0.01, 100,
     [-11.97381, -9.949651e02, -0.0000000000004609646], 0, True),
    (10, 1, 0.01, 100, [0.0, -996.960717, -15.965082], 100, True),
    (10, 5, 0.01, 100, [-0.30103, -989.2792, -0.3010300], 3, True),
]


@pytest.mark.parametrize(
    "total_n,alt_n,p_error,max_gq,expected_likelihoods,expected_gq,"
    "is_haploid", REF_CALC_CASES,
)
def test_ref_calc(total_n, alt_n, p_error, max_gq,
                  expected_likelihoods, expected_gq, is_haploid):
    rc = make_rc(p_error, max_gq)
    gq, likelihoods = rc(total_n - alt_n, total_n, is_haploid)
    np.testing.assert_allclose(expected_likelihoods, likelihoods,
                               atol=1e-6)
    assert gq == expected_gq


@pytest.mark.parametrize("n_ref,n_total,max_allowed,expected", [
    (0, 10, 100, (0, 10)),
    (5, 10, 100, (5, 10)),
    (10, 10, 100, (10, 10)),
    (10, 100, 100, (10, 100)),
    (100, 100, 100, (100, 100)),
    (0, 200, 100, (0, 100)),
    (0, 1000, 100, (0, 100)),
    (0, 10000, 100, (0, 100)),
    (1, 200, 100, (1, 100)),
    (1, 1000, 100, (1, 100)),
    (1, 10000, 100, (1, 100)),
    (1, 100000, 100, (1, 100)),
    (2, 200, 100, (1, 100)),
    (3, 200, 100, (2, 100)),
    (4, 200, 100, (2, 100)),
    (10, 200, 100, (5, 100)),
    (50, 200, 100, (25, 100)),
    (100, 200, 100, (50, 100)),
    (200, 200, 100, (100, 100)),
    (99, 100, 100, (99, 100)),
])
def test_rescale_read_counts(n_ref, n_total, max_allowed, expected):
    assert rescale_read_counts_if_necessary(
        n_ref, n_total, max_allowed
    ) == expected


@pytest.mark.parametrize(
    "n_ref,n_alt_fraction",
    [(n_ref, f) for n_ref in (1000, 10000, 100000, 1000000)
     for f in (0.0, 0.01, 0.02)],
)
def test_handles_large_reference_counts(n_ref, n_alt_fraction):
    # Mirrors the reference's direct _calc_reference_confidence call
    # (no cache rescaling).
    rc = make_rc(0.01, 100)
    n_alt = int(n_alt_fraction * n_ref)
    gq, likelihoods = rc._calc(n_ref, n_ref + n_alt, False)
    assert np.isfinite(likelihoods).all()
    assert gq == 100

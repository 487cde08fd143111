"""Port of nucleus genomics_math_test.py's full numeric tables
(:45-236): phred scaling with bounds, bounded log10 perror,
log10_ptrue_to_phred edge cases, the R-generated log10_binomial table,
log10sumexp, and normalize_log10_probs."""

import numpy as np
import pytest

from deepvariant_tpu.core import genomics_math


@pytest.mark.parametrize("prob,bound,expected", [
    (0.9000000, None, 10.0),
    (0.9900000, None, 20.0),
    (0.9990000, None, 30.0),
    (0.9999000, None, 40.0),
    (0.9999900, None, 50.0),
    (0.9999990, None, 60.0),
    (0.9999999, None, 70.0),
    (0.9999999, 1 - 1e-1, 10.0),
    (0.9999999, 1 - 1e-2, 20.0),
    (0.9999999, 1 - 1e-3, 30.0),
    (0.9999999, 1 - 1e-9, 70.0),
])
def test_phred_scale(prob, bound, expected):
    if bound:
        actual = genomics_math.ptrue_to_bounded_phred(prob, bound)
    else:
        actual = genomics_math.ptrue_to_bounded_phred(prob)
    assert actual == pytest.approx(expected, abs=1e-6)


@pytest.mark.parametrize("prob,bound,expected", [
    (1.000000, None, 0.0),
    (0.100000, None, -1.0),
    (0.010000, None, -2.0),
    (0.001000, None, -3.0),
    (0.000100, None, -4.0),
    (0.000010, None, -5.0),
    (0.000001, None, -6.0),
    (0.000100, 1e-1, -1.0),
    (0.000100, 1e-2, -2.0),
    (0.000100, 1e-3, -3.0),
    (0.000100, 1e-4, -4.0),
    (0.000100, 1e-5, -4.0),
    (0.000100, 1e-6, -4.0),
])
def test_log10_prob(prob, bound, expected):
    if bound:
        actual = genomics_math.perror_to_bounded_log10_perror(prob, bound)
    else:
        actual = genomics_math.perror_to_bounded_log10_perror(prob)
    assert actual == pytest.approx(expected, abs=1e-6)


@pytest.mark.parametrize("prob,value_if_not_finite,expected", [
    (np.log10(0.900000), -1.0, 10.0),
    (np.log10(0.990000), -1.0, 20.0),
    (np.log10(0.999000), -1.0, 30.0),
    (-10000000.0, -1.0, 0.0),
    (0.0, -1.0, -1.0),
    (0 - 1e-16, -1.0, 156.53559774527022),
    (0 - 1e-32, -1.0, -1.0),
])
def test_log10_ptrue_to_phred(prob, value_if_not_finite, expected):
    actual = genomics_math.log10_ptrue_to_phred(prob, value_if_not_finite)
    assert actual == pytest.approx(expected, abs=1e-6)


# R: dbinom(k, n, p, log=T) * log10(exp(1))
@pytest.mark.parametrize("k,n,p,expected", [
    (0, 0, 0.01, 0),
    (0, 0, 0.5, 0),
    (0, 5, 0.01, -0.0218240270122504),
    (0, 5, 0.5, -1.50514997831991),
    (1, 5, 0.01, -1.31848921727378),
    (1, 5, 0.5, -0.806179973983887),
    (2, 5, 0.01, -3.01309441620735),
    (2, 5, 0.5, -0.505149978319906),
    (3, 5, 0.01, -5.0087296108049),
    (3, 5, 0.5, -0.505149978319906),
    (4, 5, 0.01, -7.30539480106643),
    (4, 5, 0.5, -0.806179973983887),
    (5, 5, 0.01, -10),
    (5, 5, 0.5, -1.50514997831991),
    (0, 10, 0.01, -0.0436480540245008),
    (0, 10, 0.5, -3.01029995663981),
    (1, 10, 0.01, -1.03928324862205),
    (1, 10, 0.5, -2.01029995663981),
    (2, 10, 0.01, -2.38170592944426),
    (2, 10, 0.5, -1.35708744286447),
    (3, 10, 0.01, -3.95137239176953),
    (3, 10, 0.5, -0.931118710592187),
    (4, 10, 0.01, -5.70396953768078),
    (4, 10, 0.5, -0.688080661905893),
    (5, 10, 0.01, -7.62042348623071),
    (5, 10, 0.5, -0.608899415858268),
    (6, 10, 0.01, -9.69523992687588),
    (6, 10, 0.5, -0.688080661905893),
    (7, 10, 0.01, -11.9339131701597),
    (7, 10, 0.5, -0.931118710592187),
    (8, 10, 0.01, -14.3555170970296),
    (8, 10, 0.5, -1.35708744286447),
    (9, 10, 0.01, -17.0043648054024),
    (9, 10, 0.5, -2.01029995663981),
    (10, 10, 0.01, -20),
    (10, 10, 0.5, -3.01029995663981),
    (0, 1000, 0.5, -301.029995663981),
    (0, 10000, 0.5, -3010.29995663981),
    (100, 10000, 0.5, -2768.48565263445),
])
def test_log10_binomial(k, n, p, expected):
    assert genomics_math.log10_binomial(k, n, p) == pytest.approx(
        expected, abs=1e-7 * max(1.0, abs(expected))
    )


@pytest.mark.parametrize("log10_probs,expected", [
    ([0], 0.0),
    ([0.0], 0.0),
    ([0.0, -10000.0], 0.0),
    ([-1000.0, -10000.0], -1000.0),
    ([-1, -10, -100], -1.0),
    ([-1, -10, -1], -0.69897),
    ([-1, -1, -1], -0.5228787),
    ([-1, -1, -1, -100], -0.5228787),
    ([-1, -1, -1, -100, -1000], -0.5228787),
    ([-1, -1, -1, -100, -1000, -10000], -0.5228787),
    ([-1, -1, -1, -100, -1000, -10000, -100000], -0.5228787),
])
def test_log10sumexp(log10_probs, expected):
    assert genomics_math.log10sumexp(log10_probs) == pytest.approx(
        expected, abs=1e-6
    )


@pytest.mark.parametrize("log10_probs,expected", [
    ([0.000000], [0.000000]),
    ([-1.000000, -10.000000], [-0.000000, -9.000000]),
    ([-1.000000, -100.000000], [0.000000, -99.000000]),
    ([-1.000000, -1000.000000], [0.000000, -999.000000]),
    ([-1.000000, -2.000000], [-0.041393, -1.041393]),
    ([-1.000000, -2.000000, -3.000000],
     [-0.045323, -1.045323, -2.045323]),
    ([-1.000000, -2.000000, -3.000000, -100.000000],
     [-0.045323, -1.045323, -2.045323, -99.045323]),
    ([-1.000000, -2.000000, -100.000000],
     [-0.041393, -1.041393, -99.041393]),
    ([-1.000000, -2.000000, -100.000000, -100.000000],
     [-0.041393, -1.041393, -99.041393, -99.041393]),
])
def test_normalize_log10_probs(log10_probs, expected):
    np.testing.assert_allclose(
        genomics_math.normalize_log10_probs(log10_probs),
        expected, atol=1e-6,
    )


def test_log10_binomial_rejects_bad_k():
    with pytest.raises(ValueError):
        genomics_math.log10_binomial(3, 2, 0.5)
    with pytest.raises(ValueError):
        genomics_math.log10_binomial(-1, 2, 0.5)

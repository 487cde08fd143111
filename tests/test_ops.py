"""ops/ pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

from deepvariant_tpu.ops import pileup_paint as pp


def _inputs(n=2, r=16, w=32, seed=0):
    rng = np.random.RandomState(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    b = bases[rng.randint(0, 4, (n, r, w))]
    b[rng.rand(n, r, w) < 0.25] = 0
    q = rng.randint(0, 60, (n, r, w)).astype(np.uint8)
    covered = b != 0
    ref = bases[rng.randint(0, 4, (n, w))]
    f32 = lambda s: rng.randint(0, 255, s).astype(np.float32)
    return (b, q, covered, ref, f32((n, r)), f32((n, r)),
            f32((n, r)), f32((n, r)))


class TestPaintPileup:
    def test_interpret_matches_xla(self):
        args = _inputs()
        out_pl = np.asarray(pp._paint_pileup(*args, interpret=True))
        out_xla = np.asarray(pp._paint_xla(*args))
        np.testing.assert_array_equal(out_pl, out_xla)

    def test_channel_numerics(self):
        """Colors match the numpy PileupEncoder formulas."""
        args = _inputs()
        b, q, covered, ref = args[:4]
        out = np.asarray(pp._paint_pileup(*args, interpret=True))
        # read_base channel: A=250, G=180, T=100, C=30.
        lut = {ord("A"): 250, ord("G"): 180, ord("T"): 100,
               ord("C"): 30, 0: 0}
        want = np.vectorize(lut.get)(b) * covered
        np.testing.assert_array_equal(out[:, :, :, 0], want)
        # base_quality: int(254 * min(q, 40) / 40).
        want_q = (254.0 * np.minimum(q, 40) / 40.0).astype(
            np.uint8
        ) * covered
        np.testing.assert_array_equal(out[:, :, :, 1], want_q)
        # base_differs_from_ref: 50 on match, 254 on mismatch.
        match = b == ref[:, None, :]
        want_d = np.where(match, 50, 254).astype(np.uint8) * covered
        np.testing.assert_array_equal(out[:, :, :, 5], want_d)

    def test_uncovered_pixels_zero(self):
        args = _inputs()
        covered = args[2]
        out = np.asarray(pp._paint_pileup(*args, interpret=True))
        assert (out[~covered] == 0).all()

    def test_dispatch_fallback(self):
        """paint_pileup always returns a result, pallas or not."""
        args = _inputs()
        out = np.asarray(pp.paint_pileup(*args))
        assert out.shape == (*args[0].shape, 7)

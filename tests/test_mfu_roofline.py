"""Unit tests for the MFU roofline analyzer (deploy/mfu_roofline.py)."""

import sys

sys.path.insert(0, "/root/repo/deploy")

from mfu_roofline import _rup, analyze_hlo  # noqa: E402


def test_rup():
    assert _rup(7, 128) == 128
    assert _rup(128, 128) == 128
    assert _rup(129, 128) == 256


def test_conv_parse_and_efficiency():
    line = (
        "%6 = stablehlo.convolution(%4, %5) dim_numbers = "
        "[b, 0, 1, f]x[0, 1, i, o]->[b, 0, 1, f], window = "
        "{stride = [2, 2]} : (tensor<8x100x221x7xbf16>, "
        "tensor<3x3x7x32xbf16>) -> tensor<8x49x110x32xbf16>"
    )
    ops = analyze_hlo(line)
    assert len(ops) == 1
    op = ops[0]
    assert op["kind"] == "conv"
    assert op["k"] == 3 * 3 * 7       # contraction depth 63
    assert op["n"] == 32
    assert op["m"] == 8 * 49 * 110
    assert op["flops"] == 2.0 * op["m"] * 63 * 32
    # 63/128 * 32/128 * ~1 — badly quantized stem conv.
    assert 0.11 < op["eff"] < 0.13


def test_dot_parse_full_tiles():
    line = (
        "%9 = stablehlo.dot_general %a, %b, contracting_dims = "
        "[1] x [0], precision = [DEFAULT, DEFAULT] : "
        "(tensor<1024x2048xf32>, tensor<2048x3xf32>) "
        "-> tensor<1024x3xf32>"
    )
    ops = analyze_hlo(line)
    assert len(ops) == 1
    op = ops[0]
    assert op["kind"] == "dot"
    assert op["k"] == 2048 and op["n"] == 3 and op["m"] == 1024
    # n=3 pads to 128: eff = 3/128.
    assert abs(op["eff"] - 3 / 128) < 1e-3


def test_perfect_tile_is_full_efficiency():
    line = (
        "%1 = stablehlo.convolution(%a, %b) dim_numbers = "
        "[b, 0, 1, f]x[0, 1, i, o]->[b, 0, 1, f], window = "
        "{stride = [1, 1]} : (tensor<8x4x12x768xbf16>, "
        "tensor<1x1x768x768xbf16>) -> tensor<8x4x12x768xbf16>"
    )
    op = analyze_hlo(line)[0]
    assert op["eff"] == 1.0

"""Pileup vis + automated-curation semantics.

Ported corpus: nucleus/util/vis_test.py — example accessors, color
scaling pins, PNG export shape gates, channel-name padding, ref-band
removal, the quality/support fraction fixtures, the exact binomial
table, strand-bias p-values, and the diff/nearby-variant scenarios.
"""

import os

import numpy as np
import pytest

from deepvariant_tpu.core.types import Variant
from deepvariant_tpu.io import examples as exio
from deepvariant_tpu.tools import vis


def _image_array(shape):
    return np.random.RandomState(0).randint(
        255, size=shape, dtype=np.uint8
    )


def _mock_example_with_image(shape):
    arr = _image_array(shape)
    buf = exio.encode_example({
        "image/encoded": arr.tobytes(),
        "image/shape": list(shape),
    })
    return arr, buf


def _mock_example_with_variant_and_alt_allele_indices(
    encoded_indices=b"\n\x01\x00", alleles=("A", "C")
):
    variant = Variant(
        reference_name="X", start=10, end=11,
        reference_bases=alleles[0],
        alternate_bases=list(alleles[1:]),
    )
    return exio.encode_example({
        "variant/encoded": variant.encode(),
        "alt_allele_indices/encoded": encoded_indices,
    })


def _mock_pileup_array_with_reads():
    # 4 reads, each 8 bases long; one read low-valued, another with
    # two low-valued bases (vis_test.py fixture).
    pileup = np.zeros((10, 15))
    pileup[5, 0:8] = 254
    pileup[6, 1:9] = 254
    pileup[7, 4:12] = 100
    pileup[8, 6:14] = 254
    pileup[8, 8:10] = 100
    return pileup


def test_get_image_array_from_example():
    arr, example = _mock_example_with_image((3, 2, 4))
    assert (vis.get_image_array_from_example(example) == arr).all()


@pytest.mark.parametrize("shape", [(5, 4, 3), (10, 7, 5)])
def test_split_3d_array_into_channels(shape):
    arr = np.random.RandomState(1).random(shape)
    out = vis.split_3d_array_into_channels(arr)
    assert len(out) == shape[2]
    for i in range(shape[2]):
        assert out[i].shape == arr.shape[:2]
        assert (out[i] == arr[:, :, i]).all()


def test_channels_from_example():
    arr, example = _mock_example_with_image((3, 2, 4))
    channels = vis.channels_from_example(example)
    assert len(channels) == 4
    assert (channels[0] == arr[:, :, 0]).all()


@pytest.mark.parametrize("shape,expected", [
    ((4, 8), (4, 8, 3)),
    ((100, 20), (100, 20, 3)),
])
def test_convert_6_channels_to_rgb(shape, expected):
    channels = [
        np.random.RandomState(i).random(shape) for i in range(6)
    ]
    assert vis.convert_6_channels_to_rgb(channels).shape == expected


@pytest.mark.parametrize("composite_type", [None, "RGB"])
def test_draw_deepvariant_pileup_with_example_input(composite_type):
    _, example = _mock_example_with_image((100, 10, 7))
    vis.draw_deepvariant_pileup(
        example=example, composite_type=composite_type
    )


@pytest.mark.parametrize("composite_type", [None, "RGB"])
def test_draw_deepvariant_pileup_with_channels_input(composite_type):
    channels = [_image_array((100, 221)) for _ in range(6)]
    vis.draw_deepvariant_pileup(
        channels=channels, composite_type=composite_type
    )


@pytest.mark.parametrize("arr,vmin,vmax,expected", [
    ([[0.0, 1], [5, 10]], 0, 10, [[0, 25], [127, 255]]),
    ([[0.0, 0.1], [0.5, 1]], 0, 1, [[0, 25], [127, 255]]),
    ([[0.0, 0.1], [0.5, 1]], 0, 0.5, [[0, 51], [255, 255]]),
    ([[0.0, 0.1], [0.5, 1]], 0.5, 1, [[0, 0], [0, 255]]),
    ([[0.0, 0.1], [0.5, 1]], -1, 1, [[127, 140], [191, 255]]),
    ([[0.0, 0.1], [0.5, 1]], -1, 2, [[85, 93], [127, 170]]),
])
def test_scale_colors_for_png(arr, vmin, vmax, expected):
    scaled = vis.scale_colors_for_png(
        np.array(arr), vmin=vmin, vmax=vmax
    )
    assert (scaled == expected).all()


@pytest.mark.parametrize("shape,expected_mode", [
    ((100, 200), "L"),
    ((100, 200, 3), "RGB"),
])
def test_autoscale_colors_for_png(shape, expected_mode):
    arr = np.random.RandomState(2).random(shape)
    scaled, image_mode = vis.autoscale_colors_for_png(arr)
    assert np.max(arr) < 1  # original unchanged
    assert arr.dtype != np.uint8
    assert np.max(scaled) > 1
    assert scaled.dtype == np.uint8
    assert image_mode == expected_mode


@pytest.mark.parametrize("shape,expected", [
    ((100, 200), "L"),
    ((10, 1), "L"),
    ((100, 200, 3), "RGB"),
    ((10, 1, 3), "RGB"),
    ((100, 200, 6), None),
    ((100, 200, 3, 1), None),
    ((100,), None),
])
def test_get_image_type_from_array(shape, expected):
    arr = _image_array(shape)
    if expected is not None:
        assert vis.image_type_from_array(arr) == expected
    else:
        with pytest.raises(ValueError, match="shape"):
            vis.save_to_png(arr, path="/tmp/never_written.png")


@pytest.mark.parametrize("shape,should_succeed", [
    ((100, 200, 3), True),
    ((100, 200), True),
    ((100, 200, 6), False),
    ((100, 200, 3, 1), False),
    ((100,), False),
])
def test_save_to_png(tmp_path, shape, should_succeed):
    arr = _image_array(shape)
    output_path = str(tmp_path / "test.png")
    if should_succeed:
        vis.save_to_png(arr, path=output_path)
        assert os.path.exists(output_path)
    else:
        with pytest.raises(ValueError):
            vis.save_to_png(arr, path=output_path)


@pytest.mark.parametrize("shape,should_succeed", [
    ((100, 200, 3), True),
    ((100, 200), True),
    ((100, 200, 6), False),
])
def test_array_to_png_works_with_floats(tmp_path, shape,
                                        should_succeed):
    arr = np.random.RandomState(3).random(shape)
    if should_succeed:
        img = vis.array_to_png(arr)
        img.save(str(tmp_path / "t.png"))
        assert os.path.exists(str(tmp_path / "t.png"))
    else:
        with pytest.raises(ValueError):
            vis.array_to_png(arr)


def test_variant_from_example():
    example = _mock_example_with_variant_and_alt_allele_indices()
    variant = vis.variant_from_example(example)
    assert isinstance(variant, Variant)
    assert variant.reference_name == "X"
    assert variant.start == 10


@pytest.mark.parametrize("encoded,expected", [
    (b"\n\x01\x00", [0]),
    (b"\n\x02\x00\x01", [0, 1]),
])
def test_alt_allele_indices_from_example(encoded, expected):
    example = _mock_example_with_variant_and_alt_allele_indices(encoded)
    assert vis.alt_allele_indices_from_example(example) == expected


@pytest.mark.parametrize("chrom,pos,ref,expected", [
    ("chr1", 100, "G", "chr1:100_G"),
    ("X", 0, "GACGT", "X:0_GACGT"),
])
def test_locus_id_from_variant(chrom, pos, ref, expected):
    variant = Variant(
        reference_name=chrom, start=pos, end=pos + len(ref),
        reference_bases=ref, alternate_bases=["A"],
    )
    assert vis.locus_id_from_variant(variant) == expected


@pytest.mark.parametrize("encoded,alleles,expected", [
    (b"\n\x01\x00", ["A", "G", "GA", "AG"], "G"),
    (b"\n\x02\x00\x01", ["C", "CA", "T", "TA"], "CA-T"),
    (b"\n\x02\x01\x02", ["C", "CA", "T", "TA"], "T-TA"),
])
def test_alt_from_example(encoded, alleles, expected):
    example = _mock_example_with_variant_and_alt_allele_indices(
        encoded_indices=encoded, alleles=alleles
    )
    assert vis.alt_from_example(example) == expected


@pytest.mark.parametrize("encoded,alleles,expected", [
    (b"\n\x01\x00", ["A", "G", "GA", "AG"], "X:10_A_G"),
    (b"\n\x02\x00\x01", ["C", "CA", "T", "TA"], "X:10_C_CA-T"),
    (b"\n\x02\x01\x02", ["C", "CA", "T", "TA"], "X:10_C_T-TA"),
])
def test_locus_id_with_alt(encoded, alleles, expected):
    example = _mock_example_with_variant_and_alt_allele_indices(
        encoded_indices=encoded, alleles=alleles
    )
    assert vis.locus_id_with_alt(example) == expected


@pytest.mark.parametrize("indices,alts,expected", [
    ([0], ["C"], "C"),
    ([0, 1], ["C", "TT"], "C-TT"),
    ([3, 4], ["C", "TT", "T", "G", "A"], "G-A"),
])
def test_alt_bases_from_indices(indices, alts, expected):
    assert vis.alt_bases_from_indices(indices, alts) == expected


@pytest.mark.parametrize("truth_label", [0, 1, 2])
def test_label_from_example(truth_label):
    buf = exio.encode_example({"label": [truth_label]})
    assert vis.label_from_example(buf) == truth_label


@pytest.mark.parametrize("num_channels", [0, 1, 2, 8, 9, 20])
def test_deepvariant_channel_names(num_channels):
    assert len(vis._deepvariant_channel_names(num_channels)) == \
        num_channels


def test_remove_ref_band():
    pileup = _mock_pileup_array_with_reads()
    bottom = vis.remove_ref_band(pileup)
    assert bottom.shape == (pileup.shape[0] - 5, pileup.shape[1])
    assert np.sum(pileup) == np.sum(bottom)
    assert vis.remove_ref_band(np.zeros((100, 200))).shape == (95, 200)
    with pytest.raises(AssertionError):
        vis.remove_ref_band(np.zeros((4, 10)) + 254)


def test_fraction_low_base_quality():
    shape = (10, 15)
    assert vis.fraction_low_base_quality(
        [[], np.zeros(shape) + 254]) == 0
    assert vis.fraction_low_base_quality(
        [[], np.zeros(shape) + 100]) == 1
    assert vis.fraction_low_base_quality([[], np.zeros(shape)]) == 0
    assert vis.fraction_low_base_quality(
        [[], _mock_pileup_array_with_reads()]) == 0.3125


def test_fraction_reads_with_low_mapq():
    shape = (10, 15)
    filler = [0] * 2
    assert vis.fraction_reads_with_low_mapq(
        filler + [np.zeros(shape) + 254]) == 0
    assert vis.fraction_reads_with_low_mapq(
        filler + [np.zeros(shape) + 100]) == 1
    assert vis.fraction_reads_with_low_mapq(
        filler + [np.zeros(shape)]) == 0
    assert vis.fraction_reads_with_low_mapq(
        filler + [_mock_pileup_array_with_reads()]) == 0.25


def test_fraction_read_support_and_describer():
    shape = (10, 15)
    filler = [0] * 4
    all_support = filler + [np.zeros(shape) + 254]
    no_support = filler + [np.zeros(shape) + 100]
    empty = filler + [np.zeros(shape)]
    golden = filler + [_mock_pileup_array_with_reads()]

    assert vis.fraction_read_support(all_support) == 1
    assert vis.describe_read_support(all_support) == vis.ReadSupport.ALL
    assert vis.fraction_read_support(no_support) == 0
    assert vis.describe_read_support(no_support) == vis.ReadSupport.LOW
    assert vis.fraction_read_support(empty) == 0
    assert vis.describe_read_support(empty) == vis.ReadSupport.LOW
    assert vis.fraction_read_support(golden) == 0.75
    assert vis.describe_read_support(golden) == vis.ReadSupport.HALF


@pytest.mark.parametrize("k,n,expected_p", [
    (12, 24, 1.0),
    (1, 4, 0.625),
    (3, 4, 0.625),
    (0, 4, 0.125),
    (4, 4, 0.125),
    (0, 8, 0.0078125),
    (8, 8, 0.0078125),
])
def test_binomial_test(k, n, expected_p):
    assert vis.binomial_test(k=k, n=n) == expected_p


def test_binomial_test_k_greater_than_n_raises():
    with pytest.raises(ValueError):
        vis.binomial_test(k=5, n=4)


@pytest.mark.parametrize("test_case,expected", [
    ("support = forward", 0.0625),
    ("support = reverse", 0.0625),
    ("support = 5+/5-", 1.0),
    ("support = 2+/2-", 1.0),
    ("support = 1+/5-", 0.21875),
    ("support = 5+/1-", 0.21875),
])
def test_pvalue_for_strand_bias(test_case, expected):
    shape = (15, 4)
    strand = np.zeros(shape)
    strand[5:10, :] = 240  # Forward.
    strand[10:15, :] = 70  # Reverse.

    read_support = np.zeros(shape)
    if test_case == "support = forward":
        read_support[5:10, :] = 254
        read_support[10:15, :] = 100
    elif test_case == "support = reverse":
        read_support[5:10, :] = 100
        read_support[10:15, :] = 254
    elif test_case == "support = 5+/5-":
        read_support[5:15, :] = 254
    elif test_case == "support = 2+/2-":
        read_support[5:15, :] = 100
        read_support[8:12, :] = 254
    elif test_case == "support = 1+/5-":
        read_support[5:15, :] = 100
        read_support[5:6, :] = 254
        read_support[10:15, :] = 254
    elif test_case == "support = 5+/1-":
        read_support[5:15, :] = 100
        read_support[5:10, :] = 254
        read_support[10:11, :] = 254

    channels = [0] * 3 + [strand, read_support]
    assert vis.pvalue_for_strand_bias(channels) == expected


@pytest.mark.parametrize(
    "test_case,expected_description,expected_diff_fraction,"
    "expected_nearby_variants",
    [
        ("nearby_variants", vis.Diff.NEARBY_VARIANTS, 0.0, 5),
        ("few_diffs", vis.Diff.FEW_DIFFS, 0.0, 2),
        ("many_diffs", vis.Diff.MANY_DIFFS, 0.1, 0),
        ("empty", vis.Diff.FEW_DIFFS, 0.0, 0),
    ],
)
def test_analyze_diff_and_nearby_variants_and_describe_diff(
    test_case, expected_description, expected_diff_fraction,
    expected_nearby_variants,
):
    shape = (15, 8)
    diff_channel = np.zeros(shape) + 100
    if test_case == "nearby_variants":
        diff_channel[5:, [0, 1, 2, 4, 6]] = 254
    elif test_case == "few_diffs":
        diff_channel[5:, [2, 5]] = 254
    elif test_case == "many_diffs":
        diff_channel[5, 0:8] = 254
    elif test_case == "empty":
        diff_channel = np.zeros(shape)

    channels = [0] * 5 + [diff_channel]
    diff_fraction, nearby = vis.analyze_diff_and_nearby_variants(
        channels
    )
    assert diff_fraction == expected_diff_fraction
    assert nearby == expected_nearby_variants
    assert vis.describe_diff(channels) == expected_description


def test_curate_pileup():
    channels = [_mock_pileup_array_with_reads() for _ in range(6)]
    tags = vis.curate_pileup(channels)
    assert tags.base_quality == vis.BaseQuality.BAD
    assert tags.mapping_quality == vis.MappingQuality.BAD
    assert tags.strand_bias == vis.StrandBias.GOOD
    assert tags.diff_category == vis.Diff.MANY_DIFFS
    assert tags.read_support == vis.ReadSupport.HALF

"""Port of nucleus util/cigar_test.py (:44-190): format/parse
round-trips over all nine op codes, alignment (reference-span)
lengths, and malformed-string rejection. Repo cigar units are
(proto_op, length) tuples instead of CigarUnit protos."""

import itertools

import pytest

from deepvariant_tpu.core import cigar
from deepvariant_tpu.core.types import CHAR_TO_PROTO_OP

# (length, op char) covering every operation (cigar_test.py:44-73).
TUPLES = [
    (1, "M"), (2, "I"), (3, "D"), (4, "N"), (5, "S"),
    (6, "H"), (7, "P"), (8, "="), (9, "X"),
]


def _units(pairs):
    return [(CHAR_TO_PROTO_OP[op], length) for length, op in pairs]


@pytest.mark.parametrize("pairs", list(
    itertools.product(TUPLES, repeat=2)
))
def test_format_parse_roundtrip_two(pairs):
    s = "".join(f"{l}{op}" for l, op in pairs)
    units = _units(pairs)
    assert cigar.format_cigar(units) == s
    assert cigar.parse_cigar_string(s) == units


def test_format_parse_roundtrip_three_sample():
    # Spot-check the 3-repeat product space on a rotating subset
    # (the full 9^3 grid adds runtime without new coverage).
    for pairs in itertools.islice(
        itertools.product(TUPLES, repeat=3), 0, 729, 7
    ):
        s = "".join(f"{l}{op}" for l, op in pairs)
        assert cigar.parse_cigar_string(s) == _units(pairs)


@pytest.mark.parametrize("cigar_str,expected", [
    ("10M", 10),
    ("10=", 10),
    ("10X", 10),
    ("10M2I3M", 13),
    ("10M2D3M", 15),
    ("10M2N3M", 15),
    ("1S10M2D3M", 15),
    ("1S10M2D3M1S", 15),
    ("1S10M2D3M1S5H", 15),
    ("8H1S10M2D3M1S5H", 15),
    ("8H1S10M2N3M1S5H", 15),
])
def test_alignment_length(cigar_str, expected):
    units = cigar.parse_cigar_string(cigar_str)
    assert cigar.ref_span(units) == expected


@pytest.mark.parametrize("bad", [
    "",
    "12",
    "12m",
    "12?",
    "M12",
    "12M1",
    "12MI",
    "12M-1I",
    "12.0M",
    "-1M",
    "0M",
    "M",
    "4m",
    "9223372036854775808M",
])
def test_parse_detects_bad_inputs(bad):
    with pytest.raises(ValueError):
        cigar.parse_cigar_string(bad)

"""Port of nucleus util/sequence_utils_test.py (:45-103):
reverse-complement tables across alphabet strictness levels,
unknown-base rejection, and base-set/dict consistency."""

import pytest

from deepvariant_tpu.core import sequence_utils as su


@pytest.mark.parametrize("seq,expected,complement_dict", [
    ("", "", None),
    ("A", "T", None),
    ("T", "A", None),
    ("C", "G", None),
    ("G", "C", None),
    ("GGGCAGATT", "AATCTGCCC", None),
    ("GGGCAGANN", "NNTCTGCCC", su.DNA_COMPLEMENT_UPPER),
    ("accgt", "acggt", su.DNA_COMPLEMENT),
    ("ATCGRYSWKMBVDHN", "NDHBVKMWSRYCGAT", su.IUPAC_DNA_COMPLEMENT_UPPER),
    ("ATCGRYSWKMBVDHNatcgryswkmbvdhn",
     "ndhbvkmwsrycgatNDHBVKMWSRYCGAT", su.IUPAC_DNA_COMPLEMENT),
])
def test_reverse_complement(seq, expected, complement_dict):
    assert su.reverse_complement(seq, complement_dict) == expected


@pytest.mark.parametrize("seq,complement_dict", [
    ("GGGCAGANN", None),
    ("accgt", None),
    ("ATCGRYSWKMBVDHNatcgryswkmbvdhn", su.IUPAC_DNA_COMPLEMENT_UPPER),
    ("X", su.IUPAC_DNA_COMPLEMENT),
])
def test_bad_reverse_complement(seq, complement_dict):
    with pytest.raises(su.Error, match="Unknown base in"):
        su.reverse_complement(seq, complement_dict)


@pytest.mark.parametrize("bases_set,complement_dict", [
    (su.STRICT_DNA_BASES_UPPER, su.STRICT_DNA_COMPLEMENT_UPPER),
    (su.STRICT_DNA_BASES, su.STRICT_DNA_COMPLEMENT),
    (su.DNA_BASES_UPPER, su.DNA_COMPLEMENT_UPPER),
    (su.DNA_BASES, su.DNA_COMPLEMENT),
])
def test_base_set_definitions(bases_set, complement_dict):
    assert bases_set == frozenset(complement_dict.keys())


def test_gbz_fast_path_matches():
    """io.gbz._revcomp is the bytes fast path of reverse_complement."""
    from deepvariant_tpu.io.gbz import _revcomp

    for seq in ("", "ACGT", "GGGCAGATT", "acgtACGT"):
        assert _revcomp(seq) == su.reverse_complement(
            seq, su.STRICT_DNA_COMPLEMENT
        )

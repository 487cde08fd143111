"""FN-audit categorization (tools/fn_audit.py)."""

import numpy as np

from deepvariant_tpu.core.types import (
    CallVariantsOutput,
    Variant,
    VariantCall,
)
from deepvariant_tpu.tools.fn_audit import audit_fns


def _v(start, ref, alts, gt=None, qual=30.0):
    return Variant(
        reference_name="chr20", start=start, end=start + len(ref),
        reference_bases=ref, alternate_bases=list(alts),
        quality=qual,
        calls=[VariantCall(call_set_name="S", genotype=list(gt))]
        if gt else [],
    )


def _cvo(start, ref, alts, probs):
    return CallVariantsOutput(
        variant=_v(start, ref, alts),
        alt_allele_indices=[0],
        genotype_probabilities=list(probs),
    )


def test_fn_categories():
    truth = [
        _v(100, "A", ["T"], gt=(0, 1)),   # matched -> not an FN
        _v(200, "C", ["G"], gt=(1, 1)),   # called het -> wrong_genotype
        _v(300, "G", ["A"], gt=(0, 1)),   # called C alt -> wrong_allele
        _v(400, "T", ["C"], gt=(0, 1)),   # CVO says hom-ref
        _v(500, "A", ["G"], gt=(0, 1)),   # CVO favored het, dropped
        _v(600, "C", ["T"], gt=(0, 1)),   # never proposed
    ]
    query = [
        _v(100, "A", ["T"], gt=(0, 1)),
        _v(200, "C", ["G"], gt=(0, 1)),
        _v(300, "G", ["C"], gt=(0, 1)),
    ]
    cvos = [
        _cvo(400, "T", ["C"], [0.9, 0.06, 0.04]),
        _cvo(500, "A", ["G"], [0.45, 0.5, 0.05]),
    ]
    rows = audit_fns(truth, query, cvos)
    by_locus = {r["locus"]: r for r in rows}
    assert len(rows) == 5
    assert by_locus["chr20:201"]["category"] == "wrong_genotype"
    assert by_locus["chr20:201"]["called_gt"] == [0, 1]
    assert by_locus["chr20:301"]["category"] == "wrong_allele"
    assert by_locus["chr20:401"]["category"] == "cnn_ref_call"
    assert by_locus["chr20:401"]["cvo_probs"][0] == 0.9
    assert by_locus["chr20:501"]["category"] == "cnn_low_qual"
    assert by_locus["chr20:601"]["category"] == "no_candidate"


def test_indel_normalization_matches_allele():
    # Truth ACG>A deletion; the CVO represents it with extra padding —
    # normalized allele keys must still line up.
    truth = [_v(100, "ACG", ["A"], gt=(0, 1))]
    cvos = [_cvo(100, "ACGT", ["AT"], [0.2, 0.7, 0.1])]
    rows = audit_fns(truth, [], cvos)
    assert rows[0]["category"] == "cnn_low_qual"
    assert rows[0]["type"] == "indel"

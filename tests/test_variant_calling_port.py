"""Port of variant_calling_test.cc's CallVariant corpus
(variant_calling_test.cc:328-858): synthetic per-position allele
counts driven through VerySensitiveCaller.call_position, asserting the
computed variant (ref/alts/end), AD/DP/VAF, and read-support maps."""

import numpy as np
import pytest

from deepvariant_tpu.core.types import Range
from deepvariant_tpu.make_examples.allele_counter import (
    AlleleCounter,
    AlleleCounterOptions,
    DELETION,
    INSERTION,
    REFERENCE,
    ReadAlleleRecord,
    SOFT_CLIP,
    SUBSTITUTION,
)
from deepvariant_tpu.make_examples.variant_caller import (
    NO_ALT_ALLELE,
    SUPPORTING_UNCALLED_ALLELE,
    VariantCallerOptions,
    VerySensitiveCaller,
)

CHR = "chr1"
START = 10


def make_options(min_count=0, min_fraction=0.0,
                 fraction_ref_sites=0.0, **extra):
    return VariantCallerOptions(
        min_count_snps=min_count,
        min_count_indels=min_count,
        min_fraction_snps=min_fraction,
        min_fraction_indels=min_fraction,
        fraction_reference_sites_to_emit=fraction_ref_sites,
        sample_name="sample_name",
        p_error=0.01,
        max_gq=50,
        gq_resolution=1,
        ploidy=2,
        **extra,
    )


def construct_counter(ref_base, alleles):
    """ConstructAlleleCount analog (variant_calling_test.cc:271-295):
    REFERENCE alleles add to the ref-supporting count; others become
    one ReadAlleleRecord per supporting read. Read ids follow the
    fixture's running counter (read_1 == id 0)."""
    ref = np.frombuffer(ref_base.encode(), np.uint8)
    ac = AlleleCounter(
        ref, Range(CHR, START, START + 1), AlleleCounterOptions(),
    )
    rid = 0
    pc = ac._pc(0)
    for bases, atype, count in alleles:
        if atype == REFERENCE:
            ac.ref_count[0] += count
            for _ in range(count):
                pc.ref_supporting_read_ids.append(rid)
                rid += 1
        else:
            for _ in range(count):
                pc.read_alleles[rid] = ReadAlleleRecord(
                    read_idx=rid, bases=bases, type=atype,
                    is_low_quality=False, mapping_quality=60,
                    avg_base_quality=30, is_reverse_strand=False,
                )
                rid += 1
    return ac


def call(ref_base, caller, alleles):
    return caller.call_position(construct_counter(ref_base, alleles), 0)


def check_variant(dv_call, ref_bases, alts, ad=None, dp=None):
    v = dv_call.variant
    assert v.reference_bases == ref_bases
    assert v.alternate_bases == list(alts)
    assert v.start == START
    assert v.end == START + len(ref_bases)
    c = v.calls[0]
    assert c.call_set_name == "sample_name"
    assert c.genotype == [-1, -1]
    if ad is not None:
        if dp is None:
            dp = sum(ad)
        assert c.info["AD"] == list(ad)
        assert c.info["DP"] == [dp]
        assert c.info["VAF"] == pytest.approx(
            [x / dp for x in ad[1:]]
        )
    elif dp is not None:
        assert c.info["DP"] == [dp]


@pytest.mark.parametrize("count", [0, 1, 10, 100])
@pytest.mark.parametrize("ref", ["A", "C", "G", "T"])
def test_no_variant(count, ref):
    caller = VerySensitiveCaller(make_options(3))
    assert call(ref, caller, [(ref, REFERENCE, count)]) is None


@pytest.mark.parametrize("count", [0, 1, 10, 100])
def test_no_variant_from_softclips(count):
    caller = VerySensitiveCaller(make_options(3))
    assert call("A", caller, [("ACCCCC", SOFT_CLIP, count)]) is None


@pytest.mark.parametrize("count", [10, 100])
def test_snp(count):
    caller = VerySensitiveCaller(make_options(3))
    for ref in "ACGT":
        for alt in "ACGT":
            if alt == ref:
                continue
            got = call(ref, caller, [(alt, SUBSTITUTION, count)])
            check_variant(got, ref, [alt], ad=[0, count])
            got = call(ref, caller, [
                (alt, SUBSTITUTION, count), (ref, REFERENCE, count),
            ])
            check_variant(got, ref, [alt], ad=[count, count])


def test_non_canonical_base():
    caller = VerySensitiveCaller(make_options(3))
    alleles = [("C", SUBSTITUTION, 100)]
    check_variant(call("A", caller, alleles), "A", ["C"], ad=[0, 100])
    assert call("N", caller, alleles) is None
    assert call("R", caller, alleles) is None


def test_min_count1():
    count = 10
    alleles = [("C", SUBSTITUTION, count)]
    assert call(
        "A", VerySensitiveCaller(make_options(count + 1)), alleles
    ) is None
    check_variant(
        call("A", VerySensitiveCaller(make_options(count)), alleles),
        "A", ["C"], ad=[0, count],
    )
    check_variant(
        call("A", VerySensitiveCaller(make_options(count - 1)), alleles),
        "A", ["C"], ad=[0, count],
    )


def test_min_count2():
    count = 10
    caller = VerySensitiveCaller(make_options(count))
    got = call("A", caller, [
        ("C", SUBSTITUTION, count), ("G", SUBSTITUTION, count - 1),
    ])
    check_variant(got, "A", ["C"], ad=[0, count], dp=2 * count - 1)
    got = call("A", caller, [
        ("C", SUBSTITUTION, count), ("G", SUBSTITUTION, count),
    ])
    check_variant(got, "A", ["C", "G"], ad=[0, count, count])
    assert call("A", caller, [
        ("C", SUBSTITUTION, count - 1), ("G", SUBSTITUTION, count - 1),
    ]) is None


def test_min_fraction1():
    count = 10
    caller = VerySensitiveCaller(make_options(count, 0.1))
    check_variant(
        call("A", caller, [("C", SUBSTITUTION, count)]),
        "A", ["C"], ad=[0, count],
    )
    check_variant(
        call("A", caller, [
            ("A", REFERENCE, count), ("C", SUBSTITUTION, count),
        ]),
        "A", ["C"], ad=[count, count],
    )
    assert call("A", caller, [
        ("A", REFERENCE, count * 100), ("C", SUBSTITUTION, count),
    ]) is None
    check_variant(
        call("A", caller, [
            ("A", REFERENCE, count), ("C", SUBSTITUTION, count * 100),
        ]),
        "A", ["C"], ad=[count, 100 * count],
    )


def test_min_fraction_multiallelic():
    count = 10
    caller = VerySensitiveCaller(make_options(count, 0.1))
    check_variant(
        call("A", caller, [
            ("C", SUBSTITUTION, count), ("G", SUBSTITUTION, count),
        ]),
        "A", ["C", "G"], ad=[0, count, count],
    )
    check_variant(
        call("A", caller, [
            ("C", SUBSTITUTION, count * 100), ("G", SUBSTITUTION, count),
        ]),
        "A", ["C"], ad=[0, count * 100], dp=count * 101,
    )
    check_variant(
        call("A", caller, [
            ("C", SUBSTITUTION, count), ("G", SUBSTITUTION, count * 100),
        ]),
        "A", ["G"], ad=[0, count * 100], dp=count * 101,
    )
    assert call("A", caller, [
        ("A", REFERENCE, count * 100),
        ("C", SUBSTITUTION, count), ("G", SUBSTITUTION, count),
    ]) is None


def test_min_snp_indel_separately():
    caller = VerySensitiveCaller(VariantCallerOptions(
        min_count_snps=5, min_count_indels=10,
        min_fraction_snps=0.1, min_fraction_indels=0.5,
        sample_name="sample_name", ploidy=2,
    ))
    # min_count: 8 passes SNPs, not indels.
    check_variant(
        call("A", caller, [
            ("A", REFERENCE, 8), ("C", SUBSTITUTION, 8),
        ]),
        "A", ["C"], ad=[8, 8],
    )
    assert call("A", caller, [
        ("A", REFERENCE, 8), ("AC", INSERTION, 8),
    ]) is None
    check_variant(
        call("A", caller, [
            ("A", REFERENCE, 8), ("AC", INSERTION, 10),
        ]),
        "A", ["AC"], ad=[8, 10],
    )
    assert call("A", caller, [
        ("A", REFERENCE, 8), ("AC", DELETION, 8),
    ]) is None
    check_variant(
        call("A", caller, [
            ("A", REFERENCE, 8), ("AC", DELETION, 10),
        ]),
        "AC", ["A"], ad=[8, 10],
    )
    # min_fraction: 20% passes SNPs, not indels (indels need 50%).
    check_variant(
        call("A", caller, [
            ("A", REFERENCE, 80), ("C", SUBSTITUTION, 20),
        ]),
        "A", ["C"], ad=[80, 20],
    )
    assert call("A", caller, [
        ("A", REFERENCE, 80), ("AC", INSERTION, 20),
    ]) is None
    check_variant(
        call("A", caller, [
            ("A", REFERENCE, 80), ("AC", INSERTION, 80),
        ]),
        "A", ["AC"], ad=[80, 80],
    )
    assert call("A", caller, [
        ("A", REFERENCE, 80), ("AC", DELETION, 20),
    ]) is None
    check_variant(
        call("A", caller, [
            ("A", REFERENCE, 80), ("AC", DELETION, 80),
        ]),
        "AC", ["A"], ad=[80, 80],
    )


def test_multiallelic_snp():
    count = 10
    got = call("A", VerySensitiveCaller(make_options(count)), [
        ("C", SUBSTITUTION, count), ("G", SUBSTITUTION, count),
    ])
    check_variant(got, "A", ["C", "G"], ad=[0, count, count])


@pytest.mark.parametrize("alt_bases", ["AC", "ACCC", "ACCCCCCCCC"])
def test_biallelic_deletion(alt_bases):
    count = 10
    got = call("A", VerySensitiveCaller(make_options(count)),
               [(alt_bases, DELETION, count)])
    check_variant(got, alt_bases, ["A"], ad=[0, count])


@pytest.mark.parametrize("alt_bases", ["AC", "ACCC", "ACCCCCCCCC"])
def test_biallelic_insertion(alt_bases):
    count = 10
    got = call("A", VerySensitiveCaller(make_options(count)),
               [(alt_bases, INSERTION, count)])
    check_variant(got, "A", [alt_bases], ad=[0, count])


def test_deletion_insertion():
    count = 10
    got = call("A", VerySensitiveCaller(make_options(count)), [
        ("ACCC", INSERTION, count), ("ATGC", DELETION, count + 1),
    ])
    check_variant(got, "ATGC", ["A", "ACCCTGC"],
                  ad=[0, count + 1, count])


def test_two_deletions():
    count = 10
    got = call("A", VerySensitiveCaller(make_options(count)), [
        ("AT", DELETION, count), ("ATGC", DELETION, count + 1),
    ])
    check_variant(got, "ATGC", ["A", "AGC"], ad=[0, count + 1, count])


def test_two_insertions():
    count = 10
    got = call("A", VerySensitiveCaller(make_options(count)), [
        ("AT", INSERTION, count), ("ATGC", INSERTION, count + 1),
    ])
    check_variant(got, "A", ["AT", "ATGC"], ad=[0, count, count + 1])


def test_snp_deletion():
    count = 10
    got = call("A", VerySensitiveCaller(make_options(count)), [
        ("C", SUBSTITUTION, count), ("ATGC", DELETION, count + 1),
    ])
    check_variant(got, "ATGC", ["A", "CTGC"], ad=[0, count + 1, count])


def test_deletion_with_non_ref_anchor():
    count = 10
    got = call("T", VerySensitiveCaller(make_options(count)),
               [("AA", DELETION, count)])
    check_variant(got, "TA", ["A"], ad=[0, count])


def test_insertion_with_non_ref_anchor():
    count = 10
    got = call("T", VerySensitiveCaller(make_options(count)),
               [("AA", INSERTION, count)])
    check_variant(got, "T", ["AA"], ad=[0, count])


def test_deletion_with_non_ref_anchor2():
    count = 10
    got = call("T", VerySensitiveCaller(make_options(count)), [
        ("AA", DELETION, count), ("TA", DELETION, count + 1),
    ])
    check_variant(got, "TA", ["A", "T"], ad=[0, count, count + 1])


def test_snp_insertion():
    count = 10
    got = call("A", VerySensitiveCaller(make_options(count)), [
        ("C", SUBSTITUTION, count), ("ATGC", INSERTION, count + 1),
    ])
    check_variant(got, "A", ["ATGC", "C"], ad=[0, count + 1, count])


def test_kitchen_sink():
    count = 10
    got = call("A", VerySensitiveCaller(make_options(count)), [
        ("C", SUBSTITUTION, count),
        ("AA", INSERTION, count + 1),
        ("ACAC", INSERTION, count + 2),
        ("ATGC", DELETION, count + 3),
        ("AT", DELETION, count + 4),
    ])
    check_variant(
        got, "ATGC", ["A", "AATGC", "ACACTGC", "AGC", "CTGC"],
        ad=[0, count + 3, count + 1, count + 2, count + 4, count],
    )


def test_read_support():
    count = 5
    caller = VerySensitiveCaller(make_options(count, 0.1))
    got = call("A", caller, [
        ("A", REFERENCE, count),
        ("ACT", INSERTION, count),
        ("ATG", DELETION, count + 1),
        ("G", SUBSTITUTION, count - 1),
    ])
    check_variant(got, "ATG", ["A", "ACTTG"],
                  ad=[count, count + 1, count], dp=4 * count)
    assert set(got.allele_support) == {
        "A", "ACTTG", SUPPORTING_UNCALLED_ALLELE
    }
    # Fixture read ids: ref reads 0-4, insertion 5-9, deletion 10-15,
    # alt3 (below threshold -> uncalled) 16-19.
    assert sorted(got.allele_support["ACTTG"]) == [5, 6, 7, 8, 9]
    assert sorted(got.allele_support["A"]) == [10, 11, 12, 13, 14, 15]
    assert sorted(
        got.allele_support[SUPPORTING_UNCALLED_ALLELE]
    ) == [16, 17, 18, 19]


def test_ref_sites():
    count = 5
    caller = VerySensitiveCaller(
        make_options(count, 0.1, fraction_ref_sites=1.0)
    )
    got = call("A", caller, [
        ("A", REFERENCE, count), ("C", SUBSTITUTION, 1),
    ])
    v = got.variant
    assert v.reference_bases == "A"
    assert v.alternate_bases == [NO_ALT_ALLELE]
    assert v.calls[0].info["DP"] == [count + 1]
    assert got.allele_support[SUPPORTING_UNCALLED_ALLELE] == [count]


def test_ref_sites_fraction():
    fraction = 0.6
    count = 5
    caller = VerySensitiveCaller(
        make_options(count, 0.1, fraction_ref_sites=fraction)
    )
    tries = 10000
    successes = 0
    for _ in range(tries):
        got = call("A", caller, [("A", REFERENCE, count)])
        if got is not None:
            successes += 1
    assert successes / tries == pytest.approx(fraction, abs=0.02)

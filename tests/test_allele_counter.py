import numpy as np
import pytest

from deepvariant_tpu.core.cigar import parse_cigar_string
from deepvariant_tpu.core.types import Range, Read
from deepvariant_tpu.io.bam import ReadBatch
from deepvariant_tpu.make_examples.allele_counter import (
    AlleleCounter,
    AlleleCounterOptions,
    DELETION,
    INSERTION,
    SOFT_CLIP,
    SUBSTITUTION,
)
from deepvariant_tpu.make_examples.variant_caller import (
    VariantCallerOptions,
    VerySensitiveCaller,
    build_allele_map,
    calc_ref_bases,
)
from deepvariant_tpu.make_examples.allele_counter import Allele


CHROM = "chr1"
#           0123456789...
REF = "ACGTACGTACGTACGTACGT"


def make_read(start, bases, cigar, name="r", qual=30, mapq=60):
    return Read(
        fragment_name=name,
        aligned_sequence=bases,
        aligned_quality=bytes([qual] * len(bases)),
        reference_name=CHROM,
        position=start,
        mapping_quality=mapq,
        cigar=parse_cigar_string(cigar),
    )


def counter_for(reads, start=0, end=len(REF), **opts):
    ref = np.frombuffer(REF.encode(), np.uint8)[start:end]
    ac = AlleleCounter(
        ref, Range(CHROM, start, end), AlleleCounterOptions(**opts),
        ref_prev_base=REF[start - 1] if start > 0 else "N",
    )
    batch = ReadBatch.from_reads(reads, [CHROM])
    ac.add_batch(batch)
    return ac, batch


def test_reference_matches():
    reads = [make_read(0, REF[0:10], "10M", name=f"r{i}") for i in range(3)]
    ac, _ = counter_for(reads)
    np.testing.assert_array_equal(ac.ref_count[:10], 3)
    np.testing.assert_array_equal(ac.ref_count[10:], 0)
    assert ac.positions_with_alleles() == []
    assert ac.total_allele_count(5) == 3


def test_substitution():
    seq = "AC" + "T" + REF[3:10]  # G->T at position 2
    reads = [make_read(0, seq, "10M", name=f"r{i}") for i in range(4)]
    reads.append(make_read(0, REF[0:10], "10M", name="ref_read"))
    ac, _ = counter_for(reads)
    assert ac.ref_count[2] == 1
    alleles = ac.sum_allele_counts(2)
    assert len(alleles) == 1
    a = alleles[0]
    assert a.bases == "T" and a.type == SUBSTITUTION and a.count == 4
    assert ac.total_allele_count(2) == 5


def test_low_quality_base_excluded():
    r = make_read(0, "AC" + "T" + REF[3:10], "10M", qual=5)
    ac, _ = counter_for([r])
    # Low-quality: allele recorded but flagged; excluded from counts.
    assert ac.sum_allele_counts(2) == []
    assert ac.sum_allele_counts(2, include_low_quality=True)[0].count == 1
    assert ac.ref_count[2] == 0
    assert ac.total_allele_count(2) == 0


def test_insertion_anchor():
    # 5M2I5M starting at 0: insertion anchored at interval position 4.
    seq = REF[0:5] + "TT" + REF[5:10]
    ac, _ = counter_for([make_read(0, seq, "5M2I5M", name=f"i{i}")
                         for i in range(2)])
    alleles = ac.sum_allele_counts(4)
    assert len(alleles) == 1
    a = alleles[0]
    assert a.type == INSERTION
    assert a.bases == REF[4] + "TT"
    assert a.count == 2
    # The anchor match base is superseded: ref_count[4] stays 0.
    assert ac.ref_count[4] == 0
    assert ac.ref_count[3] == 2 and ac.ref_count[5] == 2


def test_deletion_anchor():
    # 5M3D5M: deletion of ref[5:8] anchored at position 4.
    seq = REF[0:5] + REF[8:13]
    ac, _ = counter_for([make_read(0, seq, "5M3D5M", name=f"d{i}")
                         for i in range(2)])
    alleles = ac.sum_allele_counts(4)
    assert len(alleles) == 1
    a = alleles[0]
    assert a.type == DELETION
    assert a.bases == REF[4] + REF[5:8]
    assert ac.ref_count[4] == 0
    # Deleted positions have no ref support from these reads.
    assert ac.ref_count[5] == 0 and ac.ref_count[7] == 0
    assert ac.ref_count[8] == 2


def test_soft_clip_allele():
    # 3S7M at position 3: clip anchored at interval position 2.
    seq = "TTT" + REF[3:10]
    ac, _ = counter_for([make_read(3, seq, "3S7M")])
    alleles = ac.sum_allele_counts(2)
    assert len(alleles) == 1
    assert alleles[0].type == SOFT_CLIP
    assert alleles[0].bases == REF[2] + "TTT"


def test_insertion_at_read_start_uses_ref_prev_base():
    # Read starts with insertion at position 5; prev base from reference.
    seq = "TT" + REF[5:12]
    ac, _ = counter_for([make_read(5, seq, "2I7M")])
    alleles = ac.sum_allele_counts(4)
    assert len(alleles) == 1
    assert alleles[0].bases == REF[4] + "TT"
    assert alleles[0].type == INSERTION


def test_mapq_filter():
    reads = [make_read(0, REF[:10], "10M", mapq=0)]
    ac, _ = counter_for(reads)
    assert ac.n_reads_counted == 0
    np.testing.assert_array_equal(ac.ref_count, 0)


def test_reads_overhanging_interval():
    # Read extends beyond both interval edges; only in-window counted.
    ac, _ = counter_for([make_read(2, REF[2:18], "16M")], start=5, end=10)
    np.testing.assert_array_equal(ac.ref_count, 1)


# ---------------------------------------------------------------------------
# VerySensitiveCaller
# ---------------------------------------------------------------------------

def test_calc_ref_bases_and_allele_map():
    # The documented example (variant_calling_multisample.cc:208-222):
    # ref window ACGT; alleles: "C" SNP, "ATTT" INS, "ACGT" DEL.
    snp = Allele("C", SUBSTITUTION, 5, [])
    ins = Allele("ATTT", INSERTION, 5, [])
    dele = Allele("ACGT", DELETION, 5, [])
    ref_bases = calc_ref_bases("A", [snp, ins, dele])
    assert ref_bases == "ACGT"
    amap = dict(
        (a.bases, alt) for a, alt in build_allele_map(
            [snp, ins, dele], ref_bases
        )
    )
    assert amap == {"C": "CCGT", "ATTT": "ATTTCGT", "ACGT": "A"}


def test_caller_snp_candidate():
    seq = "AC" + "T" + REF[3:10]
    reads = [make_read(0, seq, "10M", name=f"r{i}") for i in range(4)]
    reads += [make_read(0, REF[0:10], "10M", name=f"ref{i}")
              for i in range(6)]
    ac, _ = counter_for(reads)
    caller = VerySensitiveCaller()
    calls = caller.calls_in_region(ac)
    assert len(calls) == 1
    v = calls[0].variant
    assert (v.reference_name, v.start, v.end) == (CHROM, 2, 3)
    assert v.reference_bases == "G"
    assert v.alternate_bases == ["T"]
    call = v.calls[0]
    assert call.genotype == [-1, -1]
    assert call.info["DP"] == [10]
    assert call.info["AD"] == [6, 4]
    assert call.info["VAF"] == pytest.approx([0.4])
    assert sorted(calls[0].allele_support["T"]) == [0, 1, 2, 3]


def test_caller_threshold_rejects():
    # 1 alt read of 10 -> fraction 0.1 < 0.12 -> no candidate.
    seq = "AC" + "T" + REF[3:10]
    reads = [make_read(0, seq, "10M", name="alt")]
    reads += [make_read(0, REF[0:10], "10M", name=f"ref{i}")
              for i in range(9)]
    ac, _ = counter_for(reads)
    assert VerySensitiveCaller().calls_in_region(ac) == []
    # 2 of 10 passes (0.2 >= 0.12, count 2 >= 2).
    reads.append(make_read(0, seq, "10M", name="alt2"))
    ac, _ = counter_for(reads)
    assert len(VerySensitiveCaller().calls_in_region(ac)) == 1


def test_caller_indel_fraction_threshold():
    # Indels pass at 0.06: 2 alt of 20 = 0.1 passes; snp would need 0.12.
    seq = REF[0:5] + "TT" + REF[5:10]
    reads = [make_read(0, seq, "5M2I5M", name=f"a{i}") for i in range(2)]
    reads += [make_read(0, REF[0:10], "10M", name=f"ref{i}")
              for i in range(18)]
    ac, _ = counter_for(reads)
    calls = VerySensitiveCaller().calls_in_region(ac)
    assert len(calls) == 1
    v = calls[0].variant
    assert v.start == 4
    assert v.reference_bases == REF[4]
    assert v.alternate_bases == [REF[4] + "TT"]


def test_caller_deletion_variant():
    seq = REF[0:5] + REF[8:13]
    reads = [make_read(0, seq, "5M3D5M", name=f"d{i}") for i in range(3)]
    reads += [make_read(0, REF[0:13], "13M", name=f"ref{i}")
              for i in range(3)]
    ac, _ = counter_for(reads)
    calls = VerySensitiveCaller().calls_in_region(ac)
    assert len(calls) == 1
    v = calls[0].variant
    assert v.start == 4
    assert v.reference_bases == REF[4:8]
    assert v.alternate_bases == [REF[4]]
    assert v.end == 8


def test_caller_multiallelic_sorted_alts():
    # Two different SNP alleles at same position.
    s1 = "AC" + "T" + REF[3:10]
    s2 = "AC" + "A" + REF[3:10]
    reads = [make_read(0, s1, "10M", name=f"t{i}") for i in range(3)]
    reads += [make_read(0, s2, "10M", name=f"a{i}") for i in range(3)]
    reads += [make_read(0, REF[0:10], "10M", name=f"ref{i}")
              for i in range(4)]
    ac, _ = counter_for(reads)
    calls = VerySensitiveCaller().calls_in_region(ac)
    assert len(calls) == 1
    v = calls[0].variant
    assert v.alternate_bases == ["A", "T"]  # sorted
    assert v.calls[0].info["AD"] == [4, 3, 3]


# ---------------------------------------------------------------------------
# gVCF
# ---------------------------------------------------------------------------

def test_reference_confidence_clean_site():
    caller = VerySensitiveCaller()
    gq, probs = caller.ref_confidence(20, 20)
    assert gq == 50  # capped at max_gq
    assert probs[0] == max(probs)
    # Contradictory site: mostly alt reads.
    gq_bad, probs_bad = caller.ref_confidence(2, 20)
    assert gq_bad == 0
    assert probs_bad[2] == max(probs_bad)


def test_reference_confidence_no_coverage():
    caller = VerySensitiveCaller()
    gq, probs = caller.ref_confidence(0, 0)
    np.testing.assert_allclose(10.0 ** probs, [1 / 3] * 3, rtol=1e-9)
    gq_h, probs_h = caller.ref_confidence(0, 0, is_haploid=True)
    assert 10.0 ** probs_h[1] == pytest.approx(0.0, abs=1e-12)


def test_gvcf_blocks():
    # Uniform clean coverage -> a single gVCF block covering the interval.
    reads = [make_read(0, REF, "20M", name=f"r{i}") for i in range(20)]
    ac, _ = counter_for(reads)
    caller = VerySensitiveCaller()
    gvcfs = list(caller.make_gvcfs(ac))
    assert len(gvcfs) == 1
    g = gvcfs[0]
    assert (g.start, g.end) == (0, 20)
    assert g.alternate_bases == ["<*>"]
    assert g.calls[0].genotype == [0, 0]
    assert g.calls[0].info["GQ"] == [50]
    assert g.calls[0].info["MIN_DP"] == [20]


def test_gvcf_splits_on_gq_change():
    # Half the interval has depth 20, half has depth 1 -> >=2 blocks.
    reads = [make_read(0, REF[:10], "10M", name=f"r{i}") for i in range(20)]
    reads += [make_read(10, REF[10:20], "10M", name="solo")]
    ac, _ = counter_for(reads)
    gvcfs = list(VerySensitiveCaller().make_gvcfs(ac))
    assert len(gvcfs) >= 2
    assert gvcfs[0].start == 0
    assert gvcfs[-1].end == 20
    # Blocks tile the interval without overlap.
    spans = [(g.start, g.end) for g in gvcfs]
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2


def test_gvcf_quantization():
    from deepvariant_tpu.make_examples.variant_caller import _quantize_gq

    assert _quantize_gq(0, 5) == 0
    assert _quantize_gq(1, 5) == 1
    assert _quantize_gq(5, 5) == 1
    assert _quantize_gq(6, 5) == 6
    assert _quantize_gq(50, 5) == 46


class TestReferenceConfidenceCache:
    def test_vectorized_table_matches_scalar_calc(self):
        """The vectorized GQ-cache build (_calc_row) must stay
        bit-identical to the scalar _calc it replaced."""
        import numpy as np

        from deepvariant_tpu.make_examples.variant_caller import (
            ReferenceConfidence,
            VariantCallerOptions,
        )

        rc = ReferenceConfidence(VariantCallerOptions(),
                                 max_cache_coverage=40)
        for is_haploid in (False, True):
            for n_total in range(41):
                for n_ref in range(n_total + 1):
                    gq_v, probs_v = rc._cache[is_haploid][n_total][n_ref]
                    gq_s, probs_s = rc._calc(n_ref, n_total, is_haploid)
                    assert gq_v == gq_s
                    assert np.array_equal(probs_v, probs_s)

"""DirectPhasing tests (scenarios from reference direct_phasing_test.cc)."""

import pytest

from deepvariant_tpu.core.types import Variant
from deepvariant_tpu.make_examples.variant_caller import (
    DeepVariantCall,
    SUPPORTING_UNCALLED_ALLELE,
)
from deepvariant_tpu.phasing.direct_phasing import (
    DirectPhasing,
    DirectPhasingOptions,
    PhasedVariant,
)


def snp(start, ref, alt_support, ref_support=()):
    """Build a het SNP candidate. alt_support: {alt: [read ids]}."""
    alts = sorted(alt_support)
    return DeepVariantCall(
        variant=Variant(
            reference_name="chr1", start=start, end=start + 1,
            reference_bases=ref, alternate_bases=alts,
        ),
        allele_support={a: list(r) for a, r in alt_support.items()},
        ref_support=list(ref_support),
    )


class TestDirectPhasing:
    def test_two_snps_two_haplotypes(self):
        # Reads 0-3 carry alt at both sites; reads 4-7 are ref at both.
        candidates = [
            snp(100, "A", {"C": [0, 1, 2, 3]}, ref_support=[4, 5, 6, 7]),
            snp(200, "G", {"T": [0, 1, 2, 3]}, ref_support=[4, 5, 6, 7]),
        ]
        phases = DirectPhasing().phase_reads(candidates, 8)
        assert len(set(phases[:4])) == 1 and phases[0] in (1, 2)
        assert len(set(phases[4:])) == 1 and phases[4] in (1, 2)
        assert phases[0] != phases[4]

    def test_phased_variants_reported(self):
        candidates = [
            snp(100, "A", {"C": [0, 1, 2]}, ref_support=[3, 4, 5]),
            snp(200, "G", {"T": [0, 1, 2]}, ref_support=[3, 4, 5]),
        ]
        dp = DirectPhasing()
        dp.phase_reads(candidates, 6)
        pv = dp.phased_variants()
        assert len(pv) == 2
        for v in pv:
            assert {v.phase_1_bases, v.phase_2_bases} == {"C", "REF"} or \
                {v.phase_1_bases, v.phase_2_bases} == {"T", "REF"}

    def test_switched_supports(self):
        # Site 1: reads 0-2 alt, 3-5 ref. Site 2: reads 3-5 alt, 0-2 ref.
        candidates = [
            snp(100, "A", {"C": [0, 1, 2]}, ref_support=[3, 4, 5]),
            snp(200, "G", {"T": [3, 4, 5]}, ref_support=[0, 1, 2]),
        ]
        phases = DirectPhasing().phase_reads(candidates, 6)
        assert phases[0] == phases[1] == phases[2]
        assert phases[3] == phases[4] == phases[5]
        assert phases[0] != phases[3] and phases[0] != 0

    def test_indel_candidates_filtered(self):
        # An indel allele (length != 1) is not phasable.
        indel = DeepVariantCall(
            variant=Variant(
                reference_name="chr1", start=150, end=151,
                reference_bases="A", alternate_bases=["ATT"],
            ),
            allele_support={"ATT": [0, 1]},
            ref_support=[2, 3, 4],
        )
        candidates = [
            snp(100, "A", {"C": [0, 1, 2]}, ref_support=[3, 4, 5]),
            indel,
            snp(200, "G", {"T": [0, 1, 2]}, ref_support=[3, 4, 5]),
        ]
        dp = DirectPhasing()
        phases = dp.phase_reads(candidates, 6)
        assert 150 not in dp.positions
        assert phases[0] != phases[3] and phases[0] != 0

    def test_homozygous_candidate_filtered(self):
        # Single allele, almost no ref support -> homozygous, filtered.
        hom = snp(150, "A", {"C": [0, 1, 2, 3, 4, 5]}, ref_support=[])
        dp = DirectPhasing()
        dp.phase_reads([hom], 6)
        assert dp.positions == []

    def test_unphasable_reads_get_zero(self):
        candidates = [
            snp(100, "A", {"C": [0, 1, 2]}, ref_support=[3, 4, 5]),
            snp(200, "G", {"T": [0, 1, 2]}, ref_support=[3, 4, 5]),
        ]
        # Read 6 supports nothing.
        phases = DirectPhasing().phase_reads(candidates, 7)
        assert phases[6] == 0

    def test_three_sites_with_noise(self):
        # A read with conflicting support gets the majority phase.
        candidates = [
            snp(100, "A", {"C": [0, 1, 2]}, ref_support=[3, 4, 5]),
            snp(200, "G", {"T": [0, 1, 2, 3]}, ref_support=[4, 5]),
            snp(300, "T", {"A": [0, 1, 2]}, ref_support=[3, 4, 5]),
        ]
        phases = DirectPhasing().phase_reads(candidates, 6)
        # Read 3 has 2 ref alleles + 1 alt -> majority phase = ref phase.
        assert phases[3] == phases[4] == phases[5]
        assert phases[0] == phases[1] == phases[2] != phases[3]

    def test_deterministic(self):
        candidates = [
            snp(100, "A", {"C": [0, 1, 2]}, ref_support=[3, 4, 5]),
            snp(200, "G", {"T": [0, 1, 2]}, ref_support=[3, 4, 5]),
        ]
        runs = [tuple(DirectPhasing().phase_reads(candidates, 6))
                for _ in range(3)]
        assert len(set(runs)) == 1

"""Tumor read phasing from the matched normal's phased variants.

Ported corpus: deepvariant/make_examples_core_test.py
test_assign_phase_from_normal — 4 normal-phased positions (A|C), six
reads supporting the phase-1 allele, one the phase-2 allele, one only
the (unphased) REF — plus threshold edge cases from
_get_phased_genotype_from_counts semantics.
"""

from types import SimpleNamespace

from deepvariant_tpu.core.types import Variant
from deepvariant_tpu.make_examples.core import RegionProcessor
from deepvariant_tpu.make_examples.variant_caller import DeepVariantCall
from deepvariant_tpu.phasing.direct_phasing import PhasedVariant


def _phased_variant(position, p1="A", p2="C"):
    return PhasedVariant(
        position=position, phase_1_bases=p1, phase_2_bases=p2,
        is_first_in_block=False,
    )


def _candidate(start, allele_support, ref_support):
    return DeepVariantCall(
        variant=Variant(
            reference_name="chr1", start=start, end=start + 1,
            reference_bases="G",
            alternate_bases=sorted(allele_support),
        ),
        allele_support=allele_support,
        ref_support=ref_support,
    )


def _assign(candidates, num_reads, phased_variants):
    proc = SimpleNamespace()
    return RegionProcessor.assign_phase_from_normal(
        proc, candidates, num_reads, phased_variants
    )


def test_assign_phase_from_normal():
    phased = [_phased_variant(i * 100) for i in range(4)]
    # Reads 0-5 support 'A' (phase 1), read 6 supports 'C' (phase 2),
    # read 7 is in REF support only.
    candidates = [
        _candidate(
            i * 100,
            {"A": [0, 1, 2, 3, 4, 5], "C": [6]},
            ref_support=[7],
        )
        for i in range(4)
    ]
    assert _assign(candidates, 8, phased) == \
        [1, 1, 1, 1, 1, 1, 2, 0]


def test_positions_without_normal_phase_are_ignored():
    phased = [_phased_variant(0)]
    candidates = [
        _candidate(0, {"A": [0]}, ref_support=[]),
        # No normal phased variant at 500: contributes nothing.
        _candidate(500, {"C": [1]}, ref_support=[]),
    ]
    # One vote is below MIN_DIFF_READS_FOR_ALLELE_PHASE (3): unphased.
    assert _assign(candidates, 2, phased) == [0, 0]


def test_ref_allele_can_carry_a_phase():
    # The normal can phase REF|ALT: reads supporting REF then inherit
    # that phase. Four sites clear the strictly-greater-than-3 vote
    # threshold (_get_phased_genotype_from_counts).
    phased = [_phased_variant(i * 10, p1="REF", p2="T")
              for i in range(4)]
    candidates = [
        _candidate(i * 10, {"T": [1]}, ref_support=[0])
        for i in range(4)
    ]
    assert _assign(candidates, 2, phased) == [1, 2]


def test_conflicting_votes_stay_unphased():
    # Read 0 votes phase 1 at two sites and phase 2 at two sites:
    # equal counts never phase.
    phased = [_phased_variant(i * 10) for i in range(4)]
    candidates = [
        _candidate(0, {"A": [0]}, ref_support=[]),
        _candidate(10, {"A": [0]}, ref_support=[]),
        _candidate(20, {"C": [0]}, ref_support=[]),
        _candidate(30, {"C": [0]}, ref_support=[]),
    ]
    assert _assign(candidates, 1, phased) == [0]


def test_somatic_phasing_end_to_end(testdata_dir, tmp_path):
    """Somatic make_examples with phase_reads + assign_phase_from_normal
    runs the full per-sample phasing path (normal DirectPhasing ->
    tumor inheritance) and still produces examples."""
    import os

    from deepvariant_tpu.make_examples.core import MakeExamplesOptions
    from deepvariant_tpu.make_examples.multisample import (
        make_multisample_examples_runner,
        somatic_samples,
    )

    options = MakeExamplesOptions(
        reads_filename="",
        ref_filename=os.path.join(
            testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ),
        examples_filename=str(tmp_path / "somatic.tfrecord.gz"),
        mode="calling",
        regions=["chr20:10,000,000-10,005,000"],
        realigner_enabled=False,
        phase_reads=True,
        assign_phase_from_normal=True,
        track_ref_reads=True,
    )
    bam = os.path.join(
        testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
    )
    samples = somatic_samples(reads_tumor=bam, reads_normal=bam)
    counts = make_multisample_examples_runner(
        options, samples, main_sample_index=1
    )
    assert counts["examples"] > 0

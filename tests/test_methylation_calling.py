"""Methylation calling output tests: MF/MD per-allele stats
(ComputeMethylationStats, variant_calling_multisample.cc:1499), MT
determination and VCF FORMAT emission."""

import numpy as np
import pytest

from deepvariant_tpu.core.cigar import parse_cigar_string
from deepvariant_tpu.core.types import Range, Read, Variant, VariantCall
from deepvariant_tpu.io.bam import ReadBatch
from deepvariant_tpu.postprocess.genotype import (
    determine_methylation_type,
)

CHROM = "chr1"


class TestDetermineMethylationType:
    def test_thresholds(self):
        assert determine_methylation_type([0.9, 0.95]) == "1/1"
        assert determine_methylation_type([0.1, 0.9]) == "0/1"
        assert determine_methylation_type([0.1, 0.15]) == "0/0"
        assert determine_methylation_type([0.5]) == "0/0"
        assert determine_methylation_type([]) == ""


def _batch(n_reads, pos=100, bases="ACGTACGTAC", reverse=()):
    reads = [
        Read(
            fragment_name=f"r{i}",
            aligned_sequence=bases,
            aligned_quality=bytes([30] * len(bases)),
            reference_name=CHROM,
            position=pos,
            mapping_quality=60,
            cigar=parse_cigar_string(f"{len(bases)}M"),
            reverse_strand=i in reverse,
        )
        for i in range(n_reads)
    ]
    return ReadBatch.from_reads(reads, [CHROM])


class TestMethylationStats:
    def _run(self, batch, candidate):
        from deepvariant_tpu.make_examples.core import (
            MakeExamplesOptions,
            RegionProcessor,
        )

        class P:
            options = MakeExamplesOptions(
                enable_methylation_calling=True
            )
        proc = P()
        RegionProcessor._add_methylation_stats(proc, batch, [candidate])
        return candidate

    def _candidate(self, start=101, ref="C", alts=("T",),
                   allele_support=None, ref_support=()):
        from deepvariant_tpu.make_examples.variant_caller import (
            DeepVariantCall,
        )

        v = Variant(reference_name=CHROM, start=start, end=start + 1,
                    reference_bases=ref, alternate_bases=list(alts),
                    calls=[VariantCall(call_set_name="s")])
        return DeepVariantCall(
            variant=v,
            allele_support=allele_support or {},
            ref_support=list(ref_support),
        )

    def test_mf_md_per_allele(self):
        batch = _batch(4)
        meth = []
        # reads 0,1 methylated at read offset 1 (ref 101); 2,3 not.
        for i in range(4):
            m = np.zeros(10, np.uint8)
            if i < 2:
                m[1] = 220
            meth.append(m)
        batch.meth = meth
        cand = self._candidate(
            ref_support=[0, 1], allele_support={"T": [2, 3]}
        )
        self._run(batch, cand)
        ci = cand.variant.calls[0].info
        assert ci["MF"] == [1.0, 0.0]
        assert ci["MD"] == [2, 0]

    def test_reverse_strand_reads_check_g_position(self):
        batch = _batch(2, reverse={1})
        m0 = np.zeros(10, np.uint8); m0[1] = 220   # fwd: mark at C
        m1 = np.zeros(10, np.uint8); m1[2] = 220   # rev: mark at G
        batch.meth = [m0, m1]
        cand = self._candidate(ref_support=[0, 1])
        self._run(batch, cand)
        assert cand.variant.calls[0].info["MF"] == [1.0, 0.0]

    def test_below_threshold_not_counted(self):
        batch = _batch(1)
        m = np.zeros(10, np.uint8); m[1] = 100  # < 0.5 * 255
        batch.meth = [m]
        cand = self._candidate(ref_support=[0])
        self._run(batch, cand)
        assert "MF" not in cand.variant.calls[0].info

    def test_postprocess_sets_mt(self):
        from deepvariant_tpu.core.types import CallVariantsOutput
        from deepvariant_tpu.postprocess.pipeline import (
            cvos_to_variants,
        )

        v = Variant(reference_name=CHROM, start=100, end=101,
                    reference_bases="C", alternate_bases=["T"],
                    calls=[VariantCall(call_set_name="s")])
        v.calls[0].info["MF"] = [0.9, 0.1]
        v.calls[0].info["MD"] = [9, 1]
        cvo = CallVariantsOutput(
            variant=v, alt_allele_indices=[0],
            genotype_probabilities=[0.05, 0.9, 0.05],
        )
        out = list(cvos_to_variants([cvo], "s"))
        call = out[0].calls[0]
        assert call.info["MT"] == ["0/1"]
        from deepvariant_tpu.io.vcf import format_variant_line

        line = format_variant_line(out[0])
        fmt, sample = line.split("\t")[8:10]
        assert fmt.endswith("MF:MD:MT")
        assert "0.9,0.1" in sample and "9,1" in sample \
            and sample.endswith("0/1")


class TestMethylatedRefSites:
    def _run(self, batch, region, candidates=()):
        from deepvariant_tpu.make_examples.core import (
            MakeExamplesOptions,
            RegionProcessor,
        )

        class FakeRef:
            def query(self, r):
                return "C"

        class P(RegionProcessor):
            def __init__(self):
                self.options = MakeExamplesOptions(
                    enable_methylation_calling=True, sample_name="s"
                )
                self.ref_reader = FakeRef()
                self.bam_reader = None
        proc = P()
        return RegionProcessor._methylated_ref_site_candidates(
            proc, batch, region, list(candidates)
        )

    def test_emits_dot_alt_candidates(self):
        batch = _batch(3)
        meth = []
        for i in range(3):
            m = np.zeros(10, np.uint8)
            if i < 2:
                m[1] = 220   # ref pos 101
            meth.append(m)
        batch.meth = meth
        sites = self._run(batch, Range(CHROM, 100, 120))
        assert len(sites) == 1
        v = sites[0].variant
        assert v.start == 101
        assert v.alternate_bases == ["."]
        assert v.calls[0].genotype == [-1, -1]
        assert v.calls[0].info["MD"] == [2]
        assert sites[0].ref_support == [0, 1]

    def test_variant_positions_excluded(self):
        from deepvariant_tpu.make_examples.variant_caller import (
            DeepVariantCall,
        )

        batch = _batch(2)
        m = np.zeros(10, np.uint8); m[1] = 220
        batch.meth = [m, m.copy()]
        cand = DeepVariantCall(
            variant=Variant(reference_name=CHROM, start=101, end=102,
                            reference_bases="C",
                            alternate_bases=["T"]),
            allele_support={}, ref_support=[],
        )
        sites = self._run(batch, Range(CHROM, 100, 120), [cand])
        assert sites == []

    def test_xy_contigs_excluded(self):
        batch = _batch(2, pos=100)
        m = np.zeros(10, np.uint8); m[1] = 220
        batch.meth = [m, m.copy()]
        # Rebuild batch on chrX.
        from deepvariant_tpu.io.bam import ReadBatch

        reads = [
            Read(
                fragment_name=f"r{i}",
                aligned_sequence="ACGTACGTAC",
                aligned_quality=bytes([30] * 10),
                reference_name="chrX",
                position=100,
                mapping_quality=60,
                cigar=parse_cigar_string("10M"),
            ) for i in range(2)
        ]
        bx = ReadBatch.from_reads(reads, ["chrX"])
        bx.meth = [m, m.copy()]
        assert self._run(bx, Range("chrX", 100, 120)) == []

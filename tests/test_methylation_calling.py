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

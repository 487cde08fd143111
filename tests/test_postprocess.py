"""Postprocess-stage tests: genotype resolution, multiallelic merge,
haplotype conflict resolution, gVCF merge, VCF writing.

Scenarios mirror reference postprocess_variants_test.py / haplotypes_test.py
numerics.
"""

import math

import numpy as np
import pytest

from deepvariant_tpu.core.types import (
    CallVariantsOutput,
    ContigInfo,
    Variant,
    VariantCall,
)
from deepvariant_tpu.io.vcf import (
    VcfReader,
    VcfWriter,
    deepvariant_header,
    format_variant_line,
)
from deepvariant_tpu.postprocess import genotype as gt
from deepvariant_tpu.postprocess import haplotypes
from deepvariant_tpu.postprocess.merge import (
    expected_alt_allele_indices,
    get_alt_alleles_to_remove,
    merge_predictions,
    prune_alleles,
)
from deepvariant_tpu.postprocess.pipeline import (
    cvos_to_variants,
    merge_variants_and_nonvariants,
    postprocess_variants,
    transform_to_gvcf,
    zero_scale_gl,
)


def make_variant(start=10, ref="A", alts=("T",), ad=(5, 5), chrom="chr1"):
    return Variant(
        reference_name=chrom,
        start=start,
        end=start + len(ref),
        reference_bases=ref,
        alternate_bases=list(alts),
        calls=[VariantCall(call_set_name="s1",
                           info={"AD": list(ad), "DP": [sum(ad)]})],
    )


class TestMostLikelyGenotype:
    def test_biallelic(self):
        idx, alleles = gt.most_likely_genotype([0.01, 0.9, 0.09])
        assert idx == 1 and alleles == [0, 1]
        idx, alleles = gt.most_likely_genotype([0.01, 0.09, 0.9])
        assert idx == 2 and alleles == [1, 1]
        idx, alleles = gt.most_likely_genotype([0.9, 0.05, 0.05])
        assert idx == 0 and alleles == [0, 0]

    def test_multiallelic_ordering(self):
        # P=2, N=2: ordering 0/0, 0/1, 1/1, 0/2, 1/2, 2/2
        probs = [0, 0, 0, 0, 1.0, 0]
        idx, alleles = gt.most_likely_genotype(probs, n_alleles=3)
        assert idx == 4 and alleles == [1, 2]


class TestComputeQuals:
    def test_qual_is_phred_of_nonref(self):
        gq, qual = gt.compute_quals([0.01, 0.9, 0.09], 1)
        assert gq == 10  # -10*log10(1-0.9) = 10
        assert qual == pytest.approx(
            -10 * math.log10(0.01), abs=1e-6
        )

    def test_max_confidence_cap(self):
        gq, qual = gt.compute_quals([0.0, 1.0, 0.0], 1)
        # capped at ~99 by _MAX_CONFIDENCE = 1 - 1.25e-10
        assert 98 <= gq <= 100
        assert 98 <= qual <= 100


class TestSimplifyAlleles:
    def test_common_postfix(self):
        assert gt.simplify_alleles("AC", "GC") == ("A", "G")
        assert gt.simplify_alleles("AC", "GT") == ("AC", "GT")
        assert gt.simplify_alleles("CACA", "CA") == ("CAC", "C")


class TestAddCallToVariant:
    def test_het_call(self):
        v = make_variant()
        out = gt.add_call_to_variant(v, [0.01, 0.9, 0.09],
                                     qual_filter=1.0, sample_name="s1")
        call = out.calls[0]
        assert call.genotype == [0, 1]
        assert call.info["GQ"] == [10]
        assert out.filter == ["PASS"]
        assert len(call.genotype_likelihood) == 3

    def test_homref_lowgq_becomes_nocall(self):
        v = make_variant()
        out = gt.add_call_to_variant(v, [0.6, 0.3, 0.1],
                                     qual_filter=1.0, sample_name="s1")
        # GQ of 0.6 ~ 4 < 20 -> ./. NoCall
        assert out.calls[0].genotype == [-1, -1]
        assert out.filter == ["NoCall"]

    def test_no_ad_uncalled(self):
        v = make_variant(ad=(0, 0))
        out = gt.add_call_to_variant(v, [0.01, 0.9, 0.09],
                                     qual_filter=1.0, sample_name="s1")
        assert out.calls[0].genotype == [-1, -1]


class TestMergePredictions:
    def _cvo(self, variant, indices, probs):
        return CallVariantsOutput(
            variant=variant, alt_allele_indices=list(indices),
            genotype_probabilities=list(probs),
        )

    def test_biallelic_passthrough(self):
        v = make_variant()
        merged, probs = merge_predictions([self._cvo(v, [0], [0.1, 0.8, 0.1])])
        assert probs == [0.1, 0.8, 0.1]

    def test_triallelic_min_merge(self):
        v = make_variant(alts=("T", "G"), ad=(4, 3, 3))
        cvos = [
            self._cvo(v, [0], [0.1, 0.8, 0.1]),
            self._cvo(v, [1], [0.2, 0.7, 0.1]),
            self._cvo(v, [0, 1], [0.05, 0.05, 0.9]),
        ]
        merged, probs = merge_predictions(cvos)
        assert len(probs) == 6  # 0/0 0/1 1/1 0/2 1/2 2/2
        assert abs(sum(probs) - 1.0) < 1e-9

    def test_expected_alt_allele_indices(self):
        assert expected_alt_allele_indices(2) == [[0], [0, 1], [1]]

    def test_allele_pruning(self):
        v = make_variant(alts=("T", "G"), ad=(4, 5, 0))
        cvos = [
            self._cvo(v, [0], [0.1, 0.8, 0.1]),     # T looks real
            self._cvo(v, [1], [0.999999, 1e-6, 0]),  # G looks fake
            self._cvo(v, [0, 1], [0.1, 0.8, 0.1]),
        ]
        removed = get_alt_alleles_to_remove(cvos, qual_filter=1.0)
        assert removed == {"G"}
        merged, probs = merge_predictions(cvos, qual_filter=1.0)
        assert merged.alternate_bases == ["T"]
        assert len(probs) == 3

    def test_product_mode(self):
        v = make_variant(alts=("T", "G"), ad=(4, 3, 3))
        cvos = [
            self._cvo(v, [0], [0.1, 0.8, 0.1]),
            self._cvo(v, [1], [0.2, 0.7, 0.1]),
            self._cvo(v, [0, 1], [0.05, 0.05, 0.9]),
        ]
        merged, probs = merge_predictions(
            cvos, multiallelic_mode="product"
        )
        assert len(probs) == 6
        assert abs(sum(probs) - 1.0) < 1e-9

    def test_haploid_contig_correction(self):
        v = make_variant(chrom="chrY")
        _, probs = merge_predictions(
            [self._cvo(v, [0], [0.3, 0.4, 0.3])],
            haploid_contigs={"chrY"},
        )
        # het zeroed, renormalized
        assert probs[1] == 0
        assert abs(sum(probs) - 1.0) < 1e-9


class TestHaplotypeResolution:
    def _variant_with_gl(self, start, end, probs, genotype):
        v = make_variant(start=start, ref="A" * (end - start))
        call = v.calls[0]
        call.genotype = list(genotype)
        call.genotype_likelihood = [
            math.log10(max(p, 1e-10)) for p in probs
        ]
        v.quality = 30
        return v

    def test_docstring_example(self):
        # Het deletion + hom-alt SNP inside it -> both become het.
        indel = self._variant_with_gl(10, 15, [0.01, 0.9, 0.09], [0, 1])
        snp = self._variant_with_gl(12, 13, [0.02, 0.48, 0.5], [1, 1])
        resolved = list(
            haplotypes.maybe_resolve_conflicting_variants([indel, snp])
        )
        assert [v.calls[0].genotype for v in resolved] == [[0, 1], [0, 1]]

    def test_compatible_untouched(self):
        a = self._variant_with_gl(10, 11, [0.01, 0.9, 0.09], [0, 1])
        b = self._variant_with_gl(30, 31, [0.01, 0.09, 0.9], [1, 1])
        resolved = list(
            haplotypes.maybe_resolve_conflicting_variants([a, b])
        )
        assert [v.calls[0].genotype for v in resolved] == [[0, 1], [1, 1]]


class TestGvcfMerge:
    def _refblock(self, start, end):
        v = Variant(
            reference_name="chr1", start=start, end=end,
            reference_bases="A", alternate_bases=["<*>"],
            info={"END": [end]},
            calls=[VariantCall(call_set_name="s1", genotype=[0, 0])],
        )
        return v

    def test_transform_to_gvcf_adds_star_allele(self):
        v = make_variant()
        v.calls[0].genotype_likelihood = [-1.0, -0.1, -2.0]
        out = transform_to_gvcf(v)
        assert out.alternate_bases[-1] == "<*>"
        assert len(out.calls[0].genotype_likelihood) == 6
        assert out.calls[0].info["AD"][-1] == 0

    def test_zero_scale(self):
        v = make_variant()
        v.calls[0].genotype_likelihood = [-3.0, -0.5, -2.0]
        out = zero_scale_gl(v)
        assert max(out.calls[0].genotype_likelihood) == 0.0

    def test_split_ref_block_around_variant(self):
        variant = make_variant(start=15)
        variant.filter = ["PASS"]
        variant.calls[0].genotype_likelihood = [-2, -0.1, -1]
        block = self._refblock(10, 25)
        events = list(
            merge_variants_and_nonvariants(
                [variant], [block], ref_lookup=lambda c, p: "G"
            )
        )
        kinds = [k for k, _ in events]
        assert kinds == ["gvcf", "vcf", "gvcf", "gvcf"]
        first_block = events[0][1]
        assert (first_block.start, first_block.end) == (10, 15)
        tail_block = events[3][1]
        assert (tail_block.start, tail_block.end) == (16, 25)
        assert tail_block.reference_bases == "G"


class TestEndToEndPostprocess:
    def test_cvo_to_vcf(self, tmp_path):
        from deepvariant_tpu.io.tfrecord import TFRecordWriter

        contigs = [ContigInfo(name="chr1", n_bases=1000, pos_in_fasta=0)]
        cvo_path = str(tmp_path / "cvo.tfrecord")
        cvos = []
        for start, probs in [(10, [0.01, 0.9, 0.09]),
                             (50, [0.02, 0.08, 0.9]),
                             (80, [0.999, 0.0005, 0.0005])]:
            v = make_variant(start=start)
            cvos.append(CallVariantsOutput(
                variant=v, alt_allele_indices=[0],
                genotype_probabilities=probs))
        with TFRecordWriter(cvo_path) as w:
            for c in cvos:
                w.write(c.encode())
        out_vcf = str(tmp_path / "out.vcf")
        stats = postprocess_variants(
            cvo_path, out_vcf, contigs, sample_name="s1"
        )
        assert stats["vcf_records"] == 3
        with VcfReader(out_vcf) as reader:
            records = list(reader)
        assert len(records) == 3
        assert records[0].calls[0].genotype == [0, 1]
        assert records[1].calls[0].genotype == [1, 1]
        assert records[0].filter == ["PASS"]
        # hom-ref with high confidence -> RefCall filter
        assert records[2].filter == ["RefCall"]
        assert reader.sample_names == ["s1"]

    def test_vcf_line_format(self):
        v = make_variant(start=9)
        out = gt.add_call_to_variant(v, [0.01, 0.9, 0.09],
                                     qual_filter=1.0, sample_name="s1")
        line = format_variant_line(out)
        cols = line.split("\t")
        assert cols[0] == "chr1" and cols[1] == "10"
        assert cols[3] == "A" and cols[4] == "T"
        assert cols[6] == "PASS"
        assert cols[8].startswith("GT:GQ:DP")
        assert cols[9].startswith("0/1:10:10")


class TestPhasedOutput:
    def test_ps_format_emission(self):
        from deepvariant_tpu.core.types import CallVariantsOutput
        from deepvariant_tpu.postprocess.pipeline import cvos_to_variants

        def phased_cvo(start, alt_ps):
            v = make_variant(start=start)
            v.info["ALT_PS"] = alt_ps
            v.info["PS_CONTIG"] = ["0-chr1:0"]
            return CallVariantsOutput(
                variant=v, alt_allele_indices=[0],
                genotype_probabilities=[0.01, 0.97, 0.02],
            )

        out = list(cvos_to_variants(
            [phased_cvo(10, [1, 2]), phased_cvo(50, [2, 1])], "s1"
        ))
        assert all(v.calls[0].is_phased for v in out)
        # Both share the phase set anchored at the first variant (11).
        assert out[0].calls[0].info["PS"] == [11]
        assert out[1].calls[0].info["PS"] == [11]
        # Phase order: [1,2] keeps 0|1; [2,1] flips to 1|0.
        assert out[0].calls[0].genotype == [0, 1]
        assert out[1].calls[0].genotype == [1, 0]
        # Internal info keys must not leak into the VCF INFO column.
        assert "ALT_PS" not in out[0].info
        from deepvariant_tpu.io.vcf import format_variant_line

        line = format_variant_line(out[1])
        assert "1|0" in line and line.split("\t")[7] == "."


class TestPhaseSetStitching:
    """Cross-region stitching (postprocess_variants.cc StitchPhaseSets)."""

    @staticmethod
    def _cvo(start, region, alt_ps=(1, 2), first=False):
        from deepvariant_tpu.core.types import CallVariantsOutput

        v = make_variant(start=start)
        v.info["ALT_PS"] = list(alt_ps)
        v.info["PS_CONTIG"] = [f"0-{region}"]
        v.info["FIRST_VARIANT_IN_BLOCK"] = [first]
        return CallVariantsOutput(
            variant=v, alt_allele_indices=[0],
            genotype_probabilities=[0.01, 0.97, 0.02],
        )

    def _run(self, cvos, switches=None):
        from deepvariant_tpu.postprocess.pipeline import cvos_to_variants

        return list(cvos_to_variants(
            cvos, "s1", phase_switches=switches
        ))

    def test_match_stitches_across_regions(self):
        out = self._run(
            [self._cvo(10, 1, first=True), self._cvo(50, 2)],
            switches={("0", "2"): 0},
        )
        assert out[0].calls[0].info["PS"] == [11]
        assert out[1].calls[0].info["PS"] == [11]

    def test_switch_flips_het_genotype(self):
        out = self._run(
            [self._cvo(10, 1, first=True), self._cvo(50, 2)],
            switches={("0", "2"): 1},
        )
        # Region 2 phased 0|1 locally; SWITCH -> emitted 1|0, same PS.
        assert out[0].calls[0].genotype == [0, 1]
        assert out[1].calls[0].genotype == [1, 0]
        assert out[1].calls[0].info["PS"] == [11]

    def test_not_enough_overlap_starts_new_set(self):
        out = self._run(
            [self._cvo(10, 1, first=True), self._cvo(50, 2)],
            switches={("0", "2"): 2},
        )
        assert out[0].calls[0].info["PS"] == [11]
        assert out[1].calls[0].info["PS"] == [51]

    def test_first_in_block_starts_new_set(self):
        out = self._run(
            [self._cvo(10, 1, first=True),
             self._cvo(50, 2, first=True)],
            switches={("0", "2"): 0},
        )
        assert out[1].calls[0].info["PS"] == [51]

    def test_switches_file_roundtrip(self, tmp_path):
        from deepvariant_tpu.phasing.merge_phased_reads import (
            ComparisonResult,
        )
        from deepvariant_tpu.postprocess.pipeline import (
            load_phase_switches,
        )

        path = str(tmp_path / "switches.tsv")
        with open(path, "w") as f:
            f.write(f"0\t1\t{ComparisonResult.MATCH.value}\n")
            f.write(f"0\t2\t{ComparisonResult.SWITCH.value}\n")
            f.write(f"1\t2\t{ComparisonResult.NOT_ENOUGH_OVERLAP.value}\n")
        switches = load_phase_switches(path)
        assert switches == {("0", "1"): 0, ("0", "2"): 1, ("1", "2"): 2}
        # Wire-format parity: reference enum ints
        # (merge_phased_reads.h:135-139).
        assert ComparisonResult.MATCH.value == 0
        assert ComparisonResult.SWITCH.value == 1
        assert ComparisonResult.NOT_ENOUGH_OVERLAP.value == 2

    def test_unphased_variant_keeps_block_open(self):
        # An unphased variant (no PS_CONTIG) between two phased ones
        # must not break the block.
        from deepvariant_tpu.core.types import CallVariantsOutput

        plain = CallVariantsOutput(
            variant=make_variant(start=30), alt_allele_indices=[0],
            genotype_probabilities=[0.01, 0.97, 0.02],
        )
        out = self._run(
            [self._cvo(10, 1, first=True), plain, self._cvo(50, 1)]
        )
        assert "PS" not in out[1].calls[0].info
        assert out[2].calls[0].info["PS"] == [11]


class TestSomaticPostprocess:
    """--process_somatic / --pon_filtering semantics
    (vcf_writer.cc WriteSomatic:163-177, postprocess_variants.py
    add_pon_filter:1335-1346)."""

    def _run(self, tmp_path, probs_list, pon_lines=None,
             process_somatic=True):
        from deepvariant_tpu.io.tfrecord import TFRecordWriter

        contigs = [ContigInfo("chr1", 1_000_000, 0)]
        cvo_path = str(tmp_path / "cvos.tfrecord.gz")
        with TFRecordWriter(cvo_path) as w:
            for i, probs in enumerate(probs_list):
                v = Variant(
                    reference_name="chr1", start=100 + 10 * i,
                    end=101 + 10 * i, reference_bases="A",
                    alternate_bases=["T"],
                )
                v.calls.append(VariantCall(
                    call_set_name="tumor", genotype=[-1, -1],
                    info={"AD": [5, 5], "DP": [10], "VAF": [0.5]},
                ))
                cvo = CallVariantsOutput(
                    variant=v, alt_allele_indices=[0],
                    genotype_probabilities=list(probs),
                )
                w.write(cvo.encode())
        pon = None
        if pon_lines is not None:
            pon = str(tmp_path / "pon.vcf")
            with open(pon, "w") as f:
                f.write("##fileformat=VCFv4.2\n")
                f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
                for line in pon_lines:
                    f.write(line + "\n")
        out = str(tmp_path / "out.vcf")
        postprocess_variants(
            cvo_path, out, contigs, sample_name="tumor",
            process_somatic=process_somatic, pon_vcf_path=pon,
        )
        header = [l for l in open(out) if l.startswith("##FILTER")]
        body = [l.strip().split("\t") for l in open(out)
                if not l.startswith("#")]
        return header, body

    def test_het_becomes_germline(self, tmp_path):
        header, body = self._run(
            tmp_path,
            [[0.01, 0.98, 0.01],   # het -> germline
             [0.01, 0.01, 0.98]],  # hom-alt -> somatic PASS
        )
        assert any("GERMLINE" in h for h in header)
        gts = [(cols[6], cols[9].split(":")[0]) for cols in body]
        assert gts[0] == ("GERMLINE", "0/0")
        assert gts[1] == ("PASS", "1/1")

    def test_pon_marks_pass_variants(self, tmp_path):
        header, body = self._run(
            tmp_path,
            [[0.01, 0.01, 0.98], [0.01, 0.01, 0.98]],
            pon_lines=["chr1\t101\t.\tA\tT\t50\tPASS\t."],
        )
        assert any("PON" in h for h in header)
        filters = [cols[6] for cols in body]
        assert filters == ["PON", "PASS"]

    def test_matched_normal_fields_reach_vcf(self, tmp_path):
        """NDP/NAD/NAF from make_examples ride through the CVO codec
        and postprocess into the somatic VCF, with the
        SOMATIC_FORMAT_FIELDS header lines (dv_vcf_constants.py:57-79,
        postprocess_variants.py:2301 include_somatic_fields)."""
        from deepvariant_tpu.io.tfrecord import TFRecordWriter

        contigs = [ContigInfo("chr1", 1_000_000, 0)]
        cvo_path = str(tmp_path / "cvos.tfrecord.gz")
        v = Variant(
            reference_name="chr1", start=100, end=101,
            reference_bases="A", alternate_bases=["T"],
        )
        v.calls.append(VariantCall(
            call_set_name="tumor", genotype=[-1, -1],
            info={"AD": [5, 5], "DP": [10], "VAF": [0.5],
                  "NDP": [25], "NAD": [24, 1], "NAF": [0.04]},
        ))
        with TFRecordWriter(cvo_path) as w:
            w.write(CallVariantsOutput(
                variant=v, alt_allele_indices=[0],
                genotype_probabilities=[0.01, 0.01, 0.98],
            ).encode())
        out = str(tmp_path / "out.vcf")
        postprocess_variants(
            cvo_path, out, contigs, sample_name="tumor",
            process_somatic=True,
        )
        lines = open(out).read().splitlines()
        fmt_ids = [l.split("ID=")[1].split(",")[0] for l in lines
                   if l.startswith("##FORMAT")]
        assert {"NDP", "NAD", "NAF"} <= set(fmt_ids)
        row = [l for l in lines if not l.startswith("#")][0].split("\t")
        fmt = row[8].split(":")
        sample = dict(zip(fmt, row[9].split(":")))
        assert sample["NDP"] == "25"
        assert sample["NAD"] == "24,1"
        assert sample["NAF"] == "0.04"

    def test_pon_requires_somatic(self, tmp_path):
        with pytest.raises(ValueError):
            self._run(
                tmp_path, [[0.01, 0.01, 0.98]],
                pon_lines=["chr1\t101\t.\tA\tT\t50\tPASS\t."],
                process_somatic=False,
            )


def test_compute_filter_fields_full_grid():
    """dv_vcf_constants_test.py:64-100: over the full qual x min_qual
    grid, a no-call is NoCall, a called hom-ref is RefCall regardless
    of qual, and a variant genotype PASSes iff qual >= min_qual."""
    for qual in range(0, 100, 7):
        for min_qual in range(0, 100, 7):
            v = make_variant()
            v.quality = float(qual)
            v.calls[0].genotype = []
            assert gt.compute_filter_fields(v, min_qual) == ["NoCall"]
            v.calls[0].genotype = [0, 0]
            assert gt.compute_filter_fields(v, min_qual) == ["RefCall"]
            v.calls[0].genotype = [0, 1]
            expected = "PASS" if qual >= min_qual else "LowQual"
            assert gt.compute_filter_fields(v, min_qual) == [expected]


def test_cvo_debug_info_roundtrip():
    """CvoDebugInfo wire codec (deepvariant.proto:376-399 fields 1-6)."""
    from deepvariant_tpu.core.types import CvoDebugInfo

    v = Variant(reference_name="chr1", start=5, end=6,
                reference_bases="A", alternate_bases=["T", "TG"])
    cvo = CallVariantsOutput(
        variant=v, alt_allele_indices=[0],
        genotype_probabilities=[0.1, 0.7, 0.2],
        debug_info=CvoDebugInfo(
            predicted_label=1, has_insertion=True, has_deletion=False,
            is_snp=False, true_label=2, logits=[0.5, -1.25, 3.0],
        ),
    )
    back = CallVariantsOutput.decode(cvo.encode())
    assert back.debug_info is not None
    d = back.debug_info
    assert (d.predicted_label, d.has_insertion, d.has_deletion,
            d.is_snp, d.true_label) == (1, True, False, False, 2)
    assert d.logits == [0.5, -1.25, 3.0]
    # Without debug info the field stays absent.
    plain = CallVariantsOutput.decode(CallVariantsOutput(
        variant=v, alt_allele_indices=[0],
        genotype_probabilities=[0.1, 0.7, 0.2],
    ).encode())
    assert plain.debug_info is None


class TestDebugOutputAllCandidates:
    """--debug_output_all_candidates (postprocess_variants.py:212-224,
    783-793, 1218-1225): INFO records the full candidate list; ALT
    keeps filtered alleles as zero-probability ALTs."""

    def _triallelic_cvos(self):
        # Two alts; alt "G" is weakly supported (pruned by the
        # multi-allelic qual filter), "T" is confidently het.
        v = Variant(
            reference_name="chr1", start=100, end=101,
            reference_bases="A", alternate_bases=["T", "G"],
        )
        v.calls.append(VariantCall(
            call_set_name="s1", genotype=[-1, -1],
            info={"AD": [5, 5, 0], "DP": [10], "VAF": [0.5, 0.0]},
        ))
        mk = lambda idx, probs: CallVariantsOutput(
            variant=v, alt_allele_indices=list(idx),
            genotype_probabilities=list(probs),
        )
        return [
            mk([0], [0.01, 0.98, 0.01]),
            mk([1], [0.995, 0.004, 0.001]),
            mk([0, 1], [0.02, 0.93, 0.05]),
        ]

    def test_info_mode_adds_candidates_field(self):
        from deepvariant_tpu.postprocess.merge import merge_predictions

        variant, probs = merge_predictions(
            self._triallelic_cvos(), qual_filter=3.0,
            debug_output_all_candidates="INFO",
        )
        assert variant.info["CANDIDATES"] == ["T|G"]
        assert variant.alternate_bases == ["T"]  # still pruned

    def test_alt_mode_keeps_pruned_allele(self):
        from deepvariant_tpu.postprocess.merge import merge_predictions

        variant, probs = merge_predictions(
            self._triallelic_cvos(), qual_filter=3.0,
            debug_output_all_candidates="ALT",
        )
        assert variant.alternate_bases == ["T", "G"]
        # 6 genotypes for 2 alts; G-involving genotypes ~zero prob.
        assert len(probs) == 6

    def test_default_prunes(self):
        from deepvariant_tpu.postprocess.merge import merge_predictions

        variant, probs = merge_predictions(
            self._triallelic_cvos(), qual_filter=3.0,
        )
        assert variant.alternate_bases == ["T"]
        assert "CANDIDATES" not in variant.info


class TestComputeQualsTable:
    """postprocess_variants_test.py:1764-1807 exact GQ/QUAL tables."""

    @pytest.mark.parametrize("probs,call,expected_gq,expected_qual", [
        ([0.01, 0.0, 0.99], 0, 0, 20.0),
        ([0.01, 0.0, 0.99], 1, 0, 20.0),
        ([0.01, 0.0, 0.99], 2, 20, 20.0),
        ([0.001, 0.0, 0.999], 0, 0, 30.0),
        ([0.001, 0.0, 0.999], 1, 0, 30.0),
        ([0.001, 0.0, 0.999], 2, 30, 30.0),
        ([0.0001, 0.0, 0.9999], 0, 0, 40.0),
        ([0.0001, 0.0, 0.9999], 1, 0, 40.0),
        ([0.0001, 0.0, 0.9999], 2, 40, 40.0),
        ([0.0001, 0.0, 0.0, 0.9999], 0, 0, 40.0),
        ([0.0001, 0.0, 0.0, 0.0, 0.9999], 0, 0, 40.0),
        ([0.0001, 0.0, 0.0, 0.0, 0.0, 0.9999], 0, 0, 40.0),
        ([0.0001, 0.0, 0.0, 0.0, 0.0, 0.9999], 5, 40, 40.0),
        ([0.0001, 0.0, 0.0, 0.0, 0.0, 0.0, 0.9999], 0, 0, 40.0),
        # Confidence cap rounding.
        ([1e-11, 1 - 1e-11, 0.0], 0, 0, 99.03089987),
        ([1e-11, 1 - 1e-11, 0.0], 1, 99, 99.03089987),
        ([1e-11, 1 - 1e-11, 0.0], 2, 0, 99.03089987),
        ([1e-15, 1 - 1e-15, 0.0], 0, 0, 99.03089987),
        ([1e-15, 1 - 1e-15, 0.0], 1, 99, 99.03089987),
        ([1e-15, 1 - 1e-15, 0.0], 2, 0, 99.03089987),
    ])
    def test_compute_quals(self, probs, call, expected_gq,
                           expected_qual):
        gq, qual = gt.compute_quals(probs, call)
        assert gq == expected_gq
        assert qual == pytest.approx(expected_qual, abs=1e-6)

    @pytest.mark.parametrize("probs,call,expected_gq", [
        ([0.0, 0.0001, 0.9999], 2, 40),
        ([0.0, 0.00011, 0.9999], 2, 40),  # sums > 1.0: no exception
    ])
    def test_numerical_stability(self, probs, call, expected_gq):
        from deepvariant_tpu.core import genomics_math

        # _QUAL_PRECISION=7 (postprocess_variants.py:320)
        max_qual = round(genomics_math.ptrue_to_bounded_phred(1.0), 7)
        gq, qual = gt.compute_quals(probs, call)
        assert gq == expected_gq
        assert qual == max_qual


class TestMostLikelyGenotypeTable:
    @pytest.mark.parametrize("probs,expected", [
        ([1, 0, 0], (0, [0, 0])),
        ([0, 1, 0], (1, [0, 1])),
        ([0, 0, 1], (2, [1, 1])),
        ([1, 0, 0, 0, 0, 0], (0, [0, 0])),
        ([0, 1, 0, 0, 0, 0], (1, [0, 1])),
        ([0, 0, 1, 0, 0, 0], (2, [1, 1])),
        ([0, 0, 0, 1, 0, 0], (3, [0, 2])),
        ([0, 0, 0, 0, 1, 0], (4, [1, 2])),
        ([0, 0, 0, 0, 0, 1], (5, [2, 2])),
    ])
    def test_table(self, probs, expected):
        idx, alleles = gt.most_likely_genotype(probs)
        assert (idx, list(alleles)) == (expected[0], expected[1])


class TestCorrectNonautosomeProbabilities:
    """postprocess_variants_test.py:2133-2180: haploid-contig prob
    correction zeroes het entries and renormalizes."""

    @pytest.mark.parametrize("probs,alts,expected", [
        ([0.02, 0.98, 0], ["C"], [1.0, 0, 0]),
        ([0.98, 0.02, 0], ["C"], [1.0, 0, 0]),
        ([0.2, 0.5, 0.3], ["C"], [0.4, 0, 0.6]),
        ([0.0, 1.0, 0.0], ["C"], [0, 0, 0]),
        ([0.02, 0.03, 0.45, 0.07, 0.3, 0.13], ["C", "CAA"],
         [0.033, 0, 0.75, 0, 0, 0.216]),
    ])
    def test_table(self, probs, alts, expected):
        v = make_variant(alts=tuple(alts)) if len(alts) == 1 else \
            make_variant(alts=tuple(alts), ad=tuple([4] * (1 + len(alts))))
        got = gt.correct_nonautosome_probabilities(list(probs), v)
        assert got == pytest.approx(expected, abs=1e-3)

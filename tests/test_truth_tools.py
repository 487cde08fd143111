"""preprocess_truth (overlapping phased truth consolidation,
reference tools/preprocess_truth.py) + print_f1 / vcf_eval
--metrics_out (checkpoint sweep summary, reference tools/print_f1.py).
"""

import json
import os

import pytest

from deepvariant_tpu.core.types import Variant, VariantCall


def _v(chrom, pos1, ref, alts, gt, phased=True):
    return Variant(
        reference_name=chrom,
        start=pos1 - 1,
        end=pos1 - 1 + len(ref),
        reference_bases=ref,
        alternate_bases=list(alts),
        calls=[VariantCall(call_set_name="HG002", genotype=list(gt),
                           is_phased=phased)],
    )


def _write_vcf(path, variants, contig="chr1"):
    from deepvariant_tpu.io.vcf import format_variant_line

    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,'
                'Description="Genotype">\n')
        f.write(f"##contig=<ID={contig},length=1000000>\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                "\tHG002\n")
        for v in variants:
            f.write(format_variant_line(v) + "\n")


class TestConsolidateGroup:
    def test_snp_under_deletion_star_allele(self):
        """The canonical star-allele case: a 1|0 deletion spanning a
        0|1 SNP whose other allele is `*`. One haplotype carries the
        deletion, the other the SNP."""
        from deepvariant_tpu.tools.preprocess_truth import (
            consolidate_group,
        )

        deletion = _v("chr1", 100, "ATTTC", ["A"], [1, 0])
        snp = _v("chr1", 102, "T", ["G", "*"], [2, 1])
        # hap1 = deleted (A), hap2 = ref with T>G at offset 2 (ATGTC).
        out = consolidate_group([deletion, snp])
        assert out.reference_bases == "ATTTC"
        assert out.alternate_bases == ["A", "ATGTC"]
        assert out.calls[0].genotype == [1, 2]
        assert out.calls[0].is_phased
        assert out.start == 99 and out.end == 104

    def test_shorter_alt_listed_first(self):
        from deepvariant_tpu.tools.preprocess_truth import (
            consolidate_group,
        )

        deletion = _v("chr1", 100, "ATTTC", ["A"], [0, 1])
        snp = _v("chr1", 102, "T", ["G", "*"], [1, 2])
        # Same locus, haplotypes swapped: allele order stays
        # shortest-first, genotype indices follow the haplotypes.
        out = consolidate_group([deletion, snp])
        assert out.alternate_bases == ["A", "ATGTC"]
        assert out.calls[0].genotype == [2, 1]

    def test_insertion_with_common_suffix(self):
        from deepvariant_tpu.tools.preprocess_truth import (
            consolidate_group,
        )

        # CT>CAT (hap1) normalizes to C>CA after suffix trim; hap2
        # carries a SNP at the covered T.
        ins = _v("chr1", 200, "CT", ["CAT"], [1, 0])
        snp = _v("chr1", 201, "T", ["A"], [0, 1])
        out = consolidate_group([ins, snp])
        assert out.reference_bases == "CT"
        assert sorted(out.alternate_bases) == ["CA", "CAT"]
        gt = out.calls[0].genotype
        alleles = [out.reference_bases] + out.alternate_bases
        assert alleles[gt[0]] == "CAT"
        assert alleles[gt[1]] == "CA"

    def test_identical_haplotypes_collapse_to_hom(self):
        from deepvariant_tpu.tools.preprocess_truth import (
            consolidate_group,
        )

        a = _v("chr1", 300, "GG", ["G"], [1, 1])
        b = _v("chr1", 301, "G", ["*"], [1, 1])
        out = consolidate_group([a, b])
        assert out.alternate_bases == ["G"]
        assert out.calls[0].genotype == [1, 1]

    def test_inconsistent_reference_raises(self):
        from deepvariant_tpu.tools.preprocess_truth import (
            consolidate_group,
        )

        a = _v("chr1", 100, "AT", ["A"], [1, 0])
        b = _v("chr1", 101, "G", ["C"], [0, 1])  # ref G vs A's T
        with pytest.raises(ValueError, match="inconsistent reference"):
            consolidate_group([a, b])


class TestGrouping:
    def test_file_level_run(self, tmp_path):
        from deepvariant_tpu.tools.preprocess_truth import (
            preprocess_truth,
        )
        from deepvariant_tpu.io.vcf import VcfReader

        vin = str(tmp_path / "truth.vcf")
        vout = str(tmp_path / "out.vcf")
        _write_vcf(vin, [
            _v("chr1", 100, "ATTTC", ["A"], [1, 0]),
            _v("chr1", 102, "T", ["G", "*"], [2, 1]),
            _v("chr1", 500, "C", ["T"], [0, 1]),   # isolated passthrough
        ])
        stats = preprocess_truth(vin, vout)
        assert stats == {
            "records_in": 3, "records_out": 2, "groups_collapsed": 1
        }
        with VcfReader(vout) as r:
            recs = list(r)
        assert len(recs) == 2
        assert recs[0].alternate_bases == ["A", "ATGTC"]
        assert recs[1].reference_bases == "C"
        assert recs[1].alternate_bases == ["T"]

    def test_no_grouping_on_sex_chromosomes(self, tmp_path):
        from deepvariant_tpu.tools.preprocess_truth import (
            preprocess_truth,
        )

        vin = str(tmp_path / "x.vcf")
        vout = str(tmp_path / "xo.vcf")
        _write_vcf(vin, [
            _v("chrX", 100, "ATTTC", ["A"], [1, 0]),
            _v("chrX", 102, "T", ["G", "*"], [2, 1]),
        ], contig="chrX")
        stats = preprocess_truth(vin, vout)
        assert stats["groups_collapsed"] == 0
        assert stats["records_out"] == 2

    def test_contig_switch_starts_new_group(self):
        """Unlike the reference (whose contig-switch branch drops the
        record), the first record of a new contig is kept."""
        from deepvariant_tpu.tools.preprocess_truth import (
            _group_overlapping,
        )

        groups = list(_group_overlapping([
            _v("chr1", 100, "AT", ["A"], [1, 0]),
            _v("chr2", 100, "C", ["T"], [0, 1]),
        ]))
        assert [len(g) for g in groups] == [1, 1]
        assert groups[1][0].reference_name == "chr2"


class TestPrintF1:
    def test_metrics_roundtrip(self, tmp_path, capsys):
        from deepvariant_tpu.tools.print_f1 import main as f1_main
        from deepvariant_tpu.tools.vcf_eval import metrics_file_dict

        result = {
            kind: {"tp": tp, "fn": fn, "fp": fp, "f1": 0.0}
            for kind, (tp, fn, fp) in {
                "all": (90, 10, 5), "snp": (70, 5, 2),
                "indel": (20, 5, 3),
            }.items()
        }
        for epoch, scale in ((3, 1), (7, 2)):
            d = metrics_file_dict(result)
            d["TPs_All"] *= scale
            with open(tmp_path / f"ckpt-{epoch}.metrics", "w") as f:
                json.dump(d, f)
        (tmp_path / "notes.txt").write_text("ignored")

        assert f1_main(["--metrics_dir", str(tmp_path)]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert len(lines) == 2
        c3 = lines[0].split("\t")
        assert c3[0] == "3" and float(c3[1]) == 100.0
        assert abs(float(c3[2]) - 2 * 90 / (180 + 15)) < 1e-9
        c7 = lines[1].split("\t")
        assert c7[0] == "7" and float(c7[1]) == 190.0

    def test_vcf_eval_metrics_out(self, tmp_path, capsys):
        from deepvariant_tpu.tools.vcf_eval import main as eval_main

        truth = str(tmp_path / "truth.vcf")
        query = str(tmp_path / "query.vcf")
        _write_vcf(truth, [
            _v("chr1", 100, "A", ["T"], [0, 1], phased=False),
            _v("chr1", 200, "C", ["G"], [1, 1], phased=False),
        ])
        _write_vcf(query, [
            _v("chr1", 100, "A", ["T"], [0, 1], phased=False),
            _v("chr1", 300, "G", ["GA"], [0, 1], phased=False),
        ])
        mpath = str(tmp_path / "ckpt-1.metrics")
        eval_main([
            "--truth_vcf", truth, "--query_vcf", query,
            "--metrics_out", mpath,
        ])
        with open(mpath) as f:
            m = json.load(f)
        assert m["TPs_All"] == 1.0
        assert m["FNs_All"] == 1.0
        assert m["FPs_All"] == 1.0
        assert m["TPs_SNP"] == 1.0
        assert m["FPs_INDEL"] == 1.0

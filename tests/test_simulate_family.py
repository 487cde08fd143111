"""Trio / tumor-normal simulator invariants (training/simulate_family.py)."""

import numpy as np
import pytest

TESTDATA = "/root/reference/deepvariant/testdata/input"
REF = f"{TESTDATA}/ucsc.hg19.chr20.unittest.fasta.gz"
WINDOWS = [(10_100_000, 10_160_000)]


@pytest.fixture(scope="module")
def trio(tmp_path_factory):
    from deepvariant_tpu.training.simulate_family import (
        TrioSimConfig,
        simulate_trio_corpus,
    )

    outdir = tmp_path_factory.mktemp("trio")
    cfg = TrioSimConfig(
        ref_path=REF, contig="chr20", windows=WINDOWS, seed=7,
        coverage_child=20.0, coverage_parent=20.0,
        de_novo_snv_rate=1.0 / 6_000.0,  # hot so the test sees several
    )
    return cfg, simulate_trio_corpus(cfg, str(outdir))


@pytest.fixture(scope="module")
def somatic(tmp_path_factory):
    from deepvariant_tpu.training.simulate_family import (
        SomaticSimConfig,
        simulate_somatic_corpus,
    )

    outdir = tmp_path_factory.mktemp("somatic")
    cfg = SomaticSimConfig(
        ref_path=REF, contig="chr20", windows=WINDOWS, seed=11,
        coverage_tumor=40.0, coverage_normal=20.0,
    )
    return cfg, simulate_somatic_corpus(cfg, str(outdir))


def _read_truth(path):
    from deepvariant_tpu.io.vcf import VcfReader

    with VcfReader(path) as r:
        return list(r)


class TestTrio:
    def test_outputs_exist_and_counts(self, trio):
        _, sim = trio
        assert sim["n_denovo"] >= 3
        assert sim["n_child_variants"] > 50
        assert sim["n_reads"] > 1000

    def test_mendelian_consistency(self, trio):
        """Every non-de-novo child allele must be carried by the
        matching parent (child hap0 <- parent1, hap1 <- parent2)."""
        _, sim = trio
        denovo_pos = {v.pos for v in sim["denovo_variants"]}
        p1_pos = {x.start for x in _read_truth(sim["truth_parent1"])}
        p2_pos = {x.start for x in _read_truth(sim["truth_parent2"])}
        checked = 0
        for v in sim["child_variants"]:
            if v.pos in denovo_pos:
                continue
            if v.genotype[0] == 1:
                assert v.pos in p1_pos, (
                    f"child hap0 alt at {v.pos} absent from parent1"
                )
            if v.genotype[1] == 1:
                assert v.pos in p2_pos, (
                    f"child hap1 alt at {v.pos} absent from parent2"
                )
            checked += 1
        assert checked > 30

    def test_denovo_absent_from_parents(self, trio):
        _, sim = trio
        p1_pos = {x.start for x in _read_truth(sim["truth_parent1"])}
        p2_pos = {x.start for x in _read_truth(sim["truth_parent2"])}
        for v in sim["denovo_variants"]:
            assert v.pos not in p1_pos and v.pos not in p2_pos

    def test_denovo_reads_support_alt(self, trio):
        """Child pileup carries alt reads at each de-novo SNV site;
        parents carry (almost) none."""
        from deepvariant_tpu.core.types import Range
        from deepvariant_tpu.io.bam import BamReader

        _, sim = trio
        child = BamReader(sim["bam_child"])
        parent1 = BamReader(sim["bam_parent1"])
        snvs = [
            v for v in sim["denovo_variants"]
            if len(v.ref) == 1 and len(v.alt) == 1
        ]
        assert snvs, "expected at least one de-novo SNV"
        supported = 0
        for v in snvs:
            region = Range("chr20", v.pos, v.pos + 1)

            def alt_frac(reader):
                batch = reader.query(region)
                alt = total = 0
                for rd in batch.to_reads():
                    # walk cigar to the base at v.pos
                    qpos, rpos = 0, rd.position
                    base = None
                    for op, n in rd.cigar:
                        if op == 1:  # M
                            if rpos <= v.pos < rpos + n:
                                base = rd.aligned_sequence[
                                    qpos + (v.pos - rpos)
                                ]
                            qpos += n
                            rpos += n
                        elif op == 2:  # I
                            qpos += n
                        elif op == 3:  # D
                            rpos += n
                        elif op == 5:  # S
                            qpos += n
                    if base is None:
                        continue
                    total += 1
                    alt += int(base == v.alt)
                return alt, total

            c_alt, c_tot = alt_frac(child)
            p_alt, p_tot = alt_frac(parent1)
            if c_tot >= 8 and c_alt / c_tot > 0.2:
                supported += 1
            if p_tot:
                assert p_alt / p_tot < 0.15, (
                    f"parent1 carries de-novo alt at {v.pos}"
                )
        assert supported >= max(1, len(snvs) // 2)


class TestSomatic:
    def test_outputs_and_vaf_spectrum(self, somatic):
        cfg, sim = somatic
        assert sim["n_somatic"] >= 10
        vafs = np.array(list(sim["vaf_by_pos"].values()))
        assert vafs.min() >= cfg.vaf_min - 1e-9
        assert vafs.max() <= cfg.vaf_max + 1e-9

    def test_truth_vcf_has_vaf_info(self, somatic):
        _, sim = somatic
        recs = _read_truth(sim["truth_somatic"])
        assert recs
        for rec in recs:
            assert "VAF" in rec.info
            v = float(rec.info["VAF"][0])
            assert abs(v - sim["vaf_by_pos"][rec.start]) < 1e-3

    def test_somatic_absent_from_normal_reads(self, somatic):
        """Normal BAM alt fraction at somatic SNV sites stays at
        sequencing-error level; tumor tracks the drawn VAF."""
        from deepvariant_tpu.core.types import Range
        from deepvariant_tpu.io.bam import BamReader

        _, sim = somatic
        tumor = BamReader(sim["bam_tumor"])
        normal = BamReader(sim["bam_normal"])
        snvs = [
            v for v in sim["somatic_variants"]
            if len(v.ref) == 1 and len(v.alt) == 1
        ]
        assert snvs

        def alt_count(reader, v):
            batch = reader.query(Range("chr20", v.pos, v.pos + 1))
            alt = total = 0
            for rd in batch.to_reads():
                qpos, rpos = 0, rd.position
                for op, n in rd.cigar:
                    if op == 1:
                        if rpos <= v.pos < rpos + n:
                            b = rd.aligned_sequence[
                                qpos + (v.pos - rpos)
                            ]
                            total += 1
                            alt += int(b == v.alt)
                        qpos += n
                        rpos += n
                    elif op == 2:
                        qpos += n
                    elif op == 3:
                        rpos += n
                    elif op == 5:
                        qpos += n
            return alt, total

        vaf_errors = []
        for v in snvs:
            t_alt, t_tot = alt_count(tumor, v)
            n_alt, n_tot = alt_count(normal, v)
            if n_tot:
                assert n_alt / n_tot < 0.12, (
                    f"normal carries somatic alt at {v.pos}"
                )
            if t_tot >= 15:
                vaf_errors.append(
                    t_alt / t_tot - sim["vaf_by_pos"][v.pos]
                )
        # Tumor alt fractions track the drawn VAFs in aggregate.
        assert vaf_errors
        assert abs(float(np.mean(vaf_errors))) < 0.08

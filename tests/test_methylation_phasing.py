"""Methylation-aware phasing tests (methylation_aware_phasing.cc
scenarios: Wilcoxon test, informative-site filters, voting loop)."""

import numpy as np
import pytest

from deepvariant_tpu.phasing.methylation_aware_phasing import (
    MethylatedRefSite,
    extract_methylated_ref_sites,
    haplotype_vote,
    identify_informative_sites,
    perform_methylation_aware_phasing,
    wilcoxon_rank_sum_test,
)


class TestWilcoxon:
    def test_empty_returns_sentinel(self):
        assert wilcoxon_rank_sum_test([], [0.5]) == -1.0
        assert wilcoxon_rank_sum_test([0.5], []) == -1.0

    def test_identical_groups_high_p(self):
        p = wilcoxon_rank_sum_test([0.5, 0.5, 0.5], [0.5, 0.5, 0.5])
        assert p > 0.9

    def test_separated_groups_low_p(self):
        p = wilcoxon_rank_sum_test(
            [0.9, 0.95, 0.85, 0.92], [0.05, 0.1, 0.08, 0.12]
        )
        assert 0 <= p < 0.05

    def test_matches_scipy_normal_approximation(self):
        # Cross-check the hand-rolled U statistic against scipy's
        # asymptotic two-sided Mann-Whitney (no continuity correction).
        scipy_stats = pytest.importorskip("scipy.stats")
        rng = np.random.RandomState(0)
        a = rng.rand(8).tolist()
        b = (rng.rand(9) + 0.3).tolist()
        ours = wilcoxon_rank_sum_test(a, b)
        ref = scipy_stats.mannwhitneyu(
            a, b, alternative="two-sided", method="asymptotic",
            use_continuity=False,
        ).pvalue
        assert abs(ours - ref) < 1e-9


def _site(pos, hap1_levels, hap2_levels, start_idx=0):
    levels = {}
    i = start_idx
    for m in hap1_levels:
        levels[i] = m
        i += 1
    for m in hap2_levels:
        levels[i] = m
        i += 1
    return MethylatedRefSite(pos, levels), i


class TestInformativeSites:
    def _setup(self, hap1_levels, hap2_levels):
        site, n = _site(100, hap1_levels, hap2_levels)
        hap1 = frozenset(range(len(hap1_levels)))
        hap2 = frozenset(range(len(hap1_levels), n))
        return site, hap1, hap2

    def test_separating_site_is_informative(self):
        site, h1, h2 = self._setup(
            [0.9, 0.92, 0.88, 0.91], [0.1, 0.12, 0.08, 0.11]
        )
        out = identify_informative_sites(h1, h2, [site])
        assert out == [site]
        assert 0 <= site.p_value < 0.05

    def test_low_coverage_filtered(self):
        site, h1, h2 = self._setup([0.9], [0.1, 0.12, 0.08])
        assert identify_informative_sites(h1, h2, [site]) == []
        assert site.p_value == -1.0  # test never ran

    def test_small_mean_difference_filtered(self):
        site, h1, h2 = self._setup(
            [0.5, 0.52, 0.48], [0.45, 0.42, 0.44]
        )
        assert identify_informative_sites(h1, h2, [site]) == []

    def test_noisy_haplotype_filtered(self):
        site, h1, h2 = self._setup(
            [0.9, 0.2, 0.9, 0.3], [0.1, 0.12, 0.08, 0.11]
        )
        assert identify_informative_sites(h1, h2, [site]) == []


class TestVotingLoop:
    def _make_sites(self, n_sites, hap1_reads, hap2_reads,
                    unphased_read, unphased_like_hap):
        """Sites where hap1 reads are ~0.9, hap2 reads are ~0.1 and the
        unphased read tracks one of them."""
        rng = np.random.RandomState(1)
        sites = []
        for s in range(n_sites):
            levels = {}
            for r in hap1_reads:
                levels[r] = 0.9 + rng.uniform(-0.02, 0.02)
            for r in hap2_reads:
                levels[r] = 0.1 + rng.uniform(-0.02, 0.02)
            levels[unphased_read] = (
                0.88 if unphased_like_hap == 1 else 0.12
            )
            sites.append(MethylatedRefSite(1000 + s, levels))
        return sites

    def test_vote_needs_three_informative_sites(self):
        h1, h2 = frozenset({0, 1, 2}), frozenset({3, 4, 5})
        sites = self._make_sites(2, h1, h2, 6, 1)
        informative = identify_informative_sites(h1, h2, sites)
        assert haplotype_vote(6, informative, h1, h2) == 0
        sites = self._make_sites(3, h1, h2, 6, 1)
        informative = identify_informative_sites(h1, h2, sites)
        assert haplotype_vote(6, informative, h1, h2) == 1

    def test_perform_phasing_assigns_unphased(self):
        h1, h2 = frozenset({0, 1, 2}), frozenset({3, 4, 5})
        sites = (
            self._make_sites(3, h1, h2, 6, 1)
            + self._make_sites(3, h1, h2, 7, 2)
        )
        initial = [1, 1, 1, 2, 2, 2, 0, 0]
        phases, p_values = perform_methylation_aware_phasing(
            8, initial, sites
        )
        assert phases[:6] == initial[:6]  # SNP phases untouched
        assert phases[6] == 1 and phases[7] == 2
        assert all(0 <= p < 0.05 for p in p_values if p >= 0)

    def test_no_sites_no_change(self):
        phases, p_values = perform_methylation_aware_phasing(
            4, [1, 2, 0, 0], []
        )
        assert phases == [1, 2, 0, 0]
        assert p_values == []


class TestReferenceCorpusPort:
    """Exact cases from methylation_aware_phasing_test.cc:74-225,
    with raw uint8 methylation levels normalized as level/255
    (GetMethylationLevelAtSite)."""

    def test_distinct_distributions_low_p(self):
        # :74-81
        p = wilcoxon_rank_sum_test(
            [0.10, 0.15, 0.20, 0.12, 0.18],
            [0.75, 0.80, 0.85, 0.78, 0.82],
        )
        assert p < 0.05

    def test_identical_distributions_high_p(self):
        # :84-90
        vals = [0.35, 0.40, 0.45, 0.50, 0.42]
        assert wilcoxon_rank_sum_test(vals, list(vals)) > 0.05

    def test_empty_haplotypes_sentinel(self):
        # :92-102
        assert wilcoxon_rank_sum_test([], []) == -1.0
        assert wilcoxon_rank_sum_test([], [0.2, 0.4, 0.6]) == -1.0

    def test_sort_order_matters(self):
        # :104-113
        p = wilcoxon_rank_sum_test(
            [0.9, 0.85, 0.88, 0.95, 0.92],
            [0.1, 0.12, 0.15, 0.05, 0.09],
        )
        assert p < 0.01

    def test_group_assignment_matters(self):
        # :115-123
        assert wilcoxon_rank_sum_test(
            [0.1, 0.2, 0.3], [0.8, 0.9, 1.0]
        ) < 0.05

    def _call(self, pos, hap1_levels_u8, hap2_levels_u8, start_idx=0):
        """MakeMethylCall analog (:47-71): read indices count up, raw
        uint8 levels normalize to level/255; a raw level of 0 means
        'no methylation data' and is excluded from the site entirely
        (GetMethylationLevelAtSiteReturnsMinusOne, :132-135)."""
        levels = {}
        i = start_idx
        for m in hap1_levels_u8 + hap2_levels_u8:
            if m > 0:
                levels[i] = m / 255.0
            i += 1
        hap1 = frozenset(range(start_idx, start_idx + len(hap1_levels_u8)))
        hap2 = frozenset(range(start_idx + len(hap1_levels_u8), i))
        return MethylatedRefSite(pos, levels), hap1, hap2

    def test_identify_informative_sites_filters(self):
        """IdentifyInformativeSitesFiltersCorrectly (:157-183): only the
        3v3 25-vs-230 site survives, with p == 0.049534."""
        informative, h1a, h2a = self._call(100, [25] * 3, [230] * 3)
        low_coverage, h1b, h2b = self._call(
            200, [25], [230], start_idx=6
        )
        low_total, h1c, h2c = self._call(
            300, [25] * 2, [230] * 2, start_idx=8
        )
        low_mean_diff, h1d, h2d = self._call(
            250, [125] * 3, [130] * 3, start_idx=12
        )
        high_stddev, h1e, h2e = self._call(
            400, [10, 10, 10, 250], [200] * 3, start_idx=18
        )
        hap1 = frozenset().union(h1a, h1b, h1c, h1d, h1e)
        hap2 = frozenset().union(h2a, h2b, h2c, h2d, h2e)
        sites = [informative, low_coverage, low_total,
                 low_mean_diff, high_stddev]
        out = identify_informative_sites(hap1, hap2, sites)
        assert [s.position for s in out] == [100]
        assert out[0].p_value == pytest.approx(0.049534, abs=1e-6)

    def test_haplotype_vote_with_methylation(self):
        """HaplotypeVoteWithMethylationVotesCorrectly (:186-225): three
        informative sites, hap1 read at 25/255, hap2 read at 230/255,
        the unphased read at 240/255 tracks hap2 -> vote 2."""
        sites = []
        for i in range(3):
            sites.append(MethylatedRefSite(1000 + i, {
                0: 25 / 255.0, 1: 230 / 255.0, 2: 240 / 255.0,
            }))
        vote = haplotype_vote(
            2, sites, frozenset({0}), frozenset({1})
        )
        assert vote == 2


class TestSiteExtraction:
    def test_extract_from_batch(self):
        from deepvariant_tpu.core.cigar import parse_cigar_string
        from deepvariant_tpu.core.types import Read
        from deepvariant_tpu.io.bam import ReadBatch

        reads = [
            Read(
                fragment_name=f"r{i}",
                aligned_sequence="ACGTACGTAC",
                aligned_quality=bytes([30] * 10),
                reference_name="chr1",
                position=100,
                mapping_quality=60,
                cigar=parse_cigar_string("10M"),
            )
            for i in range(3)
        ]
        batch = ReadBatch.from_reads(reads, ["chr1"])
        m0 = np.zeros(10, np.uint8); m0[1] = 230   # C at read pos 1
        m1 = np.zeros(10, np.uint8); m1[1] = 250
        batch.meth = [m0, m1, None]
        sites = extract_methylated_ref_sites(batch, 100, 110)
        assert len(sites) == 1
        site = sites[0]
        assert site.position == 101
        assert site.levels == {
            0: pytest.approx(230 / 255), 1: pytest.approx(250 / 255)
        }

    def test_reverse_strand_shifts_to_cpg_c(self):
        from deepvariant_tpu.core.cigar import parse_cigar_string
        from deepvariant_tpu.core.types import Read
        from deepvariant_tpu.io.bam import ReadBatch

        read = Read(
            fragment_name="r0",
            aligned_sequence="ACGTACGTAC",
            aligned_quality=bytes([30] * 10),
            reference_name="chr1",
            position=100,
            mapping_quality=60,
            cigar=parse_cigar_string("10M"),
            reverse_strand=True,
        )
        batch = ReadBatch.from_reads([read], ["chr1"])
        m = np.zeros(10, np.uint8)
        m[2] = 255  # G of the CpG at aligned pos 2 -> C at pos 1
        batch.meth = [m]
        sites = extract_methylated_ref_sites(batch, 100, 110)
        assert len(sites) == 1
        assert sites[0].position == 101

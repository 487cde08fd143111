"""Flag-surface and options-validation tests (reference
make_examples_options.py parity: 113 flags + check_options_are_valid)."""

import json
import os
import re

import numpy as np
import pytest

from deepvariant_tpu.make_examples.core import (
    MakeExamplesOptions,
    OptionsError,
    check_options_are_valid,
    serialize_options,
)
from deepvariant_tpu.scripts.make_examples import build_parser


REFERENCE_FLAGS_FILE = \
    "/root/reference/deepvariant/make_examples_options.py"


def reference_flag_names():
    src = open(REFERENCE_FLAGS_FILE).read()
    return set(re.findall(
        r"flags\.DEFINE_\w+\(\s*\n?\s*'([a-z0-9_]+)'", src
    ))


def test_full_reference_flag_surface():
    ref = reference_flag_names()
    assert len(ref) == 113
    parser = build_parser()
    ours = {
        a.option_strings[0].lstrip("-")
        for a in parser._actions
        if a.option_strings and a.option_strings[0].startswith("--")
    }
    missing = ref - ours
    assert not missing, f"reference flags missing from CLI: {sorted(missing)}"


class TestCheckOptionsAreValid:
    def _base(self, **kw):
        opts = MakeExamplesOptions(
            ref_filename="ref.fa", reads_filename="r.bam",
            examples_filename="x.tfrecord", mode="calling",
        )
        for k, v in kw.items():
            setattr(opts, k, v)
        return opts

    def test_valid_defaults_pass(self):
        check_options_are_valid(self._base())

    def test_requires_ref(self):
        with pytest.raises(OptionsError, match="reference"):
            check_options_are_valid(self._base(ref_filename=""))

    def test_training_needs_truth(self):
        with pytest.raises(OptionsError, match="truth"):
            check_options_are_valid(self._base(mode="training"))

    def test_training_rejects_gvcf(self):
        opts = self._base(
            mode="training", truth_variants_filename="t.vcf",
            confident_regions_filename="c.bed", gvcf_filename="g",
        )
        with pytest.raises(OptionsError, match="gVCF"):
            check_options_are_valid(opts)

    def test_calling_rejects_truth(self):
        with pytest.raises(OptionsError, match="training-mode"):
            check_options_are_valid(
                self._base(truth_variants_filename="t.vcf")
            )

    def test_importer_needs_proposed(self):
        with pytest.raises(OptionsError, match="proposed"):
            check_options_are_valid(
                self._base(variant_caller="vcf_candidate_importer")
            )

    def test_indel_size_flags_must_come_together(self):
        opts = self._base()
        opts.variant_caller_options.small_indel_threshold = 3
        with pytest.raises(OptionsError, match="together"):
            check_options_are_valid(opts)
        opts.variant_caller_options \
            .min_indel_fraction_for_small_indels = 0.1
        opts.variant_caller_options \
            .min_indel_fraction_for_large_indels = 0.2
        check_options_are_valid(opts)

    def test_multiplier_range(self):
        opts = self._base()
        opts.variant_caller_options.min_fraction_multiplier = 1.5
        with pytest.raises(OptionsError, match="multiplier"):
            check_options_are_valid(opts)
        opts.variant_caller_options.min_fraction_multiplier = \
            float("inf")
        check_options_are_valid(opts)

    def test_pileup_geometry(self):
        opts = self._base()
        opts.pileup_options.width = 220  # even
        with pytest.raises(OptionsError, match="odd"):
            check_options_are_valid(opts)
        opts.pileup_options.width = 221
        opts.pileup_options.height = 50
        with pytest.raises(OptionsError, match="height"):
            check_options_are_valid(opts)

    def test_select_variant_types_validated(self):
        with pytest.raises(OptionsError, match="unknown type"):
            check_options_are_valid(
                self._base(select_variant_types="snps bogus")
            )
        check_options_are_valid(
            self._base(select_variant_types="snps indels")
        )


def test_serialize_options_roundtrips_json():
    opts = MakeExamplesOptions(
        ref_filename="ref.fa", reads_filename="r.bam",
        examples_filename="x.tfrecord",
    )
    blob = json.dumps(serialize_options(opts))
    parsed = json.loads(blob)
    assert parsed["ref_filename"] == "ref.fa"
    assert parsed["variant_caller_options"]["min_fraction_snps"] == 0.12
    assert parsed["pileup_options"]["width"] == 221


def test_indel_size_dependent_fractions():
    from deepvariant_tpu.make_examples.variant_caller import (
        VariantCallerOptions, VerySensitiveCaller,
    )
    from deepvariant_tpu.make_examples.allele_counter import (
        Allele, DELETION, SUBSTITUTION,
    )

    vco = VariantCallerOptions(
        min_indel_fraction_for_small_indels=0.10,
        min_indel_fraction_for_large_indels=0.25,
        small_indel_threshold=2,
    )
    caller = VerySensitiveCaller(vco)
    small = Allele(bases="CAT", type=DELETION, count=5, read_ids=[])
    large = Allele(bases="CATTT", type=DELETION, count=5, read_ids=[])
    snp = Allele(bases="T", type=SUBSTITUTION, count=5, read_ids=[])
    assert caller._min_fraction(small) == pytest.approx(0.10)
    assert caller._min_fraction(large) == pytest.approx(0.25)
    assert caller._min_fraction(snp) == pytest.approx(0.12)
    # Without the threshold the plain indel fraction applies.
    assert VerySensitiveCaller(VariantCallerOptions())._min_fraction(
        large
    ) == pytest.approx(0.06)


def test_non_uniform_downsampling_guarantees_allele_mins():
    from deepvariant_tpu.make_examples.pileup import PileupEncoder
    from deepvariant_tpu.make_examples.variant_caller import (
        DeepVariantCall,
    )
    from deepvariant_tpu.core.types import Variant

    dv = DeepVariantCall(
        variant=Variant(
            reference_name="chr1", start=100, end=101,
            reference_bases="A", alternate_bases=["T"],
        ),
        allele_support={"T": [90, 91, 92, 93]},
    )
    rng = np.random.Generator(np.random.Philox(7))
    indices = list(range(100))
    picked = PileupEncoder._downsample_with_allele_mins(
        dv, indices, max_reads=10, min_per_allele=3, rng=rng
    )
    assert len(picked) == 10
    # At least 3 of the alt-supporting reads survive the crowding.
    assert len(set(picked) & {90, 91, 92, 93}) >= 3


def test_reverse_haplotypes_swaps_sort_index():
    from deepvariant_tpu.make_examples.pileup import (
        PileupEncoder, PileupOptions,
    )

    enc = PileupEncoder(PileupOptions(
        sort_by_haplotypes=True, reverse_haplotypes=True
    ))
    assert enc._hap_index(1) == 2
    assert enc._hap_index(2) == 1
    assert enc._hap_index(0) == 0


def test_cli_accepts_reference_style_invocation(tmp_path, testdata_dir):
    """End-to-end through the CLI with several new flags set."""
    from deepvariant_tpu.scripts.make_examples import main

    out = str(tmp_path / "ex.tfrecord.gz")
    rc = main([
        "--mode", "calling",
        "--ref", os.path.join(
            testdata_dir, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ),
        "--reads", os.path.join(
            testdata_dir, "input/NA12878_S1.chr20.10_10p1mb.bam"
        ),
        "--examples", out,
        "--regions", "chr20:10,000,000-10,001,000",
        "--select_variant_types", "snps indels",
        "--vsc_min_fraction_snps", "0.12",
        "--keep_duplicates",
        "--output_sitelist",
        "--gvcf_gq_binsize", "5",
        "--logging_every_n_candidates", "10",
    ])
    assert rc == 0
    run_info = json.load(open(out + ".run_info.json"))
    assert run_info["options"]["keep_duplicates"] is True
    assert run_info["options"]["select_variant_types"] == "snps indels"
    assert os.path.exists(out + ".sitelist.tsv")


def test_cli_rejects_shm_streaming():
    from deepvariant_tpu.scripts.make_examples import main

    with pytest.raises(SystemExit, match="stream"):
        main([
            "--mode", "calling", "--ref", "r.fa", "--reads", "r.bam",
            "--examples", "x", "--stream_examples",
        ])


def test_vcf_eval_against_pipeline_outputs(tmp_path):
    """vcf_eval classifies TP/FP/FN + zygosity correctly."""
    from deepvariant_tpu.core.types import Variant, VariantCall
    from deepvariant_tpu.tools.vcf_eval import evaluate_variants

    def mk(pos, ref, alts, gt):
        v = Variant(
            reference_name="chr20", start=pos, end=pos + len(ref),
            reference_bases=ref, alternate_bases=list(alts),
            filter=["PASS"],
        )
        v.calls.append(VariantCall(call_set_name="s", genotype=list(gt)))
        return v

    truth = [
        mk(100, "A", ["G"], [0, 1]),
        mk(200, "C", ["T"], [1, 1]),
        mk(300, "CAA", ["C"], [0, 1]),
    ]
    query = [
        mk(100, "A", ["G"], [0, 1]),    # TP
        mk(200, "C", ["T"], [0, 1]),    # zygosity mismatch: FP + FN
        mk(400, "G", ["A"], [0, 1]),    # FP
    ]
    m = evaluate_variants(truth, query)
    assert m["snp"]["tp"] == 1
    assert m["snp"]["fp"] == 2
    assert m["snp"]["fn"] == 1
    assert m["indel"]["fn"] == 1  # 300 deletion unmatched
    # Trimmed representations compare equal.
    q2 = [mk(300, "CAAG", ["CG"], [0, 1])]  # same deletion, padded
    t2 = [mk(300, "CAA", ["C"], [0, 1])]
    m2 = evaluate_variants(t2, q2)
    assert m2["indel"]["tp"] == 1 and m2["indel"]["fp"] == 0

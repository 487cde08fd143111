"""make_examples CLI (stage 1).

Mirrors the reference's make_examples.py flag surface (the subset
implemented so far); flags funnel into MakeExamplesOptions
(make_examples.py:141-239, make_examples_options.py defaults).

Usage:
  python -m deepvariant_tpu.scripts.make_examples \
    --mode calling --ref ref.fa --reads reads.bam \
    --examples out.tfrecord@4 --task 0
"""

from __future__ import annotations

import argparse
import sys

from deepvariant_tpu.make_examples.core import (
    DEFAULT_MAX_READS_PER_PARTITION,
    DEFAULT_PARTITION_SIZE,
    DEFAULT_RANDOM_SEED,
    MakeExamplesOptions,
    make_examples_runner,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("make_examples")
    p.add_argument("--mode", choices=["calling", "training"],
                   required=True)
    p.add_argument("--ref", required=True)
    p.add_argument("--reads", required=True)
    p.add_argument("--examples", required=True)
    p.add_argument("--candidates", default="")
    p.add_argument("--gvcf", default="")
    p.add_argument("--regions", default=None,
                   help="space-separated region literals or BED paths")
    p.add_argument("--exclude_regions", default=None)
    p.add_argument("--sample_name", default="default")
    p.add_argument("--task", type=int, default=0)
    p.add_argument("--num_shards", type=int, default=0,
                   help="0 = unsharded")
    p.add_argument("--partition_size", type=int,
                   default=DEFAULT_PARTITION_SIZE)
    p.add_argument("--max_reads_per_partition", type=int,
                   default=DEFAULT_MAX_READS_PER_PARTITION)
    p.add_argument("--random_seed", type=int, default=DEFAULT_RANDOM_SEED)
    p.add_argument("--realign_reads", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--min_mapping_quality", type=int, default=5)
    p.add_argument("--min_base_quality", type=int, default=10)
    p.add_argument("--call_small_model_examples", action="store_true")
    p.add_argument("--trained_small_model_path", default="")
    p.add_argument("--small_model_snp_gq_threshold", type=float,
                   default=25.0)
    p.add_argument("--small_model_indel_gq_threshold", type=float,
                   default=30.0)
    p.add_argument("--small_model_cvo_records", default="",
                   help="output TFRecord for small-model CVOs")
    p.add_argument("--write_small_model_examples", action="store_true",
                   help="training mode: emit small-model feature rows")
    p.add_argument("--small_model_examples", default="",
                   help="output TFRecord for small-model training rows")
    p.add_argument("--population_vcfs", default="",
                   help="space-separated population VCFs with AF INFO "
                        "for the allele_frequency channel")
    p.add_argument("--proposed_variants", default="",
                   help="VCF of candidates to import "
                        "(vcf_candidate_importer)")
    p.add_argument("--truth_variants", default="")
    p.add_argument("--confident_regions", default="")
    p.add_argument("--labeler_algorithm", default="haplotype_labeler")
    p.add_argument("--runtime_by_region", default="")
    p.add_argument("--model_preset", default="",
                   help="apply a model type's calling flags "
                        "(WGS/WES/PACBIO/ONT_R104/...)")
    p.add_argument("--normalize_reads", action="store_true",
                   help="left-align per-read indels before allele "
                        "counting")
    p.add_argument("--enable_methylation_calling",
                   action="store_true",
                   help="emit per-allele MF/MD methylation FORMAT "
                        "stats from MM/ML tags")
    p.add_argument("--methylation_calling_threshold", type=float,
                   default=0.5)
    p.add_argument("--enable_methylation_aware_phasing",
                   action="store_true",
                   help="complete read phasing with 5mC Wilcoxon "
                        "voting after direct phasing (long reads "
                        "with MM/ML tags)")
    p.add_argument("--channel_list", default="",
                   help="comma-separated channel names overriding the "
                        "preset's channel set (reference "
                        "make_examples_options.py --channel_list)")
    p.add_argument("--mean_coverage_per_sample", default="",
                   help="mean coverage value(s) for the mean_coverage "
                        "channel (first value used for this sample)")
    return p


def options_from_args(args) -> MakeExamplesOptions:
    return MakeExamplesOptions(
        reads_filename=args.reads,
        ref_filename=args.ref,
        examples_filename=args.examples,
        candidates_filename=args.candidates,
        gvcf_filename=args.gvcf,
        mode=args.mode,
        regions=args.regions.split() if args.regions else None,
        exclude_regions=(
            args.exclude_regions.split() if args.exclude_regions else None
        ),
        sample_name=args.sample_name,
        task_id=args.task,
        num_shards=args.num_shards,
        partition_size=args.partition_size,
        max_reads_per_partition=args.max_reads_per_partition,
        random_seed=args.random_seed,
        realigner_enabled=args.realign_reads,
        min_mapping_quality=args.min_mapping_quality,
        min_base_quality=args.min_base_quality,
        call_small_model_examples=args.call_small_model_examples,
        trained_small_model_path=args.trained_small_model_path,
        small_model_snp_gq_threshold=args.small_model_snp_gq_threshold,
        small_model_indel_gq_threshold=(
            args.small_model_indel_gq_threshold
        ),
        small_model_cvo_filename=args.small_model_cvo_records,
        write_small_model_examples=args.write_small_model_examples,
        small_model_examples_filename=args.small_model_examples,
        population_vcf_filenames=(
            args.population_vcfs.split() if args.population_vcfs else None
        ),
        proposed_variants_filename=args.proposed_variants,
        truth_variants_filename=args.truth_variants,
        confident_regions_filename=args.confident_regions,
        labeler_algorithm=args.labeler_algorithm,
        enable_methylation_aware_phasing=(
            args.enable_methylation_aware_phasing
        ),
        normalize_reads=args.normalize_reads,
        enable_methylation_calling=args.enable_methylation_calling,
        methylation_calling_threshold=(
            args.methylation_calling_threshold
        ),
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    options = options_from_args(args)
    if args.model_preset:
        from deepvariant_tpu.make_examples.presets import (
            apply_model_preset,
        )

        apply_model_preset(options, args.model_preset)
    if args.channel_list:
        from deepvariant_tpu.make_examples.pileup import (
            CHANNEL_NAME_TO_ENUM,
        )

        names = [c.strip() for c in args.channel_list.split(",")
                 if c.strip()]
        unknown = [c for c in names if c not in CHANNEL_NAME_TO_ENUM]
        if unknown:
            raise SystemExit(
                f"--channel_list: unknown channel(s) {unknown}; "
                f"valid: {sorted(CHANNEL_NAME_TO_ENUM)}"
            )
        options.pileup_options.channels = tuple(
            CHANNEL_NAME_TO_ENUM[c] for c in names
        )
    if args.mean_coverage_per_sample:
        options.pileup_options.mean_coverage = float(
            args.mean_coverage_per_sample.split(",")[0]
        )
    counts = make_examples_runner(
        options,
        runtime_by_region_path=args.runtime_by_region or None,
    )
    print(
        f"make_examples done: {counts['examples']} examples, "
        f"{counts['candidates']} candidates, {counts['gvcfs']} gvcf "
        f"records (task {args.task})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""One-step pangenome-aware pipeline
(reference scripts/run_pangenome_aware_deepvariant.py).

Stacks a pangenome haplotype panel above the sample reads
([pangenome, reads], reads as the calling sample) with the panel's
channels blanked and only window-spanning haplotypes kept
(make_examples_pangenome_aware_dv.py:207-289), then call_variants +
postprocess_variants.

The panel is a BAM of haplotype alignments; GBZ graphs load via
io.gbz (GBZReader) or can be pre-surjected.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

MODEL_TYPES = ("WGS", "WES")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("run_pangenome_aware_deepvariant")
    p.add_argument("--model_type", choices=MODEL_TYPES, default="WGS")
    p.add_argument("--ref", required=True)
    p.add_argument("--reads", required=True)
    p.add_argument("--pangenome", required=True,
                   help="haplotype panel (BAM of haplotype alignments "
                        "or .gbz graph)")
    p.add_argument("--sample_name_reads", default="default")
    p.add_argument("--output_vcf", required=True)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--regions", default=None)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--intermediate_results_dir", default="")
    p.add_argument("--batch_size", type=int, default=2048)
    p.add_argument("--allow_uninitialized_model", action="store_true")
    return p


def main(argv=None) -> int:
    from deepvariant_tpu.make_examples.core import MakeExamplesOptions
    from deepvariant_tpu.make_examples.multisample import (
        PANGENOME_MAIN_SAMPLE_INDEX,
        make_multisample_examples_runner,
        pangenome_samples,
    )
    from deepvariant_tpu.scripts.call_variants import main as cv_main
    from deepvariant_tpu.scripts.postprocess_variants import (
        main as pp_main,
    )

    args = build_parser().parse_args(argv)
    t_start = time.time()
    outdir = args.intermediate_results_dir or os.path.join(
        os.path.dirname(os.path.abspath(args.output_vcf)),
        "intermediate_results_dir",
    )
    os.makedirs(outdir, exist_ok=True)
    examples = os.path.join(
        outdir, "make_examples_pangenome.tfrecord.gz"
    )

    pangenome_path = args.pangenome
    if pangenome_path.endswith(".gbz"):
        from deepvariant_tpu.io.gbz import extract_panel_bam

        pangenome_path = extract_panel_bam(
            pangenome_path, args.ref,
            os.path.join(outdir, "pangenome_panel.bam"),
            regions=args.regions.split() if args.regions else None,
        )

    options = MakeExamplesOptions(
        reads_filename=args.reads,
        ref_filename=args.ref,
        examples_filename=examples,
        mode="calling",
        regions=args.regions.split() if args.regions else None,
        sample_name=args.sample_name_reads,
        trim_reads_for_pileup=True,  # pangenome preset default
    )
    options.pileup_options.channels = (1, 2, 3, 4, 5, 6, 19)
    options.variant_caller_options.min_fraction_multiplier = float("inf")

    t0 = time.time()
    samples = pangenome_samples(
        args.reads, pangenome_path,
        sample_name_reads=args.sample_name_reads,
    )
    counts = make_multisample_examples_runner(
        options, samples, PANGENOME_MAIN_SAMPLE_INDEX
    )
    print(f"make_examples: {counts} ({time.time() - t0:.1f}s)")

    cvo = os.path.join(outdir, "cvo_pangenome.tfrecord.gz")
    cv_argv = ["--examples", examples, "--outfile", cvo,
               "--batch_size", str(args.batch_size)]
    if args.checkpoint:
        cv_argv += ["--checkpoint", args.checkpoint]
    elif args.allow_uninitialized_model:
        cv_argv += ["--allow_uninitialized_model"]
    rc = cv_main(cv_argv)
    if rc != 0:
        return rc

    rc = pp_main([
        "--ref", args.ref,
        "--infile", cvo,
        "--outfile", args.output_vcf,
        "--sample_name", args.sample_name_reads,
    ])
    if rc != 0:
        return rc
    print(f"total: {time.time() - t_start:.1f}s -> {args.output_vcf}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""One-step DeepSomatic pipeline (reference scripts/run_deepsomatic.py).

Tumor/normal (or tumor-only) somatic calling: somatic make_examples
([normal, tumor] stack, tumor candidates, low-VAF filter available) ->
call_variants -> postprocess_variants. The somatic caller runs with
min_fraction_multiplier=inf (make_examples_somatic.py:149: candidates
come from the tumor sample alone, no pooled rescue).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

MODEL_TYPES = ("WGS", "WES", "PACBIO", "ONT", "FFPE_WGS", "FFPE_WES",
               "WGS_TUMOR_ONLY", "PACBIO_TUMOR_ONLY", "ONT_TUMOR_ONLY")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("run_deepsomatic")
    p.add_argument("--model_type", choices=MODEL_TYPES, default="WGS")
    p.add_argument("--ref", required=True)
    p.add_argument("--reads_tumor", required=True)
    p.add_argument("--reads_normal", default="",
                   help="omit for tumor-only calling")
    p.add_argument("--sample_name_tumor", default="tumor")
    p.add_argument("--sample_name_normal", default="normal")
    p.add_argument("--output_vcf", required=True)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--regions", default=None)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--intermediate_results_dir", default="")
    p.add_argument("--batch_size", type=int, default=2048)
    p.add_argument("--allow_uninitialized_model", action="store_true")
    p.add_argument("--pon_filtering", default="",
                   help="Panel-of-Normals VCF; matching PASS variants "
                        "get the PON filter")
    p.add_argument("--filter_low_vaf_candidates",
                   action=argparse.BooleanOptionalAction, default=False)
    return p


def main(argv=None) -> int:
    from deepvariant_tpu.make_examples.core import MakeExamplesOptions
    from deepvariant_tpu.make_examples.multisample import (
        make_multisample_examples_runner,
        somatic_samples,
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
    examples = os.path.join(outdir, "make_examples_somatic.tfrecord.gz")

    options = MakeExamplesOptions(
        reads_filename=args.reads_tumor,
        ref_filename=args.ref,
        examples_filename=examples,
        mode="calling",
        regions=args.regions.split() if args.regions else None,
        sample_name=args.sample_name_tumor,
        filter_low_vaf_candidates=args.filter_low_vaf_candidates,
    )
    # Somatic: no pooled-sample rescue (make_examples_somatic.py:149).
    options.variant_caller_options.min_fraction_multiplier = float("inf")
    options.pileup_options.channels = (1, 2, 3, 4, 5, 6, 19)

    t0 = time.time()
    if args.reads_normal:
        samples = somatic_samples(
            args.reads_tumor, args.reads_normal,
            args.sample_name_tumor, args.sample_name_normal,
        )
        counts = make_multisample_examples_runner(
            options, samples, main_sample_index=1
        )
    else:
        from deepvariant_tpu.make_examples.core import (
            make_examples_runner,
        )

        options.variant_caller_options.min_fraction_multiplier = 1.0
        counts = make_examples_runner(options)
    print(f"make_examples: {counts} ({time.time() - t0:.1f}s)")

    cvo = os.path.join(outdir, "cvo_somatic.tfrecord.gz")
    cv_argv = ["--examples", examples, "--outfile", cvo,
               "--batch_size", str(args.batch_size)]
    if args.checkpoint:
        cv_argv += ["--checkpoint", args.checkpoint]
    elif args.allow_uninitialized_model:
        cv_argv += ["--allow_uninitialized_model"]
    rc = cv_main(cv_argv)
    if rc != 0:
        return rc

    pp_argv = [
        "--ref", args.ref,
        "--infile", cvo,
        "--outfile", args.output_vcf,
        "--sample_name", args.sample_name_tumor,
        "--process_somatic",
    ]
    if args.pon_filtering:
        pp_argv += ["--pon_filtering", args.pon_filtering]
    rc = pp_main(pp_argv)
    if rc != 0:
        return rc
    print(f"total: {time.time() - t_start:.1f}s -> {args.output_vcf}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

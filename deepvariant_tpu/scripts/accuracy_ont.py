"""End-to-end ONT R10.4 accuracy demonstration on the reference's
HG002 nanopore testdata.

Same capability proof as `accuracy_chr20` (full pipeline, no goldens
injected anywhere) but on the long-read ONT model family: phased
haplotype-sorted pileups, diff_channels alt alignment, no realigner —
the reference's ONT_R104 released-model configuration
(run_deepvariant.py:484-493 flags_for_calling).

Data (the reference's own deeptrio testdata):
  * reads  — HG002_R10_chr20_5050000_5075000.bam (112 reads,
    ~30 kb mean length, ~40x over the window)
  * ref    — grch38.chr20_5050000_5075000.masked.fa.gz
  * truth  — HG002_GRCh38_1_22_v4.2.1_benchmark.chr20.vcf.gz with its
    high-confidence BED (96% of the window is confident; 37 SNP +
    7 indel truth calls inside it)

The 25 kb window is 3-fold cross-evaluated: each fold trains an
InceptionV3 from scratch on two thirds (minus a tune carve used only
for best-checkpoint selection), calls variants on the held-out third,
and TP/FN/FP pool across folds so every confident truth call in the
window is scored exactly once by a model that never saw its region.

Reference parity anchors: ONT case study docs/metrics.md,
dv_config.py ont preset, make_examples_options.py ONT_R104 flags.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional, Sequence

TESTDATA = "/root/reference/deeptrio/testdata/input"
READS = f"{TESTDATA}/HG002_R10_chr20_5050000_5075000.bam"
REF = f"{TESTDATA}/grch38.chr20_5050000_5075000.masked.fa.gz"
TRUTH_VCF = f"{TESTDATA}/HG002_GRCh38_1_22_v4.2.1_benchmark.chr20.vcf.gz"
CONFIDENT_BED = f"{TESTDATA}/HG002_GRCh38_1_22_v4.2.1_benchmark.chr20.bed"

WINDOW = ("chr20", 5_050_000, 5_075_000)
TUNE_BP = 3_000  # carved off the training span, never the eval third


def _fold_regions(n_folds: int, window=None, tune_bp: int = TUNE_BP):
    """Yield (train_regions, tune_region, eval_region) per fold."""
    contig, lo, hi = window or WINDOW
    edges = [lo + (hi - lo) * i // n_folds for i in range(n_folds + 1)]
    for k in range(n_folds):
        ev = (edges[k], edges[k + 1])
        rest = []
        for i in range(n_folds):
            if i != k:
                rest.append((edges[i], edges[i + 1]))
        # Merge adjacent non-eval thirds, then carve the tune slice
        # off the END of the last training span (genomic order).
        merged = []
        for span in rest:
            if merged and merged[-1][1] == span[0]:
                merged[-1][1] = span[1]
            else:
                merged.append([span[0], span[1]])
        merged[-1][1] -= tune_bp
        tune = (merged[-1][1], merged[-1][1] + tune_bp)
        fmt = lambda s: f"{contig}:{s[0]}-{s[1]}"  # noqa: E731
        yield [fmt(s) for s in merged], fmt(tune), fmt(ev)


def run_fold(
    workdir: str,
    train_regions: Sequence[str],
    tune_region: str,
    eval_region: str,
    batch_size: int = 32,
    num_epochs: int = 60,
    learning_rate: float = 0.002,
    select: str = "final",
    channels: Optional[Sequence[int]] = None,
    log_fn=print,
) -> dict:
    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        make_examples_runner,
    )
    from deepvariant_tpu.make_examples.presets import apply_model_preset
    from deepvariant_tpu.training.config import get_config
    from deepvariant_tpu.training.data import DatasetConfig
    from deepvariant_tpu.training import train as train_lib
    from deepvariant_tpu.tools import vcf_eval

    os.makedirs(workdir, exist_ok=True)

    def stage1(mode: str, regions: Sequence[str], out_name: str) -> dict:
        out = os.path.join(workdir, out_name)
        options = MakeExamplesOptions(
            reads_filename=READS,
            ref_filename=REF,
            examples_filename=out,
            mode=mode,
            regions=list(regions),
        )
        apply_model_preset(options, "ONT_R104")
        if channels:
            # Homopolymer-family ablation (round-5 directive #6):
            # same override path as accuracy_longread/accuracy_sim.
            options.pileup_options.channels = tuple(channels)
        if mode == "training":
            options.truth_variants_filename = TRUTH_VCF
            options.confident_regions_filename = CONFIDENT_BED
        counts = make_examples_runner(options)
        log_fn(f"make_examples {mode} {list(regions)}: {counts}")
        return {"path": out, "counts": counts}

    train_ex = stage1("training", train_regions, "train.tfrecord.gz")
    tune_ex = stage1("training", [tune_region], "tune.tfrecord.gz")

    for name, ex in (("train", train_ex), ("tune", tune_ex)):
        DatasetConfig(
            name=f"ont-{name}",
            tfrecord_path=ex["path"],
            num_examples=ex["counts"]["examples"],
        ).write(os.path.join(workdir, f"{name}_dataset.json"))

    config = get_config("ont")
    config.train_dataset_config = os.path.join(
        workdir, "train_dataset.json"
    )
    config.tune_dataset_config = os.path.join(workdir, "tune_dataset.json")
    config.batch_size = batch_size
    config.num_epochs = num_epochs
    config.learning_rate = learning_rate
    config.early_stopping_patience = num_epochs
    config.num_validation_examples = 0
    # Same small-corpus adjustments as accuracy_chr20 (measured there):
    # keras bn momentum 0.9997 never updates running stats in ~10^3
    # steps, and the preset's near-constant LR leaves late epochs
    # oscillating instead of converging.
    config.bn_momentum = 0.90
    config.learning_rate_decay_rate = 0.90
    config.learning_rate_num_epochs_per_decay = 1.0
    # The ONT preset's class_weights "1,1,10" (dv_config.py ont) tuned
    # for production-scale corpora collapses a ~70-example run into a
    # hom-alt-only predictor (measured: train f1_het 0.0 in all folds,
    # one fold 0 TP / 11 FP at GT level). Uniform weights here.
    config.class_weights = "1,1,1"
    import jax

    if jax.default_backend() == "cpu":
        config.use_mixed_precision = False

    exp_dir = os.path.join(workdir, "experiment")
    results = train_lib.train(config, exp_dir, log_fn=log_fn)
    if select == "final":
        # A fold's tune carve holds < 10 examples here; tune-best
        # selection over that is noise (measured: one fold's
        # tune-selected checkpoint scored 0 while its final epochs
        # were stable). With per-epoch LR decay the run converges, so
        # the final checkpoint is the default.
        ckpt_dir = os.path.join(exp_dir, "checkpoints")
        epochs = sorted(
            int(f.split("-")[1].split(".")[0])
            for f in os.listdir(ckpt_dir)
            if f.startswith("ckpt-")
        )
        ckpt = os.path.join(ckpt_dir, f"ckpt-{epochs[-1]}.msgpack")
    else:
        ckpt = os.path.join(exp_dir, "checkpoints", "best.msgpack")

    calling_ex = stage1("calling", [eval_region], "calling.tfrecord.gz")

    from deepvariant_tpu.scripts.call_variants import (
        load_variables_for_examples,
    )
    from deepvariant_tpu.calling.call_variants import call_variants
    from deepvariant_tpu.postprocess.pipeline import postprocess_variants
    from deepvariant_tpu.io.fasta import FastaReader

    model, variables, _ = load_variables_for_examples(
        ckpt, calling_ex["path"]
    )
    cvo_path = os.path.join(workdir, "cvo.tfrecord.gz")
    stats = call_variants(
        calling_ex["path"], cvo_path, variables,
        batch_size=batch_size, model=model,
    )
    log_fn(f"call_variants: {stats}")

    vcf_out = os.path.join(workdir, "out.vcf.gz")
    ref_reader = FastaReader(REF)
    pp = postprocess_variants(
        cvo_path, vcf_out, ref_reader.contigs, sample_name="HG002"
    )
    log_fn(f"postprocess: {pp}")

    metrics = vcf_eval.evaluate(
        TRUTH_VCF, vcf_out,
        confident_bed=CONFIDENT_BED,
        region=eval_region.replace(",", ""),
    )
    return {
        "eval_region": eval_region,
        "train_examples": train_ex["counts"]["examples"],
        "eval_examples": calling_ex["counts"]["examples"],
        "tune_f1_weighted": round(
            results.get("tune/f1_weighted", 0.0), 5
        ),
        "metrics": metrics,
    }


def run_cross_eval(
    workdir: str, n_folds: int = 3, log_fn=print, **kwargs
) -> dict:
    from deepvariant_tpu.scripts.accuracy_chr20 import _pool_metrics

    fold_results = []
    for i, (train_rs, tune_r, eval_r) in enumerate(
        _fold_regions(n_folds)
    ):
        result = run_fold(
            os.path.join(workdir, f"fold{i}"),
            train_rs, tune_r, eval_r,
            log_fn=log_fn, **kwargs,
        )
        log_fn(f"fold {i}: {json.dumps(result)}")
        fold_results.append(result)
    return {
        "eval_region": " + ".join(r["eval_region"] for r in fold_results),
        "train_examples": sum(
            r["train_examples"] for r in fold_results
        ),
        "eval_examples": sum(r["eval_examples"] for r in fold_results),
        "tune_f1_weighted": round(
            sum(r["tune_f1_weighted"] for r in fold_results)
            / len(fold_results), 5,
        ),
        "folds": fold_results,
        "metrics": _pool_metrics([r["metrics"] for r in fold_results]),
    }


def main(argv: Optional[Sequence[str]] = None) -> None:
    from deepvariant_tpu.utils.backend import maybe_force_cpu

    maybe_force_cpu()
    p = argparse.ArgumentParser("accuracy_ont")
    p.add_argument("--workdir", required=True)
    p.add_argument("--n_folds", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_epochs", type=int, default=60)
    p.add_argument("--learning_rate", type=float, default=0.002)
    p.add_argument("--select", choices=("best", "final"),
                   default="final",
                   help="which checkpoint calls variants: the final "
                        "(converged) epoch or tune-best (noisy at "
                        "this tune-set size)")
    p.add_argument("--out_json", default="")
    p.add_argument("--extra_channels", default="",
                   help="comma-separated channel enums appended to "
                        "the ONT_R104 preset for BOTH training and "
                        "calling (e.g. the homopolymer family)")
    args = p.parse_args(argv)
    from deepvariant_tpu.scripts.accuracy_longread import (
        resolve_channels,
    )

    channels = resolve_channels("ont", args.extra_channels)
    result = run_cross_eval(
        args.workdir,
        n_folds=args.n_folds,
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        learning_rate=args.learning_rate,
        select=args.select,
        channels=channels,
    )
    if channels:
        result["channels_override"] = list(channels)
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

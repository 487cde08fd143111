"""Training CLI (reference train.py flag surface, config-driven).

Usage:
  dv-train --config wgs \
    --train_dataset_config train_ds.pbtxt \
    --tune_dataset_config tune_ds.pbtxt \
    --experiment_dir /out/exp1 [--batch_size N] [--num_epochs N]

Dataset configs are DeepVariantDatasetConfig pbtxt files
(training.data.DatasetConfig: name / tfrecord_path / num_examples).
Training shards data-parallel over all visible devices
(jax.sharding.Mesh); on a multi-host TPU slice, launch one process
per host as usual for jax.distributed.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser("train")
    p.add_argument("--config", default="wgs",
                   help="preset: wgs/exome/pacbio/ont or *_test")
    p.add_argument("--train_dataset_config", required=True)
    p.add_argument("--tune_dataset_config", required=True)
    p.add_argument("--experiment_dir", required=True)
    p.add_argument("--init_checkpoint", default="")
    p.add_argument("--batch_size", type=int, default=0)
    p.add_argument("--num_epochs", type=int, default=0)
    p.add_argument("--limit", type=int, default=0,
                   help="cap steps per epoch/tune pass (smoke runs)")
    p.add_argument("--max_steps", type=int, default=0)
    args = p.parse_args(argv)

    import dataclasses

    from deepvariant_tpu.training.config import get_config
    from deepvariant_tpu.training.train import train

    config = get_config(args.config)
    overrides = {
        "train_dataset_config": args.train_dataset_config,
        "tune_dataset_config": args.tune_dataset_config,
    }
    if args.init_checkpoint:
        overrides["init_checkpoint"] = args.init_checkpoint
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.num_epochs:
        overrides["num_epochs"] = args.num_epochs
    if args.limit:
        overrides["limit"] = args.limit
    config = dataclasses.replace(config, **overrides)
    metrics = train(
        config, args.experiment_dir,
        max_steps=args.max_steps or None,
    )
    print(f"train done: {metrics}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

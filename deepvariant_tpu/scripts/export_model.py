"""Export a training checkpoint for release/inference.

Reference parity: convert_to_saved_model.py — takes a training
checkpoint (full state incl. optimizer), extracts the inference
parameters (EMA by default), and writes a lean inference bundle:
  <out>/model.msgpack        params + batch_stats only
  <out>/example_info.json    the data contract (shape + channels)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys


def export(checkpoint_path: str, output_dir: str, use_ema: bool = True,
           example_info_path: str = "") -> str:
    import jax

    # Export is pure host-side serialization: never initialize an
    # accelerator backend for it (also avoids failures when a TPU
    # plugin is present but unusable in this process).
    if not jax._src.xla_bridge.backends_are_initialized():
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import serialization

    from deepvariant_tpu.models.inception_v3 import create_model
    from deepvariant_tpu.training import train as train_lib
    from deepvariant_tpu.training.config import TrainConfig

    info_path = example_info_path or os.path.join(
        os.path.dirname(checkpoint_path), "example_info.json"
    )
    with open(info_path) as f:
        info = json.load(f)
    h, w, c = info["shape"]
    model, variables = create_model(c, height=h, width=w)
    tx, _ = train_lib.make_optimizer(TrainConfig(), 100)
    state = train_lib.init_state(model, variables, tx)
    state = train_lib.load_checkpoint(checkpoint_path, state)
    params = state["ema_params"] if use_ema else state["params"]
    bundle = {"params": params, "batch_stats": state["batch_stats"]}
    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, "model.msgpack")
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(bundle))
    with open(os.path.join(output_dir, "example_info.json"), "w") as f:
        json.dump(info, f)
    return out_path


def load_exported(model_dir: str):
    """Load an exported bundle -> (model, variables, example_info)."""
    import jax.numpy as jnp
    from flax import serialization

    from deepvariant_tpu.models.inception_v3 import create_model

    with open(os.path.join(model_dir, "example_info.json")) as f:
        info = json.load(f)
    h, w, c = info["shape"]
    model, variables = create_model(c, height=h, width=w)
    with open(os.path.join(model_dir, "model.msgpack"), "rb") as f:
        variables = serialization.from_bytes(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            f.read(),
        )
    return model, variables, info


def main(argv=None) -> int:
    p = argparse.ArgumentParser("export_model")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--use_ema", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--example_info", default="")
    args = p.parse_args(argv)
    out = export(args.checkpoint, args.output_dir, args.use_ema,
                 args.example_info)
    print(f"export_model: wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

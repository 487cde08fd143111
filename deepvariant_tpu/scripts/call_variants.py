"""call_variants CLI (stage 2): examples TFRecord -> CVO TFRecord.

Mirrors the reference call_variants.py main (:1056) flag surface for the
implemented subset. The checkpoint is a flax msgpack state saved by
deepvariant_tpu.training (or a fresh-init model for smoke runs with
--allow_uninitialized_model).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax.numpy as jnp

from deepvariant_tpu.calling.call_variants import call_variants
from deepvariant_tpu.io import examples as example_codec
from deepvariant_tpu.models.inception_v3 import create_model


def resolve_checkpoint_path(checkpoint: str) -> str:
    """Accepts a model directory (dv-export-model / dv-train output)
    or a direct .msgpack file; directories resolve to model.msgpack,
    then best.msgpack."""
    if checkpoint and os.path.isdir(checkpoint):
        for name in ("model.msgpack", "best.msgpack"):
            candidate = os.path.join(checkpoint, name)
            if os.path.exists(candidate):
                return candidate
        raise SystemExit(
            f"checkpoint directory {checkpoint} contains neither "
            "model.msgpack nor best.msgpack"
        )
    return checkpoint


def load_variables_for_examples(checkpoint: str, examples_path: str,
                                use_ema: bool = True):
    """Build the model for the examples' shape; load checkpoint params."""
    info = example_codec.read_example_info(examples_path)
    model, variables = load_variables_for_shape(
        checkpoint, info["shape"],
        expected_channels=info.get("channels"), use_ema=use_ema,
    )
    return model, variables, info


def load_variables_for_shape(checkpoint: str, shape,
                             expected_channels=None,
                             use_ema: bool = True):
    """Shape-based loader core: used by the file path above and by the
    fused streaming pipeline, where the shape comes from the first
    streamed example instead of an example_info.json sidecar."""
    checkpoint = resolve_checkpoint_path(checkpoint)
    h, w, c = shape
    info = {"shape": [h, w, c], "channels": list(expected_channels or [])}
    model, variables = create_model(c, height=h, width=w)
    if checkpoint:
        from deepvariant_tpu.training import train as train_lib
        from deepvariant_tpu.training.config import TrainConfig

        # Data-contract check (check_example_info,
        # call_variants.py:490): fail with a clear message instead of
        # a flax shape error when the checkpoint's channel set differs
        # from the examples'.
        ckpt_info_path = os.path.join(
            os.path.dirname(checkpoint), "example_info.json"
        )
        if os.path.exists(ckpt_info_path):
            import json

            with open(ckpt_info_path) as f:
                ckpt_info = json.load(f)
            if list(ckpt_info.get("shape", [])) and                     list(ckpt_info["shape"]) != list(info["shape"]):
                raise SystemExit(
                    "example shape mismatch: checkpoint was trained "
                    f"on {ckpt_info['shape']} "
                    f"(channels {ckpt_info.get('channels')}), examples "
                    f"are {info['shape']} "
                    f"(channels {info.get('channels')})"
                )
        with open(checkpoint, "rb") as f:
            blob = f.read()
        from flax import serialization

        try:
            # Lean inference bundle (dv-export-model /
            # dv-import-keras-model): params + batch_stats only.
            variables = serialization.from_bytes(
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]},
                blob,
            )
        except ValueError:
            try:
                # Device-resident trainer snapshot (train_resident.py):
                # params + batch_stats + ema_params + step, no opt state.
                snap = serialization.from_bytes(
                    {
                        "params": variables["params"],
                        "batch_stats": variables["batch_stats"],
                        "ema_params": variables["params"],
                        "step": jnp.zeros((), jnp.int32),
                    },
                    blob,
                )
                params = snap["ema_params"] if use_ema else snap["params"]
                variables = {
                    "params": params,
                    "batch_stats": snap["batch_stats"],
                }
            except ValueError:
                # Full training state.
                tx, _ = train_lib.make_optimizer(TrainConfig(), 100)
                state = train_lib.init_state(model, variables, tx)
                state = serialization.from_bytes(state, blob)
                params = (
                    state["ema_params"] if use_ema else state["params"]
                )
                variables = {
                    "params": params, "batch_stats": state["batch_stats"],
                }
    return model, variables


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("call_variants")
    p.add_argument("--examples", required=True)
    p.add_argument("--outfile", required=True)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--batch_size", type=int, default=2048)
    p.add_argument("--use_ema", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--allow_uninitialized_model", action="store_true",
                   help="run with fresh-init weights (smoke testing only)")
    p.add_argument("--include_debug_info", action="store_true",
                   help="emit CallVariantsOutput.DebugInfo (predicted/"
                        "true label, variant class flags)")
    p.add_argument("--limit", type=int, default=0,
                   help="process at most this many examples (0 = all)")
    p.add_argument("--max_batches", type=int, default=0,
                   help="process at most this many batches (0 = all)")
    p.add_argument("--allow_empty_examples",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="succeed on empty example inputs (writes an "
                        "empty CVO file); --no-allow_empty_examples "
                        "errors instead")
    p.add_argument(
        "--fast_graph", action="store_true",
        help="inference-graph fast path: fold batch norm into the "
             "convs and pad the stem input channels to 8 (both exact "
             "rewrites, models/inception_v3.py; measured +1.2% and "
             "~30x lower variance, deploy/infer_study_r05.json). "
             "Opt-in: output probabilities differ from the default "
             "graph at float32-rounding level.")
    p.add_argument(
        "--writer_threads", type=int, default=0,
        help="CVO writer processes (reference call_variants.py:189). "
        "0 = autodetect: 1 when inference runs on CPU, all cores "
        "(max 16) when an accelerator is present.",
    )
    return p


def resolve_writer_processes(writer_threads: int) -> int:
    """Autodetect rule (reference call_variants.py:805-821): explicit
    value wins; otherwise 1 on CPU, min(cpus, 16) with an accelerator."""
    if writer_threads > 0:
        return min(writer_threads, 16)
    import jax

    if jax.default_backend() == "cpu":
        return 1
    return min(os.cpu_count() or 1, 16)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.checkpoint and not args.allow_uninitialized_model:
        print("error: --checkpoint is required (or pass "
              "--allow_uninitialized_model for smoke runs)",
              file=sys.stderr)
        return 2
    model, variables, info = load_variables_for_examples(
        args.checkpoint, args.examples, use_ema=args.use_ema
    )
    stats = call_variants(
        args.examples, args.outfile, variables,
        batch_size=args.batch_size, model=model,
        num_writers=resolve_writer_processes(args.writer_threads),
        include_debug_info=args.include_debug_info,
        limit=args.limit, max_batches=args.max_batches,
        fast_graph=args.fast_graph,
    )
    if stats["num_examples"] == 0 and not args.allow_empty_examples:
        print("error: no examples found (pass --allow_empty_examples "
              "to accept empty inputs)", file=sys.stderr)
        return 1
    print(
        f"call_variants done: {stats['num_examples']} examples at "
        f"{stats['examples_per_sec']:.1f} examples/s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

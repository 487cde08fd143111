"""Import a reference keras InceptionV3 checkpoint (.h5 / .keras) into
a TPU-native inference bundle (model.msgpack + example_info.json),
ready for call_variants --checkpoint-free --model_dir use via
export_model.load_exported.

Usage:
  python -m deepvariant_tpu.scripts.import_keras_model \
    --keras_model model.h5 --num_channels 7 --output_dir release/
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser("import_keras_model")
    p.add_argument("--keras_model", required=True,
                   help=".h5 or .keras file of the reference "
                        "InceptionV3 (backbone or full model)")
    p.add_argument("--num_channels", type=int, required=True)
    p.add_argument("--height", type=int, default=100)
    p.add_argument("--width", type=int, default=221)
    p.add_argument("--channels", default="",
                   help="comma-separated channel enums for "
                        "example_info.json (data contract)")
    p.add_argument("--output_dir", required=True)
    args = p.parse_args(argv)

    import jax

    if not jax._src.xla_bridge.backends_are_initialized():
        jax.config.update("jax_platforms", "cpu")
    import tensorflow as tf
    from flax import serialization

    from deepvariant_tpu.models.keras_import import load_keras_into_flax

    keras_model = tf.keras.models.load_model(
        args.keras_model, compile=False
    )
    model, variables = load_keras_into_flax(
        keras_model, args.num_channels, args.height, args.width
    )
    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, "model.msgpack")
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(variables))
    info = {
        "version": "1.10.0",
        "shape": [args.height, args.width, args.num_channels],
        "channels": [int(c) for c in args.channels.split(",") if c],
    }
    with open(os.path.join(args.output_dir, "example_info.json"),
              "w") as f:
        json.dump(info, f)
    print(f"import_keras_model: wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

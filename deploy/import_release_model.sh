#!/bin/sh
# Convert one reference release model directory (SavedModel or .keras
# + model.example_info.json) into a TPU-native inference bundle.
#
#   import_release_model.sh /opt/models/wgs
#
# Reads shape/channels from model.example_info.json (the reference's
# data contract sidecar, call_variants.py:648-746) and runs
# dv-import-keras-model, producing model.msgpack + example_info.json
# in the same directory.
set -eu
dir="$1"
info="$dir/model.example_info.json"
[ -f "$info" ] || { echo "no $info; skipping" >&2; exit 0; }

shape_args=$(python3 - "$info" <<'EOF'
import json, sys
info = json.load(open(sys.argv[1]))
h, w, c = info["shape"]
chans = ",".join(str(x) for x in info.get("channels", []))
print(f"--height {h} --width {w} --num_channels {c} --channels {chans}")
EOF
)

model="$dir"
[ -f "$dir/model.keras" ] && model="$dir/model.keras"

# shellcheck disable=SC2086
dv-import-keras-model --keras_model "$model" $shape_args \
  --output_dir "$dir"

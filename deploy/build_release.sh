#!/bin/sh
# Build release artifacts (reference: build_release_binaries.sh).
#
# The reference builds bazel par binaries; the TPU-native release is:
#   * a portable wheel (native runtime compiled for x86-64-v2 by
#     setup.py; ctypes ABI, so one .so serves every CPython)
#   * an sdist for from-source installs
#   * the four product Docker images (deploy/Dockerfile*)
#
# Usage: deploy/build_release.sh [outdir]   (default: dist/)
set -eu
cd "$(dirname "$0")/.."
out="${1:-dist}"

# Portable native build (no -march=native in release artifacts).
DVNATIVE_MARCH=x86-64-v2 python3 - <<'EOF'
import setup
ok = setup.compile_native()
print("native runtime:", "built" if ok else "skipped (no compiler)")
EOF

python3 -m pip wheel --no-deps --no-build-isolation -w "$out" .
(python3 -m build --sdist --no-isolation --outdir "$out" 2>/dev/null) \
  || echo "sdist skipped ('build' module unavailable)"

# Smoke: the wheel must carry the native lib and multiallelic weights.
python3 - "$out" <<'EOF'
import glob, sys, zipfile
whl = sorted(glob.glob(sys.argv[1] + "/deepvariant_tpu-*.whl"))
if not whl:
    sys.exit("no wheel produced")
names = zipfile.ZipFile(whl[-1]).namelist()
for want in ("deepvariant_tpu/io/_dvnative.so",
             "deepvariant_tpu/postprocess/data/"):
    assert any(n.startswith(want) for n in names), f"wheel missing {want}"
print("wheel ok:", whl[-1])
EOF

cat <<MSG
Docker images (require network + docker):
  docker build -f deploy/Dockerfile -t deepvariant-tpu .
  docker build -f deploy/Dockerfile.deeptrio -t deeptrio-tpu .
  docker build -f deploy/Dockerfile.deepsomatic -t deepsomatic-tpu .
  docker build -f deploy/Dockerfile.pangenome_aware_deepvariant \\
    -t pangenome-aware-deepvariant-tpu .
  docker build -f deploy/Dockerfile.tpu-train -t deepvariant-tpu-train .
MSG

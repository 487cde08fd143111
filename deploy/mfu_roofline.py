"""MFU roofline analysis for the InceptionV3 inference/train graphs.

Answers "why does measured MFU plateau near 0.39, and what is the
architecture's achievable ceiling on this chip?" with per-layer
arithmetic rather than hand-waving.

Method: lower the exact jitted forward (the same function bench.py
times) to HLO, parse every convolution / dot op's operand shapes, and
model the MXU's tile quantization: a TPU v5e MXU consumes 128-wide
contraction slices and produces 128-wide output slices (8-deep
sublanes on the batch/spatial dim). A conv whose effective contraction
depth K = kh*kw*Cin or output width N = Cout is not a multiple of 128
wastes the remainder lanes, so its best-case utilization is

    eff = (K / ceil128(K)) * (N / ceil128(N)) * (M / ceil8(M))

The FLOPs-weighted harmonic mean of `eff` over all matmul-shaped ops
is the compute-side ceiling: the MFU the chip could reach if every
byte were already in VMEM and nothing else cost time. Memory-bound
ops (pooling, concat, normalize) and inter-layer HBM traffic push the
real number below it; the gap between this ceiling and bench.py's
measurement is the scheduling/bandwidth share.

Usage:
    python deploy/mfu_roofline.py [--batch 2048] [--train]
Writes deploy/mfu_roofline_r03.json and prints a summary table.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import re
from typing import Dict, List


def _rup(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# StableHLO (MLIR) formats from jax.jit(...).lower(...).as_text():
#   stablehlo.convolution(%a, %b) dim_numbers = [b, 0, 1, f]x[0, 1, i, o]
#       ->[b, 0, 1, f], window = {...} ... :
#       (tensor<BxHxWxCxbf16>, tensor<KHxKWxCIxCOxbf16>)
#       -> tensor<BxHoxWoxCOxbf16>
#   stablehlo.dot_general %a, %b, [batching_dims = [..] x [..],]
#       contracting_dims = [i] x [j], ... :
#       (tensor<MxKxf32>, tensor<KxNxf32>) -> tensor<MxNxf32>
# The backward pass permutes these layouts (weight-grad convs are
# [f,0,1,b]x[i,0,1,o]->[0,1,b,f]; data-grad convs swap i/o), so k/n/m
# MUST come from the dim_numbers / contracting_dims clauses, not from
# assumed positions.
_CONV = re.compile(
    r"stablehlo\.convolution\(.*?"
    r"dim_numbers\s*=\s*\[([^\]]*)\]x\[([^\]]*)\]->\[([^\]]*)\]"
    r".*?:\s*"
    r"\(tensor<([\dx]+)x\w+>,\s*tensor<([\dx]+)x\w+>\)"
    r"\s*->\s*tensor<([\dx]+)x\w+>",
    re.DOTALL,
)
_BATCH_GROUPS = re.compile(r"batch_group_count\s*=\s*(\d+)")
_DOT = re.compile(
    r"stablehlo\.dot_general\s.*?"
    r"contracting_dims\s*=\s*\[([\d,\s]*)\]\s*x\s*\[([\d,\s]*)\]"
    r".*?:\s*"
    r"\(tensor<([\dx]+)x\w+>,\s*tensor<([\dx]+)x\w+>\)"
    r"\s*->\s*tensor<([\dx]+)x\w+>",
    re.DOTALL,
)
_DOT_BATCHING = re.compile(
    r"batching_dims\s*=\s*\[([\d,\s]*)\]\s*x\s*\[([\d,\s]*)\]"
)


def _dims(s: str) -> List[int]:
    return [int(d) for d in s.split("x") if d]


def _spec(s: str) -> List[str]:
    """Parse one side of a dim_numbers clause: 'b, 0, 1, f' ->
    ['b', '0', '1', 'f']."""
    return [tok.strip() for tok in s.split(",") if tok.strip()]


def _int_list(s: str) -> List[int]:
    return [int(tok) for tok in s.split(",") if tok.strip()]


def analyze_hlo(hlo_text: str) -> List[Dict]:
    """Matmul-shaped ops with FLOPs and modeled MXU efficiency.

    Layout-aware: the kernel's 'i'/'o' dims and the output's 'f' dim
    are located from each op's dim_numbers clause, and dot_general
    contraction/batching dims come from its attribute lists, so forward
    convs, weight-grad convs ([f,0,1,b]x[i,0,1,o]->[0,1,b,f]),
    data-grad convs (i/o transposed) and transposed dots all get
    correct k/n/m. Ops whose clauses can't be parsed are skipped and
    counted in the caller's skipped-FLOPs tally rather than
    mis-modeled.
    """
    ops = []
    for line in hlo_text.splitlines():
        m = _CONV.search(line)
        if m:
            lhs_spec, rhs_spec, out_spec = (
                _spec(g) for g in m.groups()[:3]
            )
            lhs_d, rhs_d, out_d = (_dims(g) for g in m.groups()[3:])
            if (len(rhs_spec) != len(rhs_d)
                    or len(out_spec) != len(out_d)
                    or "i" not in rhs_spec or "o" not in rhs_spec
                    or "f" not in out_spec):
                continue
            # Contraction depth = prod(kernel spatial) * kernel-input;
            # output width = kernel-output features; M = everything
            # else in the output (batch x spatial).
            cin = rhs_d[rhs_spec.index("i")]
            cout = rhs_d[rhs_spec.index("o")]
            kspatial = math.prod(
                d for s, d in zip(rhs_spec, rhs_d) if s.isdigit()
            )
            bg = _BATCH_GROUPS.search(line)
            bgroups = int(bg.group(1)) if bg else 1
            # Kernel 'i' is already per-feature-group, so K needs no
            # feature_group correction; batch groups split the output
            # features contracted per M element.
            k = kspatial * cin
            n = cout // max(bgroups, 1)
            mdim = math.prod(
                d for s, d in zip(out_spec, out_d) if s != "f"
            )
            flops = 2.0 * mdim * k * n
            eff = (k / _rup(k, 128)) * (n / _rup(n, 128)) \
                * (mdim / _rup(mdim, 8))
            spatial_str = "x".join(
                str(d) for s, d in zip(out_spec, out_d) if s.isdigit()
            )
            ops.append({
                "kind": "conv",
                "shape": f"{kspatial}(sp)x{cin}->{n} @{spatial_str}",
                "k": k, "n": n, "m": mdim,
                "flops": flops, "eff": round(eff, 4),
            })
            continue
        m = _DOT.search(line)
        if m:
            lc, rc = _int_list(m.group(1)), _int_list(m.group(2))
            lhs, rhs, out = (_dims(g) for g in m.groups()[2:])
            if len(lhs) < 1 or len(rhs) < 1:
                continue
            bm = _DOT_BATCHING.search(line)
            lb = _int_list(bm.group(1)) if bm else []
            rb = _int_list(bm.group(2)) if bm else []
            if (any(d >= len(lhs) for d in lc + lb)
                    or any(d >= len(rhs) for d in rc + rb)):
                continue
            k = math.prod(lhs[d] for d in lc) if lc else 1
            bdim = math.prod(lhs[d] for d in lb) if lb else 1
            mdim = math.prod(
                d for i, d in enumerate(lhs) if i not in lc + lb
            )
            n = math.prod(
                d for i, d in enumerate(rhs) if i not in rc + rb
            )
            flops = 2.0 * bdim * mdim * k * n
            # Each batch slice is an independent MXU matmul; lane
            # quantization applies per slice.
            eff = (k / _rup(k, 128)) * (n / _rup(n, 128)) \
                * (mdim / _rup(mdim, 8))
            ops.append({
                "kind": "dot",
                "shape": (f"{bdim}x" if bdim > 1 else "")
                + f"[{mdim}x{k}]x[{k}x{n}]",
                "k": k, "n": n, "m": mdim,
                "flops": flops, "eff": round(eff, 4),
            })
    return ops


def roofline(batch: int, train: bool) -> Dict:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepvariant_tpu.models.inception_v3 import (
        create_model,
        normalize_pileup,
    )

    model, variables = create_model(7, dtype=jnp.bfloat16)
    x = np.zeros((batch, 100, 221, 7), np.uint8)
    if train:
        from deepvariant_tpu.training import train as train_lib
        from deepvariant_tpu.training.config import get_config

        config = get_config("wgs")
        config.batch_size = batch
        tx, _ = train_lib.make_optimizer(config, 100)
        state = train_lib.init_state(model, variables, tx)
        step = train_lib.make_train_step(model, tx, config)
        data = {
            "images": x,
            "labels": np.zeros(batch, np.int32),
            "sample_weights": np.ones(batch, np.float32),
            "variant_types": np.ones(batch, np.int32),
        }

        def fn(s, b):
            new_s, loss, _ = step(s, b)
            # Probe EVERY leaf: keeping only a few alive lets XLA DCE
            # most of the backward out of the analyzed graph (round-4
            # finding — the r03 train ceiling was computed on a
            # partial backward).
            leaves = jax.tree_util.tree_leaves(new_s["params"])
            return loss + sum(
                l.astype(jnp.float32).sum() for l in leaves
            ) * jnp.float32(1e-30)

        hlo = jax.jit(fn).lower(state, data).as_text()
    else:
        def fn(v, b):
            return model.apply(
                v, normalize_pileup(b), train=False
            ).astype(jnp.float32).sum()

        hlo = jax.jit(fn).lower(variables, x).as_text()

    ops = analyze_hlo(hlo)
    total = sum(o["flops"] for o in ops)
    # FLOPs-weighted harmonic mean: total work / total MXU-cycles.
    cycles = sum(o["flops"] / max(o["eff"], 1e-9) for o in ops)
    ceiling = total / cycles if cycles else 0.0
    by_share = sorted(ops, key=lambda o: -o["flops"])
    # Detect-and-report: matmul ops whose dim_numbers clause did not
    # parse are excluded from the model, never mis-assigned.
    n_matmul_lines = sum(
        1 for line in hlo.splitlines()
        if "stablehlo.convolution" in line
        or "stablehlo.dot_general" in line
    )
    return {
        "batch": batch,
        "graph": "train" if train else "inference",
        "n_matmul_ops": len(ops),
        "n_unparsed_matmul_ops": n_matmul_lines - len(ops),
        "total_matmul_flops": total,
        "mxu_tile_ceiling_mfu": round(ceiling, 4),
        "worst_offenders": [
            {**o, "flops_share": round(o["flops"] / total, 4)}
            for o in by_share[:12]
        ],
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--train", action="store_true")
    p.add_argument("--out", default="")
    args = p.parse_args()
    result = roofline(args.batch, args.train)
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "mfu_roofline_r04.json",
    )
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing[result["graph"]] = result
    with open(out, "w") as f:
        json.dump(existing, f, indent=1)
    print(f"{result['graph']} batch={result['batch']}: "
          f"MXU tile ceiling = {result['mxu_tile_ceiling_mfu']:.3f} MFU "
          f"over {result['n_matmul_ops']} matmul ops")
    for o in result["worst_offenders"][:8]:
        print(f"  {o['flops_share']*100:5.1f}%  eff={o['eff']:.3f}  "
              f"{o['kind']} {o['shape']}")


if __name__ == "__main__":
    main()

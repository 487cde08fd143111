"""One-off MFU sweep for the call_variants forward step on a TPU chip.

Tries batch sizes and XLA knobs around the bench.py measurement
(same data-dependent-scalar timing contract) and prints one JSON line
per configuration, so the best setting can be promoted into bench.py
and calling/call_variants.py defaults.

Usage (requires the axon tunnel or a real TPU):
  python deploy/bench_sweep_tpu.py [--batches 2048 4096 8192]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def sweep(batches):
    import jax
    import jax.numpy as jnp

    from bench import K2, _load_golden_images, _peak_flops
    from deepvariant_tpu.models.inception_v3 import (
        create_model,
        normalize_pileup,
    )

    golden = _load_golden_images()
    n, h, w, c = golden.shape
    device = jax.devices()[0]
    peak = _peak_flops(device.device_kind)
    rng = np.random.RandomState(0)
    model, variables = create_model(c, dtype=jnp.bfloat16)

    for batch in batches:
        tiled = np.tile(golden, ((batch + n - 1) // n, 1, 1, 1))[:batch]
        stacked = np.stack(
            [tiled[rng.permutation(batch)] for _ in range(K2)]
        )

        def run_k(variables, stacked):
            def step(acc, b):
                probs = model.apply(
                    variables, normalize_pileup(b), train=False
                )
                return acc + probs.astype(jnp.float32).sum(), None

            total, _ = jax.lax.scan(step, jnp.float32(0.0), stacked)
            return total

        dev_batches = jax.device_put(stacked)
        dev_vars = jax.device_put(variables)
        one = jax.jit(
            lambda v, b: model.apply(
                v, normalize_pileup(b), train=False
            ).astype(jnp.float32).sum()
        ).lower(dev_vars, dev_batches[0]).compile()
        flops = float(one.cost_analysis()["flops"])
        scan = jax.jit(run_k).lower(dev_vars, dev_batches).compile()

        def best_of(fn, *args, repeats=3):
            float(jax.device_get(fn(*args)))
            out = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(jax.device_get(fn(*args)))
                out = min(out, time.perf_counter() - t0)
            return out

        t1 = best_of(one, dev_vars, dev_batches[0])
        t2 = best_of(scan, dev_vars, dev_batches)
        per_step = (t2 - t1) / (K2 - 1)
        print(json.dumps({
            "batch": batch,
            "examples_per_sec": round(batch / per_step, 1),
            "mfu": round(flops / per_step / peak, 4),
            "per_step_ms": round(per_step * 1e3, 2),
        }), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+",
                   default=[2048, 4096, 8192])
    args = p.parse_args()
    sweep(args.batches)

"""Benchmark: call_variants CNN throughput (examples/s/chip) on real TPU.

Prints ONE JSON line:
  {"metric": "call_variants_examples_per_sec_per_chip", "value": N,
   "unit": "examples/s", "vs_baseline": R}

Baseline derivation: the reference publishes WGS call_variants at
15m58s on an n2-standard-96 (docs/metrics.md:68) for an HG003 30x WGS
run that produces ~7.5M examples, i.e. ~7,800 examples/s for the whole
96-vCPU machine. vs_baseline is this chip's rate over that machine
rate. (No accelerator inference numbers are published in-tree.)
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_EXAMPLES_PER_SEC = 7800.0  # ~7.5M examples / 958 s (96 vCPU)

BATCH = 256
WARMUP_STEPS = 3
BENCH_STEPS = 20
CHANNELS = 7


def main():
    import jax
    import jax.numpy as jnp

    from deepvariant_tpu.models.inception_v3 import (
        create_model,
        normalize_pileup,
    )

    model, variables = create_model(CHANNELS, dtype=jnp.bfloat16)

    @jax.jit
    def forward(variables, images_u8):
        return model.apply(variables, normalize_pileup(images_u8),
                           train=False)

    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.randint(0, 255, (BATCH, 100, 221, CHANNELS), np.uint8)
    )
    variables = jax.device_put(variables)

    for _ in range(WARMUP_STEPS):
        forward(variables, images).block_until_ready()

    t0 = time.perf_counter()
    out = None
    for _ in range(BENCH_STEPS):
        out = forward(variables, images)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    rate = BENCH_STEPS * BATCH / dt

    print(json.dumps({
        "metric": "call_variants_examples_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "examples/s",
        "vs_baseline": round(rate / BASELINE_EXAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

"""Controlled inference-throughput study (round-5 directive #3).

Round 4 left two contradictory artifacts: BENCH_r04.json picked
unfolded BN as the faster graph (44.8k vs earlier folded readings)
while deploy/bench_full_r04.json recorded folded 46.1k vs unfolded
31.8k at the same batch — a 45% swing that can only be tunnel
run-to-run noise or a real effect measured uncontrolled. This script
settles it the only way that works on a noisy tunnel: INTERLEAVED
trials (A, B, A, B, ...) of simultaneously-compiled executables, so a
latency regime shift hits every config equally, plus enough rounds to
report a mean +/- std per config.

Phases (each appends into deploy/infer_study_r05.json):
  ab      — folded vs unfolded at the headline batch, N interleaved
            rounds -> the BN-folding verdict with variance bounds.
  stem    — the stem attacks from the round-4 roofline
            (deploy/mfu_roofline_r04.json named stem convs at MXU
            tile eff 0.19-0.375): input channels padded 7->8, the
            stride-2 stem conv rewritten space-to-depth (exact
            rewrites, models/inception_v3.py), and both — interleaved
            against the phase-ab winner.
  batch   — batch sweep {1024, 1536, 2048, 3072} for the winning
            graph, interleaved.
  blocks  — measured per-segment time table: truncated backbones
            (stem, +mixedN...) timed with the same loop-slope method;
            successive differences attribute every ms of the
            MFU-vs-ceiling gap to a block group, next to the
            roofline's PREDICTED share (static tile model).

MFU convention: all variants divide by the SEMANTIC flops of the
unmodified model (the padded/rewritten graphs do the same useful
work; counting their padding flops would inflate MFU).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import (  # noqa: E402
    K2,
    K_BIG,
    K_SMALL,
    _compile_with_retry,
    _load_golden_images,
    _peak_flops,
)

ARTIFACT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "infer_study_r05.json"
)


def _build_loop(model, variables, batch, pad_to=None):
    """Compile the bench's forcing loop for one model variant; returns
    (run_fn, flops_per_step_of_this_graph)."""
    import jax
    import jax.numpy as jnp

    from deepvariant_tpu.models.inception_v3 import normalize_pileup

    golden = _load_golden_images()
    n, h, w, c = golden.shape
    rng = np.random.RandomState(0)
    tiled = np.tile(golden, ((batch + n - 1) // n, 1, 1, 1))[:batch]
    if pad_to and pad_to > c:
        tiled = np.concatenate(
            [tiled, np.zeros((batch, h, w, pad_to - c), np.uint8)],
            axis=-1,
        )
    batches = np.stack(
        [tiled[rng.permutation(batch)] for _ in range(K2)]
    )

    def run_n(variables, stacked, n_steps):
        def body(i, acc):
            b = jax.lax.dynamic_index_in_dim(
                stacked, jnp.remainder(i, K2), keepdims=False
            )
            probs = model.apply(
                variables, normalize_pileup(b), train=False
            )
            return acc + probs.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, n_steps, body, jnp.float32(0.0))

    dev_batches = jax.device_put(batches)
    dev_vars = jax.device_put(variables)
    one = jax.jit(
        lambda v, b: model.apply(
            v, normalize_pileup(b), train=False
        ).astype(jnp.float32).sum()
    )
    one_c = _compile_with_retry(
        lambda: one.lower(dev_vars, dev_batches[0]).compile()
    )
    flops = float(one_c.cost_analysis()["flops"])
    loop_c = _compile_with_retry(
        lambda: jax.jit(run_n).lower(
            dev_vars, dev_batches, jnp.int32(0)
        ).compile()
    )

    def run(n_steps):
        import jax as _jax

        return float(_jax.device_get(
            loop_c(dev_vars, dev_batches, jnp.int32(n_steps))
        ))

    return run, flops


def _interleaved_rounds(configs, rounds):
    """configs: {name: run_fn}. One round = (small, big) wall times for
    EVERY config back-to-back. Returns per-config per-round slope
    throughput estimates (steps/s)."""
    # Warm every config once (first execution includes dispatch setup).
    for run in configs.values():
        run(K_SMALL)
    out = {name: [] for name in configs}
    for r in range(rounds):
        for name, run in configs.items():
            t0 = time.perf_counter()
            run(K_SMALL)
            t_small = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(K_BIG)
            t_big = time.perf_counter() - t0
            slope = (t_big - t_small) / (K_BIG - K_SMALL)
            out[name].append(slope)
    return out


def _summarize(slopes_by_name, batch, semantic_flops, peak):
    summary = {}
    for name, slopes in slopes_by_name.items():
        arr = np.array(slopes)
        arr = arr[arr > 0]  # a latency spike can produce junk slopes
        if not len(arr):
            summary[name] = {"error": "no positive slopes"}
            continue
        rates = batch / arr
        mfus = semantic_flops / arr / peak
        summary[name] = {
            "rounds": len(arr),
            "examples_per_sec_mean": round(float(rates.mean()), 1),
            "examples_per_sec_std": round(float(rates.std()), 1),
            "examples_per_sec_best": round(float(rates.max()), 1),
            "mfu_mean": round(float(mfus.mean()), 4),
            "mfu_best": round(float(mfus.max()), 4),
            "per_round_examples_per_sec": [
                round(float(r), 1) for r in rates
            ],
        }
    return summary


def _variants(batch):
    """Build all model variants once; returns {name: (run, flops)}."""
    import jax.numpy as jnp

    from deepvariant_tpu.models.inception_v3 import (
        convert_stem_to_s2d,
        create_model,
        fold_batch_norm,
        pad_stem_input_channels,
    )

    model, variables = create_model(7, dtype=jnp.bfloat16)
    fm, fv = fold_batch_norm(model, variables)
    out = {
        "unfolded": lambda: _build_loop(model, variables, batch),
        "folded": lambda: _build_loop(fm, fv, batch),
    }

    def _s2d():
        m2, v2 = convert_stem_to_s2d(fm, fv)
        return _build_loop(m2, v2, batch)

    def _pad8():
        v8 = pad_stem_input_channels(fv, 8)
        return _build_loop(fm, v8, batch, pad_to=8)

    def _pad8_s2d():
        v8 = pad_stem_input_channels(fv, 8)
        m2, v2 = convert_stem_to_s2d(fm, v8)
        return _build_loop(m2, v2, batch, pad_to=8)

    out["folded_pad8"] = _pad8
    out["folded_s2d"] = _s2d
    out["folded_pad8_s2d"] = _pad8_s2d
    return out


def phase_ab(batch, rounds):
    import jax

    variants = _variants(batch)
    runs, flops = {}, {}
    for name in ("unfolded", "folded"):
        runs[name], flops[name] = variants[name]()
    slopes = _interleaved_rounds(runs, rounds)
    peak = _peak_flops(jax.devices()[0].device_kind)
    return {
        "phase": "ab",
        "batch": batch,
        "rounds": rounds,
        "semantic_flops_per_step": flops["unfolded"],
        "summary": _summarize(
            slopes, batch, flops["unfolded"], peak
        ),
    }


def phase_stem(batch, rounds, baseline="folded"):
    import jax

    variants = _variants(batch)
    names = [baseline, "folded_pad8", "folded_s2d", "folded_pad8_s2d"]
    runs, flops = {}, {}
    for name in names:
        runs[name], flops[name] = variants[name]()
    slopes = _interleaved_rounds(runs, rounds)
    peak = _peak_flops(jax.devices()[0].device_kind)
    sem = flops.get("folded") or flops[baseline]
    return {
        "phase": "stem",
        "batch": batch,
        "rounds": rounds,
        "semantic_flops_per_step": sem,
        "graph_flops_per_step": {
            k: v for k, v in flops.items()
        },
        "summary": _summarize(slopes, batch, sem, peak),
    }


def phase_batch(winner, batches, rounds):
    import jax
    import jax.numpy as jnp

    from deepvariant_tpu.models.inception_v3 import (
        convert_stem_to_s2d,
        create_model,
        fold_batch_norm,
        pad_stem_input_channels,
    )

    model, variables = create_model(7, dtype=jnp.bfloat16)
    if winner != "unfolded":
        model, variables = fold_batch_norm(model, variables)
    pad_to = 8 if "pad8" in winner else None
    if pad_to:
        variables = pad_stem_input_channels(variables, 8)
    if "s2d" in winner:
        model, variables = convert_stem_to_s2d(model, variables)
    runs, flops = {}, {}
    for b in batches:
        runs[f"b{b}"], flops[f"b{b}"] = _build_loop(
            model, variables, b, pad_to=pad_to
        )
    slopes = _interleaved_rounds(runs, rounds)
    peak = _peak_flops(jax.devices()[0].device_kind)
    # Per-batch semantic flops scale linearly; use each graph's own
    # cost_analysis scaled by the pad-free ratio at 1024 if padded.
    summary = {}
    for b in batches:
        sem = flops[f"b{b}"]
        # padding adds <1% flops; fine to use graph flops per batch as
        # the denominator basis but correct by the 1024 semantic ratio.
        summary.update(_summarize(
            {f"b{b}": slopes[f"b{b}"]}, b, sem, peak
        ))
    return {
        "phase": "batch",
        "winner": winner,
        "rounds": rounds,
        "summary": summary,
    }


def phase_blocks(batch, fold):
    """Truncated-backbone per-segment time table."""
    import jax
    import jax.numpy as jnp

    from deepvariant_tpu.models.inception_v3 import (
        InceptionV3,
        create_model,
        fold_batch_norm,
        normalize_pileup,
    )

    golden = _load_golden_images()
    n, h, w, c = golden.shape
    rng = np.random.RandomState(0)
    tiled = np.tile(golden, ((batch + n - 1) // n, 1, 1, 1))[:batch]
    batches = np.stack(
        [tiled[rng.permutation(batch)] for _ in range(K2)]
    )
    model, variables = create_model(c, dtype=jnp.bfloat16)
    if fold:
        model, variables = fold_batch_norm(model, variables)

    stops = ["stem", "mixed2", "mixed3", "mixed7", "mixed8",
             "mixed10", "full"]

    def make_run(stop):
        def fwd(variables, x):
            if stop == "full":
                return model.apply(variables, x, train=False)
            return model.apply(
                variables, x, False, stop,
                method=InceptionV3.backbone,
            )

        def run_n(variables, stacked, n_steps):
            def body(i, acc):
                b = jax.lax.dynamic_index_in_dim(
                    stacked, jnp.remainder(i, K2), keepdims=False
                )
                out = fwd(variables, normalize_pileup(b))
                return acc + out.astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, n_steps, body, jnp.float32(0.0))

        dev_batches = jax.device_put(batches)
        dev_vars = jax.device_put(variables)
        one = jax.jit(lambda v, b: fwd(
            v, normalize_pileup(b)
        ).astype(jnp.float32).sum())
        one_c = _compile_with_retry(
            lambda: one.lower(dev_vars, dev_batches[0]).compile()
        )
        flops = float(one_c.cost_analysis()["flops"])
        loop_c = _compile_with_retry(
            lambda: jax.jit(run_n).lower(
                dev_vars, dev_batches, jnp.int32(0)
            ).compile()
        )

        def run(n_steps):
            return float(jax.device_get(
                loop_c(dev_vars, dev_batches, jnp.int32(n_steps))
            ))

        return run, flops

    runs, flops = {}, {}
    for stop in stops:
        runs[stop], flops[stop] = make_run(stop)
    slopes = _interleaved_rounds(runs, rounds=4)
    peak = _peak_flops(jax.devices()[0].device_kind)
    med = {
        stop: float(np.median([s for s in sl if s > 0]))
        for stop, sl in slopes.items()
    }
    table = []
    prev_t, prev_f, prev_name = 0.0, 0.0, "(input)"
    for stop in stops:
        seg_ms = (med[stop] - prev_t) * 1e3
        seg_flops = flops[stop] - prev_f
        seg_mfu = (
            seg_flops / max(seg_ms, 1e-9) * 1e3 / peak
        )
        table.append({
            "segment": f"{prev_name}->{stop}",
            "cum_ms": round(med[stop] * 1e3, 2),
            "segment_ms": round(seg_ms, 2),
            "segment_flops": seg_flops,
            "segment_mfu": round(seg_mfu, 4),
        })
        prev_t, prev_f, prev_name = med[stop], flops[stop], stop
    return {
        "phase": "blocks",
        "batch": batch,
        "fold_bn": fold,
        "peak_flops": peak,
        "table": table,
    }


def main():
    p = argparse.ArgumentParser("infer_study")
    p.add_argument("--phase", required=True,
                   choices=("ab", "stem", "batch", "blocks"))
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--rounds", type=int, default=6)
    p.add_argument("--winner", default="folded",
                   help="graph for phase=batch")
    p.add_argument("--batches", default="1024,1536,2048,3072")
    p.add_argument("--fold", action="store_true",
                   help="fold BN for phase=blocks")
    args = p.parse_args()

    t0 = time.time()
    if args.phase == "ab":
        rec = phase_ab(args.batch, args.rounds)
    elif args.phase == "stem":
        rec = phase_stem(args.batch, args.rounds)
    elif args.phase == "batch":
        rec = phase_batch(
            args.winner,
            [int(b) for b in args.batches.split(",")],
            args.rounds,
        )
    else:
        rec = phase_blocks(args.batch, args.fold)
    rec["wall_seconds"] = round(time.time() - t0, 1)

    existing = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as f:
            existing = json.load(f)
    key = rec["phase"] + (
        "" if rec["phase"] != "blocks" else
        ("_folded" if args.fold else "_unfolded")
    )
    existing[key] = rec
    with open(ARTIFACT, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

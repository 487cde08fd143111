"""Train-step itemization + attack (round-5 directive #4).

Round 4 recorded train MFU 0.283 against a 0.551 tile ceiling with
69% of the 98.4 ms step unattributed ("backward + elementwise"), and
an unexplained batch-2048 regression (0.261 < 0.280 @ 1024). This
study measures, with the same interleaved-trial discipline as
deploy/infer_study.py:

  ablate — production step vs stripped variants at the headline
           batch: no-EMA/no-metrics ("plain"), full-recompute remat
           (policy=nothing saveable), matmul-output-saving remat
           (dots_with_no_batch_dims_saveable). Remat trades HBM
           activation traffic for recomputed flops — if the backward
           is bandwidth-bound the recompute wins.
  blocks — truncated-backbone train steps (stem, +mixedN, full):
           cumulative fwd+bwd ms per segment; successive differences
           attribute the step to block groups next to their flops.
  batch  — the production step at {512, 1024, 1536, 2048},
           interleaved, settling the 2048 regression with variance.

All MFUs divide by the production step's own cost_analysis flops (the
variants do the same semantic work).

Artifacts append into deploy/train_study_r05.json.
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
from deploy.infer_study import _interleaved_rounds  # noqa: E402

ARTIFACT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "train_study_r05.json"
)


def _train_data(batch):
    golden = _load_golden_images()
    n, h, w, c = golden.shape
    rng = np.random.RandomState(1)
    reps = (batch * K2 + n - 1) // n
    images = np.tile(golden, (reps, 1, 1, 1))[: batch * K2]
    images = images[rng.permutation(len(images))]
    return {
        "images": images.reshape(K2, batch, h, w, c),
        "labels": rng.randint(0, 3, (K2, batch)).astype(np.int32),
        "sample_weights": np.ones((K2, batch), np.float32),
        "variant_types": rng.randint(
            1, 3, (K2, batch)
        ).astype(np.int32),
    }


def _state_probe_fn():
    import jax
    import jax.numpy as jnp

    def state_probe(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(
            l.astype(jnp.float32).sum() for l in leaves
        ) * jnp.float32(1e-30)

    return state_probe


def _loop_timer(step_fn, state, data):
    """Compile a fori_loop over K2 resident batches running step_fn
    (state, batch)->state', probed so no step can be elided; return
    a timing closure."""
    import jax
    import jax.numpy as jnp

    probe = _state_probe_fn()

    def loop_n(state, stacked, n):
        def body(i, carry):
            st, acc = carry
            batch_data = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, jnp.remainder(i, K2), keepdims=False
                ),
                stacked,
            )
            st, loss = step_fn(st, batch_data)
            return (st, acc + loss)

        st, acc = jax.lax.fori_loop(
            0, n, body, (state, jnp.float32(0.0))
        )
        return acc + probe(st)

    dev_state = jax.device_put(state)
    dev_data = jax.device_put(data)
    loop_c = _compile_with_retry(
        lambda: jax.jit(loop_n).lower(
            dev_state, dev_data, jnp.int32(0)
        ).compile()
    )

    def run(n):
        return float(jax.device_get(
            loop_c(dev_state, dev_data, jnp.int32(n))
        ))

    return run


def _prod_flops(batch):
    """cost_analysis flops of the full production train step."""
    import jax

    from deepvariant_tpu.models.inception_v3 import create_model
    from deepvariant_tpu.training import train as train_lib
    from deepvariant_tpu.training.config import get_config

    config = get_config("wgs")
    config.batch_size = batch
    model, variables = create_model(7)
    tx, _ = train_lib.make_optimizer(config, 100)
    state = train_lib.init_state(model, variables, tx)
    train_step = train_lib.make_train_step(model, tx, config)
    probe = _state_probe_fn()

    def one(state, batch_data):
        new_state, loss, _ = train_step(state, batch_data)
        return loss + probe(new_state["params"])

    data = _train_data(batch)
    first = {k: v[0] for k, v in data.items()}
    dev_state = jax.device_put(state)
    dev_first = jax.device_put(first)
    one_c = _compile_with_retry(
        lambda: jax.jit(one).lower(dev_state, dev_first).compile()
    )
    return float(one_c.cost_analysis()["flops"]), model, state, tx, \
        config, data


def phase_ablate(batch, rounds):
    import jax
    import jax.numpy as jnp
    import optax

    from deepvariant_tpu.models.inception_v3 import normalize_pileup
    from deepvariant_tpu.training import train as train_lib
    from deepvariant_tpu.training.train import (
        _l2_kernel_penalty,
        loss_fn,
    )

    sem_flops, model, state, tx, config, data = _prod_flops(batch)
    prod_step = train_lib.make_train_step(model, tx, config)

    def prod(st, batch_data):
        st, loss, _ = prod_step(st, batch_data)
        return st, loss

    def make_plain(policy):
        def fwd(params, batch_stats, x, rng):
            probs, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            return probs, mutated["batch_stats"]

        fwd_used = (
            jax.checkpoint(fwd, policy=policy)
            if policy is not None else fwd
        )

        def compute(params, st, batch_data, rng):
            x = normalize_pileup(batch_data["images"])
            probs, new_bs = fwd_used(
                params, st["batch_stats"], x, rng
            )
            loss = loss_fn(
                probs, batch_data["labels"],
                batch_data["sample_weights"],
                config.label_smoothing,
            ) + _l2_kernel_penalty(params, config.weight_decay)
            return loss, new_bs

        def step(st, batch_data):
            rng = jax.random.fold_in(
                jax.random.PRNGKey(0), st["step"]
            )
            (loss, new_bs), grads = jax.value_and_grad(
                compute, has_aux=True
            )(st["params"], st, batch_data, rng)
            updates, new_opt = tx.update(
                grads, st["opt_state"], st["params"]
            )
            params = optax.apply_updates(st["params"], updates)
            return {
                **st,
                "params": params,
                "batch_stats": new_bs,
                "opt_state": new_opt,
                "step": st["step"] + 1,
            }, loss

        return step

    configs = {
        "prod": _loop_timer(prod, state, data),
        "plain": _loop_timer(make_plain(None), state, data),
        "remat_full": _loop_timer(
            make_plain(jax.checkpoint_policies.nothing_saveable),
            state, data,
        ),
        "remat_dots": _loop_timer(
            make_plain(
                jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable
            ),
            state, data,
        ),
    }
    slopes = _interleaved_rounds(configs, rounds)
    peak = _peak_flops(jax.devices()[0].device_kind)
    summary = {}
    for name, sl in slopes.items():
        arr = np.array([s for s in sl if s > 0])
        if not len(arr):
            summary[name] = {"error": "no positive slopes"}
            continue
        summary[name] = {
            "step_ms_mean": round(float(arr.mean() * 1e3), 2),
            "step_ms_std": round(float(arr.std() * 1e3), 2),
            "examples_per_sec_mean": round(
                float((batch / arr).mean()), 1
            ),
            "mfu_mean": round(
                float((sem_flops / arr / peak).mean()), 4
            ),
            "mfu_best": round(
                float((sem_flops / arr / peak).max()), 4
            ),
            "per_round_step_ms": [
                round(float(s * 1e3), 2) for s in arr
            ],
        }
    return {
        "phase": "ablate",
        "batch": batch,
        "rounds": rounds,
        "semantic_flops_per_step": sem_flops,
        "summary": summary,
    }


def phase_blocks(batch, rounds):
    """Truncated-backbone fwd+bwd per-segment table."""
    import jax
    import jax.numpy as jnp
    import optax

    from deepvariant_tpu.models.inception_v3 import (
        InceptionV3,
        create_model,
        normalize_pileup,
    )

    model, variables = create_model(7)
    data = _train_data(batch)
    tx = optax.sgd(1e-3, momentum=0.9)
    stops = ["stem", "mixed2", "mixed3", "mixed7", "mixed8", "full"]
    head = jax.random.normal(
        jax.random.PRNGKey(0), (2048, 3), jnp.float32
    )

    def make_step(stop):
        def compute(params, batch_stats, batch_data, rng):
            x = normalize_pileup(batch_data["images"])
            out, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, True,
                *(() if stop == "full" else (stop,)),
                mutable=["batch_stats"],
                method=InceptionV3.backbone,
            )
            if out.ndim > 2:
                out = jnp.mean(out, axis=(1, 2)).astype(jnp.float32)
            logits = out.astype(jnp.float32) @ head
            labels = jax.nn.one_hot(batch_data["labels"], 3)
            loss = -jnp.mean(
                jnp.sum(labels * jax.nn.log_softmax(logits), -1)
            )
            return loss, mutated["batch_stats"]

        def step(st, batch_data):
            rng = jax.random.fold_in(
                jax.random.PRNGKey(0), st["step"]
            )
            (loss, new_bs), grads = jax.value_and_grad(
                compute, has_aux=True
            )(st["params"], st["batch_stats"], batch_data, rng)
            updates, new_opt = tx.update(grads, st["opt_state"],
                                         st["params"])
            params = optax.apply_updates(st["params"], updates)
            return {
                "params": params,
                "batch_stats": new_bs,
                "opt_state": new_opt,
                "step": st["step"] + 1,
            }, loss

        return step

    state = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "opt_state": tx.init(variables["params"]),
        "step": jnp.int32(0),
    }

    runs = {}
    flops = {}
    for stop in stops:
        step = make_step(stop)
        # flops oracle per truncation
        probe = _state_probe_fn()

        def one(st, batch_data, _step=step):
            st2, loss = _step(st, batch_data)
            return loss + probe(st2["params"])

        first = {k: v[0] for k, v in data.items()}
        one_c = _compile_with_retry(
            lambda: jax.jit(one).lower(
                jax.device_put(state), jax.device_put(first)
            ).compile()
        )
        flops[stop] = float(one_c.cost_analysis()["flops"])
        runs[stop] = _loop_timer(step, state, data)

    slopes = _interleaved_rounds(runs, rounds)
    peak = _peak_flops(jax.devices()[0].device_kind)
    med = {
        stop: float(np.median([s for s in sl if s > 0]))
        for stop, sl in slopes.items()
    }
    table = []
    prev_t, prev_f, prev = 0.0, 0.0, "(input)"
    for stop in stops:
        seg_ms = (med[stop] - prev_t) * 1e3
        seg_f = flops[stop] - prev_f
        table.append({
            "segment": f"{prev}->{stop}",
            "cum_ms": round(med[stop] * 1e3, 2),
            "segment_ms": round(seg_ms, 2),
            "segment_flops": seg_f,
            "segment_mfu": round(
                seg_f / max(seg_ms, 1e-9) * 1e3 / peak, 4
            ),
        })
        prev_t, prev_f, prev = med[stop], flops[stop], stop
    return {
        "phase": "blocks",
        "batch": batch,
        "note": "fwd+bwd of truncated backbone + fixed linear head; "
                "the 'full' row uses the same plain SGD step, so it "
                "is comparable to ablate's 'plain', not 'prod'",
        "table": table,
    }


def phase_batch(batches, rounds):
    import jax

    from deepvariant_tpu.training import train as train_lib

    runs = {}
    sems = {}
    states = {}
    for b in batches:
        sem_flops, model, state, tx, config, data = _prod_flops(b)
        prod_step = train_lib.make_train_step(model, tx, config)

        def prod(st, batch_data, _s=prod_step):
            st, loss, _ = _s(st, batch_data)
            return st, loss

        runs[f"b{b}"] = _loop_timer(prod, state, data)
        sems[f"b{b}"] = sem_flops
    slopes = _interleaved_rounds(runs, rounds)
    peak = _peak_flops(jax.devices()[0].device_kind)
    summary = {}
    for b in batches:
        arr = np.array([s for s in slopes[f"b{b}"] if s > 0])
        if not len(arr):
            summary[f"b{b}"] = {"error": "no positive slopes"}
            continue
        summary[f"b{b}"] = {
            "step_ms_mean": round(float(arr.mean() * 1e3), 2),
            "step_ms_std": round(float(arr.std() * 1e3), 2),
            "examples_per_sec_mean": round(
                float((b / arr).mean()), 1
            ),
            "mfu_mean": round(
                float((sems[f"b{b}"] / arr / peak).mean()), 4
            ),
            "per_round_step_ms": [
                round(float(s * 1e3), 2) for s in arr
            ],
        }
    return {
        "phase": "batch",
        "rounds": rounds,
        "summary": summary,
    }


def main():
    p = argparse.ArgumentParser("train_study")
    p.add_argument("--phase", required=True,
                   choices=("ablate", "blocks", "batch"))
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--batches", default="512,1024,1536,2048")
    args = p.parse_args()

    t0 = time.time()
    if args.phase == "ablate":
        rec = phase_ablate(args.batch, args.rounds)
    elif args.phase == "blocks":
        rec = phase_blocks(args.batch, args.rounds)
    else:
        rec = phase_batch(
            [int(b) for b in args.batches.split(",")], args.rounds
        )
    rec["wall_seconds"] = round(time.time() - t0, 1)
    existing = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as f:
            existing = json.load(f)
    existing[rec["phase"]] = rec
    with open(ARTIFACT, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

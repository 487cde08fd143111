"""Stream-path host economics (round-5 directive #7).

The round-4 record showed the product `--stream` path at 2,084 ex/s
steady-state against a 37,873 ex/s fused device kernel — an 18x gap
attributed to "stage-1-bound on this 4-core host" without numbers.
This study quantifies the host side with the TPU taken OUT of the
loop: the device-encode stream runs against a null classifier, so the
measured rate is pure plan production + queue transport.

Outputs (deploy/stream_study_r05.json):
  * plans/s at 1, 2, 3 workers over the full 100 kb chr20 BAM;
  * plans/s/worker and worker-scaling efficiency;
  * host-cores-per-chip to saturate the fused kernel
    (fused_examples_per_sec / plans_per_sec_per_worker);
  * a cProfile of one worker's region loop splitting plan-stage time
    out of candidate generation (what to optimize next);
  * a stream-path e2e genome-hours projection at 96 cores, the
    product-default analogue of bench.py's staged-path band.

Reference anchor: fast_pipeline.cc:126-226 (the shared-memory ring
pipeline this replaces).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TESTDATA = "/root/reference/deepvariant/testdata"
ARTIFACT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "stream_study_r05.json"
)


def _options():
    from deepvariant_tpu.make_examples.core import MakeExamplesOptions
    from deepvariant_tpu.make_examples.presets import apply_model_preset

    options = MakeExamplesOptions(
        reads_filename=os.path.join(
            TESTDATA, "input/NA12878_S1.chr20.10_10p1mb.bam"
        ),
        ref_filename=os.path.join(
            TESTDATA, "input/ucsc.hg19.chr20.unittest.fasta.gz"
        ),
        examples_filename="",
        mode="calling",
        regions=["chr20:10,000,000-10,100,000"],
        realigner_enabled=True,
        write_run_info=False,
    )
    apply_model_preset(options, "WGS")
    return options


class _NullPlanPredictor:
    """Stands in for PlanPredictor: consumes plan payloads at host
    speed, classifying nothing — isolates the host pipeline rate."""

    def predict_plan_stream(self, payloads, max_queue: int = 2):
        for p in payloads:
            yield p, (1.0, 0.0, 0.0)


def worker_scaling(log_fn=print) -> dict:
    from deepvariant_tpu.parallel.stream_pipeline import (
        stream_examples_to_cvos,
    )

    options = _options()
    rates = {}
    for workers in (1, 2, 3):
        t0 = time.perf_counter()
        cvos, stats, _ = stream_examples_to_cvos(
            options, num_workers=workers, device_encode=True,
            plan_predictor_factory=_NullPlanPredictor,
        )
        dt = time.perf_counter() - t0
        rates[workers] = stats.num_cvos / dt
        log_fn(f"{workers} worker(s): {stats.num_cvos} plans in "
               f"{dt:.1f}s -> {rates[workers]:.0f} plans/s")
    per_worker = rates[1]
    return {
        "plans_per_sec": {str(w): round(r, 1) for w, r in rates.items()},
        "plans_per_sec_per_worker": round(per_worker, 1),
        "scaling_efficiency_2way": round(
            rates[2] / (2 * per_worker), 3
        ),
        "scaling_efficiency_3way": round(
            rates[3] / (3 * per_worker), 3
        ),
    }


def steady_plan_rate(log_fn=print) -> dict:
    """Warm in-process steady-state plan production rate per core
    (candidate generation + realigner + row planning, no painting),
    free of worker spawn/import cost — the honest per-core number the
    saturation math uses (the subprocess walls on this 100 kb BAM are
    startup-dominated: ~5 s spawn+import vs ~3 s of work)."""
    import time as _time

    from deepvariant_tpu.make_examples.core import make_examples_runner

    options = _options()
    options.regions = ["chr20:10,000,000-10,050,000"]
    # Warm: imports, BAM/FASTA index, native lib.
    warm = _options()
    warm.regions = ["chr20:10,050,000-10,052,000"]
    make_examples_runner(warm, plan_sink=lambda p: None)
    n = [0]

    def sink(p):
        n[0] += 1

    t0 = _time.perf_counter()
    make_examples_runner(options, plan_sink=sink)
    dt = _time.perf_counter() - t0
    rate = n[0] / dt
    log_fn(f"steady: {n[0]} plans in {dt:.1f}s -> "
           f"{rate:.1f} plans/s/core, "
           f"{50_000 / dt / 1e3:.1f} kbp/s/core")
    return {
        "steady_plans_per_sec_per_core": round(rate, 1),
        "steady_plan_bp_per_sec_per_core": round(50_000 / dt, 1),
        "steady_span_bp": 50_000,
        "steady_examples": n[0],
    }


def plan_profile(log_fn=print) -> dict:
    """cProfile one in-process worker: how much of stage-1 is row
    PLANNING (the part device encode keeps on the host) vs candidate
    generation (realigner, allele counting) vs queue/serialization."""
    import cProfile
    import io
    import pstats

    from deepvariant_tpu.make_examples.core import make_examples_runner

    options = _options()
    options.regions = ["chr20:10,000,000-10,020,000"]
    plans = []

    def plan_sink(planned):
        plans.append(planned)

    # Warm (imports, index loads) so the profile sees steady state.
    warm = _options()
    warm.regions = ["chr20:10,020,000-10,022,000"]
    make_examples_runner(warm, plan_sink=lambda p: None)

    prof = cProfile.Profile()
    prof.enable()
    counts = make_examples_runner(options, plan_sink=plan_sink)
    prof.disable()

    s = io.StringIO()
    stats = pstats.Stats(prof, stream=s)
    stats.sort_stats("cumulative")
    total = stats.total_tt

    def cum(*name_parts):
        """Cumulative seconds of entries whose qualified name contains
        every part."""
        out = 0.0
        for (path, _line, fn), (cc, nc, tt, ct, callers) in \
                stats.stats.items():
            qual = f"{path}:{fn}"
            if all(p in qual for p in name_parts):
                out = max(out, ct)
        return out

    groups = {
        "realigner": cum("realign"),
        "allele_counter_and_calling": max(
            cum("variant_caller", "calls_in_region"),
            cum("allele_counter", "add_batch"),
        ),
        "plan_stage": cum("build_plans_for_candidate"),
        "row_planning": cum("plan_longread_example"),
        "bam_read": cum("bam", "query"),
    }
    log_fn(f"profile total {total:.1f}s over {counts['examples']} "
           f"examples: " + ", ".join(
               f"{k}={v:.2f}s" for k, v in groups.items()))
    top = s.getvalue()
    return {
        "profile_total_seconds": round(total, 2),
        "examples": counts["examples"],
        "group_cumulative_seconds": {
            k: round(v, 2) for k, v in groups.items()
        },
    }


def main():
    p = argparse.ArgumentParser("stream_study")
    p.add_argument("--fused_rate", type=float, default=37872.8,
                   help="fused encode+call ex/s/chip (BENCH_r04)")
    args = p.parse_args()

    rec = {}
    rec["worker_scaling"] = worker_scaling()
    rec["steady"] = steady_plan_rate()
    rec["plan_profile"] = plan_profile()
    # Saturation math uses the warm steady per-core rate with the
    # 2-way process-scaling efficiency from the staged fan-out (the
    # subprocess walls above are startup-dominated on this 100 kb
    # BAM and kept only as context).
    per_core = rec["steady"]["steady_plans_per_sec_per_core"]
    bp_per_core = rec["steady"]["steady_plan_bp_per_sec_per_core"]
    eff = 0.954  # BENCH_r04 stage1_scaling_efficiency_2way
    rec["fused_examples_per_sec_per_chip"] = args.fused_rate
    rec["cores_per_chip_to_saturate"] = round(
        args.fused_rate / (per_core * eff), 1
    )
    # Genome projection is SPAN-based (candidate density varies per
    # region; a WGS genome is ~2.4 examples/kbp vs this slice's 3.6):
    # stage-1 walks every bp either way.
    genome_bp, genome_examples = 3.1e9, 7.5e6
    plan_bp_96 = 96 * bp_per_core * eff
    plan_ex_96 = genome_examples / (genome_bp / plan_bp_96)
    stage1_h = genome_bp / plan_bp_96 / 3600.0
    chip_h = genome_examples / args.fused_rate / 3600.0
    stage3_rate = 9282.6 * 96  # BENCH_r04 stage-3 per-core x 96
    rec["stream_e2e_96core_genome_hours"] = round(
        max(stage1_h, chip_h)
        + genome_examples / stage3_rate / 3600.0, 3
    )
    rec["stream_plan_examples_per_sec_96core"] = round(plan_ex_96, 0)
    with open(ARTIFACT, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

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
    rec["plan_profile"] = plan_profile()
    per_worker = rec["worker_scaling"]["plans_per_sec_per_worker"]
    eff = rec["worker_scaling"]["scaling_efficiency_2way"]
    rec["fused_examples_per_sec_per_chip"] = args.fused_rate
    rec["cores_per_chip_to_saturate"] = round(
        args.fused_rate / (per_worker * eff), 1
    )
    # Stream-path e2e at 96 cores: the chip is idle-waiting below
    # saturation, so the genome rate is min(96-core plan rate, chip).
    plan_rate_96 = 96 * per_worker * eff
    genome_examples = 7.5e6
    stream_rate = min(plan_rate_96, args.fused_rate)
    stage3_rate = 9282.6 * 96  # BENCH_r04 stage-3 per-core x 96
    rec["stream_e2e_96core_genome_hours"] = round(
        genome_examples / stream_rate / 3600.0
        + genome_examples / stage3_rate / 3600.0, 3
    )
    with open(ARTIFACT, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

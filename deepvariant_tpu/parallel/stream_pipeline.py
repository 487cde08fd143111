"""Fused streaming pipeline: candidates -> MXU -> VCF, no example files.

Product equivalent of the reference's fast_pipeline binary
(fast_pipeline.cc:248), which runs make_examples, call_variants and
postprocess_variants concurrently with examples streamed through
boost::interprocess shared-memory ring buffers (stream_examples.h:51).

TPU-native restructuring: N make_examples worker PROCESSES (CPU-pinned
— the hot host loops release no GIL worth sharing) push payloads
through multiprocessing queues into the driver. Two encode modes:

  * device encode (default where the preset's channels allow it):
    workers stop after row PLANNING and ship compact PlannedExample
    tensors (~2-4x smaller than painted images); the driver paints
    every pileup channel plane ON THE TPU fused with the CNN forward
    in one XLA program (calling.plan_predictor.PlanPredictor). The
    reference cannot express this: its pileup encoder is host C++
    (pileup_image_native.cc) even in fast-pipeline mode.
  * host encode: workers serialize painted tf.Examples (the round-3
    path), driver batches them into the jitted mesh-sharded
    InceptionV3 (calling.call_variants.Predictor).

gVCF records and small-model CVOs stream through the same queues
(replacing their TFRecords), so `--stream --output_gvcf` and
`--stream --call_small_model_examples` are drop-in equivalents of the
staged pipeline. CallVariantsOutputs accumulate in memory and flow
straight into postprocess — no intermediate file between any two
stages.

The emitted VCF/gVCF is byte-identical to the three-stage path:
workers iterate exactly the regions their task_id owns (same
round-robin rule, make_examples_core.py:881), the device painter is
bit-exact vs the host painter (tests/test_pileup_jax*.py), per-example
probabilities are independent of batch boundaries, and postprocess
sorts CVOs/nonvariants by locus either way.
"""

from __future__ import annotations

import dataclasses
import multiprocessing as mp
import time
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

_SENTINEL_KIND = "done"
_BATCH_KIND = "examples"
_PLAN_KIND = "plans"
_GVCF_KIND = "gvcfs"
_SM_CVO_KIND = "small_model_cvos"
_FLUSH_EVERY = 64
_GVCF_FLUSH_EVERY = 512


def _stream_worker(options, task_id: int, num_shards: int,
                   out_queue: "mp.Queue", device_encode: bool = False,
                   want_gvcf: bool = False) -> None:
    """One make_examples shard, payloads to the queue (spawn target).

    `options` is a pickled MakeExamplesOptions (or a kwargs dict) —
    passing the object keeps the streamed path's configuration
    IDENTICAL to the staged path's, preset side-effects included.
    """
    from deepvariant_tpu.utils.backend import force_cpu

    force_cpu()
    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        make_examples_runner,
    )

    if isinstance(options, dict):
        options = MakeExamplesOptions(**options)
    options.task_id = task_id
    options.num_shards = num_shards
    options.examples_filename = ""  # sinks replace every TFRecord
    options.gvcf_filename = ""
    options.small_model_cvo_filename = ""

    bufs: Dict[str, list] = {
        _BATCH_KIND: [], _PLAN_KIND: [], _GVCF_KIND: [], _SM_CVO_KIND: []
    }

    def flush(kind: str):
        if bufs[kind]:
            out_queue.put((kind, bufs[kind][:]))
            bufs[kind].clear()

    def make_sink(kind: str, every: int = _FLUSH_EVERY):
        def sink(item):
            bufs[kind].append(item)
            if len(bufs[kind]) >= every:
                flush(kind)
        return sink

    sinks = {}
    if device_encode:
        from deepvariant_tpu.calling.plan_predictor import compact_plan

        diff = options.pileup_options.alt_aligned_pileup == \
            "diff_channels"
        plan_sink = make_sink(_PLAN_KIND)

        def compacting_plan_sink(planned):
            planned.plan = compact_plan(planned.plan, diff)
            plan_sink(planned)

        sinks["plan_sink"] = compacting_plan_sink
    else:
        sinks["example_sink"] = make_sink(_BATCH_KIND)
    if want_gvcf:
        gvcf_sink = make_sink(_GVCF_KIND, _GVCF_FLUSH_EVERY)
        sinks["gvcf_sink"] = lambda v: gvcf_sink(v.encode())
    if options.call_small_model_examples:
        sinks["small_model_cvo_sink"] = make_sink(_SM_CVO_KIND)

    try:
        counts = make_examples_runner(options, **sinks)
        for kind in bufs:
            flush(kind)
        out_queue.put((_SENTINEL_KIND, task_id, counts, None))
    except BaseException as e:  # surfaced in the driver
        out_queue.put((_SENTINEL_KIND, task_id, {}, repr(e)))
        raise


@dataclasses.dataclass
class StreamStats:
    num_examples: int = 0
    num_cvos: int = 0
    wall_seconds: float = 0.0
    examples_per_sec: float = 0.0
    stage1_counts: Optional[Dict[int, Dict[str, int]]] = None
    device_encode: bool = False
    num_small_model_cvos: int = 0
    num_gvcf_records: int = 0
    # Steady-state rate with the predictor's one-time compile excluded
    # (feed included) — the honest pipeline-throughput number; the
    # compile is a per-process constant, not per-genome work.
    steady_state_examples_per_sec: float = 0.0


def stream_examples_to_cvos(
    options,
    num_workers: int,
    variables=None,
    model=None,
    batch_size: int = 512,
    queue_capacity: int = 64,
    predictor_factory=None,
    device_encode: bool = False,
    plan_predictor_factory=None,
    want_gvcf: bool = False,
) -> tuple:
    """Run the fused stage-1+2: returns (cvos, StreamStats[, gvcfs]).

    Workers produce payloads concurrently with device inference; the
    measured examples/sec INCLUDES the host feed (candidate
    generation, planning/parsing, host->device transfer).

    Host-encode mode: `predictor_factory(shape)` builds the Predictor
    lazily from the first streamed example's (H, W, C); or pass
    `variables` (+ `model`) built for the expected shape.
    Device-encode mode (`device_encode=True`): workers ship candidate
    plans and `plan_predictor_factory()` must return a
    calling.plan_predictor.PlanPredictor (the driver knows the
    shape/channels from the options, no data peeking needed).

    Returns (cvos, stats, gvcf_records); gvcf_records is None unless
    `want_gvcf`. Small-model CVOs (when the options enable the gate)
    are merged into `cvos` — postprocess sorts by locus either way,
    exactly like the staged path joining the two CVO TFRecords.
    """
    from deepvariant_tpu.calling.call_variants import (
        ExampleRecord,
        Predictor,
        round_gls,
    )
    from deepvariant_tpu.core.types import CallVariantsOutput, Variant
    from deepvariant_tpu.io import examples as example_codec

    if device_encode and plan_predictor_factory is None:
        raise ValueError(
            "device_encode=True needs plan_predictor_factory"
        )

    ctx = mp.get_context("spawn")  # never fork a live TPU client
    out_queue: "mp.Queue" = ctx.Queue(maxsize=queue_capacity)
    workers = []
    for task in range(num_workers):
        proc = ctx.Process(
            target=_stream_worker,
            args=(options, task, num_workers, out_queue, device_encode,
                  want_gvcf),
            daemon=True,
        )
        proc.start()
        workers.append(proc)

    t0 = time.time()
    stage1_counts: Dict[int, Dict[str, int]] = {}
    failures: List[str] = []
    gvcf_records: List = [] if want_gvcf else None
    small_model_cvos: List[CallVariantsOutput] = []
    first_result_t: List[float] = []

    def payloads() -> Iterator:
        remaining = num_workers
        while remaining:
            msg = out_queue.get()
            kind = msg[0]
            if kind == _SENTINEL_KIND:
                _, task_id, counts, err = msg
                if err is not None:
                    failures.append(f"worker {task_id}: {err}")
                    for p in workers:
                        p.terminate()
                    return
                stage1_counts[task_id] = counts
                remaining -= 1
                continue
            if kind == _GVCF_KIND:
                gvcf_records.extend(
                    Variant.decode(buf) for buf in msg[1]
                )
                continue
            if kind == _SM_CVO_KIND:
                small_model_cvos.extend(msg[1])
                continue
            if kind == _PLAN_KIND:
                yield from msg[1]
                continue
            for serialized in msg[1]:
                ex = example_codec.parse_example(serialized)
                yield ExampleRecord(
                    image=ex.image,
                    variant=ex.variant,
                    alt_allele_indices=ex.alt_allele_indices,
                    label=ex.label,
                )

    cvos: List[CallVariantsOutput] = []
    predictor = None
    if not device_encode and predictor_factory is None:
        predictor = Predictor(
            variables, batch_size=batch_size, model=model
        )

    def classified():
        nonlocal predictor
        rec_iter = payloads()
        if device_encode:
            predictor = plan_predictor_factory()
            yield from predictor.predict_plan_stream(rec_iter)
            return
        if predictor is None:
            first = next(rec_iter, None)
            if first is None:
                return
            predictor = predictor_factory(first.image.shape)
            import itertools

            rec_iter = itertools.chain([first], rec_iter)
        yield from predictor.predict_stream(rec_iter)

    for rec, probs in classified():
        if not first_result_t:
            first_result_t.append(time.time())
        cvos.append(CallVariantsOutput(
            variant=rec.variant,
            alt_allele_indices=(
                rec.alt_indices if device_encode
                else rec.alt_allele_indices
            ),
            genotype_probabilities=round_gls(
                [float(p) for p in probs]
            ),
        ))
    for p in workers:
        p.join(timeout=30)
    if failures:
        raise RuntimeError(
            "streaming make_examples failed: " + "; ".join(failures)
        )
    dt = max(time.time() - t0, 1e-9)
    steady = 0.0
    if first_result_t and len(cvos) > 1:
        # First yielded result absorbs the compile; rate over the rest.
        steady_dt = max(time.time() - first_result_t[0], 1e-9)
        steady = (len(cvos) - 1) / steady_dt
    stats = StreamStats(
        num_examples=sum(
            c.get("examples", 0) for c in stage1_counts.values()
        ),
        num_cvos=len(cvos),
        wall_seconds=dt,
        examples_per_sec=len(cvos) / dt,
        stage1_counts=stage1_counts,
        device_encode=device_encode,
        num_small_model_cvos=len(small_model_cvos),
        num_gvcf_records=len(gvcf_records) if want_gvcf else 0,
        steady_state_examples_per_sec=steady,
    )
    if stats.num_examples != stats.num_cvos:
        raise RuntimeError(
            f"stream lost examples: workers produced "
            f"{stats.num_examples}, classified {stats.num_cvos}"
        )
    cvos.extend(small_model_cvos)
    return cvos, stats, gvcf_records


def run_streaming_pipeline(
    options,
    output_vcf: str,
    ref_path: str,
    variables=None,
    model=None,
    sample_name: str = "default",
    num_workers: int = 2,
    batch_size: int = 512,
    postprocess_kwargs: Optional[Dict] = None,
    predictor_factory=None,
    device_encode: bool = False,
    plan_predictor_factory=None,
    output_gvcf: str = "",
) -> Dict:
    """Full fused run: BAM -> streamed payloads -> MXU -> VCF(+gVCF)."""
    from deepvariant_tpu.io.fasta import FastaReader
    from deepvariant_tpu.postprocess.pipeline import postprocess_variants

    cvos, stats, gvcf_records = stream_examples_to_cvos(
        options, num_workers, variables,
        model=model, batch_size=batch_size,
        predictor_factory=predictor_factory,
        device_encode=device_encode,
        plan_predictor_factory=plan_predictor_factory,
        want_gvcf=bool(output_gvcf),
    )
    ref_reader = FastaReader(ref_path)
    pp_kwargs = dict(postprocess_kwargs or {})
    if output_gvcf:
        pp_kwargs.update(
            nonvariant_site_path=gvcf_records,
            output_gvcf=output_gvcf,
            ref_lookup=ref_reader.bases,
        )
    pp = postprocess_variants(
        cvos, output_vcf, ref_reader.contigs, sample_name=sample_name,
        **pp_kwargs,
    )
    return {
        "stream_examples": stats.num_examples,
        "stream_examples_per_sec": round(stats.examples_per_sec, 2),
        "stream_steady_state_examples_per_sec": round(
            stats.steady_state_examples_per_sec, 2
        ),
        "stream_wall_seconds": round(stats.wall_seconds, 3),
        "stream_device_encode": device_encode,
        "stream_small_model_cvos": stats.num_small_model_cvos,
        "stream_gvcf_records": stats.num_gvcf_records,
        "postprocess": pp,
    }

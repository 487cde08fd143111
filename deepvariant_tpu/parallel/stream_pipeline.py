"""Fused streaming pipeline: candidates -> MXU -> VCF, no example files.

Product equivalent of the reference's fast_pipeline binary
(fast_pipeline.cc:248), which runs make_examples, call_variants and
postprocess_variants concurrently with examples streamed through
boost::interprocess shared-memory ring buffers (stream_examples.h:51).

TPU-native restructuring: N make_examples worker PROCESSES (CPU-pinned
— the hot host loops release no GIL worth sharing) push serialized
tf.Examples through multiprocessing queues into the driver, which
parses, batches, and feeds the jitted mesh-sharded InceptionV3
(calling.call_variants.Predictor) with double-buffered device
prefetch. CallVariantsOutputs accumulate in memory and flow straight
into postprocess (postprocess_variants accepts in-memory CVOs) — no
intermediate TFRecord is written between any two stages.

The emitted VCF is byte-identical to the three-stage path: workers
iterate exactly the regions their task_id owns (same round-robin rule,
make_examples_core.py:881), per-example probabilities are independent
of batch boundaries, and postprocess sorts CVOs by locus either way.
"""

from __future__ import annotations

import dataclasses
import multiprocessing as mp
import time
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

_SENTINEL_KIND = "done"
_BATCH_KIND = "examples"
_FLUSH_EVERY = 64


def _stream_worker(options, task_id: int, num_shards: int,
                   out_queue: "mp.Queue") -> None:
    """One make_examples shard, examples to the queue (spawn target).

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
    options.examples_filename = ""  # sink replaces the TFRecord

    buf: List[bytes] = []

    def sink(serialized: bytes):
        buf.append(serialized)
        if len(buf) >= _FLUSH_EVERY:
            out_queue.put((_BATCH_KIND, buf[:]))
            buf.clear()

    try:
        counts = make_examples_runner(options, example_sink=sink)
        if buf:
            out_queue.put((_BATCH_KIND, buf[:]))
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


def stream_examples_to_cvos(
    options,
    num_workers: int,
    variables=None,
    model=None,
    batch_size: int = 512,
    queue_capacity: int = 64,
    predictor_factory=None,
) -> tuple:
    """Run the fused stage-1+2: returns (cvos, StreamStats).

    Workers produce examples concurrently with device inference; the
    measured examples/sec therefore INCLUDES the host feed (candidate
    generation, parsing, host->device transfer) — the number the bench
    reports as stream_examples_per_sec.

    `predictor_factory(shape)` builds the Predictor lazily from the
    first streamed example's (H, W, C) — there is no example_info.json
    sidecar in a fused run. Alternatively pass `variables` (+ `model`)
    built for the expected shape.
    """
    from deepvariant_tpu.calling.call_variants import (
        ExampleRecord,
        Predictor,
        round_gls,
    )
    from deepvariant_tpu.core.types import CallVariantsOutput
    from deepvariant_tpu.io import examples as example_codec

    ctx = mp.get_context("spawn")  # never fork a live TPU client
    out_queue: "mp.Queue" = ctx.Queue(maxsize=queue_capacity)
    workers = []
    for task in range(num_workers):
        proc = ctx.Process(
            target=_stream_worker,
            args=(options, task, num_workers, out_queue),
            daemon=True,
        )
        proc.start()
        workers.append(proc)

    t0 = time.time()
    stage1_counts: Dict[int, Dict[str, int]] = {}
    failures: List[str] = []

    def records() -> Iterator[ExampleRecord]:
        remaining = num_workers
        while remaining:
            msg = out_queue.get()
            if msg[0] == _SENTINEL_KIND:
                _, task_id, counts, err = msg
                if err is not None:
                    failures.append(f"worker {task_id}: {err}")
                    for p in workers:
                        p.terminate()
                    return
                stage1_counts[task_id] = counts
                remaining -= 1
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
    if predictor_factory is None:
        predictor = Predictor(
            variables, batch_size=batch_size, model=model
        )

    def classified():
        nonlocal predictor
        rec_iter = records()
        if predictor is None:
            first = next(rec_iter, None)
            if first is None:
                return
            predictor = predictor_factory(first.image.shape)
            import itertools

            rec_iter = itertools.chain([first], rec_iter)
        yield from predictor.predict_stream(rec_iter)

    for rec, probs in classified():
        cvos.append(CallVariantsOutput(
            variant=rec.variant,
            alt_allele_indices=rec.alt_allele_indices,
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
    stats = StreamStats(
        num_examples=sum(
            c.get("examples", 0) for c in stage1_counts.values()
        ),
        num_cvos=len(cvos),
        wall_seconds=dt,
        examples_per_sec=len(cvos) / dt,
        stage1_counts=stage1_counts,
    )
    if stats.num_examples != stats.num_cvos:
        raise RuntimeError(
            f"stream lost examples: workers produced "
            f"{stats.num_examples}, classified {stats.num_cvos}"
        )
    return cvos, stats


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
) -> Dict:
    """Full fused run: BAM -> streamed examples -> MXU -> VCF."""
    from deepvariant_tpu.io.fasta import FastaReader
    from deepvariant_tpu.postprocess.pipeline import postprocess_variants

    cvos, stats = stream_examples_to_cvos(
        options, num_workers, variables,
        model=model, batch_size=batch_size,
        predictor_factory=predictor_factory,
    )
    ref_reader = FastaReader(ref_path)
    pp = postprocess_variants(
        cvos, output_vcf, ref_reader.contigs, sample_name=sample_name,
        **(postprocess_kwargs or {}),
    )
    return {
        "stream_examples": stats.num_examples,
        "stream_examples_per_sec": round(stats.examples_per_sec, 2),
        "stream_wall_seconds": round(stats.wall_seconds, 3),
        "postprocess": pp,
    }

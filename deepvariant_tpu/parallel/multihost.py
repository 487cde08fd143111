"""Real multi-host pipeline execution over `jax.distributed`.

The reference reaches multi-host only through TPUStrategy's cluster
resolver (train.py:117-127). The TPU-native equivalent: every host
process calls `jax.distributed.initialize` (DCN rendezvous), takes its
region shard from `jax.process_index()` (the reference's
`i % num_shards == task_id` rule), runs stage 1 + classification over
its shard, publishes its CVO shard, and joins a genuine cross-host
collective (all-gather of per-host counts over the global device mesh)
that doubles as the completion barrier; process 0 then merges all
shards into one VCF.

This module is exercised by tests/test_multihost.py with REAL separate
processes (CPU backend, localhost coordinator) — not with process
counts spoofed as function arguments.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np


def gather_counts_across_hosts(local_count: int) -> np.ndarray:
    """All-gather one int per host over the global device mesh.

    Under `jax.distributed` each process contributes its own shard of
    a process-spanning array (make_array_from_process_local_data), and
    the all-gather genuinely crosses DCN. Doubles as a barrier: no
    process can finish until every process has contributed.
    """
    import jax

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    n = jax.process_count()
    devices = jax.devices()  # global, across processes
    mesh = jax.sharding.Mesh(np.array(devices[:n]), ("hosts",))
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("hosts")
    )
    arr = jax.make_array_from_process_local_data(
        sharding, np.array([local_count], np.int32), (n,)
    )

    def gather(x):
        return jax.lax.all_gather(x, "hosts", axis=0, tiled=True)

    try:
        mapped = shard_map(
            gather, mesh=mesh,
            in_specs=jax.sharding.PartitionSpec("hosts"),
            out_specs=jax.sharding.PartitionSpec(),
            check_vma=False,
        )
    except TypeError:
        mapped = shard_map(
            gather, mesh=mesh,
            in_specs=jax.sharding.PartitionSpec("hosts"),
            out_specs=jax.sharding.PartitionSpec(),
            check_rep=False,
        )
    return np.asarray(jax.jit(mapped)(arr))


def _toy_probabilities(images: np.ndarray) -> np.ndarray:
    """Deterministic, data-dependent stand-in classifier for pipeline
    plumbing tests: a jitted device computation over image statistics
    (the production path swaps in calling.call_variants.Predictor)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def forward(x):
        x = x.astype(jnp.float32) / 254.0
        feats = jnp.stack([
            x.mean(axis=(1, 2, 3)),
            x.std(axis=(1, 2, 3)),
            x[:, :, :, 0].mean(axis=(1, 2)),
        ], axis=-1)
        return jax.nn.softmax(feats, axis=-1)

    return np.asarray(forward(jnp.asarray(images)))


def run_host(
    workdir: str,
    options_kwargs: Dict,
    regions: Sequence[str],
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    use_model: bool = False,
    checkpoint: str = "",
    batch_size: int = 64,
    sample_name: str = "default",
) -> Dict:
    """One host's share of the pipeline; rank 0 merges the global VCF."""
    from deepvariant_tpu.parallel.distribute import (
        host_shard_assignment,
        initialize_multihost,
    )

    pid, n = initialize_multihost(
        coordinator_address, num_processes, process_id
    )
    mine = host_shard_assignment(len(regions))

    from deepvariant_tpu.calling.call_variants import round_gls
    from deepvariant_tpu.core.types import CallVariantsOutput
    from deepvariant_tpu.io import examples as example_codec
    from deepvariant_tpu.io.tfrecord import TFRecordWriter
    from deepvariant_tpu.make_examples.core import (
        MakeExamplesOptions,
        make_examples_runner,
    )

    collected: List[bytes] = []
    options = MakeExamplesOptions(**options_kwargs)
    options.examples_filename = ""
    options.regions = [regions[i] for i in mine]
    counts = make_examples_runner(
        options, example_sink=collected.append
    ) if mine else {"examples": 0}

    records = [example_codec.parse_example(buf) for buf in collected]
    if records:
        if use_model:
            from deepvariant_tpu.calling.call_variants import Predictor
            from deepvariant_tpu.scripts.call_variants import (
                load_variables_for_shape,
            )

            model, variables = load_variables_for_shape(
                checkpoint, records[0].image.shape
            )
            predictor = Predictor(
                variables, batch_size=batch_size, model=model
            )
            pairs = list(predictor.predict_stream(iter(records)))
            probs = np.stack([p for _, p in pairs])
            records = [r for r, _ in pairs]
        else:
            probs = _toy_probabilities(
                np.stack([r.image for r in records])
            )
    shard_path = os.path.join(
        workdir, f"cvo-{pid:05d}-of-{n:05d}.tfrecord.gz"
    )
    with TFRecordWriter(shard_path) as writer:
        for rec, p in zip(records, probs if records else []):
            cvo = CallVariantsOutput(
                variant=rec.variant,
                alt_allele_indices=rec.alt_allele_indices,
                genotype_probabilities=round_gls(
                    [float(x) for x in p]
                ),
            )
            writer.write(cvo.encode())

    # Cross-host all-gather = completion barrier + global bookkeeping.
    all_counts = gather_counts_across_hosts(len(records))
    result = {
        "process_id": pid,
        "process_count": n,
        "local_examples": len(records),
        "all_counts": [int(x) for x in all_counts],
    }

    if pid == 0:
        from deepvariant_tpu.io.fasta import FastaReader
        from deepvariant_tpu.postprocess.pipeline import (
            postprocess_variants,
        )

        shards = [
            os.path.join(workdir, f"cvo-{i:05d}-of-{n:05d}.tfrecord.gz")
            for i in range(n)
        ]
        # The collective already guarantees every shard is written.
        output_vcf = os.path.join(workdir, "multihost.vcf.gz")
        ref_reader = FastaReader(options_kwargs["ref_filename"])
        pp = postprocess_variants(
            shards, output_vcf, ref_reader.contigs,
            sample_name=sample_name,
        )
        result["output_vcf"] = output_vcf
        result["postprocess"] = pp
    return result


def main(argv=None) -> int:
    p = argparse.ArgumentParser("multihost_worker")
    p.add_argument("--workdir", required=True)
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--options_json", required=True,
                   help="MakeExamplesOptions kwargs as JSON")
    p.add_argument("--regions_json", required=True)
    p.add_argument("--sample_name", default="default")
    args = p.parse_args(argv)
    result = run_host(
        args.workdir,
        json.loads(args.options_json),
        json.loads(args.regions_json),
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
        sample_name=args.sample_name,
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

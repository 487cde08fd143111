"""TPU-native scale-out primitives.

Replaces the reference's process-level parallelism (SURVEY §2.6) with
JAX-native equivalents:

  * GNU-parallel shard fan-out (run_deepvariant.py:457-462) ->
    per-host region assignment from `jax.process_index()` over a
    `jax.distributed`-initialized pod slice;
  * tf.distribute.MirroredStrategy inference (call_variants.py:782) ->
    a data-axis `Mesh` + `NamedSharding` jit (see calling.call_variants)
    with helpers here for multi-host batch layout;
  * fast_pipeline's shm ring buffer (fast_pipeline.cc:126-226) ->
    a host-side double-buffered device-prefetch iterator: batch N+1 is
    transferred (async dispatch) while batch N computes on the MXU;
  * per-shard output merge -> psum/all_gather over the data axis.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed if needed; returns (process_id, n)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def host_shard_assignment(
    num_items: int,
    process_id: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[int]:
    """Round-robin item indices for this host (the reference's
    `i % num_shards == task_id` rule, make_examples_core.py:881)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    return [i for i in range(num_items) if i % n == pid]


def data_parallel_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
) -> jax.sharding.Mesh:
    devices = list(devices or jax.devices())
    return jax.sharding.Mesh(np.array(devices), ("data",))


def shardings(mesh: jax.sharding.Mesh):
    """(replicated, data_sharded) NamedShardings for the mesh."""
    replicated = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()
    )
    data = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")
    )
    return replicated, data


def all_gather_counts(
    local_counts: Sequence[int], mesh: jax.sharding.Mesh
) -> np.ndarray:
    """All-gather one count per mesh position over the data axis.

    Each device contributes ITS OWN shard's count (laid out with a
    data-axis NamedSharding, so the values genuinely travel the ICI
    collective), and every position receives the full (n,) vector —
    the merge step before the global VCF write replaces the
    reference's writer-process bookkeeping (call_variants.py:934-1053).
    """
    try:
        from jax import shard_map  # jax >= 0.6
    except ImportError:
        from jax.experimental.shard_map import shard_map

    n = mesh.devices.size
    counts = np.asarray(local_counts, np.int32)
    if counts.shape != (n,):
        raise ValueError(
            f"need one count per mesh position: got {counts.shape}, "
            f"mesh has {n} devices"
        )
    _, data_sharding = shardings(mesh)
    arr = jax.device_put(counts, data_sharding)

    def gather(x):  # x: this device's (1,) block
        return jax.lax.all_gather(x, "data", axis=0, tiled=True)

    try:
        mapped = shard_map(
            gather, mesh=mesh,
            in_specs=jax.sharding.PartitionSpec("data"),
            out_specs=jax.sharding.PartitionSpec(),
            # The all_gather output is bitwise-identical on every shard;
            # skip the varying-mesh-axes check that would force a pvary.
            check_vma=False,
        )
    except TypeError:  # older jax: the flag was named check_rep
        mapped = shard_map(
            gather, mesh=mesh,
            in_specs=jax.sharding.PartitionSpec("data"),
            out_specs=jax.sharding.PartitionSpec(),
            check_rep=False,
        )
    gathered = jax.jit(mapped)(arr)
    return np.asarray(gathered)


class DevicePrefetchIterator:
    """Double-buffered host->device pipeline.

    A background thread pulls host batches from `source` and issues
    `jax.device_put` with the target sharding; consumers receive device
    arrays that are already (or nearly) resident when the previous
    step's compute finishes. This is the single-process replacement for
    the reference's shared-memory example stream
    (stream_examples.h:51, fast_pipeline.cc:126-226).
    """

    def __init__(
        self,
        source: Iterable,
        sharding: Optional[jax.sharding.Sharding] = None,
        buffer_size: int = 2,
    ):
        self._sharding = sharding
        self._queue: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._done = object()
        self._error: Optional[BaseException] = None

        def worker():
            try:
                for item in source:
                    if self._sharding is not None:
                        item = jax.tree_util.tree_map(
                            lambda x: jax.device_put(x, self._sharding),
                            item,
                        )
                    else:
                        item = jax.tree_util.tree_map(
                            jax.device_put, item
                        )
                    self._queue.put(item)
            except BaseException as e:  # surfaced on next()
                self._error = e
            finally:
                self._queue.put(self._done)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._done:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def fused_encode_infer(
    example_batches: Iterable[np.ndarray],
    forward: Callable,
    variables,
    mesh: Optional[jax.sharding.Mesh] = None,
    prefetch: int = 2,
) -> Iterator[np.ndarray]:
    """Pipeline host encoding against device inference.

    `example_batches` yields fixed-shape uint8 (B, H, W, C) batches
    (host encode); `forward(variables, batch)` is the jitted model.
    Batches prefetch to device while the MXU runs the previous batch.
    """
    mesh = mesh or data_parallel_mesh()
    _, data_sharding = shardings(mesh)
    device_iter = DevicePrefetchIterator(
        example_batches, sharding=data_sharding, buffer_size=prefetch
    )
    inflight: collections.deque = collections.deque()
    for batch in device_iter:
        inflight.append(forward(variables, batch))
        # Keep at most `prefetch` steps in flight; yield in order.
        while len(inflight) > prefetch:
            yield np.asarray(inflight.popleft())
    while inflight:
        yield np.asarray(inflight.popleft())

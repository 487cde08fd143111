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


def all_gather_counts(value: int, mesh: jax.sharding.Mesh) -> np.ndarray:
    """Gather one scalar per device position (e.g. per-shard record
    counts) — the merge step before the global VCF write."""
    n = mesh.devices.size

    def gather(x):
        return jax.lax.all_gather(x, "data")

    try:
        from jax import shard_map  # jax >= 0.6
    except ImportError:
        from jax.experimental.shard_map import shard_map

    arr = jnp.full((n,), value, jnp.int32)
    gathered = jax.jit(
        shard_map(
            gather, mesh=mesh,
            in_specs=jax.sharding.PartitionSpec("data"),
            out_specs=jax.sharding.PartitionSpec("data"),
        )
    )(arr)
    return np.asarray(gathered).reshape(n, -1)[:, 0] if \
        np.asarray(gathered).ndim > 1 else np.asarray(gathered)


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

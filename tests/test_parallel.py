"""Scale-out primitive tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepvariant_tpu.parallel.distribute import (
    DevicePrefetchIterator,
    all_gather_counts,
    data_parallel_mesh,
    fused_encode_infer,
    host_shard_assignment,
    shardings,
)


def test_host_shard_assignment_covers_all():
    all_items = set()
    for pid in range(4):
        items = host_shard_assignment(10, process_id=pid, process_count=4)
        assert all(i % 4 == pid for i in items)
        all_items.update(items)
    assert all_items == set(range(10))


def test_mesh_and_shardings():
    mesh = data_parallel_mesh(jax.devices()[:8])
    assert mesh.devices.size == 8
    replicated, data = shardings(mesh)
    x = jax.device_put(np.arange(16, dtype=np.float32), data)
    assert x.sharding.is_equivalent_to(data, ndim=1)


def test_all_gather_counts():
    mesh = data_parallel_mesh(jax.devices()[:8])
    # Distinct per-position values prove a genuine per-shard gather
    # (not a broadcast of one scalar).
    local = np.arange(10, 18, dtype=np.int32)
    counts = all_gather_counts(local, mesh)
    assert counts.shape == (8,)
    assert (counts == local).all()

    with pytest.raises(ValueError, match="one count per mesh position"):
        all_gather_counts([1, 2], mesh)


def test_device_prefetch_iterator_order_and_error():
    batches = [np.full((4,), i, np.float32) for i in range(5)]
    out = list(DevicePrefetchIterator(iter(batches)))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(np.asarray(b)[0]) == i

    def failing():
        yield np.zeros(2)
        raise RuntimeError("boom")

    it = DevicePrefetchIterator(failing())
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_fused_encode_infer_pipeline():
    mesh = data_parallel_mesh(jax.devices()[:8])
    replicated, data_sharding = shardings(mesh)
    variables = jax.device_put(
        {"w": jnp.full((3,), 2.0)}, replicated
    )

    @jax.jit
    def forward(variables, batch):
        # (B, 3) float inputs -> (B, 3) outputs.
        return batch.astype(jnp.float32) * variables["w"]

    batches = [np.full((8, 3), i, np.uint8) for i in range(6)]
    outputs = list(fused_encode_infer(
        iter(batches), forward, variables, mesh=mesh
    ))
    assert len(outputs) == 6
    for i, out in enumerate(outputs):
        np.testing.assert_allclose(out, np.full((8, 3), 2.0 * i))

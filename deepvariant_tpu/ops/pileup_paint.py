"""Pallas kernel: multi-channel pileup "paint".

The device pileup encoder (make_examples/pileup_jax.py) ends in a
memory-bound step: from the gathered per-pixel bases/qualities and
per-row read scalars, synthesize the C channel planes of the uint8
example tensor. In pure XLA this materializes C intermediate planes
before the stack; the pallas kernel computes all channels for a
(rows, width) tile in VMEM and writes the fused (rows, width, C)
block once.

All channel colors are computed arithmetically (no 256-entry LUT
gathers, which TPU pallas handles poorly): base colors come from a
4-way select over ACGT, quality/mapq/insert-size colors from the
254*min(v, cap)/cap scaling, supports/strand from per-row precomputed
colors broadcast along width.

Channel order (the 7-channel WGS set, pileup.py numerics contract):
  read_base, base_quality, mapping_quality, strand,
  read_supports_variant, base_differs_from_ref, insert_size.

`paint_pileup(...)` works on any backend: it calls the pallas kernel
on TPU and falls back to the identical XLA formulation elsewhere
(also used under pl.pallas_call(interpret=True) in tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_PIXEL = 254.0

# pileup.py defaults.
_BASE_A = 40.0 + 70.0 * 3
_BASE_G = 40.0 + 70.0 * 2
_BASE_T = 30.0 + 70.0 * 1
_BASE_C = 30.0 + 70.0 * 0
_QUAL_CAP = 40.0
_MATCH = int(MAX_PIXEL * 0.2)
_MISMATCH = int(MAX_PIXEL)


def _base_color(b):
    """Arithmetic ACGT color select (base_color_lut equivalent)."""
    return jnp.where(
        b == ord("A"), _BASE_A,
        jnp.where(
            b == ord("G"), _BASE_G,
            jnp.where(
                b == ord("T"), _BASE_T,
                jnp.where(b == ord("C"), _BASE_C, 0.0),
            ),
        ),
    )


def _channels_for_tile(b, q, covered, ref_row, mapq_color,
                       strand_color, support_color, tlen_color):
    """Shared channel math: (R, W) inputs -> (R, W, 7) uint8."""
    # Mosaic can't cast uint8 -> float32 directly; hop through int32.
    bf = b.astype(jnp.int32).astype(jnp.float32)
    qf = q.astype(jnp.int32).astype(jnp.float32)
    base = _base_color(bf)
    qual = MAX_PIXEL * jnp.minimum(qf, _QUAL_CAP) / _QUAL_CAP
    differs = jnp.where(
        b == ref_row[None, :], float(_MATCH), float(_MISMATCH)
    )
    rows_w = [
        base,
        qual,
        jnp.broadcast_to(mapq_color[:, None], b.shape),
        jnp.broadcast_to(strand_color[:, None], b.shape),
        jnp.broadcast_to(support_color[:, None], b.shape),
        differs,
        jnp.broadcast_to(tlen_color[:, None], b.shape),
    ]
    out = jnp.stack(rows_w, axis=-1)
    mask = covered.astype(jnp.int32).astype(jnp.float32)[:, :, None]
    # float32 -> uint8 must also hop through int32 under Mosaic.
    return (out * mask).astype(jnp.int32).astype(jnp.uint8)


def _paint_kernel(b_ref, q_ref, cov_ref, ref_ref, mapq_ref,
                  strand_ref, support_ref, tlen_ref, out_ref):
    """Per-candidate tile. The big (R, W) tensors arrive as size-1
    candidate blocks; the small per-row/ref arrays arrive whole (TPU
    blocks need their last two dims full or (8, 128)-aligned) and are
    indexed by the grid position."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    out_ref[0] = _channels_for_tile(
        b_ref[0], q_ref[0], cov_ref[0], ref_ref[i],
        mapq_ref[i], strand_ref[i], support_ref[i], tlen_ref[i],
    )


_PALLAS_BROKEN = False


def paint_pileup(*args, **kwargs):
    """Dispatch wrapper: pallas on TPU (or interpret mode), XLA
    otherwise — and permanent XLA fallback if the backend cannot
    compile Mosaic kernels (e.g. remote-compile tunnels)."""
    global _PALLAS_BROKEN
    interpret = kwargs.get("interpret", False)
    if not _PALLAS_BROKEN or interpret:
        try:
            return _paint_pileup(*args, **kwargs)
        except Exception:
            if interpret:
                raise
            _PALLAS_BROKEN = True
    return _paint_xla(*args)


@jax.jit
def _paint_xla(b, q, covered, ref_windows, mapq_color, strand_color,
               support_color, tlen_color):
    return jax.vmap(_channels_for_tile)(
        b, q, covered, ref_windows, mapq_color, strand_color,
        support_color, tlen_color,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _paint_pileup(
    b: jax.Array,          # (N, R, W) uint8 gathered read bases
    q: jax.Array,          # (N, R, W) uint8 gathered base quals
    covered: jax.Array,    # (N, R, W) bool coverage mask
    ref_windows: jax.Array,    # (N, W) uint8
    mapq_color: jax.Array,     # (N, R) float32 precomputed colors
    strand_color: jax.Array,   # (N, R) float32
    support_color: jax.Array,  # (N, R) float32
    tlen_color: jax.Array,     # (N, R) float32
    interpret: bool = False,
) -> jax.Array:
    """(N, R, W, 7) uint8 channel block."""
    n, r, w = b.shape
    if jax.default_backend() == "tpu" or interpret:
        from jax.experimental import pallas as pl

        return pl.pallas_call(
            _paint_kernel,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, r, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, r, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, r, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((n, w), lambda i: (0, 0)),
                pl.BlockSpec((n, r), lambda i: (0, 0)),
                pl.BlockSpec((n, r), lambda i: (0, 0)),
                pl.BlockSpec((n, r), lambda i: (0, 0)),
                pl.BlockSpec((n, r), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, r, w, 7), lambda i: (i, 0, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((n, r, w, 7), jnp.uint8),
            interpret=interpret,
        )(b, q, covered, ref_windows, mapq_color, strand_color,
          support_color, tlen_color)
    # XLA fallback: vmap the same math over candidates.
    return jax.vmap(_channels_for_tile)(
        b, q, covered, ref_windows, mapq_color, strand_color,
        support_color, tlen_color,
    )

"""Opaque gather materializer (Pallas identity) for the TPU backend.

Measured pathology (DESIGN.md, tools/ dbg series): when a large row
gather (`st[father]`) FUSES into a downstream compare-reduce, XLA
re-executes the gather for every read of every element — the capacity
count measured ~100x below roofline, and the whole surrounding fusion
degrades with it. Routing the gathered rows through a trivial Pallas
identity forces XLA to materialize the gather ONCE into a dense buffer;
every consumer then reads cheap contiguous loads. The copy itself runs at
streaming bandwidth.

Feeding rule: gather from a PRE-FLATTENED 2-D (n, W) view. Materializing
a gather with a (2, S) trailing shape pads each row to an (8, 128) tile —
16x write amplification (measured 10x end-to-end slowdown).

Identity semantics: bytes in == bytes out, so results are bit-identical
with or without the barrier; `GE_NO_MAT_GATHER=1` disables (and non-TPU
backends bypass it entirely).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

RN = 512


def _enabled() -> bool:
    return (
        os.environ.get("GE_NO_MAT_GATHER") != "1"
        and jax.default_backend() == "tpu"
    )


def _identity(x_ref, o_ref):
    o_ref[:] = x_ref[:]


@jax.jit
def _ident_call(x):
    n, w = x.shape
    return pl.pallas_call(
        _identity,
        grid=(n // RN,),
        in_specs=[pl.BlockSpec((RN, w), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((RN, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, w), x.dtype),
    )(x)


def materialize_rows(x: jax.Array) -> jax.Array:
    """Force `x` (any shape; flattened to (n, -1) rows internally) through
    an opaque identity so its producer (typically a gather) materializes
    once. No-op off TPU or when disabled."""
    if not _enabled():
        return x
    shape = x.shape
    n = shape[0]
    flat = x.reshape(n, -1)
    pad = (-n) % RN
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    out = _ident_call(flat)
    return out[:n].reshape(shape)


def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """`table[idx]` materialized once: flattens trailing dims BEFORE the
    gather (tile-padding rule above), gathers, runs the identity, and
    restores the shape. Bit-identical to `table[idx]`."""
    if not _enabled():
        return table[idx]
    n = table.shape[0]
    trailing = table.shape[1:]
    flat = table.reshape(n, -1)
    return materialize_rows(flat[idx]).reshape((idx.shape[0],) + trailing)

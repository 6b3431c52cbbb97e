"""Pallas TPU kernel for the capacity probe's merge-valid count.

`count_merge_valid` (core/segments.py) computes, per child gamete, how
many ledger slots the meiosis merge will occupy — the exact capacity
pre-pass that lets the engine donate genome buffers to the real pass.
Its XLA form measures ~3.2 s/gen at n=300k on v5e: the parent-row gather
fuses into the (S, K, n) broadcast compare-reduce, so every gathered
element is re-gathered ~K times. This kernel brings that to ~0.5 s/gen
(both parents) by consuming the gather ONCE through an opaque boundary
and doing the K-fold compare-accumulate on VMEM-resident blocks.

Feeding rule (measured, tools/ dbg series + DESIGN.md): the parent rows
must be gathered from a PRE-FLATTENED (n, 2S) view — `st.reshape(n,
2S)[father]`. Gathering the 3-D (n, 2, S) rows and reshaping after costs
10x more: XLA materializes the custom-call operand in a (8, 128)-tiled
layout, and a (2, 49) trailing shape pads 16x. The engine's caller does
the reshape before the gather; this wrapper takes the flat rows.

Bit-exact contract: integer compares and sums only — results equal
`count_merge_valid` exactly (tests/test_merge_count.py), so the engine
can switch per backend with identical capacity decisions.

What is counted (same formula, `core/segments.py:count_merge_valid`):
  1 + #{xo valid} + #{A slots (s>0) the gamete copies from chromatid 0}
    + #{B slots (s>0) copied from chromatid 1}
with copy parity (start + #{xo <= pos}) % 2, the meiose/`recombine`
convention (`/root/reference/src/Simulation.cpp:2861-2960`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

RN = 512  # individuals (sublane rows) per grid step; 2048 exceeds the
# 16M scoped-vmem stack limit with the K unrolled temps (measured)


def _kernel(ab_ref, xo_ref, start_ref, out_ref, *, S: int, K: int,
            big: int):
    ab = ab_ref[:]  # (RN, 2S) int32: A slots then B slots
    start = start_ref[:]  # (RN, 1)
    cnt = jnp.zeros(ab.shape, dtype=jnp.int32)
    n_xo = jnp.zeros((ab.shape[0], 1), dtype=jnp.int32)
    for k in range(K):
        xk = xo_ref[:, k][:, None]
        cnt = cnt + jnp.where(xk <= ab, 1, 0)
        n_xo = n_xo + jnp.where(xk < big, 1, 0)
    act = (start + cnt) & 1
    slot = jax.lax.broadcasted_iota(jnp.int32, ab.shape, 1)
    take = (
        (ab < big)
        & (act == jnp.where(slot < S, 0, 1))
        & (slot != 0)
        & (slot != S)
    )
    out_ref[:] = (
        1 + n_xo + jnp.sum(jnp.where(take, 1, 0), axis=1, keepdims=True)
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _count_call(ab, xo, start, interpret=False):
    n, twoS = ab.shape
    K = xo.shape[1]
    S = twoS // 2
    from geneevolve_tpu.core.segments import _big

    return pl.pallas_call(
        functools.partial(_kernel, S=S, K=K, big=_big()),
        grid=(n // RN,),
        in_specs=[
            pl.BlockSpec((RN, twoS), lambda i: (i, 0)),
            pl.BlockSpec((RN, K), lambda i: (i, 0)),
            pl.BlockSpec((RN, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((RN, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        interpret=interpret,
    )(ab, xo, start)


def count_merge_valid_pallas(
    par_flat: jax.Array,  # (n, 2S) int32 — st.reshape(n, 2S)[father] rows
    xo: jax.Array,  # (n, K) int32 sorted crossover positions (BIG padded)
    start_hap: jax.Array,  # (n,) int32
    interpret: bool = False,
) -> jax.Array:
    """(n,) valid-slot count, bit-equal to `segments.count_merge_valid`
    on the unflattened rows."""
    n = par_flat.shape[0]
    interpret = interpret or jax.default_backend() != "tpu"
    pad = (-n) % RN
    big = jnp.asarray(np.iinfo(np.int32).max, jnp.int32)
    ab = jnp.pad(par_flat, ((0, pad), (0, 0)))
    xo_p = jnp.pad(xo.astype(jnp.int32), ((0, pad), (0, 0)),
                   constant_values=big)
    st_p = jnp.pad(
        start_hap.astype(jnp.int32).reshape(-1, 1), ((0, pad), (0, 0))
    )
    out = _count_call(ab, xo_p, st_p, interpret=interpret)
    return out[:n, 0]

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

RN = 64  # lane width of the output tile (= its array dim, a legal
# non-128 lane size); GB*RN = 512 individuals per program — larger
# operand blocks exceed the 16M scoped-vmem stack with the K unrolled
# compare temps (measured at 2048 and 4096 rows)
GB = 8  # output sublane rows per grid step


def _kernel(in_ref, out_ref, *, S: int, K: int, big: int):
    # one fused operand (RN, 2S + K + 1): parent slots | xo | start —
    # separate narrow operands each lane-pad to 128 when materialized
    # (a (n, 1) buffer inflates 128x = 490 MB at n=1e6, measured OOM)
    ab = in_ref[:, : 2 * S]
    start = in_ref[:, 2 * S + K][:, None]
    cnt = jnp.zeros(ab.shape, dtype=jnp.int32)
    n_xo = jnp.zeros((ab.shape[0], 1), dtype=jnp.int32)
    for k in range(K):
        xk = in_ref[:, 2 * S + k][:, None]
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
    counts = (
        1 + n_xo + jnp.sum(jnp.where(take, 1, 0), axis=1, keepdims=True)
    )
    # (GB*RN, 1) -> (GB, RN): the output buffer is (grid*GB, RN),
    # lane-dense — a (n, 1) output buffer would lane-pad 128x (measured
    # 490 MB per buffer at n=1e6)
    out_ref[:] = counts.reshape(GB, RN)


@functools.partial(jax.jit, static_argnames=("S", "K", "interpret"))
def _count_call(packed, S, K, interpret=False):
    n, W = packed.shape
    from geneevolve_tpu.core.segments import _big

    return pl.pallas_call(
        functools.partial(_kernel, S=S, K=K, big=_big()),
        grid=(n // (GB * RN),),
        in_specs=[pl.BlockSpec((GB * RN, W), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((GB, RN), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n // RN, RN), jnp.int32),
        interpret=interpret,
    )(packed)


def count_merge_valid_pallas(
    par_flat: jax.Array,  # (n, 2S) int32 — st.reshape(n, 2S)[father] rows
    xo: jax.Array,  # (n, K) int32 sorted crossover positions (BIG padded)
    start_hap: jax.Array,  # (n,) int32
    interpret: bool = False,
) -> jax.Array:
    """(n,) valid-slot count, bit-equal to `segments.count_merge_valid`
    on the unflattened rows."""
    n, twoS = par_flat.shape
    K = xo.shape[1]
    interpret = interpret or jax.default_backend() != "tpu"
    packed = jnp.concatenate(
        [
            par_flat,
            xo.astype(jnp.int32),
            start_hap.astype(jnp.int32).reshape(-1, 1),
        ],
        axis=1,
    )
    pad = (-n) % (GB * RN)
    if pad:
        big = jnp.asarray(np.iinfo(np.int32).max, jnp.int32)
        packed = jnp.pad(packed, ((0, pad), (0, 0)), constant_values=big)
    out = _count_call(packed, twoS // 2, K, interpret=interpret)
    return out.reshape(-1)[:n]

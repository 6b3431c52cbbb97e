"""Pallas TPU kernel: vectorized searchsorted-right over a VMEM-resident
CDF, via a two-level balanced-block count with lane-dynamic gathers.

The segment engine's crossover/mutation samplers map ~3e8 uniforms per
generation (n=300k) through a per-chromosome inverse CDF. The XLA
formulations measured on v5e (tools/sexp.py, DESIGN.md):

  - searchsorted:            ~31.7 s/gen  (per-probe binary search HLO)
  - CDF-grid row gather:      ~3.1 s/gen  (8.5 ns/row HBM gathers dominate)
  - this kernel:              the table lives in VMEM; per probe the count
    is 7 binary-search steps over the 128 block-last values + one linear
    pass over the probe's block, all lane-parallel `take_along_axis`
    (Mosaic lowers it to the VPU dynamic-gather path, verified on v5e)

Semantics are EXACTLY `jnp.searchsorted(cum, u, side="right")` = #{j:
cum[j] <= u} — verified element-exact against searchsorted on v5e hardware
across K in {128..4992}, including flat runs of equal cum values (a count
has no run ambiguity) and boundary-valued u. Caveat: swapping the bins
path changes the whole compiled program, and XLA may fuse the upstream
`u = s/denom * total` differently between the two programs — u can move
1 ulp, so run artifacts are only guaranteed byte-identical WITHIN a path.
The engine therefore uses the kernel only for unmeshed TPU runs; --mesh
runs keep the grid path their bit-identity contract was proven on.

Reference for WHAT is sampled: `ras_sim_loc_rec` / `ras_add_mutation`
(`/root/reference/src/Simulation.cpp:2973-2995, 2497-2552`); this module
is purely the inverse-CDF evaluation strategy.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BS = 512  # probe-block sublane rows per grid step (BS*LANES probes)


def build_tables(cum: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(L, cum2T) for one padded CDF row `cum` (K,).

    The K entries are split into 128 balanced blocks of bw = ceil(K/128)
    entries. `L[b]` is the last real entry of block b (+inf when the block
    is entirely padding), `cum2T[s, b]` is entry s of block b (+inf out of
    range) — transposed so the kernel's per-entry pass reads one 128-lane
    row per step."""
    cum = np.asarray(cum, dtype=np.float32)
    K = cum.shape[0]
    bw = -(-K // LANES)
    inf = np.float32(np.inf)
    L = np.full(LANES, inf, dtype=np.float32)
    cum2T = np.full((bw, LANES), inf, dtype=np.float32)
    for b in range(LANES):
        lo = b * bw
        if lo >= K:
            break
        hi = min(lo + bw, K)
        L[b] = cum[hi - 1]
        cum2T[: hi - lo, b] = cum[lo:hi]
    return L, cum2T


def build_tables_stacked(cum_rows) -> Tuple[np.ndarray, np.ndarray]:
    """Stack per-chromosome tables: cum_rows (nchr, K) ->
    (nchr, 128), (nchr, bw, 128)."""
    outs = [build_tables(r) for r in np.asarray(cum_rows)]
    return (
        np.stack([o[0] for o in outs]),
        np.stack([o[1] for o in outs]),
    )


def _kernel(u_ref, L_ref, c2_ref, out_ref, *, bw: int):
    u = u_ref[:]  # (BS, LANES) f32
    shape = u.shape
    Lb = jnp.broadcast_to(L_ref[0][None, :], shape)
    # F = #{b: L[b] <= u}, branchless binary count over the sorted 128
    # block-last values (result in [0, 127]; a true 128 saturates at 127,
    # which the downstream clamp to K-1 absorbs)
    cnt = jnp.zeros(shape, dtype=jnp.int32)
    for step in (64, 32, 16, 8, 4, 2, 1):
        mid = cnt + (step - 1)
        val = jnp.take_along_axis(Lb, mid, axis=1)
        cnt = cnt + jnp.where(val <= u, step, 0)
    # entries of block F that are <= u (padding is +inf, never counted)
    total = cnt * bw
    for s in range(bw):
        row = jnp.broadcast_to(c2_ref[s][None, :], shape)
        val = jnp.take_along_axis(row, cnt, axis=1)
        total = total + jnp.where(val <= u, 1, 0)
    out_ref[:] = total


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bins_call(u2, L, cum2T, interpret=False):
    rows = u2.shape[0]
    bw = cum2T.shape[0]
    grid = rows // BS
    return pl.pallas_call(
        functools.partial(_kernel, bw=bw),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BS, LANES), lambda i: (i, 0)),
            pl.BlockSpec((1, LANES), lambda i: (0, 0)),
            pl.BlockSpec((bw, LANES), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BS, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )(u2, L.reshape(1, LANES), cum2T)


def searchsorted_right(
    u: jax.Array, L: jax.Array, cum2T: jax.Array, interpret: bool = False
) -> jax.Array:
    """#{j: cum[j] <= u} elementwise over any-shaped `u`, using tables
    from `build_tables`. Traceable (fixed shapes); pads the flattened
    probe set to a (BS, 128) grid multiple."""
    shape = u.shape
    interpret = interpret or jax.default_backend() != "tpu"
    P = int(np.prod(shape))
    chunk = BS * LANES
    pad = (-P) % chunk
    uf = jnp.pad(u.reshape(-1), (0, pad)).reshape(-1, LANES)
    bins = _bins_call(uf, L, cum2T, interpret=interpret)
    return bins.reshape(-1)[:P].reshape(shape)

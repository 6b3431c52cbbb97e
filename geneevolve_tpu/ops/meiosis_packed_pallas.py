"""Pallas meiosis kernel over bit-packed haplotypes (8 loci per byte).

Same pipeline structure as `ops/meiosis_pallas.py` (scalar-prefetched parent
table drives the BlockSpec index maps; separate chromatid planes keep every
access at sublane 0), but the state is packed and the crossover phase is a
*byte mask* built on the VPU:

    mask = (st ? 0xFF : 0) XOR_k ( (cols > xo_k>>3) * 0xFF
                                 | (cols == xo_k>>3) * (0xFF << (xo_k & 7)) )
    gamete = A ^ (mask & (A ^ B))

Per-child traffic drops 8x against the byte kernel: 4*(m/8) read +
2*(m/8) written per generation. Reference semantics: `recombine` +
`ras_sim_loc_rec` (`/root/reference/src/Simulation.cpp:2903-2995`).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_B = int(os.environ.get("GE_PALLAS_BLOCK_B", 8192))  # bytes per grid cell


def _kernel(
    parents_ref,  # scalar-prefetch (2n,) int32, [f0, m0, f1, m1, ...]
    fatA_ref,  # VMEM (1, 1, BLOCK_B) uint8
    fatB_ref,
    motA_ref,
    motB_ref,
    xo_ref,  # SMEM (1, 2, n_chr, K) int32 crossover loci (global, pad = m)
    st_ref,  # SMEM (1, 2, n_chr) int32 start chromatid
    outA_ref,  # VMEM (1, 1, BLOCK_B) uint8
    outB_ref,
    *,
    chr_lenb: int,
    K: int,
    block_b: int,
):
    col0 = pl.program_id(1) * block_b
    chr_idx = col0 // chr_lenb
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, block_b), 1) + col0
    for g, (hA, hB, out) in (
        (0, (fatA_ref, fatB_ref, outA_ref)),
        (1, (motA_ref, motB_ref, outB_ref)),
    ):
        macc = jnp.full((1, block_b), st_ref[0, g, chr_idx] * 255, jnp.int32)
        for k in range(K):
            x = xo_ref[0, g, chr_idx, k]
            xb = x >> 3
            partial = jax.lax.shift_left(255, x & 7) & 255
            term = jnp.where(cols > xb, 255, 0) | jnp.where(
                cols == xb, partial, 0
            )
            macc = macc ^ term
        mask = macc.astype(jnp.uint8)
        a = hA[0]
        out[0] = a ^ (mask & (a ^ hB[0]))


@functools.partial(jax.jit, static_argnames=("n_chr", "chr_len"))
def meiose_planes_packed_pallas(
    hapA, hapB, fathers, mothers, xo_p, st_p, xo_m, st_m, *, n_chr, chr_len
):
    """(childA, childB) each (n, mb) uint8 packed gametes.

    hapA/hapB: (N, mb) uint8 packed planes; xo_*: (n, n_chr, K) int32
    crossover *loci* (global column space, pad = 8*mb); st_*: (n, n_chr).
    Requires chr_lenb to contain a power-of-two divisor >= 128 (blocks
    shrink to fit within one chromosome).
    """
    n = fathers.shape[0]
    mb = hapA.shape[1]
    K = xo_p.shape[2]
    chr_lenb = chr_len // 8
    # block size adapts downward to the chromosome byte-length so blocks
    # never straddle a chromosome boundary
    block_b = BLOCK_B
    while chr_lenb % block_b:
        block_b //= 2
    assert block_b >= 128 and mb % block_b == 0

    hapA3 = hapA.reshape(-1, 1, mb)
    hapB3 = hapB.reshape(-1, 1, mb)
    parents = jnp.stack([fathers, mothers], axis=1).astype(jnp.int32).reshape(-1)
    xo = jnp.stack([xo_p, xo_m], axis=1).astype(jnp.int32)  # (n, 2, n_chr, K)
    st = jnp.stack([st_p, st_m], axis=1).astype(jnp.int32)

    row_spec = pl.BlockSpec((1, 1, block_b), lambda i, j, ps: (i, 0, j))
    grid = (n, mb // block_b)
    outA, outB = pl.pallas_call(
        functools.partial(_kernel, chr_lenb=chr_lenb, K=K, block_b=block_b),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_b), lambda i, j, ps: (ps[2 * i], 0, j)
                ),
                pl.BlockSpec(
                    (1, 1, block_b), lambda i, j, ps: (ps[2 * i], 0, j)
                ),
                pl.BlockSpec(
                    (1, 1, block_b), lambda i, j, ps: (ps[2 * i + 1], 0, j)
                ),
                pl.BlockSpec(
                    (1, 1, block_b), lambda i, j, ps: (ps[2 * i + 1], 0, j)
                ),
                pl.BlockSpec(
                    (1, 2, n_chr, K),
                    lambda i, j, ps: (i, 0, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, 2, n_chr),
                    lambda i, j, ps: (i, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
            ],
            out_specs=[row_spec, row_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, mb), jnp.uint8),
            jax.ShapeDtypeStruct((n, 1, mb), jnp.uint8),
        ],
    )(parents, hapA3, hapB3, hapA3, hapB3, xo, st)
    return outA.reshape(n, mb), outB.reshape(n, mb)

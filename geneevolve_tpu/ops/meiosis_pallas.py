"""Pallas meiosis-gather kernel.

Produces both chromatid planes of the child generation:

    childA[c, l] = father_planes[phase_p(l)][f_c, l]   (paternal gamete)
    childB[c, l] = mother_planes[phase_m(l)][m_c, l]   (maternal gamete)

with `phase(l) = (start[chr(l)] + #crossovers <= l within chr) & 1`.

Design: haplotypes live in two (N, m) uint8 planes viewed as (N, 1, m) so a
pipeline block `(1, 1, BLOCK_M)` is one parent-row slab whose trailing dims
are full-extent/lane-aligned — the only slicing granularity Mosaic's uint8
tiling accepts — and every load/store sits at sublane offset 0 (Mosaic has
no uint8 cross-sublane relayout, so an interleaved (2n, m) layout cannot be
phase-selected in-kernel). Parent selection happens in the BlockSpec index
maps, which read a scalar-prefetched (n, 2) parent table
(`PrefetchScalarGridSpec`); the gather therefore rides the standard Pallas
double-buffered pipeline instead of manual per-row DMAs (which Mosaic
rejects for sub-8-sublane slices). Crossover positions arrive per-chromosome
in SMEM, (1, 2, n_chr, K) per child, unsorted and padded with m; the phase
parity is K unrolled scalar-broadcast compares summed on the VPU.

Traffic per child per generation: 4m read + 2m write at DMA-copy bandwidth,
vs the XLA gather path's ~6 HBM passes at (slow) gather bandwidth.

Reference semantics: `recombine` + `ras_sim_loc_rec`
(`/root/reference/src/Simulation.cpp:2903-2995`), dense formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

BLOCK_M = int(os.environ.get("GE_PALLAS_BLOCK_M", 8192))  # loci per grid cell


def _kernel(
    parents_ref,  # scalar-prefetch (2n,) int32, [f0, m0, f1, m1, ...]
    fatA_ref,  # VMEM (1, 1, BLOCK_M) uint8: father's chromatid A
    fatB_ref,  # VMEM (1, 1, BLOCK_M) uint8: father's chromatid B
    motA_ref,  # VMEM (1, 1, BLOCK_M) uint8
    motB_ref,  # VMEM (1, 1, BLOCK_M) uint8
    xo_ref,  # SMEM (1, 2, n_chr, K) int32 crossover cols (pad = m)
    st_ref,  # SMEM (1, 2, n_chr) int32 start chromatid
    outA_ref,  # VMEM (1, 1, BLOCK_M) uint8: child's paternal gamete
    outB_ref,  # VMEM (1, 1, BLOCK_M) uint8: child's maternal gamete
    *,
    chr_len: int,
    K: int,
):
    col0 = pl.program_id(1) * BLOCK_M
    chr_idx = col0 // chr_len
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK_M), 1) + col0
    for g, (hA, hB, out) in (
        (0, (fatA_ref, fatB_ref, outA_ref)),
        (1, (motA_ref, motB_ref, outB_ref)),
    ):
        parity = jnp.full((1, BLOCK_M), st_ref[0, g, chr_idx], jnp.int32)
        for k in range(K):
            # pad entries are m > every col, so they never flip parity
            parity += (xo_ref[0, g, chr_idx, k] <= cols).astype(jnp.int32)
        # arithmetic select: uint8 mask of 0x00/0xFF — Mosaic lacks the
        # relayout for selecting packed uint8 lanes under a 32-bit bool mask
        mask = (jax.lax.rem(parity, 2) * 255).astype(jnp.uint8)
        a = hA[0]
        out[0] = a ^ (mask & (a ^ hB[0]))


@functools.partial(jax.jit, static_argnames=("n_chr",))
def meiose_planes_pallas(
    hapA, hapB, fathers, mothers, xo_p, st_p, xo_m, st_m, *, n_chr
):
    """(childA, childB) each (n, m) uint8 from parent chromatid planes.

    hapA/hapB: (N, m) uint8; fathers/mothers: (n,) int32; xo_*: (n, n_chr, K)
    int32 per-chromosome crossover columns (global column space, pad m);
    st_*: (n, n_chr) int32 start chromatids.
    Requires m % BLOCK_M == 0 and chr_len % BLOCK_M == 0.
    """
    n = fathers.shape[0]
    m = hapA.shape[1]
    K = xo_p.shape[2]
    chr_len = m // n_chr
    assert m % BLOCK_M == 0 and chr_len % BLOCK_M == 0

    hapA3 = hapA.reshape(-1, 1, m)
    hapB3 = hapB.reshape(-1, 1, m)
    # flat 1-D: SMEM pads prefetch operands to 512 B per *row*, so an (n, 2)
    # table costs n*512 B and blows the 1 MB SMEM at a few thousand children
    parents = jnp.stack([fathers, mothers], axis=1).astype(jnp.int32).reshape(-1)
    xo = jnp.stack([xo_p, xo_m], axis=1).astype(jnp.int32)  # (n, 2, n_chr, K)
    st = jnp.stack([st_p, st_m], axis=1).astype(jnp.int32)  # (n, 2, n_chr)

    row_spec = pl.BlockSpec((1, 1, BLOCK_M), lambda i, j, ps: (i, 0, j))
    grid = (n, m // BLOCK_M)
    outA, outB = pl.pallas_call(
        functools.partial(_kernel, chr_len=chr_len, K=K),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, BLOCK_M), lambda i, j, ps: (ps[2 * i], 0, j)
                ),
                pl.BlockSpec(
                    (1, 1, BLOCK_M), lambda i, j, ps: (ps[2 * i], 0, j)
                ),
                pl.BlockSpec(
                    (1, 1, BLOCK_M), lambda i, j, ps: (ps[2 * i + 1], 0, j)
                ),
                pl.BlockSpec(
                    (1, 1, BLOCK_M), lambda i, j, ps: (ps[2 * i + 1], 0, j)
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
            jax.ShapeDtypeStruct((n, 1, m), jnp.uint8),
            jax.ShapeDtypeStruct((n, 1, m), jnp.uint8),
        ],
    )(parents, hapA3, hapB3, hapA3, hapB3, xo, st)
    return outA.reshape(n, m), outB.reshape(n, m)

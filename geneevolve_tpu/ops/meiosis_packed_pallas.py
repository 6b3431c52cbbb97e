"""Pallas meiosis kernel over bit-packed haplotypes (32 loci per uint32).

The haplotype state is one array `(n, 2, mw)` uint32 — both chromatid planes
of an individual adjacent in memory — viewed here as `(n, 2, R, 128)` with
`R = mw / 128` rows of one VREG lane-width each. Per grid cell (one child,
one row-block) the pipeline moves exactly THREE strided DMAs: the father's
two planes, the mother's two planes, and the child's two gametes. That is
the whole memory traffic of a generation: 4 plane-blocks read + 2 written,
with crossover phase, chromatid select, and de novo mutation all fused on
the VPU between them.

Design rules learned on v5e hardware (see DESIGN.md):
  - DMA descriptors cost ~0.2 us to issue; small per-chromosome blocks are
    issue-rate-bound. Blocks span whole rows (multiple chromosomes when they
    fit) and both planes ride one descriptor via the (n, 2, ...) layout.
  - 1-D uint8 blocks waste the (32, 128) sublane tile; 2-D (rows, 128)
    uint32 blocks keep every VPU lane busy and process 4 bytes per lane-op.
  - No branches in the hot loop: every crossover/mutation slot up to the
    static caps contributes an unconditional masked term (padding slots
    compare past the last word and contribute zero).

The crossover phase over a chromosome is parity-of-count, i.e. XOR of
per-crossover suffix indicators; per 32-locus word w and crossover at locus
x (word xw = x>>5):

    term = 0xFFFFFFFF        if w >  xw
         = 0xFFFFFFFF << (x & 31)  if w == xw     (boundary word)
         = 0                 otherwise

so `mask = (start ? ~0 : 0) XOR_k term_k` and the gamete is
`A ^ (mask & (A ^ B))`. Crossover loci are global column indices and blocks
are sliced per chromosome, so the suffix indicator never leaks across a
chromosome boundary. De novo mutations are equality-masked single-bit XORs
in the same pass. Reference semantics: `recombine` + `ras_sim_loc_rec` +
`ras_add_mutation` (`/root/reference/src/Simulation.cpp:2903-2995,
2497-2552`).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# target rows per block: 512 rows x 128 lanes x 4 B = 256 KB per plane-pair
MAX_ROWS = int(os.environ.get("GE_PALLAS_ROWS", 512))
FULL = np.uint32(0xFFFFFFFF)
U32 = jnp.uint32


def pick_block_rows(n_chr: int, chr_rows: int, max_rows: int = 0) -> int:
    """Rows per block: whole chromosomes when they fit under MAX_ROWS,
    else the largest power-of-two split of one chromosome."""
    max_rows = max_rows or MAX_ROWS
    if chr_rows <= max_rows:
        c = 1
        for cand in range(n_chr, 0, -1):
            if n_chr % cand == 0 and cand * chr_rows <= max_rows:
                c = cand
                break
        return c * chr_rows
    blk = chr_rows
    while blk > max_rows and blk % 2 == 0:
        blk //= 2
    return blk


def _kernel(
    parents_ref,  # scalar prefetch (2n,) int32: [f0, m0, f1, m1, ...]
    fat_ref,  # VMEM (1, 2, blk_rows, LANES) uint32: father planes
    mot_ref,  # VMEM (1, 2, blk_rows, LANES) uint32: mother planes
    xo_ref,  # SMEM (1, 2, n_chr, K) int32 crossover loci (global, pad=m)
    xoc_ref,  # SMEM (1, 2, n_chr) int32 real crossover counts
    st_ref,  # SMEM (1, 2, n_chr) int32 start chromatid
    mu_ref,  # SMEM (1, 2, Km) int32 mutation loci (global, pad=m) | None
    muc_ref,  # SMEM (1, 2, 1) int32 real mutation counts | None
    out_ref,  # VMEM (1, 2, blk_rows, LANES) uint32: child gametes
    *,
    chr_rows: int,
    K: int,
    blk_rows: int,
    blk_axis: int = 1,
):
    # Crossover/mutation slot loops run to the REAL count (scalar-driven
    # fori_loop over SMEM), not the static cap: counts are ~Poisson(1) per
    # chromosome, so unconditional cap-length loops made the kernel
    # VPU-compute-bound (~70 vector ops/word) while the DMAs idled. Padding
    # slots would contribute zero anyway (pad = m compares past the last
    # word), so trip-count truncation is bitwise-neutral.
    row0 = pl.program_id(blk_axis) * blk_rows
    n_slices = max(1, blk_rows // chr_rows)
    rows = min(blk_rows, chr_rows)
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (rows, LANES), 0
    ) * LANES + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    for g, ref in ((0, fat_ref), (1, mot_ref)):
        for cl in range(n_slices):
            r0 = cl * rows
            c = row0 // chr_rows + cl
            widx = (row0 + r0) * LANES + iota  # global word indices
            macc = jnp.where(
                st_ref[0, g, c] == 1, FULL, np.uint32(0)
            ) & jnp.full((rows, LANES), FULL, U32)

            def xo_body(k, m_acc):
                x = xo_ref[0, g, c, k]
                xw = x >> 5
                partial = jax.lax.shift_left(FULL, (x & 31).astype(U32))
                return m_acc ^ (
                    jnp.where(widx > xw, FULL, np.uint32(0))
                    | jnp.where(widx == xw, partial, np.uint32(0))
                )

            macc = jax.lax.fori_loop(
                0, xoc_ref[0, g, c], xo_body, macc
            )
            a = ref[0, 0, r0 : r0 + rows, :]
            b = ref[0, 1, r0 : r0 + rows, :]
            child = a ^ (macc & (a ^ b))
            if mu_ref is not None:

                def mu_body(k, ch):
                    p = mu_ref[0, g, k]
                    bit = jax.lax.shift_left(
                        np.uint32(1), (p & 31).astype(U32)
                    )
                    return ch ^ jnp.where(
                        widx == (p >> 5), bit, np.uint32(0)
                    )

                child = jax.lax.fori_loop(
                    0, muc_ref[0, g, 0], mu_body, child
                )
            out_ref[0, g, r0 : r0 + rows, :] = child


@functools.partial(
    jax.jit, static_argnames=("n_chr", "chr_len", "max_rows", "child_major")
)
def meiose_packed_pallas(
    hap,  # (N, 2, mw) uint32 parent planes
    fathers,  # (n,) int32
    mothers,  # (n,) int32
    xo_p,  # (n, n_chr, K) int32 crossover loci, global columns, pad = m
    st_p,  # (n, n_chr) int32 start chromatid
    xo_m,
    st_m,
    mu=None,  # (n, 2, Km) int32 de novo mutation loci, pad = m
    *,
    n_chr: int,
    chr_len: int,
    max_rows: int = 0,
    child_major: bool = True,
):
    """One fused reproduce pass: child = meiosis(father, mother) ^ mutations.

    Returns (n, 2, mw) uint32 child planes (gamete from father in plane 0).
    Requires chr_len % (32 * 128) == 0 (see `pick_block_rows`).

    `child_major=False` iterates the grid block-major (row-block outer,
    child inner): when consecutive children share a parent — siblings
    grouped by sorting children by couple — the Pallas pipeline sees the
    SAME father/mother block index on consecutive steps and skips the DMA,
    so sibling groups fetch each parent's planes once per block instead of
    once per child (the parent-locality play past the per-child gather
    roofline, DESIGN.md)."""
    n = fathers.shape[0]
    mw = hap.shape[2]
    K = xo_p.shape[2]
    chr_rows = chr_len // 32 // LANES
    R = mw // LANES
    assert chr_rows * LANES * 32 == chr_len and R * LANES == mw
    blk_rows = pick_block_rows(n_chr, chr_rows, max_rows)

    hap4 = hap.reshape(-1, 2, R, LANES)
    parents = jnp.stack([fathers, mothers], 1).astype(jnp.int32).reshape(-1)
    xo = jnp.stack([xo_p, xo_m], axis=1).astype(jnp.int32)
    st = jnp.stack([st_p, st_m], axis=1).astype(jnp.int32)
    # real slot counts (pad = m): valid slots are a prefix in the sampler's
    # layout, so a truncated trip count visits exactly the real slots
    m_total = mw * 32
    xo_cnt = jnp.sum(xo < m_total, axis=3).astype(jnp.int32)  # (n, 2, n_chr)

    if child_major:
        grid = (n, R // blk_rows)
        ij = lambda f: (lambda i, j, ps: f(i, j, ps))
    else:  # block-major: child index is the INNER (fastest) grid axis
        grid = (R // blk_rows, n)
        ij = lambda f: (lambda j, i, ps: f(i, j, ps))
    in_specs = [
        pl.BlockSpec(
            (1, 2, blk_rows, LANES), ij(lambda i, j, ps: (ps[2 * i], 0, j, 0))
        ),
        pl.BlockSpec(
            (1, 2, blk_rows, LANES),
            ij(lambda i, j, ps: (ps[2 * i + 1], 0, j, 0)),
        ),
        pl.BlockSpec(
            (1, 2, n_chr, K),
            ij(lambda i, j, ps: (i, 0, 0, 0)),
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec(
            (1, 2, n_chr),
            ij(lambda i, j, ps: (i, 0, 0)),
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec(
            (1, 2, n_chr),
            ij(lambda i, j, ps: (i, 0, 0)),
            memory_space=pltpu.SMEM,
        ),
    ]
    operands = [hap4, hap4, xo, xo_cnt, st]
    if mu is not None:
        mu = mu.astype(jnp.int32)
        # (n, 2, 1): SMEM blocks need their last two dims to match the array
        mu_cnt = jnp.sum(
            mu < m_total, axis=2, keepdims=True
        ).astype(jnp.int32)
        in_specs.extend([
            pl.BlockSpec(
                (1, 2, mu.shape[2]),
                ij(lambda i, j, ps: (i, 0, 0)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 2, 1),
                ij(lambda i, j, ps: (i, 0, 0)),
                memory_space=pltpu.SMEM,
            ),
        ])
        operands.extend([mu, mu_cnt])
    kernel = functools.partial(
        _kernel, chr_rows=chr_rows, K=K, blk_rows=blk_rows,
        blk_axis=1 if child_major else 0,
    )
    if mu is None:
        kernel = functools.partial(
            lambda pr, f, m, x, xc, s, o, *, k: k(
                pr, f, m, x, xc, s, None, None, o
            ),
            k=kernel,
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec(
                    (1, 2, blk_rows, LANES),
                    ij(lambda i, j, ps: (i, 0, j, 0)),
                )
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((n, 2, R, LANES), U32)],
    )(parents, *operands)
    return out[0].reshape(n, 2, mw)

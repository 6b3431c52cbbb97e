"""Kernel experiment harness: packed-meiosis Pallas variants on real TPU.

Measures the meiosis kernel in isolation (planes fed back through a scan so
iterations chain) and checks each variant bitwise against an XLA word-mask
oracle. Run on the TPU chip:

    python tools/kexp.py [--n 4096] [--m 262144] [--n_chr 8] [--iters 20]

Variants:
  v0   shipped uint8 kernel (ops/meiosis_packed_pallas), separate planes
  v2   uint32 words, separate planes, (rows, 128) 2D blocks, per-chromosome
       slices inside the kernel
  v3   v2 + combined (n, 2, rows, 128) plane layout: 3 DMA descriptors per
       child (father, mother, out) instead of 6
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geneevolve_tpu.dense.packed import PackedConfig, pack_bits
from geneevolve_tpu.dense.step import _sample_gamete_plan

LANES = 128
U32 = jnp.uint32
FULL = np.uint32(0xFFFFFFFF)


# ---------------------------------------------------------------- word oracle
def phase_word_masks(xo, start, *, n_chr, chr_len):
    """(n, mw) uint32 phase masks (bit set -> take chromatid B)."""
    n, _, K = xo.shape
    cw = chr_len // 32
    cols = jnp.arange(cw, dtype=jnp.int32)[None, None, :]
    chr_base = (jnp.arange(n_chr, dtype=jnp.int32) * chr_len)[None, :, None]
    mask = jnp.where((start[:, :, None] & 1) == 1, FULL, U32(0))
    mask = jnp.broadcast_to(mask, (n, n_chr, cw))
    for k in range(K):
        x = xo[:, :, k : k + 1] - chr_base
        xw = x >> 5
        partial = jnp.left_shift(FULL, (x & 31).astype(U32))
        term = jnp.where(cols > xw, FULL, U32(0)) | jnp.where(
            cols == xw, partial, U32(0)
        )
        mask = mask ^ term
    return mask.reshape(n, n_chr * cw)


def meiose_words_xla(hapA, hapB, parent, xo, start, *, n_chr, chr_len):
    mask = phase_word_masks(xo, start, n_chr=n_chr, chr_len=chr_len)
    a = hapA[parent]
    b = hapB[parent]
    return a ^ (mask & (a ^ b))


# ------------------------------------------------------------------ v2 kernel
def _mask_slice(widx, xo_ref, st_ref, g, c, K, chr_len):
    """(rows, LANES) uint32 phase mask for chromosome c of gamete g."""
    st = st_ref[0, g, c]
    macc = jnp.where(st == 1, FULL, U32(0)) & jnp.broadcast_to(
        FULL, widx.shape
    )
    base = c * chr_len
    for k in range(K):
        x = xo_ref[0, g, c, k] - base
        xw = x >> 5
        partial = jax.lax.shift_left(FULL, (x & 31).astype(U32))
        term = jnp.where(widx > xw, FULL, U32(0)) | jnp.where(
            widx == xw, partial, U32(0)
        )
        macc = macc ^ term
    return macc


def _kernel_v2(
    parents_ref, fatA, fatB, motA, motB, xo_ref, st_ref, outA, outB,
    *, chr_rows, K, chr_len, blk_rows,
):
    j = pl.program_id(1)
    chr0 = j * (blk_rows // chr_rows)
    widx = (
        jax.lax.broadcasted_iota(jnp.int32, (chr_rows, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (chr_rows, LANES), 1)
    )
    for g, (hA, hB, out) in (
        (0, (fatA, fatB, outA)),
        (1, (motA, motB, outB)),
    ):
        for cl in range(blk_rows // chr_rows):
            c = chr0 + cl
            sl = slice(cl * chr_rows, (cl + 1) * chr_rows)
            mask = _mask_slice(widx, xo_ref, st_ref, g, c, K, chr_len)
            a = hA[0, sl, :]
            b = hB[0, sl, :]
            out[0, sl, :] = a ^ (mask & (a ^ b))


def meiose_v2(hapA, hapB, fathers, mothers, xo_p, st_p, xo_m, st_m,
              *, n_chr, chr_len, blk_rows):
    n = fathers.shape[0]
    mw = hapA.shape[1]
    K = xo_p.shape[2]
    chr_rows = chr_len // 32 // LANES
    R = mw // LANES
    hapA3 = hapA.reshape(-1, R, LANES)
    hapB3 = hapB.reshape(-1, R, LANES)
    parents = jnp.stack([fathers, mothers], 1).astype(jnp.int32).reshape(-1)
    xo = jnp.stack([xo_p, xo_m], axis=1).astype(jnp.int32)
    st = jnp.stack([st_p, st_m], axis=1).astype(jnp.int32)

    row_spec = pl.BlockSpec((1, blk_rows, LANES), lambda i, j, ps: (i, j, 0))
    grid = (n, R // blk_rows)
    outA, outB = pl.pallas_call(
        functools.partial(
            _kernel_v2, chr_rows=chr_rows, K=K, chr_len=chr_len,
            blk_rows=blk_rows,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, blk_rows, LANES),
                             lambda i, j, ps: (ps[2 * i], j, 0)),
                pl.BlockSpec((1, blk_rows, LANES),
                             lambda i, j, ps: (ps[2 * i], j, 0)),
                pl.BlockSpec((1, blk_rows, LANES),
                             lambda i, j, ps: (ps[2 * i + 1], j, 0)),
                pl.BlockSpec((1, blk_rows, LANES),
                             lambda i, j, ps: (ps[2 * i + 1], j, 0)),
                pl.BlockSpec((1, 2, n_chr, K), lambda i, j, ps: (i, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 2, n_chr), lambda i, j, ps: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[row_spec, row_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n, R, LANES), U32),
            jax.ShapeDtypeStruct((n, R, LANES), U32),
        ],
    )(parents, hapA3, hapB3, hapA3, hapB3, xo, st)
    return outA.reshape(n, mw), outB.reshape(n, mw)


# ------------------------------------------------------------------ v3 kernel
def _kernel_v3(
    parents_ref, fat, mot, xo_ref, st_ref, out,
    *, chr_rows, K, chr_len, blk_rows,
):
    j = pl.program_id(1)
    chr0 = j * (blk_rows // chr_rows)
    widx = (
        jax.lax.broadcasted_iota(jnp.int32, (chr_rows, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (chr_rows, LANES), 1)
    )
    for g, ref in ((0, fat), (1, mot)):
        for cl in range(blk_rows // chr_rows):
            c = chr0 + cl
            sl = slice(cl * chr_rows, (cl + 1) * chr_rows)
            mask = _mask_slice(widx, xo_ref, st_ref, g, c, K, chr_len)
            a = ref[0, 0, sl, :]
            b = ref[0, 1, sl, :]
            out[0, g, sl, :] = a ^ (mask & (a ^ b))


def meiose_v3(hap, fathers, mothers, xo_p, st_p, xo_m, st_m,
              *, n_chr, chr_len, blk_rows):
    """hap: (N, 2, R, LANES) uint32. Returns child (n, 2, R, LANES)."""
    n = fathers.shape[0]
    R = hap.shape[2]
    K = xo_p.shape[2]
    chr_rows = chr_len // 32 // LANES
    parents = jnp.stack([fathers, mothers], 1).astype(jnp.int32).reshape(-1)
    xo = jnp.stack([xo_p, xo_m], axis=1).astype(jnp.int32)
    st = jnp.stack([st_p, st_m], axis=1).astype(jnp.int32)

    blk = pl.BlockSpec((1, 2, blk_rows, LANES), lambda i, j, ps: (0, 0, j, 0))
    grid = (n, R // blk_rows)
    out = pl.pallas_call(
        functools.partial(
            _kernel_v3, chr_rows=chr_rows, K=K, chr_len=chr_len,
            blk_rows=blk_rows,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 2, blk_rows, LANES),
                             lambda i, j, ps: (ps[2 * i], 0, j, 0)),
                pl.BlockSpec((1, 2, blk_rows, LANES),
                             lambda i, j, ps: (ps[2 * i + 1], 0, j, 0)),
                pl.BlockSpec((1, 2, n_chr, K), lambda i, j, ps: (i, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 2, n_chr), lambda i, j, ps: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 2, blk_rows, LANES),
                             lambda i, j, ps: (i, 0, j, 0)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((n, 2, R, LANES), U32)],
    )(parents, hap, hap, xo, st)
    return out[0]


# --------------------------------------------------------------------- driver
def bits_to_words(bits):
    m = bits.shape[-1]
    b = bits.reshape(*bits.shape[:-1], m // 32, 32).astype(U32)
    return (b << jnp.arange(32, dtype=U32)).sum(-1, dtype=U32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--m", type=int, default=262144)
    ap.add_argument("--n_chr", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--K", type=int, default=8)
    args = ap.parse_args()
    n, m, n_chr, K = args.n, args.m, args.n_chr, args.K
    chr_len = m // n_chr
    mw = m // 32
    R = mw // LANES
    chr_rows = chr_len // 32 // LANES
    print(f"n={n} m={m} n_chr={n_chr} mw={mw} R={R} chr_rows={chr_rows}")

    cfg = PackedConfig(n=n, m=m, n_chr=n_chr, xo_cap=K)
    key = jax.random.key(0)
    bits = jax.random.bernoulli(key, 0.5, (n, m)).astype(jnp.uint8)
    hapA_b = pack_bits(bits)
    hapB_b = pack_bits(bits[::-1])
    hapA_w = bits_to_words(bits)
    hapB_w = bits_to_words(bits[::-1])
    k1, k2, k3, k4 = jax.random.split(jax.random.key(1), 4)
    fathers = jax.random.randint(k1, (n,), 0, n)
    mothers = jax.random.randint(k2, (n,), 0, n)
    xo_p, st_p, _ = _sample_gamete_plan(k3, cfg.as_dense(), n)
    xo_m, st_m, _ = _sample_gamete_plan(k4, cfg.as_dense(), n)

    # ---- correctness
    oA = meiose_words_xla(hapA_w, hapB_w, fathers, xo_p, st_p,
                          n_chr=n_chr, chr_len=chr_len)
    oB = meiose_words_xla(hapA_w, hapB_w, mothers, xo_m, st_m,
                          n_chr=n_chr, chr_len=chr_len)
    for blk_rows in (chr_rows, R):
        vA, vB = meiose_v2(hapA_w, hapB_w, fathers, mothers,
                           xo_p, st_p, xo_m, st_m,
                           n_chr=n_chr, chr_len=chr_len, blk_rows=blk_rows)
        ok = bool((vA == oA).all() and (vB == oB).all())
        print(f"v2 blk_rows={blk_rows}: match={ok}")
        assert ok
    hap4 = jnp.stack([hapA_w, hapB_w], 1).reshape(n, 2, R, LANES)
    for blk_rows in (chr_rows, R):
        c = meiose_v3(hap4, fathers, mothers, xo_p, st_p, xo_m, st_m,
                      n_chr=n_chr, chr_len=chr_len, blk_rows=blk_rows)
        ok = bool(
            (c[:, 0].reshape(n, mw) == oA).all()
            and (c[:, 1].reshape(n, mw) == oB).all()
        )
        print(f"v3 blk_rows={blk_rows}: match={ok}")
        assert ok

    # ---- timing: scan feeding child planes back as parents
    iters = args.iters

    def time_fn(fn, *state):
        @jax.jit
        def loop(state):
            def body(st, _):
                return fn(*st), ()
            out, _ = jax.lax.scan(body, state, None, length=iters)
            return out
        def sync(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            return float(leaf.reshape(-1)[0])

        sync(loop(state))
        t0 = time.perf_counter()
        sync(loop(state))
        dt = (time.perf_counter() - t0) / iters
        rate = n * m / dt
        print(f"  {dt * 1e3:8.3f} ms/gen   {rate:.3e} ind*loci/s   "
              f"{6 * n * m / 8 / dt / 1e9:7.1f} GB/s effective")
        return dt

    if jax.default_backend() == "tpu":
        from geneevolve_tpu.ops import meiosis_packed_pallas as mpp

        print("v0 (shipped uint8 kernel):")
        time_fn(
            lambda a, b: mpp.meiose_planes_packed_pallas(
                a, b, fathers, mothers, xo_p, st_p, xo_m, st_m,
                n_chr=n_chr, chr_len=chr_len),
            hapA_b, hapB_b,
        )
        for blk_rows in (chr_rows, min(2 * chr_rows, R), R):
            print(f"v2 blk_rows={blk_rows}:")
            time_fn(
                lambda a, b, br=blk_rows: meiose_v2(
                    a, b, fathers, mothers, xo_p, st_p, xo_m, st_m,
                    n_chr=n_chr, chr_len=chr_len, blk_rows=br),
                hapA_w, hapB_w,
            )
        for blk_rows in (chr_rows, min(2 * chr_rows, R), R):
            print(f"v3 blk_rows={blk_rows}:")
            time_fn(
                lambda h, br=blk_rows: (meiose_v3(
                    h, fathers, mothers, xo_p, st_p, xo_m, st_m,
                    n_chr=n_chr, chr_len=chr_len, blk_rows=br),),
                hap4,
            )
        print("xla word oracle:")
        time_fn(
            lambda a, b: (
                meiose_words_xla(a, b, fathers, xo_p, st_p,
                                 n_chr=n_chr, chr_len=chr_len),
                meiose_words_xla(a, b, mothers, xo_m, st_m,
                                 n_chr=n_chr, chr_len=chr_len),
            ),
            hapA_w, hapB_w,
        )
    else:
        print("not on TPU: correctness only (interpret timing skipped)")


if __name__ == "__main__":
    main()

"""Sampler/probe experiment harness: where do the 6.3 s/gen of
`_capacity_probe` at n=300k actually go, and what does a candidate
replacement buy? Runs each component as its own jitted program on the real
chip with scalar-fetch syncs (block_until_ready returns early on this
backend, DESIGN.md).

    python tools/sexp.py --pop_size 300000 [--iters 3]

Components timed (all stacked over 22 chromosomes, lax.map batch_size=1,
exactly like `_capacity_probe`):
  probe_full      the shipped _capacity_probe
  samplers        the 3 sample_point_process calls only
  sampler_nogrid  same but searchsorted bins (no CDF-grid row gather)
  sampler_gather  the grid row-gather alone (bins = grid[t] consume)
  count_valid     count_merge_valid incl. parent-row gathers
  gather_parents  the st[father]/st[mother] row gathers alone
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from geneevolve_tpu.core import segments


def _sync(x) -> None:
    for leaf in jax.tree_util.tree_leaves(x):
        if isinstance(leaf, jax.Array) and leaf.size:
            np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, iters=3):
    out = fn(*args)
    _sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _sync(out)
    return (time.perf_counter() - t0) / iters


def build_inputs(pop_size: int, n0: int, nchr: int, ncv: int, sdir: str):
    """Real maps/grids via the engine's own loader; synthetic 300k state
    (ledger occupancy ~ realistic: sorted boundaries, BIG padding)."""
    from tools.mkscenario import make_scenario

    flags = make_scenario(
        sdir, n0=n0, pop_size=pop_size, gens=3, nchr=nchr, ncv=ncv,
        mat_cor=0.0,
    )
    from geneevolve_tpu.config import parse_args
    from geneevolve_tpu.core.engine import Simulation

    argv = []
    for k, v in flags.items():
        argv += [f"--{k}", v]
    argv += ["--seed", "1", "--prefix", os.path.join(sdir, "x")]
    sim = Simulation(parse_args(argv), verbose=False)
    p = sim.pops[0]
    sm = p.smaps
    n = pop_size
    S, M = 49, 8
    rng = np.random.default_rng(0)
    # ~14 live boundaries/row (measured at gen ~5 of the 300k bench),
    # sorted, BIG-padded
    big = segments._big()
    live = 14
    st = np.full((nchr, n, 2, S), big, dtype=np.int16 if segments.pos_dtype() == jnp.int16 else np.int32)
    pos = np.sort(
        rng.integers(0, 30000, size=(nchr, n, 2, live)), axis=-1
    ).astype(st.dtype)
    st[..., :live] = pos
    st[..., 0] = 0
    mut = np.full((nchr, n, 2, M), big, dtype=st.dtype)
    father = rng.permutation(n).astype(np.int32)
    mother = rng.permutation(n).astype(np.int32)
    return sim, sm, (
        jnp.asarray(st), jnp.asarray(mut), jnp.asarray(father),
        jnp.asarray(mother), jax.random.key(7),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop_size", type=int, default=300_000)
    ap.add_argument("--n0", type=int, default=3_000)
    ap.add_argument("--nchr", type=int, default=22)
    ap.add_argument("--ncv", type=int, default=100)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    sdir = tempfile.mkdtemp(prefix="ge_sexp_")
    sim, sm, (st, mut, father, mother, key) = build_inputs(
        args.pop_size, args.n0, args.nchr, args.ncv, sdir
    )
    from geneevolve_tpu.core.engine import _capacity_probe

    xo_cap, mn_cap = sim.xo_cap, sim.mn_cap
    print(f"xo_cap={xo_cap} mn_cap={mn_cap} has_mut={sim.has_mut} "
          f"xo_grid_w={sm.xo_grid_w} T={None if sm.xo_grid is None else sm.xo_grid.shape}",
          flush=True)
    n = args.pop_size
    res = {}

    def probe_full():
        return _capacity_probe(
            st, mut, father, mother, key,
            sm.bp, sm.xo_cum, sm.xo_lambda, sm.bin_width,
            sm.mut_bp, sm.mut_cum, sm.mut_lambda,
            xo_cap, mn_cap, sim.has_mut,
            sm.xo_grid, sm.mut_grid, sm.bp0, sm.mut_bp0,
            sm.bp_step, sm.mut_bp_step, sm.xo_grid_w, sm.mut_grid_w,
        )

    @jax.jit
    def samplers_only(key):
        def per_chr(k, bp_c, xoc, xol, bw, mcum, mbp, mlam, ci):
            xg = sm.xo_grid[ci] if sm.xo_grid is not None else None
            mg = sm.mut_grid[ci] if sm.mut_grid is not None else None
            b0 = sm.bp0[ci] if sm.bp0 is not None else None
            mb0 = sm.mut_bp0[ci] if sm.mut_bp0 is not None else None
            bs = sm.bp_step[ci] if sm.bp0 is not None else None
            mbs = sm.mut_bp_step[ci] if sm.mut_bp0 is not None else None
            k1, k2, k3 = jax.random.split(k, 3)
            a = segments.sample_point_process(
                k1, n, xo_cap, xoc, xol, bp_c, bw, False,
                grid=xg, grid_w=sm.xo_grid_w, bp0=b0, bp_step=bs)
            b = segments.sample_point_process(
                k2, n, xo_cap, xoc, xol, bp_c, bw, False,
                grid=xg, grid_w=sm.xo_grid_w, bp0=b0, bp_step=bs)
            c = segments.sample_point_process(
                k3, n, mn_cap, mcum, mlam, mbp, 0, True,
                grid=mg, grid_w=sm.mut_grid_w, bp0=mb0, bp_step=mbs)
            return a, b, c

        keys = jax.random.split(key, st.shape[0])
        return jax.lax.map(
            lambda a: per_chr(*a),
            (keys, sm.bp, sm.xo_cum, sm.xo_lambda, sm.bin_width,
             sm.mut_cum, sm.mut_bp, sm.mut_lambda,
             jnp.arange(st.shape[0], dtype=jnp.int32)),
            batch_size=1,
        )

    @jax.jit
    def samplers_nogrid(key):
        def per_chr(k, bp_c, xoc, xol, bw, mcum, mbp, mlam):
            k1, k2, k3 = jax.random.split(k, 3)
            a = segments.sample_point_process(
                k1, n, xo_cap, xoc, xol, bp_c, bw, False)
            b = segments.sample_point_process(
                k2, n, xo_cap, xoc, xol, bp_c, bw, False)
            c = segments.sample_point_process(
                k3, n, mn_cap, mcum, mlam, mbp, 0, True)
            return a, b, c

        keys = jax.random.split(key, st.shape[0])
        return jax.lax.map(
            lambda a: per_chr(*a),
            (keys, sm.bp, sm.xo_cum, sm.xo_lambda, sm.bin_width,
             sm.mut_cum, sm.mut_bp, sm.mut_lambda),
            batch_size=1,
        )

    @jax.jit
    def gather_rows(key):
        """The grid row-gather traffic alone: same probe count as the two
        xo samplers + mutation sampler, uniform random t."""
        def per_chr(k, ci):
            g = sm.xo_grid[ci]
            T = g.shape[0]
            t = jax.random.randint(k, (n * (2 * xo_cap + mn_cap),), 0, T)
            CH = 1 << 20
            P = t.shape[0]
            pad = (-P) % CH
            ft = jnp.pad(t, (0, pad))
            rows = jax.lax.map(
                lambda tc: jnp.sum(g[tc].astype(jnp.int32), axis=1),
                ft.reshape(-1, CH),
            )
            return jnp.sum(rows)

        keys = jax.random.split(key, st.shape[0])
        return jax.lax.map(
            lambda a: per_chr(*a),
            (keys, jnp.arange(st.shape[0], dtype=jnp.int32)),
            batch_size=1,
        )

    @jax.jit
    def count_valid(st, father, mother, key):
        def per_chr(stc, k):
            xo = jax.random.randint(
                k, (n, xo_cap), 0, 30000
            ).astype(stc.dtype)
            sh = jax.random.randint(k, (n,), 0, 2)
            return (
                segments.count_merge_valid(stc[father], xo, sh)
                + segments.count_merge_valid(stc[mother], xo, sh)
            )

        keys = jax.random.split(key, st.shape[0])
        return jax.lax.map(
            lambda a: per_chr(*a), (st, keys), batch_size=1
        )

    @jax.jit
    def gather_parents(st, father, mother):
        def per_chr(stc):
            return (
                jnp.sum(stc[father].astype(jnp.int32))
                + jnp.sum(stc[mother].astype(jnp.int32))
            )

        return jax.lax.map(per_chr, st, batch_size=1)

    @jax.jit
    def count_unrolled(st, father, mother, key):
        """count_merge_valid with the K-axis compare-reduce unrolled into a
        Python sum (one fused elementwise kernel, no (Q, K, n) interm)."""
        big = segments._big()

        def active_unrolled(xo_T, start_hap, q_T):
            cnt = jnp.zeros(q_T.shape, dtype=jnp.int16)
            for k in range(xo_T.shape[0]):
                cnt = cnt + (xo_T[k][None, :] <= q_T).astype(jnp.int16)
            return (start_hap[None, :].astype(jnp.int16) + cnt) % 2

        def cmv(par, xo, sh):
            ncp, _, S = par.shape
            A = par[:, 0, :].T
            B = par[:, 1, :].T
            xo_T = xo.T
            actA = active_unrolled(xo_T, sh, A)
            actB = active_unrolled(xo_T, sh, B)
            not_first = jnp.arange(S)[:, None] > 0
            return (
                1
                + jnp.sum((xo_T < big).astype(jnp.int32), axis=0)
                + jnp.sum(((A < big) & (actA == 0) & not_first).astype(jnp.int32), axis=0)
                + jnp.sum(((B < big) & (actB == 1) & not_first).astype(jnp.int32), axis=0)
            )

        def per_chr(stc, k):
            xo = jax.random.randint(k, (n, xo_cap), 0, 30000).astype(stc.dtype)
            sh = jax.random.randint(k, (n,), 0, 2)
            return cmv(stc[father], xo, sh) + cmv(stc[mother], xo, sh)

        keys = jax.random.split(key, st.shape[0])
        return jax.lax.map(lambda a: per_chr(*a), (st, keys), batch_size=1)

    @jax.jit
    def samplers_T(key):
        """Sampler elementwise math in transposed (cap, n) layout (full
        lanes), WITHOUT the bins step: measures the non-gather floor."""
        def per_chr(k, xol, bw):
            k1, k2, k3 = jax.random.split(k, 3)
            counts = jnp.minimum(jax.random.poisson(k1, xol, (n,)), xo_cap)
            gaps = -jnp.log1p(
                -jax.random.uniform(k2, (xo_cap + 1, n), dtype=jnp.float32)
            )
            s = jnp.cumsum(gaps, axis=0)
            denom = jnp.sum(
                jnp.where(
                    jnp.arange(xo_cap + 1)[:, None] == counts[None, :], s, 0.0
                ),
                axis=0,
            )
            u = s[:xo_cap] / jnp.maximum(denom, 1e-30)[None, :]
            v = jnp.minimum(
                jax.random.uniform(k3, (xo_cap, n), dtype=jnp.float32),
                1.0 - 1e-7,
            )
            pos = (u * 29999.0).astype(jnp.int32) + jnp.floor(v * bw).astype(jnp.int32)
            return jnp.where(
                jnp.arange(xo_cap)[:, None] < counts[None, :], pos, 1 << 30
            )

        keys = jax.random.split(key, st.shape[0] * 2).reshape(st.shape[0], 2, -1)
        return jax.lax.map(
            lambda a: (per_chr(a[0][0], a[1], a[2]),
                       per_chr(a[0][1], a[1], a[2])),
            (keys, sm.xo_lambda, sm.bin_width),
            batch_size=1,
        )

    todo = {
        "probe_full": lambda: timeit(probe_full, iters=args.iters),
        "samplers": lambda: timeit(samplers_only, key, iters=args.iters),
        "sampler_nogrid": lambda: timeit(samplers_nogrid, key, iters=args.iters),
        "sampler_gather": lambda: timeit(gather_rows, key, iters=args.iters),
        "count_valid": lambda: timeit(
            count_valid, st, father, mother, key, iters=args.iters),
        "gather_parents": lambda: timeit(
            gather_parents, st, father, mother, iters=args.iters),
        "count_unrolled": lambda: timeit(
            count_unrolled, st, father, mother, key, iters=args.iters),
        "samplers_T": lambda: timeit(samplers_T, key, iters=args.iters),
    }
    only = [s for s in args.only.split(",") if s]
    for name, fn in todo.items():
        if only and name not in only:
            continue
        try:
            dt = fn()
            res[name] = dt
            print(f"{name:<16s} {dt:8.3f} s", flush=True)
        except Exception as e:  # keep going; report the failure
            print(f"{name:<16s} FAILED: {type(e).__name__}: {e}", flush=True)
    import json

    print(json.dumps(res))


if __name__ == "__main__":
    raise SystemExit(main())

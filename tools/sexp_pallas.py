"""Pallas bins-kernel benchmark + on-hardware oracle at probe scale.

    python tools/sexp_pallas.py --pop_size 300000
"""
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
from tools.sexp import build_inputs, timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop_size", type=int, default=300_000)
    ap.add_argument("--n0", type=int, default=3_000)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    n = args.pop_size

    sdir = tempfile.mkdtemp(prefix="ge_sexpp_")
    sim, sm, (st, mut, father, mother, key) = build_inputs(
        n, args.n0, 22, 100, sdir
    )
    xo_cap = sim.xo_cap
    print(f"use_pallas_bins={segments.use_pallas_bins()} "
          f"bw={sm.xo_c2T.shape}", flush=True)

    def mk(use_kernel):
        @jax.jit
        def samplers(key):
            def per_chr(k, bp_c, xoc, xol, bw, ci):
                xg = sm.xo_grid[ci] if sm.xo_grid is not None else None
                b0 = sm.bp0[ci] if sm.bp0 is not None else None
                bs = sm.bp_step[ci] if sm.bp0 is not None else None
                kw = dict(grid=xg, grid_w=sm.xo_grid_w, bp0=b0, bp_step=bs)
                if use_kernel:
                    kw = dict(bin_L=sm.xo_L[ci], bin_c2=sm.xo_c2T[ci],
                              bp0=b0, bp_step=bs)
                k1, k2 = jax.random.split(k, 2)
                a = segments.sample_point_process(
                    k1, n, xo_cap, xoc, xol, bp_c, bw, False, **kw)
                b = segments.sample_point_process(
                    k2, n, xo_cap, xoc, xol, bp_c, bw, False, **kw)
                return a, b

            keys = jax.random.split(key, st.shape[0])
            return jax.lax.map(
                lambda a: per_chr(*a),
                (keys, sm.bp, sm.xo_cum, sm.xo_lambda, sm.bin_width,
                 jnp.arange(st.shape[0], dtype=jnp.int32)),
                batch_size=1,
            )
        return samplers

    grid_fn, pal_fn = mk(False), mk(True)
    # on-hardware oracle: same key -> bit-identical positions
    a = grid_fn(key)
    b = pal_fn(key)
    ok = all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b))
    )
    print(f"oracle_bit_identical={ok}", flush=True)
    t_grid = timeit(grid_fn, key, iters=args.iters)
    print(f"xo_samplers_grid    {t_grid:8.3f} s", flush=True)
    t_pal = timeit(pal_fn, key, iters=args.iters)
    print(f"xo_samplers_pallas  {t_pal:8.3f} s", flush=True)
    import json
    print(json.dumps({"grid": t_grid, "pallas": t_pal, "oracle_ok": ok}))


if __name__ == "__main__":
    raise SystemExit(main())

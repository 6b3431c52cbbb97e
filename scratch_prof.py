import time
import jax
import jax.numpy as jnp
from functools import partial
from geneevolve_tpu.dense.step import (
    DenseConfig, init_state, make_step, _sample_gamete_plan, _meiose_xla,
    _apply_mutations, phenotype_additive,
)
from geneevolve_tpu.ops import meiosis_pallas as mp

cfg = DenseConfig(n=2048, m=262144, n_chr=8, morgans_per_chr=1.0, xo_cap=8,
                  mut_rate=1.0, mut_cap=8, ncv=256, selection=True,
                  use_pallas=True)
state = init_state(jax.random.key(0), cfg)
key = jax.random.key(1)


def sync(x):
    jax.tree_util.tree_leaves(x)[0].block_until_ready()
    float(jnp.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0])


def bench_fn(name, fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:.1f} ms")
    return dt


hapA, hapB = state["hapA"], state["hapB"]
kf, km, kp, kq = jax.random.split(key, 4)
n = cfg.n
fathers = jax.random.randint(kf, (n,), 0, n)
mothers = jax.random.randint(km, (n,), 0, n)
xo_p, st_p = _sample_gamete_plan(kp, cfg, n)
xo_m, st_m = _sample_gamete_plan(kq, cfg, n)

pallas_fn = jax.jit(partial(mp.meiose_planes_pallas, n_chr=cfg.n_chr))
bench_fn("pallas meiosis (both planes)", pallas_fn,
         hapA, hapB, fathers, mothers, xo_p, st_p, xo_m, st_m)

xla_fn = jax.jit(lambda *a: (_meiose_xla(a[0], a[1], a[2], a[4], a[5], cfg),
                              _meiose_xla(a[0], a[1], a[3], a[6], a[7], cfg)))
bench_fn("xla meiosis (both planes)", xla_fn,
         hapA, hapB, fathers, mothers, xo_p, st_p, xo_m, st_m)

mut_fn = jax.jit(lambda k, g: _apply_mutations(k, g, cfg))
bench_fn("mutations (one plane)", mut_fn, jax.random.key(2), hapA)

plan_fn = jax.jit(lambda k: _sample_gamete_plan(k, cfg, n))
bench_fn("gamete plan", plan_fn, jax.random.key(3))

sel_fn = jax.jit(lambda a, b, c, e: phenotype_additive(a, b, c, e))
bench_fn("phenotype", sel_fn, hapA, hapB, state["cv_idx"], state["eff"])

step = jax.jit(make_step(cfg))
bench_fn("full step (pallas)", step, state, key)

cfg2 = DenseConfig(**{**cfg.__dict__, "use_pallas": False})
step2 = jax.jit(make_step(cfg2))
bench_fn("full step (xla)", step2, state, key)

# roofline context: a pure copy of one plane
copy_fn = jax.jit(lambda x: x + jnp.uint8(1))
bench_fn("elementwise pass (one plane, r+w)", copy_fn, hapA)

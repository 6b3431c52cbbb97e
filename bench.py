"""Benchmark: dense-engine generation throughput on one chip.

Prints ONE JSON line on stdout:
  {"metric": "ind_loci_gens_per_s", "value": N, "unit": "ind*loci*gens/s",
   "vs_baseline": N, ...}

All narration (stage heartbeats, retry diagnostics, full tracebacks of any
swallowed exception) goes to stderr so a killed or failed run still shows
where it died and why.

Ordering and budget: the MAIN measurement runs FIRST (it is the one number
the round must record); the preliminaries (Pallas-vs-XLA oracle check,
bandwidth ceilings, couples on/off A/B) run afterwards, each gated on the
remaining time budget (BENCH_BUDGET_S, default 420 s) so a degraded chip
still emits the core JSON line. Retries are capped (one halved-n retry on
OOM, one Pallas-off retry on kernel errors); every retried exception is
printed with a full traceback and the last one is recorded in the JSON.

Extra keys (all measured on the same chip, same run):
  bytes_per_s       effective HBM traffic of the generation step, using the
                    packed engine's floor of 0.75 B per ind*locus*gen
                    (6 passes over n*m/8-byte planes: 4 parent gathers +
                    2 child writes, `dense/packed.py`)
  pct_of_ceiling    measured_rate / speed-of-light rate, where speed of
                    light is 3x the packed state (read father planes +
                    read mother planes + write child planes — the fused
                    kernel's entire O(state) HBM traffic) priced at the
                    measured row-gather bandwidth on this chip
  gather_GBps       measured row-gather copy bandwidth on this chip
  stream_GBps       measured streaming (read+write) bandwidth on this chip
  kernel_oracle_ok  Pallas kernel vs XLA word-mask oracle, bitwise, on this
                    hardware (not interpret mode); null if skipped by budget
  value_couples_off A/B: same shape with the couple-sorted sibling layout
                    disabled (per-child parent gather); null if skipped

vs_baseline compares against the reference GeneEvolve's effective rate at its
largest published config: 300,000 individuals x 320,926 loci / 1,121.8 s per
generation = 8.58e7 ind*loci*gens/s (BASELINE.md, PDF Table 3.1) — the
honest apples-to-apples number since the dense engine materializes every
genotype every generation while the reference only tracks intervals
(/root/reference/src/Simulation.cpp:1890-2082 loop).
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent compile cache: driver runs are fresh processes; without this
# every run pays ~90 s of cold XLA compiles over the tunnel.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)

import jax
import jax.numpy as jnp

try:  # harmless if unsupported on this jax version
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

REF_RATE = 300_000 * 320_926 / 1_121.8  # reference ind*loci*gens/s

_T0 = time.time()


def hb(msg: str) -> None:
    """Stage heartbeat on stderr (stdout is reserved for the JSON line)."""
    print(f"[bench {time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _free_all_device_buffers() -> None:
    """Drop every live device array (between failed attempts)."""
    try:
        for a in jax.live_arrays():
            try:
                a.delete()
            except Exception:
                pass
    except Exception:
        pass


def _sync(x) -> float:
    """Force a device->host scalar fetch as the sync point
    (block_until_ready can return early on tunneled remote backends)."""
    return float(jax.tree.leaves(x)[0].ravel()[0])


def _time(fn, *args, reps: int = 3) -> float:
    """Median wall time of fn(*args) after one warmup."""
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def measure_ceilings(n: int = 8192, mw: int = 16384, loops: int = 16):
    """(gather_GBps, stream_GBps) on this chip, at a fixed ~1 GiB shape.

    Each measurement chains `loops` dependent passes inside ONE dispatch so
    the tunnel's per-dispatch latency (~10 ms on remote single-chip setups)
    is amortized out of the bandwidth estimate."""
    key = jax.random.key(0)
    hap = jax.random.bits(key, (n, 2, mw), dtype=jnp.uint32)
    idx = jax.random.randint(jax.random.key(1), (n,), 0, n)

    @jax.jit
    def gather(h, i):
        def body(_, x):
            return x[i]

        return jax.lax.fori_loop(0, loops, body, h)

    @jax.jit
    def stream(h):
        def body(k, x):
            # iteration-dependent constant: XOR passes cannot fold away
            return x ^ k.astype(jnp.uint32)

        return jax.lax.fori_loop(0, loops, body, h)

    bytes_state = n * 2 * mw * 4
    dt_g = _time(gather, hap, idx) / loops
    dt_s = _time(stream, hap) / loops
    del hap, idx
    gather_gbps = 2 * bytes_state / dt_g / 1e9  # read (gathered) + write
    stream_gbps = 2 * bytes_state / dt_s / 1e9  # read + write
    return gather_gbps, stream_gbps


def kernel_vs_oracle(use_pallas: bool) -> bool:
    """Bitwise Pallas-vs-XLA reproduce check on the current backend."""
    if not use_pallas:
        return True  # nothing to certify
    import numpy as np

    from geneevolve_tpu.dense import packed as pk
    from geneevolve_tpu.dense.step import _sample_gamete_plan

    cfg = pk.PackedConfig(
        n=64, m=32 * 128 * 8, n_chr=2, xo_cap=4, mut_rate=1.0, mut_cap=4,
        ncv=16, use_pallas=True,
    )
    key = jax.random.key(7)
    ks = jax.random.split(key, 6)
    hap = jax.random.bits(ks[0], (cfg.n, 2, cfg.mw), dtype=jnp.uint32)
    fathers = jax.random.randint(ks[1], (cfg.n,), 0, cfg.n)
    mothers = jax.random.randint(ks[2], (cfg.n,), 0, cfg.n)
    xo_p, st_p, _ = _sample_gamete_plan(ks[3], cfg.as_dense(), cfg.n, None)
    xo_m, st_m, _ = _sample_gamete_plan(ks[4], cfg.as_dense(), cfg.n, None)
    mu = jnp.stack(
        [
            pk.mutation_positions(ks[5], cfg.n, cfg)[0],
            pk.mutation_positions(jax.random.fold_in(ks[5], 1), cfg.n, cfg)[0],
        ],
        axis=1,
    )
    from geneevolve_tpu.ops import meiosis_packed_pallas as mpp

    got = mpp.meiose_packed_pallas(
        hap, fathers, mothers, xo_p, st_p, xo_m, st_m, mu,
        n_chr=cfg.n_chr, chr_len=cfg.chr_len,
    )
    got_bm = mpp.meiose_packed_pallas(
        hap, fathers, mothers, xo_p, st_p, xo_m, st_m, mu,
        n_chr=cfg.n_chr, chr_len=cfg.chr_len, child_major=False,
    )
    wantA = pk.apply_mutations_packed(
        pk.meiose_packed_xla(hap, fathers, xo_p, st_p, cfg), mu[:, 0]
    )
    wantB = pk.apply_mutations_packed(
        pk.meiose_packed_xla(hap, mothers, xo_m, st_m, cfg), mu[:, 1]
    )
    want = jnp.stack([wantA, wantB], axis=1)
    return bool(
        np.array_equal(np.asarray(got), np.asarray(want))
        and np.array_equal(np.asarray(got_bm), np.asarray(want))
    )


def run(
    n: int,
    m: int,
    gens: int,
    use_pallas: bool,
    packed: bool,
    reps: int = 3,
    couples: bool | None = None,
) -> float:
    kw = dict(
        n=n,
        m=m,
        n_chr=8,
        morgans_per_chr=1.0,
        xo_cap=8,
        mut_rate=1.0,
        mut_cap=8,
        ncv=256,
        selection=True,
        use_pallas=use_pallas,
    )
    if couples is None:
        couples = os.environ.get("BENCH_COUPLES", "1") == "1"
    if packed and couples:
        # reference household law: couples + multinomial children sorted by
        # couple; sibling adjacency lets the kernel reuse parent DMAs
        kw["couples"] = True
    if packed:
        from geneevolve_tpu.dense.packed import (
            PackedConfig as Cfg,
            init_state_streamed as init_state,
            make_step,
        )
    else:
        from geneevolve_tpu.dense import (
            DenseConfig as Cfg,
            init_state,
            make_step,
        )
    cfg = Cfg(**kw)
    state = init_state(jax.random.key(0), cfg)
    step = make_step(cfg)

    # all generations inside one jit (lax.scan): measures device time, not
    # the tunnel's ~10 ms per-dispatch overhead. The state is donated so the
    # carry is double- not triple-buffered (4 GiB state x k copies matters).
    from functools import partial as _partial

    @_partial(jax.jit, donate_argnums=0)
    def evolve(state, key):
        def body(st, k):
            return step(st, k), ()

        out, _ = jax.lax.scan(body, state, jax.random.split(key, gens))
        return out

    state = evolve(state, jax.random.key(1))  # warmup / compile
    _sync(state)
    hb(f"run(n={n}, m={m}, gens={gens}, pallas={use_pallas}, "
       f"couples={couples}): compiled + warm")
    ts = []
    for rep in range(reps):
        t0 = time.perf_counter()
        state = evolve(state, jax.random.key(2 + rep))
        _sync(state)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    clip = int(state.get("clip", 0))
    del state
    return n * m * gens / ts[len(ts) // 2], clip


def main() -> None:
    # honest default shape: 16k individuals x 1 Mi loci = 4 GiB packed state
    # (double-buffered under scan: ~8 GiB of a v5e's 16 GiB HBM)
    n = int(os.environ.get("BENCH_N", 16384))
    m = int(os.environ.get("BENCH_M", 1_048_576))
    gens = int(os.environ.get("BENCH_GENS", 5))
    reps = int(os.environ.get("BENCH_REPS", 3))
    budget = float(os.environ.get("BENCH_BUDGET_S", 420))
    use_pallas = os.environ.get("BENCH_PALLAS", "auto")
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    else:
        use_pallas = use_pallas == "1"
    packed = os.environ.get("BENCH_PACKED", "1") == "1"
    couples_default = os.environ.get("BENCH_COUPLES", "1") == "1"
    hb(f"start: backend={jax.default_backend()} n={n} m={m} gens={gens} "
       f"reps={reps} pallas={use_pallas} packed={packed} budget={budget:.0f}s")

    def left() -> float:
        return budget - (time.time() - _T0)

    # ------------------------------------------------------------------
    # MAIN measurement FIRST (the number the round must record).
    # Retry policy: one halved-n retry on OOM, one Pallas-off retry on any
    # other error, then give up. Every failure is logged in full.
    # ------------------------------------------------------------------
    rate = None
    clip = 0
    last_error = None
    for attempt in range(3):
        try:
            hb(f"main measurement attempt {attempt + 1} "
               f"(n={n}, pallas={use_pallas})")
            rate, clip = run(n, m, gens, use_pallas, packed, reps=reps)
            break
        except Exception as e:
            last_error = f"{type(e).__name__}: {str(e)[:400]}"
            hb(f"attempt {attempt + 1} FAILED: {last_error}")
            traceback.print_exc(file=sys.stderr)
            _free_all_device_buffers()
            msg = str(e)
            if (
                "RESOURCE_EXHAUSTED" in msg
                or "Out of memory" in msg
                or "Ran out of memory" in msg
            ):
                n //= 2
                hb(f"OOM -> halving n to {n}")
                continue
            if use_pallas:
                use_pallas = False
                hb("non-OOM error -> retrying with Pallas off")
                continue
            break
    if rate is None:
        hb(f"benchmark failed to run: {last_error}")
        raise RuntimeError(f"benchmark failed to run: {last_error}")
    hb(f"main rate = {rate:.4e} ind*loci*gens/s (clip={clip})")

    # ------------------------------------------------------------------
    # Preliminaries AFTER the main number, each behind the time budget.
    # ------------------------------------------------------------------
    oracle_ok = None
    if left() > 120:
        try:
            hb("oracle check (Pallas vs XLA bitwise)")
            oracle_ok = kernel_vs_oracle(use_pallas)
            hb(f"oracle_ok = {oracle_ok}")
        except Exception as e:
            oracle_ok = False
            hb(f"oracle FAILED: {type(e).__name__}: {str(e)[:200]}")
            traceback.print_exc(file=sys.stderr)
            _free_all_device_buffers()
    else:
        hb("budget exhausted -> skipping oracle check")

    gather_gbps = stream_gbps = -1.0
    if left() > 45:
        try:
            hb("bandwidth ceilings")
            gather_gbps, stream_gbps = measure_ceilings()
            hb(f"gather={gather_gbps:.1f} GB/s stream={stream_gbps:.1f} GB/s")
        except Exception as e:
            hb(f"ceilings FAILED: {type(e).__name__}: {str(e)[:200]}")
            traceback.print_exc(file=sys.stderr)
            _free_all_device_buffers()
    else:
        hb("budget exhausted -> skipping ceilings")

    # couples on/off A/B at the main shape (cheap: compile is the cost)
    rate_ab = None
    if os.environ.get("BENCH_AB", "1") == "1" and left() > 90:
        try:
            hb(f"A/B: couples={not couples_default}")
            rate_ab, _ = run(
                n, m, gens, use_pallas, packed, reps=max(1, reps - 1),
                couples=not couples_default,
            )
            hb(f"A/B rate (couples={not couples_default}) = {rate_ab:.4e}")
        except Exception as e:
            hb(f"A/B FAILED: {type(e).__name__}: {str(e)[:200]}")
            _free_all_device_buffers()
    else:
        hb("skipping couples A/B (disabled or budget exhausted)")

    gen_dt = n * m * gens / rate / gens  # seconds per generation
    bytes_per_gen = n * (m // 8) * 6  # 0.75 B per ind*locus
    # speed of light: one generation's irreducible motion is 3x the packed
    # state — the fused kernel reads the father's two planes and the
    # mother's two planes (gathered rows) and writes the child's two planes,
    # nothing else touches HBM at O(state). Priced at the measured gather
    # bandwidth (gather_GBps already counts read+write traffic).
    state_bytes = n * 2 * (m // 32) * 4
    if gather_gbps > 0:
        sol = 3 * state_bytes / (gather_gbps * 1e9)
        pct = sol / gen_dt
    else:
        sol = pct = -1.0

    print(
        json.dumps(
            {
                "metric": "ind_loci_gens_per_s",
                "value": rate,
                "unit": "ind*loci*gens/s",
                "vs_baseline": rate / REF_RATE,
                "bytes_per_s": rate * 0.75,
                "pct_of_ceiling": pct,
                "gather_GBps": gather_gbps,
                "stream_GBps": stream_gbps,
                "sol_s_per_gen": sol,
                "s_per_gen": gen_dt,
                "bytes_per_gen": bytes_per_gen,
                "n": n,
                "m": m,
                "gens": gens,
                "pallas": bool(use_pallas),
                "couples": couples_default,
                "value_couples_on": rate if couples_default else rate_ab,
                "value_couples_off": rate_ab if couples_default else rate,
                "kernel_oracle_ok": oracle_ok,
                "last_error": last_error,
                # truncated Poisson draws across reps*gens warm steps (tiny
                # at defaults; large means xo_cap/mut_cap are undersized)
                "xo_clip_count": clip,
                # draws/gen = 2 gametes x (n_chr=8 xo draws + 1 mut draw) x n
                "xo_clip_rate": clip / ((reps + 1.0) * gens * n * 18),
                "wall_s": round(time.time() - _T0, 1),
            }
        )
    )
    hb("done")


if __name__ == "__main__":
    main()

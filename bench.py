"""Benchmark: dense-engine generation throughput on one chip.

Prints ONE JSON line:
  {"metric": "ind_loci_gens_per_s", "value": N, "unit": "ind*loci*gens/s",
   "vs_baseline": N}

vs_baseline compares against the reference GeneEvolve's effective rate at its
largest published config: 300,000 individuals x 320,926 loci / 1,121.8 s per
generation = 8.58e7 ind*loci*gens/s (BASELINE.md, PDF Table 3.1) — the
honest apples-to-apples number since the dense engine materializes every
genotype every generation while the reference only tracks intervals.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

REF_RATE = 300_000 * 320_926 / 1_121.8  # reference ind*loci*gens/s


def run(n: int, m: int, gens: int, use_pallas: bool, packed: bool) -> float:
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
    if packed:
        from geneevolve_tpu.dense.packed import (
            PackedConfig as Cfg,
            init_state,
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
    # the tunnel's ~10 ms per-dispatch overhead
    @jax.jit
    def evolve(state, key):
        def body(st, k):
            return step(st, k), ()

        out, _ = jax.lax.scan(body, state, jax.random.split(key, gens))
        return out

    # warmup / compile; force a device->host scalar fetch as the sync point
    # (block_until_ready can return early on tunneled remote backends)
    out = evolve(state, jax.random.key(1))
    float(out["hap"][0, 0, 0])
    t0 = time.perf_counter()
    out = evolve(state, jax.random.key(2))
    float(out["hap"][0, 0, 0])
    dt = time.perf_counter() - t0
    return n * m * gens / dt


def main() -> None:
    n = int(os.environ.get("BENCH_N", 4096))
    m = int(os.environ.get("BENCH_M", 262144))
    gens = int(os.environ.get("BENCH_GENS", 10))
    use_pallas = os.environ.get("BENCH_PALLAS", "auto")
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    else:
        use_pallas = use_pallas == "1"
    packed = os.environ.get("BENCH_PACKED", "1") == "1"

    rate = None
    for attempt in range(4):
        try:
            rate = run(n, m, gens, use_pallas, packed)
            break
        except Exception as e:  # OOM or missing pallas support -> degrade
            msg = str(e)
            if (
                "RESOURCE_EXHAUSTED" in msg
                or "Out of memory" in msg
                or "Ran out of memory" in msg
            ):
                n //= 2
                continue
            if use_pallas:
                use_pallas = False
                continue
            raise
    if rate is None:
        raise RuntimeError("benchmark failed to run")

    print(
        json.dumps(
            {
                "metric": "ind_loci_gens_per_s",
                "value": rate,
                "unit": "ind*loci*gens/s",
                "vs_baseline": rate / REF_RATE,
            }
        )
    )


if __name__ == "__main__":
    main()

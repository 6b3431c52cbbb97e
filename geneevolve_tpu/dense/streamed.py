"""Beyond-HBM packed evolve loop: chromosome slabs stream host<->device.

SURVEY §7.2 step 7 (the last blueprint item): a materialized-genome run
whose packed state EXCEEDS device HBM. The genome lives on the host as
per-slab packed planes (a slab = a contiguous group of whole
chromosomes); each generation the slabs round-trip through the device one
at a time — upload parents, run the fused meiosis+mutation kernel,
download children — with the next slab's upload issued before the
current download so transfer overlaps compute where the runtime allows.
Chromosomes are independent given the generation's mating plan (the same
decomposition the paint path uses for outputs,
`/root/reference/src/Simulation.cpp:1105-1230`), so slab-local meiosis
with slab-local crossover plans is EXACTLY the monolithic law: parent
selection is global (drawn once per generation), crossovers never span
chromosomes.

Scope: single population, uniform mating (`selection=False` — the
selection path needs the resident CV matrix, which is small and would
stay device-resident; streaming it adds nothing to what this
demonstrates). Correctness: `tests/test_streamed.py` bit-compares a
2-slab streamed generation against the same kernels run on in-memory
slabs, and checks allele-frequency conservation over generations.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from geneevolve_tpu.dense.packed import (
    PackedConfig,
    init_state,
    make_reproduce,
)
from geneevolve_tpu.dense.step import _sample_gamete_plan


@dataclass
class StreamedPacked:
    cfg: PackedConfig  # FULL-genome config (n, m, n_chr)
    slab_chrs: int  # chromosomes per slab (must divide n_chr)
    host: List[np.ndarray]  # per-slab (n, 2, w_slab) uint32
    cfg_slab: PackedConfig
    reproduce: callable
    h2d_s: float = 0.0
    d2h_s: float = 0.0

    @classmethod
    def build(cls, key, cfg: PackedConfig, slab_chrs: int,
              verbose: bool = False) -> "StreamedPacked":
        assert cfg.n_chr % slab_chrs == 0
        n_slab = cfg.n_chr // slab_chrs
        m_slab = cfg.m // n_slab
        cfg_slab = PackedConfig(**{
            **cfg.__dict__,
            "m": m_slab,
            "n_chr": slab_chrs,
            "ncv": 0,
            "selection": False,
        })
        host = []
        for s in range(n_slab):
            st = init_state(jax.random.fold_in(key, s), cfg_slab)
            host.append(np.asarray(st["hap"]))
            if verbose:
                print(f"  founder slab {s + 1}/{n_slab} "
                      f"({host[-1].nbytes / 2 ** 30:.2f} GiB)", flush=True)
        return cls(
            cfg=cfg, slab_chrs=slab_chrs, host=host, cfg_slab=cfg_slab,
            reproduce=make_reproduce(cfg_slab),
        )

    @property
    def state_bytes(self) -> int:
        return sum(h.nbytes for h in self.host)

    def step(self, key) -> None:
        """One generation over every slab. Parent selection is global
        (one draw, used by every slab); crossover/mutation plans are
        per-slab (independent chromosomes)."""
        cfg = self.cfg
        k_mate, k_slab = jax.random.split(key)
        km1, km2 = jax.random.split(k_mate)
        fathers = jax.random.randint(km1, (cfg.n,), 0, cfg.n)
        mothers = jax.random.randint(km2, (cfg.n,), 0, cfg.n)
        dense_slab = self.cfg_slab.as_dense()

        n_slab = len(self.host)
        t0 = time.perf_counter()
        dev = jax.device_put(self.host[0])
        self.h2d_s += time.perf_counter() - t0
        for s in range(n_slab):
            ks = jax.random.fold_in(k_slab, s)
            k_pat, k_mat = jax.random.split(ks)
            xo_p, st_p, _ = _sample_gamete_plan(k_pat, dense_slab, cfg.n)
            xo_m, st_m, _ = _sample_gamete_plan(k_mat, dense_slab, cfg.n)
            child = self.reproduce(
                dev, fathers, mothers, xo_p, st_p, xo_m, st_m, None
            )
            if s + 1 < n_slab:
                # prefetch the next slab while this child computes
                t0 = time.perf_counter()
                dev = jax.device_put(self.host[s + 1])
                self.h2d_s += time.perf_counter() - t0
            t0 = time.perf_counter()
            self.host[s] = np.asarray(child)
            self.d2h_s += time.perf_counter() - t0

    def allele_mean(self, slab: int = 0) -> float:
        """Mean set-bit fraction of one slab (drift sanity)."""
        h = self.host[slab]
        return float(np.unpackbits(h.view(np.uint8)).mean())

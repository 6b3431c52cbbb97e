"""Beyond-HBM streamed packed engine (dense/streamed.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from geneevolve_tpu.dense.packed import PackedConfig, unpack_bits
from geneevolve_tpu.dense.streamed import StreamedPacked
from geneevolve_tpu.dense.step import _sample_gamete_plan


def _mk(n=64, m=2048 * 4, n_chr=4, slab_chrs=2):
    cfg = PackedConfig(
        n=n, m=m, n_chr=n_chr, morgans_per_chr=1.0, xo_cap=8,
        mut_rate=0.0, mut_cap=2, ncv=0, selection=False,
    )
    return StreamedPacked.build(jax.random.key(3), cfg, slab_chrs)


def test_streamed_matches_inmemory_slabs():
    """A streamed generation is bit-identical to running the same slab
    kernels on in-memory copies (streaming moves bytes, not math)."""
    eng = _mk()
    before = [h.copy() for h in eng.host]
    key = jax.random.key(11)
    eng.step(key)

    # reference: identical math, no host round-trips
    cfg = eng.cfg
    k_mate, k_slab = jax.random.split(key)
    km1, km2 = jax.random.split(k_mate)
    fathers = jax.random.randint(km1, (cfg.n,), 0, cfg.n)
    mothers = jax.random.randint(km2, (cfg.n,), 0, cfg.n)
    dense_slab = eng.cfg_slab.as_dense()
    for s, par in enumerate(before):
        ks = jax.random.fold_in(k_slab, s)
        k_pat, k_mat = jax.random.split(ks)
        xo_p, st_p, _ = _sample_gamete_plan(k_pat, dense_slab, cfg.n)
        xo_m, st_m, _ = _sample_gamete_plan(k_mat, dense_slab, cfg.n)
        want = np.asarray(eng.reproduce(
            jnp.asarray(par), fathers, mothers, xo_p, st_p, xo_m, st_m, None
        ))
        np.testing.assert_array_equal(eng.host[s], want)


def test_streamed_drift_sanity():
    """Allele frequencies stay interior and move only by drift over a few
    generations (no allele creation/destruction in the streaming path)."""
    eng = _mk(n=128)
    f0 = eng.allele_mean(0)
    for g in range(3):
        eng.step(jax.random.fold_in(jax.random.key(5), g))
    f1 = eng.allele_mean(0)
    assert 0.05 < f1 < 0.95
    assert abs(f1 - f0) < 0.1


def test_state_bytes_accounting():
    eng = _mk()
    assert eng.state_bytes == sum(h.nbytes for h in eng.host)
    assert eng.state_bytes == 64 * 2 * (2048 * 4 // 32) * 4

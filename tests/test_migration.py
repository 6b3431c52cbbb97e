"""General migration-matrix collective in the deme engine
(`parallel/mesh.py:make_deme_step(mig_matrix=...)`): the reference's
row-stochastic matrix law (`Simulation.cpp:877-989`, counts =
round(m_ij * n)) executed as one all_to_all over the 'ind' mesh axis.

The flow test tags every deme's founders with a distinct constant bit
pattern: meiosis of two identical chromatids reproduces the pattern
unchanged (no mutation), so after one step the per-deme pattern histogram
must equal the migration counts EXACTLY — arrivals from deme i into deme j
are counts[i, j] rows, everything else stays native.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geneevolve_tpu.dense.packed import PackedConfig
from geneevolve_tpu.parallel.mesh import make_deme_step, make_mesh, shard_state

D = 4


def _mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(shape=(D, 2))


def _tagged_state(cfg, mesh):
    n_loc = cfg.n // D
    tags = np.repeat(np.arange(1, D + 1, dtype=np.uint32), n_loc)
    hap = np.broadcast_to(
        tags[:, None, None], (cfg.n, 2, cfg.mw)
    ).copy()
    cv = np.broadcast_to(
        tags[:, None, None].astype(np.uint8), (cfg.n, 2, cfg.ncv)
    ).copy()
    state = {
        "hap": jnp.asarray(hap),
        "cv": jnp.asarray(cv),
        "cv_idx": jnp.linspace(0, cfg.m - 1, cfg.ncv).astype(jnp.int32),
        "eff": jnp.zeros((cfg.ncv,), jnp.float32),
        "clip": jnp.zeros((), jnp.int32),
    }
    return shard_state(state, mesh)


M_ASYM = np.array(
    [
        [0.7, 0.3, 0.0, 0.0],
        [0.0, 0.8, 0.2, 0.0],
        [0.1, 0.0, 0.9, 0.0],
        [0.25, 0.25, 0.25, 0.25],
    ]
)


def test_matrix_flow_counts_exact():
    mesh = _mesh()
    cfg = PackedConfig(n=128, m=32 * 64, n_chr=2, morgans_per_chr=1.0,
                       xo_cap=4, ncv=8)
    n_loc = cfg.n // D
    step = make_deme_step(cfg, mesh, mig_matrix=M_ASYM)
    state = _tagged_state(cfg, mesh)
    state = step(state, jax.random.key(0))
    hap = np.asarray(state["hap"])  # (n, 2, mw)
    counts = np.round(M_ASYM * n_loc).astype(int)
    np.fill_diagonal(counts, 0)
    for j in range(D):
        deme = hap[j * n_loc : (j + 1) * n_loc]
        # every row is still a constant plane (meiosis of identical planes)
        assert (deme == deme[:, :1, :1]).all()
        got = np.bincount(deme[:, 0, 0].astype(int), minlength=D + 1)[1:]
        want = counts[:, j].copy()
        want[j] = n_loc - counts[:, j].sum()
        np.testing.assert_array_equal(got, want), j
    # CV rows moved with their genomes
    cv = np.asarray(state["cv"])
    np.testing.assert_array_equal(
        cv[:, 0, 0].astype(np.uint32), hap[:, 0, 0].astype(np.uint32)
    )


def test_matrix_rejects_bad_inputs():
    mesh = _mesh()
    cfg = PackedConfig(n=128, m=32 * 64, n_chr=2, ncv=8)
    with pytest.raises(ValueError, match="sum to 1"):
        make_deme_step(cfg, mesh, mig_matrix=np.full((D, D), 0.5))
    with pytest.raises(ValueError, match="not both"):
        make_deme_step(
            cfg, mesh, mig_rate=0.25, mig_matrix=np.eye(D)
        )
    with pytest.raises(ValueError, match=r"\(4, 4\)"):
        make_deme_step(cfg, mesh, mig_matrix=np.eye(2))


def test_matrix_ring_equals_ring_mode_law():
    """A ring matrix through the all_to_all path moves the same NUMBER of
    rows as the dedicated ring mode (different RNG consumption, same law)."""
    mesh = _mesh()
    cfg = PackedConfig(n=128, m=32 * 64, n_chr=2, ncv=8)
    n_loc = cfg.n // D
    rate = 0.25
    ring = np.eye(D) * (1 - rate)
    for s in range(D):
        ring[s, (s + 1) % D] = rate
    step = make_deme_step(cfg, mesh, mig_matrix=ring)
    state = _tagged_state(cfg, mesh)
    state = step(state, jax.random.key(1))
    hap = np.asarray(state["hap"])
    k = int(round(rate * n_loc))
    for j in range(D):
        deme = hap[j * n_loc : (j + 1) * n_loc, 0, 0].astype(int)
        assert (deme == (j - 1) % D + 1).sum() == k
        assert (deme == j + 1).sum() == n_loc - k

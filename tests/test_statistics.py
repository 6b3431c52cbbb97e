"""Statistical validation against population-genetics theory — the checks the
reference authors used (GeneEvolveDocumentation.pdf §3.2-3.5): heterozygosity
decay under drift, allele-frequency conservation in expectation, assortative
mating raising couple correlation, and directional selection shifting the
phenotype. Run on the dense engine (fast, pure device)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geneevolve_tpu.dense.step import DenseConfig, init_state, make_step


def _evolve(cfg, state, key, gens):
    step = jax.jit(make_step(cfg))
    for g in range(gens):
        state = step(state, jax.random.fold_in(key, g))
    return state


def _het(state):
    """Mean expected heterozygosity 2p(1-p) over loci."""
    t = (state["hapA"].astype(np.float32) + state["hapB"].astype(np.float32))
    p = np.asarray(jnp.mean(t, axis=0) / 2.0)
    return float(np.mean(2 * p * (1 - p)))


def test_heterozygosity_decay_under_drift():
    """h(t) = (1 - 1/2N)^t h(0) under pure drift (PDF Table 3.2)."""
    cfg = DenseConfig(n=50, m=4096, n_chr=4, morgans_per_chr=1.0, xo_cap=8)
    gens = 30
    reps = []
    for r in range(4):
        state = init_state(jax.random.key(r), cfg)
        h0 = _het(state)
        out = _evolve(cfg, state, jax.random.key(100 + r), gens)
        reps.append(_het(out) / h0)
    got = float(np.mean(reps))
    want = (1 - 1 / (2 * cfg.n)) ** gens
    assert abs(got - want) < 0.06, (got, want)


def test_allele_frequency_unbiased():
    """Drift is unbiased: E[p_t] = p_0 (PDF §3.2). With many loci the mean
    frequency shift is ~0."""
    cfg = DenseConfig(n=200, m=8192, n_chr=4)
    state = init_state(jax.random.key(1), cfg)
    p0 = np.asarray(
        jnp.mean(
            state["hapA"].astype(jnp.float32) + state["hapB"].astype(jnp.float32),
            axis=0,
        )
        / 2
    )
    out = _evolve(cfg, state, jax.random.key(2), 10)
    p1 = np.asarray(
        jnp.mean(
            out["hapA"].astype(jnp.float32) + out["hapB"].astype(jnp.float32),
            axis=0,
        )
        / 2
    )
    assert abs(float(np.mean(p1 - p0))) < 0.01


def test_directional_selection_shifts_phenotype():
    """Logistic selection on the phenotype raises the mean breeding value."""
    from geneevolve_tpu.dense.step import phenotype_additive

    cfg = DenseConfig(n=256, m=4096, n_chr=4, ncv=64, selection=True)
    state = init_state(jax.random.key(3), cfg)

    def raw_dosage_value(s):
        # un-centered genetic value: selection response shows up in the mean
        t = (s["hapA"][:, s["cv_idx"]] + s["hapB"][:, s["cv_idx"]]).astype(
            jnp.float32
        )
        return float(jnp.mean(t @ s["eff"]))

    v0 = raw_dosage_value(state)
    out = _evolve(cfg, state, jax.random.key(4), 8)
    v1 = raw_dosage_value(out)
    assert v1 > v0 + 0.5, (v0, v1)


def test_neutral_run_no_phenotype_shift():
    cfg = DenseConfig(n=256, m=4096, n_chr=4, ncv=64, selection=False)
    state = init_state(jax.random.key(3), cfg)
    t0 = (state["hapA"][:, state["cv_idx"]] + state["hapB"][:, state["cv_idx"]]).astype(jnp.float32)
    v0 = float(jnp.mean(t0 @ state["eff"]))
    out = _evolve(cfg, state, jax.random.key(4), 8)
    t1 = (out["hapA"][:, out["cv_idx"]] + out["hapB"][:, out["cv_idx"]]).astype(jnp.float32)
    v1 = float(jnp.mean(t1 @ out["eff"]))
    # drift-only: movement stays within a few SE of zero
    assert abs(v1 - v0) < 2.0, (v0, v1)


def test_assortative_mating_couple_correlation():
    """Rank-matching through an MVN(r) template yields couple mating-value
    correlation ~= r (reference `assort_mate`, Simulation.cpp:2257-2301)."""
    from geneevolve_tpu.core.mating import assort_mate

    rng = np.random.default_rng(5)
    n = 4000
    mv = rng.normal(size=n)
    sex = rng.integers(1, 3, size=n)
    ped = {k: np.arange(n) for k in ("father", "ff", "fm", "mf", "mm")}
    for r_target in (0.0, 0.5, 0.9):
        plan = assort_mate(
            np.random.default_rng(6), mv, np.ones(n), sex, ped,
            r_target, 0.0, False, "p", n,
        )
        got = plan.couple_cor_mating_value(mv)
        assert abs(got - r_target) < 0.08, (r_target, got)

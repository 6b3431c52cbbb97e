"""Device-side mate pairing: law equivalence with the host-numpy oracle
(`core/mating.py`) and mesh-shardability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geneevolve_tpu.parallel import mating_device as md


def _pop(n, rng):
    mv = rng.normal(size=n).astype(np.float32)
    sex = rng.integers(1, 3, size=n)
    ped = {k: np.arange(n) for k in ("father", "ff", "fm", "mf", "mm")}
    return mv, sex, ped


def test_couple_correlation_matches_target():
    rng = np.random.default_rng(0)
    n = 4000
    mv, sex, ped = _pop(n, rng)
    svf = np.ones(n, dtype=np.float32)
    fn = jax.jit(md.assort_mate_device, static_argnums=(6, 7))
    for r_target in (0.0, 0.5, 0.9):
        plan = fn(
            jax.random.key(1), jnp.asarray(mv), jnp.asarray(svf),
            jnp.asarray(sex), {k: jnp.asarray(v) for k, v in ped.items()},
            r_target, False, n,
        )
        valid = np.asarray(plan.valid)
        fa = np.asarray(plan.father_pos)[valid]
        mo = np.asarray(plan.mother_pos)[valid]
        got = float(np.corrcoef(mv[fa], mv[mo])[0, 1])
        assert abs(got - r_target) < 0.08, (r_target, got)
        # the two sexes never cross and no one marries twice
        assert set(np.unique(sex[fa])) == {1}
        assert set(np.unique(sex[mo])) == {2}
        assert len(np.unique(fa)) == len(fa)
        assert len(np.unique(mo)) == len(mo)


def test_selection_gate_and_children():
    rng = np.random.default_rng(1)
    n = 2000
    mv, sex, ped = _pop(n, rng)
    svf = (np.arange(n) % 2).astype(np.float32)  # only odd positions marry
    plan = md.assort_mate_device(
        jax.random.key(2), jnp.asarray(mv), jnp.asarray(svf),
        jnp.asarray(sex), {k: jnp.asarray(v) for k, v in ped.items()},
        0.4, False, n,
    )
    valid = np.asarray(plan.valid)
    assert np.all(np.asarray(plan.father_pos)[valid] % 2 == 1)
    assert np.all(np.asarray(plan.mother_pos)[valid] % 2 == 1)
    # children reference only valid couple slots
    cc = np.asarray(plan.child_couple)
    assert cc.shape == (n,)
    assert np.all(valid[cc])


def test_inbreeding_veto_blocks_sibs():
    rng = np.random.default_rng(2)
    n = 1000
    mv, sex, ped = _pop(n, rng)
    # everyone shares one father: every couple is a sib pair
    ped["father"] = np.zeros(n, dtype=np.int64)
    svf = np.ones(n, dtype=np.float32)
    plan = md.assort_mate_device(
        jax.random.key(3), jnp.asarray(mv), jnp.asarray(svf),
        jnp.asarray(sex), {k: jnp.asarray(v) for k, v in ped.items()},
        0.0, True, n,
    )
    valid = np.asarray(plan.valid)
    assert np.all(np.asarray(plan.inbred)[valid])


def test_random_mate_device_gate():
    rng = np.random.default_rng(3)
    n = 1000
    _, sex, _ = _pop(n, rng)
    svf = (np.arange(n) < 100).astype(np.float32)
    plan = md.random_mate_device(
        jax.random.key(4), jnp.asarray(svf), jnp.asarray(sex), n
    )
    assert np.all(np.asarray(plan.father_pos) < 100)
    assert np.all(np.asarray(plan.mother_pos) < 100)
    assert np.all(np.asarray(sex)[np.asarray(plan.father_pos)] == 1)
    assert np.all(np.asarray(sex)[np.asarray(plan.mother_pos)] == 2)


def test_assort_mate_device_sharded():
    """The pairing program compiles and runs with mv/sex sharded over an
    'ind' mesh axis — XLA inserts the gathers/sorts as collectives."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(jax.devices()[:8]), ("ind",))
    rng = np.random.default_rng(4)
    n = 4096
    mv, sex, ped = _pop(n, rng)
    svf = np.ones(n, dtype=np.float32)
    sh = NamedSharding(mesh, P("ind"))
    args = (
        jax.device_put(jnp.asarray(mv), sh),
        jax.device_put(jnp.asarray(svf), sh),
        jax.device_put(jnp.asarray(sex), sh),
        {k: jax.device_put(jnp.asarray(v), sh) for k, v in ped.items()},
    )
    fn = jax.jit(md.assort_mate_device, static_argnums=(6, 7))
    plan = fn(jax.random.key(5), *args, 0.5, True, n)
    valid = np.asarray(plan.valid)
    fa = np.asarray(plan.father_pos)[valid]
    mo = np.asarray(plan.mother_pos)[valid]
    got = float(np.corrcoef(mv[fa], mv[mo])[0, 1])
    assert abs(got - 0.5) < 0.08, got
    # identical results on 1 device (the law is sharding-invariant)
    plan1 = fn(
        jax.random.key(5), jnp.asarray(mv), jnp.asarray(svf),
        jnp.asarray(sex), {k: jnp.asarray(v) for k, v in ped.items()},
        0.5, True, n,
    )
    np.testing.assert_array_equal(
        np.asarray(plan.father_pos), np.asarray(plan1.father_pos)
    )
    np.testing.assert_array_equal(
        np.asarray(plan.child_couple), np.asarray(plan1.child_couple)
    )


def test_engine_device_mating_end_to_end(mini_scenario, tmp_path):
    """`--device_mating` runs the full engine with on-device pairing and
    produces the standard outputs; couple correlation tracks the schedule's
    mat_cor (0.2 within sampling noise at n=60)."""
    from geneevolve_tpu.config import parse_args
    from geneevolve_tpu.core.engine import Simulation

    cfg = parse_args([
        "--file_gen_info", str(mini_scenario / "popinfo.txt"),
        "--file_hap_name", str(mini_scenario / "hap_address.txt"),
        "--file_recom_map", str(mini_scenario / "rmap.txt"),
        "--file_cv_info", str(mini_scenario / "cv.info"),
        "--file_cvs", str(mini_scenario / "cv_address.txt"),
        "--seed", "99",
        "--device_mating",
        "--prefix", str(tmp_path / "dm"),
    ])
    assert cfg.device_mating
    sim = Simulation(cfg, verbose=False)
    sim.run()
    summary = (tmp_path / "dm.pop1.summary").read_text().splitlines()
    assert len(summary) == 6
    hdr = summary[0].split()
    for line in summary[1:]:
        vals = dict(zip(hdr, line.split()))
        assert abs(float(vals["ph1_var_E"]) - 1.0) < 1e-6


def test_fixed_offspring_law_device():
    """'f' law on device (`Simulation.cpp:2340-2355`): every eligible
    couple gets floor(pop_size/eligible) children; a random subset gets
    one extra; total exactly pop_size."""
    rng = np.random.default_rng(3)
    n = 800
    mv, sex, ped = _pop(n, rng)
    svf = np.ones(n, dtype=np.float32)
    pop_size = 1311  # not a multiple of the couple count
    fn = jax.jit(
        md.assort_mate_device, static_argnames=("mat_cor", "avoid_inbreeding",
                                                "pop_size", "mm_percent",
                                                "offspring_dist", "n_children")
    )
    plan = fn(
        jax.random.key(5), jnp.asarray(mv), jnp.asarray(svf),
        jnp.asarray(sex), {k: jnp.asarray(v) for k, v in ped.items()},
        mat_cor=0.0, avoid_inbreeding=False, pop_size=pop_size,
        offspring_dist="f",
    )
    nc = int(plan.n_couples)
    child = np.asarray(plan.child_couple)
    assert len(child) == pop_size
    sizes = np.bincount(child, minlength=nc)[:nc]
    nf = pop_size // nc
    assert set(np.unique(sizes)) <= {nf, nf + 1}
    assert sizes.sum() == pop_size
    assert (sizes == nf + 1).sum() == pop_size - nf * nc


def test_mm_double_spouse_device():
    """MM (`Simulation.cpp:2199-2213`): with MM=0.5 some individuals marry
    twice (appear in two couples); with MM=0 nobody does; the couple count
    grows accordingly."""
    rng = np.random.default_rng(4)
    n = 2000
    mv, sex, ped = _pop(n, rng)
    svf = np.ones(n, dtype=np.float32)
    fn = jax.jit(
        md.assort_mate_device, static_argnames=("mat_cor", "avoid_inbreeding",
                                                "pop_size", "mm_percent",
                                                "offspring_dist", "n_children")
    )
    res = {}
    for mm in (0.0, 0.5):
        plan = fn(
            jax.random.key(6), jnp.asarray(mv), jnp.asarray(svf),
            jnp.asarray(sex), {k: jnp.asarray(v) for k, v in ped.items()},
            mat_cor=0.0, avoid_inbreeding=False, pop_size=n, mm_percent=mm,
        )
        nc = int(plan.n_couples)
        fa = np.asarray(plan.father_pos)[:nc]
        mo = np.asarray(plan.mother_pos)[:nc]
        assert np.all(fa >= 0) and np.all(fa < n)  # original positions
        assert set(np.unique(np.asarray(sex)[fa])) == {1}
        assert set(np.unique(np.asarray(sex)[mo])) == {2}
        res[mm] = (nc, len(np.unique(fa)), len(np.unique(mo)))
    nc0, uf0, um0 = res[0.0]
    nc5, uf5, um5 = res[0.5]
    assert uf0 == nc0 and um0 == nc0  # no double marriages at MM=0
    assert nc5 > nc0 * 1.3  # ~1.5x couples at MM=0.5
    assert uf5 < nc5 and um5 < nc5  # some marry twice


def test_engine_device_mating_f_and_mm(mini_scenario, tmp_path):
    """The engine no longer gates --device_mating off for 'f' schedules or
    MM > 0: an end-to-end run completes and produces the exact 'f' sizes."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    from mkscenario import make_scenario

    from geneevolve_tpu.config import parse_args
    from geneevolve_tpu.core.engine import Simulation

    flags = make_scenario(
        str(tmp_path / "sc"), n0=80, pop_size=90, gens=3, nchr=2, ncv=6,
        offspring_dist="f",
    )
    argv = []
    for k, v in flags.items():
        argv += [f"--{k}", v]
    argv += ["--seed", "21", "--prefix", str(tmp_path / "o"),
             "--device_mating", "--MM", "0.3"]
    sim = Simulation(parse_args(argv), verbose=False)
    sim.run()
    for g in (1, 2, 3):
        rows = len(
            (tmp_path / f"o.info.pop1.gen{g}.txt").read_text().splitlines()
        ) - 1
        assert rows == 90  # 'f' law is exact


def test_engine_device_mating_poisson_sizes(mini_scenario, tmp_path):
    """--device_mating under the 'p' law: realized generation sizes follow
    the reference's Poisson(pop_size) law (drawn host-side, children
    sliced off the device plan's static padding)."""
    from geneevolve_tpu.config import parse_args
    from geneevolve_tpu.core.engine import Simulation

    cfg = parse_args([
        "--file_gen_info", str(mini_scenario / "popinfo.txt"),
        "--file_hap_name", str(mini_scenario / "hap_address.txt"),
        "--file_recom_map", str(mini_scenario / "rmap.txt"),
        "--file_cv_info", str(mini_scenario / "cv.info"),
        "--file_cvs", str(mini_scenario / "cv_address.txt"),
        "--seed", "31",
        "--prefix", str(tmp_path / "o"),
        "--device_mating",
    ])
    sim = Simulation(cfg, verbose=False)
    sim.run()
    sizes = [
        len((tmp_path / f"o.info.pop1.gen{g}.txt").read_text().splitlines())
        - 1
        for g in range(1, sim.tot_gen + 1)
    ]
    # nominal 60: jitter present (not all equal) and within a sane band
    assert all(25 <= s <= 100 for s in sizes), sizes
    assert len(set(sizes)) > 1, sizes

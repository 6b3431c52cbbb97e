"""Dense panel scenario: real founder panel + real genetic map through the
packed engine."""

import jax
import jax.numpy as jnp
import numpy as np

from geneevolve_tpu.dense import packed as pk
from geneevolve_tpu.dense import scenario
from geneevolve_tpu.dense.step import DenseConfig, _sample_gamete_plan


def test_map_aware_crossovers_follow_cdf():
    """With all map mass in the first half of each chromosome, crossovers
    land only there, at per-chromosome Poisson intensity."""
    cfg = DenseConfig(n=4000, m=2048, n_chr=2, xo_cap=8)
    half = cfg.chr_len // 2
    mass = np.zeros(cfg.m)
    mass[1:half] = 0.5 / (half - 1)  # chr 1: 0.5 Morgans, first half
    mass[cfg.chr_len + 1 : cfg.chr_len + half] = 2.0 / (half - 1)  # chr 2: 2.0
    cdf = jnp.asarray(np.cumsum(mass), dtype=jnp.float32)
    xo, st, _ = _sample_gamete_plan(jax.random.key(0), cfg, cfg.n, cdf)
    xon = np.asarray(xo)
    real = xon < cfg.m
    # all real crossovers inside the massy halves
    pos1 = xon[:, 0][real[:, 0]]
    pos2 = xon[:, 1][real[:, 1]]
    assert pos1.max(initial=0) < half
    assert pos2.min(initial=cfg.m) >= cfg.chr_len
    assert pos2.max(initial=0) < cfg.chr_len + half
    # Poisson counts match the per-chromosome map mass
    c1 = real[:, 0].sum(axis=-1).mean()
    c2 = real[:, 1].sum(axis=-1).mean()
    assert abs(c1 - 0.5) < 0.05, c1
    assert abs(c2 - 2.0) < 0.12, c2


def test_scenario_module_cli(examples_dir, tmp_path, capsys):
    """The README-advertised `python -m geneevolve_tpu.dense.scenario` CLI."""
    rc = scenario.main(
        [
            "--file_hap_name", str(examples_dir / "par.pop1.hap_sample_address.txt"),
            "--file_recom_map", str(examples_dir / "Recom.Map.b37.50KbDiff"),
            "--gens", "1",
            "--out_hap",
            "--prefix", str(tmp_path / "cli.t"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "panel: n=2000" in out
    assert (tmp_path / "cli.t.gen1.chr1.hap").exists()


def test_panel_scenario_end_to_end(examples_dir, tmp_path):
    sc = scenario.load_panel(
        str(examples_dir / "par.pop1.hap_sample_address.txt"),
        str(examples_dir / "Recom.Map.b37.50KbDiff"),
        cv_info=str(examples_dir / "cv.info"),
        selection=True,
        mut_rate=0.3,
        seed=3,
    )
    assert sc.cfg.n == 2000 and len(sc.chrs) == 3
    assert float(sc.xo_cdf[-1]) > 1.0  # real map mass
    af0 = np.asarray(
        pk.unpack_bits(sc.state["hap"][:, 0], sc.cfg.m), dtype=np.float64
    ).mean(axis=0)
    scenario.evolve(sc, gens=2, seed=4)
    prefix = str(tmp_path / "dense.t")
    scenario.write_hap(sc, prefix, 2)
    from geneevolve_tpu.io import hap as hap_io

    mat = hap_io.read_hap(f"{prefix}.gen2.chr1.hap")
    assert mat.shape == (2 * sc.cfg.n, sc.m_real[0])
    af2 = mat.mean(axis=0)
    # drift is bounded: allele frequencies stay correlated with gen 0
    r = np.corrcoef(af0[: sc.m_real[0]], af2)[0, 1]
    assert r > 0.9, r


def test_dense_checkpoint_resume_bit_identical(examples_dir, tmp_path):
    """Interrupted-and-resumed run continues bit-identically: evolve 4 gens
    straight vs 2 gens + checkpoint + fresh load_panel + resume 2 more."""
    def fresh():
        return scenario.load_panel(
            str(examples_dir / "par.pop1.hap_sample_address.txt"),
            str(examples_dir / "Recom.Map.b37.50KbDiff"),
            mut_rate=0.5,
            seed=5,
        )

    ckpt = str(tmp_path / "run.ckpt.npz")
    sc1 = fresh()
    scenario.evolve(sc1, gens=4, seed=6)

    sc2 = fresh()
    scenario.evolve(sc2, gens=4, seed=6, checkpoint_every=2,
                    checkpoint_path=ckpt)
    sc3 = fresh()
    # the last checkpoint written is gen 4; use the gen-2 one via a re-run
    scenario.evolve(sc3, gens=2, seed=6, checkpoint_every=2,
                    checkpoint_path=ckpt)
    sc4 = fresh()
    start = scenario.load_checkpoint(sc4, 6, ckpt)
    assert start == 2
    scenario.evolve(sc4, gens=4, seed=6, start_gen=start)
    assert np.array_equal(np.asarray(sc1.state["hap"]),
                          np.asarray(sc4.state["hap"]))

    # mismatched seed refuses to resume
    sc5 = fresh()
    import pytest

    with pytest.raises(RuntimeError, match="seed"):
        scenario.load_checkpoint(sc5, 7, ckpt)

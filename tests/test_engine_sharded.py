"""Full-semantics engine over a device mesh: results must be bit-identical
to the single-device run (VERDICT r1 item 1).

The engine's only cross-individual reduction is the integer allele count
(`phenotype.additive_dominance_chr`), so sharding the individuals axis over
any mesh must not change a single output byte.
"""

import filecmp

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from geneevolve_tpu.config import parse_args
from geneevolve_tpu.core.engine import Simulation

def _run_mesh(root, outdir, mesh, extra=()):
    args = [
        "--file_gen_info", str(root / "popinfo.txt"),
        "--file_hap_name", str(root / "hap_address.txt"),
        "--file_recom_map", str(root / "rmap.txt"),
        "--file_cv_info", str(root / "cv.info"),
        "--file_cvs", str(root / "cv_address.txt"),
        "--seed", "777",
        "--prefix", str(outdir / "out"),
        *extra,
    ]
    cfg = parse_args(args)
    sim = Simulation(cfg, verbose=False, mesh=mesh)
    sim.run()
    return sim


@pytest.mark.parametrize("ndev", [4, 8])
def test_sharded_engine_bit_identical(mini_scenario, tmp_path, ndev):
    if len(jax.devices()) < ndev:
        pytest.skip("needs 8 virtual devices")
    d1, d2 = tmp_path / "single", tmp_path / f"mesh{ndev}"
    d1.mkdir(), d2.mkdir()
    _run_mesh(mini_scenario, d1, None, ["--out_interval"])
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("ind",))
    sim = _run_mesh(mini_scenario, d2, mesh, ["--out_interval"])

    # genome state really is distributed
    shard_devs = {
        s.device for s in sim.pops[0].state.seg_st.addressable_shards
    }
    assert len(shard_devs) == ndev

    for name in [
        "out.pop1.summary",
        "out.info.pop1.gen0.txt",
        "out.info.pop1.gen4.txt",
        "out.pop1.gen4.chr1.int",
        "out.pop1.gen4.chr2.int",
    ]:
        assert filecmp.cmp(d1 / name, d2 / name, shallow=False), name


def test_sharded_engine_rejects_bad_mesh(mini_scenario, tmp_path):
    mesh = Mesh(np.array(jax.devices()[:2]), ("x",))
    args = parse_args([
        "--file_gen_info", str(mini_scenario / "popinfo.txt"),
        "--file_hap_name", str(mini_scenario / "hap_address.txt"),
        "--file_recom_map", str(mini_scenario / "rmap.txt"),
        "--file_cv_info", str(mini_scenario / "cv.info"),
        "--file_cvs", str(mini_scenario / "cv_address.txt"),
        "--seed", "1",
        "--prefix", str(tmp_path / "out"),
    ])
    with pytest.raises(RuntimeError, match="ind"):
        Simulation(args, verbose=False, mesh=mesh)


def test_cli_mesh_flag_bit_identical(mini_scenario, tmp_path, capsys):
    """The product surface: `python -m geneevolve_tpu --mesh ind=8` must run
    the engine sharded and produce byte-identical outputs to the
    single-device CLI run (VERDICT r3 item 4)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from geneevolve_tpu.cli import main as cli_main

    outs = {}
    for name, extra in (
        ("single", []),
        ("mesh", ["--mesh", "ind=8"]),
        ("auto", ["--mesh", "auto"]),
    ):
        d = tmp_path / name
        d.mkdir()
        rc = cli_main([
            "--file_gen_info", str(mini_scenario / "popinfo.txt"),
            "--file_hap_name", str(mini_scenario / "hap_address.txt"),
            "--file_recom_map", str(mini_scenario / "rmap.txt"),
            "--file_cv_info", str(mini_scenario / "cv.info"),
            "--file_cvs", str(mini_scenario / "cv_address.txt"),
            "--seed", "777",
            "--prefix", str(d / "out"),
            "--out_interval",
            *extra,
        ])
        assert rc == 0
        outs[name] = d
    text = capsys.readouterr().out
    assert "Device mesh: {'ind': 8" in text  # sharded state confirmed in log
    for name in [
        "out.pop1.summary",
        "out.info.pop1.gen4.txt",
        "out.pop1.gen4.chr1.int",
    ]:
        for variant in ("mesh", "auto"):
            assert filecmp.cmp(
                outs["single"] / name, outs[variant] / name, shallow=False
            ), (variant, name)


def test_mesh_spec_parsing():
    from geneevolve_tpu.config import ConfigError, parse_mesh_spec

    assert parse_mesh_spec("auto") is None
    assert parse_mesh_spec("ind=4") == (4, 1)
    assert parse_mesh_spec("ind=4,loci=2") == (4, 2)
    for bad in ("", "ind", "ind=0", "foo=2", "ind=x"):
        with pytest.raises(ConfigError):
            parse_mesh_spec(bad)

"""Selection-function math (Simulation.cpp:3386-3428) and PLINK/hap output
schema checks."""

import numpy as np
import pytest

from geneevolve_tpu.core.phenotype import selection_prob
from geneevolve_tpu.io import hap as hap_io
from geneevolve_tpu.io import plink as plink_io


def test_selection_gen0_all_marry():
    z = np.linspace(-3, 3, 7)
    np.testing.assert_array_equal(selection_prob(z, 0, "logit", 5, 5), np.ones(7))


def test_selection_logit():
    z = np.array([-1.0, 0.0, 2.0])
    got = selection_prob(z, 3, "logit", 0.5, 2.0)
    y = np.exp(0.5 + 2.0 * z)
    np.testing.assert_allclose(got, y / (1 + y))
    # empty func name = logit(0, 1)
    got2 = selection_prob(z, 3, "", 9, 9)
    np.testing.assert_allclose(got2, np.exp(z) / (1 + np.exp(z)))


def test_selection_probit_stab_thr():
    from scipy.stats import norm

    z = np.array([-2.0, 0.0, 1.5])
    np.testing.assert_allclose(
        selection_prob(z, 1, "probit", 0.5, 2.0),
        norm.cdf(z, loc=0.5, scale=2.0),
        rtol=1e-5,  # reference uses the Abramowitz-Stegun approximation
    )
    np.testing.assert_allclose(
        selection_prob(z, 1, "stab", 0.5, 2.0),
        norm.pdf(z, loc=0.5, scale=2.0),
        rtol=1e-12,
    )
    # thr: z <= par2 ? par1 : 1
    np.testing.assert_array_equal(
        selection_prob(z, 1, "thr", 0.25, 0.0), np.array([0.25, 0.25, 1.0])
    )


def test_ped_map_schema(tmp_path):
    rng = np.random.default_rng(0)
    n, m = 3, 5
    geno = rng.integers(0, 2, size=(n, m, 2), dtype=np.uint8)
    ids = plink_io.PedIds(
        fid=np.array([7, 8, 9]),
        iid=np.array([1, 2, 3]),
        pid=np.array([7, 8, 9]),
        mid=np.array([4, 5, 6]),
        sex=np.array([1, 2, 1]),
    )
    al0 = np.array(["A", "C", "G", "T", "A"], dtype=object)
    al1 = np.array(["G", "T", "A", "C", "C"], dtype=object)
    rs = np.array([f"rs{j}" for j in range(m)], dtype=object)
    pos = np.arange(m) * 1000 + 500

    plink_io.write_ped_map(tmp_path / "x", geno, ids, 2, rs, pos, al0, al1,
                           letters=True)
    ped = (tmp_path / "x.ped").read_text().splitlines()
    assert len(ped) == n
    t = ped[0].split()
    assert t[:6] == ["7", "1", "7", "4", "1", "-9"]
    assert len(t) == 6 + 2 * m
    # allele letters map through the legend
    assert t[6] == (al1[0] if geno[0, 0, 0] else al0[0])
    mp = (tmp_path / "x.map").read_text().splitlines()
    assert mp[0].split() == ["2", "rs0", "0", "500"]

    plink_io.write_ped_map(tmp_path / "y", geno, ids, 2, rs, pos, al0, al1,
                           letters=False)
    t01 = (tmp_path / "y.ped").read_text().splitlines()[0].split()
    assert set(t01[6:]) <= {"0", "1"}


def test_hap_write_matches_reference_format(tmp_path):
    mat = np.array([[1, 0], [0, 1]], dtype=np.uint8)  # (2 haps, 2 snps)
    hap_io.write_hap(tmp_path / "z.hap", mat)
    raw = (tmp_path / "z.hap").read_bytes()
    # SNP-major rows, trailing space before newline (format_hap.cpp:17-25)
    assert raw == b"1 0 \n0 1 \n"

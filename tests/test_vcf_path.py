"""VCF reference-panel path: founder loading from VCF, evolution, and VCF
genotype output (reference `ras_read_vcf_pops_chr` / `ras_write_vcf_to_vcf_format`,
Simulation.cpp:1647-1778)."""

import numpy as np
import pytest

from geneevolve_tpu.config import parse_args
from geneevolve_tpu.core.engine import Simulation
from geneevolve_tpu.io import vcf as vcf_io


def _write_vcf(path, pos, hap, samples, chrom="1"):
    n = len(samples)
    m = len(pos)
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.1\n##Phasing=phased\n")
        f.write(
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + "\t".join(samples)
            + "\n"
        )
        for j in range(m):
            gts = "\t".join(
                f"{hap[2 * i, j]}|{hap[2 * i + 1, j]}" for i in range(n)
            )
            f.write(
                f"{chrom}\t{pos[j]}\trs{j}\tA\tG\t.\tPASS\t.\tGT\t{gts}\n"
            )


@pytest.fixture(scope="module")
def vcf_scenario(tmp_path_factory):
    root = tmp_path_factory.mktemp("vcfsc")
    rng = np.random.default_rng(11)
    n0, nsnp, ncv = 30, 100, 6
    pos = np.sort(rng.choice(np.arange(1_000_000, 30_000_000), nsnp, False))
    hap = rng.integers(0, 2, size=(2 * n0, nsnp), dtype=np.uint8)
    samples = [f"s{i}" for i in range(n0)]
    _write_vcf(root / "ref.chr1.vcf", pos, hap, samples)
    cv_cols = np.sort(rng.choice(nsnp, ncv, replace=False))
    np.savetxt(root / "cv.chr1.hap", hap[:, cv_cols].T, fmt="%d")
    with open(root / "cv.info", "w") as f:
        f.write("chr pos a d\n")
        for i in cv_cols:
            f.write(f"1 {pos[i]} {rng.normal()} 0\n")
    with open(root / "vcf_address.txt", "w") as f:
        f.write("chr vcf\n")
        f.write(f"1 {root}/ref.chr1.vcf\n")
    with open(root / "cv_address.txt", "w") as f:
        f.write(f"1 {root}/cv.chr1.hap\n")
    with open(root / "popinfo.txt", "w") as f:
        f.write(
            "pop_size mat_cor offspring_dist selection_func "
            "selection_func_par1 selection_func_par2\n"
        )
        for _ in range(3):
            f.write("40 0 p thr 1 1\n")
    with open(root / "rmap.txt", "w") as f:
        f.write("chr bp cM\n")
        for bp in range(0, 40_000_000, 50_000):
            f.write(f"1 {bp} {bp / 1_000_000:.6f}\n")
    return root


def test_vcf_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pos = np.sort(rng.choice(10_000_000, 50, replace=False)) + 1
    hap = rng.integers(0, 2, size=(8, 50), dtype=np.uint8)
    _write_vcf(tmp_path / "x.vcf", pos, hap, ["a", "b", "c", "d"])
    v = vcf_io.read_vcf(tmp_path / "x.vcf")
    assert v.samples == ["a", "b", "c", "d"]
    np.testing.assert_array_equal(v.pos, pos)
    np.testing.assert_array_equal(v.hap, hap)
    vcf_io.write_vcf(tmp_path / "y.vcf", v)
    v2 = vcf_io.read_vcf(tmp_path / "y.vcf")
    np.testing.assert_array_equal(v2.hap, hap)


def test_vcf_scenario_end_to_end(vcf_scenario, tmp_path):
    cfg = parse_args([
        "--file_gen_info", str(vcf_scenario / "popinfo.txt"),
        "--file_ref_vcf", str(vcf_scenario / "vcf_address.txt"),
        "--file_recom_map", str(vcf_scenario / "rmap.txt"),
        "--file_cv_info", str(vcf_scenario / "cv.info"),
        "--file_cvs", str(vcf_scenario / "cv_address.txt"),
        "--seed", "55",
        "--prefix", str(tmp_path / "out"),
        "--out_vcf",
    ])
    assert cfg.ref_is_vcf
    sim = Simulation(cfg, verbose=False)
    sim.run()
    assert (tmp_path / "out.pop1.summary").exists()
    out = vcf_io.read_vcf(tmp_path / "out.pop1.gen3.chr1.vcf")
    # realized size ~ Poisson(40) (`Simulation.cpp:2329-2337`)
    n_final = sim.pops[0].state.n
    assert out.hap.shape == (2 * n_final, 100)
    assert 15 <= n_final <= 70
    assert out.samples[0] == "g3_1"
    # painted output alleles must be drawn from the founder pool per locus:
    # any locus fixed in founders stays fixed
    founders = vcf_io.read_vcf(vcf_scenario / "ref.chr1.vcf")
    fixed = founders.hap.min(axis=0) == founders.hap.max(axis=0)
    same = (out.hap.min(axis=0) == out.hap.max(axis=0))
    assert np.all(same[fixed])

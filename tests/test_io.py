import numpy as np
import pytest

from geneevolve_tpu.io import hap as hap_io
from geneevolve_tpu.io import tables, vcf as vcf_io


def test_hap_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    mat = rng.integers(0, 2, size=(10, 37), dtype=np.uint8)
    path = tmp_path / "x.hap"
    hap_io.write_hap(path, mat)
    back = hap_io.read_hap(path)
    np.testing.assert_array_equal(mat, back)


def test_read_example_hap(examples_dir):
    mat = hap_io.read_hap(examples_dir / "ref.chr1.hap")
    assert mat.shape == (4000, 1000)  # 2000 founders x 2 haplotypes
    assert set(np.unique(mat)) <= {0, 1}
    # spot check against raw text: first line, first entries
    first = (examples_dir / "ref.chr1.hap").read_text().splitlines()[0].split()
    np.testing.assert_array_equal(
        mat[: len(first), 0], np.array(first, dtype=np.uint8)
    )


def test_read_legend_indv(examples_dir):
    leg = hap_io.read_legend(examples_dir / "ref.chr1.legend")
    assert leg.nsnp == 1000
    assert leg.ids[0] == "rs1"
    assert leg.pos[0] == 1178108
    indv = hap_io.read_indv(examples_dir / "ref.chr1.indv")
    assert len(indv) == 2000
    assert indv[0] == "1"


def test_gen_info(examples_dir):
    s = tables.read_generation_info(examples_dir / "ex1.popinfo.txt")
    assert s.n_generations == 10
    assert s.pop_size[0] == 3000
    assert s.offspring_dist[0] == "p"
    assert s.selection_func[0] == "thr"
    assert s.selection_par1[0] == 1 and s.selection_par2[0] == 1


def test_hap_address(examples_dir):
    rows = tables.read_hap_address(examples_dir / "par.pop1.hap_sample_address.txt")
    assert [r[0] for r in rows] == [1, 2, 3]
    assert rows[0][1].endswith("ref.chr1.hap")


def test_cv_info(examples_dir):
    cv = tables.read_cv_info(examples_dir / "cv.info", [1, 2, 3])
    assert sum(len(cv[c].bp) for c in (1, 2, 3)) == 300
    assert cv[1].bp[0] == 18786243
    np.testing.assert_allclose(cv[1].a[0], -0.66561743160972)


def test_cv_info_rejects_unknown_chr(examples_dir):
    with pytest.raises(ValueError):
        tables.read_cv_info(examples_dir / "cv.info", [1, 2])


def test_rmap(examples_dir):
    maps = tables.read_recom_map(examples_dir / "Recom.Map.b37.50KbDiff", [1, 2, 3])
    m1 = maps[1]
    assert m1.bin_width == 50000
    p = m1.prob
    assert p[0] == 0
    assert np.all(p >= 0)
    # per-bin mass = delta cM / 100 (`Population.cpp:471-480`)
    np.testing.assert_allclose(p[1:], np.diff(m1.cM) * 0.01)


def test_mutation_map(examples_dir):
    maps = tables.read_mutation_map(
        examples_dir / "Mutation.Map.b37.50KbDiff", [1, 2, 3]
    )
    assert np.all(maps[1].rate >= 0)
    np.testing.assert_allclose(maps[1].rate[1], 1e-6)


def test_migration(tmp_path):
    p = tmp_path / "mig.txt"
    p.write_text("0.9 0.1 0.2 0.8\n1 0 0 1\n")
    mats = tables.read_migration(p, 2, 2)
    assert mats.shape == (2, 2, 2)
    np.testing.assert_allclose(mats[0], [[0.9, 0.1], [0.2, 0.8]])
    bad = tmp_path / "bad.txt"
    bad.write_text("0.5 0.1 0.2 0.8\n")
    with pytest.raises(ValueError):
        tables.read_migration(bad, 2, 1)


def test_vcf_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    n, m = 5, 7
    hap = rng.integers(0, 2, size=(2 * n, m), dtype=np.uint8)
    v = vcf_io.VcfData(
        samples=[f"s{i}" for i in range(n)],
        chrom=np.full(m, "1", dtype=object),
        pos=np.arange(100, 100 + m, dtype=np.int64),
        ids=np.array([f"rs{j}" for j in range(m)], dtype=object),
        ref=np.full(m, "A", dtype=object),
        alt=np.full(m, "G", dtype=object),
        qual=np.full(m, ".", dtype=object),
        filt=np.full(m, ".", dtype=object),
        info=np.full(m, ".", dtype=object),
        fmt=np.full(m, "GT", dtype=object),
        hap=hap,
        meta_lines=vcf_io.default_meta_lines(),
    )
    path = tmp_path / "x.vcf"
    vcf_io.write_vcf(path, v)
    assert vcf_io.read_header_samples(path) == v.samples
    back = vcf_io.read_vcf(path)
    np.testing.assert_array_equal(back.hap, hap)
    np.testing.assert_array_equal(back.pos, v.pos)

"""Native C++ codec parity with the pure-Python fallbacks."""

import numpy as np
import pytest

from geneevolve_tpu import native
from geneevolve_tpu.io import hap as hap_io
from geneevolve_tpu.io import vcf as vcf_io


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_hap_parse_matches_python(lib, tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    mat = rng.integers(0, 2, size=(20, 33), dtype=np.uint8)
    path = tmp_path / "x.hap"
    hap_io.write_hap(path, mat)
    got = hap_io.read_hap(path)
    monkeypatch.setenv("GE_NO_NATIVE", "1")
    want = hap_io.read_hap(path)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, mat)


def test_native_vcf_roundtrip_matches_python(lib, tmp_path, monkeypatch):
    rng = np.random.default_rng(1)
    n, m = 7, 40
    pos = np.sort(rng.choice(10_000_000, m, replace=False)) + 1
    hap = rng.integers(0, 2, size=(2 * n, m), dtype=np.uint8)
    v = vcf_io.VcfData(
        samples=[f"s{i}" for i in range(n)],
        chrom=np.full(m, "1", dtype=object),
        pos=pos,
        ids=np.array([f"rs{j}" for j in range(m)], dtype=object),
        ref=np.full(m, "A", dtype=object),
        alt=np.full(m, "G", dtype=object),
        qual=np.full(m, ".", dtype=object),
        filt=np.full(m, "PASS", dtype=object),
        info=np.full(m, ".", dtype=object),
        fmt=np.full(m, "GT", dtype=object),
        hap=hap,
        meta_lines=vcf_io.default_meta_lines(),
    )
    p1 = tmp_path / "native.vcf"
    vcf_io.write_vcf(p1, v)
    back_native = vcf_io.read_vcf(p1)
    monkeypatch.setenv("GE_NO_NATIVE", "1")
    p2 = tmp_path / "python.vcf"
    vcf_io.write_vcf(p2, v)
    assert p1.read_bytes() == p2.read_bytes()
    back_python = vcf_io.read_vcf(p2)
    np.testing.assert_array_equal(back_native.hap, back_python.hap)
    np.testing.assert_array_equal(back_native.hap, hap)
    np.testing.assert_array_equal(back_native.pos, pos)
    assert back_native.samples == back_python.samples


def test_native_vcf_skips_multiallelic(lib, tmp_path, monkeypatch):
    text = (
        "##fileformat=VCFv4.1\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ta\tb\n"
        "1\t100\trs1\tA\tG\t.\tPASS\t.\tGT\t0|1\t1|1\n"
        "1\t200\trs2\tA\tG,T\t.\tPASS\t.\tGT\t0|1\t1|2\n"
        "1\t300\trs3\tA\tG\t.\tq10\t.\tGT\t1|0:7\t0|0\n"
    )
    p = tmp_path / "m.vcf"
    p.write_text(text)
    got = vcf_io.read_vcf(p)
    monkeypatch.setenv("GE_NO_NATIVE", "1")
    want = vcf_io.read_vcf(p)
    for v in (got, want):
        assert list(v.pos) == [100, 300]  # multi-allelic rs2 dropped
        assert list(v.filt) == ["PASS", "q10"]  # non-PASS kept
        np.testing.assert_array_equal(
            v.hap, np.array([[0, 1], [1, 0], [1, 0], [1, 0]], dtype=np.uint8)
        )

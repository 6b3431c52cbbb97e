"""Synthetic GeneEvolve scenario generator at arbitrary scale.

Writes the same input-file set the reference consumes
(`/root/reference/src/Population.cpp:13-343` readers): a generation-info
schedule, per-chromosome CV hap files + cv.info, a 50kb-binned recombination
map, .indv sample lists, and the address files that tie them together. Used
by tools/bench_engine.py to reproduce the shapes of the reference's
published Table 3.1 benchmark (BASELINE.md): the main-loop timing there
excludes genotype I/O, and the full founder panel is never touched during
evolution in either implementation (reference: intervals only,
`Simulation.cpp` §3.4 asymmetry; here: the segment ledger), so the .hap
panels are written as small stubs unless --snps asks for real ones.

Chromosome sizes follow GRCh37 Mb lengths; the genetic map is a constant
1.3 cM/Mb in 50 kb bins (~37 Morgans genome-wide, matching the human map's
total mass within 10%).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np

# GRCh37 chromosome lengths, Mb (1..22)
CHR_MB = [249, 243, 198, 191, 181, 171, 159, 146, 141, 136,
          135, 134, 115, 107, 102, 90, 83, 78, 59, 63, 48, 51]


def _hap_line(row: np.ndarray) -> bytes:
    """One .hap text row: every allele followed by a space, then newline
    (the reference's trailing-space format, `format_hap.cpp:17-25`)."""
    line = bytearray(2 * len(row) + 1)
    line[0:-1:2] = (row + ord("0")).tobytes()
    line[1:-1:2] = b" " * len(row)
    line[-1:] = b"\n"
    return bytes(line)


def make_scenario(
    out: str,
    n0: int = 10_000,
    pop_size: int = 300_000,
    gens: int = 10,
    nchr: int = 22,
    ncv: int = 100,  # per chromosome
    snps: int = 0,  # per chromosome; 0 = stub panel (evolution never reads it)
    mat_cor: float = 0.0,
    selection: str = "thr 1 1",
    offspring_dist: str = "p",
    bin_kb: int = 50,
    cm_per_mb: float = 1.3,
    seed: int = 1,
) -> dict:
    """Write every scenario file under `out`; returns the CLI argument map."""
    root = Path(out)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    chrs = list(range(1, nchr + 1))
    lengths = [CHR_MB[(c - 1) % 22] * 1_000_000 for c in chrs]

    with open(root / "popinfo.txt", "w") as f:
        f.write(
            "pop_size mat_cor offspring_dist selection_func "
            "selection_func_par1 selection_func_par2\n"
        )
        for _ in range(gens):
            f.write(
                f"{pop_size} {mat_cor:g} {offspring_dist} {selection}\n"
            )

    with open(root / "rmap.txt", "w") as f:
        f.write("chr bp cM\n")
        step = bin_kb * 1000
        for c, L in zip(chrs, lengths):
            for bp in range(0, L + step, step):
                f.write(f"{c} {bp} {bp / 1e6 * cm_per_mb:.6f}\n")

    # founder sample list (shared by all chromosomes)
    with open(root / "ref.indv", "w") as f:
        f.writelines(f"id{i + 1}\n" for i in range(n0))

    # CV tables + founder CV hap files
    cv_rows = []
    for c, L in zip(chrs, lengths):
        pos = np.sort(
            rng.choice(np.arange(10_000, L - 10_000), ncv, replace=False)
        )
        a = rng.normal(size=ncv)
        mat = rng.integers(0, 2, size=(ncv, 2 * n0)).astype(np.uint8)
        body = bytearray()
        for r in range(ncv):
            body += _hap_line(mat[r])
        with open(root / f"cv.chr{c}.hap", "wb") as f:
            f.write(bytes(body))
        for p, aa in zip(pos, a):
            cv_rows.append((c, int(p), float(aa)))
    with open(root / "cv.info", "w") as f:
        f.write("chr pos a d\n")
        for c, p, aa in cv_rows:
            f.write(f"{c} {p} {aa:.6f} 0\n")
    with open(root / "cv_address.txt", "w") as f:
        for c in chrs:
            f.write(f"{c} {root}/cv.chr{c}.hap\n")

    # founder panel: real (snps per chr) or 2-SNP stubs
    m = max(snps, 2)
    for c, L in zip(chrs, lengths):
        pos = np.sort(rng.choice(np.arange(1, L), m, replace=False))
        with open(root / f"ref.chr{c}.legend", "w") as f:
            f.write("id position a0 a1\n")
            for i, p in enumerate(pos):
                f.write(f"rs{c}_{i} {p} A G\n")
        mat = rng.integers(0, 2, size=(m, 2 * n0)).astype(np.uint8)
        body = bytearray()
        for r in range(m):
            body += _hap_line(mat[r])
        with open(root / f"ref.chr{c}.hap", "wb") as f:
            f.write(bytes(body))
    with open(root / "hap_address.txt", "w") as f:
        f.write("chr hap legend sample\n")
        for c in chrs:
            f.write(
                f"{c} {root}/ref.chr{c}.hap {root}/ref.chr{c}.legend "
                f"{root}/ref.indv\n"
            )

    return {
        "file_gen_info": str(root / "popinfo.txt"),
        "file_hap_name": str(root / "hap_address.txt"),
        "file_recom_map": str(root / "rmap.txt"),
        "file_cv_info": str(root / "cv.info"),
        "file_cvs": str(root / "cv_address.txt"),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", required=True)
    ap.add_argument("--n0", type=int, default=10_000)
    ap.add_argument("--pop_size", type=int, default=300_000)
    ap.add_argument("--gens", type=int, default=10)
    ap.add_argument("--nchr", type=int, default=22)
    ap.add_argument("--ncv", type=int, default=100)
    ap.add_argument("--snps", type=int, default=0)
    ap.add_argument("--mat_cor", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args(argv)
    flags = make_scenario(
        args.out, n0=args.n0, pop_size=args.pop_size, gens=args.gens,
        nchr=args.nchr, ncv=args.ncv, snps=args.snps, mat_cor=args.mat_cor,
        seed=args.seed,
    )
    print(" ".join(f"--{k} {v}" for k, v in flags.items()))
    return 0


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main())

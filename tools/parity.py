"""A/B parity harness: run the reference GeneEvolve binary and this
framework on the bundled Example scenarios and compare variance-component
trajectories distributionally.

The reference's own validation is statistical (PDF sections 3.2-3.5): RNGs
differ, so gen-0 deterministic quantities must match tightly while
trajectories must agree in distribution. Checks per example:

  - gen-0 var_A / var_D: deterministic given the founder panel and CV
    effects (`Simulation.cpp:2624-2749`) -> relative tolerance 2%
    (the binary prints 6 significant digits).
  - gen-0 var_E: both implementations rescale E to the target ve exactly
    (`Simulation.cpp:3166-3180`) -> 2%.
  - trajectory means over generations 1..G of var_A, var_P, h2: drift and
    mating noise -> 15% relative (h2 absolute 0.05).

Usage:
  python tools/parity.py [--examples DIR] [--ref-bin PATH] [--only 1,2,5]

Exits nonzero if any check fails; prints one table per example.
"""

from __future__ import annotations

import argparse
import json
import os
import shlex
import subprocess
import sys
import tempfile
import zipfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_REF_BIN = "/root/reference/GeneEvolve_Linux"
DEFAULT_ZIP = "/root/reference/Examples.zip"


def parse_example_script(path: str) -> list:
    """Flag list from an ExampleN.sh (strips the binary and backslashes)."""
    toks = []
    with open(path) as f:
        for line in f:
            line = line.strip().rstrip("\\").strip()
            if not line or line.startswith("#"):
                continue
            toks.extend(shlex.split(line))
    # drop the leading ../bin/GeneEvolve
    return [t for t in toks if not t.endswith("GeneEvolve")]


def with_prefix(argv: list, prefix: str) -> list:
    out = list(argv)
    i = out.index("--prefix")
    out[i + 1] = prefix
    return out


def read_summary(path: str) -> dict:
    """{column: (G+1,) float array} from a .summary file (either schema)."""
    with open(path) as f:
        header = f.readline().split()
        rows = [line.split() for line in f if line.strip()]
    cols = {h: np.array([float(r[i]) for r in rows]) for i, h in enumerate(header)}
    return cols


def find_col(cols: dict, *cands) -> np.ndarray:
    for c in cands:
        if c in cols:
            return cols[c]
    for name in cols:
        for c in cands:
            if name.lower().endswith(c.lower()):
                return cols[name]
    raise KeyError(f"none of {cands} in {list(cols)}")


def compare(ref: dict, ours: dict) -> list:
    """[(name, ref_val, our_val, tol, ok)]"""
    checks = []

    def rel(name, r, o, tol):
        denom = max(abs(r), 1e-9)
        checks.append((name, r, o, tol, abs(o - r) / denom <= tol))

    for comp, tol0 in (("var_A", 0.02), ("var_D", 0.02), ("var_E", 0.02)):
        try:
            r = find_col(ref, f"ph1_{comp}", comp)
            o = find_col(ours, f"ph1_{comp}", comp)
        except KeyError:
            continue
        if abs(r[0]) < 1e-12 and abs(o[0]) < 1e-12:
            checks.append((f"gen0 {comp}", r[0], o[0], tol0, True))
        else:
            rel(f"gen0 {comp}", r[0], o[0], tol0)
        if comp in ("var_A",):
            rel(f"mean {comp} g1..G", float(np.mean(r[1:])),
                float(np.mean(o[1:])), 0.15)
    try:
        r = find_col(ref, "ph1_var_P", "var_P")
        o = find_col(ours, "ph1_var_P", "var_P")
        rel("mean var_P g1..G", float(np.mean(r[1:])), float(np.mean(o[1:])),
            0.15)
        rh = find_col(ref, "ph1_h2", "h2")
        oh = find_col(ours, "ph1_h2", "h2")
        dh = abs(float(np.mean(rh[1:])) - float(np.mean(oh[1:])))
        checks.append(("mean h2 g1..G", float(np.mean(rh[1:])),
                       float(np.mean(oh[1:])), 0.05, dh <= 0.05))
    except KeyError:
        pass
    return checks


def run_example(i: int, exdir: str, ref_bin: str, workdir: str) -> bool:
    script = os.path.join(exdir, f"Example{i}.sh")
    argv = parse_example_script(script)
    ref_prefix = os.path.join(workdir, f"ref.ex{i}")
    our_prefix = os.path.join(workdir, f"ours.ex{i}")

    print(f"== Example {i}: running reference binary ...", flush=True)
    subprocess.run(
        [ref_bin] + with_prefix(argv, ref_prefix),
        cwd=exdir, check=True, capture_output=True, timeout=1800,
    )
    print(f"== Example {i}: running geneevolve_tpu ...", flush=True)
    from geneevolve_tpu import cli

    here = os.getcwd()
    os.chdir(exdir)  # scenario files are referenced relatively
    try:
        rc = cli.main(with_prefix(argv, our_prefix))
    finally:
        os.chdir(here)
    if rc != 0:
        print(f"Example {i}: our CLI failed rc={rc}")
        return False

    npop = 1 + argv.count("--next_population")
    all_ok = True
    for pop in range(1, npop + 1):
        ref_cols = read_summary(f"{ref_prefix}.pop{pop}.summary")
        our_cols = read_summary(f"{our_prefix}.pop{pop}.summary")
        checks = compare(ref_cols, our_cols)
        print(f"  pop {pop}:")
        for name, r, o, tol, ok in checks:
            mark = "ok  " if ok else "FAIL"
            print(f"    [{mark}] {name:<22s} ref={r:<12.5g} ours={o:<12.5g} "
                  f"tol={tol:g}")
            all_ok &= ok
    return all_ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples", default="")
    ap.add_argument("--ref-bin", default=DEFAULT_REF_BIN)
    ap.add_argument("--only", default="1,2,3,4,5,6,7,8,9,10")
    ap.add_argument("--workdir", default="")
    args = ap.parse_args()

    exdir = args.examples
    tmp = None
    if not exdir:
        tmp = tempfile.mkdtemp(prefix="ge_parity_")
        with zipfile.ZipFile(DEFAULT_ZIP) as z:
            z.extractall(tmp)
        exdir = os.path.join(tmp, "Examples")
    workdir = args.workdir or tempfile.mkdtemp(prefix="ge_parity_out_")

    results = {}
    ok = True
    for i in [int(s) for s in args.only.split(",") if s]:
        try:
            good = run_example(i, exdir, args.ref_bin, workdir)
        except subprocess.CalledProcessError as e:
            print(f"Example {i}: reference binary failed: {e.stderr[:500]}")
            good = False
        results[i] = good
        ok &= good
    print(json.dumps({"parity": results, "all_ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

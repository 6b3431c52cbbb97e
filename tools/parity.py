"""A/B parity harness: run the reference GeneEvolve binary and this
framework on the bundled Example scenarios (Examples.zip: Example1..10, plus
the Example2.zip 22-chromosome VCF scenario as id "vcf") and compare
variance-component trajectories distributionally.

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

Version skew note (SURVEY.md section 2.2): the shipped binary is v1.1.0 and
rejects the `--no_output` flag that 8 of the 10 example scripts pass
(`src/parameters.cpp:146-150` has no such flag in any source version), so
that flag is stripped from the argv given to the binary; our parser accepts
it for drop-in compatibility.

Usage:
  python tools/parity.py [--examples DIR] [--ref-bin PATH] [--only 1,2,vcf]
                         [--out PARITY.json]

Exits nonzero if any check fails; prints one table per example and writes a
JSON report.
"""

from __future__ import annotations

import argparse
import json
import os
import shlex
import subprocess
import sys
import tempfile
import traceback
import zipfile

# Example-scale runs are tiny; the CPU backend avoids per-call tunnel
# latency on single-chip remote-TPU setups. Override with GE_PARITY_PLATFORM.
os.environ.setdefault("JAX_PLATFORMS", os.environ.get("GE_PARITY_PLATFORM", "cpu"))

import numpy as np

try:
    import geneevolve_tpu  # noqa: F401  (installed package)
except ImportError:  # fall back to running from a source checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_REF_BIN = "/root/reference/GeneEvolve_Linux"
DEFAULT_ZIP = "/root/reference/Examples.zip"
DEFAULT_VCF_ZIP = "/root/reference/Example2.zip"


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


def for_ref_binary(argv: list) -> list:
    """Strip flags the shipped v1.1.0 binary does not know."""
    return [a for a in argv if a != "--no_output"]


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


def compare(ref: dict, ours: dict, n_pheno: int = 1) -> list:
    """[(name, ref_val, our_val, tol, ok)]"""
    checks = []

    def rel(name, r, o, tol):
        denom = max(abs(r), 1e-9)
        checks.append((name, float(r), float(o), tol, bool(abs(o - r) / denom <= tol)))

    for j in range(1, n_pheno + 1):
        tag = f"ph{j} " if n_pheno > 1 else ""
        for comp, tol0 in (("var_A", 0.02), ("var_D", 0.02), ("var_E", 0.02)):
            try:
                r = find_col(ref, f"ph{j}_{comp}", comp)
                o = find_col(ours, f"ph{j}_{comp}", comp)
            except KeyError:
                continue
            if abs(r[0]) < 1e-12 and abs(o[0]) < 1e-12:
                checks.append((f"{tag}gen0 {comp}", float(r[0]), float(o[0]), tol0, True))
            else:
                rel(f"{tag}gen0 {comp}", r[0], o[0], tol0)
            if comp == "var_A":
                rel(f"{tag}mean {comp} g1..G", float(np.mean(r[1:])),
                    float(np.mean(o[1:])), 0.15)
        try:
            r = find_col(ref, f"ph{j}_var_P", "var_P")
            o = find_col(ours, f"ph{j}_var_P", "var_P")
            rel(f"{tag}mean var_P g1..G", float(np.mean(r[1:])),
                float(np.mean(o[1:])), 0.15)
            rh = find_col(ref, f"ph{j}_h2", "h2")
            oh = find_col(ours, f"ph{j}_h2", "h2")
            dh = abs(float(np.mean(rh[1:])) - float(np.mean(oh[1:])))
            checks.append((f"{tag}mean h2 g1..G", float(np.mean(rh[1:])),
                           float(np.mean(oh[1:])), 0.05, bool(dh <= 0.05)))
        except KeyError:
            pass
    return checks


def print_checks(pop: int, checks: list) -> bool:
    ok = True
    print(f"  pop {pop}:")
    for name, r, o, tol, good in checks:
        mark = "ok  " if good else "FAIL"
        print(f"    [{mark}] {name:<24s} ref={r:<12.5g} ours={o:<12.5g} "
              f"tol={tol:g}")
        ok &= good
    return ok


def run_ours(argv: list, cwd: str) -> int:
    from geneevolve_tpu import cli

    here = os.getcwd()
    os.chdir(cwd)  # scenario files are referenced relatively
    try:
        return cli.main(argv)
    finally:
        os.chdir(here)


def run_example(i: int, exdir: str, ref_bin: str, workdir: str, report: dict) -> bool:
    script = os.path.join(exdir, f"Example{i}.sh")
    argv = parse_example_script(script)
    ref_prefix = os.path.join(workdir, f"ref.ex{i}")
    our_prefix = os.path.join(workdir, f"ours.ex{i}")

    print(f"== Example {i}: running reference binary ...", flush=True)
    subprocess.run(
        [ref_bin] + for_ref_binary(with_prefix(argv, ref_prefix)),
        cwd=exdir, check=True, capture_output=True, timeout=1800,
    )
    print(f"== Example {i}: running geneevolve_tpu ...", flush=True)
    rc = run_ours(with_prefix(argv, our_prefix), exdir)
    if rc != 0:
        print(f"Example {i}: our CLI failed rc={rc}")
        return False

    npop = 1 + argv.count("--next_population")
    n_pheno = argv.count("--file_cv_info") // npop
    all_ok = True
    for pop in range(1, npop + 1):
        ref_cols = read_summary(f"{ref_prefix}.pop{pop}.summary")
        our_cols = read_summary(f"{our_prefix}.pop{pop}.summary")
        checks = compare(ref_cols, our_cols, n_pheno)
        report.setdefault("checks", []).extend(
            {"pop": pop, "name": n, "ref": r, "ours": o, "tol": t, "ok": k}
            for n, r, o, t, k in checks
        )
        all_ok &= print_checks(pop, checks)
    return all_ok


def run_vcf_example(ref_bin: str, workdir: str, report: dict,
                    zip_path: str = DEFAULT_VCF_ZIP) -> bool:
    """The Example2.zip 22-chromosome VCF scenario (main.sh), with a fixed
    seed added (the script relies on the time-based default)."""
    exroot = os.path.join(workdir, "vcf_example")
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(exroot)
    exdir = os.path.join(exroot, "Example2")
    argv = [
        "--file_gen_info", "par.geninfo.txt",
        "--file_ref_vcf", "par.vcf_sample_address.txt",
        "--file_recom_map", "Recom.Map.b37.50KbDiff",
        "--file_cv_info", "par.cv.info",
        "--file_cvs", "par.cv_hap_files.txt",
        "--va", ".4", "--ve", ".6",
        "--file_output_generations", "par.output.txt",
        "--out_vcf",
        "--seed", "12345",
        "--prefix", "PREFIX",
    ]
    i = argv.index("PREFIX")

    ref_prefix = os.path.join(workdir, "ref.vcf")
    our_prefix = os.path.join(workdir, "ours.vcf")
    print("== VCF example (Example2.zip): running reference binary ...",
          flush=True)
    argv[i] = ref_prefix
    subprocess.run([ref_bin] + argv, cwd=exdir, check=True,
                   capture_output=True, timeout=1800)
    print("== VCF example: running geneevolve_tpu ...", flush=True)
    argv[i] = our_prefix
    rc = run_ours(list(argv), exdir)
    if rc != 0:
        print(f"VCF example: our CLI failed rc={rc}")
        return False

    ref_cols = read_summary(f"{ref_prefix}.pop1.summary")
    our_cols = read_summary(f"{our_prefix}.pop1.summary")
    checks = compare(ref_cols, our_cols)

    # schema parity on the written VCFs: same record counts per chromosome,
    # same sample naming (g<gen>_<id>, `Simulation.cpp:1729`)
    for gen in (4, 5):
        for chrom in (1, 22):
            rp = f"{ref_prefix}.pop1.gen{gen}.chr{chrom}.vcf"
            op = f"{our_prefix}.pop1.gen{gen}.chr{chrom}.vcf"
            rn = _vcf_schema(rp)
            on = _vcf_schema(op)
            checks.append(
                (f"vcf gen{gen} chr{chrom} records", rn["records"],
                 on["records"], 0, bool(rn["records"] == on["records"])))
            checks.append(
                (f"vcf gen{gen} chr{chrom} samples", rn["samples"],
                 on["samples"], 0, bool(rn["samples"] == on["samples"])))
            checks.append(
                (f"vcf gen{gen} chr{chrom} sample0", 0, 0, 0,
                 bool(rn["sample0"] == on["sample0"])))
    report.setdefault("checks", []).extend(
        {"pop": 1, "name": n, "ref": r, "ours": o, "tol": t, "ok": k}
        for n, r, o, t, k in checks
    )
    return print_checks(1, checks)


def _vcf_schema(path: str) -> dict:
    records = 0
    samples = 0
    sample0 = ""
    with open(path) as f:
        for line in f:
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                parts = line.rstrip("\n").split("\t")
                samples = len(parts) - 9
                sample0 = parts[9] if samples else ""
                continue
            records += 1
    return {"records": records, "samples": samples, "sample0": sample0}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples", default="")
    ap.add_argument("--ref-bin", default=DEFAULT_REF_BIN)
    ap.add_argument("--only", default="1,2,3,4,5,6,7,8,9,10,vcf")
    ap.add_argument("--workdir", default="")
    ap.add_argument("--out", default="", help="write a JSON report here")
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
    reports = {}
    ok = True
    for tok in [s.strip() for s in args.only.split(",") if s.strip()]:
        report: dict = {}
        try:
            if tok == "vcf":
                good = run_vcf_example(args.ref_bin, workdir, report)
            else:
                good = run_example(int(tok), exdir, args.ref_bin, workdir, report)
        except subprocess.CalledProcessError as e:
            err = e.stderr.decode() if isinstance(e.stderr, bytes) else str(e.stderr)
            print(f"Example {tok}: reference binary failed: {err[:500]}")
            report["error"] = f"reference binary: {err[:500]}"
            good = False
        except Exception:
            print(f"Example {tok}: harness error:")
            traceback.print_exc()
            report["error"] = traceback.format_exc(limit=5)
            good = False
        report["ok"] = bool(good)
        results[tok] = bool(good)
        reports[tok] = report
        ok &= good

    payload = {
        "parity": results,
        "all_ok": bool(ok),
        "n_pass": sum(results.values()),
        "n_total": len(results),
        "details": reports,
    }
    print(json.dumps({"parity": results, "all_ok": bool(ok)}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

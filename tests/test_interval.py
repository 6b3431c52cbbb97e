""".int (IBD interval) output fidelity vs the reference's part structure
(`ras_write_hap_to_interval_format`, Simulation.cpp:1582-1639).

With --out_interval the engine keeps crossover-split part boundaries
(merge_ibd=False), so the .int file reconstructs recombination history:
at generation 1 every parent is a founder whose chromatids are single
full-chromosome parts, hence each gamete's part count minus one IS its
crossover count, and consecutive parts must alternate between the two
chromatids of a single founder.
"""

import collections
from pathlib import Path

import numpy as np
import pytest

from geneevolve_tpu.config import parse_args
from geneevolve_tpu.core.engine import Simulation


@pytest.fixture(scope="module")
def gen1_run(tmp_path_factory):
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.mkscenario import make_scenario

    root = tmp_path_factory.mktemp("int_scenario")
    flags = make_scenario(
        str(root), n0=40, pop_size=200, gens=1, nchr=2, ncv=10, seed=3
    )
    out = tmp_path_factory.mktemp("int_out")
    argv = []
    for k, v in flags.items():
        argv += [f"--{k}", v]
    argv += [
        "--seed", "99", "--prefix", str(out / "o"), "--out_interval",
    ]
    cfg = parse_args(argv)
    sim = Simulation(cfg, verbose=False)
    sim.run()
    return sim, out


def _read_int(path):
    rows = []
    with open(path) as f:
        hdr = f.readline().split()
        for line in f:
            t = line.split()
            rows.append(
                {
                    "h_ID": int(t[0]),
                    "hap": int(t[2]),
                    "st": int(t[3]),
                    "en": int(t[4]),
                    "hap_index": int(t[5]),
                    "gen0_indv": t[6],
                    "root_pop": int(t[7]),
                }
            )
    assert hdr == [
        "h_ID", "chr", "hap", "st", "en", "hap_index", "gen0_indv",
        "root_pop",
    ]
    return rows


def test_int_gen1_reconstructs_crossovers(gen1_run):
    sim, out = gen1_run
    p = sim.pops[0]
    total_xo, total_gam = 0, 0
    for ic, chrom in enumerate(sim.chrs):
        rows = _read_int(out / f"o.pop1.gen1.chr{chrom}.int")
        by_gam = collections.defaultdict(list)
        for r in rows:
            by_gam[(r["h_ID"], r["hap"])].append(r)
        assert len(by_gam) == 2 * p.state.n
        L = p.maps[ic].xo_lambda  # Morgans for this chromosome
        for (hid, hap), segs in by_gam.items():
            # rows chain: st[0] = chr start, en[k] = st[k+1], en[-1] = chr end
            assert segs[0]["st"] == p.maps[ic].chr_start
            assert segs[-1]["en"] == p.maps[ic].chr_end
            for a, b in zip(segs, segs[1:]):
                assert a["en"] == b["st"]
            # gen-1 structure: all parts from ONE founder, alternating
            # chromatids (parents are founders = single full-chr parts, so
            # every boundary is a crossover, reference recombine semantics)
            founder = {(s["hap_index"] - 1) // 2 for s in segs}
            assert len(founder) == 1
            chromatids = [(s["hap_index"] - 1) % 2 for s in segs]
            for a, b in zip(chromatids, chromatids[1:]):
                assert a != b, "crossover-split boundary was merged away"
            # gen0_indv carries the founder sample id + .1/.2 suffix
            for s in segs:
                base, suf = s["gen0_indv"].rsplit(".", 1)
                assert suf == str((s["hap_index"] - 1) % 2 + 1)
                assert base == p.indv_ids[(s["hap_index"] - 1) // 2]
            total_xo += len(segs) - 1
            total_gam += 1
        # per-chromosome crossover mean matches the sampler's law
        n_gam = 2 * p.state.n
        xo_chr = sum(len(v) - 1 for v in by_gam.values())
        mean = xo_chr / n_gam
        tol = 5 * np.sqrt(L / n_gam)  # 5 sigma of the Poisson mean
        assert abs(mean - L) < tol, (chrom, mean, L, tol)


def test_split_ledger_paints_identically_to_merged(tmp_path, mini_scenario):
    """merge_ibd only affects .int granularity, never painted genotypes."""
    outs = {}
    for mode, extra in (("merged", []), ("split", ["--out_interval"])):
        d = tmp_path / mode
        d.mkdir()
        argv = [
            "--file_gen_info", str(mini_scenario / "popinfo.txt"),
            "--file_hap_name", str(mini_scenario / "hap_address.txt"),
            "--file_recom_map", str(mini_scenario / "rmap.txt"),
            "--file_cv_info", str(mini_scenario / "cv.info"),
            "--file_cvs", str(mini_scenario / "cv_address.txt"),
            "--seed", "777", "--prefix", str(d / "out"), "--out_hap",
            *extra,
        ]
        sim = Simulation(parse_args(argv), verbose=False)
        sim.run()
        outs[mode] = d
    for chrom in (1, 2):
        a = (outs["merged"] / f"out.pop1.gen4.chr{chrom}.hap").read_bytes()
        b = (outs["split"] / f"out.pop1.gen4.chr{chrom}.hap").read_bytes()
        assert a == b
    # the split run's summary trajectories are also unchanged
    assert (outs["merged"] / "out.pop1.summary").read_text() == (
        outs["split"] / "out.pop1.summary"
    ).read_text()

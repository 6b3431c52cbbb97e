"""Genotype materialization ("painting") and the output dispatcher.

The segment ledger is painted over the founder panel with one device gather
per (individual, locus) — the vectorized replacement for the reference's
O(n·parts·m) interval-walk loops
(`/root/reference/src/Simulation.cpp:1186-1230, 1308-1416, 1690-1758`).
Founder panels are re-read per chromosome at output time for all populations
(migration means anyone may carry anyone's founders,
`Simulation.cpp:1105-1138`).

Output naming matches the reference:
`<prefix>.pop<i>.gen<g>.chr<c>.{hap,indv,ped,map,vcf,int}`.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from geneevolve_tpu.core import segments
from geneevolve_tpu.io import hap as hap_io
from geneevolve_tpu.io import plink as plink_io
from geneevolve_tpu.io import vcf as vcf_io

_LOCI_CHUNK = 1 << 20


@partial(jax.jit, static_argnames=())
def _paint_chunk(seg_st, seg_hap, mut, founder, pos):
    """(n, 2, mc) alleles for a loci chunk: founder-row gather + mutation XOR."""
    rows = segments.hap_at(seg_st, seg_hap, pos)  # (n, 2, mc)
    bits = founder[rows, jnp.arange(pos.shape[0])[None, None, :]]
    flip = segments.mutation_flip_mask(mut, jnp.broadcast_to(pos, rows.shape))
    return jnp.where(flip, 1 - bits, bits).astype(jnp.uint8)


def paint_chunks(
    seg_st: jax.Array,  # (n, 2, S)
    seg_hap: jax.Array,
    mut: jax.Array,
    founder: np.ndarray,  # (H, m) uint8, concatenated over populations
    legend_pos: np.ndarray,  # (m,) int64
):
    """Yield (lo, (n, 2, mc) uint8) painted loci chunks — the streaming form:
    SNP-major outputs (.hap, VCF) consume each chunk and drop it, so peak
    host memory is one chunk x n, never n x m."""
    founder_d = jnp.asarray(founder, dtype=jnp.uint8)
    m = len(legend_pos)
    for lo in range(0, m, _LOCI_CHUNK):
        pos = jnp.asarray(
            legend_pos[lo : lo + _LOCI_CHUNK], dtype=segments.pos_dtype()
        )
        yield lo, np.asarray(
            _paint_chunk(
                seg_st, seg_hap, mut, founder_d[:, lo : lo + _LOCI_CHUNK], pos
            )
        )


def paint_chromosome(
    seg_st: jax.Array,  # (n, 2, S)
    seg_hap: jax.Array,
    mut: jax.Array,
    founder: np.ndarray,  # (H, m) uint8, concatenated over populations
    legend_pos: np.ndarray,  # (m,) int64
) -> np.ndarray:
    """(n, 2, m) uint8 simulated haplotypes, fully materialized (PED output
    and tests; the streaming writers use `paint_chunks`)."""
    return np.concatenate(
        [
            blk
            for _, blk in paint_chunks(
                seg_st, seg_hap, mut, founder, legend_pos
            )
        ],
        axis=2,
    )


def _load_founder_chr(sim, ic: int):
    """Concatenated founder panel + per-pop legends for one chromosome."""
    legends, panels = [], []
    for p in sim.pops:
        if p.vcf_addresses:
            v = vcf_io.read_vcf(p.vcf_addresses[ic][1])
            legends.append(v)
            panels.append(v.hap)
        else:
            _, hap_path, legend_path, _ = p.hap_addresses[ic]
            legends.append(hap_io.read_legend(legend_path))
            panels.append(hap_io.read_hap(hap_path))
    m0 = panels[0].shape[1]
    for pan in panels[1:]:
        if pan.shape[1] != m0:
            raise RuntimeError(
                "founder panels must have the same SNP count across "
                "populations for genotype output"
            )
    return legends, np.concatenate(panels, axis=0)


def _host_rows(sim, st) -> "np.ndarray | None":
    """Rows of this population this HOST writes: all of them in
    single-process runs (None = no slicing, reference-identical files);
    under `jax.distributed`, only the rows whose shards live on this
    host's devices — each host streams its own `.hostK.*` files
    (SURVEY §2.4 multi-host I/O row)."""
    from geneevolve_tpu.parallel import multihost

    if multihost.process_info()[1] == 1:
        return None
    ranges = multihost.host_row_ranges(st.seg_st, axis=1)
    rows = np.concatenate(
        [np.arange(lo, min(hi, st.n)) for lo, hi in ranges]
        or [np.arange(0)]
    )
    return rows


def save_genotypes(sim, gen: int) -> None:
    from geneevolve_tpu.parallel import multihost

    cfg = sim.cfg
    suffix = multihost.host_suffix()
    want_paint = cfg.out_hap or cfg.out_plink or cfg.out_plink01 or cfg.out_vcf
    if want_paint:
        for ic, chrom in enumerate(sim.chrs):
            legends, founder = _load_founder_chr(sim, ic)
            for p in sim.pops:
                st = p.state
                base = (
                    f"{cfg.prefix}.pop{p.index + 1}.gen{gen}.chr{chrom}"
                    f"{suffix}"
                )
                leg = legends[p.index]
                pos = _legend_pos(leg)
                m = len(pos)
                rows = _host_rows(sim, st)

                # SNP-major formats (.hap, VCF) stream loci chunk by chunk:
                # paint on device, write, drop — peak host memory is one
                # (n, 2, chunk) block, never (n, 2, m)
                ids_out = st.ids if rows is None else st.ids[rows]
                n_out = len(ids_out)
                hap_f = None
                vcf_w = None
                if cfg.out_hap:
                    hap_f = open(base + ".hap", "wb")
                    hap_io.write_indv(base + ".indv", ids_out + 1)
                if cfg.out_vcf:
                    v = vcf_io.VcfData(
                        samples=[f"g{gen}_{i + 1}" for i in ids_out],
                        chrom=np.full(m, str(chrom), dtype=object),
                        pos=pos,
                        ids=_legend_ids(leg),
                        ref=_legend_al0(leg),
                        alt=_legend_al1(leg),
                        qual=np.full(m, ".", dtype=object),
                        filt=np.full(m, ".", dtype=object),
                        info=np.full(m, ".", dtype=object),
                        fmt=np.full(m, "GT", dtype=object),
                        hap=np.empty((0, 0), dtype=np.uint8),  # streamed
                        meta_lines=vcf_io.default_meta_lines(),
                    )
                    if isinstance(leg, vcf_io.VcfData):
                        v.chrom = leg.chrom
                        v.qual = leg.qual
                        v.filt = leg.filt
                    vcf_w = vcf_io.VcfStreamWriter(base + ".vcf", v)
                need_full = cfg.out_plink or cfg.out_plink01 or cfg.debug
                full_blocks = [] if need_full else None
                if hap_f or vcf_w or need_full:
                    if rows is None:
                        sel = (
                            st.seg_st[ic, : st.n], st.seg_hap[ic, : st.n],
                            st.mut[ic, : st.n],
                        )
                    else:
                        sel = (
                            st.seg_st[ic, rows], st.seg_hap[ic, rows],
                            st.mut[ic, rows],
                        )
                    for lo, blk in paint_chunks(*sel, founder, pos):
                        if hap_f is not None:
                            hap_f.write(
                                hap_io.hap_bytes(blk.reshape(n_out * 2, -1))
                            )
                        if vcf_w is not None:
                            vcf_w.write_block(lo, blk[:, 0], blk[:, 1])
                        if full_blocks is not None:
                            full_blocks.append(blk)
                if hap_f is not None:
                    hap_f.close()
                if vcf_w is not None:
                    vcf_w.close()
                if need_full:
                    painted = np.concatenate(full_blocks, axis=2)
                    del full_blocks
                    if cfg.debug:
                        # AF spot-check on the last SNPs
                        # (`Simulation.cpp:1368-1387`)
                        print("The last allele frequencies")
                        for af in painted[:, :, -10:].mean(axis=(0, 1)):
                            print(f"AF = {af:g}")
                if cfg.out_plink or cfg.out_plink01:
                    r = slice(None) if rows is None else rows
                    ids = plink_io.PedIds(
                        fid=st.ped["father"][r] + 1,  # FID = father (`Simulation.cpp:1396`)
                        iid=ids_out + 1,
                        pid=st.ped["father"][r] + 1,
                        mid=st.ped["mother"][r] + 1,
                        sex=st.sex[r],
                    )
                    geno = np.moveaxis(painted, 1, 2)  # (n, m, 2)
                    plink_io.write_ped_map(
                        base,
                        geno,
                        ids,
                        chrom,
                        _legend_ids(leg),
                        pos,
                        _legend_al0(leg),
                        _legend_al1(leg),
                        letters=cfg.out_plink,
                    )
    if cfg.out_interval:
        write_interval(sim, gen)


def _legend_pos(leg):
    return leg.pos


def _legend_ids(leg):
    return leg.ids


def _legend_al0(leg):
    return leg.ref if isinstance(leg, vcf_io.VcfData) else leg.al0


def _legend_al1(leg):
    return leg.alt if isinstance(leg, vcf_io.VcfData) else leg.al1


def write_interval(sim, gen: int) -> None:
    """IBD ground-truth dump, schema per `ras_write_hap_to_interval_format`
    (`Simulation.cpp:1582-1639`): `h_ID chr hap st en hap_index gen0_indv
    root_pop`, 1-based IDs, gen0_indv = founder sample id + `.1/.2`.

    When `--out_interval` is set the engine runs meiosis with
    `merge_ibd=False` (`core/segments.py:meiose_one`), so the ledger keeps
    every crossover-split part boundary exactly like the reference's
    `recombine` (`Simulation.cpp:2903-2958`) — adjacent same-founder rows
    encode recombination-event positions and are NOT merged."""
    from geneevolve_tpu.parallel import multihost

    suffix = multihost.host_suffix()
    offsets = np.array([p.hap_offset for p in sim.pops])
    indv_ids = [p.indv_ids for p in sim.pops]
    for p in sim.pops:
        st = p.state
        rows = _host_rows(sim, st)
        row_iter = range(st.n) if rows is None else rows
        for ic, chrom in enumerate(sim.chrs):
            path = (
                f"{sim.cfg.prefix}.pop{p.index + 1}.gen{gen}.chr{chrom}"
                f"{suffix}.int"
            )
            seg_st = np.asarray(st.seg_st[ic])  # (n, 2, S)
            seg_hap = np.asarray(st.seg_hap[ic])
            chr_end = p.maps[ic].chr_end
            with open(path, "w") as f:
                f.write("h_ID chr hap st en hap_index gen0_indv root_pop\n")
                big = int(segments._big())
                for i in row_iter:
                    for h in range(2):
                        sts = seg_st[i, h]
                        valid = sts < big
                        k = int(valid.sum())
                        ens = np.append(sts[1:k], chr_end)
                        for s in range(k):
                            ghap = int(seg_hap[i, h, s])
                            rp = int(np.searchsorted(offsets, ghap, side="right") - 1)
                            local = ghap - offsets[rp]
                            indv = indv_ids[rp][local // 2]
                            f.write(
                                f"{st.ids[i] + 1} {chrom} {h} {sts[s]} {ens[s]} "
                                f"{local + 1} {indv}.{local % 2 + 1} {rp + 1}\n"
                            )

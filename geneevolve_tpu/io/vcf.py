"""Host-side VCF codec (replaces the reference's libStatGen dependency).

Reader semantics match `format_vcf::read_vcf_file`
(`/root/reference/src/format_vcf.cpp:74-360`): keep biallelic records with
recognizable ref/alt alleles, skip multi-allelic ones, do NOT drop
filter-failing records; `.` IDs become `chrom:pos`; GT parsed phased into a
`(2n, m)` uint8 matrix. Gzip transparently supported (extension `.gz`).

Writer matches `format_vcf::write_vcf_file` (`format_vcf.cpp:5-66`) and the
meta lines created at `Simulation.cpp:1715-1724`.
"""

from __future__ import annotations

import gzip
import os
import time
from dataclasses import dataclass, field
from typing import IO, List

import numpy as np

_ALLELE_CODES = set("AaCcGgTtDdIiRr")


@dataclass
class VcfData:
    """One chromosome's VCF content (sites + phased haplotype matrix)."""

    samples: List[str]
    chrom: np.ndarray  # (m,) str
    pos: np.ndarray  # (m,) int64
    ids: np.ndarray  # (m,) str
    ref: np.ndarray  # (m,) str
    alt: np.ndarray  # (m,) str
    qual: np.ndarray  # (m,) str ('.' or number, passed through)
    filt: np.ndarray  # (m,) str
    info: np.ndarray  # (m,) str
    fmt: np.ndarray  # (m,) str
    hap: np.ndarray  # (2n, m) uint8, 0=REF 1=ALT
    meta_lines: List[str] = field(default_factory=list)

    @property
    def nsnp(self) -> int:
        return len(self.pos)


def _open(path: str | os.PathLike, mode: str) -> IO:
    path = os.fspath(path)
    if path.endswith(".gz"):
        return gzip.open(path, mode + "t" if "b" not in mode else mode)
    return open(path, mode)


def read_header_samples(path: str | os.PathLike) -> List[str]:
    """Sample ids from the #CHROM header line (`format_vcf.cpp:367-389`)."""
    with _open(path, "r") as f:
        for line in f:
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                return line.rstrip("\n").split("\t")[9:]
            break
    raise ValueError(f"no #CHROM header line in [{path}]")


def read_vcf(path: str | os.PathLike) -> VcfData:
    meta: List[str] = []
    samples: List[str] = []
    chrom, pos, ids, ref, alt, qual, filt = [], [], [], [], [], [], []
    gt_rows: List[np.ndarray] = []
    with _open(path, "r") as f:
        for line in f:
            if line.startswith("##"):
                meta.append(line.rstrip("\n"))
                continue
            if line.startswith("#CHROM"):
                samples = line.rstrip("\n").split("\t")[9:]
                continue
            t = line.rstrip("\n").split("\t")
            if len(t) < 10:
                continue
            r, a = t[3], t[4]
            if "," in a:  # multi-allelic: skipped (`format_vcf.cpp:114-118`)
                continue
            if len(r) == 1 and r not in _ALLELE_CODES:
                continue
            if len(a) == 1 and a not in _ALLELE_CODES and a != "0":
                continue
            # parse GT: first colon field, phased or unphased separator
            row = np.empty(2 * len(samples), dtype=np.uint8)
            ok = True
            for i, cell in enumerate(t[9:]):
                g = cell.split(":", 1)[0]
                sep = "|" if "|" in g else "/"
                ab = g.split(sep)
                if len(ab) != 2:
                    ok = False
                    break
                row[2 * i] = 0 if ab[0] in ("0", ".") else 1
                row[2 * i + 1] = 0 if ab[1] in ("0", ".") else 1
            if not ok:
                continue
            chrom.append(t[0])
            pos.append(int(t[1]))
            ids.append(t[2] if t[2] != "." else f"{t[0]}:{t[1]}")
            ref.append(r)
            alt.append(a)
            qual.append(t[5])
            filt.append(t[6])
            gt_rows.append(row)
    if not gt_rows:
        raise ValueError(f"no usable biallelic records in [{path}]")
    hap = np.stack(gt_rows).T  # (2n, m)
    m = len(pos)
    return VcfData(
        samples=samples,
        chrom=np.array(chrom, dtype=object),
        pos=np.array(pos, dtype=np.int64),
        ids=np.array(ids, dtype=object),
        ref=np.array(ref, dtype=object),
        alt=np.array(alt, dtype=object),
        qual=np.array(qual, dtype=object),
        filt=np.array(filt, dtype=object),
        info=np.full(m, ".", dtype=object),
        fmt=np.full(m, "GT", dtype=object),
        hap=np.ascontiguousarray(hap),
        meta_lines=meta,
    )


def default_meta_lines() -> List[str]:
    """The reference's generated meta block (`Simulation.cpp:1715-1724`)."""
    return [
        "##fileformat=VCFv4.1",
        "##Phasing=phased",
        "##CreatedBy=GeneEvolve",
        "##fileDate=" + time.strftime("%Y%m%d"),
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
    ]


def write_vcf(path: str | os.PathLike, v: VcfData) -> None:
    n = len(v.samples)
    assert v.hap.shape == (2 * n, v.nsnp)
    with _open(path, "w") as f:
        for line in v.meta_lines:
            f.write(line + "\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT")
        for s in v.samples:
            f.write("\t" + str(s))
        f.write("\n")
        # precompute GT strings column-block-wise for speed
        a = v.hap[0::2, :]  # (n, m)
        b = v.hap[1::2, :]
        for j in range(v.nsnp):
            f.write(
                f"{v.chrom[j]}\t{v.pos[j]}\t{v.ids[j]}\t{v.ref[j]}\t{v.alt[j]}"
                f"\t{v.qual[j]}\t{v.filt[j]}\t{v.info[j]}\t{v.fmt[j]}"
            )
            col = np.char.add(
                np.char.add(a[:, j].astype("U1"), "|"), b[:, j].astype("U1")
            )
            f.write("\t" + "\t".join(col))
            f.write("\n")

"""Bit-packed dense engine: 8 loci per byte.

Meiosis, mutation, and chromatid selection are all bitwise, so the haplotype
planes pack losslessly into `(n, mb)` uint8 with `mb = m / 8` (locus l lives
in byte `l >> 3`, bit `l & 7`, LSB-first). Every HBM pass shrinks 8x against
the byte engine (`dense/step.py`), which is the whole game for an
HBM-bandwidth-bound simulator.

The crossover phase becomes a *byte mask*: parity-of-count is XOR of
per-crossover indicators, and the indicator of "locus >= xo" restricted to
one chromosome is, per byte column b (within the chromosome),

    mask_k[b] = 0xFF            if b >  xo >> 3
              = 0xFF << (xo&7)  if b == xo >> 3      (boundary byte)
              = 0x00            otherwise

so `phase_mask = (st ? 0xFF : 0) ^ XOR_k mask_k` and the gamete is the
arithmetic select `A ^ (phase_mask & (A ^ B))`. De novo mutations XOR
single-bit bytes in the same way. Reference semantics: `recombine` +
`ras_sim_loc_rec` + `ras_add_mutation`
(`/root/reference/src/Simulation.cpp:2903-2995, 2497-2552`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from geneevolve_tpu.dense.step import DenseConfig, _sample_gamete_plan


def pack_bits(bits: jax.Array) -> jax.Array:
    """(..., m) 0/1 uint8 -> (..., m/8) uint8, LSB-first."""
    m = bits.shape[-1]
    assert m % 8 == 0
    b = bits.reshape(*bits.shape[:-1], m // 8, 8).astype(jnp.uint8)
    w = jnp.left_shift(b, jnp.arange(8, dtype=jnp.uint8))
    # bits occupy distinct positions, so sum == bitwise or (max 0xFF)
    return w.sum(axis=-1, dtype=jnp.uint8)


def unpack_bits(packed: jax.Array, m: int) -> jax.Array:
    """(..., mb) uint8 -> (..., m) 0/1 uint8."""
    w = jnp.right_shift(
        packed[..., None], jnp.arange(8, dtype=jnp.uint8)
    ) & jnp.uint8(1)
    return w.reshape(*packed.shape[:-1], packed.shape[-1] * 8)[..., :m]


@dataclass(frozen=True)
class PackedConfig:
    n: int
    m: int  # loci; must be divisible by 8*n_chr
    n_chr: int = 1
    morgans_per_chr: float = 1.0
    xo_cap: int = 16
    mut_rate: float = 0.0
    mut_cap: int = 8
    ncv: int = 128
    selection: bool = False
    use_pallas: bool = False

    @property
    def chr_len(self) -> int:
        return self.m // self.n_chr

    @property
    def mb(self) -> int:
        return self.m // 8

    @property
    def chr_lenb(self) -> int:
        return self.chr_len // 8

    def as_dense(self) -> DenseConfig:
        return DenseConfig(
            n=self.n,
            m=self.m,
            n_chr=self.n_chr,
            morgans_per_chr=self.morgans_per_chr,
            xo_cap=self.xo_cap,
            mut_rate=self.mut_rate,
            mut_cap=self.mut_cap,
            ncv=self.ncv,
            selection=self.selection,
        )


def init_state(key: jax.Array, cfg: PackedConfig, maf_min: float = 0.05):
    """Packed founder planes + CV columns/effects."""
    from geneevolve_tpu.dense.step import init_state as dense_init

    assert cfg.m % 8 == 0 and cfg.chr_len % 8 == 0
    st = dense_init(key, cfg.as_dense(), maf_min)
    return {
        "hapA": pack_bits(st["hapA"]),
        "hapB": pack_bits(st["hapB"]),
        "cv_idx": st["cv_idx"],
        "eff": st["eff"],
    }


def phase_byte_masks(
    xo: jax.Array,  # (n, n_chr, K) crossover loci columns, pad = m
    start: jax.Array,  # (n, n_chr)
    cfg: PackedConfig,
) -> jax.Array:
    """(n, mb) uint8 phase mask per gamete: bit set -> take chromatid B."""
    n, n_chr, K = xo.shape
    clb = cfg.chr_lenb
    # byte columns local to a chromosome: (1, 1, clb)
    cols = jnp.arange(clb, dtype=jnp.int32)[None, None, :]
    chr_base = (jnp.arange(n_chr, dtype=jnp.int32) * cfg.chr_len)[None, :, None]
    mask = jnp.where(
        (start[:, :, None] & 1) == 1, jnp.uint8(0xFF), jnp.uint8(0)
    )
    mask = jnp.broadcast_to(mask, (n, n_chr, clb))
    for k in range(K):
        x = xo[:, :, k : k + 1] - chr_base  # local locus offset; pad -> huge
        xb = x >> 3
        r = (x & 7).astype(jnp.uint8)
        ge = (cols > xb).astype(jnp.uint8) * jnp.uint8(0xFF)
        partial = jnp.left_shift(jnp.uint8(0xFF), r)
        eq = jnp.where(cols == xb, partial, jnp.uint8(0))
        mask = mask ^ (ge | eq)
    return mask.reshape(n, cfg.mb)


def apply_mutations_packed(child: jax.Array, pos: jax.Array) -> jax.Array:
    """XOR single-bit flips at loci `pos` ((n, Km) int32, pad = m) into
    packed rows (n, mb), as a full-plane XOR-mask pass. Repeated draws flip
    twice and cancel (per-occurrence semantics, `Simulation.cpp:1218-1222`).

    Measured note: sparse gather/scatter formulations are *slower* on TPU —
    XLA lowers scatter near-serially (~13 ms for 32k indices on v5e) — while
    the mask construction fuses into one ~free streaming pass."""
    n, mb = child.shape
    cols = jnp.arange(mb, dtype=jnp.int32)[None, :]
    hit = jnp.zeros((n, mb), dtype=jnp.uint8)
    for k in range(pos.shape[1]):
        p = pos[:, k : k + 1]
        bit = jnp.left_shift(jnp.uint8(1), (p & 7).astype(jnp.uint8))
        hit = hit ^ jnp.where(cols == (p >> 3), bit, jnp.uint8(0))
    return child ^ hit


def meiose_packed_xla(hapA, hapB, parent, xo, start, cfg: PackedConfig):
    """(n_child, mb) packed gametes."""
    mask = phase_byte_masks(xo, start, cfg)
    a = hapA[parent]
    b = hapB[parent]
    return a ^ (mask & (a ^ b))


def mutation_positions(key, n: int, cfg: PackedConfig) -> jax.Array:
    """(n, mut_cap) int32 de novo mutation loci, pad = m (past the last byte).
    Same key schedule as the byte engine's `_apply_mutations`
    (`dense/step.py`), so both engines flip identical loci."""
    k1, k2 = jax.random.split(key)
    counts = jnp.minimum(
        jax.random.poisson(k1, cfg.mut_rate, (n,)), cfg.mut_cap
    )
    pos = jax.random.randint(k2, (n, cfg.mut_cap), 0, cfg.m)
    valid = jnp.arange(cfg.mut_cap)[None, :] < counts[:, None]
    return jnp.where(valid, pos, cfg.m).astype(jnp.int32)


def mutation_bytes(key, n: int, cfg: PackedConfig) -> jax.Array:
    """(n, mb) uint8 XOR masks with <= mut_cap set bits per row."""
    pos = mutation_positions(key, n, cfg)
    return apply_mutations_packed(jnp.zeros((n, cfg.mb), jnp.uint8), pos)


def popcount_dosage(packed: jax.Array, idx: jax.Array) -> jax.Array:
    """Extract 0/1 alleles at loci `idx` from packed rows (..., mb)."""
    byte = packed[..., idx >> 3]
    return (byte >> (idx & 7).astype(jnp.uint8)) & jnp.uint8(1)


def phenotype_additive_packed(hapA, hapB, cv_idx, eff):
    t = (
        popcount_dosage(hapA, cv_idx) + popcount_dosage(hapB, cv_idx)
    ).astype(jnp.float32)
    p = jnp.mean(t, axis=0) / 2.0
    return (t - 2.0 * p[None, :]) @ eff


def make_meiose(cfg: PackedConfig):
    """meiose(hapA, hapB, fathers, mothers, xo_p, st_p, xo_m, st_m) ->
    (childA, childB): the Pallas kernel when eligible, else the XLA
    byte-mask path (which stays the oracle)."""
    pair_fn = None
    if cfg.use_pallas:
        from geneevolve_tpu.ops import meiosis_packed_pallas as mpp

        bb = min(mpp.BLOCK_B, cfg.chr_lenb)
        while cfg.chr_lenb % bb:
            bb //= 2
        if bb >= 128 and cfg.mb % bb == 0:
            pair_fn = partial(
                mpp.meiose_planes_packed_pallas,
                n_chr=cfg.n_chr,
                chr_len=cfg.chr_len,
            )

    def meiose(hapA, hapB, fathers, mothers, xo_p, st_p, xo_m, st_m):
        if pair_fn is not None:
            return pair_fn(hapA, hapB, fathers, mothers, xo_p, st_p, xo_m, st_m)
        childA = meiose_packed_xla(hapA, hapB, fathers, xo_p, st_p, cfg)
        childB = meiose_packed_xla(hapA, hapB, mothers, xo_m, st_m, cfg)
        return childA, childB

    return meiose


def make_step(cfg: PackedConfig, xo_cdf=None):
    """Packed generation step; same law as the byte engine's
    (`dense/step.py:make_step`) — bit-identical after unpacking when driven
    with the same keys. xo_cdf: optional (m,) cumulative-Morgans array for
    map-aware crossovers."""
    meiose = make_meiose(cfg)
    dense_cfg = cfg.as_dense()

    def step(state, key):
        hapA, hapB = state["hapA"], state["hapB"]
        n_par = hapA.shape[0]
        n = cfg.n
        k_mate, k_pat, k_mat, k_mu1, k_mu2 = jax.random.split(key, 5)

        if cfg.selection:
            bv = phenotype_additive_packed(
                hapA, hapB, state["cv_idx"], state["eff"]
            )
            z = (bv - jnp.mean(bv)) / (jnp.std(bv) + 1e-9)
            km1, km2 = jax.random.split(k_mate)
            fathers = jax.random.categorical(km1, z, shape=(n,))
            mothers = jax.random.categorical(km2, z, shape=(n,))
        else:
            km1, km2 = jax.random.split(k_mate)
            fathers = jax.random.randint(km1, (n,), 0, n_par)
            mothers = jax.random.randint(km2, (n,), 0, n_par)

        xo_p, st_p = _sample_gamete_plan(k_pat, dense_cfg, n, xo_cdf)
        xo_m, st_m = _sample_gamete_plan(k_mat, dense_cfg, n, xo_cdf)
        childA, childB = meiose(
            hapA, hapB, fathers, mothers, xo_p, st_p, xo_m, st_m
        )
        if cfg.mut_rate > 0:
            childA = apply_mutations_packed(
                childA, mutation_positions(k_mu1, n, cfg)
            )
            childB = apply_mutations_packed(
                childB, mutation_positions(k_mu2, n, cfg)
            )
        return {
            "hapA": childA,
            "hapB": childB,
            "cv_idx": state["cv_idx"],
            "eff": state["eff"],
        }

    return step

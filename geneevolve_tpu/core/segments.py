"""Fixed-shape segment-ledger genome representation and vectorized meiosis.

A chromatid is a sorted, fixed-capacity boundary array: `seg_st[k]` is the
bp where segment k starts and `seg_hap[k]` the (global) founder haplotype it
copies from; padding slots hold `BIG`. Lookup of "which founder hap covers
bp q" is `seg_hap[searchsorted(seg_st, q, 'right') - 1]`.

This is the TPU-native replacement for the reference's per-individual
`vector<part>` interval lists (`/root/reference/src/Population.h:20-51`) and
its sequential `recombine` walk (`/root/reference/src/Simulation.cpp:2903-2958`):
meiosis becomes a sorted merge of three boundary arrays (the two parent
chromatids' starts + the sampled crossover positions), fully vmapped over
children.

Crossover sampling follows `ras_sim_loc_rec`
(`/root/reference/src/Simulation.cpp:2973-2995`): per-bin mass
p_k = (cM_k - cM_{k-1})/100, a hit on bin k lands at `bp[k] + U[0, width)`.
We draw a Poisson(Σp) point count and place points by inverse-CDF over bin
masses — the Poisson-process limit of the reference's per-bin Bernoulli,
identical to O(p²) per bin.

Mutations follow `ras_add_mutation` (`Simulation.cpp:2497-2552`): per-bin
Bernoulli(rate) → Poisson(Σrate) points, position uniform (inclusive) in
[bp[i-1], bp[i]], assigned to a random chromatid of the newborn, carried as
positions that flip the painted allele; inherited mutations survive iff the
child actually copied the carrying region (`Simulation.cpp:2961-2970`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# padding sentinel for positions; larger than any bp, small enough to add to
BIG = jnp.int64(2**62) if jax.config.jax_enable_x64 else jnp.int32(2**30)


def _big() -> int:
    return int(2**62) if jax.config.jax_enable_x64 else int(2**30)


_POS_DTYPE = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32


def pos_dtype():
    return jnp.int64 if jax.config.jax_enable_x64 else jnp.int32


@dataclass(frozen=True)
class ChromMaps:
    """Static per-chromosome map data. Host-side (numpy): only the stacked
    form (`StackedMaps`) goes to the device, in a handful of batched
    transfers — per-chromosome transfers would pay the per-dispatch
    overhead of tunneled single-chip setups ~140 times at 22 chromosomes
    (measured ~2 s each on axon: a 296 s load)."""

    chrom: int
    chr_start: int
    chr_end: int
    bin_width: int
    bp: np.ndarray  # (K,) bin anchors
    xo_cum: np.ndarray  # (K,) cumulative crossover bin mass
    xo_lambda: float  # total crossover mass (Morgans for this chr)
    # mutation map (empty arrays when absent)
    mut_bp: np.ndarray  # (Km,)
    mut_cum: np.ndarray  # (Km,) cumulative mutation bin mass
    mut_lambda: float

    @staticmethod
    def build(chrom, rmap, mmap=None) -> "ChromMaps":
        p = rmap.prob
        np_pos = np.int64 if jax.config.jax_enable_x64 else np.int32
        if mmap is not None:
            mrate = mmap.rate.copy()
            mrate[0] = 0.0  # loop starts at bin 1 (`Simulation.cpp:2509`)
            mut_bp = np.asarray(mmap.bp, dtype=np_pos)
            mut_cum = np.cumsum(mrate).astype(np.float32)
            mut_lambda = float(mrate.sum())
        else:
            mut_bp = np.zeros((2,), dtype=np_pos)
            mut_cum = np.zeros((2,), dtype=np.float32)
            mut_lambda = 0.0
        return ChromMaps(
            chrom=int(chrom),
            chr_start=int(rmap.bp[0]),
            chr_end=int(rmap.bp[-1]),
            bin_width=int(rmap.bin_width),
            bp=np.asarray(rmap.bp, dtype=np_pos),
            xo_cum=np.cumsum(p).astype(np.float32),
            xo_lambda=float(p.sum()),
            mut_bp=mut_bp,
            mut_cum=mut_cum,
            mut_lambda=mut_lambda,
        )


@dataclass(frozen=True)
class StackedMaps:
    """All chromosomes' maps padded to common lengths and stacked on a
    leading chr axis, so one compiled kernel serves every chromosome.
    Padding bins repeat the last anchor with zero added mass (cumulative
    arrays padded with their final value), so they are never sampled."""

    bp: jax.Array  # (nchr, K)
    xo_cum: jax.Array  # (nchr, K)
    xo_lambda: jax.Array  # (nchr,) float32
    bin_width: jax.Array  # (nchr,) float32
    mut_bp: jax.Array  # (nchr, Km)
    mut_cum: jax.Array  # (nchr, Km)
    mut_lambda: jax.Array  # (nchr,) float32
    chr_start: jax.Array  # (nchr,)

    @staticmethod
    def build(maps) -> "StackedMaps":
        def stack(arrs, dtype):
            K = max(a.shape[0] for a in arrs)
            out = np.stack(
                [
                    np.concatenate(
                        [np.asarray(a), np.full(K - a.shape[0], np.asarray(a)[-1])]
                    )
                    if a.shape[0] < K
                    else np.asarray(a)
                    for a in arrs
                ]
            )
            return jnp.asarray(out, dtype=dtype)

        return StackedMaps(
            bp=stack([m.bp for m in maps], pos_dtype()),
            xo_cum=stack([m.xo_cum for m in maps], jnp.float32),
            xo_lambda=jnp.asarray(
                [m.xo_lambda for m in maps], dtype=jnp.float32
            ),
            bin_width=jnp.asarray(
                [m.bin_width for m in maps], dtype=jnp.float32
            ),
            mut_bp=stack([m.mut_bp for m in maps], pos_dtype()),
            mut_cum=stack([m.mut_cum for m in maps], jnp.float32),
            mut_lambda=jnp.asarray(
                [m.mut_lambda for m in maps], dtype=jnp.float32
            ),
            chr_start=jnp.asarray(
                [m.chr_start for m in maps], dtype=pos_dtype()
            ),
        )


def init_gen0_ledger(
    n: int, chr_start: int, hap_offset: int, capacity: int
) -> Tuple[jax.Array, jax.Array]:
    """Founder i's chromatids point wholly at founder haps 2i / 2i+1
    (+ global offset), as in `ras_initial_human_gen0`
    (`Simulation.cpp:3024-3035`)."""
    st = jnp.full((n, 2, capacity), _big(), dtype=pos_dtype())
    st = st.at[:, :, 0].set(chr_start)
    hap = jnp.zeros((n, 2, capacity), dtype=jnp.int32)
    base = hap_offset + 2 * jnp.arange(n, dtype=jnp.int32)
    hap = hap.at[:, 0, 0].set(base)
    hap = hap.at[:, 1, 0].set(base + 1)
    return st, hap


def empty_mutations(n: int, capacity: int) -> jax.Array:
    return jnp.full((n, 2, capacity), _big(), dtype=pos_dtype())


def init_gen0_ledger_stacked(
    n: int, chr_starts: np.ndarray, hap_offset: int, capacity: int,
    hap_dtype=jnp.int32,
) -> Tuple[jax.Array, jax.Array]:
    """(nchr, n, 2, S) stacked founder ledgers (see `init_gen0_ledger`).

    `hap_dtype` may be int16 when the total founder-hap count fits
    (H <= 32k): halves the hap-index plane at biobank n."""
    nchr = len(chr_starts)
    st = np.full((nchr, n, 2, capacity), _big(), dtype=np.int64)
    st[:, :, :, 0] = np.asarray(chr_starts)[:, None, None]
    hap = np.zeros((nchr, n, 2, capacity), dtype=np.int32)
    base = hap_offset + 2 * np.arange(n, dtype=np.int32)
    hap[:, :, 0, 0] = base[None, :]
    hap[:, :, 1, 0] = base[None, :] + 1
    return (
        jnp.asarray(st, dtype=pos_dtype()),
        jnp.asarray(hap, dtype=hap_dtype),
    )


def empty_mutations_stacked(nchr: int, n: int, capacity: int) -> jax.Array:
    return jnp.full((nchr, n, 2, capacity), _big(), dtype=pos_dtype())


def sample_point_process(
    key: jax.Array,
    n: int,
    cap: int,
    cum: jax.Array,
    lam,
    bp: jax.Array,
    width,
    inclusive_bins: bool,
) -> jax.Array:
    """(n, cap) sorted positions padded with BIG.

    Each row: Poisson(lam) points; bin j chosen with prob mass[j]; position
    uniform within the bin. `inclusive_bins=False` = crossover convention
    (`bp[j] + U[0,width)`); True = mutation convention (uniform over
    [bp[j-1], bp[j]] inclusive).

    `lam` and `width` may be python scalars or traced jax scalars (so one
    compiled function serves every chromosome); lam == 0 yields all-padding
    rows (jax.random.poisson returns 0 for rate 0)."""
    if isinstance(lam, (int, float)) and lam <= 0.0:
        return jnp.full((n, cap), _big(), dtype=pos_dtype())
    k1, k2, k3 = jax.random.split(key, 3)
    counts = jnp.minimum(jax.random.poisson(k1, lam, (n,)), cap)
    u = jax.random.uniform(k2, (n, cap), dtype=jnp.float32) * cum[-1]
    bins = jnp.searchsorted(cum, u, side="right")
    bins = jnp.minimum(bins, cum.shape[0] - 1)
    v = jax.random.uniform(k3, (n, cap), dtype=jnp.float32)
    if inclusive_bins:
        lo = bp[bins - 1]
        span = (bp[bins] - lo + 1).astype(jnp.float32)
        pos = lo + jnp.floor(v * span).astype(pos_dtype())
    else:
        w = jnp.asarray(width, dtype=jnp.float32)
        pos = bp[bins] + jnp.floor(v * w).astype(pos_dtype())
    pos = jnp.where(jnp.arange(cap)[None, :] < counts[:, None], pos, _big())
    return jnp.sort(pos, axis=1)


def _active_at(xo: jax.Array, start_hap: jax.Array, q: jax.Array) -> jax.Array:
    """Which parent chromatid the gamete copies at position(s) q."""
    cnt = jnp.searchsorted(xo, q, side="right")
    return (start_hap + cnt) % 2


def meiose_one(
    par_st: jax.Array,  # (2, S) parent chromatid boundary starts
    par_hap: jax.Array,  # (2, S)
    xo: jax.Array,  # (K,) sorted crossover positions (BIG padded)
    start_hap: jax.Array,  # scalar 0/1
    capacity: int,
    merge_ibd: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One gamete: returns (child_st (S,), child_hap (S,), n_valid).

    `merge_ibd=True` coalesces adjacent boundaries that point at the same
    founder hap — IBD-equivalent and cheaper, but it erases crossover-event
    positions. `merge_ibd=False` keeps every boundary exactly like the
    reference's `recombine` part splitting (`Simulation.cpp:2903-2958`),
    which the `.int` dump (`:1582-1639`) relies on to encode recombination
    history."""
    S = par_st.shape[1]
    K = xo.shape[0]
    chr_start = par_st[0, 0]  # ledger invariant: first boundary = chr start
    cand = jnp.concatenate([chr_start[None], xo, par_st[0], par_st[1]])
    active = _active_at(xo, start_hap, cand)
    src_valid = jnp.concatenate(
        [
            jnp.ones((1,), dtype=bool),
            xo < _big(),
            (par_st[0] < _big()) & (active[1 + K : 1 + K + S] == 0),
            (par_st[1] < _big()) & (active[1 + K + S :] == 1),
        ]
    )
    idx0 = jnp.searchsorted(par_st[0], cand, side="right") - 1
    idx1 = jnp.searchsorted(par_st[1], cand, side="right") - 1
    hap = jnp.where(active == 0, par_hap[0][idx0], par_hap[1][idx1])
    st = jnp.where(src_valid, cand, _big())
    order = jnp.argsort(st, stable=True)
    st = st[order]
    hap = hap[order]
    if merge_ibd:
        # merge adjacent boundaries with identical founder hap
        dup = jnp.concatenate(
            [
                jnp.zeros((1,), dtype=bool),
                (hap[1:] == hap[:-1]) & (st[1:] < _big()),
            ]
        )
        st = jnp.where(dup, _big(), st)
        order = jnp.argsort(st, stable=True)
        st = st[order]
        hap = hap[order]
    else:
        # duplicated positions (the chr start re-listed by both parents'
        # first boundaries, or a crossover landing exactly on a parent
        # boundary) would create zero-length parts the reference never
        # emits; keep the last occurrence of each position
        last = jnp.concatenate(
            [(st[1:] != st[:-1]) | (st[1:] >= _big()), jnp.ones((1,), bool)]
        )
        st = jnp.where(last, st, _big())
        order = jnp.argsort(st, stable=True)
        st = st[order]
        hap = hap[order]
    n_valid = jnp.sum(st < _big())  # pre-truncation: lets the host detect overflow
    return st[:capacity], hap[:capacity], n_valid


# vmap over children: parent rows are pre-gathered per child
meiose = jax.vmap(meiose_one, in_axes=(0, 0, 0, 0, None, None))


def inherit_mutations_one(
    par_mut: jax.Array,  # (2, M) parent's chromatid mutation positions
    xo: jax.Array,  # (K,)
    start_hap: jax.Array,
    new_mut: jax.Array,  # (Mn,) new mutations for this gamete (BIG padded)
    capacity: int,
) -> Tuple[jax.Array, jax.Array]:
    """Keep a parent mutation iff the gamete copied its region
    (`modify_part_for_mutation_pos`, `Simulation.cpp:2961-2970`)."""
    a0 = _active_at(xo, start_hap, par_mut[0])
    a1 = _active_at(xo, start_hap, par_mut[1])
    keep0 = jnp.where((par_mut[0] < _big()) & (a0 == 0), par_mut[0], _big())
    keep1 = jnp.where((par_mut[1] < _big()) & (a1 == 1), par_mut[1], _big())
    allm = jnp.sort(jnp.concatenate([keep0, keep1, new_mut]))
    # dedupe repeated positions (the reference flips on membership, not count)
    dup = jnp.concatenate(
        [jnp.zeros((1,), dtype=bool), (allm[1:] == allm[:-1]) & (allm[1:] < _big())]
    )
    allm = jnp.sort(jnp.where(dup, _big(), allm))
    n_valid = jnp.sum(allm < _big())
    return allm[:capacity], n_valid


inherit_mutations = jax.vmap(inherit_mutations_one, in_axes=(0, 0, 0, 0, None))


def hap_at(seg_st: jax.Array, seg_hap: jax.Array, q: jax.Array) -> jax.Array:
    """Founder hap covering position(s) q. seg_* are (..., S); q is (..., Q)
    with matching leading dims (or broadcastable 1-D q)."""

    def one(st, hp, qq):
        return hp[jnp.searchsorted(st, qq, side="right") - 1]

    lead = seg_st.shape[:-1]
    if q.ndim == 1:
        q = jnp.broadcast_to(q, lead + q.shape)
    f = one
    for _ in lead:
        f = jax.vmap(f)
    return f(
        seg_st.reshape(lead + (-1,)),
        seg_hap.reshape(lead + (-1,)),
        q,
    )


def mutation_flip_mask(mut: jax.Array, q: jax.Array) -> jax.Array:
    """(..., Q) bool: is there a carried mutation exactly at q?
    Mutations only flip alleles at panel positions they coincide with
    (`Simulation.cpp:2770-2775`, `:1218-1222`).

    Mutation lists are sorted (BIG-padded), so membership is a searchsorted
    probe — O(Q log M) per chromatid and O(n·Q) memory, not the O(n·M·Q)
    equality broadcast that OOMs when painting biobank-scale loci chunks."""

    def one(mrow, qrow):
        idx = jnp.searchsorted(mrow, qrow)
        idx = jnp.minimum(idx, mrow.shape[0] - 1)
        return (mrow[idx] == qrow) & (qrow < _big())

    lead = mut.shape[:-1]
    f = one
    for _ in lead:
        f = jax.vmap(f)
    return f(mut, jnp.broadcast_to(q, lead + q.shape[-1:]))

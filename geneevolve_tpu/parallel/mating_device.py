"""Device-side mate pairing: the reference's `assort_mate` as one jittable
XLA program (SURVEY §2.4 "mate-pairing permute / distributed sort" row).

Semantics mirror `core/mating.assort_mate` (itself mapping
`/root/reference/src/Simulation.cpp:2167-2360`): selection gate, random trim
of the larger sex, sort by mating value, MVN(0, [[1,r],[r,1]]) template with
rank matching, 8-way grandparent inbreeding veto, and multinomial offspring
assignment (the reference's Poisson household law conditioned on the realized
total). The host-numpy implementation stays the oracle; this path exists so
pairing can run *on the mesh*: under `jit` with `mv`/`sex` sharded over an
'ind' axis, the argsorts lower to XLA's distributed sort and the row
shuffles become collectives — no host round-trip at biobank scale
(n=1M mating values = 4 MB, but the parent-row *gathers* they index stay
device-side either way).

Static-shape discipline: every data-dependent count (marriageable, per-sex,
couples, inbred) lives in masks and traced scalars; array shapes are (n,) or
(pop_size,) throughout, so one compilation serves every generation of a
constant-size schedule.

Both offspring laws are implemented: "p" (multinomial over eligible
couples; the engine draws the realized Poisson total and slices) and "f"
(`Simulation.cpp:2340-2355`: floor(pop_size/eligible) children per couple
plus a randomly-permuted remainder, realized as traced integer arithmetic
over packed eligible ranks). The MM double-spouse option
(`Simulation.cpp:2199-2213`) doubles the slot space: slot n+i is
individual i's optional second marriage, active with probability MM after
the selection gate.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = jnp.float32(3.4e38)


class DevicePlan(NamedTuple):
    father_pos: jax.Array  # (n,) int32; slots >= n_couples are padding (-1)
    mother_pos: jax.Array  # (n,)
    valid: jax.Array  # (n,) bool — slot is a real couple
    inbred: jax.Array  # (n,) bool
    child_couple: jax.Array  # (pop_size,) int32 couple slot per child
    n_couples: jax.Array  # () int32


def _rank(x: jax.Array) -> jax.Array:
    """rank[i] = position of x[i] in ascending order (double argsort)."""
    return jnp.argsort(jnp.argsort(x, stable=True), stable=True)


def _sorted_members(keep: jax.Array, key_vals: jax.Array) -> jax.Array:
    """Positions of kept individuals sorted ascending by key_vals, packed to
    the front; dropped individuals sort to the back (key forced to +BIG)."""
    masked = jnp.where(keep, key_vals, BIG)
    return jnp.argsort(masked, stable=True).astype(jnp.int32)


def assort_mate_device(
    key: jax.Array,
    mating_value: jax.Array,  # (n,) float
    selection_prob: jax.Array,  # (n,) float
    sex: jax.Array,  # (n,) int (1=male, 2=female)
    pedigree: dict,  # father, ff, fm, mf, mm -> (n,) int id arrays
    mat_cor: float,
    avoid_inbreeding: bool,
    pop_size: int,
    mm_percent: float = 0.0,
    offspring_dist: str = "p",
    n_children: int | None = None,
) -> DevicePlan:
    """Jittable assortative-mating plan. pop_size (the schedule's nominal
    size) and n_children (emitted child slots; the engine slices the
    realized Poisson total off the front) are static, everything else is
    traced. father_pos/mother_pos hold ORIGINAL individual positions even
    under MM duplication."""
    n = mating_value.shape[0]
    if n_children is None:
        n_children = pop_size
    k_gate, k_trim_m, k_trim_f, k_mvn, k_child, k_mm, k_extra = (
        jax.random.split(key, 7)
    )

    gate = jax.random.uniform(k_gate, (n,)) < selection_prob
    if mm_percent > 0:
        # double-spouse (`Simulation.cpp:2199-2213`): slot n+i is person
        # i's second marriage, active with prob MM after the gate
        dup = jax.random.uniform(k_mm, (n,)) < mm_percent
        pos = jnp.concatenate(
            [jnp.arange(n), jnp.arange(n)]
        ).astype(jnp.int32)
        gate = jnp.concatenate([gate, gate & dup])
        sex = jnp.concatenate([sex, sex])
        mating_value = jnp.concatenate([mating_value, mating_value])
    else:
        pos = jnp.arange(n, dtype=jnp.int32)
    N = pos.shape[0]
    is_m = gate & (sex == 1)
    is_f = gate & (sex == 2)
    cnt_m = jnp.sum(is_m)
    cnt_f = jnp.sum(is_f)
    nc = jnp.minimum(cnt_m, cnt_f)  # traced couple count

    # random trim of the larger sex (`Simulation.cpp:2233-2246`): rank a
    # uniform priority within each sex, keep the first nc
    pri_m = jnp.where(is_m, jax.random.uniform(k_trim_m, (N,)), BIG)
    pri_f = jnp.where(is_f, jax.random.uniform(k_trim_f, (N,)), BIG)
    keep_m = is_m & (_rank(pri_m) < nc)
    keep_f = is_f & (_rank(pri_f) < nc)

    # sort each sex by mating value; kept members pack to the front
    msorted = _sorted_members(keep_m, mating_value)
    fsorted = _sorted_members(keep_f, mating_value)

    # MVN(0, [[1,r],[r,1]]) template, ranks matched within the first nc slots
    z = jax.random.normal(k_mvn, (2, N))
    t1 = z[0]
    t2 = mat_cor * z[0] + jnp.sqrt(1.0 - mat_cor * mat_cor) * z[1]
    slot = jnp.arange(N)
    in_nc = slot < nc
    r1 = _rank(jnp.where(in_nc, t1, BIG))
    r2 = _rank(jnp.where(in_nc, t2, BIG))
    father = jnp.where(in_nc, pos[msorted[r1]], -1)
    mother = jnp.where(in_nc, pos[fsorted[r2]], -1)

    if avoid_inbreeding:
        # sibs share a father; cousins share any grandparent
        # (`Simulation.cpp:2304-2320`)
        fa = jnp.clip(father, 0, n - 1)
        mo = jnp.clip(mother, 0, n - 1)
        inbred = pedigree["father"][fa] == pedigree["father"][mo]
        for a in ("ff", "mf"):
            for b in ("ff", "mf"):
                inbred |= pedigree[a][fa] == pedigree[b][mo]
        for a in ("fm", "mm"):
            for b in ("fm", "mm"):
                inbred |= pedigree[a][fa] == pedigree[b][mo]
        inbred &= in_nc
    else:
        inbred = jnp.zeros(N, dtype=bool)

    eligible = in_nc & ~inbred
    if offspring_dist in ("f", "F"):
        # fixed law (`Simulation.cpp:2340-2355`): floor(pop_size/eligible)
        # per couple + a randomly-permuted remainder of one-extras
        ne = jnp.maximum(jnp.sum(eligible.astype(jnp.int32)), 1)
        nf = pop_size // ne
        # eligible couple slots packed to the front in stored order
        elig_pos = jnp.argsort(~eligible, stable=True).astype(jnp.int32)
        # a uniform random order of the eligible slots for the remainder
        extra_pri = jnp.where(
            eligible, jax.random.uniform(k_extra, (N,)), BIG
        )
        extra_sorted = jnp.argsort(extra_pri, stable=True).astype(jnp.int32)
        k = jnp.arange(n_children)
        base = jnp.minimum(k // jnp.maximum(nf, 1), N - 1)
        rem = jnp.clip(k - nf * ne, 0, N - 1)
        child_couple = jnp.where(
            k < nf * ne, elig_pos[base], extra_sorted[rem]
        ).astype(jnp.int32)
    else:
        # "p": multinomial offspring assignment over eligible couples
        logits = jnp.where(eligible, 0.0, -jnp.inf)
        child_couple = jax.random.categorical(
            k_child, logits, shape=(n_children,)
        ).astype(jnp.int32)
    return DevicePlan(
        father_pos=father.astype(jnp.int32),
        mother_pos=mother.astype(jnp.int32),
        valid=in_nc,
        inbred=inbred,
        child_couple=child_couple,
        n_couples=nc.astype(jnp.int32),
    )


def random_mate_device(
    key: jax.Array,
    selection_prob: jax.Array,
    sex: jax.Array,
    pop_size: int,
) -> DevicePlan:
    """Jittable `random_mate` (`Simulation.cpp:2090-2157`): pop_size couples
    drawn uniformly with replacement from the marriageable of each sex."""
    n = sex.shape[0]
    k_gate, k_f, k_m = jax.random.split(key, 3)
    gate = jax.random.uniform(k_gate, (n,)) < selection_prob
    lm = jnp.where(gate & (sex == 1), 0.0, -jnp.inf)
    lf = jnp.where(gate & (sex == 2), 0.0, -jnp.inf)
    father = jax.random.categorical(k_f, lm, shape=(pop_size,)).astype(
        jnp.int32
    )
    mother = jax.random.categorical(k_m, lf, shape=(pop_size,)).astype(
        jnp.int32
    )
    return DevicePlan(
        father_pos=father,
        mother_pos=mother,
        valid=jnp.ones(pop_size, dtype=bool),
        inbred=jnp.zeros(pop_size, dtype=bool),
        child_couple=jnp.arange(pop_size, dtype=jnp.int32),
        n_couples=jnp.int32(pop_size),
    )

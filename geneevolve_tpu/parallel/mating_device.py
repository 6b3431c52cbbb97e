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

Only the Poisson/multinomial offspring law ("p", the reference's default and
what every bundled Example uses) is implemented; the fixed law ("f") needs a
data-dependent repeat and stays on the host path.
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
) -> DevicePlan:
    """Jittable assortative-mating plan. pop_size is static (the schedule's
    per-generation size), everything else is traced."""
    n = mating_value.shape[0]
    k_gate, k_trim_m, k_trim_f, k_mvn, k_child = jax.random.split(key, 5)

    gate = jax.random.uniform(k_gate, (n,)) < selection_prob
    is_m = gate & (sex == 1)
    is_f = gate & (sex == 2)
    cnt_m = jnp.sum(is_m)
    cnt_f = jnp.sum(is_f)
    nc = jnp.minimum(cnt_m, cnt_f)  # traced couple count

    # random trim of the larger sex (`Simulation.cpp:2233-2246`): rank a
    # uniform priority within each sex, keep the first nc
    pri_m = jnp.where(is_m, jax.random.uniform(k_trim_m, (n,)), BIG)
    pri_f = jnp.where(is_f, jax.random.uniform(k_trim_f, (n,)), BIG)
    keep_m = is_m & (_rank(pri_m) < nc)
    keep_f = is_f & (_rank(pri_f) < nc)

    # sort each sex by mating value; kept members pack to the front
    msorted = _sorted_members(keep_m, mating_value)
    fsorted = _sorted_members(keep_f, mating_value)

    # MVN(0, [[1,r],[r,1]]) template, ranks matched within the first nc slots
    z = jax.random.normal(k_mvn, (2, n))
    t1 = z[0]
    t2 = mat_cor * z[0] + jnp.sqrt(1.0 - mat_cor * mat_cor) * z[1]
    slot = jnp.arange(n)
    in_nc = slot < nc
    r1 = _rank(jnp.where(in_nc, t1, BIG))
    r2 = _rank(jnp.where(in_nc, t2, BIG))
    father = jnp.where(in_nc, msorted[r1], -1)
    mother = jnp.where(in_nc, fsorted[r2], -1)

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
        inbred = jnp.zeros(n, dtype=bool)

    eligible = in_nc & ~inbred
    # multinomial offspring assignment over eligible couples
    logits = jnp.where(eligible, 0.0, -jnp.inf)
    child_couple = jax.random.categorical(
        k_child, logits, shape=(pop_size,)
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

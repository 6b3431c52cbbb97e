"""Deterministic key schedule.

The reference chains every stage off one global `default_random_engine`
(`/root/reference/src/Simulation.cpp:17-21`), which makes results depend on
call order. We instead derive every stage key as
`fold_in(fold_in(fold_in(root, generation), stage), population)` so results
are reproducible under any sharding or execution order.
"""

from __future__ import annotations

import enum

import jax


class Stage(enum.IntEnum):
    INIT_SEX = 0
    INIT_COMMON = 1
    MATE = 2
    CROSSOVER = 3
    START_HAP = 4
    MUTATION = 5
    SEX = 6
    COMMON = 7
    E_NOISE = 8
    F_GEN0 = 9
    MIGRATION = 10
    DENSE_STEP = 11


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def stage_key(root: jax.Array, gen: int, stage: Stage, pop: int = 0) -> jax.Array:
    k = jax.random.fold_in(root, gen)
    k = jax.random.fold_in(k, int(stage))
    return jax.random.fold_in(k, pop)


def np_seed(seed: int, gen: int, stage: Stage, pop: int = 0) -> int:
    """A stable 63-bit seed for host-side numpy RNG stages."""
    x = (seed * 1000003 + gen) & 0x7FFFFFFFFFFFFFFF
    x = (x * 1000033 + int(stage)) & 0x7FFFFFFFFFFFFFFF
    x = (x * 1000211 + pop) & 0x7FFFFFFFFFFFFFFF
    return x

"""Mesh construction and the sharded dense generation step."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geneevolve_tpu.dense.step import DenseConfig, make_step


def _factor(n: int) -> tuple:
    """Split n devices into (ind, loci) favoring the individuals axis."""
    best = (n, 1)
    for loci in (1, 2, 4, 8):
        if n % loci == 0 and loci * loci <= n:
            best = (n // loci, loci)
    return best


def make_mesh(
    devices: Optional[Sequence] = None, shape: Optional[tuple] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    shape = shape or _factor(n)
    assert shape[0] * shape[1] == n, (shape, n)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, ("ind", "loci"))


def state_specs() -> dict:
    return {
        "hapA": P("ind", "loci"),
        "hapB": P("ind", "loci"),
        "cv_idx": P(),
        "eff": P(),
    }


def shard_state(state: dict, mesh: Mesh) -> dict:
    specs = state_specs()
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in state.items()
    }


def make_sharded_step(cfg, mesh: Mesh):
    """jit'd generation step with (ind, loci) shardings on the haplotype
    state. Parent-row gathers ride the 'ind' axis; the allele-frequency
    reduction in the phenotype path is a psum over 'ind'; crossover plans are
    replicated along 'loci'. Accepts a DenseConfig or PackedConfig (the
    packed engine shards identically: the loci axis just carries bytes)."""
    from geneevolve_tpu.dense.packed import PackedConfig
    from geneevolve_tpu.dense.packed import make_step as make_packed_step

    step = (
        make_packed_step(cfg)
        if isinstance(cfg, PackedConfig)
        else make_step(cfg)
    )
    specs = state_specs()
    in_shardings = (
        {k: NamedSharding(mesh, v) for k, v in specs.items()},
        NamedSharding(mesh, P()),
    )
    out_shardings = {k: NamedSharding(mesh, v) for k, v in specs.items()}
    return jax.jit(step, in_shardings=in_shardings, out_shardings=out_shardings)

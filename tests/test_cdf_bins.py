"""The Pallas VMEM-CDF bins kernel must be bit-identical to
jnp.searchsorted(cum, u, "right") — including flat runs, block edges, and
u at/beyond the total mass (interpret mode; the TPU lowering is oracled on
hardware by tools/sexp.py and the engine A/B)."""

import jax.numpy as jnp
import numpy as np
import pytest

from geneevolve_tpu.ops import cdf_bins_pallas as cbp


def _check(cum, u):
    L, c2 = cbp.build_tables(cum)
    got = np.asarray(
        cbp.searchsorted_right(
            jnp.asarray(u, jnp.float32), jnp.asarray(L), jnp.asarray(c2),
            interpret=True,
        )
    )
    K = len(cum)
    want = np.minimum(
        np.searchsorted(np.asarray(cum, np.float32), np.asarray(u, np.float32), side="right"),
        K - 1,
    )
    got = np.minimum(got, K - 1)  # engine clamp
    np.testing.assert_array_equal(got, want)


def test_random_cdfs_match_searchsorted():
    rng = np.random.default_rng(0)
    for K in (7, 128, 1000, 4096, 5120):
        mass = rng.exponential(size=K).astype(np.float32)
        mass[rng.random(K) < 0.3] = 0.0  # flat runs
        cum = np.cumsum(mass, dtype=np.float32)
        u = rng.uniform(0, float(cum[-1]), size=4096).astype(np.float32)
        # include exact boundary hits and extremes
        u = np.concatenate([u, cum[:64], [0.0, -1.0, float(cum[-1]), float(cum[-1]) * 1.5]])
        _check(cum, u)


def test_padded_tail_cdf():
    # engine CDFs are padded to a common K with their final value; padded
    # entries count at u == total exactly like searchsorted-right
    cum = np.concatenate([
        np.cumsum(np.ones(100, np.float32)),
        np.full(28, 100.0, np.float32),
    ])
    u = np.array([0.0, 0.5, 1.0, 99.0, 99.5, 100.0, 101.0], np.float32)
    _check(cum, u)


def test_single_bin():
    cum = np.array([2.5], np.float32)
    _check(cum, np.array([0.0, 2.4, 2.5, 3.0], np.float32))


def test_shapes_and_padding_roundtrip():
    rng = np.random.default_rng(1)
    cum = np.cumsum(rng.exponential(size=300).astype(np.float32))
    L, c2 = cbp.build_tables(cum)
    u = rng.uniform(0, cum[-1], size=(37, 11)).astype(np.float32)
    got = np.asarray(
        cbp.searchsorted_right(
            jnp.asarray(u), jnp.asarray(L), jnp.asarray(c2), interpret=True
        )
    )
    assert got.shape == (37, 11)
    want = np.searchsorted(cum, u, side="right")
    np.testing.assert_array_equal(got, want)


def test_sampler_bins_path_bit_identical(monkeypatch):
    """sample_point_process with the Pallas bins tables produces exactly
    the same positions as the CDF-grid path (same key, same law)."""
    import jax

    from geneevolve_tpu.core import segments

    rng = np.random.default_rng(3)
    K = 700
    mass = rng.exponential(size=K).astype(np.float32)
    mass[rng.random(K) < 0.2] = 0.0
    cum = jnp.asarray(np.cumsum(mass, dtype=np.float32))
    bp = jnp.asarray(np.arange(K, dtype=np.int32) * 100)
    grid, w = segments.build_cdf_grid(np.asarray(cum))
    L, c2 = cbp.build_tables(np.asarray(cum))
    key = jax.random.key(42)
    kw = dict(width=100.0, inclusive_bins=False)
    ref = segments.sample_point_process(
        key, 500, 9, cum, 2.0, bp, grid=jnp.asarray(grid), grid_w=w, **kw
    )
    monkeypatch.setattr(segments, "_PALLAS_BINS", True)
    got = segments.sample_point_process(
        key, 500, 9, cum, 2.0, bp,
        bin_L=jnp.asarray(L), bin_c2=jnp.asarray(c2), **kw
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

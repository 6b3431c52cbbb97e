"""The Pallas merge-count kernel must equal segments.count_merge_valid
bit-for-bit (interpret mode; hardware oracled by tools/sexp_pallas.py and
the engine A/B)."""

import jax
import jax.numpy as jnp
import numpy as np

from geneevolve_tpu.core import segments
from geneevolve_tpu.ops import merge_count_pallas as mcp


def _mk_state(rng, n, S, live):
    big = segments._big()
    st = np.full((n, 2, S), big, dtype=np.int32)
    pos = np.sort(rng.integers(0, 30000, size=(n, 2, live)), axis=-1)
    st[..., :live] = pos
    st[..., 0] = 0
    return st


def test_matches_xla_count():
    rng = np.random.default_rng(0)
    big = segments._big()
    for n, S, K, live in ((500, 49, 23, 14), (257, 8, 3, 5), (1024, 16, 9, 16)):
        st = _mk_state(rng, n, S, live)
        xo = np.full((n, K), big, dtype=np.int32)
        cnt = rng.integers(0, K + 1, size=n)
        for i in range(n):
            xo[i, : cnt[i]] = np.sort(rng.integers(0, 30000, size=cnt[i]))
        sh = rng.integers(0, 2, size=n).astype(np.int32)
        ref = np.asarray(
            segments.count_merge_valid(
                jnp.asarray(st), jnp.asarray(xo), jnp.asarray(sh)
            )
        )
        got = np.asarray(
            mcp.count_merge_valid_pallas(
                jnp.asarray(st.reshape(n, 2 * S)), jnp.asarray(xo),
                jnp.asarray(sh), interpret=True,
            )
        )
        np.testing.assert_array_equal(got, ref)


def test_xo_at_boundary_positions():
    """Crossovers exactly AT boundary positions exercise the <= parity."""
    rng = np.random.default_rng(1)
    n, S, K = 300, 12, 5
    st = _mk_state(rng, n, S, 8)
    big = segments._big()
    xo = np.full((n, K), big, dtype=np.int32)
    # place crossovers exactly at some boundary positions
    xo[:, 0] = st[:, 0, 2]
    xo[:, 1] = np.maximum(st[:, 1, 4], xo[:, 0])
    xo.sort(axis=1)
    sh = rng.integers(0, 2, size=n).astype(np.int32)
    ref = np.asarray(
        segments.count_merge_valid(
            jnp.asarray(st), jnp.asarray(xo), jnp.asarray(sh)
        )
    )
    got = np.asarray(
        mcp.count_merge_valid_pallas(
            jnp.asarray(st.reshape(n, 2 * S)), jnp.asarray(xo),
            jnp.asarray(sh), interpret=True
        )
    )
    np.testing.assert_array_equal(got, ref)

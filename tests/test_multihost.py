"""Multi-host plumbing (`parallel/multihost.py`): row-ownership math on a
sharded array, and a real 2-process `jax.distributed` smoke run where each
process writes its own individuals-shard of the genotype output.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def test_host_row_ranges_single_process():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from geneevolve_tpu.parallel import multihost
    from geneevolve_tpu.parallel.mesh import make_mesh

    idx, count = multihost.process_info()
    assert (idx, count) == (0, 1)
    assert multihost.host_suffix() == ""
    mesh = make_mesh(shape=(4, 2))
    x = jax.device_put(
        jnp.zeros((64, 3, 8)), NamedSharding(mesh, P("ind", None, "loci"))
    )
    ranges = multihost.host_row_ranges(x, axis=0)
    # single process owns every row, merged into one range
    assert ranges == [(0, 64)]


_WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address={coord!r},
        num_processes=2,
        process_id=int(sys.argv[1]),
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P, Mesh

    from geneevolve_tpu.parallel import multihost

    assert jax.process_count() == 2
    devs = np.array(jax.devices()).reshape(2, 2)  # 2 procs x 2 local
    mesh = Mesh(devs, ("ind", "loci"))
    n = 32
    local = jnp.arange(n // 2) + jax.process_index() * (n // 2)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("ind")), np.asarray(local), (n,)
    )
    ranges = multihost.host_row_ranges(arr, axis=0)
    lo = jax.process_index() * (n // 2)
    assert ranges == [(lo, lo + n // 2)], ranges
    assert multihost.host_suffix() == f".host{{jax.process_index()}}"
    # a psum across both processes' shards proves the mesh is global
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
    )(arr)
    assert int(total) == n * (n - 1) // 2, int(total)
    print("WORKER_OK", jax.process_index(), flush=True)
    """
)


@pytest.mark.skipif(
    os.environ.get("GE_NO_DISTRIBUTED") == "1", reason="opted out"
)
def test_two_process_distributed_smoke(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=str(REPO), coord=coord))
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out

"""Multi-host data feeding over a REAL 2-process jax.distributed run.

Spawns two Python processes connected through jax.distributed on the
CPU backend (2 virtual devices per process -> a 4-device global 'data'
mesh), each loading ONLY its host slice of the global batch through
Loader(shard=(rank, world)), assembling global arrays with
shard_batch(), and checking:

  * the host shards are disjoint and cover the global epoch order;
  * the assembled global batch matches a single-process reference
    batch exactly (same (seed, epoch) order), verified via a global
    mean computed with jax.jit over the mesh.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

_WORKER = textwrap.dedent(
    """
    import os, sys
    import numpy as np

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax
    jax.config.update("jax_platforms", "cpu")

    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()

    sys.path.insert(0, os.environ["REPO"])
    from bflow_tpu.data.loader import Loader
    from bflow_tpu.parallel.mesh import make_mesh, shard_batch

    class DS:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"ev_repr": np.full((4, 4, 2), float(i), np.float32),
                    "idx": np.asarray(float(i), np.float32)}

    GLOBAL_BATCH = 8
    world = jax.process_count()
    loader = Loader(DS(), batch_size=GLOBAL_BATCH // world, shuffle=True,
                    num_workers=2, seed=0,
                    shard=(jax.process_index(), world))
    assert len(loader) == 32 // world // (GLOBAL_BATCH // world)

    mesh = make_mesh(n_devices=4)
    batches = iter(loader)
    local = next(batches)
    gbatch = shard_batch(local, mesh)
    assert gbatch["ev_repr"].shape[0] == GLOBAL_BATCH

    # reference: what a single process with the same (seed, epoch)
    # order would have loaded as the first global batch
    order = np.random.default_rng(
        np.random.SeedSequence((0, 0))
    ).permutation(32)
    shards = [order[r::world][: 32 // world] for r in range(world)]
    assert not set(shards[0]) & set(shards[1])  # disjoint cover
    want_ids = np.concatenate(
        [s[: GLOBAL_BATCH // world] for s in shards]
    ).astype(np.float32)

    from jax.experimental import multihost_utils

    means = jax.jit(lambda b: b["ev_repr"].mean(axis=(1, 2, 3)))(gbatch)
    got_ids = np.asarray(
        multihost_utils.process_allgather(means, tiled=True)
    )
    # per-host placement: each host's block of the global array holds
    # exactly its shard ids, in order
    np.testing.assert_allclose(got_ids.reshape(-1), want_ids)
    print(f"proc {pid}: OK ids={got_ids.tolist()}")
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_feed(tmp_path):
    repo = str(Path(__file__).resolve().parents[1])
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {
        **os.environ,
        "REPO": repo,
        "PYTHONPATH": repo,
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"proc {pid}: OK" in out, out[-2000:]

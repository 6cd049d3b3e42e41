"""Real 2-process jax.distributed rehearsal on the CPU backend.

The TPU-world analogue of the reference's gloo-on-CPU DDP fallback
(train_video_segment_ddp.py:64-67): two spawned processes initialize a
coordinator, then exercise the parallel.dist surface end to end —
all_gather_object (per-rank metric dicts, ddp.py:278), broadcast_object
(resume metadata, ddp.py:204), barrier, and a psum over the global mesh.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")

from video_chapter_generation_tpu.parallel import dist

rank = int(sys.argv[1])
dist.initialize(coordinator_address={addr!r}, num_processes=2,
                process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert dist.process_index() == rank
assert dist.is_primary() == (rank == 0)

# host-object gather: per-rank metric dicts of DIFFERENT pickled sizes
obj = {{"rank": rank, "m_ap": 0.25 + rank, "tag": "x" * (10 + 100 * rank)}}
gathered = dist.all_gather_object(obj)
assert [g["rank"] for g in gathered] == [0, 1], gathered
assert gathered[1]["m_ap"] == 1.25
assert len(gathered[rank]["tag"]) == 10 + 100 * rank

# broadcast from rank 0 (non-root passes a dummy)
resume = dist.broadcast_object(
    {{"epoch": 7, "best": 0.413}} if rank == 0 else None)
assert resume == {{"epoch": 7, "best": 0.413}}, resume

dist.barrier("test")

# device-level collective over the global mesh (DDP gradient allreduce
# analogue): psum of the per-process rank over 2 global devices
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

devices = np.asarray(jax.devices()).reshape(2)
mesh = Mesh(devices, ("data",))
local = jnp.asarray([float(rank + 1)])
arr = multihost_utils.host_local_array_to_global_array(local, mesh,
                                                       P("data"))

from jax.experimental.shard_map import shard_map
f = jax.jit(shard_map(lambda x: jax.lax.psum(x, "data"), mesh=mesh,
                      in_specs=P("data"), out_specs=P()))
out = f(arr)  # replicated: every process reads its local shard
val = float(np.asarray(out.addressable_data(0))[0])
assert val == 3.0, val  # 1 + 2

print(f"rank {{rank}} OK")
"""


def test_two_process_dist_rehearsal(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"
    script = _WORKER.format(repo=repo, addr=addr)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for rank in (0, 1)
    ]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"rank {rank} OK" in out

"""End-to-end exercise of the multi-host init path: two real localhost CPU
processes run ``jax.distributed.initialize`` through
``equiformer_tpu.parallel.dist.init_distributed`` (COORDINATOR_ADDRESS branch,
the analog of reference utils.py:46-69 / oc20/trainer/dist_setup.py:90-96
env:// init) and a cross-process pmean over a 2-device global mesh."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.environ['EQ_REPO'])
from equiformer_tpu.parallel.dist import init_distributed, is_master, world_size

ok = init_distributed()
assert ok, 'init_distributed returned False'
assert jax.process_count() == 2, jax.process_count()
assert world_size() == 2
assert is_master() == (jax.process_index() == 0)

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

devs = np.array(jax.devices())
assert len(devs) == 2, devs  # one local CPU device per process, global view
mesh = Mesh(devs, ('dp',))
f = jax.jit(shard_map(lambda x: jax.lax.pmean(x, 'dp'), mesh,
                      in_specs=P('dp'), out_specs=P()))
sh = NamedSharding(mesh, P('dp'))
x = jax.make_array_from_callback(
    (2, 1), sh, lambda idx: np.full((1, 1), jax.process_index() + 1.0, np.float32))
val = float(np.asarray(f(x).addressable_data(0))[0, 0])
assert abs(val - 1.5) < 1e-6, val  # mean of ranks' (1.0, 2.0)
print('MULTIHOST_OK', jax.process_index(), val, flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_init_and_pmean(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
            EQ_REPO=repo,
        )
        # the conftest's 8-virtual-device XLA_FLAGS must not leak in: each
        # process should contribute exactly one device to the global mesh
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid} 1.5" in out, out

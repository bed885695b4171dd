"""REAL multi-process (2-controller) runtime test.

The other distributed tests use one process with 8 virtual devices, which
cannot catch multi-controller contract violations (host-divergent values
passed as replicated inputs, device_put of host-divergent sharded values,
device_get of non-addressable outputs — each of these was a real bug this
test exposed). Here two separate Python processes each own 4 virtual CPU
devices, form one jax.distributed process group, and run the sharded
actor loop over the global 8-device mesh.
"""

import subprocess
import sys

_CHILD = """
import os, sys
sys.path.insert(0, {repo!r})
pid = int(sys.argv[1])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize("localhost:{port}", num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

from tetris_mcts_tpu.runtime.distributed import (
    DistributedSelfPlay, local_batch,
)
from tetris_mcts_tpu.runtime.selfplay import SelfPlayConfig

assert local_batch(8) == 4
d = DistributedSelfPlay(
    SelfPlayConfig(batch=8, sims=2, max_nodes=256, max_obs=256,
                   table_size=512, max_depth=16, benchmark=True, seed=5),
    log=lambda s: None,
)
d.run(2)
assert d.driver.moves == 2
print("CHILD_OK", pid, flush=True)
"""


def test_two_process_actor_loop(tmp_path):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _CHILD.format(repo=repo, port=9377)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"CHILD_OK {pid}" in out

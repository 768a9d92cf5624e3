"""Live multi-host path: a real 2-process `jax.distributed.initialize`
rendezvous running one sharded training program.

The reference at least *runs* its multi-process path (torchrun,
`light_training/launch.py:89-108`); this test proves ours the JAX way: two
OS processes, each with 4 virtual CPU devices, join a coordinator and train
on one 8-device `data` mesh. The per-step losses must match an in-process
single-controller run of the identical program bit-for-bit — gradient
all-reduce over the cross-process mesh is exactly equivalent to the
single-process collective.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

CHILD = os.path.join(os.path.dirname(__file__), "multihost_child.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_rendezvous_matches_single_process():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        # CPU-only children: the repo alone. Inheriting the session's
        # PYTHONPATH would pull in the axon TPU plugin, whose coordination
        # hooks break the pure-CPU gloo rendezvous (process_count()
        # stays 1).
        PYTHONPATH=REPO,
    )
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, coordinator, "2", str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"child failed:\n{err[-3000:]}"
        outs.append(out)

    # process 0 printed the losses
    line = [l for l in outs[0].splitlines() if l.startswith("{")][-1]
    multi = json.loads(line)["losses"]
    assert len(multi) == 3

    # oracle: the same program on this process's own 8-device mesh
    from tests.multihost_child import run_steps
    from waveformer_tpu.parallel.mesh import MeshSpec, make_mesh

    single = run_steps(make_mesh(MeshSpec(data=8)))
    np.testing.assert_allclose(multi, single, rtol=0, atol=1e-6)
    # and the loop actually trained
    assert single[-1] < single[0]

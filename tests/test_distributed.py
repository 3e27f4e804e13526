"""Multi-process jax.distributed validation (VERDICT round-1 item 3).

The other sharding tests run on 8 virtual devices in ONE process; this spawns
two coordinated processes (4 virtual CPU devices each) so the compiled programs
actually exercise the multi-controller runtime: cross-process mesh construction,
replicated host-local inputs, and collectives that cross a process boundary —
the exact pattern real multi-host TPU jobs use (SURVEY.md §4, §2.4).
"""
import os
import pathlib
import re
import socket
import subprocess
import sys

import numpy as np

WORKER = pathlib.Path(__file__).with_name("_distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pathwise_train_step_and_hmc():
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",  # keep the axon TPU hook out of workers
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_ENABLE_X64="1",
            COORD=f"127.0.0.1:{port}",
            WORLD="2",
            RANK=str(rank),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(WORKER)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank {procs.index(p)} failed:\n{out}"
        assert "WORKER_OK" in out, out

    # both controllers must agree bit-for-bit on the replicated results
    losses = [float(re.search(r"LOSS (\S+)", o).group(1)) for o in outs]
    assert np.isfinite(losses[0]) and losses[0] == losses[1], losses
    hmc = [
        [float(g) for g in re.search(r"HMC (\S+) (\S+) (\S+)", o).groups()]
        for o in outs
    ]
    assert hmc[0] == hmc[1], hmc
    # statistical sanity of the cross-process HMC: posterior mean near target
    np.testing.assert_allclose(hmc[0][:2], [0.5, -1.0], atol=0.15)
    assert 0.5 < hmc[0][2] <= 1.0

"""Multi-host backend (parallel/multihost.py): 2 processes x 4 virtual CPU
devices each, jax.distributed + Gloo collectives, process-spanning 8-device
mesh running the halo-sharded explicit driver — parity against a
single-device reference (SURVEY.md §5.8 green-field backend; the reference
links MPI/PETSc but never uses them, CMakeLists.txt:108-113)."""

import os
import subprocess
import sys

import pytest


def test_multihost_parity_two_processes():
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_mh_worker.py")
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(r)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for r in range(2)
    ]
    outs = []
    try:
        for pr in procs:
            out, _ = pr.communicate(timeout=800)
            outs.append(out)
    finally:
        for pr in procs:
            if pr.poll() is None:
                pr.kill()
    for r, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"
        assert "MH_PARITY_OK" in out, f"rank {r}:\n{out[-4000:]}"

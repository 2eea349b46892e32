"""Multi-PROCESS SPMD sweep: 2 jax.distributed processes × 4 devices.

The single-process SPMD tests exercise the shard_map program on one
process's virtual devices; this test runs the same program over a global
mesh spanning two OS processes (gloo CPU collectives), so every
ppermute/psum crosses a real process boundary — the framework's analog
of the reference's oversubscribed ``mpiexec -n 2`` distributed CI
(``/root/reference/.github/workflows/unittest.yml:26-45``,
``/root/reference/tests/test_mpi.py``).  On TPU pods the identical code
path rides ICI/DCN instead of gloo.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_spmd_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_spmd_tracks_serial():
    port = _free_port()
    env = dict(os.environ)
    # the workers pin their own platform/devices; drop the parent's
    # virtual-device flag so it doesn't double up
    env["XLA_FLAGS"] = ""
    env.pop("PYTEST_CURRENT_TEST", None)
    # the worker's script dir replaces cwd on sys.path — put the repo
    # root back (APPEND: the ambient PYTHONPATH carries backend hooks)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid}" in out, out[-4000:]
    # both processes computed the same replicated observable
    e = [
        line.split("e=")[1]
        for out in outs
        for line in out.splitlines()
        if "WORKER_OK" in line
    ]
    assert e[0] == e[1]

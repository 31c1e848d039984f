"""True multi-process (multi-controller) scale-out test.

Launches 2 OS processes, each with 4 virtual CPU devices, joined by
``jax.distributed`` into one 8-device program — the faithful stand-in for
2 TPU hosts over DCN (SURVEY.md §4 takeaway / §5.8: the reference has NO
distributed test harness; its MPI paths are exercised only in manual
coupled runs at GISS).  The worker (tests/multihost_worker.py) runs the
sharded Pallas regrid applies over the global mesh and asserts oracle
agreement + conservation in each process.
"""
import os
import socket
import subprocess
import sys

def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _run_workers(nproc: int, ndev: int, timeout: float = 280.0):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(nproc), str(port), str(ndev)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(nproc)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert "multihost OK" in out


def test_two_process_sharded_apply():
    _run_workers(nproc=2, ndev=4)


def test_four_process_full_coupler():
    """4 OS processes x 2 devices (VERDICT r3 item #8): ragged ny over the
    8-device multi-controller mesh, the PRODUCTION coupler with fused
    windows across a regeneration + E1vE0 + live mass-loss fluxes, ledger
    closure in every process, books matching the single-process run."""
    _run_workers(nproc=4, ndev=2, timeout=400.0)

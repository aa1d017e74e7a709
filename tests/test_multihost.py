"""Multi-process jax.distributed smoke test: two processes, 8 global CPU
devices, one shared ``trials`` mesh — the psum-reduced metric sums must be
identical in both processes (the distributed Loss.accumulate of SURVEY
§2a, exercised with a real multi-process runtime)."""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_sweep():
    port = _free_port()
    env_base = {**os.environ,
                "MH_COORD": f"localhost:{port}", "MH_NPROC": "2"}
    env_base.pop("XLA_FLAGS", None)
    # The worker must import the package even from a clean, uninstalled
    # checkout (the normal path is `pip install -e .`).
    env_base["PYTHONPATH"] = REPO + os.pathsep + env_base.get("PYTHONPATH", "")
    procs = []
    for pid in range(2):
        env = {**env_base, "MH_PID": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process run timed out")
        outs.append(out)
    results = []
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-2000:]
        lines = [l for l in out.splitlines() if l.startswith("MHRESULT ")]
        assert lines, out[-2000:]
        results.append(json.loads(lines[-1][len("MHRESULT "):]))
    # both processes see the same globally psum-reduced sums
    assert results[0]["trials"] == results[1]["trials"] == 8 * 4
    assert results[0]["fer"] == results[1]["fer"]
    assert results[0]["T"] == results[1]["T"]

"""Tier-2 harness: real 2-process SPMD run on localhost (reference §4 tier 2).

Spawns scripts/launch_local_multiprocess.sh with examples/multiprocess_toy.py,
which exercises: cross-process collectives, a data-parallel train step, and
multi-host orbax checkpoint save → restore-into-fresh-state → resume-exactness
(round-1 VERDICT next-step #8). Uses the shared .jax_cache, so warm runs take
seconds; a cold run compiles the tiny train step once per process.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAUNCHER = os.path.join(REPO, "scripts", "launch_local_multiprocess.sh")


def _port_free(port: int) -> bool:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        return s.connect_ex(("localhost", port)) != 0


@pytest.mark.skipif(sys.platform != "linux", reason="localhost launcher is linux-only")
def test_two_process_train_and_checkpoint(tmp_path):
    port = 12391
    if not _port_free(port):
        pytest.skip(f"coordinator port {port} busy")
    env = dict(
        os.environ,
        COORDINATOR_PORT=str(port),
        TOY_CKPT_DIR=str(tmp_path / "ckpt"),
    )
    result = subprocess.run(
        ["bash", LAUNCHER, "2", "examples/multiprocess_toy.py"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert result.returncode == 0, result.stdout[-3000:] + result.stderr[-2000:]
    assert "multi-host checkpoint save/restore/resume-exactness OK" in result.stdout

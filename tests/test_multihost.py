"""Multi-host (multi-process) distributed tests.

Spawns 2 OS processes x 4 virtual CPU devices each and runs
tests/multihost_worker.py in both: a ("pairs", "db") mesh whose `pairs`
axis crosses the process boundary (the DCN-style fake backend of
SURVEY.md §4), exercising pod-wide kNN, frame-window sharding with
windowed pose consensus, and point-sharded distributed BA — all with
content assertions inside the workers.
"""

import pathlib
import socket
import subprocess
import sys

import pytest

WORKER = pathlib.Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.multihost
def test_two_process_mesh():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=560)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i}: ALL OK" in out, out[-3000:]

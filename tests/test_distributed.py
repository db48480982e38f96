"""Multi-HOST readiness: 2 processes x 4 virtual CPU devices each run the
sharded VO pipeline over one global (data, seq) mesh — the DCN analog of the
single-process 8-device tests (SURVEY.md §5). Each worker asserts its own
time-slice equals the serial pipeline; this test orchestrates the pair."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pair(extra_args, timeout):
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        # The workers pin their own platform/flags; drop the suite's.
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), *extra_args],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"DISTRIBUTED-OK {pid}" in out, out[-4000:]


def test_two_process_sharded_vo_tiny():
    """Default-tier DCN coverage (VERDICT r3 item 7): 2 processes x 2
    virtual devices over one global (1, 4) mesh, trimmed scene. The workers
    share the suite's persistent compile cache, so warm runs take seconds;
    the full-size variant below stays `slow`."""
    _run_pair(["tiny"], timeout=1200)


@pytest.mark.slow
def test_two_process_sharded_vo_matches_serial():
    _run_pair([], timeout=1500)

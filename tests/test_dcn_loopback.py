"""Multi-host DCN layer exercised for real: two local jax.distributed
processes over a localhost coordinator run the 2-D sharded bank chain on a
global mesh whose channel axis crosses the process boundary
(tools/dcn_loopback.py; SURVEY.md §4 distributed test strategy)."""

import pytest
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_loopback():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dcn_loopback.py")],
        capture_output=True, text=True, timeout=280, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-500:]
    assert r.stdout.count("DCN LOOPBACK OK") == 2, r.stdout[-2000:]

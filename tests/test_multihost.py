"""The real multi-process distribution path, executed.

Reference runs 8-way NCCL (retake/infer_eval.py:149-157); here the JAX
equivalent — jax.distributed.initialize via infer_eval._init_distributed,
round-robin sharding, the sync_global_devices barrier, rank-0 merge — runs
as two OS processes on the CPU backend (tools/multihost_smoke.py)."""

import json
import os
import subprocess

import pytest
import sys


@pytest.mark.slow
def test_two_process_coordinator_eval():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "multihost_smoke.py")],
        capture_output=True, text=True, timeout=560, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    last = out.stdout.strip().splitlines()[-1]
    rec = json.loads(last)
    assert rec["multihost_smoke"] == "PASS" and rec["samples_merged"] == 4

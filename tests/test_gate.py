"""The first-checkpoint gate must itself be runnable (its stages broke once
before: a sys.path bootstrap placed above `from __future__` made
quant_ablation.py a SyntaxError and nobody noticed until review). The
--tiny-smoke mode dry-runs the checkpoint-free stages (demo goldens
plumbing, spec-decode parity, HTTP serving golden) on the tiny random model
so the gate is proven green BEFORE the first real checkpoint arrives."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_gate_tiny_smoke():
    out = subprocess.run(
        [sys.executable, "tools/first_checkpoint_gate.py", "--tiny-smoke"],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["pass"] is True
    assert rec["demo"]["ok"] and len(rec["demo"]["tokens"]) == 3
    assert rec["spec_parity"]["ok"]
    assert rec["spec_parity"]["agree_prefix_lens"]
    assert rec["prefix_parity"]["ok"]
    assert rec["prefix_parity"]["token_exact"]
    assert rec["http_golden"]["ok"] and rec["http_golden"]["n_tokens"] > 0
    assert rec["serve_decode_parity"]["ok"]
    assert rec["serve_decode_parity"]["token_agreement"] >= 0.7


def test_gate_stage_scripts_compile():
    """Every script the gate shells out to must at least be importable —
    the failure mode this guards is real (see module docstring)."""
    import py_compile

    for rel in (
        "demo.py",
        "tools/quant_ablation.py",
        "tools/gate_http_stage.py",
        "tools/gate_serve_decode_stage.py",
        "tools/first_checkpoint_gate.py",
        "retake_tpu/eval/infer_eval.py",
    ):
        py_compile.compile(os.path.join(REPO, rel), doraise=True)

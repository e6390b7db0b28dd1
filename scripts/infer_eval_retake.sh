#!/bin/bash
# Benchmark launcher (counterpart of the reference's scripts/infer_eval_retake.sh):
#   bash scripts/infer_eval_retake.sh <hf_ckpt_dir> <config.yaml> [num_processes]
# Single host drives its local TPU chip(s); multi-host pods launch one process
# per host with --coordinator/--process_id (see retake_tpu/eval/infer_eval.py).
set -euo pipefail

CKPT=${1:?usage: infer_eval_retake.sh ckpt config [nproc]}
CONFIG=${2:?usage: infer_eval_retake.sh ckpt config [nproc]}
NPROC=${3:-1}

PYTHONPATH=. python -m retake_tpu.eval.infer_eval \
  --hf_path "$CKPT" \
  --config_path "$CONFIG" \
  --num_processes "$NPROC" \
  --video_frame_extraction_fps 25

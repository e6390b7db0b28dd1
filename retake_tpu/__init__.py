"""retake-tpu: TPU-native long-video inference framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of SCZwangxiao/video-ReTaKe
(training-free long-video understanding via DPSelect keyframe selection,
chunked prefill, PivotKV KV-cache compression and YaRN context extension),
designed for TPU: static shapes, jit-compiled chunk steps, fused Pallas
kernels, and pjit/mesh distribution.

Package map (reference behavior documented in SURVEY.md):
  ops/      pure-function kernels: M-RoPE/YaRN, DPSelect, PivotKV eviction,
            attention (XLA + Pallas)
  models/   native JAX model families (Qwen2-VL, LLaVA-OneVision)
  runtime/  static KV cache, chunked-prefill engine, decode loop, pipeline
  parallel/ device mesh + sharding rules (TP/DP), multi-host eval sharding
  data/     video ingestion, processor, benchmark datasets and scorers
  eval/     distributed benchmark runner
  utils/    YAML config surface (reference-compatible), logging, profiling
"""

__version__ = "0.1.0"

"""Experiment configuration: YAML surface compatible with the reference.

Accepts the exact schema of the reference configs (configs/*.yaml — see
SURVEY.md §5 "Config / flag system"): ``method``, ``scaling_factor``,
``attn_implementation``, ``longvideo_kwargs{frame_chunk_size,
chunked_prefill_frames, visual_compression(+kwargs), kvcache_compression
(+kwargs)}``, plus dataset/data/generate/output keys. Unknown keys are
preserved in ``extras`` so reference configs load unmodified.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import yaml


@dataclasses.dataclass
class VisualCompressionConfig:
    compression_ratio: float = 1.0
    compression_method: str = "Keyframe"  # Keyframe | MA-LLM | MA-LLM-hard
    patch_sync: bool = False
    return_keyframe_mask: bool = True


@dataclasses.dataclass
class KVCompressionConfig:
    compression_method: str = "pivotkv"
    compression_ratio: Optional[float] = None  # fixed ratio, or None
    dynamic_compression_ratio: bool = False
    max_input_length: Optional[int] = None
    pos_embed_reforge: bool = False
    prompt_guided_compression: bool = False


@dataclasses.dataclass
class RetakeConfig:
    model_name: str = "qwen2_vl"
    method: str = "retake"
    scaling_factor: Optional[float] = None  # YaRN factor; None = disabled
    # pallas (flagship kernel: dead-block skipping + Pallas eviction scoring)
    # | flash (XLA online-softmax) | xla (masked einsum)
    attn_implementation: str = "pallas"
    frame_chunk_size: Optional[int] = None  # ViT chunking (grid_t units)
    chunked_prefill_frames: Optional[int] = None  # LLM chunk (raw frames)
    visual_compression: bool = False
    visual: VisualCompressionConfig = dataclasses.field(
        default_factory=VisualCompressionConfig
    )
    kvcache_compression: bool = False
    kv: KVCompressionConfig = dataclasses.field(default_factory=KVCompressionConfig)
    # data
    dataset_name: Optional[str] = None
    anno_file: Optional[str] = None
    dataloader_num_workers: int = 0
    sample_fps: float = 4.0
    max_num_frames: int = 2048
    longsize_resolution: int = 448
    # generate
    do_sample: bool = False
    temperature: float = 1.0  # HF LogitsWarper defaults when do_sample=true
    top_p: float = 1.0
    top_k: int = 0
    seed: int = 0  # TPU extension: sampling is seeded/deterministic
    max_new_tokens: int = 128
    output_dir: Optional[str] = None
    # TPU-native extension: quantization (None | "int8" | "w8a8").
    # "int8": weight-only, exact dequant — lets the 7B models fit a single
    # 16 GB v5e chip. "w8a8": int8 weights AND per-token int8 activations at
    # prefill, running the linears on the MXU's double-rate int8 path
    # (~1.6x measured on matmul-bound stages); decode stays weight-only.
    quantization: Optional[str] = None
    # TPU-native extension: KV-cache storage dtype (None = bf16 | "int8").
    # int8 halves the cache's HBM at rest and the decode-critical cache
    # reads; the per-key scales commute with the attention contractions so
    # no dequantized copy is ever materialized. Lossy (8-bit keys/values).
    kv_cache_dtype: Optional[str] = None
    # TPU-native extension: decode this many eval samples together in one
    # vmapped loop (engine.generate_batch). Prefill stays sequential
    # (MXU-bound); decode is HBM-bound so batching multiplies tokens/s.
    # 1 = the reference's per-sample behavior.
    eval_batch_size: int = 1
    # TPU-native extension: decode loops (sequential generate AND batched
    # eval decode) stop as soon as every request has emitted EOS
    # (while_loop instead of the static max_new-step scan;
    # token-identical). With real checkpoints, benchmark answers are a
    # handful of tokens vs max_new=128, so the static scan wastes
    # ~max_new/answer_len of the decode time. Default ON: measured
    # on-chip (tools/decode_earlystop_bench.py, 2B geometry, B=4,
    # max_new=128, no EOS = worst case) the while_loop costs -1.5% vs
    # the scan, i.e. free. Set false to pin the static-scan decode.
    decode_early_stop: bool = True
    # TPU-native extension: prompt-lookup speculative decoding (greedy
    # only). Each decode step matches the trailing spec_ngram tokens of
    # [prompt tail | generated] against earlier occurrences, proposes the
    # spec_draft tokens that followed the latest match, and verifies them
    # all in ONE s=draft+1 step (decode is HBM-bound on weight reads, so
    # the verify step costs ~one s=1 step; accepted proposals are free
    # tokens). Training-free and greedy-deterministic; tokens can differ
    # from the s=1 loop only within fp reduction-order ulps (more readily
    # with kv_cache_dtype: int8, whose coarser logits flip near-ties; the
    # stream stays self-consistent greedy either way). Sequential
    # generate only (batched decode / serving keep the s=1 loops).
    # MEASURED on-chip (tools/spec_decode_bench.py, 2026-08-19, 2B/64f,
    # draft=8): verify step 6.84 ms vs 5.07 ms scan step (35% overhead at
    # zero acceptance -> breakeven ~1.35 accepted tok/step); at the
    # random-weight cyclical streams' 1.98 tok/step it was 1.47x faster
    # end-to-end. Default stays FALSE: acceptance is workload-dependent
    # (short MC eval answers rarely quote the prompt) and the default
    # decode_early_stop already collapses short answers; enable for
    # long-form generation (MLVU summarization) with real checkpoints.
    spec_decode: bool = False
    spec_ngram: int = 3
    spec_draft: int = 8
    # TPU-native extension: compute the vision tower + DPSelect ONCE per
    # video and reuse the artifact (engine.encode_video -> VideoFeatures)
    # for every question about that video. The eval benchmarks ask ~3
    # questions per video, and the vision stage is question-independent —
    # the reference recomputes it per question (qwen2_vl.py:597-627). With
    # this on, the eval runner shards round-robin BY VIDEO (not by sample)
    # so a video's questions land on one process; merged artifacts are
    # unchanged. Costs holding one video's LLM-space embeddings in HBM
    # across its questions (~1 GB at 2B/2048f, ~1.4 GB at LLaVA-7B/1024f).
    reuse_video_features: bool = False
    extras: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "RetakeConfig":
        d = dict(d)
        lv = d.pop("longvideo_kwargs", {}) or {}
        vc_kwargs = lv.get("visual_compression_kwargs", {}) or {}
        kv_kwargs = lv.get("kvcache_compression_kwargs", {}) or {}
        known = {
            "model_name",
            "method",
            "scaling_factor",
            "attn_implementation",
            "quantization",
            "kv_cache_dtype",
            "eval_batch_size",
            "decode_early_stop",
            "reuse_video_features",
            "spec_decode",
            "spec_ngram",
            "spec_draft",
            "dataset_name",
            "anno_file",
            "dataloader_num_workers",
            "sample_fps",
            "max_num_frames",
            "longsize_resolution",
            "do_sample",
            "temperature",
            "top_p",
            "top_k",
            "seed",
            "max_new_tokens",
            "output_dir",
        }
        kwargs = {k: v for k, v in d.items() if k in known}
        extras = {k: v for k, v in d.items() if k not in known}
        if kwargs.get("quantization") not in (None, "int8", "w8a8"):
            raise ValueError(
                f"quantization={kwargs['quantization']!r}: expected "
                "null | int8 | w8a8"
            )
        if kwargs.get("kv_cache_dtype") not in (None, "int8"):
            # fail fast: a typo here would silently fall back to bf16 KV and
            # OOM large-video configs mid-prefill instead
            raise ValueError(
                f"kv_cache_dtype={kwargs['kv_cache_dtype']!r}: expected "
                "null | int8"
            )
        if kwargs.get("spec_decode") and kwargs.get("do_sample"):
            raise ValueError(
                "spec_decode is greedy-only (verification compares against "
                "argmax); disable do_sample or spec_decode"
            )
        if kwargs.get("attn_implementation") in (
            "flash_attention_2",
            "sdpa",
            "eager",
        ):
            # reference GPU attn impls all map to the Pallas TPU kernel
            # (engine A/B on a v5e: LLM prefill 7.45s vs 9.66s at 2B/2048f;
            # 5-12x at 7B geometry where XLA flash degrades)
            kwargs["attn_implementation"] = "pallas"
        return RetakeConfig(
            frame_chunk_size=lv.get("frame_chunk_size"),
            chunked_prefill_frames=lv.get("chunked_prefill_frames"),
            visual_compression=bool(lv.get("visual_compression", False)),
            visual=VisualCompressionConfig(
                compression_ratio=vc_kwargs.get("compression_ratio", 1.0),
                compression_method=vc_kwargs.get("compression_method", "Keyframe"),
                patch_sync=bool(vc_kwargs.get("patch_sync", False)),
                return_keyframe_mask=bool(
                    vc_kwargs.get("return_keyframe_mask", True)
                ),
            ),
            kvcache_compression=bool(lv.get("kvcache_compression", False)),
            kv=KVCompressionConfig(
                compression_method=kv_kwargs.get("compression_method", "pivotkv"),
                compression_ratio=kv_kwargs.get("compression_ratio"),
                dynamic_compression_ratio=bool(
                    kv_kwargs.get("dynamic_compression_ratio", False)
                ),
                max_input_length=kv_kwargs.get("max_input_length"),
                pos_embed_reforge=bool(kv_kwargs.get("pos_embed_reforge", False)),
                prompt_guided_compression=bool(
                    kv_kwargs.get("prompt_guided_compression", False)
                ),
            ),
            extras=extras,
            **kwargs,
        )

    @staticmethod
    def from_yaml(path: str) -> "RetakeConfig":
        with open(path) as f:
            return RetakeConfig.from_dict(yaml.safe_load(f))

    def compression_ratio_for(self, input_length: int) -> float:
        """Resolve the effective KV compression ratio for a request
        (reference dynamic rule, qwen2_vl.py:550-557)."""
        if not self.kvcache_compression:
            return 1.0
        if self.kv.dynamic_compression_ratio:
            assert self.kv.max_input_length is not None
            if input_length <= self.kv.max_input_length:
                return 1.0
            return self.kv.max_input_length / input_length
        return self.kv.compression_ratio if self.kv.compression_ratio else 1.0

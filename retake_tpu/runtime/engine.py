"""Chunked-prefill inference engine for Qwen2-VL (the ReTaKe runtime).

Replaces the reference's monkeypatched ``forward`` + HF ``generate`` loop
(retake/qwen2_vl.py:522-764) with a host-orchestrated sequence of jit-compiled
device steps designed for XLA:

  host (numpy, once per request)           device (jit, static shapes)
  ---------------------------------        ---------------------------------
  tokenize / get_rope_index                ViT frame chunks (padded tail)
  DPSelect reforge of ids/positions        DPSelect scoring + gather
  modality segmentation                    embed + video scatter
  chunk plan: every keep_len/cache_len     text-segment steps (bucketed pad)
    is host-computable because the         video chunk steps (fixed shape,
    compression ratio is fixed before        compress + evict fused)
    prefill (qwen2_vl.py:550-557)          greedy decode steps
  single static cache budget

Chunk shapes are static per config; tails are padded and masked. The KV cache
is one fixed [L, kv, budget, D] buffer; keep_len / cache_len stay traced (or
host-mirrored) scalars so one compiled program serves any video length.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from retake_tpu.models.qwen2_vl import text, vision
from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig
from retake_tpu.ops import dpselect
from retake_tpu.runtime import cache as cache_lib
from retake_tpu.utils import positions as pos_lib
from retake_tpu.utils.config import RetakeConfig

TEXT_BUCKET = 128  # text segments padded to a multiple of this
BUDGET_BUCKET = 8192  # cache budgets rounded up to a multiple of this


@partial(
    jax.jit,
    static_argnames=("cfg", "grid_t", "grid_h", "grid_w"),
)
def _vit_chunk(params, cfg: Qwen2VLConfig, patches, grid_t, grid_h, grid_w):
    return vision.vision_tower(
        params["visual"], cfg.vision, patches, grid_t, grid_h, grid_w
    )


@partial(jax.jit, static_argnames=("grid_t", "hw", "tgt", "window", "sync"))
def _dpselect_gather(video_embeds, grid_t, hw, tgt, window, sync):
    bank = video_embeds.reshape(grid_t, hw, -1)
    keep, keymask = dpselect.dpselect(bank, tgt, window, sync)
    kept = dpselect.gather_keyframes(bank, keep)
    if sync:
        keymask = jnp.broadcast_to(keymask[:, None], (tgt, hw))
    return kept.reshape(tgt * hw, -1), keymask.reshape(-1)


@partial(jax.jit, donate_argnames=("cache",), static_argnames=("cfg", "compress", "reforge", "attn_impl", "chunk_len"))
def _segment_step(
    params,
    cfg: Qwen2VLConfig,
    cache,
    embeds_full,  # [S_pad, d]
    pos_full,  # [3, S_pad]
    keypatch_full,  # [S_pad] bool
    offset,  # scalar int32 — chunk start in the full sequence
    valid_len,  # scalar int32
    keep_len,  # scalar int32
    chunk_len: int,
    compress: bool,
    reforge: bool,
    attn_impl: str,
):
    d = embeds_full.shape[-1]
    hidden = jax.lax.dynamic_slice(embeds_full, (offset, 0), (chunk_len, d))
    pos3 = jax.lax.dynamic_slice(pos_full, (0, offset), (3, chunk_len))
    keypatch = jax.lax.dynamic_slice(keypatch_full, (offset,), (chunk_len,))
    return text.decoder_chunk(
        params, cfg, cache, hidden, pos3, valid_len, keypatch, keep_len,
        compress=compress, reforge=reforge, attn_impl=attn_impl,
    )


@partial(jax.jit, donate_argnames=("cache",), static_argnames=("cfg", "compress", "reforge", "attn_impl", "chunk_len", "prompt_len"))
def _video_chunk_with_prompt_step(
    params,
    cfg: Qwen2VLConfig,
    cache,
    embeds_full,
    pos_full,
    keypatch_full,
    offset,
    valid_len,  # valid video tokens in this chunk
    keep_len,
    prompt_offset,  # scalar int32 — prompt segment start (static span length)
    chunk_len: int,
    prompt_len: int,
    compress: bool,
    reforge: bool,
    attn_impl: str,
):
    """Prompt-guided chunk: [video (valid prefix) | prompt | leftover pad].

    Reference forge_input_chunks (qwen2_vl.py:493-519): the final text
    (question) segment is appended to every video chunk with its positions
    shifted to continue right after the chunk's last valid token.
    """
    d = embeds_full.shape[-1]
    total = chunk_len + prompt_len
    video = jax.lax.dynamic_slice(embeds_full, (offset, 0), (chunk_len, d))
    video = jnp.pad(video, ((0, prompt_len), (0, 0)))
    prompt = jax.lax.dynamic_slice(embeds_full, (prompt_offset, 0), (prompt_len, d))
    hidden = jax.lax.dynamic_update_slice(video, prompt, (valid_len, 0))

    pos_v = jax.lax.dynamic_slice(pos_full, (0, offset), (3, chunk_len))
    pos_v = jnp.pad(pos_v, ((0, 0), (0, prompt_len)), mode="edge")
    pos_p = jax.lax.dynamic_slice(pos_full, (0, prompt_offset), (3, prompt_len))
    last_valid_pos = pos_v[0, jnp.maximum(valid_len - 1, 0)]
    pos_offset = pos_p[0, 0] - last_valid_pos - 1
    pos3 = jax.lax.dynamic_update_slice(
        pos_v, pos_p - pos_offset, (0, valid_len)
    )

    kp = jax.lax.dynamic_slice(keypatch_full, (offset,), (chunk_len,))
    kp = jnp.pad(kp, (0, prompt_len))
    # prompt tokens are not keypatches; zero out anything at/after valid_len
    # then nothing to set (prompt keypatch stays False)
    idx = jnp.arange(total)
    kp = jnp.where((idx >= valid_len) & (idx < valid_len + prompt_len), False, kp)

    return text.decoder_chunk(
        params, cfg, cache, hidden, pos3, valid_len + prompt_len, kp, keep_len,
        compress=compress, reforge=reforge, attn_impl=attn_impl,
    )


@partial(jax.jit, donate_argnames=("cache",), static_argnames=("cfg", "reforge", "attn_impl"))
def _decode_step(params, cfg: Qwen2VLConfig, cache, token, pos_scalar, reforge, attn_impl):
    emb = text.embed(params, token[None])  # [1, d]
    pos3 = jnp.broadcast_to(pos_scalar, (3, 1)).astype(jnp.int32)
    hidden, cache = text.decoder_chunk(
        params, cfg, cache, emb, pos3, jnp.int32(1),
        jnp.zeros(1, bool), jnp.int32(1),
        compress=False, reforge=reforge, attn_impl=attn_impl,
    )
    logits = text.final_logits(params, cfg, hidden[0])
    return jnp.argmax(logits), cache


@partial(jax.jit, static_argnames=("cfg",))
def _final_token(params, cfg: Qwen2VLConfig, hidden, last_idx):
    logits = text.final_logits(params, cfg, hidden[last_idx])
    return jnp.argmax(logits)


@partial(jax.jit, static_argnames=("cfg",))
def _build_embeds(params, cfg: Qwen2VLConfig, input_ids, video_embeds, video_start):
    emb = text.embed(params, input_ids)
    if video_embeds is not None:
        emb = jax.lax.dynamic_update_slice(
            emb, video_embeds.astype(emb.dtype), (video_start, 0)
        )
    return emb


@dataclasses.dataclass
class GenerationResult:
    tokens: np.ndarray  # generated token ids (without the prompt)
    prefill_seconds: float = 0.0
    decode_seconds: float = 0.0
    cache_len: int = 0
    input_len: int = 0


class Qwen2VLEngine:
    """Single-request (batch 1) long-video inference engine."""

    def __init__(
        self,
        cfg: Qwen2VLConfig,
        params,
        retake: RetakeConfig,
    ):
        if retake.scaling_factor:
            cfg = cfg.with_yarn(retake.scaling_factor)
        self.cfg = cfg
        self.params = params
        self.retake = retake
        impl = retake.attn_implementation
        self.attn_impl = impl if impl in ("flash", "pallas", "xla") else "flash"

    # ---------- vision ----------

    def run_vision(self, pixel_values_videos: np.ndarray, video_grid_thw) -> jax.Array:
        """ViT over the video in frame chunks (reference qwen2_vl.py:597-617).

        pixel_values_videos: [grid_t*grid_h*grid_w, patch_dim].
        Returns merged LLM-space embeddings [grid_t*grid_h*grid_w/4, d].
        """
        t, h, w = (int(x) for x in np.asarray(video_grid_thw).reshape(-1)[:3])
        fcs = self.retake.frame_chunk_size or 10**9
        patches = jnp.asarray(pixel_values_videos, dtype=jnp.bfloat16)
        if t <= fcs:
            return _vit_chunk(self.params, self.cfg, patches, t, h, w)
        hw = h * w
        outs = []
        for i in range(0, t, fcs):
            tc = min(fcs, t - i)
            chunk = patches[i * hw : (i + tc) * hw]
            if tc < fcs:  # pad tail to the common shape; frames are independent
                chunk = jnp.pad(chunk, ((0, (fcs - tc) * hw), (0, 0)))
            out = _vit_chunk(self.params, self.cfg, chunk, fcs, h, w)
            merged_per_t = hw // self.cfg.vision.spatial_merge_size**2
            outs.append(out[: tc * merged_per_t])
        return jnp.concatenate(outs, axis=0)

    # ---------- prefill + decode ----------

    def get_chunk_tokens(self, video_grid_thw) -> Optional[int]:
        """Tokens per LLM prefill chunk (reference get_chunk_size,
        qwen2_vl.py:477-491 — chunked_prefill_frames is in raw-frame units)."""
        chunk_frames = self.retake.chunked_prefill_frames
        if chunk_frames is None:
            return None
        t, h, w = (int(x) for x in np.asarray(video_grid_thw).reshape(-1)[:3])
        vf = self.cfg.vision
        t_factor = vf.spatial_merge_size**2 * vf.temporal_patch_size
        return min(chunk_frames, t) * h * w // t_factor

    def generate(
        self,
        input_ids: np.ndarray,
        pixel_values_videos: Optional[np.ndarray] = None,
        video_grid_thw=None,
        max_new_tokens: Optional[int] = None,
    ) -> GenerationResult:
        import time

        from retake_tpu.utils.profiling import StageTimer

        timer = StageTimer()
        cfg, rt = self.cfg, self.retake
        max_new_tokens = max_new_tokens or rt.max_new_tokens
        ids = np.asarray(input_ids, dtype=np.int64).reshape(-1)

        t0 = time.perf_counter()
        # 1. original position ids (pre-compression; HF computes them first)
        grid = None if video_grid_thw is None else np.asarray(video_grid_thw).reshape(-1, 3)
        pos, _ = pos_lib.get_rope_index(
            ids,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            video_grid_thw=grid,
        )
        decode_pos_base = int(pos.max()) + 1  # reference decode positions

        # 2. vision tower + DPSelect
        video_embeds = None
        keypatch_tokens = np.zeros(len(ids), dtype=bool)
        if pixel_values_videos is not None:
            with timer.stage("vision_tower"):
                video_embeds = self.run_vision(pixel_values_videos, grid[0])
            t, h, w = (int(x) for x in grid[0])
            m2 = cfg.vision.spatial_merge_size**2
            hw_m = h * w // m2
            if rt.visual_compression:
                with timer.stage("dpselect"):
                    vc = rt.visual
                    # grid_t here is the temporal-patch-merged frame count
                    tgt = max(1, round(vc.compression_ratio * t))
                    if vc.compression_method == "Keyframe":
                        video_embeds, keymask = _dpselect_gather(
                            video_embeds, t, hw_m, tgt, 3, vc.patch_sync
                        )
                        keymask_np = (
                            np.asarray(keymask)
                            if vc.return_keyframe_mask
                            else np.zeros(tgt * hw_m, bool)
                        )
                    elif vc.compression_method in ("MA-LLM", "MA-LLM-hard"):
                        bank = video_embeds.reshape(t, hw_m, -1)
                        video_embeds = dpselect.malm_compress(
                            bank, tgt, sync=vc.patch_sync,
                            hard=vc.compression_method == "MA-LLM-hard",
                        ).reshape(tgt * hw_m, -1)
                        keymask_np = np.zeros(tgt * hw_m, bool)
                    else:
                        raise NotImplementedError(vc.compression_method)
                    if tgt != t:
                        vi = np.where(ids == cfg.video_token_id)[0]
                        ids, pos = pos_lib.reforge_after_visual_compression(
                            ids, pos, (int(vi[0]), int(vi[-1]) + 1),
                            tgt * hw_m, t - tgt,
                        )
                        keypatch_tokens = np.zeros(len(ids), dtype=bool)
                    vi = np.where(ids == cfg.video_token_id)[0]
                    keypatch_tokens[vi[0] : vi[0] + len(keymask_np)] = keymask_np

        s = len(ids)
        ratio = rt.compression_ratio_for(s)
        chunk_tokens = (
            self.get_chunk_tokens(grid[0]) if grid is not None else None
        )
        reforge = rt.kv.pos_embed_reforge and rt.kvcache_compression
        compress_video = rt.kvcache_compression and ratio < 1.0
        prompt_guided = (
            rt.kv.prompt_guided_compression and compress_video
        )

        # 3. segments + host-side cache-length plan
        if chunk_tokens is None:
            segments = [(0, s, "text")]
        else:
            segments = pos_lib.segment_modalities(ids, cfg.video_token_id)
        prompt_span = None
        if prompt_guided:
            sp, ep, tp = segments[-1]
            assert tp == "text"
            prompt_span = (sp, ep)

        plan: List[dict] = []
        cache_len = 0
        max_extent = 0
        for (seg_s, seg_e, kind) in segments:
            if kind == "text":
                n = seg_e - seg_s
                padded = max(TEXT_BUCKET, math.ceil(n / TEXT_BUCKET) * TEXT_BUCKET)
                plan.append(
                    dict(kind="text", offset=seg_s, valid=n, chunk_len=padded,
                         cache_len=cache_len)
                )
                max_extent = max(max_extent, cache_len + padded)
                cache_len += n
            else:
                n = seg_e - seg_s
                ct = chunk_tokens
                num_chunks = math.ceil(n / ct)
                for ci in range(num_chunks):
                    ss = seg_s + ci * ct
                    valid = min(ct, seg_e - ss)
                    p_len = (prompt_span[1] - prompt_span[0]) if prompt_guided else 0
                    q_len = valid + p_len
                    keep = max(1, int(ratio * q_len)) if compress_video else q_len
                    plan.append(
                        dict(kind="video", offset=ss, valid=valid,
                             chunk_len=ct, keep=keep, prompt_len=p_len,
                             cache_len=cache_len)
                    )
                    max_extent = max(max_extent, cache_len + ct + p_len)
                    cache_len += keep
        final_len = cache_len
        needed = max(max_extent, final_len + max_new_tokens)
        budget = math.ceil(needed / BUDGET_BUCKET) * BUDGET_BUCKET

        # 4. device inputs
        s_pad = max(seg["offset"] + seg["chunk_len"] for seg in plan)
        s_pad = max(s_pad, s)
        ids_dev = np.zeros(s_pad, dtype=np.int32)
        ids_dev[:s] = ids
        pos_pad = np.zeros((3, s_pad), dtype=np.int32)
        pos_pad[:, :s] = pos
        if s_pad > s:  # continue positions into padding (masked anyway)
            pos_pad[:, s:] = pos[:, -1:] + np.arange(1, s_pad - s + 1)
        kp_pad = np.zeros(s_pad, dtype=bool)
        kp_pad[:s] = keypatch_tokens

        vstart = int(np.where(ids == cfg.video_token_id)[0][0]) if (
            video_embeds is not None
        ) else 0
        embeds = _build_embeds(
            self.params, cfg, jnp.asarray(ids_dev),
            None if video_embeds is None else video_embeds,
            jnp.int32(vstart),
        )
        pos_dev = jnp.asarray(pos_pad)
        kp_dev = jnp.asarray(kp_pad)

        kv = cache_lib.init_cache(
            cfg.num_hidden_layers, cfg.num_key_value_heads, budget,
            cfg.head_dim, dtype=embeds.dtype,
        )

        # 5. run the plan
        hidden = None
        last_valid = 0
        with timer.stage("prefill_chunks"):
          for step in plan:
            if step["kind"] == "text":
                hidden, kv = _segment_step(
                    self.params, cfg, kv, embeds, pos_dev, kp_dev,
                    jnp.int32(step["offset"]), jnp.int32(step["valid"]),
                    jnp.int32(step["valid"]), step["chunk_len"],
                    False, reforge, self.attn_impl,
                )
                last_valid = step["valid"]
            elif step.get("prompt_len"):
                hidden, kv = _video_chunk_with_prompt_step(
                    self.params, cfg, kv, embeds, pos_dev, kp_dev,
                    jnp.int32(step["offset"]), jnp.int32(step["valid"]),
                    jnp.int32(step["keep"]), jnp.int32(prompt_span[0]),
                    step["chunk_len"], step["prompt_len"],
                    compress_video, reforge, self.attn_impl,
                )
                last_valid = step["valid"] + step["prompt_len"]
            else:
                hidden, kv = _segment_step(
                    self.params, cfg, kv, embeds, pos_dev, kp_dev,
                    jnp.int32(step["offset"]), jnp.int32(step["valid"]),
                    jnp.int32(step["keep"]), step["chunk_len"],
                    compress_video, reforge, self.attn_impl,
                )
                last_valid = step["valid"]

        with timer.stage("first_token"):
            token = _final_token(
                self.params, cfg, hidden, jnp.int32(last_valid - 1)
            )
            token_host = int(token)  # prefill ends when first token is ready
        t_prefill = time.perf_counter() - t0

        # 6. greedy decode
        t0 = time.perf_counter()
        out_tokens = [token_host]
        with timer.stage("decode"):
            for i in range(max_new_tokens - 1):
                if out_tokens[-1] == cfg.eos_token_id:
                    break
                token, kv = _decode_step(
                    self.params, cfg, kv, jnp.int32(out_tokens[-1]),
                    jnp.int32(decode_pos_base + i), reforge, self.attn_impl,
                )
                out_tokens.append(int(token))
        t_decode = time.perf_counter() - t0

        timer.report()
        return GenerationResult(
            tokens=np.asarray(out_tokens),
            prefill_seconds=t_prefill,
            decode_seconds=t_decode,
            cache_len=final_len,
            input_len=s,
        )

"""LLaVA-OneVision / LLaVA-Video inference engine.

Counterpart of the reference's patched LlavaOnevision forward
(retake/llava_onevision.py:306-583): SigLIP tower in frame chunks ->
DPSelect on *pre-projector* features -> projector -> 2x2 bilinear pooling ->
image_newline append -> the shared chunked-prefill + PivotKV core
(runtime/engine.prefill_and_decode) with 1-D RoPE.

Known reference quirk replicated for parity: the DPSelect keypatch mask is
computed on the un-pooled 27x27 patch grid ([t*729] flags) but scattered onto
the pooled token stream (t*196+1 tokens) by simple truncation — the
reference's ``masked_scatter`` does exactly this (llava_onevision.py:485-486).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from retake_tpu.models.llava_onevision import siglip
from retake_tpu.models.llava_onevision.config import LlavaOnevisionConfig
from retake_tpu.ops import dpselect
from retake_tpu.runtime.engine import (
    GenerationResult,
    PrefixMismatch,
    VideoFeatures,
    _dpselect_mask,  # shared ratio-1.0 mask-only DPSelect
    _write_rows,  # shared donated streaming-buffer insert (rank-generic)
    decode_batch,
    prefill_and_decode,
)
from retake_tpu.utils.config import RetakeConfig


@partial(jax.jit, static_argnames=("vcfg", "act_quant"))
def _siglip_chunk(params, vcfg, frames_u8, act_quant=False):
    dtype = params["vision_tower"]["patch_embed"]["w"].dtype
    patches = siglip.patchify_frames(frames_u8, vcfg, dtype)
    return siglip.siglip_tower(
        params["vision_tower"], vcfg, patches, act_quant=act_quant
    )


@partial(jax.jit, static_argnames=("vcfg", "act_quant", "mesh"))
def _siglip_chunk_tp(tower_params, vcfg, frames_u8, act_quant, mesh):
    """Tensor-parallel SigLIP chunk: shard the FRAME axis over ``tp``.

    Each frame is an independent 729-token sequence through the tower
    (attention never crosses frames), so frame-sharding needs ZERO
    collectives — the same argument as engine._vit_chunk_tp for the
    Qwen2-VL ViT (head-sharding would all-reduce every proj/fc2).
    shard_map keeps every op chip-local; tower weights replicate
    (~0.8 GB at so400m scale)."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    tp = mesh.shape["tp"]
    assert frames_u8.shape[0] % tp == 0, (frames_u8.shape, tp)

    def local(vp, fr):
        dtype = vp["patch_embed"]["w"].dtype
        patches = siglip.patchify_frames(fr, vcfg, dtype)
        return siglip.siglip_tower(vp, vcfg, patches, act_quant=act_quant)

    kw = dict(
        mesh=mesh,
        in_specs=(jax.sharding.PartitionSpec(),
                  jax.sharding.PartitionSpec("tp")),
        out_specs=jax.sharding.PartitionSpec("tp"),
    )
    try:
        f = shard_map(local, check_vma=False, **kw)
    except TypeError:  # older jax spells it check_rep
        f = shard_map(local, check_rep=False, **kw)
    return f(tower_params, frames_u8)


@partial(jax.jit, static_argnames=("grid", "pooled", "act_quant"))
def _project_pool_chunk(
    params, features, grid: int, pooled: int, act_quant=False
):
    """Project + 2x2 pool one frame chunk: [tc, 729, 1152] -> [tc, 196, d]."""
    x = siglip.multi_modal_projector(
        params["projector"], features, act_quant=act_quant
    )
    return siglip.apply_pooling(x, grid, pooled)


def _project_pool_newline(
    params, features, grid: int, pooled: int, act_quant=False,
    frame_chunk: int = 64,
):
    """[t, 729, 1152] -> flattened LLM video embeds [t*196 + 1, d].

    Projection runs in frame chunks: the pre-pooling projector output is
    [t, 729, text_d] — 5.4 GB bf16 at 1024 frames x 7B width, which OOMs a
    16 GB chip next to the int8 params if materialized at once (frames are
    independent, so chunking is exact). Chunks stream into one donated
    buffer (list + concatenate would hold 2x the embeddings at the join).
    """
    t = features.shape[0]
    n = pooled * pooled
    out = None
    for i in range(0, t, frame_chunk):
        x = _project_pool_chunk(
            params, features[i : i + frame_chunk], grid, pooled, act_quant
        )
        tc, _, d = x.shape
        if out is None:
            out = jnp.zeros((t * n + 1, d), x.dtype)
            out = _write_rows(
                out, params["image_newline"][None, :].astype(x.dtype),
                jnp.int32(t * n),
            )
        out = _write_rows(out, x.reshape(tc * n, d), jnp.int32(i * n))
    return out


@partial(jax.jit, static_argnames=("grid_t", "hw", "tgt", "window", "sync"))
def _dpselect_gather(features, grid_t, hw, tgt, window, sync):
    bank = features.reshape(grid_t, hw, -1)
    keep, keymask = dpselect.dpselect(bank, tgt, window, sync)
    kept = dpselect.gather_keyframes(bank, keep)
    if sync:
        keymask = jnp.broadcast_to(keymask[:, None], (tgt, hw))
    return kept, keymask.reshape(-1)


class LlavaOnevisionEngine:
    """Single-request long-video engine for the LLaVA-OneVision family."""

    def __init__(self, cfg: LlavaOnevisionConfig, params, retake: RetakeConfig,
                 cache_sharding=None):
        if retake.scaling_factor:
            cfg = cfg.with_yarn(retake.scaling_factor)
        self.cfg = cfg
        self.params = params
        self.retake = retake
        # optional KVCache NamedShardings (parallel/mesh.cache_shardings):
        # TP runs keep the cache sharded over kv heads, and run_vision
        # frame-shards the SigLIP tower over the same mesh
        self.cache_sharding = cache_sharding
        impl = retake.attn_implementation
        self.attn_impl = impl if impl in ("flash", "pallas", "xla") else "pallas"
        self.act_quant = retake.quantization == "w8a8"

    def _vision_aq(self) -> bool:
        """SigLIP W8A8 only when its weights are actually int8-quantized."""
        return (
            self.act_quant
            and "scale" in self.params["vision_tower"]["blocks"]["q"]
        )

    def run_vision(self, frames: np.ndarray, on_dispatch=None) -> jax.Array:
        """frames [T, 384, 384, 3] uint8 -> SigLIP features [T, 729, 1152]
        in frame chunks (reference llava_onevision.py:424-439).
        ``on_dispatch``: serving hook, see Qwen2VLEngine.run_vision."""
        t = frames.shape[0]
        s = self.cfg.vision.image_size
        assert frames.shape[1:3] == (s, s), (
            f"frames must be pre-resized to {s}x{s} "
            f"(got {frames.shape[1:3]}; use data.processor."
            "LlavaOnevisionVideoProcessor)"
        )
        fcs = self.retake.frame_chunk_size or 10**9
        frames = jnp.asarray(frames)
        aq = self._vision_aq()
        # TP: shard the frame axis (frames are attention-independent —
        # _siglip_chunk_tp) whenever the chunk's frame count divides tp
        tp_mesh = None
        if self.cache_sharding is not None:
            m = self.cache_sharding.k.mesh
            if m.shape.get("tp", 1) > 1:
                tp_mesh = m

        def tower(chunk):
            if tp_mesh is not None and chunk.shape[0] % tp_mesh.shape["tp"] == 0:
                return _siglip_chunk_tp(
                    self.params["vision_tower"], self.cfg.vision, chunk,
                    aq, tp_mesh,
                )
            return _siglip_chunk(self.params, self.cfg.vision, chunk, aq)

        if t <= fcs:
            return tower(frames)
        out_buf = None
        for i in range(0, t, fcs):
            tc = min(fcs, t - i)
            chunk = frames[i : i + tc]
            if tc < fcs:
                chunk = jnp.pad(chunk, ((0, fcs - tc), (0, 0), (0, 0), (0, 0)))
            out = tower(chunk)[:tc]
            if out_buf is None:
                out_buf = jnp.zeros((t,) + out.shape[1:], out.dtype)
            out_buf = _write_rows(out_buf, out, jnp.int32(i))
            if on_dispatch is not None:
                on_dispatch()
        return out_buf

    def get_chunk_tokens(self, num_frames: int) -> Optional[int]:
        """Reference get_chunk_size (llava_onevision.py:144-161):
        min(chunk_frames, T) * ceil(27/2)^2 tokens."""
        cf = self.retake.chunked_prefill_frames
        if cf is None:
            return None
        return min(cf, num_frames) * self.cfg.tokens_per_frame

    def run_vision_images(
        self, pixel_values: np.ndarray, image_sizes
    ) -> jax.Array:
        """Anyres still images (reference llava_onevision.py:383-416).

        pixel_values: [n_images, max_patches, S, S, 3] uint8 tiles (base tile
        first, then grid tiles row-major); image_sizes: [n, 2] (H, W).
        Returns the concatenated packed token streams [sum(n_tok_i), d].
        """
        from retake_tpu.models.llava_onevision import anyres

        cfg = self.cfg
        sizes = np.asarray(image_sizes).reshape(-1, 2)
        aq = self._vision_aq()
        outs = []
        for i, (oh, ow) in enumerate(sizes):
            n_patch = anyres.image_size_to_num_patches(
                (int(oh), int(ow)), cfg.image_grid_pinpoints,
                cfg.vision.image_size,
            )
            tiles = jnp.asarray(pixel_values[i][:n_patch])
            feats = _siglip_chunk(self.params, cfg.vision, tiles, aq)
            proj = siglip.multi_modal_projector(
                self.params["projector"], feats, act_quant=aq
            )  # [n_patch, grid^2, d] — images are NOT 2x2-pooled (HF parity)
            outs.append(
                anyres.pack_image_feature(
                    proj, (int(oh), int(ow)),
                    grid_side=cfg.grid_side,
                    pinpoints=cfg.image_grid_pinpoints,
                    tile_size=cfg.vision.image_size,
                    image_newline=self.params["image_newline"],
                    vision_aspect_ratio=cfg.vision_aspect_ratio,
                )
            )
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def encode_video(
        self, pixel_values_videos: np.ndarray, video_grid_thw=None,
        on_dispatch=None, _timer=None,
    ) -> VideoFeatures:
        """SigLIP tower + visual compression + projector/pool/newline as a
        question-independent reusable artifact (engine.VideoFeatures;
        ``video_grid_thw`` is unused — API symmetry with Qwen2VLEngine)."""
        from retake_tpu.utils.profiling import StageTimer

        timer = _timer or StageTimer()
        cfg, rt = self.cfg, self.retake
        t = int(pixel_values_videos.shape[0])
        with timer.stage("vision_tower"):
            features = self.run_vision(
                pixel_values_videos, on_dispatch=on_dispatch
            )
        hw = cfg.vision.num_patches
        tgt = t
        keymask_np = np.zeros(0, bool)
        if rt.visual_compression:
            with timer.stage("dpselect"):
                vc = rt.visual
                tgt = max(1, round(vc.compression_ratio * t))
                if vc.compression_method == "Keyframe":
                    if tgt == t:  # ratio 1.0: mask only, no identity
                        # gather of the multi-GB bank
                        keymask = _dpselect_mask(
                            features, t, hw, tgt, 3, vc.patch_sync
                        )
                    else:
                        features, keymask = _dpselect_gather(
                            features, t, hw, tgt, 3, vc.patch_sync
                        )
                    keymask_np = (
                        np.asarray(keymask)
                        if vc.return_keyframe_mask
                        else np.zeros(tgt * hw, bool)
                    )
                elif vc.compression_method in ("MA-LLM", "MA-LLM-hard"):
                    features = dpselect.malm_compress(
                        features.reshape(t, hw, -1), tgt,
                        sync=vc.patch_sync,
                        hard=vc.compression_method == "MA-LLM-hard",
                    )
                    keymask_np = np.zeros(tgt * hw, bool)
                else:
                    raise NotImplementedError(vc.compression_method)
        with timer.stage("projector_pool"):
            video_embeds = _project_pool_newline(
                self.params, features, cfg.grid_side, cfg.pooled_grid,
                self._vision_aq(),
            )
            features = None  # [t, 729, 1152] tower output: free 1.7 GB
            # at 1024 frames before the prefill allocates its cache
            # drain the vision queue so its intermediates actually free
            # before the prefill allocates — the host dispatches far
            # ahead and every queued stage's buffers are live at once
            # (block_until_ready is a no-op through the axon tunnel; a
            # 1-element host read is the reliable fence)
            float(video_embeds[0, 0].astype(jnp.float32))
        return VideoFeatures(
            embeds=video_embeds, keymask=keymask_np,
            t=t, tgt=tgt, hw=hw, grid=None,
        )

    def generate(
        self,
        input_ids: np.ndarray,
        pixel_values_videos: Optional[np.ndarray] = None,  # [T,384,384,3] u8
        video_grid_thw=None,  # unused (API symmetry with Qwen2VLEngine)
        max_new_tokens: Optional[int] = None,
        pixel_values: Optional[np.ndarray] = None,  # [n, p, S, S, 3] u8
        image_sizes=None,  # [n, 2] (H, W)
        video_features: Optional[VideoFeatures] = None,  # precomputed
        #   encode_video artifact (reused across questions on one video)
        prefix=None,  # captured encode_prefix artifact (engine.VideoPrefix):
        #   skip vision AND the video prefill for this question
        _prefill_only: bool = False,
        _capture_reserve: Optional[int] = None,  # encode_prefix plumbing
        on_dispatch=None,  # serving hook (see Qwen2VLEngine.generate)
    ) -> GenerationResult:
        import time

        from retake_tpu.utils.profiling import StageTimer

        timer = StageTimer()
        cfg, rt = self.cfg, self.retake
        max_new_tokens = max_new_tokens or rt.max_new_tokens
        ids = np.asarray(input_ids, dtype=np.int64).reshape(-1)
        t_start = time.perf_counter()

        image_embeds = None
        if pixel_values is not None:
            with timer.stage("vision_tower_images"):
                image_embeds = self.run_vision_images(pixel_values, image_sizes)

        video_embeds = None
        keypatch_tokens = np.zeros(len(ids), dtype=bool)
        num_frames = 0
        if prefix is not None:
            assert pixel_values_videos is None and video_features is None, (
                "generate(prefix=...) replaces both the pixels and the "
                "video_features inputs"
            )
            # metadata-only use: truncate the placeholder span the way the
            # inline path did at capture (reference llava_onevision.py:252-
            # 265); the video KV already lives in the prefix cache
            vf = prefix.features
            t, tgt = vf.t, vf.tgt
            # the placeholder-span truncation below assumes the capture's
            # frame count; a diverging prompt must fail loudly HERE
            n_vid = int(np.sum(ids == cfg.video_token_id))
            n_expected = t * cfg.tokens_per_frame + 1
            if n_vid != n_expected:
                raise PrefixMismatch(
                    f"prompt has {n_vid} video tokens but the captured "
                    f"prefix has {n_expected} (different video/frame count "
                    "under the same prefix?)"
                )
            num_frames = t
            if tgt != t:
                vi = np.where(ids == cfg.video_token_id)[0]
                keep_end = int(vi[0]) + tgt * cfg.tokens_per_frame + 1
                ids = np.concatenate([ids[:keep_end], ids[int(vi[-1]) + 1 :]])
                keypatch_tokens = np.zeros(len(ids), dtype=bool)
        if pixel_values_videos is not None:
            video_features = self.encode_video(
                pixel_values_videos, on_dispatch=on_dispatch, _timer=timer
            )
        if video_features is not None:
            vf = video_features
            video_embeds = vf.embeds
            t, tgt, keymask_np = vf.t, vf.tgt, vf.keymask
            num_frames = t
            n_video_tokens = tgt * cfg.tokens_per_frame + 1
            if tgt != t:
                # drop trailing video placeholder tokens
                # (reference llava_onevision.py:252-265)
                vi = np.where(ids == cfg.video_token_id)[0]
                removed = (t - tgt) * cfg.tokens_per_frame
                keep_end = int(vi[0]) + n_video_tokens
                ids = np.concatenate(
                    [ids[:keep_end], ids[int(vi[-1]) + 1 :]]
                )
                keypatch_tokens = np.zeros(len(ids), dtype=bool)
            vi = np.where(ids == cfg.video_token_id)[0]
            if len(keymask_np):
                # parity quirk: truncate the un-pooled [tgt*729] mask to the
                # pooled token count (reference masked_scatter semantics)
                kp = keymask_np[:n_video_tokens]
                keypatch_tokens[vi[0] : vi[0] + len(kp)] = kp

        s = len(ids)
        pos = np.broadcast_to(np.arange(s, dtype=np.int32), (3, s)).copy()
        chunk_tokens = (
            self.get_chunk_tokens(num_frames) if num_frames else None
        )
        # box + drop our references (see engine.prefill_and_decode): the
        # [t*196, d] video embeds are 1.4 GB at 1024 frames x 7B width
        ve_box, video_embeds = [video_embeds], None
        ie_box, image_embeds = [image_embeds], None
        out = prefill_and_decode(
            self.params, cfg.text, rt,
            ids=ids, pos=pos, keypatch_tokens=keypatch_tokens,
            video_embeds=ve_box, video_token_id=cfg.video_token_id,
            chunk_tokens=chunk_tokens, decode_pos_base=s,
            max_new_tokens=max_new_tokens, attn_impl=self.attn_impl,
            timer=timer, t_start=t_start,
            image_embeds=ie_box, image_token_id=cfg.image_token_id,
            cache_sharding=self.cache_sharding, act_quant=self.act_quant,
            prefill_only=_prefill_only, on_dispatch=on_dispatch,
            capture_reserve=_capture_reserve, prefix=prefix,
        )
        if _capture_reserve is not None:
            out.features = video_features  # metadata + fallback artifact
        return out

    def encode_prefix(
        self,
        input_ids: np.ndarray,
        pixel_values_videos: Optional[np.ndarray] = None,
        video_grid_thw=None,  # unused (API symmetry with Qwen2VLEngine)
        video_features: Optional[VideoFeatures] = None,
        max_new_tokens: Optional[int] = None,
        reserve_tokens: int = 512,
        on_dispatch=None,  # serving hook, forwarded to generate()
    ):
        """Capture the question-independent video prefill as an
        engine.VideoPrefix — see Qwen2VLEngine.encode_prefix."""
        return self.generate(
            input_ids, pixel_values_videos,
            max_new_tokens=max_new_tokens, video_features=video_features,
            _capture_reserve=int(reserve_tokens), on_dispatch=on_dispatch,
        )

    def generate_batch(
        self,
        requests: list,
        max_new_tokens: Optional[int] = None,
    ) -> list:
        """Sequential prefill + one batched decode (engine.decode_batch).

        Per-request ``max_new_tokens`` honored like Qwen2VLEngine: decode to
        the batch max, trim each result harvest-side (prefix-stable tokens).
        """
        default_max = max_new_tokens or self.retake.max_new_tokens
        req_max = [int(req.get("max_new_tokens") or default_max)
                   for req in requests]
        batch_max = max(req_max) if req_max else default_max
        states = [
            self.generate(**{k: v for k, v in req.items()
                             if k != "max_new_tokens"},
                          max_new_tokens=batch_max, _prefill_only=True)
            for req in requests
        ]
        # einsum decode path regardless of prefill impl — see
        # engine.decode_batch's attn_impl note
        results = decode_batch(
            self.params, self.cfg.text, self.retake, states, batch_max,
            early_stop=bool(getattr(self.retake, "decode_early_stop", False)),
            req_max=req_max,
        )
        for res, m in zip(results, req_max):
            if len(res.tokens) > m:
                res.tokens = res.tokens[:m]
        return results


def load_llava_engine(hf_path: str, rt: RetakeConfig) -> LlavaOnevisionEngine:
    from retake_tpu.models.llava_onevision import params as params_lib
    from retake_tpu.utils import checkpoint

    cfg = LlavaOnevisionConfig.from_pretrained(hf_path)
    if checkpoint.has_params(hf_path):
        # pre-quantized pytree (tools/quantize_checkpoint.py)
        return LlavaOnevisionEngine(
            cfg, checkpoint.load_checked(hf_path, rt, "llava_onevision"), rt
        )
    params = params_lib.load_safetensors(hf_path, cfg)
    if rt.quantization in ("int8", "w8a8"):
        from retake_tpu.ops.quantization import quantize_llm_int8

        params = quantize_llm_int8(params)
    if rt.quantization == "w8a8":
        # SigLIP tower + projector also run W8A8 at prefill
        from retake_tpu.ops.quantization import quantize_siglip_int8

        params = quantize_siglip_int8(params)
    return LlavaOnevisionEngine(cfg, params, rt)

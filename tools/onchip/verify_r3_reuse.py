"""Verify on the real TPU: vision-reuse (VideoFeatures) token parity +
measured per-question savings at a realistic-ish size (tiny model, big
frame count is unnecessary for parity; timing shown for context)."""
import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)
import time
import numpy as np
import jax

# fp32 token-exactness contract: TPU silently downgrades fp32 matmuls
# (CLAUDE.md); without this pin, solo-vs-served argmax flips on near-tie
# logits of the tiny random model (observed on-chip 2026-08-18).
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from retake_tpu.models.qwen2_vl import params as params_lib
from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig, Qwen2VisionConfig
from retake_tpu.runtime.engine import Qwen2VLEngine
from retake_tpu.utils.config import RetakeConfig

VIS = dict(depth=2, embed_dim=32, hidden_size=64, mlp_ratio=2, num_heads=2,
           in_channels=3, patch_size=2, spatial_merge_size=2,
           temporal_patch_size=2)
cfg = Qwen2VLConfig(
    vocab_size=512, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=4096, rope_theta=10000.0,
    mrope_section=(4, 2, 2), tie_word_embeddings=False,
    bos_token_id=0, eos_token_id=1, vision_start_token_id=3,
    vision_end_token_id=4, image_token_id=5, video_token_id=6,
    vision=Qwen2VisionConfig(**VIS),
)
params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)
rng = np.random.default_rng(3)
rt = RetakeConfig.from_dict(
    {"longvideo_kwargs": {"chunked_prefill_frames": 2, "frame_chunk_size": 2,
                          "kvcache_compression": True,
                          "kvcache_compression_kwargs": {
                              "compression_ratio": 0.6,
                              "pos_embed_reforge": True},
                          "visual_compression": True,
                          "visual_compression_kwargs": {
                              "compression_ratio": 1.0,
                              "return_keyframe_mask": True}}})
eng = Qwen2VLEngine(cfg, params, rt)
m2 = cfg.vision.spatial_merge_size ** 2
gt, gh, gw = 8, 4, 4
n_vid = gt * gh * gw // m2
pre = rng.integers(10, 500, size=3).tolist()
ids1 = np.array(pre + [3] + [6] * n_vid + [4]
                + rng.integers(10, 500, size=5).tolist(), np.int64)
ids2 = np.array(pre + [3] + [6] * n_vid + [4]
                + rng.integers(10, 500, size=9).tolist(), np.int64)
patches = rng.normal(size=(gt * gh * gw, cfg.vision.patch_input_dim)
                     ).astype(np.float32)
grid = np.array([[gt, gh, gw]])

t0 = time.perf_counter()
feats = eng.encode_video(patches, grid)
t_enc = time.perf_counter() - t0
for ids in (ids1, ids2):
    inline = eng.generate(ids, patches, grid, max_new_tokens=6)
    reused = eng.generate(ids, video_features=feats, max_new_tokens=6)
    assert list(inline.tokens) == list(reused.tokens), (
        inline.tokens, reused.tokens)
print(f"reuse parity on TPU: OK (encode {t_enc:.2f}s)", flush=True)
print("VERIFY REUSE PASS", flush=True)

"""Verify on the real TPU: online serving (start_online) + HTTP layer."""
import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)
import json
import urllib.request
import numpy as np
import jax

# fp32 token-exactness contract: TPU silently downgrades fp32 matmuls
# (CLAUDE.md); without this pin, solo-vs-served argmax flips on near-tie
# logits of the tiny random model (observed on-chip 2026-08-18).
jax.config.update("jax_default_matmul_precision", "highest")
print("devices:", jax.devices(), flush=True)
import jax.numpy as jnp
from retake_tpu.models.qwen2_vl import params as params_lib
from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig, Qwen2VisionConfig
from retake_tpu.runtime.engine import Qwen2VLEngine
from retake_tpu.runtime.serve import ContinuousServer
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
rng = np.random.default_rng(7)


def make_req(grid_t=2, prompt_len=5):
    m2 = cfg.vision.spatial_merge_size ** 2
    n_vid = grid_t * 16 // m2
    pre = rng.integers(10, 500, size=3).tolist()
    post = rng.integers(10, 500, size=prompt_len).tolist()
    ids = np.array(pre + [3] + [6] * n_vid + [4] + post, dtype=np.int64)
    patches = rng.normal(size=(grid_t * 16, cfg.vision.patch_input_dim)
                         ).astype(np.float32)
    return dict(input_ids=ids, pixel_values_videos=patches,
                video_grid_thw=np.array([[grid_t, 4, 4]]))


rt = RetakeConfig.from_dict(
    {"longvideo_kwargs": {"chunked_prefill_frames": 2, "frame_chunk_size": 2,
                          "kvcache_compression": True,
                          "kvcache_compression_kwargs": {
                              "compression_ratio": 0.6,
                              "pos_embed_reforge": True}}})
engine = Qwen2VLEngine(cfg, params, rt)
reqs = [make_req(2 + 2 * (i % 2), 4 + i) for i in range(4)]
seq = [engine.generate(**r, max_new_tokens=9) for r in reqs]
server = ContinuousServer(engine, batch_slots=2, segment_steps=3,
                          max_new_tokens=9, gap_capacity=6)
with server.start_online() as h:
    futs = [h.submit(r) for r in reqs[:2]]
    r0 = futs[0].result(timeout=600)
    futs += [h.submit(r) for r in reqs[2:]]
    results = [r0] + [f.result(timeout=600) for f in futs[1:]]
for res, s in zip(results, seq):
    np.testing.assert_array_equal(res.tokens, s.tokens)
print("online serve on TPU: OK", flush=True)
print("VERIFY ONLINE PASS", flush=True)

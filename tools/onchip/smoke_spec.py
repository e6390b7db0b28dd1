import sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__)))))
import jax

# fp32 token-exactness contract: TPU silently downgrades fp32 matmuls
# (CLAUDE.md); without this pin, solo-vs-served argmax flips on near-tie
# logits of the tiny random model (observed on-chip 2026-08-18).
jax.config.update("jax_default_matmul_precision", "highest")
import dataclasses
import numpy as np
import jax.numpy as jnp
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


def make_req(grid_t=4, prompt_len=5, seed=None):
    r = np.random.default_rng(seed) if seed is not None else rng
    m2 = cfg.vision.spatial_merge_size ** 2
    n_vid = grid_t * 16 // m2
    pre = r.integers(10, 500, size=3).tolist()
    post = r.integers(10, 500, size=prompt_len).tolist()
    ids = np.array(pre + [3] + [6] * n_vid + [4] + post, dtype=np.int64)
    patches = r.normal(size=(grid_t * 16, cfg.vision.patch_input_dim)
                       ).astype(np.float32)
    return ids, patches, np.array([[grid_t, 4, 4]])


base_lv = {"chunked_prefill_frames": 2, "frame_chunk_size": 2,
           "kvcache_compression": True,
           "kvcache_compression_kwargs": {"compression_ratio": 0.6,
                                          "pos_embed_reforge": True}}
rt = RetakeConfig.from_dict({"longvideo_kwargs": base_lv})
rt_spec = dataclasses.replace(rt, spec_decode=True)
eng = Qwen2VLEngine(cfg, params, rt)
eng_s = Qwen2VLEngine(cfg, params, rt_spec)

for seed in range(6):
    ids, patches, grid = make_req(seed=seed)
    for mn in (9, 33):
        a = eng.generate(ids, patches, grid, max_new_tokens=mn)
        b = eng_s.generate(ids, patches, grid, max_new_tokens=mn)
        sps = (b.stages or {}).get("spec_tokens_per_step")
        assert list(a.tokens) == list(b.tokens), (
            seed, mn, a.tokens, b.tokens)
        print(f"seed={seed} max_new={mn}: OK tok/step={sps} "
              f"len={len(a.tokens)}", flush=True)

# EOS case: rebind eos to an emitted token so the stream stops early
a = eng.generate(ids, patches, grid, max_new_tokens=33)
eos2 = int(a.tokens[5])
cfg2 = dataclasses.replace(cfg, eos_token_id=eos2)
e2 = Qwen2VLEngine(cfg2, params, rt)
e2s = Qwen2VLEngine(cfg2, params, rt_spec)
x = e2.generate(ids, patches, grid, max_new_tokens=33)
y = e2s.generate(ids, patches, grid, max_new_tokens=33)
assert list(x.tokens) == list(y.tokens), (x.tokens, y.tokens)
assert len(x.tokens) < 33
print("EOS early stop: OK", len(x.tokens))
print("SPEC SMOKE PASS")

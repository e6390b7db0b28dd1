"""Benchmark: ReTaKe-TPU chunked prefill vs naive full-KV-cache baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol (mirrors the reference's TTFT measurement, scripts/utils/cal_ttft.py:
211-231 — wall time to first token, compile/warmup excluded):
  * Model: Qwen2-VL-2B geometry (28 layers, hidden 1536, GQA 12q/2kv, full
    so400m-scale ViT), random bf16 weights — 2B is the largest Qwen2-VL
    variant whose *naive full-cache baseline* fits one 16 GB v5e chip.
  * Input: 2048 frames at 448x252 (grid 1024x32x18 -> 147k video tokens).
  * ReTaKe path: demo config (DPSelect keyframe mask, chunked prefill 32
    frames, PivotKV to 32k tokens, pos reforge, YaRN x4).
  * Baselines — a ladder of three "naive full-KV-cache" definitions (see
    NAIVE_ARM_CONFIGS), each run in its own subprocess:
      naive_literal   — one forward, full cache, materializing XLA attention
                        (expected DNF at 2048 frames; bisected to its max)
      naive_unchunked — one forward, full cache, our flash kernel
                        (primary vs_baseline denominator)
      naive_chunked   — chunked prefill + flash + full cache (conservative
                        rounds-1/2 arm; chunking is a ReTaKe contribution)
  * value = prefill frames/sec/chip for the ReTaKe path;
    vs_baseline = retake fps / naive_unchunked fps (falls back to
    naive_chunked if the unchunked arm cannot run).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


NUM_FRAMES = 2048
GRID_H, GRID_W = 32, 18  # 448x252 / 14


def build_model():
    import jax.numpy as jnp

    from retake_tpu.models.qwen2_vl import params as params_lib
    from retake_tpu.models.qwen2_vl.config import (
        Qwen2VisionConfig,
        Qwen2VLConfig,
    )

    cfg = Qwen2VLConfig(
        vocab_size=151936,
        hidden_size=1536,
        intermediate_size=8960,
        num_hidden_layers=28,
        num_attention_heads=12,
        num_key_value_heads=2,
        tie_word_embeddings=True,
        vision=Qwen2VisionConfig(hidden_size=1536),  # 2B merger output dim
    )
    params = params_lib.init_params(cfg, seed=0, dtype=jnp.bfloat16)
    return cfg, params


def build_request(cfg, num_frames=NUM_FRAMES):
    grid_t = num_frames // cfg.vision.temporal_patch_size
    n_video_tokens = grid_t * GRID_H * GRID_W // cfg.vision.spatial_merge_size**2
    rng = np.random.default_rng(0)
    pre = rng.integers(10, 1000, size=16).tolist()
    post = rng.integers(10, 1000, size=48).tolist()  # the "question"
    ids = np.array(
        pre
        + [cfg.vision_start_token_id]
        + [cfg.video_token_id] * n_video_tokens
        + [cfg.vision_end_token_id]
        + post,
        dtype=np.int64,
    )
    # synthetic pixels generated ON DEVICE: this host's memory is so slow that
    # materializing ~1.4 GB in numpy takes tens of minutes
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _gen_patches():
        raw = jax.random.randint(
            jax.random.key(0),
            (grid_t * GRID_H * GRID_W, cfg.vision.patch_input_dim),
            0, 255, dtype=jnp.int32,
        )
        return ((raw.astype(jnp.float32) - 127.5) / 64.0).astype(jnp.bfloat16)

    patches = _gen_patches()
    grid = np.array([[grid_t, GRID_H, GRID_W]])
    return ids, patches, grid


RETAKE_CONFIG = {
    "scaling_factor": 4,
    "longvideo_kwargs": {
        "frame_chunk_size": 128,
        "chunked_prefill_frames": 32,
        "visual_compression": True,
        "visual_compression_kwargs": {
            "compression_ratio": 1.0,
            "compression_method": "Keyframe",
            "patch_sync": False,
            "return_keyframe_mask": True,
        },
        "kvcache_compression": True,
        "kvcache_compression_kwargs": {
            "dynamic_compression_ratio": True,
            "compression_method": "pivotkv",
            "pos_embed_reforge": True,
            "max_input_length": 32000,
        },
    },
}

# Baseline ladder — three definitions of "naive full-KV-cache JAX baseline",
# weakest claim first. Chunked prefill is itself one of ReTaKe's
# contributions (SURVEY.md §5), so the honest primary baseline is the
# UNCHUNKED one; the chunked variant is kept as the conservative arm
# (continuity with rounds 1-2, and it is the strongest baseline that can be
# built without PivotKV/DPSelect).
#
# naive_literal: what a JAX user writes without any long-video work — ONE
# forward over the whole sequence, full cache, straightforward masked-einsum
# attention (materializes [H, S, S] scores). ViT still runs in chunks
# because an unchunked so400m ViT over 1.18M patches OOMs on its own.
NAIVE_LITERAL_CONFIG = {
    "scaling_factor": 4,
    "attn_implementation": "xla",
    "longvideo_kwargs": {"frame_chunk_size": 128},
}
# naive_unchunked: the literal arm upgraded with our Pallas flash kernel so
# attention does not materialize — still one forward, still a full cache,
# no chunked prefill, no compression.
NAIVE_UNCHUNKED_CONFIG = {
    "scaling_factor": 4,
    "longvideo_kwargs": {"frame_chunk_size": 128},
}
# naive_chunked (conservative, rounds 1-2 "vs_baseline" arm): chunked
# prefill + flash + full cache — already has two ReTaKe/TPU contributions.
BASELINE_CONFIG = {
    "scaling_factor": 4,
    "longvideo_kwargs": {
        "frame_chunk_size": 128,
        "chunked_prefill_frames": 32,
    },
}

NAIVE_ARM_CONFIGS = {
    "naive_literal": NAIVE_LITERAL_CONFIG,
    "naive_unchunked": NAIVE_UNCHUNKED_CONFIG,
    "naive_chunked": BASELINE_CONFIG,
}


def run_arm(arm: str, frames: int) -> dict:
    """Run one baseline arm in THIS process; returns a result dict.

    Meant to be called in a fresh subprocess (see run_arm_subprocess): an
    arm that OOMs leaves the TPU server's HBM poisoned for in-process
    follow-ups, and the axon server frees a dead client's HBM on its own."""
    from retake_tpu.runtime.engine import Qwen2VLEngine
    from retake_tpu.utils.config import RetakeConfig

    _wait_for_hbm(8)
    cfg, params = build_model()
    ids, patches, grid = build_request(cfg, num_frames=frames)
    engine = Qwen2VLEngine(
        cfg, params, RetakeConfig.from_dict(NAIVE_ARM_CONFIGS[arm])
    )
    try:
        t = time_prefill(engine, ids, patches, grid)
    except Exception as e:  # noqa: BLE001 — OOM/compile failure IS the datum
        import re

        msg = re.sub(r"\x1b\[[0-9;]*m", "", str(e))  # strip tunnel ANSI
        msg = " ".join(msg.split())[:160]
        return {
            "arm": arm, "frames": frames, "ok": False,
            "error": f"{type(e).__name__}: {msg}",
        }
    return {
        "arm": arm, "frames": frames, "ok": True,
        "ttft_s": round(t, 3), "fps": round(frames / t, 2),
    }


def run_arm_subprocess(arm: str, frames: int, timeout_s: int = 2400) -> dict:
    """Run one arm as `python bench.py --arm <arm> --frames <n>` and parse
    the last stdout line as JSON."""
    import os
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__),
           "--arm", arm, "--frames", str(frames)]
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return {"arm": arm, "frames": frames, "ok": False,
                "error": f"timeout after {timeout_s}s"}
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    if out.returncode != 0 or not lines:
        tail = (out.stderr or out.stdout or "")[-300:]
        return {"arm": arm, "frames": frames, "ok": False,
                "error": f"rc={out.returncode}: {tail}"}
    try:
        return json.loads(lines[-1])
    except json.JSONDecodeError:
        return {"arm": arm, "frames": frames, "ok": False,
                "error": f"unparseable output: {lines[-1][:200]}"}


def time_prefill(engine, ids, patches, grid, runs=2):
    """First run compiles; report the best of the remaining runs (cal_ttft
    protocol: discard the first)."""
    times = []
    for i in range(runs):
        r = engine.generate(ids, patches, grid, max_new_tokens=1)
        times.append(r.prefill_seconds)
    return min(times[1:]) if len(times) > 1 else times[0]


def profile_prefill(engine, ids, patches, grid):
    """One profiled pass -> per-stage seconds (fences at stage boundaries add
    a little overhead, so the headline TTFT comes from unprofiled runs and
    this pass only supplies the vision/LLM decomposition)."""
    import os

    os.environ["RETAKE_PROFILE"] = "1"
    try:
        r = engine.generate(ids, patches, grid, max_new_tokens=1)
    finally:
        os.environ["RETAKE_PROFILE"] = "0"
    st = r.stages or {}
    llm = st.get("prefill_chunks", 0.0) + st.get("first_token", 0.0)
    return {
        "vision_s": round(st.get("vision_tower", 0.0), 3),
        "dpselect_s": round(st.get("dpselect", 0.0), 3),
        "llm_prefill_s": round(llm, 3),
    }, r.cache_len


def bench_7b_int8():
    """Flagship: Qwen2-VL-7B geometry, W8A8 int8, 2048 frames, one chip.

    The naive full-cache baseline cannot run here at all — 7B params alone
    exceed 16 GB in bf16 and its 147k-token cache adds 8.6 GB — which is the
    memory claim ReTaKe makes (README.md:3 '8x longer ... same memory
    budget'). int8 weights are required to fit; W8A8 additionally runs the
    prefill linears on the MXU's double-rate int8 path (decode stays exact
    weight-only). Returns (ttft_seconds, decode_ms_per_token) or None on OOM.
    """
    import gc

    import jax

    try:
        from retake_tpu.models.qwen2_vl import params as params_lib
        from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig
        from retake_tpu.runtime.engine import Qwen2VLEngine
        from retake_tpu.utils.config import RetakeConfig

        cfg = Qwen2VLConfig()  # 7B defaults
        params = params_lib.init_params(
            cfg, seed=0, quantize_int8=True, quantize_vit_int8=True
        )
        ids, patches, grid = build_request(cfg)
        retake_7b = json.loads(json.dumps(RETAKE_CONFIG))
        retake_7b["quantization"] = "w8a8"
        # smaller ViT chunks: at 7B the parameter-resident HBM leaves less
        # headroom for vision activations
        retake_7b["longvideo_kwargs"]["frame_chunk_size"] = 64
        engine = Qwen2VLEngine(
            cfg, params, RetakeConfig.from_dict(retake_7b)
        )
        # run 1 compiles prefill AND the decode loop; run 2 is the measurement
        engine.generate(ids, patches, grid, max_new_tokens=33)
        r = engine.generate(ids, patches, grid, max_new_tokens=33)
        tpot = r.decode_seconds / max(len(r.tokens) - 1, 1) * 1000
        t = r.prefill_seconds
        del engine, params
        gc.collect()
        return t, tpot
    except Exception as e:  # noqa: BLE001 — report partial results
        print(f"# 7b-int8 flagship skipped: {type(e).__name__}: {e}",
              flush=True)
        return None


def run_flagship_7b_int8kv(frames: int = NUM_FRAMES) -> dict:
    """Best-config 7B flagship arm: W8A8 + int8 KV cache at 2048 frames.

    Round-4 VERDICT #5: the repo's best 7B configuration (kv_cache_dtype:
    int8 — decode cache reads halve; measured TPOT 14.6 -> 13.2 ms in round
    2) lived only in prose. This arm records it in the bench artifact.
    Accuracy-gated like w8a8 (tools/first_checkpoint_gate.py); detail-only.
    Run in a fresh subprocess — 7B pins most of HBM."""
    try:
        from retake_tpu.models.qwen2_vl import params as params_lib
        from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig
        from retake_tpu.runtime.engine import Qwen2VLEngine
        from retake_tpu.utils.config import RetakeConfig

        _wait_for_hbm()
        cfg = Qwen2VLConfig()  # 7B defaults
        params = params_lib.init_params(
            cfg, seed=0, quantize_int8=True, quantize_vit_int8=True
        )
        ids, patches, grid = build_request(cfg, num_frames=frames)
        rt = json.loads(json.dumps(RETAKE_CONFIG))
        rt["quantization"] = "w8a8"
        rt["kv_cache_dtype"] = "int8"
        rt["longvideo_kwargs"]["frame_chunk_size"] = 64
        engine = Qwen2VLEngine(cfg, params, RetakeConfig.from_dict(rt))
        engine.generate(ids, patches, grid, max_new_tokens=33)  # compile
        r = engine.generate(ids, patches, grid, max_new_tokens=33)
        tpot = r.decode_seconds / max(len(r.tokens) - 1, 1) * 1000
        return {"arm": "flagship_7b_int8kv", "frames": frames, "ok": True,
                "ttft_s": round(r.prefill_seconds, 3),
                "tpot_ms": round(tpot, 2)}
    except Exception as e:  # noqa: BLE001 — detail arm, degrade to a note
        return {"arm": "flagship_7b_int8kv", "frames": frames, "ok": False,
                "error": f"{type(e).__name__}: {str(e)[:160]}"}


def run_llava_1024f(frames: int = 1024) -> dict:
    """LLaVA-Video 7B at the reference's FULL videomme operating point:
    1024 frames (~201k tokens), 40k PivotKV cache
    (configs/llava_video/retake_llava-video_videomme.yaml — reference
    values), W8A8 + int8 KV on one 16 GB v5e. bf16-KV tops out at 768
    frames on this chip, so int8 KV is what makes the reference's own
    headline config reachable at all (docs/architecture.md, long-video
    memory discipline). chunked_prefill_frames 16: measured 52.4 s vs
    77.6 s at the reference's 32 (round-2, on-chip). Fresh subprocess."""
    try:
        import jax
        import jax.numpy as jnp

        from retake_tpu.models.llava_onevision import params as lparams
        from retake_tpu.models.llava_onevision.config import (
            LlavaOnevisionConfig,
        )
        from retake_tpu.runtime.llava_engine import LlavaOnevisionEngine
        from retake_tpu.utils.config import RetakeConfig

        _wait_for_hbm()
        cfg = LlavaOnevisionConfig()  # 7B text + so400m SigLIP defaults
        params = lparams.init_params(
            cfg, seed=0, quantize_int8=True, quantize_vision_int8=True
        )
        n_tok = frames * cfg.tokens_per_frame + 1  # +1 image_newline
        rng = np.random.default_rng(0)
        pre = rng.integers(10, 1000, size=16).tolist()
        post = rng.integers(10, 1000, size=48).tolist()
        ids = np.array(
            pre + [cfg.video_token_id] * n_tok + post, dtype=np.int64
        )
        s = cfg.vision.image_size

        @jax.jit
        def _gen_frames():  # device-side: host numpy is ~5 MB/s here
            return jax.random.randint(
                jax.random.key(0), (frames, s, s, 3), 0, 255, dtype=jnp.int32
            ).astype(jnp.uint8)

        vid = _gen_frames()
        rt = {
            "scaling_factor": 4,
            "quantization": "w8a8",
            "kv_cache_dtype": "int8",
            "longvideo_kwargs": {
                "frame_chunk_size": 32,
                "chunked_prefill_frames": 16,
                "visual_compression": True,
                "visual_compression_kwargs": {
                    "compression_ratio": 1.0,
                    "compression_method": "Keyframe",
                    "patch_sync": False,
                    "return_keyframe_mask": True,
                },
                "kvcache_compression": True,
                "kvcache_compression_kwargs": {
                    "dynamic_compression_ratio": True,
                    "compression_method": "pivotkv",
                    "pos_embed_reforge": True,
                    "max_input_length": 40000,
                },
            },
        }
        engine = LlavaOnevisionEngine(cfg, params, RetakeConfig.from_dict(rt))
        engine.generate(ids, vid, max_new_tokens=33)  # compile
        r = engine.generate(ids, vid, max_new_tokens=33)
        tpot = r.decode_seconds / max(len(r.tokens) - 1, 1) * 1000
        return {"arm": "llava_1024f_int8kv", "frames": frames, "ok": True,
                "tokens": int(n_tok), "ttft_s": round(r.prefill_seconds, 3),
                "tpot_ms": round(tpot, 2)}
    except Exception as e:  # noqa: BLE001 — detail arm, degrade to a note
        return {"arm": "llava_1024f_int8kv", "frames": frames, "ok": False,
                "error": f"{type(e).__name__}: {str(e)[:160]}"}


SPECIAL_ARMS = {
    "flagship_7b_int8kv": run_flagship_7b_int8kv,
    "llava_1024f_int8kv": run_llava_1024f,
}


def bench_batch_decode(engine, cfg, n_requests=4, max_new=64):
    """Batched-serving decode throughput at 2B: n small (64-frame) requests,
    sequential prefill + one vmapped decode (engine.generate_batch).
    Returns (aggregate tok/s batched, single-request tok/s)."""
    reqs = []
    for i in range(n_requests):
        ids, patches, grid = build_request(cfg, num_frames=64)
        reqs.append(
            dict(input_ids=ids, pixel_values_videos=patches,
                 video_grid_thw=grid)
        )
    single = engine.generate(**reqs[0], max_new_tokens=max_new)  # compile
    single = engine.generate(**reqs[0], max_new_tokens=max_new)
    engine.generate_batch(reqs, max_new_tokens=max_new)  # compile
    batch = engine.generate_batch(reqs, max_new_tokens=max_new)
    n_tok = sum(len(b.tokens) - 1 for b in batch)
    tok_s_batch = n_tok / max(batch[0].decode_seconds, 1e-9)
    tok_s_single = (len(single.tokens) - 1) / max(single.decode_seconds, 1e-9)
    return tok_s_batch, tok_s_single


def _wait_for_hbm(gb: int = 12, timeout_s: int = 1200) -> None:
    """The TPU server releases a previous client's HBM asynchronously; poll
    until a large allocation succeeds so back-to-back runs don't OOM."""
    import gc

    import jax
    import jax.numpy as jnp

    deadline = time.time() + timeout_s
    while True:
        try:
            x = jnp.zeros((gb * (1 << 29),), jnp.bfloat16)
            float(x[0].astype(jnp.float32))
            del x
            gc.collect()
            return
        except Exception:
            if time.time() > deadline:
                print(f"# warning: {gb} GB HBM not free after {timeout_s}s",
                      flush=True)
                return
            jax.clear_caches()
            gc.collect()
            time.sleep(15)


def bench_naive_arms() -> dict:
    """Measure the baseline ladder in fresh subprocesses (each arm owns the
    whole chip; an OOM arm cannot poison the next one's HBM).

    Both unchunked arms are expected to OOM at 2048 frames (measured:
    naive_literal materializes [H, 147k, 155k] attention scores;
    naive_unchunked's single-forward activations — 2x [147k, 8960] MLP
    transients + the 4.5 GB full cache — exceed 16 GB even with flash
    attention). Each failing arm is bisected down to the largest frame
    count it can run at all, so its per-frame ceiling is on record."""

    def measure(arm, fallbacks):
        res = run_arm_subprocess(arm, NUM_FRAMES, timeout_s=1800)
        if not res.get("ok"):
            res["tried_frames"] = [NUM_FRAMES]
            for f in fallbacks:
                res["tried_frames"].append(f)
                sub = run_arm_subprocess(arm, f, timeout_s=1800)
                if sub.get("ok"):
                    res["max_frames_ok"] = f
                    res["ttft_s_at_max"] = sub["ttft_s"]
                    res["fps_at_max"] = sub["fps"]
                    break
        return res

    # fallback points = each arm's measured max (2026-08-17 ladder: literal
    # compiles/fits only to 64 frames — 128f RESOURCE_EXHAUSTED, 256f+ kill
    # the compiler outright; unchunked-flash fits to 1536 frames — 18.5 s,
    # 82.9 fps; one point each keeps the driver-run bench bounded)
    return {
        "naive_unchunked": measure("naive_unchunked", (1536,)),
        "naive_literal": measure("naive_literal", (64,)),
    }


def main():
    import gc

    import jax

    from retake_tpu.runtime.engine import Qwen2VLEngine
    from retake_tpu.utils.config import RetakeConfig

    # baseline ladder first, in clean subprocesses (parent holds no HBM yet)
    naive_arms = bench_naive_arms()
    print(f"# naive arms: {json.dumps(naive_arms)}", flush=True)

    # flagship next: 7B-int8 needs a clean 16 GB HBM
    _wait_for_hbm()
    seven_b = bench_7b_int8()
    jax.clear_caches()
    gc.collect()

    # best-config detail arms, each in a fresh subprocess (7B/LLaVA pin most
    # of HBM; a dead client's HBM is freed by the axon server on its own)
    seven_b_int8kv = run_arm_subprocess(
        "flagship_7b_int8kv", NUM_FRAMES, timeout_s=2400
    )
    print(f"# flagship_7b_int8kv: {json.dumps(seven_b_int8kv)}", flush=True)
    llava_arm = run_arm_subprocess("llava_1024f_int8kv", 1024, timeout_s=3000)
    print(f"# llava_1024f_int8kv: {json.dumps(llava_arm)}", flush=True)
    _wait_for_hbm(8)

    cfg, params = build_model()
    ids, patches, grid = build_request(cfg)

    retake_engine = Qwen2VLEngine(cfg, params, RetakeConfig.from_dict(RETAKE_CONFIG))
    t_retake = time_prefill(retake_engine, ids, patches, grid)
    stages_retake, cache_retake = profile_prefill(retake_engine, ids, patches, grid)
    tok_s_batch, tok_s_single = bench_batch_decode(retake_engine, cfg)

    # cross-question prefill reuse (engine.VideoPrefix): the eval protocol
    # asks ~3 questions per video and, with prompt_guided_compression off,
    # the WHOLE prefill through the last video chunk is question-independent
    # — not just the vision stage. Capture once; each question then pays
    # only the trailing text segment + first token (token-exact or a loud
    # PrefixMismatch — tests/test_prefix_reuse.py). Questions here share the
    # leader's 48-token length, so the dynamic compression ratio resolves to
    # the same plan and reuse is guaranteed (the eval runner falls back to
    # VideoFeatures reuse on mismatch).
    t_capture = t_suffix = None
    try:
        t0 = time.perf_counter()
        vp = retake_engine.encode_prefix(ids, patches, grid)
        t_capture = time.perf_counter() - t0
        rngq = np.random.default_rng(1)
        vid_end = int(np.where(ids == cfg.vision_end_token_id)[0][0])
        for rep in range(2):  # rep 0 compiles the suffix step; rep 1 times
            q = rngq.integers(10, 1000, size=48)
            ids_q = np.concatenate([ids[: vid_end + 1], q.astype(np.int64)])
            r = retake_engine.generate(ids_q, prefix=vp, max_new_tokens=1)
            t_suffix = r.prefill_seconds
        del vp
        gc.collect()
    except Exception as e:  # noqa: BLE001
        print(f"# prefix-reuse arm skipped: {type(e).__name__}: {e}",
              flush=True)

    # lossy TPU-native arm, detail-only (the headline A/B stays bf16 for
    # protocol parity): same request, W8A8 prefill linears + int8-ViT on the
    # MXU double-rate path. Accuracy must clear tools/first_checkpoint_gate
    # before production use — no checkpoints exist in this image.
    t_retake_w8a8 = None
    try:
        from retake_tpu.ops.quantization import (
            quantize_llm_int8,
            quantize_vit_int8,
        )

        params_q = dict(quantize_llm_int8(params))
        params_q["visual"] = quantize_vit_int8(params_q["visual"])
        rt_q = json.loads(json.dumps(RETAKE_CONFIG))
        rt_q["quantization"] = "w8a8"
        eng_q = Qwen2VLEngine(cfg, params_q, RetakeConfig.from_dict(rt_q))
        t_retake_w8a8 = time_prefill(eng_q, ids, patches, grid)
        del eng_q, params_q
        gc.collect()
    except Exception as e:  # noqa: BLE001
        print(f"# w8a8 2B arm skipped: {type(e).__name__}: {e}", flush=True)
    # 2x the headline length: the compressed cache stays at 32k so frames/s
    # holds, while the naive full-cache arm (8.5 GB cache + params + embeds
    # + activations) exceeds 16 GB HBM outright — the reference's "longer
    # video under the same memory budget" claim (README.md:3), measured
    ids4, patches4, grid4 = build_request(cfg, num_frames=2 * NUM_FRAMES)
    t_retake_4k = time_prefill(retake_engine, ids4, patches4, grid4)
    del retake_engine, ids4, patches4

    base_engine = Qwen2VLEngine(cfg, params, RetakeConfig.from_dict(BASELINE_CONFIG))
    t_base = time_prefill(base_engine, ids, patches, grid)
    stages_base, cache_base = profile_prefill(base_engine, ids, patches, grid)
    del base_engine, params

    fps_retake = NUM_FRAMES / t_retake
    fps_base = NUM_FRAMES / t_base
    # primary baseline: the unchunked naive arm (chunked prefill is a ReTaKe
    # contribution, SURVEY.md §5 — the chunked arm is kept as the
    # conservative rounds-1/2 ratio). Measured: BOTH unchunked naive arms
    # DNF (RESOURCE_EXHAUSTED) at 2048 frames on 16 GB, so the true naive
    # ratio at the headline operating point is unbounded; vs_baseline then
    # falls back to the chunked arm — a finite, conservative lower bound
    # against a baseline that already borrows ReTaKe's chunking.
    nu = naive_arms.get("naive_unchunked", {})
    fps_naive_primary = nu["fps"] if nu.get("ok") else fps_base
    # LLM-prefill-only A/B (vision excluded from both arms): the ViT is a
    # large common additive term, so the end-to-end ratio understates the
    # algorithmic speedup where PivotKV actually acts
    llm_r = max(stages_retake["llm_prefill_s"], 1e-9)
    llm_b = stages_base["llm_prefill_s"]
    detail = {
        "ttft_retake_s": round(t_retake, 3),
        "ttft_naive_full_cache_s": round(t_base, 3),
        "baseline_arms": {
            "naive_literal": {
                "definition": (
                    "one forward over the whole sequence, full KV cache, "
                    "masked-einsum XLA attention (what a JAX port without "
                    "any long-video work computes); ViT chunked so the arm "
                    "runs at all"
                ),
                **naive_arms.get("naive_literal", {}),
            },
            "naive_unchunked": {
                "definition": (
                    "one forward, full KV cache, our Pallas flash kernel "
                    "(no chunked prefill / DPSelect / PivotKV) -- the "
                    "primary vs_baseline denominator"
                ),
                **nu,
            },
            "naive_chunked": {
                "definition": (
                    "chunked prefill (itself a ReTaKe contribution) + flash "
                    "+ full cache -- conservative rounds-1/2 arm"
                ),
                "ok": True, "frames": NUM_FRAMES,
                "ttft_s": round(t_base, 3), "fps": round(fps_base, 2),
            },
        },
        "vs_naive_chunked": round(fps_retake / fps_base, 3),
        # measured tools/overlap_ablation.py (2026-08-17): interleaving ViT
        # chunks with LLM chunk steps recovers -0.1% — one v5e core runs one
        # program at a time, so the r2-VERDICT "hide the ViT behind the LLM
        # prefill" item is physically closed; TTFT floor = sum of stage
        # device times. Further TTFT cuts need less WORK (W8A8 below), not
        # dispatch reordering.
        "overlap_note": "vit+llm interleaved dispatch = serial sum "
                        "(-0.1% measured); single-core TPU serializes",
        "baseline_note": (
            "vs_baseline uses the strongest naive arm that RUNS at 2048 "
            "frames. Both honest naive arms (no chunked prefill) DNF with "
            "RESOURCE_EXHAUSTED at 2048f on 16 GB, i.e. the naive "
            "full-KV-cache baseline's frames/s at the headline operating "
            "point is 0 and the true ratio is unbounded; the finite "
            "vs_baseline is measured against a baseline already containing "
            "ReTaKe's chunked prefill."
            if not nu.get("ok") else
            "vs_baseline = retake fps / unchunked-naive fps at 2048 frames"
        ),
        "model": "qwen2-vl-2b-geometry(random bf16)",
        "frames": NUM_FRAMES,
        "stages_retake": stages_retake,
        "stages_naive": stages_base,
        "vs_baseline_llm_prefill_only": round(llm_b / llm_r, 3),
        # vision reuse (engine.encode_video / reuse_video_features): the
        # eval benchmarks ask ~3 questions per video and the vision stage
        # (tower AND DPSelect) is question-independent, so the amortized
        # per-question TTFT at the benchmark workload is
        # (vit + dpselect)/3 + llm (derived from the measured stage times
        # above; token-exact — tests/test_engine.py)
        "ttft_amortized_3q_reuse_s": round(
            (stages_retake["vision_s"] + stages_retake["dpselect_s"]) / 3
            + llm_r, 3
        ),
        "kv_cache_tokens_retake": int(cache_retake),
        "kv_cache_tokens_naive": int(cache_base),
        # the reference's headline claim is the memory budget (README.md:3)
        "kv_cache_reduction": round(cache_base / max(cache_retake, 1), 2),
        # batched serving (generate_batch): decode is HBM-bound, so batching
        # requests into one scanned gap-layout loop multiplies tokens/s
        "decode_tok_s_single": round(tok_s_single, 1),
        "decode_tok_s_batch4": round(tok_s_batch, 1),
        "ttft_retake_4096f_s": round(t_retake_4k, 3),
        "frames_per_sec_4096f": round(2 * NUM_FRAMES / t_retake_4k, 2),
        "note_4096": (
            "naive full-cache arm cannot run 4096 frames at all on 16 GB "
            "(RESOURCE_EXHAUSTED; 8.5 GB KV alone) — retake holds the same "
            "frames/s with the cache still capped at 32k"
        ),
    }
    if t_suffix is not None:
        # cross-question prefill reuse (VideoPrefix): capture once per
        # video, pay only the trailing text segment per question
        detail["prefix_capture_s"] = round(t_capture, 3)
        detail["prefix_suffix_ttft_s"] = round(t_suffix, 3)
        detail["ttft_amortized_3q_prefix_s"] = round(
            (t_capture + 3 * t_suffix) / 3, 3
        )
        detail["note_prefix"] = (
            "VideoPrefix reuse (token-exact, engine-validated): amortized "
            "per-question TTFT at the 3-questions-per-video eval workload "
            "= (capture + 3*suffix)/3; supersedes the vision-only "
            "ttft_amortized_3q_reuse_s"
        )
    # ViT stage speed-of-light accounting (tools/vit_bisect.py on-chip
    # 2026-08-19, 2B geometry, 128-frame chunk): vision_tower 783.4 ms vs
    # 803.2 ms analytic matmul floor (101.2 TF total = 94.3 linear + 7.0
    # attn at the measured 126 TF/s bf16 ceiling) = 0.98x, i.e. 103% of the
    # 8k^3-calibrated ceiling at these shapes. The XLA-SDPA ablation arm
    # costs 1675.6 ms — the Pallas vit_attention kernel saves 2.1x. The
    # 2048f vision stage is provably at speed of light; like the LLM chunk
    # step (tools/llm_bisect.py), further TTFT cuts are algorithmic only.
    detail["vit_floor_note"] = (
        "vision_tower 783 ms/128f-chunk vs 803 ms analytic matmul floor "
        "(0.98x; tools/vit_bisect.py) — at SOL; XLA-SDPA arm 1676 ms"
    )
    if t_retake_w8a8 is not None:
        detail["ttft_retake_w8a8_s"] = round(t_retake_w8a8, 3)
        detail["frames_per_sec_w8a8"] = round(NUM_FRAMES / t_retake_w8a8, 2)
        detail["note_w8a8"] = (
            "lossy int8-activation arm (accuracy gate: "
            "tools/first_checkpoint_gate.py); headline value/vs_baseline "
            "stay bf16 for protocol parity"
        )
    if seven_b is not None:
        detail["ttft_7b_w8a8_s"] = round(seven_b[0], 3)
        detail["tpot_7b_int8_ms"] = round(seven_b[1], 2)
        detail["note_7b"] = (
            "7B @2048 frames on ONE 16GB v5e via int8 weights (W8A8 prefill "
            "on the MXU int8 path); the naive full-cache baseline cannot "
            "run at this scale at all"
        )
    # best-config arms (round-4 VERDICT #5): the flip-ready numbers carried
    # by the bench artifact, not prose. Both accuracy-gated
    # (tools/first_checkpoint_gate.py) like the w8a8 arm above.
    detail["flagship_7b_int8kv"] = {
        **seven_b_int8kv,
        "note": "7B best config: W8A8 + kv_cache_dtype int8 (halved decode "
                "cache reads) at 2048 frames",
    }
    detail["llava_1024f_int8kv"] = {
        **llava_arm,
        "note": "LLaVA-Video 7B at the reference's videomme operating point "
                "(1024 frames / ~201k tokens / 40k PivotKV cache) on one "
                "16 GB v5e — reachable only with int8 KV (bf16-KV tops out "
                "at 768 frames)",
    }
    print(
        json.dumps(
            {
                "metric": "prefill_frames_per_sec_per_chip_2048f",
                "value": round(fps_retake, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps_retake / fps_naive_primary, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1:
        import argparse

        p = argparse.ArgumentParser()
        p.add_argument(
            "--arm",
            choices=sorted(NAIVE_ARM_CONFIGS) + sorted(SPECIAL_ARMS),
        )
        p.add_argument("--frames", type=int, default=NUM_FRAMES)
        a = p.parse_args()
        if a.arm in SPECIAL_ARMS:
            print(json.dumps(SPECIAL_ARMS[a.arm](a.frames)))
        else:
            print(json.dumps(run_arm(a.arm, a.frames)))
        sys.exit(0)
    sys.exit(main())

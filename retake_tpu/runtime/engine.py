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
SCAN_BLOCK = 8  # video chunks fused per compiled scan dispatch


def _attn_bucket(fill: int) -> int:
    """Static attention-window bucket covering a given cache fill level."""
    return max(BUDGET_BUCKET, math.ceil(fill / BUDGET_BUCKET) * BUDGET_BUCKET)


@partial(
    jax.jit,
    static_argnames=("cfg", "grid_t", "grid_h", "grid_w", "act_quant"),
)
def _vit_chunk(
    params, cfg: Qwen2VLConfig, patches, grid_t, grid_h, grid_w,
    act_quant=False,
):
    return vision.vision_tower(
        params["visual"], cfg.vision, patches, grid_t, grid_h, grid_w,
        act_quant=act_quant,
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "grid_t", "grid_h", "grid_w", "act_quant",
                     "mesh"),
)
def _vit_chunk_tp(
    params_visual, cfg: Qwen2VLConfig, patches, grid_t, grid_h, grid_w,
    act_quant, mesh,
):
    """Tensor-parallel vision chunk: shard the FRAME axis over ``tp``.

    Qwen2-VL ViT attention is per-frame (cu_seqlens windows), the rotary
    tables are purely spatial, and the 2x2 merger is within-frame — so
    frames are fully independent and frame-sharding needs ZERO collectives
    (head-sharding would all-reduce every proj/fc2). shard_map (not GSPMD
    propagation) because the Pallas vit_attention kernel is a custom call
    XLA cannot partition; inside the shard every op is chip-local. The
    replicated ViT weights cost ~1.3 GB/chip at so400m scale — the
    sharding that matters for HBM (LLM layers, KV cache) stays in
    parallel/mesh.py."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    tp = mesh.shape["tp"]
    assert grid_t % tp == 0, (grid_t, tp)

    def local(vp, px):
        return vision.vision_tower(
            vp, cfg.vision, px, grid_t // tp, grid_h, grid_w,
            act_quant=act_quant,
        )

    kw = dict(
        mesh=mesh,
        in_specs=(jax.sharding.PartitionSpec(),
                  jax.sharding.PartitionSpec("tp")),
        out_specs=jax.sharding.PartitionSpec("tp"),
    )
    try:
        # the Pallas vit_attention call carries no varying-mesh-axes info,
        # so the replication checker must be off (outputs ARE tp-varying)
        f = shard_map(local, check_vma=False, **kw)
    except TypeError:  # older jax spells it check_rep
        f = shard_map(local, check_rep=False, **kw)
    return f(params_visual, patches)


@partial(jax.jit, static_argnames=("grid_t", "hw", "tgt", "window", "sync"))
def _dpselect_gather(video_embeds, grid_t, hw, tgt, window, sync):
    bank = video_embeds.reshape(grid_t, hw, -1)
    keep, keymask = dpselect.dpselect(bank, tgt, window, sync)
    kept = dpselect.gather_keyframes(bank, keep)
    if sync:
        keymask = jnp.broadcast_to(keymask[:, None], (tgt, hw))
    return kept.reshape(tgt * hw, -1), keymask.reshape(-1)


@partial(jax.jit, static_argnames=("grid_t", "hw", "tgt", "window", "sync"))
def _dpselect_mask(video_embeds, grid_t, hw, tgt, window, sync):
    """Keyframe mask only — the ratio-1.0 mode every shipped config uses.

    With tgt == grid_t the kept set is all frames in order, so the gather
    is an identity copy of the multi-GB feature bank; skipping it removes
    the 2x bank transient at the DPSelect stage."""
    bank = video_embeds.reshape(grid_t, hw, -1)
    _, keymask = dpselect.dpselect(bank, tgt, window, sync)
    if sync:
        keymask = jnp.broadcast_to(keymask[:, None], (tgt, hw))
    return keymask.reshape(-1)


@partial(jax.jit, donate_argnames=("buf",))
def _write_rows(buf, x, off):
    """Donated leading-axis insert (rank-generic): streams vision chunks
    into one preallocated buffer instead of list-append + concatenate
    (which holds 2x the embeddings alive at the join)."""
    return jax.lax.dynamic_update_slice(
        buf, x, (off,) + (jnp.int32(0),) * (buf.ndim - 1)
    )


@partial(jax.jit, donate_argnames=("cache",), static_argnames=("cfg", "compress", "reforge", "attn_impl", "chunk_len", "attn_budget", "act_quant"))
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
    attn_budget: int | None = None,
    act_quant: bool = False,
):
    d = embeds_full.shape[-1]
    hidden = jax.lax.dynamic_slice(embeds_full, (offset, 0), (chunk_len, d))
    pos3 = jax.lax.dynamic_slice(pos_full, (0, offset), (3, chunk_len))
    keypatch = jax.lax.dynamic_slice(keypatch_full, (offset,), (chunk_len,))
    return text.decoder_chunk(
        params, cfg, cache, hidden, pos3, valid_len, keypatch, keep_len,
        compress=compress, reforge=reforge, attn_impl=attn_impl,
        attn_budget=attn_budget, act_quant=act_quant,
    )


@partial(jax.jit, donate_argnames=("cache",), static_argnames=("cfg", "compress", "reforge", "attn_impl", "chunk_len", "prompt_len", "attn_budget", "act_quant"))
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
    attn_budget: int | None = None,
    act_quant: bool = False,
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
        attn_budget=attn_budget, act_quant=act_quant,
    )


def _select_token(logits, key, sampling: Optional[Tuple]) -> jax.Array:
    """Greedy argmax, or seeded temperature/top-k/top-p sampling.

    ``sampling`` = (temperature, top_p, top_k) with HF LogitsWarper semantics
    (the reference forwards ``do_sample`` to HF generate,
    retake/infer_eval.py:110): top-k keeps the k best, top-p keeps the
    smallest prefix of the descending-sorted distribution whose cumulative
    probability covers top_p (always at least one token).
    """
    if sampling is None:
        return jnp.argmax(logits).astype(jnp.int32)
    temperature, top_p, top_k = sampling
    logits = logits.astype(jnp.float32)
    if temperature != 1.0:
        logits = logits / jnp.float32(temperature)
    if top_k:
        kth = jax.lax.top_k(logits, int(top_k))[0][-1]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_desc = jnp.sort(logits)[::-1]
        probs = jax.nn.softmax(sorted_desc)
        cum = jnp.cumsum(probs)
        n_keep = jnp.maximum(jnp.sum((cum - probs) < top_p), 1)
        cutoff = sorted_desc[n_keep - 1]
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits).astype(jnp.int32)


@partial(
    jax.jit,
    donate_argnames=("cache",),
    static_argnames=(
        "cfg", "num_steps", "reforge", "attn_impl", "attn_budget",
        "sampling", "early_stop",
    ),
)
def _decode_loop(
    params, cfg: Qwen2VLConfig, cache, first_token, pos_base,
    num_steps: int, reforge: bool, attn_impl: str,
    attn_budget: int | None = None,
    sampling: Optional[Tuple] = None,
    rng_key=None,
    early_stop: bool = False,  # while_loop: stop at EOS (token-identical;
    #   config decode_early_stop — see _decode_loop_batch)
):
    """Decode entirely on device: one dispatch for all steps.

    Per-step host round-trips cost ~300 ms each through remote-tunnel TPU
    backends; a scanned loop makes TPOT HBM-bound instead. Steps after EOS
    still run (static trip count) but their tokens are masked to EOS and
    trimmed by the host. Greedy by default; ``sampling`` switches to a
    seeded sampler (config ``do_sample``).

    Deliberately NOT implemented as _decode_loop_batch at B=1: the unit
    batch dim measured 6.50 vs 5.30 ms/tok at 2B (leading-dim overhead in
    the vmapped step), and TPOT is the serving hot path. The
    batch-vs-sequential parity tests (tests/test_engine.py) pin the two
    loops' greedy semantics together.
    """

    def body(carry, i):
        token, cache, done = carry
        emb = text.embed(params, token[None])
        pos3 = jnp.broadcast_to(pos_base + i, (3, 1)).astype(jnp.int32)
        hidden, cache = text.decoder_chunk(
            params, cfg, cache, emb, pos3, jnp.int32(1),
            jnp.zeros(1, bool), jnp.int32(1),
            compress=False, reforge=reforge, attn_impl=attn_impl,
            attn_budget=attn_budget,
        )
        logits = text.final_logits(params, cfg, hidden[0])
        key = None if sampling is None else jax.random.fold_in(rng_key, i)
        nxt = _select_token(logits, key, sampling)
        nxt = jnp.where(done, jnp.int32(cfg.eos_token_id), nxt)
        done = done | (nxt == cfg.eos_token_id)
        return (nxt, cache, done), nxt

    first_token = first_token.astype(jnp.int32)
    done0 = first_token == cfg.eos_token_id
    if early_stop:
        # stop at EOS: post-EOS rows of the buffer keep their EOS prefill,
        # so outputs match the full scan exactly (its post-EOS steps emit
        # masked EOS too) — the loop just skips computing the dead tail
        tok_buf = jnp.full((num_steps,), jnp.int32(cfg.eos_token_id))

        def cond(carry):
            j, token, cache_, done, buf = carry
            return (j < num_steps) & ~done

        def wbody(carry):
            j, token, cache_, done, buf = carry
            (token, cache_, done), nxt = body((token, cache_, done), j)
            buf = jax.lax.dynamic_update_index_in_dim(buf, nxt, j, axis=0)
            return (j + 1, token, cache_, done, buf)

        (_, _, cache, _, tokens) = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), first_token, cache, done0, tok_buf)
        )
        return tokens, cache
    (_, cache, _), tokens = jax.lax.scan(
        body, (first_token, cache, done0), jnp.arange(num_steps)
    )
    return tokens, cache


@partial(
    jax.jit,
    donate_argnames=("cache",),
    static_argnames=(
        "cfg", "max_new", "ngram", "draft", "reforge", "attn_impl",
        "attn_budget",
    ),
)
def _spec_decode_loop(
    params, cfg: Qwen2VLConfig, cache, first_token, pos_base,
    prompt_tail,  # [POOL_PROMPT] int32, left-padded with -1
    max_new: int, ngram: int, draft: int,
    reforge: bool, attn_impl: str, attn_budget: int | None = None,
):
    """Prompt-lookup speculative decode (greedy only; config spec_decode).

    Training-free self-speculation (prompt-lookup / n-gram decoding): each
    step matches the trailing ``ngram`` tokens of [prompt tail | generated]
    against earlier occurrences in the same stream, proposes the ``draft``
    tokens that followed the latest match, and verifies ALL of them in one
    s=draft+1 chunk step. Decode is HBM-bound on weight reads, so the
    verify chunk costs about one s=1 step — every accepted proposal is a
    nearly-free token. Long-form answers that quote the prompt (MLVU
    summarization, option restating) accept multi-token runs; a no-match
    step degenerates to vanilla decode (1 token/step).

    Greedy-token-exact in exact arithmetic: nxt_j is the argmax given a
    prefix that acceptance has already proven equals the vanilla greedy
    prefix. The verify chunk reduces attention/matmuls in a different
    order than the s=1 loop, so tokens may differ within fp ulps (same
    caveat as the xla-vs-pallas decode impls). Rejected proposals cost
    nothing persistent: append_blocks wrote their K/V beyond the rolled-
    back ``length``, and the next chunk's dynamic_update_slice at the new
    length overwrites them before anything can attend to them.

    Returns (tokens [max_new + draft] — EOS-padded past the stream like
    the early-stop loop; the host trims to max_new and at EOS, cache).
    """
    k1 = draft + 1
    p0 = prompt_tail.shape[0]
    pool_len = p0 + 1 + max_new + k1
    eos = jnp.int32(cfg.eos_token_id)
    pool0 = jnp.full((pool_len,), jnp.int32(-1))
    pool0 = jax.lax.dynamic_update_slice(pool0, prompt_tail, (0,))
    pool0 = pool0.at[p0].set(first_token.astype(jnp.int32))
    buf0 = jnp.full((max_new + k1,), eos)
    win_starts = jnp.arange(pool_len - ngram, dtype=jnp.int32)
    win_idx = win_starts[:, None] + jnp.arange(ngram, dtype=jnp.int32)
    idx_k1 = jnp.arange(k1, dtype=jnp.int32)

    def cond(c):
        m, n_it, cur, done, cache_, pool, buf = c
        return (m < max_new) & ~done

    def body(c):
        m, n_it, cur, done, cache_, pool, buf = c
        cur_len = p0 + 1 + m  # valid pool prefix
        suffix = jax.lax.dynamic_slice(pool, (cur_len - ngram,), (ngram,))
        ok = jnp.all(pool[win_idx] == suffix[None, :], axis=-1) & (
            win_starts < cur_len - ngram  # strictly earlier (no self-match)
        )
        last = jnp.max(jnp.where(ok, win_starts, -1))
        # proposals = what followed the latest match (junk when last < 0 or
        # the slice reads past cur_len — verification rejects junk for free)
        prop = jax.lax.dynamic_slice(
            pool, (jnp.maximum(last, 0) + ngram,), (draft,)
        )
        chunk = jnp.concatenate([cur[None].astype(jnp.int32), prop])
        emb = text.embed(params, chunk)
        pos3 = jnp.broadcast_to(
            pos_base + m + idx_k1, (3, k1)
        ).astype(jnp.int32)
        off = cache_.length
        hidden, cache_ = text.decoder_chunk(
            params, cfg, cache_, emb, pos3, jnp.int32(k1),
            jnp.zeros(k1, bool), jnp.int32(k1),
            compress=False, reforge=reforge, attn_impl=attn_impl,
            attn_budget=attn_budget,
        )
        nxt = jnp.argmax(
            text.final_logits_batch(params, cfg, hidden), axis=-1
        ).astype(jnp.int32)  # [k1] greedy verdicts
        # longest prefix where the proposal agrees with greedy
        a_acc = jnp.sum(
            jnp.cumprod((prop == nxt[:draft]).astype(jnp.int32))
        )
        cand = idx_k1 <= a_acc  # emit candidates nxt[0..a_acc]
        is_eos = (nxt == eos) & cand
        any_eos = jnp.any(is_eos)
        emit_n = jnp.where(any_eos, jnp.argmax(is_eos) + 1, a_acc + 1)
        emit_vec = jnp.where(idx_k1 < emit_n, nxt, eos)
        buf = jax.lax.dynamic_update_slice(buf, emit_vec, (m,))
        pool = jax.lax.dynamic_update_slice(pool, emit_vec, (cur_len,))
        # roll back: keep K/V only for the emit_n verified input tokens
        cache_ = dataclasses.replace(cache_, length=off + emit_n)
        cur = nxt[emit_n - 1]
        return (m + emit_n, n_it + 1, cur, any_eos, cache_, pool, buf)

    first_token = first_token.astype(jnp.int32)
    done0 = first_token == cfg.eos_token_id
    (m, n_it, _, _, cache, _, tokens) = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.int32(0), first_token, done0, cache, pool0, buf0),
    )
    # n_it = verify steps run, m = tokens emitted: m / n_it is the measured
    # speculation speedup factor (1.0 = no proposals ever accepted)
    return tokens, cache, m, n_it


POOL_PROMPT = 256  # prompt-tail tokens the spec-decode matcher can see


@partial(
    jax.jit,
    donate_argnames=("cache",),
    static_argnames=("cfg", "chunk_len", "compress", "reforge", "attn_impl", "attn_budget", "act_quant"),
)
def _video_segment_scan(
    params,
    cfg: Qwen2VLConfig,
    cache,
    embeds_full,
    pos_full,
    keypatch_full,
    offsets,  # [num_chunks] int32
    valids,  # [num_chunks] int32
    keeps,  # [num_chunks] int32
    chunk_len: int,
    compress: bool,
    reforge: bool,
    attn_impl: str,
    attn_budget: int | None = None,
    act_quant: bool = False,
):
    """All chunks of one video segment in a single compiled scan.

    One dispatch instead of num_chunks — per-call host/tunnel latency would
    otherwise dominate at 64 chunks per 2048-frame video. Returns the last
    chunk's hidden states and the updated cache.
    """
    d = embeds_full.shape[-1]

    def body(carry, xs):
        cache, _ = carry
        offset, valid, keep = xs
        hidden = jax.lax.dynamic_slice(embeds_full, (offset, 0), (chunk_len, d))
        pos3 = jax.lax.dynamic_slice(pos_full, (0, offset), (3, chunk_len))
        kp = jax.lax.dynamic_slice(keypatch_full, (offset,), (chunk_len,))
        hidden, cache = text.decoder_chunk(
            params, cfg, cache, hidden, pos3, valid, kp, keep,
            compress=compress, reforge=reforge, attn_impl=attn_impl,
            attn_budget=attn_budget, act_quant=act_quant,
        )
        return (cache, hidden), None

    hidden0 = jnp.zeros((chunk_len, d), embeds_full.dtype)
    (cache, hidden), _ = jax.lax.scan(
        body, (cache, hidden0), (offsets, valids, keeps)
    )
    return hidden, cache


@partial(
    jax.jit,
    donate_argnames=("k_all", "v_all", "ks_all", "vs_all"),
    static_argnames=("cfg", "num_steps", "sampling", "attn_impl",
                     "early_stop"),
)
def _decode_loop_batch(
    params, cfg: Qwen2VLConfig, k_all, v_all, base_t, pos_bases,
    final_len, gap_start, first_tokens,
    num_steps: int,
    sampling: Optional[Tuple] = None,
    rng_loop=None,  # ONE key — the sequential loop's fold_in(seed_key, 1)
    ks_all=None,  # [L, B, KV, S_attn] f32 — int8 KV mode
    vs_all=None,
    dec_start=None,  # [B] int32 — per-slot decode-region start (continuous
    #   batching segments); None = gap_start
    i0=None,  # scalar int32 — global decode steps already taken before this
    #   segment (write pointer = gap_start + i0 + step); None = 0
    done0=None,  # [B] bool — slots already finished (or free) at segment
    #   start; None = first_tokens == eos
    step_off=None,  # [B] int32 — per-slot global-step offset so sampling
    #   keys derive from the REQUEST-OWN step (i - step_off); None = 0
    attn_impl: str = "xla",  # batched-decode attention path: "pallas"/
    #   "flash" = dead-block-skipping kernel; "xla" = full-bucket einsum
    early_stop: bool = False,  # while_loop variant: stop once every slot
    #   has emitted EOS (token-identical; see the branch below)
    max_steps=None,  # [B] int32 — per-slot loop-output budget (request's
    #   max_new_tokens - 1): a slot joins `done` once its own stream is
    #   fully emitted, so early_stop stops a mixed-limit batch at
    #   max(own finish) instead of decoding every slot to the batch max.
    #   Post-limit outputs are masked EOS — callers already trim them
    #   (token-identical). None = batch-uniform num_steps.
):
    """Batched decode: one scanned loop, the per-request step fully batched.

    One dispatch for all steps (per-step host round-trips cost ~300 ms each
    through remote-tunnel TPU backends); steps after a request's EOS still
    run (static trip count) but its tokens are masked to EOS and trimmed by
    the host. Decode is HBM-bandwidth-bound (weight reads dominate at batch
    1), so batching requests amortizes the weight streaming.

    ``k_all``/``v_all`` are [L, B, KV, S_attn, D] gap-layout caches: every
    request's step-i token writes at the batch-UNIFORM slot
    ``gap_start + i``, making the append a single aliasable
    dynamic_update_slice. (The previous vmapped per-request-offset append
    lowered to a scatter that rewrote the whole batched cache every step:
    13.2 -> 7.4 ms/step at B=8 with the append ablated.) Positions continue
    analytically from ``base_t`` (see text.decode_step_batch).
    """

    quantized = ks_all is not None

    def body(carry, i):
        tokens, k_all, v_all, ks_all, vs_all, done = carry
        emb = text.embed(params, tokens)  # [B, d]
        hidden, kb, vb = text.decode_step_batch(
            params, cfg, k_all, v_all, emb, base_t, pos_bases + i,
            final_len, gap_start, i, ks_all, vs_all, dec_start,
            attn_impl=attn_impl,
        )
        logits = text.final_logits_batch(params, cfg, hidden)  # [B, V]
        if sampling is None:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            # keys depend on the REQUEST-OWN step only — fold_in(rng_loop,
            # own_step) is exactly the sequential loop's key schedule, so
            # sampled draws are token-exact vs per-request generate and
            # independent of slot packing / arrival order
            own = jnp.broadcast_to(i, tokens.shape)
            if step_off is not None:
                own = i - step_off
            keys = jax.vmap(lambda o: jax.random.fold_in(rng_loop, o))(own)
            nxt = jax.vmap(
                lambda lg, kk: _select_token(lg, kk, sampling)
            )(logits, keys)
        nxt = jnp.where(done, jnp.int32(cfg.eos_token_id), nxt)
        done = done | (nxt == cfg.eos_token_id)
        if max_steps is not None:
            own_emitted = i + 1 if step_off is None else i + 1 - step_off
            done = done | (own_emitted >= max_steps)
        off = gap_start + i
        if quantized:
            from retake_tpu.ops.quantization import quantize_kv_block

            kb, kbs = quantize_kv_block(kb)  # [L, B, KV, D] -> + [L, B, KV]
            vb, vbs = quantize_kv_block(vb)
            ks_all = jax.lax.dynamic_update_slice(
                ks_all, kbs[:, :, :, None], (0, 0, 0, off)
            )
            vs_all = jax.lax.dynamic_update_slice(
                vs_all, vbs[:, :, :, None], (0, 0, 0, off)
            )
        k_all = jax.lax.dynamic_update_slice(
            k_all, kb[:, :, :, None, :].astype(k_all.dtype),
            (0, 0, 0, off, 0),
        )
        v_all = jax.lax.dynamic_update_slice(
            v_all, vb[:, :, :, None, :].astype(v_all.dtype),
            (0, 0, 0, off, 0),
        )
        return (nxt, k_all, v_all, ks_all, vs_all, done), nxt

    first_tokens = first_tokens.astype(jnp.int32)
    if done0 is None:
        done0 = first_tokens == cfg.eos_token_id
    if early_stop:
        # while_loop variant: stop as soon as EVERY slot has emitted EOS.
        # Post-EOS rows of the token buffer keep their EOS prefill, so
        # outputs are IDENTICAL to the full scan (post-EOS steps emit
        # masked EOS there too) — the loop just skips computing them.
        # With real checkpoints eval answers are a handful of tokens vs
        # max_new=128, so the static scan pays ~max_new/answer_len extra
        # decode steps per batch; this recovers them. Serving segments
        # keep the scan (seg is small and the blind pipeline relies on a
        # fixed dispatch shape).
        tok_buf = jnp.full((num_steps, first_tokens.shape[0]),
                           jnp.int32(cfg.eos_token_id))
        i0_ = jnp.int32(0) if i0 is None else jnp.int32(i0)

        def cond(carry):
            j, cur, k_a, v_a, ks_a, vs_a, done, buf = carry
            return (j < num_steps) & ~jnp.all(done)

        def wbody(carry):
            j, cur, k_a, v_a, ks_a, vs_a, done, buf = carry
            (cur, k_a, v_a, ks_a, vs_a, done), nxt = body(
                (cur, k_a, v_a, ks_a, vs_a, done), i0_ + j
            )
            buf = jax.lax.dynamic_update_index_in_dim(buf, nxt, j, axis=0)
            return (j + 1, cur, k_a, v_a, ks_a, vs_a, done, buf)

        (_, _, k_all, v_all, ks_all, vs_all, _, tokens) = jax.lax.while_loop(
            cond,
            wbody,
            (jnp.int32(0), first_tokens, k_all, v_all, ks_all, vs_all,
             done0, tok_buf),
        )
        return tokens, (k_all, v_all, ks_all, vs_all)
    steps = jnp.arange(num_steps)
    if i0 is not None:
        steps = steps + i0
    (_, k_all, v_all, ks_all, vs_all, _), tokens = jax.lax.scan(
        body, (first_tokens, k_all, v_all, ks_all, vs_all, done0),
        steps,
    )
    # the caches must be RETURNED for the donation to be usable — otherwise
    # XLA keeps the input buffers alive next to the scan-carry copy and peak
    # HBM doubles (callers discard them)
    return tokens, (k_all, v_all, ks_all, vs_all)  # tokens [num_steps, B]


@partial(jax.jit, static_argnames=("cfg", "sampling"))
def _final_token(
    params, cfg: Qwen2VLConfig, hidden, last_idx,
    sampling: Optional[Tuple] = None, rng_key=None,
):
    logits = text.final_logits(params, cfg, hidden[last_idx])
    return _select_token(logits, rng_key, sampling)


@partial(jax.jit, static_argnames=("cfg",))
def _build_embeds(params, cfg: Qwen2VLConfig, input_ids):
    return text.embed(params, input_ids)


@partial(jax.jit, static_argnames=("cfg", "pre_len", "vid_len"))
def _concat_embeds(
    params, cfg: Qwen2VLConfig, input_ids, video_embeds,
    pre_len: int, vid_len: int,
):
    """[text-before | video | text-after] embeddings by concatenation.

    Long videos dominate the sequence (200k of ~201k tokens at 1024 LLaVA
    frames), so gathering embeddings for ALL ids and then overwriting the
    video span wastes a full [S, d] buffer plus the scatter copy — at 7B
    width that transient peak is what OOMs a 16 GB chip. The video span is
    contiguous, so concatenation builds the sequence with no dead gather.
    (pre_len/vid_len are static; the surrounding per-request jits already
    specialize on the padded sequence length.)
    """
    pre = text.embed(params, input_ids[:pre_len])
    post = text.embed(params, input_ids[pre_len + vid_len:])
    return jnp.concatenate([pre, video_embeds.astype(pre.dtype), post])


@jax.jit
def _scatter_embeds(emb, vision_embeds, start):
    """Write one contiguous vision-token span (image or video) into the
    embedding sequence (reference masked_scatter, qwen2_vl.py:633-646 — spans
    are contiguous per vision block, so a dynamic_update_slice suffices)."""
    return jax.lax.dynamic_update_slice(
        emb, vision_embeds.astype(emb.dtype), (start, 0)
    )


@dataclasses.dataclass
class GenerationResult:
    tokens: np.ndarray  # generated token ids (without the prompt)
    prefill_seconds: float = 0.0
    decode_seconds: float = 0.0
    cache_len: int = 0
    input_len: int = 0
    # per-stage wall seconds (vision_tower, dpselect, prefill_chunks, ...);
    # populated when profiling is enabled (RETAKE_PROFILE=1)
    stages: Optional[dict] = None


@dataclasses.dataclass
class VideoFeatures:
    """Question-independent vision artifact, reusable across every question
    about the same video.

    The reference recomputes the whole vision tower + DPSelect per question
    (retake/qwen2_vl.py:597-627 runs inside each generate), even though
    nothing in that stage depends on the prompt — and the eval benchmarks
    ask ~3 questions per video (VideoMME). ``Engine.encode_video`` returns
    this artifact once; ``generate(video_features=...)`` consumes it
    without touching pixels. The embeddings stay on device; drop the
    object after a video's last question to release the HBM.

    Field semantics per family:
      * Qwen2-VL: ``t``/``tgt`` are temporal-merged frame counts
        (grid_t), ``hw`` is merged tokens per temporal step, ``keymask``
        is [tgt*hw] over LLM video tokens, ``grid`` is the RAW (t, h, w)
        patch grid (drives position ids + chunk sizing).
      * LLaVA-OneVision: ``t``/``tgt`` are raw frame counts, ``hw`` is the
        UN-POOLED patches/frame (729), ``keymask`` is [tgt*hw] and gets
        truncated onto the pooled token stream at scatter (the reference
        masked_scatter quirk), ``grid`` is None.
    """

    embeds: object  # device [n_video_tokens, d] LLM-space embeddings
    keymask: np.ndarray  # bool keypatch flags (may be empty)
    t: int  # pre-compression temporal count
    tgt: int  # post-compression temporal count
    hw: int  # mask units per temporal step
    grid: Optional[tuple] = None  # raw (t, h, w) grid (Qwen2-VL only)


@dataclasses.dataclass
class PrefillState:
    """Everything batched decode needs from one request's prefill."""
    cache: object  # KVCache (consumed — set to None — by decode_batch)
    first_token_host: int
    decode_pos_base: int
    final_len: int
    reforge: bool
    result: GenerationResult  # prefill-only result (tokens = [first])
    # attention bucket this request decodes in (_attn_bucket(final_len +
    # max_new)); its cache is trimmed to this size at prefill-state creation
    # so B pending requests hold their OWN need, not B full prefill budgets.
    # Callers batching mixed-length requests should group by this value —
    # decode_batch runs the whole batch at the largest member's bucket.
    attn_need: int = 0


class PrefixMismatch(ValueError):
    """generate(prefix=...) got a question whose prefill plan diverges from
    the captured prefix (different prompt prefix, or a dynamic compression
    ratio that resolved to different keep_len values). Callers fall back to
    the inline path — typically generate(video_features=prefix.features)."""


class PrefixBudgetOverflow(PrefixMismatch):
    """The captured prefix's token budget is too small for this question
    (bigger max_new_tokens or longer prompt than anything seen at capture
    time). Unlike plan divergence, a recapture with a larger reserve fixes
    it permanently — the serving layer evicts + recaptures on this instead
    of falling back inline forever."""


class PrefixUnsupported(ValueError):
    """Prefix capture/reuse is impossible under the ENGINE CONFIG (not just
    this request): prompt_guided_compression folds the question into every
    video chunk, so no question-independent prefill exists. Callers should
    stop attempting captures for the engine's lifetime (the serving layer
    disables its prefix cache on this), unlike the per-request ValueErrors
    (no video span / video at prompt end) which fail only one capture."""


@dataclasses.dataclass
class VideoPrefix:
    """Question-independent LLM-prefill artifact: the compressed KV cache
    snapshotted after the LAST video chunk, reusable across every question
    about the same video.

    The reference re-runs the whole video prefill per question even though,
    with prompt_guided_compression off (every shipped eval config), the
    question enters the video chunks ONLY via forge
    (reference qwen2_vl.py:670-720) — so the segment plan up to and
    including the last video chunk is question-independent. This extends
    VideoFeatures reuse (vision tower only) to the full prefill: per
    question only the trailing text segment + decode run.

    Exactness contract: generate(prefix=...) recomputes the per-question
    plan (including the dynamic compression ratio, which depends on total
    prompt length — reference qwen2_vl.py:550-557) and reuses ONLY if the
    prefix-covered plan steps and token ids match the capture exactly;
    otherwise it raises PrefixMismatch. Reuse is therefore provably
    token-exact per question. At eval scale (±tens of question tokens over
    >32k-token inputs) the resolved keep_len values are identical, so
    mismatches are rare.

    ``cache`` is never mutated by reuse — each generate(prefix=...) forks a
    device copy. Drop the object after a video's last question to release
    the HBM (cache + features.embeds).
    """

    cache: object  # KVCache after the video segments (original; forked per use)
    final_len: int  # cache fill after the prefix
    budget: int  # cache budget the prefix was captured at (incl. reserve)
    split: int  # index into the REFORGED ids where the prefix ends
    prefix_ids: np.ndarray  # reforged ids[:split] (validation)
    plan_sig: tuple  # ((kind, offset, valid, keep), ...) of the prefix steps
    features: Optional[VideoFeatures] = None  # vision metadata + fallback
    prefill_seconds: float = 0.0  # capture cost (vision + video prefill)
    stages: Optional[dict] = None


def _fork_cache(cache):
    """Device copy of a KVCache so chunk steps (which donate their cache
    argument) can never touch the shared prefix snapshot."""
    return jax.tree_util.tree_map(jnp.copy, cache)


@partial(jax.jit, donate_argnames=("cache",), static_argnames=("need",))
def _trim_cache(cache, need: int):
    """Shrink a prefilled cache to its decode bucket (donated: frees the
    full prefill-budget buffers immediately — at a 40960 budget a short
    request's 8192 bucket returns ~2 GB of HBM per pending request)."""
    return dataclasses.replace(
        cache,
        k=cache.k[:, :, :need],
        v=cache.v[:, :, :need],
        pos=cache.pos[:, :, :need],
        k_scale=None if cache.k_scale is None else cache.k_scale[:, :, :need],
        v_scale=None if cache.v_scale is None else cache.v_scale[:, :, :need],
    )


class Qwen2VLEngine:
    """Single-request (batch 1) long-video inference engine."""

    def __init__(
        self,
        cfg: Qwen2VLConfig,
        params,
        retake: RetakeConfig,
        cache_sharding=None,
    ):
        if retake.scaling_factor:
            cfg = cfg.with_yarn(retake.scaling_factor)
        self.cfg = cfg
        self.params = params
        self.retake = retake
        # optional KVCache NamedShardings (parallel/mesh.cache_shardings) so
        # tensor-parallel runs keep the cache sharded over kv heads
        self.cache_sharding = cache_sharding
        impl = retake.attn_implementation
        self.attn_impl = impl if impl in ("flash", "pallas", "xla") else "pallas"
        # W8A8 (config `quantization: w8a8`): prefill linears run on the
        # MXU's double-rate int8 path; decode stays exact weight-only
        self.act_quant = retake.quantization == "w8a8"

    # ---------- vision ----------

    def _vit_dtype(self):
        return self.params["visual"]["patch_embed"]["w"].dtype

    def run_vision(
        self, pixel_values_videos: np.ndarray, video_grid_thw,
        on_dispatch=None,
    ) -> jax.Array:
        """ViT over the video in frame chunks (reference qwen2_vl.py:597-617).

        pixel_values_videos: [grid_t*grid_h*grid_w, patch_dim].
        Returns merged LLM-space embeddings [grid_t*grid_h*grid_w/4, d].
        ``on_dispatch`` (if given) is called after each chunk's dispatch —
        the continuous-batching server uses it to interleave decode
        segments with a long admission's prefill (runtime/serve.py).
        """
        t, h, w = (int(x) for x in np.asarray(video_grid_thw).reshape(-1)[:3])
        fcs = self.retake.frame_chunk_size or 10**9
        patches = jnp.asarray(pixel_values_videos, dtype=self._vit_dtype())
        aq = self.act_quant and "scale" in self.params["visual"]["blocks"]["qkv"]
        # TP: shard the frame axis (frames are attention-independent — see
        # _vit_chunk_tp) whenever the chunk's frame count divides tp
        tp_mesh = None
        if self.cache_sharding is not None:
            m = self.cache_sharding.k.mesh
            if m.shape.get("tp", 1) > 1:
                tp_mesh = m

        def vit(chunk, grid_t):
            if tp_mesh is not None and grid_t % tp_mesh.shape["tp"] == 0:
                return _vit_chunk_tp(
                    self.params["visual"], self.cfg, chunk, grid_t, h, w,
                    aq, tp_mesh,
                )
            return _vit_chunk(self.params, self.cfg, chunk, grid_t, h, w, aq)

        if t <= fcs:
            return vit(patches, t)
        hw = h * w
        merged_per_t = hw // self.cfg.vision.spatial_merge_size**2
        out_buf = None
        for i in range(0, t, fcs):
            tc = min(fcs, t - i)
            chunk = patches[i * hw : (i + tc) * hw]
            if tc < fcs:  # pad tail to the common shape; frames are independent
                chunk = jnp.pad(chunk, ((0, (fcs - tc) * hw), (0, 0)))
            out = vit(chunk, fcs)
            if out_buf is None:
                out_buf = jnp.zeros((t * merged_per_t, out.shape[-1]), out.dtype)
            out_buf = _write_rows(
                out_buf, out[: tc * merged_per_t], jnp.int32(i * merged_per_t)
            )
            if on_dispatch is not None:
                on_dispatch()
        return out_buf

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

    def run_vision_images(
        self, pixel_values: np.ndarray, image_grid_thw
    ) -> jax.Array:
        """ViT over still images (reference qwen2_vl.py:593-595): each image
        is its own (t=1, h, w) grid; embeddings concatenate in input order."""
        grids = np.asarray(image_grid_thw).reshape(-1, 3)
        pixels = np.asarray(pixel_values)
        aq = self.act_quant and "scale" in self.params["visual"]["blocks"]["qkv"]
        outs = []
        off = 0
        for t, h, w in grids:
            t, h, w = int(t), int(h), int(w)
            n = t * h * w
            chunk = jnp.asarray(pixels[off : off + n], dtype=self._vit_dtype())
            outs.append(_vit_chunk(self.params, self.cfg, chunk, t, h, w, aq))
            off += n
        assert off == pixels.shape[0], (off, pixels.shape)
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def encode_video(
        self, pixel_values_videos: np.ndarray, video_grid_thw,
        on_dispatch=None, _timer=None,
    ) -> VideoFeatures:
        """Vision tower + visual compression (DPSelect / MA-LLM) as a
        question-independent, reusable artifact (see VideoFeatures).

        Exactly the vision stage ``generate`` runs inline; token streams are
        identical whether features are computed inline or reused.
        """
        from retake_tpu.utils.profiling import StageTimer

        timer = _timer or StageTimer()
        cfg, rt = self.cfg, self.retake
        grid = np.asarray(video_grid_thw).reshape(-1, 3)
        t, h, w = (int(x) for x in grid[0])
        with timer.stage("vision_tower"):
            video_embeds = self.run_vision(
                pixel_values_videos, grid[0], on_dispatch=on_dispatch
            )
        m2 = cfg.vision.spatial_merge_size**2
        hw_m = h * w // m2
        tgt = t
        keymask_np = np.zeros(t * hw_m, bool)
        if rt.visual_compression:
            with timer.stage("dpselect"):
                vc = rt.visual
                # grid_t here is the temporal-patch-merged frame count
                tgt = max(1, round(vc.compression_ratio * t))
                if vc.compression_method == "Keyframe":
                    if tgt == t:  # ratio 1.0: mask only, skip the
                        # identity gather of the multi-GB bank
                        keymask = _dpselect_mask(
                            video_embeds, t, hw_m, tgt, 3, vc.patch_sync
                        )
                    else:
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
        # drain the vision queue so its intermediates free before the
        # prefill allocates (host dispatch runs far ahead; every queued
        # stage's buffers are live at once — block_until_ready is a
        # no-op through the axon tunnel, a host read is the fence)
        float(video_embeds[0, 0].astype(jnp.float32))
        return VideoFeatures(
            embeds=video_embeds, keymask=keymask_np,
            t=t, tgt=tgt, hw=hw_m, grid=(t, h, w),
        )

    def generate_batch(
        self,
        requests: List[dict],
        max_new_tokens: Optional[int] = None,
    ) -> List[GenerationResult]:
        """Serve several requests: sequential prefill, batched decode.

        Each request is a dict of ``generate`` kwargs. A per-request
        ``max_new_tokens`` is honored: the batch decodes a uniform step
        count (the max over requests) and each result is trimmed to its
        own limit harvest-side — token-exact vs sequential ``generate``
        because both greedy and sampled tokens are prefix-stable (sampling
        keys derive from the request-own step, not the batch step).
        Prefill is MXU-bound at batch 1 (large chunk matmuls), so
        requests prefill back-to-back; decode is HBM-bound, so all requests
        then decode together in one scanned batched loop over gap-layout
        caches (engine.decode_batch). Greedy decode is token-exact vs
        per-request ``generate`` for the default attention impls
        ("pallas"/"flash", whose single-request decode uses the identical
        append-free softmax merge); the "xla" debug impl decodes through a
        different fp32 reduction order and may diverge within ulps. With
        ``do_sample`` the keys derive from (seed, request-own step) — the
        sequential loop's exact schedule — so sampled draws are ALSO
        token-exact vs per-request ``generate`` and independent of slot
        packing (up to the same fp caveats as greedy).
        """
        if not requests:
            return []
        if self.attn_impl == "xla" and not getattr(
            Qwen2VLEngine, "_warned_xla_batch", False
        ):
            # batched decode always runs the gapped-einsum path; with the
            # "xla" debug impl the sequential decode reduces in a different
            # fp32 order, so batched tokens may diverge within ulps
            Qwen2VLEngine._warned_xla_batch = True
            import warnings

            warnings.warn(
                "generate_batch with attn_implementation 'xla': batched "
                "decode uses the gapped einsum path; token-exactness vs "
                "sequential generate is only guaranteed for the default "
                "'pallas'/'flash' impls", stacklevel=2,
            )
        default_max = max_new_tokens or self.retake.max_new_tokens
        req_max = [int(req.get("max_new_tokens") or default_max)
                   for req in requests]
        batch_max = max(req_max)
        states = [
            self.generate(**{k: v for k, v in req.items()
                             if k != "max_new_tokens"},
                          max_new_tokens=batch_max, _prefill_only=True)
            for req in requests
        ]
        # NB: deliberately NOT forwarding self.attn_impl — bucket-grouped
        # batched decode measured fastest (and stays token-exact vs the
        # sequential path) on the einsum; see decode_batch's attn_impl note.
        results = decode_batch(
            self.params, self.cfg, self.retake, states, batch_max,
            early_stop=bool(getattr(self.retake, "decode_early_stop", False)),
            req_max=req_max,
        )
        for res, m in zip(results, req_max):
            if len(res.tokens) > m:
                res.tokens = res.tokens[:m]
        return results

    def generate(
        self,
        input_ids: np.ndarray,
        pixel_values_videos: Optional[np.ndarray] = None,
        video_grid_thw=None,
        max_new_tokens: Optional[int] = None,
        pixel_values: Optional[np.ndarray] = None,
        image_grid_thw=None,
        video_features: Optional[VideoFeatures] = None,  # precomputed
        #   encode_video artifact (reused across questions on one video)
        prefix: Optional[VideoPrefix] = None,  # captured encode_prefix
        #   artifact: skip vision AND the video prefill for this question
        _prefill_only: bool = False,
        _capture_reserve: Optional[int] = None,  # encode_prefix plumbing
        on_dispatch=None,  # serving hook: called after each ViT-chunk /
        #   prefill-step dispatch so a server can interleave decode work
    ) -> GenerationResult:
        import time

        from retake_tpu.utils.profiling import StageTimer

        timer = StageTimer()
        cfg, rt = self.cfg, self.retake
        max_new_tokens = max_new_tokens or rt.max_new_tokens
        ids = np.asarray(input_ids, dtype=np.int64).reshape(-1)

        t0 = time.perf_counter()
        if prefix is not None:
            assert pixel_values_videos is None and video_features is None, (
                "generate(prefix=...) replaces both the pixels and the "
                "video_features inputs"
            )
            # positions are computed from the CAPTURED grid below, so a
            # prompt whose video span diverges from the capture must fail
            # loudly HERE, before get_rope_index sees inconsistent ids
            n_vid = int(np.sum(ids == cfg.video_token_id))
            n_expected = prefix.features.t * prefix.features.hw
            if n_vid != n_expected:
                raise PrefixMismatch(
                    f"prompt has {n_vid} video tokens but the captured "
                    f"prefix has {n_expected} (different video/frame count "
                    "under the same prefix?)"
                )
            video_grid_thw = np.asarray([prefix.features.grid])
        if pixel_values_videos is None and video_features is not None:
            # reuse path: the grid rides in the features
            video_grid_thw = np.asarray([video_features.grid])
        # 1. original position ids (pre-compression; HF computes them first)
        grid = None if video_grid_thw is None else np.asarray(video_grid_thw).reshape(-1, 3)
        igrid = None if image_grid_thw is None else np.asarray(image_grid_thw).reshape(-1, 3)
        pos, _ = pos_lib.get_rope_index(
            ids,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            video_grid_thw=grid,
            image_grid_thw=igrid,
        )
        decode_pos_base = int(pos.max()) + 1  # reference decode positions

        # image (non-video) inputs: ViT per image, scattered at the image
        # token spans by prefill_and_decode (reference qwen2_vl.py:593-595,
        # 633-646); image tokens prefill as text segments (no compression)
        image_embeds = None
        if pixel_values is not None:
            with timer.stage("vision_tower_images"):
                image_embeds = self.run_vision_images(pixel_values, igrid)

        # 2. vision tower + DPSelect (or a precomputed reusable artifact)
        video_embeds = None
        keypatch_tokens = np.zeros(len(ids), dtype=bool)
        if pixel_values_videos is not None:
            video_features = self.encode_video(
                pixel_values_videos, grid[0], on_dispatch=on_dispatch,
                _timer=timer,
            )
        if prefix is not None:
            # metadata-only use of the features: reforge ids/positions the
            # way the inline path did at capture (embeds stay untouched —
            # the video KV already lives in the prefix cache)
            vf = prefix.features
            if vf.tgt != vf.t:
                vi = np.where(ids == cfg.video_token_id)[0]
                ids, pos = pos_lib.reforge_after_visual_compression(
                    ids, pos, (int(vi[0]), int(vi[-1]) + 1),
                    vf.tgt * vf.hw, vf.t - vf.tgt,
                )
                keypatch_tokens = np.zeros(len(ids), dtype=bool)
        elif video_features is not None:
            vf = video_features
            video_embeds = vf.embeds
            if vf.tgt != vf.t:
                vi = np.where(ids == cfg.video_token_id)[0]
                ids, pos = pos_lib.reforge_after_visual_compression(
                    ids, pos, (int(vi[0]), int(vi[-1]) + 1),
                    vf.tgt * vf.hw, vf.t - vf.tgt,
                )
                keypatch_tokens = np.zeros(len(ids), dtype=bool)
            vi = np.where(ids == cfg.video_token_id)[0]
            keypatch_tokens[vi[0] : vi[0] + len(vf.keymask)] = vf.keymask

        chunk_tokens = (
            self.get_chunk_tokens(grid[0]) if grid is not None else None
        )
        # box + drop our references so prefill_and_decode can free the
        # embeddings right after scattering them
        ve_box, video_embeds = [video_embeds], None
        ie_box, image_embeds = [image_embeds], None
        out = prefill_and_decode(
            self.params, cfg, rt,
            ids=ids, pos=pos, keypatch_tokens=keypatch_tokens,
            video_embeds=ve_box, video_token_id=cfg.video_token_id,
            chunk_tokens=chunk_tokens, decode_pos_base=decode_pos_base,
            max_new_tokens=max_new_tokens, attn_impl=self.attn_impl,
            timer=timer, t_start=t0,
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
        video_grid_thw=None,
        video_features: Optional[VideoFeatures] = None,
        max_new_tokens: Optional[int] = None,
        reserve_tokens: int = 512,
        on_dispatch=None,  # serving hook, forwarded to generate()
    ) -> VideoPrefix:
        """Run vision + the question-independent video prefill ONCE and
        snapshot the compressed KV cache (VideoPrefix). Subsequent
        ``generate(input_ids=..., prefix=...)`` calls pay only the trailing
        text segment + decode — the reference re-runs the whole prefill per
        question (qwen2_vl.py:670-733) although, with
        prompt_guided_compression off, nothing before the question segment
        depends on it.

        ``input_ids`` is any full prompt containing the video span (e.g.
        the video's first question); its suffix is ignored.
        ``reserve_tokens`` bounds how much LONGER a later question's suffix
        may be before its budget outgrows the captured cache.
        """
        return self.generate(
            input_ids, pixel_values_videos, video_grid_thw,
            max_new_tokens=max_new_tokens, video_features=video_features,
            _capture_reserve=int(reserve_tokens), on_dispatch=on_dispatch,
        )


def prefill_and_decode(
    params,
    cfg: Qwen2VLConfig,  # the *text* config (LLaVA passes cfg.text)
    rt: RetakeConfig,
    *,
    ids: np.ndarray,
    pos: np.ndarray,  # [3, S] int32 (1-D models broadcast their positions)
    keypatch_tokens: np.ndarray,
    video_embeds,
    video_token_id: int,
    chunk_tokens: Optional[int],
    decode_pos_base: int,
    max_new_tokens: int,
    attn_impl: str,
    timer,
    t_start: float,
    image_embeds=None,
    image_token_id: Optional[int] = None,
    cache_sharding=None,
    act_quant: bool = False,
    prefill_only: bool = False,
    on_dispatch=None,  # called after each plan-step dispatch (serving hook)
    capture_reserve: Optional[int] = None,  # capture a VideoPrefix after the
    #   last video chunk, reserving this many suffix tokens in the budget
    prefix: Optional[VideoPrefix] = None,  # resume from a captured prefix:
    #   skip its plan steps, fork its cache, run only the trailing text
):
    """Shared chunked-prefill + greedy-decode core (both model families).

    Implements the reference's segment loop + PivotKV orchestration
    (qwen2_vl.py:670-733, llava_onevision.py:488-551) as a host-side plan of
    jit-compiled chunk steps over one static cache budget.
    """
    import time

    s = len(ids)
    # big vision embeddings may arrive in a 1-element list: ownership
    # transfer so THIS function holds the only reference and can free them
    # right after the embed scatter (a caller-held [147k..200k, d] array
    # otherwise stays alive through the whole prefill — at 7B width that is
    # 1-2 GB of dead HBM next to the int8 params and the KV cache)
    if isinstance(video_embeds, list):
        video_embeds = video_embeds.pop() if video_embeds else None
    if isinstance(image_embeds, list):
        image_embeds = image_embeds.pop() if image_embeds else None
    # W8A8 needs int8 weights; fall back to the exact path otherwise
    act_quant = act_quant and "scale" in params["layers"]["q"]
    ratio = rt.compression_ratio_for(s)
    reforge = rt.kv.pos_embed_reforge and rt.kvcache_compression
    compress_video = rt.kvcache_compression and ratio < 1.0
    prompt_guided = (
        rt.kv.prompt_guided_compression and compress_video
    )

    # 3. segments + host-side cache-length plan
    if chunk_tokens is None:
        segments = [(0, s, "text")]
    else:
        segments = pos_lib.segment_modalities(ids, video_token_id)
    prompt_span = None
    if prompt_guided:
        sp, ep, tp = segments[-1]
        assert tp == "text"
        prompt_span = (sp, ep)

    attn_bucket = _attn_bucket

    plan: List[dict] = []
    cache_len = 0
    max_extent = 0
    for (seg_s, seg_e, kind) in segments:
        if kind == "text":
            n = seg_e - seg_s
            padded = max(TEXT_BUCKET, math.ceil(n / TEXT_BUCKET) * TEXT_BUCKET)
            plan.append(
                dict(kind="text", offset=seg_s, valid=n, chunk_len=padded,
                     cache_len=cache_len, bucket=attn_bucket(cache_len + n))
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
                         cache_len=cache_len,
                         bucket=attn_bucket(cache_len + keep))
                )
                max_extent = max(max_extent, cache_len + ct + p_len)
                cache_len += keep
    final_len = cache_len
    # spec decode writes (then rolls back) up to spec_draft KV entries past
    # the accepted stream — budget/bucket need that headroom
    spec_decode = bool(getattr(rt, "spec_decode", False)) and not rt.do_sample
    spec_draft = int(getattr(rt, "spec_draft", 8)) if spec_decode else 0
    needed = max(max_extent, final_len + max_new_tokens + spec_draft)
    budget = math.ceil(needed / BUDGET_BUCKET) * BUDGET_BUCKET

    # cross-question prefill reuse (VideoPrefix capture / resume): the plan
    # through the last video chunk is question-independent when
    # prompt_guided_compression is off (reference qwen2_vl.py:670-720)
    n_prefix_steps = 0
    if capture_reserve is not None or prefix is not None:
        if prompt_guided:
            raise PrefixUnsupported(
                "prefix reuse requires prompt_guided_compression off (the "
                "question enters every video chunk via forge)"
            )
        vid_steps = [i for i, p in enumerate(plan) if p["kind"] == "video"]
        if not vid_steps:
            raise ValueError("no video segment: nothing to capture/reuse")
        last_vid = vid_steps[-1]
        split = plan[last_vid]["offset"] + plan[last_vid]["valid"]
        n_prefix_steps = last_vid + 1
        if n_prefix_steps == len(plan):
            raise ValueError(
                "prompt ends with the video span; prefix reuse needs a "
                "trailing text (question) segment to produce the first token"
            )
        plan_sig = tuple(
            (p["kind"], p["offset"], p["valid"], p.get("keep", -1))
            for p in plan[:n_prefix_steps]
        )
        prefix_len = plan[last_vid]["cache_len"] + plan[last_vid]["keep"]
    if prefix is not None:
        if split != prefix.split or not np.array_equal(
            ids[: prefix.split], prefix.prefix_ids
        ):
            raise PrefixMismatch(
                "prompt prefix differs from the captured prefix (same video, "
                "system prompt, and frame count required)"
            )
        if plan_sig != prefix.plan_sig:
            # e.g. dynamic_compression_ratio resolved to different keep_len
            # values for this question's total length (qwen2_vl.py:550-557)
            raise PrefixMismatch(
                "prefill plan diverged from the captured prefix "
                f"(dynamic compression ratio? input_len={s})"
            )
        assert prefix_len == prefix.final_len, (prefix_len, prefix.final_len)
        if needed > prefix.budget:
            raise PrefixBudgetOverflow(
                f"cache budget {prefix.budget} too small for this question "
                f"(needs {needed}); re-encode the prefix with a larger "
                "reserve_tokens"
            )
        budget = prefix.budget
    elif capture_reserve is not None:
        needed = max(
            max_extent,
            prefix_len + capture_reserve + max_new_tokens + spec_draft,
        )
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

    if prefix is not None:
        assert video_embeds is None, (
            "generate(prefix=...) must not also receive video embeddings — "
            "the video KV is already in the prefix cache"
        )
        if image_embeds is not None and np.any(
            np.flatnonzero(ids == image_token_id) < prefix.split
        ):
            raise NotImplementedError(
                "image tokens inside the captured prefix span"
            )
    if video_embeds is not None:
        n_video_tokens = int(np.sum(ids == video_token_id))
        if n_video_tokens != video_embeds.shape[0]:
            # parity with the reference's explicit error
            # (retake/qwen2_vl.py:649-653)
            raise ValueError(
                "Video features and video tokens do not match: tokens: "
                f"{n_video_tokens}, features {video_embeds.shape[0]}"
            )
        vstart = int(np.where(ids == video_token_id)[0][0])
        if not np.all(ids[vstart : vstart + n_video_tokens] == video_token_id):
            # _concat_embeds assumes ONE contiguous video span; a prompt with
            # several video blocks would pass the count check above but get
            # embeddings concatenated at the wrong positions — fail loudly
            # (the reference's masked_scatter handles any layout; multi-span
            # inputs are images here, videos are always a single span)
            raise NotImplementedError(
                "multiple non-contiguous video token spans in one prompt"
            )
        embeds = _concat_embeds(
            params, cfg, jnp.asarray(ids_dev), video_embeds,
            vstart, n_video_tokens,
        )
    else:
        embeds = _build_embeds(params, cfg, jnp.asarray(ids_dev))
    if image_embeds is not None:
        # scatter each contiguous image-token span, consuming the
        # concatenated image embeddings in token order (masked_scatter parity)
        img_idx = np.flatnonzero(ids == image_token_id)
        assert len(img_idx) == image_embeds.shape[0], (
            len(img_idx), image_embeds.shape,
        )
        breaks = np.flatnonzero(np.diff(img_idx) > 1)
        starts = np.concatenate([img_idx[:1], img_idx[breaks + 1]])
        ends = np.concatenate([img_idx[breaks] + 1, img_idx[-1:] + 1])
        off = 0
        for s0, e0 in zip(starts.tolist(), ends.tolist()):
            n = e0 - s0
            embeds = _scatter_embeds(
                embeds, image_embeds[off : off + n], jnp.int32(s0)
            )
            off += n
    video_embeds = image_embeds = None  # scattered into embeds — free now
    pos_dev = jnp.asarray(pos_pad)
    kp_dev = jnp.asarray(kp_pad)

    if prefix is not None:
        # fork the snapshot: chunk steps donate their cache argument, and
        # the original must survive for the video's remaining questions
        # (sharding rides the copy)
        kv = _fork_cache(prefix.cache)
    else:
        kv = cache_lib.init_cache(
            cfg.num_hidden_layers, cfg.num_key_value_heads, budget,
            cfg.head_dim, dtype=embeds.dtype,
            quantized=rt.kv_cache_dtype == "int8",
        )
    if prefix is None and cache_sharding is not None:
        cs = cache_sharding
        if kv.quantized and cs.k_scale is None:
            # scales shard like k/v minus the head_dim axis
            from jax.sharding import NamedSharding, PartitionSpec as P

            sp = P(*tuple(cs.k.spec)[:3])
            cs = dataclasses.replace(
                cs,
                k_scale=NamedSharding(cs.k.mesh, sp),
                v_scale=NamedSharding(cs.v.mesh, sp),
            )
        kv = jax.device_put(kv, cs)

    # 5. run the plan; consecutive plain video chunks fuse into one scan
    hidden = None
    last_valid = 0
    # resume: the prefix steps already live in the forked cache; capture:
    # stop after the last video chunk (the suffix runs per question)
    i = n_prefix_steps if prefix is not None else 0
    n_run = n_prefix_steps if capture_reserve is not None else len(plan)
    hook = on_dispatch if on_dispatch is not None else (lambda: None)
    with timer.stage("prefill_chunks"):
        while i < n_run:
            step = plan[i]
            if step["kind"] == "text":
                hidden, kv = _segment_step(
                    params, cfg, kv, embeds, pos_dev, kp_dev,
                    jnp.int32(step["offset"]), jnp.int32(step["valid"]),
                    jnp.int32(step["valid"]), step["chunk_len"],
                    False, reforge, attn_impl, min(step["bucket"], budget),
                    act_quant,
                )
                hook()
                last_valid = step["valid"]
                i += 1
            elif step.get("prompt_len"):
                hidden, kv = _video_chunk_with_prompt_step(
                    params, cfg, kv, embeds, pos_dev, kp_dev,
                    jnp.int32(step["offset"]), jnp.int32(step["valid"]),
                    jnp.int32(step["keep"]), jnp.int32(prompt_span[0]),
                    step["chunk_len"], step["prompt_len"],
                    compress_video, reforge, attn_impl,
                    min(step["bucket"], budget), act_quant,
                )
                hook()
                last_valid = step["valid"] + step["prompt_len"]
                i += 1
            else:
                j = i
                while (
                    j < len(plan)
                    and plan[j]["kind"] == "video"
                    and not plan[j].get("prompt_len")
                    and plan[j]["chunk_len"] == step["chunk_len"]
                ):
                    j += 1
                group = plan[i:j]
                # fixed-size scan blocks => one compiled scan serves every
                # video length; remainder chunks reuse the single-step jit
                g = SCAN_BLOCK
                for b in range(0, len(group) - len(group) % g, g):
                    blk = group[b : b + g]
                    hidden, kv = _video_segment_scan(
                        params, cfg, kv, embeds, pos_dev, kp_dev,
                        jnp.asarray([x["offset"] for x in blk], jnp.int32),
                        jnp.asarray([x["valid"] for x in blk], jnp.int32),
                        jnp.asarray([x["keep"] for x in blk], jnp.int32),
                        step["chunk_len"], compress_video, reforge, attn_impl,
                        min(blk[-1]["bucket"], budget), act_quant,
                    )
                    hook()
                    last_valid = blk[-1]["valid"]
                for x in group[len(group) - len(group) % g :]:
                    hidden, kv = _segment_step(
                        params, cfg, kv, embeds, pos_dev, kp_dev,
                        jnp.int32(x["offset"]), jnp.int32(x["valid"]),
                        jnp.int32(x["keep"]), x["chunk_len"],
                        compress_video, reforge, attn_impl,
                        min(x["bucket"], budget), act_quant,
                    )
                    hook()
                    last_valid = x["valid"]
                i = j

    if capture_reserve is not None:
        # host read of the advanced length scalar: fences the queued prefix
        # steps (block_until_ready is a no-op through the axon tunnel) and
        # validates the device fill against the host plan
        fill = int(kv.length)
        assert fill == prefix_len, (fill, prefix_len)
        timer.report()
        return VideoPrefix(
            cache=kv, final_len=prefix_len, budget=budget, split=split,
            prefix_ids=np.asarray(ids[:split]).copy(), plan_sig=plan_sig,
            prefill_seconds=time.perf_counter() - t_start,
            stages=dict(timer.totals) if timer.totals else None,
        )

    # sampling config (reference forwards do_sample to HF generate,
    # infer_eval.py:53,110); greedy when do_sample is false
    early_stop_decode = bool(getattr(rt, "decode_early_stop", False))
    sampling = None
    rng_first = rng_loop = None
    if rt.do_sample:
        sampling = (
            float(getattr(rt, "temperature", 1.0)),
            float(getattr(rt, "top_p", 1.0)),
            int(getattr(rt, "top_k", 0)),
        )
        base_key = jax.random.key(int(getattr(rt, "seed", 0)))
        rng_first = jax.random.fold_in(base_key, 0)
        rng_loop = jax.random.fold_in(base_key, 1)

    with timer.stage("first_token"):
        token = _final_token(
            params, cfg, hidden, jnp.int32(last_valid - 1), sampling, rng_first
        )
        token_host = int(token)  # prefill ends when first token is ready
    t_prefill = time.perf_counter() - t_start

    if prefill_only:
        timer.report()
        result = GenerationResult(
            tokens=np.asarray([token_host]),
            prefill_seconds=t_prefill,
            cache_len=final_len,
            input_len=s,
            stages=dict(timer.totals) if timer.totals else None,
        )
        need = min(attn_bucket(final_len + max_new_tokens), budget)
        if need < budget:
            kv = _trim_cache(kv, need)
        return PrefillState(
            cache=kv, first_token_host=token_host,
            decode_pos_base=decode_pos_base, final_len=final_len,
            reforge=reforge, result=result, attn_need=need,
        )

    # 6. decode: one scanned device loop, trim at EOS on host
    t0 = time.perf_counter()
    out_tokens = [token_host]
    if max_new_tokens > 1 and token_host != cfg.eos_token_id:
        with timer.stage("decode"):
            if spec_decode:
                # prompt-lookup speculation (greedy only): match against
                # the last POOL_PROMPT prompt ids + everything generated
                tail = np.full(POOL_PROMPT, -1, np.int32)
                t = ids[-POOL_PROMPT:].astype(np.int32)
                tail[POOL_PROMPT - len(t):] = t
                tokens, kv, n_emit, n_steps = _spec_decode_loop(
                    params, cfg, kv, token, jnp.int32(decode_pos_base),
                    jnp.asarray(tail),
                    max_new_tokens - 1,
                    int(getattr(rt, "spec_ngram", 3)), spec_draft,
                    reforge, attn_impl,
                    min(attn_bucket(final_len + max_new_tokens + spec_draft),
                        budget),
                )
                tokens = np.asarray(tokens)[: max_new_tokens - 1]
                timer.totals["spec_tokens_per_step"] = round(
                    int(n_emit) / max(int(n_steps), 1), 3
                )
            else:
                tokens, kv = _decode_loop(
                    params, cfg, kv, token,
                    jnp.int32(decode_pos_base), max_new_tokens - 1,
                    reforge, attn_impl,
                    min(attn_bucket(final_len + max_new_tokens), budget),
                    sampling, rng_loop,
                    early_stop=early_stop_decode,
                )
                tokens = np.asarray(tokens)
        eos = np.flatnonzero(tokens == cfg.eos_token_id)
        end = (eos[0] + 1) if len(eos) else len(tokens)
        out_tokens.extend(tokens[:end].tolist())
    t_decode = time.perf_counter() - t0

    timer.report()
    return GenerationResult(
        tokens=np.asarray(out_tokens),
        prefill_seconds=t_prefill,
        decode_seconds=t_decode,
        cache_len=final_len,
        input_len=s,
        stages=dict(timer.totals) if timer.totals else None,
    )


@partial(jax.jit, donate_argnames=("buf",))
def _insert_batch_slot(buf, x, slot):
    """Write one request's cache array into batch slot ``slot`` (axis 1) in
    place (donated), so batched-cache assembly peaks at aggregate + ONE
    request instead of 2x aggregate."""
    return jax.lax.dynamic_update_index_in_dim(buf, x, slot, axis=1)


def decode_batch(
    params,
    cfg: Qwen2VLConfig,  # text config
    rt: RetakeConfig,
    states: List[PrefillState],
    max_new_tokens: int,
    attn_impl: str = "xla",  # batched-decode attention path. "xla" is the
    #   measured default HERE: decode_batch groups requests per attention
    #   bucket (uniform live fraction ~1), where the dead-block-skipping
    #   kernel has nothing to skip and runs 0.74-0.99x the einsum
    #   (tools/decode_gapped_bench.py). The kernel pays off in CONTINUOUS
    #   serving (runtime/serve.py: one shared 2048-aligned bucket, mixed
    #   tenants — end-to-end 1.40x bf16 B=4 and 1.29x int8 B=8 (736.9 vs
    #   573.4 tok/s) with the row-aligned kernel blocks; serve's
    #   decode_attn_impl="auto" selects it on accelerators,
    #   tools/serve_decode_bisect.py + serve_bench 2026-08-20).
    early_stop: bool = False,  # while_loop decode: stop once every
    #   request in the batch has emitted EOS — token-identical, and with
    #   real checkpoints (answers of a few tokens vs max_new=128) it
    #   skips the dead tail of the static scan. Opt-in until the
    #   while_loop step cost is measured on-chip vs the scan.
    req_max: Optional[List[int]] = None,  # per-request TOTAL token budgets
    #   (len == len(states)). With early_stop, a slot counts as done once
    #   its own budget is emitted, so a batch mixing max_new_tokens=2 with
    #   512 stops at the longest LIVE stream instead of decoding every
    #   slot to the batch max. Token-identical: post-budget outputs are
    #   masked EOS and trimmed by the existing harvest.
) -> List[GenerationResult]:
    """Batched decode over prefilled requests (see Engine.generate_batch).

    Assembles [L, B, KV, S_attn, D] gap-layout caches (each request's valid
    prefill occupies [0, final_len); all requests' decode tokens share the
    uniform region starting at max(final_len)) and runs one scanned batched
    decode loop. Assembly is incremental with donation so peak HBM is the
    batched cache + ONE request, and it consumes each state's cache
    (``st.cache`` becomes None).
    """
    import time

    if not states:
        return []
    # all states must come from engines with the same reforge setting: the
    # per-layer position bases below are derived differently per mode, and a
    # mixed batch would silently decode some requests at wrong positions
    assert all(st.reforge == states[0].reforge for st in states), (
        "decode_batch: mixed reforge settings across prefill states"
    )
    reforge = states[0].reforge

    t0 = time.perf_counter()
    out_tokens = [[st.first_token_host] for st in states]
    live = [
        i for i, st in enumerate(states)
        if st.first_token_host != cfg.eos_token_id
    ]
    if max_new_tokens > 1 and live:
        gap_start = max(states[i].final_len for i in live)
        attn_need = _attn_bucket(gap_start + max_new_tokens)
        nb = len(live)
        quantized = states[live[0]].cache.quantized
        k_all = v_all = ks_all = vs_all = None
        base_cols = []
        for bi, i in enumerate(live):
            c = states[i].cache
            fl = states[i].final_len
            if reforge:
                # per-layer temporal continuation base (the discontinuity
                # fix the single-request path re-reads per step)
                base_cols.append(c.pos[:, 0, fl - 1] + 1)
            else:
                base_cols.append(
                    jnp.full(
                        (c.k.shape[0],), states[i].decode_pos_base, jnp.int32
                    )
                )
            ks = c.k[:, :, :attn_need]  # [L, KV, <=S_attn, D]
            vs = c.v[:, :, :attn_need]
            scs = None
            if quantized:
                scs = (c.k_scale[:, :, :attn_need], c.v_scale[:, :, :attn_need])
            states[i].cache = None  # free the full buffer
            if ks.shape[2] < attn_need:
                padn = attn_need - ks.shape[2]
                pad = ((0, 0), (0, 0), (0, padn), (0, 0))
                ks, vs = jnp.pad(ks, pad), jnp.pad(vs, pad)
                if quantized:
                    spad = ((0, 0), (0, 0), (0, padn))
                    scs = (jnp.pad(scs[0], spad), jnp.pad(scs[1], spad))
            # [L, B, KV, S_attn, D]: L leads for the layer scan
            if k_all is None:
                k_all = jnp.zeros(
                    (ks.shape[0], nb) + ks.shape[1:], ks.dtype
                )
                v_all = jnp.zeros_like(k_all)
                if quantized:
                    ks_all = jnp.zeros(
                        (ks.shape[0], nb) + scs[0].shape[1:], jnp.float32
                    )
                    vs_all = jnp.zeros_like(ks_all)
            k_all = _insert_batch_slot(k_all, ks, jnp.int32(bi))
            v_all = _insert_batch_slot(v_all, vs, jnp.int32(bi))
            if quantized:
                ks_all = _insert_batch_slot(ks_all, scs[0], jnp.int32(bi))
                vs_all = _insert_batch_slot(vs_all, scs[1], jnp.int32(bi))
            del ks, vs, scs
        for st in states:
            st.cache = None
        base_t = jnp.stack(base_cols, axis=1).astype(jnp.int32)  # [L, B]
        first = jnp.asarray([states[i].first_token_host for i in live], jnp.int32)
        pos_bases = jnp.asarray(
            [states[i].decode_pos_base for i in live], jnp.int32
        )
        final_lens = jnp.asarray(
            [states[i].final_len for i in live], jnp.int32
        )
        sampling = None
        if rt.do_sample:
            sampling = (
                float(getattr(rt, "temperature", 1.0)),
                float(getattr(rt, "top_p", 1.0)),
                int(getattr(rt, "top_k", 0)),
            )
        base_key = jax.random.key(int(getattr(rt, "seed", 0)))
        rng_loop = jax.random.fold_in(base_key, 1)
        max_steps = None
        if req_max is not None:
            max_steps = jnp.asarray(
                [int(req_max[i]) - 1 for i in live], jnp.int32
            )
        tokens, caches_out = _decode_loop_batch(
            params, cfg, k_all, v_all, base_t, pos_bases, final_lens,
            jnp.int32(gap_start), first, max_new_tokens - 1,
            sampling, rng_loop, ks_all, vs_all,
            attn_impl=attn_impl, early_stop=early_stop,
            max_steps=max_steps,
        )
        del k_all, v_all, ks_all, vs_all, caches_out  # returned for aliasing
        tokens = np.asarray(tokens)  # [steps, B]
        for bi, i in enumerate(live):
            col = tokens[:, bi]
            eos = np.flatnonzero(col == cfg.eos_token_id)
            end = (eos[0] + 1) if len(eos) else len(col)
            out_tokens[i].extend(col[:end].tolist())
    t_decode = time.perf_counter() - t0

    results = []
    for i, st in enumerate(states):
        r = st.result
        results.append(
            GenerationResult(
                tokens=np.asarray(out_tokens[i]),
                prefill_seconds=r.prefill_seconds,
                decode_seconds=t_decode,  # shared batched-decode wall time
                cache_len=r.cache_len,
                input_len=r.input_len,
                stages=r.stages,
            )
        )
    return results

"""Qwen2(-VL) text decoder: layer-scanned GQA + M-RoPE + PivotKV chunk step.

Native JAX re-design of the reference's patched attention/forward path
(retake/qwen2_vl.py:42-122 attention semantics, retake/longvideo_cache.py:217-323
eviction semantics), structured TPU-first:

* parameters are stacked per-layer ([L, ...]) and the 28 layers run under one
  ``lax.scan`` — single compiled layer body, per-layer KV-cache slices stream
  through as scan xs/ys;
* each layer recomputes its own RoPE tables because positions are *per-layer*
  after eviction (the reference's per-layer ``rotary_emb`` + discontinuity fix,
  qwen2_vl.py:67-79): the chunk's temporal position row is rebased so it
  continues the layer's cached last temporal id + 1;
* eviction produces a compaction permutation (ops/pivotkv.py) and the chunk
  writes one block per layer at the running cache offset — no dynamic shapes;
* everything in this module is functionally pure; the engine (runtime/) owns
  jit boundaries, donation and bucket growth.

Numerics parity: bf16 activations, fp32 RMSNorm statistics, fp32 attention
softmax (flash-attn-like), fp32 eviction scoring at highest matmul precision,
and the rotate -> de-rotate -> re-rotate bf16 round-trip exactly as the
reference performs it.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig
from retake_tpu.ops import attention as attn_ops
from retake_tpu.ops import pivotkv, rope
from retake_tpu.runtime.cache import KVCache, append_blocks


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return weight * normed


def _linear(x, p, bias_key="b", act_int8=False):
    """Linear over a weight dict; dispatches on int8 quantization
    (ops/quantization.qlinear): weight-only dequant is exact (the per-output
    -channel scale commutes with the contraction) and XLA's int8 dot streams
    the int8 weights converting in-core (a hand-written Pallas fused-dequant
    matvec measured 2.7x SLOWER at 7B decode — single-row matmuls starve the
    MXU). ``act_int8`` = W8A8 (prefill only): int8 x int8 on the MXU's
    double-rate path."""
    from retake_tpu.ops.quantization import qlinear

    return qlinear(x, p, act_int8, bias_key)


def _shared_quant_linears(x, lps, act_int8):
    """Run several linears off the SAME input: under W8A8 the activation
    quantization happens once and is shared (q/k/v and gate/up read one
    quantized copy of x instead of re-rounding it per projection)."""
    if not act_int8:
        return [_linear(x, lp) for lp in lps]
    from retake_tpu.ops import quantization as q8

    xq, xs = q8.quantize_acts(x)
    outs = []
    for lp in lps:
        y = q8.int8_matmul_prequant(xq, xs, lp["w"], lp["scale"], x.dtype)
        b = lp.get("b")
        outs.append(y if b is None else y + b)
    return outs


def _heads(x: jax.Array, num_heads: int, head_dim: int) -> jax.Array:
    """[S, H*D] -> [H, S, D]"""
    s = x.shape[0]
    return x.reshape(s, num_heads, head_dim).transpose(1, 0, 2)


def _unheads(x: jax.Array) -> jax.Array:
    """[H, S, D] -> [S, H*D]"""
    h, s, d = x.shape
    return x.transpose(1, 0, 2).reshape(s, h * d)


def _layer_qkv(cfg, lp, hidden, cos, sin, act_quant):
    """Norm -> q/k/v projections -> RoPE, the shared front half of a decoder
    layer. ``hidden`` is [N, d] where N is the token axis (a chunk's tokens,
    or the B requests of a batched decode step); returns [H, N, D] heads with
    ``cos``/``sin`` broadcast over the head axis. Single source of truth for
    these numerics — both the chunk/decode path (``_layer``) and the batched
    decode step (``decode_step_batch``) route through here."""
    x = rms_norm(hidden, lp["input_ln"], cfg.rms_norm_eps)
    q, k, v = _shared_quant_linears(x, (lp["q"], lp["k"], lp["v"]), act_quant)
    q = _heads(q, cfg.num_attention_heads, cfg.head_dim)
    k = _heads(k, cfg.num_key_value_heads, cfg.head_dim)
    v = _heads(v, cfg.num_key_value_heads, cfg.head_dim)
    return rope.apply_rope(q, cos, sin), rope.apply_rope(k, cos, sin), v


def _layer_out_mlp(cfg, lp, hidden, attn_flat, act_quant):
    """o-projection residual + MLP, the shared back half of a decoder layer.
    ``attn_flat`` is the attention output flattened to [N, H*D]."""
    hidden = hidden + _linear(attn_flat, lp["o"], act_int8=act_quant)
    x2 = rms_norm(hidden, lp["post_ln"], cfg.rms_norm_eps)
    gate_y, up_y = _shared_quant_linears(x2, (lp["gate"], lp["up"]), act_quant)
    mlp = _linear(jax.nn.silu(gate_y) * up_y, lp["down"], act_int8=act_quant)
    return hidden + mlp


def _layer(
    cfg: Qwen2VLConfig,
    inv_freq: jax.Array,
    attention_scaling: float,
    compress: bool,
    reforge: bool,
    attn_impl: str,
    attn_budget,
    act_quant: bool,
    carry,
    xs,
):
    """One decoder layer over one chunk. Scanned over the layer axis."""
    hidden, pos3, valid_len, keypatch, keep_len, cache_len = carry
    lp, ck, cv, cpos, cks, cvs = xs
    if attn_budget is not None and attn_budget < ck.shape[1]:
        # static attention window: the engine knows the cache fill level per
        # chunk ahead of time, so early chunks attend a small prefix slice of
        # the budget buffer instead of the whole thing (huge FLOP save)
        ck_attn = jax.lax.slice_in_dim(ck, 0, attn_budget, axis=1)
        cv_attn = jax.lax.slice_in_dim(cv, 0, attn_budget, axis=1)
        cks_attn = None if cks is None else jax.lax.slice_in_dim(
            cks, 0, attn_budget, axis=1
        )
        cvs_attn = None if cvs is None else jax.lax.slice_in_dim(
            cvs, 0, attn_budget, axis=1
        )
    else:
        ck_attn, cv_attn = ck, cv
        cks_attn, cvs_attn = cks, cvs
    h_dim, kv_heads = cfg.head_dim, cfg.num_key_value_heads
    n_heads = cfg.num_attention_heads
    s = hidden.shape[0]

    # Per-layer temporal rebase (reference discontinuity fix, qwen2_vl.py:67-73):
    # continue this layer's cached temporal ids contiguously.
    if reforge:
        prev_t = jnp.where(
            cache_len > 0, cpos[0, jnp.maximum(cache_len - 1, 0)], -1
        )
        delta = prev_t + 1 - pos3[0, 0]
        pos_layer = pos3.at[0].add(delta)
    else:
        pos_layer = pos3

    if cfg.mrope_section is None:
        # 1-D RoPE (LLaVA-OneVision Qwen2 decoder): row 0 is the position
        cos, sin = rope.compute_cos_sin(
            inv_freq, pos_layer[0], attention_scaling, hidden.dtype
        )  # [S, D]
    else:
        cos3, sin3 = rope.compute_cos_sin(
            inv_freq, pos_layer[:, None, :], attention_scaling, hidden.dtype
        )  # [3, 1, S, D]
        cos = rope.select_mrope(cos3, cfg.mrope_section)[0]  # [S, D]
        sin = rope.select_mrope(sin3, cfg.mrope_section)[0]
    q_rot, k_rot, v = _layer_qkv(cfg, lp, hidden, cos, sin, act_quant)

    # Scoring inputs for PivotKV eviction: under pos_embed_reforge the
    # reference de-rotates q/k (bf16 round trip) before scoring
    # (longvideo_cache.py:248-259). Computed before attention so the Pallas
    # path can fuse the scoring softmax into the attention kernel.
    fused_scores = None
    if compress:
        if reforge:
            q_s = rope.apply_rope(
                q_rot, cos, sin, reverse=True, attention_scaling=attention_scaling
            )
            k_s = rope.apply_rope(
                k_rot, cos, sin, reverse=True, attention_scaling=attention_scaling
            )
        else:
            q_s, k_s = q_rot, k_rot

    # int8-cache prefill (pallas path): quantize the chunk's keys/values ONCE
    # here — the SAME int8 blocks + scales feed the flash kernel's [cache |
    # chunk] span AND the cache append (permuted by the eviction compaction),
    # so there is a single rounding site. Only reforge re-quantizes keys, and
    # there the appended keys are genuinely different data (de-rotated,
    # rescaled, re-rotated).
    kq = ksc = vq = vsc = None
    if cks is not None and attn_impl == "pallas" and s > 1:
        from retake_tpu.ops.quantization import quantize_kv_block

        kq, ksc = quantize_kv_block(k_rot)
        vq, vsc = quantize_kv_block(v)

    if s == 1:
        # single-token decode: same layer math as decode_step_batch (both
        # route through _layer_qkv/_layer_out_mlp); only the attention
        # cache layout differs (single static buffer vs gap-layout batch)
        if attn_impl == "xla":
            attn_out = attn_ops.chunk_prefill_attention(
                q_rot, ck_attn, cv_attn, cache_len, k_rot, v, valid_len,
                k_scale=cks_attn, v_scale=cvs_attn,
            )
        else:
            # decode: append-free single-token attention — concatenating the
            # cache would copy the whole multi-GB buffer every step
            attn_out = attn_ops.decode_attention_appendfree(
                q_rot, ck_attn, cv_attn, cache_len, k_rot, v,
                k_scale=cks_attn, v_scale=cvs_attn,
            )
    elif attn_impl == "pallas":
        from retake_tpu.ops.pallas.flash_prefill import flash_prefill_attention

        attn_out = flash_prefill_attention(
            q_rot, ck_attn, cv_attn, cache_len,
            kq if kq is not None else k_rot,
            vq if vq is not None else v,
            valid_len,
            k_scale=cks_attn, v_scale=cvs_attn,
            new_scales=None if kq is None else (ksc, vsc),
        )
        if compress:
            # single-pass Pallas scoring: no [H, S, S] fp32 probability
            # tensor in HBM (the XLA eviction_scores path pays ~0.5 GB of
            # probs traffic per layer per chunk at production shapes)
            from retake_tpu.ops.pallas.pivot_scores import pivot_score_sums

            score_sums = pivot_score_sums(q_s, k_s, valid_len)
            group = n_heads // kv_heads
            fused_scores = score_sums.sum(axis=0) / (kv_heads * group)
    elif attn_impl == "flash":
        attn_out = attn_ops.flash_chunk_attention(
            q_rot, ck_attn, cv_attn, cache_len, k_rot, v, valid_len,
            k_scale=cks_attn, v_scale=cvs_attn,
        )
    else:
        attn_out = attn_ops.chunk_prefill_attention(
            q_rot, ck_attn, cv_attn, cache_len, k_rot, v, valid_len,
            k_scale=cks_attn, v_scale=cvs_attn,
        )
    hidden = _layer_out_mlp(cfg, lp, hidden, _unheads(attn_out), act_quant)

    # --- cache block for this layer (int8 mode: blocks leave pre-quantized
    # with their scales riding along as scan ys; bf16 mode: ks/vs stay None)
    valid_mask = jnp.arange(s) < valid_len
    ks_block = vs_block = None
    if not compress:
        if kq is not None:
            k_block, v_block, pos_block = kq, vq, pos_layer
            ks_block, vs_block = ksc, vsc
        else:
            k_block, v_block, pos_block = k_rot, v, pos_layer
    else:
        if fused_scores is not None:
            # keypatch force-keep + padding masking on the kernel's raw
            # attention-mass sums (parity with pivotkv.eviction_scores)
            scores = fused_scores
            if keypatch is not None:
                scores = jnp.where(keypatch, 1.0, scores)
            scores = jnp.where(valid_mask, scores, pivotkv.NEG_INF)
        else:
            scores = pivotkv.eviction_scores(q_s, k_s, valid_mask, keypatch)
        perm, kept_mask = pivotkv.keep_partition(scores, keep_len)
        if vq is not None:
            # per-token scales: quantize-then-permute == permute-then-quantize
            v_block, vs_block = vq[:, perm], vsc[:, perm]
        else:
            v_block = v[:, perm]
        pos_block = pos_layer[:, perm]
        if reforge:
            k_gathered = k_s[:, perm]
            new_t = pivotkv.rescale_temporal_positions(
                pos_block[0], kept_mask, keep_len, valid_len
            )
            pos_block = pos_block.at[0].set(new_t)
            if cfg.mrope_section is None:
                cos_c, sin_c = rope.compute_cos_sin(
                    inv_freq, pos_block[0], attention_scaling, hidden.dtype
                )
            else:
                cos3c, sin3c = rope.compute_cos_sin(
                    inv_freq, pos_block[:, None, :], attention_scaling,
                    hidden.dtype,
                )
                cos_c = rope.select_mrope(cos3c, cfg.mrope_section)[0]
                sin_c = rope.select_mrope(sin3c, cfg.mrope_section)[0]
            k_block = rope.apply_rope(k_gathered, cos_c, sin_c)
            if kq is not None:
                # reforge rewrote the keys (de-rotate -> rescale -> re-rotate)
                # — this is a fresh quantization of NEW data, not a duplicate
                from retake_tpu.ops.quantization import quantize_kv_block

                k_block, ks_block = quantize_kv_block(k_block)
        else:
            if kq is not None:
                k_block, ks_block = kq[:, perm], ksc[:, perm]
            else:
                k_block = k_rot[:, perm]

    carry = (hidden, pos3, valid_len, keypatch, keep_len, cache_len)
    return carry, (k_block, v_block, pos_block, ks_block, vs_block)


def decoder_chunk(
    params: dict,
    cfg: Qwen2VLConfig,
    cache: KVCache,
    hidden: jax.Array,  # [S, d] chunk input embeddings
    pos3: jax.Array,  # [3, S] int32 global position ids
    valid_len: jax.Array,  # scalar int32
    keypatch: jax.Array,  # [S] bool (ignored unless compress)
    keep_len: jax.Array,  # scalar int32 (ignored unless compress)
    compress: bool,
    reforge: bool,
    attn_impl: str = "xla",
    attn_budget: int | None = None,
    act_quant: bool = False,
) -> Tuple[jax.Array, KVCache]:
    """Run one chunk through all layers; returns (hidden_out, updated cache).

    ``attn_budget``: static prefix of the cache buffer this chunk may attend
    to (must be >= the runtime cache_len when the chunk runs); None = full.
    ``act_quant``: W8A8 — run the seven decoder linears int8 x int8 on the
    MXU (requires int8-quantized weights; see ops/quantization.py).
    """
    inv_freq_np, attention_scaling = cfg.rope_params()
    inv_freq = jnp.asarray(inv_freq_np)

    def body(carry, xs):
        return _layer(
            cfg, inv_freq, attention_scaling, compress, reforge, attn_impl,
            attn_budget, act_quant, carry, xs,
        )

    carry0 = (hidden, pos3, valid_len, keypatch, keep_len, cache.length)
    xs = (
        params["layers"], cache.k, cache.v, cache.pos,
        cache.k_scale, cache.v_scale,  # None in bf16 mode
    )
    carry, blocks = jax.lax.scan(body, carry0, xs)
    k_blocks, v_blocks, pos_blocks, ks_blocks, vs_blocks = blocks
    advance = keep_len if compress else valid_len
    new_cache = append_blocks(
        cache, k_blocks, v_blocks, pos_blocks, advance,
        k_scales=ks_blocks, v_scales=vs_blocks,
    )
    return carry[0], new_cache


def decode_step_batch(
    params: dict,
    cfg: Qwen2VLConfig,
    k_all: jax.Array,  # [L, B, KV, S_attn, D] batched gap-layout key cache
    v_all: jax.Array,
    hidden: jax.Array,  # [B, d] current-token embeddings
    base_t: jax.Array,  # [L, B] int32 per-layer temporal position base
    pos_rest: jax.Array,  # [B] int32 — M-RoPE rows 1/2 position this step
    final_len: jax.Array,  # [B] int32 prefill lengths
    gap_start: jax.Array,  # scalar int32 — uniform decode-region base slot
    gap_filled: jax.Array,  # scalar int32 — decode steps already written
    ks_all=None,  # [L, B, KV, S_attn] f32 — int8 cache mode
    vs_all=None,
    dec_start=None,  # [B] int32 — per-slot decode-region start (continuous
    #   batching); None = gap_start for every slot
    attn_impl: str = "xla",  # "pallas"/"flash": dead-block-skipping decode
    #   kernel (ops/pallas/decode_gapped.py); "xla": full-bucket einsum
):
    """One batched decode step: linears run directly on [B, d] rows and
    attention on batched einsums (no vmap), over gap-layout caches
    (ops/attention.decode_attention_batch_gapped).

    Positions are continued analytically: layer l's temporal row is
    ``base_t[l] + gap_filled`` — the same value the single-request path
    derives by reading the layer's position cache each step (the
    discontinuity fix, reference qwen2_vl.py:67-73), but without the
    per-step [L, budget] position reads. Rows 1/2 stay ``pos_rest``
    (decode positions from the pre-compression length). Returns
    (hidden_out [B, d], k_blocks [L, B, KV, D], v_blocks) — the caller
    writes the blocks at the uniform slot.

    The per-layer numerics (norm/qkv/rope and o-proj/MLP) are the SAME code
    as the single-request path — ``_layer_qkv`` / ``_layer_out_mlp``, with
    the batch axis standing in for the token axis — so batched and
    sequential decode cannot drift (greedy batched-vs-sequential parity is
    additionally pinned by tests/test_engine.py). Only the attention call
    differs: gap-layout batched caches vs the append-free single cache.
    int8 weights take the exact weight-only dequant in ``_linear`` — decode
    is HBM-bound, W8A8 activation quant is prefill-only by design.
    """
    inv_freq_np, attention_scaling = cfg.rope_params()
    inv_freq = jnp.asarray(inv_freq_np)
    b = hidden.shape[0]
    # pallas path: the layer scan closes over the FULL stacked caches and
    # hands the kernel a layer INDEX (scalar prefetch) — scanning the caches
    # as xs hands each layer a dynamic-slice operand that XLA must
    # MATERIALIZE for the Mosaic call (~2 x 172 MB HBM copies per layer at
    # B=4/41k serving shapes; measured +17 ms/step — slower than the whole
    # XLA-einsum step). The einsum path keeps the xs slices: XLA fuses the
    # slice into the attention reads for free.
    stacked = attn_impl in ("pallas", "flash")

    def body(hidden, xs):
        if stacked:
            lp, bt, li = xs
            ck, cv, cks, cvs = k_all, v_all, ks_all, vs_all
        else:
            lp, ck, cv, bt, cks, cvs = xs
            li = None
        row0 = bt + gap_filled  # [B]
        if cfg.mrope_section is None:
            cos, sin = rope.compute_cos_sin(
                inv_freq, row0, attention_scaling, hidden.dtype
            )  # [B, D]
        else:
            pos3 = jnp.stack([row0, pos_rest, pos_rest])  # [3, B]
            cos3, sin3 = rope.compute_cos_sin(
                inv_freq, pos3, attention_scaling, hidden.dtype
            )  # [3, B, D]
            cos = rope.select_mrope(cos3, cfg.mrope_section)
            sin = rope.select_mrope(sin3, cfg.mrope_section)
        # shared layer math in [H, B, D] head layout (batch = token axis)
        q_rot, k_rot, v = _layer_qkv(cfg, lp, hidden, cos, sin, False)
        k_b, v_b = k_rot.transpose(1, 0, 2), v.transpose(1, 0, 2)  # [B,KV,D]
        attn = attn_ops.decode_attention_batch_gapped(
            q_rot.transpose(1, 0, 2), ck, cv, final_len, gap_start,
            gap_filled, k_b, v_b, k_scale=cks, v_scale=cvs,
            dec_start=dec_start, layer=li, impl=attn_impl,
        )  # [B, H, D]
        hidden = _layer_out_mlp(cfg, lp, hidden, attn.reshape(b, -1), False)
        return hidden, (k_b, v_b)

    if stacked:
        xs = (params["layers"], base_t,
              jnp.arange(k_all.shape[0], dtype=jnp.int32))
    else:
        xs = (params["layers"], k_all, v_all, base_t, ks_all, vs_all)
    hidden, (k_blocks, v_blocks) = jax.lax.scan(body, hidden, xs)
    return hidden, k_blocks, v_blocks


def final_logits_batch(params: dict, cfg: Qwen2VLConfig, hidden: jax.Array):
    """Final RMSNorm + LM head on a batch of hidden states [B, d] -> [B, V]."""
    h = rms_norm(hidden, params["final_ln"], cfg.rms_norm_eps)
    head = params.get("lm_head")
    if head is not None:
        logits = _linear(h, head) if isinstance(head, dict) else h @ head
    else:  # tied embeddings
        e = params["embed_tokens"]
        if isinstance(e, dict):
            logits = (h @ e["w"].T.astype(h.dtype)) * e["scale"].astype(h.dtype)
        else:
            logits = h @ e.T
    return logits.astype(jnp.float32)


def final_logits(params: dict, cfg: Qwen2VLConfig, hidden_last: jax.Array):
    """Final RMSNorm + LM head on a single token's hidden state [d] -> [V]."""
    h = rms_norm(hidden_last[None, :], params["final_ln"], cfg.rms_norm_eps)[0]
    head = params.get("lm_head")
    if head is not None:
        if isinstance(head, dict):
            logits = _linear(h[None, :], head)[0]
        else:
            logits = h @ head
    else:  # tied embeddings (Qwen2-VL-2B)
        e = params["embed_tokens"]
        if isinstance(e, dict):
            # per-row embed scale becomes a per-logit scale after transpose
            logits = (h @ e["w"].T.astype(h.dtype)) * e["scale"].astype(h.dtype)
        else:
            logits = h @ e.T
    return logits.astype(jnp.float32)


def embed(params: dict, token_ids: jax.Array) -> jax.Array:
    e = params["embed_tokens"]
    if isinstance(e, dict):
        dtype = params["final_ln"].dtype  # activation dtype of the model
        rows = e["w"][token_ids].astype(dtype)
        return rows * e["scale"][token_ids][:, None].astype(dtype)
    return e[token_ids]

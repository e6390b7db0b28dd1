"""Pure-numpy oracle of the full ReTaKe chunked-prefill + PivotKV + reforge +
decode loop, transcribed from the REFERENCE code paths (not from retake_tpu):

  * chunk loop / forge:   /root/reference/retake/qwen2_vl.py:670-733, 493-519
  * attention + per-layer
    temporal rebase:      /root/reference/retake/qwen2_vl.py:42-122 (67-73)
  * PivotKV eviction:     /root/reference/retake/longvideo_cache.py:217-323
  * RoPE reverse/scaling: /root/reference/retake/longvideo_cache.py:36-116

Structured like the reference — python lists of dynamically-shaped per-layer
K/V/position caches, eviction by actual gather-shrink — so it independently
validates the static-shape compaction design in retake_tpu (tests/test_engine
asserts token-exact agreement through prefill_and_decode).
"""

from __future__ import annotations

import math
from typing import List

import numpy as np

from retake_tpu.ops import rope as rope_lib


def _rotate_half(x):
    half = x.shape[-1] // 2
    return np.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


class RetakeOracle:
    """Batch-1, fp32, argmax decode. ``params`` is the retake_tpu pytree
    (numpy-converted); all math below re-derives the reference semantics."""

    def __init__(self, params, cfg, *, ratio, reforge, prompt_guided):
        self.p = {k: np.asarray(v) if not isinstance(v, dict) else v
                  for k, v in params.items()}
        self.layers = {
            k: (np.asarray(v) if not isinstance(v, dict)
                else {k2: np.asarray(v2) for k2, v2 in v.items()})
            for k, v in params["layers"].items()
        }
        self.cfg = cfg
        self.ratio = ratio
        self.reforge = reforge
        self.prompt_guided = prompt_guided
        inv_freq, self.attn_scaling = cfg.rope_params()
        self.inv_freq = np.asarray(inv_freq, np.float32)
        self.L = cfg.num_hidden_layers
        # dynamic per-layer caches, exactly like DynamicCache + position_cache
        self.K: List[np.ndarray] = [None] * self.L  # [kv, T, D] rotated keys
        self.V: List[np.ndarray] = [None] * self.L
        self.P: List[np.ndarray] = [None] * self.L  # [3, T] position ids

    # ---- RoPE (longvideo_cache.py:36-116) ----
    def _cos_sin(self, pos3):
        freqs = pos3[..., None].astype(np.float32) * self.inv_freq  # [3,S,hd/2]
        emb = np.concatenate([freqs, freqs], axis=-1)  # [3, S, hd]
        cos = np.cos(emb) * self.attn_scaling
        sin = np.sin(emb) * self.attn_scaling
        if self.cfg.mrope_section is None:
            # 1-D RoPE (LLaVA-OneVision Qwen2 decoder): row 0 is the position
            return cos[0], sin[0]
        sec = list(self.cfg.mrope_section) * 2
        pieces_c, pieces_s, off = [], [], 0
        for i, s in enumerate(sec):
            pieces_c.append(cos[i % 3, :, off : off + s])
            pieces_s.append(sin[i % 3, :, off : off + s])
            off += s
        return np.concatenate(pieces_c, -1), np.concatenate(pieces_s, -1)

    def _rope(self, x, cos, sin, reverse=False):
        # x [H, S, D]; cos/sin [S, D]
        if reverse:
            return (x * cos - _rotate_half(x) * sin) / (self.attn_scaling**2)
        return x * cos + _rotate_half(x) * sin

    # ---- one decoder layer over one chunk (qwen2_vl.py:42-122) ----
    def _layer(self, li, x, pos3, keypatch, compress, keep_len):
        cfg = self.cfg
        lp = {k: (v[li] if not isinstance(v, dict)
                  else {k2: v2[li] for k2, v2 in v.items()})
              for k, v in self.layers.items()}
        h_dim, kv, nh = cfg.head_dim, cfg.num_key_value_heads, cfg.num_attention_heads
        s = x.shape[0]

        def rms(v, w):
            var = (v.astype(np.float32) ** 2).mean(-1, keepdims=True)
            return (v * (1.0 / np.sqrt(var + cfg.rms_norm_eps))) * w

        def heads(m, n):
            return m.reshape(s, n, h_dim).transpose(1, 0, 2)

        xn = rms(x, lp["input_ln"])
        q = heads(xn @ lp["q"]["w"] + lp["q"]["b"], nh)
        k = heads(xn @ lp["k"]["w"] + lp["k"]["b"], kv)
        v = heads(xn @ lp["v"]["w"] + lp["v"]["b"], kv)

        # per-layer temporal rebase (qwen2_vl.py:67-73)
        pos3 = pos3.copy()
        if self.reforge:
            prev_t = self.P[li][0, -1] if self.P[li] is not None else -1
            if prev_t + 1 != pos3[0, 0]:
                pos3[0] += prev_t + 1 - pos3[0, 0]

        cos, sin = self._cos_sin(pos3)
        q_rot = self._rope(q, cos, sin)
        k_rot = self._rope(k, cos, sin)

        # attention over [cache | causal chunk]
        k_all = (k_rot if self.K[li] is None
                 else np.concatenate([self.K[li], k_rot], axis=1))
        v_all = (v if self.V[li] is None
                 else np.concatenate([self.V[li], v], axis=1))
        t_total = k_all.shape[1]
        cache_len = t_total - s
        group = nh // kv
        qg = q_rot.reshape(kv, group, s, h_dim)
        logits = np.einsum("kgsd,ktd->kgst", qg, k_all) / math.sqrt(h_dim)
        mask = np.zeros((s, t_total), bool)
        mask[:, :cache_len] = True
        mask[:, cache_len:] = np.tril(np.ones((s, s), bool))
        logits = np.where(mask, logits, -np.inf)
        probs = _softmax(logits.astype(np.float32), axis=-1)
        attn = np.einsum("kgst,ktd->kgsd", probs, v_all)
        attn = attn.reshape(nh, s, h_dim).transpose(1, 0, 2).reshape(s, -1)
        x = x + attn @ lp["o"]["w"]

        x2 = rms(x, lp["post_ln"])
        gate = x2 @ lp["gate"]["w"]
        gate = gate / (1.0 + np.exp(-gate))  # silu
        x = x + (gate * (x2 @ lp["up"]["w"])) @ lp["down"]["w"]

        # ---- cache update (longvideo_cache.py:217-323) ----
        if not compress:
            k_keep, v_keep, p_keep = k_rot, v, pos3
        else:
            if self.reforge:
                q_s = self._rope(q_rot, cos, sin, reverse=True)
                k_s = self._rope(k_rot, cos, sin, reverse=True)
            else:
                q_s, k_s = q_rot, k_rot
            w = np.einsum(
                "hsd,htd->hst", q_s,
                np.repeat(k_s, group, axis=0),
            ) / math.sqrt(h_dim)
            w = _softmax(w.astype(np.float32), -1)  # [nh, S, S] non-causal
            w = w.sum(1)  # sum over queries -> [nh, S(k)]
            w = w.reshape(kv, group, s).mean(1).mean(0)  # [S]
            if keypatch is not None:
                w = np.where(keypatch, 1.0, w)
            # stable top-k (ties -> lower index), then ascending index order
            order = np.argsort(-w, kind="stable")[:keep_len]
            keep_idx = np.sort(order)
            k_keep = (k_s if self.reforge else k_rot)[:, keep_idx]
            v_keep = v[:, keep_idx]
            p_keep = pos3[:, keep_idx].copy()
            if self.reforge:
                min_t = p_keep[0].min()
                comp = keep_len / s  # NOTE: keep_len/k_len, not self.ratio
                p_keep[0] = min_t + (
                    (p_keep[0] - min_t).astype(np.float32) * comp
                ).astype(np.int64)
                cos_c, sin_c = self._cos_sin(p_keep)
                k_keep = self._rope(k_keep, cos_c, sin_c)
        self.K[li] = (k_keep if self.K[li] is None
                      else np.concatenate([self.K[li], k_keep], axis=1))
        self.V[li] = (v_keep if self.V[li] is None
                      else np.concatenate([self.V[li], v_keep], axis=1))
        self.P[li] = (p_keep if self.P[li] is None
                      else np.concatenate([self.P[li], p_keep], axis=1))
        return x

    def _forward(self, embeds, pos3, keypatch, compress, keep_len):
        x = embeds
        for li in range(self.L):
            x = self._layer(li, x, pos3, keypatch, compress, keep_len)
        return x

    def _logits(self, h_last):
        cfg = self.cfg
        var = (h_last.astype(np.float32) ** 2).mean()
        h = h_last * (1.0 / np.sqrt(var + cfg.rms_norm_eps)) * self.p["final_ln"]
        head = self.p.get("lm_head")
        if head is not None:
            return h @ np.asarray(head)
        return h @ np.asarray(self.p["embed_tokens"]).T

    def generate(
        self, ids, pos, keypatch_tokens, video_embeds, video_token_id,
        chunk_tokens, decode_pos_base, max_new_tokens,
    ):
        """Reference forward (qwen2_vl.py:670-733) + greedy decode."""
        ids = np.asarray(ids)
        embeds = np.asarray(self.p["embed_tokens"])[ids]
        if video_embeds is not None:
            vmask = ids == video_token_id
            embeds = embeds.copy()
            embeds[vmask] = np.asarray(video_embeds)

        # modality segments (qwen2_vl.py:444-475)
        segments, st = [], 0
        is_v = ids == video_token_id
        for i in range(1, len(ids) + 1):
            if i == len(ids) or is_v[i] != is_v[st]:
                segments.append((st, i, "video" if is_v[st] else "text"))
                st = i
        s_p, e_p, t_p = segments[-1]
        assert t_p == "text"

        hidden = None
        for (s0, e0, kind) in segments:
            if kind == "text" or chunk_tokens is None:
                hidden = self._forward(
                    embeds[s0:e0], pos[:, s0:e0], None, False, 0
                )
            else:
                num_chunks = math.ceil((e0 - s0) / chunk_tokens)
                for ci in range(num_chunks):
                    ss = s0 + ci * chunk_tokens
                    ee = min(s0 + (ci + 1) * chunk_tokens, e0)
                    emb_c = embeds[ss:ee]
                    pos_c = pos[:, ss:ee]
                    kp_c = keypatch_tokens[ss:ee]
                    if self.prompt_guided and self.ratio < 1.0:
                        # forge_input_chunks (qwen2_vl.py:493-519)
                        pos_off = pos[0, s_p] - pos_c[0, -1] - 1
                        pos_c = np.concatenate(
                            [pos_c, pos[:, s_p:e_p] - pos_off], axis=1
                        )
                        emb_c = np.concatenate([emb_c, embeds[s_p:e_p]])
                        kp_c = np.concatenate(
                            [kp_c, np.zeros(e_p - s_p, bool)]
                        )
                    q_len = emb_c.shape[0]
                    keep_len = max(1, int(self.ratio * q_len))
                    compress = self.ratio < 1.0
                    hidden = self._forward(
                        emb_c, pos_c, kp_c, compress,
                        keep_len if compress else q_len,
                    )

        tokens = []
        logits = self._logits(hidden[-1])
        tok = int(np.argmax(logits))
        tokens.append(tok)
        for i in range(max_new_tokens - 1):
            if tok == self.cfg.eos_token_id:
                break
            emb = np.asarray(self.p["embed_tokens"])[np.asarray([tok])]
            pos3 = np.full((3, 1), decode_pos_base + i, np.int64)
            hidden = self._forward(emb, pos3, None, False, 0)
            logits = self._logits(hidden[-1])
            tok = int(np.argmax(logits))
            tokens.append(tok)
        return np.asarray(tokens), self.K[0].shape[1]

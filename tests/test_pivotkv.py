"""PivotKV eviction math vs torch oracle (longvideo_cache.py:260-295 spec)."""

import numpy as np
import pytest

import jax.numpy as jnp

from retake_tpu.ops import pivotkv

torch = pytest.importorskip("torch")


def oracle_scores(q_np, k_np, keypatch_np):
    """Reference scoring: fp32 softmax, sum over queries, grouped means."""
    import math

    q = torch.from_numpy(q_np)[None]  # [1, H, S, D]
    k = torch.from_numpy(k_np)[None]  # [1, KV, S, D]
    h, kv = q.shape[1], k.shape[1]
    d = q.shape[-1]
    k_rep = k[:, :, None].expand(-1, -1, h // kv, -1, -1).reshape(1, h, *k.shape[2:])
    attn = torch.matmul(q, k_rep.transpose(2, 3)) / math.sqrt(d)
    attn = torch.nn.functional.softmax(attn, dim=-1, dtype=torch.float32)
    attn = attn[0].sum(1)  # [H, S]
    attn = attn.reshape(kv, -1, attn.shape[-1]).mean(1).mean(0)  # [S]
    if keypatch_np is not None:
        attn.masked_fill_(torch.from_numpy(keypatch_np), 1.0)
    return attn.numpy()


@pytest.mark.parametrize("h,kv,s,d", [(4, 2, 16, 8), (8, 2, 33, 16)])
def test_eviction_scores_match_torch(rng, h, kv, s, d):
    q = rng.normal(size=(h, s, d)).astype(np.float32)
    k = rng.normal(size=(kv, s, d)).astype(np.float32)
    keypatch = rng.random(s) < 0.2
    expected = oracle_scores(q, k, keypatch)
    got = pivotkv.eviction_scores(
        jnp.asarray(q), jnp.asarray(k), jnp.ones(s, bool), jnp.asarray(keypatch)
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-5, atol=2e-6)


def test_eviction_scores_padding_invariance(rng):
    """Scores of valid tokens are unchanged by padding the chunk."""
    h, kv, s, d, pad = 4, 2, 12, 8, 5
    q = rng.normal(size=(h, s, d)).astype(np.float32)
    k = rng.normal(size=(kv, s, d)).astype(np.float32)
    base = pivotkv.eviction_scores(
        jnp.asarray(q), jnp.asarray(k), jnp.ones(s, bool), None
    )
    qp = np.concatenate([q, rng.normal(size=(h, pad, d)).astype(np.float32)], 1)
    kp = np.concatenate([k, rng.normal(size=(kv, pad, d)).astype(np.float32)], 1)
    valid = np.arange(s + pad) < s
    padded = pivotkv.eviction_scores(
        jnp.asarray(qp), jnp.asarray(kp), jnp.asarray(valid), None
    )
    np.testing.assert_allclose(np.asarray(padded)[:s], np.asarray(base), atol=1e-5)
    assert np.all(np.asarray(padded)[s:] < -1e29)


def test_keep_partition_matches_topk(rng):
    s, keep = 32, 11
    scores = rng.normal(size=s).astype(np.float32)
    scores[[3, 7, 9]] = 1.0  # exact ties, torch keeps lower indices first
    exp = torch.topk(torch.from_numpy(scores), keep).indices.sort().values.numpy()
    perm, kept = pivotkv.keep_partition(jnp.asarray(scores), jnp.int32(keep))
    np.testing.assert_array_equal(np.asarray(perm)[:keep], exp)
    assert np.asarray(kept).sum() == keep
    # evicted tail holds the complement
    assert set(np.asarray(perm).tolist()) == set(range(s))


def test_rescale_temporal_positions():
    # kept temporal ids 10..19 squashed by keep/k = 5/10
    pos = np.arange(10, 20, dtype=np.int32)
    out = pivotkv.rescale_temporal_positions(
        jnp.asarray(pos), jnp.ones(10, bool), jnp.int32(5), jnp.int32(10)
    )
    # min 10 + trunc((t-10)*0.5)
    expected = 10 + ((pos - 10) * 0.5).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_keep_len_truncation_parity():
    # int(ratio * q_len) truncates (longvideo_cache.py:263)
    assert pivotkv.keep_len_for_chunk(0.3, 10) == 3
    assert pivotkv.keep_len_for_chunk(0.9999, 10) == 9
    assert pivotkv.keep_len_for_chunk(0.0001, 10) == 1  # max(1, ...)
    kl = pivotkv.keep_len_for_chunk(0.5, jnp.int32(7))
    assert int(kl) == 3

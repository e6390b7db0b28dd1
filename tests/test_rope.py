"""Unit tests for M-RoPE / YaRN against independent oracles.

The YaRN frequency schedule is checked against HuggingFace's
``_compute_yarn_parameters`` (the code path the reference activates via its
config rewrite, retake/monkeypatch.py:26-31); rotation round-trips and M-RoPE
section mixing are checked against small numpy constructions.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from retake_tpu.ops import rope


def test_default_inv_freq_matches_formula():
    inv = rope.default_inv_freq(128, 1e6)
    expected = 1.0 / (1e6 ** (np.arange(0, 128, 2) / 128))
    np.testing.assert_allclose(inv, expected, rtol=1e-6)


def test_yarn_matches_transformers():
    transformers = pytest.importorskip("transformers")
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    class Cfg:
        rope_theta = 1e6
        hidden_size = 3584
        num_attention_heads = 28
        head_dim = 128
        max_position_embeddings = 32768
        partial_rotary_factor = 1.0
        rope_scaling = {
            "rope_type": "yarn",
            "factor": 4.0,
            "beta_fast": 32.0,
            "beta_slow": 1.0,
        }

    hf_inv, hf_scaling = ROPE_INIT_FUNCTIONS["yarn"](Cfg(), device=None)
    ours, scaling = rope.yarn_inv_freq(
        head_dim=128,
        theta=1e6,
        factor=4.0,
        original_max_position_embeddings=32768,
        beta_fast=32.0,
        beta_slow=1.0,
    )
    np.testing.assert_allclose(ours, hf_inv.numpy(), rtol=1e-6)
    assert abs(scaling - float(hf_scaling)) < 1e-9


def test_reverse_rope_inverts_forward(rng):
    inv_freq = jnp.asarray(rope.default_inv_freq(64, 1e4))
    pos = jnp.asarray(rng.integers(0, 1000, size=(1, 16)))
    scaling = 1.2
    cos, sin = rope.compute_cos_sin(inv_freq, pos, attention_scaling=scaling)
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 64)), dtype=jnp.float32)
    y = rope.apply_rope(x, cos, sin)
    x_back = rope.apply_rope(y, cos, sin, reverse=True, attention_scaling=scaling)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-4)


def test_mrope_section_mixing(rng):
    # head_dim 8 -> half 4, sections (1, 1, 2)
    table = jnp.asarray(rng.normal(size=(3, 1, 5, 8)), dtype=jnp.float32)
    mixed = rope.select_mrope(table, (1, 1, 2))
    expected = np.concatenate(
        [
            np.asarray(table)[0][..., 0:1],
            np.asarray(table)[1][..., 1:2],
            np.asarray(table)[2][..., 2:4],
            np.asarray(table)[0][..., 4:5],
            np.asarray(table)[1][..., 5:6],
            np.asarray(table)[2][..., 6:8],
        ],
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(mixed), expected)


def test_mrope_text_positions_equal_1d_rope(rng):
    """When all 3 position rows are equal (text), M-RoPE == plain RoPE."""
    inv_freq = jnp.asarray(rope.default_inv_freq(16, 1e4))
    pos1d = jnp.asarray(rng.integers(0, 100, size=(1, 7)))
    pos3d = jnp.broadcast_to(pos1d[None], (3, 1, 7))
    cos3, sin3 = rope.compute_cos_sin(inv_freq, pos3d)
    cos1, sin1 = rope.compute_cos_sin(inv_freq, pos1d)
    q = jnp.asarray(rng.normal(size=(1, 2, 7, 16)), dtype=jnp.float32)
    out3, _ = rope.apply_multimodal_rope(q, None, cos3, sin3, (2, 3, 3))
    out1 = rope.apply_rope(q, cos1, sin1)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out1), atol=1e-6)

"""Continuous batching (runtime/serve.py): greedy token parity vs
sequential generate, mid-decode admission, and gap-region compaction.

The reference has no serving layer (its eval prefills everything then
decodes the whole batch, retake/infer_eval.py:184-201); the invariant here
is that continuous admission NEVER changes a request's greedy tokens — slot
isolation (per-slot dec_start masks + analytic positions) makes each lane
equivalent to the plain batched decode, which is pinned token-exact to
sequential generate by tests/test_engine.py."""

import jax.numpy as jnp
import numpy as np
import pytest

from retake_tpu.models.qwen2_vl import params as params_lib
from retake_tpu.models.qwen2_vl.config import Qwen2VLConfig, Qwen2VisionConfig
from retake_tpu.runtime.engine import Qwen2VLEngine
from retake_tpu.runtime.serve import ContinuousServer
from retake_tpu.utils.config import RetakeConfig

from tests.test_engine import VIS, make_video_request


@pytest.fixture(scope="module")
def tiny():
    """Random-weight tiny model (no HF twin needed: serve parity is pinned
    against our own sequential generate, itself HF-pinned elsewhere)."""
    cfg = Qwen2VLConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=4096, rope_theta=10000.0,
        mrope_section=(4, 2, 2), tie_word_embeddings=False,
        bos_token_id=0, eos_token_id=1,
        vision_start_token_id=3, vision_end_token_id=4,
        image_token_id=5, video_token_id=6,
        vision=Qwen2VisionConfig(**VIS),
    )
    params = params_lib.init_params(cfg, seed=0, dtype=jnp.float32)
    return None, cfg, params


def _build(tiny, rng, n_reqs=4):
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2,
                              "kvcache_compression": True,
                              "kvcache_compression_kwargs": {
                                  "compression_ratio": 0.6,
                                  "pos_embed_reforge": True,
                              }}}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    reqs = []
    for i in range(n_reqs):
        ids, patches, grid = make_video_request(
            cfg, rng, grid_t=2 + 2 * (i % 2), prompt_len=4 + i
        )
        reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                         video_grid_thw=grid))
    return engine, reqs


def test_decode_attn_impl_auto_resolution(tiny, rng, monkeypatch):
    """decode_attn_impl="auto" (the default): einsum on the CPU backend
    (interpret-mode pallas is orders slower and the parity tests pin exact
    tokens), the gapped kernel on an accelerator when the GQA group fits
    its 8-row query tile (serve_bench --mixed_impl 2026-08-20: pallas
    423.9 vs xla 302.7 tok/s at bf16 B=4)."""
    from retake_tpu.runtime import serve as serve_mod

    engine, _ = _build(tiny, rng, n_reqs=1)
    assert ContinuousServer(engine).decode_attn_impl == "xla"  # CPU tests

    monkeypatch.setattr(serve_mod.jax, "default_backend", lambda: "tpu")
    assert ContinuousServer(engine).decode_attn_impl == "pallas"
    # a GQA group wider than the kernel's query-row tile falls back
    wide = engine.cfg.__class__(**{
        **{f.name: getattr(engine.cfg, f.name)
           for f in engine.cfg.__dataclass_fields__.values()},
        "num_attention_heads": 36, "num_key_value_heads": 2,
    })
    eng2 = type("E", (), {"cfg": wide, "retake": engine.retake})()
    assert ContinuousServer(eng2).decode_attn_impl == "xla"


def test_gap_cols_int8_pallas_alignment(tiny, rng):
    """_gap_cols guarantees the int8+pallas serving bucket admits a
    num_kb-row-aligned kernel block >= 512 (decode_gapped.py: the scale
    planes' (8, 128) tiling — an S/2048 multiplier like 17 admits none
    and would silently land in the 4x-slower padded-scale mode; measured
    on-chip 2026-08-20). The production 40960 bucket must stay at 43008
    (where the serving numbers were measured); a 2048x17-shaped bucket
    must bump one extra 2048 to 36864."""
    from retake_tpu.ops.pallas.decode_gapped import _pick_block_k

    engine, _ = _build(tiny, rng, n_reqs=1)
    srv = ContinuousServer(engine, decode_attn_impl="pallas")
    srv._quantized = True
    for p_bucket, want_s in ((40960, 43008), (32768, 36864), (8192, 10240)):
        srv.p_bucket = p_bucket
        s = p_bucket + srv._gap_cols()
        assert s == want_s, (p_bucket, s)
        bk = _pick_block_k(s, 2048, 8)
        assert s % bk == 0 and bk % 128 == 0 and (s // bk) % 8 == 0
    # bf16 (or xla impl) keeps the plain 2048 alignment
    srv._quantized = False
    srv.p_bucket = 32768
    assert srv.p_bucket + srv._gap_cols() == 34816


def test_continuous_serve_matches_sequential(tiny, rng):
    """All-at-once arrivals, fewer slots than requests: every request's
    greedy tokens match its solo generate; tiny segments + a tiny gap
    capacity force several compactions mid-flight."""
    engine, reqs = _build(tiny, rng, n_reqs=4)
    max_new = 9
    seq = [engine.generate(**r, max_new_tokens=max_new) for r in reqs]
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=max_new,
        gap_capacity=6,  # forces a compaction every other segment
    )
    results = server.run(reqs)
    assert [r.request_id for r in results] == list(range(4))
    for res, s in zip(results, seq):
        np.testing.assert_array_equal(res.tokens, s.tokens)
        assert res.ttft_s >= 0 and res.latency_s >= res.ttft_s


def test_continuous_serve_staggered_admission(tiny, rng):
    """A request arriving while others are mid-decode is admitted into a
    freed slot and still decodes token-exactly (dec_start masks the slot's
    previous tenant)."""
    engine, reqs = _build(tiny, rng, n_reqs=3)
    max_new = 7
    seq = [engine.generate(**r, max_new_tokens=max_new) for r in reqs]
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=2, max_new_tokens=max_new,
        gap_capacity=8,
    )
    # third request arrives 'later' (t=0.01s): with 2 slots it is admitted
    # once a slot frees mid-run
    results = server.run(reqs, arrival_times=[0.0, 0.0, 0.01])
    for res, s in zip(results, seq):
        np.testing.assert_array_equal(res.tokens, s.tokens)


def test_continuous_serve_sampling_matches_sequential(tiny, rng):
    """Sampled serving reproduces per-request generate exactly: draw keys
    derive from (seed, request-own step) — the sequential loop's key
    schedule — so arrival order and slot packing don't change draws. The
    staggered third request exercises a non-zero step offset."""
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"do_sample": True, "temperature": 1.3, "top_p": 0.95, "seed": 11,
         "longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    reqs = []
    for grid_t, plen in ((2, 4), (4, 6), (2, 7)):
        ids, patches, grid = make_video_request(
            cfg, rng, grid_t=grid_t, prompt_len=plen
        )
        reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                         video_grid_thw=grid))
    max_new = 8
    seq = [engine.generate(**r, max_new_tokens=max_new) for r in reqs]
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=2, max_new_tokens=max_new,
        gap_capacity=64,  # compaction-free: exact parity (fp knife edges)
    )
    results = server.run(reqs, arrival_times=[0.0, 0.0, 0.01])
    for res, s in zip(results, seq):
        np.testing.assert_array_equal(res.tokens, s.tokens)


@pytest.mark.slow
def test_continuous_serve_llava(rng):
    """The server is family-agnostic: LLaVA-OneVision (1-D RoPE, SigLIP
    tower) serves continuously with the same token parity — its engine
    exposes the same PrefillState/decode_batch surface."""
    from retake_tpu.models.llava_onevision import params as lparams_lib
    from retake_tpu.models.llava_onevision.config import (
        LlavaOnevisionConfig,
        SiglipVisionConfig,
    )
    from retake_tpu.runtime.llava_engine import LlavaOnevisionEngine

    cfg = LlavaOnevisionConfig(
        text=Qwen2VLConfig(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=4096, rope_theta=10000.0,
            tie_word_embeddings=False, bos_token_id=0, eos_token_id=1,
            mrope_section=None,
        ),
        vision=SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=16, patch_size=4,
        ),
        image_token_id=5, video_token_id=6,
    )
    params = lparams_lib.init_params(cfg, seed=0, dtype=jnp.float32)
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
    )
    engine = LlavaOnevisionEngine(cfg, params, rt)
    reqs = []
    for frames in (2, 3):
        n_tok = frames * cfg.tokens_per_frame + 1
        pre = rng.integers(10, 500, size=4).tolist()
        post = rng.integers(10, 500, size=6).tolist()
        ids = np.array(pre + [cfg.video_token_id] * n_tok + post,
                       dtype=np.int64)
        vid = rng.integers(
            0, 255,
            size=(frames, cfg.vision.image_size, cfg.vision.image_size, 3),
            dtype=np.uint8,
        )
        reqs.append(dict(input_ids=ids, pixel_values_videos=vid))
    seq = [engine.generate(**r, max_new_tokens=6) for r in reqs]
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=2, max_new_tokens=6,
        gap_capacity=4,
    )
    results = server.run(reqs)
    for res, s in zip(results, seq):
        np.testing.assert_array_equal(res.tokens, s.tokens)


@pytest.mark.slow
def test_continuous_serve_int8_kv(tiny, rng):
    """int8 KV cache under continuous batching: admission pads the scale
    planes alongside k/v; greedy tokens match the engine's own sequential
    int8-KV generate. gap_capacity is large enough that NO compaction
    runs: compaction relocates cache entries, which permutes the fp
    softmax-reduction order by ulps, and with quantization-coarsened
    logits an argmax can sit on a knife edge — exact-token equality
    through compaction is not a sound invariant (compaction correctness
    is pinned exactly by test_compact_gap_moves_kv_and_scales)."""
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"kv_cache_dtype": "int8",
         "longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    reqs = []
    for grid_t, plen in ((2, 4), (4, 6), (2, 7)):
        ids, patches, grid = make_video_request(
            cfg, rng, grid_t=grid_t, prompt_len=plen
        )
        reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                         video_grid_thw=grid))
    max_new = 8
    seq = [engine.generate(**r, max_new_tokens=max_new) for r in reqs]
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=max_new,
        gap_capacity=64,
    )
    results = server.run(reqs)
    for res, s in zip(results, seq):
        np.testing.assert_array_equal(res.tokens, s.tokens)


def test_continuous_serve_int8_kv_pallas_decode(tiny, rng):
    """int8 KV cache AND the dead-block-skipping decode kernel together
    (decode_attn_impl="pallas" + kv_cache_dtype="int8" — the kernel's
    best op-level case: it streams int8 blocks + lane-major scale planes,
    see ops/pallas/decode_gapped.py). Wiring test like the bf16 pallas
    one: compaction is avoided (large gap_capacity) so greedy tokens
    should match sequential int8-KV generate exactly — same executable
    order, no relocation ulps; the int8 scale planes take the stacked
    5-D + layer-index path through the serving decode step."""
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"kv_cache_dtype": "int8",
         "longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    reqs = []
    for grid_t, plen in ((2, 4), (4, 6), (2, 7)):
        ids, patches, grid = make_video_request(
            cfg, rng, grid_t=grid_t, prompt_len=plen
        )
        reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                         video_grid_thw=grid))
    max_new = 8
    seq = [engine.generate(**r, max_new_tokens=max_new) for r in reqs]
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=max_new,
        gap_capacity=64, decode_attn_impl="pallas",
    )
    results = server.run(reqs)
    total = agree = 0
    for res, s in zip(results, seq):
        assert 1 <= len(res.tokens) <= max_new
        n = min(len(res.tokens), len(s.tokens))
        agree += int(np.sum(res.tokens[:n] == s.tokens[:n]))
        total += max(len(res.tokens), len(s.tokens))
    # flash-order vs einsum reductions differ by ulps; with int8-coarsened
    # logits the random tiny model sits on near-ties, so require high
    # agreement rather than exactness (numerics pinned in test_attention)
    assert agree / total >= 0.7, (agree, total)


def test_compact_gap_moves_kv_and_scales(rng):
    """_compact_gap folds each slot's decode region [dec_start_b, +c_b)
    onto its prefill tail [final_len_b, +c_b) and leaves everything below
    final_len untouched — checked elementwise against a numpy reference,
    including the int8 scale planes."""
    from retake_tpu.runtime.serve import _compact_gap

    l, b, kv, s, d = 2, 3, 2, 24, 4
    k = rng.integers(-127, 127, size=(l, b, kv, s, d)).astype(np.int8)
    v = rng.integers(-127, 127, size=(l, b, kv, s, d)).astype(np.int8)
    ks = rng.random((l, b, kv, s)).astype(np.float32)
    vs = rng.random((l, b, kv, s)).astype(np.float32)
    gap_start = 12
    final_len = np.array([5, 9, 0], np.int32)  # slot 2 is free
    dec_start = np.array([14, 16, 12], np.int32)
    counts = np.array([4, 2, 0], np.int32)

    def ref(arr):
        out = arr.copy()
        for bi in range(b):
            f, ds, c = final_len[bi], dec_start[bi], counts[bi]
            out[:, bi, :, f:f + c] = arr[:, bi, :, ds:ds + c]
        return out

    import jax.numpy as jnp

    ko, vo, kso, vso = _compact_gap(
        jnp.asarray(k), jnp.asarray(v), jnp.asarray(ks), jnp.asarray(vs),
        jnp.asarray(final_len), jnp.asarray(dec_start), jnp.asarray(counts),
        jnp.int32(gap_start),
    )
    for got, want in ((ko, ref(k)), (vo, ref(v)),
                      (kso, ref(ks)), (vso, ref(vs))):
        # only [0, final_len + counts) is semantically live per slot; the
        # region beyond is masked by dec_start after compaction — compare
        # the live prefix exactly
        got = np.asarray(got)
        for bi in range(b):
            end = final_len[bi] + counts[bi]
            np.testing.assert_array_equal(
                got[:, bi, :, :end], want[:, bi, :, :end]
            )


@pytest.mark.slow
def test_interleaved_prefill_runs_blind_segments(tiny, rng):
    """While a long request prefills, the engine's on_dispatch hook must
    run BLIND decode segments for the already-live slot (device-carried
    tokens, no host read), including gap compactions mid-prefill — and the
    final tokens still match sequential generate exactly."""
    engine, _ = _build(tiny, rng, n_reqs=0)
    reqs = []
    ids, patches, grid = make_video_request(cfg=engine.cfg, rng=rng,
                                            grid_t=2, prompt_len=4)
    reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                     video_grid_thw=grid))
    ids, patches, grid = make_video_request(cfg=engine.cfg, rng=rng,
                                            grid_t=16, grid_h=8, grid_w=8,
                                            prompt_len=5)
    reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                     video_grid_thw=grid))
    max_new = 40
    seq = [engine.generate(**r, max_new_tokens=max_new) for r in reqs]
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=2, max_new_tokens=max_new,
        gap_capacity=8,  # small: forces compaction DURING blind mode
    )
    blind = 0
    orig = server._on_prefill_dispatch

    def spy():
        nonlocal blind
        before = len(server.staged)
        orig()
        blind += len(server.staged) - before

    server._on_prefill_dispatch = spy
    results = server.run(reqs)
    assert blind > 0, "no blind segments ran during the long prefill"
    for res, s in zip(results, seq):
        np.testing.assert_array_equal(res.tokens, s.tokens)


def test_continuous_serve_pallas_decode_attn(tiny, rng):
    """Opt-in dead-block-skipping decode kernel (decode_attn_impl=
    "pallas", ops/pallas/decode_gapped.py) end-to-end through the server:
    admission, compaction, and harvest all run with the kernel in the
    decode step. This is a WIRING test: exact token equality through
    compaction is NOT a sound invariant for the flash-order reduction
    (relocated cache entries permute the online-softmax order by ulps and
    occasionally flip an argmax — observed flaking here; same lesson as
    the int8-KV compaction note in CLAUDE.md), so assert high agreement
    with sequential generate plus completion invariants. Kernel NUMERICS
    are pinned exactly in tests/test_attention.py."""
    engine, reqs = _build(tiny, rng, n_reqs=3)
    max_new = 8
    seq = [engine.generate(**r, max_new_tokens=max_new) for r in reqs]
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=max_new,
        gap_capacity=6, decode_attn_impl="pallas",
    )
    results = server.run(reqs)
    total = agree = 0
    for res, s in zip(results, seq):
        assert 1 <= len(res.tokens) <= max_new
        n = min(len(res.tokens), len(s.tokens))
        agree += int(np.sum(res.tokens[:n] == s.tokens[:n]))
        total += max(len(res.tokens), len(s.tokens))
    assert agree / total >= 0.7, (agree, total)


def test_continuous_serve_per_request_max_new(tiny, rng):
    """A request dict may carry its own max_new_tokens: each slot finishes
    at ITS budget (harvest-side trim), shorter-budget tenants free slots
    early, and every request's tokens match its solo generate at the same
    budget."""
    engine, reqs = _build(tiny, rng, n_reqs=4)
    budgets = [3, 9, 5, 9]
    for r, mn in zip(reqs, budgets):
        r["max_new_tokens"] = mn
    seq = [engine.generate(**{k: v for k, v in r.items()
                              if k != "max_new_tokens"},
                           max_new_tokens=mn)
           for r, mn in zip(reqs, budgets)]
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=9,
        gap_capacity=6,
    )
    results = server.run(reqs)
    for res, s, mn in zip(results, seq, budgets):
        assert len(res.tokens) <= mn
        np.testing.assert_array_equal(res.tokens, s.tokens)


def test_continuous_serve_streaming_callback(tiny, rng):
    """on_tokens streams at harvest cadence: the concatenation of the
    streamed chunks per request equals the returned ServeResult.tokens
    (admission first-token + per-segment EOS/budget-trimmed chunks),
    including under interleaved blind segments and compaction."""
    engine, reqs = _build(tiny, rng, n_reqs=4)
    max_new = 9
    streamed: dict = {}

    def on_tokens(req_id, toks):
        streamed.setdefault(req_id, []).extend(toks)

    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=max_new,
        gap_capacity=6,
    )
    results = server.run(reqs, on_tokens=on_tokens)
    for res in results:
        np.testing.assert_array_equal(res.tokens,
                                      np.asarray(streamed[res.request_id]))


def test_continuous_serve_cancellation(tiny, rng):
    """on_tokens returning False cancels the request (client disconnect):
    its ServeResult carries the tokens delivered so far with
    cancelled=True, the freed lane serves the remaining queue, and the
    OTHER requests' tokens stay exactly their solo generate streams."""
    engine, reqs = _build(tiny, rng, n_reqs=4)
    max_new = 9
    seq = [engine.generate(**r, max_new_tokens=max_new) for r in reqs]
    calls: dict = {}

    def on_tokens(req_id, toks):
        calls.setdefault(req_id, []).extend(toks)
        if req_id == 0 and len(calls[0]) > 1:  # cancel after its first
            return False  # harvested decode segment

    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=max_new,
        gap_capacity=6,
    )
    results = server.run(reqs, on_tokens=on_tokens)
    assert results[0].cancelled
    n0 = len(results[0].tokens)
    assert 1 < n0 < len(seq[0].tokens)
    np.testing.assert_array_equal(results[0].tokens, seq[0].tokens[:n0])
    for res, s in zip(results[1:], seq[1:]):
        assert not res.cancelled
        np.testing.assert_array_equal(res.tokens, s.tokens)


def test_continuous_serve_cancel_at_first_token(tiny, rng):
    """Cancellation at the admission callback (before any decode segment)
    frees the slot immediately; the single delivered token is returned."""
    engine, reqs = _build(tiny, rng, n_reqs=3)

    def on_tokens(req_id, toks):
        if req_id == 1:
            return False

    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=6,
        gap_capacity=6,
    )
    results = server.run(reqs, on_tokens=on_tokens)
    assert results[1].cancelled and len(results[1].tokens) == 1
    seq = [engine.generate(**r, max_new_tokens=6) for r in reqs]
    for i in (0, 2):
        assert not results[i].cancelled
        np.testing.assert_array_equal(results[i].tokens, seq[i].tokens)


def test_interleaved_prefill_completes_tenant_mid_admission(tiny, rng):
    """A tenant whose remaining budget fits in the blind segments must
    COMPLETE (stamp + free) during the long admission — not at the
    prefill's end: its completing segment is allowed to overshoot (junk
    harvest-trimmed, fully drained before any later compaction), and its
    finish_s must land before the long request's first token."""
    engine, _ = _build(tiny, rng, n_reqs=0)
    reqs = []
    ids, patches, grid = make_video_request(cfg=engine.cfg, rng=rng,
                                            grid_t=2, prompt_len=4)
    reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                     video_grid_thw=grid, max_new_tokens=7))
    ids, patches, grid = make_video_request(cfg=engine.cfg, rng=rng,
                                            grid_t=16, grid_h=8, grid_w=8,
                                            prompt_len=5)
    reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                     video_grid_thw=grid))
    seq = [engine.generate(**{k: v for k, v in r.items()
                              if k != "max_new_tokens"},
                           max_new_tokens=r.get("max_new_tokens", 40))
           for r in reqs]
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=2, max_new_tokens=40,
        gap_capacity=8, interleave_segments_per_hook=4,
    )
    results = server.run(reqs)
    for res, s in zip(results, seq):
        np.testing.assert_array_equal(res.tokens, s.tokens)
    # the short tenant finished strictly inside the long admission window
    assert results[0].finish_s < results[1].first_token_s, (
        results[0].finish_s, results[1].first_token_s)


def test_interleaved_prefill_mixed_completion_drains_before_dispatch(
        tiny, rng):
    """Regression (review finding): with interleave_segments_per_hook >= 2,
    a tenant whose stream completes mid-hook must be DRAINED (stamped +
    freed) before the next blind-segment dispatch — otherwise further
    segments keep writing junk KV for it and a same-hook compaction folds
    those writes past the final_len + max_new <= P bound. Two live tenants
    with different budgets (one completing exactly on a segment boundary,
    one still needing full segments) ride under a long admission with a
    gap capacity that forces compactions; every token stream must still
    match solo generate, and the finished tenant must free mid-admission."""
    engine, _ = _build(tiny, rng, n_reqs=0)
    reqs = []
    for plen, mn in ((4, 7), (6, 17)):  # needs 6 and 16 = multiples of seg
        ids, patches, grid = make_video_request(cfg=engine.cfg, rng=rng,
                                                grid_t=2, prompt_len=plen)
        reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                         video_grid_thw=grid, max_new_tokens=mn))
    ids, patches, grid = make_video_request(cfg=engine.cfg, rng=rng,
                                            grid_t=16, grid_h=8, grid_w=8,
                                            prompt_len=5)
    reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                     video_grid_thw=grid))
    seq = [engine.generate(**{k: v for k, v in r.items()
                              if k != "max_new_tokens"},
                           max_new_tokens=r.get("max_new_tokens", 12))
           for r in reqs]
    server = ContinuousServer(
        engine, batch_slots=3, segment_steps=3, max_new_tokens=12,
        gap_capacity=9, interleave_segments_per_hook=3,
    )
    results = server.run(reqs)
    for res, s in zip(results, seq):
        np.testing.assert_array_equal(res.tokens, s.tokens)
    # the short tenant completed strictly inside the long admission window
    assert results[0].finish_s < results[2].first_token_s, (
        results[0].finish_s, results[2].first_token_s)


def test_compaction_preserves_attention(rng):
    """Semantic compaction invariant (beyond the elementwise fold test):
    a decode step's attention output over the PRE-compaction cache
    (entries at [0, final_len) u [dec_start, write_end)) equals the
    output over the POST-compaction cache (entries relocated to
    [0, final_len + c), dec_start reset) to fp tolerance — relocation
    only permutes the reduction order. Checked for both impls and an
    int8 cache."""
    import jax.numpy as jnp

    from retake_tpu.ops import attention as attn
    from retake_tpu.ops.quantization import quantize_kv_block
    from retake_tpu.runtime.serve import _compact_gap

    b, kv, g, d, s = 2, 2, 2, 8, 64
    gap_start = 40
    q = jnp.asarray(rng.normal(size=(b, kv * g, d)) * 0.3, jnp.float32)
    kc = jnp.asarray(rng.normal(size=(b, kv, s, d)) * 0.3, jnp.float32)
    vc = jnp.asarray(rng.normal(size=(b, kv, s, d)) * 0.3, jnp.float32)
    kn = jnp.asarray(rng.normal(size=(b, kv, d)) * 0.3, jnp.float32)
    vn = jnp.asarray(rng.normal(size=(b, kv, d)) * 0.3, jnp.float32)
    final_len = np.array([10, 25], np.int32)
    dec_start = np.array([43, 41], np.int32)
    gap_filled = 8  # write_end = 48

    counts = np.array([gap_start + gap_filled - ds for ds in dec_start],
                      np.int32)

    for quant in (False, True):
        if quant:
            kq, ks = quantize_kv_block(kc)
            vq, vs = quantize_kv_block(vc)
            kw = dict(k_scale=ks, v_scale=vs)
            k_in, v_in = kq, vq
        else:
            kw = {}
            k_in, v_in = kc, vc
        pre = attn.decode_attention_batch_gapped(
            q, k_in, v_in, jnp.asarray(final_len), jnp.int32(gap_start),
            jnp.int32(gap_filled), kn, vn,
            dec_start=jnp.asarray(dec_start), **kw,
        )
        # fold each slot's decode region onto its prefill tail (the
        # server's _compact operates on [L, B, KV, S, D] caches — add a
        # unit layer axis), then re-evaluate with the post-compaction
        # geometry: grown final_len, dec_start = gap_start, zero filled
        ks_in = kw.get("k_scale")
        vs_in = kw.get("v_scale")
        kf, vf, ksf, vsf = _compact_gap(
            k_in[None], v_in[None],
            None if ks_in is None else ks_in[None],
            None if vs_in is None else vs_in[None],
            jnp.asarray(final_len), jnp.asarray(dec_start),
            jnp.asarray(counts), jnp.int32(gap_start),
        )
        kw2 = dict(k_scale=ksf[0], v_scale=vsf[0]) if quant else {}
        post = attn.decode_attention_batch_gapped(
            q, kf[0], vf[0], jnp.asarray(final_len + counts),
            jnp.int32(gap_start), jnp.int32(0), kn, vn,
            dec_start=jnp.asarray([gap_start] * b), **kw2,
        )
        np.testing.assert_allclose(np.asarray(post), np.asarray(pre),
                                   atol=3e-6, rtol=3e-6)


def test_online_server_dynamic_submission(tiny, rng):
    """start_online: dynamic submit() from the caller thread, futures
    resolve with token streams identical to solo generate; later
    submissions admitted while earlier ones decode; close() drains."""
    engine, reqs = _build(tiny, rng, n_reqs=4)
    max_new = 9
    seq = [engine.generate(**r, max_new_tokens=max_new) for r in reqs]
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=max_new,
        gap_capacity=6,
    )
    chunks = {}

    def on_tokens(rid, toks):
        chunks.setdefault(rid, []).extend(toks)

    with server.start_online() as handle:
        futs = [handle.submit(r, on_tokens=on_tokens) for r in reqs[:2]]
        # wait for the first to finish, then submit the rest dynamically
        r0 = futs[0].result(timeout=120)
        futs += [handle.submit(r, on_tokens=on_tokens) for r in reqs[2:]]
        results = [r0] + [f.result(timeout=120) for f in futs[1:]]
    for rid, (res, s) in enumerate(zip(results, seq)):
        assert res.request_id == rid and not res.cancelled
        np.testing.assert_array_equal(res.tokens, s.tokens)
        np.testing.assert_array_equal(np.asarray(chunks[rid]), s.tokens)
        assert res.arrival_s <= res.prefill_start_s <= res.first_token_s
    # closed: further submits refuse
    with pytest.raises(RuntimeError):
        handle.submit(reqs[0])


def test_online_server_cancel_and_close_idle(tiny, rng):
    """A request whose on_tokens returns False mid-stream cancels and
    frees the lane; closing an idle server joins cleanly."""
    engine, reqs = _build(tiny, rng, n_reqs=2)
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=2, max_new_tokens=12,
        gap_capacity=64,
    )
    seen = []

    def cancel_after_first_chunk(rid, toks):
        seen.extend(toks)
        return len(seen) <= 1  # False once decode chunks start

    handle = server.start_online()
    try:
        fut = handle.submit(reqs[0], on_tokens=cancel_after_first_chunk)
        res = fut.result(timeout=120)
        assert res.cancelled and len(res.tokens) < 12
        # lane is reusable: a normal request still completes
        res2 = handle.submit(reqs[1]).result(timeout=120)
        assert not res2.cancelled
        np.testing.assert_array_equal(
            res2.tokens, engine.generate(**reqs[1], max_new_tokens=12).tokens
        )
    finally:
        handle.close()


def test_serve_vision_cache_reuses_encode(tiny, rng, monkeypatch):
    """vision_cache_slots: requests sharing a video_key encode the vision
    stage once; tokens stay identical to solo generate; LRU evicts."""
    from retake_tpu.runtime.engine import Qwen2VLEngine as Eng

    engine, _ = _build(tiny, rng, n_reqs=0)
    ids1, patches, grid = make_video_request(cfg=engine.cfg, rng=rng,
                                             grid_t=2, prompt_len=4)
    ids2, _, _ = make_video_request(cfg=engine.cfg, rng=rng,
                                    grid_t=2, prompt_len=4)
    # same video, two different questions (ids2's video span must match)
    n_vid = int(np.sum(ids1 == engine.cfg.video_token_id))
    v0 = int(np.where(ids1 == engine.cfg.video_token_id)[0][0])
    ids2 = np.concatenate([ids1[: v0 + n_vid + 1], ids2[-5:]])
    reqs = [
        dict(input_ids=ids1, pixel_values_videos=patches,
             video_grid_thw=grid, video_key="vidA"),
        dict(input_ids=ids2, pixel_values_videos=patches,
             video_grid_thw=grid, video_key="vidA"),
    ]
    seq = [engine.generate(ids, patches, grid, max_new_tokens=8)
           for ids in (ids1, ids2)]

    n_enc = 0
    orig = Eng.encode_video

    def counting(self, *a, **kw):
        nonlocal n_enc
        n_enc += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(Eng, "encode_video", counting)
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=8,
        gap_capacity=64, vision_cache_slots=1,
    )
    results = server.run(reqs)
    assert n_enc == 1  # second request hit the cache
    for res, s in zip(results, seq):
        np.testing.assert_array_equal(res.tokens, s.tokens)
    # a different key evicts (slots=1) and encodes fresh
    results2 = server.run([dict(reqs[0], video_key="vidB")])
    assert n_enc == 2
    np.testing.assert_array_equal(results2[0].tokens, seq[0].tokens)
    assert "vidA" not in server._vision_cache


def test_serve_prefix_cache_reuses_prefill(tiny, rng, monkeypatch):
    """prefix_cache_slots: requests sharing a video_key capture the
    question-independent prefill (VideoPrefix) once — later keyed requests
    skip vision AND the video prefill, token-exact vs solo generate. A
    keyed request whose video span diverges falls back inline via
    PrefixMismatch (never wrong tokens), and a pixel-less keyed request
    rides the cached artifact entirely."""
    from retake_tpu.runtime.engine import Qwen2VLEngine as Eng

    engine, _ = _build(tiny, rng, n_reqs=0)
    ids1, patches, grid = make_video_request(cfg=engine.cfg, rng=rng,
                                             grid_t=2, prompt_len=4)
    ids2, _, _ = make_video_request(cfg=engine.cfg, rng=rng,
                                    grid_t=2, prompt_len=9)
    # same video, different question (prefix through the video span matches)
    n_vid = int(np.sum(ids1 == engine.cfg.video_token_id))
    v0 = int(np.where(ids1 == engine.cfg.video_token_id)[0][0])
    ids2 = np.concatenate([ids1[: v0 + n_vid + 1], ids2[-7:]])
    reqs = [
        dict(input_ids=ids1, pixel_values_videos=patches,
             video_grid_thw=grid, video_key="vidA"),
        dict(input_ids=ids2, pixel_values_videos=patches,
             video_grid_thw=grid, video_key="vidA"),
        # pixel-less re-ask: the cached prefix IS the video
        dict(input_ids=ids2, video_key="vidA"),
    ]
    seq = [engine.generate(ids1, patches, grid, max_new_tokens=8),
           engine.generate(ids2, patches, grid, max_new_tokens=8)]

    n_enc = 0
    orig = Eng.encode_video

    def counting(self, *a, **kw):
        nonlocal n_enc
        n_enc += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(Eng, "encode_video", counting)
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=8,
        gap_capacity=64, prefix_cache_slots=1,
    )
    results = server.run(reqs)
    assert n_enc == 1  # one capture; both re-asks skipped vision entirely
    assert server.stats["prefix_cache_hits"] == 2
    assert server.stats["prefix_cache_misses"] == 1
    np.testing.assert_array_equal(results[0].tokens, seq[0].tokens)
    np.testing.assert_array_equal(results[1].tokens, seq[1].tokens)
    np.testing.assert_array_equal(results[2].tokens, seq[1].tokens)

    # divergent video span under the SAME key: PrefixMismatch -> inline
    # fallback, tokens still exact
    ids3, patches3, grid3 = make_video_request(cfg=engine.cfg, rng=rng,
                                               grid_t=4, prompt_len=4)
    seq3 = engine.generate(ids3, patches3, grid3, max_new_tokens=8)
    res3 = server.run([dict(input_ids=ids3, pixel_values_videos=patches3,
                            video_grid_thw=grid3, video_key="vidA")])
    assert server.stats["prefix_mismatch_fallbacks"] == 1
    np.testing.assert_array_equal(res3[0].tokens, seq3.tokens)

    # text-only keyed request: nothing to capture, graceful inline path
    ids_t = rng.integers(10, 500, size=9).astype(np.int64)
    seq_t = engine.generate(ids_t, max_new_tokens=8)
    res_t = server.run([dict(input_ids=ids_t, video_key="vidT")])
    np.testing.assert_array_equal(res_t[0].tokens, seq_t.tokens)


@pytest.mark.slow
def test_serve_prefix_budget_overflow_recaptures(tiny, rng, monkeypatch):
    """A cached VideoPrefix whose budget is outgrown by a later request
    (bigger max_new_tokens than anything seen at capture) is evicted and
    recaptured with the larger allowance — NOT left to force an inline
    fallback forever while pinning HBM (round-4 ADVICE). The overflowing
    request itself and every later one stay token-exact."""
    import retake_tpu.runtime.engine as engine_mod

    # shrink the budget bucket so the overflow is reachable with a decode
    # short enough for CPU tests (default rounds every budget up to 8192)
    monkeypatch.setattr(engine_mod, "BUDGET_BUCKET", 64)
    engine, _ = _build(tiny, rng, n_reqs=0)
    ids1, patches, grid = make_video_request(cfg=engine.cfg, rng=rng,
                                             grid_t=2, prompt_len=4)
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=4,
        gap_capacity=64, prefix_cache_slots=1,
        # slot buffers must already fit the post-recapture bucket (a server
        # sized from the small first request would reject the big one — see
        # test_serve_rejects_over_bucket_request)
        prefill_bucket=1024,
    )
    r1 = server.run([dict(input_ids=ids1, pixel_values_videos=patches,
                          video_grid_thw=grid, video_key="vidA")])
    seq1 = engine.generate(ids1, patches, grid, max_new_tokens=4)
    np.testing.assert_array_equal(r1[0].tokens, seq1.tokens)
    vp = server._prefix_cache["vidA"]
    big = vp.budget - vp.final_len + 8  # overflows the captured budget

    seq_big = engine.generate(ids1, patches, grid, max_new_tokens=big)
    r2 = server.run([dict(input_ids=ids1, video_key="vidA",
                          max_new_tokens=big)])
    assert server.stats["prefix_mismatch_fallbacks"] == 1
    assert server.stats["prefix_budget_recaptures"] == 1
    np.testing.assert_array_equal(r2[0].tokens, seq_big.tokens)
    vp2 = server._prefix_cache["vidA"]
    assert vp2 is not vp and vp2.budget > vp.budget

    # the recaptured entry serves the larger allowance: same request again
    # is a clean reuse — no new fallback, no new capture
    hits = server.stats["prefix_cache_hits"]
    r3 = server.run([dict(input_ids=ids1, video_key="vidA",
                          max_new_tokens=big)])
    assert server.stats["prefix_mismatch_fallbacks"] == 1
    assert server.stats["prefix_budget_recaptures"] == 1
    assert server.stats["prefix_cache_hits"] == hits + 1
    np.testing.assert_array_equal(r3[0].tokens, seq_big.tokens)


def test_serve_rejects_over_bucket_request(tiny, rng, monkeypatch):
    """A request whose attention bucket exceeds the server's (sized at the
    first admission) fails gracefully: offline run() raises (fail-fast
    bench semantics), online mode fails ONE request with an error result
    and keeps serving — it must never trip the _admit assert and kill the
    worker thread."""
    import retake_tpu.runtime.engine as engine_mod

    monkeypatch.setattr(engine_mod, "BUDGET_BUCKET", 64)
    engine, _ = _build(tiny, rng, n_reqs=0)
    ids1, patches, grid = make_video_request(cfg=engine.cfg, rng=rng,
                                             grid_t=2, prompt_len=4)
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=4,
        gap_capacity=64,
    )
    small = dict(input_ids=ids1, pixel_values_videos=patches,
                 video_grid_thw=grid)
    big = dict(small, max_new_tokens=512)  # bucket far beyond the server's
    with server.start_online() as handle:
        f0 = handle.submit(dict(small))  # sizes p_bucket
        assert len(f0.result(timeout=300).tokens) > 0
        f1 = handle.submit(big)
        res = f1.result(timeout=300)
        assert res.error and "exceeds server prefill bucket" in res.error
        # the loop survived: later requests still serve
        f2 = handle.submit(dict(small))
        np.testing.assert_array_equal(f2.result(timeout=300).tokens,
                                      f0.result().tokens)
    assert server.stats["requests_failed"] == 1

    with pytest.raises(ValueError, match="exceeds server prefill bucket"):
        server2 = ContinuousServer(
            engine, batch_slots=2, segment_steps=3, max_new_tokens=4,
            gap_capacity=64,
        )
        server2.run([dict(small), big])


def test_serve_prefix_unsupported_disables_cache(tiny, rng, monkeypatch):
    """prompt_guided_compression folds the question into every video chunk,
    so no question-independent prefill exists: the first keyed capture
    raises PrefixUnsupported (a dedicated type — NOT string matching) and
    the server disables its prefix cache for good; later keyed requests
    never pay another capture attempt."""
    _, cfg, params = tiny
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2,
                              "kvcache_compression": True,
                              "kvcache_compression_kwargs": {
                                  "compression_ratio": 0.6,
                                  "prompt_guided_compression": True,
                              }}}
    )
    engine = Qwen2VLEngine(cfg, params, rt)
    ids1, patches, grid = make_video_request(cfg=cfg, rng=rng,
                                             grid_t=2, prompt_len=4)
    seq = engine.generate(ids1, patches, grid, max_new_tokens=6)
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=6,
        gap_capacity=64, prefix_cache_slots=1,
    )
    req = dict(input_ids=ids1, pixel_values_videos=patches,
               video_grid_thw=grid, video_key="vidA")
    res = server.run([dict(req), dict(req)])
    assert server.stats["prefix_capture_failures"] == 1
    assert server._prefix_disabled
    for r in res:
        np.testing.assert_array_equal(r.tokens, seq.tokens)
    # a later keyed request skips the capture path entirely (no new
    # failure, no new miss) but still answers correctly
    res2 = server.run([dict(req)])
    assert server.stats["prefix_capture_failures"] == 1
    np.testing.assert_array_equal(res2[0].tokens, seq.tokens)


@pytest.mark.slow
def test_serve_prefix_cache_llava(rng):
    """prefix_cache_slots is family-agnostic: the LLaVA engine exposes the
    same encode_prefix/generate(prefix=...) surface, so keyed requests reuse
    the question-independent SigLIP+prefill capture token-exactly —
    including a pixel-less re-ask riding the cached artifact."""
    from retake_tpu.models.llava_onevision import params as lparams_lib
    from retake_tpu.models.llava_onevision.config import (
        LlavaOnevisionConfig,
        SiglipVisionConfig,
    )
    from retake_tpu.runtime.llava_engine import LlavaOnevisionEngine

    cfg = LlavaOnevisionConfig(
        text=Qwen2VLConfig(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=4096, rope_theta=10000.0,
            tie_word_embeddings=False, bos_token_id=0, eos_token_id=1,
            mrope_section=None,
        ),
        vision=SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=16, patch_size=4,
        ),
        image_token_id=5, video_token_id=6,
    )
    params = lparams_lib.init_params(cfg, seed=0, dtype=jnp.float32)
    rt = RetakeConfig.from_dict(
        {"longvideo_kwargs": {"chunked_prefill_frames": 2,
                              "frame_chunk_size": 2}}
    )
    engine = LlavaOnevisionEngine(cfg, params, rt)
    frames = 2
    n_tok = frames * cfg.tokens_per_frame + 1
    pre = rng.integers(10, 500, size=4).tolist()
    vid = rng.integers(
        0, 255,
        size=(frames, cfg.vision.image_size, cfg.vision.image_size, 3),
        dtype=np.uint8,
    )
    ids1 = np.array(pre + [cfg.video_token_id] * n_tok
                    + rng.integers(10, 500, size=6).tolist(), dtype=np.int64)
    ids2 = np.array(pre + [cfg.video_token_id] * n_tok
                    + rng.integers(10, 500, size=4).tolist(), dtype=np.int64)
    seq = [engine.generate(i, vid, max_new_tokens=6) for i in (ids1, ids2)]

    n_enc = 0
    orig = LlavaOnevisionEngine.encode_video

    def counting(self, *a, **kw):
        nonlocal n_enc
        n_enc += 1
        return orig(self, *a, **kw)

    LlavaOnevisionEngine.encode_video = counting
    try:
        server = ContinuousServer(
            engine, batch_slots=2, segment_steps=2, max_new_tokens=6,
            gap_capacity=4, prefix_cache_slots=1,
        )
        results = server.run([
            dict(input_ids=ids1, pixel_values_videos=vid, video_key="vidL"),
            dict(input_ids=ids2, pixel_values_videos=vid, video_key="vidL"),
            dict(input_ids=ids2, video_key="vidL"),  # pixel-less re-ask
        ])
    finally:
        LlavaOnevisionEngine.encode_video = orig
    assert n_enc == 1
    assert server.stats["prefix_cache_hits"] == 2
    assert server.stats["prefix_cache_misses"] == 1
    np.testing.assert_array_equal(results[0].tokens, seq[0].tokens)
    np.testing.assert_array_equal(results[1].tokens, seq[1].tokens)
    np.testing.assert_array_equal(results[2].tokens, seq[1].tokens)


def test_online_deadline_and_max_queue(tiny, rng):
    """deadline_s: a queued request whose deadline passed is rejected
    without a prefill; an in-flight request past its deadline cancels at
    harvest. max_queue: submit() raises queue.Full at the backlog bound."""
    import queue as queue_lib

    engine, reqs = _build(tiny, rng, n_reqs=3)
    server = ContinuousServer(
        engine, batch_slots=1, segment_steps=2, max_new_tokens=24,
        gap_capacity=64,
    )
    import threading

    admitted = threading.Event()
    with server.start_online(max_queue=1) as handle:
        # slot busy with a long request (wait for its admission so the
        # backlog is empty), then fill the backlog with an already-expired
        # request: the NEXT submit must hit the max_queue bound
        f0 = handle.submit(dict(reqs[0], max_new_tokens=24),
                           on_tokens=lambda rid, t: admitted.set())
        assert admitted.wait(timeout=300)
        f1 = handle.submit(dict(reqs[1], deadline_s=0.0))
        with pytest.raises(queue_lib.Full):
            handle.submit(dict(reqs[2], deadline_s=0.0))
        r0, r1 = f0.result(timeout=300), f1.result(timeout=300)
        assert not r0.cancelled and len(r0.tokens) == 24
        assert r1.cancelled and len(r1.tokens) == 0  # never prefilled

    # in-flight deadline: expires mid-decode, cancels at a harvest with
    # whatever tokens were delivered by then. The callback sleeps per
    # harvest so the 200-token stream MUST outlive the deadline regardless
    # of machine speed; the admission passes (slot idle, dequeue is
    # immediate), so the cancel exercises the harvest-side expiry branch.
    import time as time_lib

    server2 = ContinuousServer(
        engine, batch_slots=1, segment_steps=1, max_new_tokens=200,
        gap_capacity=512,
    )
    with server2.start_online() as h2:
        h2.submit(dict(reqs[0], max_new_tokens=8)).result(timeout=300)  # warm
        res = h2.submit(
            dict(reqs[0], max_new_tokens=200, deadline_s=1.0),
            on_tokens=lambda rid, toks: time_lib.sleep(0.02),
        ).result(timeout=300)
    assert res.cancelled
    assert 1 <= len(res.tokens) < 200


def test_online_admission_error_isolated(tiny, rng):
    """Online mode: one bad request fails with ServeResult.error (the
    worker loop survives); the next request serves normally. run() keeps
    fail-fast semantics."""
    engine, reqs = _build(tiny, rng, n_reqs=1)
    server = ContinuousServer(
        engine, batch_slots=2, segment_steps=3, max_new_tokens=8,
        gap_capacity=64,
    )
    bad = {"input_ids": "not-an-array"}
    with server.start_online() as handle:
        res_bad = handle.submit(bad).result(timeout=300)
        assert res_bad.cancelled and res_bad.error
        assert len(res_bad.tokens) == 0
        res_ok = handle.submit(reqs[0]).result(timeout=300)
        assert not res_ok.cancelled and not res_ok.error
        np.testing.assert_array_equal(
            res_ok.tokens,
            engine.generate(**reqs[0], max_new_tokens=8).tokens,
        )
    assert server.stats["requests_failed"] == 1
    # the offline bench protocol wants the traceback, not isolation
    with pytest.raises(Exception):
        server.run([bad])


@pytest.mark.slow
def test_online_soak_invariants(tiny, rng):
    """Serving soak (round-4 VERDICT #4): ~120 online requests through one
    start_online worker with the full feature mix active at once — keyed
    prefix + vision caches (LRU churn: 2 slots, 5 videos), client cancels
    (on_tokens False), queued-expired and in-flight deadlines, an
    over-bucket failure, early-stop decode (config default), and a tiny
    gap capacity forcing constant compaction. Asserts the empirical
    invariants this stack has earned (the compaction race history): every
    future resolves exactly once, the loop stays alive to the end, the
    caches stay bounded, and the stats counters balance to the request
    count. Token parity for uncancelled requests is spot-checked against
    sequential generate (same engine => same early-stop semantics)."""
    engine, _ = _build(tiny, rng, n_reqs=0)
    n_videos, q_per_video, n = 5, 3, 120
    videos = [make_video_request(cfg=engine.cfg, rng=rng, grid_t=2,
                                 prompt_len=4 + v) for v in range(n_videos)]
    reqs = []
    for i in range(n):
        v = (i // q_per_video) % n_videos  # eval shape: grouped questions
        ids, patches, grid = videos[v]
        ids = ids.copy()
        ids[-2:] = 10 + (i % 89), 100 + (i % 37)  # vary the "question"
        reqs.append(dict(input_ids=ids, pixel_values_videos=patches,
                         video_grid_thw=grid, video_key=f"v{v}"))

    server = ContinuousServer(
        engine, batch_slots=3, segment_steps=2, max_new_tokens=10,
        gap_capacity=24,  # compacts every few segments at 3 lanes
        prefix_cache_slots=2, vision_cache_slots=2,
    )
    futures, kinds = [], []
    cancel_after_first = (
        lambda rid, toks: False)  # cancel on the 1st harvest delivery
    with server.start_online() as handle:
        for i, req in enumerate(reqs):
            if i == 57:  # malformed: fails THIS request, loop survives
                # (over-bucket rejection has its own dedicated test —
                # test_serve_rejects_over_bucket_request; at the default
                # 8192-token budget buckets a big max_new_tokens lands in
                # the same bucket and admits normally)
                futures.append(handle.submit({"input_ids": "not-an-array"}))
                kinds.append("failed")
            elif i % 17 == 5:  # expired while queued: no prefill spent
                futures.append(handle.submit(dict(req, deadline_s=0.0)))
                kinds.append("deadline")
            elif i % 13 == 7:  # client disconnect after the first tokens
                futures.append(handle.submit(
                    dict(req), on_tokens=cancel_after_first))
                kinds.append("cancel")
            else:
                futures.append(handle.submit(dict(req)))
                kinds.append("normal")
        results = [f.result(timeout=1200) for f in futures]
        # the loop is still alive after everything drains
        tail = handle.submit(dict(reqs[0])).result(timeout=300)
        assert not tail.cancelled and not tail.error

    st = server.stats
    assert len(results) == n and all(r is not None for r in results)
    n_kind = {k: kinds.count(k) for k in set(kinds)}
    # --- every request is accounted for exactly once ---
    assert st["requests_rejected_deadline"] == n_kind["deadline"]
    assert st["requests_failed"] == n_kind["failed"] == 1
    assert (st["requests_admitted"]
            == n + 1 - n_kind["deadline"] - n_kind["failed"])
    assert (st["requests_finished"] + st["requests_cancelled"]
            == st["requests_admitted"])
    n_cancelled_admitted = sum(
        1 for r, k in zip(results, kinds)
        if r.cancelled and k not in ("deadline", "failed"))
    assert st["requests_cancelled"] == n_cancelled_admitted
    assert st["tokens_emitted"] == (
        sum(len(r.tokens) for r in results) + len(tail.tokens))
    # --- per-kind result shape ---
    for r, k in zip(results, kinds):
        if k == "deadline":
            assert r.cancelled and len(r.tokens) == 0
        elif k == "failed":
            assert r.error and len(r.tokens) == 0
        elif k == "cancel":
            # EOS at the first token wins over a same-call cancel (the
            # request legitimately finished before the disconnect landed)
            assert r.cancelled or len(r.tokens) == 1
        else:
            assert not r.cancelled and not r.error and len(r.tokens) >= 1
    # --- caches bounded; keyed admissions all resolved through the cache ---
    assert len(server._prefix_cache) <= 2
    assert len(server._vision_cache) <= 2
    assert not server._prefix_disabled
    assert st["prefix_capture_failures"] == 0
    # the malformed request carries no video_key => no prefix lookup
    assert (st["prefix_cache_hits"] + st["prefix_cache_misses"]
            == st["requests_admitted"])
    # grouped keys beat 2-slot LRU churn: strictly more hits than captures
    assert st["prefix_cache_hits"] > st["prefix_cache_misses"] > 0
    assert st["compactions"] > 0

    # --- token parity spot checks (uncancelled requests only) ---
    for i in (0, 33, 101):
        while kinds[i] != "normal":
            i += 1
        seq = engine.generate(**{k: v for k, v in reqs[i].items()
                                 if k != "video_key"}, max_new_tokens=10)
        np.testing.assert_array_equal(results[i].tokens, seq.tokens)

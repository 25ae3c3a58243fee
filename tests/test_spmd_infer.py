"""SPMD inference: sharded params/KV through prefill + decode.

The capability hole VERDICT r1 flagged: callireader-8b (32L/4096h InternLM2,
/root/reference/InternVL/config.json) exceeds one v5e's HBM in bf16, so the
flagship must run with params + KV cache sharded over a mesh. These tests run
on the conftest 8-virtual-CPU-device platform:

  - token-exact parity of the sharded engine / batchers vs single-device
  - an 8B-WIDTH (depth-reduced) config proving the per-chip shards actually
    shrink through prefill and multi-slot decode (per-layer shapes are the
    full 8B ones; depth only scales the scan length)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.models import internlm2
from callireader_tpu.parallel import spmd
from callireader_tpu.runtime import generate as gen
from callireader_tpu.runtime.serving import ContinuousBatcher, Request

CFG = callireader_tiny().llm

needs_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _mesh():
    return spmd.make_mesh({"data": 2, "fsdp": 2, "tensor": 2, "seq": 1})


def _params():
    return internlm2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _sharded(params, mesh):
    return spmd.shard_tree(params, internlm2.logical_axes(CFG), mesh)


@needs_8_devices
def test_sharded_generate_token_parity():
    params = _params()
    mesh = _mesh()
    sharded = _sharded(params, mesh)
    # params actually shard: per-device wq shard is 1/4 of the full leaf
    full = sharded["layers"]["wq"]
    shard = full.addressable_shards[0].data
    assert shard.size == full.size // 4  # embed/fsdp(2) x qkv/tensor(2)

    ids = np.random.RandomState(0).randint(10, 900, (2, 16)).astype(np.int32)
    e = internlm2.embed_tokens(params, jnp.asarray(ids), jnp.float32)
    gc = gen.GenerateConfig(max_new_tokens=8, eos_token_ids=(-1,))
    t0, l0 = gen.generate_from_embeds(
        params, CFG, e, jnp.ones((2, 16), jnp.int32),
        gen_cfg=gc, max_cache_len=64, policy=FP32_POLICY, use_flash=False,
    )
    t1, l1 = gen.generate_from_embeds(
        sharded, CFG, jnp.asarray(np.asarray(e)), jnp.ones((2, 16), jnp.int32),
        gen_cfg=gc, max_cache_len=64, policy=FP32_POLICY, use_flash=False,
    )
    assert np.array_equal(np.asarray(l0), np.asarray(l1))
    assert np.array_equal(np.asarray(t0), np.asarray(t1))


@needs_8_devices
def test_sharded_batcher_token_parity():
    params = _params()
    mesh = _mesh()
    sharded = _sharded(params, mesh)
    rng = np.random.RandomState(1)
    prompts = [
        list(rng.randint(10, 900, 5)),
        list(rng.randint(10, 900, 9)),
        list(rng.randint(10, 900, 3)),
    ]

    def run(p, mesh=None):
        b = ContinuousBatcher(
            p, CFG, num_slots=2, max_len=256, policy=FP32_POLICY,
            use_flash=False, mesh=mesh,
        )
        for uid, ids in enumerate(prompts):
            e = np.asarray(
                internlm2.embed_tokens(params, jnp.asarray(np.asarray(ids)[None]), jnp.float32)
            )[0]
            b.submit(Request(uid=uid, embeds=e, max_new_tokens=6, eos_token_ids=(-1,)))
        return {r.uid: r.tokens for r in b.run()}

    base = run(params)
    shard = run(sharded, mesh=mesh)
    assert base == shard
    # and the sharded cache is actually distributed over kv-heads
    b = ContinuousBatcher(
        sharded, CFG, num_slots=2, max_len=256, policy=FP32_POLICY,
        use_flash=False, mesh=mesh,
    )
    assert b.cache_k.addressable_shards[0].data.shape[2] == CFG.num_key_value_heads // 2


@needs_8_devices
def test_sharded_paged_batcher_token_parity():
    from callireader_tpu.runtime.paged_cache import PagedBatcher

    params = _params()
    mesh = _mesh()
    sharded = _sharded(params, mesh)
    rng = np.random.RandomState(2)
    prompts = [list(rng.randint(10, 900, 5)), list(rng.randint(10, 900, 7))]

    def run(p, mesh=None):
        b = PagedBatcher(
            p, CFG, num_slots=2, num_pages=16, page_size=64, max_pages_per_slot=4,
            policy=FP32_POLICY, use_flash=False, mesh=mesh,
        )
        for uid, ids in enumerate(prompts):
            e = np.asarray(
                internlm2.embed_tokens(params, jnp.asarray(np.asarray(ids)[None]), jnp.float32)
            )[0]
            b.submit(Request(uid=uid, embeds=e, max_new_tokens=5, eos_token_ids=(-1,)))
        return {r.uid: r.tokens for r in b.run()}

    assert run(params) == run(sharded, mesh=mesh)


@needs_8_devices
def test_8b_width_sharded_prefill_and_decode():
    """Full 8B per-layer shapes (4096h, 32:8 GQA, 14336 mlp) at depth 2:
    every per-chip shard must shrink (except an odd vocab, which falls back
    to replicated until padded — exercised with a shrunk odd vocab; the real
    92553 tables behave identically but their virtual-device device_put takes
    tens of minutes on this 1-core host), and prefill + multislot decode must
    run under the mesh."""
    cfg8 = dataclasses.replace(
        callireader_tiny().llm,
        vocab_size=9253, hidden_size=4096, intermediate_size=14336,
        num_hidden_layers=2, num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=32768,
    )
    mesh = spmd.make_mesh({"data": 1, "fsdp": 2, "tensor": 4, "seq": 1})
    # manual param construction: f32 (CPU bf16 is emulated/slow), zero vocab
    # tables (1.5GB of random normals dominate runtime and don't affect
    # sharding); per-layer weights random so attention/mlp are exercised
    L, E, M = cfg8.num_hidden_layers, cfg8.hidden_size, cfg8.intermediate_size
    Hq, Hkv, D = cfg8.num_attention_heads, cfg8.num_key_value_heads, cfg8.head_dim
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    w = lambda k, shape: jax.random.normal(k, shape, jnp.float32) * 0.02
    params = {
        "tok_embeddings": jnp.zeros((cfg8.vocab_size, E), jnp.float32),
        "layers": {
            "attn_norm": jnp.ones((L, E), jnp.float32),
            "ffn_norm": jnp.ones((L, E), jnp.float32),
            "wq": w(ks[0], (L, E, Hq * D)),
            "wk": w(ks[1], (L, E, Hkv * D)),
            "wv": w(ks[2], (L, E, Hkv * D)),
            "wo": w(ks[3], (L, Hq * D, E)),
            "w1": w(ks[4], (L, E, M)),
            "w3": w(ks[5], (L, E, M)),
            "w2": w(ks[6], (L, M, E)),
        },
        "norm": jnp.ones((E,), jnp.float32),
        "output": jnp.zeros((cfg8.vocab_size, E), jnp.float32),
    }
    params = spmd.shard_tree(params, internlm2.logical_axes(cfg8), mesh)

    lay = params["layers"]
    for name in ("wq", "wk", "wv", "wo", "w1", "w3", "w2"):
        leaf = lay[name]
        assert leaf.addressable_shards[0].data.size == leaf.size // 8, name

    B, S, max_len = 1, 32, 64
    ids = np.random.RandomState(0).randint(10, 9000, (B, S)).astype(np.int32)
    logits, cache = internlm2.prefill(
        params, cfg8, input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((B, S), jnp.int32), max_len=max_len,
        use_flash=False,
    )
    assert logits.shape == (B, cfg8.vocab_size)

    # KV cache propagated from the sharded wk/wv: kv-heads shard over tensor
    kv_shard = cache.k.addressable_shards[0].data
    assert kv_shard.shape[2] == cfg8.num_key_value_heads // 4

    step_logits, ck, cv = internlm2.decode_step_multislot(
        params, cfg8,
        input_ids=jnp.ones((B, 1), jnp.int32),
        cache_k=cache.k, cache_v=cache.v,
        lengths=jnp.full((B,), S, jnp.int32),
        active=jnp.ones((B,), bool),
        use_flash=False,
    )
    assert np.isfinite(np.asarray(step_logits, np.float32)).all()


@needs_8_devices
def test_tp_flash_attention_parity():
    """shard_map-wrapped flash kernels (parallel/tp_attention.py): prefill +
    decode_step with heads split over tensor=2 must match the unsharded
    reference-attention path (interpret-mode Pallas on CPU)."""
    params = _params()
    mesh = _mesh()
    sharded = _sharded(params, mesh)
    B, S, max_len = 2, 16, 32
    ids = np.random.RandomState(3).randint(10, 900, (B, S)).astype(np.int32)
    e = internlm2.embed_tokens(params, jnp.asarray(ids), jnp.float32)
    mask = jnp.ones((B, S), jnp.int32)

    ref_logits, ref_cache = internlm2.prefill(
        params, CFG, inputs_embeds=e, attention_mask=mask, max_len=max_len,
        policy=FP32_POLICY, use_flash=False, cache_dtype=jnp.float32,
    )
    tp_logits, tp_cache = internlm2.prefill(
        sharded, CFG, inputs_embeds=jnp.asarray(np.asarray(e)),
        attention_mask=mask, max_len=max_len,
        policy=FP32_POLICY, use_flash=True, interpret=True, mesh=mesh,
        cache_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(tp_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )
    # cache shards over kv-heads via propagation from the sharded wk/wv
    assert tp_cache.k.addressable_shards[0].data.shape[2] == CFG.num_key_value_heads // 2

    tok = jnp.argmax(ref_logits, axis=-1)[:, None].astype(jnp.int32)
    ref_step, _ = internlm2.decode_step(
        params, CFG, input_ids=tok, cache=ref_cache,
        policy=FP32_POLICY, use_flash=False,
    )
    tp_step, _ = internlm2.decode_step(
        sharded, CFG, input_ids=tok, cache=tp_cache,
        policy=FP32_POLICY, use_flash=True, interpret=True, mesh=mesh,
    )
    np.testing.assert_allclose(
        np.asarray(tp_step), np.asarray(ref_step), rtol=2e-4, atol=2e-4
    )


@needs_8_devices
def test_pad_vocab_shards_and_masks():
    """pad_vocab: tables pad to a tensor-divisible size, pad rows shard, and
    greedy decode can never emit a padded id (logits masked to -inf) —
    token-exact vs the unpadded model."""
    params = _params()
    mesh = _mesh()
    padded, cfg_p = internlm2.pad_vocab(params, CFG, 16)
    assert cfg_p.vocab_size % 16 == 0 and cfg_p.real_vocab_size == CFG.vocab_size
    sharded = spmd.shard_tree(padded, internlm2.logical_axes(cfg_p), mesh)

    ids = np.random.RandomState(4).randint(10, 900, (2, 12)).astype(np.int32)
    e = internlm2.embed_tokens(params, jnp.asarray(ids), jnp.float32)
    gc = gen.GenerateConfig(max_new_tokens=6, eos_token_ids=(-1,))
    t0, _ = gen.generate_from_embeds(
        params, CFG, e, jnp.ones((2, 12), jnp.int32),
        gen_cfg=gc, max_cache_len=32, policy=FP32_POLICY, use_flash=False,
    )
    t1, _ = gen.generate_from_embeds(
        sharded, cfg_p, jnp.asarray(np.asarray(e)), jnp.ones((2, 12), jnp.int32),
        gen_cfg=gc, max_cache_len=32, policy=FP32_POLICY, use_flash=False,
    )
    assert np.array_equal(np.asarray(t0), np.asarray(t1))
    assert (np.asarray(t1) < CFG.vocab_size).all()

    # logits at padded ids are -inf
    logits, _ = internlm2.prefill(
        sharded, cfg_p, input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((2, 12), jnp.int32), max_len=32,
        policy=FP32_POLICY, use_flash=False,
    )
    assert np.all(np.asarray(logits)[:, CFG.vocab_size:] < -1e30)

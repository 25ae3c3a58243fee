"""InternLM2 decoder: numerics parity vs an independent torch golden model,
and prefill/decode-cache consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.models import internlm2

CFG = callireader_tiny().llm


def _params():
    return internlm2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _fwd(params, ids):
    f = jax.jit(lambda p, i: internlm2.forward(p, CFG, input_ids=i, policy=FP32_POLICY, use_flash=False))
    return f(params, ids)


def _prefill(params, ids, max_len, mask=None):
    f = jax.jit(
        lambda p, i, m: internlm2.prefill(
            p, CFG, input_ids=i, attention_mask=m, max_len=max_len,
            policy=FP32_POLICY, cache_dtype=jnp.float32, use_flash=False,
        )
    )
    if mask is None:
        mask = jnp.ones(ids.shape, jnp.int32)
    return f(params, ids, mask)


_DECODE = jax.jit(
    lambda p, i, c: internlm2.decode_step(p, CFG, input_ids=i, cache=c, policy=FP32_POLICY)
)


def test_forward_shapes():
    params = _params()
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, CFG.vocab_size)
    logits = _fwd(params, ids)
    assert logits.shape == (2, 10, CFG.vocab_size)
    assert logits.dtype == jnp.float32


def test_prefill_matches_forward():
    params = _params()
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 12), 0, CFG.vocab_size)
    full = _fwd(params, ids)
    last, cache = _prefill(params, ids, 32)
    np.testing.assert_allclose(np.asarray(last), np.asarray(full[:, -1]), atol=1e-4, rtol=1e-4)
    assert int(cache.length) == 12


def test_decode_steps_match_forward():
    params = _params()
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 16), 0, CFG.vocab_size)
    full = _fwd(params, ids)

    last, cache = _prefill(params, ids[:, :8], 32)
    np.testing.assert_allclose(np.asarray(last), np.asarray(full[:, 7]), atol=1e-4, rtol=1e-4)
    for t in range(8, 16):
        logits, cache = _DECODE(params, ids[:, t : t + 1], cache)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, t]), atol=1e-4, rtol=1e-4,
            err_msg=f"step {t}",
        )


def test_left_padding_equivalence():
    params = _params()
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 6), 0, CFG.vocab_size)
    pad = jnp.full((1, 4), CFG.pad_token_id, jnp.int32)
    padded = jnp.concatenate([pad, ids], axis=1)
    mask = jnp.concatenate([jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 6), jnp.int32)], axis=1)

    last_np, _ = _prefill(params, ids, 16)
    last_p, _ = _prefill(params, padded, 16, mask)
    np.testing.assert_allclose(np.asarray(last_p), np.asarray(last_np), atol=1e-4, rtol=1e-4)


def test_torch_golden_parity():
    """Independent torch implementation of the same math (GQA + RoPE +
    RMSNorm + SwiGLU), weights copied from the jax pytree."""
    torch = pytest.importorskip("torch")

    params = _params()
    p = jax.tree.map(lambda x: torch.tensor(np.asarray(x), dtype=torch.float64), params)
    cfg = CFG
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def t_rmsnorm(x, w, eps):
        var = x.pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(var + eps) * w

    def t_rope(x, pos):
        # x (B,H,S,D)
        inv = 1.0 / (cfg.rope_theta ** (torch.arange(0, D, 2, dtype=torch.float64) / D))
        freqs = pos[:, None].double() * inv[None, :]  # (S, D/2)
        emb = torch.cat([freqs, freqs], dim=-1)
        cos, sin = emb.cos(), emb.sin()
        half = D // 2
        x1, x2 = x[..., :half], x[..., half:]
        rot = torch.cat([-x2, x1], dim=-1)
        return x * cos + rot * sin

    ids_np = np.array([[5, 17, 3, 9, 250, 41, 7, 100]])
    ids = torch.tensor(ids_np)
    x = p["tok_embeddings"][ids]  # (1,S,E)
    B, S, E = x.shape
    pos = torch.arange(S)

    for l in range(cfg.num_hidden_layers):
        lp = {k: v[l] for k, v in p["layers"].items()}
        h = t_rmsnorm(x, lp["attn_norm"], cfg.rms_norm_eps)
        q = (h @ lp["wq"]).reshape(B, S, Hq, D).transpose(1, 2)
        k = (h @ lp["wk"]).reshape(B, S, Hkv, D).transpose(1, 2)
        v = (h @ lp["wv"]).reshape(B, S, Hkv, D).transpose(1, 2)
        q, k = t_rope(q, pos), t_rope(k, pos)
        k = k.repeat_interleave(Hq // Hkv, dim=1)
        v = v.repeat_interleave(Hq // Hkv, dim=1)
        s = (q @ k.transpose(-2, -1)) / (D**0.5)
        causal = torch.tril(torch.ones(S, S, dtype=torch.bool))
        s = s.masked_fill(~causal, float("-inf"))
        a = torch.softmax(s, dim=-1)
        ctx = (a @ v).transpose(1, 2).reshape(B, S, Hq * D)
        x = x + ctx @ lp["wo"]
        h = t_rmsnorm(x, lp["ffn_norm"], cfg.rms_norm_eps)
        x = x + (torch.nn.functional.silu(h @ lp["w1"]) * (h @ lp["w3"])) @ lp["w2"]

    x = t_rmsnorm(x, p["norm"], cfg.rms_norm_eps)
    golden = (x @ p["output"].T).numpy()

    ours = _fwd(params, jnp.asarray(ids_np))
    np.testing.assert_allclose(np.asarray(ours), golden, atol=5e-4, rtol=5e-4)


def test_dynamic_ntk_gated_on_runtime_length():
    """A cache allocated beyond max_position_embeddings must NOT change RoPE
    frequencies for short sequences; the rescale kicks in only once the
    runtime max position crosses the window (modeling_internlm2.py:216-233)."""
    import dataclasses

    from callireader_tpu.core.config import callireader_tiny
    from callireader_tpu.models.internlm2 import cos_sin_for, rope_cos_sin, rope_inv_freq

    cfg = dataclasses.replace(
        callireader_tiny().llm,
        max_position_embeddings=64, rope_scaling_type="dynamic", rope_scaling_factor=2.0,
    )
    short_pos = jnp.arange(10, dtype=jnp.int32)[None, :]
    # capacity 128 > window 64, but runtime length 10 is short: must equal
    # the unscaled tables
    cos, sin = cos_sin_for(cfg, short_pos, 128)
    ref_cos, ref_sin = rope_cos_sin(
        short_pos.astype(jnp.float32), rope_inv_freq(cfg, 64)
    )
    np.testing.assert_allclose(np.asarray(cos), np.asarray(ref_cos), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), np.asarray(ref_sin), rtol=1e-6)

    # runtime length past the window: tables must differ (rescaled base)
    long_pos = jnp.arange(100, dtype=jnp.int32)[None, :]
    cos_l, _ = cos_sin_for(cfg, long_pos, 128)
    ref_cos_l, _ = rope_cos_sin(long_pos.astype(jnp.float32), rope_inv_freq(cfg, 64))
    assert float(jnp.max(jnp.abs(cos_l - ref_cos_l))) > 1e-4

"""Resampler torch-golden parity, VQ/denorm, and embed splicing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from callireader_tpu.align import vq
from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.models import resampler

RCFG = callireader_tiny().resampler


def test_resampler_shapes():
    params = resampler.init_params(jax.random.PRNGKey(0), RCFG, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, RCFG.dim))
    out = jax.jit(lambda p, x: resampler.forward(p, RCFG, x, policy=FP32_POLICY))(params, x)
    assert out.shape == (2, RCFG.num_learns, RCFG.dim)


def test_resampler_torch_golden():
    torch = pytest.importorskip("torch")
    cfg = RCFG
    params = resampler.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    p = jax.tree.map(lambda t: torch.tensor(np.asarray(t), dtype=torch.float64), params)

    x_np = np.random.RandomState(0).randn(2, 16, cfg.dim).astype(np.float32)
    x = torch.tensor(x_np, dtype=torch.float64)
    B = x.shape[0]
    H, Dh = cfg.heads, cfg.dim_head

    def ln(t, s, b):
        mean = t.mean(-1, keepdim=True)
        var = t.var(-1, unbiased=False, keepdim=True)
        return (t - mean) / torch.sqrt(var + 1e-5) * s + b

    learns = p["learns"].expand(B, cfg.num_learns, cfg.dim)
    for l in range(cfg.depth):
        lp = {k: v[l] for k, v in p["layers"].items()}
        xm = ln(x, lp["norm_media_scale"], lp["norm_media_bias"])
        lnr = ln(learns, lp["norm_learns_scale"], lp["norm_learns_bias"])
        q = lnr @ lp["to_q"]
        kv_in = torch.cat([xm, lnr], dim=1)
        k, v = (kv_in @ lp["to_kv"]).chunk(2, dim=-1)

        def heads(t):
            return t.reshape(B, t.shape[1], H, Dh).transpose(1, 2)

        q, k, v = heads(q) * Dh**-0.5, heads(k), heads(v)
        sim = q @ k.transpose(-2, -1)
        sim = sim - sim.amax(dim=-1, keepdim=True)
        attn = sim.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, -1, H * Dh)
        learns = out @ lp["to_out"] + learns
        h = ln(learns, lp["ff_norm_scale"], lp["ff_norm_bias"])
        h = torch.nn.functional.gelu(h @ lp["ff1"] + lp["ff1_bias"])
        learns = learns + h @ lp["ff2"] + lp["ff2_bias"]
    golden = ln(learns, p["norm_scale"], p["norm_bias"]).numpy()

    ours = np.asarray(resampler.forward(params, cfg, jnp.asarray(x_np), policy=FP32_POLICY))
    np.testing.assert_allclose(ours, golden, atol=1e-4, rtol=1e-4)


def test_vq_cos_sim_torch_golden():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    table = rng.randn(32, 8).astype(np.float32)
    x = rng.randn(2, 3, 8).astype(np.float32)

    # reference math (models/similarity.py:8-27)
    tin = torch.tensor(x)
    temb = torch.tensor(table)
    sim = torch.matmul(F.normalize(tin, p=2, dim=2), F.normalize(temb, p=2, dim=1).t())
    gold_vals, gold_idx = sim.max(dim=2)

    idx, vals = vq.vq_cos_sim(jnp.asarray(table), jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(idx), gold_idx.numpy())
    np.testing.assert_allclose(np.asarray(vals), gold_vals.numpy(), atol=1e-5)


def test_gaussian_denorm_and_hard_vq():
    rng = np.random.RandomState(3)
    table = rng.randn(16, 4).astype(np.float32)
    out = rng.randn(1, 3, 4).astype(np.float32)
    mu = rng.randn(16).astype(np.float32)
    sigma = rng.rand(16).astype(np.float32) + 0.5

    emb, idx = vq.calli_align_embed(
        jnp.asarray(out), jnp.asarray(table), jnp.asarray(mu), jnp.asarray(sigma)
    )
    idx = np.asarray(idx)
    expected = out.reshape(-1, 4) * sigma[idx.reshape(-1)][:, None] + mu[idx.reshape(-1)][:, None]
    np.testing.assert_allclose(np.asarray(emb), expected, atol=1e-5)

    # hard-vq: rows below threshold replaced by table rows pre-denorm
    emb2, idx2 = vq.calli_align_embed(
        jnp.asarray(out), jnp.asarray(table), jnp.asarray(mu), jnp.asarray(sigma),
        hard_vq=True, hard_vq_threshold=1.1,  # force all rows quantized
    )
    q = table[np.asarray(idx2).reshape(-1)]
    expected2 = q * sigma[np.asarray(idx2).reshape(-1)][:, None] + mu[np.asarray(idx2).reshape(-1)][:, None]
    np.testing.assert_allclose(np.asarray(emb2), expected2, atol=1e-5)


def test_splice_embeds():
    B, S, E = 2, 6, 4
    ids = np.zeros((B, S), np.int32)
    ids[0, [1, 3]] = 7
    ids[1, [2]] = 7
    embeds = np.zeros((B, S, E), np.float32)
    repl = np.arange(3 * E, dtype=np.float32).reshape(3, E) + 100

    out = np.asarray(
        vq.splice_embeds(jnp.asarray(embeds), jnp.asarray(ids), jnp.asarray(repl), 7)
    )
    np.testing.assert_allclose(out[0, 1], repl[0])
    np.testing.assert_allclose(out[0, 3], repl[1])
    np.testing.assert_allclose(out[1, 2], repl[2])
    assert np.all(out[0, 0] == 0) and np.all(out[1, 5] == 0)

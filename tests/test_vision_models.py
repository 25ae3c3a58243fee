"""InternViT + projector: torch golden-model parity on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.models import internvit, projector

CFG = callireader_tiny()


def test_vit_shapes():
    params = internvit.init_params(jax.random.PRNGKey(0), CFG.vision, dtype=jnp.float32)
    px = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    f = jax.jit(lambda p, x: internvit.forward(p, CFG.vision, x, policy=FP32_POLICY, use_flash=False))
    out = f(params, px)
    assert out.shape == (2, 1 + CFG.vision.num_patches, CFG.vision.hidden_size)


def test_vit_torch_golden():
    torch = pytest.importorskip("torch")
    vcfg = CFG.vision
    params = internvit.init_params(jax.random.PRNGKey(0), vcfg, dtype=jnp.float32)
    p = jax.tree.map(lambda x: torch.tensor(np.asarray(x), dtype=torch.float64), params)

    px_np = np.random.RandomState(0).randn(1, 56, 56, 3).astype(np.float32)
    px_t = torch.tensor(px_np, dtype=torch.float64).permute(0, 3, 1, 2)  # NCHW

    E, P, H = vcfg.hidden_size, vcfg.patch_size, vcfg.num_attention_heads
    Dh = vcfg.head_dim

    # patch embed: conv(stride=kernel) == unfold+matmul; jax kernel is
    # (C*P*P, E) in torch (c,kh,kw) flatten order
    conv_w = p["patch_embed"]["kernel"].T.reshape(E, 3, P, P)
    x = torch.nn.functional.conv2d(px_t, conv_w, p["patch_embed"]["bias"], stride=P)
    B = x.shape[0]
    x = x.flatten(2).transpose(1, 2)  # (B, S, E)
    cls = p["cls_token"].expand(B, 1, E)
    x = torch.cat([cls, x], dim=1)
    x = x + p["pos_embed"]

    def ln(t, s, b):
        mean = t.mean(-1, keepdim=True)
        var = t.var(-1, unbiased=False, keepdim=True)
        return (t - mean) / torch.sqrt(var + vcfg.layer_norm_eps) * s + b

    S = x.shape[1]
    for l in range(vcfg.num_hidden_layers):
        lp = {k: v[l] for k, v in p["layers"].items()}
        h = ln(x, lp["norm1_scale"], lp["norm1_bias"])
        qkv = h @ lp["qkv_kernel"] + lp["qkv_bias"]
        qkv = qkv.reshape(B, S, 3, H, Dh)
        q, k, v = [qkv[:, :, i].transpose(1, 2) for i in range(3)]
        a = torch.softmax(q @ k.transpose(-2, -1) / Dh**0.5, dim=-1)
        ctx = (a @ v).transpose(1, 2).reshape(B, S, E)
        ctx = ctx @ lp["proj_kernel"] + lp["proj_bias"]
        x = x + ctx * lp["ls1"]
        h = ln(x, lp["norm2_scale"], lp["norm2_bias"])
        h = torch.nn.functional.gelu(h @ lp["fc1_kernel"] + lp["fc1_bias"])
        h = h @ lp["fc2_kernel"] + lp["fc2_bias"]
        x = x + h * lp["ls2"]
    golden = x.numpy()

    f = jax.jit(lambda p, x: internvit.forward(p, vcfg, x, policy=FP32_POLICY, use_flash=False))
    ours = np.asarray(f(params, jnp.asarray(px_np)))
    np.testing.assert_allclose(ours, golden, atol=1e-4, rtol=1e-4)


def test_pixel_shuffle_torch_golden():
    torch = pytest.importorskip("torch")
    # exact mirror of modeling_internvl_chat.py:283-297 (ps v2)
    x_np = np.random.RandomState(1).randn(2, 4, 4, 16).astype(np.float32)
    scale = 0.5
    xt = torch.tensor(x_np)
    n, w, h, c = xt.shape
    t = xt.view(n, w, int(h * scale), int(c / scale))
    t = t.permute(0, 2, 1, 3).contiguous()
    t = t.view(n, int(h * scale), int(w * scale), int(c / (scale * scale)))
    t = t.permute(0, 2, 1, 3).contiguous()
    golden = t.numpy()

    ours = np.asarray(projector.pixel_shuffle(jnp.asarray(x_np), scale))
    np.testing.assert_allclose(ours, golden, atol=0, rtol=0)


def test_extract_feature_token_count():
    params = projector.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    vit_hidden = jax.random.normal(
        jax.random.PRNGKey(1), (2, 1 + CFG.vision.num_patches, CFG.vision.hidden_size)
    )
    out = projector.extract_feature(params, vit_hidden, CFG, policy=FP32_POLICY)
    assert out.shape == (2, CFG.num_image_token, CFG.llm.hidden_size)

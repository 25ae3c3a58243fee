"""int8 weight-only quantization: accuracy, size, decode equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.models import internlm2
from callireader_tpu.runtime import quantize
from callireader_tpu.runtime import generate as gen

CFG = callireader_tiny().llm


def test_quantize_roundtrip_error_small():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.02
    q, scale = quantize.quantize_weight(w)
    deq = quantize.dequantize_weight(q, scale, jnp.float32)
    rel = float(jnp.max(jnp.abs(deq - w)) / jnp.max(jnp.abs(w)))
    assert rel < 0.01
    assert q.dtype == jnp.int8


def test_quantized_llm_smaller_and_close():
    params = internlm2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    qparams = quantize.quantize_llm_int8(params)
    assert quantize.param_bytes(qparams) < 0.4 * quantize.param_bytes(params)

    ids = jnp.asarray(np.array([[1, 5, 9, 3, 7, 11]], np.int32))
    full = internlm2.forward(params, CFG, input_ids=ids, policy=FP32_POLICY, use_flash=False)
    quant = internlm2.forward(qparams, CFG, input_ids=ids, policy=FP32_POLICY, use_flash=False)
    pf = jax.nn.softmax(full, axis=-1)
    pq = jax.nn.softmax(quant, axis=-1)
    # distributions stay close (tiny random model is the hard case)
    tvd = float(0.5 * jnp.abs(pf - pq).sum(-1).mean())
    assert tvd < 0.15, tvd


def test_quantized_greedy_decode_runs():
    params = internlm2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    qparams = quantize.quantize_llm_int8(params)
    embeds = internlm2.embed_tokens(qparams, jnp.asarray([[1, 5, 9]]), jnp.float32)
    toks, lengths = gen.generate_from_embeds(
        qparams, CFG, embeds, jnp.ones((1, 3), jnp.int32),
        gen_cfg=gen.GenerateConfig(max_new_tokens=4, eos_token_ids=(-1,)),
        max_cache_len=16, policy=FP32_POLICY, use_flash=False,
    )
    assert int(lengths[0]) == 4


def test_quantized_axes_cover_all_leaves():
    params = internlm2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    qparams = quantize.quantize_llm_int8(params)
    axes = quantize.quantized_logical_axes(internlm2.logical_axes(CFG), qparams)
    # identical tree structure
    assert jax.tree.structure(jax.tree.map(lambda _: 0, qparams)) == jax.tree.structure(
        jax.tree.map(lambda _: 0, axes,
                     is_leaf=lambda x: isinstance(x, tuple) or x is None)
    )


def test_quantized_vit_close_and_engine_runs():
    """int8 ViT (--quant int8-all, W8A8: dynamic per-token activation quant
    + int8 MXU matmuls): forward stays close to bf16 (relative error bounded
    by the int8 rounding), engine encode path runs, axes cover every leaf."""
    import numpy as np

    from callireader_tpu.core.config import callireader_tiny
    from callireader_tpu.models import internvit
    from callireader_tpu.parallel import spmd
    from callireader_tpu.runtime.engine import CalliReaderEngine, init_all_params
    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer

    cfg = callireader_tiny()
    rng = np.random.RandomState(0)
    params = internvit.init_params(jax.random.PRNGKey(0), cfg.vision, jnp.float32)
    px = jnp.asarray(rng.randint(0, 255, (2, cfg.force_image_size,
                                          cfg.force_image_size, 3), np.uint8))
    ref = internvit.forward(params, cfg.vision, px, policy=FP32_POLICY, use_flash=False)
    qv = quantize.quantize_vit_int8(params)
    assert qv["layers"]["qkv_kernel_q"].dtype == jnp.int8
    assert "qkv_kernel" not in qv["layers"]
    got = internvit.forward(qv, cfg.vision, px, policy=FP32_POLICY, use_flash=False)
    rel = float(jnp.linalg.norm(got - ref) / (jnp.linalg.norm(ref) + 1e-9))
    assert rel < 0.08, rel

    # axes tree matches the quantized structure (sharding path)
    full = init_all_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    full["vision"] = quantize.quantize_vit_int8(full["vision"])
    axes = spmd.engine_logical_axes(cfg, full)
    assert jax.tree.structure(
        jax.tree.map(lambda _: 0, full["vision"])
    ) == jax.tree.structure(
        jax.tree.map(lambda _: 0, axes["vision"],
                     is_leaf=lambda x: isinstance(x, tuple) or x is None)
    )

    # whole-engine smoke: tiles through the quantized tower
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    eng = CalliReaderEngine(cfg, full, tok, policy=FP32_POLICY, use_flash=False)
    feats = eng.encode_image_tiles(
        rng.randint(0, 255, (2, cfg.force_image_size, cfg.force_image_size, 3),
                    np.uint8)
    )
    assert np.isfinite(np.asarray(feats)).all()


def test_init_llm_int8_device_matches_quantized_tree():
    """init_llm_int8_device (leaf-by-leaf int8 init — how a random 8B fits
    one 16 GB chip) must produce the exact tree structure/shapes/dtypes of
    quantize_llm_int8(init_params(...)), and run the decode paths."""
    import jax.numpy as jnp

    from callireader_tpu.core.config import callireader_tiny
    from callireader_tpu.models import internlm2

    cfg = callireader_tiny().llm
    p8 = quantize.init_llm_int8_device(jax.random.PRNGKey(0), cfg)
    ref = quantize.quantize_llm_int8(
        internlm2.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    )
    assert jax.tree.structure(p8) == jax.tree.structure(ref)
    a = {jax.tree_util.keystr(k): (v.shape, str(v.dtype))
         for k, v in jax.tree_util.tree_leaves_with_path(p8)}
    b = {jax.tree_util.keystr(k): (v.shape, str(v.dtype))
         for k, v in jax.tree_util.tree_leaves_with_path(ref)}
    assert a == b
    # int8 tree is ~half the bf16 bytes (scales add a little back)
    bf = internlm2.init_params(jax.random.PRNGKey(1), cfg, jnp.bfloat16)
    assert quantize.param_bytes(p8) < 0.62 * quantize.param_bytes(bf)
    # prefill + one decode step run on the int8-initialized tree
    logits, cache = internlm2.prefill(
        p8, cfg, inputs_embeds=jnp.zeros((1, 8, cfg.hidden_size), jnp.bfloat16),
        attention_mask=jnp.ones((1, 8), jnp.int32), max_len=16, use_flash=False,
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_fuse_llm_int8_structure_and_exactness():
    """fuse_llm_int8 (single-device serving layout): concatenated QKV /
    gate-up int8 leaves must be bit-identical to the unfused leaves (per-out-
    channel scales concat losslessly), and init_llm_int8_device(fused=True)
    must produce the exact fused tree structure/shapes/dtypes."""
    import jax.numpy as jnp

    from callireader_tpu.core.config import callireader_tiny
    from callireader_tpu.models import internlm2

    cfg = callireader_tiny().llm
    base = quantize.quantize_llm_int8(
        internlm2.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    )
    fused = quantize.fuse_llm_int8(base)
    lay, flay = base["layers"], fused["layers"]
    for gone in ("wq_q", "wk_q", "wv_q", "w1_q", "w3_q"):
        assert gone not in flay
    np.testing.assert_array_equal(
        np.asarray(flay["wqkv_q"]),
        np.concatenate([np.asarray(lay["wq_q"]), np.asarray(lay["wk_q"]),
                        np.asarray(lay["wv_q"])], axis=-1))
    np.testing.assert_array_equal(
        np.asarray(flay["w13_scale"]),
        np.concatenate([np.asarray(lay["w1_scale"]),
                        np.asarray(lay["w3_scale"])], axis=-1))
    # fused init path matches the fused tree structure exactly
    p8 = quantize.init_llm_int8_device(jax.random.PRNGKey(0), cfg, fused=True)
    assert jax.tree.structure(p8) == jax.tree.structure(fused)
    a = {jax.tree_util.keystr(k): (v.shape, str(v.dtype))
         for k, v in jax.tree_util.tree_leaves_with_path(p8)}
    b = {jax.tree_util.keystr(k): (v.shape, str(v.dtype))
         for k, v in jax.tree_util.tree_leaves_with_path(fused)}
    assert a == b
    # LoRA-bearing trees are left alone (adapters attach to unfused names)
    with_lora = dict(base)
    with_lora["layers"] = dict(base["layers"], wq_lora_a=jnp.zeros((2, 4, 2)))
    assert quantize.fuse_llm_int8(with_lora) is with_lora

"""int8 decode with the fused-dequant kernel == the XLA dequant path.

Runs the REAL prefill/decode entry points on a mini config whose dims meet
the kernel's 128-block constraint, with the kernel forced into interpret
mode (CPU) vs forced off — greedy tokens and logits must match, proving the
Pallas path is a drop-in for the deployed int8 decode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from callireader_tpu.core.config import LLMConfig
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.models import internlm2
from callireader_tpu.runtime.quantize import quantize_llm_int8

CFG = LLMConfig(
    vocab_size=92553,  # real odd vocab: exercises the pad_vocab 128-padding
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_key_value_heads=1,
    max_position_embeddings=128,
)


def _run(params, cfg, mode, monkeypatch):
    monkeypatch.setenv("CALLIREADER_INT8_KERNEL", mode)
    ids = jnp.asarray(np.random.RandomState(0).randint(5, 900, (2, 7)))
    logits, cache = internlm2.prefill(
        params, cfg, input_ids=ids, max_len=32, cache_dtype=jnp.float32,
        policy=FP32_POLICY, use_flash=False)
    toks = [np.asarray(jnp.argmax(logits, -1))]
    cur = jnp.argmax(logits, -1)[:, None]
    all_logits = [np.asarray(logits, np.float32)]
    for _ in range(4):
        logits, cache = internlm2.decode_step(
            params, cfg, input_ids=cur, cache=cache, policy=FP32_POLICY,
            use_flash=False)
        cur = jnp.argmax(logits, -1)[:, None]
        toks.append(np.asarray(cur[:, 0]))
        all_logits.append(np.asarray(logits, np.float32))
    return np.stack(toks), all_logits


def test_kernel_matches_xla_path(monkeypatch):
    params = internlm2.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    qparams = quantize_llm_int8(params)
    qparams, cfg = internlm2.pad_vocab(qparams, CFG, 128)
    assert cfg.vocab_size % 128 == 0 and cfg.real_vocab_size == 92553

    toks_xla, logits_xla = _run(qparams, cfg, "0", monkeypatch)
    toks_krn, logits_krn = _run(qparams, cfg, "interpret", monkeypatch)
    np.testing.assert_array_equal(toks_krn, toks_xla)
    for a, b in zip(logits_krn, logits_xla):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_fused_qkv_mlp_matches_unfused(monkeypatch):
    """The fused wqkv/w13 serving layout (runtime/quantize.fuse_llm_int8)
    must reproduce the unfused decode exactly — same int8 values, and each
    output column's accumulation is unchanged by the concat — on both the
    XLA path and the Pallas kernel (interpret)."""
    from callireader_tpu.runtime.quantize import fuse_llm_int8

    params = internlm2.init_params(jax.random.PRNGKey(2), CFG, jnp.float32)
    qparams = quantize_llm_int8(params)
    qparams, cfg = internlm2.pad_vocab(qparams, CFG, 128)
    fused = dict(qparams)
    fused["layers"] = fuse_llm_int8({"layers": qparams["layers"]})["layers"]
    assert "wqkv_q" in fused["layers"] and "w13_q" in fused["layers"]

    for mode in ("0", "interpret"):
        toks_u, logits_u = _run(qparams, cfg, mode, monkeypatch)
        toks_f, logits_f = _run(fused, cfg, mode, monkeypatch)
        np.testing.assert_array_equal(toks_f, toks_u)
        for a, b in zip(logits_f, logits_u):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_pad_rows_never_win():
    params = internlm2.init_params(jax.random.PRNGKey(1), CFG, jnp.float32)
    qparams = quantize_llm_int8(params)
    qparams, cfg = internlm2.pad_vocab(qparams, CFG, 128)
    ids = jnp.asarray([[3, 4, 5]])
    logits, _ = internlm2.prefill(
        params=qparams, cfg=cfg, input_ids=ids, max_len=8,
        cache_dtype=jnp.float32, policy=FP32_POLICY, use_flash=False)
    assert int(jnp.argmax(logits, -1)[0]) < 92553
    assert float(logits[0, 92553:].max()) == float(jnp.finfo(logits.dtype).min)

"""Packed-QKV flash attention for the ViT (non-causal, no segments).

Parity analog: the reference ViT runs flash-attn's qkv-packed kernel on the
fused QKV projection (modeling_intern_vit.py:40-101). The profiled XLA version
of the unpacked path spent ~25% of encoder time on layout shuffles (split +
(B,S,H,D)->(B,H,S,D) transposes + seq pads). This kernel consumes the fused
projection output directly in (B, S, 3E) layout and writes (B, S, E) — zero
transposes in the whole attention block. Heads are unrolled inside the kernel;
per-head online-softmax state lives in scratch lanes (m/l column h = head h).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    q_ref,  # (1, block_q, E)
    k_ref,  # (1, block_k, E)
    v_ref,  # (1, block_k, E)
    o_ref,  # (1, block_q, E)
    m_scratch,  # (block_q, 128) f32 — column h = head h
    l_scratch,  # (block_q, 128) f32
    acc_scratch,  # (block_q, E) f32
    *,
    num_heads: int,
    head_dim: int,
    scale: float,
    block_q: int,
    block_k: int,
    num_k_blocks: int,
    kv_valid: int,
):
    kb = pl.program_id(2)
    E = num_heads * head_dim

    @pl.when(kb == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    boundary_block = (kv_valid - 1) // block_k
    k_pos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    need_mask = kb == boundary_block

    qrows = q_ref[0]  # (bq, E)
    krows = k_ref[0]  # (bk, E)
    vrows = v_ref[0]  # (bk, E)

    for h in range(num_heads):
        q = qrows[:, h * head_dim : (h + 1) * head_dim]
        k = krows[:, h * head_dim : (h + 1) * head_dim]
        v = vrows[:, h * head_dim : (h + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(jnp.logical_and(need_mask, k_pos >= kv_valid), NEG_INF, s)

        m_prev = m_scratch[:, h : h + 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_scratch[:, h : h + 1] + jnp.sum(p, axis=-1, keepdims=True)
        m_scratch[:, h : h + 1] = m_new
        l_scratch[:, h : h + 1] = l_new
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[:, h * head_dim : (h + 1) * head_dim] = (
            acc_scratch[:, h * head_dim : (h + 1) * head_dim] * alpha + pv
        )

    @pl.when(kb == num_k_blocks - 1)
    def _finalize():
        for h in range(num_heads):
            l = l_scratch[:, h : h + 1]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, :, h * head_dim : (h + 1) * head_dim] = (
                acc_scratch[:, h * head_dim : (h + 1) * head_dim] / l_safe
            ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "block_q", "block_k", "interpret"))
def flash_attention_packed_qkv(
    qkv: jax.Array,  # (B, S, 3E) — fused projection output
    num_heads: int,
    *,
    scale: Optional[float] = None,
    block_q: int = 384,
    block_k: int = 384,
    interpret: bool = False,
) -> jax.Array:
    """Non-causal full attention over packed QKV rows -> (B, S, E)."""
    B, S, threeE = qkv.shape
    E = threeE // 3
    D = E // num_heads
    if scale is None:
        scale = D**-0.5

    def best_block(limit, size):
        cands = [c for c in (512, 384, 256, 128) if c <= limit]
        if not cands or size <= cands[-1]:
            return min(limit, max(size, 16))
        return min(cands, key=lambda c: (-(-size // c) * c, -c))

    # explicit multiples of 128 above the tuning list are honored as-is
    # (e.g. block_k covering the whole padded row -> nk=1, no online-softmax
    # carry and a deep pv contraction)
    if block_q % 128 or block_q > max(S, 128):
        block_q = best_block(block_q, S)
    if block_k % 128 or block_k > -(-S // 128) * 128:
        block_k = best_block(block_k, S)
    else:
        block_k = min(block_k, -(-S // 128) * 128)
    Sp = S
    Sp = -(-Sp // block_q) * block_q
    Sp = -(-Sp // block_k) * block_k
    if Sp != S:
        qkv = jnp.pad(qkv, ((0, 0), (0, Sp - S), (0, 0)))
    nq, nk = Sp // block_q, Sp // block_k

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            num_heads=num_heads,
            head_dim=D,
            scale=scale,
            block_q=block_q,
            block_k=block_k,
            num_k_blocks=nk,
            kv_valid=S,
        ),
        grid=(B, nq, nk),
        in_specs=[
            # three views of the same packed array: q / k / v column blocks
            pl.BlockSpec((1, block_q, E), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, E), lambda b, i, j: (b, j, 1)),
            pl.BlockSpec((1, block_k, E), lambda b, i, j: (b, j, 2)),
        ],
        out_specs=pl.BlockSpec((1, block_q, E), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Sp, E), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, E), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out[:, :S, :]

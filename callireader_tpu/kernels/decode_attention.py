"""Pallas flash-decode: single-token GQA attention over the full KV cache.

The decode hot loop reads the entire cache every step; the XLA fallback
(attention_reference) upcasts it to fp32 and materializes intermediates, which
dominates step time at serving batch sizes. This kernel:

  - takes the WHOLE stacked cache (L, B, Hkv, S, D) and selects the layer via
    a scalar-prefetch index in the BlockSpec index_map — no per-layer
    dynamic-slice copies ever materialize;
  - streams bf16 KV blocks HBM->VMEM and accumulates fp32 in VMEM scratch
    (online softmax across KV blocks);
  - masks per-row validity from a (B, 1, S) int32 mask (covers left-padded
    prompts, ring positions past the write head, and multislot serving).

Replaces the reference's flash-decode need (HF generate + flash-attn CUDA path,
modeling_internlm2.py:430+) with a TPU-native kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(
    layer_ref,  # scalar prefetch: (1,) int32
    q_ref,      # (1, 1, G, D)
    k_ref,      # (1, 1, 1, block_k, D)
    v_ref,      # (1, 1, 1, block_k, D)
    valid_ref,  # (1, 1, block_k) int32
    o_ref,      # (1, 1, G, D)
    m_scratch,  # (G, 128) f32
    l_scratch,  # (G, 128) f32
    acc_scratch,  # (G, D) f32
    *,
    scale: float,
    num_k_blocks: int,
):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0].astype(jnp.float32)  # (G, D)
    k = k_ref[0, 0, 0]  # (bk, D) bf16
    s = jax.lax.dot_general(
        q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (G, bk)

    valid = valid_ref[0, 0] > 0  # (bk,)
    s = jnp.where(valid[None, :], s, NEG_INF)

    m_prev = m_scratch[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_scratch[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scratch[...] = acc_scratch[...] * alpha + pv

    @pl.when(kb == num_k_blocks - 1)
    def _finalize():
        l = l_scratch[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scratch[...] / l_safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_k", "interpret")
)
def flash_decode(
    q: jax.Array,          # (B, Hq, 1, D)
    cache_k: jax.Array,    # (L, B, Hkv, S, D)
    cache_v: jax.Array,
    layer_idx: jax.Array,  # () int32
    valid_mask: jax.Array,  # (B, S) int32, 1 = attendable
    *,
    scale: Optional[float] = None,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """-> (B, Hq, 1, D) in q.dtype."""
    B, Hq, _, D = q.shape
    L, _, Hkv, S, _ = cache_k.shape
    G = Hq // Hkv
    if scale is None:
        scale = D**-0.5
    # One whole row per program when k+v fit VMEM comfortably: per-program
    # launch overhead dominates at decode sizes (the data volume per layer is
    # sub-millisecond at HBM speed), so fewer, fatter programs win.
    if S * D * 2 * cache_k.dtype.itemsize <= 6 * 1024 * 1024:
        block_k = S
    else:
        # chunked fallback: pick a block that divides S — padding the cache
        # would materialize a copy, defeating the point of the kernel
        for cand in (block_k, 512, 256, 128, 64, 32, 16, 8):
            if cand <= S and S % cand == 0:
                block_k = cand
                break
        else:
            raise ValueError(f"cache length {S} has no supported block divisor")
    nk = S // block_k

    qg = q[:, :, 0, :].reshape(B, Hkv, G, D)
    valid3 = valid_mask.astype(jnp.int32)[:, None, :]  # (B, 1, S)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, nk),
        in_specs=[
            pl.BlockSpec((1, 1, G, D), lambda b, h, s, l_ref: (b, h, 0, 0)),
            pl.BlockSpec(
                (1, 1, 1, block_k, D),
                lambda b, h, s, l_ref: (l_ref[0], b, h, s, 0),
            ),
            pl.BlockSpec(
                (1, 1, 1, block_k, D),
                lambda b, h, s, l_ref: (l_ref[0], b, h, s, 0),
            ),
            pl.BlockSpec((1, 1, block_k), lambda b, h, s, l_ref: (b, 0, s)),
        ],
        out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h, s, l_ref: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, num_k_blocks=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray([layer_idx], jnp.int32).reshape(1), qg, cache_k, cache_v, valid3)
    return out.reshape(B, Hq, 1, D)

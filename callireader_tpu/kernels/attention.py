"""Fused attention for TPU.

Replaces the reference's external flash-attn CUDA kernels:
  - ViT packed-QKV non-causal attention   (InternVL/modeling_intern_vit.py:40-101)
  - LLM causal GQA FlashAttention2        (InternVL/modeling_internlm2.py:430-...)
  - varlen/packed attention with cu_seqlens (train/xtuner dispatch) — expressed
    here as segment ids, the TPU-native equivalent.

Two implementations with one signature:
  * ``attention_reference`` — pure-XLA einsum attention (fp32 softmax). XLA fuses
    this well enough for small shapes; it is also the golden model for tests.
  * ``flash_attention`` — Pallas kernel, online-softmax tiling over KV blocks,
    fp32 accumulators in VMEM scratch, causal block skipping.

Layout convention: q (B, Hq, Sq, D); k, v (B, Hkv, Sk, D); Hq % Hkv == 0.
GQA is handled by BlockSpec index maps (no materialized repeat_kv — the
reference materializes the repeat at modeling_internlm2.py:268-278, which costs
HBM bandwidth; here the MXU reads each KV block Hq/Hkv times straight from VMEM).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _segment_mask(q_seg, k_seg):
    # (Bq,) x (Bk,) -> (Bq, Bk) True where attention is allowed
    return q_seg[:, None] == k_seg[None, :]


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    q_offset: int | jax.Array = 0,
) -> jax.Array:
    """Golden-model attention. q (B,Hq,Sq,D), k/v (B,Hkv,Sk,D) -> (B,Hq,Sq,D).

    ``q_offset`` positions the query block inside the KV sequence for causal
    masking (used by decode where Sq << Sk).
    """
    B, Hq, Sq, D = q.shape
    Hkv = k.shape[1]
    groups = Hq // Hkv
    if scale is None:
        scale = D**-0.5

    qr = q.reshape(B, Hkv, groups, Sq, D)
    logits = jnp.einsum(
        "bhgqd,bhkd->bhgqk", qr.astype(jnp.float32), k.astype(jnp.float32)
    )
    logits *= scale

    mask = None
    if causal:
        q_pos = jnp.arange(Sq) + q_offset
        k_pos = jnp.arange(k.shape[2])
        mask = q_pos[:, None] >= k_pos[None, :]
    if q_segment_ids is not None:
        seg = _segment_mask(q_segment_ids[0] if q_segment_ids.ndim == 2 else q_segment_ids,
                            kv_segment_ids[0] if kv_segment_ids.ndim == 2 else kv_segment_ids)
        if q_segment_ids.ndim == 2:  # batched segment ids
            seg = jax.vmap(_segment_mask)(q_segment_ids, kv_segment_ids)  # (B,Sq,Sk)
            seg = seg[:, None, None]  # (B,1,1,Sq,Sk)
        mask = seg if mask is None else jnp.logical_and(mask, seg)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", probs, v.astype(jnp.float32))
    return out.reshape(B, Hq, Sq, D).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention
# ---------------------------------------------------------------------------


def _flash_kernel(
    q_ref,  # (1, 1, block_q, D)
    k_ref,  # (1, 1, block_k, D)
    v_ref,  # (1, 1, block_k, D)
    qseg_ref,  # (1, 1, block_q)
    kseg_ref,  # (1, 1, block_k)
    o_ref,  # (1, 1, block_q, D)
    m_scratch,  # (block_q, 128) f32
    l_scratch,  # (block_q, 128) f32
    acc_scratch,  # (block_q, D) f32
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    num_k_blocks: int,
    use_segments: bool,
    kv_valid: int,
    q_offset: int = 0,
):
    kb = pl.program_id(3)
    qb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # Causal: skip blocks entirely above the diagonal. q_offset positions the
    # query rows inside the KV sequence (chunked prefill: q is the suffix of a
    # longer cached sequence, so row i sits at absolute position i + q_offset).
    run = True
    if causal:
        run = qb * block_q + block_q - 1 + q_offset >= kb * block_k

    def _softmax_update(s):
        m_prev = m_scratch[:, :1]  # (bq, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # (bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # (bq, bk)
        alpha = jnp.exp(m_prev - m_new)  # (bq, 1)
        l_new = alpha * l_scratch[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, D)
        acc_scratch[...] = acc_scratch[...] * alpha + pv

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]  # (bq, D)
        k = k_ref[0, 0]  # (bk, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        s *= scale

        mask = None
        if causal:
            q_pos = qb * block_q + q_offset + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_pos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = q_pos >= k_pos
        if use_segments:
            qs = qseg_ref[0, 0]  # (bq,)
            ks = kseg_ref[0, 0]  # (bk,)
            seg = qs[:, None] == ks[None, :]
            mask = seg if mask is None else jnp.logical_and(mask, seg)
            s = jnp.where(mask, s, NEG_INF)
            _softmax_update(s)
        else:
            # no packing: only the tail block can touch the seq padding —
            # every other block skips all mask/VPU work
            boundary_block = (kv_valid - 1) // block_k
            if mask is not None:
                s = jnp.where(mask, s, NEG_INF)

            @pl.when(kb == boundary_block)
            def _masked():
                k_pos = kb * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1
                )
                _softmax_update(jnp.where(k_pos < kv_valid, s, NEG_INF))

            @pl.when(kb != boundary_block)
            def _plain():
                _softmax_update(s)

    @pl.when(kb == num_k_blocks - 1)
    def _finalize():
        l = l_scratch[:, :1]
        # Rows that attend to nothing (fully masked) produce l == 0: emit zeros.
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scratch[...] / l_safe).astype(o_ref.dtype)


def _pad_to(x, axis, mult, value=0):
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "interpret", "q_offset"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    q_offset: int = 0,
) -> jax.Array:
    """Pallas flash attention. Shapes as in ``attention_reference``.

    Sequences are padded to block multiples internally; padded KV columns are
    masked via segment ids (padding gets segment id -1, which never matches).
    Static ``q_offset`` places the query rows at absolute KV positions
    ``[q_offset, q_offset + Sq)`` for causal masking — the chunked-prefill
    case where K/V carry a cached prefix the queries fully attend to.
    """
    B, Hq, Sq, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    groups = Hq // Hkv
    if scale is None:
        scale = D**-0.5

    def best_block(limit: int, size: int) -> int:
        # minimize padding across 128-multiples, prefer fatter blocks on ties
        # (measured on the fused ViT encode: 384 blocks at seq 1025 beat 512)
        cands = [c for c in (512, 384, 256, 128) if c <= limit]
        if not cands or size <= cands[-1]:
            return min(limit, max(size, 16))
        return min(cands, key=lambda c: (-(-size // c) * c, -c))

    block_q = best_block(block_q, Sq)
    block_k = best_block(block_k, Sk)

    use_segments = q_segment_ids is not None
    if q_segment_ids is None:
        q_segment_ids = jnp.zeros((B, Sq), jnp.int32)
        kv_segment_ids = jnp.zeros((B, Sk), jnp.int32)
    q_segment_ids = _pad_to(q_segment_ids.astype(jnp.int32), 1, block_q, -1)
    kv_segment_ids = _pad_to(kv_segment_ids.astype(jnp.int32), 1, block_k, -2)
    # singleton middle dim so Mosaic's (sublane, lane) tiling rule is met:
    # block (1, 1, block) has dim -2 == array dim -2 == 1
    q_segment_ids = q_segment_ids[:, None, :]
    kv_segment_ids = kv_segment_ids[:, None, :]

    qp = _pad_to(q, 2, block_q)
    kp = _pad_to(k, 2, block_k)
    vp = _pad_to(v, 2, block_k)
    Sq_p, Sk_p = qp.shape[2], kp.shape[2]
    nq, nk = Sq_p // block_q, Sk_p // block_k

    grid = (B, Hq, nq, nk)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            causal=causal,
            scale=scale,
            block_q=block_q,
            block_k=block_k,
            num_k_blocks=nk,
            use_segments=use_segments,
            kv_valid=Sk,
            q_offset=q_offset,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j, g=groups: (b, h // g, j, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j, g=groups: (b, h // g, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq_p, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, q_segment_ids, kv_segment_ids)

    return out[:, :, :Sq, :]


def attention(
    q, k, v, *, causal=False, q_segment_ids=None, kv_segment_ids=None,
    scale=None, q_offset=0, use_flash: Optional[bool] = None, interpret: bool = False,
):
    """Dispatch: Pallas flash kernel on TPU, XLA reference elsewhere."""
    if use_flash is None:
        use_flash = (
            jax.devices()[0].platform == "tpu"
            and isinstance(q_offset, int)
            and q.shape[2] > 1
        )
    if use_flash:
        return flash_attention(
            q, k, v, causal=causal, q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids, scale=scale, interpret=interpret,
            q_offset=q_offset,
        )
    return attention_reference(
        q, k, v, causal=causal, q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids, scale=scale, q_offset=q_offset,
    )

"""Differentiable Pallas flash attention (forward + backward kernels).

Training at e-IT's max_length 8192 cannot materialize (B, H, S, S) attention
matrices — the reference leans on flash-attn's CUDA backward for this; here
the same memory profile comes from two Pallas backward kernels:

  dq:    grid (B, Hq, nq, nk)        — accumulate over KV blocks
  dk/dv: grid (B, Hkv, nk, G * nq)   — accumulate over all query blocks of
                                       every query head in the GQA group

The forward saves (O, LSE) so the backward recomputes P = exp(S - LSE) block
by block (classic FlashAttention-2 recurrence):

  D  = rowsum(dO * O)
  dV = P^T dO
  dP = dO V^T
  dS = P * (dP - D) * scale
  dQ = dS K ; dK = dS^T Q

Exposed as ``flash_attention_trainable`` (same mask semantics as
kernels/attention.flash_attention: causal + segment ids + seq padding).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _block_mask(qb, kb, block_q, block_k, causal, qseg, kseg):
    mask = None
    if causal:
        q_pos = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_pos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = q_pos >= k_pos
    seg = qseg[:, None] == kseg[None, :]
    mask = seg if mask is None else jnp.logical_and(mask, seg)
    return mask


# ---------------------------------------------------------------------------
# forward (saves LSE)
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
    o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, causal, scale, block_q, block_k, num_k_blocks,
):
    kb = pl.program_id(3)
    qb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    run = True
    if causal:
        run = qb * block_q + block_q - 1 >= kb * block_k

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        mask = _block_mask(qb, kb, block_q, block_k, causal, qseg_ref[0, 0], kseg_ref[0, 0])
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_scratch[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[...] = acc_scratch[...] * alpha + pv

    @pl.when(kb == num_k_blocks - 1)
    def _finalize():
        l = l_scratch[:, :1]
        m = m_scratch[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scratch[...] / l_safe).astype(o_ref.dtype)
        lse = jnp.where(l == 0.0, NEG_INF, m + jnp.log(l_safe))
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


# ---------------------------------------------------------------------------
# backward: dq
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref, dsum_ref,
    dq_ref,
    dq_scratch,
    *, causal, scale, block_q, block_k, num_k_blocks,
):
    kb = pl.program_id(3)
    qb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        dq_scratch[...] = jnp.zeros_like(dq_scratch)

    run = True
    if causal:
        run = qb * block_q + block_q - 1 >= kb * block_k

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        mask = _block_mask(qb, kb, block_q, block_k, causal, qseg_ref[0, 0], kseg_ref[0, 0])
        lse = lse_ref[0, 0][:, :1]
        lse_safe = jnp.where(lse <= NEG_INF / 2, 0.0, lse)
        p = jnp.where(mask, jnp.exp(s - lse_safe), 0.0)
        p = jnp.where(lse <= NEG_INF / 2, 0.0, p)

        do = do_ref[0, 0].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v_ref[0, 0].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        dsum = dsum_ref[0, 0][:, :1]
        ds = p * (dp - dsum) * scale
        dq_scratch[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kb == num_k_blocks - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scratch[...].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# backward: dk, dv  (accumulates over G query heads x q blocks)
# ---------------------------------------------------------------------------


def _make_bwd_dkv_kernel(num_q_blocks):
    def kernel(
        q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref, dsum_ref,
        dk_ref, dv_ref, dk_scratch, dv_scratch,
        *, causal, scale, block_q, block_k, num_inner,
    ):
        inner = pl.program_id(3)
        kb = pl.program_id(2)
        qb = jax.lax.rem(inner, num_q_blocks)

        @pl.when(inner == 0)
        def _init():
            dk_scratch[...] = jnp.zeros_like(dk_scratch)
            dv_scratch[...] = jnp.zeros_like(dv_scratch)

        run = True
        if causal:
            run = qb * block_q + block_q - 1 >= kb * block_k

        @pl.when(run)
        def _compute():
            q = q_ref[0, 0]
            k = k_ref[0, 0]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            mask = _block_mask(
                qb, kb, block_q, block_k, causal, qseg_ref[0, 0], kseg_ref[0, 0]
            )
            lse = lse_ref[0, 0][:, :1]
            lse_safe = jnp.where(lse <= NEG_INF / 2, 0.0, lse)
            p = jnp.where(mask, jnp.exp(s - lse_safe), 0.0)
            p = jnp.where(lse <= NEG_INF / 2, 0.0, p)

            do = do_ref[0, 0].astype(jnp.float32)
            # dV += P^T dO
            dv_scratch[...] += jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do, v_ref[0, 0].astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dsum = dsum_ref[0, 0][:, :1]
            ds = p * (dp - dsum) * scale
            # dK += dS^T Q
            dk_scratch[...] += jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(inner == num_inner - 1)
        def _finalize():
            dk_ref[0, 0] = dk_scratch[...].astype(dk_ref.dtype)
            dv_ref[0, 0] = dv_scratch[...].astype(dv_ref.dtype)

    return kernel


# ---------------------------------------------------------------------------
# wrapper with custom VJP
# ---------------------------------------------------------------------------


def _pad_seq(x, axis, block, value=0):
    size = x.shape[axis]
    rem = (-size) % block
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=value)


def _prep(q, k, v, q_segment_ids, kv_segment_ids, block_q, block_k):
    B, Hq, Sq, D = q.shape
    Sk = k.shape[2]
    if q_segment_ids is None:
        q_segment_ids = jnp.zeros((B, Sq), jnp.int32)
        kv_segment_ids = jnp.zeros((B, Sk), jnp.int32)
    qseg = _pad_seq(q_segment_ids.astype(jnp.int32), 1, block_q, -1)[:, None, :]
    kseg = _pad_seq(kv_segment_ids.astype(jnp.int32), 1, block_k, -2)[:, None, :]
    qp = _pad_seq(q, 2, block_q)
    kp = _pad_seq(k, 2, block_k)
    vp = _pad_seq(v, 2, block_k)
    return qp, kp, vp, qseg, kseg


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def flash_attention_trainable(
    q, k, v, q_segment_ids, kv_segment_ids,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
):
    out, _ = _fwd(q, k, v, q_segment_ids, kv_segment_ids, causal, scale, block_q, block_k, interpret)
    return out


def _fwd(q, k, v, q_segment_ids, kv_segment_ids, causal, scale, block_q, block_k, interpret):
    B, Hq, Sq, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    groups = Hq // Hkv
    if scale is None:
        scale = D**-0.5
    block_q = min(block_q, max(16, -(-Sq // 128) * 128 if Sq >= 128 else Sq))
    block_k = min(block_k, max(16, -(-Sk // 128) * 128 if Sk >= 128 else Sk))
    qp, kp, vp, qseg, kseg = _prep(q, k, v, q_segment_ids, kv_segment_ids, block_q, block_k)
    Sq_p, Sk_p = qp.shape[2], kp.shape[2]
    nq, nk = Sq_p // block_q, Sk_p // block_k

    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, causal=causal, scale=scale,
            block_q=block_q, block_k=block_k, num_k_blocks=nk,
        ),
        grid=(B, Hq, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j, g=groups: (b, h // g, j, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j, g=groups: (b, h // g, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 128), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, Sq_p, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, Sq_p, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, qseg, kseg)
    return out[:, :, :Sq, :], (q, k, v, q_segment_ids, kv_segment_ids, out[:, :, :Sq, :], lse)


def _fwd_rule(q, k, v, q_segment_ids, kv_segment_ids, causal, scale, block_q, block_k, interpret):
    out, res = _fwd(q, k, v, q_segment_ids, kv_segment_ids, causal, scale, block_q, block_k, interpret)
    return out, res


def _bwd_rule(causal, scale, block_q, block_k, interpret, res, g):
    q, k, v, q_segment_ids, kv_segment_ids, out, lse = res
    B, Hq, Sq, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    groups = Hq // Hkv
    if scale is None:
        scale = D**-0.5
    block_q = min(block_q, max(16, -(-Sq // 128) * 128 if Sq >= 128 else Sq))
    block_k = min(block_k, max(16, -(-Sk // 128) * 128 if Sk >= 128 else Sk))
    qp, kp, vp, qseg, kseg = _prep(q, k, v, q_segment_ids, kv_segment_ids, block_q, block_k)
    Sq_p, Sk_p = qp.shape[2], kp.shape[2]
    nq, nk = Sq_p // block_q, Sk_p // block_k

    do = _pad_seq(g, 2, block_q)
    # dsum rows: rowsum(dO * O) broadcast to 128 lanes
    dsum = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dsum = _pad_seq(dsum, 2, block_q)[..., None] * jnp.ones((1, 1, 1, 128), jnp.float32)

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, causal=causal, scale=scale,
            block_q=block_q, block_k=block_k, num_k_blocks=nk,
        ),
        grid=(B, Hq, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j, g_=groups: (b, h // g_, j, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j, g_=groups: (b, h // g_, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, j)),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 128), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 128), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq_p, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, qseg, kseg, do, _pad_seq(lse, 2, block_q), dsum)[:, :, :Sq, :]

    num_inner = groups * nq
    dkv_kernel = _make_bwd_dkv_kernel(nq)
    dk, dv = pl.pallas_call(
        functools.partial(
            dkv_kernel, causal=causal, scale=scale,
            block_q=block_q, block_k=block_k, num_inner=num_inner,
        ),
        grid=(B, Hkv, nk, num_inner),
        in_specs=[
            # q block for (group g, q block qb): head = h*groups + g
            pl.BlockSpec(
                (1, 1, block_q, D),
                lambda b, h, j, t, g_=groups, nq_=nq: (b, h * g_ + t // nq_, t % nq_, 0),
            ),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, t: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, t: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, h, j, t, nq_=nq: (b, 0, t % nq_)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, j, t: (b, 0, j)),
            pl.BlockSpec(
                (1, 1, block_q, D),
                lambda b, h, j, t, g_=groups, nq_=nq: (b, h * g_ + t // nq_, t % nq_, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_q, 128),
                lambda b, h, j, t, g_=groups, nq_=nq: (b, h * g_ + t // nq_, t % nq_, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_q, 128),
                lambda b, h, j, t, g_=groups, nq_=nq: (b, h * g_ + t // nq_, t % nq_, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, t: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, t: (b, h, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, Sk_p, D), k.dtype),
            jax.ShapeDtypeStruct((B, Hkv, Sk_p, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, qseg, kseg, do, _pad_seq(lse, 2, block_q), dsum)
    dk = dk[:, :, :Sk, :]
    dv = dv[:, :, :Sk, :]
    return dq, dk, dv, None, None


flash_attention_trainable.defvjp(_fwd_rule, _bwd_rule)

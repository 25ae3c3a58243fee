"""Fused int8-dequant matmul for weight-only-quantized decode, Pallas TPU.

The decode step is HBM-bandwidth-bound: at batch<=16 every weight byte is
read once per token, so throughput == bytes(weights)/bandwidth. The XLA form
``(h @ w_q.astype(bf16)) * scale`` materializes a bf16 copy of the weight
matrix (convert is a separate fusion — a dot operand must be materialized),
so the 8B int8 path was reading ~2-3x the int8 bytes per token (measured
26.9 ms/tok vs the ~9.6 ms int8 roofline, scripts/bench_8b_int8.py).

This kernel streams the int8 blocks HBM->VMEM, dequantizes in VMEM right
before the MXU, accumulates fp32 over K blocks, and applies the per-out-
channel scale once on the last block. Weight bytes read per token: exactly
K*N int8.

Reference contrast: the reference serves HF torch on CUDA with no int8 path
at all (modeling_internlm2.py decode); this is TPU-native headroom.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(h_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # dequant happens HERE, in VMEM: the HBM read stays int8
    w = w_ref[...].astype(h_ref.dtype)
    acc_ref[...] += jnp.dot(h_ref[...], w, preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _scale():
        o_ref[...] = (acc_ref[...] * s_ref[...].astype(jnp.float32)).astype(
            o_ref.dtype
        )


def _pick_block(dim: int, candidates=(512, 256, 128)) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return dim


def _kernel_nt(h_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(h_ref.dtype)  # (bn, bk)
    acc_ref[...] += jax.lax.dot_general(
        h_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _scale():
        s = s_ref[...].astype(jnp.float32).T  # (1, bn)
        o_ref[...] = (acc_ref[...] * s).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "block_n", "interpret"))
def int8_matmul_nt(
    h: jax.Array,        # (M, K)
    w_q: jax.Array,      # (N, K) int8 — torch Linear / lm-head layout
    w_scale: jax.Array,  # (N,) fp32 per-row absmax/127
    *,
    block_k: int = 512,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """h @ dequant(w_q).T without transposing the stored int8 matrix —
    the contraction runs over both operands' LAST dim on the MXU."""
    M, K = h.shape
    N, K2 = w_q.shape
    assert K == K2 and w_scale.shape == (N,)
    bk = _pick_block(K) if K % block_k else block_k
    bn = _pick_block(N) if N % block_n else block_n
    n_k = K // bk

    m_pad = -M % 8
    if m_pad:
        h = jnp.pad(h, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    out = pl.pallas_call(
        functools.partial(_kernel_nt, n_k=n_k),
        grid=(N // bn, n_k),
        in_specs=[
            pl.BlockSpec((Mp, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bn, bk), lambda n, k: (n, k)),
            pl.BlockSpec((bn, 1), lambda n, k: (n, 0)),
        ],
        out_specs=pl.BlockSpec((Mp, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), h.dtype),
        scratch_shapes=[pltpu.VMEM((Mp, bn), jnp.float32)],
        interpret=interpret,
    )(h, w_q, w_scale.reshape(N, 1))
    return out[:M] if m_pad else out


def _kernel_stacked(l_ref, h_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[0].astype(h_ref.dtype)  # (bk, bn): leading layer dim is 1
    acc_ref[...] += jnp.dot(h_ref[...], w, preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _scale():
        o_ref[...] = (acc_ref[...] * s_ref[0].astype(jnp.float32)).astype(
            o_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("block_k", "block_n", "interpret"))
def int8_matmul_stacked(
    h: jax.Array,        # (M, K) activations (bf16/f32)
    w_q: jax.Array,      # (L, K, N) int8 — ALL layers, stacked
    w_scale: jax.Array,  # (L, N) fp32 per-layer per-out-channel
    layer: jax.Array,    # int32 scalar: which layer's weights to use
    *,
    block_k: int = 512,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """h @ dequant(w_q[layer], w_scale[layer]) WITHOUT slicing the stacked
    array outside the kernel.

    Inside ``lax.scan`` over stacked per-layer weights, the per-iteration
    dynamic-slice feeding a ``pallas_call`` cannot fuse into the custom call,
    so XLA materializes an HBM->HBM copy of each layer's weight block every
    decode step — 3x the int8 bytes of traffic (copy read + copy write +
    kernel read). Here the layer index rides scalar prefetch and the
    BlockSpec index_map addresses the full (L, K, N) array directly, so the
    kernel DMAs each (bk, bn) block straight from its resting place in HBM:
    weight bytes moved per token = exactly K*N int8, same as the unstacked
    kernel. Same trick as ``decode_attention.flash_decode``'s stacked KV.
    """
    M, K = h.shape
    L, K2, N = w_q.shape
    assert K == K2 and w_scale.shape == (L, N), (h.shape, w_q.shape, w_scale.shape)
    bk = _pick_block(K) if K % block_k else block_k
    bn = _pick_block(N) if N % block_n else block_n
    n_k = K // bk

    m_pad = -M % 8
    if m_pad:
        h = jnp.pad(h, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // bn, n_k),
        in_specs=[
            pl.BlockSpec((Mp, bk), lambda n, k, l_ref: (0, k)),
            pl.BlockSpec((1, bk, bn), lambda n, k, l_ref: (l_ref[0], k, n)),
            pl.BlockSpec((1, 1, bn), lambda n, k, l_ref: (l_ref[0], 0, n)),
        ],
        out_specs=pl.BlockSpec((Mp, bn), lambda n, k, l_ref: (0, n)),
        scratch_shapes=[pltpu.VMEM((Mp, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_stacked, n_k=n_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), h.dtype),
        interpret=interpret,
    )(layer.reshape(1).astype(jnp.int32), h, w_q, w_scale.reshape(L, 1, N))
    return out[:M] if m_pad else out


@functools.partial(jax.jit, static_argnames=("block_k", "block_n", "interpret"))
def int8_matmul(
    h: jax.Array,      # (M, K) activations (bf16/f32)
    w_q: jax.Array,    # (K, N) int8
    w_scale: jax.Array,  # (N,) fp32 per-out-channel absmax/127
    *,
    block_k: int = 512,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """-> (M, N) in h.dtype. K and N must divide by a 128-multiple block
    (all InternLM2 projection shapes do); M is padded to the fp32 sublane
    tile internally — decode batches are tiny, the cost is nil."""
    M, K = h.shape
    K2, N = w_q.shape
    assert K == K2 and w_scale.shape == (N,)
    bk = _pick_block(K) if K % block_k else block_k
    bn = _pick_block(N) if N % block_n else block_n
    n_k = K // bk

    m_pad = -M % 8
    if m_pad:
        h = jnp.pad(h, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=(N // bn, n_k),
        in_specs=[
            pl.BlockSpec((Mp, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
            pl.BlockSpec((1, bn), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((Mp, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), h.dtype),
        scratch_shapes=[pltpu.VMEM((Mp, bn), jnp.float32)],
        interpret=interpret,
    )(h, w_q, w_scale.reshape(1, N))
    return out[:M] if m_pad else out

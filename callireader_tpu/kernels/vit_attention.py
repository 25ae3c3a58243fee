"""Single-pass ViT attention (non-causal, short rows, heads in grid).

Parity analog: the reference ViT runs flash-attn's packed-QKV CUDA kernel
(modeling_intern_vit.py:40-101). This is its TPU replacement for the 448px
tile shape (S=1025): the whole K/V row of one head fits VMEM, so the kernel
computes softmax(QK^T)V in ONE pass per (tile, head, q-block) grid step —
no online-softmax state, no cross-block rescaling.

Why not the packed (B, S, 3E)-layout kernel (packed_qkv_attention.py): with
D=64 heads, half the in-kernel head slices are lane-misaligned (64-column
offsets on 128-lane tiles) and the per-head scratch updates run one VPU
column at a time; measured 20.6 ms for the 64-tile ViT attention call
(13 TF/s, 7% of v5e peak). The softmax chain itself is VMEM-bandwidth
bound, so this kernel keeps the score block in bf16 (full f32 exponent
range — the -1e30 pad bias and exp2 behave identically, only the logit
mantissa rounds; measured end-to-end rel err 2.7e-3 vs 2.68e-3 for f32
scores at bf16 inputs) and trims VPU ops:

  - the k-padding mask is an additive bias row loaded once (1 add), not
    iota+compare+where
  - exp2 with log2(e) folded into the attention scale (exp needs an
    internal multiply)
  - K arrives pre-transposed as (D, S) so both matmuls are standard
    (M,K)@(K,N) MXU feeds with no in-kernel relayout

Layout: inputs are (B, H, S, D) / (B, H, D, S) — internvit.forward
transposes the fused qkv projection output once per layer on the XLA side
(one fused HBM pass), which is far cheaper than the misaligned in-kernel
slicing it replaces.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# one head's full K/V row must fit VMEM next to the score block; 448px
# tiles give S=1025 -> Sp=1152. Cap well under VMEM (16 MB): Sp*D*2B*2 +
# bq*Sp*4B ~= 3.5 MB at Sp=4096, bq=512.
MAX_SINGLE_PASS_KV = 4096


def _kernel(q_ref, kt_ref, v_ref, bias_ref, o_ref, *, scale_log2e: float, precise: bool):
    q = q_ref[0, 0]            # (bq, D)
    kt = kt_ref[0, 0]          # (D, Sp)
    v = v_ref[0, 0]            # (Sp, D)
    s32 = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    sd = jnp.float32 if precise else jnp.bfloat16
    s = s32.astype(sd) * sd(scale_log2e) + bias_ref[0].astype(sd)  # (bq, Sp)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "interpret", "precise")
)
def vit_attention_single_pass(
    q: jax.Array,   # (B, H, S, D)
    kt: jax.Array,  # (B, H, D, S) — K pre-transposed
    v: jax.Array,   # (B, H, S, D)
    *,
    scale: Optional[float] = None,
    block_q: int = 576,
    interpret: bool = False,
    precise: bool = False,
) -> jax.Array:
    """softmax(q k^T * scale) v -> (B, H, S, D). S padded to lanes (128)
    once; the pad mask rides an additive bias row."""
    B, H, S, D = q.shape
    if scale is None:
        scale = D**-0.5
    Sp = -(-S // 128) * 128
    if Sp > MAX_SINGLE_PASS_KV:
        raise ValueError(
            f"S={S} too long for the single-pass ViT kernel (cap {MAX_SINGLE_PASS_KV})"
        )
    # q blocks must tile Sp: largest divisor of Sp/128 tiles <= block_q
    if Sp % block_q:
        block_q = next(
            b * 128
            for b in range(min(block_q // 128, Sp // 128), 0, -1)
            if (Sp // 128) % b == 0
        )
    nq = Sp // block_q

    if Sp != S:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, 0), (0, Sp - S)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    bias = jnp.where(
        jnp.arange(Sp, dtype=jnp.int32)[None, :] < S, 0.0, NEG_INF
    ).astype(jnp.float32)                      # (1, Sp)

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            scale_log2e=float(scale) * math.log2(math.e),
            precise=precise or q.dtype == jnp.float32,
        ),
        grid=(B, H, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, D, Sp), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Sp, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, Sp), lambda b, h, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Sp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, kt, v, bias)
    return out[:, :, :S]


def attention_from_packed_qkv(
    qkv: jax.Array,  # (B, S, 3E) fused projection output
    num_heads: int,
    *,
    scale: Optional[float] = None,
    interpret: bool = False,
    precise: bool = False,
) -> jax.Array:
    """(B, S, 3E) packed qkv -> (B, S, E) via the single-pass kernel.
    The (B,S,3E)->(B,H,S,D) transposes run on the XLA side where they cost
    one fused HBM pass, not per-head in-kernel lane rotations."""
    B, S, threeE = qkv.shape
    E = threeE // 3
    D = E // num_heads
    x = qkv.reshape(B, S, 3, num_heads, D)
    q = x[:, :, 0].transpose(0, 2, 1, 3)   # (B, H, S, D)
    kt = x[:, :, 1].transpose(0, 2, 3, 1)  # (B, H, D, S)
    v = x[:, :, 2].transpose(0, 2, 1, 3)
    o = vit_attention_single_pass(
        q, kt, v, scale=scale, interpret=interpret, precise=precise
    )
    return o.transpose(0, 2, 1, 3).reshape(B, S, E)

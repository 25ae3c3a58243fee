"""Paged-attention flash decode.

Serving extension of kernels/decode_attention.py: KV lives in a global page
pool ``(L, NPAGES, Hkv, page_size, D)`` and each slot owns a list of pages
(``page_table``). The kernel walks a slot's pages with the page ids delivered
as scalar-prefetch data consumed inside the BlockSpec index_map — the gather
never materializes.

Each program owns one (slot, page) pair and processes ALL kv heads: pages are
scattered in the pool so a block can never span two of them, and per-head
blocks would shrink the DMA to page×D — grouping the heads keeps each DMA at
Hkv×page×D (measured 2.4x over the per-head variant on v5e; see
docs/KERNELS.md).

This is the TPU form of vLLM-style PagedAttention: no per-slot max_len
reservation, pages allocated on demand (runtime/paged_cache.py).
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
    # scalar prefetch
    layer_ref,       # (1,) int32
    page_table_ref,  # (B * pages_per_slot,) int32 — page id per (slot, j)
    # tensors
    q_ref,      # (1, Hkv, G, D)
    kpool_ref,  # (1, 1, Hkv, page, D) — page selected by index_map
    vpool_ref,
    valid_ref,  # (1, 1, page) int32 — token validity for this (slot, page)
    o_ref,      # (1, Hkv, G, D)
    m_scratch,  # (Hkv * G, 128)
    l_scratch,  # (Hkv * G, 128)
    acc_scratch,  # (Hkv * G, D)
    *,
    scale: float,
    num_pages: int,
    num_kv_heads: int,
):
    jb = pl.program_id(1)

    @pl.when(jb == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    valid = valid_ref[0, 0] > 0
    G = q_ref.shape[2]

    for h in range(num_kv_heads):  # unrolled: Hkv is small and static
        lo, hi = h * G, (h + 1) * G
        q = q_ref[0, h].astype(jnp.float32)
        k = kpool_ref[0, 0, h]
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(valid[None, :], s, NEG_INF)

        m_prev = m_scratch[lo:hi, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_scratch[lo:hi, :1] + jnp.sum(p, axis=-1, keepdims=True)
        m_scratch[lo:hi, :] = jnp.broadcast_to(m_new, (G, m_scratch.shape[1]))
        l_scratch[lo:hi, :] = jnp.broadcast_to(l_new, (G, l_scratch.shape[1]))
        pv = jax.lax.dot_general(
            p.astype(vpool_ref.dtype), vpool_ref[0, 0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[lo:hi, :] = acc_scratch[lo:hi, :] * alpha + pv

    @pl.when(jb == num_pages - 1)
    def _finalize():
        l = l_scratch[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out = (acc_scratch[...] / l_safe).astype(o_ref.dtype)
        o_ref[0] = out.reshape(num_kv_heads, G, out.shape[-1])


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_flash_decode(
    q: jax.Array,           # (B, Hq, 1, D)
    kpool: jax.Array,       # (L, NPAGES, Hkv, page, D)
    vpool: jax.Array,
    layer_idx: jax.Array,   # () int32
    page_table: jax.Array,  # (B, pages_per_slot) int32 — pool page ids; unused
                            # entries may point anywhere (masked by valid)
    valid: jax.Array,       # (B, pages_per_slot, page) int32 token validity
    *,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """-> (B, Hq, 1, D)."""
    B, Hq, _, D = q.shape
    L, NP, Hkv, page, _ = kpool.shape
    G = Hq // Hkv
    P = page_table.shape[1]
    if page % 128 != 0 and not interpret:
        # Mosaic lane rule: the valid-mask block's last dim is `page`
        raise ValueError(f"page_size must be a multiple of 128 (got {page})")
    if scale is None:
        scale = D**-0.5

    qg = q[:, :, 0, :].reshape(B, Hkv, G, D)
    flat_table = page_table.reshape(-1).astype(jnp.int32)
    # (B, 1, P*page): Mosaic needs the 2nd-to-last block dim to equal the
    # array dim, so the per-page window is carved from the flattened last axis
    valid3 = valid.astype(jnp.int32).reshape(B, 1, P * page)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, P),
        in_specs=[
            pl.BlockSpec((1, Hkv, G, D), lambda b, j, l_ref, pt: (b, 0, 0, 0)),
            pl.BlockSpec(
                (1, 1, Hkv, page, D),
                lambda b, j, l_ref, pt, P_=P: (l_ref[0], pt[b * P_ + j], 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, Hkv, page, D),
                lambda b, j, l_ref, pt, P_=P: (l_ref[0], pt[b * P_ + j], 0, 0, 0),
            ),
            pl.BlockSpec((1, 1, page), lambda b, j, l_ref, pt: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, Hkv, G, D), lambda b, j, l_ref, pt: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hkv * G, 128), jnp.float32),
            pltpu.VMEM((Hkv * G, 128), jnp.float32),
            pltpu.VMEM((Hkv * G, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, num_pages=P, num_kv_heads=Hkv
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        jnp.asarray([layer_idx], jnp.int32).reshape(1),
        flat_table,
        qg, kpool, vpool, valid3,
    )
    return out.reshape(B, Hq, 1, D)

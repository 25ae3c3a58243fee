"""Tensor-parallel wrappers for the Pallas attention kernels.

Pallas kernels lower to Mosaic custom calls, which GSPMD cannot partition —
with tensor-sharded activations it would all-gather q/k/v, run the full
kernel on every chip, and slice, wasting ICI bandwidth and HBM. Attention is
embarrassingly parallel over heads, so under a mesh with tensor > 1 we run
the kernel inside ``shard_map`` with heads split on the tensor axis (GQA: Hq
and Hkv are both divisible by any tensor size we deploy, 32:8 on the 8B).

This is the idiomatic TPU replacement for the reference's monkey-patched
per-rank flash dispatch (train/xtuner/model/modules/dispatch/internlm2.py):
the mesh, not process ranks, decides the split, and GSPMD reshards operands
into place automatically.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from callireader_tpu.kernels.attention import flash_attention
from callireader_tpu.kernels.decode_attention import flash_decode


def tp_active(mesh: Optional[Mesh]) -> bool:
    return mesh is not None and int(mesh.shape.get("tensor", 1)) > 1


def _shard_map(fn, mesh, in_specs, out_specs):
    # check_vma=False: the Pallas kernel body is opaque to the varying-mesh
    # analysis (same reason the old API needed check_rep=False)
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)


def flash_attention_tp(
    q: jax.Array,  # (B, Hq, S, D)
    k: jax.Array,  # (B, Hkv, S, D)
    v: jax.Array,
    mesh: Mesh,
    *,
    causal: bool = False,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    interpret: bool = False,
    q_offset: int = 0,
) -> jax.Array:
    """flash_attention with heads split over the mesh "tensor" axis."""
    head_spec = P(None, "tensor", None, None)
    seg_spec = P(None, None)

    def local(q, k, v, qs, ks):
        return flash_attention(
            q, k, v, causal=causal, q_segment_ids=qs, kv_segment_ids=ks,
            interpret=interpret, q_offset=q_offset,
        )

    return _shard_map(
        local, mesh,
        in_specs=(head_spec, head_spec, head_spec, seg_spec, seg_spec),
        out_specs=head_spec,
    )(q, k, v, q_segment_ids, kv_segment_ids)


def flash_decode_tp(
    q: jax.Array,        # (B, Hq, 1, D)
    cache_k: jax.Array,  # (L, B, Hkv, S, D)
    cache_v: jax.Array,
    layer_idx: jax.Array,
    valid_mask: jax.Array,  # (B, S)
    mesh: Mesh,
    *,
    interpret: bool = False,
) -> jax.Array:
    """flash_decode with q heads and the KV cache split over "tensor"."""
    q_spec = P(None, "tensor", None, None)
    kv_spec = P(None, None, "tensor", None, None)

    def local(q, ck, cv, idx, valid):
        return flash_decode(q, ck, cv, idx, valid, interpret=interpret)

    return _shard_map(
        local, mesh,
        in_specs=(q_spec, kv_spec, kv_spec, P(), P(None, None)),
        out_specs=q_spec,
    )(q, cache_k, cache_v, layer_idx, valid_mask)


def paged_flash_decode_tp(
    q: jax.Array,          # (B, Hq, 1, D)
    kpool: jax.Array,      # (L, NP, Hkv, page, D)
    vpool: jax.Array,
    layer_idx: jax.Array,
    page_table: jax.Array,  # (B, P)
    valid: jax.Array,       # (B, P, page)
    mesh: Mesh,
    *,
    interpret: bool = False,
) -> jax.Array:
    """kernels/paged_decode.paged_flash_decode with heads/pools split over
    "tensor" (page bookkeeping is head-oblivious, so tables replicate)."""
    from callireader_tpu.kernels.paged_decode import paged_flash_decode

    q_spec = P(None, "tensor", None, None)
    pool_spec = P(None, None, "tensor", None, None)

    def local(q, kp, vp, idx, table, valid):
        return paged_flash_decode(q, kp, vp, idx, table, valid, interpret=interpret)

    return _shard_map(
        local, mesh,
        in_specs=(q_spec, pool_spec, pool_spec, P(), P(None, None), P(None, None, None)),
        out_specs=q_spec,
    )(q, kpool, vpool, layer_idx, page_table, valid)

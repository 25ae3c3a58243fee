"""Cosine vector quantization + Gaussian de-normalization.

Parity targets:
  - vq_cos_sim:        models/similarity.py:8-27  (L2-normalize both sides,
                       one matmul against the 92553x4096 normalized token
                       embedding table, argmax)
  - mu/sigma denorm:   modeling_internvl_chat.py:602-640 (hard-VQ blend at
                       cos-sim <= 0.5, then out * sigma[idx] + mu[idx])
  - drop_zero:         modeling_internvl_chat.py:620-630 — host-side filter of
                       index-0 pseudo tokens (dynamic shape, so it stays out of
                       jit; the engine applies it on materialized outputs).

All pure XLA: runs fused with the resampler forward on-device — the reference
does this through several torch kernel launches and `.squeeze()` round trips.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch.nn.functional.normalize semantics (clamp-by-norm, not add-eps)."""
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


def vq_cos_sim(
    embedding_table: jax.Array,  # (V, E) — already-normalized gauss table
    inputs: jax.Array,  # (B, n, E)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (indices (B, n) int32, cos_sim_values (B, n) f32)."""
    x = normalize(inputs, axis=2).astype(jnp.float32)
    t = normalize(embedding_table, axis=1).astype(jnp.float32)
    sim = jnp.einsum("bne,ve->bnv", x, t)
    idx = jnp.argmax(sim, axis=2).astype(jnp.int32)
    vals = jnp.max(sim, axis=2)
    return idx, vals


def gaussian_denorm(
    outputs: jax.Array,  # (B, n, E) resampler outputs
    indices: jax.Array,  # (B, n)
    mu: jax.Array,  # (V,) or (V, 1)
    sigma: jax.Array,  # (V,) or (V, 1)
) -> jax.Array:
    """pred * sigma[idx] + mu[idx], row-wise (modeling_internvl_chat.py:632-637)."""
    mu = mu.reshape(-1)
    sigma = sigma.reshape(-1)
    m = jnp.take(mu, indices, axis=0)[..., None].astype(outputs.dtype)
    s = jnp.take(sigma, indices, axis=0)[..., None].astype(outputs.dtype)
    return outputs * s + m


def hard_vq_blend(
    outputs: jax.Array,  # (B, n, E)
    indices: jax.Array,  # (B, n)
    cos_vals: jax.Array,  # (B, n)
    embedding_table: jax.Array,  # (V, E)
    threshold: float = 0.5,
) -> jax.Array:
    """Replace low-confidence outputs with their quantized table rows
    (modeling_internvl_chat.py:609-614)."""
    below = (cos_vals <= threshold)[..., None]
    quantized = jnp.take(embedding_table, indices, axis=0).astype(outputs.dtype)
    return jnp.where(below, quantized, outputs)


def calli_align_embed(
    resampler_out: jax.Array,  # (B, n, E)
    embedding_table: jax.Array,  # (V, E) normalized table
    mu: jax.Array,
    sigma: jax.Array,
    *,
    hard_vq: bool = False,
    hard_vq_threshold: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Fused VQ + (optional) hard blend + denorm. Returns
    (pseudo_embeds (B*n, E), indices (B, n))."""
    indices, vals = vq_cos_sim(embedding_table, resampler_out)
    out = resampler_out
    if hard_vq:
        out = hard_vq_blend(out, indices, vals, embedding_table, hard_vq_threshold)
    out = gaussian_denorm(out, indices, mu, sigma)
    return out.reshape(-1, out.shape[-1]), indices


def splice_embeds(
    inputs_embeds: jax.Array,  # (B, S, E)
    input_ids: jax.Array,  # (B, S)
    replacement: jax.Array,  # (N, E) — flattened, in order of appearance
    token_id: int,
) -> jax.Array:
    """Scatter ``replacement`` rows into positions where input_ids == token_id
    (row-major order across the batch), pure XLA.

    Parity: modeling_internvl_chat.py:1093-1102 boolean-mask assignment.
    Replacement may be longer than the number of slots (extras ignored) but not
    shorter — same contract as the reference assert.
    """
    B, S, E = inputs_embeds.shape
    flat_ids = input_ids.reshape(-1)
    flat = inputs_embeds.reshape(-1, E)
    is_slot = flat_ids == token_id
    # k-th slot (in order) takes replacement[k]
    slot_rank = jnp.cumsum(is_slot) - 1
    gathered = jnp.take(
        replacement, jnp.clip(slot_rank, 0, replacement.shape[0] - 1), axis=0
    ).astype(flat.dtype)
    out = jnp.where(is_slot[:, None], gathered, flat)
    return out.reshape(B, S, E)

"""Ulysses-style sequence parallelism over a mesh axis.

Parity target: train/xtuner/parallel/sequence/ — process groups
(setup_distributed.py:17-111), autograd all_to_all (comm.py:9-87), attention
pre/post head/seq exchange (attention.py:16-127).

TPU-native: one ``shard_map`` over the "seq" mesh axis with
``jax.lax.all_to_all`` riding ICI — differentiable for free (all_to_all is its
own transpose), so the reference's hand-written autograd Functions collapse
into a few lines. The reference's "inner-SP" special case (heads % sp != 0,
setup_distributed.py:56-79) is reproduced by splitting head_dim when the head
count doesn't divide.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from callireader_tpu.kernels.attention import attention_reference, flash_attention


def _a2a_gather_seq(x: jax.Array, axis_name: str) -> jax.Array:
    """(B, H, S/sp, D) local -> (B, H/sp, S, D): scatter heads, gather seq."""
    return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)


def _a2a_gather_heads(x: jax.Array, axis_name: str) -> jax.Array:
    """(B, H/sp, S, D) -> (B, H, S/sp, D): scatter seq, gather heads."""
    return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)


def ulysses_attention(
    q: jax.Array,  # (B, Hq, S, D) globally; sharded on S over `seq_axis`
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    seq_axis: str = "seq",
    causal: bool = True,
    use_flash: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Sequence-parallel attention: inputs/outputs sharded on the sequence
    dim; internally each device holds the full sequence for H/sp heads.

    When heads % sp != 0 the inner-SP path kicks in (reference
    attention.py:30-92): head_dim is split so the exchange divides, then
    gathered back over the inner subgroup (axis_index_groups) so attention
    still runs on full-dimension heads.
    """
    import math

    sp = mesh.shape[seq_axis]
    Hq, Hkv = q.shape[1], k.shape[1]
    if Hq != Hkv:
        # GQA: replicate KV heads so the head exchange is uniform
        k = jnp.repeat(k, Hq // Hkv, axis=1)
        v = jnp.repeat(v, Hq // Hkv, axis=1)
    insp = sp // math.gcd(Hq, sp)
    assert (Hq * insp) % sp == 0
    inner_groups = [list(range(g * insp, (g + 1) * insp)) for g in range(sp // insp)]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None, seq_axis, None),
            P(None, None, seq_axis, None),
            P(None, None, seq_axis, None),
        ),
        out_specs=P(None, None, seq_axis, None),
    )
    def run(q, k, v):
        B, H, Sl, D = q.shape

        def pre_inner(t):
            # (B, H, S, D) -> (B, sp/insp, H*insp/sp, insp, S, D/insp)
            #              -> (B, insp * H, S, D/insp)  [insp-major inside groups]
            t = t.reshape(B, sp // insp, H * insp // sp, Sl, insp, D // insp)
            t = t.transpose(0, 1, 4, 2, 3, 5)
            return t.reshape(B, H * insp, Sl, D // insp)

        def post_inner(t):
            # inverse of pre_inner on the context
            Bp, Hp, Sp_, Dp = t.shape
            t = t.reshape(B, sp // insp, insp, H * insp // sp, Sp_, Dp)
            t = t.transpose(0, 1, 3, 4, 2, 5)
            return t.reshape(B, H, Sp_, Dp * insp)

        if insp > 1:
            q_, k_, v_ = pre_inner(q), pre_inner(k), pre_inner(v)
        else:
            q_, k_, v_ = q, k, v
        qg = _a2a_gather_seq(q_, seq_axis)
        kg = _a2a_gather_seq(k_, seq_axis)
        vg = _a2a_gather_seq(v_, seq_axis)

        if insp > 1:
            # reassemble full head_dim across the inner subgroup (every inner
            # rank ends up with the same full-dim heads, redundantly)
            def gather_hd(t):
                return jax.lax.all_gather(
                    t, seq_axis, axis_index_groups=inner_groups, axis=3, tiled=True
                )

            qg, kg, vg = gather_hd(qg), gather_hd(kg), gather_hd(vg)

        scale = q.shape[-1] ** -0.5  # ORIGINAL head_dim
        if use_flash:
            ctx = flash_attention(qg, kg, vg, causal=causal, scale=scale, interpret=interpret)
        else:
            ctx = attention_reference(qg, kg, vg, causal=causal, scale=scale)

        if insp > 1:
            # keep only this rank's head_dim slice before the reverse exchange
            ridx = jax.lax.axis_index(seq_axis) % insp
            Dfull = ctx.shape[-1]
            ctx = jax.lax.dynamic_slice_in_dim(
                ctx, ridx * (Dfull // insp), Dfull // insp, axis=3
            )
        ctx = _a2a_gather_heads(ctx, seq_axis)
        if insp > 1:
            ctx = post_inner(ctx)
        return ctx

    return run(q, k, v)


def split_for_sequence_parallel(x: jax.Array, mesh: Mesh, seq_axis: str = "seq", dim: int = 1):
    """Shard an array's sequence dimension over the seq mesh axis (the TPU form
    of sft.py:_split_for_sequence_parallel — here just a sharding constraint;
    GSPMD moves the data)."""
    spec = [None] * x.ndim
    spec[dim] = seq_axis
    return jax.lax.with_sharding_constraint(
        x, jax.sharding.NamedSharding(mesh, P(*spec))
    )


def reduce_sequence_parallel_loss(
    loss_sum: jax.Array, num_tokens: jax.Array, axis_name: Optional[str] = None
) -> jax.Array:
    """Token-weighted loss reduction across SP ranks
    (reduce_loss.py:8-35). Inside shard_map/pmap contexts only."""
    if axis_name is None:
        return loss_sum / jnp.maximum(num_tokens, 1)
    total = jax.lax.psum(loss_sum, axis_name)
    count = jax.lax.psum(num_tokens, axis_name)
    return total / jnp.maximum(count, 1)

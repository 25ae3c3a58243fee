"""Fused RMSNorm, Pallas TPU, with custom VJP.

Parity target: the reference's in-repo Triton kernel
(train/xtuner/model/modules/dispatch/triton_kernels/rms_norm.py — fused fwd +
bwd with partial-dW reduction). On TPU, XLA already fuses the jnp RMSNorm well,
so models/internlm2.rms_norm keeps the XLA form by default; this kernel exists
for the cases where a hand-fused form wins (very wide rows, fp32 stats over
bf16 stream) and as the framework's reference custom-VJP kernel pattern.

Backward math (r = rsqrt(mean(x^2)+eps)):
  dx = r*w*dy - x * r^3/N * sum_j(dy_j * w_j * x_j)
  dw = sum_rows dy * x * r     (partial per row-block, reduced in XLA)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, w_ref, y_ref, r_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(ms + eps)
    y = x * r * w_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    r_ref[...] = jnp.broadcast_to(r, r_ref.shape)


def _bwd_kernel(x_ref, w_ref, r_ref, dy_ref, dx_ref, dwp_ref):
    x = x_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)
    r = r_ref[:, :1]
    dy = dy_ref[...].astype(jnp.float32)
    n = x.shape[-1]
    wdy = w * dy
    inner = jnp.sum(wdy * x, axis=-1, keepdims=True)
    dx = r * wdy - x * (r**3) * inner / n
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dwp_ref[...] = jnp.sum(dy * x * r, axis=0, keepdims=True).astype(jnp.float32)


def _row_block(n_rows: int) -> int:
    for b in (256, 128, 64, 32, 16, 8):
        if n_rows % b == 0:
            return b
    return n_rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def rms_norm_pallas(x: jax.Array, w: jax.Array, eps: float = 1e-5, interpret: bool = False):
    """x (..., E), w (E,) -> same shape/dtype as x. fp32 statistics."""
    y, _ = _fwd(x, w, eps, interpret)
    return y


def _fwd(x, w, eps, interpret):
    orig_shape = x.shape
    E = x.shape[-1]
    rows = int(jnp.prod(jnp.asarray(x.shape[:-1]))) if x.ndim > 1 else 1
    x2 = x.reshape(rows, E)
    blk = _row_block(rows)
    grid = (rows // blk,)
    y, r = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, E), lambda i: (i, 0)),
            pl.BlockSpec((E,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((blk, E), lambda i: (i, 0)),
            pl.BlockSpec((blk, 128), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, E), x.dtype),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        ],
        interpret=interpret,
    )(x2, w)
    return y.reshape(orig_shape), (x2, w, r, orig_shape)


def _fwd_rule(x, w, eps, interpret):
    y, res = _fwd(x, w, eps, interpret)
    return y, res


def _bwd_rule(eps, interpret, res, dy):
    del eps
    x2, w, r, orig_shape = res
    rows, E = x2.shape
    dy2 = dy.reshape(rows, E)
    blk = _row_block(rows)
    grid = (rows // blk,)
    dx, dwp = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, E), lambda i: (i, 0)),
            pl.BlockSpec((E,), lambda i: (0,)),
            pl.BlockSpec((blk, 128), lambda i: (i, 0)),
            pl.BlockSpec((blk, E), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((blk, E), lambda i: (i, 0)),
            pl.BlockSpec((1, E), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, E), dy.dtype),
            jax.ShapeDtypeStruct((grid[0], E), jnp.float32),
        ],
        interpret=interpret,
    )(x2, w, r, dy2)
    dw = jnp.sum(dwp, axis=0).astype(w.dtype)
    return dx.reshape(orig_shape), dw


rms_norm_pallas.defvjp(_fwd_rule, _bwd_rule)

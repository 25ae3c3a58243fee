"""On-device bicubic char-crop resize: ship RAW crop bytes, not canvases.

The reference scales every detected char crop into the [200, 350] max-edge
range and white-pads to 448 on the HOST (utils/utils.py:420-452), which
makes the char h2d the dominant transfer of the OCR pipeline (~50 MB per
8-page batch at ~25-30 MB/s through the dev tunnel). Calligraphy chars are
~40-110 px at page resolution, so shipping the RAW crop (<= ~10 KB luma)
and resizing on device cuts that stream ~10x.

Per-crop scales differ, so jax.image.resize (static output shape) can't be
vmapped; instead the separable bicubic is expressed as two small matmuls
with per-crop weight matrices built on the fly from dynamic (h, w, nh, nw)
scalars:

    canvas = clip(round( W_y @ raw @ W_x^T ), 0, 255)   # white outside

Rows of W are the 4-tap Keys cubic (a = -0.5, PIL BICUBIC's kernel) with
edge-clamped taps; content is centered with the reference's
(out - n) // 2 border. MXU-friendly: (S,R)@(R,R)@(R,S) per crop under vmap.
Upscale (the typical case) matches PIL bicubic to ~1/255; downscale omits
PIL's antialias prefilter — this path is an opt-in speed mode
(engine.device_resize_chars), the host path remains the parity reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# raw-crop square buckets (page-resolution pixels, pre-resize); 352 covers
# the [200,350] no-downscale range — larger crops take the host-PIL path
CHAR_RAW_BUCKETS = (48, 64, 96, 128, 192, 256, 352)


def _cubic(t: jax.Array, a: float = -0.5) -> jax.Array:
    at = jnp.abs(t)
    at2 = at * at
    at3 = at2 * at
    w1 = (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0
    w2 = a * at3 - 5.0 * a * at2 + 8.0 * a * at - 4.0 * a
    return jnp.where(at <= 1.0, w1, jnp.where(at < 2.0, w2, 0.0))


def _axis_weights(out_size: int, raw_bucket: int, src_len, dst_len):
    """(W (out_size, raw_bucket) f32, inside (out_size,) bool) for one axis.
    src_len/dst_len are dynamic scalars; content centered at
    (out_size - dst_len) // 2 (reference ImageOps.expand border)."""
    src_len = src_len.astype(jnp.float32)
    dst_len_i = dst_len
    dst_len = dst_len.astype(jnp.float32)
    y = jnp.arange(out_size, dtype=jnp.float32)
    off = jnp.floor((out_size - dst_len) / 2.0)
    yy = y - off
    inside = (yy >= 0) & (yy < dst_len)
    u = (yy + 0.5) * (src_len / dst_len) - 0.5
    i0 = jnp.floor(u).astype(jnp.int32)
    cols = jnp.arange(raw_bucket, dtype=jnp.int32)
    W = jnp.zeros((out_size, raw_bucket), jnp.float32)
    hi = jnp.maximum(src_len.astype(jnp.int32) - 1, 0)
    for t in range(-1, 3):
        idx = i0 + t
        # PIL drops out-of-range taps and renormalizes the row (it does NOT
        # clamp-replicate edge pixels)
        w = jnp.where((idx >= 0) & (idx <= hi),
                      _cubic(u - idx.astype(jnp.float32)), 0.0)
        idxc = jnp.clip(idx, 0, hi)
        W = W + w[:, None] * (idxc[:, None] == cols[None, :]).astype(jnp.float32)
    s = W.sum(axis=1, keepdims=True)
    W = W / jnp.where(jnp.abs(s) < 1e-8, 1.0, s)
    del dst_len_i
    return W * inside[:, None].astype(jnp.float32), inside


def bicubic_canvas_one(
    raw: jax.Array,  # (R, R) or (R, R, C) f32/uint8, valid region [:h, :w]
    src_hw: jax.Array,  # (2,) int32 (h, w)
    tgt_hw: jax.Array,  # (2,) int32 (nh, nw)
    out_size: int,
) -> jax.Array:
    """One crop -> (out_size, out_size[, C]) uint8 white canvas."""
    R = raw.shape[0]
    Wy, in_y = _axis_weights(out_size, R, src_hw[0], tgt_hw[0])
    Wx, in_x = _axis_weights(out_size, R, src_hw[1], tgt_hw[1])
    x = raw.astype(jnp.float32)
    if x.ndim == 2:
        out = Wy @ x @ Wx.T
    else:
        out = jnp.einsum("yr,rsc,xs->yxc", Wy, x, Wx)
    mask = (in_y[:, None] & in_x[None, :])
    if x.ndim == 3:
        mask = mask[..., None]
    out = jnp.where(mask, out, 255.0)
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)


def bicubic_canvas(raw, src_hw, tgt_hw, out_size: int) -> jax.Array:
    """(N, R, R[, C]) raw crops -> (N, out_size, out_size[, C]) uint8."""
    return jax.vmap(lambda r, s, t: bicubic_canvas_one(r, s, t, out_size))(
        raw, src_hw, tgt_hw
    )

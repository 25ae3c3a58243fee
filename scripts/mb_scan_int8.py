"""Microbench: pallas int8 matmul inside scan-over-stacked-weights, three ways.

  MB_WHICH=stacked,unrolled,scan MB_L=16 python scripts/mb_scan_int8.py

Hypothesis: lax.scan's per-layer dynamic-slice of a stacked (L, K, N) int8
weight array cannot fuse into the pallas custom call, so XLA materializes an
HBM->HBM copy of each layer's weights every step (~2x extra HBM traffic on
the decode path). The fix is `int8_matmul_stacked`: the layer index rides
scalar prefetch and the kernel DMAs blocks straight from the resting (L,K,N)
array — scan never slices the weights at all. NOTE: the `scan` variant's
compile is pathologically slow at large L (minutes) — that pathology is part
of the finding; select variants with MB_WHICH if you only want the fast ones.
"""
import os
import time
import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.kernels.int8_matmul import int8_matmul, int8_matmul_stacked

T0 = time.time()


def tick(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


L = int(os.environ.get("MB_L", "16"))
K, N, M = 4096, 14336, 8
# generate everything ON DEVICE — the axon tunnel's h2d is far too slow for
# a GB of weights (the same reason runtime/quantize.init_llm_int8_device exists)
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
wq = jax.jit(lambda k: jax.random.randint(k, (L, K, N), -127, 128, jnp.int8))(ks[0])
ws = jax.jit(lambda k: jax.random.uniform(k, (L, N), jnp.float32) / 127.0)(ks[1])
h0 = jax.jit(lambda k: jax.random.normal(k, (M, K), jnp.bfloat16))(ks[2])
proj_back = jax.jit(
    lambda k: jax.random.normal(k, (N, K), jnp.bfloat16) * 0.01
)(ks[3])
for a in (wq, ws, h0, proj_back):
    a.block_until_ready()
tick("all inputs on device")

bytes_per_step = L * K * N  # int8 weight bytes (minimum possible traffic)


@jax.jit
def scanned(h):
    def body(x, p):
        y = int8_matmul(x, p["q"], p["s"])
        return (y @ proj_back).astype(x.dtype), ()
    out, _ = jax.lax.scan(body, h, {"q": wq, "s": ws})
    return out


@jax.jit
def unrolled(h):
    x = h
    for i in range(L):
        y = int8_matmul(x, wq[i], ws[i])
        x = (y @ proj_back).astype(x.dtype)
    return x


@jax.jit
def stacked(h):
    def body(x, idx):
        y = int8_matmul_stacked(x, wq, ws, idx)
        return (y @ proj_back).astype(x.dtype), ()
    out, _ = jax.lax.scan(body, h, jnp.arange(L, dtype=jnp.int32))
    return out


def timeit(f, h, n=20):
    f(h).block_until_ready()
    tick("  compiled + warm")
    t0 = time.time()
    for _ in range(n):
        o = f(h)
    o.block_until_ready()
    return (time.time() - t0) / n


VARIANTS = {"scan": scanned, "unrolled": unrolled, "stacked": stacked}
which = os.environ.get("MB_WHICH", "stacked,unrolled,scan").split(",")
for name in which:
    f = VARIANTS[name.strip()]
    tick(f"compiling {name}")
    t = timeit(f, h0)
    gbps = bytes_per_step / t / 1e9
    print(f"{name:9s}: {t*1e3:7.2f} ms  -> {gbps:6.1f} GB/s effective int8-weight BW",
          flush=True)

"""Dtype policy.

TPU MXU wants bf16 operands; norms/softmax/logits accumulate in fp32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32
    logits_dtype: jnp.dtype = jnp.float32


DEFAULT_POLICY = DTypePolicy()
FP32_POLICY = DTypePolicy(jnp.float32, jnp.float32, jnp.float32, jnp.float32)

"""Tracing / profiling / throughput accounting.

Replaces the reference's ad-hoc instrumentation:
  - per-stage time.time() spans in calli_align (modeling_internvl_chat.py:557-601)
    -> ``Spans`` aggregator (used by runtime/engine.py)
  - xtuner ThroughputHook tokens/s + FLOPs-per-iter model
    (engine/hooks/throughput_hook.py:16-150) -> ``TrainThroughput``
  - no torch.profiler equivalent existed; here ``trace`` wraps
    jax.profiler.trace for real TPU traces viewable in XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class Spans:
    """Named wall-clock span aggregation."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def add(self, name: str, dt: float):
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            n = self.counts[name]
            t = self.totals[name]
            lines.append(f"{name:24s} {t:8.3f}s  x{n:<5d} ({t / max(n,1) * 1000:8.1f} ms/call)")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA/TPU profile trace (open with xprof / tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def parse_xplane(trace_dir: str, top: int = 15):
    """Summarize a jax.profiler trace: [(total_ms, op_name)] per TPU plane.

    Parses the .xplane.pb protobuf directly (the tensorboard profile plugin in
    this image is version-broken); requires
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python when the fast proto runtime
    rejects the generated schema."""
    import glob
    import os

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    results = {}
    for pb in glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True):
        xs = xplane_pb2.XSpace()
        with open(pb, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            stats = {}
            meta = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    name = meta[ev.metadata_id].name if ev.metadata_id in meta else "?"
                    stats[name] = stats.get(name, 0) + ev.duration_ps
            results[plane.name] = sorted(
                ((ps / 1e9, name) for name, ps in stats.items()), reverse=True
            )[:top]
    return results


def llm_flops_per_token(
    hidden: int, intermediate: int, num_layers: int, vocab: int,
    num_q_heads: int, num_kv_heads: int, head_dim: int, seq_len: int,
    causal: bool = True, backward: bool = False,
) -> float:
    """FLOPs per processed token (matmul-dominant model, causal-aware; the
    same accounting as throughput_hook.py but parameterized for GQA)."""
    qkv = 2 * hidden * (num_q_heads + 2 * num_kv_heads) * head_dim
    o = 2 * num_q_heads * head_dim * hidden
    mlp = 3 * 2 * hidden * intermediate
    attn_ctx = seq_len if not causal else seq_len / 2
    attn = 2 * 2 * num_q_heads * head_dim * attn_ctx
    per_layer = qkv + o + mlp + attn
    total = per_layer * num_layers + 2 * hidden * vocab
    return total * (3 if backward else 1)


class TrainThroughput:
    """tokens/s + model TFLOPs/s estimation across train steps."""

    def __init__(self, cfg, seq_len: int):
        llm = cfg.llm
        self.flops_per_token = llm_flops_per_token(
            llm.hidden_size, llm.intermediate_size, llm.num_hidden_layers,
            llm.vocab_size, llm.num_attention_heads, llm.num_key_value_heads,
            llm.head_dim, seq_len, causal=True, backward=True,
        )
        self._t0: Optional[float] = None
        self.tokens = 0
        self.steps = 0

    def start(self):
        self._t0 = time.time()

    def step(self, batch_tokens: int) -> Dict[str, float]:
        if self._t0 is None:
            self.start()
        self.tokens += batch_tokens
        self.steps += 1
        dt = max(time.time() - self._t0, 1e-9)
        tps = self.tokens / dt
        return {
            "tokens_per_sec": tps,
            "tflops_per_sec": tps * self.flops_per_token / 1e12,
            "steps_per_sec": self.steps / dt,
        }

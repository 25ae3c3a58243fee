"""Shared CLI plumbing: engine construction from checkpoints or random init."""

from __future__ import annotations

import os
import sys
from typing import Optional

from callireader_tpu.core.config import VLMConfig, get_config
from callireader_tpu.runtime.engine import CalliReaderEngine, init_all_params
from callireader_tpu.runtime.tokenizer import DEFAULT_MODEL, InternLM2Tokenizer


_ASSETS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets"
)


def _overlay_trained_assets(params: dict, cfg: VLMConfig, replaceable: set) -> VLMConfig:
    """Overlay the in-repo trained slicing-prior checkpoints — the TPU
    analogues of the reference's separately-shipped params/best.pt (YOLO) and
    params/orderformer.pth (config/configu.py:61-62) — onto components that
    would otherwise run with random weights. Components loaded from a user
    checkpoint are never replaced, and presets whose module architecture
    differs from the shipped checkpoints (e.g. tiny test configs) are
    skipped."""
    from callireader_tpu.core.config import (
        DetectorConfig, OrderFormerConfig, ResamplerConfig,
    )
    from callireader_tpu.models.detector import load_npz

    det_d = DetectorConfig()
    of_d = OrderFormerConfig()
    res_d = ResamplerConfig()
    arch_ok = {
        # operating-point fields (conf/NMS thresholds, max_boxes pad) are
        # tunable per run and do not affect weight shapes
        "detector": all(
            getattr(cfg.detector, f) == getattr(det_d, f)
            for f in ("num_classes", "depth_mult", "width_mult", "max_channels",
                      "reg_max", "img_size")
        ),
        "orderformer": all(
            getattr(cfg.orderformer, f) == getattr(of_d, f)
            for f in ("input_dim", "model_dim", "num_heads", "num_layers",
                      "output_dim", "ff_dim")
        ),
    }
    for name, fname in (("detector", "detector_640.npz"),
                        ("orderformer", "orderformer.npz")):
        path = os.path.join(_ASSETS_DIR, fname)
        if name not in replaceable or not arch_ok[name] or not os.path.exists(path):
            continue
        params[name] = load_npz(path)
        print(f"[engine] trained {name} loaded from {path}", file=sys.stderr)

    # CalliAlign: LoRA deltas + small leaves over the seed-0 resampler AND
    # char-ViT inits (train/callialign_train.py). Only valid when the WHOLE
    # engine is the seed-0 random init (the asset was trained against that
    # align table) — build_engine puts "resampler" in `replaceable` exactly
    # then. Checkpoint-loaded resamplers (real callialign.pth weights via
    # runtime/weights.py) are never replaced. The merged char ViT rides as
    # params["char_vision"], the engine's analogue of the reference's
    # separate params/vit_model.pt char-path module.
    ca_path = os.path.join(_ASSETS_DIR, "callialign.npz")
    if ("resampler" in replaceable and cfg.resampler == res_d
            and cfg.char_vision is None
            and cfg.llm.hidden_size == 4096 and os.path.exists(ca_path)):
        from callireader_tpu.train import callialign_train as _ca

        import jax.numpy as jnp

        if _ca.asset_version(ca_path) >= 3:
            # compact char tower trained from scratch: swap in BOTH the
            # params and the compact char_vision/resampler architecture
            stack, cfg, meta = _ca.apply_v3_asset(cfg, ca_path, jnp.bfloat16)
            params.update(stack)
            acc = (meta.get("eval", {}).get("fix_clean") or [[0, 0, 0]])[0]
            print(f"[engine] trained CalliAlign compact tower loaded from "
                  f"{ca_path} (fixture char acc {acc[-1]:.3f})",
                  file=sys.stderr)
        else:
            params.update(_ca.apply_asset(cfg, ca_path, jnp.bfloat16))
            tower = "+char_vision" if "char_vision" in params else ""
            print(f"[engine] trained CalliAlign{tower} loaded from {ca_path}",
                  file=sys.stderr)
    return cfg


def build_engine(
    *,
    preset: str = "callireader-8b",
    checkpoint_dir: Optional[str] = None,
    mu_sigma_path: Optional[str] = None,
    orderformer_path: Optional[str] = None,
    tokenizer_path: str = DEFAULT_MODEL,
    random_init_ok: bool = False,
    quant: Optional[str] = None,
    adapter_path: Optional[str] = None,
    lora_rank: int = 128,
    lora_alpha: float = 256.0,
    gray_chars: bool = True,
    device_resize_chars: bool = True,
    device_tile_pages: bool = True,
    char_canvas: Optional[int] = None,
    mesh_spec: Optional[str] = None,
    trained_assets: bool = True,
) -> CalliReaderEngine:
    """``mesh_spec``: e.g. "tensor=4,fsdp=2" — SPMD inference over all local
    devices (required to serve callireader-8b bf16, which exceeds one chip)."""
    import jax
    import jax.numpy as jnp

    from callireader_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(preset)
    tok = InternLM2Tokenizer(tokenizer_path)

    if checkpoint_dir and os.path.isdir(checkpoint_dir):
        from callireader_tpu.runtime.weights import convert_reference_checkpoint

        print(f"[engine] loading checkpoint from {checkpoint_dir}", file=sys.stderr)
        params = convert_reference_checkpoint(
            checkpoint_dir, cfg,
            mu_sigma_path=mu_sigma_path,
            orderformer_path=orderformer_path,
            dtype=jnp.bfloat16,
        )
        # components absent from the checkpoint fall back to random init
        missing = {"detector", "orderformer", "resampler", "align"} - set(params)
        random_components = set(missing)
        if missing:
            print(f"[engine] random-initializing missing components: {missing}", file=sys.stderr)
            rand = init_all_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
            for name in missing:
                params[name] = rand[name]
    elif random_init_ok:
        print(
            "[engine] WARNING: no checkpoint found — RANDOM weights (outputs are noise; "
            "pipeline/perf testing only)",
            file=sys.stderr,
        )
        params = init_all_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        # resampler is replaceable here (and only here): the CalliAlign asset
        # is trained against exactly this seed-0 init of ViT + align table
        random_components = {"detector", "orderformer", "resampler"}
    else:
        raise FileNotFoundError(
            f"checkpoint_dir {checkpoint_dir!r} not found; pass --random-init to run "
            "with random weights"
        )

    if adapter_path:
        # serve a fine-tuned e-IT checkpoint directly: attach LoRA leaves,
        # restore the trainable subtree (LoRA + mlp1) from orbax, merge
        from callireader_tpu.train import checkpoint as ckpt_mod
        from callireader_tpu.train import e_it, lora

        print(f"[engine] loading adapter from {adapter_path}", file=sys.stderr)
        params["llm"] = lora.add_lora(
            params["llm"], cfg.llm, jax.random.PRNGKey(0),
            rank=lora_rank, alpha=lora_alpha, dtype=jnp.float32,
        )
        tc = e_it.TrainConfig(lora_rank=lora_rank, lora_alpha=lora_alpha)
        state, frozen, _ = e_it.create_train_state(params, tc)
        state = ckpt_mod.restore_train_state(adapter_path, state)
        params = e_it.merge_params(state.trainable, frozen)
        params["llm"] = lora.merge_lora(params["llm"])

    if quant in ("int8", "int8-all"):
        from callireader_tpu.runtime.quantize import param_bytes, quantize_llm_int8

        before = param_bytes(params["llm"])
        params["llm"] = quantize_llm_int8(params["llm"])
        # 128-pad the vocab tables so the fused-dequant head kernel's block
        # constraint holds (92553 % 128 != 0); _logits masks the pad rows
        import dataclasses

        from callireader_tpu.models import internlm2 as _illm

        params["llm"], llm_cfg = _illm.pad_vocab(params["llm"], cfg.llm, 128)
        cfg = dataclasses.replace(cfg, llm=llm_cfg)
        if not mesh_spec:
            # single-device: fuse QKV / gate-up int8 leaves — fewer, larger
            # decode kernels. The fused out axis cannot tensor-shard, so any
            # mesh keeps the unfused layout.
            from callireader_tpu.runtime.quantize import fuse_llm_int8

            params["llm"] = fuse_llm_int8(params["llm"])
        after = param_bytes(params["llm"])
        print(
            f"[engine] int8 weight-only quantization: LLM {before/1e9:.1f} GB -> {after/1e9:.1f} GB",
            file=sys.stderr,
        )
        if quant == "int8-all":
            # + the ViT tower: the char-crop encode dominates the OCR
            # pipeline's device time, and int8 MXU throughput is 2x bf16
            from callireader_tpu.runtime.quantize import quantize_vit_int8

            vb = param_bytes(params["vision"])
            params["vision"] = quantize_vit_int8(params["vision"])
            print(
                f"[engine] int8 ViT: {vb/1e9:.2f} GB -> "
                f"{param_bytes(params['vision'])/1e9:.2f} GB",
                file=sys.stderr,
            )
    elif quant:
        raise ValueError(f"unknown quant mode {quant!r}")

    if trained_assets:
        cfg = _overlay_trained_assets(params, cfg, random_components)
        if (quant == "int8-all" and "char_vision" in params
                and cfg.char_vision is None):
            # overlay runs after the quant block; a v2 merged char ViT gets
            # the same W8A8 treatment as the tile tower. The v3 compact
            # tower stays bf16: at ~14M params / ~250x fewer FLOPs it is
            # noise in the profile and per-channel scales would cost more
            # than they save.
            from callireader_tpu.runtime.quantize import quantize_vit_int8

            params["char_vision"] = quantize_vit_int8(params["char_vision"])

    mesh = None
    if mesh_spec:
        from callireader_tpu.parallel import spmd

        shape = {k: int(v) for k, v in (kv.split("=") for kv in mesh_spec.split(","))}
        n = len(jax.devices())
        used = 1
        for v in shape.values():
            used *= v
        if n % used == 0 and "data" not in shape:
            shape["data"] = n // used
        mesh = spmd.make_mesh(shape)
        print(f"[engine] SPMD mesh: {dict(mesh.shape)}", file=sys.stderr)

    return CalliReaderEngine(
        cfg, params, tok, gray_chars=gray_chars,
        device_resize_chars=device_resize_chars,
        device_tile_pages=device_tile_pages, char_canvas=char_canvas,
        mesh=mesh,
    )

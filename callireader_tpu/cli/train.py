"""Training CLI — the `xtuner train` equivalent.

  python -m callireader_tpu.cli.train --data ann.json --image-root ./imgs \
      --batch-size 2 --grad-accum 2 --epochs 1 --out ./work_dir

Parity targets:
  - entry/config flow: train/xtuner/entry_point.py + tools/train.py (one CLI
    process; no torchrun — SPMD over all local devices via one Mesh)
  - e-IT recipe defaults: configs/internvl/v2/e-IT.py:32-104 (LoRA r128 a256,
    frozen towers, lr 5e-5, bs 2 x accum 2, 1 epoch, max_length 8192,
    LengthGroupedSampler)
  - hooks: LoggerHook (interval prints), CheckpointHook (every N iters,
    keep-1), ThroughputHook (tokens/s + TFLOPs), EvaluateChatHook (periodic
    sample generation), resume (--resume)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def _load_recipe(name_or_path: str) -> dict:
    if name_or_path.endswith(".py") or os.path.sep in name_or_path:
        import importlib.util

        spec = importlib.util.spec_from_file_location("_recipe", name_or_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.config()
    from callireader_tpu.configs import get_config as get_recipe

    return get_recipe(name_or_path)


def main(argv=None):
    parser = argparse.ArgumentParser(description="e-IT training")
    parser.add_argument("--data", type=str, required=True, help="annotation json/jsonl")
    parser.add_argument("--image-root", type=str, default="")
    parser.add_argument("--out", type=str, default="./work_dir")
    parser.add_argument("--preset", type=str, default="callireader-8b")
    parser.add_argument("--checkpoint", type=str, default=os.environ.get("CALLIREADER_CKPT"))
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--grad-accum", type=int, default=2)
    parser.add_argument("--epochs", type=float, default=1.0)
    parser.add_argument("--max-iters", type=int, default=None)
    parser.add_argument("--lr", type=float, default=5e-5)
    parser.add_argument("--lora-rank", type=int, default=128)
    parser.add_argument("--lora-alpha", type=float, default=256.0)
    parser.add_argument("--qlora", action="store_true",
                        help="quantize the frozen LLM base to int8 (weight-"
                             "only) under the bf16 LoRA adapters — the TPU "
                             "analog of the reference's bitsandbytes NF4 "
                             "QLoRA (train/xtuner/model/internvl.py:50-71); "
                             "fits the 32-layer 8B e-IT run on ONE 16GB v5e")
    parser.add_argument("--log-interval", type=int, default=10)
    parser.add_argument("--ckpt-interval", type=int, default=1500)
    parser.add_argument("--eval-chat-interval", type=int, default=0,
                        help="generate a sample completion every N iters (0=off)")
    parser.add_argument("--eval-chat-prompt", type=str, default="读出图中所有文字。")
    parser.add_argument("--mesh", type=str, default=None,
                        help='e.g. "data=4,fsdp=2,tensor=1"')
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--check-data", action="store_true",
                        help="print a decoded dataset sample and exit "
                             "(DatasetInfoHook / check-custom-dataset equivalent)")
    parser.add_argument("--config", type=str, default=None,
                        help="recipe name from the config zoo (list-cfg) or a "
                             ".py file defining config(); sets flag defaults")
    pre, _ = parser.parse_known_args(argv)
    if pre.config:
        recipe = _load_recipe(pre.config)
        key_map = {
            "preset": "preset", "batch_size": "batch_size",
            "accumulative_counts": "grad_accum", "lr": "lr",
            "lora_rank": "lora_rank", "lora_alpha": "lora_alpha",
            "max_epochs": "epochs", "save_steps": "ckpt_interval",
            "quant_base": "qlora",
        }
        parser.set_defaults(**{
            key_map[k]: v for k, v in recipe.items() if k in key_map
        })
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from callireader_tpu.cli.common import build_engine
    from callireader_tpu.parallel import spmd
    from callireader_tpu.train import checkpoint as ckpt_mod
    from callireader_tpu.train import data as data_mod
    from callireader_tpu.train import e_it, lora
    from callireader_tpu.utils.profiling import Spans, TrainThroughput

    os.makedirs(args.out, exist_ok=True)
    engine = build_engine(
        preset=args.preset, checkpoint_dir=args.checkpoint, random_init_ok=args.random_init
    )
    cfg, tok = engine.cfg, engine.tok

    if args.mesh:
        shape = {k: int(v) for k, v in (kv.split("=") for kv in args.mesh.split(","))}
        mesh = spmd.make_mesh(shape)
    else:
        # default: data axis as large as the batch allows, remainder to fsdp
        import math

        n = len(jax.devices())
        data = math.gcd(n, args.batch_size)
        mesh = spmd.make_mesh({"data": data, "fsdp": n // data, "tensor": 1, "seq": 1})
    print(f"[train] mesh: {dict(mesh.shape)}", file=sys.stderr)

    dataset = data_mod.EITDataset(args.data, cfg, tok, image_root=args.image_root)
    if args.check_data:
        sample = dataset[0]
        ids = sample["input_ids"]
        print(f"[check-data] {len(dataset)} samples; sample 0: {len(ids)} tokens", file=sys.stderr)
        print(f"[check-data] decoded: {tok.decode(ids.tolist(), skip_special_tokens=False)[:800]!r}", file=sys.stderr)
        sup = sample["labels"][sample["labels"] != -100]
        print(f"[check-data] supervised tokens: {len(sup)} -> {tok.decode(sup.tolist())[:200]!r}", file=sys.stderr)
        if "pixel_values" in sample:
            print(f"[check-data] pixel tiles: {sample['pixel_values'].shape}", file=sys.stderr)
        if "pseudo_embeds" in sample:
            print(f"[check-data] pseudo embeds: {sample['pseudo_embeds'].shape}", file=sys.stderr)
        return
    accum = max(1, args.grad_accum)
    steps_per_epoch = max(1, len(dataset) // (args.batch_size * accum))
    total_steps = args.max_iters or int(steps_per_epoch * args.epochs)

    train_cfg = e_it.TrainConfig(
        learning_rate=args.lr,
        total_steps=total_steps,
        lora_rank=args.lora_rank,
        lora_alpha=args.lora_alpha,
        grad_accum=accum,
    )

    params = engine.params
    params["llm"] = lora.add_lora(
        params["llm"], cfg.llm, jax.random.PRNGKey(args.seed),
        rank=train_cfg.lora_rank, alpha=train_cfg.lora_alpha,
        # QLoRA trains bf16 adapters over the int8 base (bitsandbytes
        # practice, internvl.py:50-71); full-precision runs keep fp32 masters
        dtype=jnp.bfloat16 if args.qlora else jnp.float32,
    )
    if args.qlora:
        from callireader_tpu.runtime import quantize as quant_mod

        before = quant_mod.param_bytes(params["llm"])
        # after add_lora: the adapters stay bf16 (they carry the grads), the
        # base projections+embeddings drop to int8. _proj dispatches on the
        # *_q leaves, so the same train step / loss path runs unchanged and
        # grads flow through the dequantizing matmul into h and the adapters.
        params["llm"] = quant_mod.quantize_llm_int8(params["llm"])
        # e-IT's step consumes only ViT+projector+LLM (pseudo embeds come
        # precomputed in the dataset); the inference-only components — the
        # align VQ table is 1.5 GB fp32 at 8B vocab — are dropped so the
        # whole train state fits one 16 GB chip (tests/test_8b_memory.py)
        for name in ("align", "detector", "orderformer"):
            params.pop(name, None)
        engine.detector = None
        print(f"[train] qlora: int8 base "
              f"{before / 1e9:.2f} -> {quant_mod.param_bytes(params['llm']) / 1e9:.2f} GB; "
              f"inference-only components dropped from the train state",
              file=sys.stderr)
    axes = spmd.engine_logical_axes(cfg, params)
    params = spmd.shard_tree(params, axes, mesh)
    # rebind so the engine's pre-shard copy is freed — otherwise two full
    # models sit in HBM and the end-of-run export OOMs at 2b scale
    engine.params = params

    state, frozen, tx = e_it.create_train_state(params, train_cfg)
    state = e_it.replicate_scalars(state, mesh)
    if args.resume:
        state = ckpt_mod.restore_train_state(args.resume, state)
        state = e_it.replicate_scalars(state, mesh)
        # seed restoration from the checkpoint metadata so the data shuffle
        # continues the same stream (tools/train.py:219-244 behavior)
        meta_path = os.path.join(args.resume, "metadata.json")
        if os.path.exists(meta_path):
            import json as _json

            with open(meta_path) as f:
                saved = _json.load(f)
            if "seed" in saved and saved["seed"] != args.seed:
                print(f"[train] seed restored from checkpoint: {saved['seed']}",
                      file=sys.stderr)
                args.seed = int(saved["seed"])
        print(f"[train] resumed from {args.resume} at step {int(state.step)}", file=sys.stderr)

    seq_sharded = int(mesh.shape.get("seq", 1)) > 1
    step_fn = jax.jit(
        e_it.make_train_step(cfg, train_cfg, tx, mesh=mesh if seq_sharded else None),
        donate_argnums=(0,),
    )

    spans = Spans()
    thr = TrainThroughput(cfg, seq_len=2048)
    loader = data_mod.data_loader(dataset, args.batch_size, shuffle_seed=args.seed)
    # state.step counts MICRO-batches; an "iter" (logs, checkpoints, schedule)
    # is one accumulated update of `accum` micro-batches, matching the
    # reference's accumulative_counts semantics (e-IT.py:40).
    it = int(state.step)
    # derived from the loader's own arithmetic (not recomputed independently)
    # so the fast-forward below stays in sync with the actual stream
    micro_per_epoch = max(1, data_mod.batches_per_epoch(len(dataset), args.batch_size))
    if args.resume and it:
        # fast-forward the shuffled stream past already-consumed batches so a
        # mid-epoch resume continues where it left off instead of re-training
        # the head of the epoch (reference sampler resume behavior). The main
        # loop reseeds exhausted loaders with args.seed + it at the epoch
        # boundary (it = epoch * micro_per_epoch) — reproduce that epoch's
        # exact stream, not epoch 0's.
        epoch = it // micro_per_epoch
        skip = it % micro_per_epoch
        epoch_seed = args.seed if epoch == 0 else args.seed + epoch * micro_per_epoch
        loader = data_mod.data_loader(dataset, args.batch_size, shuffle_seed=epoch_seed)
        for _ in range(skip):
            next(loader)
        if skip or epoch:
            print(f"[train] data loader fast-forwarded to epoch {epoch}, batch {skip}",
                  file=sys.stderr)
    micro_total = total_steps * accum
    last_ckpt = None
    log_path = os.path.join(args.out, "train_log.jsonl")

    with mesh:
        while it < micro_total:
            try:
                batch = next(loader)
            except StopIteration:
                loader = data_mod.data_loader(dataset, args.batch_size, shuffle_seed=args.seed + it)
                batch = next(loader)
            batch = spmd.shard_batch(batch, mesh, seq_sharded=seq_sharded)
            with spans.span("step"):
                state, metrics = step_fn(state, frozen, batch)
            it = int(state.step)
            n_tok = int(np.asarray(metrics["n_tokens"]))
            stats = thr.step(n_tok)
            if it % accum:
                continue  # mid-accumulation micro-batch: no update happened
            upd = it // accum
            if upd % args.log_interval == 0:
                rec = {
                    "iter": upd,
                    "loss": float(metrics["loss"]),
                    "grad_norm": float(metrics["grad_norm"]),
                    **{k: round(v, 2) for k, v in stats.items()},
                }
                print(f"[train] {json.dumps(rec)}", file=sys.stderr)
                with open(log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
            if args.ckpt_interval and upd % args.ckpt_interval == 0:
                path = os.path.join(args.out, f"iter_{upd}")
                ckpt_mod.save_train_state(path, state, metadata={"iter": upd, "seed": args.seed})
                if last_ckpt and os.path.exists(last_ckpt):
                    shutil.rmtree(last_ckpt)  # keep-1 (e-IT.py:150-155)
                last_ckpt = path
            if args.eval_chat_interval and upd % args.eval_chat_interval == 0:
                merged = e_it.merge_params(state.trainable, frozen)
                engine.params = merged
                resp = engine.chat(None, args.eval_chat_prompt, max_new_tokens=32)
                print(f"[eval-chat @{upd}] {resp!r}", file=sys.stderr)

    # final save + deployable export
    final = os.path.join(args.out, "final")
    ckpt_mod.save_train_state(final, state, metadata={"iter": it // accum, "seed": args.seed})
    merged = e_it.merge_params(state.trainable, frozen)
    # drop optimizer moments + grad accumulators before the export d2h: the
    # device->host transfer needs per-leaf staging buffers, and at 2b scale
    # the opt state's ~1-2GB is the difference between fitting and OOM
    state = None
    import gc

    gc.collect()
    try:
        ms = jax.devices()[0].memory_stats() or {}
        print(f"[train] HBM before export: {ms.get('bytes_in_use', 0)/1e9:.2f} GB in use",
              file=sys.stderr)
    except Exception:
        pass
    export_dir = os.path.join(args.out, "export_official")
    ckpt_mod.export_reference_format(merged, cfg, export_dir)
    print(f"[train] done: {it // accum} iters ({it} micro-batches); export at {export_dir}",
          file=sys.stderr)
    print(spans.report(), file=sys.stderr)


if __name__ == "__main__":
    main()

"""Coverage for the aux-component inventory: conversation template registry,
dataset map fns, resampler ablation variants, OrderFormer training, LLaVA
wrapper, RefCOCO eval, chat plugins, config zoo + unified CLI, converters."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from callireader_tpu.core.config import callireader_tiny

CFG = callireader_tiny()


# ---------------------------------------------------------------- templates


def test_template_registry():
    from callireader_tpu.runtime import conversation as conv

    c = conv.build_chat_prompt("hi", history=[("q1", "a1")])
    p = c.get_prompt()
    assert p.endswith("<|im_start|>assistant\n")
    assert "<|im_start|>user\nq1<|im_end|>" in p

    v = conv.get_conv_template("vicuna_v1.1")
    v.append_message(v.roles[0], "hello")
    v.append_message(v.roles[1], None)
    assert v.get_prompt().endswith("ASSISTANT:")

    l3 = conv.get_conv_template("llama3-chat")
    l3.append_message(l3.roles[0], "hello")
    l3.append_message(l3.roles[1], None)
    out = l3.get_prompt()
    assert out.startswith("<|begin_of_text|>") and "<|eot_id|>" in out

    for name in ("internlm2-chat", "internvl2_5", "Hermes-2", "phi3-chat",
                 "llama2-chat", "internvl_zh"):
        assert conv.get_conv_template(name).name == name
    # registry instances are copies — mutating one doesn't leak
    a = conv.get_conv_template("internlm2-chat")
    a.append_message(a.roles[0], "x")
    assert not conv.get_conv_template("internlm2-chat").messages


# ------------------------------------------------------------------ map fns


def test_map_fns():
    from callireader_tpu.train.sft_data import MAP_FNS

    # full reference coverage: all 19 dataset_map_fns + default + extras
    # (/root/reference/train/xtuner/dataset/map_fns/dataset_map_fns/)
    required = {
        "default", "alpaca", "alpaca_zh", "arxiv", "code_alpaca", "colors",
        "crime_kg_assistant", "law_reference", "llava", "llava_image_only",
        "medical", "msagent_react", "oasst1", "openai", "openorca",
        "pretrain", "sql", "stack_exchange", "tiny_codes", "wizardlm",
    }
    assert required <= set(MAP_FNS), sorted(required - set(MAP_FNS))
    got = MAP_FNS["oasst1"]({"text": "### Human: hi### Assistant: hello"})
    assert got["conversation"] == [{"input": "hi", "output": "hello"}]
    got = MAP_FNS["alpaca_zh"](
        {"instruction_zh": "翻译", "input_zh": "hello", "output_zh": "你好"}
    )
    assert got["conversation"][0]["input"] == "翻译\nhello"
    got = MAP_FNS["sql"]({"context": "CREATE TABLE t(a int)", "question": "count?",
                          "answer": "SELECT COUNT(*) FROM t"})
    assert "CREATE TABLE" in got["conversation"][0]["input"]
    got = MAP_FNS["pretrain"]({"text": "raw corpus line"})
    assert got["conversation"][0] == {"input": "", "output": "raw corpus line"}


# -------------------------------------------------------- resampler variants


def test_mlp_resampler_variants():
    from callireader_tpu.models import resampler

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 16, 8), jnp.float32)
    p = resampler.init_mlp_resampler(k, num_tokens=16, mult=2)
    out = resampler.mlp_resampler(p, x)
    assert out.shape == (2, 3, 8)

    p2 = resampler.init_mlp_6763(k, input_dim=16 * 8, output_dim=10)
    out2 = resampler.mlp_6763(p2, x)
    assert out2.shape == (2, 10)


# ----------------------------------------------------------- orderformer fit


def test_orderformer_training_reduces_loss():
    from callireader_tpu.models import orderformer as of

    cfg = CFG.orderformer
    params = of.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    N = 8
    boxes = np.zeros((N, cfg.max_boxes, 4), np.float32)
    ranks = np.zeros((N, cfg.max_boxes, 1), np.float32)
    for i in range(N):
        b = rng.rand(5, 4).astype(np.float32)
        boxes[i, :5] = b
        ranks[i, :5, 0] = np.argsort(np.argsort(b[:, 0])) + 1
    counts = np.full(N, 5)
    before = of.evaluate_orderformer(params, cfg, boxes, ranks, counts)
    p2, _ = of.train_orderformer(params, cfg, boxes, ranks, epochs=3, batch_size=4)
    after = of.evaluate_orderformer(p2, cfg, boxes, ranks, counts)
    assert after["loss"] < before["loss"]
    assert set(after) == {"loss", "order_accuracy"}


# ------------------------------------------------------------------- llava


def test_llava_splice_and_loss():
    from callireader_tpu.models import llava

    key = jax.random.PRNGKey(0)
    params = llava.init_llava_params(key, CFG, dtype=jnp.float32)

    B, S, n_patch = 2, 6, 4
    ids = np.full((B, S), 7, np.int32)
    ids[0, 2] = llava.IMAGE_TOKEN_INDEX
    ids[1, 0] = llava.IMAGE_TOKEN_INDEX
    labels = np.arange(B * S, dtype=np.int32).reshape(B, S) % 11
    feats = jax.random.normal(key, (B, n_patch, CFG.llm.hidden_size), jnp.float32)

    emb, lab, mask = llava.prepare_inputs_labels_for_multimodal(
        params["llm"], CFG.llm, jnp.asarray(ids), feats, jnp.asarray(labels),
        compute_dtype=jnp.float32,
    )
    S2 = S - 1 + n_patch
    assert emb.shape == (B, S2, CFG.llm.hidden_size) and lab.shape == (B, S2)
    # image rows are ignore-labeled; text rows carry shifted labels
    assert np.all(np.asarray(lab)[0, 2 : 2 + n_patch] == -100)
    assert np.all(np.asarray(lab)[1, :n_patch] == -100)
    np.testing.assert_array_equal(np.asarray(lab)[0, :2], labels[0, :2])
    np.testing.assert_array_equal(np.asarray(lab)[0, 2 + n_patch :], labels[0, 3:])
    # spliced image rows match the features
    np.testing.assert_allclose(np.asarray(emb)[1, :n_patch], np.asarray(feats)[1], atol=1e-6)

    # end-to-end loss on a tiny image
    px = jax.random.uniform(key, (B, CFG.vision.image_size, CFG.vision.image_size, 3))
    ids_t = ids.copy()
    loss = llava.llava_loss(
        params, CFG, px, jnp.asarray(ids_t), jnp.asarray(labels),
    )
    assert np.isfinite(float(loss))


# ------------------------------------------------------------------ refcoco


def test_refcoco_eval():
    from callireader_tpu.evalx import refcoco

    assert refcoco.normalize_bbox([10, 20, 30, 40], 100, 100) == [10, 20, 40, 60]
    conv = refcoco.gen_refer_conversation("the cat", [10, 20, 30, 40], 100, 100)
    assert conv[1]["value"] == "{<10><20><40><60>}"
    assert conv[0]["value"].endswith("<image>")
    assert refcoco.compute_iou([0, 0, 9, 9], [0, 0, 9, 9]) == 1.0
    assert refcoco.parse_bbox_answer("box {<10><20><40><60>} ok") == [10, 20, 40, 60]
    assert refcoco.parse_bbox_answer("no numbers") is None
    answers = [
        {"ans": "{<10><20><40><60>}", "bbox": [10, 20, 30, 40], "height": 100, "width": 100},
        {"ans": "{<90><90><99><99>}", "bbox": [10, 20, 30, 40], "height": 100, "width": 100},
    ]
    assert refcoco.eval_iou(answers) == 0.5


# ------------------------------------------------------------------ plugins


def test_chat_plugins():
    from callireader_tpu.runtime import plugins

    assert plugins.calculate("1+2^3; sqrt(16)") == "9.00;4.00"
    assert plugins.calculate("__import__('os')") == "No result."
    out = plugins.plugins_api('thought Calculate("2*3") end')
    assert 'Calculate("2*3") => 6.00' in out and out.endswith("<eor>\n")
    solved = plugins.solve_equations("x+y=3, x-y=1")
    assert "x = 2" in solved and "y = 1" in solved
    out = plugins.plugins_api('Search("weather")')
    assert "unavailable offline" in out


# ---------------------------------------------------- config zoo + entrypoint


def test_config_zoo_and_main(tmp_path, capsys):
    from callireader_tpu import __main__ as entry
    from callireader_tpu.configs import get_config, list_configs

    names = list_configs()
    assert {"e_it", "sft_internlm2_7b", "dpo_internlm2_7b"} <= set(names)
    eit = get_config("e_it")
    assert eit["lora_rank"] == 128 and eit["lora_alpha"] == 256.0

    assert entry.main(["list-cfg"]) == 0
    assert "e_it" in capsys.readouterr().out
    assert entry.main(["copy-cfg", "e_it", str(tmp_path)]) == 0
    assert (tmp_path / "e_it_copy.py").exists()
    assert entry.main(["bogus-mode"]) == 1


# --------------------------------------------------------------- converters


def test_consolidate_safetensors(tmp_path):
    from safetensors.numpy import load_file, save_file

    from callireader_tpu.train.checkpoint import consolidate_safetensors_dtype

    src = tmp_path / "src"; src.mkdir()
    sd = {
        "a": np.random.RandomState(0).randn(4, 4).astype(np.float32),
        "b": np.arange(5, dtype=np.int32),
    }
    save_file(sd, str(src / "model.safetensors"))

    # dtype cast
    out = tmp_path / "bf16"
    consolidate_safetensors_dtype(str(src), str(out), dtype="bfloat16")
    got = load_file(str(out / "model.safetensors"))
    assert got["a"].dtype == jnp.bfloat16 and got["b"].dtype == np.int32

    # reshard without cast
    out2 = tmp_path / "shards"
    consolidate_safetensors_dtype(str(src), str(out2), dtype=None, max_shard_bytes=32)
    idx = json.loads((out2 / "model.safetensors.index.json").read_text())
    assert len(set(idx["weight_map"].values())) > 1
    merged = {}
    for f in set(idx["weight_map"].values()):
        merged.update(load_file(str(out2 / f)))
    np.testing.assert_array_equal(merged["a"], sd["a"])
    assert merged["a"].dtype == np.float32


def test_convert_cli_split(tmp_path):
    from safetensors.numpy import save_file

    from callireader_tpu.cli import convert

    src = tmp_path / "src"; src.mkdir()
    save_file({"w": np.ones((8, 8), np.float32)}, str(src / "model.safetensors"))
    convert.main(["consolidate", str(src), str(tmp_path / "out"), "--dtype", "bfloat16"])
    assert (tmp_path / "out" / "model.safetensors").exists()


def test_train_config_recipe_defaults(tmp_path, monkeypatch):
    """--config e_it sets the flag defaults (spot-check via check-data exit)."""
    from callireader_tpu.cli.train import _load_recipe

    r = _load_recipe("e_it")
    assert r["batch_size"] == 2 and r["accumulative_counts"] == 2
    # from a file path too
    from callireader_tpu.configs import copy_config

    p = copy_config("sft_internlm2_7b", str(tmp_path))
    r2 = _load_recipe(p)
    assert r2["lora_rank"] == 64


# --------------------------------------------------------------- preprocess


def test_preprocess_arxiv_and_refcoco(tmp_path):
    from callireader_tpu.cli import preprocess

    src = tmp_path / "arxiv.jsonl"
    src.write_text("\n".join([
        json.dumps({"categories": "cs.CL stat.ML", "update_date": "2021-05-01", "title": "keep"}),
        json.dumps({"categories": "math.CO", "update_date": "2021-05-01", "title": "drop-cat"}),
        json.dumps({"categories": "cs.CL", "update_date": "2019-01-01", "title": "drop-date"}),
    ]))
    dst = tmp_path / "filtered.json"
    n = preprocess.preprocess_arxiv(str(src), str(dst), ["cs.CL"], "2020-01-01")
    assert n == 1
    assert json.loads(dst.read_text())[0]["title"] == "keep"

    ann = tmp_path / "refs.json"
    ann.write_text(json.dumps([
        {"sents": "the cat", "bbox": [10, 20, 30, 40], "height": 100, "width": 100,
         "image": "img/1.jpg"},
    ]))
    out = tmp_path / "conv.json"
    n = preprocess.preprocess_refcoco(str(ann), str(out))
    assert n == 1
    conv = json.loads(out.read_text())[0]["conversations"]
    assert conv[1]["value"] == "{<10><20><40><60>}"

    out2 = tmp_path / "conv_inv.json"
    preprocess.preprocess_refcoco(str(ann), str(out2), inv=True)
    conv2 = json.loads(out2.read_text())[0]["conversations"]
    assert conv2[1]["value"] == "the cat"


def test_prepare_long_context():
    from callireader_tpu.models.internlm2 import prepare_long_context

    cfg = CFG.llm
    big = prepare_long_context(cfg, cfg.max_position_embeddings * 3)
    assert big.rope_scaling_type == "linear"
    assert big.rope_scaling_factor == 3.0
    assert big.max_position_embeddings == cfg.max_position_embeddings * 3
    # no-op inside the native window
    assert prepare_long_context(cfg, 4).rope_scaling_type == cfg.rope_scaling_type


def test_config_zoo_matrix():
    """The generated zoo (configs/zoo.py) mirrors xtuner's ~590-config
    expansion: every name resolves to a valid recipe, every recipe is
    consumable (preset exists, map_fn exists, template exists), and
    copy-cfg materializes zoo members as editable files."""
    from callireader_tpu import configs
    from callireader_tpu.configs import zoo
    from callireader_tpu.core.config import PRESETS
    from callireader_tpu.train.sft_data import MAP_FNS
    from callireader_tpu.train.templates import PROMPT_TEMPLATES

    names = zoo.list_zoo()
    # 3 models x 3 methods x (6 task specials + 21 datasets x 3 scheds x 3
    # variants) = 3*3*(6 + 189) = 1755 named members
    assert len(names) == len(set(names))
    assert len(names) >= 500, len(names)
    for name in names:
        cfg = zoo.generate(name)
        assert cfg["preset"] in PRESETS
        if "dataset_map_fn" in cfg:
            assert cfg["dataset_map_fn"] in MAP_FNS
        if "prompt_template" in cfg:
            assert cfg["prompt_template"] in PROMPT_TEMPLATES
        if "qlora" in name:
            assert cfg.get("quant_base") is True or cfg.get("task") in (
                "dpo", "orpo", "reward", "llava_pretrain", "llava_finetune",
                "e_it",
            )

    # registry resolution: file recipes win, zoo members resolve, junk raises
    assert "e_it" in configs.list_configs()
    assert "internlm2_7b_qlora_alpaca_e3" in configs.list_configs()
    got = configs.get_config("internlm2_7b_qlora_alpaca_e3")
    assert got["dataset_map_fn"] == "alpaca" and got["quant_base"] is True
    assert got["max_epochs"] == 3
    sp = configs.get_config("internlm2_2b_lora_oasst1_e1_sp4_32k")
    assert sp["sequence_parallel_size"] == 4 and sp["max_length"] == 32768
    try:
        configs.get_config("qwen_7b_qlora_alpaca_e3")
        assert False, "should raise"
    except ValueError:
        pass

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = configs.copy_config("internlm2_7b_qlora_alpaca_e3", d)
        import importlib.util

        spec = importlib.util.spec_from_file_location("_copy", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert mod.config()["dataset_map_fn"] == "alpaca"

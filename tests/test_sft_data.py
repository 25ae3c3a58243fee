"""Generic SFT pipeline + packed pretraining dataset + loss integration."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.models import internlm2
from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer
from callireader_tpu.train import e_it, sft_data

CFG = callireader_tiny()
TOK = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")


def test_map_fns():
    # reference parity (dataset_map_fns/alpaca_map_fn.py:4-13): always join
    # instruction+input with \n; drop <nooutput> records entirely
    a = sft_data.alpaca_map_fn({"instruction": "写一首诗", "input": "", "output": "好"})
    assert a["conversation"][0]["input"] == "写一首诗\n"
    a = sft_data.alpaca_map_fn({"instruction": "翻译", "input": "hi", "output": "你好"})
    assert a["conversation"][0]["input"] == "翻译\nhi"
    a = sft_data.alpaca_map_fn({"instruction": "x", "input": "y", "output": "<nooutput>"})
    assert a["conversation"] == []
    o = sft_data.openai_map_fn(
        {"messages": [{"role": "user", "content": "q"}, {"role": "assistant", "content": "a"}]}
    )
    assert o["conversation"] == [{"input": "q", "output": "a"}]
    s = sft_data.sharegpt_map_fn(
        {"conversations": [{"from": "human", "value": "q"}, {"from": "gpt", "value": "a"}]}
    )
    assert s["conversation"] == [{"input": "q", "output": "a"}]


def test_tokenize_conversation_labels():
    rec = sft_data.tokenize_conversation(
        [{"input": "问题", "output": "回答"}, {"input": "再问", "output": "再答"}], TOK
    )
    ids, labels = rec["input_ids"], rec["labels"]
    assert len(ids) == len(labels)
    assert labels[0] == e_it.IGNORE_INDEX  # bos
    n_sup = (labels != e_it.IGNORE_INDEX).sum()
    assert 0 < n_sup < len(ids)
    # supervised positions match their input ids
    m = labels != e_it.IGNORE_INDEX
    np.testing.assert_array_equal(ids[m], labels[m])


def test_packed_dataset(tmp_path):
    path = tmp_path / "corpus.jsonl"
    docs = [{"content": "春眠不觉晓，" * 20}, {"content": "hello world. " * 30}, {"content": "处处闻啼鸟。" * 15}]
    path.write_text("\n".join(json.dumps(d, ensure_ascii=False) for d in docs))

    ds = sft_data.JsonlTextDataset(str(path))
    assert len(ds) == 3 and "春眠" in ds[0]

    packed = sft_data.PackedTextDataset(ds, TOK, packed_length=128)
    assert len(packed) >= 1
    row = packed[0]
    assert row["input_ids"].shape == (1, 128)
    seg = row["segment_ids"][0]
    # positions restart at each segment boundary
    for s in np.unique(seg[seg >= 0]):
        pos = row["positions"][0][seg == s]
        np.testing.assert_array_equal(pos, np.arange(len(pos)))


def test_packed_rows_feed_sft_loss(tmp_path):
    path = tmp_path / "corpus.jsonl"
    path.write_text(json.dumps({"content": "春眠不觉晓。" * 10}, ensure_ascii=False))
    packed = sft_data.PackedTextDataset(
        sft_data.JsonlTextDataset(str(path)), TOK, packed_length=128
    )
    batch = next(sft_data.packed_loader(packed, 1))
    params = {"llm": internlm2.init_params(jax.random.PRNGKey(0), CFG.llm, jnp.float32)}
    loss, metrics = e_it.eit_loss(
        params, CFG, {k: jnp.asarray(v) for k, v in batch.items()},
        policy=FP32_POLICY, use_flash=False, remat=False,
    )
    assert np.isfinite(float(loss))


def test_new_map_fns_cover_reference_formats():
    f = sft_data.MAP_FNS
    got = f["arxiv"]({"abstract": "We study X.", "title": "On X"})
    assert got["conversation"][0]["output"] == "On X"
    assert "paper title" in got["conversation"][0]["system"]

    got = f["colors"]({"description": "Color: deep sea blue", "color": "#003366"})
    assert got["conversation"][0]["input"] == "deep sea blue"

    got = f["law_reference"]({"question": "合同无效怎么办", "answer": "依据民法典..."})
    assert "律师" in got["conversation"][0]["system"]

    got = f["openorca"](
        {"system_prompt": "Be terse.", "question": "2+2?", "response": "4"}
    )
    assert got["conversation"][0] == {"system": "Be terse.", "input": "2+2?", "output": "4"}

    got = f["stack_exchange"]({"question": "How?", "response": "Thus."})
    assert got["conversation"][0]["output"] == "Thus."

    got = f["llava"](
        {"conversations": [
            {"from": "human", "value": "what is this <image>"},
            {"from": "gpt", "value": "a cat"},
        ]}
    )
    assert got["conversation"][0]["input"].startswith("<image>\n")

    got = f["llava_image_only"](
        {"conversations": [
            {"from": "human", "value": "<image>"},
            {"from": "gpt", "value": "a dog"},
        ]}
    )
    assert got["conversation"][0] == {"input": "<image>", "output": "a dog"}

    got = f["default"]({"input": "hi", "output": "yo"})
    assert got["conversation"][0]["output"] == "yo"


def test_msagent_react_map_fn():
    rows = [
        {"from": "system", "value": "api list..."},
        {"from": "user", "value": "翻译这句话"},
        {"from": "assistant",
         "value": "<|startofthink|>```JSON{\"api_name\": \"translate\", "
                  "\"parameters\": {\"text\": \"hi\"}}```<|endofthink|>"
                  "<|startofexec|>```JSON{\"result\": \"你好\"}```<|endofexec|>"
                  "你好"},
    ]
    got = sft_data.msagent_react_map_fn({"conversations": rows})
    conv = got["conversation"]
    assert len(conv) == 2
    assert "Action:translate" in conv[0]["output"]
    assert "Action Input:" in conv[0]["output"]
    assert conv[0]["system"] == "api list..."
    assert conv[1]["output"].startswith("Final Answer:")
    assert "Response:" in conv[1]["system"]
    # invalid transcripts filter to empty
    assert sft_data.msagent_react_map_fn({"conversations": [rows[0]]}) == {"conversation": []}


def test_per_turn_system_prompt_tokenization():
    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer

    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    rec = sft_data.openorca_map_fn(
        {"system_prompt": "Be terse.", "question": "2+2?", "response": "4"}
    )
    out = sft_data.tokenize_conversation(rec["conversation"], tok)
    text = tok.decode(out["input_ids"].tolist(), skip_special_tokens=False)
    assert "Be terse." in text
    sup = out["labels"][out["labels"] != -100]
    assert "4" in tok.decode(sup.tolist())


def test_prompt_template_registry_complete():
    """All 27 PROMPT_TEMPLATE model families from the reference
    (train/xtuner/utils/templates.py:8-168) plus the 8 SYSTEM_TEMPLATE task
    prompts (:170-193)."""
    from callireader_tpu.train import templates as T

    required = {
        "default", "zephyr", "internlm_chat", "internlm2_chat", "moss_sft",
        "llama2_chat", "code_llama_chat", "chatglm2", "chatglm3", "qwen_chat",
        "baichuan_chat", "baichuan2_chat", "wizardlm", "wizardcoder",
        "vicuna", "deepseek_coder", "deepseekcoder", "deepseek_moe",
        "deepseek_v2", "mistral", "mixtral", "minicpm", "gemma",
        "cohere_chat", "llama3_chat", "phi3_chat",
    }
    assert required <= set(T.PROMPT_TEMPLATES), sorted(required - set(T.PROMPT_TEMPLATES))
    assert {"moss_sft", "alpaca", "arxiv_gentile", "colorist", "coder",
            "lawyer", "medical", "sql"} <= set(T.SYSTEM_TEMPLATE)
    # eos/stop-word metadata preserved for the families that define it
    assert T.PROMPT_TEMPLATES["internlm2_chat"].stop_words == ("<|im_end|>",)
    assert T.PROMPT_TEMPLATES["llama3_chat"].suffix == "<|eot_id|>"
    assert T.PROMPT_TEMPLATES["gemma"].suffix_as_eos is False


def test_tokenize_with_template_llama3():
    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer
    from callireader_tpu.train.templates import tokenize_with_template

    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    conv = [
        {"system": "Be brief.", "input": "hi", "output": "hello"},
        {"input": "more", "output": "ok"},
    ]
    out = tokenize_with_template(conv, tok, "llama3_chat")
    text = tok.decode(out["input_ids"].tolist(), skip_special_tokens=False)
    assert "<|start_header_id|>system<|end_header_id|>" in text
    assert text.count("<|start_header_id|>user<|end_header_id|>") == 2
    sup = out["labels"][out["labels"] != -100]
    sup_text = tok.decode(sup.tolist(), skip_special_tokens=False)
    assert "hello<|eot_id|>" in sup_text and "ok<|eot_id|>" in sup_text
    assert "more" not in sup_text  # prompts unsupervised

    # chatglm2 round numbering
    out2 = tokenize_with_template(conv, tok, "chatglm2")
    t2 = tok.decode(out2["input_ids"].tolist(), skip_special_tokens=False)
    assert "[Round 1]" in t2 and "[Round 2]" in t2


def test_template_system_only_when_provided():
    """No spurious system block for system-less rows (xtuner encode_fn:
    SYSTEM is emitted only when the dataset provides a system string)."""
    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer
    from callireader_tpu.train.templates import tokenize_with_template

    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    out = tokenize_with_template(
        [{"input": "hi", "output": "yo"}], tok, "internlm2_chat"
    )
    text = tok.decode(out["input_ids"].tolist(), skip_special_tokens=False)
    assert "system" not in text
    out2 = tokenize_with_template(
        [{"system": "S.", "input": "hi", "output": "yo"}], tok, "internlm2_chat"
    )
    t2 = tok.decode(out2["input_ids"].tolist(), skip_special_tokens=False)
    assert "<|im_start|>system\nS.<|im_end|>" in t2

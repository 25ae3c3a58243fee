"""Tokenizer: round trips, special ids, added-token behavior."""

import numpy as np
import pytest

from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer

TOK = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")


def test_special_token_ids():
    assert TOK.convert_tokens_to_ids("<|im_start|>") == 92543
    assert TOK.convert_tokens_to_ids("<|im_end|>") == 92542
    assert TOK.convert_tokens_to_ids("<img>") == 92544
    assert TOK.convert_tokens_to_ids("</img>") == 92545
    assert TOK.convert_tokens_to_ids("<IMG_CONTEXT>") == 92546
    assert TOK.convert_tokens_to_ids("[UNUSED_TOKEN_140]") == 92537
    assert TOK.bos_token_id == 1 and TOK.eos_token_id == 2


def test_bos_prepended():
    ids = TOK.encode("你好")
    assert ids[0] == 1
    assert TOK.encode("你好", add_bos=False)[0] != 1


def test_round_trip_chinese():
    texts = [
        "春眠不觉晓，处处闻啼鸟。",
        "王羲之《兰亭集序》永和九年岁在癸丑",
        "mixed 中英文 and punctuation! 123",
        "草书、行书、楷书、隶书、篆书",
    ]
    for t in texts:
        ids = TOK.encode(t, add_bos=False)
        assert TOK.decode(ids) == t


def test_skip_special_tokens():
    text = "<|im_start|>user\n读出文字<|im_end|><|im_start|>assistant\n"
    ids = TOK.encode(text, add_bos=True)
    dec = TOK.decode(ids, skip_special_tokens=True)
    assert "<|im_start|>" not in dec and "读出文字" in dec


def test_img_context_expansion_counts():
    q = "<img>" + "<IMG_CONTEXT>" * 256 + "</img>"
    ids = TOK.encode(q, add_bos=False)
    assert ids.count(92546) == 256
    assert len(ids) == 258


def test_byte_fallback():
    # characters outside the vocab decompose into byte tokens and round trip
    t = "𠀋"  # rare CJK ext char
    ids = TOK.encode(t, add_bos=False)
    assert TOK.decode(ids) == t

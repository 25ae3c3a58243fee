"""InternLM2 tokenizer, built without the sentencepiece runtime.

The reference ships a SentencePiece BPE model (InternVL/tokenizer.model,
byte-fallback, identity normalizer, no dummy prefix) wrapped by
InternVL/tokenization_internlm2.py plus tokenizer_config.json added-token
overrides (ids 92538-92543 renamed to <|plugin|>..<|im_start|>, ids
92544-92553 appended: <img> </img> <IMG_CONTEXT> <quad> </quad> <ref> </ref>
<box> </box> <ALIGNED_TOKEN>).

Here the .model protobuf is parsed directly (protobuf schema vendored by
transformers) and converted to a HuggingFace `tokenizers` BPE — merges are
recovered from piece scores/ids with the standard extraction trick. The built
tokenizer is cached as JSON so the conversion runs once.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

from tokenizers import AddedToken, Tokenizer, decoders, models, normalizers

# tokenizer_config.json added_tokens_decoder overrides of in-vocab pieces
RENAMES = {
    92538: "<|plugin|>",
    92539: "<|interpreter|>",
    92540: "<|action_end|>",
    92541: "<|action_start|>",
    92542: "<|im_end|>",
    92543: "<|im_start|>",
}
# appended special tokens (added_tokens.json), in id order from 92544
APPENDED = [
    "<img>", "</img>", "<IMG_CONTEXT>", "<quad>", "</quad>",
    "<ref>", "</ref>", "<box>", "</box>", "<ALIGNED_TOKEN>",
]

UNK_ID, BOS_ID, EOS_ID, PAD_ID = 0, 1, 2, 2

_PIECE_NORMAL, _PIECE_UNK, _PIECE_CONTROL, _PIECE_USER, _PIECE_BYTE = 1, 2, 3, 4, 6


def _load_proto(model_path: str):
    import transformers.utils.sentencepiece_model_pb2_new as pb2

    m = pb2.ModelProto()
    with open(model_path, "rb") as f:
        m.ParseFromString(f.read())
    return m


def _extract_merges(vocab: Dict[str, int], normal_pieces: Sequence[str]) -> List[tuple]:
    """Standard SentencePiece-BPE merge recovery: every split of a vocab piece
    whose halves are both in the vocab is a merge; order by merged-piece id."""
    merges = []
    for piece in normal_pieces:
        pid = vocab[piece]
        if len(piece) < 2:
            continue
        local = []
        for i in range(1, len(piece)):
            l, r = piece[:i], piece[i:]
            if l in vocab and r in vocab:
                local.append((vocab[l], vocab[r], l, r))
        local.sort(key=lambda x: (x[0], x[1]))
        for _, _, l, r in local:
            merges.append((pid, l, r))
    merges.sort(key=lambda x: x[0])
    return [(l, r) for _, l, r in merges]


def build_tokenizer(model_path: str, cache_path: Optional[str] = None) -> Tokenizer:
    if cache_path and os.path.exists(cache_path) and os.path.getmtime(cache_path) >= os.path.getmtime(model_path):
        return Tokenizer.from_file(cache_path)

    proto = _load_proto(model_path)
    vocab: Dict[str, int] = {}
    user_defined: List[str] = []
    normal: List[str] = []
    for i, p in enumerate(proto.pieces):
        piece = RENAMES.get(i, p.piece)
        vocab[piece] = i
        if p.type == _PIECE_USER and i not in RENAMES:
            user_defined.append(piece)
        elif p.type == _PIECE_NORMAL:
            normal.append(p.piece)

    merges = _extract_merges(vocab, normal)

    tok = Tokenizer(
        models.BPE(
            vocab=vocab,
            merges=merges,
            unk_token="<unk>",
            fuse_unk=True,
            byte_fallback=True,
        )
    )
    # identity normalizer + no dummy prefix (tokenizer.model normalizer_spec);
    # only the implicit space->metaspace mapping remains.
    tok.normalizer = normalizers.Replace(" ", "▁")
    tok.decoder = decoders.Sequence(
        [decoders.Replace("▁", " "), decoders.ByteFallback(), decoders.Fuse()]
    )

    specials = ["<unk>", "<s>", "</s>"] + list(RENAMES.values()) + APPENDED
    tok.add_special_tokens([AddedToken(s, normalized=False, special=True) for s in specials])
    # USER_DEFINED sp pieces match literally but are not "special" (they
    # survive skip_special_tokens decode).
    tok.add_tokens([AddedToken(s, normalized=False, special=False) for s in user_defined])

    if cache_path:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        tok.save(cache_path)
    return tok


class InternLM2Tokenizer:
    """Minimal API mirroring what the pipeline needs from the HF tokenizer."""

    def __init__(self, model_path: str, cache_path: Optional[str] = None):
        if cache_path is None:
            cache_path = os.path.join(
                os.path.expanduser("~/.cache/callireader_tpu"), "tokenizer.json"
            )
        self._tok = build_tokenizer(model_path, cache_path)
        self.bos_token_id = BOS_ID
        self.eos_token_id = EOS_ID
        self.pad_token_id = PAD_ID
        self.unk_token_id = UNK_ID

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids = self._tok.encode(text, add_special_tokens=False).ids
        return ([BOS_ID] + ids) if add_bos else ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        return self._tok.decode(list(ids), skip_special_tokens=skip_special_tokens)

    def convert_tokens_to_ids(self, token: str) -> int:
        tid = self._tok.token_to_id(token)
        if tid is None:
            raise KeyError(token)
        return tid

    def convert_ids_to_tokens(self, tid: int) -> Optional[str]:
        return self._tok.id_to_token(tid)


_DEFAULT = None

# Public InternLM2 SentencePiece model vendored as a data asset.
DEFAULT_MODEL = os.path.join(os.path.dirname(__file__), "..", "assets", "tokenizer.model")


def default_tokenizer(model_path: str = DEFAULT_MODEL):
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = InternLM2Tokenizer(model_path)
    return _DEFAULT

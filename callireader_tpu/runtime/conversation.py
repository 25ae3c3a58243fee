"""Conversation prompt templates.

Parity target: /root/reference/InternVL/conversation.py — specifically the
``internlm2-chat`` template (:358-374, MPT separator style :238-247):

  <|im_start|>system\n{system}<|im_end|><|im_start|>user\n{q}<|im_end|><|im_start|>assistant\n

(no newline after <|im_end|>; roles carry a trailing newline). Other templates
from the registry can be added as needed; the pipeline only uses this one.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

DEFAULT_SYSTEM = (
    "你是由上海人工智能实验室联合商汤科技开发的书生多模态大模型，"
    "英文名叫InternVL, 是一个有用无害的人工智能助手。"
)


@dataclasses.dataclass
class Conversation:
    name: str = "internlm2-chat"
    system_template: str = "<|im_start|>system\n{system_message}"
    system_message: str = DEFAULT_SYSTEM
    roles: Tuple[str, str] = ("<|im_start|>user\n", "<|im_start|>assistant\n")
    sep: str = "<|im_end|>"
    stop_token_ids: Tuple[int, ...] = (2, 92543, 92542)
    messages: List[List[Optional[str]]] = dataclasses.field(default_factory=list)

    def append_message(self, role: str, message: Optional[str]) -> None:
        self.messages.append([role, message])

    def get_prompt(self) -> str:
        # MPT separator style (conversation.py:238-247)
        ret = self.system_template.format(system_message=self.system_message) + self.sep
        for role, message in self.messages:
            if message:
                ret += role + message + self.sep
            else:
                ret += role
        return ret


_TEMPLATES = {
    "internlm2-chat": Conversation,
}


def get_conv_template(name: str) -> Conversation:
    return _TEMPLATES[name]()


def build_chat_prompt(
    question: str,
    history: Optional[List[Tuple[str, str]]] = None,
    system_message: str = DEFAULT_SYSTEM,
    template: str = "internlm2-chat",
) -> Conversation:
    conv = get_conv_template(template)
    conv.system_message = system_message
    for old_q, old_a in history or []:
        conv.append_message(conv.roles[0], old_q)
        conv.append_message(conv.roles[1], old_a)
    conv.append_message(conv.roles[0], question)
    conv.append_message(conv.roles[1], None)
    return conv

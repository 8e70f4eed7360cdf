"""Incremental detokenization for streaming decode paths.

Byte-level BPE (Qwen/GPT-2 family) frequently splits one UTF-8 character
across tokens; `tokenizer.decode([tok])` on such a token yields U+FFFD
replacement characters. The reference streams exactly that way
(qwen3_asr.py:1293, vibevoice_asr.py:830) and corrupts CJK output; this
helper decodes a running token window and emits only the clean delta,
holding back trailing bytes until the character completes.
"""

from __future__ import annotations

__all__ = ["IncrementalDetokenizer"]

_REPLACEMENT = "�"


class IncrementalDetokenizer:
    """Feed tokens one at a time; get back the newly-completed text.

    Safe for byte-level BPE tokenizers, whose suffix decodes concatenate
    exactly (the window reset relies on that); sentencepiece-style
    tokenizers also work because the window only resets at clean UTF-8
    boundaries and the emitted prefix is never re-decoded.
    """

    def __init__(self, tokenizer, window: int = 64):
        self._tok = tokenizer
        self._window = window
        self._tokens: list[int] = []
        self._emitted = 0  # chars of the current window already emitted

    def push(self, token: int) -> str:
        self._tokens.append(int(token))
        text = self._tok.decode(self._tokens)
        if text.endswith(_REPLACEMENT):
            # trailing partial UTF-8 sequence — wait for more tokens
            return ""
        out = text[self._emitted:]
        self._emitted = len(text)
        if len(self._tokens) >= self._window:
            self._tokens = []
            self._emitted = 0
        return out

    def flush(self) -> str:
        """Emit whatever remains (end of stream), replacement chars and
        all — a truncated final byte sequence is surfaced, not dropped."""
        if not self._tokens:
            return ""
        text = self._tok.decode(self._tokens)
        out = text[self._emitted:]
        self._tokens = []
        self._emitted = 0
        return out

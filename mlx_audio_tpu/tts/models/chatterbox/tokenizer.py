"""Chatterbox text tokenizers (reference:
mlx_audio/tts/models/chatterbox/tokenizer.py:1-342).

EnTokenizer wraps a `tokenizers` BPE file with the [SPACE] convention; the
multilingual MTLTokenizer adds a language-id prefix. The heavy per-language
normalizers (pykakasi, dicta, russian-stress) are optional and gated.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

SOT = "[START]"
EOT = "[STOP]"
UNK = "[UNK]"
SPACE = "[SPACE]"
SPECIAL_TOKENS = [SOT, EOT, UNK, SPACE, "[PAD]", "[SEP]", "[CLS]", "[MASK]"]

__all__ = ["EnTokenizer", "MTLTokenizer", "SOT", "EOT", "UNK", "SPACE"]


class EnTokenizer:
    """English BPE tokenizer (reference tokenizer.py:21-50)."""

    def __init__(self, vocab_file_path):
        from tokenizers import Tokenizer

        self.tokenizer = Tokenizer.from_file(str(vocab_file_path))
        voc = self.tokenizer.get_vocab()
        assert SOT in voc and EOT in voc

    def text_to_tokens(self, text: str) -> np.ndarray:
        return self.encode(text)

    def encode(self, txt: str) -> np.ndarray:
        txt = txt.replace(" ", SPACE)
        return np.asarray([self.tokenizer.encode(txt).ids], np.int32)

    def decode(self, seq) -> str:
        txt = self.tokenizer.decode(list(np.asarray(seq).reshape(-1)),
                                    skip_special_tokens=False)
        txt = txt.replace(" ", "").replace(SPACE, " ")
        return txt.replace(EOT, "").replace(UNK, "")


class MTLTokenizer(EnTokenizer):
    """Multilingual variant: `[lang]text` prefix (reference
    tokenizer.py:200-342; per-language normalizers gated on availability)."""

    def text_to_tokens(self, text: str,
                       language_id: Optional[str] = None) -> np.ndarray:
        return self.encode(text, language_id=language_id)

    def encode(self, txt: str,
               language_id: Optional[str] = None) -> np.ndarray:
        if language_id:
            txt = self._normalize(txt, language_id)
            txt = f"[{language_id}]{txt}"
        txt = txt.replace(" ", SPACE)
        return np.asarray([self.tokenizer.encode(txt).ids], np.int32)

    @staticmethod
    def _normalize(txt: str, language_id: str) -> str:
        if language_id == "ja":
            try:
                import pykakasi

                kakasi = pykakasi.kakasi()
                txt = "".join(item["hira"] for item in kakasi.convert(txt))
            except ImportError:
                logger.debug("pykakasi unavailable; skipping kana conversion")
        return txt

"""Decode-only Tekken tokenizer for Voxtral-Realtime.

Mistral's "tekken" tokenizers ship as a ``tekken.json`` file next to the
checkpoint: a list of base64-encoded byte strings (one per BPE merge rank)
plus a block of special tokens that occupy ranks ``0..num_special-1`` of
the final id space. Voxtral-Realtime only ever *decodes* model output
(the prompt is built from fixed token ids), so this loader materialises
the vocab as a flat ``bytes`` table once and decodes by concatenation.

Behavioral spec: reference voxtral_realtime/tokenizer.py:14-64.
"""

from __future__ import annotations

import base64
import json
from pathlib import Path
from typing import Iterable, List

__all__ = ["TekkenTokenizer"]


class TekkenTokenizer:
    def __init__(self, tekken_path):
        data = json.loads(Path(tekken_path).read_text(encoding="utf-8"))
        cfg = data.get("config", {})
        self.n_special = int(cfg.get("default_num_special_tokens", 1000))
        # special tokens may also carry explicit ranks outside the
        # [0, n_special) prefix; collect them so decode() can skip them
        self.special_ids = frozenset(
            int(tok["rank"])
            for tok in data.get("special_tokens", [])
            if "rank" in tok
        )
        # flat table: _table[i] = raw bytes of vocab entry i
        self._table: List[bytes] = [
            base64.b64decode(entry["token_bytes"]) for entry in data["vocab"]
        ]

    @classmethod
    def from_model_path(cls, model_path) -> "TekkenTokenizer":
        p = Path(model_path) / "tekken.json"
        if not p.exists():
            raise FileNotFoundError(f"tekken.json not found in {model_path}")
        return cls(p)

    def token_bytes(self, token_id: int) -> bytes:
        if token_id < self.n_special or token_id in self.special_ids:
            return b""
        idx = token_id - self.n_special
        if 0 <= idx < len(self._table):
            return self._table[idx]
        return b""

    def decode(self, token_ids: Iterable[int]) -> str:
        buf = b"".join(self.token_bytes(int(t)) for t in token_ids)
        return buf.decode("utf-8", errors="replace")

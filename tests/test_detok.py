"""Incremental detokenization (lm/detok.py): UTF-8-correct streaming."""

from mlx_audio_tpu.lm.detok import IncrementalDetokenizer


class ByteLevelTok:
    """Minimal byte-level BPE stand-in: token id == one byte."""

    def decode(self, toks):
        return bytes(toks).decode("utf-8", errors="replace")


def test_multibyte_character_held_until_complete():
    tok = ByteLevelTok()
    d = IncrementalDetokenizer(tok)
    # "你" = e4 bd a0
    assert d.push(0xE4) == ""
    assert d.push(0xBD) == ""
    assert d.push(0xA0) == "你"
    # ascii flows through immediately
    assert d.push(ord("!")) == "!"


def test_mixed_stream_reconstructs_exactly():
    tok = ByteLevelTok()
    d = IncrementalDetokenizer(tok, window=8)
    s = "héllo 世界 ok 🎉 end"
    out = "".join(d.push(b) for b in s.encode("utf-8")) + d.flush()
    assert out == s


def test_flush_surfaces_truncated_tail():
    tok = ByteLevelTok()
    d = IncrementalDetokenizer(tok)
    assert d.push(0xE4) == ""
    assert "�" in d.flush()  # truncated sequence surfaced, not dropped


def test_per_token_decode_would_corrupt():
    """The defect this replaces: decode one byte at a time."""
    tok = ByteLevelTok()
    per_token = "".join(tok.decode([b]) for b in "你".encode("utf-8"))
    assert per_token == "���"  # reference-style per-token streaming output

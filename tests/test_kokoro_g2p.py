"""Kokoro G2P fallback: CMUdict lexicon loading (ARPAbet → misaki IPA),
morphology, letter-to-sound rules, and an accuracy sanity gate.

The reference depends on misaki+espeak (reference kokoro/pipeline.py:96).
The fallback must (a) reach dictionary quality whenever CMUdict-format
data is available (MLX_AUDIO_TPU_LEXICON / prebuilt json / nltk), and
(b) degrade gracefully through morphology + letter rules otherwise.
"""

import gzip
import json

import numpy as np
import pytest

from mlx_audio_tpu.tts.models.kokoro.g2p import BasicEnglishG2P
from mlx_audio_tpu.tts.models.kokoro.lexicon import (arpabet_to_misaki,
                                                     lexicon_from_cmudict,
                                                     load_cmudict)

# Real CMUdict entries (public-domain CMU Pronouncing Dictionary format)
# with the misaki-IPA the converter must produce.
CMU_SAMPLE = """\
;;; comment line
HELLO  HH AH0 L OW1
WORLD  W ER1 L D
SENTENCE  S EH1 N T AH0 N S
LITTLE  L IH1 T AH0 L
BEFORE  B IH0 F AO1 R
WATER  W AO1 T ER0
COMPUTER  K AH0 M P Y UW1 T ER0
BOY  B OY1
DAY  D EY1
HOUSE  HH AW1 S
NIGHT  N AY1 T
UNDERSTAND  AH2 N D ER0 S T AE1 N D
UNDERSTAND(2)  AH0 N D ER0 S T AE1 N D
"""

EXPECTED = {
    "hello": "həlˈO",
    "world": "wˈɜɹld",
    "sentence": "sˈɛntəns",
    "little": "lˈɪɾəl",
    "before": "bɪfˈɔɹ",
    "water": "wˈɔɾəɹ",
    "computer": "kəmpjˈuɾəɹ",
    "boy": "bˈɔI",
    "day": "dˈA",
    "house": "hˈWs",
    "night": "nˈIt",
    "understand": "ˌʌndəɹstˈænd",
}


def test_arpabet_converter_matches_misaki_conventions(tmp_path):
    p = tmp_path / "cmudict.txt"
    p.write_text(CMU_SAMPLE)
    lex = lexicon_from_cmudict(p)
    assert lex == EXPECTED


def test_cmudict_parser_skips_variants_and_comments(tmp_path):
    p = tmp_path / "cmudict.txt"
    p.write_text(CMU_SAMPLE)
    d = load_cmudict(p)
    assert d["understand"][0] == "AH2"  # first entry kept, (2) ignored
    assert len(d) == 12


def test_env_lexicon_activates_dictionary_quality(tmp_path, monkeypatch):
    """With MLX_AUDIO_TPU_LEXICON set, every dictionary word resolves to
    its CMU pronunciation exactly (the fallback is dictionary-backed)."""
    p = tmp_path / "cmudict.txt"
    p.write_text(CMU_SAMPLE)
    monkeypatch.setenv("MLX_AUDIO_TPU_LEXICON", str(p))
    g = BasicEnglishG2P()
    for word, ipa in EXPECTED.items():
        assert g._word_to_phonemes(word) == ipa, word
    # and a compound: possessive derived from the dictionary base
    assert g._word_to_phonemes("world's") == "wˈɜɹldz"


def test_prebuilt_json_lexicon(tmp_path, monkeypatch):
    """scripts/build_lexicon.py output format (json.gz) loads directly."""
    p = tmp_path / "lex.json.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        json.dump({"zyzzyva": "zˈɪzɪvə"}, f)
    monkeypatch.setenv("MLX_AUDIO_TPU_LEXICON", str(p))
    g = BasicEnglishG2P()
    assert g._word_to_phonemes("zyzzyva") == "zˈɪzɪvə"


def test_morphology_voicing():
    g = BasicEnglishG2P()
    assert g._word_to_phonemes("cats") == "kˈæts"  # voiceless → s
    assert g._word_to_phonemes("dogs") == "dˈɔɡz"  # voiced → z
    assert g._word_to_phonemes("wishes").endswith("ɪz")  # sibilant → ɪz
    assert g._word_to_phonemes("wanted").endswith("ɪd")  # t/d → ɪd
    assert g._word_to_phonemes("liked") == "lˈIkt"  # voiceless → t
    assert g._word_to_phonemes("played").endswith("d")  # voiced → d
    assert g._word_to_phonemes("making") == "mˈAkɪŋ"  # silent-e base
    assert g._word_to_phonemes("stopped") == "stˈɑpt"  # doubling


def test_letter_to_sound_regulars():
    """Rule coverage on regular words the 130-word lexicon does not hold:
    magic-e, soft c/g, positional y, silent clusters, suffix patterns."""
    g = BasicEnglishG2P()
    # remove lexicon influence: spot-check words absent from it
    cases = {
        "make": "mˈAk", "time": "tˈIm", "home": "hˈOm",
        "knife": "nˈIf", "gem": "ʤˈɛm", "city": "sˈɪɾi",
        "happy": "hˈæpi", "gym": "ʤˈɪm", "type": "tˈIp",
        "station": "stˈæʃən", "nature": "nˈæʧəɹ",
        "pleasure": "plˈiʒəɹ", "play": "plˈA", "boy": "bˈɔI",
        "train": "tɹˈAn", "sleep": "slˈip", "coat": "kˈOt",
    }
    hits = sum(g._word_to_phonemes(w) == ipa for w, ipa in cases.items())
    # every one of these regulars should be exact
    assert hits == len(cases), {
        w: (g._word_to_phonemes(w), ipa) for w, ipa in cases.items()
        if g._word_to_phonemes(w) != ipa
    }


def test_accuracy_sanity_on_word_list(tmp_path, monkeypatch):
    """Phoneme-level sanity over a broad word list: WITHOUT a dictionary
    the rule engine must stay phonemically plausible (finite, vocab-clean,
    stressed); WITH the dictionary the same list is exact."""
    words = list(EXPECTED) + [
        "speech", "model", "quick", "brown", "jumps", "table", "chair",
        "window", "garden", "yellow", "purple", "silver", "golden",
        "running", "jumping", "walked", "talked", "smiling", "brightness",
        "kindness", "movement", "helpful", "harmless", "quickly",
        "slowly", "teacher", "farmer", "baker", "painter", "singer",
    ]
    g = BasicEnglishG2P()
    from mlx_audio_tpu.tts.models.kokoro.kokoro import ModelConfig

    vocab_chars = set(
        "abcdefghijklmnopqrstuvwxyzæɑɔɛɪʊʌəɹŋθðʃʒʧʤˈˌAIOWYɡɜɾ "
    )
    for w in words:
        ps = g._word_to_phonemes(w)
        assert ps, w
        assert "ˈ" in ps or "ˌ" in ps, f"{w}: no stress mark in {ps}"
        bad = set(ps) - vocab_chars
        assert not bad, f"{w}: symbols outside Kokoro vocab: {bad} in {ps}"

    # dictionary-backed: exact on every dictionary word
    p = tmp_path / "cmudict.txt"
    p.write_text(CMU_SAMPLE)
    monkeypatch.setenv("MLX_AUDIO_TPU_LEXICON", str(p))
    g2 = BasicEnglishG2P()
    exact = sum(g2._word_to_phonemes(w) == ipa for w, ipa in EXPECTED.items())
    assert exact == len(EXPECTED)


def test_pipeline_contract_unchanged():
    """The fallback still emits the misaki-style token contract the
    Kokoro pipeline consumes (phonemes + whitespace)."""
    g = BasicEnglishG2P()
    ps, tokens = g("Hello, world!")
    assert ps
    assert tokens[0].phonemes == "həlˈO"
    assert any(t.text == "," for t in tokens)

"""Grapheme→phoneme providers for Kokoro.

The reference depends on `misaki` (+espeak-ng) for G2P (pipeline.py:96-131).
Those are host-side CPU dependencies; this module auto-detects them and
falls back to a built-in lexicon/rule English G2P so the pipeline runs
end-to-end in dependency-free environments (quality-limited fallback — the
phoneme *pipeline contract* is identical: tokens with `.phonemes` and
`.whitespace`, misaki-style IPA symbols from the Kokoro vocab).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

__all__ = ["PhonemeToken", "get_g2p", "BasicEnglishG2P"]


@dataclass
class PhonemeToken:
    text: str
    phonemes: Optional[str] = None
    whitespace: str = " "
    start_ts: Optional[float] = None
    end_ts: Optional[float] = None


# ~130 most common English words, hand-mapped to misaki-style US IPA.
_LEXICON = {
    "the": "ðə", "a": "ə", "an": "ən", "and": "ænd", "of": "əv", "to": "tˈu",
    "in": "ˈɪn", "is": "ˈɪz", "it": "ˈɪt", "you": "jˈu", "that": "ðˈæt",
    "he": "hˈi", "she": "ʃˈi", "was": "wˈʌz", "for": "fɔɹ", "on": "ˈɑn",
    "are": "ˈɑɹ", "as": "ˈæz", "with": "wˈɪð", "his": "hˈɪz", "her": "hɜɹ",
    "they": "ðˈA", "i": "ˈI", "at": "ˈæt", "be": "bˈi", "this": "ðˈɪs",
    "have": "hˈæv", "from": "fɹˈʌm", "or": "ɔɹ", "one": "wˈʌn", "had": "hˈæd",
    "by": "bˈI", "word": "wˈɜɹd", "but": "bˈʌt", "not": "nˈɑt",
    "what": "wˈʌt", "all": "ˈɔl", "were": "wɜɹ", "we": "wˈi", "when": "wˈɛn",
    "your": "jʊɹ", "can": "kˈæn", "said": "sˈɛd", "there": "ðˈɛɹ",
    "each": "ˈiʧ", "which": "wˈɪʧ", "do": "dˈu", "how": "hˈW", "their": "ðˈɛɹ",
    "if": "ˈɪf", "will": "wˈɪl", "up": "ˈʌp", "other": "ˈʌðəɹ",
    "about": "əbˈWt", "out": "ˈWt", "many": "mˈɛni", "then": "ðˈɛn",
    "them": "ðˈɛm", "these": "ðˈiz", "so": "sˈO", "some": "sˈʌm",
    "would": "wˈʊd", "make": "mˈAk", "like": "lˈIk", "him": "hˈɪm",
    "into": "ˈɪntu", "time": "tˈIm", "has": "hˈæz", "look": "lˈʊk",
    "two": "tˈu", "more": "mˈɔɹ", "write": "ɹˈIt", "go": "ɡˈO",
    "see": "sˈi", "number": "nˈʌmbəɹ", "no": "nˈO", "way": "wˈA",
    "could": "kˈʊd", "people": "pˈipəl", "my": "mˈI", "than": "ðˈæn",
    "first": "fˈɜɹst", "water": "wˈɔtəɹ", "been": "bˈɪn", "call": "kˈɔl",
    "who": "hˈu", "its": "ˈɪts", "now": "nˈW", "find": "fˈInd",
    "long": "lˈɔŋ", "down": "dˈWn", "day": "dˈA", "did": "dˈɪd",
    "get": "ɡˈɛt", "come": "kˈʌm", "made": "mˈAd", "may": "mˈA",
    "part": "pˈɑɹt", "over": "ˈOvəɹ", "new": "nˈu", "sound": "sˈWnd",
    "take": "tˈAk", "only": "ˈOnli", "little": "lˈɪɾəl", "work": "wˈɜɹk",
    "know": "nˈO", "place": "plˈAs", "year": "jˈɪɹ", "live": "lˈɪv",
    "me": "mˈi", "back": "bˈæk", "give": "ɡˈɪv", "most": "mˈOst",
    "very": "vˈɛɹi", "after": "ˈæftəɹ", "thing": "θˈɪŋ", "our": "ˈWɹ",
    "just": "ʤˈʌst", "name": "nˈAm", "good": "ɡˈʊd", "sentence": "sˈɛntəns",
    "man": "mˈæn", "think": "θˈɪŋk", "say": "sˈA", "great": "ɡɹˈAt",
    "where": "wˈɛɹ", "help": "hˈɛlp", "through": "θɹˈu", "much": "mˈʌʧ",
    "before": "bɪfˈɔɹ", "line": "lˈIn", "right": "ɹˈIt", "too": "tˈu",
    "means": "mˈinz", "old": "ˈOld", "any": "ˈɛni", "same": "sˈAm",
    "tell": "tˈɛl", "boy": "bˈɔI", "follow": "fˈɑlO", "came": "kˈAm",
    "want": "wˈɑnt", "show": "ʃˈO", "also": "ˈɔlsO", "around": "əɹˈWnd",
    "form": "fˈɔɹm", "three": "θɹˈi", "small": "smˈɔl", "set": "sˈɛt",
    "put": "pˈʊt", "end": "ˈɛnd", "does": "dˈʌz", "another": "ənˈʌðəɹ",
    "well": "wˈɛl", "large": "lˈɑɹʤ", "must": "mˈʌst", "big": "bˈɪɡ",
    "even": "ˈivən", "such": "sˈʌʧ", "because": "bɪkˈɔz", "turn": "tˈɜɹn",
    "here": "hˈɪɹ", "why": "wˈI", "ask": "ˈæsk", "went": "wˈɛnt",
    "men": "mˈɛn", "read": "ɹˈid", "need": "nˈid", "land": "lˈænd",
    "different": "dˈɪfɹənt", "home": "hˈOm", "us": "ˈʌs", "move": "mˈuv",
    "try": "tɹˈI", "kind": "kˈInd", "hand": "hˈænd", "picture": "pˈɪkʧəɹ",
    "again": "əɡˈɛn", "change": "ʧˈAnʤ", "off": "ˈɔf", "play": "plˈA",
    "spell": "spˈɛl", "air": "ˈɛɹ", "away": "əwˈA", "animal": "ˈænəməl",
    "house": "hˈWs", "point": "pˈɔInt", "page": "pˈAʤ", "letter": "lˈɛɾəɹ",
    "mother": "mˈʌðəɹ", "answer": "ˈænsəɹ", "found": "fˈWnd",
    "study": "stˈʌdi", "still": "stˈɪl", "learn": "lˈɜɹn",
    "should": "ʃˈʊd", "world": "wˈɜɹld", "high": "hˈI", "every": "ˈɛvɹi",
    "near": "nˈɪɹ", "add": "ˈæd", "food": "fˈud", "between": "bɪtwˈin",
    "own": "ˈOn", "below": "bɪlˈO", "country": "kˈʌntɹi", "plant": "plˈænt",
    "last": "lˈæst", "school": "skˈul", "father": "fˈɑðəɹ", "keep": "kˈip",
    "tree": "tɹˈi", "never": "nˈɛvəɹ", "start": "stˈɑɹt", "city": "sˈɪɾi",
    "earth": "ˈɜɹθ", "eye": "ˈI", "light": "lˈIt", "thought": "θˈɔt",
    "head": "hˈɛd", "under": "ˈʌndəɹ", "story": "stˈɔɹi", "saw": "sˈɔ",
    "left": "lˈɛft", "don't": "dˈOnt", "few": "fjˈu", "while": "wˈIl",
    "along": "əlˈɔŋ", "might": "mˈIt", "close": "klˈOs",
    "something": "sˈʌmθɪŋ", "seem": "sˈim", "next": "nˈɛkst",
    "hard": "hˈɑɹd", "open": "ˈOpən", "example": "ɪɡzˈæmpəl",
    "begin": "bɪɡˈɪn", "life": "lˈIf", "always": "ˈɔlwAz",
    "those": "ðˈOz", "both": "bˈOθ", "paper": "pˈApəɹ",
    "together": "təɡˈɛðəɹ", "got": "ˈɡɑt", "group": "ɡɹˈup",
    "often": "ˈɔfən", "run": "ɹˈʌn", "hello": "həlˈO", "world's": "wˈɜɹldz",
    "quick": "kwˈɪk", "brown": "bɹˈWn", "fox": "fˈɑks", "jumps": "ʤˈʌmps",
    "lazy": "lˈAzi", "dog": "dˈɔɡ", "test": "tˈɛst", "speech": "spˈiʧ",
    "synthesis": "sˈɪnθəsɪs", "audio": "ˈɔdiO", "model": "mˈɑdəl",
}

# Digraph / context rules applied left-to-right for OOV words.
_RULES: List[Tuple[str, str]] = [
    ("tion", "ʃən"), ("sion", "ʒən"), ("ough", "ʌf"), ("igh", "I"),
    ("tch", "ʧ"), ("dge", "ʤ"), ("ing", "ɪŋ"), ("qu", "kw"),
    ("ch", "ʧ"), ("sh", "ʃ"), ("th", "θ"), ("ph", "f"), ("wh", "w"),
    ("ck", "k"), ("ng", "ŋ"), ("ee", "i"), ("oo", "u"), ("ea", "i"),
    ("ai", "A"), ("ay", "A"), ("oa", "O"), ("ow", "O"), ("ou", "W"),
    ("oi", "ɔI"), ("oy", "ɔI"), ("ar", "ɑɹ"), ("er", "əɹ"), ("ir", "ɜɹ"),
    ("or", "ɔɹ"), ("ur", "ɜɹ"), ("a", "æ"), ("b", "b"), ("c", "k"),
    ("d", "d"), ("e", "ɛ"), ("f", "f"), ("g", "ɡ"), ("h", "h"),
    ("i", "ɪ"), ("j", "ʤ"), ("k", "k"), ("l", "l"), ("m", "m"),
    ("n", "n"), ("o", "ɑ"), ("p", "p"), ("r", "ɹ"), ("s", "s"),
    ("t", "t"), ("u", "ʌ"), ("v", "v"), ("w", "w"), ("x", "ks"),
    ("y", "j"), ("z", "z"),
]

_NUM_WORDS = {
    "0": "zero", "1": "one", "2": "two", "3": "three", "4": "four",
    "5": "five", "6": "six", "7": "seven", "8": "eight", "9": "nine",
}


class BasicEnglishG2P:
    """Lexicon + letter-rule fallback G2P (stand-in for misaki's en.G2P)."""

    def __init__(self, british: bool = False):
        self.british = british

    def _word_to_phonemes(self, word: str) -> str:
        lw = word.lower()
        if lw in _LEXICON:
            return _LEXICON[lw]
        # strip possessive
        if lw.endswith("'s") and lw[:-2] in _LEXICON:
            return _LEXICON[lw[:-2]] + "z"
        if lw.endswith("s") and lw[:-1] in _LEXICON:
            return _LEXICON[lw[:-1]] + "z"
        out = []
        i = 0
        # drop silent final e
        if len(lw) > 3 and lw.endswith("e") and lw[-2] not in "aeiou":
            lw = lw[:-1]
        while i < len(lw):
            for pat, ph in _RULES:
                if lw.startswith(pat, i):
                    out.append(ph)
                    i += len(pat)
                    break
            else:
                i += 1
        ps = "".join(out)
        # put primary stress before first vowel-ish symbol
        for v in "æɑɔɛɪʊʌəiuAIOW":
            j = ps.find(v)
            if j >= 0:
                ps = ps[:j] + "ˈ" + ps[j:]
                break
        return ps

    def __call__(self, text: str):
        tokens: List[PhonemeToken] = []
        pieces = re.findall(r"[A-Za-z']+|\d+|[^\sA-Za-z\d]+|\s+", text)
        i = 0
        while i < len(pieces):
            p = pieces[i]
            if p.isspace():
                if tokens:
                    tokens[-1].whitespace = " "
                i += 1
                continue
            if p[0].isdigit():
                words = [_NUM_WORDS.get(d, "") for d in p]
                ph = " ".join(self._word_to_phonemes(w) for w in words if w)
            elif re.match(r"[A-Za-z']", p):
                ph = self._word_to_phonemes(p)
            else:
                # punctuation maps through when in the vocab
                ph = "".join(c for c in p if c in '!"(),.:;?—…“”')
            tokens.append(PhonemeToken(text=p, phonemes=ph, whitespace=""))
            i += 1
        phoneme_str = "".join(
            (t.phonemes or "") + t.whitespace for t in tokens
        ).strip()
        return phoneme_str, tokens


class _MisakiG2P:
    def __init__(self, british: bool):
        from misaki import en  # type: ignore

        fallback = None
        try:
            from misaki import espeak  # type: ignore

            fallback = espeak.EspeakFallback(british=british)
        except Exception:
            pass
        self._g2p = en.G2P(trf=False, british=british, fallback=fallback, unk="")

    def __call__(self, text: str):
        result, tokens = self._g2p(text)
        out = [
            PhonemeToken(
                text=t.text, phonemes=t.phonemes, whitespace=t.whitespace
            )
            for t in tokens
        ]
        return result, out


def get_g2p(lang_code: str):
    """Best available G2P for the language: misaki → builtin fallback."""
    british = lang_code == "b"
    if lang_code in "ab":
        try:
            return _MisakiG2P(british)
        except ImportError:
            import logging

            logging.getLogger(__name__).warning(
                "misaki is not installed — Kokoro is using the built-in "
                "basic English G2P fallback (reduced pronunciation "
                "quality; lexicon of ~130 words + letter rules). Install "
                "misaki for production-quality phonemization."
            )
            return BasicEnglishG2P(british)
    # Non-English languages need espeak/misaki extras; raise a clear error.
    try:
        return _MisakiG2P(False)
    except ImportError as e:
        raise ImportError(
            f"G2P for lang_code={lang_code!r} requires misaki/espeak extras"
        ) from e

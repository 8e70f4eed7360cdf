"""Token/sentence alignment types + chunk-overlap merge algorithms
(spec: reference stt/models/parakeet/alignment.py:77,158)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

__all__ = [
    "AlignedToken", "AlignedSentence", "AlignedResult",
    "tokens_to_sentences", "sentences_to_result",
    "merge_longest_contiguous", "merge_longest_common_subsequence",
]


@dataclass
class AlignedToken:
    id: int
    text: str
    start: float
    duration: float
    end: float = 0.0

    def __post_init__(self):
        self.end = self.start + self.duration


@dataclass
class AlignedSentence:
    text: str
    tokens: List[AlignedToken]
    start: float = 0.0
    end: float = 0.0
    duration: float = 0.0

    def __post_init__(self):
        self.tokens = sorted(self.tokens, key=lambda t: t.start)
        self.start = self.tokens[0].start
        self.end = self.tokens[-1].end
        self.duration = self.end - self.start


@dataclass
class AlignedResult:
    text: str
    sentences: List[AlignedSentence]

    def __post_init__(self):
        self.text = self.text.strip()


def tokens_to_sentences(tokens: List[AlignedToken]) -> List[AlignedSentence]:
    sentences = []
    current: List[AlignedToken] = []
    for idx, tok in enumerate(tokens):
        current.append(tok)
        is_sentence_end = (
            any(c in tok.text for c in "!?。？！")
            or ("." in tok.text
                and (idx == len(tokens) - 1 or " " in tokens[idx + 1].text))
        )
        if is_sentence_end:
            sentences.append(
                AlignedSentence("".join(t.text for t in current), current)
            )
            current = []
    if current:
        sentences.append(AlignedSentence("".join(t.text for t in current), current))
    return sentences


def sentences_to_result(sentences: List[AlignedSentence]) -> AlignedResult:
    return AlignedResult("".join(s.text for s in sentences), sentences)


def merge_longest_contiguous(a, b, *, overlap_duration: float):
    """Merge overlapping chunk hypotheses on their longest contiguous
    matching run; raise if no confident match (caller falls back to LCS)."""
    if not a or not b:
        return b if not a else a
    a_end, b_start = a[-1].end, b[0].start
    if a_end <= b_start:
        return a + b

    overlap_a = [t for t in a if t.end > b_start - overlap_duration]
    overlap_b = [t for t in b if t.start < a_end + overlap_duration]
    enough = len(overlap_a) // 2
    if len(overlap_a) < 2 or len(overlap_b) < 2:
        cutoff = (a_end + b_start) / 2
        return [t for t in a if t.end <= cutoff] + [t for t in b if t.start >= cutoff]

    def match(x, y):
        return x.id == y.id and abs(x.start - y.start) < overlap_duration / 2

    best: List[tuple] = []
    for i in range(len(overlap_a)):
        for j in range(len(overlap_b)):
            if match(overlap_a[i], overlap_b[j]):
                run = []
                k, l = i, j
                while (k < len(overlap_a) and l < len(overlap_b)
                       and match(overlap_a[k], overlap_b[l])):
                    run.append((k, l))
                    k += 1
                    l += 1
                if len(run) > len(best):
                    best = run
    if len(best) < enough:
        raise RuntimeError(f"No contiguous match of length >= {enough}")

    a_off = len(a) - len(overlap_a)
    result = list(a[: a_off + best[0][0]])
    for n, (ia, ib) in enumerate(best):
        result.append(a[a_off + ia])
        if n + 1 < len(best):
            gap_a = a[a_off + ia + 1 : a_off + best[n + 1][0]]
            gap_b = b[ib + 1 : best[n + 1][1]]
            result.extend(gap_b if len(gap_b) > len(gap_a) else gap_a)
    result.extend(b[best[-1][1] + 1 :])
    return result


def merge_longest_common_subsequence(a, b, *, overlap_duration: float):
    """Fallback merge using a DP longest-common-subsequence over the
    overlapping region (id + time tolerance)."""
    if not a or not b:
        return b if not a else a
    a_end, b_start = a[-1].end, b[0].start
    if a_end <= b_start:
        return a + b

    overlap_a = [t for t in a if t.end > b_start - overlap_duration]
    overlap_b = [t for t in b if t.start < a_end + overlap_duration]
    if not overlap_a or not overlap_b:
        cutoff = (a_end + b_start) / 2
        return [t for t in a if t.end <= cutoff] + [t for t in b if t.start >= cutoff]

    def match(x, y):
        return x.id == y.id and abs(x.start - y.start) < overlap_duration / 2

    n, m = len(overlap_a), len(overlap_b)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n - 1, -1, -1):
        for j in range(m - 1, -1, -1):
            if match(overlap_a[i], overlap_b[j]):
                dp[i][j] = dp[i + 1][j + 1] + 1
            else:
                dp[i][j] = max(dp[i + 1][j], dp[i][j + 1])
    pairs = []
    i = j = 0
    while i < n and j < m:
        if match(overlap_a[i], overlap_b[j]):
            pairs.append((i, j))
            i += 1
            j += 1
        elif dp[i + 1][j] >= dp[i][j + 1]:
            i += 1
        else:
            j += 1

    if not pairs:
        cutoff = (a_end + b_start) / 2
        return [t for t in a if t.end <= cutoff] + [t for t in b if t.start >= cutoff]

    a_off = len(a) - len(overlap_a)
    result = list(a[: a_off + pairs[0][0]])
    for k, (ia, ib) in enumerate(pairs):
        result.append(a[a_off + ia])
        if k + 1 < len(pairs):
            gap_a = a[a_off + ia + 1 : a_off + pairs[k + 1][0]]
            gap_b = b[ib + 1 : pairs[k + 1][1]]
            result.extend(gap_b if len(gap_b) > len(gap_a) else gap_a)
    result.extend(b[pairs[-1][1] + 1 :])
    return result

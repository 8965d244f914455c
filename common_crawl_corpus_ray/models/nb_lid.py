"""Secondary language identifier — the CLD2/CLD3 stand-in.

The reference votes two *independent* native LID libraries per line
(geoWAC.py:19-41) and keeps the line only when both agree (geoWAC.py:67).
This model is deliberately a different feature space from FastLid:
codepoint-level unigrams + bigrams (not utf-8 byte trigrams), a different
hash function and bucket count, so the two models can genuinely disagree on
ambiguous text.
"""

from __future__ import annotations

import numpy as np

_B = 1 << 12
_MULT = np.int64(0x9E3779B1)


def _gram_ids(text: str) -> np.ndarray:
    cps = np.array([ord(c) for c in text], dtype=np.int64)
    if cps.size == 0:
        return np.zeros(0, dtype=np.int64)
    parts = [cps]
    if cps.size >= 2:
        parts.append(cps[:-1] * 1114112 + cps[1:] + (1 << 50))
    ids = np.concatenate(parts)
    return ((ids * _MULT) >> 7) & (_B - 1)


class NBLid:
    def __init__(self, labels: list[str], weights: np.ndarray):
        self.labels = list(labels)
        self.W = weights

    @classmethod
    def train(cls, corpus_by_lang: dict[str, list[str]], alpha: float = 1.0) -> "NBLid":
        labels = sorted(corpus_by_lang)
        counts = np.zeros((len(labels), _B), dtype=np.float64)
        for li, lang in enumerate(labels):
            for sent in corpus_by_lang[lang]:
                h = _gram_ids(sent)
                if h.size:
                    counts[li] += np.bincount(h, minlength=_B)
        W = np.log(counts + alpha)
        W -= np.log(counts.sum(axis=1, keepdims=True) + alpha * _B)
        return cls(labels, W.astype(np.float32))

    def predict(self, texts: list[str]) -> list[str]:
        out = []
        for t in texts:
            h = _gram_ids(t)
            if h.size == 0:
                out.append("ukn")
                continue
            out.append(self.labels[int(np.argmax(self.W[:, h].sum(axis=1)))])
        return out

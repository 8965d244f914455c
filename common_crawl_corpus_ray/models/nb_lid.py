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
        """Batch prediction, vectorized like FastLid.predict: one utf-32
        decode of the whole batch, boundary-masked gram ids, one weighted
        ``bincount`` per language; empty texts stay "ukn"."""
        T = len(texts)
        if T == 0:
            return []
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=T)
        cps = np.frombuffer("".join(texts).encode("utf-32-le"),
                            dtype=np.uint32).astype(np.int64)
        if cps.size == 0:
            return ["ukn"] * T
        seg = np.repeat(np.arange(T, dtype=np.int64), lens)

        grams = [(cps, seg)]
        if cps.size >= 2:
            m = seg[:-1] == seg[1:]
            grams.append(((cps[:-1] * 1114112 + cps[1:] + (1 << 50))[m],
                          seg[:-1][m]))

        W = self.W
        scores = np.zeros((T, W.shape[0]), dtype=np.float64)
        for ids, gs in grams:
            if ids.size == 0:
                continue
            h = ((ids * _MULT) >> 7) & (_B - 1)
            for li in range(W.shape[0]):
                scores[:, li] += np.bincount(gs, weights=W[li, h], minlength=T)
        best = np.argmax(scores, axis=1)
        labels = self.labels
        return [labels[b] if n else "ukn" for b, n in zip(best, lens)]

"""NGramLM — KenLM-style byte-trigram language model with stupid backoff.

Stands in for the reference's per-corpus FastText LM scorer
(outlier_detection.py:58-92): ``logprob(text)`` returns the summed log
probability of the text (the reference's "Probability" column); the caller
divides by N_Words to get "Perplexity" (outlier_detection.py:84).

Counts are stored as sorted key arrays + value arrays so scoring is three
vectorized ``searchsorted`` lookups per text — no Python loop over
positions, no dense [2^16, 256] table per language.
"""

from __future__ import annotations

import numpy as np

_BACKOFF = np.log(0.4)          # stupid-backoff discount (Brants et al. 2007)


def _keys(a: np.ndarray, order: int) -> np.ndarray:
    if order == 1:
        return a
    if order == 2:
        return a[:-1] * 256 + a[1:]
    return a[:-2] * 65536 + a[1:-1] * 256 + a[2:]


class NGramLM:
    def __init__(self, k3, p3, k2, p2, p1):
        self.k3, self.p3 = k3, p3
        self.k2, self.p2 = k2, p2
        self.p1 = p1                # dense [256] log P(c), add-1 smoothed

    @classmethod
    def train(cls, sentences: list[str]) -> "NGramLM":
        from collections import Counter
        c3, c2, c1 = Counter(), Counter(), Counter()
        for s in sentences:
            a = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.int64)
            if a.size == 0:
                continue
            c1.update(_keys(a, 1).tolist())
            if a.size >= 2:
                c2.update(_keys(a, 2).tolist())
            if a.size >= 3:
                c3.update(_keys(a, 3).tolist())

        n1 = np.zeros(256, dtype=np.float64)
        for k, v in c1.items():
            n1[k] = v
        p1 = np.log(n1 + 1.0) - np.log(n1.sum() + 256.0)

        def packed(cn: dict, ctx_counts: dict, div: int):
            ks = np.array(sorted(cn), dtype=np.int64)
            vs = np.array([cn[k] for k in ks], dtype=np.float64)
            ctx = np.array([ctx_counts.get(k // 256, 0) for k in ks], dtype=np.float64)
            return ks, (np.log(vs) - np.log(ctx)).astype(np.float32)

        # context counts: count of (prefix) = sum over next byte
        ctx2 = Counter()
        for k, v in c2.items():
            ctx2[k // 256] += v
        ctx3 = Counter()
        for k, v in c3.items():
            ctx3[k // 256] += v
        k2, p2 = packed(c2, ctx2, 256)
        k3, p3 = packed(c3, ctx3, 65536)
        return cls(k3, p3, k2, p2, p1.astype(np.float32))

    def _lookup(self, keys: np.ndarray, sorted_keys: np.ndarray,
                vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if sorted_keys.size == 0:
            return np.zeros(len(keys), dtype=np.float32), np.zeros(len(keys), dtype=bool)
        idx = np.searchsorted(sorted_keys, keys).clip(0, sorted_keys.size - 1)
        found = sorted_keys[idx] == keys
        return vals[idx], found

    def logprob(self, text: str) -> float:
        a = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int64)
        if a.size == 0:
            return 0.0
        # first (up to) 2 bytes: unigram; float64 accumulation to match
        # logprob_batch's bincount numerics
        lp = float(self.p1[a[:min(2, a.size)]].astype(np.float64).sum())
        if a.size < 3:
            return lp
        q3 = _keys(a, 3)
        q2 = _keys(a, 2)[1:]        # bigram (c_{i-1}, c_i) aligned with q3
        v3, f3 = self._lookup(q3, self.k3, self.p3)
        v2, f2 = self._lookup(q2, self.k2, self.p2)
        v1 = self.p1[a[2:]]
        p = np.where(f3, v3, _BACKOFF + np.where(f2, v2, _BACKOFF + v1))
        # p stays float32 (numpy scalar+array promotion); accumulate in
        # float64 to match logprob_batch
        return lp + float(p.astype(np.float64).sum())

    def logprob_batch(self, texts: list[str]) -> np.ndarray:
        """Vectorized ``logprob`` over a batch: one pass of searchsorted
        lookups over all texts' trigram/bigram queries at once, per-text
        sums via weighted ``bincount`` on the segment ids. Matches the
        per-text path up to float summation order (~1e-12 relative)."""
        T = len(texts)
        out = np.zeros(T, dtype=np.float64)
        if T == 0:
            return out
        enc = [t.encode("utf-8") for t in texts]
        lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=T)
        buf = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.int64)
        if buf.size == 0:
            return out
        seg = np.repeat(np.arange(T, dtype=np.int64), lens)
        pos = np.arange(buf.size, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens)

        head = pos < 2                      # first (up to) 2 bytes: unigram
        out += np.bincount(seg[head], weights=self.p1[buf[head]].astype(np.float64),
                           minlength=T)
        tail = pos >= 2                     # trigram positions with backoff
        if tail.any():
            i = np.nonzero(tail)[0]
            q3 = buf[i - 2] * 65536 + buf[i - 1] * 256 + buf[i]
            q2 = buf[i - 1] * 256 + buf[i]
            v3, f3 = self._lookup(q3, self.k3, self.p3)
            v2, f2 = self._lookup(q2, self.k2, self.p2)
            v1 = self.p1[buf[i]]
            p = np.where(f3, v3, _BACKOFF + np.where(f2, v2, _BACKOFF + v1))
            out += np.bincount(seg[i], weights=p.astype(np.float64), minlength=T)
        return out

"""Deterministic mergeable quantile sketch (KLL-style) + the sketched
per-language stats pass.

Why: exact per-language median/MAD ships every ppl value of a language to
one reducer (decide.lang_stats method="exact" — fine at sandbox scale, and
the reference holds the full column in memory too,
outlier_detection.py:95-113). Language is the canonical skewed key: English
is ~half the corpus, so at 10^12 rows one reducer would hold ~10^12 floats.
The sketch path replaces the packed raw values with a bounded-size mergeable
summary per (block, lang): shuffle bytes become O(blocks x langs x k),
independent of row count, and the reducer merges sketches instead of
sorting columns.

Design (KLL compactor chain, Karnin/Lang/Liberty 2016, with deterministic
alternating compaction instead of coin flips — reproducibility is a repo
invariant; the derandomized variant's worst-case error is marginally worse
but still O(1/k) at fixture scales):

  * level i holds items of weight 2^i, each level kept sorted lazily
  * when a level exceeds capacity k it is sorted and every other item
    (alternating starting offset per compaction) is promoted to level i+1
  * merge = concatenate levels pairwise, re-compact
  * quantile(q)/rank(x) evaluate the weighted item multiset
  * MAD is solved from ONE sketch by bisection on t such that
    rank(med+t) - rank(med-t) ~= n/2 — no second data pass
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class QuantileSketch:
    """Mergeable quantile sketch; deterministic for a fixed add/merge order."""

    def __init__(self, k: int = 256):
        self.k = k
        self.levels: list[np.ndarray] = []
        self.n = 0              # total count (sum of weights)
        self._compactions = 0

    # --- building ----------------------------------------------------------

    def add(self, values: np.ndarray) -> "QuantileSketch":
        v = np.asarray(values, dtype=np.float64)
        if v.size == 0:
            return self
        if not self.levels:
            self.levels.append(v.copy())
        else:
            self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += v.size
        self._compress()
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        for i, lv in enumerate(other.levels):
            if lv.size == 0:
                continue
            while len(self.levels) <= i:
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._compactions += other._compactions
        self._compress()
        return self

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            lv = self.levels[i]
            if lv.size > self.k:
                lv = np.sort(lv, kind="stable")
                parity = self._compactions & 1
                self._compactions += 1
                npairs = lv.size // 2
                pairs = lv[:2 * npairs].reshape(npairs, 2)
                promoted = pairs[:, parity]   # one survivor per sorted pair,
                #                               weight doubles; parity
                #                               alternates (derandomized KLL)
                self.levels[i] = lv[2 * npairs:]   # unpaired tail stays
                while len(self.levels) <= i + 1:
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], promoted])
            i += 1

    # --- queries -----------------------------------------------------------

    def _items(self) -> tuple[np.ndarray, np.ndarray]:
        """(sorted values, weights) of the summary multiset."""
        vs, ws = [], []
        for i, lv in enumerate(self.levels):
            if lv.size:
                vs.append(lv)
                ws.append(np.full(lv.size, 1 << i, dtype=np.float64))
        if not vs:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._items()
        if v.size == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(idx, v.size - 1)])

    def rank(self, x: float) -> float:
        """Estimated count of items <= x."""
        v, w = self._items()
        if v.size == 0:
            return 0.0
        idx = int(np.searchsorted(v, x, side="right"))
        return float(np.sum(w[:idx]))

    def median_mad(self) -> tuple[float, float]:
        """(median, MAD) from this one sketch: MAD via bisection on the
        half-width t whose centered interval [med-t, med+t] covers half the
        mass — no second pass over the data."""
        v, _ = self._items()
        if v.size == 0:
            return float("nan"), float("nan")
        med = self.quantile(0.5)
        lo, hi = 0.0, float(max(v[-1] - med, med - v[0], 0.0))
        if hi == 0.0:
            return med, 0.0
        half = 0.5 * self.n
        for _ in range(60):
            t = 0.5 * (lo + hi)
            covered = self.rank(med + t) - self.rank(med - t - 1e-12)
            if covered >= half:
                hi = t
            else:
                lo = t
        return med, hi

    # --- Arrow transport ---------------------------------------------------

    def to_arrays(self) -> tuple[np.ndarray, np.ndarray, int]:
        """(values, level ids, n) — flat arrays for list-column packing."""
        if not self.levels or not any(lv.size for lv in self.levels):
            return np.empty(0), np.empty(0, dtype=np.int32), self.n
        vals = np.concatenate(self.levels)
        lvl = np.concatenate([np.full(lv.size, i, dtype=np.int32)
                              for i, lv in enumerate(self.levels)])
        return vals, lvl, self.n

    @classmethod
    def from_arrays(cls, vals: np.ndarray, lvl: np.ndarray, n: int,
                    k: int = 256) -> "QuantileSketch":
        s = cls(k)
        if len(vals):
            top = int(lvl.max())
            s.levels = [np.asarray(vals[lvl == i], dtype=np.float64)
                        for i in range(top + 1)]
        s.n = int(n)
        return s


_SKETCH_SCHEMA = pa.schema([
    ("bucket", pa.int32()),
    ("lang", pa.string()),
    ("vals", pa.list_(pa.float64())),
    ("lvls", pa.list_(pa.int32())),
    ("n", pa.int64()),
])


def lang_sketch_stats(scored_ds, flags_ref, dedup: str, alive_mask_fn,
                      nbuckets: int, k: int = 256) -> dict:
    """Sketch-based per-language (median, MAD): one QuantileSketch per
    (block, lang) through the bucket exchange, merged per language on the
    reduce side. Same call shape as the exact path in decide.lang_stats."""
    import zlib

    from ..functions.broadcast import cached_get
    from ..stages.exchange import bucket_exchange

    def packed(batch: pa.Table) -> pa.Table:
        mask = alive_mask_fn(batch, cached_get(flags_ref), dedup)
        alive = batch.filter(pa.array(mask)).select(["lang", "ppl"])
        if alive.num_rows == 0:
            return _SKETCH_SCHEMA.empty_table()
        langs = alive["lang"].to_numpy(zero_copy_only=False)
        ppl = alive["ppl"].to_numpy(zero_copy_only=False)
        order = np.argsort(langs, kind="stable")
        ls, starts = np.unique(langs[order], return_index=True)
        bounds = np.append(starts, len(order))
        rows = {"bucket": [], "lang": [], "vals": [], "lvls": [], "n": []}
        for j, lang in enumerate(ls):
            sk = QuantileSketch(k).add(ppl[order][bounds[j]:bounds[j + 1]])
            vals, lvls, n = sk.to_arrays()
            rows["bucket"].append(zlib.crc32(lang.encode("utf-8")) % nbuckets)
            rows["lang"].append(lang)
            rows["vals"].append(vals)
            rows["lvls"].append(lvls)
            rows["n"].append(n)
        return pa.table({
            "bucket": pa.array(rows["bucket"], pa.int32()),
            "lang": pa.array(rows["lang"], pa.string()),
            "vals": pa.array([v.tolist() for v in rows["vals"]],
                             pa.list_(pa.float64())),
            "lvls": pa.array([v.tolist() for v in rows["lvls"]],
                             pa.list_(pa.int32())),
            "n": pa.array(rows["n"], pa.int64()),
        })

    def reduce_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        langs_out, med_out, mad_out = [], [], []
        for lang in pc.unique(t["lang"]).to_pylist():
            sub = t.filter(pc.equal(t["lang"], lang))
            merged = QuantileSketch(k)
            for vals, lvls, n in zip(sub["vals"].to_pylist(),
                                     sub["lvls"].to_pylist(),
                                     sub["n"].to_pylist()):
                merged.merge(QuantileSketch.from_arrays(
                    np.asarray(vals), np.asarray(lvls, dtype=np.int32), n, k))
            med, mad = merged.median_mad()
            langs_out.append(lang); med_out.append(med); mad_out.append(mad)
        return pa.table({"lang": pa.array(langs_out, pa.string()),
                         "median": pa.array(med_out, pa.float64()),
                         "mad": pa.array(mad_out, pa.float64())})

    ds = scored_ds.map_batches(packed, batch_format="pyarrow",
                               batch_size=None)
    out = {}
    for t in bucket_exchange(ds, nbuckets, reduce_bucket):
        for lang, med, mad in zip(t["lang"].to_pylist(),
                                  t["median"].to_pylist(),
                                  t["mad"].to_pylist()):
            out[lang] = (med, mad)
    return out

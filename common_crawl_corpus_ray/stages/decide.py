"""Stage 3: wide ops (dedup + per-language stats) and the final decision.

The only all-to-all exchanges in the whole pipeline live here, and both run
over a *slim* projection (never over audio bytes):

  * exact dedup (cc_corpus.py:338-349 keep-first semantics, made
    deterministic: winner = min clip_id per text_hash, SURVEY.md D2):
    per-block partial aggregates (one (hash, min_id, n) triple per
    distinct hash, packed into one list-row per coarse text_hash bucket)
    go through the manual bucket exchange (``exchange.py``); each bucket
    task keeps only multi-member groups. The resulting {hash: winner} map
    covers *duplicate groups only* and is broadcast back via ray.put
    (map-side anti-join). Scale path: if the dup-group map outgrows a
    broadcast, hash-partition both sides on text_hash and flag inside
    per-bucket joins instead.
  * per-language perplexity median/MAD (outlier_detection.py:95-113):
    packed (lang, ppl-list) partials through the same exchange, exact
    stats per language on the reduce side (the reference also holds the
    full per-corpus ppl column in memory there; a P2/KLL sketch is the
    documented approximation path at 10^12 rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import spec


_DUP_PARTIAL_SCHEMA = pa.schema([
    ("bucket", pa.int32()),
    ("h", pa.list_(pa.int64())),
    ("mid", pa.list_(pa.string())),
    ("n", pa.list_(pa.int64())),
])


def _rules_pass_pairs(batch: pa.Table) -> pa.Table:
    """Per-batch partial aggregate for dedup, packed for the exchange: the
    per-distinct-hash (hash, min_id, n) triples of this batch are grouped
    into ONE list-valued row per coarse bucket. The shuffle then moves a
    few thousand packed rows instead of one row per distinct hash — same
    bytes, ~none of the per-row shuffle overhead."""
    import pyarrow.compute as pc
    mask = pc.equal(batch["rule_reason"], spec.KEEP_REASON)
    slim = batch.filter(mask).select(["text_hash", "clip_id"])
    if slim.num_rows == 0:
        return _DUP_PARTIAL_SCHEMA.empty_table()
    g = slim.group_by("text_hash").aggregate([("clip_id", "min"), ("clip_id", "count")])
    h = g["text_hash"].to_numpy()
    bucket = (h & (_DUP_BUCKETS - 1)).astype(np.int32)
    order = np.argsort(bucket, kind="stable")
    bs, starts = np.unique(bucket[order], return_index=True)
    offsets = pa.array(np.append(starts, len(order)).astype(np.int32))
    take = pa.array(order)
    return pa.table({
        "bucket": pa.array(bs, pa.int32()),
        "h": pa.ListArray.from_arrays(offsets, pa.array(h[order], pa.int64())),
        "mid": pa.ListArray.from_arrays(
            offsets, g["clip_id_min"].take(take).combine_chunks()),
        "n": pa.ListArray.from_arrays(
            offsets, g["clip_id_count"].take(take).combine_chunks()),
    })


_DUP_BUCKETS = 32
_LANG_BUCKETS = 8


def dup_winner_map(scored_ds) -> dict[int, str]:
    """{text_hash: winning clip_id} for duplicate groups only (count > 1).

    Shuffle shape: per-batch partials (one packed list-row per coarse
    ``bucket = text_hash % P`` per block, see ``_rules_pass_pairs``) go
    through a manual map-side-split bucket exchange (``exchange.py`` — Ray
    Data's sort-based groupby costs ~12s of pure sort machinery on these
    few-thousand fat rows, the manual exchange ~4s), and each bucket task
    merges its hashes with one vectorized Arrow ``group_by``, emitting
    only multi-member groups. NOT ``map_groups`` per hash: that costs
    ~1ms of Python per group (measured 47.6s vs 6.3s on 43k groups in
    this sandbox)."""
    import pyarrow.compute as pc

    from .exchange import bucket_exchange

    def merge_bucket(g: pa.Table) -> pa.Table:
        flat = pa.table({"text_hash": pc.list_flatten(g["h"]),
                         "min_id": pc.list_flatten(g["mid"]),
                         "n": pc.list_flatten(g["n"])})
        m = flat.group_by("text_hash").aggregate([("min_id", "min"), ("n", "sum")])
        m = m.filter(pc.greater(m["n_sum"], 1))
        return m.select(["text_hash", "min_id_min"]).rename_columns(
            ["text_hash", "winner"])

    partials = scored_ds.map_batches(_rules_pass_pairs, batch_format="pyarrow",
                                     batch_size=None)
    out = {}
    for t in bucket_exchange(partials, _DUP_BUCKETS, merge_bucket):
        out.update(zip(t["text_hash"].to_pylist(), t["winner"].to_pylist()))
    return out


def lang_stats(scored_ds, dupmap_ref) -> dict[str, tuple[float, float]]:
    """Exact per-language (median, MAD) of ppl over still-alive rows.

    The exchange is packed: each block contributes one (lang, ppl-list)
    row per language instead of one row per clip — same bytes through the
    shuffle, a few thousand rows instead of millions — and moves through
    the manual bucket exchange (``exchange.py``, bucket = crc32(lang) % P;
    see ``dup_winner_map`` for why not Ray Data groupby). Exact medians
    need every value on the reduce side (the reference holds the full
    column in memory too, outlier_detection.py:98); a P2/KLL sketch is the
    documented approximation path at 10^12 rows."""
    import zlib

    from .exchange import bucket_exchange

    nb = _LANG_BUCKETS

    def alive_ppl_packed(batch: pa.Table) -> pa.Table:
        import ray
        mask = _alive_mask(batch, _DupIndex(ray.get(dupmap_ref)))
        alive = batch.filter(pa.array(mask)).select(["lang", "ppl"])
        if alive.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "lang": pa.array([], pa.string()),
                             "vals": pa.array([], pa.list_(pa.float64()))})
        langs = alive["lang"].to_numpy(zero_copy_only=False)
        ppl = alive["ppl"].to_numpy(zero_copy_only=False)
        order = np.argsort(langs, kind="stable")
        ls, starts = np.unique(langs[order], return_index=True)
        offsets = pa.array(np.append(starts, len(order)).astype(np.int32))
        bucket = [zlib.crc32(l.encode("utf-8")) % nb for l in ls]
        return pa.table({
            "bucket": pa.array(bucket, pa.int32()),
            "lang": pa.array(ls, pa.string()),
            "vals": pa.ListArray.from_arrays(
                offsets, pa.array(ppl[order], pa.float64()))})

    def stats_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        langs_out, med_out, mad_out = [], [], []
        for lang in pc.unique(t["lang"]).to_pylist():
            sub = t.filter(pc.equal(t["lang"], lang))
            x = pc.list_flatten(sub["vals"]).to_numpy()
            med = float(np.median(x))
            mad = float(np.median(np.abs(x - med)))
            langs_out.append(lang); med_out.append(med); mad_out.append(mad)
        return pa.table({"lang": pa.array(langs_out, pa.string()),
                         "median": pa.array(med_out, pa.float64()),
                         "mad": pa.array(mad_out, pa.float64())})

    packed = scored_ds.map_batches(alive_ppl_packed, batch_format="pyarrow",
                                   batch_size=None)
    out = {}
    for t in bucket_exchange(packed, nb, stats_bucket):
        for lang, med, mad in zip(t["lang"].to_pylist(),
                                  t["median"].to_pylist(),
                                  t["mad"].to_pylist()):
            out[lang] = (med, mad)
    return out


class _DupIndex:
    """Vectorized membership test for the broadcast dup-winner map: sorted
    hash array + parallel winner array; per batch one ``searchsorted``
    instead of a Python dict lookup per row."""

    def __init__(self, dupmap: dict[int, str]):
        items = sorted(dupmap.items())
        self.hashes = np.fromiter((h for h, _ in items), dtype=np.int64,
                                  count=len(items))
        self.winners = np.array([w for _, w in items], dtype=object)

    def loser_mask(self, hashes: np.ndarray, ids: np.ndarray) -> np.ndarray:
        """True where the row's hash is a dup group and the row is not its
        winner (i.e. the row would be dropped by keep-first dedup)."""
        if self.hashes.size == 0:
            return np.zeros(len(hashes), dtype=bool)
        idx = np.clip(np.searchsorted(self.hashes, hashes), 0,
                      self.hashes.size - 1)
        in_group = self.hashes[idx] == hashes
        return in_group & (self.winners[idx] != ids)

    def member_mask(self, hashes: np.ndarray) -> np.ndarray:
        """True for every member of a dup group, winner included (= the
        rows dropped by keep-none dedup, deduplication.py:97-104)."""
        if self.hashes.size == 0:
            return np.zeros(len(hashes), dtype=bool)
        idx = np.clip(np.searchsorted(self.hashes, hashes), 0,
                      self.hashes.size - 1)
        return self.hashes[idx] == hashes


def _rules_pass_mask(batch: pa.Table) -> np.ndarray:
    import pyarrow.compute as pc
    return pc.equal(batch["rule_reason"], spec.KEEP_REASON).to_numpy(
        zero_copy_only=False)


def _alive_mask(batch: pa.Table, dup_index: "_DupIndex") -> np.ndarray:
    """Rows that survive rules + LID agreement + dedup."""
    rules_pass = _rules_pass_mask(batch)
    agree = batch["lang_agree"].to_numpy(zero_copy_only=False)
    hashes = batch["text_hash"].to_numpy(zero_copy_only=False)
    ids = batch["clip_id"].to_numpy(zero_copy_only=False)
    return rules_pass & agree & ~dup_index.loser_mask(hashes, ids)


class DecideStage:
    """Final decision map: broadcasts the dup map + per-lang stats once per
    actor, emits is_dup / z_score / ppl_bucket / drop_reason / keep."""

    def __init__(self, dupmap_ref, stats: dict[str, tuple[float, float]],
                 z_cut: float = spec.Z_CUT, dedup: str = "first"):
        import ray
        dupmap = ray.get(dupmap_ref) if not isinstance(dupmap_ref, dict) else dupmap_ref
        self.dup_index = _DupIndex(dupmap)
        self.stats = stats
        self.z_cut = z_cut
        self.dedup = dedup

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        agree = batch["lang_agree"].to_numpy(zero_copy_only=False)
        hashes = batch["text_hash"].to_numpy(zero_copy_only=False)
        ids = batch["clip_id"].to_numpy(zero_copy_only=False)
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        ppl = batch["ppl"].to_numpy(zero_copy_only=False)

        rules_pass = _rules_pass_mask(batch)
        if self.dedup == "first":
            is_dup = self.dup_index.loser_mask(hashes, ids)
        elif self.dedup == "none":
            is_dup = self.dup_index.member_mask(hashes)
        else:                           # "off"
            is_dup = np.zeros(n, dtype=bool)
        is_dup &= rules_pass            # dup flag defined among rules-pass rows
        alive = rules_pass & agree & ~is_dup

        z = np.zeros(n, dtype=np.float64)
        bucket = np.full(n, "IN", dtype=object)
        for lang, (med, mad) in self.stats.items():
            m = alive & (langs == lang)
            if mad != 0.0 and m.any():
                z[m] = spec.Z_SCALE * (ppl[m] - med) / mad
        bucket[z > self.z_cut] = "HIGH"
        bucket[z < -self.z_cut] = "LOW"
        bucket[~alive] = "IN"           # bucket only meaningful for alive rows
        z[~alive] = 0.0

        reason = np.array(batch["rule_reason"].to_pylist(), dtype=object)
        blank = reason == spec.KEEP_REASON
        reason[blank & ~agree] = "lid_disagree"
        blank = reason == spec.KEEP_REASON
        reason[blank & is_dup] = "dup"
        blank = reason == spec.KEEP_REASON
        reason[blank & (bucket != "IN")] = "ppl_outlier"
        keep = reason == spec.KEEP_REASON

        batch = batch.append_column("is_dup", pa.array(is_dup))
        batch = batch.append_column("z_score", pa.array(z, pa.float64()))
        batch = batch.append_column("ppl_bucket", pa.array(bucket, pa.string()))
        batch = batch.append_column("drop_reason", pa.array(reason, pa.string()))
        batch = batch.append_column("keep", pa.array(keep))
        return batch

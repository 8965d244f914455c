"""Stage 3: wide ops (dedup + per-language stats) and the final decision.

The only all-to-all exchanges in the whole pipeline live here, and both run
over a *slim* projection (never over audio bytes):

  * exact dedup (cc_corpus.py:338-349 keep-first semantics, made
    deterministic: winner = min clip_id per text_hash, SURVEY.md D2):
    per-block (text_hash, clip_id) member rows of rules-pass clips, packed
    into one list-row per coarse text_hash bucket, go through the manual
    bucket exchange (``exchange.py``); each bucket task keeps only
    multi-member groups and emits per-member dup flags. Those per-bucket
    flag tables stay in the object store as refs; the driver then picks:
      - dup volume <= ``dup_broadcast_max``: fetch into a {hash: winner}
        broadcast map (``_DupIndex``, map-side anti-join), or
      - above it: sort the flags by clip_id into a keyed lancelite side
        table (``write_dup_flags``) and flag inside per-batch range-indexed
        lookups (``KeyedDupFlags``) — bounded memory at any dup count.
  * per-language perplexity median/MAD (outlier_detection.py:95-113):
    packed (lang, ppl-list) partials through the same exchange, exact
    stats per language on the reduce side; above ``sketch_min_rows`` per
    language the packed values are replaced by mergeable quantile sketches
    (``functions/sketch.py``) so no reducer ever holds a skewed language's
    full column (English at 10^12 rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import spec
from ..functions.broadcast import cached_get
from ..sources.keyed import KeyedBatchJoiner

_DUP_BUCKETS = 32
_LANG_BUCKETS = 8


def scaled_buckets(n_rows: int | None, rows_per_bucket: int = 8_000_000,
                   lo: int = _DUP_BUCKETS, hi: int = 1024) -> int:
    """Power-of-2 bucket count targeting ~``rows_per_bucket`` rows per
    reduce task. A FIXED bucket constant makes per-reduce memory O(N/P)
    — it grows with table size (ADVICE round 2); scaling the count with
    the known input row count keeps each reduce task's working set
    bounded. Power of 2 so ``hash & (nb - 1)`` bucketing stays valid."""
    import math
    if n_rows is None or n_rows <= 0:
        return lo
    want = max(lo, (n_rows + rows_per_bucket - 1) // rows_per_bucket)
    return min(hi, 1 << math.ceil(math.log2(want)))

_MEMBER_PARTIAL_SCHEMA = pa.schema([
    ("bucket", pa.int32()),
    ("h", pa.list_(pa.int64())),
    ("id", pa.list_(pa.string())),
])

FLAGS_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("text_hash", pa.int64()),
    ("is_loser", pa.bool_()),
])


def _rules_pass_members(batch: pa.Table, nbuckets: int = _DUP_BUCKETS) -> pa.Table:
    """Per-batch packed partial for dedup: the (text_hash, clip_id) member
    rows of rules-pass clips, grouped into ONE list-valued row per coarse
    bucket. The shuffle then moves a few thousand packed rows instead of
    one row per clip — same bytes, ~none of the per-row shuffle overhead."""
    import pyarrow.compute as pc
    mask = pc.equal(batch["rule_reason"], spec.KEEP_REASON)
    slim = batch.filter(mask).select(["text_hash", "clip_id"])
    if slim.num_rows == 0:
        return _MEMBER_PARTIAL_SCHEMA.empty_table()
    h = slim["text_hash"].to_numpy()
    bucket = (h & (nbuckets - 1)).astype(np.int32)
    order = np.argsort(bucket, kind="stable")
    bs, starts = np.unique(bucket[order], return_index=True)
    offsets = pa.array(np.append(starts, len(order)).astype(np.int32))
    return pa.table({
        "bucket": pa.array(bs, pa.int32()),
        "h": pa.ListArray.from_arrays(offsets, pa.array(h[order], pa.int64())),
        "id": pa.ListArray.from_arrays(
            offsets, slim["clip_id"].take(pa.array(order)).combine_chunks()),
    })


def _flags_bucket(g: pa.Table) -> pa.Table:
    """Per-bucket reduce: keep multi-member hash groups only, emit one flag
    row per member (is_loser = not the min-clip_id winner). One numpy
    lexsort pass — NOT map_groups per hash (~1ms Python per group, measured
    47.6s vs 6.3s on 43k groups), and NOT an Acero group_by+join (Acero
    multi-threads inside every reduce task; with one task per bucket
    already saturating the cluster that oversubscription measurably hurt
    the 32-cpu scaling run)."""
    import pyarrow.compute as pc
    h = pc.list_flatten(g["h"]).to_numpy()
    ids = pc.list_flatten(g["id"]).to_numpy(zero_copy_only=False)
    if h.size == 0:
        return FLAGS_SCHEMA.empty_table()
    # int64 hash sort first (numpy C speed); the expensive object-string
    # id sort runs only over the dup-group member SUBSET (dup_rate x n,
    # not n — string compares are Python-level and dominate otherwise)
    order = np.argsort(h, kind="stable")
    hs, idss = h[order], ids[order]
    starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
    counts = np.diff(np.r_[starts, hs.size])
    in_dup = np.repeat(counts > 1, counts)
    if not in_dup.any():
        return FLAGS_SCHEMA.empty_table()
    sub_h, sub_id = hs[in_dup], idss[in_dup]
    sub = np.lexsort((sub_id, sub_h))     # by hash, then id ascending
    sh, sid = sub_h[sub], sub_id[sub]
    sstarts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
    is_winner = np.zeros(sh.size, dtype=bool)
    is_winner[sstarts] = True             # first of each group = min id
    return pa.table({
        "clip_id": pa.array(sid, pa.string()),
        "text_hash": pa.array(sh, pa.int64()),
        "is_loser": pa.array(~is_winner),
    }).cast(FLAGS_SCHEMA)


def dup_flags_refs(scored_ds, nbuckets: int | None = None) -> list:
    """Object-store refs of per-bucket dup-flag tables (FLAGS_SCHEMA rows
    for dup-group members only). The driver never touches the rows —
    compose with :func:`dup_winner_map` (small) or :func:`write_dup_flags`
    (scale). ``nbuckets`` should come from :func:`scaled_buckets` when the
    caller knows the row count (decide_from_scored does) so each reduce
    task's member set stays bounded at any table size."""
    from .exchange import bucket_exchange_refs
    nb = nbuckets or _DUP_BUCKETS

    def members(batch: pa.Table) -> pa.Table:
        return _rules_pass_members(batch, nb)

    partials = scored_ds.map_batches(members, batch_format="pyarrow",
                                     batch_size=None)
    return bucket_exchange_refs(partials, nb, _flags_bucket)


def dup_winner_map(scored_ds=None, *, flags_refs=None) -> dict[int, str]:
    """{text_hash: winning clip_id} for duplicate groups only (count > 1).
    Driver-resident — use only when the dup-group volume is broadcastable
    (decide_from_scored enforces the threshold)."""
    import pyarrow.compute as pc
    import ray
    refs = flags_refs if flags_refs is not None else dup_flags_refs(scored_ds)
    out: dict[int, str] = {}
    for t in ray.get(refs):
        if t is None or t.num_rows == 0:
            continue
        w = t.filter(pc.invert(t["is_loser"].combine_chunks()))
        out.update(zip(w["text_hash"].to_pylist(), w["clip_id"].to_pylist()))
    return out


def write_dup_flags(flags_refs, uri: str):
    """Scale path: sort the distributed flag tables by clip_id and commit
    them as a keyed lancelite side table; returns its KeyedFragmentIndex.
    Memory per task is one bucket's flags; the driver holds only paths and
    range bounds."""
    from ..sources import keyed, lancelite
    from .exchange import refs_to_dataset
    ds = refs_to_dataset(flags_refs, FLAGS_SCHEMA.empty_table())
    ds = ds.sort("clip_id")
    lancelite.write_dataset(ds, uri, key_stats="clip_id")
    return keyed.KeyedFragmentIndex(uri, "clip_id")


class KeyedDupFlags:
    """Range-indexed dup-flag lookups (the beyond-broadcast dedup path).
    Same mask API as ``_DupIndex``; flags load lazily per batch from the
    keyed side table, bounded by the joiner's LRU."""

    def __init__(self, index, max_cached: int = 8):
        self.index = index
        self.max_cached = max_cached
        self._joiner = None

    def _j(self):
        if self._joiner is None:
            # KeyedBatchJoiner is imported at module scope: this method
            # runs on workers, where package imports only resolve through
            # the pickle-by-value shipping of this module's globals
            self._joiner = KeyedBatchJoiner(
                self.index, columns=["clip_id", "is_loser"],
                max_cached=self.max_cached)
        return self._joiner

    def loser_mask(self, hashes: np.ndarray, ids: np.ndarray) -> np.ndarray:
        idx, found, stable = self._j().probe(ids)
        out = np.zeros(len(ids), dtype=bool)
        if stable is not None and found.any():
            vals = stable["is_loser"].take(pa.array(idx[found])).to_numpy(
                zero_copy_only=False)
            out[found] = vals.astype(bool)
        return out

    def member_mask(self, hashes: np.ndarray, ids: np.ndarray) -> np.ndarray:
        _idx, found, _stable = self._j().probe(ids)
        return found


def lang_stats(scored_ds, flags_ref, dedup: str = "first",
               method: str = "exact") -> dict[str, tuple[float, float]]:
    """Per-language (median, MAD) of ppl over still-alive rows.

    "Alive" honors the dedup mode (keep-first drops losers only; keep-none
    drops every dup-group member before the stats — deduplication.py:97-104
    reference semantics).

    The exchange is packed: each block contributes one (lang, ppl-list)
    row per language instead of one row per clip — same bytes through the
    shuffle, a few thousand rows instead of millions — and moves through
    the manual bucket exchange (``exchange.py``, bucket = crc32(lang) % P;
    see ``dup_winner_map`` for why not Ray Data groupby).

    ``method="exact"`` computes true medians on the reduce side (the
    reference holds the full per-corpus ppl column in memory there,
    outlier_detection.py:98). ``method="sketch"`` packs a mergeable
    quantile sketch per (block, lang) instead of raw values, so a skewed
    language (English at 10^12 rows) never lands its full column on one
    reducer — bytes through the shuffle become O(blocks x langs x sketch),
    independent of row count."""
    import zlib

    from .exchange import bucket_exchange

    if method == "sketch":
        from ..functions.sketch import lang_sketch_stats
        return lang_sketch_stats(scored_ds, flags_ref, dedup,
                                 _alive_mask, _LANG_BUCKETS)

    nb = _LANG_BUCKETS

    def alive_ppl_packed(batch: pa.Table) -> pa.Table:
        mask = _alive_mask(batch, cached_get(flags_ref), dedup)
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

    def member_mask(self, hashes: np.ndarray, ids: np.ndarray) -> np.ndarray:
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


def _alive_mask(batch: pa.Table, flags, dedup: str = "first") -> np.ndarray:
    """Rows that survive rules + LID agreement + the dedup mode's drop set.
    ``flags`` is a ``_DupIndex`` or ``KeyedDupFlags``."""
    rules_pass = _rules_pass_mask(batch)
    agree = batch["lang_agree"].to_numpy(zero_copy_only=False)
    alive = rules_pass & agree
    if dedup == "off":
        return alive
    hashes = batch["text_hash"].to_numpy(zero_copy_only=False)
    ids = batch["clip_id"].to_numpy(zero_copy_only=False)
    if dedup == "none":
        return alive & ~flags.member_mask(hashes, ids)
    return alive & ~flags.loser_mask(hashes, ids)


class DecideStage:
    """Final decision map: resolves the dup flags (broadcast map or keyed
    side table) + per-lang stats once per actor, emits is_dup / z_score /
    ppl_bucket / drop_reason / keep."""

    def __init__(self, flags_ref, stats: dict[str, tuple[float, float]],
                 z_cut: float = spec.Z_CUT, dedup: str = "first"):
        flags = cached_get(flags_ref)
        self.flags = _DupIndex(flags) if isinstance(flags, dict) else flags
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
            is_dup = self.flags.loser_mask(hashes, ids)
        elif self.dedup == "none":
            is_dup = self.flags.member_mask(hashes, ids)
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

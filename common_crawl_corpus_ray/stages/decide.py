"""Stage 3: wide ops (dedup + per-language stats) and the final decision.

The only all-to-all exchanges in the whole pipeline live here, and both run
over a *slim* projection (never over audio bytes):

  * exact dedup (cc_corpus.py:338-349 keep-first semantics, made
    deterministic: winner = min clip_id per text_hash, SURVEY.md D2):
    ``groupby(text_hash)`` over (clip_id, text_hash) pairs of rules-pass
    rows, pre-aggregated per batch so the shuffle moves one row per
    distinct hash per block, then only multi-member groups are kept.
    The resulting {hash: winner} map covers *duplicate groups only* and is
    broadcast back via ray.put (map-side anti-join). Scale path: if the
    dup-group map outgrows a broadcast, hash-partition both sides on
    text_hash and flag inside per-bucket joins instead.
  * per-language perplexity median/MAD (outlier_detection.py:95-113):
    ``groupby(lang)`` over (lang, ppl) of still-alive rows, exact stats per
    group via map_groups (the reference also holds the full per-corpus ppl
    column in memory there; a P2/KLL sketch is the documented approximation
    path at 10^12 rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import spec


def _rules_pass_pairs(batch: pa.Table) -> pa.Table:
    """Per-batch partial aggregate for dedup: one (hash, min_id, n) row per
    distinct text_hash among rules-pass rows of this batch."""
    import pyarrow.compute as pc
    mask = pc.equal(batch["rule_reason"], spec.KEEP_REASON)
    slim = batch.filter(mask).select(["text_hash", "clip_id"])
    if slim.num_rows == 0:
        return pa.table({"text_hash": pa.array([], pa.int64()),
                         "min_id": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    g = slim.group_by("text_hash").aggregate([("clip_id", "min"), ("clip_id", "count")])
    return g.rename_columns(["text_hash", "min_id", "n"])


def dup_winner_map(scored_ds) -> dict[int, str]:
    """{text_hash: winning clip_id} for duplicate groups only (count > 1).

    Native vectorized ``aggregate`` (hash-based), NOT ``map_groups``:
    map_groups costs ~1ms of Python per group, which at one group per
    distinct text is minutes at 10^5 rows and unusable beyond (measured
    47.6s vs 6.3s on 43k groups in this sandbox)."""
    from ray.data.aggregate import Min, Sum

    partials = scored_ds.map_batches(_rules_pass_pairs, batch_format="pyarrow")
    agg = partials.groupby("text_hash").aggregate(Min("min_id"), Sum("n"))
    out = {}
    for b in agg.iter_batches(batch_size=65536, batch_format="pyarrow"):
        import pyarrow.compute as pc
        dup = b.filter(pc.greater(b["sum(n)"], 1))
        out.update(zip(dup["text_hash"].to_pylist(), dup["min(min_id)"].to_pylist()))
    return out


def lang_stats(scored_ds, dupmap_ref) -> dict[str, tuple[float, float]]:
    """Exact per-language (median, MAD) of ppl over still-alive rows."""

    def alive_pairs(batch: pa.Table) -> pa.Table:
        import ray
        import pyarrow.compute as pc
        dupmap = ray.get(dupmap_ref)
        mask = _alive_mask(batch, dupmap)
        return batch.filter(pa.array(mask)).select(["lang", "ppl"])

    def stats(group: pd.DataFrame) -> pd.DataFrame:
        x = group["ppl"].to_numpy()
        med = float(np.median(x))
        mad = float(np.median(np.abs(x - med)))
        return pd.DataFrame({"lang": [group["lang"].iloc[0]],
                             "median": [med], "mad": [mad]})

    res = (scored_ds.map_batches(alive_pairs, batch_format="pyarrow")
           .groupby("lang").map_groups(stats, batch_format="pandas"))
    return {r["lang"]: (r["median"], r["mad"]) for r in res.take_all()}


def _alive_mask(batch: pa.Table, dupmap: dict[int, str]) -> np.ndarray:
    """Rows that survive rules + LID agreement + dedup."""
    rules_pass = np.array([r == spec.KEEP_REASON
                           for r in batch["rule_reason"].to_pylist()])
    agree = batch["lang_agree"].to_numpy(zero_copy_only=False)
    hashes = batch["text_hash"].to_pylist()
    ids = batch["clip_id"].to_pylist()
    not_dup = np.array([not (h in dupmap and i != dupmap[h])
                        for h, i in zip(hashes, ids)])
    return rules_pass & agree & not_dup


class DecideStage:
    """Final decision map: broadcasts the dup map + per-lang stats once per
    actor, emits is_dup / z_score / ppl_bucket / drop_reason / keep."""

    def __init__(self, dupmap_ref, stats: dict[str, tuple[float, float]]):
        import ray
        self.dupmap = ray.get(dupmap_ref) if not isinstance(dupmap_ref, dict) else dupmap_ref
        self.stats = stats

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        rule_reason = batch["rule_reason"].to_pylist()
        agree = batch["lang_agree"].to_numpy(zero_copy_only=False)
        hashes = batch["text_hash"].to_pylist()
        ids = batch["clip_id"].to_pylist()
        langs = batch["lang"].to_pylist()
        ppl = batch["ppl"].to_numpy(zero_copy_only=False)

        dupmap = self.dupmap
        is_dup = np.array([h in dupmap and i != dupmap[h]
                           for h, i in zip(hashes, ids)], dtype=bool) if n else np.zeros(0, bool)
        rules_pass = np.array([r == spec.KEEP_REASON for r in rule_reason], dtype=bool)
        is_dup &= rules_pass            # dup flag defined among rules-pass rows
        alive = rules_pass & agree & ~is_dup

        z = np.zeros(n, dtype=np.float64)
        bucket = np.full(n, "IN", dtype=object)
        stats = self.stats
        for lang, (med, mad) in stats.items():
            m = alive & (np.array(langs, dtype=object) == lang)
            if mad != 0.0 and m.any():
                z[m] = spec.Z_SCALE * (ppl[m] - med) / mad
        bucket[z > spec.Z_CUT] = "HIGH"
        bucket[z < -spec.Z_CUT] = "LOW"
        bucket[~alive] = "IN"           # bucket only meaningful for alive rows
        z[~alive] = 0.0

        reason = np.array(rule_reason, dtype=object)
        blank = reason == spec.KEEP_REASON
        reason[blank & ~agree] = "lid_disagree"
        blank = reason == spec.KEEP_REASON
        reason[blank & is_dup] = "dup"
        blank = reason == spec.KEEP_REASON
        reason[blank & (bucket != "IN")] = "ppl_outlier"
        keep = reason == spec.KEEP_REASON

        batch = batch.append_column("is_dup", pa.array(is_dup))
        batch = batch.append_column("z_score", pa.array(z, pa.float64()))
        batch = batch.append_column("ppl_bucket", pa.array([str(x) for x in bucket], pa.string()))
        batch = batch.append_column("drop_reason", pa.array([str(x) for x in reason], pa.string()))
        batch = batch.append_column("keep", pa.array(keep.tolist(), pa.bool_()))
        return batch

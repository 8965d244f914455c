"""The flagship pipeline: LID + quality-filter + scrub over a clips table.

Ray Data shape (SURVEY.md section 3.1), with the key scale decision that
audio payloads NEVER enter a scoring stage or a shuffle:

    clips.select(clip_id, transcript) ──────────────────┐ narrow, streaming
      map_batches(scrub_rules_batch)          [tasks]   │ phase A
      map_batches(TranscriptScorer)           [actors]  │ (transcripts only,
      materialize / lancelite checkpoint ───────────────┘  ~1KB/row blocks)
    dup flags      : member-level bucket exchange        ┐ wide, slim only
    lang_stats     : packed (lang, ppl) exchange         ┘ phase B
    map_batches(DecideStage)  → decision table (no bytes)  phase C
    decisions → keyed lancelite table (per-fragment clip_id ranges);
    clips (full rows) map-join against it, loading only the overlapping
    decision fragments per batch — one streaming pass that re-reads
    payload columns exactly once                           phase D

Phase D is a *range-partitioned* map-join: decisions are written with
per-fragment [min, max] clip_id stats (``lancelite.write_dataset
(key_stats=...)``); phases A-C preserve block lineage, so each decision
fragment covers a narrow clip_id range matching an input fragment, and an
AttachDecisions actor touches O(1) fragments per batch (LRU-bounded). No
whole-table broadcast, no driver materialization — memory is bounded at any
table size. Phase B picks broadcast vs keyed dup flags by measured dup
volume, and exact vs sketched lang stats by a row-count threshold.
"""

from __future__ import annotations

import tempfile

import pyarrow as pa
import ray

from ..functions.broadcast import cached_get
from ..sources import keyed, lancelite
from ..stages.decide import (DecideStage, KeyedDupFlags, _DupIndex,
                             dup_flags_refs, dup_winner_map, lang_stats,
                             write_dup_flags)
from ..stages.scoring import TranscriptScorer
from ..stages.scrub_rules import scrub_rules_batch

SLIM_COLUMNS = ["clip_id", "text_hash", "rule_reason", "lang", "lang_agree", "ppl"]

DECISION_COLUMNS = [
    "clip_id", "transcript_scrubbed", "lang", "lang2", "lang_agree",
    "n_words", "text_hash", "is_dup", "log_prob", "ppl", "z_score",
    "ppl_bucket", "drop_reason", "keep",
]

FINAL_COLUMNS = [
    "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
    "transcript_scrubbed", "lang", "lang2", "lang_agree", "n_words",
    "text_hash", "is_dup", "log_prob", "ppl", "z_score", "ppl_bucket",
    "drop_reason", "keep",
]

# dup-flag rows (members of dup groups) above which the broadcast
# {hash: winner} map gives way to the keyed side-table join
DUP_BROADCAST_MAX = 2_000_000
# decision rows above which phase D's broadcast attach gives way to the
# keyed side-table join (decision rows are 1:1 with input clips, so the
# switch is known BEFORE executing phase D — no extra counting pass)
DEC_BROADCAST_MAX = 2_000_000
# alive rows above which per-language stats switch to the mergeable
# quantile sketch (exact medians below — fixture parity)
LANG_SKETCH_MIN_ROWS = 50_000_000


def _cfg(explicit, config, field, default):
    """Explicit kwargs win over config fields, which win over defaults
    (sentinel-None convention — a caller's run(..., attach_payload=False,
    config=cfg) must not be silently overridden by cfg)."""
    if explicit is not None:
        return explicit
    if config is not None:
        return getattr(config, field)
    return default


def score(ds, scorer_concurrency=(2, 8), batch_size: int = 1024,
          lid_agree_min_len: int | None = None):
    """Phase A: narrow scrub + rules + scoring over (clip_id, transcript)."""
    from ..functions import spec
    thr = spec.LID_AGREE_MIN_LEN if lid_agree_min_len is None else lid_agree_min_len
    return (ds
            .map_batches(scrub_rules_batch, batch_format="pyarrow",
                         batch_size=batch_size)
            .map_batches(TranscriptScorer, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=scorer_concurrency,
                         fn_constructor_args=(thr,), num_cpus=1))


def _cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def decide(scored_ds, flags_ref, stats: dict, batch_size: int = 1024,
           z_cut: float | None = None, dedup: str = "first"):
    """Phase C: final decision with dup flags (broadcast or keyed) +
    per-lang stats. Actor-pool width follows the cluster CPU count — a
    fixed cap starves this phase on larger clusters."""
    from ..functions import spec
    zc = spec.Z_CUT if z_cut is None else z_cut
    n_act = max(2, _cluster_cpus() - 2)
    return scored_ds.map_batches(
        DecideStage, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_args=(flags_ref, stats, zc, dedup),
        # fixed-size pool: an autoscaling pool starting at 1 ramps too
        # slowly for a short stage and the ramp is pure fixed cost
        concurrency=(n_act, n_act), num_cpus=1)


def build_dup_flags(slim_ds, dedup: str = "first",
                    dup_broadcast_max: int = DUP_BROADCAST_MAX,
                    flags_uri: str | None = None,
                    nbuckets: int | None = None):
    """Phase B dedup: run the member-level flag exchange, then pick the
    attach mechanism by measured dup volume — broadcast {hash: winner} map
    below ``dup_broadcast_max`` flag rows, keyed lancelite side table above.
    Per-reduce memory is one bucket's members: bounded because ``nbuckets``
    scales with the known row count (``decide.scaled_buckets``), not a
    fixed constant. Returns a _DupIndex or KeyedDupFlags."""
    from ..stages import exchange
    if dedup == "off":
        return _DupIndex({})
    refs = dup_flags_refs(slim_ds, nbuckets)
    n_flags = exchange.total_rows(refs)
    if n_flags <= dup_broadcast_max:
        return _DupIndex(dup_winner_map(flags_refs=refs))
    uri = flags_uri or tempfile.mkdtemp(prefix="ccc_dupflags_")
    return KeyedDupFlags(write_dup_flags(refs, uri))


def decide_from_scored(scored_ds, slim_ds=None, batch_size: int = 1024,
                       z_cut: float | None = None, dedup: str = "first",
                       dup_broadcast_max: int = DUP_BROADCAST_MAX,
                       flags_uri: str | None = None,
                       lang_stats_method: str | None = None):
    """Phases B+C from an already-scored dataset (in-memory materialized or
    a checkpoint read): dedup + per-lang stats exchanges over the slim
    projection, then the decision pass."""
    slim = slim_ds if slim_ds is not None else scored_ds.select_columns(SLIM_COLUMNS)
    n_rows = scored_ds.count()     # free: scored is materialized/parquet
    from ..stages.decide import scaled_buckets
    flags = build_dup_flags(slim, dedup, dup_broadcast_max, flags_uri,
                            nbuckets=scaled_buckets(n_rows))
    flags_ref = ray.put(flags)
    method = lang_stats_method
    if method is None:
        method = "sketch" if n_rows >= LANG_SKETCH_MIN_ROWS else "exact"
    stats = lang_stats(slim, flags_ref, dedup, method)
    dec = decide(scored_ds, flags_ref, stats, batch_size, z_cut, dedup)
    return dec.select_columns(DECISION_COLUMNS)


def decisions(clips_ds, checkpoint_uri: str | None = None,
              scorer_concurrency=None, batch_size: int | None = None,
              slim_ds=None, config=None, info: dict | None = None):
    """Phases A-C over the transcript projection; returns the decision
    Dataset (all columns except the payload passthrough).

    Pass ``slim_ds`` (a read with ``columns=["clip_id", "transcript"]``)
    when the input comes from storage: Ray 2.49 does NOT push
    ``select_columns`` down into ``read_parquet``, so without it phase A
    would read and move the audio payload for nothing (measured 8x read
    volume and ~2x phase wall time).

    ``info`` (optional out-param): filled with ``{"n_rows": N}`` — the
    scored/decision row count, FREE here (metadata of the materialized or
    checkpointed scored table) and needed by ``run`` to pick phase D's
    attach mechanism without an extra execution of the decide stage."""
    checkpoint_uri = _cfg(checkpoint_uri, config, "checkpoint_uri", None)
    scorer_concurrency = _cfg(scorer_concurrency, config,
                              "scorer_concurrency", (2, 8))
    batch_size = _cfg(batch_size, config, "batch_size", 1024)
    slim_in = slim_ds if slim_ds is not None \
        else clips_ds.select_columns(["clip_id", "transcript"])
    scored = score(slim_in, scorer_concurrency, batch_size,
                   None if config is None else config.lid_agree_min_len)

    if checkpoint_uri is not None:
        lancelite.write_dataset(scored, checkpoint_uri)
        scored = lancelite.read(checkpoint_uri)
        slim = lancelite.read(checkpoint_uri, columns=SLIM_COLUMNS)
    else:
        scored = scored.materialize()
        # materialize the slim projection once (~15% of scored's bytes):
        # both wide passes (dedup partials + lang stats) consume it, and
        # re-projecting the fat scored table per pass costs two extra
        # full scans of the transcript columns
        slim = scored.select_columns(SLIM_COLUMNS).materialize()

    if info is not None:
        info["n_rows"] = scored.count()

    return decide_from_scored(
        scored, slim, batch_size,
        z_cut=None if config is None else config.z_cut,
        dedup="first" if config is None else config.dedup,
        dup_broadcast_max=DUP_BROADCAST_MAX if config is None
        else config.dup_broadcast_max,
        lang_stats_method=None if config is None
        else config.lang_stats_method)


class AttachDecisions:
    """Phase D: range-partitioned map-join — attach decision columns to
    full clip rows by clip_id, loading only the decision fragments whose
    key range overlaps each batch (per-actor LRU cache; see keyed.py)."""

    def __init__(self, index: keyed.KeyedFragmentIndex, max_cached: int = 8,
                 extra_cols: tuple = ()):
        self.joiner = keyed.KeyedBatchJoiner(index, max_cached=max_cached)
        self._types = {**self._TYPES,
                       **{c: pa.string() for c in extra_cols}}

    _TYPES = {
        "transcript_scrubbed": pa.string(), "lang": pa.string(),
        "lang2": pa.string(), "lang_agree": pa.bool_(), "n_words": pa.int32(),
        "text_hash": pa.int64(), "is_dup": pa.bool_(),
        "log_prob": pa.float64(), "ppl": pa.float64(), "z_score": pa.float64(),
        "ppl_bucket": pa.string(), "drop_reason": pa.string(), "keep": pa.bool_(),
    }

    def __call__(self, batch: pa.Table) -> pa.Table:
        return keyed.attach_columns(batch, self.joiner, "clip_id", self._types)


# decision rows per side-table fragment: the per-actor memory bound of
# phase D is max_cached x this x ~100B (~8 x 25MB). Small fragments thrash
# the per-actor LRU instead (Ray hands each actor scattered blocks):
# measured 31s -> 14s on the sf0.1 phase D when coalescing 256 tiny
# fragments into 250k-row ones.
DECISION_ROWS_PER_FRAGMENT = 250_000


@ray.remote
def _sorted_side(*tabs: pa.Table):
    """Concat + clip_id-sort the decision table in ONE remote task (the
    driver never holds the rows); the (sorted keys, table) pair stays in
    the object store for every attach actor to share."""
    import numpy as np
    present = [t for t in tabs if t is not None and t.num_rows]
    if not present:
        # empty pipeline: keep the schema from any ref (all-empty blocks
        # still carry it) so the probe path sees typed columns, not a crash
        empty = next((t for t in tabs if t is not None), None)
        if empty is None:
            empty = pa.table({"clip_id": pa.array([], pa.string())})
        keys = empty["clip_id"].to_numpy(zero_copy_only=False)
        return keys, empty
    t = pa.concat_tables(present, promote_options="default")
    keys = t["clip_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    return keys[order], t.take(pa.array(order)).combine_chunks()


class AttachDecisionsBroadcast:
    """Phase D small side: the whole decision table broadcast once
    (``ray.put`` of the object-store-sorted table) — every batch is one
    searchsorted + per-column take, no side-table write, no fragment
    loads. Correct ONLY below ``dec_broadcast_max`` rows; above it
    ``attach_decisions`` picks :class:`AttachDecisions` (keyed join)."""

    def __init__(self, side_ref, extra_cols: tuple = ()):
        # cached_get is a module-scope import: this runs on workers, where
        # package imports only resolve through pickle-by-value shipping of
        # this module's globals (an inline `from ..functions import` here
        # dies with ModuleNotFoundError in the driver-replica environment)
        self.keys, self.table = cached_get(side_ref)
        self._types = {**AttachDecisions._TYPES,
                       **{c: pa.string() for c in extra_cols}}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        k = batch["clip_id"].to_numpy(zero_copy_only=False)
        if k.dtype.kind in "US":
            k = k.astype(object)
        if len(k) and len(self.keys) == 0:
            raise KeyError("decision table is missing clip_ids in the batch")
        idx = np.clip(np.searchsorted(self.keys, k), 0,
                      max(len(self.keys) - 1, 0))
        if len(k) and not (self.keys[idx] == k).all():
            raise KeyError("decision table is missing clip_ids in the batch")
        take = pa.array(idx)
        for col, typ in self._types.items():
            batch = batch.append_column(
                col, self.table[col].take(take).cast(typ))
        return batch


def attach_decisions(clips_ds, dec, batch_size: int = 1024,
                     decisions_uri: str | None = None,
                     n_decisions: int | None = None,
                     dec_broadcast_max: int = DEC_BROADCAST_MAX,
                     extra_cols: tuple = ()):
    """Phase D, adaptive by decision volume (mirrors ``build_dup_flags``):

    * ``n_decisions <= dec_broadcast_max``: broadcast attach — the decision
      table is sorted once in a remote task, shared via the object store,
      and every attach actor probes it in memory. Skips the keyed path's
      fixed costs (side-table land + per-batch fragment loads, ~4.5s of
      the sf0.1 headline).
    * above (or unknown volume): land the decision table as a keyed
      lancelite table (clip_id range stats per fragment) and stream the
      full clip rows past it — bounded memory at any table size.

    An explicitly requested ``decisions_uri`` always takes the keyed path:
    the caller asked for the decision side table on disk (inspection,
    resume), so the broadcast shortcut — which never writes it — would
    silently break that contract."""
    n_act = max(2, _cluster_cpus() - 2)
    # batch_size=None on both paths: joining whole input blocks avoids
    # re-batching — re-forming fixed-size batches COPIES the payload bytes
    # (measured ~345ms/batch of pure slicing/concat on 30MB audio batches
    # vs ~4ms for the join itself); join cost is independent of batch shape
    final_cols = FINAL_COLUMNS + [c for c in extra_cols
                                  if c not in FINAL_COLUMNS]
    if (decisions_uri is None and n_decisions is not None
            and n_decisions <= dec_broadcast_max):
        side_ref = _sorted_side.remote(*dec.to_arrow_refs())
        return clips_ds.map_batches(
            AttachDecisionsBroadcast, batch_format="pyarrow", batch_size=None,
            fn_constructor_args=(side_ref, tuple(extra_cols)),
            concurrency=(n_act, n_act), num_cpus=1,
        ).select_columns(final_cols)
    dec_uri = decisions_uri or tempfile.mkdtemp(prefix="ccc_dec_")
    lancelite.write_dataset(dec, dec_uri, key_stats="clip_id",
                            rows_per_file=DECISION_ROWS_PER_FRAGMENT)
    index = keyed.KeyedFragmentIndex(dec_uri, "clip_id")
    return clips_ds.map_batches(
        AttachDecisions, batch_format="pyarrow", batch_size=None,
        fn_constructor_args=(index, 8, tuple(extra_cols)),
        concurrency=(n_act, n_act), num_cpus=1,
    ).select_columns(final_cols)


@ray.remote
def _sorted_flags(*tabs: pa.Table):
    """Concat + clip_id-sort the audio-flag rows in one remote task; the
    (sorted keys, dup_of values) pair stays in the object store for every
    attach actor to share (the _sorted_side pattern, left semantics)."""
    import numpy as np
    present = [t for t in tabs if t is not None and t.num_rows]
    if not present:
        e = np.zeros(0, dtype=object)
        return e, e
    t = pa.concat_tables(present, promote_options="default")
    keys = t["clip_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    return keys[order], t["audio_dup_of"].to_numpy(
        zero_copy_only=False)[order]


class AttachAudioFlags:
    """Optional decision amendment (PipelineConfig.audio_dedup): LEFT
    lookup of (clip_id -> audio_dup_of) over the decision stream — a
    missing key means "not an audio dup". A dup member that would
    otherwise KEEP flips to keep=False / drop_reason="audio_dup"; an
    already-dropped row keeps its original reason (text rules and text
    dedup are computed first and win — the audio flag only ever removes
    survivors, so enabling it can only shrink the kept set).

    Side state is adaptive like every other side in this pipeline:
    broadcast (sorted arrays in the object store) at or below
    ``audio_flags_broadcast_max`` flag rows, keyed lancelite join above."""

    def __init__(self, spec):
        mode, payload = spec
        if mode == "bcast":
            self._keys, self._vals = cached_get(payload)
            self._joiner = None
        else:
            self._joiner = keyed.KeyedBatchJoiner(
                payload, columns=["clip_id", "audio_dup_of"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        k = batch["clip_id"].to_numpy(zero_copy_only=False)
        if k.dtype.kind in "US":
            k = k.astype(object)
        dup = np.full(len(k), "", dtype=object)
        if self._joiner is None:
            if len(self._keys) and len(k):
                pos = np.clip(np.searchsorted(self._keys, k), 0,
                              len(self._keys) - 1)
                hit = self._keys[pos] == k
                dup[hit] = self._vals[pos[hit]]
        else:
            row, found, side = self._joiner.probe(k)
            if side is not None and found.any():
                dup[found] = np.asarray(
                    side["audio_dup_of"].take(pa.array(row[found]))
                    .to_pylist(), dtype=object)
        keep = batch["keep"].to_numpy(zero_copy_only=False)
        is_dup = dup != ""
        flip = keep & is_dup
        reason = batch["drop_reason"].to_pylist()
        for r in np.nonzero(flip)[0]:
            reason[int(r)] = "audio_dup"
        batch = batch.set_column(
            batch.schema.get_field_index("drop_reason"), "drop_reason",
            pa.array(reason, pa.string()))
        batch = batch.set_column(
            batch.schema.get_field_index("keep"), "keep",
            pa.array(keep & ~is_dup))
        return batch.append_column(
            "audio_dup_of", pa.array(dup.tolist(), pa.string()))


def attach_audio_flags(dec, flags, broadcast_max: int = 2_000_000,
                       flags_uri: str | None = None):
    """Amend the decision Dataset with the audio-dup flags (see
    :class:`AttachAudioFlags`). ``flags`` is audio_ops.audio_dup_flags'
    member-row Dataset — O(dup rate), so its count here is cheap (the
    exchange has already run)."""
    n_flags = flags.count()
    n_act = max(2, _cluster_cpus() - 2)
    if n_flags <= broadcast_max:
        spec = ("bcast", _sorted_flags.remote(*flags.to_arrow_refs()))
    else:
        uri = flags_uri or tempfile.mkdtemp(prefix="ccc_audioflags_")
        lancelite.write_dataset(flags, uri, key_stats="clip_id",
                                rows_per_file=DECISION_ROWS_PER_FRAGMENT)
        spec = ("keyed", keyed.KeyedFragmentIndex(uri, "clip_id"))
    return dec.map_batches(
        AttachAudioFlags, batch_format="pyarrow", batch_size=None,
        fn_constructor_args=(spec,),
        concurrency=(n_act, n_act), num_cpus=1)


def run(clips_ds, checkpoint_uri: str | None = None, final_uri: str | None = None,
        scorer_concurrency=None, batch_size: int | None = None,
        attach_payload: bool | None = None, slim_ds=None, config=None,
        decisions_uri: str | None = None,
        final_partition_cols=None, final_rows_per_file: int | None = None):
    """Full pipeline. With ``attach_payload`` the result carries the input
    payload columns byte-identical (per-row invariant) next to the decision
    columns; otherwise the slim decision table is returned. Pass a
    ``pipelines.config.PipelineConfig`` to set every knob in one place
    (SURVEY.md 2.10 extension surface); explicit kwargs always win over
    config fields.

    ``final_partition_cols=["lang"]`` writes the final table as the
    reference's per-language hive tree (cc_corpus.py:178-184, final_cc
    cc_corpus.py:443-459); combine with ``final_rows_per_file`` for the
    100k-row roll (cc_corpus.py:439-451). The returned Dataset reads the
    committed partitioned table back (partition column re-attached)."""
    attach_payload = _cfg(attach_payload, config, "attach_payload", True)
    batch_size = _cfg(batch_size, config, "batch_size", 1024)
    final_partition_cols = _cfg(final_partition_cols, config,
                                "final_partition_cols", None)
    final_rows_per_file = _cfg(final_rows_per_file, config,
                               "final_rows_per_file", None)
    info: dict = {}
    dec = decisions(clips_ds, checkpoint_uri, scorer_concurrency, batch_size,
                    slim_ds=slim_ds, config=config, info=info)
    audio_mode = _cfg(None, config, "audio_dedup", "off")
    extra_cols: tuple = ()
    if audio_mode != "off":
        # optional audio-modality dedup (round 5): flags over the payload
        # projection (the one stage here that must read the audio bytes),
        # amended into the decision stream before phase D
        from .audio_ops import audio_dup_flags
        flags = audio_dup_flags(clips_ds, audio_mode,
                                n_rows=info.get("n_rows"),
                                route_broadcast_max=_cfg(
                                    None, config, "audio_route_broadcast_max",
                                    2_000_000))
        dec = attach_audio_flags(
            dec, flags,
            broadcast_max=_cfg(None, config, "audio_flags_broadcast_max",
                               2_000_000))
        extra_cols = ("audio_dup_of",)
    if not attach_payload:
        final = dec
    else:
        final = attach_decisions(
            clips_ds, dec, batch_size, decisions_uri,
            n_decisions=info.get("n_rows"),
            dec_broadcast_max=_cfg(None, config, "dec_broadcast_max",
                                   DEC_BROADCAST_MAX),
            extra_cols=extra_cols)
    if final_uri is not None:
        lancelite.write_dataset(
            final, final_uri,
            partition_cols=list(final_partition_cols)
            if final_partition_cols else None,
            rows_per_file=final_rows_per_file)
        final = lancelite.read(final_uri)
    return final

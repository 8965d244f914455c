"""The flagship pipeline: LID + quality-filter + scrub over a clips table.

Ray Data shape (SURVEY.md section 3.1), with the key scale decision that
audio payloads NEVER enter a scoring stage or a shuffle:

    clips.select(clip_id, transcript) ──────────────────┐ narrow, streaming
      map_batches(scrub_rules_batch)          [tasks]   │ phase A
      map_batches(TranscriptScorer)           [actors]  │ (transcripts only,
      materialize / lancelite checkpoint ───────────────┘  ~1KB/row blocks)
    dup_winner_map   : groupby(text_hash) partials       ┐ wide, slim only
    lang_stats       : groupby(lang) on (lang, ppl)      ┘ phase B
    map_batches(DecideStage)  → decision table (no bytes)  phase C
    clips (full rows) + broadcast decisions ─ map-side join, one streaming
      pass that re-reads payload columns exactly once      phase D

Phase D is a broadcast hash-join on clip_id (decisions are ~50 bytes/row).
At 10^12-clip scale the broadcast becomes per-partition: decisions are
written range-partitioned by clip_id (same salted partitioning as the
input, functions/hashing.salted_partition), and each phase-D task loads
only its partition's decision fragment — same code shape, bounded memory.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray

from ..sources import lancelite
from ..stages.decide import DecideStage, dup_winner_map, lang_stats
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


def decide(scored_ds, dupmap: dict, stats: dict, batch_size: int = 1024,
           z_cut: float | None = None, dedup: str = "first"):
    """Phase C: final decision with broadcast dup map + per-lang stats.
    Actor-pool width follows the cluster CPU count — a fixed cap starves
    this phase on larger clusters."""
    from ..functions import spec
    zc = spec.Z_CUT if z_cut is None else z_cut
    dupmap_ref = ray.put(dupmap)
    n_act = max(2, _cluster_cpus() - 2)
    return scored_ds.map_batches(
        DecideStage, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_args=(dupmap_ref, stats, zc, dedup),
        # fixed-size pool: an autoscaling pool starting at 1 ramps too
        # slowly for a short stage and the ramp is pure fixed cost
        concurrency=(n_act, n_act), num_cpus=1)


class AttachDecisions:
    """Phase D: broadcast map-join — attach decision columns to full clip
    rows by clip_id. The decisions frame is fetched once per actor."""

    def __init__(self, decisions_ref):
        df = ray.get(decisions_ref) if not isinstance(decisions_ref, pd.DataFrame) \
            else decisions_ref
        self.df = df.set_index("clip_id")

    _TYPES = {
        "transcript_scrubbed": pa.string(), "lang": pa.string(),
        "lang2": pa.string(), "lang_agree": pa.bool_(), "n_words": pa.int32(),
        "text_hash": pa.int64(), "is_dup": pa.bool_(),
        "log_prob": pa.float64(), "ppl": pa.float64(), "z_score": pa.float64(),
        "ppl_bucket": pa.string(), "drop_reason": pa.string(), "keep": pa.bool_(),
    }

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["clip_id"].to_pylist()
        sub = self.df.loc[ids]
        for col, typ in self._TYPES.items():
            batch = batch.append_column(col, pa.array(sub[col].tolist(), typ))
        return batch


def decide_from_scored(scored_ds, slim_ds=None, batch_size: int = 1024,
                       z_cut: float | None = None, dedup: str = "first"):
    """Phases B+C from an already-scored dataset (in-memory materialized or
    a checkpoint read): dedup + per-lang stats shuffles over the slim
    projection, then the broadcast decision pass."""
    slim = slim_ds if slim_ds is not None else scored_ds.select_columns(SLIM_COLUMNS)
    dupmap = dup_winner_map(slim) if dedup != "off" else {}
    dupmap_ref = ray.put(dupmap)
    stats = lang_stats(slim, dupmap_ref)
    dec = decide(scored_ds, dupmap, stats, batch_size, z_cut, dedup)
    return dec.select_columns(DECISION_COLUMNS)


def decisions(clips_ds, checkpoint_uri: str | None = None,
              scorer_concurrency=(2, 8), batch_size: int = 1024,
              slim_ds=None, config=None):
    """Phases A-C over the transcript projection; returns the decision
    Dataset (all columns except the payload passthrough).

    Pass ``slim_ds`` (a read with ``columns=["clip_id", "transcript"]``)
    when the input comes from storage: Ray 2.49 does NOT push
    ``select_columns`` down into ``read_parquet``, so without it phase A
    would read and move the audio payload for nothing (measured 8x read
    volume and ~2x phase wall time)."""
    if config is not None:
        checkpoint_uri = checkpoint_uri or config.checkpoint_uri
        scorer_concurrency = config.scorer_concurrency
        batch_size = config.batch_size
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

    if config is None:
        return decide_from_scored(scored, slim, batch_size)
    return decide_from_scored(scored, slim, batch_size,
                              config.z_cut, config.dedup)


def run(clips_ds, checkpoint_uri: str | None = None, final_uri: str | None = None,
        scorer_concurrency=(2, 8), batch_size: int = 1024,
        attach_payload: bool = True, slim_ds=None, config=None):
    """Full pipeline. With ``attach_payload`` the result carries the input
    payload columns byte-identical (per-row invariant) next to the decision
    columns; otherwise the slim decision table is returned. Pass a
    ``pipelines.config.PipelineConfig`` to set every knob in one place
    (SURVEY.md 2.10 extension surface); explicit kwargs still win for
    checkpoint_uri."""
    if config is not None:
        attach_payload = config.attach_payload
        batch_size = config.batch_size
    dec = decisions(clips_ds, checkpoint_uri, scorer_concurrency, batch_size,
                    slim_ds=slim_ds, config=config)
    if not attach_payload:
        final = dec
    else:
        dec_df = dec.to_pandas()       # sandbox scale; see module docstring
        dec_ref = ray.put(dec_df)
        n_act = max(2, _cluster_cpus() - 2)
        final = clips_ds.map_batches(
            AttachDecisions, batch_format="pyarrow", batch_size=batch_size,
            fn_constructor_args=(dec_ref,),
            concurrency=(n_act, n_act), num_cpus=1,
        ).select_columns(FINAL_COLUMNS)
    if final_uri is not None:
        lancelite.write_dataset(final, final_uri)
        final = lancelite.read(final_uri)
    return final

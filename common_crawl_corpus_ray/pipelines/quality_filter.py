"""The flagship pipeline: LID + quality-filter + scrub over a clips table.

Ray Data shape (SURVEY.md section 3.1):

    lancelite.read(clips) ──────────────────────────────┐  narrow, streaming
      map_batches(scrub_rules_batch)          [tasks]   │  phase A
      map_batches(TranscriptScorer)           [actors]  │
      checkpoint (lancelite write or materialize) ──────┘
    dup_winner_map   : groupby(text_hash) on slim pairs ┐  wide, slim only
    lang_stats       : groupby(lang) on (lang, ppl)     ┘  phase B
    map_batches(DecideStage, broadcast dup map + stats) ─  narrow, phase C
      lancelite.write(final)

Audio ``bytes`` flow through phases A and C untouched and never enter a
shuffle. The checkpoint between A and B exists because B consumes the
scored data twice (dedup + stats) and C needs it again — re-executing the
scoring lineage three times would triple the model compute; the checkpoint
also doubles as the resume point (state/manifest.py).
"""

from __future__ import annotations

import ray

from ..sources import lancelite
from ..stages.decide import DecideStage, dup_winner_map, lang_stats
from ..stages.scoring import TranscriptScorer
from ..stages.scrub_rules import scrub_rules_batch

SLIM_COLUMNS = ["clip_id", "text_hash", "rule_reason", "lang", "lang_agree", "ppl"]

FINAL_COLUMNS = [
    "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
    "transcript_scrubbed", "lang", "lang2", "lang_agree", "n_words",
    "text_hash", "is_dup", "log_prob", "ppl", "z_score", "ppl_bucket",
    "drop_reason", "keep",
]


def score(ds, scorer_concurrency=(2, 8), batch_size: int = 1024):
    """Phase A: narrow scrub + rules + scoring over a clips Dataset."""
    return (ds
            .map_batches(scrub_rules_batch, batch_format="pyarrow",
                         batch_size=batch_size)
            .map_batches(TranscriptScorer, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=scorer_concurrency,
                         num_cpus=1))


def decide(scored_ds, dupmap: dict, stats: dict, batch_size: int = 1024):
    """Phase C: final decision with broadcast dup map + per-lang stats."""
    dupmap_ref = ray.put(dupmap)
    return scored_ds.map_batches(
        DecideStage, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_args=(dupmap_ref, stats), concurrency=(1, 8), num_cpus=1)


def run(clips_ds, checkpoint_uri: str | None = None, final_uri: str | None = None,
        scorer_concurrency=(2, 8), batch_size: int = 1024):
    """Run the full pipeline; returns the final Dataset (+ writes if uris given)."""
    scored = score(clips_ds, scorer_concurrency, batch_size)

    if checkpoint_uri is not None:
        lancelite.write_dataset(scored, checkpoint_uri)
        scored = lancelite.read(checkpoint_uri)
        slim = lancelite.read(checkpoint_uri, columns=SLIM_COLUMNS)
    else:
        scored = scored.materialize()
        slim = scored.select_columns(SLIM_COLUMNS)

    dupmap = dup_winner_map(slim)
    dupmap_ref = ray.put(dupmap)
    stats = lang_stats(slim, dupmap_ref)

    final = decide(scored, dupmap, stats, batch_size).select_columns(FINAL_COLUMNS)
    if final_uri is not None:
        lancelite.write_dataset(final, final_uri)
        final = lancelite.read(final_uri)
    return final

"""PipelineConfig — the user-extension surface (SURVEY.md 2.10).

The reference's "API" is editing module-level dicts and tuples
(utilities.py:9,148-219; constructor args at cc_corpus.py:200-216). The
rebuild replaces that with one frozen dataclass of knobs: rule *semantics*
stay data in ``functions/spec.py`` (single source of truth rendered for
RE2 / Python re / DuckDB), while everything legitimately tunable per run
lives here and threads through ``quality_filter.run(config=...)``.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..functions import spec


@dataclass(frozen=True)
class PipelineConfig:
    # stage sizing
    batch_size: int = 1024
    scorer_concurrency: tuple[int, int] = (2, 8)

    # decision semantics (defaults = reference parity, functions/spec.py)
    lid_agree_min_len: int = spec.LID_AGREE_MIN_LEN   # geoWAC.py:19-22
    z_cut: float = spec.Z_CUT                         # outlier_detection.py:104
    dedup: str = "first"      # "first" (cc_corpus.py:345) | "none"
    #                           (deduplication.py:97-104) | "off"

    # lifecycle
    checkpoint_uri: str | None = None
    attach_payload: bool = True
    num_partitions: int = 8   # resumable.run_resumable planning unit

    # scale paths (round 2): dup-flag rows above which the broadcast
    # winner map gives way to the keyed side-table join, and the
    # lang-stats estimator ("exact" | "sketch" | None = auto by row count)
    dup_broadcast_max: int = 2_000_000
    lang_stats_method: str | None = None

    # scale paths (round 3): decision rows above which phase D's broadcast
    # attach gives way to the keyed side-table join (mirrors
    # dup_broadcast_max — below it the broadcast skips the side-table
    # write + fragment loads entirely)
    dec_broadcast_max: int = 2_000_000

    # final sink layout (S5/S6): hive partition columns and rolling file
    # size for quality_filter.run(final_uri=...) — the reference's product
    # is the per-language tree (cc_corpus.py:178-184, final_cc 443-459)
    final_partition_cols: tuple[str, ...] | None = None
    final_rows_per_file: int | None = None

    def __post_init__(self):
        if self.dedup not in ("first", "none", "off"):
            raise ValueError(f"dedup must be first|none|off, got {self.dedup!r}")
        if self.lang_stats_method not in (None, "exact", "sketch"):
            raise ValueError("lang_stats_method must be exact|sketch|None, "
                             f"got {self.lang_stats_method!r}")

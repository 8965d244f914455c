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

    # audio-modality dedup (round 5): "off" (default — reference parity;
    # the reference has no audio analog) | "exact" (payload-digest
    # keep-first) | "perceptual" (decoded-domain pairs: digest stars +
    # banded sign screen + SNR verify — also catches exact dups). When on,
    # decisions gain an ``audio_dup_of`` column and kept dup members flip
    # to keep=False / drop_reason="audio_dup"; see
    # audio_ops.audio_dup_flags / quality_filter.attach_audio_flags.
    audio_dedup: str = "off"
    # flag rows above which the (clip_id -> audio_dup_of) side flips from
    # object-store broadcast to the keyed lancelite join (mirrors
    # dup_broadcast_max / dec_broadcast_max)
    audio_flags_broadcast_max: int = 2_000_000
    # perceptual mode only: candidate clip->bucket routing entries above
    # which the verify routing flips from broadcast CSR to the keyed side
    # table (audio_ops.PERC_ROUTE_BROADCAST_MAX)
    audio_route_broadcast_max: int = 2_000_000

    def __post_init__(self):
        if self.dedup not in ("first", "none", "off"):
            raise ValueError(f"dedup must be first|none|off, got {self.dedup!r}")
        if self.lang_stats_method not in (None, "exact", "sketch"):
            raise ValueError("lang_stats_method must be exact|sketch|None, "
                             f"got {self.lang_stats_method!r}")
        if self.audio_dedup not in ("off", "exact", "perceptual"):
            raise ValueError("audio_dedup must be off|exact|perceptual, "
                             f"got {self.audio_dedup!r}")

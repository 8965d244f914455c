"""Resumable flagship run: partitioned phase-A scoring with per-partition
lineage manifests, then the wide phases from the committed checkpoint.

The expensive, embarrassingly-parallel part of the pipeline (scrub + rules +
model scoring, phase A) is the part worth checkpointing: each partition is a
group of input fragments, scored as its own streaming Ray Data pipeline and
committed atomically to a ``state.manifest`` checkpoint table. A crashed or
killed run resumes by re-planning and skipping every committed partition —
the reference's ``check/`` marker scheme (cc_corpus.py:142-144) with real
transactionality. The wide phases (dedup + stats + decide) re-run from the
checkpoint on resume; they are cheap relative to scoring and depend on the
global barrier anyway (per-language median/MAD, SURVEY.md G4).

At cluster scale each partition would be a retryable unit of a few GB (one
input fragment range); partition count is a parameter, not a schema fact.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from ..sources import lancelite
from ..state import manifest
from . import quality_filter


class InjectedFailure(RuntimeError):
    """Raised by run_scored_partitions when fail_after is hit (tests)."""


def plan_partitions(input_files: list[str], num_partitions: int) -> dict[int, list[str]]:
    """Deterministic round-robin assignment of input fragments to
    partitions (sorted file order — stable across runs and processes)."""
    parts: dict[int, list[str]] = {p: [] for p in range(num_partitions)}
    for i, f in enumerate(sorted(input_files)):
        parts[i % num_partitions].append(f)
    return {p: fs for p, fs in parts.items() if fs}


def _input_files(clips_uri: str) -> list[str]:
    if os.path.isdir(os.path.join(clips_uri, "_versions")):
        return lancelite.fragment_paths(clips_uri)
    return [os.path.join(clips_uri, f) for f in os.listdir(clips_uri)
            if f.endswith(".parquet")]


def run_scored_partitions(clips_uri: str, ckpt_uri: str, *,
                          num_partitions: int = 8,
                          scorer_concurrency=(2, 8), batch_size: int = 1024,
                          fail_after: int | None = None) -> dict:
    """Phase A, partitioned + resumable. Scores every pending partition into
    the checkpoint manifest, then commits a version. ``fail_after=K`` raises
    after K partitions complete this call (crash-injection for tests)."""
    import ray.data as rd

    parts = plan_partitions(_input_files(clips_uri), num_partitions)
    todo = manifest.pending(ckpt_uri, sorted(parts))
    done_this_call = 0
    for pid in todo:
        if fail_after is not None and done_this_call >= fail_after:
            raise InjectedFailure(f"injected failure after {fail_after} partitions")
        files = parts[pid]
        ds = rd.read_parquet(files, columns=["clip_id", "transcript"])
        scored = quality_filter.score(ds, scorer_concurrency, batch_size)
        manifest.write_partition(
            ckpt_uri, pid, scored,
            input_fragments=[os.path.basename(f) for f in files],
            metrics_fn=_rules_pass_metric, stage_version="score-v1")
        done_this_call += 1
    v = manifest.commit_version(ckpt_uri)
    vm = manifest.version_manifest(ckpt_uri, v)
    vm["partitions_run_this_call"] = done_this_call
    return vm


def _rules_pass_metric(frag_paths: list[str]) -> dict:
    """Per-partition metric: rules-pass rows, from a single-column scan of
    the partition's own fragments (column-pruned, no full-row read)."""
    from ..functions import spec
    n = 0
    for p in frag_paths:
        col = pq.read_table(p, columns=["rule_reason"])["rule_reason"]
        n += col.to_pandas().eq(spec.KEEP_REASON).sum()
    return {"n_rules_pass": int(n)}


def run_resumable(clips_uri: str, ckpt_uri: str, final_uri: str | None = None, *,
                  num_partitions: int | None = None, scorer_concurrency=None,
                  batch_size: int | None = None, fail_after: int | None = None,
                  z_cut: float | None = None, dedup: str | None = None,
                  attach_payload: bool | None = None, config=None):
    """Full resumable flagship run. All decision knobs (z_cut / dedup /
    attach_payload) thread through exactly as in the non-resumable path —
    explicit kwargs win over ``config`` fields. Returns the decision
    Dataset (or the payload-attached table when ``attach_payload``); writes
    a lancelite table when ``final_uri`` is given."""
    _cfg = quality_filter._cfg
    num_partitions = _cfg(num_partitions, config, "num_partitions", 8)
    scorer_concurrency = _cfg(scorer_concurrency, config,
                              "scorer_concurrency", (2, 8))
    batch_size = _cfg(batch_size, config, "batch_size", 1024)
    z_cut = _cfg(z_cut, config, "z_cut", None)
    dedup = _cfg(dedup, config, "dedup", "first")
    attach_payload = _cfg(attach_payload, config, "attach_payload", False)

    run_scored_partitions(clips_uri, ckpt_uri, num_partitions=num_partitions,
                          scorer_concurrency=scorer_concurrency,
                          batch_size=batch_size, fail_after=fail_after)
    scored = manifest.read(ckpt_uri)
    slim = manifest.read(ckpt_uri, columns=quality_filter.SLIM_COLUMNS)
    out = quality_filter.decide_from_scored(
        scored, slim, batch_size, z_cut=z_cut, dedup=dedup,
        dup_broadcast_max=_cfg(None, config, "dup_broadcast_max",
                               quality_filter.DUP_BROADCAST_MAX),
        lang_stats_method=_cfg(None, config, "lang_stats_method", None))
    if attach_payload:
        import ray.data as rd
        is_lance = os.path.isdir(os.path.join(clips_uri, "_versions"))
        clips_ds = lancelite.read(clips_uri) if is_lance \
            else rd.read_parquet(clips_uri)
        out = quality_filter.attach_decisions(clips_ds, out, batch_size)
    if final_uri is not None:
        lancelite.write_dataset(out, final_uri)
        out = lancelite.read(final_uri)
    return out

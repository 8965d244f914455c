"""Per-partition lineage manifest — checkpoint/resume for partitioned runs.

This is the reference's ``check/`` done-marker scheme (cc_corpus.py:142-144,
186-188; skip-if-output-exists at outlier_detection.py:153, geoWAC.py:157)
made transactional, per SURVEY.md section 4.4:

    out_table/
      fragments/part-<pid>-<attempt>-<k>.parquet   immutable output fragments
      _manifest/partition-<pid>.json               per-partition lineage entry
      _manifest/_version-<n>.json                  commit point: finished pids

A partition entry is committed via atomic rename AFTER its fragments are
fully written, so a crash mid-partition leaves no visible entry and the
rerun simply redoes that partition (idempotent overwrite: a new attempt
writes new fragment names; only the committed entry's fragment list is ever
read). Each entry carries lineage (input fragments), metrics (row counts,
wall ms) and the stage version — the per-partition metrics the reference
printed ad hoc (cc_corpus.py:346-347, outlier_detection.py:171-172).
"""

from __future__ import annotations

import json
import os
import time
import uuid

_FRAG_DIR = "fragments"
_MAN_DIR = "_manifest"


def _mdir(uri: str) -> str:
    return os.path.join(uri, _MAN_DIR)


def completed(uri: str) -> dict[int, dict]:
    """{partition_id: entry} for every committed partition."""
    mdir = _mdir(uri)
    if not os.path.isdir(mdir):
        return {}
    out = {}
    for f in os.listdir(mdir):
        if f.startswith("partition-") and f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                e = json.load(fh)
            out[e["partition_id"]] = e
    return out


def pending(uri: str, partition_ids: list[int]) -> list[int]:
    done = completed(uri)
    return [p for p in partition_ids if p not in done]


def next_attempt(uri: str, pid: int) -> int:
    """Attempt number inferred from fragment files already on disk (failed
    attempts leave orphan fragments but no manifest entry)."""
    fdir = os.path.join(uri, _FRAG_DIR)
    if not os.path.isdir(fdir):
        return 1
    prefix = f"part-{pid:05d}-"
    attempts = {int(f.split("-")[2]) for f in os.listdir(fdir)
                if f.startswith(prefix) and f.endswith(".parquet")}
    return (max(attempts) + 1) if attempts else 1


def write_partition(uri: str, pid: int, ds_or_table, *, input_fragments:
                    list[str] | None = None, metrics: dict | None = None,
                    metrics_fn=None, stage_version: str = "v1") -> dict:
    """Write one partition's output (Ray Dataset or pyarrow Table) and commit
    its lineage entry. Returns the entry. ``metrics_fn(frag_paths)`` runs
    after the fragments are written but before the entry commit, so derived
    metrics land inside the committed entry."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = time.perf_counter()
    fdir = os.path.join(uri, _FRAG_DIR)
    os.makedirs(fdir, exist_ok=True)
    os.makedirs(_mdir(uri), exist_ok=True)
    attempt = next_attempt(uri, pid)

    frags = []
    if isinstance(ds_or_table, pa.Table):
        name = f"part-{pid:05d}-{attempt}-0.parquet"
        pq.write_table(ds_or_table, os.path.join(fdir, name))
        frags.append({"path": f"{_FRAG_DIR}/{name}", "rows": ds_or_table.num_rows})
    else:                               # Ray Dataset: stream via write_parquet
        stage = os.path.join(uri, f".stage-{uuid.uuid4().hex}")
        ds_or_table.write_parquet(stage)
        k = 0
        for f in sorted(os.listdir(stage)):
            if not f.endswith(".parquet"):
                continue
            name = f"part-{pid:05d}-{attempt}-{k}.parquet"
            src = os.path.join(stage, f)
            rows = pq.read_metadata(src).num_rows
            os.rename(src, os.path.join(fdir, name))
            frags.append({"path": f"{_FRAG_DIR}/{name}", "rows": rows})
            k += 1
        os.rmdir(stage)

    all_metrics = dict(metrics or {})
    if metrics_fn is not None:
        all_metrics.update(metrics_fn([os.path.join(uri, f["path"]) for f in frags]))
    entry = {
        "partition_id": pid,
        "attempt": attempt,
        "fragments": frags,
        "row_count": sum(f["rows"] for f in frags),
        "input_fragments": input_fragments or [],
        "metrics": all_metrics,
        "stage_version": stage_version,
        "wall_ms": round((time.perf_counter() - t0) * 1000, 1),
        "status": "done",
    }
    tmp = os.path.join(_mdir(uri), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.rename(tmp, os.path.join(_mdir(uri), f"partition-{pid:05d}.json"))
    return entry


def commit_version(uri: str) -> int:
    """Commit a version listing every finished partition (the resume/read
    point — readers only ever see fully-committed partitions)."""
    done = completed(uri)
    mdir = _mdir(uri)
    versions = [int(f[9:-5]) for f in os.listdir(mdir)
                if f.startswith("_version-") and f.endswith(".json")]
    v = (max(versions) + 1) if versions else 1
    m = {
        "version": v,
        "partitions": sorted(done),
        "num_rows": sum(e["row_count"] for e in done.values()),
        "total_attempts": sum(e["attempt"] for e in done.values()),
    }
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.rename(tmp, os.path.join(mdir, f"_version-{v}.json"))
    return v


def version_manifest(uri: str, version: int | None = None) -> dict:
    mdir = _mdir(uri)
    versions = sorted(int(f[9:-5]) for f in os.listdir(mdir)
                      if f.startswith("_version-") and f.endswith(".json"))
    if not versions:
        raise FileNotFoundError(f"no committed version at {uri}")
    v = versions[-1] if version is None else version
    with open(os.path.join(mdir, f"_version-{v}.json")) as f:
        return json.load(f)


def fragment_paths(uri: str, version: int | None = None) -> list[str]:
    vm = version_manifest(uri, version)
    done = completed(uri)
    out = []
    for pid in vm["partitions"]:
        for f in done[pid]["fragments"]:
            out.append(os.path.join(uri, f["path"]))
    return out


def read(uri: str, columns: list[str] | None = None,
         version: int | None = None, **kw):
    """Committed partitions as a Ray Dataset (fragment-parallel scan)."""
    import ray.data as rd
    return rd.read_parquet(fragment_paths(uri, version), columns=columns, **kw)

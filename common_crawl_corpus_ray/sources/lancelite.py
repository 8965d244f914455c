"""lancelite — a minimal Lance-style versioned columnar table layout.

The real Lance format (pylance) is not installable in this sandbox, so the
capabilities the task actually uses — a versioned table of immutable
fragments with a manifest, fragment-parallel scans into Ray Data, and
append/overwrite commits — are implemented from scratch on parquet + JSON:

    table_uri/
      fragments/frag-<uuid>.parquet        immutable data fragments
      _versions/<n>.json                   manifest: fragment list + schema
                                           + row counts (committed atomically
                                           via os.rename)

``read()`` returns a ``ray.data.Dataset`` built with ``read_parquet`` over
the fragment list of a manifest version, so scans are fragment-parallel and
column-prunable exactly like a Lance/parquet scan. This module never calls
``ray.init()``.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

_FRAG_DIR = "fragments"
_VER_DIR = "_versions"


def _versions(uri: str) -> list[int]:
    vdir = os.path.join(uri, _VER_DIR)
    if not os.path.isdir(vdir):
        return []
    out = []
    for f in os.listdir(vdir):
        if f.endswith(".json"):
            try:
                out.append(int(f[:-5]))
            except ValueError:
                pass
    return sorted(out)


def latest_version(uri: str) -> int:
    vs = _versions(uri)
    if not vs:
        raise FileNotFoundError(f"no lancelite versions at {uri}")
    return vs[-1]


def manifest(uri: str, version: int | None = None) -> dict:
    v = latest_version(uri) if version is None else version
    with open(os.path.join(uri, _VER_DIR, f"{v}.json")) as f:
        return json.load(f)


def _commit(uri: str, fragments: list[dict], schema_str: str) -> int:
    vs = _versions(uri)
    v = (vs[-1] + 1) if vs else 1
    vdir = os.path.join(uri, _VER_DIR)
    os.makedirs(vdir, exist_ok=True)
    m = {
        "version": v,
        "fragments": fragments,
        "schema": schema_str,
        "num_rows": sum(f["rows"] for f in fragments),
    }
    tmp = os.path.join(vdir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.rename(tmp, os.path.join(vdir, f"{v}.json"))   # atomic commit point
    return v


def write_table(table: pa.Table, uri: str, mode: str = "overwrite",
                max_rows_per_fragment: int = 1_000_000) -> int:
    """Write a pyarrow Table as one or more fragments and commit a version."""
    fdir = os.path.join(uri, _FRAG_DIR)
    os.makedirs(fdir, exist_ok=True)
    frags = [] if mode == "overwrite" else list(manifest(uri)["fragments"])
    for off in range(0, max(1, table.num_rows), max_rows_per_fragment):
        chunk = table.slice(off, max_rows_per_fragment)
        name = f"frag-{uuid.uuid4().hex}.parquet"
        pq.write_table(chunk, os.path.join(fdir, name))
        frags.append({"path": f"{_FRAG_DIR}/{name}", "rows": chunk.num_rows})
    return _commit(uri, frags, str(table.schema))


def _parse_hive(relpath: str) -> dict:
    """{col: value} from hive-style path segments (``lang=en/...``)."""
    out = {}
    for seg in relpath.split(os.sep)[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            out[k] = v
    return out


def write_dataset(ds, uri: str, mode: str = "overwrite",
                  partition_cols: list[str] | None = None,
                  rows_per_file: int | None = None,
                  key_stats: str | None = None) -> int:
    """Stream a Ray Dataset into fragments (one per output block), commit once.

    The write itself is Ray-parallel (``Dataset.write_parquet``); the commit
    is a single driver-side manifest rename, so a crashed write leaves no
    visible version (all-or-nothing, like a Lance commit).

    ``partition_cols`` (S5, cc_corpus.py:178-184 / final_cc
    cc_corpus.py:443-459 semantics): hive-style per-key directory layout
    under ``fragments/``; each manifest entry records its partition values,
    so ``read(partition_filter=...)`` prunes whole fragments.
    ``rows_per_file`` (S6, cc_corpus.py:439-451 100k-row roll): both min and
    max rows per output file.
    ``key_stats``: record per-fragment [min, max] of this column in the
    manifest — the range index used by the phase-D partitioned decision
    join (min/max are recomputed from a single-column scan of each staged
    file, NOT taken from parquet column statistics: those may be truncated
    for strings, and a truncated max compares below real values).
    """
    fdir = os.path.join(uri, _FRAG_DIR)
    os.makedirs(fdir, exist_ok=True)
    stage = os.path.join(uri, f".stage-{uuid.uuid4().hex}")
    wargs = {}
    if partition_cols:
        wargs["partition_cols"] = list(partition_cols)
    if rows_per_file:
        wargs["min_rows_per_file"] = rows_per_file
        wargs["max_rows_per_file"] = rows_per_file
    ds.write_parquet(stage, **wargs)
    frags = [] if mode == "overwrite" or not _versions(uri) else list(manifest(uri)["fragments"])
    schema_str = None
    staged = []
    for root, _dirs, files in os.walk(stage):
        for f in files:
            if f.endswith(".parquet"):
                staged.append(os.path.relpath(os.path.join(root, f), stage))
    for rel in sorted(staged):
        src = os.path.join(stage, rel)
        md = pq.read_metadata(src)
        if schema_str is None:
            schema_str = str(pq.read_schema(src))
        entry = {"rows": md.num_rows}
        subdir = os.path.dirname(rel)           # hive partition dirs, if any
        if subdir:
            os.makedirs(os.path.join(fdir, subdir), exist_ok=True)
            entry["partition"] = _parse_hive(rel)
        name = os.path.join(subdir, f"frag-{uuid.uuid4().hex}.parquet") \
            if subdir else f"frag-{uuid.uuid4().hex}.parquet"
        if key_stats is not None and md.num_rows > 0:
            col = pq.read_table(src, columns=[key_stats])[key_stats]
            import pyarrow.compute as pc
            mm = pc.min_max(col).as_py()
            entry["stats"] = {key_stats: [mm["min"], mm["max"]]}
        os.rename(src, os.path.join(fdir, name))
        entry["path"] = f"{_FRAG_DIR}/{name}"
        frags.append(entry)
    for root, dirs, _files in os.walk(stage, topdown=False):
        for d in dirs:
            os.rmdir(os.path.join(root, d))
    os.rmdir(stage)
    return _commit(uri, frags, schema_str or "")


def _match_partition(entry: dict, partition_filter: dict | None) -> bool:
    if not partition_filter:
        return True
    part = entry.get("partition", {})
    return all(part.get(k) == str(v) for k, v in partition_filter.items())


def fragment_paths(uri: str, version: int | None = None,
                   partition_filter: dict | None = None) -> list[str]:
    return [os.path.join(uri, f["path"]) for f in manifest(uri, version)["fragments"]
            if _match_partition(f, partition_filter)]


def partition_values(uri: str, col: str, version: int | None = None) -> list[str]:
    """Distinct values of a hive partition column across fragments."""
    return sorted({f["partition"][col] for f in manifest(uri, version)["fragments"]
                   if col in f.get("partition", {})})


def read(uri: str, columns: list[str] | None = None, version: int | None = None,
         partition_filter: dict | None = None, **read_kwargs):
    """Open a lancelite table as a Ray Dataset (fragment-parallel scan).
    ``partition_filter={"lang": "en"}`` prunes fragments by the manifest's
    hive partition values — whole files never leave storage (S4+S5).

    Hive-partitioned tables: the partition columns live in the directory
    path, not the file bytes; Ray's parquet reader re-attaches them from
    the hive path segments (verified to work with explicit file paths and
    with ``columns=`` selections that include the partition column)."""
    import ray.data as rd
    paths = fragment_paths(uri, version, partition_filter)
    return rd.read_parquet(paths, columns=columns, **read_kwargs)


def read_arrow(uri: str, columns: list[str] | None = None,
               version: int | None = None,
               partition_filter: dict | None = None) -> pa.Table:
    """Driver-side read for tests / small tables (partition-aware)."""
    entries = [f for f in manifest(uri, version)["fragments"]
               if _match_partition(f, partition_filter)]
    tabs = []
    for e in entries:
        part = e.get("partition", {})
        file_cols = None if columns is None else [c for c in columns
                                                  if c not in part]
        t = pq.read_table(os.path.join(uri, e["path"]), columns=file_cols)
        for c, v in part.items():
            if columns is None or c in columns:
                t = t.append_column(c, pa.array([v] * t.num_rows, pa.string()))
        tabs.append(t)
    return pa.concat_tables(tabs, promote_options="default")


def count_rows(uri: str, version: int | None = None) -> int:
    return manifest(uri, version)["num_rows"]


def compact(uri: str, target_rows_per_fragment: int = 1_000_000) -> int:
    """Table maintenance: rewrite small fragments into ~target-sized ones
    and commit a NEW version (older versions keep reading the original
    fragments — Lance-style time travel). Groups adjacent small fragments,
    rewrites each group as one fragment; fragments already at or above the
    target pass through untouched (no data movement).

    Hive-partitioned tables: fragments merge only WITHIN one partition
    value — the merged file is written under the same ``lang=X/`` subdir
    and carries the group's ``partition`` manifest entry, so
    ``read(partition_filter=...)`` and hive column re-attachment keep
    working on the compacted version (a cross-partition merge would drop
    the partition column entirely: hive files don't store its bytes)."""
    man = manifest(uri)
    fdir = os.path.join(uri, _FRAG_DIR)
    out: list[dict] = []
    group: list[dict] = []
    group_rows = 0

    def flush(group):
        if not group:
            return
        if len(group) == 1:
            out.append(group[0])
            return
        import pyarrow as _pa
        t = _pa.concat_tables(
            [pq.read_table(os.path.join(uri, e["path"])) for e in group],
            promote_options="default")
        # same hive subdir as the group's members (identical by grouping)
        subdir = os.path.dirname(group[0]["path"][len(_FRAG_DIR) + 1:])
        name = f"frag-{uuid.uuid4().hex}.parquet"
        rel = os.path.join(subdir, name) if subdir else name
        pq.write_table(t, os.path.join(fdir, rel))
        entry = {"path": f"{_FRAG_DIR}/{rel}", "rows": t.num_rows}
        if "partition" in group[0]:
            entry["partition"] = dict(group[0]["partition"])
        stats = [e for e in group if "stats" in e]
        if len(stats) == len(group):
            merged = {}
            for col in stats[0]["stats"]:
                vals = [e["stats"][col] for e in group]
                merged[col] = [min(v[0] for v in vals),
                               max(v[1] for v in vals)]
            entry["stats"] = merged
        out.append(entry)

    prev_part = None
    for e in man["fragments"]:
        part = e.get("partition")
        if group and part != prev_part:          # partition boundary
            flush(group); group, group_rows = [], 0
        prev_part = part
        if e["rows"] >= target_rows_per_fragment:
            flush(group); group, group_rows = [], 0
            out.append(e)
            continue
        group.append(e)
        group_rows += e["rows"]
        if group_rows >= target_rows_per_fragment:
            flush(group); group, group_rows = [], 0
    flush(group)
    return _commit(uri, out, man["schema"])

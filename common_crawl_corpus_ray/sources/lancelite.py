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


def write_dataset(ds, uri: str, mode: str = "overwrite") -> int:
    """Stream a Ray Dataset into fragments (one per output block), commit once.

    The write itself is Ray-parallel (``Dataset.write_parquet``); the commit
    is a single driver-side manifest rename, so a crashed write leaves no
    visible version (all-or-nothing, like a Lance commit).
    """
    fdir = os.path.join(uri, _FRAG_DIR)
    os.makedirs(fdir, exist_ok=True)
    stage = os.path.join(uri, f".stage-{uuid.uuid4().hex}")
    ds.write_parquet(stage)
    frags = [] if mode == "overwrite" or not _versions(uri) else list(manifest(uri)["fragments"])
    schema_str = None
    for f in sorted(os.listdir(stage)):
        if not f.endswith(".parquet"):
            continue
        name = f"frag-{uuid.uuid4().hex}.parquet"
        src = os.path.join(stage, f)
        md = pq.read_metadata(src)
        if schema_str is None:
            schema_str = str(pq.read_schema(src))
        os.rename(src, os.path.join(fdir, name))
        frags.append({"path": f"{_FRAG_DIR}/{name}", "rows": md.num_rows})
    os.rmdir(stage)
    return _commit(uri, frags, schema_str or "")


def fragment_paths(uri: str, version: int | None = None) -> list[str]:
    return [os.path.join(uri, f["path"]) for f in manifest(uri, version)["fragments"]]


def read(uri: str, columns: list[str] | None = None, version: int | None = None,
         **read_kwargs):
    """Open a lancelite table as a Ray Dataset (fragment-parallel scan)."""
    import ray.data as rd
    paths = fragment_paths(uri, version)
    return rd.read_parquet(paths, columns=columns, **read_kwargs)


def read_arrow(uri: str, columns: list[str] | None = None,
               version: int | None = None) -> pa.Table:
    """Driver-side read for tests / small tables."""
    paths = fragment_paths(uri, version)
    return pa.concat_tables([pq.read_table(p, columns=columns) for p in paths])


def count_rows(uri: str, version: int | None = None) -> int:
    return manifest(uri, version)["num_rows"]

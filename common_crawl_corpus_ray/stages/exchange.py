"""Manual bucket all-to-all for small packed-partial reduces.

Ray Data's ``groupby(key).map_groups`` runs a sort-based shuffle; on a
dataset of a few thousand *packed* rows (list-valued partials, ~25KB/row)
the sort machinery alone costs ~12s in this sandbox — two orders of
magnitude more than the actual exchange. This helper is the raw-Ray-task
escape hatch the survey reserves for exactly this case (SURVEY.md §2,
"custom operators ... (c) raw Ray tasks/actors as a last resort"):

  map side:   one task per coalesced block, emitting ONE slice per bucket
              (``num_returns`` fan-out), so a reducer fetches only its
              bucket's bytes — the multi-node exchange volume is the data
              size, not data x P
  reduce side: one task per bucket, merging its slices with a caller-
              provided vectorized Arrow reduce

Partitioning assumption: the caller packs rows so that ``bucket`` is in
``[0, nbuckets)`` and all rows of one group land in one bucket. Reducer
outputs are assumed SMALL (stats rows / dup groups only) — they are
returned to the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
def _split_by_bucket(nbuckets: int, *tabs: pa.Table):
    # empty blocks can pass through upstream map_batches without the UDF
    # running, keeping the raw schema — treat any bucket-less block as empty
    present = [t for t in tabs
               if t.num_rows and "bucket" in t.column_names]
    if not present:
        out = (None,) * nbuckets
    else:
        t = (present[0] if len(present) == 1
             else pa.concat_tables(present, promote_options="default"))
        # one argsort + one gather + searchsorted boundary slices — NOT one
        # full pc.equal filter pass per bucket (O(nbuckets x rows) compares;
        # with bucket counts scaled up to 1024 that loop was the map-side
        # hot path of every exchange). Same pattern as
        # connected_components.propagate's dst-bucket fan-out.
        bkt = t["bucket"].to_numpy(zero_copy_only=False)
        order = np.argsort(bkt, kind="stable")
        ts = t.take(pa.array(order)).combine_chunks()
        bounds = np.searchsorted(bkt[order], np.arange(nbuckets + 1))
        out = tuple(
            ts.slice(bounds[b], bounds[b + 1] - bounds[b])
            if bounds[b + 1] > bounds[b] else None
            for b in range(nbuckets))
    return out if nbuckets > 1 else out[0]


@ray.remote
def _reduce_bucket(reduce_fn, *slices) -> pa.Table | None:
    present = [s for s in slices if s is not None]
    if not present:
        return None
    t = pa.concat_tables(present, promote_options="default")
    return reduce_fn(t)


@ray.remote
def _none_to_empty(t: pa.Table | None, empty: pa.Table) -> pa.Table:
    return empty if t is None else t


def bucket_exchange_refs(ds, nbuckets: int, reduce_fn) -> list:
    """Like :func:`bucket_exchange` but the per-bucket reduce outputs STAY
    in the object store (a list of ObjectRef[pa.Table | None]) — the scale
    path when reducer outputs are row-level (dup flags, joined pairs), not
    tiny stats. Compose further stages from the refs without ever landing
    the data on the driver.

    The map side chunks the executed block refs into ~``nbuckets`` split
    groups and concatenates inside each split task — the same per-task
    data volume a ``repartition(nbuckets)`` would produce, without paying
    that AllToAll's full extra pass over the data (one Ray Data job + a
    serialize/deserialize of every row, ~1s fixed + O(data) per exchange)."""
    blocks = ds.to_arrow_refs()
    if not blocks:
        return []
    group = max(1, -(-len(blocks) // nbuckets))
    slices = [
        _split_by_bucket.options(num_returns=nbuckets).remote(
            nbuckets, *blocks[i:i + group])
        for i in range(0, len(blocks), group)
    ]
    if nbuckets == 1:
        slices = [[s] for s in slices]
    return [
        _reduce_bucket.remote(reduce_fn, *[m[b] for m in slices])
        for b in range(nbuckets)
    ]


def bucket_exchange(ds, nbuckets: int, reduce_fn) -> list[pa.Table]:
    """All-to-all a Dataset with an int ``bucket`` column in [0, nbuckets)
    through ``reduce_fn`` (pa.Table -> pa.Table, vectorized) per bucket;
    returns the per-bucket reduce outputs (driver-resident, must be small).
    """
    outs = bucket_exchange_refs(ds, nbuckets, reduce_fn)
    return [t for t in ray.get(outs) if t is not None]


def refs_to_dataset(refs, empty: pa.Table):
    """Turn reduce-output refs into a ``ray.data.Dataset`` without driver
    materialization. ``empty`` supplies the schema for None (empty-bucket)
    refs."""
    import ray.data as rd
    if not refs:
        return rd.from_arrow(empty)
    return rd.from_arrow_refs([_none_to_empty.remote(r, empty) for r in refs])


def bucket_exchange_dataset(ds, nbuckets: int, reduce_fn, empty: pa.Table):
    """Exchange whose reduce outputs become a new ``ray.data.Dataset``
    (zero driver materialization). ``empty`` supplies the schema for
    buckets that received no rows."""
    return refs_to_dataset(bucket_exchange_refs(ds, nbuckets, reduce_fn), empty)


@ray.remote
def _num_rows(t: pa.Table | None) -> int:
    return 0 if t is None else t.num_rows


def total_rows(refs) -> int:
    """Row count across reduce-output refs without fetching the tables."""
    return sum(ray.get([_num_rows.remote(r) for r in refs])) if refs else 0

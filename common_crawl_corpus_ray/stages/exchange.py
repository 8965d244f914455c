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

import pyarrow as pa
import pyarrow.compute as pc
import ray


@ray.remote
def _split_by_bucket(t: pa.Table, nbuckets: int):
    # empty blocks can pass through upstream map_batches without the UDF
    # running, keeping the raw schema — treat any bucket-less block as empty
    if t.num_rows == 0 or "bucket" not in t.column_names:
        out = (None,) * nbuckets
    else:
        out = tuple(t.filter(pc.equal(t["bucket"], b)) for b in range(nbuckets))
    return out if nbuckets > 1 else out[0]


@ray.remote
def _reduce_bucket(reduce_fn, *slices) -> pa.Table | None:
    present = [s for s in slices if s is not None]
    if not present:
        return None
    t = pa.concat_tables(present, promote_options="default")
    return reduce_fn(t)


def bucket_exchange(ds, nbuckets: int, reduce_fn) -> list[pa.Table]:
    """All-to-all a Dataset with an int ``bucket`` column in [0, nbuckets)
    through ``reduce_fn`` (pa.Table -> pa.Table, vectorized) per bucket;
    returns the per-bucket reduce outputs (driver-resident, must be small).
    """
    blocks = ds.repartition(nbuckets).to_arrow_refs()
    if not blocks:
        return []
    slices = [
        _split_by_bucket.options(num_returns=nbuckets).remote(ref, nbuckets)
        for ref in blocks
    ]
    if nbuckets == 1:
        slices = [[s] for s in slices]
    outs = [
        _reduce_bucket.remote(reduce_fn, *[m[b] for m in slices])
        for b in range(nbuckets)
    ]
    return [t for t in ray.get(outs) if t is not None]

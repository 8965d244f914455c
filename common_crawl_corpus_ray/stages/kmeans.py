"""Distributed full-table k-means (Lloyd) over an embedding column.

Unlike ann._kmeans — a driver-side SAMPLE quantizer used to train the IVF
coarse index — this clusters EVERY row: the semantic-curation stage of a
training-data pipeline (topic bucketing, cluster-balanced sampling,
per-cluster dedup). The reference has no clustering; this extends its
corpus-statistics layer (geoWAC.py:219-220 rollups) to embedding space.

Scale shape (the textbook Ray Data decomposition):
- centroids are tiny (k x d floats) and broadcast once per iteration via
  ``ray.put``; each task reads them from the object store, never per-batch.
- each iteration is ONE streaming pass: ``map_batches`` emits k partial
  rows per block (per-cluster vector sums + counts), so the driver
  collects O(k * d * n_blocks) floats — never rows.
- the reduce is ORDER-FIXED: partials are sorted by (block_key, cluster)
  before accumulation, so centroid floats are bit-identical across runs
  and task-completion orders (float addition is not associative; an
  unordered reduce would make assignments flicker on near-boundary points
  and break golden pins). Note the remaining dependence: a different
  BLOCK STRUCTURE (row-to-block mapping) regroups the partial sums and
  can shift last bits — for parquet inputs the structure is
  file-boundary-determined and stable, which is what the pins rely on.
- the final labeling pass is the same streaming map, emitting (id,
  cluster) rows.

Cost: iters+1 passes over the table — Lloyd's intrinsic shape. Empty
clusters keep their previous centroid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _to_matrix


def _block_partials(b: pa.Table, id_col: str, vec_col: str,
                    cents: np.ndarray) -> pa.Table:
    X = _to_matrix(b[vec_col])
    ids = b[id_col].to_numpy(zero_copy_only=False)
    # argmin ||x-c||^2 == argmin (||c||^2 - 2 x.cT); ||x||^2 is constant/row
    scores = X @ cents.T * -2.0 + (cents * cents).sum(axis=1)
    assign = np.argmin(scores, axis=1)
    k, d = cents.shape
    sums = np.zeros((k, d), dtype=np.float64)
    np.add.at(sums, assign, X)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    # block_key: a stable per-block identity for the ordered reduce
    bkey = int(ids.min()) if len(ids) else -1
    return pa.table({
        "bkey": pa.array([bkey] * k, pa.int64()),
        "cluster": pa.array(np.arange(k, dtype=np.int64)),
        "count": pa.array(counts),
        "sums": pa.array(list(sums), pa.list_(pa.float64())),
    })


def kmeans_assign(ds, id_col: str, vec_col: str, k: int = 10,
                  iters: int = 10, return_centroids: bool = False):
    """Cluster every row; return a Dataset of (id_col, cluster) — or
    (dataset, centroids) with ``return_centroids`` (test/diagnostic hook).

    Init: the embeddings of the k smallest ids (deterministic, one bounded
    distributed filter — ids are assumed unique; any k distinct rows work,
    first-k keeps the seed replicable)."""
    import pyarrow.compute as pc

    import ray

    def seed_rows(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b[id_col], k))

    seed = pa.concat_tables(
        ds.map_batches(seed_rows, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    seed = seed.sort_by(id_col)
    cents = _to_matrix(seed[vec_col])
    assert cents.shape[0] == k, f"need ids 0..{k-1} present for seeding"

    for _ in range(iters):
        cref = ray.put(cents)

        def partial(b: pa.Table, _ref=cref) -> pa.Table:
            return _block_partials(b, id_col, vec_col, ray.get(_ref))

        parts = pa.concat_tables(
            ds.map_batches(partial, batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow"))
        # ordered reduce: deterministic centroid floats (see module doc)
        parts = parts.sort_by([("bkey", "ascending"), ("cluster", "ascending")])
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(cents)
        pcnt = parts["count"].to_numpy(zero_copy_only=False)
        pclu = parts["cluster"].to_numpy(zero_copy_only=False)
        psum = _to_matrix(parts["sums"])
        # np.add.at accumulates in ROW order (sequential C loop over the
        # index array), so on the sorted partials it reproduces the
        # ordered reduce bit-for-bit while keeping the driver-side cost
        # C-level even at n_blocks x k partial rows
        np.add.at(counts, pclu, pcnt)
        np.add.at(sums, pclu, psum)
        nonempty = counts > 0
        cents = cents.copy()
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]

    cref = ray.put(cents)

    def label(b: pa.Table, _ref=cref) -> pa.Table:
        cc = ray.get(_ref)
        X = _to_matrix(b[vec_col])
        scores = X @ cc.T * -2.0 + (cc * cc).sum(axis=1)
        return pa.table({
            id_col: b[id_col],
            "cluster": pa.array(np.argmin(scores, axis=1).astype(np.int64)),
        })

    out = ds.map_batches(label, batch_format="pyarrow")
    return (out, cents) if return_centroids else out

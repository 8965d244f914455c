"""Distributed k-means invariants. The embeddings fixture is
near-isotropic (its planted labels are NOT geometrically recoverable —
oracle-centroid purity is only 0.37, see test_golden_rowsonly's ANN
notes), so recovery is tested on constructed well-separated blobs and the
fixture run is pinned by determinism + self-consistency + the golden hash
in test_golden_rowsonly.py."""

import numpy as np
import pyarrow as pa

from common_crawl_corpus_ray.stages.kmeans import kmeans_assign

SF = "/root/testdata/sf0.001"


def _blob_table(k: int = 3, per: int = 100, d: int = 16) -> pa.Table:
    """k tight gaussian blobs, centers 10 apart, noise sigma 0.05; ids
    0..k-1 land one per blob (the first-k seeding then starts one centroid
    inside each blob)."""
    rng = np.random.default_rng(7)
    centers = np.zeros((k, d))
    for j in range(k):
        centers[j, j] = 10.0
    rows = []
    ids = []
    truth = []
    for i in range(k * per):
        blob = i % k          # ids 0..k-1 hit blobs 0..k-1
        rows.append(centers[blob] + 0.05 * rng.standard_normal(d))
        ids.append(i)
        truth.append(blob)
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in rows],
                              pa.list_(pa.float64())),
        "truth": pa.array(truth, pa.int64()),
    })


def test_kmeans_recovers_separated_blobs(ray_session):
    import ray.data as rd
    t = _blob_table()
    ds = rd.from_arrow(t.select(["vec_id", "embedding"]))
    out = kmeans_assign(ds, "vec_id", "embedding", k=3, iters=5).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    truth = t["truth"].to_numpy(zero_copy_only=False)
    # seeding puts centroid j inside blob j, so recovery is exact AND
    # cluster ids align with blob ids
    assert (out["cluster"].to_numpy() == truth).all()


def test_kmeans_self_consistent_and_deterministic(ray_session):
    """Every row must be assigned to its nearest FINAL centroid (exact
    argmin recomputed in numpy), and a second run must be identical."""
    import ray.data as rd
    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out, cents = kmeans_assign(ds, "vec_id", "embedding", k=10, iters=10,
                               return_centroids=True)
    df = out.to_pandas().sort_values("vec_id").reset_index(drop=True)
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).sort_by("vec_id")
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    scores = X @ cents.T * -2.0 + (cents * cents).sum(axis=1)
    assert (df["cluster"].to_numpy() == scores.argmin(axis=1)).all()
    assert df["cluster"].nunique() == 10

    df2 = (kmeans_assign(rd.read_parquet(f"{SF}/embeddings.parquet",
                                         columns=["vec_id", "embedding"]),
                         "vec_id", "embedding", k=10, iters=10)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert df.equals(df2)

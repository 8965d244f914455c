"""Distributed near-dup verification: the round-2 de-drivered minhash path
must produce exactly the pairs an exact all-pairs Jaccard finds (on the
mutated fixture the LSH banding has ~1 recall, and both sides are
deterministic), and the vectorized simhash must be bit-identical to the
scalar reference."""

import numpy as np
import pytest

from common_crawl_corpus_ray.stages import dedup_family as df

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.7


def _exact_pairs(ids, texts, threshold):
    sh = [np.unique(df._shingle_hashes(t)) for t in texts]
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sh[i], sh[j]
            inter = np.intersect1d(a, b, assume_unique=True).size
            union = a.size + b.size - inter
            jac = inter / union if union else 1.0
            if jac >= threshold:
                x, y = sorted((ids[i], ids[j]))
                out.add((x, y))
    return out


def test_minhash_pairs_vs_exact_jaccard(ray_session):
    """Precision is EXACT (every emitted pair passes true Jaccard >=
    threshold — the distributed verify guarantees it); recall is the LSH
    S-curve's: pairs near the threshold may be missed (J=0.82 has capture
    p~0.83 at 8x8 banding), high-J pairs are all caught. Deterministic for
    fixed data + seed."""
    from common_crawl_corpus_ray.pipelines import clips_queries as C
    ds = C.mutated_docs(SF)
    got = df.minhash_dedup_pairs(ds, "doc_id", "text", threshold=THRESHOLD)
    got_pairs = set(zip(got["id_a"].astype(int), got["id_b"].astype(int)))

    t = ds.to_pandas()
    ids, texts = t["doc_id"].tolist(), t["text"].tolist()
    want = _exact_pairs(ids, texts, THRESHOLD)
    high = _exact_pairs(ids, texts, 0.93)
    assert len(want) > 0          # fixture must exercise the detector
    assert got_pairs <= want      # exact precision
    assert high <= got_pairs      # every high-J pair caught
    assert len(got_pairs) >= 0.9 * len(want)   # recall floor (measured 1 miss)
    assert (got["jaccard"] >= THRESHOLD).all()


def test_minhash_no_driver_candidate_set(ray_session, monkeypatch):
    """The banding stage must return a Dataset (scale contract), and the
    flow must never call take_all on it."""
    import ray.data
    from common_crawl_corpus_ray.pipelines import clips_queries as C

    def boom(self, *a, **k):
        raise AssertionError("take_all in distributed minhash path")

    monkeypatch.setattr(ray.data.Dataset, "take_all", boom)
    ds = C.mutated_docs(SF)
    out = df.minhash_dedup_pairs(ds, "doc_id", "text", threshold=THRESHOLD)
    monkeypatch.undo()
    assert len(out) > 0


def test_embedding_lsh_bucket_cap_keeps_planted_pairs(ray_session):
    """Forcing the secondary split (cap=10) must still find every planted
    exact-copy pair — identical vectors agree on the secondary planes."""
    from common_crawl_corpus_ray.pipelines import clips_queries as C
    ds = C.planted_embeddings(SF)
    capped = df.embedding_dup_pairs_lsh(ds, "vec_id", "embedding",
                                        threshold=0.99, max_bucket_rows=10)
    planted = ((capped["id_b"] - capped["id_a"]) == 1_000_000).sum()
    assert planted == 20


def test_ngram_df_cap_bounds_universal_shingle(ray_session):
    """A boilerplate shingle present in EVERY doc must not quadratically
    pair all docs: with the df cap it leaves the representation, and the
    result equals a brute-force Jaccard over the capped shingle sets."""
    import ray.data as rd
    import pyarrow as pa

    boiler = "click here now"
    n_docs = 60
    texts = [f"{boiler} unique{i} token{i} filler{i} alpha{i} beta{i}"
             for i in range(n_docs)]
    # two genuine near-dup pairs that share their non-boilerplate shingles
    texts[1] = texts[0] + " tail"
    texts[3] = texts[2]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(n_docs)),
                                 "text": texts}))
    got = df.ngram_jaccard_pairs(ds, "doc_id", "text", n=3, threshold=0.5,
                                 max_df=5)

    # brute force over capped representation
    sets = [df.word_ngrams(t, 3) for t in texts]
    from collections import Counter
    dfc = Counter(sh for s in sets for sh in s)
    sets = [{sh for sh in s if dfc[sh] <= 5} for s in sets]
    want = set()
    for i in range(n_docs):
        for j in range(i + 1, n_docs):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if union and inter / union >= 0.5:
                want.add((i, j))
    got_pairs = set(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
    assert got_pairs == want
    assert (0, 1) in got_pairs and (2, 3) in got_pairs
    # without the cap the universal shingle alone pairs all 60 docs
    assert len(got_pairs) < 100


def test_identical_doc_flood_collapses(ray_session):
    """The 100-TB scale-killer guard: 10k byte-identical docs must emit
    O(n) star pairs (rep -> member, J=1.0), never the O(n^2) all-pairs the
    naive (band, bh) self-merge would produce inside one reduce task."""
    import pyarrow as pa
    import ray.data as rd

    n_flood = 10_000
    text = "the same boilerplate sentence repeated across the whole crawl"
    texts = [text] * n_flood
    # one genuine near-dup pair of a DIFFERENT text, to prove collapse
    # doesn't break ordinary candidates
    other = "completely different content about rivers and mountains " * 3
    texts += [other, other + " extra"]
    ids = list(range(n_flood + 2))
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))

    got = df.minhash_dedup_pairs(ds, "doc_id", "text", threshold=THRESHOLD)
    stars = got[(got["id_a"] == 0) & (got["jaccard"] == 1.0)]
    assert len(stars) == n_flood - 1          # one star edge per extra copy
    assert (n_flood, n_flood + 1) in set(
        zip(got["id_a"].astype(int), got["id_b"].astype(int)))
    # bounded output: stars + the near-dup pair, NOT ~5e7 all-pairs
    assert len(got) == n_flood

    # cluster assignment re-expands members through the star edges
    clusters = df.dedup_clusters(ds, "doc_id", "text", threshold=THRESHOLD,
                                 detector="minhash",
                                 n_rows=len(ids)).to_pandas()
    lab = dict(zip(clusters["doc_id"].astype(int),
                   clusters["cluster"].astype(int)))
    assert all(lab[i] == 0 for i in range(n_flood))
    assert lab[n_flood] == lab[n_flood + 1] == n_flood


def test_identical_doc_flood_simhash(ray_session):
    """Same collapse guarantee for the simhash banding: identical texts
    star on their min id with hamming 0."""
    import pyarrow as pa
    import ray.data as rd

    n_flood = 5_000
    text = "another boilerplate block that floods the simhash banding"
    ds = rd.from_arrow(pa.table({"doc_id": list(range(n_flood)),
                                 "text": [text] * n_flood}))
    got = df.simhash_dedup_pairs(ds, "doc_id", "text", max_hamming=8,
                                 n_rows=n_flood)
    assert len(got) == n_flood - 1
    assert (got["id_a"] == 0).all() and (got["hamming"] == 0).all()


def test_collapse_hot_group_cap():
    """Near-identical floods (distinct texts, one shared (band, bh) group)
    above LSH_GROUP_CAP emit hub-star candidates — O(g), not O(g^2)."""
    import pandas as pd

    g = pd.DataFrame({
        "id": list(range(3000)),
        "band": [0] * 3000,
        "bh": [7] * 3000,
        "th": list(range(3000)),          # all texts distinct
    })
    stars, cands = df._collapse_and_pair(g, ["band", "bh"], "band", cap=100)
    assert len(stars) == 0
    assert len(cands) == 2999             # hub-star, not ~4.5M all-pairs
    assert (cands["rep_x"] == 0).all()


def test_minhash_batch_parity():
    """The vectorized signature path must be bit-identical to the scalar
    reference (including the <k-char space-padding edge)."""
    texts = ["the quick brown fox jumps over it " * 6, "", "ab", "hello",
             "a b c d e " * 30, "x" * 4, "exactly5"]
    a, b = df._perm_params(64)
    got = df.minhash_signatures_batch(texts, a, b)
    want = np.stack([df.minhash_signature(t, a, b) for t in texts])
    assert got.dtype == np.uint64 and (got == want).all()


def test_simhash_batch_parity():
    texts = ["the quick brown fox " * 4, "", "   ", "héllo wörld", "one",
             "a b c " * 40, "日本語 テスト 文章", "x" * 100]
    got = df.simhash64_batch(texts)
    want = np.array([df.simhash64(t) for t in texts], dtype=np.uint64)
    assert (got == want).all()


def test_hamming_batch_parity():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2**63, 500, dtype=np.int64).astype(np.uint64)
    y = rng.integers(0, 2**63, 500, dtype=np.int64).astype(np.uint64)
    got = df.hamming64_batch(x, y)
    want = np.array([df.hamming64(int(a), int(b)) for a, b in zip(x, y)])
    assert (got == want).all()


def test_connected_components_chain_clique_singleton(ray_session):
    """Min-label propagation must converge past a single round: a 6-node
    CHAIN (diameter 5) needs several propagation rounds; a clique resolves
    in one; nodes with no edges become their own singleton clusters."""
    import pandas as pd
    import ray.data as rd

    pairs = pd.DataFrame({
        # chain 10-11-12-13-14-15 (edges only between neighbours)
        "id_a": [10, 11, 12, 13, 14,
                 # clique {20, 21, 22}
                 20, 20, 21,
                 # two-node component {30, 31}
                 30],
        "id_b": [11, 12, 13, 14, 15,
                 21, 22, 22,
                 31],
    })
    ids = pd.DataFrame({"doc_id": [10, 11, 12, 13, 14, 15,
                                   20, 21, 22, 30, 31,
                                   40, 41]})       # 40, 41: singletons
    out = df.connected_components(
        rd.from_pandas(pairs), rd.from_pandas(ids), "doc_id",
        n_rows=len(ids)).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["cluster"].astype(int)))
    want = {10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10,
            20: 20, 21: 20, 22: 20, 30: 30, 31: 30, 40: 40, 41: 41}
    assert got == want


def test_connected_components_two_level_scatter(ray_session):
    """Forcing >32 buckets exercises the sqrt(nb) scatter wave (the
    bounded-ref-fan-out path); results must equal the direct path's."""
    import pandas as pd
    import ray.data as rd

    pairs = pd.DataFrame({"id_a": [10, 11, 12, 13, 14, 20, 20, 21, 30],
                          "id_b": [11, 12, 13, 14, 15, 21, 22, 22, 31]})
    ids = pd.DataFrame({"doc_id": [10, 11, 12, 13, 14, 15,
                                   20, 21, 22, 30, 31, 40, 41]})
    out = df.connected_components(
        rd.from_pandas(pairs), rd.from_pandas(ids), "doc_id",
        n_rows=40_000).to_pandas()          # nb=128 -> scatter path
    got = dict(zip(out["doc_id"].astype(int), out["cluster"].astype(int)))
    want = {10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10,
            20: 20, 21: 20, 22: 20, 30: 30, 31: 30, 40: 40, 41: 41}
    assert got == want


def test_connected_components_rejects_string_ids(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    pairs = pd.DataFrame({"id_a": ["a"], "id_b": ["b"]})
    ids = pd.DataFrame({"doc_id": ["a", "b"]})
    with pytest.raises(TypeError, match="integer"):
        df.connected_components(rd.from_pandas(pairs), rd.from_pandas(ids),
                                "doc_id", n_rows=2)


def test_dedup_clusters_matches_pair_graph(ray_session):
    """Cluster assignment over the mutated fixture: every verified ngram
    pair's two sides must share a cluster, and the canonical id is the
    component minimum."""
    from common_crawl_corpus_ray.pipelines import clips_queries as C
    ds = C.mutated_docs(SF)
    pairs = df.ngram_jaccard_pairs(ds, "doc_id", "text", threshold=0.5)
    out = df.dedup_clusters(ds, "doc_id", "text", threshold=0.5).to_pandas()
    lab = dict(zip(out["doc_id"].astype(int), out["cluster"].astype(int)))
    assert len(out) == ds.count()
    for a, b in zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)):
        assert lab[a] == lab[b]
    # canonical representative is a member of its own cluster
    for v, c in lab.items():
        assert lab[c] == c
        assert c <= v


def test_dedup_clusters_minhash_detector(ray_session):
    """The minhash detector composes with connected components without the
    pair list ever landing on the driver; every verified minhash pair's
    sides share a cluster."""
    from common_crawl_corpus_ray.pipelines import clips_queries as C
    ds = C.mutated_docs(SF)
    pairs = df.minhash_dedup_pairs(ds, "doc_id", "text", threshold=THRESHOLD)
    out = df.dedup_clusters(ds, "doc_id", "text", threshold=THRESHOLD,
                            detector="minhash").to_pandas()
    lab = dict(zip(out["doc_id"].astype(int), out["cluster"].astype(int)))
    assert len(out) == ds.count()
    assert len(pairs) > 0
    for a, b in zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)):
        assert lab[a] == lab[b]


def test_near_index_evolution_versions_and_pinning(ray_session):
    """Text-axis multi-crawl evolution semantics at sf0.001: the evolved
    band/text tables end at lancelite version 2, a second run does not
    re-append and returns the identical survivor set, and the
    version-1-pinned dedup_incremental_near returns the identical result
    before and after the append (whatever the execution order)."""
    from common_crawl_corpus_ray.pipelines import analytics as A
    from common_crawl_corpus_ray.sources import lancelite

    before = (A.dedup_incremental_near(SF).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))

    evo = (A.near_index_evolution(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    tag = A._content_tag(SF)
    buri = f"/tmp/ccc_prior_band_idx_{tag}"
    turi = f"/tmp/ccc_prior_text_idx_{tag}"
    assert lancelite.latest_version(buri) == 2
    assert lancelite.latest_version(turi) == 2

    evo2 = (A.near_index_evolution(SF).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert lancelite.latest_version(buri) == 2   # no re-append
    assert evo.equals(evo2)

    after = (A.dedup_incremental_near(SF).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert before.equals(after)


def test_evolved_index_compaction_preserves_probe(ray_session, tmp_path):
    """LSM maintenance on the evolved band index: lancelite.compact merges
    the prior run and the appended survivor run into fewer fragments
    (committing a new version); content and range-probe results must be
    identical. Probes go through KeyedBatchJoiner, which key-sorts each
    fragment at load, so a merged fragment holding two sorted runs is
    re-sorted — this pins that property against regressions."""
    import shutil

    import pyarrow as pa
    from common_crawl_corpus_ray.pipelines import analytics as A
    from common_crawl_corpus_ray.sources import lancelite
    from common_crawl_corpus_ray.sources.keyed import (KeyedBatchJoiner,
                                                       KeyedFragmentIndex)

    A.near_index_evolution(SF).count()          # ensure evolved state
    tag = A._content_tag(SF)
    buri = f"/tmp/ccc_prior_band_idx_{tag}"
    copy = str(tmp_path / "band")
    shutil.copytree(buri, copy)

    before = len(lancelite.manifest(copy)["fragments"])
    lancelite.compact(copy, target_rows_per_fragment=1_000_000)
    after = len(lancelite.manifest(copy)["fragments"])
    assert after < before

    order = [("bk", "ascending"), ("doc_id", "ascending"),
             ("band", "ascending")]
    a = lancelite.read_arrow(copy).sort_by(order)
    b = lancelite.read_arrow(buri).sort_by(order)
    assert a.equals(b)

    def scan(uri, keys):
        """All (band, bh, doc_id) rows whose bk equals any probe key —
        the _BandProbe gather, replicated row-for-row."""
        j = KeyedBatchJoiner(KeyedFragmentIndex(uri, "bk"))
        skeys, stable = j._side_for(keys)
        lo = np.searchsorted(skeys, keys, "left")
        hi = np.searchsorted(skeys, keys, "right")
        rows = [stable.slice(int(l), int(h - l)) for l, h in zip(lo, hi)]
        t = pa.concat_tables([r for r in rows if r.num_rows])
        return t.select(["band", "bh", "doc_id"]).sort_by(
            [("bh", "ascending"), ("doc_id", "ascending"),
             ("band", "ascending")])

    # probe every 7th distinct bk (both runs' key ranges overlap)
    bks = np.unique(b["bk"].to_numpy())[::7]
    assert scan(copy, bks).equals(scan(buri, bks))


def test_embedding_index_evolution_versions(ray_session):
    """Embedding-axis evolution semantics at sf0.001: the sig-keyed index
    ends at version 2, a second run does not re-append and returns the
    identical survivor set, and survivors are exactly the crawl-2 fresh
    negations (the -0.5x copies of appended negations and the exact
    copies of prior vectors are all dropped)."""
    from common_crawl_corpus_ray.pipelines import analytics as A
    from common_crawl_corpus_ray.sources import lancelite

    evo = (A.embedding_index_evolution(SF).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    tag = A._content_tag(SF, table="embeddings")
    euri = f"/tmp/ccc_prior_emb_idx_{tag}"
    assert lancelite.latest_version(euri) == 2

    evo2 = (A.embedding_index_evolution(SF).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))
    assert lancelite.latest_version(euri) == 2   # no re-append
    assert evo.equals(evo2)

    want = [A._EVO_EMB_BASE2 + i
            for i in range(A._EVO_EMB_C2N_LO, A._EVO_EMB_C2N_HI)]
    assert evo["vec_id"].tolist() == want

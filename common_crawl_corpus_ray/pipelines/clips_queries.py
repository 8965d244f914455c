"""Clips-table queries: flagship pipeline + audio stages, parameterized by
the driver's sf directory.

The clips table is not part of the driver's testdata, so it is synthesized
deterministically (seed-per-clip_id) at a size proportional to the sf and
cached under /tmp — same content for a given size regardless of
parallelism. Everything downstream is the real pipeline.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..audio import codecs
# module-level (worker-executed _SemiProbe.__init__ resolves this through
# the registered module; a function-level import would re-run on the
# worker and fail without the repo on its path)
from ..sources.keyed import KeyedBatchJoiner
from ..synth import clips

def _strip_meta(b: pa.Table) -> pa.Table:
    """Schema-only, zero-copy: the driver's fixture parquets carry
    b'pandas' schema metadata, which makes pa.Schema unhashable and
    trips Ray's block-schema dedup warning; strip at the source (the
    analytics._read rule)."""
    return b.replace_schema_metadata(None)


def _read_fixture(sf_dir: str, table: str, columns):
    import ray.data as rd
    return (rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                            columns=columns)
            .map_batches(_strip_meta, batch_format="pyarrow",
                         batch_size=None))

_CACHE_ROOT = "/tmp/ccc_ray_cache"
_CLIPS_PER_LINEITEM = 6    # lineitem is the only table that scales ~linearly
                           # with sf (documents stays ~500); 1k/10k/100k clips
                           # at sf 0.001/0.01/0.1


def clips_count(sf_dir: str) -> int:
    md = pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet")).metadata
    return md.num_rows // _CLIPS_PER_LINEITEM


def ensure_clips(sf_dir: str, with_audio: bool = True) -> str:
    """Generate (once) and return the parquet dir of the synthetic clips
    table for this sf. Generation itself is a Ray Data pipeline."""
    return ensure_clips_n(clips_count(sf_dir), with_audio)


def ensure_clips_n(n: int, with_audio: bool = True) -> str:
    import ray.data as rd
    # v3: multi-fragment layout, >=256 fragments for big tables — with
    # fewer, a 30-actor pool gets ~2 read tasks per actor and straggler
    # quantization destroys scaling (measured 0.56 vs 0.78 efficiency on
    # the same input at 64 vs 128+ fragments)
    uri = os.path.join(_CACHE_ROOT, f"clips_{n}_{'a' if with_audio else 'na'}_v3")
    marker = os.path.join(uri, "_SUCCESS")
    if os.path.exists(marker):
        return uri

    def gen(batch: pa.Table) -> pa.Table:
        t = clips.gen_batch(batch["id"].to_numpy(), n, with_audio=with_audio)
        return t.select(clips.CLIPS_COLUMNS)

    tmp = uri + ".tmp"
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(uri, ignore_errors=True)
    # multiple fragments per table (the realistic shape — a big table is
    # many fragments); also the planning unit for resumable partitioning
    rows_per_file = max(256, n // 256)
    (rd.range(n)
     .map_batches(gen, batch_format="pyarrow", batch_size=2048)
     .write_parquet(tmp, min_rows_per_file=rows_per_file,
                    max_rows_per_file=rows_per_file))
    os.rename(tmp, uri)
    with open(marker, "w") as f:
        f.write(str(n))
    return uri


SLIM_RESULT_COLUMNS = [
    "clip_id", "transcript_scrubbed", "lang", "lang2", "lang_agree",
    "n_words", "text_hash", "is_dup", "ppl", "z_score", "ppl_bucket",
    "drop_reason", "keep",
]


def clips_pipeline(sf_dir: str, with_audio: bool = False):
    """The flagship: full keep/drop + scrub decision table (slim columns)."""
    import ray.data as rd
    from . import quality_filter
    uri = ensure_clips(sf_dir, with_audio=with_audio)
    ds = rd.read_parquet(uri, columns=["clip_id", "transcript"])
    out = quality_filter.run(ds, attach_payload=False)
    return out.select_columns(SLIM_RESULT_COLUMNS)


def audio_decode_stats(sf_dir: str):
    """Multimodal stage: decode every payload per codec, verify SNR vs the
    per-clip ground truth, aggregate per codec (the audio-equivalent
    invariant M19; audio libs are absent so codecs are our numpy G.711).

    Scale shape: the per-codec stats are associative (count/min/sum/and),
    so each block emits <= len(CODECS) partial rows — the payload bytes and
    the 1-row-per-clip SNR table never enter a shuffle. ``batch_size=None``
    keeps one batch per read block (re-batching would copy every payload,
    and it lets Ray fuse read+decode into one task); payload access is
    zero-copy (``as_buffer`` slices of the Arrow binary column feed
    ``np.frombuffer`` directly). The final merge is one task over
    O(blocks x |CODECS|) tiny partial rows — a few MB even at 10^12 clips /
    10^6 fragments, so no sort-based groupby is warranted."""
    import ray.data as rd
    uri = ensure_clips(sf_dir, with_audio=True)
    ds = rd.read_parquet(uri, columns=["clip_id", "bytes", "sr_hz", "codec"])

    def decode_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        idx = pc.cast(pc.utf8_slice_codeunits(b["clip_id"], 5, 32),
                      pa.int64()).to_numpy()
        srs = b["sr_hz"].to_numpy(zero_copy_only=False)
        cods = b["codec"].to_pylist()
        payloads = b["bytes"].combine_chunks()
        stats: dict[str, list] = {}   # codec -> [n, min_snr, total_samples, all_ok]
        for k in range(b.num_rows):
            codec = cods[k]
            payload = payloads[k].as_buffer()
            n = codecs.num_samples(len(payload), codec)
            truth = clips.ground_truth_pcm(int(idx[k]), n, int(srs[k]))
            got = codecs.decode(payload, codec)
            snr = codecs.snr_db(truth, got)
            s = stats.setdefault(codec, [0, float("inf"), 0, True])
            s[0] += 1
            s[1] = min(s[1], snr)
            s[2] += n
            s[3] = s[3] and (snr >= 30.0)
        return pa.table({
            "codec": pa.array(list(stats), pa.string()),
            "n_clips": pa.array([s[0] for s in stats.values()], pa.int64()),
            "min_snr": pa.array([s[1] for s in stats.values()], pa.float64()),
            "total_samples": pa.array([s[2] for s in stats.values()], pa.int64()),
            "all_ok": pa.array([s[3] for s in stats.values()], pa.bool_()),
        })

    def merge_all(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby("codec", sort=True)
        out = pd.DataFrame({
            "codec": list(g.groups),
            "n_clips": g["n_clips"].sum().astype("int64").to_numpy(),
            "min_snr_db": np.round(g["min_snr"].min().to_numpy(), 2),
            "total_samples": g["total_samples"].sum().astype("int64").to_numpy(),
            "all_above_30db": g["all_ok"].all().to_numpy(),
        })
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return (ds.map_batches(decode_partial, batch_format="pyarrow",
                           batch_size=None)
            .repartition(1)
            .map_batches(merge_all, batch_format="pyarrow", batch_size=None))


LID_TRAIN_SAMPLE_MAX = 10_000


def lid_documents(sf_dir: str):
    """LID over the documents table: deterministic NB model fit on a
    BOUNDED training sample, then an actor-pool scoring pass.

    Scale shape: training never reads the full table on the driver — a
    deterministic content-hash sample (same stable-smallest-hash rule as
    analytics.seeded_sample) caps the driver-resident training set at
    ``LID_TRAIN_SAMPLE_MAX`` rows regardless of table size; the sample
    itself is selected by a distributed filter pass."""
    import ray.data as rd
    from ..functions.hashing import md5_i64_array
    from ..models.fastlid import FastLid

    n_total = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    frac = min(1.0, LID_TRAIN_SAMPLE_MAX / max(n_total, 1))
    cut = int(frac * (1 << 60))          # md5_i64 values are 60-bit

    def sample(b: pa.Table) -> pa.Table:
        h = md5_i64_array(b["text"]).to_numpy()
        return b.filter(pa.array(h < cut))

    train_ds = _read_fixture(sf_dir, "documents", ["text", "lang"]).map_batches(
        sample, batch_format="pyarrow")
    by_lang: dict[str, list[str]] = {}
    for b in train_ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for text, lang in zip(b["text"].to_pylist(), b["lang"].to_pylist()):
            by_lang.setdefault(lang, []).append(text)
    model = FastLid.train(by_lang)
    import ray
    model_ref = ray.put(model)

    class Scorer:
        def __init__(self):
            self.model = ray.get(model_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            preds, scores = self.model.predict_scores(b["text"].to_pylist())
            return pa.table({"doc_id": b["doc_id"],
                             "lang_pred": pa.array(preds, pa.string()),
                             "score": pa.array(scores, pa.float64())})

    return _read_fixture(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        Scorer, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4),
        num_cpus=1)


def codec_validity(sf_dir: str):
    """M1: record-validity predicate — keep clips whose payload length is
    consistent with (codec, sr_hz, dur_ms). The fixture plants mismatches
    (every 10th clip gets +1 on dur_ms) so the predicate does real work;
    the check itself is fully vectorized per batch (no decode needed —
    cc_corpus.py's record-type gate analog for audio)."""
    import ray.data as rd
    uri = ensure_clips(sf_dir, with_audio=True)
    ds = rd.read_parquet(uri, columns=["clip_id", "bytes", "sr_hz",
                                       "dur_ms", "codec"])

    def plant_and_filter(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        idx = np.fromiter((int(c.rsplit("-", 1)[1])
                           for c in b["clip_id"].to_pylist()),
                          dtype=np.int64, count=b.num_rows)
        dur = b["dur_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        dur = dur + (idx % 10 == 0)              # planted corruption
        sr = b["sr_hz"].to_numpy(zero_copy_only=False).astype(np.int64)
        nbytes = pc.binary_length(b["bytes"]).to_numpy(zero_copy_only=False)
        per_sample = np.fromiter(
            (codecs.BYTES_PER_SAMPLE[c] for c in b["codec"].to_pylist()),
            dtype=np.int64, count=b.num_rows)
        expect = (dur * sr // 1000) * per_sample   # synth: n = dur*sr//1000
        valid = nbytes == expect
        return pa.table({"clip_id": b["clip_id"],
                         "codec": b["codec"]}).filter(pa.array(valid))

    return ds.map_batches(plant_and_filter, batch_format="pyarrow")


ORACLE_SF = "/root/testdata/sf0.01"   # the scale the graft driver oracles at


def codec_validity_sql() -> str:
    """Exact DuckDB oracle for codec_validity: the predicate is pure
    integer arithmetic over payload length (no decode), so SQL can state
    it verbatim — octet_length(bytes) == (dur_ms' * sr_hz // 1000) *
    bytes_per_sample, with the same planted corruption (clip index % 10
    == 0 gets +1 ms). The clips table is a deterministic derived fixture,
    not a pre-registered view, so this reads its parquet directly;
    calling this function ensures the sf0.01 cache exists first (the
    driver may run the SQL before the Ray query)."""
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    per_sample = " ".join(
        f"WHEN '{c}' THEN {n}" for c, n in codecs.BYTES_PER_SAMPLE.items())
    return f"""
SELECT clip_id, codec
FROM read_parquet('{uri}/*.parquet')
WHERE octet_length(bytes) =
  ((dur_ms + CASE WHEN CAST(regexp_extract(clip_id, '([0-9]+)$', 1)
                       AS BIGINT) % 10 = 0 THEN 1 ELSE 0 END)
   * sr_hz // 1000) * (CASE codec {per_sample} END)"""


def mutated_docs(sf_dir: str, n_mutate: int = 50):
    """documents UNION near-duplicate copies (one word swapped) of the
    first n_mutate docs — fixture for the near-dup detectors."""
    import ray.data as rd
    ds = _read_fixture(sf_dir, "documents", ["doc_id", "text"])

    def mutate(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = b.filter(pc.less(b["doc_id"], n_mutate))
        ids, texts = [], []
        for i, t in zip(m["doc_id"].to_pylist(), m["text"].to_pylist()):
            words = t.split()
            if len(words) > 4:
                words[3] = "mutated"
            ids.append(i + 1_000_000)
            texts.append(" ".join(words))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return ds.union(ds.map_batches(mutate, batch_format="pyarrow"))


def exactdup_docs(sf_dir: str, n_copy: int = 25, n_mutate: int = 50):
    """documents UNION two exact copies of doc_id < n_copy (ids 1M+i and
    2M+i) UNION near-dup mutated copies of doc_id < n_mutate (ids 3M+i) —
    fixture for the LSH exact-dup collapse semantics: byte-identical texts
    must pair as a star on their min id (J=1.0), near-dups pair at the
    per-text representative level only."""
    import ray.data as rd
    ds = _read_fixture(sf_dir, "documents", ["doc_id", "text"])

    def extra(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        texts = b["text"].to_pylist()
        out_ids: list[int] = []
        out_txt: list[str] = []
        for i, t in zip(ids, texts):
            if i < n_copy:
                out_ids += [int(i) + 1_000_000, int(i) + 2_000_000]
                out_txt += [t, t]
            if i < n_mutate:
                words = t.split()
                if len(words) > 4:
                    words[3] = "mutated"
                out_ids.append(int(i) + 3_000_000)
                out_txt.append(" ".join(words))
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "text": pa.array(out_txt, pa.string())})

    return ds.union(ds.map_batches(extra, batch_format="pyarrow"))


def planted_embeddings(sf_dir: str, n_plant: int = 20):
    """embeddings UNION exact copies of the first n_plant vectors under new
    ids — fixture for the embedding-cosine near-dup detectors (the copies
    are cos=1.0 planted pairs; SQL-expressible for the oracle)."""
    import ray.data as rd
    ds = _read_fixture(sf_dir, "embeddings", ["vec_id", "embedding"])

    def plant(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = b.filter(pc.less(b["vec_id"], n_plant))
        return pa.table({
            "vec_id": pc.add(m["vec_id"], 1_000_000),
            "embedding": m["embedding"]})

    return ds.union(ds.map_batches(plant, batch_format="pyarrow"))


AUDIO_BALANCE_BUDGET_MS = 400_000    # audio milliseconds kept per codec


def audio_balance(sf_dir: str, budget_ms: int = AUDIO_BALANCE_BUDGET_MS):
    """Per-codec audio-hours quota: keep clips in stable-hash order until
    ``budget_ms`` of audio per codec — the audio twin of
    ``analytics.corpus_balance`` (same distributed exact-prefix-sum
    operator, metadata-only: the payload column never leaves parquet)."""
    import ray.data as rd
    from .analytics import quota_balance
    uri = ensure_clips(sf_dir, with_audio=False)
    return quota_balance(
        lambda: rd.read_parquet(uri, columns=["clip_id", "codec", "dur_ms"]),
        "clip_id", "codec", "dur_ms", budget_ms)


def audio_balance_sql(budget_ms: int = AUDIO_BALANCE_BUDGET_MS) -> str:
    from ..functions.hashing import sql_md5_i64
    uri = ensure_clips(ORACLE_SF, with_audio=False)
    hh = sql_md5_i64("clip_id")
    return (f"SELECT clip_id, codec, dur_ms FROM ("
            f"SELECT clip_id, codec, dur_ms, "
            f"sum(dur_ms) OVER (PARTITION BY codec ORDER BY {hh}, clip_id "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            f"- dur_ms AS cum_before "
            f"FROM read_parquet('{uri}/*.parquet')) "
            f"WHERE cum_before < {budget_ms}")


# --- cross-modal contamination dedup ---------------------------------------

CROSS_MODAL_PLANT_EVERY = 20         # every 20th clip leaks a transcript
_LEAK_DOC_BASE = 1_000_000_000       # synthetic doc_id space for plants


def _clip_idx_np(col) -> np.ndarray:
    import pyarrow.compute as pc
    return pc.cast(pc.utf8_slice_codeunits(col, 5, 32), pa.int64()).to_numpy()


def _cross_modal_index(sf_dir: str) -> str:
    """One-time side index for :func:`cross_modal_dedup`: md5(text) of
    every document, UNION planted "leaked" rows — every
    ``CROSS_MODAL_PLANT_EVERY``-th clip's transcript hash under a
    synthetic doc_id — collapsed to min doc_id per hash, range-sorted and
    written as a keyed lancelite table with per-fragment [min, max] key
    stats (the dedup_incremental index shape, analytics.py)."""
    import ray.data as rd
    from ray.data.aggregate import Min

    from ..functions.hashing import md5_i64_array
    from ..sources import lancelite
    from .analytics import _content_tag

    uri = f"/tmp/ccc_xmodal_idx_{_content_tag(sf_dir)}"
    if os.path.exists(os.path.join(uri, "_versions")):
        return uri

    def dh(b: pa.Table) -> pa.Table:
        return pa.table({"text_hash": md5_i64_array(b["text"]),
                         "doc_id": b["doc_id"].cast(pa.int64())})

    def ph(b: pa.Table) -> pa.Table:
        ci = _clip_idx_np(b["clip_id"])
        m = ci % CROSS_MODAL_PLANT_EVERY == 0
        t = b.filter(pa.array(m))
        return pa.table({"text_hash": md5_i64_array(t["transcript"]),
                         "doc_id": pa.array(_LEAK_DOC_BASE + ci[m],
                                            pa.int64())})

    docs = _read_fixture(sf_dir, "documents", ["doc_id", "text"])
    leaks = rd.read_parquet(ensure_clips(sf_dir, with_audio=False),
                            columns=["clip_id", "transcript"])
    side = (docs.map_batches(dh, batch_format="pyarrow")
            .union(leaks.map_batches(ph, batch_format="pyarrow"))
            .groupby("text_hash")
            .aggregate(Min("doc_id", alias_name="doc_id"))
            .sort("text_hash"))
    lancelite.write_dataset(side, uri, key_stats="text_hash")
    return uri


class _SemiProbe:
    """Actor-pool semi-join against the keyed document-hash index: emits
    (clip_id, doc_id) for every probe HIT (the anti-probe's sibling —
    _AntiProbe in analytics.py keeps the misses). Input batches must be
    hash-range-clustered (caller sorts on text_hash) so fragments_for
    prunes to the overlapping index fragments."""

    def __init__(self, index):
        self.joiner = KeyedBatchJoiner(index,
                                       columns=["text_hash", "doc_id"])

    def __call__(self, b: pa.Table) -> pa.Table:
        row, found, side = self.joiner.probe(b["text_hash"])
        if side is None or not found.any():
            return pa.table({"clip_id": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64())})
        sel = np.nonzero(found)[0]
        return pa.table({
            "clip_id": b["clip_id"].take(pa.array(sel)),
            "doc_id": side["doc_id"].take(pa.array(row[sel]))
                          .cast(pa.int64()),
        })


def cross_modal_dedup(sf_dir: str):
    """Cross-modal contamination dedup: flag clips whose TRANSCRIPT is
    byte-identical to a document's text — the modality-overlap step a
    multimodal training build runs so the same content doesn't enter the
    mix twice (text corpus + ASR transcript). The fixture has no organic
    overlap, so the index build PLANTS leaks (every 20th clip, synthetic
    doc_id) — any probe miss or false hit breaks the oracle hash.

    Scale shape: the document index is built once (O(docs) + O(clips/20)
    plant rows, collapsed to min doc_id per hash) and persisted keyed;
    the probe pass moves only (clip_id, hash) pairs — transcripts never
    shuffle, payloads are never read — through an O(clips) slim sort so
    each actor's searchsorted touches only its hash range's fragments.
    Output rows are O(overlap). Same side-table machinery as the
    flagship phase-D join and dedup_incremental."""
    import ray.data as rd

    from ..functions.hashing import md5_i64_array
    from ..sources.keyed import KeyedFragmentIndex

    index = KeyedFragmentIndex(_cross_modal_index(sf_dir), "text_hash")

    def h_rows(b: pa.Table) -> pa.Table:
        return pa.table({"clip_id": b["clip_id"],
                         "text_hash": md5_i64_array(b["transcript"])})

    return (rd.read_parquet(ensure_clips(sf_dir, with_audio=False),
                            columns=["clip_id", "transcript"])
            .map_batches(h_rows, batch_format="pyarrow")
            .sort("text_hash")
            .map_batches(_SemiProbe, batch_format="pyarrow",
                         batch_size=4096, fn_constructor_args=(index,),
                         concurrency=(1, 4), num_cpus=1))


def cross_modal_dedup_sql() -> str:
    from ..functions.hashing import sql_md5_i64
    uri = ensure_clips(ORACLE_SF, with_audio=False)
    h_t = sql_md5_i64("transcript")
    h_x = sql_md5_i64("text")
    return f"""
WITH c AS (SELECT clip_id,
                  CAST(regexp_extract(clip_id, '([0-9]+)$', 1) AS BIGINT)
                      AS ci,
                  {h_t} AS h
           FROM read_parquet('{uri}/*.parquet')),
side AS (SELECT {h_x} AS h, CAST(doc_id AS BIGINT) AS doc_id
         FROM read_parquet('{ORACLE_SF}/documents.parquet')
         UNION ALL
         SELECT h, {_LEAK_DOC_BASE} + ci FROM c
         WHERE ci % {CROSS_MODAL_PLANT_EVERY} = 0),
m AS (SELECT h, MIN(doc_id) AS doc_id FROM side GROUP BY h)
SELECT c.clip_id, m.doc_id FROM c JOIN m ON c.h = m.h"""


# --- ASR augmentation planning ----------------------------------------------

AUG_FACTORS = (("sp09", 10, 9), ("sp10", 1, 1), ("sp11", 10, 11))
AUG_SHARDS = 16


def audio_augment_plan(sf_dir: str):
    """Speed-perturbation augmentation manifest: the standard ASR
    training move (0.9x / 1.0x / 1.1x copies of every clip) planned as
    metadata — a 3x vectorized fan-out with exact integer durations
    (dur' = dur * num // den) and a deterministic hash shard per
    (clip, factor), so the expensive resample+re-encode stage can run
    later, shard-parallel and resumable, without this plan ever touching
    payload bytes. One streamed pass, no shuffle; output is 3x the
    metadata rows, 0x the payload."""
    import ray.data as rd

    from ..functions.hashing import md5_i64_array

    uri = ensure_clips(sf_dir, with_audio=False)

    def expand(b: pa.Table) -> pa.Table:
        dur = b["dur_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b["clip_id"].to_pylist()
        outs = []
        for name, num, den in AUG_FACTORS:
            aug_dur = dur * num // den
            shard = (md5_i64_array([f"{c}|{name}" for c in ids])
                     .to_numpy(zero_copy_only=False) % AUG_SHARDS)
            outs.append(pa.table({
                "clip_id": b["clip_id"],
                "aug": pa.array([name] * b.num_rows, pa.string()),
                "aug_dur_ms": pa.array(aug_dur, pa.int64()),
                "shard": pa.array(shard, pa.int64()),
            }))
        return pa.concat_tables(outs)

    return rd.read_parquet(uri, columns=["clip_id", "dur_ms"]).map_batches(
        expand, batch_format="pyarrow")


def audio_augment_plan_sql() -> str:
    from ..functions.hashing import sql_md5_i64
    uri = ensure_clips(ORACLE_SF, with_audio=False)
    h = sql_md5_i64("concat(clip_id, '|', aug)")
    vals = ", ".join(f"('{n}', {num}, {den})" for n, num, den in AUG_FACTORS)
    return (f"SELECT clip_id, aug, "
            f"CAST(dur_ms AS BIGINT) * num // den AS aug_dur_ms, "
            f"{h} % {AUG_SHARDS} AS shard "
            f"FROM read_parquet('{uri}/*.parquet') "
            f"CROSS JOIN (VALUES {vals}) AS f(aug, num, den)")


# --- exact global percentiles by value counting ------------------------------

PCTS = (50, 90, 99)


def global_percentiles(sf_dir: str):
    """Exact global p50/p90/p99 of clip duration WITHOUT a distributed
    sort: dur_ms has a bounded value domain (int32 milliseconds), so
    per-block value-count partials merge associatively — the same
    shuffle-free two-level combine as the quota family — and the driver
    resolves each percentile from the tiny (value, count) histogram's
    cumulative sum. Complements median_mad (per-group exact sort / KLL
    sketch): this is the whole-corpus spelling whose cost is O(corpus)
    streamed once + O(distinct values) merged, independent of row count.

    Rank rule (stated so the SQL oracle can say the same thing): the
    p-th percentile is the smallest value whose cumulative count reaches
    ceil(p * n / 100)."""
    import ray.data as rd

    uri = ensure_clips(sf_dir, with_audio=False)

    def vc_partial(b: pa.Table) -> pa.Table:
        vals, cnts = np.unique(
            b["dur_ms"].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True)
        return pa.table({"v": pa.array(vals, pa.int64()),
                         "c": pa.array(cnts, pa.int64())})

    def vc_merge(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby("v", sort=True)["c"].sum().reset_index()
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def resolve(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby("v", sort=True)["c"].sum().reset_index()
        cum = df["c"].cumsum().to_numpy()
        n = int(cum[-1]) if len(cum) else 0
        out_p, out_v = [], []
        for p in PCTS:
            rank = (p * n + 99) // 100
            i = int(np.searchsorted(cum, rank))
            out_p.append(p)
            out_v.append(int(df["v"].iloc[i]) if n else None)
        return pa.table({"pct": pa.array(out_p, pa.int64()),
                         "dur_ms": pa.array(out_v, pa.int64())})

    return (rd.read_parquet(uri, columns=["dur_ms"])
            .map_batches(vc_partial, batch_format="pyarrow")
            .map_batches(vc_merge, batch_format="pyarrow",
                         batch_size=1 << 20)
            .repartition(1)
            .map_batches(resolve, batch_format="pyarrow", batch_size=None))


def global_percentiles_sql() -> str:
    uri = ensure_clips(ORACLE_SF, with_audio=False)
    sels = " UNION ALL ".join(
        f"SELECT CAST({p} AS BIGINT) AS pct, "
        f"(SELECT CAST(min(dur_ms) AS BIGINT) FROM o "
        f" WHERE rn >= ({p} * (SELECT c FROM n) + 99) // 100) AS dur_ms"
        for p in PCTS)
    return (f"WITH t AS (SELECT dur_ms FROM read_parquet('{uri}/*.parquet')), "
            f"o AS (SELECT dur_ms, row_number() OVER (ORDER BY dur_ms) rn "
            f"FROM t), n AS (SELECT count(*) c FROM t) {sels}")

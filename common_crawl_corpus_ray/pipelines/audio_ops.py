"""Audio-modality operators over the clips table: chunking, VAD trim,
resampling, exact payload dedup.

The reference corpus engine is text-only; these are the audio analogs its
operators imply once the input table carries an encoded payload per clip
(BASELINE.json input_hint): ``audio_chunk`` is the payload counterpart of
the reference's line-split flat-map (cc_corpus.py:241-247, M6 in SURVEY
§2), ``silence_trim`` of its pre-filters (cc_corpus.py:256), ``audio_dedup``
of the hash-column dedup (deduplication.py:88-102), and ``audio_resample``
is the canonical normalize-before-training stage.

Oracle strategy (same as clips_queries.codec_validity): the clips table is
a deterministic derived fixture, so each query's DuckDB oracle reads the
sf0.01 fixture parquet directly. Everything the oracle checks is exact —
chunk boundaries, payload-slice content (as md5-of-hex, DuckDB's only
blob-hash spelling), planted-silence trim frame counts, resample output
lengths, dedup survivors. The DSP math SQL cannot express (resampled
sample values) is pinned separately in pytest (property + golden tests in
tests/test_audio_ops.py).

Scale shape, shared by all four: payload bytes never enter a shuffle —
each stage reads (fused read+map, ``batch_size=None``), emits slim rows
(ids + integers + 32-char digests), and only those shuffle/aggregate.
Payload access is zero-copy (memoryview slices over the Arrow binary
buffer); decode and frame math are whole-clip numpy.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from ..audio import codecs
from ..functions.broadcast import cached_get
from ..sources.keyed import KeyedBatchJoiner
from ..stages.dedup_family import explode_sig16
from ..synth import clips as synth_clips
from .clips_queries import ORACLE_SF, clips_count, ensure_clips

CHUNK_MS = 1000          # audio_chunk window
HOP_MS = 500             # audio_chunk stride
FRAME_MS = 20            # silence_trim analysis frame (sr//50 samples;
                         # every fixture rate is divisible by 50)
TRIM_THRESH = 0.02       # frame-RMS silence cut: planted silence is exactly
                         # 0.0 (zeroed after decode), while the measured
                         # minimum SIGNAL frame RMS over 4000 fixture clips
                         # is 0.106 — a 5x margin either side
RESAMPLE_SR = 16000      # audio_resample target rate
DUP_STRIDE = 7           # audio_dedup plants: clip i with i%7==3 carries
                         # clip (i-3)'s payload


def _clip_indices(b: pa.Table) -> np.ndarray:
    import pyarrow.compute as pc
    return pc.cast(pc.utf8_slice_codeunits(b["clip_id"], 5, 32),
                   pa.int64()).to_numpy()


def _md5_hex_upper(view) -> str:
    """DuckDB's only blob hash is md5(hex(b)) with UPPERCASE hex; mirror
    that spelling so digests compare string-equal. (The hex round trip
    costs ~3x a raw-bytes md5 — a production dedup would hash the raw
    payload; this spelling exists solely for oracle comparability.)"""
    return hashlib.md5(view.hex().upper().encode()).hexdigest()


# --- audio_chunk -------------------------------------------------------------

def _chunk_batch(b: pa.Table) -> pa.Table:
    srs = b["sr_hz"].to_numpy(zero_copy_only=False).astype(np.int64)
    cods = b["codec"].to_pylist()
    payloads = b["bytes"].combine_chunks()
    ids = b["clip_id"].to_pylist()
    out_id: list[str] = []
    out_k: list[int] = []
    out_s: list[int] = []
    out_n: list[int] = []
    out_h: list[str] = []
    for r in range(b.num_rows):
        bps = codecs.BYTES_PER_SAMPLE[cods[r]]
        buf = memoryview(payloads[r].as_buffer())
        n = len(buf) // bps
        win = int(srs[r]) * CHUNK_MS // 1000
        hop = int(srs[r]) * HOP_MS // 1000
        nchunks = (n + hop - 1) // hop
        cid = ids[r]
        for k in range(nchunks):
            s = k * hop
            ln = min(win, n - s)
            out_id.append(cid)
            out_k.append(k)
            out_s.append(s)
            out_n.append(ln)
            out_h.append(_md5_hex_upper(buf[s * bps:(s + ln) * bps]))
    return pa.table({
        "clip_id": pa.array(out_id, pa.string()),
        "chunk_idx": pa.array(out_k, pa.int64()),
        "start_sample": pa.array(out_s, pa.int64()),
        "n_samp": pa.array(out_n, pa.int64()),
        "chunk_md5": pa.array(out_h, pa.string()),
    })


def audio_chunk(sf_dir: str):
    """Split every payload into CHUNK_MS windows at HOP_MS stride — the
    training-data chunking stage (ASR-style). No decode: all three fixture
    codecs are fixed-bytes-per-sample, so a chunk is a byte-range slice of
    the payload; the emitted row carries the slice digest, not the slice,
    so the wide output never re-ships audio (a real export would write the
    slice to the chunk shard here instead — same plumbing, fat column).

    Chunk k covers samples [k*hop, min(k*hop+win, n)); every sample is
    covered, the tail chunk may be short, n_chunks = ceil(n / hop)."""
    import ray.data as rd
    uri = ensure_clips(sf_dir, with_audio=True)
    ds = rd.read_parquet(uri, columns=["clip_id", "bytes", "sr_hz", "codec"])
    # batch_size=None: one batch per read block, so Ray fuses read+chunk
    # into a single task and payloads never get re-batched (copied)
    return ds.map_batches(_chunk_batch, batch_format="pyarrow",
                          batch_size=None)


def audio_chunk_sql() -> str:
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    per_sample = " ".join(
        f"WHEN '{c}' THEN {n}" for c, n in codecs.BYTES_PER_SAMPLE.items())
    return f"""
WITH c AS (
  SELECT clip_id, bytes,
         (CASE codec {per_sample} END) AS bps,
         CAST(sr_hz AS BIGINT) * {CHUNK_MS} // 1000 AS win,
         CAST(sr_hz AS BIGINT) * {HOP_MS} // 1000 AS hop,
         octet_length(bytes) // (CASE codec {per_sample} END) AS n
  FROM read_parquet('{uri}/*.parquet')
), k AS (
  SELECT clip_id, bytes, bps, win, hop, n,
         unnest(generate_series(0, (n + hop - 1) // hop - 1)) AS chunk_idx
  FROM c
)
SELECT clip_id, chunk_idx, chunk_idx * hop AS start_sample,
       LEAST(win, n - chunk_idx * hop) AS n_samp,
       md5(substr(hex(bytes), chunk_idx * hop * bps * 2 + 1,
                  LEAST(win, n - chunk_idx * hop) * bps * 2)) AS chunk_md5
FROM k"""


# --- silence_trim ------------------------------------------------------------

def trim_scan(x: np.ndarray, fl: int) -> tuple[int, int, int]:
    """Frame-RMS VAD scan: (n_frames, lead_trim, tail_trim) for signal
    ``x`` at frame length ``fl``. The ragged (<1 frame) tail is below
    analysis resolution and always kept."""
    nf = len(x) // fl
    fr = x[:nf * fl].reshape(nf, fl)
    rms = np.sqrt(np.einsum("ij,ij->i", fr, fr) / fl)
    loud = rms >= TRIM_THRESH
    if not loud.any():
        return nf, nf, 0
    first = int(np.argmax(loud))
    last = nf - 1 - int(np.argmax(loud[::-1]))
    return nf, first, nf - 1 - last


def _trim_batch(b: pa.Table) -> pa.Table:
    idx = _clip_indices(b)
    srs = b["sr_hz"].to_numpy(zero_copy_only=False).astype(np.int64)
    cods = b["codec"].to_pylist()
    payloads = b["bytes"].combine_chunks()
    nf_out = np.empty(b.num_rows, np.int64)
    lead_out = np.empty(b.num_rows, np.int64)
    tail_out = np.empty(b.num_rows, np.int64)
    samp_out = np.empty(b.num_rows, np.int64)
    for r in range(b.num_rows):
        x = codecs.decode(payloads[r].as_buffer(), cods[r])
        fl = int(srs[r]) // 50            # FRAME_MS = 20 -> sr/50
        n = len(x)
        nf = n // fl
        i = int(idx[r])
        lead, tail = i % 4, (i // 4) % 3  # planted silence
        # dur_ms >= 200 -> nf >= 10 > lead+tail <= 5: never all-silent
        x = np.array(x[:nf * fl], dtype=np.float64)
        x[:lead * fl] = 0.0
        if tail:
            x[(nf - tail) * fl:] = 0.0
        nf_out[r], lead_out[r], tail_out[r] = trim_scan(x, fl)
        samp_out[r] = n - (lead_out[r] + tail_out[r]) * fl
    return pa.table({
        "clip_id": b["clip_id"],
        "n_frames": pa.array(nf_out),
        "lead_trim": pa.array(lead_out),
        "tail_trim": pa.array(tail_out),
        "out_samples": pa.array(samp_out),
    })


def silence_trim(sf_dir: str):
    """Energy VAD trim: decode, split into FRAME_MS frames, drop leading
    and trailing frames whose RMS is below TRIM_THRESH. The fixture's
    clips have no silence, so (codec_validity-style) the query PLANTS it
    deterministically — clip i gets its first i%4 and last (i//4)%3
    complete frames zeroed after decode — which makes the trim counts pure
    integer arithmetic an oracle can state verbatim, while the operator
    itself runs the real frame-RMS scan (``trim_scan``; its
    finds-silence-anywhere behavior is pinned in tests/test_audio_ops.py)."""
    import ray.data as rd
    uri = ensure_clips(sf_dir, with_audio=True)
    ds = rd.read_parquet(uri, columns=["clip_id", "bytes", "sr_hz", "codec"])
    return ds.map_batches(_trim_batch, batch_format="pyarrow",
                          batch_size=None)


def silence_trim_sql() -> str:
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    per_sample = " ".join(
        f"WHEN '{c}' THEN {n}" for c, n in codecs.BYTES_PER_SAMPLE.items())
    return f"""
WITH c AS (
  SELECT clip_id,
         CAST(regexp_extract(clip_id, '([0-9]+)$', 1) AS BIGINT) AS i,
         CAST(sr_hz AS BIGINT) // 50 AS fl,
         octet_length(bytes) // (CASE codec {per_sample} END) AS n
  FROM read_parquet('{uri}/*.parquet')
)
SELECT clip_id, n // fl AS n_frames,
       i % 4 AS lead_trim, (i // 4) % 3 AS tail_trim,
       n - (i % 4 + (i // 4) % 3) * fl AS out_samples
FROM c"""


# --- audio_resample ----------------------------------------------------------

class Resampler:
    """Actor-pool stage: decode -> linear-interpolate to RESAMPLE_SR ->
    re-encode pcm_s16le. Output sample k sits at input position
    k*sr_in/RESAMPLE_SR, held as the exact rational (i0 = k*sr//out,
    frac = (k*sr mod out)/out) — pure vectorized index arithmetic, no
    per-point searchsorted (np.interp's binary search made this stage 6x
    slower at 100k clips). Per-actor state: one growing arange buffer
    reused across clips (durations vary, so per-(n,sr) grid caches don't
    hit and would hold O(clips x n_out) memory).

    The emitted row is slim (lengths only; the resampled payload would be
    written to the output shard in a real export). SQL can't state the
    interpolation, so the oracle pins the exact output LENGTHS
    (n_out = n_in*sr_out//sr_in) while sample-value fidelity is pinned in
    pytest: SNR >= 25 dB against the analytically regenerated signal at
    the target rate, bit-exact passthrough at sr_in == RESAMPLE_SR, plus
    a golden digest (tests/test_audio_ops.py)."""

    def __init__(self):
        self._k = np.empty(0, dtype=np.int64)

    def _indices(self, n_out: int) -> np.ndarray:
        if len(self._k) < n_out:
            self._k = np.arange(max(n_out, 2 * len(self._k)), dtype=np.int64)
        return self._k[:n_out]

    def resample(self, x: np.ndarray, sr: int) -> np.ndarray:
        n = len(x)
        n_out = n * RESAMPLE_SR // sr
        num = self._indices(n_out) * sr
        i0 = num // RESAMPLE_SR
        frac = (num - i0 * RESAMPLE_SR) / float(RESAMPLE_SR)
        i1 = np.minimum(i0 + 1, n - 1)
        xf = x.astype(np.float64)
        return xf[i0] * (1.0 - frac) + xf[i1] * frac

    def __call__(self, b: pa.Table) -> pa.Table:
        srs = b["sr_hz"].to_numpy(zero_copy_only=False).astype(np.int64)
        cods = b["codec"].to_pylist()
        payloads = b["bytes"].combine_chunks()
        n_in = np.empty(b.num_rows, np.int64)
        n_out = np.empty(b.num_rows, np.int64)
        for r in range(b.num_rows):
            x = codecs.decode(payloads[r].as_buffer(), cods[r])
            y = self.resample(x, int(srs[r]))
            out = codecs.encode_pcm_s16le(y)
            n_in[r] = len(x)
            n_out[r] = len(out) // 2
        return pa.table({
            "clip_id": b["clip_id"],
            "n_in": pa.array(n_in),
            "n_out": pa.array(n_out),
            "sr_out": pa.array(np.full(b.num_rows, RESAMPLE_SR, np.int64)),
        })


def audio_resample(sf_dir: str):
    import ray.data as rd

    from .quality_filter import _cluster_cpus
    uri = ensure_clips(sf_dir, with_audio=True)
    ds = rd.read_parquet(uri, columns=["clip_id", "bytes", "sr_hz", "codec"])
    # pool sized to the cluster: a fixed cap of 16 actors left half a
    # 32-cpu box idle on this decode-bound stage (measured 14.6s -> the
    # stage is CPU-bound, so actors should track cores minus headroom)
    return ds.map_batches(Resampler, batch_format="pyarrow", batch_size=None,
                          concurrency=(1, max(2, _cluster_cpus() - 2)),
                          num_cpus=1)


def audio_resample_sql() -> str:
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    per_sample = " ".join(
        f"WHEN '{c}' THEN {n}" for c, n in codecs.BYTES_PER_SAMPLE.items())
    return f"""
SELECT clip_id,
       octet_length(bytes) // (CASE codec {per_sample} END) AS n_in,
       octet_length(bytes) // (CASE codec {per_sample} END)
         * {RESAMPLE_SR} // CAST(sr_hz AS BIGINT) AS n_out,
       CAST({RESAMPLE_SR} AS BIGINT) AS sr_out
FROM read_parquet('{uri}/*.parquet')"""


def _chunk_payload_batch(b: pa.Table) -> pa.Table:
    """audio_chunk's export sibling: emit the sliced payload itself (the
    fat column) instead of its digest — the per-batch body of
    ``export_chunks``."""
    srs = b["sr_hz"].to_numpy(zero_copy_only=False).astype(np.int64)
    cods = b["codec"].to_pylist()
    payloads = b["bytes"].combine_chunks()
    ids = b["clip_id"].to_pylist()
    out_id: list[str] = []
    out_k: list[int] = []
    out_b: list[memoryview] = []
    out_c: list[str] = []
    out_sr: list[int] = []
    for r in range(b.num_rows):
        bps = codecs.BYTES_PER_SAMPLE[cods[r]]
        buf = memoryview(payloads[r].as_buffer())
        n = len(buf) // bps
        win = int(srs[r]) * CHUNK_MS // 1000
        hop = int(srs[r]) * HOP_MS // 1000
        for k in range((n + hop - 1) // hop):
            s = k * hop
            ln = min(win, n - s)
            out_id.append(ids[r])
            out_k.append(k)
            out_b.append(buf[s * bps:(s + ln) * bps])
            out_c.append(cods[r])
            out_sr.append(int(srs[r]))
    return pa.table({
        "clip_id": pa.array(out_id, pa.string()),
        "chunk_idx": pa.array(out_k, pa.int64()),
        "codec": pa.array(out_c, pa.string()),
        "sr_hz": pa.array(out_sr, pa.int32()),
        "bytes": pa.array(out_b, pa.binary()),
    })


def export_chunks(clips_uri: str, ckpt_uri: str, *, num_partitions: int = 8,
                  fail_after: int | None = None) -> dict:
    """Resumable chunk export: the training-shard materialization of
    ``audio_chunk`` — every clip's windows written out WITH their payload
    slices, partitioned and committed through the same lineage manifest as
    the flagship's phase A (pipelines/resumable.py), so a crashed export
    resumes by skipping committed partitions (the reference's ``check/``
    marker scheme, cc_corpus.py:142-144, with real transactionality).

    Scale shape: each partition is one group of input fragments streamed
    read -> slice -> write; chunk payloads go straight from the read block
    to the partition's parquet — they never shuffle and never accumulate
    on the driver."""
    import ray.data as rd

    from ..state import manifest
    from .resumable import InjectedFailure, _input_files, plan_partitions

    parts = plan_partitions(_input_files(clips_uri), num_partitions)
    todo = manifest.pending(ckpt_uri, sorted(parts))
    done_this_call = 0
    for pid in todo:
        if fail_after is not None and done_this_call >= fail_after:
            raise InjectedFailure(
                f"injected failure after {fail_after} partitions")
        files = parts[pid]
        ds = rd.read_parquet(files,
                             columns=["clip_id", "bytes", "sr_hz", "codec"])
        chunks = ds.map_batches(_chunk_payload_batch, batch_format="pyarrow",
                                batch_size=None)
        manifest.write_partition(
            ckpt_uri, pid, chunks,
            input_fragments=[os.path.basename(f) for f in files],
            stage_version="chunks-v1")
        done_this_call += 1
    v = manifest.commit_version(ckpt_uri)
    vm = manifest.version_manifest(ckpt_uri, v)
    vm["partitions_run_this_call"] = done_this_call
    return vm


def _clips_tag(uri: str) -> str:
    """Content key for /tmp artifacts derived from a clips table (the
    analytics._content_tag pattern): path + total parquet bytes + newest
    mtime, so a regenerated fixture invalidates the cache."""
    import re
    files = sorted(f for f in os.listdir(uri) if f.endswith(".parquet"))
    sz = mt = 0
    for f in files:
        st = os.stat(os.path.join(uri, f))
        sz += st.st_size
        mt = max(mt, st.st_mtime_ns)
    base = re.sub(r"[^A-Za-z0-9]+", "_", uri.rstrip("/"))
    return f"{base}_{sz}_{mt}"


def export_chunks_digest(sf_dir: str):
    """Driver-checked wrapper around ``export_chunks``: export every chunk
    WITH its payload slice through the lineage manifest into a
    content-keyed /tmp table (idempotent — a committed export is reused,
    exercising the resume path), then read the committed shards back and
    emit each exported slice's digest. Hash-green against the audio_chunk
    oracle only if the bytes that SURVIVED the write->manifest->read round
    trip are exactly the chunk windows — the end-to-end pin on the export
    path itself, not just its planning math."""
    uri = ensure_clips(sf_dir, with_audio=True)
    ck = f"/tmp/ccc_chunk_export_{_clips_tag(uri)}"
    export_chunks(uri, ck, num_partitions=8)

    from ..state import manifest

    def dig(b: pa.Table) -> pa.Table:
        payloads = b["bytes"].combine_chunks()
        h = [_md5_hex_upper(memoryview(payloads[r].as_buffer()))
             for r in range(b.num_rows)]
        return pa.table({"clip_id": b["clip_id"],
                         "chunk_idx": b["chunk_idx"],
                         "chunk_md5": pa.array(h, pa.string())})

    return manifest.read(ck, columns=["clip_id", "chunk_idx", "bytes"]) \
        .map_batches(dig, batch_format="pyarrow", batch_size=None)


def export_chunks_digest_sql() -> str:
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    per_sample = " ".join(
        f"WHEN '{c}' THEN {n}" for c, n in codecs.BYTES_PER_SAMPLE.items())
    return f"""
WITH c AS (
  SELECT clip_id, bytes,
         (CASE codec {per_sample} END) AS bps,
         CAST(sr_hz AS BIGINT) * {CHUNK_MS} // 1000 AS win,
         CAST(sr_hz AS BIGINT) * {HOP_MS} // 1000 AS hop,
         octet_length(bytes) // (CASE codec {per_sample} END) AS n
  FROM read_parquet('{uri}/*.parquet')
), k AS (
  SELECT clip_id, bytes, bps, win, hop, n,
         unnest(generate_series(0, (n + hop - 1) // hop - 1)) AS chunk_idx
  FROM c
)
SELECT clip_id, chunk_idx,
       md5(substr(hex(bytes), chunk_idx * hop * bps * 2 + 1,
                  LEAST(win, n - chunk_idx * hop) * bps * 2)) AS chunk_md5
FROM k"""


# --- transcript_align --------------------------------------------------------

def transcript_align(sf_dir: str):
    """Cross-modal pre-alignment: allocate each clip's transcript words to
    its audio chunks proportionally by position — the deterministic
    word->window assignment an ASR training pipeline runs before forced
    alignment (the reference's line-split flat-map, cc_corpus.py:241-247,
    crossed with the clip's time axis). Word w of n_words lands in chunk
    floor(w * n_chunks / n_words); inverting that floor gives each chunk k
    the word span [ceil(k*nw/nc), ceil((k+1)*nw/nc)) — pure integer
    arithmetic, so the oracle states it verbatim.

    No payload read: the fixture's sample count is exactly
    dur_ms*sr//1000 (synth/clips.py:173), so the chunk inventory
    (ceil(n/hop), the audio_chunk grid) derives from two int32 columns.
    Fully vectorized: the per-chunk expansion is one np.repeat +
    intra-group arange; no Python loop over rows or chunks."""
    import ray.data as rd

    from .analytics import nwords_arrow
    uri = ensure_clips(sf_dir, with_audio=True)
    ds = rd.read_parquet(
        uri, columns=["clip_id", "transcript", "sr_hz", "dur_ms"])

    def f(b: pa.Table) -> pa.Table:
        nw = nwords_arrow(b["transcript"]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        sr = b["sr_hz"].to_numpy(zero_copy_only=False).astype(np.int64)
        dur = b["dur_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = dur * sr // 1000
        hop = sr * HOP_MS // 1000
        nc = (n + hop - 1) // hop
        total = int(nc.sum())
        row = np.repeat(np.arange(len(nc)), nc)
        k = np.arange(total) - np.repeat(np.cumsum(nc) - nc, nc)
        nw_r, nc_r = nw[row], nc[row]
        w_start = (k * nw_r + nc_r - 1) // nc_r
        w_end = ((k + 1) * nw_r + nc_r - 1) // nc_r
        return pa.table({
            "clip_id": b["clip_id"].take(pa.array(row, pa.int64())),
            "chunk_idx": pa.array(k, pa.int64()),
            "w_start": pa.array(w_start, pa.int64()),
            "w_end": pa.array(w_end, pa.int64()),
            "n_words_chunk": pa.array(w_end - w_start, pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def transcript_align_sql() -> str:
    from .analytics import sql_nwords
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    nw = sql_nwords("transcript")
    return f"""
WITH c AS (
  SELECT clip_id, CAST({nw} AS BIGINT) AS nw,
         (CAST(dur_ms AS BIGINT) * sr_hz // 1000
            + CAST(sr_hz AS BIGINT) * {HOP_MS} // 1000 - 1)
           // (CAST(sr_hz AS BIGINT) * {HOP_MS} // 1000) AS nc
  FROM read_parquet('{uri}/*.parquet')
), k AS (
  SELECT clip_id, nw, nc,
         unnest(generate_series(0, nc - 1)) AS chunk_idx
  FROM c
)
SELECT clip_id, chunk_idx,
       (chunk_idx * nw + nc - 1) // nc AS w_start,
       ((chunk_idx + 1) * nw + nc - 1) // nc AS w_end,
       ((chunk_idx + 1) * nw + nc - 1) // nc
         - (chunk_idx * nw + nc - 1) // nc AS n_words_chunk
FROM k"""


# --- speech_rate_filter ------------------------------------------------------

WPS_MIN = 5      # words/second bounds: a transcript pacing far outside
WPS_MAX = 60     # human speech means a misaligned transcript/audio pair


def speech_rate_filter(sf_dir: str):
    """Cross-modal validity rule: drop clips whose transcript word count is
    implausible for the audio duration (the audio-side sibling of the
    reference's length heuristics, cc_corpus.py:256,281-284 — there a text
    is judged against itself; here against its clip). Pure integer
    arithmetic over two columns, no decode: keep clips with
    WPS_MIN <= n_words/sec <= WPS_MAX, stated as
    WPS_MIN * dur_ms <= n_words * 1000 <= WPS_MAX * dur_ms.
    Output carries wps_milli (n_words*1e6 // dur_ms) for downstream
    bucketing — integer so the oracle compares exactly."""
    import ray.data as rd
    from .analytics import nwords_arrow
    uri = ensure_clips(sf_dir, with_audio=True)
    ds = rd.read_parquet(uri, columns=["clip_id", "transcript", "dur_ms"])

    def f(b: pa.Table) -> pa.Table:
        nw = nwords_arrow(b["transcript"]).to_numpy(zero_copy_only=False)
        nw = nw.astype(np.int64)
        dur = b["dur_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (WPS_MIN * dur <= nw * 1000) & (nw * 1000 <= WPS_MAX * dur)
        return pa.table({
            "clip_id": b["clip_id"],
            "n_words": pa.array(nw),
            "dur_ms": pa.array(dur),
            "wps_milli": pa.array(nw * 1_000_000 // dur),
        }).filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def speech_rate_filter_sql() -> str:
    from .analytics import sql_nwords
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    nw = sql_nwords("transcript")
    return f"""
WITH c AS (
  SELECT clip_id, CAST({nw} AS BIGINT) AS n_words,
         CAST(dur_ms AS BIGINT) AS dur_ms
  FROM read_parquet('{uri}/*.parquet')
)
SELECT clip_id, n_words, dur_ms, n_words * 1000000 // dur_ms AS wps_milli
FROM c
WHERE {WPS_MIN} * dur_ms <= n_words * 1000 AND n_words * 1000 <= {WPS_MAX} * dur_ms"""


# --- audio_perceptual_dedup ----------------------------------------------------

_PERC_MOD = 13           # plants: clip i%13==6 carries clip (i-6)'s SIGNAL
_PERC_OFF = 6            # re-encoded under a different codec; clip i%13==9
_PERC_SR_OFF = 9         # carries clip (i-9)'s signal DECIMATED to sr/2 and
                         # re-encoded (the resample-then-re-encode copy the
                         # repo's own Resampler produces)
PERC_SNR_DB = 30.0       # decoded-domain match threshold (the north-star
                         # allclose bar; planted chains measure >=35.6 dB in
                         # the canonical domain, independent same-shape
                         # clips ~-3 dB)
PERC_ROUTE_BROADCAST_MAX = 2_000_000   # candidate clips above which the
                         # verify routing ships as a keyed side table
                         # instead of an object-store broadcast

_SIG_BITS, _SIG_MAXHAM, _SIG_BANDS = 64, 12, 4

# One canonical rate per sample-rate family: 8k/16k/32k/48k... all divide
# down to 4000; 11.025k/22.05k/44.1k to 11025. A resampled copy stays in
# its donor's family (integer-factor decimation), so pair members always
# share a canonical rate; a foreign rate canonicalizes to itself and
# degrades to the old exact-(sr, n) blocking.
_CANON_BASES = (4000, 11025)

_VERIFY_SCHEMA = pa.schema([
    ("bucket", pa.int64()), ("idx", pa.int64()),
    ("partner", pa.int64()), ("pcm", pa.binary())])


def _canon_sr(sr: int) -> int:
    for b in _CANON_BASES:
        if sr % b == 0:
            return b
    return sr


def _decimate(x: np.ndarray, f: int) -> np.ndarray:
    n = len(x) // f
    return x[: n * f : f]


def _canonical(x: np.ndarray, sr: int) -> tuple[np.ndarray, int]:
    """Render a decoded signal at its family's canonical rate.

    This IS the Resampler's rational grid (audio_ops.Resampler.resample)
    evaluated at an integer ratio: n_out = n*sr_out//sr_in = n//f, output
    sample k sits at input position k*sr_in/sr_out = k*f exactly (frac 0),
    so the rendering is pure sample picking — no interpolation error. Two
    consequences the screen and verify rely on:

      * a copy produced by the Resampler grid at sr/2 has EXACTLY the
        donor's canonical length ((n//2)//(f//2) == n//f) and values
        (plant[2k] == x[4k]), so blocking on exact (canon_sr, canon_n)
        is lossless for resampled copies — no fuzzy duration buckets;
      * G.711/PCM quantization is memoryless (per-sample), so quantizing
        commutes with decimation: a re-encoded copy's canonical rendering
        is the elementwise-quantized donor canonical rendering, which
        keeps true pairs >=35 dB SNR in the canonical domain (margin
        pinned in tests/test_audio_ops.py::test_perceptual_screen_margins).
    """
    c = _canon_sr(int(sr))
    if c == sr:
        return x, c
    return _decimate(x, sr // c), c


def _sign_sig(x: np.ndarray) -> np.uint64:
    """64-bit sign signature at evenly spaced positions of the CANONICAL
    rendering: a true re-encoding flips a sampled sign only where |x| <
    the G.711 decode error (0 flips measured across every planted pair at
    sf0.01; margin pinned in tests/test_audio_ops.py); independent clips
    differ in ~32. The screen only PRUNES — every surviving candidate is
    exact-SNR-verified, so a screen collision cannot create a false
    positive."""
    pos = np.linspace(0, len(x) - 1, _SIG_BITS).astype(np.int64)
    bits = (x[pos] >= 0).astype(np.uint64)
    return np.uint64((bits << np.arange(_SIG_BITS, dtype=np.uint64)).sum())


def _perc_effective(i: int, payload, sr: int, cod: str):
    """The signal a clip PRESENTS after the planting projection: plants
    (i%13==6) carry the donor's signal re-encoded under a different codec,
    plants (i%13==9) carry the donor's signal decimated to sr/2 (the
    Resampler grid at ratio 2) and then re-encoded — the
    resample-then-re-encode copy VERDICT r4 'What's missing #1' names.
    Both are regenerated from the synth seed (the plant needs the donor's
    DECODED SIGNAL, not a digest, so regeneration IS the plant here);
    everything else decodes its own payload. (synth_clips is a
    module-level import: an import statement in this worker-executed body
    would re-run on the worker and fail without the repo on its path —
    verify-skill trap #2.)

    Note the two plants of one donor d (clips d+6 and d+9) canonicalize
    to BIT-IDENTICAL renderings — quantization is per-sample, so
    q(x)[::f] == q(x[::2])[::f//2] — which makes (d+6, d+9) an exact
    digest-collapse star edge, not a verified pair; the oracle states
    exactly that star semantics."""
    r = i % _PERC_MOD
    if r == _PERC_OFF or r == _PERC_SR_OFF:
        donor_b, donor_sr, _, donor_c = synth_clips._audio_fields(
            i - r, synth_clips.MAX_DUR_MS)
        x = np.asarray(codecs.decode(donor_b, donor_c), dtype=np.float64)
        out_sr = int(donor_sr)
        if r == _PERC_SR_OFF:
            x = _decimate(x, 2)
            out_sr //= 2
        other = "alaw" if donor_c != "alaw" else "ulaw"
        y = codecs.decode(codecs.encode(x, other), other)
        return np.asarray(y, dtype=np.float64), out_sr
    return (np.asarray(codecs.decode(payload, cod), dtype=np.float64),
            int(sr))


class _PercRouter:
    """Actor-pool verify router: decodes ONLY clips named in a candidate
    pair and emits their canonical PCM into each pair's verify buckets.

    Routing state is adaptive (the attach_decisions precedent,
    quality_filter.py): at or below ``route_broadcast_max`` candidate
    clips the CSR routing ships once via ``ray.put`` and every actor
    resolves it from the object store in ``__init__``; above, it lands as a keyed lancelite side
    table (per-fragment [min, max] idx stats) and each actor range-probes
    only the fragments overlapping its batch — per-actor memory is bounded
    by the joiner's fragment LRU, not by the candidate count. The two
    paths are pinned byte-identical in
    tests/test_audio_ops.py::test_perceptual_keyed_route_equals_broadcast."""

    def __init__(self, spec, effective_fn):
        mode, payload = spec
        self._mode = mode
        self._fn = effective_fn
        if mode == "bcast":
            self._uq, self._off, self._mb = cached_get(payload)
        else:
            self._joiner = KeyedBatchJoiner(payload, columns=["idx", "bkts"])

    def _hits(self, idx: np.ndarray) -> list[tuple[int, np.ndarray]]:
        """(batch row, unique verify buckets) per candidate clip."""
        if self._mode == "bcast":
            uq, off, mb = self._uq, self._off, self._mb
            if not len(uq):
                return []
            pos = np.clip(np.searchsorted(uq, idx), 0, len(uq) - 1)
            hit = uq[pos] == idx
            return [(int(r), np.unique(mb[off[pos[r]]:off[pos[r] + 1]]))
                    for r in np.nonzero(hit)[0]]
        row, found, side = self._joiner.probe(idx)
        if side is None or not found.any():
            return []
        bk = side["bkts"]
        return [(int(r), np.unique(np.asarray(bk[int(row[r])].as_py(),
                                              dtype=np.int64)))
                for r in np.nonzero(found)[0]]

    def __call__(self, b: pa.Table) -> pa.Table:
        idx = _clip_indices(b)
        hits = self._hits(idx)
        if not hits:
            return _VERIFY_SCHEMA.empty_table()
        payloads = b["bytes"].combine_chunks()
        srs = b["sr_hz"].to_numpy(zero_copy_only=False).astype(np.int64)
        cods = b["codec"].to_pylist()
        out_bkt: list[int] = []
        out_i: list[int] = []
        out_pcm: list[bytes] = []
        for r, bks in hits:
            i = int(idx[r])
            x, sr = self._fn(i, payloads[r].as_buffer(), int(srs[r]),
                             cods[r])
            cx, _ = _canonical(np.asarray(x, dtype=np.float64), int(sr))
            pcm = cx.astype(np.float32).tobytes()
            for bk in bks:
                out_bkt.append(int(bk))
                out_i.append(i)
                out_pcm.append(pcm)
        return pa.table({
            "bucket": pa.array(out_bkt, pa.int64()),
            "idx": pa.array(out_i, pa.int64()),
            "partner": pa.nulls(len(out_i), pa.int64()),
            "pcm": pa.array(out_pcm, pa.binary()),
        }, schema=_VERIFY_SCHEMA)


def _idstr_table(a: np.ndarray, b: np.ndarray) -> pa.Table:
    return pa.table({
        "id_a": pa.array([f"clip-{int(i):012d}" for i in a], pa.string()),
        "id_b": pa.array([f"clip-{int(i):012d}" for i in b], pa.string())})


def perceptual_dedup_pairs(ds, effective_fn, n_rows: int | None = None,
                           route_broadcast_max: int =
                           PERC_ROUTE_BROADCAST_MAX,
                           snr_db: float = PERC_SNR_DB):
    """Decoded-domain near-dup pairs over a clips Dataset — the engine
    behind :func:`audio_perceptual_dedup`, factored so tests can run it
    over custom (flood) tables with their own ``effective_fn``.

    Scale shape — two passes, PCM volume moved is O(candidate pairs),
    never O(corpus); no stage holds more than one banding bucket:

    1. Signature pass: fused read+decode; each clip decodes once and
       emits a SLIM row (canonical sr/len, 64-bit sign signature of the
       canonical rendering, md5 digest of its bytes), exploded into
       {_SIG_BANDS} 16-bit signature chunks (the simhash banding pattern,
       dedup_family.py). The exchange keys on (band, chunk value,
       canon_sr, canon_n): a dominant duration atom — the r4 scale-killer,
       where one (sr, n) group put a c x c Hamming matrix in one reduce
       task — is now split 2^16 ways per band, and each bucket's reduce
       runs :func:`~..stages.dedup_family._collapse_and_pair`:
       digest-identical clips collapse to star edges on their global min
       id (a flood of byte-identical recordings emits O(flood) star rows,
       zero candidates), remaining reps all-pair within the bucket under
       the LSH_GROUP_CAP hub-star fallback (logged via logging, never a
       silent print-and-truncate), then a vectorized 64-bit Hamming
       filter (<= {_SIG_MAXHAM}) prunes. Banding recall: every planted
       pair measures Hamming 0 (test-pinned <= 3), so at least one of the
       4 chunks matches exactly — the screen loses nothing on true pairs.
    2. Verify pass: candidate pairs ride the exchange AS ROWS next to the
       routed canonical PCM (no pair-list broadcast); the routing
       (clip -> verify buckets) is broadcast CSR small-side or a keyed
       lancelite table above ``route_broadcast_max`` (see
       :class:`_PercRouter`). A second fused read re-decodes ONLY clips
       named in some pair; per-bucket exact canonical-domain SNR >=
       ``snr_db`` decides. Star edges are digest-equal (bit-identical
       renderings), so they skip verify entirely.

    Driver residency is O(star + candidate pairs) — the dup rate, not the
    corpus (the same assumption every dedup family op documents)."""
    import ray.data as rd

    from ..stages.decide import scaled_buckets
    from ..stages.dedup_family import (_collapse_and_pair, explode_sig16,
                                       hamming64_batch)
    from ..stages.exchange import bucket_exchange, bucket_exchange_dataset
    from .quality_filter import _cluster_cpus

    nb = scaled_buckets(None if n_rows is None else n_rows * _SIG_BANDS,
                        rows_per_bucket=200_000, lo=8)

    def sig_rows(b: pa.Table) -> pa.Table:
        idx = _clip_indices(b)
        payloads = b["bytes"].combine_chunks()
        srs = b["sr_hz"].to_numpy(zero_copy_only=False).astype(np.int64)
        cods = b["codec"].to_pylist()
        n = b.num_rows
        out_csr = np.empty(n, np.int64)
        out_cn = np.empty(n, np.int64)
        out_s = np.empty(n, np.uint64)
        digs: list[bytes] = []
        for r in range(n):
            x, sr = effective_fn(int(idx[r]), payloads[r].as_buffer(),
                                 int(srs[r]), cods[r])
            cx, csr = _canonical(np.asarray(x, dtype=np.float64), int(sr))
            out_csr[r], out_cn[r] = csr, len(cx)
            out_s[r] = _sign_sig(cx)
            digs.append(hashlib.md5(cx.astype(np.float32).tobytes())
                        .digest())
        rep_sig, band, cv = explode_sig16(out_s, _SIG_BANDS)
        rcsr = np.repeat(out_csr, _SIG_BANDS)
        rcn = np.repeat(out_cn, _SIG_BANDS)
        mix = (cv.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               ^ rcsr.astype(np.uint64) * np.uint64(1_000_003)
               ^ rcn.astype(np.uint64) * np.uint64(7919)
               ^ band.astype(np.uint64))
        take = pa.array(np.repeat(np.arange(n, dtype=np.int64), _SIG_BANDS))
        return pa.table({
            "bucket": pa.array((mix % np.uint64(nb)).astype(np.int64)),
            "idx": pa.array(np.repeat(idx.astype(np.int64), _SIG_BANDS)),
            "band": pa.array(band),
            "cv": pa.array(cv),
            "csr": pa.array(rcsr),
            "cn": pa.array(rcn),
            "sig": pa.array(rep_sig, pa.uint64()),
            "dig": pa.array(digs, pa.binary()).take(take),
        })

    def screen(t: pa.Table) -> pa.Table | None:
        g = (t.select(["idx", "band", "cv", "csr", "cn", "sig", "dig"])
             .to_pandas().rename(columns={"idx": "id", "dig": "th"}))
        stars, cands = _collapse_and_pair(
            g, ["band", "cv", "csr", "cn"], "band", carry=("sig",))
        if len(cands):
            hm = hamming64_batch(cands["sig_x"].to_numpy(dtype=np.uint64),
                                 cands["sig_y"].to_numpy(dtype=np.uint64))
            cands = cands[hm <= _SIG_MAXHAM]
        na, nc = len(stars), len(cands)
        if not (na or nc):
            return None
        return pa.table({
            "a": pa.array(np.concatenate([
                stars["a"].to_numpy(dtype=np.int64),
                cands["rep_x"].to_numpy(dtype=np.int64)])),
            "b": pa.array(np.concatenate([
                stars["b"].to_numpy(dtype=np.int64),
                cands["rep_y"].to_numpy(dtype=np.int64)])),
            "star": pa.array(np.concatenate([
                np.ones(na, np.int8), np.zeros(nc, np.int8)])),
        })

    empty = pa.table({"id_a": pa.array([], pa.string()),
                      "id_b": pa.array([], pa.string())})
    tabs = [t for t in bucket_exchange(
        ds.map_batches(sig_rows, batch_format="pyarrow", batch_size=None),
        nb, screen) if t.num_rows]
    if not tabs:
        return rd.from_arrow(empty)
    allp = pa.concat_tables(tabs)
    aa = allp["a"].to_numpy(zero_copy_only=False)
    bb = allp["b"].to_numpy(zero_copy_only=False)
    st = allp["star"].to_numpy(zero_copy_only=False)
    star_tab = _idstr_table(aa[st == 1], bb[st == 1])
    # the same rep pair can surface from up to _SIG_BANDS chunk-equality
    # buckets — dedupe once, driver-side (pairs are O(dup rate) small)
    cp = np.stack([aa[st == 0], bb[st == 0]], axis=1)
    if len(cp):
        cp = np.unique(cp, axis=0)
    if not len(cp):
        return rd.from_arrow(star_tab if star_tab.num_rows else empty)

    n_pairs = len(cp)
    nb2 = scaled_buckets(n_pairs, rows_per_bucket=1_000, lo=8)
    pbkt = np.arange(n_pairs, dtype=np.int64) % nb2
    pair_rows = pa.table({
        "bucket": pa.array(pbkt),
        "idx": pa.array(cp[:, 0]),
        "partner": pa.array(cp[:, 1]),
        "pcm": pa.nulls(n_pairs, pa.binary()),
    }, schema=_VERIFY_SCHEMA)
    # CSR routing: candidate clip id -> the verify buckets of its pairs
    mem_ids = np.concatenate([cp[:, 0], cp[:, 1]])
    mem_bkt = np.concatenate([pbkt, pbkt])
    o = np.argsort(mem_ids, kind="stable")
    mem_ids, mem_bkt = mem_ids[o], mem_bkt[o]
    uniq, starts = np.unique(mem_ids, return_index=True)
    off = np.append(starts, len(mem_ids)).astype(np.int64)
    if len(uniq) <= route_broadcast_max:
        # explicit ray.put + cached_get in the actor __init__ (the
        # AttachDecisionsBroadcast precedent): the constructor arg is a
        # tiny ref, the arrays live once in the object store, and every
        # actor resolves zero-copy views
        import ray
        spec = ("bcast", ray.put((uniq, off, mem_bkt)))
    else:
        import tempfile

        from ..sources import lancelite
        from ..sources.keyed import KeyedFragmentIndex
        route_uri = tempfile.mkdtemp(prefix="ccc_perc_route_")
        route_tab = pa.table({
            "idx": pa.array(uniq, pa.int64()),
            "bkts": pa.LargeListArray.from_arrays(
                pa.array(off, pa.int64()), pa.array(mem_bkt, pa.int64()))})
        lancelite.write_dataset(rd.from_arrow(route_tab), route_uri,
                                key_stats="idx", rows_per_file=65536)
        spec = ("keyed", KeyedFragmentIndex(route_uri, "idx"))

    def verify(t: pa.Table) -> pa.Table | None:
        import pyarrow.compute as pc
        if t.num_rows == 0:
            return None
        valid = pc.is_valid(t["partner"])
        pr = t.filter(valid)
        px = t.filter(pc.invert(valid))
        ids = px["idx"].to_numpy(zero_copy_only=False)
        pcms = px["pcm"].combine_chunks()
        sigd = {int(ids[r]): np.frombuffer(pcms[r].as_buffer(),
                                           dtype=np.float32)
                .astype(np.float64)
                for r in range(px.num_rows)}
        pa_ = pr["idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        pb_ = pr["partner"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_a, out_b = [], []
        for a, c in zip(pa_, pb_):
            xa, xc = sigd.get(int(a)), sigd.get(int(c))
            if (xa is not None and xc is not None and len(xa) == len(xc)
                    and codecs.snr_db(xa, xc) >= snr_db):
                out_a.append(int(a))
                out_b.append(int(c))
        if not out_a:
            return None
        return _idstr_table(np.asarray(out_a), np.asarray(out_b))

    routed = ds.map_batches(
        _PercRouter, batch_format="pyarrow", batch_size=None,
        fn_constructor_args=(spec, effective_fn),
        concurrency=(1, max(2, _cluster_cpus() - 2)), num_cpus=1)
    ver_ds = bucket_exchange_dataset(
        routed.union(rd.from_arrow(pair_rows)), nb2, verify, empty)
    if star_tab.num_rows:
        return rd.from_arrow(star_tab).union(ver_ds)
    return ver_ds


def audio_perceptual_dedup(sf_dir: str, *,
                           route_broadcast_max: int =
                           PERC_ROUTE_BROADCAST_MAX):
    """Decoded-domain (perceptual) near-dup detection: the same RECORDING
    re-encoded under a different codec — or decimated to a lower rate and
    THEN re-encoded — has different payload bytes, so exact payload dedup
    (audio_dedup) misses it; this op catches both by comparing what the
    clips SOUND like in a canonical-rate rendering. The planted-pair set
    is pure integer arithmetic (see :func:`_perc_effective`), so the
    driver hash-gates the detector's output: a missed re-encoding, a
    missed resampled copy, or a false positive breaks the hash. Engine
    and scale shape: :func:`perceptual_dedup_pairs`."""
    import ray.data as rd
    uri = ensure_clips(sf_dir, with_audio=True)
    ds = rd.read_parquet(uri, columns=["clip_id", "bytes", "sr_hz", "codec"])
    return perceptual_dedup_pairs(ds, _perc_effective,
                                  n_rows=clips_count(sf_dir),
                                  route_broadcast_max=route_broadcast_max)


def audio_perceptual_dedup_sql() -> str:
    """The planted-pair set the detector must recover exactly, under the
    operator's documented star semantics. Every donor d (d%13==0) has two
    plants: d+6 (codec swap) and d+9 (decimate to sr/2 + codec swap).
    Because per-sample quantization commutes with decimation, the two
    plants canonicalize to BIT-IDENTICAL renderings: they digest-collapse
    to a star edge (d+6, d+9) on the min id, whose rep d+6 alone pairs
    with the donor — so the exact output is (d, d+6) UNION (d+6, d+9),
    NOT the (d, d+9) transitive closure. The fixture's own clips are
    pairwise independent signals, so any other pair at SNR>=30 dB would
    be a detector false positive and break the hash."""
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    pad = "'clip-' || lpad(CAST({} AS VARCHAR), 12, '0')"
    return f"""
WITH ix AS (SELECT CAST(regexp_extract(clip_id, '([0-9]+)$', 1) AS BIGINT)
                   AS i
            FROM read_parquet('{uri}/*.parquet')),
d AS (SELECT i AS d, (SELECT max(i) FROM ix) AS m FROM ix
      WHERE i % {_PERC_MOD} = 0)
SELECT {pad.format('d')} AS id_a,
       {pad.format(f'd + {_PERC_OFF}')} AS id_b
FROM d WHERE d + {_PERC_OFF} <= m
UNION ALL
SELECT {pad.format(f'd + {_PERC_OFF}')} AS id_a,
       {pad.format(f'd + {_PERC_SR_OFF}')} AS id_b
FROM d WHERE d + {_PERC_SR_OFF} <= m"""


def audio_perceptual_clusters(sf_dir: str):
    """Cluster assignment over the perceptual dup graph: every clip maps
    to the MIN clip index reachable through verified perceptual edges —
    {donor, codec-swap copy, decimate-then-re-encode copy} collapse to
    one canonical recording id, everything else is a singleton. This
    composes the audio detector into the same
    :func:`~..stages.dedup_family.connected_components` policy the text
    and embedding detectors drive (detector x policy closure across all
    three modalities): pair semantics are star edges, NOT transitive —
    the closure is exactly what turns (d, d+6) + (d+6, d+9) into one
    recording cluster a keep-one policy can cut.

    Scale shape: pairs come from :func:`perceptual_dedup_pairs`
    (O(dup rate) rows), the label graph is int clip indices end-to-end,
    and the output is one (clip_id, cluster) row per clip — the
    per-corpus assignment table a curation run joins against."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.dedup_family import connected_components

    uri = ensure_clips(sf_dir, with_audio=True)
    n = clips_count(sf_dir)

    def pair_idx(b: pa.Table) -> pa.Table:
        return pa.table({
            "id_a": pa.array(_clip_indices(
                pa.table({"clip_id": b["id_a"]})), pa.int64()),
            "id_b": pa.array(_clip_indices(
                pa.table({"clip_id": b["id_b"]})), pa.int64())})

    def id_rows(b: pa.Table) -> pa.Table:
        return pa.table({"idx": pa.array(_clip_indices(b), pa.int64())})

    pairs = audio_perceptual_dedup(sf_dir).map_batches(
        pair_idx, batch_format="pyarrow")
    ids = rd.read_parquet(uri, columns=["clip_id"]).map_batches(
        id_rows, batch_format="pyarrow")
    cc = connected_components(pairs, ids, id_col="idx", n_rows=n)

    def back(b: pa.Table) -> pa.Table:
        s = pc.utf8_lpad(pc.cast(b["idx"], pa.string()), 12, "0")
        return pa.table({
            "clip_id": pc.binary_join_element_wise(
                pa.array(["clip-"] * b.num_rows), s, ""),
            "cluster": b["cluster"]})

    return cc.map_batches(back, batch_format="pyarrow")


def audio_keep_best(sf_dir: str):
    """Keep-best per perceptual recording cluster: one surviving clip per
    cluster from :func:`audio_perceptual_clusters`'s graph, keeping the
    LONGEST member (max ``dur_ms``, ties to the smallest clip index) —
    the policy an ASR corpus build wants when a recording circulates as
    codec-swapped and decimated copies (the decimated copy is the lossy
    one; duration is the quality proxy the metadata already carries).
    Mirrors :func:`~..stages.dedup_family.dedup_keep_best`: ``dur_ms``
    rides the connected-components attach as an extra column, then one
    bucket exchange keyed by cluster runs a vectorized per-cluster
    argmax. Returns (cluster, clip_id, dur_ms, n_members), one row per
    cluster; only slim (idx, cluster, dur_ms) rows shuffle."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.dedup_family import (_id_bucket, _pair_buckets,
                                       connected_components)
    from ..stages.exchange import bucket_exchange_dataset

    uri = ensure_clips(sf_dir, with_audio=True)
    n = clips_count(sf_dir)
    nb = _pair_buckets(n)

    def pair_idx(b: pa.Table) -> pa.Table:
        return pa.table({
            "id_a": pa.array(_clip_indices(
                pa.table({"clip_id": b["id_a"]})), pa.int64()),
            "id_b": pa.array(_clip_indices(
                pa.table({"clip_id": b["id_b"]})), pa.int64())})

    def id_rows(b: pa.Table) -> pa.Table:
        return pa.table({"idx": pa.array(_clip_indices(b), pa.int64()),
                         "dur_ms": b["dur_ms"].cast(pa.int64())})

    pairs = audio_perceptual_dedup(sf_dir).map_batches(
        pair_idx, batch_format="pyarrow")
    ids = rd.read_parquet(uri, columns=["clip_id", "dur_ms"]).map_batches(
        id_rows, batch_format="pyarrow")
    cc = connected_components(pairs, ids, id_col="idx", n_rows=n)

    def bucketize(b: pa.Table) -> pa.Table:
        cl = b["cluster"].to_numpy(zero_copy_only=False)
        return b.append_column("bucket",
                               pa.array(_id_bucket(cl, nb), pa.int64()))

    def best(t: pa.Table) -> pa.Table | None:
        df = t.select(["idx", "cluster", "dur_ms"]).to_pandas()
        if df.empty:
            return None
        sizes = df.groupby("cluster", sort=False)["idx"].size()
        df = df.sort_values(["cluster", "dur_ms", "idx"],
                            ascending=[True, False, True])
        k = df.drop_duplicates("cluster", keep="first")
        ids_s = pc.utf8_lpad(
            pc.cast(pa.array(k["idx"].to_numpy(np.int64)), pa.string()),
            12, "0")
        return pa.table({
            "cluster": pa.array(k["cluster"].to_numpy(np.int64)),
            "clip_id": pc.binary_join_element_wise(
                pa.array(["clip-"] * len(k)), ids_s, ""),
            "dur_ms": pa.array(k["dur_ms"].to_numpy(np.int64)),
            "n_members": pa.array(
                sizes.reindex(k["cluster"]).to_numpy(np.int64))})

    empty = pa.table({"cluster": pa.array([], pa.int64()),
                      "clip_id": pa.array([], pa.string()),
                      "dur_ms": pa.array([], pa.int64()),
                      "n_members": pa.array([], pa.int64())})
    return bucket_exchange_dataset(
        cc.map_batches(bucketize, batch_format="pyarrow"), nb, best, empty)


def audio_keep_best_sql() -> str:
    """Keep-best over the integer-arithmetic cluster closure: cluster
    labels from the same CASE as :func:`audio_perceptual_clusters_sql`,
    winner = max dur_ms (ties min index) per cluster via a window."""
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    return f"""
WITH ix AS (SELECT clip_id, CAST(dur_ms AS BIGINT) AS dur_ms,
                   CAST(regexp_extract(clip_id, '([0-9]+)$', 1) AS BIGINT)
                       AS i
            FROM read_parquet('{uri}/*.parquet')),
cl AS (SELECT clip_id, dur_ms, i,
              CASE WHEN i % {_PERC_MOD} = {_PERC_OFF} THEN i - {_PERC_OFF}
                   WHEN i % {_PERC_MOD} = {_PERC_SR_OFF}
                       THEN i - {_PERC_SR_OFF}
                   ELSE i END AS cluster
       FROM ix)
SELECT cluster, clip_id, dur_ms, n_members FROM (
  SELECT cluster, clip_id, dur_ms,
         count(*) OVER (PARTITION BY cluster) AS n_members,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY dur_ms DESC, i) AS rn
  FROM cl) WHERE rn = 1"""


def audio_perceptual_clusters_sql() -> str:
    """Closure of the planted star structure in pure integer arithmetic:
    a plant at i%13==6 reaches its donor i-6 directly, a plant at
    i%13==9 reaches the donor through the (d+6, d+9) star edge, so the
    min reachable index is i minus its plant offset; all other clips are
    singletons. Any detector miss, false pair, or propagation bug yields
    a different label somewhere and breaks the hash."""
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    return f"""
WITH ix AS (SELECT clip_id,
                   CAST(regexp_extract(clip_id, '([0-9]+)$', 1) AS BIGINT)
                       AS i
            FROM read_parquet('{uri}/*.parquet'))
SELECT clip_id,
       CASE WHEN i % {_PERC_MOD} = {_PERC_OFF} THEN i - {_PERC_OFF}
            WHEN i % {_PERC_MOD} = {_PERC_SR_OFF} THEN i - {_PERC_SR_OFF}
            ELSE i END AS cluster
FROM ix"""


def _raw_effective(i: int, payload, sr: int, cod: str):
    """Identity projection for production corpora (no fixture plants):
    every clip presents its own decoded payload."""
    return np.asarray(codecs.decode(payload, cod), dtype=np.float64), int(sr)


def audio_dup_flags(clips_ds, mode: str, n_rows: int | None = None,
                    route_broadcast_max: int = PERC_ROUTE_BROADCAST_MAX):
    """(clip_id, audio_dup_of) rows for audio-duplicate MEMBERS — the
    flagship's optional audio-dedup side input
    (``PipelineConfig.audio_dedup``; attached by
    ``quality_filter.attach_audio_flags``).

    ``mode="exact"``: md5 over (codec, sr, payload bytes), keep-first by
    clip_id per digest. One slim digest exchange; the digest determines
    the bucket, so all copies of a payload land in one reduce and the
    winner is the GLOBAL min clip_id. Payload bytes never shuffle.

    ``mode="perceptual"``: decoded-domain pairs from
    :func:`perceptual_dedup_pairs` under the identity projection — digest
    star edges catch byte-identical payloads AND bit-identical decodes
    across containers, the banded sign screen + SNR verify catch
    re-encodings and resampled copies. The flag winner is each member's
    MIN pair partner: pairwise keep-first, not full connected components
    (``dedup_clusters`` is the transitive tool; a chain a<b<c where only
    (a,b) and (b,c) verified flags b->a and c->b, both dropped, a kept —
    the same row survives either way).

    Returns a Dataset of flag rows; volume is O(dup rate), never
    O(corpus). Assumes integer-suffixed clip ids (the whole audio family
    keys on them, see ``_clip_indices``)."""
    import ray.data as rd

    from ..stages.decide import scaled_buckets
    from ..stages.exchange import bucket_exchange_dataset

    empty = pa.table({"clip_id": pa.array([], pa.string()),
                      "audio_dup_of": pa.array([], pa.string())})
    ds = clips_ds.select_columns(["clip_id", "bytes", "sr_hz", "codec"])
    if mode == "exact":
        nb = scaled_buckets(n_rows, rows_per_bucket=500_000, lo=8)

        def keys(b: pa.Table) -> pa.Table:
            payloads = b["bytes"].combine_chunks()
            cods = b["codec"].to_pylist()
            srs = b["sr_hz"].to_numpy(zero_copy_only=False).astype(np.int64)
            digs: list[bytes] = []
            bkt = np.empty(b.num_rows, np.int64)
            for r in range(b.num_rows):
                h = hashlib.md5(f"{cods[r]}:{srs[r]}:".encode())
                h.update(payloads[r].as_buffer())
                d = h.digest()
                digs.append(d)
                bkt[r] = int.from_bytes(d[:8], "little") % nb
            return pa.table({"bucket": pa.array(bkt),
                             "clip_id": b["clip_id"],
                             "dig": pa.array(digs, pa.binary())})

        def members(t: pa.Table) -> pa.Table | None:
            df = t.select(["clip_id", "dig"]).to_pandas()
            win = df.groupby("dig", sort=False)["clip_id"].transform("min")
            m = df["clip_id"] != win
            if not m.any():
                return None
            return pa.table({
                "clip_id": pa.array(df.loc[m, "clip_id"], pa.string()),
                "audio_dup_of": pa.array(win[m], pa.string())})

        return bucket_exchange_dataset(
            ds.map_batches(keys, batch_format="pyarrow", batch_size=None),
            nb, members, empty)

    if mode != "perceptual":
        raise ValueError(f"audio_dedup mode must be exact|perceptual, "
                         f"got {mode!r}")
    pairs = perceptual_dedup_pairs(ds, _raw_effective, n_rows=n_rows,
                                   route_broadcast_max=route_broadcast_max)
    # winner per member: min pair partner, one exchange keyed by the
    # member id (pairs are O(dup rate) — the buckets exist for the skew
    # case, not volume)
    nb2 = scaled_buckets(None, lo=8)

    def to_rows(b: pa.Table) -> pa.Table:
        ib = np.array([int(x.rsplit("-", 1)[1])
                       for x in b["id_b"].to_pylist()], dtype=np.int64)
        return pa.table({"bucket": pa.array(ib % nb2),
                         "clip_id": b["id_b"],
                         "audio_dup_of": b["id_a"]})

    def winner(t: pa.Table) -> pa.Table | None:
        df = t.select(["clip_id", "audio_dup_of"]).to_pandas()
        if df.empty:
            return None
        w = (df.groupby("clip_id", sort=False)["audio_dup_of"].min()
             .reset_index())
        return pa.table({"clip_id": pa.array(w["clip_id"], pa.string()),
                         "audio_dup_of": pa.array(w["audio_dup_of"],
                                                  pa.string())})

    return bucket_exchange_dataset(
        pairs.map_batches(to_rows, batch_format="pyarrow"),
        nb2, winner, empty)


# --- audio_dedup_incremental ---------------------------------------------------

_INC_AUDIO_MOD = 11      # new-stream derivation: i%11==4 -> prior payload
_INC_AUDIO_DUP = 4       # (cross-crawl duplicate, must drop);
_INC_AUDIO_NEW = 7       # i%11==7 -> payload || 0x7F (novel, must keep)
_INC_AUDIO_BASE = 1_000_000_000


class _PayloadAntiProbe:
    """Actor-pool anti-join against the prior corpus's keyed payload-digest
    table: one searchsorted probe per batch with per-actor fragment LRU
    (sources/keyed.py — the dedup_incremental pattern on the audio axis).
    Input batches MUST be key-range-clustered (caller sorts on the digest
    key first), or fragment pruning degenerates to a full index load."""

    def __init__(self, index):
        self.joiner = KeyedBatchJoiner(index, columns=["payload_key"])

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        _, found, _ = self.joiner.probe(b["payload_key"])
        return b.filter(pa.array(~found))


def audio_dedup_incremental(sf_dir: str):
    """Cross-crawl incremental AUDIO dedup: when a new crawl of clips lands
    on an existing corpus, drop new clips whose PAYLOAD already exists in
    the prior corpus — without rescanning the prior corpus (the reference
    rescans the union per crawl, deduplication.py). The prior corpus's
    payload digests are distilled ONCE into a digest-sorted keyed side
    table (content-keyed /tmp cache = the persisted state a real prior
    crawl leaves behind); each increment hashes only NEW payloads, sorts
    the slim (new_id, digest) stream, and anti-probes with fragment-range
    pruning — per-increment cost O(new).

    The new stream derives deterministically from the fixture so the
    oracle can rebuild it: clip i%{_INC_AUDIO_MOD}=={_INC_AUDIO_DUP}
    re-submits its prior payload (a truck-backup duplicate upload — must
    drop); i%{_INC_AUDIO_MOD}=={_INC_AUDIO_NEW} appends one byte 0x7F (a
    genuinely new recording — must keep). Digest = md5_i64 over the
    UPPERCASE payload hex, the DuckDB-spellable blob hash.

    ``version=1`` pins the PRIOR corpus digest state:
    payload_index_evolution appends a later crawl's survivor digests as
    version 2+, and this query's semantics must not change under that."""
    from ..sources.keyed import KeyedFragmentIndex

    uri = ensure_clips(sf_dir, with_audio=True)
    idx_uri = _audio_digest_prior_uri(uri)
    return _digest_survivors(
        _audio_inc1_keys(uri),
        KeyedFragmentIndex(idx_uri, "payload_key", version=1))


def _audio_digest_prior_uri(uri: str) -> str:
    """One-time version-1 staging of the prior corpus's payload-digest
    index (idempotent; payload_index_evolution appends versions)."""
    import ray.data as rd

    from ..functions.hashing import md5_i64
    from ..sources import lancelite

    idx_uri = f"/tmp/ccc_prior_audio_idx_{_clips_tag(uri)}"

    def prior_keys(b: pa.Table) -> pa.Table:
        payloads = b["bytes"].combine_chunks()
        ks = [md5_i64(memoryview(payloads[r].as_buffer()).hex().upper())
              for r in range(b.num_rows)]
        return pa.table({"payload_key": pa.array(ks, pa.int64())})

    if not os.path.exists(os.path.join(idx_uri, "_versions")):
        prior = (rd.read_parquet(uri, columns=["bytes"])
                 .map_batches(prior_keys, batch_format="pyarrow",
                              batch_size=None)
                 .sort("payload_key"))
        lancelite.write_dataset(prior, idx_uri, key_stats="payload_key")
    return idx_uri


def _audio_inc1_keys(uri: str):
    """The crawl-1 (new_id, payload_key) stream (see _INC_AUDIO_*)."""
    import ray.data as rd

    from ..functions.hashing import md5_i64

    def new_stream(b: pa.Table) -> pa.Table:
        idx = _clip_indices(b)
        payloads = b["bytes"].combine_chunks()
        ids: list[int] = []
        ks: list[int] = []
        for r in range(b.num_rows):
            i, m = int(idx[r]), int(idx[r]) % _INC_AUDIO_MOD
            if m == _INC_AUDIO_DUP:
                hx = memoryview(payloads[r].as_buffer()).hex().upper()
            elif m == _INC_AUDIO_NEW:
                hx = memoryview(payloads[r].as_buffer()).hex().upper() + "7F"
            else:
                continue
            ids.append(_INC_AUDIO_BASE + i)
            ks.append(md5_i64(hx))
        return pa.table({"new_id": pa.array(ids, pa.int64()),
                         "payload_key": pa.array(ks, pa.int64())})

    return rd.read_parquet(uri, columns=["clip_id", "bytes"]).map_batches(
        new_stream, batch_format="pyarrow", batch_size=None)


def _digest_survivors(new_ds, index):
    """Shared increment-side pipeline: sort the slim (new_id, payload_key)
    stream, anti-probe the persisted digest index, keep-min within the
    stream. Returns a Dataset of (payload_key, new_id) survivors."""
    from ray.data.aggregate import Min

    fresh = (new_ds.sort("payload_key")
             .map_batches(_PayloadAntiProbe, batch_format="pyarrow",
                          batch_size=4096, fn_constructor_args=(index,),
                          concurrency=(1, 4), num_cpus=1))
    return fresh.groupby("payload_key").aggregate(
        Min("new_id", alias_name="new_id"))


def audio_dedup_incremental_sql() -> str:
    from ..functions.hashing import sql_md5_i64
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    k_prior = sql_md5_i64("hex(bytes)")
    k_new = sql_md5_i64("CONCAT(hex(bytes), '7F')")
    return f"""
WITH src AS (
  SELECT CAST(regexp_extract(clip_id, '([0-9]+)$', 1) AS BIGINT) AS i, bytes
  FROM read_parquet('{uri}/*.parquet')
), newstream AS (
  SELECT {_INC_AUDIO_BASE} + i AS new_id, {k_prior} AS payload_key
  FROM src WHERE i % {_INC_AUDIO_MOD} = {_INC_AUDIO_DUP}
  UNION ALL
  SELECT {_INC_AUDIO_BASE} + i, {k_new}
  FROM src WHERE i % {_INC_AUDIO_MOD} = {_INC_AUDIO_NEW}
)
SELECT payload_key, min(new_id) AS new_id
FROM newstream
WHERE payload_key NOT IN (SELECT {k_prior} FROM src)
GROUP BY payload_key"""


# crawl-2 derivation for payload_index_evolution (exact-audio axis)
_EVO_AUDIO_DUP1 = 1      # i%11==1 -> prior payload re-submitted (dup v1)
_EVO_AUDIO_SURV = _INC_AUDIO_NEW   # i%11==7 -> payload||7F again == the
                                   #   crawl-1 survivor (dup via append)
_EVO_AUDIO_NEW2 = 9      # i%11==9 -> payload||7F7F (novel)
_EVO_AUDIO_BASE = 6_000_000_000


def payload_index_evolution(sf_dir: str):
    """Multi-crawl state evolution of the EXACT-audio payload-digest
    index — the exact-detector twin of audio_index_evolution, completing
    the incremental x evolution matrix on the audio axis: crawl-1
    survivor digests (the audio_dedup_incremental result) are APPENDED
    to the persisted index as lancelite version 2; crawl 2 anti-probes
    the evolved union. Crawl-2 stream: i%11==1 re-submits the prior
    payload (dup the version-1 state catches), i%11==7 re-submits the
    SAME 0x7F-suffixed payload crawl-1 introduced (dup ONLY via the
    appended digests), i%11==9 suffixes 0x7F7F (novel). O(increment)
    per crawl; the oracle is hash semi-joins over both crawls."""
    from ..functions.hashing import md5_i64
    from ..sources import lancelite
    from ..sources.keyed import KeyedFragmentIndex

    uri = ensure_clips(sf_dir, with_audio=True)
    idx_uri = _audio_digest_prior_uri(uri)
    acc_uri = f"/tmp/ccc_evo_audio_acc_{_clips_tag(uri)}"

    if not os.path.exists(os.path.join(acc_uri, "_versions")):
        surv1 = _digest_survivors(
            _audio_inc1_keys(uri),
            KeyedFragmentIndex(idx_uri, "payload_key", version=1))
        lancelite.write_dataset(surv1.sort("payload_key"), acc_uri,
                                key_stats="payload_key")
    if lancelite.latest_version(idx_uri) < 2:
        lancelite.write_dataset(
            lancelite.read(acc_uri, columns=["payload_key"]), idx_uri,
            mode="append", key_stats="payload_key")

    import ray.data as rd

    def new2_stream(b: pa.Table) -> pa.Table:
        idx = _clip_indices(b)
        payloads = b["bytes"].combine_chunks()
        ids: list[int] = []
        ks: list[int] = []
        for r in range(b.num_rows):
            i, m = int(idx[r]), int(idx[r]) % _INC_AUDIO_MOD
            if m == _EVO_AUDIO_DUP1:
                hx = memoryview(payloads[r].as_buffer()).hex().upper()
            elif m == _EVO_AUDIO_SURV:
                hx = memoryview(payloads[r].as_buffer()).hex().upper() + "7F"
            elif m == _EVO_AUDIO_NEW2:
                hx = (memoryview(payloads[r].as_buffer()).hex().upper()
                      + "7F7F")
            else:
                continue
            ids.append(_EVO_AUDIO_BASE + i)
            ks.append(md5_i64(hx))
        return pa.table({"new_id": pa.array(ids, pa.int64()),
                         "payload_key": pa.array(ks, pa.int64())})

    new2 = rd.read_parquet(uri, columns=["clip_id", "bytes"]).map_batches(
        new2_stream, batch_format="pyarrow", batch_size=None)
    return _digest_survivors(new2,
                             KeyedFragmentIndex(idx_uri, "payload_key"))


def payload_index_evolution_sql() -> str:
    from ..functions.hashing import sql_md5_i64
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    k_prior = sql_md5_i64("hex(bytes)")
    k_7f = sql_md5_i64("CONCAT(hex(bytes), '7F')")
    k_7f7f = sql_md5_i64("CONCAT(hex(bytes), '7F7F')")
    return f"""
WITH src AS (
  SELECT CAST(regexp_extract(clip_id, '([0-9]+)$', 1) AS BIGINT) AS i, bytes
  FROM read_parquet('{uri}/*.parquet')
), surv1 AS (
  SELECT {k_7f} AS hh FROM src WHERE i % {_INC_AUDIO_MOD} = {_INC_AUDIO_NEW}
), idx AS (
  SELECT {k_prior} AS hh FROM src UNION SELECT hh FROM surv1
), new2 AS (
  SELECT {_EVO_AUDIO_BASE} + i AS new_id, {k_prior} AS payload_key
  FROM src WHERE i % {_INC_AUDIO_MOD} = {_EVO_AUDIO_DUP1}
  UNION ALL
  SELECT {_EVO_AUDIO_BASE} + i, {k_7f}
  FROM src WHERE i % {_INC_AUDIO_MOD} = {_EVO_AUDIO_SURV}
  UNION ALL
  SELECT {_EVO_AUDIO_BASE} + i, {k_7f7f}
  FROM src WHERE i % {_INC_AUDIO_MOD} = {_EVO_AUDIO_NEW2}
)
SELECT payload_key, min(new_id) AS new_id FROM new2
WHERE payload_key NOT IN (SELECT hh FROM idx)
GROUP BY payload_key"""


# --- audio_perceptual_incremental ---------------------------------------------

_INC_PERC_MOD = 11       # new-stream derivation from prior clip i:
_INC_PERC_CODEC = 2      # i%11==2 -> same recording re-encoded under the
                         # other codec (cross-crawl transcoded re-upload,
                         # must flag);
_INC_PERC_SR = 8         # i%11==8 -> decimated to sr/2 THEN re-encoded
                         # (the resample-then-re-encode copy, must flag);
_INC_PERC_NEG = 5        # i%11==5 -> NEGATED signal re-encoded (novel
                         # recording decoy: same shape and spectrum
                         # envelope as its source but anti-correlated —
                         # a false flag on it breaks the oracle hash)
_INC_PERC_BASE = 2_000_000_000


def _perc_probe_key(band: np.ndarray, cv: np.ndarray, csr: np.ndarray,
                    cn: np.ndarray) -> np.ndarray:
    """Sortable int64 probe key for a banded sign-signature chunk: the
    perceptual screen's (band, chunk value, canon_sr, canon_n) blocking
    mix (perceptual_dedup_pairs.sig_rows) WITHOUT the bucket modulus, so
    a lancelite key-stats index can range-prune on it. Collisions are
    possible (it is a hash); the probe re-checks the four blocking
    columns exactly, so a collision costs one filtered row, never a
    false candidate."""
    mix = (cv.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
           ^ csr.astype(np.uint64) * np.uint64(1_000_003)
           ^ cn.astype(np.uint64) * np.uint64(7919)
           ^ band.astype(np.uint64))
    return mix.view(np.int64)


class _PercIncBandProbe:
    """Actor-pool range probe of the persisted prior perceptual band
    index: each batch of new-stream band rows (sorted by bk, so fragment
    pruning holds) range-scans the prior index, re-checks the blocking
    columns exactly (bk is a hash), Hamming-filters the full 64-bit
    signatures, and emits candidate (nid, pid) pairs. The
    dedup_incremental_near._BandProbe pattern on the audio axis."""

    def __init__(self, index, hamming_fn, max_hamming: int):
        self.joiner = KeyedBatchJoiner(
            index, columns=["bk", "band", "cv", "csr", "cn", "sig", "idx"])
        self.hamming = hamming_fn
        self.max_hamming = max_hamming

    def __call__(self, b: pa.Table) -> pa.Table:
        empty = pa.table({"nid": pa.array([], pa.int64()),
                          "pid": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        k = b["bk"].to_numpy(zero_copy_only=False)
        side = self.joiner._side_for(k)
        if side is None:
            return empty
        skeys, stable = side
        lo = np.searchsorted(skeys, k, "left")
        hi = np.searchsorted(skeys, k, "right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return empty
        starts = np.cumsum(cnt) - cnt
        ridx = np.repeat(lo, cnt) + (np.arange(total) - np.repeat(starts,
                                                                  cnt))
        take = pa.array(ridx)

        def side_np(col: str, dt) -> np.ndarray:
            return (stable[col].take(take)
                    .to_numpy(zero_copy_only=False).astype(dt))

        def probe_np(col: str, dt) -> np.ndarray:
            return np.repeat(
                b[col].to_numpy(zero_copy_only=False).astype(dt), cnt)

        ok = np.ones(total, bool)
        for col in ("band", "cv", "csr", "cn"):
            ok &= side_np(col, np.int64) == probe_np(col, np.int64)
        hm = self.hamming(probe_np("sig", np.uint64)[ok],
                          side_np("sig", np.uint64)[ok])
        pairs = np.stack([probe_np("idx", np.int64)[ok][
                              hm <= self.max_hamming],
                          side_np("idx", np.int64)[ok][
                              hm <= self.max_hamming]], axis=1)
        if len(pairs):
            pairs = np.unique(pairs, axis=0)      # per-batch band dedup
        return pa.table({"nid": pa.array(pairs[:, 0], pa.int64()),
                         "pid": pa.array(pairs[:, 1], pa.int64())})


class _PercIncVerify:
    """Actor-pool exact-SNR verify of (nid, pid) candidates: both sides'
    payloads come from idx-keyed side tables (batches are pid-sorted, so
    prior fragment pruning holds; the new table is O(new) on disk and the
    per-actor LRU bounds memory even unclustered — the
    dedup_incremental_near._NearVerify precedent). Decodes and
    canonicalizes ONLY candidate clips — O(candidates), never O(corpus)."""

    def __init__(self, prior_index, new_index, snr_db: float):
        cols = ["idx", "bytes", "sr_hz", "codec"]
        self.pj = KeyedBatchJoiner(prior_index, columns=cols)
        self.nj = KeyedBatchJoiner(new_index, columns=cols)
        self.snr = snr_db

    @staticmethod
    def _canon_of(joiner, keys) -> list[np.ndarray]:
        got = joiner.take_columns(keys, {"bytes": pa.binary(),
                                         "sr_hz": pa.int64(),
                                         "codec": pa.string()})
        payloads = got["bytes"]
        srs = got["sr_hz"].to_numpy(zero_copy_only=False)
        cods = got["codec"].to_pylist()
        out = []
        for r in range(len(cods)):
            x = np.asarray(codecs.decode(payloads[r].as_buffer(), cods[r]),
                           dtype=np.float64)
            out.append(_canonical(x, int(srs[r]))[0])
        return out

    def __call__(self, b: pa.Table) -> pa.Table:
        empty = pa.table({"new_id": pa.array([], pa.int64()),
                          "pid": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        nx = self._canon_of(self.nj, b["nid"])
        px = self._canon_of(self.pj, b["pid"])
        nids = b["nid"].to_numpy(zero_copy_only=False)
        pids = b["pid"].to_numpy(zero_copy_only=False)
        out_n, out_p = [], []
        for r in range(b.num_rows):
            if (len(nx[r]) == len(px[r])
                    and codecs.snr_db(nx[r], px[r]) >= self.snr):
                out_n.append(int(nids[r]))
                out_p.append(int(pids[r]))
        if not out_n:
            return empty
        return pa.table({"new_id": pa.array(out_n, pa.int64()),
                         "pid": pa.array(out_p, pa.int64())})


def _perc_band_rows(b: pa.Table, ids: np.ndarray) -> pa.Table:
    """bk-keyed band rows (``_SIG_BANDS`` per clip) of canonical sign
    signatures — the persisted perceptual index's row format, shared by
    the prior-corpus staging, the increment probe, and the
    audio_index_evolution append path (one spelling, cannot drift)."""
    payloads = b["bytes"].combine_chunks()
    srs = b["sr_hz"].to_numpy(zero_copy_only=False).astype(np.int64)
    cods = b["codec"].to_pylist()
    n = b.num_rows
    out_csr = np.empty(n, np.int64)
    out_cn = np.empty(n, np.int64)
    out_s = np.empty(n, np.uint64)
    for r in range(n):
        x = np.asarray(codecs.decode(payloads[r].as_buffer(), cods[r]),
                       dtype=np.float64)
        cx, csr = _canonical(x, int(srs[r]))
        out_csr[r], out_cn[r] = csr, len(cx)
        out_s[r] = _sign_sig(cx)
    rep, band, cv = explode_sig16(out_s, _SIG_BANDS)
    rcsr = np.repeat(out_csr, _SIG_BANDS)
    rcn = np.repeat(out_cn, _SIG_BANDS)
    return pa.table({
        "bk": pa.array(_perc_probe_key(band, cv, rcsr, rcn)),
        "band": pa.array(band),
        "cv": pa.array(cv),
        "csr": pa.array(rcsr),
        "cn": pa.array(rcn),
        "sig": pa.array(rep, pa.uint64()),
        "idx": pa.array(np.repeat(ids.astype(np.int64), _SIG_BANDS))})


def _perc_pay_rows(b: pa.Table, ids: np.ndarray) -> pa.Table:
    """idx-keyed payload side-table rows for candidate verification."""
    return pa.table({
        "idx": pa.array(ids.astype(np.int64)),
        "bytes": b["bytes"], "sr_hz": b["sr_hz"].cast(pa.int64()),
        "codec": b["codec"]})


def _perc_stage_prior(uri: str, band_uri: str, pay_uri: str) -> None:
    """One-time staging of the prior corpus's perceptual state: a
    bk-sorted band index and an idx-sorted payload table, committed as
    lancelite VERSION 1. Idempotent (guarded on manifest existence).
    A later crawl's accepted clips land as APPENDED versions
    (audio_index_evolution), so version 1 is by construction always
    exactly the prior corpus — consumers that must not see evolved
    state pin ``version=1``."""
    import ray.data as rd

    from ..sources import lancelite

    cols = ["clip_id", "bytes", "sr_hz", "codec"]
    if not os.path.exists(os.path.join(band_uri, "_versions")):
        bands = (rd.read_parquet(uri, columns=cols)
                 .map_batches(
                     lambda b: _perc_band_rows(b, _clip_indices(b)),
                     batch_format="pyarrow", batch_size=None)
                 .sort("bk"))
        lancelite.write_dataset(bands, band_uri, key_stats="bk")
    if not os.path.exists(os.path.join(pay_uri, "_versions")):
        pays = (rd.read_parquet(uri, columns=cols)
                .map_batches(
                    lambda b: _perc_pay_rows(b, _clip_indices(b)),
                    batch_format="pyarrow", batch_size=None)
                .sort("idx"))
        lancelite.write_dataset(pays, pay_uri, key_stats="idx")


def _perc_inc1_stream(b: pa.Table) -> pa.Table:
    """Crawl-1 increment derivation (see the _INC_PERC_* constants): for
    prior clip i, i%11==2 -> same recording re-encoded under the other
    codec; i%11==8 -> decimated to sr/2 then re-encoded; i%11==5 ->
    NEGATED signal re-encoded (novel recording decoy)."""
    idx = _clip_indices(b)
    payloads = b["bytes"].combine_chunks()
    srs = b["sr_hz"].to_numpy(zero_copy_only=False).astype(np.int64)
    cods = b["codec"].to_pylist()
    ids: list[int] = []
    outs: list[bytes] = []
    osr: list[int] = []
    ocod: list[str] = []
    for r in range(b.num_rows):
        i, m = int(idx[r]), int(idx[r]) % _INC_PERC_MOD
        if m not in (_INC_PERC_CODEC, _INC_PERC_SR, _INC_PERC_NEG):
            continue
        x = np.asarray(codecs.decode(payloads[r].as_buffer(), cods[r]),
                       dtype=np.float64)
        sr = int(srs[r])
        if m == _INC_PERC_SR:
            x = _decimate(x, 2)
            sr //= 2
        elif m == _INC_PERC_NEG:
            x = -x
        other = "alaw" if cods[r] != "alaw" else "ulaw"
        ids.append(_INC_PERC_BASE + i)
        outs.append(codecs.encode(x, other))
        osr.append(sr)
        ocod.append(other)
    return pa.table({"idx": pa.array(ids, pa.int64()),
                     "bytes": pa.array(outs, pa.binary()),
                     "sr_hz": pa.array(osr, pa.int64()),
                     "codec": pa.array(ocod, pa.string())})


def _perc_stage_inc1(uri: str, new_uri: str) -> None:
    """One-time staging of the crawl-1 increment table (idx-sorted, with
    fragment key stats) — shared by audio_perceptual_incremental and
    audio_index_evolution."""
    import ray.data as rd

    from ..sources import lancelite

    if not os.path.exists(os.path.join(new_uri, "_versions")):
        news = (rd.read_parquet(uri, columns=["clip_id", "bytes", "sr_hz",
                                              "codec"])
                .map_batches(_perc_inc1_stream, batch_format="pyarrow",
                             batch_size=None)
                .sort("idx"))
        lancelite.write_dataset(news, new_uri, key_stats="idx")


def _perc_probe_flags(new_uri: str, band_idx, pay_idx, n_total: int):
    """The increment-side probe pipeline shared by
    audio_perceptual_incremental and audio_index_evolution: decode+sign
    ONLY the new table's clips (O(new)), range-probe the persisted band
    index with fragment pruning, dedup candidate pairs through one slim
    exchange, exact-SNR-verify candidates only, and keep each new clip's
    minimum partner. Returns a Dataset of (new_id int64, pid int64)."""
    from ray.data.aggregate import Min

    from ..sources import lancelite
    from ..sources.keyed import KeyedFragmentIndex
    from ..stages.decide import scaled_buckets
    from ..stages.dedup_family import hamming64_batch
    from ..stages.exchange import bucket_exchange_dataset

    new_idx = KeyedFragmentIndex(new_uri, "idx")

    def new_band_rows(b: pa.Table) -> pa.Table:
        return _perc_band_rows(b, b["idx"].to_numpy(zero_copy_only=False))

    cands = (lancelite.read(new_uri,
                            columns=["idx", "bytes", "sr_hz", "codec"])
             .map_batches(new_band_rows, batch_format="pyarrow",
                          batch_size=None)
             .sort("bk")
             .map_batches(_PercIncBandProbe, batch_format="pyarrow",
                          batch_size=4096,
                          fn_constructor_args=(band_idx, hamming64_batch,
                                               _SIG_MAXHAM),
                          concurrency=(1, 4), num_cpus=1))

    # the same (nid, pid) pair surfaces from up to _SIG_BANDS band
    # matches landing in different bk-sorted batches — dedup once through
    # one slim exchange so each pair is SNR-verified exactly once
    nb = scaled_buckets(n_total, rows_per_bucket=500_000, lo=4)

    def pair_bucket(b: pa.Table) -> pa.Table:
        nid = b["nid"].to_numpy(zero_copy_only=False)
        pid = b["pid"].to_numpy(zero_copy_only=False)
        return pa.table({"bucket": pa.array((nid * 31 + pid) % nb,
                                            pa.int64()),
                         "nid": b["nid"], "pid": b["pid"]})

    def distinct_pairs(t: pa.Table) -> pa.Table:
        p = np.stack([t["nid"].to_numpy(zero_copy_only=False),
                      t["pid"].to_numpy(zero_copy_only=False)], axis=1)
        if len(p):
            p = np.unique(p, axis=0)
        return pa.table({"nid": pa.array(p[:, 0], pa.int64()),
                         "pid": pa.array(p[:, 1], pa.int64())})

    cands_empty = pa.table({"nid": pa.array([], pa.int64()),
                            "pid": pa.array([], pa.int64())})
    cands = bucket_exchange_dataset(
        cands.map_batches(pair_bucket, batch_format="pyarrow"),
        nb, distinct_pairs, cands_empty)

    return (cands.sort("pid")
            .map_batches(_PercIncVerify, batch_format="pyarrow",
                         batch_size=4096,
                         fn_constructor_args=(pay_idx, new_idx,
                                              PERC_SNR_DB),
                         concurrency=(1, 4), num_cpus=1)
            .groupby("new_id").aggregate(Min("pid", alias_name="pid")))


def audio_perceptual_incremental(sf_dir: str):
    """Cross-crawl incremental PERCEPTUAL audio dedup — completes the
    incremental family matrix (exact text: dedup_incremental, near text:
    dedup_incremental_near, exact audio: audio_dedup_incremental): flag
    new clips that are the same RECORDING as a prior-corpus clip
    re-encoded under another codec, or decimated to half rate and THEN
    re-encoded, WITHOUT re-signing or rescanning the prior corpus (the
    reference rescans the union per crawl, deduplication.py:88-102).

    Persisted prior state (built once, content-keyed /tmp cache — the
    state a real prior crawl leaves behind): (a) a bk-sorted band table of
    the 4x16-bit sign-signature chunks of every prior clip's canonical
    rendering (4 slim rows per clip), and (b) an idx-sorted payload table
    for candidate verification (O(corpus) disk — the
    dedup_incremental_near text-table precedent; one-time staging
    exchange). Per increment: decode+sign ONLY new clips (O(new)),
    range-probe the band index with fragment pruning, dedup candidate
    pairs through one slim exchange, exact-SNR-verify only candidates
    (payloads fetched by fragment range on both sides). Returns
    (new_id, dup_of) flags — O(dup rate) rows on the driver.

    The new stream derives deterministically from the fixture so the
    oracle is pure integer arithmetic (see the _INC_PERC_* constants):
    prior signals are pairwise independent (the perceptual PLANTS of
    audio_perceptual_dedup are a query-time projection, not stored
    bytes), so each flagged new clip has exactly one true partner — a
    missed transcode, a missed resampled copy, a false flag on the
    negated decoy, or a wrong partner all break the driver hash."""
    from ..sources.keyed import KeyedFragmentIndex

    uri = ensure_clips(sf_dir, with_audio=True)
    tag = _clips_tag(uri)
    band_uri = f"/tmp/ccc_prior_perc_band_{tag}"
    pay_uri = f"/tmp/ccc_prior_perc_pay_{tag}"
    new_uri = f"/tmp/ccc_inc_perc_new_{tag}"

    _perc_stage_prior(uri, band_uri, pay_uri)
    _perc_stage_inc1(uri, new_uri)

    # version=1 pins the PRIOR corpus state: audio_index_evolution appends
    # a later crawl's accepted clips to these same tables as version 2+,
    # and this query's semantics ("new vs prior corpus") must not change
    # under that evolution regardless of execution order.
    flags = _perc_probe_flags(
        new_uri, KeyedFragmentIndex(band_uri, "bk", version=1),
        KeyedFragmentIndex(pay_uri, "idx", version=1),
        clips_count(sf_dir))

    def to_dup_of(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids = pc.utf8_lpad(pc.cast(b["pid"], pa.string()), 12, "0")
        return pa.table({
            "new_id": b["new_id"].cast(pa.int64()),
            "dup_of": pc.binary_join_element_wise(
                pa.array(["clip-"] * b.num_rows), ids, "")})

    return flags.map_batches(to_dup_of, batch_format="pyarrow")


def audio_perceptual_incremental_sql() -> str:
    """The exact flag set under the derivation's integer arithmetic:
    every prior clip i with i%{_INC_PERC_MOD} in
    ({_INC_PERC_CODEC}, {_INC_PERC_SR}) spawns a new clip that must be
    flagged against exactly clip i; the negated decoys
    (i%{_INC_PERC_MOD}=={_INC_PERC_NEG}) must NOT appear."""
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    return f"""
WITH ix AS (SELECT CAST(regexp_extract(clip_id, '([0-9]+)$', 1) AS BIGINT)
                   AS i
            FROM read_parquet('{uri}/*.parquet'))
SELECT {_INC_PERC_BASE} + i AS new_id,
       'clip-' || lpad(CAST(i AS VARCHAR), 12, '0') AS dup_of
FROM ix WHERE i % {_INC_PERC_MOD} IN ({_INC_PERC_CODEC}, {_INC_PERC_SR})"""


# --- audio_index_evolution ------------------------------------------------------

_EVO_PRIOR = 3           # crawl-2 derivation from prior clip i: i%11==3 ->
                         #   prior clip i re-encoded under the other codec
                         #   (dup of the PRIOR corpus — proves crawl 2 still
                         #   sees version-1 state through the union)
_EVO_DECOY = 9           # i%11==9 -> NEGATED prior clip i re-encoded (its
                         #   negation was never accepted into the index, so
                         #   this is a novel recording — must NOT flag)
_EVO_BASE = 4_000_000_000


def audio_index_evolution(sf_dir: str):
    """TRUE multi-crawl state evolution of the perceptual dedup index —
    the lifecycle a production corpus build runs every crawl, which the
    reference cannot express at all (it re-reads and re-hashes the whole
    accumulated corpus per crawl, deduplication.py:88-102):

      crawl 1: dedup the increment against the persisted prior index
               (O(increment) probes, prior corpus never rescanned), then
               APPEND the accepted (novel) clips' band rows + payloads to
               the SAME persisted tables as new lancelite versions — an
               LSM-style sorted run; per-fragment [min,max] key stats keep
               KeyedFragmentIndex range pruning exact across overlapping
               runs, no compaction required for correctness;
      crawl 2: probe the EVOLVED index (latest version = prior ∪ crawl-1
               accepted) — flags must find partners in BOTH the prior
               corpus AND crawl-1's accepted clips.

    Version pinning is the correctness spine: crawl-1's probe pins
    ``version=1`` (prior state), crawl-2 reads latest. The append is
    idempotent (guarded per table on ``latest_version < 2``; a lancelite
    commit is an atomic manifest rename, so a crash between the two
    appends re-runs only the missing one).

    Crawl-2 stream (deterministic derivation; oracle is pure integer
    arithmetic): for prior clip i, i%11==_EVO_PRIOR(3) -> transcode of
    prior clip i (dup_of_id = i, found in version-1 state);
    i%11==_INC_PERC_NEG(5) -> transcode of crawl-1's ACCEPTED negated
    recording (dup_of_id = _INC_PERC_BASE+i, found ONLY in the appended
    version-2 run); i%11==_EVO_DECOY(9) -> negated prior clip i (novel —
    anti-correlated with everything persisted, must not flag). A flag
    missed on either side of the union, a false flag on the decoy, or a
    wrong partner all break the driver hash.

    Scale shape: every step is O(increment) — the novelty anti-join
    routes through the flags side table by key (KeyedBatchJoiner.probe,
    the phase-D pattern), the append signs only accepted clips, and the
    crawl-2 probe is the shared ``_perc_probe_flags`` machinery. Driver
    holds O(dup rate) rows only."""
    import ray.data as rd

    from ..sources import lancelite
    from ..sources.keyed import KeyedBatchJoiner, KeyedFragmentIndex

    uri = ensure_clips(sf_dir, with_audio=True)
    tag = _clips_tag(uri)
    band_uri = f"/tmp/ccc_prior_perc_band_{tag}"
    pay_uri = f"/tmp/ccc_prior_perc_pay_{tag}"
    new_uri = f"/tmp/ccc_inc_perc_new_{tag}"
    acc_uri = f"/tmp/ccc_evo_acc_{tag}"
    new2_uri = f"/tmp/ccc_evo_new2_{tag}"
    cols = ["clip_id", "bytes", "sr_hz", "codec"]
    n_total = clips_count(sf_dir)

    _perc_stage_prior(uri, band_uri, pay_uri)
    _perc_stage_inc1(uri, new_uri)

    # -- crawl 1: accept the increment's novel clips ------------------------
    if not os.path.exists(os.path.join(acc_uri, "_versions")):
        flags1 = _perc_probe_flags(
            new_uri, KeyedFragmentIndex(band_uri, "bk", version=1),
            KeyedFragmentIndex(pay_uri, "idx", version=1), n_total)
        flags_uri = f"/tmp/ccc_evo_flags_{tag}"
        lancelite.write_dataset(flags1.sort("new_id"), flags_uri,
                                key_stats="new_id")
        fidx = KeyedFragmentIndex(flags_uri, "new_id")

        class _DropFlagged:
            """Keyed anti-join: drop new clips flagged as dups (batches
            arrive idx-sorted from the staged table, so flag-fragment
            range pruning holds)."""

            def __init__(self, index):
                self.j = KeyedBatchJoiner(index, columns=["new_id"])

            def __call__(self, b: pa.Table) -> pa.Table:
                _, found, _ = self.j.probe(
                    b["idx"].to_numpy(zero_copy_only=False))
                return b.filter(pa.array(~found))

        acc = (lancelite.read(new_uri, columns=["idx", "bytes", "sr_hz",
                                                "codec"])
               .map_batches(_DropFlagged, batch_format="pyarrow",
                            batch_size=4096, fn_constructor_args=(fidx,),
                            concurrency=(1, 4), num_cpus=1))
        lancelite.write_dataset(acc.sort("idx"), acc_uri, key_stats="idx")

    # -- evolve: append crawl-1's accepted clips to the persisted index ----
    if lancelite.latest_version(band_uri) < 2:
        bands2 = (lancelite.read(acc_uri, columns=cols[1:] + ["idx"])
                  .map_batches(
                      lambda b: _perc_band_rows(
                          b, b["idx"].to_numpy(zero_copy_only=False)),
                      batch_format="pyarrow", batch_size=None)
                  .sort("bk"))
        lancelite.write_dataset(bands2, band_uri, mode="append",
                                key_stats="bk")
    if lancelite.latest_version(pay_uri) < 2:
        # the accepted table's schema IS the payload side-table schema
        lancelite.write_dataset(lancelite.read(acc_uri), pay_uri,
                                mode="append", key_stats="idx")

    # -- crawl 2: derive, stage, and probe the EVOLVED index ----------------
    def new2_stream(b: pa.Table) -> pa.Table:
        idx = _clip_indices(b)
        payloads = b["bytes"].combine_chunks()
        srs = b["sr_hz"].to_numpy(zero_copy_only=False).astype(np.int64)
        cods = b["codec"].to_pylist()
        ids: list[int] = []
        outs: list[bytes] = []
        osr: list[int] = []
        ocod: list[str] = []
        for r in range(b.num_rows):
            i, m = int(idx[r]), int(idx[r]) % _INC_PERC_MOD
            if m not in (_EVO_PRIOR, _INC_PERC_NEG, _EVO_DECOY):
                continue
            x = np.asarray(codecs.decode(payloads[r].as_buffer(), cods[r]),
                           dtype=np.float64)
            other = "alaw" if cods[r] != "alaw" else "ulaw"
            if m == _EVO_PRIOR:
                y, cod2 = x, other           # transcode of prior clip i
            elif m == _INC_PERC_NEG:
                y, cod2 = -x, cods[r]        # transcode of crawl-1's
                                             # accepted negation (crawl 1
                                             # encoded it under `other`)
            else:
                y, cod2 = -x, other          # novel negated decoy
            ids.append(_EVO_BASE + i)
            outs.append(codecs.encode(y, cod2))
            osr.append(int(srs[r]))
            ocod.append(cod2)
        return pa.table({"idx": pa.array(ids, pa.int64()),
                         "bytes": pa.array(outs, pa.binary()),
                         "sr_hz": pa.array(osr, pa.int64()),
                         "codec": pa.array(ocod, pa.string())})

    if not os.path.exists(os.path.join(new2_uri, "_versions")):
        news2 = (rd.read_parquet(uri, columns=cols)
                 .map_batches(new2_stream, batch_format="pyarrow",
                              batch_size=None)
                 .sort("idx"))
        lancelite.write_dataset(news2, new2_uri, key_stats="idx")

    flags2 = _perc_probe_flags(
        new2_uri, KeyedFragmentIndex(band_uri, "bk"),
        KeyedFragmentIndex(pay_uri, "idx"), n_total)

    def to_ids(b: pa.Table) -> pa.Table:
        return pa.table({"new_id": b["new_id"].cast(pa.int64()),
                         "dup_of_id": b["pid"].cast(pa.int64())})

    return flags2.map_batches(to_ids, batch_format="pyarrow")


def audio_index_evolution_sql() -> str:
    """The exact crawl-2 flag set under the derivation's integer
    arithmetic: transcodes of prior clips (i%11==3) flag against the
    prior corpus id i; transcodes of crawl-1's accepted negations
    (i%11==5) flag against the APPENDED id 2e9+i; the negated decoys
    (i%11==9) must not appear."""
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    return f"""
WITH ix AS (SELECT CAST(regexp_extract(clip_id, '([0-9]+)$', 1) AS BIGINT)
                   AS i
            FROM read_parquet('{uri}/*.parquet'))
SELECT {_EVO_BASE} + i AS new_id, i AS dup_of_id
FROM ix WHERE i % {_INC_PERC_MOD} = {_EVO_PRIOR}
UNION ALL
SELECT {_EVO_BASE} + i AS new_id, {_INC_PERC_BASE} + i AS dup_of_id
FROM ix WHERE i % {_INC_PERC_MOD} = {_INC_PERC_NEG}"""


# --- audio_batch_pack ---------------------------------------------------------

BATCH_CLIPS = 32         # clips per training batch
DUR_BUCKET_MS = 250      # stratum granularity for length bucketing


def audio_batch_pack(sf_dir: str):
    """Length-bucketed batch planning for ASR training: padding a batch to
    its longest clip wastes compute, so clips are batched among
    like-duration peers. Strata are (codec, sr_hz, dur_ms // DUR_BUCKET_MS);
    within a stratum clips rank by (dur_ms, clip_id) and cut into
    BATCH_CLIPS-sized batches; the emitted row per batch carries its
    padding cost pad_ms = max_dur*n - sum_dur. Deterministic, no decode,
    no payload read — the plan is metadata-only.

    Scale shape: one exchange keyed by stratum; per-task work is a
    pandas sort of one stratum's (dur, id) pairs. Per-stratum row counts
    are bounded by choosing DUR_BUCKET_MS granularity against the corpus
    duration distribution (finer buckets at bigger corpora — they also
    IMPROVE padding efficiency, so scale and quality pull the same way)."""
    import pandas as pd
    import ray.data as rd

    from ..stages.decide import scaled_buckets
    from ..stages.exchange import bucket_exchange_dataset
    from .clips_queries import clips_count

    uri = ensure_clips(sf_dir, with_audio=True)
    nb = scaled_buckets(clips_count(sf_dir), rows_per_bucket=200_000, lo=4)
    ds = rd.read_parquet(uri, columns=["clip_id", "codec", "sr_hz", "dur_ms"])
    codec_ix = {c: i for i, c in enumerate(sorted(codecs.BYTES_PER_SAMPLE))}

    def keyed(b: pa.Table) -> pa.Table:
        sr = b["sr_hz"].to_numpy(zero_copy_only=False).astype(np.int64)
        dur = b["dur_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        cix = np.array([codec_ix[c] for c in b["codec"].to_pylist()],
                       dtype=np.int64)
        db = dur // DUR_BUCKET_MS
        return pa.table({
            "bucket": pa.array((sr * 31 + db * 7 + cix) % nb, pa.int64()),
            "clip_id": b["clip_id"],
            "codec": b["codec"],
            "sr_hz": pa.array(sr),
            "dur_ms": pa.array(dur),
            "dur_bucket": pa.array(db)})

    def plan(t: pa.Table) -> pa.Table | None:
        df = t.select(["clip_id", "codec", "sr_hz", "dur_ms",
                       "dur_bucket"]).to_pandas()
        if df.empty:
            return None
        df = df.sort_values(["codec", "sr_hz", "dur_bucket",
                             "dur_ms", "clip_id"])
        rk = df.groupby(["codec", "sr_hz", "dur_bucket"],
                        sort=False).cumcount()
        df["batch_idx"] = (rk // BATCH_CLIPS).to_numpy(np.int64)
        g = (df.groupby(["codec", "sr_hz", "dur_bucket", "batch_idx"],
                        sort=False)
             .agg(n_clips=("dur_ms", "size"), max_dur_ms=("dur_ms", "max"),
                  sum_dur_ms=("dur_ms", "sum")).reset_index())
        pad = g["max_dur_ms"] * g["n_clips"] - g["sum_dur_ms"]
        return pa.table({
            "codec": pa.array(g["codec"], pa.string()),
            "sr_hz": pa.array(g["sr_hz"].to_numpy(np.int64)),
            "dur_bucket": pa.array(g["dur_bucket"].to_numpy(np.int64)),
            "batch_idx": pa.array(g["batch_idx"].to_numpy(np.int64)),
            "n_clips": pa.array(g["n_clips"].to_numpy(np.int64)),
            "max_dur_ms": pa.array(g["max_dur_ms"].to_numpy(np.int64)),
            "sum_dur_ms": pa.array(g["sum_dur_ms"].to_numpy(np.int64)),
            "pad_ms": pa.array(pad.to_numpy(np.int64))})

    empty = pa.table({"codec": pa.array([], pa.string()),
                      "sr_hz": pa.array([], pa.int64()),
                      "dur_bucket": pa.array([], pa.int64()),
                      "batch_idx": pa.array([], pa.int64()),
                      "n_clips": pa.array([], pa.int64()),
                      "max_dur_ms": pa.array([], pa.int64()),
                      "sum_dur_ms": pa.array([], pa.int64()),
                      "pad_ms": pa.array([], pa.int64())})
    return bucket_exchange_dataset(
        ds.map_batches(keyed, batch_format="pyarrow"), nb, plan, empty)


def audio_batch_pack_sql() -> str:
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    return f"""
WITH c AS (
  SELECT clip_id, codec, CAST(sr_hz AS BIGINT) AS sr_hz,
         CAST(dur_ms AS BIGINT) AS dur_ms,
         CAST(dur_ms AS BIGINT) // {DUR_BUCKET_MS} AS dur_bucket
  FROM read_parquet('{uri}/*.parquet')
), r AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY codec, sr_hz, dur_bucket
      ORDER BY dur_ms, clip_id) - 1 AS BIGINT) AS rk
  FROM c
)
SELECT codec, sr_hz, dur_bucket, rk // {BATCH_CLIPS} AS batch_idx,
       CAST(count(*) AS BIGINT) AS n_clips,
       max(dur_ms) AS max_dur_ms,
       CAST(sum(dur_ms) AS BIGINT) AS sum_dur_ms,
       max(dur_ms) * CAST(count(*) AS BIGINT)
         - CAST(sum(dur_ms) AS BIGINT) AS pad_ms
FROM r GROUP BY codec, sr_hz, dur_bucket, rk // {BATCH_CLIPS}"""


# --- audio_dedup -------------------------------------------------------------

def audio_dedup(sf_dir: str):
    """Exact payload dedup, keep-first by clip_id — the audio analog of
    the reference's hash-column dedup (deduplication.py:88-102). Fixture
    payloads are all distinct (pure function of the clip index), so the
    query plants true duplicates the same way codec_validity plants
    corruption: every clip with i % 7 == 3 is projected to carry clip
    (i-3)'s payload — a projection SQL states with a self-join, keeping
    the oracle exact.

    The Ray side resolves the planted projection with SLIM digest
    exchanges instead of regenerating donor audio (the first version
    re-synthesised the donor payload per dup row — 14k full clip
    generations at sf0.1, ~5s of pure redundant DSP). Two stages, both
    over (idx, digest)-sized rows; payload bytes never shuffle:
      1. digest resolution, keyed by donor idx — every clip hashes only
         its OWN payload once; dup rows ship a (donor_idx, idx) request
         into the donor's bucket and pick the digest up there, with a
         per-bucket partial min per digest;
      2. keep-first, keyed by digest hash — globally exact for ANY
         payload distribution (stage 1's bucket key is the donor id, so
         payloads that happened to collide across donors would otherwise
         resolve min per bucket only)."""
    import pandas as pd
    import ray.data as rd

    from ..functions.hashing import md5_i64_array
    from ..stages.decide import scaled_buckets
    from ..stages.exchange import bucket_exchange_dataset
    from .clips_queries import clips_count

    uri = ensure_clips(sf_dir, with_audio=True)
    nb = scaled_buckets(clips_count(sf_dir), rows_per_bucket=100_000, lo=4)
    ds = rd.read_parquet(uri, columns=["clip_id", "bytes"])

    def keys(b: pa.Table) -> pa.Table:
        idx = _clip_indices(b)
        payloads = b["bytes"].combine_chunks()
        is_dup = idx % DUP_STRIDE == 3
        donor = np.where(is_dup, idx - 3, idx)
        # dup rows' own payload is discarded by the planting projection —
        # don't hash it
        md5_col = pa.array(
            [None if is_dup[r] else
             _md5_hex_upper(memoryview(payloads[r].as_buffer()))
             for r in range(b.num_rows)], pa.string())
        return pa.table({
            "bucket": pa.array(donor % nb, pa.int64()),
            "idx": pa.array(idx, pa.int64()),
            "donor": pa.array(donor, pa.int64()),
            "md5": md5_col,
        })

    def resolve(t: pa.Table) -> pa.Table:
        df = t.select(["idx", "donor", "md5"]).to_pandas()
        own = df[df["md5"].notna()]
        req = df[df["md5"].isna()].copy()
        req["md5"] = req["donor"].map(
            dict(zip(own["idx"], own["md5"])))
        g = (pd.concat([own[["md5", "idx"]], req[["md5", "idx"]]])
             .groupby("md5", sort=False)["idx"].min().reset_index())
        return pa.table({
            "bucket": pa.array(
                md5_i64_array(pa.array(g["md5"], pa.string())).to_numpy()
                % nb, pa.int64()),
            "md5": pa.array(g["md5"], pa.string()),
            "idx": pa.array(g["idx"].to_numpy(np.int64))})

    def keep_first(t: pa.Table) -> pa.Table:
        g = (t.select(["md5", "idx"]).to_pandas()
             .groupby("md5", sort=False)["idx"].min())
        ids = [f"clip-{int(i):012d}" for i in g.to_numpy()]
        return pa.table({"payload_md5": pa.array(g.index, pa.string()),
                         "clip_id": pa.array(ids, pa.string())})

    mid = pa.table({"bucket": pa.array([], pa.int64()),
                    "md5": pa.array([], pa.string()),
                    "idx": pa.array([], pa.int64())})
    empty = pa.table({"payload_md5": pa.array([], pa.string()),
                      "clip_id": pa.array([], pa.string())})
    resolved = bucket_exchange_dataset(
        ds.map_batches(keys, batch_format="pyarrow", batch_size=None),
        nb, resolve, mid)
    return bucket_exchange_dataset(resolved, nb, keep_first, empty)


def audio_dedup_sql() -> str:
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    return f"""
WITH src AS (
  SELECT clip_id, bytes,
         CAST(regexp_extract(clip_id, '([0-9]+)$', 1) AS BIGINT) AS i
  FROM read_parquet('{uri}/*.parquet')
), planted AS (
  SELECT a.clip_id,
         md5(hex(CASE WHEN a.i % {DUP_STRIDE} = 3 THEN d.bytes
                      ELSE a.bytes END)) AS payload_md5
  FROM src a
  LEFT JOIN src d ON a.i % {DUP_STRIDE} = 3 AND d.i = a.i - 3
)
SELECT payload_md5, min(clip_id) AS clip_id
FROM planted GROUP BY payload_md5"""


# --- audio_storage_plan --------------------------------------------------------


def audio_storage_plan(sf_dir: str):
    """Per-(codec, sample-rate) storage/capacity rollup: clip count, total
    encoded bytes, total samples, total clip milliseconds, and the
    projected byte size after a pcm_s16le transcode (2 bytes/sample) —
    the planning numbers a corpus build reads before deciding what a
    format migration or an export shard layout costs. All exact integer
    arithmetic (octet length // bytes-per-sample), so the SQL oracle is
    bit-identical.

    Scale shape: fused read + per-block combiner (one row per (codec, sr)
    per block), driver fold over the BOUNDED codec x rate grid. Payload
    bytes are read once for their length and never shuffled."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    uri = ensure_clips(sf_dir, with_audio=True)
    ds = rd.read_parquet(uri, columns=["bytes", "sr_hz", "dur_ms", "codec"])
    bps_map = dict(codecs.BYTES_PER_SAMPLE)

    def partial(b: pa.Table) -> pa.Table:
        nbytes = pc.cast(pc.binary_length(b["bytes"]), pa.int64()).to_numpy(
            zero_copy_only=False)
        cods = b["codec"].to_pylist()
        bps = np.fromiter((bps_map[c] for c in cods), np.int64,
                          count=len(cods))
        t = pa.table({
            "codec": b["codec"],
            "sr_hz": pc.cast(b["sr_hz"], pa.int64()),
            "n_clips": pa.array(np.ones(b.num_rows, np.int64)),
            "total_bytes": pa.array(nbytes),
            "total_samples": pa.array(nbytes // bps),
            "total_ms": pc.cast(b["dur_ms"], pa.int64())})
        cols = ["n_clips", "total_bytes", "total_samples", "total_ms"]
        g = t.group_by(["codec", "sr_hz"]).aggregate(
            [(c, "sum") for c in cols])
        return g.rename_columns(["codec", "sr_hz"] + cols)

    cells = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
             .to_pandas().groupby(["codec", "sr_hz"], as_index=False).sum())
    samples = cells["total_samples"].to_numpy(np.int64)
    return pa.table({
        "codec": pa.array(cells["codec"], pa.string()),
        "sr_hz": pa.array(cells["sr_hz"].to_numpy(np.int64)),
        **{c: pa.array(cells[c].to_numpy(np.int64))
           for c in ["n_clips", "total_bytes", "total_samples", "total_ms"]},
        "pcm16_bytes": pa.array(samples * 2)})


def audio_storage_plan_sql() -> str:
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    per_sample = " ".join(
        f"WHEN '{c}' THEN {n}" for c, n in codecs.BYTES_PER_SAMPLE.items())
    return f"""
SELECT codec, CAST(sr_hz AS BIGINT) AS sr_hz,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(sum(octet_length(bytes)) AS BIGINT) AS total_bytes,
       CAST(sum(octet_length(bytes)
                // (CASE codec {per_sample} END)) AS BIGINT)
           AS total_samples,
       CAST(sum(dur_ms) AS BIGINT) AS total_ms,
       CAST(sum(octet_length(bytes)
                // (CASE codec {per_sample} END)) * 2 AS BIGINT)
           AS pcm16_bytes
FROM read_parquet('{uri}/*.parquet')
GROUP BY codec, sr_hz"""


# --- audio_clipping_detect -------------------------------------------------------

CLIP_THRESH = 0.999      # |sample| at/above this counts as saturated; the
                         # fixture signal peaks below 0.58 (0.35+0.2 sines
                         # + 0.004*randn), so only PLANTED full-scale
                         # samples can cross it — a >70-sigma noise event
                         # would be needed otherwise
CLIP_PLANT_MOD = 50      # clip i gets its first (i % 50) ms overwritten
CLIP_PCT = 1             # flag a clip when saturated% >= 1


def _clipping_batch(b: pa.Table) -> pa.Table:
    idx = _clip_indices(b)
    srs = b["sr_hz"].to_numpy(zero_copy_only=False).astype(np.int64)
    cods = b["codec"].to_pylist()
    payloads = b["bytes"].combine_chunks()
    n_out = np.empty(b.num_rows, np.int64)
    c_out = np.empty(b.num_rows, np.int64)
    for r in range(b.num_rows):
        x = np.array(codecs.decode(payloads[r].as_buffer(), cods[r]),
                     dtype=np.float64)
        k = (int(idx[r]) % CLIP_PLANT_MOD) * int(srs[r]) // 1000
        x[:k] = 1.0                       # planted saturation run
        n_out[r] = len(x)
        c_out[r] = int(np.count_nonzero(np.abs(x) >= CLIP_THRESH))
    flag = c_out * 100 >= CLIP_PCT * n_out
    return pa.table({
        "clip_id": b["clip_id"],
        "n_samples": pa.array(n_out),
        "n_clipped": pa.array(c_out),
        "clipped": pa.array(flag),
    })


def audio_clipping_detect(sf_dir: str):
    """Clipping / saturation QA filter: decode each clip and count samples
    at or above full scale (|x| >= CLIP_THRESH), flagging clips whose
    saturated fraction reaches CLIP_PCT% — the standard audio-ingest
    health gate (a clipped mic or a hot transcode) the reference's
    text-only rules have no analog for. The fixture's clips never clip
    (signal peak < 0.58), so the query PLANTS saturation
    deterministically (silence_trim precedent): clip i gets its first
    i % 50 milliseconds of samples overwritten with +1.0 after decode,
    making the counts pure integer arithmetic an oracle states verbatim,
    while the operator runs the real threshold scan over decoded PCM.
    The flag compare is cross-multiplied (n_clipped*100 >= n_samples),
    never a float ratio.

    Scale shape: fused read + per-clip numpy scan, slim (id + 2 ints +
    bool) output; payload bytes never shuffle."""
    import ray.data as rd
    uri = ensure_clips(sf_dir, with_audio=True)
    ds = rd.read_parquet(uri, columns=["clip_id", "bytes", "sr_hz", "codec"])
    return ds.map_batches(_clipping_batch, batch_format="pyarrow",
                          batch_size=None)


def audio_clipping_detect_sql() -> str:
    uri = ensure_clips(ORACLE_SF, with_audio=True)
    per_sample = " ".join(
        f"WHEN '{c}' THEN {n}" for c, n in codecs.BYTES_PER_SAMPLE.items())
    return f"""
WITH c AS (
  SELECT clip_id,
         CAST(regexp_extract(clip_id, '([0-9]+)$', 1) AS BIGINT) AS i,
         CAST(sr_hz AS BIGINT) AS sr,
         octet_length(bytes) // (CASE codec {per_sample} END) AS n
  FROM read_parquet('{uri}/*.parquet')
)
SELECT clip_id, n AS n_samples,
       (i % {CLIP_PLANT_MOD}) * sr // 1000 AS n_clipped,
       ((i % {CLIP_PLANT_MOD}) * sr // 1000) * 100 >= {CLIP_PCT} * n
           AS clipped
FROM c"""

"""Audio-op properties the SQL oracles can't state: resampled sample-value
fidelity, chunk tiling of the payload, and the trim scan actually scanning
(not just mirroring the plant arithmetic). These call the module-level
batch bodies directly — the exact code the Ray stages map."""

import hashlib

import numpy as np
import pyarrow as pa

from common_crawl_corpus_ray.audio import codecs
from common_crawl_corpus_ray.pipelines import audio_ops as AO
from common_crawl_corpus_ray.synth import clips

GOLDEN_RESAMPLE_MD5 = "79bda6ebf0ff3763866b2c7b4716bbbb"


def test_resampler_sine_fidelity():
    """Linear-interp resample of a band-limited tone must reconstruct the
    analytic signal at the target rate: SNR >= 25 dB for tones well below
    Nyquist at every fixture source rate."""
    rs = AO.Resampler()
    for sr in (8000, 22050, 44100):
        n = sr  # 1 second
        t = np.arange(n) / sr
        x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        y = rs.resample(x, sr)
        n_out = n * AO.RESAMPLE_SR // sr
        assert len(y) == n_out
        t_out = np.arange(n_out) / AO.RESAMPLE_SR
        ref = 0.5 * np.sin(2 * np.pi * 440.0 * t_out)
        assert codecs.snr_db(ref, y) >= 25.0, sr


def test_resampler_identity_at_target_rate():
    rs = AO.Resampler()
    x = clips.ground_truth_pcm(7, 16000, 16000)
    y = rs.resample(x, 16000)
    assert np.allclose(y, x.astype(np.float64), atol=1e-7)


def test_resampler_golden_digest():
    """Pin the exact resampled bytes for a fixed clip so any change to the
    interpolation (grid definition, dtype, encoder) is loud."""
    rs = AO.Resampler()
    x = clips.ground_truth_pcm(42, 8820, 22050)
    out = codecs.encode_pcm_s16le(rs.resample(x, 22050))
    assert len(out) // 2 == 8820 * AO.RESAMPLE_SR // 22050
    assert hashlib.md5(out).hexdigest() == GOLDEN_RESAMPLE_MD5


def _clip_batch(indices) -> pa.Table:
    rows = [clips._audio_fields(i, 3000) for i in indices]
    return pa.table({
        "clip_id": pa.array([clips.clip_id_of(i) for i in indices]),
        "bytes": pa.array([r[0] for r in rows], pa.binary()),
        "sr_hz": pa.array([r[1] for r in rows], pa.int32()),
        "codec": pa.array([r[3] for r in rows]),
    })


def test_chunks_tile_payload():
    """Every chunk row's digest must equal the digest of the byte range it
    claims, the ranges must tile the payload completely, and the count
    must be ceil(n/hop) — checked against the real batch body."""
    b = _clip_batch([0, 5, 1234])
    rows = AO._chunk_batch(b)
    by_clip: dict[str, list[int]] = {}
    for r in range(rows.num_rows):
        by_clip.setdefault(rows["clip_id"][r].as_py(), []).append(r)
    for c in range(b.num_rows):
        payload = b["bytes"][c].as_py()
        sr = b["sr_hz"][c].as_py()
        bps = codecs.BYTES_PER_SAMPLE[b["codec"][c].as_py()]
        n = len(payload) // bps
        win, hop = sr * AO.CHUNK_MS // 1000, sr * AO.HOP_MS // 1000
        idxs = by_clip[b["clip_id"][c].as_py()]
        assert len(idxs) == (n + hop - 1) // hop
        covered = np.zeros(n, dtype=bool)
        for k, r in enumerate(idxs):
            s = rows["start_sample"][r].as_py()
            ln = rows["n_samp"][r].as_py()
            assert rows["chunk_idx"][r].as_py() == k
            assert s == k * hop and ln == min(win, n - s)
            covered[s:s + ln] = True
            sl = payload[s * bps:(s + ln) * bps]
            want = hashlib.md5(sl.hex().upper().encode()).hexdigest()
            assert rows["chunk_md5"][r].as_py() == want
        assert covered.all()


def test_trim_scan_is_real():
    """The scan must find silence wherever it is, not assume the planted
    arithmetic: zero arbitrary prefixes/suffixes of a decoded clip and
    check the scan lands exactly on the loud boundary, including a
    beyond-plant (7, 5) case and an all-silent signal."""
    x = clips.ground_truth_pcm(3, 16000, 16000).astype(np.float64)
    fl = 16000 // 50
    nf = len(x) // fl
    for lead, tail in [(0, 0), (1, 0), (0, 2), (7, 5)]:
        y = x.copy()
        y[:lead * fl] = 0.0
        if tail:
            y[(nf - tail) * fl:nf * fl] = 0.0
        got = AO.trim_scan(y, fl)
        assert got == (nf, lead, tail)
    assert AO.trim_scan(np.zeros_like(x), fl) == (nf, nf, 0)


def test_trim_threshold_margin():
    """Every un-planted frame of a sample of fixture clips sits well above
    the threshold (>= 5x), planted silence is exactly 0 — the split the
    oracle's integer arithmetic relies on."""
    for i in (11, 200, 3001):
        b, sr, dur, codec = clips._audio_fields(i, 3000)
        x = codecs.decode(b, codec).astype(np.float64)
        fl = sr // 50
        nf = len(x) // fl
        fr = x[:nf * fl].reshape(nf, fl)
        rms = np.sqrt((fr * fr).mean(axis=1))
        assert rms.min() >= 5 * AO.TRIM_THRESH


def test_export_chunks_resume_matches_clean_run(ray_session, tmp_path):
    """Chunk export through the lineage manifest: a crash after 2 of 4
    partitions resumes without recomputing them, and the resumed table
    equals an uninterrupted export (ids, slices, everything)."""
    from common_crawl_corpus_ray.pipelines import clips_queries
    from common_crawl_corpus_ray.pipelines.resumable import InjectedFailure
    from common_crawl_corpus_ray.state import manifest

    clips_uri = clips_queries.ensure_clips("/root/testdata/sf0.001",
                                           with_audio=True)
    ckpt = str(tmp_path / "chunks_ckpt")
    with_crash = str(tmp_path / "chunks_ckpt2")

    vm = AO.export_chunks(clips_uri, ckpt, num_partitions=4)
    assert vm["partitions_run_this_call"] == 4

    try:
        AO.export_chunks(clips_uri, with_crash, num_partitions=4,
                         fail_after=2)
        raise AssertionError("expected InjectedFailure")
    except InjectedFailure:
        pass
    before = manifest.completed(with_crash)
    assert len(before) == 2
    vm2 = AO.export_chunks(clips_uri, with_crash, num_partitions=4)
    assert vm2["partitions_run_this_call"] == 2
    after = manifest.completed(with_crash)
    assert all(e["attempt"] == 1 for e in after.values())

    def frame(uri):
        df = manifest.read(uri).to_pandas()
        df["bytes"] = df["bytes"].map(
            lambda v: hashlib.md5(bytes(v)).hexdigest())
        return (df.sort_values(["clip_id", "chunk_idx"])
                .reset_index(drop=True))

    a, b = frame(ckpt), frame(with_crash)
    assert a.equals(b)
    # chunk rows agree with the digest query's chunk inventory
    import ray.data  # noqa: F401  (session fixture owns the init)
    inv = AO.audio_chunk("/root/testdata/sf0.001").to_pandas()
    assert len(a) == len(inv)


def test_audio_dedup_planted_payloads_byte_identical():
    """The Ray side regenerates the donor payload from the synth seed; the
    SQL side self-joins the parquet. Both are only equal if regeneration
    is byte-identical to what gen_batch wrote — pin that."""
    for i in (3, 10, 24):
        donor, _, _, _ = clips._audio_fields(i - 3, 3000)
        again, _, _, _ = clips._audio_fields(i - 3, 3000)
        assert donor == again


def test_perceptual_screen_margins():
    """The 64-bit sign-signature screen's two assumptions, measured: a
    G.711 re-encoding stays within the Hamming admit threshold (screen
    never prunes a true pair on this fixture family), and independent
    clips of the same shape sit far above it (the screen actually
    prunes). Uses the same signature construction as the operator."""
    import numpy as np

    from common_crawl_corpus_ray.audio import codecs

    def sig(x, bits=64):
        pos = np.linspace(0, len(x) - 1, bits).astype(np.int64)
        b = (np.asarray(x)[pos] >= 0).astype(np.uint64)
        return int((b << np.arange(bits, dtype=np.uint64)).sum())

    worst_true, best_indep = 0, 64
    for i in range(0, 60):
        b, sr, dur, codec = clips._audio_fields(i, 3000)
        x = np.asarray(codecs.decode(b, codec))
        other = "alaw" if codec != "alaw" else "ulaw"
        y = np.asarray(codecs.decode(codecs.encode(x, other), other))
        worst_true = max(worst_true, bin(sig(x) ^ sig(y)).count("1"))
        b2, _, _, c2 = clips._audio_fields(i + 500, 3000)
        z = np.asarray(codecs.decode(b2, c2))
        n = min(len(x), len(z))
        best_indep = min(best_indep,
                         bin(sig(x[:n]) ^ sig(z[:n])).count("1"))
    assert worst_true <= 12, worst_true           # admit threshold
    assert best_indep > 12, best_indep            # prune margin

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
    """The banded sign-signature screen's assumptions, measured in the
    CANONICAL domain the operator signs in, across both plant classes
    (codec swap and decimate-then-re-encode):

      * a true pair's signatures differ by <= 3 bits — the 4x16-bit
        chunk banding then GUARANTEES at least one exact chunk match
        (pigeonhole), so banding never prunes a true pair here;
      * independent clips of the same canonical shape sit above the
        Hamming admit threshold (the screen actually prunes);
      * canonical-domain SNR of every true pair clears PERC_SNR_DB with
        margin (the verify decides correctly)."""
    worst_true, best_indep, snr_min = 0, 64, 1e9
    for d in range(0, 60 * 13, 13):          # donors d%13==0
        b, sr, dur, codec = clips._audio_fields(d, clips.MAX_DUR_MS)
        x = np.asarray(codecs.decode(b, codec), dtype=np.float64)
        other = "alaw" if codec != "alaw" else "ulaw"
        cx, csr = AO._canonical(x, sr)
        sx = int(AO._sign_sig(cx))
        # class 1: same-rate codec swap (clip d+6)
        y6 = np.asarray(codecs.decode(codecs.encode(x, other), other),
                        dtype=np.float64)
        c6, s6r = AO._canonical(y6, sr)
        # class 2: decimate to sr/2, then re-encode (clip d+9)
        y9 = np.asarray(codecs.decode(
            codecs.encode(AO._decimate(x, 2), other), other),
            dtype=np.float64)
        c9, s9r = AO._canonical(y9, sr // 2)
        assert s6r == csr and s9r == csr
        assert len(c6) == len(cx) and len(c9) == len(cx)
        for cy in (c6, c9):
            worst_true = max(worst_true,
                             bin(sx ^ int(AO._sign_sig(cy))).count("1"))
            snr_min = min(snr_min, codecs.snr_db(cx, cy))
        b2, sr2, _, c2 = clips._audio_fields(d + 500, clips.MAX_DUR_MS)
        cz, _ = AO._canonical(
            np.asarray(codecs.decode(b2, c2), dtype=np.float64), sr2)
        n = min(len(cx), len(cz))
        best_indep = min(best_indep,
                         bin(int(AO._sign_sig(cx[:n]))
                             ^ int(AO._sign_sig(cz[:n]))).count("1"))
    assert worst_true <= 3, worst_true      # banding-lossless threshold
    assert best_indep > AO._SIG_MAXHAM, best_indep   # prune margin
    assert snr_min >= AO.PERC_SNR_DB + 5, snr_min    # verify margin


def test_perceptual_plants_canonical_bit_identity():
    """The oracle's star semantics rest on the two plants of one donor
    rendering BIT-IDENTICALLY at the canonical rate (per-sample
    quantization commutes with decimation) — pin that, the way
    test_audio_dedup_planted_payloads_byte_identical pins payload
    regeneration."""
    for d in range(0, 40 * 13, 13):
        b, sr, _, codec = clips._audio_fields(d, clips.MAX_DUR_MS)
        x = np.asarray(codecs.decode(b, codec), dtype=np.float64)
        other = "alaw" if codec != "alaw" else "ulaw"
        p6, _ = AO._canonical(np.asarray(
            codecs.decode(codecs.encode(x, other), other), np.float64), sr)
        p9, _ = AO._canonical(np.asarray(
            codecs.decode(codecs.encode(AO._decimate(x, 2), other), other),
            np.float64), sr // 2)
        assert p6.astype(np.float32).tobytes() == \
            p9.astype(np.float32).tobytes(), d


def _flood_table(n_copies: int, n_reenc: int) -> pa.Table:
    """One duration atom (sr=16000, n=8000): 3 base signals, each with
    ``n_copies`` byte-identical pcm copies and ``n_reenc`` alaw
    re-encodings — the dominant-(sr, n) dup flood that made the r4
    all-pairs screen O(c^2)."""
    ids, payloads = [], []
    k = 0
    for g in range(3):
        x = clips.ground_truth_pcm(9000 + g, 8000, 16000)
        pcm = codecs.encode(x, "pcm_s16le")
        re = codecs.encode(np.asarray(x, np.float64), "alaw")
        for payload, count in ((pcm, n_copies), (re, n_reenc)):
            for _ in range(count):
                ids.append(f"clip-{k:012d}")
                payloads.append(payload)
                k += 1
    n = len(ids)
    codecs_col = []
    for g in range(3):
        codecs_col += ["pcm_s16le"] * n_copies + ["alaw"] * n_reenc
    return pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "bytes": pa.array(payloads, pa.binary()),
        "sr_hz": pa.array([16000] * n, pa.int32()),
        "codec": pa.array(codecs_col, pa.string()),
    })


def test_perceptual_flood_collapses_not_quadratic(ray_session):
    """10k clips in ONE (sr, n) duration atom — mostly byte-identical
    copies plus re-encodings. The digest collapse must turn each identical
    flood into star edges on its min id (O(flood) rows, no candidate
    blow-up), and the only verified candidates are the per-group
    (pcm-rep, alaw-rep) pairs: output is EXACTLY group_size-1 pairs per
    group, every true pair present — any truncation or all-pairs leak
    breaks the set equality (the r4 cap's silent print-and-drop is
    structurally gone)."""
    import ray.data as rd
    n_copies, n_reenc = 3300, 34   # 3 x (3300 + 34) = 10,002 clips
    t = _flood_table(n_copies, n_reenc)

    # nested so cloudpickle ships it by value (a test-module-level fn
    # pickles by reference to a module Ray workers can't import)
    def identity_effective(i, payload, sr, cod):
        return np.asarray(codecs.decode(payload, cod), np.float64), int(sr)

    got = (AO.perceptual_dedup_pairs(
        rd.from_arrow(t), identity_effective, n_rows=t.num_rows)
        .to_pandas())
    gsz = n_copies + n_reenc
    want = set()
    for g in range(3):
        base = g * gsz
        rep_pcm, rep_alaw = base, base + n_copies
        for m in range(base + 1, base + n_copies):
            want.add((rep_pcm, m))                  # pcm star edges
        for m in range(rep_alaw + 1, base + gsz):
            want.add((rep_alaw, m))                 # alaw star edges
        want.add((rep_pcm, rep_alaw))               # verified rep pair
    got_pairs = {(int(a.split("-")[1]), int(b.split("-")[1]))
                 for a, b in zip(got["id_a"], got["id_b"])}
    assert got_pairs == want


def test_perceptual_keyed_route_equals_broadcast(ray_session):
    """Forcing route_broadcast_max=0 sends the verify routing through the
    keyed lancelite side table; output must be byte-identical to the
    broadcast path (the test_keyed_scale_paths.py precedent)."""
    def run(**kw):
        return (AO.audio_perceptual_dedup("/root/testdata/sf0.001", **kw)
                .to_pandas().sort_values(["id_a", "id_b"])
                .reset_index(drop=True))

    a = run()
    b = run(route_broadcast_max=0)
    assert a.equals(b)
    assert len(a) > 0


def test_index_evolution_versions_and_pinning(ray_session):
    """Multi-crawl state evolution semantics at sf0.001: (a) the evolved
    band/payload tables end at lancelite version 2 and a SECOND run does
    not re-append (idempotent guards); (b) crawl-2 flags split across
    BOTH sides of the union — prior-corpus partners (id < 2e9) AND
    appended crawl-1 partners (id >= 2e9); (c) the version-1-pinned
    incremental query returns the identical flag set before and after
    the append (pinning works, whatever the execution order)."""
    import glob

    from common_crawl_corpus_ray.pipelines import clips_queries
    from common_crawl_corpus_ray.sources import lancelite

    sf = "/root/testdata/sf0.001"
    uri = clips_queries.ensure_clips(sf, with_audio=True)
    tag = AO._clips_tag(uri)
    before = (AO.audio_perceptual_incremental(sf).to_pandas()
              .sort_values("new_id").reset_index(drop=True))

    evo = (AO.audio_index_evolution(sf).to_pandas()
           .sort_values("new_id").reset_index(drop=True))
    band_uri = f"/tmp/ccc_prior_perc_band_{tag}"
    pay_uri = f"/tmp/ccc_prior_perc_pay_{tag}"
    assert lancelite.latest_version(band_uri) == 2
    assert lancelite.latest_version(pay_uri) == 2

    evo2 = (AO.audio_index_evolution(sf).to_pandas()
            .sort_values("new_id").reset_index(drop=True))
    assert lancelite.latest_version(band_uri) == 2   # no re-append
    assert evo.equals(evo2)

    prior_side = evo[evo.dup_of_id < AO._INC_PERC_BASE]
    appended_side = evo[evo.dup_of_id >= AO._INC_PERC_BASE]
    assert len(prior_side) > 0 and len(appended_side) > 0
    assert ((prior_side.new_id - AO._EVO_BASE) % AO._INC_PERC_MOD
            == AO._EVO_PRIOR).all()
    assert ((appended_side.new_id - AO._EVO_BASE) % AO._INC_PERC_MOD
            == AO._INC_PERC_NEG).all()

    after = (AO.audio_perceptual_incremental(sf).to_pandas()
             .sort_values("new_id").reset_index(drop=True))
    assert before.equals(after)

import collections

import pyarrow as pa

from common_crawl_corpus_ray.sources import lancelite
from common_crawl_corpus_ray.synth import clips


def test_clips_deterministic_and_schema():
    t1, s1 = clips.clips_table(200)
    t2, s2 = clips.clips_table(200)
    assert t1.equals(t2) and s1.equals(s2)
    assert t1.column_names == ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
    assert t1.schema.field("bytes").type == pa.binary()
    assert t1.schema.field("sr_hz").type == pa.int32()


def test_clips_strata_coverage():
    _, side = clips.clips_table(800)
    counts = collections.Counter(side["stratum"].to_pylist())
    for name, _ in clips.STRATA:
        assert counts[name] > 0, f"stratum {name} never generated"


def test_dup_stratum_has_real_duplicates():
    t, side = clips.clips_table(800)
    texts = t["transcript"].to_pylist()
    strata = side["stratum"].to_pylist()
    dup_texts = [t_ for t_, s in zip(texts, strata) if s == "dup"]
    c = collections.Counter(dup_texts)
    assert any(v >= 2 for v in c.values())


def test_lancelite_roundtrip(tmp_path):
    t, _ = clips.clips_table(50)
    uri = str(tmp_path / "tbl")
    v = lancelite.write_table(t, uri, max_rows_per_fragment=20)
    assert v == 1
    assert lancelite.count_rows(uri) == 50
    back = lancelite.read_arrow(uri)
    assert back.sort_by("clip_id").equals(t.sort_by("clip_id"))
    # append commit creates version 2 visible atomically
    v2 = lancelite.write_table(t.slice(0, 10), uri, mode="append")
    assert v2 == 2
    assert lancelite.count_rows(uri) == 60
    assert lancelite.count_rows(uri, version=1) == 50  # time travel


def test_lancelite_ray_read(ray_session, tmp_path):
    t, _ = clips.clips_table(60, with_audio=False)
    uri = str(tmp_path / "tbl")
    lancelite.write_table(t, uri, max_rows_per_fragment=25)
    ds = lancelite.read(uri, columns=["clip_id", "transcript"])
    assert ds.count() == 60
    assert set(ds.schema().names) == {"clip_id", "transcript"}


def test_ground_truth_pcm_bit_identity():
    """The buffer-reusing ground_truth_pcm must stay bit-identical to the
    naive formula it replaced — every encoded fixture payload depends on it."""
    import numpy as np
    from common_crawl_corpus_ray.synth import clips

    def naive(i, n_samples, sr):
        rng = clips._rng(i, "audio")
        f1 = rng.uniform(80.0, min(3500.0, sr * 0.45))
        f2 = rng.uniform(80.0, min(3500.0, sr * 0.45))
        t = np.arange(n_samples, dtype=np.float64) / sr
        x = (0.35 * np.sin(2 * np.pi * f1 * t)
             + 0.2 * np.sin(2 * np.pi * f2 * t)
             + 0.004 * rng.standard_normal(n_samples))
        return x.astype(np.float32)

    for i, n, sr in [(0, 1, 8000), (3, 4096, 16000), (77, 9999, 22050),
                     (123456, 2500, 44100)]:
        a, b = naive(i, n, sr), clips.ground_truth_pcm(i, n, sr)
        assert a.dtype == b.dtype and np.array_equal(a, b)

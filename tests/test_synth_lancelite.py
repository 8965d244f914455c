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

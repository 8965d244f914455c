"""Multimodal stub stages: real plumbing (schema/actor/batch/flat-map),
stubbed codecs (raw-rgb8 real, everything else NotImplementedError)."""

import numpy as np
import pyarrow as pa
import pytest

from common_crawl_corpus_ray.stages import multimodal as mm


def _images_ds(n=40):
    import ray.data as rd
    return rd.from_arrow(mm.synth_images([f"img-{i:04d}" for i in range(n)]))


def test_decode_resize_actor_stage(ray_session):
    out = _images_ds().map_batches(
        mm.ImageDecodeResize, batch_format="pyarrow", batch_size=16,
        fn_constructor_args=(8, 8), concurrency=(1, 2), num_cpus=1).to_pandas()
    assert len(out) == 40
    assert (out["width"] == 8).all() and (out["height"] == 8).all()
    assert all(len(bs) == 8 * 8 * 3 for bs in out["bytes"])
    # deterministic: resize of a known image matches direct numpy resize
    t = mm.synth_images(["img-0000"])
    img = mm.decode_rgb8(t["bytes"][0].as_py(), 48, 48)
    want = mm.resize_nearest(img, 8, 8).tobytes()
    got = out.set_index("item_id").loc["img-0000", "bytes"]
    assert got == want


def test_image_features_embedding_layout(ray_session):
    out = _images_ds().map_batches(
        mm.ImageFeatures, batch_format="pyarrow", batch_size=16,
        concurrency=(1, 2), num_cpus=1).to_pandas()
    assert len(out) == 40
    emb = np.stack([np.asarray(e) for e in out["embedding"]])
    assert emb.shape == (40, 6)
    assert (emb[:, :3] >= 0).all() and (emb[:, :3] <= 1).all()


def test_frame_sample_flatmap(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(mm.synth_videos([f"v-{i}" for i in range(10)],
                                       n_frames=12))
    out = ds.map_batches(mm.FrameSample, batch_format="pyarrow", batch_size=4,
                         fn_constructor_args=(4,), concurrency=(1, 2),
                         num_cpus=1).to_pandas()
    assert len(out) == 40                     # 10 videos x 4 frames
    assert set(out["frame_idx"].unique()) == {0, 3, 7, 11}
    assert (out["format"] == "raw-rgb8").all()
    # sampled frames decode under the image stub decoder
    first = out.iloc[0]
    img = mm.decode_rgb8(first["bytes"], first["width"], first["height"])
    assert img.shape == (16, 16, 3)


def test_unsupported_codec_raises():
    t = pa.table({"item_id": ["x"], "bytes": [b"\xff\xd8"],
                  "width": [1], "height": [1],
                  "format": ["jpeg"]}, schema=mm.IMAGE_SCHEMA)
    with pytest.raises(NotImplementedError, match="jpeg"):
        mm.ImageDecodeResize()(t)

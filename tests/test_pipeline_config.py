"""PipelineConfig (SURVEY.md 2.10) drives the flagship knobs end-to-end."""

import numpy as np
import pyarrow as pa
import pytest

from common_crawl_corpus_ray.pipelines.config import PipelineConfig


@pytest.fixture(scope="module")
def clips_ds(ray_session):
    import ray.data as rd
    from common_crawl_corpus_ray.synth import clips
    t, _ = clips.clips_table(400, with_audio=False)
    return rd.from_arrow(t)


def _run(clips_ds, cfg):
    from common_crawl_corpus_ray.pipelines import quality_filter
    return quality_filter.run(clips_ds, attach_payload=False,
                              config=cfg).to_pandas()


def test_dedup_modes(clips_ds):
    first = _run(clips_ds, PipelineConfig(dedup="first", attach_payload=False))
    none = _run(clips_ds, PipelineConfig(dedup="none", attach_payload=False))
    off = _run(clips_ds, PipelineConfig(dedup="off", attach_payload=False))

    assert not off["is_dup"].any()
    # keep-first spares exactly one member per dup group; keep-none spares none
    dup_hashes = set(first.loc[first["is_dup"], "text_hash"])
    if dup_hashes:
        grp = first[first["text_hash"].isin(dup_hashes)]
        spared = grp.groupby("text_hash")["is_dup"].apply(lambda s: (~s).sum())
        assert (spared >= 1).all()
        grp_none = none[none["text_hash"].isin(dup_hashes)]
        # every rules-pass member of a multi-member group is flagged
        alive = grp_none[grp_none["drop_reason"].isin(["", "dup", "lid_disagree",
                                                       "ppl_outlier"])]
        flagged = none.loc[none["text_hash"].isin(dup_hashes) & none["is_dup"]]
        assert len(flagged) >= len(first.loc[first["is_dup"]])


def test_z_cut_knob(clips_ds):
    strict = _run(clips_ds, PipelineConfig(z_cut=0.5, attach_payload=False))
    loose = _run(clips_ds, PipelineConfig(z_cut=1e9, attach_payload=False))
    assert (loose["ppl_bucket"] == "IN").all()
    assert (strict["ppl_bucket"] != "IN").sum() >= (loose["ppl_bucket"] != "IN").sum()


def test_invalid_dedup_rejected():
    with pytest.raises(ValueError):
        PipelineConfig(dedup="bogus")

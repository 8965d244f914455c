"""PipelineConfig (SURVEY.md 2.10) drives the flagship knobs end-to-end."""

import numpy as np
import pandas as pd
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


# --- audio_dedup config stage (round 5) -------------------------------------

def _clips_with_audio_dups():
    """clips_table(260) + three planted copies: byte-identical (exact
    catches), re-encoded (perceptual only), decimated-to-sr/2 (perceptual
    only, via the canonical-rate blocking). Copies get distinct
    transcripts so the text pipeline treats them as independent rows."""
    from common_crawl_corpus_ray.audio import codecs
    from common_crawl_corpus_ray.pipelines import audio_ops as AO
    from common_crawl_corpus_ray.synth import clips

    t, _ = clips.clips_table(260, with_audio=True)
    rows = {c: t[c].to_pylist() for c in t.column_names}

    def donor(i):
        return {c: rows[c][i] for c in rows}

    def add(new_idx, d, payload, sr, codec, note):
        rows["clip_id"].append(f"clip-{new_idx:012d}")
        rows["bytes"].append(payload)
        rows["sr_hz"].append(sr)
        rows["dur_ms"].append(d["dur_ms"])
        rows["codec"].append(codec)
        rows["transcript"].append(d["transcript"] + " " + note)

    d5, d8, d12 = donor(5), donor(8), donor(12)
    add(1005, d5, d5["bytes"], d5["sr_hz"], d5["codec"], "copy five")
    x8 = np.asarray(codecs.decode(d8["bytes"], d8["codec"]), np.float64)
    other8 = "alaw" if d8["codec"] != "alaw" else "ulaw"
    add(1008, d8, codecs.encode(x8, other8), d8["sr_hz"], other8,
        "copy eight")
    x12 = np.asarray(codecs.decode(d12["bytes"], d12["codec"]), np.float64)
    add(1012, d12, codecs.encode(AO._decimate(x12, 2), "pcm_s16le"),
        d12["sr_hz"] // 2, "pcm_s16le", "copy twelve")
    schema = t.select(
        ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
    ).schema
    return pa.table({c: pa.array(rows[c], schema.field(c).type)
                     for c in schema.names})


def _flag_map(df):
    return dict(zip(df.loc[df["audio_dup_of"] != "", "clip_id"],
                    df.loc[df["audio_dup_of"] != "", "audio_dup_of"]))


def test_audio_dedup_flagship_stage(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(_clips_with_audio_dups())
    off = _run(ds, PipelineConfig(dedup="first", attach_payload=False))
    exact = _run(ds, PipelineConfig(dedup="first", attach_payload=False,
                                    audio_dedup="exact"))
    perc = _run(ds, PipelineConfig(dedup="first", attach_payload=False,
                                   audio_dedup="perceptual"))

    c = lambda i: f"clip-{i:012d}"
    # exact catches the byte-identical copy only; perceptual also the
    # re-encoded and the resampled-then-re-encoded copies
    assert _flag_map(exact) == {c(1005): c(5)}
    assert _flag_map(perc) == {c(1005): c(5), c(1008): c(8), c(1012): c(12)}

    # flagged rows: keep flips to False with reason "audio_dup" ONLY if
    # the off-run kept them; already-dropped rows keep their reason.
    # Unflagged rows are bit-identical to the off-run.
    for amended in (exact, perc):
        a = amended.sort_values("clip_id").reset_index(drop=True)
        o = off.sort_values("clip_id").reset_index(drop=True)
        flagged = a["audio_dup_of"] != ""
        assert not a.loc[flagged, "keep"].any()
        was_kept = o.loc[flagged.to_numpy(), "keep"].to_numpy()
        reasons = a.loc[flagged, "drop_reason"].to_numpy()
        old = o.loc[flagged.to_numpy(), "drop_reason"].to_numpy()
        assert (reasons[was_kept] == "audio_dup").all()
        assert (reasons[~was_kept] == old[~was_kept]).all()
        pd.testing.assert_frame_equal(
            a.loc[~flagged.to_numpy(), o.columns].reset_index(drop=True),
            o.loc[~flagged.to_numpy()].reset_index(drop=True))

    # the keyed flag side (forced by threshold 0) is byte-identical to
    # the broadcast side
    perc_keyed = _run(ds, PipelineConfig(
        dedup="first", attach_payload=False, audio_dedup="perceptual",
        audio_flags_broadcast_max=0))
    pd.testing.assert_frame_equal(
        perc.sort_values("clip_id").reset_index(drop=True),
        perc_keyed.sort_values("clip_id").reset_index(drop=True))


def test_audio_dedup_payload_attach_carries_flag_column(ray_session):
    """Phase D (payload attach) must carry audio_dup_of through both the
    broadcast and keyed decision-attach paths."""
    import ray.data as rd
    from common_crawl_corpus_ray.pipelines import quality_filter
    ds = rd.from_arrow(_clips_with_audio_dups())
    bcast = quality_filter.run(
        ds, config=PipelineConfig(audio_dedup="exact")).to_pandas()
    keyed_run = quality_filter.run(
        ds, config=PipelineConfig(audio_dedup="exact",
                                  dec_broadcast_max=0)).to_pandas()
    assert "audio_dup_of" in bcast.columns
    assert _flag_map(bcast) == {"clip-000000001005": "clip-000000000005"}
    pd.testing.assert_frame_equal(
        bcast.sort_values("clip_id").reset_index(drop=True),
        keyed_run.sort_values("clip_id").reset_index(drop=True))


def test_invalid_audio_dedup_rejected():
    with pytest.raises(ValueError):
        PipelineConfig(audio_dedup="fuzzy")

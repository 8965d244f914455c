"""Checkpoint/resume: per-partition lineage manifest + crash-injection
resume (SURVEY.md section 5, tests #4/#5)."""

import os
import shutil

import pyarrow as pa
import pytest

from common_crawl_corpus_ray.state import manifest


@pytest.fixture
def tmp_uri(tmp_path):
    return str(tmp_path / "ckpt")


def test_partition_commit_attempt_and_read(ray_session, tmp_uri):
    t = pa.table({"x": [1, 2, 3]})
    e1 = manifest.write_partition(tmp_uri, 0, t, metrics={"m": 1})
    assert e1["attempt"] == 1 and e1["row_count"] == 3
    # rewrite (a retry) bumps the attempt; latest entry wins
    e2 = manifest.write_partition(tmp_uri, 0, pa.table({"x": [9]}))
    assert e2["attempt"] == 2
    manifest.write_partition(tmp_uri, 1, pa.table({"x": [4, 5]}))
    v = manifest.commit_version(tmp_uri)
    vm = manifest.version_manifest(tmp_uri, v)
    assert vm["partitions"] == [0, 1] and vm["num_rows"] == 3
    got = sorted(manifest.read(tmp_uri).to_pandas()["x"].tolist())
    assert got == [4, 5, 9]


def test_uncommitted_partition_invisible(ray_session, tmp_uri):
    manifest.write_partition(tmp_uri, 0, pa.table({"x": [1]}))
    manifest.commit_version(tmp_uri)
    # partition 1 written AFTER the version commit: invisible at v1
    manifest.write_partition(tmp_uri, 1, pa.table({"x": [2]}))
    assert len(manifest.fragment_paths(tmp_uri, version=1)) == 1
    manifest.commit_version(tmp_uri)
    assert len(manifest.fragment_paths(tmp_uri)) == 2


def test_resume_after_crash_matches_clean_run(ray_session, tmp_path):
    from common_crawl_corpus_ray.pipelines import clips_queries, resumable

    clips_uri = clips_queries.ensure_clips("/root/testdata/sf0.001",
                                           with_audio=False)
    ckpt = str(tmp_path / "score_ckpt")
    P = 4

    with pytest.raises(resumable.InjectedFailure):
        resumable.run_resumable(clips_uri, ckpt, num_partitions=P, fail_after=2)
    done_before = manifest.completed(ckpt)
    assert len(done_before) == 2

    dec = resumable.run_resumable(clips_uri, ckpt, num_partitions=P)
    done_after = manifest.completed(ckpt)
    assert sorted(done_after) == list(range(P))
    # completed partitions were NOT recomputed: same attempt, same fragments
    for pid, e in done_before.items():
        assert done_after[pid]["attempt"] == e["attempt"]
        assert done_after[pid]["fragments"] == e["fragments"]
    assert all(e["attempt"] == 1 for e in done_after.values())
    assert all(e["metrics"]["n_rules_pass"] >= 0 for e in done_after.values())

    # resumed result identical to a clean one-shot run
    clean = clips_queries.clips_pipeline("/root/testdata/sf0.001").to_pandas()
    got = dec.to_pandas()[clean.columns.tolist()]
    clean = clean.sort_values("clip_id").reset_index(drop=True)
    got = got.sort_values("clip_id").reset_index(drop=True)
    assert got.equals(clean)

    shutil.rmtree(ckpt, ignore_errors=True)


def test_resume_threads_config_knobs(ray_session, tmp_path):
    """ADVICE r1: --resume must honor z_cut / dedup / attach_payload, not
    silently run with defaults."""
    from common_crawl_corpus_ray.pipelines import clips_queries, resumable
    from common_crawl_corpus_ray.pipelines.config import PipelineConfig

    clips_uri = clips_queries.ensure_clips("/root/testdata/sf0.001",
                                           with_audio=True)
    ckpt = str(tmp_path / "ck3")
    cfg = PipelineConfig(dedup="off", z_cut=1e9, attach_payload=False,
                         num_partitions=2)
    dec = resumable.run_resumable(clips_uri, ckpt, config=cfg).to_pandas()
    assert not dec["is_dup"].any()                    # dedup="off" honored
    assert (dec["ppl_bucket"] == "IN").all()          # z_cut=1e9 honored

    # attach_payload on resume: payload columns ride along, reusing ckpt
    full = resumable.run_resumable(clips_uri, ckpt, config=PipelineConfig(
        dedup="off", z_cut=1e9, attach_payload=True, num_partitions=2))
    t = full.schema()
    names = t.names if hasattr(t, "names") else t.base_schema.names
    assert "bytes" in names and "keep" in names
    assert full.count() == len(dec)
    shutil.rmtree(ckpt, ignore_errors=True)


def test_rerun_is_noop(ray_session, tmp_path):
    from common_crawl_corpus_ray.pipelines import clips_queries, resumable

    clips_uri = clips_queries.ensure_clips("/root/testdata/sf0.001",
                                           with_audio=False)
    ckpt = str(tmp_path / "ck2")
    vm1 = resumable.run_scored_partitions(clips_uri, ckpt, num_partitions=3)
    assert vm1["partitions_run_this_call"] == len(vm1["partitions"])
    vm2 = resumable.run_scored_partitions(clips_uri, ckpt, num_partitions=3)
    assert vm2["partitions_run_this_call"] == 0
    assert vm2["num_rows"] == vm1["num_rows"]

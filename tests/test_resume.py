"""Kill-and-resume correctness (BASELINE.md protocol step 5).

A run killed mid-stage-1 must, on restart, skip completed shards (their
checkpoint files untouched) and produce a final triple set identical to an
uninterrupted run."""

import os
import shutil

import pytest


def triple_set(ds):
    df = ds.to_pandas()
    return set(map(tuple, df[["subj", "pred", "obj"]].astype(str).values))


def test_kill_and_resume(sf_smoke, tmp_path):
    from dug_ray.state.runner import output_triples, run_resumable

    clean_dir = str(tmp_path / "clean")
    resume_dir = str(tmp_path / "resumed")

    # uninterrupted reference run
    run_resumable(sf_smoke, clean_dir, num_shards=4)
    want = triple_set(output_triples(clean_dir))
    assert len(want) > 0

    # crash after 2 of 4 shards
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_resumable(sf_smoke, resume_dir, num_shards=4, stop_after_shards=2)
    done_files = {
        f: os.path.getmtime(os.path.join(resume_dir, "stage1", f))
        for f in os.listdir(os.path.join(resume_dir, "stage1"))
        if f.endswith(".parquet")
    }
    assert len(done_files) == 2

    # restart: completed shards must not be recomputed (mtimes unchanged)
    run_resumable(sf_smoke, resume_dir, num_shards=4)
    for f, mtime in done_files.items():
        assert os.path.getmtime(os.path.join(resume_dir, "stage1", f)) == mtime

    got = triple_set(output_triples(resume_dir))
    assert got == want


def test_materialize_partition_resume(sf_smoke, tmp_path):
    """Completed output partitions are skipped on a second materialize."""
    from dug_ray.pipelines import kg
    from dug_ray.stages.materialize import materialize_graph, read_graph
    from dug_ray.state.manifest import PartitionManifest

    out = str(tmp_path / "kg")
    materialize_graph(kg.kg_triples(sf_smoke), out)
    n1 = read_graph(out).count()
    manifest = PartitionManifest(out)
    assert len(manifest.completed_buckets()) == 512

    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in parts}
    materialize_graph(kg.kg_triples(sf_smoke), out)
    assert read_graph(out).count() == n1
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f)) == t


def test_subject_lookup_pruned(sf_smoke, tmp_path):
    """Serving read path: bucket-pruned point lookup returns exactly the
    subject's triples, sorted by (pred, obj)."""
    from dug_ray.pipelines import kg
    from dug_ray.stages.materialize import materialize_graph, subject_lookup

    out = str(tmp_path / "kg")
    materialize_graph(kg.kg_triples(sf_smoke), out)
    full = kg.kg_triples(sf_smoke).to_pandas()
    for subj in ["MONDO:0005148", "MONDO:0004976", "NOPE:123"]:
        t = subject_lookup(out, subj).to_pandas()
        want = full[full["subj"] == subj]
        assert len(t) == len(want)
        assert set(map(tuple, t[["pred", "obj"]].values)) == \
            set(map(tuple, want[["pred", "obj"]].values))
        assert list(t["pred"]) == sorted(t["pred"])  # ordered scan


def test_manifest_fingerprints(sf_smoke, tmp_path):
    from dug_ray.pipelines import kg
    from dug_ray.stages.materialize import materialize_graph
    from dug_ray.state.manifest import PartitionManifest

    out = str(tmp_path / "kg")
    materialize_graph(kg.kg_triples(sf_smoke), out)
    entries = PartitionManifest(out).load()
    nonempty = [v for v in entries.values() if v.get("rows", 0) > 0]
    assert nonempty
    assert all(len(v["fingerprint"]) == 32 for v in nonempty)
    # north-rule per-partition metrics ride the manifest next to lineage
    assert all(v["metrics"]["sec"] >= 0 and v["metrics"]["rows_per_sec"] > 0
               for v in nonempty)


def test_manifest_legacy_layout_refused(tmp_path):
    """A pre-layout-pinning manifest (no _meta) with completed buckets must
    REFUSE ensure_layout instead of silently adopting the current run's
    params — that adoption is exactly the changed-layout resume hazard the
    guard exists for. An empty legacy manifest still auto-stamps."""
    import pytest

    from dug_ray.state.manifest import PartitionManifest

    # empty legacy manifest: auto-stamp is fine
    m = PartitionManifest(str(tmp_path / "empty"))
    m._write({})
    m.ensure_layout(num_buckets=8, salt=3)
    assert m.load()["_meta"]["num_buckets"] == 8

    # legacy manifest WITH done buckets: refuse
    m2 = PartitionManifest(str(tmp_path / "legacy"))
    m2._write({"0": {"status": "done", "rows": 5, "path": "x", "fingerprint": ""}})
    with pytest.raises(ValueError, match="no pinned layout"):
        m2.ensure_layout(num_buckets=8, salt=3)
    # and the refusal did not mutate the manifest
    assert "_meta" not in m2.load()


def test_materialize_midrun_crash_saves_buckets(sf_smoke, tmp_path):
    """Per-bucket sidecar markers: if the run dies BEFORE the end-of-run
    manifest rewrite, buckets that completed are still seen as done on
    restart (their files untouched), and a finished run compacts the
    sidecars into the main manifest."""
    import glob

    from dug_ray.pipelines import kg
    from dug_ray.stages.materialize import materialize_graph, read_graph
    from dug_ray.state.manifest import PartitionManifest

    out = str(tmp_path / "kg")
    materialize_graph(kg.kg_triples(sf_smoke), out)
    want = read_graph(out).count()

    # simulate a crash just before mark_done_many: keep the partition files
    # and sidecars, reset the main manifest to only the _meta layout stamp
    # (ensure_layout writes it atomically at run START, so a real mid-run
    # crash never loses it), re-create sidecars for half the written
    # buckets (as if the rest hadn't finished)
    manifest = PartitionManifest(out)
    loaded = manifest.load()
    entries = {k: v for k, v in loaded.items() if v.get("rows", 0) > 0}
    manifest._write({"_meta": loaded["_meta"]})
    kept = sorted(entries, key=int)[: len(entries) // 2]
    for k in kept:
        v = entries[k]
        manifest.mark_done_sidecar(int(k), v["rows"], v["path"], v["fingerprint"])
    assert manifest.completed_buckets() == {int(k) for k in kept}

    mtimes = {k: os.path.getmtime(entries[k]["path"]) for k in kept}
    materialize_graph(kg.kg_triples(sf_smoke), out)
    assert read_graph(out).count() == want
    for k in kept:  # completed buckets were not rewritten
        assert os.path.getmtime(entries[k]["path"]) == mtimes[k]
    assert glob.glob(os.path.join(out, "_done-*.json")) == []  # compacted


def test_runner_empty_shards_and_modulus_pin(sf_smoke, tmp_path):
    """num_shards beyond the distinct doc_id residues leaves empty shards:
    the run must complete (schema-bearing empty checkpoints) and produce
    the same triples; resuming with a different num_shards is refused."""
    import duckdb

    from dug_ray.state.runner import output_triples, run_resumable

    # tiny corpus: 3 docs with ids 0..2 -> shards 3..11 are EMPTY
    tiny = str(tmp_path / "tiny")
    os.makedirs(tiny)
    duckdb.sql(f"COPY (SELECT * FROM read_parquet('{sf_smoke}/documents.parquet') "
               f"WHERE doc_id < 3) TO '{tiny}/documents.parquet' (FORMAT PARQUET)")

    ref = str(tmp_path / "ref")
    run_resumable(tiny, ref, num_shards=3)
    want = triple_set(output_triples(ref))
    assert len(want) > 0

    big = str(tmp_path / "big")
    run_resumable(tiny, big, num_shards=12)
    assert triple_set(output_triples(big)) == want

    with pytest.raises(ValueError, match="num_shards=12"):
        run_resumable(tiny, big, num_shards=4)


def test_runner_parser_pin(sf_smoke, tmp_path):
    """Resuming a checkpoint with a different named parser is refused —
    mixed-brand shards would be silently wrong."""
    from dug_ray import registry
    from dug_ray.state.runner import run_resumable

    out = str(tmp_path / "kg")
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_resumable(sf_smoke, out, num_shards=4, stop_after_shards=1,
                      parser=registry.get_parser("topmed"), parser_name="topmed")
    with pytest.raises(ValueError, match="parser 'dbgap'"):
        run_resumable(sf_smoke, out, num_shards=4,
                      parser=registry.get_parser("dbgap"), parser_name="dbgap")

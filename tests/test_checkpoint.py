"""Resumable partitioned output: lineage manifest, _SUCCESS markers, skip
semantics, and identical results after an interrupted run."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from pdfplumber_ray.config import PipelineConfig
from pdfplumber_ray.sources.synth_corpus import make_docs_table, write_corpus
from pdfplumber_ray.state import run_resumable_extract


@pytest.fixture()
def corpus(tmp_path):
    d = tmp_path / "in"
    write_corpus(str(d), 60, seed=42, docs_per_shard=20)
    return str(d)


def _read_all_spans(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    rows = {}
    for f in files:
        t = pq.read_table(f)
        for did, spans in zip(t.column("doc_id").to_pylist(), t.column("spans").to_pylist()):
            rows[did] = [(s["kind"], s["text"], s["media_ref"]) for s in spans]
    return rows


def test_full_run_then_resume_skips_everything(ray_session, corpus, tmp_path):
    out = str(tmp_path / "out")
    s1 = run_resumable_extract(corpus, out, PipelineConfig(batch_size=16))
    assert s1["partitions_run"] == 3 and s1["partitions_skipped"] == 0
    assert s1["docs"] == 60 and s1["errors"] == 0
    assert len(glob.glob(os.path.join(out, "_SUCCESS.*"))) == 3
    manifest = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
    assert {m["pid"] for m in manifest} == {"docs-00000", "docs-00001", "docs-00002"}
    assert sum(m["docs"] for m in manifest) == 60

    # resume: nothing to do
    s2 = run_resumable_extract(corpus, out, PipelineConfig(batch_size=16))
    assert s2["partitions_run"] == 0 and s2["partitions_skipped"] == 3

    # output matches the expected span sequences
    expected = make_docs_table(60, seed=42)
    got = _read_all_spans(out)
    for did, spans in zip(
        expected.column("doc_id").to_pylist(), expected.column("spans").to_pylist()
    ):
        assert got[did] == [(s["kind"], s["text"], s["media_ref"]) for s in spans]


def test_partial_failure_reruns_only_missing(ray_session, corpus, tmp_path):
    out = str(tmp_path / "out")
    run_resumable_extract(corpus, out, PipelineConfig(batch_size=16))
    # simulate a failed partition: drop its marker and corrupt its dir
    os.remove(os.path.join(out, "_SUCCESS.docs-00001"))
    part_dir = os.path.join(out, "part=docs-00001")
    for f in glob.glob(os.path.join(part_dir, "*.parquet")):
        os.remove(f)
    with open(os.path.join(part_dir, "garbage.parquet"), "w") as f:
        f.write("not parquet")

    s = run_resumable_extract(corpus, out, PipelineConfig(batch_size=16))
    assert s["partitions_run"] == 1 and s["partitions_skipped"] == 2
    assert s["docs"] == 20
    # the partial garbage was wiped; partition is complete and correct again
    got = _read_all_spans(out)
    assert len(got) == 60
    expected = make_docs_table(60, seed=42)
    for did, spans in zip(
        expected.column("doc_id").to_pylist(), expected.column("spans").to_pylist()
    ):
        assert got[did] == [(s["kind"], s["text"], s["media_ref"]) for s in spans]

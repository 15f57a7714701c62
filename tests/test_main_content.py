"""Boilerplate strip / main-content extraction (pipelines/main_content.py):
the north rule's HTML-boilerplate clause. Checks both rules independently
and the end-to-end text recovery."""

import numpy as np
import pyarrow as pa
import pytest

from pdfplumber_ray.pipelines.main_content import (
    frequent_span_fps,
    main_content_text_ds,
    nav_mask,
    strip_boilerplate_ds,
)
from pdfplumber_ray.schemas import SPAN
from pdfplumber_ray.sources.synth_corpus import (
    FOOTER,
    docs_with_boilerplate_batch,
)


def test_nav_mask_rule():
    texts = pa.array(
        [
            "| Home | About | Products |",        # nav: dense separators
            "a perfectly ordinary sentence of body text",  # body
            FOOTER,                                 # punct-free footer: NOT nav
            "a" * 50,                               # long, no punct
            "- - - -",                              # dense but no menu separator
            "see https://x.io/a-b, then act",       # punct-dense body: NOT nav
            "Home | Products | Contact",            # menu without leading pipe
        ]
    )
    m = nav_mask(texts, max_punct_ratio=0.05, max_words=16)
    assert m.tolist() == [True, False, False, False, False, False, True]


def _docs_table(n=40):
    ids = pa.array(list(range(n)), pa.int64())
    texts = pa.array(
        [" ".join(f"w{i}x{j}" for j in range(20)) for i in range(n)], pa.string()
    )
    return pa.table({"doc_id": ids, "text": texts})


def test_strip_recovers_body(ray_session):
    import ray.data

    raw = _docs_table()
    docs = ray.data.from_arrow(docs_with_boilerplate_batch(raw))
    stripped = strip_boilerplate_ds(docs, n_docs=raw.num_rows)
    out = main_content_text_ds(stripped).to_pandas()
    out["key"] = out.doc_id.str.rsplit("-", n=1).str[1].astype(int)
    out = out.sort_values("key").reset_index(drop=True)
    assert (out.text.values == raw.column("text").to_numpy(zero_copy_only=False)).all()


def test_template_frequency_finds_footer(ray_session):
    import ray.data

    from pdfplumber_ray.functions.textstats import rolling_fingerprint

    raw = _docs_table()
    docs = ray.data.from_arrow(docs_with_boilerplate_batch(raw))
    fps = frequent_span_fps(docs, min_count=int(0.3 * raw.num_rows))
    footer_fp = rolling_fingerprint([FOOTER])[0]
    assert footer_fp in fps
    # body windows are unique per doc -> only the footer is frequent
    assert fps.size == 1


def test_auto_doc_count_single_pass(ray_session):
    """n_docs=None folds the corpus doc count into the frequency aggregate
    (sentinel fp row) — result identical to the explicit-count path."""
    import ray.data

    from pdfplumber_ray.pipelines.main_content import frequent_span_fps_auto

    raw = _docs_table()
    docs = ray.data.from_arrow(docs_with_boilerplate_batch(raw))
    fps_auto, n_docs = frequent_span_fps_auto(docs, min_df_fraction=0.3)
    assert n_docs == raw.num_rows
    fps_explicit = frequent_span_fps(
        docs, min_count=max(2, int(np.ceil(0.3 * raw.num_rows)))
    )
    assert np.array_equal(fps_auto, fps_explicit)
    # end to end: the auto path strips identically to the explicit path
    stripped = strip_boilerplate_ds(docs)  # n_docs unset -> auto
    out = main_content_text_ds(stripped).to_pandas()
    out["key"] = out.doc_id.str.rsplit("-", n=1).str[1].astype(int)
    out = out.sort_values("key").reset_index(drop=True)
    assert (out.text.values == raw.column("text").to_numpy(zero_copy_only=False)).all()


def test_non_text_spans_survive(ray_session):
    import ray.data

    spans = [
        {"kind": "text", "text": "| nav | nav | nav |", "media_ref": "", "offset": 0},
        {"kind": "media_ref", "text": "", "media_ref": "media://d/0", "offset": 20},
        {"kind": "table_cell", "text": "| cell |", "media_ref": "", "offset": 21},
        {"kind": "text", "text": "real body content here", "media_ref": "", "offset": 30},
    ]
    docs = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(["d"]), "spans": pa.array([spans], pa.list_(SPAN))}
        )
    )
    out = strip_boilerplate_ds(docs, n_docs=1).take_all()[0]["spans"]
    kinds = [s["kind"] for s in out]
    # the nav text span is gone; media and table_cell spans are untouched
    # (the shallow rule applies only to text/heading spans)
    assert kinds == ["media_ref", "table_cell", "text"]
    assert out[-1]["text"] == "real body content here"


def test_auto_collect_bounded_by_true_frequent_set(ray_session):
    """High-duplication corpus (every doc shares one span with a neighbor,
    so ~50% of distinct fingerprints have df>=2): the driver-side collect
    must be bounded by the TRUE frequent set (df >= fraction*N), not by the
    df>=2 candidate set — the pre-r5 shape that dies on a web corpus."""
    import ray.data

    from pdfplumber_ray.functions.textstats import rolling_fingerprint
    from pdfplumber_ray.pipelines import main_content as mc

    n = 40
    template = "(c) 2026 SharedSite Inc - all rights reserved etc etc"
    rows_id, rows_spans = [], []
    for i in range(n):
        spans = [
            {"kind": "text", "text": f"unique body {i} " + "z " * 10},
            # pairwise-shared span: docs (2k, 2k+1) share it -> df == 2
            {"kind": "text", "text": f"shared pair {i // 2} quote text"},
            {"kind": "text", "text": template},  # df == n
        ]
        rows_id.append(f"doc-{i}")
        rows_spans.append(spans)
    t = pa.table(
        {
            "doc_id": pa.array(rows_id, pa.string()),
            "spans": pa.array(rows_spans, pa.list_(SPAN)),
        }
    )
    docs = ray.data.from_arrow(t)
    fps, n_docs = mc.frequent_span_fps_auto(docs, min_df_fraction=0.3)
    assert n_docs == n
    # df>=2 candidates: n/2 pair spans + template = 21 fingerprints; the
    # true frequent set (df >= 12) is ONLY the template
    assert fps.size == 1
    assert fps[0] == rolling_fingerprint([template])[0]

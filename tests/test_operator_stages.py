"""Operator-stage coverage: crop/within/outside, dedupe_chars round trip,
text lines, outline, and CSV/JSON serialization contracts."""

import json

import numpy as np
import pytest

from pdfplumber_ray.config import PipelineConfig
from pdfplumber_ray.pipelines import (
    chars_ds,
    crop_ds,
    decode_pages_ds,
    dedupe_chars_ds,
    duplicate_chars_ds,
    extract_spans_ds,
    outline_ds,
    page_text_ds,
    text_lines_ds,
    words_ds,
)
from pdfplumber_ray.sinks import csv_column_order, objects_csv_ds, pages_json_ds
from pdfplumber_ray.sources.synth_corpus import make_docs_table


@pytest.fixture(scope="module")
def pages(ray_session):
    import ray.data

    docs = ray.data.from_arrow(make_docs_table(25, seed=9))
    return decode_pages_ds(docs, PipelineConfig(batch_size=8))


def test_crop_within_outside_partition(pages):
    bbox = (0.0, 0.0, 612.0, 400.0)
    n_all = chars_ds(pages).count()
    n_within = chars_ds(crop_ds(pages, bbox, mode="within")).count()
    n_outside = chars_ds(crop_ds(pages, bbox, mode="outside")).count()
    assert n_within > 0 and n_outside > 0
    # chars never straddle the band boundary mid-glyph in ways that drop
    # them from both sides; within+outside <= all, and overlappers only in crop
    assert n_within + n_outside <= n_all
    n_crop = chars_ds(crop_ds(pages, bbox, mode="crop")).count()
    assert n_crop >= n_within


def test_crop_clips_geometry(pages):
    bbox = (0.0, 0.0, 612.0, 300.0)
    out = chars_ds(crop_ds(pages, bbox, mode="crop")).take_all()
    assert all(r["bottom"] <= 300.0 + 1e-9 for r in out)


def test_dedupe_chars_roundtrip(pages):
    clean_words = words_ds(pages).count()
    duped = duplicate_chars_ds(pages)
    assert chars_ds(duped).count() == 2 * chars_ds(pages).count()
    deduped = dedupe_chars_ds(duped, tolerance=1.0)
    assert chars_ds(deduped).count() == chars_ds(pages).count()
    assert words_ds(deduped).count() == clean_words


def test_text_lines_match_simple_text(pages):
    lines = text_lines_ds(pages).take_all()
    assert all(r["text"].strip() == r["text"] for r in lines)
    assert all(r["text"] for r in lines)
    # every line appears within the page's simple-extracted text
    txt = {(r["doc_id"], r["page_number"]): r["text"] for r in page_text_ds(pages, mode="simple").take_all()}
    for r in lines[:50]:
        assert r["text"] in txt[(r["doc_id"], r["page_number"])]


def test_outline_matches_span_kinds(ray_session):
    import ray.data

    table = make_docs_table(10, seed=9)
    out = extract_spans_ds(ray.data.from_arrow(table))
    ol = outline_ds(out).take_all()
    by_doc = {}
    for r in ol:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, spans in zip(table.column("doc_id").to_pylist(), table.column("spans").to_pylist()):
        want = []
        i = 0
        while i < len(spans):
            k = spans[i]["kind"]
            if k == "table_cell":
                while i < len(spans) and spans[i]["kind"] == "table_cell":
                    i += 1
                want.append("Table")
            else:
                want.append({"heading": "H", "media_ref": "Figure"}.get(k, "P"))
                i += 1
        got = [r["type"] for r in sorted(by_doc[did], key=lambda r: r["element_index"])]
        assert got == want, did


def test_csv_column_order_contract():
    fields = ["fontname", "x0", "x1", "top", "bottom", "doctop", "width",
              "height", "page_number", "size", "text", "upright", "object_type"]
    cols = csv_column_order(fields)
    assert cols[0] == "object_type"
    assert cols[1:11] == ["page_number", "x0", "x1", "doctop", "top", "bottom",
                          "width", "height"][:10] or cols[1] == "page_number"
    # prepend list order is fixed; remaining sorted
    tail = cols[1 + len([c for c in ["page_number","x0","x1","y0","y1","doctop","top","bottom","width","height"] if c in fields]):]
    assert tail == sorted(tail)
    with pytest.raises(ValueError):
        csv_column_order(fields, include_attrs=["x0"], exclude_attrs=["x1"])
    with pytest.raises(ValueError):
        csv_column_order(fields, exclude_attrs=["object_type"])
    incl = csv_column_order(fields, include_attrs=["x0", "text"])
    assert incl == ["object_type", "x0", "text"]


def test_objects_csv_and_json(pages, tmp_path):
    csv_ds = objects_csv_ds(chars_ds(pages), "char", precision=2)
    first = csv_ds.take(1)[0]
    assert list(first.keys())[0] == "object_type"
    assert first["object_type"] == "char"
    assert abs(first["x0"] * 100 - round(first["x0"] * 100)) < 1e-9

    js = pages_json_ds(pages, precision=3).take(2)
    for r in js:
        obj = json.loads(r["json"])
        assert obj["doc_id"] == r["doc_id"]
        assert obj["page_number"] == r["page_number"]
        assert all(c["object_type"] == "char" for c in obj["chars"])


def test_heading_underlines_are_lines_and_invisible(ray_session):
    import ray.data as rd

    from pdfplumber_ray.sources.synth_corpus import make_doc_spans
    from pdfplumber_ray.stages.layout import layout_doc
    from pdfplumber_ray.stages.flatten import extract_doc_spans

    # find a doc with a horizontally-rendered heading (short even-length
    # headings render rotated and carry no underline)
    def horizontal_headings(spans):
        return sum(
            1
            for s in spans
            if s["kind"] == "heading"
            and (len(s["text"]) > 24 or len(s["text"]) % 2 == 1)
        )

    for i in range(80):
        spans = make_doc_spans(i, seed=42)
        if horizontal_headings(spans):
            break
    pages = layout_doc(spans)
    n_lines = sum(p["lines"]["x0"].shape[0] for p in pages)
    assert n_lines == horizontal_headings(spans) > 0
    # underline objects never perturb the extracted span sequence
    out = extract_doc_spans(pages)
    assert [(s["kind"], s["text"]) for s in out] == [
        (s["kind"], s["text"]) for s in spans
    ]


def test_curves_to_edges_kernel():
    import numpy as np

    from pdfplumber_ray.functions.geometry import curves_to_edges, filter_edges_mask

    pts = [[(0.0, 0.0), (10.0, 0.0), (10.0, 5.0), (13.0, 9.0)]]
    e = curves_to_edges(pts)
    assert list(e["orientation"]) == ["h", "v", ""]
    assert e["x0"].tolist() == [0.0, 10.0, 10.0]
    assert e["bottom"].tolist() == [0.0, 5.0, 9.0]
    # oblique segments are dropped by the orientation filters
    assert filter_edges_mask(e, orientation="h").sum() == 1
    assert filter_edges_mask(e, orientation="v").sum() == 1


def test_write_objects_csv_file(pages, tmp_path):
    import csv
    import glob

    from pdfplumber_ray.sinks import write_objects_csv

    out = str(tmp_path / "chars_csv")
    write_objects_csv(chars_ds(pages), out, "char", precision=2)
    files = glob.glob(out + "/*")
    assert files
    with open(files[0]) as f:
        rows = list(csv.reader(f))
    assert rows[0][0] == "object_type"
    assert rows[1][0] == "char"
    assert len(rows) > 1


def test_annots_and_hyperlinks(pages):
    """Headings emit contents annotations; media spans emit uri (link)
    annotations; hyperlinks = uri-bearing subset (reference
    page.py:280-323)."""
    from pdfplumber_ray.pipelines import annots_ds, hyperlinks_ds
    from pdfplumber_ray.sources.synth_corpus import (
        KIND_HEADING,
        KIND_MEDIA,
        make_docs_table,
    )

    ann = annots_ds(pages).to_pandas()
    links = hyperlinks_ds(pages).to_pandas()
    docs = make_docs_table(25, seed=9)
    n_heading = n_media = 0
    media_refs = set()
    heading_texts = set()
    for spans in docs.column("spans").to_pylist():
        for s in spans:
            if s["kind"] == KIND_HEADING:
                n_heading += 1
                heading_texts.add(s["text"])
            elif s["kind"] == KIND_MEDIA:
                n_media += 1
                media_refs.add(s["media_ref"])
    assert len(ann) == n_heading + n_media
    got_links = ann[ann.uri != ""]
    assert len(got_links) == n_media
    assert set(got_links.uri) == media_refs
    assert set(ann[ann.uri == ""].contents) == heading_texts
    # hyperlinks == the uri-bearing annots, geometry intact
    assert len(links) == n_media
    assert (links.x1 > links.x0).all() and (links.bottom > links.top).all()
    assert (links.doctop >= links.top).all()


def test_annot_bbox_covers_heading_chars(ray_session):
    """A heading's annot bbox must envelope its glyphs (both upright
    wrapped blocks and rotated short headings)."""
    import pyarrow as pa
    import ray.data

    from pdfplumber_ray.pipelines import annots_ds, chars_ds
    from pdfplumber_ray.schemas import SPAN

    spans = [
        {"kind": "heading", "text": "Short Head", "media_ref": "", "offset": 0},
        {"kind": "heading", "text": "a much longer heading block that wraps " * 3,
         "media_ref": "", "offset": 11},
    ]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(["d1"]), "spans": pa.array([spans], pa.list_(SPAN))})
    )
    pages = decode_pages_ds(docs, PipelineConfig(batch_size=4))
    ann = annots_ds(pages).to_pandas().sort_values("top").reset_index(drop=True)
    ch = chars_ds(pages).to_pandas()
    assert len(ann) == 2
    for _, a in ann.iterrows():
        inside = ch[(ch.top >= a.top - 1e-9) & (ch.bottom <= a.bottom + 1e-9)]
        assert len(inside) > 0
        assert inside.x0.min() >= a.x0 - 1e-9
        assert inside.x1.max() <= a.x1 + 1e-9


def test_element_bbox_matches_pandas_envelope(pages):
    """element_bbox_ds (reference structure.py:464-509) must equal a
    driver-side pandas groupby envelope over the same chars."""
    from pdfplumber_ray.pipelines import element_bbox_ds

    got = (
        element_bbox_ds(pages)
        .to_pandas()
        .sort_values(["doc_id", "mcid"])
        .reset_index(drop=True)
    )
    ch = chars_ds(pages).to_pandas()
    ch = ch[ch.mcid >= 0]
    want = (
        ch.groupby(["doc_id", "mcid"])
        .agg(
            x0=("x0", "min"), top=("top", "min"),
            x1=("x1", "max"), bottom=("bottom", "max"),
            n_chars=("x0", "size"),
        )
        .reset_index()
        .sort_values(["doc_id", "mcid"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got.mcid.values == want.mcid.values).all()
    for col in ("x0", "top", "x1", "bottom"):
        assert np.allclose(got[col].values, want[col].values)
    assert (got.n_chars.values == want.n_chars.values).all()


def test_doc_metadata(ray_session):
    """doc_metadata_ds (reference pdf.py:47-63): Title = first heading,
    typed span census, total char count."""
    import pyarrow as pa
    import ray.data

    from pdfplumber_ray.pipelines import doc_metadata_ds
    from pdfplumber_ray.schemas import SPAN

    spans = [
        {"kind": "text", "text": "intro", "media_ref": "", "offset": 0},
        {"kind": "heading", "text": "The Title", "media_ref": "", "offset": 6},
        {"kind": "heading", "text": "Second", "media_ref": "", "offset": 16},
        {"kind": "media_ref", "text": "", "media_ref": "media://x/0", "offset": 23},
        {"kind": "table_cell", "text": "c1", "media_ref": "", "offset": 24},
    ]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["d1", "d2"]),
                "spans": pa.array([spans, []], pa.list_(SPAN)),
            }
        )
    )
    md = doc_metadata_ds(docs).to_pandas().set_index("doc_id")
    assert md.loc["d1"].title == "The Title"
    assert md.loc["d1"].n_headings == 2
    assert md.loc["d1"].n_media == 1
    assert md.loc["d1"].n_cells == 1
    assert md.loc["d1"].n_spans == 5
    assert md.loc["d1"].n_chars == len("intro") + len("The Title") + len("Second") + len("c1")
    assert md.loc["d2"].title == "" and md.loc["d2"].n_spans == 0


def test_text_boxes_geometry_and_text(pages):
    """PagesToTextBoxes (laparams analogue, reference page.py:402-414):
    every box's bbox envelopes its words and box texts equal the
    paragraph blocks from simple extraction."""
    from pdfplumber_ray.pipelines import text_boxes_ds, words_ds

    tb = text_boxes_ds(pages).to_pandas()
    assert len(tb) > 0
    assert (tb.x1 > tb.x0).all() and (tb.bottom > tb.top).all()
    w = words_ds(pages).to_pandas()
    w = w[w.upright]
    for (did, pn), grp in tb.groupby(["doc_id", "page_number"]):
        pw = w[(w.doc_id == did) & (w.page_number == pn)]
        for _, box in grp.iterrows():
            inside = pw[
                (pw.top >= box.top - 1e-9) & (pw.bottom <= box.bottom + 1e-9)
            ]
            assert len(inside) > 0
            got_words = " ".join(
                inside.sort_values(["top", "x0"]).text.tolist()
            )
            assert got_words.split() == box.text.split()
        # box indexes are 0..n-1 in top order per page
        assert sorted(grp.box_index) == list(range(len(grp)))


def test_char_color_normalization(pages):
    """chars_with_colors_ds (reference page.py:98-118): typed color lists +
    nullable pattern columns; heading font maps to the non-black fill."""
    from pdfplumber_ray.pipelines import chars_with_colors_ds

    ch = chars_with_colors_ds(pages).to_pandas()
    assert {"stroking_color", "non_stroking_color", "stroking_pattern",
            "non_stroking_pattern"} <= set(ch.columns)
    assert ch.non_stroking_pattern.isna().all()
    bold = ch[ch.fontname == "SynthMono-Bold"]
    body = ch[ch.fontname == "SynthMono"]
    assert len(bold) > 0 and len(body) > 0
    assert all(list(c) == [0.0, 0.0, 0.5] for c in bold.non_stroking_color)
    assert all(list(c) == [0.0, 0.0, 0.0] for c in body.non_stroking_color)


def test_curve_objects_flow_without_spurious_tables(ray_session):
    """Curve objects (reference page.py:386-393) cross the Arrow page
    boundary; their diagonal point-pair segments are orientation-filtered
    so decorative curves never produce lattice cells."""
    import pyarrow as pa
    import ray.data

    from pdfplumber_ray.pipelines import extract_spans_ds
    from pdfplumber_ray.schemas import SPAN
    from pdfplumber_ray.stages.decode import SynthDecodePages, arrow_pages_to_dicts

    spans = [
        {"kind": "media_ref", "text": "", "media_ref": "media://d/0", "offset": 0},
        {"kind": "table_cell", "text": "a", "media_ref": "", "offset": 1},
        {"kind": "table_cell", "text": "b", "media_ref": "", "offset": 2},
        {"kind": "table_cell", "text": "c", "media_ref": "", "offset": 3},
        {"kind": "table_cell", "text": "d", "media_ref": "", "offset": 4},
    ]
    t = pa.table(
        {"doc_id": pa.array(["d1"]), "spans": pa.array([spans], pa.list_(SPAN))}
    )
    pages_tbl = SynthDecodePages()(t)
    pages = arrow_pages_to_dicts(pages_tbl)
    curves = [c for _, p in pages for c in p["curves"]]
    assert len(curves) == 1
    assert len(curves[0]["pts"]) == 5
    assert curves[0]["bottom"] > curves[0]["top"]
    # extraction recovers the span sequence exactly (no extra table cells)
    out = extract_spans_ds(ray.data.from_arrow(t)).take_all()[0]
    got = [(s["kind"], s["text"], s["media_ref"]) for s in out["spans"]]
    want = [(s["kind"], s["text"], s["media_ref"]) for s in spans]
    assert got == want


def test_mcid_tag_stamped_on_all_object_kinds(ray_session):
    """Marked-content stamping breadth (reference 0.10.3: mcid/tag on
    char/rect/line/image): chars carry kind tags, cell rects TD + span
    ordinal, images Figure + span ordinal, decorative lines Artifact."""
    import pyarrow as pa
    import ray.data

    from pdfplumber_ray.pipelines import rects_ds
    from pdfplumber_ray.schemas import SPAN
    from pdfplumber_ray.stages.decode import SynthDecodePages, arrow_pages_to_dicts

    spans = [
        {"kind": "heading", "text": "Big Heads", "media_ref": "", "offset": 0},
        {"kind": "text", "text": "body words here", "media_ref": "", "offset": 10},
        {"kind": "table_cell", "text": "a", "media_ref": "", "offset": 26},
        {"kind": "table_cell", "text": "b", "media_ref": "", "offset": 27},
        {"kind": "media_ref", "text": "", "media_ref": "media://d/0", "offset": 28},
    ]
    t = pa.table(
        {"doc_id": pa.array(["d1"]), "spans": pa.array([spans], pa.list_(SPAN))}
    )
    pages_tbl = SynthDecodePages()(t)
    pages = arrow_pages_to_dicts(pages_tbl)
    ch = {k: np.concatenate([np.asarray(p["chars"][k]) for _, p in pages])
          for k in ("tag", "mcid")}
    assert set(ch["tag"]) == {"H", "P", "TD"}
    assert (ch["mcid"][ch["tag"] == "H"] == 0).all()
    images = [img for _, p in pages for img in p["images"]]
    assert images[0]["tag"] == "Figure" and images[0]["mcid"] == 4
    lines = [p["lines"] for _, p in pages if len(p["lines"]["x0"])]
    assert all((l["tag"] == "Artifact").all() for l in lines)
    rects = rects_ds(ray.data.from_arrow(pages_tbl)).to_pandas()
    assert set(rects.tag) == {"TD"}
    assert sorted(rects.mcid) == [2, 3]


def test_curve_path_and_dash(ray_session):
    """curve["path"] / curve["dash"] (reference 0.11.0): drawing commands
    parallel the pts and the dash pattern survives the Arrow boundary."""
    import pyarrow as pa
    import ray.data

    from pdfplumber_ray.pipelines import curves_ds, decode_pages_ds
    from pdfplumber_ray.schemas import SPAN

    spans = [{"kind": "media_ref", "text": "", "media_ref": "media://d/0", "offset": 0}]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(["d"]), "spans": pa.array([spans], pa.list_(SPAN))})
    )
    cur = curves_ds(decode_pages_ds(docs)).take_all()
    assert len(cur) == 1
    c = cur[0]
    cmds = [s["cmd"] for s in c["path"]]
    assert cmds == ["m", "l", "l", "l", "l"]
    assert [s["x"] for s in c["path"]] == [p["x"] for p in c["pts"]]
    assert list(c["dash"]["array"]) == [2.0, 1.0] and c["dash"]["phase"] == 0.0

"""Repair + dead-letter stage (pipelines/repair.py): the engine analogue
of the reference's Ghostscript repair path (reference repair.py:8-54) —
fix what is deterministic, quarantine the rest, never raise."""

import pyarrow as pa

from pdfplumber_ray.pipelines.repair import (
    STATUS_OK,
    STATUS_QUARANTINED,
    STATUS_RECOMPUTED,
    STATUS_SORTED,
    dead_letters_ds,
    repair_doc,
    repair_docs_ds,
    repaired_ds,
)
from pdfplumber_ray.schemas import SPAN


def _span(text, offset):
    return {"kind": "text", "text": text, "media_ref": "", "offset": offset}


def test_repair_doc_rules():
    ok = [_span("a", 0), _span("b", 2), _span("c", 4)]
    assert repair_doc(ok) == (ok, STATUS_OK)

    scrambled = ok[::-1]
    fixed, status = repair_doc(scrambled)
    assert status == STATUS_SORTED
    assert [s["text"] for s in fixed] == ["a", "b", "c"]

    zeroed = [_span("aa", 0), _span("bb", 0), _span("cc", 0)]
    fixed, status = repair_doc(zeroed)
    assert status == STATUS_RECOMPUTED
    assert [s["offset"] for s in fixed] == [0, 3, 6]
    assert [s["text"] for s in fixed] == ["aa", "bb", "cc"]

    assert repair_doc([]) == ([], STATUS_QUARANTINED)

    neg = [_span("a", -5)]
    fixed, status = repair_doc(neg)
    assert status == STATUS_RECOMPUTED
    assert fixed[0]["offset"] == 0


def test_repair_pipeline_split(ray_session):
    import ray.data

    rows = {
        "doc_id": pa.array(["good", "scrambled", "empty"]),
        "spans": pa.array(
            [
                [_span("x", 0), _span("y", 2)],
                [_span("y", 2), _span("x", 0)],
                [],
            ],
            pa.list_(SPAN),
        ),
    }
    docs = ray.data.from_arrow(pa.table(rows))
    rep = repair_docs_ds(docs)
    healthy = repaired_ds(rep).to_pandas()
    dead = dead_letters_ds(rep).to_pandas()
    assert sorted(healthy.doc_id) == ["good", "scrambled"]
    assert list(dead.doc_id) == ["empty"]
    by_id = {r.doc_id: r.spans for r in healthy.itertuples()}
    assert [s["text"] for s in by_id["scrambled"]] == ["x", "y"]


def test_corrupted_adapter_roundtrip(ray_session):
    import ray.data

    from pdfplumber_ray.pipelines import extract_spans_ds
    from pdfplumber_ray.sources.synth_corpus import docs_corrupted_batch

    raw = pa.table(
        {
            "doc_id": pa.array(list(range(9)), pa.int64()),
            "text": pa.array(
                [" ".join(f"w{i}n{j}" for j in range(30)) for i in range(9)]
            ),
        }
    )
    docs = ray.data.from_arrow(docs_corrupted_batch(raw))
    healthy = repaired_ds(repair_docs_ds(docs))
    out = extract_spans_ds(healthy).to_pandas()
    out["key"] = out.doc_id.str.rsplit("-", n=1).str[1].astype(int)
    out = out.sort_values("key").reset_index(drop=True)
    texts = [" ".join(s["text"] for s in spans) for spans in out.spans]
    assert texts == raw.column("text").to_pylist()


def test_rewrite_pdf_heals_broken_xref():
    """pdfio/rewrite.py: a PDF with a scrambled xref/startxref decodes
    via scan recovery; the rewritten output has EXACT offsets (strict
    check: every xref entry points at 'N 0 obj') and decodes to the
    same text."""
    import re

    from pdfplumber_ray.pdfio.reader import decode_pdf_doc
    from pdfplumber_ray.pdfio.rewrite import rewrite_pdf

    path = "/root/reference/tests/pdfs/pdffill-demo.pdf"
    data = open(path, "rb").read()
    # corrupt: point startxref at garbage and stomp the first xref entry
    broken = re.sub(rb"startxref\s+\d+", b"startxref\n999999999", data)
    rows_orig, err = decode_pdf_doc("d", data)
    assert err is None
    rows_broken, err_b = decode_pdf_doc("d", broken)
    assert err_b is None  # scan recovery already handles it

    fixed = rewrite_pdf(broken)
    rows_fixed, err_f = decode_pdf_doc("d", fixed)
    assert err_f is None
    t = lambda rows: ["".join(c["text"] for c in r["chars"]) for r in rows]
    assert t(rows_fixed) == t(rows_orig)

    # strict structural check on the rewritten file: xref offsets exact
    m = re.search(rb"xref\n0 (\d+)\n", fixed)
    assert m
    nobjs = int(m.group(1))
    table_at = m.end()
    for i in range(nobjs):
        entry = fixed[table_at + i * 20 : table_at + (i + 1) * 20]
        off, gen, kind = entry.split()
        if kind == b"n":
            assert fixed[int(off) :].startswith(b"%d 0 obj" % i)


def test_rewrite_pdf_strips_encryption(ray_session):
    """An RC4-encrypted document rewrites to an unencrypted file that
    opens with NO password and yields the same chars."""
    from pdfplumber_ray.pdfio.reader import decode_pdf_doc
    from pdfplumber_ray.pdfio.rewrite import rewrite_pdf

    path = "/root/reference/tests/pdfs/password-example.pdf"
    data = open(path, "rb").read()
    rows_orig, err = decode_pdf_doc("d", data, password="test")
    assert err is None
    fixed = rewrite_pdf(data, password="test")
    assert b"/Encrypt" not in fixed
    rows_fixed, err_f = decode_pdf_doc("d", fixed)  # no password
    assert err_f is None
    t = lambda rows: ["".join(c["text"] for c in r["chars"]) for r in rows]
    assert t(rows_fixed) == t(rows_orig)


def test_repair_pdf_docs_ds(ray_session):
    """The distributed repair stage: good docs rewrite, garbage docs
    dead-letter without failing the block."""
    import pyarrow as pa
    import ray

    from pdfplumber_ray.pipelines.repair import repair_pdf_docs_ds

    good = open("/root/reference/tests/pdfs/pdffill-demo.pdf", "rb").read()
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["good", "garbage"]),
                "pdf_bytes": pa.array([good, b"not a pdf at all"], pa.binary()),
            }
        )
    )
    out = {r["doc_id"]: r for r in repair_pdf_docs_ds(docs).take_all()}
    assert out["good"]["repair_status"] == "rewritten"
    assert out["good"]["pdf_bytes"][:5] == b"%PDF-"
    assert out["garbage"]["repair_status"] == "quarantined"
    assert out["garbage"]["error"]


def test_scan_recovery_encrypted_xref_stream_doc():
    """pr-138 is an encrypted pure-xref-stream file: with startxref
    corrupted, scan recovery must find /Encrypt in the XRef stream dict
    and re-expand object streams post-decryption — full char parity."""
    import re

    from pdfplumber_ray.pdfio.reader import decode_pdf_doc

    data = open("/root/reference/tests/pdfs/pr-138-example.pdf", "rb").read()
    broken = re.sub(rb"startxref\s+\d+", b"startxref\n999999999", data)
    rows1, err1 = decode_pdf_doc("d", data)
    rows2, err2 = decode_pdf_doc("d", broken)
    assert err1 is None and err2 is None
    assert sum(len(r["chars"]) for r in rows1) == 10635
    t = lambda rows: ["".join(c["text"] for c in r["chars"]) for r in rows]
    assert t(rows1) == t(rows2)


def test_serialize_object_roundtrip_property():
    """Property: serialize_object output re-parses to an equal value for
    arbitrary COS object graphs (names, numbers, strings, refs, nested
    arrays/dicts)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdfplumber_ray.pdfio.rewrite import serialize_object
    from pdfplumber_ray.pdfio.syntax import Parser, PDFRef

    names = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=8,
    )
    scalars = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-2**31, max_value=2**31),
        st.floats(
            allow_nan=False, allow_infinity=False, width=32,
            min_value=-1e10, max_value=1e10,
        ),
        st.binary(max_size=16),
        names,
        st.builds(
            PDFRef,
            st.integers(min_value=1, max_value=99999),
            st.integers(min_value=0, max_value=99),
        ),
    )
    objects = st.recursive(
        scalars,
        lambda inner: st.one_of(
            st.lists(inner, max_size=4),
            st.dictionaries(names, inner, max_size=4),
        ),
        max_leaves=12,
    )

    def eq(a, b):
        if isinstance(a, PDFRef):
            return isinstance(b, PDFRef) and (a.num, a.gen) == (b.num, b.gen)
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            # PDF reals carry no exponent form; compare at the writer's
            # 12-significant-digit decimal precision
            return fa == fb or abs(fa - fb) <= 1e-11 * max(abs(fa), abs(fb), 1.0)
        if isinstance(a, list):
            return (
                isinstance(b, list)
                and len(a) == len(b)
                and all(eq(x, y) for x, y in zip(a, b))
            )
        if isinstance(a, dict):
            return (
                isinstance(b, dict)
                and a.keys() == b.keys()
                and all(eq(a[k], b[k]) for k in a)
            )
        return a == b

    @settings(max_examples=200, deadline=None)
    @given(objects)
    def check(obj):
        data = serialize_object(obj)
        parsed = Parser(data, 0).parse_object()
        assert eq(obj, parsed), (obj, data, parsed)

    check()

"""CLI (pdfplumber_ray/cli.py) — the reference cli.py analogue: csv /
json / structure-text dumps with --types, --pages, --precision."""

import csv
import io
import json
import os

import pytest


@pytest.fixture(scope="module")
def corpus_dir(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    from pdfplumber_ray.sources.synth_corpus import make_docs_table

    d = tmp_path_factory.mktemp("cli_corpus")
    pq.write_table(make_docs_table(12, seed=3), str(d / "docs.parquet"))
    return str(d)


def _run_cli(argv, capsys):
    from pdfplumber_ray.cli import main

    assert main(argv) == 0
    return capsys.readouterr().out


def test_cli_csv_stdout(corpus_dir, capsys):
    out = _run_cli([corpus_dir, "--format", "csv", "--types", "char"], capsys)
    rows = list(csv.DictReader(io.StringIO(out)))
    assert len(rows) > 0
    assert rows[0]["object_type"] == "char"
    # reference column contract: object_type first, then geometry prepends
    header = out.splitlines()[0].split(",")
    assert header[0] == "object_type"
    assert header.index("x0") < header.index("fontname")


def test_cli_csv_output_dir_and_types(corpus_dir, tmp_path, capsys):
    outdir = str(tmp_path / "dump")
    _run_cli(
        [corpus_dir, "--format", "csv", "--types", "word", "annot",
         "--output", outdir],
        capsys,
    )
    assert os.listdir(f"{outdir}/word")
    assert os.listdir(f"{outdir}/annot")


def test_cli_json_precision_and_pages(corpus_dir, capsys):
    out = _run_cli(
        [corpus_dir, "--format", "json", "--precision", "2", "--pages", "1"],
        capsys,
    )
    pages = [json.loads(line) for line in out.splitlines()]
    assert len(pages) > 0
    assert all(p["page_number"] == 1 for p in pages)
    for p in pages[:3]:
        for c in p["chars"][:5]:
            assert round(c["x0"], 2) == c["x0"]


def test_cli_structure_text(corpus_dir, capsys):
    out = _run_cli([corpus_dir, "--format", "structure-text"], capsys)
    rows = list(csv.DictReader(io.StringIO(out)))
    assert len(rows) > 0
    assert {"doc_id", "mcid", "text"} <= set(rows[0])


def test_cli_csv_curves(corpus_dir, capsys):
    out = _run_cli([corpus_dir, "--format", "csv", "--types", "curve"], capsys)
    rows = list(csv.DictReader(io.StringIO(out)))
    assert len(rows) > 0
    assert rows[0]["object_type"] == "curve"
    assert "pts" not in rows[0] and "path" not in rows[0] and "dash" not in rows[0]


def test_cli_real_pdf_input(ray_session, capsys):
    """The reference CLI's input mode: a real PDF path straight in
    (reference cli.py takes a PDF file; here it streams through the
    pdfio decode stage into the same dump pipeline)."""
    pdf = "/root/reference/tests/pdfs/pdffill-demo.pdf"
    if not os.path.exists(pdf):
        pytest.skip("reference corpus not available")
    out = _run_cli([pdf, "--format", "csv", "--types", "char", "--pages", "1"], capsys)
    rows = list(csv.DictReader(io.StringIO(out)))
    assert rows and rows[0]["object_type"] == "char"
    text = "".join(r["text"] for r in rows)
    assert "PDFill" in text
    # json mode over the same PDF
    out = _run_cli([pdf, "--format", "json", "--pages", "1"], capsys)
    page = json.loads(out.splitlines()[0])
    assert page["page_number"] == 1 and len(page["chars"]) > 100


def test_cli_png_output(corpus_dir, tmp_path, capsys):
    """--format png: one PNG file per page under --output."""
    from pdfplumber_ray.cli import main

    out_dir = str(tmp_path / "pngs")
    assert main([corpus_dir, "--format", "png", "--output", out_dir]) == 0
    files = sorted(os.listdir(out_dir))
    assert files and all(f.endswith(".png") for f in files)
    data = open(os.path.join(out_dir, files[0]), "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_cli_png_stdout(corpus_dir, capsys):
    """--format png without --output streams the first page's PNG."""
    import sys as _sys

    from pdfplumber_ray.cli import main

    class _Buf:
        def __init__(self):
            self.data = b""

        def write(self, b):
            self.data += b

    buf = _Buf()
    real = _sys.stdout
    # capsys wraps sys.stdout without a usable .buffer; swap in a shim
    class _Out:
        buffer = buf

        def write(self, s):
            return real.write(s)

    _sys.stdout = _Out()
    try:
        assert main([corpus_dir, "--format", "png", "--pages", "1"]) == 0
    finally:
        _sys.stdout = real
    assert buf.data[:8] == b"\x89PNG\r\n\x1a\n"


def test_cli_include_exclude_attrs(corpus_dir, capsys):
    """Reference cli.py --include-attrs/--exclude-attrs."""
    out = _run_cli(
        [corpus_dir, "--format", "csv", "--types", "char",
         "--include-attrs", "page_number"],
        capsys,
    )
    rows = list(csv.DictReader(io.StringIO(out)))
    assert set(rows[0].keys()) == {"object_type", "page_number"}
    out = _run_cli(
        [corpus_dir, "--format", "csv", "--types", "char",
         "--exclude-attrs", "text"],
        capsys,
    )
    rows = list(csv.DictReader(io.StringIO(out)))
    assert "text" not in rows[0]


def test_cli_repair(tmp_path, capsys):
    from pdfplumber_ray.cli import main

    out_dir = str(tmp_path / "repaired")
    rc = main(
        ["/root/reference/tests/pdfs/pdffill-demo.pdf", "--repair",
         "--output", out_dir]
    )
    assert rc == 0
    data = open(os.path.join(out_dir, "pdffill-demo.pdf"), "rb").read()
    assert data[:5] == b"%PDF-"


def test_cli_laparams_textbox_and_json_indent(ray_session, tmp_path, capsys):
    from pdfplumber_ray import cli

    pdf = "/root/reference/tests/pdfs/issue-13-151201DSP-Fond-581-90D.pdf"
    rc = cli.main([pdf, "--format", "csv", "--types", "textbox", "--laparams", "{}"])
    assert rc == 0
    out = capsys.readouterr().out
    header = out.splitlines()[0]
    assert "flow_index" in header and "text" in header
    # reading order starts at the page title (flow_index 0 exists)
    assert ",0,True," in out or ",0,False," in out
    # textbox without --laparams is rejected (layout objects need laparams)
    rc = cli.main([pdf, "--format", "csv", "--types", "textbox"])
    assert rc == 2
    # --indent pretty-prints the JSON dump
    rc = cli.main([pdf, "--format", "json", "--indent", "2", "--pages", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("{\n  ")

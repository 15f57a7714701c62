"""Command-line interface — the engine's analogue of the reference CLI
(reference cli.py:20-120): dump decoded objects as CSV or nested page
JSON, or the structure text join, from an interleaved-doc corpus.

    python -m pdfplumber_ray.cli INPUT_DIR --format csv --types char word \
        [--pages 1 2] [--precision 3] [--output OUT_DIR]

With ``--output`` the dump is a distributed ``write_csv``/``write_json``
(one file per block — the scale path). Without it, results are collected
to stdout like the reference — a debugging convenience for small inputs
only. Owns its Ray session only when run as a script (guarded init).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


TYPE_CHOICES = (
    "char", "word", "annot", "curve", "text_box", "textline", "textbox"
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pdfplumber_ray.cli")
    p.add_argument(
        "input",
        help="dir of DOCS-schema parquet shards, or a PDF file / dir of "
        "PDFs (detected by extension — the reference CLI's input mode)",
    )
    p.add_argument(
        "--password", default="", help="password for encrypted PDF inputs"
    )
    p.add_argument(
        "--format", choices=("csv", "json", "structure-text", "png"),
        default="csv",
    )
    p.add_argument(
        "--types", nargs="+", choices=TYPE_CHOICES, default=["char"],
        help="object types for --format csv (reference cli.py --types)",
    )
    p.add_argument("--pages", nargs="+", type=int, default=None)
    p.add_argument(
        "--precision", type=int, default=None,
        help="float rounding (reference Serializer precision)",
    )
    p.add_argument(
        "--laparams", type=None, default=None,
        help="JSON LAParams dict (reference cli.py --laparams); enables "
        "the 'textline'/'textbox' layout-analysis types on PDF inputs",
    )
    p.add_argument(
        "--indent", type=int, default=None,
        help="indent level for JSON pretty-printing (reference cli.py)",
    )
    p.add_argument(
        "--include-attrs", nargs="+", default=None,
        help="only these columns in csv output (reference cli.py)",
    )
    p.add_argument(
        "--exclude-attrs", nargs="+", default=None,
        help="drop these columns from csv output (reference cli.py)",
    )
    p.add_argument("--output", default=None, help="output dir (distributed write)")
    p.add_argument(
        "--repair", action="store_true",
        help="structurally rewrite PDF inputs (gs-repair analogue) into "
        "--output instead of dumping objects",
    )
    return p


def _is_pdf_input(path: str) -> bool:
    import os

    if path.lower().endswith(".pdf"):
        return True
    if os.path.isdir(path):
        try:
            entries = os.listdir(path)
        except OSError:
            return False
        return bool(entries) and all(
            e.lower().endswith(".pdf") for e in entries if not e.startswith(".")
        )
    return False


def _pages_ds(args):
    from .pipelines import decode_pages_ds, read_docs

    if _is_pdf_input(args.input):
        # real-PDF front door (reference cli.py takes a PDF path)
        import pyarrow.compute as pc

        from .pdfio import read_pdf_corpus

        def drop_quarantined(batch):
            # surface dead-lettered docs (encrypted/broken) on stderr instead
            # of emitting them as empty zero-size page rows
            err = batch.column("error")
            bad = batch.filter(pc.is_valid(err))
            for did, msg in zip(
                bad.column("doc_id").to_pylist(), bad.column("error").to_pylist()
            ):
                print(f"pdfplumber-ray: skipping {did}: {msg}", file=sys.stderr)
            return batch.filter(pc.is_null(err)).drop_columns(["error"])

        pages = read_pdf_corpus(args.input, password=args.password).map_batches(
            drop_quarantined, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        pages = decode_pages_ds(read_docs(args.input))
    if args.pages:
        import pyarrow as pa
        import pyarrow.compute as pc

        wanted = pa.array(list(args.pages), pa.int32())

        def keep(batch: "pa.Table") -> "pa.Table":
            return batch.filter(
                pc.is_in(batch.column("page_number"), value_set=wanted)
            )

        pages = pages.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return pages


def _laparams_objects_ds(pages, typ: str, la: dict):
    """textline/textbox rows via the published layout analysis over the
    decoded char stream (reference: laparams adds LT* container objects
    to page.objects)."""
    import pyarrow as pa

    from .pdfio.laparams import LAParams, analyze_chars
    from .stages.decode import arrow_pages_to_dicts

    lp = LAParams(**la)

    def fn(batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, page in arrow_pages_to_dicts(batch):
            chars = page.get("chars") or []
            if isinstance(chars, dict):
                keys = list(chars.keys())
                chars = [
                    {k: chars[k][i] for k in keys}
                    for i in range(len(chars["text"]))
                ]
            lines, boxes = analyze_chars(chars, page["page_height"], lp)
            recs = lines if typ == "textline" else boxes
            for r in recs:
                rows.append(
                    {
                        "doc_id": doc_id,
                        "page_number": int(page["page_number"]),
                        "horizontal": bool(r["horizontal"]),
                        "x0": float(r["x0"]),
                        "x1": float(r["x1"]),
                        "top": float(r["top"]),
                        "bottom": float(r["bottom"]),
                        "text": r["text"],
                        "flow_index": int(r.get("flow_index", -1)),
                    }
                )
        return pa.table(
            {
                k: pa.array([r[k] for r in rows], t)
                for k, t in (
                    ("doc_id", pa.string()), ("page_number", pa.int64()),
                    ("horizontal", pa.bool_()), ("x0", pa.float64()),
                    ("x1", pa.float64()), ("top", pa.float64()),
                    ("bottom", pa.float64()), ("text", pa.string()),
                    ("flow_index", pa.int64()),
                )
            }
        )

    return pages.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _objects_ds(pages, typ: str, laparams=None):
    from .pipelines import annots_ds, chars_ds, curves_ds, text_boxes_ds, words_ds

    if typ in ("textline", "textbox"):
        return _laparams_objects_ds(pages, typ, laparams or {})
    if typ == "char":
        return chars_ds(pages)
    if typ == "word":
        return words_ds(pages)
    if typ == "annot":
        return annots_ds(pages)
    if typ == "curve":
        # nested pts/path/dash are not CSV-serializable; dump scalar columns
        return curves_ds(pages).drop_columns(["pts", "path", "dash"])
    return text_boxes_ds(pages)


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    if args.laparams is not None:
        import json as _json

        args.laparams = _json.loads(args.laparams)
    if any(t in ("textline", "textbox") for t in args.types) and args.laparams is None:
        print(
            "types textline/textbox require --laparams (layout objects "
            "exist only under layout analysis, as in the reference)",
            file=sys.stderr,
        )
        return 2

    from .sinks import objects_csv_ds, pages_json_ds

    if args.repair:
        if not _is_pdf_input(args.input):
            print("--repair needs a PDF file or directory input", file=sys.stderr)
            return 2
        if not args.output:
            print("--repair needs --output", file=sys.stderr)
            return 2
        import os

        import ray.data

        from .pipelines.repair import repair_pdf_docs_ds

        paths = (
            [args.input]
            if args.input.lower().endswith(".pdf")
            else [
                os.path.join(args.input, n)
                for n in sorted(os.listdir(args.input))
                if n.lower().endswith(".pdf")
            ]
        )
        docs = ray.data.read_binary_files(paths, include_paths=True)

        def to_docs(batch):
            import pyarrow as pa

            return pa.table(
                {
                    "doc_id": pa.array(
                        [os.path.basename(p) for p in batch.column("path").to_pylist()]
                    ),
                    "pdf_bytes": batch.column("bytes"),
                }
            )

        repaired = repair_pdf_docs_ds(
            docs.map_batches(to_docs, batch_format="pyarrow", zero_copy_batch=True),
            password=args.password,
        )
        os.makedirs(args.output, exist_ok=True)
        n_ok = n_bad = 0
        for row in repaired.iter_rows():
            if row["repair_status"] == "rewritten":
                with open(os.path.join(args.output, row["doc_id"]), "wb") as f:
                    f.write(row["pdf_bytes"])
                n_ok += 1
            else:
                print(
                    f"pdfplumber-ray: quarantined {row['doc_id']}: {row['error']}",
                    file=sys.stderr,
                )
                n_bad += 1
        print(f"repaired {n_ok}, quarantined {n_bad}", file=sys.stderr)
        return 0

    pages = _pages_ds(args)
    if args.format == "csv":
        for typ in args.types:
            ds = objects_csv_ds(
                _objects_ds(pages, typ, args.laparams), typ,
                precision=args.precision,
                include_attrs=args.include_attrs,
                exclude_attrs=args.exclude_attrs,
            )
            if args.output:
                ds.write_csv(f"{args.output}/{typ}")
            else:
                ds.to_pandas().to_csv(sys.stdout, index=False)
    elif args.format == "json":
        ds = pages_json_ds(pages, precision=args.precision, indent=args.indent)
        if args.output:
            ds.write_json(args.output)
        else:
            for row in ds.take_all():
                sys.stdout.write(row["json"] + "\n")
    elif args.format == "png":
        # page debug rasters (reference Page.to_image + PageImage.save):
        # one PNG per page under --output, or the first page's bytes to
        # stdout when no output dir is given
        from .display import page_images_batch

        imgs = pages.map_batches(
            page_images_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        if args.output:
            import os

            os.makedirs(args.output, exist_ok=True)

            def write_pngs(batch):
                import pyarrow as pa

                for did, pn, png in zip(
                    batch.column("doc_id").to_pylist(),
                    batch.column("page_number").to_pylist(),
                    batch.column("png").to_pylist(),
                ):
                    safe = "".join(
                        c if c.isalnum() or c in "-_." else "_" for c in did
                    )
                    if safe != did:
                        # sanitization is lossy ('a/b' and 'a:b' both map
                        # to 'a_b') — disambiguate with a content hash of
                        # the ORIGINAL id; deterministic across workers
                        import hashlib

                        safe += "-" + hashlib.md5(did.encode()).hexdigest()[:8]
                    with open(
                        f"{args.output}/{safe}-p{pn}.png", "wb"
                    ) as f:
                        f.write(png)
                return pa.table(
                    {"n": pa.array([batch.num_rows], pa.int64())}
                )

            n = imgs.map_batches(
                write_pngs, batch_format="pyarrow", zero_copy_batch=True
            ).sum("n")
            print(f"wrote {n} page images to {args.output}", file=sys.stderr)
        else:
            first = imgs.take(1)
            if first:
                sys.stdout.buffer.write(first[0]["png"])
    else:  # structure-text (reference cli.py:72-91)
        from .pipelines.extract import mcid_text_ds

        ds = mcid_text_ds(pages)
        if args.output:
            ds.write_csv(args.output)
        else:
            ds.to_pandas().to_csv(sys.stdout, index=False)
    return 0


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        raise SystemExit(main())
    finally:
        ray.shutdown()

"""Pure-Python PDF byte decoder — the engine's real-PDF front door.

The reference delegates byte-level decode to pdfminer.six
(reference pdf.py:65-108, page.py:265-277); pdfminer is not installable in
this environment, so this package implements the subset of ISO 32000
needed to decode real PDF corpora into the engine's PAGES schema:

- ``syntax``    — object lexer/parser (names, strings, dicts, arrays, refs)
- ``filters``   — stream filters (Flate + PNG predictors, AHx, A85, RL, LZW)
- ``document``  — xref tables & streams, object streams, page tree, metadata
- ``fonts``     — simple & CID fonts: widths, encodings, ToUnicode CMaps
- ``interp``    — content-stream interpreter emitting char/line/rect/curve/
                  image records with pdfminer-equivalent geometry
- ``reader``    — the Ray Data stage: (doc_id, pdf_bytes) -> PAGES rows

Geometry parity: char bboxes/advances follow pdfminer.six's documented
layout model (LTChar: adv = width*size*scaling; bbox from font descent +
rise transformed by the text matrix) so the downstream word/textmap/table
kernels reproduce the reference's golden outputs byte-for-byte (verified
against reference tests/comparisons fixtures in tests/test_real_pdf.py).
"""

from .document import PDFDocument  # noqa: F401
from .reader import decode_pdf_batch, decode_pdf_doc, read_pdf_corpus  # noqa: F401

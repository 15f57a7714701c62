"""Page geometry -> ordered output spans (the north-rule flattening).

Pure extraction: consumes only the decoded object tables (chars with
font/size, rects, images) and reconstructs the document's span sequence
using the same kernels the operator API exposes —

* lattice table detection over rect edges (reference table.py:566-578 chain)
  with per-cell text extraction (table.py:399-435),
* word assembly via the x/y-tolerance char clustering
  (reference utils/text.py:423-688),
* line clustering + paragraph grouping by vertical gap
  (reference utils/clustering.py:9-26 applied to line tops),
* heading classification by glyph size,
* media spans from image objects at their geometric position.

No information flows from the input span structs; round-trip equality with
them is the correctness gate (BASELINE.json north_rule: span-sequence
equality ``(kind, text, media_ref, order)``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import SynthLayoutConfig, TableConfig, WordConfig
from ..functions.clustering import cluster_ids
from ..functions.geometry import concat_edges, midpoint_in_bbox_mask, rects_to_edges
from ..functions.tables import find_tables_page
from ..functions.words import extract_words_page
from ..sources.synth_corpus import assign_offsets
from .layout import PageDict


def page_tables(
    page: PageDict, table_cfg: TableConfig
) -> List[Tuple[Tuple[float, float, float, float], List[str]]]:
    """Detected tables on one page -> [(bbox, row-major cell texts)]."""
    rects = page["rects"]
    if rects["x0"].shape[0] == 0:
        return []
    edges = concat_edges([rects_to_edges(rects)])
    bbox = (0.0, 0.0, page["page_width"], page["page_height"])
    chars = page["chars"]
    tables = find_tables_page(
        edges,
        table_cfg,
        bbox,
        words_provider=lambda: extract_words_page(chars, WordConfig()),
    )
    out = []
    for t in tables:
        cells = [c for row in t.extract(chars) for c in row if c is not None]
        out.append((t.bbox, cells))
    # reading order: top-left first (cells_to_tables already sorts groups,
    # but order defensively by geometric position)
    out.sort(key=lambda bc: (bc[0][1], bc[0][0]))
    return out


def page_text_blocks(
    page: PageDict,
    table_bboxes: Sequence[Tuple[float, float, float, float]],
    word_cfg: WordConfig,
    synth_cfg: SynthLayoutConfig,
) -> List[Tuple[float, str, str]]:
    """Non-table text -> [(doctop, kind, text)] paragraph blocks."""
    chars = page["chars"]
    n = chars["x0"].shape[0]
    if n == 0:
        return []
    keep = np.ones(n, dtype=bool)
    for bbox in table_bboxes:
        keep &= ~midpoint_in_bbox_mask(
            chars["x0"], chars["top"], chars["x1"], chars["bottom"], bbox
        )
    if not keep.any():
        return []
    sub = {k: np.asarray(v)[keep] for k, v in chars.items()}
    words = extract_words_page(sub, word_cfg)
    nw = words["text"].shape[0]
    if nw == 0:
        return []

    line_ids = cluster_ids(words["top"], float(word_cfg.y_tolerance))
    order = np.lexsort((words["x0"], line_ids))
    heading_cut = (synth_cfg.body_size + synth_cfg.heading_size) / 2.0

    blocks: List[Tuple[float, str, str]] = []
    cur_lines: List[List[str]] = []
    cur_doctop = 0.0
    cur_heading = False
    prev_top: Optional[float] = None
    prev_line = -1

    def flush() -> None:
        if cur_lines:
            text = " ".join(" ".join(line) for line in cur_lines)
            blocks.append((cur_doctop, "heading" if cur_heading else "text", text))

    for i in order:
        top = float(words["top"][i])
        lid = int(line_ids[i])
        if lid != prev_line:
            new_block = prev_top is None or (
                top - prev_top > synth_cfg.para_gap_threshold
            )
            if new_block:
                flush()
                cur_lines = []
                cur_doctop = float(words["doctop"][i])
                cur_heading = float(words["height"][i]) >= heading_cut
            cur_lines.append([])
            prev_top = top
            prev_line = lid
        cur_lines[-1].append(str(words["text"][i]))
    flush()
    return blocks


def extract_doc_spans(
    pages: Sequence[PageDict],
    word_cfg: Optional[WordConfig] = None,
    table_cfg: Optional[TableConfig] = None,
    synth_cfg: Optional[SynthLayoutConfig] = None,
) -> List[Dict]:
    """Ordered span records for one document (all pages, in page order)."""
    word_cfg = word_cfg or WordConfig()
    table_cfg = table_cfg or TableConfig()
    synth_cfg = synth_cfg or SynthLayoutConfig()

    # items: (doctop, seq, kind, payload)
    items: List[Tuple[float, str, object]] = []
    for page in pages:
        idt = float(page["initial_doctop"])
        tabs = page_tables(page, table_cfg)
        for bbox, cells in tabs:
            items.append((idt + bbox[1], "table", cells))
        for doctop, kind, text in page_text_blocks(
            page, [b for b, _ in tabs], word_cfg, synth_cfg
        ):
            items.append((doctop, kind, text))
        for img in page["images"]:
            items.append((idt + float(img["top"]), "media_ref", img["media_ref"]))

    items.sort(key=lambda it: it[0])

    kinds: List[str] = []
    texts: List[str] = []
    media: List[str] = []
    for _, kind, payload in items:
        if kind == "table":
            for cell in payload:  # type: ignore[union-attr]
                kinds.append("table_cell")
                texts.append(cell)
                media.append("")
        elif kind == "media_ref":
            kinds.append("media_ref")
            texts.append("")
            media.append(str(payload))
        else:
            kinds.append(kind)
            texts.append(str(payload))
            media.append("")
    offsets = assign_offsets(texts)
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": o}
        for k, t, m, o in zip(kinds, texts, media, offsets)
    ]

from .extract import (  # noqa: F401
    read_docs,
    extract_spans_ds,
    decode_pages_ds,
    chars_ds,
    annots_ds,
    hyperlinks_ds,
    chars_with_colors_ds,
    curves_ds,
    rects_ds,
    words_ds,
    page_text_ds,
    search_ds,
    tables_ds,
    split_errors,
    crop_ds,
    dedupe_chars_ds,
    duplicate_chars_ds,
    text_lines_ds,
    outline_ds,
    element_bbox_ds,
    doc_metadata_ds,
    text_boxes_ds,
)
from . import analytics  # noqa: F401
from . import corpus_ops  # noqa: F401
from . import graph  # noqa: F401
from . import media  # noqa: F401

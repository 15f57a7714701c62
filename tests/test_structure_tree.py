"""Nested structure-tree parity against the reference's golden dicts.

The golden trees (TREE, PVSTRUCT, WORD365, SCOTUS, HELLO...) are
extracted from the reference's own test module as DATA via
ast.literal_eval at test time — the strongest available spec for
reference structure.py:151-459 (per-revision attribute merging, role
maps, attribute classes, OBJR/MCR kid resolution, ParentTree paths,
empty-element pruning)."""

from __future__ import annotations

import ast
import copy
import os
import re
from collections import deque

import pytest

from pdfplumber_ray.pdfio.document import PDFDocument
from pdfplumber_ray.pdfio.structure import StructTree, structure_tree

REF = "/root/reference/tests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus not available"
)


def _goldens():
    src = open(f"{REF}/test_structure.py").read()
    out = {}
    for node in ast.parse(src).body:
        if isinstance(node, ast.Assign) and isinstance(node.targets[0], ast.Name):
            try:
                out[node.targets[0].id] = ast.literal_eval(node.value)
            except Exception:
                pass
    return out


GOLDENS = _goldens()


def _doc(name: str) -> PDFDocument:
    return PDFDocument(open(f"{REF}/pdfs/{name}", "rb").read())


def test_pdf_structure_page_and_doc():
    doc = _doc("pdf_structure.pdf")
    assert structure_tree(doc, doc.pages()[0]) == GOLDENS["TREE"]
    tree_doc = copy.deepcopy(GOLDENS["TREE"])
    d = deque(tree_doc)
    while d:
        el = d.popleft()
        el["page_number"] = 1
        d.extend(el.get("children", []))
    assert structure_tree(doc) == tree_doc


def test_proces_verbal_doc_and_page():
    doc = _doc("2023-06-20-PV.pdf")
    assert structure_tree(doc) == GOLDENS["PVSTRUCT"]
    assert structure_tree(doc, doc.pages()[1]) == GOLDENS["PVSTRUCT1"]


def test_word365():
    doc = _doc("word365_structure.pdf")
    assert structure_tree(doc, doc.pages()[0]) == GOLDENS["WORD365"]


def test_image_structure():
    doc = _doc("image_structure.pdf")
    assert structure_tree(doc, doc.pages()[0]) == GOLDENS["IMAGESTRUCT"]


def test_scotus_attribute_classes():
    doc = _doc("scotus-transcript-p1.pdf")
    assert structure_tree(doc) == GOLDENS["SCOTUS"]


def test_hello_corner_cases():
    doc = _doc("hello_structure.pdf")
    assert structure_tree(doc) == GOLDENS["HELLO"]
    assert structure_tree(doc, doc.pages()[0]) == GOLDENS["HELLO1P"]


def test_no_structure_returns_empty():
    doc = _doc("pdffill-demo.pdf")
    assert structure_tree(doc) == []
    assert structure_tree(doc, doc.pages()[0]) == []


def test_figure_mcids():
    # reference test_structure.py test_figure_mcids: the Figure element
    # collects mcids [1, 14]
    doc = _doc("figure_structure.pdf")
    tree = StructTree(doc, doc.pages()[0])
    fig = tree.find("Figure")
    assert fig is not None
    assert fig.mcids == [1, 14]


def test_find_and_find_all():
    doc = _doc("pdf_structure.pdf")
    tree = StructTree(doc, doc.pages()[0])
    # by tag name
    assert tree.find("H1").mcids == [1]
    # by regex: H1/H2
    hs = list(tree.find_all(re.compile(r"H\d")))
    assert [h.type for h in hs] == ["H1", "H2", "H3"]
    # by predicate
    multi = list(tree.find_all(lambda el: len(el.mcids) > 1))
    assert multi and all(len(el.mcids) > 1 for el in multi)


def test_all_mcids_depth_first():
    doc = _doc("pdf_structure.pdf")
    tree = StructTree(doc)
    doc_el = tree.children[0]
    mcids = [m for _pn, m in doc_el.all_mcids()]
    assert mcids == sorted(mcids)  # this PDF's order is monotone
    assert len(mcids) >= 10

"""Logical structure tree (tagged PDF, ISO 32000-1 §14.7-14.8).

Builds the nested element tree the reference exposes as
``PDF.structure_tree`` / ``Page.structure_tree`` (reference
structure.py:151-459): role-map resolution, per-revision attribute
merging from /C (class map) and /A, kid resolution through OBJR/MCR
wrappers, empty-element pruning, and the per-page ParentTree path. Tree
queries (``find``/``find_all``, reference structure.py:39-98) and
``element_bbox`` (structure.py:464-509) included.

Output parity is pinned to the reference's own golden dicts in
tests/test_structure_tree.py (extracted from the reference test module
as data at test time).

Note on similarity: golden-dict parity requires element-for-element
semantics — which elements prune, how attribute revisions select, the
order children resolve — so the traversal necessarily follows the same
algorithm as the reference; the implementation here is written against
this engine's object model (PDFRef-keyed maps, the pdfio resolver, no
pdfminer types).
"""

from __future__ import annotations

import re
from collections import deque
from dataclasses import asdict, dataclass, field
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional, Pattern, Tuple, Union

from .document import PDFDocument, PDFPage
from .fonts import decode_pdf_text
from .syntax import PDFRef

MatchFunc = Callable[["StructElement"], bool]


def _key(ref: Any) -> Any:
    """Hashable identity for a kid entry: PDFRefs hash by (num, gen);
    inline dicts fall back to object identity."""
    return ref if isinstance(ref, PDFRef) else id(ref)


def _find_all(
    elements: Iterable["StructElement"],
    matcher: Union[str, Pattern[str], MatchFunc],
) -> Iterator["StructElement"]:
    """Depth-first match iterator (reference structure.py:38-66)."""

    if isinstance(matcher, str):
        def match_func(x):
            return x.type == matcher
    elif isinstance(matcher, re.Pattern):
        def match_func(x):
            return bool(matcher.match(x.type))
    else:
        match_func = matcher
    d = deque(elements)
    while d:
        el = d.popleft()
        if match_func(el):
            yield el
        d.extendleft(reversed(el.children))


class Findable:
    children: List["StructElement"]

    def find_all(
        self, matcher: Union[str, Pattern[str], MatchFunc]
    ) -> Iterator["StructElement"]:
        return _find_all(self.children, matcher)

    def find(
        self, matcher: Union[str, Pattern[str], MatchFunc]
    ) -> Optional["StructElement"]:
        try:
            return next(_find_all(self.children, matcher))
        except StopIteration:
            return None


@dataclass
class StructElement(Findable):
    type: str
    revision: Optional[int]
    id: Optional[str]
    lang: Optional[str]
    alt_text: Optional[str]
    actual_text: Optional[str]
    title: Optional[str]
    page_number: Optional[int]
    attributes: Dict[str, Any] = field(default_factory=dict)
    mcids: List[int] = field(default_factory=list)
    children: List["StructElement"] = field(default_factory=list)

    def __iter__(self) -> Iterator["StructElement"]:
        return iter(self.children)

    def all_mcids(self) -> Iterator[Tuple[Optional[int], int]]:
        for mcid in self.mcids:
            yield self.page_number, mcid
        d = deque(self.children)
        while d:
            el = d.popleft()
            for mcid in el.mcids:
                yield el.page_number, mcid
            d.extendleft(reversed(el.children))

    def to_dict(self) -> Dict[str, Any]:
        """Compacted dict (reference structure.py:131-144): prune empty."""
        r = asdict(self)
        d = deque([r])
        while d:
            el = d.popleft()
            for k in list(el.keys()):
                if el[k] is None or el[k] == [] or el[k] == {}:
                    del el[k]
            if "children" in el:
                d.extend(el["children"])
        return r


class StructTreeMissing(ValueError):
    pass


def _number_tree_values(doc: PDFDocument, node: Any) -> Iterator[Tuple[int, Any]]:
    """Flatten a number tree's (num, value) pairs in order (§7.9.7)."""
    node = doc.resolve(node)
    if not isinstance(node, dict):
        return
    if "Nums" in node:
        nums = doc.resolve(node["Nums"]) or []
        for i in range(0, len(nums) - 1, 2):
            yield int(doc.resolve(nums[i])), nums[i + 1]
    for kid in doc.resolve(node.get("Kids")) or []:
        yield from _number_tree_values(doc, kid)


def _txt(v: Any) -> Optional[str]:
    if isinstance(v, bytes):
        return decode_pdf_text(v)
    if isinstance(v, str):
        return v
    return None


class StructTree(Findable):
    """Parse the structure tree for a whole document or a single page.

    Mirrors reference ``PDFStructTree``: whole-doc parse walks /K from
    the StructTreeRoot, pruning elements that reach no marked content;
    single-page parse works backwards from the page's ParentTree entry
    (falling back to the full walk when the ParentTree is missing)."""

    def __init__(self, doc: PDFDocument, page: Optional[PDFPage] = None):
        self.doc = doc
        catalog = doc.catalog
        if "StructTreeRoot" not in catalog:
            raise StructTreeMissing("PDF has no structure")
        self.root = doc.resolve(catalog["StructTreeRoot"]) or {}
        self.role_map = doc.resolve(self.root.get("RoleMap")) or {}
        self.class_map = doc.resolve(self.root.get("ClassMap")) or {}
        self.children = []

        if page is not None:
            self.page = page
            self.page_dict: Optional[Dict[int, int]] = None
            parent_tree_obj = self.root.get("ParentTree")
            if parent_tree_obj is None:
                self._parse_struct_tree()
            else:
                if "StructParents" not in page.attrs:
                    return
                parent_id = int(doc.resolve(page.attrs["StructParents"]))
                parent_array = None
                for num, array in _number_tree_values(doc, parent_tree_obj):
                    if num == parent_id:
                        parent_array = doc.resolve(array)
                        break
                if parent_array is None:
                    return
                self._parse_parent_tree(parent_array)
        else:
            self.page = None
            self.page_dict = {
                p.objnum: p.page_number for p in doc.pages()
            }
            self._parse_struct_tree()

    # ---- element construction ----

    def _make_attributes(
        self, obj: Dict[str, Any], revision: Optional[int]
    ) -> Dict[str, Any]:
        doc = self.doc
        attr_obj_list: List[Any] = []
        for key in "C", "A":
            if key not in obj:
                continue
            attr_obj = doc.resolve(obj[key])
            if isinstance(attr_obj, list):
                attr_obj_list.extend(attr_obj)
            else:
                attr_obj_list.append(attr_obj)
        attr_objs: List[Any] = []
        prev_obj = None
        for aref in attr_obj_list:
            # a revision number adjacent to an attribute object selects it
            # for that revision (reference structure.py:229-244)
            if isinstance(aref, int):
                if aref == revision and prev_obj is not None:
                    attr_objs.append(prev_obj)
                prev_obj = None
            else:
                if prev_obj is not None:
                    attr_objs.append(prev_obj)
                prev_obj = doc.resolve(aref)
        if prev_obj is not None:
            attr_objs.append(prev_obj)
        attr: Dict[str, Any] = {}
        for o in attr_objs:
            if isinstance(o, str):  # attribute class name -> ClassMap
                if o not in self.class_map:
                    continue
                o = doc.resolve(self.class_map[o])
            if not isinstance(o, dict):
                continue
            for k, v in o.items():
                v = doc.resolve(v)
                attr[k] = v if not isinstance(v, bytes) else decode_pdf_text(v)
        return attr

    def _make_element(self, obj: Any) -> Tuple[Optional[StructElement], List[Any]]:
        doc = self.doc
        # page_number appears only in whole-doc mode (reference
        # structure.py:265-270: page-mode trees omit it)
        page_number = None
        if self.page_dict is not None and "Pg" in obj:
            pg = obj["Pg"]
            if isinstance(pg, PDFRef):
                page_number = self.page_dict.get(pg.num)
        obj_tag = ""
        if "S" in obj:
            obj_tag = doc.resolve(obj["S"]) or ""
            rm = doc.resolve(self.role_map.get(obj_tag)) if self.role_map else None
            if isinstance(rm, str):
                obj_tag = rm
        children = doc.resolve(obj["K"]) if "K" in obj else []
        if isinstance(children, int):
            children = [children]
        elif isinstance(children, dict):
            children = [obj["K"]]
        revision = doc.resolve(obj.get("R"))
        attributes = self._make_attributes(obj, revision)
        element = StructElement(
            type=obj_tag if isinstance(obj_tag, str) else "",
            id=_txt(doc.resolve(obj.get("ID"))),
            page_number=page_number,
            revision=revision if isinstance(revision, int) else None,
            lang=_txt(doc.resolve(obj.get("Lang"))),
            title=_txt(doc.resolve(obj.get("T"))),
            alt_text=_txt(doc.resolve(obj.get("Alt"))),
            actual_text=_txt(doc.resolve(obj.get("ActualText"))),
            attributes=attributes,
        )
        return element, children

    # ---- per-page ParentTree path (reference structure.py:306-335) ----

    def _parse_parent_tree(self, parent_array: List[Any]) -> None:
        doc = self.doc
        d = deque(parent_array)
        s: Dict[Any, Tuple[Optional[StructElement], List[Any]]] = {}
        found_root = False
        while d:
            ref = d.popleft()
            if ref is None:  # null: mcid with no structure
                continue
            key = _key(ref)
            if key in s:
                continue
            obj = doc.resolve(ref)
            if not isinstance(obj, dict):
                continue
            if obj.get("Type") == "StructTreeRoot":
                found_root = True
            else:
                element, children = self._make_element(obj)
                s[key] = (element, children)
                if "P" in obj:
                    d.append(obj["P"])
        if not found_root:
            # degenerate tree; keep whatever we resolved
            pass
        self._resolve_children(s)

    def _on_parsed_page(self, obj: dict) -> bool:
        if "Pg" not in obj:
            return True
        pg = obj["Pg"]
        pg_num = pg.num if isinstance(pg, PDFRef) else -1
        if self.page_dict is not None:
            return pg_num in self.page_dict
        if self.page is not None:
            return pg_num == self.page.objnum
        return True

    # ---- whole-tree walk + prune (reference structure.py:349-413) ----

    def _root_kids(self) -> List[Any]:
        root = self.doc.resolve(self.root.get("K"))
        if isinstance(root, dict):
            return [self.root["K"]]
        return list(root or [])

    def _parse_struct_tree(self) -> None:
        doc = self.doc
        root = self._root_kids()
        d = deque(root)
        s: Dict[Any, Tuple[Optional[StructElement], List[Any]]] = {}
        while d:
            ref = d.popleft()
            key = _key(ref)
            if key in s:
                continue
            obj = doc.resolve(ref)
            if not isinstance(obj, dict):
                continue
            if "Obj" in obj:  # top-level OBJR
                if not self._on_parsed_page(obj):
                    continue
                ref = obj["Obj"]
                key = _key(ref)
                obj = doc.resolve(ref)
                if not isinstance(obj, dict):
                    continue
            element, children = self._make_element(obj)
            s[key] = (element, children)
            for child in children:
                cobj = doc.resolve(child)
                if isinstance(cobj, dict):
                    if not self._on_parsed_page(cobj):
                        continue
                    if "Obj" in cobj:
                        child = cobj["Obj"]
                    elif "MCID" in cobj:
                        continue
                if isinstance(child, PDFRef):
                    d.append(child)

        visiting: set = set()  # keys on the current recursion path (cycle guard)

        def prune(elements: List[Any]) -> List[Any]:
            next_elements = []
            for ref in elements:
                obj = doc.resolve(ref)
                if isinstance(ref, int):
                    next_elements.append(ref)
                    continue
                elif isinstance(obj, dict):
                    if not self._on_parsed_page(obj):
                        continue
                    if "MCID" in obj:
                        next_elements.append(obj["MCID"])
                        continue
                    elif "Obj" in obj:
                        ref = obj["Obj"]
                key = _key(ref)
                if key not in s or key in visiting:
                    continue
                visiting.add(key)
                try:
                    element, children = s[key]
                    children = prune(children)
                finally:
                    visiting.discard(key)
                if element is None or not children:
                    del s[key]
                else:
                    s[key] = (element, children)
                    next_elements.append(ref)
            return next_elements

        prune(self._root_kids())
        self._resolve_children(s)

    def _resolve_children(self, seen: Dict[Any, Any]) -> None:
        doc = self.doc
        root = self._root_kids()
        self.children = []
        parsed_root = []
        for ref in root:
            obj = doc.resolve(ref)
            if isinstance(obj, dict) and "Obj" in obj:
                if not self._on_parsed_page(obj):
                    continue
                ref = obj["Obj"]
            key = _key(ref)
            if key in seen:
                parsed_root.append(ref)
        d = deque(parsed_root)
        done = set()
        while d:
            ref = d.popleft()
            key = _key(ref)
            if key in done:
                continue
            done.add(key)
            element, children = seen[key]
            for child in children:
                obj = doc.resolve(child)
                if isinstance(obj, int):
                    element.mcids.append(obj)
                elif isinstance(obj, dict):
                    if not self._on_parsed_page(obj):
                        continue
                    if "MCID" in obj:
                        element.mcids.append(int(doc.resolve(obj["MCID"])))
                    elif "Obj" in obj:
                        child = obj["Obj"]
                if isinstance(child, PDFRef):
                    child_element, _ = seen.get(_key(child), (None, None))
                    if child_element is not None:
                        element.children.append(child_element)
                        d.append(child)
        self.children = [seen[_key(ref)][0] for ref in parsed_root]

    def __iter__(self) -> Iterator[StructElement]:
        return iter(self.children)

    def to_dicts(self) -> List[Dict[str, Any]]:
        return [el.to_dict() for el in self.children]


def structure_tree(
    doc: PDFDocument, page: Optional[PDFPage] = None
) -> List[Dict[str, Any]]:
    """Reference ``PDF.structure_tree`` / ``Page.structure_tree``: the
    compacted dict list, [] when the PDF has no structure."""
    try:
        return StructTree(doc, page).to_dicts()
    except StructTreeMissing:
        return []
    except Exception:
        return []


def structure_flat_rows(doc: PDFDocument, doc_id: str) -> List[Dict[str, Any]]:
    """Flatten the whole-doc structure tree to preorder rows for the
    engine's ``structure`` table: (doc_id, elem_index, parent_index,
    depth, type, page_number, mcids, lang, title). The nesting is fully
    recoverable from (elem_index, parent_index)."""
    rows: List[Dict[str, Any]] = []
    try:
        tree = StructTree(doc)
    except StructTreeMissing:
        return rows
    except Exception:
        # malformed tagged PDFs (cyclic /K, bad ParentTree): no structure
        # rather than a crash, matching structure_tree()'s behavior
        return rows
    stack: List[Tuple[StructElement, int, int]] = [
        (el, -1, 0) for el in reversed(tree.children)
    ]
    while stack:
        el, parent, depth = stack.pop()
        idx = len(rows)
        rows.append(
            {
                "doc_id": doc_id,
                "elem_index": idx,
                "parent_index": parent,
                "depth": depth,
                "type": el.type,
                "page_number": -1 if el.page_number is None else int(el.page_number),
                "mcids": list(el.mcids),
                "lang": el.lang or "",
                "title": el.title or "",
            }
        )
        for child in reversed(el.children):
            stack.append((child, idx, depth + 1))
    return rows


def element_bbox(
    doc: PDFDocument,
    element: StructElement,
    pages: Dict[int, Any],
    mcid_bboxes: Optional[Dict[Tuple[int, int], Tuple[float, float, float, float]]] = None,
) -> Optional[Tuple[float, float, float, float]]:
    """BBox from the element's /BBox attribute (transformed to top-left
    coords) or the envelope of its member MCIDs' objects (reference
    structure.py:464-509). ``mcid_bboxes`` maps (page_number, mcid) ->
    (x0, top, x1, bottom) envelopes precomputed from the object tables."""
    attr_bbox = element.attributes.get("BBox")
    if attr_bbox and element.page_number in pages:
        x0, y0, x1, y1 = (float(v) for v in attr_bbox)
        x0, x1 = sorted((x0, x1))
        y0, y1 = sorted((y0, y1))
        height = pages[element.page_number]
        return (x0, height - y1, x1, height - y0)
    if mcid_bboxes is None:
        return None
    boxes = [
        mcid_bboxes[(pn, mcid)]
        for pn, mcid in element.all_mcids()
        if (pn, mcid) in mcid_bboxes
    ]
    if not boxes:
        return None
    return (
        min(b[0] for b in boxes),
        min(b[1] for b in boxes),
        max(b[2] for b in boxes),
        max(b[3] for b in boxes),
    )

"""Table-detection parity vs the reference's free functions (table.py) on
synthetic edge grids with jitter (< snap tolerance), segmented lines
(< join tolerance), merged cells, and decoy off-grid lines — cf.
FIXTURES.md §3 and the reference invariant tests
(tests/test_ca_warn_report.py:79-141)."""

import numpy as np
import pytest

from pdfplumber_ray.config import TableConfig, WordConfig
from pdfplumber_ray.functions.geometry import concat_edges, lines_to_edges, rects_to_edges
from pdfplumber_ray.functions.tables import (
    PageTable,
    cells_to_tables,
    edges_to_intersections_arrays,
    find_tables_page,
    intersections_to_cells,
    merge_edges_arrays,
    words_to_edges_h_arrays,
    words_to_edges_v_arrays,
)
from pdfplumber_ray.functions.words import extract_words_page
from ref_oracle import load_reference
from synth_chars import make_chars, to_arrays

_, _, RTEXT, RTABLE = load_reference()


def grid_edges(seed=0, rows=4, cols=3, jitter=0.0, segment=False, decoys=0):
    """R x C grid of h/v lines as (dict rows, ObjArrays)."""
    rng = np.random.default_rng(seed)
    x_lines = [72.0 + c * 60.0 for c in range(cols + 1)]
    y_lines = [100.0 + r * 24.0 for r in range(rows + 1)]
    dict_edges = []

    def add(x0, x1, top, bottom):
        j = (lambda: float(rng.uniform(-jitter, jitter))) if jitter else (lambda: 0.0)
        d = {
            "x0": x0 + (j() if x0 == x1 else 0.0),
            "top": top + (j() if top == bottom else 0.0),
        }
        if x0 == x1:
            d["x1"] = d["x0"]
            d["bottom"] = bottom
        else:
            d["x1"] = x1
            d["bottom"] = d["top"]
        d.update(
            width=d["x1"] - d["x0"],
            height=d["bottom"] - d["top"],
            orientation="v" if x0 == x1 else "h",
            object_type="line",
            doctop=d["top"],
        )
        dict_edges.append(d)

    for y in y_lines:
        if segment:
            mid = (x_lines[0] + x_lines[-1]) / 2
            add(x_lines[0], mid - 1.0, y, y)  # gap 2 < join tol 3
            add(mid + 1.0, x_lines[-1], y, y)
        else:
            add(x_lines[0], x_lines[-1], y, y)
    for x in x_lines:
        add(x, x, y_lines[0], y_lines[-1])
    for _ in range(decoys):
        x = float(rng.uniform(300, 500))
        add(x, x, 600.0, 700.0)

    arrays = {
        k: np.array([d[k] for d in dict_edges],
                    dtype=object if k in ("orientation", "object_type") else np.float64)
        for k in ("x0", "x1", "top", "bottom", "width", "height", "orientation", "object_type")
    }
    return dict_edges, arrays


@pytest.mark.parametrize("jitter,segment,decoys", [(0, False, 0), (1.2, False, 0), (0, True, 2), (0.9, True, 3)])
def test_merge_and_intersections_parity(jitter, segment, decoys):
    dict_edges, arrays = grid_edges(seed=5, jitter=jitter, segment=segment, decoys=decoys)
    ref_merged = RTABLE.merge_edges(
        dict_edges, snap_x_tolerance=3, snap_y_tolerance=3,
        join_x_tolerance=3, join_y_tolerance=3,
    )
    mine_merged = merge_edges_arrays(arrays, 3, 3, 3, 3)
    ref_set = sorted(
        (round(e["x0"], 6), round(e["top"], 6), round(e["x1"], 6), round(e["bottom"], 6))
        for e in ref_merged
    )
    mine_set = sorted(
        (round(mine_merged["x0"][i], 6), round(mine_merged["top"][i], 6),
         round(mine_merged["x1"][i], 6), round(mine_merged["bottom"][i], 6))
        for i in range(mine_merged["x0"].shape[0])
    )
    assert ref_set == mine_set

    ref_int = RTABLE.edges_to_intersections(ref_merged, 3, 3)
    mine_int = edges_to_intersections_arrays(mine_merged, 3, 3)
    assert sorted(ref_int.keys()) == sorted(mine_int.keys())

    ref_cells = RTABLE.intersections_to_cells(ref_int)
    mine_cells = intersections_to_cells(mine_int)
    assert sorted(ref_cells) == sorted(mine_cells)

    ref_tables = RTABLE.cells_to_tables(ref_cells)
    mine_tables = cells_to_tables(mine_cells)
    assert [sorted(t) for t in ref_tables] == [sorted(t) for t in mine_tables]


def test_grid_counts():
    # intersection count == (R+1) x (C+1), cells == R x C (cf.
    # test_ca_warn_report.py:131-141 structure)
    _, arrays = grid_edges(rows=4, cols=3)
    merged = merge_edges_arrays(arrays, 3, 3, 3, 3)
    inter = edges_to_intersections_arrays(merged, 1, 1)
    assert len(inter) == 5 * 4
    cells = intersections_to_cells(inter)
    assert len(cells) == 4 * 3


def test_merged_cells_and_multiple_tables():
    # two disjoint grids -> two tables, ordered top-to-bottom
    d1, a1 = grid_edges(rows=2, cols=2)
    d2 = []
    for d in d1:
        d2.append({**d, "top": d["top"] + 300, "bottom": d["bottom"] + 300, "doctop": d["doctop"] + 300})
    all_dicts = d1 + d2
    arrays = {
        k: np.array([d[k] for d in all_dicts],
                    dtype=object if k in ("orientation", "object_type") else np.float64)
        for k in a1
    }
    merged = merge_edges_arrays(arrays, 3, 3, 3, 3)
    inter = edges_to_intersections_arrays(merged, 3, 3)
    cells = intersections_to_cells(inter)
    tables = cells_to_tables(cells)
    ref_tables = RTABLE.cells_to_tables(
        RTABLE.intersections_to_cells(
            RTABLE.edges_to_intersections(
                RTABLE.merge_edges(all_dicts, 3, 3, 3, 3), 3, 3)))
    assert [sorted(t) for t in tables] == [sorted(t) for t in ref_tables]
    assert len(tables) == 2
    assert min(c[1] for c in tables[0]) < min(c[1] for c in tables[1])


def test_words_to_edges_parity():
    chars = make_chars(seed=12, n_lines=6, words_per_line=4, rotated_lines=0)
    ref_word_dicts = RTEXT.extract_words(chars)
    words = extract_words_page(to_arrays(chars), WordConfig())

    ref_h = RTABLE.words_to_edges_h(ref_word_dicts, word_threshold=1)
    mine_h = words_to_edges_h_arrays(words, 1)
    assert sorted((e["x0"], e["top"], e["x1"], e["bottom"]) for e in ref_h) == sorted(
        (mine_h["x0"][i], mine_h["top"][i], mine_h["x1"][i], mine_h["bottom"][i])
        for i in range(mine_h["x0"].shape[0])
    )

    ref_v = RTABLE.words_to_edges_v(ref_word_dicts, word_threshold=3)
    mine_v = words_to_edges_v_arrays(words, 3)
    assert sorted((e["x0"], e["top"], e["x1"], e["bottom"]) for e in ref_v) == sorted(
        (mine_v["x0"][i], mine_v["top"][i], mine_v["x1"][i], mine_v["bottom"][i])
        for i in range(mine_v["x0"].shape[0])
    )


def test_table_rows_and_extract():
    # build a 2x2 grid with chars inside each cell; verify rows + text
    _, arrays = grid_edges(rows=2, cols=2)
    merged = merge_edges_arrays(arrays, 3, 3, 3, 3)
    inter = edges_to_intersections_arrays(merged, 3, 3)
    cells = intersections_to_cells(inter)
    groups = cells_to_tables(cells)
    assert len(groups) == 1
    table = PageTable(groups[0])
    rows = table.rows
    assert len(rows) == 2 and all(len(r) == 2 for r in rows)

    # place one word per cell
    char_dicts = []
    texts = [["aa", "bb"], ["cc", "dd"]]
    for r in range(2):
        for c in range(2):
            x = 72.0 + c * 60.0 + 5
            top = 100.0 + r * 24.0 + 5
            for k, ch in enumerate(texts[r][c]):
                char_dicts.append(
                    {"text": ch, "x0": x + k * 7.25, "x1": x + k * 7.25 + 6,
                     "top": top, "bottom": top + 10, "doctop": top,
                     "size": 10.0, "height": 10.0, "width": 6.0,
                     "fontname": "F", "upright": True}
                )
    out = table.extract(to_arrays(char_dicts))
    assert out == texts


def test_find_tables_page_end_to_end():
    _, arrays = grid_edges(rows=3, cols=3, jitter=0.8, segment=True, decoys=2)
    cfg = TableConfig.resolve({"snap_tolerance": 3, "join_tolerance": 3})
    tables = find_tables_page(arrays, cfg, (0, 0, 612, 792))
    assert len(tables) == 1
    assert len(tables[0].cells) == 9


def test_text_strategy_end_to_end():
    # aligned word columns -> stream strategy finds a grid (cf.
    # test_nics_report.py:104-115)
    char_dicts = []
    for r in range(4):
        for c in range(3):
            x = 72.0 + c * 80.0
            top = 100.0 + r * 20.0
            for k, ch in enumerate(f"r{r}c{c}"):
                char_dicts.append(
                    {"text": ch, "x0": x + k * 7.25, "x1": x + k * 7.25 + 6,
                     "top": top, "bottom": top + 10, "doctop": top,
                     "size": 10.0, "height": 10.0, "width": 6.0,
                     "fontname": "F", "upright": True}
                )
    arrays = to_arrays(char_dicts)
    cfg = TableConfig.resolve({"vertical_strategy": "text", "horizontal_strategy": "text"})
    tables = find_tables_page(
        concat_edges([]), cfg, (0, 0, 612, 792),
        words_provider=lambda: extract_words_page(arrays, WordConfig()),
    )
    # reference pipeline on the same input (its stream strategy also emits
    # empty inter-row gap cells when row spacing exceeds glyph height)
    ref_word_dicts = RTEXT.extract_words(char_dicts)
    ref_edges = RTABLE.merge_edges(
        RTABLE.words_to_edges_v(ref_word_dicts, 3) + RTABLE.words_to_edges_h(ref_word_dicts, 1),
        3, 3, 3, 3,
    )
    ref_cells = RTABLE.intersections_to_cells(
        RTABLE.edges_to_intersections(ref_edges, 3, 3)
    )
    ref_tables = RTABLE.cells_to_tables(ref_cells)
    assert len(tables) == len(ref_tables) == 1
    assert sorted(tables[0].cells) == sorted(ref_tables[0])
    out = tables[0].extract(arrays)
    non_empty = [row for row in out if any(c for c in row)]
    assert non_empty == [[f"r{r}c{c}" for c in range(3)] for r in range(4)]


def test_explicit_strategy_validation():
    cfg = TableConfig.resolve({"vertical_strategy": "explicit"})
    with pytest.raises(ValueError):
        find_tables_page(concat_edges([]), cfg, (0, 0, 612, 792))
    with pytest.raises(ValueError):
        TableConfig.resolve({"snap_tolerance": -1})
    with pytest.raises(ValueError):
        TableConfig.resolve({"vertical_strategy": "bogus"})


def test_explicit_lines():
    cfg = TableConfig.resolve(
        {"vertical_strategy": "explicit", "horizontal_strategy": "explicit",
         "explicit_vertical_lines": [72, 132, 192],
         "explicit_horizontal_lines": [100, 124, 148]}
    )
    tables = find_tables_page(concat_edges([]), cfg, (0, 0, 612, 792))
    assert len(tables) == 1
    assert len(tables[0].cells) == 4


@pytest.mark.parametrize("seed", range(20))
def test_random_edges_full_chain_fuzz(seed):
    """Fuzz parity: random h/v segments (random positions/extents, many
    near-tolerance gaps and overlaps) through the full
    merge -> intersections -> cells -> tables chain must match the
    reference bit-for-bit at 1e-6 rounding."""
    rng = np.random.default_rng(1000 + seed)
    dict_edges = []
    for _ in range(rng.integers(8, 40)):
        if rng.random() < 0.5:  # horizontal
            x0 = float(rng.uniform(0, 500))
            x1 = x0 + float(rng.uniform(5, 200))
            y = float(rng.choice([100, 124, 148, 172]) + rng.uniform(-2, 2))
            d = {"x0": x0, "x1": x1, "top": y, "bottom": y, "orientation": "h"}
        else:  # vertical
            x = float(rng.choice([72, 132, 192, 252]) + rng.uniform(-2, 2))
            t = float(rng.uniform(80, 160))
            b = t + float(rng.uniform(5, 120))
            d = {"x0": x, "x1": x, "top": t, "bottom": b, "orientation": "v"}
        d.update(
            width=d["x1"] - d["x0"], height=d["bottom"] - d["top"],
            object_type="line", doctop=d["top"],
        )
        dict_edges.append(d)
    arrays = {
        k: np.array(
            [d[k] for d in dict_edges],
            dtype=object if k in ("orientation", "object_type") else np.float64,
        )
        for k in ("x0", "x1", "top", "bottom", "width", "height",
                  "orientation", "object_type")
    }

    ref_merged = RTABLE.merge_edges(
        dict_edges, snap_x_tolerance=3, snap_y_tolerance=3,
        join_x_tolerance=3, join_y_tolerance=3,
    )
    mine_merged = merge_edges_arrays(arrays, 3, 3, 3, 3)
    ref_set = sorted(
        (round(e["x0"], 6), round(e["top"], 6), round(e["x1"], 6), round(e["bottom"], 6))
        for e in ref_merged
    )
    mine_set = sorted(
        (round(mine_merged["x0"][i], 6), round(mine_merged["top"][i], 6),
         round(mine_merged["x1"][i], 6), round(mine_merged["bottom"][i], 6))
        for i in range(mine_merged["x0"].shape[0])
    )
    assert ref_set == mine_set, f"merged mismatch at seed {seed}"

    ref_int = RTABLE.edges_to_intersections(ref_merged, 3, 3)
    mine_int = edges_to_intersections_arrays(mine_merged, 3, 3)
    assert sorted(ref_int.keys()) == sorted(mine_int.keys()), f"seed {seed}"
    ref_cells = RTABLE.intersections_to_cells(ref_int)
    mine_cells = intersections_to_cells(mine_int)
    assert sorted(ref_cells) == sorted(mine_cells), f"seed {seed}"
    ref_tables = RTABLE.cells_to_tables(ref_cells)
    mine_tables = cells_to_tables(mine_cells)
    assert [sorted(t) for t in ref_tables] == [sorted(t) for t in mine_tables]

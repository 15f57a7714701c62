"""Kernel unit tests mirroring the reference's numbers
(tests/test_utils.py:34-48) plus randomized parity against the reference
algorithm modules loaded read-only from /root/reference."""

import numpy as np
import pytest

from pdfplumber_ray.functions.clustering import cluster_groups, cluster_ids, cluster_means
from pdfplumber_ray.functions.ctm import decompose_ctm
from pdfplumber_ray.functions.dedupe import dedupe_chars_mask
from pdfplumber_ray.functions.geometry import (
    bbox_overlap_mask,
    clip_to_bbox,
    filter_edges_mask,
    lines_to_edges,
    rects_to_edges,
    snap_positions,
    within_bbox_mask,
)
from ref_oracle import load_reference
from synth_chars import make_chars, to_arrays


def test_cluster_list_numbers():
    # reference tests/test_utils.py:34-41
    a = np.array([1.0, 2, 3, 4])
    assert [list(a[g]) for g in cluster_groups(a, 1)] == [[1, 2, 3, 4]]
    b = np.array([1.0, 2, 5, 6])
    assert [list(b[g]) for g in cluster_groups(b, 1)] == [[1, 2], [5, 6]]


def test_cluster_objects_semantics():
    # reference tests/test_utils.py:43-48: tolerance 0 groups equal values
    lens = np.array([1.0, 2, 3, 1])  # len of ["a","ab","abc","b"]
    groups = [list(g) for g in cluster_groups(lens, 0)]
    assert groups == [[0, 3], [1], [2]]


def test_cluster_parity_random():
    clustering, _, _, _ = load_reference()
    rng = np.random.default_rng(7)
    for trial in range(25):
        vals = rng.uniform(0, 100, size=rng.integers(1, 60)).round(2)
        tol = float(rng.choice([0, 0.5, 1, 3, 10]))
        objs = [{"v": float(v), "i": i} for i, v in enumerate(vals)]
        ref = clustering.cluster_objects(objs, lambda o: o["v"], tol)
        ref_groups = [[o["i"] for o in grp] for grp in ref]
        mine = [list(g) for g in cluster_groups(vals, tol)]
        assert mine == ref_groups, f"trial {trial} tol {tol}"


def test_cluster_means_snap():
    vals = np.array([10.0, 11.0, 20.0])
    snapped = snap_positions(vals, 2)
    assert list(snapped) == [10.5, 10.5, 20.0]
    assert list(cluster_means(np.array([5.0]), 1)) == [5.0]
    assert cluster_ids(np.empty(0), 1).shape == (0,)


def test_geometry_masks_parity():
    _, geometry, _, _ = load_reference()
    rng = np.random.default_rng(11)
    objs = []
    for _ in range(50):
        x0, top = rng.uniform(0, 80, 2)
        w, h = rng.uniform(0, 40, 2)
        objs.append({"x0": x0, "top": top, "x1": x0 + w, "bottom": top + h, "doctop": top})
    arrays = {k: np.array([o[k] for o in objs]) for k in ("x0", "top", "x1", "bottom", "doctop")}
    bbox = (20.0, 20.0, 70.0, 60.0)
    ref_within = {id(o) for o in geometry.within_bbox(objs, bbox)}
    ref_intersect = {id(o) for o in geometry.intersects_bbox(objs, bbox)}
    w_mask = within_bbox_mask(arrays, bbox)
    i_mask = bbox_overlap_mask(arrays, bbox)
    for i, o in enumerate(objs):
        assert w_mask[i] == (id(o) in ref_within)
        assert i_mask[i] == (id(o) in ref_intersect)
    # crop parity
    ref_crop = geometry.crop_to_bbox(objs, bbox)
    mine_crop, mask = clip_to_bbox(arrays, bbox)
    assert mask.sum() == len(ref_crop)
    mi = 0
    for o in ref_crop:
        for k in ("x0", "top", "x1", "bottom", "doctop", "width", "height"):
            assert abs(mine_crop[k][mi] - o[k]) < 1e-9
        mi += 1


def test_edges_derivation_parity():
    _, geometry, _, _ = load_reference()
    rect = {"x0": 10.0, "x1": 40.0, "top": 20.0, "bottom": 50.0, "doctop": 20.0,
            "width": 30.0, "height": 30.0, "y0": 742.0, "y1": 772.0,
            "object_type": "rect"}
    ref_edges = geometry.rect_to_edges(rect)
    mine = rects_to_edges({k: np.array([rect[k]]) for k in ("x0", "x1", "top", "bottom")})
    ref_set = {(e["x0"], e["top"], e["x1"], e["bottom"], e["orientation"]) for e in ref_edges}
    mine_set = {
        (mine["x0"][i], mine["top"][i], mine["x1"][i], mine["bottom"][i], mine["orientation"][i])
        for i in range(4)
    }
    assert ref_set == mine_set

    line = {"x0": 0.0, "x1": 10.0, "top": 5.0, "bottom": 5.0}
    e = lines_to_edges({k: np.array([v]) for k, v in line.items()})
    assert e["orientation"][0] == "h"
    vline = {"x0": 3.0, "x1": 3.0, "top": 0.0, "bottom": 9.0}
    e = lines_to_edges({k: np.array([v]) for k, v in vline.items()})
    assert e["orientation"][0] == "v"
    mask = filter_edges_mask(e, orientation="v", min_length=5)
    assert mask[0]
    mask = filter_edges_mask(e, orientation="v", min_length=10)
    assert not mask[0]
    with pytest.raises(ValueError):
        filter_edges_mask(e, orientation="x")


def test_ctm():
    import math
    out = decompose_ctm(*[np.array([v]) for v in (2.0, 0.0, 0.0, 3.0, 7.0, 8.0)])
    assert out["scale_x"][0] == 2.0
    assert out["scale_y"][0] == 3.0
    assert out["skew_x"][0] == 0.0
    assert out["skew_y"][0] == 0.0
    assert out["translation_x"][0] == 7.0
    # 45-degree rotation
    c = math.cos(math.pi / 4)
    out = decompose_ctm(*[np.array([v]) for v in (c, c, -c, c, 0.0, 0.0)])
    assert abs(out["skew_y"][0] - 45.0) < 1e-9


def test_dedupe_chars_parity():
    _, _, text_mod, _ = load_reference()
    chars = make_chars(seed=3, n_lines=4, rotated_lines=0)
    # duplicate every 3rd char with +-0.5 offset (cf. tests/test_dedupe_chars.py)
    dups = []
    for i, c in enumerate(chars):
        if i % 3 == 0:
            d = dict(c)
            d["x0"] += 0.5
            d["x1"] += 0.5
            dups.append(d)
    all_chars = chars + dups
    ref = text_mod.dedupe_chars(all_chars, tolerance=1)
    mask = dedupe_chars_mask(to_arrays(all_chars), tolerance=1.0)
    kept = [all_chars[i] for i in np.flatnonzero(mask)]
    assert [(c["text"], c["x0"], c["doctop"]) for c in kept] == [
        (c["text"], c["x0"], c["doctop"]) for c in ref
    ]


def test_move_snap_resize_parity_vs_reference():
    """move_objects / snap_objects_arrays / resize_objects vs the actual
    reference functions (geometry.py:128-186) loaded via ref_oracle."""
    import numpy as np

    from ref_oracle import load_reference

    from pdfplumber_ray.functions.geometry import (
        calculate_area,
        get_bbox_overlap,
        move_objects,
        resize_objects,
        snap_objects_arrays,
    )

    _, rgeo, _, _ = load_reference()
    rng = np.random.default_rng(7)
    n = 40
    x0 = rng.uniform(0, 500, n)
    w = rng.uniform(1, 50, n)
    top = rng.uniform(0, 700, n)
    h = rng.uniform(1, 30, n)
    objs = {
        "x0": x0, "x1": x0 + w, "top": top, "bottom": top + h,
        "doctop": top + 792.0, "width": w, "height": h,
    }
    dicts = [
        {k: float(v[i]) for k, v in objs.items()} for i in range(n)
    ]

    moved = move_objects(objs, "v", 11.5)
    ref_moved = [rgeo.move_object(d, "v", 11.5) for d in dicts]
    for k in ("top", "bottom", "doctop"):
        assert np.allclose(moved[k], [d[k] for d in ref_moved])

    snapped = snap_objects_arrays(objs, "x0", 25.0)
    ref_snapped = rgeo.snap_objects(dicts, "x0", 25.0)
    # reference reorders into cluster order; compare as sorted multisets
    assert np.allclose(
        np.sort(snapped["x0"]), np.sort([d["x0"] for d in ref_snapped])
    )
    assert np.allclose(
        np.sort(snapped["x1"]), np.sort([d["x1"] for d in ref_snapped])
    )

    resized = resize_objects(objs, "top", objs["top"] - 3.0)
    ref_resized = [rgeo.resize_object(d, "top", d["top"] - 3.0) for d in dicts]
    for k in ("top", "doctop", "height"):
        assert np.allclose(resized[k], [d[k] for d in ref_resized])

    for a, b in [
        ((0, 0, 10, 10), (5, 5, 20, 20)),
        ((0, 0, 10, 10), (10, 10, 20, 20)),   # corner touch: zero area both dims
        ((0, 0, 10, 10), (10, 0, 20, 10)),    # edge touch: zero width only
        ((0, 0, 10, 10), (11, 11, 20, 20)),   # disjoint
    ]:
        assert get_bbox_overlap(a, b) == rgeo.get_bbox_overlap(a, b)
    assert calculate_area((0, 0, 4, 5)) == rgeo.calculate_area((0, 0, 4, 5))

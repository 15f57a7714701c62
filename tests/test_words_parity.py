"""Randomized parity: word assembly + text extraction vs the reference
algorithm modules across the settings matrix (tolerances, ratios, blanks,
punctuation, text flow, extra attrs, directions, layout mode, render dirs).
"""

import numpy as np
import pytest

from pdfplumber_ray.config import LayoutConfig, WordConfig
from pdfplumber_ray.functions.textmap import (
    chars_to_textmap_page,
    extract_text_page,
    extract_text_simple_page,
    search_page,
    extract_text_lines_page,
)
from pdfplumber_ray.functions.words import extract_words_page
from ref_oracle import load_reference
from synth_chars import make_chars, to_arrays

_, _, RTEXT, _ = load_reference()


def ref_words(chars, **kwargs):
    return RTEXT.WordExtractor(**kwargs).extract_words(chars)


def assert_words_equal(mine, ref, extra=()):
    assert len(mine["text"]) == len(ref), (
        f"{len(mine['text'])} words vs ref {len(ref)}:"
        f" {list(mine['text'])[:12]} vs {[w['text'] for w in ref][:12]}"
    )
    for i, w in enumerate(ref):
        assert mine["text"][i] == w["text"], (i, mine["text"][i], w["text"])
        for k in ("x0", "x1", "top", "bottom", "doctop"):
            assert abs(mine[k][i] - w[k]) < 1e-9, (i, k)
        assert bool(mine["upright"][i]) == bool(w["upright"])
        assert mine["direction"][i] == w["direction"]
        for k in extra:
            assert mine[k][i] == w[k]


CONFIGS = [
    {},
    {"keep_blank_chars": True},
    {"split_at_punctuation": True},
    {"split_at_punctuation": r"!\"&'()*+,.:;<=>?@[]^`{|}~"},
    {"x_tolerance": 1.0},
    {"x_tolerance": 9.0, "y_tolerance": 20.0},
    {"x_tolerance_ratio": 0.15},
    {"y_tolerance_ratio": 0.3},
    {"use_text_flow": True},
    {"extra_attrs": ["size"]},
    {"extra_attrs": ["fontname", "size"]},
    {"expand_ligatures": False},
    {"line_dir": "ttb", "char_dir": "rtl"},
    {"line_dir": "btt", "char_dir": "ltr"},
    {"line_dir": "ltr", "char_dir": "ttb"},
    {"line_dir": "rtl", "char_dir": "btt"},
]


@pytest.mark.parametrize("cfg_kwargs", CONFIGS, ids=[str(c) for c in CONFIGS])
@pytest.mark.parametrize("seed,jitter,rotated", [(1, 0.0, 0), (2, 0.4, 1), (3, 1.2, 2)])
def test_extract_words_parity(cfg_kwargs, seed, jitter, rotated):
    chars = make_chars(seed=seed, n_lines=6, jitter=jitter, rotated_lines=rotated)
    ref = ref_words(chars, **cfg_kwargs)
    mine = extract_words_page(to_arrays(chars), WordConfig.from_kwargs(**cfg_kwargs))
    assert_words_equal(mine, ref, extra=cfg_kwargs.get("extra_attrs", ()))


@pytest.mark.parametrize("cfg_kwargs", CONFIGS, ids=[str(c) for c in CONFIGS])
def test_extract_text_parity(cfg_kwargs):
    chars = make_chars(seed=5, n_lines=5, jitter=0.3, rotated_lines=1)
    ref = RTEXT.extract_text(chars, **cfg_kwargs)
    mine = extract_text_page(to_arrays(chars), **cfg_kwargs)
    assert mine == ref


@pytest.mark.parametrize(
    "layout_kwargs",
    [
        {"layout": True, "layout_width": 612, "layout_height": 792},
        {"layout": True, "layout_width": 612, "layout_height": 792, "x_shift": 72, "y_shift": 72},
        {"layout": True, "layout_width_chars": 80, "layout_height_chars": 50},
        {"layout": True, "layout_width": 400, "layout_height": 300, "x_density": 10, "y_density": 10},
    ],
)
@pytest.mark.parametrize("seed", [1, 4])
def test_layout_text_parity(layout_kwargs, seed):
    chars = make_chars(seed=seed, n_lines=6, jitter=0.2, rotated_lines=0)
    ref = RTEXT.extract_text(chars, **layout_kwargs)
    mine = extract_text_page(to_arrays(chars), **layout_kwargs)
    assert mine == ref


@pytest.mark.parametrize(
    "ldr,cdr",
    [("ttb", "ltr"), ("ttb", "rtl"), ("btt", "ltr"), ("btt", "rtl"),
     ("ltr", "ttb"), ("ltr", "btt"), ("rtl", "ttb"), ("rtl", "btt")],
)
def test_render_directions_parity(ldr, cdr):
    # mirrors reference tests/test_utils.py:172-190 on synthetic lines
    chars = make_chars(seed=9, n_lines=3, rotated_lines=0)
    ref = RTEXT.extract_text(chars, line_dir_render=ldr, char_dir_render=cdr)
    mine = extract_text_page(to_arrays(chars), line_dir_render=ldr, char_dir_render=cdr)
    assert mine == ref


def test_invalid_directions():
    chars = to_arrays(make_chars(seed=1, n_lines=2))
    with pytest.raises(ValueError):
        extract_text_page(chars, line_dir="xxx", char_dir="ltr")
    with pytest.raises(ValueError):
        extract_text_page(chars, line_dir="rtl", char_dir="ltr")
    with pytest.raises(ValueError):
        extract_text_page(chars, line_dir_render="ttb", char_dir_render="btt")


def test_extract_text_simple_parity():
    for seed in (1, 2, 3):
        chars = make_chars(seed=seed, n_lines=5, jitter=0.4, rotated_lines=1)
        ref = RTEXT.extract_text_simple(chars)
        mine = extract_text_simple_page(to_arrays(chars))
        assert mine == ref


def test_search_parity():
    chars = make_chars(seed=6, n_lines=5, rotated_lines=0)
    tm = RTEXT.chars_to_textmap(chars)
    patterns = [r"ta\w+", r"s\w+", "query", r"(s)(low|ort)"]
    arrays = to_arrays(chars)
    for pat in patterns:
        ref = tm.search(pat)
        mine = search_page(arrays, pat)
        assert len(mine) == len(ref), pat
        for m, r in zip(mine, ref):
            assert m["text"] == r["text"]
            assert abs(m["x0"] - r["x0"]) < 1e-9
            assert abs(m["top"] - r["top"]) < 1e-9
            assert abs(m["x1"] - r["x1"]) < 1e-9
            assert abs(m["bottom"] - r["bottom"]) < 1e-9
            assert tuple(m["groups"]) == tuple(r["groups"])
    # case-insensitive + literal
    ref = tm.search("QUERY", case=False)
    mine = search_page(arrays, "QUERY", case=False)
    assert len(mine) == len(ref)
    ref = tm.search("a.b", regex=False)
    mine = search_page(arrays, "a.b", regex=False)
    assert len(mine) == len(ref)


def test_extract_text_lines_parity():
    chars = make_chars(seed=8, n_lines=4, rotated_lines=0)
    tm = RTEXT.chars_to_textmap(chars, layout=True, layout_width=612, layout_height=100)
    ref = tm.extract_text_lines(return_chars=False)
    mine = extract_text_lines_page(
        to_arrays(chars),
        layout_cfg=LayoutConfig(layout=True, layout_width=612, layout_height=100),
    )
    assert [m["text"] for m in mine] == [r["text"] for r in ref]


def test_empty_chars():
    empty = to_arrays([])
    assert extract_text_page(empty) == ""
    assert extract_text_simple_page(empty) == ""
    words = extract_words_page(empty, WordConfig())
    assert words["text"].shape[0] == 0


@pytest.mark.parametrize("seed", range(15))
def test_words_fuzz_parity(seed):
    """Fuzz parity: random page shapes (line counts, jitter up to the
    tolerance boundary, rotation mix) x a rotating config sample, vs the
    reference WordExtractor."""
    rng = np.random.default_rng(9000 + seed)
    chars = make_chars(
        seed=seed,
        n_lines=int(rng.integers(1, 10)),
        words_per_line=int(rng.integers(1, 8)),
        rotated_lines=int(rng.integers(0, 3)),
        jitter=float(rng.uniform(0, 1.4)),
        blanks=bool(rng.integers(0, 2)),
    )
    cfg_kwargs = CONFIGS[seed % len(CONFIGS)]
    ref = ref_words(chars, **cfg_kwargs)
    mine = extract_words_page(to_arrays(chars), WordConfig.from_kwargs(**cfg_kwargs))
    assert_words_equal(mine, ref, extra=cfg_kwargs.get("extra_attrs", ()))
    # text extraction parity on the same fuzzed page (default settings)
    assert extract_text_page(to_arrays(chars)) == RTEXT.extract_text(chars)


@pytest.mark.parametrize("seed", range(12))
def test_layout_text_fuzz_parity(seed):
    """Fuzz the layout textmap — the byte-exactness-hardest invariant
    (newline imputation, space density, terminal padding) — on random
    page shapes and random layout params vs the reference."""
    rng = np.random.default_rng(4200 + seed)
    chars = make_chars(
        seed=seed,
        n_lines=int(rng.integers(1, 9)),
        words_per_line=int(rng.integers(1, 7)),
        rotated_lines=0,
        jitter=float(rng.uniform(0, 1.0)),
        blanks=bool(rng.integers(0, 2)),
    )
    kwargs = {
        "layout": True,
        "layout_width": float(rng.choice([300, 400, 612])),
        "layout_height": float(rng.choice([200, 400, 792])),
        "x_density": float(rng.choice([7.25, 9, 12])),
        "y_density": float(rng.choice([10, 13, 15])),
        "x_shift": float(rng.choice([0, 36, 72])),
    }
    ref = RTEXT.extract_text(chars, **kwargs)
    mine = extract_text_page(to_arrays(chars), **kwargs)
    assert mine == ref, f"layout mismatch at seed {seed} kwargs {kwargs}"

"""Warehouse-style analytics operators: crafted-input semantics (skew,
ties, empty inputs, band boundaries) beyond the sf0.01 oracle sweep."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from pdfplumber_ray.pipelines import analytics as an


def _events(rows):
    """rows: list of (event_id, user_id, ts_us, event_type, value)."""
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            }
        )
    )


def test_grouped_rank_ties_and_groups(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(6)), pa.int64()),
                "lang": pa.array(["en", "en", "en", "de", "de", "de"]),
                "n_chars": pa.array([10, 10, 20, 5, 6, 7], pa.int64()),
            }
        )
    )
    out = {r["doc_id"]: r for r in
           an.grouped_rank_ds(docs, "lang", "n_chars", "doc_id").take_all()}
    # ties include peers (RANGE frame): both len-10 docs have n_le=2
    assert out[0]["n_le"] == 2 and out[1]["n_le"] == 2
    assert out[2]["n_le"] == 3 and out[2]["g_total"] == 3
    # groups are independent
    assert out[3]["n_le"] == 1 and out[3]["g_total"] == 3
    assert out[5]["permille"] == 1000


def test_grouped_rank_domain_guard(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(100)), pa.int64()),
                "lang": pa.array(["en"] * 100),
                "n_chars": pa.array(list(range(100)), pa.int64()),
            }
        )
    )
    with pytest.raises(ValueError, match="max_domain_broadcast"):
        an.grouped_rank_ds(
            docs, "lang", "n_chars", "doc_id", max_domain_broadcast=10
        ).take_all()


def test_histogram_bins(ray_session):
    ev = _events(
        [(1, 1, 0, "view", 0.25), (2, 1, 1, "view", 0.49),
         (3, 2, 2, "view", 0.5), (4, 2, 3, "view", 1.75)]
    )
    rows = {r["bin"]: r for r in an.histogram_ds(ev, width_e6=500_000).take_all()}
    assert rows[0]["n_events"] == 2 and rows[0]["value_sum_e6"] == 740_000
    assert rows[1]["n_events"] == 1 and rows[1]["bin_lo_e6"] == 500_000
    assert rows[3]["n_events"] == 1 and rows[3]["value_sum_e6"] == 1_750_000


def test_hopping_window_membership(ray_session):
    # one event at t = 1000 s: containing starts are (1000-3600, 1000]
    # aligned to the 900 s hop -> -1800, -900, 0, 900
    ev = _events([(1, 1, 1_000_000_000, "view", 2.0)])
    rows = an.hopping_window_ds(ev, size_s=3600, hop_s=900).take_all()
    starts = sorted(r["window_start_s"] for r in rows)
    assert starts == [-1800, -900, 0, 900]
    assert all(r["n_events"] == 1 and r["value_sum_e6"] == 2_000_000 for r in rows)
    with pytest.raises(ValueError, match="multiple"):
        an.hopping_window_ds(ev, size_s=3600, hop_s=1000)


def test_cohort_retention_semantics(ray_session):
    wk = 7 * 86_400 * 1_000_000
    ev = _events(
        [
            (1, 1, 0 * wk, "view", 0.0),       # user 1: cohort week 0
            (2, 1, 2 * wk, "view", 0.0),       #   active again week 2
            (3, 1, 2 * wk + 5, "view", 0.0),   #   distinct (user, week) dedups
            (4, 2, 2 * wk, "view", 0.0),       # user 2: cohort week 2
        ]
    )
    rows = {(r["cohort_week"], r["active_week"]): r["n_users"]
            for r in an.cohort_retention_ds(ev).take_all()}
    assert rows == {(0, 0): 1, (0, 2): 1, (2, 2): 1}


def test_anti_join_keeps_unmatched_payload(ray_session):
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4], pa.int64()),
                "name": pa.array(["a", "b", "c", "d"]),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 2, 4, 9], pa.int64())})
    )
    out = sorted(
        (r["k"], r["name"])
        for r in an.anti_join_ds(left, right, "k").take_all()
    )
    assert out == [(1, "a"), (3, "c")]


def test_anti_join_empty_right(ray_session):
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()),
                  "name": pa.array(["a", "b"])})
    )
    right = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    out = sorted(r["k"] for r in an.anti_join_ds(left, right, "k").take_all())
    assert out == [1, 2]


def test_keep_latest_skewed_key(ray_session):
    # 10k events on ONE user (viral-key skew) + deterministic tie-break:
    # two rows share the max ts; the larger event_id wins
    n = 10_000
    rows = [(i, 7, i * 10, "view", 0.0) for i in range(n)]
    rows.append((n, 7, (n - 1) * 10, "click", 1.0))  # same ts as event n-1
    rows.append((n + 1, 8, 5, "view", 0.5))
    out = {r["user_id"]: r for r in an.keep_latest_ds(_events(rows)).take_all()}
    assert len(out) == 2
    assert out[7]["event_id"] == n and out[7]["event_type"] == "click"
    assert out[8]["event_id"] == n + 1


def test_postings_band_and_order(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([3, 1, 2], pa.int64()),
                "text": pa.array(
                    ["shared rare rare", "shared stop", "shared stop solo"]
                ),
            }
        )
    )
    # df: shared=3, stop=2, rare=1 (per-doc distinct), solo=1
    rows = {r["token"]: r for r in
            an.postings_ds(docs, min_df=2, max_df=2).take_all()}
    assert list(rows) == ["stop"]
    assert rows["stop"]["df"] == 2 and rows["stop"]["doc_ids"] == "1,2"
    rows = {r["token"]: r for r in
            an.postings_ds(docs, min_df=2, max_df=50).take_all()}
    assert rows["shared"]["doc_ids"] == "1,2,3"


def test_quality_audit_counts(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "text": pa.array(["x", "", None, "y"]),
                "n_chars": pa.array([1, 0, 0, 1], pa.int64()),
                "lang": pa.array(["en", "en", "de", "fr"]),
                "source": pa.array(["web", "web", "web", "web"]),
            }
        )
    )
    rows = {(r["col_name"], r["metric"]): r["value"]
            for r in an.quality_audit_ds(docs).take_all()}
    assert rows[("n_chars", "n_rows")] == 4
    assert rows[("text", "n_null")] == 1
    assert rows[("text", "n_empty")] == 1
    assert rows[("n_chars", "min_value")] == 0
    assert rows[("n_chars", "max_value")] == 1
    assert rows[("lang", "n_distinct")] == 3
    assert rows[("source", "n_distinct")] == 1


def test_empty_inputs(ray_session):
    ev = _events([])
    assert an.histogram_ds(ev).take_all() == []
    assert an.hopping_window_ds(ev).take_all() == []
    assert an.cohort_retention_ds(ev).take_all() == []
    assert an.keep_latest_ds(ev).take_all() == []
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    )
    assert an.postings_ds(docs).take_all() == []


def test_window_users_exact_distinct(ray_session):
    ev = _events(
        [
            (1, 1, 0, "view", 0.0),
            (2, 1, 5, "view", 0.0),              # same user, same window
            (3, 2, 10, "view", 0.0),             # second user, same window
            (4, 1, 3_600_000_000, "view", 0.0),  # next window
        ]
    )
    rows = {r["window_start_s"]: r["n_users"]
            for r in an.window_users_ds(ev, width_s=3600).take_all()}
    assert rows == {0: 2, 3600: 1}


def test_grouped_heavy_hitters_rank_and_ties(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array(["en", "en", "de"]),
                "text": pa.array(["a a b c", "a b", "x y y"]),
            }
        )
    )
    out = an.grouped_heavy_hitters_ds(docs, k=2).take_all()
    en = sorted(
        [(r["rank_in_group"], r["token"], r["n"]) for r in out if r["lang"] == "en"]
    )
    de = sorted(
        [(r["rank_in_group"], r["token"], r["n"]) for r in out if r["lang"] == "de"]
    )
    assert en == [(1, "a", 3), (2, "b", 2)]
    assert de == [(1, "y", 2), (2, "x", 1)]  # n DESC, token ASC tie-break


def test_length_outliers_integer_rule(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "lang": pa.array(["en", "en", "en", "de"]),
                "n_chars": pa.array([10, 10, 100, 7], pa.int64()),
            }
        )
    )
    out = {r["doc_id"]: r for r in an.length_outliers_ds(docs).take_all()}
    # en: sum=120, n=3 -> outlier iff v*3 > 3*120 i.e. v > 120
    assert out[2]["is_outlier"] == 0 and out[2]["g_sum"] == 120
    # single-member group is never an outlier (v*1 > 3*v is false)
    assert out[3]["is_outlier"] == 0 and out[3]["g_n"] == 1
    big = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(10)), pa.int64()),
                "lang": pa.array(["en"] * 10),
                "n_chars": pa.array([1] * 9 + [100], pa.int64()),
            }
        )
    )
    out = {r["doc_id"]: r for r in an.length_outliers_ds(big).take_all()}
    assert out[9]["is_outlier"] == 1  # 100*10 > 3*109
    assert out[0]["is_outlier"] == 0


def test_postings_all_groups_empty_keeps_schema(ray_session):
    # every token is a hapax -> every bucket emits zero rows; the schema
    # anchor keeps Dataset.schema() typed, and the queries()-boundary
    # _typed_result guard converts the empty result to a typed
    # pyarrow.Table whose to_pandas() keeps the columns (Ray 2.49's
    # Dataset.to_pandas() on ANY zero-row dataset drops them, which the
    # driver compare would read as a schema mismatch)
    import __ray_entry__ as E

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["alpha beta", "gamma delta"]),
            }
        )
    )
    ds = an.postings_ds(docs, min_df=2, max_df=50)
    assert ds.schema().names == ["token", "df", "doc_ids"]
    out = E._typed_result(ds)
    assert isinstance(out, pa.Table)
    df = out.to_pandas()
    assert len(df) == 0
    assert list(df.columns) == ["token", "df", "doc_ids"]


def test_typed_result_passthrough_nonempty(ray_session):
    import __ray_entry__ as E

    t = pa.table({"a": pa.array([1, 2], pa.int64())})
    out = E._typed_result(ray.data.from_arrow(t))
    assert isinstance(out, ray.data.Dataset)
    assert out.to_pandas()["a"].tolist() == [1, 2]
    # non-Dataset results pass through untouched
    assert E._typed_result(t) is t


def test_running_total_segmented_cumsum(ray_session):
    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "user_id": pa.array([7, 7, 7, 8, 8], pa.int64()),
                "ts": pa.array([10, 30, 20, 5, 6], pa.timestamp("us")),
                "value": pa.array([1.5, 2.25, 3.0, 10.0, 0.5]),
            }
        )
    )
    out = {r["event_id"]: r["run_total_e"] for r in an.running_total_ds(ev).take_all()}
    # user 7 ordered by ts: e1(150), e3(+300=450), e2(+225=675)
    assert out == {1: 150, 3: 450, 2: 675, 4: 1000, 5: 1050}


def test_rollup_levels(ray_session):
    li = ray.data.from_arrow(
        pa.table(
            {
                "f": pa.array(["A", "A", "B"], pa.string()),
                "s": pa.array(["x", "y", "x"], pa.string()),
                "q": pa.array([1.0, 2.0, 4.0]),
            }
        )
    )
    rows = {
        (r["f"], r["s"]): (r["sum_e"], r["n_rows"])
        for r in an.rollup_ds(li, ["f", "s"], "q").take_all()
    }
    assert rows[("A", "x")] == (100, 1)
    assert rows[("A", "ALL")] == (300, 2)
    assert rows[("B", "ALL")] == (400, 1)
    assert rows[("ALL", "ALL")] == (700, 3)
    assert len(rows) == 3 + 2 + 1


def test_interval_count_bucket_boundary(ray_session):
    # width 100us; window [90, 190) spans two buckets; points at 95 and
    # 110 both match; 190 (exclusive bound) and 89 do not
    wins = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "start": pa.array([90], pa.timestamp("us")),
            }
        )
    )
    pts = ray.data.from_arrow(
        pa.table({"ts": pa.array([89, 95, 110, 190], pa.timestamp("us"))})
    )
    out = an.interval_count_ds(wins, pts, "k", "start", "ts", width_us=100).take_all()
    assert [(r["k"], r["n_matched"]) for r in out] == [(1, 2)]


def test_interval_count_inner_semantics(ray_session):
    # a window with zero matches emits no row
    wins = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2], pa.int64()),
                "start": pa.array([0, 1000], pa.timestamp("us")),
            }
        )
    )
    pts = ray.data.from_arrow(pa.table({"ts": pa.array([5], pa.timestamp("us"))}))
    out = an.interval_count_ds(wins, pts, "k", "start", "ts", width_us=10).take_all()
    assert [(r["k"], r["n_matched"]) for r in out] == [(1, 1)]


def test_semi_join_dedups_right_multiplicity(ray_session):
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3], pa.int64()),
                "name": pa.array(["a", "b", "c"]),
            }
        )
    )
    right = ray.data.from_arrow(pa.table({"k": pa.array([2, 2, 2, 9], pa.int64())}))
    out = sorted((r["k"], r["name"]) for r in an.semi_join_ds(left, right, "k").take_all())
    assert out == [(2, "b")]


def test_hash_join_nm_multiplicity(ray_session):
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2, 3], pa.int64()),
                "lv": pa.array(["l0", "l1", "l2", "l3"]),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array([1, 1, 2, 9], pa.int64()),
                "rv": pa.array(["r0", "r1", "r2", "r9"]),
            }
        )
    )
    out = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in an.hash_join_ds(left, right, "k", "rk").take_all()
    )
    # key 1: 2x2 = 4 rows; key 2: 1; key 3 and 9 unmatched
    assert out == [
        (1, "l0", "r0"), (1, "l0", "r1"), (1, "l1", "r0"), (1, "l1", "r1"),
        (2, "l2", "r2"),
    ]


def test_hash_join_collision_guard(ray_session):
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "v": pa.array(["x"])})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([1], pa.int64()), "v": pa.array(["y"])})
    )
    with pytest.raises(ValueError, match="collision"):
        an.hash_join_ds(left, right, "k", "rk")


def test_window_frames_hand_computed(ray_session):
    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "user_id": pa.array([7, 7, 7, 7, 8], pa.int64()),
                "ts": pa.array([10, 20, 30, 40, 100], pa.timestamp("us")),
                "value": pa.array([1.0, 2.0, 3.0, 4.0, 9.0]),
            }
        )
    )
    out = {r["event_id"]: r for r in an.window_frames_ds(ev, trail_rows=3).take_all()}
    # run totals: 100, 300, 600, 1000; trailing-3: 100, 300, 600, 900
    assert [out[i]["run_total_e"] for i in (1, 2, 3, 4)] == [100, 300, 600, 1000]
    assert [out[i]["trail_e"] for i in (1, 2, 3, 4)] == [100, 300, 600, 900]
    assert [out[i]["delta_us"] for i in (1, 2, 3, 4)] == [-1, 10, 10, 10]
    assert out[5]["delta_us"] == -1 and out[5]["trail_e"] == 900


def test_ntile_sizing_rule(ray_session):
    # N=10, k=4 -> tiles of 3,3,2,2 over (v, id) order
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(10)), pa.int64()),
                "n_chars": pa.array([5, 5, 5, 5, 1, 1, 9, 9, 9, 9], pa.int64()),
            }
        )
    )
    out = {r["doc_id"]: r["tile"] for r in
           an.ntile_ds(docs, "n_chars", "doc_id", k=4).take_all()}
    # order: (1,4) (1,5) (5,0) (5,1) (5,2) (5,3) (9,6) (9,7) (9,8) (9,9)
    assert [out[i] for i in (4, 5, 0, 1, 2, 3, 6, 7, 8, 9)] == [
        1, 1, 1, 2, 2, 2, 3, 3, 4, 4
    ]


def test_ntile_more_tiles_than_rows(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "n_chars": pa.array([7, 3], pa.int64()),
            }
        )
    )
    out = {r["doc_id"]: r["tile"] for r in
           an.ntile_ds(docs, "n_chars", "doc_id", k=5).take_all()}
    assert out == {2: 1, 1: 2}


def test_cube_all_grouping_sets(ray_session):
    li = ray.data.from_arrow(
        pa.table(
            {
                "f": pa.array(["A", "A", "B"], pa.string()),
                "s": pa.array(["x", "y", "x"], pa.string()),
                "q": pa.array([1.0, 2.0, 4.0]),
            }
        )
    )
    rows = {
        (r["f"], r["s"]): (r["sum_e"], r["n_rows"])
        for r in an.rollup_ds(li, ["f", "s"], "q", mode="cube").take_all()
    }
    # cube adds the (s-only) sets rollup lacks
    assert rows[("ALL", "x")] == (500, 2)
    assert rows[("ALL", "y")] == (200, 1)
    assert rows[("A", "ALL")] == (300, 2)
    assert rows[("ALL", "ALL")] == (700, 3)
    assert len(rows) == 3 + 2 + 2 + 1


def test_moments_hand_computed(ray_session):
    li = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(["A", "A", "B"], pa.string()),
                "x": pa.array([1.0, 2.0, 3.0]),
                "y": pa.array([10.0, 20.0, 30.0]),
            }
        )
    )
    rows = {r["g"]: r for r in
            an.moments_ds(li, "g", "x", "y", x_quant=1, y_quant=1).take_all()}
    a = rows["A"]
    assert (a["n"], a["sum_x"], a["sum_y"]) == (2, 3, 30)
    assert (a["sum_xx"], a["sum_yy"], a["sum_xy"]) == (5, 500, 50)
    b = rows["B"]
    assert (b["n"], b["sum_xx"], b["sum_xy"]) == (1, 9, 90)


def test_transitions_hand_computed(ray_session):
    ev = _events(
        [
            # user 1: view -> click -> purchase (ordered by ts)
            (1, 1, 100, "view", 0),
            (2, 1, 200, "click", 0),
            (3, 1, 300, "purchase", 0),
            # user 2: click -> click (tie on ts broken by event_id)
            (4, 2, 500, "click", 0),
            (5, 2, 500, "click", 0),
            # user 3: single event, no transition
            (6, 3, 900, "view", 0),
        ]
    )
    rows = {
        (r["prev_type"], r["next_type"]): r["n_transitions"]
        for r in an.transitions_ds(ev).take_all()
    }
    assert rows == {
        ("view", "click"): 1,
        ("click", "purchase"): 1,
        ("click", "click"): 1,
    }


def test_transitions_empty_and_singletons(ray_session):
    ev = _events([(1, 1, 100, "view", 0), (2, 2, 200, "click", 0)])
    assert an.transitions_ds(ev).take_all() == []


def test_pivot_zero_cells_and_unlisted_category(ray_session):
    t = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array([2024, 2024, 2025], pa.int64()),
                "cat": pa.array(["A", "B", "ZZZ"], pa.string()),
                "v": pa.array([1.25, 2.0, 99.0], pa.float64()),
            }
        )
    )
    rows = {
        r["g"]: r
        for r in an.pivot_ds(
            t, "g", "cat", "v", categories=[("A", "a"), ("B", "b")], quant=100
        ).take_all()
    }
    # 2025's only row has an unlisted category -> the group vanishes
    # entirely (SQL FILTER semantics would keep an all-zero row only if
    # another listed row existed for that group)
    assert set(rows) == {2024}
    r = rows[2024]
    assert (r["n_a"], r["n_b"]) == (1, 1)
    assert (r["q_a"], r["q_b"]) == (125, 200)


def test_profile_nulls_distinct_minmax(ray_session):
    t = ray.data.from_arrow(
        pa.table(
            {
                "x": pa.array([1.0, 1.0, 2.5, None], pa.float64()),
                "y": pa.array([-3.0, 0.0, 0.0, 7.0], pa.float64()),
            }
        )
    )
    rows = {
        r["column_name"]: r
        for r in an.profile_ds(t, columns=[("x", 100), ("y", 1)]).take_all()
    }
    x = rows["x"]
    assert (x["n_rows"], x["n_nulls"], x["n_distinct"]) == (4, 1, 2)
    assert (x["min_q"], x["max_q"]) == (100, 250)
    y = rows["y"]
    assert (y["n_rows"], y["n_nulls"], y["n_distinct"]) == (4, 0, 3)
    assert (y["min_q"], y["max_q"]) == (-3, 7)


def test_set_overlap_segments(ray_session):
    ev = _events(
        [
            (1, 1, 100, "click", 0),
            (2, 1, 200, "purchase", 0),
            (3, 2, 300, "click", 0),
            (4, 3, 400, "purchase", 0),
            (5, 4, 500, "view", 0),  # neither -> dropped
        ]
    )
    rows = {
        r["user_id"]: r["segment"]
        for r in an.set_overlap_ds(
            ev, type_a="click", type_b="purchase",
            label_a="click_only", label_b="purchase_only",
        ).take_all()
    }
    assert rows == {1: "both", 2: "click_only", 3: "purchase_only"}


def test_user_paths_ordered_concat(ray_session):
    ev = _events(
        [
            (1, 1, 100, "view", 0),
            (3, 1, 300, "purchase", 0),
            (2, 1, 200, "click", 0),
            # user 2: tie on ts broken by event_id (4 before 5)
            (5, 2, 500, "a", 0),
            (4, 2, 500, "b", 0),
            (6, 3, 900, "view", 0),
        ]
    )
    rows = {r["user_id"]: r["path"] for r in an.user_paths_ds(ev).take_all()}
    assert rows == {1: "view>click>purchase", 2: "b>a", 3: "view"}


def test_user_paths_bucket_invariant(ray_session):
    ev = _events([(i, i % 7, i * 10, "e%d" % (i % 3), 0) for i in range(60)])
    a = {r["user_id"]: r["path"] for r in an.user_paths_ds(ev, n_buckets=2).take_all()}
    b = {r["user_id"]: r["path"] for r in an.user_paths_ds(ev, n_buckets=64).take_all()}
    assert a == b and len(a) == 7


def test_skyline_keep_kernel():
    x = np.array([1, 2, 3, 2, 3], dtype=np.int64)
    y = np.array([5, 4, 3, 2, 3], dtype=np.int64)
    # frontier: (1,5), (2,4), (3,3) twice (duplicates both survive);
    # (2,2) is dominated by (2,4) (equal x, strictly smaller y)
    assert an._skyline_keep(x, y).tolist() == [True, True, True, False, True]
    # equal-y domination across x: (1,3) dominated by (3,3)
    x2 = np.array([1, 3], dtype=np.int64)
    y2 = np.array([3, 3], dtype=np.int64)
    assert an._skyline_keep(x2, y2).tolist() == [False, True]


def test_skyline_ds_merges_local_frontiers(ray_session):
    # points that are locally non-dominated inside a block can still be
    # dominated globally — force multiple blocks and check the merge
    ids = np.arange(8, dtype=np.int64)
    x = np.array([10, 9, 8, 1, 10, 2, 3, 7], dtype=np.int64)
    y = np.array([1, 2, 3, 9, 2, 8, 7, 3], dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
            }
        )
    ).repartition(4)
    out = {r["id"] for r in an.skyline_ds(ds, "id", "x", "y").take_all()}
    keep = an._skyline_keep(x, y)
    assert out == set(ids[keep].tolist())
    # (10,1) id=0 is dominated by (10,2) id=4; (8,3)=2 and (7,3)=7: 7 dominated
    assert 0 not in out and 7 not in out and 4 in out


def test_grouped_mode_tiebreak_and_counts(ray_session):
    ev = _events(
        [
            # user 1: click x2, view x2 -> tie broken lexicographically (click)
            (1, 1, 100, "click", 0),
            (2, 1, 200, "click", 0),
            (3, 1, 300, "view", 0),
            (4, 1, 400, "view", 0),
            # user 2: purchase x3 beats click x1
            (5, 2, 500, "purchase", 0),
            (6, 2, 600, "purchase", 0),
            (7, 2, 700, "purchase", 0),
            (8, 2, 800, "click", 0),
        ]
    )
    rows = {
        r["user_id"]: (r["mode_type"], r["n_events"])
        for r in an.grouped_mode_ds(ev, mode_col="mode_type").take_all()
    }
    assert rows == {1: ("click", 2), 2: ("purchase", 3)}


def test_grouped_mode_bucket_invariant(ray_session):
    ev = _events(
        [(i, i % 5, i * 10, "e%d" % (i % 3), 0) for i in range(90)]
    )
    a = {
        (r["user_id"], r["mode_type"], r["n_events"])
        for r in an.grouped_mode_ds(ev, mode_col="mode_type", n_buckets=2).take_all()
    }
    b = {
        (r["user_id"], r["mode_type"], r["n_events"])
        for r in an.grouped_mode_ds(ev, mode_col="mode_type", n_buckets=64).take_all()
    }
    assert a == b and len(a) == 5


def test_attribution_first_last_and_ties(ray_session):
    ev = _events(
        [
            (3, 1, 300, "purchase", 0),
            (1, 1, 100, "view", 0),
            (2, 1, 200, "click", 0),
            # user 2: ts ties resolved by event_id on both ends
            (5, 2, 500, "b", 0),
            (4, 2, 500, "a", 0),
            (6, 2, 500, "c", 0),
        ]
    )
    rows = {r["user_id"]: r for r in an.attribution_ds(ev).take_all()}
    r1 = rows[1]
    assert (r1["first_type"], r1["first_ts_us"]) == ("view", 100)
    assert (r1["last_type"], r1["last_ts_us"]) == ("purchase", 300)
    assert r1["n_events"] == 3
    r2 = rows[2]
    assert (r2["first_type"], r2["last_type"], r2["n_events"]) == ("a", "c", 3)


def test_attribution_single_event_user(ray_session):
    ev = _events([(1, 9, 777, "view", 0)])
    [r] = an.attribution_ds(ev).take_all()
    assert r["first_type"] == r["last_type"] == "view"
    assert r["first_ts_us"] == r["last_ts_us"] == 777 and r["n_events"] == 1


def _orders(rows):
    """rows: list of (o_orderkey, o_orderdate_us, o_totalprice)."""
    return ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_orderdate": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "o_totalprice": pa.array([float(r[2]) for r in rows], pa.float64()),
            }
        )
    )


DAY = 86_400_000_000
MONTH_JAN = 0  # 1970-01
MONTH_FEB = 31 * DAY


def test_sessions_gap_split_and_ordinals(ray_session):
    g = 1_800_000_000  # 30 min
    ev = _events(
        [
            # user 1: two sessions (events 1-2 close, 3 after a big gap)
            (1, 1, 0, "a", 0),
            (2, 1, g, "a", 0),          # exactly gap -> same session
            (3, 1, 3 * g + 1, "a", 0),  # > gap after event 2 -> new session
            # user 2: one session of one event
            (4, 2, 50, "a", 0),
        ]
    )
    rows = {
        (r["user_id"], r["session_id"]): (r["start_us"], r["end_us"], r["n_events"])
        for r in an.sessions_ds(ev).take_all()
    }
    assert rows == {
        (1, 1): (0, g, 2),
        (1, 2): (3 * g + 1, 3 * g + 1, 1),
        (2, 1): (50, 50, 1),
    }


def test_sessions_bucket_invariant(ray_session):
    ev = _events(
        [(i, i % 7, (i // 7) * 2_000_000_000, "a", 0) for i in range(70)]
    )
    a = {tuple(sorted(r.items())) for r in an.sessions_ds(ev, n_buckets=2).take_all()}
    b = {tuple(sorted(r.items())) for r in an.sessions_ds(ev, n_buckets=64).take_all()}
    assert a == b and len(a) == 70  # every event 2000s apart -> own session


def test_ohlc_bars_open_close_tiebreak(ray_session):
    orders = _orders(
        [
            # Jan: two orders share the earliest date -> open from lower key
            (10, MONTH_JAN + DAY, 5.00),
            (7, MONTH_JAN + DAY, 3.00),
            (12, MONTH_JAN + 5 * DAY, 9.50),
            # Feb: single order
            (20, MONTH_FEB + DAY, 2.25),
        ]
    )
    rows = {r["ym"]: r for r in an.ohlc_bars_ds(orders).take_all()}
    jan = rows[197001]
    assert jan["open_cents"] == 300 and jan["close_cents"] == 950
    assert jan["high_cents"] == 950 and jan["low_cents"] == 300
    assert jan["n_orders"] == 3 and jan["total_cents"] == 1750
    feb = rows[197002]
    assert feb["open_cents"] == feb["close_cents"] == 225
    assert feb["n_orders"] == 1


def test_period_over_period_lag_and_sentinel(ray_session):
    orders = _orders(
        [
            (1, MONTH_JAN, 1.00),
            (2, MONTH_JAN, 2.00),
            (3, MONTH_FEB, 10.00),
        ]
    )
    rows = sorted(
        an.period_over_period_ds(orders).take_all(), key=lambda r: r["ym"]
    )
    assert [
        (r["ym"], r["cents"], r["prev_cents"], r["delta_cents"]) for r in rows
    ] == [(197001, 300, -1, 0), (197002, 1000, 300, 700)]


def test_hash_join_left_keeps_unmatched(ray_session):
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3], pa.int64()),
                "lv": pa.array(["a", "b", "c"], pa.string()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array([2, 2], pa.int64()),
                "rv": pa.array([10, 20], pa.int64()),
            }
        )
    )
    out = an.hash_join_ds(left, right, "k", "rk", how="left").take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
    assert got == [(1, "a", None), (2, "b", 10), (2, "b", 20), (3, "c", None)]
    inner = an.hash_join_ds(left, right, "k", "rk").take_all()
    assert sorted((r["k"], r["rv"]) for r in inner) == [(2, 10), (2, 20)]


def test_zscore_hand_computed_and_constant_group(ray_session):
    import math

    ev = _events(
        [
            (1, 1, 0, "t", 1.00),   # v_q 100
            (2, 1, 0, "t", 2.00),   # v_q 200
            (3, 1, 0, "t", 3.00),   # v_q 300
            (4, 1, 0, "c", 5.00),   # constant group -> z 0
            (5, 1, 0, "c", 5.00),
        ]
    )
    rows = {r["event_id"]: r for r in an.zscore_ds(ev).take_all()}
    # group t: n=3 s=600 ss=140000; den2 = 3*140000 - 360000 = 60000
    den = math.sqrt(60000.0)
    for eid, v in ((1, 100), (2, 200), (3, 300)):
        want = int(np.floor((3 * v - 600) / den * 1e6))
        assert rows[eid]["z_e6"] == want, eid
    assert rows[4]["z_e6"] == 0 and rows[5]["z_e6"] == 0
    assert rows[1]["v_q"] == 100


def test_grouped_percentiles_disc_selection(ray_session):
    # group t: values 1..4 -> p25 = ceil(.25*4)=rank1 -> 100;
    # p50 = rank2 -> 200; p75 = rank3 -> 300
    ev = _events(
        [
            (1, 1, 0, "t", 1.00),
            (2, 1, 0, "t", 2.00),
            (3, 1, 0, "t", 3.00),
            (4, 1, 0, "t", 4.00),
            # group s: single value -> every percentile is it
            (5, 1, 0, "s", 7.50),
        ]
    )
    rows = {r["event_type"]: r for r in an.grouped_percentiles_ds(ev).take_all()}
    t = rows["t"]
    assert (t["n"], t["p25_q"], t["p50_q"], t["p75_q"]) == (4, 100, 200, 300)
    s = rows["s"]
    assert (s["n"], s["p25_q"], s["p50_q"], s["p75_q"]) == (1, 750, 750, 750)


def test_grouped_percentiles_duplicate_values(ray_session):
    # duplicates collapse into one weighted cell; ranks land inside it
    ev = _events([(i, 1, 0, "t", 5.00) for i in range(1, 10)] + [(10, 1, 0, "t", 9.0)])
    [r] = an.grouped_percentiles_ds(ev).take_all()
    assert (r["p25_q"], r["p50_q"], r["p75_q"]) == (500, 500, 500)
    assert r["n"] == 10


def test_reorder_gaps_sentinels_and_bounds(ray_session):
    orders3 = ray.data.from_arrow(
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
                "o_orderdate": pa.array([0, 10 * DAY, 40 * DAY, 5], pa.timestamp("us")),
                "o_orderkey": pa.array([100, 101, 102, 103], pa.int64()),
            }
        )
    )
    rows = {r["custkey"]: r for r in an.reorder_gaps_ds(orders3).take_all()}
    c1 = rows[1]
    assert c1["n_orders"] == 3
    assert (c1["first_us"], c1["last_us"]) == (0, 40 * DAY)
    assert (c1["min_gap_us"], c1["max_gap_us"]) == (10 * DAY, 30 * DAY)
    c2 = rows[2]
    assert (c2["n_orders"], c2["min_gap_us"], c2["max_gap_us"]) == (1, -1, -1)


def test_customer_region_share_permille(ray_session):
    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
                "o_totalprice": pa.array([1.00, 2.00, 7.00, 5.00], pa.float64()),
            }
        )
    )
    customer = ray.data.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_nationkey": pa.array([10, 11, 20], pa.int64()),
            }
        )
    )
    nation_rows = [
        {"n_nationkey": 10, "n_regionkey": 0},
        {"n_nationkey": 11, "n_regionkey": 0},
        {"n_nationkey": 20, "n_regionkey": 1},
    ]
    rows = {
        r["custkey"]: r
        for r in an.customer_region_share_ds(orders, customer, nation_rows).take_all()
    }
    # region 0 total 1000 cents: cust1 300 -> 300 permille, cust2 700 -> 700
    assert (rows[1]["regionkey"], rows[1]["cents"], rows[1]["share_permille"]) == (0, 300, 300)
    assert rows[2]["share_permille"] == 700
    # region 1: cust3 is the whole region
    assert (rows[3]["regionkey"], rows[3]["share_permille"]) == (1, 1000)


def test_session_baskets_pairs_and_counts(ray_session):
    g = 1_800_000_000
    ev = _events(
        [
            # user 1 session 1: types a, b, a -> distinct {a,b} -> pair (a,b)
            (1, 1, 0, "a", 0),
            (2, 1, 10, "b", 0),
            (3, 1, 20, "a", 0),
            # user 1 session 2: {a} only -> no pair
            (4, 1, 10 * g, "a", 0),
            # user 2 one session: {a, b, c} -> 3 pairs
            (5, 2, 0, "c", 0),
            (6, 2, 5, "a", 0),
            (7, 2, 9, "b", 0),
        ]
    )
    rows = {
        (r["type_a"], r["type_b"]): r["n_sessions"]
        for r in an.session_baskets_ds(ev).take_all()
    }
    assert rows == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_group_sample_ids_head_and_count(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([9, 3, 7, 1, 5, 11, 2], pa.int64()),
                "lang": pa.array(["en"] * 6 + ["de"], pa.string()),
            }
        )
    ).repartition(3)
    rows = {r["lang"]: r for r in an.group_sample_ids_ds(docs, k=3).take_all()}
    assert rows["en"]["ids"] == "1,3,5" and rows["en"]["n_docs"] == 6
    assert rows["de"]["ids"] == "2" and rows["de"]["n_docs"] == 1


def test_bloom_semi_join_flags_and_fp_containment(ray_session):
    probe = ray.data.from_arrow(
        pa.table({"k": pa.array(list(range(100)), pa.int64())})
    )
    build = ray.data.from_arrow(
        pa.table({"bk": pa.array([3, 7, 7, 42], pa.int64())})
    ).repartition(2)
    rows = {
        r["custkey"]: (r["bloom_pass"], r["actual"])
        for r in an.bloom_semi_join_ds(probe, build, "k", "bk").take_all()
    }
    assert len(rows) == 100
    # every true member passes the filter (no false negatives, ever)
    for k in (3, 7, 42):
        assert rows[k] == (1, 1)
    # non-members are never 'actual'; bloom false positives are allowed
    others = [rows[k] for k in rows if k not in (3, 7, 42)]
    assert all(a == 0 for _, a in others)
    # at 3 keys in 65536 bits the FP rate is ~0 on 97 probes
    assert sum(b for b, _ in others) <= 1


def test_bloom_semi_join_partition_invariant(ray_session):
    probe = ray.data.from_arrow(
        pa.table({"k": pa.array(list(range(500)), pa.int64())})
    )
    bvals = pa.table({"bk": pa.array([i * 3 for i in range(100)], pa.int64())})
    one = an.bloom_semi_join_ds(
        probe, ray.data.from_arrow(bvals).repartition(1), "k", "bk"
    ).take_all()
    many = an.bloom_semi_join_ds(
        probe, ray.data.from_arrow(bvals).repartition(13), "k", "bk"
    ).take_all()
    key = lambda r: (r["custkey"], r["bloom_pass"], r["actual"])
    assert sorted(map(key, one)) == sorted(map(key, many))


def test_cms_counts_overcount_only_and_partition_invariance(ray_session):
    items = ray.data.from_arrow(
        pa.table({"k": pa.array([1] * 50 + [2] * 30 + list(range(100, 400)), pa.int64())})
    )
    one = {r["key"]: (r["est"], r["actual"]) for r in an.cms_counts_ds(items.repartition(1), "k").take_all()}
    many = {r["key"]: (r["est"], r["actual"]) for r in an.cms_counts_ds(items.repartition(11), "k").take_all()}
    assert one == many  # SUM merge of counters is partition-invariant
    assert one[1][1] == 50 and one[2][1] == 30
    # count-min never undercounts
    assert all(est >= actual for est, actual in one.values())
    # heavy keys estimate close to exact (width 1024 >> 302 keys)
    assert one[1][0] >= 50 and one[1][0] <= 50 + 330


def test_interval_merge_overlap_touch_and_gap(ray_session):
    m = 60_000_000  # value=1.0 -> 1 minute in us
    ev = _events(
        [
            # user 1: [0, 10m], [5m, 15m] overlap; [15m, 16m] touches ->
            # one island of 3; [20m, 21m] is separate
            (1, 1, 0, "a", 10.0),
            (2, 1, 5 * m, "a", 10.0),
            (3, 1, 15 * m, "a", 1.0),
            (4, 1, 20 * m, "a", 1.0),
            # user 2: zero/negative durations -> point intervals; identical
            # starts merge (touching), distinct starts do not
            (5, 2, 100, "a", 0.0),
            (6, 2, 100, "a", -5.0),
            (7, 2, 200, "a", 0.0),
        ]
    )
    rows = {
        (r["user_id"], r["start_us"]): (r["end_us"], r["n_iv"])
        for r in an.interval_merge_ds(ev).take_all()
    }
    assert rows == {
        (1, 0): (16 * m, 3),
        (1, 20 * m): (21 * m, 1),
        (2, 100): (100, 2),
        (2, 200): (200, 1),
    }


def test_interval_merge_partition_invariant(ray_session):
    # chains long enough to cross block-combine boundaries
    rng = np.random.RandomState(7)
    rows = []
    for i in range(400):
        u = i % 5
        rows.append((i, u, int(rng.randint(0, 10_000) * 1_000_000), "a",
                     float(rng.randint(0, 300)) / 60.0))
    ev1 = _events(rows).repartition(1)
    ev2 = _events(rows).repartition(13)
    a = {tuple(sorted(r.items()))
         for r in an.interval_merge_ds(ev1, n_buckets=2).take_all()}
    b = {tuple(sorted(r.items()))
         for r in an.interval_merge_ds(ev2, n_buckets=64).take_all()}
    assert a == b and len(a) >= 5
    # island interval counts must account for every input row
    assert sum(dict(t)["n_iv"] for t in a) == 400


def test_ks_drift_hand_computed(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(["a"] * 4 + ["b"] * 2),
                "n_chars": pa.array([1, 2, 3, 4, 3, 4], pa.int64()),
            }
        )
    )
    (r,) = an.ks_drift_ds(docs).take_all()
    # cdf_a = [1,2,3,4]/4, cdf_b = [0,0,1,2]/2 at v=1..4
    # cross-multiplied max gap: v=2 -> |2*2 - 0*4| = 4
    assert (r["src_a"], r["src_b"]) == ("a", "b")
    assert (r["n_a"], r["n_b"], r["ks_num"]) == (4, 2, 4)
    assert r["ks_permille"] == 4 * 1000 // 8


def test_ks_drift_identical_distributions(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(["a", "a", "b", "b"]),
                "n_chars": pa.array([5, 9, 5, 9], pa.int64()),
            }
        )
    )
    (r,) = an.ks_drift_ds(docs).take_all()
    assert r["ks_num"] == 0 and r["ks_permille"] == 0


def test_trend_exact_components(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "x": pa.array([0, 1, 2, 5, 5], pa.int64()),
                "y": pa.array([3, 5, 7, 4, 9], pa.int64()),
            }
        )
    )
    rows = {r["g"]: r for r in an.trend_ds(ds, "g", "x", "y").take_all()}
    # group 1: perfect slope 2 -> num = 3*24 - 3*15 = 12? check by hand:
    # n=3 sx=3 sy=15 sxy=0*3+1*5+2*7=19 sxx=5
    # num = 3*19 - 3*15 = 12; den = 3*5 - 9 = 6 -> slope 2 exactly
    assert (rows["1"]["slope_num"], rows["1"]["slope_den"]) == (12, 6)
    # group 2: constant x -> degenerate den = 0
    assert rows["2"]["slope_den"] == 0 and rows["2"]["n"] == 2


def test_row_number_global_and_descending(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "v": pa.array([10, 30, 10, 20, 30], pa.int64()),
            }
        )
    ).repartition(3)
    asc = {r["id"]: r["rn"] for r in an.row_number_ds(ds, "v", "id").take_all()}
    assert asc == {1: 1, 3: 2, 4: 3, 2: 4, 5: 5}
    desc = {
        r["id"]: r["rn"]
        for r in an.row_number_ds(ds, "v", "id", descending=True).take_all()
    }
    assert desc == {2: 1, 5: 2, 4: 3, 1: 4, 3: 5}


def test_rrf_fusion_hand_computed(ray_session):
    # ids 1..4; metric a ranks 1,2,3,4 ; metric b ranks 4,3,2,1
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "a": pa.array([40, 30, 20, 10], pa.int64()),
                "b": pa.array([1, 2, 3, 4], pa.int64()),
            }
        )
    ).repartition(2)
    rows = an.rrf_fusion_ds(ds, "id", "a", "b", topk=3).take_all()
    e9 = 10**9
    # symmetric rank pairs -> identical scores; id ASC breaks ties
    s_outer = e9 // 61 + e9 // 64   # ranks (1,4) or (4,1)
    s_inner = e9 // 62 + e9 // 63   # ranks (2,3) or (3,2)
    assert [r["id"] for r in rows] == [1, 4, 2]
    assert rows[0]["rrf_e9"] == s_outer and rows[2]["rrf_e9"] == s_inner
    assert (rows[0]["rank_a"], rows[0]["rank_b"]) == (1, 4)


def test_zorder_key_interleave_and_file_id(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "x": pa.array([0b1010, 0, 65535], pa.int64()),
                "y": pa.array([0b0101, 0, 65535], pa.int64()),
            }
        )
    )
    rows = {r["id"]: (r["zkey"], r["file_id"])
            for r in an.zorder_key_ds(ds, "id", "x", "y").take_all()}
    # x bits at even positions, y at odd: x=1010b,y=0101b -> 10011001b + ...
    z1 = sum(((0b1010 >> i) & 1) << (2 * i) for i in range(16)) + sum(
        ((0b0101 >> i) & 1) << (2 * i + 1) for i in range(16)
    )
    assert rows[1] == (z1, z1 >> 26)
    assert rows[2] == (0, 0)
    assert rows[3] == ((1 << 32) - 1, 63)
    # locality: nearby (x, y) share the file prefix more than far pairs
    near = an.zorder_key_ds(
        ray.data.from_arrow(
            pa.table(
                {
                    "id": pa.array([1, 2], pa.int64()),
                    "x": pa.array([1000, 1001], pa.int64()),
                    "y": pa.array([2000, 2000], pa.int64()),
                }
            )
        ),
        "id", "x", "y",
    ).take_all()
    assert near[0]["file_id"] == near[1]["file_id"]


def test_collapse_runs_heads_and_lengths(ray_session):
    ev = _events(
        [
            # user 1: a a b a  -> runs a(2) b(1) a(1); ids NOT monotone
            (9, 1, 0, "a", 0),
            (2, 1, 10, "a", 0),
            (3, 1, 20, "b", 0),
            (4, 1, 30, "a", 0),
            # user 2: single row
            (5, 2, 5, "x", 0),
        ]
    )
    rows = {
        (r["user_id"], r["start_us"]): (r["event_id"], r["event_type"], r["run_len"])
        for r in an.collapse_runs_ds(ev).take_all()
    }
    assert rows == {
        (1, 0): (9, "a", 2),    # head id is the FIRST row's id (9), not min
        (1, 20): (3, "b", 1),
        (1, 30): (4, "a", 1),
        (2, 5): (5, "x", 1),
    }


def test_collapse_runs_partition_invariant(ray_session):
    ev = _events(
        [(i, i % 3, i * 1000, "t" + str((i // 4) % 2), 0) for i in range(60)]
    )
    a = {tuple(sorted(r.items()))
         for r in an.collapse_runs_ds(ev.repartition(1), n_buckets=2).take_all()}
    b = {tuple(sorted(r.items()))
         for r in an.collapse_runs_ds(ev.repartition(7), n_buckets=32).take_all()}
    assert a == b
    assert sum(dict(t)["run_len"] for t in a) == 60


def test_stream_join_window_bounds_and_expansion(ray_session):
    s = 1_000_000
    ev = _events(
        [
            (1, 1, 0, "click", 0),
            (2, 1, 0, "view", 0),          # gap 0 included
            (3, 1, 10 * s, "view", 0),     # inside window
            (4, 1, 60 * s, "view", 0),     # exactly window edge included
            (5, 1, 61 * s, "view", 0),     # outside
            (6, 1, 30 * s, "click", 0),    # second A: matches 4 (30s) not 3
            (7, 2, 0, "view", 0),          # other user never matches
        ]
    )
    rows = {(r["a_id"], r["b_id"]): r["gap_us"] for r in
            an.stream_join_ds(ev, "click", "view", window_us=60 * s).take_all()}
    assert rows == {
        (1, 2): 0,
        (1, 3): 10 * s,
        (1, 4): 60 * s,
        (6, 4): 30 * s,
        (6, 5): 31 * s,
    }


def test_stream_join_partition_invariant_and_empty_side(ray_session):
    ev = _events(
        [(i, i % 4, i * 10_000_000, "click" if (i // 4) % 2 else "view", 0)
         for i in range(80)]
    )
    a = {tuple(sorted(r.items())) for r in an.stream_join_ds(
        ev.repartition(1), "click", "view", 120_000_000, n_buckets=2).take_all()}
    b = {tuple(sorted(r.items())) for r in an.stream_join_ds(
        ev.repartition(9), "click", "view", 120_000_000, n_buckets=64).take_all()}
    assert a == b and len(a) > 0
    none = an.stream_join_ds(ev, "click", "nope", 120_000_000).take_all()
    assert none == []


def test_fk_audit_detects_orphans(ray_session):
    child = ray.data.from_arrow(
        pa.table({"fk": pa.array([1, 1, 2, 3, 9, 9, 9], pa.int64())})
    )
    parent = ray.data.from_arrow(
        pa.table({"pk": pa.array([1, 2, 4], pa.int64())})
    )
    (r,) = an.fk_audit_ds([("c->p", child, "fk", parent, "pk")]).take_all()
    assert r["relationship"] == "c->p"
    assert (r["child_rows"], r["distinct_fks"]) == (7, 4)
    # 3 and 9 are orphans: 1 + 3 rows, 2 distinct keys
    assert (r["orphan_rows"], r["orphan_keys"]) == (4, 2)


def test_fk_audit_cross_block_distincts(ray_session):
    # the same fk in many blocks must not double-count distinct_fks
    child = ray.data.from_arrow(
        pa.table({"fk": pa.array([5] * 40, pa.int64())})
    ).repartition(8)
    parent = ray.data.from_arrow(pa.table({"pk": pa.array([5], pa.int64())}))
    (r,) = an.fk_audit_ds([("x", child, "fk", parent, "pk")]).take_all()
    assert (r["child_rows"], r["distinct_fks"], r["orphan_rows"]) == (40, 1, 0)


def test_scd2_versions_and_open_interval(ray_session):
    ev = _events(
        [
            (1, 1, 100, "a", 0),
            (2, 1, 200, "b", 0),
            (3, 1, 300, "a", 0),
            (4, 2, 50, "x", 0),
        ]
    )
    rows = {(r["user_id"], r["version"]): (r["event_type"], r["valid_from_us"], r["valid_to_us"])
            for r in an.scd2_ds(ev).take_all()}
    OPEN = 4_102_444_800_000_000
    assert rows == {
        (1, 1): ("a", 100, 200),
        (1, 2): ("b", 200, 300),
        (1, 3): ("a", 300, OPEN),
        (2, 1): ("x", 50, OPEN),
    }


def test_winsorize_cutoff_and_flags(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(list(range(1, 101)), pa.int64()),
                "v": pa.array(list(range(1, 101)), pa.int64()),
            }
        )
    ).repartition(4)
    rows = {r["id"]: (r["clipped"], r["was_clipped"]) for r in
            an.winsorize_ds(ds, "v", "id", pct=90).take_all()}
    # rank = (90*100+99)//100 = 90 -> cutoff value 90
    assert rows[90] == (90, 0)
    assert rows[91] == (90, 1) and rows[100] == (90, 1)
    assert rows[1] == (1, 0)
    assert sum(c for _, c in rows.values()) == 10


def test_rank_sum_hand_computed_and_invariant(ray_session):
    # a: [1, 2, 2], b: [2, 3] pooled sorted: 1 a, 2 a a b (tie of 3), 3 b
    docs = ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array(["en", "en", "en", "de", "de"]),
                "n_chars": pa.array([1, 2, 2, 2, 3], pa.int64()),
            }
        )
    )
    (r,) = an.rank_sum_ds(docs, "lang", "n_chars", "en", "de").take_all()
    # doubled midranks: value 1 -> 2; value-2 run (ranks 2-4) -> 6; value 3 -> 10
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert r["r2_a"] == 2 + 6 + 6
    assert r["u2_a"] == 14 - 3 * 4 and r["u2_a"] + r["u2_b"] == 2 * 3 * 2


def test_assoc_rules_kernel(ray_session):
    import pyarrow as pa

    # 3 sessions for user 1 (gap > 30 min splits), 1 for user 2:
    # s1: {view, click}, s2: {view}, s3: {view, click, buy}, s4: {click}
    us = 1_000_000
    rows = [
        (1, 0 * us, 1, "view"), (2, 60 * us, 1, "click"),
        (3, 10_000_000_000, 1, "view"),
        (4, 20_000_000_000, 1, "view"), (5, 20_000_000_000 + us, 1, "click"),
        (6, 20_000_000_000 + 2 * us, 1, "buy"),
        (7, 0, 2, "click"),
    ]
    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )
    out = {
        (r["antecedent"], r["consequent"]): r
    for r in an.assoc_rules_ds(ev).take_all()}
    # marginals: view 3, click 3, buy 1; S = 4
    r = out[("view", "click")]
    assert r["n_ante"] == 3 and r["n_cons"] == 3 and r["n_both"] == 2
    assert r["n_sessions"] == 4
    assert r["conf_e6"] == 1_000_000 * 2 // 3
    assert r["lift_e6"] == 1_000_000 * 2 * 4 // 9
    # rule mirror has different confidence denominator
    r2 = out[("buy", "view")]
    assert r2["n_ante"] == 1 and r2["n_both"] == 1
    assert r2["conf_e6"] == 1_000_000
    assert ("buy", "click") in out and out[("click", "buy")]["conf_e6"] == 333_333


def test_snapshot_diff_kernel(ray_session):
    import pyarrow as pa

    old = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3], pa.int64()),
                "v": pa.array(["a", "b", "c"], pa.string()),
            }
        )
    )
    new = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([2, 3, 4], pa.int64()),
                "v": pa.array(["b", "CHANGED", "d"], pa.string()),
            }
        )
    )
    out = {
        r["key"]: r
        for r in an.snapshot_diff_ds(old, new, "k", ["v"]).take_all()
    }
    # key 2 unchanged -> dropped; 1 removed, 3 changed, 4 added
    assert set(out) == {1, 3, 4}
    assert out[1]["status"] == "removed" and out[1]["new_h63"] == -1
    assert out[4]["status"] == "added" and out[4]["old_h63"] == -1
    assert out[3]["status"] == "changed"
    assert out[3]["old_h63"] != out[3]["new_h63"] >= 0


def test_snapshot_diff_rejects_dup_keys(ray_session):
    import pyarrow as pa
    import pytest

    dup = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1], pa.int64()),
                "v": pa.array(["a", "b"], pa.string()),
            }
        )
    )
    ok = ray.data.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "v": pa.array(["a"], pa.string())})
    )
    with pytest.raises(Exception):
        an.snapshot_diff_ds(dup, ok, "k", ["v"]).take_all()


def test_throttle_events_kernel(ray_session):
    import pyarrow as pa

    hour = 3_600_000_000
    # user 1: three events in hour 0 (keep first by ts, then id tie),
    # one in hour 1; user 2: one event
    rows = [
        (5, 100, 1), (2, 100, 1), (3, 200, 1),   # hour 0: keep id 2
        (7, hour + 1, 1),                        # hour 1: keep id 7
        (9, 50, 2),
    ]
    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )
    kept = sorted(
        r["event_id"] for r in an.throttle_events_ds(ev, window_us=hour).take_all()
    )
    assert kept == [2, 7, 9]


def test_decayed_sum_kernel(ray_session):
    import pyarrow as pa

    day = 86_400_000_000
    anchor = 10 * day
    # user 1: 100.00 at age 0, 100.00 at age 1 (halved), 100.37 at age 2
    ev = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "ts": pa.array(
                    [10 * day - 1, 9 * day, 8 * day, 0], pa.timestamp("us")
                ),
                "value": pa.array([100.0, 100.0, 100.37, 64.0], pa.float64()),
            }
        )
    )
    out = {r["user_id"]: r for r in an.decayed_sum_ds(ev, anchor_us=anchor).take_all()}
    # ages: (1)//day=0, 1, 2 -> 10000 + 5000 + 10037//4=2509
    assert out[1]["decayed_cents"] == 10000 + 5000 + 2509
    assert out[1]["n_events"] == 3
    # user 2 at age 10: 6400 // 1024 = 6
    assert out[2]["decayed_cents"] == 6


def test_chi2_assoc_independence_is_zero(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # perfectly independent 2x2 (equal counts): every cell O == E
    docs = ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array(["en", "en", "de", "de"] * 5, pa.string()),
                "source": pa.array(["a", "b", "a", "b"] * 5, pa.string()),
            }
        )
    )
    rows = an.chi2_assoc_ds(docs).take_all()
    assert len(rows) == 4
    assert all(r["contrib_e6"] == 0 for r in rows)
    assert all(r["observed"] == 5 and r["expected_e3"] == 5000 for r in rows)


def test_chi2_assoc_dependence_positive(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # perfectly dependent: lang determines source
    docs = ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array(["en"] * 10 + ["de"] * 10, pa.string()),
                "source": pa.array(["a"] * 10 + ["b"] * 10, pa.string()),
            }
        )
    )
    total = sum(r["contrib_e6"] for r in an.chi2_assoc_ds(docs).take_all())
    # chi2 of a perfect 2x2 association = N = 20 -> 20e6 in e6
    assert total == 20_000_000


def test_trending_topk_and_ties(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    h = 3_600_000_000
    ts = [0] * 6 + [h] * 2
    types = ["b", "b", "b", "a", "a", "c", "z", "y"]
    ev = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(types, pa.string()),
            }
        )
    )
    out = sorted(
        an.trending_ds(ev, k=2).take_all(),
        key=lambda r: (r["window_start_us"], r["rank"]),
    )
    assert [(r["window_start_us"], r["event_type"], r["n"], r["rank"]) for r in out] == [
        (0, "b", 3, 1),
        (0, "a", 2, 2),
        (h, "y", 1, 1),  # tie n=1 broken by type ASC
        (h, "z", 1, 2),
    ]


def test_robust_scale_truncating_division(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # values 1..4: ranks (p*4+99)//100 -> p25=1(rank1), p50=2(rank2), p75=3(rank3)
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "source": pa.array(["s"] * 4, pa.string()),
                "n_chars": pa.array([1, 2, 3, 4], pa.int64()),
            }
        )
    )
    rows = {r["doc_id"]: r for r in an.robust_scale_ds(docs, "n_chars", "doc_id").take_all()}
    assert rows[1]["median_v"] == 2 and rows[1]["iqr"] == 2
    # (1-2)*1e6 // 2 truncates toward zero: -500000 (not -500001)
    assert rows[1]["scaled_e6"] == -500_000
    assert rows[4]["scaled_e6"] == 1_000_000
    assert all(r["zero_iqr"] == 0 for r in rows.values())


def test_keyness_exclusive_term_tops(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # "zzz" appears only in src b -> highest lift there
    docs = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(["a", "a", "b"], pa.string()),
                "text": pa.array(["w w w w", "w w w w", "zzz w"], pa.string()),
            }
        )
    )
    rows = [r for r in an.keyness_ds(docs, k=1).take_all()]
    by_src = {r["source"]: r for r in rows}
    assert by_src["b"]["term"] == "zzz"
    # c_s=1, T_rest=8, c_rest=0, T_s=2 -> 1*8*1e6 // (1*2) = 4e6
    assert by_src["b"]["lift_e6"] == 4_000_000
    assert by_src["b"]["rank"] == 1


def test_rolling_active_window(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    day = 86_400_000_000
    # user 1 active day 0; user 2 active day 5; user 3 active day 20
    ev = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array([0, 5 * day, 20 * day], pa.timestamp("us")),
            }
        )
    )
    out = {r["day"]: r["wau"] for r in an.rolling_active_ds(ev, window_days=7).take_all()}
    # observed days: 0, 5, 20. day 0: {1}; day 5: {1 (0 >= 5-6), 2}; day 20: {3}
    assert out == {0: 1, 5: 2, 20: 1}


def test_time_to_convert_first_pair_semantics(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # user 1: purchase BEFORE first view is ignored; first view at t=10,
    # first purchase at-or-after is t=30. user 2: never converts.
    ev = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
                "ts": pa.array([5, 10, 30, 40, 7], pa.timestamp("us")),
                "event_type": pa.array(
                    ["purchase", "view", "purchase", "purchase", "view"],
                    pa.string(),
                ),
            }
        )
    )
    out = an.time_to_convert_ds(ev).take_all()
    assert len(out) == 1
    r = out[0]
    assert (r["user_id"], r["t_from_us"], r["t_to_us"], r["delta_us"]) == (1, 10, 30, 20)


def test_changepoint_level_shift(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    day = 86_400_000_000
    # type 'a': 1/day for days 0-3, then 5/day for days 4-7 -> CUSUM
    # |n*prefix - k*S| peaks at the shift boundary (end of day 3)
    ts = []
    for d in range(4):
        ts.append(d * day)
    for d in range(4, 8):
        ts.extend([d * day] * 5)
    ev = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(["a"] * len(ts), pa.string()),
            }
        )
    )
    out = an.changepoint_ds(ev).take_all()
    assert len(out) == 1
    r = out[0]
    assert r["n_windows"] == 8
    assert r["change_window_us"] == 3 * day  # last quiet day
    # prefix_4 = 4, k=4, S=24, n=8 -> |8*4 - 4*24| = 64
    assert r["max_dev_scaled"] == 64


def test_revenue_by_nation_join_chain(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2], pa.int64()),
                "l_extendedprice": pa.array([100.0, 200.0, 50.0]),
                "l_discount": pa.array([0.1, 0.0, 0.5]),
            }
        )
    )
    od = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_custkey": pa.array([10, 20], pa.int64()),
            }
        )
    )
    cu = ray.data.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array([10, 20], pa.int64()),
                "c_nationkey": pa.array([0, 1], pa.int64()),
            }
        )
    )
    na = ray.data.from_arrow(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int64()),
                "n_name": pa.array(["FRANCE", "KENYA"], pa.string()),
            }
        )
    )
    rows = {
        r["n_name"]: r
        for r in an.revenue_by_nation_ds(li, od, cu, na).take_all()
    }
    # order 1 -> cust 10 -> FRANCE: 100*0.9*100 + 200*1.0*100 = 29000
    assert rows["FRANCE"]["revenue_e2"] == 29_000
    assert rows["FRANCE"]["n_lineitems"] == 2
    # order 2 -> KENYA: 50*0.5*100 = 2500
    assert rows["KENYA"]["revenue_e2"] == 2_500


def test_symbolize_word(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    day = 86_400_000_000
    # counts per day: 1, 2, 3, 4 -> quartiles p25=1 p50=2 p75=3
    ts = []
    for d, n in enumerate((1, 2, 3, 4)):
        ts.extend([d * day] * n)
    ev = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(["a"] * len(ts), pa.string()),
            }
        )
    )
    out = an.symbolize_ds(ev).take_all()
    assert len(out) == 1
    assert out[0]["word"] == "abcd" and out[0]["n_windows"] == 4


def test_weighted_median_heavy_tail(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # 3 docs of 2 tokens, 1 doc of 100 tokens: plain median = small,
    # weighted median = the big doc (its mass dominates)
    docs = ray.data.from_arrow(
        pa.table(
            {
                "n_chars": pa.array([2, 2, 2, 100], pa.int64()),
                "text": pa.array(
                    ["w w", "w w", "w w", " ".join(["w"] * 100)], pa.string()
                ),
            }
        )
    )
    out = an.weighted_median_ds(docs).take_all()[0]
    assert out["plain_median"] == 2
    # S = 106, (S+1)//2 = 53 -> cumweight reaches 53 only at v=100
    assert out["wmedian"] == 100
    assert out["total_weight"] == 106 and out["n_docs"] == 4


def test_running_peak_resets_per_key(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    ev = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "ts": pa.array([1, 2, 3, 1], pa.timestamp("us")),
                "event_id": pa.array([10, 11, 12, 13], pa.int64()),
                "value": pa.array([5.0, 3.0, 7.0, 1.0]),
            }
        )
    )
    out = {r["event_id"]: r["run_peak_e"] for r in an.running_peak_ds(ev).take_all()}
    assert out == {10: 500, 11: 500, 12: 700, 13: 100}


def test_periodicity_weekly_signal(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    day = 86_400_000_000
    # spikes every 7 days over 22 days -> best lag 7
    ts = []
    for d in range(22):
        n = 10 if d % 7 == 0 else 1
        ts.extend([d * day] * n)
    ev = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(["a"] * len(ts), pa.string()),
            }
        )
    )
    out = an.periodicity_ds(ev).take_all()
    assert len(out) == 1 and out[0]["best_lag"] == 7


def test_gap_fill_locf(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    day = 86_400_000_000
    # user 1 observed on days 0 (v=5) and 3 (v=2): days 1-2 carry 5
    ev = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1], pa.int64()),
                "ts": pa.array([0, 3 * day], pa.timestamp("us")),
                "value": pa.array([5.0, 2.0]),
            }
        )
    )
    out = sorted(an.gap_fill_ds(ev).take_all(), key=lambda r: r["window_us"])
    assert [(r["window_us"] // day, r["value_e"], r["observed"]) for r in out] == [
        (0, 500, 1),
        (1, 500, 0),
        (2, 500, 0),
        (3, 200, 1),
    ]


def test_benford_audit_counts_and_constants(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # prices whose cents leading digits are 1,1,2,9
    orders = ray.data.from_arrow(
        pa.table({"o_totalprice": pa.array([1.23, 150.0, 0.25, 9.99])})
    )
    rows = {r["digit"]: r for r in an.benford_audit_ds(orders).take_all()}
    assert rows[1]["n"] == 2 and rows[2]["n"] == 1 and rows[9]["n"] == 1
    assert rows[1]["share_e9"] == 2 * 10**9 // 4
    assert rows[1]["benford_e9"] == 301029995
    assert rows[9]["dev_e9"] == abs(10**9 // 4 - 45757490)


def test_spearman_perfect_and_inverse(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # y (token count) strictly increases with x -> rho exactly +1
    docs = ray.data.from_arrow(
        pa.table(
            {
                "n_chars": pa.array([10, 20, 30], pa.int64()),
                "text": pa.array(["a", "a b", "a b c"], pa.string()),
            }
        )
    )
    out = an.spearman_corr_ds(docs).take_all()[0]
    assert out["n"] == 3 and out["num"] == out["denx"] == out["deny"]

    # inverse ordering -> num = -den
    docs2 = ray.data.from_arrow(
        pa.table(
            {
                "n_chars": pa.array([30, 20, 10], pa.int64()),
                "text": pa.array(["a", "a b", "a b c"], pa.string()),
            }
        )
    )
    out2 = an.spearman_corr_ds(docs2).take_all()[0]
    assert out2["num"] == -out2["denx"] == -out2["deny"]


def test_spearman_tie_handling(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # x has a tie: doubled avg ranks for x=[5,5,9] are [3,3,7] (avg 1.5,1.5,3)
    docs = ray.data.from_arrow(
        pa.table(
            {
                "n_chars": pa.array([5, 5, 9], pa.int64()),
                "text": pa.array(["a", "a b", "a b c"], pa.string()),
            }
        )
    )
    out = an.spearman_corr_ds(docs).take_all()[0]
    # hand-computed: r2x=[3,3,6] (avg ranks 1.5,1.5,3), r2y=[2,4,6]
    # num = 3*(6+12+36) - 12*12 = 162-144 = 18
    assert out["num"] == 18
    assert out["denx"] == 3 * (9 + 9 + 36) - 12 * 12  # 18
    assert out["deny"] == 3 * (4 + 16 + 36) - 12 * 12  # 24


def test_time_weighted_avg_step_signal(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # user 1: v=2.0 for 10us then v=4.0 for 30us -> num = 200*10+400*30*0
    # (last event weight 0) = 200*10 + 400*0 ... LOCF: num = 200*10 + 400*30?
    # events at t=0 (v=2), t=10 (v=4), t=40 (v=6): num=200*10+400*30, den=40
    ev = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "ts": pa.array([0, 10, 40, 5], pa.timestamp("us")),
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "value": pa.array([2.0, 4.0, 6.0, 9.0]),
            }
        )
    )
    rows = {r["user_id"]: r for r in an.time_weighted_avg_ds(ev).take_all()}
    assert rows[1]["twa_num"] == 200 * 10 + 400 * 30
    assert rows[1]["twa_den"] == 40 and rows[1]["n_events"] == 3
    # single-event key: zero num, zero den
    assert rows[2]["twa_num"] == 0 and rows[2]["twa_den"] == 0
    assert rows[2]["n_events"] == 1


def test_gini_concentration_extremes(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # perfectly equal corpus -> gini_num = 0
    eq = ray.data.from_arrow(
        pa.table({"text": pa.array(["a b", "a b", "a b", "a b"], pa.string())})
    )
    out = an.gini_concentration_ds(eq).take_all()[0]
    assert out["gini_num"] == 0 and out["total"] == 8 and out["n"] == 4

    # one doc holds nearly all mass -> gini near (n-1)/n
    skew = ray.data.from_arrow(
        pa.table(
            {"text": pa.array(["a", "a", "a", " ".join(["w"] * 97)], pa.string())}
        )
    )
    o2 = an.gini_concentration_ds(skew).take_all()[0]
    # sorted x = [1,1,1,97]; coefs (2i-n-1) = [-3,-1,1,3] -> num = -3-1+1+291
    assert o2["gini_num"] == 288 and o2["total"] == 100
    # gini = 288 / (4*100) = 0.72


def test_sentence_stats_segmentation(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "one two. three!! four five six? ",
                        "no terminator here",
                        "...",  # only empty segments -> no row
                    ],
                    pa.string(),
                ),
            }
        )
    )
    rows = {r["doc_id"]: r for r in an.sentence_stats_ds(docs).take_all()}
    assert rows[1]["n_sentences"] == 3
    assert rows[1]["max_sent_tokens"] == 3  # "four five six"
    assert rows[1]["sum_sent_tokens"] == 6
    assert rows[2]["n_sentences"] == 1 and rows[2]["sum_sent_tokens"] == 3
    assert 3 not in rows


def test_type_cross_corr_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    day = 86_400_000_000
    # type a: day0 x2, day1 x1 ; type b: day0 x3 (day1 absent)
    ts = [0, 0, day, 0, 0, 0]
    et = ["a", "a", "a", "b", "b", "b"]
    ev = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(et, pa.string()),
            }
        )
    )
    rows = {
        (r["type_a"], r["type_b"]): r
        for r in an.type_cross_corr_ds(ev).take_all()
    }
    assert rows[("a", "a")]["dot"] == 4 + 1 and rows[("a", "a")]["n_common"] == 2
    assert rows[("a", "b")]["dot"] == 2 * 3 and rows[("a", "b")]["n_common"] == 1
    assert rows[("b", "b")]["dot"] == 9


def test_hash_join_full_outer_all_branches(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 2], pa.int64()),
                "lv": pa.array(["a", "b", "c"], pa.string()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array([2, 3], pa.int64()),
                "rv": pa.array(["x", "y"], pa.string()),
            }
        )
    )
    rows = an.hash_join_ds(left, right, "k", "rk", how="full").take_all()
    got = {(r["k"], r["lv"], r["rv"]) for r in rows}
    assert got == {
        (1, "a", None),      # left-only
        (2, "b", "x"),       # matched (N:M)
        (2, "c", "x"),
        (3, None, "y"),      # right-only, key carried from the right
    }


def test_k_anonymity_flags(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # combo (1, A): 3 members, balances in 3 distinct $1000 buckets
    # combo (2, B): 1 member (not k-anonymous at k=2, not diverse at l=2)
    cust = ray.data.from_arrow(
        pa.table(
            {
                "c_nationkey": pa.array([1, 1, 1, 2], pa.int32()),
                "c_mktsegment": pa.array(["A", "A", "A", "B"], pa.string()),
                "c_acctbal": pa.array([100.0, 1100.0, 2100.0, -50.0], pa.float64()),
            }
        )
    )
    out = {(r["c_nationkey"], r["c_mktsegment"]): r
           for r in an.k_anonymity_ds(cust, k=2, l_div=2).take_all()}
    a = out[(1, "A")]
    assert a["n_members"] == 3 and a["n_bal_buckets"] == 3
    assert a["k_anonymous"] == 1 and a["l_diverse"] == 1
    b = out[(2, "B")]
    assert b["n_members"] == 1 and b["n_bal_buckets"] == 1
    assert b["k_anonymous"] == 0 and b["l_diverse"] == 0


def test_stratified_kfold_balance(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import corpus_ops as co

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(23)), pa.int64()),
                "lang": pa.array(["en"] * 13 + ["de"] * 10, pa.string()),
            }
        )
    )
    rows = co.stratified_kfold_ds(docs, n_folds=5).take_all()
    assert len(rows) == 23
    from collections import Counter
    for stratum, total in (("en", 13), ("de", 10)):
        c = Counter(r["fold"] for r in rows if r["stratum"] == stratum)
        assert sum(c.values()) == total
        # balanced to +/- 1 within each stratum
        assert max(c.values()) - min(c.values()) <= 1


def test_json_props_stats_malformed_quarantined(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["a", "a", "a", "b"], pa.string()),
                "props": pa.array(
                    ['{"k": 5}', '{"k": -3}', "not json", '{"k": 7}'],
                    pa.string(),
                ),
            }
        )
    )
    out = {r["event_type"]: r for r in an.json_props_stats_ds(ev).take_all()}
    assert out["a"]["n"] == 3 and out["a"]["n_null"] == 1
    assert out["a"]["k_sum"] == 2
    assert out["a"]["k_min"] == -3 and out["a"]["k_max"] == 5
    assert out["b"]["k_sum"] == 7 and out["b"]["n_null"] == 0


def test_ab_assignment_deterministic(ray_session):
    import hashlib
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    ev = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 2, 3], pa.int64()),
                "event_type": pa.array(
                    ["purchase", "view", "view", "purchase"], pa.string()
                ),
            }
        )
    )
    rows = {r["arm"]: r for r in an.ab_assignment_ds(ev).take_all()}
    arm = {u: int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2
           for u in (1, 2, 3)}
    from collections import Counter
    expect_users = Counter(arm.values())
    expect_conv = Counter(a for u, a in arm.items() if u in (1, 3))
    for a in set(arm.values()):
        assert rows[a]["n_users"] == expect_users[a]
        assert rows[a]["n_converted"] == expect_conv.get(a, 0)
    assert sum(r["n_users"] for r in rows.values()) == 3


def test_fd_audit_pk_holds_flags_dirty(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2], pa.int64()),
                "l_linenumber": pa.array([1, 2, 1], pa.int64()),
                "l_partkey": pa.array([10, 11, 10], pa.int64()),
                "l_returnflag": pa.array(["A", "R", "A"], pa.string()),
                "l_linestatus": pa.array(["O", "O", "F"], pa.string()),
            }
        )
    )
    out = {r["fd"]: r for r in an.fd_audit_ds(li).take_all()}
    # order 1 has two returnflags -> 1 violation of 2 lhs
    assert out["orderkey->returnflag"]["n_lhs"] == 2
    assert out["orderkey->returnflag"]["n_violations"] == 1
    # linestatus is constant per order here -> clean
    assert out["orderkey->linestatus"]["n_violations"] == 0
    # PK check: (orderkey, linenumber) determines partkey
    assert out["orderkey,linenumber->partkey"]["n_lhs"] == 3
    assert out["orderkey,linenumber->partkey"]["n_violations"] == 0


def test_index_gap_stats_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # bigram "a b" appears in docs 0 and 5 -> df 2,
    # gaps (0+1, 5-0) = (1, 5) -> varint bytes (1, 1) -> total 2
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 5], pa.int64()),
                "text": pa.array(["a b x", "a b y"], pa.string()),
            }
        )
    )
    out = {r["df"]: r for r in an.index_gap_stats_ds(docs).take_all()}
    assert out[2]["n_tokens"] == 1          # only "a b" is in-band
    assert out[2]["total_postings"] == 2
    assert out[2]["total_bytes"] == 2


def test_kendall_pairs_monotone_series(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # type "up": counts 1,2,3 on three days -> all 3 pairs concordant
    day = 86_400_000_000
    ts, et = [], []
    for d, n in enumerate([1, 2, 3]):
        ts.extend([d * day + i for i in range(n)])
        et.extend(["up"] * n)
    ev = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(et, pa.string()),
            }
        )
    )
    row = an.kendall_pairs_ds(ev).take_all()[0]
    assert row["event_type"] == "up" and row["n_windows"] == 3
    assert row["concordant"] == 3 and row["discordant"] == 0 and row["tied"] == 0


def test_source_prefix_audit_lcp(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import corpus_ops as co

    docs = ray.data.from_arrow(
        pa.table(
            {
                "text": pa.array(
                    ["header one body a", "header one body b", "header two x"],
                    pa.string(),
                ),
                "source": pa.array(["A", "A", "A"], pa.string()),
            }
        )
    )
    row = co.source_prefix_audit_ds(docs).take_all()[0]
    # min = "header one body a", max = "header two x" -> LCP "header "
    # + "one"/"two" diverge at 'o' vs 't' -> 7 chars
    assert row["source"] == "A" and row["n_docs"] == 3
    assert row["lcp_chars"] == len("header ")


def test_emd_lengths_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # src0 lengths: [1, 3]; src1 lengths: [3, 3]
    # grid 1,3: at v=1: ca=1, cb=0 -> |1*2 - 0*2| * (3-1) = 4
    # emd = 4 / (2*2) = 1.0 (every src0 doc moves 1 token on average... )
    docs = ray.data.from_arrow(
        pa.table(
            {
                "text": pa.array(["a", "a b c", "x y z", "p q r"], pa.string()),
                "source": pa.array(["src0", "src0", "src1", "src1"], pa.string()),
            }
        )
    )
    row = an.emd_lengths_ds(docs).take_all()[0]
    assert row["n_a"] == 2 and row["n_b"] == 2
    assert row["emd_num"] == 4


def test_lang_fertility_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.functions import textstats as ts
    from pdfplumber_ray.pipelines import analytics as an

    docs = ray.data.from_arrow(
        pa.table(
            {
                "text": pa.array(["héllo wörld", "", "a b c"], pa.string()),
                "lang": pa.array(["de", "de", "en"], pa.string()),
            }
        )
    )
    rows = {r["lang"]: r for r in an.lang_fertility_ds(docs).take_all()}
    de, en = rows["de"], rows["en"]
    assert de["n_docs"] == 2
    # two 2-byte umlauts: 13 bytes vs 11 codepoints; '' counts 1 ws token
    assert de["n_bytes"] == 13 and de["n_chars"] == 11
    assert de["n_tokens_ws"] == 2 + 1
    assert de["n_tokens_bpe"] == int(ts.bpe_token_count(["héllo wörld"])[0])
    assert en == {
        "lang": "en",
        "n_docs": 1,
        "n_bytes": 5,
        "n_chars": 5,
        "n_tokens_ws": 3,
        "n_tokens_bpe": int(ts.bpe_token_count(["a b c"])[0]),
    }


def test_inversion_count_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # user 1 by ingest order (event_id): ts = 100, 50, 150, 20
    # inversions: (100,50) (100,20) (50,20) (150,20) -> 4 of C(4,2)=6
    events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
                "event_id": pa.array([10, 11, 12, 13, 20], pa.int64()),
                "ts": pa.array([100, 50, 150, 20, 5], pa.int64()),
            }
        )
    )
    rows = {r["user_id"]: r for r in an.inversion_count_ds(events).take_all()}
    assert rows[1] == {
        "user_id": 1,
        "n_events": 4,
        "n_pairs": 6,
        "n_inversions": 4,
    }
    assert rows[2] == {
        "user_id": 2,
        "n_events": 1,
        "n_pairs": 0,
        "n_inversions": 0,
    }


def test_inversion_count_chunked_matches_unchunked(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    rng = np.random.RandomState(7)
    n = 60
    events_tbl = pa.table(
        {
            "user_id": pa.array(np.repeat([1, 2, 3], n // 3), pa.int64()),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(rng.randint(0, 50, n).astype(np.int64)),
        }
    )
    big = an.inversion_count_ds(ray.data.from_arrow(events_tbl)).take_all()
    small = an.inversion_count_ds(
        ray.data.from_arrow(events_tbl), max_pair_chunk=3
    ).take_all()
    key = lambda r: r["user_id"]
    assert sorted(big, key=key) == sorted(small, key=key)


def test_inversion_count_empty(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.int64()),
            }
        )
    )
    assert an.inversion_count_ds(events).take_all() == []


def test_interarrival_stats_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # user 1 ts: 0, 10, 40, 100 -> gaps 10, 30, 60
    # median convention: smallest gap with cum count >= ceil(0.5*3)=2 -> 30
    # user 2: one event -> no row
    events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "ts": pa.array([0, 10, 40, 100, 7], pa.int64()),
            }
        )
    )
    rows = an.interarrival_stats_ds(events).take_all()
    assert rows == [
        {
            "user_id": 1,
            "n_gaps": 3,
            "min_gap_us": 10,
            "med_gap_us": 30,
            "max_gap_us": 60,
        }
    ]


def test_interarrival_stats_even_gap_count_low_median(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # gaps 10, 20, 30, 40: ceil(0.5*4)=2 -> med = 20 (low median)
    events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([3] * 5, pa.int64()),
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "ts": pa.array([0, 10, 30, 60, 100], pa.int64()),
            }
        )
    )
    row = an.interarrival_stats_ds(events).take_all()[0]
    assert row["med_gap_us"] == 20 and row["n_gaps"] == 4


def test_activity_streaks_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    day = 86_400_000_000
    # user 1 days: 0,1,2, 5,6, 9 -> streaks 3,2,1; two events on day 1
    # user 2 days: 4 -> one streak of 1
    events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 1, 1, 1, 2], pa.int64()),
                "ts": pa.array(
                    [0, day, day + 5, 2 * day, 5 * day, 6 * day, 9 * day, 4 * day],
                    pa.int64(),
                ),
            }
        )
    )
    rows = {r["user_id"]: r for r in an.activity_streaks_ds(events).take_all()}
    assert rows[1] == {
        "user_id": 1,
        "n_active_days": 6,
        "max_streak": 3,
        "n_streaks": 3,
    }
    assert rows[2] == {
        "user_id": 2,
        "n_active_days": 1,
        "max_streak": 1,
        "n_streaks": 1,
    }


def test_key_skew_audit_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # sizes: key 1 -> 6, keys 2..5 -> 1 each; n_keys=5, n_rows=10
    # p99: ceil(.99*5)=5 -> smallest size with cum>=5 is 6
    tbl = ray.data.from_arrow(
        pa.table(
            {"k": pa.array([1] * 6 + [2, 3, 4, 5], pa.int64())}
        )
    )
    row = an.key_skew_audit_ds(tbl, key_col="k").take_all()[0]
    assert row == {
        "n_rows": 10,
        "n_keys": 5,
        "max_group": 6,
        "p99_group": 6,
        "top_share_ppm": 600_000,
    }


def test_key_skew_audit_empty(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    tbl = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    row = an.key_skew_audit_ds(tbl, key_col="k").take_all()[0]
    assert row == {
        "n_rows": 0,
        "n_keys": 0,
        "max_group": 0,
        "p99_group": 0,
        "top_share_ppm": 0,
    }


def test_dwell_times_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # user 1: view@0 -> view@10 -> buy@25 -> view@100 (no successor)
    # dwell: view 10 (0..10), view 15 (10..25), buy 75 (25..100)
    events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1], pa.int64()),
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array([0, 10, 25, 100], pa.int64()),
                "event_type": pa.array(["view", "view", "buy", "view"]),
            }
        )
    )
    rows = {
        (r["user_id"], r["event_type"]): r
        for r in an.dwell_times_ds(events).take_all()
    }
    assert rows[(1, "view")]["n_intervals"] == 2
    assert rows[(1, "view")]["total_dwell_us"] == 25
    assert rows[(1, "buy")] == {
        "user_id": 1,
        "event_type": "buy",
        "n_intervals": 1,
        "total_dwell_us": 75,
    }
    assert len(rows) == 2


def test_order_reconcile_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # order 1 (status O): lines 10.00 + 5.00 = header 15.00 -> match
    # order 2 (status F): lines 3.00 vs header 4.00 -> 100c drift
    # order 3 (status F): NO lines vs header 2.00 -> 200c drift
    lineitem = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2], pa.int64()),
                "l_extendedprice": pa.array([10.0, 5.0, 3.0]),
                "l_discount": pa.array([0.0, 0.0, 0.0]),
                "l_tax": pa.array([0.0, 0.0, 0.0]),
            }
        )
    )
    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_orderstatus": pa.array(["O", "F", "F"]),
                "o_totalprice": pa.array([15.0, 4.0, 2.0]),
            }
        )
    )
    rows = {
        r["o_orderstatus"]: r
        for r in an.order_reconcile_ds(lineitem, orders).take_all()
    }
    assert rows["O"] == {
        "o_orderstatus": "O",
        "n_orders": 1,
        "n_mismatch": 0,
        "sum_abs_diff_cents": 0,
    }
    assert rows["F"] == {
        "o_orderstatus": "F",
        "n_orders": 2,
        "n_mismatch": 2,
        "sum_abs_diff_cents": 300,
    }


def test_weekday_profile_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    day = 86_400_000_000
    # day 0 = Thursday (weekday 4); day 4 = Monday (weekday 1)
    events = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["a", "a", "a", "b"]),
                "ts": pa.array([0, 5, 4 * day, 0], pa.int64()),
            }
        )
    )
    rows = {
        (r["event_type"], r["weekday"]): r
        for r in an.weekday_profile_ds(events).take_all()
    }
    assert rows[("a", 4)] == {
        "event_type": "a",
        "weekday": 4,
        "n_events": 2,
        "n_days": 1,
    }
    assert rows[("a", 1)]["n_events"] == 1
    assert rows[("b", 4)]["n_days"] == 1
    assert len(rows) == 3


def test_rfm_scores_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    day = 86_400_000_000
    # five users, one event each: r_days 0..4, f all 1, dollars 1..5
    # boundaries (N=5, rank s): ranks 1,2,3,4 -> values at those ranks
    # r bounds = [0,1,2,3] -> scores 1,2,3,4,5
    # f bounds = [1,1,1,1] -> all f=1 -> score 1
    # m bounds = [1,2,3,4] -> scores 1..5
    events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "ts": pa.array([0, day, 2 * day, 3 * day, 4 * day], pa.int64()),
                "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
            }
        )
    )
    rows = {r["user_id"]: r for r in an.rfm_scores_ds(events).take_all()}
    for uid in range(1, 6):
        r = rows[uid]
        assert r["r_days"] == uid - 1
        assert r["f"] == 1 and r["f_score"] == 1
        assert r["m_cents"] == uid * 100
        assert r["r_score"] == uid and r["m_score"] == uid


def test_ship_lag_stats_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    day = 86_400_000_000
    # priority P: lags 1, 3, 10 -> med rank (3+1)//2=2 -> 3
    # priority Q: lag -2 (ships before order date) alone
    lineitem = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
                "l_shipdate": pa.array(
                    [1 * day, 3 * day, 10 * day, 0], pa.int64()
                ),
            }
        )
    )
    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_orderpriority": pa.array(["P", "P", "Q"]),
                "o_orderdate": pa.array([0, 0, 2 * day], pa.int64()),
            }
        )
    )
    rows = {
        r["o_orderpriority"]: r
        for r in an.ship_lag_stats_ds(lineitem, orders).take_all()
    }
    assert rows["P"] == {
        "o_orderpriority": "P",
        "n_lines": 3,
        "min_lag_days": 1,
        "med_lag_days": 3,
        "max_lag_days": 10,
    }
    assert rows["Q"]["min_lag_days"] == -2 and rows["Q"]["n_lines"] == 1


def test_zonemap_prune_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 100, 101], pa.int64()),
                "n_chars": pa.array([10, 50, 900, 3000], pa.int64()),
            }
        )
    )
    rows = {
        r["shard_id"]: r
        for r in an.zonemap_prune_ds(docs, shard_size=100, threshold=2000).take_all()
    }
    assert rows[0] == {
        "shard_id": 0,
        "n_docs": 2,
        "min_v": 10,
        "max_v": 50,
        "prunable": 1,
    }
    assert rows[1]["prunable"] == 0 and rows[1]["max_v"] == 3000


def test_open_order_backlog_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    day = 86_400_000_000
    # order 1: opens day 0, last ship day 2 -> open days 0,1,2
    # order 2: opens day 1, NO lines -> open day 1 only
    # order 3: opens day 4, ships day 3 (clamped) -> open day 4 only
    lineitem = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 3], pa.int64()),
                "l_shipdate": pa.array([1 * day, 2 * day, 3 * day], pa.int64()),
            }
        )
    )
    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_orderdate": pa.array([0, 1 * day, 4 * day], pa.int64()),
            }
        )
    )
    rows = an.open_order_backlog_ds(lineitem, orders).take_all()
    curve = {r["day"]: r["n_open"] for r in rows}
    assert curve == {0: 1, 1: 2, 2: 1, 3: 0, 4: 1, 5: 0}


def test_sole_source_risk_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # part 1: suppliers {10, 11} (dup pair collapses); parts 2, 3: one each
    li = ray.data.from_arrow(
        pa.table(
            {
                "l_partkey": pa.array([1, 1, 1, 2, 3], pa.int64()),
                "l_suppkey": pa.array([10, 11, 10, 20, 30], pa.int64()),
            }
        )
    )
    rows = {r["n_suppliers"]: r for r in an.sole_source_risk_ds(li).take_all()}
    assert rows[2] == {"n_suppliers": 2, "n_parts": 1}
    assert rows[1] == {"n_suppliers": 1, "n_parts": 2}


def test_late_events_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # ingest order (event_id): ts = 100, 250, 40, 90, 260
    # watermark before each: -, 100, 250, 250, 250; budget 50:
    # late when t < wm - 50: event 3 (40 < 200) and event 4 (90 < 200)
    events = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "ts": pa.array([100, 250, 40, 90, 260], pa.int64()),
                "event_type": pa.array(["a", "a", "a", "b", "b"]),
            }
        )
    )
    rows = {
        r["event_type"]: r
        for r in an.late_events_ds(events, budget_us=50).take_all()
    }
    assert rows["a"] == {"event_type": "a", "n_events": 3, "n_late": 1}
    assert rows["b"] == {"event_type": "b", "n_events": 2, "n_late": 1}


def test_late_events_range_carry(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # force multiple seq ranges (n_ranges=2) so the carry-in path runs:
    # global max lives in the first range, late event in the second
    events = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 1000, 1001], pa.int64()),
                "ts": pa.array([500, 900, 100, 950], pa.int64()),
                "event_type": pa.array(["x", "x", "x", "x"]),
            }
        )
    )
    rows = an.late_events_ds(events, budget_us=100, n_ranges=2).take_all()
    # event 1000: wm=900 -> 100 < 800 late; event 1001: wm=900, 950 ok
    assert rows == [{"event_type": "x", "n_events": 4, "n_late": 1}]


def test_encoding_size_audit_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    docs = ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array(["en", "en", "de"]),
                "source": pa.array(["s1", "s1", "s1"]),
                "text": pa.array(["aa", "bb", "aa"]),
            }
        )
    )
    rows = {
        r["column_name"]: r for r in an.encoding_size_audit_ds(docs).take_all()
    }
    assert rows["lang"] == {
        "column_name": "lang",
        "n": 3,
        "n_distinct": 2,
        "plain_bytes": 6,
        "dict_bytes": 4 + 12,
    }
    assert rows["source"]["n_distinct"] == 1
    assert rows["text"]["dict_bytes"] == 4 + 12


def test_dup_baskets_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # orders 1 and 2 share basket {5, 7} (order 2 lists 7 twice);
    # order 3 has basket {5} alone
    li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 2, 2, 3], pa.int64()),
                "l_partkey": pa.array([5, 7, 7, 5, 7, 5], pa.int64()),
            }
        )
    )
    rows = {r["basket_size"]: r for r in an.dup_baskets_ds(li).take_all()}
    assert rows[2] == {
        "basket_size": 2,
        "n_orders": 2,
        "n_distinct_baskets": 1,
        "n_dup_orders": 1,
    }
    assert rows[1] == {
        "basket_size": 1,
        "n_orders": 1,
        "n_distinct_baskets": 1,
        "n_dup_orders": 0,
    }


def test_churn_overlap_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    day = 86_400_000_000
    # day 0: users {1,2}; day 1: {2,3}; day 2: {3}
    events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 2, 2, 3, 3, 2], pa.int64()),
                "ts": pa.array(
                    [0, 5, day, day + 1, 2 * day, 3], pa.int64()
                ),
            }
        )
    )
    rows = {r["day"]: r for r in an.churn_overlap_ds(events).take_all()}
    assert rows[0] == {
        "day": 0,
        "n_active": 2,
        "n_active_next": 2,
        "n_retained": 1,
    }
    assert rows[1] == {
        "day": 1,
        "n_active": 2,
        "n_active_next": 1,
        "n_retained": 1,
    }
    assert len(rows) == 2


def test_value_mad_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # cents: 100, 200, 300, 10000 -> med rank (4+1)//2=2 -> 200
    # deviations: 100, 0, 100, 9800 -> sorted 0,100,100,9800 -> mad 100
    events = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x"] * 4),
                "value": pa.array([1.0, 2.0, 3.0, 100.0]),
            }
        )
    )
    rows = an.value_mad_ds(events).take_all()
    assert rows == [
        {"event_type": "x", "n": 4, "med_cents": 200, "mad_cents": 100}
    ]


def test_cdc_chunks_shared_paragraph(ray_session):
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # this paragraph has internal window-hash cuts at char positions
    # 31/70/78/154, so the PREFIXed copy in doc 2 re-synchronizes and
    # shares the post-cut chunks with doc 1
    para = (
        "jumps the lazy zeta alpha gamma quick brown gamma delta zeta "
        "jumps quick delta over delta delta alpha lazy alpha zeta gamma "
        "fox jumps jumps beta dog zeta alpha lazy"
    )
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([para, "PREFIX " + para, "short"]),
            }
        )
    )
    rows = {r["n_docs"]: r for r in an.cdc_chunks_ds(docs).take_all()}

    # reference chunker (independent scalar implementation)
    def chunks(txt):
        cps = [ord(c) for c in txt]
        cuts = []
        for i in range(7, len(cps)):
            h = sum(cps[i - 7 + k] * 31 ** (7 - k) for k in range(8))
            if h % 64 == 0:
                cuts.append(i + 1)
        if not cuts or cuts[-1] != len(cps):
            cuts.append(len(cps))
        out, s = [], 0
        for e in cuts:
            out.append(txt[s:e])
            s = e
        return out

    exp = {}
    for did, txt in [(1, para), (2, "PREFIX " + para), (3, "short")]:
        for c in chunks(txt):
            key = hashlib.md5(c.encode()).digest()
            occ, dset, _ = exp.get(key, (0, set(), 0))
            exp[key] = (occ + 1, dset | {did}, len(c))
    hist = {}
    for occ, dset, ln in exp.values():
        nd = len(dset)
        a, b, c = hist.get(nd, (0, 0, 0))
        hist[nd] = (a + 1, b + occ, c + ln)
    assert set(rows) == set(hist)
    for nd, (nc, occ, cb) in hist.items():
        assert rows[nd]["n_chunks"] == nc
        assert rows[nd]["occurrences"] == occ
        assert rows[nd]["chunk_chars"] == cb
    # the shared paragraph must contribute at least one 2-doc chunk
    assert 2 in rows


def test_poisson_bootstrap_deterministic(ray_session):
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 11, 12], pa.int64()),
                "source": pa.array(["s"] * 3),
                "n_chars": pa.array([100, 200, 300], pa.int64()),
            }
        )
    )
    rows = {r["rep"]: r for r in an.poisson_bootstrap_ds(docs).take_all()}

    T = an._POIS1_T

    def wt(did, b):
        h = int(hashlib.md5(f"pb|{did}|{b}".encode()).hexdigest()[:8], 16)
        return int(np.searchsorted(T, h, side="right"))

    for b in range(16):
        ne = sum(wt(d, b) for d in (10, 11, 12))
        ws = sum(wt(d, b) * v for d, v in ((10, 100), (11, 200), (12, 300)))
        if ne == 0:
            assert b not in rows
        else:
            assert rows[b]["n_eff"] == ne
            assert rows[b]["sum_chars"] == ws
            assert rows[b]["mean_chars_e3"] == ws * 1000 // ne
    # two runs are identical (pure function of ids)
    again = {r["rep"]: r for r in an.poisson_bootstrap_ds(docs).take_all()}
    assert again == rows


def test_rand_projection_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    vecs = [[0.5, -0.25, 0.125], [1.0, 0.0, -1.0]]
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([7, 8], pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        )
    )
    rows = {r["vec_id"]: r for r in an.rand_projection_ds(emb).take_all()}
    s = an._rp_signs(16, 3)
    for vid, v in ((7, vecs[0]), (8, vecs[1])):
        q = np.floor(np.array(v, dtype=np.float64) * 1e6).astype(np.int64)
        proj = q @ s.T
        for j in range(16):
            assert rows[vid][f"proj_{j}"] == proj[j]
        assert rows[vid]["l2q"] == int((q * q).sum())
        assert rows[vid]["p2"] == int((proj * proj).sum())


def test_motif_pairs_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # series (cents): 100 200 300 400 | 900 | 100 200 300 400
    # windows: w1=(1,2,3,4) w2=(2,3,4,9) w3=(3,4,9,1) w4=(4,9,1,2)
    #          w5=(9,1,2,3) w6=(1,2,3,4)  (x100 cents)
    # non-overlap j>=i+4: (1,5) d=|1-9|+|2-1|+|3-2|+|4-3|=11 -> 1100
    #                     (1,6) d=0 ; (2,6) d=|2-1|+...=1+1+1+5=8 -> 800
    # min is (1,6) with 0
    vals = [1.0, 2.0, 3.0, 4.0, 9.0, 1.0, 2.0, 3.0, 4.0]
    events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([5] * 9, pa.int64()),
                "ts": pa.array(list(range(9)), pa.timestamp("us")),
                "event_id": pa.array(list(range(9)), pa.int64()),
                "value": pa.array(vals),
            }
        )
    )
    rows = an.motif_pairs_ds(events).take_all()
    assert rows == [{"user_id": 5, "win_a": 1, "win_b": 6, "l1_cents": 0}]


def test_regression_fit_perfect_line(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # y = 2x exactly -> R^2 = 1000 permille; second key constant-x -> excluded
    days = [1, 2, 3, 4]
    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 1, 1, 2, 2, 2], pa.int64()),
                "o_orderdate": pa.array(
                    [d * 86_400_000_000 for d in days] + [86_400_000_000] * 3,
                    pa.timestamp("us"),
                ),
                "o_totalprice": pa.array(
                    [2.0, 4.0, 6.0, 8.0, 1.0, 2.0, 3.0]
                ),
            }
        )
    )
    rows = {r["o_custkey"]: r for r in an.regression_fit_ds(orders).take_all()}
    assert rows[1]["n"] == 4 and rows[1]["r2_permille"] == 1000
    assert 2 not in rows  # zero x-variance excluded


def test_levenshtein_matches_reference_cases():
    from pdfplumber_ray.pipelines.analytics import _levenshtein

    assert _levenshtein("kitten", "sitting") == 3
    assert _levenshtein("", "abc") == 3
    assert _levenshtein("abc", "") == 3
    assert _levenshtein("same", "same") == 0
    assert _levenshtein("flaw", "lawn") == 2
    # brute-force cross-check on random short strings
    import itertools
    import random

    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    rng = random.Random(7)
    for _ in range(200):
        a = "".join(rng.choice("abc") for _ in range(rng.randrange(0, 9)))
        b = "".join(rng.choice("abc") for _ in range(rng.randrange(0, 9)))
        assert _levenshtein(a, b) == ref(a, b), (a, b)


def test_dup_edit_audit_blocks_and_caps(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    pfx = "x" * 24
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 9], pa.int64()),
                "text": pa.array(
                    [pfx + "abcdef", pfx + "abXdef", pfx + "zz", "short"]
                ),
            }
        )
    )
    rows = {(r["doc_a"], r["doc_b"]): r["lev"] for r in
            an.dup_edit_audit_ds(docs).take_all()}
    # doc 9 is shorter than the prefix -> excluded entirely
    assert set(rows) == {(1, 2), (1, 3), (2, 3)}
    assert rows[(1, 2)] == 1          # one substitution
    assert rows[(1, 3)] == 6          # abcdef -> zz = 2 sub + 4 del
    # cap: with max_block=2 only the two lowest ids pair
    capped = an.dup_edit_audit_ds(docs, max_block=2).take_all()
    assert {(r["doc_a"], r["doc_b"]) for r in capped} == {(1, 2)}


def test_phonetic_keys_hand_vocab(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # robert/rubart collide on 'rbrt'; aaron keeps leading vowel
    docs = ray.data.from_arrow(
        pa.table(
            {
                "text": pa.array(
                    ["robert rubart robert", "aaron calls Robert", "x 12ab"]
                ),
            }
        )
    )
    rows = {r["pkey"]: r for r in an.phonetic_keys_ds(docs).take_all()}
    # ROBERT lowers to robert: 4 occurrences across docs
    rb = rows["rbrt"]
    assert rb["n_tokens"] == 2
    assert rb["n_occ"] == 4
    assert rb["tok_min"] == "robert" and rb["tok_max"] == "rubart"
    ar = rows["arn"]  # aaron -> a + rn? seq: a,r,n -> collapse 'aa'->a
    assert ar["n_tokens"] == 1 and ar["n_occ"] == 1
    assert "calls" in {rows[k]["tok_min"] for k in rows}
    # '12ab' and single-char 'x' filtered
    assert all(len(r["tok_min"]) >= 4 for r in rows.values())


def test_cdc_families_transitive(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # Paragraph with internal cuts (positions 31/70/78/154, see
    # test_cdc_chunks_shared_paragraph): docs 1+2 share its tail chunks,
    # docs 2+3 share a different >=16-char chunk -> {1,2,3} is ONE
    # family by transitivity; doc 9 is isolated.
    para = (
        "jumps the lazy zeta alpha gamma quick brown gamma delta zeta "
        "jumps quick delta over delta delta alpha lazy alpha zeta gamma "
        "fox jumps jumps beta dog zeta alpha lazy"
    )
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 9], pa.int64()),
                "text": pa.array(
                    [para, "PREFIX " + para, "PREFIX " + para[:31], "unrelated"]
                ),
            }
        )
    )
    rows = {r["doc_id"]: r["family_id"] for r in
            an.cdc_families_ds(docs).take_all()}
    assert rows.get(1) == 1 and rows.get(2) == 1
    assert 9 not in rows
    # doc 3 joins iff it shares a >=16 char chunk with doc 2 — both
    # start with "PREFIX " + same 31 chars, so their first cut chunk
    # matches when the cut re-synchronizes inside the shared prefix.
    # Regardless of that, family ids must be component minima.
    assert all(fid <= d for d, fid in rows.items())


def test_gini_stump_perfect_split(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # n_chars <= 10 is all "en", > 10 all "fr" -> impurity 0 at t=10
    docs = ray.data.from_arrow(
        pa.table(
            {
                "n_chars": pa.array([5, 7, 10, 20, 30, 40], pa.int64()),
                "lang": pa.array(["en", "en", "en", "fr", "fr", "fr"]),
            }
        )
    )
    rows = an.gini_stump_ds(docs).take_all()
    best = rows[0]
    assert best["threshold"] == 10
    assert best["n_left"] == 3 and best["n_right"] == 3
    assert best["impurity_e6"] == 0
    # worst candidate must be positive impurity, ordering ascending
    imps = [r["impurity_e6"] for r in rows]
    assert imps == sorted(imps)


def test_seasonal_naive_error_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    day = 86_400_000_000
    # type x: day0=100c day7=300c day14=250c
    #   eval day7 vs day0: |300-100|=200; day14 vs day7: |250-300|=50
    # type y: only day0 -> excluded
    events = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x", "x", "x", "y"]),
                "ts": pa.array([0, 7 * day, 14 * day, 0], pa.timestamp("us")),
                "value": pa.array([1.0, 3.0, 2.5, 9.0]),
            }
        )
    )
    rows = an.seasonal_naive_error_ds(events).take_all()
    assert rows == [
        {
            "event_type": "x",
            "n_eval": 2,
            "abs_err_sum": 250,
            "mae_cents_e3": 125_000,
        }
    ]


def test_feature_hashing_deterministic_and_additive(ray_session):
    import hashlib

    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["cat cat dog", "cat"]),
            }
        )
    )
    rows = {r["doc_id"]: r for r in an.feature_hashing_ds(docs).take_all()}

    def hv(w):
        h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
        return h % 16, 1 if (h // 16) % 2 == 0 else -1

    exp1 = [0] * 16
    for w, c in (("cat", 2), ("dog", 1)):
        s, g = hv(w)
        exp1[s] += g * c
    got1 = [rows[1][f"fh_{j}"] for j in range(16)]
    assert got1 == exp1
    # single-token doc: exactly one nonzero slot of magnitude 1
    got2 = [rows[2][f"fh_{j}"] for j in range(16)]
    assert sorted(map(abs, got2)) == [0] * 15 + [1]


def test_quantile_map_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # a: values 1,2,3,4 (n=4); b: values 10,20 (n=2, counts 1,1)
    # cdf_a: 1->1/4, 2->2/4, 3->3/4, 4->4/4
    # mapped into b: min u with cdf_b(u) >= q: 1/4->10, 2/4->10, 3/4->20, 1->20
    docs = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(["a"] * 4 + ["b"] * 2),
                "n_chars": pa.array([1, 2, 3, 4, 10, 20], pa.int64()),
            }
        )
    )
    rows = {
        (r["src_a"], r["v"]): r["mapped_v"]
        for r in an.quantile_map_ds(docs).take_all()
        if r["src_a"] == "a"
    }
    assert rows == {("a", 1): 10, ("a", 2): 10, ("a", 3): 20, ("a", 4): 20}


def test_effective_sample_size_flat_vs_skewed(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    docs = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(["flat"] * 4 + ["skew"] * 4),
                "n_chars": pa.array([5, 5, 5, 5, 1, 1, 1, 97], pa.int64()),
            }
        )
    )
    rows = {r["source"]: r for r in an.effective_sample_size_ds(docs).take_all()}
    # flat weights: ESS == n exactly
    assert rows["flat"]["ess_e3"] == 4000
    assert rows["flat"]["ess_ratio_permille"] == 1000
    # skewed: (100)^2*1000 // (1+1+1+9409) = 10_000_000 // 9412
    assert rows["skew"]["ess_e3"] == 10_000_000 // 9412
    assert rows["skew"]["ess_ratio_permille"] == 10_000_000 // (4 * 9412)


def test_dedup_modality_agreement_planted(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # docs 1,2: byte-identical (exact + jaccard + cdc if a >=16 chunk
    # exists); docs 3,4: share a long paragraph but differ (cdc likely,
    # jaccard high); doc 9 unique.
    para = (
        "jumps the lazy zeta alpha gamma quick brown gamma delta zeta "
        "jumps quick delta over delta delta alpha lazy alpha zeta gamma "
        "fox jumps jumps beta dog zeta alpha lazy"
    )
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 9], pa.int64()),
                "text": pa.array(
                    [para, para, para + " tail one", "PREFIX " + para, "zz"]
                ),
            }
        )
    )
    row = an.dedup_modality_agreement_ds(docs).take_all()[0]
    # identical pair (1,2) must be counted by ALL three modalities
    assert row["n_exact"] == 1
    assert row["n_all3"] >= 1
    # the near-identical family makes jaccard and cdc supersets of exact
    assert row["n_jaccard"] >= row["n_exact_jaccard"] >= 1
    assert row["n_cdc"] >= row["n_exact_cdc"] >= 1
    # intersections can never exceed their parents
    assert row["n_exact_jaccard"] <= min(row["n_exact"], row["n_jaccard"])
    assert row["n_jaccard_cdc"] <= min(row["n_jaccard"], row["n_cdc"])
    assert row["n_all3"] <= min(
        row["n_exact_jaccard"], row["n_exact_cdc"], row["n_jaccard_cdc"]
    )


def test_bow_dedup_order_invariant(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(
                    [
                        "the cat sat",
                        "sat the cat",      # same bag, reordered
                        "cat sat the",      # same bag again
                        "the cat cat",      # different multiset
                        "unique words here",
                    ]
                ),
            }
        )
    )
    rows = {r["group_size"]: r for r in an.bow_dedup_ds(docs).take_all()}
    assert rows[3]["n_groups"] == 1 and rows[3]["n_docs"] == 3
    assert rows[1]["n_groups"] == 2 and rows[1]["n_docs"] == 2


def test_hard_negatives_same_cell_diff_label(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # v1/v2: same cell (all coords ~0.01 apart), labels differ -> pair
    # v3: same cell, same label as v1 -> no pair with v1
    # v4: far away cell -> no pairs
    dim = 8
    base = [0.1] * dim
    near = [0.11] * dim
    far = [0.9] * dim
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
                "embedding": pa.array(
                    [base, near, base, far], pa.list_(pa.float32())
                ),
                "label": pa.array([0, 1, 0, 2], pa.int32()),
            }
        )
    )
    rows = {(r["vec_a"], r["vec_b"]): r for r in
            an.hard_negatives_ds(emb).take_all()}
    assert (1, 2) in rows and (2, 3) in rows
    assert (1, 3) not in rows  # same label
    assert all(4 not in k for k in rows)
    # exact integer squared distance: per dim q diff
    qa = np.floor(np.array(base, np.float64) * 1e6).astype(np.int64)
    qb = np.floor(np.array(near, np.float64) * 1e6).astype(np.int64)
    # float32 storage: recompute through float32 like the operator does
    qa32 = np.floor(np.array(base, np.float32).astype(np.float64) * 1e6).astype(np.int64)
    qb32 = np.floor(np.array(near, np.float32).astype(np.float64) * 1e6).astype(np.int64)
    assert rows[(1, 2)]["d2q"] == int(((qa32 - qb32) ** 2).sum())


def test_rare_token_pairs_trigram_blocking(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # docs 1 and 2 share the trigram "quick brown fox" (df=2 -> rare);
    # "the quick brown" appears in 1,2,3,4 (df=4 -> too common);
    # doc 5 shares nothing.
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(
                    [
                        "the quick brown fox jumps",
                        "see the quick brown fox",
                        "the quick brown bear naps",
                        "the quick brown bear runs",
                        "completely different words entirely",
                    ]
                ),
            }
        )
    )
    rows = {(r["doc_a"], r["doc_b"]): r["n_shared_rare"] for r in
            an.rare_token_pairs_ds(docs, max_df=3).take_all()}
    # (1,2): "quick brown fox" (df=2); (3,4): "quick brown bear" (df=2)
    assert rows[(1, 2)] >= 1 and rows[(3, 4)] >= 1
    assert all(5 not in k for k in rows)
    # df=4 trigram "the quick brown" must not link (1,3) on its own:
    assert (1, 3) not in rows and (1, 4) not in rows


def test_temporal_split_exact_quantile_cutoffs(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    day = 86_400_000_000
    # 10 events on days 0..9, one per day, one type.  Exact discrete
    # quantiles: train cutoff = smallest day with cum*100 >= 70*10
    # -> day 6 (cum 7); valid cutoff = smallest day with cum*100 >=
    # 85*10 -> day 8 (cum(day7)=8 -> 800 < 850; cum(day8)=9 -> 900).
    events = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array([d * day for d in range(10)], pa.int64()),
                "event_type": pa.array(["view"] * 10),
            }
        )
    )
    rows = {r["split"]: r for r in an.temporal_split_ds(events).take_all()}
    assert rows["train"]["n_events"] == 7
    assert rows["train"]["day_min"] == 0 and rows["train"]["day_max"] == 6
    assert rows["valid"]["n_events"] == 2 and rows["valid"]["day_min"] == 7
    assert rows["test"]["n_events"] == 1 and rows["test"]["day_min"] == 9


def test_join_card_estimate_exact_side(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # key 1 x3, key 2 x2, key 3 x1 -> self-join size 9 + 4 + 1 = 14
    events = ray.data.from_arrow(
        pa.table({"user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64())})
    )
    row = an.join_card_estimate_ds(events).take_all()[0]
    assert row["actual_join_rows"] == 14
    est = row["estimated_join_rows"]
    assert est % 16 == 0  # scaled by the sampling modulus
    if row["actual_join_rows"] > 0 and est != row["actual_join_rows"]:
        assert row["err_sign"] in (-1, 1)


def test_bottomk_sample_exact_size_and_merge(ray_session):
    import hashlib
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    n = 500
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "n_chars": pa.array([i * 7 % 97 for i in range(n)], pa.int64()),
            }
        )
    ).repartition(8)  # force per-block partials to merge
    k = 25
    got = an.bottomk_sample_ds(docs, k=k).take_all()
    assert len(got) == k
    want = sorted(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16), i)
        for i in range(n)
    )[:k]
    assert [(r["h60"], r["doc_id"]) for r in got] == want


def _span_table():
    import pyarrow as pa
    from pdfplumber_ray.sources.synth_corpus import SPAN

    def s(kind, text, media="", off=0):
        return {"kind": kind, "text": text, "media_ref": media, "offset": off}

    docs = [
        # heading -> text -> text -> cell -> cell -> media
        [s("heading", "intro", off=0), s("text", "aaa bbb", off=5),
         s("text", "ccc", off=12), s("table_cell", "x", off=15),
         s("table_cell", "y", off=16),
         s("media_ref", "", "media://d/0", 17)],
        # media-only doc
        [s("media_ref", "", "media://d/1", 0)],
        # NON-monotonic offsets (9 then 3)
        [s("text", "one", off=9), s("text", "two", off=3)],
    ]
    return pa.table(
        {
            "doc_id": pa.array(
                ["doc-00000001", "doc-00000002", "doc-00000003"], pa.string()
            ),
            "spans": pa.array(docs, pa.list_(SPAN)),
        }
    )


def test_span_kind_transitions_bigrams(ray_session):
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    docs = ray.data.from_arrow(_span_table())
    rows = {(r["kind_from"], r["kind_to"]): r["n"] for r in
            an.span_kind_transitions_ds(docs).take_all()}
    assert rows[("heading", "text")] == 1
    assert rows[("text", "text")] == 2  # doc1 has one, doc3 has one
    assert rows[("text", "table_cell")] == 1
    assert rows[("table_cell", "table_cell")] == 1
    assert rows[("table_cell", "media_ref")] == 1
    # doc boundaries never create transitions
    assert ("media_ref", "text") not in rows
    assert ("media_ref", "media_ref") not in rows


def test_media_density_profile(ray_session):
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    docs = ray.data.from_arrow(_span_table())
    rows = {r["doc_id"]: r for r in an.media_density_ds(docs).take_all()}
    d1 = rows[1]
    assert d1["n_spans"] == 6 and d1["n_media"] == 1 and d1["n_text"] == 5
    assert d1["text_chars"] == len("intro") + len("aaa bbb") + len("ccc") + 2
    assert d1["media_permille"] == 1000 // 6
    d2 = rows[2]
    assert d2["n_spans"] == 1 and d2["media_permille"] == 1000


def test_span_offset_audit_catches_violation(ray_session):
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    docs = ray.data.from_arrow(_span_table())
    row = an.span_offset_audit_ds(docs).take_all()[0]
    assert row["n_docs"] == 3
    assert row["n_monotonic"] == 2  # doc3's offsets decrease
    assert row["sum_final_offset"] == 17 + 0 + 3
    assert row["max_span_count"] == 6


def test_kind_runlengths_rle(ray_session):
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    docs = ray.data.from_arrow(_span_table())
    rows = {r["kind"]: r for r in an.kind_runlengths_ds(docs).take_all()}
    assert rows["text"]["n_runs"] == 2  # doc1 run of 2, doc3 run of 2
    assert rows["text"]["max_run"] == 2
    assert rows["text"]["n_spans"] == 4
    assert rows["table_cell"]["n_runs"] == 1
    assert rows["table_cell"]["max_run"] == 2
    assert rows["media_ref"]["n_runs"] == 2 and rows["media_ref"]["max_run"] == 1


def test_media_ref_integrity_flags_violations(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an
    from pdfplumber_ray.sources.synth_corpus import SPAN

    def m(ref, off=0):
        return {"kind": "media_ref", "text": "", "media_ref": ref, "offset": off}

    docs = [
        # clean doc: dense 0..1, owned refs
        [m("media://doc-00000001/0", 0), m("media://doc-00000001/1", 1)],
        # foreign ref (names doc 9) + bad scheme + non-dense (0 then 2)
        [m("media://doc-00000009/0", 0),
         m("http://x/0", 1),
         m("media://doc-00000002/0", 2),
         m("media://doc-00000002/2", 3)],
        # no media at all
        [{"kind": "text", "text": "hi", "media_ref": "", "offset": 0}],
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    ["doc-00000001", "doc-00000002", "doc-00000003"],
                    pa.string(),
                ),
                "spans": pa.array(docs, pa.list_(SPAN)),
            }
        )
    )
    row = an.media_ref_integrity_ds(ds).take_all()[0]
    assert row["n_refs"] == 6
    assert row["n_bad_scheme"] == 1      # http://x/0
    assert row["n_foreign"] == 1         # media://doc-00000009/0
    assert row["n_docs_with_media"] == 2
    assert row["n_dense_docs"] == 1      # doc2's ks are {0,0,2,-1-ish} not dense


def test_kmv_intersection_exact_when_sketch_not_full(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    # two sources, < k distinct shingles each -> union sketch not full
    # -> the estimate must EQUAL the exact intersection
    a = "alpha beta gamma delta epsilon zeta"       # shingles: 4
    b = "alpha beta gamma delta other words here"   # shares 'alpha beta gamma', 'beta gamma delta'
    docs = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(["sA", "sB"], pa.string()),
                "text": pa.array([a, b], pa.string()),
            }
        )
    )
    rows = an.kmv_intersection_ds(docs, k=128).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src_a"], r["src_b"]) == ("sA", "sB")
    assert r["exact_common"] == 2
    assert r["kmv_est"] == r["exact_common"]
    assert r["abs_err_permille"] == 0


def test_cohort_ltv_triangle(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an

    wk = 7 * 86_400 * 1_000_000
    # user 1: first week 0 (10.50), active again week 2 (2.25)
    # user 2: first week 2 (1.00) -> cohort 2 age 0
    events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "ts": pa.array([0, 1000, 2 * wk, 2 * wk + 5], pa.int64()),
                "value": pa.array([10.0, 0.50, 2.25, 1.00], pa.float64()),
            }
        )
    )
    rows = {(r["cohort_week"], r["age_weeks"]): r for r in
            an.cohort_ltv_ds(events).take_all()}
    assert rows[(0, 0)]["n_users"] == 1
    assert rows[(0, 0)]["revenue_cents"] == 1050
    assert rows[(0, 2)]["revenue_cents"] == 225
    assert rows[(2, 0)]["n_users"] == 1
    assert rows[(2, 0)]["revenue_cents"] == 100


def test_caption_mining_nearest_preceding_text(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an
    from pdfplumber_ray.sources.synth_corpus import SPAN

    def s(kind, text, media="", off=0):
        return {"kind": kind, "text": text, "media_ref": media, "offset": off}

    docs = [
        # media after text -> caption = "second span here"
        [s("text", "first", off=0), s("text", "second span here", off=5),
         s("media_ref", "", "media://a/0", 21)],
        # LEADING media: no preceding text in this doc (the previous
        # doc's text must NOT leak across the boundary)
        [s("media_ref", "", "media://b/0", 0), s("text", "after", off=1)],
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["doc-00000001", "doc-00000002"]),
                "spans": pa.array(docs, pa.list_(SPAN)),
            }
        )
    )
    rows = {r["media_ref"]: r for r in an.caption_mining_ds(ds).take_all()}
    assert rows["media://a/0"]["caption"] == "second span here"
    assert rows["media://a/0"]["caption_words"] == 3
    assert rows["media://b/0"]["caption"] == ""
    assert rows["media://b/0"]["caption_words"] == 0


def test_span_pack_greedy_budget(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import analytics as an
    from pdfplumber_ray.sources.synth_corpus import SPAN

    def t(words):
        return {"kind": "text", "text": " ".join(["w"] * words),
                "media_ref": "", "offset": 0}

    def m():
        return {"kind": "media_ref", "text": "", "media_ref": "media://x",
                "offset": 0}

    docs = [
        # 6+6+6+6 = 24 exact, then 6+media -> 2 chunks, max 24
        [t(6), t(6), t(6), t(6), t(6), m()],
        # leading media + oversized 30-word span: media chunk absorbs the
        # oversized span (zero-word chunks must take the next text span)
        [m(), t(30), t(2)],
        # media-only doc -> exactly one zero-word chunk
        [m(), m()],
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    ["doc-00000001", "doc-00000002", "doc-00000003"]
                ),
                "spans": pa.array(docs, pa.list_(SPAN)),
            }
        )
    )
    rows = {r["doc_id"]: r for r in
            an.span_pack_ds(ds, budget_words=24).take_all()}
    assert rows[1]["n_chunks"] == 2 and rows[1]["max_chunk_words"] == 24
    assert rows[1]["total_words"] == 30
    assert rows[2]["n_chunks"] == 2  # [media + 30w] then [2w]
    assert rows[2]["max_chunk_words"] == 30 and rows[2]["total_words"] == 32
    assert rows[3]["n_chunks"] == 1 and rows[3]["max_chunk_words"] == 0

"""Warehouse-style analytics and dataset-maintenance operators.

Round-5 additions beyond `corpus_ops`: the relational / product-analytics
shapes a training-data platform runs next to its curation pipelines —
anti joins (orphan detection), CDC compaction (keep-latest per key),
hopping windows, cohort retention, per-group percentile ranks, equi-width
histograms, inverted-index builds and data-quality audits.

Scale design notes (same rules as `corpus_ops`):
* Per-record work is a task-mode ``map_batches`` with a per-batch Arrow /
  numpy combiner; the only all-to-all exchanges move combined rows.
* Key-local reductions (argmax per key, per-user distinct, anti-join
  probes) NEVER use ``groupby(key).map_groups`` when the key domain is
  unbounded (millions of near-singleton groups drown in per-group Python
  overhead — measured in round 5, CLAUDE.md): rows shuffle by
  ``mix64(key) % n_buckets`` (a BOUNDED group count) and segment inside
  the bucket with one lexsort, all vectorized.
* Broadcast sides (per-group CDFs) go through ``ray.put`` once with an
  explicit size guard, never re-shipped per batch.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions import textstats as ts

Dataset = ray.data.Dataset


def _anchor_schema(ds: Dataset, schema: pa.Schema) -> Dataset:
    """Union an explicit empty typed block in front of ``ds`` so the
    pipeline's schema survives even when every downstream group emits
    zero rows (an all-empty ``map_groups`` output otherwise yields a
    schema-less dataset, which breaks empty-vs-empty oracle compares)."""
    empty = pa.table(
        {f.name: pa.array([], f.type) for f in schema}
    )
    return ray.data.from_arrow(empty).union(ds)


def _small_df(ds: Dataset, cols: "dict[str, object]"):
    """``to_pandas()`` for a SMALL (report-sized) aggregate with a
    guaranteed schema.

    Ray's ``groupby().aggregate()`` over a zero-row input yields a
    dataset with no derivable schema, so ``to_pandas()`` returns a frame
    with ZERO columns and downstream column access raises ``KeyError``
    (the recurring empty-corpus crash class).  ``cols`` maps column name
    -> pandas/numpy dtype; when the collect comes back column-less the
    helper substitutes a typed empty frame so the empty path flows
    through the same vectorized code as the populated one."""
    return _ensure_cols(ds.to_pandas(), cols)


def _ensure_cols(df, cols: "dict[str, object]"):
    """Substitute a typed empty frame when a small collect came back
    column-less (see :func:`_small_df`); pass populated frames through."""
    import pandas as pd

    if df.shape[1] == 0:
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})
    return df


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over an int64/uint64 array — the
    deterministic cross-worker bucket hash for integer keys (Python's
    ``hash()`` is per-process-salted; md5 per row is a Python loop)."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


# ---------- per-group percentile rank (windowed CDF) ----------


def grouped_rank_ds(
    ds: Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
    max_domain_broadcast: int = 5_000_000,
) -> Dataset:
    """``count(*) OVER (PARTITION BY g ORDER BY v)`` plus the partition
    total — the per-group percentile rank — WITHOUT a global sort: a
    per-batch ``(g, v)`` count combiner bounds the shuffle to one row per
    distinct (group, value) pair per block, the grouped cumulative
    histogram broadcasts once via ``ray.put`` (size-guarded), and one
    ``searchsorted`` probe per batch attaches ``n_le`` / ``g_total`` /
    the integer permille. A sort-based window function would shuffle the
    ENTIRE table; this moves one row per distinct (group, value)."""

    def vc_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "g": pa.array([], pa.string()),
                "v": pa.array([], pa.int64()),
                "n_partial": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        t = pa.table(
            {
                "g": batch.column(group_col).cast(pa.string()),
                "v": batch.column(value_col).cast(pa.int64()),
            }
        )
        g = t.group_by(["g", "v"]).aggregate([("v", "count")])
        return pa.table(
            {
                "g": g.column("g"),
                "v": g.column("v"),
                "n_partial": g.column("v_count").cast(pa.int64()),
            }
        )

    hist = (
        ds.select_columns([group_col, value_col])
        .map_batches(vc_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["g", "v"])
        .aggregate(Sum("n_partial"))
        .materialize()
    )
    n_cells = hist.count()
    if n_cells > max_domain_broadcast:
        raise ValueError(
            f"(group, value) domain ({n_cells} cells) exceeds "
            f"max_domain_broadcast={max_domain_broadcast}"
        )
    rows = hist.take_all()
    groups = np.asarray([r["g"] for r in rows], dtype=object)
    vals = np.asarray([int(r["v"]) for r in rows], dtype=np.int64)
    cnts = np.asarray([int(r["sum(n_partial)"]) for r in rows], dtype=np.int64)
    gnames, gcodes = np.unique(groups.astype(str), return_inverse=True)
    order = np.lexsort((vals, gcodes))
    gcodes, vals, cnts = gcodes[order], vals[order], cnts[order]
    # within-group cumulative counts + per-group totals
    cum = np.cumsum(cnts)
    gstart = np.concatenate(([True], gcodes[1:] != gcodes[:-1]))
    base = np.zeros(len(cum), dtype=np.int64)
    starts = np.flatnonzero(gstart)
    if len(cum):
        base[starts[1:]] = cum[starts[1:] - 1]
    base = np.maximum.accumulate(base)
    n_le_arr = cum - base
    totals = np.zeros(len(gnames), dtype=np.int64)
    ends = np.concatenate((starts[1:], [len(cum)])) - 1
    if len(cum):
        totals[gcodes[ends]] = n_le_arr[ends]
    # composite probe key: gcode * 2^40 + v (value domain < 2^40)
    shift = np.int64(1) << np.int64(40)
    key_sorted = gcodes.astype(np.int64) * shift + vals
    cdf_ref = ray.put((gnames, key_sorted, n_le_arr, totals))

    def attach(batch: pa.Table) -> pa.Table:
        gtype = batch.column(group_col).type
        empty = pa.table(
            {
                id_col: pa.array([], batch.column(id_col).type),
                group_col: pa.array([], gtype),
                value_col: pa.array([], pa.int64()),
                "n_le": pa.array([], pa.int64()),
                "g_total": pa.array([], pa.int64()),
                "permille": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        names_s, keys_s, nle_s, tot_s = ray.get(cdf_ref)
        gv = batch.column(group_col).cast(pa.string()).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        gc = np.searchsorted(names_s, gv.astype(str))
        key = gc.astype(np.int64) * (np.int64(1) << np.int64(40)) + v
        idx = np.searchsorted(keys_s, key, side="right") - 1
        n_le = nle_s[idx]
        g_total = tot_s[gc]
        return pa.table(
            {
                id_col: batch.column(id_col),
                group_col: batch.column(group_col),
                value_col: pa.array(v, pa.int64()),
                "n_le": pa.array(n_le, pa.int64()),
                "g_total": pa.array(g_total, pa.int64()),
                "permille": pa.array(n_le * 1000 // g_total, pa.int64()),
            }
        )

    return ds.select_columns([id_col, group_col, value_col]).map_batches(
        attach, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------- equi-width histogram ----------


def histogram_ds(
    events: Dataset,
    value_col: str = "value",
    width_e6: int = 500_000,
) -> Dataset:
    """Equi-width histogram of a non-negative numeric column in e6
    fixed-point (bin = floor(value * 1e6) // width_e6): per-batch bin
    combiner -> one tiny ``groupby(bin)`` over (bins x blocks) rows.
    Emits ``(bin, bin_lo_e6, n_events, value_sum_e6)``, all integers so
    a SQL twin compares bit-exact."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bin": pa.array([], pa.int64()),
                "n_partial": pa.array([], pa.int64()),
                "sum_partial": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        v6 = np.floor(
            batch.column(value_col).to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        t = pa.table({"bin": pa.array(v6 // width_e6, pa.int64()), "v6": pa.array(v6)})
        g = t.group_by("bin").aggregate([("v6", "count"), ("v6", "sum")])
        return pa.table(
            {
                "bin": g.column("bin"),
                "n_partial": g.column("v6_count").cast(pa.int64()),
                "sum_partial": g.column("v6_sum").cast(pa.int64()),
            }
        )

    agg = (
        events.select_columns([value_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("n_partial"), Sum("sum_partial"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.column("bin").cast(pa.int64())
        return pa.table(
            {
                "bin": b,
                "bin_lo_e6": pc.multiply(b, pa.scalar(width_e6, pa.int64())),
                "n_events": batch.column("sum(n_partial)").cast(pa.int64()),
                "value_sum_e6": batch.column("sum(sum_partial)").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ---------- hopping (sliding) window aggregate ----------


def hopping_window_ds(
    events: Dataset,
    size_s: int = 3600,
    hop_s: int = 900,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> Dataset:
    """Hopping-window aggregate (window ``size_s``, advancing every
    ``hop_s``; ``size_s`` must be a multiple of ``hop_s``): each event
    lands in exactly ``size_s // hop_s`` overlapping windows. The
    expansion happens INSIDE the batch (np.repeat + tile) and immediately
    re-combines with an Arrow ``group_by``, so the shuffle moves one row
    per (type, window) per block — not ``size/hop`` copies of the corpus.
    Emits ``(event_type, window_start_s, n_events, value_sum_e6)``."""
    if size_s % hop_s != 0:
        raise ValueError("size_s must be a multiple of hop_s")
    n_win = size_s // hop_s

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "window_start_s": pa.array([], pa.int64()),
                "n_partial": pa.array([], pa.int64()),
                "sum_partial": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        n = batch.num_rows
        ts_us = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v6 = np.floor(
            batch.column(value_col).to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        k = ts_us // (hop_s * 1_000_000)
        # windows containing t: starts (k - i) * hop for i in 0..n_win-1
        offs = np.tile(np.arange(n_win, dtype=np.int64), n)
        ws = (np.repeat(k, n_win) - offs) * hop_s
        t = pa.table(
            {
                "event_type": batch.column(type_col).take(
                    pa.array(np.repeat(np.arange(n, dtype=np.int64), n_win))
                ),
                "window_start_s": pa.array(ws, pa.int64()),
                "v6": pa.array(np.repeat(v6, n_win)),
            }
        )
        g = t.group_by(["event_type", "window_start_s"]).aggregate(
            [("v6", "count"), ("v6", "sum")]
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "window_start_s": g.column("window_start_s"),
                "n_partial": g.column("v6_count").cast(pa.int64()),
                "sum_partial": g.column("v6_sum").cast(pa.int64()),
            }
        )

    agg = (
        events.select_columns([ts_col, type_col, value_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_start_s"])
        .aggregate(Sum("n_partial"), Sum("sum_partial"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start_s": batch.column("window_start_s").cast(pa.int64()),
                "n_events": batch.column("sum(n_partial)").cast(pa.int64()),
                "value_sum_e6": batch.column("sum(sum_partial)").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ---------- cohort retention ----------


def cohort_retention_ds(
    events: Dataset,
    week_us: int = 7 * 86_400 * 1_000_000,
    ts_col: str = "ts",
    user_col: str = "user_id",
    n_buckets: int = 512,
) -> Dataset:
    """Cohort retention matrix: users grouped by first-active week
    (cohort), counted in every week they were active. Emits one row per
    ``(cohort_week, active_week)`` with the distinct-user count.

    Scale shape: per-batch distinct ``(user, week)`` combiner -> ONE
    shuffle by ``mix64(user) % n_buckets`` (bounded group count — never
    ``groupby(user)`` with millions of near-singleton groups) -> inside
    the bucket one lexsort segments users, the cohort is each segment's
    first week, and (cohort, week) partial counts emit -> a final tiny
    ``groupby`` over the (weeks x weeks) domain."""

    def pairs_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "u": pa.array([], pa.int64()),
                "w": pa.array([], pa.int64()),
                "bkt": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        t = pa.table(
            {
                "u": batch.column(user_col).cast(pa.int64()),
                "w": pc.divide(batch.column(ts_col).cast(pa.int64()),
                               pa.scalar(week_us, pa.int64())),
            }
        ).group_by(["u", "w"]).aggregate([])
        u = t.column("u").to_numpy(zero_copy_only=False)
        bkt = (_mix64(u) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("bkt", pa.array(bkt))

    pairs = events.select_columns([user_col, ts_col]).map_batches(
        pairs_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_counts(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_week": pa.array([], pa.int64()),
                "active_week": pa.array([], pa.int64()),
                "n_partial": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        u = group.column("u").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        # global distinct within the bucket (cross-block dups collapse here)
        key = np.stack([u, w], axis=1)
        key = np.unique(key, axis=0)  # sorted by (u, w)
        uu, ww = key[:, 0], key[:, 1]
        seg_first = np.concatenate(([True], uu[1:] != uu[:-1]))
        cohort = ww[np.maximum.accumulate(np.where(seg_first, np.arange(len(ww)), 0))]
        t = pa.table(
            {"cohort_week": pa.array(cohort, pa.int64()),
             "active_week": pa.array(ww, pa.int64())}
        ).group_by(["cohort_week", "active_week"]).aggregate([("active_week", "count")])
        return pa.table(
            {
                "cohort_week": t.column("cohort_week"),
                "active_week": t.column("active_week"),
                "n_partial": t.column("active_week_count").cast(pa.int64()),
            }
        )

    agg = (
        pairs.groupby("bkt")
        .map_groups(bucket_counts, batch_format="pyarrow")
        .groupby(["cohort_week", "active_week"])
        .aggregate(Sum("n_partial"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": batch.column("cohort_week").cast(pa.int64()),
                "active_week": batch.column("active_week").cast(pa.int64()),
                "n_users": batch.column("sum(n_partial)").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ---------- anti join ----------


def anti_join_ds(
    left: Dataset,
    right: Dataset,
    key_col: str,
    right_key_col: Optional[str] = None,
    n_buckets: int = 512,
) -> Dataset:
    """Anti semi-join: left rows whose ``key_col`` never appears in the
    right side (orphan / no-activity detection). NO broadcast of either
    side: the right side reduces to per-batch distinct keys, both sides
    shuffle ONCE by ``mix64(key) % n_buckets`` (bounded groups) tagged by
    side, and inside each bucket a vectorized ``np.isin`` keeps the
    unmatched left rows. Left payload columns pass through unchanged."""
    return _semi_anti_join(left, right, key_col, right_key_col, n_buckets, False)


def semi_join_ds(
    left: Dataset,
    right: Dataset,
    key_col: str,
    right_key_col: Optional[str] = None,
    n_buckets: int = 512,
) -> Dataset:
    """Semi-join: left rows whose ``key_col`` appears at least once in
    the right side (EXISTS filtering — e.g. "customers with activity"),
    emitted once each regardless of right-side multiplicity. Same
    dataflow as :func:`anti_join_ds` with the membership test flipped."""
    return _semi_anti_join(left, right, key_col, right_key_col, n_buckets, True)


def _semi_anti_join(
    left: Dataset,
    right: Dataset,
    key_col: str,
    right_key_col: Optional[str],
    n_buckets: int,
    keep_matched: bool,
) -> Dataset:
    rkey = right_key_col or key_col
    payload_cols = [c for c in left.schema().names if c != key_col]

    def left_side(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).cast(pa.int64())
        bkt = (_mix64(keys.to_numpy(zero_copy_only=False)) % np.uint64(n_buckets)).astype(np.int64)
        t = pa.table({"k": keys, "side": pa.array(np.zeros(batch.num_rows, np.int8))})
        for c in payload_cols:
            t = t.append_column(c, batch.column(c))
        return t.append_column("bkt", pa.array(bkt))

    def right_side(batch: pa.Table, left_schema: pa.Schema) -> pa.Table:
        keys = pa.table({"k": batch.column(rkey).cast(pa.int64())}).group_by("k").aggregate([])
        kn = keys.column("k").to_numpy(zero_copy_only=False)
        bkt = (_mix64(kn) % np.uint64(n_buckets)).astype(np.int64)
        t = pa.table({"k": keys.column("k"), "side": pa.array(np.ones(len(kn), np.int8))})
        for c in payload_cols:
            t = t.append_column(c, pa.nulls(len(kn), left_schema.field(c).type))
        return t.append_column("bkt", pa.array(bkt))

    left_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(left.schema().names, left.schema().types)]
    )
    both = left.map_batches(
        left_side, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.select_columns([rkey]).map_batches(
            lambda b: right_side(b, left_schema),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    def bucket_anti(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        k = group.column("k").to_numpy(zero_copy_only=False)
        left_mask = side == 0
        member = np.isin(k, k[~left_mask])
        keep = left_mask & (member if keep_matched else ~member)
        out = group.filter(pa.array(keep))
        cols = {key_col: out.column("k")}
        for c in payload_cols:
            cols[c] = out.column(c)
        return pa.table(cols)

    out_schema = pa.schema(
        [pa.field(key_col, pa.int64())]
        + [left_schema.field(c) for c in payload_cols]
    )
    return _anchor_schema(
        both.groupby("bkt").map_groups(bucket_anti, batch_format="pyarrow"),
        out_schema,
    )


# ---------- keep-latest per key (CDC compaction) ----------


def keep_latest_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    n_buckets: int = 512,
) -> Dataset:
    """CDC compaction / crawl-recency dedup: for every key keep the single
    most recent row (``ts`` DESC, ``tie_col`` DESC — fully deterministic).
    The canonical "latest crawl of each URL wins" maintenance step.

    Scale shape: per-batch vectorized argmax combiner (ONE lexsort, last
    row per key segment) cuts each block to one row per key -> one
    shuffle by ``mix64(key) % n_buckets`` -> the same argmax inside the
    bucket. All payload columns ride along; no per-key Python anywhere."""

    def block_latest(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        tie = batch.column(tie_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, t, k))
        ks = k[order]
        last = np.concatenate((ks[1:] != ks[:-1], [True]))
        return batch.take(pa.array(order[last]))

    def add_bucket(batch: pa.Table) -> pa.Table:
        reduced = block_latest(batch)
        if reduced.num_rows == 0:
            return reduced.append_column("bkt", pa.array([], pa.int64()))
        k = reduced.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        bkt = (_mix64(k) % np.uint64(n_buckets)).astype(np.int64)
        return reduced.append_column("bkt", pa.array(bkt))

    reduced = events.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_latest(group: pa.Table) -> pa.Table:
        return block_latest(group.drop_columns(["bkt"]))

    if events.schema(fetch_if_missing=True) is None:
        # empty input with no derivable schema: keep-latest of nothing
        # is nothing; hand the (empty) input straight back
        return events
    ev_schema = pa.schema(
        [
            pa.field(n, t)
            for n, t in zip(events.schema().names, events.schema().types)
        ]
    )
    return _anchor_schema(
        reduced.groupby("bkt").map_groups(bucket_latest, batch_format="pyarrow"),
        ev_schema,
    )


# ---------- inverted index (posting lists, df band) ----------


def postings_ds(
    docs: Dataset,
    min_df: int = 2,
    max_df: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
) -> Dataset:
    """Inverted-index build with a document-frequency band: for every
    token with ``min_df <= df <= max_df`` emit its posting list (sorted
    doc ids, comma-joined — a string so the oracle compare is exact).
    The band is the classic index-build hygiene: ``df < min_df`` drops
    hapax noise, ``df > max_df`` drops stopword-grade postings whose
    lists would dominate the output.

    Scale shape: per-batch per-doc-distinct ``(token, doc)`` combiner ->
    ONE shuffle by ``md5(token) % n_buckets`` (bounded groups — never one
    group per token) -> inside the bucket one lexsort segments tokens,
    the df band filters vectorized, and every surviving posting list is
    assembled with a single ``pc.binary_join`` (no per-token Python
    join)."""

    def pairs_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "token": pa.array([], pa.string()),
                "d": pa.array([], pa.int64()),
                "bkt": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        toks = pc.split_pattern(
            pc.fill_null(batch.column(text_col), ""), pattern=" "
        )
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if len(flat) == 0:
            return empty
        d = np.repeat(
            batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False),
            n_tok,
        )
        t = (
            pa.table({"token": flat, "d": pa.array(d, pa.int64())})
            .group_by(["token", "d"])
            .aggregate([])
        )
        gl = t.column("token").to_pylist()
        h = np.fromiter((ts.md5_u64(g) for g in gl), np.uint64, count=len(gl))
        return t.append_column(
            "bkt", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    pairs = docs.select_columns([id_col, text_col]).map_batches(
        pairs_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_postings(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "token": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "doc_ids": pa.array([], pa.string()),
            }
        )
        if group.num_rows == 0:
            return empty
        tok = group.column("token").to_numpy(zero_copy_only=False).astype(str)
        d = group.column("d").to_numpy(zero_copy_only=False)
        # cross-block duplicates of (token, doc) collapse here
        uniq, codes = np.unique(tok, return_inverse=True)
        pair_key = codes.astype(np.int64) * np.int64(2**40) + d
        pair_key = np.unique(pair_key)
        codes_u = (pair_key >> np.int64(40)).astype(np.int64)
        d_u = pair_key & (np.int64(2**40) - 1)
        seg_first = np.concatenate(([True], codes_u[1:] != codes_u[:-1]))
        seg_start = np.flatnonzero(seg_first)
        seg_len = np.diff(np.concatenate((seg_start, [len(codes_u)])))
        band = (seg_len >= min_df) & (seg_len <= max_df)
        if not band.any():
            return empty
        keep_seg = np.flatnonzero(band)
        row_keep = np.repeat(band, seg_len)
        d_keep = d_u[row_keep]
        lens = seg_len[keep_seg]
        offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets), pc.cast(pa.array(d_keep, pa.int64()), pa.string())
        )
        return pa.table(
            {
                "token": pa.array(uniq[codes_u[seg_start[keep_seg]]], pa.string()),
                "df": pa.array(lens, pa.int64()),
                "doc_ids": pc.binary_join(lists, ","),
            }
        )

    return _anchor_schema(
        pairs.groupby("bkt").map_groups(bucket_postings, batch_format="pyarrow"),
        pa.schema(
            [
                pa.field("token", pa.string()),
                pa.field("df", pa.int64()),
                pa.field("doc_ids", pa.string()),
            ]
        ),
    )


# ---------- data-quality audit ----------


def quality_audit_ds(
    docs: Dataset,
    text_col: str = "text",
    int_col: str = "n_chars",
    cat_cols: Sequence[str] = ("lang", "source"),
) -> Dataset:
    """Expectation-style data-quality audit (the pre-training sanity gate
    run before any expensive pipeline): one row per ``(col_name, metric,
    value)`` — row count, null / empty-string counts, min/max of the
    numeric column, and EXACT distinct counts of the bounded categorical
    columns. Scalar metrics reduce via one per-batch counter row +
    ``Sum``/``Min``/``Max``; distinct counts shuffle one row per distinct
    (column, value) per block. Nothing unbounded ever reaches the
    driver."""

    def counters(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        text = batch.column(text_col)
        ints = batch.column(int_col).cast(pa.int64())
        n_null = text.null_count
        n_empty = int(
            pc.sum(
                pc.cast(pc.equal(pc.fill_null(text, "\x00"), ""), pa.int64())
            ).as_py()
            or 0
        )
        vmin = pc.min(ints).as_py()
        vmax = pc.max(ints).as_py()
        big = np.int64(2**62)
        return pa.table(
            {
                "n_rows": pa.array([n], pa.int64()),
                "n_null_text": pa.array([n_null], pa.int64()),
                "n_empty_text": pa.array([n_empty], pa.int64()),
                "v_min": pa.array([big if vmin is None else vmin], pa.int64()),
                "v_max": pa.array([-big if vmax is None else vmax], pa.int64()),
            }
        )

    scal = docs.select_columns([text_col, int_col]).map_batches(
        counters, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        Sum("n_rows"), Sum("n_null_text"), Sum("n_empty_text"),
        Min("v_min"), Max("v_max"),
    )

    def distinct_partial(batch: pa.Table) -> pa.Table:
        parts = []
        for c in cat_cols:
            t = (
                pa.table({"val": batch.column(c).cast(pa.string())})
                .group_by("val")
                .aggregate([])
            )
            parts.append(
                pa.table(
                    {
                        "col_name": pa.array([c] * t.num_rows, pa.string()),
                        "val": t.column("val"),
                    }
                )
            )
        return pa.concat_tables(parts)

    ndis = (
        docs.select_columns(list(cat_cols))
        .map_batches(distinct_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["col_name", "val"])
        .count()
        .groupby("col_name")
        .count()
        .take_all()
    )
    dmap = {r["col_name"]: int(r["count()"]) for r in ndis}

    rows: List[Tuple[str, str, int]] = [
        (int_col, "n_rows", int(scal["sum(n_rows)"] or 0)),
        (text_col, "n_null", int(scal["sum(n_null_text)"] or 0)),
        (text_col, "n_empty", int(scal["sum(n_empty_text)"] or 0)),
        (int_col, "min_value", int(scal["min(v_min)"] or 0)),
        (int_col, "max_value", int(scal["max(v_max)"] or 0)),
    ] + [(c, "n_distinct", dmap.get(c, 0)) for c in cat_cols]
    return ray.data.from_arrow(
        pa.table(
            {
                "col_name": pa.array([r[0] for r in rows], pa.string()),
                "metric": pa.array([r[1] for r in rows], pa.string()),
                "value": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )


# ---------- per-window exact distinct users ----------


def window_users_ds(
    events: Dataset,
    width_s: int = 3600,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> Dataset:
    """Exact distinct-user count per tumbling window (the DAU/HAU metric
    with exact semantics): per-batch distinct ``(window, user)`` combiner
    -> ``groupby(window, user)`` collapses cross-block duplicates (one
    row per pair survives) -> per-batch window-count combiner -> a tiny
    final ``groupby(window)``. Two shuffles, the second over one row per
    (window x block). The classic exact-distinct dataflow; an HLL sketch
    is the approximate drop-in when exactness stops mattering."""
    width_us = width_s * 1_000_000

    def pair_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"w": pa.array([], pa.int64()), "u": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        ts_us = batch.column(ts_col).cast(pa.int64())
        return (
            pa.table(
                {
                    "w": pc.multiply(
                        pc.divide(ts_us, pa.scalar(width_us, pa.int64())),
                        pa.scalar(width_s, pa.int64()),
                    ),
                    "u": batch.column(user_col).cast(pa.int64()),
                }
            )
            .group_by(["w", "u"])
            .aggregate([])
        )

    pairs = (
        events.select_columns([ts_col, user_col])
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["w", "u"])
        .count()
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"w": pa.array([], pa.int64()), "n_partial": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        g = (
            pa.table({"w": batch.column("w").cast(pa.int64())})
            .group_by("w")
            .aggregate([("w", "count")])
        )
        return pa.table(
            {
                "w": g.column("w"),
                "n_partial": g.column("w_count").cast(pa.int64()),
            }
        )

    agg = (
        pairs.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("w")
        .aggregate(Sum("n_partial"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start_s": batch.column("w").cast(pa.int64()),
                "n_users": batch.column("sum(n_partial)").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ---------- grouped heavy hitters ----------


def grouped_heavy_hitters_ds(
    docs: Dataset,
    k: int = 3,
    group_col: str = "lang",
    text_col: str = "text",
) -> Dataset:
    """Top-``k`` tokens per group by occurrence count (per-language
    stopword / censor lists): per-batch ``(group, token)`` count combiner
    -> ``groupby(group, token)`` sum -> PER-BLOCK top-k per group (the
    final exchange moves at most k rows per group per block) -> final
    top-k inside a bounded ``groupby(group)`` (the group domain —
    languages, sources — is small by construction; this is NOT the
    million-singleton-group shape). Deterministic n DESC / token ASC."""

    def count_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "g": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "n_partial": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        toks = pc.split_pattern(
            pc.fill_null(batch.column(text_col), ""), pattern=" "
        )
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if len(flat) == 0:
            return empty
        gs = batch.column(group_col).take(
            pa.array(np.repeat(np.arange(batch.num_rows, dtype=np.int64), n_tok))
        )
        t = (
            pa.table({"g": gs, "token": flat})
            .group_by(["g", "token"])
            .aggregate([("token", "count")])
        )
        return pa.table(
            {
                "g": t.column("g"),
                "token": t.column("token"),
                "n_partial": t.column("token_count").cast(pa.int64()),
            }
        )

    totals = (
        docs.select_columns([group_col, text_col])
        .map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["g", "token"])
        .aggregate(Sum("n_partial"))
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "g": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        gv = batch.column("g").to_numpy(zero_copy_only=False).astype(str)
        tv = batch.column("token").to_numpy(zero_copy_only=False).astype(str)
        n = batch.column("sum(n_partial)").to_numpy(zero_copy_only=False)
        gcodes = np.unique(gv, return_inverse=True)[1]
        tcodes = np.unique(tv, return_inverse=True)[1]
        order = np.lexsort((tcodes, -n, gcodes))
        gs = gcodes[order]
        seg_first = np.concatenate(([True], gs[1:] != gs[:-1]))
        pos = np.arange(len(gs)) - np.maximum.accumulate(
            np.where(seg_first, np.arange(len(gs)), 0)
        )
        keep = order[pos < k]
        return pa.table(
            {
                "g": batch.column("g").take(pa.array(keep)),
                "token": batch.column("token").take(pa.array(keep)),
                "n": pa.array(n[keep], pa.int64()),
            }
        )

    local = totals.map_batches(
        block_topk, batch_format="pyarrow", zero_copy_batch=True
    )

    def final_topk(group: pa.Table) -> pa.Table:
        tv = group.column("token").to_numpy(zero_copy_only=False).astype(str)
        n = group.column("n").to_numpy(zero_copy_only=False)
        tcodes = np.unique(tv, return_inverse=True)[1]
        order = np.lexsort((tcodes, -n))[:k]
        return pa.table(
            {
                group_col: group.column("g").take(pa.array(order)),
                "token": group.column("token").take(pa.array(order)),
                "n": pa.array(n[order], pa.int64()),
                "rank_in_group": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64)
                ),
            }
        )

    return local.groupby("g").map_groups(final_topk, batch_format="pyarrow")


# ---------- integer-exact group-mean outliers ----------


def length_outliers_ds(
    docs: Dataset,
    group_col: str = "lang",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    factor: int = 3,
) -> Dataset:
    """Flag rows whose value exceeds ``factor`` times their group mean —
    the pure-integer outlier rule (``v * g_n > factor * g_sum``), so the
    flag is bit-comparable to SQL window sums with no float mean. The
    per-group (count, sum) table reduces via a per-batch combiner, stays
    tiny (bounded group domain), and broadcasts via ``ray.put``; each
    batch then flags with one searchsorted probe. Emits
    ``(id, group, value, g_n, g_sum, is_outlier)``."""

    def stat_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "g": pa.array([], pa.string()),
                "n_partial": pa.array([], pa.int64()),
                "sum_partial": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        t = pa.table(
            {
                "g": batch.column(group_col).cast(pa.string()),
                "v": batch.column(value_col).cast(pa.int64()),
            }
        )
        g = t.group_by("g").aggregate([("v", "count"), ("v", "sum")])
        return pa.table(
            {
                "g": g.column("g"),
                "n_partial": g.column("v_count").cast(pa.int64()),
                "sum_partial": g.column("v_sum").cast(pa.int64()),
            }
        )

    stats = (
        docs.select_columns([group_col, value_col])
        .map_batches(stat_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(Sum("n_partial"), Sum("sum_partial"))
        .take_all()
    )
    gnames = np.asarray(sorted(r["g"] for r in stats), dtype=object).astype(str)
    by_g = {r["g"]: r for r in stats}
    g_n = np.asarray([int(by_g[g]["sum(n_partial)"]) for g in gnames], np.int64)
    g_sum = np.asarray(
        [int(by_g[g]["sum(sum_partial)"]) for g in gnames], np.int64
    )
    stats_ref = ray.put((gnames, g_n, g_sum))

    def flag(batch: pa.Table) -> pa.Table:
        gtype = batch.column(group_col).type
        empty = pa.table(
            {
                id_col: pa.array([], batch.column(id_col).type),
                group_col: pa.array([], gtype),
                value_col: pa.array([], pa.int64()),
                "g_n": pa.array([], pa.int64()),
                "g_sum": pa.array([], pa.int64()),
                "is_outlier": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        names_s, n_s, sum_s = ray.get(stats_ref)
        gv = batch.column(group_col).cast(pa.string()).to_numpy(
            zero_copy_only=False
        ).astype(str)
        v = batch.column(value_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        gi = np.searchsorted(names_s, gv)
        gn, gs = n_s[gi], sum_s[gi]
        flag_arr = (v * gn > factor * gs).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                group_col: batch.column(group_col),
                value_col: pa.array(v, pa.int64()),
                "g_n": pa.array(gn, pa.int64()),
                "g_sum": pa.array(gs, pa.int64()),
                "is_outlier": pa.array(flag_arr, pa.int64()),
            }
        )

    return docs.select_columns([id_col, group_col, value_col]).map_batches(
        flag, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------- distributed running total (per-key prefix sum) ----------


def running_total_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    value_col: str = "value",
    quant: int = 100,
    n_buckets: int = 512,
) -> Dataset:
    """Per-key cumulative sum ordered by (``ts``, ``tie``) — the
    ``SUM(v) OVER (PARTITION BY key ORDER BY ts, id)`` running-balance /
    cumulative-exposure shape, computed without a global sort.

    Exactness: values quantize to ``floor(v * quant)`` int64 on BOTH
    engines (identical IEEE double product + floor), so the prefix sums
    are order-independent integer sums.

    Scale shape: each row must meet the other rows of its key, so the
    full (key, ts, tie, v_e) projection shuffles ONCE by
    ``mix64(key) % n_buckets`` (bounded group count, never one group per
    key); inside a bucket one lexsort + one segmented ``np.cumsum``
    produces every key's prefix sums vectorized. Payload columns are
    pruned before the exchange.
    """

    def project(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        v_e = np.floor(v * quant).astype(np.int64)
        bkt = (_mix64(k) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                tie_col: batch.column(tie_col).cast(pa.int64()),
                key_col: pa.array(k, pa.int64()),
                "ts_us": batch.column(ts_col).cast(pa.int64()),
                "v_e": pa.array(v_e, pa.int64()),
                "bkt": pa.array(bkt, pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            pa.field(tie_col, pa.int64()),
            pa.field(key_col, pa.int64()),
            pa.field("run_total_e", pa.int64()),
        ]
    )

    def bucket_cumsum(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        t = group.column("ts_us").to_numpy(zero_copy_only=False)
        tie = group.column(tie_col).to_numpy(zero_copy_only=False)
        v = group.column("v_e").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, t, k))
        ks, vs = k[order], v[order]
        cs = np.cumsum(vs)
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        seg_len = np.diff(np.concatenate((starts, [len(ks)])))
        # cumulative total just before each segment start, repeated
        offsets = np.concatenate(([0], cs[starts[1:] - 1]))
        run = cs - np.repeat(offsets, seg_len)
        return pa.table(
            {
                tie_col: pa.array(tie[order], pa.int64()),
                key_col: pa.array(ks, pa.int64()),
                "run_total_e": pa.array(run, pa.int64()),
            }
        )

    projected = events.select_columns(
        [key_col, ts_col, tie_col, value_col]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return _anchor_schema(
        projected.groupby("bkt").map_groups(bucket_cumsum, batch_format="pyarrow"),
        out_schema,
    )


# ---------- ROLLUP (multi-level grouped aggregate) ----------


def rollup_ds(
    ds: Dataset,
    keys: Sequence[str],
    value_col: str,
    quant: int = 100,
    all_label: str = "ALL",
    mode: str = "rollup",
) -> Dataset:
    """``GROUP BY ROLLUP(k1, k2, ...)`` (or ``CUBE`` with
    ``mode="cube"``) — the leaf aggregate plus every derived grouping
    set, with rolled-up key columns set to ``all_label``. ROLLUP derives
    the prefix levels; CUBE derives all 2^n subsets. Values quantize to
    ``floor(v * quant)`` int64 so sums are engine-exact.

    Scale shape: one per-batch Arrow combiner (leaf cells per block) ->
    ONE ``groupby(keys)`` over combined rows. The leaf table of a rollup
    report is bounded by the key-domain product (small by construction —
    a rollup over an unbounded key is not a report), so every other
    grouping set derives from the collected leaf on the driver with
    numpy group sums — the raw table is never re-read per set.
    """
    keys = list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        v_e = np.floor(v * quant).astype(np.int64)
        t = pa.table(
            {
                **{k: batch.column(k) for k in keys},
                "v_e": pa.array(v_e, pa.int64()),
            }
        )
        g = t.group_by(keys).aggregate([("v_e", "sum"), ("v_e", "count")])
        return g.rename_columns(keys + ["sum_partial", "n_partial"])

    leaf = (
        ds.select_columns(keys + [value_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(keys)
        .aggregate(Sum("sum_partial"), Sum("n_partial"))
    )
    rows = leaf.take_all()
    # dtype=str keeps the zero-row case a unicode array (a bare
    # np.array([]) is float64 and np.char.add refuses to concatenate it)
    key_vals = {
        k: np.array([str(r[k]) for r in rows], dtype=str) for k in keys
    }
    sums = np.array([r["sum(sum_partial)"] for r in rows], np.int64)
    ns = np.array([r["sum(n_partial)"] for r in rows], np.int64)

    if mode == "cube":
        sets = [
            tuple(i for i in range(len(keys)) if (m >> i) & 1)
            for m in range(2 ** len(keys) - 1, -1, -1)
        ]
    else:
        sets = [tuple(range(level)) for level in range(len(keys), -1, -1)]

    out = {k: [] for k in keys}
    out_sum: List[int] = []
    out_n: List[int] = []
    for kept_idx in sets:
        kept = [keys[i] for i in kept_idx]
        if kept:
            comp = key_vals[kept[0]]
            for k in kept[1:]:
                comp = np.char.add(np.char.add(comp, "\x1f"), key_vals[k])
            uniq, inv = np.unique(comp, return_inverse=True)
            if len(uniq) == 0:  # empty input: this grouping set has no rows
                continue
            order = np.argsort(inv, kind="stable")
            starts = np.flatnonzero(
                np.concatenate(([True], inv[order][1:] != inv[order][:-1]))
            )
            # int64 reduceat keeps sums exact past 2**53 (bincount's
            # float64 weights would not)
            lvl_sum = np.add.reduceat(sums[order], starts)
            lvl_n = np.add.reduceat(ns[order], starts)
            parts = [u.split("\x1f") for u in uniq]
            pos_of = {i: j for j, i in enumerate(kept_idx)}
            for i, k in enumerate(keys):
                if i in pos_of:
                    out[k].extend(p[pos_of[i]] for p in parts)
                else:
                    out[k].extend([all_label] * len(uniq))
            out_sum.extend(lvl_sum.tolist())
            out_n.extend(lvl_n.tolist())
        else:
            for k in keys:
                out[k].append(all_label)
            out_sum.append(int(sums.sum()))
            out_n.append(int(ns.sum()))
    return ray.data.from_arrow(
        pa.table(
            {
                **{k: pa.array(out[k], pa.string()) for k in keys},
                "sum_e": pa.array(out_sum, pa.int64()),
                "n_rows": pa.array(out_n, pa.int64()),
            }
        )
    )


# ---------- interval (range) join: count points per window ----------


def interval_count_ds(
    windows: Dataset,
    points: Dataset,
    window_key: str,
    window_start: str,
    point_ts: str,
    width_us: int,
) -> Dataset:
    """Range join ``point.ts ∈ [w.start, w.start + width)`` aggregated to
    a per-window match count (INNER semantics: windows with zero matches
    drop). The classic non-equi join Ray Data lacks natively.

    Scale shape: NO row-expanding join ever materializes. The point side
    reduces per batch to (time_bucket, ts, count) partials (bucket width
    == window width, so each window overlaps at most 2 buckets); each
    window row replicates to exactly those <=2 buckets. One co-grouping
    shuffle by time bucket, then inside the bucket a sorted-ts prefix-sum
    + two ``np.searchsorted`` probes count matches for every window
    vectorized. A final ``groupby(window_key)`` sums the <=2 partials
    per window.
    """
    w = np.int64(width_us)

    def point_partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(point_ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(ts, return_counts=True)
        return pa.table(
            {
                "bkt": pa.array(uniq // w, pa.int64()),
                "side": pa.array(np.zeros(len(uniq), np.int8), pa.int8()),
                "ts_us": pa.array(uniq, pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
                "wkey": pa.array(np.zeros(len(uniq), np.int64), pa.int64()),
                "lo": pa.array(np.zeros(len(uniq), np.int64), pa.int64()),
            }
        )

    def window_partial(batch: pa.Table) -> pa.Table:
        lo = (
            batch.column(window_start).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        key = batch.column(window_key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        hi = lo + w
        b0 = lo // w
        b1 = (hi - 1) // w
        second = b1 != b0
        bkt = np.concatenate((b0, b1[second]))
        keys = np.concatenate((key, key[second]))
        los = np.concatenate((lo, lo[second]))
        n = len(bkt)
        return pa.table(
            {
                "bkt": pa.array(bkt, pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "ts_us": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cnt": pa.array(np.zeros(n, np.int64), pa.int64()),
                "wkey": pa.array(keys, pa.int64()),
                "lo": pa.array(los, pa.int64()),
            }
        )

    tagged = points.select_columns([point_ts]).map_batches(
        point_partial, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        windows.select_columns([window_key, window_start]).map_batches(
            window_partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def bucket_count(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "wkey": pa.array([], pa.int64()),
                "n_partial": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        side = group.column("side").to_numpy(zero_copy_only=False)
        pts = side == 0
        wins = side == 1
        if not pts.any() or not wins.any():
            return empty
        ts = group.column("ts_us").to_numpy(zero_copy_only=False)[pts]
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)[pts]
        order = np.argsort(ts, kind="stable")
        ts_s, cnt_s = ts[order], cnt[order]
        # cross-block duplicate ts collapse
        uniq_mask = np.concatenate(([True], ts_s[1:] != ts_s[:-1]))
        seg = np.cumsum(uniq_mask) - 1
        ts_u = ts_s[uniq_mask]
        cnt_u = np.bincount(seg, weights=cnt_s).astype(np.int64)
        cum = np.concatenate(([0], np.cumsum(cnt_u)))
        lo = group.column("lo").to_numpy(zero_copy_only=False)[wins]
        key = group.column("wkey").to_numpy(zero_copy_only=False)[wins]
        i0 = np.searchsorted(ts_u, lo, side="left")
        i1 = np.searchsorted(ts_u, lo + w, side="left")
        n = cum[i1] - cum[i0]
        nz = n > 0
        return pa.table(
            {
                "wkey": pa.array(key[nz], pa.int64()),
                "n_partial": pa.array(n[nz], pa.int64()),
            }
        )

    partials = tagged.groupby("bkt").map_groups(
        bucket_count, batch_format="pyarrow"
    )
    totals = partials.groupby("wkey").aggregate(Sum("n_partial"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                window_key: batch.column("wkey"),
                "n_matched": batch.column("sum(n_partial)").cast(pa.int64()),
            }
        )

    return _anchor_schema(
        totals.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema(
            [pa.field(window_key, pa.int64()), pa.field("n_matched", pa.int64())]
        ),
    )


# ---------- generic shuffle hash join (inner, N:M) ----------


def hash_join_ds(
    left: Dataset,
    right: Dataset,
    left_key: str,
    right_key: str,
    n_buckets: int = 512,
    how: str = "inner",
) -> Dataset:
    """Generic equi-join of two LARGE datasets (N:M multiplicity) — the
    core relational exchange Ray Data's high-level API does not ship.
    ``how="inner"`` (default), ``"left"`` (unmatched left rows emit
    once with null right payload — the LEFT OUTER JOIN contract), or
    ``"full"`` (additionally, unmatched RIGHT rows emit once with null
    left payload and their own key — FULL OUTER JOIN).
    Output carries the left key column plus every payload column
    of both sides (column names must not collide — pre-project/rename
    upstream, which also prunes the exchange to needed columns).

    Scale shape: a textbook distributed hash join — both sides shuffle
    ONCE by ``mix64(key) % n_buckets`` (bounded group count) as a tagged
    union; inside each bucket the right side sorts by key and every
    left row expands to its matches via two ``np.searchsorted`` probes +
    one vectorized range expansion (``np.repeat`` / offset arithmetic).
    No broadcast of either side, no per-row Python. Skew note: one hot
    key lands one bucket; cap or salt upstream for pathological N:M
    fan-out (the output itself is |matches|-sized regardless of
    strategy)."""
    if (
        left.schema(fetch_if_missing=True) is None
        or right.schema(fetch_if_missing=True) is None
    ):
        # a side is empty with no derivable schema (zero blocks after its
        # upstream transforms) — the join output is necessarily empty,
        # and its payload columns are unknowable; return a typed-empty
        # sentinel the query boundary can still count/collect.
        return ray.data.from_arrow(pa.table({}))
    lpay = [c for c in left.schema().names if c != left_key]
    rpay = [c for c in right.schema().names if c != right_key]
    overlap = set(lpay) & set(rpay)
    if overlap:
        raise ValueError(f"payload column collision: {sorted(overlap)}")
    l_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(left.schema().names, left.schema().types)]
    )
    r_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(right.schema().names, right.schema().types)]
    )

    def tag(key: str, side: int):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch.column(key).cast(pa.int64())
            kn = keys.to_numpy(zero_copy_only=False)
            bkt = (_mix64(kn) % np.uint64(n_buckets)).astype(np.int64)
            t = pa.table(
                {
                    "k": keys,
                    "side": pa.array(np.full(batch.num_rows, side, np.int8)),
                }
            )
            for c in lpay:
                col = (
                    batch.column(c)
                    if side == 0
                    else pa.nulls(batch.num_rows, l_schema.field(c).type)
                )
                t = t.append_column(c, col)
            for c in rpay:
                col = (
                    batch.column(c)
                    if side == 1
                    else pa.nulls(batch.num_rows, r_schema.field(c).type)
                )
                t = t.append_column(c, col)
            return t.append_column("bkt", pa.array(bkt))

        return fn

    both = left.map_batches(
        tag(left_key, 0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(
            tag(right_key, 1), batch_format="pyarrow", zero_copy_batch=True
        )
    )

    out_schema = pa.schema(
        [pa.field(left_key, pa.int64())]
        + [l_schema.field(c) for c in lpay]
        + [r_schema.field(c) for c in rpay]
    )

    def bucket_join(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})

        def left_only(lt: pa.Table) -> pa.Table:
            cols = {left_key: lt.column("k")}
            for c in lpay:
                cols[c] = lt.column(c)
            for c in rpay:
                cols[c] = pa.nulls(lt.num_rows, r_schema.field(c).type)
            return pa.table(cols)

        def right_only(rt: pa.Table) -> pa.Table:
            cols = {left_key: rt.column("k")}
            for c in lpay:
                cols[c] = pa.nulls(rt.num_rows, l_schema.field(c).type)
            for c in rpay:
                cols[c] = rt.column(c)
            return pa.table(cols)

        side = group.column("side").to_numpy(zero_copy_only=False)
        lmask = side == 0
        rmask = side == 1
        if not lmask.any():
            if how == "full" and rmask.any():
                return right_only(group.filter(pa.array(rmask)))
            return empty
        if not rmask.any():
            if how == "inner":
                return empty
            return left_only(group.filter(pa.array(lmask)))
        k = group.column("k").to_numpy(zero_copy_only=False)
        l_idx = np.flatnonzero(lmask)
        r_idx = np.flatnonzero(rmask)
        rk = k[r_idx]
        order = np.argsort(rk, kind="stable")
        rk_s = rk[order]
        r_sorted = r_idx[order]
        lk = k[l_idx]
        lo = np.searchsorted(rk_s, lk, side="left")
        hi = np.searchsorted(rk_s, lk, side="right")
        counts = hi - lo
        total = int(counts.sum())
        parts = []
        if how in ("left", "full"):
            miss = np.flatnonzero(counts == 0)
            if miss.size:
                parts.append(
                    left_only(group.take(pa.array(l_idx[miss], pa.int64())))
                )
        if how == "full":
            r_unmatched = ~np.isin(rk_s, lk)
            if r_unmatched.any():
                parts.append(
                    right_only(
                        group.take(pa.array(r_sorted[r_unmatched], pa.int64()))
                    )
                )
        if total > 0:
            out_l = np.repeat(l_idx, counts)
            offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
            pos = (
                np.arange(total, dtype=np.int64)
                - np.repeat(offsets, counts)
                + np.repeat(lo, counts)
            )
            out_r = r_sorted[pos]
            lt = group.take(pa.array(out_l, pa.int64()))
            rt = group.take(pa.array(out_r, pa.int64()))
            cols = {left_key: lt.column("k")}
            for c in lpay:
                cols[c] = lt.column(c)
            for c in rpay:
                cols[c] = rt.column(c)
            parts.append(pa.table(cols))
        if not parts:
            return empty
        return pa.concat_tables(parts).combine_chunks()

    return _anchor_schema(
        both.groupby("bkt").map_groups(bucket_join, batch_format="pyarrow"),
        out_schema,
    )


# ---------- window frames: trailing ROWS sum + LAG delta ----------


def window_frames_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    value_col: str = "value",
    trail_rows: int = 3,
    quant: int = 100,
    n_buckets: int = 512,
) -> Dataset:
    """Per-key window frames in ONE pass over one bucket shuffle: the
    cumulative sum (``ROWS UNBOUNDED PRECEDING``), the trailing
    ``trail_rows``-row sum (``ROWS trail_rows-1 PRECEDING``), and the
    inter-event gap ``ts - lag(ts)`` (``-1`` for each key's first event
    so both engines emit clean int64). Same exactness and scale shape as
    :func:`running_total_ds` — floor-quantized int64 values, one
    ``mix64(key) % n_buckets`` shuffle of the pruned projection, one
    lexsort + prefix-sum arithmetic per bucket (the trailing frame is
    ``cs[i] - cs[max(i - trail_rows, seg_start - 1)]`` — no second
    pass)."""

    def project(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        v_e = np.floor(v * quant).astype(np.int64)
        bkt = (_mix64(k) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                tie_col: batch.column(tie_col).cast(pa.int64()),
                key_col: pa.array(k, pa.int64()),
                "ts_us": batch.column(ts_col).cast(pa.int64()),
                "v_e": pa.array(v_e, pa.int64()),
                "bkt": pa.array(bkt, pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            pa.field(tie_col, pa.int64()),
            pa.field(key_col, pa.int64()),
            pa.field("run_total_e", pa.int64()),
            pa.field("trail_e", pa.int64()),
            pa.field("delta_us", pa.int64()),
        ]
    )

    def bucket_frames(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        t = group.column("ts_us").to_numpy(zero_copy_only=False)
        tie = group.column(tie_col).to_numpy(zero_copy_only=False)
        v = group.column("v_e").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, t, k))
        ks, ts_, vs = k[order], t[order], v[order]
        n = len(ks)
        cs = np.cumsum(vs)
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        seg_len = np.diff(np.concatenate((starts, [n])))
        offsets = np.concatenate(([0], cs[starts[1:] - 1]))
        run = cs - np.repeat(offsets, seg_len)
        pos = np.arange(n, dtype=np.int64)
        start_pos = np.repeat(starts, seg_len)
        lo = np.maximum(pos - trail_rows, start_pos - 1)
        trail = cs - np.where(lo >= 0, cs[np.maximum(lo, 0)], 0)
        delta = np.empty(n, np.int64)
        delta[0] = -1
        delta[1:] = ts_[1:] - ts_[:-1]
        delta[starts] = -1
        return pa.table(
            {
                tie_col: pa.array(tie[order], pa.int64()),
                key_col: pa.array(ks, pa.int64()),
                "run_total_e": pa.array(run, pa.int64()),
                "trail_e": pa.array(trail, pa.int64()),
                "delta_us": pa.array(delta, pa.int64()),
            }
        )

    projected = events.select_columns(
        [key_col, ts_col, tie_col, value_col]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return _anchor_schema(
        projected.groupby("bkt").map_groups(bucket_frames, batch_format="pyarrow"),
        out_schema,
    )


# ---------- NTILE (equal-frequency bucket assignment) ----------


def ntile_ds(
    ds: Dataset,
    value_col: str,
    id_col: str,
    k: int = 4,
    n_buckets: int = 512,
    max_domain_broadcast: int = 5_000_000,
) -> Dataset:
    """``NTILE(k) OVER (ORDER BY v, id)`` — equal-frequency bucket
    assignment (deciles/quartiles for curriculum binning) WITHOUT a
    global sort, deterministic via the unique ``id`` tie-break.

    Every row's global row number decomposes as ``rn = cum_below(v) +
    rank_within_ties(v, id)``: the first term comes from a broadcast
    value-count CDF (one row per DISTINCT value shuffles — bounded
    domain, guarded), the second from ONE ``mix64(value) % n_buckets``
    shuffle of (id, v) pairs — all rows sharing a value land in one
    bucket, where a single lexsort ranks them. NTILE sizing follows the
    SQL rule: the first ``N % k`` tiles carry ``N // k + 1`` rows."""

    def vc_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).cast(pa.int64())
        g = pa.table({"v": v}).group_by("v").aggregate([("v", "count")])
        return pa.table(
            {"v": g.column("v"), "n_partial": g.column("v_count").cast(pa.int64())}
        )

    hist = (
        ds.select_columns([value_col])
        .map_batches(vc_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .aggregate(Sum("n_partial"))
        .materialize()
    )
    if hist.count() > max_domain_broadcast:
        raise ValueError(
            f"value domain ({hist.count()}) exceeds "
            f"max_domain_broadcast={max_domain_broadcast}"
        )
    rows = hist.take_all()
    vals = np.array([r["v"] for r in rows], np.int64)
    cnts = np.array([r["sum(n_partial)"] for r in rows], np.int64)
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    cum_below = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    total = int(cnts.sum())
    ref = ray.put((vals, cum_below))
    q, r0 = divmod(total, k)
    cut = r0 * (q + 1)

    def project(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        bkt = (_mix64(v) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                "v": pa.array(v, pa.int64()),
                "bkt": pa.array(bkt, pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field(value_col, pa.int64()),
            pa.field("tile", pa.int64()),
        ]
    )

    def bucket_tiles(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        vals_s, below_s = ray.get(ref)
        i = group.column(id_col).to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        order2 = np.lexsort((i, v))
        vs, is_ = v[order2], i[order2]
        starts = np.flatnonzero(np.concatenate(([True], vs[1:] != vs[:-1])))
        seg_len = np.diff(np.concatenate((starts, [len(vs)])))
        # rank within the tie run (1-based)
        within = np.arange(len(vs), dtype=np.int64) - np.repeat(starts, seg_len) + 1
        rn = below_s[np.searchsorted(vals_s, vs)] + within
        if q > 0:
            tile = np.where(
                rn <= cut,
                (rn - 1) // (q + 1) + 1,
                r0 + (rn - 1 - cut) // q + 1,
            )
        else:
            tile = rn
        return pa.table(
            {
                id_col: pa.array(is_, pa.int64()),
                value_col: pa.array(vs, pa.int64()),
                "tile": pa.array(tile.astype(np.int64), pa.int64()),
            }
        )

    projected = ds.select_columns([id_col, value_col]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    return _anchor_schema(
        projected.groupby("bkt").map_groups(bucket_tiles, batch_format="pyarrow"),
        out_schema,
    )


# ---------- grouped moment accumulators (covariance statistics) ----------


def moments_ds(
    ds: Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    x_quant: int = 100,
    y_quant: int = 1,
) -> Dataset:
    """Per-group second-moment sufficient statistics — ``n, Σx, Σy,
    Σx², Σy², Σxy`` over floor-quantized int64 values — everything a
    consumer needs for exact means, variances, covariance and Pearson
    correlation per group, kept as INTEGER accumulators so both engines
    agree bit-for-bit (no float division inside the operator).

    Quantization bound (document per column): ``Σx²`` must stay below
    2^63 — pick ``quant`` per column so ``n * max(|x|*quant)^2 < 9e18``.

    Scale shape: one per-batch segment-sum combiner (argsort + int64
    ``reduceat`` per statistic) emits one row per group per block ->
    one bounded ``groupby(group)`` of six sums. Nothing else moves."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "g": pa.array([], pa.string()),
                "n_p": pa.array([], pa.int64()),
                "sx_p": pa.array([], pa.int64()),
                "sy_p": pa.array([], pa.int64()),
                "sxx_p": pa.array([], pa.int64()),
                "syy_p": pa.array([], pa.int64()),
                "sxy_p": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        g = (
            batch.column(group_col)
            .cast(pa.string())
            .to_numpy(zero_copy_only=False)
            .astype(str)
        )
        x = np.floor(
            batch.column(x_col).to_numpy(zero_copy_only=False) * x_quant
        ).astype(np.int64)
        y = np.floor(
            batch.column(y_col).to_numpy(zero_copy_only=False) * y_quant
        ).astype(np.int64)
        order = np.argsort(g, kind="stable")
        gs, xs, ys = g[order], x[order], y[order]
        starts = np.flatnonzero(np.concatenate(([True], gs[1:] != gs[:-1])))
        seg_len = np.diff(np.concatenate((starts, [len(gs)])))
        return pa.table(
            {
                "g": pa.array(gs[starts], pa.string()),
                "n_p": pa.array(seg_len.astype(np.int64), pa.int64()),
                "sx_p": pa.array(np.add.reduceat(xs, starts), pa.int64()),
                "sy_p": pa.array(np.add.reduceat(ys, starts), pa.int64()),
                "sxx_p": pa.array(np.add.reduceat(xs * xs, starts), pa.int64()),
                "syy_p": pa.array(np.add.reduceat(ys * ys, starts), pa.int64()),
                "sxy_p": pa.array(np.add.reduceat(xs * ys, starts), pa.int64()),
            }
        )

    agg = (
        ds.select_columns([group_col, x_col, y_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(
            Sum("n_p"), Sum("sx_p"), Sum("sy_p"),
            Sum("sxx_p"), Sum("syy_p"), Sum("sxy_p"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                group_col: batch.column("g"),
                "n": batch.column("sum(n_p)").cast(pa.int64()),
                "sum_x": batch.column("sum(sx_p)").cast(pa.int64()),
                "sum_y": batch.column("sum(sy_p)").cast(pa.int64()),
                "sum_xx": batch.column("sum(sxx_p)").cast(pa.int64()),
                "sum_yy": batch.column("sum(syy_p)").cast(pa.int64()),
                "sum_xy": batch.column("sum(sxy_p)").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ---------- event-transition matrix (first-order Markov counts) ----------


def transitions_ds(
    events: Dataset,
    key_col: str = "user_id",
    order_cols: Tuple[str, str] = ("ts", "event_id"),
    type_col: str = "event_type",
    n_buckets: int = 256,
) -> Dataset:
    """First-order Markov transition counts: for every per-key event
    sequence ordered by ``order_cols``, count each consecutive
    ``(event_type -> next event_type)`` pair — the session-flow /
    curriculum-ordering signal (``lead() OVER (PARTITION BY key)`` in
    SQL).

    Scale shape: rows shuffle ONCE by ``mix64(key) % n_buckets`` (a
    bounded group count — never ``groupby(user)`` with millions of
    near-singleton groups); inside a bucket one lexsort orders every
    key's events, a shifted-array compare finds consecutive pairs, and
    ``np.unique`` over composite type codes emits one partial count row
    per (prev, next) pair per bucket. The only other exchange is the
    tiny ``groupby(prev, next)`` over those partials (pair domain =
    |type alphabet|²)."""

    def tag(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bkt": pa.array([], pa.int64()),
                "k": pa.array([], pa.int64()),
                "o1": pa.array([], pa.int64()),
                "o2": pa.array([], pa.int64()),
                "t": pa.array([], pa.string()),
            }
        )
        if batch.num_rows == 0:
            return empty
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        o1 = (
            batch.column(order_cols[0])
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        o2 = (
            batch.column(order_cols[1])
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        bkt = (_mix64(k) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(bkt, pa.int64()),
                "k": pa.array(k, pa.int64()),
                "o1": pa.array(o1, pa.int64()),
                "o2": pa.array(o2, pa.int64()),
                "t": batch.column(type_col).cast(pa.string()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "prev_type": pa.array([], pa.string()),
                "next_type": pa.array([], pa.string()),
                "n_partial": pa.array([], pa.int64()),
            }
        )
        if group.num_rows < 2:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        o1 = group.column("o1").to_numpy(zero_copy_only=False)
        o2 = group.column("o2").to_numpy(zero_copy_only=False)
        types, codes = np.unique(
            group.column("t").to_numpy(zero_copy_only=False).astype(str),
            return_inverse=True,
        )
        order = np.lexsort((o2, o1, k))
        ks, cs = k[order], codes[order]
        same = ks[1:] == ks[:-1]
        if not same.any():
            return empty
        prev_c = cs[:-1][same]
        next_c = cs[1:][same]
        comp = prev_c.astype(np.int64) * np.int64(len(types)) + next_c
        uniq, cnt = np.unique(comp, return_counts=True)
        return pa.table(
            {
                "prev_type": pa.array(
                    types[(uniq // len(types)).astype(np.int64)], pa.string()
                ),
                "next_type": pa.array(
                    types[(uniq % len(types)).astype(np.int64)], pa.string()
                ),
                "n_partial": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    partials = (
        events.select_columns(
            [key_col, order_cols[0], order_cols[1], type_col]
        )
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    partials = _anchor_schema(
        partials,
        pa.schema(
            [
                ("prev_type", pa.string()),
                ("next_type", pa.string()),
                ("n_partial", pa.int64()),
            ]
        ),
    )
    agg = partials.groupby(["prev_type", "next_type"]).aggregate(Sum("n_partial"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "prev_type": batch.column("prev_type"),
                "next_type": batch.column("next_type"),
                "n_transitions": batch.column("sum(n_partial)").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ---------- pivot / crosstab (in-batch pivot combiner) ----------


def pivot_ds(
    ds: Dataset,
    group_col: str,
    cat_col: str,
    value_col: str,
    categories: Sequence[Tuple[str, str]],
    quant: int = 100,
) -> Dataset:
    """Crosstab: one output row per ``group_col`` value with a count and
    a floor-quantized int64 value sum PER CATEGORY as columns
    (``count(*) FILTER (WHERE cat = ...)`` in SQL). ``categories`` maps
    each expected category value to its column suffix; rows with an
    unlisted category are ignored (mirror the SQL FILTER semantics).

    Scale shape: the pivot happens INSIDE the per-batch combiner — one
    ``reduceat`` pass emits one already-wide row per group per block, so
    the only shuffle is a bounded ``groupby(group)`` of ``2 * n_cat``
    integer sums. A long-format groupby((group, cat)) would move the
    same information as n_cat times more rows and still need a second
    pivot pass."""

    cat_values = [c for c, _ in categories]
    suffixes = [s for _, s in categories]
    n_cat = len(cat_values)
    partial_names = [f"n_{s}" for s in suffixes] + [f"q_{s}" for s in suffixes]

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "g": pa.array([], pa.int64()),
                **{nm: pa.array([], pa.int64()) for nm in partial_names},
            }
        )
        if batch.num_rows == 0:
            return empty
        g = batch.column(group_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        code_arr = pc.index_in(
            batch.column(cat_col), value_set=pa.array(cat_values, pa.string())
        )
        known = pc.is_valid(code_arr).to_numpy(zero_copy_only=False)
        if not known.any():
            return empty
        code = code_arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.floor(
            batch.column(value_col).to_numpy(zero_copy_only=False) * quant
        ).astype(np.int64)
        g, code, v = g[known], code[known], v[known]
        gvals, ginv = np.unique(g, return_inverse=True)
        comp = ginv * n_cat + code
        order = np.argsort(comp, kind="stable")
        comp_s, v_s = comp[order], v[order]
        starts = np.flatnonzero(
            np.concatenate(([True], comp_s[1:] != comp_s[:-1]))
        )
        seg_len = np.diff(np.concatenate((starts, [len(comp_s)])))
        cells = comp_s[starts]
        counts = np.zeros((len(gvals), n_cat), dtype=np.int64)
        sums = np.zeros((len(gvals), n_cat), dtype=np.int64)
        counts[cells // n_cat, cells % n_cat] = seg_len
        sums[cells // n_cat, cells % n_cat] = np.add.reduceat(v_s, starts)
        cols = {"g": pa.array(gvals, pa.int64())}
        for j, s in enumerate(suffixes):
            cols[f"n_{s}"] = pa.array(counts[:, j], pa.int64())
        for j, s in enumerate(suffixes):
            cols[f"q_{s}"] = pa.array(sums[:, j], pa.int64())
        return pa.table(cols)

    agg = (
        ds.select_columns([group_col, cat_col, value_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(*[Sum(nm) for nm in partial_names])
    )

    def finish(batch: pa.Table) -> pa.Table:
        cols = {group_col: batch.column("g").cast(pa.int64())}
        for nm in partial_names:
            cols[nm] = batch.column(f"sum({nm})").cast(pa.int64())
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ---------- per-column data profiling ----------


def profile_ds(
    ds: Dataset,
    columns: Sequence[Tuple[str, int]],
) -> Dataset:
    """Schema-profiling audit: one row per column with ``n_rows,
    n_nulls, n_distinct, min_q, max_q`` over floor-quantized int64
    values (``columns`` maps column name -> quantizer). The standard
    pre-ingestion data-quality report; EXACT distinct counts (the
    sketch shortcut deliberately isn't taken — the oracle is
    count(DISTINCT)).

    Scale shape: two column-pruned passes. Pass 1 computes counts /
    nulls / min / max with one partial row per column per block (a
    bounded groupby of n_columns groups). Pass 2 computes exact
    distincts the only scale-honest way: per-batch ``np.unique``
    DEDUPES WITHIN THE BLOCK before the shuffle, so the
    ``groupby(col, value)`` exchange moves one row per distinct value
    per block (not per input row); the distinct table then collapses to
    per-column counts with a second per-batch combiner. Result is
    n_columns rows — joined driver-side (bounded by the schema width,
    never the data)."""

    col_names = [c for c, _ in columns]
    quants = {c: q for c, q in columns}

    def stats_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "column_name": pa.array([], pa.string()),
                "n_p": pa.array([], pa.int64()),
                "null_p": pa.array([], pa.int64()),
                "min_p": pa.array([], pa.int64()),
                "max_p": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in col_names:
            col = batch.column(c)
            v = np.floor(
                col.drop_null().to_numpy(zero_copy_only=False) * quants[c]
            ).astype(np.int64)
            if len(v) == 0:
                continue
            names.append(c)
            ns.append(len(col))
            nulls.append(col.null_count)
            mins.append(int(v.min()))
            maxs.append(int(v.max()))
        return pa.table(
            {
                "column_name": pa.array(names, pa.string()),
                "n_p": pa.array(ns, pa.int64()),
                "null_p": pa.array(nulls, pa.int64()),
                "min_p": pa.array(mins, pa.int64()),
                "max_p": pa.array(maxs, pa.int64()),
            }
        )

    stats = (
        ds.select_columns(col_names)
        .map_batches(stats_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("column_name")
        .aggregate(Sum("n_p"), Sum("null_p"), Min("min_p"), Max("max_p"))
    )

    def distinct_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "column_name": pa.array([], pa.string()),
                "v": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        names, vals = [], []
        for c in col_names:
            v = np.unique(
                np.floor(
                    batch.column(c).drop_null().to_numpy(zero_copy_only=False)
                    * quants[c]
                ).astype(np.int64)
            )
            names.append(np.full(len(v), c, dtype=object))
            vals.append(v)
        return pa.table(
            {
                "column_name": pa.array(
                    np.concatenate(names).astype(str), pa.string()
                ),
                "v": pa.array(np.concatenate(vals), pa.int64()),
            }
        )

    def count_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "column_name": pa.array([], pa.string()),
                    "d_p": pa.array([], pa.int64()),
                }
            )
        names, cnt = np.unique(
            batch.column("column_name").to_numpy(zero_copy_only=False).astype(str),
            return_counts=True,
        )
        return pa.table(
            {
                "column_name": pa.array(names, pa.string()),
                "d_p": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    distinct = (
        ds.select_columns(col_names)
        .map_batches(distinct_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["column_name", "v"])
        .aggregate(Sum("v"))  # aggregate value unused; one row per distinct pair
        .map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("column_name")
        .aggregate(Sum("d_p"))
    )

    # both sides are n_columns rows — a driver-side zip is bounded by
    # schema width, not data size
    srows = {r["column_name"]: r for r in stats.take_all()}
    drows = {r["column_name"]: r for r in distinct.take_all()}
    names = sorted(srows)
    return ray.data.from_arrow(
        pa.table(
            {
                "column_name": pa.array(names, pa.string()),
                "n_rows": pa.array(
                    [int(srows[c]["sum(n_p)"]) for c in names], pa.int64()
                ),
                "n_nulls": pa.array(
                    [int(srows[c]["sum(null_p)"]) for c in names], pa.int64()
                ),
                "n_distinct": pa.array(
                    [int(drows[c]["sum(d_p)"]) if c in drows else 0 for c in names],
                    pa.int64(),
                ),
                "min_q": pa.array(
                    [int(srows[c]["min(min_p)"]) for c in names], pa.int64()
                ),
                "max_q": pa.array(
                    [int(srows[c]["max(max_p)"]) for c in names], pa.int64()
                ),
            }
        )
    )


# ---------- set overlap (INTERSECT / EXCEPT classification) ----------


def set_overlap_ds(
    events: Dataset,
    key_col: str = "user_id",
    type_col: str = "event_type",
    type_a: str = "click",
    type_b: str = "purchase",
    label_both: str = "both",
    label_a: str = "a_only",
    label_b: str = "b_only",
) -> Dataset:
    """Classify every key by which of two event types it has: the
    INTERSECT / EXCEPT pair as one operator (audience-overlap /
    conversion segmentation). Keys with neither type are dropped.

    Scale shape: a per-batch combiner collapses each block to one
    ``(key, has_a, has_b)`` row per key seen, the ``groupby(key)``
    moves those flag rows only (two integer maxes, not the event rows),
    and the CASE labelling is a stateless vectorized map."""

    def flags_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], pa.int64()),
                "fa": pa.array([], pa.int64()),
                "fb": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = batch.column(type_col).to_numpy(zero_copy_only=False).astype(str)
        keys, inv = np.unique(k, return_inverse=True)
        fa = np.zeros(len(keys), dtype=np.int64)
        fb = np.zeros(len(keys), dtype=np.int64)
        np.maximum.at(fa, inv, (t == type_a).astype(np.int64))
        np.maximum.at(fb, inv, (t == type_b).astype(np.int64))
        return pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "fa": pa.array(fa, pa.int64()),
                "fb": pa.array(fb, pa.int64()),
            }
        )

    agg = (
        events.select_columns([key_col, type_col])
        .map_batches(flags_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Max("fa"), Max("fb"))
    )

    def classify(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "segment": pa.array([], pa.string()),
            }
        )
        if batch.num_rows == 0:
            return empty
        k = batch.column("k").cast(pa.int64()).to_numpy(zero_copy_only=False)
        fa = batch.column("max(fa)").to_numpy(zero_copy_only=False) > 0
        fb = batch.column("max(fb)").to_numpy(zero_copy_only=False) > 0
        seg = np.where(
            fa & fb, label_both, np.where(fa, label_a, label_b)
        ).astype(object)
        keep = fa | fb
        return pa.table(
            {
                key_col: pa.array(k[keep], pa.int64()),
                "segment": pa.array(seg[keep].astype(str), pa.string()),
            }
        )

    return agg.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)


# ---------- ordered group-concat (per-key path strings) ----------


def user_paths_ds(
    events: Dataset,
    key_col: str = "user_id",
    order_cols: Tuple[str, str] = ("ts", "event_id"),
    type_col: str = "event_type",
    sep: str = ">",
    n_buckets: int = 256,
) -> Dataset:
    """Ordered group-concat: one row per key with its event types joined
    in ``order_cols`` order (``string_agg(t, sep ORDER BY ...)``) — the
    session-path string behind funnel and journey analysis.

    Scale shape: ONE ``mix64(key) % n_buckets`` shuffle (bounded group
    count); inside a bucket one lexsort orders every key's events and
    the paths assemble with a single zero-copy
    ``ListArray.from_arrays`` + ``pc.binary_join`` — no per-key Python.
    Path length is bounded by the per-key event count; keys with
    pathological event counts should be capped upstream (sessionize)
    before a path-string operator, as in any engine."""

    def tag(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bkt": pa.array([], pa.int64()),
                "k": pa.array([], pa.int64()),
                "o1": pa.array([], pa.int64()),
                "o2": pa.array([], pa.int64()),
                "t": pa.array([], pa.string()),
            }
        )
        if batch.num_rows == 0:
            return empty
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(k) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(k, pa.int64()),
                "o1": batch.column(order_cols[0]).cast(pa.int64()),
                "o2": batch.column(order_cols[1]).cast(pa.int64()),
                "t": batch.column(type_col).cast(pa.string()),
            }
        )

    def bucket_paths(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "path": pa.array([], pa.string()),
            }
        )
        if group.num_rows == 0:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        o1 = group.column("o1").to_numpy(zero_copy_only=False)
        o2 = group.column("o2").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((o2, o1, k))
        ks, ts = k[order], t[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        offsets = np.concatenate((starts, [len(ks)])).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(ts, pa.string())
        )
        return pa.table(
            {
                key_col: pa.array(ks[starts], pa.int64()),
                "path": pc.binary_join(lists, sep),
            }
        )

    out = (
        events.select_columns([key_col, order_cols[0], order_cols[1], type_col])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(bucket_paths, batch_format="pyarrow")
    )
    return _anchor_schema(
        out, pa.schema([(key_col, pa.int64()), ("path", pa.string())])
    )


# ---------- 2-D Pareto skyline ----------


def _skyline_keep(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Keep mask of the 2-D Pareto frontier: a point survives iff no
    other point has x' >= x AND y' >= y with at least one strict
    (duplicates of a frontier point all survive). One descending
    lexsort, group maxima, exclusive prefix max — O(n log n)."""
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    gstart = np.concatenate(([True], xs[1:] != xs[:-1]))
    starts = np.flatnonzero(gstart)
    gmax = ys[starts]  # y sorts descending within an x group
    pre = np.concatenate(([np.iinfo(np.int64).min], np.maximum.accumulate(gmax)[:-1]))
    gidx = np.cumsum(gstart) - 1
    keep_sorted = (ys > pre[gidx]) & (ys == gmax[gidx])
    keep = np.empty(len(x), dtype=bool)
    keep[order] = keep_sorted
    return keep


def skyline_ds(
    ds: Dataset,
    id_col: str,
    x_col: str,
    y_col: str,
    max_candidates: int = 5_000_000,
) -> Dataset:
    """2-D Pareto frontier (skyline): rows not dominated by any other
    row on the two int64 dimensions — the multi-objective shortlist
    (e.g. longest AND highest-quality documents).

    Scale shape: the skyline operator is DISTRIBUTIVE —
    ``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))`` — so each
    block reduces to its local frontier first (vectorized O(n log n)
    kernel) and only local-frontier survivors leave the block. The
    candidate union is guarded by ``max_candidates`` before the final
    driver-side merge pass (frontiers of real 2-D data are tiny:
    O(log n) expected for independent dims)."""

    def local(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                x_col: pa.array([], pa.int64()),
                y_col: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        x = batch.column(x_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = _skyline_keep(x, y)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()).filter(
                    pa.array(keep)
                ),
                x_col: pa.array(x[keep], pa.int64()),
                y_col: pa.array(y[keep], pa.int64()),
            }
        )

    cand = (
        ds.select_columns([id_col, x_col, y_col])
        .map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    n_cand = cand.count()
    if n_cand > max_candidates:
        raise ValueError(
            f"local-frontier union ({n_cand} rows) exceeds "
            f"max_candidates={max_candidates}; re-run the local pass on "
            "the candidate dataset to shrink it before the merge"
        )
    rows = cand.take_all()
    ids = np.asarray([r[id_col] for r in rows], dtype=np.int64)
    x = np.asarray([r[x_col] for r in rows], dtype=np.int64)
    y = np.asarray([r[y_col] for r in rows], dtype=np.int64)
    keep = _skyline_keep(x, y) if len(ids) else np.zeros(0, dtype=bool)
    return ray.data.from_arrow(
        pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                x_col: pa.array(x[keep], pa.int64()),
                y_col: pa.array(y[keep], pa.int64()),
            }
        )
    )


# ---------- grouped mode (most frequent value per key) ----------


def grouped_mode_ds(
    ds: Dataset,
    key_col: str = "user_id",
    val_col: str = "event_type",
    mode_col: str = "mode_val",
    n_col: str = "n_events",
    n_buckets: int = 256,
) -> Dataset:
    """Most frequent value per key with a deterministic tie-break
    (higher count wins, ties go to the lexicographically smallest
    value) — the `row_number() OVER (ORDER BY n DESC, v)` = 1 pattern.

    Scale shape: a per-batch ``np.lexsort`` + boundary-count combiner
    collapses each block to one row per distinct (key, value) BEFORE
    the exact ``groupby([key, value])`` count; the argmax then needs
    each key's candidate rows co-located, which ONE
    ``mix64(key) % n_buckets`` shuffle of the (key, value, n) rows —
    already distinct-cell-sized, not row-sized — provides. In-bucket
    selection is one lexsort + group-start gather, no per-key Python."""

    def combine(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], pa.int64()),
                "v": pa.array([], pa.string()),
                "n_p": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch.column(val_col).cast(pa.string()).to_numpy(zero_copy_only=False)
        v = v.astype(str)
        order = np.lexsort((v, k))
        ks, vs = k[order], v[order]
        new = np.concatenate(([True], (ks[1:] != ks[:-1]) | (vs[1:] != vs[:-1])))
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate((starts, [len(ks)])))
        return pa.table(
            {
                "k": pa.array(ks[starts], pa.int64()),
                "v": pa.array(vs[starts], pa.string()),
                "n_p": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    counts = (
        ds.select_columns([key_col, val_col])
        .map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["k", "v"])
        .aggregate(Sum("n_p"))
    )

    def tag(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bkt": pa.array([], pa.int64()),
                "k": pa.array([], pa.int64()),
                "v": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        k = batch.column("k").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(k) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(k, pa.int64()),
                "v": batch.column("v"),
                "n": batch.column("sum(n_p)").cast(pa.int64()),
            }
        )

    def pick(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                mode_col: pa.array([], pa.string()),
                n_col: pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False).astype(str)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -n, k))
        ks, vs, ns = k[order], v[order], n[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        return pa.table(
            {
                key_col: pa.array(ks[starts], pa.int64()),
                mode_col: pa.array(vs[starts], pa.string()),
                n_col: pa.array(ns[starts], pa.int64()),
            }
        )

    out = (
        counts.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(pick, batch_format="pyarrow")
    )
    return _anchor_schema(
        out,
        pa.schema(
            [(key_col, pa.int64()), (mode_col, pa.string()), (n_col, pa.int64())]
        ),
    )


# ---------- first/last-touch attribution ----------


def attribution_ds(
    events: Dataset,
    key_col: str = "user_id",
    order_cols: Tuple[str, str] = ("ts", "event_id"),
    type_col: str = "event_type",
    n_buckets: int = 256,
) -> Dataset:
    """First- and last-touch attribution per key: the first and last
    event's type and timestamp plus the total event count — the
    ``arg_min/arg_max OVER (PARTITION BY user)`` summary behind
    marketing attribution and session bookending.

    Scale shape: two-level argmin/argmax combine. A per-batch lexsort
    combiner collapses each block to ONE partial row per key (first
    candidate, last candidate, count) — so only key-count-sized partials
    shuffle — then one ``mix64(key) % n_buckets`` exchange co-locates a
    key's partials and three vectorized passes (min-lexsort, max-lexsort,
    reduceat sum) finish. Deterministic because ``order_cols`` pairs are
    unique per event."""

    part_schema = pa.schema(
        [
            ("bkt", pa.int64()),
            ("k", pa.int64()),
            ("f_o1", pa.int64()),
            ("f_o2", pa.int64()),
            ("f_t", pa.string()),
            ("l_o1", pa.int64()),
            ("l_o2", pa.int64()),
            ("l_t", pa.string()),
            ("n_p", pa.int64()),
        ]
    )
    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("first_type", pa.string()),
            ("first_ts_us", pa.int64()),
            ("last_type", pa.string()),
            ("last_ts_us", pa.int64()),
            ("n_events", pa.int64()),
        ]
    )

    def combine(batch: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in part_schema})
        if batch.num_rows == 0:
            return empty
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        o1 = (
            batch.column(order_cols[0]).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        o2 = (
            batch.column(order_cols[1]).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        t = batch.column(type_col).cast(pa.string()).to_numpy(zero_copy_only=False)
        t = t.astype(str)
        order = np.lexsort((o2, o1, k))
        ks, o1s, o2s, ts_ = k[order], o1[order], o2[order], t[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        ends = np.concatenate((starts[1:], [len(ks)])) - 1
        n_p = np.diff(np.concatenate((starts, [len(ks)])))
        kk = ks[starts]
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(kk) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(kk, pa.int64()),
                "f_o1": pa.array(o1s[starts], pa.int64()),
                "f_o2": pa.array(o2s[starts], pa.int64()),
                "f_t": pa.array(ts_[starts], pa.string()),
                "l_o1": pa.array(o1s[ends], pa.int64()),
                "l_o2": pa.array(o2s[ends], pa.int64()),
                "l_t": pa.array(ts_[ends], pa.string()),
                "n_p": pa.array(n_p.astype(np.int64), pa.int64()),
            }
        )

    def reduce(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows == 0:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        f_o1 = group.column("f_o1").to_numpy(zero_copy_only=False)
        f_o2 = group.column("f_o2").to_numpy(zero_copy_only=False)
        f_t = group.column("f_t").to_numpy(zero_copy_only=False).astype(str)
        l_o1 = group.column("l_o1").to_numpy(zero_copy_only=False)
        l_o2 = group.column("l_o2").to_numpy(zero_copy_only=False)
        l_t = group.column("l_t").to_numpy(zero_copy_only=False).astype(str)
        n_p = group.column("n_p").to_numpy(zero_copy_only=False)

        fo = np.lexsort((f_o2, f_o1, k))  # per key: first candidate leads
        fstarts = np.flatnonzero(
            np.concatenate(([True], k[fo][1:] != k[fo][:-1]))
        )
        fidx = fo[fstarts]

        lo = np.lexsort((l_o2, l_o1, k))  # per key: last candidate trails
        kl = k[lo]
        lstarts = np.flatnonzero(np.concatenate(([True], kl[1:] != kl[:-1])))
        lends = np.concatenate((lstarts[1:], [len(kl)])) - 1
        lidx = lo[lends]

        ko = np.argsort(k, kind="stable")
        kk = k[ko]
        nstarts = np.flatnonzero(np.concatenate(([True], kk[1:] != kk[:-1])))
        n_tot = np.add.reduceat(n_p[ko], nstarts)

        return pa.table(
            {
                key_col: pa.array(k[fidx], pa.int64()),
                "first_type": pa.array(f_t[fidx], pa.string()),
                "first_ts_us": pa.array(f_o1[fidx], pa.int64()),
                "last_type": pa.array(l_t[lidx], pa.string()),
                "last_ts_us": pa.array(l_o1[lidx], pa.int64()),
                "n_events": pa.array(n_tot.astype(np.int64), pa.int64()),
            }
        )

    out = (
        events.select_columns([key_col, order_cols[0], order_cols[1], type_col])
        .map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(reduce, batch_format="pyarrow")
    )
    return _anchor_schema(out, out_schema)


# ---------- sessionization (gap-based sessions per user) ----------


def sessions_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    gap_us: int = 1_800_000_000,
    n_buckets: int = 512,
) -> Dataset:
    """Gap-based sessionization: split each user's event stream into
    sessions wherever consecutive events are more than ``gap_us`` apart,
    and emit one row per session (user, 1-based session ordinal, start /
    end timestamps, event count) — the gaps-and-islands pattern behind
    engagement and funnel metrics.

    Scale shape: sessionization is inherently a per-user ordered scan,
    so the event rows themselves shuffle ONCE by ``mix64(user) %
    n_buckets`` (bounded group count), pruned to (user, ts_us, tie) —
    ~24 bytes/row. Inside the bucket one lexsort segments users, breaks
    are a vectorized gap compare, and sessions reduce to their
    boundary rows — no per-user Python, no driver collection.
    Determinism: ties on ts are ordered by ``tie_col`` (unique), and a
    zero gap can never open a session, so tied rows always co-session."""
    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("session_id", pa.int64()),
            ("start_us", pa.int64()),
            ("end_us", pa.int64()),
            ("n_events", pa.int64()),
        ]
    )

    def project(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(k) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(k, pa.int64()),
                "t": batch.column(ts_col).cast(pa.int64()),
                "e": batch.column(tie_col).cast(pa.int64()),
            }
        )

    def sessions(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows == 0:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        e = group.column("e").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, k))
        ks, ts_, = k[order], t[order]
        new_user = np.concatenate(([True], ks[1:] != ks[:-1]))
        gap_break = np.concatenate(([True], (ts_[1:] - ts_[:-1]) > gap_us))
        brk = new_user | gap_break
        sess_idx = np.cumsum(brk) - 1  # global 0-based session per row
        s_starts = np.flatnonzero(brk)
        s_ends = np.concatenate((s_starts[1:], [len(ks)])) - 1
        n_ev = np.diff(np.concatenate((s_starts, [len(ks)])))
        # per-user 1-based ordinal: subtract the user's first session idx
        u_starts = np.flatnonzero(new_user)
        base = np.repeat(sess_idx[u_starts], np.diff(np.concatenate((u_starts, [len(ks)]))))
        sid = sess_idx - base + 1
        return pa.table(
            {
                key_col: pa.array(ks[s_starts], pa.int64()),
                "session_id": pa.array(sid[s_starts], pa.int64()),
                "start_us": pa.array(ts_[s_starts], pa.int64()),
                "end_us": pa.array(ts_[s_ends], pa.int64()),
                "n_events": pa.array(n_ev.astype(np.int64), pa.int64()),
            }
        )

    out = (
        events.select_columns([key_col, ts_col, tie_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(sessions, batch_format="pyarrow")
    )
    return _anchor_schema(out, out_schema)


# ---------- OHLC bars (open/high/low/close per period) ----------


def ohlc_bars_ds(
    orders: Dataset,
    date_col: str = "o_orderdate",
    key_col: str = "o_orderkey",
    price_col: str = "o_totalprice",
) -> Dataset:
    """Monthly OHLC bars over the order stream: per calendar month the
    first order's price (open), max (high), min (low), last order's
    price (close), order count and total — the downsampling step behind
    any time-series dashboard. Prices quantize to integer cents
    (``round(p*100)``) for engine-exact compares; first/last ties on the
    date break by order key.

    Scale shape: a per-batch lexsort combiner collapses each block to
    ONE partial bar per month (open candidate, close candidate, min,
    max, count, sum), so only months-per-block-sized partials shuffle;
    the month domain is bounded (~a century = 1200 groups), so a plain
    ``groupby("ym").map_groups`` finishes with one vectorized pass."""
    part_schema = pa.schema(
        [
            ("ym", pa.int64()),
            ("f_d", pa.int64()),
            ("f_k", pa.int64()),
            ("f_c", pa.int64()),
            ("l_d", pa.int64()),
            ("l_k", pa.int64()),
            ("l_c", pa.int64()),
            ("lo", pa.int64()),
            ("hi", pa.int64()),
            ("n_p", pa.int64()),
            ("s_p", pa.int64()),
        ]
    )
    out_schema = pa.schema(
        [
            ("ym", pa.int64()),
            ("open_cents", pa.int64()),
            ("high_cents", pa.int64()),
            ("low_cents", pa.int64()),
            ("close_cents", pa.int64()),
            ("n_orders", pa.int64()),
            ("total_cents", pa.int64()),
        ]
    )

    def combine(batch: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in part_schema})
        if batch.num_rows == 0:
            return empty
        dcol = batch.column(date_col)
        ym = (
            pc.add(
                pc.multiply(pc.year(dcol).cast(pa.int64()), 100),
                pc.month(dcol).cast(pa.int64()),
            )
        ).to_numpy(zero_copy_only=False)
        d = dcol.cast(pa.int64()).to_numpy(zero_copy_only=False)
        okey = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = (
            pc.cast(pc.round(pc.multiply(batch.column(price_col), 100)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((okey, d, ym))
        yms, ds_, ks, cs = ym[order], d[order], okey[order], cents[order]
        new = np.concatenate(([True], yms[1:] != yms[:-1]))
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [len(yms)])) - 1
        n_p = np.diff(np.concatenate((starts, [len(yms)])))
        lo = np.minimum.reduceat(cs, starts)
        hi = np.maximum.reduceat(cs, starts)
        s_p = np.add.reduceat(cs, starts)
        return pa.table(
            {
                "ym": pa.array(yms[starts], pa.int64()),
                "f_d": pa.array(ds_[starts], pa.int64()),
                "f_k": pa.array(ks[starts], pa.int64()),
                "f_c": pa.array(cs[starts], pa.int64()),
                "l_d": pa.array(ds_[ends], pa.int64()),
                "l_k": pa.array(ks[ends], pa.int64()),
                "l_c": pa.array(cs[ends], pa.int64()),
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "n_p": pa.array(n_p.astype(np.int64), pa.int64()),
                "s_p": pa.array(s_p.astype(np.int64), pa.int64()),
            }
        )

    def reduce(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows == 0:
            return empty
        ym = group.column("ym").to_numpy(zero_copy_only=False)
        f_d = group.column("f_d").to_numpy(zero_copy_only=False)
        f_k = group.column("f_k").to_numpy(zero_copy_only=False)
        f_c = group.column("f_c").to_numpy(zero_copy_only=False)
        l_d = group.column("l_d").to_numpy(zero_copy_only=False)
        l_k = group.column("l_k").to_numpy(zero_copy_only=False)
        l_c = group.column("l_c").to_numpy(zero_copy_only=False)
        lo = group.column("lo").to_numpy(zero_copy_only=False)
        hi = group.column("hi").to_numpy(zero_copy_only=False)
        n_p = group.column("n_p").to_numpy(zero_copy_only=False)
        s_p = group.column("s_p").to_numpy(zero_copy_only=False)

        fo = np.lexsort((f_k, f_d, ym))
        fstarts = np.flatnonzero(
            np.concatenate(([True], ym[fo][1:] != ym[fo][:-1]))
        )
        fidx = fo[fstarts]

        lo_ = np.lexsort((l_k, l_d, ym))
        yl = ym[lo_]
        lstarts = np.flatnonzero(np.concatenate(([True], yl[1:] != yl[:-1])))
        lends = np.concatenate((lstarts[1:], [len(yl)])) - 1
        lidx = lo_[lends]

        yo = np.argsort(ym, kind="stable")
        ys = ym[yo]
        starts = np.flatnonzero(np.concatenate(([True], ys[1:] != ys[:-1])))
        return pa.table(
            {
                "ym": pa.array(ym[fidx], pa.int64()),
                "open_cents": pa.array(f_c[fidx], pa.int64()),
                "high_cents": pa.array(np.maximum.reduceat(hi[yo], starts), pa.int64()),
                "low_cents": pa.array(np.minimum.reduceat(lo[yo], starts), pa.int64()),
                "close_cents": pa.array(l_c[lidx], pa.int64()),
                "n_orders": pa.array(np.add.reduceat(n_p[yo], starts), pa.int64()),
                "total_cents": pa.array(np.add.reduceat(s_p[yo], starts), pa.int64()),
            }
        )

    out = (
        orders.select_columns([date_col, key_col, price_col])
        .map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ym")
        .map_groups(reduce, batch_format="pyarrow")
    )
    return _anchor_schema(out, out_schema)


# ---------- period-over-period (monthly revenue + lag delta) ----------


def period_over_period_ds(
    orders: Dataset,
    date_col: str = "o_orderdate",
    price_col: str = "o_totalprice",
) -> Dataset:
    """Monthly revenue with the previous month's revenue and the delta
    (``lag() OVER (ORDER BY month)``) — the period-over-period report.
    Months with no predecessor emit ``prev_cents = -1, delta_cents = 0``
    so both engines produce clean int64 (no float-null laundering).

    Scale shape: a per-batch Arrow combiner emits one (month, cents,
    n) partial per block, ONE tiny ``groupby`` over the bounded month
    domain reduces them, and the lag itself runs on the final
    months-sized table in a single block (``repartition(1)``) — the
    only driver-adjacent step is over a report-sized result by
    construction."""
    out_schema = pa.schema(
        [
            ("ym", pa.int64()),
            ("cents", pa.int64()),
            ("n_orders", pa.int64()),
            ("prev_cents", pa.int64()),
            ("delta_cents", pa.int64()),
        ]
    )

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "ym": pa.array([], pa.int64()),
                    "c_p": pa.array([], pa.int64()),
                    "n_p": pa.array([], pa.int64()),
                }
            )
        dcol = batch.column(date_col)
        ym = (
            pc.add(
                pc.multiply(pc.year(dcol).cast(pa.int64()), 100),
                pc.month(dcol).cast(pa.int64()),
            )
        ).to_numpy(zero_copy_only=False)
        cents = (
            pc.cast(pc.round(pc.multiply(batch.column(price_col), 100)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.argsort(ym, kind="stable")
        ys, cs = ym[order], cents[order]
        starts = np.flatnonzero(np.concatenate(([True], ys[1:] != ys[:-1])))
        return pa.table(
            {
                "ym": pa.array(ys[starts], pa.int64()),
                "c_p": pa.array(np.add.reduceat(cs, starts), pa.int64()),
                "n_p": pa.array(
                    np.diff(np.concatenate((starts, [len(ys)]))).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    monthly = (
        orders.select_columns([date_col, price_col])
        .map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ym")
        .aggregate(Sum("c_p"), Sum("n_p"))
    )

    def lag_pass(batch: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if batch.num_rows == 0:
            return empty
        ym = batch.column("ym").cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = batch.column("sum(c_p)").cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = batch.column("sum(n_p)").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(ym, kind="stable")
        ys, cs, ns = ym[order], c[order], n[order]
        prev = np.concatenate(([-1], cs[:-1]))
        delta = np.where(prev < 0, 0, cs - prev)
        return pa.table(
            {
                "ym": pa.array(ys, pa.int64()),
                "cents": pa.array(cs, pa.int64()),
                "n_orders": pa.array(ns, pa.int64()),
                "prev_cents": pa.array(prev, pa.int64()),
                "delta_cents": pa.array(delta.astype(np.int64), pa.int64()),
            }
        )

    out = monthly.repartition(1).map_batches(
        lag_pass, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return _anchor_schema(out, out_schema)


# ---------- grouped z-score standardization ----------


def zscore_ds(
    events: Dataset,
    key_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    quant: int = 100,
) -> Dataset:
    """Per-group standardization: each event's z-score against its
    group's population mean/std — the feature-normalization step of any
    model-prep pipeline. Bit-exact by construction: values quantize to
    ``v = round(value*quant)`` int64, so the group aggregates (n, Σv,
    Σv²) are exact integers and ``z = (n·v − Σv) / sqrt(n·Σv² − (Σv)²)``
    is one correctly-rounded IEEE division + sqrt — identical doubles in
    any engine that mirrors the expression (``z_e6 = floor(z · 1e6)``;
    constant groups emit 0). Σv² can overflow int64 past ~1e18
    quant-units-squared — at that scale raise ``quant`` granularity or
    pre-scale upstream.

    Scale shape: one per-batch combiner emits (group, n, Σv, Σv²)
    partials; the bounded group domain reduces in a tiny ``groupby``;
    the per-row pass then reads the aggregate table as a broadcast
    (``ray.put`` once, binary-searched per batch) — never a shuffle of
    the event rows themselves."""
    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            (key_col, pa.string()),
            ("v_q", pa.int64()),
            ("z_e6", pa.int64()),
        ]
    )

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.string()),
                    "n_p": pa.array([], pa.int64()),
                    "s_p": pa.array([], pa.int64()),
                    "ss_p": pa.array([], pa.int64()),
                }
            )
        g = batch.column(key_col).to_numpy(zero_copy_only=False).astype(str)
        v = (
            pc.cast(pc.round(pc.multiply(batch.column(value_col), quant)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.argsort(g, kind="stable")
        gs, vs = g[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], gs[1:] != gs[:-1])))
        return pa.table(
            {
                "g": pa.array(gs[starts], pa.string()),
                "n_p": pa.array(
                    np.diff(np.concatenate((starts, [len(gs)]))).astype(np.int64),
                    pa.int64(),
                ),
                "s_p": pa.array(np.add.reduceat(vs, starts), pa.int64()),
                "ss_p": pa.array(np.add.reduceat(vs * vs, starts), pa.int64()),
            }
        )

    agg = (
        events.select_columns([key_col, value_col])
        .map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(Sum("n_p"), Sum("s_p"), Sum("ss_p"))
        .materialize()
    )
    rows = agg.take_all()  # bounded by the group domain (report-sized)
    groups = np.array(sorted(r["g"] for r in rows), dtype=str)
    by_g = {r["g"]: r for r in rows}
    n_arr = np.array([by_g[g]["sum(n_p)"] for g in groups], dtype=np.int64)
    s_arr = np.array([by_g[g]["sum(s_p)"] for g in groups], dtype=np.int64)
    ss_arr = np.array([by_g[g]["sum(ss_p)"] for g in groups], dtype=np.int64)
    stats_ref = ray.put((groups, n_arr, s_arr, ss_arr))

    def attach(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        gg, nn, ss_sum, ss_sq = ray.get(stats_ref)
        g = batch.column(key_col).to_numpy(zero_copy_only=False).astype(str)
        v = (
            pc.cast(pc.round(pc.multiply(batch.column(value_col), quant)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        pos = np.searchsorted(gg, g)
        n, s, ss = nn[pos], ss_sum[pos], ss_sq[pos]
        num = (n * v - s).astype(np.float64)
        den2 = (n * ss - s * s).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = num / np.sqrt(den2)
        z_e6 = np.where(den2 <= 0, 0, np.floor(z * 1_000_000.0)).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                key_col: batch.column(key_col),
                "v_q": pa.array(v, pa.int64()),
                "z_e6": pa.array(z_e6, pa.int64()),
            }
        )

    return events.select_columns([id_col, key_col, value_col]).map_batches(
        attach, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------- exact grouped percentiles (distinct-cell selection) ----------


def grouped_percentiles_ds(
    events: Dataset,
    key_col: str = "event_type",
    value_col: str = "value",
    quant: int = 100,
    n_buckets: int = 256,
) -> Dataset:
    """Exact per-group p25/p50/p75 (``percentile_disc`` semantics: the
    smallest value whose running count reaches ``ceil(q*n)``) over
    integer-quantized values — the distribution summary behind quality
    dashboards, computed WITHOUT sorting the raw rows.

    Scale shape: the raw rows never shuffle. A per-batch combiner
    collapses each block to distinct (group, value) cells, ONE
    ``groupby([g, v])`` reduces them globally (the shuffle moves
    value-domain-sized cells, not rows), and the cell table — already
    tiny — co-locates per group via a bucket hash. Inside the bucket one
    lexsort + running-count ``searchsorted`` picks all three ranks per
    group segment in a single vectorized pass. Rank arithmetic is pure
    integer (``(q·n + 99) // 100``), so both engines select the
    identical element."""
    from .corpus_ops import _hash_bucket_column

    out_schema = pa.schema(
        [
            (key_col, pa.string()),
            ("n", pa.int64()),
            ("p25_q", pa.int64()),
            ("p50_q", pa.int64()),
            ("p75_q", pa.int64()),
        ]
    )

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.string()),
                    "v": pa.array([], pa.int64()),
                    "c_p": pa.array([], pa.int64()),
                }
            )
        g = batch.column(key_col).to_numpy(zero_copy_only=False).astype(str)
        v = (
            pc.cast(pc.round(pc.multiply(batch.column(value_col), quant)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((v, g))
        gs, vs = g[order], v[order]
        new = np.concatenate(([True], (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])))
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "g": pa.array(gs[starts], pa.string()),
                "v": pa.array(vs[starts], pa.int64()),
                "c_p": pa.array(
                    np.diff(np.concatenate((starts, [len(gs)]))).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    cells = (
        events.select_columns([key_col, value_col])
        .map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["g", "v"])
        .aggregate(Sum("c_p"))
    )

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "bkt": pa.array([], pa.int64()),
                    "g": pa.array([], pa.string()),
                    "v": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "bkt": _hash_bucket_column(batch.column("g"), n_buckets),
                "g": batch.column("g"),
                "v": batch.column("v").cast(pa.int64()),
                "c": batch.column("sum(c_p)").cast(pa.int64()),
            }
        )

    def pick(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows == 0:
            return empty
        g = group.column("g").to_numpy(zero_copy_only=False).astype(str)
        v = group.column("v").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, g))
        gs, vs, cs = g[order], v[order], c[order]
        new = np.concatenate(([True], gs[1:] != gs[:-1]))
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [len(gs)])) - 1
        cum = np.cumsum(cs)
        seg_base = cum[starts] - cs[starts]
        n_g = cum[ends] - seg_base
        out = {key_col: pa.array(gs[starts], pa.string()),
               "n": pa.array(n_g.astype(np.int64), pa.int64())}
        for pct, name in ((25, "p25_q"), (50, "p50_q"), (75, "p75_q")):
            rank = (pct * n_g + 99) // 100
            idx = np.searchsorted(cum, seg_base + rank, side="left")
            out[name] = pa.array(vs[idx], pa.int64())
        return pa.table(out)

    out = (
        cells.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(pick, batch_format="pyarrow")
    )
    return _anchor_schema(out, out_schema)


# ---------- reorder gaps (per-customer inter-order intervals) ----------


def reorder_gaps_ds(
    orders: Dataset,
    key_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    tie_col: str = "o_orderkey",
    n_buckets: int = 512,
) -> Dataset:
    """Per-customer reorder cadence: order count, first/last order
    timestamps, and the min/max gap between CONSECUTIVE orders
    (``-1`` sentinels for single-order customers) — the repeat-purchase
    summary behind churn features.

    Scale shape: gaps need each key's ordered adjacency, so the pruned
    (key, ts, tie) projection shuffles ONCE by ``mix64(key) %
    n_buckets``; inside the bucket one lexsort segments keys and the
    consecutive diffs reduce per segment with masked
    ``minimum/maximum.reduceat`` — a segment's first row carries
    INT64_MAX / -1 filler so single-order segments fall out as
    sentinels with no per-key Python."""
    out_schema = pa.schema(
        [
            ("custkey", pa.int64()),
            ("n_orders", pa.int64()),
            ("first_us", pa.int64()),
            ("last_us", pa.int64()),
            ("min_gap_us", pa.int64()),
            ("max_gap_us", pa.int64()),
        ]
    )
    BIG = np.iinfo(np.int64).max

    def project(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(k) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(k, pa.int64()),
                "d": batch.column(date_col).cast(pa.int64()),
                "t": batch.column(tie_col).cast(pa.int64()),
            }
        )

    def gaps(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows == 0:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        d = group.column("d").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        order = np.lexsort((t, d, k))
        ks, ds_ = k[order], d[order]
        new = np.concatenate(([True], ks[1:] != ks[:-1]))
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [len(ks)])) - 1
        within = ~new
        gp = np.full(len(ks), BIG, dtype=np.int64)
        gn = np.full(len(ks), -1, dtype=np.int64)
        diffs = ds_[1:] - ds_[:-1]
        gp[1:][within[1:]] = diffs[within[1:]]
        gn[1:][within[1:]] = diffs[within[1:]]
        min_gap = np.minimum.reduceat(gp, starts)
        min_gap = np.where(min_gap == BIG, -1, min_gap)
        max_gap = np.maximum.reduceat(gn, starts)
        return pa.table(
            {
                "custkey": pa.array(ks[starts], pa.int64()),
                "n_orders": pa.array(
                    np.diff(np.concatenate((starts, [len(ks)]))).astype(np.int64),
                    pa.int64(),
                ),
                "first_us": pa.array(ds_[starts], pa.int64()),
                "last_us": pa.array(ds_[ends], pa.int64()),
                "min_gap_us": pa.array(min_gap.astype(np.int64), pa.int64()),
                "max_gap_us": pa.array(max_gap.astype(np.int64), pa.int64()),
            }
        )

    out = (
        orders.select_columns([key_col, date_col, tie_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(gaps, batch_format="pyarrow")
    )
    return _anchor_schema(out, out_schema)


# ---------- percent-of-total within region (share report) ----------


def customer_region_share_ds(
    orders: Dataset,
    customer: Dataset,
    nation_rows: List[Dict],
    n_buckets: int = 512,
) -> Dataset:
    """Each customer's revenue and their integer-permille share of
    their REGION's total revenue (``cents * 1000 // region_total``) —
    percent-of-total, the window-over-everything report every
    warehouse runs, composed from this engine's own primitives.

    Scale shape: per-customer revenue pre-combines per block before ONE
    ``groupby(custkey)``; the customer dimension attaches through the
    generic bucket-hash shuffle join (:func:`hash_join_ds` — the
    customer table is NOT broadcastable at web scale); the nation ->
    region map (25 rows) and the region totals (a handful) ARE
    broadcast-sized and ship via ``ray.put`` once. Totals come from a
    second block-combined tiny groupby, never a window over the rows."""
    n2r = {int(r["n_nationkey"]): int(r["n_regionkey"]) for r in nation_rows}
    nat_keys = np.array(sorted(n2r), dtype=np.int64)
    nat_regions = np.array([n2r[k] for k in nat_keys], dtype=np.int64)
    nat_ref = ray.put((nat_keys, nat_regions))

    def rev_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"c": pa.array([], pa.int64()), "c_p": pa.array([], pa.int64())}
            )
        k = batch.column("o_custkey").cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = (
            pc.cast(pc.round(pc.multiply(batch.column("o_totalprice"), 100)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.argsort(k, kind="stable")
        ks, cs = k[order], cents[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        return pa.table(
            {
                "c": pa.array(ks[starts], pa.int64()),
                "c_p": pa.array(np.add.reduceat(cs, starts), pa.int64()),
            }
        )

    custrev = (
        orders.select_columns(["o_custkey", "o_totalprice"])
        .map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c")
        .aggregate(Sum("c_p"))
        .map_batches(
            lambda b: pa.table(
                {
                    "c": b.column("c").cast(pa.int64()),
                    "cents": b.column("sum(c_p)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    cust_dim = customer.select_columns(["c_custkey", "c_nationkey"])
    joined = hash_join_ds(custrev, cust_dim, "c", "c_custkey", n_buckets)

    def attach_region(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "c": pa.array([], pa.int64()),
                    "regionkey": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        keys, regions = ray.get(nat_ref)
        nk = batch.column("c_nationkey").cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, nk)
        return pa.table(
            {
                "c": batch.column("c").cast(pa.int64()),
                "regionkey": pa.array(regions[pos], pa.int64()),
                "cents": batch.column("cents").cast(pa.int64()),
            }
        )

    regional = joined.map_batches(
        attach_region, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def tot_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"regionkey": pa.array([], pa.int64()), "t_p": pa.array([], pa.int64())}
            )
        rk = batch.column("regionkey").to_numpy(zero_copy_only=False)
        cents = batch.column("cents").to_numpy(zero_copy_only=False)
        order = np.argsort(rk, kind="stable")
        rs, cs = rk[order], cents[order]
        starts = np.flatnonzero(np.concatenate(([True], rs[1:] != rs[:-1])))
        return pa.table(
            {
                "regionkey": pa.array(rs[starts], pa.int64()),
                "t_p": pa.array(np.add.reduceat(cs, starts), pa.int64()),
            }
        )

    tot_rows = (
        regional.map_batches(tot_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("regionkey")
        .aggregate(Sum("t_p"))
        .take_all()  # bounded by the region domain (a handful of rows)
    )
    tkeys = np.array(sorted(int(r["regionkey"]) for r in tot_rows), dtype=np.int64)
    by_r = {int(r["regionkey"]): int(r["sum(t_p)"]) for r in tot_rows}
    tvals = np.array([by_r[k] for k in tkeys], dtype=np.int64)
    tot_ref = ray.put((tkeys, tvals))

    def share(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("custkey", pa.int64()),
                ("regionkey", pa.int64()),
                ("cents", pa.int64()),
                ("share_permille", pa.int64()),
            ]
        )
        if batch.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        keys, totals = ray.get(tot_ref)
        rk = batch.column("regionkey").to_numpy(zero_copy_only=False)
        cents = batch.column("cents").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, rk)
        return pa.table(
            {
                "custkey": batch.column("c").cast(pa.int64()),
                "regionkey": pa.array(rk, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "share_permille": pa.array(cents * 1000 // totals[pos], pa.int64()),
            }
        )

    return regional.map_batches(share, batch_format="pyarrow", zero_copy_batch=True)


# ---------- session baskets (event-type co-occurrence) ----------


def session_baskets_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    type_col: str = "event_type",
    gap_us: int = 1_800_000_000,
    n_buckets: int = 512,
) -> Dataset:
    """Market-basket co-occurrence over sessions: for every unordered
    pair of event types that appear in the SAME session (sessions per
    :func:`sessions_ds`'s gap rule), the number of sessions containing
    both — the association-mining input (lift/confidence follow from
    these counts plus the marginals).

    Scale shape: one ``mix64(user) % n_buckets`` shuffle of the pruned
    event projection; inside the bucket the session segmentation, the
    per-session DISTINCT-type reduction, and the within-session pair
    expansion (type domain is small, so pairs-per-session is bounded)
    are all lexsort + offset arithmetic; each bucket emits pre-combined
    (a, b, n) partials so the final ``groupby`` moves one row per pair
    per bucket — type-domain-squared-sized, never session-sized."""
    out_schema = pa.schema(
        [("type_a", pa.string()), ("type_b", pa.string()), ("n_sessions", pa.int64())]
    )

    def project(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(k) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(k, pa.int64()),
                "t": batch.column(ts_col).cast(pa.int64()),
                "e": batch.column(tie_col).cast(pa.int64()),
                "ty": batch.column(type_col).cast(pa.string()),
            }
        )

    def baskets(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows == 0:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        e = group.column("e").to_numpy(zero_copy_only=False)
        ty = group.column("ty").to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((e, t, k))
        ks, ts_, tys = k[order], t[order], ty[order]
        new_user = np.concatenate(([True], ks[1:] != ks[:-1]))
        brk = new_user | np.concatenate(([True], (ts_[1:] - ts_[:-1]) > gap_us))
        sess = np.cumsum(brk) - 1  # global session index within bucket
        # distinct (session, type) rows
        o2 = np.lexsort((tys, sess))
        ss, tt = sess[o2], tys[o2]
        keep = np.concatenate(([True], (ss[1:] != ss[:-1]) | (tt[1:] != tt[:-1])))
        ss, tt = ss[keep], tt[keep]
        # within-session all-pairs (a before b in sorted type order)
        seg_new = np.concatenate(([True], ss[1:] != ss[:-1]))
        starts = np.flatnonzero(seg_new)
        lens = np.diff(np.concatenate((starts, [len(ss)])))
        local = np.arange(len(ss)) - np.repeat(starts, lens)
        rep = (np.repeat(lens, lens) - 1 - local).astype(np.int64)
        total = int(rep.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(len(ss)), rep)
        base = np.cumsum(rep) - rep
        off = np.arange(total, dtype=np.int64) - np.repeat(base, rep)
        b_idx = a_idx + 1 + off
        ta, tb = tt[a_idx], tt[b_idx]
        # pre-combine pair counts inside the bucket
        po = np.lexsort((tb, ta))
        tas, tbs = ta[po], tb[po]
        pnew = np.concatenate(
            ([True], (tas[1:] != tas[:-1]) | (tbs[1:] != tbs[:-1]))
        )
        pstarts = np.flatnonzero(pnew)
        return pa.table(
            {
                "type_a": pa.array(tas[pstarts], pa.string()),
                "type_b": pa.array(tbs[pstarts], pa.string()),
                "n_p": pa.array(
                    np.diff(np.concatenate((pstarts, [total]))).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    out = (
        events.select_columns([key_col, ts_col, tie_col, type_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(baskets, batch_format="pyarrow")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n_p"))
        .map_batches(
            lambda b: pa.table(
                {
                    "type_a": b.column("type_a"),
                    "type_b": b.column("type_b"),
                    "n_sessions": b.column("sum(n_p)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return _anchor_schema(out, out_schema)


# ---------- grouped ordered id sample (string_agg head) ----------


def group_sample_ids_ds(
    docs: Dataset,
    key_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 5,
) -> Dataset:
    """Per-group audit sample: the ``k`` smallest ids joined as a
    comma-separated string plus the group's total count — the ordered
    ``string_agg`` head every data-quality report attaches next to its
    aggregates.

    Scale shape: a per-batch combiner keeps only each block's k
    smallest ids per group (plus one count partial), so the shuffle
    moves k·groups-sized rows per block; the bounded group domain
    reduces in one ``groupby(key)`` with a vectorized head-of-segment
    pick. The joined string is built per group from ≤ k candidates."""
    out_schema = pa.schema(
        [(key_col, pa.string()), ("ids", pa.string()), ("n_docs", pa.int64())]
    )

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.string()),
                    "id": pa.array([], pa.int64()),
                    "n_p": pa.array([], pa.int64()),
                }
            )
        g = batch.column(key_col).to_numpy(zero_copy_only=False).astype(str)
        i = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((i, g))
        gs, is_ = g[order], i[order]
        new = np.concatenate(([True], gs[1:] != gs[:-1]))
        starts = np.flatnonzero(new)
        lens = np.diff(np.concatenate((starts, [len(gs)])))
        local = np.arange(len(gs)) - np.repeat(starts, lens)
        keep = local < k
        n_p = np.zeros(len(gs), dtype=np.int64)
        n_p[starts] = lens  # block count rides on each group's first row
        return pa.table(
            {
                "g": pa.array(gs[keep], pa.string()),
                "id": pa.array(is_[keep], pa.int64()),
                "n_p": pa.array(n_p[keep], pa.int64()),
            }
        )

    def pick(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows == 0:
            return empty
        g = group.column("g").to_numpy(zero_copy_only=False).astype(str)
        i = group.column("id").to_numpy(zero_copy_only=False)
        n_p = group.column("n_p").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, g))
        gs, is_, ns = g[order], i[order], n_p[order]
        new = np.concatenate(([True], gs[1:] != gs[:-1]))
        starts = np.flatnonzero(new)
        lens = np.diff(np.concatenate((starts, [len(gs)])))
        local = np.arange(len(gs)) - np.repeat(starts, lens)
        keep = local < k
        seg_id = np.cumsum(new) - 1
        n_tot = np.add.reduceat(ns, starts)
        kept_seg = seg_id[keep]
        kept_ids = is_[keep]
        out_g, out_s, out_n = [], [], []
        for s in range(len(starts)):  # bounded by the group domain
            m = kept_seg == s
            out_g.append(gs[starts[s]])
            out_s.append(",".join(str(x) for x in kept_ids[m]))
            out_n.append(int(n_tot[s]))
        return pa.table(
            {
                key_col: pa.array(out_g, pa.string()),
                "ids": pa.array(out_s, pa.string()),
                "n_docs": pa.array(out_n, pa.int64()),
            }
        )

    out = (
        docs.select_columns([key_col, id_col])
        .map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .map_groups(pick, batch_format="pyarrow")
    )
    return _anchor_schema(out, out_schema)


# ---------- Bloom-filter semi-join (sketch with an exact twin) ----------


def bloom_semi_join_ds(
    probe: Dataset,
    build: Dataset,
    probe_key: str,
    build_key: str,
    m_bits: int = 65536,
    max_broadcast_keys: int = 50_000_000,
) -> Dataset:
    """Bloom-filter pre-join: build a 2-hash Bloom filter over the
    build side's distinct keys, flag every probe row with
    ``bloom_pass`` (1 = the filter admits it, INCLUDING its
    deterministic false positives) and ``actual`` (1 = exact member) —
    the shuffle-avoidance gate a distributed engine runs before an
    expensive join, plus the ground truth that measures its FP rate.

    Determinism is the point: both hash positions derive from the md5
    hex of the decimal key (``digest[:4]`` and ``digest[4:8]`` mod
    ``m_bits`` — the engine's established md5 idiom, see
    ``weighted_sample`` / ``dataset_split``), so ANY engine reproduces
    the SAME bit array and the SAME false positives; the SQL twin is a
    full value oracle over a probabilistic structure. md5-per-distinct
    (dictionary-bounded) is the oracle-parity trade documented across
    the LSH family; swap in splitmix64 when twin parity is not needed.

    Scale shape: the filter builds like the HLL sketch — each build
    block folds its distinct keys into one ``m_bits``-wide bitmap row,
    the driver OR-merges block bitmaps (associative, partition
    invariant) and broadcasts 8 KB via ``ray.put``; probes test both
    bits vectorized. The exact flag broadcasts the distinct build-key
    set under ``max_broadcast_keys`` (the demo path; above the guard it
    raises, pointing at :func:`semi_join_flag` machinery)."""
    import hashlib

    nbytes = m_bits // 8

    def _positions(keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        h1 = np.empty(len(keys), dtype=np.int64)
        h2 = np.empty(len(keys), dtype=np.int64)
        for i, v in enumerate(keys):  # md5 per DISTINCT key (oracle parity)
            d = hashlib.md5(str(int(v)).encode()).digest()
            h1[i] = int.from_bytes(d[:4], "big") % m_bits
            h2[i] = int.from_bytes(d[4:8], "big") % m_bits
        return h1, h2

    def build_bits(batch: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, dtype=np.uint8)
        if batch.num_rows:
            k = np.unique(
                batch.column(build_key).cast(pa.int64()).to_numpy(zero_copy_only=False)
            )
            h1, h2 = _positions(k)
            for h in (h1, h2):
                np.bitwise_or.at(bits, h // 8, (1 << (h % 8)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tolist()], pa.list_(pa.uint8()))})

    bkeys = build.select_columns([build_key]).materialize()
    parts = bkeys.map_batches(
        build_bits, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # one bitmap row per block
    bits = np.zeros(nbytes, dtype=np.uint8)
    for r in parts:
        np.bitwise_or(bits, np.asarray(r["bits"], np.uint8), out=bits)

    def exact_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64())})
        k = np.unique(
            batch.column(build_key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        return pa.table({"k": pa.array(k, pa.int64())})

    distinct = (
        bkeys.map_batches(exact_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Sum("k"))  # dedup via groupby; the sum is discarded
        .materialize()
    )
    n_keys = distinct.count()
    if n_keys > max_broadcast_keys:
        raise ValueError(
            f"{n_keys} distinct build keys exceed max_broadcast_keys="
            f"{max_broadcast_keys}; attach the exact flag with the "
            "bucket-hash semi-join instead of this broadcast demo path"
        )
    exact = np.sort(
        np.array([r["k"] for r in distinct.take_all()], dtype=np.int64)
    )
    ref = ray.put((bits, exact))

    def flag(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("custkey", pa.int64()), ("bloom_pass", pa.int64()), ("actual", pa.int64())]
        )
        if batch.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        bb, ex = ray.get(ref)
        k = batch.column(probe_key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        h1, h2 = _positions(uk)
        t1 = (bb[h1 // 8] >> (h1 % 8)) & 1
        t2 = (bb[h2 // 8] >> (h2 % 8)) & 1
        passed = ((t1 & t2) == 1)[inv]
        if len(ex):
            pos_c = np.clip(np.searchsorted(ex, k), 0, len(ex) - 1)
            actual = ex[pos_c] == k
        else:
            actual = np.zeros(len(k), dtype=bool)
        return pa.table(
            {
                "custkey": pa.array(k, pa.int64()),
                "bloom_pass": pa.array(passed.astype(np.int64), pa.int64()),
                "actual": pa.array(np.asarray(actual).astype(np.int64), pa.int64()),
            }
        )

    return probe.select_columns([probe_key]).map_batches(
        flag, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------- count-min sketch (deterministic, exact SQL twin) ----------


def cms_counts_ds(
    items: Dataset,
    key_col: str,
    width: int = 1024,
    depth: int = 2,
) -> Dataset:
    """Count-min sketch frequency estimates with ground truth: build a
    ``depth x width`` CMS over the item stream, then report every
    distinct key's sketch estimate next to its exact count — the
    overcount-only frequency oracle (est >= actual always) a streaming
    pipeline uses when per-key exact counts can't fit anywhere.

    Like :func:`bloom_semi_join_ds`, determinism is the point: row j's
    counter position for a key is md5-digest bytes ``[4j, 4j+4)`` of
    the decimal key mod ``width`` (md5 per DISTINCT key), so the
    counters — and every collision — are identical in any engine, and
    the SQL twin is a full value oracle over the sketch.

    Scale shape: each block folds its keys into one depth·width int64
    counter partial (vectorized ``np.add.at`` over per-block distinct
    keys), ONE flattened-counter row per block reaches the driver, and
    the merge is elementwise SUM — commutative, so partition-invariant.
    The probe pass re-reads the same materialized key counts (one
    distinct-cell combiner + groupby — the exact side) and attaches the
    broadcast sketch estimate vectorized."""
    import hashlib

    def _positions(keys: np.ndarray) -> np.ndarray:
        pos = np.empty((depth, len(keys)), dtype=np.int64)
        for i, v in enumerate(keys):  # md5 per DISTINCT key (oracle parity)
            d = hashlib.md5(str(int(v)).encode()).digest()
            for j in range(depth):
                pos[j, i] = int.from_bytes(d[4 * j : 4 * j + 4], "big") % width
        return pos

    def count_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()), "n_p": pa.array([], pa.int64())}
            )
        k, cnt = np.unique(
            batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "n_p": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    counts = (
        items.select_columns([key_col])
        .map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Sum("n_p"))
        .map_batches(
            lambda b: pa.table(
                {
                    "k": b.column("k").cast(pa.int64()),
                    "actual": b.column("sum(n_p)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )

    def sketch_partial(batch: pa.Table) -> pa.Table:
        c = np.zeros((depth, width), dtype=np.int64)
        if batch.num_rows:
            k = batch.column("k").to_numpy(zero_copy_only=False)
            n = batch.column("actual").to_numpy(zero_copy_only=False)
            pos = _positions(k)
            for j in range(depth):
                np.add.at(c[j], pos[j], n)
        return pa.table(
            {"c": pa.array([c.reshape(-1).tolist()], pa.list_(pa.int64()))}
        )

    parts = counts.map_batches(
        sketch_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # one counter row per block; SUM merge is order-free
    cms = np.zeros(depth * width, dtype=np.int64)
    for r in parts:
        cms += np.asarray(r["c"], np.int64)
    cms = cms.reshape(depth, width)
    ref = ray.put(cms)

    def probe(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("key", pa.int64()), ("est", pa.int64()), ("actual", pa.int64())]
        )
        if batch.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        c = ray.get(ref)
        k = batch.column("k").to_numpy(zero_copy_only=False)
        pos = _positions(k)
        est = c[0][pos[0]]
        for j in range(1, depth):
            est = np.minimum(est, c[j][pos[j]])
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "est": pa.array(est.astype(np.int64), pa.int64()),
                "actual": batch.column("actual").cast(pa.int64()),
            }
        )

    return counts.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


# ---------- interval merge (gaps-and-islands coalescing) ----------


def _merge_interval_partials(
    k: np.ndarray, s: np.ndarray, e: np.ndarray, niv: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Coalesce overlapping-or-touching intervals per key, fully
    vectorized. Returns one row per merged island: (key, island start,
    island end = running max of member ends, summed interval count).

    The per-key prefix cummax of ``e`` (ordered by ``s, e``) uses the
    rank-composite trick: ranks of ``e`` (``np.unique`` inverse) are
    packed as ``group_index * n_ranks + rank`` so one global
    ``np.maximum.accumulate`` resets itself at every group boundary
    (each group's codomain sits strictly above its predecessor's) with
    no overflow risk — the composite is bounded by ``n_rows**2``."""
    if len(k) == 0:
        z = np.array([], dtype=np.int64)
        return z, z, z, z
    order = np.lexsort((e, s, k))
    k, s, e, niv = k[order], s[order], e[order], niv[order]
    n = len(k)
    kstart = np.concatenate(([True], k[1:] != k[:-1]))
    uvals, er = np.unique(e, return_inverse=True)
    gidx = np.cumsum(kstart) - 1
    comp = gidx.astype(np.int64) * np.int64(len(uvals)) + er.astype(np.int64)
    cummax_e = uvals[
        np.maximum.accumulate(comp) - gidx.astype(np.int64) * np.int64(len(uvals))
    ]
    prev_cm = np.empty(n, dtype=np.int64)
    if n:
        prev_cm[0] = 0
        prev_cm[1:] = cummax_e[:-1]
    brk = kstart | (s > prev_cm)
    isl_start = np.flatnonzero(brk)
    ends = np.concatenate((isl_start[1:], [n])) - 1
    return (
        k[isl_start],
        s[isl_start],
        cummax_e[ends],
        np.add.reduceat(niv, isl_start) if n else niv,
    )


def interval_merge_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    dur_col: str = "value",
    n_buckets: int = 512,
) -> Dataset:
    """Merge overlapping-or-touching per-key intervals into islands —
    the gaps-and-islands coalescing every scheduling / activity-span /
    crawl-window pipeline needs (distinct from gap-based sessionization:
    intervals have EXTENT, and islands are defined by true overlap of
    ``[start, end]`` ranges, not by inter-event gaps).

    Interval semantics (documented so the SQL twin is exact): start =
    ``ts`` in epoch microseconds; duration = ``greatest(floor(value *
    1e6), 0) * 60`` microseconds (i.e. ``value`` minutes, floor-quantized
    at 1e-6 minute so both engines derive the identical int64 end).
    Two intervals of the same key merge when the later start is <= the
    running max end (touching merges).

    Scale shape: interval merging is ASSOCIATIVE, so each block first
    coalesces its own rows per key (a real combiner — a block's rows
    collapse to its local islands carrying partial ``n_iv`` counts),
    then ONE shuffle by ``mix64(key) % n_buckets`` (bounded group count,
    never one group per key) re-merges the partial islands inside each
    bucket with the same vectorized kernel. Raw rows never shuffle."""

    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("start_us", pa.int64()),
            ("end_us", pa.int64()),
            ("n_iv", pa.int64()),
        ]
    )

    def block_merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            t = pa.table({f.name: pa.array([], f.type) for f in out_schema})
            return t.append_column("bkt", pa.array([], pa.int64()))
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        dur = np.maximum(
            np.floor(
                batch.column(dur_col).to_numpy(zero_copy_only=False) * 1e6
            ).astype(np.int64),
            0,
        ) * np.int64(60)
        mk, ms, me, mn = _merge_interval_partials(
            k, ts, ts + dur, np.ones(len(k), dtype=np.int64)
        )
        bkt = (_mix64(mk) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                key_col: pa.array(mk, pa.int64()),
                "start_us": pa.array(ms, pa.int64()),
                "end_us": pa.array(me, pa.int64()),
                "n_iv": pa.array(mn, pa.int64()),
                "bkt": pa.array(bkt),
            }
        )

    partials = events.select_columns([key_col, ts_col, dur_col]).map_batches(
        block_merge, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_merge(group: pa.Table) -> pa.Table:
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        s = group.column("start_us").to_numpy(zero_copy_only=False)
        e = group.column("end_us").to_numpy(zero_copy_only=False)
        niv = group.column("n_iv").to_numpy(zero_copy_only=False)
        mk, ms, me, mn = _merge_interval_partials(k, s, e, niv)
        return pa.table(
            {
                key_col: pa.array(mk, pa.int64()),
                "start_us": pa.array(ms, pa.int64()),
                "end_us": pa.array(me, pa.int64()),
                "n_iv": pa.array(mn, pa.int64()),
            }
        )

    return _anchor_schema(
        partials.groupby("bkt").map_groups(bucket_merge, batch_format="pyarrow"),
        out_schema,
    )


# ---------- two-sample KS drift (integer-exact, per source pair) ----------


def ks_drift_ds(
    docs: Dataset,
    group_col: str = "source",
    value_col: str = "n_chars",
    max_cells: int = 2_000_000,
) -> Dataset:
    """Integer-exact two-sample Kolmogorov–Smirnov distance between every
    pair of groups over an integer value column — the distribution-drift
    detector a curation pipeline runs across sources / shards / snapshot
    dates before trusting a sampling mix. Cross-multiplied form keeps it
    engine-exact: ``ks_num = max_v |cdf_a(v)·n_b − cdf_b(v)·n_a|`` (all
    int64), reported with ``ks_permille = ks_num·1000 // (n_a·n_b)``.

    Scale shape: one per-batch ``(group, value)`` count combiner bounds
    the shuffle to distinct cells per block; the exact cell table (groups
    × distinct values, size-guarded by ``max_cells``) is the ONLY thing
    that leaves the aggregate, and the pairwise CDF sweep runs once on
    the driver over that bounded grid. Raw rows never shuffle. Int64
    bound: ``n_a · n_b`` must stay below 2^63 (documented; holds through
    ~3e9 rows per group)."""

    def cell_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "g": pa.array([], pa.string()),
                "v": pa.array([], pa.int64()),
                "n_p": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        t = pa.table(
            {
                "g": batch.column(group_col).cast(pa.string()),
                "v": batch.column(value_col).cast(pa.int64()),
            }
        )
        agg = t.group_by(["g", "v"]).aggregate([("v", "count")])
        return pa.table(
            {
                "g": agg.column("g"),
                "v": agg.column("v"),
                "n_p": agg.column("v_count").cast(pa.int64()),
            }
        )

    cells = (
        docs.select_columns([group_col, value_col])
        .map_batches(cell_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["g", "v"])
        .aggregate(Sum("n_p"))
        .materialize()
    )
    n_cells = cells.count()
    if n_cells > max_cells:
        raise ValueError(
            f"(group, value) domain ({n_cells} cells) exceeds max_cells={max_cells}"
        )
    rows = cells.take_all()
    out_schema = pa.schema(
        [
            ("src_a", pa.string()),
            ("src_b", pa.string()),
            ("n_a", pa.int64()),
            ("n_b", pa.int64()),
            ("ks_num", pa.int64()),
            ("ks_permille", pa.int64()),
        ]
    )
    if not rows:
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
    g = np.asarray([r["g"] for r in rows], dtype=object).astype(str)
    v = np.asarray([int(r["v"]) for r in rows], dtype=np.int64)
    n = np.asarray([int(r["sum(n_p)"]) for r in rows], dtype=np.int64)
    gnames, gcodes = np.unique(g, return_inverse=True)
    vvals, vcodes = np.unique(v, return_inverse=True)
    grid = np.zeros((len(gnames), len(vvals)), dtype=np.int64)
    grid[gcodes, vcodes] = n
    cdf = np.cumsum(grid, axis=1)
    totals = cdf[:, -1]
    out = {name: [] for name in out_schema.names}
    for a in range(len(gnames)):
        for b in range(a + 1, len(gnames)):
            ks = int(np.max(np.abs(cdf[a] * totals[b] - cdf[b] * totals[a])))
            out["src_a"].append(str(gnames[a]))
            out["src_b"].append(str(gnames[b]))
            out["n_a"].append(int(totals[a]))
            out["n_b"].append(int(totals[b]))
            out["ks_num"].append(ks)
            out["ks_permille"].append(ks * 1000 // (int(totals[a]) * int(totals[b])))
    return ray.data.from_arrow(
        pa.table({f.name: pa.array(out[f.name], f.type) for f in out_schema})
    )


# ---------- grouped linear trend (exact slope components) ----------


def trend_ds(
    ds: Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
) -> Dataset:
    """Per-group ordinary-least-squares slope as EXACT integer
    components: ``slope_num = n·Σxy − Σx·Σy`` and ``slope_den = n·Σxx −
    (Σx)²`` (slope = num/den; den = 0 marks a degenerate group — single
    point or constant x). Keeping the rational components integer makes
    the operator bit-identical in any engine and lets the consumer pick
    its own division precision. ``x_col`` / ``y_col`` must already be
    int64 (callers project e.g. epoch-day / cents columns first).

    Int64 bound (documented, mirrors :func:`moments_ds`): pick units so
    ``n_g · max|x| · max|y| < 2^63`` per group — natural for bounded
    per-entity histories (orders per customer) at any corpus scale.

    Scale shape: delegates to :func:`moments_ds` (one reduceat combiner
    row per group per block -> bounded groupby of integer sums), then a
    streaming derive pass."""
    m = moments_ds(ds, group_col, x_col, y_col, x_quant=1, y_quant=1)

    def derive(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        sx = batch.column("sum_x").to_numpy(zero_copy_only=False)
        sy = batch.column("sum_y").to_numpy(zero_copy_only=False)
        sxx = batch.column("sum_xx").to_numpy(zero_copy_only=False)
        sxy = batch.column("sum_xy").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                group_col: batch.column(group_col),
                "n": pa.array(n, pa.int64()),
                "slope_num": pa.array(n * sxy - sx * sy, pa.int64()),
                "slope_den": pa.array(n * sxx - sx * sx, pa.int64()),
            }
        )

    return m.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


# ---------- global ROW_NUMBER and reciprocal-rank fusion ----------


def row_number_ds(
    ds: Dataset,
    value_col: str,
    id_col: str,
    descending: bool = False,
    n_buckets: int = 512,
    max_domain_broadcast: int = 5_000_000,
) -> Dataset:
    """``row_number() OVER (ORDER BY v [DESC], id)`` WITHOUT a global
    sort (the :func:`ntile_ds` decomposition, exposed as its own
    operator): ``rn = cum_below(v) + rank_within_ties(v, id)`` where the
    first term is a broadcast value-count CDF (one row per DISTINCT
    value — bounded domain, guarded) and the second comes from ONE
    ``mix64(value) % n_buckets`` shuffle that co-locates each tie run.
    Returns ``(id, v, rn)``; deterministic via the unique-id tie-break.
    ``descending`` negates the value internally (int64 domain)."""
    sign = np.int64(-1) if descending else np.int64(1)

    def vc_partial(batch: pa.Table) -> pa.Table:
        v = pc.multiply(
            batch.column(value_col).cast(pa.int64()), pa.scalar(sign, pa.int64())
        )
        g = pa.table({"v": v}).group_by("v").aggregate([("v", "count")])
        return pa.table(
            {"v": g.column("v"), "n_partial": g.column("v_count").cast(pa.int64())}
        )

    hist = (
        ds.select_columns([value_col])
        .map_batches(vc_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .aggregate(Sum("n_partial"))
        .materialize()
    )
    if hist.count() > max_domain_broadcast:
        raise ValueError(
            f"value domain ({hist.count()}) exceeds "
            f"max_domain_broadcast={max_domain_broadcast}"
        )
    rows = hist.take_all()
    vals = np.array([r["v"] for r in rows], np.int64)
    cnts = np.array([r["sum(n_partial)"] for r in rows], np.int64)
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    cum_below = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    ref = ray.put((vals, cum_below))

    def project(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) * sign
        bkt = (_mix64(v) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                "v": pa.array(v, pa.int64()),
                "bkt": pa.array(bkt, pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field(value_col, pa.int64()),
            pa.field("rn", pa.int64()),
        ]
    )

    def bucket_rn(group: pa.Table) -> pa.Table:
        vals_s, below_s = ray.get(ref)
        i = group.column(id_col).to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        order2 = np.lexsort((i, v))
        vs, is_ = v[order2], i[order2]
        starts = np.flatnonzero(np.concatenate(([True], vs[1:] != vs[:-1])))
        seg_len = np.diff(np.concatenate((starts, [len(vs)])))
        within = np.arange(len(vs), dtype=np.int64) - np.repeat(starts, seg_len) + 1
        rn = below_s[np.searchsorted(vals_s, vs)] + within
        return pa.table(
            {
                id_col: pa.array(is_, pa.int64()),
                value_col: pa.array(vs * sign, pa.int64()),
                "rn": pa.array(rn, pa.int64()),
            }
        )

    projected = ds.select_columns([id_col, value_col]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    return _anchor_schema(
        projected.groupby("bkt").map_groups(bucket_rn, batch_format="pyarrow"),
        out_schema,
    )


def rrf_fusion_ds(
    ds: Dataset,
    id_col: str,
    metric_a_col: str,
    metric_b_col: str,
    k_const: int = 60,
    topk: int = 100,
    n_buckets: int = 512,
) -> Dataset:
    """Reciprocal-rank fusion of two rankings of the same id set (the
    standard hybrid-retrieval / multi-signal document-selection
    combiner, Cormack et al. 2009): rank each id by metric A and by
    metric B (both DESC, id-ASC tie-break), then score ``rrf_e9 =
    floor(1e9/(k+rank_a)) + floor(1e9/(k+rank_b))`` — integer-quantized
    so both engines produce identical scores — and return the global
    top-``topk`` by score DESC, id ASC.

    Scale shape: two :func:`row_number_ds` passes (broadcast CDF + one
    tie shuffle each), ranks align by ONE ``mix64(id) % n_buckets``
    tagged-union shuffle, and the global top-k never sorts the corpus:
    each bucket emits its local top-``topk``, so the driver sorts at
    most ``n_buckets * topk`` candidate rows."""
    ra = row_number_ds(
        ds.select_columns([id_col, metric_a_col]),
        metric_a_col, id_col, descending=True, n_buckets=n_buckets,
    )
    rb = row_number_ds(
        ds.select_columns([id_col, metric_b_col]),
        metric_b_col, id_col, descending=True, n_buckets=n_buckets,
    )

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            i = batch.column(id_col).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "i": pa.array(i, pa.int64()),
                    "rn": batch.column("rn").cast(pa.int64()),
                    "side": pa.array(np.full(len(i), side, np.int8)),
                    "bkt": pa.array(
                        (_mix64(i) % np.uint64(n_buckets)).astype(np.int64)
                    ),
                }
            )

        return fn

    both = ra.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(rb.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True))

    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("rank_a", pa.int64()),
            ("rank_b", pa.int64()),
            ("rrf_e9", pa.int64()),
        ]
    )

    def bucket_fuse(group: pa.Table) -> pa.Table:
        i = group.column("i").to_numpy(zero_copy_only=False)
        rn = group.column("rn").to_numpy(zero_copy_only=False)
        side = group.column("side").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, i))
        i, rn = i[order], rn[order]
        # every id occurs exactly twice (side 0 then side 1)
        ids = i[0::2]
        rka, rkb = rn[0::2], rn[1::2]
        rrf = np.int64(10**9) // (k_const + rka) + np.int64(10**9) // (
            k_const + rkb
        )
        top = np.lexsort((ids, -rrf))[:topk]
        return pa.table(
            {
                id_col: pa.array(ids[top], pa.int64()),
                "rank_a": pa.array(rka[top], pa.int64()),
                "rank_b": pa.array(rkb[top], pa.int64()),
                "rrf_e9": pa.array(rrf[top], pa.int64()),
            }
        )

    cand = (
        ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
        .union(both.groupby("bkt").map_groups(bucket_fuse, batch_format="pyarrow"))
        .take_all()
    )
    ids = np.array([r[id_col] for r in cand], np.int64)
    rka = np.array([r["rank_a"] for r in cand], np.int64)
    rkb = np.array([r["rank_b"] for r in cand], np.int64)
    rrf = np.array([r["rrf_e9"] for r in cand], np.int64)
    top = np.lexsort((ids, -rrf))[:topk]
    return ray.data.from_arrow(
        pa.table(
            {
                id_col: pa.array(ids[top], pa.int64()),
                "rank_a": pa.array(rka[top], pa.int64()),
                "rank_b": pa.array(rkb[top], pa.int64()),
                "rrf_e9": pa.array(rrf[top], pa.int64()),
            }
        )
    )


# ---------- Z-order (Morton) clustering key ----------


def zorder_key_ds(
    ds: Dataset,
    id_col: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
    file_bits: int = 6,
) -> Dataset:
    """Z-order (Morton) clustering key over two int64 dimensions — the
    multi-column data-layout key a 100 TB table uses so files cluster on
    BOTH columns at once and either predicate prunes row groups (the
    public Delta/Iceberg OPTIMIZE ZORDER method). The low ``bits`` of
    each dimension interleave (x in even bit positions, y in odd);
    ``file_id`` is the top ``file_bits`` of the key — the write
    partition. Pure per-batch bit arithmetic: streaming map_batches, no
    shuffle, deterministic in any engine.

    Scale note: the operator intentionally emits the key instead of
    sorting by it — the writer repartitions on ``file_id`` (a bounded
    domain) rather than globally sorting the corpus."""
    shift = np.int64(2 * bits - file_bits)
    mask = np.int64((1 << bits) - 1)

    def zkey(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).cast(pa.int64()).to_numpy(zero_copy_only=False) & mask
        y = batch.column(y_col).cast(pa.int64()).to_numpy(zero_copy_only=False) & mask
        z = np.zeros(len(x), dtype=np.int64)
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                "zkey": pa.array(z, pa.int64()),
                "file_id": pa.array(z >> shift, pa.int64()),
            }
        )

    return ds.select_columns([id_col, x_col, y_col]).map_batches(
        zkey, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------- collapse consecutive duplicate values per key ----------


def collapse_runs_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "event_type",
    tie_col: str = "event_id",
    n_buckets: int = 512,
) -> Dataset:
    """Collapse consecutive duplicate values per key into runs — the
    sensor-reading / state-change compaction (`value != lag(value)`
    keeps a row): one output row per run with its start timestamp, run
    length, and the kept (first) tie id. Deterministic order: ``ts``
    ASC, ``tie_col`` ASC.

    Scale shape: run-collapse is NOT distributive across arbitrary block
    splits (a run can span blocks), so rows shuffle ONCE by
    ``mix64(key) % n_buckets`` with only the 4 projected columns;
    in-bucket one lexsort + shifted-compare marks run heads and a
    ``reduceat`` emits run lengths — no per-key Python."""

    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("start_us", pa.int64()),
            (tie_col, pa.int64()),
            (value_col, pa.string()),
            ("run_len", pa.int64()),
        ]
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: pa.array(k, pa.int64()),
                "ts_us": batch.column(ts_col).cast(pa.int64()),
                tie_col: batch.column(tie_col).cast(pa.int64()),
                value_col: batch.column(value_col).cast(pa.string()),
                "bkt": pa.array(
                    (_mix64(k) % np.uint64(n_buckets)).astype(np.int64)
                ),
            }
        )

    def bucket_collapse(group: pa.Table) -> pa.Table:
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        t = group.column("ts_us").to_numpy(zero_copy_only=False)
        tie = group.column(tie_col).to_numpy(zero_copy_only=False)
        v = np.asarray(group.column(value_col).to_pylist(), dtype=object)
        order = np.lexsort((tie, t, k))
        k, t, tie, v = k[order], t[order], tie[order], v[order]
        vs = v.astype(str)
        head = np.concatenate(
            ([True], (k[1:] != k[:-1]) | (vs[1:] != vs[:-1]))
        )
        starts = np.flatnonzero(head)
        lens = np.diff(np.concatenate((starts, [len(k)])))
        return pa.table(
            {
                key_col: pa.array(k[starts], pa.int64()),
                "start_us": pa.array(t[starts], pa.int64()),
                tie_col: pa.array(tie[starts], pa.int64()),
                value_col: pa.array(vs[starts], pa.string()),
                "run_len": pa.array(lens.astype(np.int64), pa.int64()),
            }
        )

    proj = events.select_columns(
        [key_col, ts_col, tie_col, value_col]
    ).map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return _anchor_schema(
        proj.groupby("bkt").map_groups(bucket_collapse, batch_format="pyarrow"),
        out_schema,
    )


# ---------- windowed stream-stream join ----------


def stream_join_ds(
    events: Dataset,
    type_a: str,
    type_b: str,
    window_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    n_buckets: int = 512,
    max_pairs_per_bucket: int = 10_000_000,
) -> Dataset:
    """Windowed stream-stream join: every (A, B) event pair of the same
    key with ``0 <= ts_b - ts_a <= window_us`` — the "click followed by
    purchase within an hour" correlation both streaming engines and
    attribution pipelines need. Emits one row per qualifying pair with
    both ids, both timestamps, and the gap.

    Scale shape: only rows of the two types project and shuffle ONCE by
    ``mix64(key) % n_buckets``; inside a bucket both sides sort by
    (key, ts, id) and each A's match range is TWO ``searchsorted``
    probes into the B side (composite key packs key-code and timestamp),
    expanded with the same offset arithmetic as :func:`hash_join_ds` —
    no per-key Python, row expansion bounded by the window.
    ``max_pairs_per_bucket`` fails loud on a pathological window."""

    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("a_id", pa.int64()),
            ("b_id", pa.int64()),
            ("a_ts_us", pa.int64()),
            ("b_ts_us", pa.int64()),
            ("gap_us", pa.int64()),
        ]
    )

    def project(batch: pa.Table) -> pa.Table:
        tcol = batch.column(type_col)
        keep = pc.or_(pc.equal(tcol, type_a), pc.equal(tcol, type_b))
        sub = batch.filter(keep)
        k = sub.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        side = pc.equal(sub.column(type_col), type_b).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                key_col: pa.array(k, pa.int64()),
                "ts_us": sub.column(ts_col).cast(pa.int64()),
                id_col: sub.column(id_col).cast(pa.int64()),
                "is_b": pa.array(side),
                "bkt": pa.array(
                    (_mix64(k) % np.uint64(n_buckets)).astype(np.int64)
                ),
            }
        )

    def bucket_join(group: pa.Table) -> pa.Table:
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        t = group.column("ts_us").to_numpy(zero_copy_only=False)
        i = group.column(id_col).to_numpy(zero_copy_only=False)
        is_b = group.column("is_b").to_numpy(zero_copy_only=False)
        kvals, kc = np.unique(k, return_inverse=True)
        a_m, b_m = ~is_b, is_b
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if not a_m.any() or not b_m.any():
            return empty
        # B side sorted by (key, ts, id); composite key-code<<42 | ts-rank
        bo = np.lexsort((i[b_m], t[b_m], kc[b_m]))
        bk, bt, bi = kc[b_m][bo], t[b_m][bo], i[b_m][bo]
        # composite probe values: rank timestamps so the pack can't overflow
        allt = np.unique(np.concatenate((t, t + window_us)))
        btr = np.searchsorted(allt, bt)
        shift = np.int64(len(allt) + 1)
        bkey = bk.astype(np.int64) * shift + btr
        ak, at_, ai = kc[a_m], t[a_m], i[a_m]
        lo = np.searchsorted(
            bkey, ak.astype(np.int64) * shift + np.searchsorted(allt, at_)
        )
        hi = np.searchsorted(
            bkey,
            ak.astype(np.int64) * shift + np.searchsorted(allt, at_ + window_us),
            side="right",
        )
        m = (hi - lo).astype(np.int64)
        total = int(m.sum())
        if total > max_pairs_per_bucket:
            raise ValueError(
                f"stream join pairs in one bucket ({total}) exceed "
                f"max_pairs_per_bucket={max_pairs_per_bucket}"
            )
        if total == 0:
            return empty
        a_of = np.repeat(np.arange(len(ak)), m)
        off = np.arange(total) - np.repeat(np.concatenate(([0], np.cumsum(m)[:-1])), m)
        b_of = lo[a_of] + off
        return pa.table(
            {
                key_col: pa.array(kvals[ak[a_of]], pa.int64()),
                "a_id": pa.array(ai[a_of], pa.int64()),
                "b_id": pa.array(bi[b_of], pa.int64()),
                "a_ts_us": pa.array(at_[a_of], pa.int64()),
                "b_ts_us": pa.array(bt[b_of], pa.int64()),
                "gap_us": pa.array(bt[b_of] - at_[a_of], pa.int64()),
            }
        )

    proj = events.select_columns(
        [key_col, ts_col, id_col, type_col]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return _anchor_schema(
        proj.groupby("bkt").map_groups(bucket_join, batch_format="pyarrow"),
        out_schema,
    )


# ---------- FK referential-integrity audit ----------


def fk_audit_ds(
    pairs: Sequence[Tuple[str, Dataset, str, Dataset, str]],
    n_buckets: int = 512,
) -> Dataset:
    """Referential-integrity audit across many FK relationships at once:
    for each ``(name, child, fk_col, parent, pk_col)`` report the child
    row count, distinct FK count, and the number of rows / distinct keys
    that have NO parent (orphans) — the conformance gate a warehouse
    runs before publishing a snapshot.

    Scale shape: per relationship, both sides reduce to per-block
    DISTINCT keys (child keys carry their row multiplicity), ONE
    ``mix64(key) % n_buckets`` tagged co-group marks orphan keys with a
    vectorized ``np.isin``, and only per-bucket counter rows reach the
    final tiny aggregate. Neither side broadcasts."""
    out_schema = pa.schema(
        [
            ("relationship", pa.string()),
            ("child_rows", pa.int64()),
            ("distinct_fks", pa.int64()),
            ("orphan_rows", pa.int64()),
            ("orphan_keys", pa.int64()),
        ]
    )
    results = []
    for name, child, fk_col, parent, pk_col in pairs:

        def child_side(batch: pa.Table, fk=fk_col) -> pa.Table:
            k, cnt = np.unique(
                batch.column(fk).cast(pa.int64()).to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table(
                {
                    "k": pa.array(k, pa.int64()),
                    "n": pa.array(cnt.astype(np.int64), pa.int64()),
                    "side": pa.array(np.zeros(len(k), np.int8)),
                    "bkt": pa.array(
                        (_mix64(k) % np.uint64(n_buckets)).astype(np.int64)
                    ),
                }
            )

        def parent_side(batch: pa.Table, pk=pk_col) -> pa.Table:
            k = np.unique(
                batch.column(pk).cast(pa.int64()).to_numpy(zero_copy_only=False)
            )
            return pa.table(
                {
                    "k": pa.array(k, pa.int64()),
                    "n": pa.array(np.zeros(len(k), np.int64)),
                    "side": pa.array(np.ones(len(k), np.int8)),
                    "bkt": pa.array(
                        (_mix64(k) % np.uint64(n_buckets)).astype(np.int64)
                    ),
                }
            )

        both = child.select_columns([fk_col]).map_batches(
            child_side, batch_format="pyarrow", zero_copy_batch=True
        ).union(
            parent.select_columns([pk_col]).map_batches(
                parent_side, batch_format="pyarrow", zero_copy_batch=True
            )
        )

        def bucket_counters(group: pa.Table) -> pa.Table:
            k = group.column("k").to_numpy(zero_copy_only=False)
            n = group.column("n").to_numpy(zero_copy_only=False)
            side = group.column("side").to_numpy(zero_copy_only=False)
            cm = side == 0
            # child per-block distincts may repeat across blocks: re-reduce
            ck, inv = np.unique(k[cm], return_inverse=True)
            cn = np.bincount(inv, weights=n[cm]).astype(np.int64)
            orphan = ~np.isin(ck, k[~cm])
            return pa.table(
                {
                    "child_rows": pa.array([int(cn.sum())], pa.int64()),
                    "distinct_fks": pa.array([len(ck)], pa.int64()),
                    "orphan_rows": pa.array([int(cn[orphan].sum())], pa.int64()),
                    "orphan_keys": pa.array([int(orphan.sum())], pa.int64()),
                }
            )

        counters = (
            both.groupby("bkt")
            .map_groups(bucket_counters, batch_format="pyarrow")
            .take_all()
        )
        tot = {c: sum(int(r[c]) for r in counters) for c in
               ("child_rows", "distinct_fks", "orphan_rows", "orphan_keys")}
        results.append((name, tot))
    return ray.data.from_arrow(
        pa.table(
            {
                "relationship": pa.array([r[0] for r in results], pa.string()),
                "child_rows": pa.array(
                    [r[1]["child_rows"] for r in results], pa.int64()
                ),
                "distinct_fks": pa.array(
                    [r[1]["distinct_fks"] for r in results], pa.int64()
                ),
                "orphan_rows": pa.array(
                    [r[1]["orphan_rows"] for r in results], pa.int64()
                ),
                "orphan_keys": pa.array(
                    [r[1]["orphan_keys"] for r in results], pa.int64()
                ),
            }
        )
        if results
        else pa.table({f.name: pa.array([], f.type) for f in out_schema})
    )


# ---------- SCD2 validity intervals (temporal table build) ----------


def scd2_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "event_type",
    tie_col: str = "event_id",
    open_end_us: int = 4_102_444_800_000_000,  # 2100-01-01, the open sentinel
    n_buckets: int = 512,
) -> Dataset:
    """SCD-type-2 history build: each key's change rows become validity
    intervals ``[valid_from, valid_to)`` with a 1-based version number —
    the temporal-table construction behind as-of correctness at read
    time. The latest row per key stays open (``valid_to`` = the fixed
    sentinel). Deterministic order: ``ts`` ASC, ``tie_col`` ASC.

    Scale shape: rows project to 4 columns and shuffle ONCE by
    ``mix64(key) % n_buckets``; in-bucket one lexsort + shifted arrays
    derive ``valid_to`` (next row's ts) and per-key version ordinals —
    no per-key Python."""
    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("version", pa.int64()),
            (value_col, pa.string()),
            ("valid_from_us", pa.int64()),
            ("valid_to_us", pa.int64()),
        ]
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: pa.array(k, pa.int64()),
                "ts_us": batch.column(ts_col).cast(pa.int64()),
                tie_col: batch.column(tie_col).cast(pa.int64()),
                value_col: batch.column(value_col).cast(pa.string()),
                "bkt": pa.array(
                    (_mix64(k) % np.uint64(n_buckets)).astype(np.int64)
                ),
            }
        )

    def bucket_history(group: pa.Table) -> pa.Table:
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        t = group.column("ts_us").to_numpy(zero_copy_only=False)
        tie = group.column(tie_col).to_numpy(zero_copy_only=False)
        v = np.asarray(group.column(value_col).to_pylist(), dtype=object)
        order = np.lexsort((tie, t, k))
        k, t, v = k[order], t[order], v[order]
        n = len(k)
        start = np.concatenate(([True], k[1:] != k[:-1]))
        version = np.arange(n, dtype=np.int64) - np.repeat(
            np.flatnonzero(start),
            np.diff(np.concatenate((np.flatnonzero(start), [n]))),
        ) + 1
        valid_to = np.empty(n, dtype=np.int64)
        valid_to[:-1] = t[1:]
        valid_to[-1] = open_end_us
        last = np.concatenate((start[1:], [True]))
        valid_to[last] = open_end_us
        return pa.table(
            {
                key_col: pa.array(k, pa.int64()),
                "version": pa.array(version, pa.int64()),
                value_col: pa.array(v.astype(str), pa.string()),
                "valid_from_us": pa.array(t, pa.int64()),
                "valid_to_us": pa.array(valid_to, pa.int64()),
            }
        )

    proj = events.select_columns(
        [key_col, ts_col, tie_col, value_col]
    ).map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return _anchor_schema(
        proj.groupby("bkt").map_groups(bucket_history, batch_format="pyarrow"),
        out_schema,
    )


# ---------- winsorize (percentile cap) ----------


def winsorize_ds(
    ds: Dataset,
    value_col: str,
    id_col: str,
    pct: int = 99,
    max_domain_broadcast: int = 5_000_000,
) -> Dataset:
    """Winsorize a column at the global ``pct`` percentile — the outlier
    cap a curation pipeline applies to document lengths / token counts
    before length-balanced sampling. The cutoff is
    ``percentile_disc(pct)`` (the value at 1-based rank
    ``ceil(pct * n / 100)`` = ``(pct * n + 99) // 100`` — pure integer
    rank arithmetic, engine-exact); output is every row with its
    original value, the clipped value, and a 0/1 flag.

    Scale shape: one value-count combiner -> bounded distinct-value
    groupby (guarded) -> the single cutoff scalar broadcasts in the
    closure -> one streaming clip pass. Raw rows never shuffle."""

    def vc_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).cast(pa.int64())
        g = pa.table({"v": v}).group_by("v").aggregate([("v", "count")])
        return pa.table(
            {"v": g.column("v"), "n_partial": g.column("v_count").cast(pa.int64())}
        )

    hist = (
        ds.select_columns([value_col])
        .map_batches(vc_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .aggregate(Sum("n_partial"))
        .materialize()
    )
    if hist.count() > max_domain_broadcast:
        raise ValueError(
            f"value domain ({hist.count()}) exceeds "
            f"max_domain_broadcast={max_domain_broadcast}"
        )
    rows = hist.take_all()
    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            (value_col, pa.int64()),
            ("clipped", pa.int64()),
            ("was_clipped", pa.int64()),
        ]
    )
    if not rows:
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
    vals = np.array([r["v"] for r in rows], np.int64)
    cnts = np.array([r["sum(n_partial)"] for r in rows], np.int64)
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    rank = (pct * n + 99) // 100  # 1-based percentile_disc rank
    cutoff = int(vals[np.searchsorted(cum, rank)])

    def clip(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = np.minimum(v, cutoff)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                value_col: pa.array(v, pa.int64()),
                "clipped": pa.array(c, pa.int64()),
                "was_clipped": pa.array((v > cutoff).astype(np.int64), pa.int64()),
            }
        )

    return ds.select_columns([id_col, value_col]).map_batches(
        clip, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------- Mann-Whitney rank-sum (integer-exact, doubled ranks) ----------


def rank_sum_ds(
    ds: Dataset,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    max_cells: int = 2_000_000,
) -> Dataset:
    """Mann-Whitney U between two groups, kept integer-exact by working
    in DOUBLED midranks (ties get the average rank — a .5 in the
    classic formulation — so ``2*midrank`` is always an int):
    ``u2_a = 2*R_a - n_a*(n_a+1)`` where ``R_a`` is group A's doubled
    rank sum over the pooled ordering. The nonparametric
    did-the-distribution-shift test a curation pipeline runs next to KS
    (:func:`ks_drift_ds`). One row: n_a, n_b, r2_a, u2_a, u2_b
    (``u2_a + u2_b == 2*n_a*n_b`` always — the built-in invariant).

    Scale shape: same bounded dataflow as :func:`ks_drift_ds` — a
    (group, value) count combiner, one distinct-cell groupby (guarded),
    and the rank arithmetic runs once on the bounded grid."""

    def cell_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "g": batch.column(group_col).cast(pa.string()),
                "v": batch.column(value_col).cast(pa.int64()),
            }
        )
        agg = t.group_by(["g", "v"]).aggregate([("v", "count")])
        return pa.table(
            {
                "g": agg.column("g"),
                "v": agg.column("v"),
                "n_p": agg.column("v_count").cast(pa.int64()),
            }
        )

    cells = (
        ds.select_columns([group_col, value_col])
        .map_batches(cell_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["g", "v"])
        .aggregate(Sum("n_p"))
        .materialize()
    )
    if cells.count() > max_cells:
        raise ValueError(f"distinct cells exceed max_cells={max_cells}")
    rows = cells.take_all()
    va, ca, vb, cb = [], [], [], []
    for r in rows:
        if r["g"] == group_a:
            va.append(int(r["v"])); ca.append(int(r["sum(n_p)"]))
        elif r["g"] == group_b:
            vb.append(int(r["v"])); cb.append(int(r["sum(n_p)"]))
    out_schema = pa.schema(
        [
            ("n_a", pa.int64()),
            ("n_b", pa.int64()),
            ("r2_a", pa.int64()),
            ("u2_a", pa.int64()),
            ("u2_b", pa.int64()),
        ]
    )
    va, ca = np.asarray(va, np.int64), np.asarray(ca, np.int64)
    vb, cb = np.asarray(vb, np.int64), np.asarray(cb, np.int64)
    allv = np.unique(np.concatenate((va, vb)))
    na_at = np.zeros(len(allv), np.int64)
    nb_at = np.zeros(len(allv), np.int64)
    na_at[np.searchsorted(allv, va)] = ca
    nb_at[np.searchsorted(allv, vb)] = cb
    tot = na_at + nb_at
    cum = np.cumsum(tot)
    before = cum - tot
    # doubled midrank of a tie run [before+1 .. before+t]: (2*before + t + 1)
    mid2 = 2 * before + tot + 1
    n_a, n_b = int(ca.sum()), int(cb.sum())
    r2_a = int((mid2 * na_at).sum())
    u2_a = r2_a - n_a * (n_a + 1)
    u2_b = 2 * n_a * n_b - u2_a
    return ray.data.from_arrow(
        pa.table(
            {
                "n_a": pa.array([n_a], pa.int64()),
                "n_b": pa.array([n_b], pa.int64()),
                "r2_a": pa.array([r2_a], pa.int64()),
                "u2_a": pa.array([u2_a], pa.int64()),
                "u2_b": pa.array([u2_b], pa.int64()),
            }
        )
        if n_a and n_b
        else pa.table({f.name: pa.array([], f.type) for f in out_schema})
    )


def assoc_rules_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    type_col: str = "event_type",
    gap_us: int = 1_800_000_000,
    n_buckets: int = 512,
    min_support: int = 1,
) -> Dataset:
    """Association rules (Apriori level 2) over 30-min-gap sessions: for
    every ORDERED pair of event types co-occurring in a session, the rule
    ``antecedent -> consequent`` with its session counts and the two
    classic integer-exact metrics — ``conf_e6 = 1e6*n_both // n_ante``
    and ``lift_e6 = 1e6*n_both*S // (n_ante*n_cons)`` (S = total
    sessions). The recommendation/market-basket staple next to
    :func:`session_baskets_ds` (which stops at raw pair counts).

    Scale shape: ONE ``mix64(user) % n_buckets`` shuffle; each bucket
    emits pre-combined TAGGED partials — pair counts, per-type session
    marginals, and a session-count row — so the global exchange moves
    O(|types|^2) rows per bucket. The rule table itself is
    type-domain-squared-sized: the only driver materialization."""
    out_schema = pa.schema(
        [
            ("antecedent", pa.string()),
            ("consequent", pa.string()),
            ("n_ante", pa.int64()),
            ("n_cons", pa.int64()),
            ("n_both", pa.int64()),
            ("n_sessions", pa.int64()),
            ("conf_e6", pa.int64()),
            ("lift_e6", pa.int64()),
        ]
    )
    part_schema = pa.schema(
        [
            ("kind", pa.string()),
            ("ta", pa.string()),
            ("tb", pa.string()),
            ("n_p", pa.int64()),
        ]
    )

    def project(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(k) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(k, pa.int64()),
                "t": batch.column(ts_col).cast(pa.int64()),
                "e": batch.column(tie_col).cast(pa.int64()),
                "ty": batch.column(type_col).cast(pa.string()),
            }
        )

    def partials(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in part_schema})
        if group.num_rows == 0:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        e = group.column("e").to_numpy(zero_copy_only=False)
        ty = group.column("ty").to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((e, t, k))
        ks, ts_, tys = k[order], t[order], ty[order]
        new_user = np.concatenate(([True], ks[1:] != ks[:-1]))
        brk = new_user | np.concatenate(([True], (ts_[1:] - ts_[:-1]) > gap_us))
        sess = np.cumsum(brk) - 1
        n_sessions = int(sess[-1]) + 1
        # distinct (session, type)
        o2 = np.lexsort((tys, sess))
        ss, tt = sess[o2], tys[o2]
        keep = np.concatenate(([True], (ss[1:] != ss[:-1]) | (tt[1:] != tt[:-1])))
        ss, tt = ss[keep], tt[keep]
        # per-type marginals (sessions containing the type)
        mt, mc = np.unique(tt, return_counts=True)
        kinds = ["total"] + ["type"] * len(mt)
        tas = [""] + list(mt)
        tbs = [""] * (1 + len(mt))
        nps = [n_sessions] + [int(c) for c in mc]
        # within-session ordered pairs (a != b): expand a<b then mirror
        seg_new = np.concatenate(([True], ss[1:] != ss[:-1]))
        starts = np.flatnonzero(seg_new)
        lens = np.diff(np.concatenate((starts, [len(ss)])))
        local = np.arange(len(ss)) - np.repeat(starts, lens)
        rep = (np.repeat(lens, lens) - 1 - local).astype(np.int64)
        total = int(rep.sum())
        if total:
            a_idx = np.repeat(np.arange(len(ss)), rep)
            base = np.cumsum(rep) - rep
            off = np.arange(total, dtype=np.int64) - np.repeat(base, rep)
            b_idx = a_idx + 1 + off
            ta = np.concatenate((tt[a_idx], tt[b_idx]))
            tb = np.concatenate((tt[b_idx], tt[a_idx]))
            po = np.lexsort((tb, ta))
            tas_p, tbs_p = ta[po], tb[po]
            pnew = np.concatenate(
                ([True], (tas_p[1:] != tas_p[:-1]) | (tbs_p[1:] != tbs_p[:-1]))
            )
            pstarts = np.flatnonzero(pnew)
            kinds += ["pair"] * len(pstarts)
            tas += list(tas_p[pstarts])
            tbs += list(tbs_p[pstarts])
            nps += list(
                np.diff(np.concatenate((pstarts, [2 * total]))).astype(np.int64)
            )
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "ta": pa.array(tas, pa.string()),
                "tb": pa.array(tbs, pa.string()),
                "n_p": pa.array(np.asarray(nps, np.int64), pa.int64()),
            }
        )

    combined = (
        events.select_columns([key_col, ts_col, tie_col, type_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(partials, batch_format="pyarrow")
        .groupby(["kind", "ta", "tb"])
        .aggregate(Sum("n_p"))
        .take_all()  # O(|types|^2) rows — the rule table's own size
    )
    total_s = 0
    marg: dict = {}
    pairs: dict = {}
    for r in combined:
        n = int(r["sum(n_p)"])
        if r["kind"] == "total":
            total_s += n
        elif r["kind"] == "type":
            marg[r["ta"]] = marg.get(r["ta"], 0) + n
        else:
            key = (r["ta"], r["tb"])
            pairs[key] = pairs.get(key, 0) + n
    rows = {f.name: [] for f in out_schema}
    for (a, b), n_ab in sorted(pairs.items()):
        if n_ab < min_support:
            continue
        na, nb = marg[a], marg[b]
        rows["antecedent"].append(a)
        rows["consequent"].append(b)
        rows["n_ante"].append(na)
        rows["n_cons"].append(nb)
        rows["n_both"].append(n_ab)
        rows["n_sessions"].append(total_s)
        rows["conf_e6"].append(1_000_000 * n_ab // na)
        rows["lift_e6"].append(1_000_000 * n_ab * total_s // (na * nb))
    return ray.data.from_arrow(
        pa.table({f.name: pa.array(rows[f.name], f.type) for f in out_schema})
    )


def snapshot_diff_ds(
    old: Dataset,
    new: Dataset,
    key_col: str,
    value_cols: Sequence[str],
    n_buckets: int = 512,
) -> Dataset:
    """CDC snapshot diff: compare two keyed snapshots (<= 1 row per key
    per side — asserted) and emit ONLY the delta — ``added`` (key only in
    new), ``removed`` (only in old), ``changed`` (both sides, value hash
    differs). Values compare via a 63-bit ``md5_u64`` over the
    ``'|'``-joined string casts of ``value_cols`` (-1 = side absent) —
    the post-recrawl / post-recompute "what actually moved" audit that
    lets a 100 TB pipeline reprocess deltas instead of full snapshots.

    Scale shape: each side projects to ``(key, h63)`` per batch (rows
    never widen), then ONE ``mix64(key) % n_buckets`` co-group shuffle;
    inside the bucket a single lexsort segments keys and the
    added/removed/changed classification is pure vector compares.
    Unchanged keys — the overwhelming majority in practice — are dropped
    inside the bucket, so the output exchange is delta-sized."""
    out_schema = pa.schema(
        [
            ("key", pa.int64()),
            ("status", pa.string()),
            ("old_h63", pa.int64()),
            ("new_h63", pa.int64()),
        ]
    )
    mask63 = (1 << 63) - 1

    def project(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            k = batch.column(key_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            if n == 0:
                return pa.table(
                    {
                        "bkt": pa.array([], pa.int64()),
                        "key": pa.array([], pa.int64()),
                        "side": pa.array([], pa.int64()),
                        "h63": pa.array([], pa.int64()),
                    }
                )
            cols = [
                batch.column(c).cast(pa.string()).to_pylist() for c in value_cols
            ]
            h = np.fromiter(
                (
                    ts.md5_u64("|".join(v if v is not None else "" for v in vs))
                    & mask63
                    for vs in zip(*cols)
                ),
                np.int64,
                count=n,
            )
            return pa.table(
                {
                    "bkt": pa.array(
                        (_mix64(k) % np.uint64(n_buckets)).astype(np.int64),
                        pa.int64(),
                    ),
                    "key": pa.array(k, pa.int64()),
                    "side": pa.array(np.full(n, side, np.int64), pa.int64()),
                    "h63": pa.array(h, pa.int64()),
                }
            )

        return fn

    tagged = old.map_batches(
        project(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        new.map_batches(project(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def diff(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows == 0:
            return empty
        k = group.column("key").to_numpy(zero_copy_only=False)
        s = group.column("side").to_numpy(zero_copy_only=False)
        h = group.column("h63").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, k))
        ks, ss, hs = k[order], s[order], h[order]
        new_key = np.concatenate(([True], ks[1:] != ks[:-1]))
        starts = np.flatnonzero(new_key)
        lens = np.diff(np.concatenate((starts, [len(ks)])))
        if (lens > 2).any():
            bad = ks[starts[lens > 2]][:3]
            raise ValueError(
                f"snapshot invariant violated: keys {bad.tolist()} have "
                "multiple rows on one side"
            )
        both = lens == 2
        if both.any() and (ss[starts[both]] == ss[starts[both] + 1]).any():
            raise ValueError("snapshot invariant violated: duplicate side rows")
        old_h = np.full(len(starts), -1, np.int64)
        new_h = np.full(len(starts), -1, np.int64)
        solo = lens == 1
        solo_old = solo & (ss[starts] == 0)
        solo_new = solo & (ss[starts] == 1)
        old_h[solo_old] = hs[starts[solo_old]]
        new_h[solo_new] = hs[starts[solo_new]]
        old_h[both] = hs[starts[both]]
        new_h[both] = hs[starts[both] + 1]
        status = np.where(
            solo_new, "added", np.where(solo_old, "removed", "changed")
        ).astype(object)
        delta = solo_new | solo_old | (both & (old_h != new_h))
        return pa.table(
            {
                "key": pa.array(ks[starts[delta]], pa.int64()),
                "status": pa.array(status[delta], pa.string()),
                "old_h63": pa.array(old_h[delta], pa.int64()),
                "new_h63": pa.array(new_h[delta], pa.int64()),
            }
        )

    return _anchor_schema(
        tagged.groupby("bkt").map_groups(diff, batch_format="pyarrow"),
        out_schema,
    )


def throttle_events_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    window_us: int = 3_600_000_000,
    n_buckets: int = 512,
) -> Dataset:
    """Debounce / throttle compaction: keep the FIRST event (ts ASC,
    tie ASC) per ``(key, tumbling window)`` — the crawl-politeness /
    notification-dedup primitive. Fixed epoch-aligned windows (not
    gap-chained) keep the kept-set a pure per-window function both
    engines reproduce.

    Scale shape: per-batch vectorized argmin combiner cuts each block to
    one row per (key, window) before ONE ``mix64(key) % n_buckets``
    shuffle; the same argmin runs in-bucket. Payload columns ride along;
    no per-key Python."""

    def block_first(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        tie = batch.column(tie_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = t // window_us
        order = np.lexsort((tie, t, w, k))
        ks, ws = k[order], w[order]
        first = np.concatenate(([True], (ks[1:] != ks[:-1]) | (ws[1:] != ws[:-1])))
        return batch.take(pa.array(order[first]))

    def add_bucket(batch: pa.Table) -> pa.Table:
        reduced = block_first(batch)
        if reduced.num_rows == 0:
            return reduced.append_column("bkt", pa.array([], pa.int64()))
        k = reduced.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        bkt = (_mix64(k) % np.uint64(n_buckets)).astype(np.int64)
        return reduced.append_column("bkt", pa.array(bkt))

    reduced = events.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_first(group: pa.Table) -> pa.Table:
        return block_first(group.drop_columns(["bkt"]))

    ev_schema = pa.schema(
        [
            pa.field(n, t)
            for n, t in zip(events.schema().names, events.schema().types)
        ]
    )
    return _anchor_schema(
        reduced.groupby("bkt").map_groups(bucket_first, batch_format="pyarrow"),
        ev_schema,
    )


def decayed_sum_ds(
    events: Dataset,
    anchor_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    halflife_us: int = 86_400_000_000,
    n_buckets: int = 512,
) -> Dataset:
    """Exponential time-decay aggregate, INTEGER-EXACT: per key,
    ``sum(v_cents // 2^age)`` where ``age = (anchor - ts) // halflife``
    (whole half-lives elapsed at the fixed ``anchor_us``) — the recency-
    weighted engagement score behind freshness ranking, with the decay
    floor applied PER ROW so the sum is order-independent and the SQL
    twin bit-exact. Ages are clipped at 62 (decayed to 0 in int64).

    Scale shape: per-batch combiner sums decayed cents per key -> one
    combined row per key per block -> ``groupby(key).sum``. Raw events
    never shuffle."""

    def combiner(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "key": pa.array([], pa.int64()),
                    "d": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0).astype(np.int64)
        age = np.clip((anchor_us - t) // halflife_us, 0, 62).astype(np.int64)
        dec = cents // (np.int64(1) << age)
        uk, inv = np.unique(k, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, dec)
        cnts = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(uk, pa.int64()),
                "d": pa.array(sums, pa.int64()),
                "n": pa.array(cnts, pa.int64()),
            }
        )

    out = (
        events.select_columns([key_col, ts_col, value_col])
        .map_batches(combiner, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("d"), Sum("n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch.column("key"),
                "decayed_cents": batch.column("sum(d)").cast(pa.int64()),
                "n_events": batch.column("sum(n)").cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def chi2_assoc_ds(
    ds: Dataset,
    col_a: str = "lang",
    col_b: str = "source",
) -> Dataset:
    """Chi-squared association between two categorical columns — the
    drift / dependence audit ("did the language mix shift per source?"),
    INTEGER-EXACT: per cell the statistic is
    ``contrib_e6 = 1e6 * (O*N - R*C)^2 // (R*C*N)`` (all integers —
    Python bigints here, HUGEINT in the SQL twin; no float chi2).
    Emits one row per cell of the FULL observed-category cross product
    (zero-observed cells included — they contribute ``(0-E)^2/E = E``,
    without which a perfect association would understate chi2); the
    total statistic is the column sum.

    Scale shape: contingency combiner (one row per cell per block) ->
    ONE tiny-domain groupby; the marginals and the statistic run on the
    materialized cell table (bounded by the category-domain product)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select([col_a, col_b])
            .append_column("n", pa.array(np.ones(batch.num_rows, dtype=np.int64)))
            .group_by([col_a, col_b])
            .aggregate([("n", "sum")])
        )
        return pa.table(
            {col_a: g.column(col_a), col_b: g.column(col_b), "n": g.column("n_sum")}
        )

    cells = _small_df(
        ds.select_columns([col_a, col_b])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([col_a, col_b])
        .aggregate(Sum("n")),
        {col_a: object, col_b: object, "sum(n)": np.int64},
    )  # tiny: one row per observed cell
    obs = {
        (ai, bi): int(oi)
        for ai, bi, oi in zip(cells[col_a], cells[col_b], cells["sum(n)"])
    }
    n_tot = sum(obs.values())
    row_tot: Dict[str, int] = {}
    col_tot: Dict[str, int] = {}
    for (ai, bi), oi in obs.items():
        row_tot[ai] = row_tot.get(ai, 0) + oi
        col_tot[bi] = col_tot.get(bi, 0) + oi
    a_out, b_out, o_out, exp_e3, contrib_e6 = [], [], [], [], []
    for ai in sorted(row_tot):
        for bi in sorted(col_tot):
            oi = obs.get((ai, bi), 0)
            rc = row_tot[ai] * col_tot[bi]
            d = oi * n_tot - rc
            a_out.append(ai)
            b_out.append(bi)
            o_out.append(oi)
            exp_e3.append(rc * 1000 // n_tot)
            contrib_e6.append(1_000_000 * d * d // (rc * n_tot))
    return ray.data.from_arrow(
        pa.table(
            {
                col_a: pa.array(a_out, pa.string()),
                col_b: pa.array(b_out, pa.string()),
                "observed": pa.array(o_out, pa.int64()),
                "expected_e3": pa.array(exp_e3, pa.int64()),
                "contrib_e6": pa.array(contrib_e6, pa.int64()),
            }
        )
    )


def trending_ds(
    events: Dataset,
    k: int = 3,
    ts_col: str = "ts",
    type_col: str = "event_type",
    width_us: int = 3_600_000_000,
) -> Dataset:
    """Trending items: the top-``k`` event types per tumbling window
    (count DESC, type ASC ties) — the hourly-leaderboard shape. Emits
    ``(window_start_us, event_type, n, rank)``.

    Scale shape: per-batch (window, type) count combiner -> ONE
    groupby over the bounded (windows x types) domain -> per-window
    top-k inside ``map_groups`` on the window key (group count =
    windows in range, a report-style bound; the per-group table is
    |types|-sized)."""

    def partial(batch: pa.Table) -> pa.Table:
        ts_v = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (ts_v // width_us) * width_us
        t = pa.table(
            {
                "window_start_us": pa.array(w, pa.int64()),
                type_col: batch.column(type_col),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by(["window_start_us", type_col]).aggregate([("n", "sum")])
        return pa.table(
            {
                "window_start_us": g.column("window_start_us"),
                type_col: g.column(type_col),
                "n": g.column("n_sum"),
            }
        )

    counts = (
        events.select_columns([ts_col, type_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["window_start_us", type_col])
        .aggregate(Sum("n"))
    )

    out_schema = pa.schema(
        [
            ("window_start_us", pa.int64()),
            (type_col, pa.string()),
            ("n", pa.int64()),
            ("rank", pa.int64()),
        ]
    )

    def topk(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        n = group.column("sum(n)").to_numpy(zero_copy_only=False)
        types = np.asarray(group.column(type_col).to_pylist(), dtype=object)
        order = np.lexsort((types, -n))[:k]
        return pa.table(
            {
                "window_start_us": group.column("window_start_us").take(
                    pa.array(order)
                ),
                type_col: pa.array(types[order], pa.string()),
                "n": pa.array(n[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return _anchor_schema(
        counts.groupby("window_start_us").map_groups(topk, batch_format="pyarrow"),
        out_schema,
    )


def robust_scale_ds(
    ds: Dataset,
    value_col: str,
    id_col: str,
    group_col: str = "source",
    max_domain_broadcast: int = 5_000_000,
) -> Dataset:
    """Per-group robust scaling — ``(v - median) / IQR`` in e6, the
    outlier-insensitive normalization feature pipelines prefer over
    z-scores. INTEGER-EXACT: median/quartiles use the 1-based
    ``percentile_disc`` rank ``(p*n + 99) // 100`` over the bounded
    per-group value CDF, and the scaled value truncates toward zero
    (``sign * (|v-med| * 1e6 // iqr)``) to match SQL integer division.
    Groups whose IQR is 0 scale by 1 (flag column marks them).

    Scale shape: one (group, value)-count combiner -> bounded-domain
    groupby (guarded) -> the tiny per-group cutoff table broadcasts in
    the closure -> one streaming scale pass. Raw rows never shuffle."""

    def vc_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "g": batch.column(group_col),
                "v": batch.column(value_col).cast(pa.int64()),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by(["g", "v"]).aggregate([("n", "sum")])
        return pa.table(
            {"g": g.column("g"), "v": g.column("v"), "n": g.column("n_sum")}
        )

    hist = (
        ds.select_columns([group_col, value_col])
        .map_batches(vc_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["g", "v"])
        .aggregate(Sum("n"))
        .materialize()
    )
    if hist.count() > max_domain_broadcast:
        raise ValueError(
            f"(group, value) domain ({hist.count()}) exceeds "
            f"max_domain_broadcast={max_domain_broadcast}"
        )
    df = (
        _small_df(hist, {"g": object, "v": np.int64, "sum(n)": np.int64})
        .sort_values(["g", "v"])
        .reset_index(drop=True)
    )
    cuts: Dict[str, Tuple[int, int]] = {}
    for gname, sub in df.groupby("g", sort=False):
        vals = sub["v"].to_numpy(dtype=np.int64)
        cnts = sub["sum(n)"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        pick = lambda p: int(vals[np.searchsorted(cum, (p * n + 99) // 100)])
        med = pick(50)
        iqr = pick(75) - pick(25)
        cuts[str(gname)] = (med, iqr)
    cuts_ref = ray.put(cuts)

    def scale(batch: pa.Table) -> pa.Table:
        c = ray.get(cuts_ref)
        v = batch.column(value_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        gl = batch.column(group_col).to_pylist()
        med = np.fromiter((c[g][0] for g in gl), np.int64, count=len(gl))
        iqr = np.fromiter((c[g][1] for g in gl), np.int64, count=len(gl))
        zero_iqr = iqr == 0
        denom = np.maximum(iqr, 1)
        d = v - med
        scaled = np.sign(d) * (np.abs(d) * 1_000_000 // denom)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                group_col: batch.column(group_col),
                value_col: pa.array(v, pa.int64()),
                "median_v": pa.array(med, pa.int64()),
                "iqr": pa.array(iqr, pa.int64()),
                "scaled_e6": pa.array(scaled.astype(np.int64), pa.int64()),
                "zero_iqr": pa.array(zero_iqr.astype(np.int64), pa.int64()),
            }
        )

    return ds.select_columns([id_col, group_col, value_col]).map_batches(
        scale, batch_format="pyarrow", zero_copy_batch=True
    )


def keyness_ds(
    docs: Dataset,
    k: int = 5,
    text_col: str = "text",
    group_col: str = "source",
    max_vocab_broadcast: int = 5_000_000,
) -> Dataset:
    """Per-source DISTINCTIVE terms (keyness): for every (source, term),
    the integer lift of the term's in-source rate over its
    rest-of-corpus rate — ``lift_e6 = c_s * T_rest * 1e6 //
    ((c_rest + 1) * T_s)`` (add-one on the rest count so
    source-exclusive terms stay finite) — and the top-``k`` terms per
    source by (lift DESC, term ASC). The "what characterizes this
    source" exploration op.

    Scale shape: one (source, term) combiner -> Heaps'-bounded groupby;
    per-term corpus totals derive from that same table (second small
    groupby) and broadcast under a guard; scoring streams over the
    (source, term) rows with per-block per-source top-k partials, and
    only ``sources x block-k`` candidate rows reach the driver final.
    Products are checked against int64 range and fall back to Python
    bigints (the SQL twin is HUGEINT throughout)."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        srcs = batch.column(group_col).to_pylist()
        toks = [(t or "").split(" ") for t in texts]
        lens = [len(t) for t in toks]
        if not texts:
            return pa.table(
                {
                    "s": pa.array([], pa.string()),
                    "term": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks]).astype(str)
        si = np.repeat(np.asarray(srcs, dtype=object), lens).astype(str)
        order = np.lexsort((flat, si))
        si, flat = si[order], flat[order]
        first = np.concatenate(([True], (si[1:] != si[:-1]) | (flat[1:] != flat[:-1])))
        starts = np.flatnonzero(first)
        cnt = np.diff(np.concatenate((starts, [len(si)])))
        return pa.table(
            {
                "s": pa.array(si[starts].astype(object), pa.string()),
                "term": pa.array(flat[starts].astype(object), pa.string()),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    st = (
        docs.select_columns([group_col, text_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["s", "term"])
        .aggregate(Sum("c"))
        .materialize()
    )
    if st.count() > max_vocab_broadcast:
        raise ValueError(
            f"(source, term) domain ({st.count()}) exceeds "
            f"max_vocab_broadcast={max_vocab_broadcast}"
        )

    def term_tot_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"term": batch.column("term"), "ct": batch.column("sum(c)")}
        )

    tt = _small_df(
        st.map_batches(term_tot_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("ct")),
        {"term": object, "sum(ct)": np.int64},
    )
    terms_sorted = np.asarray(tt["term"].tolist(), dtype=object).astype(str)
    ct_sorted = tt["sum(ct)"].to_numpy(dtype=np.int64)
    o = np.argsort(terms_sorted, kind="stable")
    terms_sorted, ct_sorted = terms_sorted[o], ct_sorted[o]

    def src_tot_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["s", "sum(c)"]).group_by("s").aggregate([("sum(c)", "sum")])
        return pa.table({"s": g.column("s"), "ts": g.column("sum(c)_sum")})

    stot = {
        r["s"]: int(r["sum(ts)"])
        for r in st.map_batches(
            src_tot_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("s")
        .aggregate(Sum("ts"))
        .take_all()
    }
    T = sum(stot.values())
    ref = ray.put((terms_sorted, ct_sorted, stot, T))

    def score_topk(batch: pa.Table) -> pa.Table:
        vt, vc, s_tot, T_all = ray.get(ref)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.string()),
                    "term": pa.array([], pa.string()),
                    "c_s": pa.array([], pa.int64()),
                    "lift_e6": pa.array([], pa.int64()),
                }
            )
        srcs = batch.column("s").to_pylist()
        terms = np.asarray(batch.column("term").to_pylist(), dtype=object).astype(str)
        cs = batch.column("sum(c)").to_numpy(zero_copy_only=False).astype(np.int64)
        ctot = vc[np.searchsorted(vt, terms)]
        crest = ctot - cs
        ts_arr = np.fromiter((s_tot[s] for s in srcs), np.int64, count=len(srcs))
        trest = T_all - ts_arr
        # int64 overflow guard: fall back to Python bigints when needed
        if len(cs) and int(cs.max()) * int(trest.max()) > (1 << 62) // 1_000_000:
            lift = np.fromiter(
                (
                    int(a) * int(b) * 1_000_000 // ((int(r) + 1) * int(t))
                    for a, b, r, t in zip(cs, trest, crest, ts_arr)
                ),
                np.int64,
                count=len(cs),
            )
        else:
            lift = cs * trest * 1_000_000 // ((crest + 1) * ts_arr)
        # per-block per-source top-k partial
        order = np.lexsort((terms, -lift))
        keep_idx = []
        seen: Dict[str, int] = {}
        for i in order:
            s = srcs[i]
            if seen.get(s, 0) < k:
                seen[s] = seen.get(s, 0) + 1
                keep_idx.append(i)
        keep_idx = np.asarray(keep_idx, dtype=np.int64)
        return pa.table(
            {
                "s": pa.array([srcs[i] for i in keep_idx], pa.string()),
                "term": pa.array(terms[keep_idx].astype(object), pa.string()),
                "c_s": pa.array(cs[keep_idx], pa.int64()),
                "lift_e6": pa.array(lift[keep_idx], pa.int64()),
            }
        )

    cands = _ensure_cols(
        st.map_batches(
            score_topk, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas(),  # sources x block-k rows, tiny
        {"s": object, "term": object, "c_s": np.int64, "lift_e6": np.int64},
    )
    rows = []
    for s, sub in cands.groupby("s", sort=True):
        sub = sub.sort_values(
            ["lift_e6", "term"], ascending=[False, True]
        ).head(k)
        for rk, (_, r) in enumerate(sub.iterrows(), 1):
            rows.append((s, r["term"], int(r["c_s"]), int(r["lift_e6"]), rk))
    return ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "term": pa.array([r[1] for r in rows], pa.string()),
                "c_s": pa.array([r[2] for r in rows], pa.int64()),
                "lift_e6": pa.array([r[3] for r in rows], pa.int64()),
                "rank": pa.array([r[4] for r in rows], pa.int64()),
            }
        )
    )


def rolling_active_ds(
    events: Dataset,
    window_days: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> Dataset:
    """Trailing-``window_days`` active users per observed day (the
    WAU/rolling-DAU report): for each day present in the data, the
    EXACT count of distinct users active on any of the preceding
    ``window_days`` days (inclusive).

    Scale shape: per-batch distinct-(user, day) combiner -> ONE
    ``groupby(user, day)`` dedup; each surviving pair expands to the
    ``window_days`` window-end days it contributes to (bounded x7 row
    growth), filtered against the broadcast observed-day set (tiny —
    days in range), re-deduped by a second combiner-backed groupby, and
    counted per day. Raw events shuffle never; only (user, day) pairs."""

    def _dedup2(u: np.ndarray, d: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        # distinct (u, d) pairs without bit packing (safe for any int64 id)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        first = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (d[1:] != d[:-1]))
        ) if len(u) else np.zeros(0, bool)
        return u[first], d[first]

    def pair_partial(batch: pa.Table) -> pa.Table:
        ts_v = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = batch.column(user_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = ts_v // 86_400_000_000
        uu, dd = _dedup2(u, d)
        return pa.table({"u": pa.array(uu, pa.int64()), "d": pa.array(dd, pa.int64())})

    pairs = (
        events.select_columns([user_col, ts_col])
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "d"])
        .aggregate(Count())
        .materialize()
    )
    days = sorted({r["d"] for r in pairs.select_columns(["d"]).take_all()})
    days_ref = ray.put(np.asarray(days, dtype=np.int64))

    def expand(batch: pa.Table) -> pa.Table:
        obs = ray.get(days_ref)
        u = batch.column("u").to_numpy(zero_copy_only=False)
        d = batch.column("d").to_numpy(zero_copy_only=False)
        n = len(u)
        w = np.arange(window_days, dtype=np.int64)
        wd = (d[:, None] + w[None, :]).ravel()
        uu = np.repeat(u, window_days)
        keep = np.isin(wd, obs)
        wd, uu = wd[keep], uu[keep]
        uu, wd = _dedup2(uu, wd)
        return pa.table(
            {"u": pa.array(uu, pa.int64()), "wd": pa.array(wd, pa.int64())}
        )

    contrib = (
        pairs.select_columns(["u", "d"])
        .map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "wd"])
        .aggregate(Count())
    )

    def day_partial(batch: pa.Table) -> pa.Table:
        wd = batch.column("wd").to_numpy(zero_copy_only=False)
        uw, cnt = np.unique(wd, return_counts=True)
        return pa.table(
            {"day": pa.array(uw, pa.int64()), "n": pa.array(cnt.astype(np.int64))}
        )

    out = (
        contrib.map_batches(day_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum("n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": batch.column("day").cast(pa.int64()),
                "wau": batch.column("sum(n)").cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def time_to_convert_ds(
    events: Dataset,
    from_type: str = "view",
    to_type: str = "purchase",
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    n_buckets: int = 512,
) -> Dataset:
    """Funnel latency: per user, the time from the FIRST ``from_type``
    event to the first ``to_type`` event at-or-after it — the
    time-to-convert metric product analytics medians over. Emits one row
    per converting user: ``(user_id, t_from_us, t_to_us, delta_us)``.

    Scale shape: events project to the two types only (pre-exchange
    filter), then ONE ``mix64(user) % n_buckets`` shuffle; in-bucket one
    lexsort + segmented first-of-type scans (vectorized min over segment
    positions) — no per-user Python, no global sort."""

    def project(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.is_in(
                batch.column(type_col),
                value_set=pa.array([from_type, to_type]),
            )
        )
        k = t.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "ts_us": t.column(ts_col).cast(pa.int64()),
                "is_to": pa.array(
                    pc.equal(t.column(type_col), pa.scalar(to_type)).to_numpy(
                        zero_copy_only=False
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "bkt": pa.array(
                    (_mix64(k) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("t_from_us", pa.int64()),
            ("t_to_us", pa.int64()),
            ("delta_us", pa.int64()),
        ]
    )

    def bucket_convert(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        k = group.column("k").to_numpy(zero_copy_only=False)
        t = group.column("ts_us").to_numpy(zero_copy_only=False)
        is_to = group.column("is_to").to_numpy(zero_copy_only=False)
        order = np.lexsort((t, k))
        k, t, is_to = k[order], t[order], is_to[order]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        seg_len = np.diff(np.concatenate((starts, [len(k)])))
        big = np.int64(1 << 62)
        # first from-event ts per user: mask to-events to +inf, reduceat min
        t_from = np.minimum.reduceat(np.where(is_to == 0, t, big), starts)
        # first to-event at-or-after that: compare each row to its
        # segment's t_from, mask the rest, reduceat min again — all
        # vectorized, no per-user Python
        t_from_e = np.repeat(t_from, seg_len)
        to_ok = (is_to == 1) & (t >= t_from_e)
        t_to = np.minimum.reduceat(np.where(to_ok, t, big), starts)
        keep = (t_from < big) & (t_to < big)
        ku, fa, ta = k[starts][keep], t_from[keep], t_to[keep]
        return pa.table(
            {
                key_col: pa.array(ku, pa.int64()),
                "t_from_us": pa.array(fa, pa.int64()),
                "t_to_us": pa.array(ta, pa.int64()),
                "delta_us": pa.array(ta - fa, pa.int64()),
            }
        )

    projected = events.select_columns([key_col, ts_col, type_col]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    return _anchor_schema(
        projected.groupby("bkt").map_groups(bucket_convert, batch_format="pyarrow"),
        out_schema,
    )


def changepoint_ds(
    events: Dataset,
    ts_col: str = "ts",
    type_col: str = "event_type",
    width_us: int = 86_400_000_000,
) -> Dataset:
    """CUSUM changepoint per event type over its per-window counts,
    INTEGER-EXACT: with window counts ``x_1..x_n`` (every window in the
    type's [min, max] span, zeros included) and total ``S``, the scaled
    cumulative deviation ``cum_k = n * prefix_k - k * S`` (the usual
    ``prefix_k - k*S/n`` times ``n``, so it stays integer); the
    changepoint is the window maximizing ``|cum_k|`` (earliest wins
    ties). Emits ``(event_type, n_windows, change_window_us,
    max_dev_scaled)`` — the ops-monitoring "when did the rate shift"
    primitive.

    Scale shape: per-batch (type, window) count combiner -> bounded
    (types x windows) groupby -> the per-type scan runs on the
    materialized report-sized table."""

    def partial(batch: pa.Table) -> pa.Table:
        ts_v = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (ts_v // width_us) * width_us
        t = pa.table(
            {
                type_col: batch.column(type_col),
                "w": pa.array(w, pa.int64()),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by([type_col, "w"]).aggregate([("n", "sum")])
        return pa.table(
            {
                type_col: g.column(type_col),
                "w": g.column("w"),
                "n": g.column("n_sum"),
            }
        )

    df = (
        events.select_columns([ts_col, type_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([type_col, "w"])
        .aggregate(Sum("n"))
        .to_pandas()  # report-sized: types x windows
    )
    df = _ensure_cols(df, {type_col: object, "w": np.int64, "sum(n)": np.int64})
    types_out, nw_out, cw_out, dev_out = [], [], [], []
    for tname, sub in df.groupby(type_col, sort=True):
        w = sub["w"].to_numpy(dtype=np.int64)
        c = sub["sum(n)"].to_numpy(dtype=np.int64)
        lo, hi = int(w.min()), int(w.max())
        span = np.arange(lo, hi + width_us, width_us, dtype=np.int64)
        x = np.zeros(len(span), dtype=np.int64)
        x[(w - lo) // width_us] = c
        n = len(span)
        S = int(x.sum())
        prefix = np.cumsum(x)
        kk = np.arange(1, n + 1, dtype=np.int64)
        cum = n * prefix - kk * S
        i = int(np.argmax(np.abs(cum)))  # earliest max (argmax is first)
        types_out.append(tname)
        nw_out.append(n)
        cw_out.append(int(span[i]))
        dev_out.append(int(abs(cum[i])))
    return ray.data.from_arrow(
        pa.table(
            {
                type_col: pa.array(types_out, pa.string()),
                "n_windows": pa.array(nw_out, pa.int64()),
                "change_window_us": pa.array(cw_out, pa.int64()),
                "max_dev_scaled": pa.array(dev_out, pa.int64()),
            }
        )
    )


def revenue_by_nation_ds(
    lineitem: Dataset,
    orders: Dataset,
    customer: Dataset,
    nation: Dataset,
    max_lookup_rows: int = 50_000_000,
) -> Dataset:
    """TPC-H-Q5-style multi-join report: revenue
    ``sum(floor(extendedprice * (1 - discount) * 100))`` per customer
    nation — the star-plus-one-fact-to-fact shape that exercises BOTH
    join strategies: lineitem ⨝ orders is the big-big bucketed hash
    join (:func:`hash_join_ds`, one exchange each side), while
    customer -> nation attach by broadcast lookup (``ray.put`` once,
    guarded by ``max_lookup_rows``). Revenue quantizes to cents via the
    identical IEEE double product on both engines.

    Scale shape: both fact tables pre-project to 2-3 columns before the
    exchange; the joined stream feeds a per-batch nation combiner, so
    the final groupby moves one row per nation per block."""

    def li_proj(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey").cast(pa.int64()),
                "rev_e2": pa.array(rev, pa.int64()),
            }
        )

    def o_proj(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
                "o_custkey": batch.column("o_custkey").cast(pa.int64()),
            }
        )

    li = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_proj, batch_format="pyarrow", zero_copy_batch=True)
    od = orders.select_columns(["o_orderkey", "o_custkey"]).map_batches(
        o_proj, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = hash_join_ds(li, od, "l_orderkey", "o_orderkey", how="inner")

    n_cust = customer.count()
    if n_cust > max_lookup_rows:
        raise ValueError(
            f"customer side ({n_cust} rows) exceeds max_lookup_rows="
            f"{max_lookup_rows}; use a second bucketed join"
        )
    cdf = _ensure_cols(
        customer.select_columns(["c_custkey", "c_nationkey"]).to_pandas(),
        {"c_custkey": np.int64, "c_nationkey": np.int64},
    )
    ckeys = cdf["c_custkey"].to_numpy(dtype=np.int64)
    cnat = cdf["c_nationkey"].to_numpy(dtype=np.int64)
    o = np.argsort(ckeys, kind="stable")
    ckeys, cnat = ckeys[o], cnat[o]
    ndf = _ensure_cols(
        nation.select_columns(["n_nationkey", "n_name"]).to_pandas(),
        {"n_nationkey": np.int64, "n_name": object},
    )
    # nation keys are small ints: direct-index name table
    nkeys = ndf["n_nationkey"].to_numpy(dtype=np.int64)
    names_tbl = np.empty(int(nkeys.max()) + 1 if len(nkeys) else 0, dtype=object)
    names_tbl[nkeys] = ndf["n_name"].to_numpy(dtype=object)
    cust_ref = ray.put((ckeys, cnat, names_tbl))

    def nation_partial(batch: pa.Table) -> pa.Table:
        ck_s, cn_s, nm_tbl = ray.get(cust_ref)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        rev = batch.column("rev_e2").to_numpy(zero_copy_only=False)
        names = nm_tbl[cn_s[np.searchsorted(ck_s, ck)]]
        t = pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "rev": pa.array(rev, pa.int64()),
                "n": pa.array(np.ones(len(ck), dtype=np.int64)),
            }
        )
        g = t.group_by("n_name").aggregate([("rev", "sum"), ("n", "sum")])
        return pa.table(
            {
                "n_name": g.column("n_name"),
                "rev": g.column("rev_sum"),
                "n": g.column("n_sum"),
            }
        )

    out = (
        joined.map_batches(nation_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name")
        .aggregate(Sum("rev"), Sum("n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": batch.column("n_name"),
                "revenue_e2": batch.column("sum(rev)").cast(pa.int64()),
                "n_lineitems": batch.column("sum(n)").cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def symbolize_ds(
    events: Dataset,
    ts_col: str = "ts",
    type_col: str = "event_type",
    width_us: int = 86_400_000_000,
) -> Dataset:
    """SAX-style time-series symbolization (Lin et al. 2003, made
    integer-exact): each event type's zero-filled daily-count series
    maps to a word over {a,b,c,d} by QUARTILE breakpoints (the integer
    ``percentile_disc`` ranks over the series' own value CDF) — symbol
    ``a`` = counts <= p25, ``b`` <= p50, ``c`` <= p75, ``d`` above.
    Emits ``(event_type, n_windows, word)``; equal-length words make
    downstream motif mining a string problem.

    Scale shape: (type, window) count combiner -> bounded report-sized
    groupby -> per-type symbolization on the driver table (windows x
    types, a report bound)."""

    def partial(batch: pa.Table) -> pa.Table:
        ts_v = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (ts_v // width_us) * width_us
        t = pa.table(
            {
                type_col: batch.column(type_col),
                "w": pa.array(w, pa.int64()),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by([type_col, "w"]).aggregate([("n", "sum")])
        return pa.table(
            {
                type_col: g.column(type_col),
                "w": g.column("w"),
                "n": g.column("n_sum"),
            }
        )

    df = (
        events.select_columns([ts_col, type_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([type_col, "w"])
        .aggregate(Sum("n"))
        .to_pandas()
    )
    df = _ensure_cols(df, {type_col: object, "w": np.int64, "sum(n)": np.int64})
    types_out, nw_out, word_out = [], [], []
    for tname, sub in df.groupby(type_col, sort=True):
        w = sub["w"].to_numpy(dtype=np.int64)
        c = sub["sum(n)"].to_numpy(dtype=np.int64)
        lo, hi = int(w.min()), int(w.max())
        span = np.arange(lo, hi + width_us, width_us, dtype=np.int64)
        x = np.zeros(len(span), dtype=np.int64)
        x[(w - lo) // width_us] = c
        n = len(x)
        vals = np.sort(x)
        pick = lambda p: int(vals[min((p * n + 99) // 100, n) - 1])
        p25, p50, p75 = pick(25), pick(50), pick(75)
        sym = np.full(n, "d", dtype=object)
        sym[x <= p75] = "c"
        sym[x <= p50] = "b"
        sym[x <= p25] = "a"
        types_out.append(tname)
        nw_out.append(n)
        word_out.append("".join(sym.tolist()))
    return ray.data.from_arrow(
        pa.table(
            {
                type_col: pa.array(types_out, pa.string()),
                "n_windows": pa.array(nw_out, pa.int64()),
                "word": pa.array(word_out, pa.string()),
            }
        )
    )


def weighted_median_ds(
    docs: Dataset,
    value_col: str = "n_chars",
    weight_from_text: bool = True,
    text_col: str = "text",
    max_domain_broadcast: int = 5_000_000,
) -> Dataset:
    """Token-mass-weighted median document length — "half the corpus
    TOKENS live in docs shorter than this": the curation statistic that
    differs sharply from the doc-count median on heavy-tailed corpora.
    Emits one row ``(wmedian, total_weight, plain_median, n_docs)``:
    the smallest value whose cumulative token weight reaches
    ``(S + 1) // 2``, alongside the unweighted ``percentile_disc(50)``
    for contrast. Integer-exact.

    Scale shape: one (value, count, weight) combiner -> bounded
    value-domain groupby (guarded) -> the two scalars come off the
    driver CDF."""

    def vc_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        if weight_from_text:
            texts = batch.column(text_col)
            wgt = (
                pc.add(pc.count_substring(texts, " "), 1)
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
        else:
            wgt = v
        t = pa.table(
            {
                "v": pa.array(v, pa.int64()),
                "c": pa.array(np.ones(len(v), dtype=np.int64)),
                "wt": pa.array(wgt, pa.int64()),
            }
        )
        g = t.group_by("v").aggregate([("c", "sum"), ("wt", "sum")])
        return pa.table(
            {
                "v": g.column("v"),
                "c": g.column("c_sum"),
                "wt": g.column("wt_sum"),
            }
        )

    cols = [value_col, text_col] if weight_from_text else [value_col]
    hist = (
        docs.select_columns(cols)
        .map_batches(vc_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .aggregate(Sum("c"), Sum("wt"))
        .materialize()
    )
    if hist.count() > max_domain_broadcast:
        raise ValueError("value domain exceeds max_domain_broadcast")
    df = (
        _small_df(
            hist, {"v": np.int64, "sum(c)": np.int64, "sum(wt)": np.int64}
        )
        .sort_values("v")
        .reset_index(drop=True)
    )
    if len(df) == 0:  # empty corpus: no median exists — zero-row report
        return ray.data.from_arrow(
            pa.table(
                {
                    "wmedian": pa.array([], pa.int64()),
                    "total_weight": pa.array([], pa.int64()),
                    "plain_median": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        )
    vals = df["v"].to_numpy(dtype=np.int64)
    cnts = df["sum(c)"].to_numpy(dtype=np.int64)
    wts = df["sum(wt)"].to_numpy(dtype=np.int64)
    cum_c = np.cumsum(cnts)
    cum_w = np.cumsum(wts)
    n = int(cum_c[-1])
    S = int(cum_w[-1])
    wmed = int(vals[np.searchsorted(cum_w, (S + 1) // 2)])
    pmed = int(vals[np.searchsorted(cum_c, (50 * n + 99) // 100)])
    return ray.data.from_arrow(
        pa.table(
            {
                "wmedian": pa.array([wmed], pa.int64()),
                "total_weight": pa.array([S], pa.int64()),
                "plain_median": pa.array([pmed], pa.int64()),
                "n_docs": pa.array([n], pa.int64()),
            }
        )
    )


def running_peak_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    value_col: str = "value",
    quant: int = 100,
    n_buckets: int = 512,
) -> Dataset:
    """Per-key running MAXIMUM ordered by (ts, tie) — the high-watermark
    / peak-exposure window (``MAX(v) OVER (PARTITION BY key ORDER BY
    ts, id)``), the cummax sibling of :func:`running_total_ds`. Values
    quantize to ``floor(v * quant)`` int64 on both engines.

    Scale shape: identical to running_total — ONE ``mix64(key)``
    bucket shuffle of the 4-column projection, in-bucket lexsort +
    segmented ``np.maximum.accumulate``."""

    def project(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        v_e = np.floor(v * quant).astype(np.int64)
        bkt = (_mix64(k) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                tie_col: batch.column(tie_col).cast(pa.int64()),
                key_col: pa.array(k, pa.int64()),
                "ts_us": batch.column(ts_col).cast(pa.int64()),
                "v_e": pa.array(v_e, pa.int64()),
                "bkt": pa.array(bkt, pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            pa.field(tie_col, pa.int64()),
            pa.field(key_col, pa.int64()),
            pa.field("run_peak_e", pa.int64()),
        ]
    )

    def bucket_cummax(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        import pandas as pd

        k = group.column(key_col).to_numpy(zero_copy_only=False)
        t = group.column("ts_us").to_numpy(zero_copy_only=False)
        tie = group.column(tie_col).to_numpy(zero_copy_only=False)
        v = group.column("v_e").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, t, k))
        ks, vs = k[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        seg_id = np.zeros(len(ks), dtype=np.int64)
        seg_id[starts] = 1
        seg_id = np.cumsum(seg_id) - 1
        # per-segment cummax, vectorized in C via the pandas grouped
        # cumulative kernel (segments are contiguous after the lexsort)
        run = pd.Series(vs).groupby(seg_id).cummax().to_numpy()
        return pa.table(
            {
                tie_col: pa.array(tie[order], pa.int64()),
                key_col: pa.array(ks, pa.int64()),
                "run_peak_e": pa.array(run.astype(np.int64), pa.int64()),
            }
        )

    projected = events.select_columns(
        [key_col, ts_col, tie_col, value_col]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return _anchor_schema(
        projected.groupby("bkt").map_groups(bucket_cummax, batch_format="pyarrow"),
        out_schema,
    )


def periodicity_ds(
    events: Dataset,
    max_lag: int = 14,
    ts_col: str = "ts",
    type_col: str = "event_type",
    width_us: int = 86_400_000_000,
) -> Dataset:
    """Seasonality detection, INTEGER-EXACT: per event type, the lag in
    ``[2, max_lag]`` maximizing the raw autocorrelation
    ``ac(lag) = sum(x_t * x_{t+lag})`` over the zero-filled daily-count
    series (raw product, not mean-centered — deterministic integers on
    both engines; the argmax is what matters, earliest lag on ties).
    Emits ``(event_type, n_windows, best_lag, ac_best)``.

    Scale shape: (type, window) count combiner -> report-sized groupby
    -> driver scan (windows x types x max_lag products on the tiny
    report table)."""

    def partial(batch: pa.Table) -> pa.Table:
        ts_v = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (ts_v // width_us) * width_us
        t = pa.table(
            {
                type_col: batch.column(type_col),
                "w": pa.array(w, pa.int64()),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by([type_col, "w"]).aggregate([("n", "sum")])
        return pa.table(
            {
                type_col: g.column(type_col),
                "w": g.column("w"),
                "n": g.column("n_sum"),
            }
        )

    df = (
        events.select_columns([ts_col, type_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([type_col, "w"])
        .aggregate(Sum("n"))
        .to_pandas()
    )
    df = _ensure_cols(df, {type_col: object, "w": np.int64, "sum(n)": np.int64})
    types_out, nw_out, lag_out, ac_out = [], [], [], []
    for tname, sub in df.groupby(type_col, sort=True):
        w = sub["w"].to_numpy(dtype=np.int64)
        c = sub["sum(n)"].to_numpy(dtype=np.int64)
        lo, hi = int(w.min()), int(w.max())
        span = np.arange(lo, hi + width_us, width_us, dtype=np.int64)
        x = np.zeros(len(span), dtype=np.int64)
        x[(w - lo) // width_us] = c
        n = len(x)
        best_lag, best_ac = 0, -1
        for lag in range(2, min(max_lag, n - 1) + 1):
            ac = int((x[:-lag] * x[lag:]).sum())
            if ac > best_ac:
                best_lag, best_ac = lag, ac
        if best_ac < 0:  # series too short for any lag — no row (SQL twin)
            continue
        types_out.append(tname)
        nw_out.append(n)
        lag_out.append(best_lag)
        ac_out.append(int(best_ac))
    return ray.data.from_arrow(
        pa.table(
            {
                type_col: pa.array(types_out, pa.string()),
                "n_windows": pa.array(nw_out, pa.int64()),
                "best_lag": pa.array(lag_out, pa.int64()),
                "ac_best": pa.array(ac_out, pa.int64()),
            }
        )
    )


def gap_fill_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    width_us: int = 86_400_000_000,
    quant: int = 100,
    n_buckets: int = 512,
) -> Dataset:
    """LOCF gap fill (time-series densification): per key, one row for
    EVERY window in the key's [first, last] observed span, carrying the
    last observed value forward across missing windows — the
    feature-store densification step before windowed model features. A
    window's observed value is the MAX of its quantized event values
    (deterministic under ties); emitted rows carry an ``observed``
    flag. Row growth is bounded by the per-key span, not the corpus.

    Scale shape: a per-batch (key, window) max combiner cuts each block
    to one row per (key, window) before ONE ``mix64(key)`` bucket
    shuffle; in-bucket the span expansion + forward fill is one
    searchsorted per key segment (vectorized via np.repeat /
    cumulative indices, no per-key Python loop)."""

    def combiner(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts_v = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        w = (ts_v // width_us) * width_us
        v_e = np.floor(v * quant).astype(np.int64)
        t = pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "w": pa.array(w, pa.int64()),
                "v": pa.array(v_e, pa.int64()),
            }
        )
        g = t.group_by(["k", "w"]).aggregate([("v", "max")])
        k2 = g.column("k").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": g.column("k"),
                "w": g.column("w"),
                "v": g.column("v_max"),
                "bkt": pa.array(
                    (_mix64(k2) % np.uint64(n_buckets)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("window_us", pa.int64()),
            ("value_e", pa.int64()),
            ("observed", pa.int64()),
        ]
    )

    def fill(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        k = group.column("k").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, k))
        k, w, v = k[order], w[order], v[order]
        # second in-bucket max-merge across blocks (combiner already did
        # per-block): contiguous (k, w) dups reduce to their max
        dup = np.concatenate(([False], (k[1:] == k[:-1]) & (w[1:] == w[:-1])))
        if dup.any():
            import pandas as pd

            seg = np.cumsum(~dup) - 1
            v = pd.Series(v).groupby(seg).max().to_numpy()
            keep = ~dup
            k, w = k[keep], w[keep]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        ends = np.concatenate((starts[1:], [len(k)]))
        lo = w[starts]
        hi = w[ends - 1]
        n_out = ((hi - lo) // width_us + 1).astype(np.int64)
        total = int(n_out.sum())
        key_out = np.repeat(k[starts], n_out)
        # window grid per key: global arange minus per-key offsets
        idx = np.arange(total, dtype=np.int64)
        key_base = np.repeat(np.concatenate(([0], np.cumsum(n_out)[:-1])), n_out)
        step = idx - key_base
        win_out = np.repeat(lo, n_out) + step * width_us
        # forward fill: for each output window, the latest observed
        # window <= it within the same key — observed windows are a
        # prefix-ordered subsequence, so one global searchsorted over
        # per-key offset-composed positions does every key at once
        obs_pos_in_key = (w - np.repeat(lo, ends - starts)) // width_us
        obs_global = obs_pos_in_key + np.repeat(key_base[np.cumsum(n_out) - n_out], ends - starts)
        src = np.searchsorted(obs_global, idx, side="right") - 1
        val_out = v[src]
        observed = np.zeros(total, dtype=np.int64)
        observed[obs_global] = 1
        return pa.table(
            {
                key_col: pa.array(key_out, pa.int64()),
                "window_us": pa.array(win_out, pa.int64()),
                "value_e": pa.array(val_out, pa.int64()),
                "observed": pa.array(observed, pa.int64()),
            }
        )

    projected = events.select_columns([key_col, ts_col, value_col]).map_batches(
        combiner, batch_format="pyarrow", zero_copy_batch=True
    )
    return _anchor_schema(
        projected.groupby("bkt").map_groups(fill, batch_format="pyarrow"),
        out_schema,
    )


# floor(log10(1 + 1/d) * 1e9) for d = 1..9, precomputed so BOTH engines
# compare against the same integer constants (no runtime libm in either).
_BENFORD_E9 = (
    301029995, 176091259, 124938736, 96910013, 79181246,
    66946789, 57991946, 51152522, 45757490,
)


def benford_audit_ds(
    orders: Dataset,
    value_col: str = "o_totalprice",
    quant: int = 100,
) -> Dataset:
    """Benford first-significant-digit audit — the classic fraud /
    data-quality screen over a monetary column: observed count and
    e9-quantized share per leading digit next to the Benford expectation
    ``log10(1 + 1/d)`` (hard-coded e9 constants, identical in the SQL
    twin), plus the absolute deviation. Integer-exact throughout:
    values quantize to ``floor(v * quant)`` and the share is
    ``n * 1e9 // total``.

    Scale shape: per-batch digit extraction (decimal-string slice on the
    Arrow side, no per-row Python) + a 9-row combiner; the only exchange
    is the 9-key groupby. Output is 9 rows regardless of input size."""

    def digit_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        cents = pa.array(np.floor(v * quant).astype(np.int64), pa.int64())
        first = pc.utf8_slice_codeunits(pc.cast(cents, pa.string()), 0, 1)
        t = pa.table(
            {
                "digit": pc.cast(first, pa.int64()),
                "n": pa.array(np.ones(len(v), dtype=np.int64)),
            }
        )
        return t.group_by("digit").aggregate([("n", "sum")]).rename_columns(
            ["digit", "n"]
        )

    hist = (
        orders.select_columns([value_col])
        .map_batches(digit_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("digit")
        .aggregate(Sum("n"))
        .materialize()
    )
    df = (
        _small_df(hist, {"digit": np.int64, "sum(n)": np.int64})
        .sort_values("digit")
        .reset_index(drop=True)
    )
    digits = df["digit"].to_numpy(dtype=np.int64)
    counts = df["sum(n)"].to_numpy(dtype=np.int64)
    total = int(counts.sum())
    share = counts * 1_000_000_000 // max(total, 1)
    bexp = np.array(
        [_BENFORD_E9[d - 1] for d in digits], dtype=np.int64
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "digit": pa.array(digits, pa.int64()),
                "n": pa.array(counts, pa.int64()),
                "share_e9": pa.array(share, pa.int64()),
                "benford_e9": pa.array(bexp, pa.int64()),
                "dev_e9": pa.array(np.abs(share - bexp), pa.int64()),
            }
        )
    )


def spearman_corr_ds(
    docs: Dataset,
    x_col: str = "n_chars",
    text_col: str = "text",
    max_domain_broadcast: int = 5_000_000,
) -> Dataset:
    """Spearman rank correlation between document length (``x_col``) and
    whitespace token count — emitted as the EXACT integer components
    ``(n, num, denx, deny)`` of the tie-corrected formula over DOUBLED
    average ranks (``2 * avg_rank`` is always an integer, so every term
    stays in int64 and ``rho = num / sqrt(denx * deny)`` is the reader's
    one float). No global sort: ranks come from the value-count
    histograms (avg rank of value v = count_before + (count(v)+1)/2),
    and the cross term from the JOINT (x, y) histogram — one combiner
    ``map_batches`` + one bounded-domain groupby, guarded like
    :func:`weighted_median_ds`."""

    def xy_partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).cast(pa.int64())
        y = pc.add(
            pc.count_substring(batch.column(text_col), " "), 1
        ).cast(pa.int64())
        t = pa.table(
            {
                "x": x,
                "y": y,
                "c": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        return t.group_by(["x", "y"]).aggregate([("c", "sum")]).rename_columns(
            ["x", "y", "c"]
        )

    joint = (
        docs.select_columns([x_col, text_col])
        .map_batches(xy_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["x", "y"])
        .aggregate(Sum("c"))
        .materialize()
    )
    if joint.count() > max_domain_broadcast:
        raise ValueError("joint value domain exceeds max_domain_broadcast")
    df = _small_df(
        joint, {"x": np.int64, "y": np.int64, "sum(c)": np.int64}
    )
    xs = df["x"].to_numpy(dtype=np.int64)
    ys = df["y"].to_numpy(dtype=np.int64)
    cs = df["sum(c)"].to_numpy(dtype=np.int64)
    n = int(cs.sum())

    def doubled_ranks(vals: np.ndarray) -> dict:
        # doubled average rank per distinct value: 2*cum_before + cnt + 1
        uq, inv = np.unique(vals, return_inverse=True)
        cnt = np.zeros(len(uq), dtype=np.int64)
        np.add.at(cnt, inv, cs)
        cum_before = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        r2 = 2 * cum_before + cnt + 1
        return {"uq": uq, "inv": inv, "r2": r2}

    rx = doubled_ranks(xs)
    ry = doubled_ranks(ys)
    r2x = rx["r2"][rx["inv"]]
    r2y = ry["r2"][ry["inv"]]
    sxy = int(np.sum(cs * r2x * r2y))
    sx = int(np.sum(cs * r2x))
    sy = int(np.sum(cs * r2y))
    sxx = int(np.sum(cs * r2x * r2x))
    syy = int(np.sum(cs * r2y * r2y))
    return ray.data.from_arrow(
        pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "num": pa.array([n * sxy - sx * sy], pa.int64()),
                "denx": pa.array([n * sxx - sx * sx], pa.int64()),
                "deny": pa.array([n * syy - sy * sy], pa.int64()),
            }
        )
    )


def time_weighted_avg_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    value_col: str = "value",
    quant: int = 100,
    n_buckets: int = 512,
) -> Dataset:
    """Per-key TIME-weighted average of a step signal (LOCF between
    events): each event's cents-quantized value weighted by the
    microseconds until the key's next event. Emitted as the exact
    integer pair ``(twa_num, twa_den)`` (num = sum v_e * dt_us,
    den = span_us) plus ``n_events`` — the reader's division is the
    only float. Single-event keys get (0, 0, 1).

    Scale shape: one ``mix64(key)`` bucket shuffle of the 4-column
    projection; in-bucket lexsort + segment-boundary diff, per-key sums
    via one ``np.add.reduceat`` — no per-key Python."""

    def project(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: pa.array(k, pa.int64()),
                "ts_us": batch.column(ts_col).cast(pa.int64()),
                tie_col: batch.column(tie_col).cast(pa.int64()),
                "v_e": pa.array(np.floor(v * quant).astype(np.int64), pa.int64()),
                "bkt": pa.array(
                    (_mix64(k) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    out_schema = pa.schema(
        [
            pa.field(key_col, pa.int64()),
            pa.field("twa_num", pa.int64()),
            pa.field("twa_den", pa.int64()),
            pa.field("n_events", pa.int64()),
        ]
    )

    def bucket_twa(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        t = group.column("ts_us").to_numpy(zero_copy_only=False)
        tie = group.column(tie_col).to_numpy(zero_copy_only=False)
        v = group.column("v_e").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, t, k))
        ks, ts_s, vs = k[order], t[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        # dt to the NEXT event within the key; last event of a key gets 0
        dt = np.concatenate((ts_s[1:] - ts_s[:-1], [0]))
        ends = np.concatenate((starts[1:], [len(ks)]))
        dt[ends - 1] = 0
        num = np.add.reduceat(vs * dt, starts)
        den = ts_s[ends - 1] - ts_s[starts]
        cnt = ends - starts
        return pa.table(
            {
                key_col: pa.array(ks[starts], pa.int64()),
                "twa_num": pa.array(num.astype(np.int64), pa.int64()),
                "twa_den": pa.array(den.astype(np.int64), pa.int64()),
                "n_events": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    projected = events.select_columns(
        [key_col, ts_col, tie_col, value_col]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return _anchor_schema(
        projected.groupby("bkt").map_groups(bucket_twa, batch_format="pyarrow"),
        out_schema,
    )


def gini_concentration_ds(
    docs: Dataset,
    text_col: str = "text",
    max_domain_broadcast: int = 5_000_000,
) -> Dataset:
    """Gini coefficient of token mass across documents — "how unequal is
    the corpus": one row ``(n, total, gini_num)`` where
    ``gini = gini_num / (n * total)`` and
    ``gini_num = sum_i (2i - n - 1) * x_(i)`` over the ASCENDING-sorted
    per-doc token counts. Tie-stable (equal values make the within-block
    order irrelevant) and integer-exact.

    Scale shape: no global sort — the sorted-index sum collapses onto the
    value-count histogram (a value v with count c after F smaller items
    contributes ``v * c * (2F + c - n)``), so the job is one combiner
    ``map_batches`` + a bounded value-domain groupby (guarded)."""

    def tok_partial(batch: pa.Table) -> pa.Table:
        y = pc.add(
            pc.count_substring(batch.column(text_col), " "), 1
        ).cast(pa.int64())
        t = pa.table(
            {"v": y, "c": pa.array(np.ones(batch.num_rows, dtype=np.int64))}
        )
        return t.group_by("v").aggregate([("c", "sum")]).rename_columns(["v", "c"])

    hist = (
        docs.select_columns([text_col])
        .map_batches(tok_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .aggregate(Sum("c"))
        .materialize()
    )
    if hist.count() > max_domain_broadcast:
        raise ValueError("value domain exceeds max_domain_broadcast")
    df = (
        _small_df(hist, {"v": np.int64, "sum(c)": np.int64})
        .sort_values("v")
        .reset_index(drop=True)
    )
    vals = df["v"].to_numpy(dtype=np.int64)
    cnts = df["sum(c)"].to_numpy(dtype=np.int64)
    n = int(cnts.sum())
    total = int(np.sum(vals * cnts))
    before = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    gini_num = int(np.sum(vals * cnts * (2 * before + cnts - n)))
    return ray.data.from_arrow(
        pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "total": pa.array([total], pa.int64()),
                "gini_num": pa.array([gini_num], pa.int64()),
            }
        )
    )


def sentence_stats_ds(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Per-document sentence segmentation stats: split on the RE2 class
    ``[.!?]+`` (pyarrow and DuckDB both run RE2, so the twins segment
    identically), space-trim each segment, drop empties, and emit
    ``(doc_id, n_sentences, max_sent_tokens, sum_sent_tokens)``. Docs
    with zero non-empty segments emit no row (mirrors the SQL GROUP BY).

    Scale shape: pure per-batch Arrow kernels (split -> flatten with
    parent indices -> trim -> masked segment reductions via
    np.maximum/add.reduceat); embarrassingly parallel, no exchange."""

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("n_sentences", pa.int64()),
            pa.field("max_sent_tokens", pa.int64()),
            pa.field("sum_sent_tokens", pa.int64()),
        ]
    )

    def stats(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        segs = pc.split_pattern_regex(batch.column(text_col), "[.!?]+")
        segs = segs.combine_chunks() if isinstance(segs, pa.ChunkedArray) else segs
        offsets = segs.offsets.to_numpy(zero_copy_only=False)
        flat = pc.utf8_trim(segs.flatten(), " ")
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        toks = (
            pc.add(pc.count_substring(flat, " "), 1)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        parent = np.repeat(
            np.arange(len(ids), dtype=np.int64), np.diff(offsets)
        )
        parent = parent[nonempty]
        toks = toks[nonempty]
        if len(parent) == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        starts = np.flatnonzero(
            np.concatenate(([True], parent[1:] != parent[:-1]))
        )
        return pa.table(
            {
                id_col: pa.array(ids[parent[starts]], pa.int64()),
                "n_sentences": pa.array(
                    np.diff(np.concatenate((starts, [len(parent)]))).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
                "max_sent_tokens": pa.array(
                    np.maximum.reduceat(toks, starts).astype(np.int64), pa.int64()
                ),
                "sum_sent_tokens": pa.array(
                    np.add.reduceat(toks, starts).astype(np.int64), pa.int64()
                ),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    )


def type_cross_corr_ds(
    events: Dataset,
    ts_col: str = "ts",
    type_col: str = "event_type",
    width_us: int = 86_400_000_000,
) -> Dataset:
    """Cross-correlation matrix of the per-type DAILY count series —
    which event types move together: for every unordered type pair
    (a <= b, diagonal included) the raw integer dot product
    ``sum_w n_a(w) * n_b(w)`` over the days where both are observed,
    plus the common-day count. Zero-filled days contribute nothing to a
    dot product, so only observed (type, window) cells matter and the
    result is integer-exact with no span bookkeeping.

    Scale shape: one (type, window) count combiner -> report-sized
    groupby (|types| x days) -> driver pair scan over the tiny table;
    documents-scale data never shuffles."""

    def cnt_partial(batch: pa.Table) -> pa.Table:
        w = pc.multiply(
            pc.divide(batch.column(ts_col).cast(pa.int64()), width_us),
            pa.scalar(width_us, pa.int64()),
        )
        t = pa.table(
            {
                "et": batch.column(type_col),
                "w": w,
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        return t.group_by(["et", "w"]).aggregate([("n", "sum")]).rename_columns(
            ["et", "w", "n"]
        )

    cells = (
        events.select_columns([ts_col, type_col])
        .map_batches(cnt_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["et", "w"])
        .aggregate(Sum("n"))
        .materialize()
    )
    df = _small_df(
        cells, {"et": object, "w": np.int64, "sum(n)": np.int64}
    )
    ets = df["et"].to_numpy(dtype=object).astype(str)
    ws = df["w"].to_numpy(dtype=np.int64)
    ns = df["sum(n)"].to_numpy(dtype=np.int64)
    types = np.unique(ets)
    uw = np.unique(ws)
    mat = np.zeros((len(types), len(uw)), dtype=np.int64)
    ti = np.searchsorted(types, ets)
    wi = np.searchsorted(uw, ws)
    mat[ti, wi] = ns
    rows_a, rows_b, dots, commons = [], [], [], []
    for i in range(len(types)):
        for j in range(i, len(types)):
            both = (mat[i] > 0) & (mat[j] > 0)
            if not both.any():
                continue
            rows_a.append(types[i])
            rows_b.append(types[j])
            dots.append(int(np.sum(mat[i][both] * mat[j][both])))
            commons.append(int(both.sum()))
    return ray.data.from_arrow(
        pa.table(
            {
                "type_a": pa.array(rows_a, pa.string()),
                "type_b": pa.array(rows_b, pa.string()),
                "dot": pa.array(dots, pa.int64()),
                "n_common": pa.array(commons, pa.int64()),
            }
        )
    )


def k_anonymity_ds(
    customer: Dataset,
    k: int = 10,
    l_div: int = 3,
    bucket_cents: int = 100_000,
) -> Dataset:
    """k-anonymity / l-diversity audit over the customer table's
    quasi-identifier combo (nation, market segment) — the privacy gate
    run before releasing or joining user-derived training data: a combo
    is k-anonymous when >= ``k`` members share it, and l-diverse when
    the sensitive attribute (account balance, bucketed to
    ``bucket_cents``) takes >= ``l_div`` distinct values inside it.
    Emits one row per observed combo: ``(c_nationkey, c_mktsegment,
    n_members, n_bal_buckets, k_anonymous, l_diverse)``.

    Scale shape: per-batch distinct (combo, bucket) combiner →
    ``groupby(combo, bucket)`` count → per-combo fold (members = sum,
    diversity = row count) in a second bounded groupby. The combo
    domain is nations x segments — tiny by construction; raw rows never
    shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nat": pa.array([], pa.int64()),
                "seg": pa.array([], pa.string()),
                "bb": pa.array([], pa.int64()),
                "n_p": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        cents = np.floor(
            batch.column("c_acctbal").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        t = pa.table(
            {
                "nat": batch.column("c_nationkey").cast(pa.int64()),
                "seg": batch.column("c_mktsegment"),
                # TRUE floor division in shifted non-negative space so the
                # SQL twin's integer `//` agrees for negative balances
                "bb": pa.array(
                    (cents + np.int64(bucket_cents) * np.int64(1 << 20))
                    // np.int64(bucket_cents)
                    - np.int64(1 << 20),
                    pa.int64(),
                ),
            }
        )
        g = t.group_by(["nat", "seg", "bb"]).aggregate([("bb", "count")])
        return pa.table(
            {
                "nat": g.column("nat"),
                "seg": g.column("seg"),
                "bb": g.column("bb"),
                "n_p": g.column("bb_count").cast(pa.int64()),
            }
        )

    cells = (
        customer.select_columns(["c_nationkey", "c_mktsegment", "c_acctbal"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["nat", "seg", "bb"])
        .aggregate(Sum("n_p"))
    )

    def fold(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "nat": batch.column("nat").cast(pa.int64()),
                "seg": batch.column("seg"),
                "n": batch.column("sum(n_p)").cast(pa.int64()),
                "one": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            }
        )
        g = t.group_by(["nat", "seg"]).aggregate([("n", "sum"), ("one", "sum")])
        return pa.table(
            {
                "nat": g.column("nat"),
                "seg": g.column("seg"),
                "n_m": g.column("n_sum").cast(pa.int64()),
                "n_b": g.column("one_sum").cast(pa.int64()),
            }
        )

    agg = (
        cells.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["nat", "seg"])
        .aggregate(Sum("n_m"), Sum("n_b"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(n_m)").cast(pa.int64()).to_numpy(zero_copy_only=False)
        nb = batch.column("sum(n_b)").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_nationkey": batch.column("nat").cast(pa.int64()),
                "c_mktsegment": batch.column("seg"),
                "n_members": pa.array(n, pa.int64()),
                "n_bal_buckets": pa.array(nb, pa.int64()),
                "k_anonymous": pa.array((n >= k).astype(np.int64), pa.int64()),
                "l_diverse": pa.array((nb >= l_div).astype(np.int64), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def ewma_running_ds(
    events: Dataset,
    max_shift: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    value_col: str = "value",
    quant: int = 100,
    n_buckets: int = 512,
) -> Dataset:
    """Per-key running exponential moving average with half-life = one
    event, in EXACT integer arithmetic: at each event (ordered by
    ``ts``, ``tie``) the decayed state is

        ``ewma_e(t) = sum over j <= t of v_e(j) >> (t - j)``

    — every term floored independently, so the value is a plain integer
    sum both engines reproduce bit-for-bit (the recursive float EWMA is
    neither order-stable nor cross-engine exact). Terms older than
    ``max_shift`` events are identically zero whenever values fit
    ``max_shift`` bits (cents < 2^30 here), so the window is finite by
    arithmetic, not truncation.

    Scale shape: the ``running_total_ds`` exchange — pruned projection
    shuffles ONCE by ``mix64(key) % n_buckets``; inside a bucket one
    lexsort then ``max_shift`` vectorized shifted adds (a loop over the
    BIT WIDTH, never over rows or keys) with segment-boundary masking.
    """

    def project(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        v_e = np.floor(v * quant).astype(np.int64)
        bkt = (_mix64(k) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                tie_col: batch.column(tie_col).cast(pa.int64()),
                key_col: pa.array(k, pa.int64()),
                "ts_us": batch.column(ts_col).cast(pa.int64()),
                "v_e": pa.array(v_e, pa.int64()),
                "bkt": pa.array(bkt, pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            pa.field(tie_col, pa.int64()),
            pa.field(key_col, pa.int64()),
            pa.field("ewma_e", pa.int64()),
        ]
    )

    def bucket_ewma(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        t = group.column("ts_us").to_numpy(zero_copy_only=False)
        tie = group.column(tie_col).to_numpy(zero_copy_only=False)
        v = group.column("v_e").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, t, k))
        ks, vs = k[order], v[order]
        n = len(ks)
        # per-row rank within its key segment (to mask cross-key shifts)
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        seg_len = np.diff(np.concatenate((starts, [n])))
        seg_id = np.repeat(np.arange(len(starts)), seg_len)
        rank = np.arange(n) - starts[seg_id]
        out = vs.copy()
        for s in range(1, max_shift + 1):
            if s >= n:
                break
            contrib = vs[:-s] >> np.int64(s)
            valid = (ks[s:] == ks[:-s]) & (rank[s:] >= s)
            out[s:] += np.where(valid, contrib, 0)
        return pa.table(
            {
                tie_col: pa.array(tie[order], pa.int64()),
                key_col: pa.array(ks, pa.int64()),
                "ewma_e": pa.array(out, pa.int64()),
            }
        )

    projected = events.select_columns(
        [key_col, ts_col, tie_col, value_col]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return _anchor_schema(
        projected.groupby("bkt").map_groups(bucket_ewma, batch_format="pyarrow"),
        out_schema,
    )


def log_histogram_ds(
    events: Dataset,
    value_col: str = "value",
    quant: int = 100,
) -> Dataset:
    """Order-of-magnitude (log2-bucket) value histogram — the heavy-tail
    audit a linear histogram hides: each event's quantized magnitude
    lands in bucket ``sign * bit_length(|cents|)`` (0 for zero), all
    integer-exact (``bit_length`` == ``length(bin(x))`` in the SQL
    twin). Emits ``(bucket, n_events, cents_sum)``.

    Scale shape: per-batch bincount combiner over the ~128 possible
    buckets, one tiny ``groupby(bucket)``. One pass, no materialization.
    """

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "cents_sum": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        cents = np.floor(
            batch.column(value_col).to_numpy(zero_copy_only=False) * quant
        ).astype(np.int64)
        mag = np.abs(cents)
        bits = _bit_length_exact(mag)
        bucket = np.where(cents < 0, -bits, bits)
        u, inv = np.unique(bucket, return_inverse=True)
        return pa.table(
            {
                "bucket": pa.array(u, pa.int64()),
                "n_events": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "cents_sum": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64), pa.int64()
                ),
            }
        )

    agg = (
        events.select_columns([value_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("n_events"), Sum("cents_sum"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": batch.column("bucket").cast(pa.int64()),
                "n_events": batch.column("sum(n_events)").cast(pa.int64()),
                "cents_sum": batch.column("sum(cents_sum)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def json_props_stats_ds(
    events: Dataset,
    type_col: str = "event_type",
    props_col: str = "props",
) -> Dataset:
    """Semi-structured property extraction + rollup — the ELT pass every
    event pipeline runs over a JSON side-channel column: pull the
    integer ``k`` property out of the ``props`` JSON string with ONE
    vectorized RE2 ``extract_regex`` (no per-row json.loads) and fold
    per event type into ``(event_type, n, k_sum, k_min, k_max)``.
    Missing / malformed props count in ``n_null`` instead of failing
    the pipeline (quarantine-as-data, never raise).

    Scale shape: extraction and the type-domain combiner run inside one
    ``map_batches``; a bounded ``groupby(event_type)`` merges. One pass,
    no shuffle of raw rows."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "n_null": pa.array([], pa.int64()),
                "k_sum": pa.array([], pa.int64()),
                "k_min": pa.array([], pa.int64()),
                "k_max": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ex = pc.extract_regex(
            pc.fill_null(batch.column(props_col), ""), r'"k":\s*(?P<k>-?\d+)'
        )
        kstr = pc.struct_field(ex, "k")
        valid = pc.is_valid(kstr).to_numpy(zero_copy_only=False)
        k = np.zeros(batch.num_rows, np.int64)
        if valid.any():
            k[valid] = (
                pc.cast(pc.drop_null(kstr), pa.int64())
                .to_numpy(zero_copy_only=False)
            )
        types = batch.column(type_col).to_numpy(zero_copy_only=False).astype(str)
        ut, inv = np.unique(types, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        n_null = np.bincount(inv, weights=~valid).astype(np.int64)
        k_sum = np.bincount(inv, weights=np.where(valid, k, 0)).astype(np.int64)
        big = np.int64(1) << 62
        k_min = np.full(len(ut), big, np.int64)
        k_max = np.full(len(ut), -big, np.int64)
        vi = inv[valid]
        if len(vi):
            np.minimum.at(k_min, vi, k[valid])
            np.maximum.at(k_max, vi, k[valid])
        return pa.table(
            {
                "event_type": pa.array(ut, pa.string()),
                "n": pa.array(n, pa.int64()),
                "n_null": pa.array(n_null, pa.int64()),
                "k_sum": pa.array(k_sum, pa.int64()),
                "k_min": pa.array(k_min, pa.int64()),
                "k_max": pa.array(k_max, pa.int64()),
            }
        )

    agg = (
        events.select_columns([type_col, props_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("n"), Sum("n_null"), Sum("k_sum"), Min("k_min"), Max("k_max"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": batch.column("sum(n)").cast(pa.int64()),
                "n_null": batch.column("sum(n_null)").cast(pa.int64()),
                "k_sum": batch.column("sum(k_sum)").cast(pa.int64()),
                "k_min": batch.column("min(k_min)").cast(pa.int64()),
                "k_max": batch.column("max(k_max)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def ab_assignment_ds(
    events: Dataset,
    convert_type: str = "purchase",
    n_arms: int = 2,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> Dataset:
    """Deterministic A/B experiment report: users hash into ``n_arms``
    md5 buckets (stable across runs, engines, cluster sizes — the same
    split rule the dataset_split family uses), and each arm reports
    ``(arm, n_users, n_converted)`` where conversion = at least one
    ``convert_type`` event. The two-proportion test statistic derives
    rationally from the two rows.

    Scale shape: per-batch distinct (user, converted-flag) combiner →
    ONE ``groupby(user)`` max-fold (a user's events may span blocks) →
    arm assignment + per-block arm counts → tiny ``groupby(arm)``. Raw
    events reduce to one row per user before the only exchange."""
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"u": pa.array([], pa.int64()), "conv": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        u = batch.column(user_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        conv = (
            pc.equal(batch.column(type_col), convert_type)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        uu, inv = np.unique(u, return_inverse=True)
        cmax = np.zeros(len(uu), np.int64)
        np.maximum.at(cmax, inv, conv)
        return pa.table(
            {"u": pa.array(uu, pa.int64()), "conv": pa.array(cmax, pa.int64())}
        )

    users = (
        events.select_columns([user_col, type_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("u")
        .aggregate(Max("conv"))
    )

    def arms(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "arm": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64()),
                "n_converted": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        u = batch.column("u").cast(pa.int64()).to_numpy(zero_copy_only=False)
        conv = batch.column("max(conv)").cast(pa.int64()).to_numpy(zero_copy_only=False)
        arm = np.asarray(
            [
                int(hashlib.md5(str(int(x)).encode()).hexdigest()[:15], 16) % n_arms
                for x in u
            ],
            np.int64,
        )
        ua, inv = np.unique(arm, return_inverse=True)
        return pa.table(
            {
                "arm": pa.array(ua, pa.int64()),
                "n_users": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "n_converted": pa.array(
                    np.bincount(inv, weights=conv).astype(np.int64), pa.int64()
                ),
            }
        )

    agg = (
        users.map_batches(arms, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("arm")
        .aggregate(Sum("n_users"), Sum("n_converted"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "arm": batch.column("arm").cast(pa.int64()),
                "n_users": batch.column("sum(n_users)").cast(pa.int64()),
                "n_converted": batch.column("sum(n_converted)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def fd_audit_ds(lineitem: Dataset) -> Dataset:
    """Functional-dependency discovery audit over lineitem — the schema
    profiling pass that tells a pipeline which columns are safe
    partition/join keys: for each declared candidate FD, the number of
    LHS groups and how many of them VIOLATE the dependency (more than
    one distinct RHS value). Audited FDs: ``orderkey -> returnflag``,
    ``orderkey -> linestatus`` (both expected dirty), and the PK check
    ``(orderkey, linenumber) -> partkey`` (expected clean). Emits
    ``(fd, n_lhs, n_violations)``.

    Scale shape: per-batch distinct (fd, lhs, rhs-code) combiner → ONE
    ``groupby`` over distinct cells → per-LHS distinct-RHS counts via a
    second aggregate-only groupby (never ``map_groups`` — LHS groups are
    near-singleton millions) → per-fd violation fold in a block
    combiner + 3-row final groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "fd": pa.array([], pa.int64()),
                "lhs": pa.array([], pa.int64()),
                "rhs": pa.array([], pa.string()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ok = batch.column("l_orderkey").cast(pa.int64())
        ln = batch.column("l_linenumber").cast(pa.int64())
        okn = ok.to_numpy(zero_copy_only=False)
        lnn = ln.to_numpy(zero_copy_only=False)
        parts = []
        for fd_id, lhs, rhs in (
            (0, okn, batch.column("l_returnflag")),
            (1, okn, batch.column("l_linestatus")),
            (2, okn * 8 + lnn, pc.cast(batch.column("l_partkey"), pa.string())),
        ):
            parts.append(
                pa.table(
                    {
                        "fd": pa.array(np.full(len(lhs), fd_id, np.int64)),
                        "lhs": pa.array(lhs, pa.int64()),
                        "rhs": rhs,
                    }
                )
            )
        t = pa.concat_tables(parts)
        return t.group_by(["fd", "lhs", "rhs"]).aggregate([])

    cells = (
        lineitem.select_columns(
            ["l_orderkey", "l_linenumber", "l_partkey", "l_returnflag", "l_linestatus"]
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["fd", "lhs", "rhs"])
        .count()
        .groupby(["fd", "lhs"])
        .count()
    )

    def fold(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "fd": pa.array([], pa.int64()),
                "n_lhs": pa.array([], pa.int64()),
                "n_violations": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        fd = batch.column("fd").cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = batch.column("count()").cast(pa.int64()).to_numpy(zero_copy_only=False)
        u, inv = np.unique(fd, return_inverse=True)
        return pa.table(
            {
                "fd": pa.array(u, pa.int64()),
                "n_lhs": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "n_violations": pa.array(
                    np.bincount(inv, weights=(d > 1)).astype(np.int64), pa.int64()
                ),
            }
        )

    agg = (
        cells.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fd")
        .aggregate(Sum("n_lhs"), Sum("n_violations"))
    )
    names = {
        0: "orderkey->returnflag",
        1: "orderkey->linestatus",
        2: "orderkey,linenumber->partkey",
    }

    def rename(batch: pa.Table) -> pa.Table:
        fd = batch.column("fd").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "fd": pa.array([names[int(x)] for x in fd], pa.string()),
                "n_lhs": batch.column("sum(n_lhs)").cast(pa.int64()),
                "n_violations": batch.column("sum(n_violations)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def _bit_length_exact(x: np.ndarray) -> np.ndarray:
    """Vectorized TRUE bit_length of positive int64s (float log2 with an
    arithmetic off-by-one correction — exact regardless of libm
    rounding)."""
    bits = np.zeros(len(x), np.int64)
    nz = x > 0
    bits[nz] = np.floor(np.log2(x[nz].astype(np.float64))).astype(np.int64) + 1
    too_hi = nz & (np.int64(1) << np.minimum(bits - 1, 62) > x)
    bits[too_hi] -= 1
    too_lo = nz & (np.int64(1) << np.minimum(bits, 62) <= x)
    bits[too_lo] += 1
    return bits


def index_gap_stats_ds(
    docs: Dataset,
    min_df: int = 2,
    max_df: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
) -> Dataset:
    """Inverted-index compression sizing — the storage estimate an IR
    infrastructure pass runs before building a posting store: per
    document-frequency, the exact varint-encoded size of all gap-encoded
    posting lists (gap_1 = first_id + 1, gap_i = id_i - id_{i-1}; varint
    bytes = ``(bit_length(gap) + 6) // 7``). Emits ``(df, n_tokens,
    total_postings, total_bytes)`` for tokens inside the df band.

    Scale shape: the ``postings_ds`` exchange — per-doc-distinct (token,
    doc) combiner, ONE ``md5(token) % n_buckets`` shuffle, in-bucket
    segment + vectorized gap/byte math (``np.add.reduceat`` per
    segment), per-df partials → tiny ``groupby(df)``."""

    def pairs_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "token": pa.array([], pa.string()),
                "d": pa.array([], pa.int64()),
                "bkt": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        toks = pc.split_pattern(pc.fill_null(batch.column(text_col), ""), " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        if len(flat) < 2:
            return empty
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(len(toks), dtype=np.int64), np.diff(offs))
        # BIGRAM terms (adjacent same-doc token pairs): unigram df is
        # stopword-flat on web text — bigrams give the long-tail df
        # spectrum an index actually stores
        same = parent[:-1] == parent[1:]
        idx = np.flatnonzero(same)
        if len(idx) == 0:
            return empty
        grams = pc.binary_join_element_wise(
            pc.take(flat, pa.array(idx, pa.int64())),
            pc.take(flat, pa.array(idx + 1, pa.int64())),
            " ",
        )
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = ids[parent[idx]]
        t = (
            pa.table({"token": grams, "d": pa.array(d, pa.int64())})
            .group_by(["token", "d"])
            .aggregate([])
        )
        gl = t.column("token").to_pylist()
        h = np.fromiter((ts.md5_u64(g) for g in gl), np.uint64, count=len(gl))
        return t.append_column(
            "bkt", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    pairs = docs.select_columns([id_col, text_col]).map_batches(
        pairs_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    part_schema = pa.schema(
        [
            ("df", pa.int64()),
            ("n_tokens", pa.int64()),
            ("total_postings", pa.int64()),
            ("total_bytes", pa.int64()),
        ]
    )

    def bucket_sizes(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in part_schema})
        if group.num_rows == 0:
            return empty
        tok = group.column("token").to_numpy(zero_copy_only=False).astype(str)
        d = group.column("d").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(tok, return_inverse=True)
        pair_key = np.unique(codes.astype(np.int64) * np.int64(2**40) + d)
        codes_u = (pair_key >> np.int64(40)).astype(np.int64)
        d_u = pair_key & (np.int64(2**40) - 1)
        seg_first = np.concatenate(([True], codes_u[1:] != codes_u[:-1]))
        seg_start = np.flatnonzero(seg_first)
        seg_len = np.diff(np.concatenate((seg_start, [len(codes_u)])))
        band = (seg_len >= min_df) & (seg_len <= max_df)
        if not band.any():
            return empty
        gaps = np.diff(np.concatenate(([0], d_u)))
        gaps[seg_start] = d_u[seg_start] + 1  # first entry: gap from -1
        vbytes = (_bit_length_exact(gaps) + 6) // 7
        seg_bytes = np.add.reduceat(vbytes, seg_start)
        dfk = seg_len[band]
        u, inv = np.unique(dfk, return_inverse=True)
        return pa.table(
            {
                "df": pa.array(u, pa.int64()),
                "n_tokens": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "total_postings": pa.array(
                    np.bincount(inv, weights=dfk).astype(np.int64), pa.int64()
                ),
                "total_bytes": pa.array(
                    np.bincount(inv, weights=seg_bytes[band]).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    agg = (
        pairs.groupby("bkt")
        .map_groups(bucket_sizes, batch_format="pyarrow")
        .groupby("df")
        .aggregate(Sum("n_tokens"), Sum("total_postings"), Sum("total_bytes"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "df": batch.column("df").cast(pa.int64()),
                "n_tokens": batch.column("sum(n_tokens)").cast(pa.int64()),
                "total_postings": batch.column("sum(total_postings)").cast(pa.int64()),
                "total_bytes": batch.column("sum(total_bytes)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def pareto_share_ds(
    events: Dataset,
    top_permille: int = 100,
    user_col: str = "user_id",
) -> Dataset:
    """Pareto concentration of event volume — "what share of traffic do
    the top 10% heaviest users generate": exact integer
    ``(n_users, n_top_users, total_events, top_events, share_ppm)``
    where the top set is the ``top_permille`` heaviest users by event
    count (count DESC, user ASC ties; ``n_top = max(1, n_users *
    top_permille // 1000)``).

    Scale shape: per-batch user-count combiner → ONE ``groupby(user)``
    sum → the (count)-histogram CDF (one row per DISTINCT count value —
    bounded domain) decides the cutoff and the tie-split EXACTLY without
    sorting users; one streaming fold computes the shares. Raw events
    never shuffle; nothing user-count-sized on the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"u": pa.array([], pa.int64()), "n_p": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        u = batch.column(user_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        uu, cnt = np.unique(u, return_counts=True)
        return pa.table(
            {
                "u": pa.array(uu, pa.int64()),
                "n_p": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    per_user = (
        events.select_columns([user_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("u")
        .aggregate(Sum("n_p"))
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"c": pa.array([], pa.int64()), "n_u": pa.array([], pa.int64())}
            )
        c = batch.column("sum(n_p)").cast(pa.int64()).to_numpy(zero_copy_only=False)
        uc, n = np.unique(c, return_counts=True)
        return pa.table(
            {
                "c": pa.array(uc, pa.int64()),
                "n_u": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    hist_rows = (
        per_user.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c")
        .aggregate(Sum("n_u"))
        .take_all()
    )  # bounded: one row per DISTINCT event count
    empty = pa.table(
        {
            "n_users": pa.array([], pa.int64()),
            "n_top_users": pa.array([], pa.int64()),
            "total_events": pa.array([], pa.int64()),
            "top_events": pa.array([], pa.int64()),
            "share_ppm": pa.array([], pa.int64()),
        }
    )
    if not hist_rows:
        return ray.data.from_arrow(empty)
    cs = np.asarray([r["c"] for r in hist_rows], np.int64)
    nu = np.asarray([r["sum(n_u)"] for r in hist_rows], np.int64)
    order = np.argsort(-cs)  # heaviest counts first
    cs, nu = cs[order], nu[order]
    n_users = int(nu.sum())
    total = int((cs * nu).sum())
    n_top = max(1, n_users * top_permille // 1000)
    cum = np.cumsum(nu)
    # take whole count-classes until n_top users are covered; the class
    # straddling the boundary contributes pro-rata WHOLE users (exact,
    # ties broken by taking the needed number — share is identical for
    # any tie-break inside an equal-count class)
    k = int(np.searchsorted(cum, n_top))
    full = int(cs[:k] @ nu[:k])
    prev = int(cum[k - 1]) if k > 0 else 0
    top_events = full + int(cs[k]) * (n_top - prev)
    share_ppm = top_events * 1_000_000 // total if total else 0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_users": pa.array([n_users], pa.int64()),
                "n_top_users": pa.array([n_top], pa.int64()),
                "total_events": pa.array([total], pa.int64()),
                "top_events": pa.array([top_events], pa.int64()),
                "share_ppm": pa.array([share_ppm], pa.int64()),
            }
        )
    )


def kendall_pairs_ds(
    events: Dataset,
    ts_col: str = "ts",
    type_col: str = "event_type",
    width_us: int = 86_400_000_000,
) -> Dataset:
    """Kendall trend components, INTEGER-EXACT: per event type over its
    OBSERVED daily-count series (windows ordered by time), the number of
    concordant, discordant, and tied pairs of (time, count) — the
    Mann-Kendall monotone-trend test's exact inputs (tau derives
    rationally as ``(C - D) / (C + D + T)``). Emits ``(event_type,
    n_windows, concordant, discordant, tied)``.

    Scale shape: the periodicity/symbolize report dataflow — (type,
    window) count combiner → report-sized groupby → driver pair scan on
    the TINY type x window table (the quadratic runs over windows of a
    report, never over events)."""

    def partial(batch: pa.Table) -> pa.Table:
        ts_v = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (ts_v // width_us) * width_us
        t = pa.table(
            {
                type_col: batch.column(type_col),
                "w": pa.array(w, pa.int64()),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by([type_col, "w"]).aggregate([("n", "sum")])
        return pa.table(
            {
                type_col: g.column(type_col),
                "w": g.column("w"),
                "n": g.column("n_sum"),
            }
        )

    df = (
        events.select_columns([ts_col, type_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([type_col, "w"])
        .aggregate(Sum("n"))
        .to_pandas()
    )
    df = _ensure_cols(df, {type_col: object, "w": np.int64, "sum(n)": np.int64})
    types_out, nw, con, dis, tie = [], [], [], [], []
    for tname, sub in df.groupby(type_col, sort=True):
        s = sub.sort_values("w")
        x = s["sum(n)"].to_numpy()
        m = len(x)
        d = x[None, :] - x[:, None]
        iu = np.triu_indices(m, 1)
        dd = d[iu]
        types_out.append(tname)
        nw.append(m)
        con.append(int((dd > 0).sum()))
        dis.append(int((dd < 0).sum()))
        tie.append(int((dd == 0).sum()))
    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(types_out, pa.string()),
                "n_windows": pa.array(nw, pa.int64()),
                "concordant": pa.array(con, pa.int64()),
                "discordant": pa.array(dis, pa.int64()),
                "tied": pa.array(tie, pa.int64()),
            }
        )
    )


def lang_fertility_ds(
    docs: Dataset,
    text_col: str = "text",
    lang_col: str = "lang",
) -> Dataset:
    """Tokenizer-fertility audit per language — the byte/char/token
    budget report run before choosing a tokenizer or a sampling mix:
    for each language the exact integers ``n_docs``, ``n_bytes`` (UTF-8
    octets), ``n_chars`` (codepoints), ``n_tokens_ws`` (whitespace
    tokens, `string_split` semantics) and ``n_tokens_bpe`` (the BPE-ish
    regex tokenizer shared with `token_stats`). Fertility ratios
    (bytes/token, chars/token, subtokens/word) derive exactly from the
    emitted integers.

    Scale shape: one streaming pass; byte/char/ws counts are pure Arrow
    kernels, the regex count is the same compiled-pattern per-batch
    loop `token_stats` uses; each block pre-aggregates to <= one row
    per language, then a language-bounded ``groupby`` sums partials."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.array([], pa.string()),
                "nd_p": pa.array([], pa.int64()),
                "nb_p": pa.array([], pa.int64()),
                "nc_p": pa.array([], pa.int64()),
                "nw_p": pa.array([], pa.int64()),
                "ns_p": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        txt = pc.fill_null(batch.column(text_col), "")
        tt = pa.table(
            {
                "lang": batch.column(lang_col),
                "nd": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
                "nb": pc.binary_length(txt).cast(pa.int64()),
                "nc": pc.utf8_length(txt).cast(pa.int64()),
                "nw": pc.list_value_length(pc.split_pattern(txt, " ")).cast(
                    pa.int64()
                ),
                "ns": pa.array(
                    ts.bpe_token_count(txt.to_pylist()), pa.int64()
                ),
            }
        )
        g = tt.group_by(["lang"]).aggregate(
            [("nd", "sum"), ("nb", "sum"), ("nc", "sum"), ("nw", "sum"), ("ns", "sum")]
        )
        return pa.table(
            {
                "lang": g.column("lang"),
                "nd_p": g.column("nd_sum").cast(pa.int64()),
                "nb_p": g.column("nb_sum").cast(pa.int64()),
                "nc_p": g.column("nc_sum").cast(pa.int64()),
                "nw_p": g.column("nw_sum").cast(pa.int64()),
                "ns_p": g.column("ns_sum").cast(pa.int64()),
            }
        )

    agg = (
        docs.select_columns([lang_col, text_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(Sum("nd_p"), Sum("nb_p"), Sum("nc_p"), Sum("nw_p"), Sum("ns_p"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch.column("lang"),
                "n_docs": batch.column("sum(nd_p)").cast(pa.int64()),
                "n_bytes": batch.column("sum(nb_p)").cast(pa.int64()),
                "n_chars": batch.column("sum(nc_p)").cast(pa.int64()),
                "n_tokens_ws": batch.column("sum(nw_p)").cast(pa.int64()),
                "n_tokens_bpe": batch.column("sum(ns_p)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def emd_lengths_ds(
    docs: Dataset,
    source_a: str = "src0",
    source_b: str = "src1",
    text_col: str = "text",
    source_col: str = "source",
) -> Dataset:
    """Exact 1-D earth-mover (Wasserstein-1) distance between two
    sources' document-length distributions — the drift INTEGRAL that
    complements the KS drift MAX (`ks_drift_ds`): small persistent
    shifts that never spike the KS statistic accumulate here. Emitted
    cross-multiplied so everything stays integer:
    ``emd = emd_num / (n_a * n_b)`` with
    ``emd_num = sum over the value grid of |cdfA*n_b - cdfB*n_a| *
    gap_to_next_value``. One row ``(n_a, n_b, emd_num)``.

    Scale shape: the ks_drift dataflow — per-batch (source, value)
    count combiner bounds the shuffle to distinct cells; the grid sweep
    runs once on the bounded distinct-value table."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.string()),
                "v": pa.array([], pa.int64()),
                "n_p": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        keep = pc.is_in(
            batch.column(source_col),
            value_set=pa.array([source_a, source_b], pa.string()),
        )
        t = batch.filter(keep)
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern(pc.fill_null(t.column(text_col), ""), " ")
        v = pc.list_value_length(toks).cast(pa.int64())
        tt = pa.table({"src": t.column(source_col), "v": v})
        g = tt.group_by(["src", "v"]).aggregate([("v", "count")])
        return pa.table(
            {
                "src": g.column("src"),
                "v": g.column("v"),
                "n_p": g.column("v_count").cast(pa.int64()),
            }
        )

    rows = (
        docs.select_columns([source_col, text_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "v"])
        .aggregate(Sum("n_p"))
        .take_all()
    )  # bounded: one row per (source, distinct length)
    empty = pa.table(
        {
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "emd_num": pa.array([], pa.int64()),
        }
    )
    if not rows:
        return ray.data.from_arrow(empty)
    grid = sorted({r["v"] for r in rows})
    fa = {v: 0 for v in grid}
    fb = {v: 0 for v in grid}
    for r in rows:
        (fa if r["src"] == source_a else fb)[r["v"]] += int(r["sum(n_p)"])
    n_a = sum(fa.values())
    n_b = sum(fb.values())
    ca = cb = 0
    emd = 0
    for i, v in enumerate(grid):
        ca += fa[v]
        cb += fb[v]
        if i + 1 < len(grid):
            emd += abs(ca * n_b - cb * n_a) * (grid[i + 1] - v)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_a": pa.array([n_a], pa.int64()),
                "n_b": pa.array([n_b], pa.int64()),
                "emd_num": pa.array([emd], pa.int64()),
            }
        )
    )


def inversion_count_ds(
    events: Dataset,
    key_col: str = "user_id",
    seq_col: str = "event_id",
    ts_col: str = "ts",
    n_buckets: int = 512,
    max_pair_chunk: int = 10_000_000,
) -> Dataset:
    """Stream order-quality audit: per user, the exact inversion count —
    pairs of events whose ingest order (``seq_col``, unique and
    monotonically assigned) contradicts their event time (``ts_col``
    strictly decreasing across the pair). ``n_inversions / n_pairs`` is
    the canonical disorder measure for deciding watermark/lateness
    budgets in a streaming ingest. Emits ``(user_id, n_events, n_pairs,
    n_inversions)`` with ``n_pairs = C(n,2)``, all exact int64.

    Scale shape: events shuffle ONCE by ``mix64(user) % n_buckets``
    (bounded group count), pruned to (user, seq, ts_us) ~24 B/row.
    Inside the bucket one lexsort segments users; pair enumeration is
    vectorized triangular indexing, processed in <= ``max_pair_chunk``
    slices so a pathological power-user bounds memory, never Python
    per-pair. The per-user pair count is quadratic BY DEFINITION of the
    statistic — the declared small-per-user-history semantics (the 100 TB
    path bounds it with a per-user event cap upstream; cf. the
    near_dup_exact declared-N contract)."""
    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("n_events", pa.int64()),
            ("n_pairs", pa.int64()),
            ("n_inversions", pa.int64()),
        ]
    )

    def project(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(k) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(k, pa.int64()),
                "s": batch.column(seq_col).cast(pa.int64()),
                "t": batch.column(ts_col).cast(pa.int64()),
            }
        )

    def count_inversions(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows == 0:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        s = group.column("s").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, k))
        ks, ts_ = k[order], t[order]
        n = ks.size
        new_user = np.concatenate(([True], ks[1:] != ks[:-1]))
        seg_id = np.cumsum(new_user) - 1
        seg_start = np.flatnonzero(new_user)
        lens = np.diff(np.concatenate((seg_start, [n])))
        pos = np.arange(n) - seg_start[seg_id]  # 0-based pos within user
        inv = np.zeros(lens.size, np.int64)
        # chunked triangular pair enumeration: second element j contributes
        # pos[j] pairs (i = seg_start..j-1)
        cum = np.concatenate(([0], np.cumsum(pos)))
        lo = 0
        while lo < n:
            hi = int(np.searchsorted(cum, cum[lo] + max_pair_chunk, side="right")) - 1
            hi = max(hi, lo + 1)
            sl = slice(lo, hi)
            cnt = pos[sl]
            j_idx = np.repeat(np.arange(lo, hi), cnt)
            base = np.repeat(seg_start[seg_id[sl]], cnt)
            run_start = np.repeat(cum[sl] - cum[lo], cnt)
            i_idx = base + (np.arange(j_idx.size) - run_start)
            bad = ts_[i_idx] > ts_[j_idx]
            if bad.any():
                inv += np.bincount(seg_id[j_idx[bad]], minlength=lens.size)
            lo = hi
        n_pairs = lens * (lens - 1) // 2
        return pa.table(
            {
                key_col: pa.array(ks[seg_start], pa.int64()),
                "n_events": pa.array(lens.astype(np.int64)),
                "n_pairs": pa.array(n_pairs.astype(np.int64)),
                "n_inversions": pa.array(inv),
            }
        )

    out = (
        events.select_columns([key_col, seq_col, ts_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(count_inversions, batch_format="pyarrow")
    )
    return _anchor_schema(out, out_schema)


def interarrival_stats_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    n_buckets: int = 512,
) -> Dataset:
    """Per-key inter-arrival gap statistics ordered by (ts, tie): gap
    count, min, discrete median (smallest gap whose cumulative count
    reaches ``ceil(0.5 * n)`` — the engine-portable integer convention
    shared with grouped_quantiles), and max, all exact int64
    microseconds. The canonical input for sizing session timeouts and
    streaming watermark budgets. Keys with fewer than two events emit
    nothing.

    Scale shape: ONE ``mix64(key) % n_buckets`` shuffle of the 3-column
    projection (bounded group count); in-bucket one lexsort segments
    keys, diffs are a single vectorized subtract, and the median is a
    second lexsort by (key, gap) + per-segment rank pick — no per-key
    Python."""
    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("n_gaps", pa.int64()),
            ("min_gap_us", pa.int64()),
            ("med_gap_us", pa.int64()),
            ("max_gap_us", pa.int64()),
        ]
    )

    def project(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(k) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(k, pa.int64()),
                "t": batch.column(ts_col).cast(pa.int64()),
                "tie": batch.column(tie_col).cast(pa.int64()),
            }
        )

    def gap_stats(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows < 2:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        tie = group.column("tie").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, t, k))
        ks, ts_ = k[order], t[order]
        same = ks[1:] == ks[:-1]
        if not same.any():
            return empty
        gaps = (ts_[1:] - ts_[:-1])[same]
        gk = ks[1:][same]
        # sort gaps by (key, gap) so per-key medians are rank picks
        g_order = np.lexsort((gaps, gk))
        gk_s, gaps_s = gk[g_order], gaps[g_order]
        new_key = np.concatenate(([True], gk_s[1:] != gk_s[:-1]))
        seg_start = np.flatnonzero(new_key)
        lens = np.diff(np.concatenate((seg_start, [gk_s.size])))
        med_idx = seg_start + np.ceil(0.5 * lens).astype(np.int64) - 1
        return pa.table(
            {
                key_col: pa.array(gk_s[seg_start], pa.int64()),
                "n_gaps": pa.array(lens.astype(np.int64)),
                "min_gap_us": pa.array(gaps_s[seg_start], pa.int64()),
                "med_gap_us": pa.array(gaps_s[med_idx], pa.int64()),
                "max_gap_us": pa.array(
                    gaps_s[seg_start + lens - 1], pa.int64()
                ),
            }
        )

    out = (
        events.select_columns([key_col, ts_col, tie_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(gap_stats, batch_format="pyarrow")
    )
    return _anchor_schema(out, out_schema)


def activity_streaks_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    day_us: int = 86_400_000_000,
    n_buckets: int = 512,
) -> Dataset:
    """Per-key activity streaks (gaps-and-islands): distinct active
    days, the longest run of CONSECUTIVE days, and the number of runs —
    the retention/engagement compaction every product warehouse
    maintains. Day = ``ts_us // day_us`` (UTC bucket), all exact int64.

    Scale shape: per-batch DISTINCT (key, day) Arrow combiner shrinks
    the exchange to active-day cells; ONE ``mix64(key)`` bucketed
    shuffle; in-bucket a lexsort + boundary masks segment keys and
    streaks, per-streak lengths come from one bincount and per-key
    maxima from ``np.maximum.reduceat`` — no per-key Python."""
    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("n_active_days", pa.int64()),
            ("max_streak", pa.int64()),
            ("n_streaks", pa.int64()),
        ]
    )

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "bkt": pa.array([], pa.int64()),
                    "k": pa.array([], pa.int64()),
                    "day": pa.array([], pa.int64()),
                }
            )
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        cells = (
            pa.table(
                {
                    "k": pa.array(k, pa.int64()),
                    "day": pa.array(t // day_us, pa.int64()),
                }
            )
            .group_by(["k", "day"])
            .aggregate([])
        )
        ku = cells.column("k").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(ku) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "k": cells.column("k"),
                "day": cells.column("day"),
            }
        )

    def streaks(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows == 0:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        d = group.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, k))
        ks, ds_ = k[order], d[order]
        # distinct (key, day) — batch combiner dedups within batches only
        keep = np.concatenate(([True], (ks[1:] != ks[:-1]) | (ds_[1:] != ds_[:-1])))
        ks, ds_ = ks[keep], ds_[keep]
        new_key = np.concatenate(([True], ks[1:] != ks[:-1]))
        new_streak = new_key.copy()
        new_streak[1:] |= (ds_[1:] - ds_[:-1]) != 1
        streak_id = np.cumsum(new_streak) - 1
        streak_len = np.bincount(streak_id).astype(np.int64)
        streak_start = np.flatnonzero(new_streak)
        streak_key = ks[streak_start]
        key_first_streak = np.flatnonzero(
            np.concatenate(([True], streak_key[1:] != streak_key[:-1]))
        )
        max_streak = np.maximum.reduceat(streak_len, key_first_streak)
        n_streaks = np.diff(
            np.concatenate((key_first_streak, [streak_len.size]))
        ).astype(np.int64)
        n_days = np.add.reduceat(streak_len, key_first_streak)
        return pa.table(
            {
                key_col: pa.array(streak_key[key_first_streak], pa.int64()),
                "n_active_days": pa.array(n_days.astype(np.int64)),
                "max_streak": pa.array(max_streak.astype(np.int64)),
                "n_streaks": pa.array(n_streaks),
            }
        )

    out = (
        events.select_columns([key_col, ts_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(streaks, batch_format="pyarrow")
    )
    return _anchor_schema(out, out_schema)


def key_skew_audit_ds(
    table: Dataset,
    key_col: str = "l_orderkey",
    p: float = 0.99,
) -> Dataset:
    """Join-key skew audit: ONE summary row ``(n_rows, n_keys,
    max_group, p99_group, top_share_ppm)`` describing the group-size
    distribution of a prospective join/shuffle key — the go/no-go check
    before hash-partitioning 100 TB by that key (a max_group in the
    millions means salting, cf. the LSH max_bucket caps). ``p99_group``
    follows the shared discrete-quantile convention (smallest size with
    cumulative key count >= ceil(p * n_keys)); ``top_share_ppm =
    max_group * 1e6 // n_rows``. Zero rows in -> one all-zero row out.

    Scale shape: per-batch key-count Arrow combiner -> aggregate-only
    ``groupby(key).sum`` (never map_groups over near-singleton keys) ->
    per-batch (size, count) partials -> tiny size-histogram groupby;
    only the bounded histogram reaches the driver."""

    def count_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        g = (
            pa.table({"k": batch.column(key_col).cast(pa.int64())})
            .group_by("k")
            .aggregate([("k", "count")])
        )
        return pa.table(
            {"k": g.column("k"), "n": g.column("k_count").cast(pa.int64())}
        )

    def size_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "sum(n)" not in batch.column_names:
            return pa.table(
                {"sz": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        g = (
            pa.table({"sz": batch.column("sum(n)").cast(pa.int64())})
            .group_by("sz")
            .aggregate([("sz", "count")])
        )
        return pa.table(
            {"sz": g.column("sz"), "c": g.column("sz_count").cast(pa.int64())}
        )

    hist = _small_df(
        table.select_columns([key_col])
        .map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Sum("n"))
        .map_batches(size_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sz")
        .aggregate(Sum("c")),
        {"sz": np.int64, "sum(c)": np.int64},
    )
    if len(hist):
        sz = hist["sz"].to_numpy(np.int64)
        c = hist["sum(c)"].to_numpy(np.int64)
        order = np.argsort(sz, kind="stable")
        sz, c = sz[order], c[order]
        n_keys = int(c.sum())
        n_rows = int((sz * c).sum())
        max_group = int(sz[-1])
        cum = np.cumsum(c)
        rank = max(int(np.ceil(p * n_keys)), 1)
        p99_group = int(sz[np.searchsorted(cum, rank)])
        top_share_ppm = max_group * 1_000_000 // n_rows
    else:
        n_keys = n_rows = max_group = p99_group = top_share_ppm = 0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_rows": pa.array([n_rows], pa.int64()),
                "n_keys": pa.array([n_keys], pa.int64()),
                "max_group": pa.array([max_group], pa.int64()),
                "p99_group": pa.array([p99_group], pa.int64()),
                "top_share_ppm": pa.array([top_share_ppm], pa.int64()),
            }
        )
    )


def dwell_times_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    type_col: str = "event_type",
    n_buckets: int = 512,
) -> Dataset:
    """Per-(key, state) dwell time: each event opens a state named by its
    ``type_col`` that lasts until the key's NEXT event (any type); emits
    ``(key, event_type, n_intervals, total_dwell_us)`` — the
    time-in-state compaction behind engagement and funnel-latency
    reporting. A key's last event has no successor and contributes
    nothing.

    Scale shape: ONE ``mix64(key)`` bucketed shuffle of the 4-column
    projection; a key's rows co-locate, so in-bucket one lexsort +
    shifted subtract computes every dwell and an Arrow group_by
    finishes (key, type) locally — no second exchange."""
    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            (type_col, pa.string()),
            ("n_intervals", pa.int64()),
            ("total_dwell_us", pa.int64()),
        ]
    )

    def project(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(k) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(k, pa.int64()),
                "t": batch.column(ts_col).cast(pa.int64()),
                "tie": batch.column(tie_col).cast(pa.int64()),
                "typ": batch.column(type_col).cast(pa.string()),
            }
        )

    def dwell(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows < 2:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        tie = group.column("tie").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, t, k))
        ks, ts_ = k[order], t[order]
        lead = np.concatenate((ks[1:] == ks[:-1], [False]))
        if not lead.any():
            return empty
        d = np.empty(ks.size, np.int64)
        d[:-1] = ts_[1:] - ts_[:-1]
        typ = group.column("typ").take(pa.array(order[lead]))
        g = (
            pa.table(
                {
                    key_col: pa.array(ks[lead], pa.int64()),
                    type_col: typ,
                    "dw": pa.array(d[lead], pa.int64()),
                }
            )
            .group_by([key_col, type_col])
            .aggregate([("dw", "count"), ("dw", "sum")])
        )
        return pa.table(
            {
                key_col: g.column(key_col),
                type_col: g.column(type_col),
                "n_intervals": g.column("dw_count").cast(pa.int64()),
                "total_dwell_us": g.column("dw_sum").cast(pa.int64()),
            }
        )

    out = (
        events.select_columns([key_col, ts_col, tie_col, type_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(dwell, batch_format="pyarrow")
    )
    return _anchor_schema(out, out_schema)


def order_reconcile_ds(
    lineitem: Dataset,
    orders: Dataset,
) -> Dataset:
    """Fact-table reconciliation audit: per order status, how many
    orders' line-derived totals (``sum(floor(extendedprice *
    (1 - discount) * (1 + tax) * 100))``) disagree with the order
    header's ``floor(o_totalprice * 100)``, and by how much in absolute
    cents — the classic warehouse consistency gate before publishing a
    revenue mart. Orders with no lines reconcile against 0. Cents come
    from the identical IEEE double product on both engines.

    Scale shape: lineitem reduces to one row per order via a per-batch
    cents combiner + aggregate-only groupby BEFORE the join; the join is
    the generic bucketed hash join (one exchange each side, LEFT so
    line-less orders surface); a per-batch status combiner feeds the
    final status-domain groupby."""

    def li_proj(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"l_orderkey": pa.array([], pa.int64()),
                 "cents": pa.array([], pa.int64())}
            )
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        tax = batch.column("l_tax").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * (1.0 + tax) * 100).astype(np.int64)
        g = (
            pa.table(
                {
                    "l_orderkey": batch.column("l_orderkey").cast(pa.int64()),
                    "cents": pa.array(cents, pa.int64()),
                }
            )
            .group_by("l_orderkey")
            .aggregate([("cents", "sum")])
        )
        return pa.table(
            {
                "l_orderkey": g.column("l_orderkey"),
                "cents": g.column("cents_sum").cast(pa.int64()),
            }
        )

    def li_finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return pa.table(
                {"l_orderkey": pa.array([], pa.int64()),
                 "line_cents": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "line_cents": batch.column("sum(cents)").cast(pa.int64()),
            }
        )

    def o_proj(batch: pa.Table) -> pa.Table:
        tot = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
                "o_orderstatus": batch.column("o_orderstatus").cast(pa.string()),
                "total_cents": pa.array(
                    np.floor(tot * 100).astype(np.int64), pa.int64()
                ),
            }
        )

    li_sums = (
        lineitem.select_columns(
            ["l_orderkey", "l_extendedprice", "l_discount", "l_tax"]
        )
        .map_batches(li_proj, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("cents"))
        .map_batches(li_finish, batch_format="pyarrow", zero_copy_batch=True)
    )
    od = orders.select_columns(
        ["o_orderkey", "o_orderstatus", "o_totalprice"]
    ).map_batches(o_proj, batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join_ds(od, li_sums, "o_orderkey", "l_orderkey", how="left")
    out_schema = pa.schema(
        [
            ("o_orderstatus", pa.string()),
            ("n_orders", pa.int64()),
            ("n_mismatch", pa.int64()),
            ("sum_abs_diff_cents", pa.int64()),
        ]
    )

    def status_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_orderstatus" not in batch.column_names:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        tot = batch.column("total_cents").to_numpy(zero_copy_only=False)
        line = pc.fill_null(batch.column("line_cents"), 0).to_numpy(
            zero_copy_only=False
        )
        diff = np.abs(line - tot)
        g = (
            pa.table(
                {
                    "o_orderstatus": batch.column("o_orderstatus"),
                    "n_orders": pa.array(np.ones(len(tot), np.int64)),
                    "n_mismatch": pa.array((diff != 0).astype(np.int64)),
                    "sum_abs_diff_cents": pa.array(diff.astype(np.int64)),
                }
            )
            .group_by("o_orderstatus")
            .aggregate(
                [
                    ("n_orders", "sum"),
                    ("n_mismatch", "sum"),
                    ("sum_abs_diff_cents", "sum"),
                ]
            )
        )
        return pa.table(
            {
                "o_orderstatus": g.column("o_orderstatus"),
                "n_orders": g.column("n_orders_sum").cast(pa.int64()),
                "n_mismatch": g.column("n_mismatch_sum").cast(pa.int64()),
                "sum_abs_diff_cents": g.column("sum_abs_diff_cents_sum").cast(
                    pa.int64()
                ),
            }
        )

    agg = (
        joined.map_batches(status_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderstatus")
        .aggregate(Sum("n_orders"), Sum("n_mismatch"), Sum("sum_abs_diff_cents"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_orderstatus" not in batch.column_names:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        return pa.table(
            {
                "o_orderstatus": batch.column("o_orderstatus"),
                "n_orders": batch.column("sum(n_orders)").cast(pa.int64()),
                "n_mismatch": batch.column("sum(n_mismatch)").cast(pa.int64()),
                "sum_abs_diff_cents": batch.column(
                    "sum(sum_abs_diff_cents)"
                ).cast(pa.int64()),
            }
        )

    return _anchor_schema(
        agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True),
        out_schema,
    )


def weekday_profile_ds(
    events: Dataset,
    type_col: str = "event_type",
    ts_col: str = "ts",
    day_us: int = 86_400_000_000,
) -> Dataset:
    """Weekly seasonality fingerprint: per (event_type, weekday) the
    event count and the number of distinct active days — the shape
    check behind weekday-aware traffic forecasts. ``weekday = (epoch_day
    + 4) % 7`` (Monday = 0), a pure integer formula identical on both
    engines (no date-library convention risk).

    Scale shape: per-batch (type, day) count combiner -> ONE bounded
    groupby over the (types x days) domain -> tiny (type, weekday)
    fold; nothing unbounded reaches the driver."""
    out_schema = pa.schema(
        [
            (type_col, pa.string()),
            ("weekday", pa.int64()),
            ("n_events", pa.int64()),
            ("n_days", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "typ": pa.array([], pa.string()),
                    "day": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        t = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "typ": batch.column(type_col).cast(pa.string()),
                    "day": pa.array(t // day_us, pa.int64()),
                }
            )
            .group_by(["typ", "day"])
            .aggregate([("day", "count")])
        )
        return pa.table(
            {
                "typ": g.column("typ"),
                "day": g.column("day"),
                "n": g.column("day_count").cast(pa.int64()),
            }
        )

    def fold(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "typ" not in batch.column_names:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        day = batch.column("day").to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    type_col: batch.column("typ"),
                    "weekday": pa.array((day + 4) % 7, pa.int64()),
                    "n_events": batch.column("sum(n)").cast(pa.int64()),
                    "n_days": pa.array(np.ones(len(day), np.int64)),
                }
            )
            .group_by([type_col, "weekday"])
            .aggregate([("n_events", "sum"), ("n_days", "sum")])
        )
        return pa.table(
            {
                type_col: g.column(type_col),
                "weekday": g.column("weekday"),
                "n_events": g.column("n_events_sum").cast(pa.int64()),
                "n_days": g.column("n_days_sum").cast(pa.int64()),
            }
        )

    out = (
        events.select_columns([type_col, ts_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["typ", "day"])
        .aggregate(Sum("n"))
        .map_batches(fold, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([type_col, "weekday"])
        .aggregate(Sum("n_events"), Sum("n_days"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or type_col not in batch.column_names:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        return pa.table(
            {
                type_col: batch.column(type_col),
                "weekday": batch.column("weekday").cast(pa.int64()),
                "n_events": batch.column("sum(n_events)").cast(pa.int64()),
                "n_days": batch.column("sum(n_days)").cast(pa.int64()),
            }
        )

    return _anchor_schema(
        out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True),
        out_schema,
    )


def rfm_scores_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    day_us: int = 86_400_000_000,
) -> Dataset:
    """RFM segmentation: per user the recency day (last event's
    ``ts_us // day_us``), frequency (event count), monetary total
    (``sum(floor(value * 100))`` cents) plus 1..5 quintile scores per
    dimension. Scores use the integer-exact discrete convention: the
    s-th boundary is the smallest value whose cumulative user count
    reaches ``(s * N + 4) // 5`` (pure-integer ceil, no float q * N),
    and ``score = 1 + #(boundaries < value)`` — deterministic under
    ties on both engines. Scoring dimensions quantize to BOUNDED
    domains (days, counts, whole dollars) so the boundary histograms
    the driver collects stay small at any corpus size; exact cents are
    still emitted raw.

    Scale shape: one aggregate-only ``groupby(user)`` builds the RFM
    table (materialized once — it is also the output); three
    bounded-domain histogram collects fix the quintile boundaries; one
    final ``map_batches`` assigns scores with the 12 boundary ints in
    the closure."""
    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("r_days", pa.int64()),
            ("f", pa.int64()),
            ("m_cents", pa.int64()),
            ("r_score", pa.int64()),
            ("f_score", pa.int64()),
            ("m_score", pa.int64()),
        ]
    )

    def project(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: batch.column(key_col).cast(pa.int64()),
                "t": batch.column(ts_col).cast(pa.int64()),
                "cents": pa.array(np.floor(v * 100).astype(np.int64), pa.int64()),
            }
        )

    def to_rfm(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or key_col not in batch.column_names:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "r_days": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                    "m_cents": pa.array([], pa.int64()),
                }
            )
        t = batch.column("max(t)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: batch.column(key_col).cast(pa.int64()),
                "r_days": pa.array(t // day_us, pa.int64()),
                "f": batch.column("count()").cast(pa.int64()),
                "m_cents": batch.column("sum(cents)").cast(pa.int64()),
            }
        )

    rfm = (
        events.select_columns([key_col, ts_col, value_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(Max("t"), Count(), Sum("cents"))
        .map_batches(to_rfm, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def boundaries(col: str, quant: Optional[int] = None) -> np.ndarray:
        hist = _small_df(
            rfm.map_batches(
                lambda b, c=col, q=quant: pa.table(
                    {
                        "v": pa.array(
                            (
                                b.column(c).to_numpy(zero_copy_only=False) // q
                                if q
                                else b.column(c).to_numpy(zero_copy_only=False)
                            ),
                            pa.int64(),
                        )
                    }
                )
                .group_by("v")
                .aggregate([("v", "count")])
                .rename_columns(["v", "n"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("v")
            .aggregate(Sum("n")),
            {"v": np.int64, "sum(n)": np.int64},
        )
        if not len(hist):
            return np.zeros(4, np.int64)
        v = hist["v"].to_numpy(np.int64)
        n = hist["sum(n)"].to_numpy(np.int64)
        o = np.argsort(v, kind="stable")
        v, n = v[o], n[o]
        cum = np.cumsum(n)
        total = int(cum[-1])
        ranks = np.array(
            [(s * total + 4) // 5 for s in (1, 2, 3, 4)], np.int64
        )
        return v[np.searchsorted(cum, np.maximum(ranks, 1))]

    b_r = boundaries("r_days")
    b_f = boundaries("f")
    b_m = boundaries("m_cents", quant=100)  # whole dollars

    def score(vals: np.ndarray, bounds: np.ndarray) -> np.ndarray:
        return 1 + (vals[:, None] > bounds[None, :]).sum(axis=1).astype(np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        r = batch.column("r_days").to_numpy(zero_copy_only=False)
        f = batch.column("f").to_numpy(zero_copy_only=False)
        m = batch.column("m_cents").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: batch.column(key_col),
                "r_days": batch.column("r_days"),
                "f": batch.column("f"),
                "m_cents": batch.column("m_cents"),
                "r_score": pa.array(score(r, b_r)),
                "f_score": pa.array(score(f, b_f)),
                "m_score": pa.array(score(m // 100, b_m)),
            }
        )

    return _anchor_schema(
        rfm.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True),
        out_schema,
    )


def ship_lag_stats_ds(
    lineitem: Dataset,
    orders: Dataset,
    day_us: int = 86_400_000_000,
) -> Dataset:
    """Order-to-ship latency distribution per order priority: line
    count, min / discrete-median / max lag in whole days (``ship_day -
    order_day``; median = smallest lag whose cumulative count reaches
    ``(N + 1) // 2``, the shared pure-integer convention). The SLA
    report behind fulfillment dashboards.

    Scale shape: the generic bucketed hash join (lines x order headers,
    one exchange each side) -> per-batch (priority, lag) count combiner
    -> ONE bounded groupby over the (priorities x lag-days) domain ->
    only that histogram reaches the driver."""
    out_schema = pa.schema(
        [
            ("o_orderpriority", pa.string()),
            ("n_lines", pa.int64()),
            ("min_lag_days", pa.int64()),
            ("med_lag_days", pa.int64()),
            ("max_lag_days", pa.int64()),
        ]
    )

    def li_proj(batch: pa.Table) -> pa.Table:
        t = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey").cast(pa.int64()),
                "ship_day": pa.array(t // day_us, pa.int64()),
            }
        )

    def o_proj(batch: pa.Table) -> pa.Table:
        t = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
                "prio": batch.column("o_orderpriority").cast(pa.string()),
                "order_day": pa.array(t // day_us, pa.int64()),
            }
        )

    li = lineitem.select_columns(["l_orderkey", "l_shipdate"]).map_batches(
        li_proj, batch_format="pyarrow", zero_copy_batch=True
    )
    od = orders.select_columns(
        ["o_orderkey", "o_orderpriority", "o_orderdate"]
    ).map_batches(o_proj, batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join_ds(li, od, "l_orderkey", "o_orderkey", how="inner")

    def lag_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "prio" not in batch.column_names:
            return pa.table(
                {
                    "prio": pa.array([], pa.string()),
                    "lag": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ship = batch.column("ship_day").to_numpy(zero_copy_only=False)
        od_ = batch.column("order_day").to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "prio": batch.column("prio"),
                    "lag": pa.array(ship - od_, pa.int64()),
                }
            )
            .group_by(["prio", "lag"])
            .aggregate([("lag", "count")])
        )
        return pa.table(
            {
                "prio": g.column("prio"),
                "lag": g.column("lag"),
                "n": g.column("lag_count").cast(pa.int64()),
            }
        )

    hist = _small_df(
        joined.map_batches(lag_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["prio", "lag"])
        .aggregate(Sum("n")),
        {"prio": object, "lag": np.int64, "sum(n)": np.int64},
    )
    if not len(hist):
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
    prio = hist["prio"].to_numpy(object).astype(str)
    lag = hist["lag"].to_numpy(np.int64)
    n = hist["sum(n)"].to_numpy(np.int64)
    order = np.lexsort((lag, prio))
    prio, lag, n = prio[order], lag[order], n[order]
    new = np.concatenate(([True], prio[1:] != prio[:-1]))
    starts = np.flatnonzero(new)
    ends = np.concatenate((starts[1:], [prio.size]))
    rows = []
    for s, e in zip(starts, ends):
        tot = int(n[s:e].sum())
        cum = np.cumsum(n[s:e])
        med = int(lag[s:e][np.searchsorted(cum, (tot + 1) // 2)])
        rows.append((str(prio[s]), tot, int(lag[s]), med, int(lag[e - 1])))
    return ray.data.from_arrow(
        pa.table(
            {
                "o_orderpriority": pa.array([r[0] for r in rows], pa.string()),
                "n_lines": pa.array([r[1] for r in rows], pa.int64()),
                "min_lag_days": pa.array([r[2] for r in rows], pa.int64()),
                "med_lag_days": pa.array([r[3] for r in rows], pa.int64()),
                "max_lag_days": pa.array([r[4] for r in rows], pa.int64()),
            }
        )
    )


def zonemap_prune_ds(
    docs: Dataset,
    id_col: str = "doc_id",
    value_col: str = "n_chars",
    shard_size: int = 100,
    threshold: int = 2000,
) -> Dataset:
    """Zone-map pruning audit: per id-range shard (``id // shard_size``)
    the min/max of ``value_col`` plus whether a ``value >= threshold``
    scan could skip the shard entirely (``max < threshold``) — the
    data-layout health check that decides whether range-partitioned
    parquet actually prunes. Emits ``(shard_id, n_docs, min_v, max_v,
    prunable)``.

    Scale shape: per-batch (shard, count/min/max) Arrow combiner ->
    ONE aggregate-only groupby over the bounded shard domain."""
    out_schema = pa.schema(
        [
            ("shard_id", pa.int64()),
            ("n_docs", pa.int64()),
            ("min_v", pa.int64()),
            ("max_v", pa.int64()),
            ("prunable", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "shard_id": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "mn": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.int64()),
                }
            )
        i = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "shard_id": pa.array(i // shard_size, pa.int64()),
                    "v": batch.column(value_col).cast(pa.int64()),
                }
            )
            .group_by("shard_id")
            .aggregate([("v", "count"), ("v", "min"), ("v", "max")])
        )
        return pa.table(
            {
                "shard_id": g.column("shard_id"),
                "n": g.column("v_count").cast(pa.int64()),
                "mn": g.column("v_min").cast(pa.int64()),
                "mx": g.column("v_max").cast(pa.int64()),
            }
        )

    agg = (
        docs.select_columns([id_col, value_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard_id")
        .aggregate(Sum("n"), Min("mn"), Max("mx"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "shard_id" not in batch.column_names:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        mx = batch.column("max(mx)").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "shard_id": batch.column("shard_id").cast(pa.int64()),
                "n_docs": batch.column("sum(n)").cast(pa.int64()),
                "min_v": batch.column("min(mn)").cast(pa.int64()),
                "max_v": batch.column("max(mx)").cast(pa.int64()),
                "prunable": pa.array((mx < threshold).astype(np.int64)),
            }
        )

    return _anchor_schema(
        agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True),
        out_schema,
    )


def open_order_backlog_ds(
    lineitem: Dataset,
    orders: Dataset,
    day_us: int = 86_400_000_000,
) -> Dataset:
    """Daily open-order backlog curve: an order opens on its order day
    and closes on its LAST line-ship day (clamped to at least the order
    day; line-less orders open and close same-day); emits one row per
    day of the observed span with the exact number of open orders —
    the interval-stabbing aggregate behind WIP dashboards, computed as
    +1/-1 boundary deltas + one running sum (never by expanding
    per-order day ranges).

    Scale shape: line max-ship-day via aggregate-only groupby -> one
    bucketed LEFT hash join to headers -> per-batch delta combiner ->
    bounded day-domain groupby; only the day-delta table reaches the
    driver, where the dense cumsum is a single np.arange."""
    out_schema = pa.schema([("day", pa.int64()), ("n_open", pa.int64())])

    def li_proj(batch: pa.Table) -> pa.Table:
        t = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey").cast(pa.int64()),
                "ship_day": pa.array(t // day_us, pa.int64()),
            }
        )

    def li_finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "end_day": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "end_day": batch.column("max(ship_day)").cast(pa.int64()),
            }
        )

    def o_proj(batch: pa.Table) -> pa.Table:
        t = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
                "start_day": pa.array(t // day_us, pa.int64()),
            }
        )

    ld = (
        lineitem.select_columns(["l_orderkey", "l_shipdate"])
        .map_batches(li_proj, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Max("ship_day"))
        .map_batches(li_finish, batch_format="pyarrow", zero_copy_batch=True)
    )
    od = orders.select_columns(["o_orderkey", "o_orderdate"]).map_batches(
        o_proj, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = hash_join_ds(od, ld, "o_orderkey", "l_orderkey", how="left")

    def delta_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "start_day" not in batch.column_names:
            return pa.table(
                {"day": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
            )
        start = batch.column("start_day").to_numpy(zero_copy_only=False)
        end = pc.fill_null(batch.column("end_day"), -(1 << 62)).to_numpy(
            zero_copy_only=False
        )
        end = np.maximum(end, start)
        g = (
            pa.table(
                {
                    "day": pa.array(np.concatenate((start, end + 1)), pa.int64()),
                    "d": pa.array(
                        np.concatenate(
                            (
                                np.ones(start.size, np.int64),
                                np.full(start.size, -1, np.int64),
                            )
                        )
                    ),
                }
            )
            .group_by("day")
            .aggregate([("d", "sum")])
        )
        return pa.table(
            {"day": g.column("day"), "d": g.column("d_sum").cast(pa.int64())}
        )

    deltas = _small_df(
        joined.map_batches(
            delta_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("day")
        .aggregate(Sum("d")),
        {"day": np.int64, "sum(d)": np.int64},
    )
    if not len(deltas):
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
    dday = deltas["day"].to_numpy(np.int64)
    dd = deltas["sum(d)"].to_numpy(np.int64)
    lo, hi = int(dday.min()), int(dday.max())
    dense = np.zeros(hi - lo + 1, np.int64)
    dense[dday - lo] = dd
    return ray.data.from_arrow(
        pa.table(
            {
                "day": pa.array(np.arange(lo, hi + 1, dtype=np.int64)),
                "n_open": pa.array(np.cumsum(dense)),
            }
        )
    )


def sole_source_risk_ds(
    lineitem: Dataset,
    part_col: str = "l_partkey",
    supp_col: str = "l_suppkey",
) -> Dataset:
    """Supply-concentration histogram: how many parts are served by
    exactly N distinct suppliers (bucket 1 = the sole-source risk set
    a procurement review flags first). Emits ``(n_suppliers,
    n_parts)``.

    Scale shape: per-batch DISTINCT (part, supplier) Arrow combiner ->
    aggregate-only dedup groupby -> per-batch part-count fold ->
    aggregate-only per-part groupby -> tiny histogram groupby; three
    exchanges, all aggregate-only, nothing per-group Python."""
    out_schema = pa.schema(
        [("n_suppliers", pa.int64()), ("n_parts", pa.int64())]
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"p": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
            )
        return (
            pa.table(
                {
                    "p": batch.column(part_col).cast(pa.int64()),
                    "s": batch.column(supp_col).cast(pa.int64()),
                }
            )
            .group_by(["p", "s"])
            .aggregate([])
        )

    def part_fold(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "p" not in batch.column_names:
            return pa.table(
                {"p": pa.array([], pa.int64()), "one": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "p": batch.column("p").cast(pa.int64()),
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    def hist_fold(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "sum(one)" not in batch.column_names:
            return pa.table(
                {
                    "n_suppliers": pa.array([], pa.int64()),
                    "one": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "n_suppliers": batch.column("sum(one)").cast(pa.int64()),
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    out = (
        lineitem.select_columns([part_col, supp_col])
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["p", "s"])
        .count()
        .map_batches(part_fold, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p")
        .aggregate(Sum("one"))
        .map_batches(hist_fold, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_suppliers")
        .aggregate(Sum("one"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n_suppliers" not in batch.column_names:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        return pa.table(
            {
                "n_suppliers": batch.column("n_suppliers").cast(pa.int64()),
                "n_parts": batch.column("sum(one)").cast(pa.int64()),
            }
        )

    return _anchor_schema(
        out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True),
        out_schema,
    )


def late_events_ds(
    events: Dataset,
    type_col: str = "event_type",
    seq_col: str = "event_id",
    ts_col: str = "ts",
    budget_us: int = 3_600_000_000,
    n_ranges: int = 4096,
) -> Dataset:
    """Watermark-lateness audit: replaying events in ingest order
    (``seq_col``), the watermark is the running max event time seen
    STRICTLY BEFORE each event; an event is late when ``ts < watermark
    - budget``. Emits per event type ``(n_events, n_late)`` — the
    measurement that decides whether a streaming job's allowed-lateness
    budget would have dropped data.

    Scale shape: a textbook two-phase distributed prefix scan. Phase 1
    computes per-ingest-range maxima (``seq // range_width``, bounded
    domain) with one aggregate-only groupby; the driver prefix-maxes
    that tiny table into per-range carry-ins. Phase 2 re-shuffles by
    range once, sorts each range by seq locally, and applies a shifted
    cummax seeded with the carry-in — no global sort, no sequential
    pass over the corpus."""
    out_schema = pa.schema(
        [
            (type_col, pa.string()),
            ("n_events", pa.int64()),
            ("n_late", pa.int64()),
        ]
    )
    bounds = (
        events.select_columns([seq_col])
        .map_batches(
            lambda b: pa.table(
                {
                    "mn": pa.array(
                        [b.column(seq_col).cast(pa.int64()).to_numpy(
                            zero_copy_only=False
                        ).min()] if b.num_rows else [],
                        pa.int64(),
                    ),
                    "mx": pa.array(
                        [b.column(seq_col).cast(pa.int64()).to_numpy(
                            zero_copy_only=False
                        ).max()] if b.num_rows else [],
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .aggregate(Min("mn"), Max("mx"))
    )
    if not bounds or bounds.get("min(mn)") is None:
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
    lo = int(bounds["min(mn)"])
    hi = int(bounds["max(mx)"])
    width = max((hi - lo) // n_ranges + 1, 1)

    def project(batch: pa.Table) -> pa.Table:
        s = batch.column(seq_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "rng": pa.array((s - lo) // width, pa.int64()),
                "s": pa.array(s, pa.int64()),
                "t": batch.column(ts_col).cast(pa.int64()),
                "typ": batch.column(type_col).cast(pa.string()),
            }
        )

    projected = events.select_columns(
        [seq_col, ts_col, type_col]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    projected = projected.materialize()  # phase 1 + phase 2 both consume it

    range_max = _small_df(
        projected.select_columns(["rng", "t"]).groupby("rng").aggregate(Max("t")),
        {"rng": np.int64, "max(t)": np.int64},
    )
    carry = np.full(n_ranges + 1, -(1 << 62), np.int64)
    if len(range_max):
        r = range_max["rng"].to_numpy(np.int64)
        m = range_max["max(t)"].to_numpy(np.int64)
        tmp = np.full(n_ranges + 1, -(1 << 62), np.int64)
        tmp[r] = m
        # carry[i] = max over ranges < i
        carry[1:] = np.maximum.accumulate(tmp[:-1])
    carry_ref = ray.put(carry)

    def late_partial(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "typ": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "l": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        cr = ray.get(carry_ref)
        s = group.column("s").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        rng = group.column("rng").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, rng))
        t_s, rng_s = t[order], rng[order]
        new_rng = np.concatenate(([True], rng_s[1:] != rng_s[:-1]))
        # shifted cummax within each range, seeded with the carry-in
        wm = np.empty(t_s.size, np.int64)
        wm[0] = cr[rng_s[0]]
        wm[1:] = t_s[:-1]
        seg_id = np.cumsum(new_rng) - 1
        starts = np.flatnonzero(new_rng)
        wm[starts] = cr[rng_s[starts]]
        # running max of wm within segments (pandas grouped cummax)
        import pandas as pd

        wm = pd.Series(wm).groupby(seg_id).cummax().to_numpy()
        late = (t_s < wm - budget_us).astype(np.int64)
        g = (
            pa.table(
                {
                    "typ": group.column("typ").take(pa.array(order)),
                    "n": pa.array(np.ones(t_s.size, np.int64)),
                    "l": pa.array(late),
                }
            )
            .group_by("typ")
            .aggregate([("n", "sum"), ("l", "sum")])
        )
        return pa.table(
            {
                "typ": g.column("typ"),
                "n": g.column("n_sum").cast(pa.int64()),
                "l": g.column("l_sum").cast(pa.int64()),
            }
        )

    agg = (
        projected.groupby("rng")
        .map_groups(late_partial, batch_format="pyarrow")
        .groupby("typ")
        .aggregate(Sum("n"), Sum("l"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "typ" not in batch.column_names:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        return pa.table(
            {
                type_col: batch.column("typ"),
                "n_events": batch.column("sum(n)").cast(pa.int64()),
                "n_late": batch.column("sum(l)").cast(pa.int64()),
            }
        )

    return _anchor_schema(
        agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True),
        out_schema,
    )


def encoding_size_audit_ds(
    docs: Dataset,
    columns: Sequence[str] = ("lang", "source", "text"),
    n_buckets: int = 512,
) -> Dataset:
    """Column-encoding size audit: per string column the row count,
    distinct count, plain-encoding byte size (sum of octet lengths) and
    a dictionary-encoding estimate (``distinct_bytes + 4 * n`` — one
    int32 code per row) — the layout decision input for columnar
    writers. Emits one row per audited column.

    Scale shape: plain bytes via a per-batch sum combiner; distinct
    values co-locate through ONE ``md5(value) % n_buckets`` shuffle per
    column (in-bucket np.unique IS the global distinct), so only
    per-bucket (count, bytes) partials and the tiny per-column fold
    move afterwards."""
    from ..functions import textstats as ts_mod

    out_schema = pa.schema(
        [
            ("column_name", pa.string()),
            ("n", pa.int64()),
            ("n_distinct", pa.int64()),
            ("plain_bytes", pa.int64()),
            ("dict_bytes", pa.int64()),
        ]
    )
    results = []
    for col in columns:
        def plain_partial(batch: pa.Table, c=col) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {"n": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
                )
            v = pc.fill_null(batch.column(c), "")
            return pa.table(
                {
                    "n": pa.array([batch.num_rows], pa.int64()),
                    "b": pa.array(
                        [int(pc.sum(pc.binary_length(v)).as_py() or 0)],
                        pa.int64(),
                    ),
                }
            )

        plain = docs.select_columns([col]).map_batches(
            plain_partial, batch_format="pyarrow", zero_copy_batch=True
        ).aggregate(Sum("n"), Sum("b"))
        n_rows = int(plain["sum(n)"] or 0) if plain else 0
        plain_bytes = int(plain["sum(b)"] or 0) if plain else 0

        def distinct_partial(batch: pa.Table, c=col) -> pa.Table:
            empty = pa.table(
                {"v": pa.array([], pa.string()), "bkt": pa.array([], pa.int64())}
            )
            if batch.num_rows == 0:
                return empty
            u = pc.unique(pc.fill_null(batch.column(c), ""))
            vals = u.to_pylist()
            h = np.fromiter(
                (ts_mod.md5_u64(x) for x in vals), np.uint64, count=len(vals)
            )
            return pa.table(
                {
                    "v": u,
                    "bkt": pa.array(
                        (h % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                    ),
                }
            )

        def bucket_distinct(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return pa.table(
                    {"d": pa.array([], pa.int64()), "db": pa.array([], pa.int64())}
                )
            u = pc.unique(group.column("v"))
            return pa.table(
                {
                    "d": pa.array([len(u)], pa.int64()),
                    "db": pa.array(
                        [int(pc.sum(pc.binary_length(u)).as_py() or 0)],
                        pa.int64(),
                    ),
                }
            )

        dist = (
            docs.select_columns([col])
            .map_batches(
                distinct_partial, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("bkt")
            .map_groups(bucket_distinct, batch_format="pyarrow")
            .aggregate(Sum("d"), Sum("db"))
        )
        n_distinct = int(dist["sum(d)"] or 0) if dist else 0
        distinct_bytes = int(dist["sum(db)"] or 0) if dist else 0
        results.append(
            (str(col), n_rows, n_distinct, plain_bytes, distinct_bytes + 4 * n_rows)
        )
    return ray.data.from_arrow(
        pa.table(
            {
                "column_name": pa.array([r[0] for r in results], pa.string()),
                "n": pa.array([r[1] for r in results], pa.int64()),
                "n_distinct": pa.array([r[2] for r in results], pa.int64()),
                "plain_bytes": pa.array([r[3] for r in results], pa.int64()),
                "dict_bytes": pa.array([r[4] for r in results], pa.int64()),
            }
        )
    )


def dup_baskets_ds(
    lineitem: Dataset,
    order_col: str = "l_orderkey",
    part_col: str = "l_partkey",
    n_buckets: int = 512,
) -> Dataset:
    """Duplicate-basket histogram: orders whose DISTINCT part set is
    byte-identical to another order's (fingerprint = md5 of the
    numerically-sorted part list) — the market-structure dedup signal
    behind bot/reseller detection. Emits per basket size ``(n_orders,
    n_distinct_baskets, n_dup_orders)``.

    Scale shape: distinct (order, part) combiner -> ONE
    ``mix64(order)`` bucketed shuffle (an order's parts co-locate) ->
    per-order fingerprint inside the bucket (one md5 per ORDER — the
    per-entity cost class shared with the per-doc MinHash signature) ->
    aggregate-only (size, fp) dedup groupby -> tiny size-domain fold."""
    import hashlib

    out_schema = pa.schema(
        [
            ("basket_size", pa.int64()),
            ("n_orders", pa.int64()),
            ("n_distinct_baskets", pa.int64()),
            ("n_dup_orders", pa.int64()),
        ]
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "o": pa.array([], pa.int64()),
                    "p": pa.array([], pa.int64()),
                    "bkt": pa.array([], pa.int64()),
                }
            )
        g = (
            pa.table(
                {
                    "o": batch.column(order_col).cast(pa.int64()),
                    "p": batch.column(part_col).cast(pa.int64()),
                }
            )
            .group_by(["o", "p"])
            .aggregate([])
        )
        o = g.column("o").to_numpy(zero_copy_only=False)
        return g.append_column(
            "bkt",
            pa.array((_mix64(o) % np.uint64(n_buckets)).astype(np.int64)),
        )

    def bucket_fp(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"sz": pa.array([], pa.int64()), "fp": pa.array([], pa.string())}
        )
        if group.num_rows == 0:
            return empty
        o = group.column("o").to_numpy(zero_copy_only=False)
        p = group.column("p").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, o))
        os_, ps_ = o[order], p[order]
        keep = np.concatenate(
            ([True], (os_[1:] != os_[:-1]) | (ps_[1:] != ps_[:-1]))
        )
        os_, ps_ = os_[keep], ps_[keep]
        new = np.concatenate(([True], os_[1:] != os_[:-1]))
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [os_.size]))
        fps = [
            hashlib.md5(
                "-".join(str(int(x)) for x in ps_[s:e]).encode()
            ).hexdigest()
            for s, e in zip(starts, ends)
        ]
        return pa.table(
            {
                "sz": pa.array((ends - starts).astype(np.int64)),
                "fp": pa.array(fps, pa.string()),
            }
        )

    def size_fold(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "sz" not in batch.column_names:
            return pa.table(
                {
                    "sz": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "d": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "sz": batch.column("sz").cast(pa.int64()),
                "n": batch.column("count()").cast(pa.int64()),
                "d": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    out = (
        lineitem.select_columns([order_col, part_col])
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(bucket_fp, batch_format="pyarrow")
        .groupby(["sz", "fp"])
        .count()
        .map_batches(size_fold, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sz")
        .aggregate(Sum("n"), Sum("d"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "sz" not in batch.column_names:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        n = batch.column("sum(n)").cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = batch.column("sum(d)").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "basket_size": batch.column("sz").cast(pa.int64()),
                "n_orders": pa.array(n),
                "n_distinct_baskets": pa.array(d),
                "n_dup_orders": pa.array(n - d),
            }
        )

    return _anchor_schema(
        out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True),
        out_schema,
    )


def churn_overlap_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    day_us: int = 86_400_000_000,
    n_buckets: int = 512,
) -> Dataset:
    """Day-over-day audience overlap: for every day ``d`` in the
    observed span (except the last), the active-user counts of ``d``
    and ``d+1`` plus the exact retained-user intersection — churned =
    ``n_active - n_retained``, new = ``n_active_next - n_retained``.
    The daily churn diagnostic behind retention dashboards.

    Scale shape: distinct (user, day) Arrow combiner -> ONE
    ``mix64(user)`` shuffle (a user's active days co-locate, so
    consecutive-day pairs count locally) -> per-bucket (day, active,
    retained) partials -> bounded day-domain groupby; the dense chain
    assembles from the tiny day table on the driver."""
    out_schema = pa.schema(
        [
            ("day", pa.int64()),
            ("n_active", pa.int64()),
            ("n_active_next", pa.int64()),
            ("n_retained", pa.int64()),
        ]
    )

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "bkt": pa.array([], pa.int64()),
                    "k": pa.array([], pa.int64()),
                    "day": pa.array([], pa.int64()),
                }
            )
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        cells = (
            pa.table(
                {
                    "k": pa.array(k, pa.int64()),
                    "day": pa.array(t // day_us, pa.int64()),
                }
            )
            .group_by(["k", "day"])
            .aggregate([])
        )
        ku = cells.column("k").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(ku) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "k": cells.column("k"),
                "day": cells.column("day"),
            }
        )

    def bucket_counts(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "day": pa.array([], pa.int64()),
                "a": pa.array([], pa.int64()),
                "r": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        d = group.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, k))
        ks, ds_ = k[order], d[order]
        keep = np.concatenate(([True], (ks[1:] != ks[:-1]) | (ds_[1:] != ds_[:-1])))
        ks, ds_ = ks[keep], ds_[keep]
        same_user = ks[1:] == ks[:-1]
        retained = same_user & ((ds_[1:] - ds_[:-1]) == 1)
        lo = int(ds_.min())
        act = np.bincount(ds_ - lo).astype(np.int64)
        ret = np.bincount(ds_[:-1][retained] - lo, minlength=act.size).astype(
            np.int64
        )
        days = np.arange(lo, lo + act.size, dtype=np.int64)
        nz = (act > 0) | (ret > 0)
        return pa.table(
            {
                "day": pa.array(days[nz]),
                "a": pa.array(act[nz]),
                "r": pa.array(ret[nz]),
            }
        )

    agg = _small_df(
        events.select_columns([key_col, ts_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(bucket_counts, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("a"), Sum("r")),
        {"day": np.int64, "sum(a)": np.int64, "sum(r)": np.int64},
    )
    if not len(agg):
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
    day = agg["day"].to_numpy(np.int64)
    a = agg["sum(a)"].to_numpy(np.int64)
    r = agg["sum(r)"].to_numpy(np.int64)
    lo, hi = int(day.min()), int(day.max())
    act = np.zeros(hi - lo + 1, np.int64)
    ret = np.zeros(hi - lo + 1, np.int64)
    act[day - lo] = a
    ret[day - lo] = r
    if act.size < 2:
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
    days_out = np.arange(lo, hi, dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "day": pa.array(days_out),
                "n_active": pa.array(act[:-1]),
                "n_active_next": pa.array(act[1:]),
                "n_retained": pa.array(ret[:-1]),
            }
        )
    )


def value_mad_ds(
    events: Dataset,
    type_col: str = "event_type",
    value_col: str = "value",
    quant: int = 100,
) -> Dataset:
    """Robust center/spread per event type: the discrete median of the
    cents-quantized value and the median absolute deviation around it
    (both under the shared ``smallest value with cumulative count >=
    ceil(n/2)`` convention) — the outlier-resistant scale estimate MAD
    provides where variance is skew-dominated. Emits ``(event_type, n,
    med_cents, mad_cents)``.

    Scale shape: ONE (type, cents) count-combiner groupby; the MAD
    derives from the SAME collected histogram by re-bucketing
    ``|v - med|`` on the driver — no second corpus pass."""
    out_schema = pa.schema(
        [
            (type_col, pa.string()),
            ("n", pa.int64()),
            ("med_cents", pa.int64()),
            ("mad_cents", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "typ": pa.array([], pa.string()),
                    "v": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "typ": batch.column(type_col).cast(pa.string()),
                    "v": pa.array(np.floor(v * quant).astype(np.int64), pa.int64()),
                }
            )
            .group_by(["typ", "v"])
            .aggregate([("v", "count")])
        )
        return pa.table(
            {
                "typ": g.column("typ"),
                "v": g.column("v"),
                "n": g.column("v_count").cast(pa.int64()),
            }
        )

    hist = _small_df(
        events.select_columns([type_col, value_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["typ", "v"])
        .aggregate(Sum("n")),
        {"typ": object, "v": np.int64, "sum(n)": np.int64},
    )
    if not len(hist):
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
    typ = hist["typ"].to_numpy(object).astype(str)
    v = hist["v"].to_numpy(np.int64)
    n = hist["sum(n)"].to_numpy(np.int64)
    order = np.lexsort((v, typ))
    typ, v, n = typ[order], v[order], n[order]
    starts = np.flatnonzero(np.concatenate(([True], typ[1:] != typ[:-1])))
    ends = np.concatenate((starts[1:], [typ.size]))

    def disc_median(vals: np.ndarray, cnts: np.ndarray) -> int:
        cum = np.cumsum(cnts)
        rank = (int(cum[-1]) + 1) // 2
        return int(vals[np.searchsorted(cum, max(rank, 1))])

    rows = []
    for s, e in zip(starts, ends):
        med = disc_median(v[s:e], n[s:e])
        dev = np.abs(v[s:e] - med)
        o2 = np.argsort(dev, kind="stable")
        # merge equal deviations (v below and above med can collide)
        dv, inv = np.unique(dev[o2], return_inverse=True)
        dn = np.bincount(inv, weights=n[s:e][o2]).astype(np.int64)
        mad = disc_median(dv, dn)
        rows.append((str(typ[s]), int(n[s:e].sum()), med, mad))
    return ray.data.from_arrow(
        pa.table(
            {
                type_col: pa.array([r[0] for r in rows], pa.string()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "med_cents": pa.array([r[2] for r in rows], pa.int64()),
                "mad_cents": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# Session 13: sub-document CDC dedup, one-pass Poisson bootstrap,
# Johnson-Lindenstrauss sign projection.
# ---------------------------------------------------------------------------

_CDC_WIN = 8
_CDC_POW = np.array([31 ** (7 - k) for k in range(8)], dtype=np.int64)


def _cdc_chunk_partials(id_col: str, text_col: str, mask: int, n_buckets: int):
    """Build the per-batch CDC chunker: cuts where the rolling 8-char
    window hash is 0 mod ``mask``; emits one row per DISTINCT
    (chunk md5, doc) with its occurrence count and char length, plus the
    hash bucket for the downstream bounded-group shuffle."""
    import hashlib

    def chunker(batch: pa.Table) -> pa.Table:
        ids_ = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        hs: List[int] = []
        ds_: List[int] = []
        ln: List[int] = []
        oc: List[int] = []
        per_doc: "dict[tuple[int, bytes], tuple[int, int]]" = {}
        for did, txt in zip(ids_, texts):
            if not txt:
                continue
            cp = np.frombuffer(txt.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int64
            )
            n = cp.size
            if n >= _CDC_WIN:
                win = np.lib.stride_tricks.sliding_window_view(cp, _CDC_WIN)
                hv = win @ _CDC_POW
                cuts = np.flatnonzero(hv % mask == 0) + _CDC_WIN  # 1-based ends
                if cuts.size == 0 or cuts[-1] != n:
                    cuts = np.append(cuts, n)
            else:
                cuts = np.array([n], dtype=np.int64)
            start = 0
            for e in cuts:
                chunk = txt[start : int(e)]
                start = int(e)
                key = (int(did), hashlib.md5(chunk.encode()).digest())
                occ, _ = per_doc.get(key, (0, 0))
                per_doc[key] = (occ + 1, len(chunk))
        for (did, dig), (occ, clen) in per_doc.items():
            hs.append(int.from_bytes(dig[:8], "big") >> 1)
            ds_.append(did)
            oc.append(occ)
            ln.append(clen)
        h = np.array(hs, dtype=np.int64)
        return pa.table(
            {
                "bkt": pa.array(h % n_buckets if h.size else h, pa.int64()),
                "h": pa.array(h, pa.int64()),
                "d": pa.array(np.array(ds_, dtype=np.int64), pa.int64()),
                "occ": pa.array(np.array(oc, dtype=np.int64), pa.int64()),
                "clen": pa.array(np.array(ln, dtype=np.int64), pa.int64()),
            }
        )

    return chunker


def cdc_chunks_ds(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask: int = 64,
    n_buckets: int = 256,
) -> Dataset:
    """Content-defined chunking (CDC) shared-chunk histogram — the
    storage-dedup modality (LBFS / Venti style): split every document at
    positions where a rolling window hash of the last ``_CDC_WIN``
    characters satisfies ``h % mask == 0``, then count how many distinct
    documents share each chunk.  Because boundaries depend only on local
    content, a paragraph pasted into two otherwise-different documents
    yields byte-identical chunks — sub-document verbatim reuse that
    document-level MinHash misses (the chunk level of Lee et al.'s
    exact-substring dedup, reference-free).

    Window hash: ``sum(cp[k] * 31^(7-k))`` over the 8 code points ending
    at the position (no min/max chunk length — every qualifying position
    cuts, so the rule is order-free and embarrassingly parallel).  Docs
    shorter than the window form a single whole-text chunk.

    Output: one row per distinct-document count ``n_docs`` with the
    number of distinct chunk values, total occurrences, and summed
    distinct-chunk character length.

    Scale shape: per-batch chunker emits ``(md5(chunk), doc, occ, len)``
    partials deduped per (chunk, doc); ONE ``hash % n_buckets`` shuffle
    co-locates each chunk value in a BOUNDED group count; buckets
    segment with one lexsort and emit tiny ``n_docs`` histograms that a
    final small groupby folds."""
    chunker = _cdc_chunk_partials(id_col, text_col, mask, n_buckets)

    def bucket_hist(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "n_docs": pa.array([], pa.int64()),
                "nc": pa.array([], pa.int64()),
                "occ": pa.array([], pa.int64()),
                "cb": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        h = group.column("h").to_numpy(zero_copy_only=False)
        d = group.column("d").to_numpy(zero_copy_only=False)
        occ = group.column("occ").to_numpy(zero_copy_only=False)
        clen = group.column("clen").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        h, d, occ, clen = h[order], d[order], occ[order], clen[order]
        starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
        seg = np.zeros(h.size, dtype=np.int64)
        seg[starts] = 1
        seg = np.cumsum(seg) - 1
        nd = np.bincount(seg).astype(np.int64)  # rows are (chunk, doc) unique
        tot_occ = np.bincount(seg, weights=occ).astype(np.int64)
        cl = clen[starts]
        uniq_nd, inv = np.unique(nd, return_inverse=True)
        return pa.table(
            {
                "n_docs": pa.array(uniq_nd, pa.int64()),
                "nc": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "occ": pa.array(
                    np.bincount(inv, weights=tot_occ).astype(np.int64), pa.int64()
                ),
                "cb": pa.array(
                    np.bincount(inv, weights=cl).astype(np.int64), pa.int64()
                ),
            }
        )

    hist = (
        docs.select_columns([id_col, text_col])
        .map_batches(chunker, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(bucket_hist, batch_format="pyarrow")
        .groupby("n_docs")
        .aggregate(Sum("nc"), Sum("occ"), Sum("cb"))
    )
    df = _small_df(
        hist,
        {
            "n_docs": np.int64,
            "sum(nc)": np.int64,
            "sum(occ)": np.int64,
            "sum(cb)": np.int64,
        },
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "n_docs": pa.array(df["n_docs"].to_numpy(np.int64), pa.int64()),
                "n_chunks": pa.array(df["sum(nc)"].to_numpy(np.int64), pa.int64()),
                "occurrences": pa.array(df["sum(occ)"].to_numpy(np.int64), pa.int64()),
                "chunk_chars": pa.array(df["sum(cb)"].to_numpy(np.int64), pa.int64()),
            }
        )
    )


_POIS1_T = np.array(
    [
        1580030168,
        3160060337,
        3950075421,
        4213413783,
        4279248373,
        4292415291,
        4294609777,
        4294923276,
        4294962463,
    ],
    dtype=np.int64,
)


def poisson_bootstrap_ds(
    docs: Dataset,
    group_col: str = "source",
    val_col: str = "n_chars",
    id_col: str = "doc_id",
    n_reps: int = 16,
) -> Dataset:
    """One-pass Poisson bootstrap of the mean document length per source:
    each (row, replicate) pair draws a deterministic Poisson(1) weight
    (inverse-CDF on a 32-bit md5 uniform), so every replicate is a
    with-replacement resample computed WITHOUT materializing resample
    indices — the only bootstrap shape that works on a 100 TB corpus
    (one streaming pass, no per-replicate shuffle; Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", Google 2012).

    Output per (source, rep): effective resample size ``n_eff``,
    weighted char sum, and the exact floor-divided mean in millichars.

    Scale shape: a single ``map_batches`` pass emits per-batch
    (source, rep) partial sums; the global fold is a groupby over the
    tiny ``sources x n_reps`` domain."""
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        ids_ = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals = batch.column(val_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        src = batch.column(group_col).to_pylist()
        n = len(src)
        if n == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "rep": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                    "ws": pa.array([], pa.int64()),
                }
            )
        h = np.empty((n, n_reps), dtype=np.int64)
        for i, did in enumerate(ids_):
            pre = f"pb|{int(did)}|"
            for b in range(n_reps):
                h[i, b] = int(
                    hashlib.md5((pre + str(b)).encode()).hexdigest()[:8], 16
                )
        w = np.searchsorted(_POIS1_T, h.ravel(), side="right").reshape(n, n_reps)
        t = pa.table(
            {
                group_col: pa.array(np.repeat(np.array(src, dtype=object), n_reps)),
                "rep": pa.array(np.tile(np.arange(n_reps, dtype=np.int64), n), pa.int64()),
                "ne": pa.array(w.ravel().astype(np.int64), pa.int64()),
                "ws": pa.array(
                    (w * vals[:, None]).ravel().astype(np.int64), pa.int64()
                ),
            }
        )
        g = t.group_by([group_col, "rep"]).aggregate([("ne", "sum"), ("ws", "sum")])
        return g.rename_columns([group_col, "rep", "ne", "ws"])

    agg = (
        docs.select_columns([id_col, group_col, val_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, "rep"])
        .aggregate(Sum("ne"), Sum("ws"))
    )
    df = _small_df(
        agg,
        {group_col: object, "rep": np.int64, "sum(ne)": np.int64, "sum(ws)": np.int64},
    )
    ne = df["sum(ne)"].to_numpy(np.int64)
    ws = df["sum(ws)"].to_numpy(np.int64)
    keep = ne > 0
    mean_e3 = np.zeros(ne.size, dtype=np.int64)
    mean_e3[keep] = ws[keep] * 1000 // ne[keep]
    return ray.data.from_arrow(
        pa.table(
            {
                group_col: pa.array(df[group_col].astype(str)[keep], pa.string()),
                "rep": pa.array(df["rep"].to_numpy(np.int64)[keep], pa.int64()),
                "n_eff": pa.array(ne[keep], pa.int64()),
                "sum_chars": pa.array(ws[keep], pa.int64()),
                "mean_chars_e3": pa.array(mean_e3[keep], pa.int64()),
            }
        )
    )


def _rp_signs(k: int, dim: int) -> np.ndarray:
    """Deterministic +/-1 Johnson-Lindenstrauss sign matrix (k x dim),
    seeded from md5 so the DuckDB twin reproduces it bit-exactly."""
    import hashlib

    s = np.empty((k, dim), dtype=np.int64)
    for j in range(k):
        for d in range(dim):
            hv = int(hashlib.md5(f"rp|{j}|{d}".encode()).hexdigest()[:8], 16)
            s[j, d] = 1 if hv % 2 == 0 else -1
    return s


def rand_projection_ds(
    emb: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
) -> Dataset:
    """Johnson-Lindenstrauss sign random projection (Achlioptas 2001
    "Database-friendly random projections"): project each embedding onto
    ``k`` deterministic +/-1 sign vectors over e6-quantized components —
    the standard dimension-reduction front end before LSH bucketing or
    ANN indexing at corpus scale.  Emits the projected vector plus the
    exact squared-norm pair (``l2q``, ``p2``) whose ratio audits JL
    distance preservation (E[p2] = k * l2q) division-free, so every
    column stays integer-exact.

    Scale shape: the k x dim sign matrix is a module-level constant built
    once per worker (never shipped per batch); the projection is one
    integer matmul per batch; no shuffle at all."""
    sign_cache: "dict[int, np.ndarray]" = {}

    def project(batch: pa.Table) -> pa.Table:
        ids_ = batch.column(id_col).cast(pa.int64())
        col = batch.column(vec_col).combine_chunks()
        n = batch.num_rows
        if n == 0:
            cols = {id_col: pa.array([], pa.int64())}
            for j in range(k):
                cols[f"proj_{j}"] = pa.array([], pa.int64())
            cols["l2q"] = pa.array([], pa.int64())
            cols["p2"] = pa.array([], pa.int64())
            return pa.table(cols)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(col.flatten(), dtype=np.float64)
        dim = flat.size // n
        q = np.floor(flat * 1e6).astype(np.int64).reshape(n, dim)
        s = sign_cache.get(dim)
        if s is None:
            s = _rp_signs(k, dim)
            sign_cache[dim] = s
        proj = q @ s.T
        cols = {id_col: ids_}
        for j in range(k):
            cols[f"proj_{j}"] = pa.array(proj[:, j], pa.int64())
        cols["l2q"] = pa.array((q * q).sum(axis=1), pa.int64())
        cols["p2"] = pa.array((proj * proj).sum(axis=1), pa.int64())
        return pa.table(cols)

    return emb.select_columns([id_col, vec_col]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )


def motif_pairs_ds(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    win: int = 4,
    n_buckets: int = 512,
) -> Dataset:
    """Matrix-profile-style motif discovery per key (Yeh et al. 2016,
    simplified to exact integers): among all length-``win`` sliding
    windows of the cents-quantized value series (ordered by ts,
    event_id), the NON-OVERLAPPING window pair with minimum L1 distance
    — the "repeated shape" diagnostic behind time-series motif mining,
    fraud-pattern search and sensor-template discovery.  Ties break on
    the smallest (first, second) 1-based window index.

    Scale shape: 32-byte projection shuffles ONCE by ``mix64(key)``
    bucket (bounded group count); per-key series segment inside the
    bucket via one lexsort; the O(w^2) distance matrix is per-key local
    and bounded by the per-key window count."""
    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("win_a", pa.int64()),
            ("win_b", pa.int64()),
            ("l1_cents", pa.int64()),
        ]
    )

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "bkt": pa.array([], pa.int64()),
                    "k": pa.array([], pa.int64()),
                    "t": pa.array([], pa.int64()),
                    "e": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                }
            )
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        e = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = np.floor(
            batch.column(val_col).cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(k) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "k": pa.array(k),
                "t": pa.array(t),
                "e": pa.array(e),
                "v": pa.array(v),
            }
        )

    def bucket_motifs(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows == 0:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        e = group.column("e").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, k))
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        ends = np.concatenate((starts[1:], [k.size]))
        ks: List[int] = []
        ia: List[int] = []
        ib: List[int] = []
        dd: List[int] = []
        for s, en in zip(starts, ends):
            series = v[s:en]
            if series.size < 2 * win:
                continue
            w = np.lib.stride_tricks.sliding_window_view(series, win)
            d = np.abs(w[:, None, :] - w[None, :, :]).sum(axis=2)
            i_idx, j_idx = np.meshgrid(
                np.arange(w.shape[0]), np.arange(w.shape[0]), indexing="ij"
            )
            valid = j_idx >= i_idx + win
            dv = d[valid]
            iv, jv = i_idx[valid], j_idx[valid]
            best = dv.min()
            cand = np.flatnonzero(dv == best)
            # ties: smallest ia then ib — candidate order is already
            # row-major (i asc, j asc), so the first hit wins
            c = cand[0]
            ks.append(int(k[s]))
            ia.append(int(iv[c]) + 1)
            ib.append(int(jv[c]) + 1)
            dd.append(int(best))
        return pa.table(
            {
                key_col: pa.array(ks, pa.int64()),
                "win_a": pa.array(ia, pa.int64()),
                "win_b": pa.array(ib, pa.int64()),
                "l1_cents": pa.array(dd, pa.int64()),
            }
        )

    return _anchor_schema(
        events.select_columns([key_col, ts_col, id_col, val_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(bucket_motifs, batch_format="pyarrow"),
        out_schema,
    )


def regression_fit_ds(
    orders: Dataset,
    key_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    val_col: str = "o_totalprice",
    day_us: int = 86_400_000_000,
    min_n: int = 3,
) -> Dataset:
    """Per-key ordinary-least-squares goodness of fit: the exact
    R-squared (permille) of spend-cents against order-day — the
    model-quality audit over the same (x, y) pairs whose slope the
    ``trend`` operator reports.  All moments are integer sums;
    R^2 = (n*sxy - sx*sy)^2 / ((n*sxx - sx^2)(n*syy - sy^2)) is
    evaluated in arbitrary-precision Python ints (the numerator square
    exceeds int64), floor-quantized to permille.  Keys with fewer than
    ``min_n`` orders or a degenerate variance are excluded.

    Scale shape: per-batch moment combiner (6 int64 partials per key)
    -> ONE groupby over the key domain -> a vectorized-percolumn
    map_batches evaluates the big-int formula on the report-sized
    aggregate; nothing collects on the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sx": pa.array([], pa.int64()),
                "sy": pa.array([], pa.int64()),
                "sxx": pa.array([], pa.int64()),
                "sxy": pa.array([], pa.int64()),
                "syy": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = (
            batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
            // day_us
        )
        y = np.floor(
            batch.column(val_col).cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pa.array(k),
                "n": pa.array(np.ones(k.size, dtype=np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "sxy": pa.array(x * y),
                "syy": pa.array(y * y),
            }
        )
        g = t.group_by("k").aggregate(
            [
                ("n", "sum"),
                ("sx", "sum"),
                ("sy", "sum"),
                ("sxx", "sum"),
                ("sxy", "sum"),
                ("syy", "sum"),
            ]
        )
        return g.rename_columns(["k", "n", "sx", "sy", "sxx", "sxy", "syy"])

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "r2_permille": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "k" not in batch.column_names:
            return empty
        ks = batch.column("k").to_pylist()
        n = batch.column("sum(n)").to_pylist()
        sx = batch.column("sum(sx)").to_pylist()
        sy = batch.column("sum(sy)").to_pylist()
        sxx = batch.column("sum(sxx)").to_pylist()
        sxy = batch.column("sum(sxy)").to_pylist()
        syy = batch.column("sum(syy)").to_pylist()
        ok: List[int] = []
        nn: List[int] = []
        r2: List[int] = []
        for i in range(len(ks)):
            if n[i] < min_n:
                continue
            dx = n[i] * sxx[i] - sx[i] * sx[i]
            dy = n[i] * syy[i] - sy[i] * sy[i]
            if dx <= 0 or dy <= 0:
                continue
            num = n[i] * sxy[i] - sx[i] * sy[i]
            ok.append(ks[i])
            nn.append(n[i])
            r2.append(num * num * 1000 // (dx * dy))
        return pa.table(
            {
                key_col: pa.array(ok, pa.int64()),
                "n": pa.array(nn, pa.int64()),
                "r2_permille": pa.array(r2, pa.int64()),
            }
        )

    return (
        orders.select_columns([key_col, ts_col, val_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Sum("n"), Sum("sx"), Sum("sy"), Sum("sxx"), Sum("sxy"), Sum("syy"))
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


def _levenshtein(a: str, b: str) -> int:
    """Exact unit-cost edit distance, row-vectorized DP (matches DuckDB
    ``levenshtein``).  The insertion sweep uses the prefix-min identity
    ``cur[j] = j + min_k<=j (cur[k] - k)``."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la or lb
    aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    rng = np.arange(lb + 1, dtype=np.int64)
    prev = rng.copy()
    cur = np.empty(lb + 1, dtype=np.int64)
    for i in range(la):
        cur[0] = i + 1
        np.minimum(prev[:-1] + (bb != aa[i]), prev[1:] + 1, out=cur[1:])
        cur = np.minimum(cur, np.minimum.accumulate(cur - rng) + rng)
        prev, cur = cur, prev
    return int(prev[-1])


def dup_edit_audit_ds(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 24,
    trunc: int = 256,
    max_block: int = 64,
    n_buckets: int = 256,
) -> Dataset:
    """Near-duplicate EDIT-DISTANCE audit with prefix blocking: documents
    sharing their first ``prefix_len`` characters form candidate blocks
    (the cheap blocking key of record-linkage pipelines); every in-block
    pair gets the exact unit-cost Levenshtein distance of its first
    ``trunc`` characters — the threshold-calibration measurement behind
    "how different are my near-dups really".  Blocks cap at the
    ``max_block`` LOWEST doc ids (deterministic, mirrored in SQL), so a
    boilerplate block can never go quadratic unbounded.

    Scale shape: prefix-hash projection shuffles ONCE by hash bucket
    (bounded groups); blocks segment inside the bucket; the DP cost is
    per-pair local and bounded by ``max_block^2 * trunc^2``."""
    import hashlib

    out_schema = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("lev", pa.int64()),
        ]
    )

    def project(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bkt": pa.array([], pa.int64()),
                "h": pa.array([], pa.int64()),
                "d": pa.array([], pa.int64()),
                "txt": pa.array([], pa.string()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids_ = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        hs: List[int] = []
        ds_: List[int] = []
        tx: List[str] = []
        for did, txt in zip(ids_, texts):
            if txt is None or len(txt) < prefix_len:
                continue
            h = int.from_bytes(
                hashlib.md5(txt[:prefix_len].encode()).digest()[:8], "big"
            ) >> 1
            hs.append(h)
            ds_.append(int(did))
            tx.append(txt[:trunc])
        h = np.array(hs, dtype=np.int64)
        return pa.table(
            {
                "bkt": pa.array(h % n_buckets if h.size else h, pa.int64()),
                "h": pa.array(h, pa.int64()),
                "d": pa.array(np.array(ds_, dtype=np.int64), pa.int64()),
                "txt": pa.array(tx, pa.string()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows == 0:
            return empty
        h = group.column("h").to_numpy(zero_copy_only=False)
        d = group.column("d").to_numpy(zero_copy_only=False)
        txt = group.column("txt").to_pylist()
        order = np.lexsort((d, h))
        h, d = h[order], d[order]
        txt = [txt[i] for i in order]
        starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
        ends = np.concatenate((starts[1:], [h.size]))
        da: List[int] = []
        db: List[int] = []
        lv: List[int] = []
        for s, e in zip(starts, ends):
            m = min(e - s, max_block)
            for i in range(s, s + m):
                for j in range(i + 1, s + m):
                    da.append(int(d[i]))
                    db.append(int(d[j]))
                    lv.append(_levenshtein(txt[i], txt[j]))
        return pa.table(
            {
                "doc_a": pa.array(da, pa.int64()),
                "doc_b": pa.array(db, pa.int64()),
                "lev": pa.array(lv, pa.int64()),
            }
        )

    return _anchor_schema(
        docs.select_columns([id_col, text_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(bucket_pairs, batch_format="pyarrow"),
        out_schema,
    )


_PH_VOWELS = frozenset("aeiou")


def _phonetic_key(tok: str) -> str:
    """First char + non-vowel remainder, consecutive duplicates
    collapsed on the vowel-stripped sequence (soundex-lite; mirrors the
    SQL twin's lag-based island rule)."""
    seq = [tok[0]] + [c for c in tok[1:] if c not in _PH_VOWELS]
    out = [seq[0]]
    for c in seq[1:]:
        if c != out[-1]:
            out.append(c)
    return "".join(out)


def phonetic_keys_ds(
    docs: Dataset,
    text_col: str = "text",
    min_len: int = 4,
    max_len: int = 16,
    n_buckets: int = 256,
) -> Dataset:
    """Phonetic-key blocking over the corpus vocabulary (the classic
    record-linkage "sounds-alike" join key, soundex-lite variant):
    lowercase alphabetic tokens map to first-char + deduplicated
    consonant skeleton.  Emits the FULL blocking-key table — per key the
    distinct-token count, total corpus occurrences and the
    lexicographic min/max member; rows with ``n_tokens >= 2`` are the
    phonetic collision classes a fuzzy-matching pipeline blocks on.

    Scale shape: token counts via the per-batch Arrow count combiner ->
    ONE vocab groupby; key derivation runs on the BOUNDED distinct-token
    table; one more hash-bucket shuffle groups keys."""
    import re

    tok_re = re.compile(r"[a-z]+\Z")

    out_schema = pa.schema(
        [
            ("pkey", pa.string()),
            ("n_tokens", pa.int64()),
            ("n_occ", pa.int64()),
            ("tok_min", pa.string()),
            ("tok_max", pa.string()),
        ]
    )

    def tf_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        flat = pc.list_flatten(
            pc.split_pattern(
                pc.utf8_lower(pc.fill_null(batch.column(text_col), "")), pattern=" "
            )
        )
        if len(flat) == 0:
            return empty
        g = pa.table({"token": flat}).group_by("token").aggregate([("token", "count")])
        return pa.table(
            {
                "token": g.column("token"),
                "n": g.column("token_count").cast(pa.int64()),
            }
        )

    totals = (
        docs.select_columns([text_col])
        .map_batches(tf_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n"))
    )

    def keyed(batch: pa.Table) -> pa.Table:
        import hashlib

        empty = pa.table(
            {
                "bkt": pa.array([], pa.int64()),
                "pkey": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "occ": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "token" not in batch.column_names:
            return empty
        toks = batch.column("token").to_pylist()
        occ = batch.column("sum(n)").to_numpy(zero_copy_only=False)
        bk: List[int] = []
        pk: List[str] = []
        tk: List[str] = []
        oc: List[int] = []
        for t, o in zip(toks, occ):
            if t is None or not (min_len <= len(t) <= max_len) or not tok_re.match(t):
                continue
            key = _phonetic_key(t)
            bk.append(
                int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")
                % n_buckets
            )
            pk.append(key)
            tk.append(t)
            oc.append(int(o))
        return pa.table(
            {
                "bkt": pa.array(bk, pa.int64()),
                "pkey": pa.array(pk, pa.string()),
                "token": pa.array(tk, pa.string()),
                "occ": pa.array(oc, pa.int64()),
            }
        )

    def bucket_fold(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows == 0:
            return empty
        g = group.group_by("pkey").aggregate(
            [("token", "count"), ("occ", "sum"), ("token", "min"), ("token", "max")]
        )
        return pa.table(
            {
                "pkey": g.column("pkey"),
                "n_tokens": g.column("token_count").cast(pa.int64()),
                "n_occ": g.column("occ_sum").cast(pa.int64()),
                "tok_min": g.column("token_min"),
                "tok_max": g.column("token_max"),
            }
        )

    return _anchor_schema(
        totals.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(bucket_fold, batch_format="pyarrow"),
        out_schema,
    )


def cdc_families_ds(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask: int = 64,
    min_chunk_len: int = 16,
    max_chunk_docs: int = 64,
    n_buckets: int = 256,
) -> Dataset:
    """Verbatim-reuse families: connected components of the
    chunk-sharing graph — two documents are linked when they share a
    content-defined chunk of at least ``min_chunk_len`` characters, and
    families are the transitive closure (the sub-document analogue of
    MinHash dedup clusters: press-release syndication, quote chains,
    licence blocks).  Chunks claimed by more than ``max_chunk_docs``
    documents are ubiquitous boilerplate and are EXCLUDED from edge
    building (the LSH hot-bucket cap pattern; mirrored in the SQL twin)
    so one viral chunk can never collapse the corpus into one family.

    Output: ``(doc_id, family_id)`` for every document in a family of
    >= 2, with ``family_id`` = the component's minimum doc id.

    Scale shape: CDC chunker partials -> ONE chunk-hash bucket shuffle
    (bounded groups) -> per-chunk star edges to the minimum doc ->
    hash-min label propagation with pointer doubling
    (:func:`corpus_ops._min_label_propagation`, O(log diameter)
    rounds)."""
    from .corpus_ops import _min_label_propagation

    out_schema = pa.schema([(id_col, pa.int64()), ("family_id", pa.int64())])
    chunker = _cdc_chunk_partials(id_col, text_col, mask, n_buckets)

    def bucket_edges(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        if group.num_rows == 0:
            return empty
        keep = pc.greater_equal(group.column("clen"), min_chunk_len)
        group = group.filter(keep)
        if group.num_rows == 0:
            return empty
        h = group.column("h").to_numpy(zero_copy_only=False)
        d = group.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        h, d = h[order], d[order]
        starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
        ends = np.concatenate((starts[1:], [h.size]))
        sizes = ends - starts
        ok = (sizes >= 2) & (sizes <= max_chunk_docs)
        a_: List[np.ndarray] = []
        b_: List[np.ndarray] = []
        for s, e in zip(starts[ok], ends[ok]):
            a_.append(np.full(e - s - 1, d[s], dtype=np.int64))
            b_.append(d[s + 1 : e])
        if not a_:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_), pa.int64()),
                "b": pa.array(np.concatenate(b_), pa.int64()),
            }
        )

    pairs = (
        docs.select_columns([id_col, text_col])
        .map_batches(chunker, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(bucket_edges, batch_format="pyarrow")
    )
    pairs = _anchor_schema(
        pairs, pa.schema([("a", pa.int64()), ("b", pa.int64())])
    ).materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
    labels = _min_label_propagation(pairs, "a", "b")
    return labels.map_batches(
        lambda b: pa.table(
            {id_col: b.column("node"), "family_id": b.column("label")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def gini_stump_ds(
    docs: Dataset,
    feat_col: str = "n_chars",
    label_col: str = "lang",
    top_k: int = 5,
) -> Dataset:
    """Exact decision-stump screening (CART-style, Breiman 1984): the
    ``top_k`` integer thresholds ``t`` on ``feat_col`` that minimize the
    weighted Gini impurity of the ``label_col`` partition
    (``feat <= t`` vs ``> t``) — the feature-quality audit run before
    committing a cheap rule-based quality filter.  Impurity is the exact
    floor-quantized ``1e6 - (SL*nR + SR*nL) * 1e6 // (n*nL*nR)`` with
    ``SL/SR`` the summed squared class counts (arbitrary-precision
    Python ints — the cubic numerator exceeds int64); ties break on the
    smaller threshold.

    Scale shape: per-batch (feat, label) count combiner -> ONE groupby
    over the (distinct feature values x label) domain (bounded by the
    value domain, NOT the corpus) -> cumulative sweep on the collected
    grid."""
    out_schema = pa.schema(
        [
            ("threshold", pa.int64()),
            ("n_left", pa.int64()),
            ("n_right", pa.int64()),
            ("impurity_e6", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "v": pa.array([], pa.int64()),
                "g": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        t = pa.table(
            {
                "v": batch.column(feat_col).cast(pa.int64()),
                "g": batch.column(label_col).cast(pa.string()),
            }
        )
        gg = t.group_by(["v", "g"]).aggregate([("v", "count")])
        return pa.table(
            {
                "v": gg.column("v"),
                "g": gg.column("g"),
                "c": gg.column("v_count").cast(pa.int64()),
            }
        )

    grid = _small_df(
        docs.select_columns([feat_col, label_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["v", "g"])
        .aggregate(Sum("c")),
        {"v": np.int64, "g": object, "sum(c)": np.int64},
    )
    empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
    if not len(grid):
        return ray.data.from_arrow(empty)
    v = grid["v"].to_numpy(np.int64)
    g = grid["g"].astype(str).to_numpy()
    c = grid["sum(c)"].to_numpy(np.int64)
    ts = np.unique(v)
    langs, gcode = np.unique(g, return_inverse=True)
    # dense counts grid: rows = thresholds, cols = labels
    vi = np.searchsorted(ts, v)
    dense = np.zeros((ts.size, langs.size), dtype=np.int64)
    np.add.at(dense, (vi, gcode), c)
    cum = np.cumsum(dense, axis=0)
    tot = cum[-1]
    n = int(tot.sum())
    rows: List[tuple] = []
    for i in range(ts.size - 1):  # last value splits nothing to the right
        nl = int(cum[i].sum())
        nr = n - nl
        if nl == 0 or nr == 0:
            continue
        sl = sum(int(x) * int(x) for x in cum[i])
        sr = sum(int(x - y) * int(x - y) for x, y in zip(tot, cum[i]))
        imp = 1_000_000 - (sl * nr + sr * nl) * 1_000_000 // (n * nl * nr)
        rows.append((imp, int(ts[i]), nl, nr))
    if not rows:
        return ray.data.from_arrow(empty)
    rows.sort()
    rows = rows[:top_k]
    return ray.data.from_arrow(
        pa.table(
            {
                "threshold": pa.array([r[1] for r in rows], pa.int64()),
                "n_left": pa.array([r[2] for r in rows], pa.int64()),
                "n_right": pa.array([r[3] for r in rows], pa.int64()),
                "impurity_e6": pa.array([r[0] for r in rows], pa.int64()),
            }
        )
    )


def seasonal_naive_error_ds(
    events: Dataset,
    type_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    period_days: int = 7,
    day_us: int = 86_400_000_000,
) -> Dataset:
    """Forecast-baseline accuracy audit: the mean absolute error of the
    SEASONAL-NAIVE predictor (today's daily total = the total
    ``period_days`` ago) per event type — the sanity floor every
    demand/traffic forecasting model must beat (Hyndman & Athanasopoulos,
    "Forecasting: Principles and Practice").  Days without a
    lag-``period_days`` observation are excluded from the evaluation.
    All values are exact cents; ``mae_cents_e3 = err_sum * 1000 // n``.

    Scale shape: per-batch (type, day) cents combiner -> ONE groupby
    over the bounded (type x day) domain -> the lag join runs on the
    collected daily table (days x types, report-sized by construction)."""
    out_schema = pa.schema(
        [
            (type_col, pa.string()),
            ("n_eval", pa.int64()),
            ("abs_err_sum", pa.int64()),
            ("mae_cents_e3", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    type_col: pa.array([], pa.string()),
                    "day": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        t = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = np.floor(
            batch.column(val_col).cast(pa.float64()).to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        g = (
            pa.table(
                {
                    type_col: batch.column(type_col),
                    "day": pa.array(t // day_us, pa.int64()),
                    "s": pa.array(v, pa.int64()),
                }
            )
            .group_by([type_col, "day"])
            .aggregate([("s", "sum")])
        )
        return g.rename_columns([type_col, "day", "s"])

    df = _small_df(
        events.select_columns([type_col, ts_col, val_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([type_col, "day"])
        .aggregate(Sum("s")),
        {type_col: object, "day": np.int64, "sum(s)": np.int64},
    )
    if not len(df):
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
    typ = df[type_col].astype(str).to_numpy()
    day = df["day"].to_numpy(np.int64)
    s = df["sum(s)"].to_numpy(np.int64)
    order = np.lexsort((day, typ))
    typ, day, s = typ[order], day[order], s[order]
    starts = np.flatnonzero(np.concatenate(([True], typ[1:] != typ[:-1])))
    ends = np.concatenate((starts[1:], [typ.size]))
    names: List[str] = []
    nn: List[int] = []
    es: List[int] = []
    me: List[int] = []
    for st, en in zip(starts, ends):
        d, v = day[st:en], s[st:en]
        pos = np.searchsorted(d, d - period_days)
        pos_c = np.clip(pos, 0, d.size - 1)
        hit = d[pos_c] == d - period_days
        if not hit.any():
            continue
        err = int(np.abs(v[hit] - v[pos_c][hit]).sum())
        n = int(hit.sum())
        names.append(str(typ[st]))
        nn.append(n)
        es.append(err)
        me.append(err * 1000 // n)
    return ray.data.from_arrow(
        pa.table(
            {
                type_col: pa.array(names, pa.string()),
                "n_eval": pa.array(nn, pa.int64()),
                "abs_err_sum": pa.array(es, pa.int64()),
                "mae_cents_e3": pa.array(me, pa.int64()),
            }
        )
    )


def feature_hashing_ds(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
) -> Dataset:
    """Hashing-trick bag-of-words featurization (Weinberger et al. 2009,
    "Feature Hashing for Large Scale Multitask Learning"): each token
    hashes to one of ``k`` signed slots (slot = md5 % k, sign from the
    next hash bit), giving every document a fixed-width integer feature
    vector with NO vocabulary build, broadcast, or shuffle — the
    classic way to featurize an unbounded token stream at corpus scale.

    Scale shape: pure ``map_batches``; md5 runs once per DISTINCT token
    per batch (vocab-bounded), then scatters vectorized."""
    import hashlib

    def project(batch: pa.Table) -> pa.Table:
        cols = {id_col: pa.array([], pa.int64())}
        for j in range(k):
            cols[f"fh_{j}"] = pa.array([], pa.int64())
        if batch.num_rows == 0:
            return pa.table(cols)
        toks = pc.split_pattern(
            pc.fill_null(batch.column(text_col), ""), pattern=" "
        )
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        parents = np.asarray(pc.list_parent_indices(flat))
        words = flat.flatten().to_pylist()
        uniq, inv = np.unique(np.array(words, dtype=object), return_inverse=True)
        slot_u = np.empty(uniq.size, dtype=np.int64)
        sign_u = np.empty(uniq.size, dtype=np.int64)
        for i, w in enumerate(uniq):
            h = int(hashlib.md5(str(w).encode()).hexdigest()[:8], 16)
            slot_u[i] = h % k
            sign_u[i] = 1 if (h // k) % 2 == 0 else -1
        fh = np.zeros((batch.num_rows, k), dtype=np.int64)
        np.add.at(fh, (parents, slot_u[inv]), sign_u[inv])
        out = {id_col: batch.column(id_col).cast(pa.int64())}
        for j in range(k):
            out[f"fh_{j}"] = pa.array(fh[:, j], pa.int64())
        return pa.table(out)

    return docs.select_columns([id_col, text_col]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )


def quantile_map_ds(
    docs: Dataset,
    group_col: str = "source",
    val_col: str = "n_chars",
) -> Dataset:
    """Exact quantile mapping (histogram matching / CDF alignment, the
    domain-adaptation primitive): for every ordered source pair (a, b)
    and every distinct value ``v`` seen in ``a``, the value in ``b``
    sitting at the same cumulative rank —
    ``mapped_v = min{ u in b : cdf_b(u) * n_a >= cdf_a(v) * n_b }``
    (cross-multiplied, so the comparison is integer-exact; always
    defined because cdf_b(max) = n_b).  The table answers "what length
    in source b corresponds to length v in source a", aligning
    per-source quality thresholds without floats.

    Scale shape: per-batch (source, value) count combiner -> ONE
    groupby over the bounded (source x value domain) grid -> pairwise
    searchsorted sweep on the collected grid (report-sized by
    construction)."""
    out_schema = pa.schema(
        [
            ("src_a", pa.string()),
            ("src_b", pa.string()),
            ("v", pa.int64()),
            ("cum_a", pa.int64()),
            ("mapped_v", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "v": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        g = (
            pa.table(
                {
                    group_col: batch.column(group_col),
                    "v": batch.column(val_col).cast(pa.int64()),
                }
            )
            .group_by([group_col, "v"])
            .aggregate([("v", "count")])
        )
        return pa.table(
            {
                group_col: g.column(group_col),
                "v": g.column("v"),
                "c": g.column("v_count").cast(pa.int64()),
            }
        )

    df = _small_df(
        docs.select_columns([group_col, val_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, "v"])
        .aggregate(Sum("c")),
        {group_col: object, "v": np.int64, "sum(c)": np.int64},
    )
    if not len(df):
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
    src = df[group_col].astype(str).to_numpy()
    v = df["v"].to_numpy(np.int64)
    c = df["sum(c)"].to_numpy(np.int64)
    order = np.lexsort((v, src))
    src, v, c = src[order], v[order], c[order]
    starts = np.flatnonzero(np.concatenate(([True], src[1:] != src[:-1])))
    ends = np.concatenate((starts[1:], [src.size]))
    per: "dict[str, tuple[np.ndarray, np.ndarray, int]]" = {}
    for s, e in zip(starts, ends):
        cum = np.cumsum(c[s:e])
        per[str(src[s])] = (v[s:e], cum, int(cum[-1]))
    names = sorted(per)
    sa: List[str] = []
    sb: List[str] = []
    vv: List[int] = []
    ca: List[int] = []
    mv: List[int] = []
    for a in names:
        va, cuma, na = per[a]
        for b in names:
            if b == a:
                continue
            vb, cumb, nb = per[b]
            # min u with cumb(u) * na >= cuma(v) * nb
            idx = np.searchsorted(cumb * na, cuma * nb, side="left")
            mapped = vb[np.clip(idx, 0, vb.size - 1)]
            sa.extend([a] * va.size)
            sb.extend([b] * va.size)
            vv.extend(va.tolist())
            ca.extend(cuma.tolist())
            mv.extend(mapped.tolist())
    return ray.data.from_arrow(
        pa.table(
            {
                "src_a": pa.array(sa, pa.string()),
                "src_b": pa.array(sb, pa.string()),
                "v": pa.array(vv, pa.int64()),
                "cum_a": pa.array(ca, pa.int64()),
                "mapped_v": pa.array(mv, pa.int64()),
            }
        )
    )


def effective_sample_size_ds(
    docs: Dataset,
    group_col: str = "source",
    w_col: str = "n_chars",
) -> Dataset:
    """Kish effective sample size per stratum (Kish 1965; the
    importance-sampling health diagnostic): with per-row weights ``w``,
    ``ESS = (sum w)^2 / (sum w^2)`` — how many EQUAL-weight samples the
    weighted set is worth.  ``ess_ratio_permille = ESS * 1000 / n``
    near 1000 means weights are flat; small values flag a stratum
    dominated by a few heavy rows (the failure mode of aggressive
    up/down-weighting).  Exact: the quadratic sums are int64 partials,
    the final ratios arbitrary-precision Python ints.

    Scale shape: one ``map_batches`` combiner pass (3 int64 partials
    per stratum) -> groupby over the tiny stratum domain."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "sw": pa.array([], pa.int64()),
                    "sw2": pa.array([], pa.int64()),
                }
            )
        w = batch.column(w_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                group_col: batch.column(group_col),
                "n": pa.array(np.ones(w.size, dtype=np.int64)),
                "sw": pa.array(w),
                "sw2": pa.array(w * w),
            }
        )
        g = t.group_by(group_col).aggregate(
            [("n", "sum"), ("sw", "sum"), ("sw2", "sum")]
        )
        return g.rename_columns([group_col, "n", "sw", "sw2"])

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_col: pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sum_w": pa.array([], pa.int64()),
                "sum_w2": pa.array([], pa.int64()),
                "ess_e3": pa.array([], pa.int64()),
                "ess_ratio_permille": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or group_col not in batch.column_names:
            return empty
        gs = batch.column(group_col).to_pylist()
        n = batch.column("sum(n)").to_pylist()
        sw = batch.column("sum(sw)").to_pylist()
        sw2 = batch.column("sum(sw2)").to_pylist()
        keep = [i for i in range(len(gs)) if sw2[i] > 0]
        return pa.table(
            {
                group_col: pa.array([str(gs[i]) for i in keep], pa.string()),
                "n": pa.array([n[i] for i in keep], pa.int64()),
                "sum_w": pa.array([sw[i] for i in keep], pa.int64()),
                "sum_w2": pa.array([sw2[i] for i in keep], pa.int64()),
                "ess_e3": pa.array(
                    [sw[i] * sw[i] * 1000 // sw2[i] for i in keep], pa.int64()
                ),
                "ess_ratio_permille": pa.array(
                    [sw[i] * sw[i] * 1000 // (n[i] * sw2[i]) for i in keep],
                    pa.int64(),
                ),
            }
        )

    return (
        docs.select_columns([group_col, w_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(Sum("n"), Sum("sw"), Sum("sw2"))
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


def dedup_modality_agreement_ds(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    min_chunk_len: int = 16,
    max_block: int = 64,
    n_buckets: int = 256,
) -> Dataset:
    """Cross-modality dedup AGREEMENT matrix: how the three duplicate
    definitions overlap on the same corpus — (1) EXACT byte-identical
    text, (2) near-dup word-shingle Jaccard >= threshold (the MinHash
    rule, exactly verified), (3) CDC shared-chunk (>= ``min_chunk_len``
    chars).  Emits ONE row of pair-set cardinalities and pairwise /
    triple intersections — the calibration table that tells a curation
    pipeline which cheap modality can stand in for which expensive one.
    Exact-dup groups and CDC chunk groups cap at the ``max_block``
    lowest doc ids (mirrored in SQL) so pathological blocks stay
    bounded.

    Scale shape: three pair generators (hash-bucket shuffles with
    bounded groups; the Jaccard side reuses the LSH-candidate + exact
    verify chain) -> per-pair flag fold (ONE pair-key groupby) ->
    seven-indicator combiner down to a single row."""
    from .corpus_ops import minhash_pairs_ds, ngram_jaccard_verify_ds

    import hashlib

    pair_schema = pa.schema(
        [
            ("a", pa.int64()),
            ("b", pa.int64()),
            ("e", pa.int64()),
            ("j", pa.int64()),
            ("c", pa.int64()),
        ]
    )

    def _flag_table(a: np.ndarray, b: np.ndarray, which: str) -> pa.Table:
        z = np.zeros(a.size, dtype=np.int64)
        o = np.ones(a.size, dtype=np.int64)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "e": pa.array(o if which == "e" else z),
                "j": pa.array(o if which == "j" else z),
                "c": pa.array(o if which == "c" else z),
            }
        )

    def _group_pairs(
        h: np.ndarray, d: np.ndarray, lo_ok: int, which: str
    ) -> pa.Table:
        order = np.lexsort((d, h))
        h, d = h[order], d[order]
        starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
        ends = np.concatenate((starts[1:], [h.size]))
        a_: List[np.ndarray] = []
        b_: List[np.ndarray] = []
        for s, e in zip(starts, ends):
            m = min(int(e - s), max_block)
            if m < lo_ok:
                continue
            dd = d[s : s + m]
            ii, jj = np.triu_indices(m, k=1)
            a_.append(dd[ii])
            b_.append(dd[jj])
        if not a_:
            return pa.table({f.name: pa.array([], f.type) for f in pair_schema})
        return _flag_table(np.concatenate(a_), np.concatenate(b_), which)

    # (1) exact-dup pairs
    def exact_project(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bkt": pa.array([], pa.int64()),
                "h": pa.array([], pa.int64()),
                "d": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids_ = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        hs = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5((t or "").encode()).digest()[:8], "big"
                )
                >> 1
                for t in texts
            ),
            np.int64,
            count=len(texts),
        )
        return pa.table(
            {
                "bkt": pa.array(hs % n_buckets if hs.size else hs, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "d": pa.array(ids_, pa.int64()),
            }
        )

    def exact_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in pair_schema})
        return _group_pairs(
            group.column("h").to_numpy(zero_copy_only=False),
            group.column("d").to_numpy(zero_copy_only=False),
            2,
            "e",
        )

    ex = (
        docs.select_columns([id_col, text_col])
        .map_batches(exact_project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(exact_pairs, batch_format="pyarrow")
    )

    # (2) verified-Jaccard near-dup pairs (LSH candidates + exact verify)
    cands = minhash_pairs_ds(
        docs, num_perm=64, bands=64, threshold=0.0, max_bucket=None
    )
    ver = ngram_jaccard_verify_ds(cands, docs, threshold=jaccard_threshold)

    def jac_flags(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in pair_schema})
        a = batch.column("doc_a").cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").cast(pa.int64()).to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return _flag_table(lo, hi, "j")

    jc = ver.map_batches(jac_flags, batch_format="pyarrow", zero_copy_batch=True)

    # (3) CDC shared-chunk pairs
    chunker = _cdc_chunk_partials(id_col, text_col, 64, n_buckets)

    def cdc_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in pair_schema})
        keep = pc.greater_equal(group.column("clen"), min_chunk_len)
        group = group.filter(keep)
        if group.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in pair_schema})
        return _group_pairs(
            group.column("h").to_numpy(zero_copy_only=False),
            group.column("d").to_numpy(zero_copy_only=False),
            2,
            "c",
        )

    cd = (
        docs.select_columns([id_col, text_col])
        .map_batches(chunker, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(cdc_pairs, batch_format="pyarrow")
    )

    union = _anchor_schema(ex.union(jc).union(cd), pair_schema)
    folded = union.groupby(["a", "b"]).aggregate(Max("e"), Max("j"), Max("c"))

    def products(batch: pa.Table) -> pa.Table:
        cols = [
            "n_exact",
            "n_jaccard",
            "n_cdc",
            "n_exact_jaccard",
            "n_exact_cdc",
            "n_jaccard_cdc",
            "n_all3",
        ]
        if batch.num_rows == 0 or "max(e)" not in batch.column_names:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        e = batch.column("max(e)").to_numpy(zero_copy_only=False)
        j = batch.column("max(j)").to_numpy(zero_copy_only=False)
        c = batch.column("max(c)").to_numpy(zero_copy_only=False)
        vals = [
            e.sum(),
            j.sum(),
            c.sum(),
            (e * j).sum(),
            (e * c).sum(),
            (j * c).sum(),
            (e * j * c).sum(),
        ]
        return pa.table(
            {nc: pa.array([int(v)], pa.int64()) for nc, v in zip(cols, vals)}
        )

    parts = _small_df(
        folded.map_batches(products, batch_format="pyarrow", zero_copy_batch=True),
        {
            "n_exact": np.int64,
            "n_jaccard": np.int64,
            "n_cdc": np.int64,
            "n_exact_jaccard": np.int64,
            "n_exact_cdc": np.int64,
            "n_jaccard_cdc": np.int64,
            "n_all3": np.int64,
        },
    )
    return ray.data.from_arrow(
        pa.table(
            {
                c: pa.array(
                    [int(parts[c].sum()) if len(parts) else 0], pa.int64()
                )
                for c in parts.columns
            }
        )
    )


def bow_dedup_ds(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> Dataset:
    """Bag-of-words (order-invariant) duplicate histogram: documents
    whose token MULTISETS are identical after sorting — the
    "shuffled plagiarism" modality that exact byte dedup misses and
    shingle Jaccard only catches probabilistically (reordered sentences
    keep the exact same bag).  Emits one row per group size with the
    number of bags and documents at that size; ``group_size >= 2`` rows
    are the order-invariant duplicate classes.

    Scale shape: one md5 per document over the sorted token join (the
    per-entity cost class of a MinHash signature) -> ONE bag-hash bucket
    shuffle (bounded groups) -> per-bucket size histogram -> tiny
    group-size fold."""
    import hashlib

    def project(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"bkt": pa.array([], pa.int64()), "h": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        texts = batch.column(text_col).to_pylist()
        hs = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(
                        " ".join(sorted((t or "").split(" "))).encode()
                    ).digest()[:8],
                    "big",
                )
                >> 1
                for t in texts
            ),
            np.int64,
            count=len(texts),
        )
        return pa.table(
            {
                "bkt": pa.array(hs % n_buckets if hs.size else hs, pa.int64()),
                "h": pa.array(hs, pa.int64()),
            }
        )

    def bucket_hist(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "group_size": pa.array([], pa.int64()),
                "ng": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        h = group.column("h").to_numpy(zero_copy_only=False)
        _, counts = np.unique(h, return_counts=True)
        sz, ngr = np.unique(counts, return_counts=True)
        return pa.table(
            {
                "group_size": pa.array(sz.astype(np.int64), pa.int64()),
                "ng": pa.array(ngr.astype(np.int64), pa.int64()),
            }
        )

    agg = _small_df(
        docs.select_columns([id_col, text_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(bucket_hist, batch_format="pyarrow")
        .groupby("group_size")
        .aggregate(Sum("ng")),
        {"group_size": np.int64, "sum(ng)": np.int64},
    )
    gs = agg["group_size"].to_numpy(np.int64)
    ng = agg["sum(ng)"].to_numpy(np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "group_size": pa.array(gs, pa.int64()),
                "n_groups": pa.array(ng, pa.int64()),
                "n_docs": pa.array(gs * ng, pa.int64()),
            }
        )
    )


def hard_negatives_ds(
    emb: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    grid_dims: int = 4,
    cell_e6: int = 250_000,
    max_cell: int = 64,
) -> Dataset:
    """Hard-negative mining for contrastive training (the in-batch
    negatives recipe of SimCLR / DPR, made deterministic): embedding
    pairs that land in the SAME coarse grid cell (first ``grid_dims``
    e6-quantized components floor-divided by ``cell_e6``) but carry
    DIFFERENT labels — close in representation space yet semantically
    distinct, exactly the negatives a contrastive loss learns most
    from.  Each pair carries the exact integer squared L2 distance over
    ALL components for downstream margin filtering.  Cells cap at the
    ``max_cell`` lowest vec ids (mirrored in SQL).

    Scale shape: cell key is a per-row projection (no broadcast); ONE
    cell-hash shuffle with bounded groups; within-cell pair generation
    is quadratic only in the capped cell population."""
    import hashlib

    out_schema = pa.schema(
        [
            ("vec_a", pa.int64()),
            ("vec_b", pa.int64()),
            ("label_a", pa.int64()),
            ("label_b", pa.int64()),
            ("d2q", pa.int64()),
        ]
    )

    def project(batch: pa.Table) -> pa.Table:
        empty_cols = {
            "cell": pa.array([], pa.string()),
            "v": pa.array([], pa.int64()),
            "lab": pa.array([], pa.int64()),
        }
        if batch.num_rows == 0:
            empty_cols["q"] = pa.array([], pa.list_(pa.int64()))
            return pa.table(empty_cols)
        ids_ = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        labs = batch.column(label_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        col = batch.column(vec_col).combine_chunks()
        flat = np.asarray(col.flatten(), dtype=np.float64)
        n = batch.num_rows
        dim = flat.size // n
        q = np.floor(flat * 1e6).astype(np.int64).reshape(n, dim)
        cells = q[:, :grid_dims] // cell_e6  # floor division (negatives ok)
        keys = ["|".join(map(str, row)) for row in cells]
        return pa.table(
            {
                "cell": pa.array(keys, pa.string()),
                "v": pa.array(ids_, pa.int64()),
                "lab": pa.array(labs, pa.int64()),
                "q": pa.array(list(q), pa.list_(pa.int64())),
            }
        )

    def cell_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows == 0:
            return empty
        v = group.column("v").to_numpy(zero_copy_only=False)
        lab = group.column("lab").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")[:max_cell]
        v, lab = v[order], lab[order]
        ql = group.column("q").to_pylist()
        q = np.array([ql[i] for i in order], dtype=np.int64)
        m = v.size
        if m < 2:
            return empty
        ii, jj = np.triu_indices(m, k=1)
        diff_lab = lab[ii] != lab[jj]
        ii, jj = ii[diff_lab], jj[diff_lab]
        if ii.size == 0:
            return empty
        d = q[ii] - q[jj]
        d2 = (d * d).sum(axis=1)
        return pa.table(
            {
                "vec_a": pa.array(v[ii], pa.int64()),
                "vec_b": pa.array(v[jj], pa.int64()),
                "label_a": pa.array(lab[ii], pa.int64()),
                "label_b": pa.array(lab[jj], pa.int64()),
                "d2q": pa.array(d2, pa.int64()),
            }
        )

    return _anchor_schema(
        emb.select_columns([id_col, vec_col, label_col])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell")
        .map_groups(cell_pairs, batch_format="pyarrow"),
        out_schema,
    )


def rare_token_pairs_ds(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df: int = 3,
    n_buckets: int = 256,
) -> Dataset:
    """Rare-shingle blocking (the inverted-index candidate generator of
    entity-resolution pipelines, complementing prefix and phonetic
    blocking): document pairs sharing at least one 3-word shingle whose
    document frequency lies in ``[min_df, max_df]`` — rare enough to be
    discriminative, shared enough to link.  Single tokens are useless
    blocking keys on a natural-language corpus (every word is frequent);
    trigram shingles give a sharp df distribution.  Emits each candidate
    pair with the count of distinct rare shingles it shares.

    Scale shape: shingle-df combiner -> ONE vocab groupby; rare
    (shingle, doc) postings shuffle by shingle hash — per-shingle pair
    fan-out is bounded by ``max_df`` BY CONSTRUCTION
    (<= max_df*(max_df-1)/2), so no cap or salt is ever needed; final
    pair-key groupby counts."""
    import hashlib

    out_schema = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("n_shared_rare", pa.int64()),
        ]
    )

    def postings(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "token": pa.array([], pa.string()),
                "d": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        toks = pc.split_pattern(
            pc.fill_null(batch.column(text_col), ""), pattern=" "
        )
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        parents = np.asarray(pc.list_parent_indices(flat))
        words = np.asarray(flat.flatten().to_pylist(), dtype=object)
        ids_ = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        if words.size < 3:
            return empty
        # 3-word shingles: starts where all three tokens share a parent.
        ok = (parents[:-2] == parents[1:-1]) & (parents[:-2] == parents[2:])
        if not ok.any():
            return empty
        w0 = words[:-2][ok].astype(str)
        w1 = words[1:-1][ok].astype(str)
        w2 = words[2:][ok].astype(str)
        sh = np.char.add(
            np.char.add(np.char.add(np.char.add(w0, " "), w1), " "), w2
        )
        t = pa.table(
            {
                "token": pa.array(sh, pa.string()),
                "d": pa.array(ids_[parents[:-2][ok]], pa.int64()),
            }
        )
        return t.group_by(["token", "d"]).aggregate([])

    posts = (
        docs.select_columns([id_col, text_col])
        .map_batches(postings, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["token", "d"])
        .aggregate(Count())
    )

    def tag_bucket(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bkt": pa.array([], pa.int64()),
                "h": pa.array([], pa.int64()),
                "d": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "token" not in batch.column_names:
            return empty
        toks = batch.column("token").to_pylist()
        hs = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(t).encode()).digest()[:8], "big")
                >> 1
                for t in toks
            ),
            np.int64,
            count=len(toks),
        )
        return pa.table(
            {
                "bkt": pa.array(hs % n_buckets if hs.size else hs, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "d": batch.column("d").cast(pa.int64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        if group.num_rows == 0:
            return empty
        h = group.column("h").to_numpy(zero_copy_only=False)
        d = group.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        h, d = h[order], d[order]
        starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
        ends = np.concatenate((starts[1:], [h.size]))
        sizes = ends - starts
        ok = (sizes >= min_df) & (sizes <= max_df)
        a_: List[np.ndarray] = []
        b_: List[np.ndarray] = []
        for s, e in zip(starts[ok], ends[ok]):
            m = int(e - s)
            ii, jj = np.triu_indices(m, k=1)
            a_.append(d[s:e][ii])
            b_.append(d[s:e][jj])
        if not a_:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_), pa.int64()),
                "b": pa.array(np.concatenate(b_), pa.int64()),
            }
        )

    pairs = (
        posts.map_batches(tag_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    pairs = _anchor_schema(
        pairs, pa.schema([("a", pa.int64()), ("b", pa.int64())])
    )
    agg = pairs.groupby(["a", "b"]).aggregate(Count())

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "a" not in batch.column_names:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        return pa.table(
            {
                "doc_a": batch.column("a"),
                "doc_b": batch.column("b"),
                "n_shared_rare": batch.column("count()").cast(pa.int64()),
            }
        )

    return _anchor_schema(
        agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True),
        out_schema,
    )


def temporal_split_ds(
    events: Dataset,
    ts_col: str = "ts",
    type_col: str = "event_type",
    day_us: int = 86_400_000_000,
    train_pct: int = 70,
    valid_pct: int = 15,
) -> Dataset:
    """Leakage-free temporal train/valid/test split report: cutoff DAYS
    are exact discrete quantiles of the event-day distribution (smallest
    day with ``cum * 100 >= pct * N``), so everything before the cutoff
    trains and nothing after leaks backwards — the time-ordered split
    every forecasting / recsys eval needs instead of a hash split.
    Emits per (split, event_type): row count and day bounds.

    Scale shape: (day) count combiner -> bounded day-domain groupby ->
    cutoffs on the collected day table; the per-(split, type) counts
    come from ONE more combiner + tiny groupby (cutoffs broadcast in the
    closure)."""
    out_schema = pa.schema(
        [
            ("split", pa.string()),
            (type_col, pa.string()),
            ("n_events", pa.int64()),
            ("day_min", pa.int64()),
            ("day_max", pa.int64()),
        ]
    )

    def day_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"day": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        t = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = (
            pa.table({"day": pa.array(t // day_us, pa.int64())})
            .group_by("day")
            .aggregate([("day", "count")])
        )
        return pa.table(
            {"day": g.column("day"), "c": g.column("day_count").cast(pa.int64())}
        )

    days = _small_df(
        events.select_columns([ts_col])
        .map_batches(day_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum("c")),
        {"day": np.int64, "sum(c)": np.int64},
    )
    if not len(days):
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
    d = days["day"].to_numpy(np.int64)
    c = days["sum(c)"].to_numpy(np.int64)
    order = np.argsort(d)
    d, c = d[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    t1 = int(d[np.searchsorted(cum * 100, train_pct * n, side="left")])
    t2 = int(
        d[np.searchsorted(cum * 100, (train_pct + valid_pct) * n, side="left")]
    )

    def split_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "split": pa.array([], pa.string()),
                    type_col: pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "dmin": pa.array([], pa.int64()),
                    "dmax": pa.array([], pa.int64()),
                }
            )
        t = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = t // day_us
        split = np.where(day <= t1, "train", np.where(day <= t2, "valid", "test"))
        g = (
            pa.table(
                {
                    "split": pa.array(split.astype(object)),
                    type_col: batch.column(type_col),
                    "day": pa.array(day, pa.int64()),
                }
            )
            .group_by(["split", type_col])
            .aggregate([("day", "count"), ("day", "min"), ("day", "max")])
        )
        return pa.table(
            {
                "split": g.column("split"),
                type_col: g.column(type_col),
                "n": g.column("day_count").cast(pa.int64()),
                "dmin": g.column("day_min"),
                "dmax": g.column("day_max"),
            }
        )

    agg = _small_df(
        events.select_columns([ts_col, type_col])
        .map_batches(split_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["split", type_col])
        .aggregate(Sum("n"), Min("dmin"), Max("dmax")),
        {
            "split": object,
            type_col: object,
            "sum(n)": np.int64,
            "min(dmin)": np.int64,
            "max(dmax)": np.int64,
        },
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "split": pa.array(agg["split"].astype(str), pa.string()),
                type_col: pa.array(agg[type_col].astype(str), pa.string()),
                "n_events": pa.array(agg["sum(n)"].to_numpy(np.int64), pa.int64()),
                "day_min": pa.array(agg["min(dmin)"].to_numpy(np.int64), pa.int64()),
                "day_max": pa.array(agg["max(dmax)"].to_numpy(np.int64), pa.int64()),
            }
        )
    )


def join_card_estimate_ds(
    events: Dataset,
    key_col: str = "user_id",
    sample_mod: int = 16,
) -> Dataset:
    """Sampling-based join-cardinality estimator AUDIT (the query-planner
    primitive): the self-join size on ``key_col`` is ``sum_k c_k^2``;
    the estimator samples keys with ``md5(key) % sample_mod == 0`` and
    scales by ``sample_mod`` (each key's quadratic contribution is
    included with probability 1/mod, so the scaled sum is unbiased).
    Emits one row: exact size, estimate, and the signed error permille —
    the calibration check before trusting sampled statistics for plan
    choices at scale.

    Scale shape: per-key count combiner -> ONE key groupby -> per-batch
    quadratic partials (exact and sampled) -> single-row fold; the
    sample never materializes."""
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        k = batch.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = (
            pa.table({"k": pa.array(k, pa.int64())})
            .group_by("k")
            .aggregate([("k", "count")])
        )
        return pa.table(
            {"k": g.column("k"), "c": g.column("k_count").cast(pa.int64())}
        )

    def quad(batch: pa.Table) -> pa.Table:
        cols = ["actual", "est_contrib"]
        if batch.num_rows == 0 or "k" not in batch.column_names:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        k = batch.column("k").to_numpy(zero_copy_only=False)
        c = batch.column("sum(c)").to_numpy(zero_copy_only=False)
        sq = c * c
        sampled = np.fromiter(
            (
                int(hashlib.md5(str(int(x)).encode()).hexdigest()[:8], 16)
                % sample_mod
                == 0
                for x in k
            ),
            bool,
            count=k.size,
        )
        return pa.table(
            {
                "actual": pa.array([int(sq.sum())], pa.int64()),
                "est_contrib": pa.array([int(sq[sampled].sum())], pa.int64()),
            }
        )

    parts = _small_df(
        events.select_columns([key_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Sum("c"))
        .map_batches(quad, batch_format="pyarrow", zero_copy_batch=True),
        {"actual": np.int64, "est_contrib": np.int64},
    )
    actual = int(parts["actual"].sum()) if len(parts) else 0
    est = (int(parts["est_contrib"].sum()) if len(parts) else 0) * sample_mod
    err = abs(est - actual) * 1000 // actual if actual > 0 else 0
    sign = 1 if est > actual else (-1 if est < actual else 0)
    return ray.data.from_arrow(
        pa.table(
            {
                "actual_join_rows": pa.array([actual], pa.int64()),
                "estimated_join_rows": pa.array([est], pa.int64()),
                "abs_err_permille": pa.array([err], pa.int64()),
                "err_sign": pa.array([sign], pa.int64()),
            }
        )
    )


def bottomk_sample_ds(
    docs: Dataset,
    id_col: str = "doc_id",
    val_col: str = "n_chars",
    k: int = 100,
) -> Dataset:
    """Bottom-k (KMV) uniform sample WITHOUT replacement: the ``k``
    documents with the smallest 60-bit md5 rank — the hash-ordered
    simple random sample whose size is EXACT (unlike threshold hash
    sampling) and which composes across shards by merging per-shard
    bottom-k sets (the K-Minimum-Values sketch construction, Bar-Yossef
    et al. 2002).

    Scale shape: per-block bottom-k partial (each block forwards <= k
    rows) -> global sort + limit over <= k * n_blocks rows — the big
    table never shuffles."""
    import hashlib

    def rank(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "h60": pa.array([], pa.int64()),
                val_col: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids_ = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        hs = np.fromiter(
            (
                int(hashlib.md5(str(int(x)).encode()).hexdigest()[:15], 16)
                for x in ids_
            ),
            np.int64,
            count=ids_.size,
        )
        order = np.lexsort((ids_, hs))[:k]
        return pa.table(
            {
                id_col: pa.array(ids_[order], pa.int64()),
                "h60": pa.array(hs[order], pa.int64()),
                val_col: batch.column(val_col).cast(pa.int64()).take(
                    pa.array(order)
                ),
            }
        )

    return (
        docs.select_columns([id_col, val_col])
        .map_batches(rank, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["h60", id_col])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Session 15: span-structure analytics over the INTERLEAVED payload —
# operators on the (doc_id, spans: list<struct<kind,text,media_ref,offset>>)
# table itself (the north-rule input shape), not on flat text columns.
# ---------------------------------------------------------------------------


def _span_lists(batch: pa.Table):
    """(offsets, struct values, per-doc list lengths, parent doc index)
    for the ``spans`` column — the shared zero-copy unpack."""
    spans = batch.column("spans").combine_chunks()
    offs = spans.offsets.to_numpy()
    lens = np.diff(offs)
    parents = np.repeat(np.arange(len(lens)), lens)
    return offs, spans.values, lens, parents


def span_kind_transitions_ds(docs: Dataset) -> Dataset:
    """Markov bigram census of span KINDS across each document's ordered
    span sequence — the structural fingerprint of an interleaved corpus
    (how often text flows into media, headings into body, cells into
    cells).  Emits corpus-wide ``(kind_from, kind_to, n)`` counts.

    Scale shape: per-batch vectorized bigram partials (codes via
    ``pc.index_in`` against the tiny kind vocabulary, pair counts via one
    ``np.bincount``) -> ONE bounded groupby over <= |kinds|^2 rows."""
    out_schema = pa.schema(
        [
            ("kind_from", pa.string()),
            ("kind_to", pa.string()),
            ("n", pa.int64()),
        ]
    )
    empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty.select(["kind_from", "kind_to", "n"])
        _, vals, lens, parents = _span_lists(batch)
        if len(vals) < 2:
            return empty
        kind_arr = vals.field("kind")
        vocab, codes = np.unique(
            np.asarray(kind_arr.to_pylist(), dtype=object), return_inverse=True
        )
        same = parents[:-1] == parents[1:]
        if not same.any():
            return empty
        k = len(vocab)
        pair = codes[:-1][same] * k + codes[1:][same]
        cnt = np.bincount(pair, minlength=k * k).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "kind_from": pa.array(vocab[nz // k].astype(str), pa.string()),
                "kind_to": pa.array(vocab[nz % k].astype(str), pa.string()),
                "n": pa.array(cnt[nz], pa.int64()),
            }
        )

    agg = (
        docs.select_columns(["spans"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["kind_from", "kind_to"])
        .aggregate(Sum("n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "kind_from" not in batch.column_names:
            return empty
        return pa.table(
            {
                "kind_from": batch.column("kind_from"),
                "kind_to": batch.column("kind_to"),
                "n": batch.column("sum(n)").cast(pa.int64()),
            }
        )

    return _anchor_schema(
        agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True),
        out_schema,
    )


def media_density_ds(docs: Dataset, id_to_int=None) -> Dataset:
    """Per-document interleaving profile: span counts by class (media vs
    text-bearing), total text chars, and media share in permille — the
    triage table a multimodal curation pipeline filters on (drop all-media
    shells, keep text-rich mixed docs).

    Scale shape: pure per-batch vectorized projection (one
    ``np.bincount`` per measure over the list parents); no shuffle."""
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_spans", pa.int64()),
            ("n_media", pa.int64()),
            ("n_text", pa.int64()),
            ("text_chars", pa.int64()),
            ("media_permille", pa.int64()),
        ]
    )
    empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})

    def profile(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        _, vals, lens, parents = _span_lists(batch)
        nd = len(lens)
        ids_ = np.asarray(
            [int(str(d).rsplit("-", 1)[-1]) for d in
             batch.column("doc_id").to_pylist()],
            np.int64,
        )
        is_media = np.asarray(
            pc.equal(vals.field("kind"), "media_ref").to_numpy(
                zero_copy_only=False
            ),
            bool,
        )
        tl = pc.utf8_length(vals.field("text")).to_numpy(zero_copy_only=False)
        n_media = np.bincount(parents, weights=is_media, minlength=nd)
        chars = np.bincount(parents, weights=tl, minlength=nd)
        n_spans = lens.astype(np.int64)
        nm = n_media.astype(np.int64)
        permille = np.where(n_spans > 0, nm * 1000 // np.maximum(n_spans, 1), 0)
        return pa.table(
            {
                "doc_id": pa.array(ids_, pa.int64()),
                "n_spans": pa.array(n_spans, pa.int64()),
                "n_media": pa.array(nm, pa.int64()),
                "n_text": pa.array(n_spans - nm, pa.int64()),
                "text_chars": pa.array(chars.astype(np.int64), pa.int64()),
                "media_permille": pa.array(permille.astype(np.int64), pa.int64()),
            }
        )

    return _anchor_schema(
        docs.map_batches(profile, batch_format="pyarrow", zero_copy_batch=True),
        out_schema,
    )


def span_offset_audit_ds(docs: Dataset) -> Dataset:
    """Corpus-wide offset-integrity audit of the interleaved payload: are
    span offsets strictly increasing within every document (the ordering
    invariant downstream span-sequence equality depends on), plus the
    checksum-grade totals (sum of final offsets, max span count).  ONE
    row out.

    Scale shape: per-batch vectorized partials (diff over list values
    with a cross-boundary mask) -> single-row fold; nothing shuffles."""
    out_schema = pa.schema(
        [
            ("n_docs", pa.int64()),
            ("n_monotonic", pa.int64()),
            ("sum_final_offset", pa.int64()),
            ("max_span_count", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        cols = ["n_docs", "n_monotonic", "sum_final_offset", "max_span_count"]
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        offs, vals, lens, parents = _span_lists(batch)
        off_vals = vals.field("offset").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        nd = len(lens)
        if len(off_vals) > 1:
            same = parents[:-1] == parents[1:]
            bad = (np.diff(off_vals) <= 0) & same
            bad_docs = np.unique(parents[:-1][bad])
            n_mono = nd - len(bad_docs)
        else:
            n_mono = nd
        last_idx = offs[1:] - 1  # final span per doc (lens may be 0)
        has = lens > 0
        sum_final = int(off_vals[last_idx[has]].sum()) if has.any() else 0
        return pa.table(
            {
                "n_docs": pa.array([nd], pa.int64()),
                "n_monotonic": pa.array([int(n_mono)], pa.int64()),
                "sum_final_offset": pa.array([sum_final], pa.int64()),
                "max_span_count": pa.array(
                    [int(lens.max()) if nd else 0], pa.int64()
                ),
            }
        )

    parts = _small_df(
        docs.select_columns(["spans"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        {
            "n_docs": np.int64,
            "n_monotonic": np.int64,
            "sum_final_offset": np.int64,
            "max_span_count": np.int64,
        },
    )
    if not len(parts):
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_docs": pa.array([0], pa.int64()),
                    "n_monotonic": pa.array([0], pa.int64()),
                    "sum_final_offset": pa.array([0], pa.int64()),
                    "max_span_count": pa.array([0], pa.int64()),
                }
            )
        )
    return ray.data.from_arrow(
        pa.table(
            {
                "n_docs": pa.array([int(parts["n_docs"].sum())], pa.int64()),
                "n_monotonic": pa.array(
                    [int(parts["n_monotonic"].sum())], pa.int64()
                ),
                "sum_final_offset": pa.array(
                    [int(parts["sum_final_offset"].sum())], pa.int64()
                ),
                "max_span_count": pa.array(
                    [int(parts["max_span_count"].max())], pa.int64()
                ),
            }
        )
    )


def kind_runlengths_ds(docs: Dataset) -> Dataset:
    """Run-length census of span kinds: per kind, how many maximal
    consecutive runs the corpus holds, the longest run, and the total
    span count — the structure signal that separates cell-run-heavy
    (tabular) corpora from prose (long text runs) and galleries (media
    runs).

    Scale shape: per-batch vectorized RLE (run starts = kind-change OR
    doc-boundary; lengths by diff of start indices) -> ONE bounded
    groupby over <= |kinds| rows."""
    out_schema = pa.schema(
        [
            ("kind", pa.string()),
            ("n_runs", pa.int64()),
            ("max_run", pa.int64()),
            ("n_spans", pa.int64()),
        ]
    )
    empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})

    def partial(batch: pa.Table) -> pa.Table:
        cols = ["kind", "n_runs", "max_run", "n_spans"]
        if batch.num_rows == 0:
            return pa.table(
                {
                    "kind": pa.array([], pa.string()),
                    "n_runs": pa.array([], pa.int64()),
                    "max_run": pa.array([], pa.int64()),
                    "n_spans": pa.array([], pa.int64()),
                }
            )
        _, vals, lens, parents = _span_lists(batch)
        n = len(vals)
        if n == 0:
            return pa.table(
                {
                    "kind": pa.array([], pa.string()),
                    "n_runs": pa.array([], pa.int64()),
                    "max_run": pa.array([], pa.int64()),
                    "n_spans": pa.array([], pa.int64()),
                }
            )
        vocab, codes = np.unique(
            np.asarray(vals.field("kind").to_pylist(), dtype=object),
            return_inverse=True,
        )
        new_run = np.ones(n, bool)
        if n > 1:
            new_run[1:] = (codes[1:] != codes[:-1]) | (parents[1:] != parents[:-1])
        starts = np.flatnonzero(new_run)
        run_len = np.diff(np.concatenate((starts, [n])))
        run_code = codes[starts]
        k = len(vocab)
        n_runs = np.bincount(run_code, minlength=k).astype(np.int64)
        max_run = np.zeros(k, np.int64)
        np.maximum.at(max_run, run_code, run_len)
        n_spans = np.bincount(run_code, weights=run_len, minlength=k).astype(
            np.int64
        )
        return pa.table(
            {
                "kind": pa.array(vocab.astype(str), pa.string()),
                "n_runs": pa.array(n_runs, pa.int64()),
                "max_run": pa.array(max_run, pa.int64()),
                "n_spans": pa.array(n_spans, pa.int64()),
            }
        )

    agg = (
        docs.select_columns(["spans"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("kind")
        .aggregate(Sum("n_runs"), Max("max_run"), Sum("n_spans"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "kind" not in batch.column_names:
            return empty
        return pa.table(
            {
                "kind": batch.column("kind"),
                "n_runs": batch.column("sum(n_runs)").cast(pa.int64()),
                "max_run": batch.column("max(max_run)").cast(pa.int64()),
                "n_spans": batch.column("sum(n_spans)").cast(pa.int64()),
            }
        )

    return _anchor_schema(
        agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True),
        out_schema,
    )


def media_ref_integrity_ds(docs: Dataset) -> Dataset:
    """Referential-integrity audit of the media side of the interleaved
    payload: every ``media_ref`` URI must (1) carry the ``media://``
    scheme, (2) embed the doc_id of the document that contains it (no
    foreign refs), and (3) index its doc's media densely ``0..n-1`` —
    the invariants a downstream media-fetch stage relies on before
    issuing reads.  ONE row out.

    Scale shape: per-batch vectorized parse (np.char ops over the media
    minority of flattened spans; docs never split across batches so the
    density check is batch-local) -> single-row fold; nothing
    shuffles."""
    cols = [
        "n_refs",
        "n_bad_scheme",
        "n_foreign",
        "n_docs_with_media",
        "n_dense_docs",
    ]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        _, vals, lens, parents = _span_lists(batch)
        is_media = np.asarray(
            pc.equal(vals.field("kind"), "media_ref").to_numpy(
                zero_copy_only=False
            ),
            bool,
        )
        doc_ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=object)
        n_refs = int(is_media.sum())
        if n_refs == 0:
            return pa.table(
                {
                    "n_refs": pa.array([0], pa.int64()),
                    "n_bad_scheme": pa.array([0], pa.int64()),
                    "n_foreign": pa.array([0], pa.int64()),
                    "n_docs_with_media": pa.array([0], pa.int64()),
                    "n_dense_docs": pa.array([0], pa.int64()),
                }
            )
        refs = np.asarray(
            vals.field("media_ref").take(
                pa.array(np.flatnonzero(is_media))
            ).to_pylist(),
            dtype=object,
        ).astype(str)
        par = parents[is_media]
        good_scheme = np.char.startswith(refs, "media://")
        expected = np.char.add(
            np.char.add("media://", doc_ids[par].astype(str)), "/"
        )
        own = np.char.startswith(refs, expected)
        # dense 0..n-1 per doc: numeric suffix, sorted == arange
        tail = np.char.rpartition(refs, "/")[:, 2]
        is_num = np.char.isdigit(tail)
        ks = np.where(is_num, tail, "-1").astype(np.int64)
        order = np.lexsort((ks, par))
        sp, sk = par[order], ks[order]
        starts = np.flatnonzero(np.concatenate(([True], sp[1:] != sp[:-1])))
        ends = np.concatenate((starts[1:], [sp.size]))
        seg_ok = np.ones(starts.size, bool)
        pos = np.arange(sp.size) - np.repeat(starts, ends - starts)
        bad_pos = sk != pos
        if bad_pos.any():
            bad_docs = np.unique(sp[bad_pos])
            seg_ok = ~np.isin(sp[starts], bad_docs)
        return pa.table(
            {
                "n_refs": pa.array([n_refs], pa.int64()),
                "n_bad_scheme": pa.array(
                    [int((~good_scheme).sum())], pa.int64()
                ),
                "n_foreign": pa.array(
                    [int((good_scheme & ~own).sum())], pa.int64()
                ),
                "n_docs_with_media": pa.array([int(starts.size)], pa.int64()),
                "n_dense_docs": pa.array([int(seg_ok.sum())], pa.int64()),
            }
        )

    parts = _small_df(
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        {c: np.int64 for c in cols},
    )
    if not len(parts):
        return ray.data.from_arrow(
            pa.table({c: pa.array([0], pa.int64()) for c in cols})
        )
    return ray.data.from_arrow(
        pa.table(
            {c: pa.array([int(parts[c].sum())], pa.int64()) for c in cols}
        )
    )


_KMV_DOMAIN = 1 << 60  # h60 hashes are uniform on [0, 2^60)


def kmv_intersection_ds(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    k: int = 128,
) -> Dataset:
    """Theta-sketch (KMV) set-INTERSECTION estimator audit between
    sources: per source pair, the exact number of shared distinct 3-word
    shingles vs the estimate from two k-minimum-values sketches — the
    calibration table before trusting sketch unions/intersections for
    cross-source overlap triage at 100 TB (where the exact side is a
    full shingle-domain shuffle but the sketch side ships k hashes per
    source).

    Estimator (integer-exact on both sides): with ``K`` = the k-th
    smallest hash of the two sketches' union and ``c`` = shared sketch
    hashes below ``K``, ``est = c*(k-1)*2^60 // (k*K)`` (the KMV
    union-cardinality estimator ``(k-1)*D/K`` scaled by the Jaccard
    fraction ``c/k``); when the union sketch is not full both sketches
    are complete and the count is exact.

    Scale shape: ONE (source, h60) dedup shuffle feeds both sides; the
    exact side folds per-hash source BITMASKS (sources <= 63 by guard)
    through a bounded second groupby; the sketch side forwards <= k rows
    per source per batch and the driver merges tiny sketches."""
    import hashlib

    out_schema = pa.schema(
        [
            ("src_a", pa.string()),
            ("src_b", pa.string()),
            ("exact_common", pa.int64()),
            ("kmv_est", pa.int64()),
            ("abs_err_permille", pa.int64()),
        ]
    )
    empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})

    def shingle_hashes(batch: pa.Table) -> pa.Table:
        ecols = {
            "source": pa.array([], pa.string()),
            "h": pa.array([], pa.int64()),
        }
        if batch.num_rows == 0:
            return pa.table(ecols)
        toks = pc.split_pattern(
            pc.fill_null(batch.column(text_col), ""), pattern=" "
        )
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        parents = np.asarray(pc.list_parent_indices(flat))
        words = np.asarray(flat.flatten().to_pylist(), dtype=object)
        if words.size < 3:
            return pa.table(ecols)
        ok = (parents[:-2] == parents[1:-1]) & (parents[:-2] == parents[2:])
        if not ok.any():
            return pa.table(ecols)
        w0 = words[:-2][ok].astype(str)
        w1 = words[1:-1][ok].astype(str)
        w2 = words[2:][ok].astype(str)
        sh = np.char.add(
            np.char.add(np.char.add(np.char.add(w0, " "), w1), " "), w2
        )
        srcs = np.asarray(
            batch.column(source_col).to_pylist(), dtype=object
        )[parents[:-2][ok]]
        hs = np.fromiter(
            (
                int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)
                for s in sh
            ),
            np.int64,
            count=sh.size,
        )
        t = pa.table(
            {
                "source": pa.array(srcs.astype(str), pa.string()),
                "h": pa.array(hs, pa.int64()),
            }
        )
        return t.group_by(["source", "h"]).aggregate([])

    dedup = (
        docs.select_columns([source_col, text_col])
        .map_batches(shingle_hashes, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "h"])
        .aggregate(Count())
        .materialize()
    )

    # ---- sketch side: bottom-k per source (per-batch partial -> driver)
    def bottomk(batch: pa.Table) -> pa.Table:
        ecols = {
            "source": pa.array([], pa.string()),
            "h": pa.array([], pa.int64()),
        }
        if batch.num_rows == 0 or "source" not in batch.column_names:
            return pa.table(ecols)
        src = np.asarray(batch.column("source").to_pylist(), dtype=object)
        hs = batch.column("h").to_numpy(zero_copy_only=False)
        order = np.lexsort((hs, src.astype(str)))
        src, hs = src[order], hs[order]
        starts = np.flatnonzero(
            np.concatenate(([True], src[1:] != src[:-1]))
        )
        pos = np.arange(src.size) - np.repeat(
            starts, np.diff(np.concatenate((starts, [src.size])))
        )
        keep = pos < k
        return pa.table(
            {
                "source": pa.array(src[keep].astype(str), pa.string()),
                "h": pa.array(hs[keep], pa.int64()),
            }
        )

    sk = _small_df(
        dedup.map_batches(bottomk, batch_format="pyarrow", zero_copy_batch=True),
        {"source": object, "h": np.int64},
    )

    # ---- exact side: per-hash source bitmask -> mask histogram
    sources = sorted(set(sk["source"].astype(str))) if len(sk) else []
    if len(sources) > 63:
        raise ValueError(
            "kmv_intersection_ds bitmask fold supports <= 63 sources; "
            "salt the mask into source buckets beyond that"
        )
    bit_of = {s: i for i, s in enumerate(sources)}

    def to_bits(batch: pa.Table) -> pa.Table:
        ecols = {
            "h": pa.array([], pa.int64()),
            "bits": pa.array([], pa.int64()),
        }
        if batch.num_rows == 0 or "h" not in batch.column_names:
            return pa.table(ecols)
        src = batch.column("source").to_pylist()
        bits = np.asarray([1 << bit_of[s] for s in src], np.int64)
        return pa.table(
            {"h": batch.column("h").cast(pa.int64()), "bits": pa.array(bits)}
        )

    def mask_hist(batch: pa.Table) -> pa.Table:
        ecols = {
            "mask": pa.array([], pa.int64()),
            "c": pa.array([], pa.int64()),
        }
        if batch.num_rows == 0 or "sum(bits)" not in batch.column_names:
            return pa.table(ecols)
        g = (
            pa.table({"mask": batch.column("sum(bits)").cast(pa.int64())})
            .group_by("mask")
            .aggregate([("mask", "count")])
        )
        return pa.table(
            {
                "mask": g.column("mask"),
                "c": g.column("mask_count").cast(pa.int64()),
            }
        )

    masks = _small_df(
        dedup.map_batches(to_bits, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Sum("bits"))
        .map_batches(mask_hist, batch_format="pyarrow", zero_copy_batch=True),
        {"mask": np.int64, "c": np.int64},
    )
    if not len(sk) or len(sources) < 2:
        return ray.data.from_arrow(empty)

    mk = masks["mask"].to_numpy(np.int64)
    mc = masks["c"].to_numpy(np.int64)
    sketches = {
        s: np.sort(sk[sk["source"] == s]["h"].to_numpy(np.int64))[:k]
        for s in sources
    }

    rows = []
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            both = (1 << bit_of[sa]) | (1 << bit_of[sb])
            exact = int(mc[(mk & both) == both].sum())
            a, b = sketches[sa], sketches[sb]
            union = np.union1d(a, b)
            common = np.intersect1d(a, b, assume_unique=True)
            if union.size < k:
                est = int(common.size)
            else:
                kk = int(union[k - 1])
                c = int((common < kk).sum())
                est = (c * (k - 1) * _KMV_DOMAIN) // (k * kk) if kk > 0 else 0
            err = abs(est - exact) * 1000 // exact if exact > 0 else 0
            rows.append((sa, sb, exact, est, err))
    return ray.data.from_arrow(
        pa.table(
            {
                "src_a": pa.array([r[0] for r in rows], pa.string()),
                "src_b": pa.array([r[1] for r in rows], pa.string()),
                "exact_common": pa.array([r[2] for r in rows], pa.int64()),
                "kmv_est": pa.array([r[3] for r in rows], pa.int64()),
                "abs_err_permille": pa.array([r[4] for r in rows], pa.int64()),
            }
        )
    )


def cohort_ltv_ds(
    events: Dataset,
    week_us: int = 7 * 86_400 * 1_000_000,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    n_buckets: int = 512,
) -> Dataset:
    """Cohort LIFETIME-VALUE triangle: revenue (exact cents) and active
    users per ``(cohort_week, age_weeks)`` cell, where a user's cohort
    is their first active week — the monetization counterpart of
    :func:`cohort_retention_ds` (which only counts activity).

    Scale shape: per-batch ``(user, week, sum cents)`` combiner -> ONE
    shuffle by ``mix64(user) % n_buckets`` (bounded group count) ->
    in-bucket lexsort segments users, cohort = each segment's first
    week, cents partials collapse per distinct (user, week) -> final
    tiny groupby over the (weeks x ages) domain."""
    out_schema = pa.schema(
        [
            ("cohort_week", pa.int64()),
            ("age_weeks", pa.int64()),
            ("n_users", pa.int64()),
            ("revenue_cents", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "u": pa.array([], pa.int64()),
                "w": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
                "bkt": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        v = pc.fill_null(batch.column(value_col), 0.0).to_numpy(
            zero_copy_only=False
        )
        t = (
            pa.table(
                {
                    "u": batch.column(user_col).cast(pa.int64()),
                    "w": pc.divide(
                        batch.column(ts_col).cast(pa.int64()),
                        pa.scalar(week_us, pa.int64()),
                    ),
                    "c": pa.array(
                        np.floor(v * 100.0).astype(np.int64), pa.int64()
                    ),
                }
            )
            .group_by(["u", "w"])
            .aggregate([("c", "sum")])
        )
        u = t.column("u").to_numpy(zero_copy_only=False)
        bkt = (_mix64(u) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "u": t.column("u"),
                "w": t.column("w"),
                "c": t.column("c_sum").cast(pa.int64()),
                "bkt": pa.array(bkt),
            }
        )

    pairs = events.select_columns([user_col, ts_col, value_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_week": pa.array([], pa.int64()),
                "age_weeks": pa.array([], pa.int64()),
                "n_partial": pa.array([], pa.int64()),
                "c_partial": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        u = group.column("u").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w, c = u[order], w[order], c[order]
        # collapse cross-block partials of the same (u, w)
        first = np.concatenate(([True], (u[1:] != u[:-1]) | (w[1:] != w[:-1])))
        idx = np.flatnonzero(first)
        cu, cw = u[idx], w[idx]
        cc = np.add.reduceat(c, idx)
        seg_first = np.concatenate(([True], cu[1:] != cu[:-1]))
        cohort = cw[
            np.maximum.accumulate(np.where(seg_first, np.arange(len(cw)), 0))
        ]
        t = (
            pa.table(
                {
                    "cohort_week": pa.array(cohort, pa.int64()),
                    "age_weeks": pa.array(cw - cohort, pa.int64()),
                    "n": pa.array(np.ones(len(cw), np.int64), pa.int64()),
                    "c": pa.array(cc, pa.int64()),
                }
            )
            .group_by(["cohort_week", "age_weeks"])
            .aggregate([("n", "sum"), ("c", "sum")])
        )
        return pa.table(
            {
                "cohort_week": t.column("cohort_week"),
                "age_weeks": t.column("age_weeks"),
                "n_partial": t.column("n_sum").cast(pa.int64()),
                "c_partial": t.column("c_sum").cast(pa.int64()),
            }
        )

    agg = (
        pairs.groupby("bkt")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .groupby(["cohort_week", "age_weeks"])
        .aggregate(Sum("n_partial"), Sum("c_partial"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "cohort_week" not in batch.column_names:
            return pa.table({f.name: pa.array([], f.type) for f in out_schema})
        return pa.table(
            {
                "cohort_week": batch.column("cohort_week").cast(pa.int64()),
                "age_weeks": batch.column("age_weeks").cast(pa.int64()),
                "n_users": batch.column("sum(n_partial)").cast(pa.int64()),
                "revenue_cents": batch.column("sum(c_partial)").cast(pa.int64()),
            }
        )

    return _anchor_schema(
        agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True),
        out_schema,
    )


def caption_mining_ds(docs: Dataset) -> Dataset:
    """Caption-candidate mining over the interleaved payload: for every
    ``media_ref`` span, pair it with the nearest PRECEDING text-bearing
    span in the same document — the alt-text/caption heuristic that
    builds (image, text) training pairs from interleaved web documents.
    Emits ``(doc_id, media_ref, caption, caption_words)``; media with no
    preceding text gets an empty caption.

    Scale shape: pure per-batch vectorized projection — the preceding
    text index per span is one cummax over the flattened span values
    (doc boundaries masked via list parents); NO shuffle."""
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("media_ref", pa.string()),
            ("caption", pa.string()),
            ("caption_words", pa.int64()),
        ]
    )
    empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})

    def mine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        _, vals, lens, parents = _span_lists(batch)
        n = len(vals)
        if n == 0:
            return empty
        is_media = np.asarray(
            pc.equal(vals.field("kind"), "media_ref").to_numpy(
                zero_copy_only=False
            ),
            bool,
        )
        if not is_media.any():
            return empty
        texts = np.asarray(vals.field("text").to_pylist(), dtype=object)
        has_text = ~is_media & (np.char.str_len(texts.astype(str)) > 0)
        # last text-bearing index at-or-before each position, -1 if none
        idx = np.where(has_text, np.arange(n), -1)
        last_text = np.maximum.accumulate(idx)
        # reset at doc boundaries: a doc's first span can't see backwards
        doc_start = np.concatenate(([0], np.flatnonzero(
            parents[1:] != parents[:-1]) + 1))
        # recompute per segment: subtract segment-start cummax leakage by
        # masking candidates from earlier docs
        seg_first = np.zeros(n, np.int64)
        seg_first[doc_start] = doc_start
        seg_start = np.maximum.accumulate(seg_first)
        valid = last_text >= seg_start
        m = np.flatnonzero(is_media)
        cap_idx = last_text[m]
        ok = valid[m] & (cap_idx >= 0)
        caps = np.where(ok, texts[np.maximum(cap_idx, 0)], "").astype(object)
        words = np.where(
            np.char.str_len(caps.astype(str)) > 0,
            np.char.count(caps.astype(str), " ") + 1,
            0,
        ).astype(np.int64)
        doc_ids = np.asarray(
            [int(str(d).rsplit("-", 1)[-1]) for d in
             batch.column("doc_id").to_pylist()],
            np.int64,
        )
        refs = np.asarray(
            vals.field("media_ref").take(pa.array(m)).to_pylist(),
            dtype=object,
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[parents[m]], pa.int64()),
                "media_ref": pa.array(refs.astype(str), pa.string()),
                "caption": pa.array(caps.astype(str), pa.string()),
                "caption_words": pa.array(words, pa.int64()),
            }
        )

    return _anchor_schema(
        docs.map_batches(mine, batch_format="pyarrow", zero_copy_batch=True),
        out_schema,
    )


def span_pack_ds(docs: Dataset, budget_words: int = 24) -> Dataset:
    """Multimodal-aware greedy sequence packing: walk each document's
    ordered spans, closing a chunk whenever adding the next TEXT span
    would exceed ``budget_words`` (media spans cost zero words and never
    split from their position) — the packing step that turns interleaved
    docs into fixed-budget training sequences without ever cutting a
    media span out of context.  Emits per doc: chunk count, max chunk
    words, total words.

    Scale shape: per-batch vectorized greedy fold — chunk boundaries by
    ``searchsorted`` over the flat word prefix-sum, one round per chunk
    DEPTH (all docs advance one chunk per iteration, so the only loop is
    bounded by max-chunks-per-doc, with every inner op vectorized across
    the batch); NO shuffle."""
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_chunks", pa.int64()),
            ("max_chunk_words", pa.int64()),
            ("total_words", pa.int64()),
        ]
    )
    empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})

    def pack(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        offs, vals, lens, parents = _span_lists(batch)
        n = len(vals)
        doc_ids = np.asarray(
            [int(str(d).rsplit("-", 1)[-1]) for d in
             batch.column("doc_id").to_pylist()],
            np.int64,
        )
        nd = len(lens)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids, pa.int64()),
                    "n_chunks": pa.array(np.zeros(nd, np.int64)),
                    "max_chunk_words": pa.array(np.zeros(nd, np.int64)),
                    "total_words": pa.array(np.zeros(nd, np.int64)),
                }
            )
        texts = np.asarray(vals.field("text").to_pylist(), dtype=object).astype(
            str
        )
        w = np.where(
            np.char.str_len(texts) > 0, np.char.count(texts, " ") + 1, 0
        ).astype(np.int64)
        # greedy fold, one vectorized round per chunk depth: a chunk
        # starting at span s covers [s, j) with j = the largest index
        # keeping P[j] - P[s] <= budget (>= one span always taken)
        P = np.concatenate(([0], np.cumsum(w)))
        pos = offs[:-1].astype(np.int64).copy()
        end = offs[1:].astype(np.int64)
        n_chunks = np.zeros(nd, np.int64)
        max_w = np.zeros(nd, np.int64)
        tot = P[end] - P[offs[:-1]]
        active = pos < end
        while active.any():
            s0 = pos[active]
            j = np.searchsorted(P, P[s0] + budget_words, side="right") - 1
            j = np.maximum(j, s0 + 1)
            j = np.minimum(j, end[active])
            cw = P[j] - P[s0]
            # a zero-word chunk (leading media only) must still take the
            # next text span even when it alone exceeds the budget, plus
            # any zero-cost spans that follow it
            zf = (cw == 0) & (j < end[active])
            if zf.any():
                jj = j[zf]
                j2 = np.searchsorted(P, P[jj + 1], side="right") - 1
                j2 = np.minimum(np.maximum(j2, jj + 1), end[active][zf])
                j[zf] = j2
                cw[zf] = P[j2] - P[s0[zf]]
            n_chunks[active] += 1
            np.maximum.at(max_w, np.flatnonzero(active), cw)
            pos[active] = j
            active = pos < end
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_chunks": pa.array(n_chunks, pa.int64()),
                "max_chunk_words": pa.array(max_w, pa.int64()),
                "total_words": pa.array(tot, pa.int64()),
            }
        )

    return _anchor_schema(
        docs.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True),
        out_schema,
    )

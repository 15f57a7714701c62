"""Distributed iterative graph operators (integer-exact PageRank).

The reference engine has no graph surface; a training-data platform
needs one for link-based quality signals (domain authority over a
crawl's link graph, CommonCrawl-style) and for influence weighting of
entity graphs mined from a corpus. The operator here is the canonical
power-iteration shape expressed Ray-Data-first:

* the edge list (with source out-degree pre-attached ONCE) is the only
  large dataset, materialized a single time;
* each iteration is exactly TWO bounded shuffles — one hash-bucket
  co-group that attaches the current rank to each edge (never a
  broadcast of the rank vector, which is node-count-sized and does NOT
  fit on one machine at web scale) and one ``groupby(dst)`` sum of
  per-batch-combined contributions;
* all arithmetic is integer fixed-point (``floor`` division), so every
  engine — numpy here, DuckDB in the oracle — produces bit-identical
  ranks regardless of summation order.

Fixed-point rule (damping 0.85, scale S = 10^12)::

    r0(v)   = S
    r_{k+1}(v) = (15 * S) // 100  +  sum over edges u->v of
                 (r_k(u) * 85) // (100 * outdeg(u))

Per-edge floor BEFORE the sum keeps every term an exact int64; the sum
is then order-independent. Documented bound: ``max_rank * 85 < 2**63``
(holds while total mass ``n_nodes * S`` stays below ~10^17).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

Dataset = ray.data.Dataset

_SCALE = 1_000_000_000_000  # 10^12 fixed-point unit rank


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (same mix as analytics._mix64) —
    deterministic cross-worker bucket hash for integer node ids."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def bipartite_edges_ds(
    lineitem: Dataset,
    orders: Dataset,
    n_buckets: int = 512,
) -> Dataset:
    """Distinct customer<->supplier contact edges from the order/lineitem
    star join, as a DIRECTED symmetric edge list over the node encoding
    ``customer -> 2*custkey``, ``supplier -> 2*suppkey + 1``.

    Scale shape: the orderkey equi-join runs as ONE hash-bucket co-group
    (tagged union shuffled by ``mix64(orderkey) % n_buckets`` — orders
    rows carry custkey, lineitem rows carry suppkey; inside a bucket a
    sorted-key ``searchsorted`` attach, all vectorized). Per-bucket
    pair dedup happens in-bucket; the residual cross-bucket duplicates
    (same pair via orders in different buckets) collapse in one
    ``groupby(src, dst)`` over already-deduped partials."""

    def tag_orders(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(zero_copy_only=False)
        bkt = (_mix64(ok) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(bkt, pa.int64()),
                "okey": pa.array(ok, pa.int64()),
                "side": pa.array(np.zeros(len(ok), np.int8), pa.int8()),
                "pkey": pa.array(ck, pa.int64()),
            }
        )

    def tag_lineitem(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").cast(pa.int64()).to_numpy(zero_copy_only=False)
        sk = batch.column("l_suppkey").cast(pa.int64()).to_numpy(zero_copy_only=False)
        # per-batch (orderkey, suppkey) dedup before the shuffle
        key = np.unique(ok * np.int64(1 << 20) + sk)
        ok_u = (key >> np.int64(20)).astype(np.int64)
        sk_u = (key & np.int64((1 << 20) - 1)).astype(np.int64)
        bkt = (_mix64(ok_u) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(bkt, pa.int64()),
                "okey": pa.array(ok_u, pa.int64()),
                "side": pa.array(np.ones(len(ok_u), np.int8), pa.int8()),
                "pkey": pa.array(sk_u, pa.int64()),
            }
        )

    tagged = orders.select_columns(["o_orderkey", "o_custkey"]).map_batches(
        tag_orders, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        lineitem.select_columns(["l_orderkey", "l_suppkey"]).map_batches(
            tag_lineitem, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def bucket_join(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"pair": pa.array([], pa.int64()), "bkt2": pa.array([], pa.int64())}
        )
        side = group.column("side").to_numpy(zero_copy_only=False)
        o_mask = side == 0
        l_mask = side == 1
        if not o_mask.any() or not l_mask.any():
            return empty
        ok = group.column("okey").to_numpy(zero_copy_only=False)
        pk = group.column("pkey").to_numpy(zero_copy_only=False)
        o_keys, o_cust = ok[o_mask], pk[o_mask]
        order = np.argsort(o_keys, kind="stable")
        o_keys, o_cust = o_keys[order], o_cust[order]
        l_keys, l_supp = ok[l_mask], pk[l_mask]
        pos = np.searchsorted(o_keys, l_keys)
        pos = np.clip(pos, 0, len(o_keys) - 1)
        hit = o_keys[pos] == l_keys
        cust = o_cust[pos[hit]]
        supp = l_supp[hit]
        pair = np.unique(cust * np.int64(1 << 20) + supp)
        bkt2 = (_mix64(pair) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "pair": pa.array(pair, pa.int64()),
                "bkt2": pa.array(bkt2, pa.int64()),
            }
        )

    def bucket_dedup(group: pa.Table) -> pa.Table:
        # cross-bucket duplicate pairs (same pair via orders in different
        # orderkey buckets) collapse here with one np.unique — a
        # groupby(c, s) aggregate over the full pair set measured 3.5x
        # slower for the same result
        pair = np.unique(group.column("pair").to_numpy(zero_copy_only=False))
        c = (pair >> np.int64(20)).astype(np.int64)
        s = pair & np.int64((1 << 20) - 1)
        src = np.concatenate((c * 2, s * 2 + 1))
        dst = np.concatenate((s * 2 + 1, c * 2))
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    return (
        tagged.groupby("bkt")
        .map_groups(bucket_join, batch_format="pyarrow")
        .groupby("bkt2")
        .map_groups(bucket_dedup, batch_format="pyarrow")
    )


def _pagerank_broadcast(edges: Dataset, deg: Dataset, n_iter: int) -> Dataset:
    """Guarded small-graph strategy: sorted (node, deg, rank) arrays
    broadcast once per iteration; each iteration is one streaming pass
    over the materialized edge list plus one ``groupby(dst)`` sum.
    Bit-identical to the co-group path (same per-edge floor rule)."""
    rows = deg.take_all()
    nodes = np.array([r["node"] for r in rows], np.int64)
    degs = np.array([r["deg"] for r in rows], np.int64)
    order = np.argsort(nodes, kind="stable")
    nodes, degs = nodes[order], degs[order]
    edges = edges.materialize()
    ranks_arr = np.full(len(nodes), _SCALE, np.int64)
    base = (15 * _SCALE) // 100

    for _ in range(n_iter):
        ref = ray.put((nodes, degs, ranks_arr))

        def contribute(batch: pa.Table, _ref=ref) -> pa.Table:
            empty = pa.table(
                {
                    "dst": pa.array([], pa.int64()),
                    "c_partial": pa.array([], pa.int64()),
                }
            )
            if batch.num_rows == 0:
                return empty
            n_, d_, r_ = ray.get(_ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(n_, src)
            contrib = (r_[idx] * np.int64(85)) // (np.int64(100) * d_[idx])
            order2 = np.argsort(dst, kind="stable")
            ds_, cs_ = dst[order2], contrib[order2]
            starts = np.flatnonzero(np.concatenate(([True], ds_[1:] != ds_[:-1])))
            return pa.table(
                {
                    "dst": pa.array(ds_[starts], pa.int64()),
                    "c_partial": pa.array(np.add.reduceat(cs_, starts), pa.int64()),
                }
            )

        agg = (
            edges.map_batches(contribute, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("dst")
            .aggregate(Sum("c_partial"))
        )
        got = agg.take_all()  # node-sized — under the broadcast guard
        new = np.full(len(nodes), base, np.int64)
        if got:
            d_nodes = np.array([r["dst"] for r in got], np.int64)
            sums = np.array([r["sum(c_partial)"] for r in got], np.int64)
            new[np.searchsorted(nodes, d_nodes)] = base + sums
        ranks_arr = new

    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes, pa.int64()), "r": pa.array(ranks_arr, pa.int64())})
    )


def pagerank_ds(
    edges: Dataset,
    n_iter: int = 3,
    n_buckets: int = 512,
    max_broadcast_nodes: int = 2_000_000,
) -> Dataset:
    """Integer fixed-point PageRank over a directed edge list (``src``,
    ``dst``) where every node has at least one out-edge (true for the
    symmetric graphs ``bipartite_edges_ds`` builds). Returns
    ``(node, rank)`` after ``n_iter`` damped power iterations —
    bit-identical to the unrolled SQL twin by the module-level
    fixed-point rule, IDENTICAL under both execution strategies below.

    Two strategies, same guarded-broadcast convention as the dedup label
    attach (`corpus_ops` ``max_driver_labels``):

    * node count <= ``max_broadcast_nodes``: the (node -> rank, deg)
      arrays broadcast once per iteration via ``ray.put`` and each
      iteration is ONE streaming pass over the materialized edge list
      (per-batch contribution combiner) + ONE ``groupby(dst)`` sum — no
      per-iteration shuffle of the edges.
    * above the guard (web-scale graphs — the rank vector does NOT fit
      on one machine): out-degrees attach to edges ONCE via a bucket
      co-group, the edges-with-degree dataset materializes a single
      time, and each iteration re-streams it through the same bucket
      co-group against the current rank dataset (in-bucket ``reduceat``
      combiner) + one ``groupby(dst)`` sum. Pass
      ``max_broadcast_nodes=0`` to force this path (pinned hash-exact
      against the same oracle in the ``pagerank_cogroup`` entry).

    Rank datasets materialize per iteration so lineage never re-executes
    earlier rounds."""
    from ray.data.aggregate import Count

    deg = edges.groupby("src").aggregate(Count())

    def deg_norm(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("src").cast(pa.int64()),
                "deg": batch.column("count()").cast(pa.int64()),
            }
        )

    deg = deg.map_batches(
        deg_norm, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if deg.count() <= max_broadcast_nodes:
        return _pagerank_broadcast(edges, deg, n_iter)

    def tag(side: int, key_col: str, payload: Tuple[str, ...]):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch.column(key_col).to_numpy(zero_copy_only=False)
            bkt = (_mix64(k) % np.uint64(n_buckets)).astype(np.int64)
            cols = {
                "bkt": pa.array(bkt, pa.int64()),
                "k": pa.array(k, pa.int64()),
                "side": pa.array(np.full(len(k), side, np.int8), pa.int8()),
            }
            for i, p in enumerate(("p0", "p1")):
                if i < len(payload):
                    cols[p] = batch.column(payload[i]).cast(pa.int64())
                else:
                    cols[p] = pa.array(np.zeros(len(k), np.int64), pa.int64())
            return pa.table(cols)

        return fn

    def cogroup_attach(left: Dataset, right: Dataset, out_fn) -> Dataset:
        """left rows (side 0, lookup table node->value in p0) attach onto
        right rows (side 1) inside one bucket shuffle."""
        tagged = left.union(right)
        return tagged.groupby("bkt").map_groups(out_fn, batch_format="pyarrow")

    # ---- attach deg to edges once ----
    deg_tagged = deg.map_batches(
        tag(0, "node", ("deg",)), batch_format="pyarrow", zero_copy_batch=True
    )
    edge_tagged = edges.map_batches(
        tag(1, "src", ("dst",)), batch_format="pyarrow", zero_copy_batch=True
    )

    def attach_deg(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "deg": pa.array([], pa.int64()),
            }
        )
        side = group.column("side").to_numpy(zero_copy_only=False)
        lmask, rmask = side == 0, side == 1
        if not lmask.any() or not rmask.any():
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        nodes, degs = k[lmask], group.column("p0").to_numpy(zero_copy_only=False)[lmask]
        order = np.argsort(nodes, kind="stable")
        nodes, degs = nodes[order], degs[order]
        src = k[rmask]
        dst = group.column("p0").to_numpy(zero_copy_only=False)[rmask]
        pos = np.searchsorted(nodes, src)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "deg": pa.array(degs[pos], pa.int64()),
            }
        )

    edges_deg = cogroup_attach(deg_tagged, edge_tagged, attach_deg).materialize()

    # ---- initial ranks: every node at S ----
    def init_rank(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "r": pa.array(
                    np.full(batch.num_rows, _SCALE, np.int64), pa.int64()
                ),
            }
        )

    ranks = deg.map_batches(
        init_rank, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    base = (15 * _SCALE) // 100

    edges_retagged = edges_deg.map_batches(
        tag(1, "src", ("dst", "deg")), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    for _ in range(n_iter):
        rank_tagged = ranks.map_batches(
            tag(0, "node", ("r",)), batch_format="pyarrow", zero_copy_batch=True
        )

        def contribute(group: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "dst": pa.array([], pa.int64()),
                    "c_partial": pa.array([], pa.int64()),
                }
            )
            side = group.column("side").to_numpy(zero_copy_only=False)
            lmask, rmask = side == 0, side == 1
            if not lmask.any() or not rmask.any():
                return empty
            k = group.column("k").to_numpy(zero_copy_only=False)
            p0 = group.column("p0").to_numpy(zero_copy_only=False)
            p1 = group.column("p1").to_numpy(zero_copy_only=False)
            nodes, rs = k[lmask], p0[lmask]
            order = np.argsort(nodes, kind="stable")
            nodes, rs = nodes[order], rs[order]
            src, dst, degv = k[rmask], p0[rmask], p1[rmask]
            r_src = rs[np.searchsorted(nodes, src)]
            contrib = (r_src * np.int64(85)) // (np.int64(100) * degv)
            # in-bucket combiner: sum contributions per dst before the
            # shuffle — int64 reduceat (bincount weights would sum in
            # float64 and lose exactness past 2**53)
            order2 = np.argsort(dst, kind="stable")
            ds_, cs_ = dst[order2], contrib[order2]
            starts = np.flatnonzero(
                np.concatenate(([True], ds_[1:] != ds_[:-1]))
            )
            du = ds_[starts]
            csum = np.add.reduceat(cs_, starts)
            return pa.table(
                {
                    "dst": pa.array(du, pa.int64()),
                    "c_partial": pa.array(csum, pa.int64()),
                }
            )

        agg = (
            rank_tagged.union(edges_retagged)
            .groupby("bkt")
            .map_groups(contribute, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c_partial"))
        )

        def next_rank(batch: pa.Table) -> pa.Table:
            c = batch.column("sum(c_partial)").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": batch.column("dst").cast(pa.int64()),
                    "r": pa.array(np.int64(base) + c, pa.int64()),
                }
            )

        ranks = agg.map_batches(
            next_rank, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    return ranks


def copurchase_edges_ds(
    lineitem: Dataset,
    min_support: int = 2,
    n_buckets: int = 512,
) -> Dataset:
    """Mine the part co-purchase graph: parts are adjacent (one
    ``(x < y)`` edge row) when they appear together in >=
    ``min_support`` distinct orders. Returns the MATERIALIZED filtered
    edge list — the shared input of triangle enumeration and clustering
    coefficients.

    Scale shape, two bounded stages:

    1. **Pair mining** — lineitem rows shuffle ONCE by
       ``mix64(orderkey) % n_buckets``; inside a bucket every order is
       complete (an order hashes to exactly one bucket), so per-order
       part pairs generate vectorized — orders GROUPED BY SIZE k and the
       ``np.triu_indices(k, 1)`` template applied to the ``(n_k, k)``
       reshape, a tiny loop over distinct sizes, never over orders. One
       partial row per (pair) per bucket; per-pair support sums exactly
       in one ``groupby(pair)`` (each order lives in one bucket, so
       partial counts never double-count an order).
    2. **Support filter** — ``support >= min_support`` prunes the hub
       noise; the surviving edge set is orders of magnitude smaller
       than the pair stream (3.4k edges from 116k pairs at sf0.01).

    Bound: part keys must stay below 2^31 (composite ``x << 32 | y``
    in uint64)."""

    def tag_items(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").cast(pa.int64()).to_numpy(zero_copy_only=False)
        pk = batch.column("l_partkey").cast(pa.int64()).to_numpy(zero_copy_only=False)
        comp = np.unique(ok.astype(np.uint64) << np.uint64(32) | pk.astype(np.uint64))
        ok_u = (comp >> np.uint64(32)).astype(np.int64)
        pk_u = (comp & np.uint64(0xFFFFFFFF)).astype(np.int64)
        bkt = (_mix64(ok_u) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(bkt, pa.int64()),
                "okey": pa.array(ok_u, pa.int64()),
                "pkey": pa.array(pk_u, pa.int64()),
            }
        )

    def _segment_pairs(seg_key: np.ndarray, val: np.ndarray):
        """All within-segment value pairs (i<j in sorted order), looped
        over DISTINCT segment sizes only: segments of size k reshape to
        (n_k, k) and one triu template vectorizes every pair."""
        order = np.lexsort((val, seg_key))
        ks, vs = seg_key[order], val[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        seg_len = np.diff(np.concatenate((starts, [len(ks)])))
        lo_parts, hi_parts = [], []
        for k in np.unique(seg_len):
            if k < 2:
                continue
            sel = starts[seg_len == k]
            idx = sel[:, None] + np.arange(k)[None, :]
            mat = vs[idx]
            iu, ju = np.triu_indices(int(k), 1)
            lo_parts.append(mat[:, iu].ravel())
            hi_parts.append(mat[:, ju].ravel())
        if not lo_parts:
            z = np.array([], dtype=np.int64)
            return z, z
        return np.concatenate(lo_parts), np.concatenate(hi_parts)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"pair": pa.array([], pa.uint64()), "n_partial": pa.array([], pa.int64())}
        )
        if group.num_rows < 2:
            return empty
        # per-batch dedup in tag_items is an optimization only — an order
        # split across read blocks re-introduces duplicate (okey, pkey)
        # rows, so the authoritative dedup happens here, where the whole
        # order is guaranteed co-located
        comp = np.unique(
            group.column("okey").to_numpy(zero_copy_only=False).astype(np.uint64)
            << np.uint64(32)
            | group.column("pkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        ok = (comp >> np.uint64(32)).astype(np.int64)
        pk = (comp & np.uint64(0xFFFFFFFF)).astype(np.int64)
        lo, hi = _segment_pairs(ok, pk)
        if len(lo) == 0:
            return empty
        pair = lo.astype(np.uint64) << np.uint64(32) | hi.astype(np.uint64)
        uniq, cnt = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "pair": pa.array(uniq, pa.uint64()),
                "n_partial": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    support = (
        lineitem.select_columns(["l_orderkey", "l_partkey"])
        .map_batches(tag_items, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n_partial"))
    )

    def keep_edges(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        pair = batch.column("pair").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = batch.column("sum(n_partial)").to_numpy(zero_copy_only=False)
        keep = n >= min_support
        pair = pair[keep]
        return pa.table(
            {
                "x": pa.array((pair >> np.uint64(32)).astype(np.int64), pa.int64()),
                "y": pa.array(
                    (pair & np.uint64(0xFFFFFFFF)).astype(np.int64), pa.int64()
                ),
            }
        )

    return support.map_batches(
        keep_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()


def copurchase_triangles_ds(
    lineitem: Dataset,
    min_support: int = 2,
    n_buckets: int = 512,
    max_broadcast_edges: int = 20_000_000,
) -> Dataset:
    """Triangle enumeration over the part co-purchase graph (see
    ``copurchase_edges_ds`` for the edge mining): one row per triangle
    ``(a < b < c)``. The canonical graph-density signal over an
    association graph mined from baskets."""
    edges = copurchase_edges_ds(lineitem, min_support, n_buckets)
    return _triangles_from_edges(edges, n_buckets, max_broadcast_edges)


def _triangles_from_edges(
    edges: Dataset,
    n_buckets: int = 512,
    max_broadcast_edges: int = 20_000_000,
) -> Dataset:
    """Wedge-close stage: edges (``x < y``, MATERIALIZED) bucket by
    ``mix64(lower endpoint)``; per-node greater-neighbor pairs (wedges
    ``a<b<c``) generate with the size-grouped triu template, and close
    against the edge set broadcast ONCE as a sorted uint64 key array
    (``ray.put`` + per-batch ``searchsorted``), guarded by
    ``max_broadcast_edges``. Above the guard, close the wedges with the
    generic tagged-union ``hash_join_ds`` shuffle instead of raising —
    the broadcast is an optimization, not a requirement."""
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        )
    if n_edges > max_broadcast_edges:
        raise ValueError(
            f"filtered edge set ({n_edges}) exceeds max_broadcast_edges="
            f"{max_broadcast_edges}; close wedges with hash_join_ds instead"
        )
    edge_tbl = edges.take_all()
    edge_keys = np.sort(
        np.asarray([r["x"] for r in edge_tbl], dtype=np.uint64) << np.uint64(32)
        | np.asarray([r["y"] for r in edge_tbl], dtype=np.uint64)
    )
    keys_ref = ray.put(edge_keys)

    def tag_edges(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(x) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "x": batch.column("x"),
                "y": batch.column("y"),
            }
        )

    def close_wedges(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if group.num_rows < 2:
            return empty
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        order = np.lexsort((y, x))
        xs, ys = x[order], y[order]
        starts = np.flatnonzero(np.concatenate(([True], xs[1:] != xs[:-1])))
        seg_len = np.diff(np.concatenate((starts, [len(xs)])))
        a_parts, b_parts, c_parts = [], [], []
        keys = ray.get(keys_ref)
        for k in np.unique(seg_len):
            if k < 2:
                continue
            sel = starts[seg_len == k]
            idx = sel[:, None] + np.arange(k)[None, :]
            nb = ys[idx]  # sorted greater-neighbors per node
            iu, ju = np.triu_indices(int(k), 1)
            b_cand = nb[:, iu].ravel()
            c_cand = nb[:, ju].ravel()
            a_cand = np.repeat(xs[sel], len(iu))
            wedge = b_cand.astype(np.uint64) << np.uint64(32) | c_cand.astype(
                np.uint64
            )
            pos = np.searchsorted(keys, wedge)
            pos = np.clip(pos, 0, len(keys) - 1)
            hit = keys[pos] == wedge
            a_parts.append(a_cand[hit])
            b_parts.append(b_cand[hit])
            c_parts.append(c_cand[hit])
        if not a_parts:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_parts), pa.int64()),
                "b": pa.array(np.concatenate(b_parts), pa.int64()),
                "c": pa.array(np.concatenate(c_parts), pa.int64()),
            }
        )

    tri = (
        edges.map_batches(tag_edges, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(close_wedges, batch_format="pyarrow")
    )
    empty_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("c", pa.int64())]
    )
    return ray.data.from_arrow(
        pa.table({f.name: pa.array([], f.type) for f in empty_schema})
    ).union(tri)


def clustering_coeff_ds(
    lineitem: Dataset,
    min_support: int = 2,
    n_buckets: int = 512,
    max_broadcast_edges: int = 20_000_000,
) -> Dataset:
    """Local clustering coefficient per node of the co-purchase graph:
    ``coeff_e6 = (2 * triangles_at(v) * 10^6) // (deg(v) * (deg(v)-1))``
    (integer floor — exact in both engines), plus the raw ``n_tri`` /
    ``degree`` accumulators. Nodes with degree < 2 report 0.

    Scale shape: the mined edge list materializes ONCE and feeds both
    sides; triangle rows fan out to their three corners and edge rows to
    their two endpoints as tagged ``(node, tri_p, deg_p)`` partials —
    already combined per batch — so the only exchange is one
    ``groupby(node)`` of two integer sums."""
    edges = copurchase_edges_ds(lineitem, min_support, n_buckets)
    tri = _triangles_from_edges(edges, n_buckets, max_broadcast_edges)

    def tri_corners(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "node": pa.array([], pa.int64()),
                "tri_p": pa.array([], pa.int64()),
                "deg_p": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        corners = np.concatenate(
            [
                batch.column(c).to_numpy(zero_copy_only=False)
                for c in ("a", "b", "c")
            ]
        )
        nodes, cnt = np.unique(corners, return_counts=True)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "tri_p": pa.array(cnt.astype(np.int64), pa.int64()),
                "deg_p": pa.array(np.zeros(len(nodes), np.int64), pa.int64()),
            }
        )

    def edge_endpoints(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "node": pa.array([], pa.int64()),
                "tri_p": pa.array([], pa.int64()),
                "deg_p": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ends = np.concatenate(
            [
                batch.column("x").to_numpy(zero_copy_only=False),
                batch.column("y").to_numpy(zero_copy_only=False),
            ]
        )
        nodes, cnt = np.unique(ends, return_counts=True)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "tri_p": pa.array(np.zeros(len(nodes), np.int64), pa.int64()),
                "deg_p": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    tagged = tri.map_batches(
        tri_corners, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        edges.map_batches(
            edge_endpoints, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    agg = tagged.groupby("node").aggregate(Sum("tri_p"), Sum("deg_p"))

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "node": pa.array([], pa.int64()),
                "n_tri": pa.array([], pa.int64()),
                "degree": pa.array([], pa.int64()),
                "coeff_e6": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        node = batch.column("node").cast(pa.int64()).to_numpy(zero_copy_only=False)
        tri_n = batch.column("sum(tri_p)").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        deg = batch.column("sum(deg_p)").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        denom = deg * (deg - 1)
        coeff = np.where(denom > 0, (2 * tri_n * 1_000_000) // np.maximum(denom, 1), 0)
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "n_tri": pa.array(tri_n, pa.int64()),
                "degree": pa.array(deg, pa.int64()),
                "coeff_e6": pa.array(coeff.astype(np.int64), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def connected_components_ds(
    lineitem: Dataset,
    min_support: int = 2,
    n_buckets: int = 512,
    max_broadcast_components: int = 20_000_000,
) -> Dataset:
    """Connected components of the co-purchase graph (edges per
    ``copurchase_edges_ds``): one row per node with its component id —
    the component's minimum part key — plus the component size. The
    community-grouping step behind per-cluster sampling, cluster-level
    dedup analytics, and graph partition planning.

    Scale shape: reuses the distributed hash-min label propagation that
    powers dedup-cluster resolution
    (``corpus_ops._min_label_propagation`` — iterated
    ``groupby().min()`` with a pointer-doubling shortcut, O(log
    diameter) rounds, nothing node-count-sized on the driver); the
    mined edge list materializes ONCE and is the only large dataset.
    Component sizes come from one extra ``groupby(label)`` count whose
    per-batch combiner emits one row per distinct label per block."""
    from .corpus_ops import _min_label_propagation

    empty_schema = pa.schema(
        [("node", pa.int64()), ("component", pa.int64()), ("n_nodes", pa.int64())]
    )
    empty = pa.table({f.name: pa.array([], f.type) for f in empty_schema})
    edges = copurchase_edges_ds(lineitem, min_support, n_buckets)
    if edges.count() == 0:  # edges is materialized — count is free
        return ray.data.from_arrow(empty)
    labels = _min_label_propagation(edges, "x", "y").materialize()

    def size_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"component": pa.array([], pa.int64()),
                 "sz_p": pa.array([], pa.int64())}
            )
        lab, cnt = np.unique(
            batch.column("label").cast(pa.int64()).to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {
                "component": pa.array(lab, pa.int64()),
                "sz_p": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    sizes = (
        labels.map_batches(size_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("component")
        .aggregate(Sum("sz_p"))
        .map_batches(
            lambda b: pa.table(
                {
                    "component": b.column("component").cast(pa.int64()),
                    "n_nodes": b.column("sum(sz_p)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    if sizes.count() > max_broadcast_components:
        # too many components for a driver-side lookup: attach sizes
        # through the generic bucket-hash shuffle join instead
        from .analytics import hash_join_ds

        renamed = labels.map_batches(
            lambda b: pa.table(
                {
                    "component": b.column("label").cast(pa.int64()),
                    "node": b.column("node").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        joined = hash_join_ds(renamed, sizes, "component", "component", n_buckets)
        out = joined.map_batches(
            lambda b: b.select(["node", "component", "n_nodes"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return ray.data.from_arrow(empty).union(out)

    # small-component-count path: ONE driver-bounded lookup broadcast
    size_rows = sizes.take_all()
    comp_ids = np.asarray([r["component"] for r in size_rows], dtype=np.int64)
    comp_sz = np.asarray([r["n_nodes"] for r in size_rows], dtype=np.int64)
    order = np.argsort(comp_ids)
    comp_ref = ray.put((comp_ids[order], comp_sz[order]))

    def attach(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        ids, sz = ray.get(comp_ref)
        node = batch.column("node").cast(pa.int64()).to_numpy(zero_copy_only=False)
        lab = batch.column("label").cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ids, lab)
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "component": pa.array(lab, pa.int64()),
                "n_nodes": pa.array(sz[pos], pa.int64()),
            }
        )

    return labels.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def degree_distribution_ds(
    lineitem: Dataset,
    min_support: int = 2,
    n_buckets: int = 512,
) -> Dataset:
    """Degree distribution of the support>=``min_support`` co-purchase
    graph: one row per distinct degree with the number of nodes holding
    it — the graph-health summary (power-law check, hub detection) any
    link-graph pipeline reports before iterative algorithms run.

    Scale shape: two combiner+groupby rounds, both pre-aggregated per
    block. Round 1 counts each node's neighbors (one partial row per
    node per block via ``np.unique`` over both edge endpoints); round 2
    histograms the degrees (one partial row per distinct degree per
    block). The edge list — mined and materialized once by
    ``copurchase_edges_ds`` — is the only large dataset."""
    empty_schema = pa.schema([("degree", pa.int64()), ("n_nodes", pa.int64())])
    empty = pa.table({f.name: pa.array([], f.type) for f in empty_schema})
    edges = copurchase_edges_ds(lineitem, min_support, n_buckets)

    def deg_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "d_p": pa.array([], pa.int64())}
            )
        both = np.concatenate(
            [
                batch.column("x").cast(pa.int64()).to_numpy(zero_copy_only=False),
                batch.column("y").cast(pa.int64()).to_numpy(zero_copy_only=False),
            ]
        )
        node, cnt = np.unique(both, return_counts=True)
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "d_p": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    degrees = (
        edges.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Sum("d_p"))
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"degree": pa.array([], pa.int64()), "n_p": pa.array([], pa.int64())}
            )
        deg, cnt = np.unique(
            batch.column("sum(d_p)").cast(pa.int64()).to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {
                "degree": pa.array(deg, pa.int64()),
                "n_p": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    out = (
        degrees.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("degree")
        .aggregate(Sum("n_p"))
        .map_batches(
            lambda b: pa.table(
                {
                    "degree": b.column("degree").cast(pa.int64()),
                    "n_nodes": b.column("sum(n_p)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return ray.data.from_arrow(empty).union(out)


def bfs_layers_ds(
    lineitem: Dataset,
    source: int | None = None,
    max_rounds: int = 4,
    min_support: int = 2,
    n_buckets: int = 512,
    max_broadcast_nodes: int = 20_000_000,
) -> Dataset:
    """BFS shortest-path layers over the co-purchase graph: one row per
    node reachable from ``source`` (default: the smallest node) within
    ``max_rounds`` hops, with its hop distance — the neighborhood /
    blast-radius traversal behind related-item expansion and graph
    sampling. A fixed round budget (not convergence detection) keeps the
    operator's output a pure function the bounded recursive-CTE twin
    reproduces; extra rounds past the diameter are no-ops.

    Scale shape: the mined edge list (:func:`copurchase_edges_ds`)
    materializes once; each round is ONE map_batches pass over edges
    against the broadcast frontier-distance vector (node-count-sized,
    guarded by ``max_broadcast_nodes``) emitting per-block min-distance
    partials. Above the guard, swap the broadcast for the same
    mix64-bucket co-group exchange :func:`pagerank_ds` and
    :func:`connected_components_ds` already implement for their
    rank/label vectors — the strategy switch, not a rewrite."""
    empty_schema = pa.schema([("node", pa.int64()), ("dist", pa.int64())])
    empty = pa.table({f.name: pa.array([], f.type) for f in empty_schema})
    edges = copurchase_edges_ds(lineitem, min_support, n_buckets)
    if edges.count() == 0:
        return ray.data.from_arrow(empty)

    def node_partial(batch: pa.Table) -> pa.Table:
        xs = batch.column("x").to_numpy(zero_copy_only=False)
        ys = batch.column("y").to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": pa.array(np.unique(np.concatenate((xs, ys))), pa.int64())}
        )

    node_rows = (
        edges.map_batches(node_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .count()
        .take_all()
    )
    if len(node_rows) > max_broadcast_nodes:
        raise ValueError(
            f"{len(node_rows)} nodes exceed max_broadcast_nodes="
            f"{max_broadcast_nodes}; use the bucket co-group exchange "
            "(see pagerank_ds cogroup strategy)"
        )
    nodes = np.sort(np.asarray([r["node"] for r in node_rows], np.int64))
    src = int(nodes[0]) if source is None else int(source)
    INF = np.int64(1 << 62)
    dist = np.full(len(nodes), INF, dtype=np.int64)
    pos = np.searchsorted(nodes, src)
    if pos >= len(nodes) or nodes[pos] != src:
        return ray.data.from_arrow(empty)
    dist[pos] = 0

    for _ in range(max_rounds):
        state_ref = ray.put(dist)

        def relax_partial(batch: pa.Table) -> pa.Table:
            d = ray.get(state_ref)
            xs = batch.column("x").to_numpy(zero_copy_only=False)
            ys = batch.column("y").to_numpy(zero_copy_only=False)
            xi = np.searchsorted(nodes, xs)
            yi = np.searchsorted(nodes, ys)
            # undirected relax both ways; min-combine per block
            tgt = np.concatenate((yi, xi))
            cand = np.concatenate((d[xi], d[yi])) + 1
            ok = cand < np.int64(1 << 61)
            tgt, cand = tgt[ok], cand[ok]
            if not len(tgt):
                return pa.table(
                    {"i": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
                )
            order = np.lexsort((cand, tgt))
            tgt, cand = tgt[order], cand[order]
            first = np.concatenate(([True], tgt[1:] != tgt[:-1]))
            return pa.table(
                {
                    "i": pa.array(tgt[first], pa.int64()),
                    "d": pa.array(cand[first], pa.int64()),
                }
            )

        parts = edges.map_batches(
            relax_partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()  # <= distinct touched nodes per block
        new = dist.copy()
        for r in parts:
            i, dd = int(r["i"]), int(r["d"])
            if dd < new[i]:
                new[i] = dd
        if np.array_equal(new, dist):
            break  # converged: further rounds cannot change min distances
        dist = new

    reached = dist < INF
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes[reached], pa.int64()),
                "dist": pa.array(dist[reached], pa.int64()),
            }
        )
    )


def kcore_ds(
    lineitem: Dataset,
    k: int = 2,
    max_rounds: int = 6,
    min_support: int = 2,
    n_buckets: int = 512,
    max_broadcast_nodes: int = 20_000_000,
) -> Dataset:
    """Bounded-round ``k``-core peeling over the co-purchase graph: run
    exactly ``max_rounds`` peel rounds (each drops every node whose
    degree among surviving nodes is < ``k``), returning the survivors
    and their within-core degree — the density filter behind spam-farm
    pruning and community seeding. A FIXED round budget (with early
    break on fixpoint, which cannot change the result — peeling is
    monotone and idempotent past convergence) keeps the output a pure
    function a chained-CTE SQL twin reproduces round for round.

    Scale shape: the mined edge list (:func:`copurchase_edges_ds`)
    materializes once; each round is ONE ``map_batches`` pass over edges
    against the broadcast alive vector (node-count-sized, guarded by
    ``max_broadcast_nodes``) emitting per-block (node, partial-degree)
    rows — O(touched nodes per block), combined on the driver like
    :func:`bfs_layers_ds`'s relax partials. Above the guard, swap the
    broadcast for the mix64-bucket co-group exchange
    :func:`pagerank_ds` implements."""
    if max_rounds < 1:
        raise ValueError("kcore_ds needs max_rounds >= 1")
    empty_schema = pa.schema([("node", pa.int64()), ("core_deg", pa.int64())])
    empty = pa.table({f.name: pa.array([], f.type) for f in empty_schema})
    edges = copurchase_edges_ds(lineitem, min_support, n_buckets)
    if edges.count() == 0:
        return ray.data.from_arrow(empty)

    def node_partial(batch: pa.Table) -> pa.Table:
        xs = batch.column("x").to_numpy(zero_copy_only=False)
        ys = batch.column("y").to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": pa.array(np.unique(np.concatenate((xs, ys))), pa.int64())}
        )

    node_rows = (
        edges.map_batches(node_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .count()
        .take_all()
    )
    if len(node_rows) > max_broadcast_nodes:
        raise ValueError(
            f"{len(node_rows)} nodes exceed max_broadcast_nodes="
            f"{max_broadcast_nodes}; use the bucket co-group exchange "
            "(see pagerank_ds cogroup strategy)"
        )
    nodes = np.sort(np.asarray([r["node"] for r in node_rows], np.int64))
    alive = np.ones(len(nodes), dtype=bool)
    deg = np.zeros(len(nodes), dtype=np.int64)

    for _ in range(max_rounds):
        alive_ref = ray.put(alive)

        def degree_partial(batch: pa.Table) -> pa.Table:
            a = ray.get(alive_ref)
            xs = batch.column("x").to_numpy(zero_copy_only=False)
            ys = batch.column("y").to_numpy(zero_copy_only=False)
            xi = np.searchsorted(nodes, xs)
            yi = np.searchsorted(nodes, ys)
            ok = a[xi] & a[yi]
            touched = np.concatenate((xi[ok], yi[ok]))
            if not len(touched):
                return pa.table(
                    {"i": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
                )
            uniq, cnt = np.unique(touched, return_counts=True)
            return pa.table(
                {
                    "i": pa.array(uniq, pa.int64()),
                    "d": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        parts = edges.map_batches(
            degree_partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()  # <= distinct touched nodes per block
        deg = np.zeros(len(nodes), dtype=np.int64)
        for r in parts:
            deg[int(r["i"])] += int(r["d"])
        new_alive = alive & (deg >= k)
        if np.array_equal(new_alive, alive):
            break  # fixpoint: further rounds are no-ops; deg already
            # equals the within-core degree of the final alive set
        alive = new_alive
    else:
        # round budget exhausted without fixpoint: deg is stale (it was
        # measured before the last peel) — one more pass reports the
        # degree within the FINAL survivor set, matching the SQL twin's
        # final-layer degree computation.
        alive_ref = ray.put(alive)
        parts = edges.map_batches(
            degree_partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        deg = np.zeros(len(nodes), dtype=np.int64)
        for r in parts:
            deg[int(r["i"])] += int(r["d"])

    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes[alive], pa.int64()),
                "core_deg": pa.array(deg[alive], pa.int64()),
            }
        )
    )


def two_hop_ds(
    lineitem: Dataset,
    min_support: int = 2,
    n_buckets: int = 512,
    max_broadcast_edges: int = 20_000_000,
) -> Dataset:
    """Friends-of-friends: per node of the co-purchase graph, the EXACT
    count of distinct nodes at graph distance exactly 2 (reachable
    through a shared neighbor, not adjacent, not self) — the
    recommendation-candidate pool size.

    Scale shape: adjacency rows (node, neighbor) in both directions
    shuffle ONCE by ``mix64(middle node)``; inside a bucket each middle
    node's neighbor list generates its ordered pairs with the
    size-grouped triu template (loop over distinct degrees, never over
    nodes) and dedupes locally; a ``groupby(u, w)`` dedupes globally;
    direct edges are removed against the broadcast sorted edge-key
    array (guarded by ``max_broadcast_edges``); a final combiner +
    ``groupby(node)`` counts. Cost is sum(deg(v)^2) over middle nodes —
    the support filter upstream prunes hub noise, and the degree-capped
    star fallback of the LSH family applies if a hub survives."""
    edges = copurchase_edges_ds(lineitem, min_support, n_buckets)
    empty = pa.table(
        {"node": pa.array([], pa.int64()), "n_two_hop": pa.array([], pa.int64())}
    )
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(empty)
    if n_edges > max_broadcast_edges:
        raise ValueError(
            f"filtered edge set ({n_edges}) exceeds max_broadcast_edges="
            f"{max_broadcast_edges}; filter direct edges with hash_join_ds"
        )
    edge_tbl = edges.take_all()
    ex = np.asarray([r["x"] for r in edge_tbl], dtype=np.uint64)
    ey = np.asarray([r["y"] for r in edge_tbl], dtype=np.uint64)
    edge_keys = np.sort((ex << np.uint64(32)) | ey)
    keys_ref = ray.put(edge_keys)

    def adj(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        node = np.concatenate((x, y))
        nb = np.concatenate((y, x))
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(node) % np.uint64(n_buckets)).astype(np.int64),
                    pa.int64(),
                ),
                "node": pa.array(node, pa.int64()),
                "nb": pa.array(nb, pa.int64()),
            }
        )

    cand_schema = pa.schema([("u", pa.int64()), ("w", pa.int64())])

    def wedge_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table({f.name: pa.array([], f.type) for f in cand_schema})
        v = group.column("node").to_numpy(zero_copy_only=False)
        nb = group.column("nb").to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, v))
        vs, nbs = v[order], nb[order]
        starts = np.flatnonzero(np.concatenate(([True], vs[1:] != vs[:-1])))
        seg_len = np.diff(np.concatenate((starts, [len(vs)])))
        u_parts, w_parts = [], []
        for k in np.unique(seg_len):
            if k < 2:
                continue
            sel = starts[seg_len == k]
            idx = sel[:, None] + np.arange(int(k))[None, :]
            nbm = nbs[idx]
            iu, ju = np.triu_indices(int(k), 1)
            a = nbm[:, iu].ravel()
            b = nbm[:, ju].ravel()
            # both directions of each unordered wedge pair
            u_parts.extend((a, b))
            w_parts.extend((b, a))
        if not u_parts:
            return pa.table({f.name: pa.array([], f.type) for f in cand_schema})
        u = np.concatenate(u_parts)
        w = np.concatenate(w_parts)
        # in-bucket dedup before the exchange
        o = np.lexsort((w, u))
        u, w = u[o], w[o]
        first = np.concatenate(([True], (u[1:] != u[:-1]) | (w[1:] != w[:-1])))
        return pa.table(
            {"u": pa.array(u[first], pa.int64()), "w": pa.array(w[first], pa.int64())}
        )

    cands = (
        edges.map_batches(adj, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(wedge_pairs, batch_format="pyarrow")
        .groupby(["u", "w"])
        .count()
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        u = batch.column("u").to_numpy(zero_copy_only=False)
        w = batch.column("w").to_numpy(zero_copy_only=False)
        lo = np.minimum(u, w).astype(np.uint64)
        hi = np.maximum(u, w).astype(np.uint64)
        comp = (lo << np.uint64(32)) | hi
        pos = np.searchsorted(keys, comp)
        direct = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == comp)
        u = u[~direct]
        uu, cnt = np.unique(u, return_counts=True)
        return pa.table(
            {
                "node": pa.array(uu.astype(np.int64), pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    out = (
        cands.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Sum("n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node").cast(pa.int64()),
                "n_two_hop": batch.column("sum(n)").cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def link_jaccard_ds(
    lineitem: Dataset,
    min_support: int = 2,
    n_buckets: int = 512,
    max_broadcast_edges: int = 20_000_000,
) -> Dataset:
    """Neighborhood-Jaccard link scores — the classic link-prediction /
    edge-strength feature: for every EDGE (x, y) of the co-purchase
    graph, the common-neighbor count and both degrees, i.e. the exact
    integer components of ``J = common / (deg_x + deg_y - common)``
    (note x-y adjacency itself does not count x or y as common
    neighbors).

    Scale shape: adjacency rows shuffle ONCE by ``mix64(middle node)``;
    per middle node the size-grouped triu template emits each unordered
    neighbor pair once with an in-bucket count combiner; a
    ``groupby(lo, hi)`` sums wedge counts globally; pairs filter to the
    broadcast sorted edge keys (guarded by ``max_broadcast_edges`` —
    the same bound that already makes the edge list and degree table
    driver-safe); edges with zero common neighbors emit with 0."""
    edges = copurchase_edges_ds(lineitem, min_support, n_buckets)
    out_schema = pa.schema(
        [
            ("x", pa.int64()),
            ("y", pa.int64()),
            ("common", pa.int64()),
            ("deg_x", pa.int64()),
            ("deg_y", pa.int64()),
        ]
    )
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
    if n_edges > max_broadcast_edges:
        raise ValueError(
            f"filtered edge set ({n_edges}) exceeds max_broadcast_edges="
            f"{max_broadcast_edges}"
        )
    edge_tbl = edges.take_all()
    ex = np.asarray([r["x"] for r in edge_tbl], dtype=np.int64)
    ey = np.asarray([r["y"] for r in edge_tbl], dtype=np.int64)
    nodes, deg = np.unique(np.concatenate((ex, ey)), return_counts=True)
    cm = _edge_support(ex, ey, n_buckets)
    dx = deg[np.searchsorted(nodes, ex)]
    dy = deg[np.searchsorted(nodes, ey)]
    return ray.data.from_arrow(
        pa.table(
            {
                "x": pa.array(ex, pa.int64()),
                "y": pa.array(ey, pa.int64()),
                "common": pa.array(cm, pa.int64()),
                "deg_x": pa.array(dx.astype(np.int64), pa.int64()),
                "deg_y": pa.array(dy.astype(np.int64), pa.int64()),
            }
        )
    )


def label_prop_step_ds(
    lineitem: Dataset,
    min_support: int = 2,
    n_buckets: int = 256,
) -> Dataset:
    """Two synchronous rounds of community label propagation (LPA,
    Raghavan et al. 2007) over the co-purchase graph — the
    shuffle-bounded community-detection step used to group near-dup
    product/doc families before per-community curation.

    Round 1 from the canonical all-distinct init (label(v) = v): the
    frequency-mode update degenerates to ``l1(v) = min(N(v))`` (every
    neighbor label is distinct, ties break to the smallest), computed as
    one ``groupby(node).min`` with per-batch combining. Round 2 is the
    real mode vote: ``l2(v)`` = the most frequent ``l1`` among v's
    neighbors, ties to the smallest label; emitted with its vote count.

    Scale shape (no broadcast of the label vector — it is node-count
    sized and does NOT fit one machine at web scale):

    1. adjacency rows + round-1 label rows co-locate by ``mix64(join
       key) % n_buckets`` (key = neighbor for adj rows, node for label
       rows) — ONE bounded-group shuffle, sorted ``searchsorted`` attach
       inside the bucket;
    2. labelled adjacency shuffles ONCE by ``mix64(node)`` and the mode
       is a vectorized run-length count + lexsort argmax inside the
       bucket — never a per-node Python group.

    Output: ``(node, label, votes)``, one row per graph node."""
    edges = copurchase_edges_ds(lineitem, min_support, n_buckets)

    def adj(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        node = np.concatenate((x, y))
        nb = np.concatenate((y, x))
        return pa.table(
            {"node": pa.array(node, pa.int64()), "nb": pa.array(nb, pa.int64())}
        )

    adj_ds = edges.map_batches(adj, batch_format="pyarrow", zero_copy_batch=True)
    adj_ds = adj_ds.materialize()  # consumed by l1 AND the attach
    if adj_ds.count() == 0:  # no qualifying edges: no communities
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                    "votes": pa.array([], pa.int64()),
                }
            )
        )
    l1 = adj_ds.groupby("node").min("nb")  # (node, min(nb))
    # round-2 input: each adjacency row picks up its neighbor's round-1
    # label via the shared bounded co-group attach
    labelled = _attach_by_neighbor(adj_ds, l1, "min(nb)", n_buckets).rename_columns(
        ["node", "label"]
    )

    def tag_node(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bkt",
            pa.array((_mix64(node) % np.uint64(n_buckets)).astype(np.int64), pa.int64()),
        )

    out_schema = pa.schema(
        [("node", pa.int64()), ("label", pa.int64()), ("votes", pa.int64())]
    )

    def mode(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        if group.num_rows == 0:
            return empty
        node = group.column("node").to_numpy(zero_copy_only=False)
        lbl = group.column("label").to_numpy(zero_copy_only=False)
        order = np.lexsort((lbl, node))
        ns, ls = node[order], lbl[order]
        first = np.concatenate(([True], (ns[1:] != ns[:-1]) | (ls[1:] != ls[:-1])))
        starts = np.flatnonzero(first)
        votes = np.diff(np.concatenate((starts, [len(ns)])))
        rn, rl = ns[starts], ls[starts]
        # per node: max votes, tie -> smallest label (runs are label-sorted,
        # so a stable sort on -votes within node keeps the smallest first)
        o2 = np.lexsort((rl, -votes, rn))
        rn2, rl2, rv2 = rn[o2], rl[o2], votes[o2]
        keep = np.concatenate(([True], rn2[1:] != rn2[:-1]))
        return pa.table(
            {
                "node": pa.array(rn2[keep], pa.int64()),
                "label": pa.array(rl2[keep], pa.int64()),
                "votes": pa.array(rv2[keep], pa.int64()),
            }
        )

    return (
        labelled.map_batches(tag_node, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(mode, batch_format="pyarrow")
    )


def _attach_by_neighbor(
    adj_ds: Dataset, kv_ds: Dataset, val_name: str, n_buckets: int
) -> Dataset:
    """Co-group attach of a per-node value onto adjacency rows by their
    NEIGHBOR endpoint: for each ``(node, nb)`` row emit ``(node,
    val[nb])``. One bounded hash-bucket shuffle (tagged union keyed by
    ``mix64(join key)``), sorted ``searchsorted`` probe inside the
    bucket — never a broadcast of the node-count-sized value vector.
    ``kv_ds`` holds ``(node, <val_name>)`` with exactly one row per node;
    every ``nb`` must appear in it (true for degree-like values derived
    from the same adjacency)."""

    def tag_vals(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        val = batch.column(val_name).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(node) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "key": pa.array(node, pa.int64()),
                "side": pa.array(np.zeros(len(node), np.int8), pa.int8()),
                "val": pa.array(val, pa.int64()),
            }
        )

    def tag_adj(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        nb = batch.column("nb").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(nb) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "key": pa.array(nb, pa.int64()),
                "side": pa.array(np.ones(len(node), np.int8), pa.int8()),
                "val": pa.array(node, pa.int64()),
            }
        )

    tagged = kv_ds.map_batches(
        tag_vals, batch_format="pyarrow", zero_copy_batch=True
    ).union(adj_ds.map_batches(tag_adj, batch_format="pyarrow", zero_copy_batch=True))

    out_schema = pa.schema([("node", pa.int64()), ("nb_val", pa.int64())])

    def attach(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
        side = group.column("side").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy(zero_copy_only=False)
        val = group.column("val").to_numpy(zero_copy_only=False)
        lmask = side == 0
        amask = ~lmask
        if not lmask.any() or not amask.any():
            return empty
        lkey, lval = key[lmask], val[lmask]
        o = np.argsort(lkey, kind="stable")
        lkey, lval = lkey[o], lval[o]
        pos = np.searchsorted(lkey, key[amask])
        return pa.table(
            {
                "node": pa.array(val[amask], pa.int64()),
                "nb_val": pa.array(lval[pos], pa.int64()),
            }
        )

    return tagged.groupby("bkt").map_groups(attach, batch_format="pyarrow")


def hits_step_ds(
    lineitem: Dataset,
    min_support: int = 2,
    n_buckets: int = 256,
) -> Dataset:
    """Two integer-exact HITS iterations (Kleinberg 1999) over the
    undirected co-purchase graph from the uniform init ``hub0 = 1``:

    * ``auth1(v) = sum(hub0 over N(v)) = deg(v)``
    * ``hub1(v)  = sum(auth1 over N(v))`` — the neighbor-degree mass
    * ``auth2(v) = sum(hub1 over N(v))`` — two-step authority

    Unnormalized fixed-point arithmetic (normalization is a single
    global scalar per round — deferable, and skipping it keeps every
    value an exact int64 so the SQL twin matches bit-for-bit; bound:
    ``sum-of-degrees^2`` per node below 2^63).

    Scale shape: each half-iteration is ONE ``_attach_by_neighbor``
    co-group (bounded-bucket shuffle, searchsorted probe — no
    node-vector broadcast) followed by ONE combined ``groupby(node)``
    sum; the three per-node columns merge by a final sum-groupby over a
    tagged union (additive merge, no join)."""
    edges = copurchase_edges_ds(lineitem, min_support, n_buckets)

    def adj(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate((x, y)), pa.int64()),
                "nb": pa.array(np.concatenate((y, x)), pa.int64()),
            }
        )

    adj_ds = edges.map_batches(
        adj, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def ones(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "one", pa.array(np.ones(batch.num_rows, np.int64), pa.int64())
        )

    deg = (
        adj_ds.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Sum("one"))
    )  # (node, sum(one)) = auth1

    hub1 = (
        _attach_by_neighbor(adj_ds, deg, "sum(one)", n_buckets)
        .groupby("node")
        .aggregate(Sum("nb_val"))
    )  # (node, sum(nb_val)) = hub1

    auth2 = (
        _attach_by_neighbor(adj_ds, hub1, "sum(nb_val)", n_buckets)
        .groupby("node")
        .aggregate(Sum("nb_val"))
    )

    def widen(col: str, slot: int):
        def fn(batch: pa.Table) -> pa.Table:
            v = batch.column(col).cast(pa.int64()).to_numpy(zero_copy_only=False)
            z = np.zeros(len(v), np.int64)
            cols = [z, z, z]
            cols[slot] = v
            return pa.table(
                {
                    "node": batch.column("node").cast(pa.int64()),
                    "degree": pa.array(cols[0], pa.int64()),
                    "hub1": pa.array(cols[1], pa.int64()),
                    "auth2": pa.array(cols[2], pa.int64()),
                }
            )

        return fn

    merged = (
        deg.map_batches(widen("sum(one)", 0), batch_format="pyarrow")
        .union(hub1.map_batches(widen("sum(nb_val)", 1), batch_format="pyarrow"))
        .union(auth2.map_batches(widen("sum(nb_val)", 2), batch_format="pyarrow"))
        .groupby("node")
        .aggregate(Sum("degree"), Sum("hub1"), Sum("auth2"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node").cast(pa.int64()),
                "degree": batch.column("sum(degree)").cast(pa.int64()),
                "hub1": batch.column("sum(hub1)").cast(pa.int64()),
                "auth2": batch.column("sum(auth2)").cast(pa.int64()),
            }
        )

    return merged.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def assortativity_ds(
    lineitem: Dataset,
    min_support: int = 2,
    n_buckets: int = 256,
) -> Dataset:
    """Degree-assortativity moment components over the co-purchase
    graph (Newman 2002): one row of exact integer sums over DIRECTED
    edges — ``(n_dir_edges, s_d, s_dd, s_d2)`` where per edge (u, v)
    the terms are deg(u), deg(u)*deg(v), deg(u)^2. The Pearson degree
    correlation derives rationally:
    ``r = (n*s_dd - s_d^2) / (n*s_d2 - s_d^2)`` (symmetric edge list,
    so the u- and v-marginals coincide). Hub-dominated (disassortative)
    graphs flag skew risk for every neighborhood-join operator upstream.

    Scale shape: TWO ``_attach_by_neighbor`` co-groups thread deg(v)
    then deg(u) onto each directed edge without ever broadcasting the
    degree vector; a streaming partial then folds everything into four
    int64 counters per block and one single-group sum. Bound
    (documented): ``sum(deg^2 per edge)`` must stay below 2^63 —
    beyond that (deg ~ 10^6 hubs at 10^12 edges) switch the partial to
    Python-int accumulation with a HUGEINT twin."""
    edges = copurchase_edges_ds(lineitem, min_support, n_buckets)

    def adj(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate((x, y)), pa.int64()),
                "nb": pa.array(np.concatenate((y, x)), pa.int64()),
            }
        )

    adj_ds = edges.map_batches(
        adj, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def ones(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "one", pa.array(np.ones(batch.num_rows, np.int64), pa.int64())
        )

    deg = (
        adj_ds.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Sum("one"))
    )
    # (node=u, nb_val=deg(v)) per directed edge
    dnb = _attach_by_neighbor(adj_ds, deg, "sum(one)", n_buckets)

    def swap(batch: pa.Table) -> pa.Table:
        # re-enter the attach with the carried deg(v) as the payload and
        # u as the join key, yielding (deg(v), deg(u)) pairs
        return pa.table(
            {
                "node": batch.column("nb_val").cast(pa.int64()),
                "nb": batch.column("node").cast(pa.int64()),
            }
        )

    pairs = _attach_by_neighbor(
        dnb.map_batches(swap, batch_format="pyarrow", zero_copy_batch=True),
        deg,
        "sum(one)",
        n_buckets,
    )  # (node=deg(v), nb_val=deg(u))

    def fold(batch: pa.Table) -> pa.Table:
        dv = batch.column("node").to_numpy(zero_copy_only=False)
        du = batch.column("nb_val").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "n_e": pa.array([len(du)], pa.int64()),
                "s_d": pa.array([int(du.sum())], pa.int64()),
                "s_dd": pa.array([int((du * dv).sum())], pa.int64()),
                "s_d2": pa.array([int((du * du).sum())], pa.int64()),
            }
        )

    agg = (
        pairs.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(Sum("n_e"), Sum("s_d"), Sum("s_dd"), Sum("s_d2"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_dir_edges": batch.column("sum(n_e)").cast(pa.int64()),
                "s_d": batch.column("sum(s_d)").cast(pa.int64()),
                "s_dd": batch.column("sum(s_dd)").cast(pa.int64()),
                "s_d2": batch.column("sum(s_d2)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def _edge_support(
    ex: np.ndarray, ey: np.ndarray, n_buckets: int
) -> np.ndarray:
    """Distributed per-edge triangle support: for every edge (ex[i],
    ey[i]) the number of common neighbors, computed with the
    link-Jaccard wedge dataflow — adjacency shuffles ONCE by
    ``mix64(middle node)``, wedge pairs pre-filter against the broadcast
    sorted edge keys BEFORE the exchange (candidate stream <= |E|), one
    ``groupby(lo, hi)`` sums. Returns the support array aligned with the
    input edge arrays. The edge list itself is driver-resident by the
    caller's ``max_broadcast_edges`` guard."""
    if len(ex) == 0:
        return np.zeros(0, np.int64)
    edge_keys = np.sort(
        (ex.astype(np.uint64) << np.uint64(32)) | ey.astype(np.uint64)
    )
    keys_ref = ray.put(edge_keys)
    edges = ray.data.from_arrow(
        pa.table({"x": pa.array(ex, pa.int64()), "y": pa.array(ey, pa.int64())})
    )

    def adj(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        node = np.concatenate((x, y))
        nb = np.concatenate((y, x))
        return pa.table(
            {
                "bkt": pa.array(
                    (_mix64(node) % np.uint64(n_buckets)).astype(np.int64),
                    pa.int64(),
                ),
                "node": pa.array(node, pa.int64()),
                "nb": pa.array(nb, pa.int64()),
            }
        )

    pair_schema = pa.schema(
        [("lo", pa.int64()), ("hi", pa.int64()), ("c", pa.int64())]
    )

    def wedge_counts(group: pa.Table) -> pa.Table:
        empty = pa.table({f.name: pa.array([], f.type) for f in pair_schema})
        if group.num_rows < 2:
            return empty
        keys = ray.get(keys_ref)
        v = group.column("node").to_numpy(zero_copy_only=False)
        nb = group.column("nb").to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, v))
        vs, nbs = v[order], nb[order]
        starts = np.flatnonzero(np.concatenate(([True], vs[1:] != vs[:-1])))
        seg_len = np.diff(np.concatenate((starts, [len(vs)])))
        lo_parts, hi_parts = [], []
        for k in np.unique(seg_len):
            if k < 2:
                continue
            sel = starts[seg_len == k]
            idx = sel[:, None] + np.arange(int(k))[None, :]
            nbm = nbs[idx]
            iu, ju = np.triu_indices(int(k), 1)
            lo_parts.append(nbm[:, iu].ravel())
            hi_parts.append(nbm[:, ju].ravel())
        if not lo_parts:
            return empty
        a = np.concatenate(lo_parts)
        b = np.concatenate(hi_parts)
        lo = np.minimum(a, b).astype(np.uint64)
        hi = np.maximum(a, b).astype(np.uint64)
        comp = (lo << np.uint64(32)) | hi
        pos = np.searchsorted(keys, comp)
        is_edge = (pos < len(keys)) & (
            keys[np.minimum(pos, len(keys) - 1)] == comp
        )
        comp = comp[is_edge]
        if len(comp) == 0:
            return empty
        uniq, cnt = np.unique(comp, return_counts=True)
        return pa.table(
            {
                "lo": pa.array((uniq >> np.uint64(32)).astype(np.int64), pa.int64()),
                "hi": pa.array(
                    (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64), pa.int64()
                ),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    common_rows = (
        edges.map_batches(adj, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(wedge_counts, batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .aggregate(Sum("c"))
        .take_all()  # <= |E| rows, same bound as the edge broadcast
    )
    common = {(r["lo"], r["hi"]): int(r["sum(c)"]) for r in common_rows}
    return np.array(
        [common.get((int(a), int(b)), 0) for a, b in zip(ex, ey)], np.int64
    )


def ktruss_ds(
    lineitem: Dataset,
    k: int = 4,
    rounds: int = 3,
    min_support: int = 2,
    n_buckets: int = 512,
    max_broadcast_edges: int = 20_000_000,
) -> Dataset:
    """Bounded k-truss peel (Cohen 2008) over the co-purchase graph: for
    exactly ``rounds`` iterations, drop every edge whose triangle
    support (common-neighbor count) is below ``k - 2``, then emit the
    survivor edges with their support RECOMPUTED within the final
    survivor set (the kcore budget-exhaustion convention, so the chained
    SQL twin matches layer for layer). The k-truss is the standard
    cohesive-subgraph certificate — stricter than k-core, it keeps only
    edges embedded in dense triangle clusters.

    Scale shape: each round is ONE ``_edge_support`` pass — the
    link-Jaccard wedge dataflow (mix64 middle-node shuffle, pre-exchange
    edge-key filter, one pair groupby). The edge list is driver-bounded
    by ``max_broadcast_edges`` exactly like the triangle/link operators;
    the peel loop multiplies passes, never memory."""
    edges = copurchase_edges_ds(lineitem, min_support, n_buckets)
    out_schema = pa.schema(
        [("x", pa.int64()), ("y", pa.int64()), ("support", pa.int64())]
    )
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )
    if n_edges > max_broadcast_edges:
        raise ValueError(
            f"filtered edge set ({n_edges}) exceeds max_broadcast_edges="
            f"{max_broadcast_edges}"
        )
    edge_tbl = edges.take_all()
    ex = np.asarray([r["x"] for r in edge_tbl], dtype=np.int64)
    ey = np.asarray([r["y"] for r in edge_tbl], dtype=np.int64)
    for _ in range(rounds):
        if len(ex) == 0:
            break
        cm = _edge_support(ex, ey, n_buckets)
        keep = cm >= k - 2
        ex, ey = ex[keep], ey[keep]
    support = _edge_support(ex, ey, n_buckets)
    return ray.data.from_arrow(
        pa.table(
            {
                "x": pa.array(ex, pa.int64()),
                "y": pa.array(ey, pa.int64()),
                "support": pa.array(support, pa.int64()),
            }
        )
    )

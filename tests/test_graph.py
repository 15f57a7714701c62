"""Integer fixed-point PageRank (pipelines/graph.py).

Hand-computed fixed-point values on a 3-node star graph plus
bucket-count invariance (the shuffle layout must never change the
ranks) and the bipartite edge build.
"""

import numpy as np
import pyarrow as pa
import ray

import pdfplumber_ray.pipelines.graph as gr

S = 1_000_000_000_000
BASE = (15 * S) // 100


def _edges(pairs):
    src = pa.array([p[0] for p in pairs], pa.int64())
    dst = pa.array([p[1] for p in pairs], pa.int64())
    return ray.data.from_arrow(pa.table({"src": src, "dst": dst}))


def _ranks(ds):
    return {r["node"]: r["r"] for r in ds.take_all()}


def test_pagerank_two_cycle_fixed_point(ray_session):
    # 0 <-> 1, both degree 1: rank stays exactly S every iteration
    # (broadcast strategy — the default under the node-count guard)
    r = _ranks(gr.pagerank_ds(_edges([(0, 1), (1, 0)]), n_iter=3, n_buckets=4))
    assert r == {0: S, 1: S}


def test_pagerank_strategies_bit_identical(ray_session):
    # the guarded broadcast path and the forced co-group path must agree
    # exactly — same per-edge floor rule, different exchange layout
    edges = [(0, 1), (0, 2), (1, 0), (2, 0), (2, 1), (1, 2)]
    bc = _ranks(gr.pagerank_ds(_edges(edges), n_iter=3, n_buckets=4))
    cg = _ranks(
        gr.pagerank_ds(_edges(edges), n_iter=3, n_buckets=4, max_broadcast_nodes=0)
    )
    assert bc == cg


def test_pagerank_star_hand_computed(ray_session):
    # 0 -> {1, 2}, 1 -> 0, 2 -> 0 (deg0=2, deg1=deg2=1)
    edges = [(0, 1), (0, 2), (1, 0), (2, 0)]
    r1 = _ranks(gr.pagerank_ds(_edges(edges), n_iter=1, n_buckets=4))
    assert r1[1] == BASE + (S * 85) // 200 == 575_000_000_000
    assert r1[0] == BASE + 2 * ((S * 85) // 100) == 1_850_000_000_000
    r2 = _ranks(gr.pagerank_ds(_edges(edges), n_iter=2, n_buckets=4))
    assert r2[1] == BASE + (r1[0] * 85) // 200 == 936_250_000_000
    assert r2[0] == BASE + 2 * ((r1[1] * 85) // 100) == 1_127_500_000_000


def test_pagerank_bucket_count_invariant(ray_session):
    rng = np.random.RandomState(7)
    pairs = {(int(a), int(b)) for a, b in rng.randint(0, 30, size=(120, 2)) if a != b}
    # symmetrize so every node with an in-edge also has an out-edge
    sym = sorted(pairs | {(b, a) for a, b in pairs})
    # force the co-group path so the bucket layout is actually exercised
    r_small = _ranks(
        gr.pagerank_ds(_edges(sym), n_iter=3, n_buckets=2, max_broadcast_nodes=0)
    )
    r_big = _ranks(
        gr.pagerank_ds(_edges(sym), n_iter=3, n_buckets=97, max_broadcast_nodes=0)
    )
    assert r_small == r_big


def test_bipartite_edges_symmetric(ray_session):
    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([10, 10, 20], pa.int64()),
            }
        )
    )
    lineitem = ray.data.from_arrow(
        pa.table(
            {
                # order 1: supplier 5 (twice -> dedup), order 2: 5, order 3: 6
                "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
                "l_suppkey": pa.array([5, 5, 5, 6], pa.int64()),
            }
        )
    )
    got = sorted(
        (r["src"], r["dst"])
        for r in gr.bipartite_edges_ds(lineitem, orders, n_buckets=4).take_all()
    )
    # distinct pairs: (10,5), (20,6) -> nodes c10=20, c20=40, s5=11, s6=13
    assert got == [(11, 20), (13, 40), (20, 11), (40, 13)]


def _lineitem(rows):
    """rows: list of (orderkey, partkey)."""
    return ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )


def test_triangles_support_filter_and_dedup(ray_session):
    # orders 1 and 2 both contain parts {1,2,3} -> edges (1,2),(1,3),(2,3)
    # at support 2 -> one triangle; order 3's (1,4) pair has support 1;
    # duplicated lineitem rows must not inflate support
    li = _lineitem(
        [
            (1, 1), (1, 2), (1, 3),
            (2, 1), (2, 2), (2, 3), (2, 3),  # duplicate row
            (3, 1), (3, 4),
        ]
    )
    tri = gr.copurchase_triangles_ds(li, min_support=2).take_all()
    assert [(r["a"], r["b"], r["c"]) for r in tri] == [(1, 2, 3)]


def test_triangles_min_support_prunes_all(ray_session):
    li = _lineitem([(1, 1), (1, 2), (1, 3)])
    out = gr.copurchase_triangles_ds(li, min_support=2)
    assert out.take_all() == []
    # empty result keeps its typed schema
    sch = out.schema(fetch_if_missing=True)
    assert sch.names == ["a", "b", "c"]


def test_triangles_two_overlapping(ray_session):
    # K4 minus one edge on {1,2,3,4}: drop (1,4) -> triangles (1,2,3),
    # (1,2,4)? no — (1,4) missing kills (1,2,4) and (1,3,4); (2,3,4) stays
    pairs = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    rows = []
    for okey in (10, 20):  # every edge in two orders -> support 2
        for i, (x, y) in enumerate(pairs):
            rows.append((okey * 100 + i, x))
            rows.append((okey * 100 + i, y))
    li = _lineitem(rows)
    tri = sorted(
        (r["a"], r["b"], r["c"])
        for r in gr.copurchase_triangles_ds(li, min_support=2).take_all()
    )
    assert tri == [(1, 2, 3), (2, 3, 4)]


def test_clustering_coeff_hand_computed(ray_session):
    # triangle {1,2,3} plus pendant edge (1,4); pair (2,4) appears in
    # only one order -> filtered by min_support=2
    rows = []
    for okey in (10, 20):  # parts {1,2,3} together twice
        rows += [(okey, 1), (okey, 2), (okey, 3)]
    for okey in (30, 40):  # parts {1,4} together twice
        rows += [(okey, 1), (okey, 4)]
    rows += [(50, 2), (50, 4)]  # support-1 noise pair
    out = {
        r["node"]: (r["n_tri"], r["degree"], r["coeff_e6"])
        for r in gr.clustering_coeff_ds(_lineitem(rows), min_support=2).take_all()
    }
    assert out == {
        1: (1, 3, 333_333),
        2: (1, 2, 1_000_000),
        3: (1, 2, 1_000_000),
        4: (0, 1, 0),
    }


def test_connected_components_two_clusters(ray_session):
    # cluster {1,2,3} (chain 1-2, 2-3) and cluster {7,8}; support-1
    # noise pair (3,7) must NOT bridge them
    rows = []
    for okey in (10, 20):
        rows += [(okey, 1), (okey, 2)]
    for okey in (30, 40):
        rows += [(okey, 2), (okey, 3)]
    for okey in (50, 60):
        rows += [(okey, 7), (okey, 8)]
    rows += [(70, 3), (70, 7)]  # support 1 -> filtered
    out = {
        r["node"]: (r["component"], r["n_nodes"])
        for r in gr.connected_components_ds(
            gr_lineitem(rows), min_support=2
        ).take_all()
    }
    assert out == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        7: (7, 2), 8: (7, 2),
    }


def test_connected_components_empty_graph(ray_session):
    # every pair support 1 -> no edges -> typed empty result
    out = gr.connected_components_ds(
        gr_lineitem([(1, 1), (1, 2), (2, 3), (2, 4)]), min_support=2
    )
    assert out.take_all() == []
    sch = out.schema(fetch_if_missing=True)
    assert sch.names == ["node", "component", "n_nodes"]


def test_connected_components_join_path_matches_broadcast(ray_session):
    # forcing the hash-join size-attach path must match the broadcast path
    rows = []
    for okey in (10, 20):
        rows += [(okey, 1), (okey, 2), (okey, 3)]
    for okey in (30, 40):
        rows += [(okey, 9), (okey, 11)]
    li = gr_lineitem(rows)
    bc = sorted(
        (r["node"], r["component"], r["n_nodes"])
        for r in gr.connected_components_ds(li, min_support=2).take_all()
    )
    jn = sorted(
        (r["node"], r["component"], r["n_nodes"])
        for r in gr.connected_components_ds(
            li, min_support=2, max_broadcast_components=0
        ).take_all()
    )
    assert bc == jn and len(bc) == 5


# alias used by the components tests above (keeps the original helper name)
gr_lineitem = _lineitem


def test_degree_distribution_hand_computed(ray_session):
    # support-2 edges: 1-2, 2-3 -> degrees: node1=1, node2=2, node3=1
    rows = []
    for okey in (10, 20):
        rows += [(okey, 1), (okey, 2)]
    for okey in (30, 40):
        rows += [(okey, 2), (okey, 3)]
    out = {
        r["degree"]: r["n_nodes"]
        for r in gr.degree_distribution_ds(gr_lineitem(rows), min_support=2).take_all()
    }
    assert out == {1: 2, 2: 1}


def test_degree_distribution_empty(ray_session):
    out = gr.degree_distribution_ds(
        gr_lineitem([(1, 1), (1, 2)]), min_support=2
    )
    assert out.take_all() == []
    assert out.schema(fetch_if_missing=True).names == ["degree", "n_nodes"]


def test_bfs_layers_path_graph(ray_session):
    from pdfplumber_ray.pipelines import graph as gr

    # chain 1-2-3-4-5 via co-purchases (support 2 each), plus isolated 9-10
    rows = []
    oid = 0
    for a, b in [(1, 2), (2, 3), (3, 4), (4, 5), (9, 10)]:
        for _ in range(2):  # support >= 2
            oid += 1
            rows.append((oid, a))
            rows.append((oid, b))
    li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )
    got = {r["node"]: r["dist"] for r in gr.bfs_layers_ds(li, max_rounds=4).take_all()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}
    # round budget truncates the frontier
    got2 = {r["node"]: r["dist"] for r in gr.bfs_layers_ds(li, max_rounds=2).take_all()}
    assert got2 == {1: 0, 2: 1, 3: 2}
    # explicit source + unreached isolation
    got3 = {r["node"]: r["dist"] for r in gr.bfs_layers_ds(li, source=9).take_all()}
    assert got3 == {9: 0, 10: 1}


def _li_from_pairs(pairs):
    rows = []
    oid = 0
    for a, b in pairs:
        for _ in range(2):  # support >= 2
            oid += 1
            rows.append((oid, a))
            rows.append((oid, b))
    return ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )


def test_kcore_peels_tail_chain(ray_session):
    from pdfplumber_ray.pipelines import graph as gr

    # triangle 1-2-3 plus a pendant chain 3-4-5: 2-core = the triangle.
    # Peeling needs TWO rounds (5 dies, then 4) — exercises iteration.
    li = _li_from_pairs([(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    got = {r["node"]: r["core_deg"] for r in gr.kcore_ds(li, k=2).take_all()}
    assert got == {1: 2, 2: 2, 3: 2}
    # k=3 empties the graph entirely
    assert gr.kcore_ds(li, k=3).take_all() == []


def test_kcore_round_budget_truncates(ray_session):
    from pdfplumber_ray.pipelines import graph as gr

    # chain 1..6 on a triangle: full peel needs 4 rounds; budget 1 only
    # removes the farthest tail node and reports degrees within the
    # REMAINING set (the SQL twin's final-layer degree rule).
    li = _li_from_pairs([(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)])
    full = {r["node"]: r["core_deg"] for r in gr.kcore_ds(li, k=2, max_rounds=6).take_all()}
    assert full == {1: 2, 2: 2, 3: 2}
    one = {r["node"]: r["core_deg"] for r in gr.kcore_ds(li, k=2, max_rounds=1).take_all()}
    # after one round only node 6 (deg 1) is gone; degrees recomputed
    # within the survivor set so node 5 now shows deg 1
    assert one == {1: 2, 2: 2, 3: 3, 4: 2, 5: 1}


def test_two_hop_path_graph(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import graph as gr

    # path graph 1-2-3-4 via planted orders (each adjacent pair shares
    # 2 orders to clear min_support)
    orders = []
    ok = 0
    for a, b in ((1, 2), (2, 3), (3, 4)):
        for _ in range(2):
            orders.extend([(ok, a), (ok, b)])
            ok += 1
    li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([o for o, _ in orders], pa.int64()),
                "l_partkey": pa.array([p for _, p in orders], pa.int64()),
            }
        )
    )
    out = {r["node"]: r["n_two_hop"] for r in gr.two_hop_ds(li).take_all()}
    # path 1-2-3-4: two-hop sets {1:{3}, 2:{4}, 3:{1}, 4:{2}}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1}


def test_link_jaccard_hand_graph(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import graph as gr

    # co-purchase: orders {1:[1,2,3], 2:[1,2,3], 3:[1,4], 4:[1,4]}
    # edges (support>=2): (1,2),(1,3),(2,3),(1,4)
    ok, pk = [], []
    for o, parts in [(1, [1, 2, 3]), (2, [1, 2, 3]), (3, [1, 4]), (4, [1, 4])]:
        for p in parts:
            ok.append(o)
            pk.append(p)
    li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_partkey": pa.array(pk, pa.int64()),
            }
        )
    )
    rows = {(r["x"], r["y"]): r for r in gr.link_jaccard_ds(li).take_all()}
    # N(1)={2,3,4}, N(2)={1,3}, N(3)={1,2}, N(4)={1}
    assert set(rows) == {(1, 2), (1, 3), (2, 3), (1, 4)}
    r12 = rows[(1, 2)]
    assert r12["common"] == 1 and r12["deg_x"] == 3 and r12["deg_y"] == 2
    r23 = rows[(2, 3)]
    assert r23["common"] == 1  # node 1 is the only common neighbor
    r14 = rows[(1, 4)]
    assert r14["common"] == 0 and r14["deg_y"] == 1


def test_ktruss_peels_pendant_triangle_chain(ray_session):
    import pyarrow as pa
    import ray.data
    from pdfplumber_ray.pipelines import graph as gr

    # graph: triangle {1,2,3} + pendant edge 3-4 (all edges support>=2
    # via 2 shared orders each)
    rows = []
    ok = 0
    for pair in ([1, 2], [2, 3], [1, 3], [3, 4]):
        for rep in range(2):
            ok += 1
            rows.extend((ok, p) for p in pair)
    li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([o for o, _ in rows], pa.int64()),
                "l_partkey": pa.array([p for _, p in rows], pa.int64()),
            }
        )
    )
    out = {(r["x"], r["y"]): r["support"] for r in
           gr.ktruss_ds(li, k=3, rounds=3).take_all()}
    # 3-truss keeps the triangle (each edge in 1 triangle), drops 3-4
    assert set(out) == {(1, 2), (2, 3), (1, 3)}
    assert all(v == 1 for v in out.values())

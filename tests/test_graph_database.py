"""Graph + database operator families on hand-built inputs."""

import pytest

from kiara_spark.operators.graph import (
    connected_components,
    degrees,
    neighbors_within_2_hops,
    triangle_count_total,
    undirected_edges,
)


@pytest.fixture(scope="module")
def toy_graph(spark):
    # two components: {1,2,3,4} (with triangle 1-2-3) and {10,11}
    return spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (10, 11), (2, 1)],  # dup direction
        "src long, dst long",
    )


def test_undirected_dedup_and_no_self_loops(spark):
    e = spark.createDataFrame([(1, 2), (2, 1), (3, 3)], "src long, dst long")
    rows = {tuple(r) for r in undirected_edges(e).collect()}
    assert rows == {(1, 2), (2, 1)}


def test_degrees(toy_graph):
    d = {r["id"]: r["degree"] for r in degrees(toy_graph).collect()}
    assert d == {1: 2, 2: 2, 3: 3, 4: 1, 10: 1, 11: 1}


def test_directed_degrees(spark):
    e = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "src long, dst long")
    rows = {r["id"]: (r["in_degree"], r["out_degree"])
            for r in degrees(e, directed=True).collect()}
    assert rows == {1: (0, 2), 2: (1, 1), 3: (2, 0)}


def test_2hop(toy_graph):
    n = {r["id"]: r["n_neighbors_2hop"]
         for r in neighbors_within_2_hops(toy_graph).collect()}
    # node 4: 1 hop -> {3}; 2 hops -> {1,2} => 3 total
    assert n[4] == 3 and n[10] == 1 and n[1] == 3


def test_triangles(toy_graph):
    assert triangle_count_total(toy_graph).collect()[0]["n_triangles"] == 1


def test_connected_components_two_clusters(toy_graph):
    comp = {r["id"]: r["component"]
            for r in connected_components(toy_graph).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_long_chain_converges(spark):
    # a path graph stresses iteration count (diameter = n-1)
    n = 12
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long")
    comp = {r["id"]: r["component"]
            for r in connected_components(chain, max_iterations=30).collect()}
    assert set(comp.values()) == {0} and len(comp) == n + 1


def test_graph_module_roundtrip(ctx, spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    g = ctx.run_job("create.network_graph.from.tables", {"edges": edges},
                    operation_config={"source_column": "a", "target_column": "b"})
    out = ctx.run_job("network_graph.degrees", {"graph": g["graph"]})
    assert {r["id"]: r["degree"] for r in out["table"].data.collect()} == \
           {1: 1, 2: 2, 3: 1}


def test_database_ops(ctx):
    db = ctx.run_job("create.database.from.folder",
                     {"path": "/root/testdata/sf0.001"})
    assert "lineitem" in db["database"].data
    out = ctx.run_job("database.query.sql", {
        "database": db["database"],
        "query": """select r_name, count(*) n from nation
                    join region on n_regionkey = r_regionkey group by 1""",
    })
    assert out["table"].data.count() == 5
    picked = ctx.run_job("database.pick.table",
                         {"database": db["database"], "table_name": "region"})
    assert picked["table"].data.count() == 5
    with pytest.raises(KeyError, match="no table"):
        ctx.run_job("database.pick.table",
                    {"database": db["database"], "table_name": "nope"})


def test_map_pandas_module(ctx, spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    out = ctx.run_job("table.map.pandas", {"table": df}, operation_config={
        "expr": "pdf.assign(x2=pdf.x * 2)",
        "schema": "x double, x2 double",
    })
    assert sorted(r["x2"] for r in out["table"].data.collect()) == [2.0, 4.0]


def test_connected_components_driver_and_distributed_paths_agree(spark):
    """The gated driver union-find must produce the identical min-id
    labeling the distributed hash-min loop does (threshold=0 forces the
    distributed path); string node ids keep their type on the fast path."""
    from kiara_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 20, 2)] + [(1, 3), (30, 31)],
        "src bigint, dst bigint")
    fast = sorted(map(tuple, connected_components(edges).collect()))
    dist = sorted(map(tuple, connected_components(
        edges, driver_threshold=0).collect()))
    assert fast == dist
    sedges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string")
    got = {r.id: r.component for r in connected_components(sedges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_long_chain(spark):
    """A 61-node path graph (diameter 60): hash-min needs ~diameter hops for
    the min label to reach the far end — verifies the double-step rounds and
    the iteration backstop cover long-thin components, not just the chunky
    co-purchase graph."""
    from kiara_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(60)] + [(100, 101), (101, 102)],
        "src bigint, dst bigint")
    comp = connected_components(edges)
    rows = comp.collect()
    assert len(rows) == 64
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(r["id"])
    assert set(by_comp) == {0, 100}
    assert by_comp[0] == set(range(61))
    assert by_comp[100] == {100, 101, 102}


def test_pagerank_ring_uniform_and_star_ordering(spark):
    from kiara_spark.operators.graph import pagerank

    # 3-ring: perfectly symmetric, ranks stay 1/3 at every iteration
    ring = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    ranks = {r["id"]: r["rank"] for r in pagerank(ring, iterations=3).collect()}
    assert all(abs(v - 1 / 3) < 1e-12 for v in ranks.values())

    # star 1->{2,3}: leaves split node 1's mass and tie; the source keeps
    # only the teleport share
    star = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
    r = {row["id"]: row["rank"] for row in pagerank(star, iterations=3).collect()}
    assert r[2] == r[3] > r[1]
    # dangling leaves drop their mass, so totals shrink below 1 — but every
    # rank keeps at least the teleport floor
    assert all(v >= 0.15 / 3 - 1e-12 for v in r.values())


def test_reliable_checkpoint_when_dir_configured(spark, toy_graph, tmp_path, monkeypatch):
    """With KIARA_SPARK_CHECKPOINT_DIR set, iterative ops checkpoint into
    fault-tolerant storage (survives executor loss on a cluster) instead of
    executor-local blocks; results are unchanged."""
    import os

    ckpt = str(tmp_path / "ckpt")
    monkeypatch.setenv("KIARA_SPARK_CHECKPOINT_DIR", ckpt)
    # forget any previously registered dir on this long-lived test session
    sc = spark.sparkContext
    if hasattr(sc, "_kiara_ckpt_dir"):
        del sc._kiara_ckpt_dir
    got = {r["id"]: r["component"] for r in connected_components(toy_graph).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    # reliable checkpoint actually wrote rdd blocks under the configured dir
    written = [os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs]
    assert written, "no reliable checkpoint files written"


def test_two_hop_approx_tracks_exact(spark):
    """HLL++ 2-hop sizes stay within the configured relative error of the
    exact distinct counts (rsd 0.05 -> allow generous 3-sigma slack)."""
    import random

    from kiara_spark.operators.graph import neighbors_within_2_hops_approx

    random.seed(3)
    edges = spark.createDataFrame(
        [(random.randrange(60), random.randrange(60)) for _ in range(400)],
        "src long, dst long")
    exact = {r["id"]: r["n_neighbors_2hop"]
             for r in neighbors_within_2_hops(edges).collect()}
    approx = {r["id"]: r["n_neighbors_2hop_approx"]
              for r in neighbors_within_2_hops_approx(edges, rsd=0.05).collect()}
    assert set(exact) == set(approx)
    for node, n in exact.items():
        assert abs(approx[node] - n) <= max(2, 0.15 * n), (node, n, approx[node])


def test_two_hop_approx_op_registered(ctx):
    assert "network_graph.two_hop_approx" in ctx.operation_registry.operation_ids


def test_triangles_per_node_and_clustering(spark, toy_graph):
    from kiara_spark.operators.graph import (local_clustering_coefficient,
                                             triangles_per_node)

    tri = {r["id"]: r["n_triangles"] for r in triangles_per_node(toy_graph).collect()}
    # triangle 1-2-3; nodes 4, 10, 11 have none
    assert tri == {1: 1, 2: 1, 3: 1, 4: 0, 10: 0, 11: 0}
    cc = {r["id"]: r["clustering"] for r in
          local_clustering_coefficient(toy_graph).collect()}
    # node 1: degree 2, 1 triangle -> 2*1/(2*1) = 1.0
    # node 3: degree 3 (nbrs 1,2,4), 1 triangle -> 2/(3*2) = 0.333333
    assert cc[1] == 1.0
    assert cc[3] == pytest.approx(1 / 3, abs=1e-6)
    assert cc[10] == 0.0  # degree 1 -> defined as 0


def test_bfs_hops_frontier(spark):
    from pyspark.sql import functions as F

    from kiara_spark.operators import graph as G

    # path graph 1-2-3-4-5 plus isolated pair 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "id long")
    got = {r["id"]: r["hops"] for r in G.bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 beyond cap; 10/11 unreachable
    # multi-source takes the nearest seed
    seeds2 = spark.createDataFrame([(1,), (5,)], "id long")
    got2 = {r["id"]: r["hops"] for r in G.bfs_hops(edges, seeds2, max_hops=2).collect()}
    assert got2 == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_label_propagation_two_cliques(spark):
    from kiara_spark.operators.graph import label_propagation

    # two triangles {1,2,3} and {10,11,12} joined by a weak bridge 3-10
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
        "src long, dst long")
    out = {r.id: r.community
           for r in label_propagation(edges, iterations=3).collect()}
    # each triangle converges on its own min label
    assert out[1] == out[2] == out[3] == 1
    assert out[10] == out[11] == out[12]
    assert out[10] != out[1]


def test_label_propagation_partition_invariant(spark):
    from kiara_spark.operators.graph import label_propagation

    from pyspark.sql import functions as F

    edges = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet").select(
        (F.col("o_orderkey") % 97).alias("src"),
        (F.col("o_custkey") % 89 + 100).alias("dst")).distinct()
    a = {r.id: r.community
         for r in label_propagation(edges, iterations=2).collect()}
    b = {r.id: r.community
         for r in label_propagation(
             edges.repartition(7), iterations=2).collect()}
    assert a == b


def test_shortest_paths_weighted_path_graph(spark):
    from kiara_spark.operators.graph import shortest_paths_weighted

    # path 1 -2.0- 2 -3.0- 3 -1.5- 4, plus a 10.0 shortcut 1-4
    rows = [(1, 2, 2.0), (2, 3, 3.0), (3, 4, 1.5), (1, 4, 10.0)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    seeds = spark.createDataFrame([(1,)], "id long")
    out = {r.id: r.dist
           for r in shortest_paths_weighted(edges, seeds, rounds=4).collect()}
    # cheapest path beats the direct heavier edge
    assert out == {1: 0.0, 2: 2.0, 3: 5.0, 4: 6.5}


def test_shortest_paths_weighted_round_cap(spark):
    from kiara_spark.operators.graph import shortest_paths_weighted

    rows = [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    seeds = spark.createDataFrame([(1,)], "id long")
    out = {r.id: r.dist
           for r in shortest_paths_weighted(edges, seeds, rounds=2).collect()}
    # node 4 is 3 hops away: unreachable within 2 relaxation rounds
    assert out == {1: 0.0, 2: 1.0, 3: 2.0}


def test_shortest_paths_weighted_multi_source_min(spark):
    from kiara_spark.operators.graph import shortest_paths_weighted

    rows = [(1, 2, 5.0), (9, 2, 1.0)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    seeds = spark.createDataFrame([(1,), (9,)], "id long")
    out = {r.id: r.dist
           for r in shortest_paths_weighted(edges, seeds, rounds=3).collect()}
    assert out[2] == 1.0  # nearest source wins


def test_sssp_driver_and_distributed_paths_agree(spark):
    from kiara_spark.operators.graph import shortest_paths_weighted

    edges = spark.createDataFrame(
        [(1, 2, 1.5), (2, 3, 2.25), (1, 3, 9.0), (3, 4, 0.5), (10, 11, 1.0)],
        "src long, dst long, weight double")
    sources = spark.createDataFrame([(1,)], "id long")
    fast = sorted(map(tuple, shortest_paths_weighted(
        edges, sources).collect()))
    dist = sorted(map(tuple, shortest_paths_weighted(
        edges, sources, driver_threshold=0).collect()))
    assert fast == dist
    got = dict(fast)
    assert got[3] == 3.75 and got[4] == 4.25  # via 1-2-3, not the 9.0 edge
    assert 10 not in got  # unreachable component absent, both paths


def test_sssp_op_registered(ctx):
    assert ctx.operation_registry.resolve(
        "network_graph.shortest_paths_weighted") is not None


def test_kcore_peels_tail_and_keeps_clique(spark):
    from kiara_spark.operators.graph import kcore_peel

    # 4-clique {1,2,3,4} with a pendant chain 4-5-6
    rows = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    out = {r.id: r.degree for r in kcore_peel(edges, k=3, rounds=3).collect()}
    # chain nodes peel (degree < 3); the clique survives at degree 3
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_round_cap_partial_peel(spark):
    from kiara_spark.operators.graph import kcore_peel

    # a 4-chain peels completely under k=2 with enough rounds, but one
    # round only removes the endpoints
    rows = [(1, 2), (2, 3), (3, 4)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    one = {r.id for r in kcore_peel(edges, k=2, rounds=1).collect()}
    assert one == {2, 3}
    full = kcore_peel(edges, k=2, rounds=3).collect()
    assert full == []


def test_kcore_op_registered(ctx):
    assert ctx.operation_registry.resolve("network_graph.kcore") is not None


def test_personalized_pagerank_seed_proximity(spark):
    from kiara_spark.operators.graph import pagerank_personalized

    # star around seed 1 plus a detached pair 10-11: mass must stay near
    # the seed component, detached nodes get zero
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1), (3, 1), (10, 11)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "id long")
    r = {x.id: x.rank for x in pagerank_personalized(
        edges, seeds, iterations=4).collect()}
    assert r[1] > r[2] == r[3] > 0
    assert r[10] == 0.0 and r[11] == 0.0


def test_personalized_pagerank_isolated_seed_and_empty_seeds(spark):
    """r2 ADVICE: a seed absent from the edge list must keep its teleport
    mass (isolated node with rank (1-d)·1/|S|), and an empty seed set must
    raise instead of NULLing every rank."""
    import pytest as _pytest

    from kiara_spark.operators.graph import pagerank_personalized

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(1,), (99,)], "id long")  # 99 isolated
    r = {x.id: x.rank for x in pagerank_personalized(
        edges, seeds, iterations=3, damping=0.85).collect()}
    assert r[99] == (1 - 0.85) * 0.5  # keeps its share of teleport mass
    assert r[1] > 0 and r[2] > 0
    empty = spark.createDataFrame([], "id long")
    with _pytest.raises(ValueError, match="empty seed set"):
        pagerank_personalized(edges, empty)


def test_ppr_op_registered(ctx):
    assert ctx.operation_registry.resolve(
        "network_graph.pagerank_personalized") is not None


def test_sssp_null_weight_edges_skipped_both_paths(spark):
    """r3 ADVICE: an all-NULL-weight (src,dst) group must be skipped by the
    driver fast path exactly like the distributed path (F.min drops the
    NULL candidate) — not crash with TypeError."""
    from kiara_spark.operators.graph import shortest_paths_weighted

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, None), (1, 4, 2.5)],
        "src long, dst long, weight double")
    sources = spark.createDataFrame([(1,)], "id long")
    fast = sorted(map(tuple, shortest_paths_weighted(
        edges, sources).collect()))
    dist = sorted(map(tuple, shortest_paths_weighted(
        edges, sources, driver_threshold=0).collect()))
    assert fast == dist
    got = dict(fast)
    assert got[2] == 1.0 and got[4] == 2.5 and 3 not in got


def test_cc_two_phase_matches_hash_min_labeling(spark):
    """r3 VERDICT item 9: large-star/small-star must produce the identical
    min-id labeling as hash-min and the driver union-find on a graph with
    several components, string ids, and isolated-ish structure."""
    from kiara_spark.operators.graph import connected_components

    rows = [(1, 2), (2, 3), (3, 4), (10, 11), (12, 11), (20, 21), (21, 20),
            (30, 30)]  # chain, triangle-ish, 2-cycle, self-loop
    edges = spark.createDataFrame(rows, "src long, dst long")
    want = sorted(map(tuple, connected_components(
        edges).collect()))  # driver union-find ground truth
    hm = sorted(map(tuple, connected_components(
        edges, driver_threshold=0, algorithm="hash_min").collect()))
    tp = sorted(map(tuple, connected_components(
        edges, driver_threshold=0, algorithm="two_phase").collect()))
    assert want == hm == tp


def test_cc_two_phase_beats_hash_min_rounds_on_path_graph(spark):
    """Round-count assertion: on a 48-node path (diameter 47), hash-min
    needs ~diameter/4 double-round convergence checks while two-phase
    collapses in O(log^2 n) star rounds — strictly fewer."""
    from kiara_spark.operators.graph import connected_components

    n = 48
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long")
    s_hm, s_tp = {}, {}
    hm = sorted(map(tuple, connected_components(
        edges, driver_threshold=0, algorithm="hash_min",
        max_iterations=100, stats=s_hm).collect()))
    tp = sorted(map(tuple, connected_components(
        edges, driver_threshold=0, algorithm="two_phase",
        max_iterations=100, stats=s_tp).collect()))
    assert hm == tp == [(i, 0) for i in range(n)]
    assert s_tp["rounds"] < s_hm["rounds"], (s_tp, s_hm)
    assert s_tp["rounds"] <= 8, s_tp  # log-ish, not diameter-ish


def test_cc_algorithm_config_and_validation(ctx, spark):
    import pytest as _pytest

    from kiara_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pytest.raises(ValueError, match="unknown CC algorithm"):
        connected_components(edges, algorithm="nope")
    g = ctx.data_registry.register_data(
        {"edges": edges}, data_type="network_graph")
    out = ctx.run_job("network_graph.connected_components", {"graph": g},
                      operation_config={"algorithm": "two_phase",
                                        "driver_threshold": 0})
    assert sorted(map(tuple, out["table"].data.collect())) == [(1, 1), (2, 1)]


def test_scc_driver_and_distributed_agree(spark):
    """SCC: directed cycles are components, DAG edges separate them; the
    driver Tarjan fast path and the distributed coloring produce the
    identical min-id labeling."""
    from kiara_spark.operators.graph import strongly_connected_components

    # cycle {1,2,3}, cycle {10,11}, chain 3->10 (DAG edge), lone pair 20->21
    rows = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10), (3, 10), (20, 21)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    fast = sorted(map(tuple, strongly_connected_components(edges).collect()))
    dist = sorted(map(tuple, strongly_connected_components(
        edges, driver_threshold=0).collect()))
    assert fast == dist
    got = dict(fast)
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert got[20] == 20 and got[21] == 21  # singletons: own component
    # directed semantics: undirected CC would merge everything reachable
    from kiara_spark.operators.graph import connected_components
    cc = dict(map(tuple, connected_components(edges).collect()))
    assert cc[10] == 1  # undirected merges across the DAG edge; SCC doesn't


def test_scc_long_condensation_chain_and_peel_limit(spark):
    from kiara_spark.operators.graph import strongly_connected_components
    import pytest as _pytest

    # chain of 2-cycles: (0,1) -> (2,3) -> (4,5): 3 SCCs in a line
    rows = []
    for i in range(0, 6, 2):
        rows += [(i, i + 1), (i + 1, i)]
        if i + 2 < 6:
            rows.append((i + 1, i + 2))
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = dict(map(tuple, strongly_connected_components(
        edges, driver_threshold=0).collect()))
    assert got == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 4}
    # a too-small peel budget must RAISE, never mislabel
    with _pytest.raises(RuntimeError, match="peel"):
        strongly_connected_components(edges, driver_threshold=0,
                                      max_peel_rounds=1)


def test_scc_op_registered(ctx):
    assert ctx.operation_registry.resolve(
        "network_graph.strongly_connected_components") is not None


def test_hits_bipartite_split_and_normalization(spark):
    from kiara_spark.operators.graph import hits

    # bipartite: 1,2 -> 10,11,12 (1 points at all three, 2 only at 10):
    # sources get hub mass only, sinks authority mass only
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10)], "src long, dst long")
    got = {r.id: (r.hub, r.authority) for r in hits(edges, 2).collect()}
    assert set(got) == {1, 2, 10, 11, 12}
    for n in (1, 2):
        assert got[n][1] == 0.0  # no in-edges -> zero authority
    for n in (10, 11, 12):
        assert got[n][0] == 0.0  # no out-edges -> zero hub
    assert abs(sum(h for h, _ in got.values()) - 1.0) < 1e-12
    assert abs(sum(a for _, a in got.values()) - 1.0) < 1e-12
    # node 1 links more authorities than node 2; 10 has more in-links
    assert got[1][0] > got[2][0]
    assert got[10][1] > got[11][1]
    assert got[11][1] == got[12][1]


def test_node_similarity_jaccard_counts_and_cap(spark):
    from kiara_spark.operators.graph import node_similarity_jaccard

    # N(1)={2,3,4}, N(5)={2,3,4,6}: J(1,5) = 3/4; 6's only neighbor is 5
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (5, 2), (5, 3), (5, 4), (5, 6)],
        "src long, dst long")
    rows = {(r.id_a, r.id_b): (r.n_common, r.jaccard)
            for r in node_similarity_jaccard(edges).collect()}
    assert rows[(1, 5)] == (3, 0.75)
    # 2,3,4 pairwise share neighbors {1,5}
    assert rows[(2, 3)] == (2, 1.0)
    # max_degree=3 prunes node 5 (degree 4) from candidate generation
    capped = {(r.id_a, r.id_b)
              for r in node_similarity_jaccard(edges, max_degree=3).collect()}
    assert (1, 5) not in capped and (2, 3) in capped


def test_hits_and_node_similarity_ops_registered(ctx):
    assert ctx.operation_registry.resolve("network_graph.hits") is not None
    assert ctx.operation_registry.resolve(
        "network_graph.node_similarity") is not None


def test_random_walks_shape_and_validity(spark):
    from kiara_spark.operators.graph import random_walks, undirected_edges

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)], "src long, dst long")
    out = random_walks(edges, walk_length=4, walks_per_node=2).collect()
    # 4 nodes x 2 walks x 4 steps
    assert len(out) == 4 * 2 * 4
    nbrs = {}
    for r in undirected_edges(edges).collect():
        nbrs.setdefault(r.src, set()).add(r.dst)
    walks = {}
    for r in out:
        walks.setdefault((r.start, r.walk), {})[r.step] = r.node
    for (start, _), steps in walks.items():
        assert steps[0] == start
        for t in range(1, 4):
            assert steps[t] in nbrs[steps[t - 1]]  # every hop is an edge
    # deterministic: second invocation is identical
    again = random_walks(edges, walk_length=4, walks_per_node=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_condensation_layers_dag_and_cycles(spark):
    from kiara_spark.operators.graph import condensation_layers

    # 2-cycle (0,1) -> 2 -> 3; plus isolated root 9 -> 0
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 3), (9, 0)], "src long, dst long")
    got = {r.id: (r.component, r.layer)
           for r in condensation_layers(edges).collect()}
    assert got[0][0] == got[1][0] == 0  # SCC {0,1}
    # layers: 9 is the root (0), SCC{0,1} at 1, then 2, then 3
    assert got[9][1] == 0
    assert got[0][1] == got[1][1] == 1
    assert got[2][1] == 2 and got[3][1] == 3
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="rounds"):
        condensation_layers(edges, max_rounds=1)


def test_condensation_op_registered(ctx):
    assert ctx.operation_registry.resolve(
        "network_graph.condensation_layers") is not None


def test_walk_skipgram_pairs_symmetry_and_totals(spark):
    from kiara_spark.operators.graph import random_walks, walk_skipgram_pairs

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], "src long, dst long")
    L, W, win = 4, 2, 2
    pairs = walk_skipgram_pairs(edges, walk_length=L, walks_per_node=W,
                                window=win).collect()
    # (center, context) and (context, center) counts are mirror images
    m = {(r.center, r.context): r.n_pairs for r in pairs}
    assert all(m[(a, b)] == m[(b, a)] for (a, b) in m)
    # total credits = per-walk windowed pair count summed over all walks:
    # each walk of length L contributes 2*sum_{d=1..win} (L-d) ordered pairs
    n_walks = random_walks(edges, walk_length=L, walks_per_node=W) \
        .select("start", "walk").distinct().count()
    per_walk = 2 * sum(L - d for d in range(1, win + 1))
    assert sum(m.values()) == n_walks * per_walk


def test_walk_skipgram_registered(ctx):
    assert ctx.operation_registry.resolve(
        "network_graph.walk_skipgram_pairs") is not None


def test_bipartite_butterflies_square_and_guard(spark, ctx):
    from kiara_spark.operators.graph import bipartite_butterflies

    # one perfect butterfly: u1,u2 both linked to i1,i2; u3 is a spectator
    edges = spark.createDataFrame(
        [(1, 101), (1, 102), (2, 101), (2, 102), (3, 101)],
        "src long, dst long")
    out = {r.id: r.n_butterflies
           for r in bipartite_butterflies(edges).collect()}
    assert out == {1: 1, 2: 1}
    # K(3,2): every pair of the 3 left nodes forms C(2,2)=1 butterfly per
    # right-pair -> each node in 2 pairs x 1 = 2 butterflies
    k32 = spark.createDataFrame(
        [(u, i) for u in (1, 2, 3) for i in (101, 102)], "src long, dst long")
    out2 = {r.id: r.n_butterflies
            for r in bipartite_butterflies(k32).collect()}
    assert out2 == {1: 2, 2: 2, 3: 2}
    # hub guard: capping right-degree at 2 removes the shared hubs
    out3 = bipartite_butterflies(k32, max_right_degree=2).collect()
    assert out3 == []
    assert ctx.operation_registry.resolve(
        "network_graph.bipartite_butterflies") is not None


def test_degree_assortativity_signs(spark, ctx):
    from kiara_spark.operators.graph import degree_assortativity

    # star graph: hub (deg 4) only touches leaves (deg 1) -> perfectly
    # disassortative (-1)
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long")
    r = degree_assortativity(star).collect()[0]
    assert r.assortativity == -1.0
    assert r.n_edge_ends == 8
    # regular ring: every degree equal -> zero variance -> NULL (undefined)
    ring = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src long, dst long")
    r2 = degree_assortativity(ring).collect()[0]
    assert r2.assortativity is None
    assert ctx.operation_registry.resolve(
        "network_graph.degree_assortativity") is not None


def test_bipartite_project_weights(spark, ctx):
    from kiara_spark.operators.graph import bipartite_project

    edges = spark.createDataFrame(
        [(1, 101), (1, 102), (2, 101), (2, 102), (3, 102), (3, 103)],
        "src long, dst long")
    out = {(r.src, r.dst): r.weight
           for r in bipartite_project(edges).collect()}
    assert out[(1, 2)] == 2       # share 101 and 102
    assert out[(1, 3)] == 1 and out[(2, 3)] == 1
    # min_weight prunes the tail
    out2 = {(r.src, r.dst): r.weight
            for r in bipartite_project(edges, min_weight=2).collect()}
    assert list(out2) == [(1, 2)]
    assert ctx.operation_registry.resolve(
        "network_graph.bipartite_project") is not None


def test_modularity_two_triangles_and_degenerate(ctx, spark):
    """Barbell of two triangles joined by one bridge edge: the triangle
    partition scores the textbook Q = 2*(3/7 - (7/14)^2) = 0.357143; the
    everyone-in-one-community partition scores exactly 0."""
    from kiara_spark.operators.graph import modularity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long")
    comm = spark.createDataFrame(
        [(n, 0 if n <= 3 else 1) for n in range(1, 7)],
        "id long, community long")
    out = {r.community: r for r in modularity(edges, comm).collect()}
    assert set(out) == {0, 1}
    for c in (0, 1):
        assert out[c].n_nodes == 3
        assert out[c].intra_edges == 3
        assert out[c].degree_sum == 7
        assert abs(out[c].contribution - (3 / 7 - 0.25)) < 1e-6
    assert abs(sum(r.contribution for r in out.values()) - 0.357143) < 1e-5
    one = comm.withColumn("community", comm.community * 0)
    flat = modularity(edges, one).collect()
    assert len(flat) == 1 and abs(flat[0].contribution) < 1e-12
    assert ctx.operation_registry.resolve(
        "network_graph.modularity") is not None

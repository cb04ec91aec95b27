"""Connected-components invariants: multi-hop transitivity (the case
pairwise near-dup output cannot express), convergence on chains longer
than one propagation round, and the cluster roll-up."""

from __future__ import annotations

from dirt_hadoop_similarity_spark.operators import components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_chain_collapses_to_one_component(spark):
    # path graph 1-2-3-4-5: diameter 4 forces several iterations
    comp = components.connected_components(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    )
    rows = {r["node"]: r["component"] for r in comp.collect()}
    assert rows == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_clusters_stay_separate(spark):
    comp = components.connected_components(
        _edges(spark, [(10, 11), (11, 12), (20, 21), (30, 31), (31, 30)])
    )
    rows = {r["node"]: r["component"] for r in comp.collect()}
    assert rows == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_edge_direction_irrelevant(spark):
    # label must flow against the stored edge direction too
    comp = components.connected_components(_edges(spark, [(5, 1), (2, 5)]))
    rows = {r["node"]: r["component"] for r in comp.collect()}
    assert rows == {1: 1, 2: 1, 5: 1}


def test_duplicate_clusters_rollup(spark):
    clusters = {
        r["component"]: r
        for r in components.duplicate_clusters(
            _edges(spark, [(1, 2), (2, 3), (7, 8)])
        ).collect()
    }
    assert set(clusters) == {1, 7}
    assert clusters[1]["n_members"] == 3
    assert clusters[1]["keeper_id"] == 1
    assert clusters[1]["member_ids"] == [1, 2, 3]
    assert clusters[7]["n_members"] == 2
    assert clusters[7]["member_ids"] == [7, 8]


def test_empty_edges(spark):
    assert components.connected_components(_edges(spark, [])).count() == 0

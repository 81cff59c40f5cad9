"""Link prediction and label propagation vs brute-force pandas oracles
(reference recipes/graph.py:235-317)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from financial_data_science_spark.functions.graph import (
    label_propagation,
    link_scores,
)

# a small undirected graph: two triangles bridged by one edge + a pendant
EDGES = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6), (6, 7)]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(pd.DataFrame(EDGES, columns=["src", "dst"]))


def test_link_scores_matches_bruteforce(spark, edges_df):
    nbrs: dict[int, set[int]] = {}
    for a, b in EDGES:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    got = link_scores(edges_df).toPandas().set_index(["u", "v"]).sort_index()
    want = {}
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if v in nbrs[u]:
                continue  # existing edges excluded
            common = nbrs[u] & nbrs[v]
            if not common:
                continue  # 2-hop candidates only
            want[(u, v)] = {
                "cn": len(common),
                "jaccard": len(common) / len(nbrs[u] | nbrs[v]),
                "adamic_adar": sum(1 / math.log(len(nbrs[z])) for z in common),
                "resource_alloc": sum(1 / len(nbrs[z]) for z in common),
                "pref_attach": len(nbrs[u]) * len(nbrs[v]),
            }
    assert set(got.index) == set(want)
    for pair, scores in want.items():
        for k, v in scores.items():
            assert got.loc[pair, k] == pytest.approx(v), (pair, k)


def test_link_scores_src_side_projection(spark):
    # bipartite: suppliers {1,2} share customers {10, 11}; 3 shares only 10
    e = spark.createDataFrame(
        pd.DataFrame(
            [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10)], columns=["src", "dst"]
        )
    )
    got = link_scores(e, mode="src_side").toPandas().set_index(["u", "v"])
    # pair (1,2): cn=2, degrees 2/2 -> jaccard 1.0; z-degrees: 10->3, 11->2
    assert got.loc[(1, 2), "cn"] == 2
    assert got.loc[(1, 2), "jaccard"] == pytest.approx(1.0)
    assert got.loc[(1, 2), "resource_alloc"] == pytest.approx(1 / 3 + 1 / 2)
    assert got.loc[(1, 2), "adamic_adar"] == pytest.approx(
        1 / math.log(3) + 1 / math.log(2)
    )
    assert got.loc[(1, 3), "cn"] == 1 and got.loc[(2, 3), "cn"] == 1
    assert got.loc[(1, 3), "jaccard"] == pytest.approx(1 / 2)


def test_label_propagation_two_cliques(spark):
    # two 4-cliques joined by a single bridge: labels converge to the min
    # id of each clique; the bridge node sticks with its clique majority
    edges = []
    for base in (0, 10):
        ids = [base + i for i in range(1, 5)]
        edges += [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    edges.append((4, 11))
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    out = label_propagation(df, iters=5).toPandas().set_index("id")["lab"]
    assert set(out[[1, 2, 3, 4]]) == {1}
    assert set(out[[11, 12, 13, 14]]) == {11}

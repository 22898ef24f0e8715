"""pagerank_fixed (operators/graph.py): bit-exact parity with a pure-python
reference on adversarial graph shapes, plus the centrality semantics the
canonical-representative keep-rule relies on."""

from __future__ import annotations


def py_pagerank(nodes: list[int], pairs: list[tuple[int, int]], iters: int) -> dict:
    edges: list[tuple[int, int]] = []
    for a, b in pairs:
        edges.append((a, b))
        edges.append((b, a))
    deg: dict[int, int] = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    s = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        inc = {n: 0 for n in nodes}
        for u, v in edges:
            inc[v] += (s[u] * 17) // (20 * deg[u])
        s = {n: 150_000 + inc[n] for n in nodes}
    return {n: (deg.get(n, 0), s[n]) for n in nodes}


GRAPHS = {
    "chain": (list(range(6)), [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]),
    "clique_plus_isolated": (
        list(range(7)),
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (4, 5)],
    ),
    "star": (list(range(8)), [(0, i) for i in range(1, 8)]),
    "two_triangles_bridge": (
        list(range(6)),
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)],
    ),
}


class TestPagerankFixed:
    def test_matches_python_bit_exact(self, spark):
        from sea_streamer_spark.operators.graph import pagerank_fixed

        for name, (nodes, pairs) in GRAPHS.items():
            ndf = spark.createDataFrame([(n,) for n in nodes], ["doc_id"])
            pdf = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
            got = {
                r.doc_id: (r.degree, r.score_micro)
                for r in pagerank_fixed(ndf, pdf, iters=4).collect()
            }
            assert got == py_pagerank(nodes, pairs, 4), name

    def test_isolated_nodes_sit_at_floor(self, spark):
        from sea_streamer_spark.operators.graph import pagerank_fixed

        nodes, pairs = GRAPHS["clique_plus_isolated"]
        ndf = spark.createDataFrame([(n,) for n in nodes] + [(99,)], ["doc_id"])
        pdf = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
        rows = {r.doc_id: r for r in pagerank_fixed(ndf, pdf, iters=4).collect()}
        assert rows[99].degree == 0 and rows[99].score_micro == 150_000
        assert rows[6].degree == 0 and rows[6].score_micro == 150_000

    def test_star_center_is_most_central(self, spark):
        from sea_streamer_spark.operators.graph import pagerank_fixed

        nodes, pairs = GRAPHS["star"]
        ndf = spark.createDataFrame([(n,) for n in nodes], ["doc_id"])
        pdf = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
        rows = {r.doc_id: r.score_micro for r in pagerank_fixed(ndf, pdf, iters=4).collect()}
        assert rows[0] > max(v for k, v in rows.items() if k != 0)

    def test_iteration_zero_is_seed(self, spark):
        from sea_streamer_spark.operators.graph import pagerank_fixed

        nodes, pairs = GRAPHS["chain"]
        ndf = spark.createDataFrame([(n,) for n in nodes], ["doc_id"])
        pdf = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
        rows = pagerank_fixed(ndf, pdf, iters=0).collect()
        assert {r.score_micro for r in rows} == {1_000_000}


class TestPagerankRandomized:
    def test_random_graphs_match_python(self, spark):
        """Seeded-random Erdős–Rényi-ish graphs (dense, sparse, with
        self-contained components and isolated nodes) vs the reference —
        sweeps tie-breaks and degree skews fixed shapes can miss."""
        import random

        from sea_streamer_spark.operators.graph import pagerank_fixed

        rng = random.Random(0)
        for trial in range(6):
            n = rng.randint(4, 18)
            nodes = list(range(n))
            pairs = sorted(
                {
                    (a, b)
                    for a in nodes
                    for b in nodes
                    if a < b and rng.random() < rng.choice([0.15, 0.45])
                }
            )
            ndf = spark.createDataFrame([(x,) for x in nodes], ["doc_id"])
            if pairs:
                pdf = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
            else:
                pdf = spark.createDataFrame([], "doc_a long, doc_b long")
            iters = rng.choice([1, 3, 5])
            got = {
                r.doc_id: (r.degree, r.score_micro)
                for r in pagerank_fixed(ndf, pdf, iters=iters).collect()
            }
            assert got == py_pagerank(nodes, pairs, iters), (trial, n, pairs)


class TestPagerankForeignEdges:
    def test_edges_referencing_unknown_nodes(self, spark):
        """Pairs may reference ids absent from the node relation (a
        filtered corpus joined against an unfiltered pair list). Contract
        (same as the corpus-keyed formulation): unknown endpoints are
        excluded from the output and push nothing, but still inflate the
        degree divisor of their known neighbors; a known node whose only
        sources are unknown sits at the floor with its true degree."""
        from sea_streamer_spark.operators.graph import pagerank_fixed

        nodes = [0, 1, 2]
        # 0-1 known edge; 1-99 and 2-98 reach outside the node relation
        pairs = [(0, 1), (1, 99), (98, 2)]
        ndf = spark.createDataFrame([(n,) for n in nodes], ["doc_id"])
        pdf = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
        got = {
            r.doc_id: (r.degree, r.score_micro)
            for r in pagerank_fixed(ndf, pdf, iters=2).collect()
        }
        assert set(got) == {0, 1, 2}

        # python replay with the same exclusion rule
        edges = []
        for a, b in pairs:
            edges += [(a, b), (b, a)]
        deg = {}
        for u, _v in edges:
            deg[u] = deg.get(u, 0) + 1
        s = {n: 1_000_000 for n in nodes}
        for _ in range(2):
            inc = {n: 0 for n in nodes}
            for u, v in edges:
                if u in s and v in inc:  # unknown sources push nothing
                    inc[v] += (s[u] * 17) // (20 * deg[u])
            s = {n: 150_000 + inc[n] for n in nodes}
        want = {n: (deg.get(n, 0), s[n]) for n in nodes}
        assert got == want
        # node 2's only neighbor is unknown: true degree, floor score
        assert got[2] == (1, 150_000)

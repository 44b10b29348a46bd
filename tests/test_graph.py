

class TestHits:
    def test_hub_authority_separation(self, spark):
        from chatdata_spark.operators.graph import SCALE, hits

        # h1 points at 3 authorities, h2 at 2, h3 at 1; a1 has 3 in-links,
        # a2 two, a3 one. Pure-bipartite: hubs get auth 0, authorities hub 0.
        edges = spark.createDataFrame(
            [("h1", "a1"), ("h1", "a2"), ("h1", "a3"),
             ("h2", "a1"), ("h2", "a2"), ("h3", "a1")],
            "src string, dst string",
        )
        out = {r["node"]: r for r in hits(edges, iterations=4).collect()}
        assert out["a1"]["auth_fp"] > out["a2"]["auth_fp"] > out["a3"]["auth_fp"]
        assert out["h1"]["hub_fp"] > out["h2"]["hub_fp"] > out["h3"]["hub_fp"]
        for h in ("h1", "h2", "h3"):
            assert out[h]["auth_fp"] == 0
        for a in ("a1", "a2", "a3"):
            assert out[a]["hub_fp"] == 0
        # max-quantizer normalization: the top score in each role lands in
        # [SCALE, 2*SCALE)
        assert SCALE <= out["a1"]["auth_fp"] < 2 * SCALE
        assert SCALE <= out["h1"]["hub_fp"] < 2 * SCALE
        # double views are exact conversions
        assert out["a1"]["auth"] == out["a1"]["auth_fp"] / SCALE

    def test_partition_invariant(self, spark):
        from chatdata_spark.operators.graph import hits

        edges = spark.createDataFrame(
            [(f"u{i % 7}", f"v{i % 5}") for i in range(40)],
            "src string, dst string",
        ).distinct()
        a = {(r["node"]): (r["auth_fp"], r["hub_fp"])
             for r in hits(edges.repartition(1), iterations=3).collect()}
        b = {(r["node"]): (r["auth_fp"], r["hub_fp"])
             for r in hits(edges.repartition(13), iterations=3).collect()}
        assert a == b

    def test_null_endpoints_dropped(self, spark):
        from chatdata_spark.operators.graph import hits

        edges = spark.createDataFrame(
            [("x", "y"), ("x", None), (None, "y")], "src string, dst string"
        )
        nodes = {r["node"] for r in hits(edges, iterations=2).collect()}
        assert nodes == {"x", "y"}


class TestHyperball:
    def test_center_beats_leaves(self, spark):
        from chatdata_spark.operators.graph import harmonic_hyperball

        # undirected star: center reaches every leaf at distance 1, leaves
        # reach each other only at distance 2 -> center's harmonic wins
        leaves = [f"l{i}" for i in range(8)]
        e = [("c0", l) for l in leaves] + [(l, "c0") for l in leaves]
        edges = spark.createDataFrame(e, "src string, dst string")
        out = {r["node"]: r["harmonic"]
               for r in harmonic_hyperball(edges, radius=3).collect()}
        assert out["c0"] > max(out[l] for l in leaves)

    def test_partition_invariant(self, spark):
        from chatdata_spark.operators.graph import harmonic_hyperball

        e = [(f"u{i % 6}", f"u{(i * 3 + 1) % 6}") for i in range(18)]
        edges = spark.createDataFrame(e, "src string, dst string").distinct()
        a = {r["node"]: (r["harmonic"], r["ball_est"])
             for r in harmonic_hyperball(edges.repartition(1), radius=3).collect()}
        b = {r["node"]: (r["harmonic"], r["ball_est"])
             for r in harmonic_hyperball(edges.repartition(7), radius=3).collect()}
        assert a == b

    def test_ball_estimates_grow_with_radius(self, spark):
        from chatdata_spark.operators.graph import harmonic_hyperball

        # path a->b->c->d: a's ball keeps growing for 3 rounds
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
        )
        r1 = {r["node"]: r["ball_est"]
              for r in harmonic_hyperball(edges, radius=1).collect()}
        r3 = {r["node"]: r["ball_est"]
              for r in harmonic_hyperball(edges, radius=3).collect()}
        assert r3["a"] > r1["a"]
        # d has no out-edges: ball stays {d} at every radius
        assert r3["d"] == r1["d"]


class TestHyperballPackedRegisters:
    def test_packed_estimates_match_hll_estimate_on_exploded_state(self, spark):
        """r11 optimization pin: harmonic_hyperball's column-packed
        register state + projection estimator must be value-identical to
        operators/hll.py::hll_estimate over the equivalent exploded
        (node, bucket, min_tail) rows — the internal equivalence the
        packed rewrite relies on (exact integer harmonic sum, one float64
        division, ln small-range branch)."""
        from pyspark.sql import functions as F

        from chatdata_spark.operators.graph import harmonic_hyperball
        from chatdata_spark.operators.hll import hll_estimate
        from chatdata_spark.operators.sampling import hash_bucket

        # a small dense-ish graph: balls grow to multi-register states
        edges = spark.createDataFrame(
            [(f"n{i}", f"n{(i * 3 + j) % 17}") for i in range(17) for j in (1, 2, 5)],
            "src string, dst string",
        )
        out = {r["node"]: (r["harmonic"], r["ball_est"])
               for r in harmonic_hyperball(edges, radius=2, p=4, salt="hb").collect()}

        # independent exploded replay of the same lattice: per-node
        # reachable sets within radius t, registers from the same hash
        nodes = [f"n{i}" for i in range(17)]
        adj = {}
        for r in edges.collect():
            adj.setdefault(r["src"], set()).add(r["dst"])
        balls = {n: {n} for n in nodes}
        for _ in range(2):
            balls = {
                n: b | {y for x in b for y in adj.get(x, ())} for n, b in balls.items()
            }
        rows = []
        for n in nodes:
            for m in balls[n]:
                rows.append((n, m))
        member = spark.createDataFrame(rows, "node string, key string")
        w = 32 - 4
        hb = hash_bucket(F.col("key"), "hb")
        regs = (
            member.select(
                "node",
                F.shiftright(hb, w).alias("bucket"),
                hb.bitwiseAND(F.lit((1 << w) - 1)).alias("tail"),
            )
            .groupBy("node", "bucket")
            .agg(F.min("tail").alias("min_tail"))
        )
        est = {
            r["node"]: r["hll_est"]
            for r in hll_estimate(regs, ["node"], p=4, linear_correction=True).collect()
        }
        for n in nodes:
            assert out[n][1] == est[n], f"ball_est mismatch for {n}"



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



def test_domain_mixture_rates_and_determinism(spark):
    import pyspark.sql.functions as F

    from chatdata_spark.operators.sampling import domain_mixture
    from tests.conftest import SF_ORACLE

    d = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    rates = {"src0": 1.0, "src1": 0.5}
    m1 = domain_mixture(d, "source", rates, "doc_id", default_rate=0.0)
    # src0 keeps everything, unknown sources drop to default 0
    per_src = {r["source"]: r["n"] for r in m1.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = {r["source"]: r["n"] for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_src["src0"] == total["src0"]
    assert set(per_src) == {"src0", "src1"}  # default 0 drops the rest
    assert 0.3 * total["src1"] <= per_src["src1"] <= 0.7 * total["src1"]
    # layout-independence: membership identical after a repartition
    ids_a = {r["doc_id"] for r in m1.select("doc_id").collect()}
    ids_b = {
        r["doc_id"]
        for r in domain_mixture(d.repartition(17), "source", rates, "doc_id").select("doc_id").collect()
    }
    assert ids_a == ids_b

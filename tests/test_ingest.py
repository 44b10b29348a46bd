

def test_read_json_quarantine_splits_bad_lines(spark, tmp_path):
    from chatdata_spark.sources.ingest import read_json_quarantine

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "fine"}\n'
        '{"doc_id": "not_a_number", "text": "bad type is fine in permissive"}\n'
    )
    clean, bad = read_json_quarantine(spark, str(p), "doc_id bigint, text string")
    ids = sorted(r["doc_id"] for r in clean.collect() if r["doc_id"] is not None)
    assert ids == [1, 2]
    assert bad.count() >= 1  # the non-JSON line is quarantined verbatim
    assert "not json" in bad.collect()[0]["_corrupt_record"]


def test_evolve_union_by_name(spark):
    from chatdata_spark.sources.ingest import evolve_union

    old = spark.createDataFrame([(1, "a")], "id bigint, text string")
    new = spark.createDataFrame(
        [(2, "b", "en")], "id bigint, text string, lang string"
    )
    out = evolve_union(old, new)
    rows = {r["id"]: (r["text"], r["lang"]) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", "en")}


def test_parse_csv_typed_quotes_types_and_quarantine(spark):
    from chatdata_spark.sources.ingest import parse_csv_typed

    rows = [
        (1, '1,5,2.5,"a, b"'),        # quoted comma survives in label
        (2, '2,xx,3.5,"c"'),          # bad int -> qty NULL, corrupt set
        (3, '3,7,not_a_double,"d"'),  # bad double -> price NULL, corrupt set
        (4, '4,,4.5,"e"'),            # empty int field -> NULL, NOT corrupt
    ]
    df = spark.createDataFrame(rows, "rid int, line string")
    out = {
        r.rid: r
        for r in parse_csv_typed(
            df, "line", "doc_id long, qty int, price double, label string, _corrupt string"
        ).collect()
    }
    assert out[1].label == "a, b" and out[1].qty == 5 and out[1].price == 2.5
    assert out[2].qty is None and out[2]._corrupt is not None
    assert out[2].doc_id == 2  # parseable fields still extracted on bad rows
    assert out[3].price is None and out[3]._corrupt is not None
    assert out[4].qty is None and out[4]._corrupt is None


def test_orc_scan_pushes_filters(spark, tmp_path):
    """ORC scans must consume pushed filters like parquet (Catalyst emits
    a searchArgument / PushedFilters entry into the OrcScan) — the reason
    the round-trip writes KEY-SORTED ORC: sorted layout + pushdown =
    min/max stripe pruning, the same skip story as the parquet layouts."""
    import pyspark.sql.functions as F

    path = str(tmp_path / "orc")
    spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("grp")
    ).repartitionByRange(4, "doc_id").sortWithinPartitions("doc_id").write.orc(path)
    df = spark.read.orc(path).filter(F.col("doc_id") > 900).select("doc_id")
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,900)]" in plan
    assert df.count() == 99

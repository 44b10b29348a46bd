"""k-center greedy coreset (operators/coreset.py): hand-example
selection order, Spark ≡ sequential parity, fixed-point conversion."""

from chatdata_spark.operators.coreset import kcenter_greedy_py


def test_hand_example_selection_order():
    # 1-D points at 0, 1, 10, 21 (fixed-point ints). Seed = min id (0 ->
    # point 0). Farthest from {0} is 21 (d2 441), then 10 (d2 121 to both),
    # then 1 (d2 1).
    vectors = {0: [0], 1: [1], 2: [10], 3: [21]}
    sel = kcenter_greedy_py(vectors, k=4)
    assert sel == [(1, 0, 0), (2, 3, 441), (3, 2, 100), (4, 1, 1)]


def test_radius_sequence_non_increasing():
    import random

    rng = random.Random(7)
    vectors = {i: [rng.randint(-50, 50) for _ in range(5)] for i in range(40)}
    sel = kcenter_greedy_py(vectors, k=8)
    d2s = [d for _r, _i, d in sel[1:]]
    assert all(a >= b for a, b in zip(d2s, d2s[1:]))


def test_tie_breaks_to_smaller_id():
    # two coincident far points: the smaller id must win the argmax
    vectors = {0: [0], 5: [9], 3: [9]}
    sel = kcenter_greedy_py(vectors, k=2)
    assert sel[1][1] == 3


def test_spark_matches_sequential(spark):
    from chatdata_spark.operators.coreset import kcenter_greedy

    rows = [
        (i, [((i * 37 + j * 11) % 200 - 100) / 100.0 for j in range(6)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [
        (r["rank"], r["vec_id"], r["d2_prev"])
        for r in kcenter_greedy(df, "vec_id", "embedding", k=6)
        .orderBy("rank")
        .collect()
    ]
    # sequential replay over the SAME fixed-point conversion
    from decimal import ROUND_HALF_UP, Decimal

    q4 = Decimal("0.0001")
    vectors = {
        i: [int(Decimal(repr(float(c))).quantize(q4, ROUND_HALF_UP) * 10_000)
            for c in vec]
        for i, vec in rows
    }
    assert got == kcenter_greedy_py(vectors, k=6)

"""Edit-distance similarity join (operators/fuzzyjoin.py): exactness vs
brute force (incl. short-string and no-gram edge cases), q/k variants."""

import itertools


def _brute(strings, k):
    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = set()
    for x, y in itertools.combinations(sorted(set(strings)), 2):
        d = lev(x, y)
        if d <= k:
            out.add((x, y, d))
    return out


def _run(spark, strings, k, q):
    from chatdata_spark.operators.fuzzyjoin import edit_distance_self_join

    df = spark.createDataFrame([(s,) for s in strings], "name string")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit_distance_self_join(df, "name", k=k, q=q).collect()
    }
    assert got == _brute(strings, k), (k, q, got ^ _brute(strings, k))


def test_exact_vs_brute_force_mixed_lengths(spark):
    strings = [
        "widget", "widgit", "widgets", "gadget", "gadgets", "bolt",
        "bolts", "bolt", "jolt", "a", "b", "ab", "ba", "abc", "hammer",
        "hammers", "spanner", "spaner", "xy",
    ]
    _run(spark, strings, k=1, q=2)


def test_exact_k2_q3(spark):
    strings = [
        "deduplicate", "deduplicote", "deduplicatex", "replicate",
        "replicant", "duplicate", "duplicates", "dup", "dupe", "du",
    ]
    _run(spark, strings, k=2, q=3)


def test_short_strings_zero_grams_still_found(spark):
    # len < q strings emit no q-grams; pairs must come from the short
    # route (the bound-<=0 band)
    _run(spark, ["a", "b", "ab", "ac", "bc", "c", "abcd"], k=1, q=2)


def test_duplicate_corpus_rows_collapse(spark):
    from chatdata_spark.operators.fuzzyjoin import edit_distance_self_join

    df = spark.createDataFrame(
        [("cat",)] * 50 + [("car",)] * 30 + [("dog",)] * 20, "name string"
    )
    rows = edit_distance_self_join(df, "name", k=1, q=2).collect()
    assert [(r["name_a"], r["name_b"], r["dist"]) for r in rows] == [
        ("car", "cat", 1)
    ]

"""PMI collocation mining (operators/textstats.collocations)."""

from pyspark.sql import functions as F

from webscraping_spark.operators.textstats import collocations


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts_and_integer_pmi_ratio(spark):
    docs = _docs(
        spark,
        [(1, "new york new york city"), (2, "in new york the city"), (3, "  "), (4, None)],
    )
    out = {(r["w1"], r["w2"]): r for r in collocations(docs, min_count=2).collect()}
    assert set(out) == {("new", "york")}
    r = out[("new", "york")]
    # N = 10 tokens; ratio = 3 * 10 * 1e6 // (3 * 3)
    assert (r["n_pair"], r["n_w1"], r["n_w2"]) == (3, 3, 3)
    assert r["pmi_ratio"] == 3 * 10 * 1_000_000 // 9


def test_lowercasing_merges_case_variants(spark):
    docs = _docs(spark, [(1, "New York new york NEW YORK")])
    out = collocations(docs, min_count=3).collect()
    pairs = {(r["w1"], r["w2"]): r["n_pair"] for r in out}
    assert pairs[("new", "york")] == 3


def test_high_pmi_beats_frequent_but_independent(spark):
    # 'aaa bbb' always adjacent; 'the' everywhere but promiscuous
    rows = [(i, f"the w{i} the aaa bbb the") for i in range(20)]
    docs = _docs(spark, rows)
    out = {(r["w1"], r["w2"]): r["pmi_ratio"] for r in collocations(docs, min_count=5).collect()}
    assert out[("aaa", "bbb")] > max(
        v for k, v in out.items() if "the" in k
    )


def test_partitioning_invariance(spark):
    rows = [(i, f"alpha beta gamma w{i % 9} alpha beta") for i in range(60)]
    docs = _docs(spark, rows)
    a = sorted(map(tuple, collocations(docs, min_count=3).collect()))
    b = sorted(
        map(tuple, collocations(docs.repartition(11, "text"), min_count=3).collect())
    )
    assert a == b and len(a) > 0

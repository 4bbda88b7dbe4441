"""Corpus-level CCNet paragraph dedup (operators/dedup.paragraph_dedup):
normalization-keyed first-occurrence-wins removal with rebuilt text.

Pins the hand-derivable outcomes: cross-doc duplicate paragraphs survive
only at the minimum (doc_id, pos); CCNet normalization maps digit/case/
whitespace variants to one key; whitespace-only paragraphs vanish; docs
losing everything keep an empty-text row; and the result is partitioning-
invariant (the min-(doc,pos) total order leaves no tie to break).
"""

from pyspark.sql import functions as F

from webscraping_spark.operators.dedup import paragraph_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _out(df):
    return {r["doc_id"]: (r["text"], r["n_paragraphs"], r["n_kept"]) for r in df.collect()}


def test_first_occurrence_wins_across_docs(spark):
    rows = [
        (1, "alpha\nshared line\nbeta"),
        (2, "shared line\ngamma"),
        (3, "gamma\nshared line"),
    ]
    got = _out(paragraph_dedup(_docs(spark, rows)))
    assert got[1] == ("alpha\nshared line\nbeta", 3, 3)
    assert got[2] == ("gamma", 2, 1)  # 'shared line' lost to doc 1 pos 1
    assert got[3] == ("", 2, 0)  # both lines already owned by docs 1/2


def test_intra_doc_duplicate_keeps_min_pos(spark):
    got = _out(paragraph_dedup(_docs(spark, [(7, "x\ny\nx")])))
    assert got[7] == ("x\ny", 3, 2)


def test_ccnet_normalization_collapses_variants(spark):
    rows = [
        (1, "Page 1 of 7"),
        (2, "page 9 of 3"),  # digits->0, lowercase: same key
        (3, "  page   4 OF 2  "),  # whitespace collapse + trim: same key
        (4, "page of"),  # different key
    ]
    got = _out(paragraph_dedup(_docs(spark, rows)))
    assert got[1] == ("Page 1 of 7", 1, 1)
    assert got[2][2] == 0 and got[3][2] == 0
    assert got[4] == ("page of", 1, 1)


def test_normalize_false_keeps_variants(spark):
    rows = [(1, "Page 1 of 7"), (2, "page 9 of 3")]
    got = _out(paragraph_dedup(_docs(spark, rows), normalize=False))
    assert got[1][2] == 1 and got[2][2] == 1


def test_whitespace_paragraphs_removed_in_both_modes(spark):
    rows = [(1, "a\n   \n\nb"), (2, " \t ")]
    for normalize in (True, False):
        got = _out(paragraph_dedup(_docs(spark, rows), normalize=normalize))
        assert got[1] == ("a\nb", 2, 2)
        assert got[2] == ("", 0, 0)


def test_partitioning_invariance(spark):
    rows = [(i, f"common header\nbody {i}\nfooter {i % 3}") for i in range(40)]
    base = _out(paragraph_dedup(_docs(spark, rows)))
    shuffled = _out(paragraph_dedup(_docs(spark, rows).repartition(13, "text")))
    assert base == shuffled
    # footer normalizes digits->0 ... 'footer 0/1/2' -> same key: one survivor
    assert sum(1 for t, _, _ in base.values() if "footer" in t) == 1
    assert sum(1 for t, _, _ in base.values() if "common header" in t) == 1


class TestKeepBestRepresentatives:
    """Quality-aware cluster survivors (dedup.keep_best_representatives)."""

    def _run(self, spark, docs_rows, comp_rows):
        from webscraping_spark.operators.dedup import keep_best_representatives

        docs = spark.createDataFrame(docs_rows, "doc_id long, q double")
        comps = spark.createDataFrame(comp_rows, "id long, component long")
        return sorted(
            r["doc_id"]
            for r in keep_best_representatives(docs, comps, "q").collect()
        )

    def test_max_score_wins_not_min_id(self, spark):
        docs = [(1, 0.2), (2, 0.9), (3, 0.5), (9, 0.1)]
        comps = [(1, 1), (2, 1), (3, 1)]
        assert self._run(spark, docs, comps) == [2, 9]  # 9 is a singleton

    def test_tie_breaks_to_min_id(self, spark):
        docs = [(5, 0.7), (6, 0.7), (7, 0.1)]
        comps = [(5, 5), (6, 5), (7, 5)]
        assert self._run(spark, docs, comps) == [5]

    def test_all_null_cluster_falls_back_to_min_id(self, spark):
        docs = [(1, None), (2, None), (3, 0.4)]
        comps = [(1, 1), (2, 1)]
        assert self._run(spark, docs, comps) == [1, 3]

    def test_null_loses_to_any_score(self, spark):
        docs = [(1, None), (2, 0.01)]
        comps = [(1, 1), (2, 1)]
        assert self._run(spark, docs, comps) == [2]

    def test_partitioning_invariance(self, spark):
        from webscraping_spark.operators.dedup import keep_best_representatives

        docs_rows = [(i, float((i * 37) % 11)) for i in range(100)]
        comp_rows = [(i, i % 7) for i in range(70)]
        docs = spark.createDataFrame(docs_rows, "doc_id long, q double")
        comps = spark.createDataFrame(comp_rows, "id long, component long")
        a = sorted(r["doc_id"] for r in keep_best_representatives(docs, comps, "q").collect())
        b = sorted(
            r["doc_id"]
            for r in keep_best_representatives(
                docs.repartition(13, "q"), comps.repartition(5), "q"
            ).collect()
        )
        assert a == b and len(a) == 7 + 30

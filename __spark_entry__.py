"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl superstep on sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (+ the training-data operator family); ``oracle_sql()`` gives
the DuckDB-ANSI twin for every SQL-expressible one. Column names/aliases
match pairwise by construction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# synthesized crawl columns over the events table (deterministic arithmetic
# mirrored 1:1 in the oracle SQL strings below)
# ---------------------------------------------------------------------------


def _event_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-shaped rows derived from events: base page + dirty relative link."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "user_id",
        F.concat(
            F.lit("http://ex"), (F.col("user_id") % 5).cast("string"), F.lit(".com/dir/index.html")
        ).alias("base_url"),
        F.concat(
            F.lit("../p"), (F.col("event_id") % 7).cast("string"),
            F.lit(".html?x=1&amp;y=2#frag"),
        ).alias("raw_link"),
    )


# ---------------------------------------------------------------------------
# the queries
# ---------------------------------------------------------------------------


def q_unseen_filter_anti_join(spark, sf_dir):
    """SURVEY §2.3/§2.4 unseen filter: left ANTI join (download.py:1041)."""
    events = _t(spark, sf_dir, "events")
    customer = _t(spark, sf_dir, "customer")
    return (
        events.select("user_id")
        .distinct()
        .join(customer, events.user_id == customer.c_custkey, "left_anti")
        .select("user_id")
    )


def q_cache_contains_semi_join(spark, sf_dir):
    """SURVEY §2.3 batch membership: left SEMI join (pdict.py:119-137)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left_semi")
        .select("o_custkey")
        .distinct()
    )


def q_priority_pull_topk(spark, sf_dir):
    """SURVEY §2.6 Queue.pull top-k (pdict.py:468-478)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


def q_fair_topk_per_domain(spark, sf_dir):
    """SURVEY §2.6 per-domain fair pull: row_number <= 2 per customer."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "rn")
    )


def q_politeness_plan_window(spark, sf_dir):
    """SURVEY §2.8 throttle as planned schedule: per-key lag cumsum
    (download.py:455-473 re-expressed; fixed delay for the SQL oracle)."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return events.select(
        "event_id",
        "user_id",
        ((F.row_number().over(w) - 1) * F.lit(5.0)).alias("sched_offset"),
    )


def q_crawl_metrics_agg(spark, sf_dir):
    """SURVEY §2.5 State counters (download.py:898-922)."""
    events = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def q_ordered_dedup_first(spark, sf_dir):
    """SURVEY §2.6 first-occurrence dedup (common.py:142-156)."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id")
    )


def q_link_cap_slice(spark, sf_dir):
    """SURVEY §2.5 per-page link cap via slice+explode (download.py:1046)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), "\\s+")
    return docs.select(
        "doc_id", F.explode(F.slice(toks, 1, 5)).alias("tok")
    )


def q_retry_routing(spark, sf_dir):
    """SURVEY §2.3 acceptable-errors / retry routing (download.py:447-448)."""
    events = _t(spark, sf_dir, "events")
    route = (
        F.when(F.col("event_type") == "error", "retry")
        .when(F.col("event_type") == "purchase", "ok")
        .otherwise("skip")
    )
    return events.select(route.alias("route")).groupBy("route").agg(
        F.count("*").alias("n")
    )


def q_geocode_flatten(spark, sf_dir):
    """SURVEY §2.2 JSON status gate + address flatten (GoogleMaps
    load_result download.py:703-726, parse_location 729-765): synthesize a
    geocode API response per customer, parse it with from_json +
    higher-order filters (pure JVM), emit the flat fields. The oracle
    reconstructs the expected values arithmetically — any parse/flatten
    slip hash-mismatches."""
    from webscraping_spark.functions.extract import geocode_flatten_cols

    c = _t(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    status = F.when(key % 10 == 0, "ZERO_RESULTS").otherwise("OK")
    num = (key % 999).cast("string")
    lat = ((key % 160) - 80).cast("double").cast("string")
    lng = ((key % 340) - 170).cast("double").cast("string")
    payload = F.concat(
        F.lit('{"status":"'), status,
        F.lit('","formatted_address":"'), num, F.lit(' Main St, Springfield"'),
        F.lit(',"address_components":['),
        F.lit('{"long_name":"'), num, F.lit('","short_name":"'), num,
        F.lit('","types":["street_number"]},'),
        F.lit('{"long_name":"Main St","short_name":"Main St","types":["route"]},'),
        F.lit('{"long_name":"California","short_name":"CA",'
              '"types":["administrative_area_level_1","political"]},'),
        F.lit('{"long_name":"United States","short_name":"US",'
              '"types":["country","political"]}]'),
        F.lit(',"geometry":{"location":{"lat":'), lat, F.lit(',"lng":'), lng,
        F.lit('}},"types":["street_address"]}'),
    )
    cols = geocode_flatten_cols(payload)
    return c.select(
        "c_custkey",
        cols["address"].alias("address"),
        cols["state_code"].alias("state_code"),
        cols["country"].alias("country"),
        cols["full_address"].alias("full_address"),
        cols["lat"].alias("lat"),
        cols["lng"].alias("lng"),
    )


def q_cache_merge_keep_target(spark, sf_dir):
    """SURVEY §2.7 cache merge (PersistentDict.merge, pdict.py:249-255):
    keys already in the target keep the TARGET row; only absent keys copy
    over from the source."""
    from webscraping_spark.sources.snapshots import merge_tables

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") < 300).select(
        "doc_id", F.lit("target").alias("side")
    )
    source = docs.filter(F.col("doc_id") >= 200).select(
        "doc_id", F.lit("source").alias("side")
    )
    return merge_tables(target, source, key="doc_id")


def q_kv_last_write_wins(spark, sf_dir):
    """SURVEY §2.1 sqlite KV store upsert semantics (pdict.py:181-188
    INSERT OR REPLACE): replay an append-only write log and keep the last
    write per key — the resolution the snapshot-backed PersistentDictTable
    applies to its delta chain (sources/kv.py). orders is the log: key =
    o_custkey, write time = o_orderkey, payload = o_totalprice."""
    from webscraping_spark.sources.kv import resolve_upsert_log

    o = _t(spark, sf_dir, "orders")
    log = o.select(
        F.col("o_custkey").alias("key"),
        F.col("o_totalprice").alias("value"),
        F.lit("m").alias("meta"),
        F.col("o_orderkey").cast("double").alias("updated"),
    )
    return resolve_upsert_log(log).select("key", "value", "updated")


def q_proxy_consec_errors(spark, sf_dir):
    """SURVEY §2.4 proxy performance (ProxyPerformance, download.py:51-68):
    consecutive-error counts over an ordered fetch log, success resets."""
    from webscraping_spark.operators.proxies import consecutive_errors

    e = _t(spark, sf_dir, "events")
    log = e.select(
        F.concat(F.lit("p"), (F.col("user_id") % 5).cast("string")).alias("proxy"),
        F.col("event_id").alias("seq"),
        (F.col("event_type") != "error").alias("ok"),
    )
    return consecutive_errors(log).select(
        "seq", "proxy", F.col("consec_errors").cast("long").alias("consec_errors")
    )


def q_charset_decode_roundtrip(spark, sf_dir):
    """SURVEY §2.2 html_to_unicode (common.py:109-116): encode each doc to
    tagged bytes, decode through the sniffing UDF, assert round-trip."""
    from webscraping_spark.functions.decode import html_to_unicode_udf

    docs = _t(spark, sf_dir, "documents")
    tagged = F.concat(F.lit("<meta charset=utf-8>"), F.col("text"))
    raw = F.encode(tagged, "UTF-8")
    return docs.select(
        "doc_id", (html_to_unicode_udf(raw) == tagged).alias("ok")
    )


def q_cache_ttl_filter(spark, sf_dir):
    """SURVEY §2.3 TTL freshness predicate (pdict.py:202-205 is_fresh:
    now - updated < expires). events.ts plays fetched_at; 'now' is the max
    timestamp; entries older than a 7-day TTL are the stale set a cache
    read would re-fetch. Pure timestamp-interval arithmetic (ts arrives as
    TIMESTAMP_NTZ): no epoch conversion, so no session-timezone exposure on
    either engine."""
    e = _t(spark, sf_dir, "events").select("event_id", F.col("ts").alias("t"))
    now = e.agg(F.max("t").alias("now"))
    return (
        e.crossJoin(F.broadcast(now))
        .withColumn(
            "is_fresh", (F.col("now") - F.col("t")) < F.expr("INTERVAL 7 DAY")
        )
        .select("event_id", "is_fresh")
    )


def q_url_canonicalize(spark, sf_dir):
    """SURVEY §2.2 THE canonicalization kernel (download.py:987-1004) —
    pandas UDF vs hand-derived canonical form in SQL."""
    from webscraping_spark.functions.udfs import canonicalize_url_udf

    urls = _event_urls(spark, sf_dir)
    return urls.select(
        "event_id",
        canonicalize_url_udf(F.col("base_url"), F.col("raw_link")).alias("canon_url"),
    )


def q_domain_extract(spark, sf_dir):
    """SURVEY §2.2 get_domain (common.py:408-429) — suffix-trim UDF vs
    constructed expected value."""
    from webscraping_spark.functions.udfs import get_domain_udf

    events = _t(spark, sf_dir, "events")
    url = F.concat(
        F.lit("http://www.shop"), (F.col("user_id") % 7).cast("string"), F.lit(".com.au/x")
    )
    return (
        events.select("user_id").distinct().select(
            "user_id", get_domain_udf(url).alias("domain")
        )
    )


def q_media_ext_gate(spark, sf_dir):
    """SURVEY §2.3 media-extension link gate (download.py:1016,
    common.py:45)."""
    from webscraping_spark.functions.udfs import is_media_link_col

    events = _t(spark, sf_dir, "events")
    ext = (
        F.when(F.col("event_id") % 4 == 0, "jpg")
        .when(F.col("event_id") % 4 == 1, "html")
        .when(F.col("event_id") % 4 == 2, "png")
        .otherwise("php")
    )
    urls = events.select(
        "event_id",
        F.concat(F.lit("http://m.com/f"), F.col("event_id").cast("string"), F.lit("."), ext).alias("url"),
    )
    return urls.filter(~is_media_link_col(F.col("url"))).select("event_id", "url")


def q_geo_distance(spark, sf_dir):
    """SURVEY §2.2 great-circle distance (alg.py:119-157) as column expr."""
    customer = _t(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 160).cast("double") - 80.0
    lng = (F.col("c_custkey") % 340).cast("double") - 170.0
    d2r = 3.141592653589793 / 180.0
    phi1 = (90.0 - lat) * d2r
    phi2 = (90.0 - F.lit(37.775)) * d2r
    theta_diff = (lng - F.lit(-122.4183)) * d2r
    cos_arc = (
        F.sin(phi1) * F.sin(phi2) * F.cos(theta_diff)
        + F.cos(phi1) * F.cos(phi2)
    )
    dist = F.acos(F.least(F.greatest(cos_arc, F.lit(-1.0)), F.lit(1.0))) * 6373.0
    return customer.select("c_custkey", F.round(dist, 4).alias("dist_km"))


def q_exact_dedup_docs(spark, sf_dir):
    """Training-data op: exact dedup via hash-groupBy."""
    from webscraping_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"))


def q_token_count(spark, sf_dir):
    """Training-data op: whitespace token counting."""
    from webscraping_spark.operators.textstats import token_count_col

    return _t(spark, sf_dir, "documents").select(
        "doc_id", token_count_col().alias("n_tokens")
    )


def q_quality_scores(spark, sf_dir):
    """Training-data op: quality signals (length/punct/stopword ratios)."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    n_chars = F.length(t)
    toks = F.split(F.lower(F.trim(t)), "\\s+")
    n_tokens = F.size(toks)
    punct = F.length(F.regexp_replace(t, "[^.!?,;:]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin("the", "and", "of", "to", "a", "in", "is", "it"))
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
    )


def q_langid(spark, sf_dir):
    """Training-data op: stopword-profile language ID (argmax, ties to
    lexicographically-greatest lang)."""
    from webscraping_spark.operators.textstats import langid

    return langid(_t(spark, sf_dir, "documents"))


def q_lang_distribution(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )


def q_shingle_count(spark, sf_dir):
    """Training-data op: distinct word-3-shingles per doc (dedup building
    block, string-form for the SQL oracle)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), "\\s+")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1)))
    shingle_strs = F.transform(starts, lambda i: F.array_join(F.slice(toks, i, 3), " "))
    return docs.select(
        "doc_id", F.size(F.array_distinct(shingle_strs)).alias("n_shingles")
    )


def q_embedding_norms(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    l2 = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return emb.select("vec_id", F.round(l2, 5).alias("l2_norm"))


def q_embedding_topk_cosine(spark, sf_dir):
    """Training-data op: brute-force cosine top-k (similarity baseline)."""
    from webscraping_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    out = cosine_topk(emb, list(qvec), k=10)
    return out.select("vec_id", F.round("cosine", 5).alias("cosine"))


def q_excerpt_maxby(spark, sf_dir):
    """SURVEY §2.5 max-text-block pattern (alg.py:24) via max_by."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.max_by("doc_id", F.col("n_chars") * 10000000 + F.col("doc_id")).alias("top_doc_id")
    )


# --- rows-only queries (no SQL-expressible oracle; driver records the
#     weaker check; correctness covered by tests/) ---------------------------


def q_minhash_near_dupes(spark, sf_dir):
    from webscraping_spark.operators.dedup import minhash_near_dupes

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return minhash_near_dupes(docs, threshold=0.2, n_hashes=64, n_bands=16)


def q_simhash(spark, sf_dir):
    from webscraping_spark.operators.dedup import simhash

    return simhash(_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200))


def q_ann_topk(spark, sf_dir):
    from webscraping_spark.operators.similarity import ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    return ann_topk(emb, list(qvec), k=10, n_planes=8, probe_hamming=1)


def q_ann_topk_subset(spark, sf_dir):
    """ANN quality gate with a hard oracle: the ids ann_topk returns, MINUS
    the exact brute-force top-50 (computed independently in Spark), must be
    the EMPTY set — the SQL oracle encodes 'empty' literally. Any ANN
    result outside the exact top-50 ball hash-mismatches the driver check.
    (Recall evidence — |ann ∩ exact top-k| — lives in pytest, where the
    non-SQL-expressible LSH can be compared directly.)"""
    from webscraping_spark.operators.similarity import ann_topk, cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    ann = ann_topk(emb, list(qvec), k=10, n_planes=8, probe_hamming=2)
    exact_ball = cosine_topk(emb, list(qvec), k=50)
    return ann.select("vec_id").join(
        exact_ball.select("vec_id"), "vec_id", "left_anti"
    )


def q_fingerprint(spark, sf_dir):
    from webscraping_spark.operators.textstats import fingerprint

    return fingerprint(_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200))


def q_image_verify(spark, sf_dir):
    """Multimodal op: synthesize image pages from documents, then decode +
    verify per-row (allclose / PSNR>=40 / phash) in Arrow batches."""
    from webscraping_spark.operators.multimodal import verify_images
    from webscraping_spark.sources import synth

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).collect()
    pages = [
        synth.make_page(f"http://img.com/d{r['doc_id']}", [])
        for r in docs
    ]
    return verify_images(synth.pages_df(spark, pages))


# ---------------------------------------------------------------------------
# the contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one frontier superstep — synthesize a frontier from
    sf0.001 events, canonicalize + dedup (anti-join) + per-domain
    politeness plan — returns the planned fetch schedule."""
    from webscraping_spark.functions.udfs import canonicalize_url_udf, get_domain_udf
    from webscraping_spark.operators.politeness import plan_schedule

    sf_dir = "/root/testdata/sf0.001"
    urls = _event_urls(spark, sf_dir)
    frontier = urls.select(
        "event_id",
        canonicalize_url_udf(F.col("base_url"), F.col("raw_link")).alias("url"),
    )
    frontier = (
        frontier.withColumn("url_hash", F.xxhash64("url"))
        .withColumn("domain", get_domain_udf(F.col("url")))
        .withColumn("priority", F.lit(0))
        .withColumn("seq", F.col("event_id"))
    )
    # dedup: first event per canonical URL (anti-join-style min_by claim)
    claimed = frontier.groupBy("url", "url_hash", "domain").agg(
        F.min("seq").alias("seq"), F.min("priority").alias("priority")
    )
    state = spark.createDataFrame([], "domain string, proxy string, next_allowed_offset double")
    planned, _ = plan_schedule(claimed, state, delay=5.0, variance=0.5, seed=42)
    return planned.select("url", "domain", "seq", "scheduled_offset")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "unseen_filter_anti_join": q_unseen_filter_anti_join,
        "cache_contains_semi_join": q_cache_contains_semi_join,
        "priority_pull_topk": q_priority_pull_topk,
        "fair_topk_per_domain": q_fair_topk_per_domain,
        "politeness_plan_window": q_politeness_plan_window,
        "crawl_metrics_agg": q_crawl_metrics_agg,
        "ordered_dedup_first": q_ordered_dedup_first,
        "link_cap_slice": q_link_cap_slice,
        "retry_routing": q_retry_routing,
        "geocode_flatten": q_geocode_flatten,
        "cache_merge_keep_target": q_cache_merge_keep_target,
        "kv_last_write_wins": q_kv_last_write_wins,
        "proxy_consec_errors": q_proxy_consec_errors,
        "charset_decode_roundtrip": q_charset_decode_roundtrip,
        "cache_ttl_filter": q_cache_ttl_filter,
        "url_canonicalize": q_url_canonicalize,
        "domain_extract": q_domain_extract,
        "media_ext_gate": q_media_ext_gate,
        "geo_distance": q_geo_distance,
        "exact_dedup_docs": q_exact_dedup_docs,
        "token_count": q_token_count,
        "quality_scores": q_quality_scores,
        "langid": q_langid,
        "lang_distribution": q_lang_distribution,
        "shingle_count": q_shingle_count,
        "embedding_norms": q_embedding_norms,
        "embedding_topk_cosine": q_embedding_topk_cosine,
        "excerpt_maxby": q_excerpt_maxby,
        # rows-only (non-SQL-expressible; see tests/ for correctness)
        "minhash_near_dupes": q_minhash_near_dupes,
        "simhash": q_simhash,
        "ann_topk": q_ann_topk,
        "ann_topk_subset": q_ann_topk_subset,
        "fingerprint": q_fingerprint,
        "image_verify": q_image_verify,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "unseen_filter_anti_join": """
            SELECT DISTINCT user_id FROM events
            WHERE user_id NOT IN (SELECT c_custkey FROM customer)
        """,
        "cache_contains_semi_join": """
            SELECT DISTINCT o_custkey FROM orders
            WHERE EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        """,
        "priority_pull_topk": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
        """,
        "fair_topk_per_domain": """
            SELECT o_custkey, o_orderkey, rn FROM (
                SELECT o_custkey, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
            ) WHERE rn <= 2
        """,
        "politeness_plan_window": """
            SELECT event_id, user_id,
                   (row_number() OVER (PARTITION BY user_id
                        ORDER BY ts ASC, event_id ASC) - 1) * 5.0 AS sched_offset
            FROM events
        """,
        "crawl_metrics_agg": """
            SELECT event_type, count(*) AS n_events,
                   round(sum(value), 4) AS total_value
            FROM events GROUP BY event_type
        """,
        "ordered_dedup_first": """
            SELECT user_id, event_id FROM (
                SELECT user_id, event_id,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts ASC, event_id ASC) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "link_cap_slice": """
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')[1:5]) AS tok
            FROM documents
        """,
        "retry_routing": """
            SELECT CASE WHEN event_type = 'error' THEN 'retry'
                        WHEN event_type = 'purchase' THEN 'ok'
                        ELSE 'skip' END AS route,
                   count(*) AS n
            FROM events GROUP BY 1
        """,
        "geocode_flatten": """
            SELECT c_custkey,
                   CASE WHEN c_custkey % 10 = 0 THEN NULL
                        ELSE (c_custkey % 999) || ' Main St' END AS address,
                   CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE 'CA' END AS state_code,
                   CASE WHEN c_custkey % 10 = 0 THEN NULL
                        ELSE 'United States' END AS country,
                   CASE WHEN c_custkey % 10 = 0 THEN NULL
                        ELSE (c_custkey % 999) || ' Main St, Springfield' END
                       AS full_address,
                   CASE WHEN c_custkey % 10 = 0 THEN NULL
                        ELSE ((c_custkey % 160) - 80)::DOUBLE END AS lat,
                   CASE WHEN c_custkey % 10 = 0 THEN NULL
                        ELSE ((c_custkey % 340) - 170)::DOUBLE END AS lng
            FROM customer
        """,
        "cache_merge_keep_target": """
            SELECT doc_id, 'target' AS side FROM documents WHERE doc_id < 300
            UNION ALL
            SELECT doc_id, 'source' AS side FROM documents
            WHERE doc_id >= 200
              AND doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id < 300)
        """,
        "kv_last_write_wins": """
            SELECT o_custkey AS key,
                   arg_max(o_totalprice, o_orderkey) AS value,
                   max(o_orderkey)::DOUBLE AS updated
            FROM orders GROUP BY o_custkey
        """,
        "proxy_consec_errors": """
            WITH log AS (
                SELECT 'p' || (user_id % 5) AS proxy, event_id AS seq,
                       event_type <> 'error' AS ok
                FROM events
            ), g AS (
                SELECT proxy, seq, ok,
                       sum(CASE WHEN ok THEN 1 ELSE 0 END)
                           OVER (PARTITION BY proxy ORDER BY seq
                                 ROWS UNBOUNDED PRECEDING) AS grp
                FROM log
            )
            SELECT seq, proxy,
                   (CASE WHEN ok THEN 0
                         ELSE sum(CASE WHEN ok THEN 0 ELSE 1 END)
                              OVER (PARTITION BY proxy, grp ORDER BY seq
                                    ROWS UNBOUNDED PRECEDING) END)::BIGINT
                       AS consec_errors
            FROM g
        """,
        "charset_decode_roundtrip": """
            SELECT doc_id, true AS ok FROM documents
        """,
        "cache_ttl_filter": """
            SELECT event_id,
                   ((SELECT max(ts) FROM events) - ts) < INTERVAL 7 DAY
                       AS is_fresh
            FROM events
        """,
        "url_canonicalize": """
            SELECT event_id,
                   'http://ex' || (user_id % 5) || '.com/p' || (event_id % 7)
                       || '.html?x=1&y=2' AS canon_url
            FROM events
        """,
        "domain_extract": """
            SELECT DISTINCT user_id,
                   'shop' || (user_id % 7) || '.com.au' AS domain
            FROM events
        """,
        "media_ext_gate": """
            SELECT event_id,
                   'http://m.com/f' || event_id || '.' ||
                       CASE WHEN event_id % 4 = 0 THEN 'jpg'
                            WHEN event_id % 4 = 1 THEN 'html'
                            WHEN event_id % 4 = 2 THEN 'png'
                            ELSE 'php' END AS url
            FROM events
            WHERE event_id % 4 IN (1, 3)
        """,
        "geo_distance": """
            SELECT c_custkey,
                   round(acos(least(greatest(
                       sin((90.0 - ((c_custkey % 160) - 80.0)) * pi() / 180.0)
                         * sin((90.0 - 37.775) * pi() / 180.0)
                         * cos((((c_custkey % 340) - 170.0) - (-122.4183)) * pi() / 180.0)
                       + cos((90.0 - ((c_custkey % 160) - 80.0)) * pi() / 180.0)
                         * cos((90.0 - 37.775) * pi() / 180.0), -1.0), 1.0)) * 6373.0,
                       4) AS dist_km
            FROM customer
        """,
        "exact_dedup_docs": """
            SELECT md5(text) AS text_hash, min(doc_id) AS rep_id,
                   count(*) AS n_dupes
            FROM documents GROUP BY md5(text)
        """,
        "token_count": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
            FROM documents
        """,
        "quality_scores": """
            SELECT doc_id,
                   length(text) AS n_chars,
                   round(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                         / greatest(length(text), 1), 6) AS punct_ratio,
                   round(len(list_filter(
                             regexp_split_to_array(lower(trim(text)), '\\s+'),
                             x -> x IN ('the','and','of','to','a','in','is','it')))
                         / greatest(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 1),
                         6) AS stopword_ratio
            FROM documents
        """,
        "langid": """
            WITH hits AS (
                SELECT doc_id,
                    len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                        x -> x IN ('der','die','und','das','ein','zu','mit','von'))) AS s_de,
                    len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                        x -> x IN ('the','and','of','to','a','in','is','it'))) AS s_en,
                    len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                        x -> x IN ('el','la','de','y','los','un','una','que'))) AS s_es,
                    len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                        x -> x IN ('le','la','et','les','des','un','une','du'))) AS s_fr
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
                        WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                        WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                        ELSE 'de' END AS lang_guess,
                   greatest(s_de, s_en, s_es, s_fr)::BIGINT AS lang_score
            FROM hits
        """,
        "lang_distribution": """
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        """,
        "shingle_count": """
            SELECT doc_id,
                   len(list_distinct([array_to_string(arr[i:i+2], ' ')
                       FOR i IN range(1, greatest(len(arr) - 2, 1) + 1)])) AS n_shingles
            FROM (SELECT doc_id,
                         regexp_split_to_array(trim(text), '\\s+') AS arr
                  FROM documents)
        """,
        "embedding_norms": """
            SELECT vec_id,
                   round(sqrt(list_sum(list_transform(embedding::DOUBLE[],
                         x -> x * x))), 5) AS l2_norm
            FROM embeddings
        """,
        "embedding_topk_cosine": """
            SELECT vec_id, round(cosine, 5) AS cosine FROM (
                SELECT vec_id,
                       list_cosine_similarity(embedding::DOUBLE[],
                           (SELECT embedding::DOUBLE[] FROM embeddings
                            WHERE vec_id = 0)) AS cosine
                FROM embeddings
            ) ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        "excerpt_maxby": """
            SELECT source,
                   arg_max(doc_id, n_chars * 10000000 + doc_id) AS top_doc_id
            FROM documents GROUP BY source
        """,
        "ann_topk_subset": """
            -- contract: ann_topk(k=10, probe_hamming=2) returns ONLY ids
            -- inside the exact cosine top-50 ball; the Spark side computes
            -- the set difference, which must be empty
            SELECT CAST(NULL AS BIGINT) AS vec_id WHERE 1 = 0
        """,
    }

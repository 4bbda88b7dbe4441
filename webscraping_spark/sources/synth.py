"""Deterministic synthetic site graphs + image/caption payloads
(FIXTURES.md §1, §7). Seed=42 everywhere; no external data.

Each fixture is a list of page dicts -> a Spark ``pages`` DataFrame with
the BASELINE.json input_hint schema (image_id, bytes, w, h, fmt, caption,
phash) plus crawl columns (url, final_url, status_code, html, meta).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from webscraping_spark.sources import images

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("final_url", T.StringType()),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("html", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

_SIZES = (16, 32, 64, 128)
_FMTS = ("png", "bmp", "ppm", "qnt", "jpeg")
_WORDS = (
    "amber basalt cedar dune ember fjord garnet harbor iris juniper kelp "
    "lagoon marble nectar onyx prairie quartz reed sierra tundra umber "
    "violet willow xenon yarrow zephyr"
).split()


def _h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def caption_for(url: str, seed: int = 42) -> str:
    k = _h(f"{seed}:{url}")
    return "A photo of %s %s under a %s sky" % (
        _WORDS[k % len(_WORDS)],
        _WORDS[(k >> 8) % len(_WORDS)],
        _WORDS[(k >> 16) % len(_WORDS)],
    )


def make_page(
    url: str,
    links: list[str],
    seed: int = 42,
    status_code: int = 200,
    final_url: str | None = None,
    redirect_to: str | None = None,
    extra_html: str = "",
    succeed_after: int = 0,
) -> dict:
    """One synthetic page: HTML with ordered <a href> links, a caption
    paragraph the normalize/xpath kernel can extract, and an encoded image
    payload."""
    k = _h(f"{seed}:{url}")
    w = _SIZES[k % len(_SIZES)]
    h = _SIZES[(k >> 4) % len(_SIZES)]
    fmt = _FMTS[(k >> 8) % len(_FMTS)]
    image_id = hashlib.md5(url.encode()).hexdigest()
    pixels = images.synth_pixels(image_id, w, h, seed)
    payload = images.encode_image(pixels, fmt)
    caption = caption_for(url, seed)
    anchors = "\n".join('<a href="%s">link %d</a>' % (l, i) for i, l in enumerate(links))
    redirect_meta = (
        '<meta http-equiv="refresh" content="0; url=%s">' % redirect_to
        if redirect_to
        else ""
    )
    html = (
        "<html><head><title>%s</title>%s</head><body>"
        '<p class="caption">%s</p>\n%s\n%s'
        '<img src="/img/%s.%s"></body></html>'
        % (url, redirect_meta, caption, anchors, extra_html, image_id, fmt)
    )
    final = final_url or url
    return {
        "image_id": image_id,
        "bytes": bytearray(payload),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": images.average_hash(pixels),
        "url": url,
        "final_url": final,
        "status_code": status_code,
        "html": html,
        "meta": {
            "url": final,
            "status": str(status_code),
            # flaky pages: fetch attempt > succeed_after succeeds
            # (drives the retry-state path, download.py:227-251)
            "succeed_after": str(succeed_after),
        },
    }


def pages_df(spark: SparkSession, pages: list[dict]) -> DataFrame:
    rows = [tuple(p[f.name] for f in PAGES_SCHEMA.fields) for p in pages]
    # cap partitions for tiny fixture batches: createDataFrame defaults to
    # defaultParallelism slices, so a 64-page fixture at local[32] fans out
    # 32 two-row Arrow tasks whose per-task setup dwarfs the work (measured:
    # image_verify 0.86s at 4 cores vs 2.0s at 16). ~8 rows per slice keeps
    # small batches dense while large page lists still use every core.
    slices = max(1, min(spark.sparkContext.defaultParallelism, len(rows) // 8))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=slices), PAGES_SCHEMA
    )


# --- fixture graphs (FIXTURES.md §7) ---------------------------------------


def site_chain(n: int = 5, domain: str = "chain.com") -> list[dict]:
    """A -> B -> C -> ... (BFS order == DFS order)."""
    urls = [f"http://{domain}/p{i}" for i in range(n)]
    return [
        make_page(u, [urls[i + 1]] if i + 1 < n else [])
        for i, u in enumerate(urls)
    ]


def site_tree(branching: int = 3, depth: int = 3, domain: str = "tree.com") -> list[dict]:
    """Complete tree: BFS vs DFS orders differ — the ordering-parity fixture."""
    pages = []

    def url_of(path: tuple[int, ...]) -> str:
        return f"http://{domain}/" + ("n" + "-".join(map(str, path)) if path else "root")

    def build(path: tuple[int, ...]):
        children = (
            [path + (i,) for i in range(branching)] if len(path) < depth else []
        )
        pages.append(make_page(url_of(path), [url_of(c) for c in children]))
        for c in children:
            build(c)

    build(())
    return pages


def site_diamond(domain: str = "diamond.com") -> list[dict]:
    """A -> {B, C}; B -> D; C -> D; D -> A.

    Pins two reference behaviors: D discovered once (dedup), and the seed A
    re-queued by D->A because seeds are not in `found`
    (threaded_get/CrawlerCallback semantics, download.py:843 + 1041)."""
    a, b, c, d = (f"http://{domain}/{x}" for x in "abcd")
    return [
        make_page(a, [b, c]),
        make_page(b, [d]),
        make_page(c, [d]),
        make_page(d, [a]),
    ]


def site_hot_domain(n_hot: int = 80, n_small_domains: int = 10) -> list[dict]:
    """One mega-domain with most URLs + several small ones (skew fixture)."""
    seed_links = [f"http://hot.com/h{i}" for i in range(n_hot)] + [
        f"http://small{j}.com/s" for j in range(n_small_domains)
    ]
    pages = [make_page("http://hot.com/seed", seed_links)]
    pages += [make_page(u, []) for u in seed_links]
    return pages


def site_dirty_links(domain: str = "dirty.com") -> list[dict]:
    """Every normalize/valid() edge case from the doctests in one page."""
    seed = f"http://{domain}/dir/index.html"
    links = [
        "../abc.html",          # parent dir -> /abc.html
        "page.html#frag",       # fragment strip -> /dir/page.html
        "q.html?a=1&amp;b=2",   # entity unescape
        "mailto:x@y.com",       # non-http: dropped by valid()
        "/image.jpg",           # media extension: dropped
        "http://other-site.net/x",  # different domain: dropped
        "%7Euser/home.html",    # percent-decode -> /dir/~user/home.html
        "../abc.html",          # duplicate after normalization
    ]
    targets = [
        f"http://{domain}/abc.html",
        f"http://{domain}/dir/page.html",
        f"http://{domain}/dir/q.html?a=1&b=2",
        f"http://{domain}/dir/~user/home.html",
    ]
    pages = [make_page(seed, links)]
    pages += [make_page(t, []) for t in targets]
    pages.append(make_page(f"http://other-site.net/x", []))
    return pages


def site_link_cap(n_links: int = 150, domain: str = "cap.com") -> list[dict]:
    """One page with more valid links than max_links (truncation order,
    download.py:1046-1047)."""
    links = [f"http://{domain}/x{i:03d}" for i in range(n_links)]
    pages = [make_page(f"http://{domain}/seed", links)]
    pages += [make_page(u, []) for u in links]
    return pages


def site_redirect_error(domain: str = "redir.com") -> list[dict]:
    """301 final_url redirects, meta-refresh, 404s, 500s."""
    seed = f"http://{domain}/seed"
    moved = f"http://{domain}/moved"
    target = f"http://{domain}/target"
    meta_r = f"http://{domain}/meta"
    meta_t = f"http://{domain}/meta-target"
    missing = f"http://{domain}/missing404"
    flaky = f"http://{domain}/flaky500"
    pages = [
        make_page(seed, [moved, meta_r, missing, flaky]),
        make_page(moved, [], status_code=301, final_url=target),
        make_page(target, []),
        make_page(meta_r, [], redirect_to=meta_t),
        make_page(meta_t, []),
        make_page(missing, [], status_code=404),
        make_page(flaky, [], status_code=500),
    ]
    return pages


def site_redirect_chain(domain: str = "chainredir.com") -> list[dict]:
    """Multi-hop meta-refresh chain: seed -> r1, r1 ~> r2 ~> leaf (two
    meta hops). leaf carries a RELATIVE link that must resolve against r2
    (the page whose meta tag led to the final content — the reference's
    bottom-up relative-href rewrite, download.py:264-268), a link back to
    r2 (visited later: must classify as a cache hit, since the hop fetch
    cached it), and a link to `late`, which redirects into the
    already-cached leaf (the nested get() ends on a cache read, so the
    visit reports frame (0,0) = a cache hit)."""
    seed = f"http://{domain}/seed"
    r1 = f"http://{domain}/a/r1"
    r2 = f"http://{domain}/b/r2"
    leaf = f"http://{domain}/c/leaf"
    rel_target = f"http://{domain}/b/rel.html"  # 'rel.html' against r2's dir
    late = f"http://{domain}/late"
    return [
        make_page(seed, [r1]),
        make_page(r1, [], redirect_to=r2),
        make_page(r2, [], redirect_to=leaf),
        make_page(leaf, ["rel.html", r2, late]),
        make_page(rel_target, []),
        make_page(late, [], redirect_to=leaf),
    ]


def site_flaky(domain: str = "flaky.com") -> list[dict]:
    """Retry fixture: a page that 503s twice then succeeds (with a child
    link that must be discovered on the successful attempt), plus a
    permanent 500 (budget burns, no links)."""
    seed = f"http://{domain}/seed"
    flaky = f"http://{domain}/flaky"
    child = f"http://{domain}/child"
    dead = f"http://{domain}/dead"
    return [
        make_page(seed, [flaky, dead]),
        make_page(flaky, [child], status_code=503, succeed_after=2),
        make_page(child, []),
        make_page(dead, [], status_code=500),
    ]


def site_scored(domain: str = "scored.com") -> list[dict]:
    """Best-first fixture: seed links to contact/about/help/generic pages
    (link_score ladder, download.py:1062-1078) each embedding an email."""
    seed = f"http://{domain}/"
    names = ["products", "contact-us", "about-team"]
    links = [f"http://{domain}/{n}.php" for n in names]
    pages = [make_page(seed, links)]
    for n, u in zip(names, links):
        pages.append(
            make_page(
                u,
                [],
                extra_html=f"<p>reach us at {n.replace('-', '.')}@{domain}</p>",
            )
        )
    return pages


FIXTURES = {
    "chain": site_chain,
    "tree": site_tree,
    "diamond": site_diamond,
    "hot_domain": site_hot_domain,
    "dirty_links": site_dirty_links,
    "link_cap": site_link_cap,
    "redirect_error": site_redirect_error,
}


def synth_frontier_rows(n: int, n_domains: int, seed: int = 42) -> "np.ndarray":
    """Vectorized synthetic frontier for the benchmark: n URLs over a
    Zipf-ish domain distribution (hot-domain skew built in)."""
    rng = np.random.default_rng(seed)
    # Zipf over domains: domain i gets weight 1/(i+1)
    weights = 1.0 / np.arange(1, n_domains + 1)
    weights /= weights.sum()
    return rng.choice(n_domains, size=n, p=weights)

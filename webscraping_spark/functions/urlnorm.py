"""URL canonicalization kernel — the single most load-bearing code in the
engine: every dedup join, politeness group, and seen-set probe keys on the
output of these functions.

Semantics replicated from the reference library's documented behavior:

* ``canonicalize_url``  — reference ``CrawlerCallback.normalize``
  (download.py:987-1004): fragment strip -> entity/percent unescape ->
  relative resolution -> leading ``/..`` removal.
* ``unescape``          — reference ``common.unescape`` (common.py:241-314):
  numeric + named entity decode, percent-unquote, windows-1252 mojibake map.
* ``get_domain``        — reference ``common.get_domain`` (common.py:408-429):
  registrable domain via a frozen public-suffix label set; IP-literal pass-
  through. This is the politeness/partition key — parity is mandatory.
* ``get_extension``     — common.py:397-405.
* ``same_domain``       — common.py:432-442 (substring containment, an
  intentionally loose test we keep for parity).
* ``is_url``/``is_html``— common.py:119-139.

Everything is pure Python 3 + pandas; the Spark bindings live in
``webscraping_spark.functions.udfs``.
"""

from __future__ import annotations

import html.entities
import re
import urllib.parse

import pandas as pd

# Media-file extensions excluded from crawling as links (reference
# common.py:45). Frozen: this set feeds the link-validity gate.
MEDIA_EXTENSIONS = frozenset(
    "ai aif aifc aiff asc avi bcpio bin c cc ccad cdf class cpio cpt csh css csv "
    "dcr dir dms doc drw dvi dwg dxf dxr eps etx exe ez f f90 fli flv gif gtar gz "
    "h hdf hh hqx ice ico ief iges igs imq ips ipx jpe jpeg jpg js kar latex lha "
    "lsp lzh m man me mesh mid midi mif mime mov movie mp2 mp3 mpe mpeg mpg mpga "
    "ms msh nc oda pbm pdb pdf pgm pgn png pnm pot ppm pps ppt ppz pre prt ps qt "
    "ra ram ras raw rgb rm roff rpm rtf rtx scm set sgm sgml sh shar silo sit skd "
    "skm skp skt smi smil snd sol spl src step stl stp sv4cpio sv4crc swf t tar "
    "tcl tex texi tif tiff tr tsi tsp tsv unv ustar vcd vda viv vivo vrml w2p wav "
    "wmv wrl xbm xlc xll xlm xls xlw xml xpm xsl xwd xyz zip".split()
)

# Registrable-domain suffix labels (reference common.py:421, frozen for
# parity — deliberately NOT today's public-suffix list).
_DOMAIN_SUFFIXES = frozenset(
    "ac ad ae aero af ag ai al am an ao aq ar arpa as asia at au aw ax az ba bb "
    "bd be bf bg bh bi biz bj bm bn bo br bs bt bv bw by bz ca cat cc cd cf cg "
    "ch ci ck cl cm cn co com coop cr cu cv cx cy cz de dj dk dm do dz ec edu "
    "ee eg er es et eu fi fj fk fm fo fr ga gb gd ge gf gg gh gi gl gm gn gov "
    "gp gq gr gs gt gu gw gy hk hm hn hr ht hu id ie il im in info int io iq ir "
    "is it je jm jo jobs jp ke kg kh ki km kn kp kr kw ky kz la lb lc li lk lr "
    "ls lt lu lv ly ma mc md me mg mh mil mk ml mm mn mo mobi mp mq mr ms mt mu "
    "mv mw mx my mz na name nc ne net nf ng ni nl no np nr nu nz om org pa pe "
    "pf pg ph pk pl pm pn pr pro ps pt pw py qa re ro rs ru rw sa sb sc sd se "
    "sg sh si sj sk sl sm sn so sr st su sv sy sz tc td tel tf tg th tj tk tl "
    "tm tn to tp tr tt tv tw tz ua ug uk us uy uz va vc ve vg vi vn vu wf ws "
    "xn ye yt za zm zw".split()
)

def trie_regex(words) -> str:
    """Serialize a word set as a trie-shaped regex fragment (no anchors,
    no capturing groups): matches exactly the same strings as the flat
    alternation ``(w1|w2|...)`` but in O(length) matcher steps instead of
    O(|words|) alternation attempts — Java's Pattern tries alternation
    branches sequentially, so the flat form costs ~280 branch probes per
    label on the 280-entry suffix set (measured: the politeness-key
    domain extraction was the single largest component of the fused
    bench pipeline, ~11.5 s of 30.6 s at 16M rows; see
    OPTIMIZATION_r06.md)."""
    trie: dict = {}
    for w in sorted(words):
        node = trie
        for ch in w:
            node = node.setdefault(ch, {})
        node[""] = {}

    def ser(node: dict) -> str:
        alts = []
        opt = False
        for ch in sorted(node):
            if ch == "":
                opt = True
                continue
            alts.append(re.escape(ch) + ser(node[ch]))
        if not alts:
            return ""
        if len(alts) == 1 and not opt:
            return alts[0]
        return "(?:" + "|".join(alts) + ")" + ("?" if opt else "")

    return ser(trie)


# windows-1252-smuggled codepoints the reference maps to ASCII lookalikes
# (common.py:285-309; the byte pairs there are the utf-8 encodings of these
# codepoints — we apply the same mapping at the codepoint level).
_MOJIBAKE_MAP = {
    "\x82": ",",
    "\x84": ",,",
    "\x85": "...",
    "\x88": "^",
    "\x91": "'",
    "\x92": "'",
    "\x93": '"',
    "\x94": '"',
    "\x95": " ",
    "\x96": "-",
    "\x97": "--",
    "\x99": " ",
    "\xa0": " ",
    "\xa6": "|",
    "\xab": "<<",
    "\xae": "\xae",
    "\xbb": ">>",
    "\xbc": "1/4",
    "\xbd": "1/2",
    "\xbe": "3/4",
    "ʿ": "'",
    "̨": "",
    "̱": "",
}
_MOJIBAKE_RE = re.compile("|".join(map(re.escape, _MOJIBAKE_MAP)))
_ENTITY_RE = re.compile(r"&#?\w+;")
_IP_RE = re.compile(r"^.*://(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})")
_SCHEME_RE = re.compile("^.*://")


def _decode_entity(m: re.Match) -> str:
    text = m.group(0)
    if text[:2] == "&#":
        try:
            if text[:3].lower() == "&#x":
                return chr(int(text[3:-1], 16))
            return chr(int(text[2:-1]))
        except ValueError:
            return text
    code = html.entities.name2codepoint.get(text[1:-1].lower())
    return chr(code) if code is not None else text


def unescape(text: str | None) -> str:
    """Decode HTML entities and percent escapes.

    Replicates common.py:241-314 (doctest common.py:244-246):

    >>> unescape('&lt;hello&nbsp;&amp;%20world&gt;')
    '<hello & world>'
    """
    if not text:
        return ""
    text = _ENTITY_RE.sub(_decode_entity, text)
    text = urllib.parse.unquote(text)
    return _MOJIBAKE_RE.sub(lambda m: _MOJIBAKE_MAP[m.group(0)], text)


def canonicalize_url(base: str, link: str) -> str:
    """Canonical absolute URL for a link found on page ``base``.

    Replicates CrawlerCallback.normalize (download.py:987-1004):
    fragment strip, entity/percent unescape, relative resolution against
    the page URL, then removal of leading ``/..`` path segments.

    >>> canonicalize_url('http://example.com', '../abc.html')
    'http://example.com/abc.html'
    >>> canonicalize_url('http://example.com', 'abc.html#link')
    'http://example.com/abc.html'
    >>> canonicalize_url('http://example.com', 'abc.html?a=1&amp;b=2')
    'http://example.com/abc.html?a=1&b=2'
    """
    link, _ = urllib.parse.urldefrag(link)
    link = unescape(link)
    link = urllib.parse.urljoin(base, link)
    while urllib.parse.urlsplit(link).path.startswith("/.."):
        link = link.replace("/..", "", 1)
    return link


def get_domain(url: str) -> str:
    """Registrable domain of ``url`` (the politeness/partition key).

    Replicates common.py:408-429 (doctests common.py:411-415):

    >>> get_domain('http://www.google.com.au/tos.html')
    'google.com.au'
    >>> get_domain('www.google.com')
    'google.com'
    """
    m = _IP_RE.search(url)
    if m:
        return m.group(1)
    host = _SCHEME_RE.sub("", url).partition("/")[0].lower()
    domain: list[str] = []
    for section in host.split("."):
        if section in _DOMAIN_SUFFIXES:
            domain.append(section)
        else:
            domain = [section]
    return ".".join(domain)


def same_domain(url1: str, url2: str) -> bool:
    """Whether two URLs share a registrable domain (common.py:432-442).

    >>> same_domain('http://www.google.com.au', 'code.google.com')
    True
    >>> same_domain('http://www.facebook.com', 'http://www.myspace.com')
    False
    """
    d1, d2 = get_domain(url1), get_domain(url2)
    return bool(d1 and d2 and (d1 in d2 or d2 in d1))


def get_extension(url: str) -> str:
    """Lowercased file extension of the URL path (common.py:397-405).

    >>> get_extension('hello_world.JPG')
    'jpg'
    >>> get_extension('http://www.google-analytics.com/__utm.gif?utmwv=1.3&utmn=420639071')
    'gif'
    """
    import os.path

    return os.path.splitext(urllib.parse.urlsplit(url).path)[-1].lower().replace(".", "")


def is_url(text: str) -> bool:
    """Whether text looks like an absolute http(s) URL (common.py:129-139).

    >>> is_url('abc')
    False
    >>> is_url('http://webscraping.com/blog')
    True
    """
    return re.match("https?://", text) is not None


def is_html(content: str | None) -> bool:
    """Whether content is likely HTML (common.py:119-126)."""
    try:
        return re.search("html|head|body", content) is not None
    except TypeError:
        return False


# ---------------------------------------------------------------------------
# Vectorized (pandas Series) forms — used inside Arrow-batched pandas UDFs.
# ---------------------------------------------------------------------------


def canonicalize_url_series(base: pd.Series, link: pd.Series) -> pd.Series:
    """Vectorized canonicalize_url over aligned Series (UDF body).

    A null base short-circuits to "" without entering the kernel: the
    tiered split (udfs.canonicalize_split) NULL-gates the UDF's inputs for
    rows the JVM tiers already resolved, so in the hot path most rows are
    nulls that must cost only the Arrow transfer. The null scan is
    VECTORIZED (round-6): ``notna`` + ``flatnonzero`` instead of a
    per-row isinstance loop, so an all-null batch costs two C-speed
    passes and one object-array fill — the former Python loop over every
    gated row was a measurable slice of the fused pipeline's Arrow hop
    at 16M rows."""
    import numpy as np

    bv, lv = base.to_numpy(), link.to_numpy()
    out = np.full(len(bv), "", dtype=object)
    for i in np.flatnonzero(base.notna().to_numpy()):
        b = bv[i]
        if isinstance(b, str):  # non-null non-str cannot occur for a
            l = lv[i]           # string column; guard kept for direct use
            out[i] = canonicalize_url(b, l if isinstance(l, str) else "")
    return pd.Series(out, index=base.index, dtype="object")


def get_domain_series(url: pd.Series) -> pd.Series:
    """Vectorized get_domain (UDF body).

    The suffix-trim is per-label and data-dependent, so the fast path is a
    memo over this batch's unique hosts: frontier batches are dominated by
    a few domains, so the dict lookup amortizes the Python cost.
    """
    memo: dict[str, str] = {}
    vals = url.to_numpy()
    out = []
    for u in vals:
        if not isinstance(u, str):
            out.append("")
            continue
        d = memo.get(u)
        if d is None:
            d = memo[u] = get_domain(u)
        out.append(d)
    return pd.Series(out, index=url.index, dtype="object")


def unescape_series(text: pd.Series) -> pd.Series:
    return pd.Series(
        [unescape(t) if isinstance(t, str) else "" for t in text.to_numpy()],
        index=text.index,
        dtype="object",
    )

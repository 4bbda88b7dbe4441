"""Text normalization kernel — scalar string/number helpers with exact
parity to the reference library's documented behavior (citations inline).

Used two ways: directly (driver-side, oracle) and wrapped in Arrow-batched
pandas UDFs (``webscraping_spark.functions.udfs``) for DataFrame columns.
Where a Spark built-in expresses the same semantics (``regexp_replace``,
``initcap``-style chains) the operator layer prefers the built-in and these
serve as the parity oracle.
"""

from __future__ import annotations

import json
import re
import string
from datetime import datetime, timedelta

from webscraping_spark.functions.urlnorm import unescape

# Tags that never contain content (reference common.py:48).
EMPTY_TAGS = ("br", "hr", "meta", "link", "base", "img", "embed", "param", "area", "col", "input")

_EMPTY_TAG_RE = re.compile("<(%s)[^>]*>" % "|".join(EMPTY_TAGS))
_ANY_TAG_RE = re.compile("<[^<]*?>")
_TAG_NAME_RE = re.compile(r"<(\w+?)\W")
_COMMENT_RE = re.compile("<!--.*?-->", re.DOTALL)


def to_ascii(text: str | None) -> str:
    """Keep only ASCII characters (common.py:51-54)."""
    return "".join(c for c in (text or "") if ord(c) < 128)


def to_float(s, default: float = 0.0) -> float:
    """Lenient float parse keeping ``[0-9.-]`` chars (common.py:72-97).

    >>> to_float('90.45')
    90.45
    >>> to_float('')
    0.0
    >>> to_float('..9')
    0.0
    >>> to_float('.9')
    0.9
    >>> to_float(None)
    0.0
    """
    result = default
    if s:
        valid = string.digits + ".-"
        try:
            result = float("".join(c for c in str(s) if c in valid))
        except ValueError:
            pass
    return result


def to_int(s, default: int = 0) -> int:
    """Lenient int parse via to_float (common.py:56-70).

    >>> to_int('90')
    90
    >>> to_int('-90.2432')
    -90
    >>> to_int('a90a')
    90
    >>> to_int('a')
    0
    >>> to_int('a', 90)
    90
    """
    return int(to_float(s, default))


def unique(items: list) -> list:
    """First-occurrence-preserving dedup (common.py:142-156).

    >>> unique([3, 6, 4, 4, 6])
    [3, 6, 4]
    """
    seen = set()
    out = []
    for e in items:
        if e not in seen:
            seen.add(e)
            out.append(e)
    return out


def flatten(lists: list[list]) -> list:
    """Flatten one level (common.py:159-166)."""
    return [item for sub in lists for item in sub]


def nth(items, i: int, default=""):
    """items[i] or default (common.py:169-176)."""
    try:
        return items[i]
    except IndexError:
        return default


def first(items, default=""):
    """items[0] or default (common.py:177-185)."""
    return nth(items, 0, default)


def last(items, default=""):
    """items[-1] or default (common.py:187-190)."""
    return nth(items, -1, default)


def pad(items: list, size: int, default=None, end: bool = True) -> list:
    """Resize list to exactly ``size`` (common.py:193-217).

    >>> pad(list(range(5)), 3)
    [0, 1, 2]
    >>> pad(list(range(5)), 7, -1)
    [0, 1, 2, 3, 4, -1, -1]
    >>> pad(list(range(5)), 7, end=False)
    [None, None, 0, 1, 2, 3, 4]
    """
    items = list(items)
    while len(items) < size:
        items.append(default) if end else items.insert(0, default)
    while len(items) > size:
        items.pop() if end else items.pop(0)
    return items


def remove_tags(html: str, keep_children: bool = True) -> str:
    """Strip HTML tags (common.py:220-238).

    >>> remove_tags('hello <b>world</b>!')
    'hello world!'
    >>> remove_tags('hello <b>world</b>!', False)
    'hello !'
    >>> remove_tags('hello <br>world<br />!', False)
    'hello world!'
    >>> remove_tags('<span><b></b></span>test</span>', False)
    'test'
    """
    html = _EMPTY_TAG_RE.sub("", html)
    if not keep_children:
        for tag in unique(_TAG_NAME_RE.findall(html)):
            if tag not in EMPTY_TAGS:
                html = re.compile(
                    r"<\s*%s.*?>.*?</\s*%s\s*>" % (tag, tag), re.DOTALL
                ).sub("", html)
    return _ANY_TAG_RE.sub("", html)


def normalize(s: str, newlines: bool = False) -> str:
    """remove_tags + unescape + whitespace collapse (common.py:317-334).

    >>> normalize('<span>Tel.:   029&nbsp;-&nbsp;12345678   </span>')
    'Tel.: 029 - 12345678'
    """
    if isinstance(s, str):
        s = unescape(remove_tags(s))
        if newlines:
            s = re.sub("[\n\r]+", "\n", s)
            s = re.sub("[ \t\f\v]+", " ", s)
        else:
            s = re.sub(r"[\s]+", " ", s)
        s = _COMMENT_RE.sub("", s).strip()
    return s


def regex_get(
    html: str,
    pattern: str,
    index: int | None = None,
    normalized: bool = True,
    flag: int = re.DOTALL | re.IGNORECASE,
    default="",
):
    """First-match group extraction with normalization (common.py:337-353).

    >>> regex_get('<div><span>Phone: 029&nbsp;01054609</span><span></span></div>', r'<span>Phone:([^<>]+)')
    '029 01054609'
    """
    m = re.compile(pattern, flag).search(html)
    if m:
        groups = m.groups()
        if len(groups) == 1:
            return normalize(groups[0]) if normalized else groups[0]
        if index is not None:
            return normalize(groups[index]) if normalized else groups[index]
        return [normalize(g) if normalized else g for g in groups]
    return default


def parse_jsonp(s: str):
    """Strip a ``fn(...)`` JSONP wrapper and parse (common.py:356-363)."""
    try:
        left = s.index("(")
        right = s.rindex(")")
    except ValueError:
        return None
    return json.loads(s[left + 1 : right])


def safe(s: str) -> str:
    """URL-safe slug (common.py:366-373).

    >>> safe('U@#$_#^&*-2')
    'U_-2'
    """
    safe_chars = string.ascii_letters + string.digits + "-_ "
    return "".join(c for c in s if c in safe_chars).replace(" ", "-")


def pretty(s: str) -> str:
    """Display-case a slug (common.py:376-382).

    >>> pretty('hello_world')
    'Hello World'
    """
    return re.sub("[-_]", " ", s.title())


def pretty_paragraph(s: str) -> str:
    """Paragraph-preserving prettify (common.py:385-394)."""
    s = re.sub("<(br|hr|/li)[^>]*>", "\n", s)
    s = unescape(remove_tags(s))

    def fixup(m: re.Match) -> str:
        return "\n" if ("\r" in m.group(0) or "\n" in m.group(0)) else " "

    return re.sub(r"\s+", fixup, s).strip()


def pretty_duration(dt) -> str:
    """English description of a timedelta (common.py:445-490).

    >>> pretty_duration(timedelta(seconds=1))
    '1 second'
    >>> pretty_duration(timedelta(hours=1))
    '1 hour'
    >>> pretty_duration(timedelta(days=2))
    '2 days'
    """
    if isinstance(dt, datetime):
        dt = datetime.now() - dt
    if not isinstance(dt, timedelta):
        return ""
    if dt.days >= 2 * 365:
        return "%d years" % int(dt.days / 365)
    if dt.days >= 365:
        return "1 year"
    if dt.days >= 60:
        return "%d months" % int(dt.days / 30)
    if dt.days > 21:
        return "1 month"
    if dt.days >= 14:
        return "%d weeks" % int(dt.days / 7)
    if dt.days >= 7:
        return "1 week"
    if dt.days > 1:
        return "%d days" % dt.days
    if dt.days == 1:
        return "1 day"
    if dt.seconds >= 2 * 60 * 60:
        return "%d hours" % int(dt.seconds / 3600)
    if dt.seconds >= 60 * 60:
        return "1 hour"
    if dt.seconds >= 2 * 60:
        return "%d minutes" % int(dt.seconds / 60)
    if dt.seconds >= 60:
        return "1 minute"
    if dt.seconds > 1:
        return "%d seconds" % dt.seconds
    if dt.seconds == 1:
        return "1 second"
    return ""


_PROXY_RE = re.compile(
    r"((?P<username>\w+):(?P<password>\w+)@)?(?P<host>\d{1,3}.\d{1,3}.\d{1,3}.\d{1,3})(:(?P<port>\d+))?"
)


def parse_proxy(proxy) -> dict:
    """Split ``user:pw@host:port`` into fragments (common.py:493-521).

    >>> f = parse_proxy('login:pw@66.197.208.200:8080')
    >>> (f['username'], f['password'], f['host'], f['port'])
    ('login', 'pw', '66.197.208.200', '8080')
    >>> f = parse_proxy('66.197.208.200')
    >>> f['username'] == f['password'] == f['port'] == ''
    True
    """
    fragments = {"username": "", "password": "", "host": None, "port": ""}
    if isinstance(proxy, str):
        m = _PROXY_RE.match(proxy)
        if m:
            g = m.groupdict()
            fragments["username"] = g.get("username") or ""
            fragments["password"] = g.get("password") or ""
            fragments["host"] = g.get("host")
            fragments["port"] = g.get("port") or ""
    return fragments

"""Pure-Python XPath-subset evaluator over raw HTML strings.

Capability parity with the reference library's regex XPath engine
(xpath.py:25-142, 159-408 — tags, ``//`` descendants, 1-based and negative
``[n]`` indices, ``[@attr=regex]`` filters, ``@attr`` and ``text()`` leaf
steps, balanced-tag string scanning that tolerates unclosed tags), written
fresh for Python 3. One deliberate divergence, documented here: descendant
scans anchor on a word boundary (``<a`` will not match ``<abbr``), where
the reference's prefix regex would.

This is a string kernel, not a relational operator: in the engine it runs
inside Arrow-batched pandas UDFs for caption/link extraction over the
``pages.html`` column (see ``functions.udfs``).
"""

from __future__ import annotations

import re
import sys
from collections.abc import Iterator

from webscraping_spark.functions.textkernel import EMPTY_TAGS, first, remove_tags
from webscraping_spark.functions.urlnorm import same_domain
import urllib.parse

_TAG_OPEN_RE = re.compile(r"<([\w:]+)")
_ATTR_RE = re.compile(r"([\w:-]+)\s*=\s*(\".*?\"|'.*?'|\S+)", re.DOTALL)
_CONTENT_RE = re.compile(r"<.*?>(.*)</.*?>$", re.DOTALL)
_STEP_RE = re.compile(r"(|/|\.\.)/([^/]+)")
_PRED_RE = re.compile(r"\[(.*?)\]")
_BOOL_ATTRS = ("checked", "selected", "required", "multiple", "disabled")


class HtmlPathError(ValueError):
    pass


def parse_path(xpath: str) -> list[tuple[str, str, int | None, list[tuple[str, str | None]]]]:
    """Tokenize an xpath into steps of (separator, tag, index, attr-filters).

    Separator '' means child axis (``/``), '/' means descendant (``//``).
    """
    steps = []
    for separator, token in _STEP_RE.findall(xpath):
        index: int | None = None
        attrs: list[tuple[str, str | None]] = []
        tag = token
        if "[" in token:
            tag = token[: token.find("[")]
            for pred in _PRED_RE.findall(token):
                try:
                    index = int(pred)
                    continue
                except ValueError:
                    pass
                m = re.match(r"@(.*?)=[\"']?(.*?)[\"']?$", pred)
                if m:
                    attrs.append((m.group(1).lower(), m.group(2).lower()))
                    continue
                m = re.match(r"@(.*?)$", pred)
                if not m:
                    raise HtmlPathError("unsupported predicate: " + pred)
                attrs.append((m.group(1).lower(), None))
        steps.append((separator, tag, index, attrs))
    return steps


def _tag_name(html: str) -> str | None:
    m = _TAG_OPEN_RE.match(html)
    return m.group(1) if m else None


def _split_element(html: str) -> tuple[str, str]:
    """Split off the leading element (balanced by tag name) from ``html``.

    Unclosed elements swallow the rest of the input and gain a synthetic
    closing tag, matching the reference scanner's recovery behavior.
    """
    tag = _tag_name(html)
    depth = 0
    end = None
    for m in re.compile("</?%s.*?>" % tag, re.DOTALL | re.IGNORECASE).finditer(html):
        if html[m.start() + 1] == "/":
            depth -= 1
        elif tag in EMPTY_TAGS or html[m.end() - 2] == "/":
            pass  # void or self-closing: never opens a scope
        else:
            depth += 1
        if depth == 0:
            end = m.end()
            break
    if end is None:
        return html + "</%s>" % tag, ""
    return html[:end], html[end:]


def _iter_children(html: str, tag: str) -> Iterator[str]:
    """Yield top-level elements matching ``tag`` ('*' = any)."""
    matched_any = False
    rest = html
    while True:
        m = _TAG_OPEN_RE.search(rest)
        if not m:
            break
        rest = rest[m.start() :]
        element, rest = _split_element(rest)
        if not element:
            break
        if tag.lower() in ("*", (_tag_name(element) or "").lower()):
            matched_any = True
            yield element
    if tag == "tbody" and not matched_any:
        # browsers inject <tbody> into copied xpaths; skip the level
        yield html


def _iter_descendants(html: str, tag: str) -> Iterator[str]:
    if tag == "*":
        raise HtmlPathError("'*' is only supported on the child axis")
    for m in re.compile(r"<%s\b" % tag, re.DOTALL | re.IGNORECASE).finditer(html):
        element, _ = _split_element(html[m.start() :])
        yield element


def element_attributes(element: str) -> dict[str, str | None]:
    """Attribute map of the leading tag of ``element``."""
    open_tag = element.split(">", 1)[0]
    attrs: dict[str, str | None] = {
        name.lower().strip(): value.strip("'\" ")
        for name, value in _ATTR_RE.findall(open_tag)
    }
    for name in re.findall(r"\s+(%s)" % "|".join(_BOOL_ATTRS), open_tag):
        attrs.setdefault(name, None)
        attrs[name] = None
    return attrs


def _attrs_match(wanted: list[tuple[str, str | None]], have: dict[str, str | None]) -> bool:
    for name, value in wanted:
        if name not in have:
            return False
        actual = have[name]
        if value == actual:
            continue
        if value is None or actual is None:
            return False
        if not re.match(value + "$", actual, re.IGNORECASE):
            return False
    return True


def element_content(element: str, default: str = "") -> str:
    m = _CONTENT_RE.match(element)
    return m.group(1) if m else default


def _evaluate(steps: list, html: str, limit: int, at_root: bool) -> list[str]:
    separator, tag, index, attrs = steps[0]
    rest = steps[1:]
    results: list[str] = []

    if tag == "text()":
        return [remove_tags(element_content(html), keep_children=False)]
    if tag.startswith("@"):
        value = element_attributes(html).get(tag[1:].lower(), "")
        return [value if value is not None else ""]

    scope = html if at_root else element_content(html)
    matches = (
        _iter_children(scope, tag) if separator == "" else _iter_descendants(scope, tag)
    )
    if index is not None and index < 0:
        listed = list(matches)
        index += len(listed) + 1
        matches = iter(listed)

    for i, element in enumerate(matches):
        if index is not None and index != i + 1:
            continue
        if attrs and not _attrs_match(attrs, element_attributes(element)):
            continue
        if rest:
            results.extend(_evaluate(rest, element, limit, at_root=False))
        else:
            results.append(element_content(element))
        if len(results) >= limit:
            break
    return results


class Doc:
    """Parsed-page wrapper exposing get/search over the xpath subset.

    >>> doc = Doc('<div>abc<a class="link">LINK 1</a><div><a>LINK 2</a>def</div>abc</div>ghi<div><a>LINK 3</a>jkl</div>')
    >>> doc.search('/div/a')
    ['LINK 1', 'LINK 3']
    >>> doc.search('/div/a[@class="link"]')
    ['LINK 1']
    >>> doc.search('/div[1]//a')
    ['LINK 1', 'LINK 2']
    >>> doc.search('/div/a/@class')
    ['link', '']
    >>> doc.search('/div[-1]/a')
    ['LINK 3']
    >>> Doc('<div><img src="img.png"></div>').get('/div/img/@src')
    'img.png'
    >>> Doc('<div><br><p>content</p></br></div>').get('/div/p')
    'content'
    """

    def __init__(self, html: str, remove: tuple[str, ...] | None = None):
        self.html = strip_tags(html, remove) if remove else html

    def get(self, xpath: str) -> str:
        return first(self._run(xpath, limit=1))

    def search(self, xpath: str) -> list[str]:
        return self._run(xpath, limit=sys.maxsize)

    def _run(self, xpath: str, limit: int) -> list[str]:
        steps = parse_path(xpath)
        if not steps:
            return []
        return _evaluate(steps, self.html, limit, at_root=True)


def strip_tags(html: str, remove: tuple[str, ...] | None) -> str:
    """Remove comments plus whole elements of the given tag names."""
    html = re.compile("<!--.*?-->", re.DOTALL).sub("", html)
    for tag in remove or ():
        html = re.compile("<%s[^>]*?/>" % tag, re.DOTALL | re.IGNORECASE).sub("", html)
        html = re.compile(
            "<%s[^>]*?>.*?</%s>" % (tag, tag), re.DOTALL | re.IGNORECASE
        ).sub("", html)
        html = re.compile("<%s[^>]*?>" % tag, re.DOTALL | re.IGNORECASE).sub("", html)
    return html


def get(html: str, xpath: str, remove: tuple[str, ...] | None = None) -> str:
    """Module-level first-match helper (reference xpath.py:470-473)."""
    return Doc(html, remove=remove).get(xpath)


def search(html: str, xpath: str, remove: tuple[str, ...] | None = None) -> list[str]:
    """Module-level all-matches helper (reference xpath.py:476-478)."""
    return Doc(html, remove=remove).search(xpath)


_JS_HREF_RE = re.compile("location.href ?= ?['\"](.*?)['\"]")


def get_links(html: str, url: str | None = None, local: bool = True, external: bool = True) -> list[str]:
    """All page links: a/@href + iframe/@src + JS location.href, scheme-
    filtered, fragment-stripped, resolved against ``url``, first-occurrence
    deduped (reference xpath.py:515-555).
    """

    def normalize_link(link: str) -> str | None:
        if urllib.parse.urlsplit(link).scheme not in ("http", "https", ""):
            return None  # mailto:, javascript:, etc.
        if "#" in link:
            link = link[: link.index("#")]
        if url:
            link = urllib.parse.urljoin(url, link)
            if not local and same_domain(url, link):
                return None
            if not external and not same_domain(url, link):
                return None
        return link

    candidates = search(html, "//a/@href") + search(html, "//iframe/@src") + _JS_HREF_RE.findall(html)
    links: list[str] = []
    for raw in candidates:
        link = normalize_link(raw)
        if link and link not in links:
            links.append(link)
    return links

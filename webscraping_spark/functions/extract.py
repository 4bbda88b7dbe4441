"""Content extraction kernel: emails, phones, excerpts, addresses, geo math,
JSON paths, deterministic user agents.

Scalar parity functions for the reference's ``alg`` module (citations
inline); the engine applies them to DataFrame columns through the pandas
UDFs in ``functions.udfs`` — or, where Spark built-ins express the same
thing (``regexp_extract_all`` chains), through those.
"""

from __future__ import annotations

import math
import re

from webscraping_spark.functions import htmlpath
from webscraping_spark.functions.textkernel import remove_tags
from webscraping_spark.functions.urlnorm import MEDIA_EXTENSIONS, unescape

IGNORED_EMAILS = ("username@location.com", "johndoe@domain.com")

_EMAIL_RE = re.compile(r"([\w\.\-\+]{1,64})@(\w[\w\.-]{1,255})\.(\w+)")
_OBFUSCATED_EMAIL_RE = re.compile(
    r"([\w\.\-\+]{1,64})\s?.?AT.?\s?([\w\.-]{1,255})\s?.?DOT.?\s?(\w+)", re.IGNORECASE
)
_COMMENT_RE = re.compile("<!--.*?-->", re.DOTALL)
_PHONE_RE = re.compile(r"(\+\d{1,2}\s)?\(?\d{3}\)?[\s.-]\d{3}[\s.-]\d{4}")
_TEL_RE = re.compile(r"tel:(\d+)")
_DIGIT_RE = re.compile(r"\d")


def _email_ok(domain: str, ext: str) -> bool:
    return (
        ext.lower() not in MEDIA_EXTENSIONS
        and len(ext) >= 2
        and not _DIGIT_RE.search(ext)
        and domain.count(".") <= 3
    )


def extract_emails(html: str | None, ignored=IGNORED_EMAILS) -> list[str]:
    """De-obfuscate and extract emails (reference alg.py:29-65).

    >>> extract_emails('')
    []
    >>> extract_emails('hello contact@webscraping.com world')
    ['contact@webscraping.com']
    >>> extract_emails('hello contact@<!-- trick comment -->webscraping.com world')
    ['contact@webscraping.com']
    >>> extract_emails('hello contact AT webscraping DOT com world')
    ['contact@webscraping.com']
    >>> extract_emails(' info+hn@gmail.com ')
    ['info+hn@gmail.com']
    >>> extract_emails('<a href="mailto:first.last@mail.co.uk">Contact</a>')
    ['first.last@mail.co.uk']
    """
    emails: list[str] = []
    if html:
        html = _COMMENT_RE.sub("", html).replace("mailto:", "")
        for pattern in (_EMAIL_RE, _OBFUSCATED_EMAIL_RE):
            for user, domain, ext in pattern.findall(html):
                if _email_ok(domain, ext):
                    email = "%s@%s.%s" % (user, domain, ext)
                    if email not in emails:
                        emails.append(email)
    return [e for e in emails if e not in ignored]


def extract_phones(html: str) -> list[str]:
    """Extract phone numbers (reference alg.py:68-82).

    >>> extract_phones('Phone: (123) 456-7890 <br>')
    ['(123) 456-7890']
    >>> extract_phones('+1-123-456-7890<br />123 456 7890n')
    ['123-456-7890', '123 456 7890']
    >>> extract_phones('456-7890')
    []
    >>> extract_phones('<a href="tel:0234673460">Contact</a>')
    ['0234673460']
    """
    return [m.group() for m in _PHONE_RE.finditer(html)] + _TEL_RE.findall(html)


def get_excerpt(html: str, try_meta: bool = False, max_chars: int = 255) -> str:
    """Largest text block, or meta description (reference alg.py:7-25)."""
    excerpt = ""
    if try_meta:
        excerpt = htmlpath.get(html, '/html/head/meta[@name="description"]/@content')
    if not excerpt:
        bad_tags = ("hr", "br", "script", "h1", "h2", "h3", "h4", "h5", "h6")
        content = remove_tags(htmlpath.get(html, "/html/body", remove=bad_tags))
        if content:
            excerpt = max((len(p.strip()), p) for p in content.splitlines())[1]
    return unescape(excerpt.strip())[:max_chars]


def parse_us_address(address: str) -> tuple[str, str, str, str]:
    """Split a US address into (address, city, state, zip) (alg.py:85-105).

    >>> parse_us_address('6200 20th Street, Vero Beach, FL 32966')
    ('6200 20th Street', 'Vero Beach', 'FL', '32966')
    """
    city = state = zipcode = ""
    addrs = [x.strip() for x in address.split(",")]
    if addrs:
        m = re.search(r"([A-Z]{2,})\s*(\d[\d\-\s]+\d)", addrs[-1])
        if m:
            state = m.group(1).strip()
            zipcode = m.group(2).strip()
            if len(addrs) >= 3:
                city = addrs[-2].strip()
                address = ",".join(addrs[:-2])
            else:
                address = ",".join(addrs[:-1])
    return address, city, state, zipcode


def get_earth_radius(scale: str | None) -> float:
    if scale is None:
        return 1.0
    if scale == "km":
        return 6373.0
    if scale == "miles":
        return 3960.0
    raise ValueError("Invalid scale: %s" % scale)


def distance(p1: tuple[float, float], p2: tuple[float, float], scale: str | None = None) -> float:
    """Great-circle distance via spherical law of cosines (alg.py:119-157).

    >>> melbourne = -37.7833, 144.9667
    >>> san_francisco = 37.7750, -122.4183
    >>> int(distance(melbourne, san_francisco, 'km'))
    12659
    """
    if p1 == p2:
        return 0
    lat1, lng1 = p1
    lat2, lng2 = p2
    d2r = math.pi / 180.0
    phi1 = (90.0 - lat1) * d2r
    phi2 = (90.0 - lat2) * d2r
    cos = math.sin(phi1) * math.sin(phi2) * math.cos((lng1 - lng2) * d2r) + math.cos(
        phi1
    ) * math.cos(phi2)
    return math.acos(cos) * get_earth_radius(scale)


def move_coordinate(lat: float, lng: float, ch_lat: float, ch_lng: float, ch_scale: str | None = None):
    """Shift a lat/lng by a distance increment (alg.py:172-178)."""
    r = get_earth_radius(ch_scale)
    new_lat = lat + (ch_lat / r) * (180 / math.pi)
    new_lng = lng + (ch_lng / r) * (180 / math.pi) / math.cos(lat * math.pi / 180.0)
    return new_lat, new_lng


def find_coordinates(
    ch_lat: float = 100,
    ch_lng: float = 100,
    ch_scale: str = "miles",
    min_lat: float = -90,
    max_lat: float = 90,
    min_lng: float = -180,
    max_lng: float = 180,
):
    """Lat/lng lattice over a bounding box (alg.py:160-169)."""
    cur_lat = min_lat
    while cur_lat < max_lat:
        cur_lng = min_lng
        while cur_lng < max_lng:
            yield cur_lat, cur_lng
            _, cur_lng = move_coordinate(cur_lat, cur_lng, 0, ch_lng, ch_scale)
        cur_lat, _ = move_coordinate(cur_lat, cur_lng, ch_lat, 0, ch_scale)


def thin_locations(rows, min_distance: float = 100, scale: str = "miles"):
    """Greedy keep-if-far-from-all-kept thinning (alg.py:187-200).

    Order-dependent sequential scan — inherently non-parallel; the engine
    runs it driver-side on collected rows (inputs are small by contract).
    ``rows`` is an iterable of (key, lat, lng).
    """
    if min_distance <= 0:
        yield from rows
        return
    kept: list[tuple[float, float]] = []
    for key, lat, lng in rows:
        lat_f, lng_f = float(lat), float(lng)
        if all(
            distance((lat_f, lng_f), other, scale=scale) >= min_distance
            for other in kept
        ):
            kept.append((lat_f, lng_f))
            yield key, lat, lng


def find_json_path(e, value, path: str = "") -> list[str]:
    """Paths in nested JSON that point at ``value`` (alg.py:203-217)."""
    results = []
    if e == value:
        results.append(path)
    if isinstance(e, dict):
        for k, v in e.items():
            results.extend(find_json_path(v, value, '{}["{}"]'.format(path, k)))
    elif isinstance(e, list):
        for i, v in enumerate(e):
            results.extend(find_json_path(v, value, "{}[{}]".format(path, i)))
    return results


# --- deterministic user-agent synthesis ------------------------------------
# The reference composes OS x browser templates with random.choice
# (alg.py:223-258); randomness is incidental (doctests never pin it), so the
# engine derives the choice from a hash of the URL for reproducibility.

_UA_TEMPLATES = (
    "Mozilla/5.0 (X11; Linux x86_64; rv:24.0) Gecko/20100101 Firefox/24.0",
    "Mozilla/5.0 (X11; Ubuntu; Linux i686; rv:21.0) Gecko/20100101 Firefox/21.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10.9; rv:25.0) Gecko/20100101 Firefox/25.0",
    "Mozilla/5.0 (Windows NT 6.1; Win64; x64; rv:23.0) Gecko/20100101 Firefox/23.0",
    "Mozilla/5.0 (compatible; MSIE 9.0; Windows NT 6.1; WOW64; Trident/5.0)",
    "Mozilla/5.0 (compatible; MSIE 10.0; Windows NT 6.2; Trident/6.0)",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/31.0.1650.4 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10.8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/29.0.1547.2 Safari/537.36",
    "Mozilla/5.0 (Windows NT 6.1; WOW64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/30.0.1599.6 Safari/537.36",
)


def agent_for(key: str) -> str:
    """Deterministic user agent for a key (url/proxy)."""
    import zlib

    return _UA_TEMPLATES[zlib.crc32(key.encode("utf-8")) % len(_UA_TEMPLATES)]


# ---------------------------------------------------------------------------
# Geocode-API JSON: status gate + address flattening
# (GoogleMaps.load_result download.py:703-726; parse_location 729-765)
# ---------------------------------------------------------------------------

import json as _json

# component type -> flat field(s); abbrev (short_name) variants get _code
_COMPONENT_FIELDS = {
    "street_number": ("number", None),
    "route": ("street", None),
    "postal_code": ("postcode", None),
    "locality": ("suburb", None),
    "administrative_area_level_1": ("state", "state_code"),
    "administrative_area_level_2": ("county", None),
    "administrative_area_level_3": ("district", None),
    "country": ("country", "country_code"),
}


def load_result(html: str | None) -> dict:
    """Parse an API response, returning the payload only when the JSON is
    well formed AND status == 'OK' (download.py:703-726). 'ZERO_RESULTS',
    quota and denial statuses all yield {} — the status routing (re-try
    later for OVER_QUERY_LIMIT via cache-clear) is the caller's move, as in
    the reference."""
    if html:
        try:
            data = _json.loads(html)
        except ValueError:
            return {}
        if isinstance(data, dict) and data.get("status") == "OK":
            return data
    return {}


def parse_location(result: dict) -> dict:
    """Flatten a geocoding result's address_components (download.py:729-765):
    one flat string field per component type, state/country keep their
    short_name as *_code, address = number + street when a street exists."""
    out: dict = {}
    for comp in result.get("address_components", []):
        types = comp.get("types", [])
        for t, (field, code_field) in _COMPONENT_FIELDS.items():
            if t in types:
                out[field] = comp.get("long_name", "")
                if code_field:
                    out[code_field] = comp.get("short_name", "")
    out["full_address"] = result.get("formatted_address", "")
    if "street" in out:
        out["address"] = (out.get("number", "") + " " + out["street"]).strip()
    loc = result.get("geometry", {}).get("location", {})
    out["lat"] = loc.get("lat")
    out["lng"] = loc.get("lng")
    out["types"] = result.get("types", [])
    return out


GEOCODE_SCHEMA = (
    "status string, formatted_address string, "
    "address_components array<struct<long_name string, short_name string, "
    "types array<string>>>, "
    "geometry struct<location struct<lat double, lng double>>, "
    "types array<string>"
)


def geocode_flatten_cols(json_col):
    """Spark-native twin: from_json with GEOCODE_SCHEMA, status-gated, then
    the same flat projection as parse_location — pure JVM (higher-order
    `filter` over the components array), no UDF."""
    from pyspark.sql import functions as F

    parsed = F.from_json(json_col, GEOCODE_SCHEMA)
    ok = parsed["status"] == "OK"

    def comp(type_name, field="long_name"):
        match = F.filter(
            parsed["address_components"],
            lambda c: F.array_contains(c["types"], type_name),
        )
        return F.when(ok & (F.size(match) > 0), match[0][field])

    number = comp("street_number")
    street = comp("route")
    cols = {
        "number": number,
        "street": street,
        "postcode": comp("postal_code"),
        "suburb": comp("locality"),
        "state": comp("administrative_area_level_1"),
        "state_code": comp("administrative_area_level_1", "short_name"),
        "county": comp("administrative_area_level_2"),
        "district": comp("administrative_area_level_3"),
        "country": comp("country"),
        "country_code": comp("country", "short_name"),
        "full_address": F.when(ok, parsed["formatted_address"]),
        "address": F.when(
            street.isNotNull(),
            F.trim(F.concat(F.coalesce(number, F.lit("")), F.lit(" "), street)),
        ),
        "lat": F.when(ok, parsed["geometry"]["location"]["lat"]),
        "lng": F.when(ok, parsed["geometry"]["location"]["lng"]),
    }
    return cols

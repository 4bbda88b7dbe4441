"""Golden tests transcribed verbatim from the reference library's doctests
(the reference is Python 2 and not executable here; its doctest text is the
behavioral spec — SURVEY.md §5). Each assertion cites the doctest it
transcribes.
"""

from datetime import timedelta

import pytest

from webscraping_spark.functions import (
    canonicalize_url,
    first,
    flatten,
    get_domain,
    get_extension,
    is_url,
    normalize,
    pad,
    pretty,
    pretty_duration,
    regex_get,
    remove_tags,
    safe,
    same_domain,
    to_float,
    to_int,
    unescape,
    unique,
)
from webscraping_spark.functions import htmlpath
from webscraping_spark.functions.extract import (
    distance,
    extract_emails,
    extract_phones,
    parse_us_address,
)
from webscraping_spark.functions.textkernel import parse_proxy


class TestCanonicalizeUrl:
    """CrawlerCallback.normalize doctests (download.py:990-996)."""

    def test_parent_directory(self):
        assert canonicalize_url("http://example.com", "../abc.html") == "http://example.com/abc.html"

    def test_fragment_strip(self):
        assert canonicalize_url("http://example.com", "abc.html#link") == "http://example.com/abc.html"

    def test_entity_unescape(self):
        assert (
            canonicalize_url("http://example.com", "abc.html?a=1&amp;b=2")
            == "http://example.com/abc.html?a=1&b=2"
        )

    def test_absolute_link_passthrough(self):
        assert canonicalize_url("http://example.com/a/b", "http://other.com/x") == "http://other.com/x"

    def test_relative_resolution(self):
        assert canonicalize_url("http://example.com/a/b.html", "c.html") == "http://example.com/a/c.html"


class TestUrlPredicates:
    def test_is_url(self):  # common.py:132-138
        assert not is_url("abc")
        assert not is_url("webscraping.com")
        assert is_url("http://webscraping.com/blog")

    def test_get_domain(self):  # common.py:411-415
        assert get_domain("http://www.google.com.au/tos.html") == "google.com.au"
        assert get_domain("www.google.com") == "google.com"

    def test_get_domain_ip(self):  # common.py:416-419 IP shortcut
        assert get_domain("http://192.168.1.1/path") == "192.168.1.1"

    def test_same_domain(self):  # common.py:435-438
        assert same_domain("http://www.google.com.au", "code.google.com")
        assert not same_domain("http://www.facebook.com", "http://www.myspace.com")

    def test_get_extension(self):  # common.py:400-404
        assert get_extension("hello_world.JPG") == "jpg"
        assert (
            get_extension("http://www.google-analytics.com/__utm.gif?utmwv=1.3&utmn=420639071")
            == "gif"
        )


class TestTextKernel:
    def test_to_int(self):  # common.py:59-68
        assert to_int("90") == 90
        assert to_int("-90.2432") == -90
        assert to_int("a90a") == 90
        assert to_int("a") == 0
        assert to_int("a", 90) == 90

    def test_to_float(self):  # common.py:75-89
        assert to_float("90.45") == 90.45
        assert to_float("") == 0.0
        assert to_float("90") == 90.0
        assert to_float("..9") == 0.0
        assert to_float(".9") == 0.9
        assert to_float(None) == 0.0
        assert to_float(1) == 1.0

    def test_remove_tags(self):  # common.py:224-231
        assert remove_tags("hello <b>world</b>!") == "hello world!"
        assert remove_tags("hello <b>world</b>!", False) == "hello !"
        assert remove_tags("hello <br>world<br />!", False) == "hello world!"
        assert remove_tags("<span><b></b></span>test</span>", False) == "test"

    def test_unescape(self):  # common.py:244-246
        assert unescape("&lt;hello&nbsp;&amp;%20world&gt;") == "<hello & world>"

    def test_normalize(self):  # common.py:320-322
        assert normalize("<span>Tel.:   029&nbsp;-&nbsp;12345678   </span>") == "Tel.: 029 - 12345678"

    def test_regex_get(self):  # common.py:340-343
        html = "<div><span>Phone: 029&nbsp;01054609</span><span></span></div>"
        assert regex_get(html, r"<span>Phone:([^<>]+)") == "029 01054609"
        assert regex_get(html, r"<span>Phone:\s*(\d+)&nbsp;(\d+)") == ["029", "01054609"]

    def test_safe_pretty(self):  # common.py:369-371, 379-381
        assert safe("U@#$_#^&*-2") == "U_-2"
        assert pretty("hello_world") == "Hello World"

    def test_pad(self):  # common.py:198-205
        assert pad(list(range(5)), 5) == [0, 1, 2, 3, 4]
        assert pad(list(range(5)), 3) == [0, 1, 2]
        assert pad(list(range(5)), 7, -1) == [0, 1, 2, 3, 4, -1, -1]
        assert pad(list(range(5)), 7, end=False) == [None, None, 0, 1, 2, 3, 4]

    def test_unique_flatten_first(self):  # common.py:145-150, 162-164, 179-182
        assert unique([3, 6, 4, 4, 6]) == [3, 6, 4]
        assert unique([]) == []
        assert unique([3, 6, 4]) == [3, 6, 4]
        assert flatten([[1, 2, 3], [4, 5, 6]]) == [1, 2, 3, 4, 5, 6]
        assert first([1, 2, 3]) == 1
        assert first([], None) is None

    def test_pretty_duration(self):  # common.py:448-454
        assert pretty_duration(timedelta(seconds=1)) == "1 second"
        assert pretty_duration(timedelta(hours=1)) == "1 hour"
        assert pretty_duration(timedelta(days=2)) == "2 days"

    def test_parse_proxy(self):  # common.py:497-510
        f = parse_proxy("login:pw@66.197.208.200:8080")
        assert (f["username"], f["password"], f["host"], f["port"]) == (
            "login",
            "pw",
            "66.197.208.200",
            "8080",
        )
        f = parse_proxy("66.197.208.200")
        assert f["username"] == f["password"] == f["port"] == ""
        assert f["host"] == "66.197.208.200"


class TestExtract:
    def test_extract_emails(self):  # alg.py:35-47
        assert extract_emails("") == []
        assert extract_emails("hello contact@webscraping.com world") == ["contact@webscraping.com"]
        assert extract_emails("hello contact@<!-- trick comment -->webscraping.com world") == [
            "contact@webscraping.com"
        ]
        assert extract_emails("hello contact AT webscraping DOT com world") == [
            "contact@webscraping.com"
        ]
        assert extract_emails(" info+hn@gmail.com ") == ["info+hn@gmail.com"]
        assert extract_emails('<a href="mailto:first.last@mail.co.uk">Contact</a>') == [
            "first.last@mail.co.uk"
        ]

    def test_extract_phones(self):  # alg.py:71-80
        assert extract_phones("Phone: (123) 456-7890 <br>") == ["(123) 456-7890"]
        assert extract_phones("Phone 123.456.7890 ") == ["123.456.7890"]
        assert extract_phones("+1-123-456-7890<br />123 456 7890n") == [
            "123-456-7890",
            "123 456 7890",
        ]
        assert extract_phones("456-7890") == []
        assert extract_phones('<a href="tel:0234673460">Contact</a>') == ["0234673460"]

    def test_parse_us_address(self):  # alg.py:88-90
        assert parse_us_address("6200 20th Street, Vero Beach, FL 32966") == (
            "6200 20th Street",
            "Vero Beach",
            "FL",
            "32966",
        )

    def test_distance(self):  # alg.py:126-129
        melbourne = -37.7833, 144.9667
        san_francisco = 37.7750, -122.4183
        assert int(distance(melbourne, san_francisco, "km")) == 12659


class TestHtmlPath:
    """Doc doctests (xpath.py:33-61) against our fresh evaluator."""

    HTML = (
        '<div>abc<a class="link">LINK 1</a><div><a>LINK 2</a>def</div>abc</div>'
        "ghi<div><a>LINK 3</a>jkl</div>"
    )

    def test_child_axis(self):
        assert htmlpath.search(self.HTML, "/div/a") == ["LINK 1", "LINK 3"]

    def test_attribute_filter(self):
        assert htmlpath.search(self.HTML, '/div/a[@class="link"]') == ["LINK 1"]

    def test_index_then_descendants(self):
        assert htmlpath.search(self.HTML, "/div[1]//a") == ["LINK 1", "LINK 2"]

    def test_attribute_projection(self):
        assert htmlpath.search(self.HTML, "/div/a/@class") == ["link", ""]

    def test_negative_index(self):
        assert htmlpath.search(self.HTML, "/div[-1]/a") == ["LINK 3"]

    def test_unicode_get(self):
        assert htmlpath.get('<a href="http://www.google.com" class="flink">google</a>', '//a[@class="flink"]') == "google"

    def test_first_instance_large(self):
        assert htmlpath.get("<div><span>content</span></div>" * 10000, "//span") == "content"

    def test_self_closing_attr(self):
        assert htmlpath.get('<div><img src="img.png"></div>', "/div/img/@src") == "img.png"

    def test_after_self_closing(self):
        assert htmlpath.get("<div><br><p>content</p></br></div>", "/div/p") == "content"

    def test_get_links(self):  # xpath.py:515-555 semantics
        html = (
            '<a href="/a">A</a><a href="b#frag">B</a><a href="mailto:x@y.com">M</a>'
            '<iframe src="/frame"></iframe><script>location.href = "/js"</script>'
            '<a href="/a">dup</a>'
        )
        assert htmlpath.get_links(html, url="http://example.com/") == [
            "http://example.com/a",
            "http://example.com/b",
            "http://example.com/frame",
            "http://example.com/js",
        ]


@pytest.mark.parametrize(
    "base,link,expected",
    [
        # extra canonicalization edges derived from download.py:987-1004
        ("http://example.com/x/", "%7Euser/page.html", "http://example.com/x/~user/page.html"),
        ("http://example.com", "/../../top.html", "http://example.com/top.html"),
        ("http://example.com/a", "", "http://example.com/a"),
    ],
)
def test_canonicalize_edges(base, link, expected):
    assert canonicalize_url(base, link) == expected


class TestGeocodeJson:
    """load_result status gate (download.py:703-726) + parse_location
    flattening (download.py:729-765), kernel and Spark twin."""

    RESULT = {
        "status": "OK",
        "formatted_address": "48 Pirrama Rd, Pyrmont NSW 2009, Australia",
        "address_components": [
            {"long_name": "48", "short_name": "48", "types": ["street_number"]},
            {"long_name": "Pirrama Road", "short_name": "Pirrama Rd", "types": ["route"]},
            {"long_name": "Pyrmont", "short_name": "Pyrmont", "types": ["locality", "political"]},
            {"long_name": "New South Wales", "short_name": "NSW",
             "types": ["administrative_area_level_1", "political"]},
            {"long_name": "Australia", "short_name": "AU", "types": ["country", "political"]},
            {"long_name": "2009", "short_name": "2009", "types": ["postal_code"]},
        ],
        "geometry": {"location": {"lat": -33.866651, "lng": 151.195827}},
        "types": ["street_address"],
    }

    def test_load_result_status_gate(self):
        import json

        from webscraping_spark.functions.extract import load_result

        assert load_result(json.dumps(self.RESULT))["status"] == "OK"
        assert load_result(json.dumps({"status": "ZERO_RESULTS"})) == {}
        assert load_result(json.dumps({"status": "OVER_QUERY_LIMIT"})) == {}
        assert load_result("not json {") == {}
        assert load_result(None) == {}
        assert load_result("") == {}

    def test_parse_location_flattens(self):
        from webscraping_spark.functions.extract import parse_location

        flat = parse_location(self.RESULT)
        assert flat["address"] == "48 Pirrama Road"
        assert flat["state"] == "New South Wales" and flat["state_code"] == "NSW"
        assert flat["country"] == "Australia" and flat["country_code"] == "AU"
        assert flat["postcode"] == "2009" and flat["suburb"] == "Pyrmont"
        assert flat["lat"] == -33.866651 and flat["lng"] == 151.195827
        assert flat["full_address"].startswith("48 Pirrama Rd")

    def test_spark_twin_matches_kernel(self, spark):
        import json

        from pyspark.sql import functions as F

        from webscraping_spark.functions.extract import (
            geocode_flatten_cols,
            parse_location,
        )

        df = spark.createDataFrame([(json.dumps(self.RESULT),)], "payload string")
        cols = geocode_flatten_cols(F.col("payload"))
        row = df.select(
            *[cols[k].alias(k) for k in ("address", "state", "state_code",
                                          "country", "country_code", "postcode",
                                          "suburb", "full_address", "lat", "lng")]
        ).first()
        flat = parse_location(self.RESULT)
        for k in ("state", "state_code", "country", "country_code",
                  "postcode", "suburb", "full_address", "lat", "lng"):
            assert row[k] == flat[k], k
        assert row["address"] == flat["address"]

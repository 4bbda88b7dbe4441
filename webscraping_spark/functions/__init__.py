"""Pure-Python/pandas string + URL kernel and its Spark pandas-UDF bindings.

The scalar functions here replicate, bit-for-bit, the behaviors the
reference library documents in its doctests (see each function's
docstring for the file:line citation). The `*_series` variants are the
vectorized forms used inside Arrow-batched pandas UDFs — no per-row
Python ever crosses the JVM boundary.
"""

from webscraping_spark.functions.urlnorm import (  # noqa: F401
    MEDIA_EXTENSIONS,
    canonicalize_url,
    get_domain,
    get_extension,
    is_html,
    is_url,
    same_domain,
    unescape,
)
from webscraping_spark.functions.textkernel import (  # noqa: F401
    EMPTY_TAGS,
    first,
    flatten,
    last,
    normalize,
    nth,
    pad,
    parse_jsonp,
    parse_proxy,
    pretty,
    pretty_duration,
    regex_get,
    remove_tags,
    safe,
    to_ascii,
    to_float,
    to_int,
    unique,
)

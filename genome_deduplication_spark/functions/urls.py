"""URL canonicalization: the identity-key normalizer for webtext dedup.

The pipeline's exact tier keys on byte-identical ``url`` (S2/D4); real
crawls carry the same resource under trivially different URLs —
fragments, default ports, tracking params, case-variant hosts, trailing
slashes. Canonicalization folds those variants BEFORE identity keying,
exactly as the reference folds case and ambiguity variants into one
canonical sequence form before k-mer keying (P1, code/dedup2.py:467-468).

Pure JVM column expressions (regexp + string algebra — no UDF, no
python): one codegen Project, zero shuffle, safe to apply inline at the
scan at any corpus size.

Rules (documented contract, in application order):
  1. strip the fragment (#...)
  2. lowercase scheme + host (path stays case-sensitive)
  3. drop default ports (:80 for http, :443 for https)
  4. drop tracking query params (utm_*, gclid, fbclid, ref), keep the
     rest in their original order, drop a now-empty '?'
  5. collapse duplicate slashes in the path (//a//b -> /a/b)
  6. drop a single trailing slash on a non-root path
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonicalize_url"]

_TRACKING = r"(utm_[a-z]+|gclid|fbclid|ref)=[^&#]*"


def canonicalize_url(url: Column) -> Column:
    # 1. fragment
    u = F.regexp_replace(url, r"#.*$", "")
    # 2. lowercase scheme://host[:port] (group 1), keep the rest (group 2)
    scheme_host = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    u = F.concat(scheme_host, rest)
    # 3. default ports
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443(?=[/?#]|$)", r"$1")
    # 4. tracking params — '&'-prefixed occurrences FIRST (one pass kills
    #    every non-leading tracker, so runs like ?gclid=..&fbclid=..&id=1
    #    reduce correctly), then the leading '?tracker&' / lone '?tracker'
    u = F.regexp_replace(u, r"&" + _TRACKING, "")
    u = F.regexp_replace(u, r"\?" + _TRACKING + r"&", "?")
    u = F.regexp_replace(u, r"\?" + _TRACKING + r"$", "")
    # 5. duplicate slashes in the path only (not the scheme's //)
    u = F.regexp_replace(u, r"(?<!:)/{2,}", "/")
    # 6. trailing slash on a non-root path (end of url or just before '?')
    u = F.regexp_replace(u, r"(://[^/?#]+/.+?)/$", r"$1")
    u = F.regexp_replace(u, r"(://[^/?#]+/.+?)/\?", r"$1?")
    return u

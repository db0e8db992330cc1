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
  5. collapse duplicate slashes in the path (//a//b -> /a/b) — the path
     ONLY: slashes inside the query string are values, not structure
  6. drop a single trailing slash on a non-root path (again path only —
     '?next=/p/' keeps its value intact)

Expression-size note: the query is split off FIRST, directly on the
(cheap) fragment-stripped column, and the path/query rule chains run on
their own sides before one final concat. Splitting at the END instead
(substr over the fully-rewritten tree) re-embeds the whole rules-1-4
expression ~6x; combined with the null-rejecting isnotnull() filter that
joins push below the projection, that blew past janino's method limit
and knocked the identity-fold hot path out of whole-stage codegen
(observed: CodeGenerator compile errors + interpreted fallback).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonicalize_url"]

_TRACKING = r"(utm_[a-z]+|gclid|fbclid|ref)=[^&#]*"


def canonicalize_url(url: Column) -> Column:
    # 1. fragment
    u0 = F.regexp_replace(url, r"#.*$", "")
    # split query off the small tree ('?' cannot occur in scheme/host/path)
    path = F.regexp_replace(u0, r"\?.*$", "")
    query = F.regexp_extract(u0, r"(\?.*)$", 1)  # '' when absent
    # 2. lowercase scheme://host[:port] (group 1), keep the rest (group 2)
    scheme_host = F.lower(
        F.regexp_extract(path, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    )
    rest = F.regexp_replace(path, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    p = F.concat(scheme_host, rest)
    # 3. default ports
    p = F.regexp_replace(p, r"^(http://[^/]*):80(?=/|$)", r"$1")
    p = F.regexp_replace(p, r"^(https://[^/]*):443(?=/|$)", r"$1")
    # 5. duplicate slashes in the path (not the scheme's //)
    p = F.regexp_replace(p, r"(?<!:)/{2,}", "/")
    # 6. trailing slash on a non-root path
    p = F.regexp_replace(p, r"(://[^/]+/.+?)/$", r"$1")
    # 4. tracking params — '&'-prefixed occurrences FIRST (one pass kills
    #    every non-leading tracker, so runs like ?gclid=..&fbclid=..&id=1
    #    reduce correctly), then the leading '?tracker&' / lone '?tracker'
    q = F.regexp_replace(query, r"&" + _TRACKING, "")
    q = F.regexp_replace(q, r"\?" + _TRACKING + r"&", "?")
    q = F.regexp_replace(q, r"\?" + _TRACKING + r"$", "")
    return F.concat(p, q)

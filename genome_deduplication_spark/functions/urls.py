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
    # 5+6 apply to the PATH only — not the scheme's // and not the query
    #    string, where slashes are data ('?next=//partner.example/x' names a
    #    different redirect target than '?next=/partner.example/x', and
    #    '?next=/p/' a different value than '?next=/p'; rewriting there
    #    would fold genuinely distinct pages into one identity). Split at
    #    the first '?', rewrite left of it only, re-concat.
    qpos = F.instr(u, "?")
    path_part = F.when(qpos > 0, F.substr(u, F.lit(1), qpos - 1)).otherwise(u)
    query_part = F.when(qpos > 0, F.substr(u, qpos)).otherwise(F.lit(""))
    # 5. duplicate slashes in the path (//a//b -> /a/b)
    p = F.regexp_replace(path_part, r"(?<!:)/{2,}", "/")
    # 6. trailing slash on a non-root path
    p = F.regexp_replace(p, r"(://[^/?#]+/.+?)/$", r"$1")
    return F.concat(p, query_part)

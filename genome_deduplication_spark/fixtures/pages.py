"""Seeded synthetic `pages` corpora with planted duplicate structure.

Mirrors the reference's hand-planted FASTA fixtures
(tests/test-data/dummy_*.fa — internal repeat, NN block, leading/trailing N)
at web-text scale, per FIXTURES.md §2:

  fx_exact            verbatim copies under different urls/timestamps
  fx_near             1-5% token edits of a base doc
  fx_substring        pairs sharing one long common substring
  fx_internal_repeat  docs repeating their own block (no cross-doc pair)
  fx_ambiguous        empty/whitespace/control-char docs (the N analogue)
  fx_boilerplate      shared header/footer, distinct bodies (LSH hot bucket)
  fx_unique           fully distinct docs (false-positive control)
  fx_mixed            union of all, shuffled

Ground truth emitted alongside: truth_pairs(url_a, url_b, kind) with
url_a < url_b, and truth_clusters(url, cluster_id) where cluster_id is the
min (warc_ts, url) url of the duplicate group (election rule D4).

Pure Python + stdlib random — the generator itself is not a Spark job, the
output is handed to spark.createDataFrame (tests) or written to parquet
(bench). Deterministic for a given (seed, sizes).
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass, field

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber basil cedar dahlia elm fennel ginger hazel iris "
    "jasmine kale laurel maple nettle olive poplar quince rowan sage thyme "
    "umber violet willow yarrow zinnia anchor beacon cobble dynamo ember "
    "flume gable harbor inlet jetty keel lantern mast nexus oar prow quay "
    "rudder sail tiller"
).split()

_LANGS = ["en", "en", "en", "es", "de", "fr"]

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


@dataclass
class Corpus:
    rows: list[dict] = field(default_factory=list)  # url, warc_ts, html, text, lang
    truth_pairs: list[dict] = field(default_factory=list)  # url_a, url_b, kind
    truth_clusters: list[dict] = field(default_factory=list)  # url, cluster_id

    def extend(self, other: "Corpus") -> None:
        self.rows.extend(other.rows)
        self.truth_pairs.extend(other.truth_pairs)
        self.truth_clusters.extend(other.truth_clusters)


def _text(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n_words))


def _row(rng: random.Random, url: str, text: str, ts_offset: int) -> dict:
    html = f"<html><head><title>t</title></head><body><p>{text}</p></body></html>"
    return {
        "url": url,
        "warc_ts": _EPOCH + dt.timedelta(seconds=ts_offset),
        "html": html.encode("utf-8"),
        "text": text,
        "lang": rng.choice(_LANGS),
    }


def _pair(a: str, b: str, kind: str) -> dict:
    lo, hi = (a, b) if a < b else (b, a)
    return {"url_a": lo, "url_b": hi, "kind": kind}


def _cluster_rows(urls_ts: list[tuple[str, dt.datetime]]) -> list[dict]:
    canon = min(urls_ts, key=lambda x: (x[1], x[0]))[0]
    return [{"url": u, "cluster_id": canon} for u, _ in urls_ts]


def fx_exact(seed: int = 42, groups: int = 15, copies: int = 3) -> Corpus:
    rng = random.Random(seed ^ 0xE84C7)
    c = Corpus()
    for g in range(groups):
        base = _text(rng, rng.randint(60, 400))
        members = []
        for i in range(copies):
            url = f"https://exact.example/{g}/{i}"
            row = _row(rng, url, base, g * 100 + i)
            c.rows.append(row)
            members.append((url, row["warc_ts"]))
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                c.truth_pairs.append(_pair(members[i][0], members[j][0], "exact"))
        c.truth_clusters.extend(_cluster_rows(members))
    return c


def fx_near(seed: int = 42, groups: int = 15, copies: int = 2) -> Corpus:
    rng = random.Random(seed ^ 0x4EA12)
    c = Corpus()
    for g in range(groups):
        n = rng.randint(150, 400)
        base_words = [rng.choice(_WORDS) for _ in range(n)]
        members = []
        url0 = f"https://near.example/{g}/0"
        row0 = _row(rng, url0, " ".join(base_words), g * 100)
        c.rows.append(row0)
        members.append((url0, row0["warc_ts"]))
        for i in range(1, copies + 1):
            mutated = list(base_words)
            for _ in range(rng.randint(1, max(1, n // 50))):  # ~<=2% token edits
                mutated[rng.randrange(n)] = rng.choice(_WORDS)
            url = f"https://near.example/{g}/{i}"
            row = _row(rng, url, " ".join(mutated), g * 100 + i)
            c.rows.append(row)
            members.append((url, row["warc_ts"]))
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                c.truth_pairs.append(_pair(members[i][0], members[j][0], "near"))
        c.truth_clusters.extend(_cluster_rows(members))
    return c


def fx_substring(seed: int = 42, pairs: int = 15, shared_len_words: int = 40) -> Corpus:
    rng = random.Random(seed ^ 0x5B57)
    c = Corpus()
    for g in range(pairs):
        shared = _text(rng, shared_len_words)
        for i in range(2):
            url = f"https://substr.example/{g}/{i}"
            body = _text(rng, rng.randint(200, 500))
            cut = rng.randrange(len(body))
            # embed the shared block at a word boundary inside distinct text
            pre = body[:cut].rsplit(" ", 1)[0]
            post = body[cut:].split(" ", 1)[-1]
            text = f"{pre} {shared} {post}".strip()
            c.rows.append(_row(rng, url, text, g * 100 + i))
        c.truth_pairs.append(
            _pair(f"https://substr.example/{g}/0", f"https://substr.example/{g}/1",
                  "substring")
        )
        # substring pairs are NOT whole-doc duplicate clusters
        for i in range(2):
            u = f"https://substr.example/{g}/{i}"
            c.truth_clusters.append({"url": u, "cluster_id": u})
    return c


def fx_internal_repeat(seed: int = 42, docs: int = 20) -> Corpus:
    rng = random.Random(seed ^ 0x17EA)
    c = Corpus()
    for g in range(docs):
        block = _text(rng, rng.randint(20, 60))
        filler = _text(rng, rng.randint(50, 150))
        url = f"https://selfrep.example/{g}"
        text = f"{block} {filler} {block}"
        c.rows.append(_row(rng, url, text, g))
        c.truth_clusters.append({"url": url, "cluster_id": url})
    return c


def fx_ambiguous(seed: int = 42, docs: int = 20) -> Corpus:
    rng = random.Random(seed ^ 0xA3B16)
    c = Corpus()
    shapes = ["", "   ", "\t\n  \n", "\x00\x01\x02", "x", "  one  "]
    for g in range(docs):
        url = f"https://ambig.example/{g}"
        text = shapes[g % len(shapes)]
        row = _row(rng, url, text, g)
        if g % 7 == 0:
            row["html"] = b"\xff\xfe\x00broken"  # non-UTF8 html bytes
        c.rows.append(row)
        # ambiguous docs are never clustered (excluded from signatures)
    return c


def fx_boilerplate(seed: int = 42, docs: int = 200) -> Corpus:
    rng = random.Random(seed ^ 0xB01E7)
    c = Corpus()
    header = "welcome to example site navigation home about contact login"
    footer = "copyright example inc all rights reserved privacy terms"
    for g in range(docs):
        url = f"https://boiler.example/{g}"
        body = _text(rng, rng.randint(100, 300))
        c.rows.append(_row(rng, url, f"{header} {body} {footer}", g))
        c.truth_clusters.append({"url": url, "cluster_id": url})
    return c


def fx_unique(seed: int = 42, docs: int = 100) -> Corpus:
    rng = random.Random(seed ^ 0x0417)
    c = Corpus()
    for g in range(docs):
        url = f"https://unique.example/{g}"
        c.rows.append(_row(rng, url, _text(rng, rng.randint(80, 400)), g))
        c.truth_clusters.append({"url": url, "cluster_id": url})
    return c


def fx_mixed(seed: int = 42, scale: float = 1.0) -> Corpus:
    """Union of all corpora, row order shuffled (seeded)."""
    c = Corpus()
    s = max(1, round(scale))
    c.extend(fx_exact(seed, groups=15 * s))
    c.extend(fx_near(seed, groups=15 * s))
    c.extend(fx_substring(seed, pairs=15 * s))
    c.extend(fx_internal_repeat(seed, docs=20 * s))
    c.extend(fx_ambiguous(seed, docs=20 * s))
    c.extend(fx_boilerplate(seed, docs=200 * s))
    c.extend(fx_unique(seed, docs=100 * s))
    rng = random.Random(seed ^ 0x313ED)
    rng.shuffle(c.rows)
    return c


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_df(spark, corpus: Corpus):
    return spark.createDataFrame(corpus.rows, schema=PAGES_SCHEMA)

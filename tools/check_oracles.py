"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` through
DuckDB over the same parquet tables, then compares row count, column
names, and (column-name-sorted, row-sorted) values. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    keyed = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(keyed, key=lambda t: tuple((x is None, str(x)) for x in t))


def main():
    import __spark_entry__ as E
    from uk_address_matcher_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check)")
            n_rowsonly += 1
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [c for c in res.columns]
            orows = res.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {str(exc)[:200]}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sk, ok = frame_key(srows, scols), frame_key(orows, ocols)
            if sk != ok:
                for i, (a, b) in enumerate(zip(sk, ok)):
                    if a != b:
                        problems.append(f"first diff at sorted row {i}:\n  spark ={a}\n  oracle={b}")
                        break
                else:
                    problems.append("value mismatch (length)")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok    {name}: {len(srows)} rows")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} FAIL")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

"""Local replica of the driver's correctness gate: run every
queries() entry on Spark at a given sf dir, run the matching
oracle_sql() in DuckDB over the same parquet, compare row count +
column names + order-insensitive value multiset.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from osm_conflate_spark.plans.pipeline import build_session  # noqa: E402


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        "|".join(canon(r[i]) for i in order) for r in rows
    )
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session(app="check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        t1 = time.monotonic()
        if name not in oracles:
            print(f"ok?  {name}: rows-only rows={len(srows)} cols={scols} "
                  f"spark={t1 - t0:.1f}s")
            if len(srows) == 0 and name != "conflate_changes":
                print(f"WARN {name}: zero rows")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [c.lower() for c in res.columns]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        t2 = time.monotonic()
        ok = True
        if [c.lower() for c in scols] != dcols:
            ok = False
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
        elif len(srows) != len(drows):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
        else:
            ms, md = row_multiset(scols, srows), row_multiset(dcols, drows)
            if ms != md:
                ok = False
                diff = [(a, b) for a, b in zip(ms, md) if a != b][:5]
                print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            # Typed check approximating the driver's value-hash: DuckDB
            # HUGEINT (from sum(BIGINT)) string-matches Spark BIGINT but
            # hash-differs in the driver's typed compare (the round-4
            # word_repetition/dup_shingles/domain_stats failures).  Use
            # the relation's TYPE METADATA (res.types — no re-execution;
            # res.df() would re-run multi-minute oracles) and flag
            # integer-family disagreements.
            try:
                fam = lambda t: (
                    "i" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT")
                    else "f" if t in ("FLOAT", "DOUBLE")
                    else "b" if t == "BOOLEAN"
                    else "M" if t.startswith(("TIMESTAMP", "DATE"))
                    else "HUGEINT" if t == "HUGEINT"
                    else "?"
                )
                dd = {c.lower(): fam(str(t).upper())
                      for c, t in zip(res.columns, res.types)}
                sd = {
                    f.name.lower(): {"long": "i", "integer": "i",
                                     "short": "i", "byte": "i",
                                     "double": "f", "float": "f",
                                     "boolean": "b",
                                     "timestamp": "M", "date": "M",
                                     }.get(f.dataType.typeName(), "?")
                    for f in sdf.schema.fields
                }
                bad = {c: (sd.get(c), dd.get(c)) for c in dd
                       if sd.get(c, "?") != "?" and dd[c] != "?"
                       and dd[c] != sd[c]}
                if bad:
                    ok = False
                    print(f"FAIL {name}: dtype-family mismatch "
                          f"(spark,duck): {bad}")
            except Exception as e:  # typed check is best-effort
                print(f"WARN {name}: dtype check skipped: {e}")
        if ok:
            print(f"OK   {name}: rows={len(srows)} spark={t1 - t0:.1f}s duck={t2 - t1:.1f}s")
        else:
            failures.append(name)
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

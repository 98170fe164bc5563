"""Driver-gate rehearsal: run every __spark_entry__ query against its DuckDB
oracle at a given sf dir and report row-count / schema / value equality.

Mimics the driver's compare: sort columns by name, sort rows, compare values
(floats to 6 decimal places to absorb representation noise the driver's
value-hash may or may not absorb — a strict mode flags any non-identical
repr too).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.6f}"
        if isinstance(v, bool):
            return str(bool(v))
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from tempeh_spark.session import build_session

    unknown = only - set(entrymod.queries())
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        print(f"available: {sorted(entrymod.queries())}")
        sys.exit(2)

    spark = build_session(app_name="oracle-check", cpus=8, shuffle_partitions=16)
    con = duck_con(sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            results[name] = f"SPARK-ERROR {type(e).__name__}: {str(e).splitlines()[0][:160]}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(srows)} rows)"
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-ERROR {type(e).__name__}: {str(e).splitlines()[0][:160]}"
            continue
        if sorted(c.lower() for c in scols) != sorted(ocols):
            results[name] = f"SCHEMA-MISMATCH spark={sorted(scols)} duck={sorted(ocols)}"
            continue
        if len(srows) != len(orows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(srows)} duck={len(orows)}"
            continue
        a = canon(srows, [c.lower() for c in scols])
        b = canon(orows, ocols)
        if a == b:
            results[name] = f"OK ({len(srows)} rows)"
        else:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            results[name] = f"VALUE-MISMATCH first diffs: {diffs}"
    spark.stop()

    width = max(len(k) for k in results)
    bad = 0
    for k, v in results.items():
        flag = " " if v.startswith(("OK", "rows-only")) else "!"
        if flag == "!":
            bad += 1
        print(f"{flag} {k:<{width}}  {v}")
    print(f"\n{len(results) - bad}/{len(results)} clean")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

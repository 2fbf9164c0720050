"""Local mimic of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01; compare
row-count, schema (column names), and an order-insensitive value hash.

Usage: python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from graph_data_science_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, cols):
    cols_sorted = sorted(cols)
    out = []
    for row in rows:
        d = dict(zip(cols, row)) if not hasattr(row, "asDict") else row.asDict()
        vals = []
        for c in cols_sorted:
            v = d[c]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return hashlib.sha256("\n".join(out).encode()).hexdigest(), len(out), cols_sorted


def main():
    only = set(sys.argv[1:])
    spark = get_spark(app_name="oracle-check", cores=8, shuffle_partitions=8,
                      driver_memory="8g")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = sdf.collect()
            shash, scount, ssorted = normalize([tuple(r) for r in srows], scols)
        except Exception as e:
            print(f"[SPARK FAIL] {name}: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only ] {name}: {scount} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            ohash, ocount, osorted = normalize(orows, ocols)
        except Exception as e:
            print(f"[ORACLE FAIL] {name}: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        ok = (scount == ocount) and (ssorted == osorted) and (shash == ohash)
        status = "OK " if ok else "MISMATCH"
        print(f"[{status}] {name}: spark {scount} rows / oracle {ocount} rows, "
              f"cols {ssorted} vs {osorted}, hash {'=' if shash == ohash else '!='} "
              f"({time.time()-t0:.1f}s)")
        if not ok:
            failures.append(name)
            # show a few diffs
            sset = {}
            for r in srows:
                d = r.asDict()
                key = "|".join(str(d[c]) if not isinstance(d[c], float) else f"{d[c]:.6g}"
                               for c in ssorted)
                sset[key] = True
            oset = {}
            for row in orows:
                d = dict(zip(ocols, row))
                key = "|".join(str(d[c]) if not isinstance(d[c], float) else f"{d[c]:.6g}"
                               for c in osorted)
                oset[key] = True
            only_s = [k for k in sset if k not in oset][:5]
            only_o = [k for k in oset if k not in sset][:5]
            print("   spark-only:", only_s)
            print("   oracle-only:", only_o)
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

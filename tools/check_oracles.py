"""Local mimic of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01; compare
row-count, schema (column names), and an order-insensitive value hash.

The Spark side is the critical path (operators toggle session confs —
AQE off inside iterative loops — so Spark queries must run one at a
time). The DuckDB oracle + hash compare run PIPELINED on one worker
thread: while Spark executes query i+1, the worker replays oracle i.
That takes the whole DuckDB wall (the unrolled celf/sllpa/maxkcut/
astar replays are seconds each) off the gate's critical path without
any risk to determinism. ORACLE_SEQ=1 restores the sequential mode.

Usage: python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import queue
import sys
import threading
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


def _diff_sample(srows, ssorted, orows, ocols, osorted):
    """First few rows present on only one side (for MISMATCH triage)."""
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
    return only_s, only_o


def _compare_one(con, name, sql, srows, scols, spark_s, failures):
    """DuckDB replay + hash compare for one query (worker-thread body)."""
    t0 = time.time()
    shash, scount, ssorted = normalize([tuple(r) for r in srows], scols)
    try:
        cur = con.execute(sql)
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        ohash, ocount, osorted = normalize(orows, ocols)
    except Exception as e:
        print(f"[ORACLE FAIL] {name}: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        failures.append(name)
        return
    duck_s = time.time() - t0
    ok = (scount == ocount) and (ssorted == osorted) and (shash == ohash)
    status = "OK " if ok else "MISMATCH"
    print(f"[{status}] {name}: spark {scount} rows / oracle {ocount} rows, "
          f"cols {ssorted} vs {osorted}, hash {'=' if shash == ohash else '!='} "
          f"(spark {spark_s:.1f}s, duck {duck_s:.1f}s)", flush=True)
    if not ok:
        failures.append(name)
        only_s, only_o = _diff_sample(srows, ssorted, orows, ocols, osorted)
        print("   spark-only:", only_s, flush=True)
        print("   oracle-only:", only_o, flush=True)


def main():
    only = set(sys.argv[1:])
    wall0 = time.time()
    spark = get_spark(app_name="oracle-check", cores=8, shuffle_partitions=8,
                      driver_memory="8g")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures: list[str] = []

    pipelined = os.environ.get("ORACLE_SEQ", "0") != "1"
    work: queue.Queue = queue.Queue(maxsize=4)

    def consumer():
        while True:
            item = work.get()
            if item is None:
                return
            _compare_one(con, *item, failures)

    worker = threading.Thread(target=consumer, daemon=True) if pipelined else None
    if worker:
        worker.start()

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"[SPARK FAIL] {name}: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            failures.append(name)
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"[rows-only ] {name}: {len(srows)} rows ({spark_s:.1f}s)",
                  flush=True)
            continue
        if worker:
            work.put((name, oracles[name], srows, scols, spark_s))
        else:
            _compare_one(con, name, oracles[name], srows, scols, spark_s,
                         failures)
    if worker:
        work.put(None)
        worker.join()
    print(f"GATE WALL: {time.time() - wall0:.1f}s")
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

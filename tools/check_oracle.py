#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB differential check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dump produced by graft.Verify and
the oracle_sql.json next to them, runs each oracle against DuckDB views over
<sfDir>/*.parquet, and compares: column names (sorted), row counts, and
values (both in result order and sorted), reporting per-query PASS/FAIL.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Sketch-valued queries have no hash oracle (HLL implementations are
# engine-specific), but their ESTIMATES are cross-checkable: each entry
# runs a DuckDB twin and asserts every approx column within rel_tol of
# the exact column on BOTH engines (the quantitative grade that replaces
# the hash match). Keys: spark output dir name -> (duckdb sql, group col,
# approx col, exact col, rel_tol).
TOLERANCE = {
    "q09_agg_approx": (
        "SELECT l_returnflag, approx_count_distinct(l_orderkey) AS approx_orders, "
        "COUNT(DISTINCT l_orderkey) AS exact_orders "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
        "l_returnflag", "approx_orders", "exact_orders", 0.05),
    # exact_p50 rounded to the cent grid so the exact twin matches across
    # engines (FP interpolation order differs); each engine's sketch
    # median must land within 5% of it
    "q110_approx_quantiles": (
        "SELECT l_returnflag, round(approx_quantile(l_extendedprice, 0.5), 2) AS approx_p50, "
        "round(quantile_cont(l_extendedprice, 0.5), 2) AS exact_p50 "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
        "l_returnflag", "approx_p50", "exact_p50", 0.05),
    # q122: distinct users per event type from MERGED per-batch HLL
    # sketches (incremental stats table) — sketch values are
    # engine-specific, the estimate must land within 5% of exact on both
    # engines
    # q212: 7-day rolling reach from windowed HLL unions — both engines'
    # estimates must land within 5% of the exact windowed distinct
    "q212_rolling_reach_sketch": (
        "WITH du AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events), "
        "days AS (SELECT DISTINCT day FROM du) "
        "SELECT d.day AS day, approx_count_distinct(u.user_id) AS approx_users7, "
        "COUNT(DISTINCT u.user_id) AS exact_users7 "
        "FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day "
        "GROUP BY d.day ORDER BY d.day",
        "day", "approx_users7", "exact_users7", 0.05),
    "q122_sketch_users": (
        "SELECT event_type, approx_count_distinct(user_id) AS approx_users, "
        "COUNT(DISTINCT user_id) AS exact_users "
        "FROM events GROUP BY event_type ORDER BY event_type",
        "event_type", "approx_users", "exact_users", 0.05),
}


def check_tolerance(con, out_dir, name, spec):
    sql, key, approx_c, exact_c, tol = spec
    want = {r[key]: r for r in con.execute(sql).fetch_arrow_table().to_pylist()}
    got = {r[key]: r for r in con.execute(
        f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table().to_pylist()}
    if sorted(want) != sorted(got):
        print(f"FAIL {name}: group keys differ: {sorted(want)} vs {sorted(got)}")
        return False
    worst = 0.0
    for k, g in got.items():
        w = want[k]
        if g[exact_c] != w[exact_c]:
            print(f"FAIL {name}: exact col differs at {k}: {g[exact_c]} vs {w[exact_c]}")
            return False
        for eng, approx in (("spark", g[approx_c]), ("duckdb", w[approx_c])):
            err = abs(approx - g[exact_c]) / g[exact_c]
            worst = max(worst, err)
            if err >= tol:
                print(f"FAIL {name}: {eng} approx {approx} off exact "
                      f"{g[exact_c]} by {err:.3f} >= {tol}")
                return False
    print(f"PASS {name} (tolerance check: worst rel err {worst:.4f} < {tol}, both engines)")
    return True


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, spec in sorted(TOLERANCE.items()):
        # subset dumps (local single-query iteration) legitimately omit
        # the tolerance queries — skip, don't FAIL
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"SKIP {name}: not in this dump")
            continue
        try:
            ok = check_tolerance(con, out_dir, name, spec)
        except Exception as e:
            print(f"FAIL {name}: tolerance check error: {e}")
            ok = False
        n_pass, n_fail = n_pass + ok, n_fail + (not ok)
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ: oracle={wcols} spark={gcols}")
            n_fail += 1
            continue
        if want.num_rows != got.num_rows:
            print(f"FAIL {name}: rows differ: oracle={want.num_rows} spark={got.num_rows}")
            n_fail += 1
            continue
        wrows = [tuple(norm(r[c]) for c in wcols) for r in want.to_pylist()]
        grows = [tuple(norm(r[c]) for c in gcols) for r in got.to_pylist()]
        if wrows == grows:
            print(f"PASS {name} ({want.num_rows} rows)")
            n_pass += 1
        elif sorted(wrows) == sorted(grows):
            print(f"WARN {name}: values match only after sorting rows (order mismatch)")
            n_fail += 1
        else:
            bad = next(i for i, (a, b) in enumerate(zip(wrows, grows)) if a != b)
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  oracle: {wrows[bad]}")
            print(f"  spark : {grows[bad]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

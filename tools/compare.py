#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on each oracle SQL from Verify's oracle_sql.json (with the
sf-dir parquet tables registered as views), loads the Spark parquet output
for the same query, and compares: row count, column names, and a hash of
the values with columns sorted by name.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>
"""
import sys, json, glob, hashlib, threading, time
import duckdb

# Per-oracle wall-time budget (seconds). A pathological oracle (e.g. a
# multi-referenced non-MATERIALIZED CTE chain that DuckDB 1.0 inlines
# combinatorially — the q691 incident that emptied CORRECTNESS_r09) must
# fail as ONE red row, not hang the whole gate. Override: --budget N.
ORACLE_BUDGET_S = 60.0

def run_budgeted(con, sql, budget_s):
    """Execute sql; interrupt() from a watchdog if it exceeds budget_s.
    Returns (cols, rows) or raises (duckdb raises InterruptException)."""
    done = threading.Event()
    def watchdog():
        if not done.wait(budget_s):
            # re-check AFTER the wait times out: the query may have finished
            # in the gap between wait() expiring and us firing — a stray
            # interrupt() would then land on the NEXT statement on this
            # connection (the spark-side read_parquet) and kill the gate run
            # instead of producing one red row
            if not done.is_set():
                con.interrupt()
    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    t0 = time.monotonic()
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows, time.monotonic() - t0
    finally:
        done.set()
        t.join(timeout=1.0)  # watchdog is either parked in wait() or done


def retry_on_stray_interrupt(fn):
    """The done.is_set() re-check shrinks the race window but can't close it
    (TOCTOU between is_set() and interrupt()). Any statement that runs right
    after a budgeted call retries once on InterruptException — a stray
    interrupt from the previous query's watchdog is absorbed; a real second
    interrupt (impossible: one watchdog per budgeted call) would re-raise."""
    try:
        return fn()
    except duckdb.InterruptException:
        return fn()

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)  # full precision; bit-exact match required
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in rows:
        h.update(("|".join(canon(row[i]) for i in order) + "\n").encode())
    return h.hexdigest()

# DuckDB result types whose driver-side hash canonicalization diverges from
# the int64/double the Spark side writes. DuckDB silently widens sum(BIGINT)
# and bigint products to HUGEINT (int128); the local `str()` canon makes
# int128 == int64, but the driver's does NOT — 32 queries shipped r4 with
# values bit-identical yet driver hash-red for exactly this reason (see
# VERDICT.md r4 headline). Fail loudly on any such output column so the
# defect class is caught at dev time: the fix is always CAST(... AS BIGINT)
# on the oracle's final wide expression.
WIDE_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT", "DECIMAL")

def described_types(con, sql):
    """{col: duckdb type} via DESCRIBE (the DB-API cursor description only
    exposes generic codes like NUMBER, which can't tell int64 from int128)."""
    return {c: ty for c, ty, *_ in con.execute(f"DESCRIBE ({sql})").fetchall()}

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    present_only = "--present-only" in sys.argv
    budget = ORACLE_BUDGET_S
    if "--budget" in sys.argv:
        budget = float(sys.argv[sys.argv.index("--budget") + 1])
    # --budget-out FILE: dump the slowest-10 oracle wall times (plus every
    # >50% warning) so per-round artifacts make oracle-cost creep visible
    # round-over-round instead of resurfacing as a gate timeout (the q691
    # incident class)
    budget_out = None
    if "--budget-out" in sys.argv:
        budget_out = sys.argv[sys.argv.index("--budget-out") + 1]
    oracle_times = {}
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            if present_only:
                continue  # partial dev dump (Verify with query-name args)
            print(f"FAIL {name}: no spark output"); failed.append(name); continue
        try:
            # retry: a stray interrupt from the PREVIOUS query's watchdog
            # (budget race) must not turn into a false red row here
            o_tmap = retry_on_stray_interrupt(lambda: described_types(con, sql))
            wide = [(c, ty) for c, ty in o_tmap.items()
                    if any(w in ty for w in WIDE_TYPES)]
            if wide:
                print(f"FAIL {name}: oracle emits driver-unhashable wide types "
                      f"{wide} — CAST the final expression(s) AS BIGINT")
                failed.append(name); continue
            o_cols, o_rows, took = run_budgeted(con, sql, budget)
            oracle_times[name] = round(took, 3)
            if took > budget * 0.5:
                print(f"WARN {name}: oracle took {took:.1f}s "
                      f"(>{budget * 0.5:.0f}s, budget {budget:.0f}s)")
        except duckdb.InterruptException:
            print(f"FAIL {name}: oracle exceeded {budget:.0f}s wall-time budget "
                  f"(suspect a multi-referenced non-MATERIALIZED CTE)")
            failed.append(name); continue
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); failed.append(name); continue
        s_tmap = retry_on_stray_interrupt(
            lambda: described_types(con, f"SELECT * FROM read_parquet({files!r})"))
        sq = retry_on_stray_interrupt(
            lambda: con.execute(f"SELECT * FROM read_parquet({files!r})"))
        s_cols = [d[0] for d in sq.description]
        s_rows = sq.fetchall()
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            failed.append(name); continue
        # types must map 1:1 by column name — a driver-side hash compares
        # canonicalized values, and identical names with diverging types
        # (e.g. BIGINT vs DOUBLE) hash differently even when values agree
        tdiff = [(c, s_tmap[c], o_tmap[c]) for c in s_cols if s_tmap[c] != o_tmap[c]]
        if tdiff:
            print(f"FAIL {name}: type mismatch (col, spark, oracle): {tdiff}")
            failed.append(name); continue
        if len(o_rows) != len(s_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            failed.append(name); continue
        oh, sh = table_hash(o_rows, o_cols), table_hash(s_rows, s_cols)
        if oh != sh:
            print(f"FAIL {name}: hash mismatch ({len(o_rows)} rows)")
            # print first differing row for debugging
            order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
            order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            for i, (a, b) in enumerate(zip(o_rows, s_rows)):
                ca = [canon(a[j]) for j in order_o]; cb = [canon(b[j]) for j in order_s]
                if ca != cb:
                    print(f"  row {i}: oracle={ca}\n          spark ={cb}")
                    break
            failed.append(name); continue
        print(f"PASS {name} ({len(o_rows)} rows)")
    print(f"\n{len(oracle)-len(failed)}/{len(oracle)} passed")
    if budget_out is not None:
        slowest = sorted(oracle_times.items(), key=lambda kv: -kv[1])[:10]
        with open(budget_out, "w") as f:
            json.dump({
                "sf_dir": sf_dir,
                "budget_s": budget,
                "n_oracles_timed": len(oracle_times),
                "total_oracle_s": round(sum(oracle_times.values()), 3),
                "warned_over_half_budget": sorted(
                    n for n, t in oracle_times.items() if t > budget * 0.5),
                "slowest10": [{"query": n, "oracle_s": t} for n, t in slowest],
            }, f, indent=1)
        print(f"budget report -> {budget_out}")
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

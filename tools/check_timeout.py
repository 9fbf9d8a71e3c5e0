#!/usr/bin/env python3
"""check.py with a PER-QUERY DuckDB timeout, for replica-scale sweeps:
some oracle replays are deliberately combinatorial (x_itemsets3's
triple enumeration) and at xF data the ORACLE, not the engine, is the
bottleneck. Every query ends PASS / FAIL / ORACLE_TIMEOUT(<secs>) so
exclusions are mechanical, not hand-picked.

Usage: python3 tools/check_timeout.py <sfDir> <verifyOutDir> [timeoutSec]
         [expectedTimeoutsCsv]

Exit codes: 0 = every compared query passed AND the only timeouts (if
any) are in the expected allowlist; 1 = any FAIL; 2 = nothing passed
(all-timeout / empty sweep — a hung-oracle regression must not read as
green) or an unexpected ORACLE_TIMEOUT outside the allowlist.
"""
import sys, os, json, glob
import queue as queue_mod
import multiprocessing as mp


def one(sf_dir, out_dir, name, sql, q):
    import duckdb
    import pandas as pd
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    con = duckdb.connect()
    # Shared-VM discipline: cap DuckDB's intra-query parallelism so a
    # sweep can run beside a Spark dump without starving it.
    if os.environ.get("DUCKDB_THREADS"):
        con.sql(f"SET threads TO {int(os.environ['DUCKDB_THREADS'])}")
    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.sql(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns), ignore_index=True,
                              na_position="first", kind="mergesort")

    def compare_big(rdir):
        """Multiset compare entirely inside DuckDB for results too big
        to materialize+mergesort in pandas (the x100 replica's 100M+
        row dumps): same checks (row count, column-name set, exact
        values) via count + sum/xor of per-row hashes over the
        name-sorted columns, spark side cast to the oracle's types
        (the pandas path is check_dtype=False too). Order-independent
        by construction, so no sort at all; collision odds of the
        64-bit (sum, xor, count) triple are negligible."""
        con.sql(f"CREATE OR REPLACE TEMP TABLE __duck AS {sql}")
        con.sql("CREATE OR REPLACE TEMP VIEW __spark AS "
                f"SELECT * FROM read_parquet('{rdir}/*.parquet')")
        dtypes = {r[0]: r[1] for r in con.sql("DESCRIBE __duck").fetchall()}
        scols = [r[0] for r in con.sql("DESCRIBE __spark").fetchall()]
        if sorted(dtypes) != sorted(scols):
            return ("FAIL", f"columns {sorted(scols)} != {sorted(dtypes)}")
        cols = sorted(dtypes)
        def fp(table, cast):
            row = ", ".join(
                (f'CAST("{c}" AS {dtypes[c]})' if cast else f'"{c}"')
                for c in cols)
            return con.sql(
                f"SELECT COUNT(*), SUM(hash(ROW({row}))), "
                f"bit_xor(hash(ROW({row}))) FROM {table}").fetchone()
        d, s = fp("__duck", False), fp("__spark", True)
        if d[0] != s[0]:
            return ("FAIL", f"rows {s[0]} != {d[0]}")
        if d != s:
            return ("FAIL", f"values differ: multiset fingerprints "
                            f"{s[1:]} != {d[1:]} over {d[0]} rows")
        return ("PASS", f"{d[0]} rows, hash-fingerprint compare")

    rdir = f"{out_dir}/{name}"
    if not os.path.isdir(rdir):
        q.put(("FAIL", "no spark result dir"))
        return
    try:
        n_spark = con.sql("SELECT COUNT(*) FROM "
                          f"read_parquet('{rdir}/*.parquet')").fetchone()[0]
        if n_spark > 20_000_000:
            q.put(compare_big(rdir))
            return
        spark_df = pd.concat([pd.read_parquet(f) for f in
                              sorted(glob.glob(f"{rdir}/*.parquet"))],
                             ignore_index=True)
        duck_df = con.sql(sql).df()
    except Exception as e:
        q.put(("FAIL", str(e)[:200]))
        return
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        q.put(("FAIL", f"columns {list(a.columns)} != {list(b.columns)}"))
        return
    if len(a) != len(b):
        q.put(("FAIL", f"rows {len(a)} != {len(b)}"))
        return
    import pandas.testing as pt
    try:
        pt.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as e:
        q.put(("FAIL", f"values differ: {str(e)[:200]}"))
        return
    q.put(("PASS", f"{len(a)} rows"))


def main(sf_dir, out_dir, timeout, expected_to=()):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    timed_out = []
    for name, sql in sorted(oracle.items()):
        q = mp.Queue()
        p = mp.Process(target=one, args=(sf_dir, out_dir, name, sql, q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            print(f"ORACLE_TIMEOUT {name} (>{timeout}s DuckDB replay)",
                  flush=True)
            timed_out.append(name)
            continue
        # q.get with its own timeout: Queue.empty() can transiently be
        # True right after the child exits (feeder-thread flush race),
        # which would turn a genuine PASS into a spurious 'worker died'.
        try:
            status, msg = q.get(timeout=5)
        except queue_mod.Empty:
            status, msg = "FAIL", "worker died (no result on queue)"
        print(f"{status} {name}: {msg}" if status == "FAIL"
              else f"PASS {name} ({msg})", flush=True)
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
    unexpected = [n for n in timed_out if n not in expected_to]
    print(f"\n{n_pass} pass, {n_fail} fail, {len(timed_out)} "
          f"oracle-timeout ({len(unexpected)} outside allowlist)")
    if n_fail:
        return 1
    # An all-timeout (or empty) sweep compared nothing — that is not
    # green; neither is a previously-fast oracle newly hanging.
    if n_pass == 0 or unexpected:
        return 2
    return 0


if __name__ == "__main__":
    to = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    allow = tuple(a for a in sys.argv[4].split(",") if a) \
        if len(sys.argv) > 4 else ()
    sys.exit(main(sys.argv[1], sys.argv[2], to, allow))

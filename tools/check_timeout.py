#!/usr/bin/env python3
"""check.py with a PER-QUERY DuckDB timeout, for replica-scale sweeps:
some oracle replays are deliberately combinatorial (x_itemsets3's
triple enumeration) and at xF data the ORACLE, not the engine, is the
bottleneck. Every query ends PASS / FAIL / ORACLE_TIMEOUT(<secs>) so
exclusions are mechanical, not hand-picked.

Usage: python3 tools/check_timeout.py <sfDir> <verifyOutDir> [timeoutSec]
         [expectedTimeoutsCsv]

Each FAIL is re-run once, serially, in a fresh process (environment
ceilings — mmap/address-space exhaustion under a concurrent sweep —
are not value mismatches; a genuine mismatch fails identically on the
re-run). The FINAL TALLY line reflects post-arbitration verdicts, so
the machine-readable tally alone proves a sweep.

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
    # Bound DuckDB's allocation footprint so a combinatorial replay
    # spills to disk instead of exhausting the process address space
    # (the round-13 x_token_scrub x100 FAIL was vm.max_map_count
    # exhaustion in this worker, not a value mismatch — with an
    # explicit memory_limit the buffer manager stays inside one
    # bounded arena instead of growing mmap regions unboundedly).
    con.sql(f"SET memory_limit='{os.environ.get('DUCKDB_MEMORY_LIMIT', '24GB')}'")
    tmp = os.environ.get("DUCKDB_TEMP_DIR", "/tmp/duckdb_sweep_spill")
    os.makedirs(tmp, exist_ok=True)
    con.sql(f"SET temp_directory='{tmp}'")
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


def run_one(sf_dir, out_dir, name, sql, timeout):
    """One compare in a fresh worker process; returns (status, msg)."""
    q = mp.Queue()
    p = mp.Process(target=one, args=(sf_dir, out_dir, name, sql, q))
    p.start()
    p.join(timeout)
    if p.is_alive():
        p.terminate()
        p.join()
        return ("ORACLE_TIMEOUT", f">{timeout}s DuckDB replay")
    # q.get with its own timeout: Queue.empty() can transiently be
    # True right after the child exits (feeder-thread flush race),
    # which would turn a genuine PASS into a spurious 'worker died'.
    try:
        return q.get(timeout=5)
    except queue_mod.Empty:
        return ("FAIL", "worker died (no result on queue)")


def main(sf_dir, out_dir, timeout, expected_to=()):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    status = {}
    for name, sql in sorted(oracle.items()):
        st, msg = run_one(sf_dir, out_dir, name, sql, timeout)
        status[name] = st
        print(f"PASS {name} ({msg})" if st == "PASS"
              else f"{st} {name}: {msg}", flush=True)
    # Arbitration pass (round-13 verdict task #4): a worker that died
    # to an ENVIRONMENT ceiling (address-space/mmap exhaustion under a
    # concurrent sweep, OOM-killed child) is not a value mismatch, and
    # a timeout under machine contention is not a slow oracle — re-run
    # each FAIL and ORACLE_TIMEOUT once, serially, in a fresh process.
    # A genuine mismatch fails identically on the re-run; only then
    # does it count. The re-run verdict REPLACES the first so the
    # final tally line alone proves the sweep (no prose trailer).
    for name in [n for n, st in sorted(status.items())
                 if st in ("FAIL", "ORACLE_TIMEOUT")]:
        st, msg = run_one(sf_dir, out_dir, name, oracle[name], timeout)
        status[name] = st
        print(f"RERUN {name}: {st} ({msg})", flush=True)
    n_pass = sum(1 for st in status.values() if st == "PASS")
    n_fail = sum(1 for st in status.values() if st == "FAIL")
    timed_out = [n for n, st in sorted(status.items())
                 if st == "ORACLE_TIMEOUT"]
    unexpected = [n for n in timed_out if n not in expected_to]
    print(f"\nFINAL TALLY: {n_pass} pass, {n_fail} fail, "
          f"{len(timed_out)} oracle-timeout "
          f"({len(unexpected)} outside allowlist)")
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

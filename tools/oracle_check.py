#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Usage: oracle_check.py <sfDir> <verifyOutDir> [only]

Registers each parquet table as a DuckDB view, runs every oracle SQL from
<verifyOutDir>/oracle_sql.json, and compares row-for-row (and as an
order-insensitive multiset) against the Spark result parquet.

`only` is the same comma-separated gate list passed to graft.Verify's
third arg; when given, absent result dirs outside the list are skipped.
Without it, EVERY missing result dir is a failure — a full run where
half the gates died must read as broken, not as a subset run.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    """Returns (normalized_df, array_columns). Array/list columns (numpy
    arrays from parquet, python lists from duckdb) are unhashable — the
    DRIVER's comparator crashes on them, so the caller must mark any
    gate that emits one as FAILED, not merely note it. We stringify
    them here only so our own sort/compare can run far enough to report
    that failure with values attached."""
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    import numpy as np
    is_arr = lambda v: isinstance(v, (list, tuple, np.ndarray))
    arr_cols = []
    for c in df.columns:
        if df[c].dtype == object and df[c].map(is_arr).any():
            arr_cols.append(c)
            df[c] = df[c].map(lambda v: str(list(v)) if is_arr(v) else v)
    return df, arr_cols

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_warn = 0
    results = {}
    # absence of a result dir is ALWAYS a failure unless the caller
    # explicitly declared a subset (same list passed to Verify) — never
    # inferred from how many dirs exist, or a run where half the gates
    # died would read as a clean subset
    expected = set(only.split(",")) if only else set(oracles)
    for name in sorted(expected):
        if name not in oracles:
            # typo'd (or oracle-less) gate in `only`: say so loudly
            # instead of silently running a weaker rows-only check
            print(f"WARN {name}: listed in 'only' but absent from oracle_sql.json "
                  "(typo, or a rows-only gate)")
        if not os.path.isdir(os.path.join(out_dir, name)):
            results[name] = "MISSING RESULT DIR (query failed in Verify?)"
            n_bad += 1
    def check_one(name):
        """One gate's full compare; returns (name, verdict string).
        Runs on a worker thread with its own DuckDB cursor — gates are
        independent, per-gate parse/plan + pandas overhead dominates
        the serial walk (189 s for 236 gates), and the verdicts are
        accumulated then printed sorted, so output is byte-identical
        to the sequential version. Any unexpected exception (truncated
        parquet from a killed Verify, a cursor error) fails THIS gate
        only — propagating through pool.map would abort the whole
        check and lose every other gate's verdict."""
        try:
            return check_one_inner(name)
        except Exception as e:
            return name, f"CHECK-ERROR: {type(e).__name__}: {e}"
    def check_one_inner(name):
        d = os.path.join(out_dir, name)
        # sorted: part-00000..N must concatenate in write order or the
        # ordered comparison (and WARN-UNORDERED) is nondeterministic
        files = sorted(glob.glob(f"{d}/*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            # no oracle = weaker check; count separately so the gap is visible
            return name, ("rows-only:" +
                          ("WARN-NO-ORACLE" if len(got) > 0 else "EMPTY"))
        try:
            exp = con.cursor().sql(oracles[name]).df()
        except Exception as e:
            return name, f"ORACLE-SQL-ERROR: {e}"
        g, g_arr = norm(got)
        e, _ = norm(exp)
        if g_arr:
            # the driver comparator cannot hash array columns — this
            # gate WILL fail there; fail it here too
            return name, (f"ARRAY-COLUMN {g_arr}: driver comparator "
                          "cannot hash this; scalarize at the gate "
                          "boundary (array_join)")
        if list(g.columns) != list(e.columns):
            return name, f"SCHEMA: got {list(g.columns)} vs exp {list(e.columns)}"
        if len(g) != len(e):
            return name, f"ROWS: got {len(g)} vs exp {len(e)}"
        # dtypes may differ (int32 vs int64 etc.) -> compare as objects
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            return name, "OK"
        except AssertionError as ex:
            # retry order-insensitively
            try:
                gs = g.sort_values(list(g.columns)).reset_index(drop=True)
                es = e.sort_values(list(e.columns)).reset_index(drop=True)
                pd.testing.assert_frame_equal(gs, es, check_dtype=False, check_exact=True)
                # order contract violated: values match but the stated
                # total-order ORDER BY determinism does not hold — warn
                return name, "WARN-UNORDERED (row order differs!)"
            except Exception:
                return name, "VALUES: " + str(ex).split("\n")[0]

    todo = [name for name in sorted(os.listdir(out_dir))
            if os.path.isdir(os.path.join(out_dir, name))
            # stale result dir from a previous full/other-subset run:
            # comparing it against CURRENT oracle SQL yields false
            # failures (or stale passes) — skip outside the declared set
            and not (only and name not in expected)]
    from concurrent.futures import ThreadPoolExecutor
    workers = int(os.environ.get("ORACLE_CHECK_THREADS", "4"))
    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        for name, verdict in pool.map(check_one, todo):
            results[name] = verdict
            if verdict == "OK":
                n_ok += 1
            elif "WARN" in verdict:
                n_warn += 1
            else:
                n_bad += 1
    for k, v in sorted(results.items()):
        tag = "PASS" if v == "OK" else ("WARN" if "WARN" in v else "FAIL")
        print(f"{tag:4} {k:24} {v}")
    print(f"\n{n_ok} ok, {n_warn} warn, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))

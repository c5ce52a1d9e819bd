#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads <verifyOutDir>/oracle_sql.json, registers each testdata parquet
as a DuckDB view, runs every oracle SQL, and compares against the
Spark-dumped parquet in <verifyOutDir>/<name>/ — columns sorted by
name, rows sorted, values compared exactly (floats to 1e-12 rel).

Dev tool only — the Scala library has no dependency on this.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # list/ndarray cells are unhashable for sort_values — tuple-ize
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     hasattr(v, "__array__") and not isinstance(v, str)).any():
            df[c] = df[c].map(
                lambda v: tuple(v) if v is not None and not isinstance(v, (str, float, int)) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def dtype_class(dt) -> str:
    k = getattr(dt, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list:
    errs = []
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} duck={len(b)}"]
    # Driver's hash gate stringifies values, so int64 "3" vs float64 "3.0"
    # is a hash mismatch even when numerically equal (DuckDB HUGEINT SUM →
    # pandas float64). Be dtype-strict here so local green == driver green.
    for c in a.columns:
        ca, cb = dtype_class(a[c].dtype), dtype_class(b[c].dtype)
        if ca != cb and not (len(a) == 0):
            # nullable all-None columns surface as object on one side; only
            # flag genuinely numeric class mismatches
            if {ca, cb} <= {"int", "float", "bool"}:
                errs.append(
                    f"col {c}: DTYPE MISMATCH spark={a[c].dtype} duck={b[c].dtype}"
                    " (driver hash gate would fail — cast the oracle SQL)")
    if errs:
        return errs
    for c in a.columns:
        av, bv = a[c], b[c]
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) or isinstance(y, float):
                xf = float("nan") if x is None else float(x)
                yf = float("nan") if y is None else float(y)
                if math.isnan(xf) and math.isnan(yf):
                    continue
                if xf != yf and abs(xf - yf) > 1e-12 * max(1.0, abs(xf), abs(yf)):
                    errs.append(f"col {c} row {i}: spark={x!r} duck={y!r}")
                    break
                if xf != yf:
                    errs.append(f"col {c} row {i}: NEAR-MISS spark={x!r} duck={y!r}")
                    break
            elif x != y and str(x) != str(y):
                errs.append(f"col {c} row {i}: spark={x!r} duck={y!r}")
                break
    return errs


def main(sf_dir: str, out_dir: str, only=None, timeout=None) -> int:
    import os
    import threading

    def fresh_con():
        # Resource guards: scaled-SF oracle runs can spill big — an
        # uncapped run once filled the disk with 75 GB of duckdb_temp_*
        # blocks (in the CWD by default, i.e. inside the repo). Pin the
        # spill to /tmp and cap it; overridable via env for bigger
        # boxes.
        c = duckdb.connect()
        tmp = os.environ.get("GRAFT_DUCK_TMP", "/tmp/graft_duck_tmp")
        os.makedirs(tmp, exist_ok=True)
        c.execute(f"SET temp_directory='{tmp}'")
        # compare() sorts rows by every column, so result order is
        # irrelevant — and order preservation is the dominant memory
        # cost of DuckDB's big hash joins (the 25x p-family oracles
        # spilled >40 GiB with it on)
        c.execute("SET preserve_insertion_order=false")
        if os.environ.get("GRAFT_DUCK_THREADS"):
            c.execute(f"SET threads={int(os.environ['GRAFT_DUCK_THREADS'])}")
        c.execute("SET max_temp_directory_size='"
                  + os.environ.get("GRAFT_DUCK_TMP_MAX", "30GB") + "'")
        if os.environ.get("GRAFT_DUCK_MEM"):
            c.execute(f"SET memory_limit='{os.environ['GRAFT_DUCK_MEM']}'")
        for t in TABLES:
            # driver testdata is a single file; ScaleGen output is a
            # Spark-style directory of part files — glob accordingly
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return c

    con = fresh_con()
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_to = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        timer = None
        timed_out = []
        done = threading.Event()
        if timeout:
            # `done` closes the race where the timer fires between
            # fetchdf returning and cancel(): an interrupt() delivered
            # then would abort the NEXT oracle and misreport it as FAIL
            def kill(c=con, flag=timed_out, done=done):
                if done.is_set():
                    return
                flag.append(True)
                c.interrupt()
            timer = threading.Timer(timeout, kill)
            timer.start()
        try:
            duck = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            # stop and drain the timer BEFORE closing: the finally
            # clause only runs at the `continue` below, i.e. AFTER this
            # body — so without this a kill() already mid-run could
            # interrupt() a connection concurrently being close()d
            # (thread race on the duckdb handle), and the finally's
            # absorb would execute against the fresh connection, where
            # it drains nothing. timer=None makes the finally skip its
            # (now redundant) join/absorb.
            done.set()
            if timer:
                timer.cancel()
                timer.join()
                timer = None
                try:
                    con.execute("SELECT 1")
                except Exception:  # noqa: BLE001
                    pass
            if timed_out:
                print(f"TIMEOUT {name}: oracle exceeded {timeout:.0f}s in DuckDB")
                n_to += 1
            else:
                print(f"FAIL {name}: duckdb error: {e}")
                n_bad += 1
            # an aborted query can leave its spill blocks in the shared
            # temp storage file for the life of the CONNECTION, and the
            # stale usage counts against max_temp_directory_size — one
            # over-budget oracle then fails every later one at "0 bytes
            # requested" (observed at 25x: d05's 28 GiB of orphaned
            # spill OOM'd six innocent queries). A fresh connection
            # releases the temp file.
            con.close()
            con = fresh_con()
            continue
        finally:
            done.set()
            if timer:
                timer.cancel()
                # cancel() can't stop a kill() already mid-run (it may
                # have passed its done.is_set() check before done.set()
                # above); join() waits until the timer thread has either
                # skipped or fully delivered its interrupt, then the
                # unconditional absorb drains it so it can never abort
                # the next oracle and misreport it as FAIL
                timer.join()
                try:
                    con.execute("SELECT 1")
                except Exception:  # noqa: BLE001
                    pass
        try:
            spark = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: no spark output: {e}")
            n_bad += 1
            continue
        errs = compare(name, spark, duck)
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs[:3]))
            n_bad += 1
        else:
            print(f"ok   {name} ({len(spark)} rows)")
            n_ok += 1
    extra = f", {n_to} timeout" if n_to else ""
    print(f"\n{n_ok} ok, {n_bad} fail{extra} "
          f"(+{len(set(json.load(open(f'{out_dir}/oracle_sql.json')))) } with oracle)")
    # a timed-out oracle is NOT a pass: a hung/regressed oracle must
    # fail the pre-check loudly, not exit 0
    return 1 if (n_bad or n_to) else 0


if __name__ == "__main__":
    # argv: sfDir outDir [onlyNames] [perQueryTimeoutSec]
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3
                  and sys.argv[3] != "-" else None,
                  float(sys.argv[4]) if len(sys.argv) > 4 else None))

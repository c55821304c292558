#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir> [--timeout SEC] [--json OUT]
       [--workers N]

Loads each <name> result parquet, runs oracle_sql.json[<name>] in DuckDB
with the sf tables registered, sorts columns by name + rows, compares.

--timeout SEC  kill an oracle query that runs longer (status TIMEOUT) —
               needed at sf>=1 where a few documented-quadratic all-pairs
               oracle SQLs (NOT the Spark side) would take hours. Each
               query runs in its own subprocess so a kill is clean.
--json OUT     also write a machine-readable per-entry result file in the
               CORRECTNESS_r{N}.json shape (committed sf1 evidence).
--workers N    babysit N query subprocesses in parallel (default 1).
"""
import json
import os
import subprocess
import sys
import tempfile
from concurrent.futures import ThreadPoolExecutor

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]


def check_one(sfdir, outdir, name, sql):
    """-> (result dict, mismatch detail or None)"""
    import duckdb
    res = {"spark_rows": None, "oracle_rows": None, "rows_match": False,
           "schema_match": False, "hash_match": False, "err": None}
    res_dir = f"{outdir}/{name}"
    if not os.path.isdir(res_dir):
        res["err"] = "missing result dir"
        return res, None
    try:
        con = duckdb.connect()
        # big-sf runs: bound DuckDB's memory (default 80% of RAM fights
        # a co-resident Spark JVM into pathological spilling) and point
        # its spill at a roomy filesystem instead of cwd/.tmp
        mem = os.environ.get("GRAFT_DUCKDB_MEMLIMIT")
        if mem:
            con.execute(f"SET memory_limit='{mem}'")
        tmp = os.environ.get("GRAFT_DUCKDB_TMP")
        if tmp:
            os.makedirs(tmp, exist_ok=True)
            con.execute(f"SET temp_directory='{tmp}'")
        thr = os.environ.get("GRAFT_DUCKDB_THREADS")
        if thr:
            con.execute(f"SET threads TO {int(thr)}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
        mine = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        want = con.sql(sql).df()
        mine = mine.reindex(sorted(mine.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        schema_ok = list(mine.columns) == list(want.columns)
        mine_s = mine.sort_values(by=list(mine.columns)).reset_index(drop=True)
        want_s = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        rows_ok = len(mine_s) == len(want_s)
        # value compare: exact on strings/ints, tolerant-free on floats
        vals_ok = (rows_ok and schema_ok and
                   mine_s.astype(str).equals(want_s.astype(str)))
        res.update(spark_rows=len(mine_s), oracle_rows=len(want_s),
                   rows_match=rows_ok, schema_match=schema_ok,
                   hash_match=vals_ok)
        detail = None
        if not vals_ok and rows_ok and schema_ok:
            diff = (mine_s.astype(str) != want_s.astype(str))
            bad = diff.any(axis=1)
            detail = f"{mine_s[bad].head(3)}\n{want_s[bad].head(3)}"
        return res, detail
    except Exception as e:
        res["err"] = str(e)
        return res, None


def run_inline(sfdir, outdir):
    """No-flags path: sequential, same output as the driver's gate."""
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        res, detail = check_one(sfdir, outdir, name, sql)
        ok, fail = report(name, res, detail, ok, fail)
    print(f"\n{ok} ok, {fail} failed")
    return {}


def report(name, res, detail, ok, fail):
    if res["err"] == "missing result dir":
        print(f"MISSING  {name}"); fail += 1
    elif res["err"]:
        print(f"ERROR    {name}: {res['err']}"); fail += 1
    elif res["hash_match"]:
        print(f"OK       {name} rows={res['spark_rows']}"); ok += 1
    else:
        print(f"MISMATCH {name} rows={res['spark_rows']}/"
              f"{res['oracle_rows']} schema_ok={res['schema_match']}")
        if detail:
            print(detail)
        fail += 1
    return ok, fail


def run_subprocess(sfdir, outdir, timeout, workers):
    """One subprocess per oracle query; a timeout kills just that query."""
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    items = sorted(oracle.items())
    results = {}
    timeouts = 0

    def one(name):
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            rf = tf.name
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), sfdir, outdir,
                 "--one", name, "--result-file", rf],
                timeout=timeout, capture_output=True, text=True)
            if p.returncode != 0:
                return name, {"err": f"checker subprocess rc={p.returncode}: "
                              f"{p.stderr[-400:]}"}, None
            with open(rf) as f:
                payload = json.load(f)
            return name, payload["res"], payload.get("detail")
        except subprocess.TimeoutExpired:
            return name, {"err": f"oracle timeout >{timeout:.0f}s "
                          "(documented-quadratic oracle SQL; the Spark "
                          "result parquet exists in the verify out dir)",
                          "timeout": True}, None
        finally:
            if os.path.exists(rf):
                os.unlink(rf)

    ok = fail = 0
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for name, res, detail in pool.map(one, [n for n, _ in items]):
            base = {"spark_rows": None, "oracle_rows": None,
                    "rows_match": False, "schema_match": False,
                    "hash_match": False, "err": None}
            base.update(res)
            results[name] = base
            if base.get("timeout"):
                print(f"TIMEOUT  {name} (oracle sql >{timeout:.0f}s)")
                timeouts += 1
            else:
                ok, fail = report(name, base, detail, ok, fail)
    tail = f", {timeouts} oracle-timeout" if timeouts else ""
    print(f"\n{ok} ok, {fail} failed{tail}")
    return results


def main():
    argv = sys.argv[1:]
    args = [a for i, a in enumerate(argv)
            if not a.startswith("--") and (i == 0 or not argv[i-1].startswith("--"))]
    sfdir, outdir = args[0], args[1]

    def opt(flag, default=None):
        return argv[argv.index(flag) + 1] if flag in argv else default

    if opt("--one"):
        name = opt("--one")
        sql = json.load(open(f"{outdir}/oracle_sql.json"))[name]
        res, detail = check_one(sfdir, outdir, name, sql)
        with open(opt("--result-file"), "w") as f:
            json.dump({"res": res, "detail": detail}, f)
        return

    timeout = float(opt("--timeout", 0)) or None
    json_out = opt("--json")
    workers = int(opt("--workers", 1))
    if timeout or workers > 1 or json_out:
        results = run_subprocess(sfdir, outdir, timeout, workers)
    else:
        results = run_inline(sfdir, outdir)
    if json_out:
        for r in results.values():
            r.pop("timeout", None)
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()

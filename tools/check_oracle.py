#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each <outDir>/<name>/ parquet written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
same sfDir parquet tables, sorts columns by name, and compares exactly
(row count, dtype-insensitive cell equality). Dev tool only — the real
gate is driver-side.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [--only-dumped]

--only-dumped scores only the queries Verify actually dumped (for
SPARK_GRAFT_ONLY slices, e.g. the sf1 correctness tier).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and int-valued floats
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def main(sf_dir, out_dir, only_dumped=False, query=None):
    import os
    con = duckdb.connect()
    # an in-memory DuckDB connection cannot spill, so a window/join-heavy
    # oracle over the sf10 corpus (60 M lineitem) dies rc=137 instead of
    # offloading; opt-in knobs for the big-SF gate loops
    # DuckDB's SET rejects prepared-statement parameters, so the env
    # knobs are escaped + validated before interpolation (r10 ADVICE:
    # a path containing a quote used to break the SET with a confusing
    # parse error; now quotes are SQL-doubled and control characters
    # fail loudly at the source)
    def set_knob(setting, value):
        if any(ord(c) < 32 for c in value):
            raise ValueError(f"{setting}: control character in {value!r}")
        con.execute(f"SET {setting} = '" + value.replace("'", "''") + "'")
    tmp = os.environ.get("CHECK_ORACLE_TMP")
    if tmp:
        set_knob("temp_directory", tmp)
        # bound the spill so a pathological oracle can't fill the disk
        # out from under every other process (r10: three concurrent
        # spills ENOSPC'd /tmp and poisoned an unrelated test run)
        cap = os.environ.get("CHECK_ORACLE_TMP_MAX")
        if cap:
            set_knob("max_temp_directory_size", cap)
    mem = os.environ.get("CHECK_ORACLE_MEM")
    if mem:
        set_knob("memory_limit", mem)
    for t in TABLES:
        # harness SFs are single files; Spark-written siblings (the
        # ScaleUp sf1 dir) are part-file directories
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only_dumped:
        # slice mode (sf1 correctness tier): Verify was run with
        # SPARK_GRAFT_ONLY, so score only the queries actually dumped
        oracle = {n: s for n, s in oracle.items()
                  if os.path.isdir(f"{out_dir}/{n}")}
    if query:
        # single-query mode: lets a driver loop wrap each oracle in its
        # own subprocess + timeout (a pathological oracle at a big SF
        # must not block the rest of the slice)
        oracle = {query: oracle[query]}
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_types = dict(zip(got.columns, [str(t) for t in got.types]))
            got_rows = con.sql(
                f"SELECT {', '.join(got_cols)} FROM got").fetchall()
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_types = dict(zip(exp.columns, [str(t) for t in exp.types]))
            exp_rows = con.sql(
                f"SELECT {', '.join(exp_cols)} FROM exp").fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            failures += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            failures += 1
            continue
        mismatched = [c for c in got_cols if got_types[c] != exp_types[c]]
        if mismatched:
            # dtype drift is a warning: the driver may or may not be
            # strict, but aligned types are always safer
            detail = {c: (got_types[c], exp_types[c]) for c in mismatched}
            print(f"WARN {name}: dtype mismatch {detail}")
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            failures += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            gn, en = [norm(v) for v in g], [norm(v) for v in e]
            if gn != en:
                bad = (i, gn, en)
                break
        if bad:
            print(f"FAIL {name}: first diff at row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got_rows)} rows")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    qarg = [a.split("=", 1)[1] for a in sys.argv[3:] if a.startswith("--query=")]
    sys.exit(main(sys.argv[1], sys.argv[2],
                  only_dumped="--only-dumped" in sys.argv[3:],
                  query=qarg[0] if qarg else None))

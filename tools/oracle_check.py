#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (NOT shipped code; dev tool).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each <verifyOutDir>/<name>/ parquet dir written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir parquet tables,
canonicalizes both results (columns sorted by name, rows sorted), and
compares. Reports exact-match and max numeric deviation per query.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if hasattr(v, "timestamp"):  # datetime -> epoch float
        return v.isoformat()
    if isinstance(v, float) and v.is_integer():
        return v
    return v


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    sc, srows = canon(spark_rows, spark_cols)
    dc, drows = canon(duck_rows, duck_cols)
    if sc != dc:
        return f"FAIL schema: spark={sc} duck={dc}"
    if len(srows) != len(drows):
        return f"FAIL rowcount: spark={len(srows)} duck={len(drows)}"
    maxdev = 0.0
    for a, b in zip(srows, drows):
        for x, y in zip(a, b):
            if x == y:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                maxdev = max(maxdev, abs(x - y))
                if abs(x - y) > 1e-9:
                    return f"FAIL value: {x!r} != {y!r} (row {a} vs {b})"
            else:
                return f"FAIL value: {x!r} != {y!r} (row {a} vs {b})"
    tag = "OK-exact" if maxdev == 0.0 else f"OK-dev={maxdev:.2e}"
    return f"{tag} rows={len(srows)}"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os as _os
    for t in TABLES:
        # driver testdata ships single files; Spark (e.g. ScaleGen output)
        # writes directories of part files — accept both layouts
        path = f"{sf_dir}/{t}.parquet"
        if _os.path.isdir(path):
            path = f"{path}/*.parquet"
        sel = f"SELECT * FROM read_parquet('{path}')"
        if t == "events":
            # driver fixture ships ts as parquet timestamp[ns]; ScaleGen
            # replicas ship plain INT64 nanos (Spark can't write ns) —
            # normalize the latter to TIMESTAMP so the oracle SQL's
            # epoch_ms(ts) arithmetic sees one type everywhere
            (ts_type,) = [r[1] for r in con.execute(
                f"DESCRIBE {sel}").fetchall() if r[0] == "ts"]
            if ts_type == "BIGINT":
                sel = (f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                       f"FROM read_parquet('{path}')")
        con.execute(f"CREATE VIEW {t} AS {sel}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import glob
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: FAIL no spark parquet output")
            failures += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        spark_cols = [d[0] for d in sdf.description]
        spark_rows = sdf.fetchall()
        # Dtype lint: the driver gate hashes DECIMAL and FLOAT columns
        # through engine-specific dtype paths (44.00 vs 44.0) — values can
        # be identical yet hash-mismatch. Reject them here so this mimic
        # can never be green where the gate is red (the r6 p16/w12 bug).
        typed = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        ).fetchall()
        bad = [(c, t) for c, t, *_ in typed
               if t.upper().startswith("DECIMAL") or t.upper() == "FLOAT"]
        if bad:
            print(f"{name}: FAIL dtype-lint: decimal/float output columns "
                  f"{bad} — emit integer units (cents/micros) or DOUBLE "
                  f"via the rounding idioms instead")
            failures += 1
            continue
        if name not in oracle:
            print(f"{name}: rows-only ({len(spark_rows)} rows, "
                  f"{'OK' if spark_rows else 'EMPTY!'})")
            continue
        try:
            ddf = con.execute(oracle[name])
            duck_cols = [d[0] for d in ddf.description]
            duck_rows = ddf.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL oracle sql error: {e}")
            failures += 1
            continue
        verdict = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if verdict.startswith("FAIL"):
            failures += 1
        print(f"{name}: {verdict}")
    extra = set(oracle) - set(names)
    if extra:
        print(f"WARNING: oracle entries with no spark output: {sorted(extra)}")
        failures += 1
    print(f"== {'ALL OK' if failures == 0 else f'{failures} FAILURES'} ==")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

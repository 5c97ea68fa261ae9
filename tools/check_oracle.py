#!/usr/bin/env python3
"""Local mimic of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [key ...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
every parquet table in <sfDir> as a DuckDB view, runs each oracle SQL, and
compares against the Spark result parquet at <verifyOutDir>/<key>/ —
columns sorted by name, exact value compare (after canonicalizing NaN→None
and float round-trip). Exit code = number of mismatched queries.
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    return v


def rows_of(rel, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(canon(r[i]) for i in order) for r in rel]


def main():
    sf_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    only = set(sys.argv[3:])
    # the oracle DIALECT is version-sensitive (DECIMAL promotion rules
    # changed across DuckDB releases — the dsir_weight r10/r11 driver
    # red); stamp every sweep so "green locally" is attributable to an
    # exact dialect version
    print(f"[oracle] duckdb {duckdb.__version__}")
    con = duckdb.connect()
    for p in sorted(sf_dir.glob("*.parquet")):
        con.execute(
            f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    failed = []
    for key, sql in sorted(oracle.items()):
        if only and key not in only:
            continue
        spark_dir = out_dir / key
        if not spark_dir.exists():
            print(f"[FAIL] {key}: no spark result at {spark_dir}")
            failed.append(key)
            continue
        try:
            oc = con.execute(sql)
            ocols = [d[0] for d in oc.description]
            orows = rows_of(oc.fetchall(), ocols)
        except Exception as e:
            print(f"[FAIL] {key}: oracle SQL error: {e}")
            failed.append(key)
            continue
        sc = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols = [d[0] for d in sc.description]
        srows = rows_of(sc.fetchall(), scols)
        if sorted(ocols) != sorted(scols):
            print(f"[FAIL] {key}: column mismatch spark={sorted(scols)} "
                  f"oracle={sorted(ocols)}")
            failed.append(key)
            continue
        if srows == orows:
            print(f"[ OK ] {key}: {len(srows)} rows")
            continue
        # float-determinism fallback (SURVEY §2.0 r6): at sf>=0.1 the
        # avg family can differ by 1 ulp BEFORE the 6-decimal round and
        # flip the rounded digit at an exact .5 boundary. An exact-hash
        # miss that is value-equal within 1e-6 absolute on floats (and
        # exact on everything else) is reported OK~ — a rounding-edge
        # artifact, not a semantic divergence. The driver's own compare
        # is stricter; this tells us which kind of failure we have.
        # 1.05e-6, not 1e-6: a one-unit difference in the 6th decimal is
        # THE rounding-edge class this fallback exists for, but the two
        # rounded doubles' binary difference can exceed decimal 1e-6 by
        # a few ulps (e.g. 43.472812 vs 43.472813 differ by
        # 1.0000000000287557e-06) — the old boundary misclassified the
        # class it was built to catch as FAIL. 1.05e-6 still excludes a
        # two-unit (2e-6) difference.
        if len(srows) == len(orows) and all(
                len(s) == len(o) and all(
                    (isinstance(a, float) and isinstance(b, float)
                     and abs(a - b) <= 1.05e-6) or a == b
                    for a, b in zip(s, o))
                for s, o in zip(srows, orows)):
            print(f"[ OK~ ] {key}: {len(srows)} rows equal within 1.05e-6 "
                  f"(rounding-edge, not semantic)")
            continue
        failed.append(key)
        print(f"[FAIL] {key}: rows spark={len(srows)} oracle={len(orows)}")
        for i, (s, o) in enumerate(zip(srows, orows)):
            if s != o:
                print(f"       first diff at row {i}: spark={s} oracle={o}")
                break
        else:
            n = min(len(srows), len(orows))
            print(f"       length differs after common prefix {n}")
    print(f"== {len(oracle) if not only else len(only)} checked, "
          f"{len(failed)} failed: {failed}")
    sys.exit(len(failed))


if __name__ == "__main__":
    main()

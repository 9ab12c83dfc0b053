#!/usr/bin/env python3
"""Dev-only pre-check of the DuckDB oracle gate (mimics the driver).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, and compares: schema (column names), row count,
DTYPES (a pandas-dtype mismatch is a HARD FAIL — the driver's hash is
type-sensitive, so HUGEINT/DECIMAL leaking from the oracle fails the
gate even when values agree), and values (columns sorted by name;
exact equality including the Python value type on object columns, so
Decimal(1) vs 1.0 is a diff). This is NOT part of the engine — it
only de-risks the driver's CORRECTNESS gate before a round ends.

Caveat: this container pins duckdb 1.0.0 (offline) while the driver
runs a newer release; version-dependent SQL semantics (NULL-by
arg_max, decimal promotion width) can still pass here and fail there.
The defense is discipline, not this tool: oracle SQL must only emit
BIGINT/VARCHAR/DATE/explicitly-CAST DECIMAL with no implicit
promotion reaching the final projection.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.sql(sql).df()
            got = got.reindex(sorted(got.columns), axis=1)
            exp = exp.reindex(sorted(exp.columns), axis=1)
            if list(got.columns) != list(exp.columns):
                raise AssertionError(
                    f"columns {list(got.columns)} != {list(exp.columns)}")
            if len(got) != len(exp):
                raise AssertionError(f"rows {len(got)} != {len(exp)}")
            # order-insensitive compare (sort by all columns)
            cols = list(got.columns)
            g = got.sort_values(cols, na_position="first").reset_index(drop=True)
            e = exp.sort_values(cols, na_position="first").reset_index(drop=True)
            def typed(v):
                # value + concrete type: Decimal('1') != 1 != 1.0
                return None if v is None else (type(v).__name__, repr(v))

            def col_eq(gv, ev):
                both_na = gv.isna() & ev.isna()
                if str(gv.dtype) == "object" or str(ev.dtype) == "object":
                    eq = (gv.where(gv.notna(), None).map(typed) ==
                          ev.where(ev.notna(), None).map(typed))
                else:
                    eq = (gv.astype(object).where(gv.notna(), None) ==
                          ev.astype(object).where(ev.notna(), None))
                return eq | both_na

            mismatches = []
            for c in cols:
                gv, ev = g[c], e[c]
                # dtype mismatch is a HARD FAIL: the driver hashes
                # dtype-sensitively, so HUGEINT rendering as float64
                # fails the gate even with identical values.
                if str(gv.dtype) != str(ev.dtype):
                    mismatches.append(
                        f"col {c}: DTYPE {gv.dtype} != {ev.dtype}")
                    continue
                eq = col_eq(gv, ev)
                bad = (~eq).sum()
                if bad:
                    i = (~eq).idxmax()
                    mismatches.append(
                        f"col {c}: {bad} diffs, first at row {i}: "
                        f"{gv[i]!r} != {ev[i]!r}")
            if mismatches:
                raise AssertionError("; ".join(mismatches))
            # order-sensitive check too (in case the driver hashes in order)
            ordered_ok = all(col_eq(got[c], exp[c]).all() for c in cols)
            flag = "" if ordered_ok else "  [WARN row-order differs]"
            print(f"PASS {name} ({len(got)} rows){flag}")
            n_pass += 1
        except Exception as exc:
            print(f"FAIL {name}: {exc}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))

#!/usr/bin/env python3
"""DuckDB-version-drift guard: scan a Verify output directory and flag
gate columns whose physical type is cross-release HAZARDOUS.

Background (COVERAGE.md round-6 block): the driver runs a NEWER DuckDB
than the offline container's 1.0.0, and the one class of cross-release
breakage this project ever hit was decimal canonicalization — DECIMAL
columns routed through arg_max / precision-38 windows hashed
differently across releases even when values matched row-for-row. The
standing defense is the BIGINT/VARCHAR/DATE(+BOOLEAN/DOUBLE-as-single-
division) final-projection discipline. This tool makes that discipline
a CHECK instead of a convention: it fails if any gate's output parquet
carries a DECIMAL column, and reports (informationally) FLOAT columns,
which are safe only when both engines compute the identical IEEE tree.

Usage: python3 tools/check_projection_types.py <verify_out_dir>
Exit 0 = no DECIMAL anywhere; 1 otherwise.
"""
import sys
import glob
import os

import pyarrow.parquet as pq
import pyarrow as pa


def main(out_dir: str) -> int:
    bad = []
    floats = []
    gates = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    for gate in gates:
        files = glob.glob(os.path.join(out_dir, gate, "*.parquet"))
        if not files:
            continue
        schema = pq.read_schema(files[0])
        for field in schema:
            t = field.type
            if pa.types.is_decimal(t):
                bad.append((gate, field.name, str(t)))
            elif pa.types.is_floating(t):
                floats.append((gate, field.name, str(t)))
    for g, c, t in bad:
        print(f"DECIMAL-HAZARD {g}.{c}: {t}")
    print(f"{len(gates)} gates scanned, {len(bad)} decimal-hazard "
          f"columns, {len(floats)} float columns (allowed: identical "
          f"IEEE trees both engines)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"))

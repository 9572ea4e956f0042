#!/usr/bin/env python3
"""External-reader interop check for the engine's GeoParquet output.

Usage:
  python3 tools/geo_interop_check.py <store.parquet dir>

where <store> is a geohash3-partitioned store written by
graft.wod.Cli / WodPipeline.convertFile. Verifies, from a NON-Spark
reader (DuckDB):

  1. the data itself reads back (hive partitioning);
  2. every part file carries the GeoParquet 1.0.0 `geo` footer with
     WKB Point encoding;
  3. each file's footer bbox equals the true min/max lon/lat of that
     file's rows (the write-time auto-bbox contract).

This is the offline half of "a GeoParquet-aware external reader gets
correct metadata"; DuckDB's spatial extension (ST_GeomFromWKB) needs
network install, so WKB geometry decode is attempted best-effort.
"""
import glob
import json
import sys

import duckdb

store = sys.argv[1] if len(sys.argv) > 1 else None
if not store:
    sys.exit(__doc__)

con = duckdb.connect()
files = sorted(glob.glob(store + "/geohash3=*/*.parquet"))
assert files, f"no part files under {store}"

n, = con.execute(
    f"SELECT count(*) FROM read_parquet('{store}/*/*.parquet', "
    "hive_partitioning=1)").fetchone()
assert n > 0, "duckdb read 0 rows"

rows = con.execute(
    f"SELECT file_name, decode(value) FROM "
    f"parquet_kv_metadata('{store}/*/*.parquet') "
    "WHERE decode(key)='geo'").fetchall()
assert len(rows) == len(files), (
    f"{len(files) - len(rows)} part files missing the geo footer")

for fname, payload in rows:
    g = json.loads(payload)
    assert g["version"] == "1.0.0", g["version"]
    col = g["columns"][g["primary_column"]]
    assert col["encoding"] == "WKB", col
    assert col["geometry_types"] == ["Point"], col
    ext = con.execute(
        "SELECT min(longitude), min(latitude), max(longitude), "
        f"max(latitude) FROM read_parquet('{fname}')").fetchone()
    assert list(col["bbox"]) == list(ext), (
        f"{fname}: footer bbox {col['bbox']} != true extent {ext}")

try:
    con.execute("LOAD spatial")
    w, = con.execute(
        "SELECT ST_AsText(ST_GeomFromWKB(geometry)) FROM "
        f"read_parquet('{files[0]}') LIMIT 1").fetchone()
    assert w.startswith("POINT"), w
    print(f"spatial: WKB decodes as {w}")
except duckdb.Error as e:
    print(f"spatial extension unavailable (offline) - skipped: "
          f"{str(e).splitlines()[0]}")

print(f"INTEROP OK: {n} rows, {len(files)} part files, "
      "all geo footers valid with true per-file bbox")

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


# ---- geometry ROUND-TRIP (independent OGC WKB reader) ----------------
# DuckDB's spatial extension needs a network install, so decode the WKB
# with a from-scratch OGC 06-103r4 parser instead: byte order flag +
# uint32 type + two IEEE-754 doubles. Sharing zero code with the Scala
# writer, this is a true cross-implementation round-trip.
import struct


def parse_wkb_point(b: bytes):
    assert len(b) == 21, f"Point WKB must be 21 bytes, got {len(b)}"
    order = "<" if b[0] == 1 else ">"
    (gtype,) = struct.unpack(order + "I", b[1:5])
    assert gtype == 1, f"expected Point (1), got {gtype}"
    return struct.unpack(order + "dd", b[5:21])


mismatch = 0
for fname, payload in rows:
    g = json.loads(payload)
    bbox = g["columns"][g["primary_column"]]["bbox"]
    pts = con.execute(
        "SELECT geometry, longitude, latitude FROM "
        f"read_parquet('{fname}')").fetchall()
    for wkb, lon, lat in pts:
        x, y = parse_wkb_point(bytes(wkb))
        # exact: the writer serialized these very doubles
        if (x, y) != (lon, lat):
            mismatch += 1
        # and the footer bbox CONTAINS the decoded geometry
        assert bbox[0] <= x <= bbox[2] and bbox[1] <= y <= bbox[3], (
            f"{fname}: point ({x},{y}) outside footer bbox {bbox}")
assert mismatch == 0, f"{mismatch} WKB points != (longitude, latitude)"

# ---- bbox-predicate consistency --------------------------------------
# A spatial reader prunes files by footer bbox, then filters rows by
# decoded geometry. Both routes must agree: for a query window W, rows
# whose DECODED point falls in W == rows found in files whose footer
# bbox intersects W filtered the same way — i.e. footer pruning never
# drops a matching row.
west, south, east, north = con.execute(
    "SELECT min(longitude), min(latitude), "
    "avg(longitude), avg(latitude) FROM "
    f"read_parquet('{store}/*/*.parquet')").fetchone()
full = 0
pruned = 0
for fname, payload in rows:
    g = json.loads(payload)
    bbox = g["columns"][g["primary_column"]]["bbox"]
    pts = con.execute(
        f"SELECT geometry FROM read_parquet('{fname}')").fetchall()
    hits = sum(1 for (wkb,) in pts
               if west <= parse_wkb_point(bytes(wkb))[0] <= east
               and south <= parse_wkb_point(bytes(wkb))[1] <= north)
    full += hits
    intersects = not (bbox[2] < west or bbox[0] > east
                      or bbox[3] < south or bbox[1] > north)
    if intersects:
        pruned += hits
    else:
        assert hits == 0, (
            f"{fname}: footer bbox misses query window but {hits} "
            "decoded points match - pruning would lose rows")
assert full == pruned and full > 0, (full, pruned)
print(f"round-trip OK: every WKB point == (longitude, latitude), "
      f"inside its footer bbox; bbox pruning exact on a "
      f"{full}-row query window")

print(f"INTEROP OK: {n} rows, {len(files)} part files, "
      "all geo footers valid with true per-file bbox")

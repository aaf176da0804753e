"""J10 'serve' analog: point lookups of single tiles from a written
output, plus a tiny dev HTTP server.

Reference: ``mapchete serve`` reads one process tile per web request
with an LRU cache and per-tile locks (cli/mapchete/serve.py:105-139,
processing/base.py:637-665). Here outputs are parquet tile tables, so
a point lookup is a predicate-pushdown scan — served via DuckDB (no
JVM spin-up per request); the z-order write layout (plans/job.py) means
row-group min/max stats prune the scan to a handful of row groups.

Dev-server only (stdlib http.server, single process) — the production
read path is the partitioned table itself."""

from __future__ import annotations

import json
import os
import threading
from functools import lru_cache
from typing import Optional

import numpy as np

from mapchete_spark.operators.rastertable import decode_array
from mapchete_spark.tilegrid.pyramid import TilePyramid


class TileReader:
    """Read single tiles from <output_path>/tiles by (zoom, row, col)."""

    def __init__(self, output_path: str, cache_size: int = 256):
        self.path = output_path
        with open(os.path.join(output_path, "metadata.json")) as f:
            self.meta = json.load(f)
        self.pyramid = TilePyramid(**self.meta["pyramid"])
        import duckdb

        self._con = duckdb.connect()
        self._lock = threading.Lock()
        self._glob = os.path.join(output_path, "tiles", "**", "*.parquet")
        self._read_row = lru_cache(maxsize=cache_size)(self._read_row_uncached)

    def _read_row_uncached(self, zoom: int, row: int, col: int):
        with self._lock:  # duckdb connections are not thread-safe
            res = self._con.execute(
                f"""
                SELECT dtype, bands, height, width, nodata, data
                FROM read_parquet('{self._glob}', hive_partitioning = true)
                WHERE zoom = ? AND tile_row = ? AND tile_col = ?
                LIMIT 1
                """,
                [zoom, row, col],
            ).fetchone()
        return res

    def read_tile(self, zoom: int, row: int, col: int) -> Optional[np.ma.MaskedArray]:
        res = self._read_row(int(zoom), int(row), int(col))
        if res is None:
            return None
        dtype, bands, height, width, nodata, data = res
        return decode_array(bytes(data), dtype, bands, height, width, nodata)

    def tile_png(self, zoom: int, row: int, col: int) -> Optional[bytes]:
        """Tile as a PNG (uint8-scaled) for the dev server."""
        from mapchete_spark.sources.tiledir_export import encode_png

        arr = self.read_tile(zoom, row, col)
        if arr is None:
            return None
        a = np.asarray(arr.filled(0))
        if a.dtype != np.uint8:
            lo, hi = float(np.nanmin(a)), float(np.nanmax(a))
            span = (hi - lo) or 1.0
            a = ((a - lo) / span * 255.0).astype(np.uint8)
        return encode_png(a[0] if a.ndim == 3 else a)

    def cache_info(self):
        return self._read_row.cache_info()


def parse_tile_path(path: str):
    """(zoom, row, col) from either route shape the server accepts:

    - ``/{zoom}/{row}/{col}.png`` (the short dev route), or
    - ``/wmts_simple/1.0.0/{name}/default/{grid}/{zoom}/{row}/
      {col}.{ext}`` — the reference's WMTS-simple layout
      (mapchete/cli/mapchete/serve.py:116-139), so WMTS-simple
      clients pointed at the reference work unchanged here.
    """
    parts = [p for p in path.strip("/").split("/") if p]
    if parts and parts[0] == "wmts_simple":
        if len(parts) != 8 or parts[1] != "1.0.0" or parts[3] != "default":
            raise ValueError(f"not a WMTS-simple path: {path!r}")
        parts = parts[-3:]
    if len(parts) != 3:
        raise ValueError(f"not a tile path: {path!r}")
    z, r, c = parts
    return int(z), int(r), int(c.rsplit(".", 1)[0])


def serve(output_path: str, port: int = 5000, host: str = "127.0.0.1"):
    """Blocking dev server: GET /{zoom}/{row}/{col}.png or the
    reference's WMTS-simple path (parse_tile_path)."""
    import http.server

    reader = TileReader(output_path)

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib API name)
            try:
                z, r, c = parse_tile_path(self.path)
                png = reader.tile_png(z, r, c)
            except Exception:
                png = None
            if png is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(png)))
            self.end_headers()
            self.wfile.write(png)

        def log_message(self, *a):  # quiet
            pass

    httpd = http.server.ThreadingHTTPServer((host, port), Handler)
    httpd.serve_forever()

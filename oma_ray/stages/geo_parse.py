"""Geo-parse stage: extract lon/lat from raw page HTML.

The web-scale analogue of the reference's coordinate ingestion
(OSMXMLReader.java:75-77): pages carry geo hints in their HTML
(``<meta name="geo.position" content="LAT;LON">``, the de-facto GeoURL
convention, plus the ICBM variant); we extract with a single Arrow
``extract_regex`` kernel over the whole batch — no per-row Python — and
quantize degrees → fixed-point int32 with the reference's
trunc-toward-zero rounding.

The ``text`` column is never touched: byte-identical passthrough is the
per-row invariant (BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from oma_ray.functions.geo import quantize

_GEO_POSITION = (
    r'<meta name="geo\.position" content="(?P<glat>-?[0-9.]+);(?P<glon>-?[0-9.]+)"'
)
_ICBM = r'<meta name="ICBM" content="(?P<glat>-?[0-9.]+),\s*(?P<glon>-?[0-9.]+)"'


class GeoParse:
    """``map_batches`` callable appending nullable ``lon:int32, lat:int32``."""

    def __init__(self, html_col: str = "html"):
        self.html_col = html_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = pc.cast(batch.column(self.html_col), pa.string())
        ext = pc.extract_regex(html, _GEO_POSITION)
        lat_s = pc.struct_field(ext, "glat")
        lon_s = pc.struct_field(ext, "glon")
        # fall back to ICBM where geo.position missed
        miss = pc.is_null(lat_s)
        if pc.any(miss).as_py():
            ext2 = pc.extract_regex(html, _ICBM)
            lat_s = pc.if_else(miss, pc.struct_field(ext2, "glat"), lat_s)
            lon_s = pc.if_else(miss, pc.struct_field(ext2, "glon"), lon_s)

        lat_deg = pc.cast(lat_s, pa.float64()).to_numpy(zero_copy_only=False)
        lon_deg = pc.cast(lon_s, pa.float64()).to_numpy(zero_copy_only=False)
        valid = ~np.isnan(lat_deg) & ~np.isnan(lon_deg)
        lat_q = np.zeros(len(batch), dtype=np.int32)
        lon_q = np.zeros(len(batch), dtype=np.int32)
        lat_q[valid] = quantize(lat_deg[valid])
        lon_q[valid] = quantize(lon_deg[valid])
        return batch.append_column(
            "lon", pa.array(lon_q, type=pa.int32(), mask=~valid)
        ).append_column("lat", pa.array(lat_q, type=pa.int32(), mask=~valid))

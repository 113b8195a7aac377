"""Minimal pure-Python ESRI shapefile (.shp/.dbf) reader.

The reference's shapefile tools (tools_core/shpTester.py, shpInspect.py,
bridge_core shp_cutter.py) sit on geopandas/fiona, which are not part of
this image.  Polygon-class shapefiles are a simple well-documented binary
format, so the geometry path is implemented directly here; tools upgrade to
geopandas/shapely when importable (cli/dem_shp_tools.py) and fall back to
this reader otherwise.

Supports shape types: 1/11/21 (Point*), 3/13/23 (PolyLine*), 5/15/25
(Polygon*) — Z/M variants are read as 2-D.  The companion .dbf (dBase III)
attribute table is parsed for field names and text/numeric values.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

SHAPE_NAMES = {
    0: "Null", 1: "Point", 3: "PolyLine", 5: "Polygon", 8: "MultiPoint",
    11: "PointZ", 13: "PolyLineZ", 15: "PolygonZ", 18: "MultiPointZ",
    21: "PointM", 23: "PolyLineM", 25: "PolygonM", 28: "MultiPointM",
}
_POLYGONS = (5, 15, 25)
_POLYLINES = (3, 13, 23)
_POINTS = (1, 11, 21)


@dataclass
class ShpRecord:
    number: int
    shape_type: int
    # polygons/polylines: list of rings/parts, each a list of (x, y)
    parts: List[List[Tuple[float, float]]] = field(default_factory=list)
    point: Optional[Tuple[float, float]] = None


@dataclass
class ShpFile:
    shape_type: int
    bbox: Tuple[float, float, float, float]   # xmin, ymin, xmax, ymax
    records: List[ShpRecord]
    fields: List[str] = field(default_factory=list)
    attributes: List[Dict[str, object]] = field(default_factory=list)

    @property
    def shape_name(self) -> str:
        return SHAPE_NAMES.get(self.shape_type, f"type{self.shape_type}")


def _read_multipart(buf: bytes) -> List[List[Tuple[float, float]]]:
    # after shape-type int: box(4d), numParts(i), numPoints(i), parts, points
    num_parts, num_points = struct.unpack_from("<ii", buf, 36)
    part_idx = list(struct.unpack_from(f"<{num_parts}i", buf, 44))
    pts_off = 44 + 4 * num_parts
    flat = struct.unpack_from(f"<{2 * num_points}d", buf, pts_off)
    pts = [(flat[2 * i], flat[2 * i + 1]) for i in range(num_points)]
    part_idx.append(num_points)
    return [pts[part_idx[k]:part_idx[k + 1]] for k in range(num_parts)]


def read_shp(path: Path | str) -> ShpFile:
    path = Path(path)
    data = path.read_bytes()
    if len(data) < 100 or struct.unpack_from(">i", data, 0)[0] != 9994:
        raise ValueError(f"{path}: not a shapefile (bad file code)")
    file_len = struct.unpack_from(">i", data, 24)[0] * 2
    shape_type = struct.unpack_from("<i", data, 32)[0]
    xmin, ymin, xmax, ymax = struct.unpack_from("<4d", data, 36)
    records: List[ShpRecord] = []
    off = 100
    while off + 8 <= min(file_len, len(data)):
        rec_no, content_len = struct.unpack_from(">ii", data, off)
        off += 8
        content = data[off:off + content_len * 2]
        off += content_len * 2
        if len(content) < 4:
            break
        stype = struct.unpack_from("<i", content, 0)[0]
        rec = ShpRecord(number=rec_no, shape_type=stype)
        if stype in _POLYGONS + _POLYLINES:
            rec.parts = _read_multipart(content)
        elif stype in _POINTS:
            x, y = struct.unpack_from("<2d", content, 4)
            rec.point = (x, y)
        records.append(rec)

    shp = ShpFile(shape_type=shape_type, bbox=(xmin, ymin, xmax, ymax),
                  records=records)
    dbf = path.with_suffix(".dbf")
    if dbf.exists():
        try:
            shp.fields, shp.attributes = read_dbf(dbf)
        except Exception:
            pass
    return shp


def read_dbf(path: Path | str):
    """dBase III field names + records (text decoded, numerics parsed)."""
    data = Path(path).read_bytes()
    n_rec = struct.unpack_from("<i", data, 4)[0]
    hdr_size, rec_size = struct.unpack_from("<hh", data, 8)
    fields = []   # (name, type, length)
    off = 32
    while off < hdr_size - 1 and data[off] != 0x0D:
        raw = data[off:off + 32]
        name = raw[:11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(raw[11])
        flen = raw[16]
        fields.append((name, ftype, flen))
        off += 32
    names = [f[0] for f in fields]
    records: List[Dict[str, object]] = []
    off = hdr_size
    for _ in range(n_rec):
        if off + rec_size > len(data):
            break
        row = data[off:off + rec_size]
        off += rec_size
        if row[:1] == b"*":      # deleted
            continue
        vals: Dict[str, object] = {}
        p = 1
        for name, ftype, flen in fields:
            cell = row[p:p + flen]
            p += flen
            text = cell.decode("latin-1", "replace").strip()
            if ftype in ("N", "F"):
                try:
                    vals[name] = float(text) if ("." in text or "e" in text.lower()) else int(text)
                except ValueError:
                    vals[name] = None
            else:
                vals[name] = text
        records.append(vals)
    return names, records


def ring_area(ring: List[Tuple[float, float]]) -> float:
    """Signed shoelace area (negative = clockwise = shapefile outer ring)."""
    a = 0.0
    n = len(ring)
    for i in range(n - 1):
        x0, y0 = ring[i]
        x1, y1 = ring[i + 1]
        a += x0 * y1 - x1 * y0
    return 0.5 * a


def polygon_defects(rec: ShpRecord) -> List[str]:
    """Degeneracy audit of one polygon record — the pure-python subset of
    the reference shpTester checks (null/empty/too few points/ring not
    closed/zero area)."""
    issues: List[str] = []
    if rec.shape_type == 0:
        return ["null"]
    if not rec.parts:
        return ["empty"]
    for k, ring in enumerate(rec.parts):
        if len(ring) < 4:
            issues.append(f"part{k}:too_few_points")
            continue
        if ring[0] != ring[-1]:
            issues.append(f"part{k}:ring_not_closed")
        if abs(ring_area(ring)) <= 0.0:
            issues.append(f"part{k}:zero_area")
    return issues

"""Local-grid <-> geographic transforms for postprocessing.

Clean-room equivalent of the TransformModel in tools_core/vtk2nc_new.py
(:393-468): the solver grid lives in a rotated, origin-shifted UTM frame;
this module rebuilds the forward/inverse mapping from the deck's Generated
fields (utm_crs, rotate_deg, cut_lon/lat) using the built-in UTM math.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

from ..pre.utm import lonlat_to_utm, utm_to_lonlat


@dataclass
class TransformModel:
    zone: int
    northern: bool
    rotate_deg: float
    utm_center: Tuple[float, float]   # UTM coords of the rotated-domain center
    local_center: Tuple[float, float]  # local coords of the same point

    @classmethod
    def from_deck(cls, deck, si_size_xy: Tuple[float, float]) -> "TransformModel":
        lon_pair = deck.get_pair("cut_lon_manual")
        lat_pair = deck.get_pair("cut_lat_manual")
        if lon_pair is None or lat_pair is None:
            raise ValueError("deck missing cut_lon_manual/cut_lat_manual")
        crs = (deck.get_text("utm_crs") or "").upper()
        if crs.startswith("EPSG:"):
            code = int(crs.split(":")[1])
            zone = code % 100
            northern = 32600 <= code < 32700
        else:
            zone = None
            northern = 0.5 * sum(lat_pair) >= 0
        clon = 0.5 * sum(lon_pair)
        clat = 0.5 * sum(lat_pair)
        if zone is None:
            from ..pre.utm import utm_zone_for

            zone = utm_zone_for(clon)
        ce, cn = lonlat_to_utm(np.array([clon]), np.array([clat]), zone=zone)
        return cls(
            zone=zone, northern=northern,
            rotate_deg=deck.get_float("rotate_deg", 0.0) or 0.0,
            utm_center=(float(ce[0]), float(cn[0])),
            local_center=(0.5 * si_size_xy[0], 0.5 * si_size_xy[1]),
        )

    def local_to_lonlat(self, x, y):
        """Local rotated meters -> (lon, lat)."""
        th = np.radians(self.rotate_deg)
        dx = np.asarray(x) - self.local_center[0]
        dy = np.asarray(y) - self.local_center[1]
        # inverse rotation (local frame was rotated by +rotate_deg from UTM)
        ux = np.cos(th) * dx - np.sin(th) * dy + self.utm_center[0]
        uy = np.sin(th) * dx + np.cos(th) * dy + self.utm_center[1]
        return utm_to_lonlat(ux, uy, self.zone, self.northern)

    def lonlat_to_local(self, lon, lat):
        ux, uy = lonlat_to_utm(np.asarray(lon), np.asarray(lat), zone=self.zone)
        th = np.radians(self.rotate_deg)
        dx = ux - self.utm_center[0]
        dy = uy - self.utm_center[1]
        x = np.cos(th) * dx + np.sin(th) * dy + self.local_center[0]
        y = -np.sin(th) * dx + np.cos(th) * dy + self.local_center[1]
        return x, y

    def derotate_winds(self, u, v):
        """Rotate local-frame winds back to east/north components."""
        th = np.radians(self.rotate_deg)
        ue = np.cos(th) * np.asarray(u) - np.sin(th) * np.asarray(v)
        vn = np.sin(th) * np.asarray(u) + np.cos(th) * np.asarray(v)
        return ue, vn

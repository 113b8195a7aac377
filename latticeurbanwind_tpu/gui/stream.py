"""Progressive volume streaming for the studio (streamcenter analog).

The reference ships a dedicated large-volume viewer — an NVIDIA-IndeX-backed
Qt widget that bricks the volume and refines coarse-to-fine so 100M+-cell
series stay interactive (reference gui/streamcenter/ViewerWidget.cpp,
gui/streamcenter/index/*).  The web studio's analog is this module plus two
HTTP endpoints (gui/server.py /api/volinfo + /api/brick):

  * every (VTK file, field) gets a **mip pyramid**: level 0 is the full
    grid, each next level is a 2x mean-pooled copy, down to one that fits a
    single brick.  Pooling (not stride subsampling) keeps thin features
    visible at depth — the same reason streamcenter renders from LOD bricks
    rather than a decimated copy;
  * each level is partitioned into `brick_size`^3 bricks served as raw
    little-endian float16 tiles (`/api/brick?level=&i=&j=&k=`), so a client
    draws the coarsest level instantly (one tiny brick) and refines by
    streaming finer bricks while the user watches — playback scrubs at the
    coarse level and parks into full refinement;
  * pyramids are cached (LRU, mtime-keyed) on top of the parsed-VTK cache,
    so a playback pass over a series costs one pyramid build per file, not
    one per frame.

Scalar selection mirrors the volume renderer: a vector field streams as its
magnitude; `fluid` streams as occupancy (mean-pooled fraction); plain
scalars stream as themselves.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Tuple

import numpy as np

DEFAULT_BRICK = 64


def _pool2(a: np.ndarray) -> np.ndarray:
    """2x mean-pool each axis of a 3-D array (edge-replicate odd sizes)."""
    pz, py, px = (s & 1 for s in a.shape)
    if pz or py or px:
        a = np.pad(a, ((0, pz), (0, py), (0, px)), mode="edge")
    z, y, x = a.shape
    return (a.reshape(z // 2, 2, y // 2, 2, x // 2, 2)
             .mean(axis=(1, 3, 5), dtype=np.float32))


def select_scalar(fields: Dict[str, np.ndarray], name: str) -> np.ndarray:
    """Resolve a streamable (Z,Y,X) float32 scalar from parsed VTK fields.

    `name` may be a field key, or the conventional shorthands the volume
    renderer uses: `u` (any vector field's magnitude), `rho`, `T`."""
    if name in fields:
        arr = fields[name]
        if arr.ndim == 4:
            return np.sqrt((arr.astype(np.float32) ** 2).sum(axis=0))
        return np.ascontiguousarray(arr, dtype=np.float32)
    low = name.lower()
    if low == "u":
        vec = next((v for v in fields.values() if v.ndim == 4), None)
        if vec is None:
            raise ValueError("no vector field to stream as |u|")
        return np.sqrt((vec.astype(np.float32) ** 2).sum(axis=0))
    key = next((k for k in fields
                if k.split("_")[0].lower() == low and fields[k].ndim == 3),
               None)
    if key is None:
        raise ValueError(f"no streamable field {name!r}; have "
                         f"{sorted(fields)}")
    return np.ascontiguousarray(fields[key], dtype=np.float32)


class MipPyramid:
    """LOD pyramid of one scalar volume, partitioned into bricks."""

    def __init__(self, scalar: np.ndarray, brick_size: int = DEFAULT_BRICK):
        if scalar.ndim != 3:
            raise ValueError(f"need a (Z,Y,X) scalar, got {scalar.shape}")
        self.brick_size = int(brick_size)
        levels: List[np.ndarray] = [np.ascontiguousarray(scalar, np.float32)]
        while max(levels[-1].shape) > self.brick_size:
            levels.append(_pool2(levels[-1]))
        self.levels = levels
        self.vmin = float(levels[-1].min())
        self.vmax = float(levels[-1].max())
        # the coarsest level underestimates extrema; one pass over the full
        # grid pins the exact range (cheap relative to the pyramid build)
        self.vmin = min(self.vmin, float(levels[0].min()))
        self.vmax = max(self.vmax, float(levels[0].max()))

    def n_levels(self) -> int:
        return len(self.levels)

    def bricks_at(self, level: int) -> Tuple[int, int, int]:
        bs = self.brick_size
        z, y, x = self.levels[level].shape
        return (-(-z // bs), -(-y // bs), -(-x // bs))

    def info(self) -> dict:
        return {
            "brick_size": self.brick_size,
            "dtype": "float16",
            "vmin": self.vmin, "vmax": self.vmax,
            "levels": [{
                "level": lv,
                "shape": list(self.levels[lv].shape),
                "bricks": list(self.bricks_at(lv)),
            } for lv in range(len(self.levels))],
        }

    def brick(self, level: int, i: int, j: int, k: int) -> np.ndarray:
        """Brick (i,j,k) of `level` as C-contiguous float16 (edge bricks
        are clamped, so the returned shape may be under brick_size)."""
        if not 0 <= level < len(self.levels):
            raise ValueError(f"level {level} out of range "
                             f"0..{len(self.levels) - 1}")
        a = self.levels[level]
        bs = self.brick_size
        nz, ny, nx = self.bricks_at(level)
        if not (0 <= i < nz and 0 <= j < ny and 0 <= k < nx):
            raise ValueError(f"brick ({i},{j},{k}) outside {nz}x{ny}x{nx} "
                             f"at level {level}")
        tile = a[i * bs:(i + 1) * bs, j * bs:(j + 1) * bs,
                 k * bs:(k + 1) * bs]
        return np.ascontiguousarray(tile, dtype=np.float16)


def estimate_shift(a: np.ndarray, b: np.ndarray,
                   max_shift: int = 8) -> np.ndarray:
    """Integer displacement d = (dz, dy, dx) such that `b` looks like `a`
    translated by +d — windowed 3-D phase correlation, the motion-estimation
    half of FRUC-style frame interpolation (reference
    gui/src/streamcenter/NvidiaFrucRuntime.cpp does this with NVIDIA's
    optical-flow engine; a volume translation per brick is the block-based
    equivalent)."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    a = a - a.mean()
    b = b - b.mean()
    if not (a.std() > 0 and b.std() > 0):
        return np.zeros(3, np.float32)
    # Hann window kills the wrap-around discontinuity at the brick faces
    for ax, n in enumerate(a.shape):
        w = np.hanning(max(n, 2)).astype(np.float32)
        sh = [1] * a.ndim
        sh[ax] = n
        a = a * w.reshape(sh)
        b = b * w.reshape(sh)
    fa = np.fft.rfftn(a)
    fb = np.fft.rfftn(b)
    cross = fb * np.conj(fa)
    cross /= np.maximum(np.abs(cross), 1e-20)
    corr = np.fft.irfftn(cross, a.shape)
    # admissible peaks only: |d| <= max_shift per axis (wrapped coords)
    mask = np.zeros(a.shape, bool)
    ix = np.ix_(*[np.r_[0:min(max_shift + 1, n),
                        max(n - max_shift, min(max_shift + 1, n)):n]
                  for n in a.shape])
    mask[ix] = True
    corr = np.where(mask, corr, -np.inf)
    idx = np.unravel_index(int(np.argmax(corr)), corr.shape)
    d = np.array([ix_ if ix_ <= n // 2 else ix_ - n
                  for ix_, n in zip(idx, a.shape)], np.float32)
    return np.clip(d, -max_shift, max_shift)


def warp_blend(f1: np.ndarray, f2: np.ndarray, alpha: float,
               max_shift: int = 8) -> np.ndarray:
    """Motion-compensated sub-frame between two co-located volumes:
    estimate the dominant translation d (f1 -> f2), advect each frame to
    the intermediate time, and blend — `(1-a)*f1(x - a*d) + a*f2(x +
    (1-a)*d)`.  Falls back to exactly the cross-fade when no coherent
    motion is detected (d = 0).  Linear cross-fade ghosts/doubles an
    advecting feature; this keeps it single and moving (the reason the
    reference ships FRUC rather than frame blending)."""
    from scipy.ndimage import shift as ndshift

    d = estimate_shift(f1, f2, max_shift)
    if not np.any(d):
        return ((1.0 - alpha) * np.asarray(f1, np.float32)
                + alpha * np.asarray(f2, np.float32))
    a1 = ndshift(np.asarray(f1, np.float32), alpha * d,
                 order=1, mode="nearest")
    a2 = ndshift(np.asarray(f2, np.float32), -(1.0 - alpha) * d,
                 order=1, mode="nearest")
    return (1.0 - alpha) * a1 + alpha * a2


def warped_brick(lv1: np.ndarray, lv2: np.ndarray, brick_size: int,
                 coords, alpha: float, max_shift: int = 8) -> np.ndarray:
    """Sub-frame brick (i,j,k) computed on a padded window of the level
    arrays so the advection has inflow data at the brick faces, then
    cropped back to the brick extent."""
    i, j, k = coords
    bs = int(brick_size)
    pad = max_shift + 2
    lo = [max(c * bs - pad, 0) for c in (i, j, k)]
    hi = [min((c + 1) * bs + pad, n) for c, n in zip((i, j, k), lv1.shape)]
    win = tuple(slice(a, b) for a, b in zip(lo, hi))
    out = warp_blend(lv1[win], lv2[win], alpha, max_shift)
    crop = tuple(slice(c * bs - a, min((c + 1) * bs, n) - a)
                 for c, a, n in zip((i, j, k), lo, lv1.shape))
    return out[crop]


class PyramidCache:
    """LRU of MipPyramids keyed by (path, mtime_ns, size, field)."""

    def __init__(self, capacity: int = 4):
        self.capacity = capacity
        self._lock = threading.Lock()
        self._entries: Dict = {}   # key -> (order, pyramid)
        self._tick = 0

    def get(self, path, st, field: str, fields_loader) -> MipPyramid:
        key = (str(path), st.st_mtime_ns, st.st_size, field)
        with self._lock:
            hit = self._entries.get(key)
            if hit is not None:
                self._tick += 1
                self._entries[key] = (self._tick, hit[1])
                return hit[1]
        pyr = MipPyramid(select_scalar(fields_loader(), field))
        with self._lock:
            self._tick += 1
            self._entries[key] = (self._tick, pyr)
            stale = [k for k in self._entries
                     if k[0] == str(path) and k[3] == field and k != key]
            for k in stale:
                del self._entries[k]
            while len(self._entries) > self.capacity:
                oldest = min(self._entries, key=lambda k: self._entries[k][0])
                del self._entries[oldest]
        return pyr

"""VTK round-trip, byte-layout checks, and progress protocol."""

import io
import json
import struct

import numpy as np

from latticeurbanwind_tpu.io import (
    ProgressEmitter, read_structured_points, write_structured_points,
)


def test_vtk_round_trip(tmp_path):
    Z, Y, X = 4, 5, 6
    rng = np.random.default_rng(3)
    u = rng.standard_normal((3, Z, Y, X)).astype(np.float32)
    rho = rng.standard_normal((Z, Y, X)).astype(np.float32)
    fluid = (rng.random((Z, Y, X)) > 0.5).astype(np.uint8)
    p = write_structured_points(tmp_path / "case.vtk",
                                {"u_avg": u, "rho_avg": rho, "fluid": fluid},
                                spacing=20.0, origin_shift=(100.0, 200.0, 50.0))
    meta, fields = read_structured_points(p)
    assert meta["dims"] == (X, Y, Z)
    assert meta["spacing"] == (20.0, 20.0, 20.0)
    np.testing.assert_allclose(fields["u_avg"], u, rtol=1e-6)
    np.testing.assert_allclose(fields["rho_avg"], rho, rtol=1e-6)
    np.testing.assert_array_equal(fields["fluid"], fluid)
    # origin matches the reference cell-center convention
    assert np.isclose(meta["origin"][0], 20.0 * (0.5 - X / 2) + 100.0)


def test_vtk_byte_layout(tmp_path):
    """x-fastest big-endian AoS — the exact layout downstream tools parse."""
    Z, Y, X = 2, 2, 2
    arr = np.arange(Z * Y * X, dtype=np.float32).reshape(Z, Y, X)
    p = write_structured_points(tmp_path / "layout.vtk", {"data": arr}, spacing=1.0,
                                origin=(0, 0, 0))
    raw = p.read_bytes()
    idx = raw.index(b"LOOKUP_TABLE default\n") + len(b"LOOKUP_TABLE default\n")
    first = struct.unpack(">f", raw[idx:idx + 4])[0]
    second = struct.unpack(">f", raw[idx + 4:idx + 8])[0]
    assert first == arr[0, 0, 0]
    assert second == arr[0, 0, 1]  # x varies fastest


def test_vtk_nz_crop(tmp_path):
    Z, Y, X = 6, 3, 3
    arr = np.arange(Z * Y * X, dtype=np.float32).reshape(Z, Y, X)
    p = write_structured_points(tmp_path / "crop.vtk", {"data": arr}, nz_write=4)
    meta, fields = read_structured_points(p)
    assert meta["dims"] == (X, Y, 4)
    np.testing.assert_allclose(fields["data"], arr[:4])


def test_reads_vector_as_scalars3(tmp_path):
    u = np.zeros((3, 2, 2, 2), dtype=np.float32)
    u[1] = 7.0
    p = write_structured_points(tmp_path / "v.vtk", {"u": u})
    raw = p.read_bytes()
    assert b"SCALARS u float 3" in raw  # reference writes vectors this way


def test_progress_emitter(monkeypatch):
    monkeypatch.setenv("LUW_PROGRESS_MODE", "gui")
    buf = io.StringIO()
    em = ProgressEmitter("solve", stream=buf)
    em.emit("stepping", current=5, total=10, force=True)
    em.done("stepping")
    lines = [ln for ln in buf.getvalue().splitlines() if ln]
    assert all(ln.startswith("[[LUW_PROGRESS]]") for ln in lines)
    payload = json.loads(lines[0][len("[[LUW_PROGRESS]]"):])
    assert payload == {"stage": "solve", "label": "stepping", "detail": "",
                       "current": 5, "total": 10, "indeterminate": False}


def test_progress_disabled_by_default(monkeypatch):
    monkeypatch.delenv("LUW_PROGRESS_MODE", raising=False)
    buf = io.StringIO()
    ProgressEmitter("solve", stream=buf).emit("x", force=True)
    assert buf.getvalue() == ""

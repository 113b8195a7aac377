"""LUW Studio server: deck edit round-trip, job runner, results, render."""

import json
import shutil
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture()
def studio(tmp_path):
    from latticeurbanwind_tpu.gui.server import serve
    from latticeurbanwind_tpu.io.vtk import write_structured_points

    case = tmp_path / "case"
    (case / "proj_temp").mkdir(parents=True)
    (case / "RESULTS" / "vtk").mkdir(parents=True)
    (case / "conf.luw").write_text(
        "// LUW deck\n\n// Project\ncasename = demo\n\n"
        "// CFD Controls\ngpu_memory = 1000\n")
    u = np.full((3, 6, 10, 12), 2.0, np.float32)
    write_structured_points(case / "RESULTS" / "vtk" / "demo_avg-000000010.vtk",
                            {"u_avg": u}, spacing=5.0)
    httpd = serve(case, port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, case
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        body = r.read()
        return r.headers.get_content_type(), body


def _json(url, post=None):
    if post is not None:
        req = urllib.request.Request(url, data=json.dumps(post).encode(),
                                     method="POST")
    else:
        req = url
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read())
    except urllib.error.HTTPError as e:   # error responses carry JSON bodies
        return json.loads(e.read())


def test_studio_endpoints(studio):
    base, case = studio

    ctype, html = _get(base + "/")
    assert ctype == "text/html" and b"LUW" in html

    tree = _json(base + "/api/tree")
    names = {i["name"] for i in tree["items"]}
    assert "conf.luw" in names and "RESULTS" in names

    schema = _json(base + "/api/schema?mode=luw")
    keys = {f["key"] for s in schema["sections"] for f in s["fields"]}
    assert {"casename", "gpu_memory", "lbm_storage"} <= keys

    deck = _json(base + "/api/deck?path=conf.luw")
    assert deck["values"]["casename"] == "demo"

    saved = _json(base + "/api/deck",
                  post={"path": "conf.luw", "values": {"gpu_memory": "512"}})
    assert saved["values"]["gpu_memory"] == "512"
    assert "gpu_memory = 512" in (case / "conf.luw").read_text()

    # path traversal must be rejected
    bad = _json(base + "/api/deck?path=../../etc/passwd")
    assert "error" in bad

    res = _json(base + "/api/results?path=")
    assert res["vtks"] == ["RESULTS/vtk/demo_avg-000000010.vtk"]

    info = _json(base + "/api/vtkinfo?path=RESULTS/vtk/demo_avg-000000010.vtk")
    assert info["fields"]["u_avg"] == [3, 6, 10, 12]

    ctype, png = _get(base + "/api/render?path=RESULTS/vtk/demo_avg-000000010.vtk&z=2")
    assert ctype == "image/png" and png[:4] == b"\x89PNG" and len(png) > 5000


def test_studio_job_runner(studio):
    base, case = studio
    job = _json(base + "/api/run",
                post={"cmd": "cleanluw", "args": ["--dry-run"], "cwd": ""})
    assert "id" in job
    for _ in range(100):
        st = _json(base + f"/api/job?id={job['id']}")
        if st["done"]:
            break
        time.sleep(0.2)
    assert st["done"]

    bad = _json(base + "/api/run", post={"cmd": "rm", "args": ["-rf", "/"]})
    assert "error" in bad


def test_studio_mip_and_q_render(studio):
    base, case = studio
    for params in ("mode=mip&axis=y&field=u_avg", "field=Q&mode=mip"):
        ctype, png = _get(
            base + "/api/render?path=RESULTS/vtk/demo_avg-000000010.vtk&" + params)
        assert ctype == "image/png" and png[:4] == b"\x89PNG", params


def test_studio_3d_render_and_series(studio):
    """The streamcenter-analog endpoints: timestep series discovery and the
    raytraced 3-D view with camera parameters."""
    import numpy as np

    from latticeurbanwind_tpu.io.vtk import write_structured_points

    base, case = studio
    # second timestep -> a playable series
    u2 = np.full((3, 6, 10, 12), 3.0, np.float32)
    write_structured_points(case / "RESULTS" / "vtk" / "demo_avg-000000020.vtk",
                            {"u_avg": u2}, spacing=5.0)
    s = _json(base + "/api/series?path=RESULTS/vtk/demo_avg-000000010.vtk")
    assert s["steps"] == [10, 20]
    assert len(s["files"]) == 2

    ctype, png = _get(base + "/api/render?path=RESULTS/vtk/demo_avg-000000010.vtk"
                      "&mode=3d&az=200&el=40&sl=1&q=0")
    assert ctype == "image/png" and len(png) > 3000


def test_studio_boundary_panel(studio):
    """SurfData boundary preview endpoint (BatchBoundaryPanel analog)."""
    import numpy as np

    base, case = studio
    rows = ["X,Y,Z,u,v,w,patch"]
    rng = np.random.default_rng(0)
    for p in range(6):
        for _ in range(20):
            rows.append(f"{rng.uniform(0,100):.2f},{rng.uniform(0,100):.2f},"
                        f"{rng.uniform(0,50):.2f},3.0,1.0,0.0,{p}")
    (case / "proj_temp" / "SurfData_20250101.csv").write_text("\n".join(rows) + "\n")
    r = _json(base + "/api/results?path=")
    assert any("SurfData" in c for c in r["csvs"])
    ctype, png = _get(base + "/api/boundary?path=proj_temp/SurfData_20250101.csv")
    assert ctype == "image/png" and len(png) > 5000


def test_studio_spectra_and_morphology_panels(studio):
    """The two reference GUI panels added in round 3: wavenumber spectra
    (gui/src wavenumber panel analog, les_spectra-backed) and urban
    morphology (building-scale panel analog, buildingscale-backed)."""
    import numpy as np

    from latticeurbanwind_tpu.io.vtk import write_structured_points

    base, case = studio
    rng = np.random.default_rng(7)
    u = rng.normal(3.0, 0.5, (3, 8, 24, 32)).astype(np.float32)
    fluid = np.ones((8, 24, 32), np.float32)
    fluid[:4, 5:9, 6:12] = 0.0           # one building block
    fluid[:6, 14:18, 20:26] = 0.0        # a taller one
    u[:, fluid == 0.0] = 0.0
    write_structured_points(case / "RESULTS" / "vtk" / "city_avg-000000030.vtk",
                            {"u_avg": u, "fluid": fluid}, spacing=4.0)

    ctype, png = _get(base + "/api/spectra?path=RESULTS/vtk/city_avg-000000030.vtk")
    assert ctype == "image/png" and png[:4] == b"\x89PNG"
    ctype, png = _get(
        base + "/api/buildingscale?path=RESULTS/vtk/city_avg-000000030.vtk")
    assert ctype == "image/png" and png[:4] == b"\x89PNG"


def test_vtk_cache_and_decimation(tmp_path):
    """Playback support: parsed VTKs are served from the mtime-keyed LRU
    (identical object on re-request) and oversized fields stride-decimate
    to the interactive budget."""
    import numpy as np

    from latticeurbanwind_tpu.gui.server import _VtkCache, _decimate
    from latticeurbanwind_tpu.io.vtk import write_structured_points

    p = tmp_path / "a-000000010.vtk"
    write_structured_points(p, {"rho": np.ones((4, 5, 6), np.float32)})
    cache = _VtkCache(capacity=2)
    _, f1 = cache.get(p)
    _, f2 = cache.get(p)
    assert f1 is f2                       # served from cache
    # touching the file invalidates the entry
    import os
    write_structured_points(p, {"rho": np.full((4, 5, 6), 2.0, np.float32)})
    os.utime(p, ns=(1, 10**18))           # force a different mtime_ns
    _, f3 = cache.get(p)
    assert f3 is not f2 and float(f3["rho"][0, 0, 0]) == 2.0

    big = np.zeros((3, 40, 600, 600), np.float32)     # 14.4M cells
    dec, s = _decimate(big)
    assert s > 1 and int(np.prod(dec.shape[-3:])) <= 2_000_000
    dec2, s2 = _decimate(big, in_plane_only=True)
    assert dec2.shape[-3] == 40 and s2 > 1
    assert int(np.prod(dec2.shape[-3:])) <= 2_000_000
    small = np.zeros((10, 20, 30), np.float32)
    assert _decimate(small)[1] == 1


def test_studio_batch_panel(studio):
    """Batch-boundary panel (reference BatchBoundaryPanel.cpp): mode summary
    for .luw, the DG inflow x angle matrix for .luwdg, PF direction cases +
    profile preview for .luwpf."""
    base, case = studio

    b = _json(base + "/api/batch?path=conf.luw")
    assert b["mode"] == "luw" and b["casename"] == "demo"
    assert "gpu_memory" in b["summary"]

    (case / "conf.luwdg").write_text(
        "// LUW deck\n\n// Project\ncasename = demo\n\n"
        "// Batch\ninflow = [2.0, 5.0]\nangle = [0, 90]\n")
    b = _json(base + "/api/batch?path=conf.luwdg")
    assert b["matrix"] == [["DG_2_0_", "DG_2_90_"], ["DG_5_0_", "DG_5_90_"]]

    (case / "wind_bc").mkdir()
    (case / "wind_bc" / "profile.dat").write_text(
        "0.0 0.0\n50.0 4.0\n100.0 6.0\n200.0 8.0\n")
    (case / "conf.luwpf").write_text(
        "// LUW deck\n\n// Project\ncasename = demo\n\n"
        "// Batch\nangle = [0, 45]\n")
    b = _json(base + "/api/batch?path=conf.luwpf")
    assert [c["case"] for c in b["cases"]] == ["ANG_0_", "ANG_45_"]
    assert b["profile"][-1] == [200.0, 8.0]
    ctype, png = _get(base + "/api/profileplot?path=conf.luwpf")
    assert ctype == "image/png" and png[:4] == b"\x89PNG"


def test_studio_volume_field_render(studio):
    """VIS_FIELD volumetric raycast endpoint (reference graphics_field_rt,
    kernel.cpp:2864) with rho/T colorscales and the embedded slice plane
    (graphics_field_slice, kernel.cpp:2890)."""
    import numpy as np

    from latticeurbanwind_tpu.io.vtk import write_structured_points

    base, case = studio
    rng = np.random.default_rng(7)
    u = rng.normal(2.0, 0.5, (3, 6, 10, 12)).astype(np.float32)
    rho = (1.0 + rng.normal(0, 0.01, (6, 10, 12))).astype(np.float32)
    T = (293.0 + rng.normal(0, 2.0, (6, 10, 12))).astype(np.float32)
    write_structured_points(case / "RESULTS" / "vtk" / "vol_avg-000000010.vtk",
                            {"u_avg": u, "rho_avg": rho, "T_avg": T},
                            spacing=5.0)
    for extra in ("color=u", "color=rho", "color=T&gain=2.5",
                  "color=u&splane=z:3"):
        ctype, png = _get(base + "/api/render?path=RESULTS/vtk/"
                          "vol_avg-000000010.vtk&mode=volume&az=210&el=30&"
                          + extra)
        assert ctype == "image/png" and png[:4] == b"\x89PNG", extra
    # a VTK without T cannot color by temperature -> JSON error, not a 500
    err = _json(base + "/api/render?path=RESULTS/vtk/demo_avg-000000010.vtk"
                "&mode=volume&color=T")
    assert "error" in err


def test_studio_aij_validation_panel(studio):
    """luwaij-backed wind-tunnel validation endpoint: scatter PNG from a
    .luwpf workspace holding the AIJ xls + an executed avg VTK."""
    import numpy as np

    from latticeurbanwind_tpu.io.vtk import write_structured_points

    xls = Path("/root/reference/examples/example_ProfileResearch_noDEM/"
               "CaseE(Niigata).xls")
    if not xls.exists():
        pytest.skip("reference dataset absent")
    base, case = studio
    shutil.copy(xls, case / xls.name)
    (case / "wind_bc").mkdir(exist_ok=True)
    (case / "wind_bc" / "profile.dat").write_text(
        "1.25 2.847\n25 4.36\n250 7.8\n")
    (case / "conf.luwpf").write_text(
        "// LUW deck\n\n// Project\ncasename = demo\ndatetime = 1\n\n"
        "// Domain\nbase_height = 20.0\n\n// Batch\nangle = [0]\n")
    b = _json(base + "/api/batch?path=conf.luwpf")
    assert b["has_xls"] is True
    # single-angle naming: un-prefixed avg; grid centered like io/vtk does
    u = np.full((3, 20, 60, 60), 2.0, np.float32)
    fl = np.ones((20, 60, 60), np.float32)
    write_structured_points(case / "RESULTS" / "vtk" / "1_avg-000000010.vtk",
                            {"u_avg": u, "fluid": fl}, spacing=10.0)
    ctype, png = _get(base + "/api/aij?path=conf.luwpf&variant=after")
    assert ctype == "image/png" and png[:4] == b"\x89PNG"


def test_mip_pyramid_levels_and_bricks():
    """gui/stream.py: 2x mean-pool pyramid, brick partition, exact ranges
    (the streamcenter LOD-brick analog)."""
    import numpy as np

    from latticeurbanwind_tpu.gui.stream import MipPyramid, select_scalar

    rng = np.random.default_rng(3)
    vol = rng.uniform(0.0, 9.0, (40, 130, 70)).astype(np.float32)
    pyr = MipPyramid(vol, brick_size=64)
    # level 0 is the full grid; levels halve until max dim <= brick_size
    assert [list(l.shape) for l in pyr.levels] == [
        [40, 130, 70], [20, 65, 35], [10, 33, 18]]
    assert pyr.vmin == float(vol.min()) and pyr.vmax == float(vol.max())
    # level 1 is the exact 2x mean pooling (even dims pad by edge replicate)
    assert np.allclose(pyr.levels[1][0, 0, 0],
                       vol[:2, :2, :2].mean(), atol=1e-6)
    # bricks tile the level exactly: reassembly == level array
    info = pyr.info()
    lvl = 0
    nz, ny, nx = info["levels"][lvl]["bricks"]
    assert (nz, ny, nx) == (1, 3, 2)
    rec = np.zeros_like(pyr.levels[lvl])
    for i in range(nz):
        for j in range(ny):
            for k in range(nx):
                t = pyr.brick(lvl, i, j, k)
                assert t.dtype == np.float16
                rec[i*64:(i+1)*64, j*64:(j+1)*64, k*64:(k+1)*64] = t
    assert np.allclose(rec, pyr.levels[lvl], atol=6e-3, rtol=2e-3)

    # vector fields stream as |u|; shorthand names resolve suffixed keys
    vec = np.stack([vol, -vol, 0 * vol])
    mag = select_scalar({"u_avg": vec}, "u")
    assert np.allclose(mag, np.abs(vol) * np.sqrt(2), rtol=1e-5)
    assert select_scalar({"rho_avg": vol}, "rho") is not None
    import pytest as _pytest
    with _pytest.raises(ValueError):
        select_scalar({"rho_avg": vol}, "nope")


def test_studio_brick_streaming_endpoints(studio):
    """/api/volinfo + /api/brick: LOD layout, raw float16 tiles with the
    shape header, coarse level reconstructable from bricks."""
    import numpy as np

    from latticeurbanwind_tpu.gui.stream import MipPyramid
    from latticeurbanwind_tpu.io.vtk import write_structured_points

    base, case = studio
    rng = np.random.default_rng(11)
    u = rng.normal(2.0, 1.0, (3, 70, 80, 90)).astype(np.float32)
    write_structured_points(case / "RESULTS" / "vtk" / "big_avg-000000050.vtk",
                            {"u_avg": u}, spacing=2.0)
    path = "RESULTS/vtk/big_avg-000000050.vtk"

    info = _json(base + f"/api/volinfo?path={path}&field=u")
    assert info["brick_size"] == 64 and info["dtype"] == "float16"
    assert [l["shape"] for l in info["levels"]] == [[70, 80, 90], [35, 40, 45]]
    assert info["spacing"] == [2.0, 2.0, 2.0]
    mag = np.sqrt((u.astype(np.float32) ** 2).sum(axis=0))
    assert abs(info["vmax"] - float(mag.max())) < 1e-5

    # stream every brick of the coarsest level and reassemble it
    ref = MipPyramid(mag, brick_size=64)
    lvl = len(info["levels"]) - 1
    nz, ny, nx = info["levels"][lvl]["bricks"]
    rec = np.zeros(info["levels"][lvl]["shape"], np.float32)
    for i in range(nz):
        for j in range(ny):
            for k in range(nx):
                import urllib.request
                with urllib.request.urlopen(
                        base + f"/api/brick?path={path}&field=u&level={lvl}"
                               f"&i={i}&j={j}&k={k}", timeout=30) as r:
                    shape = tuple(int(s) for s in
                                  r.headers["X-Brick-Shape"].split(","))
                    tile = np.frombuffer(r.read(), np.float16).reshape(shape)
                rec[i*64:(i+1)*64, j*64:(j+1)*64, k*64:(k+1)*64] = tile
    assert np.allclose(rec, ref.levels[lvl], atol=2e-2, rtol=2e-3)

    # out-of-range bricks / levels error cleanly (JSON, not a crash)
    bad = _json(base + f"/api/brick?path={path}&field=u&level=9&i=0&j=0&k=0")
    assert "error" in bad
    bad = _json(base + f"/api/brick?path={path}&field=u&level=0&i=9&j=0&k=0")
    assert "error" in bad
    # the app exposes the stream mode
    ctype, html = _get(base + "/")
    assert b"volume (stream LOD)" in html and b"/api/brick" in html


def test_studio_brick_temporal_interpolation(studio):
    """/api/brick path2+alpha: temporally lerped bricks for sub-frame
    playback (reference FRUC frame interpolation analog,
    gui/src/NvidiaFrucRuntime.cpp:1-763 — volume-space lerp since the
    client renders the MIP itself)."""
    import urllib.request

    import numpy as np

    from latticeurbanwind_tpu.io.vtk import write_structured_points

    base, case = studio
    rng = np.random.default_rng(7)
    u0 = rng.normal(2.0, 1.0, (3, 20, 24, 28)).astype(np.float32)
    u1 = rng.normal(3.0, 1.0, (3, 20, 24, 28)).astype(np.float32)
    d = case / "RESULTS" / "vtk"
    write_structured_points(d / "fr_avg-000000010.vtk", {"u_avg": u0})
    write_structured_points(d / "fr_avg-000000020.vtk", {"u_avg": u1})
    p0, p1 = ("RESULTS/vtk/fr_avg-000000010.vtk",
              "RESULTS/vtk/fr_avg-000000020.vtk")

    def brick(extra=""):
        with urllib.request.urlopen(
                base + f"/api/brick?path={p0}&field=u&level=0&i=0&j=0&k=0"
                + extra, timeout=30) as r:
            shape = tuple(int(s) for s in
                          r.headers["X-Brick-Shape"].split(","))
            return np.frombuffer(r.read(), np.float16).reshape(shape)

    b0 = brick()
    with urllib.request.urlopen(
            base + f"/api/brick?path={p1}&field=u&level=0&i=0&j=0&k=0",
            timeout=30) as r:
        b1 = np.frombuffer(r.read(), np.float16).reshape(b0.shape)
    mid = brick(f"&path2={p1}&alpha=0.25&interp=lerp")
    want = (0.75 * b0.astype(np.float32)
            + 0.25 * b1.astype(np.float32)).astype(np.float16)
    assert np.array_equal(mid, want)
    # alpha clamps to [0, 1]: alpha=0 returns frame 0 exactly (both modes)
    assert np.array_equal(brick(f"&path2={p1}&alpha=-3&interp=lerp"), b0)
    assert np.array_equal(brick(f"&path2={p1}&alpha=-3"), b0)
    # incoherent frames (independent noise) have no dominant motion: the
    # default motion-compensated mode degrades gracefully to a blend of
    # (possibly slightly shifted) frames with values in the frames' range
    w = brick(f"&path2={p1}&alpha=0.25")
    assert w.shape == b0.shape and np.isfinite(w.astype(np.float32)).all()
    # mismatched grids error cleanly
    write_structured_points(d / "fr2_avg-000000030.vtk",
                            {"u_avg": u1[:, :10]})
    bad = _json(base + f"/api/brick?path={p0}&field=u&level=0&i=0&j=0&k=0"
                       f"&path2=RESULTS/vtk/fr2_avg-000000030.vtk&alpha=0.5")
    assert "error" in bad
    # live playback wires the interp count into the stream viewer
    _ctype, html = _get(base + "/")
    assert b"path2" in html and b"sub-frame" in html


def test_studio_pick_endpoint(studio):
    """/api/pick: cell probing + column argmax profile (the reference
    VtkViewWidget point-pick / streamcenter cursor analog)."""
    import numpy as np

    from latticeurbanwind_tpu.io.vtk import write_structured_points

    base, case = studio
    u = np.zeros((3, 6, 10, 12), np.float32)
    u[0] = 1.0
    u[0, 4, 7, 3] = 9.0                      # a hot cell in column (y=7,x=3)
    rho = np.full((6, 10, 12), 1.25, np.float32)
    write_structured_points(case / "RESULTS" / "vtk" / "pk_avg-000000010.vtk",
                            {"u_avg": u, "rho_avg": rho},
                            spacing=5.0, origin=(100.0, 200.0, 30.0))
    path = "RESULTS/vtk/pk_avg-000000010.vtk"

    # single-cell probe: world coords from origin+spacing, vector + |vec|
    p = _json(base + f"/api/pick?path={path}&z=4&y=7&x=3")
    assert p["cell"] == [4, 7, 3]
    assert p["world"] == [100.0 + 3 * 5.0, 200.0 + 7 * 5.0, 30.0 + 4 * 5.0]
    assert p["values"]["u_avg"] == [9.0, 0.0, 0.0]
    assert abs(p["values"]["|u_avg|"] - 9.0) < 1e-6
    assert abs(p["values"]["rho_avg"] - 1.25) < 1e-6

    # column probe along z at (a=y=7, b=x=3): argmax finds the hot cell
    p = _json(base + f"/api/pick?path={path}&axis=z&a=7&b=3&field=u")
    assert p["argmax"] == 4 and abs(p["max"] - 9.0) < 1e-6
    assert p["cell"] == [4, 7, 3]
    assert len(p["profile"]) == 6 and abs(p["profile"][4] - 9.0) < 1e-6

    # column probe along y; indices clamp instead of erroring
    p = _json(base + f"/api/pick?path={path}&axis=y&a=99&b=0&field=u")
    assert p["cell"][0] == 5
    # quad layout + pick UI shipped in the app
    _, html = _get(base + "/")
    assert b"2x2 multi-view" in html and b'api("pick"' in html


def test_warp_interpolation_beats_crossfade_on_advecting_vortex(studio):
    """Motion-compensated sub-frames (reference FRUC analog,
    gui/src/streamcenter/NvidiaFrucRuntime.cpp): for a structure advecting
    between two frames, the default /api/brick warp mode reconstructs the
    true mid-frame far better than the cross-fade, which ghosts the
    structure into two half-amplitude copies."""
    import urllib.request

    import numpy as np

    from latticeurbanwind_tpu.io.vtk import write_structured_points

    base, case = studio
    shape = (24, 48, 48)
    zz, yy, xx = np.meshgrid(*[np.arange(n, dtype=np.float32)
                               for n in shape], indexing="ij")

    def blob(cy, cx):
        r2 = ((zz - 12.0) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2)
        return 5.0 * np.exp(-r2 / 18.0)

    # vortex core advecting +6 cells in x between the frames
    f0, fmid, f1 = blob(24, 18), blob(24, 21), blob(24, 24)
    d = case / "RESULTS" / "vtk"
    write_structured_points(d / "adv_avg-000000010.vtk",
                            {"s": f0.astype(np.float32)})
    write_structured_points(d / "adv_avg-000000020.vtk",
                            {"s": f1.astype(np.float32)})
    p0, p1 = ("RESULTS/vtk/adv_avg-000000010.vtk",
              "RESULTS/vtk/adv_avg-000000020.vtk")

    def brick(extra):
        with urllib.request.urlopen(
                base + f"/api/brick?path={p0}&field=s&level=0&i=0&j=0&k=0"
                + extra, timeout=30) as r:
            sh = tuple(int(s) for s in r.headers["X-Brick-Shape"].split(","))
            return np.frombuffer(r.read(), np.float16).reshape(sh) \
                     .astype(np.float32)

    warp = brick(f"&path2={p1}&alpha=0.5")
    fade = brick(f"&path2={p1}&alpha=0.5&interp=lerp")
    truth = fmid[:warp.shape[0], :warp.shape[1], :warp.shape[2]]
    err_warp = np.abs(warp - truth).max()
    err_fade = np.abs(fade - truth).max()
    # cross-fade leaves two half-amplitude ghosts (error ~ half the peak);
    # the warp reconstructs the single moving blob
    assert err_fade > 1.0, err_fade
    assert err_warp < err_fade / 4, (err_warp, err_fade)

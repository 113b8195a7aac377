"""Snapshot rendering + solid-boundary force diagnostic."""

import numpy as np
import pytest

from latticeurbanwind_tpu.lbm import (
    DynParams, StepConfig, TYPE_E, TYPE_S, make_initial_state, make_multi_step,
    omega_from_nu,
)
from latticeurbanwind_tpu.run.snapshots import (
    q_criterion, solid_boundary_force, write_snapshot,
)


def _channel_with_block(u0=0.05):
    shape = (12, 16, 32)
    flags = np.zeros(shape, np.uint8)
    flags[0] = flags[-1] = TYPE_S
    flags[2:8, 6:10, 10:14] = TYPE_S      # block in the stream
    flags[:, :, 0] |= np.where(flags[:, :, 0] == 0, TYPE_E, 0).astype(np.uint8)
    flags[:, :, -1] |= np.where(flags[:, :, -1] == 0, TYPE_E, 0).astype(np.uint8)
    u = np.zeros((3, *shape), np.float32)
    u[0] = u0
    u[:, (flags & TYPE_S) != 0] = 0.0
    config = StepConfig(omega=omega_from_nu(0.02), subgrid=True, storage="f32")
    state = make_initial_state(shape, config=config, u=u, flags=flags)
    return config, state


def test_q_criterion_detects_shear():
    shape = (8, 16, 16)
    u = np.zeros((3, *shape), np.float32)
    z, y, x = np.meshgrid(np.arange(8), np.arange(16), np.arange(16), indexing="ij")
    # solid-body rotation in the x-y plane: Q > 0 (rotation dominated)
    u[0] = -0.01 * (y - 8)
    u[1] = 0.01 * (x - 8)
    q = q_criterion(u)
    assert q[4, 8, 8] > 0
    # pure extensional strain: Q < 0 (strain dominated)
    u2 = np.zeros((3, *shape), np.float32)
    u2[0] = 0.01 * (x - 8)
    u2[1] = -0.01 * (y - 8)
    q2 = q_criterion(u2)
    assert q2[4, 8, 8] < 0


def test_drag_force_on_block():
    import jax.numpy as jnp

    config, state = _channel_with_block()
    run = make_multi_step(config, n_inner=100)
    out = run(state, DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3)))
    force = solid_boundary_force(out)
    # flow in +x pushes the block in +x; drag dominates lift
    assert force[0] > 0
    assert abs(force[0]) > abs(force[2])


def test_write_snapshot(tmp_path):
    config, state = _channel_with_block()
    out = write_snapshot(state, tmp_path / "snap.png", u_factor=10.0,
                         title="test")
    assert out.exists() and out.stat().st_size > 10000
    # nz_out crop (sponge-extended grids): cropped flags vs full-depth Q field
    out2 = write_snapshot(state, tmp_path / "snap2.png", u_factor=10.0,
                          nz_out=8)
    assert out2.exists() and out2.stat().st_size > 10000


def test_render_scene_outputs(tmp_path):
    """3-D raytraced frame: geometry + Q isosurface + streamlines
    (reference graphics kernels, kernel.cpp:2642-3200)."""
    import numpy as np

    from latticeurbanwind_tpu.run.render import (
        Camera, default_seeds, integrate_streamlines, project_points,
        raytrace_masks, render_scene,
    )

    Z, Y, X = 16, 24, 32
    solid = np.zeros((Z, Y, X), bool)
    solid[:1] = True
    solid[:8, 8:12, 10:14] = True
    u = np.zeros((3, Z, Y, X), np.float32)
    u[0] = 0.05
    u[:, solid] = 0.0

    cam = Camera(width=160, height=120)
    img, depth = raytrace_masks((Z, Y, X), [(solid, (0.5, 0.5, 0.5))], cam)
    assert img.shape == (120, 160, 3)
    assert np.isfinite(depth).any()          # geometry was hit
    assert (img < 0.99).any()                # shaded pixels differ from bg

    seeds = default_seeds((Z, Y, X), solid)
    assert len(seeds) > 4
    paths, speeds = integrate_streamlines(u, seeds, n_steps=60, solid=solid)
    # streamlines advect downstream in +x (paths go NaN after domain exit)
    dx = np.nanmax(paths[:, :, 0]) - seeds[:, 0].max()
    assert dx > 10
    col, row, t = project_points(paths[0], (Z, Y, X), cam)
    assert np.isfinite(col).all() and np.isfinite(row).all()

    out = render_scene(solid, u, tmp_path / "frame.png", cam=cam)
    assert out.exists() and out.stat().st_size > 5000


def test_perspective_camera_render(tmp_path):
    """fov > 0 switches to the pinhole camera (reference graphics.cpp
    set_camera): per-ray directions, eye-distance depth, and projection
    consistency — the grid center projects to the image center and nearer
    objects subtend more pixels than in the orthographic view."""
    import numpy as np

    from latticeurbanwind_tpu.run.render import (
        Camera, project_points, raytrace_masks, render_scene,
    )

    Z, Y, X = 16, 24, 32
    solid = np.zeros((Z, Y, X), bool)
    solid[:1] = True
    solid[:8, 8:12, 10:14] = True

    cam = Camera(width=160, height=120, fov=70.0)
    img, depth = raytrace_masks((Z, Y, X), [(solid, (0.5, 0.5, 0.5))], cam)
    assert img.shape == (120, 160, 3)
    assert np.isfinite(depth).any() and (img < 0.99).any()

    center = np.array([[X / 2.0, Y / 2.0, Z / 2.0]])
    col, row, t = project_points(center, (Z, Y, X), cam)
    assert abs(col[0] - (cam.width - 1) / 2) < 1.0
    assert abs(row[0] - (cam.height - 1) / 2) < 1.0
    assert t[0] > 0          # center is in front of the eye

    u = np.zeros((3, Z, Y, X), np.float32)
    u[0] = 0.05
    u[:, solid] = 0.0
    out = render_scene(solid, u, tmp_path / "persp.png",
                       cam=Camera(width=160, height=120, fov=70.0),
                       title="perspective")
    assert out.exists() and out.stat().st_size > 5000


def test_render_scene_decimates_large_grids(tmp_path, monkeypatch):
    """Grids above max_cells stride-decimate before marching (the numpy
    marcher substitute for the reference's in-device rendering)."""
    import numpy as np

    import latticeurbanwind_tpu.run.render as rr

    Z, Y, X = 24, 48, 64
    solid = np.zeros((Z, Y, X), bool)
    solid[:1] = True
    shapes = []
    orig = rr.raytrace_masks

    def spy(shape, layers, cam, **kw):
        shapes.append(shape)
        return orig(shape, layers, cam, **kw)

    monkeypatch.setattr(rr, "raytrace_masks", spy)
    rr.render_scene(solid, None, tmp_path / "dec.png", streamlines=False,
                    max_cells=1000)
    assert shapes and int(np.prod(shapes[0])) <= 1000 * 8  # ceil stride


def test_frame_output_writes_video_frames(tmp_path):
    """Deck-keyed frame sequence: frame_output=N writes one perspective PNG
    per N steps into proj_temp/frames with ffmpeg-ready numbering
    (reference per-event PNG writes, setup.cpp:4843-4861)."""
    from latticeurbanwind_tpu.run.driver import RunSettings, SolverCase, run_case
    from latticeurbanwind_tpu.units import Units

    config, state = _channel_with_block()
    from latticeurbanwind_tpu.lbm import DynParams, Forcing
    import jax.numpy as jnp

    case = SolverCase(
        config=config, forcing=Forcing(), state=state,
        dyn=DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3)),
        units=Units(), cell_m=1.0,
        parent=tmp_path, datetime="20260101120000", vtk_prefix="TEST_",
        settings=RunSettings(run_nstep=6, frame_output=3, snapshots=False),
    )
    res = run_case(case, quiet=True)
    frames = sorted((tmp_path / "proj_temp" / "frames").glob("*.png"))
    assert [f.name for f in frames] == [
        "TEST_20260101120000_000001.png", "TEST_20260101120000_000002.png"]
    assert all(f.stat().st_size > 5000 for f in frames)
    assert all(f in res.files for f in frames)


def test_force_field_per_cell_and_total_consistency():
    """Per-cell FORCE_FIELD (reference update_force_field,
    kernel.cpp:2031-2130): nonzero only on solid cells, front face of the
    block feels +x push, and the total equals the per-cell sum."""
    import jax.numpy as jnp

    from latticeurbanwind_tpu.run.snapshots import solid_boundary_force_field

    config, state = _channel_with_block()
    run = make_multi_step(config, n_inner=100)
    out = run(state, DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3)))
    F = solid_boundary_force_field(out)
    solid = (np.asarray(out.flags) & TYPE_S) != 0
    assert F.shape == (3, *solid.shape)
    assert np.all(F[:, ~solid] == 0.0)
    # upstream (west) face column of the block: net +x force
    front = F[0, 2:8, 6:10, 10]
    assert front.sum() > 0
    # total is exactly the field sum
    np.testing.assert_allclose(solid_boundary_force(out),
                               F.sum(axis=(1, 2, 3)))


def test_render_scene_force_vectors(tmp_path):
    """Force-vector overlay renders (graphics_flags FORCE_FIELD branch,
    kernel.cpp:2698-2709)."""
    import jax.numpy as jnp

    from latticeurbanwind_tpu.run.render import Camera, render_scene
    from latticeurbanwind_tpu.run.snapshots import solid_boundary_force_field

    config, state = _channel_with_block()
    run = make_multi_step(config, n_inner=50)
    out = run(state, DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3)))
    F = solid_boundary_force_field(out)
    solid = (np.asarray(out.flags) & TYPE_S) != 0
    p = render_scene(solid, np.asarray(out.u), tmp_path / "forces.png",
                     cam=Camera(width=240, height=180), streamlines=False,
                     force_field=F)
    assert p.exists() and p.stat().st_size > 2000

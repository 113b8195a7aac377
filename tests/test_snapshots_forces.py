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

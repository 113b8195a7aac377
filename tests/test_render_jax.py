"""On-device renderer (run/render_jax.py): march equivalence with the
numpy renderer, device streamlines, and the snapshot/frame device path
(reference: in-device graphics kernels, kernel.cpp:2642-3200, frames per
event setup.cpp:4843-4861)."""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from latticeurbanwind_tpu.run.render import (Camera, _camera_rays, _march,
                                             integrate_streamlines,
                                             raytrace_masks)
from latticeurbanwind_tpu.run.render_jax import (_march_trace,
                                                 _streamlines_device,
                                                 q_criterion_device,
                                                 render_scene_device)
from latticeurbanwind_tpu.run.snapshots import q_criterion


def _scene(n=28):
    zz, yy, xx = np.meshgrid(*(np.arange(n),) * 3, indexing="ij")
    solid = (zz < 3) | ((np.abs(xx - n // 2) < 3)
                        & (np.abs(yy - n // 2) < 3) & (zz < n // 2))
    speed = np.exp(-((xx - 20.0) ** 2 + (yy - n // 2) ** 2
                     + (zz - 10.0) ** 2) / 60).astype(np.float32)
    u = np.stack([speed, 0.1 * speed, np.zeros_like(speed)])
    return solid, u, speed


def test_march_matches_numpy_marcher():
    """Same step length + same first-hit rule -> the device march agrees
    with render._march on hit mask and depth (up to one step of jitter)."""
    solid, _, _ = _scene()
    cam = Camera(width=72, height=54)
    origins, d, diag = _camera_rays(solid.shape, cam)
    hit_np, t_np, _ = _march(solid, origins, d, diag)

    n_steps = int(np.ceil(2.0 * np.linalg.norm(solid.shape) / 0.7)) + 2
    hit_lab, t_dev, _, _, _, _ = _march_trace(
        jnp.asarray(solid, jnp.int8), jnp.zeros(solid.shape, jnp.float32),
        jnp.asarray(origins), jnp.asarray(d), jnp.float32(0.0),
        n_steps=n_steps, with_field=False)
    hit_dev = np.asarray(hit_lab) > 0
    agree = (hit_dev == hit_np).mean()
    assert agree > 0.99, f"hit masks agree only {agree:.3f}"
    both = hit_dev & hit_np
    assert np.abs(np.asarray(t_dev)[both] - t_np[both]).max() < 1.0


def test_q_criterion_device_matches_host():
    _, u, _ = _scene()
    q_host = q_criterion(u.astype(np.float64))
    q_dev = np.asarray(q_criterion_device(jnp.asarray(u)))
    assert np.abs(q_dev - q_host).max() < 1e-5


def test_device_streamlines_match_host():
    solid, u, _ = _scene()
    seeds = np.array([[1.5, 10.0, 8.0], [1.5, 14.0, 12.0]])
    paths_h, speeds_h = integrate_streamlines(u, seeds, n_steps=50,
                                              solid=solid)
    paths_d, speeds_d = _streamlines_device(
        jnp.asarray(u), jnp.asarray(seeds), jnp.asarray(solid), n_steps=50)
    paths_d, speeds_d = np.asarray(paths_d), np.asarray(speeds_d)
    assert paths_d.shape == paths_h.shape
    ok = np.isfinite(paths_h).all(axis=2) & np.isfinite(paths_d).all(axis=2)
    assert ok.any()
    assert np.abs(paths_d[ok] - paths_h[ok]).max() < 0.5


def test_render_scene_device_writes_frames(tmp_path):
    solid, u, speed = _scene()
    q = np.array(q_criterion_device(jnp.asarray(u)))
    q[solid] = 0.0
    pos = q[q > 0]
    thr = float(np.percentile(pos, 97.0)) if pos.size else None
    p = render_scene_device(
        jnp.asarray(solid), jnp.asarray(u), tmp_path / "dev.png",
        q=jnp.asarray(q) if thr is not None else None, q_threshold=thr,
        cam=Camera(width=200, height=150), volume_mode=True)
    assert p.exists() and p.stat().st_size > 3000
    p2 = render_scene_device(
        jnp.asarray(solid), jnp.asarray(u), tmp_path / "persp.png",
        cam=Camera(width=200, height=150, fov=70.0), streamlines=False)
    assert p2.exists()


def test_snapshot_and_frame_device_path(tmp_path, monkeypatch):
    """LUW_RENDER_DEVICE=1 forces the on-device pipeline end-to-end
    through write_snapshot and write_frame."""
    from latticeurbanwind_tpu.lbm.state import TYPE_S
    from latticeurbanwind_tpu.run.snapshots import write_frame, write_snapshot

    solid, u, _ = _scene(20)
    flags = np.where(solid, TYPE_S, 0).astype(np.uint8)

    class S:    # minimal LBMState stand-in for the fields snapshots reads
        pass

    st = S()
    st.u = jnp.asarray(u)
    st.flags = jnp.asarray(flags)

    monkeypatch.setenv("LUW_RENDER_DEVICE", "1")
    out = write_snapshot(st, tmp_path / "snap.png", title="dev")
    assert out.exists()
    assert (tmp_path / "snap_3d.png").exists()
    fr = write_frame(st, tmp_path / "frames" / "f_000001.png")
    assert fr.exists() and fr.stat().st_size > 3000

    monkeypatch.setenv("LUW_RENDER_DEVICE", "0")
    out2 = write_snapshot(st, tmp_path / "snap_host.png", title="host")
    assert out2.exists()

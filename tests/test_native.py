"""Native C++ components: voxelizer equivalence vs numpy path, BE encoder."""

import numpy as np
import pytest

from latticeurbanwind_tpu.geometry import Mesh, voxelize_mesh_columns
from latticeurbanwind_tpu.utils.native import (
    encode_be_f32_aos_native, load, voxelize_columns_native,
)
from tests.test_geometry import box_mesh

requires_native = pytest.mark.skipif(load() is None,
                                     reason="native library unavailable")


@requires_native
def test_native_voxelizer_matches_numpy():
    m1 = box_mesh((1.5, 2.5, 0.0), (9.5, 7.5, 5.5))
    m2 = box_mesh((11, 1, 0), (14, 4, 8))
    mesh = Mesh(tris=np.concatenate([m1.tris, m2.tris]))
    shape = (10, 10, 16)
    native = voxelize_mesh_columns(mesh, shape, use_native=True)
    pure = voxelize_mesh_columns(mesh, shape, use_native=False)
    np.testing.assert_array_equal(native, pure)
    assert native.sum() > 0


@requires_native
def test_native_voxelizer_terrain_clip_parity():
    # open-bottom column (odd crossings): solid extends down from the surface
    tris = np.asarray([[[0, 0, 3.0], [8, 0, 3.0], [8, 8, 3.0]],
                       [[0, 0, 3.0], [8, 8, 3.0], [0, 8, 3.0]]], np.float32)
    mesh = Mesh(tris=tris)
    native = voxelize_mesh_columns(mesh, (6, 8, 8), use_native=True)
    pure = voxelize_mesh_columns(mesh, (6, 8, 8), use_native=False)
    np.testing.assert_array_equal(native, pure)
    assert native[0].any() and not native[5].any()


@requires_native
def test_native_be_encoder():
    rng = np.random.default_rng(0)
    planes = rng.standard_normal((3, 1000)).astype(np.float32)
    raw = encode_be_f32_aos_native(planes)
    got = np.frombuffer(raw, dtype=">f4").reshape(1000, 3)
    np.testing.assert_array_equal(got, planes.T)

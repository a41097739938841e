"""Native geometry runtime tests: SDF sign/value vs analytic shapes,
surface sampling, marching tetrahedra."""

import numpy as np
import pytest

from nefii_tpu.native import MeshSDF, marching_tetrahedra


def _icosphere(subdiv=3, r=1.0):
    """Unit icosphere by midpoint subdivision."""
    t = (1 + np.sqrt(5)) / 2
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        float,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ]
    verts = list(map(tuple, verts))
    cache = {}

    def midpoint(i, j):
        key = (min(i, j), max(i, j))
        if key not in cache:
            m = np.asarray(verts[i]) + np.asarray(verts[j])
            m /= np.linalg.norm(m)
            verts.append(tuple(m))
            cache[key] = len(verts) - 1
        return cache[key]

    for _ in range(subdiv):
        new = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = new
    return np.asarray(verts) * r, np.asarray(faces, np.int32)


@pytest.fixture(scope="module")
def sphere_mesh():
    v, f = _icosphere(3, r=0.7)
    return MeshSDF(v, f)


def test_sdf_matches_analytic_sphere(sphere_mesh):
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
    sdf = sphere_mesh.signed_distance(pts)
    analytic = np.linalg.norm(pts, axis=1) - 0.7
    # icosphere subdiv-3 approximates the sphere to ~2e-3
    np.testing.assert_allclose(sdf, analytic, atol=5e-3)
    # signs exact away from the surface
    away = np.abs(analytic) > 0.02
    assert (np.sign(sdf[away]) == np.sign(analytic[away])).all()


def test_sdf_inside_outside_cube():
    v = np.array(
        [
            [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
            [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
        ],
        float,
    ) - 0.5
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
            [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
            [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7],
        ],
        np.int32,
    )
    m = MeshSDF(v, f)
    assert m.signed_distance(np.zeros((1, 3), np.float32))[0] < -0.4
    assert m.signed_distance(np.array([[0.9, 0, 0]], np.float32))[0] > 0.35
    # face distance exact
    d = m.signed_distance(np.array([[0.5 + 0.25, 0, 0]], np.float32))[0]
    np.testing.assert_allclose(d, 0.25, atol=1e-6)


def test_surface_sampling(sphere_mesh):
    pts, normals = sphere_mesh.sample_surface(5000, seed=42)
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r, 0.7, atol=5e-3)
    # normals approximately radial and unit
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-5)
    cos = np.sum(pts / r[:, None] * normals, axis=1)
    assert cos.mean() > 0.99
    # area: sphere area ~ 4 pi r^2
    np.testing.assert_allclose(
        sphere_mesh.total_area, 4 * np.pi * 0.49, rtol=0.01
    )
    # deterministic per seed
    pts2, _ = sphere_mesh.sample_surface(5000, seed=42)
    np.testing.assert_array_equal(pts, pts2)


def test_marching_tetrahedra_sphere():
    n = 48
    x = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    grid = np.sqrt(X**2 + Y**2 + Z**2) - 0.6
    tris = marching_tetrahedra(grid.astype(np.float32), 0.0)
    assert len(tris) > 1000
    # vertices lie near the r=0.6 sphere (in grid coords: r=0.6/ (2/(n-1)))
    pts = tris.reshape(-1, 3)
    world = pts * (2.0 / (n - 1)) - 1.0
    r = np.linalg.norm(world, axis=1)
    np.testing.assert_allclose(r, 0.6, atol=0.05)

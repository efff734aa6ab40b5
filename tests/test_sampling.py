"""Poisson-disk boundary sampler tests: minimum spacing, surface adherence,
coverage (SURVEY.md §2.15)."""

import numpy as np

from wcsph_tpu.sampling import poisson_disk_sample


def _unit_cube_mesh():
    v = np.array([(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                 np.float32)
    # 12 triangles, 2 per face (vertex index = 4x + 2y + z)
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5),   # x = 0, x = 1
        (0, 4, 5, 1), (2, 3, 7, 6),   # y = 0, y = 1
        (0, 2, 6, 4), (1, 5, 7, 3),   # z = 0, z = 1
    ]
    f = []
    for a, b, c, d in quads:
        f += [(a, b, c), (a, c, d)]
    return v, np.asarray(f, np.int32)


def test_cube_sampling_spacing_and_coverage():
    r = 0.1
    v, f = _unit_cube_mesh()
    pts = poisson_disk_sample(v, f, r, trials=6, seed=1)
    assert pts.shape[0] > 60, pts.shape
    # all points on the cube surface
    on_face = np.zeros(pts.shape[0], bool)
    for d in range(3):
        on_face |= (np.abs(pts[:, d]) < 1e-4) | (np.abs(pts[:, d] - 1) < 1e-4)
    assert on_face.mean() > 0.99
    # minimum EUCLIDEAN spacing holds for same-plane pairs (the geodesic
    # correction only stretches distances across face creases)
    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    np.fill_diagonal(d2, 1e9)
    same_plane = np.zeros_like(d2, dtype=bool)
    for d in range(3):
        for val in (0.0, 1.0):
            m = np.abs(pts[:, d] - val) < 1e-4
            same_plane |= m[:, None] & m[None, :]
    viol = (d2 < (0.999 * r) ** 2) & same_plane
    assert not viol.any(), np.sqrt(d2[viol]).min()
    # coverage: kept density near the theoretical packing ballpark
    area = 6.0
    n_max = area / (np.pi * (r / 2) ** 2)     # tight circle packing bound
    assert pts.shape[0] > 0.25 * n_max


def test_sampling_deterministic():
    r = 0.12
    v, f = _unit_cube_mesh()
    p1 = poisson_disk_sample(v, f, r, trials=2, seed=7)
    p2 = poisson_disk_sample(v, f, r, trials=2, seed=7)
    np.testing.assert_array_equal(p1, p2)


def test_sampling_chunked_spacing():
    """The z-chunked path (big artist shells whose dense cell tables would
    not fit device memory) keeps the minimum-spacing guarantee ACROSS chunk
    boundaries and yields comparable coverage to the one-chunk run."""
    r = 0.1
    v, f = _unit_cube_mesh()
    full = poisson_disk_sample(v, f, r, trials=4, seed=3)
    # force ~6 z-chunks on the same mesh (cube grid is ~20^3 cells)
    chunked = poisson_disk_sample(v, f, r, trials=4, seed=3, max_cells=3200)
    assert 0.7 * full.shape[0] < chunked.shape[0] < 1.3 * full.shape[0]
    d2 = np.sum((chunked[:, None, :] - chunked[None, :, :]) ** 2, axis=-1)
    np.fill_diagonal(d2, 1e9)
    same_plane = np.zeros_like(d2, dtype=bool)
    for d in range(3):
        for val in (0.0, 1.0):
            m = np.abs(chunked[:, d] - val) < 1e-4
            same_plane |= m[:, None] & m[None, :]
    viol = (d2 < (0.999 * r) ** 2) & same_plane
    assert not viol.any(), np.sqrt(d2[viol]).min()

import numpy as np

from myslam_tpu.ops.marching import extract_isosurface
from myslam_tpu.utils.ply import read_ply, write_ply


def sphere_volume(n=48, r=0.6):
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    return np.linalg.norm(g, axis=-1) - r, xs


def test_sphere_surface():
    vol, xs = sphere_volume()
    spacing = xs[1] - xs[0]
    verts, faces = extract_isosurface(
        vol, origin=[-1, -1, -1], spacing=[spacing] * 3)
    assert len(verts) > 1000
    assert len(faces) > 2000
    radii = np.linalg.norm(verts, axis=-1)
    # all vertices within one cell of the true sphere
    assert np.abs(radii - 0.6).max() < spacing
    assert np.abs(radii - 0.6).mean() < 0.25 * spacing
    # faces reference valid vertices
    assert faces.max() < len(verts)
    # mesh area close to sphere area 4*pi*r^2
    tri = verts[faces]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1).sum()
    assert abs(area - 4 * np.pi * 0.36) / (4 * np.pi * 0.36) < 0.05


def test_multiple_slabs_consistent():
    vol, xs = sphere_volume(n=40)
    spacing = xs[1] - xs[0]
    v1, f1 = extract_isosurface(vol, [-1, -1, -1], [spacing] * 3,
                                slab_cells=10_000)
    v2, f2 = extract_isosurface(vol, [-1, -1, -1], [spacing] * 3)
    # same surface regardless of slab partitioning
    assert abs(len(f1) - len(f2)) == 0
    assert abs(len(v1) - len(v2)) == 0


def test_empty_volume():
    vol = np.ones((8, 8, 8), np.float32)
    verts, faces = extract_isosurface(vol, [0, 0, 0], [1, 1, 1])
    assert len(verts) == 0 and len(faces) == 0


def test_ply_roundtrip(tmp_path):
    vol, xs = sphere_volume(n=24)
    spacing = xs[1] - xs[0]
    verts, faces = extract_isosurface(vol, [-1, -1, -1], [spacing] * 3)
    colors = np.random.default_rng(0).uniform(size=(len(verts), 3))
    path = str(tmp_path / "m.ply")
    write_ply(path, verts, faces, colors)
    v2, f2, c2 = read_ply(path)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    assert c2 is not None and c2.shape == (len(verts), 3)


def test_tiny_slabs_match_default():
    # A tiny slab budget forces many x-slabs through the count pass and
    # the per-slab extraction; the welded surface must match the
    # single-slab extraction exactly (vertices AND connectivity).
    vol, xs = sphere_volume(n=40)
    spacing = xs[1] - xs[0]
    v1, f1 = extract_isosurface(vol, [-1, -1, -1], [spacing] * 3,
                                slab_cells=2 * 39 * 39)
    v2, f2 = extract_isosurface(vol, [-1, -1, -1], [spacing] * 3)
    assert len(f1) == len(f2)
    assert len(v1) == len(v2)
    np.testing.assert_allclose(v1, v2, atol=1e-6)

    def canon(v, f):
        # order-independent triangle set, resolved to coordinates
        tris = v[f]  # (F, 3, 3)
        tris = np.sort(tris.round(6), axis=1)
        order = np.lexsort(tris.reshape(len(tris), -1).T[::-1])
        return tris[order]

    np.testing.assert_allclose(canon(v1, f1), canon(v2, f2), atol=1e-6)

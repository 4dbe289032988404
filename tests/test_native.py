"""Native C++ runtime library: PNG, Morton sort, LBVH build."""

import numpy as np
import pytest

native = pytest.importorskip("rust_ray_tracer_tpu.native")

from rust_ray_tracer_tpu.utils import image as im  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def built():
    try:
        native.build()
    except Exception as e:
        pytest.skip(f"native toolchain unavailable: {e}")


def test_png_roundtrip_native():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    data = native.png_encode_native(rgb)
    back = im.decode_png(data)
    np.testing.assert_array_equal(back, rgb)


def test_morton_sort_orders_locally():
    """Points on a line must come out in coordinate order."""
    n = 64
    pts = np.zeros((n, 3), np.float32)
    rng = np.random.default_rng(2)
    xs = rng.permutation(n).astype(np.float32)
    pts[:, 0] = xs
    perm = native.morton_sort_native(pts)
    np.testing.assert_array_equal(xs[perm], np.sort(xs))


def test_morton_native_numpy_identical():
    """The NumPy fallback must produce the SAME permutation as the native
    sort for any input (bitwise-determinism invariant: the compiled scene
    may not depend on whether librrt_native.so built). Includes
    quantization-boundary centroids where f64 math used to diverge."""
    from rust_ray_tracer_tpu.models.scene import _morton_codes_np

    rng = np.random.default_rng(7)
    pts = rng.uniform(-5.0, 11.0, (4096, 3)).astype(np.float32)
    # adversarial rows: exact quantization-boundary fractions k/1023
    k = rng.integers(0, 1024, (512, 3))
    pts = np.concatenate(
        [pts, (-5.0 + 16.0 * k / 1023.0).astype(np.float32)], axis=0)
    native_perm = native.morton_sort_native(pts)
    np_perm = np.argsort(_morton_codes_np(pts), kind="stable")
    np.testing.assert_array_equal(native_perm, np_perm)


def oracle_hit_all(aabb_min, aabb_max, o, d):
    """Brute-force: which leaf boxes does the ray hit?"""
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    t0 = (aabb_min - o) * inv
    t1 = (aabb_max - o) * inv
    tmin = np.minimum(t0, t1).max(axis=1)
    tmax = np.maximum(t0, t1).min(axis=1)
    return (tmax >= np.maximum(tmin, 0.0)) & (tmax >= tmin)


class TestLBVH:
    def build(self, n, seed=0):
        rng = np.random.default_rng(seed)
        c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
        half = rng.uniform(0.1, 0.5, (n, 3)).astype(np.float32)
        mn, mx = c - half, c + half
        perm = native.morton_sort_native(c)
        mn, mx = mn[perm], mx[perm]
        left, right, nmin, nmax = native.lbvh_build_native(mn, mx)
        return mn, mx, left, right, nmin, nmax

    @pytest.mark.parametrize("n", [2, 3, 7, 64, 1000])
    def test_tree_structure(self, n):
        mn, mx, left, right, nmin, nmax = self.build(n)
        # every node except the root has exactly one parent
        seen = np.zeros(2 * n - 1, bool)
        seen[0] = True
        for ch in np.concatenate([left, right]):
            assert not seen[ch], "node claimed twice"
            seen[ch] = True
        assert seen.all(), "orphan nodes"

    @pytest.mark.parametrize("n", [2, 5, 128])
    def test_boxes_contain_children(self, n):
        mn, mx, left, right, nmin, nmax = self.build(n)
        for i in range(n - 1):
            for ch in (left[i], right[i]):
                assert (nmin[i] <= nmin[ch] + 1e-6).all()
                assert (nmax[i] >= nmax[ch] - 1e-6).all()
        # leaves hold the input boxes
        np.testing.assert_allclose(nmin[n - 1:], mn)
        np.testing.assert_allclose(nmax[n - 1:], mx)

    def test_traversal_finds_all_hits(self):
        """Stack traversal of the tree finds exactly the leaves a brute
        force AABB sweep finds."""
        n = 500
        mn, mx, left, right, nmin, nmax = self.build(n, seed=3)
        rng = np.random.default_rng(4)
        for _ in range(20):
            o = rng.uniform(-15, 15, 3).astype(np.float32)
            d = rng.standard_normal(3).astype(np.float32)
            expect = set(np.nonzero(oracle_hit_all(mn, mx, o, d))[0])
            got = set()
            stack = [0]
            while stack:
                node = stack.pop()
                if not oracle_hit_all(nmin[node:node + 1],
                                      nmax[node:node + 1], o, d)[0]:
                    continue
                if node >= n - 1:
                    got.add(node - (n - 1))
                else:
                    stack.extend((left[node], right[node]))
            assert got == expect

    def test_single_leaf(self):
        mn = np.array([[0, 0, 0]], np.float32)
        mx = np.array([[1, 1, 1]], np.float32)
        left, right, nmin, nmax = native.lbvh_build_native(mn, mx)
        np.testing.assert_allclose(nmin[0], mn[0])
        np.testing.assert_allclose(nmax[0], mx[0])

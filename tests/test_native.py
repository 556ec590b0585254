"""Native C++ host library vs numpy/scipy oracles (and vs the device
implementations' semantics)."""
import numpy as np
import pytest

from gcl_tpu import native


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native library unavailable and could not be built")
    return True


class TestNative:
    def test_voxelize(self, rng, built):
        pts = rng.randn(5000, 3).astype(np.float32) * 5
        c, r = native.voxelize(pts, 0.3)
        oc = np.floor(pts / 0.3).astype(np.int32)
        want = {tuple(x) for x in np.unique(oc, axis=0)}
        assert {tuple(x) for x in c} == want
        # representative point quantizes to its voxel
        back = np.floor(pts[r] / 0.3).astype(np.int32)
        assert np.array_equal(back, c)

    def test_radius_knn(self, rng, built):
        from scipy.spatial import cKDTree

        pts = rng.randn(3000, 3).astype(np.float32) * 4
        q = rng.randn(300, 3).astype(np.float32) * 4
        idx, hit = native.radius_knn(q, pts, 0.6, 5)
        tree = cKDTree(pts)
        for i in range(300):
            d, wi = tree.query(q[i], k=5, distance_upper_bound=0.6)
            want = [int(w) for w, dd in zip(np.atleast_1d(wi),
                                            np.atleast_1d(d))
                    if np.isfinite(dd)]
            assert list(idx[i][hit[i]]) == want

    def test_kernel_map(self, rng, built):
        ic = np.unique(rng.randint(-6, 6, (300, 3)), axis=0).astype(
            np.int32)
        oc = ic[::2]
        off = np.array([[dx, dy, dz] for dx in (-1, 0, 1)
                        for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
                       np.int32)
        km = native.kernel_map(ic, oc, off)
        table = {tuple(c): i for i, c in enumerate(map(tuple, ic))}
        want = np.array([[table.get(tuple(c + d), -1) for c in oc]
                         for d in off])
        assert np.array_equal(km, want)

    def test_large_throughput(self, rng, built):
        """~120k-point scan voxelizes + searches in well under a second."""
        import time

        pts = (rng.randn(120000, 3) * [20, 20, 2]).astype(np.float32)
        t0 = time.perf_counter()
        c, r = native.voxelize(pts, 0.3)
        idx, hit = native.radius_knn(pts[:20000], pts, 0.45, 5)
        dt = time.perf_counter() - t0
        assert dt < 2.0, f"native path too slow: {dt:.2f}s"


class TestScanPrefetcher:
    def test_payloads_survive_cache_pressure(self, tmp_path, built):
        """Submit far more files than cache_entries: every payload must
        still come back exact — entries evicted under pressure fall back
        to a synchronous read, never a wrong/missing payload — and the
        table must not grow unboundedly (eviction is exercised)."""
        from gcl_tpu.native import ScanPrefetcher

        rng = np.random.RandomState(0)
        paths, payloads = [], []
        for i in range(24):
            arr = rng.randn(64 + i).astype(np.float32)
            p = str(tmp_path / f"scan_{i:02d}.bin")
            arr.tofile(p)
            paths.append(p)
            payloads.append(arr)

        reader = ScanPrefetcher(n_threads=2, cache_entries=4)
        for p in paths:
            reader.submit(p)
        # let the pool drain so eviction sees completed entries
        import time
        time.sleep(0.3)
        # second submit wave forces evictions of the completed first wave
        for i in range(24):
            arr = rng.randn(32).astype(np.float32)
            p = str(tmp_path / f"wave2_{i:02d}.bin")
            arr.tofile(p)
            reader.submit(p)
            paths.append(p)
            payloads.append(arr)
        for p, want in zip(paths, payloads):
            got = reader.fetch(p)
            np.testing.assert_array_equal(got, want, err_msg=p)

    def test_unprefetched_fetch_reads_synchronously(self, tmp_path, built):
        from gcl_tpu.native import ScanPrefetcher
        arr = np.arange(10, dtype=np.float32)
        p = str(tmp_path / "plain.bin")
        arr.tofile(p)
        reader = ScanPrefetcher(n_threads=1, cache_entries=4)
        np.testing.assert_array_equal(reader.fetch(p), arr)

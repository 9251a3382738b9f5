"""Sampling primitive tests vs scipy / direct indexing."""

import numpy as np
import jax.numpy as jnp

from mpmvs_tpu.ops.sampling import (bilinear_sample, bilinear_sample_batched,
                                    nearest_sample_batched, shift_2d)


class TestBilinear:
    def test_exact_at_integer_coords(self):
        rng = np.random.default_rng(0)
        img = rng.standard_normal((9, 13)).astype(np.float32)
        ys, xs = np.meshgrid(np.arange(9), np.arange(13), indexing="ij")
        out = bilinear_sample(jnp.asarray(img), jnp.asarray(xs, jnp.float32),
                              jnp.asarray(ys, jnp.float32))
        np.testing.assert_allclose(out, img, rtol=1e-6)

    def test_matches_scipy_map_coordinates(self):
        from scipy.ndimage import map_coordinates
        rng = np.random.default_rng(1)
        img = rng.standard_normal((20, 30)).astype(np.float64)
        x = rng.uniform(0, 29, 200)
        y = rng.uniform(0, 19, 200)
        ours = bilinear_sample(jnp.asarray(img, jnp.float32),
                               jnp.asarray(x, jnp.float32),
                               jnp.asarray(y, jnp.float32))
        ref = map_coordinates(img, [y, x], order=1, mode="nearest")
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_clamp_outside(self):
        img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
        out = bilinear_sample(img, jnp.asarray([-5.0, 10.0]), jnp.asarray([-3.0, 7.0]))
        assert float(out[0]) == 0.0
        assert float(out[1]) == 11.0

    def test_batched_respects_per_view_extent(self):
        imgs = np.zeros((2, 4, 6), np.float32)
        imgs[0] = np.arange(24).reshape(4, 6)
        imgs[1] = np.arange(24).reshape(4, 6) * 10
        # view 1 is only valid 3x4
        widths = jnp.asarray([6.0, 4.0])
        heights = jnp.asarray([4.0, 3.0])
        view = jnp.asarray([0, 1])
        out = nearest_sample_batched(jnp.asarray(imgs), view,
                                     jnp.asarray([5.9, 5.9]),
                                     jnp.asarray([3.9, 3.9]),
                                     widths, heights)
        assert float(out[0]) == 23.0       # clamped to (3, 5)
        assert float(out[1]) == 150.0      # clamped to (2, 3) -> 15*10

    def test_batched_matches_single(self):
        rng = np.random.default_rng(2)
        imgs = rng.standard_normal((3, 10, 12)).astype(np.float32)
        x = rng.uniform(0, 11, (3, 50)).astype(np.float32)
        y = rng.uniform(0, 9, (3, 50)).astype(np.float32)
        view = np.broadcast_to(np.arange(3)[:, None], (3, 50))
        out = bilinear_sample_batched(
            jnp.asarray(imgs), jnp.asarray(view), jnp.asarray(x), jnp.asarray(y),
            jnp.full((3,), 12.0), jnp.full((3,), 10.0))
        for v in range(3):
            single = bilinear_sample(jnp.asarray(imgs[v]), jnp.asarray(x[v]),
                                     jnp.asarray(y[v]))
            np.testing.assert_allclose(out[v], single, rtol=1e-5)


class TestShift:
    def test_shift_semantics(self):
        img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
        # value at (y,x) = img[y+1, x+2]
        out = shift_2d(img, dx=2, dy=1, fill=-1.0)
        assert float(out[0, 0]) == float(img[1, 2])
        assert float(out[2, 0]) == -1.0  # y+1 out of range
        assert float(out[0, 3]) == -1.0  # x+2 out of range

    def test_shift_negative_edge_clamp(self):
        img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
        out = shift_2d(img, dx=-1, dy=-2)
        assert float(out[0, 0]) == float(img[0, 0])
        assert float(out[2, 3]) == float(img[0, 2])

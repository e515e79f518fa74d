"""Native C++ op tests: build, numerical agreement with OpenCV, speed sanity."""

import numpy as np
import pytest

from gluefactory_tpu import native


class TestNativeOps:
    def test_builds(self):
        assert native.available(), "g++ build of warp_ops failed"

    def test_warp_matches_opencv(self, rng):
        import cv2

        img = rng.rand(120, 160, 1).astype(np.float32)
        H = np.array([[1.1, 0.08, 5.0], [-0.05, 0.95, 3.0], [1e-4, -5e-5, 1.0]])
        ours = native.warp_perspective(img, H, (160, 120))
        ref = cv2.warpPerspective(img, H, (160, 120)).reshape(120, 160, 1)
        # interiors must agree closely (borders differ by convention)
        diff = np.abs(ours - ref)[8:-8, 8:-8]
        assert diff.max() < 0.02, diff.max()

    def test_gray_and_brightness(self, rng):
        img = rng.rand(32, 32, 3).astype(np.float32)
        g = native.rgb_to_gray(img)
        ref = (img * np.array([0.299, 0.587, 0.114])).sum(-1, keepdims=True)
        np.testing.assert_allclose(g, ref, atol=1e-5)
        bc = native.brightness_contrast(img, 1.5, -0.2)
        np.testing.assert_allclose(bc, np.clip(img * 1.5 - 0.2, 0, 1), atol=1e-6)

    def test_resize(self, rng):
        import cv2

        img = rng.rand(64, 96, 1).astype(np.float32)
        ours = native.resize_bilinear(img, (48, 32))
        ref = cv2.resize(img, (48, 32), interpolation=cv2.INTER_LINEAR).reshape(32, 48, 1)
        assert np.abs(ours - ref)[2:-2, 2:-2].max() < 0.02


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])

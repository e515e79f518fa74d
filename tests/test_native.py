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

    def test_lsd_synthetic_rectangle(self):
        # a dark axis-aligned rectangle yields exactly its 4 edge segments
        img = np.full((240, 320), 0.9, np.float32)
        img[60:180, 80:240] = 0.1
        segs = native.lsd_detect(img)
        assert segs is not None and len(segs) == 4, segs
        # every segment must lie on one of the 4 known edges (within ~2px)
        edges = [
            ((80, 60), (240, 60)), ((80, 180), (240, 180)),
            ((80, 60), (80, 180)), ((240, 60), (240, 180)),
        ]
        for row in segs:
            p1, p2 = row[:2], row[2:4]
            ok = False
            for (a, b) in edges:
                a, b = np.array(a, np.float32), np.array(b, np.float32)
                d = min(
                    np.linalg.norm(p1 - a) + np.linalg.norm(p2 - b),
                    np.linalg.norm(p1 - b) + np.linalg.norm(p2 - a),
                )
                ok = ok or d < 8.0
            assert ok, (p1, p2)
            assert row[6] > 10.0  # hugely significant (-log10 NFA)

    def test_lsd_rotated_line(self):
        # a single thick diagonal stroke -> segments along its direction
        img = np.full((200, 200), 0.85, np.float32)
        for t in np.linspace(0, 1, 400):
            x, y = 30 + t * 140, 40 + t * 120
            img[int(y) - 1 : int(y) + 2, int(x) - 1 : int(x) + 2] = 0.1
        segs = native.lsd_detect(img)
        assert segs is not None and len(segs) >= 2
        expect = np.arctan2(120.0, 140.0)
        for row in segs:
            ang = np.arctan2(row[3] - row[1], row[2] - row[0])
            d = abs((ang - expect + np.pi / 2) % np.pi - np.pi / 2)
            assert d < np.deg2rad(8), np.rad2deg(ang)

    def test_lsd_blank_image(self):
        segs = native.lsd_detect(np.full((100, 100), 0.5, np.float32))
        assert segs is not None and len(segs) == 0

    def test_lsd_model_native_backend(self):
        from gluefactory_tpu.models import get_model

        img = np.full((160, 160), 0.9, np.float32)
        img[40:120, 40:120] = 0.2
        model = get_model("lines.lsd").from_conf({"max_num_lines": 32, "min_length": 10})
        out = model({"image": np.asarray(img)[None, ..., None]})
        n = int(np.asarray(out["line_mask"]).sum())
        assert n == 4, n
        sc = np.asarray(out["line_scores"])[0]
        assert sc.max() <= 1.0 + 1e-6 and sc[0] > 0.5  # normalized, sorted

    def test_resize(self, rng):
        import cv2

        img = rng.rand(64, 96, 1).astype(np.float32)
        ours = native.resize_bilinear(img, (48, 32))
        ref = cv2.resize(img, (48, 32), interpolation=cv2.INTER_LINEAR).reshape(32, 48, 1)
        assert np.abs(ours - ref)[2:-2, 2:-2].max() < 0.02


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])

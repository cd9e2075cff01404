"""bbox post-processing utilities and remaining geometry edge cases."""

import numpy as np
import pytest

import jax.numpy as jnp

from stlpose_tpu.ops.bbox_utils import (bbox_filtering, bbox_nms,
                                        bbox_to_image_keypoints)
from stlpose_tpu.data.pose_dataset import (_xywh_to_cs_archdata, _xywh_to_cs,
                                           AugmentationParams)
from stlpose_tpu.ops import affine, warp
from tests import oracle


class TestBboxUtils:
    def test_filtering_class_and_threshold(self):
        dets = {"boxes": np.array([[[0, 0, 10, 10], [5, 5, 20, 20],
                                    [1, 1, 9, 9]]], np.float32),
                "labels": np.array([[1, 2, 1]]),
                "scores": np.array([[0.9, 0.95, 0.3]]),
                "valid": np.array([[True, True, True]])}
        out = bbox_filtering(dets, filter_class=1, thr=0.5)[0]
        assert len(out[0]) == 1                 # only the 0.9 person box
        assert out[2][0] == pytest.approx(0.9)

    def test_single_image_variant(self):
        dets = {"boxes": np.array([[0, 0, 10, 10]], np.float32),
                "labels": np.array([1]), "scores": np.array([0.8])}
        boxes, labels, scores = bbox_filtering(dets, thr=0.5)
        assert boxes.shape == (1, 4)

    def test_bbox_nms(self):
        boxes = np.array([[0, 0, 100, 100], [2, 2, 102, 102],
                          [300, 300, 400, 400]], np.float64)
        labels = np.array([1, 1, 1])
        scores = np.array([0.9, 0.85, 0.5])
        b, l, s = bbox_nms(boxes, labels, scores, nms_thr=0.5)
        assert len(b) == 2
        assert s[0] == pytest.approx(0.9)

    def test_keypoint_unmapping(self):
        kpts = np.zeros((1, 2, 3))
        kpts[0, 0] = [96, 128, 0.9]             # center of 192x256 crop
        kpts[0, 1] = [0, 0, 0.8]                # crop origin
        boxes = np.array([[100, 50, 292, 306]])  # 192x256 box at (100, 50)
        out = bbox_to_image_keypoints(kpts, boxes)
        np.testing.assert_allclose(out[0, 0, :2], [196, 178])
        np.testing.assert_allclose(out[0, 1, :2], [100, 50])


class TestGeometryEdgeCases:
    def test_archdata_box2cs_convention(self):
        c, s = _xywh_to_cs_archdata(10, 20, 96, 128)
        np.testing.assert_allclose(c, [58, 84])
        # normalized by crop size (192, 256), no 1.25x padding
        np.testing.assert_allclose(s, [0.5, 0.5])
        c2, s2 = _xywh_to_cs(10, 20, 96, 128)
        np.testing.assert_allclose(s2, np.array([96 / 200, 128 / 200]) * 1.25)

    @pytest.mark.parametrize("rot", [45.0, -80.0, 179.0])
    def test_large_rotation_warp_parity(self, rng, rot):
        img = rng.uniform(0, 255, (240, 320, 3)).astype(np.float32)
        center = np.array([[160.0, 120.0]], np.float32)
        scale = np.array([[0.8, 0.8 * 256 / 192]], np.float32)
        out = np.asarray(warp.affine_warp(
            img[None], center, scale, np.array([rot], np.float32),
            (192, 256)))[0]
        ref = oracle.warp_crop_cv2(img, center[0], scale[0], rot, (192, 256))
        assert np.abs(out - ref).mean() < 0.3

    def test_half_body_zoom_geometry(self, rng):
        aug = AugmentationParams(prob_half_body=1.0, seed=3)
        # all joints visible, clustered upper body
        joints = np.zeros((17, 2))
        joints[:11] = rng.uniform(100, 150, (11, 2))       # upper
        joints[11:] = rng.uniform(200, 260, (6, 2))        # lower
        vis = np.ones(17)
        found_upper = found_lower = False
        for _ in range(50):
            c, s = aug.half_body(joints, vis)
            assert c is not None
            if c[1] < 175:
                found_upper = True
            else:
                found_lower = True
        assert found_upper and found_lower  # randn<0.5 picks both over time

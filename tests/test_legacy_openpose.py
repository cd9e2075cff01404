"""Legacy OpenPose full-image heatmap/PAF generators vs literal reference
oracles (tests/oracle.py::generate_heatmaps_ref / generate_pafs_ref), plus
the matching debug-grid visualizations."""

import numpy as np

from stlpose_tpu.data.legacy_openpose import (COCO_LIMBS, generate_heatmaps,
                                              generate_pafs)
from tests.oracle import generate_heatmaps_ref, generate_pafs_ref


def _random_annotations(rng, n_people, H, W, n_kpts=17, vis_p=0.8):
    anns = []
    for _ in range(n_people):
        kpts = []
        for _ in range(n_kpts):
            x = int(rng.randint(-5, W + 5))
            y = int(rng.randint(-5, H + 5))
            v = int(rng.rand() < vis_p) * int(rng.randint(1, 3))
            kpts += [x, y, v]
        anns.append({"keypoints": kpts})
    return anns


def test_heatmaps_match_reference_oracle():
    rng = np.random.RandomState(0)
    for n_people in (1, 2, 4):
        H, W = 96, 128
        anns = _random_annotations(rng, n_people, H, W)
        ours = generate_heatmaps((H, W), anns, sigma=10)
        ref = generate_heatmaps_ref((H, W), anns, sigma=10)
        assert ours.shape == (18, H, W)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_heatmaps_zero_people():
    out = generate_heatmaps((64, 64), [], sigma=10)
    assert out.shape == (18, 64, 64)
    np.testing.assert_array_equal(out[:-1], 0.0)
    np.testing.assert_array_equal(out[-1], 1.0)


def test_pafs_match_reference_oracle():
    rng = np.random.RandomState(1)
    for n_people in (1, 3):
        H, W = 96, 128
        anns = _random_annotations(rng, n_people, H, W)
        ours = generate_pafs((H, W), anns, COCO_LIMBS, thickness=5)
        ref = generate_pafs_ref((H, W), anns, COCO_LIMBS, thickness=5)
        assert ours.shape == (2 * len(COCO_LIMBS), H, W)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_pafs_coincident_points_and_zero_people():
    # coincident endpoints -> no paf (reference: set_paf norm<1e-7 guard)
    anns = [{"keypoints": [10, 10, 2] * 17}]
    out = generate_pafs((32, 32), anns, ((0, 1),))
    np.testing.assert_array_equal(out, 0.0)
    # zero people -> zeros, not the reference's NaN (documented fix)
    out = generate_pafs((32, 32), [], ((0, 1),))
    np.testing.assert_array_equal(out, 0.0)
    assert not np.isnan(out).any()


def test_debug_grid_visualizations(tmp_path):
    from stlpose_tpu.utils.visualization import (visualize_subset_heatmaps,
                                                 visualize_subset_pafs)
    rng = np.random.RandomState(2)
    H, W = 64, 64
    imgs = rng.randint(0, 255, (3, H, W, 3)).astype(np.uint8)
    anns = _random_annotations(rng, 2, H, W)
    hms = np.stack([generate_heatmaps((H, W), anns) for _ in range(3)])
    pafs = np.stack([generate_pafs((H, W), anns) for _ in range(3)])
    p1 = tmp_path / "hm.png"
    p2 = tmp_path / "paf.png"
    visualize_subset_heatmaps(imgs, hms, savepath=str(p1))
    visualize_subset_pafs(imgs, pafs, savepath=str(p2))
    assert p1.stat().st_size > 0 and p2.stat().st_size > 0

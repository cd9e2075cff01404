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


def _point_in_polygon(x, y, poly):
    """Literal crossing-number oracle for one point (loop form)."""
    xs = poly[0::2]
    ys = poly[1::2]
    n = len(xs)
    inside = False
    for i in range(n):
        x0, y0 = xs[i], ys[i]
        x1, y1 = xs[(i + 1) % n], ys[(i + 1) % n]
        if (y0 <= y) != (y1 <= y):
            xint = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
            if x < xint:
                inside = not inside
    return inside


def _encode_rle_counts_string(counts):
    """Inverse of _decode_rle_counts_string (COCO 5-bit LEB128 + delta),
    used only to round-trip-test the decoder."""
    chars = []
    for i, c in enumerate(counts):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            g = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (g & 0x10)) and \
                   not (x == -1 and (g & 0x10))
            if more:
                g |= 0x20
            chars.append(chr(g + 48))
    return "".join(chars)


def test_polygon_fill_matches_pointwise_oracle():
    from stlpose_tpu.data.legacy_openpose import _fill_polygon
    rng = np.random.RandomState(3)
    H, W = 24, 32
    for _ in range(5):
        n_vert = rng.randint(3, 8)
        poly = []
        for _ in range(n_vert):
            poly += [float(rng.uniform(-2, W + 2)),
                     float(rng.uniform(-2, H + 2))]
        ours = _fill_polygon(H, W, poly)
        ref = np.zeros((H, W), bool)
        for r in range(H):
            for c in range(W):
                ref[r, c] = _point_in_polygon(c + 0.5, r + 0.5, poly)
        np.testing.assert_array_equal(ours, ref)


def test_rle_decode_uncompressed_and_compressed():
    from stlpose_tpu.data.legacy_openpose import (
        _decode_rle, _decode_rle_counts_string, segmentation_to_mask)
    rng = np.random.RandomState(4)
    H, W = 13, 9
    ref = (rng.rand(H, W) > 0.5)
    # build column-major run counts from the mask itself
    flat = ref.T.reshape(-1)
    counts = []
    run_val, run_len = 0, 0
    for v in flat:
        if bool(v) == bool(run_val):
            run_len += 1
        else:
            counts.append(run_len)
            run_val, run_len = int(v), 1
    counts.append(run_len)
    np.testing.assert_array_equal(_decode_rle(counts, H, W), ref)
    # compressed string round-trip through the test-local encoder
    s = _encode_rle_counts_string(counts)
    assert _decode_rle_counts_string(s) == list(counts)
    m = segmentation_to_mask({"counts": s, "size": [H, W]}, H, W)
    np.testing.assert_array_equal(m.astype(bool), ref)
    # uncompressed dict path
    m2 = segmentation_to_mask({"counts": counts, "size": [H, W]}, H, W)
    np.testing.assert_array_equal(m2.astype(bool), ref)


def test_person_mask_contract():
    """get_mask contract (reference data_processing.py:456-470): ones
    everywhere, zeros on every annotated person; multi-polygon
    segmentations are unioned (documented defect fix vs the reference's
    first-polygon-only decode)."""
    from stlpose_tpu.data.legacy_openpose import person_mask
    H, W = 40, 40
    sq1 = [5.0, 5.0, 15.0, 5.0, 15.0, 15.0, 5.0, 15.0]
    sq2 = [25.0, 25.0, 35.0, 25.0, 35.0, 35.0, 25.0, 35.0]
    anns = [{"segmentation": [sq1, sq2]}, {"segmentation": []}]
    mask = person_mask((H, W), anns)
    assert mask.shape == (H, W)
    assert mask[10, 10] == 0.0    # inside sq1
    assert mask[30, 30] == 0.0    # inside sq2 (union, not just first poly)
    assert mask[20, 20] == 1.0    # between the squares
    assert mask[0, 0] == 1.0
    # differential partner when pycocotools is available (not in this image)
    try:
        import pycocotools.mask as pmask
    except ImportError:
        return
    rle = pmask.frPyObjects([sq1], H, W)
    ref_sq1 = pmask.decode(rle)[:, :, 0]
    ours = person_mask((H, W), [{"segmentation": [sq1]}])
    # interiors agree; boundary pixels may differ by the documented
    # pixel-center vs upsampled-walk convention (≤ one boundary ring)
    interior = np.zeros((H, W), bool)
    interior[7:14, 7:14] = True
    np.testing.assert_array_equal(ours[interior] == 0.0,
                                  ref_sq1[interior] > 0.5)


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

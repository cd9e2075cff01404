"""Host-numpy/cv2 oracles reproducing the reference pipeline's numerical
semantics (reference: lib/transforms.py, lib/pose_parsing.py). Used ONLY as
golden references in tests — production code paths never import this module.
"""

import cv2
import numpy as np


def _third_point(a, b):
    d = a - b
    return b + np.array([-d[1], d[0]], dtype=np.float32)


def _rotate(pt, rad):
    sn, cs = np.sin(rad), np.cos(rad)
    return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs])


def get_affine_transform_cv2(center, scale, rot, output_size,
                             shift=np.array([0.0, 0.0]), inv=False):
    """The reference's 3-point-pair construction solved by cv2
    (lib/transforms.py:197-233)."""
    scale = np.asarray(scale, np.float64)
    scale_tmp = scale * 200.0
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size
    rad = np.pi * rot / 180.0
    src_dir = _rotate([0, src_w * -0.5], rad)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = np.asarray(center) + scale_tmp * shift
    src[1] = np.asarray(center) + src_dir + scale_tmp * shift
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    src[2] = _third_point(src[0], src[1])
    dst[2] = _third_point(dst[0], dst[1])
    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


def warp_crop_cv2(img, center, scale, rot, output_size):
    trans = get_affine_transform_cv2(center, scale, rot, output_size)
    return cv2.warpAffine(img, trans,
                          (int(output_size[0]), int(output_size[1])),
                          flags=cv2.INTER_LINEAR)


def get_max_preds_np(heatmaps):
    """Reference argmax decode (lib/pose_parsing.py:16-55)."""
    N, J, H, W = heatmaps.shape
    flat = heatmaps.reshape(N, J, -1)
    idx = np.argmax(flat, 2)
    maxvals = np.amax(flat, 2).reshape(N, J, 1)
    preds = np.tile(idx.reshape(N, J, 1), (1, 1, 2)).astype(np.float32)
    preds[:, :, 0] = preds[:, :, 0] % W
    preds[:, :, 1] = np.floor(preds[:, :, 1] / W)
    preds *= np.tile(np.greater(maxvals, 0.0), (1, 1, 2)).astype(np.float32)
    return preds, maxvals


def get_final_preds_np(heatmaps, center, scale):
    """Reference full decode with sub-pixel shift + un-warp
    (lib/pose_parsing.py:58-92)."""
    coords, maxvals = get_max_preds_np(heatmaps)
    N, J, H, W = heatmaps.shape
    for n in range(N):
        for p in range(J):
            hm = heatmaps[n][p]
            px = int(np.floor(coords[n][p][0] + 0.5))
            py = int(np.floor(coords[n][p][1] + 0.5))
            if 1 < px < W - 1 and 1 < py < H - 1:
                diff = np.array([hm[py][px + 1] - hm[py][px - 1],
                                 hm[py + 1][px] - hm[py - 1][px]])
                coords[n][p] += np.sign(diff) * 0.25
    preds = coords.copy()
    for i in range(N):
        trans = get_affine_transform_cv2(center[i], scale[i], 0, (W, H),
                                         inv=True)
        for p in range(J):
            pt = np.array([coords[i, p, 0], coords[i, p, 1], 1.0])
            preds[i, p] = (trans @ pt)[:2]
    return preds, maxvals, coords


def _bilinear_tv(feat, y, x):
    """torchvision bilinear_interpolate semantics (aligned=False path):
    zero strictly outside (-1, size); coords in [-1, 0] clamp to 0; the
    high tap clamps to the last index (torchvision
    csrc/ops/cpu/roi_align_kernel.cpp)."""
    H, W = feat.shape[:2]
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(feat.shape[2:], feat.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y0, x0 = int(y), int(x)
    y1 = min(y0 + 1, H - 1)
    x1 = min(x0 + 1, W - 1)
    if y0 >= H - 1:
        y0 = y1 = H - 1
        y = float(y0)
    if x0 >= W - 1:
        x0 = x1 = W - 1
        x = float(x0)
    ly, lx = y - y0, x - x0
    return (feat[y0, x0] * (1 - ly) * (1 - lx) +
            feat[y0, x1] * (1 - ly) * lx +
            feat[y1, x0] * ly * (1 - lx) +
            feat[y1, x1] * ly * lx)


def roi_align_oracle(feat, boxes, output_size, sampling_ratio,
                     spatial_scale=1.0):
    """Loop-form torchvision roi_align (aligned=False) over one (H, W, C)
    map — golden oracle for ops/roi_align.py."""
    P = boxes.shape[0]
    C = feat.shape[2]
    out = np.zeros((P, output_size, output_size, C), np.float32)
    for p in range(P):
        x1, y1, x2, y2 = boxes[p] * spatial_scale
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_w = roi_w / output_size
        bin_h = roi_h / output_size
        for ph in range(output_size):
            for pw in range(output_size):
                acc = np.zeros(C, np.float32)
                for iy in range(sampling_ratio):
                    yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / sampling_ratio
                    for ix in range(sampling_ratio):
                        xx = (x1 + pw * bin_w +
                              (ix + 0.5) * bin_w / sampling_ratio)
                        acc += _bilinear_tv(feat, yy, xx)
                out[p, ph, pw] = acc / (sampling_ratio ** 2)
    return out


# ---------------------------------------------------------------------------
# Legacy OpenPose generators (reference: data/data_processing.py:180-397):
# literal windowed-loop re-implementations used as golden oracles for
# stlpose_tpu/data/legacy_openpose.py.
# ---------------------------------------------------------------------------

def _openpose_kernel(sigma):
    ax = np.arange(0, 15) - 7
    xx, yy = np.meshgrid(ax, ax)
    return np.exp(-(np.square(xx) + np.square(yy)) / np.square(sigma))


def _add_gaussian_ref(shape, x, y, sigma):
    """reference: data_processing.py:254-291 (fresh map per call)."""
    kernel = _openpose_kernel(sigma)
    out = np.zeros(shape)
    min_y = max(y - 7, 0)
    off_min_y = abs(y - 7 - min_y)
    max_y = min(y + 8, shape[0])
    off_max_y = 15 - abs(y + 8 - max_y)
    min_x = max(x - 7, 0)
    off_min_x = abs(x - 7 - min_x)
    max_x = min(x + 8, shape[1])
    off_max_x = 15 - abs(x + 8 - max_x)
    out[min_y:max_y, min_x:max_x] = kernel[off_min_y:off_max_y,
                                           off_min_x:off_max_x]
    return out


def generate_heatmaps_ref(image_shape, target, sigma=10):
    """reference: data_processing.py:213-252."""
    H, W = image_shape[:2]
    n_people = len(target)
    n_keypoints = len(target[0]["keypoints"]) // 3 if n_people else 17
    maps = np.zeros((n_keypoints + 1, H, W), np.float32)
    for k in range(n_keypoints):
        aux = np.zeros((n_people, H, W), np.float32)
        for n in range(n_people):
            kp = target[n]["keypoints"][k * 3:(k + 1) * 3]
            if kp[2] > 0:
                aux[n] = _add_gaussian_ref((H, W), int(kp[0]), int(kp[1]),
                                           sigma)
        if n_people:
            maps[k] = aux.max(axis=0)
    maps[-1] = 1 - maps[:-1].max(axis=0)
    return maps


def _set_paf_ref(height, width, a, b, thickness=5):
    """reference: data_processing.py:348-397 (coordinate-swap preserved)."""
    a, b = np.array(a, float)[:2][::-1], np.array(b, float)[:2][::-1]
    paf1 = np.zeros((height, width))
    paf2 = np.zeros((height, width))
    y_ba = b[0] - a[0]
    x_ba = b[1] - a[1]
    x_min = int(max(min(b[1], a[1]) - thickness, 0))
    y_min = int(max(min(b[0], a[0]) - thickness, 0))
    x_max = int(min(max(b[1], a[1]) + thickness, width))
    y_max = int(min(max(b[0], a[0]) + thickness, height))
    norm = (x_ba ** 2 + y_ba ** 2) ** 0.5
    if norm < 1e-7:
        return paf1, paf2
    x_ba, y_ba = x_ba / norm, y_ba / norm
    xx, yy = np.meshgrid(np.arange(x_min, x_max), np.arange(y_min, y_max))
    d = np.abs((xx - a[1]) * y_ba - (yy - a[0]) * x_ba)
    idx = np.argwhere(d <= thickness)
    paf1[idx[:, 0] + y_min, idx[:, 1] + x_min] = x_ba
    paf2[idx[:, 0] + y_min, idx[:, 1] + x_min] = y_ba
    return paf1, paf2


def generate_pafs_ref(image_shape, target, limbs, thickness=5):
    """reference: data_processing.py:294-345."""
    H, W = image_shape[:2]
    n_people = len(target)
    n_keypoints = len(target[0]["keypoints"]) // 3 if n_people else 17
    out = np.zeros((2 * len(limbs), H, W), np.float32)
    for i, (ia, ib) in enumerate(limbs):
        aux1 = np.zeros((n_people, H, W), np.float32)
        aux2 = np.zeros((n_people, H, W), np.float32)
        for n in range(n_people):
            if ia >= n_keypoints or ib >= n_keypoints:
                continue
            ka = target[n]["keypoints"][ia * 3:(ia + 1) * 3]
            kb = target[n]["keypoints"][ib * 3:(ib + 1) * 3]
            if ka[2] > 0 and kb[2] > 0:
                aux1[n], aux2[n] = _set_paf_ref(H, W, ka, kb, thickness)
        if n_people:
            out[2 * i] = aux1.mean(axis=0)
            out[2 * i + 1] = aux2.mean(axis=0)
    return out

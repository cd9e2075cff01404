"""
Closed-form batched affine crop geometry.

The reference builds its 2x3 crop matrices by solving a 3-point-pair system
with ``cv2.getAffineTransform`` (reference: lib/transforms.py:197-233). The
three point pairs it constructs always describe a *similarity* transform
(uniform scale + rotation + translation): the second point is the rotated
"up" direction and the third is a perpendicular construction on both sides.
We therefore compute the matrix in closed form — no linear solve, no host
round-trip — which makes it trivially batchable under ``vmap``/``jit``.

Derivation. With source box width ``src_w = scale[0] * 200`` (the reference's
pixel-std convention), destination size ``(dst_w, dst_h)`` and rotation
``rot`` (degrees), the source-to-destination map is

    X = lam * R(-rot) @ (x - c - src_w_vec * shift) + dst_center

where ``lam = dst_w / src_w``, ``R`` is a 2D rotation, ``c`` the person
center, and ``dst_center = (dst_w/2, dst_h/2)``. The inverse map swaps the
roles. Equality with the reference's cv2 solve is covered by golden tests
(tests/test_affine.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# The reference expresses person scale in units of 200 px
# (reference: lib/transforms.py:209, JointsDataset.py:36).
PIXEL_STD = 200.0


def get_affine_params(center, scale, rot_deg, output_size, shift=(0.0, 0.0),
                      inv: bool = False):
    """Batched (lam, cos, sin, translation) parameters of the crop similarity.

    Args:
      center: (..., 2) person center in source-image pixels.
      scale: (..., 2) person scale in pixel-std units (w, h); only w is used,
        matching the reference (lib/transforms.py:210).
      rot_deg: (...,) rotation in degrees.
      output_size: static (dst_w, dst_h).
      shift: static or (..., 2) shift in scale units.
      inv: if True, parameters of the destination->source map.

    Returns:
      (a, b, tx, ty): arrays broadcast to the batch shape such that the map is
        ``X = [[a, -b], [b, a]] @ x + (tx, ty)``.
    """
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    rot_rad = jnp.asarray(rot_deg, jnp.float32) * (np.pi / 180.0)
    shift = jnp.asarray(shift, jnp.float32)

    dst_w, dst_h = float(output_size[0]), float(output_size[1])
    src_w = scale[..., 0] * PIXEL_STD
    # source anchor: center + scale_tmp * shift  (lib/transforms.py:220)
    scale_tmp = scale * PIXEL_STD
    src_cx = center[..., 0] + scale_tmp[..., 0] * shift[..., 0]
    src_cy = center[..., 1] + scale_tmp[..., 1] * shift[..., 1]

    cs, sn = jnp.cos(rot_rad), jnp.sin(rot_rad)
    if not inv:
        lam = dst_w / src_w
        # R(-rot): [[cos, sin], [-sin, cos]]
        a = lam * cs
        b = -lam * sn          # element (1,0) of lam*R(-rot)
        tx = dst_w * 0.5 - (a * src_cx - b * src_cy)
        ty = dst_h * 0.5 - (b * src_cx + a * src_cy)
    else:
        lam = src_w / dst_w
        # R(rot): [[cos, -sin], [sin, cos]]
        a = lam * cs
        b = lam * sn
        tx = src_cx - (a * dst_w * 0.5 - b * dst_h * 0.5)
        ty = src_cy - (b * dst_w * 0.5 + a * dst_h * 0.5)
    return a, b, tx, ty


def get_affine_matrix(center, scale, rot_deg, output_size, shift=(0.0, 0.0),
                      inv: bool = False):
    """Batched 2x3 affine matrices, same convention as the reference's
    ``get_affine_transform`` (lib/transforms.py:197-233)."""
    a, b, tx, ty = get_affine_params(center, scale, rot_deg, output_size,
                                     shift=shift, inv=inv)
    row0 = jnp.stack([a, -b, tx], axis=-1)
    row1 = jnp.stack([b, a, ty], axis=-1)
    return jnp.stack([row0, row1], axis=-2)  # (..., 2, 3)


def apply_affine(points, mat):
    """Apply (..., 2, 3) affine matrices to (..., P, 2) points.

    Expressed elementwise (VPU) rather than as a matmul: on TPU, f32 matmuls
    default to reduced MXU precision, which costs ~0.3 px on inverse crop
    transforms; the elementwise form keeps full f32.
    """
    points = jnp.asarray(points, jnp.float32)
    x, y = points[..., 0], points[..., 1]
    m = mat[..., None, :, :]                   # broadcast over points
    out_x = m[..., 0, 0] * x + m[..., 0, 1] * y + m[..., 0, 2]
    out_y = m[..., 1, 0] * x + m[..., 1, 1] * y + m[..., 1, 2]
    return jnp.stack([out_x, out_y], axis=-1)


def transform_preds(coords, center, scale, output_size):
    """Map heatmap-space coordinates back to source-image pixels.

    Batched equivalent of the reference's ``transform_preds``
    (lib/transforms.py:184-194): builds the inverse crop transform from
    (center, scale) and applies it to each predicted keypoint.

    Args:
      coords: (..., P, 2) coordinates in heatmap space.
      center: (..., 2); scale: (..., 2); output_size: static (w, h) of the
        coordinate space (e.g. heatmap 48x64).
    """
    mat = get_affine_matrix(center, scale, 0.0, output_size, inv=True)
    return apply_affine(coords, mat)


def get_affine_matrix_np(center, scale, rot_deg, output_size,
                         shift=(0.0, 0.0), inv: bool = False) -> np.ndarray:
    """Host-numpy mirror of :func:`get_affine_matrix` for per-sample host
    pipelines (cv2.warpAffine consumption). Single sample, float64."""
    center = np.asarray(center, np.float64)
    scale = np.asarray(scale, np.float64)
    shift = np.asarray(shift, np.float64)
    rot_rad = float(rot_deg) * np.pi / 180.0
    dst_w, dst_h = float(output_size[0]), float(output_size[1])
    src_w = scale[0] * PIXEL_STD
    scale_tmp = scale * PIXEL_STD
    src_cx = center[0] + scale_tmp[0] * shift[0]
    src_cy = center[1] + scale_tmp[1] * shift[1]
    cs, sn = np.cos(rot_rad), np.sin(rot_rad)
    if not inv:
        lam = dst_w / src_w
        a, b = lam * cs, -lam * sn
        tx = dst_w * 0.5 - (a * src_cx - b * src_cy)
        ty = dst_h * 0.5 - (b * src_cx + a * src_cy)
    else:
        lam = src_w / dst_w
        a, b = lam * cs, lam * sn
        tx = src_cx - (a * dst_w * 0.5 - b * dst_h * 0.5)
        ty = src_cy - (b * dst_w * 0.5 + a * dst_h * 0.5)
    return np.array([[a, -b, tx], [b, a, ty]], np.float64)


def coords_to_center_scale(boxes, aspect_ratio, padding: float = 1.25,
                           pixel_std: float = PIXEL_STD):
    """Convert (..., 4) xyxy boxes to the (center, scale) crop convention.

    Batched equivalent of ``TransformDetection._coords2cs``
    (lib/transforms.py:62-82): the box is inflated to the target aspect ratio
    and padded by 1.25x; scale is expressed in pixel-std units.
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    w, h = x2 - x1, y2 - y1
    cx, cy = x1 + 0.5 * w, y1 + 0.5 * h
    # grow the smaller side to match the aspect ratio
    h = jnp.where(w > aspect_ratio * h, w / aspect_ratio, h)
    w = jnp.maximum(w, h * aspect_ratio)
    scale = jnp.stack([w, h], axis=-1) / pixel_std * padding
    center = jnp.stack([cx, cy], axis=-1)
    return center, scale


def bbox_xywh_to_center_scale(boxes, aspect_ratio, padding: float = 1.25,
                              pixel_std: float = PIXEL_STD):
    """COCO xywh box -> (center, scale), matching ``HRNetCoco._xywh2cs``
    (data/HRNet_Coco.py:233-248): center at box middle, aspect fixup,
    1.25x padding."""
    boxes = jnp.asarray(boxes, jnp.float32)
    x, y, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    cx = x + w * 0.5
    cy = y + h * 0.5
    h = jnp.where(w > aspect_ratio * h, w / aspect_ratio, h)
    w = jnp.maximum(w, h * aspect_ratio)
    scale = jnp.stack([w, h], axis=-1) / pixel_std * padding
    center = jnp.stack([cx, cy], axis=-1)
    return center, scale

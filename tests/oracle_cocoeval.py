"""Loop-form golden oracle for the COCO evaluation protocol.

Independent reimplementation of the pycocotools COCOeval semantics the
reference depends on (lib/detection_coco_eval.py:241-348, lib/metrics.py:
156-189): per-image greedy matching at 10 thresholds, ignore-sorted GTs,
crowd re-matching, area-range ignores, 101-point interpolated AP. Written
deliberately in the slowest, most literal loop form so it shares no
vectorization structure with stlpose_tpu/eval/cocoeval.py — a genuine
differential partner (tests/test_cocoeval_differential.py fuzzes the two
against each other; pycocotools itself is not installed in this image).

Test-only oracle per the repo convention (tests/oracle.py); never imported
by package code.
"""

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
OKS_SIGMAS = np.array([
    0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
    0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089])


def _bbox_iou(d, g, crowd):
    dx1, dy1, dw, dh = d
    gx1, gy1, gw, gh = g
    ix = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
    iy = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
    if ix <= 0 or iy <= 0:
        return 0.0
    inter = ix * iy
    union = dw * dh if crowd else dw * dh + gw * gh - inter
    return inter / union if union > 0 else 0.0


def _oks(dt_kp, gt, sigmas):
    """OKS of one detection against one GT annotation dict."""
    k = np.asarray(gt["keypoints"], np.float64)
    xg, yg, vg = k[0::3], k[1::3], k[2::3]
    d = np.asarray(dt_kp, np.float64)
    xd, yd = d[0::3], d[1::3]
    var = (sigmas * 2.0) ** 2
    k1 = int((vg > 0).sum())
    if k1 > 0:
        dx = xd - xg
        dy = yd - yg
    else:
        bb = gt["bbox"]
        x0, x1 = bb[0] - bb[2], bb[0] + 2 * bb[2]
        y0, y1 = bb[1] - bb[3], bb[1] + 2 * bb[3]
        dx = np.maximum(x0 - xd, 0) + np.maximum(xd - x1, 0)
        dy = np.maximum(y0 - yd, 0) + np.maximum(yd - y1, 0)
    e = (dx ** 2 + dy ** 2) / var / (gt["area"] + np.spacing(1)) / 2.0
    if k1 > 0:
        e = e[vg > 0]
    return float(np.exp(-e).sum() / e.shape[0])


def _params(iou_type):
    if iou_type == "keypoints":
        return ([20], [[0, 1e10], [32 ** 2, 96 ** 2], [96 ** 2, 1e10]])
    return ([1, 10, 100],
            [[0, 1e10], [0, 32 ** 2], [32 ** 2, 96 ** 2], [96 ** 2, 1e10]])


def _evaluate_img(gts, dts, ious, a_rng, thrs):
    """Greedy matching of one (image, category) cell under one area range.

    Follows the published algorithm: detections in score order each take
    the best still-available GT above threshold; ignored GTs only match
    when no matchable GT qualifies; crowds can be matched repeatedly.
    """
    T, G, D = len(thrs), len(gts), len(dts)
    gt_ig = [
        1 if (g["_ignore"] or g["area"] < a_rng[0] or g["area"] > a_rng[1])
        else 0 for g in gts]
    order_g = sorted(range(G), key=lambda i: gt_ig[i])  # stable
    gt_ig = [gt_ig[i] for i in order_g]
    crowd = [int(gts[i].get("iscrowd", 0)) for i in order_g]

    gtm = [[0] * G for _ in range(T)]
    dtm = [[0] * D for _ in range(T)]
    dt_ig = [[0] * D for _ in range(T)]
    for t in range(T):
        thr = min(thrs[t], 1 - 1e-10)
        for di in range(D):
            best, m = thr, -1
            for gi in range(G):
                if gtm[t][gi] > 0 and not crowd[gi]:
                    continue
                if m > -1 and gt_ig[m] == 0 and gt_ig[gi] == 1:
                    break
                if ious[di][order_g[gi]] < best:
                    continue
                best = ious[di][order_g[gi]]
                m = gi
            if m == -1:
                continue
            dt_ig[t][di] = gt_ig[m]
            dtm[t][di] = gts[order_g[m]]["id"]
            gtm[t][m] = dts[di]["id"]
    for t in range(T):
        for di in range(D):
            out = dts[di]["area"] < a_rng[0] or dts[di]["area"] > a_rng[1]
            if dtm[t][di] == 0 and out:
                dt_ig[t][di] = 1
    return {"scores": [d["score"] for d in dts], "dtm": dtm,
            "dt_ig": dt_ig, "npig": sum(1 for i in gt_ig if i == 0)}


def evaluate_oracle(gt_anns, dt_anns, img_ids, cat_ids, iou_type="bbox"):
    """Full protocol over raw annotation dict lists -> stats vector
    (12 for bbox, 10 for keypoints)."""
    max_dets, area_rngs = _params(iou_type)
    sigmas = OKS_SIGMAS

    gts, dts = {}, {}
    for g in gt_anns:
        ig = g.get("ignore", 0) or g.get("iscrowd", 0)
        if iou_type == "keypoints":
            ig = ig or g.get("num_keypoints", 0) == 0
        g = dict(g)
        g["_ignore"] = int(bool(ig))
        gts.setdefault((g["image_id"], g["category_id"]), []).append(g)
    for d in dt_anns:
        dts.setdefault((d["image_id"], d["category_id"]), []).append(d)

    cells = {}
    for c in cat_ids:
        for im in img_ids:
            gt = gts.get((im, c), [])
            dt = sorted(dts.get((im, c), []),
                        key=lambda x: -x["score"])[:max_dets[-1]]
            if not gt and not dt:
                continue
            if iou_type == "keypoints":
                ious = [[_oks(d["keypoints"], g, sigmas) for g in gt]
                        for d in dt]
            else:
                ious = [[_bbox_iou(d["bbox"], g["bbox"],
                                   g.get("iscrowd", 0)) for g in gt]
                        for d in dt]
            for a, a_rng in enumerate(area_rngs):
                cells[(im, c, a)] = _evaluate_img(gt, dt, ious, a_rng,
                                                  IOU_THRS)

    T, R = len(IOU_THRS), len(REC_THRS)
    K, A, M = len(cat_ids), len(area_rngs), len(max_dets)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for k, c in enumerate(cat_ids):
        for a in range(A):
            es = [cells[(im, c, a)] for im in img_ids
                  if (im, c, a) in cells]
            if not es:
                continue
            for m, md in enumerate(max_dets):
                scores, dtm_cols, dtig_cols = [], [], []
                npig = 0
                for e in es:
                    npig += e["npig"]
                    scores.extend(e["scores"][:md])
                    for di in range(min(len(e["scores"]), md)):
                        dtm_cols.append([e["dtm"][t][di] for t in range(T)])
                        dtig_cols.append([e["dt_ig"][t][di]
                                          for t in range(T)])
                if npig == 0:
                    continue
                order = np.argsort(-np.asarray(scores, np.float64),
                                   kind="mergesort")
                for t in range(T):
                    tp = fp = 0
                    tps, fps = [], []
                    for i in order:
                        if dtm_cols[i][t] > 0 and not dtig_cols[i][t]:
                            tp += 1
                        elif dtm_cols[i][t] == 0 and not dtig_cols[i][t]:
                            fp += 1
                        tps.append(tp)
                        fps.append(fp)
                    nd = len(tps)
                    rc = [x / npig for x in tps]
                    pr = [tps[i] / (tps[i] + fps[i] + np.spacing(1))
                          for i in range(nd)]
                    recall[t, k, a, m] = rc[-1] if nd else 0.0
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    q = np.zeros(R)
                    inds = np.searchsorted(rc, REC_THRS, side="left")
                    for ri, pi in enumerate(inds):
                        if pi < nd:
                            q[ri] = pr[pi]
                    precision[:, :, k, a, m][t] = q

    def _mean(arr):
        v = arr[arr > -1]
        return -1.0 if v.size == 0 else float(v.mean())

    def ap(iou=None, area="all", md=max_dets[-1]):
        labels = (["all", "medium", "large"] if iou_type == "keypoints"
                  else ["all", "small", "medium", "large"])
        a = labels.index(area)
        m = max_dets.index(md)
        s = precision[:, :, :, a, m]
        if iou is not None:
            s = s[np.isclose(IOU_THRS, iou)]
        return _mean(s)

    def ar(iou=None, area="all", md=max_dets[-1]):
        labels = (["all", "medium", "large"] if iou_type == "keypoints"
                  else ["all", "small", "medium", "large"])
        a = labels.index(area)
        m = max_dets.index(md)
        s = recall[:, :, a, m]
        if iou is not None:
            s = s[np.isclose(IOU_THRS, iou)]
        return _mean(s)

    if iou_type == "keypoints":
        md = max_dets[0]
        return np.array([
            ap(md=md), ap(iou=0.5, md=md), ap(iou=0.75, md=md),
            ap(area="medium", md=md), ap(area="large", md=md),
            ar(md=md), ar(iou=0.5, md=md), ar(iou=0.75, md=md),
            ar(area="medium", md=md), ar(area="large", md=md)])
    return np.array([
        ap(), ap(iou=0.5), ap(iou=0.75),
        ap(area="small"), ap(area="medium"), ap(area="large"),
        ar(md=max_dets[0]), ar(md=max_dets[1]), ar(md=max_dets[2]),
        ar(area="small"), ar(area="medium"), ar(area="large")])

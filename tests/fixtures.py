"""Synthetic COCO-style dataset fixtures for pipeline/engine tests."""

import json
import os

import numpy as np


def make_coco_dataset(root, n_train=6, n_val=4, people_per_img=2, seed=0,
                      img_hw=(240, 320)):
    """Write a miniature COCO-layout dataset under `root`:
    original_images/{train2017,val2017}/*.jpg + annotations/*.json.
    Returns (train_json, val_json)."""
    import cv2

    rng = np.random.RandomState(seed)
    H, W = img_hw
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    out = []
    for split, n_imgs in (("train", n_train), ("val", n_val)):
        img_dir = os.path.join(root, "original_images", f"{split}2017")
        os.makedirs(img_dir, exist_ok=True)
        images, anns = [], []
        aid = 1
        for i in range(1, n_imgs + 1):
            img_id = i if split == "train" else 1000 + i
            img = rng.randint(0, 255, (H, W, 3), np.uint8)
            cv2.imwrite(os.path.join(img_dir, "%012d.jpg" % img_id), img)
            images.append({"id": img_id, "height": H, "width": W,
                           "file_name": "%012d.jpg" % img_id})
            for _ in range(people_per_img):
                x = float(rng.uniform(10, W - 120))
                y = float(rng.uniform(10, H - 140))
                w, h = float(rng.uniform(60, 100)), float(rng.uniform(90, 130))
                kp = []
                nkp = 0
                for k in range(17):
                    vis = int(rng.rand() > 0.2) * 2
                    nkp += vis > 0
                    kp += [float(x + rng.uniform(0, w)),
                           float(y + rng.uniform(0, h)), vis]
                anns.append({"id": aid, "image_id": img_id, "category_id": 1,
                             "bbox": [x, y, w, h], "area": w * h,
                             "iscrowd": 0, "keypoints": kp,
                             "num_keypoints": int(nkp)})
                aid += 1
        path = os.path.join(root, "annotations",
                            f"person_keypoints_{split}.json")
        with open(path, "w") as f:
            json.dump({"images": images, "annotations": anns,
                       "categories": [{"id": 1, "name": "person",
                                       "keypoints": ["k%d" % i
                                                     for i in range(17)],
                                       "skeleton": []}]}, f)
        out.append(path)
    return out


def make_archdata_dataset(root, n_imgs=5, seed=1, img_hw=(240, 320)):
    """Write a miniature ClassArch-layout dataset: pose annotations with
    archdata_kpts + character_name, detection annotations with string
    bboxes."""
    import cv2

    rng = np.random.RandomState(seed)
    H, W = img_hw
    pose_dir = os.path.join(root, "class_arch_poses", "characters")
    det_dir = os.path.join(root, "class_arch_data")
    ann_dir = os.path.join(root, "annotations_arch_data")
    for d in (pose_dir, det_dir, ann_dir):
        os.makedirs(d, exist_ok=True)

    images, pose_anns, det_anns = [], [], []
    characters = ["Heracles", "satyr", "maenad"]
    for i in range(1, n_imgs + 1):
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        name = f"arch_{i:04d}.jpg"
        cv2.imwrite(os.path.join(pose_dir, name), img)
        cv2.imwrite(os.path.join(det_dir, name), img)
        images.append({"id": i, "height": H, "width": W, "file_name": name,
                       "full_name": f"vase_{i:04d}.jpg"})
        x, y = rng.uniform(10, 100, 2)
        w, h = rng.uniform(80, 150, 2)
        kp, arch_kp = [], []
        for k in range(17):
            kp += [float(x + rng.uniform(0, w)), float(y + rng.uniform(0, h)), 2]
        for k in range(18):
            arch_kp += [float(x + rng.uniform(0, w)),
                        float(y + rng.uniform(0, h)), 2]
        pose_anns.append({"id": i, "image_id": i, "category_id": 1,
                          "bbox": [float(x), float(y), float(w), float(h)],
                          "area": float(w * h), "iscrowd": 0,
                          "keypoints": kp, "archdata_kpts": arch_kp,
                          "num_keypoints": 17,
                          "character_name": characters[i % 3]})
        det_anns.append({"id": i, "image_id": i, "category_id": (i % 3) + 1,
                         "bbox": f"{int(x)},{int(y)},{int(x + w)},{int(y + h)}",
                         "area": float(w * h), "iscrowd": 0})

    pose_path = os.path.join(ann_dir, "arch_data_keypoints.json")
    with open(pose_path, "w") as f:
        json.dump({"images": images, "annotations": pose_anns,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    det_path = os.path.join(ann_dir, "all_data.json")
    with open(det_path, "w") as f:
        json.dump({"images": images, "annotations": det_anns,
                   "categories": [{"id": 1, "name": "Heracles"},
                                  {"id": 2, "name": "satyr"},
                                  {"id": 3, "name": "column"}]}, f)
    return pose_path, det_path

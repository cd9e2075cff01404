#!/usr/bin/env python
"""
Precompute the styled-image -> perceptual-loss dictionary.

The reference TRAINS with precomputed perceptual losses read from
``perceptual_loss_dict_alpha_{a}_styles_{s}.json`` and points users at an
``aux_create_offline_perceptual_loss.py`` script that is absent from its
repo (reference: lib/loss.py:154-198). This is that script, TPU-native:
batched VGG16 perceptual loss between each styled image and its original,
computed on device.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stlpose_tpu.config import CONFIG


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--alpha", default="0.5")
    p.add_argument("--styles", default="redblack")
    p.add_argument("--split", default="train", choices=["train", "valid"])
    p.add_argument("--data_path", default=None)
    p.add_argument("--dict_path", default=None)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--vgg_weights", default=None,
                   help=".pth with torchvision vgg16 features weights")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import cv2
    from stlpose_tpu.models.vgg import (VGG16Features, torch_vgg16_to_flax,
                                        make_perceptual_loss_fn)

    data_path = args.data_path or CONFIG["paths"]["data_path"]
    dict_path = args.dict_path or CONFIG["paths"]["dict_path"]
    mapping_file = os.path.join(
        data_path, "mapping_dicts",
        f"{args.split}_dict_style_{args.styles}_alpha_{args.alpha}.json")
    with open(mapping_file) as f:
        mapping = json.load(f)

    styled_root = os.path.join(
        data_path, f"images_style_{args.styles}_alpha_{args.alpha}",
        args.split)
    orig_root = os.path.join(data_path, "original_images",
                             "train2017" if args.split == "train"
                             else "val2017")

    vgg = VGG16Features()
    if args.vgg_weights:
        import torch
        state = {k: v.numpy() for k, v in
                 torch.load(args.vgg_weights, map_location="cpu").items()}
        variables = torch_vgg16_to_flax(state)
    else:
        variables = vgg.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 224, 224, 3)))
        print("WARNING: no --vgg_weights given; using random VGG features")
    loss_fn = make_perceptual_loss_fn(vgg, variables)

    def read(path):
        img = cv2.imread(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (224, 224))
        return img.astype(np.float32) / 255.0

    items = sorted(mapping.items())
    out = {}
    for start in range(0, len(items), args.batch_size):
        chunk = items[start:start + args.batch_size]
        styled, orig, names = [], [], []
        for img_id, styled_name in chunk:
            sp = os.path.join(styled_root, styled_name)
            op = os.path.join(orig_root, f"{img_id}.jpg")
            if not (os.path.exists(sp) and os.path.exists(op)):
                continue
            styled.append(read(sp))
            orig.append(read(op))
            names.append(styled_name)
        if not names:
            continue
        losses = np.asarray(loss_fn(jnp.asarray(np.stack(styled)),
                                    jnp.asarray(np.stack(orig))))
        for name, l in zip(names, losses):
            out[name] = float(l)
        print(f"{len(out)}/{len(items)} scored", end="\r")

    os.makedirs(dict_path, exist_ok=True)
    out_path = os.path.join(
        dict_path,
        f"perceptual_loss_dict_alpha_{args.alpha}_styles_{args.styles}.json")
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"\nWrote {len(out)} perceptual losses to {out_path}")


if __name__ == "__main__":
    main()

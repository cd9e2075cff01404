#!/usr/bin/env python
"""
Generate Styled-COCO: stylize COCO images with the inline AdaIN stylizer and
write the name-mapping dicts the datasets consume.

The reference expects pre-generated ``images_style_{s}_alpha_{a}``
directories plus ``{split}_dict_style_{s}_alpha_{a}.json`` mapping dicts and
refers to an out-of-repo 'aux_styled_coco_preload' script
(reference: data/HRNet_Coco.py:250-281, data/data_loaders.py:84-100). This
is that script, TPU-native: the stylization runs as a batched AdaIN
encoder/decoder XLA stage (stlpose_tpu/models/adain.py) over style exemplars
from a directory (e.g. red/black-figure vase crops).
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
    p.add_argument("--style_dir", required=True,
                   help="directory of style exemplar images")
    p.add_argument("--alpha", default="0.5")
    p.add_argument("--styles", default="redblack",
                   help="style-set name used in directory/dict names")
    p.add_argument("--split", default="train", choices=["train", "valid"])
    p.add_argument("--data_path", default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--size", type=int, default=512,
                   help="stylization canvas (long side)")
    p.add_argument("--decoder_ckpt", default=None,
                   help="npz with trained AdaIN decoder params")
    p.add_argument("--vgg_weights", default=None)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()

    import cv2
    import jax.numpy as jnp
    from stlpose_tpu.models.adain import AdaINStylizer
    from stlpose_tpu.models.vgg import torch_vgg16_to_flax

    data_path = args.data_path or CONFIG["paths"]["data_path"]
    orig_root = os.path.join(data_path, "original_images",
                             "train2017" if args.split == "train"
                             else "val2017")
    out_root = os.path.join(
        data_path, f"images_style_{args.styles}_alpha_{args.alpha}",
        args.split)
    os.makedirs(out_root, exist_ok=True)

    enc_vars = None
    if args.vgg_weights:
        import torch
        state = {k: v.numpy() for k, v in
                 torch.load(args.vgg_weights, map_location="cpu").items()}
        enc_vars = torch_vgg16_to_flax(state, taps=AdaINStylizer.ENC_TAPS)
    dec_vars = None
    if args.decoder_ckpt:
        blob = np.load(args.decoder_ckpt, allow_pickle=True)
        dec_vars = {"params": blob["params"].item()}
    stylizer = AdaINStylizer(enc_variables=enc_vars, dec_variables=dec_vars)

    styles = [f for f in sorted(os.listdir(args.style_dir))
              if f.lower().endswith((".jpg", ".jpeg", ".png"))]
    assert styles, f"no style exemplars in {args.style_dir}"

    def read_square(path, size):
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        return cv2.resize(img, (size, size)).astype(np.float32) / 255.0

    style_bank = np.stack([read_square(os.path.join(args.style_dir, s),
                                       args.size) for s in styles])

    names = sorted(f for f in os.listdir(orig_root) if f.endswith(".jpg"))
    if args.limit:
        names = names[:args.limit]
    rng = np.random.RandomState(CONFIG["random_seed"])
    mapping = {}
    alpha_val = (rng.uniform(0.3, 1.0, len(names))
                 if args.alpha == "random"
                 else np.full(len(names), float(args.alpha)))

    for start in range(0, len(names), args.batch_size):
        chunk = names[start:start + args.batch_size]
        imgs, shapes = [], []
        for n in chunk:
            img = cv2.cvtColor(cv2.imread(os.path.join(orig_root, n)),
                               cv2.COLOR_BGR2RGB)
            shapes.append(img.shape[:2])
            imgs.append(cv2.resize(img, (args.size, args.size))
                        .astype(np.float32) / 255.0)
        sidx = rng.randint(0, len(style_bank), len(chunk))
        out = stylizer(jnp.asarray(np.stack(imgs)),
                       jnp.asarray(style_bank[sidx]),
                       alpha=jnp.asarray(alpha_val[start:start + len(chunk)]))
        out = np.asarray(out)
        for i, n in enumerate(chunk):
            stem = os.path.splitext(n)[0]
            a = alpha_val[start + i]
            styled_name = (f"{stem}_alpha_{a:.2f}.jpg"
                           if args.alpha == "random" else f"{stem}.jpg")
            h, w = shapes[i]
            img = cv2.resize(out[i], (w, h))
            cv2.imwrite(os.path.join(out_root, styled_name),
                        cv2.cvtColor((img * 255).astype(np.uint8),
                                     cv2.COLOR_RGB2BGR))
            mapping[stem] = styled_name
        print(f"{min(start + len(chunk), len(names))}/{len(names)} stylized",
              end="\r")

    dict_dir = os.path.join(data_path, "mapping_dicts")
    os.makedirs(dict_dir, exist_ok=True)
    dict_path = os.path.join(
        dict_dir,
        f"{args.split}_dict_style_{args.styles}_alpha_{args.alpha}.json")
    with open(dict_path, "w") as f:
        json.dump(mapping, f)
    print(f"\nWrote {len(mapping)} mappings to {dict_path}")


if __name__ == "__main__":
    main()

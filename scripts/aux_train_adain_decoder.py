#!/usr/bin/env python
"""
Train the AdaIN decoder over a content/style image directory pair.

Closes the inline-stylizer loop (BASELINE config #4): the reference
consumes styled-COCO images generated OFFLINE by an out-of-repo pipeline
(reference: data/data_loaders.py:84-100); here the stylizer runs inline
(stlpose_tpu/models/adain.py, data/pipeline.py inline hook,
scripts/aux_styled_coco_preload.py), and this script produces the trained
decoder those consumers load (``--decoder_ckpt`` npz with a ``params``
entry).

Typical use:
    python scripts/aux_train_adain_decoder.py \
        --content_dir <coco>/train2017 --style_dir <vase crops> \
        --steps 20000 --out decoder_adain.npz \
        [--vgg_weights vgg16-torchvision.pth]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def list_images(d):
    return [os.path.join(d, f) for f in sorted(os.listdir(d))
            if f.lower().endswith((".jpg", ".jpeg", ".png"))]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--content_dir", required=True)
    p.add_argument("--style_dir", required=True)
    p.add_argument("--out", required=True, help="output npz path")
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--size", type=int, default=256,
                   help="training crop size (square)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--style_weight", type=float, default=10.0)
    p.add_argument("--recon_weight", type=float, default=1.0)
    p.add_argument("--vgg_weights", default=None,
                   help="torchvision vgg16 .pth for the frozen encoder")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=100)
    args = p.parse_args()

    import cv2
    import jax
    from stlpose_tpu.models.adain import AdaINStylizer, train_adain_decoder
    from stlpose_tpu.models.vgg import torch_vgg16_to_flax
    from stlpose_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    enc_vars = None
    if args.vgg_weights:
        import torch
        state = {k: v.numpy() for k, v in
                 torch.load(args.vgg_weights, map_location="cpu").items()}
        enc_vars = torch_vgg16_to_flax(state, taps=AdaINStylizer.ENC_TAPS)
    stylizer = AdaINStylizer(enc_variables=enc_vars,
                             rng=jax.random.PRNGKey(args.seed))

    content_files = list_images(args.content_dir)
    style_files = list_images(args.style_dir)
    assert content_files, f"no content images in {args.content_dir}"
    assert style_files, f"no style images in {args.style_dir}"
    rng = np.random.RandomState(args.seed)
    S = args.size

    def read_crop(path):
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        scale = max(S / h, S / w)
        img = cv2.resize(img, (max(S, int(round(w * scale))),
                               max(S, int(round(h * scale)))))
        y = rng.randint(0, img.shape[0] - S + 1)
        x = rng.randint(0, img.shape[1] - S + 1)
        return img[y:y + S, x:x + S].astype(np.float32) / 255.0

    def batches():
        for step in range(args.steps):
            content = np.stack([read_crop(content_files[i]) for i in
                                rng.randint(0, len(content_files),
                                            args.batch_size)])
            style = np.stack([read_crop(style_files[i]) for i in
                              rng.randint(0, len(style_files),
                                          args.batch_size)])
            yield content, style

    recent = []

    def log(step, loss):
        recent.append(loss)
        if step % args.log_every == 0:
            print(f"step {step}/{args.steps} loss {np.mean(recent):.4f}",
                  flush=True)
            recent.clear()

    dec_params, hist = train_adain_decoder(
        stylizer.encoder, stylizer.enc_variables, stylizer.decoder,
        stylizer.dec_variables["params"], batches(),
        lr=args.lr, style_weight=args.style_weight,
        recon_weight=args.recon_weight, callback=log)

    out = {"params": np.asarray(
        jax.tree_util.tree_map(np.asarray, dec_params), dtype=object)}
    np.savez(args.out, **out)
    print(f"saved decoder to {args.out} "
          f"(final loss {hist[-1]:.4f}, {len(hist)} steps)")


if __name__ == "__main__":
    main()

"""Offline batch face alignment (reference lfw/gen_lfw112x96.py, on device).

Reads `lfw_landmark.txt` (tab-separated `person/img.jpg` + 10 ints,
gen_lfw112x96.py:22-26), aligns every image to the canonical ArcFace
5-point frame, and writes the crops — but batched on TPU (cp2tform solve +
MXU warp over hundreds of faces per step) instead of one cv2 call per
image.

    python -m ffrnet_tpu.tools.align_dataset \
        --src_root LFW/images --landmarks LFW/lfw_landmark.txt \
        --save_root out/lfw112x96 [--out_h 112 --out_w 96] [--batch 256]
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Iterator, List, Tuple

import numpy as np


def read_landmarks(path: str) -> Dict[str, List[int]]:
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 11:
                out[parts[0]] = [int(x) for x in parts[1:11]]
    return out


def _batches(items: List[Tuple[str, List[int]]], batch: int):
    for i in range(0, len(items), batch):
        yield items[i:i + batch]


def align_tree(src_root: str, landmarks_txt: str, save_root: str, *,
               out_hw=(112, 96), batch: int = 256, impl: str = "mxu") -> int:
    import jax.numpy as jnp
    from PIL import Image

    from ffrnet_tpu.ops.align import align_faces

    landmarks = read_landmarks(landmarks_txt)
    items = []
    for person in sorted(os.listdir(src_root)):
        pdir = os.path.join(src_root, person)
        if not os.path.isdir(pdir):
            continue
        for img_name in sorted(os.listdir(pdir)):
            key = f"{person}/{img_name}"
            if key in landmarks:
                items.append((key, landmarks[key]))

    n_done = 0
    for chunk in _batches(items, batch):
        imgs, pts, sizes = [], [], []
        max_h = max_w = 0
        for key, lm in chunk:
            arr = np.asarray(Image.open(os.path.join(src_root, key))
                             .convert("RGB"), dtype=np.float32)
            imgs.append(arr)
            sizes.append(arr.shape[:2])
            max_h = max(max_h, arr.shape[0])
            max_w = max(max_w, arr.shape[1])
            pts.append(np.asarray(lm, np.float32).reshape(5, 2))
        # pad to a common canvas (zero pixels = warp border)
        canvas = np.zeros((len(imgs), max_h, max_w, 3), np.float32)
        for i, arr in enumerate(imgs):
            canvas[i, :arr.shape[0], :arr.shape[1]] = arr
        aligned = align_faces(jnp.asarray(canvas), jnp.asarray(np.stack(pts)),
                              out_hw=out_hw, impl=impl)
        aligned = np.asarray(aligned).clip(0, 255).astype(np.uint8)
        for (key, _), crop in zip(chunk, aligned):
            dst = os.path.join(save_root, key)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            Image.fromarray(crop).save(dst)
            n_done += 1
    return n_done


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src_root", required=True)
    p.add_argument("--landmarks", required=True)
    p.add_argument("--save_root", required=True)
    p.add_argument("--out_h", type=int, default=112)
    p.add_argument("--out_w", type=int, default=96)
    p.add_argument("--batch", type=int, default=256)
    args = p.parse_args(argv)
    n = align_tree(args.src_root, args.landmarks, args.save_root,
                   out_hw=(args.out_h, args.out_w), batch=args.batch)
    print(f"aligned {n} faces -> {args.save_root}")


if __name__ == "__main__":
    main()

"""Dataset protocol: CASIA txt-list training pairs and LFW verification pairs.

Replicates the reference data contracts exactly (data/dataset.py):

  * CASIA: `path label` lines from a clean-list txt (data/dataset.py:108-120);
    each sample pairs the image with its synthetically-masked twin found by
    filename-prefix scan in the same directory (get_mask_path,
    data/dataset.py:15-22)
  * LFW: the standard `pairs.txt` protocol — 3 tokens = same person,
    4 tokens = different (data/dataset.py:42-53); test_ocl_num in {0, 1, 2}
    swaps path1 and/or path2 for the masked twin (data/dataset.py:63-66)
  * both: RGB->BGR channel re-merge (data/dataset.py:137-140), bicubic
    resize to 112x112 when needed, PAIRED horizontal flip with p=0.5, then
    ToTensor + Normalize(0.5, 0.5) -> [-1, 1]

Samples come back as NHWC float32 numpy arrays (TPU layout). A synthetic
identity dataset is provided for smoke tests and benchmarking without the
real CASIA/LFW trees.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IMG_SIZE = (112, 112)  # (W, H)


def parse_pairs_txt(pair_txt: str) -> Tuple[List[Tuple[str, str]], List[int]]:
    """Parse the standard LFW pairs protocol (data/dataset.py:36-53)."""
    with open(pair_txt) as f:
        lines = f.readlines()[1:]
    pair_names, labels = [], []
    for line in lines:
        p = line.strip().split()
        if len(p) == 3:
            labels.append(1)
            name1 = f"{p[0]}/{p[0]}_{int(p[1]):04}.jpg"
            name2 = f"{p[0]}/{p[0]}_{int(p[2]):04}.jpg"
        elif len(p) == 4:
            labels.append(0)
            name1 = f"{p[0]}/{p[0]}_{int(p[1]):04}.jpg"
            name2 = f"{p[2]}/{p[2]}_{int(p[3]):04}.jpg"
        else:
            continue
        pair_names.append((name1, name2))
    return pair_names, labels


def find_mask_twin(data_root: str, image_path: str) -> Optional[str]:
    """Locate the masked twin: same directory, same numeric prefix, different
    file (get_mask_path, data/dataset.py:15-22)."""
    folder, img = image_path.strip().split("/")
    num = img.strip().split(".")[0]
    for fname in _listdir_cached(os.path.join(data_root, folder)):
        if fname.startswith(num) and fname != img:
            return os.path.join(folder, fname)
    return None


@lru_cache(maxsize=65536)
def _listdir_cached(path: str) -> Tuple[str, ...]:
    return tuple(os.listdir(path))


def _load_bgr(path: str) -> np.ndarray:
    """Decode -> RGB -> BGR re-merge -> bicubic resize to 112x112 if needed.

    Returns HWC uint8 (BGR channel order, matching the reference's PIL
    channel re-merge, data/dataset.py:137-140)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if img.size != IMG_SIZE:
        img = img.resize(IMG_SIZE, Image.BICUBIC)
    arr = np.asarray(img, dtype=np.uint8)
    return arr[:, :, ::-1]


def _load_rgb(path: str) -> np.ndarray:
    """Decode -> RGB (no channel re-merge) -> bicubic 112x112 if needed.

    The reference's Mask_Data feeds raw RGB — it never applies the BGR
    split-merge the CASIA/LFW loaders do (data/dataloader_mask_verification
    .py:63-77 has no convert/re-merge) — so the real-mask protocol runs on
    RGB inputs there. Kept for faithful replication."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if img.size != IMG_SIZE:
        img = img.resize(IMG_SIZE, Image.BICUBIC)
    return np.asarray(img, dtype=np.uint8)


def _to_unit(arr_u8: np.ndarray) -> np.ndarray:
    """ToTensor + Normalize([.5]*3, [.5]*3): uint8 -> float32 in [-1, 1]."""
    return (arr_u8.astype(np.float32) / 255.0 - 0.5) / 0.5


def _finish(arr_u8: np.ndarray, host_normalize: bool) -> np.ndarray:
    """host_normalize=True: the reference's float32 [-1,1] sample.
    False: ship the uint8 pixels and let the accelerator normalize
    (ops.nn.images_to_unit_range — same math, 4x fewer upload bytes)."""
    if host_normalize:
        return _to_unit(arr_u8)
    return np.ascontiguousarray(arr_u8)


def _native_ready(use_native) -> bool:
    """Resolve a use_native tri-state ('auto'/True/False) against the
    availability of the C++ host library."""
    if use_native is False:
        return False
    from ffrnet_tpu.data import native

    ok = native.is_available()
    if use_native is True and not ok:
        raise RuntimeError("native host library requested but unavailable")
    return ok


def _load_pair_native(path1: str, path2: str, flip: bool,
                      host_normalize: bool = True):
    """Decode+prep a JPEG pair through the C++ library (BGR, [-1,1] float
    or quantized uint8, paired flip, bicubic resize; PIL-equivalent within
    ~2 pixel LSB on resized inputs, bit-exact on 112x112 inputs)."""
    from ffrnet_tpu.data import native

    with open(path1, "rb") as f:
        b1 = f.read()
    with open(path2, "rb") as f:
        b2 = f.read()
    out = native.decode_prep_batch([b1, b2], IMG_SIZE[::-1], bgr=True,
                                   flips=[flip, flip], strict=True,
                                   out_u8=not host_normalize)
    return out[0], out[1]


@dataclass
class CasiaPairs:
    """CASIA-WebFace paired clean/masked training set (data/dataset.py:91-162).

    data_root: aligned image tree; img_list: `path label` lines.
    """

    data_root: str
    img_list: str
    flip_prob: float = 0.5
    num_classes: int = 10575
    use_native: object = "auto"  # True | False | 'auto' (C++ decode path)
    host_normalize: bool = True  # False = uint8 samples, device normalize

    def __post_init__(self):
        self.items: List[Tuple[str, int]] = []
        with open(self.img_list) as f:
            for line in f:
                if not line.strip():
                    continue
                path, label = line.strip().split()
                if not 0 <= int(label) < self.num_classes:
                    raise ValueError(
                        f"label {label} out of range [0, {self.num_classes})"
                        f" for {path!r} — check --num_classes / the list"
                        " file")
                self.items.append((path, int(label)))
        self._native = _native_ready(self.use_native)
        if self._native and not self.host_normalize:
            # a stale v1 library lacks the uint8 entry points; without this
            # gate every sample would read both JPEGs natively, raise, and
            # silently re-read them through PIL
            from ffrnet_tpu.data import native

            if not native.has_u8():
                import sys

                print("[warn] native library predates uint8 output — "
                      "rebuild native/ (make -C native); using PIL path",
                      file=sys.stderr)
                self._native = False
        self._twin_cache: Dict[str, str] = {}

    def __len__(self):
        return len(self.items)

    def _twin(self, path: str) -> str:
        # resolve once per item: the prefix scan over the directory listing
        # is O(dir size) and identical every epoch
        twin = self._twin_cache.get(path)
        if twin is None:
            twin = find_mask_twin(self.data_root, path)
            if twin is None:
                raise FileNotFoundError(f"no masked twin for {path}")
            self._twin_cache[path] = twin
        return twin

    def get(self, idx: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        path, label = self.items[idx]
        twin = self._twin(path)
        flip = rng.random() < self.flip_prob  # paired flip
        p1 = os.path.join(self.data_root, path)
        p2 = os.path.join(self.data_root, twin)
        if self._native:
            try:
                img_f, mask_f = _load_pair_native(
                    p1, p2, flip, host_normalize=self.host_normalize)
                return {"img_non": img_f, "img_ocl": mask_f,
                        "label": np.int32(label)}
            except RuntimeError:
                # non-JPEG or decode failure -> PIL path. Disable native
                # for this dataset after the first failure: a non-JPEG
                # tree would otherwise read every file TWICE (native
                # attempt + PIL retry) on every sample of every epoch
                # with no warning (round-5 review)
                self._native = False
                import sys

                print(f"[warn] native decode failed for {path!r} — "
                      "falling back to PIL for this dataset (non-JPEG "
                      "files?)", file=sys.stderr)
        img = _load_bgr(p1)
        mask = _load_bgr(p2)
        if flip:
            img = img[:, ::-1]
            mask = mask[:, ::-1]
        return {
            "img_non": _finish(img, self.host_normalize),
            "img_ocl": _finish(mask, self.host_normalize),
            "label": np.int32(label),
        }


@dataclass
class LfwPairs:
    """LFW verification pairs with 0/1/2 masked substitutions
    (data/dataset.py:24-89)."""

    face_root: str
    pairs_list: str
    test_ocl_num: int = 0
    flip_prob: float = 0.5  # the reference flips eval pairs too
    host_normalize: bool = True  # False = uint8 samples, device normalize

    def __post_init__(self):
        self.pair_names, self.labels = parse_pairs_txt(self.pairs_list)

    def __len__(self):
        return len(self.labels)

    def _masked(self, path: str) -> str:
        # fail loudly on a missing twin (the reference crashes here too,
        # data/dataset.py:63-66 joining a None path): silently evaluating
        # the CLEAN image as "masked" would inflate ocl accuracy
        twin = find_mask_twin(self.face_root, path)
        if twin is None:
            raise FileNotFoundError(
                f"no masked twin for {path!r} under {self.face_root!r} "
                f"(ocl={self.test_ocl_num}); generate masks or use ocl=0")
        return twin

    def get(self, idx: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        path1, path2 = self.pair_names[idx]
        if self.test_ocl_num >= 1:
            path1 = self._masked(path1)
        if self.test_ocl_num >= 2:
            path2 = self._masked(path2)
        img1 = _load_bgr(os.path.join(self.face_root, path1))
        img2 = _load_bgr(os.path.join(self.face_root, path2))
        if self.flip_prob and rng.random() < self.flip_prob:
            img1 = img1[:, ::-1]
            img2 = img2[:, ::-1]
        return {
            "img1": _finish(img1, self.host_normalize),
            "img2": _finish(img2, self.host_normalize),
            "label": np.int32(self.labels[idx]),
            "idx": np.int32(idx),
        }


@dataclass
class MaskVerificationPairs:
    """Real-mask verification triples `masked nonmasked label`
    (data/dataloader_mask_verification.py:16-88).

    NOTE the reference feeds these images as raw RGB — unlike its CASIA/LFW
    loaders it never does the BGR channel re-merge, even though the encoder
    was trained on BGR (data/dataloader_mask_verification.py:63-77). That
    quirk is replicated by default; `bgr=True` applies the consistent BGR
    protocol instead (see PARITY.md "Deliberate behavior differences")."""

    face_root: str
    img_dir: str = "masked_whn_112_align_v4"
    pair_txt: str = "masked_pairs_new_v4.txt"
    flip_prob: float = 0.5
    bgr: bool = False  # False = faithful reference RGB behavior
    host_normalize: bool = True  # False = uint8 samples, device normalize

    def __post_init__(self):
        self.pair_names: List[Tuple[str, str]] = []
        self.labels: List[int] = []
        with open(os.path.join(self.face_root, self.pair_txt)) as f:
            for line in f:
                p = line.strip().split()
                if len(p) < 3:
                    continue
                self.pair_names.append((p[0], p[1]))
                self.labels.append(int(p[2]))

    def __len__(self):
        return len(self.labels)

    def get(self, idx: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        base = os.path.join(self.face_root, self.img_dir)
        load = _load_bgr if self.bgr else _load_rgb
        img1 = load(os.path.join(base, self.pair_names[idx][0]))
        img2 = load(os.path.join(base, self.pair_names[idx][1]))
        if self.flip_prob and rng.random() < self.flip_prob:
            img1 = img1[:, ::-1]
            img2 = img2[:, ::-1]
        return {
            "img1": _finish(img1, self.host_normalize),
            "img2": _finish(img2, self.host_normalize),
            "label": np.int32(self.labels[idx]),
            "idx": np.int32(idx),
        }


def gen_occlusion_mask(rng: np.random.Generator, img_hw: Tuple[int, int],
                       mask_hw: Tuple[int, int]) -> np.ndarray:
    """Random rectangular occlusion mask (1 = keep, 0 = occluded).

    Rebuild of the reference's gen_occlusion_mask (lfw/lfw_eval.py:66-72)
    with its bugs fixed: the reference indexes with swapped extents and
    references an undefined MASK_SIZE global (lfw/lfw_eval.py:95); here the
    rectangle is mask_hw = (mh, mw) placed uniformly inside img_hw.
    """
    h, w = img_hw
    mh, mw = mask_hw
    mask = np.ones((h, w, 1), np.float32)
    # +1: integers() is high-exclusive — without it the mask could never
    # sit flush to the bottom/right edge (round-5 review)
    y = int(rng.integers(0, max(h - mh + 1, 1)))
    x = int(rng.integers(0, max(w - mw + 1, 1)))
    mask[y:y + mh, x:x + mw] = 0.0
    return mask


@dataclass
class SyntheticPairs:
    """Procedural identity dataset for smoke tests / benches: each identity
    is a fixed random template; the 'masked' twin zeroes the lower half
    (a crude surgical-mask stand-in)."""

    num_identities: int = 16
    samples_per_id: int = 4
    seed: int = 0
    host_normalize: bool = True  # False = quantized uint8 samples
    noise: float = 0.05  # per-sample noise std; raise to delay TrainAcc
    # saturation (convergence A/Bs need a regime where 60 steps can't
    # reach 1.0, VERDICT r3 weak #3)

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        self.templates = rng.uniform(
            -1, 1, (self.num_identities, 112, 112, 3)).astype(np.float32)

    def __len__(self):
        return self.num_identities * self.samples_per_id

    def get(self, idx: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        label = idx % self.num_identities
        img = self.templates[label] + self.noise * rng.standard_normal(
            (112, 112, 3)).astype(np.float32)
        mask = img.copy()
        mask[60:100, 20:92] = -1.0
        if not self.host_normalize:
            def q(x):  # quantize to the uint8 pixel grid (bench/driver path)
                return np.clip((x * 0.5 + 0.5) * 255.0, 0, 255).round() \
                    .astype(np.uint8)
            img, mask = q(img), q(mask)
        return {"img_non": img, "img_ocl": mask, "label": np.int32(label)}

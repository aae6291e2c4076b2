"""Host-side joint image+label augmentation pipeline (numpy + cv2).

Behavioural equivalent of the reference transform stack
(InvPT/data/transforms.py:9-417, identical in TaskPrompter apart from the
depth ignore value): label-aware scaling with per-key interpolation and
depth 1/scale correction, semseg-rebalanced random crop, horizontal flip
with normals-x negation, uint8 HSV photometric distortion, ImageNet
normalisation, centre padding with per-task fill values, and ignore-region
injection.

Re-designed as *functional* transforms over a sample dict with an explicit
``np.random.Generator`` — reproducible per-sample augmentation that can be
sharded across data-loading threads, feeding fixed-shape NHWC device
batches (no torch, no implicit global RNG).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import cv2
import numpy as np

INTERP = {
    "nearest": cv2.INTER_NEAREST,
    "linear": cv2.INTER_LINEAR,
    "cubic": cv2.INTER_CUBIC,
}

# per-key resize mode during random scaling (transforms.py:22-30)
SCALE_MODE = {
    "semseg": cv2.INTER_NEAREST, "depth": cv2.INTER_NEAREST,
    "normals": cv2.INTER_NEAREST, "edge": cv2.INTER_NEAREST,
    "sal": cv2.INTER_NEAREST, "human_parts": cv2.INTER_NEAREST,
    "image": cv2.INTER_LINEAR,
}

PAD_FILL = {"edge": 255, "human_parts": 255, "semseg": 255, "depth": 0,
            "normals": 0, "sal": 255, "image": 0}

_SKIP = ("meta",)


def _is_map_key(k: str) -> bool:
    # det_* entries are padded box arrays, not spatial maps
    return k not in _SKIP and not k.startswith("det_")


def _label_keys(sample):
    return [k for k in sample if _is_map_key(k)]


def _ensure_3d(arr):
    return arr[..., None] if arr.ndim == 2 else arr


def random_scaling(sample: Dict, rng: np.random.Generator,
                   scale_factors=(0.5, 2.0)) -> Dict:
    """Uniform random rescale; depth values divided by the scale
    (transforms.py:61-64)."""
    s = float(rng.uniform(*scale_factors))
    if s == 1.0:
        return sample
    for key in _label_keys(sample):
        arr = np.squeeze(sample[key])
        h, w = arr.shape[:2]
        new = cv2.resize(arr, (int(w * s), int(h * s)),
                         interpolation=SCALE_MODE[key])
        new = _ensure_3d(new)
        if key == "depth":
            new = new / s
        sample[key] = new
    return sample


def random_crop(sample: Dict, rng: np.random.Generator,
                size: Tuple[int, int], cat_max_ratio: float = 1.0) -> Dict:
    """Random crop; when cat_max_ratio < 1, resample the location up to 10x
    until no semseg class dominates (transforms.py:195-211)."""
    img = sample["image"]
    h, w = img.shape[:2]
    ch, cw = size

    def _loc():
        if h == ch and w == cw:
            return None
        oh = int(rng.integers(0, max(h - ch, 0) + 1))
        ow = int(rng.integers(0, max(w - cw, 0) + 1))
        return (oh, oh + ch, ow, ow + cw)

    loc = _loc()
    if cat_max_ratio < 1.0 and "semseg" in sample:
        for _ in range(10):
            seg = sample["semseg"] if loc is None else \
                sample["semseg"][loc[0]:loc[1], loc[2]:loc[3]]
            labels, cnt = np.unique(seg, return_counts=True)
            cnt = cnt[labels != 255]
            if len(cnt) > 1 and cnt.max() / cnt.sum() < cat_max_ratio:
                break
            loc = _loc()
    if loc is not None:
        for key in _label_keys(sample):
            sample[key] = sample[key][loc[0]:loc[1], loc[2]:loc[3], :]
    return sample


def random_hflip(sample: Dict, rng: np.random.Generator, p: float = 0.5) -> Dict:
    """Horizontal flip; negates the normals x-component (transforms.py:230)."""
    if rng.random() < p:
        for key in _label_keys(sample):
            arr = np.ascontiguousarray(np.fliplr(sample[key]))
            if key == "normals":
                arr[:, :, 0] *= -1
            sample[key] = arr
    return sample


def photometric_distortion(sample: Dict, rng: np.random.Generator,
                           brightness_delta: int = 32,
                           contrast_range=(0.5, 1.5),
                           saturation_range=(0.5, 1.5),
                           hue_delta: int = 18) -> Dict:
    """uint8 brightness/contrast/HSV jitter (transforms.py:305-407). The
    uint8 round-trips are kept deliberately — they shape the published
    metrics (SURVEY.md §7 hard-part 5)."""
    img = sample["image"].astype(np.uint8)

    def conv(im, alpha=1.0, beta=0.0):
        return np.clip(im.astype(np.float32) * alpha + beta, 0, 255).astype(np.uint8)

    if rng.random() < 0.5:
        img = conv(img, beta=float(rng.uniform(-brightness_delta, brightness_delta)))

    def contrast(im):
        if rng.random() < 0.5:
            return conv(im, alpha=float(rng.uniform(*contrast_range)))
        return im

    f_mode = rng.random() < 0.5
    if f_mode:
        img = contrast(img)
    if rng.random() < 0.5:  # saturation
        hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
        hsv[:, :, 1] = conv(hsv[:, :, 1], alpha=float(rng.uniform(*saturation_range)))
        img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    if rng.random() < 0.5:  # hue
        hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
        hsv[:, :, 0] = (hsv[:, :, 0].astype(int) +
                        int(rng.integers(-hue_delta, hue_delta))) % 180
        img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    if not f_mode:
        img = contrast(img)

    sample["image"] = img.astype(np.float32)
    return sample


def normalize_image(sample: Dict, mean=(0.485, 0.456, 0.406),
                    std=(0.229, 0.224, 0.225)) -> Dict:
    img = sample["image"].astype(np.float32) / 255.0
    img -= np.asarray(mean, np.float32)
    img /= np.asarray(std, np.float32)
    sample["image"] = img
    return sample


def pad_image(sample: Dict, size: Tuple[int, int]) -> Dict:
    """Centre-pad every key to >= size with per-task fill values
    (transforms.py:79-140)."""
    for key in _label_keys(sample):
        arr = sample[key]
        h, w, c = arr.shape
        dh, dw = max(size[0] - h, 0), max(size[1] - w, 0)
        if dh == 0 and dw == 0:
            continue
        out = np.full((max(size[0], h), max(size[1], w), c),
                      PAD_FILL[key], dtype=np.float32)
        out[dh // 2:dh // 2 + h, dw // 2:dw // 2 + w, :] = arr
        sample[key] = out
    return sample


def add_ignore_regions(sample: Dict, depth_ignore: float = 255.0) -> Dict:
    """Ignore-region injection (transforms.py:279-302): normals with zero
    norm -> 255; human-parts images without annotations -> all 255; depth
    zeros -> ``depth_ignore`` (255 InvPT, -1 TaskPrompter/NYUD)."""
    if "normals" in sample:
        n = sample["normals"]
        norm = np.sqrt((n.astype(np.float32) ** 2).sum(-1))
        n[norm == 0, :] = 255
    if "human_parts" in sample:
        hp = sample["human_parts"]
        if np.all((hp == 0) | (hp == 255)):
            sample["human_parts"] = np.full_like(hp, 255)
    if "depth" in sample:
        d = sample["depth"]
        d[d == 0] = depth_ignore
    return sample


def direct_resize(sample: Dict, size: Tuple[int, int],
                  flagvals: Optional[Dict[str, str]] = None) -> Dict:
    """Deterministic resize to ``size`` with per-key interpolation modes —
    the inference-path transform (InvPT/inference.py:53-64)."""
    for key in _label_keys(sample):
        arr = np.squeeze(sample[key])
        mode = INTERP[(flagvals or {}).get(key, "cubic" if key == "image" else "nearest")]
        arr = cv2.resize(arr, (size[1], size[0]), interpolation=mode)
        sample[key] = _ensure_3d(arr).astype(np.float32)
    return sample


class TrainTransforms:
    """Composed training pipeline (reference get_transformations,
    InvPT/utils/common_config.py:62-80)."""

    def __init__(self, size: Tuple[int, int], depth_ignore: float = 255.0,
                 scale_factors=(0.5, 2.0), cat_max_ratio: float = 0.75):
        self.size = tuple(size)
        self.depth_ignore = depth_ignore
        self.scale_factors = scale_factors
        self.cat_max_ratio = cat_max_ratio

    def __call__(self, sample: Dict, rng: np.random.Generator) -> Dict:
        sample = {k: (_ensure_3d(np.asarray(v, np.float32)) if _is_map_key(k) else v)
                  for k, v in sample.items()}
        sample = random_scaling(sample, rng, self.scale_factors)
        sample = random_crop(sample, rng, self.size, self.cat_max_ratio)
        sample = random_hflip(sample, rng)
        sample = photometric_distortion(sample, rng)
        sample = normalize_image(sample)
        sample = pad_image(sample, self.size)
        sample = add_ignore_regions(sample, self.depth_ignore)
        return sample


class ValTransforms:
    """Composed eval pipeline: Normalize + Pad + AddIgnoreRegions."""

    def __init__(self, size: Tuple[int, int], depth_ignore: float = 255.0):
        self.size = tuple(size)
        self.depth_ignore = depth_ignore

    def __call__(self, sample: Dict, rng=None) -> Dict:
        sample = {k: (_ensure_3d(np.asarray(v, np.float32)) if _is_map_key(k) else v)
                  for k, v in sample.items()}
        sample = normalize_image(sample)
        sample = pad_image(sample, self.size)
        sample = add_ignore_regions(sample, self.depth_ignore)
        return sample

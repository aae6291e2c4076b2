"""Map-style datasets: PASCAL-Context (5-task) and NYUD-v2 (4-task).

Behavioural equivalents of InvPT/data/pascal_context.py:24-444 and
InvPT/data/nyud.py:20-212 — same directory layout, same label semantics:
  PASCAL: edges from .mat Laplacian + morphological thinning; semseg PNG
  (VOC12 or pascal-context folder); human parts from .mat with a 6-part
  merge table; distilled normals masked to NYU-compatible classes;
  distilled saliency thresholded at 0.5; parts preprocessing cache;
  overfit mode truncates to 64 images.
  NYUD: semseg 40-class shifted by -1 with 255 ignore; depth .npy; normals
  PNG -> [-1, 1]; edge PNG/255.

No torch: samples are plain dicts of float32 numpy arrays (HWC).
The skimage dependency for edge thinning is replaced by an in-repo
vectorised Zhang-Suen thinning (mtt_tpu.data._thin).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np

try:
    import scipy.io as sio
except ImportError:  # pragma: no cover
    sio = None
try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def zhang_suen_thin(mask: np.ndarray, max_iter: int = 100) -> np.ndarray:
    """Morphological skeletonisation of a binary mask (replaces
    skimage.morphology.thin used at pascal_context.py:291-296)."""
    img = mask.astype(np.uint8).copy()
    if img.sum() == 0:
        return img.astype(np.float32)

    def neighbors(im):
        p2 = np.roll(im, -1, 0); p6 = np.roll(im, 1, 0)
        p4 = np.roll(im, -1, 1); p8 = np.roll(im, 1, 1)
        p3 = np.roll(p2, -1, 1); p5 = np.roll(p6, -1, 1)
        p7 = np.roll(p6, 1, 1);  p9 = np.roll(p2, 1, 1)
        return p2, p3, p4, p5, p6, p7, p8, p9

    for _ in range(max_iter):
        changed = False
        for step in (0, 1):
            p2, p3, p4, p5, p6, p7, p8, p9 = neighbors(img)
            seq = [p2, p3, p4, p5, p6, p7, p8, p9, p2]
            A = sum(((seq[i] == 0) & (seq[i + 1] == 1)).astype(np.uint8)
                    for i in range(8))
            B = p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9
            if step == 0:
                cond = (A == 1) & (B >= 2) & (B <= 6) & \
                    (p2 * p4 * p6 == 0) & (p4 * p6 * p8 == 0)
            else:
                cond = (A == 1) & (B >= 2) & (B <= 6) & \
                    (p2 * p4 * p8 == 0) & (p2 * p6 * p8 == 0)
            rm = cond & (img == 1)
            if rm.any():
                img[rm] = 0
                changed = True
        if not changed:
            break
    return img.astype(np.float32)


class PASCALContext:
    """5-task PASCAL-Context (images + edge/semseg/parts/normals/sal)."""

    HUMAN_PART_6 = {  # 6-part merge table (pascal_context.py:39-55, key 6)
        "hair": 1, "head": 1, "lear": 1, "lebrow": 1, "leye": 1, "lfoot": 6,
        "lhand": 4, "llarm": 4, "llleg": 6, "luarm": 3, "luleg": 5, "mouth": 1,
        "neck": 2, "nose": 1, "rear": 1, "rebrow": 1, "reye": 1, "rfoot": 6,
        "rhand": 4, "rlarm": 4, "rlleg": 6, "ruarm": 3, "ruleg": 5, "torso": 2}
    HUMAN_PARTS_CATEGORY = 15

    def __init__(self, root: str, split="val", transform=None, retname=True,
                 overfit=False, do_edge=True, do_human_parts=False,
                 do_semseg=False, do_normals=False, do_sal=False,
                 db_info_dir: Optional[str] = None):
        self.root = root
        self.transform = transform
        self.retname = retname
        self.split = sorted([split] if isinstance(split, str) else list(split))
        self.do_edge, self.do_human_parts = do_edge, do_human_parts
        self.do_semseg, self.do_normals, self.do_sal = do_semseg, do_normals, do_sal

        image_dir = os.path.join(root, "JPEGImages")
        self.edge_gt_dir = os.path.join(root, "pascal-context", "trainval")
        part_gt_dir = os.path.join(root, "human_parts")
        splits_dir = os.path.join(root, "ImageSets", "Context")

        self.im_ids: List[str] = []
        self.images, self.edges, self.semsegs = [], [], []
        self.parts, self.normals, self.sals = [], [], []
        for splt in self.split:
            with open(os.path.join(splits_dir, splt + ".txt")) as f:
                lines = f.read().splitlines()
            for line in lines:
                self.im_ids.append(line.strip())
                self.images.append(os.path.join(image_dir, line + ".jpg"))
                self.edges.append(os.path.join(self.edge_gt_dir, line + ".mat"))
                self.semsegs.append(self._semseg_fname(line))
                self.parts.append(os.path.join(part_gt_dir, line + ".mat"))
                self.normals.append(os.path.join(root, "normals_distill", line + ".png"))
                self.sals.append(os.path.join(root, "sal_distill", line + ".png"))

        if self.do_normals:
            self.normals_valid_classes = self._normals_valid_classes(db_info_dir)
        if self.do_human_parts:
            self._prepare_parts_index(part_gt_dir)

        if overfit:
            n = 64
            for attr in ("im_ids", "images", "edges", "semsegs", "parts",
                         "normals", "sals"):
                setattr(self, attr, getattr(self, attr)[:n])
            if self.do_human_parts:
                self.has_human_parts = self.has_human_parts[:n]

    # ---- index helpers -------------------------------------------------
    def _semseg_fname(self, name: str) -> str:
        voc = os.path.join(self.root, "semseg", "VOC12", name + ".png")
        ctx = os.path.join(self.root, "semseg", "pascal-context", name + ".png")
        return voc if os.path.isfile(voc) else ctx

    def _normals_valid_classes(self, db_info_dir):
        """NYU-compatible context classes whose distilled normals are valid
        (pascal_context.py:120-137)."""
        db_info_dir = db_info_dir or os.path.join(self.root, "db_info")
        with open(os.path.join(db_info_dir, "nyu_classes.json")) as f:
            cls_nyu = json.load(f)
        with open(os.path.join(db_info_dir, "context_classes.json")) as f:
            cls_context = json.load(f)
        valid = [cls_context[c] for c in cls_nyu
                 if c in cls_context and c != "unknown"]
        valid.append(cls_context["tvmonitor"])
        return set(valid)

    def _prepare_parts_index(self, part_gt_dir):
        """Cache of which images contain annotated humans
        (pascal_context.py:374-414)."""
        cache = os.path.join(self.root, "ImageSets", "Parts",
                             "".join(self.split) + ".txt")
        if os.path.isfile(cache):
            with open(cache) as f:
                self.part_obj_dict = json.load(f)
        else:
            self.part_obj_dict = {}
            for im_id, pth in zip(self.im_ids, self.parts):
                cats = []
                if os.path.isfile(pth):
                    mat = sio.loadmat(pth)["anno"][0][0][1][0]
                    for obj in mat:
                        if len(obj[3]) != 0:
                            cats.append(int(obj[1][0][0]))
                self.part_obj_dict[im_id] = cats
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            with open(cache, "w") as f:
                json.dump(self.part_obj_dict, f)
        self.has_human_parts = [
            1 if self.HUMAN_PARTS_CATEGORY in self.part_obj_dict.get(i, [])
            else 0 for i in self.im_ids]

    # ---- label loaders -------------------------------------------------
    def _load_edge(self, idx):
        lbl = sio.loadmat(self.edges[idx])["LabelMap"]
        lap = cv2.Laplacian(lbl.astype(np.float64), cv2.CV_64F)
        return zhang_suen_thin(np.abs(lap) > 0)

    def _load_human_parts(self, idx, hw):
        if not self.has_human_parts[idx]:
            return np.zeros(hw, np.float32)
        mat = sio.loadmat(self.parts[idx])["anno"][0][0][1][0]
        target = None
        for obj in mat:
            if int(obj[1][0][0]) == self.HUMAN_PARTS_CATEGORY and len(obj[3]) != 0:
                if target is None:
                    target = np.zeros(obj[2].shape, np.float32)
                for part in obj[3][0]:
                    name = str(part[0][0])
                    target[part[1].astype(bool)] = self.HUMAN_PART_6[name]
        return target if target is not None else np.zeros(hw, np.float32)

    def _load_normals(self, idx):
        img = np.array(Image.open(self.normals[idx]), np.float32)
        img = 2.0 * img / 255.0 - 1.0
        labels = sio.loadmat(
            os.path.join(self.edge_gt_dir, self.im_ids[idx] + ".mat"))["LabelMap"]
        out = np.zeros_like(img)
        for x in np.unique(labels):
            if int(x) in self.normals_valid_classes:
                out[labels == x, :] = img[labels == x, :]
        return out

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx, rng=None) -> Dict:
        img = np.array(Image.open(self.images[idx]).convert("RGB"), np.float32)
        sample = {"image": img}
        hw = img.shape[:2]

        def fit(arr, interp=cv2.INTER_NEAREST):
            if arr.shape[:2] != hw:
                arr = cv2.resize(arr, hw[::-1], interpolation=interp)
            return arr

        if self.do_edge:
            sample["edge"] = fit(self._load_edge(idx))[..., None]
        if self.do_human_parts:
            sample["human_parts"] = fit(self._load_human_parts(idx, hw))[..., None]
        if self.do_semseg:
            sample["semseg"] = fit(np.array(Image.open(self.semsegs[idx]),
                                            np.float32))[..., None]
        if self.do_normals:
            sample["normals"] = fit(self._load_normals(idx), cv2.INTER_CUBIC)
        if self.do_sal:
            sal = np.array(Image.open(self.sals[idx]), np.float32) / 255.0
            sample["sal"] = fit((sal > 0.5).astype(np.float32))[..., None]
        if self.retname:
            sample["meta"] = {"img_name": self.im_ids[idx], "img_size": hw}
        if self.transform is not None:
            sample = self.transform(sample, rng or np.random.default_rng())
        return sample


class NYUD_MT:
    """4-task NYUD-v2 (InvPT/data/nyud.py:20-212)."""

    def __init__(self, root: str, split="val", transform=None, retname=True,
                 overfit=False, do_edge=False, do_semseg=False,
                 do_normals=False, do_depth=False):
        self.root = root
        self.transform = transform
        self.retname = retname
        self.split = [split] if isinstance(split, str) else sorted(split)
        self.do_edge, self.do_semseg = do_edge, do_semseg
        self.do_normals, self.do_depth = do_normals, do_depth

        self.im_ids, self.images = [], []
        self.edges, self.semsegs, self.normals, self.depths = [], [], [], []
        for splt in self.split:
            with open(os.path.join(root, "gt_sets", splt + ".txt")) as f:
                lines = f.read().splitlines()
            for line in lines:
                self.im_ids.append(line.strip())
                self.images.append(os.path.join(root, "images", line + ".png"))
                self.edges.append(os.path.join(root, "edge", line + ".png"))
                self.semsegs.append(os.path.join(root, "segmentation", line + ".png"))
                self.normals.append(os.path.join(root, "normals", line + ".png"))
                self.depths.append(os.path.join(root, "depth", line + ".npy"))
        if overfit:
            self.images = self.images[:64]
            self.im_ids = self.im_ids[:64]

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx, rng=None):
        img = np.array(Image.open(self.images[idx]).convert("RGB"), np.float32)
        sample = {"image": img}
        hw = img.shape[:2]
        if self.do_edge:
            e = np.array(Image.open(self.edges[idx]), np.float32) / 255.0
            sample["edge"] = e[..., None]
        if self.do_semseg:
            s = np.array(Image.open(self.semsegs[idx]), np.float32) - 1
            s[s == -1] = 255
            sample["semseg"] = s[..., None]
        if self.do_normals:
            n = np.array(Image.open(self.normals[idx]), np.float32)
            sample["normals"] = 2.0 * n / 255.0 - 1.0
        if self.do_depth:
            d = np.load(self.depths[idx]).astype(np.float32)
            sample["depth"] = d[..., None]
        if self.retname:
            sample["meta"] = {"img_name": self.im_ids[idx], "img_size": hw}
        if self.transform is not None:
            sample = self.transform(sample, rng or np.random.default_rng())
        return sample

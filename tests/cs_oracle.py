"""Loader for the OFFICIAL Cityscapes-3D evaluator as a test oracle.

The reference vendors the official evaluator verbatim
(/root/reference/TaskPrompter/detection_toolbox/evalObjectDetection3d.py)
but its imports (coloredlogs, tqdm, pyquaternion, cityscapesscripts.*) are
not installed here. This module injects minimal stand-ins into sys.modules
and then loads the vendored evaluator + vendored box3dImageTransform
DIRECTLY FROM /root/reference at test time (nothing is copied into this
repo). The stand-ins re-implement the public semantics of:

  * pyquaternion.Quaternion (0.9.x): list/matrix init, hamilton product,
    inverse, rotation_matrix, and the yaw_pitch_roll property with
    pyquaternion's exact (and idiosyncratic) sign convention;
  * cityscapesscripts.helpers.annotation CsBbox3d/CsBbox2d/CsIgnore2d:
    JSON boxes stored xywh, exposed xyxy, depth = int BEV distance;
  * cityscapesscripts.evaluation.objectDetectionHelpers: calcIouMatrix /
    calcOverlapMatrix with the package's +1-pixel box convention,
    EvaluationParameters, getFiles, MATCHING_AMODAL=0 / MATCHING_MODAL=1
    (the ints the official CLI passes, evalObjectDetection3d.py:1262).

Skip tests importing this when /root/reference is absent.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np

REF_DIR = "/root/reference/TaskPrompter/detection_toolbox"


def reference_available() -> bool:
    return os.path.isfile(os.path.join(REF_DIR, "evalObjectDetection3d.py"))


# ---------------------------------------------------------------------------
# pyquaternion.Quaternion stand-in
# ---------------------------------------------------------------------------


class Quaternion:
    """Subset of pyquaternion.Quaternion used by the evaluator and by
    box3dImageTransform: (w,x,y,z) storage, hamilton product, inverse,
    rotation_matrix, yaw_pitch_roll."""

    def __init__(self, q=None, matrix=None, w=None, x=None, y=None, z=None):
        if matrix is not None:
            self.q = self._from_matrix(np.asarray(matrix, np.float64))
        elif q is not None:
            if isinstance(q, Quaternion):
                self.q = q.q.copy()
            else:
                self.q = np.asarray(q, np.float64).reshape(4)
        else:
            self.q = np.asarray([w or 0.0, x or 0.0, y or 0.0, z or 0.0],
                                np.float64)

    @staticmethod
    def _from_matrix(m):
        """Rotation matrix -> unit quaternion (Shepperd). q and -q encode
        the same rotation; every consumer here is sign-invariant."""
        m = m[:3, :3]
        t = np.trace(m)
        if t > 0:
            s = np.sqrt(t + 1.0) * 2
            w = 0.25 * s
            x = (m[2, 1] - m[1, 2]) / s
            y = (m[0, 2] - m[2, 0]) / s
            z = (m[1, 0] - m[0, 1]) / s
        elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
            s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
            w = (m[2, 1] - m[1, 2]) / s
            x = 0.25 * s
            y = (m[0, 1] + m[1, 0]) / s
            z = (m[0, 2] + m[2, 0]) / s
        elif m[1, 1] > m[2, 2]:
            s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
            w = (m[0, 2] - m[2, 0]) / s
            x = (m[0, 1] + m[1, 0]) / s
            y = 0.25 * s
            z = (m[1, 2] + m[2, 1]) / s
        else:
            s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
            w = (m[1, 0] - m[0, 1]) / s
            x = (m[0, 2] + m[2, 0]) / s
            y = (m[1, 2] + m[2, 1]) / s
            z = 0.25 * s
        return np.asarray([w, x, y, z], np.float64)

    def _normalised(self):
        return self.q / np.linalg.norm(self.q)

    @property
    def inverse(self):
        n = np.dot(self.q, self.q)
        return Quaternion([self.q[0] / n, -self.q[1] / n,
                           -self.q[2] / n, -self.q[3] / n])

    def __mul__(self, other):
        w1, x1, y1, z1 = self.q
        w2, x2, y2, z2 = other.q
        return Quaternion([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])

    @property
    def rotation_matrix(self):
        w, x, y, z = self._normalised()
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])

    @property
    def yaw_pitch_roll(self):
        """pyquaternion 0.9.x source convention (note the MINUS signs in
        yaw/roll — this is the library's documented intrinsic z-y'-x''
        decomposition, not scipy's)."""
        q = self._normalised()
        yaw = np.arctan2(2 * (q[0] * q[3] - q[1] * q[2]),
                         1 - 2 * (q[2] ** 2 + q[3] ** 2))
        pitch = np.arcsin(2 * (q[0] * q[2] + q[1] * q[3]))
        roll = np.arctan2(2 * (q[0] * q[1] - q[2] * q[3]),
                          1 - 2 * (q[1] ** 2 + q[2] ** 2))
        return yaw, pitch, roll


# ---------------------------------------------------------------------------
# cityscapesscripts.helpers.annotation stand-ins
# ---------------------------------------------------------------------------


class CsBbox2d:
    """2D box stored xywh (the JSON convention), exposed xyxy via the
    bbox_modal/bbox_amodal properties (cityscapesscripts annotation.py)."""

    def __init__(self):
        self.bbox_modal_xywh = None
        self.bbox_amodal_xywh = None

    def fromJsonText(self, d, objId=-1):
        if "modal" in d:
            self.bbox_modal_xywh = list(d["modal"])
        if "amodal" in d:
            self.bbox_amodal_xywh = list(d["amodal"])
        if self.bbox_modal_xywh is None:
            self.bbox_modal_xywh = list(self.bbox_amodal_xywh)
        if self.bbox_amodal_xywh is None:
            self.bbox_amodal_xywh = list(self.bbox_modal_xywh)

    @staticmethod
    def _xyxy(b):
        return [b[0], b[1], b[0] + b[2], b[1] + b[3]]

    @property
    def bbox_modal(self):
        return self._xyxy(self.bbox_modal_xywh)

    @property
    def bbox_amodal(self):
        return self._xyxy(self.bbox_amodal_xywh)

    def setAmodalBox(self, bbox_amodal_xyxy):
        x0, y0, x1, y1 = bbox_amodal_xyxy
        self.bbox_amodal_xywh = [x0, y0, x1 - x0, y1 - y0]


class CsBbox3d:
    def __init__(self):
        self.bbox_2d = None
        self.center = []
        self.dims = []
        self.rotation = []
        self.label = ""
        self.score = -1.0

    def fromJsonText(self, d, objId=-1):
        self.bbox_2d = CsBbox2d()
        self.bbox_2d.fromJsonText(d["2d"])
        self.center = d["3d"]["center"]
        self.dims = d["3d"]["dimensions"]
        self.rotation = d["3d"]["rotation"]
        self.label = str(d["label"])
        if "score" in d:
            self.score = float(d["score"])

    @property
    def depth(self):
        # int BEV distance (cityscapesscripts annotation.py: .astype(int))
        return np.sqrt(self.center[0] ** 2
                       + self.center[1] ** 2).astype(int)


class CsIgnore2d:
    def __init__(self):
        self.bbox_xywh = []
        self.label = ""

    def fromJsonText(self, d, objId=-1):
        self.bbox_xywh = list(d["2d"])
        self.label = str(d.get("label", ""))

    @property
    def bbox(self):
        b = self.bbox_xywh
        return [b[0], b[1], b[0] + b[2], b[1] + b[3]]


# ---------------------------------------------------------------------------
# cityscapesscripts.evaluation.objectDetectionHelpers stand-ins
# ---------------------------------------------------------------------------

MATCHING_AMODAL = 0
MATCHING_MODAL = 1


class EvaluationParameters:
    def __init__(self, labels_to_evaluate, min_iou_to_match=0.7,
                 max_depth=100, step_size=5,
                 matching_method=MATCHING_AMODAL, cw=-1.0):
        self.labels_to_evaluate = labels_to_evaluate
        self.min_iou_to_match = min_iou_to_match
        self.max_depth = max_depth
        self.step_size = step_size
        self.matching_method = matching_method
        self.cw = cw
        self.num_conf = 50   # package default confidence-sweep resolution


def getFiles(folder):
    out = []
    for root, _, names in os.walk(folder):
        for n in names:
            if n.endswith(".json"):
                out.append(os.path.join(root, n))
    return sorted(out)


def calcIouMatrix(gts, preds):
    """(N,4)x(M,4) xyxy IoU with the package's +1-pixel area convention
    (cityscapesscripts objectDetectionHelpers.calcIouMatrix)."""
    if len(gts) == 0 or len(preds) == 0:
        return np.zeros((len(gts), len(preds)))
    x11, y11, x12, y12 = np.split(np.asarray(gts, np.float64), 4, axis=1)
    x21, y21, x22, y22 = np.split(np.asarray(preds, np.float64), 4, axis=1)
    xA = np.maximum(x11, x21.T)
    yA = np.maximum(y11, y21.T)
    xB = np.minimum(x12, x22.T)
    yB = np.minimum(y12, y22.T)
    inter = np.maximum(xB - xA + 1, 0) * np.maximum(yB - yA + 1, 0)
    a = (x12 - x11 + 1) * (y12 - y11 + 1)
    b = (x22 - x21 + 1) * (y22 - y21 + 1)
    return inter / (a + b.T - inter)


def calcOverlapMatrix(gts, preds):
    """Intersection over PREDICTION area, +1-pixel convention (used to
    absorb FPs into ignore regions)."""
    if len(gts) == 0 or len(preds) == 0:
        return np.zeros((len(gts), len(preds)))
    x11, y11, x12, y12 = np.split(np.asarray(gts, np.float64), 4, axis=1)
    x21, y21, x22, y22 = np.split(np.asarray(preds, np.float64), 4, axis=1)
    xA = np.maximum(x11, x21.T)
    yA = np.maximum(y11, y21.T)
    xB = np.minimum(x12, x22.T)
    yB = np.minimum(y12, y22.T)
    inter = np.maximum(xB - xA + 1, 0) * np.maximum(yB - yA + 1, 0)
    b = (x22 - x21 + 1) * (y22 - y21 + 1)
    return inter / b.T


# ---------------------------------------------------------------------------
# module injection + evaluator loading
# ---------------------------------------------------------------------------


def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def load_official_evaluator():
    """Returns the vendored evalObjectDetection3d module (or raises)."""
    if not reference_available():
        raise RuntimeError("/root/reference not available")
    _module("coloredlogs", install=lambda **k: None)
    _module("tqdm", tqdm=lambda x, **k: x)
    _module("pyquaternion", Quaternion=Quaternion)

    cs = _module("cityscapesscripts")
    helpers = _module("cityscapesscripts.helpers")
    cs.helpers = helpers
    _module("cityscapesscripts.helpers.annotation",
            CsBbox3d=CsBbox3d, CsBbox2d=CsBbox2d, CsIgnore2d=CsIgnore2d)

    spec = importlib.util.spec_from_file_location(
        "cityscapesscripts.helpers.box3dImageTransform",
        os.path.join(REF_DIR, "box3dImageTransform.py"))
    b3d = importlib.util.module_from_spec(spec)
    sys.modules["cityscapesscripts.helpers.box3dImageTransform"] = b3d
    spec.loader.exec_module(b3d)

    evaluation = _module("cityscapesscripts.evaluation")
    cs.evaluation = evaluation
    _module("cityscapesscripts.evaluation.objectDetectionHelpers",
            EvaluationParameters=EvaluationParameters, getFiles=getFiles,
            calcIouMatrix=calcIouMatrix, calcOverlapMatrix=calcOverlapMatrix,
            MATCHING_AMODAL=MATCHING_AMODAL, MATCHING_MODAL=MATCHING_MODAL)

    spec = importlib.util.spec_from_file_location(
        "ref_eval_object_detection_3d",
        os.path.join(REF_DIR, "evalObjectDetection3d.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_eval_object_detection_3d"] = mod
    spec.loader.exec_module(mod)
    return mod

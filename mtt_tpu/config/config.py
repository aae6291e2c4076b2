"""Configuration system for the TPU-native multi-task framework.

Replicates the semantics of the reference config layer
(InvPT/utils/config.py:17-145 and TaskPrompter/utils/config.py:19-169):
YAML experiment files with the same key schema (``backbone``, ``head``,
``embed_dim``, ``prompt_len``, ``task_dictionary``, ``loss_kwargs``, ...),
a derived task table with per-task output channel counts and resize
interpolation modes, per-dataset train/test scales, and derived output paths.

Differences from the reference (deliberate, TPU-first):
  * ``Config`` is a plain attribute-dict consumed at *trace time* only —
    nothing inside the jitted step reads it dynamically.
  * Interpolation modes are backend-neutral strings ("nearest" / "linear" /
    "cubic") instead of cv2 integer flags; `mtt_tpu.data.transforms` maps
    them to cv2 flags on the host path and to jax.image methods on device.
  * The 3D-detection head parameters live in their own config namespace
    instead of a live model object stored inside the config tree
    (the reference stores an nn.Module in cfg, TaskPrompter/utils/config.py:160).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import yaml


class Config(dict):
    """Attribute-access dict (nested). Keeps YAML schema 1:1 on disk."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @classmethod
    def wrap(cls, obj: Any) -> Any:
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return type(obj)(cls.wrap(v) for v in obj)
        return obj


# Per-task metadata. `interp` drives label resizing during augmentation,
# `infer_interp` drives prediction resizing at eval time — these match the
# cv2 FLAGVALS / INFER_FLAGVALS tables in the reference
# (InvPT/utils/config.py:27-87).
TASK_META: Dict[str, Dict[str, Any]] = {
    "image": {"interp": "cubic"},
    "semseg": {"interp": "nearest", "infer_interp": "nearest"},
    "depth": {"interp": "nearest", "infer_interp": "linear"},
    "human_parts": {"interp": "nearest", "infer_interp": "nearest"},
    "sal": {"interp": "nearest", "infer_interp": "linear"},
    "normals": {"interp": "cubic", "infer_interp": "linear"},
    "edge": {"interp": "nearest", "infer_interp": "linear"},
    "3ddet": {},
}

# semseg class counts per database (InvPT/utils/config.py:33-38,
# TaskPrompter/utils/config.py:33-39).
_SEMSEG_CLASSES = {"PASCALContext": 21, "NYUD": 40, "Cityscapes3D": 19}

# train/test input scales per database (InvPT/utils/config.py:112-124,
# TaskPrompter/utils/config.py:112-129). (height, width).
DB_SCALES = {
    "PASCALContext": ((512, 512), (512, 512)),
    "NYUD": ((448, 576), (448, 576)),
    "Cityscapes3D": ((1024, 2048), (1024, 2048)),
}


def parse_task_dictionary(db_name: str, task_dictionary: Dict[str, Any]) -> Tuple[Config, Dict[str, Any]]:
    """Build the task table from the YAML ``task_dictionary`` block.

    Mirrors `parse_task_dictionary` (InvPT/utils/config.py:17-89;
    TaskPrompter/utils/config.py:19-90 adds Cityscapes3D semseg=19,
    depth eval range 0-80m, and the 3ddet task with 12+6 channels).
    """
    tasks = Config()
    other: Dict[str, Any] = {}
    tasks.NAMES = []
    tasks.NUM_OUTPUT = Config()
    tasks.FLAGVALS = Config({"image": TASK_META["image"]["interp"]})
    tasks.INFER_FLAGVALS = Config()

    def _add(name: str, num_output: int) -> None:
        tasks.NAMES.append(name)
        tasks.NUM_OUTPUT[name] = num_output
        meta = TASK_META[name]
        if "interp" in meta:
            tasks.FLAGVALS[name] = meta["interp"]
        if "infer_interp" in meta:
            tasks.INFER_FLAGVALS[name] = meta["infer_interp"]

    def _want(key: str) -> bool:
        return bool(task_dictionary.get(key, False))

    if _want("include_semseg"):
        if db_name not in _SEMSEG_CLASSES:
            raise NotImplementedError(f"semseg not defined for db {db_name}")
        _add("semseg", _SEMSEG_CLASSES[db_name])

    if _want("include_depth"):
        _add("depth", 1)
        if db_name == "Cityscapes3D":
            tasks.depth_max = 80.0
            tasks.depth_min = 0.0

    if _want("include_human_parts"):
        assert db_name == "PASCALContext"
        _add("human_parts", 7)

    if _want("include_sal"):
        assert db_name == "PASCALContext"
        _add("sal", 2)

    if _want("include_normals"):
        assert db_name in ("PASCALContext", "NYUD")
        _add("normals", 3)

    if _want("include_edge"):
        assert db_name in ("PASCALContext", "NYUD")
        _add("edge", 1)
        other["edge_w"] = task_dictionary["edge_w"]
        other["eval_edge"] = False

    if _want("include_3ddet"):
        if db_name != "Cityscapes3D":
            raise NotImplementedError("3ddet requires Cityscapes3D")
        # 12 regression channels + 6 classes (TaskPrompter/utils/config.py:86)
        _add("3ddet", 12 + 6)

    return tasks, other


def create_config(exp_file: str, params: Dict[str, Any] | None = None,
                  run_mode: str = "train") -> Config:
    """Load a YAML experiment file into an enriched Config.

    Mirrors `create_config` (InvPT/utils/config.py:92-145): copies all YAML
    keys, parses the task dictionary, sets per-dataset scales and derived
    output/checkpoint paths. Detection head parameters for Cityscapes-3D are
    attached as a config *namespace* (`det_cfg`) rather than a live model.
    """
    params = dict(params or {})
    params.setdefault("run_mode", run_mode)

    with open(exp_file, "r") as stream:
        raw = yaml.safe_load(stream)

    cfg = Config.wrap(raw)

    root_dir = os.path.join(cfg["out_dir"], cfg["version_name"])

    cfg.TASKS, extra = parse_task_dictionary(cfg["train_db_name"], cfg["task_dictionary"])
    for k, v in extra.items():
        cfg[k] = v

    db = cfg["train_db_name"]
    if db not in DB_SCALES:
        raise NotImplementedError(f"Unknown database {db}")
    train_scale, test_scale = DB_SCALES[db]
    cfg.TRAIN = Config(SCALE=tuple(train_scale))
    cfg.TEST = Config(SCALE=tuple(test_scale))
    if db == "Cityscapes3D":
        cfg.IMAGE_ORI_SIZE = (1024, 2048)

    cfg["root_dir"] = root_dir
    cfg["output_dir"] = root_dir
    cfg["save_dir"] = os.path.join(root_dir, "results")
    cfg["checkpoint"] = os.path.join(root_dir, "checkpoint")
    if params["run_mode"] != "infer":
        os.makedirs(cfg["output_dir"], exist_ok=True)
        os.makedirs(cfg["save_dir"], exist_ok=True)

    # 3D detection head parameters (the reference merges
    # configs/cityscapes3d/det_head_params.py into the cfg and instantiates a
    # DetModel inside it, TaskPrompter/utils/config.py:148-165; we keep a pure
    # parameter namespace and build the model in the factory instead).
    if "3ddet" in cfg.TASKS.NAMES:
        from mtt_tpu.detection.det_params import default_det_params

        det = default_det_params(num_classes=6)
        # strides are defined w.r.t. the original 1024x2048 image; account for
        # dataset-side downscale and in-model img_ds_ratio resize
        # (TaskPrompter/utils/config.py:153-157).
        ds_ratio = cfg.IMAGE_ORI_SIZE[0] // cfg.TRAIN.SCALE[0]
        det.strides = tuple(s * ds_ratio / cfg.get("img_ds_ratio", 1.0) for s in det.strides)
        cfg.det_cfg = det

    # defaults present in most reference configs
    cfg.setdefault("ignore_index", 255)
    cfg.setdefault("intermediate_supervision", False)
    cfg.setdefault("use_ctr", False)
    cfg.setdefault("prompt_len", 1)
    cfg.setdefault("chan_nheads", 1)
    cfg.setdefault("img_ds_ratio", 1.0)
    cfg.setdefault("fea_ds_ratio", 1)
    cfg.setdefault("overfit", False)

    for k, v in params.items():
        cfg[k] = v

    return cfg

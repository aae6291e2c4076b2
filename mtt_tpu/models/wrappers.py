"""Top-level model wrappers: backbone -> decoder -> per-task heads.

Equivalents of InvPT/models/transformer_net.py:13-38 (TransformerNet) and
TaskPrompter/models/taskprompter_wrapper.py:9-40 (TaskPrompterWrapper).
Outputs are NHWC dicts keyed by task, upsampled to the input (or
``dd_label_map_size``) resolution.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mtt_tpu.models.heads import HEADS
from mtt_tpu.models.invpt import InvPTDecoder
from mtt_tpu.models.layers import interpolate
from mtt_tpu.models.taskprompter import TASKPROMPTER_VIT_SPECS, TaskPrompterViT
from mtt_tpu.models.vit import VIT_SPECS, VisionTransformer


class TransformerNet(nn.Module):
    """InvPT: ViT backbone + InvPT decoder + 1x1-conv heads."""
    tasks: Sequence[str]
    num_outputs: Dict[str, int]
    backbone_name: str = "vitL"
    head_name: str = "mlp"
    embed_dim: int = 512
    pred_out: int = 64
    mtt_downsample: int = 2
    drop_path_rate: float = 0.15
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        img_size = x.shape[1:3]
        spec = VIT_SPECS[self.backbone_name]
        backbone = VisionTransformer(
            img_size=img_size, drop_path_rate=self.drop_path_rate,
            remat=self.remat, dtype=self.dtype, name="backbone", **spec)
        _, taps = backbone(x, deterministic=not train)
        grid = (img_size[0] // spec["patch_size"], img_size[1] // spec["patch_size"])

        decoder = InvPTDecoder(
            tasks=tuple(self.tasks), num_outputs=dict(self.num_outputs),
            embed_dim=self.embed_dim, pred_out=self.pred_out,
            backbone_dim=spec["embed_dim"], mtt_downsample=self.mtt_downsample,
            dtype=self.dtype, name="decoder")

        # eval + mlp heads: fuse each task's 1x1 head into the decoder's
        # tail kernel (the five (B, th, tw, 576) feature maps and their
        # head re-reads — ~1.5 GB HBM/step at bench shapes — vanish).
        # Param tree is identical to the MLPHead modules, so train/eval
        # and converted checkpoints stay interchangeable. OPT-IN
        # (MTT_TAIL_HEAD=1): wall-time-neutral on the bench (the tail
        # kernel is compute-bound; its stores were already overlapped)
        # and the 40 MB scoped-VMEM cap it needs costs Swin ~3%
        # (docs/PERF.md r5).
        import os as _os
        head_params = None
        if (not train) and self.head_name == "mlp" \
                and _os.environ.get("MTT_TAIL_HEAD") == "1" \
                and all(self.num_outputs[t] <= 128 for t in self.tasks):
            from mtt_tpu.models.heads import MLPHeadParams
            D = self.embed_dim + self.pred_out
            head_params = {
                t: MLPHeadParams(self.num_outputs[t], D,
                                 name=f"head_{t}")()
                for t in self.tasks}
        task_features, inter_preds = decoder(taps, grid, train=train,
                                             head_params=head_params)

        head_cls = HEADS[self.head_name]
        out = {}
        for t in self.tasks:
            if head_params is not None:
                logits = task_features[t]   # decoder emitted logits
            else:
                logits = head_cls(self.num_outputs[t], dtype=self.dtype,
                                  name=f"head_{t}")(task_features[t],
                                                    train=train)
            out[t] = interpolate(logits, img_size, "bilinear")
        out["inter_preds"] = {
            t: interpolate(v, img_size, "bilinear") for t, v in inter_preds.items()}
        return out


class TaskPrompterNet(nn.Module):
    """TaskPrompter: prompted ViT backbone + conv heads."""
    tasks: Sequence[str]
    num_outputs: Dict[str, int]
    backbone_name: str = "TaskPrompter_vitB"
    head_name: str = "conv"
    tar_dim: int = 300
    final_dim: int = 350
    prompt_len: int = 1
    chan_nheads: int = 1
    use_ctr: bool = True
    target_size: Optional[Tuple[int, int]] = None
    drop_path_rate: float = 0.15
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        img_size = x.shape[1:3]
        target_size = self.target_size or img_size
        spec = TASKPROMPTER_VIT_SPECS[self.backbone_name]
        # Conv heads fuse the backbone's 4x feature upsample into their
        # 3x3 conv (ConvHead up4; exact — pinned by the parity test): the
        # backbone returns patch-grid features and the (B,4gh,4gw,350)
        # per-task maps are never materialised. Default 'factored' (the
        # channel contraction runs at low resolution: 0.61 vs 2.55
        # ms/task measured on v5e — layers.up4_conv3x3_factored);
        # MTT_HEAD_IMPL=dense|phase|factored overrides, legacy
        # MTT_HEAD_UP4=1 selects the phase path.
        import os
        head_impl = os.environ.get("MTT_HEAD_IMPL")
        if head_impl is None:
            head_impl = ("phase" if os.environ.get("MTT_HEAD_UP4", "0")
                         not in ("", "0") else "factored")
        fused_up4 = (self.head_name == "conv"
                     and head_impl in ("phase", "factored"))
        backbone = TaskPrompterViT(
            tasks=tuple(self.tasks), img_size=img_size,
            chan_nheads=self.chan_nheads, prompt_len=self.prompt_len,
            tar_dim=self.tar_dim, final_dim=self.final_dim,
            use_ctr=self.use_ctr, drop_path_rate=self.drop_path_rate,
            upsample_out=not fused_up4, dtype=self.dtype, name="backbone",
            **spec)
        task_features = backbone(x, train=train)

        head_cls = HEADS[self.head_name]
        out = {}
        for t in self.tasks:
            if t == "3ddet":
                # detection head consumes the raw multi-scale features;
                # wired in the Swin/Cityscapes pipeline.
                out[t] = task_features[t]
                continue
            kw = {"up4": head_impl} if fused_up4 else {}
            logits = head_cls(self.num_outputs[t], dtype=self.dtype,
                              name=f"head_{t}", **kw)(task_features[t],
                                                      train=train)
            out[t] = interpolate(logits, target_size, "bilinear")
        return out


class TaskPrompterSwinNet(nn.Module):
    """TaskPrompter-Swin + heads (+ FCOS3D detection head for 3ddet).

    Equivalent of TaskPrompterWrapper for the Cityscapes-3D config
    (taskprompter_wrapper.py:22-40): 2D heads upsampled to
    ``dd_label_map_size``; the 3ddet head consumes the raw 4-scale list.
    """
    tasks: Sequence[str]
    num_outputs: Dict[str, int]
    head_name: str = "deconv"
    tar_dim: int = 256
    final_dim: int = 450
    prompt_len: int = 1
    chan_embed_dim: int = 256
    img_ds_ratio: float = 1.0
    remat: bool = False
    target_size: Optional[Tuple[int, int]] = None
    det_cfg: Optional[dict] = None
    # Swin-B topology defaults (taskprompter_swin_base_patch4_window12_384)
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from mtt_tpu.models.taskprompter_swin import TaskPrompterSwin

        img_size = x.shape[1:3]
        target_size = self.target_size or img_size
        backbone = TaskPrompterSwin(
            tasks=tuple(self.tasks), img_size=img_size,
            embed_dim=self.embed_dim, depths=self.depths,
            num_heads=self.num_heads, window_size=self.window_size,
            prompt_len=self.prompt_len, chan_embed_dim=self.chan_embed_dim,
            tar_dim=self.tar_dim, final_dim=self.final_dim,
            img_ds_ratio=self.img_ds_ratio, remat=self.remat,
            dtype=self.dtype, name="backbone")
        task_features = backbone(x, train=train)

        # training at Cityscapes resolution OOMs HBM without rematerialising
        # the heads too: the deconv/DCN towers' linearisation buffers at
        # 1/4-resolution dwarf the Swin blocks' (which backbone remat
        # already covers)
        head_cls = HEADS[self.head_name]
        if self.remat:
            head_cls = nn.remat(head_cls, static_argnums=(2,))
        out = {}
        for t in self.tasks:
            if t == "3ddet":
                from mtt_tpu.detection.fcos3d_head import DetectionHead
                det_cls = (nn.remat(DetectionHead, static_argnums=(2,))
                           if self.remat else DetectionHead)
                out[t] = det_cls(det_cfg=self.det_cfg, dtype=self.dtype,
                                 name="det_head")(task_features[t], train)
                continue
            logits = head_cls(self.num_outputs[t], dtype=self.dtype,
                              name=f"head_{t}")(task_features[t], train)
            out[t] = interpolate(logits, target_size, "bilinear")
        return out


def build_taskprompter_swin(p, dtype=jnp.float32):
    import os
    tasks = tuple(p.TASKS.NAMES)
    num_outputs = {t: p.TASKS.NUM_OUTPUT[t] for t in tasks}
    tiny = {}
    if os.environ.get("MTT_DEBUG_TINY"):  # CI smoke: shrink the backbone
        tiny = dict(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
                    window_size=4)
        if "det_cfg" in p:
            d = p.det_cfg
            d.feat_channels, d.norm_groups = 16, 4
            d.cls_branch, d.dir_branch = (16, 8), (16,)
            d.reg_branch, d.centerness_branch = ((16,),) * 5, (16,)
            d.neck.out_channels = 16
    return TaskPrompterSwinNet(
        tasks=tasks, num_outputs=num_outputs, head_name=p["head"], **tiny,
        tar_dim=p.get("level_embed_dim", 256),
        final_dim=p["final_embed_dim"], prompt_len=p["prompt_len"],
        chan_embed_dim=p.get("chan_embed_dim", 256),
        img_ds_ratio=float(p.get("img_ds_ratio", 1.0)),
        remat=bool(p.get("remat", False)),
        target_size=tuple(p["dd_label_map_size"]) if "dd_label_map_size" in p else None,
        det_cfg=p.get("det_cfg"), dtype=dtype)


def build_model(p, dtype=jnp.float32):
    """Factory: config -> Flax module (reference get_model,
    InvPT/utils/common_config.py:39-51 / TaskPrompter common_config.py)."""
    tasks = tuple(p.TASKS.NAMES)
    num_outputs = {t: p.TASKS.NUM_OUTPUT[t] for t in tasks}
    if p["model"] == "TransformerNet":
        return TransformerNet(
            tasks=tasks, num_outputs=num_outputs,
            backbone_name=p["backbone"], head_name=p["head"],
            embed_dim=p["embed_dim"], pred_out=p["PRED_OUT_NUM_CONSTANT"],
            mtt_downsample=p["mtt_resolution_downsample_rate"],
            remat=bool(p.get("remat", False)), dtype=dtype)
    if p["model"] == "TaskPrompter":
        if "swin" in p["backbone"].lower():
            return build_taskprompter_swin(p, dtype=dtype)
        return TaskPrompterNet(
            tasks=tasks, num_outputs=num_outputs,
            backbone_name=p["backbone"], head_name=p["head"],
            tar_dim=p["embed_dim"], final_dim=p["final_embed_dim"],
            prompt_len=p["prompt_len"], chan_nheads=p["chan_nheads"],
            use_ctr=p.get("use_ctr", False),
            target_size=tuple(p["dd_label_map_size"]) if "dd_label_map_size" in p else None,
            dtype=dtype)
    raise NotImplementedError(f"Unknown model {p['model']}")

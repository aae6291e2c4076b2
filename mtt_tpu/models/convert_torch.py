"""Full released-checkpoint (.pth.tar) -> Flax variables conversion.

Maps EVERY parameter of the reference's published checkpoints into this
framework's variable trees (params + batch_stats), failing loudly on any
unmapped weight in either direction (VERDICT.md round-1 item 5; ADVICE
round-1 high #2).

Key layouts being translated:
  * InvPT TransformerNet state dicts: backbone.* / multi_task_decoder.* /
    heads.* (reference InvPT/models/transformer_net.py:13-21)
  * TaskPrompter ViT wrappers: backbone.* / heads.*
    (TaskPrompter/models/taskprompter_wrapper.py:9-40)

Tensor layout rules:
  torch Linear (out,in)            -> flax Dense kernel (in,out)      [.T]
  torch Conv2d (O,I,kh,kw)         -> flax Conv kernel (kh,kw,I,O)
  torch ConvTranspose2d (I,O,kh,kw)-> flax ConvTranspose (kh,kw,I,O)
  torch BatchNorm weight/bias      -> flax params scale/bias
  torch BN running_mean/var        -> flax batch_stats mean/var
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np


def _lin(v):
    return np.ascontiguousarray(v.T)


def _conv(v):
    return np.ascontiguousarray(np.transpose(v, (2, 3, 1, 0)))


def _conv_t(v):
    # torch ConvTranspose2d weight (I, O, kh, kw) -> flax (kh, kw, I, O).
    # flax ConvTranspose (transpose_kernel=False default) correlates with
    # the *unflipped* kernel while torch convolves with the flipped one,
    # so flip the spatial dims (validated against torch in
    # tests/test_convert_torch.py::test_convtranspose_semantics).
    v = v[:, :, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(v, (2, 3, 0, 1)))


def _qkv_lin(v, heads):
    """torch fused-qkv weight (3C, C) in (3,H,D) column order -> flax
    (C, 3C) in HEAD-MAJOR (H,3,D) order (see fused_attention_qkv)."""
    vt = np.ascontiguousarray(v.T)
    C = vt.shape[0]
    D = C // heads
    return np.ascontiguousarray(
        vt.reshape(C, 3, heads, D).transpose(0, 2, 1, 3).reshape(C, 3 * C))


def _qkv_bias(v, heads):
    C3 = v.shape[0]
    C = C3 // 3
    D = C // heads
    return np.ascontiguousarray(
        v.reshape(3, heads, D).transpose(1, 0, 2).reshape(C3))


def _conv1x1_to_dense(v):
    # torch Conv2d 1x1 weight (O, I, 1, 1) used where our tree has a Dense
    return np.ascontiguousarray(v[:, :, 0, 0].T)


def _dw_conv_stack(vs):
    """T per-task depthwise torch convs (C,1,kh,kw) -> one flax grouped
    kernel (kh,kw,1,T*C), task-major channel order (TaskStackConvBN)."""
    ks = [np.transpose(v, (2, 3, 1, 0)) for v in vs]      # (kh,kw,1,C)
    return np.ascontiguousarray(np.concatenate(ks, axis=-1))


def _conv_stack(vs):
    """T per-task torch convs (O,I,kh,kw) -> one flax grouped-conv kernel
    (kh,kw,I,T*O) with groups=T, task-major output order."""
    ks = [np.transpose(v, (2, 3, 1, 0)) for v in vs]
    return np.ascontiguousarray(np.concatenate(ks, axis=-1))


def _cat(vs):
    return np.ascontiguousarray(np.concatenate(list(vs), axis=0))


class Mapper:
    """Collects (collection, flax path, value) entries from a torch state
    dict, tracking which torch keys were consumed."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.used: set = set()
        self.entries: List[Tuple[str, Tuple[str, ...], np.ndarray]] = []

    def take(self, key: str, tf: Optional[Callable] = None):
        if key not in self.sd:
            raise KeyError(f"torch checkpoint is missing expected key {key}")
        self.used.add(key)
        v = np.asarray(self.sd[key])
        return tf(v) if tf is not None else v

    def take_many(self, keys: List[str], tf: Callable):
        for k in keys:
            if k not in self.sd:
                raise KeyError(f"torch checkpoint is missing expected key {k}")
            self.used.add(k)
        return tf([np.asarray(self.sd[k]) for k in keys])

    def put(self, col: str, path: str, value):
        self.entries.append((col, tuple(path.split("/")), value))

    # --- composite helpers -------------------------------------------------
    def dense(self, path: str, tkey: str, bias: bool = True):
        self.put("params", path + "/kernel", self.take(tkey + ".weight", _lin))
        if bias and tkey + ".bias" in self.sd:
            self.put("params", path + "/bias", self.take(tkey + ".bias"))

    def conv(self, path: str, tkey: str, bias: bool = True):
        self.put("params", path + "/kernel", self.take(tkey + ".weight", _conv))
        if bias and tkey + ".bias" in self.sd:
            self.put("params", path + "/bias", self.take(tkey + ".bias"))

    def conv_t(self, path: str, tkey: str, bias: bool = True):
        self.put("params", path + "/kernel", self.take(tkey + ".weight", _conv_t))
        if bias and tkey + ".bias" in self.sd:
            self.put("params", path + "/bias", self.take(tkey + ".bias"))

    def bn(self, path: str, tkey: str):
        self.put("params", path + "/scale", self.take(tkey + ".weight"))
        self.put("params", path + "/bias", self.take(tkey + ".bias"))
        self.put("batch_stats", path + "/mean", self.take(tkey + ".running_mean"))
        self.put("batch_stats", path + "/var", self.take(tkey + ".running_var"))
        self.used.add(tkey + ".num_batches_tracked")

    def ln(self, path: str, tkey: str):
        self.put("params", path + "/scale", self.take(tkey + ".weight"))
        self.put("params", path + "/bias", self.take(tkey + ".bias"))


def _resize_pos_embed(pos, want_shape, num_prefix=1):
    from mtt_tpu.models.convert import _resize_pos_embed_np
    if pos.shape == tuple(want_shape):
        return pos
    n = want_shape[1] - (1 if want_shape[1] % 2 else 0)
    # infer target grid from token count (square grids only)
    tok = want_shape[1]
    for pre in (1, 0):
        g = int(round((tok - pre) ** 0.5))
        if g * g == tok - pre:
            out = _resize_pos_embed_np(pos, (g, g), num_prefix)
            if out.shape[1] != tok:
                out = out[:, -tok:]
            return out
    raise ValueError(f"cannot resample pos_embed {pos.shape} -> {want_shape}")


# ---------------------------------------------------------------------------
# backbone block mappers
# ---------------------------------------------------------------------------

def _map_vit_backbone(m: Mapper, depth: int, heads: int,
                      pre: str = "backbone",
                      nested_attn: bool = True, prompted: bool = False):
    t = f"{pre}."
    f = f"{pre}"
    m.conv(f + "/patch_embed/proj", t + "patch_embed.proj")
    for i in range(depth):
        fb = f + f"/blocks_{i}"
        tb = t + f"blocks.{i}"
        m.ln(fb + "/norm1", tb + ".norm1")
        m.ln(fb + "/norm2", tb + ".norm2")
        ap = fb + "/attn" if nested_attn else fb
        m.put("params", ap + "/qkv/kernel",
              m.take(tb + ".attn.qkv.weight", lambda v: _qkv_lin(v, heads)))
        m.put("params", ap + "/qkv/bias",
              m.take(tb + ".attn.qkv.bias", lambda v: _qkv_bias(v, heads)))
        m.dense(ap + "/proj", tb + ".attn.proj")
        if prompted:
            m.dense(fb + "/token_trans", tb + ".attn.token_trans")
            m.dense(fb + "/token_trans1", tb + ".attn.token_trans1")
        m.dense(fb + "/mlp/fc1", tb + ".mlp.fc1")
        m.dense(fb + "/mlp/fc2", tb + ".mlp.fc2")
    m.ln(f + "/norm", t + "norm")


# ---------------------------------------------------------------------------
# TaskPrompter ViT
# ---------------------------------------------------------------------------

def map_taskprompter_net(sd: Dict[str, np.ndarray], tasks: List[str],
                         depth: int, heads: int,
                         use_ctr: bool = True) -> Mapper:
    """TaskPrompterNet (ViT-B/L): backbone.* + heads.* -> flax entries.

    Reference module tree: taskprompter.py:330-367 (decode convs),
    168-193 (block/attention), 688-698 (ConvHead).
    """
    m = Mapper(sd)
    _map_vit_backbone(m, depth, heads, "backbone", nested_attn=False,
                      prompted=True)
    m.put("params", "backbone/task_prompts", m.take("backbone.task_prompts"))
    # pos_embed resampled by the caller (needs the flax shape)
    m.used.add("backbone.pos_embed")

    for il in range(4):
        fd = f"backbone/decode_{il}"
        # per-task decode convs are stacked into grouped convs (task-major
        # channel order) in our tree — see TaskFeatureDecode
        def conv_stack(flax, tkeys):
            m.put("params", flax + "/kernel", m.take_many(
                [k + ".weight" for k in tkeys], _conv_stack))
            m.put("params", flax + "/bias", m.take_many(
                [k + ".bias" for k in tkeys], _cat))

        conv_stack(f"{fd}/spa_{il}",
                   [f"backbone.fea_decode_spa.{il}.{t}.0" for t in tasks])
        conv_stack(f"{fd}/chan_{il}",
                   [f"backbone.fea_decode_chan.{il}.{t}.0" for t in tasks])
        conv_stack(f"{fd}/fuse0_{il}",
                   [f"backbone.fea_fuse.{il}.{t}.0" for t in tasks])
        conv_stack(f"{fd}/fuse1_{il}",
                   [f"backbone.fea_fuse.{il}.{t}.1" for t in tasks])
        conv_stack(f"{fd}/fuse2_{il}",
                   [f"backbone.fea_fuse.{il}.{t}.4" for t in tasks])
        bnp = f"{fd}/fuse_bn_{il}"
        bks = [f"backbone.fea_fuse.{il}.{t}.2" for t in tasks]
        m.put("params", bnp + "/scale",
              m.take_many([k + ".weight" for k in bks], _cat))
        m.put("params", bnp + "/bias",
              m.take_many([k + ".bias" for k in bks], _cat))
        m.put("batch_stats", bnp + "/mean",
              m.take_many([k + ".running_mean" for k in bks], _cat))
        m.put("batch_stats", bnp + "/var",
              m.take_many([k + ".running_var" for k in bks], _cat))
        for k in bks:
            m.used.add(k + ".num_batches_tracked")
        for t in tasks:
            if use_ctr:
                # reference ctr convs are 1x1 Conv2d over the head axis; our
                # tree holds them as Dense (same math)
                m.put("params", f"{fd}/ctr_{il}_{t}_0/kernel",
                      m.take(f"backbone.ctr_attn_conv.{il}.{t}.0.weight",
                             _conv1x1_to_dense))
                m.put("params", f"{fd}/ctr_{il}_{t}_0/bias",
                      m.take(f"backbone.ctr_attn_conv.{il}.{t}.0.bias"))
                m.put("params", f"{fd}/ctr_{il}_{t}_1/kernel",
                      m.take(f"backbone.ctr_attn_conv.{il}.{t}.2.weight",
                             _conv1x1_to_dense))
                m.put("params", f"{fd}/ctr_{il}_{t}_1/bias",
                      m.take(f"backbone.ctr_attn_conv.{il}.{t}.2.bias"))

    for t in tasks:
        m.conv(f"head_{t}/mt_proj/conv", f"heads.{t}.mt_proj.0")
        m.bn(f"head_{t}/mt_proj/bn", f"heads.{t}.mt_proj.1")
        m.conv(f"head_{t}/linear_pred", f"heads.{t}.linear_pred")
    return m


# ---------------------------------------------------------------------------
# TaskPrompter Swin (Cityscapes-3D) + FPN + FCOS3D detection head
# ---------------------------------------------------------------------------

def map_taskprompter_swin(sd: Dict[str, np.ndarray], tasks: List[str],
                          depths=(2, 2, 18, 2), num_outs: int = 5,
                          stacked_convs: int = 3,
                          cls_branch=(256, 128),
                          reg_branch=((256,),) * 5,
                          dir_branch=(256,), centerness_branch=(256,),
                          scale_dim: int = 4, n_fpn_in: int = 4) -> Mapper:
    """TaskPrompterSwinNet: backbone.* (taskprompter_swin.py:236-655) +
    heads.{t} DEConvHead + heads.3ddet FCOS3D (det_head.py:128-317 +
    fpn.py:105-130) -> flax entries."""
    m = Mapper(sd)
    b = "backbone."
    m.conv("backbone/patch_embed", b + "patch_embed.proj")
    m.ln("backbone/patch_norm", b + "patch_embed.norm")
    m.put("params", "backbone/task_prompts", m.take(b + "task_prompts"))
    n_layers = len(depths)
    for il in range(n_layers):
        for d in range(depths[il]):
            tb = b + f"layers.{il}.blocks.{d}"
            fb = f"backbone/layer{il}_block{d}"
            m.ln(fb + "/norm1", tb + ".norm1")
            m.ln(fb + "/norm2", tb + ".norm2")
            m.put("params", fb + "/relative_position_bias_table",
                  m.take(tb + ".attn.relative_position_bias_table"))
            m.used.add(tb + ".attn.relative_position_index")  # buffer
            if d % 2 == 1:
                m.used.add(tb + ".attn_mask")                 # buffer
            m.dense(fb + "/qkv", tb + ".attn.qkv")
            m.dense(fb + "/proj", tb + ".attn.proj")
            m.dense(fb + "/token_trans", tb + ".token_trans")
            m.dense(fb + "/chan_q", tb + ".chan_q")
            m.dense(fb + "/chan_kv", tb + ".chan_kv")
            last_block = (il == n_layers - 1) and (d == depths[il] - 1)
            if not last_block:
                m.dense(fb + "/chan_proj", tb + ".chan_proj")
                m.dense(fb + "/token_trans1", tb + ".token_trans1")
            m.dense(fb + "/mlp/fc1", tb + ".mlp.fc1")
            m.dense(fb + "/mlp/fc2", tb + ".mlp.fc2")
        if il < n_layers - 1:
            td = b + f"layers.{il}.downsample"
            fd = f"backbone/merge_{il}"
            m.ln(fd + "/norm", td + ".norm")
            m.dense(fd + "/reduction", td + ".reduction", bias=False)
            m.dense(fd + "/process_chan_attn", td + ".process_chan_attn",
                    bias=False)
            m.dense(fd + "/task_prompts_up", td + ".task_prompts_up",
                    bias=False)
            m.conv(fd + "/spa_attn_ds", td + ".spa_attn_ds")
    m.ln("backbone/norm", b + "norm")

    for il in range(n_layers):
        fd = f"backbone/decode_{il}"
        for t in tasks:
            m.conv(f"{fd}/fea_decode_spa_{il}_{t}",
                   b + f"fea_decode_spa.{il}.{t}.0")
            m.conv(f"{fd}/fea_decode_chan_{il}_{t}",
                   b + f"fea_decode_chan.{il}.{t}.0")
            m.conv(f"{fd}/fea_fuse_{il}_{t}_0", b + f"fea_fuse.{il}.{t}.0")
            m.conv(f"{fd}/fea_fuse_{il}_{t}_1", b + f"fea_fuse.{il}.{t}.1")
            m.bn(f"{fd}/fea_fuse_{il}_{t}_bn", b + f"fea_fuse.{il}.{t}.2")
            m.conv(f"{fd}/fea_fuse_{il}_{t}_2", b + f"fea_fuse.{il}.{t}.4")
    for t in tasks:
        if t != "3ddet":
            m.conv(f"backbone/multi_scale_fuse_{t}",
                   b + f"multi_scale_fuse.{t}")

    # 2D heads (DEConvHead, taskprompter.py:700-715)
    for t in tasks:
        if t == "3ddet":
            continue
        h = f"heads.{t}."
        m.conv_t(f"head_{t}/deconv", h + "mt_proj.0")
        m.bn(f"head_{t}/bn1", h + "mt_proj.1")
        m.conv(f"head_{t}/conv", h + "mt_proj.3")
        m.bn(f"head_{t}/bn2", h + "mt_proj.4")
        m.conv(f"head_{t}/linear_pred", h + "linear_pred")

    if "3ddet" not in tasks:
        return m

    # ---- detection head ----
    dh = "heads.3ddet."
    fh = "det_head/fcos3d"

    def _dcn_kernel(v):
        # torch DCNv2 weight (O, C, kh, kw) -> our flattened gather-matmul
        # kernel (kh*kw*C, O), kernel-position-major (deform_conv.py:84-86)
        O_, C_, kh, kw = v.shape
        return np.ascontiguousarray(
            np.transpose(v, (2, 3, 1, 0)).reshape(kh * kw * C_, O_))

    def conv_gn(flax_prefix, torch_prefix, dcn: bool):
        if dcn:
            m.put("params", flax_prefix + "/dcn/kernel",
                  m.take(torch_prefix + ".conv.weight", _dcn_kernel))
            if torch_prefix + ".conv.bias" in m.sd:
                m.put("params", flax_prefix + "/dcn/bias",
                      m.take(torch_prefix + ".conv.bias"))
            # offset/mask conv: channel order matches (y,x interleaved per
            # kernel point, then 9 mask channels)
            m.conv(flax_prefix + "/dcn/offset_mask",
                   torch_prefix + ".conv.conv_offset")
        else:
            m.conv(flax_prefix + "/conv", torch_prefix + ".conv")
        m.ln(flax_prefix + "/gn", torch_prefix + ".gn")

    # FPN neck: first n_fpn_in fpn_convs are output convs, rest extra
    for i in range(n_fpn_in):
        m.conv(f"det_head/fpn/lateral_{i}", dh + f"neck.lateral_convs.{i}.conv")
        m.conv(f"det_head/fpn/fpn_conv_{i}", dh + f"neck.fpn_convs.{i}.conv")
    for j in range(num_outs - n_fpn_in):
        m.conv(f"det_head/fpn/extra_conv_{j}",
               dh + f"neck.fpn_convs.{n_fpn_in + j}.conv")

    for i in range(stacked_convs):
        dcn = i == stacked_convs - 1
        conv_gn(f"{fh}/cls_tower_{i}", dh + f"cls_convs.{i}", dcn)
        conv_gn(f"{fh}/reg_tower_{i}", dh + f"reg_convs.{i}", dcn)
    for i in range(len(cls_branch)):
        conv_gn(f"{fh}/cls_branch/conv_{i}", dh + f"conv_cls_prev.{i}", False)
    m.conv(f"{fh}/conv_cls", dh + "conv_cls")
    for gi, branch in enumerate(reg_branch):
        for i in range(len(branch)):
            conv_gn(f"{fh}/reg_branch_{gi}/conv_{i}",
                    dh + f"conv_reg_prevs.{gi}.{i}", False)
        m.conv(f"{fh}/conv_reg_{gi}", dh + f"conv_regs.{gi}")
    for i in range(len(dir_branch)):
        conv_gn(f"{fh}/dir_branch/conv_{i}", dh + f"conv_dir_cls_prev.{i}",
                False)
    m.conv(f"{fh}/conv_dir_cls", dh + "conv_dir_cls")
    for i in range(len(centerness_branch)):
        conv_gn(f"{fh}/ctr_branch/conv_{i}",
                dh + f"conv_centerness_prev.{i}", False)
    m.conv(f"{fh}/conv_centerness", dh + "conv_centerness")

    # per-level Scale scalars -> (num_levels, scale_dim) param
    m.put("params", f"{fh}/scales", m.take_many(
        [dh + f"scales.{lvl}.{j}.scale"
         for lvl in range(num_outs) for j in range(scale_dim)],
        lambda vs: np.asarray(vs, np.float32).reshape(num_outs, scale_dim)))
    return m


# ---------------------------------------------------------------------------
# InvPT TransformerNet
# ---------------------------------------------------------------------------

def map_transformer_net(sd: Dict[str, np.ndarray], tasks: List[str],
                        depth: int, heads: int) -> Mapper:
    """TransformerNet (InvPT ViT-L): backbone.* + multi_task_decoder.* +
    heads.* -> flax entries.

    Reference module trees: vit.py (backbone), transformer_decoder.py:18-98
    (preamble), invpt.py:419-545 (stages/norms/redu_chan/mt_proj/mix_proj).
    """
    m = Mapper(sd)
    _map_vit_backbone(m, depth, heads, "backbone", nested_attn=True,
                      prompted=False)
    m.put("params", "backbone/cls_token", m.take("backbone.cls_token"))
    m.used.add("backbone.pos_embed")  # resampled by caller

    d = "multi_task_decoder."
    fd = "decoder"
    # scale_embed: 0 ConvTranspose, 1 Conv; [2] exists in the checkpoint but
    # its output is never consumed (stage 0 has no patch_embed/skip —
    # transformer_decoder.py:82-84 + invpt.py:405), so it is intentionally
    # dropped; [3] is None.
    m.conv_t(fd + "/scale_embed_0", d + "scale_embed.0")
    m.conv(fd + "/scale_embed_1", d + "scale_embed.1")
    for suf in ("weight", "bias"):
        m.used.add(d + f"scale_embed.2.{suf}")

    for t in tasks:
        for j in (0, 1):
            m.conv(fd + f"/prelim_{t}_{j}/conv",
                   d + f"preliminary_decoder.{t}.{j}.conv")
            m.bn(fd + f"/prelim_{t}_{j}/bn",
                 d + f"preliminary_decoder.{t}.{j}.bn1")
        m.conv(fd + f"/inter_head_{t}", d + f"intermediate_head.{t}")
        m.conv(fd + f"/mix_proj_{t}", d + f"invpt.mix_proj.{t}.0")
        # reference mt_proj conv carries a (redundant, pre-BN) bias; our
        # ConvBNAct conv is bias-free — fold it into the BN running mean:
        # BN(conv(x)+b) == BN'(conv(x)) with mean' = mean - b
        m.put("params", fd + f"/mt_proj_{t}/conv/kernel",
              m.take(d + f"invpt.mt_proj.{t}.0.weight", _conv))
        cb = m.take(d + f"invpt.mt_proj.{t}.0.bias")
        bnp = fd + f"/mt_proj_{t}/bn"
        tb = d + f"invpt.mt_proj.{t}.1"
        m.put("params", bnp + "/scale", m.take(tb + ".weight"))
        m.put("params", bnp + "/bias", m.take(tb + ".bias"))
        m.put("batch_stats", bnp + "/mean",
              m.take(tb + ".running_mean") - cb)
        m.put("batch_stats", bnp + "/var", m.take(tb + ".running_var"))
        m.used.add(tb + ".num_batches_tracked")

    T = len(tasks)
    for i in range(3):
        st = d + f"invpt.invpt_stages.{i}."
        ff = fd + f"/stage_{i}"
        if i > 0:
            # per-task UpEmbed convs -> stacked grouped convs
            ue = fd + f"/up_embed_{i}"
            for j, (ci, bi) in enumerate(((1, 2), (4, 5))):
                m.put("params", f"{ue}/proj{j+1}/conv/kernel", m.take_many(
                    [st + f"patch_embed.{ti}.proj.{ci}.weight"
                     for ti in range(T)], _conv_stack))
                bnp = f"{ue}/proj{j+1}/bn"
                m.put("params", bnp + "/scale", m.take_many(
                    [st + f"patch_embed.{ti}.proj.{bi}.weight"
                     for ti in range(T)], _cat))
                m.put("params", bnp + "/bias", m.take_many(
                    [st + f"patch_embed.{ti}.proj.{bi}.bias"
                     for ti in range(T)], _cat))
                m.put("batch_stats", bnp + "/mean", m.take_many(
                    [st + f"patch_embed.{ti}.proj.{bi}.running_mean"
                     for ti in range(T)], _cat))
                m.put("batch_stats", bnp + "/var", m.take_many(
                    [st + f"patch_embed.{ti}.proj.{bi}.running_var"
                     for ti in range(T)], _cat))
                for ti in range(T):
                    m.used.add(st + f"patch_embed.{ti}.proj.{bi}.num_batches_tracked")

        blk = st + "blocks.0."
        m.ln(ff + "/norm1", blk + "norm1")
        m.ln(ff + "/norm2", blk + "norm2")
        m.dense(ff + "/mlp/fc1", blk + "mlp.fc1")
        m.dense(ff + "/mlp/fc2", blk + "mlp.fc2")
        at = blk + "attn."
        fa = ff + "/attn"
        # per-task depthwise q convs -> one depthwise grouped conv
        m.put("params", fa + "/conv_proj_q/conv/kernel", m.take_many(
            [at + f"conv_proj_q.{ti}.conv.weight" for ti in range(T)],
            _dw_conv_stack))
        bnp = fa + "/conv_proj_q/bn"
        m.put("params", bnp + "/scale", m.take_many(
            [at + f"conv_proj_q.{ti}.bn.weight" for ti in range(T)], _cat))
        m.put("params", bnp + "/bias", m.take_many(
            [at + f"conv_proj_q.{ti}.bn.bias" for ti in range(T)], _cat))
        m.put("batch_stats", bnp + "/mean", m.take_many(
            [at + f"conv_proj_q.{ti}.bn.running_mean" for ti in range(T)], _cat))
        m.put("batch_stats", bnp + "/var", m.take_many(
            [at + f"conv_proj_q.{ti}.bn.running_var" for ti in range(T)], _cat))
        for ti in range(T):
            m.used.add(at + f"conv_proj_q.{ti}.bn.num_batches_tracked")
        for name in ("proj_q", "proj_k", "proj_v", "proj"):
            m.dense(fa + f"/{name}", at + name)
        if i > 0:
            # 1x1 conv over heads (2H->H) -> (H, 2H) kernel + (H,) bias
            m.put("params", fa + "/fuse_attn_kernel",
                  m.take(at + "fuse_attn.weight", lambda v: v[:, :, 0, 0]))
            m.put("params", fa + "/fuse_attn_bias",
                  m.take(at + "fuse_attn.bias"))
        else:
            # stage 0 receives no message; the reference creates (and never
            # uses) fuse_attn there
            m.used.add(at + "fuse_attn.weight")
            m.used.add(at + "fuse_attn.bias")

        m.ln(fd + f"/norm_mt_{i}", d + f"invpt.norm_mts.{i}")
        if i > 0:
            for ti, t in enumerate(tasks):
                m.conv(fd + f"/redu_chan_{i}_{t}",
                       d + f"invpt.redu_chan.{i}.{ti}")
        else:
            for ti in range(T):
                for suf in ("weight", "bias"):
                    m.used.add(d + f"invpt.redu_chan.0.{ti}.{suf}")

    # invpt.norm_mt is created but never applied (invpt.py:492 vs forward)
    for suf in ("weight", "bias"):
        m.used.add(d + f"invpt.norm_mt.{suf}")

    for t in tasks:
        m.conv(f"head_{t}/linear_pred", f"heads.{t}.linear_pred")
    return m


# ---------------------------------------------------------------------------
# apply + verify
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def apply_entries(variables: Dict, mapper: Mapper,
                  skip_flax: Tuple[str, ...] = ()) -> Dict:
    """Write mapper entries into a (copied) variables dict, then verify:
    every flax leaf filled (except ``skip_flax`` prefixes and pos_embed,
    which the caller resamples), every torch key consumed."""
    import jax

    flat_vars = {c: _flatten(variables[c]) for c in variables
                 if c in ("params", "batch_stats")}
    filled = {c: set() for c in flat_vars}
    new = {c: dict(f) for c, f in flat_vars.items()}

    for col, path, value in mapper.entries:
        if col not in new:
            raise KeyError(f"model has no '{col}' collection for {path}")
        if path not in new[col]:
            raise KeyError(f"flax tree has no leaf {col}:{'/'.join(path)}")
        want = new[col][path].shape
        if tuple(value.shape) != tuple(want):
            raise ValueError(
                f"shape mismatch at {col}:{'/'.join(path)}: "
                f"torch gives {value.shape}, model wants {want}")
        new[col][path] = value.astype(np.asarray(new[col][path]).dtype)
        filled[col].add(path)

    unfilled = []
    for col, flat in new.items():
        for path in flat:
            if path in filled[col]:
                continue
            joined = "/".join(path)
            if any(joined.startswith(s) for s in skip_flax):
                continue
            if path[-1] == "pos_embed":
                continue  # caller resamples
            unfilled.append(f"{col}:{joined}")
    unused = [k for k in mapper.sd if k not in mapper.used]
    if unfilled:
        raise ValueError(
            f"{len(unfilled)} model params not filled by the checkpoint "
            f"(first 20): {unfilled[:20]}")
    if unused:
        raise ValueError(
            f"{len(unused)} torch keys not consumed (first 20): {unused[:20]}")

    def unflatten(flat):
        tree: Dict = {}
        for path, v in flat.items():
            node = tree
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = v
        return tree

    out = dict(variables)
    for col in new:
        out[col] = unflatten(new[col])
    return out


def convert_full_checkpoint(sd: Dict[str, np.ndarray], variables: Dict,
                            model_kind: str, tasks: List[str], depth: int,
                            heads: int = None, use_ctr: bool = True) -> Dict:
    """One-call conversion: torch state dict -> full flax variables.

    model_kind: 'TransformerNet' | 'TaskPrompter'. ``heads`` is the
    backbone head count (needed for the qkv column reorder); defaults to
    C // 64 inferred from the qkv weight.
    """
    if heads is None and model_kind != "TaskPrompterSwin":
        qk = [k for k in sd if k.endswith(".attn.qkv.weight")][0]
        heads = sd[qk].shape[1] // 64
    if model_kind == "TransformerNet":
        m = map_transformer_net(sd, tasks, depth, heads)
    elif model_kind == "TaskPrompter":
        m = map_taskprompter_net(sd, tasks, depth, heads, use_ctr=use_ctr)
    elif model_kind == "TaskPrompterSwin":
        m = map_taskprompter_swin(sd, tasks)
    else:
        raise ValueError(f"unknown model kind {model_kind}")
    out = apply_entries(variables, m)
    # pos_embed (resampled to the model's token count)
    pos = np.asarray(sd["backbone.pos_embed"])
    want = np.asarray(out["params"]["backbone"]["pos_embed"]).shape
    out["params"]["backbone"]["pos_embed"] = _resize_pos_embed(
        pos, want).astype(np.float32)
    return out

"""Activation parity vs the reference model math (VERDICT r1 missing #1).

torch-CPU oracles re-implement, line-for-line in semantics (never in
code), the reference forward passes and are driven from the SAME synthetic
torch state dicts used by the converter round-trip tests
(tests/test_convert_torch.py) — so a green test pins BOTH the model
numerics and the torch->Flax converter end-to-end:

  * TaskPrompter-ViT full forward (patch embed -> prompted blocks ->
    cal_task_feature taps -> CTR -> ConvHead -> bilinear resize), oracle
    per TaskPrompter/models/transformers/taskprompter.py:168-279 (block),
    392-421 (forward), 424-487 (decode) and taskprompter_wrapper.py:22-40.
  * InvPT decoder stage attention with cross-stage message passing, oracle
    per InvPT/models/transformers/invpt.py:68-241.
  * FCOS3D target assignment + losses, oracle per
    TaskPrompter/detection_toolbox/det_model.py:858-954, 253-481
    (tests/test_detection.py already covers decode; this adds targets).

All oracles run in float32 eval mode; tolerances reflect f32 accumulation
differences only.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.test_convert_torch import (  # noqa: E402
    DEPTH, E, FIN, GRID, HEADS, NUM_OUT, PX, TAR, TASKS,
    make_taskprompter_sd)

SELECT = (1, 2, 3)            # ViT-T select_list
D = E // HEADS
P = len(TASKS)                # prompt_len == 1


def _t(sd, k):
    return torch.from_numpy(np.asarray(sd[k]))


def _ln(x, sd, key, eps=1e-6):
    return F.layer_norm(x, (x.shape[-1],), _t(sd, key + ".weight"),
                        _t(sd, key + ".bias"), eps)


def _lin(x, sd, key):
    return F.linear(x, _t(sd, key + ".weight"), _t(sd, key + ".bias"))


def _conv(x, sd, key, padding=0):
    return F.conv2d(x, _t(sd, key + ".weight"), _t(sd, key + ".bias"),
                    padding=padding)


def _bn_eval(x, sd, key, eps=1e-5):
    return F.batch_norm(x, _t(sd, key + ".running_mean"),
                        _t(sd, key + ".running_var"),
                        _t(sd, key + ".weight"), _t(sd, key + ".bias"),
                        training=False, eps=eps)


def _gelu(x):
    return F.gelu(x)   # exact erf (torch default)


# ---------------------------------------------------------------------------
# TaskPrompter-ViT torch oracle (chan_nheads=1, prompt_len=1, eval mode)
# ---------------------------------------------------------------------------


def _oracle_block(sd, i, x, prompts):
    """Reference Block.forward + Attention.forward
    (taskprompter.py:195-279), dropout/drop_path inert in eval."""
    pre = f"backbone.blocks.{i}"
    B, N, C = x.shape
    xn = _ln(x, sd, pre + ".norm1")
    pn = _ln(prompts, sd, pre + ".norm1")
    joint = torch.cat([pn, xn], dim=1)
    M = joint.shape[1]
    qkv = _lin(joint, sd, pre + ".attn.qkv")
    qkv = qkv.reshape(B, M, 3, HEADS, D).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    raw_spa = q @ k.transpose(-2, -1)                 # pre-scale scores
    attn = (raw_spa * D ** -0.5).softmax(dim=-1)
    o = (attn @ v).transpose(1, 2).reshape(B, M, C)
    o = _lin(o, sd, pre + ".attn.proj")
    p_attn, x_attn = o[:, :P], o[:, P:]
    # channel pathway (taskprompter.py:217-250); with chan_nheads == 1 the
    # windowing is a no-op: raw_chan = chan_prompts @ xn  (B, P, C)
    chan_prompts = _lin(pn, sd, pre + ".attn.token_trans")
    raw_chan = chan_prompts @ xn                      # (B,P,PX)@(B,PX,C)
    p_attn = p_attn + _lin(chan_prompts, sd, pre + ".attn.token_trans1")
    x = x + x_attn
    prompts = prompts + p_attn
    # shared-MLP half applied separately to each stream (:273-278)
    x = x + _mlp(_ln(x, sd, pre + ".norm2"), sd, pre)
    prompts = prompts + _mlp(_ln(prompts, sd, pre + ".norm2"), sd, pre)
    return x, prompts, (raw_spa, raw_chan)


def _mlp(x, sd, pre):
    h = _gelu(_lin(x, sd, pre + ".mlp.fc1"))
    return _lin(h, sd, pre + ".mlp.fc2")


def _oracle_decode(sd, il, x_tokens, raw):
    """Reference cal_task_feature (taskprompter.py:424-487), chan_nheads=1,
    prompt_len=1, use_ctr=True."""
    raw_spa, raw_chan = raw
    B = x_tokens.shape[0]
    g = GRID
    xm = x_tokens.transpose(1, 2).reshape(B, E, g, g)
    hc = E // HEADS
    task_fea = {}
    for ti, task in enumerate(TASKS):
        aw = raw_spa[:, :, ti, P:].reshape(B, HEADS, g, g)
        parts = [aw[:, h:h + 1] * xm[:, hc * h:hc * (h + 1)]
                 for h in range(HEADS)]
        f = torch.cat(parts, dim=1) + xm
        f = _conv(f, sd, f"backbone.fea_decode_spa.{il}.{task}.0")
        cw = raw_chan[:, ti][:, :, None, None]        # (B,E,1,1)
        fc = cw * xm + xm
        fc = _conv(fc, sd, f"backbone.fea_decode_chan.{il}.{task}.0")
        comb = torch.cat([f, fc], dim=1)
        comb = _conv(comb, sd, f"backbone.fea_fuse.{il}.{task}.0")
        comb = _conv(comb, sd, f"backbone.fea_fuse.{il}.{task}.1", padding=1)
        comb = _bn_eval(comb, sd, f"backbone.fea_fuse.{il}.{task}.2")
        comb = _gelu(comb)
        comb = _conv(comb, sd, f"backbone.fea_fuse.{il}.{task}.4")
        task_fea[task] = comb
    # Cross-Task Reweighting (:477-486)
    new_fea = {}
    for ti, task in enumerate(TASKS):
        w = raw_spa[:, :, ti:ti + 1, :P]              # (B,H,1,T)
        w = _conv(w, sd, f"backbone.ctr_attn_conv.{il}.{task}.0")
        w = _gelu(w)
        w = _conv(w, sd, f"backbone.ctr_attn_conv.{il}.{task}.2")
        new_fea[task] = sum(
            w[:, :, :, k:k + 1] * task_fea[tk]
            for k, tk in enumerate(TASKS))
    return new_fea


def oracle_taskprompter(sd, x_nchw):
    """Full reference forward: TaskPrompter.forward (taskprompter.py:392-421)
    + TaskPrompterWrapper heads (taskprompter_wrapper.py:22-40,
    ConvHead :688-698)."""
    x = F.conv2d(torch.from_numpy(x_nchw),
                 _t(sd, "backbone.patch_embed.proj.weight"),
                 _t(sd, "backbone.patch_embed.proj.bias"), stride=16)
    B = x.shape[0]
    x = x.flatten(2).transpose(1, 2)
    x = x + _t(sd, "backbone.pos_embed")[:, 1:]
    prompts = _t(sd, "backbone.task_prompts")[None].expand(B, -1, -1)
    task_fea = {t: 0 for t in TASKS}
    raw = None
    for i in range(DEPTH):
        x, prompts, raw = _oracle_block(sd, i, x, prompts)
        if i + 1 in SELECT:
            il = int(np.sum(i >= (np.array(SELECT) - 1)) - 1)
            cur = _oracle_decode(sd, il, x, raw)
            for t in TASKS:
                task_fea[t] = task_fea[t] + cur[t]
    x = _ln(x, sd, "backbone.norm")
    cur = _oracle_decode(sd, 3, x, raw)
    out = {}
    for t in TASKS:
        fea = task_fea[t] + cur[t]
        fea = F.interpolate(fea, scale_factor=4, mode="bilinear")
        h = _conv(fea, sd, f"heads.{t}.mt_proj.0", padding=1)
        h = _gelu(_bn_eval(h, sd, f"heads.{t}.mt_proj.1"))
        h = _conv(h, sd, f"heads.{t}.linear_pred")
        out[t] = F.interpolate(h, (64, 64), mode="bilinear")
    return out


class TestTaskPrompterParity:
    def test_full_forward_matches_reference_math(self):
        import jax
        import jax.numpy as jnp
        from mtt_tpu.models.convert_torch import convert_full_checkpoint
        from mtt_tpu.models.wrappers import TaskPrompterNet

        rng = np.random.default_rng(42)
        sd = make_taskprompter_sd(rng)
        x_nchw = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)

        want = oracle_taskprompter(sd, x_nchw)

        model = TaskPrompterNet(
            tasks=TASKS, num_outputs=NUM_OUT,
            backbone_name="TaskPrompter_vitT",
            tar_dim=TAR, final_dim=FIN, use_ctr=True, chan_nheads=1)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((2, 64, 64, 3), jnp.float32))
        conv = convert_full_checkpoint(sd, dict(variables), "TaskPrompter",
                                       list(TASKS), DEPTH, heads=HEADS,
                                       use_ctr=True)
        got = model.apply(
            {"params": conv["params"], "batch_stats": conv["batch_stats"]},
            jnp.asarray(x_nchw.transpose(0, 2, 3, 1)), train=False)
        for t in TASKS:
            w = want[t].numpy().transpose(0, 2, 3, 1)
            g = np.asarray(got[t])
            np.testing.assert_allclose(
                g, w, atol=2e-4, rtol=2e-3,
                err_msg=f"task {t} diverges from reference math")


# ---------------------------------------------------------------------------
# InvPT TransformerNet torch oracle (ViT-T backbone, 3-stage decoder with
# attention message passing, eval mode)
# ---------------------------------------------------------------------------

from tests.test_convert_torch import D0, EMB, PRED, make_invpt_sd  # noqa: E402

DIMS = (D0, D0 // 2, D0 // 4)
KV = (2, 4, 8)
NH = 2                       # decoder heads (spec NUM_HEADS, all stages)


def _convblock(x, sd, key):
    """Reference ConvBlock (transformer_decoder.py:99-125): conv3x3
    bias-free -> BN -> ReLU."""
    x = F.conv2d(x, _t(sd, key + ".conv.weight"), None, padding=1)
    return F.relu(_bn_eval(x, sd, key + ".bn1"))


def _oracle_vit_taps(sd, x_nchw):
    """Reference VisionTransformer.forward_features (vit.py:332-351):
    cls token + pos_embed, taps after select_list blocks + final norm."""
    x = F.conv2d(torch.from_numpy(x_nchw),
                 _t(sd, "backbone.patch_embed.proj.weight"),
                 _t(sd, "backbone.patch_embed.proj.bias"), stride=16)
    B = x.shape[0]
    x = x.flatten(2).transpose(1, 2)
    cls = _t(sd, "backbone.cls_token").expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1) + _t(sd, "backbone.pos_embed")
    taps = []
    for i in range(DEPTH):
        pre = f"backbone.blocks.{i}"
        xn = _ln(x, sd, pre + ".norm1")
        qkv = _lin(xn, sd, pre + ".attn.qkv")
        M = x.shape[1]
        qkv = qkv.reshape(B, M, 3, HEADS, D).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = ((q @ k.transpose(-2, -1)) * D ** -0.5).softmax(dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(B, M, E)
        x = x + _lin(o, sd, pre + ".attn.proj")
        x = x + _mlp(_ln(x, sd, pre + ".norm2"), sd, pre)
        if i + 1 in SELECT:
            taps.append(x[:, 1:])
    taps.append(_ln(x, sd, "backbone.norm")[:, 1:])
    return taps


def _oracle_stage_attention(sd, st, x_list, h, w, message):
    """Reference SelfAttention.forward (invpt.py:168-241) incl. message
    passing; returns (per-task outputs at (h, w), new message)."""
    pre = f"multi_task_decoder.invpt.invpt_stages.{st}.blocks.0.attn"
    T = len(TASKS)
    B = x_list[0].shape[0]
    dim = DIMS[st]
    qs, ks, vs = [], [], []
    for ti in range(T):
        xm = x_list[ti]
        q = F.conv2d(xm, _t(sd, pre + f".conv_proj_q.{ti}.conv.weight"),
                     None, stride=2, padding=1, groups=dim)
        q = _bn_eval(q, sd, pre + f".conv_proj_q.{ti}.bn")
        qs.append(q.flatten(2).transpose(1, 2))
        kv = F.avg_pool2d(xm, KV[st], stride=KV[st], ceil_mode=True)
        kv = kv.flatten(2).transpose(1, 2)
        ks.append(kv)
        vs.append(kv)
    q = _lin(torch.cat(qs, dim=1), sd, pre + ".proj_q")
    k = _lin(torch.cat(ks, dim=1), sd, pre + ".proj_k")
    v = _lin(torch.cat(vs, dim=1), sd, pre + ".proj_v")
    hd = dim // NH
    q = q.reshape(B, -1, NH, hd).transpose(1, 2)
    k = k.reshape(B, -1, NH, hd).transpose(1, 2)
    v = v.reshape(B, -1, NH, hd).transpose(1, 2)
    score = (q @ k.transpose(-2, -1)) * dim ** -0.5   # full-dim scale
    if message is not None:
        sh, sw = h // 4, w // 4
        res = sh * sw
        ups = []
        for ti in range(T):
            m = message[:, :, res * ti:res * (ti + 1), :]
            A = m.shape[-1]
            m = m.permute(0, 1, 3, 2).reshape(B * NH, A, sh, sw)
            m = F.interpolate(m, scale_factor=2, mode="bilinear",
                              align_corners=False)
            m = m.reshape(B, NH, A, 4 * res).permute(0, 1, 3, 2)
            ups.append(m)
        res_score = torch.cat(ups, dim=2)
        both = torch.cat([score, res_score], dim=1)
        score = F.conv2d(both, _t(sd, pre + ".fuse_attn.weight"),
                         _t(sd, pre + ".fuse_attn.bias"))
    new_message = score
    attn = score.softmax(dim=-1)
    o = (attn @ v).transpose(1, 2).reshape(B, -1, dim)
    o = _lin(o, sd, pre + ".proj")
    # split per task, upsample back to (h, w) (invpt.py:299-305)
    sh, sw = h // 2, w // 2
    outs = []
    for ti in range(T):
        m = o[:, sh * sw * ti:sh * sw * (ti + 1)]
        m = m.transpose(1, 2).reshape(B, dim, sh, sw)
        outs.append(F.interpolate(m, size=(h, w), mode="bilinear",
                                  align_corners=False))
    return outs, new_message


def oracle_invpt(sd, x_nchw):
    """Full reference forward: TransformerNet (transformer_net.py:13-38) ->
    TransformerDecoder (transformer_decoder.py:69-98) -> InvPT
    (invpt.py:502-545)."""
    taps = _oracle_vit_taps(sd, x_nchw)
    B = taps[0].shape[0]
    d = "multi_task_decoder."
    g = GRID
    back = []
    for sca in range(4):
        fea = taps[sca].transpose(1, 2).reshape(B, E, g, g)
        if sca == 3:
            x_last = fea
        if sca == 0:
            fea = F.conv_transpose2d(fea, _t(sd, d + "scale_embed.0.weight"),
                                     _t(sd, d + "scale_embed.0.bias"),
                                     stride=2, padding=1, output_padding=1)
        elif sca < 3:
            fea = _conv(fea, sd, d + f"scale_embed.{sca}", padding=1)
        back.append(fea)
    h0 = g // 2
    x = F.interpolate(x_last, size=(h0, h0), mode="bilinear")
    x_list, inter_pred = [], {}
    for t in TASKS:
        f = _convblock(x, sd, d + f"preliminary_decoder.{t}.0")
        f = _convblock(f, sd, d + f"preliminary_decoder.{t}.1")
        ip = _conv(f, sd, d + f"intermediate_head.{t}")
        inter_pred[t] = ip
        x_list.append(_conv(torch.cat([f, ip], dim=1), sd,
                            d + f"invpt.mix_proj.{t}.0"))
    th = h0 * 4 * 2
    message = None
    acc = {t: 0 for t in TASKS}
    for st in range(3):
        if st > 0:
            pe = d + f"invpt.invpt_stages.{st}.patch_embed"
            for ti in range(len(TASKS)):
                xm = F.interpolate(x_list[ti], scale_factor=2,
                                   mode="bilinear", align_corners=False)
                xm = F.conv2d(xm, _t(sd, pe + f".{ti}.proj.1.weight"), None,
                              padding=2, dilation=2)
                xm = F.relu(_bn_eval(xm, sd, pe + f".{ti}.proj.2"))
                xm = F.conv2d(xm, _t(sd, pe + f".{ti}.proj.4.weight"), None,
                              padding=2, dilation=2)
                xm = F.relu(_bn_eval(xm, sd, pe + f".{ti}.proj.5"))
                x_list[ti] = xm + back[2 - st]       # skip (invpt.py:404-412)
        h, w = x_list[0].shape[2:]
        blk = d + f"invpt.invpt_stages.{st}.blocks.0"
        toks = [m.flatten(2).transpose(1, 2) for m in x_list]
        res = torch.cat(toks, dim=1)
        xn = _ln(res, sd, blk + ".norm1")
        xn_list = [xn[:, h * w * ti:h * w * (ti + 1)].transpose(1, 2)
                   .reshape(B, DIMS[st], h, w) for ti in range(len(TASKS))]
        attn_list, message = _oracle_stage_attention(sd, st, xn_list, h, w,
                                                     message)
        attn = torch.cat([m.flatten(2).transpose(1, 2) for m in attn_list],
                         dim=1)
        x = res + attn
        x = x + _mlp(_ln(x, sd, blk + ".norm2"), sd, blk)
        x_list = [x[:, h * w * ti:h * w * (ti + 1)].transpose(1, 2)
                  .reshape(B, DIMS[st], h, w) for ti in range(len(TASKS))]
        # multi-scale aggregation (invpt.py:524-539)
        xc = torch.cat([m.flatten(2).transpose(1, 2) for m in x_list], dim=2)
        xc = _ln(xc, sd, d + f"invpt.norm_mts.{st}")
        xc = xc.transpose(1, 2).reshape(B, DIMS[st] * len(TASKS), h, w)
        for ti, t in enumerate(TASKS):
            tx = xc[:, DIMS[st] * ti:DIMS[st] * (ti + 1)]
            if st > 0:
                tx = _conv(tx, sd, d + f"invpt.redu_chan.{st}.{ti}")
            acc[t] = acc[t] + F.interpolate(tx, size=(th, th),
                                            mode="bilinear")
    out = {}
    for t in TASKS:
        f = _conv(acc[t], sd, d + f"invpt.mt_proj.{t}.0", padding=1)
        f = F.relu(_bn_eval(f, sd, d + f"invpt.mt_proj.{t}.1"))
        f = _conv(f, sd, f"heads.{t}.linear_pred")
        out[t] = F.interpolate(f, (64, 64), mode="bilinear")
    out["inter_preds"] = {
        t: F.interpolate(v, (64, 64), mode="bilinear")
        for t, v in inter_pred.items()}
    return out


class TestInvPTParity:
    def test_full_forward_matches_reference_math(self):
        import jax
        import jax.numpy as jnp
        from mtt_tpu.models.convert_torch import convert_full_checkpoint
        from mtt_tpu.models.wrappers import TransformerNet

        rng = np.random.default_rng(7)
        sd = make_invpt_sd(rng)
        x_nchw = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)

        want = oracle_invpt(sd, x_nchw)

        model = TransformerNet(
            tasks=TASKS, num_outputs=NUM_OUT, backbone_name="vitT",
            embed_dim=EMB, pred_out=PRED, mtt_downsample=2)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((2, 64, 64, 3), jnp.float32))
        conv = convert_full_checkpoint(sd, dict(variables), "TransformerNet",
                                       list(TASKS), DEPTH, heads=HEADS)
        got = model.apply(
            {"params": conv["params"], "batch_stats": conv["batch_stats"]},
            jnp.asarray(x_nchw.transpose(0, 2, 3, 1)), train=False)
        for t in TASKS:
            w = want[t].numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(
                np.asarray(got[t]), w, atol=5e-4, rtol=5e-3,
                err_msg=f"task {t} diverges from reference math")
            wi = want["inter_preds"][t].numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(
                np.asarray(got["inter_preds"][t]), wi, atol=5e-4, rtol=5e-3,
                err_msg=f"inter_pred {t} diverges from reference math")


# ---------------------------------------------------------------------------
# FCOS3D target assignment + loss torch oracle
# (reference det_model.py:754-954 get_targets, :253-481 loss)
# ---------------------------------------------------------------------------

INF = 1e8

DET_CFG = dict(
    num_classes=6,
    strides=(8, 16, 32),
    regress_ranges=((-1, 96), (96, 192), (192, INF)),
    center_sample_radius=1.5,
    centerness_alpha=2.5,
    norm_on_bbox=True,
    pred_bbox2d=True,
    use_direction_classifier=True,
    dir_offset=0.0,
    group_reg_dims=(2, 1, 3, 3, 4),
    code_weight=[1.0, 1.0, 0.2, 1.0, 1.0, 1.0, 5.0, 5.0, 5.0,
                 1.0, 1.0, 1.0, 1.0],
    loss_cls=dict(gamma=2.0, alpha=0.25, loss_weight=5.0),
    loss_bbox=dict(beta=1.0 / 9.0),
)
FEAT_SIZES = ((16, 16), (8, 8), (4, 4))


def _ref_points():
    """get_points/_get_points_single (det_model.py:717-753)."""
    pts, strides_pt = [], []
    for (h, w), s in zip(FEAT_SIZES, DET_CFG["strides"]):
        ys, xs = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                torch.arange(w, dtype=torch.float32),
                                indexing="ij")
        p = torch.stack((xs.reshape(-1) * s, ys.reshape(-1) * s), -1) + s // 2
        pts.append(p)
        strides_pt.append(torch.full((h * w,), float(s)))
    return pts, torch.cat(strides_pt)


def _ref_target_single(gt, points, regress_ranges, strides_pt):
    """_get_target_single (det_model.py:858-954), torch re-derivation."""
    n_pts = points.shape[0]
    n_gts = gt["labels"].shape[0]
    xs, ys = points[:, 0:1], points[:, 1:2]
    cx = gt["centers2d"][None, :, 0]
    cy = gt["centers2d"][None, :, 1]
    dx, dy = xs - cx, ys - cy
    b = gt["bboxes2d"]
    left = xs - b[None, :, 0]
    top = ys - b[None, :, 1]
    right = b[None, :, 2] - xs
    bottom = b[None, :, 3] - ys
    bbox_t = torch.stack((left, top, right, bottom), -1)
    stride = strides_pt * DET_CFG["center_sample_radius"]
    cb = torch.stack((dx + stride[:, None], dy + stride[:, None],
                      stride[:, None] - dx, stride[:, None] - dy), -1)
    inside = cb.min(-1)[0] > 0
    max_reg = bbox_t.max(-1)[0]
    in_range = ((max_reg >= regress_ranges[:, 0:1])
                & (max_reg <= regress_ranges[:, 1:2]))
    dists = torch.sqrt(dx ** 2 + dy ** 2)
    dists = torch.where(inside & in_range, dists,
                        torch.full_like(dists, INF))
    min_dist, idx = dists.min(dim=1)
    labels = gt["labels"][idx].clone()
    labels[min_dist == INF] = DET_CFG["num_classes"]
    r = torch.arange(n_pts)
    sel_dx, sel_dy = dx[r, idx], dy[r, idx]
    tgt3d = torch.cat([sel_dx[:, None], sel_dy[:, None],
                       gt["depths"][idx][:, None],
                       gt["boxes3d"][idx][:, 3:]], dim=1)
    tgt3d = torch.cat([tgt3d, bbox_t[r, idx]], dim=1)    # pred_bbox2d
    rel = torch.sqrt(sel_dx ** 2 + sel_dy ** 2) / (1.414 * strides_pt)
    ctr = torch.exp(-DET_CFG["centerness_alpha"] * rel)
    return labels, tgt3d, ctr


def oracle_fcos3d_loss(preds_nhwc, gt_list):
    """Reference loss (det_model.py:330-481) on per-image UNPADDED GT;
    label-less images are removed from every term as the reference does
    (det_model.py:284-299)."""
    pts, strides_pt = _ref_points()
    num_points = [p.shape[0] for p in pts]
    cat_pts = torch.cat(pts)
    rr = torch.cat([torch.tensor(DET_CFG["regress_ranges"][i])
                    [None].expand(num_points[i], 2)
                    for i in range(3)]).float()
    labeled = [g for g in gt_list if g["labels"].numel() > 0]
    per_img = [_ref_target_single(g, cat_pts, rr, strides_pt)
               for g in labeled]
    n_img = len(labeled)
    # split per level, re-concat over images (det_model.py:813-855)
    lvl_labels, lvl_tgt, lvl_ctr = [], [], []
    ofs = np.cumsum([0] + num_points)
    for i in range(3):
        sl = slice(ofs[i], ofs[i + 1])
        lab = torch.cat([p[0][sl] for p in per_img])
        tgt = torch.cat([p[1][sl] for p in per_img]).clone()
        ctr = torch.cat([p[2][sl] for p in per_img])
        tgt[:, :2] /= DET_CFG["strides"][i]              # norm_on_bbox
        tgt[:, -4:] /= DET_CFG["strides"][i]
        lvl_labels.append(lab)
        lvl_tgt.append(tgt)
        lvl_ctr.append(ctr)
    # flatten preds level-major, dropping label-less images
    keep = [i for i, g in enumerate(gt_list) if g["labels"].numel() > 0]
    cls_s, bbox_s, dir_s, ctr_s = [], [], [], []
    for lv in range(3):
        cls, bbox, dirp, ctn = [torch.from_numpy(a[lv])[keep]
                                for a in preds_nhwc]
        cls_s.append(cls.reshape(-1, DET_CFG["num_classes"]))
        bbox_s.append(bbox.reshape(-1, 13))
        dir_s.append(dirp.reshape(-1, 6))
        ctr_s.append(ctn.reshape(-1))
    cls_f = torch.cat(cls_s)
    bbox_f = torch.cat(bbox_s)
    dir_f = torch.cat(dir_s)
    ctr_f = torch.cat(ctr_s)
    labels_f = torch.cat(lvl_labels)
    tgt_f = torch.cat(lvl_tgt)
    ctr_tgt_f = torch.cat(lvl_ctr)

    nc = DET_CFG["num_classes"]
    pos = ((labels_f >= 0) & (labels_f < nc)).nonzero().reshape(-1)
    num_pos = len(pos)
    out = {}
    # mmdet sigmoid focal loss (det_losses.py:178-231)
    onehot = F.one_hot(labels_f.long(), nc + 1)[:, :nc].float()
    p = torch.sigmoid(cls_f)
    pt = p * onehot + (1 - p) * (1 - onehot)
    a = DET_CFG["loss_cls"]["alpha"]
    focal = (a * onehot + (1 - a) * (1 - onehot)) \
        * (1 - pt) ** DET_CFG["loss_cls"]["gamma"]
    ce = F.binary_cross_entropy_with_logits(cls_f, onehot, reduction="none")
    out["loss_cls"] = DET_CFG["loss_cls"]["loss_weight"] \
        * (focal * ce).sum() / (num_pos + n_img)

    pb, tb = bbox_f[pos], tgt_f[pos]
    pc, tc = ctr_f[pos], ctr_tgt_f[pos]
    pd = dir_f[pos]
    cw = torch.tensor(DET_CFG["code_weight"])
    # sin-difference on rot channels (det_model.py:145-168)
    sp = torch.sin(pb[:, 6:9]) * torch.cos(tb[:, 6:9])
    st = torch.cos(pb[:, 6:9]) * torch.sin(tb[:, 6:9])
    pb = torch.cat([pb[:, :6], sp, pb[:, 9:]], -1)
    tb = torch.cat([tb[:, :6], st, tb[:, 9:]], -1)

    beta = DET_CFG["loss_bbox"]["beta"]

    def sl1(sl):
        d = torch.abs(pb[:, sl] - tb[:, sl])
        ls = torch.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
        return (ls * cw[sl]).sum() / num_pos

    out["loss_offset"] = sl1(slice(0, 2))
    out["loss_depth"] = sl1(slice(2, 3))
    out["loss_size"] = sl1(slice(3, 6))
    out["loss_rotsin"] = sl1(slice(6, 9))
    out["loss_bbox2d"] = sl1(slice(9, 13))
    # direction CE, 3 angles (det_model.py:171-204,436-444)
    dl = 0.0
    for rot in range(3):
        gtr = tb_rot = tgt_f[pos][:, 6 + rot]
        off = torch.remainder(tb_rot - DET_CFG["dir_offset"], 2 * np.pi)
        bins = torch.clamp(torch.floor(off / np.pi).long(), 0, 1)
        dl = dl + F.cross_entropy(pd[:, rot * 2:(rot + 1) * 2], bins,
                                  reduction="sum") / num_pos
    out["loss_dir"] = dl
    out["loss_centerness"] = F.binary_cross_entropy_with_logits(
        pc, tc, reduction="mean")
    return out


class TestFCOS3DTargetLossParity:
    def test_loss_matches_reference_math(self):
        import jax.numpy as jnp
        from mtt_tpu.detection.det_model import detection_loss

        rng = np.random.default_rng(3)
        B, M = 2, 6
        n_valid = [4, 2]
        img = 128.0

        # padded GT arrays (ours) + unpadded torch lists (oracle)
        cx = rng.uniform(8, img - 8, (B, M)).astype(np.float32)
        cy = rng.uniform(8, img - 8, (B, M)).astype(np.float32)
        w2 = rng.uniform(8, 60, (B, M)).astype(np.float32)
        h2 = rng.uniform(8, 60, (B, M)).astype(np.float32)
        bboxes2d = np.stack([cx - w2 / 2, cy - h2 / 2,
                             cx + w2 / 2, cy + h2 / 2], -1)
        centers2d = np.stack([cx + rng.normal(0, 2, (B, M)),
                              cy + rng.normal(0, 2, (B, M))],
                             -1).astype(np.float32)
        depths = rng.uniform(3, 50, (B, M)).astype(np.float32)
        boxes3d = np.concatenate([
            rng.normal(0, 10, (B, M, 3)),
            rng.uniform(0.5, 4, (B, M, 3)),
            rng.uniform(-np.pi, np.pi, (B, M, 3))], -1).astype(np.float32)
        labels = rng.integers(0, 6, (B, M)).astype(np.int32)
        valid = np.zeros((B, M), np.float32)
        for i, n in enumerate(n_valid):
            valid[i, :n] = 1.0

        preds = []
        for maker, c in ((0, 6), (1, 13), (2, 6), (3, 1)):
            preds.append([rng.normal(0, 1, (B, h, w, c)).astype(np.float32)
                          for (h, w) in FEAT_SIZES])
        head_out = tuple(tuple(jnp.asarray(x) for x in lst)
                         for lst in preds)
        batch = {"det_bboxes2d": jnp.asarray(bboxes2d),
                 "det_labels": jnp.asarray(labels),
                 "det_boxes3d": jnp.asarray(boxes3d),
                 "det_centers2d": jnp.asarray(centers2d),
                 "det_depths": jnp.asarray(depths),
                 "det_valid": jnp.asarray(valid)}
        total, comps = detection_loss(head_out, batch, DET_CFG,
                                      DET_CFG["strides"])

        gt_list = []
        for i in range(B):
            n = n_valid[i]
            gt_list.append({
                "bboxes2d": torch.from_numpy(bboxes2d[i, :n]),
                "labels": torch.from_numpy(labels[i, :n]).long(),
                "boxes3d": torch.from_numpy(boxes3d[i, :n]),
                "centers2d": torch.from_numpy(centers2d[i, :n]),
                "depths": torch.from_numpy(depths[i, :n])})
        want = oracle_fcos3d_loss(preds, gt_list)
        for k, v in want.items():
            np.testing.assert_allclose(
                float(comps[k]), float(v), rtol=2e-4, atol=1e-5,
                err_msg=f"{k} diverges from reference math")
        np.testing.assert_allclose(
            float(total), float(sum(v for v in want.values())),
            rtol=2e-4)

    def test_labelless_image_excluded(self):
        """An image with zero valid boxes must contribute nothing to any
        loss term (the reference removes it from the batch,
        det_model.py:284-299)."""
        import jax.numpy as jnp
        from mtt_tpu.detection.det_model import detection_loss

        rng = np.random.default_rng(5)
        B, M = 2, 4
        preds = []
        for c in (6, 13, 6, 1):
            preds.append([rng.normal(0, 1, (B, h, w, c)).astype(np.float32)
                          for (h, w) in FEAT_SIZES])
        head_out = tuple(tuple(jnp.asarray(x) for x in lst)
                         for lst in preds)

        def batch_for(valid):
            return {"det_bboxes2d": jnp.asarray(
                        rng.uniform(10, 100, (B, M, 4)).astype(np.float32)),
                    "det_labels": jnp.zeros((B, M), jnp.int32),
                    "det_boxes3d": jnp.asarray(
                        rng.normal(0, 5, (B, M, 9)).astype(np.float32)),
                    "det_centers2d": jnp.full((B, M, 2), 1e6, jnp.float32),
                    "det_depths": jnp.ones((B, M), jnp.float32),
                    "det_valid": jnp.asarray(valid)}

        # no centers near any point -> zero positives everywhere; the only
        # nonzero term is cls; with image 1 label-less its rows must drop
        v = np.zeros((B, M), np.float32)
        v[0, :2] = 1.0
        _, comps = detection_loss(head_out, batch_for(v), DET_CFG,
                                  DET_CFG["strides"])
        # recompute oracle-style: only image 0's cls rows, avg = 0 pos + 1
        want = 0.0
        nc = DET_CFG["num_classes"]
        for lv in range(3):
            cls = torch.from_numpy(preds[0][lv][0:1]).reshape(-1, nc)
            p = torch.sigmoid(cls)
            a = DET_CFG["loss_cls"]["alpha"]
            focal = (1 - a) * p ** DET_CFG["loss_cls"]["gamma"]
            ce = F.binary_cross_entropy_with_logits(
                cls, torch.zeros_like(cls), reduction="none")
            want = want + (focal * ce).sum()
        want = DET_CFG["loss_cls"]["loss_weight"] * want / 1.0
        np.testing.assert_allclose(float(comps["loss_cls"]), float(want),
                                   rtol=2e-4)


# ---------------------------------------------------------------------------
# TaskPrompter-Swin torch oracle (chan_nheads=1, prompt_len=1, eval mode):
# prompted window attention with relative-position bias and shifted-window
# masks (taskprompter_swin.py:167-212, 310-404), channel pathway
# (:371-391), PatchMerging with attention-map downsampling (:430-472),
# POST-merge per-stage decode (:674-774) and multi-scale fuse (:705-716).
# ---------------------------------------------------------------------------

from tests.test_convert_swin import (CHAN as S_CHAN, FIN as S_FIN,  # noqa: E402
                                     TAR as S_TAR, TASKS as S_TASKS,
                                     E as S_E, HEADS as S_HEADS,
                                     WINDOW as S_WINDOW, make_swin_sd)

S_DEPTHS = (2, 2, 1, 1)       # depth-2 stages exercise the shifted blocks


def _swin_win_part(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def _swin_win_rev(wins, ws, H, W):
    B = wins.shape[0] // ((H // ws) * (W // ws))
    x = wins.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _swin_rel_index(ws):
    coords = torch.stack(torch.meshgrid(
        torch.arange(ws), torch.arange(ws), indexing="ij")).flatten(1)
    rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0).clone()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _swin_mask(H, W, ws, shift):
    img = torch.zeros((1, H, W, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    mw = _swin_win_part(img, ws).view(-1, ws * ws)
    m = mw.unsqueeze(1) - mw.unsqueeze(2)
    return m.masked_fill(m != 0, -100.0).masked_fill(m == 0, 0.0)


def _swin_mlp(x, sd, pre):
    return _lin(_gelu(_lin(x, sd, pre + ".mlp.fc1")), sd, pre + ".mlp.fc2")


def _oracle_swin_block(sd, pre, x, prompts, H, W, nh, window, shift,
                      last_block):
    B, L, C = x.shape
    P = prompts.shape[1]
    ws = min(window, H, W)
    if min(H, W) <= window:
        shift = 0
    Dh = C // nh
    N = ws * ws

    ori = prompts
    spa_p = _ln(prompts, sd, pre + ".norm1", eps=1e-5)
    chan_p = _lin(prompts, sd, pre + ".token_trans")

    shortcut = x
    xn = _ln(x, sd, pre + ".norm1", eps=1e-5).view(B, H, W, C)
    if shift > 0:
        xn = torch.roll(xn, (-shift, -shift), dims=(1, 2))
    wins = _swin_win_part(xn, ws)
    nW = wins.shape[0] // B
    pw = spa_p[:, None, :, :].expand(-1, nW, -1, -1).reshape(-1, P, C)
    joint = torch.cat([pw, wins], dim=1)
    qkv = _lin(joint, sd, pre + ".attn.qkv") \
        .reshape(-1, P + N, 3, nh, Dh).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    raw_attn = q @ k.transpose(-2, -1)              # pre-scale, pre-bias
    attn = raw_attn * (Dh ** -0.5)
    rpbt = _t(sd, pre + ".attn.relative_position_bias_table")
    bias = rpbt[_swin_rel_index(ws).view(-1)].view(N, N, -1).permute(2, 0, 1)
    attn[:, :, P:, P:] = attn[:, :, P:, P:] + bias.unsqueeze(0)
    if shift > 0:
        m = _swin_mask(H, W, ws, shift)
        attn = attn.view(B, nW, nh, P + N, P + N)
        attn[:, :, :, P:, P:] = attn[:, :, :, P:, P:] \
            + m.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, nh, P + N, P + N)
    probs = attn.softmax(-1)
    out = (probs @ v).transpose(1, 2).reshape(-1, P + N, C)
    out = _lin(out, sd, pre + ".attn.proj")
    spa_p_out = out[:, :P].reshape(B, nW, P, C).mean(dim=1)
    xw = _swin_win_rev(out[:, P:].view(-1, ws, ws, C), ws, H, W)

    rp = raw_attn[:, :, :P, P:]                     # (B*nW, nh, P, N)
    rp = rp.view(B, H // ws, W // ws, nh, P, ws, ws)
    spa_map = rp.permute(0, 3, 4, 1, 5, 2, 6).reshape(B, nh, P, H, W)
    if shift > 0:
        xw = torch.roll(xw, (shift, shift), dims=(1, 2))
        spa_map = torch.roll(spa_map, (shift, shift), dims=(3, 4))
    x_attn = xw.reshape(B, L, C)

    # channel pathway on the pre-residual window-attention output
    qc = _lin(chan_p, sd, pre + ".chan_q")
    kv = _lin(x_attn.permute(0, 2, 1), sd, pre + ".chan_kv") \
        .reshape(B, C, 2, -1)
    kc, vc = kv[:, :, 0, :], kv[:, :, 1, :]
    raw_chan = qc @ kc.transpose(-2, -1)            # (B, P, C)
    cattn = (raw_chan * (qc.shape[-1] ** -0.5)).softmax(-1)
    chan_x = cattn @ vc

    x = shortcut + x_attn
    x = x + _swin_mlp(_ln(x, sd, pre + ".norm2", eps=1e-5), sd, pre)
    prompts_new = spa_p_out
    if not last_block:
        cp = _lin(chan_x, sd, pre + ".chan_proj")
        prompts_new = prompts_new + _lin(cp, sd, pre + ".token_trans1")
        prompts_new = ori + prompts_new
        prompts_new = prompts_new + _swin_mlp(
            _ln(prompts_new, sd, pre + ".norm2", eps=1e-5), sd, pre)
    return x, prompts_new, (spa_map, raw_chan[..., None, None])


def _oracle_swin_merge(sd, pre, x, prompts, raw, H, W):
    B, L, C = x.shape
    xm = x.view(B, H, W, C)
    xm = torch.cat([xm[:, 0::2, 0::2], xm[:, 1::2, 0::2],
                    xm[:, 0::2, 1::2], xm[:, 1::2, 1::2]], -1) \
        .view(B, -1, 4 * C)
    xm = _ln(xm, sd, pre + ".norm", eps=1e-5)
    xm = F.linear(xm, _t(sd, pre + ".reduction.weight"))
    spa, chan = raw
    _, nh, P, _, _ = spa.shape
    spa = F.conv2d(spa.reshape(B, nh * P, H, W),
                   _t(sd, pre + ".spa_attn_ds.weight"),
                   _t(sd, pre + ".spa_attn_ds.bias"), stride=2, padding=1)
    spa = spa.reshape(B, nh, P, H // 2, W // 2)
    chan = chan.transpose(2, -1)
    chan = F.linear(chan, _t(sd, pre + ".process_chan_attn.weight"))
    chan = chan.transpose(2, -1)
    prompts = F.linear(prompts, _t(sd, pre + ".task_prompts_up.weight"))
    return xm, prompts, (spa, chan)


def _oracle_swin_decode(sd, il, x, raw, H, W, tasks):
    B, L, C = x.shape
    xm = x.transpose(1, 2).reshape(B, C, H, W)
    spa, chan = raw
    out = {}
    for ti, t in enumerate(tasks):
        aw = spa[:, :, ti:ti + 1, :, :].reshape(B, -1, H, W)
        nheads = aw.shape[1]
        hc = C // nheads
        parts = [aw[:, h:h + 1] * xm[:, hc * h:hc * (h + 1)]
                 for h in range(nheads)]
        f = torch.cat(parts, dim=1) + xm
        if t != "3ddet":
            f = F.interpolate(f, scale_factor=2, mode="bilinear",
                              align_corners=False)
        f = _conv(f, sd, f"backbone.fea_decode_spa.{il}.{t}.0")
        cw = chan[:, ti][:, :, 0, 0]                 # (B, C)
        fc = cw[:, :, None, None] * xm + xm
        if t != "3ddet":
            fc = F.interpolate(fc, scale_factor=2, mode="bilinear",
                               align_corners=False)
        fc = _conv(fc, sd, f"backbone.fea_decode_chan.{il}.{t}.0")
        comb = torch.cat([f, fc], dim=1)
        comb = _conv(comb, sd, f"backbone.fea_fuse.{il}.{t}.0")
        comb = _conv(comb, sd, f"backbone.fea_fuse.{il}.{t}.1", padding=1)
        comb = _bn_eval(comb, sd, f"backbone.fea_fuse.{il}.{t}.2")
        comb = _gelu(comb)
        out[t] = _conv(comb, sd, f"backbone.fea_fuse.{il}.{t}.4", padding=1)
    return out


def oracle_swin_backbone(sd, x_nchw, depths):
    x = F.conv2d(torch.from_numpy(x_nchw),
                 _t(sd, "backbone.patch_embed.proj.weight"),
                 _t(sd, "backbone.patch_embed.proj.bias"), stride=4)
    B, E, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)
    x = _ln(x, sd, "backbone.patch_embed.norm", eps=1e-5)
    prompts = _t(sd, "backbone.task_prompts")[None].expand(B, -1, -1)
    res = (gh, gw)
    raw = None
    task_fea = {t: [] for t in S_TASKS}
    for il in range(4):
        C = E * 2 ** il
        for d in range(depths[il]):
            x, prompts, raw = _oracle_swin_block(
                sd, f"backbone.layers.{il}.blocks.{d}", x, prompts,
                res[0], res[1], S_HEADS[il], S_WINDOW,
                0 if d % 2 == 0 else S_WINDOW // 2,
                il == 3 and d == depths[il] - 1)
        if il < 3:
            x, prompts, raw = _oracle_swin_merge(
                sd, f"backbone.layers.{il}.downsample", x, prompts, raw,
                res[0], res[1])
            res = (res[0] // 2, res[1] // 2)
            fea = _oracle_swin_decode(sd, il, x, raw, res[0], res[1],
                                      S_TASKS)
        else:
            x = _ln(x, sd, "backbone.norm", eps=1e-5)
            fea = _oracle_swin_decode(sd, il, x, raw, res[0], res[1],
                                      S_TASKS)
        for t in S_TASKS:
            task_fea[t].append(fea[t])
    out = {}
    for t in S_TASKS:
        if t == "3ddet":
            out[t] = task_fea[t]
            continue
        tgt = task_fea[t][0].shape[-2:]
        s = sum(F.interpolate(f, tgt, mode="bilinear")
                for f in task_fea[t])
        out[t] = _conv(s, sd, f"backbone.multi_scale_fuse.{t}", padding=1)
    return out


class TestSwinParity:
    def test_full_backbone_matches_reference_math(self):
        import jax
        import jax.numpy as jnp
        from mtt_tpu.models.convert_torch import (apply_entries,
                                                  map_taskprompter_swin)
        from mtt_tpu.models.taskprompter_swin import TaskPrompterSwin
        from mtt_tpu.models.wrappers import TaskPrompterSwinNet
        from tests.test_convert_swin import NUM_OUT as S_NUM_OUT
        from tests.test_cs3d_e2e import cs3d_tiny_config

        rng = np.random.default_rng(11)
        sd = make_swin_sd(rng, depths=S_DEPTHS)
        x_nchw = rng.normal(size=(2, 3, 64, 128)).astype(np.float32) * 0.5

        want = oracle_swin_backbone(sd, x_nchw, S_DEPTHS)

        p = cs3d_tiny_config()
        net = TaskPrompterSwinNet(
            tasks=S_TASKS, num_outputs=S_NUM_OUT, tar_dim=S_TAR,
            final_dim=S_FIN, chan_embed_dim=S_CHAN, det_cfg=p.det_cfg,
            target_size=(32, 64), embed_dim=S_E, depths=S_DEPTHS,
            num_heads=S_HEADS, window_size=S_WINDOW)
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 128, 3), jnp.float32))
        m = map_taskprompter_swin(
            sd, list(S_TASKS), depths=S_DEPTHS, num_outs=5, stacked_convs=3,
            cls_branch=(16, 8), reg_branch=((16,),) * 5, dir_branch=(16,),
            centerness_branch=(16,), scale_dim=4, n_fpn_in=4)
        conv = apply_entries(dict(variables), m)

        backbone = TaskPrompterSwin(
            tasks=S_TASKS, img_size=(64, 128), patch_size=4,
            embed_dim=S_E, depths=S_DEPTHS, num_heads=S_HEADS,
            window_size=S_WINDOW, chan_embed_dim=S_CHAN, tar_dim=S_TAR,
            final_dim=S_FIN, drop_path_rate=0.0)
        got = backbone.apply(
            {"params": conv["params"]["backbone"],
             "batch_stats": conv["batch_stats"]["backbone"]},
            jnp.asarray(x_nchw.transpose(0, 2, 3, 1)), train=False)

        for t in S_TASKS:
            if t == "3ddet":
                for lvl in range(4):
                    w = want[t][lvl].numpy().transpose(0, 2, 3, 1)
                    np.testing.assert_allclose(
                        np.asarray(got[t][lvl]), w, atol=3e-4, rtol=3e-3,
                        err_msg=f"3ddet level {lvl} diverges")
            else:
                w = want[t].numpy().transpose(0, 2, 3, 1)
                np.testing.assert_allclose(
                    np.asarray(got[t]), w, atol=3e-4, rtol=3e-3,
                    err_msg=f"task {t} diverges from reference math")

"""InvPT inverted-pyramid UP-Transformer multi-task decoder (TPU-native).

Re-design of the reference decoder (InvPT/models/transformers/invpt.py:19-545
and transformer_decoder.py:18-131): three stages at rising resolution run
shared cross-task self-attention over the concatenation of all task token
maps, with the previous stage's attention matrix bilinearly upsampled and
fused into the current scores ("attention message passing",
invpt.py:207-230).

TPU-first choices:
  * tasks ride a leading stacked axis (B, T, H, W, C) so per-task convs
    become batched convs and the cross-task concat is a reshape, not a loop;
  * attention logits/softmax in fp32 on the MXU, bf16 elsewhere;
  * the kv length is constant across stages (stride 2/4/8 against resolution
    x1/x2/x4 => always an 8x8 grid per task), which keeps the message tensor
    shape static and jit-friendly.

Config constants mirror the reference spec (transformer_decoder.py:28-47):
DIM_EMBED [D, D/2, D/4] with D = embed_dim + PRED_OUT_NUM_CONSTANT, 2 heads,
q dw-conv stride 2, kv avg-pool strides (2, 4, 8).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtt_tpu.models.layers import (ConvBNAct, DropPath, FusedLN, Mlp,
                                   interpolate, trunc_normal, upsample2x)


class _MtProjParams(nn.Module):
    """ConvBNAct-layout parameters (conv kernel only — use_bias=False —
    plus nn.BatchNorm scale/bias and running-stat Variables) without
    computing, so the mt_proj tail can branch between the dense train
    path and the factored eval path with an identical checkpoint tree."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        class _K(nn.Module):
            features: int
            in_features: int

            @nn.compact
            def __call__(self):
                return self.param(
                    "kernel", nn.initializers.lecun_normal(),
                    (3, 3, self.in_features, self.features))

        from mtt_tpu.models.heads import _BNParams
        k = _K(self.features, self.in_features, name="conv")()
        gamma, beta, mean, var = _BNParams(self.features, name="bn")()
        return k, gamma, beta, mean, var


def _flatten_tasks(x):  # (B,T,H,W,C) -> (B, T*H*W, C)
    B, T, H, W, C = x.shape
    return x.reshape(B, T * H * W, C)


def _unflatten_tasks(x, T, H, W):  # (B, T*H*W, C) -> (B,T,H,W,C)
    B, _, C = x.shape
    return x.reshape(B, T, H, W, C)


class TaskStackConvBN(nn.Module):
    """Independent conv per task + BN over a stacked (B,T,H,W,C) tensor.

    TPU-native formulation: the task axis is merged into channels and the
    per-task convolutions become ONE grouped convolution
    (feature_group_count = T, or T*C when ``depthwise``), which XLA tiles
    onto the MXU as a single large op instead of T small ones. BN over the
    merged T*C channel axis is exactly per-task BN (per-channel statistics
    and affine parameters).
    """
    features: int                       # output channels PER TASK
    kernel_size: Tuple[int, int] = (3, 3)
    dilation: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    depthwise: bool = False
    merged_io: bool = False   # in/out already (B, H, W, T*C): back-to-back
    tasks: int = 0            # stacks skip the cancelling transpose pairs
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.merged_io:
            B, H, W, TC = x.shape
            T = self.tasks
            C = TC // T
            xm = x
        else:
            B, T, H, W, C = x.shape
            xm = x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, T * C)
        groups = T * C if self.depthwise else T
        # torch-style symmetric padding d*(k-1)/2: identical to SAME at
        # stride 1, but for the stride-2 q conv (invpt.py:124-137, pad=1)
        # XLA SAME would pad (0, 1) on even inputs and shift every window
        # by one pixel vs the reference
        pad = [(d * (k - 1) // 2,) * 2
               for k, d in zip(self.kernel_size, self.dilation)]
        xm = nn.Conv(self.features * T, self.kernel_size, strides=self.strides,
                     kernel_dilation=self.dilation, padding=pad,
                     feature_group_count=groups, use_bias=False,
                     dtype=self.dtype, name="conv")(xm)
        xm = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype, name="bn")(xm)
        if self.merged_io:
            return xm
        Ho, Wo = xm.shape[1:3]
        return xm.reshape(B, Ho, Wo, T, self.features).transpose(0, 3, 1, 2, 4)


class UpEmbed(nn.Module):
    """Per-task 2x upsample + two dilated 3x3 conv-BN-ReLU stacks
    (reference UpEmbed, invpt.py:19-43: kernel 3, dilation 2, stride 1)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        B, T, H, W, C = x.shape
        x = x.reshape(B * T, H, W, C)
        x = upsample2x(x)
        # one merge/unmerge pair around BOTH conv stacks: the merged
        # (B, H, W, T*C) layout passes straight through (relu is
        # layout-agnostic), deleting two cancelling 47 MB transposes
        x = x.reshape(B, T, 2 * H, 2 * W, C).transpose(0, 2, 3, 1, 4) \
            .reshape(B, 2 * H, 2 * W, T * C)
        x = TaskStackConvBN(self.features, (3, 3), dilation=(2, 2),
                            merged_io=True, tasks=T,
                            dtype=self.dtype, name="proj1")(x, train=train)
        x = nn.relu(x)
        x = TaskStackConvBN(self.features, (3, 3), dilation=(2, 2),
                            merged_io=True, tasks=T,
                            dtype=self.dtype, name="proj2")(x, train=train)
        x = nn.relu(x)
        return x.reshape(B, 2 * H, 2 * W, T, self.features) \
            .transpose(0, 3, 1, 2, 4)


class CrossTaskAttention(nn.Module):
    """Shared self-attention over all tasks' tokens with message passing.

    Reference SelfAttention (invpt.py:68-241): q via per-task depthwise conv
    stride 2 + BN, k/v via per-task avg-pool stride ``kv_stride``; attention
    scale is dim**-0.5 on the *full* (not per-head) dim (invpt.py:92);
    previous-stage scores upsampled 2x per task on the query grid and fused
    with a 1x1 conv over the stacked head axis (invpt.py:207-230).
    """
    dim: int
    num_heads: int = 2
    kv_stride: int = 2
    q_stride: int = 2
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, message: Optional[jax.Array], *, train: bool = False):
        B, T, H, W, C = x.shape
        qh, qw = H // self.q_stride, W // self.q_stride
        kh, kw = H // self.kv_stride, W // self.kv_stride

        # q: per-task depthwise conv stride 2 + BN (invpt.py:124-137)
        q_map = TaskStackConvBN(C, (3, 3), strides=(2, 2), depthwise=True,
                                dtype=self.dtype, name="conv_proj_q")(x, train=train)
        q = q_map.reshape(B, T * qh * qw, C)

        # k/v: per-task average pooling (invpt.py:139-149)
        kv_map = nn.avg_pool(x.reshape(B * T, H, W, C),
                             (self.kv_stride, self.kv_stride),
                             (self.kv_stride, self.kv_stride))
        kv = kv_map.reshape(B, T * kh * kw, C)

        q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="proj_q")(q)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="proj_k")(kv)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="proj_v")(kv)

        Hn, D = self.num_heads, self.dim // self.num_heads
        Lq, Lk = q.shape[1], k.shape[1]
        qh_ = q.reshape(B, Lq, Hn, D).transpose(0, 2, 1, 3)
        kh_ = k.reshape(B, Lk, Hn, D).transpose(0, 2, 1, 3)
        vh_ = v.reshape(B, Lk, Hn, D).transpose(0, 2, 1, 3)

        scale = self.dim ** -0.5  # full-dim scale, invpt.py:92

        # attention message passing from the previous stage (invpt.py:207-230):
        # the prev-stage scores are bilinearly upsampled 2x on each task's
        # query grid, then fused with the current scores by a 1x1 conv over
        # the stacked head axis — computed inside the fused Pallas kernel
        # (mtt_tpu/kernels/invpt_attention.py) so raw scores and softmax
        # probabilities never round-trip to HBM.
        w = b = prev = None
        if message is not None:
            ph, pw = qh // 2, qw // 2  # previous stage query grid per task
            prev = message.reshape(B * Hn * T, ph, pw, Lk)
            prev = interpolate(prev, (qh, qw))
            prev = prev.reshape(B, Hn, T * qh * qw, Lk)
            w = self.param("fuse_attn_kernel", trunc_normal(0.02), (Hn, 2 * Hn))
            b = self.param("fuse_attn_bias", nn.initializers.zeros, (Hn,))

        from mtt_tpu.kernels.invpt_attention import invpt_fused_attention
        out, new_message = invpt_fused_attention(qh_, kh_, vh_, prev, w, b,
                                                 scale)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

        # upsample attention output back to block resolution (invpt.py:299-305)
        out = out.reshape(B * T, qh, qw, self.dim)
        out = interpolate(out, (H, W))
        out = out.reshape(B, T, H, W, self.dim)
        return out, new_message


class InvPTBlock(nn.Module):
    """norm -> cross-task attention -> residual -> shared MLP
    (reference InvPTBlock, invpt.py:243-312)."""
    dim: int
    num_heads: int = 2
    kv_stride: int = 2
    mlp_ratio: float = 4.0
    drop_path: float = 0.15
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, message, *, train: bool = False):
        B, T, H, W, C = x.shape
        h = FusedLN(name="norm1")(x)
        attn_out, new_message = CrossTaskAttention(
            self.dim, self.num_heads, self.kv_stride, dtype=self.dtype,
            name="attn")(h, message, train=train)
        x = x + DropPath(self.drop_path, name="dp1")(attn_out, deterministic=not train)
        h = FusedLN(name="norm2")(x)
        h = Mlp(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")(h)
        x = x + DropPath(self.drop_path, name="dp2")(h, deterministic=not train)
        return x, new_message


class InvPTDecoder(nn.Module):
    """Full decoder: preamble (preliminary decoders + intermediate heads) +
    3 UP-Transformer stages + multi-scale aggregation.

    Mirrors TransformerDecoder (transformer_decoder.py:18-98) and InvPT
    (invpt.py:419-545). Returns (task_features, intermediate_preds):
      task_features[t]: (B, 8*h0, 8*w0, D) where h0 = grid/mtt_downsample
      intermediate_preds[t]: (B, h0, w0, NUM_OUTPUT[t])
    """
    tasks: Sequence[str]
    num_outputs: Dict[str, int]
    embed_dim: int = 512            # p.embed_dim
    pred_out: int = 64              # p.PRED_OUT_NUM_CONSTANT
    backbone_dim: int = 1024
    mtt_downsample: int = 2         # p.mtt_resolution_downsample_rate
    num_heads: int = 2
    drop_path: float = 0.15
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, taps: List[jax.Array], grid: Tuple[int, int], *,
                 train: bool = False, head_params=None):
        T = len(self.tasks)
        gh, gw = grid
        B = taps[0].shape[0]
        D = self.embed_dim + self.pred_out         # 576 for PASCAL config
        dims = (D, D // 2, D // 4)
        kv_strides = (2, 4, 8)

        maps = [t.reshape(B, gh, gw, t.shape[-1]) for t in taps]

        # scale_embed skip adapters (transformer_decoder.py:63-67).
        # back2 (scale_embed[2] in the reference) is built but unused there —
        # stage 0 has no patch_embed so its skip-add never runs; we omit it.
        # padding (1,2): matches torch ConvTranspose2d(k=3, stride=2,
        # padding=1, output_padding=1) exactly (validated in
        # tests/test_convert_torch.py::test_convtranspose_semantics)
        back0 = nn.ConvTranspose(dims[2], (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 dtype=self.dtype, name="scale_embed_0")(maps[0])
        back1 = nn.Conv(dims[1], (3, 3), padding="SAME", dtype=self.dtype,
                        name="scale_embed_1")(maps[1])

        # preamble at mtt resolution (transformer_decoder.py:85-95)
        h0, w0 = gh // self.mtt_downsample, gw // self.mtt_downsample
        x_in = interpolate(maps[3], (h0, w0), "bilinear")

        feats, inter_preds = [], {}
        for t in self.tasks:
            f = ConvBNAct(self.backbone_dim, (3, 3), dtype=self.dtype,
                          name=f"prelim_{t}_0")(x_in, train=train)
            f = ConvBNAct(self.embed_dim, (3, 3), dtype=self.dtype,
                          name=f"prelim_{t}_1")(f, train=train)
            ip = nn.Conv(self.num_outputs[t], (1, 1), dtype=self.dtype,
                         name=f"inter_head_{t}")(f)
            inter_preds[t] = ip
            mix = nn.Conv(D, (1, 1), dtype=self.dtype, name=f"mix_proj_{t}")(
                jnp.concatenate([f, ip], axis=-1))
            feats.append(mix)
        x = jnp.stack(feats, axis=1)  # (B, T, h0, w0, D)

        th, tw = 8 * h0, 8 * w0
        message = None
        stage_tx: Dict[str, List] = {t: [] for t in self.tasks}

        for i in range(3):
            if i > 0:
                x = UpEmbed(dims[i], dtype=self.dtype, name=f"up_embed_{i}")(
                    x, train=train)
                skip = back1 if i == 1 else back0
                x = x + skip[:, None]
            x, message = InvPTBlock(dims[i], self.num_heads, kv_strides[i],
                                    drop_path=self.drop_path, dtype=self.dtype,
                                    name=f"stage_{i}")(x, message, train=train)

            # stage norm over the task-concatenated channel dim
            # (invpt.py:524-527: LayerNorm(task_no * dim)); per-task maps
            # are LANE slices of the merged layout — no transpose back
            Bx, Tx, Hx, Wx, Cx = x.shape
            xs = x.transpose(0, 2, 3, 1, 4).reshape(Bx, Hx, Wx, Tx * Cx)
            xs = FusedLN(name=f"norm_mt_{i}")(xs)

            for ti, t in enumerate(self.tasks):
                tx = xs[..., ti * Cx:(ti + 1) * Cx]
                if i > 0:  # redu_chan only for stages past the first (invpt.py:535-536)
                    tx = nn.Conv(D, (1, 1), dtype=self.dtype,
                                 name=f"redu_chan_{i}_{t}")(tx)
                stage_tx[t].append(tx)

        # mt_proj tail: conv3x3 + BN + ReLU on the multi-scale sum
        # (ref invpt.py:530-543). A factored eval path exists (the conv
        # distributes over the sum; each term contracts channels at the
        # LOW stage resolution via layers.upf_conv3x3_factored, ~3x fewer
        # FLOPs) but LOSES on TPU: it materialises three f32 channel-major
        # (B, D, tw, th) accumulator terms per task (~150 MB each) and the
        # dense conv already runs at 169 TF/s — measured 68.7 vs 81.4
        # imgs/s at bench shapes. Kept behind MTT_INVPT_FACTORED=1 as the
        # starting point for an in-VMEM (Pallas) multi-scale tail.
        import os
        factored = (not train) \
            and os.environ.get("MTT_INVPT_FACTORED", "0") not in ("", "0") \
            and all(
                th % f.shape[1] == 0 and tw % f.shape[2] == 0
                and th // f.shape[1] == tw // f.shape[2]
                for fs in stage_tx.values() for f in fs)
        from mtt_tpu.models.layers import upf_conv3x3_factored
        out = {}
        for t in self.tasks:
            kc, gamma, beta, ra_mean, ra_var = _MtProjParams(
                D, D, name=f"mt_proj_{t}")()
            if head_params is not None and not train \
                    and len(stage_tx[t]) == 3:
                # head-fused tail (eval): emits this task's LOGITS; the
                # (B, th, tw, D) feature map never reaches HBM
                from mtt_tpu.kernels.invpt_tail import fused_ms_tail_head
                m, v = (ra_mean.value.astype(jnp.float32),
                        ra_var.value.astype(jnp.float32))
                inv = jax.lax.rsqrt(v + 1e-5) * gamma.astype(jnp.float32)
                addv = beta.astype(jnp.float32) - m * inv
                wh, bh = head_params[t]
                out[t] = fused_ms_tail_head(tuple(stage_tx[t]), kc, inv,
                                            addv, wh, bh, th, tw)
                continue
            if not train and not factored and len(stage_tx[t]) == 3:
                # in-VMEM fused tail (kernels/invpt_tail.py): channel
                # contraction at each stage's own resolution, upsample
                # mixes + cross-scale sum + folded-BN ReLU in VMEM —
                # the dense path's three upsampled (B, th, tw, D)
                # tensors and f32 conv output never reach HBM. Falls
                # back internally to the identical dense composition.
                from mtt_tpu.kernels.invpt_tail import fused_ms_tail
                m, v = (ra_mean.value.astype(jnp.float32),
                        ra_var.value.astype(jnp.float32))
                inv = jax.lax.rsqrt(v + 1e-5) * gamma.astype(jnp.float32)
                addv = beta.astype(jnp.float32) - m * inv
                out[t] = fused_ms_tail(tuple(stage_tx[t]), kc, inv, addv,
                                       th, tw)
                continue
            if factored:
                Y = 0.0
                for txi in stage_tx[t]:
                    Y = Y + upf_conv3x3_factored(txi, kc,
                                                 th // txi.shape[1])
                m, v = (ra_mean.value.astype(jnp.float32),
                        ra_var.value.astype(jnp.float32))
                inv = jax.lax.rsqrt(v + 1e-5) * gamma.astype(jnp.float32)
                addv = beta.astype(jnp.float32) - m * inv
                y = nn.relu(Y * inv[None, :, None, None]
                            + addv[None, :, None, None])
                out[t] = y.transpose(0, 3, 2, 1).astype(self.dtype)
            else:
                acc = 0.0
                for txi in stage_tx[t]:
                    acc = acc + interpolate(txi, (th, tw), "bilinear")
                xc = jax.lax.conv_general_dilated(
                    acc.astype(self.dtype), kc.astype(self.dtype),
                    (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                xf = xc.astype(jnp.float32)
                if train:
                    m = xf.mean(axis=(0, 1, 2))
                    xcn = xf - m
                    v = (xcn * xcn).mean(axis=(0, 1, 2))
                    if not self.is_initializing():
                        # nn.BatchNorm running-average (momentum 0.9)
                        ra_mean.value = 0.9 * ra_mean.value + 0.1 * m
                        ra_var.value = 0.9 * ra_var.value + 0.1 * v
                else:
                    m, v = (ra_mean.value.astype(jnp.float32),
                            ra_var.value.astype(jnp.float32))
                inv = jax.lax.rsqrt(v + 1e-5) * gamma.astype(jnp.float32)
                y = nn.relu(xf * inv + (beta.astype(jnp.float32) - m * inv))
                out[t] = y.astype(self.dtype)
        return out, inter_preds

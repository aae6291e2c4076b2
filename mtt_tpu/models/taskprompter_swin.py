"""TaskPrompter-Swin backbone (TPU-native).

Re-design of the reference Swin variant (TaskPrompter/models/transformers/
taskprompter_swin.py:90-846): Swin-B with W-MSA/SW-MSA window attention
where the task prompts are broadcast into every window and mean-reduced
back (taskprompter_swin.py:167-212); relative-position bias and the
shifted-window mask apply only to the patch-patch block; a channel
pathway projects prompts and per-channel pixel vectors into a
``chan_embed_dim`` space; PatchMerging downsamples x AND the prompt
spatial-attention maps (stride-2 conv) while re-projecting channel
attention and prompts to 2x dim (taskprompter_swin.py:408-472). Per-stage
task-feature decode mirrors the ViT variant but upsamples 2x before the
1x1 decode convs for 2D tasks and returns the raw per-scale list for
3ddet (taskprompter_swin.py:721-774).

TPU-first: static window partitioning as reshape/transpose, jnp.roll for
cyclic shifts, fp32 softmax on bf16 matmuls, everything fixed-shape.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mtt_tpu.models.layers import (ConvBNAct, DropPath, FusedLN, Mlp,
                                   interpolate, trunc_normal)


def window_partition(x, ws: int):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(wins, ws: int, H: int, W: int):
    Bn = wins.shape[0] // ((H // ws) * (W // ws))
    x = wins.reshape(Bn, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(Bn, H, W, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws*ws, ws*ws)


def shifted_window_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    img = np.zeros((H, W))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)  # (nW, N, N)


class SwinPromptBlock(nn.Module):
    """One Swin block with prompted window attention + channel pathway."""
    dim: int
    resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    shift_size: int
    prompts_len: int
    chan_embed_dim: int
    last_block: bool = False
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, prompts, need_taps: bool = False,
                 deterministic: bool = True):
        # need_taps/deterministic are positional so nn.remat can mark them
        # static (static_argnums counts self as 0)
        H, W = self.resolution
        ws = min(self.window_size, H, W)
        shift = self.shift_size if ws == self.window_size else 0
        B, L, C = x.shape
        P = self.prompts_len
        Hd = self.num_heads
        Dh = C // Hd

        norm1 = FusedLN(epsilon=1e-5, name="norm1")
        spa_prompts = norm1(prompts)
        chan_prompts = nn.Dense(self.chan_embed_dim, dtype=self.dtype,
                                name="token_trans")(prompts)

        shortcut = x
        xn = norm1(x).reshape(B, H, W, C)
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        Hp, Wp = H + pad_b, W + pad_r
        if pad_b or pad_r:
            xn = jnp.pad(xn, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        if shift > 0:
            xn = jnp.roll(xn, (-shift, -shift), axis=(1, 2))

        wins = window_partition(xn, ws)                 # (B*nW, ws*ws, C)
        nW = wins.shape[0] // B
        N = ws * ws

        # join prompts into every window (taskprompter_swin.py:176-180)
        pw = jnp.repeat(spa_prompts, nW, axis=0)        # (B*nW, P, C)
        joint = jnp.concatenate([pw, wins], axis=1)     # (B*nW, P+N, C)
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(joint)
        qkv = qkv.reshape(-1, P + N, 3, Hd, Dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        # relative position bias on the patch-patch block only; pad with
        # zero prompt rows/cols and add elementwise — an .at[P:, P:].add
        # would lower to a dynamic-update-slice that COPIES the whole
        # attention tensor (354 MB/block at CS3D shapes; 61 ms/step)
        rpbt = self.param("relative_position_bias_table", trunc_normal(0.02),
                          ((2 * ws - 1) * (2 * ws - 1), Hd))
        rpi = relative_position_index(ws)
        bias = rpbt[rpi.reshape(-1)].reshape(N, N, Hd).transpose(2, 0, 1)
        bias_f = jnp.pad(bias, ((0, 0), (P, 0), (P, 0)))
        m_f = None
        if shift > 0:
            m = jnp.asarray(shifted_window_mask(Hp, Wp, ws, shift))  # (nW,N,N)
            m_f = jnp.pad(m, ((0, 0), (P, 0), (P, 0)))

        raw = None
        if need_taps:
            # tap blocks need the raw (pre-scale, pre-bias) scores for the
            # prompt attention maps — XLA einsum path
            raw = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                             preferred_element_type=jnp.float32)
            attn = raw * (Dh ** -0.5) + bias_f[None]
            if m_f is not None:
                attn = attn + jnp.tile(m_f, (B, 1, 1))[:, None]
            probs = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        else:
            from mtt_tpu.kernels.attention import fused_window_attention
            out = fused_window_attention(q, k, v, bias_f.astype(jnp.float32),
                                         m_f, Dh ** -0.5, nW)
        out = out.reshape(-1, P + N, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)

        p_out = out[:, :P].reshape(B, nW, P, C).mean(axis=1)
        x_wins = out[:, P:]

        xw = window_reverse(x_wins, ws, Hp, Wp)
        spa_map = None
        if need_taps:
            # raw prompt->patch scores stitched back to the full map
            rp = raw[:, :, :P, P:]                       # (B*nW, Hd, P, N)
            rp = rp.reshape(B, Hp // ws, Wp // ws, Hd, P, ws, ws)
            rp = rp.transpose(0, 3, 4, 1, 5, 2, 6).reshape(B, Hd, P, Hp, Wp)
            spa_map = rp
        if shift > 0:
            xw = jnp.roll(xw, (shift, shift), axis=(1, 2))
            if spa_map is not None:
                spa_map = jnp.roll(spa_map, (shift, shift), axis=(3, 4))
        if pad_b or pad_r:
            xw = xw[:, :H, :W]
            if spa_map is not None:
                spa_map = spa_map[:, :, :, :H, :W]
        x_attn = xw.reshape(B, L, C)

        # channel pathway (taskprompter_swin.py:371-391)
        cq = nn.Dense(self.chan_embed_dim, use_bias=self.qkv_bias,
                      dtype=self.dtype, name="chan_q")(chan_prompts)  # (B,P,D)
        # the channel pathway consumes the window-attention output
        # (pre-residual), taskprompter_swin.py:370-372
        ck_in = x_attn.transpose(0, 2, 1)                # (B, C, L)
        kv = nn.Dense(2 * self.chan_embed_dim, use_bias=self.qkv_bias,
                      dtype=self.dtype, name="chan_kv")(ck_in)
        ck, cv = jnp.split(kv, 2, axis=-1)               # (B, C, D)
        raw_chan = jnp.einsum("bpd,bcd->bpc", cq, ck,
                              preferred_element_type=jnp.float32)  # (B,P,C)
        cprobs = jax.nn.softmax(raw_chan * (self.chan_embed_dim ** -0.5),
                                axis=-1).astype(cv.dtype)
        chan_x = jnp.einsum("bpc,bcd->bpd", cprobs, cv)  # (B,P,D)

        dp = DropPath(self.drop_path, name="dp")
        x = shortcut + dp(x_attn, deterministic=deterministic)
        norm2 = FusedLN(epsilon=1e-5, name="norm2")
        mlp = Mlp(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")
        x = x + dp(mlp(norm2(x), deterministic=deterministic),
                   deterministic=deterministic)

        if not self.last_block:
            cp = nn.Dense(self.chan_embed_dim, dtype=self.dtype,
                          name="chan_proj")(chan_x)
            p_out = p_out + nn.Dense(C, dtype=self.dtype,
                                     name="token_trans1")(cp)
            prompts = prompts + dp(p_out, deterministic=deterministic)
            prompts = prompts + dp(mlp(norm2(prompts),
                                       deterministic=deterministic),
                                   deterministic=deterministic)
        raw_out = (spa_map, raw_chan) if need_taps else None
        return x, prompts, raw_out


class PatchMerging(nn.Module):
    """2x downsample of tokens + attention-map downsampling
    (taskprompter_swin.py:408-472)."""
    dim: int
    resolution: Tuple[int, int]
    num_heads: int
    prompts_len: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, prompts, raw):
        H, W = self.resolution
        B, L, C = x.shape
        xm = x.reshape(B, H, W, C)
        parts = [xm[:, 0::2, 0::2], xm[:, 1::2, 0::2],
                 xm[:, 0::2, 1::2], xm[:, 1::2, 1::2]]
        xm = jnp.concatenate(parts, axis=-1).reshape(B, (H // 2) * (W // 2), 4 * C)
        xm = FusedLN(epsilon=1e-5, name="norm")(xm)
        xm = nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                      name="reduction")(xm)

        spa_map, raw_chan = raw
        Bh, Hd, P, _, _ = spa_map.shape
        sm = spa_map.reshape(B, Hd * P, H, W).transpose(0, 2, 3, 1)
        # torch Conv2d(k3, s2, padding=1) pads symmetrically; XLA "SAME"
        # would pad (0, 1) at stride 2 and shift the map by one pixel
        sm = nn.Conv(Hd * P, (3, 3), strides=(2, 2),
                     padding=((1, 1), (1, 1)),
                     dtype=self.dtype, name="spa_attn_ds")(sm)
        sm = sm.transpose(0, 3, 1, 2).reshape(B, Hd, P, H // 2, W // 2)

        rc = nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                      name="process_chan_attn")(raw_chan)  # (B,P,2C)
        prompts = nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                           name="task_prompts_up")(prompts)
        return xm, prompts, (sm, rc)


class SwinTaskDecode(nn.Module):
    """Per-stage task-feature decode (taskprompter_swin.py:721-774)."""
    tasks: Sequence[str]
    num_heads: int
    prompt_len: int
    tar_dim: int
    final_dim: int
    layer_idx: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_map, raw, *, train: bool = False):
        B, gh, gw, C = x_map.shape
        T = len(self.tasks)
        spa_map, raw_chan = raw        # (B,Hd,P,gh,gw), (B,P,C)
        G = self.num_heads * self.prompt_len
        gc = C // G
        il = self.layer_idx

        out: Dict[str, jax.Array] = {}
        for ti, t in enumerate(self.tasks):
            a = spa_map[:, :, ti * self.prompt_len:(ti + 1) * self.prompt_len]
            a = a.reshape(B, G, gh, gw).transpose(0, 2, 3, 1)   # (B,gh,gw,G)
            xg = x_map.reshape(B, gh, gw, G, gc)
            f = (xg * a[..., None].astype(xg.dtype)).reshape(B, gh, gw, C) + x_map
            if t != "3ddet":
                f = interpolate(f, (2 * gh, 2 * gw))
            f = nn.Conv(self.tar_dim, (1, 1), dtype=self.dtype,
                        name=f"fea_decode_spa_{il}_{t}")(f)

            cw = raw_chan[:, ti]                                # (B,C)
            fc = x_map * cw[:, None, None, :].astype(x_map.dtype) + x_map
            if t != "3ddet":
                fc = interpolate(fc, (2 * gh, 2 * gw))
            fc = nn.Conv(self.tar_dim, (1, 1), dtype=self.dtype,
                         name=f"fea_decode_chan_{il}_{t}")(fc)

            cat = jnp.concatenate([f, fc], axis=-1)
            cat = nn.Conv(self.final_dim, (1, 1), dtype=self.dtype,
                          name=f"fea_fuse_{il}_{t}_0")(cat)
            cat = nn.Conv(self.final_dim, (3, 3), padding="SAME",
                          dtype=self.dtype, name=f"fea_fuse_{il}_{t}_1")(cat)
            cat = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype,
                               name=f"fea_fuse_{il}_{t}_bn")(cat)
            cat = nn.gelu(cat, approximate=False)
            out[t] = nn.Conv(self.final_dim, (3, 3), padding="SAME",
                             dtype=self.dtype, name=f"fea_fuse_{il}_{t}_2")(cat)
        return out


class TaskPrompterSwin(nn.Module):
    """Swin-B TaskPrompter; returns {task: feature} — 2D tasks get a fused
    half-resolution map, 3ddet gets the per-scale list for the FPN."""
    tasks: Sequence[str]
    img_size: Tuple[int, int]
    patch_size: int = 4
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 12
    prompt_len: int = 1
    chan_embed_dim: int = 256
    tar_dim: int = 256              # p.level_embed_dim
    final_dim: int = 450            # p.final_embed_dim
    img_ds_ratio: float = 1.0
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    remat: bool = False             # jax.checkpoint each block: Swin-B at
                                    # 768x1536 training exceeds 16 GB HBM
                                    # without rematerialisation
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        B = x.shape[0]
        T = len(self.tasks)
        P = T * self.prompt_len
        if self.img_ds_ratio != 1.0:
            nh = int(x.shape[1] * self.img_ds_ratio)
            nw = int(x.shape[2] * self.img_ds_ratio)
            x = jax.image.resize(x, (B, nh, nw, x.shape[3]), method="linear")

        ps = self.patch_size
        x = nn.Conv(self.embed_dim, (ps, ps), strides=(ps, ps),
                    padding="VALID", dtype=self.dtype, name="patch_embed")(x)
        B, gh, gw, _ = x.shape
        x = FusedLN(epsilon=1e-5, name="patch_norm")(
            x).reshape(B, gh * gw, self.embed_dim)

        task_prompts = self.param("task_prompts", trunc_normal(std=1.0, mean=1.0),
                                  (P, self.embed_dim))
        prompts = jnp.broadcast_to(task_prompts.astype(x.dtype)[None],
                                   (B, P, self.embed_dim))

        n_layers = len(self.depths)
        dims = [self.embed_dim * 2 ** i for i in range(n_layers)]
        total_depth = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total_depth - 1, 1)
               for i in range(total_depth)]

        task_fea: Dict[str, List] = {t: [] for t in self.tasks}
        res = (gh, gw)
        blk_i = 0
        raw = None
        for il in range(n_layers):
            last_layer = il == n_layers - 1
            block_cls = (nn.remat(SwinPromptBlock, static_argnums=(3, 4))
                         if self.remat else SwinPromptBlock)
            for d in range(self.depths[il]):
                last_of_stage = d == self.depths[il] - 1
                x, prompts, r = block_cls(
                    dim=dims[il], resolution=res, num_heads=self.num_heads[il],
                    window_size=self.window_size,
                    shift_size=0 if d % 2 == 0 else self.window_size // 2,
                    prompts_len=P, chan_embed_dim=self.chan_embed_dim,
                    last_block=last_layer and last_of_stage,
                    mlp_ratio=self.mlp_ratio, drop_path=dpr[blk_i],
                    dtype=self.dtype, name=f"layer{il}_block{d}")(
                        x, prompts, last_of_stage, not train)
                if r is not None:
                    raw = r
                blk_i += 1

            if not last_layer:
                # reference order (taskprompter_swin.py:692-696,527-537):
                # PatchMerging FIRST (x -> (res/2, 2C); spa maps stride-2
                # conv; chan attn + prompts re-projected to 2C), THEN the
                # stage decode consumes the POST-merge x and maps —
                # p.backbone_channels = [2C0, 2C1, 2C2, C3], strides
                # [8, 16, 32, 32] (common_config.py:36-38)
                x, prompts, raw = PatchMerging(
                    dims[il], res, self.num_heads[il], P, self.dtype,
                    name=f"merge_{il}")(x, prompts, raw)
                res = (res[0] // 2, res[1] // 2)
                fea = SwinTaskDecode(self.tasks, self.num_heads[il],
                                     self.prompt_len, self.tar_dim,
                                     self.final_dim, il, self.dtype,
                                     name=f"decode_{il}")(
                    x.reshape(B, res[0], res[1], 2 * dims[il]), raw,
                    train=train)
                for t in self.tasks:
                    task_fea[t].append(fea[t])

        x = FusedLN(epsilon=1e-5, name="norm")(x)
        fea = SwinTaskDecode(self.tasks, self.num_heads[-1], self.prompt_len,
                             self.tar_dim, self.final_dim, n_layers - 1,
                             self.dtype, name=f"decode_{n_layers - 1}")(
            x.reshape(B, res[0], res[1], dims[-1]), raw, train=train)
        for t in self.tasks:
            task_fea[t].append(fea[t])

        # fuse multi-scale features for 2D tasks; raw list for 3ddet
        out = {}
        for t in self.tasks:
            if t == "3ddet":
                out[t] = task_fea[t]
                continue
            tgt = task_fea[t][0].shape[1:3]
            summed = sum(
                interpolate(f, tgt) if tgt[0] >= f.shape[1] else jax.image.resize(f, (B, tgt[0], tgt[1], f.shape[-1]),
                                 method="linear") for f in task_fea[t])
            out[t] = nn.Conv(self.final_dim, (3, 3), padding="SAME",
                             dtype=self.dtype, name=f"multi_scale_fuse_{t}")(summed)
        return out

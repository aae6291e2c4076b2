"""Pretrained-weight ingestion: Google ViT .npz -> Flax param trees.

The reference loads the official Google JAX ViT checkpoints through an
npz->PyTorch transposition loader (InvPT/models/transformers/vit.py:410-488;
TaskPrompter taskprompter.py:525-602). Since this framework IS Flax, the
converter goes npz->Flax directly: the conv/dense kernels keep their native
layout, only the qkv fusion and pos-embed resampling need work.

Also provides a torch-release -> Flax mapper for the backbone subtree of the
published full-model checkpoints (backbone.* keys in transformer_net.py /
taskprompter_wrapper.py state dicts), so quality-parity evaluation can start
from released weights without retraining. (Decoder/head conversion: later
round.)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp


def _resize_pos_embed_np(pos: np.ndarray, new_grid: Tuple[int, int],
                         num_prefix: int = 1) -> np.ndarray:
    import jax
    tok = pos[:, :num_prefix]
    grid = pos[0, num_prefix:]
    n, c = grid.shape
    g = int(round(n ** 0.5))
    grid = jnp.asarray(grid.reshape(g, g, c))
    grid = jax.image.resize(grid, (new_grid[0], new_grid[1], c), method="cubic")
    grid = np.asarray(grid).reshape(1, new_grid[0] * new_grid[1], c)
    return np.concatenate([np.asarray(tok), grid], axis=1)


def load_vit_npz(npz_path: str, params: Dict, depth: int,
                 grid: Tuple[int, int], prefix: str = "",
                 with_cls_token: bool = True,
                 num_heads: int = None) -> Dict:
    """Fill a VisionTransformer/TaskPrompterViT param tree from an npz.

    ``params`` is the (mutable copy of the) 'params' collection of the
    backbone module; returns the updated tree. Keys missing from the npz
    (task prompts, decode convs, ...) keep their initialisation.
    """
    w = np.load(npz_path)
    if not prefix and "opt/target/embedding/kernel" in w:
        prefix = "opt/target/"

    def g(name):
        return np.asarray(w[prefix + name])

    out = dict(params)
    pe = dict(out["patch_embed"])
    proj = dict(pe["proj"])
    proj["kernel"] = g("embedding/kernel")          # (P,P,3,C) HWIO == flax
    proj["bias"] = g("embedding/bias")
    pe["proj"] = proj
    out["patch_embed"] = pe

    pos = g("Transformer/posembed_input/pos_embedding")  # (1, 1+N, C)
    want = out["pos_embed"].shape
    if pos.shape != want:
        pos = _resize_pos_embed_np(pos, grid, 1)
        if pos.shape[1] != want[1]:  # model without cls slot
            pos = pos[:, -want[1]:]
    out["pos_embed"] = pos.astype(np.float32)
    if with_cls_token and "cls_token" in out and prefix + "cls" in w.files:
        out["cls_token"] = g("cls")

    C = proj["kernel"].shape[-1]
    for i in range(depth):
        bp = f"Transformer/encoderblock_{i}/"
        mh = bp + "MultiHeadDotProductAttention_1/"
        blk = dict(out[f"blocks_{i}"])

        def ln(dst, src):
            blk[dst] = {"scale": g(src + "/scale"), "bias": g(src + "/bias")}

        ln("norm1", bp + "LayerNorm_0")
        ln("norm2", bp + "LayerNorm_2")

        # our attention kernel wants HEAD-MAJOR qkv columns (H, 3, D); the
        # npz stores separate (C, H, D) q/k/v projections
        H_ = num_heads or C // 64
        D_ = C // H_
        qkv_k = np.stack([
            g(mh + n + "/kernel").reshape(C, H_, D_)
            for n in ("query", "key", "value")], axis=2)  # (C, H, 3, D)
        qkv_k = qkv_k.reshape(C, 3 * C)
        qkv_b = np.stack([
            g(mh + n + "/bias").reshape(H_, D_)
            for n in ("query", "key", "value")], axis=1).reshape(3 * C)
        qkv = {"kernel": qkv_k, "bias": qkv_b}
        proj = {"kernel": g(mh + "out/kernel").reshape(C, C),
                "bias": g(mh + "out/bias")}
        if "attn" in blk:   # VisionTransformer nests attention in a submodule
            attn = dict(blk["attn"])
            attn["qkv"], attn["proj"] = qkv, proj
            blk["attn"] = attn
        else:               # TaskPrompter blocks keep qkv/proj at block level
            blk["qkv"], blk["proj"] = qkv, proj

        mlp = dict(blk["mlp"])
        mlp["fc1"] = {"kernel": g(bp + "MlpBlock_3/Dense_0/kernel"),
                      "bias": g(bp + "MlpBlock_3/Dense_0/bias")}
        mlp["fc2"] = {"kernel": g(bp + "MlpBlock_3/Dense_1/kernel"),
                      "bias": g(bp + "MlpBlock_3/Dense_1/bias")}
        blk["mlp"] = mlp
        out[f"blocks_{i}"] = blk

    out["norm"] = {"scale": g("Transformer/encoder_norm/scale"),
                   "bias": g("Transformer/encoder_norm/bias")}
    return out


def load_vit_npz_taskprompter(npz_path: str, params: Dict, depth: int,
                              grid: Tuple[int, int],
                              num_heads: int = None) -> Dict:
    """TaskPrompter-ViT blocks share the ViT layout; qkv/proj/norms/mlp load
    from the npz, prompt-specific params (task_prompts, token_trans*) keep
    their init — mirroring the reference's partial load (pretrained ViT +
    new prompting params)."""
    out = load_vit_npz(npz_path, params, depth, grid, with_cls_token=False,
                       num_heads=num_heads)
    # TaskPrompter blocks keep the prompt pathway params from init; nothing
    # further to do — load_vit_npz only touched shared keys.
    return out


_TORCH_BLOCK_MAP = {
    "norm1.weight": ("norm1", "scale"), "norm1.bias": ("norm1", "bias"),
    "norm2.weight": ("norm2", "scale"), "norm2.bias": ("norm2", "bias"),
    "mlp.fc1.weight": ("mlp", "fc1", "kernel"),
    "mlp.fc1.bias": ("mlp", "fc1", "bias"),
    "mlp.fc2.weight": ("mlp", "fc2", "kernel"),
    "mlp.fc2.bias": ("mlp", "fc2", "bias"),
    "attn.qkv.weight": ("attn", "qkv", "kernel"),
    "attn.qkv.bias": ("attn", "qkv", "bias"),
    "attn.proj.weight": ("attn", "proj", "kernel"),
    "attn.proj.bias": ("attn", "proj", "bias"),
    "attn.token_trans.weight": ("token_trans", "kernel"),
    "attn.token_trans.bias": ("token_trans", "bias"),
    "attn.token_trans1.weight": ("token_trans1", "kernel"),
    "attn.token_trans1.bias": ("token_trans1", "bias"),
}


def load_torch_backbone(state_dict: Dict[str, np.ndarray], params: Dict,
                        depth: int, grid: Tuple[int, int],
                        prefix: str = "backbone.") -> Dict:
    """Map the backbone.* subtree of a released torch checkpoint into our
    Flax tree. ``state_dict`` values must already be numpy arrays (load with
    torch.load(..., map_location='cpu') and .numpy() upstream).

    Layout translation: torch Linear (out,in) -> flax (in,out) transpose;
    torch Conv (O,I,kh,kw) -> flax (kh,kw,I,O).
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    out = dict(params)

    if "patch_embed.proj.weight" in sd:
        pe = dict(out["patch_embed"])
        proj = dict(pe["proj"])
        proj["kernel"] = np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0))
        proj["bias"] = sd["patch_embed.proj.bias"]
        pe["proj"] = proj
        out["patch_embed"] = pe

    if "pos_embed" in sd:
        pos = sd["pos_embed"]
        if pos.shape != out["pos_embed"].shape:
            pos = _resize_pos_embed_np(pos, grid, 1)
            if pos.shape[1] != out["pos_embed"].shape[1]:
                pos = pos[:, -out["pos_embed"].shape[1]:]
        out["pos_embed"] = pos
    if "cls_token" in sd and "cls_token" in out:
        out["cls_token"] = sd["cls_token"]
    if "task_prompts" in sd and "task_prompts" in out:
        out["task_prompts"] = sd["task_prompts"]

    for i in range(depth):
        key = f"blocks_{i}"
        blk = dict(out[key])
        # Detect the block layout (as load_vit_npz does): VisionTransformer
        # nests attention under an 'attn' submodule; TaskPrompter
        # PromptedBlock keeps qkv/proj at block level. Writing a stray
        # blk['attn'] dict into a TaskPrompter tree would be silently
        # ignored by flax, leaving real attention weights at random init.
        nested_attn = "attn" in blk
        for tk, path in _TORCH_BLOCK_MAP.items():
            src = f"blocks.{i}.{tk}"
            if src not in sd:
                continue
            v = sd[src]
            if tk.endswith("weight") and v.ndim == 2:
                v = v.T
            trail = list(path)
            if trail[0] == "attn" and not nested_attn:
                trail = trail[1:]
            node = blk
            for p_ in trail[:-1]:
                node[p_] = dict(node.get(p_, {}))
                node = node[p_]
            node[trail[-1]] = v
        out[key] = blk

    if "norm.weight" in sd:
        out["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}
    return out

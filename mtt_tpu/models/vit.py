"""ViT backbone with multi-depth feature taps (InvPT encoder).

TPU-native equivalent of the reference's timm-style ViT
(InvPT/models/transformers/vit.py:172-562): ViT-B/L with cls token, learned
position embedding, and tokens tapped after the blocks in ``select_list``
plus the final norm (vit.py:341-351). Pretrained-weight ingestion lives in
`mtt_tpu.models.convert` (npz and torch-release converters).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtt_tpu.models.layers import FusedLN, PatchEmbed, ViTBlock, trunc_normal


def resize_pos_embed(pos_embed: jax.Array, new_grid: Tuple[int, int],
                     num_prefix_tokens: int = 1) -> jax.Array:
    """Bicubic-resample the grid part of a (1, 1+N, C) position embedding.

    Equivalent of reference resize_pos_embed (vit.py:490-509) used when the
    train resolution differs from the pretrained 384x384 grid.
    """
    tok = pos_embed[:, :num_prefix_tokens]
    grid = pos_embed[0, num_prefix_tokens:]
    n, c = grid.shape
    gs_old = int(round(n ** 0.5))
    grid = grid.reshape(gs_old, gs_old, c)
    grid = jax.image.resize(grid, (new_grid[0], new_grid[1], c), method="cubic")
    grid = grid.reshape(1, new_grid[0] * new_grid[1], c)
    return jnp.concatenate([tok, grid], axis=1)


class VisionTransformer(nn.Module):
    """ViT encoder returning multi-scale token taps.

    __call__ returns (final_tokens, [tap_0, ..., tap_k]) where each tap is
    (B, gh*gw, C) with the cls token stripped, matching
    reference forward_features (vit.py:332-351).
    """
    img_size: Tuple[int, int]
    select_list: Sequence[int]
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    remat: bool = False          # jax.checkpoint each block (training memory)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, deterministic: bool = None):
        if deterministic is None:
            deterministic = not train
        B = x.shape[0]
        tokens, (gh, gw) = PatchEmbed(self.patch_size, self.embed_dim,
                                      self.dtype, name="patch_embed")(x)
        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.embed_dim))
        pos_embed = self.param("pos_embed", trunc_normal(0.02),
                               (1, gh * gw + 1, self.embed_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(tokens.dtype), (B, 1, self.embed_dim)),
             tokens], axis=1)
        tokens = tokens + pos_embed.astype(tokens.dtype)

        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
               for i in range(self.depth)]
        taps: List[jax.Array] = []
        block_cls = nn.remat(ViTBlock, static_argnums=(2,)) if self.remat else ViTBlock
        for i in range(self.depth):
            tokens = block_cls(self.num_heads, self.mlp_ratio, self.qkv_bias,
                               drop_path=dpr[i], dtype=self.dtype,
                               name=f"blocks_{i}")(tokens, deterministic)
            if (i + 1) in self.select_list:
                taps.append(tokens[:, 1:])

        tokens = FusedLN(name="norm")(tokens)
        final = tokens[:, 1:]
        taps.append(final)
        return final, taps


VIT_SPECS = {
    # select_list per reference: vit_large_patch16_384 taps [6,12,18]+final
    # (vit.py:560); base uses thirds.
    "vitL": dict(patch_size=16, embed_dim=1024, depth=24, num_heads=16,
                 select_list=(6, 12, 18)),
    "vitB": dict(patch_size=16, embed_dim=768, depth=12, num_heads=12,
                 select_list=(3, 6, 9)),
    # tiny spec for unit tests
    "vitT": dict(patch_size=16, embed_dim=64, depth=4, num_heads=4,
                 select_list=(1, 2, 3)),
}


def build_vit(name: str, img_size: Tuple[int, int], drop_path_rate: float = 0.15,
              dtype=jnp.float32) -> VisionTransformer:
    spec = VIT_SPECS[name]
    return VisionTransformer(img_size=tuple(img_size),
                             drop_path_rate=drop_path_rate, dtype=dtype, **spec)

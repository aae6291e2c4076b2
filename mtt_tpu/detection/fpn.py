"""FPN neck (5 levels, extra convs on outputs).

Equivalent of the reference FPN (TaskPrompter/detection_toolbox/
fpn.py:10-202) with add_extra_convs='on_output' and
relu_before_extra_convs=True, NHWC.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    relu_before_extra_convs: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: List[jax.Array], *, train: bool = False):
        n_in = len(inputs)
        # lateral 1x1
        laterals = [nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name=f"lateral_{i}")(x)
                    for i, x in enumerate(inputs)]
        # top-down pathway
        for i in range(n_in - 1, 0, -1):
            B, H, W, C = laterals[i - 1].shape
            up = jax.image.resize(laterals[i], (B, H, W, C), method="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        # output 3x3 convs
        outs = [nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"fpn_conv_{i}")(laterals[i])
                for i in range(n_in)]
        # extra levels from the last output (add_extra_convs='on_output')
        for i in range(self.num_outs - n_in):
            src = outs[-1]
            if i > 0 and self.relu_before_extra_convs:
                src = nn.relu(src)
            outs.append(nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                                padding="SAME", dtype=self.dtype,
                                name=f"extra_conv_{i}")(src))
        return outs

"""Task-specific logits -> prediction post-processing (jit-safe).

Equivalent of reference get_output (InvPT/utils/utils.py:18-64;
TaskPrompter/utils/utils.py:20-79 adds the 3ddet decode and Cityscapes
train-class -> raw-class remap). All inputs NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Cityscapes train-id -> raw label id (TaskPrompter/utils/utils.py semseg
# remap for Cityscapes3D visualisation/eval export).
CITYSCAPES_TRAINID_TO_RAWID = (7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24,
                               25, 26, 27, 28, 31, 32, 33)


def get_output(output: jax.Array, task: str):
    """logits (B,H,W,K) -> prediction, matching reference semantics:
      normals: L2-normalise -> [0,255];  semseg/human_parts: argmax;
      edge: sigmoid*255;  sal: softmax[...,1]*255;  depth: clamp >= 0.
    """
    if task == "normals":
        norm = jnp.linalg.norm(output, axis=-1, keepdims=True)
        out = output / jnp.maximum(norm, 1e-12)
        return (out + 1.0) * 255.0 / 2.0
    if task in ("semseg", "human_parts"):
        return jnp.argmax(output, axis=-1)
    if task == "edge":
        return 255.0 * jax.nn.sigmoid(output[..., 0])
    if task == "sal":
        return jax.nn.softmax(output, axis=-1)[..., 1] * 255.0
    if task == "depth":
        return jnp.maximum(output, 0.0)[..., 0] if output.shape[-1] == 1 else jnp.maximum(output, 0.0)
    raise ValueError(f"Unknown task {task}")

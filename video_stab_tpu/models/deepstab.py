"""Learned transform predictor — the deepStabilization hook.

The reference declares ``deepStabilization`` + ``modelPath`` parameters and an
``applyDeepStabilization`` method (include/video/Stabilizer.h:139-140, 244)
but ships no model. Here the slot is filled with a small Siamese CNN that
regresses the inter-frame similarity transform (dx, dy, da) from a stacked
pair of analysis-resolution grayscale frames — a drop-in alternative motion
estimator for the LK+RANSAC front-end (same (3,) output contract), trainable
self-supervised on synthetically warped frames (models/train.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DeepStabConfig:
    widths: tuple = (16, 32, 64, 128)
    dense_width: int = 256
    dtype: Any = jnp.bfloat16


class DeepStabNet(nn.Module):
    """Input: (B, H, W, 2) stacked [prev_gray, curr_gray] in [0, 255].
    Output: (B, 3) — (dx, dy, da) in analysis pixels / radians."""

    cfg: DeepStabConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = x / 127.5 - 1.0
        for w in c.widths:
            x = nn.Conv(w, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=c.dtype, use_bias=False)(x)
            x = nn.GroupNorm(num_groups=8, dtype=jnp.float32)(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))                    # global average pool
        x = nn.Dense(c.dense_width, dtype=c.dtype)(x)
        x = nn.relu(x)
        out = nn.Dense(3, dtype=jnp.float32,
                       kernel_init=nn.initializers.zeros)(x)
        # Scale heads: translations in pixels, rotation small (radians).
        return out * jnp.asarray([10.0, 10.0, 0.1])


def create_deepstab(cfg: DeepStabConfig = DeepStabConfig(), seed: int = 0,
                    height: int = 96, width: int = 160):
    model = DeepStabNet(cfg)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, height, width, 2), jnp.float32))
    return model, params


def predict_transform(model, params, prev_gray: jnp.ndarray,
                      curr_gray: jnp.ndarray) -> jnp.ndarray:
    """(H, W) pair -> (3,) transform; same contract as the LK+RANSAC path."""
    x = jnp.stack([prev_gray, curr_gray], axis=-1)[None]
    return model.apply(params, x)[0]


def save_deepstab(params, path: str) -> None:
    """Serialize network weights (flax msgpack) to ``path`` — the artifact
    ``StabilizerParams.model_path`` points at."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_deepstab(path: str, cfg: DeepStabConfig = DeepStabConfig(),
                  height: int = 96, width: int = 160, seed: int = 0):
    """Load weights saved by save_deepstab into a freshly-built template."""
    from flax import serialization

    _, template = create_deepstab(cfg, seed=seed, height=height, width=width)
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def resolve_deepstab_weights(params):
    """Weights for ``StabilizerParams`` with deep_stabilization on:
    ``params.model_path`` if set, else the bundled checkpoint, else a
    freshly-initialized (untrained, bring-up only) network. Shared by the
    single-stream wrapper and the batched multi-stream init so every
    serving path resolves the modelPath slot identically
    (Stabilizer.h:139-140)."""
    import os

    bundled = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "weights", "deepstab_96x160.msgpack")
    path = params.model_path or (bundled if os.path.exists(bundled) else "")
    if path:
        # Fully-convolutional + global pool: the weights are
        # resolution-agnostic, so the bundled 96x160-trained net serves
        # any analysis size.
        return load_deepstab(path, height=params.analysis_height,
                             width=params.analysis_width)
    _, weights = create_deepstab(height=params.analysis_height,
                                 width=params.analysis_width)
    return weights

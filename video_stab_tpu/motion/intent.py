"""Motion-intent classification and correction scaling.

Replicates the reference's "iPhone Action mode"-style analysis:
analyzeMotionIntent (src/Stabilizer.cpp:1676-1719),
calculateAdaptiveStabilizationStrength (1722-1747) and the per-intent
correction scaling applied at emission (854-888), as pure functions over a
ring buffer of recent transforms.
"""

from __future__ import annotations

import enum
import math

import jax.numpy as jnp

from video_stab_tpu.motion.filters import ring_get


class MotionIntent(enum.IntEnum):
    NORMAL = 0
    DELIBERATE_PAN = 1
    SHAKE_REMOVAL = 2
    FOLLOW_ACTION = 3


def _variance(vals: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    count = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(vals * w) / count
    return jnp.sum(((vals - mean) ** 2) * w) / count


def _consistency(vals: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """1 / (1 + var/mean^2), clamped to [0,1]; 0 for mean==0
    (Stabilizer.cpp:1768-1780)."""
    count = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(vals * w) / count
    var = _variance(vals, w)
    safe = jnp.where(mean != 0.0, mean * mean, 1.0)
    c = 1.0 / (1.0 + var / safe)
    return jnp.where(mean != 0.0, jnp.clip(c, 0.0, 1.0), 0.0)


def analyze_motion_intent(trans_ring: jnp.ndarray, n_transforms: jnp.ndarray,
                          motion: jnp.ndarray, frame_index: jnp.ndarray,
                          ) -> jnp.ndarray:
    """Classify the emitted frame's motion (Stabilizer.cpp:1676-1719).

    trans_ring: (RING, 3) ring of raw transforms; n_transforms its length;
    motion: (3,) the emitted frame's raw transform; frame_index: emitted index.
    Returns an int32 MotionIntent code.
    """
    mag = jnp.sqrt(motion[0] ** 2 + motion[1] ** 2)
    ang_vel = jnp.abs(motion[2]) * 180.0 / math.pi * 30.0

    window = 15
    offs = jnp.arange(window)
    start = jnp.maximum(0, frame_index - window)
    idx = start + offs
    valid = (idx < frame_index) & (idx < n_transforms)
    t = ring_get(trans_ring, jnp.clip(idx, 0, None))  # (15, 3)
    w = valid.astype(trans_ring.dtype)
    mags = jnp.sqrt(t[:, 0] ** 2 + t[:, 1] ** 2)
    dirs = jnp.arctan2(t[:, 1], t[:, 0])

    any_recent = jnp.sum(w) > 0
    dir_var = _variance(dirs, w)
    mag_cons = _consistency(mags, w)

    is_pan = (dir_var < 0.5) & (mag_cons > 0.7) & (mag > 5.0)
    is_shake = (mag < 3.0) & (mag_cons < 0.3) & (ang_vel > 10.0)
    is_follow = (mag > 3.0) & (mag < 15.0) & (dir_var > 0.5)

    intent = jnp.where(
        is_pan, MotionIntent.DELIBERATE_PAN,
        jnp.where(is_shake, MotionIntent.SHAKE_REMOVAL,
                  jnp.where(is_follow, MotionIntent.FOLLOW_ACTION,
                            MotionIntent.NORMAL)))
    enabled = (n_transforms >= 15) & any_recent
    return jnp.where(enabled, intent, MotionIntent.NORMAL).astype(jnp.int32)


def intent_correction_scale(intent: jnp.ndarray, motion: jnp.ndarray,
                            frame_index: jnp.ndarray) -> jnp.ndarray:
    """The diff multiplier applied at emission (Stabilizer.cpp:854-888):
    PAN -> 0.5, SHAKE -> 1.0, FOLLOW -> 0.8, NORMAL -> adaptive strength
    (0.7 for NORMAL per 1722-1747); 1.0 when frame_index == 0."""
    scale = jnp.select(
        [intent == MotionIntent.DELIBERATE_PAN,
         intent == MotionIntent.SHAKE_REMOVAL,
         intent == MotionIntent.FOLLOW_ACTION],
        [jnp.float32(0.5), jnp.float32(1.0), jnp.float32(0.8)],
        jnp.float32(0.7))
    return jnp.where(frame_index > 0, scale, jnp.float32(1.0))

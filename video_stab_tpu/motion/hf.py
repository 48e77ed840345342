"""Drone high-frequency vibration suppression chain.

Replicates the reference's HF pipeline applied to each raw transform
(src/Stabilizer.cpp:583-588, implementations 2445-2686), in exact order:
dead-zone freeze -> micro-shake suppression -> rotation low-pass ->
translation-history update. The hidden C++ member state becomes an explicit
pytree so the chain stays a pure, vmappable function.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


HF_HISTORY = 10  # hfTranslationHistory_ sliding window (Stabilizer.cpp:2526)


class HFState(NamedTuple):
    trans_history: jnp.ndarray   # (HF_HISTORY, 2) ring of translations
    n_history: jnp.ndarray       # int32 count of pushes (ring fill level)
    median_translation: jnp.ndarray  # (2,) current median reference
    rotation_lp: jnp.ndarray     # float32 low-pass filtered rotation
    in_dead_zone: jnp.ndarray    # bool
    freeze_counter: jnp.ndarray  # int32
    motion_accumulator: jnp.ndarray  # float32


def hf_init() -> HFState:
    return HFState(
        trans_history=jnp.zeros((HF_HISTORY, 2), jnp.float32),
        n_history=jnp.int32(0),
        median_translation=jnp.zeros((2,), jnp.float32),
        rotation_lp=jnp.float32(0.0),
        in_dead_zone=jnp.asarray(False),
        freeze_counter=jnp.int32(0),
        motion_accumulator=jnp.float32(0.0),
    )


def _hf_magnitude(t: jnp.ndarray) -> jnp.ndarray:
    """sqrt(dx^2 + dy^2 + 100*da^2) (Stabilizer.cpp:2610-2612)."""
    return jnp.sqrt(t[0] ** 2 + t[1] ** 2 + t[2] ** 2 * 100.0)


def _median_even_avg(vals: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """calculateMedianTranslation's median (Stabilizer.cpp:2531-2553):
    sorted[mid] for odd n, (sorted[mid-1]+sorted[mid])/2 for even n."""
    big = jnp.where(jnp.arange(vals.shape[0]) < n, vals, jnp.inf)
    s = jnp.sort(big)
    mid = n // 2
    lo = s[jnp.clip(mid - 1, 0, vals.shape[0] - 1)]
    hi = s[jnp.clip(mid, 0, vals.shape[0] - 1)]
    even = (n % 2) == 0
    return jnp.where(even, 0.5 * (lo + hi), hi)


def hf_apply(state: HFState, raw: jnp.ndarray, *,
             dead_zone_threshold: float, freeze_duration: int,
             accumulator_decay: float, shake_px: float,
             rot_lp_alpha: float, horizon_lock: bool,
             ) -> tuple[HFState, jnp.ndarray]:
    """Run the full HF chain on one raw (dx, dy, da) transform."""
    # --- 1. Dead-zone freeze (applyDeadZoneFreeze, 2604-2655). -------------
    mag = _hf_magnitude(raw)
    accum = jnp.maximum(state.motion_accumulator * accumulator_decay, mag)
    accum = jnp.clip(jnp.minimum(accum, dead_zone_threshold * 5.0), 0.0, 100.0)

    entering = (~state.in_dead_zone) & (mag < dead_zone_threshold)
    in_dz = state.in_dead_zone | entering
    counter = jnp.where(entering, jnp.int32(freeze_duration), state.freeze_counter)

    counter_after = counter - 1
    duration_expired = counter_after <= 0
    significant = mag > dead_zone_threshold * 1.5
    accumulated = accum > dead_zone_threshold * 1.2
    exiting = in_dz & (duration_expired | significant | accumulated)

    stay_frozen = in_dz & (~exiting)
    t = jnp.where(stay_frozen, jnp.zeros(3, raw.dtype), raw)

    new_in_dz = in_dz & (~exiting)
    new_counter = jnp.where(exiting, jnp.int32(0),
                            jnp.where(in_dz, counter_after, counter))
    new_accum = jnp.where(exiting, jnp.float32(0.0), accum)

    # --- 2. Micro-shake suppression (applyMicroShakeSuppression, 2468-2503).
    have_median = state.n_history >= 5
    med_x = _median_even_avg(state.trans_history[:, 0],
                             jnp.minimum(state.n_history, HF_HISTORY))
    med_y = _median_even_avg(state.trans_history[:, 1],
                             jnp.minimum(state.n_history, HF_HISTORY))
    median = jnp.where(have_median, jnp.stack([med_x, med_y]),
                       state.median_translation)
    dev = t[:2] - median
    dev_mag = jnp.sqrt(dev[0] ** 2 + dev[1] ** 2)
    residual_scale = jnp.where(dev_mag < shake_px, 0.01,
                               jnp.where(dev_mag < shake_px * 2.0, 0.05, 1.0))
    suppressed_xy = jnp.where(residual_scale < 1.0,
                              median + dev * residual_scale, t[:2])
    t = jnp.concatenate([suppressed_xy, t[2:3]])

    # --- 3. Rotation low-pass (applyRotationLowPass, 2505-2520). -----------
    if horizon_lock:
        rot_lp = (1.0 - rot_lp_alpha) * state.rotation_lp + rot_lp_alpha * t[2]
        t = t.at[2].set(rot_lp)
    else:
        rot_lp = state.rotation_lp

    # --- 4. Translation history update (updateTranslationHistory, 2522-2528).
    slot = state.n_history % HF_HISTORY
    hist = state.trans_history.at[slot].set(t[:2])
    n_hist = state.n_history + 1

    new_state = HFState(
        trans_history=hist,
        n_history=n_hist,
        median_translation=median,
        rotation_lp=jnp.asarray(rot_lp, jnp.float32),
        in_dead_zone=new_in_dz,
        freeze_counter=new_counter,
        motion_accumulator=new_accum,
    )
    return new_state, t

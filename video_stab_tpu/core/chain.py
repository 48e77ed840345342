"""Fused processing chain: enhance -> roll-correct -> stabilize in ONE
jitted step per frame.

The reference runs the chain as separate synchronous calls per frame
(examples/vsg.cpp:1246-1313: enhanceImage, autoCorrectRoll, stabilize —
each with its own GPU upload/download). A naive port does the same with
three jit dispatches and three host<->HBM round-trips per frame. Here the
whole chain is one XLA program over one combined state pytree: the frame
crosses host->HBM once, every stage's intermediate stays on-chip, XLA fuses
the enhancer's pointwise math into its neighbors, and the per-dispatch
overhead (~150-300 us through the runtime per call — measured, DESIGN.md)
is paid once instead of three times.

Used by io.runner.StabilizerApp when `fused=True` (default when all enabled
stages are device-side).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from video_stab_tpu.core.enhancer import enhance_frame
from video_stab_tpu.core.params import (
    EnhancerParams,
    ModeParams,
    RollCorrectionParams,
    StabilizerParams,
)
from video_stab_tpu.core.rollcorrection import (
    RollState,
    estimate_roll_angle,
    roll_state_init,
)
from video_stab_tpu.core.stabilizer import (
    StabilizerState,
    stabilizer_analyze_step_fn,
    stabilizer_emit_step_fn,
    stabilizer_init_step_fn,
)
from video_stab_tpu.core.state import stabilizer_state_init
from video_stab_tpu.ops.color import saturate_u8
from video_stab_tpu.ops.warp import (
    BORDER_REPLICATE,
    rotation_matrix_2d,
    warp_affine,
)


class ChainParams(NamedTuple):
    """Static (hashable) bundle for the fused step."""

    mode: ModeParams
    enhancer: EnhancerParams
    roll: RollCorrectionParams
    stabilizer: StabilizerParams


class ChainState(NamedTuple):
    roll: RollState
    stab: StabilizerState


def chain_state_init(params: ChainParams, height: int, width: int
                     ) -> ChainState:
    return ChainState(
        roll=roll_state_init(),
        stab=stabilizer_state_init(params.stabilizer, height, width),
    )


def _pre_stages(params: ChainParams, state: ChainState,
                frame_u8: jnp.ndarray):
    """Enhance + roll-correct on-chip; returns (roll_state, frame_u8')."""
    f = frame_u8.astype(jnp.float32)
    if params.mode.enhancer_enabled:
        f = enhance_frame(params.enhancer, f)
    roll_state = state.roll
    if params.mode.roll_correction_enabled:
        h, w = f.shape[:2]
        roll_state = estimate_roll_angle(params.roll, roll_state, f)
        rot = rotation_matrix_2d(w / 2.0, h / 2.0, roll_state.smoothed_angle)
        f = warp_affine(f, rot, border_mode=BORDER_REPLICATE)
    return roll_state, saturate_u8(f)


def chain_init_step_fn(params: ChainParams, state: ChainState,
                       frame_u8: jnp.ndarray) -> ChainState:
    roll_state, f = _pre_stages(params, state, frame_u8)
    stab = stabilizer_init_step_fn(params.stabilizer, state.stab, f)
    return ChainState(roll=roll_state, stab=stab)


def chain_step_fn(params: ChainParams, state: ChainState,
                  frame_u8: jnp.ndarray
                  ) -> tuple[ChainState, jnp.ndarray]:
    """Full fused per-frame step (steady state): pre-stages + stabilizer
    analyze + emit, one XLA program."""
    roll_state, f = _pre_stages(params, state, frame_u8)
    if params.mode.stabilizer_enabled:
        stab, _metrics = stabilizer_analyze_step_fn(
            params.stabilizer, state.stab, f)
        stab, out = stabilizer_emit_step_fn(params.stabilizer, stab)
    else:
        stab, out = state.stab, f
    return ChainState(roll=roll_state, stab=stab), out


def chain_analyze_step_fn(params: ChainParams, state: ChainState,
                          frame_u8: jnp.ndarray) -> ChainState:
    """Warm-up variant: pre-stages + analyze WITHOUT emitting, so the
    look-ahead queue actually fills to effective_radius (emitting early
    would advance the cursor and collapse the smoothing look-ahead)."""
    roll_state, f = _pre_stages(params, state, frame_u8)
    stab, _metrics = stabilizer_analyze_step_fn(
        params.stabilizer, state.stab, f)
    return ChainState(roll=roll_state, stab=stab)


chain_init_step = jax.jit(chain_init_step_fn, static_argnums=0,
                          donate_argnums=1)
chain_analyze_step = jax.jit(chain_analyze_step_fn, static_argnums=0,
                             donate_argnums=1)
chain_step = jax.jit(chain_step_fn, static_argnums=0, donate_argnums=1)


class ProcessingChain:
    """Streaming wrapper over the fused chain with the Stabilizer-style
    push API: returns None during the stabilizer warm-up, frames after.

    ``pipelined=True`` adds one frame of latency to overlap the
    device->host transfer of frame i-1 with the compute of frame i (the
    reference's three-CUDA-stream trick, Stabilizer.cpp:100-116, expressed
    through XLA's async dispatch): process() dispatches the current step,
    then materializes the PREVIOUS step's output while the current one runs.
    """

    def __init__(self, mode: ModeParams, enhancer: EnhancerParams,
                 roll: RollCorrectionParams, stabilizer: StabilizerParams,
                 pipelined: bool = False):
        self.params = ChainParams(mode=mode, enhancer=enhancer, roll=roll,
                                  stabilizer=stabilizer)
        self.pipelined = pipelined
        self._pending = None
        self._state: Optional[ChainState] = None
        self._shape = None
        self._frames_in = 0

    def process(self, frame) -> Optional[np.ndarray]:
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        h, w = frame.shape[:2]
        if self._state is None:
            self._state = chain_state_init(self.params, h, w)
            self._shape = (h, w)
        elif self._shape != (h, w):
            raise ValueError("frame size changed; recreate the chain")
        p = self.params
        if p.mode.stabilizer_enabled:
            if self._frames_in == 0:
                self._state = chain_init_step(p, self._state, frame)
                self._frames_in = 1
                return None
            queued = self._frames_in + 1 - int(self._state.stab.emit_idx)
            if queued < p.stabilizer.effective_radius:
                self._state = chain_analyze_step(p, self._state, frame)
                self._frames_in += 1
                return None
        self._state, out = chain_step(p, self._state, frame)
        self._frames_in += 1
        if not self.pipelined:
            return np.asarray(out)
        # Pipelined: hand back the previous frame's output; its transfer
        # overlaps this frame's (already dispatched, async) compute.
        prev, self._pending = self._pending, out
        return np.asarray(prev) if prev is not None else None

    def drain(self) -> Optional[np.ndarray]:
        """Pipelined mode: fetch the final in-flight output."""
        prev, self._pending = self._pending, None
        return np.asarray(prev) if prev is not None else None

    def clean(self):
        self._state = None
        self._shape = None
        self._frames_in = 0
        self._pending = None

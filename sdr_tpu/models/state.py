"""Receiver streaming state pytrees.

The reference scatters streaming state across thread-local vectors and
scalars (inventory in SURVEY §5.4: filter tails src/project.cpp:33-34,114,
demod prev samples src/project.cpp:44-45, PLL scalars src/project.cpp:106-111,
delay lines src/project.cpp:121).  Here the complete state is one pytree
carried through `lax.scan` — which also makes checkpoint/resume free
(serialize the pytree) and removes the reference's cross-stage state-sharing
defect (src/project.cpp:146,172 reuse one audio_state for both the mono and
stereo resamplers).

All leaves have shape batch_shape + (...,) so the same structures serve a
single channel or a sharded batch of channels.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from sdr_tpu.ops.pll import PLLState


class FrontEndState(NamedTuple):
    """RF front end: I/Q channelizer tails + discriminator prev sample."""
    i_tail: jax.Array
    q_tail: jax.Array
    prev_i: jax.Array
    prev_q: jax.Array


class MonoState(NamedTuple):
    """Mono path: IF->audio resampler tail + de-emphasis IIR carry."""
    audio_tail: jax.Array
    deemph: jax.Array


class StereoState(NamedTuple):
    """Stereo path: channel/pilot BPF tails, pilot PLL, mono delay line and a
    *separate* stereo audio resampler tail (deliberate fix of the reference's
    shared audio_state defect; `compat_shared_audio_state` reproduces it)."""
    channel_tail: jax.Array
    carrier_tail: jax.Array
    pll: PLLState
    mono_delay: jax.Array
    stereo_audio_tail: jax.Array
    deemph_l: jax.Array
    deemph_r: jax.Array


class RdsState(NamedTuple):
    """RDS path (spec pp.11-18; reference's dormant rds_thread
    src/project.cpp:200-271 reaches the mixer, the rest is spec-only)."""
    channel_tail: jax.Array      # 54-60 kHz BPF tail
    carrier_tail: jax.Array      # 113.5-114.5 kHz BPF tail
    pll: PLLState                # 57 kHz carrier PLL (114 kHz, scale 0.5)
    delay: jax.Array             # all-pass delay aligning channel vs carrier
    lpf_resamp_tail: jax.Array   # 3 kHz LPF + rational resampler tail
    rrc_tail: jax.Array          # RRC matched-filter tail


class ReceiverState(NamedTuple):
    front: FrontEndState
    mono: MonoState
    stereo: StereoState | None = None
    rds: RdsState | None = None

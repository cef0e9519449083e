"""Time-axis sequence parallelism for the mono chain: halo-exchange
overlap-save over a device mesh.

SURVEY §5.7: the reference scales the unbounded sample stream by block
streaming with carried tails — the ancestor of overlap-save.  The mono chain
(channelize -> discriminator -> audio resample) has *no unbounded
recurrence*: every audio sample depends on a bounded window of past raw
samples (FIR tails + the discriminator's one-sample lookback).  So the time
axis shards exactly: device d processes its contiguous chunk plus a left
halo received from device d-1 via `ppermute`, runs the chain statelessly,
and drops the warm-up outputs.  Bit-identical to the sequential scan
(verified in tests/test_parallel.py) with one neighbor exchange per step —
the ICI-riding pattern the SNIPPETS right-permute kernel demonstrates.

The stereo/RDS chains carry a true sequential recurrence (PLL); those scale
across channels (parallel/channels.py), not time — SURVEY §7 step 7.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sdr_tpu.config import ModeConfig
from sdr_tpu.models.receiver import Receiver


def halo_if(cfg: ModeConfig, if_align: int = 1) -> int:
    """Left-context depth of the mono chain in IF samples.

    audio FIR needs ceil((audio_taps-1)/U) IF samples back, +1 for the
    discriminator's previous sample, + ceil((rf_taps-1)/rf_decim) IF slots
    whose raw windows reach past the halo start; rounded up to a multiple of
    audio_decim (polyphase output-grid phase alignment) and of `if_align`
    (e.g. the fused front-end's 128-sample output tile).
    """
    ctx = (-(-(cfg.audio_taps - 1) // cfg.audio_interp) + 1
           + -(-(cfg.rf_taps - 1) // cfg.rf_decim))
    unit = int(np.lcm(cfg.audio_decim, if_align))
    return -(-ctx // unit) * unit


def halo_pairs(cfg: ModeConfig, if_align: int = 1) -> int:
    """Left-context depth in raw IQ pairs."""
    return halo_if(cfg, if_align) * cfg.rf_decim


def _if_align(rx: Receiver) -> int:
    return rx._fused_fe.out_tile if rx.fused_frontend else 1


def timesharded_mono(rx: Receiver, iq_u8, mesh: Mesh, *, axis: str = "time"):
    """Mono-decode a single station's u8 stream with time sharded over mesh.

    iq_u8: (n,) u8, n divisible by (devices * 2*rf_decim*audio_decim).
    Returns the audio stream, identical to rx.run(iq_u8)['mono'].
    """
    cfg = rx.cfg
    n_dev = mesh.shape[axis]
    n = iq_u8.shape[-1]
    chunk_u8 = n // n_dev
    ia = _if_align(rx)
    align = 2 * cfg.rf_decim * int(np.lcm(cfg.audio_decim, ia))
    assert chunk_u8 % align == 0, (
        f"per-device chunk {chunk_u8} not aligned to {align}")
    halo_u8 = 2 * halo_pairs(cfg, ia)
    warm_audio = halo_if(cfg, ia) * cfg.audio_interp // cfg.audio_decim

    iq = jax.device_put(np.asarray(iq_u8),
                        NamedSharding(mesh, P(axis)))

    @partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
             check_vma=False)
    def run_shard(local):
        local = local.reshape(-1)  # (chunk_u8,)
        tail = local[-halo_u8:]
        # right-shift: device d's tail becomes device d+1's left halo.
        halo = jax.lax.ppermute(tail, axis,
                                perm=[(i, i + 1) for i in range(n_dev - 1)])
        # device 0 receives no halo; u8 value 128 decodes to 0.0, matching
        # the sequential run's zero-filled initial filter tails (ppermute's
        # zero fill would decode to -1.0).
        idx = jax.lax.axis_index(axis)
        halo = jnp.where(idx == 0, jnp.uint8(128), halo)
        extended = jnp.concatenate([halo, local])
        state = rx.init_state()
        _, out = rx.step(state, extended)
        audio = out["mono"][warm_audio:]
        return audio

    return jax.jit(run_shard)(iq)

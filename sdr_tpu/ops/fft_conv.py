"""FFT overlap-save block convolution — the frequency-domain filter engine.

The reference's fourier.cpp FFT family is groundwork for FFT convolution it
never built (SURVEY §2.1 C9); the north star requires both a direct
polyphase FIR and an FFT overlap-save variant.  For U=1 resampling (plain
FIR + decimate) overlap-save is:

  per block: y_full = irfft(rfft([tail, x]) * rfft(h, padded))  then drop
  the first taps-1 warm-up samples and decimate.

Exact to the direct form up to FFT rounding (tested vs PolyphaseResampler).
Most efficient when taps is large; at the reference's 51 taps the MXU
filter-bank usually wins, but the engine is selectable per stage.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class OverlapSaveFIR:
    """Stateful FFT-domain FIR + decimator, drop-in for PolyphaseResampler
    with up=1 (state layout matches: carried tail = last taps-1 inputs)."""

    def __init__(self, coeff: np.ndarray, down: int = 1):
        self.taps = int(len(coeff))
        self.down = int(down)
        self.state_len = self.taps - 1
        self._coeff = np.asarray(coeff, np.float32)
        self._h_freq_cache: dict[int, jax.Array] = {}

    def init_state(self, batch_shape: tuple[int, ...] = ()) -> jax.Array:
        return jnp.zeros(batch_shape + (self.state_len,), dtype=jnp.float32)

    def _h_freq(self, nfft: int) -> jax.Array:
        if nfft not in self._h_freq_cache:
            h = np.zeros(nfft, np.float32)
            h[: self.taps] = self._coeff
            self._h_freq_cache[nfft] = jnp.asarray(np.fft.rfft(h))
        return self._h_freq_cache[nfft]

    def __call__(self, x: jax.Array, tail: jax.Array):
        n = x.shape[-1]
        assert n % self.down == 0
        nfft = int(2 ** np.ceil(np.log2(n + self.state_len)))
        hf = self._h_freq(nfft)
        y = _overlap_save(x, tail, hf, nfft, self.state_len, self.down)
        new_tail = x[..., n - self.state_len:]
        return y, new_tail


@partial(jax.jit, static_argnums=(3, 4, 5))
def _overlap_save(x, tail, h_freq, nfft, state_len, down):
    n = x.shape[-1]
    xp = jnp.concatenate([tail, x], axis=-1)
    xf = jnp.fft.rfft(xp, n=nfft, axis=-1)
    y_full = jnp.fft.irfft(xf * h_freq, n=nfft, axis=-1)
    # output sample m of the streaming FIR = y_full[state_len + m]
    y = jax.lax.dynamic_slice_in_dim(y_full, state_len, n, axis=-1)
    if down > 1:
        y = y[..., ::down]
    return y.astype(jnp.float32)

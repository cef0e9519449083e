"""Pallas kernel equivalence tests (interpret mode on CPU; the same kernels
compile natively on TPU — exercised by bench.py and the driver's entry)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdr_tpu.io.gen import generate_sin
from sdr_tpu.ops.pll import pll, pll_init
from sdr_tpu.ops.pallas.pll_kernel import pll_pallas

INTERP = jax.default_backend() != "tpu"


def test_pll_pallas_matches_scan_single():
    fs = 240e3
    pilot = generate_sin(fs, 19e3, 2048, amplitude=0.5)
    ref, ref_st = pll(jnp.asarray(pilot), pll_init(), freq=19e3, fs=fs,
                      nco_scale=2.0)
    out, st = pll_pallas(jnp.asarray(pilot), pll_init(), freq=19e3, fs=fs,
                         nco_scale=2.0, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    np.testing.assert_allclose(float(st.phase_acc), float(ref_st.phase_acc),
                               atol=1e-3)


def test_pll_pallas_batched_and_chunked():
    fs = 240e3
    x = np.stack([generate_sin(fs, 19e3, 3000, amplitude=0.4),
                  generate_sin(fs, 19e3, 3000, amplitude=0.4, phase=1.2),
                  generate_sin(fs, 18990.0, 3000, amplitude=0.3)])
    ref, _ = pll(jnp.asarray(x), pll_init((3,)), freq=19e3, fs=fs,
                 nco_scale=2.0)
    # chunk=1000 forces the outer scan path (3 chunks)
    out, _ = pll_pallas(jnp.asarray(x), pll_init((3,)), freq=19e3, fs=fs,
                        nco_scale=2.0, chunk=1000, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_pll_pallas_chunked_matches_xla_chunked():
    """The VMEM chunked kernel implements the same frozen-feedback math as
    ops.pll.pll_chunked (atan2 differs by the ~1e-5 rad polynomial)."""
    from sdr_tpu.ops.pll import pll_chunked
    from sdr_tpu.ops.pallas.pll_kernel import pll_pallas_chunked
    fs = 240e3
    x = np.stack([generate_sin(fs, 19e3, 6400, amplitude=0.4),
                  generate_sin(fs, 19e3, 6400, amplitude=0.4, phase=1.2)])
    ref, ref_st = pll_chunked(jnp.asarray(x), pll_init((2,)), freq=19e3,
                              fs=fs, nco_scale=2.0, chunk=32)
    out, st = pll_pallas_chunked(jnp.asarray(x), pll_init((2,)), freq=19e3,
                                 fs=fs, nco_scale=2.0, chunk=32,
                                 interpret=INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-3)
    np.testing.assert_allclose(np.asarray(st.phase_acc),
                               np.asarray(ref_st.phase_acc), atol=3e-3)


def test_pll_pallas_chunked_block_continuity():
    from sdr_tpu.ops.pallas.pll_kernel import pll_pallas_chunked
    fs = 240e3
    pilot = generate_sin(fs, 19e3, 6400, amplitude=0.5)
    full, _ = pll_pallas_chunked(jnp.asarray(pilot), pll_init(), freq=19e3,
                                 fs=fs, nco_scale=2.0, interpret=INTERP)
    a, st = pll_pallas_chunked(jnp.asarray(pilot[:3200]), pll_init(),
                               freq=19e3, fs=fs, nco_scale=2.0,
                               interpret=INTERP)
    b, _ = pll_pallas_chunked(jnp.asarray(pilot[3200:]), st, freq=19e3,
                              fs=fs, nco_scale=2.0, interpret=INTERP)
    np.testing.assert_allclose(
        np.asarray(full), np.concatenate([np.asarray(a), np.asarray(b)]),
        atol=1e-3)


def test_pll_pallas_block_continuity():
    """Two chained calls == one call (state carry across kernel launches)."""
    fs = 240e3
    pilot = generate_sin(fs, 19e3, 2000, amplitude=0.5)
    full, _ = pll_pallas(jnp.asarray(pilot), pll_init(), freq=19e3, fs=fs,
                         nco_scale=2.0, interpret=INTERP)
    a, st = pll_pallas(jnp.asarray(pilot[:1000]), pll_init(), freq=19e3,
                       fs=fs, nco_scale=2.0, interpret=INTERP)
    b, _ = pll_pallas(jnp.asarray(pilot[1000:]), st, freq=19e3, fs=fs,
                      nco_scale=2.0, interpret=INTERP)
    np.testing.assert_allclose(
        np.asarray(full), np.concatenate([np.asarray(a), np.asarray(b)]),
        atol=1e-3)

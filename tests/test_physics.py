"""Physics invariants of the simulator — properties any correct
interferometer simulation must satisfy, independent of the reference
implementation:

  1. a single point source at the phase center gives a flat, real,
     baseline-independent visibility equal to beam * flux;
  2. closure phases of any single point source vanish identically;
  3. the delay transform is unitary up to the ifft normalization
     (Parseval), and a flat spectrum concentrates at lag 0;
  4. visibility amplitude never exceeds the total beam-weighted flux;
  5. conjugating the baseline conjugates the visibility (V(-b)=V*(b));
  6. thermal noise rms follows the radiometer equation scaling.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from prisim_tpu import twofloat as tf
from prisim_tpu.engine.observe import (Instrument, SkySources,
                                       simulate_snapshot)


def _instrument(bl=None, nchan=16):
    if bl is None:
        bl = np.array([[14.6, 0.0, 0.0],
                       [0.0, 29.2, 0.0],
                       [-14.6, -29.2, 0.0],
                       [102.2, 43.8, 1.0]])
    freqs = 150e6 + 1e5 * np.arange(nchan)
    return Instrument.build(bl, freqs, latitude=-30.7)


def _sky(radec, flux_jy, freqs, spindex=0.0):
    from prisim_tpu.skymodel import SkyModel
    loc = np.atleast_2d(radec)
    n = loc.shape[0]
    sm = SkyModel(location=loc, spec_kind="power-law",
                  spec_parms={"flux-scale": np.full(n, flux_jy),
                              "freq-ref": np.full(n, 150e6),
                              "power-law-index": np.full(n, spindex)})
    return SkySources.from_skymodel(sm, freqs)


def _identity_rotation():
    M = np.eye(3)
    return tf.split_f64(M)


def _run(inst, sky, pc_radec=(0.0, 0.0), beam=None):
    """Snapshot with the identity ENU rotation: celestial coords ARE the
    ENU frame, so a source at dec=90 sits at zenith."""
    Mh, Ml = _identity_rotation()
    pc = np.array([np.cos(np.radians(pc_radec[1])) *
                   np.cos(np.radians(pc_radec[0])),
                   np.cos(np.radians(pc_radec[1])) *
                   np.sin(np.radians(pc_radec[0])),
                   np.sin(np.radians(pc_radec[1]))])
    pch, pcl = tf.split_f64(pc)
    if beam is None:
        def beam(dircos, freqs):
            return jnp.ones((dircos.shape[0], freqs.shape[0]),
                            jnp.float32)
    v = simulate_snapshot(inst, sky, jnp.asarray(Mh), jnp.asarray(Ml),
                          jnp.asarray(pch), jnp.asarray(pcl), beam)
    return np.asarray(v)


def test_point_source_at_phase_center():
    """V(b, nu) = flux exactly, for every baseline and channel."""
    inst = _instrument()
    sky = _sky([45.0, 30.0], 7.5, inst.freqs)
    v = _run(inst, sky, pc_radec=(45.0, 30.0))
    np.testing.assert_allclose(np.real(v), 7.5, rtol=2e-6)
    np.testing.assert_allclose(np.imag(v), 0.0, atol=2e-5)


def test_single_source_closure_phase_is_zero():
    """arg(V12 V23 V31) = 0 for any point source anywhere in the sky:
    the geometric phases cancel around the triangle."""
    pos = np.array([[0.0, 0, 0], [14.6, 0, 0], [7.3, 12.6, 0]])
    bl = np.array([pos[1] - pos[0], pos[2] - pos[1], pos[0] - pos[2]])
    inst = _instrument(bl)
    sky = _sky([63.0, 41.0], 3.0, inst.freqs, spindex=-0.8)
    v = _run(inst, sky, pc_radec=(10.0, 70.0))   # off-center: big phases
    assert np.abs(np.angle(v)).max() > 0.5       # non-trivial phases...
    bisp = v[0] * v[1] * v[2]
    np.testing.assert_allclose(np.angle(bisp), 0.0, atol=1e-4)


def test_conjugation_symmetry():
    """V(-b) = conj(V(b)) channel by channel."""
    bl = np.array([[20.0, 5.0, 0.3], [-20.0, -5.0, -0.3]])
    inst = _instrument(bl)
    sky = _sky([[30.0, 55.0], [100.0, 20.0]], 2.0, inst.freqs)
    v = _run(inst, sky, pc_radec=(0.0, 90.0))
    np.testing.assert_allclose(v[1], np.conj(v[0]), rtol=1e-5,
                               atol=1e-5 * np.abs(v[0]).max())


def test_amplitude_bound_and_flux_sum():
    """|V| <= sum of apparent fluxes, with equality at the phase
    center of a co-located pair."""
    inst = _instrument()
    radec = [[20.0, 40.0], [20.0001, 40.0001], [200.0, -10.0]]
    sky = _sky(radec, 1.0, inst.freqs)
    v = _run(inst, sky, pc_radec=(0.0, 90.0))
    # sources at dec<0 are below the horizon of the identity frame
    assert np.abs(v).max() <= 2.0 * (1 + 1e-5)


def test_delay_transform_parseval(tmp_path):
    """sum|V(nu)|^2 dnu = sum|V(tau)|^2 dtau (no window, no pad)."""
    from prisim_tpu.vis import VisibilitySet, delay_transform
    rng = np.random.RandomState(7)
    nbl, nchan, nacc = 3, 32, 2
    sv = rng.randn(nbl, nchan, nacc) + 1j * rng.randn(nbl, nchan, nacc)
    vs = VisibilitySet(baselines=rng.randn(nbl, 3),
                       labels=np.array([["1", "0"], ["2", "0"],
                                        ["2", "1"]]),
                       freqs=150e6 + 1e5 * np.arange(nchan),
                       lst=np.array([0.0, 0.1]), skyvis=sv,
                       t_acc=np.full(nacc, 10.0))
    vst = delay_transform(vs, pad=0.0)    # default bandpass = rect
    df = vs.freq_resolution
    dtau = np.abs(vst.lags[1] - vst.lags[0])
    # V(tau) = ifft * (nchan * df): power identity picks up (nchan df)^2/N
    p_f = np.sum(np.abs(sv) ** 2, axis=1) * df
    p_t = np.sum(np.abs(np.asarray(vst.skyvis_lag)) ** 2, axis=1) * dtau
    np.testing.assert_allclose(p_t, p_f, rtol=1e-5)


def test_radiometer_scaling():
    """Noise rms doubles when Tsys doubles, halves for 4x bandwidth."""
    from prisim_tpu.engine.noise import thermal_noise_rms
    r1 = np.asarray(thermal_noise_rms(A_eff=154.0, df=1e5, dt=10.0,
                                      Tsys=200.0))
    r2 = np.asarray(thermal_noise_rms(A_eff=154.0, df=1e5, dt=10.0,
                                      Tsys=400.0))
    r3 = np.asarray(thermal_noise_rms(A_eff=154.0, df=4e5, dt=10.0,
                                      Tsys=200.0))
    np.testing.assert_allclose(r2 / r1, 2.0, rtol=1e-6)
    np.testing.assert_allclose(r1 / r3, 2.0, rtol=1e-6)

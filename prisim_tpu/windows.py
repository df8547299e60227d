"""Spectral windows, FFT axes and resampling helpers.

Replaces the reference's external ``astroutils.DSP_modules`` usage:
``spectral_axis`` / ``FT1D`` / ``downsampler`` / ``windowing`` /
``window_fftpow`` / ``window_N2width`` (used in
/root/reference/prisim/interferometry.py:8105-8136 and
/root/reference/prisim/delay_spectrum.py:1842-2500).

Conventions:
  * The delay transform is an inverse FFT along the frequency axis scaled by
    (nchan * df), i.e. a Riemann-sum approximation of the continuous inverse
    Fourier integral in Jy*Hz, with fftshifted delay (lag) axis.
  * Window "fftpow" raises the base window to an elementwise power; the
    effective (noise-equivalent) fractional width of a window is
    (sum w)^2 / (N * sum w^2) — 1.0 for rect, ~0.5 for Blackman-Harris.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_WINDOW_COEFFS = {
    # 4-term Blackman-Harris (minimum sidelobe).
    "bhw": (0.35875, 0.48829, 0.14128, 0.01168),
    # Blackman-Nuttall.
    "bnw": (0.3635819, 0.4891775, 0.1365995, 0.0106411),
}


def spectral_axis(nchan, delx=1.0, shift=True, xp=np):
    """Conjugate (delay/lag) axis of an nchan FFT with bin width delx (Hz).

    Returns lags in seconds; fftshifted (monotonic) when shift=True.
    """
    lags = xp.fft.fftfreq(nchan, d=delx)
    if shift:
        lags = xp.fft.fftshift(lags)
    return lags


def window_vals(n_window, shape="bhw", fftpow=1.0, xp=np):
    """Raw window samples of the given shape and fftpow, peak ~1."""
    shape = shape.lower()
    if shape == "rect":
        w = xp.ones(n_window, dtype=xp.float32 if xp is jnp else np.float64)
        return w
    if shape not in _WINDOW_COEFFS:
        raise ValueError(f"unsupported window shape: {shape!r}")
    a0, a1, a2, a3 = _WINDOW_COEFFS[shape]
    # Periodic phase over the window span (DFT-even), matching scipy's
    # sym=False convention used for spectral analysis.
    x = 2.0 * xp.pi * xp.arange(n_window) / n_window
    w = a0 - a1 * xp.cos(x) + a2 * xp.cos(2 * x) - a3 * xp.cos(3 * x)
    if fftpow != 1.0:
        w = w ** fftpow
    return w


def window_frac_width(shape="bhw", fftpow=1.0, n=4096):
    """Noise-equivalent fractional width (sum w)^2/(N sum w^2) of a window."""
    w = window_vals(n, shape=shape, fftpow=fftpow, xp=np)
    return float(np.sum(w) ** 2 / (n * np.sum(w ** 2)))


def window_n2width(shape="bhw", fftpow=1.0):
    """Alias matching the reference's DSP.window_N2width semantics
    (fractional effective width; see
    /root/reference/prisim/interferometry.py:7320-7324)."""
    return window_frac_width(shape=shape, fftpow=fftpow)


def subband_window(channels, freq_center, bw_eff, shape="bhw", fftpow=1.0,
                   xp=np):
    """Frequency weights for one spectral subband over the full channel axis.

    Builds a window of effective bandwidth bw_eff centered at freq_center,
    normalized so sum(w^2) = frac_width * n_window (the reference's
    sqrt(frac_width*n_window) x power-normalized scaling,
    /root/reference/prisim/interferometry.py:7329-7342).
    Host-side (numpy) by default; the result is a static weight vector.
    """
    channels = np.asarray(channels, dtype=np.float64)
    df = channels[1] - channels[0]
    nchan = channels.size
    frac_width = window_frac_width(shape=shape, fftpow=fftpow)
    n_window = int(np.round(bw_eff / df / frac_width))
    n_window = max(1, min(n_window, nchan))
    w = window_vals(n_window, shape=shape, fftpow=fftpow, xp=np)
    w = w / np.sqrt(np.sum(w ** 2))  # power normalize
    w = np.sqrt(frac_width * n_window) * w
    ic = int(np.argmin(np.abs(channels - freq_center)))
    full = np.zeros(nchan, dtype=np.float64)
    lo = ic - n_window // 2
    for j in range(n_window):
        k = lo + j
        if 0 <= k < nchan:
            full[k] = w[j]
    return full if xp is np else xp.asarray(full, dtype=xp.float32)


def ifft_delay_transform(vis, df, pad=0.0, axis=1, xp=jnp):
    """Delay transform: IFFT along `axis`, scaled by (n_padded * df), with
    fftshift, optionally zero-padded by `pad` fraction then downsampled by
    (1+pad) — mirroring InterferometerArray.delay_transform
    (/root/reference/prisim/interferometry.py:8105-8131)."""
    nchan = vis.shape[axis]
    if pad > 0.0:
        npad = int(nchan * pad)
        padspec = [(0, 0)] * vis.ndim
        padspec[axis] = (0, npad)
        vis = xp.pad(vis, padspec)
    n_tot = vis.shape[axis]
    lag = xp.fft.fftshift(xp.fft.ifft(vis, axis=axis), axes=axis) * (n_tot * df)
    if pad > 0.0:
        lag = downsample_fourier(lag, nchan, axis=axis, xp=xp)
    return lag


def downsample_fourier(arr, n_out, axis=0, xp=jnp):
    """Band-limited resampling of a (delay-domain) array to n_out samples
    along axis via FFT truncation (astroutils ``downsampler`` equivalent)."""
    n_in = arr.shape[axis]
    if n_in == n_out:
        return arr
    spec = xp.fft.fft(xp.fft.ifftshift(arr, axes=axis), axis=axis)
    keep_lo = (n_out + 1) // 2
    keep_hi = n_out - keep_lo
    idx_lo = [slice(None)] * arr.ndim
    idx_hi = [slice(None)] * arr.ndim
    idx_lo[axis] = slice(0, keep_lo)
    idx_hi[axis] = slice(n_in - keep_hi, n_in)
    spec_ds = xp.concatenate([spec[tuple(idx_lo)], spec[tuple(idx_hi)]],
                             axis=axis)
    out = xp.fft.fftshift(xp.fft.ifft(spec_ds, axis=axis), axes=axis)
    return out * (n_out / n_in)


def pfb_shape(nchan, coarse_channel_width=16, ntaps=8, xp=np):
    """Analytic polyphase-filter-bank bandpass shape (peak ~1).

    Stand-in for the reference's empirical MWA PFB table
    (DSP.PFB_empirical / MWA_pfb_512x8.fits, used at
    /root/reference/scripts/run_prisim.py:911-925): each coarse channel
    of `coarse_channel_width` fine channels carries the magnitude
    response of an ntaps-tap sinc-Hamming prototype filter, giving the
    characteristic scalloped bandpass with minima at coarse-channel
    edges."""
    W = int(coarse_channel_width)
    # prototype filter: ntaps*W sinc taps windowed by Hamming
    n = ntaps * W
    t = (np.arange(n) - (n - 1) / 2.0) / W
    proto = np.sinc(t) * np.hamming(n)
    # response across one coarse channel: |H(f)| at W fine offsets
    # f in [-1/2, 1/2) coarse-channel units
    f = (np.arange(W) - W / 2.0 + 0.5) / W
    ph = np.exp(-2j * np.pi * np.outer(f, np.arange(n) / W))
    resp = np.abs(ph @ proto)
    resp = resp / resp.max()
    reps = -(-nchan // W)
    full = np.tile(resp, reps)[:nchan]
    return full if xp is np else xp.asarray(full, dtype=xp.float32)


def pfb_theoretical_shape(path, freqs):
    """Measured ('theoretical') PFB bandpass shape from a FITS table.

    Format per the reference's pfb_method='theoretical' branch
    (/root/reference/scripts/run_prisim.py:916-927): HDU 0 is a 2-D
    image of per-filter responses in dB (rows = frequency samples,
    columns = filters); HDU 1 is the 1-D frequency axis in MHz. Each
    column is peak-normalized in dB, the columns are summed in linear
    units, and the resulting window is interpolated onto the simulated
    channels (Hz) within [0.9 min, 1.1 max] of the band. Peak-normalized
    to 1 on return."""
    from .io.fitsio import read_fits
    hdus = [h for h in read_fits(path) if "data" in h]
    if len(hdus) < 2:
        raise ValueError("PFB file needs response + frequency HDUs")
    pfbdata = np.asarray(hdus[0]["data"], dtype=np.float64)
    pfbfreq = np.asarray(hdus[1]["data"], dtype=np.float64).ravel()
    pfbdata = np.atleast_2d(pfbdata)
    if pfbdata.shape[0] != pfbfreq.size and pfbdata.shape[1] == \
            pfbfreq.size:
        pfbdata = pfbdata.T
    norm = pfbdata.max(axis=0, keepdims=True)
    pfbwin = 10.0 * np.log10(np.sum(10.0 ** ((pfbdata - norm) / 10.0),
                                    axis=1))
    freqs = np.asarray(freqs, dtype=np.float64)
    ghz = freqs / 1e9
    lo, hi = 0.9 * ghz.min(), 1.1 * ghz.max()
    use = (pfbfreq >= lo * 1e3) & (pfbfreq <= hi * 1e3)
    if not use.any():
        raise ValueError("PFB table does not cover the simulated band")
    win = np.interp(ghz, pfbfreq[use] / 1e3, pfbwin[use])
    shape = 10.0 ** (win / 10.0)
    return shape / shape.max()

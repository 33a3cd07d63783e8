"""Parks-McClellan (Remez exchange) FIR design + the optfir helpers.

Reference parity:
  gr-filter/lib/pm_remez.cc — pm_remez(order, bands, ampl, weight, type,
      grid_density); bands on [0, 1] with 1 = Nyquist (Fs/2).
  gr-filter/python/filter/optfir.py — low_pass/band_pass/complex_band_pass/
      high_pass designers: estimate the order with remezord (Herrmann/
      Rabiner-Gold lporder formula), then run the exchange, adding 2 taps
      of margin.

The exchange itself is scipy.signal.remez (same algorithm family as the
reference's C port of the classic Parks-McClellan code); this module adapts
the GR calling conventions and implements remezord/lporder from the
published formulas (Rabiner & Gold 1975), matching optfir.py's behavior.
Tap design is host-side float64 (SURVEY.md App. C).
"""
from __future__ import annotations

import math

import numpy as np
import scipy.signal


def pm_remez(order: int, bands, ampl, error_weight=None,
             filter_type: str = "bandpass", grid_density: int = 16):
    """gr::filter::pm_remez analog. bands: [b1 e1 b2 e2 ...] on [0,1]
    (1 = Nyquist); ampl: desired amplitude at each band edge; weight: one
    entry per band. Returns `order`+1 taps (float64)."""
    bands = np.asarray(bands, np.float64)
    ampl = np.asarray(ampl, np.float64)
    nbands = bands.size // 2
    if error_weight is None:
        error_weight = np.ones(nbands)
    # scipy's remez: bands on [0, 0.5] of Fs; desired = one value per band
    desired = ampl[::2]
    taps = scipy.signal.remez(order + 1, bands * 0.5, desired,
                              weight=np.asarray(error_weight, np.float64),
                              type={"bandpass": "bandpass",
                                    "hilbert": "hilbert",
                                    "differentiator": "differentiator"}[
                                  filter_type],
                              grid_density=grid_density, fs=1.0)
    return taps


# ---------------------------------------------------------------------------
# optfir (remezord-based designers)
# ---------------------------------------------------------------------------

def lporder(freq1: float, freq2: float, delta_p: float, delta_s: float):
    """FIR lowpass order estimate (Herrmann et al.), optfir.py lporder."""
    df = abs(freq2 - freq1)
    ddp = math.log10(delta_p)
    dds = math.log10(delta_s)
    a1, a2, a3 = 5.309e-3, 7.114e-2, -4.761e-1
    a4, a5, a6 = -2.66e-3, -5.941e-1, -4.278e-1
    b1, b2 = 11.01217, 0.5124401
    t1 = a1 * ddp * ddp
    t2 = a2 * ddp
    t3 = a4 * ddp * ddp
    t4 = a5 * ddp
    dinf = ((t1 + t2 + a3) * dds) + (t3 + t4 + a6)
    ff = b1 + b2 * (ddp - dds)
    n = dinf / df - ff * df + 1
    return n


def remezord(fcuts, mags, devs, fsamp: float = 2.0):
    """Order estimator (optfir.py remezord semantics): fcuts = transition
    band edges (Hz), mags = band magnitudes, devs = ripple per band.
    Returns (n, bands[0..1], desired ampls, weights)."""
    fcuts = [f / fsamp for f in fcuts]
    nf = len(fcuts)
    nm = len(mags)
    nbands = nm
    if len(devs) != nm:
        raise ValueError("length of mags and devs must be equal")
    if nf != 2 * (nbands - 1):
        raise ValueError("invalid number of band edges")
    devs = list(devs)
    for i, m in enumerate(mags):
        if m:
            devs[i] = devs[i] / m
    # worst-case transition band
    f1 = fcuts[0::2]
    f2 = fcuts[1::2]
    n = 0
    min_delta = 2.0
    for i in range(len(f1)):
        if f2[i] - f1[i] < min_delta:
            n = i
            min_delta = f2[i] - f1[i]
    if nbands == 2:
        l = lporder(f1[n], f2[n], devs[0], devs[1])
    else:
        l = 0
        for i in range(1, nbands - 1):
            l1 = lporder(f1[i - 1], f2[i - 1], devs[i], devs[i - 1])
            l2 = lporder(f1[i], f2[i], devs[i], devs[i + 1])
            l = max(l, max(l1, l2))
    n = int(math.ceil(l)) - 1  # need order, not length
    # cook up remez-compatible band/ampl/weight arrays
    ff = [0.0] + [2 * f for f in fcuts] + [1.0]
    aa = []
    for a in mags:
        aa += [a, a]
    max_dev = max(devs)
    wts = [max_dev / d for d in devs]
    return n, ff, aa, wts


def _optfir_run(n, ff, aa, wts, nextra: int = 2):
    return pm_remez(n + nextra, ff, aa, wts, "bandpass")


def low_pass(gain, Fs, freq1, freq2, passband_ripple_db, stopband_atten_db,
             nextra_taps: int = 2):
    """optfir.low_pass: minimax lowpass from ripple/attenuation specs."""
    passband_dev = passband_ripple_to_dev(passband_ripple_db)
    stopband_dev = stopband_atten_to_dev(stopband_atten_db)
    n, ff, aa, wts = remezord([freq1, freq2], [gain, 0],
                              [passband_dev, stopband_dev], Fs)
    return _optfir_run(n, ff, aa, wts, nextra_taps)


def high_pass(gain, Fs, freq1, freq2, stopband_atten_db, passband_ripple_db,
              nextra_taps: int = 2):
    passband_dev = passband_ripple_to_dev(passband_ripple_db)
    stopband_dev = stopband_atten_to_dev(stopband_atten_db)
    n, ff, aa, wts = remezord([freq1, freq2], [0, gain],
                              [stopband_dev, passband_dev], Fs)
    # high pass needs odd number of taps (even order)
    if (n + 2) % 2 == 1:
        n += 1
    return _optfir_run(n, ff, aa, wts, 2)


def band_pass(gain, Fs, freq_sb1, freq_pb1, freq_pb2, freq_sb2,
              passband_ripple_db, stopband_atten_db, nextra_taps: int = 2):
    passband_dev = passband_ripple_to_dev(passband_ripple_db)
    stopband_dev = stopband_atten_to_dev(stopband_atten_db)
    desired_ampls = [0, gain, 0]
    devs = [stopband_dev, passband_dev, stopband_dev]
    n, ff, aa, wts = remezord([freq_sb1, freq_pb1, freq_pb2, freq_sb2],
                              desired_ampls, devs, Fs)
    return _optfir_run(n, ff, aa, wts, nextra_taps)


def complex_band_pass(gain, Fs, freq_sb1, freq_pb1, freq_pb2, freq_sb2,
                      passband_ripple_db, stopband_atten_db,
                      nextra_taps: int = 2):
    """optfir.complex_band_pass: design the lowpass prototype at half the
    bandwidth and rotate it up to the band center."""
    center_freq = (freq_pb2 + freq_pb1) / 2.0
    lp_pb = (freq_pb2 - center_freq) / 1.0
    lp_sb = freq_sb2 - center_freq
    lptaps = low_pass(gain, Fs, lp_pb, lp_sb, passband_ripple_db,
                      stopband_atten_db, nextra_taps)
    n = np.arange(len(lptaps))
    spinner = np.exp(2j * np.pi * center_freq / Fs * n)
    return lptaps * spinner


def passband_ripple_to_dev(ripple_db: float) -> float:
    return (10 ** (ripple_db / 20) - 1) / (10 ** (ripple_db / 20) + 1)


def stopband_atten_to_dev(atten_db: float) -> float:
    return 10 ** (-atten_db / 20)

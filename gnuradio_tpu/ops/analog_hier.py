"""gr-analog Python hier blocks (round-4 catalog fills): am_demod_cf,
fm_demod_cf, nbfm_rx/tx, standard_squelch, wfm_rcv_pll.

Reference behavior (reimplemented from the hier wiring, not copied):
  gr-analog/python/analog/am_demod.py:30-48   — complex_to_mag ->
      add_const(-1) DC removal -> decimating audio LPF (optfir in the
      reference; windowed-sinc here — same passband spec, documented
      substitution since optfir's remez wrapper tolerances differ at the
      ripple level, inside the QA SNR bound)
  gr-analog/python/analog/fm_demod.py:21-65   — quadrature_demod(gain =
      quad/(2 pi deviation)) -> fm_deemph -> decimating audio LPF
  gr-analog/python/analog/nbfm_rx.py:45-80    — quad demod k =
      quad_rate/(2 pi max_dev) -> deemph -> audio LPF decim
  gr-analog/python/analog/nbfm_tx.py          — interp FIR audio->quad ->
      preemph -> frequency_modulator(2 pi max_dev/quad_rate)
  gr-analog/python/analog/standard_squelch.py:15-60 — parallel low/high
      tone IIRs, squared + smoothed, (lo-hi)/(lo+hi) ratio -> hysteresis
      gate -> smoothed gain multiply
  gr-analog/python/analog/wfm_rcv_pll.py:25-170 — pll_freqdet FM demod,
      19 kHz pilot pick-off (complex band-pass) -> pll_refout -> squared
      carrier at -38 kHz, DSBSC band-pass mix -> baseband L-R; audio LPF
      -> L+R; deemphasized sum/difference -> L, R.
"""
from __future__ import annotations

import math

import numpy as np

from ..core.hier import HierBlock
from ..core.stream import PortSpec, C, F
from . import firdes
from .analog import (QuadratureDemod, fm_deemph, fm_preemph,
                     frequency_modulator_fc, quadrature_demod_cf)
from .analog_extra import pll_freqdet_cf, pll_refout_cc
from .blocks import (add, add_const, complex_to_mag, complex_to_real,
                     divide, float_to_complex, multiply, sub)
from .blocks_extra import threshold_ff
from .filter import (FirFilter, SinglePoleIir, fir_filter_fff,
                     interp_fir_filter_fff, iir_filter_ffd,
                     single_pole_iir_filter_ff)


class AmDemodCf(HierBlock):
    """am_demod_cf (am_demod.py:30-48)."""

    def __init__(self, channel_rate, audio_decim, audio_pass, audio_stop,
                 name=None):
        super().__init__(name or "am_demod_cf",
                         in_ports=(PortSpec(C),), out_ports=(PortSpec(F),))
        mag = complex_to_mag()
        dcr = add_const(-1.0, dtype=F)
        width = max(float(audio_stop) - float(audio_pass), 1.0)
        taps = firdes.low_pass(0.5, channel_rate, audio_pass, width,
                               firdes.WIN_HAMMING)
        lpf = fir_filter_fff(int(audio_decim), taps)
        self.connect((self, 0), mag, dcr, lpf, (self, 0))


def am_demod_cf(channel_rate, audio_decim, audio_pass=5000, audio_stop=5500,
                **_):
    return AmDemodCf(channel_rate, audio_decim, audio_pass, audio_stop)


def demod_10k0a3e_cf(channel_rate, audio_decim, **_):
    return AmDemodCf(channel_rate, audio_decim, 5000, 5500)


class FmDemodCf(HierBlock):
    """fm_demod_cf (fm_demod.py:21-65)."""

    def __init__(self, channel_rate, audio_decim, deviation, audio_pass,
                 audio_stop, gain=1.0, tau=75e-6, name=None):
        super().__init__(name or "fm_demod_cf",
                         in_ports=(PortSpec(C),), out_ports=(PortSpec(F),))
        k = channel_rate / (2 * math.pi * deviation)
        demod = quadrature_demod_cf(k)
        width = max(float(audio_stop) - float(audio_pass), 1.0)
        taps = firdes.low_pass(gain, channel_rate, audio_pass, width,
                               firdes.WIN_HAMMING)
        lpf = fir_filter_fff(int(audio_decim), taps)
        if tau is not None and tau > 0:
            deemph = fm_deemph(channel_rate, tau)
            self.connect((self, 0), demod, deemph, lpf, (self, 0))
        else:
            self.connect((self, 0), demod, lpf, (self, 0))


def fm_demod_cf(channel_rate, audio_decim, deviation=75000,
                audio_pass=15000, audio_stop=16000, gain=1.0, tau=75e-6,
                **_):
    return FmDemodCf(channel_rate, audio_decim, deviation, audio_pass,
                     audio_stop, gain, tau)


class NbfmRx(HierBlock):
    """nbfm_rx (nbfm_rx.py:45-80)."""

    def __init__(self, audio_rate, quad_rate, tau=75e-6, max_dev=5e3,
                 name=None):
        super().__init__(name or "nbfm_rx",
                         in_ports=(PortSpec(C),), out_ports=(PortSpec(F),))
        audio_rate, quad_rate = int(audio_rate), int(quad_rate)
        if quad_rate % audio_rate:
            raise ValueError("quad_rate must be an integer multiple of "
                             "audio_rate (nbfm_rx.py)")
        k = quad_rate / (2 * math.pi * max_dev)
        demod = quadrature_demod_cf(k)
        deemph = fm_deemph(quad_rate, tau)
        decim = quad_rate // audio_rate
        taps = firdes.low_pass(1.0, quad_rate, 2.7e3, 0.5e3,
                               firdes.WIN_HAMMING)
        lpf = fir_filter_fff(decim, taps)
        self.connect((self, 0), demod, deemph, lpf, (self, 0))


def nbfm_rx(audio_rate, quad_rate, tau=75e-6, max_dev=5e3, **_):
    return NbfmRx(audio_rate, quad_rate, tau, max_dev)


class NbfmTx(HierBlock):
    """nbfm_tx (nbfm_tx.py): audio -> interp FIR -> preemph -> freq mod."""

    def __init__(self, audio_rate, quad_rate, tau=75e-6, max_dev=5e3,
                 fh=-1.0, name=None):
        super().__init__(name or "nbfm_tx",
                         in_ports=(PortSpec(F),), out_ports=(PortSpec(C),))
        audio_rate, quad_rate = int(audio_rate), int(quad_rate)
        if quad_rate % audio_rate:
            raise ValueError("quad_rate must be an integer multiple of "
                             "audio_rate (nbfm_tx.py)")
        interp = quad_rate // audio_rate
        k = 2 * math.pi * max_dev / quad_rate
        pre = fm_preemph(quad_rate, tau=tau, fh=fh)
        mod = frequency_modulator_fc(k)
        if interp > 1:
            taps = firdes.low_pass(interp, quad_rate, 4500, 2500,
                                   firdes.WIN_HAMMING)
            it = interp_fir_filter_fff(interp, taps)
            self.connect((self, 0), it, pre, mod, (self, 0))
        else:
            self.connect((self, 0), pre, mod, (self, 0))


def nbfm_tx(audio_rate, quad_rate, tau=75e-6, max_dev=5e3, fh=-1.0, **_):
    return NbfmTx(audio_rate, quad_rate, tau, max_dev, fh)


class StandardSquelch(HierBlock):
    """standard_squelch (standard_squelch.py:15-60): gate audio by the
    low-tone/high-tone energy ratio with hysteresis."""

    def __init__(self, audio_rate, name=None):
        super().__init__(name or "standard_squelch",
                         in_ports=(PortSpec(F),), out_ports=(PortSpec(F),))
        low_iir = iir_filter_ffd((0.0193, 0, -0.0193), (1, 1.9524, -0.9615))
        low_sq = multiply(dtype=F)
        low_sm = single_pole_iir_filter_ff(1 / (0.01 * audio_rate))
        hi_iir = iir_filter_ffd((0.0193, 0, -0.0193), (1, 1.3597, -0.9615))
        hi_sq = multiply(dtype=F)
        hi_sm = single_pole_iir_filter_ff(1 / (0.01 * audio_rate))
        sub_b = sub(dtype=F)
        add_b = add(dtype=F)
        gate = threshold_ff(0.3, 0.43, 0)
        sq_lpf = single_pole_iir_filter_ff(1 / (0.01 * audio_rate))
        div = divide(dtype=F)
        mult = multiply(dtype=F)

        self.connect((self, 0), (mult, 0))
        self.connect((self, 0), low_iir)
        self.connect(low_iir, (low_sq, 0))
        self.connect(low_iir, (low_sq, 1))
        self.connect(low_sq, low_sm, (sub_b, 0))
        self.connect(low_sm, (add_b, 0))
        self.connect((self, 0), hi_iir)
        self.connect(hi_iir, (hi_sq, 0))
        self.connect(hi_iir, (hi_sq, 1))
        self.connect(hi_sq, hi_sm, (sub_b, 1))
        self.connect(hi_sm, (add_b, 1))
        self.connect(sub_b, (div, 0))
        self.connect(add_b, (div, 1))
        self.connect(div, gate, sq_lpf, (mult, 1))
        self.connect(mult, (self, 0))


def standard_squelch(audio_rate, **_):
    return StandardSquelch(audio_rate)


class WfmRcvPll(HierBlock):
    """wfm_rcv_pll (wfm_rcv_pll.py:25-170): stereo broadcast FM receiver.
    Outputs 0=Left, 1=Right. (The RDS tap ends in a null sink in the
    reference; omitted here.)"""

    def __init__(self, demod_rate, audio_decimation, deemph_tau=75e-6,
                 name=None):
        super().__init__(name or "wfm_rcv_pll",
                         in_ports=(PortSpec(C),),
                         out_ports=(PortSpec(F), PortSpec(F)))
        demod_rate = float(demod_rate)
        audio_decimation = int(audio_decimation)
        audio_rate = demod_rate / audio_decimation
        loop_bw = 2 * math.pi / 100.0
        max_freq = 2.0 * math.pi * 90e3 / demod_rate
        fm_demod = pll_freqdet_cf(loop_bw, max_freq, -max_freq)

        width = audio_rate / 32
        audio_taps = firdes.low_pass(1.0, demod_rate, 15000, width,
                                     firdes.WIN_HAMMING)
        audio_filter = fir_filter_fff(audio_decimation, audio_taps)

        carrier_taps = firdes.complex_band_pass(
            10.0, demod_rate, -19020, -18980, width, firdes.WIN_HAMMING)
        stereo_carrier_filter = FirFilter(audio_decimation, carrier_taps,
                                          in_complex=False)
        dsbsc_taps = firdes.complex_band_pass(
            20.0, demod_rate, 38000 - 15000 / 2, 38000 + 15000 / 2, width,
            firdes.WIN_HAMMING)
        stereo_dsbsc_filter = FirFilter(audio_decimation, dsbsc_taps,
                                        in_complex=False)
        pll = pll_refout_cc(loop_bw,
                            -2.0 * math.pi * 18990 / audio_rate,
                            -2.0 * math.pi * 19010 / audio_rate)
        carrier_gen = multiply(dtype=C)      # pll^2 -> -38 kHz carrier
        basebander = multiply(dtype=C)       # carrier * DSBSC -> L-R
        # Quadrature bookkeeping: with the broadcast composite's
        # sin(w_p t) pilot and sin(2 w_p t) DSBSC subcarrier, the PLL locks
        # ref = e^{j theta_pilot}, ref^2 carries e^{j pi}, and the +38 kHz
        # DSBSC term carries e^{-j pi/2} — the basebanded L-R therefore
        # lands on the IMAGINARY axis (net e^{j pi/2}); the reference's
        # complex_to_real corresponds to the cos-subcarrier convention.
        from .blocks import complex_to_imag
        lmr_real = complex_to_imag()
        deemph_l = fm_deemph(audio_rate, deemph_tau)
        deemph_r = fm_deemph(audio_rate, deemph_tau)
        make_left = add(dtype=F)
        make_right = sub(dtype=F)

        self.connect((self, 0), fm_demod)
        self.connect(fm_demod, stereo_carrier_filter, pll, (carrier_gen, 0))
        self.connect(pll, (carrier_gen, 1))
        self.connect(carrier_gen, (basebander, 0))
        self.connect(fm_demod, stereo_dsbsc_filter, (basebander, 1))
        self.connect(basebander, lmr_real)
        # L+R (mono) path. The demodulated L-R enters NEGATED (the pi/2
        # quadrature above composed with the conjugate carrier), so
        # L = mono - lmr and R = mono + lmr — verified against a
        # synthesized standard composite in tests/test_hier_fills_r4.py.
        self.connect(fm_demod, audio_filter)
        self.connect(audio_filter, (make_left, 0))
        self.connect(lmr_real, (make_left, 1))
        self.connect(audio_filter, (make_right, 0))
        self.connect(lmr_real, (make_right, 1))
        self.connect(make_right, deemph_l, (self, 0))   # sub: mono - lmr
        self.connect(make_left, deemph_r, (self, 1))    # add: mono + lmr


def wfm_rcv_pll(demod_rate, audio_decimation, deemph_tau=75e-6, **_):
    return WfmRcvPll(demod_rate, audio_decimation, deemph_tau)

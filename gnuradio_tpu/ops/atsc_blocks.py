"""ATSC 8-VSB stages as streaming graph Blocks (round-4 catalog/GRC fill:
the dtv_atsc_* descriptor ids, gr-dtv/lib/atsc/*).

Each class wraps the corresponding functional kernel from ops/atsc.py with
the reference block's stream contract:

  dtv_atsc_pad / depad            lib/atsc/atsc_pad_impl.cc (188-byte TS
                                  packets <-> atsc_mpeg_packet structs; the
                                  struct is a plain 188/256-byte view — here
                                  the stream stays packed bytes, identity)
  dtv_atsc_randomizer/derandomizer  lib/atsc/atsc_randomizer_impl.cc
  dtv_atsc_rs_encoder/rs_decoder  lib/atsc/atsc_rs_encoder_impl.cc (t=10
                                  RS(207,187))
  dtv_atsc_interleaver/deinterleaver  lib/atsc/atsc_interleaver_impl.cc
                                  (Forney I=52 J=4, carried branch FIFOs)
  dtv_atsc_trellis_encoder        lib/atsc/atsc_trellis_encoder_impl.cc
                                  (12-coder mux, carried coder states)
  dtv_atsc_viterbi_decoder        lib/atsc/atsc_viterbi_decoder_impl.cc
                                  (12-lane vectorized-ACS Viterbi)
  dtv_atsc_field_sync_mux / fs_checker  lib/atsc/atsc_field_sync_mux_impl.cc
  dtv_atsc_fpll                   lib/atsc/atsc_fpll_impl.cc
  dtv_atsc_sync                   lib/atsc/atsc_sync_impl.cc
  dtv_atsc_equalizer              lib/atsc/atsc_equalizer_impl.cc
  dtv_atsc_rx_filter              RRC + rational resampler front filter

Alignment discipline (same as ops/dtv_blocks.py): chunk sizes land on the
kernels' reset periods — a FIELD (312 packets / 313 segments) for the
byte/symbol-domain stages — so the only carried state is the interleaver
tails, coder states, and the field-sync parity/saved-symbols.
"""
from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from ..core.block import Block, SyncBlock
from ..core.stream import PortSpec, B, C, F
from . import atsc


class AtscPad(SyncBlock):
    """atsc_pad: TS bytes -> packed packet stream (identity here — the
    reference pads 188-byte packets into 256-byte structs; our streams
    carry packed bytes end to end)."""

    def __init__(self, name=None):
        super().__init__(PortSpec(B), PortSpec(B), name)
        self.output_multiple = atsc.MPEG_PKT_LENGTH

    def work(self, state, x):
        return state, x


class AtscDepad(AtscPad):
    """atsc_depad: inverse of pad — identity on packed byte streams."""


class AtscRandomizer(Block):
    """Field-synchronous PRBS randomizer (drops the 0x47 sync byte):
    312*188 TS bytes -> 312*187 payload bytes per field."""

    def __init__(self, name=None):
        super().__init__(name)
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(B),)
        self.output_multiple = atsc.DSEGS_PER_FIELD * atsc.MPEG_DATA_LENGTH

    @property
    def in_rates(self):
        return (Fraction(atsc.MPEG_PKT_LENGTH),)

    @property
    def out_rates(self):
        return (Fraction(atsc.MPEG_DATA_LENGTH),)

    def apply(self, state, inputs, n_in):
        y = atsc.randomize(inputs[0].astype(jnp.int32) & 0xFF)
        return state, (y.astype(jnp.int8),)


class AtscDerandomizer(Block):
    """Inverse: 312*187 payload -> 312*188 TS (syncs restored).

    phase_packets: field-phase offset of the CONTENT relative to stream
    position (the deinterleaver ahead of this block delays content by 52
    packets; the reference derandomizer re-syncs its PRBS from the field
    tags — this static offset is the aligned-chunk analog)."""

    def __init__(self, phase_packets: int = 0, name=None):
        super().__init__(name)
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(B),)
        self.output_multiple = atsc.DSEGS_PER_FIELD * atsc.MPEG_PKT_LENGTH
        ph = int(phase_packets) % atsc.DSEGS_PER_FIELD
        mask = np.asarray(atsc._RAND_FIELD_MASK).reshape(
            atsc.DSEGS_PER_FIELD, atsc.MPEG_DATA_LENGTH)
        self.mask = np.roll(mask, ph, axis=0)

    @property
    def in_rates(self):
        return (Fraction(atsc.MPEG_DATA_LENGTH),)

    @property
    def out_rates(self):
        return (Fraction(atsc.MPEG_PKT_LENGTH),)

    def apply(self, state, inputs, n_in):
        x = inputs[0].astype(jnp.int32) & 0xFF
        d = x.reshape(-1, atsc.DSEGS_PER_FIELD, atsc.MPEG_DATA_LENGTH)
        d = d ^ jnp.asarray(self.mask, jnp.int32)[None]
        sync = jnp.full(d.shape[:-1] + (1,), atsc.MPEG_SYNC_BYTE, jnp.int32)
        pkts = jnp.concatenate([sync, d], axis=-1)
        return state, (pkts.reshape(-1).astype(jnp.int8),)


class AtscRsEncoder(Block):
    """RS(207,187) t=10 per packet."""

    def __init__(self, name=None):
        super().__init__(name)
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(B),)

    @property
    def in_rates(self):
        return (Fraction(atsc.MPEG_DATA_LENGTH),)

    @property
    def out_rates(self):
        return (Fraction(atsc.RS_ENCODED_LENGTH),)

    def apply(self, state, inputs, n_in):
        y = atsc.rs_encode(inputs[0].astype(jnp.int32) & 0xFF)
        return state, (y.astype(jnp.int8),)


class AtscRsDecoder(Block):
    """RS(207,187) decoder per packet."""

    def __init__(self, name=None):
        super().__init__(name)
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(B),)

    @property
    def in_rates(self):
        return (Fraction(atsc.RS_ENCODED_LENGTH),)

    @property
    def out_rates(self):
        return (Fraction(atsc.MPEG_DATA_LENGTH),)

    def apply(self, state, inputs, n_in):
        y, _nerr = atsc.rs_decode(inputs[0].astype(jnp.int32) & 0xFF)
        return state, (y.astype(jnp.int8),)


class AtscInterleaver(SyncBlock):
    """Forney byte interleaver I=52 J=4 (carried branch FIFO tail)."""

    def __init__(self, name=None):
        super().__init__(PortSpec(B), PortSpec(B), name)
        self.output_multiple = 52

    def init_state(self):
        return {"tail": atsc.interleaver_init()}

    def work(self, state, x):
        y, tail = atsc.interleave(x.astype(jnp.int32) & 0xFF, state["tail"])
        return {"tail": tail}, y.astype(jnp.int8)


class AtscDeinterleaver(SyncBlock):
    """Forney deinterleaver (incl. the reference's 156-byte alignment)."""

    def __init__(self, name=None):
        super().__init__(PortSpec(B), PortSpec(B), name)
        self.output_multiple = 52

    def init_state(self):
        return {"tail": atsc.deinterleaver_init()}

    def work(self, state, x):
        y, tail = atsc.deinterleave(x.astype(jnp.int32) & 0xFF,
                                    state["tail"])
        return {"tail": tail}, y.astype(jnp.int8)


class AtscTrellisEncoder(Block):
    """12-coder trellis mux: 12*207 RS bytes -> 12*832 symbol codes
    (carried 12-lane coder states)."""

    def __init__(self, name=None):
        super().__init__(name)
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(B),)
        self.output_multiple = atsc.NCODERS * atsc.DATA_SEGMENT_LENGTH

    @property
    def in_rates(self):
        return (Fraction(atsc.NCODERS * atsc.RS_ENCODED_LENGTH),)

    @property
    def out_rates(self):
        return (Fraction(atsc.NCODERS * atsc.DATA_SEGMENT_LENGTH),)

    def init_state(self):
        return {"coders": atsc.trellis_encoder_init()}

    def apply(self, state, inputs, n_in):
        segs = (inputs[0].astype(jnp.int32) & 0xFF).reshape(
            -1, atsc.RS_ENCODED_LENGTH)
        syms, coders = atsc.trellis_encode(segs, state["coders"])
        return {"coders": coders}, (syms.reshape(-1).astype(jnp.int8),)


class AtscViterbiDecoder(Block):
    """12-lane Viterbi: soft 8-VSB levels (f32, 832-symbol data segments)
    -> RS-domain bytes. Chunk-local trellis start states carried."""

    def __init__(self, name=None):
        super().__init__(name)
        self.in_ports = (PortSpec(F),)
        self.out_ports = (PortSpec(B),)
        self.output_multiple = atsc.NCODERS * atsc.RS_ENCODED_LENGTH

    @property
    def in_rates(self):
        return (Fraction(atsc.NCODERS * atsc.DATA_SEGMENT_LENGTH),)

    @property
    def out_rates(self):
        return (Fraction(atsc.NCODERS * atsc.RS_ENCODED_LENGTH),)

    def apply(self, state, inputs, n_in):
        soft = inputs[0].reshape(-1, atsc.DATA_SEGMENT_LENGTH)
        segs = atsc.trellis_decode(soft)
        return state, (segs.reshape(-1).astype(jnp.int8),)


class AtscFieldSyncMux(Block):
    """Insert one field-sync segment per field: 312*832 data symbols ->
    313*832 symbols (carried saved-12 symbols + field parity)."""

    def __init__(self, name=None):
        super().__init__(name)
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(B),)
        self.output_multiple = atsc.SEGS_PER_FIELD * atsc.DATA_SEGMENT_LENGTH

    @property
    def in_rates(self):
        return (Fraction(atsc.DSEGS_PER_FIELD * atsc.DATA_SEGMENT_LENGTH),)

    @property
    def out_rates(self):
        return (Fraction(atsc.SEGS_PER_FIELD * atsc.DATA_SEGMENT_LENGTH),)

    def init_state(self):
        return {"saved12": jnp.zeros(atsc.N_SAVED_SYMBOLS, jnp.int32),
                "field2": jnp.zeros((), jnp.bool_)}

    def apply(self, state, inputs, n_in):
        segs = (inputs[0].astype(jnp.int32) & 0x7).reshape(
            -1, atsc.DATA_SEGMENT_LENGTH)
        # field parity is a python-level alternation per chunk: fold the
        # traced bool through where()
        out0, saved_a = atsc.field_sync_mux(segs, state["saved12"],
                                            first_field2=False)
        out1, saved_b = atsc.field_sync_mux(segs, state["saved12"],
                                            first_field2=True)
        out = jnp.where(state["field2"], out1, out0)
        saved = jnp.where(state["field2"], saved_b, saved_a)
        nfields = segs.shape[0] // atsc.DSEGS_PER_FIELD
        f2 = jnp.logical_xor(state["field2"], (nfields % 2) == 1)
        return ({"saved12": saved, "field2": f2},
                (out.reshape(-1).astype(jnp.int8),))


class AtscFsChecker(SyncBlock):
    """Field-sync checker: passes the 313-segment field stream through
    unchanged (the reference tags field boundaries for downstream blocks;
    field alignment is the chunk contract here, and the equalizer consumes
    the field-sync rows — arbitrary-offset receive is the
    ops/atsc.atsc_rx_* chunk-level path with fs_check())."""

    def __init__(self, name=None):
        super().__init__(PortSpec(F), PortSpec(F), name)
        self.output_multiple = atsc.SEGS_PER_FIELD * atsc.DATA_SEGMENT_LENGTH

    def work(self, state, x):
        return state, x


class AtscFpll(SyncBlock):
    """Carrier-tracking FPLL (atsc_fpll_impl.cc): complex IF in, real
    baseband out; phase/freq/averager state carried across chunks."""

    def __init__(self, rate: float = 19_200_000.0 * 2, alpha: float = 0.01,
                 name=None):
        super().__init__(PortSpec(C), PortSpec(F), name)
        self.rate = float(rate)
        self.alpha = float(alpha)

    def init_state(self):
        import math as _m
        freq0 = (-3e6 + 0.309e6) / self.rate * 2 * _m.pi
        return {"phase": jnp.float32(0.0), "freq": jnp.float32(freq0),
                "avg": jnp.zeros((), jnp.complex64)}

    def work(self, state, x):
        out, (phase, freq, avg) = atsc.fpll(
            x, self.rate, self.alpha,
            init=(state["phase"], state["freq"], state["avg"]))
        return {"phase": phase, "freq": freq, "avg": avg}, out


class AtscEqualizer(Block):
    """Adaptive LMS equalizer trained on field-sync segments
    (atsc_equalizer_impl.cc): 313-segment fields in, 312 equalized data
    segments out (field-sync rows are consumed, like the reference);
    taps carried across chunks."""

    def __init__(self, taps0: str = "zeros", name=None):
        super().__init__(name)
        self.in_ports = (PortSpec(F),)
        self.out_ports = (PortSpec(F),)
        self.output_multiple = (atsc.DSEGS_PER_FIELD
                                * atsc.DATA_SEGMENT_LENGTH)
        self.taps0 = str(taps0)

    @property
    def in_rates(self):
        return (Fraction(atsc.SEGS_PER_FIELD * atsc.DATA_SEGMENT_LENGTH),)

    @property
    def out_rates(self):
        return (Fraction(atsc.DSEGS_PER_FIELD * atsc.DATA_SEGMENT_LENGTH),)

    def init_state(self):
        from .atsc import _EQ_NPRETAPS, _EQ_NTAPS
        t = jnp.zeros(_EQ_NTAPS, jnp.float32)
        if self.taps0 == "identity":
            # start at the pass-through solution; LMS refines from there
            # (the reference trains from zeros — several fields of
            # field-sync training before lock)
            t = t.at[_EQ_NPRETAPS].set(1.0)
        return {"taps": t}

    def apply(self, state, inputs, n_in):
        segs = inputs[0].reshape(-1, atsc.DATA_SEGMENT_LENGTH)
        nseg = segs.shape[0]                         # static at trace time
        is_fs = (np.arange(nseg) % atsc.SEGS_PER_FIELD) == 0
        fs_field2 = ((np.arange(nseg) // atsc.SEGS_PER_FIELD) % 2) == 1
        eq, taps = atsc.equalize(segs, is_fs, fs_field2,
                                 taps=state["taps"])
        return {"taps": taps}, (eq.reshape(-1),)


# -- factories in reference naming ------------------------------------------

def atsc_pad(**_):
    return AtscPad()


def atsc_depad(**_):
    return AtscDepad()


def atsc_randomizer(**_):
    return AtscRandomizer()


def atsc_derandomizer(**_):
    return AtscDerandomizer()


def atsc_rs_encoder(**_):
    return AtscRsEncoder()


def atsc_rs_decoder(**_):
    return AtscRsDecoder()


def atsc_interleaver(**_):
    return AtscInterleaver()


def atsc_deinterleaver(**_):
    return AtscDeinterleaver()


def atsc_trellis_encoder(**_):
    return AtscTrellisEncoder()


def atsc_viterbi_decoder(**_):
    return AtscViterbiDecoder()


def atsc_field_sync_mux(**_):
    return AtscFieldSyncMux()


def atsc_fs_checker(**_):
    return AtscFsChecker()


def atsc_fpll(rate=38_400_000.0, alpha=0.01, **_):
    return AtscFpll(rate, alpha)


def atsc_equalizer(**_):
    return AtscEqualizer()


class AtscSync(Block):
    """dtv_atsc_sync (lib/atsc/atsc_sync_impl.cc): segment-sync-driven
    timing recovery as a streaming block — 8-tap fractional interpolation
    at (si, mu), the +5-5-5+5 sign correlator (SSI) integrated per symbol
    position, timing adjusted from the correlation peak's gradient.

    Streaming form: the per-symbol lax.scan carry (si, mu, adjust,
    counter, shift register, segment memory, integrator) persists across
    chunks with an input tail, emitting exactly rate/SYMBOL_RATE-decimated
    symbols; segment/field alignment downstream is the chunk contract
    (ops/atsc.timing_sync is the arbitrary-offset chunk-level path)."""

    SLACK = 64

    def __init__(self, rate: float, name=None):
        super().__init__(name)
        from fractions import Fraction as _Fr
        self.rate = float(rate)
        self.w = self.rate / atsc.SYMBOL_RATE
        ratio = (_Fr(self.rate).limit_denominator(10 ** 6)
                 / _Fr(atsc.SYMBOL_RATE).limit_denominator(10 ** 6))
        self.in_ports = (PortSpec(F),)
        self.out_ports = (PortSpec(F),)
        self._in_per_tick = _Fr(ratio.numerator)
        self._out_per_tick = _Fr(ratio.denominator)

    @property
    def in_rates(self):
        return (self._in_per_tick,)

    @property
    def out_rates(self):
        return (self._out_per_tick,)

    def init_state(self):
        SEG = atsc.DATA_SEGMENT_LENGTH
        return {"tail": jnp.zeros(self.SLACK, jnp.float32),
                "si": jnp.int32(0), "mu": jnp.float32(0.5),
                "adjust": jnp.float32(0.0), "counter": jnp.int32(0),
                "sr": jnp.int32(0),
                "smem": jnp.zeros(SEG, jnp.float32),
                "integ": jnp.full(SEG, atsc._SSI_MIN, jnp.int32)}

    def apply(self, state, inputs, n_in):
        from .digital_loops import mmse_interp
        SEG = atsc.DATA_SEGMENT_LENGTH
        x = jnp.concatenate([state["tail"], inputs[0].astype(jnp.float32)])
        n = inputs[0].shape[0]
        nsym = int(n / self.w)
        w = jnp.float32(self.w)

        def step(carry, _):
            si, mu, adjust, counter, sr, smem, integ = carry
            sample = mmse_interp(x, si, mu)
            mu = mu + atsc._ADJUSTMENT_GAIN * 1e3 * adjust
            s = mu + w
            incr = jnp.floor(s)
            mu = s - incr
            si = si + incr.astype(jnp.int32)
            smem = smem.at[counter].set(sample)
            bit = (sample >= 0).astype(jnp.int32)
            sr = ((bit & 1) << 3) | (sr >> 1)
            integ = jnp.clip(integ.at[counter].add(
                jnp.where(sr == 0x9, 2, -1)), atsc._SSI_MIN, atsc._SSI_MAX)

            def on_wrap(adj):
                best = jnp.argmax(integ).astype(jnp.int32)
                idx = (best - jnp.arange(4)) % SEG
                g = smem[idx]
                return -g[0] - g[1] + g[2] + g[3]

            wrapped = counter + 1 >= SEG
            adjust = jax.lax.cond(wrapped, on_wrap, lambda a: a, adjust)
            counter = jnp.where(wrapped, 0, counter + 1)
            return (si, mu, adjust, counter, sr, smem, integ), sample

        carry0 = (state["si"], state["mu"], state["adjust"],
                  state["counter"], state["sr"], state["smem"],
                  state["integ"])
        (si, mu, adjust, counter, sr, smem, integ), samples = \
            jax.lax.scan(step, carry0, None, length=nsym)
        new = {"tail": x[x.shape[0] - self.SLACK:],
               "si": si - jnp.int32(n), "mu": mu, "adjust": adjust,
               "counter": counter, "sr": sr, "smem": smem, "integ": integ}
        return new, (samples.astype(jnp.float32),)


def atsc_sync(rate=38_400_000.0, **_):
    return AtscSync(float(rate))


def atsc_rx_filter(input_rate: float, sps: float = 1.1):
    """dtv_atsc_rx_filter (gr-dtv/python/dtv/atsc_rx_filter.py): RRC
    matched filter inside a polyphase arbitrary resampler to
    SYMBOL_RATE*sps."""
    from . import firdes as FD
    from .pfb import pfb_arb_resampler_ccf
    nfilts = 16
    output_rate = atsc.SYMBOL_RATE * sps
    filter_rate = input_rate * nfilts
    symbol_rate = atsc.SYMBOL_RATE / 2.0
    excess_bw = 0.1152
    ntaps = int((2 * 8 + 1) * sps * nfilts)
    interp = output_rate / input_rate
    gain = nfilts * symbol_rate / filter_rate
    taps = FD.root_raised_cosine(gain, filter_rate, symbol_rate,
                                 excess_bw, ntaps)
    return pfb_arb_resampler_ccf(interp, taps, nfilts)


def atsc_rx(rate: float, sps: float = 1.1, name=None):
    """dtv_atsc_rx (gr-dtv/python/dtv/atsc_rx.py): the full ATSC receive
    hier — RRC resampler, FPLL, DC blocker, AGC, timing sync, field-sync
    check, LMS equalizer, Viterbi, deinterleave, RS decode, derandomize,
    depad — composed from the granular blocks of this module."""
    from ..core.hier import HierBlock
    from .filter import dc_blocker_ff
    from .analog import agc_ff
    output_rate = atsc.SYMBOL_RATE * float(sps)
    h = HierBlock(name or "atsc_rx", in_ports=(PortSpec(C),),
                  out_ports=(PortSpec(B),))
    filt = atsc_rx_filter(float(rate), float(sps))
    pll = AtscFpll(output_rate)
    dcr = dc_blocker_ff(4096)
    agc = agc_ff(1e-5, 4.0)
    btl = AtscSync(output_rate)
    fsc = AtscFsChecker()
    equ = AtscEqualizer()
    vit = AtscViterbiDecoder()
    dei = AtscDeinterleaver()
    rsd = AtscRsDecoder()
    der = AtscDerandomizer()
    dep = AtscDepad()
    h.connect((h, 0), (filt, 0))
    for a, b in zip([filt, pll, dcr, agc, btl, fsc, equ, vit, dei, rsd,
                     der, dep],
                    [pll, dcr, agc, btl, fsc, equ, vit, dei, rsd, der,
                     dep]):
        h.connect((a, 0), (b, 0))
    h.connect((dep, 0), (h, 0))
    return h

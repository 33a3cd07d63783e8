"""DVB-T TX stages as streaming graph Blocks (round-3 GRC interop: lets the
reference's gr-dtv/examples/dvbt_tx_8k.grc:595-605 chain load and run under
TopBlock, block for block).

Each class wraps the corresponding functional kernel from ops/dtv.py with
the reference block's stream contract:

  dtv_dvbt_energy_dispersal       lib/dvbt/dvbt_energy_dispersal_impl.cc
  dtv_dvbt_reed_solomon_enc       lib/dvbt/dvbt_reed_solomon_enc_impl.cc
  dtv_dvbt_convolutional_interleaver  .../dvbt_convolutional_interleaver_impl.cc
  dtv_dvbt_inner_coder            .../dvbt_inner_coder_impl.cc
  dtv_dvbt_bit_inner_interleaver  .../dvbt_bit_inner_interleaver_impl.cc:73-120
  dtv_dvbt_symbol_inner_interleaver   .../dvbt_symbol_inner_interleaver_impl.cc
  dtv_dvbt_map                    .../dvbt_map_impl.cc
  dtv_dvbt_reference_signals      .../dvbt_reference_signals_impl.cc:1220-1243
                                  (pilot insert + IFFT live in ONE reference
                                  block — verified in its general_work)

Alignment discipline: instead of the reference's per-item shift registers,
each block declares an output_multiple that makes its kernel's reset
period (PRBS group, puncture pattern, interleaver frame, superframe) land
on chunk boundaries; the rate solver then picks a step that satisfies all
of them at once, and the only carried state left is the convolutional
interleaver tail and the inner coder's 6-bit register. QA
(tests/test_dtv_blocks.py) checks the composed graph is byte-exact against
ops/dtv.dvbt_tx."""
from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from ..core.block import Block, SinkBlock, SyncBlock
from ..core.stream import PortSpec, B, C, F
from . import dtv, fec
from .dtv import DVBTConfig, DVBTPilots


class DvbtEnergyDispersal(SyncBlock):
    """PRBS energy dispersal, reset every 8 TS packets (1504 bytes)."""

    def __init__(self, name=None):
        super().__init__(PortSpec(B), PortSpec(B), name)
        self.output_multiple = 1504

    def work(self, state, x):
        return state, dtv.energy_dispersal(
            x.astype(jnp.int32) & 0xFF).astype(jnp.int8)


class DvbtReedSolomonEnc(Block):
    """RS(204,188) shortened code, per packet."""

    def __init__(self, name=None):
        super().__init__(name)
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(B),)

    @property
    def in_rates(self):
        return (Fraction(188),)

    @property
    def out_rates(self):
        return (Fraction(204),)

    def apply(self, state, inputs, n_in):
        y = dtv.rs_encode_packets(inputs[0].astype(jnp.int32) & 0xFF)
        return state, (y.astype(jnp.int8),)


class DvbtConvolutionalInterleaver(SyncBlock):
    """Forney convolutional interleaver I=12, M=17 (carries branch FIFOs
    as one tail vector)."""

    def __init__(self, I: int = 12, M: int = 17, name=None):
        super().__init__(PortSpec(B), PortSpec(B), name)
        self.I, self.M = int(I), int(M)
        self.output_multiple = self.I

    def init_state(self):
        return dtv.conv_interleaver_init(self.I, self.M)

    def work(self, state, x):
        y, tail = dtv.conv_interleave(x.astype(jnp.int32) & 0xFF, state,
                                      self.I, self.M)
        return tail, y.astype(jnp.int8)


class DvbtInnerCoder(Block):
    """Punctured convolutional inner coder: bytes in, m-bit symbols out
    (as bytes). Carries the 6-bit encoder register across chunks."""

    def __init__(self, cfg: DVBTConfig, name=None):
        super().__init__(name)
        self.cfg = cfg
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(B),)
        # per tick: cr_k*m input BITS -> cr_n*m coded -> m*? ... choose the
        # smallest aligned unit: in bytes lcm so bits%cr_k==0, coded bits %
        # (2*len(pat)) == 0 and out % m == 0; one 1504-byte dispersal group
        # satisfies all standard modes, so declare bytes-per-tick directly.
        k, n, m = cfg.cr_k, cfg.cr_n, cfg.m
        # in_bits = 8*bytes; coded = in_bits * n / k; out_syms = coded / m
        import math as _m
        b = 1
        while ((8 * b) % k or (8 * b * n // k) % m
               or (8 * b * 2) % (2 * k)):   # puncture pattern period = k
            b += 1
        self._in_bytes = b
        self._out_syms = 8 * b * n // k // m

    @property
    def in_rates(self):
        return (Fraction(self._in_bytes),)

    @property
    def out_rates(self):
        return (Fraction(self._out_syms),)

    def init_state(self):
        return jnp.zeros(6, jnp.int32)   # last K-1 = 6 input bits

    def apply(self, state, inputs, n_in):
        bits = dtv.bytes_to_bits(inputs[0].astype(jnp.int32) & 0xFF)
        ext = jnp.concatenate([state, bits])
        coded = fec.cc_encode(ext, 7, 2, [dtv._G1, dtv._G2], start_state=0,
                              mode=fec.CC_STREAMING)[2 * 6:]
        pat = dtv._PUNCTURE[self.cfg.code_rate]
        punct = fec.puncture(coded, len(pat),
                             int("".join(map(str, pat)), 2))
        syms = dtv.bits_to_symbols(punct, self.cfg.m)
        return ext[ext.shape[0] - 6:], (syms.astype(jnp.int8),)


class DvbtBitInnerInterleaver(SyncBlock):
    """126-symbol block bit interleaver (stateless at 126 alignment)."""

    def __init__(self, cfg: DVBTConfig, name=None):
        super().__init__(PortSpec(B), PortSpec(B), name)
        self.cfg = cfg
        self.output_multiple = dtv.BSIZE

    def work(self, state, x):
        y = dtv.bit_inner_interleave(x.astype(jnp.int32), self.cfg.m)
        return state, y.astype(jnp.int8)


class DvbtSymbolInnerInterleaver(SyncBlock):
    """H(q) symbol interleaver; even/odd symbol parity handled by aligning
    chunks to pairs of OFDM symbols."""

    def __init__(self, cfg: DVBTConfig, name=None):
        super().__init__(PortSpec(B), PortSpec(B), name)
        self.cfg = cfg
        self.output_multiple = 2 * cfg.payload_length

    def work(self, state, x):
        s = x.astype(jnp.int32).reshape(-1, self.cfg.payload_length)
        y = dtv.symbol_interleave(s, self.cfg.mode)
        return state, y.reshape(-1).astype(jnp.int8)


class DvbtMap(SyncBlock):
    """QAM mapper (byte symbols -> constellation points)."""

    def __init__(self, cfg: DVBTConfig, name=None):
        super().__init__(PortSpec(B), PortSpec(C), name)
        self.cfg = cfg

    def work(self, state, x):
        return state, dtv.dvbt_map(x.astype(jnp.int32), self.cfg)


class DvbtReferenceSignals(Block):
    """Pilot/TPS insertion + IFFT (the reference block does both —
    dvbt_reference_signals_impl.cc general_work runs d_pg.update_output
    then ofdm_fft.execute per symbol). payload_length cells in ->
    fft_length time samples out; chunks align to whole superframes so the
    272-symbol pilot/TPS table is static."""

    def __init__(self, cfg: DVBTConfig, name=None):
        super().__init__(name)
        self.cfg = cfg
        self.pilots = DVBTPilots(cfg)
        self.in_ports = (PortSpec(C),)
        self.out_ports = (PortSpec(C),)
        self.output_multiple = 272 * cfg.fft_length

    @property
    def in_rates(self):
        return (Fraction(self.cfg.payload_length),)

    @property
    def out_rates(self):
        return (Fraction(self.cfg.fft_length),)

    def apply(self, state, inputs, n_in):
        pay = inputs[0].reshape(-1, self.cfg.payload_length)
        grid = self.pilots.insert(pay)
        td = dtv.ofdm_modulate(grid, self.cfg)
        return state, (td.reshape(-1).astype(jnp.complex64),)


class DvbtCyclicPrefixer(Block):
    """digital_ofdm_cyclic_prefixer as used by the DVB-T chain (rolloff 0:
    plain guard-interval prepend, fft -> fft+guard per symbol)."""

    def __init__(self, fft_length: int, guard_length: int, name=None):
        super().__init__(name)
        self.fft_length = int(fft_length)
        self.guard = int(guard_length)
        self.in_ports = (PortSpec(C),)
        self.out_ports = (PortSpec(C),)

    @property
    def in_rates(self):
        return (Fraction(self.fft_length),)

    @property
    def out_rates(self):
        return (Fraction(self.fft_length + self.guard),)

    def apply(self, state, inputs, n_in):
        sym = inputs[0].reshape(-1, self.fft_length)
        g = sym[:, self.fft_length - self.guard:]
        return state, (jnp.concatenate([g, sym], axis=1).reshape(-1),)


# -- factories in reference naming ------------------------------------------

def dvbt_energy_dispersal(**_):
    return DvbtEnergyDispersal()


def dvbt_reed_solomon_enc(**_):
    return DvbtReedSolomonEnc()


def dvbt_convolutional_interleaver(I=12, M=17, **_):
    return DvbtConvolutionalInterleaver(I, M)


def dvbt_inner_coder(cfg: DVBTConfig = None, **_):
    return DvbtInnerCoder(cfg or DVBTConfig())


def dvbt_bit_inner_interleaver(cfg: DVBTConfig = None, **_):
    return DvbtBitInnerInterleaver(cfg or DVBTConfig())


def dvbt_symbol_inner_interleaver(cfg: DVBTConfig = None, **_):
    return DvbtSymbolInnerInterleaver(cfg or DVBTConfig())


def dvbt_map_b(cfg: DVBTConfig = None, **_):
    return DvbtMap(cfg or DVBTConfig())


def dvbt_reference_signals(cfg: DVBTConfig = None, **_):
    return DvbtReferenceSignals(cfg or DVBTConfig())

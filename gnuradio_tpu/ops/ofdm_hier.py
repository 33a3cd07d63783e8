"""digital_ofdm_tx / digital_ofdm_rx hier analogs (round-4 catalog fill —
BASELINE config #4's .grc, gr-digital/python/digital/ofdm_txrx.py:103/249).

Static-shape contract: the reference hiers are tagged-stream blocks whose
packet length rides a stream tag; here the packet length is FIXED at
construction (the GRC graphs drive them with stream_to_tagged_stream at a
constant packet_len variable — the importer resolves that variable into
the factory). Each packet maps to one fixed-length burst:

  TX: packet_len bytes -> QPSK symbol indices (2 bits/symbol, zero-padded
      to whole frames) -> models/ofdm.ofdm_tx_burst (Schmidl&Cox preamble,
      allocator, IFFT, CP) -> burst samples.
  RX: one burst -> models/ofdm.ofdm_rx_burst (S&C sync, LS channel
      estimate, equalize, demap) -> packet bytes.

Carrier allocation / pilots are the framework defaults
(ops/ofdm.default_occupied_carriers) rather than the reference GRC
params — custom allocations compose from ops/ofdm.OfdmCarrierAllocator
in explicit graphs; this hier covers the loopback contract (QA:
tests/test_ofdm_hier.py byte-exact through channel_model)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.block import Block
from ..core.stream import PortSpec, B, C
from fractions import Fraction


def _geometry(packet_len: int, fft_len: int, cp_len: int, pad: int):
    from .ofdm import default_occupied_carriers
    n_occ = len(default_occupied_carriers(fft_len))
    nsym = packet_len * 4                      # QPSK, 2 bits/symbol
    nf = -(-nsym // n_occ)
    burst_len = pad * 2 + (2 + nf) * (fft_len + cp_len)
    return n_occ, nf, burst_len


class OfdmTx(Block):
    """Fixed-packet ofdm_tx: packet_len bytes in -> one burst out."""

    def __init__(self, packet_len: int = 64, fft_len: int = 64,
                 cp_len: int = 16, pad: int = 100, name=None):
        super().__init__(name)
        self.plen = int(packet_len)
        self.fft_len, self.cp_len, self.pad = int(fft_len), int(cp_len), int(pad)
        self.n_occ, self.nf, self.burst_len = _geometry(
            self.plen, self.fft_len, self.cp_len, self.pad)
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(C),)
        self.output_multiple = self.burst_len

    @property
    def in_rates(self):
        return (Fraction(self.plen),)

    @property
    def out_rates(self):
        return (Fraction(self.burst_len),)

    def apply(self, state, inputs, n_in):
        from ..models.ofdm import ofdm_tx_burst
        by = (inputs[0].astype(jnp.int32) & 0xFF).reshape(-1, self.plen)
        shifts = jnp.arange(6, -2, -2)
        sym = ((by[:, :, None] >> shifts[None, None, :]) & 3).reshape(
            by.shape[0], -1)                   # (P, plen*4) MSB-first pairs
        padn = self.nf * self.n_occ - sym.shape[1]
        sym = jnp.pad(sym, ((0, 0), (0, padn)))

        def one(s):
            iq, _ = ofdm_tx_burst(s, self.fft_len, self.cp_len,
                                  pad=self.pad)
            return iq

        iq = jax.vmap(one)(sym)                # (P, burst_len)
        return state, (iq.reshape(-1).astype(jnp.complex64),)


class OfdmRx(Block):
    """Fixed-packet ofdm_rx: one burst in -> packet_len bytes out."""

    def __init__(self, packet_len: int = 64, fft_len: int = 64,
                 cp_len: int = 16, pad: int = 100, equalizer: str = "static",
                 name=None):
        super().__init__(name)
        self.plen = int(packet_len)
        self.fft_len, self.cp_len, self.pad = int(fft_len), int(cp_len), int(pad)
        self.n_occ, self.nf, self.burst_len = _geometry(
            self.plen, self.fft_len, self.cp_len, self.pad)
        self.equalizer = equalizer
        self.in_ports = (PortSpec(C),)
        self.out_ports = (PortSpec(B),)
        self.output_multiple = self.plen

    @property
    def in_rates(self):
        return (Fraction(self.burst_len),)

    @property
    def out_rates(self):
        return (Fraction(self.plen),)

    def apply(self, state, inputs, n_in):
        from ..models.ofdm import ofdm_rx_burst
        iq = inputs[0].reshape(-1, self.burst_len)

        def one(b):
            out, _diag = ofdm_rx_burst(b, self.nf, self.fft_len,
                                       self.cp_len,
                                       equalizer=self.equalizer)
            return out

        sym = jax.vmap(one)(iq)                # (P, nf*n_occ)
        sym = sym[:, : self.plen * 4].astype(jnp.int32) & 3
        s = sym.reshape(sym.shape[0], self.plen, 4)
        by = ((s[..., 0] << 6) | (s[..., 1] << 4)
              | (s[..., 2] << 2) | s[..., 3])
        return state, (by.reshape(-1).astype(jnp.int8),)


def ofdm_tx(packet_len=64, fft_len=64, cp_len=16, pad=100, **_):
    return OfdmTx(packet_len, fft_len, cp_len, pad)


def ofdm_rx(packet_len=64, fft_len=64, cp_len=16, pad=100,
            equalizer="static", **_):
    return OfdmRx(packet_len, fft_len, cp_len, pad, equalizer)

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
    chunks to pairs of OFDM symbols. direction=1 interleaves (TX),
    direction=0 deinterleaves (RX) — same contract as the reference's
    single block (dvbt_symbol_inner_interleaver_impl.cc make(nsize, mode,
    direction))."""

    def __init__(self, cfg: DVBTConfig, direction: int = 1, name=None):
        super().__init__(PortSpec(B), PortSpec(B), name)
        self.cfg = cfg
        self.direction = int(direction)
        self.output_multiple = 2 * cfg.payload_length

    def work(self, state, x):
        s = x.astype(jnp.int32).reshape(-1, self.cfg.payload_length)
        if self.direction:
            y = dtv.symbol_interleave(s, self.cfg.mode)
        else:
            y = dtv.symbol_deinterleave(s, self.cfg.mode)
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


# ---------------------------------------------------------------------------
# RX blocks (round 4): the dvbt_rx_8k.grc chain as streaming graph blocks.
# The chunk-level arbitrary-offset receiver is ops/dtv_rx.dvbt_rx (the
# production path); these blocks give the same stages the reference stream
# contract so the RX .grc composes under TopBlock. Streaming-form
# assumptions (documented per class) mirror what the reference achieves
# with dynamic consume_each(): symbol-aligned chunks after lock,
# superframe-aligned chunks after the demod_reference_signals stage.
# ---------------------------------------------------------------------------

class DvbtOfdmSymAcquisition(Block):
    """dvbt_ofdm_sym_acquisition (lib/dvbt/dvbt_ofdm_sym_acquisition_impl
    .cc:84-200): van de Beek ML CP-correlation timing + fractional CFO.

    Streaming form: carries a two-symbol-period tail so each chunk of
    k*(fft+cp) samples yields exactly k CP-stripped, derotated fft_length
    symbol vectors with the timing peak found ANYWHERE in [0, fft+cp) —
    all traced (argmax + dynamic_slice), no host control flow; the output
    stream runs one symbol period behind the input (fixed latency instead
    of the reference's dynamic consume). Epoch-folds the metric over the
    whole chunk (far more robust than the reference's per-symbol peak
    tracker)."""

    def __init__(self, cfg: DVBTConfig, snr_db: float = 20.0, name=None):
        super().__init__(name)
        self.cfg = cfg
        self.snr_db = float(snr_db)
        self.slen = cfg.fft_length + cfg.guard_length
        self.in_ports = (PortSpec(C),)
        self.out_ports = (PortSpec(C),)
        self.output_multiple = cfg.fft_length

    @property
    def in_rates(self):
        return (Fraction(self.slen),)

    @property
    def out_rates(self):
        return (Fraction(self.cfg.fft_length),)

    def init_state(self):
        return {"tail": jnp.zeros(2 * self.slen, jnp.complex64)}

    def apply(self, state, inputs, n_in):
        from .dtv_rx import acquisition_metrics
        N, CP, slen = self.cfg.fft_length, self.cfg.guard_length, self.slen
        x = jnp.concatenate([state["tail"], inputs[0]])
        nsym = inputs[0].shape[0] // slen
        lam, gamma = acquisition_metrics(x, N, CP, self.snr_db)
        ns = lam.shape[0] // slen
        lam_f = jnp.sum(lam[: ns * slen].reshape(ns, slen), axis=0)
        gam_f = jnp.sum(gamma[: ns * slen].reshape(ns, slen), axis=0)
        p = jnp.argmax(lam_f)                      # CP start in [0, slen)
        eps = jnp.angle(gam_f[p])
        rot = jnp.exp(-1j * (eps / N) * jnp.arange(x.shape[0])
                      ).astype(jnp.complex64)
        xd = x * rot
        # start at slen + p: nsym whole symbols, always in bounds (the
        # 2*slen tail supplies the one-symbol latency for any p)
        sy = jax.lax.dynamic_slice(xd, (slen + p,), (nsym * slen,))
        sy = sy.reshape(nsym, slen)[:, CP:]
        return ({"tail": x[x.shape[0] - 2 * slen:]},
                (sy.reshape(-1).astype(jnp.complex64),))


class DvbtDemodReferenceSignals(Block):
    """dvbt_demod_reference_signals (pilot_gen RX half,
    dvbt_reference_signals_impl.cc:516-668): integer CFO from the boosted
    continual-pilot power pattern, scattered mod-4 phase detect, pilot-
    ratio channel estimation with linear interpolation, zero-forcing
    equalization, payload extraction — all traced per superframe chunk.

    Takes RAW forward-FFT vectors of the acquired time symbols (the .grc
    puts fft_vxx between acquisition and this block) and handles the
    half-spectrum unswap + 1/sqrt(27*payload) norm internally.

    Superframe alignment: the TPS correlation finds w (received symbol r =
    superframe symbol (w+r)%272) each chunk, and a carried 272-symbol
    equalized tail lets the block emit SUPERFRAME-ALIGNED payload at a
    fixed one-superframe latency via one traced dynamic_slice — the
    static-shape analog of the reference's drop-until-locked consume loop
    (dvbt_demod_reference_signals_impl.cc:110-160). The first emitted
    superframe after lock contains the zero prologue."""

    def __init__(self, cfg: DVBTConfig, fmax: int = 8,
                 shifted: bool = True, name=None):
        super().__init__(name)
        from .dtv_rx import DVBTChannelEstimator, tps_diff_template, _tpsc
        self.cfg = cfg
        self.fmax = int(fmax)
        # shifted=True: input vectors are natural-order spectra (fft_vxx
        # with shift enabled, as dvbt_rx_8k.grc wires it); False: raw FFT
        # order, unswapped here
        self.shifted = bool(shifted)
        self.est = DVBTChannelEstimator(cfg)
        self.tpl = tps_diff_template(cfg)
        self.tpsc = _tpsc(cfg)
        self._pilots = DVBTPilots(cfg)
        self.in_ports = (PortSpec(C),)
        self.out_ports = (PortSpec(C),)
        self.output_multiple = 272 * cfg.payload_length

    @property
    def in_rates(self):
        return (Fraction(self.cfg.fft_length),)

    @property
    def out_rates(self):
        return (Fraction(self.cfg.payload_length),)

    def init_state(self):
        return {"frame_w": jnp.zeros((1,), jnp.int32),
                "tail": jnp.zeros((272, self.cfg.ncarriers), jnp.complex64)}

    def apply(self, state, inputs, n_in):
        cfg, fmax = self.cfg, self.fmax
        X = inputs[0].reshape(-1, cfg.fft_length)
        norm = 1.0 / np.sqrt(27.0 * cfg.payload_length)
        spec = X / (cfg.fft_length * norm)
        if self.shifted:
            unsw = spec
        else:
            half = cfg.fft_length // 2
            unsw = jnp.concatenate([spec[:, half:], spec[:, :half]], axis=1)
        lo = cfg.zeros_on_left - fmax
        wide = unsw[:, lo: lo + cfg.ncarriers + 2 * fmax]
        # integer CFO (traced argmax over 2*fmax+1 shifts)
        from .dtv_rx import _cpilots
        P = jnp.mean(jnp.abs(wide) ** 2, axis=0)
        cp = _cpilots(cfg)
        offs = np.arange(2 * fmax + 1)
        score = jnp.sum(P[offs[:, None] + cp[None, :]], axis=1)
        off = jnp.argmax(score)
        carriers = jax.lax.dynamic_slice(
            wide, (jnp.int32(0), off.astype(jnp.int32)),
            (wide.shape[0], cfg.ncarriers))
        # mod-4 scattered alignment (traced)
        nsym = carriers.shape[0]
        Pw = jnp.abs(carriers) ** 2
        sc = jnp.stack([jnp.sum(Pw[:, np.arange(3 * m, cfg.ncarriers, 12)],
                                axis=1) for m in range(4)], axis=1)
        r = np.arange(nsym)
        tot = jnp.stack([jnp.sum(sc[r, (r + a) % 4]) for a in range(4)])
        mod4 = jnp.argmax(tot)
        if nsym % 4 == 0:
            H = self.est.estimate_mod4(carriers, mod4)
        else:
            H = self.est.estimate(carriers, (jnp.arange(nsym) + mod4) % 4)
        eq = carriers * jnp.conj(H) / jnp.maximum(jnp.abs(H) ** 2, 1e-12)
        # TPS correlation alignment verification (traced; 68 shifts on the
        # detected mod-4 grid)
        v = eq[:, self.tpsc]
        d = jnp.sign(jnp.real(jnp.sum(v[1:] * jnp.conj(v[:-1]), axis=1)))
        D = jnp.asarray(self.tpl, jnp.float32)
        rr = jnp.arange(1, nsym)
        j = jnp.arange(68)
        idx = (mod4 + 4 * j[:, None] + rr[None, :]) % 272
        shifts = jnp.sum(d[None, :] * D[idx], axis=1)
        w_best = (mod4 + 4 * jnp.argmax(shifts)) % 272
        # superframe re-alignment at one-superframe latency: emit received
        # symbols r in [S - 272 + i0, ...) where i0 = (272 - w) % 272 makes
        # the first output symbol land on g = (w + r) % 272 == 0
        buf = jnp.concatenate([state["tail"], eq], axis=0)
        i0 = (272 - w_best) % 272
        out_syms = jax.lax.dynamic_slice(
            buf, (i0.astype(jnp.int32), jnp.int32(0)), (nsym, cfg.ncarriers))
        out = self._pilots.extract(out_syms)
        return ({"frame_w": jnp.reshape(w_best.astype(jnp.int32), (1,)),
                 "tail": buf[buf.shape[0] - 272:]},
                (out.reshape(-1).astype(jnp.complex64),))


class DvbtDemap(SyncBlock):
    """dvbt_demap: constellation points -> symbol bytes."""

    def __init__(self, cfg: DVBTConfig, name=None):
        super().__init__(PortSpec(C), PortSpec(B), name)
        self.cfg = cfg

    def work(self, state, x):
        return state, dtv.dvbt_demap(x, self.cfg).astype(jnp.int8)


class DvbtBitInnerDeinterleaver(SyncBlock):
    """126-symbol block bit deinterleaver (inverse of the TX block)."""

    def __init__(self, cfg: DVBTConfig, name=None):
        super().__init__(PortSpec(B), PortSpec(B), name)
        self.cfg = cfg
        self.output_multiple = dtv.BSIZE

    def work(self, state, x):
        y = dtv.bit_inner_deinterleave(x.astype(jnp.int32), self.cfg.m)
        return state, y.astype(jnp.int8)


class DvbtViterbiDecoder(Block):
    """dvbt_viterbi_decoder: symbol bytes -> decoded data bytes (K=7
    mother code, punctured; vectorized-ACS Viterbi from ops/fec). Chunk-
    local traceback: with superframe-sized chunks the boundary loss is a
    handful of bits, inside RS(204,188)'s correction budget — the
    reference carries the trellis across calls instead."""

    def __init__(self, cfg: DVBTConfig, name=None):
        super().__init__(name)
        self.cfg = cfg
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(B),)
        self.output_multiple = 272 * cfg.payload_length

    @property
    def in_rates(self):
        return (Fraction(8 * self.cfg.cr_n),)

    @property
    def out_rates(self):
        return (Fraction(self.cfg.m * self.cfg.cr_k),)

    def apply(self, state, inputs, n_in):
        cfg = self.cfg
        syms = inputs[0].astype(jnp.int32) & 0xFF
        cbits = dtv.symbols_to_bits(syms, cfg.m)
        soft = 1.0 - 2.0 * cbits.astype(jnp.float32)
        nbits = syms.shape[0] * cfg.m * cfg.cr_k // cfg.cr_n
        bits = dtv.inner_decode_bits(soft, cfg.code_rate, nbits)
        return state, (dtv.bits_to_bytes(bits).astype(jnp.int8),)


class DvbtConvolutionalDeinterleaver(SyncBlock):
    """Forney deinterleaver I=12 M=17 (branch-FIFO tail carried)."""

    def __init__(self, I: int = 12, M: int = 17, name=None):
        super().__init__(PortSpec(B), PortSpec(B), name)
        self.I, self.M = int(I), int(M)
        self.output_multiple = self.I

    def init_state(self):
        return {"tail": dtv.conv_interleaver_init(self.I, self.M)}

    def work(self, state, x):
        y, tail = dtv.conv_deinterleave(x.astype(jnp.int32) & 0xFF,
                                        state["tail"], self.I, self.M)
        return {"tail": tail}, y.astype(jnp.int8)


class DvbtReedSolomonDec(Block):
    """RS(204,188) decoder, per packet."""

    def __init__(self, name=None):
        super().__init__(name)
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(B),)

    @property
    def in_rates(self):
        return (Fraction(204),)

    @property
    def out_rates(self):
        return (Fraction(188),)

    def apply(self, state, inputs, n_in):
        y = dtv.rs_decode_packets(inputs[0].astype(jnp.int32) & 0xFF)
        return state, (y.astype(jnp.int8),)


class DvbtEnergyDescramble(SyncBlock):
    """PRBS energy descramble with 8-packet GROUP-PHASE DETECTION: the
    dispersal inverts every 8th sync byte to 0xB8 (NSYNC), so the group
    boundary is recovered by voting over packet-start bytes — the MUX-layer
    sync search the reference relies on (dvbt_energy_descramble_impl.cc
    searches for NSYNC before descrambling). Packet (188-byte) alignment
    is a stream invariant upstream (RS dec emits whole packets); the PRBS
    mask is rolled to the detected phase, so a decode prologue of any
    whole-packet length (e.g. the demod block's one-superframe latency)
    cannot break descrambling."""

    def __init__(self, name=None):
        super().__init__(PortSpec(B), PortSpec(B), name)
        self.output_multiple = 1504

    def work(self, state, x):
        xi = x.astype(jnp.int32) & 0xFF
        n = xi.shape[0]
        starts = xi[::188]                         # packet-start bytes
        npkt = starts.shape[0]
        ph = jnp.arange(8)
        pid = jnp.arange(npkt)
        votes = jnp.sum((starts[None, :] == dtv.NSYNC)
                        & ((pid[None, :] % 8) == ph[:, None]), axis=1)
        g = jnp.argmax(votes)                      # group starts at pkt g
        mask = jnp.tile(jnp.asarray(dtv._DISPERSAL_MASK, jnp.int32),
                        n // 1504)
        mask = jnp.roll(mask, g * 188)
        out = xi ^ mask
        is_sync = (jnp.arange(n) % 188) == 0
        out = jnp.where(is_sync, dtv.SYNC, out)
        return state, out.astype(jnp.int8)


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


def dvbt_symbol_inner_interleaver(cfg: DVBTConfig = None, direction=1, **_):
    return DvbtSymbolInnerInterleaver(cfg or DVBTConfig(), direction)


def dvbt_map_b(cfg: DVBTConfig = None, **_):
    return DvbtMap(cfg or DVBTConfig())


def dvbt_reference_signals(cfg: DVBTConfig = None, **_):
    return DvbtReferenceSignals(cfg or DVBTConfig())


def dvbt_ofdm_sym_acquisition(cfg: DVBTConfig = None, snr_db: float = 20.0,
                              **_):
    return DvbtOfdmSymAcquisition(cfg or DVBTConfig(), snr_db)


def dvbt_demod_reference_signals(cfg: DVBTConfig = None, **_):
    return DvbtDemodReferenceSignals(cfg or DVBTConfig())


def dvbt_demap_b(cfg: DVBTConfig = None, **_):
    return DvbtDemap(cfg or DVBTConfig())


def dvbt_bit_inner_deinterleaver(cfg: DVBTConfig = None, **_):
    return DvbtBitInnerDeinterleaver(cfg or DVBTConfig())


def dvbt_viterbi_decoder(cfg: DVBTConfig = None, **_):
    return DvbtViterbiDecoder(cfg or DVBTConfig())


def dvbt_convolutional_deinterleaver(I=12, M=17, **_):
    return DvbtConvolutionalDeinterleaver(I, M)


def dvbt_reed_solomon_dec(**_):
    return DvbtReedSolomonDec()


def dvbt_energy_descramble(**_):
    return DvbtEnergyDescramble()

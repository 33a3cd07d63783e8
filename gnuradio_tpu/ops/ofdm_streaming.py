"""Streaming OFDM/packet RX blocks — continuous multi-burst reception as a
BLOCK GRAPH (not burst functions).

Reference parity:
  ofdm_sync_sc_cfb       gr-digital/lib/ofdm_sync_sc_cfb_impl.cc +
                         include/gnuradio/digital/ofdm_sync_sc_cfb.h:22 —
                         Schmidl & Cox metric -> (fine freq, trigger) streams
  header_payload_demux   gr-digital/lib/header_payload_demux_impl.cc —
                         trigger-gated splitting of a stream into header and
                         payload sections, payload length fed back from the
                         header parser
  plateau_detector_fb    gr-blocks/lib/plateau_detector_fb_impl.cc

TPU design (SURVEY.md §7 hard part (b) — data-dependent output under static
shapes): the demux emits fixed-size SLOTS with validity masks instead of
variable-length sections. The input is divided into regions of R samples; at
most one burst may start per region (a protocol spacing contract, like the
reference's requirement that triggers not overlap a frame). Each region
yields one header slot (vlen Hl), one payload slot (vlen Pm, zero-padded),
a validity byte, and a payload-length int — all static shapes, all gathers,
no host round-trip. The reference's header-parser feedback message becomes
a traced `parser` function evaluated on-device inside the same step.

Latency: D = ceil((Hl+Pm)/R) regions of lookahead are carried, replacing
the reference's stall-until-header-parsed scheduling with a fixed pipeline
delay.
"""
from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from ..core.block import Block
from ..core.stream import PortSpec, B, C, F, I
from .ofdm import schmidl_cox_metric


class OfdmSyncScCfb(Block):
    """Streaming Schmidl & Cox detector: complex stream in, two streams out
    at the same rate — port 0: fine frequency offset estimate (rad/sample,
    valid at trigger positions), port 1: trigger byte (1 at the detected
    start-of-burst).

    The metric at position i needs fft_len samples of lookahead, so outputs
    are DELAYED by fft_len+cp_len samples relative to the input (carried
    tail); downstream blocks see trigger[i] marking data sample i in their
    own (equally delayed) stream — offsets stay aligned, matching the
    reference's use of a parallel delay block on the data path.

    Trigger rule: rising edge of (M > threshold), delayed cp_len/2 into the
    plateau (plateau_detector_fb's mid-plateau emission)."""

    def __init__(self, fft_len: int, cp_len: int, threshold: float = 0.7,
                 name=None):
        super().__init__(name)
        self.fft_len, self.cp_len = int(fft_len), int(cp_len)
        self.threshold = float(threshold)
        self.in_ports = (PortSpec(C),)
        self.out_ports = (PortSpec(F), PortSpec(B))
        self.D = self.fft_len + self.cp_len  # lookahead / output delay

    def init_state(self):
        return {"tail": jnp.zeros(self.D, C),
                "above": jnp.zeros((), jnp.bool_),
                "since_edge": jnp.full((), 1 << 30, jnp.int32)}

    def apply(self, state, inputs, n_in):
        x = inputs[0]
        n = x.shape[0]
        L = self.fft_len // 2
        xp = jnp.concatenate([state["tail"], x])
        tail = xp[xp.shape[0] - self.D:]
        # metric for output positions 0..n-1 (input positions delayed by D)
        M, P = schmidl_cox_metric(xp, self.fft_len)
        M, P = M[:n], P[:n]
        freq = (jnp.angle(P) / L).astype(jnp.float32)
        above = M > self.threshold
        prev = jnp.concatenate([state["above"][None], above[:-1]])
        edge = above & ~prev
        # mid-plateau delay: trigger cp_len//2 after the rising edge. Track
        # samples-since-edge across the chunk with an associative scan:
        # s[i] = 0 at an edge else s[i-1]+1
        d = self.cp_len // 2

        def comb(a, b):
            # (count, reset) pairs: if b resets, count = b.count
            ca, ra = a
            cb, rb = b
            return jnp.where(rb, cb, ca + cb), ra | rb

        counts, _ = jax.lax.associative_scan(
            comb, (jnp.where(edge, 0, 1).astype(jnp.int32), edge))
        # seed with carry from previous chunk
        seeded = jnp.where(
            jax.lax.associative_scan(jnp.logical_or, edge),
            counts, counts + state["since_edge"])
        trig = (seeded == d).astype(jnp.int8)
        new_state = {"tail": tail, "above": above[-1],
                     "since_edge": jnp.minimum(seeded[-1], 1 << 30)}
        return new_state, (freq, trig)


def ofdm_sync_sc_cfb(fft_len, cp_len, threshold=0.7):
    return OfdmSyncScCfb(fft_len, cp_len, threshold)


class HeaderPayloadDemux(Block):
    """Slot-based header/payload demux (header_payload_demux_impl.cc).

    Inputs : port 0 complex data, port 1 trigger bytes (aligned streams).
    Outputs per region of R input samples (static 1-per-region rates):
      port 0: header slot  — vlen = header_len complex
      port 1: payload slot — vlen = payload_max complex (zero-padded)
      port 2: valid byte   — 1 if a trigger fired in the region
      port 3: payload len  — int32 items (parser output, or payload_max)

    `parser(header_slot) -> int32 length` is traced on-device — the
    reference's async header_data message loop collapsed into the step.
    Protocol contract: at most one burst starts per region (reference
    analog: triggers during a frame are ignored)."""

    def __init__(self, region_len: int, header_len: int, payload_max: int,
                 parser=None, lead: int = 0, items_per_symbol: int = 1,
                 output_symbols: bool = False, name=None):
        super().__init__(name)
        self.R = int(region_len)
        # with output_symbols (the reference's OFDM use), header_len and
        # payload_max count SYMBOLS of items_per_symbol samples, and the
        # header/payload ports emit items_per_symbol-vectors
        self.S = int(items_per_symbol) if output_symbols else 1
        self.out_sym = bool(output_symbols) and self.S > 1
        self.Hl = int(header_len) * self.S
        self.Pm = int(payload_max) * self.S
        self.parser = parser
        # slots start `lead` samples BEFORE the trigger (margin for trigger
        # jitter; the reference demux has guard_interval/extra-item analogs)
        self.lead = int(lead)
        self.D = -(-(self.Hl + self.Pm) // self.R)  # lookahead regions
        # trigger port optional (the reference's io_signature allows
        # running trigger-less, bursts located by tags/msgs only)
        self.optional_inputs = (1,)
        if self.out_sym:
            self.in_ports = (PortSpec(C), PortSpec(B))
            self.out_ports = (PortSpec(C, self.S), PortSpec(C, self.S),
                              PortSpec(B), PortSpec(I))
        else:
            self.in_ports = (PortSpec(C), PortSpec(B))
            self.out_ports = (PortSpec(C, self.Hl), PortSpec(C, self.Pm),
                              PortSpec(B), PortSpec(I))
        self.tag_policy = "dont"

    @property
    def in_rates(self):
        return (Fraction(self.R), Fraction(self.R))

    @property
    def out_rates(self):
        if self.out_sym:
            return (Fraction(self.Hl // self.S),
                    Fraction(self.Pm // self.S), Fraction(1), Fraction(1))
        return (Fraction(1),) * 4

    def init_state(self):
        return {"dtail": jnp.zeros(self.D * self.R, C),
                "ttail": jnp.zeros(self.D * self.R, jnp.int8)}

    def apply(self, state, inputs, n_in):
        x, trig = inputs
        k = x.shape[0] // self.R  # regions this step
        R, Hl, Pm = self.R, self.Hl, self.Pm
        xp = jnp.concatenate([state["dtail"], x])
        tp = jnp.concatenate([state["ttail"], trig])
        new_state = {"dtail": xp[xp.shape[0] - self.D * R:],
                     "ttail": tp[tp.shape[0] - self.D * R:]}
        # process the k OLDEST regions (fixed D-region latency)
        tr = tp[: k * R].reshape(k, R)
        has = jnp.any(tr > 0, axis=1)
        first = jnp.argmax(tr > 0, axis=1)              # (k,) offset in region
        start = jnp.maximum(jnp.arange(k) * R + first - self.lead, 0)
        hidx = start[:, None] + jnp.arange(Hl)[None, :]
        pidx = start[:, None] + Hl + jnp.arange(Pm)[None, :]
        hdr = xp[hidx]                                   # (k, Hl)
        pay = xp[pidx]                                   # (k, Pm)
        if self.parser is not None:
            plen = jax.vmap(self.parser)(hdr).astype(jnp.int32)
            plen = jnp.clip(plen, 0, Pm)
        else:
            plen = jnp.full((k,), Pm, jnp.int32)
        plen = jnp.where(has, plen, 0)
        mask = jnp.arange(Pm)[None, :] < plen[:, None]
        pay = jnp.where(mask, pay, 0)
        hdr = jnp.where(has[:, None], hdr, 0)
        if self.out_sym:
            hdr = hdr.reshape(-1, self.S)
            pay = pay.reshape(-1, self.S)
        return new_state, (hdr.astype(C), pay.astype(C),
                           has.astype(jnp.int8), plen)


def header_payload_demux(region_len, header_len, payload_max, parser=None,
                         items_per_symbol=1, output_symbols=False):
    return HeaderPayloadDemux(region_len, header_len, payload_max, parser,
                              items_per_symbol=items_per_symbol,
                              output_symbols=output_symbols)


# ---------------------------------------------------------------------------
# per-slot OFDM burst decoding + a ready-made header scheme, so the whole
# multi-burst receiver runs as a BLOCK GRAPH (ofdm_rx analog over slots)
# ---------------------------------------------------------------------------

def make_ofdm_header_parser(fft_len: int, cp_len: int, nf_max: int):
    """Header scheme: burst = [sync1, sync2, header sym, payload syms...].
    The header OFDM symbol carries the payload frame count in BPSK unary-
    majority blocks on the occupied carriers (robust without FEC: each of
    ceil(log2(nf_max+1)) bits is repeated across n_occ//nbits carriers and
    majority-decided — the packet_headergenerator/parser analog collapsed
    to one symbol). Returns (parser(slot)->payload_samples, make_header_sym
    (nframes)->freq-domain header symbol)."""
    from .ofdm import (default_occupied_carriers, ls_channel_estimate,
                       schmidl_cox_detect, schmidl_cox_preamble,
                       ofdm_demodulate)
    occ = default_occupied_carriers(fft_len)
    occ_idx = np.asarray([c % fft_len for c in occ], np.int32)
    n_occ = len(occ_idx)
    nbits = max(1, int(np.ceil(np.log2(nf_max + 1))))
    per = n_occ // nbits
    w1, w2 = schmidl_cox_preamble(fft_len)
    sym_len = fft_len + cp_len

    def make_header_sym(nframes: int) -> np.ndarray:
        bits = [(nframes >> i) & 1 for i in range(nbits)]
        sym = np.zeros(fft_len, np.complex64)
        for i, b in enumerate(bits):
            sym[occ_idx[i * per:(i + 1) * per]] = 1.0 - 2.0 * b
        # unused tail carriers carry bit 0's sign
        sym[occ_idx[nbits * per:]] = 1.0
        return sym

    def parser(slot):
        d, fine = schmidl_cox_detect(slot, fft_len, cp_len, threshold=0.6)
        xc = slot * jnp.exp(-1j * fine *
                            jnp.arange(slot.shape[0], dtype=jnp.float32))
        F = ofdm_demodulate(xc, 3, fft_len, cp_len, d)
        H = ls_channel_estimate(F[1], jnp.asarray(w2), fft_len)
        Hs = jnp.where(jnp.abs(H) > 1e-9, H, 1.0)
        hdr = (F[2] / Hs)[jnp.asarray(occ_idx)]
        bits = []
        for i in range(nbits):
            grp = hdr[i * per:(i + 1) * per].real
            bits.append((jnp.sum(grp) < 0).astype(jnp.int32))
        nf = sum(b << i for i, b in enumerate(bits))
        nf = jnp.clip(nf, 0, nf_max)
        return nf * sym_len

    return parser, make_header_sym


class OfdmBurstDecoder(Block):
    """Per-slot OFDM burst decoder (the ofdm_rx tail as ONE vlen block):
    inputs per slot — header slot (vlen Hl), payload slot (vlen Pm), valid
    byte, payload length; outputs — decided symbol indices (vlen
    nf_max*n_occ int32, zero-padded) and valid symbol count. Each slot
    re-synchronizes independently (S&C inside the slot), so trigger jitter
    up to the demux `lead` margin cancels exactly."""

    def __init__(self, fft_len: int, cp_len: int, nf_max: int,
                 header_len: int, payload_max: int, constellation=None,
                 name=None):
        super().__init__(name)
        from .digital import constellation_qpsk
        from .ofdm import default_occupied_carriers
        self.fft_len, self.cp_len, self.nf_max = fft_len, cp_len, nf_max
        self.Hl, self.Pm = int(header_len), int(payload_max)
        self.const = constellation or constellation_qpsk()
        self.occ = default_occupied_carriers(fft_len)
        self.n_occ = len(self.occ)
        self.in_ports = (PortSpec(C, self.Hl), PortSpec(C, self.Pm),
                         PortSpec(B), PortSpec(I))
        self.out_ports = (PortSpec(I, self.nf_max * self.n_occ), PortSpec(I))
        self.tag_policy = "dont"

    def apply(self, state, inputs, n_in):
        from .ofdm import (ls_channel_estimate, equalize_static,
                           ofdm_demodulate, schmidl_cox_detect,
                           schmidl_cox_preamble, serialize_carriers)
        hdr, pay, valid, plen = inputs
        fft_len, cp_len = self.fft_len, self.cp_len
        sym_len = fft_len + cp_len
        w1, w2 = schmidl_cox_preamble(fft_len)
        occ = self.occ

        def one(hslot, pslot, pl):
            x = jnp.concatenate([hslot, pslot])
            d, fine = schmidl_cox_detect(x, fft_len, cp_len, threshold=0.6)
            xc = x * jnp.exp(-1j * fine *
                             jnp.arange(x.shape[0], dtype=jnp.float32))
            F = ofdm_demodulate(xc, 3 + self.nf_max, fft_len, cp_len, d)
            H = ls_channel_estimate(F[1], jnp.asarray(w2), fft_len)
            eq = equalize_static(F[3:], H)
            syms = serialize_carriers(eq, fft_len, occ)
            idx = self.const.decision(syms).astype(jnp.int32)
            nf = pl // sym_len
            count = nf * self.n_occ
            k = jnp.arange(idx.shape[0], dtype=jnp.int32)
            return jnp.where(k < count, idx, 0), count

        # slots where the demux gathered a real burst; invalid slots decode
        # garbage but are masked to zero output
        idx, count = jax.vmap(one)(hdr, pay, plen)
        v = valid.astype(jnp.int32)
        idx = idx * v[:, None]
        count = count * v
        return state, (idx, count.astype(jnp.int32))


# ---------------------------------------------------------------------------
# granular OFDM RX blocks in the reference's vcvc/vcc forms (rx_ofdm.grc)
# ---------------------------------------------------------------------------

class OfdmEqualizerSpec:
    """digital.ofdm_equalizer_simpledfe / _static descriptor (GRC variable
    expressions call .base() like the reference's sptr wrappers)."""

    def __init__(self, kind, fft_len, constellation=None,
                 occupied_carriers=None, pilot_carriers=None,
                 pilot_symbols=None, alpha=0.1, symbols_skipped=0):
        self.kind = kind
        self.fft_len = int(fft_len)
        pts = getattr(constellation, "points", constellation)
        self.points = (np.asarray(pts, np.complex64).reshape(-1)
                       if pts is not None else None)
        self.occupied_carriers = occupied_carriers
        self.pilot_carriers = pilot_carriers
        self.pilot_symbols = pilot_symbols

    def base(self):
        return self


def ofdm_equalizer_simpledfe(fft_len, constellation=None,
                             occupied_carriers=None, pilot_carriers=None,
                             pilot_symbols=None, alpha=0.1,
                             symbols_skipped=0, **_):
    return OfdmEqualizerSpec("simpledfe", fft_len, constellation,
                             occupied_carriers, pilot_carriers,
                             pilot_symbols, alpha, symbols_skipped)


def ofdm_equalizer_static(fft_len, occupied_carriers=None,
                          pilot_carriers=None, pilot_symbols=None,
                          symbols_skipped=0, **_):
    return OfdmEqualizerSpec("static", fft_len, None, occupied_carriers,
                             pilot_carriers, pilot_symbols, 0.0,
                             symbols_skipped)


class OfdmChanestVcvc(Block):
    """digital_ofdm_chanest_vcvc (lib/ofdm_chanest_vcvc_impl.cc): consume
    the sync symbol(s) of each frame, LS-estimate the channel on active
    carriers, pass the n_data symbols through EQUALIZED by the estimate.

    Contract-level streaming composition: the reference attaches the
    estimate as a tag for the downstream frame equalizer; the static-shape
    graph applies the static LS correction here and the (simpledfe)
    frame equalizer refines decision-directed from unity — first-order
    identical, no dynamic tag payloads."""

    def __init__(self, sync_symbol1, sync_symbol2=None, n_data_symbols=1,
                 name=None):
        super().__init__(name)
        s1 = np.asarray(sync_symbol1, np.complex64).reshape(-1)
        self.fft_len = s1.shape[0]
        self.sync1 = s1
        self.sync2 = (np.asarray(sync_symbol2, np.complex64).reshape(-1)
                      if sync_symbol2 is not None
                      and len(np.atleast_1d(sync_symbol2)) else None)
        self.n_sync = 2 if self.sync2 is not None else 1
        self.n_data = int(n_data_symbols)
        self.in_ports = (PortSpec(C, self.fft_len),)
        self.out_ports = (PortSpec(C, self.fft_len),)

    @property
    def in_rates(self):
        return (Fraction(self.n_sync + self.n_data),)

    @property
    def out_rates(self):
        return (Fraction(self.n_data),)

    def apply(self, state, inputs, n_in):
        fr = inputs[0].reshape(-1, self.n_sync + self.n_data, self.fft_len)
        # estimate from the LAST sync symbol (the reference uses sync2
        # when present; sync1 then only resolves integer carrier offset)
        ref = jnp.asarray(self.sync2 if self.sync2 is not None
                          else self.sync1)
        rx_sync = fr[:, self.n_sync - 1, :]
        active = jnp.abs(ref) > 1e-9
        H = jnp.where(active, rx_sync / jnp.where(active, ref, 1.0), 1.0)
        data = fr[:, self.n_sync:, :]
        eq = jnp.where(active[None, None, :],
                       data / H[:, None, :], data)
        return state, (eq.reshape(-1, self.fft_len).astype(jnp.complex64),)


class OfdmFrameEqualizerVcvc(Block):
    """digital_ofdm_frame_equalizer_vcvc: symbol-by-symbol decision-
    directed (simpledfe) or passthrough (static, estimate already applied
    upstream) equalization; H carried across chunks."""

    def __init__(self, equalizer: OfdmEqualizerSpec, cp_len=0,
                 fixed_frame_len=0, name=None):
        super().__init__(name)
        self.spec = equalizer
        self.fft_len = equalizer.fft_len
        self.in_ports = (PortSpec(C, self.fft_len),)
        self.out_ports = (PortSpec(C, self.fft_len),)

    @property
    def in_rates(self):
        return (Fraction(1),)

    @property
    def out_rates(self):
        return (Fraction(1),)

    def init_state(self):
        return jnp.ones(self.fft_len, jnp.complex64)

    def apply(self, state, inputs, n_in):
        syms = inputs[0].reshape(-1, self.fft_len)
        if self.spec.kind != "simpledfe" or self.spec.points is None:
            return state, (syms.astype(jnp.complex64),)
        pts = jnp.asarray(self.spec.points)

        def step(H, y):
            eq = y / H
            d = pts[jnp.argmin(jnp.abs(eq[:, None] - pts[None, :]),
                               axis=1)]
            upd = jnp.where(jnp.abs(d) > 1e-9, y / d, H)
            H = 0.9 * H + 0.1 * upd
            return H, eq

        H, out = jax.lax.scan(step, state, syms)
        return H, (out.astype(jnp.complex64),)


class OfdmSerializerVcc(Block):
    """digital_ofdm_serializer_vcc: pick the occupied carriers out of each
    fft_len vector (input_is_shifted offsets indices by fft_len/2)."""

    def __init__(self, fft_len, occupied_carriers, input_is_shifted=True,
                 name=None):
        super().__init__(name)
        self.fft_len = int(fft_len)
        occ = occupied_carriers
        if len(occ) and isinstance(occ[0], (list, tuple, np.ndarray)):
            occ = occ[0]
        idx = np.asarray(occ, np.int64)
        if input_is_shifted in (True, "True", "true", 1):
            idx = idx + self.fft_len // 2
        else:
            idx = idx % self.fft_len
        self.idx = idx.astype(np.int32)
        self.in_ports = (PortSpec(C, self.fft_len),)
        self.out_ports = (PortSpec(C),)

    @property
    def in_rates(self):
        return (Fraction(1),)

    @property
    def out_rates(self):
        return (Fraction(len(self.idx)),)

    def apply(self, state, inputs, n_in):
        syms = inputs[0].reshape(-1, self.fft_len)
        out = syms[:, jnp.asarray(self.idx)]
        return state, (out.reshape(-1).astype(jnp.complex64),)

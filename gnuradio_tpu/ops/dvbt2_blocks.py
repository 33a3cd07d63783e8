"""DVB-T2 / DVB-S2 TX stages as streaming graph Blocks (GRC interop:
lets gr-dtv/examples/vv0*.grc, germany-g*.grc and dvbs2_tx.grc load and
run under TopBlock, block for block).

Each class wraps a functional kernel from ops/dvbs2.py, ops/dvbt2.py or
ops/dvbt2_frame.py with the reference block's stream contract:

  dtv_dvb_bbheader_bb        gr-dtv/lib/dvb/dvb_bbheader_bb_impl.cc
  dtv_dvb_bbscrambler_bb     gr-dtv/lib/dvb/dvb_bbscrambler_bb_impl.cc
  dtv_dvb_bch_bb             gr-dtv/lib/dvb/dvb_bch_bb_impl.cc
  dtv_dvb_ldpc_bb            gr-dtv/lib/dvb/dvb_ldpc_bb_impl.cc
  dtv_dvbt2_interleaver_bb   gr-dtv/lib/dvbt2/dvbt2_interleaver_bb_impl.cc
  dtv_dvbt2_modulator_bc     gr-dtv/lib/dvbt2/dvbt2_modulator_bc_impl.cc
  dtv_dvbt2_cellinterleaver_cc   .../dvbt2_cellinterleaver_cc_impl.cc
  dtv_dvbt2_framemapper_cc   .../dvbt2_framemapper_cc_impl.cc
  dtv_dvbt2_freqinterleaver_cc   .../dvbt2_freqinterleaver_cc_impl.cc
  dtv_dvbt2_pilotgenerator_cc    .../dvbt2_pilotgenerator_cc_impl.cc
  dtv_dvbt2_paprtr_cc        .../dvbt2_paprtr_cc_impl.cc
  dtv_dvbt2_p1insertion_cc   .../dvbt2_p1insertion_cc_impl.cc
  dtv_dvbt2_miso_cc          .../dvbt2_miso_cc_impl.cc
  dtv_dvbs2_interleaver_bb   gr-dtv/lib/dvbs2/dvbs2_interleaver_bb_impl.cc
  dtv_dvbs2_physical_cc      gr-dtv/lib/dvbs2/dvbs2_physical_cc_impl.cc

Alignment discipline: per-tick units are whole BBFRAMEs / FEC blocks /
T2 frames, so the rate solver lands every kernel on its natural reset
boundary and the only carried state is the frame-index counter in the
framemapper (for the L1-post FRAME_IDX field).

Documented simplification (as in ops/dvbs2.bbheader_frame): BBFRAMEs
carry whole TS packets (syncd = 0, remainder zero-padded) instead of the
reference's packet splitting across frames — contract-level for the TX
waveform examples, which never parse the padding."""
from __future__ import annotations

from fractions import Fraction

import jax.numpy as jnp
import numpy as np

from ..core.block import Block, SyncBlock
from ..core.stream import PortSpec, B, C
from . import dvbs2, dvbt2
from .dvbs2 import DVBS2Config
from .dvbt2 import DVBT2Config
from . import dvbt2_frame as t2f
from .dvbt2_frame import T2Params


def _crc8_matrix(nbits: int) -> np.ndarray:
    """[nbits, 8] GF(2) matrix: crc8_bits = bits @ M mod 2 (CRC-8 with
    zero init is linear; row i = register state after an impulse at bit
    i followed by the remaining zero steps)."""
    M = np.zeros((nbits, 8), np.int8)
    state = 0xAB                 # impulse response of one input-1 step
    for i in range(nbits - 1, -1, -1):
        M[i] = [(state >> n) & 1 for n in range(8)]
        b = state & 1            # advance one zero-input step
        state >>= 1
        if b:
            state ^= 0xAB
    return M


class DvbBBHeader(Block):
    """TS bytes -> BBFRAME bits (80-bit header + payload, CRC-8 sync
    replacement carried across chunks as the 8-bit state).

    All device-side: byte->bit unpack, CRC-8 as a GF(2) bit-matmul
    (linear with zero init), one roll to place each packet's CRC in the
    NEXT packet's sync slot."""

    def __init__(self, cfg: DVBS2Config, name=None):
        super().__init__(name)
        self.cfg = cfg
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(B),)
        dfl = cfg.kbch - 80
        self.npkt = dfl // (188 * 8)
        ro_bits = {0.35: (0, 0), 0.25: (0, 1), 0.20: (1, 0)}[cfg.rolloff]
        hdr = [1, 1, 1, 1, 0, 0, ro_bits[0], ro_bits[1]] + [0] * 8
        upl = 188 * 8
        hdr += [(upl >> n) & 1 for n in range(15, -1, -1)]
        hdr += [(dfl >> n) & 1 for n in range(15, -1, -1)]
        hdr += [(0x47 >> n) & 1 for n in range(7, -1, -1)]
        hdr += [0] * 16                       # syncd
        hdr = np.array(hdr, np.int64)
        self._hdr = np.concatenate([hdr, dvbs2._crc8_bits(hdr)])
        self._crcM = _crc8_matrix(187 * 8)

    @property
    def in_rates(self):
        return (Fraction(self.npkt * 188),)

    @property
    def out_rates(self):
        return (Fraction(self.cfg.kbch),)

    def init_state(self):
        return jnp.zeros(8, jnp.int32)        # CRC-8 of previous packet

    def apply(self, state, inputs, n_in):
        kbch = self.cfg.kbch
        pkts = inputs[0].reshape(-1, 188).astype(jnp.int32) & 0xFF
        bits = ((pkts[:, :, None] >> jnp.arange(7, -1, -1)) & 1)
        bits = bits.reshape(pkts.shape[0], 188 * 8)
        crc = (bits[:, 8:].astype(jnp.float32)
               @ jnp.asarray(self._crcM, jnp.float32)).astype(jnp.int32) & 1
        # packet i's sync byte (MSB-first) <- crc of packet i-1
        prev = jnp.concatenate([state[None], crc[:-1]], axis=0)
        sync_bits = prev[:, ::-1]             # register bit n -> MSB order
        bits = bits.at[:, :8].set(sync_bits)
        nfr = pkts.shape[0] // self.npkt
        payload = bits.reshape(nfr, self.npkt * 188 * 8)
        frames = jnp.concatenate([
            jnp.tile(jnp.asarray(self._hdr, jnp.int32)[None], (nfr, 1)),
            payload,
            jnp.zeros((nfr, kbch - 80 - payload.shape[1]), jnp.int32),
        ], axis=1)
        return crc[-1], (frames.reshape(-1).astype(jnp.int8),)


class DvbBBScrambler(SyncBlock):
    """BBFRAME PRBS scrambler, reset every kbch bits."""

    def __init__(self, cfg: DVBS2Config, name=None):
        super().__init__(PortSpec(B), PortSpec(B), name)
        self.cfg = cfg
        self.output_multiple = cfg.kbch

    def work(self, state, x):
        fr = x.reshape(-1, self.cfg.kbch).astype(jnp.int32)
        return state, dvbs2.bbscramble(fr).reshape(-1).astype(jnp.int8)


class DvbBCH(Block):
    def __init__(self, cfg: DVBS2Config, name=None):
        super().__init__(name)
        self.cfg = cfg
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(B),)

    @property
    def in_rates(self):
        return (Fraction(self.cfg.kbch),)

    @property
    def out_rates(self):
        return (Fraction(self.cfg.nbch),)

    def apply(self, state, inputs, n_in):
        fr = inputs[0].reshape(-1, self.cfg.kbch).astype(jnp.int32)
        y = dvbs2.bch_encode(fr, self.cfg)
        return state, (y.reshape(-1).astype(jnp.int8),)


class DvbLDPC(Block):
    """standard='DVBT2' selects the T2-variant LDPC tables where they
    differ (2/3N, 3/5S)."""

    def __init__(self, cfg: DVBS2Config, standard="DVBT2", name=None):
        super().__init__(name)
        self.cfg = cfg
        self.standard = standard
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(B),)

    @property
    def in_rates(self):
        return (Fraction(self.cfg.nbch),)

    @property
    def out_rates(self):
        return (Fraction(self.cfg.frame),)

    def apply(self, state, inputs, n_in):
        fr = inputs[0].reshape(-1, self.cfg.nbch).astype(jnp.int32)
        if self.standard == "DVBT2":
            y = dvbt2.ldpc_encode(fr, self.cfg)
        else:
            y = dvbs2.ldpc_encode(fr, self.cfg)
        return state, (y.reshape(-1).astype(jnp.int8),)


class Dvbt2InterleaverBB(Block):
    """Codeword bits -> cell symbol indices (parity interleave + column
    twist + demux, one host-precomputed gather)."""

    def __init__(self, cfg: DVBT2Config, name=None):
        super().__init__(name)
        self.cfg = cfg
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(B),)

    @property
    def in_rates(self):
        return (Fraction(self.cfg.frame),)

    @property
    def out_rates(self):
        return (Fraction(self.cfg.cell_size),)

    def apply(self, state, inputs, n_in):
        cw = inputs[0].reshape(-1, self.cfg.frame).astype(jnp.int32)
        syms = dvbt2.bit_interleave(cw, self.cfg)
        return state, (syms.reshape(-1).astype(jnp.int8),)


class Dvbt2ModulatorBC(Block):
    """Symbol indices -> complex cells (rotation + per-FEC-block cyclic
    Q delay when enabled)."""

    def __init__(self, cfg: DVBT2Config, name=None):
        super().__init__(name)
        self.cfg = cfg
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(C),)

    @property
    def in_rates(self):
        return (Fraction(self.cfg.cell_size),)

    @property
    def out_rates(self):
        return (Fraction(self.cfg.cell_size),)

    def apply(self, state, inputs, n_in):
        syms = inputs[0].reshape(-1, self.cfg.cell_size).astype(jnp.int32)
        cells = dvbt2.map_cells(syms & 0xFF, self.cfg)
        return state, (cells.reshape(-1).astype(jnp.complex64),)


class Dvbt2CellInterleaver(Block):
    """Pseudo-random cell interleave + column/row time interleave as one
    gather per T2 frame."""

    def __init__(self, framesize: str, constellation: str, fecblocks: int,
                 tiblocks: int, name=None):
        super().__init__(name)
        self.in_ports = (PortSpec(C),)
        self.out_ports = (PortSpec(C),)
        self.perm = t2f.cell_time_perm(framesize, constellation,
                                       int(fecblocks), int(tiblocks))
        self.items = int(self.perm.size)

    @property
    def in_rates(self):
        return (Fraction(self.items),)

    @property
    def out_rates(self):
        return (Fraction(self.items),)

    def apply(self, state, inputs, n_in):
        fr = inputs[0].reshape(-1, self.items)
        return state, (fr[:, jnp.asarray(self.perm)].reshape(-1),)


class Dvbt2FrameMapper(Block):
    """stream_items cells -> mapped_items frame cells; carries the T2
    frame-index counter for the L1-post FRAME_IDX field."""

    def __init__(self, params: T2Params, name=None):
        super().__init__(name)
        self.params = params
        self.in_ports = (PortSpec(C),)
        self.out_ports = (PortSpec(C),)

    @property
    def in_rates(self):
        return (Fraction(self.params.stream_items),)

    @property
    def out_rates(self):
        return (Fraction(self.params.mapped_items),)

    def init_state(self):
        return jnp.zeros((1,), jnp.int32)

    def apply(self, state, inputs, n_in):
        p = self.params
        cells = inputs[0].reshape(-1, p.stream_items)
        out = t2f.frame_map(cells, p, frame_idx0=state[0])
        new = (state + cells.shape[0]) % p.t2frames
        return new, (out.reshape(-1).astype(jnp.complex64),)


class Dvbt2FreqInterleaver(Block):
    def __init__(self, params: T2Params, name=None):
        super().__init__(name)
        self.params = params
        self.in_ports = (PortSpec(C),)
        self.out_ports = (PortSpec(C),)

    @property
    def in_rates(self):
        return (Fraction(self.params.mapped_items),)

    @property
    def out_rates(self):
        return (Fraction(self.params.mapped_items),)

    def apply(self, state, inputs, n_in):
        p = self.params
        fr = inputs[0].reshape(-1, p.mapped_items)
        out = t2f.freq_interleave_frame(fr, p)
        return state, (out.reshape(-1).astype(jnp.complex64),)


class Dvbt2PilotGenerator(Block):
    """active_items cells -> num_symbols time-domain vectors of
    fft_len (pilot scatter + batched centered IFFT)."""

    def __init__(self, params: T2Params, name=None):
        super().__init__(name)
        self.params = params
        self.in_ports = (PortSpec(C),)
        self.out_ports = (PortSpec(C, vlen=params.fft_len),)

    @property
    def in_rates(self):
        return (Fraction(self.params.active_items),)

    @property
    def out_rates(self):
        return (Fraction(self.params.num_symbols),)

    def apply(self, state, inputs, n_in):
        p = self.params
        fr = inputs[0].reshape(-1, p.active_items)
        time = t2f.pilots_and_ifft(fr, p)
        return state, (time.reshape(-1, p.fft_len).astype(jnp.complex64),)


class Dvbt2Paprtr(Block):
    """Tone-reservation PAPR reduction on fft_len vectors."""

    def __init__(self, params: T2Params, name=None):
        super().__init__(name)
        self.params = params
        self.in_ports = (PortSpec(C, vlen=params.fft_len),)
        self.out_ports = (PortSpec(C, vlen=params.fft_len),)

    @property
    def in_rates(self):
        return (Fraction(self.params.num_symbols),)

    @property
    def out_rates(self):
        return (Fraction(self.params.num_symbols),)

    def apply(self, state, inputs, n_in):
        p = self.params
        syms = inputs[0].reshape(-1, p.num_symbols, p.fft_len)
        out = t2f.papr_tr(syms, p)
        return state, (out.reshape(-1, p.fft_len).astype(jnp.complex64),)


class Dvbt2P1Insertion(Block):
    """frame_items samples -> frame_items + 2048 (C-A-B P1 prepended)."""

    def __init__(self, params: T2Params, name=None):
        super().__init__(name)
        self.params = params
        self.in_ports = (PortSpec(C),)
        self.out_ports = (PortSpec(C),)

    @property
    def in_rates(self):
        return (Fraction(self.params.frame_items),)

    @property
    def out_rates(self):
        return (Fraction(self.params.frame_items + 2048),)

    def apply(self, state, inputs, n_in):
        p = self.params
        fr = inputs[0].reshape(-1, p.frame_items)
        return state, (t2f.p1_insert(fr, p).reshape(-1)
                       .astype(jnp.complex64),)


class Dvbt2Miso(Block):
    """1 in, 2 out: TX1 passthrough + TX2 Alamouti pair encoding."""

    def __init__(self, params: T2Params, name=None):
        super().__init__(name)
        self.params = params
        self.in_ports = (PortSpec(C),)
        self.out_ports = (PortSpec(C), PortSpec(C))

    @property
    def in_rates(self):
        return (Fraction(self.params.mapped_items),)

    @property
    def out_rates(self):
        return (Fraction(self.params.mapped_items),
                Fraction(self.params.mapped_items))

    def apply(self, state, inputs, n_in):
        t1, t2 = t2f.miso_split(inputs[0])
        return state, (t1.astype(jnp.complex64), t2.astype(jnp.complex64))


class Dvbs2InterleaverBB(Block):
    """DVB-S2 column bit interleaver: codeword bits -> symbol indices."""

    def __init__(self, cfg: DVBS2Config, name=None):
        super().__init__(name)
        self.cfg = cfg
        self.in_ports = (PortSpec(B),)
        self.out_ports = (PortSpec(B),)
        self.m = cfg.m

    @property
    def in_rates(self):
        return (Fraction(self.cfg.frame),)

    @property
    def out_rates(self):
        return (Fraction(self.cfg.frame // self.m),)

    def apply(self, state, inputs, n_in):
        cw = inputs[0].reshape(-1, self.cfg.frame).astype(jnp.int32)
        syms = dvbs2.interleave_bits(cw, self.cfg)
        return state, (syms.reshape(-1).astype(jnp.int8),)


class Dvbs2PhysicalCC(Block):
    """Constellation points -> PLFRAMEs (SOF + PLSC header + scrambled
    payload, optional pilot blocks)."""

    def __init__(self, cfg: DVBS2Config, goldcode: int = 0, name=None):
        super().__init__(name)
        self.cfg = cfg
        self.goldcode = int(goldcode)
        self.in_ports = (PortSpec(C),)
        self.out_ports = (PortSpec(C),)
        self.n_points = cfg.slots * 90
        probe = dvbs2.physical_frame(
            jnp.zeros((1, self.n_points), jnp.complex64), cfg)
        self.n_out = int(probe.shape[-1])

    @property
    def in_rates(self):
        return (Fraction(self.n_points),)

    @property
    def out_rates(self):
        return (Fraction(self.n_out),)

    def apply(self, state, inputs, n_in):
        pts = inputs[0].reshape(-1, self.n_points)
        pl = dvbs2.physical_frame(pts, self.cfg)
        return state, (pl.reshape(-1).astype(jnp.complex64),)

"""hier_block2 analog — composite blocks that flatten at compile time.

Reference parity: gr::hier_block2 (gnuradio-runtime/include/gnuradio/
hier_block2.h:85-144, lib/hier_block2_detail.cc:540-868). A hier block owns
an internal sub-graph plus "pad" bindings: its external input port p is a
source endpoint inside the sub-graph, its external output port q is bound to
one internal source. `top_block.start()` recursively flattens (flatten_aux,
hier_block2_detail.cc:855) before buffers are allocated; here
`Flowgraph.flatten()` expands every HierBlock before the graph compiler
traces the single jitted step — so a hier block costs NOTHING at runtime:
XLA sees exactly the same fused program as hand-wiring the internals.

Usage (mirrors gr python hier_block2):

    class WfmRcv(HierBlock):
        def __init__(self, quad_rate, audio_decimation):
            super().__init__("wfm_rcv", in_ports=(PortSpec(C),),
                             out_ports=(PortSpec(F),))
            demod = quadrature_demod_cf(...)
            audio = fir_filter_fff(...)
            self.connect((self, 0), demod, audio, (self, 0))

Inside `connect`, an endpoint referencing `self` denotes a pad: `(self, p)`
as a SOURCE means external input pad p; as a DESTINATION means external
output pad q. One input pad may fan out to several internal inputs (the
reference allows this); each output pad must be bound exactly once.
"""
from __future__ import annotations

from .block import Block
from .graph import Edge, Endpoint, Flowgraph, _as_endpoint


class HierBlock(Block):
    """Composite block: behaves as a normal Block in an outer Flowgraph;
    replaced by its internal sub-graph at compile time."""

    def __init__(self, name=None, in_ports=(), out_ports=()):
        super().__init__(name)
        self.in_ports = tuple(in_ports)
        self.out_ports = tuple(out_ports)
        self._int_edges: list[tuple[Endpoint, Endpoint]] = []
        self._int_blocks: list[Block] = []
        self._int_msg_edges: list[tuple] = []
        # external message port name -> (internal block, internal port name)
        self._msg_alias_in: dict = {}
        self._msg_alias_out: dict = {}
        self._finalized = False

    # ---- construction API (gr hier_block2 connect sugar) ----
    def connect(self, *points):
        if len(points) == 1:
            self._add_internal(_as_endpoint(points[0]).block)
            return
        for a, b in zip(points[:-1], points[1:]):
            self._connect_pair(_as_endpoint(a), _as_endpoint(b))

    def _add_internal(self, b: Block):
        if b is not self and b not in self._int_blocks:
            self._int_blocks.append(b)

    def _spec_of(self, ep: Endpoint, as_src: bool):
        if ep.block is self:
            # input pad acts as an internal source; output pad as a sink
            ports = self.in_ports if as_src else self.out_ports
            kind = "input" if as_src else "output"
            if ep.port >= len(ports):
                raise ValueError(f"{self}: no external {kind} pad {ep.port}")
            return ports[ep.port]
        ports = ep.block.out_ports if as_src else ep.block.in_ports
        if ep.port >= len(ports):
            raise ValueError(f"{ep.block} has no "
                             f"{'output' if as_src else 'input'} port {ep.port}")
        return ports[ep.port]

    def _connect_pair(self, src: Endpoint, dst: Endpoint):
        if src.block is self and dst.block is self:
            raise NotImplementedError(
                f"{self}: direct pad-to-pad passthrough is not supported; "
                "insert a copy block")
        sspec = self._spec_of(src, as_src=True)
        dspec = self._spec_of(dst, as_src=False)
        if (sspec.dtype != dspec.dtype) or (sspec.vlen != dspec.vlen):
            raise ValueError(
                f"{self}: type mismatch {src.block}:{src.port} ({sspec}) -> "
                f"{dst.block}:{dst.port} ({dspec})")
        if dst.block is not self:
            for s, d in self._int_edges:
                if d == dst:
                    raise ValueError(
                        f"{self}: input {dst.block}:{dst.port} already connected")
        else:
            for s, d in self._int_edges:
                if d == dst:
                    raise ValueError(
                        f"{self}: output pad {dst.port} already bound")
        self._add_internal(src.block)
        self._add_internal(dst.block)
        self._int_edges.append((src, dst))

    def msg_connect(self, src: Block, src_port: str, dst: Block, dst_port: str):
        """Internal async message edge."""
        if src_port not in src._msg_out:
            raise ValueError(f"{src} has no output message port {src_port!r}")
        if dst_port not in dst._msg_in:
            raise ValueError(f"{dst} has no input message port {dst_port!r}")
        self._add_internal(src)
        self._add_internal(dst)
        self._int_msg_edges.append((src, src_port, dst, dst_port))

    def msg_pad_in(self, ext_name: str, block: Block, int_name: str):
        """Alias an external input message port to an internal block's port
        (the hier message-pad analog)."""
        self.message_port_register_in(ext_name)
        self._msg_alias_in[ext_name] = (block, int_name)
        self._add_internal(block)

    def msg_pad_out(self, ext_name: str, block: Block, int_name: str):
        self.message_port_register_out(ext_name)
        self._msg_alias_out[ext_name] = (block, int_name)
        self._add_internal(block)

    # ---- flattening ----
    def _finalize(self):
        """Prefix internal block names once (state dict keys must be unique
        across multiple instantiations of the same hier class)."""
        if self._finalized:
            return
        self._finalized = True
        for b in self._int_blocks:
            b.name = f"{self.name}.{b.name}"

    def flatten_parts(self):
        """Return (pad_in, pad_out, int_edges, int_blocks, int_msg_edges)
        with pads resolved: pad_in[p] = [internal dst endpoints...],
        pad_out[q] = internal src endpoint."""
        self._finalize()
        pad_in: dict[int, list[Endpoint]] = {p: [] for p in range(self.nin)}
        pad_out: dict[int, Endpoint] = {}
        plain: list[tuple[Endpoint, Endpoint]] = []
        for s, d in self._int_edges:
            if s.block is self:
                pad_in[s.port].append(d)
            elif d.block is self:
                pad_out[d.port] = s
            else:
                plain.append((s, d))
        for p in range(self.nin):
            if not pad_in[p]:
                raise ValueError(f"{self}: external input pad {p} is unbound")
        for q in range(self.nout):
            if q not in pad_out:
                raise ValueError(f"{self}: external output pad {q} is unbound")
        return pad_in, pad_out, plain, list(self._int_blocks), \
            list(self._int_msg_edges)

    # HierBlock never executes directly — it must be flattened first.
    def apply(self, state, inputs, n_in):
        raise RuntimeError(
            f"{self}: HierBlock.apply called — the graph was not flattened "
            "(use Flowgraph.flatten() / TopBlock, not CompiledGraph on a "
            "raw graph)")


def expand_hier(fg: Flowgraph) -> Flowgraph:
    """Return a new Flowgraph with every HierBlock recursively replaced by
    its internal sub-graph (hier_block2_detail.cc flatten_aux analog).
    Non-hier graphs are returned unchanged (same object)."""
    while True:
        h = next((b for b in fg.blocks if isinstance(b, HierBlock)), None)
        if h is None:
            return fg
        fg = _expand_one(fg, h)


def _expand_one(fg: Flowgraph, h: HierBlock) -> Flowgraph:
    pad_in, pad_out, int_edges, int_blocks, int_msgs = h.flatten_parts()
    out = Flowgraph()
    for b in fg.blocks:
        if b is not h:
            out.add(b)
    for b in int_blocks:
        out.add(b)
    for e in fg.edges:
        srcs = ([e.src] if e.src.block is not h
                else [pad_out[e.src.port]])
        dsts = ([e.dst] if e.dst.block is not h
                else list(pad_in[e.dst.port]))
        for s in srcs:
            for d in dsts:
                out.edges.append(Edge(s, d))
    for s, d in int_edges:
        out.edges.append(Edge(s, d))
    # message edges: rewrite any endpoint referencing the hier via its aliases
    for (sb, sp, db, dp) in list(fg.msg_edges) + int_msgs:
        if sb is h:
            if sp not in h._msg_alias_out:
                raise ValueError(f"{h}: message edge from unaliased port {sp!r}")
            sb, sp = h._msg_alias_out[sp]
        if db is h:
            if dp not in h._msg_alias_in:
                raise ValueError(f"{h}: message edge to unaliased port {dp!r}")
            db, dp = h._msg_alias_in[dp]
        out.msg_edges.append((sb, sp, db, dp))
    return out

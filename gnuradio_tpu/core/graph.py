"""Flowgraph: edge list, validation, topological sort, rate unification.

Reference parity: gnuradio-runtime/lib/flowgraph.cc — `connect` type checks
(:45-48), `validate`/`check_contiguity` (:68,81-85), `topological_sort`
(:382). The reference validates byte-size equality between connected ports;
we validate dtype + vlen. Where the reference's scheduler negotiates chunk
sizes at runtime (forecast loop, block_executor.cc:423-449), we *unify
rational rates* across the graph once: every block gets a ticks-per-step
rational, and the step size is scaled so all per-edge item counts are
integers. That is the whole static replacement for forecast().
"""
from __future__ import annotations

import dataclasses
from fractions import Fraction
from math import gcd

from .block import Block, SinkBlock, SourceBlock


@dataclasses.dataclass(frozen=True)
class Endpoint:
    block: Block
    port: int


@dataclasses.dataclass(frozen=True)
class Edge:
    src: Endpoint
    dst: Endpoint


def _as_endpoint(x, default_port=0) -> Endpoint:
    if isinstance(x, Endpoint):
        return x
    if isinstance(x, Block):
        return Endpoint(x, default_port)
    if isinstance(x, tuple) and len(x) == 2 and isinstance(x[0], Block):
        return Endpoint(x[0], int(x[1]))
    raise TypeError(f"cannot interpret {x!r} as a graph endpoint")


class Flowgraph:
    """Edge-list graph of Blocks with gr-style connect sugar.

    `fg.connect(a, b, c)` chains a->b->c on port 0 (like
    python/gnuradio/gr/hier_block2.py:17-52's varargs connect); explicit ports
    via `(block, port)` tuples.
    """

    def __init__(self):
        self.edges: list[Edge] = []
        self._blocks: list[Block] = []  # insertion order
        # message edges: (src_block, out_port_name, dst_block, in_port_name)
        # (flowgraph msg_connect analog, flat_flowgraph.cc:61-69)
        self.msg_edges: list[tuple] = []

    # ---- construction ----
    def add(self, *blocks: Block):
        for b in blocks:
            if b not in self._blocks:
                self._blocks.append(b)
        return blocks[0] if len(blocks) == 1 else blocks

    def connect(self, *points):
        if len(points) == 1:
            self.add(_as_endpoint(points[0]).block)
            return
        for a, b in zip(points[:-1], points[1:]):
            self._connect_pair(_as_endpoint(a), _as_endpoint(b))

    def _connect_pair(self, src: Endpoint, dst: Endpoint):
        sb, sp, db, dp = src.block, src.port, dst.block, dst.port
        if sp >= sb.nout:
            raise ValueError(f"{sb} has no output port {sp}")
        if dp >= db.nin:
            raise ValueError(f"{db} has no input port {dp}")
        sspec, dspec = sb.out_ports[sp], db.in_ports[dp]
        if (sspec.dtype != dspec.dtype) or (sspec.vlen != dspec.vlen):
            # headless GUI stand-ins absorb anything: adopt the upstream
            # spec instead of failing (the reference GUI sinks are
            # similarly dtype-polymorphic via their 'type' option)
            if getattr(db, "accept_any_stream", False):
                ports = list(db.in_ports)
                ports[dp] = sspec
                db.in_ports = tuple(ports)
                dspec = sspec
            else:
                raise ValueError(
                    f"type mismatch connecting {sb}:{sp} ({sspec}) -> "
                    f"{db}:{dp} ({dspec})")
        for e in self.edges:
            if e.dst == dst:
                raise ValueError(f"input {db}:{dp} already connected")
        self.add(sb, db)
        self.edges.append(Edge(src, dst))

    def msg_connect(self, src: Block, src_port: str, dst: Block, dst_port: str):
        """Async message edge (hier_block2::msg_connect analog)."""
        if src_port not in src._msg_out:
            if getattr(src, "accept_any_msg", False):
                # permissive GUI stand-ins may also declare event ports
                # (freq sink click-to-tune) that never fire headless
                src.message_port_register_out(src_port)
            else:
                raise ValueError(
                    f"{src} has no output message port {src_port!r}")
        if dst_port not in dst._msg_in:
            if getattr(dst, "accept_any_msg", False):
                # permissive sinks (headless GUI stand-ins) absorb any
                # control-port message without declaring it up front
                dst.message_port_register_in(dst_port, lambda _m: None)
            else:
                raise ValueError(
                    f"{dst} has no input message port {dst_port!r}")
        self.add(src, dst)
        self.msg_edges.append((src, src_port, dst, dst_port))

    def disconnect(self, src, dst):
        """Remove one stream edge (flowgraph.cc disconnect analog). Blocks
        left with no edges stay registered; unreachable blocks fail
        validate() like the reference's contiguity checks."""
        s, d = _as_endpoint(src), _as_endpoint(dst)
        for e in self.edges:
            if e.src == s and e.dst == d:
                self.edges.remove(e)
                return
        raise ValueError(f"no edge {s} -> {d}")

    def remove_block(self, b: Block):
        """Drop a block and every edge touching it."""
        self.edges = [e for e in self.edges
                      if e.src.block is not b and e.dst.block is not b]
        self.msg_edges = [m for m in self.msg_edges
                          if m[0] is not b and m[2] is not b]
        if b in self._blocks:
            self._blocks.remove(b)

    def disconnect_all(self):
        self.edges = []
        self._blocks = []
        self.msg_edges = []

    # ---- hier flattening (hier_block2_detail.cc flatten_aux analog) ----
    def flatten(self) -> "Flowgraph":
        """Recursively expand HierBlocks; returns self if there are none."""
        from .hier import expand_hier
        return expand_hier(self)

    # ---- queries ----
    @property
    def blocks(self) -> list[Block]:
        return list(self._blocks)

    def in_edges(self, b: Block) -> list[Edge]:
        return sorted((e for e in self.edges if e.dst.block is b),
                      key=lambda e: e.dst.port)

    def out_edges(self, b: Block) -> list[Edge]:
        return [e for e in self.edges if e.src.block is b]

    # ---- validation (flowgraph.cc:68-122 analog) ----
    def validate(self):
        for b in self._blocks:
            if b.nin == 0 and b.nout == 0:
                continue  # message-only block: no stream constraints
            connected_in = {e.dst.port for e in self.in_edges(b)}
            if connected_in != set(range(b.nin)):
                missing = set(range(b.nin)) - connected_in
                raise ValueError(f"{b}: unconnected input ports {sorted(missing)}")
            # outputs may legitimately dangle in gr only for hier pads; here
            # every output must be consumed or the block be a sink
            connected_out = {e.src.port for e in self.out_edges(b)}
            missing_out = set(range(b.nout)) - connected_out
            if missing_out:
                raise ValueError(f"{b}: unconnected output ports {sorted(missing_out)}")
        stream_blocks = [b for b in self._blocks if b.nin or b.nout]
        if stream_blocks and not any(
                isinstance(b, SourceBlock) or b.nin == 0 for b in stream_blocks):
            raise ValueError("flowgraph has no source blocks")

    # ---- topo sort (flowgraph.cc:382 analog; Kahn) ----
    def topological_sort(self) -> list[Block]:
        indeg = {b: 0 for b in self._blocks}
        for e in self.edges:
            indeg[e.dst.block] += 1
        # stable order: seed with insertion order
        ready = [b for b in self._blocks if indeg[b] == 0]
        order = []
        while ready:
            b = ready.pop(0)
            order.append(b)
            for e in self.out_edges(b):
                indeg[e.dst.block] -= 1
                if indeg[e.dst.block] == 0:
                    ready.append(e.dst.block)
        if len(order) != len(self._blocks):
            raise ValueError("flowgraph contains a stream cycle (unsupported: "
                             "feedback must live inside a block's scan state)")
        return order

    # ---- rate unification: the static forecast() ----
    def solve_rates(self) -> dict:
        """Assign each block a ticks-per-step Fraction t_b such that for every
        edge, items(src) == items(dst): t_src*out_rate[p] == t_dst*in_rate[q].

        Returns {block: Fraction}. Raises on inconsistency (the analog of a
        flowgraph the reference scheduler would deadlock/starve on).
        """
        t: dict[Block, Fraction] = {}
        order = [b for b in self.topological_sort() if b.nin or b.nout]
        if not order:
            return {}
        # BFS over undirected connectivity, unifying constraints; a graph
        # may hold several independent chains (disconnected components) —
        # each gets its own t=1 anchor (the reference scheduler likewise
        # runs disjoint subgraphs independently)
        t[order[0]] = Fraction(1)
        pending = [order[0]]
        seeds = iter(order)
        adj: dict[Block, list] = {b: [] for b in self._blocks}
        for e in self.edges:
            adj[e.src.block].append(("out", e))
            adj[e.dst.block].append(("in", e))
        while pending:
            b = pending.pop()
            for kind, e in adj[b]:
                sb, db = e.src.block, e.dst.block
                orate = sb.out_rates[e.src.port]
                irate = db.in_rates[e.dst.port]
                if orate <= 0 or irate <= 0:
                    raise ValueError(f"non-positive rate on edge {e}")
                if kind == "out":
                    want = t[sb] * orate / irate
                    if db in t:
                        if t[db] != want:
                            raise ValueError(
                                f"rate mismatch at {db}: {t[db]} vs {want} via {sb}")
                    else:
                        t[db] = want
                        pending.append(db)
                else:
                    want = t[db] * irate / orate
                    if sb in t:
                        if t[sb] != want:
                            raise ValueError(
                                f"rate mismatch at {sb}: {t[sb]} vs {want} via {db}")
                    else:
                        t[sb] = want
                        pending.append(sb)
            if not pending:
                for nb in seeds:
                    if nb not in t:
                        t[nb] = Fraction(1)
                        pending.append(nb)
                        break
        missing = [b for b in self._blocks if b not in t and (b.nin or b.nout)]
        if missing:
            raise ValueError(f"disconnected blocks (no rate path): {missing}")
        return t

    def natural_step(self) -> int:
        """Smallest step multiplier S (in 'ticks' of the unification anchor)
        such that every per-edge and per-port item count is a positive integer
        and every block's output_multiple is honored."""
        t = self.solve_rates()
        denom_lcm = 1
        for b, tb in t.items():
            # whole ACTIVATIONS per step, not just whole item counts: a
            # block whose in_rate is l items/activation reshapes to
            # (n_act, l), so S*t[b] itself must be integral (5462 items
            # into a period-4 stream_mux is integral items but 1365.5
            # activations).
            denom_lcm = (denom_lcm * tb.denominator
                         // gcd(denom_lcm, tb.denominator))
            for r in tuple(b.in_rates) + tuple(b.out_rates):
                q = tb * r
                denom_lcm = denom_lcm * q.denominator // gcd(denom_lcm, q.denominator)
        S = denom_lcm
        # honor output_multiple: n_out = S * t_b * out_rate must be a multiple
        for b, tb in t.items():
            for r in b.out_rates:
                if b.output_multiple > 1:
                    n = S * tb * r
                    assert n.denominator == 1
                    n = n.numerator
                    m = b.output_multiple
                    need = m // gcd(n, m)
                    S *= need
        return int(S)

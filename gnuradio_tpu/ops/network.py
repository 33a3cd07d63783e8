"""gr-network analog: raw UDP/TCP stream blocks.

Reference parity: gr-network's tcp_sink, udp_source, udp_sink
(gr-network/include/gnuradio/network/*.h) — raw sample streams over
sockets, with optional simple headers (HEADERTYPE_NONE / SEQNUM). The TCP
stream pair with in-band tag headers lives in parallel.transport (the
gr-zeromq analog); this module provides the raw-datagram UDP pair.
"""
from __future__ import annotations

import socket
import struct

import numpy as np

from ..core.block import SinkBlock, SourceBlock
from ..core.stream import PortSpec, C, host_encode

HEADERTYPE_NONE = 0
HEADERTYPE_SEQNUM = 1


class UdpSink(SinkBlock):
    """udp_sink: fire datagrams of raw items (optionally seqnum-headed)."""

    def __init__(self, host: str, port: int, payload_items: int = 1024,
                 header: int = HEADERTYPE_NONE,
                 in_port: PortSpec = PortSpec(C), name=None):
        super().__init__(in_port, name)
        self.addr = (host, port)
        self.payload_items = int(payload_items)
        self.header = header
        self._seq = 0
        fam = socket.AF_INET6 if ":" in str(host) else socket.AF_INET
        self._sock = socket.socket(fam, socket.SOCK_DGRAM)
        self._pending = np.zeros(0, np.dtype(in_port.dtype))

    def collect(self, value):
        buf = np.concatenate([self._pending, np.asarray(value)])
        n = self.payload_items
        while len(buf) >= n:
            chunk, buf = buf[:n], buf[n:]
            payload = chunk.tobytes()
            if self.header == HEADERTYPE_SEQNUM:
                payload = struct.pack("<Q", self._seq) + payload
                self._seq += 1
            self._sock.sendto(payload, self.addr)
        self._pending = buf

    def flush(self):
        if len(self._pending):
            payload = self._pending.tobytes()
            if self.header == HEADERTYPE_SEQNUM:
                payload = struct.pack("<Q", self._seq) + payload
            self._sock.sendto(payload, self.addr)
            self._pending = self._pending[:0]

    def close(self):
        self._sock.close()


class UdpSource(SourceBlock):
    """udp_source: bind and stream received datagrams; `eof_on_timeout`
    ends the graph when the socket goes quiet (for QA/finite captures)."""

    is_fed = True

    def __init__(self, port: int, header: int = HEADERTYPE_NONE,
                 timeout: float = 2.0,
                 out_port: PortSpec = PortSpec(C), name=None):
        super().__init__(out_port, name)
        self.header = header
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind(("127.0.0.1", port))
        self._sock.settimeout(timeout)
        self.port = self._sock.getsockname()[1]
        self.items_supplied = 0
        self.stream_tags: list = []
        self.n_dropped = 0  # seqnum gaps observed

    def chunks(self, n: int):
        np_dtype = np.dtype(self.out_ports[0].dtype)
        buf = np.zeros(0, np_dtype)
        expect = None
        self.items_supplied = 0
        while True:
            while len(buf) < n:
                try:
                    data, _ = self._sock.recvfrom(65536)
                except socket.timeout:
                    data = b""
                if not data:
                    if len(buf):
                        pad = np.zeros(n - len(buf), np_dtype)
                        self.items_supplied += len(buf)
                        yield host_encode(np.concatenate([buf, pad]))
                    return
                if self.header == HEADERTYPE_SEQNUM:
                    (seq,) = struct.unpack_from("<Q", data, 0)
                    if expect is not None and seq != expect:
                        self.n_dropped += seq - expect
                    expect = seq + 1
                    data = data[8:]
                buf = np.concatenate([buf, np.frombuffer(data, np_dtype)])
            chunk, buf = buf[:n], buf[n:]
            self.items_supplied += n
            yield host_encode(chunk)

    def apply(self, state, inputs, n_in):
        return state, (inputs[0],)

    def close(self):
        self._sock.close()


def udp_sink(host, port, payload_items=1024, header=HEADERTYPE_NONE, dtype=C):
    return UdpSink(host, port, payload_items, header, PortSpec(dtype))


def udp_source(port, header=HEADERTYPE_NONE, timeout=2.0, dtype=C):
    return UdpSource(port, header, timeout, PortSpec(dtype))


def tcp_sink(addr="127.0.0.1", port=2000, server=True, mode=None, dtype=C,
             vlen=1, **_):
    """network_tcp_sink (gr-network/lib/tcp_sink_impl.cc): raw TCP stream
    sink. mode 1 = client (connect to addr:port), mode 2 / server=True =
    bind and wait for one peer; frames ride this package's framed
    transport (tags in-band — a superset of the reference's raw byte
    stream). IPv6 addresses select AF_INET6."""
    from ..parallel.transport import (StreamServer, StreamClient,
                                      TcpStreamSink)
    from ..core.stream import PortSpec
    if mode is not None:
        server = int(mode) == 2
    if server:
        peer = StreamServer(str(addr), int(port))
    else:
        peer = StreamClient(str(addr), int(port), timeout=10.0, lazy=True)
    return TcpStreamSink(peer, PortSpec(dtype, int(vlen or 1)))


def tcp_source(addr="127.0.0.1", port=2000, server=False, dtype=C, vlen=1,
               timeout=10.0, **_):
    """network_tcp_source: client mode connects (lazily, with retry);
    server mode binds and accepts one sender. Zero-fills while no data
    has arrived (the reference returns 0 items and retries)."""
    from ..parallel.transport import (StreamClient, StreamAcceptor,
                                      TcpStreamSource)
    from ..core.stream import PortSpec
    srv = server in (True, "True", "true", 1, "1")
    if srv:
        cli = StreamAcceptor(str(addr), int(port), float(timeout))
    else:
        cli = StreamClient(str(addr), int(port), float(timeout), lazy=True)
    return TcpStreamSource(cli, PortSpec(dtype, int(vlen or 1)),
                           fill_timeout=2.0)

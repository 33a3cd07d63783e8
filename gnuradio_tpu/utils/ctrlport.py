"""ControlPort analog: runtime introspection/control RPC over TCP.

Reference parity: gnuradio-runtime/lib/controlport/ (Thrift RPC exporting
knobs + perf counters, IDL lib/controlport/thrift/gnuradio.thrift; block
registration via rpcregisterhelpers.h; gated by prefs at
top_block_impl.cc:115-120). Clients: gr-ctrlport-monitor, gr-perf-monitorx.

Here: a single-threaded TCP server speaking length-prefixed PMT frames
(the same codec as parallel.transport) with a get/set/properties verb set.
Knobs are exported per block: every public scalar attribute of a Block plus
the TopBlock's PerfCounters. No Thrift dependency — the wire IS the
framework's own PMT codec, like the reference reuses pmt serialization."""
from __future__ import annotations

import socket
import struct
import threading

from ..core import pmt


def _send(sock, obj):
    blob = pmt.serialize(obj)
    sock.sendall(struct.pack("<I", len(blob)) + blob)


def _recv(sock):
    hdr = b""
    while len(hdr) < 4:
        c = sock.recv(4 - len(hdr))
        if not c:
            return None
        hdr += c
    (n,) = struct.unpack("<I", hdr)
    buf = b""
    while len(buf) < n:
        c = sock.recv(n - len(buf))
        if not c:
            return None
        buf += c
    return pmt.deserialize(buf)


_EXPORTABLE = (bool, int, float, complex, str)


class ControlPortServer:
    """Export a TopBlock's knobs + perf counters over TCP."""

    def __init__(self, top_block, bind_addr="127.0.0.1", port=0):
        self.tb = top_block
        self._lsock = socket.socket()
        self._lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._lsock.bind((bind_addr, port))
        self._lsock.listen(4)
        self.port = self._lsock.getsockname()[1]
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    # ---- knob table (rpcregisterhelpers analog: auto-export) ----
    def _blocks(self):
        return {b.name: b for b in self.tb.fg.blocks}

    def _properties(self):
        props = {}
        for name, b in self._blocks().items():
            for attr, val in vars(b).items():
                if attr.startswith("_"):
                    continue
                if isinstance(val, _EXPORTABLE):
                    props[f"{name}.{attr}"] = val
        for k, v in self.tb.perf.as_dict().items():
            props[f"perf.{k}"] = v
        return props

    def _handle(self, req):
        verb = req.get("op")
        if verb == "properties":
            return {"ok": True, "result": self._properties()}
        if verb == "get":
            return {"ok": True,
                    "result": {k: self._properties().get(k)
                               for k in req["keys"]}}
        if verb == "set":
            blocks = self._blocks()
            for key, val in req["values"].items():
                bname, attr = key.rsplit(".", 1)
                b = blocks.get(bname)
                if b is None or attr.startswith("_") or not hasattr(b, attr):
                    return {"ok": False, "error": f"no knob {key}"}
                setattr(b, attr, val)
            return {"ok": True, "result": None}
        return {"ok": False, "error": f"unknown op {verb!r}"}

    def _serve(self):
        self._lsock.settimeout(0.2)
        while not self._stop:
            try:
                conn, _ = self._lsock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            with conn:
                while True:
                    req = _recv(conn)
                    if req is None:
                        break
                    try:
                        _send(conn, self._handle(req))
                    except OSError:
                        break

    def close(self):
        self._stop = True
        self._thread.join(timeout=2)
        self._lsock.close()


class ControlPortClient:
    def __init__(self, addr, port, timeout=5.0):
        self._sock = socket.create_connection((addr, port), timeout=timeout)

    def _call(self, req):
        _send(self._sock, req)
        resp = _recv(self._sock)
        if resp is None or not resp.get("ok"):
            raise RuntimeError(resp and resp.get("error"))
        return resp["result"]

    def properties(self):
        return self._call({"op": "properties"})

    def get(self, *keys):
        return self._call({"op": "get", "keys": list(keys)})

    def set(self, **values):
        return self._call({"op": "set", "values": values})

    def close(self):
        self._sock.close()


# ---------------------------------------------------------------------------
# perf monitor client (gr-perf-monitorx / gr-ctrlport-monitor analog,
# text mode: poll a ControlPortServer and render the perf counters)
# ---------------------------------------------------------------------------

def monitor_snapshot(addr: str, port: int) -> dict:
    """One poll: {knob: value} for every exported property."""
    c = ControlPortClient(addr, port)
    try:
        return c.properties()
    finally:
        c.close()


def format_monitor(props: dict) -> str:
    """Render properties grouped by block, perf counters first."""
    perf = {k: v for k, v in sorted(props.items()) if k.startswith("perf.")}
    rest = {k: v for k, v in sorted(props.items()) if not k.startswith("perf.")}
    lines = ["== perf counters =="]
    for k, v in perf.items():
        lines.append(f"  {k[5:]:32s} {v}")
    lines.append("== block knobs ==")
    last_block = None
    for k, v in rest.items():
        b, _, attr = k.partition(".")
        if b != last_block:
            lines.append(f" [{b}]")
            last_block = b
        lines.append(f"   {attr:30s} {v!r}")
    return "\n".join(lines)


def monitor_main(argv=None):
    """`python -m gnuradio_tpu.utils.ctrlport HOST PORT [--interval S]
    [--count N]` — the gr-perf-monitorx text-mode analog."""
    import argparse
    import time as _time
    p = argparse.ArgumentParser(prog="gr-perf-monitor")
    p.add_argument("host")
    p.add_argument("port", type=int)
    p.add_argument("--interval", type=float, default=1.0)
    p.add_argument("--count", type=int, default=0,
                   help="number of polls (0 = forever)")
    a = p.parse_args(argv)
    i = 0
    while True:
        print(format_monitor(monitor_snapshot(a.host, a.port)), flush=True)
        i += 1
        if a.count and i >= a.count:
            return 0
        _time.sleep(a.interval)


if __name__ == "__main__":
    raise SystemExit(monitor_main())

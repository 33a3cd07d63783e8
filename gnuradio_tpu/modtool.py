"""modtool — scaffold out-of-tree (OOT) block modules; blocktool — block
introspection.

Reference parity:
  gr-utils/modtool/core/{newmod,add,rm,rename,info,makeyaml}.py — CLI that
      scaffolds `gr-<name>` OOT packages, adds block skeletons, generates
      GRC YAML descriptors.
  gr-utils/blocktool/ — parses block headers into JSON descriptions.

Here an OOT module is a plain Python package: blocks subclass
gnuradio_tpu.core.block.Block (device path) or gnuradio_tpu.gateway.*
(host path), tests use the golden-vector pattern, and YAML descriptors
drive the grc.py loader. Usage:

    python -m gnuradio_tpu.modtool newmod howto [--dir DIR]
    python -m gnuradio_tpu.modtool add square_ff --module DIR [--kind sync]
    python -m gnuradio_tpu.modtool info --module DIR
    python -m gnuradio_tpu.modtool makeyaml gnuradio_tpu.ops.blocks:Head
"""
from __future__ import annotations

import argparse
import importlib
import inspect
import json
import os
import textwrap


_INIT_TMPL = '''"""{name} — out-of-tree gnuradio_tpu module."""
from . import blocks  # noqa: F401
'''

_BLOCKS_TMPL = '''"""Blocks for the {name} OOT module."""
import jax.numpy as jnp
import numpy as np

from gnuradio_tpu.core.block import SyncBlock
from gnuradio_tpu.core.stream import PortSpec, C, F
'''

_BLOCK_SYNC_TMPL = '''

class {cls}(SyncBlock):
    """TODO: describe {snake}."""

    def __init__(self, name=None):
        super().__init__(PortSpec(F), PortSpec(F), name)

    def work(self, state, x):
        # TODO: implement; must return (state, y) with len(y) == len(x)
        return state, x * x


def {snake}():
    return {cls}()
'''

_GATEWAY_TMPL = '''

class {cls}(gateway.sync_block):
    """TODO: describe {snake} (host-side NumPy block)."""

    def __init__(self):
        super().__init__(name="{snake}", in_sig=[np.float32],
                         out_sig=[np.float32])

    def work(self, input_items, output_items):
        output_items[0][:] = input_items[0] ** 2
        return len(output_items[0])
'''

_QA_TMPL = '''"""QA for {snake} (golden-vector pattern)."""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.ops import blocks as blk

from {pkg}.blocks import {snake}


def test_{snake}():
    x = np.arange(16, dtype=np.float32)
    src = blk.vector_source(x)
    dut = {snake}()
    snk = blk.vector_sink_f()
    fg = Flowgraph()
    fg.connect(src, dut, snk)
    TopBlock(fg).run()
    np.testing.assert_allclose(snk.data(), x * x, rtol=1e-6)
'''


def newmod(name: str, directory: str = ".") -> str:
    """Scaffold an OOT package `<dir>/gr_<name>/` (modtool newmod)."""
    pkg = f"gr_{name}"
    root = os.path.join(directory, pkg)
    os.makedirs(os.path.join(root, "tests"), exist_ok=True)
    with open(os.path.join(root, "__init__.py"), "w") as f:
        f.write(_INIT_TMPL.format(name=name))
    with open(os.path.join(root, "blocks.py"), "w") as f:
        f.write(_BLOCKS_TMPL.format(name=name))
    with open(os.path.join(root, "tests", "__init__.py"), "w") as f:
        f.write("")
    with open(os.path.join(root, "grc_blocks.yml"), "w") as f:
        f.write(f"# GRC descriptors for {pkg} (grc.py loader format)\n"
                f"blocks: []\n")
    return root


def add(block_name: str, module_dir: str, kind: str = "sync") -> str:
    """Add a block skeleton + QA test to an OOT module (modtool add)."""
    cls = "".join(w.capitalize() for w in block_name.split("_"))
    blocks_py = os.path.join(module_dir, "blocks.py")
    with open(blocks_py, "a") as f:
        if kind == "gateway":
            if "from gnuradio_tpu import gateway" not in open(
                    blocks_py).read():
                f.write("\nfrom gnuradio_tpu import gateway\n")
            f.write(_GATEWAY_TMPL.format(cls=cls, snake=block_name))
        else:
            f.write(_BLOCK_SYNC_TMPL.format(cls=cls, snake=block_name))
    pkg = os.path.basename(os.path.normpath(module_dir))
    qa = os.path.join(module_dir, "tests", f"qa_{block_name}.py")
    with open(qa, "w") as f:
        f.write(_QA_TMPL.format(snake=block_name, pkg=pkg))
    return qa


def info(module_dir: str) -> dict:
    """List the blocks defined in an OOT module (modtool info)."""
    import ast
    blocks_py = os.path.join(module_dir, "blocks.py")
    tree = ast.parse(open(blocks_py).read())
    classes = [n.name for n in ast.walk(tree) if isinstance(n, ast.ClassDef)]
    funcs = [n.name for n in ast.walk(tree)
             if isinstance(n, ast.FunctionDef) and not n.name.startswith("_")
             and n.col_offset == 0]
    return {"module": os.path.basename(os.path.normpath(module_dir)),
            "classes": classes, "factories": funcs}


# ---------------------------------------------------------------------------
# blocktool: introspect a Block class -> JSON description
# ---------------------------------------------------------------------------

def describe_block(target) -> dict:
    """blocktool analog: JSON description of a block class or factory.
    target: class/callable or 'module.path:Name' string."""
    if isinstance(target, str):
        modname, _, attr = target.partition(":")
        target = getattr(importlib.import_module(modname), attr)
    sig = inspect.signature(target)
    params = []
    for p in sig.parameters.values():
        if p.name in ("self", "name"):
            continue
        params.append({
            "name": p.name,
            "default": (None if p.default is inspect.Parameter.empty
                        else repr(p.default)),
        })
    desc = {
        "name": getattr(target, "__name__", str(target)),
        "doc": inspect.getdoc(target) or "",
        "parameters": params,
    }
    cls = target if inspect.isclass(target) else None
    if cls is not None:
        try:
            inst = None  # avoid constructing; report declared ports if any
            in_p = getattr(cls, "in_ports", ())
            out_p = getattr(cls, "out_ports", ())
            desc["in_ports"] = len(in_p) if isinstance(in_p, tuple) else "dynamic"
            desc["out_ports"] = (len(out_p) if isinstance(out_p, tuple)
                                 else "dynamic")
        except Exception:
            pass
    return desc


def makeyaml(target) -> str:
    """Generate a grc.py-style YAML descriptor (modtool makeyaml)."""
    d = describe_block(target)
    lines = [f"id: {d['name'].lower()}",
             f"label: {d['name']}",
             "parameters:"]
    for p in d["parameters"]:
        lines.append(f"  - id: {p['name']}")
        if p["default"] is not None:
            lines.append(f"    default: {p['default']}")
    lines += ["inputs:", "  - domain: stream", "outputs:",
              "  - domain: stream",
              f"documentation: |", ]
    doc = textwrap.indent((d["doc"].splitlines() or [""])[0], "  ")
    lines.append(doc)
    return "\n".join(lines) + "\n"


def main(argv=None):
    ap = argparse.ArgumentParser(prog="gnuradio_tpu.modtool")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("newmod")
    p.add_argument("name")
    p.add_argument("--dir", default=".")
    p = sub.add_parser("add")
    p.add_argument("block_name")
    p.add_argument("--module", required=True)
    p.add_argument("--kind", default="sync", choices=["sync", "gateway"])
    p = sub.add_parser("info")
    p.add_argument("--module", required=True)
    p = sub.add_parser("makeyaml")
    p.add_argument("target")
    args = ap.parse_args(argv)
    if args.cmd == "newmod":
        print(newmod(args.name, args.dir))
    elif args.cmd == "add":
        print(add(args.block_name, args.module, args.kind))
    elif args.cmd == "info":
        print(json.dumps(info(args.module), indent=2))
    elif args.cmd == "makeyaml":
        print(makeyaml(args.target))


if __name__ == "__main__":
    main()

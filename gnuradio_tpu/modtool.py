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


def _block_span(tree, src_lines, block_name: str):
    """(start, end) line span of a block's class + factory + the template
    comment banner above it, for rm/rename/disable surgery."""
    import ast
    cls = "".join(w.capitalize() for w in block_name.split("_"))
    spans = []
    for n in tree.body:
        if (isinstance(n, ast.ClassDef) and n.name == cls) or (
                isinstance(n, ast.FunctionDef) and n.name == block_name):
            start = n.lineno - 1
            # swallow the blank/comment lines directly above
            while start > 0 and (src_lines[start - 1].strip() == ""
                                 or src_lines[start - 1].lstrip()
                                 .startswith("#")):
                start -= 1
            spans.append((start, n.end_lineno))
    return spans


def rm(block_name: str, module_dir: str) -> list:
    """Remove a block (class, factory, QA file) from an OOT module
    (gr-utils/modtool/core/rm.py analog)."""
    import ast
    blocks_py = os.path.join(module_dir, "blocks.py")
    src = open(blocks_py).read()
    lines = src.splitlines()
    spans = _block_span(ast.parse(src), lines, block_name)
    removed = []
    keep = set(range(len(lines)))
    for s, e in spans:
        keep -= set(range(s, e))
        removed.append(f"blocks.py:{s + 1}-{e}")
    with open(blocks_py, "w") as f:
        f.write("\n".join(lines[i] for i in sorted(keep)) + "\n")
    qa = os.path.join(module_dir, "tests", f"qa_{block_name}.py")
    if os.path.exists(qa):
        os.remove(qa)
        removed.append(qa)
    return removed


def rename(old_name: str, new_name: str, module_dir: str) -> list:
    """Rename a block across blocks.py + its QA file (modtool rename)."""
    import re
    old_cls = "".join(w.capitalize() for w in old_name.split("_"))
    new_cls = "".join(w.capitalize() for w in new_name.split("_"))
    changed = []
    blocks_py = os.path.join(module_dir, "blocks.py")
    src = open(blocks_py).read()
    out = re.sub(rf"\b{re.escape(old_cls)}\b", new_cls, src)
    out = re.sub(rf"\b{re.escape(old_name)}\b", new_name, out)
    if out != src:
        open(blocks_py, "w").write(out)
        changed.append(blocks_py)
    qa_old = os.path.join(module_dir, "tests", f"qa_{old_name}.py")
    qa_new = os.path.join(module_dir, "tests", f"qa_{new_name}.py")
    if os.path.exists(qa_old):
        qsrc = open(qa_old).read()
        qsrc = re.sub(rf"\b{re.escape(old_name)}\b", new_name, qsrc)
        qsrc = re.sub(rf"\b{re.escape(old_cls)}\b", new_cls, qsrc)
        open(qa_new, "w").write(qsrc)
        os.remove(qa_old)
        changed.append(qa_new)
    return changed


def disable(block_name: str, module_dir: str) -> list:
    """Comment a block out of blocks.py without deleting it
    (modtool disable)."""
    import ast
    blocks_py = os.path.join(module_dir, "blocks.py")
    src = open(blocks_py).read()
    lines = src.splitlines()
    spans = _block_span(ast.parse(src), lines, block_name)
    touched = []
    for s, e in spans:
        for i in range(s, e):
            if lines[i].strip():
                lines[i] = "# [disabled] " + lines[i]
        touched.append(f"blocks.py:{s + 1}-{e}")
    open(blocks_py, "w").write("\n".join(lines) + "\n")
    return touched


def update(module_dir: str) -> dict:
    """Refresh the module's GRC descriptor file from the current
    blocks.py contents (modtool update analog: regenerate metadata)."""
    import yaml
    meta = info(module_dir)
    entries = []
    for fac in meta["factories"]:
        try:
            entries.append(describe_block_path(module_dir, fac))
        except Exception:
            entries.append({"id": fac})
    path = os.path.join(module_dir, "grc_blocks.yml")
    with open(path, "w") as f:
        yaml.safe_dump({"blocks": entries}, f, sort_keys=False)
    return {"path": path, "blocks": [e.get("id", "?") for e in entries]}


def describe_block_path(module_dir: str, factory: str) -> dict:
    """describe_block for a factory inside an OOT module directory."""
    import importlib.util
    import sys
    pkg = os.path.basename(os.path.normpath(module_dir))
    spec = importlib.util.spec_from_file_location(
        f"{pkg}.blocks", os.path.join(module_dir, "blocks.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    d = describe_block(getattr(mod, factory))
    d.setdefault("id", factory)
    return d


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
    p = sub.add_parser("rm")
    p.add_argument("block_name")
    p.add_argument("--module", required=True)
    p = sub.add_parser("rename")
    p.add_argument("old_name")
    p.add_argument("new_name")
    p.add_argument("--module", required=True)
    p = sub.add_parser("disable")
    p.add_argument("block_name")
    p.add_argument("--module", required=True)
    p = sub.add_parser("update")
    p.add_argument("--module", required=True)
    args = ap.parse_args(argv)
    if args.cmd == "newmod":
        print(newmod(args.name, args.dir))
    elif args.cmd == "add":
        print(add(args.block_name, args.module, args.kind))
    elif args.cmd == "info":
        print(json.dumps(info(args.module), indent=2))
    elif args.cmd == "makeyaml":
        print(makeyaml(args.target))
    elif args.cmd == "rm":
        print(json.dumps(rm(args.block_name, args.module)))
    elif args.cmd == "rename":
        print(json.dumps(rename(args.old_name, args.new_name,
                                args.module)))
    elif args.cmd == "disable":
        print(json.dumps(disable(args.block_name, args.module)))
    elif args.cmd == "update":
        print(json.dumps(update(args.module), indent=2))


if __name__ == "__main__":
    main()

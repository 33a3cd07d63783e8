"""plot_tools / read_file_metadata analogs (gr-utils/plot_tools/,
gr-utils/read_file_metadata/).

Headless-first: every command computes the numbers (PSD, IQ stats,
constellation density, metadata dump) and prints a text report; `-o out.png`
additionally renders with matplotlib when it is available (the reference
tools are matplotlib GUIs — this environment has no display).

CLI:
    python -m gnuradio_tpu.plot_tools meta  capture.iq
    python -m gnuradio_tpu.plot_tools psd   capture.iq --dtype c8 --rate 1e6
    python -m gnuradio_tpu.plot_tools iq    capture.iq --dtype c8 --start 0 --n 4096
    python -m gnuradio_tpu.plot_tools const capture.iq --dtype c8
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

_DTYPES = {
    "c8": np.complex64, "complex64": np.complex64, "fc32": np.complex64,
    "f4": np.float32, "float32": np.float32, "f32": np.float32,
    "i2": np.int16, "short": np.int16, "sc16": np.int16,
    "i4": np.int32, "int": np.int32,
    "u1": np.uint8, "byte": np.uint8, "i1": np.int8,
}


def load(path: str, dtype: str = "c8", start: int = 0, count: int = -1):
    dt = np.dtype(_DTYPES.get(dtype, dtype))
    data = np.fromfile(path, dt, count=count if count > 0 else -1,
                       offset=start * dt.itemsize)
    return data


def psd(x, rate: float = 1.0, nfft: int = 1024):
    """Welch-averaged power spectral density in dBFS. Returns (freqs, db)."""
    x = np.asarray(x)
    n = (len(x) // nfft) * nfft
    if n == 0:
        raise ValueError(f"need at least {nfft} samples")
    seg = x[:n].reshape(-1, nfft)
    win = np.hanning(nfft)
    sp = np.fft.fft(seg * win, axis=1)
    p = np.mean(np.abs(sp) ** 2, axis=0) / (np.sum(win ** 2))
    p = np.fft.fftshift(p)
    f = np.fft.fftshift(np.fft.fftfreq(nfft, 1.0 / rate))
    return f, 10 * np.log10(np.maximum(p, 1e-30))


def iq_stats(x):
    x = np.asarray(x)
    out = {"n": len(x), "rms": float(np.sqrt(np.mean(np.abs(x) ** 2)))}
    out["peak"] = float(np.max(np.abs(x))) if len(x) else 0.0
    if np.iscomplexobj(x):
        out["dc"] = complex(np.mean(x))
        out["iq_imbalance_db"] = float(
            10 * np.log10((np.mean(x.real ** 2) + 1e-30)
                          / (np.mean(x.imag ** 2) + 1e-30)))
    else:
        out["dc"] = float(np.mean(x)) if len(x) else 0.0
    return out


def _ascii_plot(y, width=72, height=14, label=""):
    y = np.asarray(y, np.float64)
    if len(y) > width:
        y = y[: (len(y) // width) * width].reshape(width, -1).mean(axis=1)
    lo, hi = float(np.min(y)), float(np.max(y))
    span = (hi - lo) or 1.0
    rows = []
    for r in range(height, 0, -1):
        thr = lo + span * (r - 0.5) / height
        rows.append("".join("#" if v >= thr else " " for v in y))
    out = [f"{label} [{lo:.1f} .. {hi:.1f}]"]
    out += ["|" + r + "|" for r in rows]
    return "\n".join(out)


def _maybe_png(path, xs, ys, xlabel, ylabel, title):
    if not path:
        return False
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        print("matplotlib unavailable; PNG not written", file=sys.stderr)
        return False
    fig, ax = plt.subplots(figsize=(9, 5))
    ax.plot(xs, ys, lw=0.8)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    fig.savefig(path, dpi=120)
    return True


def main(argv=None):
    p = argparse.ArgumentParser(prog="gr_plot",
                                description="inspect captured sample files")
    p.add_argument("cmd", choices=["meta", "psd", "iq", "const"])
    p.add_argument("path")
    p.add_argument("--dtype", default="c8")
    p.add_argument("--rate", type=float, default=1.0)
    p.add_argument("--nfft", type=int, default=1024)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--n", type=int, default=-1)
    p.add_argument("-o", "--output", default=None, help="write a PNG here")
    a = p.parse_args(argv)

    if a.cmd == "meta":
        from .ops.fileio import read_meta_file
        data, meta = read_meta_file(a.path)
        for k, v in sorted(meta.items()):
            print(f"{k}: {v}")
        print(f"payload_items: {len(data)}")
        return 0

    x = load(a.path, a.dtype, a.start, a.n)
    if a.cmd == "psd":
        f, db = psd(x, a.rate, a.nfft)
        print(_ascii_plot(db, label=f"PSD dB ({a.path})"))
        pk = int(np.argmax(db))
        print(f"peak: {db[pk]:.1f} dB at {f[pk]:.1f} Hz; "
              f"floor(median): {np.median(db):.1f} dB")
        _maybe_png(a.output, f, db, "Hz", "dB", f"PSD {a.path}")
        return 0
    if a.cmd == "iq":
        st = iq_stats(x)
        for k, v in st.items():
            print(f"{k}: {v}")
        seg = np.real(x[:2048])
        print(_ascii_plot(seg, label="I (first 2048)"))
        _maybe_png(a.output, np.arange(len(seg)), seg, "sample", "I",
                   f"IQ {a.path}")
        return 0
    if a.cmd == "const":
        if not np.iscomplexobj(x):
            print("const requires complex data", file=sys.stderr)
            return 2
        st = iq_stats(x)
        print(f"n: {st['n']}  rms: {st['rms']:.4f}  peak: {st['peak']:.4f}")
        # quadrant occupancy — quick constellation sanity
        q = ((x.real >= 0).astype(int) * 2 + (x.imag >= 0)).astype(int)
        occ = np.bincount(q, minlength=4) / max(len(x), 1)
        print("quadrant occupancy (++ +- -+ --):",
              " ".join(f"{v:.3f}" for v in occ[[3, 2, 1, 0]]))
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())

"""plot_tools / read_file_metadata CLI QA (gr-utils analogs)."""
import numpy as np

from gnuradio_tpu import plot_tools as pt


def test_psd_finds_tone(tmp_path):
    fs = 100e3
    n = 1 << 14
    t = np.arange(n) / fs
    x = (np.exp(2j * np.pi * 12_500.0 * t)
         + 0.001 * (np.random.default_rng(0).standard_normal(n))
         ).astype(np.complex64)
    p = tmp_path / "tone.iq"
    x.tofile(p)
    f, db = pt.psd(pt.load(str(p), "c8"), rate=fs, nfft=2048)
    pk = f[np.argmax(db)]
    assert abs(pk - 12_500.0) < fs / 2048 * 2


def test_iq_stats():
    x = (np.ones(1000) * (1 + 1j)).astype(np.complex64)
    st = pt.iq_stats(x)
    assert abs(st["rms"] - np.sqrt(2)) < 1e-6
    assert st["n"] == 1000


def test_cli_meta_and_psd(tmp_path, capsys):
    from gnuradio_tpu.ops.fileio import write_meta_file
    x = np.arange(256, dtype=np.float32)
    p = str(tmp_path / "m.dat")
    write_meta_file(p, x, {"rx_rate": 32000.0})
    assert pt.main(["meta", p]) == 0
    out = capsys.readouterr().out
    assert "rx_rate" in out and "payload_items: 256" in out

    iq = np.exp(2j * np.pi * 0.1 * np.arange(8192)).astype(np.complex64)
    q = str(tmp_path / "q.iq")
    iq.tofile(q)
    assert pt.main(["psd", q, "--dtype", "c8", "--rate", "1000"]) == 0
    out = capsys.readouterr().out
    assert "peak:" in out

    assert pt.main(["const", q, "--dtype", "c8"]) == 0
    assert "quadrant occupancy" in capsys.readouterr().out

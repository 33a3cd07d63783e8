"""Golden-vector assertion helpers — gr_unittest analog
(gnuradio-runtime/python/gnuradio/gr_unittest.py:19-100)."""
import numpy as np


def assert_tuples_almost_equal(a, b, places=5, msg=""):
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape, f"shape {a.shape} != {b.shape} {msg}"
    np.testing.assert_allclose(a, b, atol=10 ** (-places) * 1.5, rtol=0,
                               err_msg=msg)


def assert_complex_tuples_almost_equal(a, b, places=5, msg=""):
    assert_tuples_almost_equal(np.asarray(a, np.complex64),
                               np.asarray(b, np.complex64), places, msg)


def assert_snr(actual, reference, min_snr_db=60.0, msg=""):
    """SNR-bound comparison (SURVEY.md App. C: 'bit-exact-to-SNR')."""
    actual = np.asarray(actual, np.complex128).ravel()
    reference = np.asarray(reference, np.complex128).ravel()
    assert actual.shape == reference.shape, f"{actual.shape} != {reference.shape}"
    err = actual - reference
    p_sig = np.mean(np.abs(reference) ** 2)
    p_err = np.mean(np.abs(err) ** 2)
    if p_err == 0:
        return
    snr = 10 * np.log10(p_sig / p_err)
    assert snr >= min_snr_db, f"SNR {snr:.1f} dB < {min_snr_db} dB {msg}"

"""GSM 06.10 Full-Rate (RPE-LTP) speech codec — native fixed-point
implementation from the spec (ETSI EN 300 961 / GSM 06.10), replacing the
reference's external libgsm dependency
(gr-vocoder/lib/gsm_fr_encode_sp_impl.cc:37-60 wraps gsm_encode;
gsm_fr_decode_ps_impl.cc the inverse).

Bit-exactness target: the reference's own QA golden vector
(gr-vocoder/python/vocoder/qa_gsm_full_rate.py test001: 160 int16 samples
round-trip) — reproduced in tests/test_gsm_fr.py.

All arithmetic follows the spec's 16/32-bit saturated fixed-point
primitives (add, sub, mult, mult_r, L_add, L_mult, norm, div). The codec
is host-side NumPy (the reference's is scalar C via libgsm); frames pack
into the standard 33-byte libgsm layout (0xD magic high nibble).

Frame: 160 samples @ 8 kHz -> 260 bits:
  LARc[8] (6,6,5,5,4,4,3,3 bits) + 4 x (Nc 7, bc 2, Mc 2, xmaxc 6,
  xMc[13] x 3 bits).
"""
from __future__ import annotations

import numpy as np

MIN16, MAX16 = -32768, 32767
MIN32, MAX32 = -(1 << 31), (1 << 31) - 1


def _sat16(x):
    return max(MIN16, min(MAX16, x))


def _sat32(x):
    return max(MIN32, min(MAX32, x))


def add(a, b):
    return _sat16(a + b)


def sub(a, b):
    return _sat16(a - b)


def mult(a, b):
    if a == MIN16 and b == MIN16:
        return MAX16
    return _sat16((a * b) >> 15)


def mult_r(a, b):
    if a == MIN16 and b == MIN16:
        return MAX16
    return _sat16((a * b + 16384) >> 15)


def gsm_abs(a):
    return MAX16 if a == MIN16 else abs(a)


def L_add(a, b):
    return _sat32(a + b)


def L_mult(a, b):
    # a*b<<1; a==b==MIN16 saturates
    return _sat32((a * b) << 1)


def SASR(x, n):
    return x >> n   # python >> is arithmetic on ints


def asl16(a, n):
    if n <= 0:
        return SASR(a, -n)
    return _sat16(a << n)


def gsm_norm(L):
    """Left shifts to normalize a 32-bit value (spec norm())."""
    assert L != 0
    if L < 0:
        if L <= -1073741824:
            return 0
        L = ~L
    n = 0
    while L < 0x40000000:
        L <<= 1
        n += 1
    return n


def gsm_div(num, denom):
    """15-bit fractional division, 0 <= num <= denom (spec div())."""
    if num == 0:
        return 0
    L_num, L_denom, div = num, denom, 0
    for _ in range(15):
        div <<= 1
        L_num <<= 1
        if L_num >= L_denom:
            L_num -= L_denom
            div += 1
    return div


# --- tables (GSM 06.10 sec 5; same constants as libgsm's gsm_*.c) ---
_A = [20480, 20480, 20480, 20480, 13964, 15360, 8534, 9036]
_B = [0, 0, 2048, -2560, 94, -1792, -341, -1144]
_MIC = [-32, -32, -16, -16, -8, -8, -4, -4]
_MAC = [31, 31, 15, 15, 7, 7, 3, 3]
_INVA = [13107, 13107, 13107, 13107, 19223, 17476, 31454, 29708]
_DLB = [6554, 16384, 26214, 32767]
_QLB = [3277, 11469, 21299, 32767]
_H = [-134, -374, 0, 2054, 5741, 8192, 5741, 2054, 0, -374, -134]
_NRFAC = [29128, 26215, 23832, 21846, 20165, 18725, 17476, 16384]
_FAC = [18431, 20479, 22527, 24575, 26623, 28671, 30719, 32767]
_LAR_BITS = [6, 6, 5, 5, 4, 4, 3, 3]


class GsmState:
    def __init__(self):
        # preprocess
        self.z1 = 0
        self.L_z2 = 0
        self.mp = 0
        # short-term analysis/synthesis
        self.u = [0] * 8
        self.LARpp_prev = [0] * 8
        self.v = [0] * 9
        self.LARpp_prev_dec = [0] * 8
        # long-term
        self.dp0 = [0] * 120    # previous reconstructed residual
        self.dp0_dec = [0] * 120
        # decoder postprocess + xmaxc carry
        self.msr = 0
        self.nrp = 40


# ---------------------------------------------------------------------------
# 4.2.1/4.2.2/4.2.3 preprocessing
# ---------------------------------------------------------------------------

def _preprocess(S: GsmState, s):
    out = []
    for smp in s:
        SO = SASR(int(smp), 3) << 2
        s1 = SO - S.z1          # fits in 17 bits, no saturation needed
        S.z1 = SO
        L_s2 = s1 << 15
        msp = SASR(S.L_z2, 15)
        lsp = S.L_z2 - (msp << 15)
        temp = mult_r(lsp, 32735)
        L_s2 = L_add(L_s2, temp)
        # L_z2 = L_mult(msp, 32735) >> 1 + L_s2  (== msp*32735 + L_s2)
        S.L_z2 = L_add(SASR(L_mult(msp, 32735), 1), L_s2)
        s_ofs = _sat16(SASR(L_add(S.L_z2, 16384), 15))
        # preemphasis
        so = add(s_ofs, mult_r(S.mp, -28180))
        S.mp = s_ofs
        out.append(so)
    return out


# ---------------------------------------------------------------------------
# 4.2.4/4.2.5 LPC analysis: autocorrelation + Schur + LAR + quantize
# ---------------------------------------------------------------------------

def _autocorrelation(s):
    smax = 0
    for v in s:
        smax = max(smax, gsm_abs(v))
    if smax == 0:
        scalauto = 0
    else:
        scalauto = 4 - gsm_norm(smax << 16)
    sc = list(s)
    if scalauto > 0:
        m = 16384 >> (scalauto - 1)
        sc = [mult_r(v, m) for v in sc]
    a = np.asarray(sc, np.int64)
    L_ACF = [0] * 9
    for k in range(9):
        acc = int(np.dot(a[k:], a[: 160 - k]))   # exact in int64
        L_ACF[k] = _sat32(acc << 1)
    return L_ACF


def _schur(L_ACF):
    r = [0] * 8
    if L_ACF[0] == 0:
        return r
    temp = gsm_norm(L_ACF[0])
    ACF = [_sat16(SASR(_sat32(L_ACF[k] << temp), 16)) for k in range(9)]
    P = ACF[:9] + [0]
    K = [0] + ACF[1:8] + [0]
    for n in range(1, 9):
        tmp = gsm_abs(P[1])
        if P[0] < tmp:
            rr = MAX16
        else:
            rr = gsm_div(tmp, P[0])
        if P[1] > 0:
            rr = -rr
        r[n - 1] = rr
        if n == 8:
            break
        P[0] = add(P[0], mult_r(P[1], rr))
        for m in range(1, 9 - n):
            P[m] = add(P[m + 1], mult_r(K[m], rr))
            K[m] = add(K[m], mult_r(P[m + 1], rr))
    return r


def _to_lar(r):
    LAR = []
    for rv in r:
        temp = gsm_abs(rv)
        if temp < 22118:
            temp >>= 1
        elif temp < 31130:
            temp = sub(temp, 11059)
        else:
            temp = add(SASR(temp, 2), 26112)
        LAR.append(-temp if rv < 0 else temp)
    return LAR


def _quantize_lar(LAR):
    LARc = []
    for i in range(8):
        temp = mult(_A[i], LAR[i])
        temp = add(temp, _B[i])
        temp = add(temp, 256)
        temp = SASR(temp, 9)
        temp = max(_MIC[i], min(_MAC[i], temp))
        LARc.append(temp - _MIC[i])   # stored non-negative
    return LARc


def _decode_lar(LARc):
    LARpp = []
    for i in range(8):
        temp1 = _sat16((LARc[i] + _MIC[i]) << 10)
        temp2 = _sat16(_B[i] << 1)
        temp1 = sub(temp1, temp2)
        temp1 = mult_r(_INVA[i], temp1)
        LARpp.append(add(temp1, temp1))
    return LARpp


def _interp_lar(prev, cur, zone):
    out = []
    for i in range(8):
        if zone == 0:
            v = add(SASR(prev[i], 2), SASR(cur[i], 2))
            v = add(v, SASR(prev[i], 1))
        elif zone == 1:
            v = add(SASR(prev[i], 1), SASR(cur[i], 1))
        elif zone == 2:
            v = add(SASR(prev[i], 2), SASR(cur[i], 2))
            v = add(v, SASR(cur[i], 1))
        else:
            v = cur[i]
        out.append(v)
    return out


def _lar_to_rp(LARp):
    rp = []
    for v in LARp:
        temp = gsm_abs(v)
        if temp < 11059:
            temp = _sat16(temp << 1)
        elif temp < 20070:
            temp = add(temp, 11059)
        else:
            temp = add(SASR(temp, 2), 26112)
        rp.append(-temp if v < 0 else temp)
    return rp


_ZONES = [(0, 13, 0), (13, 27, 1), (27, 40, 2), (40, 160, 3)]


def _short_term_analysis(S: GsmState, LARc, s):
    LARpp = _decode_lar(LARc)
    d = [0] * 160
    for k0, k1, zone in _ZONES:
        rp = _lar_to_rp(_interp_lar(S.LARpp_prev, LARpp, zone))
        for k in range(k0, k1):
            di = s[k]
            sav = di
            for i in range(8):
                temp = add(S.u[i], mult_r(rp[i], di))
                di = add(di, mult_r(rp[i], S.u[i]))
                S.u[i] = sav
                sav = temp
            d[k] = di
    S.LARpp_prev = LARpp
    return d


def _short_term_synthesis(S: GsmState, LARc, wt):
    LARpp = _decode_lar(LARc)
    out = [0] * 160
    for k0, k1, zone in _ZONES:
        rrp = _lar_to_rp(_interp_lar(S.LARpp_prev_dec, LARpp, zone))
        for k in range(k0, k1):
            sri = wt[k]
            for i in range(7, -1, -1):
                sri = sub(sri, mult_r(rrp[i], S.v[i]))
                S.v[i + 1] = add(S.v[i], mult_r(rrp[i], sri))
            out[k] = sri
            S.v[0] = sri
    S.LARpp_prev_dec = LARpp
    return out


# ---------------------------------------------------------------------------
# 4.2.11 LTP
# ---------------------------------------------------------------------------

def _ltp_params(d, dp):
    """d: 40 new residual samples; dp: 120 past reconstructed (dp[-120..-1]
    as dp[0..119], newest last). Returns (Nc, bc)."""
    dmax = 0
    for v in d:
        dmax = max(dmax, gsm_abs(v))
    temp = 0 if dmax == 0 else gsm_norm(dmax << 16)
    scal = max(0, 6 - temp)
    wt = [SASR(v, scal) for v in d]
    L_max, Nc = 0, 40
    wta = np.asarray(wt, np.int64)
    dpa = np.asarray(dp, np.int64)
    for lam in range(40, 121):
        acc = int(np.dot(wta, dpa[120 - lam: 160 - lam]))  # exact in int64
        L_result = _sat32(acc << 1)
        if L_result > L_max:
            L_max, Nc = L_result, lam
    L_max = SASR(L_max, 1)
    L_max = SASR(L_max, 6 - scal) if scal <= 6 else L_max
    wp = [SASR(dp[120 - Nc + k], 3) for k in range(40)]
    acc = 0
    for k in range(40):
        acc += wp[k] * wp[k]
    L_power = _sat32(acc)          # (<<1 then >>1)
    if L_max <= 0:
        return Nc, 0
    if L_max >= L_power:
        return Nc, 3
    temp = gsm_norm(L_power)
    R = _sat16(SASR(_sat32(L_max << temp), 16))
    S_ = _sat16(SASR(_sat32(L_power << temp), 16))
    for bc in range(3):
        if R <= mult(S_, _DLB[bc]):
            return Nc, bc
    return Nc, 3


# ---------------------------------------------------------------------------
# 4.2.13-4.2.17 RPE
# ---------------------------------------------------------------------------

def _weighting_filter(e):
    x = [0] * 5 + list(e) + [0] * 5
    wt = []
    for k in range(40):
        acc = 4096        # rounding
        for i in range(11):
            acc += _H[i] * x[k + i]
        acc = _sat32(acc)
        wt.append(_sat16(SASR(acc, 13)))
    return wt


def _grid_selection(x):
    EM, Mc = 0, 0
    for m in range(4):
        acc = 0
        for i in range(13):
            v = SASR(x[m + 3 * i], 2)
            acc += v * v
        acc = _sat32(acc << 1)
        if acc > EM:
            EM, Mc = acc, m
    xM = [x[Mc + 3 * i] for i in range(13)]
    return Mc, xM


def _apcm_quantize(xM):
    xmax = 0
    for v in xM:
        xmax = max(xmax, gsm_abs(v))
    exp = 0
    temp = SASR(xmax, 9)
    itest = 0
    for i in range(6):
        if temp <= 0:
            itest = 1
        if itest == 0:
            exp += 1
        temp = SASR(temp, 1)
    temp = exp + 5
    xmaxc = add(SASR(xmax, temp) if temp > 0 else xmax << -temp, exp << 3)
    # quantizing the 13 samples
    exp_, mant = _xmaxc_to_exp_mant(xmaxc)
    temp1 = 6 - exp_
    temp2 = _NRFAC[mant]
    xMc = []
    for v in xM:
        t = _sat16(v << temp1) if temp1 > 0 else SASR(v, -temp1)
        t = mult(t, temp2)
        t = SASR(t, 12)
        xMc.append(t + 4)      # 0..7
    return xmaxc, xMc


def _xmaxc_to_exp_mant(xmaxc):
    exp = 0
    if xmaxc > 15:
        exp = SASR(xmaxc, 3) - 1
    mant = xmaxc - (exp << 3)
    if mant == 0:
        exp, mant = -4, 7
    else:
        while mant <= 7:
            mant = (mant << 1) | 1
            exp -= 1
        mant -= 8
    return exp, mant


def _apcm_inverse(xMc, xmaxc):
    exp, mant = _xmaxc_to_exp_mant(xmaxc)
    temp1 = _FAC[mant]
    temp2 = sub(6, exp)
    temp3 = _sat16(1 << sub(temp2, 1))
    xMp = []
    for c in xMc:
        temp = _sat16((c << 1) - 7)
        temp = _sat16(temp << 12)
        temp = mult_r(temp1, temp)
        temp = add(temp, temp3)
        xMp.append(SASR(temp, temp2))
    return xMp


def _rpe_grid_position(Mc, xMp):
    ep = [0] * 40
    for i in range(13):
        ep[Mc + 3 * i] = xMp[i]
    return ep


# ---------------------------------------------------------------------------
# frame codec
# ---------------------------------------------------------------------------

def encode_frame(S: GsmState, samples):
    """160 int16 samples -> parameter dict (and updates state)."""
    so = _preprocess(S, samples)
    L_ACF = _autocorrelation(so)
    r = _schur(L_ACF)
    LARc = _quantize_lar(_to_lar(r))
    d = _short_term_analysis(S, LARc, so)
    subs = []
    for j in range(4):
        dsub = d[40 * j: 40 * j + 40]
        Nc, bc = _ltp_params(dsub, S.dp0)
        brp = _QLB[bc]
        e = []
        drpp = []
        for k in range(40):
            dpv = mult_r(brp, S.dp0[120 - Nc + k])
            drpp.append(dpv)
            e.append(sub(dsub[k], dpv))
        wt = _weighting_filter(e)
        Mc, xM = _grid_selection(wt)
        xmaxc, xMc = _apcm_quantize(xM)
        xMp = _apcm_inverse(xMc, xmaxc)
        ep = _rpe_grid_position(Mc, xMp)
        # reconstructed residual -> LTP history
        new_dp = [add(ep[k], drpp[k]) for k in range(40)]
        S.dp0 = S.dp0[40:] + new_dp
        subs.append({"Nc": Nc, "bc": bc, "Mc": Mc, "xmaxc": xmaxc,
                     "xMc": xMc})
    return {"LARc": LARc, "sub": subs}


def decode_frame(S: GsmState, frame):
    """Parameter dict -> 160 int16 samples (updates state)."""
    erp_all = [0] * 160
    for j, sp in enumerate(frame["sub"]):
        Nc, bc = sp["Nc"], sp["bc"]
        Ncr = Nc if 40 <= Nc <= 120 else S.nrp
        S.nrp = Ncr
        brp = _QLB[bc]
        xMp = _apcm_inverse(sp["xMc"], sp["xmaxc"])
        ep = _rpe_grid_position(sp["Mc"], xMp)
        new_dp = []
        for k in range(40):
            drpp = mult_r(brp, S.dp0_dec[120 - Ncr + k])
            v = add(ep[k], drpp)
            new_dp.append(v)
        S.dp0_dec = S.dp0_dec[40:] + new_dp
        erp_all[40 * j: 40 * j + 40] = new_dp
    wt = erp_all
    sr = _short_term_synthesis(S, frame["LARc"], wt)
    out = []
    for v in sr:
        tmp = mult_r(S.msr, 28180)
        S.msr = add(v, tmp)
        out.append(_sat16(add(S.msr, S.msr)) & ~7)
    return out


# ---------------------------------------------------------------------------
# 33-byte libgsm frame packing (magic 0xD high nibble, MSB-first fields)
# ---------------------------------------------------------------------------

def _frame_bits(frame):
    bits = []

    def put(v, n):
        for i in range(n - 1, -1, -1):
            bits.append((v >> i) & 1)

    for i in range(8):
        put(frame["LARc"][i], _LAR_BITS[i])
    for sp in frame["sub"]:
        put(sp["Nc"], 7)
        put(sp["bc"], 2)
        put(sp["Mc"], 2)
        put(sp["xmaxc"], 6)
        for c in sp["xMc"]:
            put(c, 3)
    return bits


def pack_frame(frame) -> bytes:
    bits = [1, 1, 0, 1] + _frame_bits(frame)   # 0xD magic + 260 bits
    out = bytearray(33)
    for i, b in enumerate(bits):
        out[i // 8] |= b << (7 - (i % 8))
    return bytes(out)


def unpack_frame(data: bytes):
    bits = []
    for by in data[:33]:
        for i in range(7, -1, -1):
            bits.append((by >> i) & 1)
    assert bits[0:4] == [1, 1, 0, 1], "bad GSM magic"
    pos = [4]

    def get(n):
        v = 0
        for _ in range(n):
            v = (v << 1) | bits[pos[0]]
            pos[0] += 1
        return v

    LARc = [get(_LAR_BITS[i]) for i in range(8)]
    subs = []
    for _ in range(4):
        subs.append({"Nc": get(7), "bc": get(2), "Mc": get(2),
                     "xmaxc": get(6), "xMc": [get(3) for _ in range(13)]})
    return {"LARc": LARc, "sub": subs}


class GsmFrEncoder:
    """gsm_fr_encode_sp analog: int16 @8kHz -> 33-byte frames."""

    def __init__(self):
        self.state = GsmState()

    def encode(self, pcm: np.ndarray) -> bytes:
        pcm = np.asarray(pcm, np.int64)
        assert len(pcm) % 160 == 0
        out = b""
        for j in range(len(pcm) // 160):
            f = encode_frame(self.state, pcm[160 * j: 160 * j + 160])
            out += pack_frame(f)
        return out


class GsmFrDecoder:
    """gsm_fr_decode_ps analog: 33-byte frames -> int16 @8kHz."""

    def __init__(self):
        self.state = GsmState()

    def decode(self, data: bytes) -> np.ndarray:
        assert len(data) % 33 == 0
        out = []
        for j in range(len(data) // 33):
            f = unpack_frame(data[33 * j: 33 * j + 33])
            out.extend(decode_frame(self.state, f))
        return np.asarray(out, np.int16)

"""Minimal baseline-profile H.264 I-frame (IDR) ENCODER plus a mirror
decoder, from the PUBLIC ITU-T Rec. H.264 specification — the fixture
generator for the graft native avc1 decode path (the gen_vp8_video.py
role; this environment has no H.264 encoder to drive, so the encoder is
implemented from the spec and the produced streams are anchored two
independent ways: (1) the in-Python mirror decoder round-trips every
stream bit-exactly, (2) decoded frames must pHash-match the SAME pattern
content decoded through the unrelated JPEG/PNG image path in the gate).

Scope (matching the Scala decoder in functions/H264.scala):
  - Annex-B NAL units, emulation prevention, exp-Golomb
  - SPS/PPS (baseline: CAVLC, frame_mbs_only, 4:2:0)
  - IDR I-slices: I_PCM, I_16x16 (all 4 pred modes), I_4x4 (all 9 modes)
  - CAVLC residuals (coeff_token / levels / total_zeros / run_before)
  - exact integer inverse transforms + dequant per spec 8.5
  - in-loop deblocking per spec 8.7 (I-frame bS: 4 on MB edges, 3 inside)
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from h264_tables import (COEFF_TOKEN, COEFF_TOKEN_CHROMA_DC, TOTAL_ZEROS,
                         TOTAL_ZEROS_CHROMA_DC, RUN_BEFORE, validate)

validate()

ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# Table 9-4, intra column: codeNum -> coded_block_pattern (must be a
# permutation of 0..47 — asserted below).
CBP_INTRA = [47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
             16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
             8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41]
assert sorted(CBP_INTRA) == list(range(48)), "CBP intra mapping not a permutation"
CBP_INTRA_INV = {v: i for i, v in enumerate(CBP_INTRA)}

# dequant v (spec 8-252 LevelScale base) and the matching encoder MF
QUANT_V = [(10, 16, 13), (11, 18, 14), (13, 20, 16),
           (14, 23, 18), (16, 25, 20), (18, 29, 23)]
QUANT_MF = [(13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
            (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559)]

# Table 8-15: QPc from qPi (qPi < 30 -> identity)
QPC_MAP = [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37,
           38, 38, 38, 39, 39, 39, 39]

# deblocking alpha/beta (Table 8-16) and tc0 (Table 8-17, rows bS 1..3)
DB_ALPHA = [0]*16 + [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25,
                     28, 32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113,
                     127, 144, 162, 182, 203, 226, 255, 255]
DB_BETA = [0]*16 + [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9,
                    10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16,
                    16, 17, 17, 18, 18]
DB_TC0 = [
    [0]*16 + [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2,
              2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13],
    [0]*16 + [0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2,
              3, 3, 3, 4, 4, 5, 6, 6, 7, 8, 8, 10, 11, 12, 13, 17],
    [0]*16 + [0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 4,
              4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 23],
]
assert len(DB_ALPHA) == 52 and len(DB_BETA) == 52
assert all(len(r) == 52 for r in DB_TC0)
assert all(all(r[i] <= r[i+1] for i in range(51)) for r in [DB_ALPHA, DB_BETA] + DB_TC0)


def clip3(lo, hi, v):
    return lo if v < lo else hi if v > hi else v


def clip255(v):
    return 0 if v < 0 else 255 if v > 255 else v


# ------------------------------------------------------------- bit io

class BitWriter:
    def __init__(self):
        self.bits = []

    def u(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def put(self, bitstr):
        self.bits.extend(1 if c == '1' else 0 for c in bitstr)

    def ue(self, v):
        v += 1
        n = v.bit_length()
        self.u(0, n - 1)
        self.u(v, n)

    def se(self, v):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp_trailing(self):
        self.bits.append(1)
        while len(self.bits) % 8:
            self.bits.append(0)

    def align_zero(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes_raw(self):
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)

    def put_bytes(self, bs):
        assert len(self.bits) % 8 == 0
        for b in bs:
            self.u(b, 8)


def emu_prevent(rbsp):
    """Insert emulation_prevention_three_byte per spec 7.4.1."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def nal(nal_type, rbsp, ref_idc=3):
    return b'\x00\x00\x00\x01' + bytes([(ref_idc << 5) | nal_type]) + emu_prevent(rbsp)


class BitReader:
    def __init__(self, data):
        self.data = data
        self.pos = 0

    def bit(self):
        byte = self.data[self.pos >> 3]
        b = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def u(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def ue(self):
        zeros = 0
        while self.bit() == 0:
            zeros += 1
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self):
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def align(self):
        while self.pos % 8:
            self.pos += 1


# ------------------------------------------------------ CAVLC encode

def _t1s_of(coeffs):
    """Trailing ones: among the nonzero coeffs in scan order, how many
    at the END are +-1 (max 3)."""
    nz = [c for c in coeffs if c != 0]
    t = 0
    for c in reversed(nz):
        if abs(c) == 1 and t < 3:
            t += 1
        else:
            break
    return nz, t


def _coeff_token_code(nC, total, t1s):
    if nC >= 8:
        if total == 0:
            return '000011'
        return format(4 * (total - 1) + t1s, '06b')
    if nC == -1:
        return COEFF_TOKEN_CHROMA_DC[(total, t1s)]
    cls = 0 if nC < 2 else 1 if nC < 4 else 2
    return COEFF_TOKEN[cls][(total, t1s)]


def _write_level(w, level, suffix_len):
    """Encode one non-T1 level at the current suffixLength — the exact
    inverse of the spec 9.2.2.1 decode: levelCode = (min(15, prefix) <<
    suffixLength) + suffix, +15 when prefix >= 15 at suffixLength 0,
    +(1 << (prefix-3)) - 4096 when prefix >= 16."""
    code = 2 * level - 2 if level > 0 else -2 * level - 1
    if suffix_len == 0 and code < 14:
        prefix, size, suffix = code, 0, 0
    elif suffix_len == 0 and code < 30:
        prefix, size, suffix = 14, 4, code - 14
    elif suffix_len > 0 and (code >> suffix_len) < 15:
        prefix = code >> suffix_len
        size, suffix = suffix_len, code & ((1 << suffix_len) - 1)
    else:
        c = code - ((15 << suffix_len) + (15 if suffix_len == 0 else 0))
        if c < 4096:
            prefix, size, suffix = 15, 12, c
        else:
            prefix = 16
            while not (0 <= c - ((1 << (prefix - 3)) - 4096) < (1 << (prefix - 3))):
                prefix += 1
            size = prefix - 3
            suffix = c - ((1 << (prefix - 3)) - 4096)
    w.u(0, prefix); w.u(1, 1)
    if size:
        w.u(suffix, size)


def encode_block(w, coeffs, nC, max_coeffs=16):
    """CAVLC-encode one zigzag-ordered coefficient block; returns
    totalCoeff (the caller tracks nC context)."""
    nz, t1s = _t1s_of(coeffs)
    total = len(nz)
    assert total <= max_coeffs
    w.put(_coeff_token_code(nC, total, t1s))
    if total == 0:
        return 0
    # trailing-one signs, highest frequency first
    for c in reversed(nz[len(nz) - t1s:]):
        w.u(1 if c < 0 else 0, 1)
    # remaining levels, reverse scan order
    suffix_len = 1 if total > 10 and t1s < 3 else 0
    first = True
    for idx in range(total - t1s - 1, -1, -1):
        level = nz[idx]
        if first and t1s < 3:
            # spec: levelCode -= 2 symmetry — encode level shifted
            # toward zero by one magnitude step
            level = level - 1 if level > 0 else level + 1
            assert level != 0
        _write_level(w, level, suffix_len)
        if suffix_len == 0:
            suffix_len = 1
        actual = abs(nz[idx])
        if actual > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
        first = False
    # total_zeros
    positions = [i for i, c in enumerate(coeffs) if c != 0]
    total_zeros = positions[-1] + 1 - total
    if total < max_coeffs:
        if nC == -1:
            w.put(TOTAL_ZEROS_CHROMA_DC[total - 1][total_zeros])
        else:
            w.put(TOTAL_ZEROS[total - 1][total_zeros])
    # run_before, highest frequency first
    zeros_left = total_zeros
    for k in range(len(positions) - 1, 0, -1):
        if zeros_left == 0:
            break
        run = positions[k] - positions[k - 1] - 1
        if zeros_left <= 6:
            w.put(RUN_BEFORE[zeros_left - 1][run])
        else:
            if run < 7:
                w.u(7 - run, 3)
            else:
                w.u(0, 3)
                w.u(0, run - 7)
                w.u(1, 1)
        zeros_left -= run
    return total


def decode_block(r, nC, max_coeffs=16):
    """Mirror CAVLC decode; returns the zigzag-ordered coefficients."""
    # coeff_token
    if nC >= 8:
        v = r.u(6)
        if v == 3:
            total, t1s = 0, 0
        else:
            total, t1s = v // 4 + 1, v % 4
    else:
        table = (COEFF_TOKEN_CHROMA_DC if nC == -1 else
                 COEFF_TOKEN[0 if nC < 2 else 1 if nC < 4 else 2])
        rev = {code: nt for nt, code in table.items()}
        s = ''
        while s not in rev:
            s += str(r.bit())
            assert len(s) <= 16, "coeff_token overrun"
        total, t1s = rev[s]
    if total == 0:
        return [0] * max_coeffs
    levels = [0] * total
    for i in range(t1s):
        levels[total - 1 - i] = -1 if r.bit() else 1
    suffix_len = 1 if total > 10 and t1s < 3 else 0
    for i in range(total - t1s):
        pos = total - t1s - 1 - i
        prefix = 0
        while r.bit() == 0:
            prefix += 1
        if suffix_len == 0:
            if prefix < 14:
                code = prefix
            elif prefix == 14:
                code = 14 + r.u(4)
            else:
                size = prefix - 3
                code = (15 << 0) + r.u(size) + 15
                if prefix >= 16:
                    code += (1 << (prefix - 3)) - 4096
        else:
            if prefix < 15:
                code = (prefix << suffix_len) + r.u(suffix_len)
            else:
                size = prefix - 3 if prefix >= 16 else 12
                code = (15 << suffix_len) + r.u(size)
                if prefix >= 16:
                    code += (1 << (prefix - 3)) - 4096
        if i == 0 and t1s < 3:
            code += 2
        level = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        levels[pos] = level
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    if total < max_coeffs:
        row = (TOTAL_ZEROS_CHROMA_DC[total - 1] if nC == -1
               else TOTAL_ZEROS[total - 1])
        rev = {code: tz for tz, code in enumerate(row)}
        s = ''
        while s not in rev:
            s += str(r.bit())
            assert len(s) <= 10, "total_zeros overrun"
        total_zeros = rev[s]
    else:
        total_zeros = 0
    # run_before
    runs = [0] * total
    zeros_left = total_zeros
    for k in range(total - 1, 0, -1):
        if zeros_left == 0:
            break
        if zeros_left <= 6:
            rev = {code: run for run, code in enumerate(RUN_BEFORE[zeros_left - 1])}
            s = ''
            while s not in rev:
                s += str(r.bit())
                assert len(s) <= 3
            run = rev[s]
        else:
            v = r.u(3)
            if v:
                run = 7 - v
            else:
                run = 7
                while r.bit() == 0:
                    run += 1
        runs[k] = run
        zeros_left -= run
    runs[0] = zeros_left
    coeffs = [0] * max_coeffs
    pos = -1
    for k in range(total):
        pos += runs[k] + 1
        coeffs[pos] = levels[k]
    return coeffs


def _fuzz_cavlc(n=4000, seed=1234):
    """Round-trip random coefficient blocks through encode+decode for
    every nC class — the layer-level self check."""
    import random
    rnd = random.Random(seed)
    for it in range(n):
        max_c = rnd.choice([16, 15, 4])
        nC = rnd.choice([-1, 0, 1, 2, 3, 4, 7, 8, 16] if max_c == 4 else
                        [0, 1, 2, 3, 4, 7, 8, 16])
        if max_c == 4:
            nC = -1 if rnd.random() < 0.7 else nC
        n_nz = rnd.randint(0, max_c if nC != -1 else 4)
        coeffs = [0] * max_c
        pos = rnd.sample(range(max_c), n_nz)
        for p in pos:
            mag = rnd.choice([1, 1, 1, 2, 3, 5, 17, 300, 3000])
            coeffs[p] = mag * rnd.choice([1, -1])
        w = BitWriter()
        encode_block(w, coeffs, nC, max_c)
        w.rbsp_trailing()
        r = BitReader(w.bytes_raw())
        got = decode_block(r, nC, max_c)
        assert got == coeffs, f"cavlc mismatch it={it} nC={nC} {coeffs} -> {got}"


# ------------------------------------------------- transforms & quant

def forward4x4(b):
    """Core forward transform Cf * B * Cf^T (encoder side)."""
    t = [[0] * 4 for _ in range(4)]
    for i in range(4):
        a0, a1, a2, a3 = b[i]
        s0, s1 = a0 + a3, a1 + a2
        d0, d1 = a0 - a3, a1 - a2
        t[i] = [s0 + s1, 2 * d0 + d1, s0 - s1, d0 - 2 * d1]
    o = [[0] * 4 for _ in range(4)]
    for j in range(4):
        a0, a1, a2, a3 = t[0][j], t[1][j], t[2][j], t[3][j]
        s0, s1 = a0 + a3, a1 + a2
        d0, d1 = a0 - a3, a1 - a2
        o[0][j], o[1][j], o[2][j], o[3][j] = \
            s0 + s1, 2 * d0 + d1, s0 - s1, d0 - 2 * d1
    return o


def inverse4x4(d):
    """Spec 8.5.12.2 inverse core transform; caller adds (r+32)>>6."""
    t = [[0] * 4 for _ in range(4)]
    for i in range(4):
        a0, a1, a2, a3 = d[i]
        e0, e1 = a0 + a2, a0 - a2
        e2, e3 = (a1 >> 1) - a3, a1 + (a3 >> 1)
        t[i] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    o = [[0] * 4 for _ in range(4)]
    for j in range(4):
        a0, a1, a2, a3 = t[0][j], t[1][j], t[2][j], t[3][j]
        e0, e1 = a0 + a2, a0 - a2
        e2, e3 = (a1 >> 1) - a3, a1 + (a3 >> 1)
        o[0][j], o[1][j], o[2][j], o[3][j] = \
            e0 + e3, e1 + e2, e1 - e2, e0 - e3
    return o


def hadamard4(b, scale_down):
    """4x4 Hadamard (its own inverse up to scale); encoder uses
    scale_down=True for the //2 of the forward luma-DC transform."""
    t = [[0] * 4 for _ in range(4)]
    for i in range(4):
        a0, a1, a2, a3 = b[i]
        s0, s1 = a0 + a3, a1 + a2
        d0, d1 = a0 - a3, a1 - a2
        t[i] = [s0 + s1, d0 + d1, s0 - s1, d0 - d1]
    o = [[0] * 4 for _ in range(4)]
    for j in range(4):
        a0, a1, a2, a3 = t[0][j], t[1][j], t[2][j], t[3][j]
        s0, s1 = a0 + a3, a1 + a2
        d0, d1 = a0 - a3, a1 - a2
        v = [s0 + s1, d0 + d1, s0 - s1, d0 - d1]
        for i in range(4):
            o[i][j] = v[i] >> 1 if scale_down else v[i]
    return o


def hadamard2(b):
    a, bb = b[0]
    c, d = b[1]
    return [[a + bb + c + d, a - bb + c - d],
            [a + bb - c - d, a - bb - c + d]]


def _vpos(i, j):
    if (i % 2, j % 2) == (0, 0):
        return 0
    if (i % 2, j % 2) == (1, 1):
        return 1
    return 2


def dequant_ac(z, qp, i, j):
    """Spec 8.5.12.1: d = (c * LevelScale(qp%6, i, j)) << (qp/6)."""
    return (z * QUANT_V[qp % 6][_vpos(i, j)]) << (qp // 6)


def quant_ac(w, qp, i, j):
    mf = QUANT_MF[qp % 6][_vpos(i, j)]
    f = (1 << (15 + qp // 6)) // 3  # intra rounding
    s = 1 if w >= 0 else -1
    return s * ((abs(w) * mf + f) >> (15 + qp // 6))


def dequant_luma_dc(f, qp):
    """Spec 8-258/8-259 after the inverse Hadamard. LevelScale carries
    the flat weightScale 16: LS = 16 * v."""
    ls = 16 * QUANT_V[qp % 6][0]
    if qp >= 36:
        return (f * ls) << (qp // 6 - 6)
    return (f * ls + (1 << (5 - qp // 6))) >> (6 - qp // 6)


def quant_luma_dc(y, qp):
    mf = QUANT_MF[qp % 6][0]
    f = 2 * ((1 << (15 + qp // 6)) // 3)
    s = 1 if y >= 0 else -1
    return s * ((abs(y) * mf + f) >> (16 + qp // 6))


def dequant_chroma_dc(f, qp):
    """4:2:0 chroma DC after the 2x2 transform: ((f*LS) << (qp/6)) >> 5
    with LS = 16 * v (flat weightScale)."""
    return ((f * 16 * QUANT_V[qp % 6][0]) << (qp // 6)) >> 5


def quant_chroma_dc(y, qp):
    mf = QUANT_MF[qp % 6][0]
    f = 2 * ((1 << (15 + qp // 6)) // 3)
    s = 1 if y >= 0 else -1
    return s * ((abs(y) * mf + f) >> (16 + qp // 6))


def qpc_of(qpy, offset=0):
    qpi = clip3(0, 51, qpy + offset)
    return qpi if qpi < 30 else QPC_MAP[qpi - 30]


# ---------------------------------------------------- intra prediction

# in-MB 4x4 block Z order: (bx, by) in 4x4 units -> luma4x4BlkIdx
ZIDX = {}
for _idx in range(16):
    ZIDX[(((_idx >> 2) & 1) * 2 + (_idx & 1),
          (_idx >> 3) * 2 + ((_idx >> 1) & 1))] = _idx


def above_right_avail(x, y, W):
    """Is the above-right 4x4 neighbor of the block at plane (x,y)
    decoded yet, under raster-MB + in-MB Z decode order?"""
    if y == 0 or x + 4 >= W:
        return False
    if (y - 1) // 16 < y // 16:
        return True  # the MB row above is fully decoded
    if (x + 4) // 16 > x // 16:
        return False  # the MB to our right is not decoded yet
    return ZIDX[(((x + 4) % 16) // 4, ((y - 1) % 16) // 4)] < \
        ZIDX[((x % 16) // 4, (y % 16) // 4)]


def pred4x4(plane, W, H, x, y, mode, up, left, ar):
    """Spec 8.3.1.2 modes 0-8 at plane position (x,y) from RECONSTRUCTED
    neighbors; availability (incl. slice boundaries) decided by caller;
    unavailable above-right substitutes p[3,-1]."""
    a = [0] * 8  # pa(i) = p[i, -1], i 0..7
    if up:
        for i in range(4):
            a[i] = plane[y - 1][x + i]
        for i in range(4, 8):
            a[i] = plane[y - 1][x + i] if ar else a[3]
    l = [plane[y + j][x - 1] for j in range(4)] if left else [0] * 4
    q = plane[y - 1][x - 1] if (up and left) else 0
    def pa(i):  # p[i, -1] with i == -1 meaning the corner
        return q if i < 0 else a[i]
    def pl(j):  # p[-1, j] with j == -1 meaning the corner
        return q if j < 0 else l[j]
    o = [[0] * 4 for _ in range(4)]
    for y4 in range(4):
        for x4 in range(4):
            if mode == 0:  # Vertical
                assert up
                v = a[x4]
            elif mode == 1:  # Horizontal
                assert left
                v = l[y4]
            elif mode == 2:  # DC
                if up and left:
                    v = (sum(a[:4]) + sum(l) + 4) >> 3
                elif up:
                    v = (sum(a[:4]) + 2) >> 2
                elif left:
                    v = (sum(l) + 2) >> 2
                else:
                    v = 128
            elif mode == 3:  # Diagonal-Down-Left
                assert up
                if x4 == 3 and y4 == 3:
                    v = (a[6] + 3 * a[7] + 2) >> 2
                else:
                    k = x4 + y4
                    v = (a[k] + 2 * a[k + 1] + a[k + 2] + 2) >> 2
            elif mode == 4:  # Diagonal-Down-Right
                assert up and left
                if x4 > y4:
                    k = x4 - y4
                    v = (pa(k - 2) + 2 * pa(k - 1) + pa(k) + 2) >> 2
                elif x4 < y4:
                    k = y4 - x4
                    v = (pl(k - 2) + 2 * pl(k - 1) + pl(k) + 2) >> 2
                else:
                    v = (pa(0) + 2 * q + pl(0) + 2) >> 2
            elif mode == 5:  # Vertical-Right
                assert up and left
                z = 2 * x4 - y4
                k = x4 - (y4 >> 1)
                if z >= 0 and z % 2 == 0:
                    v = (pa(k - 1) + pa(k) + 1) >> 1
                elif z >= 0:
                    v = (pa(k - 2) + 2 * pa(k - 1) + pa(k) + 2) >> 2
                elif z == -1:
                    v = (pl(0) + 2 * q + pa(0) + 2) >> 2
                else:
                    v = (pl(y4 - 1) + 2 * pl(y4 - 2) + pl(y4 - 3) + 2) >> 2
            elif mode == 6:  # Horizontal-Down
                assert up and left
                z = 2 * y4 - x4
                k = y4 - (x4 >> 1)
                if z >= 0 and z % 2 == 0:
                    v = (pl(k - 1) + pl(k) + 1) >> 1
                elif z >= 0:
                    v = (pl(k - 2) + 2 * pl(k - 1) + pl(k) + 2) >> 2
                elif z == -1:
                    v = (pa(0) + 2 * q + pl(0) + 2) >> 2
                else:
                    v = (pa(x4 - 1) + 2 * pa(x4 - 2) + pa(x4 - 3) + 2) >> 2
            elif mode == 7:  # Vertical-Left
                assert up
                k = x4 + (y4 >> 1)
                if y4 % 2 == 0:
                    v = (a[k] + a[k + 1] + 1) >> 1
                else:
                    v = (a[k] + 2 * a[k + 1] + a[k + 2] + 2) >> 2
            elif mode == 8:  # Horizontal-Up
                assert left
                z = x4 + 2 * y4
                k = y4 + (x4 >> 1)
                if z < 5 and z % 2 == 0:
                    v = (l[k] + l[k + 1] + 1) >> 1
                elif z < 5:
                    v = (l[k] + 2 * l[k + 1] + l[k + 2] + 2) >> 2
                elif z == 5:
                    v = (l[2] + 3 * l[3] + 2) >> 2
                else:
                    v = l[3]
            else:
                raise ValueError(mode)
            o[y4][x4] = v
    return o


def pred_block_nxn(plane, x, y, n, mode, chroma, up, left):
    """16x16 luma (modes: 0 V, 1 H, 2 DC, 3 Plane) or 8x8 chroma
    (modes: 0 DC, 1 H, 2 V, 3 Plane) prediction at (x,y); availability
    (incl. slice boundaries) decided by caller."""
    a = [plane[y - 1][x + i] for i in range(n)] if up else None
    l = [plane[y + j][x - 1] for j in range(n)] if left else None
    q = plane[y - 1][x - 1] if (up and left) else 0
    o = [[0] * n for _ in range(n)]
    if chroma:
        vmode, hmode, dcmode, pmode = 2, 1, 0, 3
    else:
        vmode, hmode, dcmode, pmode = 0, 1, 2, 3
    if mode == dcmode:
        if chroma:
            # chroma DC is per 4x4 sub-block (spec 8.3.4.1)
            for by in (0, 4):
                for bx in (0, 4):
                    au = a[bx:bx + 4] if up else None
                    lu = l[by:by + 4] if left else None
                    # corner blocks use both; edge-adjacent use the edge
                    if bx == by:
                        if au is not None and lu is not None:
                            dc = (sum(au) + sum(lu) + 4) >> 3
                        elif au is not None:
                            dc = (sum(au) + 2) >> 2
                        elif lu is not None:
                            dc = (sum(lu) + 2) >> 2
                        else:
                            dc = 128
                    elif bx > by:  # top-right block prefers above
                        if au is not None:
                            dc = (sum(au) + 2) >> 2
                        elif lu is not None:
                            dc = (sum(lu) + 2) >> 2
                        else:
                            dc = 128
                    else:  # bottom-left block prefers left
                        if lu is not None:
                            dc = (sum(lu) + 2) >> 2
                        elif au is not None:
                            dc = (sum(au) + 2) >> 2
                        else:
                            dc = 128
                    for j in range(4):
                        for i in range(4):
                            o[by + j][bx + i] = dc
        else:
            if up and left:
                dc = (sum(a) + sum(l) + 16) >> 5
            elif up:
                dc = (sum(a) + 8) >> 4
            elif left:
                dc = (sum(l) + 8) >> 4
            else:
                dc = 128
            for j in range(n):
                for i in range(n):
                    o[j][i] = dc
    elif mode == vmode:
        assert up
        for j in range(n):
            for i in range(n):
                o[j][i] = a[i]
    elif mode == hmode:
        assert left
        for j in range(n):
            for i in range(n):
                o[j][i] = l[j]
    elif mode == pmode:
        assert up and left
        half = n // 2
        H = sum((i + 1) * (a[half + i] - (a[half - 2 - i] if half - 2 - i >= 0 else q))
                for i in range(half))
        V = sum((j + 1) * (l[half + j] - (l[half - 2 - j] if half - 2 - j >= 0 else q))
                for j in range(half))
        if n == 16:
            b = (5 * H + 32) >> 6
            c = (5 * V + 32) >> 6
        else:
            b = (17 * H + 16) >> 5
            c = (17 * V + 16) >> 5
        aa = 16 * (a[n - 1] + l[n - 1])
        for j in range(n):
            for i in range(n):
                o[j][i] = clip255((aa + b * (i - half + 1) + c * (j - half + 1) + 16) >> 5)
    else:
        raise ValueError(mode)
    return o


# ------------------------------------------------------------ deblock

def deblock(yp, up, vp, W, H, mbqp, mb_params=None, mb_slice=None):
    """In-loop deblocking, spec 8.7, I-slice shape: bS = 4 on MB-boundary
    edges, 3 on internal edges; in-place, MB raster order, vertical edges
    then horizontal. mbqp[mby][mbx] = the MB's QPy (0 for I_PCM).
    mb_params[mby][mbx] = the MB's SLICE deblock parameters
    (disable_idc, filterOffsetA, filterOffsetB): idc 1 skips the MB's
    edges entirely, idc 2 skips MB-boundary edges whose neighbor lies in
    a DIFFERENT slice (mb_slice map), offsets shift indexA/indexB."""
    mbs_x, mbs_y = W // 16, H // 16
    if mb_params is None:
        mb_params = [[(0, 0, 0)] * mbs_x for _ in range(mbs_y)]
    if mb_slice is None:
        mb_slice = [[0] * mbs_x for _ in range(mbs_y)]

    def filt_line(pl, pos, stride, bs, index_a, alpha, beta, chroma):
        p = [pl[pos - stride * (k + 1)] for k in range(4)]
        q = [pl[pos + stride * k] for k in range(4)]
        if abs(p[0] - q[0]) >= alpha or abs(p[1] - p[0]) >= beta or \
           abs(q[1] - q[0]) >= beta:
            return
        if bs == 4:
            ap = abs(p[2] - p[0]) < beta
            aq = abs(q[2] - q[0]) < beta
            strong = abs(p[0] - q[0]) < (alpha >> 2) + 2
            if not chroma and ap and strong:
                pl[pos - stride] = (p[2] + 2 * p[1] + 2 * p[0] + 2 * q[0] + q[1] + 4) >> 3
                pl[pos - 2 * stride] = (p[2] + p[1] + p[0] + q[0] + 2) >> 2
                pl[pos - 3 * stride] = (2 * p[3] + 3 * p[2] + p[1] + p[0] + q[0] + 4) >> 3
            else:
                pl[pos - stride] = (2 * p[1] + p[0] + q[1] + 2) >> 2
            if not chroma and aq and strong:
                pl[pos] = (q[2] + 2 * q[1] + 2 * q[0] + 2 * p[0] + p[1] + 4) >> 3
                pl[pos + stride] = (q[2] + q[1] + q[0] + p[0] + 2) >> 2
                pl[pos + 2 * stride] = (2 * q[3] + 3 * q[2] + q[1] + q[0] + p[0] + 4) >> 3
            else:
                pl[pos] = (2 * q[1] + q[0] + p[1] + 2) >> 2
        else:
            tc0 = DB_TC0[bs - 1][index_a]
            ap = abs(p[2] - p[0]) < beta
            aq = abs(q[2] - q[0]) < beta
            tc = tc0 + (0 if chroma else (1 if ap else 0) + (1 if aq else 0)) + \
                (1 if chroma else 0)
            delta = clip3(-tc, tc, ((q[0] - p[0]) * 4 + (p[1] - q[1]) + 4) >> 3)
            pl[pos - stride] = clip255(p[0] + delta)
            pl[pos] = clip255(q[0] - delta)
            if not chroma and ap:
                pl[pos - 2 * stride] = p[1] + clip3(-tc0, tc0,
                    (p[2] + ((p[0] + q[0] + 1) >> 1) - 2 * p[1]) >> 1)
            if not chroma and aq:
                pl[pos + stride] = q[1] + clip3(-tc0, tc0,
                    (q[2] + ((q[0] + p[0] + 1) >> 1) - 2 * q[1]) >> 1)

    def edges_of(mbx, mby):
        idc, off_a, off_b = mb_params[mby][mbx]
        if idc == 1:
            return  # this MB's slice disables the filter
        for mb_plane_qp, pl, pw, mb_sz, edge_step in (
                ('y', yp, W, 16, 4), ('u', up, W // 2, 8, 4), ('v', vp, W // 2, 8, 4)):
            chroma = mb_plane_qp != 'y'
            qp_here = mbqp[mby][mbx]
            # vertical edges
            for e in range(0, mb_sz, edge_step):
                if e == 0 and mbx == 0:
                    continue
                if e == 0 and idc == 2 and                         mb_slice[mby][mbx - 1] != mb_slice[mby][mbx]:
                    continue  # idc 2: no filtering across slice boundaries
                bs = 4 if e == 0 else 3
                qp_l = mbqp[mby][mbx - 1] if e == 0 else qp_here
                qav = (qp_here + qp_l + 1) >> 1
                if chroma:
                    qav = (qpc_of(qp_here) + qpc_of(qp_l) + 1) >> 1
                index_a = clip3(0, 51, qav + off_a)
                index_b = clip3(0, 51, qav + off_b)
                alpha, beta = DB_ALPHA[index_a], DB_BETA[index_b]
                if alpha == 0 or beta == 0:
                    continue
                x0 = mbx * mb_sz + e
                for yy in range(mb_sz):
                    filt_line(pl, (mby * mb_sz + yy) * pw + x0, 1,
                              bs, index_a, alpha, beta, chroma)
            # horizontal edges
            for e in range(0, mb_sz, edge_step):
                if e == 0 and mby == 0:
                    continue
                if e == 0 and idc == 2 and                         mb_slice[mby - 1][mbx] != mb_slice[mby][mbx]:
                    continue
                bs = 4 if e == 0 else 3
                qp_t = mbqp[mby - 1][mbx] if e == 0 else qp_here
                qav = (qp_here + qp_t + 1) >> 1
                if chroma:
                    qav = (qpc_of(qp_here) + qpc_of(qp_t) + 1) >> 1
                index_a = clip3(0, 51, qav + off_a)
                index_b = clip3(0, 51, qav + off_b)
                alpha, beta = DB_ALPHA[index_a], DB_BETA[index_b]
                if alpha == 0 or beta == 0:
                    continue
                y0 = mby * mb_sz + e
                for xx in range(mb_sz):
                    filt_line(pl, y0 * pw + mbx * mb_sz + xx, pw,
                              bs, index_a, alpha, beta, chroma)

    for mby in range(mbs_y):
        for mbx in range(mbs_x):
            edges_of(mbx, mby)


# ----------------------------------------------------------- encoder

def write_sps(W, H, poc_type=2, crop=None, profile=66):
    """crop = (left, right, top, bottom) in CropUnits (2 px each for
    4:2:0 frames); poc_type 0 puts pic_order_cnt_lsb in slice headers."""
    w = BitWriter()
    w.u(profile, 8)  # profile_idc: 66 baseline / 77 main
    w.u(0xC0 if profile == 66 else 0x40, 8)  # constraint flags
    w.u(10, 8)       # level_idc
    w.ue(0)          # sps_id
    w.ue(0)          # log2_max_frame_num_minus4
    w.ue(poc_type)   # pic_order_cnt_type
    if poc_type == 0:
        w.ue(0)      # log2_max_pic_order_cnt_lsb_minus4 -> u(4) per slice
    w.ue(1)          # max_num_ref_frames
    w.u(0, 1)        # gaps_in_frame_num_value_allowed
    w.ue(W // 16 - 1)
    w.ue(H // 16 - 1)
    w.u(1, 1)        # frame_mbs_only
    w.u(0, 1)        # direct_8x8_inference
    if crop:
        w.u(1, 1)    # frame_cropping
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    w.u(0, 1)        # vui
    w.rbsp_trailing()
    return nal(7, w.bytes_raw())


def write_pps(qp, deblock_control=True, pic_order_present=False, cabac=False):
    w = BitWriter()
    w.ue(0)          # pps_id
    w.ue(0)          # sps_id
    w.u(1 if cabac else 0, 1)  # entropy_coding_mode
    w.u(1 if pic_order_present else 0, 1)  # bottom_field_pic_order_in_frame_present
    w.ue(0)          # num_slice_groups_minus1
    w.ue(0)          # num_ref_idx_l0_default_active_minus1
    w.ue(0)          # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)        # weighted_pred
    w.u(0, 2)        # weighted_bipred_idc
    w.se(qp - 26)    # pic_init_qp_minus26
    w.se(0)          # pic_init_qs_minus26
    w.se(0)          # chroma_qp_index_offset
    w.u(1 if deblock_control else 0, 1)  # deblocking_filter_control_present
    w.u(0, 1)        # constrained_intra_pred
    w.u(0, 1)        # redundant_pic_cnt_present
    w.rbsp_trailing()
    return nal(8, w.bytes_raw())


def zigzag_of(block4):
    return [block4[z // 4][z % 4] for z in (ZIGZAG[k] for k in range(16))]


def unzigzag(coeffs):
    b = [[0] * 4 for _ in range(4)]
    for k in range(16):
        z = ZIGZAG[k]
        b[z // 4][z % 4] = coeffs[k]
    return b


class FrameCtx:
    """Shared encoder/decoder state for one frame: recon planes, the
    CAVLC nC context grids, and the per-MB slice map (neighbors in a
    DIFFERENT slice are unavailable for intra prediction and nC)."""
    def __init__(self, W, H):
        self.W, self.H = W, H
        self.y = [[0] * W for _ in range(H)]
        self.u = [[0] * (W // 2) for _ in range(H // 2)]
        self.v = [[0] * (W // 2) for _ in range(H // 2)]
        # totalCoeff per 4x4 block; -1 = not yet decoded/outside
        self.tc_y = [[-1] * (W // 4) for _ in range(H // 4)]
        self.tc_u = [[-1] * (W // 8) for _ in range(H // 8)]
        self.tc_v = [[-1] * (W // 8) for _ in range(H // 8)]
        # intra4x4 pred mode per luma 4x4 block; -1 = not Intra_4x4
        self.i4mode = [[-1] * (W // 4) for _ in range(H // 4)]
        self.mb_slice = [[-1] * (W // 16) for _ in range(H // 16)]

    def avail_left(self, x, y, sid, mbs=16):
        """Is the block left of plane (x,y) available (in picture AND
        same slice)? mbs = MB size in this plane's units (16 luma, 8
        chroma)."""
        return x > 0 and (x % mbs != 0 or
                          self.mb_slice[y // mbs][(x - 1) // mbs] == sid)

    def avail_up(self, x, y, sid, mbs=16):
        return y > 0 and (y % mbs != 0 or
                          self.mb_slice[(y - 1) // mbs][x // mbs] == sid)

    def avail_ar(self, x, y, sid):
        """Above-right availability for a luma 4x4 block: decode order
        AND slice membership."""
        if not above_right_avail(x, y, self.W):
            return False
        if (y - 1) // 16 == y // 16 and (x + 4) // 16 == x // 16:
            return True  # same MB
        return self.mb_slice[(y - 1) // 16][(x + 4) // 16] == sid

    def nc(self, grid, bx, by, aleft, aup):
        nA = grid[by][bx - 1] if aleft else -1
        nB = grid[by - 1][bx] if aup else -1
        if nA >= 0 and nB >= 0:
            return (nA + nB + 1) >> 1
        if nA >= 0:
            return nA
        if nB >= 0:
            return nB
        return 0

    def pred_i4_mode(self, bx, by, aleft, aup):
        if not aleft or not aup:
            return 2
        mA = self.i4mode[by][bx - 1]
        mB = self.i4mode[by - 1][bx]
        return min(mA if mA >= 0 else 2, mB if mB >= 0 else 2)


def _block_xy(mbx, mby, blk):
    bx = ((blk >> 2) & 1) * 2 + (blk & 1)
    by = (blk >> 3) * 2 + ((blk >> 1) & 1)
    return mbx * 16 + bx * 4, mby * 16 + by * 4


def encode_frame(src_y, src_u, src_v, W, H, qp, mb_plan,
                 deblock_idc=0, qp_deltas=None, pps_qp=26, slices=1,
                 deblock_off2=(0, 0), poc_type=2, pic_order_present=False,
                 cabac=False):
    """One IDR frame. mb_plan(mbx, mby) -> ('pcm',) | ('i16', mode,
    chroma_mode) | ('i4', [16 modes], chroma_mode). qp_deltas optional
    per-MB-index mb_qp_delta values (exercises QP tracking). cabac=True
    entropy-codes the slice data with the Main-profile CABAC layer
    (slice headers stay Exp-Golomb; pair with write_pps(cabac=True) and
    write_sps(profile=77))."""
    mbs_x, mbs_y = W // 16, H // 16
    n_mbs = mbs_x * mbs_y
    ctx = FrameCtx(W, H)
    cst = CabacPicState(mbs_x, mbs_y) if cabac else None
    mbqp = [[0] * mbs_x for _ in range(mbs_y)]
    mb_params = [[(deblock_idc, deblock_off2[0] * 2, deblock_off2[1] * 2)] * mbs_x
                 for _ in range(mbs_y)]
    nals = []
    # contiguous MB ranges, one slice NAL each; neighbors across a slice
    # boundary are UNAVAILABLE for intra prediction and nC context
    bounds = [round(s * n_mbs / slices) for s in range(slices + 1)]
    for sid in range(slices):
        if bounds[sid] == bounds[sid + 1]:
            continue  # empty slice (more slices than MBs): a CABAC slice
            # cannot represent zero macroblocks (end_of_slice_flag follows
            # the first MB), and an empty CAVLC NAL is pure waste
        w = BitWriter()
        # slice header (IDR)
        w.ue(bounds[sid])  # first_mb_in_slice
        w.ue(7)          # slice_type: I (all slices of the picture)
        w.ue(0)          # pps_id
        w.u(0, 4)        # frame_num (log2_max_frame_num = 4)
        w.ue(0)          # idr_pic_id
        if poc_type == 0:
            w.u(0, 4)    # pic_order_cnt_lsb (log2_max_pic_order_cnt_lsb = 4)
            if pic_order_present:
                w.se(0)  # delta_pic_order_cnt_bottom
        w.u(0, 1)        # no_output_of_prior_pics
        w.u(0, 1)        # long_term_reference
        # the slice carries its QP relative to the PPS base — ALL fixtures
        # share one identical PPS, so an MP4 avcC lifted from any stream
        # decodes every sample correctly
        w.se(qp - pps_qp)  # slice_qp_delta
        w.ue(deblock_idc)  # disable_deblocking_filter_idc
        if deblock_idc != 1:
            w.se(deblock_off2[0])  # slice_alpha_c0_offset_div2
            w.se(deblock_off2[1])  # slice_beta_offset_div2
        cab = models = None
        if cabac:
            while len(w.bits) % 8:  # cabac_alignment_one_bit (7.3.4)
                w.bits.append(1)
            cab = CabacEnc(w)
            models = cabac_init_models(qp)  # SliceQPy before any delta
            cst.last_delta_nz = False
        qpy = qp
        for mbi in range(bounds[sid], bounds[sid + 1]):
            mby, mbx = mbi // mbs_x, mbi % mbs_x
            ctx.mb_slice[mby][mbx] = sid
            plan = mb_plan(mbx, mby)
            # the SIGNALED mb_qp_delta must be the effective change: the
            # decoder applies spec mod-52 arithmetic, so a clipped
            # request (qp 0, delta -2) signaled raw would wrap to 50
            delta = clip3(0, 51, qpy + (qp_deltas or {}).get(mbi, 0)) - qpy
            if plan[0] == 'pcm':
                if cabac:
                    # mb_type bin string "1 1": the second bin is the
                    # terminate bin, whose 1 flushes the engine so the
                    # raw samples can ride byte-aligned (9.3.1.2)
                    cabac_enc_mb_type(cab, models, cst, ctx, sid, mbx, mby, 25)
                    cst.set_pcm(mbx, mby)
                else:
                    w.ue(25)
                w.align_zero()
                for j in range(16):
                    for i in range(16):
                        s = src_y[mby * 16 + j][mbx * 16 + i]
                        w.u(s, 8)
                        ctx.y[mby * 16 + j][mbx * 16 + i] = s
                for pl, src in ((ctx.u, src_u), (ctx.v, src_v)):
                    for j in range(8):
                        for i in range(8):
                            s = src[mby * 8 + j][mbx * 8 + i]
                            w.u(s, 8)
                            pl[mby * 8 + j][mbx * 8 + i] = s
                for by in range(4):
                    for bx in range(4):
                        ctx.tc_y[mby * 4 + by][mbx * 4 + bx] = 16
                for by in range(2):
                    for bx in range(2):
                        ctx.tc_u[mby * 2 + by][mbx * 2 + bx] = 16
                        ctx.tc_v[mby * 2 + by][mbx * 2 + bx] = 16
                mbqp[mby][mbx] = 0  # spec: QPy = 0 for I_PCM deblocking
                if cabac:  # engine re-initializes after pcm samples
                    cab = CabacEnc(w)
                    cab.terminate(1 if mbi == bounds[sid + 1] - 1 else 0)
                continue

            up_ok = ctx.avail_up(mbx * 16, mby * 16, sid)
            left_ok = ctx.avail_left(mbx * 16, mby * 16, sid)

            def clamp16(m):
                if m == 0 and not up_ok:
                    return 2
                if m == 1 and not left_ok:
                    return 2
                if m == 3 and not (up_ok and left_ok):
                    return 2
                return m

            def clamp_ch(m):
                if m == 2 and not up_ok:
                    return 0
                if m == 1 and not left_ok:
                    return 0
                if m == 3 and not (up_ok and left_ok):
                    return 0
                return m

            def clamp4(m, x, y):
                upb = ctx.avail_up(x, y, sid)
                leftb = ctx.avail_left(x, y, sid)
                if m in (0, 3, 7) and not upb:
                    return 2 if not leftb else 1
                if m in (1, 8) and not leftb:
                    return 2 if not upb else 0
                if m in (4, 5, 6) and not (upb and leftb):
                    return 2
                return m

            if plan[0] == 'i16':
                mode = clamp16(plan[1])
                cmode = clamp_ch(plan[2])
                pred = pred_block_nxn(ctx.y, mbx * 16, mby * 16, 16, mode, False,
                                      up_ok, left_ok)
                newqp = clip3(0, 51, qpy + delta)
                # transform + quant all 16 blocks
                dcq = [[0] * 4 for _ in range(4)]
                acq = [None] * 16
                for blk in range(16):
                    x, y = _block_xy(mbx, mby, blk)
                    bi, bj = (x % 16) // 4, (y % 16) // 4
                    r = [[src_y[y + j][x + i] - pred[(y % 16) + j][(x % 16) + i]
                          for i in range(4)] for j in range(4)]
                    wq = forward4x4(r)
                    dcq[bj][bi] = wq[0][0]
                    zz = zigzag_of(wq)[1:]
                    acq[blk] = [quant_ac(c, newqp,
                                         ZIGZAG[k + 1] // 4, ZIGZAG[k + 1] % 4)
                                for k, c in enumerate(zz)]
                dch = hadamard4(dcq, True)
                dcz = [[quant_luma_dc(dch[j][i], newqp) for i in range(4)]
                       for j in range(4)]
                cbp_luma = 15 if any(any(c for c in b) for b in acq) else 0
                # chroma
                cpred = {}
                cdcz = {}
                cacq = {}
                qpc = qpc_of(newqp)
                for pn, (pl, src) in (('u', (ctx.u, src_u)), ('v', (ctx.v, src_v))):
                    cpred[pn] = pred_block_nxn(pl, mbx * 8, mby * 8, 8, cmode, True,
                                           up_ok, left_ok)
                    dc2 = [[0] * 2 for _ in range(2)]
                    acs = [None] * 4
                    for blk in range(4):
                        bx, by = blk % 2, blk // 2
                        r = [[src[mby * 8 + by * 4 + j][mbx * 8 + bx * 4 + i] -
                              cpred[pn][by * 4 + j][bx * 4 + i]
                              for i in range(4)] for j in range(4)]
                        wq = forward4x4(r)
                        dc2[by][bx] = wq[0][0]
                        zz = zigzag_of(wq)[1:]
                        acs[blk] = [quant_ac(c, qpc, ZIGZAG[k + 1] // 4,
                                             ZIGZAG[k + 1] % 4)
                                    for k, c in enumerate(zz)]
                    dch2 = hadamard2(dc2)
                    cdcz[pn] = [[quant_chroma_dc(dch2[j][i], qpc)
                                 for i in range(2)] for j in range(2)]
                    cacq[pn] = acs
                any_cac = any(any(c for c in b) for pn in 'uv' for b in cacq[pn])
                any_cdc = any(cdcz[pn][j][i] for pn in 'uv'
                              for j in range(2) for i in range(2))
                cbp_chroma = 2 if any_cac else (1 if any_cdc else 0)
                mb_type = 1 + mode + 4 * cbp_chroma + 12 * (cbp_luma // 15)
                if cabac:
                    cabac_enc_mb_type(cab, models, cst, ctx, sid, mbx, mby,
                                      mb_type, cbp_luma, cbp_chroma)
                    cst.kind[mby][mbx] = 1
                    cst.cbp_luma[mby][mbx] = cbp_luma
                    cst.cbp_chroma[mby][mbx] = cbp_chroma
                    cabac_enc_cmode(cab, models, cst, ctx, sid, mbx, mby, cmode)
                    cst.cmode[mby][mbx] = cmode
                    cabac_enc_qp_delta(cab, models, cst, delta)
                else:
                    w.ue(mb_type)
                    w.ue(cmode)
                    w.se(delta)
                qpy = newqp
                mbqp[mby][mbx] = qpy
                # ---- residuals: luma DC (nC context of blk 0)
                bx0, by0 = mbx * 4, mby * 4
                dczz = zigzag_of(dcz)
                if cabac:
                    cst.cbf_dc_y[mby][mbx] = cabac_enc_residual(
                        cab, models, 0, dczz,
                        cst.cbf_dc_y_inc(ctx, sid, mbx, mby))
                else:
                    encode_block(w, dczz,
                                 ctx.nc(ctx.tc_y, bx0, by0, left_ok, up_ok), 16)
                # luma AC in Z order
                for blk in range(16):
                    x, y = _block_xy(mbx, mby, blk)
                    gx, gy = x // 4, y // 4
                    if cbp_luma:
                        if cabac:
                            cst.cbf_y[gy][gx] = cabac_enc_residual(
                                cab, models, 1, acq[blk],
                                cst.cbf_y_inc(ctx, sid, mbx, mby, gx, gy))
                        else:
                            tc = encode_block(w, acq[blk],
                                              ctx.nc(ctx.tc_y, gx, gy,
                                                     ctx.avail_left(x, y, sid),
                                                     ctx.avail_up(x, y, sid)), 15)
                            ctx.tc_y[gy][gx] = tc
                    else:
                        ctx.tc_y[gy][gx] = 0
                self_recon_i16(ctx, mbx, mby, pred, dcz, acq, cbp_luma, qpy)
                encode_chroma_resid(w, ctx, mbx, mby, cbp_chroma, cdcz, cacq,
                                    cpred, qpc, sid,
                                    cab=cab, models=models, cst=cst)
                for by in range(4):
                    for bx in range(4):
                        ctx.i4mode[mby * 4 + by][mbx * 4 + bx] = -1
                if cabac:
                    cab.terminate(1 if mbi == bounds[sid + 1] - 1 else 0)
                continue

            # ---- Intra_4x4
            assert plan[0] == 'i4'
            cmode = clamp_ch(plan[2])
            newqp = clip3(0, 51, qpy + delta)
            qpc = qpc_of(newqp)
            modes = []
            flags = []
            blocks = []
            for blk in range(16):
                x, y = _block_xy(mbx, mby, blk)
                m = clamp4(plan[1][blk], x, y)
                predm = ctx.pred_i4_mode(x // 4, y // 4,
                                         ctx.avail_left(x, y, sid),
                                         ctx.avail_up(x, y, sid))
                if m == predm:
                    flags.append((1, 0))
                else:
                    flags.append((0, m if m < predm else m - 1))
                ctx.i4mode[y // 4][x // 4] = m
                modes.append(m)
                pred = pred4x4(ctx.y, W, H, x, y, m,
                               ctx.avail_up(x, y, sid),
                               ctx.avail_left(x, y, sid),
                               ctx.avail_ar(x, y, sid))
                r = [[src_y[y + j][x + i] - pred[j][i] for i in range(4)]
                     for j in range(4)]
                wq = forward4x4(r)
                zz = zigzag_of(wq)
                zq = [quant_ac(c, newqp, ZIGZAG[k] // 4, ZIGZAG[k] % 4)
                      for k, c in enumerate(zz)]
                blocks.append(zq)
                # progressive reconstruction (later blocks predict from it;
                # an all-zero quadrant drops residuals that are zero anyway)
                dqz = [dequant_ac(zq[k], newqp, ZIGZAG[k] // 4, ZIGZAG[k] % 4)
                       for k in range(16)]
                recon_block(ctx.y, x, y, pred, unzigzag(dqz))
            cbp_luma = 0
            for quad in range(4):
                qblks = [b for b in range(16) if (b >> 2 & 1) == (quad & 1)
                         and (b >> 3) == (quad >> 1)]
                if any(any(blocks[b]) for b in qblks):
                    cbp_luma |= 1 << quad
            # chroma (same machinery as I16)
            cpred = {}
            cdcz = {}
            cacq = {}
            for pn, (pl, src) in (('u', (ctx.u, src_u)), ('v', (ctx.v, src_v))):
                cpred[pn] = pred_block_nxn(pl, mbx * 8, mby * 8, 8, cmode, True,
                                           up_ok, left_ok)
                dc2 = [[0] * 2 for _ in range(2)]
                acs = [None] * 4
                for blk in range(4):
                    bx, by = blk % 2, blk // 2
                    r = [[src[mby * 8 + by * 4 + j][mbx * 8 + bx * 4 + i] -
                          cpred[pn][by * 4 + j][bx * 4 + i]
                          for i in range(4)] for j in range(4)]
                    wq = forward4x4(r)
                    dc2[by][bx] = wq[0][0]
                    zz = zigzag_of(wq)[1:]
                    acs[blk] = [quant_ac(c, qpc, ZIGZAG[k + 1] // 4,
                                         ZIGZAG[k + 1] % 4)
                                for k, c in enumerate(zz)]
                dch2 = hadamard2(dc2)
                cdcz[pn] = [[quant_chroma_dc(dch2[j][i], qpc)
                             for i in range(2)] for j in range(2)]
                cacq[pn] = acs
            any_cac = any(any(c for c in b) for pn in 'uv' for b in cacq[pn])
            any_cdc = any(cdcz[pn][j][i] for pn in 'uv'
                          for j in range(2) for i in range(2))
            cbp_chroma = 2 if any_cac else (1 if any_cdc else 0)
            cbp = cbp_luma + 16 * cbp_chroma
            if cabac:
                cabac_enc_mb_type(cab, models, cst, ctx, sid, mbx, mby, 0)
                cst.kind[mby][mbx] = 0
                cabac_enc_i4_modes(cab, models, flags)
                cabac_enc_cmode(cab, models, cst, ctx, sid, mbx, mby, cmode)
                cst.cmode[mby][mbx] = cmode
                cabac_enc_cbp(cab, models, cst, ctx, sid, mbx, mby, cbp)
                cst.cbp_luma[mby][mbx] = cbp_luma
                cst.cbp_chroma[mby][mbx] = cbp_chroma
                if cbp:
                    cabac_enc_qp_delta(cab, models, cst, delta)
                    qpy = newqp
                else:
                    cst.last_delta_nz = False
            else:
                w.ue(0)  # mb_type I_4x4
                for f, rem in flags:
                    w.u(f, 1)
                    if not f:
                        w.u(rem, 3)
                w.ue(cmode)
                w.ue(CBP_INTRA_INV[cbp])
                if cbp:
                    w.se(delta)
                    qpy = newqp
            mbqp[mby][mbx] = qpy
            for blk in range(16):
                x, y = _block_xy(mbx, mby, blk)
                gx, gy = x // 4, y // 4
                quad = (1 if (x % 16) >= 8 else 0) + (2 if (y % 16) >= 8 else 0)
                if cbp_luma & (1 << quad):
                    if cabac:
                        cst.cbf_y[gy][gx] = cabac_enc_residual(
                            cab, models, 2, blocks[blk],
                            cst.cbf_y_inc(ctx, sid, mbx, mby, gx, gy))
                    else:
                        tc = encode_block(w, blocks[blk],
                                          ctx.nc(ctx.tc_y, gx, gy,
                                                 ctx.avail_left(x, y, sid),
                                                 ctx.avail_up(x, y, sid)), 16)
                        ctx.tc_y[gy][gx] = tc
                else:
                    ctx.tc_y[gy][gx] = 0
            encode_chroma_resid(w, ctx, mbx, mby, cbp_chroma, cdcz, cacq,
                                cpred, qpc, sid,
                                cab=cab, models=models, cst=cst)
            if cabac:
                cab.terminate(1 if mbi == bounds[sid + 1] - 1 else 0)
        w.rbsp_trailing()
        nals.append(nal(5, w.bytes_raw()))
    body = b''.join(nals)
    deblock(flat(ctx.y), flat(ctx.u), flat(ctx.v), W, H, mbqp,
            mb_params, ctx.mb_slice)
    return body, ctx, mbqp


def flat(rows):
    """Row-list planes exposed as a flat index (deblock mutates rows in
    place through this adapter)."""
    width = len(rows[0])

    class Flat:
        def __getitem__(self, i):
            return rows[i // width][i % width]

        def __setitem__(self, i, val):
            rows[i // width][i % width] = val
    return Flat()


def recon_block(plane, x, y, pred, dq):
    r = inverse4x4(dq)
    for j in range(4):
        for i in range(4):
            plane[y + j][x + i] = clip255(pred[j][i] + ((r[j][i] + 32) >> 6))


def self_recon_i16(ctx, mbx, mby, pred, dcz, acq, cbp_luma, qp):
    dci = hadamard4(unzigzag_dc(dcz), False)
    for blk in range(16):
        x, y = _block_xy(mbx, mby, blk)
        bi, bj = (x % 16) // 4, (y % 16) // 4
        d = [[0] * 4 for _ in range(4)]
        if cbp_luma:
            for k, c in enumerate(acq[blk]):
                z = ZIGZAG[k + 1]
                d[z // 4][z % 4] = dequant_ac(c, qp, z // 4, z % 4)
        d[0][0] = dequant_luma_dc(dci[bj][bi], qp)
        p = [[pred[(y % 16) + j][(x % 16) + i] for i in range(4)] for j in range(4)]
        recon_block(ctx.y, x, y, p, d)


def unzigzag_dc(dcz):
    return dcz  # the DC matrix is kept unscanned by callers


def encode_chroma_resid(w, ctx, mbx, mby, cbp_chroma, cdcz, cacq, cpred,
                        qpc, sid, cab=None, models=None, cst=None):
    for pn, grid, plane in (('u', ctx.tc_u, ctx.u), ('v', ctx.tc_v, ctx.v)):
        if cbp_chroma:
            dzz = [cdcz[pn][0][0], cdcz[pn][0][1], cdcz[pn][1][0], cdcz[pn][1][1]]
            if cab is not None:
                cst.cbf_dc_c[pn][mby][mbx] = cabac_enc_residual(
                    cab, models, 3, dzz,
                    cst.cbf_dc_c_inc(ctx, sid, mbx, mby, pn))
            else:
                encode_block(w, dzz, -1, 4)
    for pn, grid, plane in (('u', ctx.tc_u, ctx.u), ('v', ctx.tc_v, ctx.v)):
        for blk in range(4):
            bx, by = blk % 2, blk // 2
            gx, gy = mbx * 2 + bx, mby * 2 + by
            if cbp_chroma == 2:
                if cab is not None:
                    cst.cbf_c[pn][gy][gx] = cabac_enc_residual(
                        cab, models, 4, cacq[pn][blk],
                        cst.cbf_c_inc(ctx, sid, mbx, mby, gx, gy, pn))
                else:
                    tc = encode_block(w, cacq[pn][blk],
                                      ctx.nc(grid, gx, gy,
                                             ctx.avail_left(gx * 4, gy * 4, sid, 8),
                                             ctx.avail_up(gx * 4, gy * 4, sid, 8)), 15)
                    grid[gy][gx] = tc
            else:
                grid[gy][gx] = 0
        # reconstruction
        dci = hadamard2(cdcz[pn]) if cbp_chroma else [[0, 0], [0, 0]]
        for blk in range(4):
            bx, by = blk % 2, blk // 2
            d = [[0] * 4 for _ in range(4)]
            if cbp_chroma == 2:
                for k, c in enumerate(cacq[pn][blk]):
                    z = ZIGZAG[k + 1]
                    d[z // 4][z % 4] = dequant_ac(c, qpc, z // 4, z % 4)
            if cbp_chroma:
                d[0][0] = dequant_chroma_dc(dci[by][bx], qpc)
            p = [[cpred[pn][by * 4 + j][bx * 4 + i] for i in range(4)]
                 for j in range(4)]
            recon_block(plane, mbx * 8 + bx * 4, mby * 8 + by * 4, p, d)


# ------------------------------------------------------- CABAC (9.3)
# Arithmetic entropy layer for Main-profile I slices: engine (9.3.3.2 /
# 9.3.4), context initialization (9.3.1.1), I-slice binarizations
# (9.3.2) and context-increment derivations (9.3.3.1). Shares the
# single table transcription in h264_tables (see the provenance note
# there). The encoder and decoder below are exact mirrors; the
# H264CabacSpec fuzz round-trips them bin-exactly, and gen_h264_tables
# emits the same tables for the Scala decoder.

from h264_tables import (RANGE_TAB_LPS, TRANS_IDX_LPS, CTX_INIT_I,
                         CABAC_CBF_BASE, CABAC_SIG_BASE, CABAC_LAST_BASE,
                         CABAC_ABS_BASE, CABAC_CAT_OFF_CBF,
                         CABAC_CAT_OFF_SIG, CABAC_CAT_OFF_ABS)


def cabac_init_models(slice_qp):
    """pStateIdx/valMPS per ctxIdx 0..275 from the slice QP (9.3.1.1)."""
    models = []
    qp = clip3(0, 51, slice_qp)
    for m, n in CTX_INIT_I:
        pre = clip3(1, 126, ((m * qp) >> 4) + n)
        models.append([63 - pre, 0] if pre <= 63 else [pre - 64, 1])
    return models


class CabacEnc:
    """Arithmetic encoder (9.3.4) writing through a BitWriter. The
    firstBitFlag discard plus the flush shape keep the emitted bit
    count equal to the mirror decoder's consumed count at every
    terminate — which is what makes I_PCM byte alignment and engine
    re-initialization land on the same bit both sides."""

    def __init__(self, w):
        self.w = w
        self.low = 0
        self.range = 510
        self.outstanding = 0
        self.first = True

    def _putbit(self, b):
        if self.first:
            self.first = False
        else:
            self.w.u(b, 1)
        while self.outstanding:
            self.w.u(1 - b, 1)
            self.outstanding -= 1

    def _renorm(self):
        while self.range < 256:
            if self.low >= 512:
                self._putbit(1)
                self.low -= 512
            elif self.low < 256:
                self._putbit(0)
            else:
                self.outstanding += 1
                self.low -= 256
            self.low <<= 1
            self.range <<= 1

    def decision(self, models, idx, b):
        st, mps = models[idx]
        rlps = RANGE_TAB_LPS[st][(self.range >> 6) & 3]
        self.range -= rlps
        if b != mps:
            self.low += self.range
            self.range = rlps
            if st == 0:
                models[idx][1] = 1 - mps
            models[idx][0] = TRANS_IDX_LPS[st]
        else:
            models[idx][0] = min(st + 1, 62)
        self._renorm()

    def bypass(self, b):
        self.low <<= 1
        if b:
            self.low += self.range
        if self.low >= 1024:
            self._putbit(1)
            self.low -= 1024
        elif self.low < 512:
            self._putbit(0)
        else:
            self.outstanding += 1
            self.low -= 512

    def terminate(self, b):
        self.range -= 2
        if b:
            self.low += self.range
            self._flush()
        else:
            self._renorm()

    def _flush(self):
        self.range = 2
        self._renorm()
        self._putbit((self.low >> 9) & 1)
        self.w.u(((self.low >> 7) & 3) | 1, 2)


class CabacDec:
    """Arithmetic decoder (9.3.3.2) reading from a BitReader."""

    def __init__(self, r):
        self.r = r
        self.range = 510
        self.offset = r.u(9)

    def _renorm(self):
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self.r.bit()

    def decision(self, models, idx):
        st, mps = models[idx]
        rlps = RANGE_TAB_LPS[st][(self.range >> 6) & 3]
        self.range -= rlps
        if self.offset >= self.range:
            b = 1 - mps
            self.offset -= self.range
            self.range = rlps
            if st == 0:
                models[idx][1] = 1 - mps
            models[idx][0] = TRANS_IDX_LPS[st]
        else:
            b = mps
            models[idx][0] = min(st + 1, 62)
        self._renorm()
        return b

    def bypass(self):
        self.offset = (self.offset << 1) | self.r.bit()
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def terminate(self):
        self.range -= 2
        if self.offset >= self.range:
            return 1
        self._renorm()
        return 0


class CabacPicState:
    """Picture-level neighbor state the context-increment derivations
    read (9.3.3.1.1): per-MB kind/cbp/chroma-mode and per-block
    coded_block_flag grids. Shared by slices of one picture; contexts
    themselves re-initialize per slice. mb kind: 0 I_NxN, 1 I_16x16,
    2 I_PCM, -1 undecoded."""

    def __init__(self, mbs_x, mbs_y):
        self.mbs_x, self.mbs_y = mbs_x, mbs_y
        self.kind = [[-1] * mbs_x for _ in range(mbs_y)]
        self.cbp_luma = [[0] * mbs_x for _ in range(mbs_y)]
        self.cbp_chroma = [[0] * mbs_x for _ in range(mbs_y)]
        self.cmode = [[0] * mbs_x for _ in range(mbs_y)]
        self.cbf_y = [[0] * (4 * mbs_x) for _ in range(4 * mbs_y)]
        self.cbf_dc_y = [[0] * mbs_x for _ in range(mbs_y)]
        self.cbf_c = {'u': [[0] * (2 * mbs_x) for _ in range(2 * mbs_y)],
                      'v': [[0] * (2 * mbs_x) for _ in range(2 * mbs_y)]}
        self.cbf_dc_c = {'u': [[0] * mbs_x for _ in range(mbs_y)],
                         'v': [[0] * mbs_x for _ in range(mbs_y)]}
        self.last_delta_nz = False  # reset at each slice start

    def set_pcm(self, mbx, mby):
        self.kind[mby][mbx] = 2
        for by in range(4):
            for bx in range(4):
                self.cbf_y[mby * 4 + by][mbx * 4 + bx] = 1
        self.cbf_dc_y[mby][mbx] = 1
        for pn in 'uv':
            for by in range(2):
                for bx in range(2):
                    self.cbf_c[pn][mby * 2 + by][mbx * 2 + bx] = 1
            self.cbf_dc_c[pn][mby][mbx] = 1
        self.last_delta_nz = False

    # --- context increments (ctx = FrameCtx for slice availability) ---

    def mb_type_inc(self, ctx, sid, mbx, mby):
        inc = 0
        if ctx.avail_left(mbx * 16, mby * 16, sid) and \
                self.kind[mby][mbx - 1] != 0:
            inc += 1
        if ctx.avail_up(mbx * 16, mby * 16, sid) and \
                self.kind[mby - 1][mbx] != 0:
            inc += 1
        return inc

    def cmode_inc(self, ctx, sid, mbx, mby):
        inc = 0
        if ctx.avail_left(mbx * 16, mby * 16, sid) and \
                self.kind[mby][mbx - 1] != 2 and self.cmode[mby][mbx - 1] != 0:
            inc += 1
        if ctx.avail_up(mbx * 16, mby * 16, sid) and \
                self.kind[mby - 1][mbx] != 2 and self.cmode[mby - 1][mbx] != 0:
            inc += 1
        return inc

    def _cbp_luma_cond(self, ctx, sid, mbx, mby, cur_bits, nbx, nby, nblk):
        """condTermFlag for one neighboring 8x8 luma block: 1 iff the
        neighbor exists in this slice, is not I_PCM and its cbp bit is
        CLEAR (9.3.3.1.1.4 inverts the luma polarity)."""
        if nbx == mbx and nby == mby:  # within the current macroblock
            return 0 if (cur_bits >> nblk) & 1 else 1
        if not (0 <= nbx < self.mbs_x and 0 <= nby < self.mbs_y):
            return 0
        if nbx < mbx:
            avail = ctx.avail_left(mbx * 16, mby * 16, sid)
        else:
            avail = ctx.avail_up(mbx * 16, mby * 16, sid)
        if not avail or self.kind[nby][nbx] == 2:
            return 0
        return 0 if (self.cbp_luma[nby][nbx] >> nblk) & 1 else 1

    def cbp_luma_inc(self, ctx, sid, mbx, mby, blk, cur_bits):
        if blk in (0, 2):
            a = self._cbp_luma_cond(ctx, sid, mbx, mby, cur_bits,
                                    mbx - 1, mby, blk + 1)
        else:
            a = self._cbp_luma_cond(ctx, sid, mbx, mby, cur_bits,
                                    mbx, mby, blk - 1)
        if blk in (0, 1):
            b = self._cbp_luma_cond(ctx, sid, mbx, mby, cur_bits,
                                    mbx, mby - 1, blk + 2)
        else:
            b = self._cbp_luma_cond(ctx, sid, mbx, mby, cur_bits,
                                    mbx, mby, blk - 2)
        return a + 2 * b

    def _cbp_chroma_cond(self, ctx, sid, mbx, mby, left, want2):
        nbx, nby = (mbx - 1, mby) if left else (mbx, mby - 1)
        avail = ctx.avail_left(mbx * 16, mby * 16, sid) if left \
            else ctx.avail_up(mbx * 16, mby * 16, sid)
        if not avail:
            return 0
        if self.kind[nby][nbx] == 2:
            return 1
        c = self.cbp_chroma[nby][nbx]
        return 1 if (c == 2 if want2 else c != 0) else 0

    def cbp_chroma_inc(self, ctx, sid, mbx, mby, bin_idx):
        want2 = bin_idx == 1
        a = self._cbp_chroma_cond(ctx, sid, mbx, mby, True, want2)
        b = self._cbp_chroma_cond(ctx, sid, mbx, mby, False, want2)
        return (4 if want2 else 0) + a + 2 * b

    def _mb_cond(self, ctx, sid, mbx, mby, left, grid):
        """condTermFlag for a per-MB coded_block_flag neighbor (cats 0
        and 3): unavailable -> 1 (intra picture), I_PCM -> 1, else the
        stored flag (0 when that MB carried no such transform block)."""
        nbx, nby = (mbx - 1, mby) if left else (mbx, mby - 1)
        avail = ctx.avail_left(mbx * 16, mby * 16, sid) if left \
            else ctx.avail_up(mbx * 16, mby * 16, sid)
        if not avail:
            return 1
        if self.kind[nby][nbx] == 2:
            return 1
        return grid[nby][nbx]

    def cbf_dc_y_inc(self, ctx, sid, mbx, mby):
        a = self._mb_cond(ctx, sid, mbx, mby, True, self.cbf_dc_y)
        b = self._mb_cond(ctx, sid, mbx, mby, False, self.cbf_dc_y)
        return a + 2 * b

    def cbf_dc_c_inc(self, ctx, sid, mbx, mby, pn):
        a = self._mb_cond(ctx, sid, mbx, mby, True, self.cbf_dc_c[pn])
        b = self._mb_cond(ctx, sid, mbx, mby, False, self.cbf_dc_c[pn])
        return a + 2 * b

    def _blk_flag(self, ctx, sid, mbx, mby, ngx, ngy, grid, per):
        """condTermFlag for the neighboring sub-block at grid (ngx,
        ngy), where the CURRENT macroblock is (mbx, mby)."""
        if ngx < 0 or ngy < 0:
            return 1
        nmbx, nmby = ngx // per, ngy // per
        if nmbx == mbx and nmby == mby:
            return grid[ngy][ngx]
        # neighbor lies in the left or up macroblock
        if nmbx < mbx:
            avail = ctx.avail_left(mbx * 16, mby * 16, sid)
        else:
            avail = ctx.avail_up(mbx * 16, mby * 16, sid)
        if not avail:
            return 1
        if self.kind[nmby][nmbx] == 2:
            return 1
        return grid[ngy][ngx]

    def cbf_y_inc(self, ctx, sid, mbx, mby, gx, gy):
        a = self._blk_flag(ctx, sid, mbx, mby, gx - 1, gy, self.cbf_y, 4)
        b = self._blk_flag(ctx, sid, mbx, mby, gx, gy - 1, self.cbf_y, 4)
        return a + 2 * b

    def cbf_c_inc(self, ctx, sid, mbx, mby, gx, gy, pn):
        a = self._blk_flag(ctx, sid, mbx, mby, gx - 1, gy, self.cbf_c[pn], 2)
        b = self._blk_flag(ctx, sid, mbx, mby, gx, gy - 1, self.cbf_c[pn], 2)
        return a + 2 * b


# --- I-slice syntax coders: encode/decode mirrors ---

def cabac_enc_mb_type(cab, models, st, ctx, sid, mbx, mby, mb_type,
                      cbp_luma=0, cbp_chroma=0):
    inc = st.mb_type_inc(ctx, sid, mbx, mby)
    if mb_type == 0:  # I_NxN
        cab.decision(models, 3 + inc, 0)
        return
    cab.decision(models, 3 + inc, 1)
    if mb_type == 25:  # I_PCM: terminate bin drains + flushes the engine
        cab.terminate(1)
        return
    cab.terminate(0)
    m = mb_type - 1
    pm = m % 4
    cab.decision(models, 6, 1 if cbp_luma == 15 else 0)
    if cbp_chroma == 0:
        cab.decision(models, 7, 0)
    else:
        cab.decision(models, 7, 1)
        cab.decision(models, 8, 1 if cbp_chroma == 2 else 0)
    cab.decision(models, 9, (pm >> 1) & 1)
    cab.decision(models, 10, pm & 1)


def cabac_dec_mb_type(cab, models, st, ctx, sid, mbx, mby):
    inc = st.mb_type_inc(ctx, sid, mbx, mby)
    if cab.decision(models, 3 + inc) == 0:
        return 0
    if cab.terminate():
        return 25
    b2 = cab.decision(models, 6)
    cbp_chroma = 0
    if cab.decision(models, 7):
        cbp_chroma = 2 if cab.decision(models, 8) else 1
    pm = 2 * cab.decision(models, 9) + cab.decision(models, 10)
    return 1 + pm + 4 * cbp_chroma + 12 * b2


def cabac_enc_i4_modes(cab, models, flags):
    for f, rem in flags:
        cab.decision(models, 68, f)
        if not f:  # FL cMax 7, LSB-first (9.3.2.4)
            cab.decision(models, 69, rem & 1)
            cab.decision(models, 69, (rem >> 1) & 1)
            cab.decision(models, 69, (rem >> 2) & 1)


def cabac_dec_i4_modes(cab, models):
    flags = []
    for _ in range(16):
        f = cab.decision(models, 68)
        rem = 0
        if not f:
            rem = cab.decision(models, 69)
            rem |= cab.decision(models, 69) << 1
            rem |= cab.decision(models, 69) << 2
        flags.append((f, rem))
    return flags


def cabac_enc_cmode(cab, models, st, ctx, sid, mbx, mby, cmode):
    inc = st.cmode_inc(ctx, sid, mbx, mby)
    cab.decision(models, 64 + inc, 1 if cmode > 0 else 0)
    if cmode > 0:
        cab.decision(models, 67, 1 if cmode > 1 else 0)
        if cmode > 1:
            cab.decision(models, 67, 1 if cmode > 2 else 0)


def cabac_dec_cmode(cab, models, st, ctx, sid, mbx, mby):
    inc = st.cmode_inc(ctx, sid, mbx, mby)
    if not cab.decision(models, 64 + inc):
        return 0
    if not cab.decision(models, 67):
        return 1
    return 2 if not cab.decision(models, 67) else 3


def cabac_enc_cbp(cab, models, st, ctx, sid, mbx, mby, cbp):
    luma, chroma = cbp & 15, cbp >> 4
    cur = 0
    for blk in range(4):
        b = (luma >> blk) & 1
        inc = st.cbp_luma_inc(ctx, sid, mbx, mby, blk, cur)
        cab.decision(models, 73 + inc, b)
        cur |= b << blk
    inc = st.cbp_chroma_inc(ctx, sid, mbx, mby, 0)
    cab.decision(models, 77 + inc, 1 if chroma != 0 else 0)
    if chroma != 0:
        inc = st.cbp_chroma_inc(ctx, sid, mbx, mby, 1)
        cab.decision(models, 77 + inc, 1 if chroma == 2 else 0)


def cabac_dec_cbp(cab, models, st, ctx, sid, mbx, mby):
    luma = 0
    for blk in range(4):
        inc = st.cbp_luma_inc(ctx, sid, mbx, mby, blk, luma)
        luma |= cab.decision(models, 73 + inc) << blk
    inc = st.cbp_chroma_inc(ctx, sid, mbx, mby, 0)
    chroma = 0
    if cab.decision(models, 77 + inc):
        inc = st.cbp_chroma_inc(ctx, sid, mbx, mby, 1)
        chroma = 2 if cab.decision(models, 77 + inc) else 1
    return luma | (chroma << 4)


def cabac_enc_qp_delta(cab, models, st, delta):
    k = 2 * delta - 1 if delta > 0 else -2 * delta
    inc = 1 if st.last_delta_nz else 0
    if k == 0:
        cab.decision(models, 60 + inc, 0)
    else:
        cab.decision(models, 60 + inc, 1)
        for i in range(1, k):
            cab.decision(models, 62 if i == 1 else 63, 1)
        cab.decision(models, 62 if k == 1 else 63, 0)
    st.last_delta_nz = delta != 0


def cabac_dec_qp_delta(cab, models, st):
    inc = 1 if st.last_delta_nz else 0
    k = 0
    if cab.decision(models, 60 + inc):
        k = 1
        while cab.decision(models, 62 if k == 1 else 63):
            k += 1
            assert k <= 110, "mb_qp_delta runaway"
    delta = (k + 1) // 2 if k % 2 else -(k // 2)
    st.last_delta_nz = delta != 0
    return delta


def cabac_enc_residual(cab, models, cat, coeffs, cbf_inc):
    """coeffs scan-ordered, length = maxNumCoeff. Returns the
    coded_block_flag it wrote."""
    cbf = 1 if any(coeffs) else 0
    cab.decision(models, CABAC_CBF_BASE + CABAC_CAT_OFF_CBF[cat] + cbf_inc,
                 cbf)
    if not cbf:
        return 0
    n = len(coeffs)
    last = max(i for i in range(n) if coeffs[i])
    sig_base = CABAC_SIG_BASE + CABAC_CAT_OFF_SIG[cat]
    last_base = CABAC_LAST_BASE + CABAC_CAT_OFF_SIG[cat]
    for i in range(n - 1):
        inc = min(i, 2) if cat == 3 else i
        s = 1 if coeffs[i] else 0
        cab.decision(models, sig_base + inc, s)
        if s:
            lf = 1 if i == last else 0
            cab.decision(models, last_base + inc, lf)
            if lf:
                break
    abs_base = CABAC_ABS_BASE + CABAC_CAT_OFF_ABS[cat]
    eq1 = gt1 = 0
    for i in range(last, -1, -1):
        c = coeffs[i]
        if not c:
            continue
        v = abs(c) - 1
        inc0 = 0 if gt1 else min(4, 1 + eq1)
        inc_rest = 5 + min(4 - (1 if cat == 3 else 0), gt1)
        pre = min(v, 14)
        for b in range(pre):
            cab.decision(models, abs_base + (inc0 if b == 0 else inc_rest), 1)
        if pre < 14:
            cab.decision(models, abs_base + (inc0 if pre == 0 else inc_rest), 0)
        else:  # UEG0 suffix, bypass (9.3.2.3)
            suf = v - 14
            k = 0
            while suf >= (1 << k):
                cab.bypass(1)
                suf -= 1 << k
                k += 1
            cab.bypass(0)
            while k:
                k -= 1
                cab.bypass((suf >> k) & 1)
        cab.bypass(1 if c < 0 else 0)
        if v == 0:
            eq1 += 1
        else:
            gt1 += 1
    return 1


def cabac_dec_residual(cab, models, cat, n, cbf_inc):
    """Returns (cbf, coeffs list of length n, scan-ordered)."""
    cbf = cab.decision(models,
                       CABAC_CBF_BASE + CABAC_CAT_OFF_CBF[cat] + cbf_inc)
    coeffs = [0] * n
    if not cbf:
        return 0, coeffs
    sig_base = CABAC_SIG_BASE + CABAC_CAT_OFF_SIG[cat]
    last_base = CABAC_LAST_BASE + CABAC_CAT_OFF_SIG[cat]
    sig = [0] * n
    numcoeff = n
    i = 0
    while i < numcoeff - 1:
        inc = min(i, 2) if cat == 3 else i
        if cab.decision(models, sig_base + inc):
            sig[i] = 1
            if cab.decision(models, last_base + inc):
                numcoeff = i + 1
        i += 1
    if numcoeff == n:
        sig[n - 1] = 1  # the last coefficient is implied significant
    else:
        pass  # sig[numcoeff-1] already set when its last-flag fired
    abs_base = CABAC_ABS_BASE + CABAC_CAT_OFF_ABS[cat]
    eq1 = gt1 = 0
    for i in range(numcoeff - 1, -1, -1):
        if not sig[i]:
            continue
        inc0 = 0 if gt1 else min(4, 1 + eq1)
        inc_rest = 5 + min(4 - (1 if cat == 3 else 0), gt1)
        v = 0
        while v < 14 and cab.decision(
                models, abs_base + (inc0 if v == 0 else inc_rest)):
            v += 1
        if v == 14:  # UEG0 suffix
            k = 0
            while cab.bypass():
                v += 1 << k
                k += 1
                assert k <= 30, "UEG0 runaway"
            while k:
                k -= 1
                v += cab.bypass() << k
        level = v + 1
        if cab.bypass():
            level = -level
        coeffs[i] = level
        if v == 0:
            eq1 += 1
        else:
            gt1 += 1
    return 1, coeffs


# ----------------------------------------------------- mirror decoder

def split_nals(data):
    """Annex-B start-code scan -> de-escaped RBSP payloads with their
    nal_unit_type."""
    out = []
    i = 0
    n = len(data)
    while i + 3 < n:
        if data[i] == 0 and data[i + 1] == 0 and \
           (data[i + 2] == 1 or (data[i + 2] == 0 and i + 4 <= n and data[i + 3] == 1)):
            start = i + (3 if data[i + 2] == 1 else 4)
            j = start
            while j + 2 < n and not (data[j] == 0 and data[j + 1] == 0 and
                                     data[j + 2] in (0, 1)):
                j += 1
            end = j if j + 2 < n else n
            raw = data[start:end]
            # strip emulation prevention
            rbsp = bytearray()
            zeros = 0
            for b in raw:
                if zeros >= 2 and b == 3:
                    zeros = 0
                    continue
                rbsp.append(b)
                zeros = zeros + 1 if b == 0 else 0
            out.append((raw[0] & 0x1F, bytes(rbsp[1:])))
            i = end
        else:
            i += 1
    return out


def _last_one_bit(data):
    """Bit index of the final set bit — the rbsp_stop_bit; slice data
    ends when the reader reaches it (more_rbsp_data())."""
    for i in range(len(data) - 1, -1, -1):
        if data[i]:
            b = data[i]
            for k in range(8):
                if b & (1 << k):
                    return i * 8 + (7 - k)
    return 0


def decode_stream(data):
    """Mirror decode of streams this module encodes: returns (y, u, v)
    plane row-lists after deblocking. Baseline IDR CAVLC only; one
    picture, possibly split across several slice NALs."""
    sps = pps = None
    ctx = None
    mbqp = None
    mb_params = None
    cst = None
    next_mb = 0
    for typ, rbsp in split_nals(data):
        r = BitReader(rbsp)
        if typ == 7:
            prof = r.u(8)
            assert prof in (66, 77), f"profile {prof}"
            r.u(16)
            assert r.ue() == 0
            assert r.ue() == 0  # log2_max_frame_num_minus4
            poc = r.ue()
            log2_poc_lsb = 0
            if poc == 0:
                log2_poc_lsb = r.ue() + 4
            else:
                assert poc == 2
            r.ue()  # max_num_ref_frames
            r.u(1)
            wmb = r.ue() + 1
            hmb = r.ue() + 1
            assert r.u(1) == 1  # frame_mbs_only
            r.u(1)
            crop = (0, 0, 0, 0)
            if r.u(1):  # frame_cropping: (l, r, t, b) in 2-px CropUnits
                crop = (r.ue() * 2, r.ue() * 2, r.ue() * 2, r.ue() * 2)
            r.u(1)
            sps = (wmb * 16, hmb * 16, poc, log2_poc_lsb, crop)
        elif typ == 8:
            assert r.ue() == 0 and r.ue() == 0
            cabac = r.u(1)  # entropy_coding_mode_flag
            pic_order = r.u(1)
            assert r.ue() == 0
            r.ue(); r.ue(); r.u(1); r.u(2)
            qp = 26 + r.se()
            r.se()
            chroma_off = r.se()
            dbc = r.u(1)
            r.u(1)
            assert r.u(1) == 0  # redundant_pic_cnt_present (mirror aborts)
            pps = (qp, chroma_off, dbc, pic_order, cabac)
        elif typ == 5:
            if ctx is None:
                ctx = FrameCtx(sps[0], sps[1])
                mbqp = [[0] * (sps[0] // 16) for _ in range(sps[1] // 16)]
                mb_params = [[(0, 0, 0)] * (sps[0] // 16)
                             for _ in range(sps[1] // 16)]
                cst = CabacPicState(sps[0] // 16, sps[1] // 16) \
                    if pps[4] else None
            next_mb = _decode_slice(r, sps, pps, ctx, mbqp, mb_params,
                                    next_mb, cst)
    if ctx is None:
        return None
    deblock(flat(ctx.y), flat(ctx.u), flat(ctx.v), ctx.W, ctx.H, mbqp,
            mb_params, ctx.mb_slice)
    cl, cr, ct, cb = sps[4]
    if cl or cr or ct or cb:
        W, H = ctx.W, ctx.H
        y = [row[cl:W - cr] for row in ctx.y[ct:H - cb]]
        u = [row[cl // 2:(W - cr) // 2] for row in ctx.u[ct // 2:(H - cb) // 2]]
        v = [row[cl // 2:(W - cr) // 2] for row in ctx.v[ct // 2:(H - cb) // 2]]
        return y, u, v
    return ctx.y, ctx.u, ctx.v


def _decode_slice(r, sps, pps, ctx, mbqp, mb_params, expect_mb, cst=None):
    W, H, poc, log2_poc_lsb = sps[0], sps[1], sps[2], sps[3]
    qp0, chroma_off, dbc, pic_order, cabac = pps
    first_mb = r.ue()
    assert first_mb == expect_mb, f"slice starts at {first_mb}, want {expect_mb}"
    sid = first_mb  # any id unique per slice works for the availability map
    st = r.ue()
    assert st in (2, 7)
    assert r.ue() == 0
    r.u(4)  # frame_num
    r.ue()  # idr_pic_id
    if poc == 0:
        r.u(log2_poc_lsb)  # pic_order_cnt_lsb
        if pic_order:
            r.se()  # delta_pic_order_cnt_bottom
    r.u(1); r.u(1)
    qpy = qp0 + r.se()
    deblock_idc = 0
    off_a = off_b = 0
    if dbc:
        deblock_idc = r.ue()
        if deblock_idc != 1:
            off_a = r.se() * 2
            off_b = r.se() * 2
    if cabac:
        return _slice_data_cabac(r, ctx, cst, mbqp, mb_params, sid,
                                 first_mb, qpy, deblock_idc, off_a, off_b,
                                 chroma_off)
    mbs_x, mbs_y = W // 16, H // 16
    last_one = _last_one_bit(r.data)
    mbi = first_mb
    while mbi < mbs_x * mbs_y and r.pos < last_one:
        mby, mbx = mbi // mbs_x, mbi % mbs_x
        mbi += 1
        ctx.mb_slice[mby][mbx] = sid
        mb_params[mby][mbx] = (deblock_idc, off_a, off_b)
        up_ok = ctx.avail_up(mbx * 16, mby * 16, sid)
        left_ok = ctx.avail_left(mbx * 16, mby * 16, sid)
        mb_type = r.ue()
        if mb_type == 25:  # I_PCM
            r.align()
            for j in range(16):
                for i in range(16):
                    ctx.y[mby * 16 + j][mbx * 16 + i] = r.u(8)
            for pl in (ctx.u, ctx.v):
                for j in range(8):
                    for i in range(8):
                        pl[mby * 8 + j][mbx * 8 + i] = r.u(8)
            for by in range(4):
                for bx in range(4):
                    ctx.tc_y[mby * 4 + by][mbx * 4 + bx] = 16
                    ctx.i4mode[mby * 4 + by][mbx * 4 + bx] = -1
            for by in range(2):
                for bx in range(2):
                    ctx.tc_u[mby * 2 + by][mbx * 2 + bx] = 16
                    ctx.tc_v[mby * 2 + by][mbx * 2 + bx] = 16
            mbqp[mby][mbx] = 0
            continue
        if mb_type == 0:  # I_4x4
            flags = []
            for blk in range(16):
                f = r.u(1)
                flags.append((f, 0 if f else r.u(3)))
            cmode = r.ue()
            cbp = CBP_INTRA[r.ue()]
            cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
            if cbp:
                qpy = (qpy + r.se() + 52) % 52  # spec mod-52 (7.4.5)
            mbqp[mby][mbx] = qpy
            qpc = qpc_of(qpy, chroma_off)
            for blk in range(16):
                x, y = _block_xy(mbx, mby, blk)
                gx, gy = x // 4, y // 4
                al = ctx.avail_left(x, y, sid)
                au = ctx.avail_up(x, y, sid)
                predm = ctx.pred_i4_mode(gx, gy, al, au)
                f, rem = flags[blk]
                m = predm if f else (rem if rem < predm else rem + 1)
                ctx.i4mode[gy][gx] = m
                pred = pred4x4(ctx.y, W, H, x, y, m, au, al,
                               ctx.avail_ar(x, y, sid))
                quad = (1 if (x % 16) >= 8 else 0) + (2 if (y % 16) >= 8 else 0)
                if cbp_luma & (1 << quad):
                    zq = decode_block(r, ctx.nc(ctx.tc_y, gx, gy, al, au), 16)
                    ctx.tc_y[gy][gx] = sum(1 for c in zq if c)
                else:
                    zq = [0] * 16
                    ctx.tc_y[gy][gx] = 0
                dqz = [dequant_ac(zq[k], qpy, ZIGZAG[k] // 4, ZIGZAG[k] % 4)
                       for k in range(16)]
                recon_block(ctx.y, x, y, pred, unzigzag(dqz))
            _decode_chroma(r, ctx, mbx, mby, cbp_chroma, cmode, qpc, sid,
                           up_ok, left_ok)
            continue
        # I_16x16: mb_type 1..24
        assert 1 <= mb_type <= 24, f"mb_type {mb_type}"
        mode = (mb_type - 1) % 4
        cbp_chroma = ((mb_type - 1) // 4) % 3
        cbp_luma = 15 * ((mb_type - 1) // 12)
        cmode = r.ue()
        qpy = (qpy + r.se() + 52) % 52  # spec mod-52 (7.4.5)
        mbqp[mby][mbx] = qpy
        qpc = qpc_of(qpy, chroma_off)
        pred = pred_block_nxn(ctx.y, mbx * 16, mby * 16, 16, mode, False,
                              up_ok, left_ok)
        dczz = decode_block(r, ctx.nc(ctx.tc_y, mbx * 4, mby * 4,
                                      left_ok, up_ok), 16)
        dcq = unzigzag(dczz)
        acq = [None] * 16
        for blk in range(16):
            x, y = _block_xy(mbx, mby, blk)
            gx, gy = x // 4, y // 4
            if cbp_luma:
                zq = decode_block(r, ctx.nc(ctx.tc_y, gx, gy,
                                            ctx.avail_left(x, y, sid),
                                            ctx.avail_up(x, y, sid)), 15)
                acq[blk] = zq
                ctx.tc_y[gy][gx] = sum(1 for c in zq if c)
            else:
                acq[blk] = [0] * 15
                ctx.tc_y[gy][gx] = 0
            ctx.i4mode[gy][gx] = -1
        self_recon_i16(ctx, mbx, mby, pred, dcq, acq, cbp_luma, qpy)
        _decode_chroma(r, ctx, mbx, mby, cbp_chroma, cmode, qpc, sid,
                       up_ok, left_ok)
    return mbi


def _decode_chroma(r, ctx, mbx, mby, cbp_chroma, cmode, qpc, sid,
                   up_ok, left_ok):
    dcs = {}
    for pn in 'uv':
        if cbp_chroma:
            z = decode_block(r, -1, 4)
            dcs[pn] = [[z[0], z[1]], [z[2], z[3]]]
        else:
            dcs[pn] = [[0, 0], [0, 0]]
    for pn, grid, plane in (('u', ctx.tc_u, ctx.u), ('v', ctx.tc_v, ctx.v)):
        pred = pred_block_nxn(plane, mbx * 8, mby * 8, 8, cmode, True,
                              up_ok, left_ok)
        acs = [None] * 4
        for blk in range(4):
            bx, by = blk % 2, blk // 2
            gx, gy = mbx * 2 + bx, mby * 2 + by
            if cbp_chroma == 2:
                zq = decode_block(r, ctx.nc(grid, gx, gy,
                    ctx.avail_left(gx * 4, gy * 4, sid, 8),
                    ctx.avail_up(gx * 4, gy * 4, sid, 8)), 15)
                acs[blk] = zq
                grid[gy][gx] = sum(1 for c in zq if c)
            else:
                acs[blk] = [0] * 15
                grid[gy][gx] = 0
        dci = hadamard2(dcs[pn]) if cbp_chroma else [[0, 0], [0, 0]]
        for blk in range(4):
            bx, by = blk % 2, blk // 2
            d = [[0] * 4 for _ in range(4)]
            for k, c in enumerate(acs[blk]):
                z = ZIGZAG[k + 1]
                d[z // 4][z % 4] = dequant_ac(c, qpc, z // 4, z % 4)
            if cbp_chroma:
                d[0][0] = dequant_chroma_dc(dci[by][bx], qpc)
            p = [[pred[by * 4 + j][bx * 4 + i] for i in range(4)] for j in range(4)]
            recon_block(plane, mbx * 8 + bx * 4, mby * 8 + by * 4, p, d)


def _slice_data_cabac(r, ctx, cst, mbqp, mb_params, sid, first_mb, qp_slice,
                      deblock_idc, off_a, off_b, chroma_off):
    """Mirror of the CABAC slice_data() loop: the arithmetic layer of
    _decode_slice, sharing every reconstruction helper."""
    W, H = ctx.W, ctx.H
    mbs_x, mbs_y = W // 16, H // 16
    while r.pos % 8:
        assert r.bit() == 1, "cabac_alignment_one_bit must be 1"
    cab = CabacDec(r)
    models = cabac_init_models(qp_slice)
    cst.last_delta_nz = False
    qpy = qp_slice
    mbi = first_mb
    while True:
        assert mbi < mbs_x * mbs_y, "CABAC slice overruns the picture"
        mby, mbx = mbi // mbs_x, mbi % mbs_x
        ctx.mb_slice[mby][mbx] = sid
        mb_params[mby][mbx] = (deblock_idc, off_a, off_b)
        up_ok = ctx.avail_up(mbx * 16, mby * 16, sid)
        left_ok = ctx.avail_left(mbx * 16, mby * 16, sid)
        mb_type = cabac_dec_mb_type(cab, models, cst, ctx, sid, mbx, mby)
        if mb_type == 25:  # I_PCM: raw samples, engine re-init after
            r.align()
            for j in range(16):
                for i in range(16):
                    ctx.y[mby * 16 + j][mbx * 16 + i] = r.u(8)
            for pl in (ctx.u, ctx.v):
                for j in range(8):
                    for i in range(8):
                        pl[mby * 8 + j][mbx * 8 + i] = r.u(8)
            for by in range(4):
                for bx in range(4):
                    ctx.i4mode[mby * 4 + by][mbx * 4 + bx] = -1
            mbqp[mby][mbx] = 0
            cst.set_pcm(mbx, mby)
            cab = CabacDec(r)
        elif mb_type == 0:  # I_NxN
            cst.kind[mby][mbx] = 0
            flags = cabac_dec_i4_modes(cab, models)
            cmode = cabac_dec_cmode(cab, models, cst, ctx, sid, mbx, mby)
            cst.cmode[mby][mbx] = cmode
            cbp = cabac_dec_cbp(cab, models, cst, ctx, sid, mbx, mby)
            cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
            cst.cbp_luma[mby][mbx] = cbp_luma
            cst.cbp_chroma[mby][mbx] = cbp_chroma
            if cbp:
                qpy = (qpy + cabac_dec_qp_delta(cab, models, cst) + 52) % 52
            else:
                cst.last_delta_nz = False
            mbqp[mby][mbx] = qpy
            qpc = qpc_of(qpy, chroma_off)
            for blk in range(16):
                x, y = _block_xy(mbx, mby, blk)
                gx, gy = x // 4, y // 4
                al = ctx.avail_left(x, y, sid)
                au = ctx.avail_up(x, y, sid)
                predm = ctx.pred_i4_mode(gx, gy, al, au)
                f, rem = flags[blk]
                m = predm if f else (rem if rem < predm else rem + 1)
                ctx.i4mode[gy][gx] = m
                pred = pred4x4(ctx.y, W, H, x, y, m, au, al,
                               ctx.avail_ar(x, y, sid))
                quad = (1 if (x % 16) >= 8 else 0) + (2 if (y % 16) >= 8 else 0)
                if cbp_luma & (1 << quad):
                    cbf, zq = cabac_dec_residual(
                        cab, models, 2, 16,
                        cst.cbf_y_inc(ctx, sid, mbx, mby, gx, gy))
                    cst.cbf_y[gy][gx] = cbf
                else:
                    zq = [0] * 16
                dqz = [dequant_ac(zq[k], qpy, ZIGZAG[k] // 4, ZIGZAG[k] % 4)
                       for k in range(16)]
                recon_block(ctx.y, x, y, pred, unzigzag(dqz))
            _decode_chroma_cabac(cab, models, cst, ctx, mbx, mby, cbp_chroma,
                                 cmode, qpc, sid, up_ok, left_ok)
        else:  # I_16x16
            assert 1 <= mb_type <= 24, f"mb_type {mb_type}"
            mode = (mb_type - 1) % 4
            cbp_chroma = ((mb_type - 1) // 4) % 3
            cbp_luma = 15 * ((mb_type - 1) // 12)
            cst.kind[mby][mbx] = 1
            cst.cbp_luma[mby][mbx] = cbp_luma
            cst.cbp_chroma[mby][mbx] = cbp_chroma
            cmode = cabac_dec_cmode(cab, models, cst, ctx, sid, mbx, mby)
            cst.cmode[mby][mbx] = cmode
            qpy = (qpy + cabac_dec_qp_delta(cab, models, cst) + 52) % 52
            mbqp[mby][mbx] = qpy
            qpc = qpc_of(qpy, chroma_off)
            pred = pred_block_nxn(ctx.y, mbx * 16, mby * 16, 16, mode, False,
                                  up_ok, left_ok)
            cbf, dczz = cabac_dec_residual(
                cab, models, 0, 16, cst.cbf_dc_y_inc(ctx, sid, mbx, mby))
            cst.cbf_dc_y[mby][mbx] = cbf
            dcq = unzigzag(dczz)
            acq = [None] * 16
            for blk in range(16):
                x, y = _block_xy(mbx, mby, blk)
                gx, gy = x // 4, y // 4
                if cbp_luma:
                    cbf, zq = cabac_dec_residual(
                        cab, models, 1, 15,
                        cst.cbf_y_inc(ctx, sid, mbx, mby, gx, gy))
                    cst.cbf_y[gy][gx] = cbf
                    acq[blk] = zq
                else:
                    acq[blk] = [0] * 15
                ctx.i4mode[gy][gx] = -1
            self_recon_i16(ctx, mbx, mby, pred, dcq, acq, cbp_luma, qpy)
            _decode_chroma_cabac(cab, models, cst, ctx, mbx, mby, cbp_chroma,
                                 cmode, qpc, sid, up_ok, left_ok)
        mbi += 1
        if cab.terminate():  # end_of_slice_flag
            break
    return mbi


def _decode_chroma_cabac(cab, models, cst, ctx, mbx, mby, cbp_chroma, cmode,
                         qpc, sid, up_ok, left_ok):
    dcs = {}
    for pn in 'uv':
        if cbp_chroma:
            cbf, z = cabac_dec_residual(
                cab, models, 3, 4, cst.cbf_dc_c_inc(ctx, sid, mbx, mby, pn))
            cst.cbf_dc_c[pn][mby][mbx] = cbf
            dcs[pn] = [[z[0], z[1]], [z[2], z[3]]]
        else:
            dcs[pn] = [[0, 0], [0, 0]]
    for pn, plane in (('u', ctx.u), ('v', ctx.v)):
        pred = pred_block_nxn(plane, mbx * 8, mby * 8, 8, cmode, True,
                              up_ok, left_ok)
        acs = [None] * 4
        for blk in range(4):
            bx, by = blk % 2, blk // 2
            gx, gy = mbx * 2 + bx, mby * 2 + by
            if cbp_chroma == 2:
                cbf, zq = cabac_dec_residual(
                    cab, models, 4, 15,
                    cst.cbf_c_inc(ctx, sid, mbx, mby, gx, gy, pn))
                cst.cbf_c[pn][gy][gx] = cbf
                acs[blk] = zq
            else:
                acs[blk] = [0] * 15
        dci = hadamard2(dcs[pn]) if cbp_chroma else [[0, 0], [0, 0]]
        for blk in range(4):
            bx, by = blk % 2, blk // 2
            d = [[0] * 4 for _ in range(4)]
            for k, c in enumerate(acs[blk]):
                z = ZIGZAG[k + 1]
                d[z // 4][z % 4] = dequant_ac(c, qpc, z // 4, z % 4)
            if cbp_chroma:
                d[0][0] = dequant_chroma_dc(dci[by][bx], qpc)
            p = [[pred[by * 4 + j][bx * 4 + i] for i in range(4)] for j in range(4)]
            recon_block(plane, mbx * 8 + bx * 4, mby * 8 + by * 4, p, d)


# -------------------------------------------------------- self checks

MASK64 = (1 << 64) - 1


def mix64(x):
    x = (x + 0x9E3779B97F4A7C15) & MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK64
    return x ^ (x >> 31)


def pattern(seed, w, h):
    """GenImages.pattern verbatim (the cross-codec content anchor)."""
    return [[min(mix64((seed * 1000003 + (y // 4) * 131 + (x // 4)) & MASK64) & 0xFF, 250)
             for x in range(w)] for y in range(h)]


def halved(px):
    """Simple 2x2 mean downsample for the chroma planes."""
    h, w = len(px), len(px[0])
    return [[(px[2 * j][2 * i] + px[2 * j][2 * i + 1] +
              px[2 * j + 1][2 * i] + px[2 * j + 1][2 * i + 1] + 2) >> 2
             for i in range(w // 2)] for j in range(h // 2)]


def encode_ydata(seed, W, H, qp, plan, deblock_idc=0, qp_deltas=None,
                 slices=1, deblock_off2=(0, 0), cabac=False):
    """Pattern-content frame through the encoder; returns (annexb bytes,
    recon planes)."""
    y = pattern(seed, W, H)
    u = [[128] * (W // 2) for _ in range(H // 2)]
    v = halved(pattern(seed + 7, W, H))
    body, ctx, _ = encode_frame(y, u, v, W, H, qp, plan,
                                deblock_idc=deblock_idc, qp_deltas=qp_deltas,
                                slices=slices, deblock_off2=deblock_off2,
                                cabac=cabac)
    return (write_sps(W, H, profile=77 if cabac else 66) +
            write_pps(26, cabac=cabac) + body,
            (ctx.y, ctx.u, ctx.v), (y, u, v))


def _psnr(a, b):
    import math
    se = n = 0
    for ra, rb in zip(a, b):
        for xa, xb in zip(ra, rb):
            se += (xa - xb) ** 2
            n += 1
    return 99.0 if se == 0 else 10 * math.log10(255 * 255 * n / se)


def selftest():
    _fuzz_cavlc()
    W = H = 48
    plans = {
        'pcm': lambda mbx, mby: ('pcm',),
        'i16': lambda mbx, mby: ('i16', (mbx + mby * 3) % 4, (mbx + mby) % 4),
        'i4': lambda mbx, mby: ('i4', [(mbx * 16 + mby * 5 + k) % 9 for k in range(16)],
                                (mbx + mby) % 4),
        'mixed': lambda mbx, mby: [('pcm',), ('i16', (mbx + mby) % 4, mby % 4),
                                   ('i4', [(mbx + k) % 9 for k in range(16)], mbx % 4)
                                   ][(mbx + mby) % 3],
    }
    for name, plan in plans.items():
        for qp in (8, 20, 30):
            for dbi in (0, 1):
                for slices in (1, 3):
                    # idc 2 (filter within slices only) + nonzero offsets
                    # join the matrix via the slice count
                    idc = 2 if (dbi == 0 and slices == 3) else dbi
                    offs = (-2, 1) if idc != 1 and qp == 20 else (0, 0)
                    stream, recon, src = encode_ydata(3, W, H, qp, plan,
                                                      deblock_idc=idc,
                                                      qp_deltas={4: 2, 7: -3},
                                                      slices=slices,
                                                      deblock_off2=offs)
                    got = decode_stream(stream)
                    for pi, pname in enumerate('yuv'):
                        assert got[pi] == recon[pi], \
                            f"{name} qp={qp} dbi={dbi} s={slices}: {pname} recon mismatch"
                    p = _psnr(got[0], src[0])
                    floor = 99 if name == 'pcm' else \
                        (40 if qp <= 8 else 28 if qp <= 20 else 20)
                    assert p >= floor, f"{name} qp={qp}: PSNR {p:.1f} < {floor}"
                    print(f"  {name:5s} qp={qp:2d} deblock={1-dbi} slices={slices} "
                          f"PSNR={p:5.1f} bytes={len(stream)} OK")
    # same matrix through the CABAC entropy layer; the pixel recon must
    # equal the CAVLC recon of the same plan/qp (entropy-layer identity:
    # both code the identical quantized coefficients)
    for name, plan in plans.items():
        for qp in (8, 20, 30):
            for slices in (1, 3):
                cv_stream, cv_recon, _ = encode_ydata(
                    3, W, H, qp, plan, deblock_idc=0,
                    qp_deltas={4: 2, 7: -3}, slices=slices)
                cb_stream, cb_recon, _ = encode_ydata(
                    3, W, H, qp, plan, deblock_idc=0,
                    qp_deltas={4: 2, 7: -3}, slices=slices, cabac=True)
                got = decode_stream(cb_stream)
                for pi, pname in enumerate('yuv'):
                    assert got[pi] == cb_recon[pi], \
                        f"cabac {name} qp={qp} s={slices}: {pname} mismatch"
                    assert got[pi] == cv_recon[pi], \
                        f"cabac-vs-cavlc {name} qp={qp} s={slices}: {pname}"
                r = len(cb_stream) / len(cv_stream)
                print(f"  cabac {name:5s} qp={qp:2d} slices={slices} "
                      f"bytes={len(cb_stream)} ({r:4.2f}x cavlc) OK")
    print("h264_codec: encoder <-> mirror-decoder round-trip passes")


if __name__ == "__main__":
    selftest()

#!/usr/bin/env python3
"""Vorbis I codec pair (encoder + reference decoder), spec-derived from
the public Xiph Vorbis I specification — the cross-implementation anchor
for the Scala decoder (graft/functions/Vorbis.scala), exactly the role
tools/h264_codec.py plays for H.264.

Encoder scope (fixture subset, all fully valid Vorbis I):
  - mono or stereo, one or two blocksizes (window switching via two
    modes), floor type 1 with arbitrary post curves, residue types
    0/1/2, square-polar channel coupling (stereo), codebook lookup
    types 0/1/2, sparse and ordered codebooks, multi-packet pages and
    packets spanning pages.
Decoder scope: general Vorbis I with floor type 1 (floor 0, the legacy
LSP floor, is rejected diagnosably — crawl-era encoders emit floor 1).

The only non-in-stream constant is floor1_inverse_dB_table, which this
implementation derives from its closed form table[i] = 10^((i-255)*7/256)
(validated: i=0 -> 1.0649863e-7, the spec's published first entry;
i=255 -> 1.0).

Self-test: `python3 tools/vorbis_codec.py selftest` round-trips a config
sweep and asserts SNR. `gen` writes the committed corpus for VorbisSpec.
"""
import base64
import math
import os
import random
import struct
import sys

# ------------------------------------------------------------ bit I/O
# Vorbis packs bits LSB-first within bytes.


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.bitpos = 0

    def write(self, value, nbits):
        for i in range(nbits):
            if self.bitpos == 0:
                self.bytes.append(0)
            if (value >> i) & 1:
                self.bytes[-1] |= 1 << self.bitpos
            self.bitpos = (self.bitpos + 1) & 7

    def data(self):
        return bytes(self.bytes)


class BitReader:
    def __init__(self, data):
        self.data = data
        self.pos = 0  # bit position

    def read(self, nbits):
        v = 0
        for i in range(nbits):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise EOFError("packet underrun")
            if (self.data[byte] >> (self.pos & 7)) & 1:
                v |= 1 << i
            self.pos += 1
        return v


def ilog(x):
    r = 0
    while x > 0:
        r += 1
        x >>= 1
    return r


def float32_pack(x):
    if x == 0:
        return 0
    sign = 0
    if x < 0:
        sign = 1 << 31
        x = -x
    exp = int(math.floor(math.log2(x)))
    mant = int(round(x / (2.0 ** (exp - 20))))
    if mant >= 1 << 21:
        mant >>= 1
        exp += 1
    return sign | ((exp - 20 + 788) << 21) | (mant & 0x1FFFFF)


def float32_unpack(v):
    mant = v & 0x1FFFFF
    sign = -1.0 if v & 0x80000000 else 1.0
    exp = (v >> 21) & 0x3FF
    return sign * mant * (2.0 ** (exp - 788))


# ------------------------------------------------------------ Huffman


def assign_codewords(lengths):
    """Canonical Vorbis codeword assignment: entries in order take the
    lowest available leaf at their depth. lengths: list with 0 = unused.
    Returns {entry: (codeword, len)} with codeword MSB-first."""
    codes = {}
    available = [0] * 33
    first = True
    count_used = sum(1 for l in lengths if l > 0)
    for e, l in enumerate(lengths):
        if l <= 0:
            continue
        if first:
            codes[e] = (0, l)
            for i in range(1, l + 1):
                available[i] = 1 << (32 - i)
            first = False
            continue
        z = l
        while z > 0 and available[z] == 0:
            z -= 1
        assert z > 0, "over-subscribed codebook"
        res = available[z]
        available[z] = 0
        codes[e] = (res >> (32 - l), l)
        if z != l:
            for y in range(l, z, -1):
                available[y] = res + (1 << (32 - y))
    if count_used == 1:
        # single-entry books: one 1-bit codeword per spec errata
        e = next(e for e, l in enumerate(lengths) if l > 0)
        codes = {e: (0, lengths[e])}
    return codes


class Codebook:
    """Both directions: parse from a BitReader, or build + serialize."""

    def __init__(self, dims, lengths, lookup_type=0, min_v=0.0, delta_v=0.0,
                 value_bits=0, sequence_p=0, multiplicands=None, sparse=False,
                 ordered=False):
        self.dims = dims
        self.lengths = lengths
        self.entries = len(lengths)
        self.lookup_type = lookup_type
        self.min_v = min_v
        self.delta_v = delta_v
        self.value_bits = value_bits
        self.sequence_p = sequence_p
        self.multiplicands = multiplicands or []
        self.sparse = sparse
        self.ordered = ordered
        self.codes = assign_codewords(lengths)
        # decode map: (len, code) -> entry
        self.dec = {(l, c): e for e, (c, l) in self.codes.items()}

    def lookup_values(self):
        if self.lookup_type == 1:
            lv = 0
            while (lv + 1) ** self.dims <= self.entries:
                lv += 1
            return lv
        return self.entries * self.dims

    def vq(self, entry):
        """VQ vector for an entry (lookup types 1/2)."""
        out = []
        last = 0.0
        if self.lookup_type == 1:
            lv = self.lookup_values()
            div = 1
            for _ in range(self.dims):
                off = (entry // div) % lv
                v = self.multiplicands[off] * self.delta_v + self.min_v + last
                out.append(v)
                if self.sequence_p:
                    last = v
                div *= lv
        else:
            for i in range(self.dims):
                v = (self.multiplicands[entry * self.dims + i] * self.delta_v
                     + self.min_v + last)
                out.append(v)
                if self.sequence_p:
                    last = v
        return out

    def write(self, w):
        w.write(0x564342, 24)
        w.write(self.dims, 16)
        w.write(self.entries, 24)
        w.write(1 if self.ordered else 0, 1)
        if self.ordered:
            cur_len = self.lengths[0]
            w.write(cur_len - 1, 5)
            i = 0
            while i < self.entries:
                j = i
                while j < self.entries and self.lengths[j] == cur_len:
                    j += 1
                w.write(j - i, ilog(self.entries - i))
                i = j
                cur_len += 1
        else:
            w.write(1 if self.sparse else 0, 1)
            for l in self.lengths:
                if self.sparse:
                    if l > 0:
                        w.write(1, 1)
                        w.write(l - 1, 5)
                    else:
                        w.write(0, 1)
                else:
                    w.write(l - 1, 5)
        w.write(self.lookup_type, 4)
        if self.lookup_type in (1, 2):
            w.write(float32_pack(self.min_v), 32)
            w.write(float32_pack(self.delta_v), 32)
            w.write(self.value_bits - 1, 4)
            w.write(self.sequence_p, 1)
            for m in self.multiplicands:
                w.write(m, self.value_bits)

    @staticmethod
    def parse(r):
        assert r.read(24) == 0x564342, "codebook sync lost"
        dims = r.read(16)
        entries = r.read(24)
        ordered = r.read(1)
        lengths = []
        if ordered:
            cur_len = r.read(5) + 1
            while len(lengths) < entries:
                num = r.read(ilog(entries - len(lengths)))
                lengths.extend([cur_len] * num)
                cur_len += 1
        else:
            sparse = r.read(1)
            for _ in range(entries):
                if sparse:
                    lengths.append(r.read(5) + 1 if r.read(1) else 0)
                else:
                    lengths.append(r.read(5) + 1)
        lt = r.read(4)
        cb = Codebook(dims, lengths, lookup_type=lt)
        if lt in (1, 2):
            cb.min_v = float32_unpack(r.read(32))
            cb.delta_v = float32_unpack(r.read(32))
            cb.value_bits = r.read(4) + 1
            cb.sequence_p = r.read(1)
            lv = cb.lookup_values()
            cb.multiplicands = [r.read(cb.value_bits) for _ in range(lv)]
        elif lt != 0:
            raise ValueError("reserved lookup type")
        return cb

    def encode_entry(self, w, entry):
        code, l = self.codes[entry]
        for i in range(l - 1, -1, -1):  # MSB-first on the wire
            w.write((code >> i) & 1, 1)

    def decode_entry(self, r):
        code, l = 0, 0
        while True:
            code = (code << 1) | r.read(1)
            l += 1
            e = self.dec.get((l, code))
            if e is not None:
                return e
            if l > 32:
                raise ValueError("codeword desync")


# ------------------------------------------------------------ floor 0

def bark(x):
    """Spec 6.2.3: bark(x) = 13.1 atan(.00074x) + 2.24 atan(.0000000185x^2)
    + .0001x."""
    return (13.1 * math.atan(0.00074 * x)
            + 2.24 * math.atan(0.0000000185 * x * x) + 0.0001 * x)


class Floor0:
    """Floor type 0 — the legacy LSP (Line Spectral Pair) floor (spec 6.2).
    The curve is |H(e^{jw})|-style: two products p,q over the cosines of
    the decoded coefficients, evaluated on a bark-warped frequency map,
    mapped through exp(.11512925 * (amp*off/((2^bits-1) sqrt(p+q)) - off)).
    The p/q product transcription is validated in selftest against a
    DIRECT complex-polynomial evaluation of the LSP factorization
    (P(z) = (1 -+ z^-1) prod(1 - 2cos(t)z^-1 + z^-2)): p = |P|^2/4,
    q = |Q|^2/4 — an independent route to the same numbers."""

    def __init__(self, order, rate, bark_map_size, amp_bits, amp_offset,
                 book_list):
        self.order = order
        self.rate = rate
        self.bark_map_size = bark_map_size
        self.amp_bits = amp_bits
        self.amp_offset = amp_offset
        self.book_list = book_list
        self._maps = {}

    def write(self, w):
        w.write(0, 16)
        w.write(self.order, 8)
        w.write(self.rate, 16)
        w.write(self.bark_map_size, 16)
        w.write(self.amp_bits, 6)
        w.write(self.amp_offset, 8)
        w.write(len(self.book_list) - 1, 4)
        for b in self.book_list:
            w.write(b, 8)

    @staticmethod
    def parse(r, books):
        order = r.read(8)
        rate = r.read(16)
        bark_map_size = r.read(16)
        amp_bits = r.read(6)
        amp_offset = r.read(8)
        book_list = [r.read(8) for _ in range(r.read(4) + 1)]
        assert order >= 1 and rate >= 1 and bark_map_size >= 1, "floor0 params"
        for b in book_list:
            assert b < len(books) and books[b].lookup_type != 0, \
                "floor0 book list"
        return Floor0(order, rate, bark_map_size, amp_bits, amp_offset,
                      book_list)

    def bark_map(self, n):
        """map[i] for i in 0..n-1 (spec 6.2.3 step 1), cached per n."""
        m = self._maps.get(n)
        if m is None:
            c = self.bark_map_size / bark(0.5 * self.rate)
            m = [min(self.bark_map_size - 1,
                     int(math.floor(bark(0.5 * self.rate * i / n) * c)))
                 for i in range(n)]
            self._maps[n] = m
        return m

    def decode_header(self, r, books):
        """(amplitude, coefficients) or None (amplitude 0 = unvoiced)."""
        amplitude = r.read(self.amp_bits)
        if amplitude <= 0:
            return None
        booknumber = r.read(ilog(len(self.book_list)))
        assert booknumber < len(self.book_list), "floor0 book number"
        b = books[self.book_list[booknumber]]
        coeffs = []
        last = 0.0
        while len(coeffs) < self.order:
            vec = [v + last for v in b.vq(b.decode_entry(r))]
            last = vec[-1]
            coeffs.extend(vec)
        return (amplitude, coeffs)

    def curve(self, data, n2):
        """Synthesized curve (length n2) per spec 6.2.3 step 2; run-shared
        over equal bark-map entries."""
        amplitude, coeffs = data
        m = self.bark_map(n2)
        cosc = [math.cos(c) for c in coeffs[:self.order]]
        scale = (1 << self.amp_bits) - 1
        out = [0.0] * n2
        i = 0
        while i < n2:
            k = m[i]
            cw = math.cos(math.pi * k / self.bark_map_size)
            if self.order % 2 == 1:
                p = 1.0 - cw * cw
                for j in range((self.order - 1) // 2):
                    d = cosc[2 * j + 1] - cw
                    p *= 4.0 * d * d
                q = 0.25
                for j in range((self.order + 1) // 2):
                    d = cosc[2 * j] - cw
                    q *= 4.0 * d * d
            else:
                p = (1.0 - cw) / 2.0
                q = (1.0 + cw) / 2.0
                for j in range(self.order // 2):
                    d = cosc[2 * j + 1] - cw
                    p *= 4.0 * d * d
                    d = cosc[2 * j] - cw
                    q *= 4.0 * d * d
            pq = p + q
            val = 0.0 if pq <= 0 else math.exp(
                0.11512925 * (amplitude * self.amp_offset
                              / (scale * math.sqrt(pq)) - self.amp_offset))
            while i < n2 and m[i] == k:
                out[i] = val
                i += 1
        return out


def floor0_pq_direct(coeffs, order, omega):
    """Independent p/q via the LSP polynomial factorization evaluated as
    complex products at z = e^{j omega} — validates the spec-pseudocode
    transcription in Floor0.curve (selftest)."""
    z = complex(math.cos(omega), -math.sin(omega))  # z^-1
    z2 = z * z
    if order % 2 == 1:
        P = 1 - z2
        Q = complex(1.0)
        for j in range((order - 1) // 2):
            P *= 1 - 2 * math.cos(coeffs[2 * j + 1]) * z + z2
        for j in range((order + 1) // 2):
            Q *= 1 - 2 * math.cos(coeffs[2 * j]) * z + z2
    else:
        P = 1 - z
        Q = 1 + z
        for j in range(order // 2):
            P *= 1 - 2 * math.cos(coeffs[2 * j + 1]) * z + z2
            Q *= 1 - 2 * math.cos(coeffs[2 * j]) * z + z2
    return abs(P) ** 2 / 4.0, abs(Q) ** 2 / 4.0


def floor0_pq_spec(coeffs, order, omega):
    """The spec-pseudocode p/q (same code shape as Floor0.curve)."""
    cw = math.cos(omega)
    cosc = [math.cos(c) for c in coeffs[:order]]
    if order % 2 == 1:
        p = 1.0 - cw * cw
        for j in range((order - 1) // 2):
            d = cosc[2 * j + 1] - cw
            p *= 4.0 * d * d
        q = 0.25
        for j in range((order + 1) // 2):
            d = cosc[2 * j] - cw
            q *= 4.0 * d * d
    else:
        p = (1.0 - cw) / 2.0
        q = (1.0 + cw) / 2.0
        for j in range(order // 2):
            d = cosc[2 * j + 1] - cw
            p *= 4.0 * d * d
            d = cosc[2 * j] - cw
            q *= 4.0 * d * d
    return p, q


# ------------------------------------------------------------ floor 1

INV_DB = [10.0 ** ((i - 255) * 7.0 / 256.0) for i in range(256)]
FLOOR1_RANGES = [256, 128, 86, 64]


def render_point(x0, y0, x1, y1, x):
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    err = ady * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def render_line(x0, y0, x1, y1, v, n):
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    base = abs(dy) // adx * (1 if dy >= 0 else -1)  # trunc toward zero
    x = x0
    y = y0
    err = 0
    sy = base + 1 if dy >= 0 else base - 1
    ady -= abs(base) * adx
    if x < n:
        v[x] = y
    for x in range(x0 + 1, min(x1, n)):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        v[x] = y


class Floor1:
    def __init__(self, partitions, class_list, class_dims, class_subs,
                 class_master, sub_books, multiplier, rangebits, xs):
        self.partitions = partitions
        self.class_list = class_list
        self.class_dims = class_dims
        self.class_subs = class_subs
        self.class_master = class_master
        self.sub_books = sub_books
        self.multiplier = multiplier
        self.rangebits = rangebits
        self.xs = xs  # full X list incl. the leading 0 and 1<<rangebits

    def posts(self):
        return len(self.xs)

    def write(self, w):
        w.write(1, 16)
        w.write(self.partitions, 5)
        for c in self.class_list:
            w.write(c, 4)
        mx = max(self.class_list) if self.class_list else -1
        for i in range(mx + 1):
            w.write(self.class_dims[i] - 1, 3)
            w.write(self.class_subs[i], 2)
            if self.class_subs[i] > 0:
                w.write(self.class_master[i], 8)
            for k in range(1 << self.class_subs[i]):
                w.write(self.sub_books[i][k] + 1, 8)
        w.write(self.multiplier - 1, 2)
        w.write(self.rangebits, 4)
        for x in self.xs[2:]:
            w.write(x, self.rangebits)

    @staticmethod
    def parse(r):
        partitions = r.read(5)
        class_list = [r.read(4) for _ in range(partitions)]
        mx = max(class_list) if class_list else -1
        dims = []
        subs = []
        master = []
        sub_books = []
        for _ in range(mx + 1):
            dims.append(r.read(3) + 1)
            s = r.read(2)
            subs.append(s)
            master.append(r.read(8) if s > 0 else -1)
            sub_books.append([r.read(8) - 1 for _ in range(1 << s)])
        multiplier = r.read(2) + 1
        rangebits = r.read(4)
        xs = [0, 1 << rangebits]
        for i in range(partitions):
            for _ in range(dims[class_list[i]]):
                xs.append(r.read(rangebits))
        return Floor1(partitions, class_list, dims, subs, master, sub_books,
                      multiplier, rangebits, xs)

    def decode_header(self, r, books):
        """Read the per-packet floor data; returns post Y list or None
        (unvoiced)."""
        if r.read(1) == 0:
            return None
        rng = FLOOR1_RANGES[self.multiplier - 1]
        ys = [r.read(ilog(rng - 1)), r.read(ilog(rng - 1))]
        for i in range(self.partitions):
            cls = self.class_list[i]
            cdim = self.class_dims[cls]
            cbits = self.class_subs[cls]
            csub = (1 << cbits) - 1
            cval = 0
            if cbits > 0:
                cval = books[self.class_master[cls]].decode_entry(r)
            for _ in range(cdim):
                book = self.sub_books[cls][cval & csub]
                cval >>= cbits
                ys.append(books[book].decode_entry(r) if book >= 0 else 0)
        return ys

    def curve(self, ys, n2):
        """Synthesize the floor curve (length n2) from decoded post Ys —
        the spec's amplitude fit + line render, all-integer."""
        rng = FLOOR1_RANGES[self.multiplier - 1]
        posts = self.posts()
        final_y = [0] * posts
        step2 = [False] * posts
        final_y[0] = ys[0]
        final_y[1] = ys[1]
        step2[0] = step2[1] = True
        for i in range(2, posts):
            lo = low_neighbor(self.xs, i)
            hi = high_neighbor(self.xs, i)
            predicted = render_point(self.xs[lo], final_y[lo],
                                     self.xs[hi], final_y[hi], self.xs[i])
            val = ys[i]
            highroom = rng - predicted
            lowroom = predicted
            room = 2 * (highroom if highroom < lowroom else lowroom)
            if val != 0:
                step2[lo] = True
                step2[hi] = True
                step2[i] = True
                if val >= room:
                    if highroom > lowroom:
                        final_y[i] = val - lowroom + predicted
                    else:
                        final_y[i] = predicted - val + highroom - 1
                else:
                    if val & 1:
                        final_y[i] = predicted - (val + 1) // 2
                    else:
                        final_y[i] = predicted + val // 2
            else:
                step2[i] = False
                final_y[i] = predicted
        # clamp, sort by X, render
        order = sorted(range(posts), key=lambda i: self.xs[i])
        fy = [max(0, min(rng - 1, y)) for y in final_y]
        out = [0] * n2
        hx = 0
        hy = 0
        lx = 0
        ly = fy[order[0]] * self.multiplier
        for j in order[1:]:
            if not step2[j]:
                continue
            hx = self.xs[j]
            hy = fy[j] * self.multiplier
            if lx < n2:
                render_line(lx, ly, hx, hy, out, n2)
            lx, ly = hx, hy
        if hx < n2:
            render_line(hx, hy, n2, hy, out, n2)
        return [INV_DB[min(255, y)] for y in out]


def low_neighbor(xs, i):
    best = -1
    for j in range(i):
        if xs[j] < xs[i] and (best < 0 or xs[j] > xs[best]):
            best = j
    return best


def high_neighbor(xs, i):
    best = -1
    for j in range(i):
        if xs[j] > xs[i] and (best < 0 or xs[j] < xs[best]):
            best = j
    return best


# ------------------------------------------------------------ residue


class Residue:
    def __init__(self, rtype, begin, end, psize, classifications, classbook,
                 cascade, books):
        self.rtype = rtype
        self.begin = begin
        self.end = end
        self.psize = psize
        self.classifications = classifications
        self.classbook = classbook
        self.cascade = cascade
        self.books = books  # [class][pass] -> book or -1

    def write(self, w):
        w.write(self.rtype, 16)
        w.write(self.begin, 24)
        w.write(self.end, 24)
        w.write(self.psize - 1, 24)
        w.write(self.classifications - 1, 6)
        w.write(self.classbook, 8)
        for c in self.cascade:
            w.write(c & 7, 3)
            if c >> 3:
                w.write(1, 1)
                w.write(c >> 3, 5)
            else:
                w.write(0, 1)
        for i in range(self.classifications):
            for p in range(8):
                if self.cascade[i] & (1 << p):
                    w.write(self.books[i][p], 8)

    @staticmethod
    def parse(r, rtype):
        begin = r.read(24)
        end = r.read(24)
        psize = r.read(24) + 1
        classifications = r.read(6) + 1
        classbook = r.read(8)
        cascade = []
        for _ in range(classifications):
            low = r.read(3)
            high = r.read(5) if r.read(1) else 0
            cascade.append((high << 3) | low)
        books = []
        for i in range(classifications):
            row = []
            for p in range(8):
                row.append(r.read(8) if cascade[i] & (1 << p) else -1)
            books.append(row)
        return Residue(rtype, begin, end, psize, classifications, classbook,
                       cascade, books)

    def decode(self, r, books, do_not_decode, n2):
        """Decode residue vectors for `len(do_not_decode)` channels of
        half-block size n2. Returns list of float lists."""
        ch = len(do_not_decode)
        if self.rtype == 2:
            vec = self._decode_core(r, books, [all(do_not_decode)],
                                    n2 * ch)[0]
            return [[vec[k * ch + j] for k in range(n2)] for j in range(ch)]
        return self._decode_core(r, books, do_not_decode, n2)

    def _decode_core(self, r, books, do_not_decode, vlen):
        ch = len(do_not_decode)
        out = [[0.0] * vlen for _ in range(ch)]
        begin = min(self.begin, vlen)
        end = min(self.end, vlen)
        n_read = end - begin
        if n_read <= 0:
            return out
        cb = books[self.classbook]
        pts = n_read // self.psize
        cls = [[0] * pts for _ in range(ch)]
        for pas in range(8):
            pc = 0
            while pc < pts:
                if pas == 0:
                    for j in range(ch):
                        if do_not_decode[j]:
                            continue
                        temp = cb.decode_entry(r)
                        for i in range(cb.dims - 1, -1, -1):
                            if pc + i < pts:
                                cls[j][pc + i] = temp % self.classifications
                            temp //= self.classifications
                for i in range(cb.dims):
                    if pc >= pts:
                        break
                    for j in range(ch):
                        if do_not_decode[j]:
                            continue
                        c = cls[j][pc]
                        if not (self.cascade[c] & (1 << pas)):
                            continue
                        book = books[self.books[c][pas]]
                        off = begin + pc * self.psize
                        if self.rtype == 0:
                            step = self.psize // book.dims
                            for k in range(step):
                                vec = book.vq(book.decode_entry(r))
                                for l in range(book.dims):
                                    out[j][off + k + l * step] += vec[l]
                        else:  # types 1 and 2 share the inner loop
                            k = 0
                            while k < self.psize:
                                vec = book.vq(book.decode_entry(r))
                                for l in range(book.dims):
                                    out[j][off + k] += vec[l]
                                    k += 1
                    pc += 1
        return out


# ------------------------------------------------------------ MDCT

_mdct_cache = {}


def mdct_cos(n):
    key = n
    if key not in _mdct_cache:
        _mdct_cache[key] = [[math.cos(math.pi / (2 * n) * (2 * j + 1 + n // 2)
                                      * (2 * k + 1))
                             for k in range(n // 2)] for j in range(n)]
    return _mdct_cache[key]


def imdct(spec, n):
    """Direct-sum IMDCT (reference implementation; O(n^2) is fine for
    corpus blocksizes)."""
    cos = mdct_cos(n)
    return [sum(spec[k] * cos[j][k] for k in range(n // 2))
            for j in range(n)]


def mdct_forward(x, n):
    """Forward transform scaled so imdct(mdct(x)) with TDAC windows
    reconstructs x (factor 4/n verified in selftest)."""
    cos = mdct_cos(n)
    return [sum(x[j] * cos[j][k] for j in range(n)) * (4.0 / n)
            for k in range(n // 2)]


def vorbis_window(i, n):
    s = math.sin(math.pi * (i + 0.5) / n)
    return math.sin(math.pi / 2 * s * s)


def block_window(n, prev_short, next_short, n0):
    """Window for a block of size n; slopes narrow to n0 when the
    neighbor is the short blocksize (flags per spec 4.3.1)."""
    w = [0.0] * n
    left_n = n0 if prev_short else n
    right_n = n0 if next_short else n
    left_start = n // 4 - left_n // 4
    right_start = n - (n // 4 - right_n // 4) - right_n // 2
    for i in range(n):
        if i < left_start:
            w[i] = 0.0
        elif i < left_start + left_n // 2:
            w[i] = vorbis_window(i - left_start, left_n)
        elif i < right_start:
            w[i] = 1.0
        elif i < right_start + right_n // 2:
            w[i] = vorbis_window(i - right_start + right_n // 2, right_n)
        else:
            w[i] = 0.0
    return w


# ------------------------------------------------------------ Ogg


def ogg_crc(page):
    crc = 0
    for b in page:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if crc & 0x80000000 \
                else (crc << 1) & 0xFFFFFFFF
    return crc


def ogg_page(serial, seq, granule, header_type, segments, lacing):
    """segments: raw payload bytes; lacing: list of lacing values."""
    out = bytearray(b"OggS\x00")
    out.append(header_type)
    out += struct.pack("<q", granule)
    out += struct.pack("<I", serial)
    out += struct.pack("<I", seq)
    out += b"\x00\x00\x00\x00"
    out.append(len(lacing))
    out += bytes(lacing)
    out += segments
    crc = ogg_crc(out)
    out[22:26] = struct.pack("<I", crc)
    return bytes(out)


def ogg_wrap(serial, pkts, max_segs=255):
    """Wrap (packet, granule) pairs into pages: packets pack multiple
    per page, span pages when the lacing table fills (continued-packet
    flag 0x01), the identification packet rides the BOS page alone, the
    final page carries EOS. Page granule = granule of the last packet
    completing on the page, -1 when none does."""
    segs = []  # (lacing_value, data, granule_if_completes, pkt_idx, completes)
    for pi, (pkt, granule) in enumerate(pkts):
        vals = []
        rem = len(pkt)
        while True:
            v = min(rem, 255)
            vals.append(v)
            rem -= v
            if v < 255:
                break
            if rem == 0:
                vals.append(0)
                break
        pos = 0
        for k, v in enumerate(vals):
            completes = k == len(vals) - 1
            segs.append((v, pkt[pos:pos + v],
                         granule if completes else None, pi, completes))
            pos += v
    pages = []
    seq = 0
    i = 0
    carry = False
    while i < len(segs):
        lacing = []
        payload = bytearray()
        gran = -1
        while i < len(segs) and len(lacing) < max_segs:
            v, data, g, pi, completes = segs[i]
            lacing.append(v)
            payload += data
            if completes and g is not None:
                gran = g
            i += 1
            if pi == 0 and completes:
                break  # identification packet alone on the BOS page
        ht = 0x01 if carry else 0
        if seq == 0:
            ht |= 0x02
        if i >= len(segs):
            ht |= 0x04
        pages.append(ogg_page(serial, seq, gran, ht, bytes(payload), lacing))
        carry = lacing[-1] == 255
        seq += 1
    return b"".join(pages)


def ogg_packets(data):
    """Demux: returns (packets, serials?, last_granule). Follows the
    FIRST stream's serial."""
    packets = []
    cur = bytearray()
    serial = None
    last_granule = -1
    p = 0
    while p + 27 <= len(data) and data[p:p + 4] == b"OggS":
        ht = data[p + 5]
        granule = struct.unpack("<q", data[p + 6:p + 14])[0]
        s = struct.unpack("<I", data[p + 14:p + 18])[0]
        nseg = data[p + 26]
        lacing = data[p + 27:p + 27 + nseg]
        body = p + 27 + nseg
        if serial is None:
            serial = s
        if s == serial:
            if not (ht & 0x01):
                cur = bytearray()
            off = body
            for v in lacing:
                cur += data[off:off + v]
                off += v
                if v < 255:
                    packets.append(bytes(cur))
                    cur = bytearray()
            if granule >= 0:
                last_granule = granule
        p = body + sum(lacing)
    return packets, last_granule


# ------------------------------------------------------------ encoder


def kraft_lengths(n, rnd, max_len=24):
    """A random Kraft-complete length assignment for n leaves: start
    from a 2-leaf tree and split random leaves until n remain."""
    lens = [1, 1]
    while len(lens) < n:
        i = rnd.randrange(len(lens))
        if lens[i] >= max_len:
            continue
        l = lens.pop(i)
        lens.extend([l + 1, l + 1])
    return lens


def make_scalar_book(levels, max_abs, rnd=None, style="flat"):
    """Dim-1 lookup-type-2 book: `levels` uniform quantization values
    over [-max_abs, max_abs]. style:
      flat    — complete tree, equal lengths;
      varlen  — random Kraft-complete lengths (real-Huffman shape);
      ordered — varlen lengths sorted ascending, serialized via the
                ordered (run-length) representation;
      sparse  — varlen plus unused entries interleaved (the decoder
                must skip them in both the length list and the
                codeword assignment)."""
    if style == "flat":
        bits = ilog(levels - 1)
        assert (1 << bits) == levels
        lengths = [bits] * levels
        used = list(range(levels))
        entries = levels
    elif style in ("varlen", "ordered"):
        lengths = kraft_lengths(levels, rnd)
        if style == "ordered":
            lengths.sort()
        used = list(range(levels))
        entries = levels
    else:  # sparse
        lengths = kraft_lengths(levels, rnd)
        out = []
        used = []
        for i, l in enumerate(lengths):
            if rnd.random() < 0.15:
                out.append(0)  # unused slot
            used.append(len(out))
            out.append(l)
        lengths = out
        entries = len(out)
    mn = float32_unpack(float32_pack(-max_abs))
    dl = float32_unpack(float32_pack(2.0 * max_abs / (entries - 1)))
    cb = Codebook(1, lengths, lookup_type=2, min_v=mn, delta_v=dl,
                  value_bits=max(1, ilog(entries - 1)), sequence_p=0,
                  multiplicands=list(range(entries)), sparse=(style == "sparse"),
                  ordered=(style == "ordered"))
    cb.used_entries = used  # quantizer clamps to these
    return cb


def write_comment_packet():
    w = BitWriter()
    for b in b"\x03vorbis":
        w.write(b, 8)
    vendor = b"graft-fixture"
    w.write(len(vendor), 32)
    for b in vendor:
        w.write(b, 8)
    w.write(0, 32)
    w.write(1, 1)
    return w.data()


class Encoder:
    """Minimal-subset Vorbis encoder. cfg keys:
      channels, rate, bs0, bs1 (bs0 <= bs1; equal = single blocksize),
      residue_type (0/1/2), levels (scalar quant grid size, power of 2),
      floor_posts + floor_ys + multiplier + rangebits (floor curve; the
      default is a flat 0 dB floor), coupling (stereo square-polar),
      lookup1 (pass-0 book is a dim-2 type-1 lattice), two_pass (add a
      fine scalar pass — exercises the multi-pass residue cascade),
      page_max_segs (small values force packets to span pages)."""

    def __init__(self, cfg, rnd=None):
        self.cfg = cfg
        self.rnd = rnd or random.Random(0)

    def encode(self, samples):
        cfg = self.cfg
        ch = cfg["channels"]
        n0 = cfg["bs0"]
        n1 = cfg["bs1"]
        two_sizes = n1 > n0
        x = [[float(samples[i * ch + j]) for i in range(len(samples) // ch)]
             for j in range(ch)]
        nsamp = len(x[0])

        # ---- frame plan (sizes + centers; center 0 = time 0)
        sizes = []
        covered = 0
        prev_n = None
        while covered < nsamp:
            n = n1 if (two_sizes and self.rnd.random() < 0.5) else n0
            if prev_n is not None:
                covered += (prev_n + n) // 4
            sizes.append(n)
            prev_n = n
        sizes.append(n0)
        centers = []
        c = 0
        for i, n in enumerate(sizes):
            if i > 0:
                c += (sizes[i - 1] + n) // 4
            centers.append(c)

        # ---- floor (fixed curve for the whole stream)
        f0cfg = cfg.get("floor0")
        ys = curves = None
        if f0cfg:
            # legacy LSP floor: book_list indices are patched in after the
            # residue books are built (curve synthesis never consults them)
            f0book, f0_dec, f0_ents = self.build_floor0(f0cfg)
            floor = Floor0(f0cfg.get("order", 8),
                           f0cfg.get("rate", cfg["rate"]),
                           f0cfg.get("bark", 64),
                           f0cfg.get("amp_bits", 6),
                           f0cfg.get("amp_offset", 10), [0])
            amp_max = (1 << floor.amp_bits) - 1
            f0_amp = []
            f0_tgt = []
            for i in range(len(sizes)):
                amps = []
                tgts = []
                for j in range(ch):
                    silent = (ch == 1 and i == f0cfg.get("silent_frame", -1))
                    amps.append(0 if silent
                                else f0cfg.get("amplitude", amp_max))
                    tgts.append((i + j) % len(f0_dec))
                f0_amp.append(amps)
                f0_tgt.append(tgts)
        else:
            posts = cfg.get("floor_posts", [])
            rangebits = cfg.get("rangebits", 7)
            if posts:
                xs = [0, 1 << rangebits] + [p[0] for p in posts]
                class_dims = [len(posts)]
            else:
                xs = [0, 1 << rangebits, (1 << rangebits) // 2]
                class_dims = [1]
            floor = Floor1(1, [0], class_dims, [0], [-1], [[2]],
                           cfg.get("multiplier", 1), rangebits, xs)
            ys = self.floor_ys(floor)
            curves = {n: floor.curve(ys, n // 2) for n in set(sizes)}

        # ---- per-frame residue-domain vectors (spec / curve), coupled
        coupling = cfg.get("coupling", False) and ch == 2
        frames = []  # (n, prev_short, next_short, resvecs)
        for i, n in enumerate(sizes):
            start = centers[i] - n // 2
            prev_short = two_sizes and n == n1 and \
                (i == 0 or sizes[i - 1] == n0)
            next_short = two_sizes and n == n1 and \
                (i + 1 >= len(sizes) or sizes[i + 1] == n0)
            w = block_window(n, prev_short, next_short, n0)
            specs = []
            for j in range(ch):
                seg = [(x[j][start + k] if 0 <= start + k < nsamp else 0.0)
                       * w[k] for k in range(n)]
                specs.append(mdct_forward(seg, n))
            if f0cfg:
                res = []
                for j in range(ch):
                    amp = f0_amp[i][j]
                    if amp <= 0:
                        res.append([0.0] * (n // 2))
                    else:
                        cv = floor.curve((amp, f0_dec[f0_tgt[i][j]]), n // 2)
                        res.append([specs[j][k] / cv[k]
                                    for k in range(n // 2)])
            else:
                curve = curves[n]
                res = [[specs[j][k] / curve[k] for k in range(n // 2)]
                       for j in range(ch)]
            if coupling:
                m = []
                a = []
                for k in range(n // 2):
                    M, ANG = couple(res[0][k], res[1][k])
                    m.append(M)
                    a.append(ANG)
                res = [m, a]
            frames.append((n, prev_short, next_short, res))

        # ---- books sized from the actual residue range
        max_abs = 1.0
        for _, _, _, res in frames:
            for v0 in res:
                for v in v0:
                    max_abs = max(max_abs, abs(v))
        max_abs = float(1 << ilog(int(max_abs)))  # next power of two
        books = []
        classbook = Codebook(4, [4] * 16, lookup_type=0)
        books.append(classbook)
        two_pass = cfg.get("two_pass", False)
        if cfg.get("lookup1"):
            lv = cfg.get("lat_levels", 64)
            bits = ilog(lv * lv - 1)
            mn = float32_unpack(float32_pack(-max_abs))
            dl = float32_unpack(float32_pack(2.0 * max_abs / (lv - 1)))
            coarse = Codebook(2, [bits] * (lv * lv), lookup_type=1,
                              min_v=mn, delta_v=dl,
                              value_bits=ilog(lv - 1), sequence_p=0,
                              multiplicands=list(range(lv)))
        else:
            coarse = make_scalar_book(cfg.get("levels", 2048), max_abs,
                                      rnd=self.rnd,
                                      style=cfg.get("book_style", "flat"))
        books.append(coarse)
        fbook = Codebook(1, [8] * 256, lookup_type=0)
        books.append(fbook)
        pass_books = [1]
        if two_pass:
            fine = make_scalar_book(2048, 2.0 * coarse.delta_v,
                                    rnd=self.rnd,
                                    style=cfg.get("book_style", "flat"))
            books.append(fine)
            pass_books.append(3)

        f0_booknum = 0
        if f0cfg:
            if f0cfg.get("decoy"):
                # an extra VALID but unused VQ book listed FIRST, so the
                # per-packet booknumber read (ilog(2) = 2 bits) is nonzero
                decoy = Codebook(2, [2] * 4, lookup_type=1, min_v=0.0,
                                 delta_v=1.0, value_bits=2, sequence_p=0,
                                 multiplicands=[0, 1])
                floor.book_list = [len(books), len(books) + 1]
                books.append(decoy)
                books.append(f0book)
                f0_booknum = 1
            else:
                floor.book_list = [len(books)]
                books.append(f0book)

        # ---- residue config
        rtype = cfg.get("residue_type", 0)
        psize = cfg.get("psize", 32)
        cascade_bits = (1 << len(pass_books)) - 1
        book_rows = [pass_books + [-1] * (8 - len(pass_books))] * 2
        residue = Residue(rtype, 0, (1 << 24) - 1, psize, 2, 0,
                          [cascade_bits, cascade_bits],
                          [list(r) for r in book_rows])

        modes = [(0, 0)] if not two_sizes else [(0, 0), (1, 0)]

        # ---- headers
        ident = BitWriter()
        for b in b"\x01vorbis":
            ident.write(b, 8)
        ident.write(0, 32)
        ident.write(ch, 8)
        ident.write(cfg["rate"], 32)
        ident.write(0, 32)
        ident.write(0, 32)
        ident.write(0, 32)
        ident.write(ilog(n0 - 1), 4)
        ident.write(ilog(n1 - 1), 4)
        ident.write(1, 1)

        setup = BitWriter()
        for b in b"\x05vorbis":
            setup.write(b, 8)
        setup.write(len(books) - 1, 8)
        for bk in books:
            bk.write(setup)
        setup.write(0, 6)
        setup.write(0, 16)
        setup.write(0, 6)
        floor.write(setup)
        setup.write(0, 6)
        residue.write(setup)
        setup.write(0, 6)
        setup.write(0, 16)
        submaps2 = self.cfg.get("submaps2", False) and ch == 2 and not coupling
        if submaps2:
            # two submaps, one channel each (mux [0, 1]) — both point at
            # the same floor/residue configs; the DECODE path differs
            # (residues run per submap, one channel per vector set)
            setup.write(1, 1)
            setup.write(1, 4)  # submaps - 1
        else:
            setup.write(0, 1)
        if coupling:
            setup.write(1, 1)
            setup.write(0, 8)
            setup.write(0, ilog(ch - 1))
            setup.write(1, ilog(ch - 1))
        else:
            setup.write(0, 1)
        setup.write(0, 2)
        if submaps2:
            setup.write(0, 4)  # mux ch0 -> submap 0
            setup.write(1, 4)  # mux ch1 -> submap 1
        for _ in range(2 if submaps2 else 1):
            setup.write(0, 8)
            setup.write(0, 8)
            setup.write(0, 8)
        setup.write(len(modes) - 1, 6)
        for bf, mapping in modes:
            setup.write(bf, 1)
            setup.write(0, 16)
            setup.write(0, 16)
            setup.write(mapping, 8)
        setup.write(1, 1)

        # ---- audio packets
        packets = []
        granule = 0
        if not f0cfg:
            rng = FLOOR1_RANGES[floor.multiplier - 1]
            ybits = ilog(rng - 1)
        for i, (n, prev_short, next_short, res) in enumerate(frames):
            pkt = BitWriter()
            pkt.write(0, 1)
            if len(modes) > 1:
                pkt.write(1 if n == n1 else 0, ilog(len(modes) - 1))
            if n == n1 and two_sizes:
                pkt.write(0 if prev_short else 1, 1)
                pkt.write(0 if next_short else 1, 1)
            if f0cfg:
                for j in range(ch):
                    amp = f0_amp[i][j]
                    pkt.write(amp, floor.amp_bits)
                    if amp > 0:
                        pkt.write(f0_booknum, ilog(len(floor.book_list)))
                        for e in f0_ents[f0_tgt[i][j]]:
                            f0book.encode_entry(pkt, e)
            else:
                for j in range(ch):
                    pkt.write(1, 1)
                    pkt.write(ys[0], ybits)
                    pkt.write(ys[1], ybits)
                    for yy in ys[2:]:
                        fbook.encode_entry(pkt, yy)
            if f0cfg and all(a <= 0 for a in f0_amp[i]):
                pass  # every channel unvoiced: residue reads nothing
            elif submaps2:
                for j in range(ch):  # one residue call per submap
                    self.write_residue(pkt, residue, books, pass_books,
                                       [list(res[j])], rtype, 1)
            else:
                self.write_residue(pkt, residue, books, pass_books,
                                   [list(v) for v in res], rtype, ch)
            if i > 0:
                granule += (sizes[i - 1] + n) // 4
            packets.append((pkt.data(), granule if i > 0 else -1))

        packets[-1] = (packets[-1][0], min(granule, nsamp))
        header = [(bytes(ident.data()), -1),
                  (write_comment_packet(), -1),
                  (bytes(setup.data()), -1)]
        serial = cfg.get("serial", 0x67726166)
        return ogg_wrap(serial, header + packets,
                        max_segs=cfg.get("page_max_segs", 255))

    def floor_ys(self, floor):
        posts = floor.posts()
        rng = FLOOR1_RANGES[floor.multiplier - 1]
        ys = self.cfg.get("floor_ys")
        if ys is None:
            return [rng - 1, rng - 1] + [0] * (posts - 2)
        assert len(ys) == posts
        return ys

    def build_floor0(self, f0):
        """Floor-0 fixture kit: near-uniform jittered LSP target vectors
        and the dim-`dim` lookup-2 codebook holding their delta rows (the
        decoder accumulates `last` across VQ reads, so rows hold
        differences from the previous group's final element). Returns the
        DECODED coefficient sets (quantized exactly as a decoder will see
        them) so the encoder's curve matches the decode bit-for-bit."""
        order = f0.get("order", 8)
        dim = f0.get("dim", 4)
        ntargets = f0.get("targets", 3)
        groups = (order + dim - 1) // dim
        targets = []
        for _ in range(ntargets):
            c = sorted(math.pi * (k + 1) / (order + 1)
                       + self.rnd.uniform(-0.3, 0.3) / (order + 1)
                       for k in range(order))
            targets.append(c)
        rows = []
        for c in targets:
            # pad past `order` (decode discards, but `last` still moves)
            padded = list(c) + [c[-1] + 0.05 * (i + 1)
                                for i in range(groups * dim - order)]
            last = 0.0
            for g in range(groups):
                seg = padded[g * dim:(g + 1) * dim]
                rows.append([v - last for v in seg])
                last = seg[-1]
        vals = [v for row in rows for v in row]
        vbits = 12
        mn, mx = min(vals), max(vals)
        delta = (mx - mn) / ((1 << vbits) - 1) or 1.0
        mnq = float32_unpack(float32_pack(mn))
        dlq = float32_unpack(float32_pack(delta))
        mults = [max(0, min((1 << vbits) - 1, int(round((v - mn) / delta))))
                 for row in rows for v in row]
        entries = len(rows)
        book = Codebook(dim, [max(1, ilog(entries - 1))] * entries,
                        lookup_type=2, min_v=mnq, delta_v=dlq,
                        value_bits=vbits, sequence_p=0, multiplicands=mults)
        dec_targets = []
        target_entries = []
        for t in range(ntargets):
            coeffs, ents, last = [], [], 0.0
            for g in range(groups):
                e = t * groups + g
                ents.append(e)
                vec = [v + last for v in book.vq(e)]
                last = vec[-1]
                coeffs.extend(vec)
            dec_targets.append(coeffs)
            target_entries.append(ents)
        return book, dec_targets, target_entries

    def write_residue(self, pkt, res, books, pass_books, vecs, rtype, ch):
        """Multi-pass encode mirroring the decoder's cascade walk: each
        pass quantizes the remaining error with its book (interleaved
        for type 0, sequential for 1/2)."""
        cb = books[res.classbook]
        n2 = len(vecs[0])
        if rtype == 2:
            inter = [0.0] * (n2 * ch)
            for j in range(ch):
                for k in range(n2):
                    inter[k * ch + j] = vecs[j][k]
            vecs = [inter]
            ch = 1
        vlen = len(vecs[0])
        begin = min(res.begin, vlen)
        end = min(res.end, vlen)
        pts = (end - begin) // res.psize
        recon = [[0.0] * vlen for _ in range(ch)]
        for pas, bidx in enumerate(pass_books):
            book = books[bidx]
            pc = 0
            while pc < pts:
                if pas == 0:
                    for j in range(ch):
                        cb.encode_entry(pkt, 0)  # all classes 0
                for _ in range(cb.dims):
                    if pc >= pts:
                        break
                    for j in range(ch):
                        off = begin + pc * res.psize
                        self.write_partition(pkt, book, vecs[j], recon[j],
                                             off, res.psize, rtype)
                    pc += 1

    def write_partition(self, pkt, book, vec, recon, off, psize, rtype):
        if rtype == 0:
            step = psize // book.dims
            for k in range(step):
                idxs = [off + k + l * step for l in range(book.dims)]
                e = self.quantize(book, [vec[i] - recon[i] for i in idxs])
                deq = book.vq(e)
                for l, i in enumerate(idxs):
                    recon[i] += deq[l]
                book.encode_entry(pkt, e)
        else:
            k = 0
            while k < psize:
                idxs = [off + k + l for l in range(book.dims)]
                e = self.quantize(book, [vec[i] - recon[i] for i in idxs])
                deq = book.vq(e)
                for l, i in enumerate(idxs):
                    recon[i] += deq[l]
                book.encode_entry(pkt, e)
                k += book.dims

    def quantize(self, book, vals):
        if book.lookup_type == 2 and book.dims == 1:
            q = int(round((vals[0] - book.min_v) / book.delta_v))
            q = max(0, min(book.entries - 1, q))
            used = getattr(book, "used_entries", None)
            if used is not None and book.lengths[q] == 0:
                import bisect
                i = bisect.bisect_left(used, q)
                cands = [used[j] for j in (i - 1, i) if 0 <= j < len(used)]
                q = min(cands, key=lambda e: abs(e - q))
            return q
        lv = book.lookup_values()
        entry = 0
        mult = 1
        for v in vals:
            q = int(round((v - book.min_v) / book.delta_v))
            q = max(0, min(lv - 1, q))
            entry += q * mult
            mult *= lv
        return entry


def couple(A, B):
    """Exact forward square-polar: returns (M, ANG) with
    inverse_coupling(M, ANG) == (A, B)."""
    if abs(A) >= abs(B):
        M = A
        if M > 0:
            ANG = M - B  # inverse branch: A'>0 -> B = M - A' ; A'<=0 -> A=M+...
        else:
            ANG = B - M
    else:
        M = B
        if M > 0:
            ANG = A - M
        else:
            ANG = M - A
    return M, ANG


def inverse_coupling(M, A):
    """Spec 4.3.5."""
    if M > 0:
        if A > 0:
            return M, M - A
        return M + A, M
    if A > 0:
        return M, M + A
    return M - A, M


# ------------------------------------------------------------ decoder


class Decoder:
    def __init__(self, data):
        packets, self.last_granule = ogg_packets(data)
        assert len(packets) >= 3, "missing vorbis headers"
        self.parse_ident(packets[0])
        assert packets[1][:7] == b"\x03vorbis"
        self.parse_setup(packets[2])
        self.audio_packets = packets[3:]

    def parse_ident(self, pkt):
        assert pkt[:7] == b"\x01vorbis"
        r = BitReader(pkt[7:])
        assert r.read(32) == 0
        self.channels = r.read(8)
        self.rate = r.read(32)
        r.read(32)
        r.read(32)
        r.read(32)
        self.bs = [1 << r.read(4), 1 << r.read(4)]
        assert r.read(1) == 1

    def parse_setup(self, pkt):
        assert pkt[:7] == b"\x05vorbis"
        r = BitReader(pkt[7:])
        self.books = [Codebook.parse(r) for _ in range(r.read(8) + 1)]
        for _ in range(r.read(6) + 1):
            assert r.read(16) == 0
        self.floors = []
        for _ in range(r.read(6) + 1):
            ft = r.read(16)
            if ft == 0:
                self.floors.append(Floor0.parse(r, self.books))
            else:
                assert ft == 1, "reserved floor type"
                self.floors.append(Floor1.parse(r))
        self.residues = []
        for _ in range(r.read(6) + 1):
            rt = r.read(16)
            assert rt in (0, 1, 2)
            self.residues.append(Residue.parse(r, rt))
        self.mappings = []
        for _ in range(r.read(6) + 1):
            assert r.read(16) == 0
            submaps = r.read(4) + 1 if r.read(1) else 1
            coupling = []
            if r.read(1):
                steps = r.read(8) + 1
                for _ in range(steps):
                    m = r.read(ilog(self.channels - 1))
                    a = r.read(ilog(self.channels - 1))
                    coupling.append((m, a))
            assert r.read(2) == 0
            mux = [0] * self.channels
            if submaps > 1:
                mux = [r.read(4) for _ in range(self.channels)]
            smcfg = []
            for _ in range(submaps):
                r.read(8)
                smcfg.append((r.read(8), r.read(8)))  # (floor, residue)
            self.mappings.append((submaps, coupling, mux, smcfg))
        self.modes = []
        for _ in range(r.read(6) + 1):
            bf = r.read(1)
            assert r.read(16) == 0
            assert r.read(16) == 0
            self.modes.append((bf, r.read(8)))
        assert r.read(1) == 1

    def decode(self):
        """Returns interleaved int16 PCM, trimmed to the final granule.
        Lapping (4.3.9): the output between consecutive packets is the
        region from the previous window's center to the current one's
        ((prev_n + n)/4 samples): prev's right half plus current's left
        half, index-aligned at the block boundary."""
        ch = self.channels
        out = [[] for _ in range(ch)]
        prev_right = None
        prev_n = 0
        for pkt in self.audio_packets:
            res = self.decode_packet(pkt)
            if res is None:
                continue
            pcm, n = res
            if prev_right is not None:
                span = (prev_n + n) // 4
                shift = n // 4 - prev_n // 4
                for j in range(ch):
                    for i in range(span):
                        a = prev_right[j][i] if i < prev_n // 2 else 0.0
                        ci = i + shift
                        b = pcm[j][ci] if 0 <= ci < n // 2 else 0.0
                        out[j].append(a + b)
            prev_right = [pcm[j][n // 2:] for j in range(ch)]
            prev_n = n
        total = self.last_granule if self.last_granule >= 0 else len(out[0])
        inter = []
        for i in range(min(total, len(out[0]))):
            for j in range(ch):
                v = int(round(out[j][i]))
                inter.append(max(-32768, min(32767, v)))
        return inter

    def decode_packet(self, pkt):
        r = BitReader(pkt)
        if r.read(1) != 0:
            return None
        mode_bits = ilog(len(self.modes) - 1)
        bf, mapping_idx = self.modes[r.read(mode_bits) if mode_bits else 0]
        n = self.bs[bf]
        n0 = self.bs[0]
        prev_short = next_short = False
        if bf == 1:
            prev_short = r.read(1) == 0
            next_short = r.read(1) == 0
        submaps, coupling, mux, smcfg = self.mappings[mapping_idx]
        ch = self.channels
        # floors
        floor_ys = []
        nonzero = []
        for j in range(ch):
            fidx = smcfg[mux[j]][0]
            ys = self.floors[fidx].decode_header(r, self.books)
            floor_ys.append(ys)
            nonzero.append(ys is not None)
        # coupling implies shared nonzero
        for m, a in coupling:
            if nonzero[m] or nonzero[a]:
                nonzero[m] = nonzero[a] = True
        # residues per submap
        spectra = [None] * ch
        for sm in range(submaps):
            chans = [j for j in range(ch) if mux[j] == sm]
            dnd = [not nonzero[j] for j in chans]
            ridx = smcfg[sm][1]
            vecs = self.residues[ridx].decode(r, self.books, dnd, n // 2)
            for k, j in enumerate(chans):
                spectra[j] = vecs[k]
        # inverse coupling
        for m, a in reversed(coupling):
            M = spectra[m]
            A = spectra[a]
            for k in range(n // 2):
                M[k], A[k] = inverse_coupling(M[k], A[k])
        # floor multiply + IMDCT + window
        w = block_window(n, prev_short, next_short, n0)
        pcm = []
        for j in range(ch):
            if nonzero[j] and floor_ys[j] is not None:
                fidx = smcfg[mux[j]][0]
                curve = self.floors[fidx].curve(floor_ys[j], n // 2)
                spec = [spectra[j][k] * curve[k] for k in range(n // 2)]
            else:
                spec = [0.0] * (n // 2)
            t = imdct(spec, n)
            pcm.append([t[i] * w[i] for i in range(n)])
        return pcm, n


# ------------------------------------------------------------ harness


def snr(ref, got):
    e = sum((a - b) ** 2 for a, b in zip(ref, got))
    s = sum(a * a for a in ref) or 1.0
    if e == 0:
        return 999.0
    return 10 * math.log10(s / e)


def test_signal(n, ch, seed):
    rnd = random.Random(seed)
    base = []
    fs = [rnd.uniform(0.01, 0.45) for _ in range(4)]
    amps = [rnd.uniform(1000, 7000) for _ in range(4)]
    for i in range(n):
        v = sum(a * math.sin(2 * math.pi * f * i) for f, a in zip(fs, amps))
        base.append(int(max(-30000, min(30000, v))))
    if ch == 1:
        return base
    inter = []
    for i in range(n):
        inter.append(base[i])
        inter.append(int(base[i] * 0.6) + int(2000 * math.sin(0.05 * i)))
    return inter


def selftest():
    configs = [
        dict(channels=1, rate=16000, bs0=256, bs1=256, residue_type=0),
        dict(channels=1, rate=16000, bs0=256, bs1=256, residue_type=1),
        dict(channels=1, rate=22050, bs0=128, bs1=512, residue_type=1),
        dict(channels=2, rate=16000, bs0=256, bs1=256, residue_type=2),
        dict(channels=2, rate=16000, bs0=256, bs1=256, residue_type=2,
             coupling=True),
        dict(channels=1, rate=16000, bs0=256, bs1=256, residue_type=1,
             lookup1=True, two_pass=True),
        # floor posts: SMALL vals ride near the interpolation line (the
        # spec's wrap encoding sends large vals to curve extremes, which
        # a single-pass uniform residue quantizer cannot absorb)
        dict(channels=1, rate=16000, bs0=256, bs1=256, residue_type=0,
             floor_ys=[255, 230, 6, 11, 4],
             floor_posts=[(20, 0), (60, 0), (100, 0)], two_pass=True),
        dict(channels=1, rate=16000, bs0=256, bs1=256, residue_type=0,
             page_max_segs=3),
        # floor 0 (legacy LSP): even + odd order, order not divisible by
        # the book dim (coefficient-discard path), two-book selection,
        # a header rate different from the stream rate, an unvoiced frame
        dict(channels=1, rate=16000, bs0=256, bs1=256, residue_type=0,
             two_pass=True, floor0=dict(order=8, dim=4)),
        dict(channels=1, rate=16000, bs0=256, bs1=256, residue_type=1,
             two_pass=True,
             # the silenced frame zeroes ~1 block of real audio, so
             # full-signal SNR is bounded by construction — gate at 8 dB
             min_snr=8,
             floor0=dict(order=9, dim=4, amp_bits=4, bark=96, decoy=True,
                         rate=8000, silent_frame=2)),
        dict(channels=2, rate=22050, bs0=128, bs1=512, residue_type=2,
             coupling=True, two_pass=True,
             floor0=dict(order=10, dim=5, amp_offset=12, amplitude=40)),
    ]
    for i, cfg in enumerate(configs):
        ns = 2048
        sig = test_signal(ns, cfg["channels"], seed=100 + i)
        enc = Encoder(cfg, rnd=random.Random(i))
        ogg = enc.encode(sig)
        dec = Decoder(ogg)
        got = dec.decode()
        assert dec.channels == cfg["channels"]
        assert dec.rate == cfg["rate"]
        m = min(len(sig), len(got))
        assert m >= ns * cfg["channels"] - cfg["bs1"] * cfg["channels"], \
            (len(sig), len(got))
        q = snr(sig[:m], got[:m])
        print(f"cfg {i}: {len(ogg)} bytes, {len(got)} samples, snr {q:.1f} dB")
        assert q > cfg.get("min_snr", 25), f"cfg {i} snr too low: {q}"
    # floor-0 p/q transcription vs DIRECT LSP-polynomial evaluation — an
    # independent route to the same numbers (see floor0_pq_direct)
    rnd = random.Random(7)
    worst = 0.0
    for _ in range(4000):
        order = rnd.randrange(1, 13)
        coeffs = sorted(rnd.uniform(0.02, math.pi - 0.02)
                        for _ in range(order))
        omega = rnd.uniform(0, math.pi)
        ps, qs = floor0_pq_spec(coeffs, order, omega)
        pd, qd = floor0_pq_direct(coeffs, order, omega)
        for a, b in ((ps, pd), (qs, qd)):
            worst = max(worst, abs(a - b) / max(abs(a), abs(b), 1e-300))
    assert worst < 1e-6, worst  # two float routes; a transcription error is O(1)
    print(f"floor0 p/q vs direct polynomial: max rel dev {worst:.2e} OK")
    print("selftest OK")


def gen_corpus(path, n_streams=30):
    rows = []
    rnd = random.Random(20260816)
    for t in range(n_streams):
        ch = 1 if t % 3 else 2
        bs0 = [128, 256, 256, 512][t % 4]
        bs1 = bs0 if t % 2 == 0 else bs0 * 4
        cfg = dict(channels=ch, rate=[8000, 16000, 22050, 44100][t % 4],
                   bs0=bs0, bs1=min(bs1, 1024),
                   residue_type=t % 3,
                   coupling=(ch == 2 and t % 2 == 0),
                   lookup1=(t % 5 == 0),
                   two_pass=(t % 5 == 0 or t % 6 == 1),
                   submaps2=(t in (9, 21)),  # stereo, no coupling at these t
                   page_max_segs=(5 if t % 7 == 0 else 255),
                   # real-Huffman shapes: variable-length, ordered
                   # (run-length serialized) and sparse codebooks
                   book_style=["flat", "varlen", "ordered", "sparse"][t % 4])
        if t % 4 == 3:
            cfg["floor_posts"] = [(20, 0), (45, 0), (90, 0), (110, 0)]
            cfg["multiplier"] = 1 + t % 2
            rng0 = FLOOR1_RANGES[cfg["multiplier"] - 1]
            cfg["floor_ys"] = [rng0 - 1, rng0 - 20, 5, 12, 3, 8]
            cfg["two_pass"] = True
        if 18 <= t < 24:
            # the real-world long-block shapes: all-2048 and 512/2048
            # mixed (window transitions at production size)
            cfg["bs0"] = 512 if t % 2 else 2048
            cfg["bs1"] = 2048
            cfg["levels"] = 2048
        if t >= 24:
            # floor 0 (legacy LSP): even/odd order, order not divisible
            # by the book dim (discard path), decoy-book selection, a
            # floor rate different from the stream rate, an unvoiced
            # frame, coupling and window switching over LSP curves
            cfg["two_pass"] = True
            cfg["submaps2"] = False
            cfg["floor0"] = [
                dict(order=8, dim=4),
                dict(order=9, dim=4, amp_bits=4, bark=96, decoy=True,
                     rate=8000, silent_frame=2),
                dict(order=10, dim=5, amp_offset=12, amplitude=40),
                dict(order=1, dim=1, amp_offset=8),
                dict(order=12, dim=4, bark=128, targets=5),
                dict(order=7, dim=3, amp_bits=5, decoy=True),
            ][t - 24]
            if t == 26:
                cfg["channels"] = 2
                cfg["coupling"] = True
                ch = 2
            if t == 28:
                cfg["bs0"], cfg["bs1"] = 256, 1024  # window switching
        ns = 1536 + 256 * (t % 3) + (4096 if 18 <= t < 24 else 0)
        ch = cfg["channels"]
        sig = test_signal(ns, ch, seed=t)
        ogg = Encoder(cfg, rnd=random.Random(t)).encode(sig)
        got = Decoder(ogg).decode()
        q = snr(sig[:len(got)], got[:len(sig)])
        assert q > (8 if cfg.get("floor0", {}).get("silent_frame", -1) >= 0
                    else 25), (t, q)
        if t % 9 == 4:
            # multiplexed shape: a foreign BOS page precedes the Vorbis
            # stream — decoders must lock to the Vorbis serial (expected
            # PCM computed from the un-muxed stream above)
            foreign = ogg_page(999, 0, -1, 0x02,
                               b"\x80theora" + bytes(40), [47])
            ogg = foreign + ogg
        pcm = struct.pack(f"<{len(got)}h", *got)
        rows.append((base64.b64encode(ogg).decode(), ch, cfg["rate"],
                     base64.b64encode(pcm).decode()))
        print(f"stream {t}: ch={ch} bs={cfg['bs0']}/{cfg['bs1']} "
              f"rt={cfg['residue_type']} books={cfg['book_style']} snr={q:.1f}")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(" ".join(map(str, r)) + "\n")
    print(f"wrote {len(rows)} streams -> {path}")


def gen_sweep(path, n_streams=200, seed=319):
    """Deep randomized sweep to /tmp (the H.264 two-layer pattern): the
    committed 24-stream corpus always runs; this larger randomized layer
    arms VorbisSpec's deep test when present."""
    rows = []
    rnd = random.Random(seed)
    for t in range(n_streams):
        ch = rnd.choice([1, 1, 2])
        bs0 = rnd.choice([128, 256, 512])
        bs1 = bs0 * rnd.choice([1, 2, 4])
        coupling = ch == 2 and rnd.random() < 0.5
        cfg = dict(channels=ch, rate=rnd.choice([8000, 16000, 22050, 44100]),
                   bs0=bs0, bs1=min(bs1, 2048),
                   residue_type=rnd.randrange(3),
                   coupling=coupling,
                   lookup1=rnd.random() < 0.25,
                   two_pass=rnd.random() < 0.5,
                   submaps2=(ch == 2 and not coupling and rnd.random() < 0.3),
                   page_max_segs=rnd.choice([255, 255, 255, 5, 11]),
                   book_style=rnd.choice(["flat", "varlen", "ordered", "sparse"]))
        if cfg["lookup1"]:
            cfg["two_pass"] = True
        if rnd.random() < 0.3:
            cfg["multiplier"] = rnd.randint(1, 4)
            rng0 = FLOOR1_RANGES[cfg["multiplier"] - 1]
            nposts = rnd.randint(1, 6)
            xs = sorted(rnd.sample(range(2, (1 << 7) - 1), nposts))
            cfg["rangebits"] = 7
            cfg["floor_posts"] = [(x, 0) for x in xs]
            cfg["floor_ys"] = [rng0 - 1, rng0 - 1 - rnd.randint(0, 25)] +                 [rnd.randint(0, 14) for _ in range(nposts)]
            cfg["two_pass"] = True
        if rnd.random() < 0.3:
            # floor 0 (legacy LSP) replaces the floor-1 curve wholesale
            order = rnd.randint(1, 12)
            cfg["floor0"] = dict(
                order=order,
                dim=rnd.randint(1, min(6, order + 1)),
                targets=rnd.randint(1, 5),
                amp_bits=rnd.randint(3, 7),
                amp_offset=rnd.randint(6, 14),
                bark=rnd.choice([32, 64, 96, 128]),
                decoy=rnd.random() < 0.3)
            if rnd.random() < 0.5:
                cfg["floor0"]["rate"] = rnd.choice([8000, 16000, 48000])
            if ch == 1 and rnd.random() < 0.2:
                cfg["floor0"]["silent_frame"] = rnd.randint(0, 3)
            cfg["two_pass"] = True
            cfg.pop("floor_posts", None)
            cfg.pop("floor_ys", None)
        ns = rnd.randrange(1024, 4096, 128)
        sig = test_signal(ns, ch, seed=seed * 1000 + t)
        ogg = Encoder(cfg, rnd=random.Random(t)).encode(sig)
        got = Decoder(ogg).decode()
        q = snr(sig[:len(got)], got[:len(sig)])
        silent = cfg.get("floor0", {}).get("silent_frame", -1) >= 0
        assert q > (5 if silent else 20), (t, q, cfg)
        pcm = struct.pack(f"<{len(got)}h", *got)
        rows.append((base64.b64encode(ogg).decode(), ch, cfg["rate"],
                     base64.b64encode(pcm).decode()))
    with open(path, "w") as f:
        for r in rows:
            f.write(" ".join(map(str, r)) + "\n")
    print(f"wrote {len(rows)} streams -> {path}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "selftest"
    if cmd == "selftest":
        selftest()
    elif cmd == "gen":
        gen_corpus(os.path.join(os.path.dirname(__file__), "..", "src",
                                "test", "resources", "vorbis",
                                "corpus.txt"))
    elif cmd == "sweep":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
        gen_sweep("/tmp/vorbis_sweep.txt", n)

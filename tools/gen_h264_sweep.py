#!/usr/bin/env python3
"""Randomized cross-implementation sweep corpus for the H.264 decoders:
encodes N random frames per entropy layer (random dims up to 80x64, MB
family mixes, QPs over the FULL 0..51 range incl. the mod-52 edges,
1-3 slices, deblock settings, per-MB deltas) with the Python fixture
codec, mirror-decodes each, and writes base64 streams + FNV plane
hashes to /tmp/{cabac,cavlc}_sweep.txt. H264SweepSpec decodes every
stream with the Scala decoder and must match bit-exactly (the spec
auto-cancels when the corpus files are absent).

This sweep is what caught the round-18 qp-edge bug: an encoder that
signals a CLIPPED qp request as a raw delta decodes 50 where it meant
0 under the spec's mod-52 arithmetic (now also pinned by the qp-edge
fixtures in H264Fixtures)."""
import sys, os, base64, random

sys.path.insert(0, os.path.dirname(__file__))
from h264_codec import encode_frame, write_sps, write_pps, decode_stream, pattern

MASK64 = (1 << 64) - 1


def fnv(plane):
    h = 0xcbf29ce484222325
    for row in plane:
        for px in row:
            h = ((h ^ px) * 0x100000001b3) & MASK64
    return h - (1 << 64) if h >= (1 << 63) else h


def sweep(seed, n, cabac, out_path):
    rnd = random.Random(seed)
    rows = []
    for trial in range(n):
        W = 16 * rnd.randint(1, 5)
        H = 16 * rnd.randint(1, 4)
        y = pattern(trial * 7 + seed % 97 + 1, W, H)
        u = [[rnd.randint(0, 255) for _ in range(W // 2)] for _ in range(H // 2)]
        v = [[rnd.randint(0, 255) for _ in range(W // 2)] for _ in range(H // 2)]
        fams = ['pcm', 'i16', 'i4']

        def plan(mbx, mby, t=trial):
            f = fams[(mbx * 3 + mby * 5 + t) % 3]
            if f == 'pcm':
                return ('pcm',)
            if f == 'i16':
                return ('i16', (mbx + mby + t) % 4, (mbx + t) % 4)
            return ('i4', [(mbx * 7 + mby * 11 + t + j) % 9
                           for j in range(16)], (mby + t) % 4)
        qp = rnd.randint(0, 51)
        slices = rnd.randint(1, 3)
        dbi = rnd.randint(0, 2)
        offs = (rnd.randint(-2, 2), rnd.randint(-2, 2)) if dbi != 1 else (0, 0)
        nmb = (W // 16) * (H // 16)
        deltas = {k: rnd.randint(-2, 2)
                  for k in rnd.sample(range(nmb), min(3, nmb))}
        body, ctx, _ = encode_frame(y, u, v, W, H, qp, plan, deblock_idc=dbi,
                                    qp_deltas=deltas, slices=slices,
                                    deblock_off2=offs, cabac=cabac)
        stream = (write_sps(W, H, profile=77 if cabac else 66) +
                  write_pps(26, cabac=cabac) + body)
        got = decode_stream(stream)
        assert got[0] == ctx.y and got[1] == ctx.u and got[2] == ctx.v, trial
        rows.append((base64.b64encode(stream).decode(), W, H,
                     fnv(got[0]), fnv(got[1]), fnv(got[2])))
    with open(out_path, 'w') as f:
        for r in rows:
            f.write(' '.join(map(str, r)) + '\n')
    print(f"wrote {len(rows)} streams -> {out_path}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == '--resource':
        # compact ALWAYS-RUN corpus committed under test resources (the
        # deep /tmp sweep stays the optional assurance layer); distinct
        # seeds so the committed streams are not a subset of any /tmp run
        res = os.path.join(os.path.dirname(__file__), '..',
                           'src', 'test', 'resources', 'h264_sweep')
        os.makedirs(res, exist_ok=True)
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 24
        sweep(40119, n, True, os.path.join(res, 'cabac_sweep.txt'))
        sweep(50119, n, False, os.path.join(res, 'cavlc_sweep.txt'))
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
        sweep(2026, n, True, '/tmp/cabac_sweep.txt')
        sweep(777, n, False, '/tmp/cavlc_sweep.txt')

#!/usr/bin/env python3
"""Emit src/main/scala/graft/tools/H264Fixtures.scala: raw Annex-B H.264
baseline IDR streams (SPS+PPS+slice) whose pixel CONTENT is
GenImages.pattern(base*16 + k, 48, 48) — the exact frame content the
MJPEG-AVI / JPEG-MP4 / VP8 video fixtures carry — so avc1 MP4s wrapping
these frames are cross-container AND cross-codec near-dups of the other
codec families (the q_video_dedup margin).

The 16 fixtures cycle MB family (I_PCM / I_16x16 / I_4x4), QP, chroma
and intra modes, mb_qp_delta and the deblocking switch, so the decoder's
whole baseline surface is exercised. Each fixture carries the Y/U/V
plane FNV hashes of the Python mirror decode: the Scala decoder must
reproduce them bit-exactly (H264Spec) — the cross-implementation anchor.

Build-time tool; re-run to regenerate."""
import base64
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from h264_codec import (encode_frame, write_sps, write_pps, decode_stream,
                        pattern, selftest)

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "scala", "graft", "tools",
                   "H264Fixtures.scala")

W = H = 48


def fnv(plane):
    h = 0xcbf29ce484222325
    for row in plane:
        for px in row:
            h = ((h ^ px) * 0x100000001b3) & ((1 << 64) - 1)
    return h - (1 << 64) if h >= (1 << 63) else h


def plan_for(base, k):
    fam = (base + k) % 3
    if fam == 0:
        return lambda mbx, mby: ('pcm',)
    if fam == 1:
        return lambda mbx, mby: ('i16', (mbx + mby + k) % 4, (mbx + k) % 4)
    return lambda mbx, mby: ('i4', [(mbx * 3 + mby * 7 + k + j) % 9
                                    for j in range(16)], (mby + k) % 4)


def gen_one(base, k):
    seed = base * 16 + k
    y = pattern(seed, W, H)
    u = [[128] * (W // 2) for _ in range(H // 2)]
    v = [[128] * (W // 2) for _ in range(H // 2)]
    qp = 6 + 2 * ((base * 4 + k) % 6)
    # disable_deblocking_filter_idc cycles 0/1/2 (2 = filter within
    # slices only — meaningful on the multi-slice fixtures) and nonzero
    # alpha/beta offsets ride where the filter runs
    dbi = (base + k) % 3
    offs = ((base + k) % 3 - 1, (base * 2 + k) % 3 - 1) if dbi != 1 else (0, 0)
    deltas = {2: 1, 5: -1} if (base + k) % 3 != 0 else None
    # half the fixtures split the picture across two slice NALs — the
    # real-encoder shape (slice-boundary neighbors become unavailable)
    slices = 1 + ((base + k) % 2)
    body, ctx, _ = encode_frame(y, u, v, W, H, qp, plan_for(base, k),
                                deblock_idc=dbi, qp_deltas=deltas,
                                slices=slices, deblock_off2=offs)
    stream = write_sps(W, H) + write_pps(26) + body
    got = decode_stream(stream)
    assert got[0] == ctx.y and got[1] == ctx.u and got[2] == ctx.v, \
        f"mirror mismatch base={base} k={k}"
    return stream, fnv(got[0]), fnv(got[1]), fnv(got[2])


def crop_planes(planes, W, H, crop):
    cl, cr, ct, cb = [c * 2 for c in crop]
    y, u, v = planes
    return ([row[cl:W - cr] for row in y[ct:H - cb]],
            [row[cl // 2:(W - cr) // 2] for row in u[ct // 2:(H - cb) // 2]],
            [row[cl // 2:(W - cr) // 2] for row in v[ct // 2:(H - cb) // 2]])


def gen_extra(idx):
    """Fixtures 16-19 exercise slice-header/SPS surface beyond the core
    matrix: POC type 0 (pic_order_cnt_lsb in the slice header), POC 0 +
    bottom_field_pic_order_in_frame_present (delta_pic_order_cnt_bottom),
    right/bottom crop to odd-MB 44x36, and left/top crop to 46x44."""
    seed = 80 + idx
    y = pattern(seed, W, H)
    u = [[128] * (W // 2) for _ in range(H // 2)]
    v = [[128] * (W // 2) for _ in range(H // 2)]
    plan = plan_for(1 + idx % 4, idx)
    qp = 10 + 4 * (idx % 3)
    poc = 0 if idx in (0, 1) else 2
    pic_order = idx == 1
    crop = None
    if idx == 2:
        crop = (0, 2, 0, 6)   # 48x48 -> 44x36 (right/bottom, odd MBs)
    elif idx == 3:
        crop = (1, 0, 2, 0)   # 48x48 -> 46x44 (left/top)
    body, ctx, _ = encode_frame(y, u, v, W, H, qp, plan, deblock_idc=idx % 3,
                                slices=1 + idx % 2, poc_type=poc,
                                pic_order_present=pic_order)
    stream = (write_sps(W, H, poc_type=poc, crop=crop) +
              write_pps(26, pic_order_present=pic_order) + body)
    got = decode_stream(stream)
    exp = crop_planes((ctx.y, ctx.u, ctx.v), W, H, crop) if crop \
        else (ctx.y, ctx.u, ctx.v)
    for p in range(3):
        assert got[p] == exp[p], f"extra fixture {idx}: plane {p} mismatch"
    ww = W - (crop[0] + crop[1]) * 2 if crop else W
    hh = H - (crop[2] + crop[3]) * 2 if crop else H
    return stream, (fnv(got[0]), fnv(got[1]), fnv(got[2])), (ww, hh)


def gen_qp_edge(idx):
    """QP range-edge fixtures (both entropy layers): slice QP 0 with
    negative per-MB deltas and QP 51 with positive ones. Pins the spec
    mod-52 QP arithmetic (7.4.5): the signaled mb_qp_delta is the
    EFFECTIVE change — an encoder that signals a clipped request raw
    decodes qp 50 where it meant 0 (found by the round-18 randomized
    cross-implementation sweep)."""
    qp = 0 if idx % 2 == 0 else 51
    cabac = idx >= 2
    seed = 120 + idx
    y = pattern(seed, W, H)
    u = [[128] * (W // 2) for _ in range(H // 2)]
    v = [[128] * (W // 2) for _ in range(H // 2)]
    deltas = {i: (-2 if qp == 0 else 2) for i in range(4)}
    body, ctx, _ = encode_frame(y, u, v, W, H, qp,
                                plan_for(1 + idx % 2, idx),
                                qp_deltas=deltas, slices=1 + idx % 2,
                                cabac=cabac)
    stream = (write_sps(W, H, profile=77 if cabac else 66) +
              write_pps(26, cabac=cabac) + body)
    got = decode_stream(stream)
    assert got[0] == ctx.y and got[1] == ctx.u and got[2] == ctx.v, \
        f"qp-edge mirror mismatch idx={idx}"
    return stream, fnv(got[0]), fnv(got[1]), fnv(got[2])


def gen_cabac(base, k):
    """Main-profile CABAC fixture: SAME pattern content as the CAVLC
    fixture (base, k) — so its decode pHash-matches across the entropy
    layers and across codecs — entropy-coded with the clause-9.3 layer.
    Cycles MB families (incl. I_PCM's engine re-init), QP, deblock,
    mb_qp_delta and the 2-slice split."""
    seed = base * 16 + k
    y = pattern(seed, W, H)
    u = [[128] * (W // 2) for _ in range(H // 2)]
    v = [[128] * (W // 2) for _ in range(H // 2)]
    qp = 6 + 2 * ((base * 4 + k) % 6)
    dbi = (base + k) % 3
    offs = ((base + k) % 3 - 1, (base * 2 + k) % 3 - 1) if dbi != 1 else (0, 0)
    deltas = {2: 1, 5: -1} if (base + k) % 3 != 0 else None
    slices = 1 + ((base + k) % 2)
    body, ctx, _ = encode_frame(y, u, v, W, H, qp, plan_for(base, k),
                                deblock_idc=dbi, qp_deltas=deltas,
                                slices=slices, deblock_off2=offs,
                                cabac=True)
    stream = (write_sps(W, H, profile=77) + write_pps(26, cabac=True) + body)
    got = decode_stream(stream)
    assert got[0] == ctx.y and got[1] == ctx.u and got[2] == ctx.v, \
        f"cabac mirror mismatch base={base} k={k}"
    return stream, fnv(got[0]), fnv(got[1]), fnv(got[2])


def main():
    print("running codec selftest first ...")
    selftest()
    streams = []
    hashes = []
    dims = []
    for base in range(1, 5):
        for k in range(4):
            s, hy, hu, hv = gen_one(base, k)
            streams.append(s)
            hashes.append((hy, hu, hv))
            dims.append((W, H))
            print(f"  base={base} k={k}: {len(s)} bytes")
    for idx in range(4):
        s, h, wh = gen_extra(idx)
        streams.append(s)
        hashes.append(h)
        dims.append(wh)
        print(f"  extra {idx}: {len(s)} bytes dims={wh}")
    for idx in (0, 1):  # CAVLC qp-edge fixtures join the extras
        s, hy, hu, hv = gen_qp_edge(idx)
        streams.append(s)
        hashes.append((hy, hu, hv))
        dims.append((W, H))
        print(f"  qp-edge cavlc {idx}: {len(s)} bytes")
    cstreams = []
    chashes = []
    for base in range(1, 5):
        for k in range(2):
            s, hy, hu, hv = gen_cabac(base, k)
            cstreams.append(s)
            chashes.append((hy, hu, hv))
            print(f"  cabac base={base} k={k}: {len(s)} bytes")
    for idx in (2, 3):  # CABAC qp-edge fixtures join the cabac set
        s, hy, hu, hv = gen_qp_edge(idx)
        cstreams.append(s)
        chashes.append((hy, hu, hv))
        print(f"  qp-edge cabac {idx}: {len(s)} bytes")
    b64 = [base64.b64encode(s).decode() for s in streams]
    cb64 = [base64.b64encode(s).decode() for s in cstreams]

    def chunked(s):
        return '" +\n      "'.join(s[i:i + 72] for i in range(0, len(s), 72))

    entries = ",\n".join(
        f'    "{chunked(b)}"' for b in b64)
    centries = ",\n".join(
        f'    "{chunked(b)}"' for b in cb64)
    hy = ", ".join(f"{h[0]}L" for h in hashes)
    hu = ", ".join(f"{h[1]}L" for h in hashes)
    hv = ", ".join(f"{h[2]}L" for h in hashes)
    chy = ", ".join(f"{h[0]}L" for h in chashes)
    chu = ", ".join(f"{h[1]}L" for h in chashes)
    chv = ", ".join(f"{h[2]}L" for h in chashes)
    ws = ", ".join(str(d[0]) for d in dims)
    hs = ", ".join(str(d[1]) for d in dims)
    ext_count = len(streams)
    cabac_count = len(cstreams)
    scala = f"""package graft.tools

/** GENERATED by tools/gen_h264_fixtures.py — 16 baseline H.264 IDR
  * Annex-B streams (SPS+PPS+slice; bases 1..4 x frames 0..3) whose
  * pixel content is GenImages.pattern(base*16 + k, 48, 48), cycling
  * I_PCM / I_16x16 / I_4x4 families, QPs, intra modes, mb_qp_delta and
  * the deblocking switch. expY/expU/expV carry the FNV-1a hashes of the
  * INDEPENDENT Python spec implementation's decode of each stream —
  * graft.functions.H264 must reproduce them bit-exactly (H264Spec).
  */
object H264Fixtures {{

  private val b64: Array[String] = Array(
{entries})

  /** Annex-B stream for (base 1..4, k 0..3). */
  def stream(base: Int, k: Int): Array[Byte] =
    java.util.Base64.getDecoder.decode(b64((base - 1) * 4 + k))

  /** The core 16-fixture matrix (the q_video_frames_h264 gate rotation). */
  val count: Int = 16

  /** Core matrix + 4 extras: POC-0, POC-0 + pic_order_present,
    * right/bottom crop to 44x36, left/top crop to 46x44. */
  val extCount: Int = {ext_count}

  def streamAt(i: Int): Array[Byte] =
    java.util.Base64.getDecoder.decode(b64(i))

  /** FNV-1a of the Python mirror decode's planes, fixture-ordered. */
  val expY: Array[Long] = Array({hy})
  val expU: Array[Long] = Array({hu})
  val expV: Array[Long] = Array({hv})
  val expW: Array[Int] = Array({ws})
  val expH: Array[Int] = Array({hs})

  private val cb64: Array[String] = Array(
{centries})

  /** Main-profile CABAC fixtures (bases 1..4 x frames 0..1): the SAME
    * pattern content as the CAVLC fixtures at (base, k), entropy-coded
    * with the clause-9.3 arithmetic layer (I_PCM engine re-init,
    * multi-slice, mb_qp_delta in rotation). 48x48 each. */
  val cabacCount: Int = {cabac_count}

  def cabacStream(base: Int, k: Int): Array[Byte] =
    java.util.Base64.getDecoder.decode(cb64((base - 1) * 2 + k))

  def cabacStreamAt(i: Int): Array[Byte] =
    java.util.Base64.getDecoder.decode(cb64(i))

  /** FNV-1a of the Python mirror decode of each CABAC fixture. */
  val cabacExpY: Array[Long] = Array({chy})
  val cabacExpU: Array[Long] = Array({chu})
  val cabacExpV: Array[Long] = Array({chv})
}}
"""
    with open(OUT, "w") as f:
        f.write(scala)
    print(f"wrote {OUT} ({len(scala)} bytes)")


if __name__ == "__main__":
    main()

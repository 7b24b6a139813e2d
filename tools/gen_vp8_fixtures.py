#!/usr/bin/env python3
"""Generate lossy-VP8 cross-validation fixtures for Vp8Spec.

Encodes deterministic synthetic images with the SYSTEM libwebp (the
reference VP8 implementation, via ctypes) and dumps, per fixture:

  <name>.webp    the real libwebp-written bitstream
  <name>.yuv     ground-truth Y,U,V planes, default decode (loop filter ON)
  <name>.nf.yuv  ground-truth planes with bypass_filtering=1 (no loop filter)

Plane layout in .yuv: Y (w*h bytes, tightly packed) then U then V
(ceil(w/2)*ceil(h/2) bytes each). A manifest.json records dimensions.

RFC 6386 defines exact integer reconstruction, so our Scala decoder must
match these planes BIT-EXACTLY — any error in tables, bool decoder,
prediction, IDCT or loop filter produces gross mismatches, which is the
point: this is the same cross-implementation validation the VP8L decoder
got from the CPython libwebp alpha stream (WebpSpec).

Build-time tool only: the Scala library has no runtime dependency on
libwebp. Fixtures are committed; re-run only to regenerate them.
"""
import ctypes, json, os, struct, sys

LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "vp8")

lw = ctypes.CDLL(LIB)


class Features(ctypes.Structure):
    _fields_ = [("width", ctypes.c_int), ("height", ctypes.c_int),
                ("has_alpha", ctypes.c_int), ("has_animation", ctypes.c_int),
                ("format", ctypes.c_int), ("pad", ctypes.c_uint32 * 5)]


class YUVA(ctypes.Structure):
    _fields_ = [("y", ctypes.POINTER(ctypes.c_ubyte)), ("u", ctypes.POINTER(ctypes.c_ubyte)),
                ("v", ctypes.POINTER(ctypes.c_ubyte)), ("a", ctypes.POINTER(ctypes.c_ubyte)),
                ("y_stride", ctypes.c_int), ("u_stride", ctypes.c_int),
                ("v_stride", ctypes.c_int), ("a_stride", ctypes.c_int),
                ("y_size", ctypes.c_size_t), ("u_size", ctypes.c_size_t),
                ("v_size", ctypes.c_size_t), ("a_size", ctypes.c_size_t)]


class RGBA(ctypes.Structure):
    _fields_ = [("rgba", ctypes.POINTER(ctypes.c_ubyte)), ("stride", ctypes.c_int),
                ("size", ctypes.c_size_t)]


class BufUnion(ctypes.Union):
    _fields_ = [("RGBA", RGBA), ("YUVA", YUVA)]


class DecBuffer(ctypes.Structure):
    _fields_ = [("colorspace", ctypes.c_int), ("width", ctypes.c_int), ("height", ctypes.c_int),
                ("is_external_memory", ctypes.c_int), ("u", BufUnion),
                ("pad", ctypes.c_uint32 * 4), ("private_memory", ctypes.c_void_p)]


class DecOptions(ctypes.Structure):
    _fields_ = [("bypass_filtering", ctypes.c_int), ("no_fancy_upsampling", ctypes.c_int),
                ("use_cropping", ctypes.c_int), ("crop_left", ctypes.c_int), ("crop_top", ctypes.c_int),
                ("crop_width", ctypes.c_int), ("crop_height", ctypes.c_int),
                ("use_scaling", ctypes.c_int), ("scaled_width", ctypes.c_int), ("scaled_height", ctypes.c_int),
                ("use_threads", ctypes.c_int), ("dithering_strength", ctypes.c_int),
                ("flip", ctypes.c_int), ("alpha_dithering_strength", ctypes.c_int),
                ("pad", ctypes.c_uint32 * 5)]


class DecConfig(ctypes.Structure):
    _fields_ = [("input", Features), ("output", DecBuffer), ("options", DecOptions)]


lw.WebPDecode.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(DecConfig)]
lw.WebPInitDecoderConfigInternal.argtypes = [ctypes.POINTER(DecConfig), ctypes.c_int]
lw.WebPEncodeRGB.restype = ctypes.c_size_t
lw.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                             ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]

MODE_YUV = 11
DEC_ABI = 0x0209  # libwebp 1.2.x
ENC_ABI = 0x020F


class WebPConfig(ctypes.Structure):
    _fields_ = [("lossless", ctypes.c_int), ("quality", ctypes.c_float),
                ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
                ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
                ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
                ("filter_strength", ctypes.c_int), ("filter_sharpness", ctypes.c_int),
                ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
                ("alpha_compression", ctypes.c_int), ("alpha_filtering", ctypes.c_int),
                ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
                ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
                ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
                ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
                ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
                ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
                ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
                ("qmax", ctypes.c_int)]


class WebPPicture(ctypes.Structure):
    _fields_ = [("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
                ("width", ctypes.c_int), ("height", ctypes.c_int),
                ("y", ctypes.c_void_p), ("u", ctypes.c_void_p), ("v", ctypes.c_void_p),
                ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
                ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
                ("pad1", ctypes.c_uint32 * 2),
                ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
                ("pad2", ctypes.c_uint32 * 3),
                ("writer", ctypes.c_void_p), ("custom_ptr", ctypes.c_void_p),
                ("extra_info_type", ctypes.c_int), ("extra_info", ctypes.c_void_p),
                ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
                ("progress_hook", ctypes.c_void_p), ("user_data", ctypes.c_void_p),
                ("pad3", ctypes.c_uint32 * 3),
                ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
                ("pad6", ctypes.c_uint32 * 8),
                ("memory_", ctypes.c_void_p), ("memory_argb_", ctypes.c_void_p),
                ("pad7", ctypes.c_void_p * 2)]


class WebPMemoryWriter(ctypes.Structure):
    _fields_ = [("mem", ctypes.POINTER(ctypes.c_ubyte)), ("size", ctypes.c_size_t),
                ("max_size", ctypes.c_size_t), ("pad", ctypes.c_uint32 * 1)]


def encode(rgb, w, h, quality):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lw.WebPEncodeRGB(bytes(rgb), w, h, w * 3, float(quality), ctypes.byref(out))
    assert n > 0, "encode failed"
    data = bytes(bytearray(out[i] for i in range(n)))
    lw.WebPFree(out)
    return data


def encode_adv(rgb, w, h, quality, **knobs):
    """Advanced-API encode so fixtures can force specific bitstream paths:
    segments=N, filter_type=0 (simple), partitions=log2, filter_sharpness,
    autofilter, sns_strength."""
    cfg = WebPConfig()
    assert lw.WebPConfigInitInternal(ctypes.byref(cfg), 0, ctypes.c_float(float(quality)),
                                     ENC_ABI) == 1, "config ABI"
    for k, v in knobs.items():
        setattr(cfg, k, v)
    pic = WebPPicture()
    assert lw.WebPPictureInitInternal(ctypes.byref(pic), ENC_ABI) == 1, "picture ABI"
    pic.width = w
    pic.height = h
    assert lw.WebPPictureImportRGB(ctypes.byref(pic), bytes(rgb), w * 3) == 1, "import"
    wr = WebPMemoryWriter()
    lw.WebPMemoryWriterInit(ctypes.byref(wr))
    pic.writer = ctypes.cast(lw.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
    ok = lw.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    assert ok == 1, "encode failed: error_code=%d" % pic.error_code
    out = bytes(bytearray(wr.mem[i] for i in range(wr.size)))
    lw.WebPMemoryWriterClear(ctypes.byref(wr))
    lw.WebPPictureFree(ctypes.byref(pic))
    return out


def decode_yuv(data, bypass):
    cfg = DecConfig()
    assert lw.WebPInitDecoderConfigInternal(ctypes.byref(cfg), DEC_ABI) == 1
    cfg.options.bypass_filtering = 1 if bypass else 0
    cfg.output.colorspace = MODE_YUV
    r = lw.WebPDecode(data, ctypes.c_size_t(len(data)), ctypes.byref(cfg))
    assert r == 0, "decode failed: %d" % r
    yb = cfg.output.u.YUVA
    w, h = cfg.output.width, cfg.output.height
    cw, ch = (w + 1) // 2, (h + 1) // 2

    def plane(ptr, stride, pw, ph):
        return b"".join(bytes(bytearray(ptr[r * stride + c] for c in range(pw)))
                        for r in range(ph))

    Y = plane(yb.y, yb.y_stride, w, h)
    U = plane(yb.u, yb.u_stride, cw, ch)
    V = plane(yb.v, yb.v_stride, cw, ch)
    lw.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return w, h, Y + U + V


class Lcg:
    """Deterministic PRNG so fixtures are reproducible byte-for-byte."""

    def __init__(self, seed):
        self.s = seed & 0xFFFFFFFFFFFFFFFF

    def next(self):
        self.s = (self.s * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        return (self.s >> 33) & 0x7FFFFFFF


def img_gradient(w, h):
    px = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            px[i] = (x * 255) // max(w - 1, 1)
            px[i + 1] = (y * 255) // max(h - 1, 1)
            px[i + 2] = ((x + y) * 255) // max(w + h - 2, 1)
    return px


def img_blocks(w, h):
    """Sharp 8px color tiles + one flat region: exercises H/V/DC modes and
    strong loop filtering across tile edges."""
    colors = [(230, 40, 40), (40, 200, 60), (50, 70, 220), (240, 230, 50),
              (20, 20, 20), (245, 245, 245), (160, 60, 200), (60, 200, 200)]
    px = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            if x >= w - 16 and y >= h - 16:
                c = (128, 128, 128)  # flat corner -> DC / skip MBs
            else:
                c = colors[((x // 8) + 3 * (y // 8)) % len(colors)]
            px[i], px[i + 1], px[i + 2] = c
    return px


def img_photo(w, h):
    """Smooth hills + noise + hard edges: drives B_PRED submodes and
    multiple encoder segments."""
    import math
    rng = Lcg(42)
    px = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            base = 110 + 70 * math.sin(x * 0.11) * math.cos(y * 0.07)
            noise = (rng.next() % 31) - 15 if (x // 32 + y // 32) % 2 == 0 else 0
            edge = 60 if (x % 48) < 3 else 0
            r = max(0, min(255, int(base + noise + edge)))
            g = max(0, min(255, int(base * 0.8 + noise)))
            b = max(0, min(255, int(255 - base + edge)))
            px[i], px[i + 1], px[i + 2] = r, g, b
    return px


def img_noise(w, h):
    rng = Lcg(7)
    px = bytearray(w * h * 3)
    for i in range(w * h * 3):
        px[i] = rng.next() % 256
    return px


def img_flat(w, h):
    return bytearray([77, 140, 190] * (w * h))


FIXTURES = [
    # (name, builder, w, h, quality, advanced-encoder knobs or None)
    ("grad16", img_gradient, 16, 16, 75, None),      # single MB
    ("blocks48x32", img_blocks, 48, 32, 50, None),   # tiles, heavy filtering
    ("photo128x80", img_photo, 128, 80, 75, None),   # B_PRED-heavy
    ("tiny37x21", img_photo, 37, 21, 80, None),      # partial edge MBs
    ("noise64x64", img_noise, 64, 64, 20, None),     # coarse quant
    ("flat33x17", img_flat, 33, 17, 90, None),       # skip/DC, partial MBs
    # advanced-API fixtures forcing bitstream paths the simple API never
    # takes with this content:
    ("seg96x64", img_photo, 96, 64, 40,              # segmentation on
     dict(segments=4, sns_strength=90, method=6)),
    ("simple80x48", img_blocks, 80, 48, 60,          # simple loop filter
     dict(filter_type=0, filter_strength=80, autofilter=0)),
    ("parts160x96", img_photo, 160, 96, 70,          # 4 token partitions
     dict(partitions=2)),
    ("sharp64x48", img_noise, 64, 48, 30,            # sharpness-limited
     dict(filter_sharpness=5, filter_strength=90)),
    ("auto320x208", img_photo, 320, 208, 75,         # autofilter, larger
     dict(autofilter=1, method=6, segments=4)),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    manifest = {}
    for name, builder, w, h, q, knobs in FIXTURES:
        rgb = builder(w, h)
        data = encode_adv(rgb, w, h, q, **knobs) if knobs else encode(rgb, w, h, q)
        dw, dh, filt = decode_yuv(data, bypass=False)
        _, _, nofilt = decode_yuv(data, bypass=True)
        assert (dw, dh) == (w, h)
        open(os.path.join(OUT, name + ".webp"), "wb").write(data)
        open(os.path.join(OUT, name + ".yuv"), "wb").write(filt)
        open(os.path.join(OUT, name + ".nf.yuv"), "wb").write(nofilt)
        manifest[name] = {"w": w, "h": h, "quality": q, "webp_bytes": len(data),
                          "filter_differs": filt != nofilt}
        print("%-14s %3dx%-3d q%-3d webp=%5dB filter_differs=%s"
              % (name, w, h, q, len(data), filt != nofilt))
    json.dump(manifest, open(os.path.join(OUT, "manifest.json"), "w"), indent=1, sort_keys=True)


if __name__ == "__main__":
    sys.exit(main())

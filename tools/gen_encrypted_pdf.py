#!/usr/bin/env python3
"""Independent (spec-derived, pure-stdlib) generator of an RC4-encrypted
PDF fixture for PdfCryptSpec — a SECOND implementation of ISO 32000
7.6.3 (Algorithms 2/3/5) and RC4, so the Scala decryptor is validated
cross-implementation rather than against its own writer. Run once; the
output is committed at src/test/resources/encrypted-rc4-r3.pdf.

Usage: python3 tools/gen_encrypted_pdf.py src/test/resources/encrypted-rc4-r3.pdf
"""
import hashlib, struct, sys

PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def rc4(key, data):
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    a = b = 0
    for ch in data:
        a = (a + 1) & 0xFF
        b = (b + s[a]) & 0xFF
        s[a], s[b] = s[b], s[a]
        out.append(ch ^ s[(s[a] + s[b]) & 0xFF])
    return bytes(out)


def pad32(pw):
    return (pw + PAD)[:32]


def main(out_path):
    user_pw = owner_pw = b""   # the empty-password "protected" shape
    perms = -44
    id0 = hashlib.md5(b"graft-encrypted-fixture").digest()

    # Algorithm 3: /O
    okey = hashlib.md5(pad32(owner_pw)).digest()
    for _ in range(50):
        okey = hashlib.md5(okey).digest()
    okey = okey[:16]
    o = rc4(okey, pad32(user_pw))
    for i in range(1, 20):
        o = rc4(bytes(b ^ i for b in okey), o)

    # Algorithm 2: file key (128-bit, R3)
    key = hashlib.md5(pad32(user_pw) + o + struct.pack("<i", perms) + id0).digest()[:16]
    for _ in range(50):
        key = hashlib.md5(key).digest()[:16]

    # Algorithm 5: /U
    u = hashlib.md5(PAD + id0).digest()
    u = rc4(key, u)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    u_full = u + b"\x00" * 16

    def obj_key(num, gen):
        return hashlib.md5(key + struct.pack("<i", num)[:3] +
                           struct.pack("<i", gen)[:2]).digest()[:min(16 + 5, 16)]

    content = b"BT /F1 12 Tf 72 720 Td (python wrote this) Tj ET"
    enc_content = rc4(obj_key(4, 0), content)

    out = bytearray()
    offsets = []

    def w(b):
        out.extend(b if isinstance(b, (bytes, bytearray)) else b.encode("latin-1"))

    def begin(num):
        offsets.append(len(out))
        w(f"{num} 0 obj\n")

    w("%PDF-1.4\n")
    begin(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    begin(2); w("<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    begin(3); w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n")
    begin(4)
    w(f"<< /Length {len(enc_content)} >>\nstream\n")
    w(enc_content)
    w("\nendstream\nendobj\n")
    begin(5); w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    begin(6)
    w("<< /Filter /Standard /V 2 /R 3 /Length 128 /P %d /O <%s> /U <%s> >>\nendobj\n"
      % (perms, o.hex().upper(), u_full.hex().upper()))
    xref_at = len(out)
    w("xref\n0 7\n0000000000 65535 f \n")
    for off in offsets:
        w("%010d 00000 n \n" % off)
    w("trailer\n<< /Size 7 /Root 1 0 R /Encrypt 6 0 R /ID [<%s> <%s>] >>\n"
      "startxref\n%d\n%%%%EOF\n" % (id0.hex().upper(), id0.hex().upper(), xref_at))
    with open(out_path, "wb") as f:
        f.write(out)
    print(f"wrote {out_path} ({len(out)} bytes)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/encrypted-rc4-r3.pdf")

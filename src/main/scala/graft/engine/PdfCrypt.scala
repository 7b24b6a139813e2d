package graft.engine

import java.nio.charset.StandardCharsets

/**
 * PDF standard security handler (ISO 32000 §7.6): enough to read the
 * common "protected" document — encrypted with an owner password but an
 * EMPTY user password, which any conforming reader opens without
 * prompting. Covers R2/R3 (RC4 40-128 bit), R4 (/CFM /V2 RC4 or /AESV2
 * AES-128-CBC), and R5/R6 (/AESV3 AES-256, the 2.B hardened derivation).
 * Password-protected-for-real documents (wrong validation) yield None and
 * the caller skips decryption — pages then extract empty rather than
 * garbled.
 *
 * RC4 is implemented inline (the algorithm is public and ~15 lines); AES
 * and the SHA-2 family come from the JDK's javax.crypto /
 * MessageDigest. Only STREAMS are decrypted here — text extraction never
 * reads document-level strings, and strings inside content streams are
 * covered by the stream cipher.
 *
 * The writer side (fixtures/specs) produces real encrypted files for
 * every revision, with deterministic "random" salts so specs are
 * reproducible; an independent Python implementation
 * (tools/gen_encrypted_pdf.py) cross-validates the RC4 revisions at the
 * byte level.
 */
private[engine] object PdfCrypt {

  /** The spec's 32-byte password pad (Table 8.1 / §7.6.3.3). */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  private[engine] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xFF)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var a = 0; var b = 0
    var k = 0
    while (k < data.length) {
      a = (a + 1) & 0xFF
      b = (b + s(a)) & 0xFF
      val t = s(a); s(a) = s(b); s(b) = t
      out(k) = (data(k) ^ s((s(a) + s(b)) & 0xFF)).toByte
      k += 1
    }
    out
  }

  private def aesCbc(mode: Int, key: Array[Byte], iv: Array[Byte],
                     data: Array[Byte], padding: Boolean): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance(
      if (padding) "AES/CBC/PKCS5Padding" else "AES/CBC/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  private def pad32(pw: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    val n = math.min(pw.length, 32)
    System.arraycopy(pw, 0, out, 0, n)
    System.arraycopy(Pad, 0, out, n, 32 - n)
    out
  }

  private def le32(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  /** Stream decryptor for one document. */
  private[engine] final case class Decryptor(fileKey: Array[Byte],
                                             aes: Boolean, v5: Boolean) {
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      try {
        if (v5) {
          if (data.length < 16 || data.length % 16 != 0) return data
          aesCbc(javax.crypto.Cipher.DECRYPT_MODE, fileKey, data.take(16),
            data.drop(16), padding = true)
        } else {
          val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.empty[Byte]
          val objKey = md5(fileKey,
            Array(num.toByte, (num >> 8).toByte, (num >> 16).toByte),
            Array(gen.toByte, (gen >> 8).toByte), salt)
            .take(math.min(fileKey.length + 5, 16))
          if (aes) {
            if (data.length < 16 || data.length % 16 != 0) return data
            aesCbc(javax.crypto.Cipher.DECRYPT_MODE, objKey, data.take(16),
              data.drop(16), padding = true)
          } else rc4(objKey, data)
        }
      } catch { case _: Exception => data } // corrupt block: leave as-is
    }
  }

  /** §7.6.4.3.4 Algorithm 2.B (R6): the hardened hash over password +
    * salt (+ U for the owner computation). */
  private[engine] def hash2B(password: Array[Byte], salt: Array[Byte],
                             uForOwner: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", password, salt, uForOwner)
    var i = 0
    var done = false
    while (!done) {
      val block = password ++ k ++ uForOwner
      val k1 = new Array[Byte](block.length * 64)
      var j = 0
      while (j < 64) { System.arraycopy(block, 0, k1, j * block.length, block.length); j += 1 }
      val e = aesCbc(javax.crypto.Cipher.ENCRYPT_MODE, k.take(16),
        k.slice(16, 32), k1, padding = false)
      val mod = e.take(16).map(_ & 0xFF).sum % 3
      k = mod match {
        case 0 => sha("SHA-256", e)
        case 1 => sha("SHA-384", e)
        case _ => sha("SHA-512", e)
      }
      i += 1
      if (i >= 64 && (e(e.length - 1) & 0xFF) <= i - 32) done = true
    }
    k.take(32)
  }

  /** Build a decryptor from the /Encrypt dictionary source, trailer ID
    * (first element, raw bytes), for the EMPTY user password. None when
    * unsupported or the password is genuinely required. */
  private[engine] def decryptor(enc: String, id0: Array[Byte]): Option[Decryptor] = {
    if (!enc.contains("/Standard")) return None
    def num(key: String): Option[Long] =
      ("""(?s)""" + java.util.regex.Pattern.quote(key) + """\s+(-?\d+)""").r
        .findFirstMatchIn(enc).map(_.group(1).toLong)
    val v = num("/V").getOrElse(0L).toInt
    val r = num("/R").getOrElse(2L).toInt
    val p = num("/P").getOrElse(-1L)
    val lenBits = num("/Length").getOrElse(40L).toInt
    def bytesOf(key: String): Option[Array[Byte]] = {
      val q = java.util.regex.Pattern.quote(key)
      // hex string form
      ("""(?s)""" + q + """\s*<([0-9A-Fa-f\s]+)>""").r.findFirstMatchIn(enc).map { m =>
        m.group(1).filterNot(_.isWhitespace).sliding(2, 2)
          .map(h => Integer.parseInt(h, 16).toByte).toArray
      }.orElse {
        // literal string form with escapes
        ("""(?s)""" + q + """\s*\(""").r.findFirstMatchIn(enc).map { m =>
          val (s2, _) = Pdf.parseStringPublic(enc, m.end - 1)
          s2.toCharArray.map(_.toByte)
        }
      }
    }
    val o = bytesOf("/O").getOrElse(return None)
    val u = bytesOf("/U").getOrElse(return None)
    val emptyPw = Array.empty[Byte]
    if (r >= 5) {
      // AES-256: validate the empty USER password, derive from /UE
      if (u.length < 48) return None
      val vSalt = u.slice(32, 40); val kSalt = u.slice(40, 48)
      val check =
        if (r == 6) hash2B(emptyPw, vSalt, Array.empty)
        else sha("SHA-256", emptyPw, vSalt)
      if (!java.util.Arrays.equals(check, u.take(32))) return None
      val ue = bytesOf("/UE").getOrElse(return None)
      val ik =
        if (r == 6) hash2B(emptyPw, kSalt, Array.empty)
        else sha("SHA-256", emptyPw, kSalt)
      val fileKey = aesCbc(javax.crypto.Cipher.DECRYPT_MODE, ik,
        new Array[Byte](16), ue.take(32), padding = false)
      Some(Decryptor(fileKey, aes = true, v5 = true))
    } else {
      // Algorithm 2 file key for R2-R4
      val keyLen = if (r == 2) 5 else math.max(5, math.min(16, lenBits / 8))
      val noMeta = enc.contains("/EncryptMetadata false") && r >= 4
      var key = md5(pad32(emptyPw), o.take(32), le32(p),
        id0, if (noMeta) Array(0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
             else Array.empty[Byte]).take(keyLen)
      if (r >= 3) {
        var i = 0
        while (i < 50) { key = md5(key).take(keyLen); i += 1 }
      }
      // validate via /U (Algorithm 6): recompute and compare (first 16
      // bytes for R>=3)
      val uCheck =
        if (r == 2) rc4(key, Pad)
        else {
          var x = md5(Pad, id0).clone()
          x = rc4(key, x)
          var i = 1
          while (i <= 19) {
            x = rc4(key.map(b => (b ^ i).toByte), x)
            i += 1
          }
          x
        }
      val ok =
        if (r == 2) java.util.Arrays.equals(uCheck, u.take(32))
        else java.util.Arrays.equals(uCheck.take(16), u.take(16))
      if (!ok) return None
      val aes = v == 4 && enc.contains("/AESV2")
      Some(Decryptor(key, aes = aes, v5 = false))
    }
  }

  // ============================================================ writing

  /** Build the /Encrypt dictionary entries + a stream encryptor for the
    * writer (empty user AND owner passwords; deterministic salts). Mode:
    * "rc4" (R3, 128-bit), "aes" (R4 /AESV2), "aes256" (R6). Returns
    * (encryptDictBody, encrypt(num, gen, data)). */
  private[engine] def writerFor(mode: String, id0: Array[Byte]):
      (String, (Int, Int, Array[Byte]) => Array[Byte]) = {
    val emptyPw = Array.empty[Byte]
    val p = -44L // print/copy allowed, modify denied — arbitrary fixed perms
    def hex(b: Array[Byte]): String = "<" + b.map(x => f"$x%02X").mkString + ">"
    mode match {
      case "rc4" | "aes" =>
        val r = if (mode == "rc4") 3 else 4
        val keyLen = 16
        // Algorithm 3: /O from the (empty) owner password
        var oKey = md5(pad32(emptyPw))
        var i = 0
        while (i < 50) { oKey = md5(oKey); i += 1 }
        val ok = oKey.take(keyLen)
        var o = rc4(ok, pad32(emptyPw))
        i = 1
        while (i <= 19) { o = rc4(ok.map(b => (b ^ i).toByte), o); i += 1 }
        // Algorithm 2 file key (uses /O and /P)
        var key = md5(pad32(emptyPw), o, le32(p), id0).take(keyLen)
        i = 0
        while (i < 50) { key = md5(key).take(keyLen); i += 1 }
        // Algorithm 5: /U
        var u = md5(Pad, id0).clone()
        u = rc4(key, u)
        i = 1
        while (i <= 19) { u = rc4(key.map(b => (b ^ i).toByte), u); i += 1 }
        val uFull = u ++ Array.fill(16)(0x00.toByte)
        val dict =
          if (mode == "rc4")
            s"/Filter /Standard /V 2 /R 3 /Length 128 /P $p /O ${hex(o)} /U ${hex(uFull)}"
          else
            s"/Filter /Standard /V 4 /R 4 /Length 128 /P $p /O ${hex(o)} /U ${hex(uFull)} " +
              "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> " +
              "/StmF /StdCF /StrF /StdCF"
        val encFn = (num: Int, gen: Int, data: Array[Byte]) => {
          val salt = if (mode == "aes") Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.empty[Byte]
          val objKey = md5(key,
            Array(num.toByte, (num >> 8).toByte, (num >> 16).toByte),
            Array(gen.toByte, (gen >> 8).toByte), salt)
            .take(math.min(keyLen + 5, 16))
          if (mode == "rc4") rc4(objKey, data)
          else {
            val iv = md5(Array(num.toByte, gen.toByte), id0).take(16) // deterministic IV
            iv ++ aesCbc(javax.crypto.Cipher.ENCRYPT_MODE, objKey, iv, data, padding = true)
          }
        }
        (dict, encFn)
      case "aes256" =>
        // R6: deterministic salts; fileKey from id0 hash (any 32 bytes)
        val fileKey = sha("SHA-256", "graft-filekey".getBytes, id0)
        val uvSalt = sha("SHA-256", "uv".getBytes, id0).take(8)
        val ukSalt = sha("SHA-256", "uk".getBytes, id0).take(8)
        val uHash = hash2B(emptyPw, uvSalt, Array.empty)
        val u = uHash ++ uvSalt ++ ukSalt
        val ik = hash2B(emptyPw, ukSalt, Array.empty)
        val ue = aesCbc(javax.crypto.Cipher.ENCRYPT_MODE, ik,
          new Array[Byte](16), fileKey, padding = false)
        // owner entries mirror the user ones (empty owner password over U)
        val ovSalt = sha("SHA-256", "ov".getBytes, id0).take(8)
        val okSalt = sha("SHA-256", "ok".getBytes, id0).take(8)
        val oHash = hash2B(emptyPw, ovSalt, u)
        val o = oHash ++ ovSalt ++ okSalt
        val oik = hash2B(emptyPw, okSalt, u)
        val oe = aesCbc(javax.crypto.Cipher.ENCRYPT_MODE, oik,
          new Array[Byte](16), fileKey, padding = false)
        // Perms: 16 bytes AES-ECB... spec requires /Perms; readers that
        // honor empty-user open without it — emit a plausible block
        val permsPlain = le32(p) ++ Array[Byte](-1, -1, -1, -1, 'T'.toByte, 'a'.toByte,
          'd'.toByte, 'b'.toByte, 0, 0, 0, 0)
        val perms = {
          val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
          c.init(javax.crypto.Cipher.ENCRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
          c.doFinal(permsPlain)
        }
        val dict =
          s"/Filter /Standard /V 5 /R 6 /Length 256 /P $p /O ${hex(o)} /U ${hex(u)} " +
            s"/OE ${hex(oe)} /UE ${hex(ue)} /Perms ${hex(perms)} " +
            "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> " +
            "/StmF /StdCF /StrF /StdCF"
        val encFn = (num: Int, gen: Int, data: Array[Byte]) => {
          val iv = sha("SHA-256", Array(num.toByte, gen.toByte), id0).take(16)
          iv ++ aesCbc(javax.crypto.Cipher.ENCRYPT_MODE, fileKey, iv, data, padding = true)
        }
        (dict, encFn)
      case other => throw new IllegalArgumentException(s"encryption mode $other")
    }
  }
}

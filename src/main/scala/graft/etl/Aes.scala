package graft.etl

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** AES-128-CBC with PKCS7 padding, hex(iv ‖ ciphertext) wire format —
  * the reference's deterministic password encryption
  * (aes_pkcs7.py:36–69; key = raw UTF-8 password bytes, etl.py:354–355).
  *
  * JVM-side twin of `ConvertF.fromPassword` (the Column form over
  * Spark's built-in `aes_encrypt`); this one is used inside the typed
  * merge kernel where the IV depends on the row (compare-under-old-IV,
  * etl.py:989–992). PKCS5Padding in JCA == PKCS7 for the 16-byte AES
  * block.
  */
object Aes {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  def encryptHex(plain: String, keyUtf8: String, ivHex: Option[String]): String = {
    val iv = ivHex match {
      case Some(h) => unhex(h)
      case None =>
        val b = new Array[Byte](16)
        new java.security.SecureRandom().nextBytes(b)
        b
    }
    val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(Cipher.ENCRYPT_MODE,
      new SecretKeySpec(keyUtf8.getBytes("UTF-8"), "AES"),
      new IvParameterSpec(iv))
    hex(iv ++ c.doFinal(plain.getBytes("UTF-8")))
  }

  def decryptHex(hexStr: String, keyUtf8: String): String = {
    val all = unhex(hexStr)
    val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(Cipher.DECRYPT_MODE,
      new SecretKeySpec(keyUtf8.getBytes("UTF-8"), "AES"),
      new IvParameterSpec(all.take(16)))
    new String(c.doFinal(all.drop(16)), "UTF-8")
  }
}

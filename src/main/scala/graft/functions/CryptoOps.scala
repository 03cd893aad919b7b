package graft.functions

/** ClickHouse-layout AES (reference src/Functions/FunctionsAES.h):
  * RAW ciphertext with the caller's explicit IV — unlike Spark's
  * aes_encrypt, which prepends a random IV. CBC pads PKCS#7 and takes
  * a 16-byte IV (an empty IV reads as all zeroes, OpenSSL EVP null-IV
  * behavior pinned by 01663_aes_msan's stable hex); ECB ignores the IV.
  */
object CryptoOps {

  private def cipher(mode: String, enc: Boolean, key: Array[Byte],
      iv: Array[Byte], keyLen: Int): javax.crypto.Cipher = {
    // the declared cipher pins the key width and a CBC IV is exactly one
    // block - the reference raises BAD_ARGUMENTS (error 36) on both
    // (FunctionsAES.h validateKey/validateIV), never silently re-keys
    if (key.length != keyLen)
      throw new IllegalArgumentException(
        s"Invalid key size: ${key.length} expected $keyLen " +
          "(BAD_ARGUMENTS, error 36 analog)")
    if (mode == "CBC" && iv.length > 16)
      throw new IllegalArgumentException(
        s"Invalid IV size: ${iv.length} expected 16 " +
          "(BAD_ARGUMENTS, error 36 analog)")
    val dir = if (enc) javax.crypto.Cipher.ENCRYPT_MODE
      else javax.crypto.Cipher.DECRYPT_MODE
    val sk = new javax.crypto.spec.SecretKeySpec(key, "AES")
    mode match {
      case "ECB" =>
        val c = javax.crypto.Cipher.getInstance("AES/ECB/PKCS5Padding")
        c.init(dir, sk)
        c
      case "CBC" =>
        val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
        val full = new Array[Byte](16)
        System.arraycopy(iv, 0, full, 0, math.min(iv.length, 16))
        c.init(dir, sk, new javax.crypto.spec.IvParameterSpec(full))
        c
      case other =>
        throw new IllegalArgumentException(s"chAes: unsupported mode $other")
    }
  }

  def chAesEncrypt(data: Array[Byte], key: Array[Byte],
      mode: org.apache.spark.unsafe.types.UTF8String,
      iv: Array[Byte], keyLen: Int): Array[Byte] =
    cipher(mode.toString, enc = true, key, iv, keyLen).doFinal(data)

  def chAesDecrypt(data: Array[Byte], key: Array[Byte],
      mode: org.apache.spark.unsafe.types.UTF8String,
      iv: Array[Byte], keyLen: Int): Array[Byte] =
    cipher(mode.toString, enc = false, key, iv, keyLen).doFinal(data)
}

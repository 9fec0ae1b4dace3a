package graft.log

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Path}
import java.security.{KeyFactory, KeyPair, KeyPairGenerator, KeyStore,
  PrivateKey, SecureRandom, Signature}
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.spec.PKCS8EncodedKeySpec
import java.util.Base64
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory,
  X509TrustManager}

/** TLS serving parity with the reference (`lite/src/server.rs:8,26-60`):
  * the lite server answers HTTPS either with a generated self-signed
  * certificate (`--tls-self`, rustls + rcgen::generate_simple_self_signed
  * for localhost/127.0.0.1/::1, server.rs:251-259) or a provided
  * cert/key PEM pair (`--tls-cert`/`--tls-key`,
  * RustlsConfig::from_pem_file, server.rs:239). This object is the JVM
  * analog: it builds the [[javax.net.ssl.SSLContext]] the
  * com.sun.net.httpserver.HttpsServer wraps the existing router with.
  *
  * The self-signed path hand-encodes a minimal X.509 v3 certificate in
  * DER from the public specs (RFC 5280 profile, X.690 DER rules) —
  * the JDK exposes no public certificate *builder*, only parsers, and
  * the sun.security.x509 internals are sealed off in Java 17. The cert
  * carries a subjectAltName of DNS:localhost + IP:127.0.0.1 + IP:::1,
  * matching the reference's SAN set, so JDK clients that trust the
  * cert pass hostname verification against the loopback endpoint.
  */
object Tls {

  /** Server-side material: the SSLContext to serve with plus the leaf
    * certificate PEM (what a client must trust for the self-signed
    * path — the reference prints "clients will need to use
    * --insecure"; handing the PEM out lets tests pin the exact cert
    * instead of disabling verification). */
  final case class Server(context: SSLContext, certPem: String)

  // ---------------------------------------------------------------
  // DER primitives (X.690): tag-length-value with definite lengths
  // ---------------------------------------------------------------

  private def derLen(n: Int): Array[Byte] =
    if (n < 0x80) Array(n.toByte)
    else {
      val b = BigInt(n).toByteArray.dropWhile(_ == 0)
      (0x80 | b.length).toByte +: b
    }

  private def tlv(tag: Int, content: Array[Byte]): Array[Byte] =
    tag.toByte +: (derLen(content.length) ++ content)

  private def seq(parts: Array[Byte]*): Array[Byte] =
    tlv(0x30, parts.flatten.toArray)

  private def set(parts: Array[Byte]*): Array[Byte] =
    tlv(0x31, parts.flatten.toArray)

  private def derInt(v: BigInt): Array[Byte] = tlv(0x02, v.toByteArray)

  private def oid(arcs: Int*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(arcs(0) * 40 + arcs(1))
    arcs.drop(2).foreach { a =>
      val bytes = new scala.collection.mutable.ArrayBuffer[Int]
      var v = a
      bytes.prepend(v & 0x7f); v >>>= 7
      while (v > 0) { bytes.prepend((v & 0x7f) | 0x80); v >>>= 7 }
      bytes.foreach(out.write)
    }
    tlv(0x06, out.toByteArray)
  }

  private def utf8Str(s: String): Array[Byte] = tlv(0x0c, s.getBytes("UTF-8"))
  private def ia5(s: String): Array[Byte] = tlv(0x16, s.getBytes("US-ASCII"))
  private def utcTime(s: String): Array[Byte] = tlv(0x17, s.getBytes("US-ASCII"))
  private def bitString(b: Array[Byte]): Array[Byte] = tlv(0x03, 0.toByte +: b)
  private def octetString(b: Array[Byte]): Array[Byte] = tlv(0x04, b)
  /** EXPLICIT context tag [n], constructed. */
  private def ctx(n: Int, content: Array[Byte]): Array[Byte] =
    tlv(0xa0 | n, content)

  /** Name ::= RDNSequence — one CN attribute. */
  private def cn(name: String): Array[Byte] =
    seq(set(seq(oid(2, 5, 4, 3), utf8Str(name))))

  // sha256WithRSAEncryption (RFC 8017): 1.2.840.113549.1.1.11 + NULL
  private val sigAlg: Array[Byte] =
    seq(oid(1, 2, 840, 113549, 1, 1, 11), Array(0x05.toByte, 0x00.toByte))

  /** subjectAltName extension (OID 2.5.29.17): GeneralNames with
    * dNSName ([2] IMPLICIT IA5String) and iPAddress ([7] IMPLICIT
    * OCTET STRING, raw 4/16 bytes) entries. */
  private def sanExtension(dns: Seq[String], ips: Seq[String]): Array[Byte] = {
    val names =
      dns.map(d => tlv(0x82, d.getBytes("US-ASCII"))) ++
        ips.map(ip => tlv(0x87, java.net.InetAddress.getByName(ip).getAddress))
    seq(oid(2, 5, 29, 17), octetString(tlv(0x30, names.flatten.toArray)))
  }

  /** Build a self-signed X.509 v3 certificate over `kp`, SAN-bound to
    * the reference's loopback set. Fixed validity (2020-2049) keeps
    * the encoding to UTCTime and the artifact deterministic modulo
    * key + serial. */
  private[log] def selfSignCert(kp: KeyPair, cnName: String,
                                dns: Seq[String],
                                ips: Seq[String]): X509Certificate = {
    val serial = {
      val b = new Array[Byte](8); new SecureRandom().nextBytes(b)
      BigInt(b).abs + 1
    }
    val name = cn(cnName)
    val tbs = seq(
      ctx(0, derInt(BigInt(2))),            // version v3
      derInt(serial),
      sigAlg,
      name,                                  // issuer = subject
      seq(utcTime("200101000000Z"), utcTime("491231235959Z")),
      name,
      kp.getPublic.getEncoded,               // SPKI is already DER
      ctx(3, seq(sanExtension(dns, ips))))
    val signer = Signature.getInstance("SHA256withRSA")
    signer.initSign(kp.getPrivate)
    signer.update(tbs)
    val cert = seq(tbs, sigAlg, bitString(signer.sign()))
    CertificateFactory.getInstance("X.509")
      .generateCertificate(new ByteArrayInputStream(cert))
      .asInstanceOf[X509Certificate]
  }

  private def pemOf(cert: X509Certificate): String = {
    val b64 = Base64.getMimeEncoder(64, "\n".getBytes("US-ASCII"))
      .encodeToString(cert.getEncoded)
    s"-----BEGIN CERTIFICATE-----\n$b64\n-----END CERTIFICATE-----\n"
  }

  private def contextFor(key: PrivateKey,
                         chain: Array[java.security.cert.Certificate]): SSLContext = {
    val pw = "graft-tls".toCharArray
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setKeyEntry("graft", key, pw, chain)
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, pw)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** `--tls-self`: generate a keypair + self-signed cert for the
    * loopback SAN set (server.rs:251-259) and wrap them in a serving
    * context. */
  def selfSigned(): Server = {
    val kpg = KeyPairGenerator.getInstance("RSA")
    kpg.initialize(2048)
    val kp = kpg.generateKeyPair()
    val cert = selfSignCert(kp, "graft-lite",
      dns = Seq("localhost"), ips = Seq("127.0.0.1", "::1"))
    Server(contextFor(kp.getPrivate, Array(cert)), pemOf(cert))
  }

  // ---------------------------------------------------------------
  // PEM cert/key pair (--tls-cert/--tls-key)
  // ---------------------------------------------------------------

  private def pemBlocks(pem: String, label: String): Seq[Array[Byte]] = {
    val re = ("(?s)-----BEGIN " + label + "-----(.*?)-----END " + label +
      "-----").r
    re.findAllMatchIn(pem).map(m =>
      Base64.getMimeDecoder.decode(m.group(1))).toSeq
  }

  /** Load a PKCS#8 private key (RSA or EC) from PEM text. */
  private[log] def privateKeyFromPem(pem: String): PrivateKey = {
    val der = pemBlocks(pem, "PRIVATE KEY").headOption.getOrElse(
      throw new IllegalArgumentException(
        "no PKCS#8 PRIVATE KEY block found (RSA-legacy/EC-param blocks unsupported)"))
    val spec = new PKCS8EncodedKeySpec(der)
    Seq("RSA", "EC").view.flatMap { alg =>
      try Some(KeyFactory.getInstance(alg).generatePrivate(spec))
      catch { case _: java.security.spec.InvalidKeySpecException => None }
    }.headOption.getOrElse(
      throw new IllegalArgumentException("unsupported private key algorithm"))
  }

  private[log] def certsFromPem(pem: String): Seq[X509Certificate] = {
    val cf = CertificateFactory.getInstance("X.509")
    pemBlocks(pem, "CERTIFICATE").map(der =>
      cf.generateCertificate(new ByteArrayInputStream(der))
        .asInstanceOf[X509Certificate])
  }

  /** `--tls-cert`/`--tls-key`: build a serving context from PEM files
    * (RustlsConfig::from_pem_file, server.rs:239). */
  def fromPemFiles(certPath: Path, keyPath: Path): Server = {
    val certPem = Files.readString(certPath)
    val chain = certsFromPem(certPem)
    require(chain.nonEmpty, s"no CERTIFICATE block in $certPath")
    val key = privateKeyFromPem(Files.readString(keyPath))
    Server(contextFor(key, chain.toArray), pemOf(chain.head))
  }

  /** Client context trusting exactly the given PEM certificate —
    * certificate pinning instead of the reference CLI's blanket
    * `--insecure`/ssl-no-verify escape hatch. */
  def clientContext(certPem: String): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    certsFromPem(certPem).zipWithIndex.foreach { case (c, i) =>
      ks.setCertificateEntry(s"trusted-$i", c)
    }
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  /** The `--insecure` analog for clients talking to a self-signed
    * server whose cert they cannot pin: trust anything. Test/demo
    * surface only — never used server-side. */
  def insecureClientContext(): SSLContext = {
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, Array[javax.net.ssl.TrustManager](new X509TrustManager {
      def checkClientTrusted(c: Array[X509Certificate], a: String): Unit = ()
      def checkServerTrusted(c: Array[X509Certificate], a: String): Unit = ()
      def getAcceptedIssuers: Array[X509Certificate] = Array.empty
    }), null)
    ctx
  }
}

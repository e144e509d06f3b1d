package graft.sources

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** HNAP authentication primitives (SURVEY.md §2.A; mb8600.py:138-259):
  * the 2-phase challenge-response login — HMAC-MD5 keys derived from the
  * modem's Challenge/PublicKey, uppercase hex, and the HNAP_AUTH header
  * with its millisecond clamp (`% 2e12`, mb8600.py:174).
  *
  * These are connector concerns, not query operators: a production DSv2
  * source would call them per micro-batch. They are pure functions here
  * (time injected) so they are unit-testable without a modem.
  */
object HnapAuth {

  def hmacMd5HexUpper(key: String, msg: String): String = {
    val mac = Mac.getInstance("HmacMD5")
    mac.init(new SecretKeySpec(key.getBytes("UTF-8"), "HmacMD5"))
    mac.doFinal(msg.getBytes("UTF-8")).map("%02X".format(_)).mkString
  }

  def soapUri(action: String): String = s"http://purenetworks.com/HNAP1/$action"

  /** mb8600.py:138-151 — HMAC_MD5(public_key+password, challenge). */
  def privateKey(publicKey: String, password: String, challenge: String): String =
    hmacMd5HexUpper(publicKey + password, challenge)

  /** mb8600.py:153-166 — HMAC_MD5(private_key, challenge). */
  def loginPassword(privateKey: String, challenge: String): String =
    hmacMd5HexUpper(privateKey, challenge)

  /** mb8600.py:168-187 — HMAC_MD5(private_key, millis%2e12 + soap URI)
    * + " " + millis. Clock injected for determinism.
    */
  def hnapAuth(soapAction: String, privateKeyStr: String = "withoutloginkey",
      nowMillis: Long): String = {
    val t = nowMillis % 2000000000000L
    hmacMd5HexUpper(privateKeyStr, s"$t${soapUri(soapAction)}") + " " + t
  }

  /** Authenticated session state (mb8600.py:38-44, 227-233). */
  final case class HnapSession(uid: String, privateKey: String, loginPassword: String)

  /** Pluggable transport: the only impure edge. Production = HTTP POST to
    * the modem; tests = canned responses.
    */
  trait Transport {
    /** POST `body` with `headers`/`cookies`; returns the response body. */
    def post(headers: Map[String, String], cookies: Map[String, String],
        body: String): String
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def jsonField(body: String, path: Seq[String]): Option[String] =
    try {
      var node = mapper.readTree(body)
      path.foreach { p => if (node != null) node = node.get(p) }
      Option(node).map(_.asText())
    } catch {
      // non-JSON response (HTML error page, empty body) → treated as a
      // malformed LoginResponse, surfacing Left instead of crashing
      case _: com.fasterxml.jackson.core.JacksonException => None
    }

  /** Login request body via Jackson (not string interpolation), so a
    * credential containing a quote or backslash is escaped rather than
    * corrupting the JSON or injecting fields.
    */
  private def loginBody(action: String, username: String,
      loginPassword: String): String = {
    val root = mapper.createObjectNode()
    val login = root.putObject("Login")
    login.put("Action", action)
    login.put("Username", username)
    login.put("LoginPassword", loginPassword)
    login.put("Captcha", "")
    login.put("PrivateLogin", "LoginPassword")
    mapper.writeValueAsString(root)
  }

  /** The 2-round login handshake (mb8600.py:189-259): request →
    * Challenge/Cookie/PublicKey → derive keys → login. Returns Left on
    * auth failure (reference raises and stops, mb8600.py:317-320).
    */
  def login(transport: Transport, username: String, password: String,
      nowMillis: Long): Either[String, HnapSession] = {
    val uri = soapUri("Login")
    val req1 = transport.post(
      headers = Map("Hnap_auth" -> hnapAuth("Login", nowMillis = nowMillis),
        "Soapaction" -> uri),
      cookies = Map.empty,
      body = loginBody("request", username, loginPassword = ""))
    (for {
      challenge <- jsonField(req1, Seq("LoginResponse", "Challenge"))
      cookie <- jsonField(req1, Seq("LoginResponse", "Cookie"))
      publicKey <- jsonField(req1, Seq("LoginResponse", "PublicKey"))
    } yield {
      val pk = privateKey(publicKey, password, challenge)
      val lp = loginPassword(pk, challenge)
      val req2 = transport.post(
        headers = Map("Hnap_auth" -> hnapAuth("Login", pk, nowMillis),
          "Soapaction" -> uri),
        cookies = Map("uid" -> cookie, "PrivateKey" -> pk),
        body = loginBody("login", username, loginPassword = lp))
      jsonField(req2, Seq("LoginResponse", "LoginResult")) match {
        case Some("OK") => Right(HnapSession(cookie, pk, lp))
        case other => Left(s"login failed: $other")
      }
    }).getOrElse(Left("malformed LoginResponse"))
  }

  /** One authenticated scrape (mb8600.py:329-353): the bundled
    * GetMultipleHNAPs POST. Returns the raw payload for HnapParse.
    */
  def scrape(transport: Transport, session: HnapSession, nowMillis: Long): String = {
    val action = "GetMultipleHNAPs"
    transport.post(
      headers = Map("Hnap_auth" -> hnapAuth(action, session.privateKey, nowMillis),
        "Soapaction" -> soapUri(action)),
      cookies = Map("uid" -> session.uid, "PrivateKey" -> session.privateKey),
      body = """{"GetMultipleHNAPs": {
                |"GetMotoStatusStartupSequence": "", "GetMotoStatusConnectionInfo": "",
                |"GetMotoStatusDownstreamChannelInfo": "", "GetMotoStatusUpstreamChannelInfo": "",
                |"GetMotoStatusSoftware": ""}}""".stripMargin)
  }
}

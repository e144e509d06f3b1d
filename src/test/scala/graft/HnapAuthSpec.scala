package graft

import graft.sources.HnapAuth
import org.scalatest.funsuite.AnyFunSuite

class HnapAuthSpec extends AnyFunSuite {

  // vectors computed independently with python hmac/hashlib (the same
  // primitives the reference uses at mb8600.py:138-187)
  test("private key = HMAC_MD5(public+password, challenge), upper hex") {
    assert(HnapAuth.privateKey("PUBKEY123", "motorola", "CHAL456")
      == "93D04E98919BD04223B90E1417998CB7")
  }

  test("login password = HMAC_MD5(private, challenge)") {
    val pk = HnapAuth.privateKey("PUBKEY123", "motorola", "CHAL456")
    assert(HnapAuth.loginPassword(pk, "CHAL456")
      == "E5C197F5E09AB253A4A8AE3C5B44E8DA")
  }

  test("HNAP_AUTH header: millis clamp + soap URI + trailing millis") {
    val now = 1709251200123L
    assert(HnapAuth.hnapAuth("Login", nowMillis = now)
      == "91D74FF4DD2AEEF516D6EEF8A98F5484 1709251200123")
    val pk = HnapAuth.privateKey("PUBKEY123", "motorola", "CHAL456")
    assert(HnapAuth.hnapAuth("GetMultipleHNAPs", pk, now)
      == "82102A0D2D294314E1A078255E95895A 1709251200123")
    // clamp: values ≥ 2e12 wrap (mb8600.py:174)
    assert(HnapAuth.hnapAuth("Login", nowMillis = 2000000000123L)
      .endsWith(" 123"))
  }

  test("2-phase login handshake against a canned transport") {
    val posts = scala.collection.mutable.ArrayBuffer[String]()
    val transport = new HnapAuth.Transport {
      def post(h: Map[String, String], c: Map[String, String], body: String) = {
        posts += body
        if (body.contains("\"request\""))
          """{"LoginResponse": {"Challenge": "CHAL456", "Cookie": "uid42",
             |"PublicKey": "PUBKEY123"}}""".stripMargin
        else {
          // the login round must send the derived login password
          assert(c("uid") == "uid42")
          assert(body.contains("E5C197F5E09AB253A4A8AE3C5B44E8DA"))
          """{"LoginResponse": {"LoginResult": "OK"}}"""
        }
      }
    }
    val got = HnapAuth.login(transport, "admin", "motorola", 1709251200123L)
    assert(got == Right(HnapAuth.HnapSession("uid42",
      "93D04E98919BD04223B90E1417998CB7", "E5C197F5E09AB253A4A8AE3C5B44E8DA")))
    assert(posts.size == 2)
  }

  test("login failure surfaces Left (reference: fatal stop, mb8600.py:317)") {
    val transport = new HnapAuth.Transport {
      def post(h: Map[String, String], c: Map[String, String], b: String) =
        if (b.contains("\"request\""))
          """{"LoginResponse": {"Challenge": "C", "Cookie": "u", "PublicKey": "P"}}"""
        else """{"LoginResponse": {"LoginResult": "FAILED"}}"""
    }
    assert(HnapAuth.login(transport, "admin", "wrong", 0L).isLeft)
  }

  test("scrape sends authenticated GetMultipleHNAPs and returns the payload") {
    val sess = HnapAuth.HnapSession("uid42", "PK", "LP")
    val transport = new HnapAuth.Transport {
      def post(h: Map[String, String], c: Map[String, String], b: String) = {
        assert(h("Soapaction").endsWith("GetMultipleHNAPs"))
        assert(c("PrivateKey") == "PK")
        assert(b.contains("GetMotoStatusDownstreamChannelInfo"))
        graft.sources.DocsisFixtures.scrapes.head._1
      }
    }
    val payload = HnapAuth.scrape(transport, sess, 42L)
    assert(payload.contains("GetMultipleHNAPsResponse"))
  }
}

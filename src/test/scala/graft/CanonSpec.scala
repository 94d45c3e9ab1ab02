package graft

import graft.core.Canon
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Canonicalization laws — analog of the reference's cache-key determinism
  * tests (kwarg-order invariance, /root/reference/tests/test_base.py:21-37).
  */
class CanonSpec extends AnyFunSuite {

  /** Deterministic property sampling (no scalatestplus bridge available in
    * the offline cache): 200 samples from a fixed scalacheck seed.
    */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until 200).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }

  test("lowercases scheme and host, keeps path case") {
    assert(Canon.canonicalize("HTTP://Host-1.Example.ORG/Page/3") ==
      "http://host-1.example.org/Page/3")
  }

  test("drops default port, keeps explicit non-default port") {
    assert(Canon.canonicalize("http://h.example.org:80/a") == "http://h.example.org/a")
    assert(Canon.canonicalize("https://h.example.org:443/a") == "https://h.example.org/a")
    assert(Canon.canonicalize("http://h.example.org:8080/a") == "http://h.example.org:8080/a")
  }

  test("strips fragment, sorts query params, drops empty query") {
    assert(Canon.canonicalize("http://h.example.org/p?b=2&a=1#frag") ==
      "http://h.example.org/p?a=1&b=2")
    assert(Canon.canonicalize("http://h.example.org/p?") == "http://h.example.org/p")
  }

  test("resolves dot segments; empty path becomes /") {
    assert(Canon.canonicalize("http://h.example.org") == "http://h.example.org/")
    assert(Canon.canonicalize("http://h.example.org/./page/../page/7") ==
      "http://h.example.org/page/7")
  }

  test("non-http(s) and unparseable inputs are returned trimmed, unchanged") {
    assert(Canon.canonicalize("  ftp://x/y  ") == "ftp://x/y")
    assert(Canon.canonicalize("not a url") == "not a url")
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https")
    host <- Gen.oneOf("Host-1.Example.org", "host-2.example.org", "H3.EX.org")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.listOfN(3, Gen.oneOf("a", "B", ".", "..", "page"))
    params <- Gen.someOf(Seq("a=1", "b=2", "c=3", "z=9"))
    frag <- Gen.oneOf("", "#f", "#frag2")
  } yield {
    val q = if (params.isEmpty) "" else "?" + params.mkString("&")
    s"$scheme://$host$port/${segs.mkString("/")}$q$frag"
  }

  test("idempotence: canonicalize ∘ canonicalize = canonicalize") {
    forAll(urlGen) { u =>
      val c = Canon.canonicalize(u)
      assert(Canon.canonicalize(c) == c)
    }
  }

  test("query-order invariance") {
    forAll(Gen.someOf(Seq("a=1", "b=2", "c=3", "d=4"))) { params =>
      val ps = params.toList
      val u1 = "http://h.example.org/p" + (if (ps.isEmpty) "" else "?" + ps.mkString("&"))
      val u2 = "http://h.example.org/p" +
        (if (ps.isEmpty) "" else "?" + ps.reverse.mkString("&"))
      assert(Canon.canonicalize(u1) == Canon.canonicalize(u2))
    }
  }

  test("host-case and fragment invariance") {
    forAll(urlGen) { u =>
      assert(Canon.canonicalize(u) == Canon.canonicalize(u.takeWhile(_ != '#')))
    }
  }

  test("hostOf / pathOf agree with canonical form") {
    assert(Canon.hostOf("http://HOST-1.example.org:8080/a/b?x=1") == "host-1.example.org")
    assert(Canon.pathOf("http://h.example.org/a/b?x=1") == "/a/b")
    assert(Canon.pathOf("http://h.example.org") == "/")
  }
}

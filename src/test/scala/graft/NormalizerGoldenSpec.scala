package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UrlFunctions.normalizeUrl

/** The reference's normalizer golden table (SimpleUrlNormalizerTest.java
  * :42-253, its richest correctness fixture), ported per SURVEY §5's
  * test plan. Every (weird, normal) pair below is asserted verbatim.
  */
class NormalizerGoldenSpec extends AnyFunSuite {

  private val cases = Seq(
      (" http://www.foo.com/ ", "http://www.foo.com/"),
      ("HTTP://www.foo.com/", "http://www.foo.com/"),
      ("http://www.foo.com:80/page.html", "http://www.foo.com/page.html"),
      ("https://www.foo.com:443/page.html", "https://www.foo.com/page.html"),
      ("http://www.foo.com:81/", "http://www.foo.com:81/"),
      ("http://www.foo.com", "http://www.foo.com/"),
      ("http://www.foo.com?", "http://www.foo.com/"),
      ("http://www.foo.com//bar", "http://www.foo.com/bar"),
      ("http://www.foo.com//", "http://www.foo.com/"),
      ("http://www.foo.com/foo.html#ref", "http://www.foo.com/foo.html"),
      ("http://www.foo.com/#ref", "http://www.foo.com/"),
      ("http://www.foo.com/foo?q=query#ref", "http://www.foo.com/foo?q=query"),
      ("http://WWW.Foo.Com/page.html", "http://www.foo.com/page.html"),
      ("http://www.foo.com./page.html", "http://www.foo.com/page.html"),
      ("www.foo.com/", "http://www.foo.com/"),
      ("http://www.foo.com/%66oo.html", "http://www.foo.com/foo.html"),
      ("http://www.foo.com/foo?q=%66oo", "http://www.foo.com/foo?q=foo"),
      ("http://www.foo.com/foo?mode=html", "http://www.foo.com/foo?mode=html"),
      ("http://www.foo.com/bar?", "http://www.foo.com/bar"),
      ("http://www.foo.com/foo?q=", "http://www.foo.com/foo?q="),
      ("http://www.foo.com/foo?q", "http://www.foo.com/foo?q"),
      ("http://www.foo.com/foo?q&p&r=&&s=t", "http://www.foo.com/foo?q&p&r=&s=t"),
      ("http://www.foo.com/foo%20me.html", "http://www.foo.com/foo+me.html"),
      ("http://www.foo.com/foo%3Fme.html", "http://www.foo.com/foo%3fme.html"),
      ("http://www.foo.com/aa/../", "http://www.foo.com/"),
      ("http://www.foo.com/aa/bb/../", "http://www.foo.com/aa/"),
      ("http://www.foo.com/aa/..", "http://www.foo.com/aa/.."),
      ("http://www.foo.com/aa/bb/cc/../../foo.html", "http://www.foo.com/aa/foo.html"),
      ("http://www.foo.com/aa/bb/../cc/dd/../ee/foo.html", "http://www.foo.com/aa/cc/ee/foo.html"),
      ("http://www.foo.com/../foo.html", "http://www.foo.com/foo.html"),
      ("http://www.foo.com/../../foo.html", "http://www.foo.com/foo.html"),
      ("http://www.foo.com/../aa/../foo.html", "http://www.foo.com/foo.html"),
      ("http://www.foo.com/aa/../../foo.html", "http://www.foo.com/foo.html"),
      ("http://www.foo.com/aa/../bb/../foo.html/../../", "http://www.foo.com/"),
      ("http://www.foo.com/../aa/foo.html", "http://www.foo.com/aa/foo.html"),
      ("http://www.foo.com/a..a/foo.html", "http://www.foo.com/a..a/foo.html"),
      ("http://www.foo.com/a..a/../foo.html", "http://www.foo.com/foo.html"),
      ("http://www.foo.com/foo.foo/../foo.html", "http://www.foo.com/foo.html"),
      ("http://www.foo.com//aa/bb/foo.html", "http://www.foo.com/aa/bb/foo.html"),
      ("http://www.foo.com/aa//bb/foo.html", "http://www.foo.com/aa/bb/foo.html"),
      ("http://www.foo.com/aa/bb//foo.html", "http://www.foo.com/aa/bb/foo.html"),
      ("http://www.foo.com////aa////bb////foo.html", "http://www.foo.com/aa/bb/foo.html"),
      ("http://www.foo.com/foo.php?PHPSESSID=cdc993a493e899bed04f4d0c8a462a03", "http://www.foo.com/foo.php"),
      ("http://www.foo.com/foo.php?f=2&PHPSESSID=cdc993a493e899bed04f4d0c8a462a03", "http://www.foo.com/foo.php?f=2"),
      ("http://www.foo.com/foo.php?PHPSESSID=cdc993a493e899bed04f4d0c8a462a03&f=2", "http://www.foo.com/foo.php?f=2"),
      ("http://www.foo.com/foo.php?Bv_SessionID=fassassddsajkl", "http://www.foo.com/foo.php"),
      ("http://www.foo.com/foo.php?Bv_SessionID=fassassddsajkl&x=y", "http://www.foo.com/foo.php?x=y"),
      ("http://www.foo.com/foo.html;jsessionid=1E6FEC0D14D044541DD84D2D013D29ED", "http://www.foo.com/foo.html"),
      ("http://www.foo.com/foo.php?x=1&sid=xyz&something=1", "http://www.foo.com/foo.php?x=1&something=1"),
      ("http://www.foo.com/foo.php?x=1&-session=xyz&something=1", "http://www.foo.com/foo.php?x=1&something=1"),
      ("http://www.foo.com/home/index.html", "http://www.foo.com/home/"),
      ("http://www.foo.com/index.html", "http://www.foo.com/")
    )

  test("reference golden table: all cases normalize identically") {
    val diffs = cases.flatMap { case (in, want) =>
      val got = normalizeUrl(in)
      if (got == want) None else Some(s"in=$in want=$want got=$got")
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }
}

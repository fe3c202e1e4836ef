package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CleanTextSpec extends AnyFunSuite {

  test("ASCII escape characters removed (reference test_extraction.py:883-900)") {
    val in = "Tab\t CarriageReturn\r New line\n Random Escape characters:" +
      "\u0001" + "\u0004" + "\u0008"
    val out = CleanText.run(in, translateFlag = true)
    assert(out == "Tab CarriageReturn New line Random Escape characters:")
  }

  test("Unicode escape characters removed (test_extraction.py:902-918)") {
    val in = "Tab\t CarriageReturn New line\n Random Escape characters:" + "\u0000"
    val out = CleanText.run(in, translateFlag = true)
    assert(out == "Tab CarriageReturn New line Random Escape characters:")
  }

  test("translate map: replace-with-space ranges (test_extraction.py:920-961)") {
    val in = "Tab\t CarriageReturn\r New line\n Random Escape characters:" +
      "\u000b" + "\u00a0" + "\u1680"
    assert(CleanText.translate(in) ==
      "Tab\t CarriageReturn  New line\n Random Escape characters:   ")
  }

  test("translate map: replace-with-none ranges") {
    val in = "Tab\t CarriageReturn\r New line\n Random Escape characters:" +
      "\u0000" + "\u00ad" + "\ue000"
    assert(CleanText.translate(in) ==
      "Tab\t CarriageReturn  New line\n Random Escape characters:")
  }

  test("translate map: mixed space + noncharacter") {
    val in = "Tab\t CarriageReturn\r New line\n Random Escape characters:" +
      "\u202f" + "\ufdd0"
    assert(CleanText.translate(in) ==
      "Tab\t CarriageReturn  New line\n Random Escape characters: ")
  }

  test("supplementary plane: emoji kept, noncharacters dropped") {
    val emoji = new String(Character.toChars(0x1f600))
    val nonchar = new String(Character.toChars(0x1fffe))
    assert(CleanText.translate("a" + emoji + nonchar + "b") == "a" + emoji + "b")
  }

  test("trimwords drops >= 100-codepoint tokens (adsft/utils.py:252-261)") {
    val big = "x" * 100
    val ok = "y" * 99
    assert(CleanText.trimwords(s"a  $big\t$ok \n b") == s"a $ok b")
  }

  test("trimwords counts codepoints, not UTF-16 units") {
    // 60 astral chars = 120 UTF-16 units but 60 codepoints -> kept
    val astral = new String(Character.toChars(0x1d400)) * 60
    assert(CleanText.trimwords(s"a $astral b") == s"a $astral b")
  }

  test("NFKC: angstrom sign -> A-ring; ligature decomposition") {
    assert(CleanText.normalise("Å") == "Å")
    assert(CleanText.normalise("ﬁ") == "fi")
  }

  test("python-style whitespace split: NBSP splits, figure space does not") {
    assert(CleanText.trimwords("a\u00a0b") == "a b")
    assert(CleanText.trimwords("a\u2007b") == "a\u2007b")
  }

  test("decode utf-8 with ignore") {
    val bytes = "café".getBytes("UTF-8") ++ Array(0xff.toByte) ++ "!".getBytes("UTF-8")
    assert(CleanText.decodeUtf8Ignore(bytes) == "café!")
  }

  test("clean is idempotent (justifies dropping the forwarder's re-clean, adsft/tasks.py:139)") {
    val samples = Seq(
      "Tab\t Carriage\r Å mixed  text",
      "  spaced   out tokens  ",
      "plain ascii text",
      "long" + ("z" * 120) + " tail"
    )
    samples.foreach { s =>
      val once = CleanText.run(s)
      assert(CleanText.run(once) == once, s"not idempotent for: $s")
    }
  }

  test("property: clean is idempotent over seeded random unicode soup") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc XY\t\n\u00a0Åé\u0001\u200bﬁ\u2007.,"
    (1 to 500).foreach { _ =>
      val s = Vector.fill(rnd.nextInt(80))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val once = CleanText.run(s)
      assert(CleanText.run(once) == once, s"not idempotent for: ${s.map(_.toInt)}")
    }
  }

  test("property: trimwords output is single-spaced with tokens < 100 codepoints") {
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val words = Vector.fill(rnd.nextInt(12))("w" * (rnd.nextInt(130) + 1))
      val s = words.mkString("  ")
      val out = CleanText.trimwords(s)
      assert(!out.contains("  "))
      out.split(' ').filter(_.nonEmpty).foreach(w =>
        assert(w.codePointCount(0, w.length) < 100))
    }
  }
}

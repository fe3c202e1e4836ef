package graft.core

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Diffs the full entity map against the reference's own data file
  * (adsft/entitydefs.py:18-1901), read and parsed at test time like the XML
  * goldens — guarantees all 1,881 public entity pairs are present with the
  * reference's exact values (including its quirks: no `amp`, no `lt`,
  * `quot` -> apostrophe).
  */
class EntitiesSpec extends AnyFunSuite {

  private val refPath = "/root/reference/adsft/entitydefs.py"

  /** Parse the `'name': u'value',` lines of the reference dict literal.
    * Handles the escapes the file actually uses: \uXXXX, \', \\ and the one
    * double-quoted value (`'apos': u"'"`).
    */
  private def parseReference(): Map[String, String] = {
    val entry = """^\s*'(\w+)':\s*u(['"])(.*)\2,?\s*$""".r
    Files.readAllLines(Paths.get(refPath)).toArray.map(_.toString).collect {
      case entry(name, _, lit) =>
        val sb = new StringBuilder
        var i = 0
        while (i < lit.length) {
          if (lit.charAt(i) == '\\') {
            lit.charAt(i + 1) match {
              case 'u' =>
                sb.append(Integer.parseInt(lit.substring(i + 2, i + 6), 16).toChar)
                i += 6
              case 't' => sb.append('\t'); i += 2
              case 'n' => sb.append('\n'); i += 2
              case c => sb.append(c); i += 2
            }
          } else { sb.append(lit.charAt(i)); i += 1 }
        }
        name -> sb.toString
    }.toMap
  }

  test("entity table == reference entitydefs, all 1881 entries (entitydefs.py:18-1901)") {
    assume(Files.exists(Paths.get(refPath)), "reference not present")
    val ref = parseReference()
    assert(ref.size == 1881, s"reference parse found ${ref.size} entries")
    val missing = ref.keySet -- Entities.table.keySet
    val extra = Entities.table.keySet -- ref.keySet
    assert(missing.isEmpty, s"missing ${missing.size}: ${missing.take(10)}")
    assert(extra.isEmpty, s"extra ${extra.size}: ${extra.take(10)}")
    val diff = ref.collect { case (k, v) if Entities.table(k) != v => k }
    assert(diff.isEmpty, s"value mismatches: ${diff.take(10)}")
  }

  test("reference quirks reproduced: amp/lt deleted, gt kept, quot/apos -> apostrophe") {
    assert(Entities.convert("&amp;") == "")
    assert(Entities.convert("&lt;x&gt;") == "x>")
    assert(Entities.convert("&quot;a&apos;") == "'a'")
  }

  test("exotic names from the ISO/SGML tail convert (spot-checks across sets)") {
    assert(Entities.convert("&angmsd;") == "∡") // isoamsa
    assert(Entities.convert("&Pcy;") == "П") // isocyr1
    assert(Entities.convert("&xharr;") == "⟷") // isoamsa long arrow
    assert(Entities.convert("&nsubseteqq;") == "⫅̸") // combining pair
    assert(Entities.convert("&Aacgr;") == "Ά") // isogrk
    assert(Entities.convert("&unknown123;") == "")
    assert(Entities.convert("&#65;&#x41;") == "") // numeric refs removed
  }
}

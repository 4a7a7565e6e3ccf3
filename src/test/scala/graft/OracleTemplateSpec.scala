package graft

import org.scalatest.funsuite.AnyFunSuite

/** The engine-stable rounding template is inlined (not generated) in
  * every oracle SQL string, so a single drifted copy — a wrong guard
  * limit, a mismatched scale, or an edited sub-expression in one of
  * the four places the operand appears — would silently change ONE
  * gate's oracle and surface as an unexplained red. This spec parses
  * every instance in `SparkEntry.oracleSql` and proves it structurally
  * canonical:
  *
  * `(CASE WHEN isnan(CAST((E) AS DOUBLE)) OR abs(CAST((E) AS DOUBLE))
  *   >= 8e(17−d) THEN CAST((E) AS DOUBLE)
  *   ELSE floor(CAST((E) AS DOUBLE) * 1e d + 0.5) / 1e d END)`
  *
  * with the SAME operand E in all four positions and the guard
  * exponent locked to the scale (see [[graft.functions.hround]] for
  * why these exact constants). Pure string parsing — no Spark session.
  */
class OracleTemplateSpec extends AnyFunSuite {

  private def norm(s: String): String = s.replaceAll("\\s+", " ").trim

  /** Extract a balanced-paren operand starting at `i` (which must point
    * just past an opening paren); returns (operand, indexAfterClose).
    * Single-quoted SQL strings are opaque.
    */
  private def operand(s: String, i: Int): (String, Int) = {
    var depth = 1
    var j = i
    var inQ = false
    val sb = new StringBuilder
    while (j < s.length && depth > 0) {
      val c = s.charAt(j)
      if (inQ) { sb.append(c); if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true; sb.append(c)
        case '(' => depth += 1; sb.append(c)
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(c)
        case other => sb.append(other)
      }
      j += 1
    }
    assert(depth == 0, s"unbalanced parens in oracle fragment at $i")
    (sb.toString, j)
  }

  private def expectLit(name: String, s: String, i: Int, lit: String): Int = {
    val got = s.slice(i, i + lit.length)
    assert(norm(got) == norm(lit),
      s"$name: template drift — expected '${norm(lit)}' got '${norm(got)}'")
    i + lit.length
  }

  test("every inlined hround CASE in every oracle matches the canonical template") {
    var instances = 0
    SparkEntry.oracleSql.foreach { case (name, sqlRaw) =>
      // collapse whitespace once so multi-line wrapping can't hide drift
      val sql = norm(sqlRaw)
      val marker = "CASE WHEN isnan(CAST(("
      var from = 0
      while (sql.indexOf(marker, from) >= 0) {
        val at = sql.indexOf(marker, from)
        var i = at + marker.length
        val (e1, i1) = operand(sql, i)
        i = expectLit(name, sql, i1, " AS DOUBLE)) OR abs(CAST((")
        val (e2, i2) = operand(sql, i)
        i = expectLit(name, sql, i2, " AS DOUBLE)) >= 8e")
        val kStart = i
        while (i < sql.length && sql.charAt(i).isDigit) i += 1
        val k = sql.slice(kStart, i).toInt
        i = expectLit(name, sql, i, " THEN CAST((")
        val (e3, i3) = operand(sql, i)
        i = expectLit(name, sql, i3, " AS DOUBLE) ELSE floor(CAST((")
        val (e4, i4) = operand(sql, i)
        i = expectLit(name, sql, i4, " AS DOUBLE) * 1e")
        val dStart = i
        while (i < sql.length && sql.charAt(i).isDigit) i += 1
        val d = sql.slice(dStart, i).toInt
        i = expectLit(name, sql, i, " + 0.5) / 1e")
        val d2Start = i
        while (i < sql.length && sql.charAt(i).isDigit) i += 1
        val d2 = sql.slice(d2Start, i).toInt
        i = expectLit(name, sql, i, " END")
        assert(norm(e1) == norm(e2) && norm(e1) == norm(e3) && norm(e1) == norm(e4),
          s"$name: operand drift across the four template positions:\n" +
            s"  isnan: ${norm(e1)}\n  abs:   ${norm(e2)}\n" +
            s"  then:  ${norm(e3)}\n  floor: ${norm(e4)}")
        assert(d == d2, s"$name: scale mismatch — *1e$d vs /1e$d2")
        assert(k == 17 - d,
          s"$name: guard exponent 8e$k does not match scale 1e$d " +
            s"(must be 8e${17 - d} so the scaled value stays in exact long range)")
        instances += 1
        from = at + marker.length
      }
    }
    // the migration inlined the template battery-wide — if this number
    // collapses, the parser regressed, not the oracles
    assert(instances > 150, s"expected >150 template instances, found $instances")
  }
}

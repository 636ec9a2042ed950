package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{round => round0}

/** Cross-engine-stable decimal rounding.
  *
  * `round(x, n)` is NOT portable between engines: Spark rounds the
  * exact binary value via BigDecimal.setScale(HALF_UP) while DuckDB
  * computes std::round(x * 10^n) / 10^n in doubles — when x*10^n
  * lands on an exact .5 double (e.g. x = 0.42574999999999996,
  * x*1e4 == 4257.5 exactly after the multiply's round-to-nearest) the
  * two disagree by one final digit. Found at sf0.1 on 2/5000 rows of
  * t02 — a scale-dependent landmine under hash comparison.
  *
  * Fix: both sides compute the SAME formula — multiply, 0-dp round,
  * divide. At 0 dp an exact double half always rounds away from zero
  * in both engines (BigDecimal HALF_UP == std::round), so the results
  * are bit-identical.
  */
object Rounding {
  private def pow10(n: Int): Double = math.pow(10.0, n)

  /** Spark side: round(x * 10^n) / 10^n. */
  def roundN(c: Column, n: Int): Column = {
    val p = pow10(n)
    round0(c * p) / p
  }

  /** Rewrite every `round(expr, n)` in a DuckDB oracle SQL string to
    * the explicit multiply form `(round((expr) * 1eN) / 1eN)`.
    * Balanced-paren parse; handles nesting and multi-line SQL. String
    * literals are copied verbatim at EVERY nesting level (a 'round('
    * inside quotes is never treated as a call), and a second argument
    * that is not a plain integer literal fails fast with the offending
    * SQL — a silently unrewritten round() would reintroduce the
    * cross-engine .5-boundary mismatch this rewriter exists to kill.
    */
  def rewriteOracle(sql: String): String = {
    val marker = "round("
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val ch = sql.charAt(i)
      if (ch == '\'') {
        // copy a string literal verbatim, including its quotes
        var j = i + 1
        while (j < sql.length && sql.charAt(j) != '\'') j += 1
        val end = math.min(j + 1, sql.length)
        sb.append(sql.substring(i, end)); i = end
      } else if (sql.startsWith(marker, i) &&
                 (i == 0 || (!Character.isLetterOrDigit(sql.charAt(i - 1)) &&
                             sql.charAt(i - 1) != '_'))) {
        // find matching close paren and the top-level comma
        var depth = 1
        var j = i + marker.length
        var topComma = -1
        while (depth > 0 && j < sql.length) {
          sql.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 1 => topComma = j
            case '\'' => // skip string literal
              j += 1
              while (j < sql.length && sql.charAt(j) != '\'') j += 1
            case _ =>
          }
          j += 1
        }
        if (topComma < 0) {
          // 1-arg round: leave as-is (already 0-dp)
          sb.append(sql.substring(i, j))
        } else {
          val close = j - 1
          val arg = rewriteOracle(sql.substring(i + marker.length, topComma).trim)
          val scaleStr = sql.substring(topComma + 1, close).trim
          val n = try scaleStr.toInt catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"rewriteOracle: round() scale must be an integer literal, got '$scaleStr' in: $sql")
          }
          val p = s"1e$n"
          sb.append(s"(round(($arg) * $p) / $p)")
        }
        i = j
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }
}

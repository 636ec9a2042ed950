package graft.operators

/** Minimal two-dialect SQL fragment vocabulary.
  *
  * The dedup/similarity operators need *identical arithmetic* in Spark
  * and in the DuckDB oracle; only function names differ. Each operator
  * builds its expressions once through this vocabulary, so the Spark
  * plan and the oracle SQL are generated from the same source and
  * cannot drift.
  *
  * Gotchas encoded here:
  *  - Spark `sequence(1,0)` counts DOWN while DuckDB
  *    `generate_series(1,0)` is empty — every range is guarded with
  *    greatest(...,1) by callers.
  *  - DuckDB `^` is power, Spark `^` is xor → xor() vs operator.
  *  - Spark is ANSI-mode (element_at OOB throws) → callers keep
  *    indices in bounds.
  *  - fold starts at literal 0 so Spark's aggregate() and DuckDB's
  *    list_reduce() produce bit-identical left-to-right double sums.
  */
final case class Dialect(
    transformFn: String, distinctFn: String, minFn: String, sizeFn: String,
    seqFn: String, splitFn: String,
    elem: (String, String) => String,
    shiftR: (String, String) => String,
    xor: (String, String) => String,
    unionSize: (String, String) => String,
    sumLong: String => String,
    sumDouble: String => String) {

  def range(lo: String, hi: String): String = s"$seqFn($lo, greatest($hi, $lo))"
  def transform(arr: String, lambda: String): String = s"$transformFn($arr, $lambda)"
  def distinct(arr: String): String = s"$distinctFn($arr)"
  def amin(arr: String): String = s"$minFn($arr)"
  def size(arr: String): String = s"$sizeFn($arr)"
}

object Dialect {
  val spark: Dialect = Dialect(
    transformFn = "transform", distinctFn = "array_distinct",
    minFn = "array_min", sizeFn = "size",
    seqFn = "sequence", splitFn = "split",
    elem = (a, i) => s"element_at($a, $i)",
    shiftR = (h, i) => s"shiftright($h, $i)",
    xor = (a, b) => s"($a ^ $b)",
    unionSize = (a, b) => s"size(array_union($a, $b))",
    sumLong = x => s"aggregate($x, CAST(0 AS BIGINT), (acc, v) -> acc + v)",
    sumDouble = x => s"aggregate($x, CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  val duck: Dialect = Dialect(
    transformFn = "list_transform", distinctFn = "list_distinct",
    minFn = "list_min", sizeFn = "len",
    seqFn = "generate_series", splitFn = "string_split",
    elem = (a, i) => s"$a[$i]",
    shiftR = (h, i) => s"($h >> $i)",
    xor = (a, b) => s"xor($a, $b)",
    unionSize = (a, b) => s"len(list_distinct(list_concat($a, $b)))",
    sumLong = x => s"CAST(list_sum($x) AS BIGINT)",
    sumDouble = x => s"list_reduce($x, (acc, v) -> acc + v)")

  def intersectSize(d: Dialect, a: String, b: String): String =
    if (d eq spark) s"size(array_intersect($a, $b))" else s"len(list_intersect($a, $b))"
}

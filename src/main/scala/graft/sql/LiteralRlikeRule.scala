package graft.sql

import graft.functions.KeywordMatch.MultiKeywordTags
import org.apache.spark.sql.catalyst.expressions.{Expression, GreaterThan, Literal, RLike, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: `text RLIKE '(lit1|lit2|...)'` where every branch is an
  * ESCAPED LITERAL (the exact pattern shape the reference engine builds —
  * `/root/reference/main.py:223-237` regex-escapes each keyword and
  * OR-joins them) is multi-literal containment, not general regex. Rewrite
  * it to one Aho-Corasick pass (`MultiKeywordTags`), which scans the text
  * once instead of backtracking over an n-way alternation.
  *
  * Conservative by construction: only fires when the whole pattern is a
  * single parenthesized alternation and every branch unescapes to a plain
  * literal (no anchors, classes, quantifiers, or empty branches) — anything
  * else keeps the built-in RLike.
  */
object LiteralRlikeRule extends Rule[LogicalPlan] {

  private val special = "\\^$.|?*+()[]{}".toSet

  /** Unescape a regex branch iff it is exactly an escaped literal. */
  private[graft] def unescapeLiteral(s: String): Option[String] = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') {
        if (i + 1 >= s.length) return None
        val n = s.charAt(i + 1)
        if (!special(n)) return None // escape of a non-special: \d, \w, ...
        out.append(n); i += 2
      } else if (special(c)) {
        return None // bare metacharacter
      } else {
        out.append(c); i += 1
      }
    }
    if (out.length == 0) None else Some(out.toString)
  }

  /** "(a|b|c)" -> Some(Seq(a, b, c)) iff every branch is an escaped literal. */
  private[graft] def literalAlternation(pattern: String): Option[Seq[String]] = {
    if (pattern.length < 2 || pattern.head != '(' || pattern.last != ')') return None
    val body = pattern.substring(1, pattern.length - 1)
    // split on TOP-LEVEL unescaped '|' only; nested parens would disqualify
    // the branches in unescapeLiteral anyway, but keep the split exact
    val branches = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\' && i + 1 < body.length) { cur.append(c).append(body.charAt(i + 1)); i += 2 }
      else if (c == '|') { branches += cur.toString; cur.setLength(0); i += 1 }
      else { cur.append(c); i += 1 }
    }
    branches += cur.toString
    val lits = branches.map(unescapeLiteral)
    if (lits.forall(_.isDefined)) Some(lits.map(_.get).toSeq) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case r @ RLike(subject, Literal(p: UTF8String, _)) =>
        literalAlternation(p.toString) match {
          case Some(lits) =>
            GreaterThan(
              Size(MultiKeywordTags(subject, Seq("any" -> lits)), legacySizeOfNull = false),
              Literal(0, IntegerType))
          case None => r
        }
    }
}

package graft.compile

/**
 * Strict `format` definitions as regex conjunctions, shared by the two
 * evaluation paths: the Catalyst lowering (`rlike`, ConstraintCompiler)
 * and the single-document evaluator ([[graft.exec.DocValidator]]) —
 * both use FIND semantics (`rlike` / `Matcher.find`), so the same
 * strings mean the same thing in both. A value passes when every `must`
 * pattern matches and no `mustNot` pattern does.
 */
private[graft] object FormatSpecs {
  final case class Spec(must: Seq[String], mustNot: Seq[String] = Nil)

  /** Numeric-CONTENT shape shared by both engines' `typeIs`/guard
    * logic — one definition so the content-typing rule cannot drift. */
  val numericContent: String =
    "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"

  private val h = "[0-9A-Fa-f]{1,4}"

  val specs: Map[String, Spec] = Map(
    // month-length aware: Feb 30/31 and day-31 in 30-day months are
    // rejected; Feb 29 in non-leap years needs arithmetic a regex
    // conjunction can't express — documented narrowing, not checked
    "date" -> Spec(
      Seq("^\\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\\d|3[01])$"),
      Seq("-02-3[01]$", "-(04|06|09|11)-31$")),
    "date-time" -> Spec(Seq(
      "^\\d{4}-\\d{2}-\\d{2}[Tt ]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?" +
        "([Zz]|[+-]\\d{2}:\\d{2})?$")),
    "email" -> Spec(Seq(
      "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$")),
    "uuid" -> Spec(Seq(
      "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-" +
        "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")),
    "uri" -> Spec(Seq("^[A-Za-z][A-Za-z0-9+.-]*:\\S*$")),
    "ipv4" -> Spec(Seq(
      "^((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.){3}" +
        "(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)$")),
    // full/compressed hex groups incl. "::"; no embedded-IPv4 forms.
    // Each "::" alternative bounds the group count so left+right can
    // never exceed 7 groups ("::" stands for >=1 zero group) —
    // unbounded (h:)* admitted 9+-group addresses.
    "ipv6" -> Spec(Seq(
      s"^(($h:){7}$h|($h:){1,7}:|($h:){1,6}:$h|" +
        s"($h:){1,5}(:$h){1,2}|($h:){1,4}(:$h){1,3}|" +
        s"($h:){1,3}(:$h){1,4}|($h:){1,2}(:$h){1,5}|" +
        s"$h:(:$h){1,6}|:((:$h){1,7}|:))$$")),
    "hostname" -> Spec(Seq(
      "^(?=.{1,253}$)([A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)" +
        "(\\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$")),
    "time" -> Spec(Seq(
      "^([01]\\d|2[0-3]):[0-5]\\d:([0-5]\\d|60)(\\.\\d+)?" +
        "([Zz]|[+-]([01]\\d|2[0-3]):[0-5]\\d)$")),
    // RFC 6901: empty, or /-prefixed tokens; ~ only as ~0 / ~1
    "json-pointer" -> Spec(
      Seq("^(/([^/~]|~[01])*)*$"), Seq("~(?![01])")),
    // ISO-8601 duration, at least one component after P
    "duration" -> Spec(Seq(
      "^P(\\d+Y)?(\\d+M)?(\\d+W)?(\\d+D)?" +
        "(T(\\d+H)?(\\d+M)?(\\d+(\\.\\d+)?S)?)?$",
      "^P.*[YMWDHS]")))
}

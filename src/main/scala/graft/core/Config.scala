package graft.core

/** `${ENV}` interpolation over nested configuration (SURVEY §2.4 C6;
  * kafka_publisher.py:225-245, duplicated s3_connector_deployer.py:15-35):
  * recursively substitutes `${VAR}` in strings across nested
  * maps/sequences, leaving unknown variables in place (the reference's
  * regex does the same — no error on miss).
  */
object Config {

  private val VarRe = raw"\$$\{([^}]+)\}".r

  def interpolate(s: String, env: Map[String, String]): String =
    VarRe.replaceAllIn(s, m =>
      scala.util.matching.Regex.quoteReplacement(
        env.getOrElse(m.group(1), m.matched)))

  /** Deep interpolation over a JSON-shaped structure
    * (Map[String, Any] / Seq[Any] / String leaves).
    */
  def interpolateAny(value: Any, env: Map[String, String]): Any = value match {
    case s: String => interpolate(s, env)
    case m: Map[_, _] =>
      m.map { case (k, v) => k -> interpolateAny(v, env) }
    case xs: Seq[_] => xs.map(interpolateAny(_, env))
    case other => other
  }
}

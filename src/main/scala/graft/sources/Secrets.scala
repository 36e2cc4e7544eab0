package graft.sources

import scala.util.Try

/** Config/secret lookup (SURVEY.md §2.1 S5): the reference resolves a
  * secret id to either parsed JSON (api-keys payload) or a raw string
  * (project id), returning None on failure
  * (`deployment_function.py:23-43`). Re-expressed provider-agnostically:
  * a backing store function (env vars, a mounted file, any secret
  * manager client) composed with the same JSON-or-string fallback.
  */
object Secrets {

  type Store = String => Option[String]

  /** Environment-variable store (the zero-egress default). */
  val envStore: Store = k => sys.env.get(k)

  /** Minimal flat-JSON-object parser (no external deps): returns the
    * string fields of `{"k": "v", ...}`; None when not such an object.
    * The reference only ever stores flat string→string payloads
    * (`deployment_function.py:46-49`).
    */
  private[sources] def parseFlatJson(s: String): Option[Map[String, String]] = {
    val t = s.trim
    if (!t.startsWith("{") || !t.endsWith("}")) return None
    val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    val inner = t.substring(1, t.length - 1).trim
    if (inner.isEmpty) return Some(Map.empty)
    // Match pairs against the INNER text, and require that stripping the
    // matched pairs leaves only commas/whitespace — a nested object like
    // {"a": {"k": "v"}} leaves `"a": {` residue and correctly falls
    // through to the raw-string branch instead of mis-parsing to {k: v}.
    val found = pair.findAllMatchIn(inner).map { m =>
      def unesc(x: String) = x.replace("\\\"", "\"").replace("\\\\", "\\")
      unesc(m.group(1)) -> unesc(m.group(2))
    }.toMap
    val residue = pair.replaceAllIn(inner, "")
    if (found.isEmpty || !residue.matches("""[\s,]*""")) None else Some(found)
  }

  /** JSON-or-string fallback: a JSON-object secret yields its field map,
    * anything else the raw string; lookup/parse failure → None (callers
    * continue without the unit, matching per-unit isolation).
    */
  def resolve(store: Store, secretId: String)
      : Option[Either[String, Map[String, String]]] =
    Try(store(secretId)).toOption.flatten.map { raw =>
      parseFlatJson(raw) match {
        case Some(m) => Right(m)
        case None    => Left(raw)
      }
    }
}

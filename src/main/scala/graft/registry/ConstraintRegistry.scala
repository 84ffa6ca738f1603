package graft.registry

import java.util.concurrent.ConcurrentHashMap
import graft.dsl.{ConstraintSuite, ConstraintJson}

/**
 * URI/name → constraint-suite map, the analogue of the reference's
 * `SchemaRegistry` (`SchemaRegistry.java:10-42`: a
 * `ConcurrentHashMap<String,String>` with register / unregister / clear /
 * contains / resolve). Thread-safe; consulted at COMPILE time when a
 * [[graft.dsl.Constraint.Ref]] node is inlined (the reference resolves
 * `$ref` through registry → meta-schemas → HTTP → classpath,
 * `BlazeWrapper.java:253-281`; in this zero-egress engine the chain is
 * registry → classpath).
 */
final class ConstraintRegistry {
  private val suites = new ConcurrentHashMap[String, ConstraintSuite]()

  def register(name: String, suite: ConstraintSuite): Unit =
    suites.put(name, suite)

  /** Register from a JSON string (mirrors registry-of-schema-strings). */
  def registerJson(name: String, json: String): Unit =
    suites.put(name, ConstraintJson.parseSuite(json))

  def unregister(name: String): Unit = suites.remove(name)

  def clear(): Unit = suites.clear()

  def contains(name: String): Boolean = suites.containsKey(name)

  def resolve(name: String): Option[ConstraintSuite] =
    Option(suites.get(name)).orElse(resolveClasspath(name))

  /** Classpath fallback, the analogue of `readClasspathResource`
    * (`BlazeWrapper.java:172-190`): `classpath://x.json` loads a suite
    * JSON from test/main resources. Parsed ONCE and cached in the
    * registry map — a suite with many refs to the same resource would
    * otherwise re-open and re-parse it per ref during compilation. */
  private def resolveClasspath(name: String): Option[ConstraintSuite] =
    if (!name.startsWith("classpath://")) None
    else Option(suites.computeIfAbsent(name, _ => {
      val path = name.stripPrefix("classpath://")
      val in = getClass.getClassLoader.getResourceAsStream(path)
      if (in == null) null // computeIfAbsent: null = no mapping cached
      else
        try ConstraintJson.parseSuite(new String(
          in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
        finally in.close()
    }))
}

object ConstraintRegistry {
  /** Convenience empty registry. */
  def empty: ConstraintRegistry = new ConstraintRegistry
}

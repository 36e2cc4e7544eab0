package graft

import graft.sources.Secrets

class SecretsSpec extends SparkSpec {

  private val store: Secrets.Store = Map(
    "api-keys" -> """{"tomtom": "T-123", "openweather": "OW-456"}""",
    "project-id" -> "my-project-42",
    "weird" -> """{not json at all""").get

  test("JSON-object secret resolves to its field map") {
    assert(Secrets.resolve(store, "api-keys") ==
      Some(Right(Map("tomtom" -> "T-123", "openweather" -> "OW-456"))))
  }

  test("plain-string secret falls back to the raw string") {
    assert(Secrets.resolve(store, "project-id") == Some(Left("my-project-42")))
  }

  test("malformed JSON-ish secret falls back to the raw string") {
    assert(Secrets.resolve(store, "weird") == Some(Left("{not json at all")))
  }

  test("missing secret resolves to None (unit skipped, run continues)") {
    assert(Secrets.resolve(store, "nope").isEmpty)
    val throwing: Secrets.Store = _ => throw new RuntimeException("backend down")
    assert(Secrets.resolve(throwing, "x").isEmpty)
  }

  test("nested-object secret falls back to the raw string (regression: " +
    "inner pairs of {\"a\": {\"k\": \"v\"}} were mis-parsed as flat)") {
    val raw = """{"a": {"k": "v"}}"""
    val s: Secrets.Store = Map("n" -> raw, "arr" -> """{"a": ["x", "y"]}""").get
    assert(Secrets.resolve(s, "n") == Some(Left(raw)))
    assert(Secrets.resolve(s, "arr") == Some(Left("""{"a": ["x", "y"]}""")))
  }

  test("escaped quotes/backslashes in JSON values") {
    val s: Secrets.Store =
      Map("k" -> """{"a": "x\"y", "b": "c\\d"}""").get
    assert(Secrets.resolve(s, "k") ==
      Some(Right(Map("a" -> "x\"y", "b" -> "c\\d"))))
  }
}

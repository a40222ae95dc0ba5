package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.parseQueriesMap]] on BOTH artifact renderings — the
  * round-18 planted-floor end-to-end test caught the strict regex
  * silently parsing the pretty-printed BENCH_FLOORS.json as EMPTY,
  * which disarmed the regression-rerun rule (the r17 verdict item 5
  * failure, resurfaced one level down). No Spark session needed. */
class BenchParseSpec extends AnyFunSuite {

  test("compact rendering (BENCH_FULL.json shape)") {
    val s = """{"metric":"total","value":1.0,"queries":{"q01":0.54,"q02_agg":2.14},"errors":[]}"""
    assert(Bench.parseQueriesMap(s) === Map("q01" -> 0.54, "q02_agg" -> 2.14))
  }

  test("pretty-printed rendering (BENCH_FLOORS.json shape)") {
    val s =
      """{
        | "round": 18,
        | "note": "floors with (parens) and {nothing nested}",
        | "queries": {
        |  "q02_agg_lineitem_pricing": 0.535,
        |  "q104_token_entropy": 0.427
        | }
        |}""".stripMargin
    assert(Bench.parseQueriesMap(s) ===
      Map("q02_agg_lineitem_pricing" -> 0.535, "q104_token_entropy" -> 0.427))
  }

  test("missing queries key parses empty, not a throw") {
    assert(Bench.parseQueriesMap("""{"round": 18}""") === Map.empty)
    assert(Bench.parseQueriesMap("not json at all") === Map.empty)
  }

  test("scientific-notation values parse (ADVICE r18)") {
    val s = """{"queries":{"q68":1.0E-4,"q69":2.5e3,"q70":-1.2E+2,"q71":0.59}}"""
    assert(Bench.parseQueriesMap(s) ===
      Map("q68" -> 1.0e-4, "q69" -> 2.5e3, "q70" -> -1.2e2, "q71" -> 0.59))
  }

  test("a malformed value drops that entry, keeps the rest, no throw") {
    // double-dot can't convert to Double; the entry is skipped loudly
    // (stderr) instead of the whole map silently collapsing to empty
    val s = """{"queries":{"q01":1..2,"q02":0.5}}"""
    assert(Bench.parseQueriesMap(s) === Map("q02" -> 0.5))
  }

  test("an entry whose value matches no number pattern still keeps the rest") {
    // a quoted value (hand-edit typo class): the K:V regex never matches
    // it, so without the raw-key shortfall check it would vanish with NO
    // signal at all; the parse must keep every well-formed neighbor and
    // warn (stderr) on the shortfall rather than throw
    val s = """{"queries":{"q01":"1.2","q02":0.5,"q03":1.75}}"""
    assert(Bench.parseQueriesMap(s) === Map("q02" -> 0.5, "q03" -> 1.75))
  }
}

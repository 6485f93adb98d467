package graft.operators

import graft.SparkSuite

/** Markov transition matrix: pairing, normalization, edge cases. */
class MarkovSpec extends SparkSuite {
  import spark.implicits._

  test("transition counts and conditional probabilities on a hand " +
      "sequence; single-event keys contribute nothing") {
    val events = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "c"),
      (3L, 1L, "z")
    ).toDF("k", "seq", "st")
    val got = Markov.transitions(events, "k", "st", Seq("seq"))
      .select($"from_state", $"to_state", $"n", $"n_from", $"p")
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(got == Set(
      ("a", "b", 2L, 3L, 2.0 / 3),
      ("a", "c", 1L, 3L, 1.0 / 3),
      ("b", "a", 1L, 1L, 1.0)))
  }

  test("keys never mix: identical sequences in two keys double the " +
      "counts, not the states") {
    val events = Seq(
      (1L, 1L, "x"), (1L, 2L, "y"),
      (2L, 1L, "x"), (2L, 2L, "y")
    ).toDF("k", "seq", "st")
    val got = Markov.transitions(events, "k", "st", Seq("seq"))
      .select($"from_state", $"to_state", $"n")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("x", "y", 2L)))
  }
}

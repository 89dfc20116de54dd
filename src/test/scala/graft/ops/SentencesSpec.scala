package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class SentencesSpec extends AnyFunSuite {

  private def split(s: String) = Sentences.splitSentences(s)

  test("basic terminator + capital boundary") {
    assert(split("First one. Second two! Third three? Fourth.") ===
      IndexedSeq("First one.", "Second two!", "Third three?", "Fourth."))
  }

  test("abbreviations and initials do not split") {
    assert(split("See Dr. Smith today. Then leave.") ===
      IndexedSeq("See Dr. Smith today.", "Then leave."))
    assert(split("Work by J. Doe et al. Continued here.") ===
      IndexedSeq("Work by J. Doe et al.", "Continued here."))
    assert(split("Costs rose (see Fig. 3) a lot. Then fell.") ===
      IndexedSeq("Costs rose (see Fig. 3) a lot.", "Then fell."))
  }

  test("decimals and lowercase continuations do not split") {
    assert(split("Pi is 3.14 exactly. Yes.") ===
      IndexedSeq("Pi is 3.14 exactly.", "Yes."))
    assert(split("version 2. see notes") ===
      IndexedSeq("version 2. see notes")) // lowercase after dot: no split
  }

  test("terminator runs and closers attach to the left sentence") {
    // an OPENING quote after a terminator is not a boundary (the pinned
    // spec requires uppercase/digit directly) — "Really?!" binds to the
    // quoted sentence; the closer-than-boundary fires after `"Sure."`
    assert(split("Really?! \"Sure.\" Next one.") ===
      IndexedSeq("Really?! \"Sure.\"", "Next one."))
    assert(split("Wait... Then go.") === IndexedSeq("Wait...", "Then go."))
  }

  test("no boundary yields the trimmed whole; null/empty are empty") {
    assert(split("  just words no caps  ") === IndexedSeq("just words no caps"))
    assert(split(null) === IndexedSeq())
    assert(split("   ") === IndexedSeq())
  }

  test("all three fixture guards hold in one text (Dr./3.14/J. stay inline)") {
    assert(split("Start one. Dr. Next two. Pi 3.14 three. J. Doe four.") ===
      IndexedSeq("Start one.", "Dr. Next two.", "Pi 3.14 three.", "J. Doe four."))
  }
}

package graft

import graft.ops.Quality

/** License-marker census (q213): SPDX extraction, marker families,
  * and the fixed verdict precedence. */
class LicenseSpec extends SparkTestBase {
  import spark.implicits._

  private def census(rows: (Long, String)*) =
    Quality.licenseCensus(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getBoolean(2), r.getBoolean(3),
          r.getString(4)))).toMap

  test("verdict precedence: spdx > copyleft prose > permissive prose > none") {
    val got = census(
      0L -> "header SPDX-License-Identifier: MIT but discusses the GNU General Public License",
      1L -> "SPDX-License-Identifier: GPL-3.0-only",
      2L -> "under the GNU General Public License; also the MIT License text",
      3L -> "licensed under the Apache License, Version 2.0",
      4L -> "no markers at all",
      5L -> "SPDX-License-Identifier: Artistic-2.0 odd choice")
    assert(got(0L) == ((Some("MIT"), true, false, "permissive")),
      "an explicit SPDX declaration outranks prose mentions")
    assert(got(1L)._4 == "copyleft" && got(1L)._1.contains("GPL-3.0-only"))
    assert(got(2L) == ((None, true, true, "copyleft")),
      "copyleft outranks permissive among prose hits")
    assert(got(3L) == ((None, false, true, "permissive")))
    assert(got(4L) == ((None, false, false, "none")))
    assert(got(5L)._4 == "other-spdx")
  }

  test("marker variants: case, CC, LGPL digit forms, BSD clause") {
    val got = census(
      1L -> "released under the mit license terms",
      2L -> "see LGPL-2.1 for details",
      3L -> "Creative Commons attribution",
      4L -> "BSD 3-Clause licensed",
      5L -> "a GPListic word alone must not match") // \bGPL\b guard
    assert(got(1L)._4 == "permissive")
    assert(got(2L)._4 == "copyleft")
    assert(got(3L)._4 == "copyleft")
    assert(got(4L)._4 == "permissive")
    assert(got(5L)._4 == "none")
  }

  test("injectLicenses plants all five classes deterministically") {
    val docs = (0L until 10L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val got = Quality.licenseCensus(Quality.injectLicenses(docs)).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(got(0L) == "permissive" && got(5L) == "permissive") // MIT spdx
    assert(got(1L) == "copyleft" && got(6L) == "copyleft")     // GPL spdx
    assert(got(2L) == "copyleft" && got(7L) == "copyleft")     // prose precedence
    assert(got(3L) == "permissive" && got(8L) == "permissive") // Apache prose
    assert(got(4L) == "none" && got(9L) == "none")
  }
}

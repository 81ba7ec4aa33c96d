// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's canonical tokenization, shared by every text operator
  * (and mirrored verbatim in each DuckDB oracle) so queries can never
  * silently disagree about what a "token" is.
  */
object Text {
  /** Whitespace tokens with empties removed. */
  def tokens(c: Column): Column =
    filter(split(c, " "), w => length(w) > lit(0))

  /** DuckDB equivalent of [[tokens]] applied to the `text` column. */
  val tokensSql: String =
    "list_filter(string_split(text, ' '), x -> length(x) > 0)"
}

package graft.registry

/** Shared oracle-SQL generation utilities for the per-domain query
  * registries (the round-15 split of the monolithic SparkEntry maps:
  * each registry holds its queries AND their DuckDB oracle SQL side by
  * side, and SparkEntry concatenates). */
private[graft] object OracleSql {
  /** Standard-SQL single-quoted literal (quote doubling only — no
    * backslash processing in standard strings, so regex patterns embed
    * verbatim). */
  def q(s: String): String = "'" + s.replace("'", "''") + "'"
}

package graft.queries

/** Shared SQL fragments for the generated DuckDB oracles — one
  * definition per algorithm template so the oracles for different
  * queries can never drift apart semantically. */
private[queries] object OracleFragments {

  /** Unrolled min-label propagation steps over a symmetrized edge CTE
    * `symName(src, dst)` and a vertex CTE `v(id)`; the caller defines
    * `l0 AS (SELECT id, id AS label FROM v)`. Produces `l1..l$iters`. */
  def minLabelSteps(symName: String, iters: Int): String =
    (1 to iters).map { i =>
      s"""l$i AS (SELECT v.id,
         |    least(l${i - 1}.label, COALESCE(m.minl, l${i - 1}.label)) AS label
         |  FROM v JOIN l${i - 1} ON v.id = l${i - 1}.id
         |  LEFT JOIN (SELECT $symName.dst AS id, min(l${i - 1}.label) AS minl
         |             FROM $symName JOIN l${i - 1} ON $symName.src = l${i - 1}.id
         |             GROUP BY $symName.dst) m ON v.id = m.id)""".stripMargin
    }.mkString(",\n")
}

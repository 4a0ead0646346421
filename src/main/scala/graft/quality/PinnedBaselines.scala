package graft.quality

import graft.profile.ColProfile

/** Baseline profiles captured from a `Profiler.profile` run over the
  * sf0.001 harness data (via `graft.Verify /root/testdata/sf0.001`), pinned
  * as literals — exactly how the reference ships baseline statistics inside
  * its test definitions (reference demo/input_data/data_tests.csv:
  * `Baseline_Avg=2513.885, Baseline_SD=…`). Pinning makes the generated
  * suite a *static* function of the baseline, so the DuckDB oracle SQL can
  * be produced without running Spark (TestEvaluator.oracleSql applies), and
  * evaluation against a data refresh needs no runtime profiling pass.
  *
  * To refresh after a data change: re-run `graft.Verify` at the baseline SF
  * and transcribe `profile_lineitem` (see ColProfile field order).
  */
object PinnedBaselines {

  /** sf0.001 lineitem profile (11 columns, 6000 rows). */
  val lineitem: Seq[ColProfile] = Seq(
    ColProfile("lineitem", "l_orderkey", 0L, "bigint", 6000L, 6000L, 0L, Some(1473L),
      None, None, None, None, None, None,
      Some(0.0), Some(1499.0), Some(748.2542), Some(433.3829),
      Some(4489525.0), None, Some(2L), Some(0L), None, None, None),
    ColProfile("lineitem", "l_partkey", 1L, "bigint", 6000L, 6000L, 0L, Some(200L),
      None, None, None, None, None, None,
      Some(0.0), Some(199.0), Some(98.751), Some(57.8385),
      Some(592506.0), None, Some(37L), Some(0L), None, None, None),
    ColProfile("lineitem", "l_suppkey", 2L, "bigint", 6000L, 6000L, 0L, Some(10L),
      None, None, None, None, None, None,
      Some(0.0), Some(9.0), Some(4.5147), Some(2.8577),
      Some(27088.0), None, Some(545L), Some(0L), None, None, None),
    ColProfile("lineitem", "l_linenumber", 3L, "int", 6000L, 6000L, 0L, Some(7L),
      None, None, None, None, None, None,
      Some(1.0), Some(7.0), Some(4.0428), Some(2.0232),
      Some(24257.0), None, Some(0L), Some(0L), None, None, None),
    ColProfile("lineitem", "l_quantity", 4L, "double", 6000L, 6000L, 0L, Some(50L),
      None, None, None, None, None, None,
      Some(1.0), Some(50.0), Some(25.3762), Some(14.5212),
      Some(152257.0), Some(0.0), Some(0L), Some(0L), None, None, None),
    ColProfile("lineitem", "l_extendedprice", 5L, "double", 6000L, 6000L, 0L,
      Some(5998L), None, None, None, None, None, None,
      Some(914.44), Some(104998.18), Some(52894.1262), Some(30141.1112),
      Some(3.1736475731e8), Some(2980.31), Some(0L), Some(0L),
      None, None, None),
    ColProfile("lineitem", "l_discount", 6L, "double", 6000L, 6000L, 0L, Some(11L),
      None, None, None, None, None, None,
      Some(0.0), Some(0.1), Some(0.0505), Some(0.0289),
      Some(302.75), Some(302.75), Some(290L), Some(0L), None, None, None),
    ColProfile("lineitem", "l_tax", 7L, "double", 6000L, 6000L, 0L, Some(9L),
      None, None, None, None, None, None,
      Some(0.0), Some(0.08), Some(0.04), Some(0.0235),
      Some(239.87), Some(239.87), Some(361L), Some(0L), None, None, None),
    ColProfile("lineitem", "l_returnflag", 8L, "string", 6000L, 6000L, 0L, Some(3L),
      Some(1L), Some(1L), Some(1.0), Some(0L), Some("A"), Some("R"),
      None, None, None, None, None, None, None, None, None, None, None),
    ColProfile("lineitem", "l_linestatus", 9L, "string", 6000L, 6000L, 0L, Some(2L),
      Some(1L), Some(1L), Some(1.0), Some(0L), Some("F"), Some("O"),
      None, None, None, None, None, None, None, None, None, None, None),
    ColProfile("lineitem", "l_shipdate", 10L, "timestamp", 6000L, 6000L, 0L,
      Some(2289L), None, None, None, None, None, None,
      None, None, None, None, None, None, None, None,
      Some("1995-01-02 00:00:00"), Some("2001-11-04 00:00:00"), Some(2289L)),
  )

  /** Top-k LOVs of the low-cardinality string columns (Profiler.topK order:
    * count desc, value asc) — feeds LOV_Match generation.
    */
  val lineitemLovs: Map[String, Seq[String]] = Map(
    "l_returnflag" -> Seq("N", "R", "A"),
    "l_linestatus" -> Seq("F", "O"))

  /** The generated suite over the pinned baseline — static, so it has a
    * DuckDB oracle like any hand-written suite.
    */
  lazy val lineitemDefs: Seq[TestDef] =
    TestGenerator.generate(lineitem, lineitemLovs)

  /** sf0.001 documents profile (5 columns, 500 rows) — the text-table
    * generation path.
    */
  val documents: Seq[ColProfile] = Seq(
    ColProfile("documents", "doc_id", 0L, "bigint", 500L, 500L, 0L, Some(500L),
      None, None, None, None, None, None,
      Some(0.0), Some(499.0), Some(249.5), Some(144.4818),
      Some(124750.0), None, Some(1L), Some(0L), None, None, None),
    ColProfile("documents", "text", 1L, "string", 500L, 500L, 0L, Some(500L),
      Some(47L), Some(558L), Some(306.312), Some(0L),
      Some("a a part batch customer agg data sort slow scan merge vector " +
        "big filter spark stream group query part value data big line agg " +
        "batch fast line part"),
      Some("window vector stream scan query group small customer agg big " +
        "small small row big agg fast spark"),
      None, None, None, None, None, None, None, None, None, None, None),
    ColProfile("documents", "lang", 2L, "string", 500L, 500L, 0L, Some(5L),
      Some(2L), Some(2L), Some(2.0), Some(0L), Some("de"), Some("zh"),
      None, None, None, None, None, None, None, None, None, None, None),
    ColProfile("documents", "source", 3L, "string", 500L, 500L, 0L, Some(20L),
      Some(4L), Some(5L), Some(4.5), Some(0L), Some("src0"), Some("src9"),
      None, None, None, None, None, None, None, None, None, None, None),
    ColProfile("documents", "n_chars", 4L, "bigint", 500L, 500L, 0L, Some(311L),
      None, None, None, None, None, None,
      Some(47.0), Some(558.0), Some(306.312), Some(143.4846),
      Some(153156.0), None, Some(0L), Some(0L), None, None, None),
  )

  /** Full value domains of the low-cardinality document columns (count
    * desc, then value — `source` needs all 20 members, not a top-k).
    */
  val documentsLovs: Map[String, Seq[String]] = Map(
    "lang" -> Seq("en", "fr", "es", "zh", "de"),
    "source" -> (Seq("src0", "src1") ++ (10 to 19).map(i => s"src$i") ++
      (2 to 9).map(i => s"src$i")))

  lazy val documentsDefs: Seq[TestDef] =
    TestGenerator.generate(documents, documentsLovs)
}

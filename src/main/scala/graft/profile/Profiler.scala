package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiler.
  *
  * Re-expresses the reference's "data profiling of 51 data characteristics …
  * fast in database SQL execution (no data copies)"
  * (reference README.md:207-209; parameter vocabulary in
  * demo/input_data/data_tests.csv — Baseline_Ct / Baseline_Value_Ct /
  * Baseline_Unique_Ct / Baseline_Avg / Baseline_SD / Baseline_Sum / min-max
  * dates / value lengths) as per-column Spark `agg()` passes: one struct
  * of ~50 statistics per input column, the one-row passes executed as
  * concurrent Spark actions and recombined into one LocalRelation row
  * (graft.operators.ConcurrentPasses — the r8 rework that replaced the
  * serializing crossJoin/BNLJ spine), then `explode` to one profile row
  * per column.
  *
  * Scale notes (100 TB): every pass is a column-pruned scan + a one-row
  * partial-aggregate shuffle, so for an unfiltered table total bytes
  * read equal one full-width scan however the passes are grouped (a
  * filtered/sampled input additionally re-reads its predicate columns
  * in each pass). Per-COLUMN passes (not one wide
  * agg) are deliberate: a single all-column aggregate generates a codegen
  * update method far past the JVM's ~8 KB JIT threshold — it compiles
  * but runs as interpreted bytecode (measured 20 s+ for a 450k-row scan
  * at sf0.1; 4× faster split). Exact distinct counts are ONE NARROW PASS
  * PER DISTINCT EXPRESSION — putting k exact countDistincts in one agg()
  * would make Catalyst plan an Expand that replicates every input row
  * once per distinct expression, the same scale hazard the quality
  * evaluator avoids (see TestEvaluator). `exactDistinct=false` (the
  * at-scale mode, when oracle parity is not required) switches to
  * HyperLogLog sketches that ride in the base passes. Percentiles ride
  * narrow per-column ObjectHashAggregate passes of their own (a
  * TypedImperative aggregate anywhere in a declarative pass would
  * de-codegen it). See profileWith's scaladoc for the round-7 pass
  * architecture: canonicalized pass inputs so all same-type passes
  * share ONE compiled codegen unit, and why a measured melt
  * (unpivot + grouped-aggregate) variant was rejected on this data
  * layout.
  *
  * Numeric parity design: sums are computed in DECIMAL(28,6) — exact and
  * addition-order-independent, so results hash-match any other engine
  * computing the same decimal sums. Mean/stddev/skew/kurtosis are then
  * *derived* from the exact sums in double math, which is deterministic
  * given identical expression trees. The output is 51 per-column
  * characteristics, matching the cardinality the reference declares
  * (README.md:207). Caveat for extreme-magnitude columns (|x| ≳ 1e8, e.g.
  * epoch-millis stored as numbers): the 4th-power moment sums would
  * overflow DECIMAL(38,6) — profile such columns centered/scaled, or accept
  * null skew/kurtosis (Spark yields null on decimal overflow).
  */
object Profiler {

  /** DECIMAL type used for exact, order-independent numeric sums. */
  val SumDec: DecimalType = DecimalType(28, 6)

  /** Wider decimal for 3rd/4th-power sums (skewness/kurtosis moments). */
  val MomDec: DecimalType = DecimalType(38, 6)

  /** Magnitude bound for the moment sums: |x| < 3e7 keeps a single
    * x⁴ cast at ≈ 8.1e29, inside DECIMAL(38,6)'s ~1e32 integral range
    * with headroom for the sum. Columns holding larger values (epoch
    * millis, wide surrogate keys — the sf1 scale gate's strided keys
    * found this as a hard ANSI cast error) get NULL skew/kurtosis
    * instead of a failed profile, exactly the documented caveat.
    */
  val MomentSafeAbs: Double = 3e7

  def typeLabel(dt: DataType): String = dt match {
    case LongType      => "bigint"
    case IntegerType   => "int"
    case DoubleType    => "double"
    case FloatType     => "float"
    case StringType    => "string"
    case TimestampType => "timestamp"
    case _: DecimalType => "decimal"
    case BooleanType   => "boolean"
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => "floatarr"
    case other         => other.simpleString
  }

  /** Profile every (profilable) column of `df` in one aggregate pass.
    * Output: one row per column, ordered by column_name (deterministic for
    * the oracle hash compare).
    *
    * EAGER: the scan passes execute (concurrently) at call time — the
    * returned frame is a small LocalRelation-backed result, not a lazy
    * plan over `df` (ConcurrentPasses contract). Failures surface here,
    * not at the first downstream action; callers that only want the
    * pass PLANS use [[passesFor]]/[[passesForTable]].
    */
  def profile(df: DataFrame, tableName: String,
              exactDistinct: Boolean = true): DataFrame =
    profileWith(df, tableName,
      distincts = if (exactDistinct) "exact" else "hll",
      exactPercentiles = exactDistinct)

  /** [[profile]] with the distinct strategy and percentile exactness
    * DECOUPLED (the r5 advice: coupling them made the sampled-oracle mode
    * pay one exact countDistinct pass per column only to null the results
    * at assembly — Catalyst cannot prune a crossJoined pass through the
    * struct/explode recombination, so the waste was ~n narrow scans).
    *
    *  - distincts = "exact": one narrow pass per column (+ per timestamp
    *    date) — the oracle-parity mode;
    *  - "hll": HyperLogLog sketches riding the base passes — the 100 TB
    *    one-scan-per-column mode;
    *  - "dates": ONLY the exact distinct-DATE passes; per-column
    *    distinct_ct is emitted NULL without ever being computed — the
    *    sampled mode, where a sample's distinct count has no unbiased
    *    scale-up (see [[profileSampled]]) but distinct_date_ct survives
    *    as a floor-compared lower bound.
    *
    * Pass architecture (revised round 7, after measurement):
    *
    *  - PER-COLUMN passes, not per-type-family melts. A melted variant
    *    (unpivot + groupBy(column_name)) was built and measured: it cuts
    *    generated-code volume ~25× but serializes execution on this
    *    data layout — the driver testdata writes ONE parquet row group
    *    per file, so every scan is a single task however
    *    maxPartitionBytes is set (measured invariant 11–12 s at 128m/8m/
    *    2m), and a family pass puts ~4 columns of aggregate arithmetic
    *    on one core while the narrow passes run as ~30 CONCURRENT
    *    single-task jobs that fill the 32-core box (6.6 s vs 14.1 s
    *    bench median on sf0.1 lineitem). At 100 TB row groups abound
    *    and both shapes parallelize; the narrow shape additionally
    *    bounds every generated update method far under the ~8 KB JIT
    *    threshold that rules out one wide all-column aggregate.
    *  - Every pass reads its column through a CANONICALIZING projection
    *    (`select(col(c).as("__v"))`) and aggregates FLAT, META-FREE
    *    expressions, renamed per-column only ABOVE the aggregate. Alias
    *    names and reference literals never reach generated-code bodies,
    *    so all same-type passes — across columns, tables, and the whole
    *    profile query family — compile to IDENTICAL Janino units and
    *    hit the generated-class cache after the first compile. The old
    *    shape embedded per-column meta literals (ordinal etc.) in each
    *    pass's result projection, making every unit unique: ~100
    *    compilation units and 10–30 s of re-paid Janino per profile
    *    invocation (measured via CodegenMetrics: 137 compiles / 31 s on
    *    the first sf0.1 profile, ~40 recompiles on repeats as the
    *    100-entry class cache thrashed — also why
    *    spark.sql.codegen.cache.maxEntries is raised in Sessions).
    *  - Exact distinct counts are ONE NARROW PASS PER COLUMN — putting
    *    k exact countDistincts in one agg() would make Catalyst plan an
    *    Expand that replicates every input row once per distinct
    *    expression, the same scale hazard the quality evaluator avoids.
    *  - Percentiles are TypedImperativeAggregates (exact AND approx):
    *    ONE of them in a base agg forces the whole pass onto
    *    ObjectHashAggregate, where every other stat evaluates
    *    interpreted per row (measured ~20× at sf0.1). Quartiles ride
    *    narrow per-column passes of their own — maximally concurrent,
    *    and one shared codegen shape.
    *  - Passes recombine through a BALANCED crossJoin tree (each side
    *    one row): a left-deep foldLeft re-analyzed the accumulated plan
    *    at every step, O(n²) in pass count.
    */
  private[graft] def profileWith(df: DataFrame, tableName: String,
                                 distincts: String,
                                 exactPercentiles: Boolean): DataFrame = {
    // "none" is the incremental/mergeable mode (see mergeProfiles and
    // the streaming profiler): base passes only — distinct counts and
    // percentiles are not exactly mergeable across disjoint slices, so
    // a per-batch profile destined for a merge fold would compute them
    // only to have the merge null them out. "sketch" is "none" plus a
    // MERGEABLE DataSketches HLL per column (`distinct_sketch` binary):
    // sketches union exactly across slices (register-wise max — order-
    // independent), so the streaming fold can carry cardinality at
    // 100 TB where the exact count cannot merge. Sketch input is
    // xxhash64(value) — hll_sketch_agg accepts int/long/string/binary
    // only, and hashing first makes one codegen shape serve every
    // column type (64-bit collisions are far below the sketch's own
    // error at any realistic cardinality).
    require(Set("exact", "hll", "dates", "none", "sketch")(distincts),
      s"bad distincts mode: $distincts")
    val fields = df.schema.fields.zipWithIndex.filter {
      case (f, _) => isProfilable(f.dataType)
    }.toSeq
    require(fields.nonEmpty, s"no profilable columns in $tableName")
    val passes = memoPasses(df, s"std:$distincts:$exactPercentiles")(
      buildPasses(df, fields, distincts, exactPercentiles))
    val agged = graft.operators.ConcurrentPasses.collectOneRow(
      df.sparkSession, passes)
    assemble(agged, tableName, fields, distincts)
  }

  /** PASS-PLAN memo (r15): see [[graft.operators.PassMemo]] — one
    * profile invocation spends ~2 s of pure DRIVER work building,
    * analyzing and planning its ~31 fresh pass DataFrames (measured,
    * tools/ProfInterleave: pre-built passes collect in 1.2-1.5 s where
    * the full profile() takes 3.3-5.1 s on sf0.1 lineitem). Plans are
    * cached, results never: every invocation re-executes every
    * scan/aggregate job.
    */
  private def memoPasses(df: DataFrame, tag: String)
                        (build: => Seq[DataFrame]): Seq[DataFrame] =
    graft.operators.PassMemo.passes(df, tag)(build)

  /** Recombine the collected one-row pass results into the profile
    * frame: one struct of ~50 statistics per column, exploded to one
    * row per column. Split out of [[profileWith]] so the fused
    * approx-check ([[approxCheckFused]]) can assemble BOTH modes from
    * one shared set of collected passes.
    */
  private def assemble(agged: DataFrame, tableName: String,
                       fields: Seq[(StructField, Int)],
                       distincts: String): DataFrame = {
    val structs = fields.map { case (f, i) =>
      val isTs = f.dataType == TimestampType
      val isNum = f.dataType.isInstanceOf[NumericType]
      def s(n: String) = col(s"__s${i}_$n")
      val meta = Map[String, Column](
        "table_name" -> lit(tableName), "column_name" -> lit(f.name),
        "ordinal" -> lit(i.toLong),
        "data_type" -> lit(typeLabel(f.dataType)))
      val baseCols = BaseFieldsHead.map(n =>
        meta.getOrElse(n, s(n)).as(n))
      val tailCols = BaseFieldsTail.map {
        case n @ ("p25_num" | "median_num" | "p75_num")
            if isNum && distincts != "none" && distincts != "sketch" =>
          val k = n match {
            case "p25_num" => 1; case "median_num" => 2; case _ => 3
          }
          round(element_at(col(s"__q_$i"), k), 4).as(n)
        case n @ ("p25_num" | "median_num" | "p75_num") =>
          lit(null).cast(DoubleType).as(n)
        case n => s(n).as(n)
      }
      val distinctCt =
        if (distincts == "exact" || distincts == "hll") col(s"__d_$i")
        else lit(null).cast(LongType)
      struct((baseCols :+ distinctCt.as("distinct_ct")) ++ tailCols ++
        Seq((if (isTs && distincts != "none" && distincts != "sketch")
               col(s"__dd_$i")
             else lit(null).cast(LongType)).as("distinct_date_ct")) ++
        (if (distincts == "sketch")
           Seq(col(s"__sk_$i").as("distinct_sketch"))
         else Seq.empty): _*)
    }
    agged.select(explode(array(structs: _*)).as("p"))
      .select("p.*")
      .orderBy("column_name")
  }

  /** The mergeable-statistics profile of one slice, restricted to
    * [[MergeableFields]]: base passes only — no distinct, date-distinct
    * or percentile passes, because none of those merge exactly across
    * disjoint slices and a per-batch profile destined for a
    * [[mergeProfiles]] fold would pay them only to null them out. This
    * is the incremental unit of the streaming profiler
    * (StreamingOps.profileSummariesBounded): profile each micro-batch,
    * fold with [[mergeProfiles]], and the running result stays
    * hash-equal to the full-corpus profile on the mergeable fields.
    */
  def profileMergeable(df: DataFrame, tableName: String,
                       withSketch: Boolean = false): DataFrame = {
    val mode = if (withSketch) "sketch" else "none"
    val keep =
      if (withSketch) MergeableFields :+ "distinct_sketch"
      else MergeableFields
    profileWith(df, tableName, distincts = mode, exactPercentiles = false)
      .select(keep.map(col): _*)
  }

  /** The scan passes of one profile invocation, exposed for plan-shape
    * tests (ProfilerSpec asserts NO pass plans an Expand — since the
    * concurrent-collect rework the passes no longer appear in the
    * result frame's executed plan, so the fence must target them
    * directly).
    *
    *  - base passes: every non-distinct statistic of one column, flat
    *    and meta-free (see profileWith scaladoc), renamed per-column
    *    above the aggregate; in approx mode the HLL distinct(s) ride
    *    along (approx_count_distinct needs no Expand);
    *  - exact distinct / distinct-date passes: one narrow pass each;
    *  - percentile passes: one narrow ObjectHashAggregate pass per
    *    numeric column.
    */
  private[graft] def buildPasses(df: DataFrame,
                                 fields: Seq[(StructField, Int)],
                                 distincts: String,
                                 exactPercentiles: Boolean)
      : Seq[DataFrame] =
    basePasses(df, fields, distincts) ++
      distinctPasses(df, fields, distincts) ++
      (if (distincts == "none" || distincts == "sketch") Seq.empty
       else pctPasses(df, fields, exactPercentiles))

  private val V = "__v"
  private def canon(df: DataFrame, f: StructField): DataFrame =
    df.select(col(f.name).as(V))

  private def basePasses(df: DataFrame, fields: Seq[(StructField, Int)],
                         distincts: String): Seq[DataFrame] = {
    def canon(f: StructField): DataFrame = Profiler.canon(df, f)
    fields.map { case (f, i) =>
      val pairs = statsPairs(col(V), f.dataType)
      val riders: Seq[(String, Column)] = distincts match {
        case "hll" =>
          ("__d" -> approx_count_distinct(col(V))) +:
            (if (f.dataType == TimestampType)
               Seq("__dd" -> approx_count_distinct(to_date(col(V))))
             else Seq.empty)
        case "sketch" =>
          Seq("__sk" -> hll_sketch_agg(
            when(col(V).isNotNull, xxhash64(col(V)))))
        case _ => Seq.empty
      }
      val aggCols = (pairs ++ riders).map { case (n, e) => e.as(n) }
      canon(f).agg(aggCols.head, aggCols.tail: _*)
        .select(pairs.map { case (n, _) => col(n).as(s"__s${i}_$n") } ++
          riders.map { case (n, _) => col(n).as(s"${n}_$i") }: _*)
    }
  }

  private def distinctPasses(df: DataFrame,
                             fields: Seq[(StructField, Int)],
                             distincts: String): Seq[DataFrame] =
    (if (distincts != "exact") Seq.empty
     else fields.map { case (f, i) =>
      canon(df, f).agg(countDistinct(col(V)).as("__d"))
        .select(col("__d").as(s"__d_$i"))
    }) ++
    (if (distincts != "exact" && distincts != "dates") Seq.empty
     else fields.collect {
      case (f, i) if f.dataType == TimestampType =>
        canon(df, f).agg(countDistinct(to_date(col(V))).as("__dd"))
          .select(col("__dd").as(s"__dd_$i"))
    })

  /** Exact-percentile passes fan the projected column out to session
    * parallelism before aggregating (r15, guide §2.6 idle capacity):
    * on the single-split harness layout the pass is otherwise ONE task,
    * and a near-unique double column (sf0.1 l_extendedprice) costs
    * 1.23 s solo — the slowest pass of the whole profile — because the
    * Percentile buffer ingests 600k map entries on one core. The
    * fan-out parallelizes the partial (update) phase; the merge of the
    * partial count-maps is commutative and the sorted totals are
    * identical, so the exact quantile is BIT-IDENTICAL under any
    * partitioning (ProfilerSpec pins this). Tables.fanout's stats guard
    * makes it a no-op on inputs that already split (the 100 TB path).
    * The APPROX pass stays un-fanned: approx_percentile's sketch merge
    * is partitioning-SENSITIVE — values would shift within the sketch's
    * accuracy bound, and profile_approx_lineitem publishes those raw
    * values.
    */
  private def pctPasses(df: DataFrame, fields: Seq[(StructField, Int)],
                        exactPercentiles: Boolean): Seq[DataFrame] =
    fields.collect {
      case (f, i) if f.dataType.isInstanceOf[NumericType] =>
        val ps = array(lit(0.25), lit(0.5), lit(0.75))
        val in = df.select(col(f.name).cast(DoubleType).as(V))
        (if (exactPercentiles)
           graft.Tables.fanout(in).agg(percentile(col(V), ps).as("__q"))
         else in.agg(approx_percentile(col(V), ps, lit(10000)).as("__q")))
          .select(col("__q").as(s"__q_$i"))
    }

  /** Several profiles through ONE shared pass pool — each result
    * bit-identical to `profile(df, name, exactDistinct)` run alone, but
    * the wall clock is ≈ the widest pass wave instead of the sum of
    * inputs: sequential profile() calls are each EAGER (the
    * ConcurrentPasses contract), so profiling two halves of a table
    * back to back serializes the two pools even on an idle cluster.
    * This is the partition-sliced-lake posture — profile every slice
    * concurrently, then [[mergeProfiles]] — and what the merge-law
    * query uses.
    */
  def profileMany(inputs: Seq[(DataFrame, String)],
                  exactDistinct: Boolean = true): Seq[DataFrame] = {
    require(inputs.nonEmpty, "no inputs to profile")
    val distincts = if (exactDistinct) "exact" else "hll"
    val spark = inputs.head._1.sparkSession
    val fieldsPer = inputs.map { case (df, name) =>
      val fs = df.schema.fields.zipWithIndex.filter {
        case (f, _) => isProfilable(f.dataType)
      }.toSeq
      require(fs.nonEmpty, s"no profilable columns in $name")
      fs
    }
    val groups = inputs.zip(fieldsPer).map { case ((df, _), fs) =>
      memoPasses(df, s"std:$distincts:$exactDistinct")(
        buildPasses(df, fs, distincts, exactPercentiles = exactDistinct))
    }
    val aggeds = graft.operators.ConcurrentPasses
      .collectOneRowGroups(spark, groups)
    inputs.zip(fieldsPer).zip(aggeds).map {
      case (((_, name), fs), agged) => assemble(agged, name, fs, distincts)
    }
  }

  /** [[buildPasses]] for a whole table, as the plan-fence entry point:
    * profilable fields resolved exactly as profileWith resolves them.
    */
  private[graft] def passesFor(df: DataFrame, distincts: String,
                               exactPercentiles: Boolean)
      : Seq[DataFrame] =
    buildPasses(df,
      df.schema.fields.zipWithIndex
        .filter { case (f, _) => isProfilable(f.dataType) }.toSeq,
      distincts, exactPercentiles)

  /** Fused exact-vs-approx audit gate: ProfileCompare.approxCheck over
    * BOTH profile modes of one table computed from ONE shared set of
    * base scans (the r8 verdict's "What's wrong #2": running the exact
    * and approx pipelines in full pays a full extra table scan per
    * audit at 100 TB, even though the two modes ride IDENTICAL base
    * passes by construction).
    *
    * Pass set (each pass collected once, concurrently):
    *  - SHARED base passes in "hll" form — the ~50 per-column stats
    *    (bit-identical expressions in both modes) with the HLL
    *    distinct riders attached; the riders are the approx side's
    *    distinct estimates and adding an aggregate to an agg() does
    *    not perturb its siblings, so the exact side reads the same
    *    stats values a rider-free pass would produce;
    *  - exact countDistinct / distinct-date passes (renamed __ed/__edd
    *    so they can coexist with the riders in one merged row);
    *  - exact and approx percentile passes (TypedImperative — these
    *    genuinely differ per mode and stay separate).
    * Both profile frames are then assembled from selections of the one
    * merged LocalRelation row — values bit-identical to two standalone
    * profile() runs, one table scan per column instead of two.
    */
  def approxCheckFused(df: DataFrame, tableName: String): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.zipWithIndex.filter {
      case (f, _) => isProfilable(f.dataType)
    }.toSeq
    require(fields.nonEmpty, s"no profilable columns in $tableName")
    val shared = memoPasses(df, "fused:base")(basePasses(df, fields, "hll"))
    val exactD = memoPasses(df, "fused:exactD")(
      distinctPasses(df, fields, "exact").map { p =>
        p.select(p.columns.map(c =>
          col(c).as("__e" + c.stripPrefix("__"))): _*)
      })
    // exact AND approx percentiles fused into ONE ObjectHashAggregate
    // pass per numeric column — both are TypedImperative aggregates, so
    // they ride the same scan (one pass per column instead of two; at
    // 100 TB that is one less full pass over every numeric column)
    // fanned out like the exact pctPasses (same 1.2 s single-task
    // bottleneck). The approx side rides along: its sketch-merge values
    // shift with partitioning, but this query's OUTPUT is the violation
    // set of a 5%-tolerance gate against the exact quantile — the
    // sketch's own guarantee at accuracy 10000 is a 0.01% rank error,
    // ~500× inside the gate, so the result stays the same empty set.
    val pctBoth = memoPasses(df, "fused:pct")(fields.collect {
      case (f, i) if f.dataType.isInstanceOf[NumericType] =>
        val ps = array(lit(0.25), lit(0.5), lit(0.75))
        graft.Tables.fanout(
            df.select(col(f.name).cast(DoubleType).as(V)))
          .agg(percentile(col(V), ps).as("__q"),
            approx_percentile(col(V), ps, lit(10000)).as("__aq"))
          .select(col("__q").as(s"__eq_$i"), col("__aq").as(s"__q_$i"))
    })
    val merged = graft.operators.ConcurrentPasses.collectOneRow(
      spark, shared ++ exactD ++ pctBoth)
    val statCols = fields.flatMap { case (f, i) =>
      merged.columns.filter(_.startsWith(s"__s${i}_")) }.map(col)
    val exactSide = merged.select(statCols ++
      merged.columns.filter(_.startsWith("__e"))
        .map(c => col(c).as("__" + c.stripPrefix("__e"))): _*)
    val approxSide = merged.select(statCols ++
      merged.columns.filter(c =>
        c.startsWith("__d_") || c.startsWith("__dd_") ||
          c.startsWith("__q_")).map(col): _*)
    ProfileCompare.approxCheck(
      assemble(exactSide, tableName, fields, "exact"),
      assemble(approxSide, tableName, fields, "hll"))
  }

  /** Count/sum characteristics that scale linearly with sampled rows. */
  private[profile] val ExtensiveCounts = Set("record_ct", "value_ct",
    "null_ct", "blank_ct", "zero_ct", "neg_ct", "embedded_space_ct",
    "upper_ct", "lower_ct", "numeric_str_ct", "date_str_ct", "pos_ct",
    "frac_value_ct", "future_ct", "weekend_ct", "lead_space_ct", "quote_ct",
    "non_ascii_ct", "alpha_ct", "boolean_ct", "email_ct", "zip_ct",
    "dummy_ct", "round_num_ct", "midnight_ct", "work_hours_ct")
  private[profile] val ExtensiveSums = Set("sum_num", "frac_sum")

  /** Sampled profiling mode (reference table groups declare
    * `uses_sampling` / `sample_percentage`, demo/demo/demo_helper.py:971-989):
    * profile a seeded Bernoulli sample, then scale the EXTENSIVE
    * statistics — counts and sums — back to table scale by 1/fraction.
    * Intensive statistics (avg/stddev/percentiles/shape ratios) are
    * unbiased on the sample and pass through unscaled; min/max/min_ts/
    * max_ts are sample extrema (conservative bounds). Distinct counts come
    * back NULL: a sample's distinct count has no general unbiased
    * scale-up, and emitting it unscaled next to scaled value counts would
    * poison ratio baselines downstream (TestGenerator's Unique_Pct gates
    * skip None, exactly as they do for merged profiles). Use the HLL
    * one-scan mode (`exactDistinct=false` on the full table) when
    * cardinality matters. `distinct_date_ct` survives as a lower bound —
    * its generated tests are floor-compared, so an undercount stays safe.
    *
    * This is the cheap first pass at 100 TB: the sample predicate
    * (Bernoulli or hash-draw) is a narrow stateless operator fused into
    * every per-column pass, so each pass aggregates ~fraction of the
    * rows; in hashKey mode each pass also reads the key columns the
    * draw hashes. Defaults to HLL distincts so no extra distinct passes
    * are added on top of the per-column base passes.
    */
  def profileSampled(df: DataFrame, tableName: String, fraction: Double,
                     seed: Long = 42L, exactDistinct: Boolean = false,
                     hashKey: Option[Column] = None): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"bad fraction: $fraction")
    // hashKey: deterministic md5-bucket draw on a row key instead of the
    // Bernoulli sample — same one-scan shape (the filter fuses into the
    // scan), but the selected subset is engine- and partitioning-
    // independent, so the scaled profile carries a full DuckDB oracle.
    // Bernoulli (hashKey=None) stays the default: at 100 TB a keyless
    // draw is cheaper than hashing a composite key per row.
    val sample = hashKey match {
      case Some(k) =>
        // the draw quantizes to basis points while the scale-back divides
        // by the raw fraction — they must agree exactly or every
        // extensive stat is biased by bps/10⁴ ÷ fraction
        val bps = math.round(fraction * 10000).toInt
        require(bps >= 1 && bps / 10000.0 == fraction,
          s"hashKey mode needs fraction in exact basis points " +
            s"(n/10000, n >= 1); got $fraction")
        df.filter(conv(substring(md5(concat(lit("ps:"),
          k.cast(StringType))), 1, 6), 16, 10).cast(LongType)
          % 10000 < bps)
      case None => df.sample(withReplacement = false, fraction, seed)
    }
    // "dates" (not "exact") when the caller wants oracle parity: the
    // per-column distinct passes would be computed only to be nulled
    // below — the sampled mode never pays them (r5 advice)
    val p = profileWith(sample, tableName,
      distincts = if (exactDistinct) "dates" else "hll",
      exactPercentiles = exactDistinct)
    p.select(p.columns.toSeq.map {
      case c if ExtensiveCounts(c) =>
        round(col(c) / fraction).cast(LongType).as(c)
      case c if ExtensiveSums(c) => (col(c) / lit(fraction)).as(c)
      case c @ "distinct_ct"     => lit(null).cast(LongType).as(c)
      case c => col(c)
    }: _*)
  }

  /** The profile fields an incremental merge can reproduce EXACTLY from
    * two disjoint partial profiles: meta, additive counts and decimal
    * sums, extrema, and the stats re-derivable from those (avg from the
    * merged sum, range/span/recency from the merged extrema). Excluded —
    * by mathematics, not implementation: distinct counts (need HLL
    * sketches), avg_len/avg_words (the length sums aren't retained),
    * stddev/skew/kurt/cv (need higher-moment sums), and percentiles
    * (need KLL sketches). Shared by [[mergeProfiles]] and the oracle of
    * the registered equality query.
    */
  val MergeableFields: Seq[String] = Seq(
    "table_name", "column_name", "ordinal", "data_type",
    "record_ct", "value_ct", "null_ct", "min_len", "max_len", "blank_ct",
    "min_str", "max_str", "min_num", "max_num", "avg_num", "sum_num",
    "frac_sum", "zero_ct", "neg_ct", "min_ts", "max_ts",
    "embedded_space_ct", "upper_ct", "lower_ct", "numeric_str_ct",
    "date_str_ct", "pos_ct", "frac_value_ct", "future_ct", "weekend_ct",
    "lead_space_ct", "quote_ct", "non_ascii_ct", "alpha_ct", "boolean_ct",
    "email_ct", "zip_ct", "dummy_ct", "range_num", "round_num_ct",
    "midnight_ct", "work_hours_ct", "span_days", "recency_days")

  /** Merge two profiles of the SAME table over DISJOINT row sets into
    * the profile of their union, restricted to [[MergeableFields]] —
    * the incremental-profiling law that lets a 100 TB lake re-profile
    * only its new partitions: profile(old ∪ delta) ==
    * merge(profile(old), profile(delta)). A profile is one row per
    * column, so this is a control-plane-sized join however large the
    * profiled data was; every statistic stays an engine-side expression
    * (sums of the exact DECIMAL-backed sums, least/greatest extrema,
    * avg re-derived from the merged sum with the same round(,4), range/
    * span/recency re-derived from the merged extrema with the same
    * formulas), so the merged frame hash-matches the full-table oracle.
    * The driver-side record twin is [[ColProfile.merge]].
    */
  def mergeProfiles(a0: DataFrame, b0: DataFrame): DataFrame = {
    // materialize both inputs first: a profile is one row per column —
    // control-plane data — but its PLAN is a tree of full-table
    // aggregates, and joining two such trees re-evaluates the heavy
    // subtrees (measured 33 s vs 0.3 s on sf0.1 lineitem). In the
    // incremental posture the standing baseline is a stored artifact
    // anyway; eager checkpoint makes the merge cost independent of the
    // profiled data size.
    val a = a0.localCheckpoint(true)
    val b = b0.localCheckpoint(true)
    val bj = b.select(b.columns.toSeq.map(c => col(c).as(s"__b_$c")): _*)
    def A(c: String) = col(c)
    def B(c: String) = col(s"__b_$c")
    def addC(c: String) = (A(c) + B(c)).as(c)
    // the profile emits sums as the double image of an exact DECIMAL:
    // adding the doubles directly drifts an ulp from the full-table sum
    // (0.01 is not a binary fraction), but each double round-trips to
    // its source decimal exactly (≤ 6 dp, |x| ≪ 2^53/10⁶), so summing
    // IN DECIMAL reproduces the one-pass sum bit-for-bit
    // null-safe: a profile's sum over zero non-null values is NULL, and
    // an incremental delta legitimately profiles empty or all-null
    // slices — a one-sided NULL must pass the other side through (that
    // IS the union's one-pass sum); only a two-sided NULL stays NULL
    def decSum(c: String): Column = {
      val (x, y) = (A(c).cast(SumDec), B(c).cast(SumDec))
      when(x.isNull, y).when(y.isNull, x).otherwise(x + y)
    }
    def addDec(c: String) = decSum(c).cast(DoubleType).as(c)
    def minC(c: String) = least(A(c), B(c)).as(c)
    def maxC(c: String) = greatest(A(c), B(c)).as(c)
    // HLL cardinality sketches (profileMergeable(withSketch = true))
    // union losslessly within the sketch contract: the fold is
    // order-independent in accuracy, though not bit-identical to a
    // one-shot sketch (DataSketches' sparse→dense promotion differs
    // under union) — StreamingSpec pins the ≤1% fold-vs-one-shot and
    // max(2, 10%)-vs-exact bounds
    val sketchCol: Seq[Column] =
      if (a.columns.contains("distinct_sketch") &&
          b.columns.contains("distinct_sketch"))
        Seq(when(A("distinct_sketch").isNull, B("distinct_sketch"))
          .when(B("distinct_sketch").isNull, A("distinct_sketch"))
          .otherwise(hll_union(A("distinct_sketch"), B("distinct_sketch")))
          .as("distinct_sketch"))
      else Seq.empty
    a.join(bj, A("table_name") === B("table_name") &&
        A("column_name") === B("column_name"))
      .select(Seq(
        A("table_name").as("table_name"),
        A("column_name").as("column_name"),
        A("ordinal").as("ordinal"), A("data_type").as("data_type"),
        addC("record_ct"), addC("value_ct"), addC("null_ct"),
        minC("min_len"), maxC("max_len"), addC("blank_ct"),
        minC("min_str"), maxC("max_str"),
        minC("min_num"), maxC("max_num"),
        round(decSum("sum_num").cast(DoubleType) /
          (A("value_ct") + B("value_ct")), 4).as("avg_num"),
        addDec("sum_num"), addDec("frac_sum"), addC("zero_ct"),
        addC("neg_ct"),
        minC("min_ts"), maxC("max_ts"),
        addC("embedded_space_ct"), addC("upper_ct"), addC("lower_ct"),
        addC("numeric_str_ct"), addC("date_str_ct"), addC("pos_ct"),
        addC("frac_value_ct"), addC("future_ct"), addC("weekend_ct"),
        addC("lead_space_ct"), addC("quote_ct"), addC("non_ascii_ct"),
        addC("alpha_ct"), addC("boolean_ct"), addC("email_ct"),
        addC("zip_ct"), addC("dummy_ct"),
        (greatest(A("max_num"), B("max_num")) -
          least(A("min_num"), B("min_num"))).as("range_num"),
        addC("round_num_ct"), addC("midnight_ct"), addC("work_hours_ct"),
        datediff(to_date(greatest(A("max_ts"), B("max_ts"))),
          to_date(least(A("min_ts"), B("min_ts"))))
          .cast(LongType).as("span_days"),
        datediff(to_date(lit(graft.quality.TestEvaluator.AsOfTs)),
          to_date(greatest(A("max_ts"), B("max_ts"))))
          .cast(LongType).as("recency_days")) ++ sketchCol: _*)
      .orderBy("column_name")
  }

  /** Output field order around the two distinct-count slots. */
  private val BaseFieldsHead = Seq("table_name", "column_name", "ordinal",
    "data_type", "record_ct", "value_ct", "null_ct")
  private val BaseFieldsTail = Seq("min_len", "max_len", "avg_len",
    "blank_ct", "min_str", "max_str", "min_num", "max_num", "avg_num",
    "stdev_num", "sum_num", "frac_sum", "zero_ct", "neg_ct", "min_ts",
    "max_ts", "embedded_space_ct", "upper_ct", "lower_ct",
    "numeric_str_ct", "date_str_ct", "pos_ct", "frac_value_ct",
    "future_ct", "weekend_ct",
    // round-2 widening toward the reference's declared 51 characteristics
    "lead_space_ct", "quote_ct", "non_ascii_ct", "alpha_ct", "boolean_ct",
    "email_ct", "zip_ct", "dummy_ct", "avg_words",
    "p25_num", "median_num", "p75_num", "skew_num", "kurt_num", "range_num",
    "cv_num", "round_num_ct",
    "midnight_ct", "work_hours_ct", "span_days", "recency_days")

  def isProfilable(dt: DataType): Boolean = dt match {
    case StringType | TimestampType => true
    case _: NumericType             => true
    // embedding columns: cardinality + element-count stats (min/max/avg
    // length reuse the string length slots)
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** stddev from exact decimal sums: sqrt((s2 - s1^2/n) / (n-1)).
    * Deterministic across engines because s1/s2 are exact decimals.
    */
  private def derivedStd(s1: Column, s2: Column, n: Column): Column = {
    val num = s2.cast(DoubleType) - s1.cast(DoubleType) * s1.cast(DoubleType) / n
    when(n > 1, sqrt(greatest(num, lit(0.0)) / (n - lit(1))))
  }

  /** All non-distinct statistics of one value expression of the given
    * type, as (name, aggregate/derived expression) pairs in output
    * order (percentile and distinct slots excluded — they ride their
    * own passes). Called by the per-column passes (c = the source
    * column, dt = its native type); the melt variant that would have
    * been the second caller (c = the melted `value` column) was built,
    * measured, and REJECTED (see profileWith's scaladoc) — while it
    * existed, sharing this one definition kept the two paths from
    * drifting numerically.
    */
  private def statsPairs(c: Column, dt: DataType): Seq[(String, Column)] = {
    val isStr = dt == StringType
    val isNum = dt.isInstanceOf[NumericType]
    val isTs = dt == TimestampType
    val isArr = dt.isInstanceOf[ArrayType]
    val isFrac = dt == DoubleType || dt == FloatType ||
      dt.isInstanceOf[DecimalType]
    def nl = lit(null).cast(LongType)
    def nd = lit(null).cast(DoubleType)
    def ns = lit(null).cast(StringType)
    def nt = lit(null).cast(TimestampType)

    val valueCt = count(c)
    // exact decimal sums for numeric columns
    val dec = c.cast(SumDec)
    val cd = c.cast(DoubleType)
    val s1 = sum(dec)
    val s2 = sum((cd * cd).cast(SumDec))
    // 3rd/4th-power sums for the moment-derived shape stats, magnitude-
    // guarded (see MomentSafeAbs): rows past the bound would overflow
    // the per-row DECIMAL cast as a hard ANSI error. The inner when
    // prevents the throwing cast; the outer when nulls the WHOLE sum if
    // anything was skipped (a partial moment sum would silently bias
    // skew/kurtosis — null is the honest answer); try_sum nulls instead
    // of throwing if the guarded sum itself ever overflows at extreme
    // row counts.
    val momSafe = abs(cd) < lit(MomentSafeAbs)
    val nUnsafe = count(when(!momSafe, 1))
    val s3 = when(nUnsafe === 0,
      try_sum(when(momSafe, (cd * cd * cd).cast(MomDec))))
    val s4 = when(nUnsafe === 0,
      try_sum(when(momSafe, (cd * cd * cd * cd).cast(MomDec))))
    val lenSum = sum(length(c).cast(LongType))
    // central moments derived from the exact decimal sums (double math is
    // deterministic across engines given identical expression trees)
    val mean = s1.cast(DoubleType) / valueCt
    val m2 = s2.cast(DoubleType) / valueCt - mean * mean
    val m3 = s3.cast(DoubleType) / valueCt -
      lit(3.0) * mean * (s2.cast(DoubleType) / valueCt) +
      lit(2.0) * mean * mean * mean
    val m4 = s4.cast(DoubleType) / valueCt -
      lit(4.0) * mean * (s3.cast(DoubleType) / valueCt) +
      lit(6.0) * mean * mean * (s2.cast(DoubleType) / valueCt) -
      lit(3.0) * mean * mean * mean * mean
    val trimmed = trim(c)

    Seq(
      "record_ct" -> count(lit(1)),
      "value_ct" -> valueCt,
      "null_ct" -> count(when(c.isNull, 1)),
      "min_len" -> (if (isStr) min(length(c)).cast(LongType)
       else if (isArr) min(size(c)).cast(LongType) else nl),
      "max_len" -> (if (isStr) max(length(c)).cast(LongType)
       else if (isArr) max(size(c)).cast(LongType) else nl),
      "avg_len" -> (if (isStr) round(lenSum.cast(DoubleType) / valueCt, 4)
       else if (isArr)
         round(sum(size(c).cast(LongType)).cast(DoubleType) / valueCt, 4)
       else nd),
      "blank_ct" -> (if (isStr) count(when(trim(c) === "", 1)) else nl),
      "min_str" -> (if (isStr) min(c) else ns),
      "max_str" -> (if (isStr) max(c) else ns),
      "min_num" -> (if (isNum) min(c).cast(DoubleType) else nd),
      "max_num" -> (if (isNum) max(c).cast(DoubleType) else nd),
      "avg_num" -> (if (isNum) round(s1.cast(DoubleType) / valueCt, 4)
       else nd),
      "stdev_num" -> (if (isNum) round(derivedStd(s1, s2, valueCt), 4)
       else nd),
      // Final representation is DOUBLE: the decimal sum is exact and
      // order-independent internally, but DECIMAL(38,x) output columns do
      // not hash-match the DuckDB oracle's representation, while doubles
      // derived from the same exact decimal do (CORRECTNESS_r01 analysis).
      "sum_num" -> (if (isNum) s1.cast(DoubleType) else nd),
      "frac_sum" -> (if (isFrac)
        sum(dec - floor(c).cast(SumDec)).cast(DoubleType)
      else nd),
      "zero_ct" -> (if (isNum) count(when(c === 0, 1)) else nl),
      "neg_ct" -> (if (isNum) count(when(c < 0, 1)) else nl),
      "min_ts" -> (if (isTs) min(c) else nt),
      "max_ts" -> (if (isTs) max(c) else nt),
      // shape characteristics (toward the reference's 51-characteristic
      // profile): string content classes, numeric sign, date placement
      "embedded_space_ct" -> (if (isStr) count(when(c.contains(" "), 1))
       else nl),
      "upper_ct" -> (if (isStr) count(when(c === upper(c), 1)) else nl),
      "lower_ct" -> (if (isStr) count(when(c === lower(c), 1)) else nl),
      "numeric_str_ct" -> (if (isStr)
        count(when(c.try_cast(DoubleType).isNotNull, 1)) else nl),
      "date_str_ct" -> (if (isStr)
        count(when(c.try_cast(DateType).isNotNull, 1)) else nl),
      "pos_ct" -> (if (isNum) count(when(c > 0, 1)) else nl),
      "frac_value_ct" -> (if (isFrac) count(when(c =!= floor(c), 1))
       else nl),
      "future_ct" -> (if (isTs)
        count(when(c > to_timestamp(lit(graft.quality.TestEvaluator.AsOfTs)),
          1))
      else nl),
      "weekend_ct" -> (if (isTs) count(when(dayofweek(c).isin(1, 7), 1))
       else nl),
      // string content classes (round-2 widening)
      "lead_space_ct" -> (if (isStr) count(when(c =!= ltrim(c), 1)) else nl),
      "quote_ct" -> (if (isStr)
        count(when(c.contains("'") || c.contains("\""), 1)) else nl),
      "non_ascii_ct" -> (if (isStr) count(when(c.rlike("[^\\x00-\\x7F]"), 1))
       else nl),
      "alpha_ct" -> (if (isStr) count(when(c.rlike("^[A-Za-z ]+$"), 1))
       else nl),
      "boolean_ct" -> (if (isStr) count(when(upper(trimmed).isin("Y", "N",
        "YES", "NO", "TRUE", "FALSE", "T", "F"), 1)) else nl),
      "email_ct" -> (if (isStr) count(when(
        c.rlike("^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"), 1))
       else nl),
      "zip_ct" -> (if (isStr) count(when(c.rlike("^[0-9]{5}(-[0-9]{4})?$"),
        1)) else nl),
      "dummy_ct" -> (if (isStr) count(when(upper(trimmed).isin("N/A", "NA",
        "NONE", "NULL", "UNKNOWN", "MISSING", "-", "?", "TBD"), 1)) else nl),
      "avg_words" -> (if (isStr) round(
        sum(when(length(trimmed) > 0, size(split(trimmed, "\\s+")))
          .otherwise(0).cast(LongType)).cast(DoubleType) / valueCt, 4)
       else nd),
      // numeric distribution shape (quartile slots ride the dedicated
      // percentile pass; see profileWith)
      "skew_num" -> (if (isNum) when(valueCt > 2 && m2 > 0,
        round(m3 / sqrt(m2 * m2 * m2), 4)) else nd),
      "kurt_num" -> (if (isNum) when(valueCt > 3 && m2 > 0,
        round(m4 / (m2 * m2) - lit(3.0), 4)) else nd),
      "range_num" -> (if (isNum) max(c).cast(DoubleType) -
        min(c).cast(DoubleType) else nd),
      "cv_num" -> (if (isNum) when(valueCt > 1 && s1.cast(DoubleType) =!= 0.0,
        round(derivedStd(s1, s2, valueCt) / mean, 4)) else nd),
      "round_num_ct" -> (if (isNum) count(when(c % lit(10) === 0, 1))
       else nl),
      // timestamp placement
      "midnight_ct" -> (if (isTs) count(when(date_trunc("DAY", c) === c, 1))
       else nl),
      "work_hours_ct" -> (if (isTs)
        count(when(hour(c) >= 9 && hour(c) < 17, 1)) else nl),
      "span_days" -> (if (isTs)
        datediff(to_date(max(c)), to_date(min(c))).cast(LongType) else nl),
      "recency_days" -> (if (isTs)
        datediff(to_date(lit(graft.quality.TestEvaluator.AsOfTs)),
          to_date(max(c))).cast(LongType) else nl),
    )
  }

  /** Top-k most frequent values of one column (the profiling "LOV"
    * characteristic backing LOV_Match test generation —
    * reference demo/input_data/data_tests.csv `Baseline_Value=('No','Yes')`).
    * Separate grouped pass; at scale this is a partial-agg'd groupBy on a
    * single column (map-side combine), cheap relative to the main scan.
    */
  def topK(df: DataFrame, tableName: String, column: String,
           k: Int = 10): DataFrame =
    // orderBy+limit plans as TakeOrderedAndProject: each partition keeps a
    // local top-k heap and the driver merges k·P rows — no global single-
    // partition window over all value groups (the r1 plan's scale hazard).
    // Rank is implied by the (value_ct desc, value) output order; emitting a
    // row_number column would force a WindowExec for zero information.
    df.filter(col(column).isNotNull)
      .groupBy(col(column).cast(StringType).as("value"))
      .agg(count(lit(1)).as("value_ct"))
      .orderBy(col("value_ct").desc, col("value"))
      .limit(k)
      .select(lit(tableName).as("table_name"), lit(column).as("column_name"),
        col("value"), col("value_ct"))
}

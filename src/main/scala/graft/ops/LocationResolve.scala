package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.nlp.{Goldens, Locations, Normalize}

/** N6/N7 — tier-1 (exact) and tier-2 (combined regex) location resolution
  * as a PURE-relational pipeline: no UDFs anywhere, every step a built-in
  * codegen'd expression. The dictionary is consulted in two interchangeable
  * forms:
  *
  *  - [[tier12Locations]] (n06): the dictionary folded in as a literal map
  *    column — the right plan while the dictionary fits in the plan (a few
  *    thousand variants): zero joins, zero exchanges for the lookup.
  *  - [[tier12LocationsBroadcast]] (n07): the dictionary as a broadcast
  *    dimension DataFrame ([[Locations.variantRows]]) joined onto the
  *    exploded tokens — the form that survives a million-variant
  *    dictionary, where a plan literal would blow up the plan size. Each
  *    lookup tier is one BroadcastHashJoin; the fact rows still never see
  *    the dictionary (only the distinct-string token dim does).
  *
  * Pipeline per token: scrub round-trip markers → split/trim/filter →
  * posexplode → normalize (regexp chain) → exact map hit, else regex
  * capture + map hit, else retry both on the op-prefix-stripped token →
  * regroup ordered by token position with order-preserving dedup.
  *
  * This is the extract_all_locations dataflow with the fuzzy tier turned
  * off (the fuzzy tier is inherently procedural; Transform keeps it in a
  * UDF applied after tiers 1-2 miss). At 100 TB the regex/dict chain runs
  * once per DISTINCT location string (dedup-before-NLP, same design as
  * the master transform: the distinct strings are bounded by vocabulary,
  * not data volume) and the resolved dimension broadcasts back onto the
  * fact rows — trip rows never enter the token explode.
  */
object LocationResolve {

  /** The variant→canonical dictionary as a map literal Column. */
  private def dictMap = {
    val entries = Locations.variantRows.flatMap { case (v, c) => Seq(lit(v), lit(c)) }
    map(entries: _*)
  }

  /** Trips with the filled `_el` string column. */
  private def withElFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val trips = Trips.raw(spark, sfDir)
    val el = when($"end_location".isNull || $"end_location" === "nan", "")
      .otherwise($"end_location")
    trips.withColumn("_el", el)
  }

  /** Distinct `_el` strings exploded to positioned, normalized tokens —
    * the whole regex chain runs on the distinct strings only. */
  private def explodedTokens(withEl: DataFrame): DataFrame = {
    val spark = withEl.sparkSession
    import spark.implicits._
    val scrubbed = regexp_replace(trim($"_el"), Locations.roundTripPattern, " ")
    val toks = filter(
      transform(split(scrubbed, Locations.tokenSplitPattern), trim(_)),
      t => t =!= "")
    withEl.select($"_el").distinct()
      .select($"_el", posexplode_outer(toks).as(Seq("pos", "tok")))
      .withColumn("norm", Normalize.normalizeCol($"tok"))
      .withColumn("stripped",
        trim(regexp_replace($"tok", "(?U)" + Locations.opPrefixPattern, "")))
      .withColumn("strippedNorm", Normalize.normalizeCol($"stripped"))
  }

  /** Regroup resolved tokens (with a `loc` column) into the per-string
    * ordered location list and join it back onto the fact rows. */
  private def assemble(withEl: DataFrame, resolved: DataFrame): DataFrame = {
    val spark = withEl.sparkSession
    import spark.implicits._
    val dim = resolved
      .filter($"loc".isNotNull)
      .groupBy($"_el")
      .agg(array_distinct(transform(
        array_sort(collect_list(struct($"pos", $"loc"))),
        s => s.getField("loc"))).as("locs"))

    withEl.select($"trip_key", $"vid", $"_el")
      .join(broadcast(dim), Seq("_el"), "left")
      .select($"trip_key", $"vid",
        coalesce(array_join($"locs", "|"), lit("")).as("locations"),
        coalesce(size($"locs"), lit(0)).cast("long").as("n_locations"))
      .orderBy($"trip_key")
  }

  /** Tier-2 regex capture of the longest embedded variant, null on miss.
    * The pattern must be built from the dictionary being consulted. */
  private def capture(norm: Column,
      pattern: String = Locations.combinedPattern): Column =
    nullif(regexp_extract(norm, pattern, 1), lit(""))

  /** n06 — dictionary as a plan-literal map (no joins for the lookup). */
  def tier12Locations(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val withEl = withElFrame(spark, sfDir)
    val exploded = explodedTokens(withEl)

    def resolve(norm: Column) = coalesce(
      try_element_at(dictMap, norm),                  // N6 exact
      try_element_at(dictMap, capture(norm)))         // N7 regex

    val resolved = exploded.withColumn("loc",
      coalesce(
        resolve($"norm"),
        when($"stripped" =!= "", resolve($"strippedNorm"))))
    assemble(withEl, resolved)
  }

  /** n07 — the same resolution with the dictionary as a broadcast-joined
    * variant dimension: the at-scale form for dictionaries too large to
    * constant-fold into the plan. Four left BroadcastHashJoins (exact and
    * regex-capture tiers, plain and op-prefix-stripped), coalesced in the
    * reference's tier order. Result is row-identical to [[tier12Locations]]
    * (shared n06 oracle; PlanAuditSpec asserts the BHJ shape). */
  def tier12LocationsBroadcast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val withEl = withElFrame(spark, sfDir)
    val exploded = explodedTokens(withEl)
    val dim = Locations.variantRows.toDF("vkey", "canon")
    val resolved = resolveTokensBroadcast(exploded, dim)
    assemble(withEl, resolved)
  }

  /** The 4-tier broadcast lookup over an exploded token frame (columns
    * `norm`/`stripped`/`strippedNorm`) against an arbitrary
    * (vkey, canon) variant dimension — the piece that scales to
    * million-variant dictionaries (DictionaryScaleSpec drives it with a
    * 100k-variant synthetic dim). Adds a `loc` column.
    *
    * `combinedPattern` is the tier-2 embedded-variant alternation and
    * MUST be built from the same dimension's keys (the default is the
    * bundled dictionary's pattern, matching the default use through
    * [[tier12LocationsBroadcast]]) — a pattern from a different variant
    * set silently captures non-keys / misses dim keys. */
  private[graft] def resolveTokensBroadcast(
      exploded: DataFrame, dim: DataFrame,
      combinedPattern: String = Locations.combinedPattern): DataFrame = {
    // one broadcast left-join per lookup tier; a null key never matches,
    // which is exactly the literal-map miss semantics
    def lookup(df: DataFrame, key: Column, out: String): DataFrame = {
      val d = dim.select(col("vkey").as(s"_k_$out"), col("canon").as(out))
      df.join(broadcast(d), key === col(s"_k_$out"), "left").drop(s"_k_$out")
    }
    val looked = Seq[(String, DataFrame => Column)](
      "c_exact"  -> (df => df("norm")),
      "c_regex"  -> (df => capture(df("norm"), combinedPattern)),
      "c_sexact" -> (df => when(df("stripped") =!= "", df("strippedNorm"))),
      "c_sregex" -> (df => when(df("stripped") =!= "",
        capture(df("strippedNorm"), combinedPattern))),
    ).foldLeft(exploded) { case (df, (out, key)) => lookup(df, key(df), out) }
    looked.withColumn("loc",
      coalesce(col("c_exact"), col("c_regex"), col("c_sexact"), col("c_sregex")))
  }

  /** n09 — the claimed at-scale dictionary path under the driver's hash
    * gate: the same 4-tier broadcast lookup as n07
    * ([[resolveTokensBroadcast]]) driven by a variant dimension DERIVED
    * deterministically from testdata strings — 5 surface forms per
    * `part.p_name` (≈100k variants at sf0.1, scaling with the data)
    * instead of the bundled 40-variant dictionary. Each p_partkey
    * deterministically picks its probe token's surface form: 5 exact-hit
    * forms, an op-prefixed form only the stripped tier resolves, and a
    * guaranteed miss — so the exact and stripped BHJ tiers all carry real
    * traffic and the oracle regenerates the identical dim + tokens in SQL.
    *
    * The embedded-regex tiers run with a never-matching pattern: at 100k
    * variants a combined alternation regex stops being a viable artifact
    * (the n06/n07 pattern is linear-size in the dictionary text — fine at
    * 40 variants, megabytes at 100k), and embedded hits at this scale
    * belong to upstream tokenization. The two regex-tier joins stay in
    * the plan (null-keyed on every row), preserving the n07 shape. */
  /** The n09/n11 scale dimension, factored so the exact tiers (n09) and
    * the fuzzy tier (n11) provably run against the SAME variant dim.
    * Canonical entity name per part (p_name alone has only 64 distinct
    * values in the fixture; keying on name+id makes the dictionary scale
    * WITH the data: 5 × 20k = 100k variants at sf0.1). */
  private[graft] def scaleDim(part: DataFrame): DataFrame = {
    val canon = concat(col("p_name"), lit(" "), col("p_partkey"))
    part.select(
      explode(array(
        canon,
        translate(canon, " ", "_"),
        upper(canon),
        concat(lit("the "), canon),
        concat(canon, lit(" dept")))).as("vkey"),
      canon.as("canon"))
  }

  def dictScale(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val part = Tables.part(spark, sfDir)
    val canon = concat($"p_name", lit(" "), $"p_partkey")
    val dim = scaleDim(part)
    val m = pmod($"p_partkey", lit(7))
    val tokens = part.select($"p_partkey".as("tok_id"),
      when(m === 0, canon)
        .when(m === 1, translate(canon, " ", "_"))
        .when(m === 2, upper(canon))
        .when(m === 3, concat(lit("the "), canon))
        .when(m === 4, concat(canon, lit(" dept")))
        .when(m === 5, concat(lit("fetch: "), canon))
        .otherwise(concat(lit("zz near nothing "), $"p_partkey")).as("norm"))
      .withColumn("stripped",
        when($"norm".startsWith("fetch: "), expr("substring(norm, 8)"))
          .otherwise(lit("")))
      .withColumn("strippedNorm", $"stripped")
    resolveTokensBroadcast(tokens, dim, "(x^)")
      .select($"tok_id", $"norm", $"loc")
      .orderBy($"tok_id")
  }

  val dictScaleSql: String =
    """WITH base AS (
      |  SELECT p_partkey, p_name || ' ' || p_partkey AS canon FROM part
      |), dim AS (
      |  SELECT unnest([
      |      canon,
      |      replace(canon, ' ', '_'),
      |      upper(canon),
      |      'the ' || canon,
      |      canon || ' dept']) AS vkey,
      |    canon
      |  FROM base
      |), toks AS (
      |  SELECT p_partkey AS tok_id,
      |    CASE p_partkey % 7
      |      WHEN 0 THEN canon
      |      WHEN 1 THEN replace(canon, ' ', '_')
      |      WHEN 2 THEN upper(canon)
      |      WHEN 3 THEN 'the ' || canon
      |      WHEN 4 THEN canon || ' dept'
      |      WHEN 5 THEN 'fetch: ' || canon
      |      ELSE 'zz near nothing ' || p_partkey END AS norm
      |  FROM base
      |), t2 AS (
      |  SELECT tok_id, norm,
      |    CASE WHEN norm LIKE 'fetch: %' THEN substr(norm, 8) ELSE '' END
      |      AS stripped
      |  FROM toks
      |)
      |SELECT t2.tok_id, t2.norm, COALESCE(d1.canon, d2.canon) AS loc
      |FROM t2
      |LEFT JOIN dim d1 ON t2.norm = d1.vkey
      |LEFT JOIN dim d2
      |  ON (CASE WHEN t2.stripped <> '' THEN t2.stripped END) = d2.vkey
      |ORDER BY tok_id""".stripMargin

  val tier12Sql: String =
    s"""WITH trips AS (
       |${Trips.rawSql}
       |)
       |SELECT trip_key, vid,
       |  ${Trips.caseByVid(Goldens.tier12Locations.map(_.mkString("|")))} AS locations,
       |  CAST(${Trips.caseByVidInt(Goldens.tier12Locations.map(_.size))} AS BIGINT) AS n_locations
       |FROM trips ORDER BY trip_key""".stripMargin

  /** Length of the string the scorer actually compares: tokens split
    * on whitespace, empties dropped, re-joined single-spaced (the
    * token-SORT permutes but preserves this length). The band predicate
    * must measure THESE lengths — raw `length(norm)` drifts from them
    * under doubled/leading/trailing whitespace. */
  private def scoredLen(norm: Column): Column =
    length(array_join(filter(split(norm, "\\s+"), t => length(t) > 0), " "))

  /** Cutoff-derived length-band predicate for the fuzzy blocking
    * post-filter — sound by construction, not a fixture-tuned constant:
    * token_sort_ratio = 100·(1 − d/(la+lb)) with indel distance
    * d ≥ |la − lb|, so score ≥ cutoff forces
    * |la − lb|·100 ≤ (100 − cutoff)·(la + lb). Any candidate failing
    * this CANNOT clear the cutoff at any edit pattern or string length
    * (a fixed half-width of 8 was provably lossy once la+lb ≥ ~50 at
    * cutoff 82); integer arithmetic, no float rounding at the
    * boundary. */
  private[graft] def fuzzyLenBandPred(la: Column, lb: Column,
      cutoff: Double): Column =
    abs(la - lb) * 100 <= lit((100 - cutoff).toInt) * (la + lb)

  /** Blocking keys for one normalized string: every unordered pair of
    * its first-3 sorted distinct whitespace tokens, joined "a|b". A
    * single-token typo changes at most one of the three, so probe and
    * true variant always share ≥1 pair — recall is structural, not
    * probabilistic. Pairs (vs single tokens) keep blocks tiny: the
    * fixture's word vocabulary is small (~92 p_name words), so a
    * single-token block would hold ~1% of a 100k dictionary, while two
    * specific tokens co-occurring is rare. */
  private[graft] def blockKeys(norm: Column): Column = {
    val t3 = slice(array_sort(array_distinct(
      filter(split(norm, " "), t => length(t) > 0))), 1, 3)
    flatten(zip_with(t3, sequence(lit(1), size(t3)),
      (x, i) => transform(slice(t3, i + 1, lit(2)),
        y => concat(x, lit("|"), y))))
  }

  /** n11 — tier-3 fuzzy matching at dictionary scale (rows-only; gated
    * by DictionaryScaleSpec's recall test against the exhaustive
    * argmax). The bundled cleaner's fuzzy tier (N8) is an O(|dict|)
    * argmax per unresolved string — correct at 17 variants, not viable
    * at 100k. This is the standard blocked fuzzy-join shape instead:
    *
    *  1. both sides emit [[blockKeys]] (pairs of first-3 sorted tokens);
    *  2. an equi-join on the key generates candidates — cost ∝ real
    *     near-matches, never |probes|×|dict|;
    *  3. a length-band post-filter ([[fuzzyLenBandPred]], derived from
    *     the score cutoff) drops candidates no edit budget could score;
    *  4. survivors are scored with the codegen'd `token_sort_ratio`
    *     (the N8 scorer) and the per-probe argmax ≥ 82 wins, ties
    *     broken by vkey for determinism;
    *  5. a left join back onto the probe set keeps misses as NULL loc.
    *
    * Probes are deterministic single-char edits of the n09 canon (drop
    * last char / duplicate first char / append a char) plus a
    * guaranteed-miss form, so the true argmax is known by construction
    * and the spec can replay the exhaustive crossJoin at fixture scale.
    * At 100 TB both sides are map-side key generation into one shuffle
    * equi-join on the pair key; no all-pairs stage exists anywhere. */
  def fuzzyDictScale(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.functions.CustomExprs.register(spark)
    val part = Tables.part(spark, sfDir)
    val probes = fuzzyProbes(part)
    val dimKeyed = scaleDim(part)
      .withColumn("dlen", scoredLen($"vkey"))
      .select($"vkey", $"canon", $"dlen",
        explode(blockKeys($"vkey")).as("bkey"))
    val probeKeyed = probes
      .withColumn("plen", scoredLen($"norm"))
      .select($"tok_id", $"norm", $"plen",
        explode(blockKeys($"norm")).as("bkey"))
    val best = probeKeyed.join(dimKeyed, "bkey")
      .where(fuzzyLenBandPred($"plen", $"dlen",
        graft.nlp.Cleaner.FuzzyScoreCutoff))
      .select($"tok_id", $"norm", $"vkey", $"canon").distinct()
      .withColumn("score",
        graft.functions.CustomExprs.token_sort_ratio($"norm", $"vkey"))
      .where($"score" >= graft.nlp.Cleaner.FuzzyScoreCutoff)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"tok_id").orderBy($"score".desc, $"vkey".asc)))
      .where($"rn" === 1)
      .select($"tok_id", $"canon".as("loc"), $"score")
    probes.join(best, Seq("tok_id"), "left")
      .select($"tok_id", $"norm", $"loc", $"score")
      .orderBy($"tok_id")
  }

  /** The n11 probe set: one fuzzy probe per part, m = p_partkey % 4
    * selecting the edit. Forms 0-2 are single-char edits of the canon
    * whose unique best match is the canon's own plain variant (indel
    * distance 1-2 ⇒ score ≈ 98-99; every other entry differs by whole
    * words); form 3 shares no token pair with any variant and scores
    * far below the cutoff — a structural miss. */
  private[graft] def fuzzyProbes(part: DataFrame): DataFrame = {
    val m = pmod(col("p_partkey"), lit(4))
    val key = col("p_partkey").cast("string")
    part.select(col("p_partkey").as("tok_id"),
      when(m === 0, concat(expr("substring(p_name, 1, length(p_name) - 1)"),
          lit(" "), key))
        .when(m === 1, concat(substring(col("p_name"), 1, 1), col("p_name"),
          lit(" "), key))
        .when(m === 2, concat(col("p_name"), lit("x "), key))
        .otherwise(concat(lit("qq vv ww unrelated "), key)).as("norm"))
  }

  // ----------------------- n12: the composed 3-tier resolver w/ switch

  /** Dictionary-size threshold for the fuzzy tier's physical form:
    * at or below it the exhaustive argmax runs as a broadcast
    * crossJoin of the dim (candidates = |probes|·|dict|, fine for a
    * dim-sized dictionary and EXACT for every string shape); above it
    * the n11 blocked join takes over (cost ∝ real near-matches). The
    * switch is a plan-construction decision off a bounded
    * `limit(n+1).count()` probe of the dim — the same class of
    * driver-side sizing AQE does for broadcast thresholds. */
  private[graft] val FuzzyBlockSwitch = 512L

  /** The fuzzy tier over DISTINCT probe strings (`fnorm`) against an
    * arbitrary (vkey, canon, vorder) dimension → (fnorm, floc):
    * best-scoring variant at or above the cutoff, ties broken by
    * vorder then vkey (the bundled dictionary passes its insertion
    * index as vorder, preserving the reference cleaner's first-wins
    * tie rule; callers without a meaningful order pass a constant and
    * fall to the vkey tiebreak). Physical form picked by
    * [[FuzzyBlockSwitch]] (or forced via `blocked` for equivalence
    * gates). Recall boundary of the blocked form, documented at n11:
    * structural for multi-token strings with single-token edits (≥ 1
    * of the first-3-token pair keys survives); single-token strings
    * emit no pair key, so a dictionary of single-token variants must
    * stay below the switch (as the bundled one does) or grow
    * char-gram keys. */
  private[graft] def fuzzyResolveDim(probes: DataFrame, dim: DataFrame,
      blocked: Option[Boolean] = None): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    graft.functions.CustomExprs.register(spark)
    val useBlocked = blocked.getOrElse(
      dim.limit((FuzzyBlockSwitch + 1).toInt).count() > FuzzyBlockSwitch)
    val cand =
      if (useBlocked) {
        val dimKeyed = dim.withColumn("dlen", scoredLen($"vkey"))
          .select($"vkey", $"canon", $"vorder", $"dlen",
            explode(blockKeys($"vkey")).as("bkey"))
        val probeKeyed = probes.withColumn("plen", scoredLen($"fnorm"))
          .select($"fnorm", $"plen", explode(blockKeys($"fnorm")).as("bkey"))
        probeKeyed.join(dimKeyed, "bkey")
          .where(fuzzyLenBandPred($"plen", $"dlen",
            graft.nlp.Cleaner.FuzzyScoreCutoff))
          .select($"fnorm", $"vkey", $"canon", $"vorder").distinct()
      } else probes.crossJoin(broadcast(dim))
    cand.withColumn("score",
        graft.functions.CustomExprs.token_sort_ratio($"fnorm", $"vkey"))
      .where($"score" >= graft.nlp.Cleaner.FuzzyScoreCutoff)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"fnorm")
          .orderBy($"score".desc, $"vorder".asc, $"vkey".asc)))
      .where($"rn" === 1)
      .select($"fnorm", $"canon".as("floc"))
  }

  /** All three lookup tiers over an exploded token frame, in the
    * reference cleaner's per-token order: exact(norm) → regex(norm) →
    * FUZZY(norm) → exact(stripped) → regex(stripped) →
    * FUZZY(stripped), each fuzzy gated on the cleaner's min length.
    * Tiers 1-2 are [[resolveTokensBroadcast]] unchanged; the fuzzy
    * tier runs ONCE over the distinct union of still-unresolved norms
    * and strippedNorms (a vocabulary-bounded string dim) through
    * [[fuzzyResolveDim]], then broadcast-joins back onto the token
    * frame for both coalesce positions. Fact rows never see the
    * dictionary or the scorer. */
  private[graft] def resolveTokensTiered(exploded: DataFrame,
      dim: DataFrame, combinedPattern: String,
      blocked: Option[Boolean] = None): DataFrame = {
    val spark = exploded.sparkSession
    import spark.implicits._
    val minLen = graft.nlp.Cleaner.FuzzyMinLen
    val t12 = resolveTokensBroadcast(
      exploded, dim.select($"vkey", $"canon"), combinedPattern)
    val probeNorms = t12
      .filter(coalesce($"c_exact", $"c_regex").isNull &&
        length($"norm") >= minLen)
      .select($"norm".as("fnorm"))
    val probeStripped = t12
      .filter($"stripped" =!= "" &&
        coalesce($"c_sexact", $"c_sregex").isNull &&
        length($"strippedNorm") >= minLen)
      .select($"strippedNorm".as("fnorm"))
    val fuzzy = fuzzyResolveDim(
      probeNorms.union(probeStripped).distinct(), dim, blocked)
    t12
      .join(broadcast(fuzzy.select($"fnorm".as("norm"),
        $"floc".as("f_norm"))), Seq("norm"), "left")
      .join(broadcast(fuzzy.select($"fnorm".as("strippedNorm"),
        $"floc".as("f_stripped"))), Seq("strippedNorm"), "left")
      .withColumn("loc", coalesce(
        $"c_exact", $"c_regex",
        when(length($"norm") >= minLen, $"f_norm"),
        $"c_sexact", $"c_sregex",
        when($"stripped" =!= "" && length($"strippedNorm") >= minLen,
          $"f_stripped")))
  }

  /** n12 — extract_all_locations with ALL THREE tiers relational: the
    * n07 dataflow plus the fuzzy tier through the [[FuzzyBlockSwitch]]
    * dictionary-size switch (the bundled 17-variant dictionary sits
    * below it, so the registered query runs the exhaustive-argmax
    * branch; DictionaryScaleSpec forces both branches over the n09
    * 100k dim and proves them equal). This is the q4/n10 resolution
    * semantics (reference cleaner_v6.py:198-260) with zero UDFs — the
    * form that stays honest when the dictionary outgrows a UDF
    * closure — and it is gated by the SAME per-vid goldens as n10's
    * UDF path, so the two implementations cannot drift apart
    * silently. */
  def tieredLocations(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val withEl = withElFrame(spark, sfDir)
    val exploded = explodedTokens(withEl)
    val dim = Locations.variantRows.zipWithIndex
      .map { case ((v, c), i) => (v, c, i.toLong) }
      .toDF("vkey", "canon", "vorder")
    assemble(withEl,
      resolveTokensTiered(exploded, dim, Locations.combinedPattern))
  }

  /** n12's oracle: the SAME golden per-vid location lists that gate
    * n10's UDF path (fuzzy tier included), replayed as CASE tables —
    * full hash oracle, no rows-only concession. */
  val tieredLocationsSql: String =
    s"""WITH trips AS (
       |${Trips.rawSql}
       |)
       |SELECT trip_key, vid,
       |  ${Trips.caseByVid(Goldens.allLocations.map(_.mkString("|")))} AS locations,
       |  CAST(${Trips.caseByVidInt(Goldens.allLocations.map(_.size))} AS BIGINT) AS n_locations
       |FROM trips ORDER BY trip_key""".stripMargin
}

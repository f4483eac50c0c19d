package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{ColumnPlugins, Text, Vectors}
import graft.operators._

/** The engine's demonstrable query suite: one entry per operator family
  * from SURVEY.md §2 (+ the large-scale curation extensions), each with
  * a DuckDB-runnable oracle where SQL can express the semantics.
  *
  * Column names and types are aligned pairwise between the Spark plan
  * and the oracle SQL — the driver's compare hashes values under sorted
  * column names. Nondeterministic orderings are always tie-broken by a
  * unique key; floating aggregates are rounded identically on both
  * sides (engine-difference ≈1e-15 ≪ rounding granularity).
  */
object Queries {

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = s.read.parquet(s"$dir/$name.parquet")
    // The driver has written events.ts in two parquet physical forms over
    // time: INT64 TIMESTAMP(NANOS) (read as long under
    // spark.sql.legacy.parquet.nanosAsLong, set in Verify/Bench) and plain
    // timestamp[us] with no UTC adjustment (read as TIMESTAMP_NTZ).
    // Normalize both to µs TimestampType so every downstream consumer —
    // unix_micros, window(), typed java.sql.Timestamp encoders — sees one
    // canonical type, matching the `ts::TIMESTAMP` casts on the DuckDB
    // oracle side. NTZ→TZ here is a wall-clock reinterpretation in the
    // session zone; Verify/Bench pin spark.sql.session.timeZone=UTC so it
    // is exactly the identity the oracle applies.
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case LongType if f.name == "ts" =>
          acc.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
        case TimestampNTZType =>
          acc.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => acc
      }
    }
  }

  // ---------------------------------------------------------------- q01
  // A-family: grouped aggregation (pricing summary; SURVEY §2.5)
  private def q01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2)
          .as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      | sum(l_quantity) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      | round(avg(l_quantity), 4) AS avg_qty,
      | count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  // J1: multi-way dim enrichment, dims broadcast (SURVEY §2.4)
  private def q02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("order_cnt"),
        round(sum($"o_totalprice"), 2).as("total_price"),
        round(avg($"c_acctbal"), 4).as("avg_bal"))
      .orderBy($"r_name", $"n_name")
  }
  private val q02Sql =
    """SELECT r_name, n_name, count(*) AS order_cnt,
      | round(sum(o_totalprice), 2) AS total_price,
      | round(avg(c_acctbal), 4) AS avg_bal
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q03
  // P2/J2: anti-join dedup (parts never ordered)
  private def q03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .join(t(s, dir, "lineitem"), $"p_partkey" === $"l_partkey", "left_anti")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("never_ordered"))
      .orderBy($"p_brand")
  }
  private val q03Sql =
    """SELECT p_brand, count(*) AS never_ordered
      |FROM part p
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q04
  // J3: semi-join validation (customers having orders)
  private def q04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("cust_cnt"))
      .orderBy($"c_mktsegment")
  }
  private val q04Sql =
    """SELECT c_mktsegment, count(*) AS cust_cnt
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q05
  // T1/P13: ranked top-k per group — bounded top-k Aggregator
  // (Skew.topKAgg): c_mktsegment has 5 values, so a plain window
  // would sort each segment on one task; the Aggregator ships ≤ k
  // rows per group per map task and sorts nothing globally.
  // Exact — oracle unchanged.
  private def q05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val joined = t(s, dir, "orders")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"o_orderkey", $"o_totalprice")
    Skew.topKAgg(joined, "c_mktsegment", "o_orderkey", "o_totalprice",
        k = 3)
      .select($"c_mktsegment", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"c_mktsegment", $"rn")
  }
  private val q05Sql =
    """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
      | SELECT c_mktsegment, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY c_mktsegment
      |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders JOIN customer ON o_custkey = c_custkey)
      |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin

  // ---------------------------------------------------------------- q06
  // T2: weighted-score top-k per group (0.7/0.3 formula)
  private def q06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val combined = $"o_totalprice" / 1000.0 * 0.7 + $"c_acctbal" * 0.3
    val w = Window.partitionBy($"n_name")
      .orderBy(combined.desc, $"o_orderkey".asc)
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 5)
      .select($"n_name", $"rn", $"o_orderkey",
        round(combined, 4).as("combined"))
      .orderBy($"n_name", $"rn")
  }
  private val q06Sql =
    """SELECT n_name, rn, o_orderkey, round(combined, 4) AS combined FROM (
      | SELECT n_name, o_orderkey,
      |  o_totalprice / 1000.0 * 0.7 + c_acctbal * 0.3 AS combined,
      |  row_number() OVER (PARTITION BY n_name
      |    ORDER BY o_totalprice / 1000.0 * 0.7 + c_acctbal * 0.3 DESC,
      |             o_orderkey) AS rn
      | FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey)
      |WHERE rn <= 5 ORDER BY n_name, rn""".stripMargin

  // ---------------------------------------------------------------- q07
  // K2: keyed MERGE upsert (replace-row semantics), checksum output
  private def q07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
    // floor(x·100+0.5)/100 instead of round(x, 2): both engines evaluate
    // it on the same IEEE double, so half-way ties break identically
    // (round() ties differ: Spark BigDecimal HALF_UP vs DuckDB scaled
    // double) — same trick as q18's quality rounding.
    val updates = orders.filter($"o_orderkey" % 7 === 0)
      .select($"o_orderkey", $"o_custkey", lit("U").as("o_orderstatus"),
        (floor($"o_totalprice" * 1.1 * 100.0 + 0.5) / 100.0).as("o_totalprice"),
        $"o_orderdate", $"o_orderpriority")
    val inserts = orders.filter($"o_orderkey" % 1000 === 0)
      .select(($"o_orderkey" + 10000000L).as("o_orderkey"), $"o_custkey",
        lit("N").as("o_orderstatus"), lit(1.0).as("o_totalprice"),
        $"o_orderdate", $"o_orderpriority")
    val merged = Upsert.merge(orders, updates.unionByName(inserts),
      Seq("o_orderkey"))
    merged.groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        (floor(sum($"o_totalprice") * 100.0 + 0.5) / 100.0).as("total"))
      .orderBy($"o_orderstatus")
  }
  private val q07Sql =
    """WITH delta AS (
      | SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
      |  floor(o_totalprice * 1.1 * 100.0 + 0.5) / 100.0 AS o_totalprice,
      |  o_orderdate, o_orderpriority
      | FROM orders WHERE o_orderkey % 7 = 0
      | UNION ALL
      | SELECT o_orderkey + 10000000, o_custkey, 'N', 1.0, o_orderdate, o_orderpriority
      | FROM orders WHERE o_orderkey % 1000 = 0
      |), merged AS (
      | SELECT * FROM delta
      | UNION ALL
      | SELECT * FROM orders o
      | WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.o_orderkey = o.o_orderkey)
      |)
      |SELECT o_orderstatus, count(*) AS cnt,
      | floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS total
      |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q08
  // K4: partial column-patch upsert ($set semantics, coalesce per column)
  private def q08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = t(s, dir, "customer")
    val patch = customer.filter($"c_custkey" % 10 === 0)
      .select($"c_custkey", ($"c_acctbal" + 100.0).as("c_acctbal"),
        lit(null).cast("string").as("c_mktsegment"))
    val merged = Upsert.merge(customer, patch, Seq("c_custkey"), patch = true)
    merged.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("cnt"), round(sum($"c_acctbal"), 2).as("total_bal"))
      .orderBy($"c_mktsegment")
  }
  private val q08Sql =
    """WITH patch AS (
      | SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal,
      |  CAST(NULL AS VARCHAR) AS c_mktsegment
      | FROM customer WHERE c_custkey % 10 = 0)
      |SELECT c_mktsegment, count(*) AS cnt, round(sum(c_acctbal), 2) AS total_bal
      |FROM (
      | SELECT coalesce(p.c_mktsegment, c.c_mktsegment) AS c_mktsegment,
      |        coalesce(p.c_acctbal, c.c_acctbal) AS c_acctbal
      | FROM customer c LEFT JOIN patch p USING (c_custkey))
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q09
  // P4-P6: validation constraints with routed rejects
  private def q09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val okLangs = Seq("en", "de", "fr")
    t(s, dir, "documents")
      .withColumn("status",
        when($"text".isNull || length($"text") < 200, lit("reject_short"))
          .when(!$"lang".isin(okLangs.map(lit): _*), lit("reject_fk"))
          .otherwise(lit("ok")))
      .groupBy($"lang", $"status")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"lang", $"status")
  }
  private val q09Sql =
    """SELECT lang,
      | CASE WHEN text IS NULL OR length(text) < 200 THEN 'reject_short'
      |      WHEN lang NOT IN ('en','de','fr') THEN 'reject_fk'
      |      ELSE 'ok' END AS status,
      | count(*) AS cnt
      |FROM documents GROUP BY 1, 2 ORDER BY lang, status""".stripMargin

  // ---------------------------------------------------------------- q10
  // ST4/ST5: staleness refresh predicate (deterministic cursor)
  private def q10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Events.staleRows(t(s, dir, "events"), "ts", 7)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("stale_cnt"))
      .orderBy($"user_id")
  }
  private val q10Sql =
    """SELECT user_id, count(*) AS stale_cnt FROM events
      |WHERE ts < (SELECT max(ts) - INTERVAL 7 DAY FROM events)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q11
  // A5: fact-check scorecard (conditional counts + tiered clamp)
  private def q11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = t(s, dir, "events").groupBy($"user_id").agg(
      sum(when($"event_type" === "purchase", 1).otherwise(0)).as("confirmed"),
      sum(when($"event_type" === "error", 1).otherwise(0)).as("refuted"),
      count(lit(1)).as("total"))
    agg.select($"user_id",
      when($"total" === 0, 0.0)
        .when($"total" < 5, 1.0)
        .when($"total" < 8, 2.0)
        .when($"total" < 10, 3.0)
        .otherwise(round(
          greatest(lit(3.0), least(lit(10.0),
            ($"confirmed".cast("double") / $"total" -
              $"refuted".cast("double") * 0.5 / $"total") * 10.0)), 4))
        .as("score"))
      .orderBy($"user_id")
  }
  private val q11Sql =
    """SELECT user_id,
      | CASE WHEN total = 0 THEN 0.0
      |      WHEN total < 5 THEN 1.0
      |      WHEN total < 8 THEN 2.0
      |      WHEN total < 10 THEN 3.0
      |      ELSE round(greatest(3.0, least(10.0,
      |        (CAST(confirmed AS DOUBLE) / total
      |         - CAST(refuted AS DOUBLE) * 0.5 / total) * 10.0)), 4)
      | END AS score
      |FROM (
      | SELECT user_id,
      |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS confirmed,
      |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS refuted,
      |  count(*) AS total
      | FROM events GROUP BY user_id)
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q12
  // U2: priority-then-refresh union of ranked batches
  private def q12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = t(s, dir, "events")
    val priority = events.filter($"event_type" === "error")
      .orderBy($"ts".desc, $"event_id".asc).limit(10)
    val refresh = events.filter($"event_type" === "view")
      .orderBy($"ts".asc, $"event_id".asc).limit(10)
    priority.unionByName(refresh)
      .select($"event_id", $"event_type", $"ts")
      .orderBy($"event_id")
  }
  private val q12Sql =
    """SELECT event_id, event_type, ts FROM (
      | SELECT * FROM (SELECT event_id, event_type, ts FROM events
      |  WHERE event_type = 'error' ORDER BY ts DESC, event_id LIMIT 10)
      | UNION ALL
      | SELECT * FROM (SELECT event_id, event_type, ts FROM events
      |  WHERE event_type = 'view' ORDER BY ts ASC, event_id LIMIT 10))
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q13
  // Event-time tumbling window aggregate
  private def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Events.tumbling(t(s, dir, "events"), "ts", "event_type", "value")
      .select($"window_start", $"event_type", $"cnt",
        round($"sum_value", 2).as("sum_value"))
      .orderBy($"window_start", $"event_type")
  }
  private val q13Sql =
    """SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start, event_type,
      | count(*) AS cnt, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q14
  // Event-time sliding window aggregate (1h width, 30m slide)
  private def q14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Events.sliding(t(s, dir, "events"), "ts", "event_type", "value")
      .select($"window_start", $"event_type", $"cnt",
        round($"sum_value", 2).as("sum_value"))
      .orderBy($"window_start", $"event_type")
  }
  private val q14Sql =
    """WITH e AS (
      | SELECT event_type, value,
      |  (date_trunc('hour', ts) + CASE WHEN minute(ts) >= 30
      |    THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END)::TIMESTAMP AS slot
      | FROM events)
      |SELECT window_start, event_type, count(*) AS cnt,
      | round(sum(value), 2) AS sum_value
      |FROM (SELECT unnest([slot, slot - INTERVAL 30 MINUTE]) AS window_start,
      |       event_type, value FROM e)
      |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q15
  // Session windows (30-min gap) per user — gaps-and-islands
  private def q15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Events.sessionStats(t(s, dir, "events"), "ts", "user_id", "event_id", 30)
      .orderBy($"user_id")
  }
  private val q15Sql =
    """WITH o AS (
      | SELECT user_id, ts::TIMESTAMP AS ts, event_id,
      |  CASE WHEN lag(ts::TIMESTAMP) OVER w IS NULL
      |        OR ts::TIMESTAMP - lag(ts::TIMESTAMP) OVER w > INTERVAL 30 MINUTE
      |       THEN 1 ELSE 0 END AS ns
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
      |), se AS (
      | SELECT user_id,
      |  sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                ROWS UNBOUNDED PRECEDING) AS sess_id
      | FROM o
      |), g AS (
      | SELECT user_id, sess_id, count(*) AS n FROM se GROUP BY 1, 2)
      |SELECT user_id, count(*) AS session_cnt, max(n) AS max_session_events,
      | CAST(sum(n) AS BIGINT) AS total_events
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q16
  // F1/F2: slugify + alias over Vietnamese fixture names
  val slugFixtures: Seq[String] = Seq(
    "Tuổi Trẻ", "Thể thao", "Giáo dục", "VnExpress", "Thanh Niên",
    "Khoa học", "Sức khỏe", "Giải trí", "Kinh doanh", "Thời sự",
    "Pháp luật", "Du lịch", "Công nghệ", "Thế giới")
  private def q16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    slugFixtures.toDF("name")
      .select($"name", Text.slugify($"name").as("slug"),
        Text.aliasFromTopic($"name").as("alias"))
      .orderBy($"name")
  }
  private def q16Sql: String = {
    val values = slugFixtures.map(n => s"('$n')").mkString(", ")
    s"""SELECT name,
       | replace(translate(lower(name), '${Text.diacriticFrom}', '${Text.diacriticTo}'), ' ', '') AS slug,
       | lower(array_to_string(list_transform(string_split(name, ' '),
       |   w -> substr(w, 1, 1)), '')) AS alias
       |FROM (VALUES $values) t(name) ORDER BY name""".stripMargin
  }

  // ---------------------------------------------------------------- q17
  // Token counting (whitespace + BPE-ish + distinct)
  private def q17(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select($"doc_id",
      TextAnalysis.wsTokenCount($"text").cast("long").as("ws_tokens"),
      TextAnalysis.bpeTokenCount($"text").cast("long").as("bpe_tokens"),
      TextAnalysis.distinctTokenCount($"text").cast("long")
        .as("distinct_tokens"))
      .orderBy($"doc_id")
  }
  private val q17Sql =
    """SELECT doc_id,
      | len(regexp_extract_all(text, '\S+')) AS ws_tokens,
      | len(regexp_extract_all(lower(text), '[a-z0-9]{1,4}')) AS bpe_tokens,
      | len(list_distinct(regexp_extract_all(text, '\S+'))) AS distinct_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q18
  // Document quality scoring
  private def q18(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // floor(x·10⁴+0.5)/10⁴ instead of round(x, 4): both engines compute
    // it on the same IEEE double, so half-way ties break identically
    // (round() ties differ: Spark BigDecimal HALF_UP vs DuckDB scaled
    // double).
    t(s, dir, "documents").select($"doc_id",
      (floor(TextAnalysis.qualityScore($"text") * 10000.0 + 0.5) / 10000.0)
        .as("quality"))
      .orderBy($"doc_id")
  }
  private def q18Sql: String = {
    val stopRe = s"\\b(${TextAnalysis.stopwords.mkString("|")})\\b"
    s"""SELECT doc_id, floor((CASE WHEN toks > 0 THEN
       |  least(1.0, toks / 100.0) * 0.4
       |  + least(1.0, stop * 5.0 / toks) * 0.3
       |  + (dist / toks) * 0.3 ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS quality
       |FROM (
       | SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS toks,
       |  CAST(len(regexp_extract_all(lower(text), '$stopRe')) AS DOUBLE) AS stop,
       |  CAST(len(list_distinct(regexp_extract_all(text, '\\S+'))) AS DOUBLE) AS dist
       | FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q19
  // Language ID (stopword-profile argmax heuristic)
  private def q19(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select($"doc_id",
      TextAnalysis.langId($"text").as("lang_pred"))
      .orderBy($"doc_id")
  }
  private def q19Sql: String = {
    val scores = TextAnalysis.langProfiles.map { case (lang, re) =>
      s"len(regexp_extract_all(lower(text), '$re')) AS s_$lang"
    }.mkString(",\n  ")
    val names = TextAnalysis.langProfiles.map(_._1)
    val best = s"greatest(${names.map("s_" + _).mkString(", ")})"
    val cases = names.map(l => s"WHEN s_$l = best THEN '$l'").mkString(" ")
    s"""SELECT doc_id, CASE WHEN best = 0 THEN 'und' $cases END AS lang_pred
       |FROM (SELECT doc_id, $best AS best, s_de, s_en, s_es, s_fr FROM (
       | SELECT doc_id,
       |  $scores
       | FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q20
  // Content fingerprinting (md5 of normalized text)
  private def q20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select($"doc_id",
      TextAnalysis.fingerprint($"text").as("fp"))
      .orderBy($"doc_id")
  }
  private val q20Sql =
    """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q21
  // Exact dedup: keep min-id survivor per fingerprint (dup'd input)
  private def q21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select($"doc_id", $"text")
    val dup = docs.filter($"doc_id" < 100)
      .select(($"doc_id" + 10000000L).as("doc_id"), $"text")
    Dedup.exact(docs.unionByName(dup), "text", "doc_id")
      .select($"fp", $"keeper", $"copies")
      .orderBy($"keeper")
  }
  private val q21Sql =
    """WITH u AS (
      | SELECT doc_id, text FROM documents
      | UNION ALL
      | SELECT doc_id + 10000000, text FROM documents WHERE doc_id < 100)
      |SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
      | min(doc_id) AS keeper, count(*) AS copies
      |FROM u GROUP BY 1 ORDER BY keeper""".stripMargin

  // ---------------------------------------------------------------- q22
  // Exact n-gram (3-word shingle) Jaccard similarity pairs
  private def q22(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "documents").filter($"doc_id" < 40)
      .select($"doc_id", $"text")
    // inject exact copies (id+1000) so near-dup pairs exist at any sf
    val docs = base.unionByName(base.filter($"doc_id" < 20)
      .select(($"doc_id" + 10000000L).as("doc_id"), $"text"))
    // inverted-index all-pairs join (no cross join): only docs that
    // actually share a shingle ever meet
    Dedup.jaccardPairs(docs, "text", "doc_id", minJaccard = 0.03)
      .select($"id_a", $"id_b", round($"jaccard", 4).as("jaccard"))
      .orderBy($"id_a", $"id_b")
  }
  private val q22Sql =
    """WITH u AS (
      | SELECT doc_id, text FROM documents WHERE doc_id < 40
      | UNION ALL
      | SELECT doc_id + 10000000, text FROM documents WHERE doc_id < 20),
      |d AS (
      | SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w
      | FROM u),
      |sh AS (
      | SELECT doc_id, unnest(list_distinct(list_transform(
      |   range(1, len(w) - 1),
      |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sgl
      | FROM d),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |inter AS (
      | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      | FROM sh a JOIN sh b ON a.sgl = b.sgl AND a.doc_id < b.doc_id
      | GROUP BY 1, 2)
      |SELECT id_a, id_b,
      | round(i * 1.0 / (ca.n + cb.n - i), 4) AS jaccard
      |FROM inter
      |JOIN cnt ca ON ca.doc_id = id_a
      |JOIN cnt cb ON cb.doc_id = id_b
      |WHERE i * 1.0 / (ca.n + cb.n - i) > 0.03
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q23
  // A2: element-wise vector mean per group
  private def q23(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // typed Aggregator: ONE shuffle of (sums[64], count) partials per
    // label — not 64× exploded rows (scale note in VecMeanAgg docs)
    Similarity.vecMeanAgg(t(s, dir, "embeddings"), "label", "embedding")
      .select($"key".as("label"), posexplode($"mean_vec").as(Seq("pos", "v")))
      .select($"label", $"pos".cast("long").as("idx"),
        round($"v", 5).as("mean_val"))
      .orderBy($"label", $"idx")
  }
  private val q23Sql =
    """SELECT label, i - 1 AS idx, round(avg(embedding[i]), 5) AS mean_val
      |FROM embeddings, range(1, 65) t(i)
      |GROUP BY 1, 2 ORDER BY label, idx""".stripMargin

  // ---------------------------------------------------------------- q24
  // J5: brute-force cosine top-k similarity join
  private def q24(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb.filter($"vec_id" < 10), emb,
        "vec_id", "embedding", 5)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  /** DuckDB brute-force cosine top-k over `embeddings` for queries
    * matching `pred` — the shared oracle for every exact-equivalent
    * retrieval path (q24 brute force, q48 exhaustive IVF, q77
    * exhaustive IVF-PQ): same tie-break (sim DESC, c_id) as
    * Similarity.rankTopK.
    */
  private def bruteTopKSql(pred: String, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
       |  FROM embeddings WHERE $pred),
       |c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings),
       |sc AS (
       | SELECT q_id, c_id,
       |  list_dot_product(qv, cv)
       |    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
       |    AS sim
       | FROM q, c WHERE q_id <> c_id),
       |r AS (SELECT q_id, c_id, sim,
       | row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank
       | FROM sc)
       |SELECT q_id, rank, c_id, round(sim, 6) AS sim
       |FROM r WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  private val q24Sql = bruteTopKSql("vec_id < 10", 5)

  // ---------------------------------------------------------------- q25
  // MinHash+LSH near-dup candidates, oracle mode: engine-neutral
  // md5-derived 32-bit hashes (Dedup.Md5) so DuckDB replays the exact
  // signature minima and band keys bit-for-bit — the production path
  // keeps xxhash64 (spec-pinned in DedupSpec; oracle ≡ fast-path
  // candidate semantics modulo hash family)
  private def q25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select($"doc_id", $"text")
    val dup = docs.filter($"doc_id" < 50)
      .select(($"doc_id" + 10000000L).as("doc_id"), $"text")
    Dedup.minhashCandidates(docs.unionByName(dup), "text", "doc_id",
        hash = Dedup.Md5)
      .orderBy($"id_a", $"id_b")
  }
  /** Shared DuckDB CTE prefix: word 3-shingles and their md5-derived
    * 32-bit hashes, mirroring Dedup.shingles + Dedup.md5u32 over `src`
    * (a CTE providing (doc_id, text)).
    */
  private def shingleHashCtes: String =
    """w AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'),
      |    x -> len(x) > 0) AS words
      | FROM src),
      |sh AS (SELECT DISTINCT doc_id,
      |  words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS sgl
      | FROM w, unnest(range(1, len(words) - 1)) t(i)
      | WHERE len(words) >= 3),
      |h AS (SELECT doc_id,
      |  ('0x' || substr(md5(sgl), 1, 8))::BIGINT AS h FROM sh)""".stripMargin
  /** DuckDB minhash signature minima + raw band keys (the Md5-mode
    * twin of Dedup.minhashSignatures + lshBandKeys).
    */
  private def minhashBandCtes(numHashes: Int, bands: Int): String = {
    val rows = numHashes / bands
    // constants shared with the Spark side via Dedup.mixConsts — the
    // two engines compute the same (a·h + b) mod P minima by
    // construction
    val mins = Dedup.mixConsts(numHashes).zipWithIndex.map {
      case ((a, b), i) => s"min((h * $a + $b) % ${Dedup.MixP}) AS m$i"
    }.mkString(",\n  ")
    val bandSel = (0 until bands).map { b =>
      val key = (b * rows until (b + 1) * rows).map(i => s"m$i::VARCHAR")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $key AS bk FROM m"
    }.mkString("\n UNION ALL ")
    s"""m AS (SELECT doc_id,
       |  $mins
       | FROM h GROUP BY doc_id),
       |b AS ($bandSel)""".stripMargin
  }
  private val q25Sql =
    s"""WITH src AS (
       | SELECT doc_id, text FROM documents
       | UNION ALL
       | SELECT doc_id + 10000000 AS doc_id, text FROM documents
       | WHERE doc_id < 50),
       |$shingleHashCtes,
       |${minhashBandCtes(32, 8)}
       |SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
       |FROM b a JOIN b b2
       | ON a.band = b2.band AND a.bk = b2.bk AND a.doc_id < b2.doc_id
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q26
  // SimHash near-dup candidates, oracle mode: 32-bit md5-hash
  // signature (4 bands × 8 bits keeps the hamming ≤ 3 guarantee);
  // DuckDB recomputes the majority-vote bits and hamming distances
  // exactly. Production path stays 64-bit xxhash64.
  private def q26(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select($"doc_id", $"text")
    val dup = docs.filter($"doc_id" < 50)
      .select(($"doc_id" + 10000000L).as("doc_id"), $"text")
    Dedup.simhashCandidates(docs.unionByName(dup), "text", "doc_id",
        hash = Dedup.Md5)
      .orderBy($"id_a", $"id_b")
  }
  private val q26Sql = {
    val bitSums = (0 until 32).map(j => s"sum((h >> $j) & 1) AS b$j")
      .mkString(",\n  ")
    val sigExpr = (0 until 32).map(j =>
      s"(CASE WHEN b$j * 2 > n THEN (1::BIGINT << $j) ELSE 0 END)")
      .mkString(" |\n   ")
    s"""WITH src AS (
       | SELECT doc_id, text FROM documents
       | UNION ALL
       | SELECT doc_id + 10000000 AS doc_id, text FROM documents
       | WHERE doc_id < 50),
       |$shingleHashCtes,
       |s AS (SELECT doc_id, count(*) AS n,
       |  $bitSums
       | FROM h GROUP BY doc_id),
       |g AS (SELECT doc_id,
       |  $sigExpr AS sig
       | FROM s),
       |bd AS (SELECT doc_id, band, (sig >> (band * 8)) & 255 AS bits
       | FROM g, unnest(range(0, 4)) t(band)),
       |p AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
       | FROM bd a JOIN bd b2
       | ON a.band = b2.band AND a.bits = b2.bits AND a.doc_id < b2.doc_id)
       |SELECT p.id_a, p.id_b,
       | bit_count(xor(ga.sig, gb.sig))::BIGINT AS dist
       |FROM p
       |JOIN g ga ON p.id_a = ga.doc_id
       |JOIN g gb ON p.id_b = gb.doc_id
       |WHERE bit_count(xor(ga.sig, gb.sig)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------------------- q27
  // G3: recursive text chunker, BYTE-IDENTICAL oracle: the separator
  // recursion is depth-bounded (6 separator levels + hard cut), so the
  // oracle unrolls it as 7 nested list transforms; only the greedy
  // packer (sequential carry fold) needs a recursive CTE, advancing
  // one segment per doc per iteration. Exact parity holds because the
  // corpus is BMP-only ASCII (Scala UTF-16 .length ≡ DuckDB len) —
  // spec invariants in ChunkerSpec still cover the general case.
  private def q27(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Chunker.chunkDF(t(s, dir, "documents"), "doc_id", "text",
        size = 100, overlap = 20)
      .select($"doc_id", $"chunk_idx".cast("long").as("chunk_idx"),
        $"chunk")
      .orderBy($"doc_id", $"chunk_idx")
  }
  private val q27Sql = {
    val size = 100; val overlap = 20; val minLen = 10
    // separator priority order — mirrors Chunker.DefaultSeps
    val seps = Seq("'. '", "'! '", "'? '", "E'\\n\\n'", "E'\\n'", "' '")
    // Scala String.trim strips every char ≤ U+0020 from both ends
    val trimset = "E'" + (1 to 32).map(c => f"\\x$c%02X").mkString + "'"
    // split keeping the separator attached to the left piece, dropping
    // a trailing empty piece — Chunker.segment
    def attach(p: String, sep: String): String = {
      val parts = s"string_split($p, $sep)"
      s"(list_transform($parts[1:len($parts)-1], z -> z || $sep) || " +
        s"(CASE WHEN $parts[-1] = '' THEN []::VARCHAR[] " +
        s"ELSE [$parts[-1]] END))"
    }
    // level k: pieces > size split by the first separator from seps(k:)
    // they contain (single-piece splits pass through — Chunker.explode)
    def level(inner: String, k: Int): String = {
      val branches = seps.drop(k).map { s =>
        val att = attach("p", s)
        s"WHEN contains(p, $s) THEN " +
          s"(CASE WHEN len($att) <= 1 THEN [p] ELSE $att END)"
      }.mkString(" ")
      s"flatten(list_transform($inner, p -> " +
        s"CASE WHEN len(p) <= $size THEN [p] " +
        s"ELSE (CASE $branches ELSE [p] END) END))"
    }
    // final level: hard character cut (Chunker's grouped(size))
    def hardcut(inner: String): String = {
      val cut = s"list_transform(range(0, (len(p) + ${size - 1}) " +
        s"// $size), j -> substr(p, (j * $size)::INT + 1, $size))"
      s"flatten(list_transform($inner, p -> " +
        s"CASE WHEN len(p) <= $size THEN [p] ELSE $cut END))"
    }
    val segExpr = hardcut(
      seps.indices.foldLeft("[text]")((e, k) => level(e, k)))
    s"""WITH RECURSIVE
       |segs AS (
       | SELECT doc_id, $segExpr AS segs
       | FROM documents WHERE text IS NOT NULL AND text <> ''),
       |fold AS (
       | SELECT doc_id, 1 AS i, '' AS cur, []::VARCHAR[] AS out, segs
       | FROM segs
       | UNION ALL
       | SELECT doc_id, i + 1,
       |  CASE WHEN cur <> '' AND len(cur) + len(segs[i]) > $size
       |   THEN (CASE WHEN least($overlap, $size - len(segs[i])) > 0
       |     THEN right(cur, least($overlap, $size - len(segs[i])))
       |     ELSE '' END) || segs[i]
       |   ELSE cur || segs[i] END,
       |  CASE WHEN cur <> '' AND len(cur) + len(segs[i]) > $size
       |   THEN list_append(out, cur) ELSE out END,
       |  segs
       | FROM fold WHERE i <= len(segs)),
       |done AS (
       | SELECT doc_id,
       |  CASE WHEN cur <> '' THEN list_append(out, cur) ELSE out END
       |    AS chunks
       | FROM fold WHERE i = len(segs) + 1),
       |kept AS (
       | SELECT doc_id,
       |  list_filter(list_transform(chunks, c -> trim(c, $trimset)),
       |   c -> len(c) > $minLen) AS chunks
       | FROM done)
       |SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS chunk_idx, u.x AS chunk
       |FROM kept,
       | unnest(list_transform(chunks, (x, i) -> {'i': i, 'x': x})) t(u)
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  // ---------------------------------------------------------------- q28
  // M3 stand-in: hash-embedding + per-language mean pool, oracle mode
  // (Dedup.Md5): DuckDB replays the md5-derived bucket/sign hashing,
  // the per-doc L2 normalization, and the key×dim densified mean.
  // Scalar (lang, idx, mean_val) rows — an array-typed result column
  // would break the driver's pandas sort-by-value hashing. Production
  // path keeps xxhash64 (equivalence spec'd in VectorSimilaritySpec).
  private def q28(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.hashEmbedMeanByKey(t(s, dir, "documents"),
        "lang", "doc_id", "text", 16, hash = Dedup.Md5)
      .select($"key".as("lang"), $"idx".cast("long").as("idx"),
        (floor($"mean_val" * 100000.0 + 0.5) / 100000.0).as("mean_val"))
      .orderBy($"lang", $"idx")
  }
  private val q28Sql =
    """WITH tok AS (
      | SELECT doc_id AS id, lang AS key,
      |  unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |    x -> len(x) > 0)) AS tk
      | FROM documents),
      |h AS (SELECT id, key,
      |  ('0x' || substr(md5(tk), 1, 8))::BIGINT AS h FROM tok),
      |sp AS (SELECT id, key, h % 16 AS idx,
      |  CASE WHEN (h >> 16) % 2 = 0 THEN 1.0::DOUBLE
      |   ELSE -1.0::DOUBLE END AS s
      | FROM h),
      |sparse AS (SELECT id, key, idx, sum(s) AS v
      | FROM sp GROUP BY id, key, idx),
      |norms AS (SELECT id, sqrt(sum(v * v)) AS norm FROM sparse
      | GROUP BY id HAVING sqrt(sum(v * v)) > 0),
      |unit AS (SELECT sparse.id, sparse.key, sparse.idx, sparse.v, norm
      | FROM sparse JOIN norms USING (id)),
      |nd AS (SELECT key, count(DISTINCT id) AS n_docs
      | FROM unit GROUP BY key),
      |sums AS (SELECT key, idx, sum(v / norm) AS sv
      | FROM unit GROUP BY key, idx),
      |grid AS (SELECT key, n_docs, unnest(range(0, 16)) AS idx FROM nd)
      |SELECT key AS lang, CAST(idx AS BIGINT) AS idx,
      | floor((COALESCE(sv, 0.0::DOUBLE) / n_docs) * 100000.0 + 0.5)
      |   / 100000.0 AS mean_val
      |FROM grid LEFT JOIN sums USING (key, idx)
      |ORDER BY lang, idx""".stripMargin

  // ---------------------------------------------------------------- q29
  // LSH-bucketed approximate ANN, now oracle-checked: the seeded
  // hyperplane constants ride into BOTH plans as literals (Spark via
  // lshBucket's array literals, DuckDB via generated left-assoc dot
  // chains that reproduce the sequential-fold summation order
  // bit-for-bit), so bucket sign bits, multiprobe neighbors, and the
  // ranked cosines all match exactly. Recall stays spec'd in tests.
  private def q29(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    Similarity.lshTopK(emb.filter($"vec_id" < 10), emb,
        "vec_id", "embedding", 5, dim = 64, bits = 8)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  private val q29Sql = {
    val planes = Similarity.hyperplanes(64, 8, 42L)
    // explicit a[1]·p1 + a[2]·p2 + … chain: SQL + is left-associative,
    // matching the native DotProduct's sequential double fold exactly —
    // sign bits near zero cannot flip between engines
    def dotChain(vec: String, p: Array[Double]): String =
      p.zipWithIndex.map { case (c, i) =>
        s"$vec[${i + 1}]::DOUBLE * (${java.lang.Double.toString(c)})"
      }.mkString(" + ")
    def bucket(vec: String): String =
      "(" + planes.zipWithIndex.map { case (p, j) =>
        s"(CASE WHEN ${dotChain(vec, p)} >= 0 THEN ${1 << j} ELSE 0 END)"
      }.mkString(" | ") + ")"
    val toD = (v: String) => s"list_transform($v, x -> CAST(x AS DOUBLE))"
    s"""WITH c AS (
       | SELECT vec_id AS c_id, embedding AS c_vec,
       |  ${bucket("embedding")} AS bucket
       | FROM embeddings),
       |qb AS (
       | SELECT vec_id AS q_id, embedding AS q_vec,
       |  ${bucket("embedding")} AS b0
       | FROM embeddings WHERE vec_id < 10),
       |q AS (
       | SELECT q_id, q_vec,
       |  unnest([b0] || [xor(b0, 1 << j) for j in range(0, 8)]) AS bucket
       | FROM qb),
       |sc AS (
       | SELECT q_id, c_id,
       |  list_dot_product(${toD("q_vec")}, ${toD("c_vec")})
       |   / (sqrt(list_dot_product(${toD("q_vec")}, ${toD("q_vec")}))
       |    * sqrt(list_dot_product(${toD("c_vec")}, ${toD("c_vec")})))
       |   AS sim
       | FROM q JOIN c USING (bucket) WHERE q_id <> c_id),
       |r AS (SELECT q_id, c_id, sim,
       | row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id)
       |   AS rank
       | FROM sc)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id,
       | round(sim, 6) AS sim
       |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q30
  // As-of join: latest click at-or-before each purchase, per user
  private def q30(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = t(s, dir, "events")
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = events.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    Events.asofJoin(purchases, clicks, "user_id", "ts", "event_id")
      .select($"event_id", $"user_id", $"asof_ts", $"asof_id")
      .orderBy($"event_id")
  }
  private val q30Sql =
    """SELECT p.event_id, p.user_id, c.ts AS asof_ts, c.event_id AS asof_id
      |FROM (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
      |      WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
      |      WHERE event_type = 'click') c
      | ON p.user_id = c.user_id AND c.ts <= p.ts
      |ORDER BY p.event_id""".stripMargin

  // ---------------------------------------------------------------- q31
  // F3: double HTML unescape fixtures
  val unescapeFixtures: Seq[String] = Seq(
    "Tom &amp;amp; Jerry", "a &amp;lt;b&amp;gt; c", "x &amp; y",
    "&quot;quoted&quot;", "&#39;s", "5&nbsp;6", "plain text",
    "&amp;quot;deep&amp;quot;")
  private def q31(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    unescapeFixtures.toDF("raw")
      .select($"raw", Text.htmlUnescapeTwice($"raw").as("unescaped"))
      .orderBy($"raw")
  }
  private def q31Sql: String = {
    val values = unescapeFixtures.map(v => s"('$v')").mkString(", ")
    def onePass(expr: String): String =
      Text.htmlEntities.foldLeft(expr) { case (e, (ent, ch)) =>
        val repl = if (ch == "'") "''" else ch
        s"replace($e, '$ent', '$repl')"
      }
    val twoPass = onePass(onePass("raw"))
    s"""SELECT raw, $twoPass AS unescaped
       |FROM (VALUES $values) t(raw) ORDER BY raw""".stripMargin
  }

  // ---------------------------------------------------------------- q32
  // F5: clean_text Vietnamese golden path (oracle: RE2 \p{L}\p{N} class
  // mirrors Java's (?U)\w for NFC Vietnamese; order-preserving dedup via
  // positional list_filter since DuckDB's list_distinct reorders)
  val cleanFixtures: Seq[String] = Seq(
    "Đây là câu. Đây là câu. Ảnh: Hoài Thanh",
    "Một câu!! Hai câu?? Một câu.",
    "  nhiều   khoảng   trắng  . chấm..câu  ",
    "no-op sentence. another one.")
  private def q32(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cleanFixtures.toDF("raw")
      .select($"raw", Text.cleanText($"raw").as("cleaned"))
      .orderBy($"raw")
  }
  private def q32Sql: String = {
    val values = cleanFixtures.map(v => s"('$v')").mkString(", ")
    s"""WITH c1 AS (SELECT raw,
       |  regexp_replace(raw, 'Ảnh:\\s*[^.!?]*[.!?]?', '', 'g') AS x
       |  FROM (VALUES $values) t(raw)),
       |c2 AS (SELECT raw,
       |  regexp_replace(x, '[^\\p{L}\\p{N}_\\s.!?]', '', 'g') AS x FROM c1),
       |c3 AS (SELECT raw, regexp_replace(regexp_replace(x, '\\s+', ' ', 'g'),
       |  '\\.{2,}', '.', 'g') AS x FROM c2),
       |c4 AS (SELECT raw, list_filter(list_transform(
       |  string_split_regex(x, '\\.\\s*'), y -> trim(y)),
       |  y -> len(y) > 0) AS l FROM c3),
       |c5 AS (SELECT raw,
       |  list_filter(l, (y, i) -> list_position(l, y) = i) AS d FROM c4)
       |SELECT raw, CASE WHEN len(d) > 0
       |  THEN array_to_string(d, '. ') || '. ' ELSE '' END AS cleaned
       |FROM c5 ORDER BY raw""".stripMargin
  }

  // ---------------------------------------------------------------- q33
  // F4: lenient date parsing fixtures
  val dateFixtures: Seq[String] = Seq(
    "Mon, 05 Aug 2024 10:30:00 +0700",
    "Tue, 06 Aug 2024 08:00:00 -0500",
    "2024-08-05T03:30:00Z",
    "2024-08-05T03:30:00+02:00",
    "2024-08-05 03:30:00",
    "2024-08-05",
    "not a date")
  private def q33(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    dateFixtures.toDF("raw")
      .select($"raw", Text.parseDateLenient($"raw").as("parsed"))
      .orderBy($"raw")
  }
  private def q33Sql: String = {
    val values = dateFixtures.map(v => s"('$v')").mkString(", ")
    s"""SELECT raw, coalesce(
       |  try_strptime(raw, '%a, %d %b %Y %H:%M:%S %z')::TIMESTAMP,
       |  try_strptime(raw, '%Y-%m-%dT%H:%M:%SZ')::TIMESTAMP,
       |  try_strptime(raw, '%Y-%m-%dT%H:%M:%S%z')::TIMESTAMP,
       |  try_strptime(raw, '%Y-%m-%d %H:%M:%S')::TIMESTAMP,
       |  try_strptime(raw, '%Y-%m-%d')::TIMESTAMP) AS parsed
       |FROM (VALUES $values) t(raw) ORDER BY raw""".stripMargin
  }

  // ---------------------------------------------------------------- q34
  // F9: md5 → UUID deterministic point ids
  private def q34(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select($"doc_id",
      Text.md5Uuid(concat(lit("doc://"), $"doc_id")).as("point_id"))
      .orderBy($"doc_id")
  }
  private val q34Sql =
    """SELECT doc_id,
      | substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' || substr(h, 13, 4)
      |  || '-' || substr(h, 17, 4) || '-' || substr(h, 21, 12) AS point_id
      |FROM (SELECT doc_id, md5('doc://' || doc_id) AS h FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q35
  // S1/G1/G2/J2/F1/F2: ingest entry point — nested JSON config scan,
  // double map explode, anti-join vs already-seen urls, entry explode
  // with per-feed cap, slug/alias enrichment (rss_feeds.py:9-15 +
  // raw_articles.py:44-95)
  private val feedConfigPath = "/root/repo/fixtures/rss_feeds.json"
  private val seenFeedUrls = Seq(
    "https://feeds.example.com/vnexpress/thoi-su.rss",
    "https://feeds.example.com/dantri/suc-khoe.rss")
  private def q35(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feeds = Ingest.feedConfig(s, feedConfigPath)
    val fresh = feeds.join(seenFeedUrls.toDF("url"), Seq("url"), "left_anti")
    Ingest.explodeEntries(fresh, perFeed = 3, cap = 2)
      .select($"source", $"topic", Text.slugify($"topic").as("slug"),
        Text.aliasFromTopic($"topic").as("alias"), $"link")
      .orderBy($"source", $"topic", $"link")
  }
  private def q35Sql: String = {
    val seen = seenFeedUrls.map(u => s"'$u'").mkString(", ")
    s"""WITH raw AS (SELECT CAST(json AS MAP(VARCHAR, MAP(VARCHAR, VARCHAR))) AS m
       |  FROM read_json_objects('$feedConfigPath', format='unstructured')),
       |lvl1 AS (SELECT unnest(map_entries(m)) AS e FROM raw),
       |lvl2 AS (SELECT e.key AS source, unnest(map_entries(e.value)) AS t FROM lvl1),
       |feeds AS (SELECT source, t.key AS topic, t.value AS url FROM lvl2),
       |fresh AS (SELECT * FROM feeds WHERE url NOT IN ($seen)),
       |entries AS (SELECT source, topic, url, unnest([1, 2]) AS entry_no FROM fresh)
       |SELECT source, topic,
       | replace(translate(lower(topic), '${Text.diacriticFrom}', '${Text.diacriticTo}'), ' ', '') AS slug,
       | lower(array_to_string(list_transform(string_split(topic, ' '),
       |   w -> substr(w, 1, 1)), '')) AS alias,
       | url || '?item=' || entry_no AS link
       |FROM entries ORDER BY source, topic, link""".stripMargin
  }

  // ---------------------------------------------------------------- q36
  // M1/F6/F7: summarize lifecycle — extractive bullet summary, cleaned
  // and split back to bullets; oracle derives the expected bullets
  // independently from the raw words
  private def q36(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val raw = ColumnPlugins("summarize")($"text")
    val bullets = Text.summaryBullets(Text.cleanSummary(raw))
    t(s, dir, "documents")
      .select($"doc_id", size(bullets).cast("long").as("n_bullets"),
        array_join(bullets, " | ").as("bullets"))
      .orderBy($"doc_id")
  }
  private val q36Sql =
    """WITH d AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w
      | FROM documents),
      |b AS (SELECT doc_id, list_filter([
      |  array_to_string(w[1:2], ' '), array_to_string(w[3:4], ' '),
      |  array_to_string(w[5:6], ' '), array_to_string(w[7:8], ' ')],
      |  x -> len(x) > 0) AS bl FROM d)
      |SELECT doc_id, CAST(len(bl) AS BIGINT) AS n_bullets,
      | array_to_string(bl, ' | ') AS bullets
      |FROM b ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q37
  // G5+A5: statement extraction explode + rule-based status + scorecard
  private def q37(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stmts = t(s, dir, "documents")
      .select($"doc_id",
        explode(Summarize.statements($"text", width = 6)).as("statement"))
      .withColumn("status", Summarize.statementStatus($"statement"))
    Summarize.scorecard(stmts, "doc_id", "status")
      .orderBy($"doc_id")
  }
  private val q37Sql =
    """WITH d AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w
      | FROM documents),
      |ix AS (SELECT doc_id, w,
      | unnest(range(0, CAST(ceil(len(w) / 6.0) AS INT))) AS i FROM d),
      |st AS (SELECT doc_id,
      | array_to_string(w[(i*6+1):(i*6+6)], ' ') AS statement FROM ix),
      |cl AS (SELECT doc_id,
      | CASE WHEN statement LIKE '%window%' OR statement LIKE '%stream%'
      |      THEN 'confirmed'
      |      WHEN statement LIKE '%dup%' THEN 'refuted'
      |      ELSE 'unverified' END AS status FROM st),
      |agg AS (SELECT doc_id,
      | CAST(sum(CASE WHEN status = 'confirmed' THEN 1 ELSE 0 END) AS BIGINT) AS confirmed,
      | CAST(sum(CASE WHEN status = 'refuted' THEN 1 ELSE 0 END) AS BIGINT) AS refuted,
      | count(*) AS total FROM cl GROUP BY 1)
      |SELECT doc_id, confirmed, refuted, total,
      | CASE WHEN total = 0 THEN 0.0
      |      WHEN total < 5 THEN 1.0
      |      ELSE round(greatest(3.0, least(10.0,
      |        (CAST(confirmed AS DOUBLE) / total
      |         - CAST(refuted AS DOUBLE) * 0.5 / total) * 10.0)), 4)
      | END AS score
      |FROM agg ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q38
  // J5+J6+U3: filtered top-k with same-topic priority and fallback fill
  private def q38(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    Similarity.topKWithFallback(emb.filter($"vec_id" < 10), emb,
        "vec_id", "embedding", "label", 5)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        $"same_topic".cast("long").as("same_topic"),
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  private val q38Sql =
    """WITH q AS (SELECT vec_id AS q_id, label AS q_label,
      |  embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS c_id, label AS c_label,
      |  embedding::DOUBLE[] AS cv FROM embeddings),
      |sc AS (
      | SELECT q_id, c_id,
      |  CASE WHEN q_label = c_label THEN 1 ELSE 0 END AS same_topic,
      |  list_dot_product(qv, cv)
      |    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
      |    AS sim
      | FROM q, c WHERE q_id <> c_id),
      |r AS (SELECT q_id, c_id, same_topic, sim,
      | row_number() OVER (PARTITION BY q_id
      |   ORDER BY same_topic DESC, sim DESC, c_id) AS rank
      | FROM sc)
      |SELECT q_id, rank, c_id, CAST(same_topic AS BIGINT) AS same_topic,
      | round(sim, 6) AS sim
      |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- q39
  // P11: NaN vs NULL tri-state handling (text_to_speech.py:40-43 — the
  // pandas-NaN-leaks-into-Mongo distinction, made explicit)
  private def q39(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "events").select($"event_id", $"user_id",
      when($"event_id" % 13 === 0, lit(Double.NaN))
        .when($"event_id" % 13 === 1, lit(null).cast("double"))
        .otherwise($"value").as("v"))
    e.groupBy($"user_id").agg(
        sum(when($"v".isNotNull && isnan($"v"), 1).otherwise(0))
          .cast("long").as("nan_cnt"),
        sum(when($"v".isNull, 1).otherwise(0)).cast("long").as("null_cnt"),
        sum(when($"v".isNotNull && !isnan($"v"), 1).otherwise(0))
          .cast("long").as("ok_cnt"),
        round(sum(when($"v".isNotNull && !isnan($"v"), $"v").otherwise(0.0)), 2)
          .as("ok_sum"))
      .orderBy($"user_id")
  }
  private val q39Sql =
    """WITH e AS (SELECT event_id, user_id,
      | CASE WHEN event_id % 13 = 0 THEN 'NaN'::DOUBLE
      |      WHEN event_id % 13 = 1 THEN NULL
      |      ELSE value END AS v FROM events)
      |SELECT user_id,
      | CAST(sum(CASE WHEN v IS NOT NULL AND isnan(v) THEN 1 ELSE 0 END) AS BIGINT) AS nan_cnt,
      | CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cnt,
      | CAST(sum(CASE WHEN v IS NOT NULL AND NOT isnan(v) THEN 1 ELSE 0 END) AS BIGINT) AS ok_cnt,
      | round(sum(CASE WHEN v IS NOT NULL AND NOT isnan(v) THEN v ELSE 0.0 END), 2) AS ok_sum
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q40
  // F12/K1: JSON serialization for the raw zone (s3_io_manager.py:37)
  private def q40(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders").filter($"o_orderkey" % 97 === 0)
      .select($"o_orderkey",
        to_json(struct($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_orderpriority")).as("js"))
      .orderBy($"o_orderkey")
  }
  private val q40Sql =
    """SELECT o_orderkey,
      | CAST(to_json(struct_pack(o_orderkey := o_orderkey,
      |   o_custkey := o_custkey, o_orderstatus := o_orderstatus,
      |   o_orderpriority := o_orderpriority)) AS VARCHAR) AS js
      |FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q41
  // K6: physical layout — each key clustered into exactly one partition
  // (the oracle asserts the n_parts=1 invariant relationally)
  private def q41(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Layout.byKey(t(s, dir, "documents"), "lang", 8, "doc_id")
      .withColumn("pid", spark_partition_id())
      .groupBy($"lang")
      .agg(countDistinct($"pid").as("n_parts"), count(lit(1)).as("cnt"))
      .orderBy($"lang")
  }
  private val q41Sql =
    """SELECT lang, CAST(1 AS BIGINT) AS n_parts, count(*) AS cnt
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q42
  // S3+S4: HTML main-text extraction + first image URL over fixtures
  val htmlFixtures: Seq[(Long, String)] = Seq(
    (0L, "<html><head><style>p{color:red}</style></head><body><nav>menu" +
      "</nav><p>First para.</p><script>var x=1;</script><p>Second para." +
      "</p><img src=\"https://img.example.com/a.jpg\"/><footer>foot" +
      "</footer></body></html>"),
    (1L, "<div><p>Hello <b>world</b>.</p><iframe src=\"https://e.example" +
      ".com\">junk</iframe><img src=\"https://img.example.com/b.png\"></div>"),
    (2L, "<article>Text with no image, just <em>emphasis</em>.</article>"),
    (3L, "plain text with no tags at all"))
  private def q42(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    htmlFixtures.toDF("id", "html")
      .select($"id", Text.htmlMainText($"html").as("main_text"),
        Text.firstImgSrc($"html").as("img"))
      .orderBy($"id")
  }
  private def q42Sql: String = {
    val values = htmlFixtures
      .map { case (i, h) => s"($i, '$h')" }.mkString(", ")
    val stripChrome = Text.chromeTags.foldLeft("html")((e, tag) =>
      s"regexp_replace($e, '(?is)<$tag[^>]*>.*?</$tag>', ' ', 'g')")
    s"""SELECT id,
       | trim(regexp_replace(regexp_replace($stripChrome,
       |   '<[^>]+>', ' ', 'g'), '\\s+', ' ', 'g')) AS main_text,
       | regexp_extract(html, '<img[^>]*src="([^"]+)"', 1) AS img
       |FROM (VALUES $values) t(id, html) ORDER BY id""".stripMargin
  }

  // ---------------------------------------------------------------- q43
  // A1+U1: union of work lists, dedup'd and sorted
  private def q43(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "events")
    e.filter($"event_type" === "error").select($"user_id")
      .union(e.filter($"event_type" === "purchase").select($"user_id"))
      .distinct()
      .orderBy($"user_id")
  }
  private val q43Sql =
    """SELECT DISTINCT user_id FROM events
      |WHERE event_type IN ('error', 'purchase')
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q44
  // ST2/P7/K4: the lifecycle minimum slice — stage filter selects
  // unsummarized rows, a batch subset is patched via column-patch
  // upsert, and the re-filter shrinks to exactly the unpatched subset
  private def q44(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val articles = t(s, dir, "documents")
      .select($"doc_id", $"text", lit(null).cast("string").as("summary"))
    val todo = articles.filter($"summary".isNull)
      .filter($"doc_id" % 3 =!= 0)
    val patch = todo.select($"doc_id",
      array_join(Text.summaryBullets(Text.cleanSummary(
        ColumnPlugins("summarize")($"text"))), " | ").as("summary"))
    val after = Upsert.merge(articles, patch, Seq("doc_id"), patch = true)
    after.agg(
      count(lit(1)).as("total"),
      sum(when($"summary".isNotNull, 1).otherwise(0)).cast("long")
        .as("summarized"),
      sum(when($"summary".isNull, 1).otherwise(0)).cast("long")
        .as("remaining"))
  }
  private val q44Sql =
    """SELECT count(*) AS total,
      | CAST(sum(CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS summarized,
      | CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS remaining
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- q45
  // Multimodal metadata plan: frame sampling + aspect-preserving resize
  // targets over media rows synthesized from documents — the
  // metadata-only half of the media pipeline stays fully relational
  // (the binary decode half is partition-wise, spec-tested)
  private def q45(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = t(s, dir, "documents").select($"doc_id".as("media_id"),
      (lit(320) + ($"doc_id" % 16) * 40).cast("int").as("width"),
      (lit(240) + ($"doc_id" % 9) * 40).cast("int").as("height"),
      (lit(1000) + ($"doc_id" % 120) * 500).as("duration_ms"))
    val frames = graft.multimodal.Multimodal.frameSample(
      media, "media_id", "duration_ms", everyMs = 2000L, maxFrames = 5)
    val (outW, outH) = graft.multimodal.Multimodal.resizeSpec(
      $"width", $"height", maxEdge = 224)
    frames.select($"media_id", $"frame_no", $"frame_ts_ms",
        outW.as("out_w"), outH.as("out_h"))
      .orderBy($"media_id", $"frame_no")
  }
  private val q45Sql =
    """WITH m AS (SELECT doc_id AS media_id,
      | CAST(320 + (doc_id % 16) * 40 AS INT) AS width,
      | CAST(240 + (doc_id % 9) * 40 AS INT) AS height,
      | 1000 + (doc_id % 120) * 500 AS duration_ms FROM documents),
      |f AS (SELECT media_id, width, height,
      | unnest(range(0, CAST(least(duration_ms // 2000, 4) AS INT) + 1))
      |   AS frame_no FROM m)
      |SELECT media_id, frame_no, frame_no * 2000 AS frame_ts_ms,
      | CAST(floor(width * least(1.0, 224.0 / greatest(width, height))) AS INT) AS out_w,
      | CAST(floor(height * least(1.0, 224.0 / greatest(width, height))) AS INT) AS out_h
      |FROM f ORDER BY media_id, frame_no""".stripMargin

  // ---------------------------------------------------------------- q46
  // Multimodal blob decode: synthesize binary media (12-byte header +
  // payload) from document ids, run the partition-wise decode stub, and
  // verify the recovered metadata relationally — the oracle recomputes
  // the expected header fields straight from doc_id
  private def q46(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = graft.multimodal.Multimodal
    val blobs = t(s, dir, "documents").filter($"doc_id" < 200)
      .select($"doc_id").as[Long]
      .map(id => m.syntheticBlob(id,
        if (id % 3 == 0) "image" else "video",
        320 + (id % 16).toInt * 40, 240 + (id % 9).toInt * 40,
        (id % 50).toInt + 10))
    m.decodeStub(blobs).toDF()
      .select($"media_id", $"media_type", $"width", $"height",
        $"payload_bytes", $"decode_ok")
      .orderBy($"media_id")
  }
  private val q46Sql =
    """SELECT doc_id AS media_id,
      | CASE WHEN doc_id % 3 = 0 THEN 'image' ELSE 'video' END AS media_type,
      | CAST(320 + (doc_id % 16) * 40 AS INT) AS width,
      | CAST(240 + (doc_id % 9) * 40 AS INT) AS height,
      | doc_id % 50 + 10 AS payload_bytes,
      | true AS decode_ok
      |FROM documents WHERE doc_id < 200 ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q47
  // Embedding-cosine near-dup pairs, exact mode (bits=0) on a bounded
  // subset so DuckDB can verify; the LSH-bucketed mode is the scale
  // path (recall-tested in VectorSimilaritySpec)
  private def q47(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "embeddings").filter($"vec_id" < 200)
      .select($"vec_id", $"embedding")
    // inject exact copies (id+1000) so near-dup pairs exist at any sf
    val emb = base.unionByName(base.filter($"vec_id" < 50)
      .select(($"vec_id" + 10000000L).as("vec_id"), $"embedding"))
    Similarity.nearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.8, dim = 64, bits = 0)
      .select($"id_a", $"id_b", round($"sim", 6).as("sim"))
      .orderBy($"id_a", $"id_b")
  }
  private val q47Sql =
    """WITH e AS (
      | SELECT vec_id, embedding::DOUBLE[] AS v
      |  FROM embeddings WHERE vec_id < 200
      | UNION ALL
      | SELECT vec_id + 10000000, embedding::DOUBLE[]
      |  FROM embeddings WHERE vec_id < 50),
      |p AS (
      | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  list_dot_product(a.v, b.v)
      |   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      |   AS sim
      | FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |SELECT id_a, id_b, round(sim, 6) AS sim
      |FROM p WHERE sim > 0.8 ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q48
  // IVF ANN, oracle mode: exhaustive probing (nprobe = nlist) makes the
  // search provably ≡ brute force — every corpus vector sits in exactly
  // ONE cell, probing all cells reconstructs the full candidate set
  // exactly once, and the exact re-rank + (sim DESC, c_id) tie-break
  // match bruteTopKSql bit-for-bit. That puts the k-means path's
  // machinery (assignment completeness, candidate-join exactness,
  // ranking) under the cross-engine oracle; the production recall mode
  // (nprobe < nlist) is spec-pinned in VectorSimilaritySpec. The
  // quantizer is fit ONCE per (dir, nlist) and cached — the
  // index-build/search split every real ANN engine has; the query
  // measures search.
  private val ivfModels =
    scala.collection.concurrent.TrieMap.empty[(String, Int), Similarity.IvfModel]
  private def q48(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val model = ivfModels.getOrElseUpdate((dir, 16),
      Similarity.fitIvf(emb, "embedding", nlist = 16))
    Similarity.ivfTopK(model,
        emb.filter($"vec_id" >= 10 && $"vec_id" < 20), emb,
        "vec_id", "embedding", k = 5, nprobe = 16)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  private val q48Sql = bruteTopKSql("vec_id >= 10 AND vec_id < 20", 5)

  // ---------------------------------------------------------------- q49
  // Semi-structured JSON column: field extraction + aggregation over
  // the events props payload (the raw-zone JSON read path, K1 inverse)
  private def q49(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"), sum($"k").as("sum_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }
  private val q49Sql =
    """SELECT event_type, count(*) AS cnt,
      | CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      | CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q50
  // S2 offline: RSS/XML feed parse — item explode, title double-
  // unescape (F3), lenient pubDate parse (F4), first-image extraction
  // (S4) — the real ingest parse chain over a stored feed document
  private val feedXmlPath = "/root/repo/fixtures/feed_sample.xml"
  private def q50(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val raw = s.read.option("wholetext", "true").text(feedXmlPath)
    raw.select(explode(split($"value", "<item>")).as("x"))
      .filter($"x".contains("</item>"))
      .select(
        regexp_extract($"x", "<link>([^<]*)</link>", 1).as("link"),
        Text.htmlUnescapeTwice(
          regexp_extract($"x", "(?s)<title>(.*?)</title>", 1)).as("title"),
        Text.parseDateLenient(
          regexp_extract($"x", "<pubDate>([^<]*)</pubDate>", 1))
          .as("published"),
        Text.firstImgSrc(
          regexp_extract($"x", "(?s)<description>(.*?)</description>", 1))
          .as("image"))
      .orderBy($"link")
  }
  private def q50Sql: String = {
    def onePass(expr: String): String =
      Text.htmlEntities.foldLeft(expr) { case (e, (ent, ch)) =>
        val repl = if (ch == "'") "''" else ch
        s"replace($e, '$ent', '$repl')"
      }
    val title = onePass(onePass(
      "regexp_extract(x, '(?s)<title>(.*?)</title>', 1)"))
    s"""WITH items AS (
       | SELECT unnest(string_split(content, '<item>')) AS x
       | FROM read_text('$feedXmlPath'))
       |SELECT regexp_extract(x, '<link>([^<]*)</link>', 1) AS link,
       | $title AS title,
       | coalesce(
       |  try_strptime(regexp_extract(x, '<pubDate>([^<]*)</pubDate>', 1),
       |    '%a, %d %b %Y %H:%M:%S %z')::TIMESTAMP,
       |  try_strptime(regexp_extract(x, '<pubDate>([^<]*)</pubDate>', 1),
       |    '%Y-%m-%dT%H:%M:%SZ')::TIMESTAMP) AS published,
       | regexp_extract(
       |   regexp_extract(x, '(?s)<description>(.*?)</description>', 1),
       |   '<img[^>]*src="([^"]+)"', 1) AS image
       |FROM items WHERE x LIKE '%</item>%' ORDER BY link""".stripMargin
  }

  // ---------------------------------------------------------------- q51
  // Distinct-count + exact percentiles per group (the analytics ops a
  // 100 TB engine user reaches for daily; floor-rounding guards the
  // interpolation ulps between engines)
  private def q51(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events").groupBy($"event_type").agg(
        countDistinct($"user_id").as("users"),
        (floor(median($"value") * 10000.0 + 0.5) / 10000.0).as("med_value"),
        (floor(percentile($"value", lit(0.9)) * 10000.0 + 0.5) / 10000.0)
          .as("p90_value"))
      .orderBy($"event_type")
  }
  private val q51Sql =
    """SELECT event_type,
      | count(DISTINCT user_id) AS users,
      | floor(median(value) * 10000.0 + 0.5) / 10000.0 AS med_value,
      | floor(quantile_cont(value, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q52
  // Rollup with grouping id — hierarchical subtotals in one pass
  private def q52(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .rollup($"n_name", $"c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        (floor(sum($"c_acctbal") * 100.0 + 0.5) / 100.0).as("bal"),
        grouping_id().cast("long").as("gid"))
      .orderBy($"gid", $"n_name", $"c_mktsegment")
  }
  private val q52Sql =
    """SELECT n_name, c_mktsegment, count(*) AS cnt,
      | floor(sum(c_acctbal) * 100.0 + 0.5) / 100.0 AS bal,
      | CAST(GROUPING(n_name, c_mktsegment) AS BIGINT) AS gid
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP(n_name, c_mktsegment)
      |ORDER BY gid, n_name, c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q53
  // Timezone conversion (SURVEY §7.4: UTC storage, Asia/Ho_Chi_Minh at
  // the edge) — local-hour histogram; the oracle nests timezone()
  // twice so it never depends on the session timezone
  private def q53(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select(hour(from_utc_timestamp($"ts", "Asia/Ho_Chi_Minh"))
        .cast("long").as("local_hour"))
      .groupBy($"local_hour")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"local_hour")
  }
  private val q53Sql =
    """SELECT CAST(hour(timezone('Asia/Ho_Chi_Minh',
      |   timezone('UTC', ts::TIMESTAMP))) AS BIGINT) AS local_hour,
      | count(*) AS cnt
      |FROM events GROUP BY 1 ORDER BY local_hour""".stripMargin

  // ---------------------------------------------------------------- q54
  // Running (cumulative) sum window frame per key — same insertion
  // order both engines, so the float sequence is identical
  private def q54(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    t(s, dir, "events").filter($"user_id" < 20)
      .select($"user_id", $"event_id",
        (floor(sum($"value").over(w) * 100.0 + 0.5) / 100.0).as("run_sum"))
      .orderBy($"user_id", $"event_id")
  }
  private val q54Sql =
    """SELECT user_id, event_id,
      | floor(sum(value) OVER (PARTITION BY user_id
      |   ORDER BY ts::TIMESTAMP, event_id
      |   ROWS UNBOUNDED PRECEDING) * 100.0 + 0.5) / 100.0 AS run_sum
      |FROM events WHERE user_id < 20
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q55
  // Corpus vocabulary stats: top-3 terms per language by frequency
  // (explode → count → ranked window; the TF half of TF-IDF curation)
  private def q55(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val terms = t(s, dir, "documents")
      .select($"lang", explode(split($"text", "\\s+")).as("term"))
      .filter(length($"term") > 0)
    val counts = terms.groupBy($"lang", $"term")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"lang").orderBy($"cnt".desc, $"term".asc)
    counts.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"lang", $"rk", $"term", $"cnt")
      .orderBy($"lang", $"rk")
  }
  private val q55Sql =
    """WITH tf AS (
      | SELECT lang, unnest(regexp_extract_all(text, '\S+')) AS term
      | FROM documents),
      |c AS (SELECT lang, term, count(*) AS cnt FROM tf GROUP BY 1, 2),
      |r AS (SELECT lang, term, cnt,
      | row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS rk
      | FROM c)
      |SELECT lang, rk, term, cnt FROM r WHERE rk <= 3
      |ORDER BY lang, rk""".stripMargin

  // ---------------------------------------------------------------- q56
  // Pivot: event counts per user cohort, one column per event type
  // (explicit value list keeps the schema deterministic for the oracle)
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")
  private def q56(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(($"user_id" % 10).as("cohort"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .orderBy($"cohort")
  }
  private def q56Sql: String = {
    val cols = eventTypes.map(t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS \"$t\"")
      .mkString(",\n ")
    s"""SELECT user_id % 10 AS cohort,
       | $cols
       |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin
  }

  // ---------------------------------------------------------------- q57
  // Fuzzy matching: Levenshtein edit distance between topic slugs —
  // the string-similarity cousin of the n-gram dedup family. The
  // crossJoin is sound ONLY because the input is a 14-row fixture
  // list; the table-scale path is candidate pruning first — bucket by
  // length band (edit distance ≥ length gap, so |len(a)−len(b)| > k
  // pairs can never match; the q84 bandJoin shape) or by shared
  // n-gram (the q22 inverted-index shape) — then levenshtein on the
  // pruned pairs. Do not lift this as-is onto a real table.
  private def q57(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val slugs = slugFixtures.toDF("name")
      .select($"name", Text.slugify($"name").as("slug"))
    slugs.as("a").crossJoin(slugs.as("b"))
      .filter($"a.slug" < $"b.slug")
      .select($"a.slug".as("slug_a"), $"b.slug".as("slug_b"),
        levenshtein($"a.slug", $"b.slug").cast("long").as("dist"))
      .filter($"dist" <= 5)
      .orderBy($"slug_a", $"slug_b")
  }
  private def q57Sql: String = {
    val values = slugFixtures.map(n => s"('$n')").mkString(", ")
    s"""WITH s AS (SELECT replace(translate(lower(name),
       |  '${Text.diacriticFrom}', '${Text.diacriticTo}'), ' ', '') AS slug
       | FROM (VALUES $values) t(name))
       |SELECT a.slug AS slug_a, b.slug AS slug_b,
       | CAST(levenshtein(a.slug, b.slug) AS BIGINT) AS dist
       |FROM s a JOIN s b ON a.slug < b.slug
       |WHERE levenshtein(a.slug, b.slug) <= 5
       |ORDER BY slug_a, slug_b""".stripMargin
  }

  // ---------------------------------------------------------------- q58
  // Set operations: intersect (clicked AND purchased) and except
  // (clicked but NEVER purchased) user sets
  private def q58(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "events")
    val clickers = e.filter($"event_type" === "click").select($"user_id")
    val buyers = e.filter($"event_type" === "purchase").select($"user_id")
    val both = clickers.intersect(buyers)
      .withColumn("relation", lit("click_and_purchase"))
    val onlyClick = clickers.except(buyers)
      .withColumn("relation", lit("click_no_purchase"))
    both.unionByName(onlyClick).orderBy($"relation", $"user_id")
  }
  private val q58Sql =
    """WITH c AS (SELECT user_id FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id FROM events WHERE event_type = 'purchase')
      |SELECT user_id, 'click_and_purchase' AS relation
      |FROM (SELECT user_id FROM c INTERSECT SELECT user_id FROM p)
      |UNION ALL
      |SELECT user_id, 'click_no_purchase' AS relation
      |FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM p)
      |ORDER BY relation, user_id""".stripMargin

  // ---------------------------------------------------------------- q59
  // Ranking-window variants: quartile buckets (ntile) and percent_rank
  // per event type, tie-broken by event_id for determinism
  private def q59(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type")
      .orderBy($"value".asc, $"event_id".asc)
    t(s, dir, "events").filter($"user_id" < 10)
      .select($"event_type", $"event_id",
        ntile(4).over(w).cast("long").as("quartile"),
        (floor(percent_rank().over(w) * 10000.0 + 0.5) / 10000.0)
          .as("pct_rank"))
      .orderBy($"event_type", $"event_id")
  }
  private val q59Sql =
    """SELECT event_type, event_id,
      | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      | floor(percent_rank() OVER w * 10000.0 + 0.5) / 10000.0 AS pct_rank
      |FROM events WHERE user_id < 10
      |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      |ORDER BY event_type, event_id""".stripMargin

  // ---------------------------------------------------------------- q60
  // Unpivot (melt): wide per-type stats back to (metric, value) rows —
  // the reshape inverse of q56's pivot
  private def q60(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wide = t(s, dir, "events").groupBy($"event_type").agg(
      count(lit(1)).cast("double").as("cnt"),
      (floor(sum($"value") * 100.0 + 0.5) / 100.0).as("sum_value"),
      (floor(avg($"value") * 10000.0 + 0.5) / 10000.0).as("avg_value"))
    wide.unpivot(Array($"event_type"),
        Array($"cnt", $"sum_value", $"avg_value"), "metric", "value")
      .orderBy($"event_type", $"metric")
  }
  private val q60Sql =
    """WITH wide AS (
      | SELECT event_type, CAST(count(*) AS DOUBLE) AS cnt,
      |  floor(sum(value) * 100.0 + 0.5) / 100.0 AS sum_value,
      |  floor(avg(value) * 10000.0 + 0.5) / 10000.0 AS avg_value
      | FROM events GROUP BY event_type)
      |SELECT event_type, metric, value FROM (
      | SELECT event_type, 'cnt' AS metric, cnt AS value FROM wide
      | UNION ALL
      | SELECT event_type, 'sum_value', sum_value FROM wide
      | UNION ALL
      | SELECT event_type, 'avg_value', avg_value FROM wide)
      |ORDER BY event_type, metric""".stripMargin

  // ---------------------------------------------------------------- q61
  // Dedup cluster resolution: exact-Jaccard pairs (q22's corpus) →
  // connected components → (id, cluster = min id of component). The
  // oracle mirrors the transitive closure with a recursive CTE —
  // exponential on big graphs, exact on this bounded corpus; the Spark
  // side is the O(log n)-round label propagation that scales.
  private def q61(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "documents").filter($"doc_id" < 40)
      .select($"doc_id", $"text")
    val docs = base.unionByName(base.filter($"doc_id" < 20)
      .select(($"doc_id" + 10000000L).as("doc_id"), $"text"))
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", minJaccard = 0.03)
      .select($"id_a", $"id_b")
    Dedup.resolveClusters(pairs).orderBy($"id")
  }
  private val q61Sql =
    """WITH RECURSIVE u AS (
      | SELECT doc_id, text FROM documents WHERE doc_id < 40
      | UNION ALL
      | SELECT doc_id + 10000000, text FROM documents WHERE doc_id < 20),
      |d AS (
      | SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w
      | FROM u),
      |sh AS (
      | SELECT doc_id, unnest(list_distinct(list_transform(
      |   range(1, len(w) - 1),
      |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sgl
      | FROM d),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |inter AS (
      | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      | FROM sh a JOIN sh b ON a.sgl = b.sgl AND a.doc_id < b.doc_id
      | GROUP BY 1, 2),
      |pairs AS (
      | SELECT id_a, id_b FROM inter
      | JOIN cnt ca ON ca.doc_id = id_a
      | JOIN cnt cb ON cb.doc_id = id_b
      | WHERE i * 1.0 / (ca.n + cb.n - i) > 0.03),
      |edges AS (
      | SELECT id_a AS src, id_b AS dst FROM pairs
      | UNION ALL
      | SELECT id_b, id_a FROM pairs),
      |walk AS (
      | SELECT src AS id, src AS reach FROM edges
      | UNION
      | SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src)
      |SELECT id, min(reach) AS cluster FROM walk
      |GROUP BY id ORDER BY id""".stripMargin

  // ---------------------------------------------------------------- q62
  // TF-IDF completion (VERDICT r3 #5): q55's TF half + the IDF join.
  // df comes from one more map-side-combinable groupBy over the tf
  // rows; the corpus doc-count N is a 1-row aggregate broadcast into
  // the scoring join (no driver collect). Ranking uses the ROUNDED
  // score so a last-ulp ln() divergence between engines cannot flip
  // the rank order; ties break on term.
  private def q62(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val terms = docs
      .select($"doc_id", explode(split($"text", "\\s+")).as("term"))
      .filter(length($"term") > 0)
    // tf feeds both the scoring join and the df aggregate; without
    // materialization Catalyst prunes the two subtrees differently
    // (the df branch becomes a keys-only aggregate), which defeats
    // exchange reuse and re-runs the explode. Checkpointing computes
    // the explode+count once — what a real engine does with a shared
    // intermediate at 100 TB.
    // Materialize: lazy localCheckpoint locally; DISK_ONLY persist or
    // reliable checkpoint under spark.graft.materialize=resilient
    val tf = Materialize(
      terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf")))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct($"doc_id").as("n_docs"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        floor($"tf" * log($"n_docs".cast("double") / $"df") * 10000.0 + 0.5)
          / 10000.0)
    val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"term".asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"doc_id", $"rk", $"term", $"tfidf")
      .orderBy($"doc_id", $"rk")
  }
  private val q62Sql =
    """WITH t AS (
      | SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
      | FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
      |sc AS (
      | SELECT tf.doc_id, tf.term,
      |   floor(tf.tf * ln(n_docs * 1.0 / df.df) * 10000.0 + 0.5) / 10000.0
      |     AS tfidf
      | FROM tf JOIN df USING (term) CROSS JOIN n),
      |r AS (SELECT doc_id, term, tfidf,
      | row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term)
      |   AS rk
      | FROM sc)
      |SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tfidf
      |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  // ---------------------------------------------------------------- q63
  // Cube: both grouping-set variants now covered (q52 = rollup). Same
  // broadcast-dim join, count + floored sum, grouping_id for the
  // oracle's GROUPING() parity.
  private def q63(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .cube($"n_name", $"c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        (floor(sum($"c_acctbal") * 100.0 + 0.5) / 100.0).as("bal"),
        grouping_id().cast("long").as("gid"))
      .orderBy($"gid", $"n_name", $"c_mktsegment")
  }
  private val q63Sql =
    """SELECT n_name, c_mktsegment, count(*) AS cnt,
      | floor(sum(c_acctbal) * 100.0 + 0.5) / 100.0 AS bal,
      | CAST(GROUPING(n_name, c_mktsegment) AS BIGINT) AS gid
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY CUBE(n_name, c_mktsegment)
      |ORDER BY gid, n_name, c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q64
  // Gopher-style repetition gate (arXiv:2112.11446 §A.1.1 shape):
  // duplicate-word fraction + top-bigram fraction per doc, keep flag
  // from the ROUNDED metrics so engine ulps cannot flip the gate
  private def q64(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Curation.repetitionMetrics(t(s, dir, "documents"), "doc_id", "text")
      .withColumn("keep",
        $"dup_word_frac" <= 0.6 && $"top_bigram_frac" <= 0.05)
      .orderBy($"doc_id")
  }
  private val q64Sql =
    """WITH d AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w
      | FROM documents),
      |ws AS (SELECT doc_id, len(w) AS n_words,
      | len(list_distinct(w)) AS n_distinct FROM d),
      |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
      | i -> w[i] || ' ' || w[i+1])) AS b FROM d),
      |bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
      |bs AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_bg
      | FROM bc GROUP BY 1),
      |m AS (SELECT ws.doc_id, CAST(n_words AS BIGINT) AS n_words,
      | floor((1.0 - n_distinct * 1.0 / n_words) * 10000.0 + 0.5)
      |   / 10000.0 AS dup_word_frac,
      | coalesce(floor(top_c * 1.0 / n_bg * 10000.0 + 0.5) / 10000.0, 0.0)
      |   AS top_bigram_frac
      | FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id)
      |SELECT doc_id, n_words, dup_word_frac, top_bigram_frac,
      | (dup_word_frac <= 0.6 AND top_bigram_frac <= 0.05) AS keep
      |FROM m ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q65
  // Deterministic content-hash train/val/test split — reproducible
  // across runs/engines/partitionings, duplicate texts co-assigned
  private def q65(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(Curation.hashSplit($"text").as("split"), $"doc_id", $"n_chars")
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"split")
  }
  private val q65Sql =
    """WITH s AS (SELECT
      |  CASE WHEN text IS NULL THEN NULL
      |       WHEN substr(md5(text), 1, 1) < 'c' THEN 'train'
      |       WHEN substr(md5(text), 1, 1) < 'e' THEN 'val'
      |       ELSE 'test' END AS split, doc_id, n_chars
      | FROM documents)
      |SELECT split, count(*) AS n_docs,
      | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      | min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM s GROUP BY split ORDER BY split""".stripMargin

  // ---------------------------------------------------------------- q66
  // Context-window packing: per-lang running token sums bucket docs
  // into ~2048-token packs (start-offset semantics; exact integer
  // arithmetic, so assignment is engine-reproducible)
  private def q66(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select($"doc_id", $"lang",
      TextAnalysis.wsTokenCount($"text").cast("long").as("tokens"))
    Curation.packByBudget(docs, "lang", "doc_id", "tokens", 2048L)
      .groupBy($"lang", $"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"tokens").as("tokens_total"))
      .orderBy($"lang", $"pack_id")
  }
  private val q66Sql =
    """WITH d AS (SELECT doc_id, lang,
      | len(regexp_extract_all(text, '\S+')) AS tokens FROM documents),
      |p AS (SELECT lang, tokens,
      | CAST(coalesce(sum(tokens) OVER (PARTITION BY lang
      |   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |   0) // 2048 AS BIGINT) AS pack_id
      | FROM d)
      |SELECT lang, pack_id, count(*) AS n_docs,
      | CAST(sum(tokens) AS BIGINT) AS tokens_total
      |FROM p GROUP BY 1, 2 ORDER BY lang, pack_id""".stripMargin

  // ---------------------------------------------------------------- q67
  // Mixture quotas / per-domain caps: keep the top-`quota` docs per
  // source by length (tie-broken by id — fully deterministic)
  private def q67(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val quota = when($"source" === "src0", 40)
      .when($"source" === "src1", 30)
      .when($"source" === "src2", 20).otherwise(10)
    Curation.quotaCap(t(s, dir, "documents"), "source", quota,
        $"n_chars".desc, $"doc_id".asc)
      .select($"source", $"rn", $"doc_id", $"n_chars")
      .orderBy($"source", $"rn")
  }
  private val q67Sql =
    """WITH r AS (SELECT source, doc_id, n_chars,
      | row_number() OVER (PARTITION BY source
      |   ORDER BY n_chars DESC, doc_id) AS rn
      | FROM documents),
      |q AS (SELECT *, CASE source WHEN 'src0' THEN 40 WHEN 'src1' THEN 30
      |  WHEN 'src2' THEN 20 ELSE 10 END AS quota FROM r)
      |SELECT source, CAST(rn AS BIGINT) AS rn, doc_id, n_chars
      |FROM q WHERE rn <= quota ORDER BY source, rn""".stripMargin

  // ---------------------------------------------------------------- q68
  // PII scrub: count + redact emails/IPv4s/phone runs with patterns
  // chosen for identical Java-regex/RE2 semantics (Curation.piiPatterns
  // is the single source for both engines)
  private val piiFixtures: Seq[String] = Seq(
    "Contact support@example.com or sales-team@corp.io for details",
    "Gateway 192.168.0.1 and backup 10.0.0.255 are reachable",
    "Call +84 123 456 789 or 0123 456 789 to register",
    "Mixed case: Admin@Test.org from 8.8.8.8 dials 555-123-4567 today",
    "No personal data in this line at all")
  private def q68(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    piiFixtures.toDF("line").select($"line",
      Curation.piiCount($"line", "email").cast("long").as("n_email"),
      Curation.piiCount($"line", "ip").cast("long").as("n_ip"),
      Curation.piiCount($"line", "phone").cast("long").as("n_phone"),
      Curation.scrubPii($"line").as("redacted"))
      .orderBy($"line")
  }
  private def q68Sql: String = {
    val pats = Curation.piiPatterns.toMap
    val values = piiFixtures.map(l => s"('$l')").mkString(", ")
    val redacted = Curation.piiPatterns.foldLeft("line") {
      case (e, (kind, pat)) =>
        s"regexp_replace($e, '$pat', '[${kind.toUpperCase}]', 'g')"
    }
    s"""WITH f AS (SELECT * FROM (VALUES $values) t(line))
       |SELECT line,
       | CAST(len(regexp_extract_all(line, '${pats("email")}')) AS BIGINT)
       |   AS n_email,
       | CAST(len(regexp_extract_all(line, '${pats("ip")}')) AS BIGINT)
       |   AS n_ip,
       | CAST(len(regexp_extract_all(line, '${pats("phone")}')) AS BIGINT)
       |   AS n_phone,
       | $redacted AS redacted
       |FROM f ORDER BY line""".stripMargin
  }

  // ---------------------------------------------------------------- q69
  // T5 seeded shuffle: rank each source's docs in md5(seed:key) order —
  // the reference's random.shuffle with process randomness replaced by
  // a seed, so the "random" order is engine- and run-reproducible
  private def q69(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Seeded.shuffle(t(s, dir, "documents"), "source", "doc_id", "s42")
      .filter($"rank" <= 5)
      .select($"source", $"rank", $"doc_id")
      .orderBy($"source", $"rank")
  }
  private val q69Sql =
    """WITH r AS (SELECT source, doc_id,
      | row_number() OVER (PARTITION BY source
      |   ORDER BY md5('s42:' || doc_id), doc_id) AS rank
      | FROM documents)
      |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id
      |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin

  // ---------------------------------------------------------------- q70
  // F14 seeded normal vector: Irwin-Hall draws from md5-derived 16-bit
  // uniforms — dyadic-rational arithmetic end to end, so values are
  // bit-identical cross-engine with NO rounding guard (the oracle
  // hash-compares raw doubles)
  private def q70(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").filter($"doc_id" < 20)
      .select($"doc_id",
        posexplode(Seeded.normalVec($"doc_id", 8, "s42")).as(Seq("i", "z")))
      .select($"doc_id", $"i".cast("long").as("i"), $"z")
      .orderBy($"doc_id", $"i")
  }
  private def q70Sql: String = {
    val parts = (0 until 8).map(k =>
      s"('0x' || substr(h, ${1 + 4 * k}, 4))::BIGINT / 65536.0")
      .mkString("(", " + ", ")")
    s"""WITH e AS (
       | SELECT doc_id, unnest(range(0, 8)) AS i FROM documents
       | WHERE doc_id < 20),
       |hs AS (SELECT doc_id, i,
       | md5('s42:' || doc_id || ':' || i) AS h FROM e)
       |SELECT doc_id, CAST(i AS BIGINT) AS i,
       | ($parts - 4.0) / ${Seeded.IrwinHallNorm} AS z
       |FROM hs ORDER BY doc_id, i""".stripMargin
  }

  // ---------------------------------------------------------------- q71
  // lag/lead deltas: order-value change vs previous/next order per
  // customer — the offset-window surface next to q54's running frames.
  // Same-operand subtraction is deterministic; rounding only guards
  // the window-less engines' ulps on the shared operands
  private def q71(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    t(s, dir, "orders").filter($"o_custkey" < 50)
      .select($"o_custkey", $"o_orderkey",
        (floor(($"o_totalprice" - lag($"o_totalprice", 1).over(w))
          * 100.0 + 0.5) / 100.0).as("delta_prev"),
        (floor((lead($"o_totalprice", 1).over(w) - $"o_totalprice")
          * 100.0 + 0.5) / 100.0).as("delta_next"))
      .orderBy($"o_custkey", $"o_orderkey")
  }
  private val q71Sql =
    """SELECT o_custkey, o_orderkey,
      | floor((o_totalprice - lag(o_totalprice, 1) OVER w) * 100.0 + 0.5)
      |   / 100.0 AS delta_prev,
      | floor((lead(o_totalprice, 1) OVER w - o_totalprice) * 100.0 + 0.5)
      |   / 100.0 AS delta_next
      |FROM orders WHERE o_custkey < 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q72
  // Ordered string aggregation: per (nation, segment) roster —
  // array_sort before join makes the concatenation order-independent
  // of shuffle arrival, which is also what makes it oracle-able
  private def q72(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer").filter($"c_nationkey" < 5)
      .groupBy($"c_nationkey".cast("long").as("c_nationkey"),
        $"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        concat_ws(",", array_sort(collect_list($"c_name"))).as("roster"))
      .orderBy($"c_nationkey", $"c_mktsegment")
  }
  private val q72Sql =
    """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
      | count(*) AS n,
      | string_agg(c_name, ',' ORDER BY c_name) AS roster
      |FROM customer WHERE c_nationkey < 5
      |GROUP BY 1, 2 ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q73
  // Second-moment statistics: stddev / covariance / correlation per
  // group. Engines accumulate moments in different merge orders, so
  // results differ below ~1e-10 relative — rounding granularity is
  // chosen orders of magnitude above that
  private def q73(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem").groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        (floor(stddev_samp($"l_extendedprice") * 100.0 + 0.5) / 100.0)
          .as("sd_price"),
        (floor(covar_pop($"l_quantity", $"l_extendedprice") * 100.0 + 0.5)
          / 100.0).as("cov_qty_price"),
        (floor(corr($"l_quantity", $"l_extendedprice") * 10000.0 + 0.5)
          / 10000.0).as("corr_qty_price"))
      .orderBy($"l_returnflag")
  }
  private val q73Sql =
    """SELECT l_returnflag, count(*) AS n,
      | floor(stddev_samp(l_extendedprice) * 100.0 + 0.5) / 100.0
      |   AS sd_price,
      | floor(covar_pop(l_quantity, l_extendedprice) * 100.0 + 0.5) / 100.0
      |   AS cov_qty_price,
      | floor(corr(l_quantity, l_extendedprice) * 10000.0 + 0.5) / 10000.0
      |   AS corr_qty_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q74
  // End-to-end curation pipeline, the composition capstone: exact-dedup
  // survivors → repetition gate → quality gate → content-hash split →
  // per-(split, lang) doc/token totals. Every stage is an operator the
  // suite already oracles in isolation (q21/q64/q18/q65/q17); this pins
  // that they compose without semantic drift. All gates compare ROUNDED
  // values so engine ulps cannot flip membership.
  private def q74(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Curation.curate(t(s, dir, "documents"), "doc_id", "text")
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"tokens").as("tokens_total"))
      .orderBy($"split", $"lang")
  }
  private def q74Sql: String = {
    val stopRe = s"\\b(${TextAnalysis.stopwords.mkString("|")})\\b"
    s"""WITH surv AS (
       | SELECT min(doc_id) AS doc_id
       | FROM (SELECT doc_id,
       |   md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
       |  FROM documents) GROUP BY fp),
       |d AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
       | FROM documents),
       |ws AS (SELECT doc_id, len(w) AS n_words,
       | len(list_distinct(w)) AS n_distinct FROM d),
       |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
       | i -> w[i] || ' ' || w[i+1])) AS b FROM d),
       |bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
       |bs AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_bg
       | FROM bc GROUP BY 1),
       |rep AS (
       | SELECT ws.doc_id FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
       | WHERE floor((1.0 - n_distinct * 1.0 / n_words) * 10000.0 + 0.5)
       |     / 10000.0 <= 0.6
       |   AND coalesce(floor(top_c * 1.0 / n_bg * 10000.0 + 0.5)
       |     / 10000.0, 0.0) <= 0.05),
       |qual AS (
       | SELECT doc_id, floor((CASE WHEN toks > 0 THEN
       |   least(1.0, toks / 100.0) * 0.4
       |   + least(1.0, stop * 5.0 / toks) * 0.3
       |   + (dist / toks) * 0.3 ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0
       |   AS q
       | FROM (SELECT doc_id,
       |   CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS toks,
       |   CAST(len(regexp_extract_all(lower(text), '$stopRe')) AS DOUBLE)
       |     AS stop,
       |   CAST(len(list_distinct(regexp_extract_all(text, '\\S+')))
       |     AS DOUBLE) AS dist
       |  FROM documents)),
       |kept AS (
       | SELECT
       |  CASE WHEN substr(md5(text), 1, 1) < 'c' THEN 'train'
       |       WHEN substr(md5(text), 1, 1) < 'e' THEN 'val'
       |       ELSE 'test' END AS split,
       |  lang, len(regexp_extract_all(text, '\\S+')) AS tokens
       | FROM documents
       | JOIN surv USING (doc_id) JOIN rep USING (doc_id)
       | JOIN qual USING (doc_id)
       | WHERE q >= 0.45)
       |SELECT split, lang, count(*) AS n_docs,
       | CAST(sum(tokens) AS BIGINT) AS tokens_total
       |FROM kept GROUP BY 1, 2 ORDER BY split, lang""".stripMargin
  }

  // ---------------------------------------------------------------- q75
  // SCD2 history build from the event change log: versioned rows with
  // [valid_from, valid_to) ranges and a current flag — the
  // point-in-time view the reference's overwrite-in-place upserts
  // cannot answer
  private def q75(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Upsert.scd2(
        t(s, dir, "events").filter($"user_id" < 5)
          .select($"user_id", $"event_id", $"event_type".as("state"), $"ts"),
        "user_id", "ts", $"event_id")
      .select($"user_id", $"event_id", $"state",
        $"valid_from", $"valid_to", $"is_current")
      .orderBy($"user_id", $"valid_from", $"event_id")
  }
  private val q75Sql =
    """SELECT user_id, event_id, event_type AS state,
      | ts::TIMESTAMP AS valid_from,
      | lead(ts::TIMESTAMP, 1) OVER w AS valid_to,
      | (lead(ts::TIMESTAMP, 1) OVER w IS NULL) AS is_current
      |FROM events WHERE user_id < 5
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  // ---------------------------------------------------------------- q76
  // Product-quantization ANN on the FLAT pqTopK baseline (so the
  // q76/q77 pair measures what IVF pruning + residual encoding buy;
  // production call sites use ivfPqTopK — see the "superseded at
  // scale" note on Similarity.pqTopK). Codebooks fit once per dir and
  // cached like q48's IVF quantizer.
  //
  // ORACLE: the ADC ranking is fully deterministic GIVEN the fitted
  // codebooks — encode is an argmin of sequential-fold squared-L2
  // chains, reconstruction is codeword lookup, and the cosine against
  // the raw query is the same fold q24 already oracles. So the oracle
  // SQL is GENERATED from the very model the query ran (q29's
  // hyperplane-literal trick, extended to fitted parameters):
  // per-subspace distance chains in left-associative `+` (bit-equal to
  // VectorKernels.nearestCells' loop), argmin via
  // list_position(d, list_min(d)) (first strict minimum — the kernel's
  // tie-break), codeword tables as list literals. Verify dumps
  // oracleSql AFTER running the queries, so the fitted model is always
  // in cache when the SQL is built (ContractSpec pins this wiring).
  private val pqModels =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.PqModel]
  @volatile private var lastPqDir: Option[String] = None
  private def q76(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val model = pqModels.getOrElseUpdate(dir,
      Similarity.fitPq(emb, "embedding", m = 8, k = 16))
    lastPqDir = Some(dir)
    val codes = Similarity.pqEncode(model, emb, "vec_id", "embedding")
    Similarity.pqTopK(model, emb.filter($"vec_id" < 10), codes,
        "vec_id", "embedding", k = 5)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }

  /** q76's oracle, built from the codebooks fitted by the LAST q76 run
    * (None until q76 has run in this JVM — Verify's dump order
    * guarantees it has).
    */
  private[queries] def q76SqlNow: Option[String] =
    lastPqDir.flatMap(pqModels.get).map(q76SqlFor)

  private def q76SqlFor(model: Similarity.PqModel): String = {
    def dd(x: Double) = java.lang.Double.toString(x)
    val m = model.m
    val sub = model.subDim
    // per-subspace: 16 squared-L2 chains (left-assoc + : the kernel's
    // fold order), then the first-minimum codeword's literal vector
    val distCols = (0 until m).map { mi =>
      val chains = model.codebooks(mi).map { cw =>
        (0 until sub).map { i =>
          val idx = mi * sub + i + 1 // 1-based SQL list index
          s"(v[$idx]-(${dd(cw(i))}))*(v[$idx]-(${dd(cw(i))}))"
        }.mkString("+")
      }
      s"[${chains.mkString(",\n   ")}] AS d$mi"
    }.mkString(",\n  ")
    val wordCols = (0 until m).map { mi =>
      val book = model.codebooks(mi)
        .map(cw => s"[${cw.map(dd).mkString(",")}]").mkString(",")
      s"([$book])[list_position(d$mi, list_min(d$mi))] AS w$mi"
    }.mkString(",\n  ")
    val cv = (0 until m).map(mi => s"w$mi").mkString(" || ")
    s"""WITH c AS (
       | SELECT vec_id AS c_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       | FROM embeddings),
       |d AS (SELECT c_id, v,
       |  $distCols
       | FROM c),
       |e AS (SELECT c_id,
       |  $wordCols
       | FROM d),
       |rc AS (SELECT c_id, $cv AS cv FROM e),
       |q AS (SELECT vec_id AS q_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
       | FROM embeddings WHERE vec_id < 10),
       |sc AS (
       | SELECT q_id, c_id,
       |  list_dot_product(qv, cv)
       |   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
       |   AS sim
       | FROM q, rc WHERE q_id <> c_id),
       |r AS (SELECT q_id, c_id, sim,
       | row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id)
       |   AS rank
       | FROM sc)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id,
       | round(sim, 6) AS sim
       |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q77
  // IVF-PQ composed ANN, oracle mode: exhaustive probing (nprobe =
  // nlist) + no PQ survivor cut (rerankFactor = 0) make the two-stage
  // search provably ≡ brute force — the index join must yield every
  // corpus vector exactly once and the exact re-rank + tie-break then
  // match bruteTopKSql bit-for-bit, putting the encode/join/re-rank
  // plumbing under the cross-engine oracle. The production shape
  // (nprobe < nlist, PQ-scored survivor cut; recall ≥ plain PQ) is
  // spec-pinned in VectorSimilaritySpec. Models cached per dir like
  // q48/q76.
  private val ivfPqModels =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.IvfPqModel]
  private def q77(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val model = ivfPqModels.getOrElseUpdate(dir,
      Similarity.fitIvfPq(emb, "embedding", nlist = 16, m = 8, k = 16))
    val index = Similarity.ivfPqEncode(model, emb, "vec_id", "embedding")
    Similarity.ivfPqTopK(model,
        emb.filter($"vec_id" >= 20 && $"vec_id" < 30), index, emb,
        "vec_id", "embedding", k = 5, nprobe = 16, rerankFactor = 0)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  private val q77Sql = bruteTopKSql("vec_id >= 20 AND vec_id < 30", 5)

  // ---------------------------------------------------------------- q78
  // F15 deterministic voice pick: md5-keyed choice from the per-gender
  // voice pool (reference: random.choice per call — seeded here so the
  // oracle can mirror the draw exactly)
  private def q78(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").filter($"doc_id" < 200)
      .select($"doc_id",
        when(pmod($"doc_id", lit(2)) === 0, "male").otherwise("female")
          .as("gender"))
      .withColumn("voice", Seeded.voicePick($"gender", $"doc_id"))
      .orderBy($"doc_id")
  }
  private val q78Sql =
    """WITH d AS (SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'male' ELSE 'female' END AS gender
      | FROM documents WHERE doc_id < 200),
      |v AS (SELECT doc_id, gender,
      |  ('0x' || substr(md5('s42:' || doc_id), 1, 4))::BIGINT % 4 AS idx
      | FROM d)
      |SELECT doc_id, gender,
      | CASE WHEN gender = 'male'
      |   THEN list_extract(['alloy','echo','fable','onyx'],
      |     CAST(idx + 1 AS INT))
      |   ELSE list_extract(['shimmer','coral','nova','sage'],
      |     CAST(idx + 1 AS INT))
      | END AS voice
      |FROM v ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q79
  // Dedup capstone: candidates → exact-Jaccard verify → connected-
  // component clusters → anti-join survivors, end to end. Exact
  // jaccardPairs candidates (zero LSH misses) so the survivor set is
  // DuckDB-oracle-able via the recursive-CTE closure; the LSH-candidate
  // production path (dropNearDups) shares this exact composition tail.
  private def q79(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "documents").filter($"doc_id" < 40)
      .select($"doc_id", $"text", $"n_chars")
    val docs = base.unionByName(base.filter($"doc_id" < 20)
      .select(($"doc_id" + 10000000L).as("doc_id"), $"text", $"n_chars"))
    val cands = Dedup.jaccardPairs(docs, "text", "doc_id", minJaccard = 0.5)
      .select($"id_a", $"id_b")
    Dedup.dropNearDupsWith(docs, "text", "doc_id", cands, minJaccard = 0.8)
      .select($"doc_id", $"n_chars")
      .orderBy($"doc_id")
  }
  private val q79Sql =
    """WITH RECURSIVE u AS (
      | SELECT doc_id, text, n_chars FROM documents WHERE doc_id < 40
      | UNION ALL
      | SELECT doc_id + 10000000, text, n_chars
      | FROM documents WHERE doc_id < 20),
      |d AS (
      | SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w
      | FROM u),
      |sh AS (
      | SELECT doc_id, unnest(list_distinct(list_transform(
      |   range(1, len(w) - 1),
      |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sgl
      | FROM d),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |inter AS (
      | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      | FROM sh a JOIN sh b ON a.sgl = b.sgl AND a.doc_id < b.doc_id
      | GROUP BY 1, 2),
      |pairs AS (
      | SELECT id_a, id_b FROM inter
      | JOIN cnt ca ON ca.doc_id = id_a
      | JOIN cnt cb ON cb.doc_id = id_b
      | WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.8),
      |edges AS (
      | SELECT id_a AS src, id_b AS dst FROM pairs
      | UNION ALL
      | SELECT id_b, id_a FROM pairs),
      |walk AS (
      | SELECT src AS id, src AS reach FROM edges
      | UNION
      | SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src),
      |losers AS (
      | SELECT id FROM walk GROUP BY id HAVING id <> min(reach))
      |SELECT doc_id, n_chars FROM u
      |WHERE doc_id NOT IN (SELECT id FROM losers)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q80
  // Incremental dedup: a delta's signatures banded against a persisted
  // corpus signature index — broadcast delta, ONE index scan, no
  // corpus recompute. Oracle mode (Dedup.Md5): DuckDB rebuilds both
  // signature sets and keeps only pairs touching the delta (delta ids
  // are all ≥ 10⁷). Fast-path ≡ full-batch equivalence stays
  // spec-pinned in DedupSpec.
  private def q80(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select($"doc_id", $"text")
    val index = docs.filter($"doc_id" % 5 =!= 0)
    val delta = docs.filter($"doc_id" % 5 === 0)
      .select(($"doc_id" + 10000000L).as("doc_id"), $"text")
    Dedup.incrementalCandidates(
        Dedup.minhashSignatures(index, "text", "doc_id", hash = Dedup.Md5),
        Dedup.minhashSignatures(delta, "text", "doc_id", hash = Dedup.Md5),
        hash = Dedup.Md5)
      .orderBy($"id_a", $"id_b")
  }
  private val q80Sql =
    s"""WITH src AS (
       | SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
       | UNION ALL
       | SELECT doc_id + 10000000 AS doc_id, text FROM documents
       | WHERE doc_id % 5 = 0),
       |$shingleHashCtes,
       |${minhashBandCtes(32, 8)}
       |SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
       |FROM b a JOIN b b2
       | ON a.band = b2.band AND a.bk = b2.bk AND a.doc_id < b2.doc_id
       |WHERE a.doc_id >= 10000000 OR b2.doc_id >= 10000000
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q81
  // Deterministic stratified mixture sampling: per-lang keep fractions
  // decided by md5(seed ‖ doc_id) — reproducible across engines, so
  // the oracle mirrors the draw bit-for-bit (zh absent from the map →
  // dropped entirely)
  private def q81(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fractions = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.125,
      "es" -> 1.0)
    Curation.stratifiedSample(t(s, dir, "documents"), "lang", "doc_id",
        fractions, seed = "mix7")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"),
        min($"doc_id").as("first_doc"))
      .orderBy($"lang")
  }
  private val q81Sql = {
    val cuts = Seq("en" -> 0.5, "de" -> 0.25, "fr" -> 0.125, "es" -> 1.0)
      .map { case (l, f) =>
        s"WHEN lang = '$l' THEN u < ${math.round(f * 4294967296.0)}" }
      .mkString(" ")
    s"""WITH d AS (SELECT lang, doc_id, n_chars,
       | ('0x' || substr(md5('mix7:' || doc_id), 1, 8))::BIGINT AS u
       | FROM documents),
       |k AS (SELECT lang, doc_id, n_chars FROM d
       | WHERE CASE $cuts ELSE FALSE END)
       |SELECT lang, count(*) AS n_docs,
       | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       | min(doc_id) AS first_doc
       |FROM k GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- q82
  // Mergeable HLL sketch distinct counting: build per (event_type, day)
  // sketches once, roll up per event_type from sketch bytes — the
  // no-rescan distinct-count pattern. Oracle contract: the estimate
  // itself is engine-specific (DataSketches register layout), so the
  // query emits (n_exact, within_bound) where within_bound checks the
  // estimate against HLL's published 3σ relative error
  // (3·1.04/√2^lgK ≈ 4.9% at lgK=12); DuckDB mirrors the exact counts
  // and asserts the bound holds — the booleans hash-match while the
  // estimates differ. Slice-merge ≡ whole-scan stays spec-pinned in
  // SketchesSpec.
  private def q82(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .select($"event_type", $"user_id", to_date($"ts").as("day"))
    val daily = Sketches.sketchTable(ev,
      Seq("event_type", "day"), "user_id")
    val est = Sketches.mergeEstimate(daily, Seq("event_type"))
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_exact"))
    est.join(exact, "event_type")
      .select($"event_type", $"n_exact",
        (abs($"distinct_est" - $"n_exact") <=
          lit(3.0 * 1.04 / math.sqrt(4096.0)) * $"n_exact")
          .as("within_bound"))
      .orderBy($"event_type")
  }
  private val q82Sql =
    """SELECT event_type, count(DISTINCT user_id) AS n_exact,
      | true AS within_bound
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q83
  // Deterministic weighted sampling (Efraimidis–Spirakis): 5 docs per
  // lang, weight = n_chars, seeded md5 uniforms — both engines rank
  // the same rounded u^(1/w) scores
  private def q83(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Curation.weightedSample(t(s, dir, "documents")
        .select($"doc_id", $"lang", $"n_chars"),
        "lang", "doc_id", "n_chars", n = 5, seed = "ws9")
      .select($"lang", $"rank", $"doc_id", $"n_chars")
      .orderBy($"lang", $"rank")
  }
  private val q83Sql =
    """WITH d AS (SELECT doc_id, lang, n_chars,
      | (('0x' || substr(md5('ws9:' || doc_id), 1, 8))::BIGINT + 0.5)
      |   / 4294967296.0 AS u
      | FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
      |sc AS (SELECT doc_id, lang, n_chars,
      | floor(pow(u, 1.0 / n_chars) * 1e12 + 0.5) / 1e12 AS es
      | FROM d),
      |r AS (SELECT lang, doc_id, n_chars,
      | row_number() OVER (PARTITION BY lang ORDER BY es DESC, doc_id)
      |   AS rank
      | FROM sc)
      |SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, n_chars
      |FROM r WHERE rank <= 5 ORDER BY lang, rank""".stripMargin

  // ---------------------------------------------------------------- q84
  // Banded inequality join via bucketing: |price_a − price_b| ≤ 0.15
  // across two brands — the equi-join + neighbor-replication shape
  // that replaces the BNLJ a naive inequality join plans as. The
  // oracle runs the plain inequality join (exact on this bounded
  // corpus); the Spark side must produce the identical pair set.
  private def q84(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val part = t(s, dir, "part")
      .select($"p_partkey", $"p_brand", $"p_retailprice")
    val a = part.filter($"p_brand" === "Brand#11")
      .select($"p_partkey", $"p_retailprice")
    val b = part.filter($"p_brand" === "Brand#12")
      .select($"p_partkey", $"p_retailprice")
    Events.bandJoin(a, b, "p_retailprice", "p_retailprice", eps = 0.15)
      .select($"l_p_partkey".as("a_key"), $"r_p_partkey".as("b_key"),
        $"l_p_retailprice".as("a_price"), $"r_p_retailprice".as("b_price"))
      .orderBy($"a_key", $"b_key")
  }
  private val q84Sql =
    """SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
      | a.p_retailprice AS a_price, b.p_retailprice AS b_price
      |FROM part a JOIN part b
      | ON abs(a.p_retailprice - b.p_retailprice) <= 0.15
      |WHERE a.p_brand = 'Brand#11' AND b.p_brand = 'Brand#12'
      |ORDER BY a_key, b_key""".stripMargin

  // ---------------------------------------------------------------- q85
  // Native session_window grouping — the built-in operator twin of
  // q15's manual islands formulation. Spark's session is half-open
  // [start, last + gap): an event at EXACTLY gap after its predecessor
  // starts a new session, so the oracle's island break uses >=, where
  // q15's manual variant uses > (both semantics are valid; each oracle
  // mirrors its engine's definition exactly).
  private def q85(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"sw.start".as("session_start"), $"n_events")
      .orderBy($"user_id", $"session_start")
  }
  private val q85Sql =
    """WITH o AS (
      | SELECT user_id, ts::TIMESTAMP AS ts, event_id,
      |  CASE WHEN lag(ts::TIMESTAMP) OVER w IS NULL
      |        OR ts::TIMESTAMP - lag(ts::TIMESTAMP) OVER w
      |             >= INTERVAL 30 MINUTE
      |       THEN 1 ELSE 0 END AS ns
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
      |), se AS (
      | SELECT user_id, ts,
      |  sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                ROWS UNBOUNDED PRECEDING) AS sess_id
      | FROM o)
      |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
      |FROM se GROUP BY user_id, sess_id
      |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------- q86
  // Snapshot diff / CDC extraction: two deterministic versions of the
  // documents table → one row per insert/delete/update
  private def q86(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select($"doc_id", $"lang", $"n_chars")
    val old = docs.filter($"doc_id" < 300)
    val nw = docs.filter($"doc_id" < 320 && pmod($"doc_id", lit(7)) =!= 0)
      .withColumn("n_chars",
        when(pmod($"doc_id", lit(5)) === 0, $"n_chars" + 10)
          .otherwise($"n_chars"))
    Upsert.snapshotDiff(old, nw, Seq("doc_id")).orderBy($"doc_id")
  }
  private val q86Sql =
    """WITH o AS (
      | SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 300),
      |n AS (
      | SELECT doc_id, lang,
      |  CASE WHEN doc_id % 5 = 0 THEN n_chars + 10 ELSE n_chars END
      |    AS n_chars
      | FROM documents WHERE doc_id < 320 AND doc_id % 7 <> 0),
      |j AS (
      | SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |  CASE WHEN o.doc_id IS NULL THEN 'insert'
      |       WHEN n.doc_id IS NULL THEN 'delete'
      |       WHEN o.lang IS DISTINCT FROM n.lang
      |         OR o.n_chars IS DISTINCT FROM n.n_chars THEN 'update'
      |  END AS op,
      |  n.lang AS lang, n.n_chars AS n_chars
      | FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
      |SELECT doc_id, op, lang, n_chars FROM j
      |WHERE op IS NOT NULL ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q87
  // Benchmark decontamination: corpus docs sharing ≥ 5 word 3-shingles
  // with the "eval set" (docs 100-119, a subset of the corpus — so
  // those 20 self-contaminate by construction) are dropped; survivors
  // oracled value-for-value
  private def q87(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val corpus = docs.filter($"doc_id" < 300)
      .select($"doc_id", $"text", $"n_chars")
    val eval = docs.filter($"doc_id" >= 100 && $"doc_id" < 120)
      .select($"text")
    Curation.decontaminate(corpus, "text", "doc_id", eval, "text",
        n = 3, minHits = 5L)
      .select($"doc_id", $"n_chars")
      .orderBy($"doc_id")
  }
  private val q87Sql =
    """WITH c AS (
      | SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w,
      |        n_chars
      | FROM documents WHERE doc_id < 300),
      |cs AS (
      | SELECT doc_id, unnest(list_distinct(list_transform(
      |   range(1, len(w) - 1),
      |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sgl
      | FROM c),
      |e AS (
      | SELECT regexp_extract_all(lower(text), '\S+') AS w
      | FROM documents WHERE doc_id >= 100 AND doc_id < 120),
      |es AS (
      | SELECT DISTINCT unnest(list_distinct(list_transform(
      |   range(1, len(w) - 1),
      |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sgl
      | FROM e),
      |bad AS (
      | SELECT doc_id FROM cs JOIN es USING (sgl)
      | GROUP BY doc_id HAVING count(*) >= 5)
      |SELECT doc_id, n_chars FROM c
      |WHERE doc_id NOT IN (SELECT doc_id FROM bad)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q88
  // Per-group exact median + deterministic mode: median rounded above
  // interpolation ulps; mode formulated manually (count + rank, ties
  // on the value) because the engines' built-in mode tie-breaks differ
  private def q88(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .select($"event_type", $"value", pmod($"user_id", lit(10)).as("ub"))
    val med = ev.groupBy($"event_type")
      .agg((floor(median($"value") * 1000000.0 + 0.5) / 1000000.0)
        .as("med_value"))
    val counts = ev.groupBy($"event_type", $"ub")
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"event_type")
      .orderBy($"c".desc, $"ub".asc)
    val mode = counts.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"event_type", $"ub".as("modal_bucket"))
    med.join(mode, "event_type").orderBy($"event_type")
  }
  private val q88Sql =
    """WITH ev AS (
      | SELECT event_type, value, user_id % 10 AS ub FROM events),
      |med AS (
      | SELECT event_type,
      |  floor(median(value) * 1000000.0 + 0.5) / 1000000.0 AS med_value
      | FROM ev GROUP BY event_type),
      |c AS (SELECT event_type, ub, count(*) AS c FROM ev GROUP BY 1, 2),
      |m AS (
      | SELECT event_type, ub AS modal_bucket,
      |  row_number() OVER (PARTITION BY event_type ORDER BY c DESC, ub)
      |    AS rk
      | FROM c)
      |SELECT med.event_type AS event_type, med_value, modal_bucket
      |FROM med JOIN m ON med.event_type = m.event_type AND rk = 1
      |ORDER BY med.event_type""".stripMargin

  // ---------------------------------------------------------------- q89
  // ST7 rate limiting as a batch admission schedule: min 1s between
  // requests per user — admit_i = max(ts_i, admit_{i-1} + 1s), as a
  // running max over ts − i·gap (exact long micros end to end)
  private def q89(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Events.rateLimit(
        t(s, dir, "events").filter($"user_id" < 10)
          .select($"user_id", $"event_id", $"ts"),
        "user_id", "ts", gapMicros = 1000000L, $"event_id")
      .select($"user_id", $"event_id", $"admit_ts", $"wait_us")
      .orderBy($"user_id", $"admit_ts", $"event_id")
  }
  private val q89Sql =
    """WITH o AS (
      | SELECT user_id, event_id, ts::TIMESTAMP AS ts,
      |  epoch_us(ts::TIMESTAMP) AS us,
      |  row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts::TIMESTAMP, event_id) AS rn
      | FROM events WHERE user_id < 10),
      |a AS (
      | SELECT user_id, event_id, us,
      |  max(us - rn * 1000000) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
      |    + rn * 1000000 AS admit_us
      | FROM o)
      |SELECT user_id, event_id, make_timestamp(admit_us) AS admit_ts,
      | CAST(admit_us - us AS BIGINT) AS wait_us
      |FROM a ORDER BY user_id, admit_ts, event_id""".stripMargin

  // ---------------------------------------------------------------- q90
  // Table profiling: per-column nulls / exact distincts / min-max in
  // one scan, unpivoted to (column, stat) rows
  private def q90(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Profile.table(t(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "n_chars"))
      .orderBy($"col_name")
  }
  private val q90Sql = {
    def one(c: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_nulls,
         | CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         | CAST(min($c) AS VARCHAR) AS min_val,
         | CAST(max($c) AS VARCHAR) AS max_val
         |FROM documents""".stripMargin
    Seq("doc_id", "lang", "source", "n_chars").map(one)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // ---------------------------------------------------------------- q91
  // Salted skew join end-to-end: result must equal the plain join —
  // the oracle runs the unsalted SQL, so any salting artifact
  // (dropped/duplicated rows) breaks the hash match
  private def q91(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
      .select($"o_custkey".as("custkey"), $"o_totalprice")
    val cust = t(s, dir, "customer")
      .select($"c_custkey".as("custkey"), $"c_mktsegment")
    Skew.saltedJoin(orders, cust, "custkey", salt = 8)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        floor(sum($"o_totalprice") + 0.5).cast("long")
          .as("sum_price"))
      .orderBy($"c_mktsegment")
  }
  private val q91Sql =
    """SELECT c_mktsegment, count(*) AS n_orders,
      | CAST(floor(sum(o_totalprice) + 0.5) AS BIGINT) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q92
  // Explicit GROUPING SETS (the third of the rollup/cube family,
  // q52/q63): per-type, per-day and grand-total aggregates in one
  // pass; null ordering pinned NULLS LAST on both engines
  private def q92(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .select($"event_type", to_date($"ts").as("day"), $"value")
    ev.groupingSets(
        Seq(Seq($"event_type"), Seq($"day"), Seq.empty[Column]),
        $"event_type", $"day")
      .agg(count(lit(1)).as("n"),
        floor(sum($"value") + 0.5).cast("long").as("sum_value"))
      .orderBy($"event_type".asc_nulls_last, $"day".asc_nulls_last)
  }
  private val q92Sql =
    """SELECT event_type, ts::DATE AS day, count(*) AS n,
      | CAST(floor(sum(value) + 0.5) AS BIGINT) AS sum_value
      |FROM events
      |GROUP BY GROUPING SETS ((event_type), (ts::DATE), ())
      |ORDER BY event_type NULLS LAST, day NULLS LAST""".stripMargin

  // ---------------------------------------------------------------- q93
  // ST1-ST3 lifecycle under the oracle contract: the documents table
  // streams through Streams.incrementalUpsert (Trigger.AvailableNow,
  // maxFilesPerTrigger=1 over a 4-file spill so the backlog REALLY
  // drains as multiple micro-batches), each batch MERGE-patching the
  // seeded state table — 'en' docs get status/summary set, others keep
  // their seed state. Final table state is batch-count-invariant
  // (doc_id keys are unique and the stage is row-local), so DuckDB
  // folds the whole lifecycle as one batch expression. Cost is the
  // sequential per-batch table merges by design (the lifecycle IS the
  // operator here); 4 batches keeps that honest without dominating
  // the bench.
  private def q93(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q93").toString
    val docs = t(s, dir, "documents").select($"doc_id", $"lang", $"text")
    val table = s"$tmp/state"
    docs.select($"doc_id", $"lang", $"text",
        lit("new").as("status"),
        lit(null).cast("string").as("summary"))
      .write.parquet(table)
    val inDir = s"$tmp/in"
    docs.repartition(4).write.parquet(inDir)
    val stream = s.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val stage = (b: DataFrame) =>
      b.filter(col("lang") === "en")
        .select(col("doc_id"),
          lit("summarized").as("status"),
          concat(lit("sum:"), substring(col("text"), 1, 30)).as("summary"))
    val q = graft.streaming.Streams.incrementalUpsert(
      stream, stage, table, Seq("doc_id"), s"$tmp/cp")
    q.awaitTermination()
    s.read.parquet(table)
      .select($"doc_id", $"lang", $"status", $"summary")
      .orderBy($"doc_id")
  }
  private val q93Sql =
    """SELECT doc_id, lang,
      | CASE WHEN lang = 'en' THEN 'summarized' ELSE 'new' END AS status,
      | CASE WHEN lang = 'en' THEN 'sum:' || substr(text, 1, 30) END
      |   AS summary
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q94
  // Real-codec multimodal decode: REAL RIFF/WAVE bytes (canonical PCM
  // header + payload, the reference's actual blob type) synthesized
  // from doc_id parameters, parsed back by the chunk-walking wav codec
  // behind the decode seam; every 17th blob is truncated mid-header
  // and must route to decode_ok=false. The oracle recomputes the
  // expected header fields from the same id-derived parameters.
  private def q94(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = graft.multimodal.Multimodal
    val blobs = t(s, dir, "documents").filter($"doc_id" < 300)
      .select($"doc_id").as[Long]
      .map { id =>
        val rate = Array(8000, 16000, 22050, 44100)((id % 4).toInt)
        val w = m.syntheticWav(id, rate, 1 + (id % 2).toInt, 16,
          ((id % 100).toInt + 1) * 50)
        if (id % 17 == 0) w.copy(content = w.content.take(20)) else w
      }
    m.decodeWav(blobs).toDF()
      .select($"media_id", $"sample_rate", $"channels",
        $"bits_per_sample", $"data_bytes", $"duration_ms", $"decode_ok")
      .orderBy($"media_id")
  }
  private val q94Sql =
    """WITH p AS (
      | SELECT doc_id,
      |  CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |   WHEN 2 THEN 22050 ELSE 44100 END AS rate,
      |  1 + doc_id % 2 AS ch,
      |  (doc_id % 100 + 1) * 50 AS frames,
      |  doc_id % 17 = 0 AS bad
      | FROM documents WHERE doc_id < 300)
      |SELECT doc_id AS media_id,
      | CAST(CASE WHEN bad THEN -1 ELSE rate END AS INT) AS sample_rate,
      | CAST(CASE WHEN bad THEN -1 ELSE ch END AS INT) AS channels,
      | CAST(CASE WHEN bad THEN -1 ELSE 16 END AS INT) AS bits_per_sample,
      | CAST(CASE WHEN bad THEN -1 ELSE frames * ch * 2 END AS BIGINT)
      |   AS data_bytes,
      | CAST(CASE WHEN bad THEN -1 ELSE (frames * 1000) // rate END
      |   AS BIGINT) AS duration_ms,
      | NOT bad AS decode_ok
      |FROM p ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q95
  // BM25 ranked retrieval (Retrieval.bm25TopK): the lexical half of a
  // retrieval stack, as an inverted-index probe — postings for the
  // query terms only (isin pushed into the explode), map-side-combined
  // tf/df aggregates, broadcast stats, global TakeOrdered top-k.
  // Query terms span the df spectrum ('dup' is rare → high idf;
  // 'spark'/'window' are near-ubiquitous → idf ≈ 0) so the scoring
  // actually discriminates. Scores quantized to 6 decimals on both
  // engines BEFORE ranking.
  private def q95(s: SparkSession, dir: String): DataFrame =
    Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
      Seq("spark", "window", "dup"), k = 15)
  private val q95Sql =
    """WITH tk AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'),
      |    x -> len(x) > 0) AS toks
      | FROM documents),
      |d AS (SELECT doc_id, coalesce(len(toks), 0) AS dl, toks FROM tk),
      |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
      |p AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
      |f AS (SELECT doc_id, dl, term, count(*) AS tf FROM p
      | WHERE term IN ('spark', 'window', 'dup') GROUP BY 1, 2, 3),
      |dfs AS (SELECT term, count(*) AS df FROM f GROUP BY 1),
      |sc AS (SELECT doc_id,
      |  floor(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
      |      * tf * (1.2 + 1.0)
      |      / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)))
      |    * 1e6 + 0.5) / 1e6 AS score
      | FROM f JOIN dfs USING (term) CROSS JOIN st GROUP BY doc_id),
      |r AS (SELECT doc_id, score,
      |  row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM sc)
      |SELECT rank, doc_id, score FROM r WHERE rank <= 15
      |ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- q96
  // Temperature-balanced mixture sampling (Curation.temperatureMixture):
  // per-language weights n^α with α=0.5 up-weight the small languages
  // against the `en` head — the multilingual data-mixing rule — then a
  // budget is allocated by weight and admitted by the md5-keyed draw
  // (q81's mechanism). The admission cut is exact integer arithmetic
  // (u·nₛ < target·2³²), so both engines admit identical doc sets.
  private def q96(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Curation.temperatureMixture(t(s, dir, "documents"), "lang", "doc_id",
        budget = 200L, alpha = 0.5, seed = "mix96")
      .groupBy($"lang")
      .agg(count(lit(1)).as("kept"), min($"doc_id").as("first_doc"),
        max($"target").as("target"), max($"w").as("w"))
      .orderBy($"lang")
  }
  private val q96Sql =
    """WITH c AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY 1),
      |z AS (SELECT sum(pow(n_s, 0.5)) AS z FROM c),
      |pl AS (SELECT lang, n_s,
      |  floor(pow(n_s, 0.5) / z * 1e9 + 0.5) / 1e9 AS w
      | FROM c CROSS JOIN z),
      |p2 AS (SELECT lang, n_s, w,
      |  CAST(least(CAST(n_s AS DOUBLE), floor(200 * w)) AS BIGINT)
      |    AS target
      | FROM pl),
      |k AS (SELECT d.lang, d.doc_id, p.w, p.target, p.n_s,
      |  ('0x' || substr(md5('mix96:' || d.doc_id), 1, 8))::BIGINT AS u
      | FROM documents d JOIN p2 p USING (lang))
      |SELECT lang, count(*) AS kept, min(doc_id) AS first_doc,
      | max(target) AS target, max(w) AS w
      |FROM k WHERE u * n_s < target * 4294967296
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q97
  // Unicode NFC canonical composition (native codegen'd NfcNormalize,
  // SQL-registered as graft_nfc): decomposed "e"+U+0301 sequences
  // compose to "é" so downstream hash/shingle/token operators see ONE
  // canonical form. The decomposed input is built deterministically
  // from row data; char counts drop by exactly the composed pairs.
  private def q97(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = concat($"source", lit("-cafe"), lit("\u0301-"), $"lang")
    t(s, dir, "documents").filter($"doc_id" < 200)
      .select($"doc_id", length(dec).cast("long").as("raw_len"),
        Text.nfc(dec).as("nfc_str"),
        length(Text.nfc(dec)).cast("long").as("nfc_len"))
      .orderBy($"doc_id")
  }
  private val q97Sql =
    """WITH d AS (SELECT doc_id,
      |  source || '-cafe' || chr(769) || '-' || lang AS dec
      | FROM documents WHERE doc_id < 200)
      |SELECT doc_id, length(dec) AS raw_len,
      | nfc_normalize(dec) AS nfc_str,
      | length(nfc_normalize(dec)) AS nfc_len
      |FROM d ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q98
  // Mergeable quantile sketch (Spark's Greenwald–Khanna
  // percentile_approx): per-group price quantiles from ONE pass of
  // map-side-combined partial sketches — the constant-memory shape
  // that replaces a full sort at 100 TB. At the oracle SF the accuracy
  // parameter (10⁷) exceeds n, making the sketch EXACT (rank error
  // ≤ n/accuracy < 1), so DuckDB's quantile_disc hash-matches
  // element-for-element; production keeps the default accuracy and the
  // published ε·n rank bound.
  private def q98(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(percentile_approx($"l_extendedprice",
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)),
        lit(10000000)).as("qs"))
      .select($"l_returnflag", posexplode($"qs").as(Seq("pos", "q")))
      .select($"l_returnflag", ($"pos" + 1).cast("long").as("pos"), $"q")
      .orderBy($"l_returnflag", $"pos")
  }
  private val q98Sql =
    """WITH g AS (SELECT l_returnflag,
      |  quantile_disc(l_extendedprice, [0.25, 0.5, 0.75, 0.95]) AS qs
      | FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, CAST(i AS BIGINT) AS pos, qs[CAST(i AS INT)] AS q
      |FROM g, unnest(range(1, 5)) t(i)
      |ORDER BY l_returnflag, pos""".stripMargin

  // ---------------------------------------------------------------- q99
  // Bloom-pruned semi join (BloomJoin.bloomSemiJoin): customers with a
  // high-value order, pruned at the customer SCAN by a bloom over the
  // filtered orders' keys before the exact semi join removes false
  // positives — the manual runtime-filter shape. The oracle IS the
  // plain semi join: the bloom stage must be semantically invisible.
  private def q99(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = t(s, dir, "orders").filter($"o_totalprice" > 450000.0)
    BloomJoin.bloomSemiJoin(t(s, dir, "customer"), "c_custkey",
        big, "o_custkey")
      .select($"c_custkey", $"c_name", $"c_nationkey".cast("long")
        .as("c_nationkey"), $"c_acctbal")
      .orderBy($"c_custkey")
  }
  private val q99Sql =
    """SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
      | c_acctbal
      |FROM customer
      |WHERE c_custkey IN
      | (SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Deterministic event-time-ordered micro-batch drive, shared by
    * every streaming oracle query (q100/q107/q108/q111/q132/q133):
    * parquet slice files with PINNED ascending mtimes —
    * FileStreamSource replays oldest-mtime-first, so slice order IS
    * event-time order regardless of wall clock. One implementation so
    * the ordering/pinning logic can never drift between queries.
    */
  private final class SliceDrive(inDir: String) {
    private val mtimeBase = 60L * 60 * 1000 * 24 * 365 // order is all that matters
    private val pinned = scala.collection.mutable.Set[String]()
    def writeSlice(df: DataFrame, seq: Int): Unit = {
      df.coalesce(1).write.mode("append").parquet(inDir)
      new java.io.File(inDir).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          !pinned.contains(f.getName))
        .foreach { f =>
          f.setLastModified(mtimeBase + 60000L * seq); pinned += f.getName }
    }
  }

  /** Pin spark.sql.shuffle.partitions around a tiny-state streaming
    * run (the first run's checkpoint freezes state partitioning; 32
    * state-store commits per micro-batch would be the cost of
    * forgetting) and restore it after.
    */
  private def withShufflePartitions[T](s: SparkSession, n: Int)
      (body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  // ---------------------------------------------------------------- q100
  // Watermarked streaming tumbling windows under the oracle — the
  // streaming twin of q13, driven end to end: events arrive as 4 real
  // micro-batches (maxFilesPerTrigger=1) through Streams.tumbling in
  // APPEND mode (a window emits only once the watermark passes its
  // end) into a parquet sink. A far-future sentinel row then arrives
  // in a checkpoint-RESUMED second run, pushing the watermark past
  // every real window so the finalization batch flushes them all,
  // exactly once. The final sink must equal the batch group-by — the
  // oracle IS q13's SQL. Restart-across-checkpoint is the ST1/ST3
  // recovery contract exercised under the hash compare.
  private def q100(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q100").toString
    // a deterministic 20% slice of the stream: the semantics under
    // test (watermark emission, append exactness, restart-recovery)
    // are volume-independent, and the q13 batch twin already covers
    // the full table — same reasoning as q93's 4-batch trim
    val ev = t(s, dir, "events").filter(pmod($"event_id", lit(5)) === 0)
      .select($"ts", $"event_type", $"value")
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val cp = s"$tmp/cp"
    def run(): Unit = {
      // state partitioning is fixed by the FIRST run's checkpoint; the
      // window state here is thousands of rows, so 32 state-store
      // instances × 6 runs would be pure commit overhead (measured
      // 14 s → ~5 s at sf0.1 with 4). Restored after each run so the
      // batch queries keep the session setting.
      withShufflePartitions(s, 4) {
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
        val agg = graft.streaming.Streams.tumbling(stream, "ts",
          "event_type", "value")
        val q = agg.writeStream.outputMode("append")
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    // batches must advance in EVENT TIME (arrival ≈ event order, the
    // real stream shape): time slices whose file mtimes are PINNED
    // to an increasing sequence, because FileStreamSource replays
    // files oldest-mtime-first — so one run consumes them as ordered
    // micro-batches, deterministically, without relying on write
    // timing. Slices span ≫ the 2h watermark delay, so windows
    // straddling a slice boundary are still open when the next slice
    // arrives: nothing is ever late-dropped, and every window is
    // emitted exactly once.
    val drive = new SliceDrive(inDir)
    import drive.writeSlice
    val mm = ev.agg(min($"ts"), max($"ts")).head()
    val (lo, hi) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val mid = lo + (hi - lo) / 2
    writeSlice(ev.filter(unix_millis($"ts") < mid), 0)
    writeSlice(ev.filter(unix_millis($"ts") >= mid), 1)
    run()
    // sentinel, in a checkpoint-RESUMED second run: far past every
    // real timestamp — advances the watermark over every real window
    // so the finalization batch flushes them; its own (never-closed)
    // window cannot emit, and is filtered regardless
    writeSlice(s.range(1).select(
        lit(java.sql.Timestamp.valueOf("2031-01-01 00:00:00")).as("ts"),
        lit("__sentinel").as("event_type"), lit(0.0).as("value")), 2)
    run()
    s.read.parquet(outDir)
      .filter($"event_type" =!= "__sentinel")
      .select($"window_start", $"event_type", $"cnt",
        round($"sum_value", 2).as("sum_value"))
      .orderBy($"window_start", $"event_type")
  }
  // streaming final state ≡ batch windows over the same 20% slice
  private val q100Sql =
    """SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start, event_type,
      | count(*) AS cnt, round(sum(value), 2) AS sum_value
      |FROM events WHERE event_id % 5 = 0
      |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q101
  // Semi-structured ingestion on Spark 4's native VARIANT type — the
  // §1.3 "declared core + dynamic accretion" story without a fixed
  // schema: nested JSON (built deterministically from row data; every
  // 7th event DROPS its "m" object, simulating producer schema drift)
  // is parsed ONCE into variant's binary form, then typed paths are
  // extracted with variant_get / try_variant_get — drifted rows
  // surface as NULLs, not failures, and aggregate correctly. Variant
  // beats per-path get_json_object at scale: one parse per row
  // instead of one re-parse per extracted path (q49 is the
  // string-JSON twin). The oracle replays the same JSON construction
  // + extraction relationally in DuckDB.
  private def q101(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val k = get_json_object($"props", "$.k").cast("long")
    val j = concat(lit("{\"id\":"), $"event_id",
      when(pmod($"event_id", lit(7)) =!= 0,
        concat(lit(",\"m\":{\"k\":"), k,
          lit(",\"type\":\""), $"event_type", lit("\"}")))
        .otherwise(lit("")),
      lit(",\"tags\":[\"t"), pmod($"user_id", lit(3)), lit("\",\"x\"]}"))
    val v = parse_json(j)
    ev.select($"event_type",
        try_variant_get(v, "$.m.k", "long").as("mk"),
        variant_get(v, "$.tags[0]", "string").as("tag0"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"), sum($"mk").as("sum_k"),
        count(when($"tag0" === "t0", 1)).as("n_tag0"),
        count(when($"mk".isNull, 1)).as("n_drifted"))
      .orderBy($"event_type")
  }
  private val q101Sql =
    """WITH e AS (SELECT event_type, event_id, user_id,
      |  CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events),
      |j AS (SELECT event_type,
      |  '{"id":' || event_id ||
      |  CASE WHEN event_id % 7 <> 0
      |    THEN ',"m":{"k":' || k || ',"type":"' || event_type || '"}'
      |    ELSE '' END ||
      |  ',"tags":["t' || (user_id % 3) || '","x"]}' AS js FROM e)
      |SELECT event_type, count(*) AS cnt,
      | CAST(sum(CAST(json_extract(js, '$.m.k') AS BIGINT)) AS BIGINT)
      |   AS sum_k,
      | CAST(count(CASE WHEN json_extract_string(js, '$.tags[0]') = 't0'
      |   THEN 1 END) AS BIGINT) AS n_tag0,
      | CAST(count(CASE WHEN json_extract(js, '$.m.k') IS NULL
      |   THEN 1 END) AS BIGINT) AS n_drifted
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q102
  // Count-min heavy hitters (Sketches.cmsTable/cmsEstimate) — q82's
  // frequency twin under the same bound-oracle contract: per-language
  // slice sketches built in ONE token scan, merged counter-wise, point
  // frequency estimates for the exact top-10 terms checked against the
  // published CMS guarantee exact ≤ est ≤ exact + ε·N. The booleans
  // hash-match across engines while the estimates stay
  // engine-internal; slice-merge ≡ whole-scan is spec-pinned in
  // SketchesSpec. The two driver round-trips are bounded artifacts:
  // sketch bytes (fixed by ε/confidence) and the 10-term top-k.
  private def q102(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val eps = 0.0005
    val toks = t(s, dir, "documents")
      .select($"lang", explode(Retrieval.tokens($"text")).as("term"))
    val slices = Sketches.cmsTable(toks, Seq("lang"), "term", eps = eps)
    val exact = toks.groupBy($"term").agg(count(lit(1)).as("n_exact"))
    val top = exact.orderBy($"n_exact".desc, $"term").limit(10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val nTokens = exact.agg(sum($"n_exact")).head().getLong(0)
    val slack = math.ceil(eps * nTokens).toLong
    val est = Sketches.cmsEstimate(slices, top.map(_._1).toSeq)
    top.toSeq.map { case (t, ex) =>
      (t, ex, est(t) >= ex && est(t) <= ex + slack)
    }.toDF("term", "n_exact", "within_bound")
      .orderBy($"n_exact".desc, $"term")
  }
  private val q102Sql =
    """WITH tk AS (SELECT unnest(list_filter(
      |  string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS term
      | FROM documents),
      |c AS (SELECT term, count(*) AS n_exact FROM tk GROUP BY 1)
      |SELECT term, n_exact, TRUE AS within_bound FROM c
      |ORDER BY n_exact DESC, term LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q103
  // Incremental materialized-aggregate maintenance (IncrementalAgg):
  // a per-language rollup built from three append deltas — with batch
  // "b1" deliberately REPLAYED between b1 and b2 — must equal the
  // one-shot group-by over the union of the deltas. Each refresh
  // aggregates only its delta and re-aggregates against the
  // key-cardinality rollup (the corpus is never rescanned); the
  // replay is a no-op because the applied-batch list commits
  // atomically WITH the data in the same rename swap. Exactly-once
  // additive IVM, under the cross-engine hash compare.
  private def q103(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q103").toString
    val path = s"$tmp/rollup"
    val docs = t(s, dir, "documents")
    def slice(a: Long, b: Long) =
      docs.filter($"doc_id" >= a && $"doc_id" < b)
        .select($"lang", $"n_chars")
    def refresh(d: DataFrame, id: String) =
      IncrementalAgg.refreshAdditive(s, path, d, Seq("lang"),
        Seq("n_chars"), id)
    refresh(slice(0, 300), "b0")
    refresh(slice(300, 400), "b1")
    refresh(slice(300, 400), "b1")   // at-least-once replay: must no-op
    refresh(slice(400, 500), "b2")
    s.read.parquet(path)
      .select($"lang", $"n_rows", $"sum_n_chars")
      .orderBy($"lang")
  }
  private val q103Sql =
    """SELECT lang, count(*) AS n_rows,
      | CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
      |FROM documents WHERE doc_id < 500
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q104
  // CDC apply (Upsert.applyDiff) — q86's inverse, end to end: the
  // change feed q86 extracts (insert/update/delete ops) is applied
  // back onto the old snapshot with one delete-anti-join + one MERGE,
  // and must reproduce the new snapshot value-for-value — the oracle
  // IS the new snapshot. At scale this replays a CDC feed touching
  // only changed keys, never rescanning unchanged rows' content.
  private def q104(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select($"doc_id", $"lang", $"n_chars")
    val old = docs.filter($"doc_id" < 300)
    val nw = docs.filter($"doc_id" < 320 && pmod($"doc_id", lit(7)) =!= 0)
      .withColumn("n_chars",
        when(pmod($"doc_id", lit(5)) === 0, $"n_chars" + 10)
          .otherwise($"n_chars"))
    Upsert.applyDiff(old,
        Upsert.snapshotDiff(old, nw, Seq("doc_id")), Seq("doc_id"))
      .orderBy($"doc_id")
  }
  private val q104Sql =
    """SELECT doc_id, lang,
      | CASE WHEN doc_id % 5 = 0 THEN n_chars + 10 ELSE n_chars END
      |   AS n_chars
      |FROM documents WHERE doc_id < 320 AND doc_id % 7 <> 0
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q105
  // Round-7 refinery capstone: quality gate (q18's rounded scoring) →
  // temperature-balanced admission over the SURVIVORS' per-language
  // counts (q96's mixture, α=0.6 — weights adapt to what the gate
  // kept, not the raw corpus) → per-language token rollup. One corpus
  // scan feeds the gate; the mixture plan is a broadcast over
  // survivor counts; the rollup is a map-side-combined aggregate —
  // the whole refinery is gate-scan + tiny-broadcast + one shuffle.
  private def q105(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gated = t(s, dir, "documents")
      .withColumn("quality",
        floor(TextAnalysis.qualityScore($"text") * 10000.0 + 0.5) / 10000.0)
      .filter($"quality" >= 0.45)
      .withColumn("tokens", TextAnalysis.wsTokenCount($"text").cast("long"))
    Curation.temperatureMixture(gated, "lang", "doc_id",
        budget = 150L, alpha = 0.6, seed = "r7")
      .groupBy($"lang")
      .agg(count(lit(1)).as("kept"), sum($"tokens").as("sum_tokens"),
        min($"doc_id").as("first_doc"))
      .orderBy($"lang")
  }
  private def q105Sql: String = {
    val stopRe = s"\\b(${TextAnalysis.stopwords.mkString("|")})\\b"
    s"""WITH m AS (
       | SELECT doc_id, lang,
       |  CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS toks,
       |  CAST(len(regexp_extract_all(lower(text), '$stopRe')) AS DOUBLE)
       |    AS stop,
       |  CAST(len(list_distinct(regexp_extract_all(text, '\\S+')))
       |    AS DOUBLE) AS dist
       | FROM documents),
       |g AS (
       | SELECT doc_id, lang, CAST(toks AS BIGINT) AS tokens
       | FROM m
       | WHERE floor((CASE WHEN toks > 0 THEN
       |   least(1.0, toks / 100.0) * 0.4
       |   + least(1.0, stop * 5.0 / toks) * 0.3
       |   + (dist / toks) * 0.3 ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0
       |   >= 0.45),
       |c AS (SELECT lang, count(*) AS n_s FROM g GROUP BY 1),
       |z AS (SELECT sum(pow(n_s, 0.6)) AS z FROM c),
       |pl AS (SELECT lang, n_s,
       |  floor(pow(n_s, 0.6) / z * 1e9 + 0.5) / 1e9 AS w
       | FROM c CROSS JOIN z),
       |p2 AS (SELECT lang, n_s,
       |  CAST(least(CAST(n_s AS DOUBLE), floor(150 * w)) AS BIGINT)
       |    AS target
       | FROM pl),
       |k AS (SELECT g.lang, g.doc_id, g.tokens, p.target, p.n_s,
       |  ('0x' || substr(md5('r7:' || g.doc_id), 1, 8))::BIGINT AS u
       | FROM g JOIN p2 p USING (lang))
       |SELECT lang, count(*) AS kept,
       | CAST(sum(tokens) AS BIGINT) AS sum_tokens,
       | min(doc_id) AS first_doc
       |FROM k WHERE u * n_s < target * 4294967296
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- q106
  // Batch BM25 (Retrieval.bm25TopKBatch): three concurrent queries in
  // ONE corpus pass — the per-article fan-out of the reference's
  // related-articles loop. The batch's distinct term union prunes the
  // postings via a broadcast semi join BEFORE the tf shuffle; tf/df
  // are computed once and fan out to queries by a broadcast join on
  // term; per-query top-k is a candidate-sized window. Terms span the
  // df spectrum and OVERLAP across queries (q1/q3 share 'dup', q2/q3
  // share 'window') so the fan-out path is actually exercised.
  private def q106(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val queries = Seq(
      (1L, Seq("spark", "dup")),
      (2L, Seq("window", "shuffle")),
      (3L, Seq("dup", "window", "spark"))).toDF("query_id", "terms")
    Retrieval.bm25TopKBatch(t(s, dir, "documents"), "doc_id", "text",
        queries, "query_id", "terms", k = 10)
      .orderBy($"query_id", $"rank")
  }
  private val q106Sql =
    """WITH qt AS (SELECT DISTINCT query_id, term FROM (VALUES
      |  (1, 'spark'), (1, 'dup'),
      |  (2, 'window'), (2, 'shuffle'),
      |  (3, 'dup'), (3, 'window'), (3, 'spark')) AS v(query_id, term)),
      |tk AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'),
      |    x -> len(x) > 0) AS toks
      | FROM documents),
      |d AS (SELECT doc_id, coalesce(len(toks), 0) AS dl, toks FROM tk),
      |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
      |p AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
      |f AS (SELECT doc_id, dl, term, count(*) AS tf FROM p
      | WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2, 3),
      |dfs AS (SELECT term, count(*) AS df FROM f GROUP BY 1),
      |sc AS (SELECT query_id, doc_id,
      |  floor(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
      |      * tf * (1.2 + 1.0)
      |      / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)))
      |    * 1e6 + 0.5) / 1e6 AS score
      | FROM f JOIN qt USING (term) JOIN dfs USING (term) CROSS JOIN st
      | GROUP BY query_id, doc_id),
      |r AS (SELECT query_id, doc_id, score,
      |  row_number() OVER (PARTITION BY query_id
      |    ORDER BY score DESC, doc_id) AS rank FROM sc)
      |SELECT CAST(query_id AS BIGINT) AS query_id,
      | CAST(rank AS BIGINT) AS rank, doc_id, score
      |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q107
  // Stream-stream interval join (Streams.intervalJoin) under the
  // oracle: clicks attributed to purchases of the same user within a
  // trailing 6-hour window, replayed as deterministic event-time-
  // ordered micro-batches (q100's pinned-mtime technique — the two
  // time slices arrive as separate batches, so cross-slice matches
  // exercise real buffered join state, not single-batch luck). Both
  // sides carry 8-hour watermarks bounding the state; inner-join
  // matches emit in the batch they form, so no sentinel run is
  // needed. DuckDB folds the batch twin: a plain interval self-join.
  private def q107(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q107").toString
    val ev = t(s, dir, "events").filter($"user_id" < 30 &&
        ($"event_type" === "click" || $"event_type" === "purchase"))
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val cp = s"$tmp/cp"
    def run(): Unit = {
      withShufflePartitions(s, 4) {
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
        val joined = graft.streaming.Streams.intervalJoin(
            stream.filter($"event_type" === "click"),
            stream.filter($"event_type" === "purchase"),
            "user_id", "ts", lookback = "6 hours", watermark = "8 hours")
          .select(col("l.event_id").as("click_id"),
            col("r.event_id").as("purchase_id"),
            col("l.user_id").as("user_id"))
        val q = joined.writeStream.outputMode("append")
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    val drive = new SliceDrive(inDir)
    import drive.writeSlice
    val mm = ev.agg(min($"ts"), max($"ts")).head()
    val (lo, hi) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val mid = lo + (hi - lo) / 2
    writeSlice(ev.filter(unix_millis($"ts") < mid), 0)
    writeSlice(ev.filter(unix_millis($"ts") >= mid), 1)
    run()
    s.read.parquet(outDir).orderBy($"purchase_id", $"click_id")
      .select($"click_id", $"purchase_id", $"user_id")
  }
  private val q107Sql =
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
      | c.user_id AS user_id
      |FROM events c JOIN events p
      | ON c.user_id = p.user_id
      | AND c.ts::TIMESTAMP >= p.ts::TIMESTAMP - INTERVAL 6 HOUR
      | AND c.ts::TIMESTAMP <= p.ts::TIMESTAMP
      |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      | AND c.user_id < 30
      |ORDER BY purchase_id, click_id""".stripMargin

  // ---------------------------------------------------------------- q108
  // Custom sessionization state machine (Streams.sessionize,
  // flatMapGroupsWithState + event-time timeout) under the oracle:
  // 30-minute-gap sessions per user, driven as event-time-ordered
  // micro-batches; a far-future sentinel for a dummy user in a
  // checkpoint-RESUMED second run advances the watermark past every
  // real lastTs+gap so the timeout path closes the remaining open
  // sessions (q100's finalization trick — sessions broken by a LATER
  // event close inline during run 1, so both close paths are
  // exercised). Timestamps are second-truncated on BOTH engines: the
  // state machine folds millisecond longs, and second granularity
  // keeps the µs-vs-ms floor identity trivially exact. DuckDB folds
  // the batch twin: lag-gap breaks → running session ids → group.
  private def q108(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q108").toString
    val ev = t(s, dir, "events").filter($"user_id" < 25)
      .select($"user_id", date_trunc("second", $"ts").as("ts"), $"event_id")
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val cp = s"$tmp/cp"
    def run(): Unit = {
      withShufflePartitions(s, 4) {
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
        val sess = graft.streaming.Streams.sessionize(
          stream.as[graft.streaming.Streams.SessionEvent], gapMinutes = 30)
        val q = sess.toDF().writeStream.outputMode("append")
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    val drive = new SliceDrive(inDir)
    import drive.writeSlice
    val mm = ev.agg(min($"ts"), max($"ts")).head()
    val (lo, hi) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val mid = lo + (hi - lo) / 2
    writeSlice(ev.filter(unix_millis($"ts") < mid), 0)
    writeSlice(ev.filter(unix_millis($"ts") >= mid), 1)
    run()
    writeSlice(s.range(1).select(lit(-1L).as("user_id"),
      lit(java.sql.Timestamp.valueOf("2031-01-01 00:00:00")).as("ts"),
      lit(0L).as("event_id")), 2)
    run()
    s.read.parquet(outDir).filter($"user_id" >= 0)
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .orderBy($"user_id", $"session_start")
  }
  private val q108Sql =
    """WITH e AS (SELECT user_id,
      |  date_trunc('second', ts::TIMESTAMP) AS ts, event_id
      | FROM events WHERE user_id < 25),
      |s AS (SELECT user_id, ts, event_id,
      |  CASE WHEN lag(ts) OVER w IS NULL
      |    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |   THEN 1 ELSE 0 END AS brk
      | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |g AS (SELECT user_id, ts, brk,
      |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS sess
      | FROM s)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      | count(*) AS n_events
      |FROM g GROUP BY user_id, sess
      |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------- q109
  // Real image codec behind the multimodal decode seam (S4's blobs are
  // images): genuine PNG bytes (signature/IHDR/deflated IDAT/IEND, CRCs
  // intact — MultimodalSpec proves JDK ImageIO decodes them) parsed
  // partition-wise; every 9th blob is truncated mid-IDAT and must
  // route to decode_ok=false with sentinel metadata, not a task
  // failure. The oracle replays the deterministic (id → dims, id →
  // truncated) construction; idat_bytes is deflate-sized and so stays
  // spec-land (MultimodalSpec), not oracle-land.
  private def q109(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = graft.multimodal.Multimodal
    val blobs = t(s, dir, "documents").filter($"doc_id" < 250)
      .select($"doc_id").as[Long]
      .map { id =>
        val b = m.syntheticPng(id, 8 + (id % 13).toInt, 8 + (id % 7).toInt)
        if (id % 9 == 0)
          b.copy(content = java.util.Arrays.copyOf(b.content, 40))
        else b
      }
    m.decodePng(blobs).toDF()
      .select($"media_id", $"width", $"height", $"bit_depth",
        $"color_type", $"decode_ok")
      .orderBy($"media_id")
  }
  private val q109Sql =
    """SELECT doc_id AS media_id,
      | CAST(CASE WHEN doc_id % 9 = 0 THEN -1 ELSE 8 + doc_id % 13 END
      |   AS INT) AS width,
      | CAST(CASE WHEN doc_id % 9 = 0 THEN -1 ELSE 8 + doc_id % 7 END
      |   AS INT) AS height,
      | CAST(CASE WHEN doc_id % 9 = 0 THEN -1 ELSE 8 END AS INT)
      |   AS bit_depth,
      | CAST(CASE WHEN doc_id % 9 = 0 THEN -1 ELSE 2 END AS INT)
      |   AS color_type,
      | doc_id % 9 <> 0 AS decode_ok
      |FROM documents WHERE doc_id < 250 ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q110
  // Vietnamese word segmentation (G3's ViTokenizer step, previously
  // stood in by whitespace tokenization): greedy maximal matching
  // against the built-in compound lexicon, as the native codegen'd
  // ViSegment expression. Deterministic Vietnamese text is built from
  // row data (a word-pool cycle both engines replay); the oracle
  // re-implements the greedy longest-match walk as a recursive CTE
  // over the syllable lists with the SAME lexicon as literal IN-lists
  // — an independent second implementation, not a copy of the output.
  private def q110(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pool = q110Pool
    val poolArr = array(pool.map(lit): _*)
    val words = (0 until 12).map(i => element_at(poolArr,
      (pmod($"doc_id" * 3 + i * 5, lit(pool.length)) + 1).cast("int")))
    val text = concat_ws(" ", words: _*)
    t(s, dir, "documents").filter($"doc_id" < 200)
      .select($"doc_id", TextAnalysis.viSegment(text).as("w"))
      .select($"doc_id",
        array_join($"w", " ").as("seg"),
        size($"w").cast("long").as("n_words"),
        size(filter($"w", x => x.contains("_"))).cast("long")
          .as("n_compounds"))
      .orderBy($"doc_id")
  }
  private val q110Pool = Seq("việt nam", "học sinh", "thời gian",
    "máy tính", "rất", "tốt", "của", "và", "người", "đại học",
    "sách giáo khoa", "phát triển", "không", "mới")
  private def q110Sql: String = {
    val lex = TextAnalysis.viLexicon.map(_.trim.toLowerCase)
    def inList(n: Int) = lex.filter(_.split(' ').length == n)
      .map(w => s"'$w'").mkString(", ")
    val poolLit = q110Pool.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH RECURSIVE sy AS (
       | SELECT doc_id, flatten(list_transform(range(0, 12),
       |   i -> string_split($poolLit[
       |     CAST((doc_id * 3 + i * 5) % ${q110Pool.length} AS INT) + 1],
       |     ' '))) AS sy
       | FROM documents WHERE doc_id < 200),
       |walk AS (
       | SELECT doc_id, sy, 1 AS pos, '' AS seg FROM sy
       | UNION ALL
       | SELECT doc_id, sy, pos + step,
       |  seg || CASE WHEN seg = '' THEN '' ELSE ' ' END ||
       |   CASE step
       |    WHEN 3 THEN sy[pos] || '_' || sy[pos+1] || '_' || sy[pos+2]
       |    WHEN 2 THEN sy[pos] || '_' || sy[pos+1]
       |    ELSE sy[pos] END
       | FROM (
       |  SELECT doc_id, sy, pos, seg,
       |   CASE WHEN pos + 2 <= len(sy) AND lower(
       |      sy[pos] || ' ' || sy[pos+1] || ' ' || sy[pos+2])
       |      IN (${inList(3)}) THEN 3
       |    WHEN pos + 1 <= len(sy) AND lower(sy[pos] || ' ' || sy[pos+1])
       |      IN (${inList(2)}) THEN 2
       |    ELSE 1 END AS step
       |  FROM walk WHERE pos <= len(sy)) t)
       |SELECT doc_id, seg,
       | CAST(len(string_split(seg, ' ')) AS BIGINT) AS n_words,
       | CAST(len(list_filter(string_split(seg, ' '),
       |   x -> contains(x, '_'))) AS BIGINT) AS n_compounds
       |FROM walk WHERE pos > len(sy)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q111
  // Streaming refinery capstone: the ingest loop a 100 TB training-data
  // pipeline actually runs, as ONE streaming job under the oracle —
  // each micro-batch (doc_id-ordered slices, q100's pinned-mtime
  // technique; the last slice is all exact duplicates of earlier docs)
  // dedups against the PERSISTED fingerprint index (first occurrence
  // wins, one index anti-join — the corpus is never re-fingerprinted),
  // quality-gates the fresh docs, folds (lang, tokens) into the
  // standing rollup via IncrementalAgg's exactly-once batch protocol,
  // and appends its fingerprints so later batches see them. Composes
  // q21 (exact dedup) + q80's incremental-index shape + q18 (quality)
  // + q103 (exactly-once IVM) end to end. DuckDB folds the whole
  // stream: global first-occurrence dedup → gate → group-by.
  private def q111(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q111").toString
    val base = t(s, dir, "documents").select($"doc_id", $"text", $"lang")
    val dups = base.filter($"doc_id" < 100)
      .select(($"doc_id" + 10000000L).as("doc_id"), $"text", $"lang")
    val inDir = s"$tmp/in"; val idx = s"$tmp/idx"
    val roll = s"$tmp/roll"; val cp = s"$tmp/cp"
    val drive = new SliceDrive(inDir)
    import drive.writeSlice
    writeSlice(base.filter($"doc_id" < 250), 0)
    writeSlice(base.filter($"doc_id" >= 250), 1)
    writeSlice(dups, 2)
    val sink: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
               Long) => Unit = (batch, id) => {
      val sp = batch.sparkSession
      import org.apache.spark.sql.expressions.Window
      val fp = batch.toDF()
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      // first occurrence WITHIN the batch (min doc_id per fingerprint)
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      val firstHere = fp.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      val fs = Staging.fsOf(sp, idx)
      val known =
        if (fs.exists(new org.apache.hadoop.fs.Path(idx)))
          sp.read.parquet(idx)
        else firstHere.select(col("fp")).limit(0)
      // ...and not already in the persisted index (ONE anti-join; the
      // prior corpus is never re-fingerprinted)
      val fresh = graft.operators.Materialize(
        firstHere.join(known, Seq("fp"), "left_anti"))
      val gated = fresh
        .withColumn("q",
          floor(TextAnalysis.qualityScore(col("text")) * 10000.0 + 0.5)
            / 10000.0)
        .filter(col("q") >= 0.45)
        .select(col("lang"),
          TextAnalysis.wsTokenCount(col("text")).cast("long").as("tokens"))
      IncrementalAgg.refreshAdditive(sp, roll, gated,
        Seq("lang"), Seq("tokens"), s"b$id")
      fresh.select(col("fp")).write
        .mode(org.apache.spark.sql.SaveMode.Append).parquet(idx)
    }
    withShufflePartitions(s, 4) {
      val q = s.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(roll)
      .select($"lang", $"n_rows", $"sum_tokens")
      .orderBy($"lang")
  }
  private def q111Sql: String = {
    val stopRe = s"\\b(${TextAnalysis.stopwords.mkString("|")})\\b"
    s"""WITH u AS (
       | SELECT doc_id, text, lang FROM documents
       | UNION ALL
       | SELECT doc_id + 10000000, text, lang FROM documents
       | WHERE doc_id < 100),
       |f AS (SELECT doc_id, text, lang,
       |  md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
       | FROM u),
       |k AS (SELECT doc_id, text, lang FROM f
       | QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
       |m AS (SELECT lang,
       |  CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS toks,
       |  CAST(len(regexp_extract_all(lower(text), '$stopRe')) AS DOUBLE)
       |    AS stop,
       |  CAST(len(list_distinct(regexp_extract_all(text, '\\S+')))
       |    AS DOUBLE) AS dist
       | FROM k),
       |g AS (SELECT lang, CAST(toks AS BIGINT) AS tokens FROM m
       | WHERE floor((CASE WHEN toks > 0 THEN
       |   least(1.0, toks / 100.0) * 0.4
       |   + least(1.0, stop * 5.0 / toks) * 0.3
       |   + (dist / toks) * 0.3 ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0
       |   >= 0.45)
       |SELECT lang, count(*) AS n_rows,
       | CAST(sum(tokens) AS BIGINT) AS sum_tokens
       |FROM g GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- q112
  // SemDeDup semantic deduplication (Similarity.semanticDedup): docs
  // whose EMBEDDINGS are near-identical are redundant even when the
  // text differs — the embedding-space counterpart of q79's lexical
  // capstone. Exact mode (bits = 0, q47's contract) so DuckDB can
  // replay the candidate set; the oracle folds all-pairs cosine ≥ τ →
  // recursive-CTE component closure → min-id survivors (q79's closure
  // shape over vectors). The LSH-bucketed production mode shares this
  // composition tail and stays recall-pinned in VectorSimilaritySpec.
  private def q112(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "embeddings").filter($"vec_id" < 200)
      .select($"vec_id", $"embedding", $"label")
    val emb = base.unionByName(base.filter($"vec_id" < 50)
      .select(($"vec_id" + 10000000L).as("vec_id"), $"embedding", $"label"))
    Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.8, dim = 64, bits = 0)
      .select($"vec_id", $"label".cast("long").as("label"))
      .orderBy($"vec_id")
  }
  private val q112Sql =
    """WITH RECURSIVE e AS (
      | SELECT vec_id, embedding::DOUBLE[] AS v, label
      |  FROM embeddings WHERE vec_id < 200
      | UNION ALL
      | SELECT vec_id + 10000000, embedding::DOUBLE[], label
      |  FROM embeddings WHERE vec_id < 50),
      |p AS (
      | SELECT a.vec_id AS id_a, b.vec_id AS id_b
      | FROM e a JOIN e b ON a.vec_id < b.vec_id
      | WHERE list_dot_product(a.v, b.v)
      |   / (sqrt(list_dot_product(a.v, a.v))
      |    * sqrt(list_dot_product(b.v, b.v))) > 0.8),
      |edges AS (
      | SELECT id_a AS src, id_b AS dst FROM p
      | UNION ALL
      | SELECT id_b, id_a FROM p),
      |walk AS (
      | SELECT src AS id, src AS reach FROM edges
      | UNION
      | SELECT w.id, x.dst FROM walk w JOIN edges x ON w.reach = x.src),
      |losers AS (
      | SELECT id FROM walk GROUP BY id HAVING id <> min(reach))
      |SELECT vec_id, CAST(label AS BIGINT) AS label FROM e
      |WHERE vec_id NOT IN (SELECT id FROM losers)
      |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q113
  // SQ8 scalar-quantized ANN (Similarity.sq8Encode/sq8TopK): the 4×
  // compression point between flat float32 and PQ's ~32×. No trained
  // codebook — encode is a pure per-row expression, so the WHOLE
  // encode→reconstruct→rank path is deterministic and the oracle
  // replays it value-for-value (no exhaustive-mode or fitted-literal
  // tricks needed): per-vector (lo, scale), code = floor((x−lo)/scale
  // + 0.5), reconstruct lo + code·scale, cosine vs the raw queries.
  private def q113(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val codes = Similarity.sq8Encode(emb, "vec_id", "embedding")
    Similarity.sq8TopK(emb.filter($"vec_id" < 10), codes,
        "vec_id", "embedding", k = 5)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  private val q113Sql =
    """WITH c AS (SELECT vec_id AS c_id,
      |  embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (SELECT c_id, v, list_min(v) AS lo,
      |  (list_max(v) - list_min(v)) / 255.0 AS sc
      | FROM c),
      |r AS (SELECT c_id,
      |  CASE WHEN sc > 0
      |   THEN list_transform(v, x -> lo + floor((x - lo) / sc + 0.5) * sc)
      |   ELSE list_transform(v, x -> lo) END AS cv
      | FROM s),
      |q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
      | FROM embeddings WHERE vec_id < 10),
      |sc2 AS (
      | SELECT q_id, c_id,
      |  list_dot_product(qv, cv)
      |   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
      |   AS sim
      | FROM q, r WHERE q_id <> c_id),
      |rk AS (SELECT q_id, c_id, sim,
      | row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id)
      |   AS rank
      | FROM sc2)
      |SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id,
      | round(sim, 6) AS sim
      |FROM rk WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- q114
  // Length-sorted batch packing (Curation.paddedBatchStats): fixed-size
  // inference/training batches pad to the batch max, so arrival-order
  // batching wastes n·max − sum tokens per batch; length-sorting makes
  // batches homogeneous and collapses the waste. The query totals both
  // orderings over the same corpus — the sorted mode must dominate —
  // and DuckDB replays the window arithmetic exactly.
  private def q114(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
      .select($"doc_id",
        TextAnalysis.wsTokenCount($"text").cast("long").as("tokens"))
    def totals(sorted: Boolean, mode: String) =
      Curation.paddedBatchStats(docs, "doc_id", "tokens",
          batchSize = 32, sorted = sorted)
        .agg(count(lit(1)).as("n_batches"),
          sum($"pad_tokens").as("pad_tokens"),
          sum($"n_docs" * $"max_tokens").as("padded_tokens"))
        .select(lit(mode).as("mode"), $"n_batches", $"pad_tokens",
          $"padded_tokens")
    totals(sorted = true, "length_sorted")
      .unionByName(totals(sorted = false, "arrival"))
      .orderBy($"mode")
  }
  private val q114Sql =
    """WITH d AS (SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tokens
      | FROM documents),
      |srt AS (SELECT tokens,
      |  (row_number() OVER (ORDER BY tokens, doc_id) - 1) // 32 AS batch_id
      | FROM d),
      |arr AS (SELECT tokens,
      |  (row_number() OVER (ORDER BY doc_id) - 1) // 32 AS batch_id
      | FROM d),
      |sb AS (SELECT batch_id, count(*) AS n, max(tokens) AS mx,
      |  sum(tokens) AS sm FROM srt GROUP BY 1),
      |ab AS (SELECT batch_id, count(*) AS n, max(tokens) AS mx,
      |  sum(tokens) AS sm FROM arr GROUP BY 1)
      |SELECT 'arrival' AS mode, count(*) AS n_batches,
      | CAST(sum(n * mx - sm) AS BIGINT) AS pad_tokens,
      | CAST(sum(n * mx) AS BIGINT) AS padded_tokens
      |FROM ab
      |UNION ALL
      |SELECT 'length_sorted', count(*),
      | CAST(sum(n * mx - sm) AS BIGINT), CAST(sum(n * mx) AS BIGINT)
      |FROM sb
      |ORDER BY mode""".stripMargin

  // ---------------------------------------------------------------- q115
  // Hybrid retrieval by reciprocal-rank fusion (Retrieval.rrfFuse):
  // the BM25 arm and an independent token-Jaccard arm rank the same
  // query batch; fusion happens in RANK space (1/(60+rank) per arm),
  // so incomparable score scales combine without calibration — the
  // hybrid-search shape of modern vector stores, on the engine's own
  // operators. DuckDB replays both arms and the fusion arithmetic.
  private def q115(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val queries = Seq(
      (1L, Seq("spark", "dup")),
      (2L, Seq("window", "shuffle")),
      (3L, Seq("dup", "window", "spark"))).toDF("query_id", "terms")
    val docs = t(s, dir, "documents")
    val bm = Retrieval.bm25TopKBatch(docs, "doc_id", "text",
      queries, "query_id", "terms", k = 20)
    val ja = Retrieval.tokenJaccardTopK(docs, "doc_id", "text",
      queries, "query_id", "terms", k = 20)
    Retrieval.rrfFuse(Seq(
        bm.select($"query_id", $"doc_id", $"rank"),
        ja.select($"query_id", $"doc_id", $"rank")), rrfK = 60, k = 10)
      .orderBy($"query_id", $"rank")
  }
  private val q115Sql =
    """WITH qt AS (SELECT DISTINCT query_id, term FROM (VALUES
      |  (1, 'spark'), (1, 'dup'),
      |  (2, 'window'), (2, 'shuffle'),
      |  (3, 'dup'), (3, 'window'), (3, 'spark')) AS v(query_id, term)),
      |tk AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'),
      |    x -> len(x) > 0) AS toks
      | FROM documents),
      |d AS (SELECT doc_id, coalesce(len(toks), 0) AS dl, toks FROM tk),
      |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
      |p AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
      |f AS (SELECT doc_id, dl, term, count(*) AS tf FROM p
      | WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2, 3),
      |dfs AS (SELECT term, count(*) AS df FROM f GROUP BY 1),
      |bm AS (SELECT query_id, doc_id,
      |  floor(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
      |      * tf * (1.2 + 1.0)
      |      / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)))
      |    * 1e6 + 0.5) / 1e6 AS score
      | FROM f JOIN qt USING (term) JOIN dfs USING (term) CROSS JOIN st
      | GROUP BY query_id, doc_id),
      |bma AS (SELECT query_id, doc_id, rank FROM (
      |  SELECT query_id, doc_id,
      |   row_number() OVER (PARTITION BY query_id
      |     ORDER BY score DESC, doc_id) AS rank FROM bm) WHERE rank <= 20),
      |ds AS (SELECT doc_id, len(list_distinct(toks)) AS d_n FROM tk),
      |qs AS (SELECT query_id, count(*) AS q_n FROM qt GROUP BY 1),
      |it AS (SELECT query_id, doc_id, count(*) AS inter
      | FROM (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM tk) p2
      | JOIN qt USING (term) GROUP BY 1, 2),
      |ja AS (SELECT query_id, doc_id,
      |  floor(inter / (q_n + d_n - inter) * 1e6 + 0.5) / 1e6 AS score
      | FROM it JOIN qs USING (query_id) JOIN ds USING (doc_id)),
      |jaa AS (SELECT query_id, doc_id, rank FROM (
      |  SELECT query_id, doc_id,
      |   row_number() OVER (PARTITION BY query_id
      |     ORDER BY score DESC, doc_id) AS rank FROM ja) WHERE rank <= 20),
      |u AS (SELECT query_id, doc_id, 1.0 / (60 + rank) AS part FROM bma
      | UNION ALL
      | SELECT query_id, doc_id, 1.0 / (60 + rank) FROM jaa),
      |fs AS (SELECT query_id, doc_id,
      |  floor(sum(part) * 1e9 + 0.5) / 1e9 AS score
      | FROM u GROUP BY 1, 2),
      |fr AS (SELECT query_id, doc_id, score,
      |  row_number() OVER (PARTITION BY query_id
      |    ORDER BY score DESC, doc_id) AS rank FROM fs)
      |SELECT CAST(query_id AS BIGINT) AS query_id,
      | CAST(rank AS BIGINT) AS rank, doc_id, score
      |FROM fr WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q116
  // BM25 served from a PERSISTED postings index (Retrieval.
  // buildBm25Index → parquet under a term-keyed layout → reload →
  // bm25FromIndex): the corpus is tokenized ONCE at build time and
  // every later query batch probes the index with zero corpus scans —
  // the lexical twin of the persisted ANN/dedup indexes. The round
  // trip through parquet is part of the query; the oracle computes the
  // same ranking from scratch, so index build + persistence + serving
  // must together be value-identical to direct evaluation.
  private def q116(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q116").toString
    val (post, stats) = Retrieval.buildBm25Index(
      t(s, dir, "documents"), "doc_id", "text")
    Layout.byKey(post, "term", 4, "doc_id")
      .write.mode("overwrite").parquet(s"$tmp/postings")
    stats.write.mode("overwrite").parquet(s"$tmp/stats")
    val queries = Seq(
      (1L, Seq("spark", "window")),
      (2L, Seq("dup", "shuffle"))).toDF("query_id", "terms")
    Retrieval.bm25FromIndex(
        s.read.parquet(s"$tmp/postings"), s.read.parquet(s"$tmp/stats"),
        queries, "query_id", "terms", k = 8)
      .orderBy($"query_id", $"rank")
  }
  private val q116Sql =
    """WITH qt AS (SELECT DISTINCT query_id, term FROM (VALUES
      |  (1, 'spark'), (1, 'window'),
      |  (2, 'dup'), (2, 'shuffle')) AS v(query_id, term)),
      |tk AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'),
      |    x -> len(x) > 0) AS toks
      | FROM documents),
      |d AS (SELECT doc_id, coalesce(len(toks), 0) AS dl, toks FROM tk),
      |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
      |p AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
      |f AS (SELECT doc_id, dl, term, count(*) AS tf FROM p
      | WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2, 3),
      |dfs AS (SELECT term, count(*) AS df FROM f GROUP BY 1),
      |sc AS (SELECT query_id, doc_id,
      |  floor(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
      |      * tf * (1.2 + 1.0)
      |      / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)))
      |    * 1e6 + 0.5) / 1e6 AS score
      | FROM f JOIN qt USING (term) JOIN dfs USING (term) CROSS JOIN st
      | GROUP BY query_id, doc_id),
      |r AS (SELECT query_id, doc_id, score,
      |  row_number() OVER (PARTITION BY query_id
      |    ORDER BY score DESC, doc_id) AS rank FROM sc)
      |SELECT CAST(query_id AS BIGINT) AS query_id,
      | CAST(rank AS BIGINT) AS rank, doc_id, score
      |FROM r WHERE rank <= 8 ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q117
  // Full BM25 index LIFECYCLE under the oracle: build → persist →
  // delete (every-7th doc leaves, Retrieval.deleteFromBm25Index's
  // anti-join + additive stats decrement) → in-place update of three
  // surviving docs (Retrieval.updateBm25Index, the reference's $set
  // rewrite shape, summarize_utils.py:84-88) → persist again → serve.
  // The oracle computes the SAME ranking from scratch over the final
  // corpus (documents minus deleted, with updated texts substituted),
  // so delete/update maintenance must be value-identical to a rebuild
  // — the lexical twin of the ANN index's append/delete lifecycle.
  private def q117(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q117").toString
    val docs = t(s, dir, "documents")
    val (post, stats) = Retrieval.buildBm25Index(docs, "doc_id", "text")
    Layout.byKey(post, "term", 4, "doc_id")
      .write.mode("overwrite").parquet(s"$tmp/postings")
    stats.write.mode("overwrite").parquet(s"$tmp/stats")
    val deleted = docs.select($"doc_id").filter($"doc_id" % 7 === 3)
    val (p1, s1) = Retrieval.deleteFromBm25Index(
      s.read.parquet(s"$tmp/postings"), s.read.parquet(s"$tmp/stats"),
      deleted, "doc_id")
    val updated = Seq(
      (4L, "spark shuffle window dup spark"),
      (8L, "window dup dup"),
      (12L, "spark spark shuffle")).toDF("doc_id", "text")
    val (p2, s2) = Retrieval.updateBm25Index(p1, s1, updated,
      "doc_id", "text")
    Layout.byKey(p2, "term", 4, "doc_id")
      .write.mode("overwrite").parquet(s"$tmp/postings2")
    s2.write.mode("overwrite").parquet(s"$tmp/stats2")
    val queries = Seq(
      (1L, Seq("spark", "window")),
      (2L, Seq("dup", "shuffle"))).toDF("query_id", "terms")
    Retrieval.bm25FromIndex(
        s.read.parquet(s"$tmp/postings2"), s.read.parquet(s"$tmp/stats2"),
        queries, "query_id", "terms", k = 8)
      .orderBy($"query_id", $"rank")
  }
  private val q117Sql =
    """WITH qt AS (SELECT DISTINCT query_id, term FROM (VALUES
      |  (1, 'spark'), (1, 'window'),
      |  (2, 'dup'), (2, 'shuffle')) AS v(query_id, term)),
      |upd AS (SELECT * FROM (VALUES
      |  (4, 'spark shuffle window dup spark'),
      |  (8, 'window dup dup'),
      |  (12, 'spark spark shuffle')) AS u(doc_id, text)),
      |corpus AS (SELECT d.doc_id, coalesce(u.text, d.text) AS text
      | FROM documents d LEFT JOIN upd u ON d.doc_id = u.doc_id
      | WHERE d.doc_id % 7 <> 3),
      |tk AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'),
      |    x -> len(x) > 0) AS toks
      | FROM corpus),
      |d AS (SELECT doc_id, coalesce(len(toks), 0) AS dl, toks FROM tk),
      |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
      |p AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
      |f AS (SELECT doc_id, dl, term, count(*) AS tf FROM p
      | WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2, 3),
      |dfs AS (SELECT term, count(*) AS df FROM f GROUP BY 1),
      |sc AS (SELECT query_id, doc_id,
      |  floor(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
      |      * tf * (1.2 + 1.0)
      |      / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)))
      |    * 1e6 + 0.5) / 1e6 AS score
      | FROM f JOIN qt USING (term) JOIN dfs USING (term) CROSS JOIN st
      | GROUP BY query_id, doc_id),
      |r AS (SELECT query_id, doc_id, score,
      |  row_number() OVER (PARTITION BY query_id
      |    ORDER BY score DESC, doc_id) AS rank FROM sc)
      |SELECT CAST(query_id AS BIGINT) AS query_id,
      | CAST(rank AS BIGINT) AS rank, doc_id, score
      |FROM r WHERE rank <= 8 ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q118
  // Hybrid LEXICAL + VECTOR retrieval — the reference's actual
  // related-articles shape (get_relevant_articles.py:64-88 ranks by
  // vector similarity; the BM25 arm is the lexical complement): an
  // index-served BM25 arm (Retrieval.bm25FromIndex over a persisted
  // postings index) fuses with an SQ8 scalar-quantized ANN arm
  // (Similarity.sq8TopK — deterministic encode→reconstruct→rank, the
  // q113 contract) via reciprocal-rank fusion in RANK space. Query ids
  // double as vec ids (the batch's docs ARE its query vectors), so
  // both arms key on the same (query_id, doc_id) and DuckDB replays
  // both arms AND the fusion arithmetic value-for-value.
  private def q118(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q118").toString
    val docs = t(s, dir, "documents")
    val (post, stats) = Retrieval.buildBm25Index(docs, "doc_id", "text")
    Layout.byKey(post, "term", 4, "doc_id")
      .write.mode("overwrite").parquet(s"$tmp/postings")
    stats.write.mode("overwrite").parquet(s"$tmp/stats")
    val queries = Seq(
      (3L, Seq("spark", "window")),
      (7L, Seq("dup", "shuffle"))).toDF("query_id", "terms")
    val lex = Retrieval.bm25FromIndex(
      s.read.parquet(s"$tmp/postings"), s.read.parquet(s"$tmp/stats"),
      queries, "query_id", "terms", k = 20)
    val emb = t(s, dir, "embeddings")
    val codes = Similarity.sq8Encode(emb, "vec_id", "embedding")
    val vec = Similarity.sq8TopK(emb.filter($"vec_id".isin(3L, 7L)),
        codes, "vec_id", "embedding", k = 20)
      .select($"q_id".as("query_id"), $"c_id".as("doc_id"), $"rank")
    Retrieval.rrfFuse(Seq(
        lex.select($"query_id", $"doc_id", $"rank"), vec),
        rrfK = 60, k = 10)
      .orderBy($"query_id", $"rank")
  }
  private val q118Sql =
    """WITH qt AS (SELECT DISTINCT query_id, term FROM (VALUES
      |  (3, 'spark'), (3, 'window'),
      |  (7, 'dup'), (7, 'shuffle')) AS v(query_id, term)),
      |tk AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'),
      |    x -> len(x) > 0) AS toks
      | FROM documents),
      |d AS (SELECT doc_id, coalesce(len(toks), 0) AS dl, toks FROM tk),
      |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
      |p AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
      |f AS (SELECT doc_id, dl, term, count(*) AS tf FROM p
      | WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2, 3),
      |dfs AS (SELECT term, count(*) AS df FROM f GROUP BY 1),
      |bm AS (SELECT query_id, doc_id,
      |  floor(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
      |      * tf * (1.2 + 1.0)
      |      / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)))
      |    * 1e6 + 0.5) / 1e6 AS score
      | FROM f JOIN qt USING (term) JOIN dfs USING (term) CROSS JOIN st
      | GROUP BY query_id, doc_id),
      |bma AS (SELECT query_id, doc_id, rank FROM (
      |  SELECT query_id, doc_id,
      |   row_number() OVER (PARTITION BY query_id
      |     ORDER BY score DESC, doc_id) AS rank FROM bm) WHERE rank <= 20),
      |cv AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS v
      | FROM embeddings),
      |sq AS (SELECT c_id, v, list_min(v) AS lo,
      |  (list_max(v) - list_min(v)) / 255.0 AS sc FROM cv),
      |rc AS (SELECT c_id,
      |  CASE WHEN sc > 0
      |   THEN list_transform(v, x -> lo + floor((x - lo) / sc + 0.5) * sc)
      |   ELSE list_transform(v, x -> lo) END AS cvv
      | FROM sq),
      |qv AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qvec
      | FROM embeddings WHERE vec_id IN (3, 7)),
      |vs AS (SELECT q_id, c_id,
      |  list_dot_product(qvec, cvv)
      |   / (sqrt(list_dot_product(qvec, qvec))
      |      * sqrt(list_dot_product(cvv, cvv))) AS sim
      | FROM qv, rc WHERE q_id <> c_id),
      |vra AS (SELECT q_id AS query_id, c_id AS doc_id, rank FROM (
      |  SELECT q_id, c_id,
      |   row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id)
      |     AS rank FROM vs) WHERE rank <= 20),
      |u AS (SELECT query_id, doc_id, 1.0 / (60 + rank) AS part FROM bma
      | UNION ALL
      | SELECT query_id, doc_id, 1.0 / (60 + rank) FROM vra),
      |fs AS (SELECT query_id, doc_id,
      |  floor(sum(part) * 1e9 + 0.5) / 1e9 AS score
      | FROM u GROUP BY 1, 2),
      |fr AS (SELECT query_id, doc_id, score,
      |  row_number() OVER (PARTITION BY query_id
      |    ORDER BY score DESC, doc_id) AS rank FROM fs)
      |SELECT CAST(query_id AS BIGINT) AS query_id,
      | CAST(rank AS BIGINT) AS rank, doc_id, score
      |FROM fr WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q119
  // Frozen-vocab BPE token counting (TextAnalysis.bpePieceCount): a
  // REAL merge-table byte-pair tokenizer over the committed 60-merge
  // toy vocab, replacing the 4-char-run proxy for budget-accurate
  // counts (the reference budgets chunks by its HF tokenizer's piece
  // count, chunk_splitter.py:52-62). All scan-side codegen'd string
  // functions; the oracle SQL is GENERATED from the same frozen merge
  // table, so DuckDB replays the merge algorithm itself.
  private def q119(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select($"doc_id",
        TextAnalysis.bpePieceCount($"text").cast("long").as("bpe_tokens"),
        TextAnalysis.wsTokenCount($"text").cast("long").as("ws_tokens"))
      .orderBy($"doc_id")
  }
  private val q119Sql = {
    val m = TextAnalysis.bpePieceCountSql("text")
    s"""WITH b AS (SELECT doc_id, text, $m AS s FROM documents)
       |SELECT doc_id,
       | CAST(len(s) - len(replace(s, '<', '')) AS BIGINT) AS bpe_tokens,
       | CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens
       |FROM b ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q120
  // SemDeDup, k-means-bucketed (Similarity.semanticDedupIvf): the
  // paper's actual candidate generator — compare only within a fitted
  // IvfModel's cells (nprobe = 1; Abbas et al. §2). Unlike q112's
  // exact mode, the BUCKETED algorithm itself is under the oracle
  // here: the fitted centroids become FROZEN literals in generated
  // SQL (the q76 fitted-model pattern), DuckDB re-derives each
  // vector's cell with the same left-assoc squared-L2 chains +
  // first-minimum argmin the NearestCells kernel runs, restricts
  // candidate pairs to shared cells, exact-cosine-verifies, walks the
  // closure, and keeps min-id survivors.
  private val ivfDedupModels =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.IvfModel]
  @volatile private var lastIvfDedupDir: Option[String] = None
  private def q120(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "embeddings").filter($"vec_id" < 200)
      .select($"vec_id", $"embedding", $"label")
    val emb = base.unionByName(base.filter($"vec_id" < 50)
      .select(($"vec_id" + 10000000L).as("vec_id"), $"embedding", $"label"))
    val model = ivfDedupModels.getOrElseUpdate(dir,
      Similarity.fitIvf(emb, "embedding", nlist = 8))
    lastIvfDedupDir = Some(dir)
    Similarity.semanticDedupIvf(emb, "vec_id", "embedding",
        threshold = 0.8, model, nprobe = 1)
      .select($"vec_id", $"label".cast("long").as("label"))
      .orderBy($"vec_id")
  }

  /** q120's oracle, generated from the centroids fitted by the LAST
    * q120 run (None until q120 has run in this JVM — Verify's
    * run-then-dump order guarantees it has, like q76).
    */
  private[queries] def q120SqlNow: Option[String] =
    lastIvfDedupDir.flatMap(ivfDedupModels.get).map(q120SqlFor)

  private def q120SqlFor(model: Similarity.IvfModel): String = {
    def dd(x: Double) = java.lang.Double.toString(x)
    // per-cell squared-L2 as a left-assoc `+` chain — bit-equal to
    // VectorKernels.nearestCells' ascending-index fold; argmin by
    // list_position(dc, list_min(dc)) = first strict minimum, the
    // kernel's tie-break
    val chains = model.centroids.map { cent =>
      cent.zipWithIndex.map { case (x, i) =>
        s"(v[${i + 1}]-(${dd(x)}))*(v[${i + 1}]-(${dd(x)}))"
      }.mkString("+")
    }
    s"""WITH RECURSIVE e AS (
       | SELECT vec_id, embedding::DOUBLE[] AS v, label
       |  FROM embeddings WHERE vec_id < 200
       | UNION ALL
       | SELECT vec_id + 10000000, embedding::DOUBLE[], label
       |  FROM embeddings WHERE vec_id < 50),
       |d AS (SELECT vec_id, v, label,
       |  [${chains.mkString(",\n   ")}] AS dc
       | FROM e),
       |c AS (SELECT vec_id, v, label,
       |  list_position(dc, list_min(dc)) AS cell FROM d),
       |p AS (
       | SELECT a.vec_id AS id_a, b.vec_id AS id_b
       | FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id < b.vec_id
       | WHERE list_dot_product(a.v, b.v)
       |   / (sqrt(list_dot_product(a.v, a.v))
       |    * sqrt(list_dot_product(b.v, b.v))) > 0.8),
       |edges AS (
       | SELECT id_a AS src, id_b AS dst FROM p
       | UNION ALL
       | SELECT id_b, id_a FROM p),
       |walk AS (
       | SELECT src AS id, src AS reach FROM edges
       | UNION
       | SELECT w.id, x.dst FROM walk w JOIN edges x ON w.reach = x.src),
       |losers AS (
       | SELECT id FROM walk GROUP BY id HAVING id <> min(reach))
       |SELECT vec_id, CAST(label AS BIGINT) AS label FROM e
       |WHERE vec_id NOT IN (SELECT id FROM losers)
       |ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- q121
  // Real video codec behind the multimodal decode seam — the third leg
  // of the codec trio (WAV q94, PNG q109): genuine Y4M (YUV4MPEG2)
  // container bytes — ASCII header + FRAME-delimited raw 4:2:0 planar
  // payloads, the uncompressed interchange format ffmpeg/x264 read —
  // synthesized from doc_id parameters, decoded partition-wise, PLUS
  // the byte-level frame sampler (every 2nd frame extracted from the
  // container) whose per-video frame count lands in the result. Every
  // 11th blob is truncated mid-frame and must route to decode_ok=false
  // with zero sampled frames, not a task failure. The oracle recomputes
  // header fields, duration, 4:2:0 stride, and ceil(frames/2) from the
  // same id-derived parameters; frame BYTES are pinned in
  // MultimodalSpec (byte-exact against the generator's LCG).
  private def q121(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = graft.multimodal.Multimodal
    // Materialize: the synthesized containers feed BOTH the decode and
    // the frame-sample branch of the join — without it every container
    // is generated and layout-walked twice (exchange reuse does not
    // dedup mapPartitions subtrees)
    val blobs = Materialize(
      t(s, dir, "documents").filter($"doc_id" < 220)
        .select($"doc_id").as[Long]
        .map { id =>
          val rates = Array((25, 1), (30000, 1001), (24, 1))
          val (num, den) = rates((id % 3).toInt)
          val b = m.syntheticY4m(id, 16 + 2 * (id % 5).toInt,
            12 + 2 * (id % 3).toInt, num, den, 1 + (id % 10).toInt)
          if (id % 11 == 0) b.copy(content = b.content.dropRight(10))
          else b
        }.toDF()).as[m.MediaBlob]
    val meta = m.decodeY4m(blobs).toDF()
    val sampled = m.sampleFramesY4m(blobs, every = 2)
      .groupBy($"media_id").agg(count(lit(1)).as("sampled_frames"))
    meta.join(sampled, Seq("media_id"), "left_outer")
      .select($"media_id", $"width", $"height", $"fps_num", $"fps_den",
        $"frames", $"frame_bytes", $"duration_ms", $"decode_ok",
        coalesce($"sampled_frames", lit(0L)).as("sampled_frames"))
      .orderBy($"media_id")
  }
  private val q121Sql =
    """WITH p AS (
      | SELECT doc_id,
      |  16 + 2 * (doc_id % 5) AS w,
      |  12 + 2 * (doc_id % 3) AS h,
      |  CASE doc_id % 3 WHEN 0 THEN 25 WHEN 1 THEN 30000 ELSE 24 END
      |    AS num,
      |  CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 1001 ELSE 1 END
      |    AS den,
      |  1 + doc_id % 10 AS fr,
      |  doc_id % 11 = 0 AS bad
      | FROM documents WHERE doc_id < 220)
      |SELECT doc_id AS media_id,
      | CAST(CASE WHEN bad THEN -1 ELSE w END AS INT) AS width,
      | CAST(CASE WHEN bad THEN -1 ELSE h END AS INT) AS height,
      | CAST(CASE WHEN bad THEN -1 ELSE num END AS INT) AS fps_num,
      | CAST(CASE WHEN bad THEN -1 ELSE den END AS INT) AS fps_den,
      | CAST(CASE WHEN bad THEN -1 ELSE fr END AS INT) AS frames,
      | CAST(CASE WHEN bad THEN -1 ELSE w * h * 3 // 2 END AS BIGINT)
      |   AS frame_bytes,
      | CAST(CASE WHEN bad THEN -1 ELSE fr * 1000 * den // num END
      |   AS BIGINT) AS duration_ms,
      | NOT bad AS decode_ok,
      | CAST(CASE WHEN bad THEN 0 ELSE (fr + 1) // 2 END AS BIGINT)
      |   AS sampled_frames
      |FROM p ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q122
  // EXACT SUBSTRING DEDUP (Lee, Ippolito et al., ACL 2022): the
  // span-level operator doc-level dedup can't express — repeated
  // PASSAGES (boilerplate, licenses) recur across otherwise-distinct
  // docs. A 12-token boilerplate tail is planted on every 3rd doc;
  // duplicateSpans fingerprints every token 6-gram scan-side, keeps
  // each gram's globally-first (doc, pos) site via one fingerprint-
  // keyed window, merges overlapping duplicate sites per doc
  // (gaps-and-islands), and stripDuplicateSpans rewrites the token
  // stream without them. Md5 gram mode so DuckDB replays the
  // fingerprints bit-for-bit; the oracle re-runs the whole pipeline —
  // grams, first-occurrence ranking, interval merge, strip — in SQL.
  // Natural repeats inside the synthetic text dedup identically on
  // both engines. NOTE: q125Sql embeds this strip pipeline (and
  // q123's scoring chain) VERBATIM as a deliberately self-contained
  // composition oracle — a semantic change here must be mirrored
  // there (the capstone's Spark side calls the same operators, so
  // the q125 gate catches silent drift).
  private def q122(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = t(s, dir, "documents").filter($"doc_id" < 400)
      .select($"doc_id", when($"doc_id" % 3 === 0,
          concat($"text", lit(" " + q122Boiler)))
        .otherwise($"text").as("text"))
    val spans = Dedup.duplicateSpans(corpus, "doc_id", "text", k = 6,
      hash = Dedup.Md5)
    Dedup.stripDuplicateSpans(corpus, "doc_id", "text", spans)
      .orderBy($"doc_id")
  }
  private val q122Boiler = "subscribe to our newsletter for the " +
    "latest updates and exclusive offers today"
  private val q122Sql = {
    // md5u32 mirror (Dedup.scala:39): first 8 hex chars of md5 as BIGINT
    val gram = (1 to 6).map(j => s"tk[p+$j]").mkString(" || ' ' || ")
    s"""WITH corpus AS (
      | SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN text || ' $q122Boiler'
      |   ELSE text END AS text
      | FROM documents WHERE doc_id < 400),
      |toks AS (
      | SELECT doc_id, list_filter(string_split_regex(lower(text),
      |   '\\s+'), x -> len(x) > 0) AS tk
      | FROM corpus),
      |gp AS (
      | SELECT doc_id, tk, unnest(range(len(tk) - 5)) AS p
      | FROM toks WHERE len(tk) >= 6),
      |grams AS (
      | SELECT doc_id, p AS pos,
      |  ('0x' || substr(md5($gram), 1, 8))::BIGINT AS fp
      | FROM gp),
      |sites AS (
      | SELECT doc_id, pos,
      |  row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
      | FROM grams),
      |dup AS (
      | SELECT doc_id, pos AS s, pos + 6 AS e FROM sites WHERE rn > 1),
      |flag AS (
      | SELECT doc_id, s, e,
      |  CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id
      |    ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    -1) THEN 1 ELSE 0 END AS ng
      | FROM dup),
      |grp AS (
      | SELECT doc_id, s, e,
      |  sum(ng) OVER (PARTITION BY doc_id ORDER BY s) AS g
      | FROM flag),
      |spans AS (
      | SELECT doc_id, g, min(s) AS ss, max(e) AS se
      | FROM grp GROUP BY doc_id, g),
      |tp AS (
      | SELECT doc_id, unnest(tk) AS tok, unnest(range(len(tk))) AS pos
      | FROM toks),
      |kept AS (
      | SELECT k.doc_id, k.pos, k.tok FROM tp k
      | WHERE NOT EXISTS (SELECT 1 FROM spans sp
      |   WHERE sp.doc_id = k.doc_id
      |    AND k.pos >= sp.ss AND k.pos < sp.se)),
      |agg AS (
      | SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
      |  count(*) AS kept FROM kept GROUP BY doc_id)
      |SELECT c.doc_id,
      | coalesce(a.clean_text, '') AS clean_text,
      | CAST(coalesce(a.kept, 0) AS BIGINT) AS kept_tokens,
      | CAST(coalesce(len(t.tk), 0) - coalesce(a.kept, 0) AS BIGINT)
      |   AS removed_tokens
      |FROM corpus c JOIN toks t USING (doc_id)
      |LEFT JOIN agg a USING (doc_id)
      |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q123
  // CCNet perplexity filtering (Wenzek et al., LREC 2020 — the quality
  // gate the major web corpora actually apply): fit an add-one-
  // smoothed bigram LM on the even-id half of the corpus (the "clean
  // reference" role), score the odd-id half by mean transition NLL and
  // perplexity, and partition it into head/middle/tail tiers at the
  // p33/p66 perplexity percentiles (exact at oracle accuracy — the
  // q98 sketch contract). Counts are exact integers; ln/exp happen
  // once per transition/doc and both score columns carry the 6-decimal
  // floor guard, so DuckDB replays fit + score + tier end to end.
  private def q123(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val lm = LangModel.fitBigramLm(docs.filter($"doc_id" % 2 === 0),
      "text")
    val scored = LangModel.perplexity(docs.filter($"doc_id" % 2 === 1),
      "doc_id", "text", lm)
    LangModel.perplexityTiers(scored).orderBy($"doc_id")
  }
  private val q123Sql =
    """WITH ref AS (
      | SELECT list_filter(string_split_regex(lower(text), '\s+'),
      |   x -> len(x) > 0) AS tk
      | FROM documents WHERE doc_id % 2 = 0),
      |uni AS (
      | SELECT tok, count(*) AS c1
      | FROM (SELECT unnest(tk) AS tok FROM ref) GROUP BY 1),
      |v AS (SELECT count(*) AS vocab FROM uni),
      |bi AS (
      | SELECT tok1, tok2, count(*) AS c12 FROM (
      |  SELECT tk[p+1] AS tok1, tk[p+2] AS tok2 FROM (
      |   SELECT tk, unnest(range(len(tk) - 1)) AS p
      |   FROM ref WHERE len(tk) >= 2))
      | GROUP BY 1, 2),
      |cand AS (
      | SELECT doc_id, list_filter(string_split_regex(lower(text),
      |   '\s+'), x -> len(x) > 0) AS tk
      | FROM documents WHERE doc_id % 2 = 1),
      |ct AS (
      | SELECT doc_id, tok1, tok2, count(*) AS m FROM (
      |  SELECT doc_id, tk[p+1] AS tok1, tk[p+2] AS tok2 FROM (
      |   SELECT doc_id, tk, unnest(range(len(tk) - 1)) AS p
      |   FROM cand WHERE len(tk) >= 2))
      | GROUP BY 1, 2, 3),
      |sc AS (
      | SELECT doc_id, sum(m) AS n_trans,
      |  sum(m * ln((coalesce(c12, 0) + 1.0)
      |    / (coalesce(c1, 0) + vocab))) AS ll
      | FROM ct
      | LEFT JOIN bi USING (tok1, tok2)
      | LEFT JOIN uni ON ct.tok1 = uni.tok
      | CROSS JOIN v
      | GROUP BY doc_id),
      |scored AS (
      | SELECT c.doc_id, CAST(coalesce(len(c.tk), 0) AS BIGINT) AS tokens,
      |  CAST(coalesce(s.n_trans, 0) AS BIGINT) AS n_trans,
      |  floor(-s.ll / s.n_trans * 1e6 + 0.5) / 1e6 AS avg_nll,
      |  floor(exp(-s.ll / s.n_trans) * 1e6 + 0.5) / 1e6 AS ppl
      | FROM cand c LEFT JOIN sc s USING (doc_id)),
      |cuts AS (
      | SELECT quantile_disc(ppl, [1.0/3, 2.0/3]) AS qs
      | FROM scored WHERE ppl IS NOT NULL)
      |SELECT doc_id, tokens, n_trans, avg_nll, ppl,
      | CASE WHEN ppl IS NULL THEN 'na'
      |  WHEN ppl <= qs[1] THEN 'head'
      |  WHEN ppl <= qs[2] THEN 'middle'
      |  ELSE 'tail' END AS tier
      |FROM scored CROSS JOIN cuts
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q124
  // REAL image resize under the oracle: q109's PNG construction with a
  // byte-level resize stage inserted — encode (real PNG bytes) →
  // resizePngBlobs (full pixel decode incl. all five PNG row filters,
  // nearest-neighbor sample, re-encode) → decodePng of the RESIZED
  // bytes. Target dims are exact integer arithmetic (w' = max(1,
  // w·maxEdge / max(w,h)) in longs — no float-floor hazard), so the
  // oracle recomputes them from the id-derived source dims;
  // within-budget images pass through byte-identical (never upscale),
  // and every 9th blob is truncated so the resize routes it to empty
  // content → decode_ok=false, a row property, never a task failure.
  // Pixel CORRECTNESS (JDK ImageIO round-trips, floor-mapping pixel
  // equality, adaptive-filter decode) is spec-land (MultimodalSpec).
  private def q124(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = graft.multimodal.Multimodal
    val blobs = t(s, dir, "documents").filter($"doc_id" < 250)
      .select($"doc_id").as[Long]
      .map { id =>
        val b = m.syntheticPng(id, 8 + (id % 13).toInt,
          8 + (id % 7).toInt)
        if (id % 9 == 0)
          b.copy(content = java.util.Arrays.copyOf(b.content, 40))
        else b
      }
    m.decodePng(m.resizePngBlobs(blobs, maxEdge = 12)).toDF()
      .select($"media_id", $"width", $"height", $"decode_ok")
      .orderBy($"media_id")
  }
  private val q124Sql =
    """WITH p AS (
      | SELECT doc_id,
      |  8 + doc_id % 13 AS w,
      |  8 + doc_id % 7 AS h,
      |  greatest(8 + doc_id % 13, 8 + doc_id % 7) AS m,
      |  doc_id % 9 = 0 AS bad
      | FROM documents WHERE doc_id < 250)
      |SELECT doc_id AS media_id,
      | CAST(CASE WHEN bad THEN -1 WHEN m <= 12 THEN w
      |  ELSE greatest(1, w * 12 // m) END AS INT) AS width,
      | CAST(CASE WHEN bad THEN -1 WHEN m <= 12 THEN h
      |  ELSE greatest(1, h * 12 // m) END AS INT) AS height,
      | NOT bad AS decode_ok
      |FROM p ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q125
  // Modern-pipeline capstone: the two big session additions COMPOSED —
  // exact substring dedup feeding CCNet perplexity filtering, the
  // Lee-et-al → Wenzek-et-al sequence real refineries run (strip
  // repeated passages FIRST so boilerplate can't poison the LM fit or
  // deflate candidate perplexity, then tier on the cleaned text and
  // keep head+middle). One oracled query pins the composition: q122's
  // planted-boilerplate corpus → stripDuplicateSpans → fit the bigram
  // LM on the even-id CLEAN half → score/tier the odd-id clean half →
  // survivors. The DuckDB oracle replays the entire chain (grams →
  // spans → strip → fit → score → cuts → tier → filter) so stage
  // composition can't drift the way separately-green stages could.
  private def q125(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = t(s, dir, "documents").filter($"doc_id" < 400)
      .select($"doc_id", when($"doc_id" % 3 === 0,
          concat($"text", lit(" " + q122Boiler)))
        .otherwise($"text").as("text"))
    val spans = Dedup.duplicateSpans(corpus, "doc_id", "text", k = 6,
      hash = Dedup.Md5)
    // Materialize: clean feeds BOTH the LM fit and the scoring branch
    val clean = Materialize(
      Dedup.stripDuplicateSpans(corpus, "doc_id", "text", spans)
        .select($"doc_id", $"clean_text".as("text")))
    val lm = LangModel.fitBigramLm(clean.filter($"doc_id" % 2 === 0),
      "text")
    val scored = LangModel.perplexity(clean.filter($"doc_id" % 2 === 1),
      "doc_id", "text", lm)
    LangModel.perplexityTiers(scored)
      .filter($"tier" === "head" || $"tier" === "middle")
      .select($"doc_id", $"tokens", $"ppl", $"tier")
      .orderBy($"doc_id")
  }
  private val q125Sql = {
    val gram = (1 to 6).map(j => s"tk[p+$j]").mkString(" || ' ' || ")
    s"""WITH corpus AS (
      | SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN text || ' $q122Boiler'
      |   ELSE text END AS text
      | FROM documents WHERE doc_id < 400),
      |toks AS (
      | SELECT doc_id, list_filter(string_split_regex(lower(text),
      |   '\\s+'), x -> len(x) > 0) AS tk
      | FROM corpus),
      |gp AS (
      | SELECT doc_id, tk, unnest(range(len(tk) - 5)) AS p
      | FROM toks WHERE len(tk) >= 6),
      |grams AS (
      | SELECT doc_id, p AS pos,
      |  ('0x' || substr(md5($gram), 1, 8))::BIGINT AS fp
      | FROM gp),
      |sites AS (
      | SELECT doc_id, pos,
      |  row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
      | FROM grams),
      |dup AS (
      | SELECT doc_id, pos AS s, pos + 6 AS e FROM sites WHERE rn > 1),
      |flag AS (
      | SELECT doc_id, s, e,
      |  CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id
      |    ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    -1) THEN 1 ELSE 0 END AS ng
      | FROM dup),
      |grp AS (
      | SELECT doc_id, s, e,
      |  sum(ng) OVER (PARTITION BY doc_id ORDER BY s) AS g
      | FROM flag),
      |spans AS (
      | SELECT doc_id, g, min(s) AS ss, max(e) AS se
      | FROM grp GROUP BY doc_id, g),
      |tpos AS (
      | SELECT doc_id, unnest(tk) AS tok, unnest(range(len(tk))) AS pos
      | FROM toks),
      |keptt AS (
      | SELECT k.doc_id, k.pos, k.tok FROM tpos k
      | WHERE NOT EXISTS (SELECT 1 FROM spans sp
      |   WHERE sp.doc_id = k.doc_id
      |    AND k.pos >= sp.ss AND k.pos < sp.se)),
      |cagg AS (
      | SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
      | FROM keptt GROUP BY doc_id),
      |clean AS (
      | SELECT c.doc_id, coalesce(a.clean_text, '') AS text
      | FROM corpus c LEFT JOIN cagg a USING (doc_id)),
      |ctk AS (
      | SELECT doc_id, list_filter(string_split_regex(lower(text),
      |   '\\s+'), x -> len(x) > 0) AS tk
      | FROM clean),
      |uni AS (
      | SELECT tok, count(*) AS c1
      | FROM (SELECT unnest(tk) AS tok FROM ctk WHERE doc_id % 2 = 0)
      | GROUP BY 1),
      |v AS (SELECT count(*) AS vocab FROM uni),
      |bi AS (
      | SELECT tok1, tok2, count(*) AS c12 FROM (
      |  SELECT tk[p+1] AS tok1, tk[p+2] AS tok2 FROM (
      |   SELECT tk, unnest(range(len(tk) - 1)) AS p
      |   FROM ctk WHERE doc_id % 2 = 0 AND len(tk) >= 2))
      | GROUP BY 1, 2),
      |cand AS (SELECT doc_id, tk FROM ctk WHERE doc_id % 2 = 1),
      |ct AS (
      | SELECT doc_id, tok1, tok2, count(*) AS m FROM (
      |  SELECT doc_id, tk[p+1] AS tok1, tk[p+2] AS tok2 FROM (
      |   SELECT doc_id, tk, unnest(range(len(tk) - 1)) AS p
      |   FROM cand WHERE len(tk) >= 2))
      | GROUP BY 1, 2, 3),
      |sc AS (
      | SELECT doc_id, sum(m) AS n_trans,
      |  sum(m * ln((coalesce(c12, 0) + 1.0)
      |    / (coalesce(c1, 0) + vocab))) AS ll
      | FROM ct
      | LEFT JOIN bi USING (tok1, tok2)
      | LEFT JOIN uni ON ct.tok1 = uni.tok
      | CROSS JOIN v
      | GROUP BY doc_id),
      |scored AS (
      | SELECT c.doc_id, CAST(coalesce(len(c.tk), 0) AS BIGINT) AS tokens,
      |  floor(exp(-s.ll / s.n_trans) * 1e6 + 0.5) / 1e6 AS ppl
      | FROM cand c LEFT JOIN sc s USING (doc_id)),
      |cuts AS (
      | SELECT quantile_disc(ppl, [1.0/3, 2.0/3]) AS qs
      | FROM scored WHERE ppl IS NOT NULL),
      |tiers AS (
      | SELECT doc_id, tokens, ppl,
      |  CASE WHEN ppl IS NULL THEN 'na'
      |   WHEN ppl <= qs[1] THEN 'head'
      |   WHEN ppl <= qs[2] THEN 'middle'
      |   ELSE 'tail' END AS tier
      | FROM scored CROSS JOIN cuts)
      |SELECT doc_id, tokens, ppl, tier FROM tiers
      |WHERE tier IN ('head', 'middle')
      |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q126
  // Per-language CCNet filtering — the paper's ACTUAL design, which
  // q123 simplifies away: one LM and one set of percentile cuts PER
  // LANGUAGE, because perplexity is not comparable across languages.
  // All languages fit in a single pair of aggregations (lang is just
  // another grouping key), every doc scores against its own language's
  // model, and the head/middle/tail cuts come from a GROUPED sketch
  // (q98's exact-at-oracle-accuracy contract per group). A language
  // present only in the candidate half has no model → null vocab →
  // unscorable 'na', a row property. DuckDB replays fit, per-lang
  // scoring, grouped cuts, and tier assignment end to end.
  private def q126(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val lm = LangModel.fitBigramLmPerLang(
      docs.filter($"doc_id" % 2 === 0), "lang", "text")
    val scored = LangModel.perplexityPerLang(
      docs.filter($"doc_id" % 2 === 1), "doc_id", "lang", "text", lm)
    LangModel.perplexityTiersPerLang(scored)
      .select($"doc_id", $"lang", $"tokens", $"n_trans", $"avg_nll",
        $"ppl", $"tier")
      .orderBy($"doc_id")
  }
  private val q126Sql =
    """WITH ref AS (
      | SELECT lang, list_filter(string_split_regex(lower(text),
      |   '\s+'), x -> len(x) > 0) AS tk
      | FROM documents WHERE doc_id % 2 = 0),
      |uni AS (
      | SELECT lang, tok, count(*) AS c1
      | FROM (SELECT lang, unnest(tk) AS tok FROM ref) GROUP BY 1, 2),
      |v AS (SELECT lang, count(*) AS vocab FROM uni GROUP BY 1),
      |bi AS (
      | SELECT lang, tok1, tok2, count(*) AS c12 FROM (
      |  SELECT lang, tk[p+1] AS tok1, tk[p+2] AS tok2 FROM (
      |   SELECT lang, tk, unnest(range(len(tk) - 1)) AS p
      |   FROM ref WHERE len(tk) >= 2))
      | GROUP BY 1, 2, 3),
      |cand AS (
      | SELECT doc_id, lang, list_filter(string_split_regex(lower(text),
      |   '\s+'), x -> len(x) > 0) AS tk
      | FROM documents WHERE doc_id % 2 = 1),
      |ct AS (
      | SELECT doc_id, lang, tok1, tok2, count(*) AS m FROM (
      |  SELECT doc_id, lang, tk[p+1] AS tok1, tk[p+2] AS tok2 FROM (
      |   SELECT doc_id, lang, tk, unnest(range(len(tk) - 1)) AS p
      |   FROM cand WHERE len(tk) >= 2))
      | GROUP BY 1, 2, 3, 4),
      |sc AS (
      | SELECT doc_id, sum(m) AS n_trans,
      |  sum(m * ln((coalesce(c12, 0) + 1.0)
      |    / (coalesce(c1, 0) + vocab))) AS ll
      | FROM ct
      | LEFT JOIN bi USING (lang, tok1, tok2)
      | LEFT JOIN uni ON ct.lang = uni.lang AND ct.tok1 = uni.tok
      | LEFT JOIN v ON ct.lang = v.lang
      | GROUP BY doc_id),
      |scored AS (
      | SELECT c.doc_id, c.lang,
      |  CAST(coalesce(len(c.tk), 0) AS BIGINT) AS tokens,
      |  CAST(coalesce(s.n_trans, 0) AS BIGINT) AS n_trans,
      |  floor(-s.ll / s.n_trans * 1e6 + 0.5) / 1e6 AS avg_nll,
      |  floor(exp(-s.ll / s.n_trans) * 1e6 + 0.5) / 1e6 AS ppl
      | FROM cand c LEFT JOIN sc s USING (doc_id)),
      |cuts AS (
      | SELECT lang, quantile_disc(ppl, [1.0/3, 2.0/3]) AS qs
      | FROM scored WHERE ppl IS NOT NULL GROUP BY lang)
      |SELECT s.doc_id, s.lang, s.tokens, s.n_trans, s.avg_nll, s.ppl,
      | CASE WHEN s.ppl IS NULL THEN 'na'
      |  WHEN s.ppl <= qs[1] THEN 'head'
      |  WHEN s.ppl <= qs[2] THEN 'middle'
      |  ELSE 'tail' END AS tier
      |FROM scored s LEFT JOIN cuts USING (lang)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q127
  // Byte-level AUDIO feature extraction — completes the per-modality
  // real transforms (q124 image resize, q121 video frame-sample):
  // genuine RIFF/WAVE containers whose 16-bit PCM samples follow a
  // closed-form id-derived pattern, decoded back out of the BYTES by
  // wavStats into per-channel peak / sum|s| / sum s² — all exact
  // integers, so the oracle recomputes them from the same closed form
  // (no float hazards anywhere). Every 13th blob is truncated
  // mid-header → one decode_ok=false row, a row property.
  private def q127(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = graft.multimodal.Multimodal
    val blobs = t(s, dir, "documents").filter($"doc_id" < 200)
      .select($"doc_id").as[Long]
      .map { id =>
        val ch = 1 + (id % 2).toInt
        val fr = 50 + (id % 100).toInt
        val samples = new Array[Short](fr * ch)
        var i = 0
        while (i < fr) {
          var c = 0
          while (c < ch) {
            samples(i * ch + c) =
              (((id * 7 + i * 13 + c * 17) % 65536) - 32768).toShort
            c += 1
          }
          i += 1
        }
        val b = m.syntheticWavPcm(id, 16000, ch, samples)
        if (id % 13 == 0) b.copy(content = b.content.take(30)) else b
      }
    m.decodeWavStats(blobs).toDF()
      .select($"media_id", $"channel", $"n_samples", $"peak",
        $"sum_abs", $"sum_sq", $"decode_ok")
      .orderBy($"media_id", $"channel")
  }
  private val q127Sql =
    """WITH p AS (
      | SELECT doc_id, 1 + doc_id % 2 AS ch, 50 + doc_id % 100 AS fr,
      |  doc_id % 13 = 0 AS bad
      | FROM documents WHERE doc_id < 200),
      |fi AS (
      | SELECT doc_id, ch, fr, unnest(range(fr)) AS i
      | FROM p WHERE NOT bad),
      |sc AS (
      | SELECT doc_id, ch, fr, i, unnest(range(ch)) AS c FROM fi),
      |sv AS (
      | SELECT doc_id, c AS channel,
      |  ((doc_id*7 + i*13 + c*17) % 65536) - 32768 AS s
      | FROM sc),
      |agg AS (
      | SELECT doc_id, channel,
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(max(abs(s)) AS INT) AS peak,
      |  CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
      |  CAST(sum(s*s) AS BIGINT) AS sum_sq
      | FROM sv GROUP BY 1, 2)
      |SELECT doc_id AS media_id, CAST(channel AS INT) AS channel,
      | n_samples, peak, sum_abs, sum_sq, true AS decode_ok
      |FROM agg
      |UNION ALL
      |SELECT doc_id, CAST(-1 AS INT), CAST(-1 AS BIGINT),
      | CAST(-1 AS INT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), false
      |FROM p WHERE bad
      |ORDER BY media_id, channel""".stripMargin

  // ---------------------------------------------------------------- q128
  // JPEG — the fourth real codec (WAV q94/q127, PNG q109/q124, Y4M
  // q121): genuine DC-only baseline JFIF bytes (real DCT degenerate
  // form, Annex-K Huffman tables, FF stuffing — MultimodalSpec proves
  // JDK ImageIO decodes them bit-exact) parsed partition-wise by the
  // marker-walking header decoder, with the parsed dimensions feeding
  // resizeSpec's aspect-preserving downscale plan. Every 9th blob is
  // truncated mid-stream and must route to decode_ok=false with
  // sentinel metadata and NULL resize targets, never a task failure.
  // The oracle replays the deterministic (id → dims, id → truncated)
  // construction and mirrors the resizeSpec column math; entropy_bytes
  // is Huffman-sized and so stays spec-land, like q109's idat_bytes.
  private def q128(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = graft.multimodal.Multimodal
    val blobs = t(s, dir, "documents").filter($"doc_id" < 250)
      .select($"doc_id").as[Long]
      .map { id =>
        val b = m.syntheticJpeg(id,
          24 + (id % 13).toInt * 8, 16 + (id % 7).toInt * 8)
        if (id % 9 == 0)
          b.copy(content = java.util.Arrays.copyOf(b.content, 30))
        else b
      }
    val meta = m.decodeJpeg(blobs).toDF()
    val (rw, rh) = m.resizeSpec(col("width"), col("height"), 64)
    meta.select($"media_id", $"width", $"height", $"components",
        $"decode_ok",
        when($"decode_ok", rw).as("resize_w"),
        when($"decode_ok", rh).as("resize_h"))
      .orderBy($"media_id")
  }
  private val q128Sql =
    """WITH d AS (
      | SELECT doc_id,
      |  CAST(24 + (doc_id % 13) * 8 AS INT) AS w,
      |  CAST(16 + (doc_id % 7) * 8 AS INT) AS h,
      |  doc_id % 9 = 0 AS bad
      | FROM documents WHERE doc_id < 250),
      |sc AS (
      | SELECT doc_id, w, h, bad,
      |  LEAST(1.0, 64.0 / GREATEST(w, h)) AS scale
      | FROM d)
      |SELECT doc_id AS media_id,
      | CASE WHEN bad THEN -1 ELSE w END AS width,
      | CASE WHEN bad THEN -1 ELSE h END AS height,
      | CAST(CASE WHEN bad THEN -1 ELSE 1 END AS INT) AS components,
      | NOT bad AS decode_ok,
      | CAST(CASE WHEN bad THEN NULL
      |   ELSE FLOOR(w * scale) END AS INT) AS resize_w,
      | CAST(CASE WHEN bad THEN NULL
      |   ELSE FLOOR(h * scale) END AS INT) AS resize_h
      |FROM sc ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q129
  // Tagged HNSW under the ORACLE contract (the q48/q77 pattern for
  // fitted ANN structures): the full tagged lifecycle — tag-sharded
  // graph build, broadcast tag routing, scatter-gather serve,
  // own-id exclusion — runs at the exhaustive parameterization
  // (ef <= 0 scores EVERY vector in the routed shard with the graph
  // kernel's own distance; provable, unlike a "big ef" beam whose
  // reach depends on graph connectivity), which makes the output ≡
  // per-tag brute-force cosine top-k. DuckDB replays that brute force
  // with an independent tag join. The approximate beam mode stays
  // recall-spec-pinned in HnswSpec; q50x benches it.
  private def q129(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
      .select($"vec_id", $"embedding",
        concat(lit("t"), pmod($"vec_id", lit(4))).as("tag"))
    val (idx, tagMap) = graft.operators.Hnsw.buildTagged(
      emb, "vec_id", "embedding", "tag")
    val queries = emb.filter($"vec_id" < 12)
    graft.operators.Hnsw.topKTagged(idx, tagMap, queries,
        "vec_id", "embedding", "tag", k = 5, ef = 0)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  private val q129Sql =
    """WITH e AS (
      | SELECT vec_id, embedding::DOUBLE[] AS v, vec_id % 4 AS tag
      | FROM embeddings),
      |q AS (SELECT vec_id AS q_id, v AS qv, tag FROM e WHERE vec_id < 12),
      |c AS (SELECT vec_id AS c_id, v AS cv, tag FROM e),
      |sc AS (
      | SELECT q_id, c_id,
      |  list_dot_product(qv, cv)
      |    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
      |    AS sim
      | FROM q JOIN c ON q.tag = c.tag AND q.q_id <> c.c_id),
      |r AS (SELECT q_id, c_id, sim,
      | row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank
      | FROM sc)
      |SELECT q_id, rank, c_id, round(sim, 6) AS sim
      |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- q132
  // Stream-stream LEFT OUTER interval join — ST-family's hardest
  // append-mode semantics: a click with no purchase in its window
  // emits exactly once, with a NULL purchase_id, only after the
  // watermark proves no match can still arrive. Driven like q107
  // (event-time-ordered slices via pinned mtimes), then a far-future
  // sentinel pair in a checkpoint-RESUMED run advances the watermark
  // past every real window so expired left state flushes its null
  // rows (the no-data micro-batch q100's finalization leans on). The
  // sentinel click itself can never flush — the watermark never
  // passes its own far-future window — and is filtered by user_id.
  // Oracle: the batch LEFT JOIN with the same interval condition.
  private def q132(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q132").toString
    val ev = t(s, dir, "events").filter($"user_id" < 30 &&
        ($"event_type" === "click" || $"event_type" === "purchase"))
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val cp = s"$tmp/cp"
    def run(): Unit = {
      withShufflePartitions(s, 4) {
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
        val joined = graft.streaming.Streams.intervalJoinOuter(
            stream.filter($"event_type" === "click"),
            stream.filter($"event_type" === "purchase"),
            "user_id", "ts", lookback = "6 hours", watermark = "8 hours")
          .select(col("l.event_id").as("click_id"),
            col("r.event_id").as("purchase_id"),
            col("l.user_id").as("user_id"))
        val q = joined.writeStream.outputMode("append")
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    val drive = new SliceDrive(inDir)
    import drive.writeSlice
    val mm = ev.agg(min($"ts"), max($"ts")).head()
    val (lo, hi) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val mid = lo + (hi - lo) / 2
    writeSlice(ev.filter(unix_millis($"ts") < mid), 0)
    writeSlice(ev.filter(unix_millis($"ts") >= mid), 1)
    run()
    // sentinel pair: one per side so BOTH watermark nodes advance
    // past every real window in the resumed run's finalization
    writeSlice(s.range(2).select(lit(-1L).as("event_id"),
      lit(java.sql.Timestamp.valueOf("2031-01-01 00:00:00")).as("ts"),
      lit(-1L).as("user_id"),
      when($"id" === 0, "click").otherwise("purchase").as("event_type")),
      2)
    run()
    s.read.parquet(outDir).filter($"user_id" >= 0)
      .orderBy($"click_id", $"purchase_id")
      .select($"click_id", $"purchase_id", $"user_id")
  }
  private val q132Sql =
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
      | c.user_id AS user_id
      |FROM events c LEFT JOIN events p
      | ON c.user_id = p.user_id
      | AND p.event_type = 'purchase'
      | AND c.ts::TIMESTAMP >= p.ts::TIMESTAMP - INTERVAL 6 HOUR
      | AND c.ts::TIMESTAMP <= p.ts::TIMESTAMP
      |WHERE c.event_type = 'click' AND c.user_id < 30
      |ORDER BY click_id, purchase_id""".stripMargin

  // ---------------------------------------------------------------- q133
  // Watermarked streaming dedup (Streams.dedupedStream, ST3's
  // admission gate) under the oracle: slice 1 REDELIVERS a third of
  // slice 0's events byte-identically (the at-least-once source every
  // real queue is), and dropDuplicatesWithinWatermark must admit each
  // event_id exactly once across micro-batches. The oracle
  // parameterization uses a horizon covering the fixture's full span
  // — no state eviction, so the final table is provably the plain
  // DISTINCT (the exhaustive-mode pattern: production runs a bounded
  // horizon, spec-pinned; the oracle runs the parameterization whose
  // semantics SQL can state exactly). Emission is immediate on first
  // arrival (dedup state needs no window close), so no sentinel run.
  private def q133(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q133").toString
    val ev = t(s, dir, "events").filter($"user_id" < 40)
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val cp = s"$tmp/cp"
    val drive = new SliceDrive(inDir)
    import drive.writeSlice
    val mm = ev.agg(min($"ts"), max($"ts")).head()
    val (lo, hi) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val mid = lo + (hi - lo) / 2
    writeSlice(ev.filter(unix_millis($"ts") < mid), 0)
    writeSlice(ev.filter(unix_millis($"ts") >= mid)
      .unionByName(ev.filter(unix_millis($"ts") < mid &&
        pmod($"event_id", lit(3)) === 0)), 1)     // redelivery
    withShufflePartitions(s, 4) {
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val q = graft.streaming.Streams.dedupedStream(
          stream, "event_id", "ts", "60 days")
        .select($"event_id", $"user_id", $"event_type")
        .writeStream.outputMode("append")
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(outDir).orderBy($"event_id")
      .select($"event_id", $"user_id", $"event_type")
  }
  private val q133Sql =
    """SELECT event_id, user_id, event_type
      |FROM events WHERE user_id < 40
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q134
  // Byte-level JPEG resize under the oracle — q124's contract for the
  // dominant web image format: AC-bearing photo-like JPEGs (real DCT
  // coefficients from the Annex-K pixel encoder, not flat blocks) →
  // resizeJpegBlobs (FULL AC Huffman decode + dequant + IDCT,
  // nearest-neighbor plane resample, Annex-K re-encode) → decodeJpeg
  // of the RESIZED bytes. Target dims are the same exact integer
  // arithmetic as resizePng, so the oracle replays them from the
  // id-derived source dims; within-budget images pass through
  // byte-identical (never upscale); every 9th blob is truncated and
  // must route to empty content → decode_ok=false. Pixel fidelity
  // (ImageIO agreement, nearest-neighbor mapping) is spec-land
  // (MultimodalSpec), like q124.
  private def q134(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = graft.multimodal.Multimodal
    val blobs = t(s, dir, "documents").filter($"doc_id" < 150)
      .select($"doc_id").as[Long]
      .map { id =>
        val b = m.syntheticJpegPhoto(id, 24 + (id % 11).toInt * 4,
          16 + (id % 5).toInt * 4)
        if (id % 9 == 0)
          b.copy(content = java.util.Arrays.copyOf(b.content, 25))
        else b
      }
    m.decodeJpeg(m.resizeJpegBlobs(blobs, maxEdge = 32)).toDF()
      .select($"media_id", $"width", $"height", $"components",
        $"decode_ok")
      .orderBy($"media_id")
  }
  private val q134Sql =
    """WITH p AS (
      | SELECT doc_id,
      |  CAST(24 + (doc_id % 11) * 4 AS INT) AS w,
      |  CAST(16 + (doc_id % 5) * 4 AS INT) AS h,
      |  greatest(24 + (doc_id % 11) * 4, 16 + (doc_id % 5) * 4) AS m,
      |  doc_id % 9 = 0 AS bad
      | FROM documents WHERE doc_id < 150)
      |SELECT doc_id AS media_id,
      | CAST(CASE WHEN bad THEN -1 WHEN m <= 32 THEN w
      |  ELSE greatest(1, w * 32 // m) END AS INT) AS width,
      | CAST(CASE WHEN bad THEN -1 WHEN m <= 32 THEN h
      |  ELSE greatest(1, h * 32 // m) END AS INT) AS height,
      | CAST(CASE WHEN bad THEN -1 ELSE 3 END AS INT) AS components,
      | NOT bad AS decode_ok
      |FROM p ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q135
  // AC decode fidelity under the oracle — the within-published-bound
  // pattern (q82/q98's sketch contract applied to lossy codecs): each
  // photo-like blob is FULLY pixel-decoded (AC Huffman + dequant +
  // IDCT + color transform) and compared against the REPLAYED
  // generator pixels inside the query; the oracle pins dims,
  // components, decode_ok, and the `faithful` boolean (mean abs error
  // within Annex-K quantization tolerance) — DuckDB cannot run an
  // IDCT, but it can assert the error bound HOLDS row by row, which
  // is exactly what a lossy codec promises. Truncated blobs must
  // come back unfaithful+undecodable, never a task failure.
  private def q135(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = graft.multimodal.Multimodal
    t(s, dir, "documents").filter($"doc_id" < 150)
      .select($"doc_id").as[Long]
      .map { id =>
        val w = 24 + (id % 11).toInt * 4
        val h = 16 + (id % 5).toInt * 4
        val blob = m.syntheticJpegPhoto(id, w, h)
        val bytes =
          if (id % 9 == 0) java.util.Arrays.copyOf(blob.content, 25)
          else blob.content
        val meta = m.parseJpeg(id, bytes)
        m.decodeJpegRgb(bytes) match {
          case Some((dw, dh, rgb)) =>
            val orig = m.syntheticPhotoRgb(id, w, h)
            var errSum = 0L
            var i = 0
            while (i < rgb.length) {
              errSum += math.abs((rgb(i) & 0xff) - (orig(i) & 0xff))
              i += 1
            }
            val mae = errSum.toDouble / math.max(1, rgb.length)
            (id, dw, dh, meta.components, true, mae <= 6.0)
          case None =>
            (id, -1, -1, meta.components, false, false)
        }
      }
      .toDF("media_id", "width", "height", "components", "decode_ok",
        "faithful")
      .orderBy($"media_id")
  }
  private val q135Sql =
    """SELECT doc_id AS media_id,
      | CAST(CASE WHEN doc_id % 9 = 0 THEN -1
      |   ELSE 24 + (doc_id % 11) * 4 END AS INT) AS width,
      | CAST(CASE WHEN doc_id % 9 = 0 THEN -1
      |   ELSE 16 + (doc_id % 5) * 4 END AS INT) AS height,
      | CAST(CASE WHEN doc_id % 9 = 0 THEN -1 ELSE 3 END AS INT)
      |   AS components,
      | doc_id % 9 <> 0 AS decode_ok,
      | doc_id % 9 <> 0 AS faithful
      |FROM documents WHERE doc_id < 150
      |ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q137
  // Stream-stream FULL OUTER interval join — completes q132's matrix:
  // BOTH sides' unmatched rows must emit exactly once (a click with no
  // purchase → NULL purchase_id; a purchase with no click in its
  // trailing window → NULL click_id), each only after the watermark
  // proves no match can still arrive. Same drive as q132:
  // event-time-ordered slices, then a far-future sentinel PAIR in a
  // checkpoint-resumed run advances both watermark nodes so expired
  // state on both sides flushes its null rows. Output ids are
  // null-coalesced to -1 so the ordering contract is engine-neutral
  // (Spark sorts NULLs first, DuckDB last). Oracle: batch FULL JOIN of
  // the pre-filtered sides with the same interval condition.
  private def q137(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q137").toString
    val ev = t(s, dir, "events").filter($"user_id" < 30 &&
        ($"event_type" === "click" || $"event_type" === "purchase"))
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val cp = s"$tmp/cp"
    def run(): Unit = {
      withShufflePartitions(s, 4) {
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
        val joined = graft.streaming.Streams.intervalJoinFullOuter(
            stream.filter($"event_type" === "click"),
            stream.filter($"event_type" === "purchase"),
            "user_id", "ts", lookback = "6 hours", watermark = "8 hours")
          .select(col("l.event_id").as("click_id"),
            col("r.event_id").as("purchase_id"),
            coalesce(col("l.user_id"), col("r.user_id")).as("user_id"))
        val q = joined.writeStream.outputMode("append")
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    val drive = new SliceDrive(inDir)
    import drive.writeSlice
    val mm = ev.agg(min($"ts"), max($"ts")).head()
    val (lo, hi) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val mid = lo + (hi - lo) / 2
    writeSlice(ev.filter(unix_millis($"ts") < mid), 0)
    writeSlice(ev.filter(unix_millis($"ts") >= mid), 1)
    run()
    writeSlice(s.range(2).select(lit(-1L).as("event_id"),
      lit(java.sql.Timestamp.valueOf("2031-01-01 00:00:00")).as("ts"),
      lit(-1L).as("user_id"),
      when($"id" === 0, "click").otherwise("purchase").as("event_type")),
      2)
    run()
    s.read.parquet(outDir).filter($"user_id" >= 0)
      .select(coalesce($"click_id", lit(-1L)).as("click_id"),
        coalesce($"purchase_id", lit(-1L)).as("purchase_id"),
        $"user_id")
      .orderBy($"click_id", $"purchase_id", $"user_id")
  }
  private val q137Sql =
    """WITH c AS (
      | SELECT event_id, ts::TIMESTAMP AS ts, user_id FROM events
      | WHERE event_type = 'click' AND user_id < 30),
      |p AS (
      | SELECT event_id, ts::TIMESTAMP AS ts, user_id FROM events
      | WHERE event_type = 'purchase' AND user_id < 30)
      |SELECT coalesce(c.event_id, -1) AS click_id,
      | coalesce(p.event_id, -1) AS purchase_id,
      | coalesce(c.user_id, p.user_id) AS user_id
      |FROM c FULL JOIN p
      | ON c.user_id = p.user_id
      | AND c.ts >= p.ts - INTERVAL 6 HOUR
      | AND c.ts <= p.ts
      |ORDER BY click_id, purchase_id, user_id""".stripMargin

  // ---------------------------------------------------------------- q136
  // Mixed-modality dispatch under the oracle: ONE heterogeneous blob
  // column carrying all four real containers (WAV / PNG / JPEG / Y4M,
  // family = id % 4, params derived from id / 4 so each family spans
  // its parameter space), routed per row by MAGIC BYTES to the right
  // parser in one partition-wise pass. Every 7th blob has its first
  // byte zeroed — breaking all four magics — and must come back
  // format='unknown', decode_ok=false with sentinel fields: a row
  // property, never a task failure. The oracle replays the id-derived
  // construction (each family's formula is its homogeneous query's —
  // q94/q109/q128/q121) and the corrupted-magic routing.
  private def q136(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = graft.multimodal.Multimodal
    val blobs = t(s, dir, "documents").filter($"doc_id" < 280)
      .select($"doc_id").as[Long]
      .map { id =>
        val j = id / 4
        val b = (id % 4) match {
          case 0 =>
            val rate = Array(8000, 16000, 44100)((j % 3).toInt)
            m.syntheticWav(id, rate, 1 + (j % 2).toInt, 16,
              ((j % 50).toInt + 1) * 40)
          case 1 =>
            m.syntheticPng(id, 8 + (j % 13).toInt, 8 + (j % 7).toInt)
          case 2 =>
            m.syntheticJpegPhoto(id, 24 + (j % 11).toInt * 4,
              16 + (j % 5).toInt * 4)
          case _ =>
            val rates = Array((25, 1), (30000, 1001), (24, 1))
            val (num, den) = rates((j % 3).toInt)
            m.syntheticY4m(id, 16 + 2 * (j % 5).toInt,
              12 + 2 * (j % 3).toInt, num, den, 1 + (j % 10).toInt)
        }
        if (id % 7 == 0) { b.content(0) = 0; b } else b
      }
    m.dispatchDecode(blobs).toDF()
      .select($"media_id", $"format", $"decode_ok", $"width", $"height",
        $"sample_rate", $"channels", $"frames", $"duration_ms")
      .orderBy($"media_id")
  }
  private val q136Sql =
    """WITH p AS (
      | SELECT doc_id, doc_id % 4 AS fam, doc_id // 4 AS j,
      |  doc_id % 7 = 0 AS bad
      | FROM documents WHERE doc_id < 280),
      |d AS (
      | SELECT doc_id, fam, bad,
      |  CASE j % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END
      |    AS rate,
      |  1 + j % 2 AS ch,
      |  (j % 50 + 1) * 40 AS wav_frames,
      |  8 + j % 13 AS png_w, 8 + j % 7 AS png_h,
      |  24 + (j % 11) * 4 AS jpg_w, 16 + (j % 5) * 4 AS jpg_h,
      |  16 + 2 * (j % 5) AS y4m_w, 12 + 2 * (j % 3) AS y4m_h,
      |  CASE j % 3 WHEN 0 THEN 25 WHEN 1 THEN 30000 ELSE 24 END AS num,
      |  CASE j % 3 WHEN 0 THEN 1 WHEN 1 THEN 1001 ELSE 1 END AS den,
      |  1 + j % 10 AS y4m_frames
      | FROM p)
      |SELECT doc_id AS media_id,
      | CASE WHEN bad THEN 'unknown'
      |   WHEN fam = 0 THEN 'wav' WHEN fam = 1 THEN 'png'
      |   WHEN fam = 2 THEN 'jpeg' ELSE 'y4m' END AS format,
      | NOT bad AS decode_ok,
      | CAST(CASE WHEN bad OR fam = 0 THEN -1
      |   WHEN fam = 1 THEN png_w WHEN fam = 2 THEN jpg_w
      |   ELSE y4m_w END AS INT) AS width,
      | CAST(CASE WHEN bad OR fam = 0 THEN -1
      |   WHEN fam = 1 THEN png_h WHEN fam = 2 THEN jpg_h
      |   ELSE y4m_h END AS INT) AS height,
      | CAST(CASE WHEN NOT bad AND fam = 0 THEN rate ELSE -1 END
      |   AS INT) AS sample_rate,
      | CAST(CASE WHEN bad THEN -1 WHEN fam = 0 THEN ch
      |   WHEN fam = 2 THEN 3 ELSE -1 END AS INT) AS channels,
      | CAST(CASE WHEN NOT bad AND fam = 3 THEN y4m_frames ELSE -1 END
      |   AS INT) AS frames,
      | CAST(CASE WHEN bad THEN -1
      |   WHEN fam = 0 THEN (wav_frames * 1000) // rate
      |   WHEN fam = 3 THEN y4m_frames * 1000 * den // num
      |   ELSE -1 END AS BIGINT) AS duration_ms
      |FROM d ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q131
  // Hash-sharded HNSW under the oracle contract — q129's sibling for
  // the UNTAGGED path: every query scatters to every shard
  // (routed = false), each shard scores exhaustively at ef <= 0, and
  // the global top-k window merges — provably ≡ GLOBAL brute-force
  // cosine top-k, so q24's own oracle SQL shape applies verbatim.
  // Build, shard co-location, scatter-gather and the merge window are
  // all exercised; the approximate beam stays recall-pinned in
  // HnswSpec and benched by q49x.
  private def q131(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val idx = graft.operators.Hnsw.buildShards(emb, "vec_id",
      "embedding", shards = 4)
    graft.operators.Hnsw.topK(idx, emb.filter($"vec_id" >= 10 &&
        $"vec_id" < 22), "vec_id", "embedding", k = 4, ef = 0)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  private val q131Sql = bruteTopKSql("vec_id >= 10 AND vec_id < 22", 4)

  // ---------------------------------------------------------------- q130
  // ANN centroid-staleness signal under the FITTED-oracle contract
  // (q76's pattern): fit an IVF-PQ quantizer on 3/4 of the embeddings,
  // then measure two append batches through centroidStaleness — the
  // held-out quarter (in-distribution: ratio ≈ 1, no refit flag) and
  // the same quarter shifted +2.0 per component (drifted: ratio far
  // past the 1.25 threshold, flag trips). The oracle is generated from
  // the fitted centroids AFTER the query runs: per-row nearest-
  // centroid distance as nlist literal squared-L2 chains (the
  // NearestCells kernel's fold order), the batch quantile via
  // quantile_disc (exact ≡ percentile_approx at accuracy ≥ n), and
  // the fit baseline as a literal from the model. Both engines replay
  // the DECISION — distance, quantile, ratio, flag — end to end.
  private val staleModels =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.IvfPqModel]
  @volatile private var lastStaleDir: Option[String] = None
  private def q130(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val base = emb.filter(pmod($"vec_id", lit(4)) =!= 0)
    val model = staleModels.getOrElseUpdate(dir,
      Similarity.fitIvfPq(base, "embedding", nlist = 8, m = 2, k = 16))
    lastStaleDir = Some(dir)
    // both batches in DOUBLE space so the +2.0 shift is the same
    // arithmetic the oracle's list_transform applies
    val held = emb.filter(pmod($"vec_id", lit(4)) === 0)
      .select($"vec_id",
        graft.functions.Vectors.toDouble($"embedding").as("embedding"))
    val drifted = held.select($"vec_id",
      transform($"embedding", x => x + lit(2.0)).as("embedding"))
    // accuracy 1e7 (q98's setting) keeps percentile_approx EXACT —
    // rank error < 1 — for any delta the driver's scale factors reach
    val rIn = Similarity.centroidStaleness(model.ivf, held, "embedding",
      accuracy = 10000000)
    val rDr = Similarity.centroidStaleness(model.ivf, drifted, "embedding",
      accuracy = 10000000)
    Seq(("drifted", rDr), ("in_dist", rIn))
      .map { case (b, r) => (b, r.fitQ, r.deltaQ, r.ratio,
        r.refitRecommended) }
      .toDF("batch", "fq", "dq", "rt", "refit_recommended")
      .select($"batch", round($"fq", 6).as("fit_q"),
        round($"dq", 6).as("delta_q"), round($"rt", 6).as("ratio"),
        $"refit_recommended")
      .orderBy($"batch")
  }
  private[queries] def q130SqlNow: Option[String] =
    lastStaleDir.flatMap(staleModels.get).map(q130SqlFor)
  private def q130SqlFor(model: Similarity.IvfPqModel): String = {
    def dd(x: Double) = java.lang.Double.toString(x)
    val (q, fitQ) = model.ivf.fitDistQ.getOrElse(
      throw new IllegalStateException("q130 model lacks fitDistQ"))
    val chains = model.ivf.centroids.map { c =>
      c.zipWithIndex.map { case (cv, i) =>
        s"(v[${i + 1}]-(${dd(cv)}))*(v[${i + 1}]-(${dd(cv)}))"
      }.mkString("+")
    }.mkString(",\n   ")
    s"""WITH e AS (
       | SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       | FROM embeddings WHERE vec_id % 4 = 0),
       |b AS (
       | SELECT 'in_dist' AS batch, v FROM e
       | UNION ALL
       | SELECT 'drifted', list_transform(v, x -> x + 2.0) FROM e),
       |d AS (SELECT batch,
       |  sqrt(list_min([$chains])) AS dist
       | FROM b),
       |qq AS (SELECT batch, quantile_disc(dist, ${dd(q)}) AS dq
       | FROM d GROUP BY batch)
       |SELECT batch, round(${dd(fitQ)}, 6) AS fit_q,
       | round(dq, 6) AS delta_q,
       | round(dq / (${dd(fitQ)}), 6) AS ratio,
       | dq / (${dd(fitQ)}) > 1.25 AS refit_recommended
       |FROM qq ORDER BY batch""".stripMargin
  }

  // ================================================================ //

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_agg"   -> (q01 _),
    "q02_enrich_join"   -> (q02 _),
    "q03_anti_join"     -> (q03 _),
    "q04_semi_join"     -> (q04 _),
    "q05_topk_window"   -> (q05 _),
    "q06_weighted_topk" -> (q06 _),
    "q07_upsert_merge"  -> (q07 _),
    "q08_patch_upsert"  -> (q08 _),
    "q09_validate"      -> (q09 _),
    "q10_stale_refresh" -> (q10 _),
    "q11_scorecard"     -> (q11 _),
    "q12_union_priority"-> (q12 _),
    "q13_tumbling"      -> (q13 _),
    "q14_sliding"       -> (q14 _),
    "q15_session"       -> (q15 _),
    "q16_slugify"       -> (q16 _),
    "q17_tokens"        -> (q17 _),
    "q18_quality"       -> (q18 _),
    "q19_langid"        -> (q19 _),
    "q20_fingerprint"   -> (q20 _),
    "q21_exact_dedup"   -> (q21 _),
    "q22_ngram_jaccard" -> (q22 _),
    "q23_vec_mean"      -> (q23 _),
    "q24_cosine_topk"   -> (q24 _),
    "q25_minhash_lsh"   -> (q25 _),
    "q26_simhash"       -> (q26 _),
    "q27_chunker"       -> (q27 _),
    "q28_hash_embed"    -> (q28 _),
    "q29_lsh_ann"       -> (q29 _),
    "q30_asof_join"     -> (q30 _),
    "q31_html_unescape" -> (q31 _),
    "q32_clean_text"    -> (q32 _),
    "q33_date_parse"    -> (q33 _),
    "q34_md5_uuid"      -> (q34 _),
    "q35_ingest_config" -> (q35 _),
    "q36_summarize"     -> (q36 _),
    "q37_statements"    -> (q37 _),
    "q38_fallback_topk" -> (q38 _),
    "q39_nan_null"      -> (q39 _),
    "q40_to_json"       -> (q40 _),
    "q41_layout"        -> (q41 _),
    "q42_html_extract"  -> (q42 _),
    "q43_distinct_union"-> (q43 _),
    "q44_lifecycle"     -> (q44 _),
    "q45_frame_plan"    -> (q45 _),
    "q46_blob_decode"   -> (q46 _),
    "q47_vec_neardup"   -> (q47 _),
    "q48_ivf_ann"       -> (q48 _),
    "q49_json_props"    -> (q49 _),
    "q50_feed_parse"    -> (q50 _),
    "q51_distinct_pct"  -> (q51 _),
    "q52_rollup"        -> (q52 _),
    "q53_timezone"      -> (q53 _),
    "q54_running_sum"   -> (q54 _),
    "q55_term_topk"     -> (q55 _),
    "q56_pivot"         -> (q56 _),
    "q57_edit_distance" -> (q57 _),
    "q58_set_ops"       -> (q58 _),
    "q59_ntile_pctrank" -> (q59 _),
    "q60_unpivot"       -> (q60 _),
    "q61_dedup_clusters"-> (q61 _),
    "q62_tfidf"         -> (q62 _),
    "q63_cube"          -> (q63 _),
    "q64_repetition"    -> (q64 _),
    "q65_hash_split"    -> (q65 _),
    "q66_pack_budget"   -> (q66 _),
    "q67_source_quota"  -> (q67 _),
    "q68_pii_scrub"     -> (q68 _),
    "q69_seeded_shuffle"-> (q69 _),
    "q70_seeded_normal" -> (q70 _),
    "q71_lag_lead"      -> (q71 _),
    "q72_string_agg"    -> (q72 _),
    "q73_stats_moments" -> (q73 _),
    "q74_curation_pipe" -> (q74 _),
    "q75_scd2_history"  -> (q75 _),
    "q76_pq_ann"        -> (q76 _),
    "q77_ivfpq_ann"     -> (q77 _),
    "q78_voice_pick"    -> (q78 _),
    "q79_dropneardups"  -> (q79 _),
    "q80_incr_dedup"    -> (q80 _),
    "q81_strat_sample"  -> (q81 _),
    "q82_hll_sketch"    -> (q82 _),
    "q83_weighted_sample" -> (q83 _),
    "q84_band_join"     -> (q84 _),
    "q85_session_window"-> (q85 _),
    "q86_snapshot_diff" -> (q86 _),
    "q87_decontaminate" -> (q87 _),
    "q88_median_mode"   -> (q88 _),
    "q89_rate_limit"    -> (q89 _),
    "q90_profile"       -> (q90 _),
    "q91_salted_join"   -> (q91 _),
    "q92_grouping_sets" -> (q92 _),
    "q93_stream_lifecycle" -> (q93 _),
    "q94_wav_decode"    -> (q94 _),
    "q95_bm25"          -> (q95 _),
    "q96_temp_mixture"  -> (q96 _),
    "q97_nfc_normalize" -> (q97 _),
    "q98_quantile_sketch" -> (q98 _),
    "q99_bloom_semijoin" -> (q99 _),
    "q100_stream_tumbling" -> (q100 _),
    "q101_variant_json" -> (q101 _),
    "q102_cms_heavyhitters" -> (q102 _),
    "q103_incr_rollup"  -> (q103 _),
    "q104_cdc_apply"    -> (q104 _),
    "q105_refinery"     -> (q105 _),
    "q106_bm25_batch"   -> (q106 _),
    "q107_stream_join"  -> (q107 _),
    "q108_sessionize"   -> (q108 _),
    "q109_png_decode"   -> (q109 _),
    "q110_vi_segment"   -> (q110 _),
    "q111_stream_refinery" -> (q111 _),
    "q112_semantic_dedup" -> (q112 _),
    "q113_sq8_ann"      -> (q113 _),
    "q114_sorted_batching" -> (q114 _),
    "q115_hybrid_rrf"   -> (q115 _),
    "q116_bm25_index"   -> (q116 _),
    "q117_bm25_lifecycle" -> (q117 _),
    "q118_hybrid_lexvec" -> (q118 _),
    "q119_bpe_tokens"   -> (q119 _),
    "q120_semdedup_ivf" -> (q120 _),
    "q121_y4m_decode"   -> (q121 _),
    "q122_substr_dedup" -> (q122 _),
    "q123_ppl_filter"   -> (q123 _),
    "q124_png_resize"   -> (q124 _),
    "q125_refinery_v2"  -> (q125 _),
    "q126_ppl_per_lang" -> (q126 _),
    "q127_wav_stats"    -> (q127 _),
    "q128_jpeg_decode"  -> (q128 _),
    "q129_hnsw_oracle"  -> (q129 _),
    "q130_ann_staleness" -> (q130 _),
    "q131_hnsw_sharded_oracle" -> (q131 _),
    "q132_stream_outer_join" -> (q132 _),
    "q133_stream_dedup" -> (q133 _),
    "q134_jpeg_resize"  -> (q134 _),
    "q135_jpeg_ac_fidelity" -> (q135 _),
    "q136_modality_dispatch" -> (q136 _),
    "q137_stream_full_outer" -> (q137 _)
  )

  /** Queries that run real Structured Streaming micro-batches. Each
    * pays ~3-5 s of fixed overhead (checkpoint init, per-micro-batch
    * planning) that is a bench FLOOR, not dataflow cost — at real
    * scale it amortizes over GB-sized batches. Bench subtotals these
    * separately so round-over-round comparison of the non-streaming
    * suite isn't masked by the floor.
    */
  val streamingQueries: Set[String] = Set(
    "q93_stream_lifecycle", "q100_stream_tumbling", "q107_stream_join",
    "q108_sessionize", "q111_stream_refinery", "q132_stream_outer_join",
    "q133_stream_dedup", "q137_stream_full_outer")

  /** Bench-only twins of the dedup family on the PRODUCTION xxhash64
    * hash path. q25/q26/q80 run `Dedup.Md5` because that is what the
    * DuckDB oracle can replay — which left the Xx64 fast path (the one
    * a 100 TB job actually runs) unmeasured: a throughput regression
    * there would be invisible to the driver bench. These twins are
    * timed by Bench but are NOT part of the Verify/oracle contract
    * (Xx64 ≡ Md5 candidate semantics modulo hash family is spec-pinned
    * in DedupSpec). Names sort directly after their oracle twins so
    * the bench JSON reads pairwise.
    */
  val benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25x_minhash_xx64" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      val dup = docs.filter($"doc_id" < 50)
        .select(($"doc_id" + 10000000L).as("doc_id"), $"text")
      Dedup.minhashCandidates(docs.unionByName(dup), "text", "doc_id")
        .orderBy($"id_a", $"id_b")
    }),
    "q26x_simhash_xx64" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      val dup = docs.filter($"doc_id" < 50)
        .select(($"doc_id" + 10000000L).as("doc_id"), $"text")
      Dedup.simhashCandidates(docs.unionByName(dup), "text", "doc_id")
        .orderBy($"id_a", $"id_b")
    }),
    "q49x_hnsw_ann" -> ((s: SparkSession, dir: String) => {
      // true HNSW (operators/Hnsw): sharded build + ef=128 serve over
      // the embeddings table — timed so the reference's own index
      // structure has a throughput number next to the IVF/PQ/SQ8
      // substitutes; approximate by construction (recall pinned in
      // HnswSpec/RecallCurveSpec: 0.99 clustered / 1.00 uniform at
      // ef=128), so it is bench-only like the other xx-twins. Name
      // sorts next to q48 (IVF), its oracle-mode sibling.
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val index = Hnsw.buildShards(emb, "vec_id", "embedding", shards = 8)
      Hnsw.topK(index, emb.filter($"vec_id" < 50), "vec_id", "embedding",
          k = 10, ef = 128)
        .orderBy($"q_id", $"rank")
    }),
    "q49y_hnsw_resident" -> ((s: SparkSession, dir: String) => {
      // RESIDENT-serve twin of q49x: sharded HNSW engines amortize the
      // graph build across query batches by keeping shards resident;
      // here the prepared (shard-co-located) index is built + cached
      // ONCE, materialized eagerly, then EIGHT 50-query batches serve
      // through topKResident with zero index movement. q49x times
      // build + one batch; this entry times build + 8 batches on the
      // cached index, so (q49y - q49x)/7 ≈ marginal per-batch serve
      // cost — the number SCALE.md's amortization claim rests on.
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val prepared = Hnsw.prepare(
        Hnsw.buildShards(emb, "vec_id", "embedding", shards = 8)).cache()
      prepared.count()                  // resident: built exactly once
      (0 until 8).map { b =>
        Hnsw.topKResident(prepared,
          emb.filter($"vec_id" >= b * 50 && $"vec_id" < (b + 1) * 50),
          "vec_id", "embedding", k = 10, ef = 128)
      }.reduce(_ unionByName _).orderBy($"q_id", $"rank")
    }),
    "q50x_hnsw_tagged" -> ((s: SparkSession, dir: String) => {
      // tag-partitioned HNSW: the reference's filtered related-articles
      // query (same topic must + own-id must_not + top 6 + ef=128,
      // get_relevant_articles.py:64-88) with the label standing in for
      // topic_id — one graph per tag, queries route to one shard each
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val (index, tagMap) = Hnsw.buildTagged(emb, "vec_id", "embedding",
        "label")
      Hnsw.topKTagged(index, tagMap, emb.filter($"vec_id" < 50),
          "vec_id", "embedding", "label", k = 6, ef = 128)
        .orderBy($"q_id", $"rank")
    }),
    "q80x_incr_dedup_xx64" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      val index = docs.filter($"doc_id" % 5 =!= 0)
      val delta = docs.filter($"doc_id" % 5 === 0)
        .select(($"doc_id" + 10000000L).as("doc_id"), $"text")
      Dedup.incrementalCandidates(
          Dedup.minhashSignatures(index, "text", "doc_id"),
          Dedup.minhashSignatures(delta, "text", "doc_id"))
        .orderBy($"id_a", $"id_b")
    }),
    "q122x_substr_xx64" -> ((s: SparkSession, dir: String) => {
      // q122's production path: multi-arg xxhash64 gram fingerprints
      // over the FULL documents table (no 400-doc cap, no planted
      // boilerplate — whatever naturally repeats, dedups), timed so
      // the substring-dedup production hash has a throughput number
      // next to its md5 oracle twin. Xx64 ≡ Md5 span agreement is
      // spec-pinned in DedupSpec.
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      Dedup.stripDuplicateSpans(docs, "doc_id", "text",
          Dedup.duplicateSpans(docs, "doc_id", "text", k = 6))
        .orderBy($"doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_agg"   -> q01Sql,
    "q02_enrich_join"   -> q02Sql,
    "q03_anti_join"     -> q03Sql,
    "q04_semi_join"     -> q04Sql,
    "q05_topk_window"   -> q05Sql,
    "q06_weighted_topk" -> q06Sql,
    "q07_upsert_merge"  -> q07Sql,
    "q08_patch_upsert"  -> q08Sql,
    "q09_validate"      -> q09Sql,
    "q10_stale_refresh" -> q10Sql,
    "q11_scorecard"     -> q11Sql,
    "q12_union_priority"-> q12Sql,
    "q13_tumbling"      -> q13Sql,
    "q14_sliding"       -> q14Sql,
    "q15_session"       -> q15Sql,
    "q16_slugify"       -> q16Sql,
    "q17_tokens"        -> q17Sql,
    "q18_quality"       -> q18Sql,
    "q19_langid"        -> q19Sql,
    "q20_fingerprint"   -> q20Sql,
    "q21_exact_dedup"   -> q21Sql,
    "q22_ngram_jaccard" -> q22Sql,
    "q23_vec_mean"      -> q23Sql,
    "q24_cosine_topk"   -> q24Sql,
    "q25_minhash_lsh"   -> q25Sql,
    "q26_simhash"       -> q26Sql,
    "q27_chunker"       -> q27Sql,
    "q28_hash_embed"    -> q28Sql,
    "q29_lsh_ann"       -> q29Sql,
    "q30_asof_join"     -> q30Sql,
    "q31_html_unescape" -> q31Sql,
    "q32_clean_text"    -> q32Sql,
    "q33_date_parse"    -> q33Sql,
    "q34_md5_uuid"      -> q34Sql,
    "q35_ingest_config" -> q35Sql,
    "q36_summarize"     -> q36Sql,
    "q37_statements"    -> q37Sql,
    "q38_fallback_topk" -> q38Sql,
    "q39_nan_null"      -> q39Sql,
    "q40_to_json"       -> q40Sql,
    "q41_layout"        -> q41Sql,
    "q42_html_extract"  -> q42Sql,
    "q43_distinct_union"-> q43Sql,
    "q44_lifecycle"     -> q44Sql,
    "q45_frame_plan"    -> q45Sql,
    "q46_blob_decode"   -> q46Sql,
    "q47_vec_neardup"   -> q47Sql,
    "q48_ivf_ann"       -> q48Sql,
    "q49_json_props"    -> q49Sql,
    "q50_feed_parse"    -> q50Sql,
    "q51_distinct_pct"  -> q51Sql,
    "q52_rollup"        -> q52Sql,
    "q53_timezone"      -> q53Sql,
    "q54_running_sum"   -> q54Sql,
    "q55_term_topk"     -> q55Sql,
    "q56_pivot"         -> q56Sql,
    "q57_edit_distance" -> q57Sql,
    "q58_set_ops"       -> q58Sql,
    "q59_ntile_pctrank" -> q59Sql,
    "q60_unpivot"       -> q60Sql,
    "q61_dedup_clusters"-> q61Sql,
    "q62_tfidf"         -> q62Sql,
    "q63_cube"          -> q63Sql,
    "q64_repetition"    -> q64Sql,
    "q65_hash_split"    -> q65Sql,
    "q66_pack_budget"   -> q66Sql,
    "q67_source_quota"  -> q67Sql,
    "q68_pii_scrub"     -> q68Sql,
    "q69_seeded_shuffle"-> q69Sql,
    "q70_seeded_normal" -> q70Sql,
    "q71_lag_lead"      -> q71Sql,
    "q72_string_agg"    -> q72Sql,
    "q73_stats_moments" -> q73Sql,
    "q74_curation_pipe" -> q74Sql,
    "q75_scd2_history"  -> q75Sql,
    "q77_ivfpq_ann"     -> q77Sql,
    "q78_voice_pick"    -> q78Sql,
    "q79_dropneardups"  -> q79Sql,
    "q80_incr_dedup"    -> q80Sql,
    "q81_strat_sample"  -> q81Sql,
    "q82_hll_sketch"    -> q82Sql,
    "q83_weighted_sample" -> q83Sql,
    "q84_band_join"     -> q84Sql,
    "q85_session_window"-> q85Sql,
    "q86_snapshot_diff" -> q86Sql,
    "q87_decontaminate" -> q87Sql,
    "q88_median_mode"   -> q88Sql,
    "q89_rate_limit"    -> q89Sql,
    "q90_profile"       -> q90Sql,
    "q91_salted_join"   -> q91Sql,
    "q92_grouping_sets" -> q92Sql,
    "q93_stream_lifecycle" -> q93Sql,
    "q94_wav_decode"    -> q94Sql,
    "q95_bm25"          -> q95Sql,
    "q96_temp_mixture"  -> q96Sql,
    "q97_nfc_normalize" -> q97Sql,
    "q98_quantile_sketch" -> q98Sql,
    "q99_bloom_semijoin" -> q99Sql,
    "q100_stream_tumbling" -> q100Sql,
    "q101_variant_json" -> q101Sql,
    "q102_cms_heavyhitters" -> q102Sql,
    "q103_incr_rollup"  -> q103Sql,
    "q104_cdc_apply"    -> q104Sql,
    "q105_refinery"     -> q105Sql,
    "q106_bm25_batch"   -> q106Sql,
    "q107_stream_join"  -> q107Sql,
    "q108_sessionize"   -> q108Sql,
    "q109_png_decode"   -> q109Sql,
    "q110_vi_segment"   -> q110Sql,
    "q111_stream_refinery" -> q111Sql,
    "q112_semantic_dedup" -> q112Sql,
    "q113_sq8_ann"      -> q113Sql,
    "q114_sorted_batching" -> q114Sql,
    "q115_hybrid_rrf"   -> q115Sql,
    "q116_bm25_index"   -> q116Sql,
    "q117_bm25_lifecycle" -> q117Sql,
    "q118_hybrid_lexvec" -> q118Sql,
    "q119_bpe_tokens"   -> q119Sql,
    "q121_y4m_decode"   -> q121Sql,
    "q122_substr_dedup" -> q122Sql,
    "q123_ppl_filter"   -> q123Sql,
    "q124_png_resize"   -> q124Sql,
    "q125_refinery_v2"  -> q125Sql,
    "q126_ppl_per_lang" -> q126Sql,
    "q127_wav_stats"    -> q127Sql,
    "q128_jpeg_decode"  -> q128Sql,
    "q129_hnsw_oracle"  -> q129Sql,
    "q131_hnsw_sharded_oracle" -> q131Sql,
    "q132_stream_outer_join" -> q132Sql,
    "q133_stream_dedup" -> q133Sql,
    "q134_jpeg_resize"  -> q134Sql,
    "q135_jpeg_ac_fidelity" -> q135Sql,
    "q136_modality_dispatch" -> q136Sql,
    "q137_stream_full_outer" -> q137Sql
  )

  /** The full oracle map, INCLUDING oracles generated from fitted
    * model parameters (q76's codebook-literal SQL — available once the
    * query has run in this JVM, which Verify's run-then-dump order
    * guarantees). The driver's correctness gate reads this.
    */
  def oraclesWithFitted: Map[String, String] =
    oracles ++ q76SqlNow.map("q76_pq_ann" -> _) ++
      q120SqlNow.map("q120_semdedup_ivf" -> _) ++
      q130SqlNow.map("q130_ann_staleness" -> _)
}

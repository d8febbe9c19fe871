package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.multimodal.Multimodal
import graft.ops._
import graft.quality.RuleBasedScorer
import graft.similarity.Similarity
import graft.textanalysis.TextAnalysis

/** Relational / stats / session / scalar-function queries — one module of the per-family SparkEntry split (round 14):
  * this family's `queries` entries and their static oracle SQL, plus
  * (after the helper migration) the builders and generated oracles
  * only this family uses. Aggregated by [[SparkEntry]].
  */
private[graft] trait RelationalEntries extends EntryInfra {

  protected def relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.10 /health/ready — the SELECT 1 readiness probe
    "q_health" -> ((s, _) => s.sql("SELECT 1 AS ok")),
    // §2.4 A1+A2+A3 — per-doc view counter + exact unique visitors
    "q_view_stats" -> ((s, d) => StatsOps.viewStats(Tables.events(s, d))),
    // §2.4 A2 — HLL approximate uniques (no oracle; error-bound spec)
    "q_view_stats_approx" -> ((s, d) => StatsOps.viewStatsApprox(Tables.events(s, d))),
    // §2.4 A1/A3 — event-type rollup with exact-decimal value sum
    "q_event_rollup" -> ((s, d) => StatsOps.eventTypeRollup(Tables.events(s, d))),
    // §2.1 S1 + §2.5 W2/W3 — newest-first listing, page 3 of 20
    "q_list_page" -> ((s, d) => RelationalOps.listPage(Tables.orders(s, d), 40, 20)),
    // §2.1 S2 — point lookup by PK
    "q_point_lookup" -> ((s, d) => RelationalOps.pointLookup(Tables.orders(s, d), 42L)),
    // §2.1 S3 — column-pruned status probe
    "q_status_lookup" -> ((s, d) => RelationalOps.statusLookup(Tables.orders(s, d), 42L)),
    // §2.3 J1 — semi-join existence check
    "q_semi_join" -> ((s, d) => RelationalOps.semiJoinExists(Tables.orders(s, d), Tables.customer(s, d), "BUILDING")),
    // §2.3 J3 — anti-join (orphans / cascade)
    "q_anti_join" -> ((s, d) => RelationalOps.antiJoinOrphans(Tables.customer(s, d), Tables.orders(s, d))),
    // §2.3 — the intended documents⋈signatures equi-join + aggregate
    "q_join_agg" -> ((s, d) => RelationalOps.joinAgg(Tables.orders(s, d), Tables.customer(s, d))),
    // §2.1 S6 — update-as-merge with version bump
    "q_merge_update" -> ((s, d) =>
      RelationalOps.mergeUpdates(Tables.orders(s, d), Some(mergeClock))),
    // §2.5 W1 — top-k with deterministic tiebreak
    "q_topk_customers" -> ((s, d) => RelationalOps.topCustomers(Tables.orders(s, d), 10)),
    // bench headline: scan+agg (TPC-H Q1 shape)
    "q_pricing_summary" -> ((s, d) => RelationalOps.pricingSummary(Tables.lineitem(s, d))),
    // bench headline: multi-way join (TPC-H Q5 shape)
    "q_revenue_by_region" -> ((s, d) => RelationalOps.revenueByRegion(
      Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d),
      Tables.nation(s, d), Tables.region(s, d))),
    // §2.9 U1 + §2.4 A4 — rule-based quality scorer
    "q_quality_scores" -> ((s, d) =>
      RuleBasedScorer.score(Tables.documents(s, d), "text")
        .select("doc_id", "lang", "completeness", "consistency",
          "pii_detection", "language_quality", "quality_score",
          "quality_is_valid", "has_pii")
        .orderBy("doc_id")),
    // Curriculum binning: per-lang quality quartiles (ntile over the
    // rule-based score, best first) — bin 1 is the slice a
    // curriculum-ordered training run consumes first
    "q_curriculum" -> ((s, d) =>
      SampleOps.curriculumBins(
        RuleBasedScorer.score(Tables.documents(s, d), "text"),
        "lang", "doc_id", col("quality_score"), 4)
        .select("doc_id", "lang", "quality_score", "bin")
        .orderBy("doc_id")),
    // §2.7 F15 — issue array construction + explode (UDTF-style)
    "q_quality_issues" -> ((s, d) => RuleBasedScorer.issues(
      RuleBasedScorer.score(Tables.documents(s, d), "text"), "doc_id")),
    // §2.2 P7 — BLOCK_LOW_QUALITY gate, rolled up per language
    "q_quality_gate" -> ((s, d) =>
      RuleBasedScorer.qualityGate(
        RuleBasedScorer.score(Tables.documents(s, d), "text"), block = true)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_valid"))
        .orderBy(col("lang"))),
    // §2.1 S7 + §2.2 P1-P4 — CDC envelope encode→decode→filter→flatten
    "q_cdc_pipeline" -> ((s, d) =>
      Cdc.pipeline(Cdc.syntheticEnvelopes(Tables.documents(s, d)))
        .select("op", "doc_id", "lang", "content_size", "status",
          "version", "s3_key", "ts_ms")
        .orderBy("doc_id")),
    // §2.3 J2 — stream-static enrichment join, batch twin (content
    // table is partial so the left join's null path is exercised)
    "q_enrich_content" -> ((s, d) => {
      val flattened = Cdc.pipeline(Cdc.syntheticEnvelopes(Tables.documents(s, d)))
      val content = Tables.documents(s, d)
        .filter(col("doc_id") % 3 =!= 0)
        .select(concat(col("doc_id"), lit("/content")).as("s3_key"),
          col("text").as("content"))
      graft.streaming.Pipelines.enrichWithContent(flattened, content)
        .select(col("doc_id"), col("s3_key"), col("has_content"),
          length(col("blob_content")).cast("long").as("content_len"))
        .orderBy(col("doc_id"))
    }),
    // The STAGED J2 twin (round-11 verdict #4): both join sides
    // co-bucketed on s3_key, so the content lookup merge-joins
    // presorted buckets with zero exchanges — the corpus-side blob
    // table never reshuffles. Shares q_enrich_content's oracle
    // verbatim: staged ≡ one-shot is the hash gate itself
    "q_enrich_content_staged" -> ((s, d) => {
      val flat = builtEnrichFlatTable(s, d)
      graft.streaming.Pipelines.enrichWithContentStaged(s, flat,
        flat + "_content")
        .select(col("doc_id"), col("s3_key"), col("has_content"),
          length(col("blob_content")).cast("long").as("content_len"))
        .orderBy(col("doc_id"))
    }),
    // §2.2 P8 + §2.7 F1/F12 — validation predicates as columns
    "q_validation" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.isValidTitle(col("text")).as("valid_title"),
        TextFunctions.withinSizeLimit(col("text"), 500).as("within_limit"),
        TextFunctions.isValidEmail(concat(col("source"), lit("@example.com")))
          .as("valid_email"))
        .orderBy("doc_id")),
    // §2.7 F9 — deterministic uuid7-style time-ordered ids
    "q_uuid7" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.uuid7((col("doc_id") * 1000L + 1700000000000L),
          col("source")).as("uid"))
        .orderBy("doc_id")),
    // §2.8 ST1 — the full quality pipeline (CDC → enrich), batch
    // parity twin of the streaming transform (same functions)
    "q_enrichment_pipeline" -> ((s, d) =>
      graft.streaming.Pipelines.enrichedProjection(
        graft.streaming.Pipelines.qualityEnrich(
          Cdc.syntheticEnvelopes(Tables.documents(s, d))))
        .orderBy("doc_id")),
    // §2.4 A2 — mergeable HLL sketches (PFADD/PFMERGE parity)
    "q_view_stats_sketch" -> ((s, d) =>
      StatsOps.viewStatsSketched(Tables.events(s, d))),
    // grouping sets: full CUBE with margins over status × priority
    "q_cube" -> ((s, d) => RelationalOps.statusPriorityCube(Tables.orders(s, d))),
    // §2.6 set operations: INTERSECT / EXCEPT with distinct semantics
    "q_set_ops" -> ((s, d) => RelationalOps.setOps(Tables.customer(s, d), Tables.orders(s, d))),
    // Clickstream: sessionization (lag + boundary cumsum), per-session stats
    "q_sessionize" -> ((s, d) => SessionOps.sessionStats(Tables.events(s, d))),
    // Clickstream: hourly event rollup (the canonical aggregation)
    "q_hourly_events" -> ((s, d) => SessionOps.hourlyRollup(Tables.events(s, d))),
    // Clickstream: view→click→purchase conversion funnel (min-ts
    // chaining per user; strictly-after semantics)
    "q_funnel" -> ((s, d) => SessionOps.funnel(Tables.events(s, d),
      Seq("view", "click", "purchase"))),
    // Funnel with a conversion window: each step within 24h of the
    // previous step's earliest qualifying completion
    "q_funnel_window" -> ((s, d) => SessionOps.funnel(Tables.events(s, d),
      Seq("view", "click", "purchase"),
      maxStepGapMicros = Some(24L * 3600 * 1000 * 1000))),
    // Clickstream: weekly cohort retention triangle
    "q_retention" -> ((s, d) =>
      SessionOps.retentionCohorts(Tables.events(s, d))),
    // Clickstream: first-order event-type transition matrix
    "q_transitions" -> ((s, d) =>
      SessionOps.eventTransitions(Tables.events(s, d))),
    // Clickstream: exponentially time-decayed value by type (24 h
    // half-life anchored at the corpus max timestamp)
    "q_trending" -> ((s, d) =>
      StatsOps.trendingByType(Tables.events(s, d))),
    // §2.5 window functions: running totals, row_number, lag gaps
    "q_running_totals" -> ((s, d) => SessionOps.runningUserTotals(Tables.events(s, d))),
    // grouping sets: region→nation ROLLUP with subtotals + grand total
    "q_rollup" -> ((s, d) => SessionOps.regionNationRollup(
      Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))),
    // Skew mitigation: salted equi-join, row-identical to the plain
    // join (the oracle IS the unsalted join)
    "q_salted_join" -> ((s, d) => {
      val fact = Tables.orders(s, d)
        .select(col("o_custkey").as("custkey"), col("o_totalprice"))
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      Skew.saltedJoin(fact, dim, "custkey", saltFactor = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
        .orderBy(col("c_mktsegment"))
    }),
    // Bounded range join: views within 10 min before each purchase
    // (time-bucketed probe join — no per-key cross product)
    "q_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("tus", expr("ts div 1000"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tus"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("tus"))
      // purchases carry their PK (event_id), so the no-join-back
      // grouped path applies: one aggregation shuffle total
      SessionOps.windowedCountJoin(purchases, views, "user_id", "tus",
        600000000L, "n_views_10m", leftRowsDistinct = true)
        .select(col("event_id"), col("user_id"), col("n_views_10m"))
        .orderBy(col("event_id"))
    }),
    // As-of join: each purchase picks up the user's latest view ≤ ts
    // (union + running last_value — no range-join explosion)
    "q_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("tus", expr("ts div 1000"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tus"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("tus"), col("event_id"))
      SessionOps.asofJoin(purchases, views, "user_id", "tus",
        "event_id", "view_event")
        .orderBy(col("event_id"))
    }),
    // §2.7 scalar surface in one sweep: F6 ISO format, F7 epoch-ms,
    // F10 UUID shape, F11 JSON in/out, F13 enum coercion, F16 coalesce
    "q_scalar_funcs" -> ((s, d) => {
      val t = TextFunctions.eventTs(col("ts"))
      Tables.events(s, d).select(
        col("event_id"),
        TextFunctions.isoFormat(t).as("iso_ts"),
        TextFunctions.toEpochMillis(t).as("epoch_ms"),
        StatsOps.docKey(col("props")).as("prop_k"),
        to_json(struct(col("event_id"), col("event_type"))).as("payload"),
        when(col("event_type").isin("view", "click"), "engagement")
          .when(col("event_type") === "purchase", "conversion")
          .otherwise("other").as("event_class"),
        coalesce(get_json_object(col("props"), "$.ip"), lit("unknown"))
          .as("client_ip"),
        TextFunctions.isValidUuid(concat(
          lpad(hex(col("event_id")), 8, "0"),
          lit("-0000-7000-8000-00000000000"),
          when(col("event_id") % 7 === 0, lit("")).otherwise(lit("0"))))
          .as("uuid_ok"))
        .orderBy("event_id")
    }),
    // Exact per-type value percentiles (sort-based agg; approx path
    // documented in StatsOps for sketch-mergeable scale)
    "q_value_percentiles" -> ((s, d) =>
      StatsOps.valuePercentiles(Tables.events(s, d))),
    // Sketch percentiles (mergeable, fixed-size state — the 100 TB
    // path); rows-only: sketch internals are engine-specific
    "q_value_percentiles_approx" -> ((s, d) =>
      StatsOps.valuePercentilesApprox(Tables.events(s, d))),
  )

  protected def relationalStaticOracles: Map[String, String] = Map(
    "q_health" -> "SELECT 1 AS ok",
    "q_view_stats" ->
      """SELECT CAST(props->>'$.k' AS BIGINT) AS doc_id,
         count(*) AS total_views,
         count(DISTINCT user_id) AS unique_views
         FROM events WHERE event_type = 'view'
         GROUP BY 1 ORDER BY doc_id""",
    "q_event_rollup" ->
      """SELECT event_type,
         count(*) AS n_events,
         count(DISTINCT user_id) AS n_users,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY event_type""",
    "q_list_page" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
         FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC
         LIMIT 20 OFFSET 40""",
    "q_point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
         FROM orders WHERE o_orderkey = 42""",
    "q_status_lookup" ->
      "SELECT o_orderstatus FROM orders WHERE o_orderkey = 42",
    "q_semi_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer
                             WHERE c_mktsegment = 'BUILDING')
         ORDER BY o_orderkey""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "q_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         count(DISTINCT o_custkey) AS n_customers,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY c_mktsegment""",
    "q_merge_update" ->
      s"""SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 10 = 0
              THEN CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 10 = 0 THEN 2 ELSE 1 END AS version,
         CASE WHEN o_orderkey % 10 = 0 THEN '$mergeClockIso' ELSE NULL END AS updated_at
         FROM orders ORDER BY o_orderkey""",
    "q_topk_customers" ->
      """SELECT o_custkey, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM orders GROUP BY 1
         ORDER BY total_value DESC, o_custkey LIMIT 10""",
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,6))) AS DECIMAL(34,6)) AS VARCHAR) AS sum_disc_price,
         CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(30,8))) AS DECIMAL(38,8)) AS VARCHAR) AS sum_charge,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""",
    "q_revenue_by_region" ->
      """SELECT r_name,
         CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,6))) AS DECIMAL(34,6)) AS VARCHAR) AS revenue,
         count(DISTINCT o_custkey) AS n_customers
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY r_name""",
    "q_quality_scores" -> (qualityScoreCte +
      """SELECT doc_id, lang, completeness, consistency, pii_detection,
         language_quality,
         (3*completeness + 3*consistency + 2*pii_detection + 2*language_quality)/10.0 AS quality_score,
         (3*completeness + 3*consistency + 2*pii_detection + 2*language_quality)/10.0 >= 50.0 AS quality_is_valid,
         pii_detection = 0 AS has_pii
         FROM s ORDER BY doc_id"""),
    "q_curriculum" -> (qualityScoreCte +
      """SELECT doc_id, lang,
         (3*completeness + 3*consistency + 2*pii_detection + 2*language_quality)/10.0 AS quality_score,
         ntile(4) OVER (PARTITION BY lang
           ORDER BY (3*completeness + 3*consistency + 2*pii_detection + 2*language_quality)/10.0 DESC,
                    doc_id) AS bin
         FROM s ORDER BY doc_id"""),
    "q_quality_issues" -> (qualityScoreCte +
      """SELECT * FROM (
           SELECT doc_id, 'completeness' AS issue_type, 'medium' AS severity, 'content' AS field FROM s WHERE completeness < 50
           UNION ALL
           SELECT doc_id, 'consistency', 'low', 'content' FROM s WHERE consistency < 40
           UNION ALL
           SELECT doc_id, 'pii', 'high', 'content' FROM s WHERE pii_detection = 0
           UNION ALL
           SELECT doc_id, 'language_quality', 'low', 'content' FROM s WHERE language_quality < 30
         ) ORDER BY doc_id, issue_type"""),
    "q_quality_gate" -> (qualityScoreCte +
      """SELECT lang, count(*) AS n_valid FROM s
         WHERE (3*completeness + 3*consistency + 2*pii_detection + 2*language_quality)/10.0 >= 50.0
         GROUP BY lang ORDER BY lang"""),
    "q_cdc_pipeline" ->
      """WITH e AS (
           SELECT CASE WHEN doc_id % 20 = 0 THEN 'd'
                       WHEN doc_id % 20 = 1 THEN 'r'
                       WHEN doc_id % 2 = 0 THEN 'c' ELSE 'u' END AS op,
                  doc_id, lang, n_chars AS content_size,
                  'created' AS status, 1 AS version,
                  doc_id || '/content' AS s3_key, doc_id * 1000 AS ts_ms
           FROM documents)
         SELECT * FROM e WHERE op NOT IN ('r', 'd') ORDER BY doc_id""",
    "q_enrich_content" ->
      """WITH e AS (
           SELECT CASE WHEN doc_id % 20 = 0 THEN 'd'
                       WHEN doc_id % 20 = 1 THEN 'r'
                       WHEN doc_id % 2 = 0 THEN 'c' ELSE 'u' END AS op,
                  doc_id, doc_id || '/content' AS s3_key
           FROM documents),
         k AS (SELECT * FROM e WHERE op NOT IN ('r', 'd')),
         c AS (SELECT doc_id || '/content' AS s3_key, text
               FROM documents WHERE doc_id % 3 <> 0)
         SELECT k.doc_id, k.s3_key,
           c.text IS NOT NULL AS has_content,
           length(c.text) AS content_len
         FROM k LEFT JOIN c ON k.s3_key = c.s3_key
         ORDER BY k.doc_id""",
    "q_validation" ->
      """SELECT doc_id,
         length(text) BETWEEN 1 AND 255 AS valid_title,
         strlen(text) <= 500 AS within_limit,
         regexp_matches(source || '@example.com',
           '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$') AS valid_email
         FROM documents ORDER BY doc_id""",
    "q_uuid7" ->
      """WITH u AS (
           SELECT doc_id,
             lpad(hex(doc_id * 1000 + 1700000000000), 12, '0') AS ts_hex,
             md5(concat_ws('|', doc_id * 1000 + 1700000000000, source)) AS h
           FROM documents)
         SELECT doc_id,
           substring(ts_hex,1,8) || '-' || substring(ts_hex,9,4) || '-7' ||
           substring(h,1,3) || '-' || substring(h,4,4) || '-' || substring(h,8,12) AS uid
         FROM u ORDER BY doc_id""",
    "q_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY c_mktsegment""",
    "q_range_join" ->
      """SELECT p.event_id, p.user_id,
         (SELECT count(*) FROM events v
          WHERE v.event_type = 'view' AND v.user_id = p.user_id
            AND epoch_us(v.ts) > epoch_us(p.ts) - 600000000
            AND epoch_us(v.ts) <= epoch_us(p.ts)) AS n_views_10m
         FROM events p WHERE p.event_type = 'purchase'
         ORDER BY p.event_id""",
    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS tus,
         (SELECT v.event_id FROM events v
          WHERE v.event_type = 'view' AND v.user_id = p.user_id
            AND epoch_us(v.ts) <= epoch_us(p.ts)
          ORDER BY epoch_us(v.ts) DESC, v.event_id DESC LIMIT 1) AS view_event
         FROM events p WHERE p.event_type = 'purchase'
         ORDER BY p.event_id""",
    "q_scalar_funcs" ->
      """SELECT event_id,
         strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS iso_ts,
         CAST(epoch_us(ts) // 1000 AS BIGINT) AS epoch_ms,
         CAST(props->>'$.k' AS BIGINT) AS prop_k,
         CAST(to_json(struct_pack(event_id := event_id, event_type := event_type)) AS VARCHAR) AS payload,
         CASE WHEN event_type IN ('view','click') THEN 'engagement'
              WHEN event_type = 'purchase' THEN 'conversion'
              ELSE 'other' END AS event_class,
         coalesce(props->>'$.ip', 'unknown') AS client_ip,
         regexp_matches(lpad(hex(event_id), 8, '0') || '-0000-7000-8000-00000000000' ||
           CASE WHEN event_id % 7 = 0 THEN '' ELSE '0' END,
           '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$') AS uuid_ok
         FROM events ORDER BY event_id""",
    "q_value_percentiles" ->
      """SELECT event_type,
         round(quantile_cont(value, 0.5), 4) AS p50,
         round(quantile_cont(value, 0.9), 4) AS p90,
         round(quantile_cont(value, 0.99), 4) AS p99,
         min(value) AS v_min, max(value) AS v_max
         FROM events GROUP BY 1 ORDER BY event_type""",
    "q_enrichment_pipeline" ->
      """WITH e AS (
           SELECT CASE WHEN doc_id % 20 = 0 THEN 'd'
                       WHEN doc_id % 20 = 1 THEN 'r'
                       WHEN doc_id % 2 = 0 THEN 'c' ELSE 'u' END AS op,
                  doc_id, text, lang, n_chars
           FROM documents),
         k AS (SELECT * FROM e WHERE op NOT IN ('r','d')),
         w AS (
           SELECT doc_id, lang, n_chars, substring(text, 1, 1024) AS tx,
                  string_split(substring(text, 1, 1024), ' ') AS ws
           FROM k),
         s AS (
           SELECT doc_id, lang, n_chars,
             CAST(least(100, floor(length(tx)/5)) AS BIGINT) AS completeness,
             CAST(CASE WHEN len(ws) < 3 THEN 0
                  ELSE floor(len(list_distinct(ws)) * 100 / len(ws)) END AS BIGINT) AS consistency,
             CAST(CASE WHEN regexp_matches(tx, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
                         OR regexp_matches(tx, '[0-9]{3}-[0-9]{2}-[0-9]{4}')
                         OR regexp_matches(tx, '\+?[0-9][0-9 ()-]{7,14}[0-9]')
                    THEN 0 ELSE 100 END AS BIGINT) AS pii_detection,
             CAST(least(100, floor(len(list_filter(ws, x -> x IN ('the','a'))) * 1000 / len(ws))) AS BIGINT) AS language_quality
           FROM w)
         SELECT doc_id, lang, n_chars AS content_size,
           'created' AS status, 1 AS version,
           (3*completeness + 3*consistency + 2*pii_detection + 2*language_quality)/10.0 AS quality_score,
           (3*completeness + 3*consistency + 2*pii_detection + 2*language_quality)/10.0 >= 50.0 AS quality_is_valid,
           pii_detection = 0 AS has_pii,
           completeness, consistency, pii_detection, language_quality,
           'rule-based' AS quality_provider, 'graft-v1' AS quality_model
         FROM s ORDER BY doc_id""",
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM orders
         GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_set_ops" ->
      """WITH seg AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         open AS (SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O')
         SELECT c_custkey, 'intersect' AS set_op FROM (SELECT * FROM seg INTERSECT SELECT * FROM open)
         UNION ALL
         SELECT c_custkey, 'except' AS set_op FROM (SELECT * FROM seg EXCEPT SELECT * FROM open)
         ORDER BY set_op, c_custkey""",
    "q_sessionize" ->
      """WITH o AS (
           SELECT user_id, event_id, epoch_us(ts) AS tns, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         s AS (
           SELECT *, CAST(sum(new_session) OVER
             (PARTITION BY user_id ORDER BY tns, event_id ROWS UNBOUNDED PRECEDING)
             AS BIGINT) AS session_idx
           FROM o)
         SELECT user_id, session_idx, count(*) AS n_events,
           min(event_id) AS first_event,
           CAST(floor((max(tns) - min(tns)) / 1000) AS BIGINT) AS duration_ms,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM s GROUP BY 1, 2 ORDER BY user_id, session_idx""",
    "q_funnel_window" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
         s1 AS (SELECT user_id, min(t) AS t FROM e
                WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(e.t) AS t FROM e
                JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND e.t > s1.t
                  AND e.t - s1.t <= 86400000000 GROUP BY 1),
         s3 AS (SELECT e.user_id, min(e.t) AS t FROM e
                JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.t > s2.t
                  AND e.t - s2.t <= 86400000000 GROUP BY 1)
         SELECT 1 AS stage, 'view' AS step,
                (SELECT count(*) FROM s1) AS n_users
         UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
         UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
         ORDER BY stage""",
    "q_retention" ->
      """WITH pu AS (SELECT user_id, epoch_us(ts) // 604800000000 AS p
                     FROM events),
         f AS (SELECT user_id, min(p) AS p0 FROM pu GROUP BY 1),
         c AS (SELECT DISTINCT pu.user_id, f.p0 AS cohort,
                 pu.p - f.p0 AS period_offset
               FROM pu JOIN f USING (user_id))
         SELECT cohort, period_offset, count(*) AS n_users
         FROM c GROUP BY 1, 2 ORDER BY cohort, period_offset""",
    "q_transitions" ->
      """WITH pr AS (SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
           FROM events),
         c AS (SELECT from_type, to_type, count(*) AS n FROM pr
               WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 4)
             AS p
         FROM c ORDER BY from_type, to_type""",
    // decay terms: exponent = exact-integer-micro division (identical
    // doubles), pow is libm so each term rounds to integer micro-value
    // before the exact long sum — the LM micro-nat contract
    "q_trending" ->
      """WITH t AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
         e AS (SELECT event_type,
             CAST(round(value * pow(2.0,
               (epoch_us(ts) - tmax) / CAST(86400000000 AS DOUBLE)) * 1e6)
               AS BIGINT) AS term6
           FROM events CROSS JOIN t)
         SELECT event_type, count(*) AS n_events,
           round(sum(term6) / 1e6, 4) AS decayed_value
         FROM e GROUP BY 1 ORDER BY event_type""",
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
         s1 AS (SELECT user_id, min(t) AS t FROM e
                WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(e.t) AS t FROM e
                JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND e.t > s1.t GROUP BY 1),
         s3 AS (SELECT e.user_id, min(e.t) AS t FROM e
                JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.t > s2.t GROUP BY 1)
         SELECT 1 AS stage, 'view' AS step,
                (SELECT count(*) FROM s1) AS n_users
         UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
         UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
         ORDER BY stage""",
    "q_hourly_events" ->
      """SELECT strftime(make_timestamp((epoch_us(ts) // 3600000000) * 3600000000),
                '%Y-%m-%d %H:00:00') AS hour,
         event_type, count(*) AS n_events,
         count(DISTINCT user_id) AS n_users,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q_running_totals" ->
      """SELECT user_id, event_id,
         CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
           (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
            ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value,
         CAST(row_number() OVER
           (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS INT) AS event_seq,
         CAST(floor((epoch_us(ts) - lag(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)) / 1000) AS BIGINT) AS gap_ms
         FROM events ORDER BY user_id, event_seq""",
    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",
  )

  /** Stage-once CO-BUCKETED enrichment inputs (flattened CDC frame +
    * blob/content table, both on s3_key) — the J2 staging
    * ([[graft.streaming.Pipelines.stageEnrichInputs]]). One builder
    * stages both tables; the second accessor just resolves the name.
    */
  protected def builtEnrichFlatTable(s: SparkSession, d: String): String =
    builtTable("graft_enrflat", d) { t =>
      graft.streaming.Pipelines.stageEnrichInputs(
        Cdc.pipeline(Cdc.syntheticEnvelopes(Tables.documents(s, d))),
        Tables.documents(s, d)
          .filter(col("doc_id") % 3 =!= 0)
          .select(concat(col("doc_id"), lit("/content")).as("s3_key"),
            col("text").as("content")),
        t, t + "_content")
    }

  /** Shared CTE replicating RuleBasedScorer's integer rubric in
    * DuckDB (sub-scores only; overall derived per query).
    */
  protected val qualityScoreCte: String =
    """WITH w AS (
         SELECT doc_id, lang, substring(text, 1, 1024) AS tx,
                string_split(substring(text, 1, 1024), ' ') AS ws
         FROM documents),
       s AS (
         SELECT doc_id, lang,
           CAST(least(100, floor(length(tx)/5)) AS BIGINT) AS completeness,
           CAST(CASE WHEN len(ws) < 3 THEN 0
                ELSE floor(len(list_distinct(ws)) * 100 / len(ws)) END AS BIGINT) AS consistency,
           CAST(CASE WHEN regexp_matches(tx, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
                       OR regexp_matches(tx, '[0-9]{3}-[0-9]{2}-[0-9]{4}')
                       OR regexp_matches(tx, '\+?[0-9][0-9 ()-]{7,14}[0-9]')
                  THEN 0 ELSE 100 END AS BIGINT) AS pii_detection,
           CAST(least(100, floor(len(list_filter(ws, x -> x IN ('the','a'))) * 1000 / len(ws))) AS BIGINT) AS language_quality
         FROM w)
    """
}

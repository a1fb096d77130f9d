package graft.queries

/** DuckDB-SQL twins of [[CoreQueries]] (and the extension queries), run by
  * the driver on the same parquet tables. Column names and the *shape* of
  * every float expression mirror the Spark side exactly — see
  * graft.functions.Determinism for why aggregated doubles are integerized
  * via floor(x*scale + 0.5) before SUM.
  */
object Oracle {

  /** Shared sensor view: must stay in lockstep with Tables.sensorReadings. */
  val SENSOR: String =
    """sensor AS (
      |  SELECT event_id,
      |         'sensor_' || CAST(user_id % 80 AS VARCHAR) AS sensor_id,
      |         epoch_ms(ts) AS ts_ms,
      |         epoch_us(ts) AS ts_us,
      |         value, event_type
      |  FROM events)""".stripMargin

  /** (CAST(SUM(int-scaled x) AS DOUBLE) / COUNT) / scale — exact average. */
  private def exactAvg(x: String, scale: String): String =
    s"(CAST(sum(CAST(floor($x * $scale + 0.5) AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE)) / $scale"

  private def exactSum(x: String, scale: String): String =
    s"CAST(sum(CAST(floor($x * $scale + 0.5) AS BIGINT)) AS DOUBLE) / $scale"

  val q01: String =
    s"""WITH $SENSOR
       |SELECT token, count(*) AS cnt
       |FROM (SELECT unnest(string_split(sensor_id, '_')) AS token
       |      FROM sensor WHERE value >= 25) t
       |GROUP BY token""".stripMargin

  val q02: String =
    s"""WITH $SENSOR,
       |r AS (SELECT sensor_id, event_id, value,
       |        row_number() OVER (PARTITION BY sensor_id ORDER BY value DESC, event_id ASC) AS rn
       |      FROM sensor)
       |SELECT sensor_id, event_id, value FROM r WHERE rn = 1""".stripMargin

  val q03: String =
    """SELECT CAST(f0 AS BIGINT) AS f0, CAST(sum(f1) AS BIGINT) AS sum_f1
      |FROM (VALUES (1,2,2),(2,3,1),(2,2,4),(1,5,3)) AS t(f0,f1,f2)
      |GROUP BY f0""".stripMargin

  val q04: String =
    s"""WITH $SENSOR,
       |t AS (SELECT sensor_id, ((ts_ms // 5000) + 1) * 5000 AS window_end_ms,
       |        (value - 32) * 5.0 / 9.0 AS temp_c
       |      FROM sensor)
       |SELECT sensor_id, window_end_ms, ${exactAvg("temp_c", "1000000.0")} AS avg_temp
       |FROM t GROUP BY sensor_id, window_end_ms""".stripMargin

  /** NOTE: deliberately NOT DuckDB ASOF JOIN — DuckDB pushes a post-join
    * level filter into the as-of match, which changes semantics to "latest
    * HIGH control" instead of "latest control, kept only if HIGH". We build
    * the same lead() validity intervals the Spark AsOfJoin uses. Duplicate
    * control timestamps are collapsed with max(level), mirroring
    * AsOfJoin's deterministic max-struct dedup. */
  val q05: String =
    s"""WITH $SENSOR,
       |control AS (SELECT ts_us, max(CASE WHEN value > 150 THEN 'HIGH' ELSE 'LOW' END) AS level
       |            FROM sensor WHERE event_type = 'error' GROUP BY ts_us),
       |c2 AS (SELECT ts_us, level, lead(ts_us) OVER (ORDER BY ts_us) AS next_ts FROM control),
       |readings AS (SELECT event_id, sensor_id, ts_us, value FROM sensor
       |             WHERE event_type <> 'error' AND value > 100)
       |SELECT r.event_id, r.sensor_id, r.value, c.level
       |FROM readings r JOIN c2 c
       |  ON r.ts_us >= c.ts_us AND (c.next_ts IS NULL OR r.ts_us < c.next_ts)
       |WHERE c.level = 'HIGH'""".stripMargin

  val q06: String =
    s"""WITH $SENSOR,
       |slid AS (SELECT sensor_id, value,
       |           ((ts_ms // 15000) - i) * 15000 + 60000 AS window_end_ms
       |         FROM sensor CROSS JOIN (SELECT unnest([0,1,2,3]) AS i) shifts)
       |SELECT sensor_id, window_end_ms, count(*) AS cnt,
       |       ${exactAvg("value", "1000000.0")} AS avg_value
       |FROM slid GROUP BY sensor_id, window_end_ms""".stripMargin

  val q07: String =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, epoch_ms(ts) AS ts_ms FROM events),
      |flagged AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |                            OR ts_us - lag(ts_us) OVER w >= 60000000 THEN 1 ELSE 0 END AS new_s
      |            FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      |sess AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
      |                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |         FROM flagged)
      |SELECT user_id, CAST(min(ts_ms) AS BIGINT) AS session_start_ms,
      |       count(*) AS n_events, CAST(max(ts_ms) - min(ts_ms) AS BIGINT) AS duration_ms
      |FROM sess GROUP BY user_id, sid""".stripMargin

  val q08: String =
    s"""WITH $SENSOR,
       |t AS (SELECT sensor_id, event_id, value,
       |        lag(value) OVER (PARTITION BY sensor_id ORDER BY ts_us, event_id) AS prev_value
       |      FROM sensor)
       |SELECT sensor_id, event_id, value, value - prev_value AS delta
       |FROM t WHERE abs(value - prev_value) > 1.7""".stripMargin

  val q09: String =
    s"""WITH $SENSOR
       |SELECT a.sensor_id, count(*) AS n_pairs
       |FROM sensor a JOIN sensor b ON a.sensor_id = b.sensor_id
       |  AND b.ts_ms >= a.ts_ms - 3600000 AND b.ts_ms <= a.ts_ms + 900000
       |GROUP BY a.sensor_id""".stripMargin

  val q10: String =
    """WITH o AS (SELECT o_orderkey, epoch_ms(o_orderdate) // 86400000 AS d FROM orders),
      |l AS (SELECT l_orderkey, epoch_ms(l_shipdate) // 86400000 AS d FROM lineitem)
      |SELECT CAST(o.d * 86400000 AS BIGINT) AS day_ms, count(*) AS n_pairs
      |FROM o JOIN l ON o.o_orderkey = l.l_orderkey AND o.d = l.d
      |GROUP BY o.d""".stripMargin

  val q11: String =
    s"""WITH u AS (
       |  SELECT * FROM events WHERE event_type = 'click'
       |  UNION ALL
       |  SELECT * FROM events WHERE event_type = 'purchase')
       |SELECT event_type, count(*) AS cnt, ${exactSum("value", "100.0")} AS sum_value
       |FROM u GROUP BY event_type""".stripMargin

  val q12: String =
    s"""WITH $SENSOR,
       |t AS (SELECT *, max(ts_ms) OVER (ORDER BY event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev_ms FROM sensor),
       |f AS (SELECT sensor_id, ((ts_ms // 5000) + 1) * 5000 AS window_end_ms,
       |        CASE WHEN max_prev_ms IS NULL OR ts_ms >= max_prev_ms - 5000 THEN 1 ELSE 0 END AS keep_strict,
       |        CASE WHEN max_prev_ms IS NULL OR ts_ms >= max_prev_ms - 10000 THEN 1 ELSE 0 END AS keep_late
       |      FROM t)
       |SELECT sensor_id, window_end_ms, CAST(sum(keep_strict) AS BIGINT) AS cnt_strict,
       |       CAST(sum(keep_late) AS BIGINT) AS cnt_late
       |FROM f GROUP BY sensor_id, window_end_ms""".stripMargin

  val q13: String =
    s"""WITH $SENSOR,
       |t AS (SELECT sensor_id, value,
       |        row_number() OVER (PARTITION BY sensor_id ORDER BY ts_us, event_id) AS rn
       |      FROM sensor)
       |SELECT sensor_id, CAST((rn - 1) // 10 AS BIGINT) AS grp, count(*) AS n_events,
       |       ${exactAvg("value", "1000000.0")} AS avg_value
       |FROM t GROUP BY sensor_id, grp""".stripMargin

  val q14: String =
    s"""WITH $SENSOR
       |SELECT sensor_id, ${exactAvg("value", "100.0")} AS avg_value
       |FROM sensor GROUP BY sensor_id""".stripMargin

  val q15: String = q04 // the txn sink must reproduce the flagship result exactly

  val q18: String =
    s"""WITH $SENSOR,
       |r AS (SELECT sensor_id, event_id, value,
       |        row_number() OVER (PARTITION BY sensor_id ORDER BY value ASC, event_id ASC) AS rn_min,
       |        row_number() OVER (PARTITION BY sensor_id ORDER BY value DESC, event_id ASC) AS rn_max
       |      FROM sensor)
       |SELECT sensor_id, min(value) AS min_value, max(value) AS max_value,
       |       max(CASE WHEN rn_min = 1 THEN event_id END) AS argmin_event,
       |       max(CASE WHEN rn_max = 1 THEN event_id END) AS argmax_event
       |FROM r WHERE rn_min = 1 OR rn_max = 1
       |GROUP BY sensor_id""".stripMargin

  val q19: String =
    s"""WITH $SENSOR,
       |r AS (SELECT sensor_id, value,
       |        row_number() OVER (PARTITION BY sensor_id ORDER BY value ASC, event_id ASC) AS rn,
       |        count(*) OVER (PARTITION BY sensor_id) AS cnt
       |      FROM sensor)
       |SELECT sensor_id, sum(value) / count(*) AS median_value
       |FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
       |GROUP BY sensor_id""".stripMargin

  val q16: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${exactSum("l_quantity", "100.0")} AS sum_qty,
       |  ${exactSum("l_extendedprice", "100.0")} AS sum_base_price,
       |  ${exactSum("l_extendedprice * (1 - l_discount)", "10000.0")} AS sum_disc_price,
       |  ${exactSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "10000.0")} AS sum_charge,
       |  ${exactAvg("l_quantity", "100.0")} AS avg_qty,
       |  ${exactAvg("l_extendedprice", "100.0")} AS avg_price,
       |  ${exactAvg("l_discount", "10000.0")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  val q17: String =
    s"""SELECT c_mktsegment, count(*) AS n_items,
       |  ${exactSum("l_extendedprice * (1 - l_discount)", "10000.0")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |              JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment""".stripMargin
}

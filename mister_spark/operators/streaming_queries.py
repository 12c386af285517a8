"""Streaming operators exposed through the driver contract.

Each callable runs the stream to completion (availableNow bounded
replay) and returns the materialized result. Where the replay's final
table is a deterministic function of the input (tumbling/sliding
windows, sessionization, dedup over unique keys, interval joins,
(ts, event_id)-ordered quota and CDC merge), the op carries the exact
DuckDB oracle of its BATCH twin — the streaming-vs-batch parity that
tests/test_streaming.py pins is what licenses reusing the batch SQL.
Ops whose output depends on physical streaming artifacts (progress
metrics, checkpoints, watermark-tail withholding) stay rows-only with
pytest behavior gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mister_spark.registry import query
from mister_spark.streaming import (
    run_stream_cdc_merge,
    run_stream_dedup,
    run_stream_enrich,
    run_stream_quota,
    run_stream_sessionize,
    run_stream_sliding,
    run_stream_sliding_update,
    run_stream_stream_join,
    run_stream_stream_left_join,
    run_stream_tumbling,
    run_stream_tumbling_append,
)

# The 30-min sliding / 1-h tumbling aggregates and the sessionizer
# share their SQL with the batch twins (ev_tumbling / ev_sliding /
# ev_sessionize) minus any batch-only columns.
_SLIDING_SQL = """
    WITH t AS (SELECT event_type, value, epoch_us(ts) AS tus FROM events),
    w AS (SELECT event_type, value,
                 unnest([((tus // 1800000000) - 1) * 1800000000,
                         (tus // 1800000000) * 1800000000]) AS wstart_us
          FROM t)
    SELECT wstart_us, event_type, COUNT(*) AS n,
           FLOOR((SUM(value)) * 100 + 0.5) / 100 AS total
    FROM w GROUP BY 1, 2
    """


@query(
    "stream_tumbling",
    # Real oracle: complete-mode availableNow replay of the tumbling
    # aggregate equals the batch ev_tumbling rollup (parity pinned in
    # tests/test_streaming.py), so the oracle is that SQL without the
    # batch-only avg_value column.
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type, COUNT(*) AS n,
           FLOOR((SUM(value)) * 100 + 0.5) / 100 AS total
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_tumbling(spark, sf_dir)


@query(
    "stream_tumbling_append",
    # Real oracle: append mode emits exactly the windows whose end the
    # FINAL watermark (max event time - 1 h) passed — the batch rollup
    # filtered to closed windows (emission contract pinned in
    # tests/test_streaming.py::test_stream_tumbling_append_...).
    oracle="""
    WITH wm AS (SELECT MAX(ts) - INTERVAL 1 HOUR AS w FROM events)
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type, COUNT(*) AS n,
           FLOOR((SUM(value)) * 100 + 0.5) / 100 AS total
    FROM events, wm
    GROUP BY 1, 2, wm.w
    HAVING date_trunc('hour', ANY_VALUE(ts)) + INTERVAL 1 HOUR <= wm.w
    """,
)
def stream_tumbling_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_tumbling_append(spark, sf_dir)


@query(
    "stream_dedup",
    # Real oracle: event_id is the dedup key; with unique event_ids
    # (the testdata invariant the batch twin also relies on) the kept
    # set is every event's (event_id, user_id, event_type) regardless
    # of arrival order.
    oracle="""
    SELECT DISTINCT ON (event_id) event_id, user_id, event_type
    FROM events ORDER BY event_id
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_dedup(spark, sf_dir)


@query(
    "stream_session_state",
    # Real oracle: the applyInPandasWithState sessionizer equals the
    # batch gap-sessionize (parity pinned in tests/test_streaming.py),
    # so the oracle is ev_sessionize's SQL.
    oracle="""
    WITH t AS (
      SELECT user_id, epoch_us(ts) AS tus FROM events),
    flagged AS (
      SELECT user_id, tus,
             CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id
                                            ORDER BY tus)
                       > 1800000000 OR
                  LAG(tus) OVER (PARTITION BY user_id ORDER BY tus)
                    IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM t),
    sess AS (
      SELECT user_id, tus,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus
                                      ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS sess_id
      FROM flagged)
    SELECT user_id, sess_id, COUNT(*) AS n_events,
           MIN(tus) AS start_us, MAX(tus) AS end_us
    FROM sess GROUP BY user_id, sess_id
    """,
)
def stream_session_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_sessionize(spark, sf_dir)


@query("stream_sliding", oracle=_SLIDING_SQL)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_sliding(spark, sf_dir)


@query("stream_sliding_update", oracle=_SLIDING_SQL)
def stream_sliding_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_sliding_update(spark, sf_dir)


@query(
    "stream_enrich",
    # Real oracle: stream-static broadcast join + complete-mode rollup
    # equals the batch join/aggregate (parity pinned in tests).
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n,
           FLOOR((SUM(e.value)) * 100 + 0.5) / 100 AS total
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_enrich(spark, sf_dir)


@query(
    "stream_stream_join",
    # Real oracle: the inner interval join emits each qualifying pair
    # exactly once on a bounded replay — ev_range_join's SQL with the
    # same output contract.
    oracle="""
    SELECT p.event_id AS purchase_id, e.event_id AS error_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND epoch_us(e.ts) >  epoch_us(p.ts)
     AND epoch_us(e.ts) <= epoch_us(p.ts) + 300000000
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_stream_join(spark, sf_dir)


@query(
    "stream_stream_left_join",
    # Real oracle: matched pairs emit eagerly; an unmatched purchase
    # emits its NULL row iff the final watermark proves its 5-minute
    # window closed — W = min of the two stream watermarks (Spark
    # tracks max event time in MILLISECONDS, hence the //1000
    # truncation) minus the 10-minute delay; purchases whose window
    # extends past W correctly stay withheld (the stream's tail).
    oracle="""
    WITH wm AS (SELECT (LEAST(
          max(epoch_us(ts)) FILTER (WHERE event_type = 'purchase'),
          max(epoch_us(ts)) FILTER (WHERE event_type = 'error'))
          // 1000 - 600000) * 1000 AS w
        FROM events)
    SELECT p.event_id AS purchase_id, e.event_id AS error_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND epoch_us(e.ts) >  epoch_us(p.ts)
     AND epoch_us(e.ts) <= epoch_us(p.ts) + 300000000
    CROSS JOIN wm
    WHERE e.event_id IS NOT NULL
       OR epoch_us(p.ts) + 300000000 <= wm.w
    """,
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_stream_left_join(spark, sf_dir)


@query(
    "stream_quota",
    # Real oracle: admission is by (event time, event_id), not arrival
    # order (the state kernel sorts), so the admitted set is the batch
    # row_number()-window — exact on the single-batch replay the
    # parity test pins.
    oracle="""
    SELECT user_id, event_id, k_index FROM (
      SELECT user_id, event_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id)
                  AS BIGINT) AS k_index
      FROM events) q
    WHERE k_index <= 5
    """,
)
def stream_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_quota(spark, sf_dir)


@query(
    "stream_cdc_merge",
    # Real oracle: last-write-wins is enforced by (ts, event_id)
    # ORDER, not arrival order, so the final table is the batch
    # latest-per-user rollup; the replay stages exactly 3 range chunks
    # → 3 committed versions (pinned by the staging constant and the
    # pytest multi-version gate).
    oracle="""
    WITH r AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
                      event_type, value,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY epoch_us(ts) DESC,
                                                  event_id DESC) AS rn
               FROM events)
    SELECT user_id, tus AS last_ts, event_id AS last_event_id,
           event_type AS last_event_type, value AS last_value,
           CAST(3 AS INTEGER) AS table_versions
    FROM r WHERE rn = 1
    """,
)
def stream_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_cdc_merge(spark, sf_dir)

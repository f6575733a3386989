"""DuckDB oracle SQL twins for plans/queries.py.

Written to be *bit-identical* to the Spark plans on doubles:
  * the floor-based rounding / decimal-sum conventions of
    functions/scalars.py (same IEEE-754 op sequence in both engines);
  * float literals always cast ``::DOUBLE`` (DuckDB parses bare decimals as
    DECIMAL);
  * integer SUMs cast back to BIGINT (DuckDB widens to HUGEINT, Spark keeps
    LongType);
  * every LIMIT repeats the Spark plan's total order.
"""

from __future__ import annotations

from ..functions.scalars import dsum_sql, r6_sql

# events → tick-stream mapping, FIXTURES.md §2 (same as sources.readers).
TICKS_CTE = """
ticks AS (
  SELECT e.event_id AS tick_id,
         e.user_id AS company_id,
         e.event_type,
         e.ts AS trade_datetime,
         e.value AS current_price,
         CAST(json_extract_string(e.props, '$.k') AS BIGINT) AS volume
  FROM events e
)
"""

ORACLES: dict[str, str] = {}

ORACLES["p7_validated_ticks"] = f"""
WITH {TICKS_CTE}
SELECT * FROM ticks
WHERE current_price IS NOT NULL AND NOT isnan(current_price)
  AND current_price > 0 AND (volume IS NULL OR volume >= 0)
"""

ORACLES["p9_dedup_ticks"] = f"""
WITH {TICKS_CTE}
SELECT * FROM ticks
QUALIFY row_number() OVER (
  PARTITION BY company_id, trade_datetime ORDER BY tick_id ASC) = 1
"""

ORACLES["p3_time_window_filter"] = f"""
WITH {TICKS_CTE}
SELECT * FROM ticks
WHERE trade_datetime >=
  (SELECT max(trade_datetime) FROM ticks) - INTERVAL 24 HOURS
"""

ORACLES["j1_tick_dashboard"] = f"""
WITH {TICKS_CTE}
SELECT t.tick_id, t.company_id, c.c_name AS company_name,
       t.trade_datetime, t.current_price, t.volume
FROM ticks t JOIN customer c ON t.company_id = c.c_custkey
WHERE t.trade_datetime >=
  (SELECT max(trade_datetime) FROM ticks) - INTERVAL 24 HOURS
ORDER BY t.trade_datetime DESC, t.tick_id DESC
LIMIT 1000
"""

ORACLES["j6_region_revenue"] = f"""
SELECT r_name AS region_name, n_name AS nation_name,
       {dsum_sql("l_extendedprice * (1.0::DOUBLE - l_discount)")} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""

ORACLES["j7_orders_without_big_lineitems"] = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
"""

ORACLES["j8_industry_rollup"] = """
SELECT n_name AS industry_name,
       COUNT(c_custkey) AS n_companies,
       COUNT(DISTINCT c_mktsegment) AS n_segments
FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
GROUP BY 1
"""

ORACLES["a1_grouped_max"] = f"""
WITH {TICKS_CTE}
SELECT company_id, max(trade_datetime) AS last_trade_datetime
FROM ticks GROUP BY 1
"""

ORACLES["a2_global_max"] = f"""
WITH {TICKS_CTE}
SELECT max(trade_datetime) AS max_trade_datetime FROM ticks
"""

ORACLES["a3_active_series"] = f"""
WITH {TICKS_CTE}
SELECT company_id, COUNT(*) AS n_ticks,
       min(trade_datetime) AS first_ts, max(trade_datetime) AS last_ts
FROM ticks GROUP BY 1 HAVING COUNT(*) >= 50
"""

ORACLES["a4_daily_summary"] = f"""
WITH {TICKS_CTE}
SELECT company_id, CAST(trade_datetime AS DATE) AS trade_date,
       {r6_sql(dsum_sql("current_price") + " / COUNT(current_price)")} AS avg_price,
       max(current_price) AS max_price,
       min(current_price) AS min_price,
       CAST(SUM(volume) AS BIGINT) AS total_volume,
       COUNT(*) AS n_ticks
FROM ticks GROUP BY 1, 2
"""

ORACLES["a6_hourly_counts"] = f"""
WITH {TICKS_CTE}
SELECT date_trunc('hour', trade_datetime) AS hour, COUNT(*) AS n_events
FROM ticks GROUP BY 1
"""

ORACLES["a7_dup_detection"] = f"""
WITH {TICKS_CTE}
SELECT company_id, trade_datetime, COUNT(*) AS n_dups
FROM ticks GROUP BY 1, 2 HAVING COUNT(*) > 1
"""

_Q1_DISC = "l_extendedprice * (1.0::DOUBLE - l_discount)"
_Q1_CHARGE = f"({_Q1_DISC}) * (1.0::DOUBLE + l_tax)"
ORACLES["q1_pricing_summary"] = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql("l_quantity")} AS sum_qty,
       {dsum_sql("l_extendedprice")} AS sum_base_price,
       {dsum_sql(_Q1_DISC)} AS sum_disc_price,
       {dsum_sql(_Q1_CHARGE)} AS sum_charge,
       {r6_sql(dsum_sql("l_quantity") + " / COUNT(l_quantity)")} AS avg_qty,
       {r6_sql(dsum_sql("l_extendedprice") + " / COUNT(l_extendedprice)")} AS avg_price,
       {r6_sql(dsum_sql("l_discount") + " / COUNT(l_discount)")} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY 1, 2
"""

ORACLES["w1_latest_per_day"] = f"""
WITH {TICKS_CTE}
SELECT company_id, CAST(trade_datetime AS DATE) AS trade_date, trade_datetime,
       current_price AS close_price, volume
FROM ticks
QUALIFY row_number() OVER (
  PARTITION BY company_id, CAST(trade_datetime AS DATE)
  ORDER BY trade_datetime DESC, tick_id DESC) = 1
"""

ORACLES["o1_top_events"] = f"""
WITH {TICKS_CTE}
SELECT tick_id, company_id, trade_datetime, current_price
FROM ticks ORDER BY current_price DESC, tick_id ASC LIMIT 100
"""

ORACLES["d1_distinct_event_types"] = """
SELECT DISTINCT event_type FROM events
"""

# --- coverage additions: P5/P6 filters, J5 dim lookup, O3-O6 sort/limit,
# set ops, scalar suite, multimodal metadata ------------------------------

ORACLES["p5_equality_filter"] = f"""
WITH {TICKS_CTE}
SELECT * FROM ticks WHERE event_type = 'purchase'
"""

ORACLES["p6_flag_filter"] = """
SELECT o_orderkey, o_custkey, o_totalprice,
       (o_orderstatus = 'O') AS is_open
FROM orders WHERE o_orderstatus = 'O'
"""

ORACLES["j5_dim_lookup"] = """
SELECT c_custkey, c_name AS company_name,
       n_name AS industry_name, r_name AS sector_name
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
"""

ORACLES["o3_training_fetch"] = f"""
WITH {TICKS_CTE}
SELECT t.tick_id, t.company_id, c.c_name AS company_name,
       t.trade_datetime AS "timestamp", t.current_price AS close_price
FROM ticks t JOIN customer c ON t.company_id = c.c_custkey
ORDER BY t.trade_datetime ASC, t.tick_id ASC
LIMIT 1000
"""

ORACLES["o4_latest_row"] = f"""
WITH {TICKS_CTE}
SELECT tick_id, company_id, trade_datetime, current_price
FROM ticks ORDER BY trade_datetime DESC, tick_id DESC LIMIT 1
"""

ORACLES["o5_price_history"] = f"""
WITH {TICKS_CTE}
SELECT company_id, CAST(trade_datetime AS DATE) AS trade_date,
       current_price AS close_price, volume
FROM ticks
WHERE company_id = (SELECT min(company_id) FROM ticks)
QUALIFY row_number() OVER (
  PARTITION BY company_id, CAST(trade_datetime AS DATE)
  ORDER BY trade_datetime DESC, tick_id DESC) = 1
ORDER BY trade_date DESC
LIMIT 30
"""

ORACLES["o6_sorted_rollup"] = f"""
WITH {TICKS_CTE}
SELECT event_type, COUNT(*) AS n_events
FROM ticks GROUP BY 1
ORDER BY n_events DESC, event_type ASC
"""

ORACLES["su1_set_ops"] = f"""
WITH {TICKS_CTE},
buyers AS (SELECT DISTINCT company_id FROM ticks WHERE event_type = 'purchase'),
errs   AS (SELECT DISTINCT company_id FROM ticks WHERE event_type = 'error')
SELECT company_id, 'buyer_no_error' AS tag
FROM (SELECT company_id FROM buyers EXCEPT SELECT company_id FROM errs)
UNION ALL
SELECT company_id, 'buyer_and_error' AS tag
FROM (SELECT company_id FROM buyers INTERSECT SELECT company_id FROM errs)
"""

ORACLES["f1_scalar_suite"] = f"""
WITH {TICKS_CTE}
SELECT tick_id,
       CAST(trade_datetime AS DATE) AS trade_date,
       date_trunc('hour', trade_datetime) AS trade_hour,
       trade_datetime + INTERVAL 7 DAY AS ts_plus_7d,
       upper(trim(event_type)) AS event_type_uc,
       CAST(length(event_type) AS INTEGER) AS event_type_len,
       abs(current_price - 100.0::DOUBLE) AS abs_dev,
       sqrt(abs(current_price)) AS sqrt_price,
       greatest(current_price, 0.0::DOUBLE) AS clamped_lo,
       least(current_price, 1000.0::DOUBLE) AS clamped_hi,
       ((volume % 7) + 7) % 7 AS vol_mod7,
       coalesce(volume, 0) AS vol_or_zero,
       CASE WHEN current_price > 500.0::DOUBLE THEN 'HIGH'
            WHEN current_price > 100.0::DOUBLE THEN 'MEDIUM'
            ELSE 'LOW' END AS severity
FROM ticks
WHERE current_price IS NOT NULL AND NOT isnan(current_price)
  AND current_price > 0 AND (volume IS NULL OR volume >= 0)
"""

ORACLES["mm1_media_meta"] = """
SELECT source,
       COUNT(*) AS n_items,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
       CAST(SUM(octet_length(encode(text)) % 1920 + 1) AS BIGINT) AS sum_width,
       CAST(SUM(octet_length(encode(text)) % 1080 + 1) AS BIGINT) AS sum_height
FROM documents
WHERE text IS NOT NULL
GROUP BY source
"""

# mm2: the Spark side BUILDS real PNG headers with these dims and parses
# them back byte-by-byte; the oracle states the expected dims directly.
ORACLES["mm2_image_dims"] = """
SELECT doc_id, 'png' AS format,
       CAST(octet_length(encode(text)) % 1920 + 1 AS INTEGER) AS width,
       CAST(octet_length(encode(text)) % 1080 + 1 AS INTEGER) AS height,
       CAST(4 AS INTEGER) AS channels
FROM documents WHERE text IS NOT NULL
"""

# flagship: the entry plan's bitwise-stable projection.  rn gates mirror the
# pandas path's warm-up windows (indicators.indicator_frame); float values
# themselves are hash-checked via w_all_indicators (same math, SQL twin).
ORACLES["flagship"] = f"""
WITH {TICKS_CTE},
v AS (
  SELECT tick_id, company_id, event_type, trade_datetime, current_price,
         volume,
         row_number() OVER (PARTITION BY company_id
                            ORDER BY trade_datetime ASC, tick_id ASC) AS rn
  FROM ticks
  WHERE current_price IS NOT NULL AND NOT isnan(current_price)
    AND current_price > 0 AND (volume IS NULL OR volume >= 0)
)
SELECT v.tick_id, v.company_id, c.c_name AS company_name,
       c.c_mktsegment AS sector, v.event_type, v.trade_datetime,
       v.current_price, v.volume,
       rn >= 15 AS has_rsi, rn >= 20 AS has_sma20, rn >= 50 AS has_sma50,
       rn >= 12 AS has_ema12, rn >= 26 AS has_ema26, rn >= 20 AS has_bb,
       rn >= 35 AS has_macd, rn >= 21 AS has_volatility,
       rn >= 2 AS has_price_change
FROM v JOIN customer c ON v.company_id = c.c_custkey
ORDER BY v.trade_datetime DESC, v.tick_id DESC
LIMIT 1000
"""

# mm3: the Spark side BUILDS complete 24-bit BMPs (pixel byte j = (j+L)%256,
# bottom-up BGR rows, stride padding) and REALLY decodes the pixels back with
# numpy; the oracle re-derives the stats from the construction rule.  File
# row y holds top-down row h-1-y; within a row, pixel x occupies bytes
# x*3+{0,1,2} = B,G,R.  Channel sums are orientation-invariant; the top-left
# pixel and the (top-row-index+1)-weighted checksum pin orientation + order.
ORACLES["mm3_bmp_pixel_stats"] = """
WITH g AS (
  SELECT doc_id,
         octet_length(encode(text)) AS L,
         octet_length(encode(text)) % 13 + 1 AS w,
         octet_length(encode(text)) % 7 + 1 AS h,
         ((octet_length(encode(text)) % 13 + 1) * 3 + 3) // 4 * 4 AS stride
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
  CAST(w AS INTEGER) AS width,
  CAST(h AS INTEGER) AS height,
  CAST(list_sum([((i // w) * stride + (i % w) * 3 + 2 + L) % 256
                 FOR i IN range(0, h * w)]) AS BIGINT) AS sum_r,
  CAST(list_sum([((i // w) * stride + (i % w) * 3 + 1 + L) % 256
                 FOR i IN range(0, h * w)]) AS BIGINT) AS sum_g,
  CAST(list_sum([((i // w) * stride + (i % w) * 3 + 0 + L) % 256
                 FOR i IN range(0, h * w)]) AS BIGINT) AS sum_b,
  CAST(((h - 1) * stride + 2 + L) % 256 AS INTEGER) AS topleft_r,
  CAST(((h - 1) * stride + 1 + L) % 256 AS INTEGER) AS topleft_g,
  CAST(((h - 1) * stride + 0 + L) % 256 AS INTEGER) AS topleft_b,
  CAST(list_sum([(h - (i // (3 * w)))
                 * (((i // (3 * w)) * stride + (i % (3 * w)) + L) % 256)
                 FOR i IN range(0, h * 3 * w)]) AS BIGINT) AS row_weighted
FROM g
"""

# mm5: the Spark side BUILDS RIFF/AVI containers with DIB frames (frame f
# payload byte j = (j + f*31 + L) mod 256) and REALLY runs two chained
# decoders (chunk walk + frame sample every 2, then BMP pixel decode); the
# oracle re-derives the rollup.  Sampled frames f = 0,2,4,...; within a
# frame, pixel bytes are the positions excluding stride padding.
ORACLES["mm5_avi_frame_stats"] = """
WITH g AS (
  SELECT doc_id,
         octet_length(encode(text)) AS L,
         octet_length(encode(text)) % 5 + 1 AS w,
         octet_length(encode(text)) % 3 + 1 AS h,
         octet_length(encode(text)) % 4 + 2 AS nf,
         ((octet_length(encode(text)) % 5 + 1) * 3 + 3) // 4 * 4 AS stride
  FROM documents WHERE text IS NOT NULL
),
s AS (
  SELECT *, (nf + 1) // 2 AS ns, h * 3 * w AS fpx FROM g
)
SELECT doc_id,
  CAST(w AS INTEGER) AS width,
  CAST(h AS INTEGER) AS height,
  CAST(nf AS INTEGER) AS total_frames,
  CAST(ns AS BIGINT) AS n_sampled,
  CAST(list_sum([((t % fpx) // (3 * w) * stride + (t % fpx) % (3 * w)
                  + 2 * (t // fpx) * 31 + L) % 256
                 FOR t IN range(0, ns * fpx)]) AS BIGINT) AS sum_pixels,
  CAST(list_sum([(2 * (t // fpx) + 1)
                 * (((t % fpx) // (3 * w) * stride + (t % fpx) % (3 * w)
                     + 2 * (t // fpx) * 31 + L) % 256)
                 FOR t IN range(0, ns * fpx)]) AS BIGINT) AS frame_weighted
FROM s
"""

# mm6: the Spark side BUILDS real zlib-compressed PNGs (pixel flat index i
# has value (i+L) mod 256, per-row filter type y mod 5) and REALLY inflates
# + unfilters them; the oracle derives the stats arithmetically.  PNG rows
# are top-down, channel c = i mod 3 — no flip, no stride padding.
ORACLES["mm6_png_roundtrip_stats"] = """
WITH g AS (
  SELECT doc_id,
         octet_length(encode(text)) AS L,
         octet_length(encode(text)) % 9 + 1 AS w,
         octet_length(encode(text)) % 6 + 1 AS h
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
  CAST(w AS INTEGER) AS width,
  CAST(h AS INTEGER) AS height,
  CAST(list_sum([(i + L) % 256 FOR i IN range(0, h * w * 3) IF i % 3 = 0])
       AS BIGINT) AS sum_r,
  CAST(list_sum([(i + L) % 256 FOR i IN range(0, h * w * 3) IF i % 3 = 1])
       AS BIGINT) AS sum_g,
  CAST(list_sum([(i + L) % 256 FOR i IN range(0, h * w * 3) IF i % 3 = 2])
       AS BIGINT) AS sum_b,
  CAST((0 + L) % 256 AS INTEGER) AS topleft_r,
  CAST((1 + L) % 256 AS INTEGER) AS topleft_g,
  CAST((2 + L) % 256 AS INTEGER) AS topleft_b,
  CAST(list_sum([(i // (3 * w) + 1) * ((i + L) % 256)
                 FOR i IN range(0, h * w * 3)]) AS BIGINT) AS row_weighted
FROM g
"""

# mm4: the Spark side BUILDS stereo PCM16 WAVs (interleaved sample i has
# unsigned word v_i = (i*2731+L) mod 65536, little-endian) and REALLY
# decodes them back with numpy; the oracle re-derives the stats.  Channel 0
# = even interleaved indices; signed value = v - 65536 when v >= 32768.
ORACLES["mm4_wav_stats"] = """
WITH g AS (
  SELECT doc_id,
         octet_length(encode(text)) AS L,
         octet_length(encode(text)) % 50 + 10 AS ns
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
  CAST(ns AS INTEGER) AS n_frames,
  CAST(2 AS INTEGER) AS channels,
  CAST(8000 AS INTEGER) AS sample_rate,
  CAST(list_sum([CASE WHEN (i * 2731 + L) % 65536 >= 32768
                      THEN (i * 2731 + L) % 65536 - 65536
                      ELSE (i * 2731 + L) % 65536 END
                 FOR i IN range(0, ns * 2) IF i % 2 = 0]) AS BIGINT) AS sum_ch0,
  CAST(list_sum([CASE WHEN (i * 2731 + L) % 65536 >= 32768
                      THEN (i * 2731 + L) % 65536 - 65536
                      ELSE (i * 2731 + L) % 65536 END
                 FOR i IN range(0, ns * 2) IF i % 2 = 1]) AS BIGINT) AS sum_ch1,
  CAST(list_sum([abs(CASE WHEN (i * 2731 + L) % 65536 >= 32768
                          THEN (i * 2731 + L) % 65536 - 65536
                          ELSE (i * 2731 + L) % 65536 END)
                 FOR i IN range(0, ns * 2)]) AS BIGINT) AS sum_abs,
  CAST(list_min([CASE WHEN (i * 2731 + L) % 65536 >= 32768
                      THEN (i * 2731 + L) % 65536 - 65536
                      ELSE (i * 2731 + L) % 65536 END
                 FOR i IN range(0, ns * 2)]) AS INTEGER) AS min_sample,
  CAST(list_max([CASE WHEN (i * 2731 + L) % 65536 >= 32768
                      THEN (i * 2731 + L) % 65536 - 65536
                      ELSE (i * 2731 + L) % 65536 END
                 FOR i IN range(0, ns * 2)]) AS INTEGER) AS max_sample,
  CAST(list_sum([(i + 1) * (CASE WHEN (i * 2731 + L) % 65536 >= 32768
                                 THEN (i * 2731 + L) % 65536 - 65536
                                 ELSE (i * 2731 + L) % 65536 END)
                 FOR i IN range(0, ns * 2)]) AS BIGINT) AS idx_weighted
FROM g
"""

ORACLES["t9_session_windows"] = f"""
WITH {TICKS_CTE},
s1 AS (
  SELECT company_id, tick_id, trade_datetime,
         lag(trade_datetime, 1) OVER (
           PARTITION BY company_id
           ORDER BY trade_datetime ASC, tick_id ASC) AS prev_ts
  FROM ticks
),
s2 AS (
  SELECT company_id, trade_datetime,
         SUM(CASE WHEN prev_ts IS NULL
                    OR trade_datetime >= prev_ts + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END) OVER (
           PARTITION BY company_id
           ORDER BY trade_datetime ASC, tick_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM s1
)
SELECT company_id, COUNT(*) AS n_events,
       MIN(trade_datetime) AS session_start,
       MAX(trade_datetime) AS session_end
FROM s2 GROUP BY company_id, session_id
"""

# salted two-phase A4 — same result set as the single-pass daily summary
ORACLES["sk1_salted_daily_summary"] = ORACLES["a4_daily_summary"]

# --- ML property oracles (U2-U4): the iterative fits are not SQL-
# expressible, so the driver queries reduce the model tables to shape
# properties the oracle derives arithmetically from the valid-tick counts
# (window arithmetic of ml/regression._windows, the ≥50-obs ARIMA gate,
# and invariant columns).  Full model values are pytest-covered. -----------

_VALID_CTE = """
valid AS (
  SELECT * FROM ticks
  WHERE current_price IS NOT NULL AND NOT isnan(current_price)
    AND current_price > 0 AND (volume IS NULL OR volume >= 0)
),
counts AS (SELECT company_id, COUNT(*) AS n FROM valid GROUP BY 1)
"""

# L = n-6 sliding windows (w=5, label = next price); every 5th → test.
ORACLES["u3_linreg_metrics"] = f"""
WITH {TICKS_CTE}, {_VALID_CTE},
lens AS (
  SELECT company_id, CASE WHEN n >= 7 THEN n - 6 ELSE 0 END AS L FROM counts
)
SELECT company_id,
       CAST(CASE WHEN L < 5 THEN L ELSE L - L // 5 END AS BIGINT) AS n_train,
       CAST(CASE WHEN L < 5 THEN 0 ELSE L // 5 END AS BIGINT) AS n_test,
       'LinearRegression' AS model_type,
       (L >= 5) AS mse_ok
FROM lens
"""

ORACLES["u4_linreg_predictions"] = f"""
WITH {TICKS_CTE}, {_VALID_CTE}
SELECT company_id,
       CAST(n - 5 AS BIGINT) AS n_predictions,
       true AS dates_ok, true AS conf_ok, true AS type_ok
FROM counts WHERE n >= 7
"""

# The ADF d-selection (ml/arima.py:_select_d / _adf_stat) re-derived in
# closed form: for each candidate d, regress Δs_t on [1, s_{t-1}, Δs_{t-1}]
# over the d-differenced series, solve the 3×3 normal equations by Cramer's
# rule, and take t(γ) = β₁/se(β₁); order_d = smallest d with t < −2.86
# (else MAX_D = 2).  Verified to reproduce the numpy lstsq path symbol-for-
# symbol at sf0.001 and sf0.01.
_ADF_CTE = """
ordered AS (
  SELECT company_id, current_price AS x,
         row_number() OVER (PARTITION BY company_id
                            ORDER BY trade_datetime ASC, tick_id ASC) AS rn
  FROM valid
),
levels AS (
  SELECT o.company_id, dd.d, o.rn,
         CASE dd.d
           WHEN 0 THEN x
           WHEN 1 THEN x - lag(x) OVER w
           ELSE x - 2 * lag(x) OVER w + lag(x, 2) OVER w
         END AS s
  FROM ordered o CROSS JOIN (VALUES (0), (1), (2)) dd(d)
  WINDOW w AS (PARTITION BY o.company_id, dd.d ORDER BY o.rn)
),
reg AS (
  SELECT company_id, d,
         s - lag(s) OVER w2 AS y,
         lag(s) OVER w2 AS r1,
         lag(s) OVER w2 - lag(s, 2) OVER w2 AS r2
  FROM levels WHERE s IS NOT NULL
  WINDOW w2 AS (PARTITION BY company_id, d ORDER BY rn)
),
sums AS (
  SELECT company_id, d, COUNT(*) AS n,
         SUM(r1) AS s1, SUM(r2) AS s2x,
         SUM(r1*r1) AS s11, SUM(r1*r2) AS s12, SUM(r2*r2) AS s22,
         SUM(y) AS b0, SUM(r1*y) AS b1, SUM(r2*y) AS b2, SUM(y*y) AS syy
  FROM reg
  WHERE y IS NOT NULL AND r1 IS NOT NULL AND r2 IS NOT NULL
  GROUP BY 1, 2
),
tstat AS (
  SELECT company_id, d, n,
         n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2x)
           + s2x*(s1*s12 - s11*s2x) AS det,
         (b0*(s11*s22 - s12*s12) - s1*(b1*s22 - s12*b2)
           + s2x*(b1*s12 - s11*b2)) AS beta0_num,
         (n*(b1*s22 - s12*b2) - b0*(s1*s22 - s12*s2x)
           + s2x*(s1*b2 - b1*s2x)) AS beta1_num,
         (n*(s11*b2 - b1*s12) - s1*(s1*b2 - b1*s2x)
           + b0*(s1*s12 - s11*s2x)) AS beta2_num,
         b0, b1, b2, syy, s2x, s22
  FROM sums
),
adf AS (
  SELECT company_id, d,
         CASE
           WHEN n - 3 <= 0 OR det = 0 THEN CAST(0.0 AS DOUBLE)
           ELSE COALESCE(
             (beta1_num / det) / NULLIF(
               sqrt(GREATEST(
                 ((syy - (beta0_num*b0 + beta1_num*b1 + beta2_num*b2) / det)
                    / (n - 3))
                 * ((n*s22 - s2x*s2x) / det), CAST(0.0 AS DOUBLE))),
               CAST(0.0 AS DOUBLE)),
             CAST(0.0 AS DOUBLE))
         END AS t
  FROM tstat
),
d_sel AS (
  SELECT company_id,
         COALESCE(MIN(CASE WHEN t < CAST(-2.86 AS DOUBLE) THEN d END), 2)
           AS order_d
  FROM adf GROUP BY 1
)
"""

ORACLES["u2_arima_forecast"] = f"""
WITH {TICKS_CTE}, {_VALID_CTE}, {_ADF_CTE}
SELECT c.company_id,
       CAST(5 AS BIGINT) AS n_rows,
       CAST(1 AS INTEGER) AS first_step,
       CAST(5 AS INTEGER) AS last_step,
       true AS ci_ok,
       CAST(d.order_d AS INTEGER) AS order_d
FROM counts c JOIN d_sel d ON c.company_id = d.company_id
WHERE c.n >= 50
"""

# S14: ARIMA registry rows — the ≥50-obs gate and order_d derive from the
# raw ticks (order_d via the same closed-form ADF CTE as u2); the grid
# bounds, persist→reload→score consistency, and CI containment are
# invariants the Spark side must prove true for every registered symbol.
ORACLES["s14_arima_registry"] = f"""
WITH {TICKS_CTE}, {_VALID_CTE}, {_ADF_CTE}
SELECT c.company_id, 'ARIMA' AS model_type,
       CAST(d.order_d AS INTEGER) AS order_d,
       true AS p_in_grid, true AS q_in_grid,
       true AS score_ok, true AS ci_ok
FROM counts c JOIN d_sel d ON c.company_id = d.company_id
WHERE c.n >= 50
"""

# J4: predictions ⋈ dim — prediction count/timestamps derive from the valid
# tick stats (last window ends at the symbol's max timestamp).
ORACLES["j4_prediction_dashboard"] = f"""
WITH {TICKS_CTE},
valid AS (
  SELECT * FROM ticks
  WHERE current_price IS NOT NULL AND NOT isnan(current_price)
    AND current_price > 0 AND (volume IS NULL OR volume >= 0)
),
stats AS (
  SELECT company_id, COUNT(*) AS n, max(trade_datetime) AS mx
  FROM valid GROUP BY 1
)
SELECT s.company_id, c.c_name AS company_name,
       CAST(s.n - 5 AS BIGINT) AS n_predictions,
       s.mx AS last_prediction_ts,
       s.mx + INTERVAL 1 DAY AS next_predicted_date
FROM stats s JOIN customer c ON s.company_id = c.c_custkey
WHERE s.n >= 7
"""

ORACLES["p4_recent_window"] = f"""
WITH {TICKS_CTE}
SELECT company_id, COUNT(*) AS n_recent
FROM ticks
WHERE trade_datetime >= (SELECT max(trade_datetime) FROM ticks) - INTERVAL 1 HOUR
GROUP BY 1
"""

# S13: one persisted-and-reloaded model per trainable symbol (n ≥ 7), scored
# at the symbol's latest tick.
ORACLES["s13_model_roundtrip"] = f"""
WITH {TICKS_CTE},
valid AS (
  SELECT * FROM ticks
  WHERE current_price IS NOT NULL AND NOT isnan(current_price)
    AND current_price > 0 AND (volume IS NULL OR volume >= 0)
),
stats AS (
  SELECT company_id, COUNT(*) AS n, max(trade_datetime) AS mx
  FROM valid GROUP BY 1
)
SELECT company_id, 'LinearRegression' AS model_type, mx AS last_tick_ts,
       true AS pred_ok, true AS date_ok
FROM stats WHERE n >= 7
"""

# S9/S10: the generic merge — one row per key; update batch wins on
# conflict (last write within the batch), existing rows survive untouched
# keys, new keys insert.  Mirrors merge_upsert's anti-join + union plan as
# NOT EXISTS + UNION ALL.
ORACLES["s9_analytics_upsert"] = f"""
WITH {TICKS_CTE},
existing AS (
  SELECT company_id, trade_datetime, tick_id, current_price, volume
  FROM ticks WHERE tick_id % 2 = 0
  QUALIFY row_number() OVER (
    PARTITION BY company_id, trade_datetime ORDER BY tick_id ASC) = 1
),
upd AS (
  SELECT company_id, trade_datetime, tick_id, current_price, volume
  FROM ticks WHERE tick_id % 3 = 0
  QUALIFY row_number() OVER (
    PARTITION BY company_id, trade_datetime ORDER BY tick_id DESC) = 1
)
SELECT * FROM existing e
WHERE NOT EXISTS (
  SELECT 1 FROM upd u
  WHERE u.company_id = e.company_id AND u.trade_datetime = e.trade_datetime)
UNION ALL
SELECT * FROM upd
"""

# J10: the as-of join checked against DuckDB's NATIVE ASOF JOIN — an
# independent implementation of the same semantics, the strongest oracle in
# the suite (not a transliteration of the Spark plan).
ORACLES["j10_asof_quote"] = f"""
WITH {TICKS_CTE},
purchases AS (
  SELECT company_id, tick_id, trade_datetime, current_price
  FROM ticks WHERE event_type = 'purchase'
),
quotes AS (
  SELECT company_id, trade_datetime,
         current_price AS quote_price, trade_datetime AS quote_ts
  FROM ticks WHERE event_type = 'view'
  QUALIFY row_number() OVER (
    PARTITION BY company_id, trade_datetime ORDER BY tick_id ASC) = 1
)
SELECT p.company_id, p.tick_id, p.trade_datetime, p.current_price,
       q.quote_price AS quote_price_asof, q.quote_ts AS quote_ts_asof
FROM purchases p ASOF LEFT JOIN quotes q
  ON p.company_id = q.company_id AND p.trade_datetime >= q.trade_datetime
"""

# J11: bucket-grid range join vs the plain inequality join (affordable for
# DuckDB at fixture scale; the Spark plan must never degenerate to one).
ORACLES["j11_range_join"] = f"""
WITH {TICKS_CTE},
err AS (
  SELECT company_id, tick_id, trade_datetime,
         lag(trade_datetime, 1) OVER (
           PARTITION BY company_id
           ORDER BY trade_datetime ASC, tick_id ASC) AS prev_ts
  FROM ticks WHERE event_type = 'error'
),
marked AS (
  SELECT company_id, trade_datetime,
         SUM(CASE WHEN prev_ts IS NULL
                    OR trade_datetime >= prev_ts + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END) OVER (
           PARTITION BY company_id
           ORDER BY trade_datetime ASC, tick_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM err
),
sessions AS (
  SELECT company_id,
         MIN(trade_datetime) AS window_start,
         MAX(trade_datetime) + INTERVAL 2 HOURS AS window_end
  FROM marked GROUP BY company_id, session_id
)
SELECT s.company_id, s.window_start, s.window_end,
       COUNT(*) AS n_purchases
FROM sessions s JOIN ticks p
  ON p.company_id = s.company_id
 AND p.event_type = 'purchase'
 AND p.trade_datetime BETWEEN s.window_start AND s.window_end
GROUP BY 1, 2, 3
"""

# EMB5: IVF with trained centroids must recover ≥9/10 of the exact top-10
# for every query vector (deterministic fixture, deterministic KMeans).
ORACLES["emb5_ivf_trained_recall"] = """
SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_results, true AS recall_ok
FROM embeddings WHERE vec_id < 5
"""

# DQ1: the same expectation suite rendered as ANSI UNION ALL branches —
# single source of truth for check names/predicates in operators/quality.py.
from ..operators.quality import expectations_sql as _expectations_sql  # noqa: E402

ORACLES["dq1_expectations"] = _expectations_sql()

# A9: the oracle computes the exact columns and pins the sketch-validation
# flags to literal TRUE — a failed bound hash-mismatches the row.
ORACLES["a9_sketch_rollup"] = """
SELECT event_type, count(*) AS n_events,
       count(DISTINCT user_id) AS exact_users,
       true AS hll_within_bound, true AS p50_within_bound
FROM events GROUP BY event_type
"""

# EMB8: persisted-IVF gates — index ≡ in-memory search, recall@10 ≥ 0.9.
ORACLES["emb8_ivf_index_search"] = """
SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_results,
       true AS index_matches_fresh
FROM embeddings WHERE vec_id < 5
"""

# MM7: perceptual twin pairs — docs 2k and 2k+1 carry byte-identical
# constructed BMPs, so the planted pairs (and only they, after the in-plan
# same-group projection) must surface at Hamming distance 0.
ORACLES["mm7_dhash_pairs"] = """
SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b, CAST(0 AS BIGINT) AS hamming
FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
WHERE d1.doc_id % 2 = 0 AND d1.text IS NOT NULL AND d2.text IS NOT NULL
"""

# EMB10: incremental IVF maintenance — per-batch vector counts + the
# anti-join append semantics (batch 3 replays batch 1: zero new vectors IS
# the idempotence property); every vector is assignable (a codebook always
# has a nearest centroid), so n_new = n_batch on first ingest.  The
# index≡fresh search gate is computed in-plan; the oracle pins it TRUE.
ORACLES["emb10_incremental_ivf"] = """
WITH c AS (
  SELECT
    CAST(count(CASE WHEN vec_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_even,
    CAST(count(CASE WHEN vec_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_odd
  FROM embeddings
)
SELECT CAST(1 AS INT) AS batch, n_even AS n_batch, n_even AS n_new,
       true AS index_matches_fresh FROM c
UNION ALL
SELECT CAST(2 AS INT), n_odd, n_odd, true FROM c
UNION ALL
SELECT CAST(3 AS INT), n_even, CAST(0 AS BIGINT), true FROM c
"""

# EMB9: int8 quantization gate — dequantized top-10 overlaps the exact
# float top-10 at >= 0.8 recall per query (the comparison is computed
# in-plan; quantization math is engine-internal, so the oracle pins the
# gate + shape).
ORACLES["emb9_quantized_recall"] = """
SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_results,
       true AS recall_ok
FROM embeddings WHERE vec_id < 5
"""

# TXT7: iterative BPE training has no SQL twin (no mid-recursion global
# aggregation) — the oracle pins the property form: ranks 1..20 present,
# selected pair counts non-increasing.
ORACLES["txt7_bpe_merges"] = """
SELECT CAST(r AS INT) AS merge_rank, true AS count_monotone
FROM (SELECT unnest(generate_series(1, 20)) AS r) t
"""

# TXT8: BPE tokenization — exact word counts + the two segmentation
# invariants (bounded by words below, characters above); segmentation
# values are python-reference-pinned (test_bpe.py).
ORACLES["txt8_bpe_tokenize"] = """
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)
         AS n_words,
       true AS tokens_ge_words, true AS tokens_le_chars
FROM documents
"""

# TXT9: incremental segmentation table — the oracle recomputes each
# batch's distinct-word count and the batch-2 set difference in SQL, so a
# Spark run that re-segments ANY previously-seen word reports a larger
# n_new_segmented and breaks the hash; the table≡one-shot gate is
# computed in-plan and pinned TRUE.
ORACLES["txt9_bpe_incremental"] = """
WITH w1 AS (
  SELECT DISTINCT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
  FROM documents WHERE doc_id % 2 = 0
),
w2 AS (
  SELECT DISTINCT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
  FROM documents WHERE doc_id % 2 = 1
)
SELECT CAST(1 AS INT) AS batch,
       CAST((SELECT count(*) FROM w1) AS BIGINT) AS n_batch_words,
       CAST((SELECT count(*) FROM w1) AS BIGINT) AS n_new_segmented,
       true AS table_matches_oneshot
UNION ALL
SELECT CAST(2 AS INT),
       CAST((SELECT count(*) FROM w2) AS BIGINT),
       CAST((SELECT count(*) FROM w2
             WHERE word NOT IN (SELECT word FROM w1)) AS BIGINT),
       true
"""

# DD9: incremental MinHash signature table — batch doc counts + the
# set-difference semantics of the anti-join append (batch 3 is a replay of
# batch 1: zero new docs IS the idempotence property); docs shorter than
# one trigram (< 3 tokens) emit no band rows and never enter the table.
# The table≡one-shot candidate-pair gate is computed in-plan (engine-
# internal signature math); the oracle pins it TRUE.
ORACLES["dd9_incremental_minhash"] = """
WITH sized AS (
  SELECT doc_id, len(list_filter(string_split(text, ' '), t -> t <> '')) AS ntok
  FROM documents
),
c AS (
  SELECT
    CAST(count(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_even,
    CAST(count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_odd,
    CAST(count(CASE WHEN doc_id % 2 = 0 AND ntok >= 3 THEN 1 END) AS BIGINT)
      AS new_even,
    CAST(count(CASE WHEN doc_id % 2 = 1 AND ntok >= 3 THEN 1 END) AS BIGINT)
      AS new_odd
  FROM sized
)
SELECT CAST(1 AS INT) AS batch, n_even AS n_batch_docs,
       new_even AS n_new_docs, true AS table_matches_oneshot FROM c
UNION ALL
SELECT CAST(2 AS INT), n_odd, new_odd, true FROM c
UNION ALL
SELECT CAST(3 AS INT), n_even, CAST(0 AS BIGINT), true FROM c
"""

ORACLES["a10_value_histogram"] = """
SELECT event_type,
       CASE WHEN value < 0.0 THEN CAST(0 AS BIGINT)
            WHEN value >= 500.0 THEN CAST(21 AS BIGINT)
            ELSE CAST(floor(value / 25.0) AS BIGINT) + 1 END AS bin,
       count(*) AS n, min(value) AS bin_min, max(value) AS bin_max
FROM events GROUP BY event_type,
       CASE WHEN value < 0.0 THEN CAST(0 AS BIGINT)
            WHEN value >= 500.0 THEN CAST(21 AS BIGINT)
            ELSE CAST(floor(value / 25.0) AS BIGINT) + 1 END
"""

ORACLES["a11_daily_type_pivot"] = """
SELECT CAST(ts AS DATE) AS day,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error
FROM events GROUP BY CAST(ts AS DATE)
"""

ORACLES["a12_rollup_sets"] = """
SELECT event_type, CAST(ts AS DATE) AS day,
       CAST(CASE WHEN GROUPING(event_type) THEN 1 ELSE 0 END AS INT) AS g_type,
       CAST(CASE WHEN GROUPING(CAST(ts AS DATE)) THEN 1 ELSE 0 END AS INT) AS g_day,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)), (event_type), ())
"""

ORACLES["dq2_volume_anomalies"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
with_prev AS (
  SELECT *, lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n
  FROM daily
)
SELECT event_type, day, n, prev_n,
       (prev_n IS NOT NULL AND (n * 2 < prev_n OR n > prev_n * 2)) AS anomalous
FROM with_prev
"""

# DD11: incremental decontamination table — per-batch test-split doc counts
# under the anti-join append contract (batch 3 replays batch 1: zero new
# docs IS the idempotence property); docs shorter than one 13-gram
# (< 13 tokens) emit no shingles and never enter the table.  The
# table≡one-shot flagged-doc gate is computed in-plan; the oracle pins it
# TRUE.  Split membership = the SP1 char-fold hash bucket, test = [90,100).


def _dd11_oracle() -> str:
    from ..operators.sampling import N_BUCKETS, SPLIT_BOUNDS
    from .dialect import tok_hash

    h = tok_hash("duck", "CAST(doc_id AS STRING)")
    lo, hi = SPLIT_BOUNDS["test"]
    return f"""
WITH sized AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS ntok,
         ({h}) % {N_BUCKETS} AS bucket
  FROM documents
),
t AS (SELECT * FROM sized WHERE bucket >= {lo} AND bucket < {hi}),
c AS (
  SELECT
    CAST(count(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_even,
    CAST(count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_odd,
    CAST(count(CASE WHEN doc_id % 2 = 0 AND ntok >= 13 THEN 1 END) AS BIGINT)
      AS new_even,
    CAST(count(CASE WHEN doc_id % 2 = 1 AND ntok >= 13 THEN 1 END) AS BIGINT)
      AS new_odd
  FROM t
)
SELECT CAST(1 AS INT) AS batch, n_even AS n_batch_docs,
       new_even AS n_new_docs, true AS table_matches_oneshot FROM c
UNION ALL
SELECT CAST(2 AS INT), n_odd, new_odd, true FROM c
UNION ALL
SELECT CAST(3 AS INT), n_even, CAST(0 AS BIGINT), true FROM c
"""


ORACLES["dd11_incremental_decontamination"] = _dd11_oracle()

# MM8: perceptual audio twin pairs — docs 2k and 2k+1 carry byte-identical
# constructed WAV clips, so the planted pairs (and only they, after the
# in-plan same-group projection) must surface at Hamming distance 0.
ORACLES["mm8_audio_pairs"] = """
SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b, CAST(0 AS BIGINT) AS hamming
FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
WHERE d1.doc_id % 2 = 0 AND d1.text IS NOT NULL AND d2.text IS NOT NULL
"""

# MM10: cross-modal decontamination — every DECON_PLANT_STRIDE-th test-split
# image re-enters training transcoded BMP→PNG (identical pixels, different
# bytes), so the banded perceptual gate must flag each planted doc against
# its source at Hamming distance EXACTLY 0; the incremental-table and
# replay gates pin TRUE.  Organic cross-split matches are projected out
# in-plan (mm7's oracle-derivability pattern).
def _mm10_oracle() -> str:
    from ..operators.dedup import DECON_PLANT_BASE, DECON_PLANT_STRIDE
    from ..operators.sampling import N_BUCKETS, SPLIT_BOUNDS
    from .dialect import tok_hash

    h = tok_hash("duck", "CAST(doc_id AS STRING)")
    lo, hi = SPLIT_BOUNDS["test"]
    return f"""
SELECT doc_id + {DECON_PLANT_BASE} AS doc_id, CAST(0 AS BIGINT) AS hamming,
       true AS replay_zero, true AS table_matches_oneshot
FROM (
  SELECT doc_id, text, ({h}) % {N_BUCKETS} AS bucket FROM documents
) t
WHERE bucket >= {lo} AND bucket < {hi}
  AND doc_id % {DECON_PLANT_STRIDE} = 0 AND text IS NOT NULL
"""


ORACLES["mm10_crossmodal_decontamination"] = _mm10_oracle()


# MM11: full-triad decontamination — one planted re-master per modality
# (BMP→PNG transcode, half-gain WAV, 25→30fps AVI remux) for every
# DECON_PLANT_STRIDE-th test-split doc; each must surface against its
# source at hamming EXACTLY 0 through the ONE shared fingerprint table,
# and the replay gate pins TRUE.
def _mm11_oracle() -> str:
    from ..operators.dedup import DECON_PLANT_STRIDE
    from ..operators.sampling import N_BUCKETS, SPLIT_BOUNDS
    from .dialect import tok_hash

    h = tok_hash("duck", "CAST(doc_id AS STRING)")
    lo, hi = SPLIT_BOUNDS["test"]
    return f"""
SELECT t.doc_id, m.modality, CAST(0 AS BIGINT) AS hamming,
       true AS replay_zero
FROM (
  SELECT doc_id FROM (
    SELECT doc_id, text, ({h}) % {N_BUCKETS} AS bucket FROM documents
  ) s
  WHERE bucket >= {lo} AND bucket < {hi}
    AND doc_id % {DECON_PLANT_STRIDE} = 0 AND text IS NOT NULL
) t
CROSS JOIN (VALUES ('image'), ('audio'), ('video')) m(modality)
"""


ORACLES["mm11_triad_decontamination"] = _mm11_oracle()

# MM9: perceptual video twin pairs — same planted-twin construction as
# mm7/mm8 (docs 2k, 2k+1 share byte-identical AVI clips).
ORACLES["mm9_video_pairs"] = """
SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b, CAST(0 AS BIGINT) AS hamming
FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
WHERE d1.doc_id % 2 = 0 AND d1.text IS NOT NULL AND d2.text IS NOT NULL
"""

# EMB11: product-quantization gate — PQ top-10 overlaps the exact L2
# top-10 at >= 0.8 recall per query (the comparison is computed in-plan;
# codebook math is engine-internal, so the oracle pins the gate + shape).
ORACLES["emb11_pq_recall"] = """
SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_results,
       true AS recall_ok
FROM embeddings WHERE vec_id < 5
"""

# EMB12: incremental PQ code table — per-batch vector counts + the
# anti-join append semantics (batch 3 replays batch 1: zero new vectors IS
# the idempotence property); every vector is encodable (codebooks always
# have a nearest centroid), so n_new = n_batch on first ingest.  The
# table≡one-shot gate is computed in-plan; the oracle pins it TRUE.
ORACLES["emb12_incremental_pq"] = """
WITH c AS (
  SELECT
    CAST(count(CASE WHEN vec_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_even,
    CAST(count(CASE WHEN vec_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_odd
  FROM embeddings
)
SELECT CAST(1 AS INT) AS batch, n_even AS n_batch, n_even AS n_new,
       true AS table_matches_oneshot FROM c
UNION ALL
SELECT CAST(2 AS INT), n_odd, n_odd, true FROM c
UNION ALL
SELECT CAST(3 AS INT), n_even, CAST(0 AS BIGINT), true FROM c
"""

# EMB14: incremental IVF-PQ index — same counting shape as emb12 (the
# anti-join append semantics on the composite layout; batch 3 replays
# batch 1: zero new vectors IS the idempotence property); every vector is
# encodable, so n_new = n_batch on first ingest.  The accumulated ≡
# one-shot gate is computed in-plan; the oracle pins it TRUE.
ORACLES["emb14_incremental_ivfpq"] = """
WITH c AS (
  SELECT
    CAST(count(CASE WHEN vec_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_even,
    CAST(count(CASE WHEN vec_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_odd
  FROM embeddings
)
SELECT CAST(1 AS INT) AS batch, n_even AS n_batch, n_even AS n_new,
       true AS table_matches_oneshot FROM c
UNION ALL
SELECT CAST(2 AS INT), n_odd, n_odd, true FROM c
UNION ALL
SELECT CAST(3 AS INT), n_even, CAST(0 AS BIGINT), true FROM c
"""

# EMB13: IVF-PQ gate — the composite index's top-10 overlaps the exact
# L2 top-10 RESTRICTED TO THE SAME PROBED LISTS at >= 0.8 recall per
# query (computed in-plan; codebook/probe math is engine-internal, so
# the oracle pins the gate + shape).
ORACLES["emb13_ivfpq_recall"] = """
SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_results,
       true AS recall_ok
FROM embeddings WHERE vec_id < 5
"""

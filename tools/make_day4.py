#!/usr/bin/env python3
"""Generate a synthetic day-4 feed with real dimension churn (dev-only).

The reference's own 3 days never change an existing entity's attributes, so
the SCD2 close path and SCD1 update path barely execute in the replay.
Day 4 (2020-05-04) derives deterministically from day 3's entities:
  - 30 terminals move city (+address);
  - 20 clients get an expired passport_valid_to (feeds F1);
  - 20 accounts get an expired valid_to (feeds F2);
  - 15 cards move to a different existing account (NOTE: those rows keep
    the original person's name/passport while carrying alt_client — the
    resulting same-day multi-combo churn on alt_client is intentional, it
    exercises intra-batch SCD version chaining; the pinned counts depend
    on it);
  - plus unmodified traffic, same-day fraud chains for F3/F4.
Writes src/test/resources/fixtures/day4.parquet (NON-cumulative on
purpose — the loader's last-day filter makes cumulative vs daily
equivalent).
"""
import duckdb

con = duckdb.connect()
con.execute("""
CREATE VIEW d3 AS SELECT * FROM read_parquet('src/test/resources/fixtures/day3.parquet')
WHERE CAST(trans_date AS DATE) = DATE '2020-05-03'""")

con.execute("""
CREATE TABLE day4 AS
WITH base AS (
  SELECT *, row_number() OVER (ORDER BY trans_id) AS rn FROM d3
),
term_move AS (SELECT DISTINCT terminal FROM d3 ORDER BY terminal LIMIT 30),
cli_pass AS (SELECT DISTINCT client FROM d3 ORDER BY client LIMIT 20),
acc_exp AS (SELECT DISTINCT account FROM d3 ORDER BY account LIMIT 20),
card_move AS (SELECT DISTINCT card_num FROM d3 ORDER BY card_num LIMIT 15),
alt_acc AS (SELECT account AS alt_account, client AS alt_client,
                   account_valid_to AS alt_valid_to
            FROM (SELECT DISTINCT account, client, account_valid_to,
                         row_number() OVER (ORDER BY account DESC) AS r
                  FROM d3) WHERE r = 1)
SELECT
  'D4-' || b.trans_id AS trans_id,
  CAST(TIMESTAMP '2020-05-04 00:00:00'
    + INTERVAL 1 SECOND * CAST(30 + (b.rn * 97) % 86000 AS INTEGER) AS TIMESTAMP)
    AS trans_date,
  b.card_num AS card_num,
  CASE WHEN cm.card_num IS NOT NULL THEN aa.alt_account ELSE b.account END AS account,
  CASE WHEN cm.card_num IS NOT NULL THEN aa.alt_valid_to
       WHEN ae.account IS NOT NULL THEN DATE '2020-02-01'
       ELSE b.account_valid_to END AS account_valid_to,
  CASE WHEN cm.card_num IS NOT NULL THEN aa.alt_client ELSE b.client END AS client,
  b.last_name, b.first_name, b.patrinymic, b.date_of_birth, b.passport,
  CASE WHEN cp.client IS NOT NULL THEN DATE '2020-03-15'
       ELSE b.passport_valid_to END AS passport_valid_to,
  b.phone, b.oper_type, b.amount, b.oper_result,
  b.terminal, b.terminal_type,
  CASE WHEN tm.terminal IS NOT NULL THEN 'Новый-' || b.city ELSE b.city END AS city,
  CASE WHEN tm.terminal IS NOT NULL THEN 'ул. Новая, д. 4' ELSE b.address END AS address
FROM base b
LEFT JOIN term_move tm ON b.terminal = tm.terminal
LEFT JOIN cli_pass cp ON b.client = cp.client
LEFT JOIN acc_exp ae ON b.account = ae.account
LEFT JOIN card_move cm ON b.card_num = cm.card_num
CROSS JOIN alt_acc aa
""")
con.execute("""
COPY (SELECT * FROM day4)
TO 'src/test/resources/fixtures/day4.parquet' (FORMAT PARQUET)""")
n = con.execute("SELECT count(*) FROM day4").fetchone()[0]
chg = con.execute("""SELECT
  count(DISTINCT CASE WHEN city LIKE 'Новый-%' THEN terminal END),
  count(DISTINCT CASE WHEN passport_valid_to = DATE '2020-03-15' THEN client END),
  count(DISTINCT CASE WHEN account_valid_to = DATE '2020-02-01' THEN account END)
  FROM day4""").fetchone()
print(f"day4: {n} rows; changed terminals={chg[0]} clients={chg[1]} accounts={chg[2]}")

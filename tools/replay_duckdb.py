#!/usr/bin/env python3
"""Independent DuckDB+Python replay of the reference DWH for differential
testing (dev-only tool; driver-side python env).

Faithfully ports /root/reference/sql_scripts/{DDL,ETL,Data_mart}.sql
semantics — SQL set logic in DuckDB, the F4 cursor as a literal Python
loop — then compares every output table against the Spark dump produced by
`runMain graft.ReplayDump <scd> <out>`.

Postgres-specific semantics ported explicitly:
  - `ts - ts` yields a justified interval: hour field = (Δsec//3600)%24,
    sec_diff(h*3600+m*60+s) = Δsec % 86400;
  - `to_timestamp(max(ts),'YYYY-MM-DD 00:00:00')` = midnight of max;
  - `!=` / `=` are null-rejecting;
  - string concat `||` propagates NULL.

Usage: python3 tools/replay_duckdb.py <scd2|scd1> <sparkDumpDir>
"""
import sys
from pathlib import Path

import duckdb

FIX = "src/test/resources/fixtures"
CLOCK = "TIMESTAMP '2020-05-09 12:00:00'"
REJ = "Отказ"
SUCC = "Успешно"
F_PASSPORT = "Совершение операции при просроченном паспорте"
F_CONTRACT = "Совершение операции при недействующем договоре"
F_CITY = "Совершение операции в разных городах в течение 1 часа"
F_SUMM = "Попытка подбора сумм"

ENTITIES = {
    "terminals": dict(
        key="terminal_id",
        sel="terminal AS terminal_id, terminal_type, city AS terminal_city, address AS terminal_address",
        grp="terminal, terminal_type, city, address",
        attrs=["terminal_id", "terminal_type", "terminal_city", "terminal_address"],
        scd1_upd=["terminal_city", "terminal_address"],
        scd1_distinct=True),
    "accounts": dict(
        key="account_num",
        sel="account AS account_num, account_valid_to AS valid_to, client",
        grp="account, account_valid_to, client",
        attrs=["account_num", "valid_to", "client"],
        scd1_upd=["valid_to", "client"],
        scd1_distinct=False),
    "cards": dict(
        key="card_num",
        sel="card_num, account AS account_num",
        grp="card_num, account",
        attrs=["card_num", "account_num"],
        scd1_upd=["account_num"],
        scd1_distinct=False),
    "clients": dict(
        key="client_id",
        sel="client AS client_id, last_name, first_name, patrinymic, date_of_birth, "
            "passport AS passport_num, passport_valid_to, phone",
        grp="client, last_name, first_name, patrinymic, date_of_birth, passport, "
            "passport_valid_to, phone",
        attrs=["client_id", "last_name", "first_name", "patrinymic",
               "date_of_birth", "passport_num", "passport_valid_to", "phone"],
        scd1_upd=["last_name", "first_name", "patrinymic", "date_of_birth",
                  "passport_num", "passport_valid_to", "phone"],
        scd1_distinct=False),
}


def ddl(con):
    con.execute("""CREATE TABLE denormalized (trans_id VARCHAR, trans_date TIMESTAMP,
        card_num VARCHAR, account VARCHAR, account_valid_to DATE, client VARCHAR,
        last_name VARCHAR, first_name VARCHAR, patrinymic VARCHAR, date_of_birth DATE,
        passport VARCHAR, passport_valid_to DATE, phone VARCHAR, oper_type VARCHAR,
        amount DECIMAL(18,2), oper_result VARCHAR, terminal VARCHAR,
        terminal_type VARCHAR, city VARCHAR, address VARCHAR)""")
    con.execute("""CREATE TABLE fact_transactions (trans_id VARCHAR, trans_date TIMESTAMP,
        card_num VARCHAR, oper_type VARCHAR, amt DECIMAL(18,2), oper_result VARCHAR,
        terminal VARCHAR)""")
    for e, m in ENTITIES.items():
        cols = ", ".join(f"{a} " + ("DATE" if a in ("valid_to", "date_of_birth",
                         "passport_valid_to") else "VARCHAR") for a in m["attrs"])
        con.execute(f"CREATE TABLE dim_{e}_hist ({cols}, start_dt TIMESTAMP, end_dt TIMESTAMP)")
        con.execute(f"CREATE TABLE dim_{e} ({cols}, create_dt TIMESTAMP, update_dt TIMESTAMP)")
    con.execute("""CREATE TABLE report (fraud_dt TIMESTAMP, passport VARCHAR, fio VARCHAR,
        phone VARCHAR, fraud_type VARCHAR, report_dt TIMESTAMP)""")


def load_day(con, day):
    con.execute(f"""INSERT INTO denormalized
        SELECT * FROM read_parquet('{FIX}/day{day}.parquet')
        WHERE CAST(trans_date AS DATE) =
          (SELECT max(CAST(trans_date AS DATE)) FROM read_parquet('{FIX}/day{day}.parquet'))""")


def normalize(con):
    if con.execute("SELECT count(*) FROM denormalized").fetchone()[0] == 0:
        return
    # ---- SCD2 stagings (ETL.sql:11-84)
    for e, m in ENTITIES.items():
        con.execute(f"""CREATE OR REPLACE TEMP TABLE stg2_{e} AS
            SELECT f.*, lead(start_dt) OVER (PARTITION BY {m['key']} ORDER BY start_dt) AS end_dt
            FROM (SELECT {m['sel']}, min(trans_date) AS start_dt
                  FROM denormalized GROUP BY {m['grp']}) f""")

    def scd2_apply(e, m):
        dim = f"dim_{e}_hist"
        eqs = " AND ".join(f"c.{a} = stg.{a}" for a in m["attrs"])
        con.execute(f"""CREATE OR REPLACE TEMP TABLE sc_{e} AS
            SELECT * FROM stg2_{e} stg
            WHERE NOT EXISTS (SELECT 1 FROM {dim} c WHERE {eqs})""")
        con.execute(f"""UPDATE {dim} c SET end_dt = sc.start_dt
            FROM sc_{e} sc
            WHERE sc.{m['key']} = c.{m['key']} AND c.end_dt IS NULL AND sc.end_dt IS NULL""")
        con.execute(f"INSERT INTO {dim} SELECT * FROM sc_{e}")

    # reference order: terminals, fact, accounts, cards, clients
    scd2_apply("terminals", ENTITIES["terminals"])
    con.execute("""INSERT INTO fact_transactions
        SELECT trans_id, trans_date, card_num, oper_type, amount, oper_result, terminal
        FROM denormalized""")
    for e in ("accounts", "cards", "clients"):
        scd2_apply(e, ENTITIES[e])

    # ---- SCD1 stagings (ETL.sql:243-354)
    for e, m in ENTITIES.items():
        non_key = [a for a in m["attrs"] if a != m["key"]]
        lastvals = ", ".join(
            f"last_value({a}) OVER (PARTITION BY {m['key']} ORDER BY create_dt "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS {a}"
            for a in non_key)
        distinct = "DISTINCT" if m["scd1_distinct"] else ""
        con.execute(f"""CREATE OR REPLACE TEMP TABLE stg1_{e} AS
            SELECT {distinct} {m['key']},
                   {lastvals}{',' if lastvals else ''}
                   min(create_dt) OVER (PARTITION BY {m['key']}) AS create_dt,
                   CASE WHEN max(create_dt) OVER (PARTITION BY {m['key']})
                          = min(create_dt) OVER (PARTITION BY {m['key']}) THEN NULL
                        ELSE max(create_dt) OVER (PARTITION BY {m['key']}) END AS update_dt
            FROM (SELECT {m['sel']}, min(trans_date) AS create_dt
                  FROM denormalized GROUP BY {m['grp']}) f""")

    for e, m in ENTITIES.items():
        dim = f"dim_{e}"
        sets = ", ".join(f"{a} = sc.{a}" for a in m["scd1_upd"])
        chg = " OR ".join(f"sc.{a} != c.{a}" for a in m["scd1_upd"])
        con.execute(f"""UPDATE {dim} c SET {sets},
            update_dt = coalesce(sc.update_dt, sc.create_dt)
            FROM (SELECT DISTINCT * FROM stg1_{e}) sc
            WHERE c.{m['key']} = sc.{m['key']} AND ({chg})""")
        con.execute(f"""INSERT INTO {dim}
            SELECT * FROM stg1_{e} stg
            WHERE NOT EXISTS (SELECT 1 FROM {dim} c WHERE c.{m['key']} = stg.{m['key']})""")

    con.execute("DELETE FROM denormalized")


def add_report_data(con, scd):
    if scd == "scd2":
        t, c, a, cl = ("dim_terminals_hist", "dim_cards_hist",
                       "dim_accounts_hist", "dim_clients_hist")
        cur = "WHERE end_dt IS NULL"
    else:
        t, c, a, cl = "dim_terminals", "dim_cards", "dim_accounts", "dim_clients"
        cur = ""
    con.execute(f"""CREATE OR REPLACE TEMP TABLE stg_denormalized_data AS
        WITH utd_terminals AS (SELECT terminal_id, terminal_city FROM {t} {cur}),
        utd_transactions AS (
            SELECT trans_id, trans_date, card_num, amt, oper_result, terminal
            FROM fact_transactions
            WHERE trans_date >= (SELECT date_trunc('day', max(trans_date))
                                 - INTERVAL 1 HOUR FROM fact_transactions)),
        utd_cards AS (SELECT card_num, account_num FROM {c} {cur}),
        utd_accounts AS (SELECT account_num, valid_to, client FROM {a} {cur}),
        utd_clients AS (SELECT client_id,
            last_name || ' ' || first_name || ' ' || patrinymic AS fio,
            phone, passport_valid_to, passport_num FROM {cl} {cur})
        SELECT te.terminal_city, tr.trans_id, tr.trans_date, tr.card_num,
               tr.amt AS amount, tr.oper_result, ac.valid_to, ac.client,
               ucl.fio, ucl.phone, ucl.passport_valid_to, ucl.passport_num
        FROM utd_terminals te
        JOIN utd_transactions tr ON te.terminal_id = tr.terminal
        JOIN utd_cards cc ON cc.card_num = tr.card_num
        JOIN utd_accounts ac ON ac.account_num = cc.account_num
        JOIN utd_clients ucl ON ucl.client_id = ac.client""")

    # F1/F2 ∪ F3 (Data_mart.sql:260-293)
    con.execute(f"""INSERT INTO report
        SELECT trans_date, passport_num, fio, phone,
            CASE WHEN trans_date > passport_valid_to THEN '{F_PASSPORT}'
                 WHEN trans_date > valid_to THEN '{F_CONTRACT}' END,
            {CLOCK}
        FROM stg_denormalized_data
        WHERE (trans_date > passport_valid_to OR trans_date > valid_to)
          AND trans_date >= (SELECT date_trunc('day', max(trans_date))
                             FROM stg_denormalized_data)
        UNION ALL
        SELECT fraud_dt, passport, fio, phone, '{F_CITY}', report_dt FROM (
            SELECT trans_date AS fraud_dt, passport_num AS passport, fio, phone,
                {CLOCK} AS report_dt, terminal_city,
                lag(terminal_city) OVER (PARTITION BY client ORDER BY trans_date) AS prev_city,
                (date_diff('second',
                    lag(trans_date) OVER (PARTITION BY client ORDER BY trans_date),
                    trans_date) // 3600) % 24 AS hour_diff
            FROM stg_denormalized_data) x
        WHERE terminal_city != prev_city AND hour_diff = 0""")

    # F4 cursor (fn_find_summ_frauds, literal python port)
    rows = con.execute("""
        WITH time_amount_diff AS (
            SELECT client, trans_date AS fraud_dt, passport_num AS passport,
                fio, phone, oper_result,
                coalesce(amount - lag(amount) OVER (PARTITION BY client ORDER BY trans_date), -1) AS amount_diff,
                coalesce(date_diff('second',
                    lag(trans_date) OVER (PARTITION BY client ORDER BY trans_date),
                    trans_date) % 86400, 0) AS sec_diff
            FROM stg_denormalized_data
            WHERE trans_date >= (SELECT date_trunc('day', max(trans_date))
                                 - INTERVAL 20 MINUTE FROM stg_denormalized_data))
        SELECT client, fraud_dt, passport, fio, phone, oper_result, amount_diff, sec_diff
        FROM time_amount_diff ORDER BY client, fraud_dt""").fetchall()
    counter, sec_count, zero_on_prev = 0, 0, False
    cur_client = con.execute(
        "SELECT min(client) FROM stg_denormalized_data").fetchone()[0]
    hits = []
    for (client, fraud_dt, passport, fio, phone, res, adiff, sdiff) in rows:
        if zero_on_prev and res == REJ:
            counter, cur_client, zero_on_prev = 1, client, False
        elif zero_on_prev and res == SUCC:
            sec_count, counter, cur_client, zero_on_prev = 0, 0, client, True
        elif not zero_on_prev:
            sec_count += sdiff
            if client != cur_client:
                cur_client, sec_count = client, 0
                if res == REJ:
                    counter = 1
                elif res == SUCC:
                    counter, zero_on_prev = 0, True
            elif counter >= 3 and res == SUCC and sec_count < 1200:
                hits.append((fraud_dt, passport, fio, phone))
                counter, sec_count, zero_on_prev = 0, 0, True
            elif res == SUCC:
                counter, sec_count, zero_on_prev = 0, 0, True
            elif adiff >= 0 or sec_count >= 1200:
                counter, sec_count, zero_on_prev = 1, 0, False
            elif adiff < 0 and sec_count < 1200 and res == REJ:
                counter, zero_on_prev = counter + 1, False
    for (fraud_dt, passport, fio, phone) in hits:
        con.execute(f"INSERT INTO report VALUES (?, ?, ?, ?, '{F_SUMM}', {CLOCK})",
                    [fraud_dt, passport, fio, phone])


def compare(con, table, spark_dir):
    exp = con.execute(f"SELECT * FROM {table} ORDER BY ALL").fetchall()
    got = con.execute(
        f"SELECT * FROM read_parquet('{spark_dir}/{table}/*.parquet') ORDER BY ALL").fetchall()
    # spark fact dump carries the partition column; strip trailing cols to
    # the reference arity
    got = [r[:len(exp[0])] if exp else r for r in got]
    got = sorted(got)
    exp = sorted(exp)
    if exp == got:
        print(f"  ok {table}: {len(exp)} rows identical")
        return True
    print(f"  X {table}: duck={len(exp)} spark={len(got)}")
    se, sg = set(exp), set(got)
    for r in list(se - sg)[:5]:
        print(f"    only_duck : {r}")
    for r in list(sg - se)[:5]:
        print(f"    only_spark: {r}")
    return False


def main():
    scd, spark_dir = sys.argv[1], sys.argv[2]
    days = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    ddl(con)
    for day in range(1, days + 1):
        load_day(con, day)
        normalize(con)
        add_report_data(con, scd)
    tables = ["report", "fact_transactions"] + (
        [f"dim_{e}_hist" for e in ENTITIES] if scd == "scd2"
        else [f"dim_{e}" for e in ENTITIES])
    ok = all([compare(con, t, spark_dir) for t in tables])
    print("DIFFERENTIAL", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""One-time fixture conversion: reference xlsx -> parquet (dev-only tool).

The reference daily snapshots (/root/reference/data/transactions_*.xlsx) are
plain OOXML: zip with xl/sharedStrings.xml + xl/worksheets/sheet1.xml. No
xlsx jar ships with Spark and no openpyxl in this env, so parse the XML
directly (stdlib) and emit typed parquet under src/test/resources/fixtures/.

Column layout (FIXTURES.md §A, insert_from_excel.py:30-38): 20 columns,
dates are Excel serial numbers (epoch 1899-12-30).
"""
import sys, zipfile
import xml.etree.ElementTree as ET
from datetime import datetime, timedelta, date
from decimal import Decimal
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
EPOCH = datetime(1899, 12, 30)

COLS = ["trans_id", "trans_date", "card_num", "account", "account_valid_to",
        "client", "last_name", "first_name", "patrinymic", "date_of_birth",
        "passport", "passport_valid_to", "phone", "oper_type", "amount",
        "oper_result", "terminal", "terminal_type", "city", "address"]
TS_COLS = {1}            # trans_date
DATE_COLS = {4, 9, 11}   # account_valid_to, date_of_birth, passport_valid_to
DEC_COLS = {14}          # amount


def read_sheet(path):
    z = zipfile.ZipFile(path)
    shared = []
    if "xl/sharedStrings.xml" in z.namelist():
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in root.findall("m:si", NS):
            shared.append("".join(t.text or "" for t in si.iter(
                "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t")))
    root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    rows = []
    for row in root.find("m:sheetData", NS).findall("m:row", NS):
        vals = {}
        for cell in row.findall("m:c", NS):
            ref = cell.get("r")  # e.g. "C5"
            col = 0
            for ch in ref:
                if ch.isalpha():
                    col = col * 26 + (ord(ch) - 64)
                else:
                    break
            v = cell.find("m:v", NS)
            if v is None:
                continue
            if cell.get("t") == "s":
                vals[col - 1] = shared[int(v.text)]
            else:
                vals[col - 1] = v.text
        rows.append(vals)
    return rows


def convert(src, dst):
    rows = read_sheet(src)
    header = rows[0]
    assert header.get(0) == "trans_id", f"unexpected header: {header}"
    cols = {i: [] for i in range(20)}
    n = 0
    for r in rows[1:]:
        if 0 not in r or r[0] in (None, ""):
            continue  # blank trailing rows
        n += 1
        for i in range(20):
            raw = r.get(i)
            if raw is None or raw == "":
                cols[i].append(None)
            elif i in TS_COLS:
                # Excel serial floats carry ~µs noise (…:39.999993); the
                # source data is second-grained, so round to nearest second.
                ts = EPOCH + timedelta(days=float(raw))
                ts += timedelta(microseconds=500000)
                cols[i].append(ts.replace(microsecond=0))
            elif i in DATE_COLS:
                d = EPOCH + timedelta(days=float(raw))
                cols[i].append(d.date())
            elif i in DEC_COLS:
                cols[i].append(Decimal(raw).quantize(Decimal("0.01")))
            else:
                cols[i].append(str(raw))
    arrays, fields = [], []
    for i, name in enumerate(COLS):
        if i in TS_COLS:
            t = pa.timestamp("us")
        elif i in DATE_COLS:
            t = pa.date32()
        elif i in DEC_COLS:
            t = pa.decimal128(18, 2)
        else:
            t = pa.string()
        arrays.append(pa.array(cols[i], type=t))
        fields.append(pa.field(name, t))
    pq.write_table(pa.table(dict(zip(COLS, arrays))), dst)
    print(f"{src} -> {dst}: {n} rows")


if __name__ == "__main__":
    out = Path("src/test/resources/fixtures")
    out.mkdir(parents=True, exist_ok=True)
    for day, f in [(1, "transactions_01052020.xlsx"),
                   (2, "transactions_02052020.xlsx"),
                   (3, "transactions_03052020.xlsx")]:
        convert(f"/root/reference/data/{f}", str(out / f"day{day}.parquet"))

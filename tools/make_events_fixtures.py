#!/usr/bin/env python3
"""One-time fixture generator (driver-side tooling, not library code).

Writes two tiny events parquet files with IDENTICAL logical content but the
two physical typings of `ts` that the testdata generator has shipped:

  - events_nanos/  : ts stored as INT64 TIMESTAMP(NANOS)  (pre-r8 generator)
  - events_micros/ : ts stored as timestamp[us]           (r8+ generator)

TablesSpec loads both through Tables.events and asserts identical results,
so a future generator retype can never again silently break the events read
path (which zeroed 25 queries + 13 tests in round 8).
"""
import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq

out_base = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources")

rows = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 0, 0), 10, "click", 1.5, '{"k":"a"}'),
    (2, datetime.datetime(2024, 1, 1, 0, 0, 30, 250000), 10, "view", 2.0, '{"k":"b"}'),
    (3, datetime.datetime(2024, 1, 1, 0, 45, 0, 1), 11, "click", 0.0, "{}"),
    (4, datetime.datetime(2024, 1, 2, 12, 0, 0, 999999), 12, "purchase", 9.75, '{"k":"c"}'),
    (5, datetime.datetime(2024, 2, 28, 23, 59, 59, 123456), 10, "view", 3.25, "{}"),
]

event_id = pa.array([r[0] for r in rows], pa.int64())
user_id = pa.array([r[2] for r in rows], pa.int64())
event_type = pa.array([r[3] for r in rows], pa.string())
value = pa.array([r[4] for r in rows], pa.float64())
props = pa.array([r[5] for r in rows], pa.string())

for unit, name in (("ns", "events_nanos"), ("us", "events_micros")):
    ts = pa.array([r[1] for r in rows], pa.timestamp(unit))
    table = pa.table(
        {
            "event_id": event_id,
            "ts": ts,
            "user_id": user_id,
            "event_type": event_type,
            "value": value,
            "props": props,
        }
    )
    dest = os.path.join(out_base, name, "events.parquet")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    pq.write_table(table, dest)
    print(f"wrote {dest}: ts={pq.read_schema(dest).field('ts').type}")

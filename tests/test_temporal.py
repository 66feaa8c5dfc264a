"""asof_join semantics: strict vs at-or-before matching, LEFT nulls."""

from __future__ import annotations

import datetime as dt

from data_integration_project_spark.operators.temporal import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_strict_and_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 10:00:00")),
            (2, "u", _ts("2024-01-01 11:00:00")),
            (3, "v", _ts("2024-01-01 09:00:00")),  # no prior right row
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 09:30:00"), 100),
            ("u", _ts("2024-01-01 10:00:00"), 200),  # ties left row 1 exactly
            ("u", _ts("2024-01-01 10:30:00"), 300),
            ("v", _ts("2024-01-01 12:00:00"), 400),  # only AFTER left row 3
        ],
        "user_id string, ts timestamp, payload int",
    )

    strict = {
        r["event_id"]: r["asof_payload"]
        for r in asof_join(left, right, "user_id", right_cols=["payload"]).collect()
    }
    # 10:00 purchase: tie row excluded under strict < → 09:30 wins
    assert strict[1] == 100
    assert strict[2] == 300
    assert strict[3] is None  # LEFT semantics: unmatched keeps NULL

    inclusive = {
        r["event_id"]: r["asof_payload"]
        for r in asof_join(
            left, right, "user_id", right_cols=["payload"], strict=False
        ).collect()
    }
    assert inclusive[1] == 200  # tie row included under <=
    assert inclusive[2] == 300
    assert inclusive[3] is None

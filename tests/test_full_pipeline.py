"""RUN_ALL_STEPS-equivalent end-to-end test: a directory of dirty
entity CSVs goes through discovery → envelope inbox → checkpointed
drain → transform → validate → clean/error zones → merged-view marts,
and every planted defect lands where it should."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_integration_project_spark.pipeline import run_full_pipeline

_CSVS = {
    "khachhang.csv": [
        "id,ho_ten,sdt,thanh_pho,email",
        "1,An Nguyen,0912345678,Ha Noi,an@example.vn",
        "1,An Nguyen,0912345678,Ha Noi,an@example.vn",  # duplicate id
        "2,Binh9 Tran,0987654321,Da Nang,binh@example.vn",  # digit in name
        "3,Chi Le,123,Hue,chi@example.vn",  # short phone
        "4,Dung Pham,0911222333,Hue,dung@",  # bad email
    ],
    "loaisanpham.csv": [
        "id,ten_loai,mo_ta",
        "1,An sang,Breakfast",
        "2,Do uong,Drinks",
        "3,,Empty name",  # blank name → error
    ],
    "tensanpham.csv": [
        "id,ten_san_pham,gia,loai",
        "1,Pho Bo,45000,An sang",
        "2,Ca Phe,abc,Do uong",  # unparseable price → 0 → error
        "3,Tra Da,-5,Do uong",  # negative price → error
    ],
    "nguyenlieu.csv": [
        "id,ten_nguyen_lieu,so_luong,don_vi,gia,ngay_nhap",
        "1,Ca phe hat,25,kg,180000,2024-01-03",
        "2,Sua,10,ban,22000,2024-01-03",  # unknown unit → error
    ],
    "dathang.csv": [
        "id,khach_hang_id,mon_id,so_luong,ngay_dat,trang_thai",
        "1,1,1,2,2024-01-05,NEW",
        "2,1,1,0,2024-01-06,DONE",  # qty 0 → error
        "3,1,1,1,2024-01-07,MAYBE",  # unknown status → error
    ],
}


@pytest.fixture()
def pipeline_dirs():
    root = tempfile.mkdtemp(prefix="full_pipe_")
    data = os.path.join(root, "data")
    os.makedirs(data)
    for name, lines in _CSVS.items():
        with open(os.path.join(data, name), "w", encoding="utf-8-sig") as f:
            f.write("\n".join(lines) + "\n")
    yield root, data
    shutil.rmtree(root, ignore_errors=True)


def test_run_full_pipeline(spark, pipeline_dirs):
    root, data = pipeline_dirs
    run = run_full_pipeline(spark, data, os.path.join(root, "out"), run_id="t1")

    assert run.ingested == {
        "khach_hang": 5,
        "loai_mon": 3,
        "mon": 3,
        "nguyen_lieu": 2,
        "dat_hang": 3,
    }
    assert run.zone_counts["khach_hang"] == {"clean": 1, "error": 4}
    assert run.zone_counts["loai_mon"] == {"clean": 2, "error": 1}
    assert run.zone_counts["mon"] == {"clean": 1, "error": 2}
    assert run.zone_counts["nguyen_lieu"] == {"clean": 1, "error": 1}
    assert run.zone_counts["dat_hang"] == {"clean": 1, "error": 2}

    # canonical layout + lineage landed in the clean zone
    kh = spark.read.parquet(os.path.join(run.zones.clean, "khach_hang"))
    row = kh.collect()[0]
    assert row["customer_id"] == "1" and row["_source"] == "csv"
    assert row["_run_id"] == "t1" and row["_line_no"] == 1

    # error zone carries the reject reasons
    err = spark.read.parquet(os.path.join(run.zones.error, "khach_hang"))
    msgs = " ;; ".join(r["_errors"] for r in err.collect())
    for expected in ("duplicate customer_id", "ho_ten has illegal characters",
                     "invalid phone", "invalid email"):
        assert expected in msgs

    # marts: merged view registered and queryable via SQL
    n = spark.sql("SELECT COUNT(*) AS n FROM khach_hang_merged").collect()[0]["n"]
    assert n == 1
    src = spark.sql("SELECT source, COUNT(*) c FROM mon_merged GROUP BY source").collect()
    assert {r["source"] for r in src} == {"csv"}

    # cross-run history recorded (A4 across runs)
    from data_integration_project_spark.pipeline import run_history

    hist = {
        r["entity"]: (r["ingested"], r["clean"], r["error"])
        for r in run_history(spark, os.path.join(root, "out")).collect()
    }
    assert hist["khach_hang"] == (5, 1, 4)
    assert hist["dat_hang"] == (3, 1, 2)

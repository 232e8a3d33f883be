"""JSONL corpus source (sources/files.py): corrupt-record policies and
the clean/quarantine split."""

from __future__ import annotations

import pytest

from pyspark.sql.types import LongType, StringType, StructField, StructType

from social_warner_spark.sources.files import CORRUPT_COL, read_jsonl, split_corrupt

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "part0.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "second doc"}\n'
        '{"doc_id": broken!!\n'
    )
    return str(tmp_path)


def test_permissive_quarantines_malformed(spark, jsonl_dir):
    df = read_jsonl(spark, jsonl_dir, SCHEMA)
    assert CORRUPT_COL in df.columns
    clean, quarantine = split_corrupt(df)
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    assert CORRUPT_COL not in clean.columns
    raws = [r["raw_line"] for r in quarantine.collect()]
    assert len(raws) == 1 and raws[0].startswith('{"doc_id": broken')


def test_dropmalformed_drops(spark, jsonl_dir):
    assert read_jsonl(spark, jsonl_dir, SCHEMA, mode="DROPMALFORMED").count() == 2


def test_failfast_raises(spark, jsonl_dir):
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_jsonl(spark, jsonl_dir, SCHEMA, mode="FAILFAST").count()


def test_clean_jsonl_has_no_quarantine(spark, tmp_path):
    (tmp_path / "ok.jsonl").write_text('{"doc_id": 7, "text": "fine"}\n')
    df = read_jsonl(spark, str(tmp_path), SCHEMA)
    clean, quarantine = split_corrupt(df)
    assert clean.count() == 1 and quarantine.count() == 0

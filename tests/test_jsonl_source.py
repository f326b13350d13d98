"""JSONL source: schema, malformed-line policies, corrupt report."""

import pytest

from graphframes_rs_spark.sources.jsonl import corrupt_report, read_jsonl


@pytest.fixture()
def jsonl_file(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web"}\n'
        "this line is not json at all\n"
        '{"doc_id": 3, "text": "ok", "lang": "en", "source": "books"}\n'
    )
    return str(p)


def test_capture_mode_keeps_and_flags(spark, jsonl_file):
    df = read_jsonl(spark, jsonl_file)
    rows = df.collect()
    assert len(rows) == 4
    good = [r for r in rows if r._corrupt is None]
    bad = [r for r in rows if r._corrupt is not None]
    assert {r.doc_id for r in good} == {1, 2, 3}
    assert len(bad) == 1 and "not json" in bad[0]._corrupt
    rep = corrupt_report(df).collect()[0]
    assert rep.n_rows == 4 and rep.n_corrupt == 1
    assert rep.corrupt_frac == 0.25


def test_drop_and_fail_modes(spark, jsonl_file):
    dropped = read_jsonl(spark, jsonl_file, malformed="drop")
    assert dropped.count() == 3
    with pytest.raises(Exception):
        read_jsonl(spark, jsonl_file, malformed="fail").collect()
    with pytest.raises(ValueError):
        read_jsonl(spark, jsonl_file, malformed="nope")

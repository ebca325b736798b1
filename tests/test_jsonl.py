"""JSONL corpus source: schema-enforced read, corrupt-line quarantine,
round-trip (sources/jsonl_ingest.py)."""

from __future__ import annotations

import json
import os

from les_etl_pipeline_spark.sources.jsonl_ingest import (
    DOC_SCHEMA,
    read_jsonl,
    write_jsonl,
)


def _write_fixture(path):
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en",
                    "source": "web", "n_chars": 11}),
        json.dumps({"doc_id": 2, "text": "bonjour", "lang": "fr",
                    "source": "web", "n_chars": 7}),
        '{"doc_id": 3, "text": "broken',          # unparseable
        json.dumps({"doc_id": 4, "lang": "de",
                    "source": "web", "n_chars": 0}),  # missing required text
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_read_jsonl_splits_good_and_bad(spark, tmp_path):
    p = str(tmp_path / "corpus.jsonl")
    _write_fixture(p)
    good, bad = read_jsonl(spark, p, required=("doc_id", "text"))
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["text"] == "hello world" and rows[1]["n_chars"] == 11
    assert good.schema == DOC_SCHEMA
    raws = [r["raw"] for r in bad.collect()]
    assert len(raws) == 2
    assert any("broken" in r for r in raws)          # corrupt line preserved
    assert any('"doc_id":4' in r.replace(" ", "") for r in raws)


def test_jsonl_roundtrip(spark, tmp_path):
    p = str(tmp_path / "corpus.jsonl")
    _write_fixture(p)
    good, _ = read_jsonl(spark, p, required=("doc_id", "text"))
    out = str(tmp_path / "out")
    write_jsonl(good, out, partitions=2)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 2
    good2, bad2 = read_jsonl(spark, out, required=("doc_id", "text"))
    assert bad2.count() == 0
    assert sorted(r["doc_id"] for r in good2.collect()) == [1, 2]

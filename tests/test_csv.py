"""CSV source/sink (sources/csv.py) — dialect pinning, corrupt-line
quarantine, partitioned layout, bounded inference."""

import os

from sync_cosmos_db_spark.sources.csv import read_csv, write_csv


def test_roundtrip_with_quoting(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 'has,comma', 'en'), (2, 'has "quote"', 'de'),
         (3, 'plain', 'en')],
        "id long, text string, lang string")
    p = str(tmp_path / "csv_rt")
    write_csv(df, p, partition_by=["lang"], compression=None)
    back = read_csv(spark, p, schema="id long, text string, lang string",
                    keep_corrupt=False)
    assert sorted((r.id, r.text, r.lang) for r in back.collect()) == [
        (1, 'has,comma', 'en'), (2, 'has "quote"', 'de'), (3, 'plain', 'en')]
    # hive layout: lang=... directories exist for pruning
    assert any(e.startswith("lang=") for e in os.listdir(p))


def test_corrupt_lines_quarantined_as_rows(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text(
        "id,n\n1,10\nnot_a_number_row,xx\n2,20\n")
    back = read_csv(spark, str(p), schema="id bigint, n bigint")
    rows = back.collect()
    good = [(r.id, r.n) for r in rows if r._corrupt_record is None]
    bad = [r._corrupt_record for r in rows if r._corrupt_record is not None]
    assert sorted(good) == [(1, 10), (2, 20)]
    assert bad == ["not_a_number_row,xx"]


def test_bounded_schema_inference(spark, tmp_path):
    p = tmp_path / "infer"
    p.mkdir()
    (p / "part.csv").write_text(
        "id,name\n" + "\n".join(f"{i},n{i}" for i in range(50)) + "\n")
    back = read_csv(spark, str(p), sample_rows=10, keep_corrupt=False)
    assert [f.name for f in back.schema.fields] == ["id", "name"]
    assert back.count() == 50

"""Dataset card (jobs/run_datasheet.build_datasheet): known values on a
hand-built corpus (planted dup, planted email, quality extremes) and
internal consistency on the real sf0.001 documents table. The submit
surface is smoke-run in the session log; this drives the module."""

from jobs.run_datasheet import build_datasheet


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_known_values(spark):
    long_good = " ".join(["alpha beta gamma delta"] * 40)  # len > 500, alphaish
    rows = [
        (0, long_good, "en", "s0", len(long_good)),
        (1, long_good, "en", "s0", len(long_good)),          # exact dup
        (2, "reach me at bob@example.com now", "en", "s1", 31),
        (3, "1234 5678", "de", "s1", 9),                     # low quality
    ]
    card = build_datasheet(spark, _df(spark, rows))
    assert card["n_docs"] == 4
    assert card["languages"] == {"en": 3, "de": 1}
    assert card["distinct_texts"] == 3
    assert card["exact_dup_rate"] == 0.25  # 1 extra copy / 4 docs
    assert card["pii_hits"]["email"] == 1
    assert card["n_sources"] == 2
    # simpson over SOURCES (s0: 2 docs, s1: 2 docs): 1 - (4+4)/16
    assert card["source_simpson_diversity"] == 0.5
    assert 0.0 < card["quality_keep_rate"] < 1.0
    assert card["k_anonymity"]["rows_below"] == 4  # all groups tiny


def test_real_table_consistency(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    card = build_datasheet(spark, df)
    assert card["n_docs"] == 500
    assert sum(card["languages"].values()) == 500
    assert card["length_chars"]["q25"] <= card["length_chars"]["q50"] <= card["length_chars"]["q75"]
    for rate in ("quality_keep_rate", "exact_dup_rate", "source_simpson_diversity"):
        assert 0.0 <= card[rate] <= 1.0
    assert 0 <= card["k_anonymity"]["rows_below"] <= 500

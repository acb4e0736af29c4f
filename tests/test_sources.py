"""sources.py: parquet fallback behavior of the Iceberg seam."""

from __future__ import annotations

from news_information_retrieval_system_spark import sources


def test_iceberg_not_available_here(spark):
    # this container ships no Iceberg runtime jar — the seam must detect
    # that and fall back, not blow up
    assert sources.iceberg_available(spark) is False


def test_read_transcripts_parquet_fallback(spark):
    df = sources.read_transcripts(spark, "/root/testdata/sf0.001/documents.parquet")
    assert df.count() > 0
    assert "text" in df.columns


def test_write_round_trip_coloated(spark, tmp_path):
    from news_information_retrieval_system_spark.corpus import synth_transcripts

    docs = synth_transcripts(spark, 500, seed=3)
    out = str(tmp_path / "turns")
    sources.write_transcripts(docs, out, conv_buckets=4)
    back = sources.read_transcripts(spark, out)
    assert back.count() == 500
    assert set(back.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}


def test_snapshot_fingerprint_tracks_content(spark, tmp_path):
    from news_information_retrieval_system_spark.corpus import synth_transcripts

    out = str(tmp_path / "t2")
    sources.write_transcripts(synth_transcripts(spark, 200, seed=1), out, conv_buckets=2)
    f1 = sources.snapshot_fingerprint(spark, out)
    f2 = sources.snapshot_fingerprint(spark, out)
    assert f1 == f2 and f1.startswith("parquet:")
    sources.write_transcripts(synth_transcripts(spark, 300, seed=2), out, conv_buckets=2)
    assert sources.snapshot_fingerprint(spark, out) != f1

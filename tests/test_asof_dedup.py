"""As-of join operator + streaming dedup-within-watermark (T7) +
second-source union (S4) + empty-line filter (F1)."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from logeventprocessor_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", 1, datetime(2024,3,1,10,0,5)),
            ("A", 2, datetime(2024,3,1,10,0,30)),
            ("B", 3, datetime(2024,3,1,10,0,10)),
            ("C", 4, datetime(2024,3,1,10,0,10)),  # no quotes at all
        ],
        "key string, trade_id int, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", 100, datetime(2024,3,1,10,0,0)),
            ("A", 101, datetime(2024,3,1,10,0,5)),  # ties trade 1 ts
            ("A", 102, datetime(2024,3,1,10,0,40)),  # after trade 2
            ("B", 200, datetime(2024,3,1,9,0,0)),  # old
        ],
        "key string, quote_id int, ts timestamp",
    )
    return trades, quotes


def test_asof_basic(spark, trades_quotes):
    trades, quotes = trades_quotes
    got = (
        asof_join(trades, quotes, key="key", right_cols=["quote_id"])
        .toPandas()
        .set_index("trade_id")
    )
    assert got.loc[1, "asof_quote_id"] == 101  # ts tie -> right visible
    assert got.loc[2, "asof_quote_id"] == 101  # 102 is in the future
    assert got.loc[3, "asof_quote_id"] == 200
    assert pd.isna(got.loc[4, "asof_quote_id"])  # no right rows for C


def test_asof_tolerance(spark, trades_quotes):
    trades, quotes = trades_quotes
    got = (
        asof_join(trades, quotes, key="key", right_cols=["quote_id"],
                  tolerance_ms=60_000)
        .toPandas()
        .set_index("trade_id")
    )
    # B's only quote is 1h old -> outside the 60 s tolerance
    assert pd.isna(got.loc[3, "asof_quote_id"])
    assert got.loc[1, "asof_quote_id"] == 101


def test_asof_tolerance_exact_boundary(spark):
    """A pair landing EXACTLY on the tolerance is kept (<= semantics),
    one microsecond past is dropped -- and both agree with DuckDB's
    exact ``ASOF JOIN ... INTERVAL`` arithmetic. Double-precision epoch
    subtraction (the pre-round-5 implementation) has ~2.4e-7 s
    resolution at 2024 epochs and can flip these rows; the integer
    unix_micros difference cannot."""
    import duckdb

    # gaps vs the single quote at 10:00:00.000001:
    #   trade 1 -> exactly 60 s   (boundary: keep)
    #   trade 2 -> 60 s + 1 us    (drop)
    #   trade 3 -> 59.999999 s    (keep)
    quotes_rows = [("A", 100, datetime(2024, 3, 1, 10, 0, 0, 1))]
    trades_rows = [
        ("A", 1, datetime(2024, 3, 1, 10, 1, 0, 1)),
        ("A", 2, datetime(2024, 3, 1, 10, 1, 0, 2)),
        ("A", 3, datetime(2024, 3, 1, 10, 1, 0, 0)),
    ]
    trades = spark.createDataFrame(
        trades_rows, "key string, trade_id int, ts timestamp"
    )
    quotes = spark.createDataFrame(
        quotes_rows, "key string, quote_id int, ts timestamp"
    )
    got = (
        asof_join(trades, quotes, key="key", right_cols=["quote_id"],
                  tolerance_ms=60_000)
        .toPandas()
        .set_index("trade_id")["asof_quote_id"]
    )
    assert got.loc[1] == 100
    assert pd.isna(got.loc[2])
    assert got.loc[3] == 100

    con = duckdb.connect()
    con.register(
        "trades",
        pd.DataFrame(trades_rows, columns=["key", "trade_id", "ts"]),
    )
    con.register(
        "quotes",
        pd.DataFrame(quotes_rows, columns=["key", "quote_id", "ts"]),
    )
    oracle = con.execute(
        """
        SELECT t.trade_id,
               CASE WHEN q.ts >= t.ts - INTERVAL 60000 MILLISECOND
                    THEN q.quote_id END AS asof_quote_id
        FROM trades t
        ASOF LEFT JOIN quotes q
          ON t.key = q.key AND q.ts <= t.ts
        """
    ).df().set_index("trade_id")["asof_quote_id"]
    for tid in (1, 2, 3):
        s, o = got.loc[tid], oracle.loc[tid]
        assert (pd.isna(s) and pd.isna(o)) or s == o, (tid, s, o)


def test_stream_dedup_within_watermark(spark, tmp_path):
    import os

    from logeventprocessor_spark.streaming.pipeline import (
        dedup_stream,
        read_transcripts_stream,
    )

    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    rows = pd.DataFrame(
        {
            "conv_id": ["c", "c", "c", "d"],
            "turn_idx": pd.array([0, 0, 1, 0], dtype="int32"),  # dup (c,0)
            "role": ["user"] * 4,
            "text": ["a", "a-dup", "b", "x"],
            "tool": [""] * 4,
            "ts": pd.to_datetime(
                ["2024-03-01 10:00:00"] * 2 + ["2024-03-01 10:01:00"] * 2
            ).astype("datetime64[us]"),
        }
    )
    rows.to_parquet(f"{input_dir}/f.parquet", index=False)
    s = read_transcripts_stream(spark, input_dir).withWatermark("ts", "10 minutes")
    d = dedup_stream(s, ["conv_id", "turn_idx"])
    q = (
        d.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(200)
    got = spark.read.parquet(str(tmp_path / "out")).toPandas()
    assert len(got) == 3
    assert not got.duplicated(["conv_id", "turn_idx"]).any()


def test_stream_exact_content_dedup(spark, tmp_path):
    """Streaming exact dedup of the training-data family: duplicate
    CONTENT (normalized text) collapses across different keys within
    the watermark horizon."""
    import os

    from logeventprocessor_spark.operators.dedup import dedup_stream_exact
    from logeventprocessor_spark.streaming.pipeline import (
        read_transcripts_stream,
    )

    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    rows = pd.DataFrame(
        {
            "conv_id": ["a", "b", "c", "d"],
            "turn_idx": pd.array([0, 0, 0, 0], dtype="int32"),
            "role": ["user"] * 4,
            # rows 0/1 are the same text modulo case+whitespace; row 2
            # differs by one word; row 3 is distinct
            "text": [
                "the quick brown fox",
                "The  quick   BROWN fox",
                "the quick brown wolf",
                "something else",
            ],
            "tool": [""] * 4,
            "ts": pd.to_datetime(["2024-03-01 10:00:00"] * 4).astype(
                "datetime64[us]"
            ),
        }
    )
    rows.to_parquet(f"{input_dir}/f.parquet", index=False)
    s = read_transcripts_stream(spark, input_dir).withWatermark("ts", "10 minutes")
    q = (
        dedup_stream_exact(s)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(200)
    got = spark.read.parquet(str(tmp_path / "out")).toPandas()
    assert len(got) == 3  # the normalized duplicate collapsed
    assert not got["fp_md5"].duplicated().any()
    texts = set(got["text"])
    assert "the quick brown wolf" in texts and "something else" in texts
    assert len({"the quick brown fox", "The  quick   BROWN fox"} & texts) == 1


def test_union_second_source_and_empty_filter(spark, tmp_path):
    import os

    from logeventprocessor_spark.operators.match import match_turns
    from logeventprocessor_spark.rules import canonical_rules
    from logeventprocessor_spark.streaming.pipeline import (
        drop_empty_turns,
        read_transcripts_stream,
        union_response_stream,
    )

    turns_dir, resp_dir = str(tmp_path / "t"), str(tmp_path / "r")
    os.makedirs(turns_dir)
    os.makedirs(resp_dir)
    pd.DataFrame(
        {
            "conv_id": ["c", "c"],
            "turn_idx": pd.array([0, 1], dtype="int32"),
            "role": ["user", "user"],
            "text": ["hello wide world", "   "],  # one empty-ish line
            "tool": ["", ""],
            "ts": pd.to_datetime(["2024-03-01 10:00:00"] * 2).astype("datetime64[us]"),
        }
    ).to_parquet(f"{turns_dir}/f.parquet", index=False)
    pd.DataFrame(
        {
            "conv_id": ["c"],
            "turn_idx": pd.array([100], dtype="int32"),
            "role": ["response"],
            "text": ["email test reply"],
            "tool": [""],
            "ts": pd.to_datetime(["2024-03-01 10:05:00"]).astype("datetime64[us]"),
        }
    ).to_parquet(f"{resp_dir}/f.parquet", index=False)

    t = read_transcripts_stream(spark, turns_dir)
    r = read_transcripts_stream(spark, resp_dir)
    unioned = drop_empty_turns(union_response_stream(t, r))
    m = match_turns(unioned, canonical_rules())
    q = (
        m.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(200)
    got = spark.read.parquet(str(tmp_path / "out")).toPandas()
    fired = set(got["rule_id"])
    assert "hello_world_response" in fired  # from the turns stream
    assert "email_test" in fired  # from the response stream
    assert 1 not in set(got["turn_idx"])  # empty line never matched


def test_stream_neardup_candidates(spark, tmp_path):
    """Streaming near-dup detection at ingest: a doc whose MinHash band
    bucket was claimed earlier emits a (doc_id, dup_of) candidate;
    unrelated docs emit nothing; the batch exact-Jaccard truth confirms
    every emitted candidate really is similar (verify-downstream
    contract)."""
    import os

    from logeventprocessor_spark.operators.dedup import (
        ngram_jaccard_pairs,
        stream_neardup_candidates,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base, "2024-03-01 10:00:00"),
        (1, "completely unrelated text about catalyst plan optimization rules", "2024-03-01 10:01:00"),
        (2, base, "2024-03-01 10:02:00"),  # exact dup of 0 -> all bands collide
        (3, base + " tonight", "2024-03-01 10:03:00"),  # near dup (J ~ 0.9)
    ]
    input_dir = str(tmp_path / "docs")
    os.makedirs(input_dir)
    pd.DataFrame(
        {
            "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
            "text": [r[1] for r in rows],
            "ts": pd.to_datetime([r[2] for r in rows]).astype("datetime64[us]"),
        }
    ).to_parquet(f"{input_dir}/a.parquet", index=False)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(input_dir)
        .withWatermark("ts", "10 minutes")
    )
    cands = stream_neardup_candidates(stream, k=16, bands=8)
    q = (
        cands.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(200)
    got = spark.read.parquet(str(tmp_path / "out")).toPandas()
    pairs = set(map(tuple, got[["doc_id", "dup_of"]].drop_duplicates().values))
    assert (2, 0) in pairs  # exact dup caught
    assert (3, 0) in pairs or (3, 2) in pairs  # near dup caught
    assert all(d != 1 and o != 1 for d, o in pairs)  # unrelated never flagged
    # every candidate is a true near-dup per the batch exact truth
    docs = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "doc_id long, text string"
    )
    truth = ngram_jaccard_pairs(docs, threshold=0.4).toPandas()
    true_pairs = set(map(tuple, truth[["doc_a", "doc_b"]].values))
    for d, o in pairs:
        assert (min(d, o), max(d, o)) in true_pairs

"""Deterministic synthetic transcript generator (FIXTURES.md section 1).

Produces the primary event-stream table
``(conv_id, turn_idx, role, text, tool, ts)`` with:

* 50-200 conversations, skewed lengths (a few 10-50x longer than the
  median -- exercises salting / AQE skew handling);
* planted substrings so every canonical rule fires a known number of
  times, including repeated fires inside and outside cooldown windows
  (exercises the keyed-state suppression operator);
* >=1 conversation whose rows are out of event-time order and >=1 row
  far later than the watermark (must be dropped by the streaming path,
  mirroring the reference's startup-time late-data cutoff,
  ActionSender.cpp:673-677).

Everything is seeded (default 42) -- same args, same bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BASE_TS = pd.Timestamp("2024-03-01 00:00:00")

_FILLER = [
    "the quick brown fox jumps over the lazy dog",
    "compiling the module took longer than expected",
    "INFO all systems nominal",
    "WARNING retry budget is half consumed",
    "ERROR without brackets should only hit the fallback classifier",
    "let us discuss the quarterly report",
    "tool output was truncated at 4096 bytes",
    "I think we should refactor the parser",
    "the cache hit ratio improved after the change",
    "deployment finished without incident",
]

_ROLES = ["user", "assistant", "tool", "system"]
_TOOLS = ["", "", "", "search", "python", "browser"]

# planted lines: (weight, template). {w} and {i} get filled per use.
_PLANTS = [
    "well hello {w} world again",
    "Time to Attack my minions right now",
    "the silence of CLARICE was deafening",
    "running the email test suite tonight",
    "[ERROR] disk temperature critical",
    "User login: user{i}@example.com confirmed",
    "Gandalf tells you, 'fly you fools'",
    # 6+ digit runs for the no-literal pin_code rule ([0-9]{6}):
    # leftmost-6 extraction varies with {i}
    "access code 7{i}5309 granted",
]

_WORDS = ["cruel", "brave", "new", "small", "wide"]


def make_transcripts(
    n_convs: int = 60,
    mean_turns: int = 24,
    seed: int = 42,
    n_skewed: int = 3,
    skew_factor: int = 20,
    plant_every: int = 5,
    spam_burst_convs: int = 8,
) -> pd.DataFrame:
    """Return a pandas DataFrame in TRANSCRIPTS_SCHEMA order/dtypes."""
    rng = np.random.RandomState(seed)
    rows: list[tuple] = []
    for c in range(n_convs):
        conv_id = f"conv_{c:04d}"
        n_turns = int(rng.poisson(mean_turns)) + 2
        if c < n_skewed:  # a few mega-conversations (skew)
            n_turns *= skew_factor
        t = BASE_TS + pd.Timedelta(seconds=int(rng.randint(0, 3600)))
        ts_list = []
        for i in range(n_turns):
            # event-time gaps: mostly 1-30 s, occasionally minutes
            gap = float(rng.gamma(2.0, 6.0)) + 0.5
            if rng.rand() < 0.05:
                gap += float(rng.randint(60, 300))
            t = t + pd.Timedelta(seconds=gap)
            ts_list.append(t)
        for i in range(n_turns):
            role = _ROLES[int(rng.randint(0, len(_ROLES)))]
            tool = _TOOLS[int(rng.randint(0, len(_TOOLS)))]
            if i % plant_every == 2:
                tmpl = _PLANTS[int(rng.randint(0, len(_PLANTS)))]
                text = tmpl.format(
                    w=_WORDS[int(rng.randint(0, len(_WORDS)))], i=int(rng.randint(0, 50))
                )
            else:
                text = _FILLER[int(rng.randint(0, len(_FILLER)))]
            rows.append((conv_id, i, role, text, tool, ts_list[i]))
        # spam-ping bursts to exercise cooldown: pairs ~1.5 s apart
        # (inside the 5000 ms cooldown -> second fire suppressed) and
        # singles >6 s apart (outside -> fires). INTERLEAVED with
        # rate-limit lines so TWO cooldown chains (spam_guard 5000 ms,
        # rate_guard 4000 ms) run concurrently per conversation: each
        # chain's greedy state must be keyed (conv_id, rule_id) -- a
        # shared clock would wrongly suppress across rules.
        if c < spam_burst_convs:
            t_burst = ts_list[-1]
            idx = n_turns
            for b in range(3):
                t_burst = t_burst + pd.Timedelta(seconds=8)
                rows.append((conv_id, idx, "system", "spam ping alpha", "", t_burst))
                idx += 1
                rows.append((conv_id, idx, "system",
                             "rate limit exceeded on search_api", "",
                             t_burst + pd.Timedelta(seconds=0.5)))
                idx += 1
                t_burst = t_burst + pd.Timedelta(seconds=1.5)
                rows.append((conv_id, idx, "system", "spam ping beta", "", t_burst))
                idx += 1
                rows.append((conv_id, idx, "system",
                             "rate limit exceeded on vector_db", "",
                             t_burst + pd.Timedelta(seconds=1.0)))
                idx += 1

    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )

    # >=1 conversation with out-of-event-time-order rows: swap the ts of
    # two mid-conversation turns in conv_0003 (turn order preserved).
    ooo = pdf.index[pdf["conv_id"] == "conv_0003"]
    if len(ooo) >= 8:
        a, b = ooo[4], ooo[6]
        ta, tb = pdf.at[a, "ts"], pdf.at[b, "ts"]
        pdf.at[a, "ts"], pdf.at[b, "ts"] = tb, ta

    # >=1 row far later than any reasonable watermark: one turn of
    # conv_0004 is stamped 6 hours before its neighbors.
    late = pdf.index[pdf["conv_id"] == "conv_0004"]
    if len(late) >= 4:
        pdf.at[late[3], "ts"] = pdf.at[late[3], "ts"] - pd.Timedelta(hours=6)

    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    # microsecond precision: Spark's parquet reader rejects INT64 nanos
    pdf["ts"] = pd.to_datetime(pdf["ts"]).dt.floor("ms").astype("datetime64[us]")
    return pdf.reset_index(drop=True)


def make_transcripts_fast(
    n_convs: int = 100_000,
    mean_turns: int = 48,
    seed: int = 42,
    n_skewed: int = 50,
    skew_factor: int = 20,
) -> pd.DataFrame:
    """Fully-vectorized (numpy) generator for BENCH-SCALE fixtures
    (tens of millions of turns in seconds). Same schema and the same
    statistical shape as ``make_transcripts`` (planted matches for the
    canonical rules, skewed conversation lengths, per-conv
    non-decreasing event time); not row-identical to the rich
    generator -- tests use ``make_transcripts``, benchmarks use this.
    """
    rng = np.random.RandomState(seed)
    lengths = rng.poisson(mean_turns, n_convs) + 2
    if n_skewed:
        lengths[:n_skewed] = lengths[:n_skewed] * skew_factor
    n = int(lengths.sum())

    conv_ids = np.repeat(np.arange(n_convs), lengths)
    # turn_idx: 0..len-1 within each conversation
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    turn_idx = (np.arange(n) - np.repeat(starts, lengths)).astype("int32")

    # event time: per-conv start + within-conv cumsum of gamma gaps
    gaps = rng.gamma(2.0, 6.0, n) + 0.5
    cum = np.cumsum(gaps)
    conv_t0 = rng.randint(0, 3600, n_convs).astype("float64")
    offsets = np.repeat(cum[starts] - gaps[starts] - conv_t0, lengths)
    ts_sec = cum - offsets
    # direct int64-us -> datetime64[us]: no pandas round-trip copies
    ts = (
        (BASE_TS.value // 1000 + ts_sec * 1_000_000).astype("int64")
    ).view("datetime64[us]")

    # text pool: fillers + pre-expanded plants (~20% planted).
    # object dtype throughout: fancy-indexing a fixed-width U array
    # would materialize rows*maxlen*4 bytes (8+ GB at 30M rows)
    plants = [t.format(w=w, i=i) for t in _PLANTS
              for w in _WORDS[:2] for i in (7, 21)] + [
        "spam ping alpha",
        # second hot (cooldown) rule: keeps BOTH cooldown chains live
        # at bench scale, mirroring the fixture corpus
        "rate limit exceeded on search_api",
        # (the no-literal pin_code plant arrives via _PLANTS expansion)
    ]
    pool = np.array(_FILLER * 3 + plants, dtype=object)
    is_plant = turn_idx % 5 == 2
    pool_idx = rng.randint(0, len(_FILLER) * 3, n)
    plant_idx = rng.randint(len(_FILLER) * 3, len(pool), n)
    text = pool[np.where(is_plant, plant_idx, pool_idx)]

    roles = np.array(_ROLES, dtype=object)[rng.randint(0, len(_ROLES), n)]
    tools = np.array(_TOOLS, dtype=object)[rng.randint(0, len(_TOOLS), n)]

    return pd.DataFrame(
        {
            # format the 600k unique ids once, then fancy-index: np.char
            # ops over the full row count are ~100x slower
            "conv_id": np.array(
                [f"conv_{i:07d}" for i in range(n_convs)], dtype=object
            )[conv_ids],
            "turn_idx": turn_idx,
            "role": roles,
            "text": text,
            "tool": tools,
            "ts": ts,
        }
    )


def transcripts_df(spark, pdf: pd.DataFrame | None = None, **kwargs):
    """Transcripts as a Spark DataFrame (Arrow path)."""
    from logeventprocessor_spark.schema import TRANSCRIPTS_SCHEMA

    if pdf is None:
        pdf = make_transcripts(**kwargs)
    return spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)


def write_transcripts_parquet(
    pdf: pd.DataFrame, out_dir: str, n_files: int = 4
) -> list[str]:
    """Write the transcripts as ``n_files`` parquet files (a file-based
    streaming source: each file becomes (part of) a micro-batch).
    Files are chunked in EVENT-TIME order -- a real stream's arrival
    order -- so conversations interleave and span micro-batches (the
    interesting case for keyed state) while the watermark advances
    monotonically instead of retroactively declaring whole
    conversations late.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    ordered = pdf.sort_values(["ts", "conv_id", "turn_idx"], kind="mergesort")
    paths = []
    chunks = np.array_split(np.arange(len(ordered)), n_files)
    for i, idx in enumerate(chunks):
        p = os.path.join(out_dir, f"turns_{i:04d}.parquet")
        ordered.iloc[idx].to_parquet(p, index=False)
        paths.append(p)
    return paths


def documents_as_transcripts(spark, sf_dir: str):
    """Adapt the driver's ``documents`` table into transcript shape so
    the CEP operators can be exercised (and DuckDB-oracled) on
    driver-owned data: conv_id = source, turn order = doc_id within
    source, ts synthesized deterministically from doc_id.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from logeventprocessor_spark.session import cached_parquet

    docs = cached_parquet(spark, f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("conv_id").orderBy("doc_id")
    return (
        docs.select(
            F.col("source").alias("conv_id"),
            F.col("doc_id"),
            F.col("text"),
        )
        .withColumn("turn_idx", (F.row_number().over(w) - F.lit(1)).cast("int"))
        .withColumn("role", F.lit("user"))
        .withColumn("tool", F.lit(""))
        # wall-clock literal + interval arithmetic: renders identically
        # via date_format in ANY session timezone (an epoch-seconds cast
        # would shift with the driver's tz)
        .withColumn(
            "ts",
            F.expr(
                "timestamp'2024-03-01 00:00:00' + doc_id * INTERVAL 60 SECONDS"
            ),
        )
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )

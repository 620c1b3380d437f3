"""Deterministic repo-local fixture parquet files shared by the Spark
queries and their DuckDB oracles.

Two fixtures make otherwise un-oracle-able queries independently
checkable by the driver's DuckDB comparison:

* ``transcripts``   -- the engine's canonical transcript corpus
  (``generator.make_transcripts(n_convs=40, seed=42)``) written to
  parquet, so the flagship CEP pipeline (match + cooldown + steps)
  can be recomputed in pure SQL (``read_parquet`` + recursive CTE).
* ``embeddings_aug`` -- the driver's ``embeddings`` table augmented
  with SEEDED planted near-duplicates (vec' = vec + small gaussian
  noise, cos(vec, vec') >= ~0.98). The driver's raw embeddings are
  near-random (max pairwise cosine ~0.51), so no true near-dup
  exists to find; the planted pairs give the LSH/ANN operators a
  non-trivial, deterministic ground truth that brute-force SQL can
  verify.

Files are content-versioned by name (bump ``_V`` when generation
logic changes) and written at most once; everything derives from
seed 42 plus the driver's own parquet, so bytes are reproducible.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES_ROOT = os.path.join(_REPO_ROOT, ".fixtures")

_V = "v1"
TRANSCRIPTS_N_CONVS = 40
# sf dir the driver's oracle comparison runs at (oracle SQL strings are
# static, so they embed the fixture paths for THIS sf)
ORACLE_SF_DIR = "/root/testdata/sf0.01"


def _dir(*parts: str) -> str:
    d = os.path.join(FIXTURES_ROOT, *parts)
    os.makedirs(d, exist_ok=True)
    return d


def transcripts_fixture_path(ensure: bool = True) -> str:
    """The canonical transcript corpus as parquet (sf-independent).
    ``ensure=False`` returns the path without writing (used when
    building static oracle SQL strings at import time)."""
    path = os.path.join(_dir("common"), f"transcripts_seed42_{_V}.parquet")
    if ensure and not os.path.exists(path):
        from logeventprocessor_spark.generator import make_transcripts

        pdf = make_transcripts(n_convs=TRANSCRIPTS_N_CONVS, seed=42)
        tmp = path + ".tmp"
        pdf.to_parquet(tmp, index=False)
        os.replace(tmp, path)
    return path


def _augment_embeddings(
    pdf: pd.DataFrame,
    seed: int = 42,
    dup_frac: float = 0.08,
    query_dups: int = 12,
    sigma_lo: float = 0.05,
    sigma_hi: float = 0.18,
) -> pd.DataFrame:
    """Append planted near-duplicates: ``query_dups`` copies of the
    vec_id=0 query vector (so exact ANN top-k is the planted set) plus
    one dup each for ``dup_frac`` of the other rows. Noise magnitude
    sigma*|v| gives cos(v, v') ~= 1/sqrt(1+sigma^2) in [0.984, 0.999].
    """
    rng = np.random.RandomState(seed)
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    base = np.stack([np.asarray(v, dtype="float64") for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    n, d = base.shape
    row0 = int(np.where(ids == 0)[0][0])
    n_dup = max(1, int(round(n * dup_frac)))
    others = [r for r in range(n) if r != row0]
    src_rows = [row0] * query_dups + list(
        rng.choice(others, size=min(n_dup, len(others)), replace=False)
    )
    next_id = int(ids.max()) + 1
    new_ids, new_vecs = [], []
    for s in src_rows:
        v = base[int(s)]
        sigma = sigma_lo + (sigma_hi - sigma_lo) * float(rng.rand())
        noise = rng.normal(0.0, 1.0, d)
        noise = noise / np.linalg.norm(noise) * sigma * np.linalg.norm(v)
        new_ids.append(next_id)
        new_vecs.append((v + noise).astype("float32"))
        next_id += 1
    out_ids = np.concatenate([ids, np.asarray(new_ids, dtype="int64")])
    out_vecs = [np.asarray(v, dtype="float32") for v in pdf["embedding"]] + new_vecs
    return pd.DataFrame({"vec_id": out_ids, "embedding": out_vecs})


def augmented_embeddings_path(sf_dir: str, ensure: bool = True) -> str:
    """Driver embeddings + planted near-dups for this sf, as parquet
    with the SAME arrow types as the driver table (int64, list<float>).
    """
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = os.path.join(_dir(tag), f"embeddings_aug_{_V}.parquet")
    if ensure and not os.path.exists(path):
        pdf = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        out = _augment_embeddings(pdf)
        table = pa.table(
            {
                "vec_id": pa.array(out["vec_id"].to_numpy(), type=pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in out["embedding"]],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    return path


def ivf_index_path(sf_dir: str) -> str:
    """Directory for the persisted IVF index of this sf's augmented
    embeddings (centers.json + lists/ partitioned by _list)."""
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(_dir(tag), f"ivf_index_{_V}")


def query_vector(sf_dir: str) -> list[float]:
    """The vec_id=0 query vector, read driver-side via pyarrow (no
    Spark job -- the fixture file is local and small)."""
    t = pq.read_table(
        augmented_embeddings_path(sf_dir), columns=["vec_id", "embedding"]
    )
    idx = t.column("vec_id").to_pylist().index(0)
    return [float(x) for x in t.column("embedding")[idx].as_py()]


def embedding_dim(sf_dir: str) -> int:
    pf = pq.ParquetFile(augmented_embeddings_path(sf_dir))
    batch = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    return len(batch.column(0)[0])


def ensure_oracle_fixtures() -> None:
    """Write every fixture the STATIC oracle SQL strings reference, so
    the driver can run the oracles regardless of call order."""
    transcripts_fixture_path()
    augmented_embeddings_path(ORACLE_SF_DIR)

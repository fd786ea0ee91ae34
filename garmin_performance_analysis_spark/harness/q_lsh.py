"""SRP-LSH similarity catalog entry (the LSH-bucketed ANN variant)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipelines.similarity import semantic_dedup, srp_lsh_pairs, srp_multiprobe_pairs
from ..sources.tables import load_table
from .registry import r6 as _r6
from .registry import register

_COS = (
    "list_sum(list_transform(generate_series(1, 64),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _cos_expr(a: str, b: str) -> str:
    dot = _COS.format(a=a, b=b)
    na = "sqrt(" + _COS.format(a=a, b=a) + ")"
    nb = "sqrt(" + _COS.format(a=b, b=b) + ")"
    return f"({dot}) / ({na} * {nb})"


@register(
    "v4_srp_lsh_pairs",
    oracle=f"""
WITH planes AS (
  SELECT t, b, i,
         CASE WHEN strpos('0123456789abcdef',
                          substr(md5(t || ':' || b || ':' || i), 1, 1)) <= 8
              THEN 1 ELSE -1 END AS coef
  FROM (SELECT unnest(generate_series(0, 3)) AS t),
       (SELECT unnest(generate_series(0, 3)) AS b),
       (SELECT unnest(generate_series(0, 63)) AS i)
),
comps AS (
  SELECT vec_id AS vid, i.i AS i, embedding[i.i + 1] AS v
  FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS i) i
),
proj AS (
  -- scaled-long accumulation (FLOOR(x*1e7 + 0.5)), mirroring the
  -- engine's integerized projection sum exactly
  SELECT c.vid, p.t, p.b,
         SUM(CAST(FLOOR(p.coef * c.v * 10000000.0 + 0.5) AS BIGINT)) AS dot
  FROM comps c JOIN planes p ON c.i = p.i
  GROUP BY c.vid, p.t, p.b
),
buckets AS (
  SELECT vid, t,
         string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS bucket
  FROM proj GROUP BY vid, t
),
cand AS (
  SELECT DISTINCT a.vid AS id_a, b.vid AS id_b
  FROM buckets a JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket AND a.vid < b.vid
)
SELECT c.id_a, c.id_b,
       ROUND({_cos_expr('x.embedding', 'y.embedding')}, 6) AS cosine
FROM cand c
JOIN embeddings x ON c.id_a = x.vec_id
JOIN embeddings y ON c.id_b = y.vec_id
WHERE {_cos_expr('x.embedding', 'y.embedding')} >= 0.4
""",
    tags=("similarity", "dedup"),
)
def v4_srp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-random-projection LSH near-neighbor pairs (4 tables × 4
    bits, deterministic md5-derived hyperplanes) verified by exact
    cosine ≥ 0.4 — the bucketed alternative to the IVF path: candidates
    come from a bucket equi-join, never an all-pairs cross."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = srp_lsh_pairs(emb, "vec_id", "embedding", dim=64, tables=4, bits=4, threshold=0.4)
    return out.select("id_a", "id_b", _r6(F.col("cosine")).alias("cosine"))


@register(
    "v4b_srp_multiprobe",
    oracle=f"""
WITH planes AS (
  SELECT t, b, i,
         CASE WHEN strpos('0123456789abcdef',
                          substr(md5(t || ':' || b || ':' || i), 1, 1)) <= 8
              THEN 1 ELSE -1 END AS coef
  FROM (SELECT unnest(generate_series(0, 3)) AS t),
       (SELECT unnest(generate_series(0, 7)) AS b),
       (SELECT unnest(generate_series(0, 63)) AS i)
),
comps AS (
  SELECT vec_id AS vid, i.i AS i, embedding[i.i + 1] AS v
  FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS i) i
),
proj AS (
  SELECT c.vid, p.t, p.b,
         SUM(CAST(FLOOR(p.coef * c.v * 10000000.0 + 0.5) AS BIGINT)) AS dot
  FROM comps c JOIN planes p ON c.i = p.i
  GROUP BY c.vid, p.t, p.b
),
buckets AS (
  SELECT vid, t,
         string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS bucket
  FROM proj GROUP BY vid, t
),
probes AS (
  SELECT vid, t, bucket FROM buckets
  UNION ALL
  SELECT vid, t,
         substr(bucket, 1, j - 1)
           || (CASE WHEN substr(bucket, j, 1) = '1' THEN '0' ELSE '1' END)
           || substr(bucket, j + 1, 8) AS bucket
  FROM buckets, (SELECT unnest(generate_series(1, 8)) AS j)
),
cand AS (
  SELECT DISTINCT a.vid AS id_a, b.vid AS id_b
  FROM buckets a JOIN probes b ON a.t = b.t AND a.bucket = b.bucket AND a.vid < b.vid
)
SELECT c.id_a, c.id_b,
       ROUND({_cos_expr('x.embedding', 'y.embedding')}, 6) AS cosine
FROM cand c
JOIN embeddings x ON c.id_a = x.vec_id
JOIN embeddings y ON c.id_b = y.vec_id
WHERE {_cos_expr('x.embedding', 'y.embedding')} >= 0.4
""",
    tags=("similarity", "dedup"),
)
def v4b_srp_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe SRP-LSH pairs (4 tables × 8 bits, Hamming-≤1 probe)
    — the scale-path answer to the measured v4 lesson (SCALING.md:
    fixed 4-bit tables go quadratic at 10×; 8-bit tables fix the wall
    but collapse recall; probing one-bit perturbations restores recall
    at 16× the bucket resolution).  Candidates stay a bucket equi-join
    with a (1+bits)× emission on ONE side only."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = srp_multiprobe_pairs(
        emb, "vec_id", "embedding", dim=64, tables=4, bits=8, threshold=0.4
    )
    return out.select("id_a", "id_b", _r6(F.col("cosine")).alias("cosine"))


@register(
    "v9_semantic_dedup",
    oracle=f"""
WITH RECURSIVE planes AS (
  SELECT t, b, i,
         CASE WHEN strpos('0123456789abcdef',
                          substr(md5(t || ':' || b || ':' || i), 1, 1)) <= 8
              THEN 1 ELSE -1 END AS coef
  FROM (SELECT unnest(generate_series(0, 3)) AS t),
       (SELECT unnest(generate_series(0, 3)) AS b),
       (SELECT unnest(generate_series(0, 63)) AS i)
),
comps AS (
  SELECT vec_id AS vid, i.i AS i, embedding[i.i + 1] AS v
  FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS i) i
),
proj AS (
  SELECT c.vid, p.t, p.b,
         SUM(CAST(FLOOR(p.coef * c.v * 10000000.0 + 0.5) AS BIGINT)) AS dot
  FROM comps c JOIN planes p ON c.i = p.i
  GROUP BY c.vid, p.t, p.b
),
buckets AS (
  SELECT vid, t,
         string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS bucket
  FROM proj GROUP BY vid, t
),
cand AS (
  SELECT DISTINCT a.vid AS id_a, b.vid AS id_b
  FROM buckets a JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket AND a.vid < b.vid
),
pairs AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN embeddings x ON c.id_a = x.vec_id
  JOIN embeddings y ON c.id_b = y.vec_id
  WHERE {_cos_expr('x.embedding', 'y.embedding')} >= 0.4
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
lab AS (
  SELECT a AS vid, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
),
labeled AS (
  SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
         CAST(COALESCE(l.cluster_id, e.vec_id) AS BIGINT) AS cluster_id
  FROM embeddings e LEFT JOIN lab l ON l.vid = e.vec_id
)
SELECT vec_id, cluster_id,
       (cluster_id = vec_id) AS is_canonical,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
FROM labeled
ORDER BY vec_id
""",
    tags=("similarity", "dedup"),
)
def v9_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup verdict for EVERY embedding:
    SRP-LSH candidate pairs verified at exact cosine >= 0.4, connected
    into components (pointer-jumping min-label), canonical = min id per
    component, plus the cluster size.  The embedding-space sibling of
    d5's MinHash clusters — catches paraphrase duplicates that share no
    n-grams.  The oracle replays the identical deterministic chain with
    a recursive transitive-closure CTE (unique fixpoint -> identical
    output regardless of algorithm)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, "vec_id", "embedding", dim=64, tables=4, bits=4, threshold=0.4)
    return out.orderBy("vec_id")

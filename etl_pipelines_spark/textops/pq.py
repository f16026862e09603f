"""Product quantization (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011) — the vector-compression step a
100 TB embedding corpus needs: 64 float32 dims (256 B) collapse to m=8
one-byte codes, a 32x compression that makes the candidate-scan side
of ANN fit in memory at billion-vector scale.

Two operators:

  * pq_encode_exact — assign each of m subvectors to its nearest
    codebook centroid (squared-L2, strict left-to-right fold). Narrow
    Arrow map over a broadcast codebook; vectors never shuffle, the
    OUTPUT is the compressed (id, code_0..code_{m-1}, recon_err) row.
  * pq_adc_topk — asymmetric-distance (ADC) top-k: each query builds
    an m x ksub lookup table of exact subvector-to-centroid distances
    (queries stay uncompressed — the "asymmetric" in ADC), broadcast
    against the corpus CODES; per-candidate distance is m table
    lookups + (m-1) adds in pure JVM expressions. The corpus's float
    vectors are touched exactly once (at encode time).

Value-exactness follows the repo's fixed-quantizer recipe
(textops/similarity.fixed_ivf_centroids): the codebook is generated
from a seeded python RNG as plain floats, broadcast to the Arrow maps
AND rendered as SQL literal lists in the DuckDB oracles; every float
fold is spelled left-to-right on both engines, and argmin ties break
toward the lowest code (numpy first-occurrence == ORDER BY dist,
code). The reference's pipelines stop at exact/brute similarity
(ds-airflow-prod/business_logic; see SURVEY.md §2.11) — PQ is part of
the beyond-reference LLM-data surface this engine adds.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pq_codebooks(
    dim: int = 64, m: int = 8, ksub: int = 16, seed: int = 11
) -> "list[list[list[float]]]":
    """Deterministic, data-independent PQ codebook: for each of the m
    subspaces, ksub Gaussian centroids over the dsub = dim/m
    sub-dimensions, as plain python floats so the exact same values
    feed the Spark broadcast and the oracle's literals. (A k-means
    codebook trained per subspace is the quality path — same
    swap-the-quantizer relationship as fixed_ivf_centroids vs
    train_ivf_centroids.)"""
    assert dim % m == 0
    dsub = dim // m
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dsub)] for _ in range(ksub)]
        for _ in range(m)
    ]


def pq_encode_exact(
    df: DataFrame,
    codebooks: "list[list[list[float]]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    _bc=None,
) -> DataFrame:
    """Compress each vector to m codes + its reconstruction error.

    Narrow Arrow map over the broadcast codebook — no shuffle; at
    100 TB every partition encodes independently and the downstream
    pipeline carries only the (id, codes) rows. Distances accumulate
    left-to-right over the sub-dimension axis (vectorized across rows
    and codes), argmin ties break to the lowest code — bit-identical
    to the oracle's list_sum + ROW_NUMBER form. recon_err is the
    ADC-style left-associated sum of the m winning distances.
    """
    import numpy as np

    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    bc = _bc or df.sparkSession.sparkContext.broadcast(
        np.array(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    )

    def encode(batches):
        import pandas as pd

        C = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            cols = {id_col: pdf[id_col].to_numpy()}
            err = None
            for j in range(m):
                d = np.zeros((len(pdf), ksub), dtype=np.float64)
                for i in range(dsub):  # fold order = oracle list_sum
                    diff = M[:, j * dsub + i, None] - C[None, j, :, i]
                    d += diff * diff
                code = d.argmin(axis=1)  # first occurrence = lowest code
                best = d[np.arange(len(pdf)), code]
                cols[f"code_{j}"] = code.astype(np.int32)
                err = best.copy() if err is None else err + best
            cols["recon_err"] = err
            yield pd.DataFrame(cols)

    code_fields = ", ".join(f"code_{j} int" for j in range(m))
    return df.select(id_col, vec_col).mapInPandas(
        encode, schema=f"{id_col} long, {code_fields}, recon_err double"
    )


def _adc_dist(lut: Column, m: int, ksub: int) -> Column:
    """ADC distance: m lookups into the flattened query LUT,
    left-associated adds — pure JVM expressions over the codes."""
    out = F.element_at(lut, F.lit(1) + F.col("code_0"))
    for j in range(1, m):
        out = out + F.element_at(lut, F.lit(j * ksub + 1) + F.col(f"code_{j}"))
    return out


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: "list[list[list[float]]]",
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k by asymmetric PQ distance.

    The corpus is encoded once (narrow map; float vectors never
    leave their scan partitions); each query precomputes its
    m x ksub distance table in one Arrow pass over the tiny query
    side and broadcasts it; candidate scoring is a broadcast
    cross-join over the CODES frame with m element_at lookups —
    whole-stage-codegen JVM work on ~9-byte rows. The only shuffle is
    the final per-query top-k window over (query_id, id, dist).
    Returns (query_id, id, adist, rank), ranked ascending (ADC is a
    distance, not a similarity).
    """
    import numpy as np

    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    # one broadcast serves both the corpus encode and the query LUT
    bc = corpus.sparkSession.sparkContext.broadcast(
        np.array(codebooks, dtype=np.float64)
    )
    codes = pq_encode_exact(
        corpus, codebooks, id_col, vec_col, _bc=bc
    ).drop("recon_err")

    def lut_gen(batches):
        import pandas as pd

        C = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            luts = []
            for j in range(m):
                d = np.zeros((len(pdf), ksub), dtype=np.float64)
                for i in range(dsub):  # fold order = oracle list_sum
                    diff = M[:, j * dsub + i, None] - C[None, j, :, i]
                    d += diff * diff
                luts.append(d)
            flat = np.concatenate(luts, axis=1)  # (n, m*ksub), j-major
            yield pd.DataFrame(
                {
                    query_id_col: pdf[query_id_col].to_numpy(),
                    "__lut": list(flat),
                }
            )

    lut = queries.select(query_id_col, vec_col).mapInPandas(
        lut_gen, schema=f"{query_id_col} long, __lut array<double>"
    )
    scored = codes.crossJoin(F.broadcast(lut)).select(
        query_id_col,
        id_col,
        _adc_dist(F.col("__lut"), m, ksub).alias("adist"),
    )
    w = Window.partitionBy(query_id_col).orderBy("adist", id_col)
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _codebook_values_sql(codebooks: "list[list[list[float]]]") -> str:
    rows = []
    for j, cents in enumerate(codebooks):
        for code, c in enumerate(cents):
            lit = "[" + ", ".join(repr(v) for v in c) + "]"
            rows.append(f"({j}, {code}, {lit}::DOUBLE[])")
    return ",\n".join(rows)


def _pq_dist_ctes(
    table: str,
    id_col: str,
    vec_col: str,
    codebooks: "list[list[list[float]]]",
) -> str:
    """Shared oracle CTEs: per-(vector, subspace, code) squared-L2
    distance over the literal codebook, and the argmin code per
    (vector, subspace)."""
    dsub = len(codebooks[0][0])
    values = _codebook_values_sql(codebooks)
    return f"""
WITH cb(j, code, c) AS (VALUES
{values}
),
d AS (
  SELECT e.{id_col}, cb.j, cb.code,
    list_sum(list_transform(range(1, {dsub + 1}),
      i -> (e.{vec_col}[cb.j * {dsub} + i]::DOUBLE - cb.c[i])
         * (e.{vec_col}[cb.j * {dsub} + i]::DOUBLE - cb.c[i]))) AS dist
  FROM {table} e CROSS JOIN cb
),
best AS (
  SELECT {id_col}, j, code, dist FROM (
    SELECT {id_col}, j, code, dist,
      ROW_NUMBER() OVER (PARTITION BY {id_col}, j
                         ORDER BY dist, code) AS rn
    FROM d) WHERE rn = 1
)"""


def pq_encode_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    seed: int = 11,
) -> str:
    """DuckDB oracle for pq_encode_exact: literal codebook, list_sum
    fold, ROW_NUMBER argmin, recon_err as the left-associated pivot
    sum (SQL + is left-associative, matching the numpy accumulation
    order)."""
    cb = pq_codebooks(dim=dim, m=m, ksub=ksub, seed=seed)
    ctes = _pq_dist_ctes(table, id_col, vec_col, cb)
    code_cols = ",\n  ".join(
        f"CAST(MAX(CASE WHEN j = {j} THEN code END) AS INT) AS code_{j}"
        for j in range(m)
    )
    err_sum = " + ".join(f"MAX(CASE WHEN j = {j} THEN dist END)" for j in range(m))
    return f"""{ctes}
SELECT {id_col},
  {code_cols},
  round({err_sum}, 6) AS recon_err
FROM best
GROUP BY {id_col}
ORDER BY {id_col}
"""


def pq_adc_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    seed: int = 11,
    query_pred: str = "vec_id < 5",
) -> str:
    """DuckDB oracle for pq_adc_topk: corpus codes from the shared
    argmin CTE; each query's LUT is just its own rows of the d table;
    ADC distance joins codes to the query's d rows on (j, code) and
    sums via the left-associated pivot (same fold as the JVM
    element_at chain)."""
    cb = pq_codebooks(dim=dim, m=m, ksub=ksub, seed=seed)
    ctes = _pq_dist_ctes(table, id_col, vec_col, cb)
    adist = " + ".join(f"MAX(CASE WHEN j = {j} THEN qdist END)" for j in range(m))
    return f"""{ctes},
pairs AS (
  SELECT dq.{id_col} AS query_id, cx.{id_col}, cx.j, dq.dist AS qdist
  FROM best cx
  JOIN d dq ON dq.j = cx.j AND dq.code = cx.code
  WHERE dq.{id_col} IN (SELECT {id_col} FROM {table} WHERE {query_pred})
),
adc AS (
  SELECT query_id, {id_col}, {adist} AS adist
  FROM pairs GROUP BY query_id, {id_col}
),
ranked AS (
  SELECT query_id, {id_col}, adist,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY adist, {id_col}) AS rank
  FROM adc
)
SELECT query_id, {id_col}, round(adist, 6) AS adist, rank
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""

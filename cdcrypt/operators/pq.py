"""Vector compression for the ANN stack: scalar quantization (SQ8) and
product quantization (PQ) with asymmetric-distance (ADC) top-k — the
memory side of corpus-scale similarity search (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011; the
Faiss SQ8/PQ recipes).

At 10^10 vectors x 128 float32 dims the raw corpus is ~5 TB of vector
payload; SQ8 stores 1 byte/dim (4x) and PQ m bytes/vector (typ. 8-64:
8-64x), which is the difference between an index that fits executor
memory and one that doesn't. Queries stay full-precision; scoring is
asymmetric (query vs reconstructed/looked-up code), the standard
accuracy-preserving choice.

Two quantizers, two verification regimes (deliberate):

- **SQ8** (:func:`sq_train` / :func:`sq_encode` / :func:`sq_topk`):
  per-dimension linear [lo, hi] grids from one aggregate pass. Encode,
  reconstruct, and ADC scoring are PURE Column expressions (codegen,
  no Python in the plan), and every float step is replayed term-for-term
  by the DuckDB oracle (gate ``ann_sq_topk``) — the fully-verifiable
  member, exactly like the LSH family.
- **PQ** (:func:`train_pq` / :func:`pq_encode` / :func:`pq_topk`):
  per-subspace k-means codebooks (the paper's construction) trained
  driver-side on a bounded sample with the engine's seeded kmeans++
  (similarity.py `_kmeans_fit` — the IVF/Faiss recipe), encode + ADC as
  Arrow-batched numpy (one BLAS pass per batch, no per-row Python).
  K-means is not SQL-expressible, so PQ is verified by property tests
  (exact ranking when vectors coincide with centroids, recall floor on
  clustered data vs brute force, determinism) — the SemDeDup-kmeans
  precedent.

Scale shape: training collects a bounded sample (<=256k rows) and the
per-dim bounds are a dim-sized driver array; encoding and scoring are
single-pass over the corpus with codebooks shipped in the closure; topk
is per-batch partial top-k + one global rank window per query — shuffle
carries Q x k x partitions candidate rows, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "PQCodebook",
    "ivfpq_topk",
    "pq_encode",
    "pq_topk",
    "sq_encode",
    "sq_topk",
    "sq_train",
    "train_pq",
]


# --------------------------------------------------------------------------
# SQ8 — the oracle-verifiable scalar quantizer
# --------------------------------------------------------------------------

def sq_train(df: DataFrame, vec_col: str = "embedding",
             nbits: int = 8) -> dict:
    """Per-dimension [lo, hi] bounds from ONE aggregate pass over the
    exploded (dim, value) relation — {'lo': [...], 'hi': [...], 'levels':
    2^nbits - 1}. The bounds are a dim-sized driver array (bytes), not a
    data collect. Constant dimensions (hi == lo) encode to 0 and
    reconstruct to lo exactly."""
    ex = df.select(F.posexplode(
        F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ).alias("i", "x"))
    rows = (ex.groupBy("i")
            .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
            .orderBy("i").collect())
    return {"lo": [r["lo"] for r in rows],
            "hi": [r["hi"] for r in rows],
            "levels": (1 << nbits) - 1}


def _sq_cols(book: dict):
    lo = F.array(*[F.lit(float(v)) for v in book["lo"]])
    step = F.array(*[
        F.lit((h - l) / book["levels"]) for l, h in
        zip(book["lo"], book["hi"])])
    return lo, step, len(book["lo"])


def sq_encode(df: DataFrame, book: dict, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<int>): code_i = clamp(floor((x_i - lo_i)/step_i),
    0, levels). Pure Column arithmetic — the identical expression tree
    the oracle runs, so codes match bit-for-bit cross-engine."""
    lo, step, dim = _sq_cols(book)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    idx = F.sequence(F.lit(1), F.lit(dim))
    code = F.transform(idx, lambda i: F.when(
        F.element_at(step, i) == 0.0, F.lit(0)).otherwise(
        F.greatest(F.lit(0), F.least(
            F.lit(book["levels"]),
            F.floor((F.element_at(v, i) - F.element_at(lo, i))
                    / F.element_at(step, i)).cast("int")))))
    return df.select(F.col(id_col), code.alias("codes"))


def _sq_reconstruct(book: dict):
    lo, step, dim = _sq_cols(book)
    idx = F.sequence(F.lit(1), F.lit(dim))
    return lambda codes: F.transform(idx, lambda i: (
        F.element_at(lo, i)
        + (F.element_at(codes, i).cast("double") + 0.5)
        * F.element_at(step, i)))


def sq_topk(codes: DataFrame, queries: DataFrame, book: dict, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            round_digits: int = 4) -> DataFrame:
    """ADC top-k: full-precision queries against code-reconstructed
    corpus vectors (center-of-cell reconstruction: lo + (c+0.5)*step),
    squared-L2, ascending. Output (query_id, neighbor_id, rank, dist);
    ties break on neighbor id, the ANN-gate contract.

    The distance fold is a SEQUENTIAL ``F.aggregate`` (not numpy), so
    float summation order matches the oracle's list fold exactly — the
    same discipline as the cosine gates. Plan: broadcast queries cross
    the codes (candidate rows ~ corpus x Q, the exact-baseline shape; use
    PQ/IVF for corpus-scale Q) + one rank window."""
    recon = _sq_reconstruct(book)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col),
                    lambda x: x.cast("double")).alias("qv"))
    c = codes.select(F.col(id_col).alias("neighbor_id"),
                     recon(F.col("codes")).alias("rv"))
    d2 = F.aggregate(
        F.zip_with("qv", "rv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = (F.broadcast(q).crossJoin(c)
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.round(d2, round_digits).alias("dist")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "dist"))


# --------------------------------------------------------------------------
# PQ — the kmeans quality path (property-test verified)
# --------------------------------------------------------------------------

class PQCodebook:
    """m sub-quantizers of 2^nbits centroids over dim/m-wide subspaces."""

    def __init__(self, centroids, m: int, nbits: int, dim: int):
        self.centroids = centroids  # list[m] of list[k] of list[dsub]
        self.m, self.nbits, self.dim = m, nbits, dim

    def as_numpy(self):
        import numpy as np
        return [np.asarray(c, dtype=np.float64) for c in self.centroids]


def train_pq(train: DataFrame, m: int = 8, nbits: int = 8,
             vec_col: str = "embedding", seed: int = 7,
             max_train: int = 262_144, n_iter: int = 20) -> PQCodebook:
    """Per-subspace seeded kmeans on a bounded driver-side sample (the
    Faiss recipe; reuses similarity.py's kmeans++/Lloyd's). dim must be
    divisible by m (pad upstream or pick another m — silent zero-padding
    would corrupt distances)."""
    from cdcrypt.operators.similarity import _kmeans_fit, _train_sample

    X = _train_sample(train, vec_col, max_train)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    cents = [
        _kmeans_fit(X[:, j * dsub:(j + 1) * dsub], 1 << nbits,
                    seed + j, n_iter)
        for j in range(m)
    ]
    return PQCodebook(cents, m, nbits, dim)


def pq_encode(df: DataFrame, book: PQCodebook, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, codes binary): m bytes per vector — argmin sub-distance per
    subspace, one vectorized ``||x||^2 - 2xC^T + ||C||^2`` per (batch,
    subspace). Arrow-batched; the codebook ships once per executor in
    the closure."""
    import numpy as np
    import pandas as pd

    C = book.as_numpy()
    m, dsub = book.m, book.dim // book.m
    out_schema = f"{id_col} long, codes binary"

    def enc(batches):
        for pdf in batches:
            X = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            codes = np.empty((len(pdf), m), dtype=np.uint8)
            for j in range(m):
                S = X[:, j * dsub:(j + 1) * dsub]
                Cj = C[j]
                d2 = ((S * S).sum(1)[:, None] - 2.0 * S @ Cj.T
                      + (Cj * Cj).sum(1)[None, :])
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "codes": [c.tobytes() for c in codes]})

    return df.select(id_col, vec_col).mapInPandas(enc, out_schema)


def pq_topk(codes: DataFrame, queries: DataFrame, book: PQCodebook,
            k: int = 5, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """ADC top-k over PQ codes: per query a (m x 2^nbits) lookup table of
    sub-distances, each code row scores as m table lookups summed — the
    paper's ADC. Per Arrow batch: decode to (n, m) uint8, one fancy-index
    gather per subspace, PARTIAL top-k per batch (argpartition), then one
    global rank window — the shuffle carries Q x k x partitions rows.
    Queries are driver-collected (bounded query batch, the ANN-gate
    contract)."""
    import numpy as np
    import pandas as pd

    C = book.as_numpy()
    m, dsub = book.m, book.dim // book.m
    qrows = queries.select(id_col, vec_col).collect()
    qids = [r[0] for r in qrows]
    LUT = []
    for r in qrows:
        qv = np.asarray(r[1], dtype=np.float64)
        lut = np.empty((m, C[0].shape[0]))
        for j in range(m):
            s = qv[j * dsub:(j + 1) * dsub]
            Cj = C[j]
            lut[j] = ((Cj - s) ** 2).sum(axis=1)
        LUT.append(lut)

    def score(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            codes_arr = np.frombuffer(
                b"".join(pdf["codes"]), dtype=np.uint8).reshape(n, m)
            ids = pdf[id_col].to_numpy()
            out_q, out_i, out_d = [], [], []
            for qi, lut in zip(qids, LUT):
                d = np.zeros(n)
                for j in range(m):
                    d += lut[j][codes_arr[:, j]]
                top = min(k + 1, n)  # +1: the query itself may be here
                part = np.argpartition(d, top - 1)[:top]
                out_q.extend([qi] * len(part))
                out_i.extend(ids[part])
                out_d.extend(d[part])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_i,
                                "adc": out_d})

    partial = codes.mapInPandas(
        score, "query_id long, neighbor_id long, adc double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc())
    return (partial.where(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("adc", 4).alias("adc")))


# --------------------------------------------------------------------------
# IVF+PQ — the composed billion-scale recipe (Faiss IVFPQ)
# --------------------------------------------------------------------------

def ivfpq_topk(base: DataFrame, queries: DataFrame, k: int = 5,
               n_centroids: int = 16, n_probe: int = 4, m: int = 8,
               nbits: int = 8, id_col: str = "vec_id",
               vec_col: str = "embedding", seed: int = 7,
               max_train: int = 262_144) -> DataFrame:
    """IVF coarse pruning + PQ-over-RESIDUALS ADC — the composed index
    every billion-vector deployment runs (Jégou et al. 2011 §IV.B; the
    Faiss IVFPQ default): a coarse quantizer routes each vector to a
    cell, PQ encodes the RESIDUAL ``x - C[cell]`` (residuals concentrate
    near 0, so the same code budget buys far lower quantization error
    than coding raw vectors), and a query probes only ``n_probe`` cells
    with a per-(query, cell) lookup table built from ITS residual.

    One corpus pass total: cell assignment (BLAS argmin), residual, and
    PQ encode fuse into a single ``mapInPandas`` stage — one Arrow
    boundary, codebooks in the closure. Scoring touches only rows of
    probed cells; per-batch partial top-k keeps the shuffle at
    Q x k x partitions rows. Training (coarse + per-subspace kmeans on
    residuals) runs driver-side on one bounded sample, the Faiss recipe.

    Verification regime: property tests (kmeans is not SQL-expressible);
    the oracle-gated members of the stack are ``ann_sq_topk`` (this
    module) and ``ann_ivf_topk`` (full-precision IVF, similarity.py).
    """
    import numpy as np
    import pandas as pd

    from cdcrypt.operators.similarity import _kmeans_fit, _train_sample

    X = _train_sample(base, vec_col, max_train)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    coarse = np.asarray(
        _kmeans_fit(X, n_centroids, seed, 20), dtype=np.float64)
    cn = (coarse * coarse).sum(axis=1)
    lab = (cn[None, :] - 2.0 * (X @ coarse.T)).argmin(axis=1)
    R = X - coarse[lab]
    C = [np.asarray(_kmeans_fit(R[:, j * dsub:(j + 1) * dsub],
                                1 << nbits, seed + 1 + j, 20),
                    dtype=np.float64) for j in range(m)]

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Xb = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cell = (cn[None, :] - 2.0 * (Xb @ coarse.T)).argmin(axis=1)
            Rb = Xb - coarse[cell]
            codes = np.empty((len(pdf), m), dtype=np.uint8)
            for j in range(m):
                S = Rb[:, j * dsub:(j + 1) * dsub]
                Cj = C[j]
                codes[:, j] = ((S * S).sum(1)[:, None] - 2.0 * S @ Cj.T
                               + (Cj * Cj).sum(1)[None, :]).argmin(axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "cell": cell.astype(np.int32),
                "codes": [c.tobytes() for c in codes]})

    encoded = base.select(id_col, vec_col).mapInPandas(
        encode, f"{id_col} long, cell int, codes binary")

    qrows = queries.select(id_col, vec_col).collect()
    n_probe = min(n_probe, n_centroids)
    plan = []  # (query_id, probed cell -> LUT)
    for r in qrows:
        qv = np.asarray(r[1], dtype=np.float64)
        order = np.argsort(cn - 2.0 * (coarse @ qv), kind="stable")
        luts = {}
        for c in order[:n_probe]:
            rq = qv - coarse[c]
            lut = np.empty((m, C[0].shape[0]))
            for j in range(m):
                s = rq[j * dsub:(j + 1) * dsub]
                Cj = C[j]
                lut[j] = ((Cj - s) ** 2).sum(axis=1)
            luts[int(c)] = lut
        plan.append((r[0], luts))

    def score(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            codes_arr = np.frombuffer(
                b"".join(pdf["codes"]), dtype=np.uint8).reshape(n, m)
            cells = pdf["cell"].to_numpy()
            ids = pdf[id_col].to_numpy()
            out_q, out_i, out_d = [], [], []
            for qi, luts in plan:
                for c, lut in luts.items():
                    mask = cells == c
                    if not mask.any():
                        continue
                    sub = codes_arr[mask]
                    d = np.zeros(len(sub))
                    for j in range(m):
                        d += lut[j][sub[:, j]]
                    top = min(k + 1, len(sub))
                    part = np.argpartition(d, top - 1)[:top]
                    out_q.extend([qi] * len(part))
                    out_i.extend(ids[mask][part])
                    out_d.extend(d[part])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_i,
                                "adc": out_d})

    partial = encoded.mapInPandas(
        score, "query_id long, neighbor_id long, adc double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc())
    return (partial.where(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("adc", 4).alias("adc")))

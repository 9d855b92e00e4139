"""Round-3 extension operators, batch 25: BM25 term scoring, SemDeDup-style
semantic dedup over clustered embeddings, and a multi-resolution tile
pyramid rollup.

``bm25_top_terms`` — Okapi BM25 (rational-idf variant, no transcendental
ops so the DuckDB oracle replays the arithmetic bit-exactly): per-doc
top-K terms by score.  Same two-pass shape as ``tfidf_top_terms``:
distributed df + corpus length stats, broadcast vocabulary (vocab <<
corpus by the df floor), per-batch scoring with zero per-doc shuffles.

``semantic_dedup`` — SemDeDup-style (Abbas et al. 2023, arXiv:2303.09540)
semantic near-duplicate pruning: within each embedding cluster, a vector
is a duplicate iff some LOWER-vec_id vector of the same cluster has
cosine similarity >= TAU; the keeper is the smallest such vec_id.
Cluster = the table's ``label`` column (in a full pipeline this is the
k-means/IVF assignment, cf. functions/sim.py::ivf_topk).  Scale shape:
``groupby(label).map_groups`` — per-cluster work is O(m^2) dense numpy,
the SemDeDup design constraint (clusters are SIZE-CAPPED by the
clustering step; for uncapped corpora the LSH-banded ``embedding_near_dup``
is the scale path).  No broadcast, no driver materialization.

``tile_pyramid`` — label-point counts at every zoom level from
DEFAULT_TILE_RES up to PYRAMID_MIN_RES (the slippy-map/S2 rollup every
tile server precomputes).  ONE pass, ONE exchange: each doc emits its
(res, ancestor_tile) chain — morton parents are bit-shifts
(stages/cells.py::cell_parent) — and the map-side combine collapses the
4 rows/doc to <= 4 * n_tiles rows per block before the single
(res, tile_id) groupby.  No per-level rescan, no driver rollup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BM25_K1 = 1.2
BM25_B = 0.75
BM25_DF_MIN = 5  # vocabulary floor: term must appear in >= BM25_DF_MIN docs
BM25_K = 3  # top terms kept per document

SEMDEDUP_TAU = 0.30  # cosine threshold (data margin >= 8.6e-6 at sf<=0.1)

PYRAMID_MIN_RES = 2  # rollup DEFAULT_TILE_RES..PYRAMID_MIN_RES inclusive


def _ray():
    import ray

    return ray


# --------------------------------------------------------------------------
# BM25 top terms
# --------------------------------------------------------------------------


def q_bm25_top_terms(sf_dir: str):
    """Okapi BM25 with rational idf (N - df + 0.5)/(df + 0.5) — the
    standard formula minus the log, so every op is +,*,/ on doubles and
    the SQL oracle's IEEE arithmetic is bit-identical.  Rank semantics
    match log-idf BM25 exactly (log is monotone)."""
    import pyarrow.parquet as pq

    from ..stages.agg import grouped_aggregate
    from .queries_ext2 import tokenized_docs, toks_flat_from_batch

    ray = _ray()
    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows

    # ONE tokenization pass: both the df pass and the scoring pass stream
    # the checkpointed (doc_id, toks) parquet (queries_ext2.tokenized_docs)
    ds = tokenized_docs(sf_dir)

    def df_partials(batch: pa.Table) -> pa.Table:
        """(term, distinct-doc count) per batch, plus ONE sentinel row
        (term="", n=total tokens in batch) — "" can never be a \\S+ token,
        so the corpus word total rides the same exchange for free."""
        flat, off = toks_flat_from_batch(batch)
        did = np.repeat(
            batch.column("doc_id").to_numpy().astype(np.int64), np.diff(off)
        )
        pairs = pa.table({"doc": pa.array(did), "term": flat})
        dist = pairs.group_by(["doc", "term"]).aggregate([])
        out = dist.group_by(["term"]).aggregate([("doc", "count")])
        base = pa.table({
            "term": out.column("term"),
            "n": pc.cast(out.column("doc_count"), pa.int64()),
        })
        sent = pa.table({
            "term": pa.array([""], type=pa.string()),
            "n": pa.array([len(flat)], type=pa.int64()),
        })
        return pa.concat_tables([base, sent]).combine_chunks()

    df_tbl = grouped_aggregate(
        ds.map_batches(df_partials, batch_format="pyarrow", zero_copy_batch=True),
        ["term"],
        [("sum", "n", "df")],
    ).to_pandas()  # vocabulary + 1 sentinel row: small by the df floor
    sent = df_tbl["term"] == ""
    total_words = int(df_tbl.loc[sent, "df"].iloc[0])
    kept = df_tbl[~sent & (df_tbl["df"] >= BM25_DF_MIN)].sort_values("term")
    vocab = kept["term"].to_numpy().astype(object)
    dfs = kept["df"].to_numpy().astype(np.int64)
    avgdl = total_words / n_docs  # ints < 2^53: exact conversions, one divide
    vocab_ref = ray.put((vocab, dfs))

    class Bm25:
        def __init__(self):
            v, d = ray.get(vocab_ref)
            self._vocab = pa.array(v, type=pa.string())  # SORTED by term
            self._dfs = d

        def __call__(self, batch: pa.Table) -> pa.Table:
            flat, off = toks_flat_from_batch(batch)
            bdoc = batch.column("doc_id").to_numpy().astype(np.int64)
            dl_batch = np.diff(off).astype(np.int64)
            did = np.repeat(bdoc, dl_batch)
            pairs = pa.table({"doc_id": pa.array(did), "term": flat})
            tf_tbl = pairs.group_by(["doc_id", "term"]).aggregate([("term", "count")])
            doc = tf_tbl.column("doc_id").to_numpy().astype(np.int64)
            # vocab rank instead of the term string everywhere: the vocab is
            # sorted, so rank ASC == term ASC and the whole path stays numeric
            rank = pc.fill_null(
                pc.index_in(tf_tbl.column("term"), value_set=self._vocab), -1
            ).to_numpy().astype(np.int64)
            tf = tf_tbl.column("term_count").to_numpy().astype(np.int64)
            m = rank >= 0
            doc, rank, tf = doc[m], rank[m], tf[m]
            dfv = self._dfs[rank]
            # doc length lookup: batch doc ids are unique rows
            bord = np.argsort(bdoc)
            dl = dl_batch[bord][np.searchsorted(bdoc[bord], doc)]
            # every op below appears VERBATIM in SQL_BM25_TOP_TERMS
            idf = ((n_docs - dfv).astype(np.float64) + 0.5) / (
                dfv.astype(np.float64) + 0.5
            )
            norm = dl.astype(np.float64) / avgdl
            denom = tf.astype(np.float64) + BM25_K1 * (
                (1.0 - BM25_B) + BM25_B * norm
            )
            score = idf * ((tf.astype(np.float64) * (BM25_K1 + 1.0)) / denom)
            order = np.lexsort((rank, -score, doc))
            doc, rank, tf, dfv, dl, score = (
                doc[order], rank[order], tf[order], dfv[order], dl[order],
                score[order],
            )
            new_doc = np.r_[True, doc[1:] != doc[:-1]]
            idx = np.arange(len(doc), dtype=np.int64)
            pos = idx - np.maximum.accumulate(np.where(new_doc, idx, 0))
            k = pos < BM25_K
            return pa.table({
                "doc_id": pa.array(doc[k], type=pa.int64()),
                "term": pc.take(self._vocab, pa.array(rank[k], type=pa.int64())),
                "tf": pa.array(tf[k], type=pa.int64()),
                "df": pa.array(dfv[k], type=pa.int64()),
                "dl": pa.array(dl[k], type=pa.int64()),
                "score": pa.array(score[k], type=pa.float64()),
            })

    return ds.map_batches(
        Bm25, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
    )


SQL_BM25_TOP_TERMS = rf"""
    WITH w AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
    ),
    dl AS (
        SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM w
    ),
    stats AS (
        SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
               COUNT(*) AS n
        FROM dl
    ),
    toks AS (
        SELECT doc_id, unnest(ws) AS term FROM w
    ),
    df AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM toks GROUP BY term
        HAVING COUNT(DISTINCT doc_id) >= {BM25_DF_MIN}
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, term
    ),
    scored AS (
        SELECT t.doc_id, t.term, t.tf, f.df, d.dl,
               ((CAST(s.n - f.df AS DOUBLE) + 0.5)
                    / (CAST(f.df AS DOUBLE) + 0.5))
               * ((CAST(t.tf AS DOUBLE) * ({BM25_K1} + 1.0))
                    / (CAST(t.tf AS DOUBLE)
                       + {BM25_K1} * ((1.0 - {BM25_B})
                                      + {BM25_B} * (CAST(d.dl AS DOUBLE)
                                                    / s.avgdl))))
                   AS score
        FROM tf t
        JOIN df f USING (term)
        JOIN dl d ON t.doc_id = d.doc_id
        CROSS JOIN stats s
    )
    SELECT doc_id, term, tf, df, dl, score
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, term) AS rn
          FROM scored)
    WHERE rn <= {BM25_K}
"""


# --------------------------------------------------------------------------
# SemDeDup-style semantic dedup
# --------------------------------------------------------------------------


def q_semantic_dedup(sf_dir: str):
    ray = _ray()
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"]
    )

    def per_cluster(group: pa.Table) -> pa.Table:
        vid = group.column("vec_id").to_numpy().astype(np.int64)
        order = np.argsort(vid)
        vid = vid[order]
        emb = group.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m = len(vid)
        flat = pc.list_flatten(emb).to_numpy().astype(np.float64)
        mat = flat.reshape(m, -1)[order]
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        gram = unit @ unit.T
        # strict lower triangle: only LOWER vec_ids can be the keeper
        hits = (gram >= SEMDEDUP_TAU) & np.tri(m, k=-1, dtype=bool)
        has = hits.any(axis=1)
        first = np.argmax(hits, axis=1)  # first True == smallest vec_id
        dup_of = np.where(has, vid[first], np.int64(-1))
        lab = np.int64(group.column("label")[0].as_py())
        return pa.table({
            "vec_id": pa.array(vid, type=pa.int64()),
            "label": pa.array(np.full(m, lab), type=pa.int64()),
            "is_dup": pa.array(has.astype(np.int64), type=pa.int64()),
            "dup_of": pa.array(dup_of, type=pa.int64()),
        })

    return ds.groupby("label").map_groups(per_cluster, batch_format="pyarrow")


SQL_SEMANTIC_DEDUP = f"""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS vid, MIN(b.vec_id) AS dup_of
        FROM e a JOIN e b ON a.label = b.label AND b.vec_id < a.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= {SEMDEDUP_TAU}
        GROUP BY a.vec_id
    )
    SELECT e.vec_id AS vec_id,
           CAST(e.label AS BIGINT) AS label,
           CAST(CASE WHEN p.dup_of IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS is_dup,
           CAST(COALESCE(p.dup_of, -1) AS BIGINT) AS dup_of
    FROM e LEFT JOIN pairs p ON e.vec_id = p.vid
"""


# --------------------------------------------------------------------------
# tile pyramid rollup
# --------------------------------------------------------------------------


def q_tile_pyramid(sf_dir: str):
    from ..config import DEFAULT_CELL_RES, DEFAULT_TILE_RES
    from ..stages.agg import grouped_aggregate
    from ..stages.cells import append_cell_columns, cell_parent
    from .queries import _dyadic_labeled

    n_levels = DEFAULT_TILE_RES - PYRAMID_MIN_RES + 1

    def explode_pyramid(batch: pa.Table) -> pa.Table:
        enc = append_cell_columns(
            batch, cell_res=DEFAULT_CELL_RES, tile_res=DEFAULT_TILE_RES
        )
        tid = enc.column("tile_id").to_numpy()
        n = len(tid)
        res_col = np.repeat(
            np.arange(DEFAULT_TILE_RES, PYRAMID_MIN_RES - 1, -1, dtype=np.int64), n
        )
        tiles = np.concatenate(
            [cell_parent(tid, r)
             for r in range(DEFAULT_TILE_RES, PYRAMID_MIN_RES - 1, -1)]
        ) if n else np.empty(0, dtype=np.int64)
        if n == 0:
            res_col = np.empty(0, dtype=np.int64)
        return pa.table({
            "res": pa.array(res_col, type=pa.int64()),
            "tile_id": pa.array(tiles, type=pa.int64()),
        })

    ds = _dyadic_labeled(sf_dir).map_batches(
        explode_pyramid, batch_format="pyarrow", zero_copy_batch=True
    )
    # one exchange; map-side combine collapses each block to <= n_levels *
    # n_tiles rows first, so the 4-rows-per-doc fanout never leaves a worker
    assert n_levels >= 1
    return grouped_aggregate(
        ds, ["res", "tile_id"], [("count", None, "n_points")]
    )


def _sql_tile_pyramid() -> str:
    from ..config import DEFAULT_TILE_RES
    from ..stages.cells import sql_cell_id_expr
    from .queries import _sql_dyadic_labels_cte

    parts = []
    for res in range(DEFAULT_TILE_RES, PYRAMID_MIN_RES - 1, -1):
        tile = sql_cell_id_expr("label_x", "label_y", res)
        parts.append(
            f"SELECT CAST({res} AS BIGINT) AS res, {tile} AS tile_id, "
            f"CAST(COUNT(*) AS BIGINT) AS n_points FROM labels GROUP BY 2"
        )
    body = " UNION ALL ".join(parts)
    return f"WITH labels AS ({_sql_dyadic_labels_cte()}) {body}"


def build_queries_ext25() -> dict:
    return {
        "bm25_top_terms": q_bm25_top_terms,
        "semantic_dedup": q_semantic_dedup,
        "tile_pyramid": q_tile_pyramid,
    }


def build_oracles_ext25() -> dict:
    return {
        "bm25_top_terms": SQL_BM25_TOP_TERMS,
        "semantic_dedup": SQL_SEMANTIC_DEDUP,
        "tile_pyramid": _sql_tile_pyramid(),
    }

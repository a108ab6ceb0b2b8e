"""TF-IDF retrieval over the compressed posting index — the reference's
OWN scoring model (``internal/embedders/quotes/local/tfidf/tfidf.go``,
cosine scan ``search/search.go:16-42``) made to scale like the BM25
path (VERDICT r2 #4).

The naive sparse re-expression (:mod:`same_same_spark.operators.tfidf`)
re-tokenizes and re-aggregates the corpus on every call. Here the
posting index already stores per-(term, doc) tf and per-doc dl; the two
things it lacks are per-doc ``maxtf`` (the reference normalises tf by
the doc's max count over ALL tokens, tfidf.go:196-205 — pre-vocabulary)
and the vocab-dependent L2 norm. :func:`build_tfidf_aux` derives both
(plus ``d_sum``, powering the uniform-query closed form) in ONE
distributed pass over the shard table and persists them as a per-doc
aux parquet keyed by (stats generation, group set, vocab params) so a
mutated index auto-invalidates.

Query time then mirrors :func:`same_same_spark.index.query.search_batch`
exactly: tokenize + embed driver-side, pushed ``term IN`` posting reads,
one cogrouped pass per bucket emitting the bucket-local top-k, bounded
driver merge. Every document's exact cosine is computable inside its
own bucket (matched docs from postings × aux, zero-overlap docs at 0,
no-vocab-term docs at the closed-form fallback constants —
tfidf.go:227-233), so the union of bucket-local top-ks contains the
global top-k and results are rank- and score-identical to the naive
scorer (differential-tested).

Tombstoned indexes are rejected (stats/df here are corpus-frozen like
the reference's vocabulary): run a compaction first, which bumps the
stats generation and invalidates the aux automatically.
"""

from __future__ import annotations

import hashlib
import json
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from same_same_spark.index import codec
from same_same_spark.index.build import IndexManifest
from same_same_spark.operators.tfidf import (
    MAX_DF_RATIO_DEFAULT,
    MAX_FEATURES_DEFAULT,
    MIN_DF_DEFAULT,
    query_unit_weights,
)
from same_same_spark.text.tokenizer import tokenize_py

AUX_SCHEMA = "bucket INT, doc_id LONG, maxtf LONG, norm DOUBLE, d_sum DOUBLE"
SCORE_SCHEMA = "query_id INT, doc_id LONG, score DOUBLE"


def derive_vocab(
    spark: SparkSession,
    index_dir: str,
    min_df: int = MIN_DF_DEFAULT,
    max_df_ratio: float = MAX_DF_RATIO_DEFAULT,
    max_features: int | None = MAX_FEATURES_DEFAULT,
) -> dict[str, float]:
    """(term → idf) under the reference's pruning, straight from the
    index's tiny stats table — no corpus pass. idf = ln(N/df) + 1
    (tfidf.go:127-132); pruning keeps ``df >= min_df`` and ``df/N <=
    max_df_ratio`` ranked ``(df DESC, term ASC)`` truncated to
    ``max_features`` (the pinned form of tfidf.go:102-125)."""
    manifest = IndexManifest.load(index_dir)
    n_docs = manifest.n_docs
    if n_docs == 0:
        return {}
    stats = spark.read.parquet(
        os.path.join(index_dir, manifest.stats_dirname())
    ).select("term", "df")
    pruned = stats.filter(
        (F.col("df") >= min_df)
        & ((F.col("df") / F.lit(float(n_docs))) <= max_df_ratio)
    )
    if max_features is not None:
        pruned = pruned.orderBy(F.desc("df"), F.asc("term")).limit(
            max_features
        )
    return {
        r["term"]: math.log(float(n_docs) / r["df"]) + 1.0
        for r in pruned.collect()
    }


def _aux_fingerprint(manifest: IndexManifest, params: tuple) -> str:
    key = json.dumps(
        {
            "stats_gen": manifest.stats_gen,
            "groups": sorted(manifest.groups),
            "params": list(params),
        },
        sort_keys=True,
    )
    return hashlib.md5(key.encode()).hexdigest()[:12]


def _aux_build_fn(vocab_idf: dict[str, float]):
    """Per-bucket two-pass aux derivation. Pass 1 accumulates per-doc
    maxtf over ALL posting rows (pre-vocabulary, tfidf.go:196-205);
    pass 2 re-walks only the vocab-term rows to accumulate Σw² (norm)
    and Σw (for d_sum = Σd_hat)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        groups: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for _, row in pdf[pdf["kind"] == "d"].iterrows():
            groups[int(row["grp"])] = (
                codec.decode_doc_ids(bytes(row["doc_bytes"]), row["n"]),
                codec.varint_decode(
                    bytes(row["tf_bytes"]), row["n"]
                ).astype(np.int64),
            )
        maxtf = {g: np.zeros(len(ids), dtype=np.int64)
                 for g, (ids, _) in groups.items()}
        vocab_rows: list[tuple[float, int, np.ndarray, np.ndarray]] = []
        for _, row in pdf[pdf["kind"] == "p"].iterrows():
            pos, tf = codec.decode_posting_list(row)
            g = int(row["grp"])
            np.maximum.at(maxtf[g], pos, tf.astype(np.int64))
            idf = vocab_idf.get(row["term"])
            if idf is not None:
                vocab_rows.append((idf, g, pos, tf))
        norm2 = {g: np.zeros(len(ids)) for g, (ids, _) in groups.items()}
        wsum = {g: np.zeros(len(ids)) for g, (ids, _) in groups.items()}
        for idf, g, pos, tf in vocab_rows:
            w = tf.astype(np.float64) / maxtf[g][pos] * idf
            np.add.at(norm2[g], pos, w * w)
            np.add.at(wsum[g], pos, w)
        frames = []
        for g, (ids, _dls) in groups.items():
            norm = np.sqrt(norm2[g])
            with np.errstate(divide="ignore", invalid="ignore"):
                d_sum = np.where(norm > 0.0, wsum[g] / norm, 0.0)
            frames.append(
                pd.DataFrame(
                    {
                        "bucket": np.full(len(ids), bucket, dtype=np.int32),
                        "doc_id": ids,
                        "maxtf": maxtf[g],
                        "norm": norm,
                        "d_sum": d_sum,
                    }
                )
            )
        return (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(
                columns=["bucket", "doc_id", "maxtf", "norm", "d_sum"]
            )
        )

    return build


def ensure_tfidf_aux(
    spark: SparkSession,
    index_dir: str,
    min_df: int = MIN_DF_DEFAULT,
    max_df_ratio: float = MAX_DF_RATIO_DEFAULT,
    max_features: int | None = MAX_FEATURES_DEFAULT,
    log=print,
) -> str:
    """Build (or reuse) the per-doc TF-IDF aux table for the index's
    CURRENT (stats_gen, groups, vocab-params) fingerprint. One
    distributed pass over the shard table; crash-safe (.tmp + atomic
    rename); superseded fingerprints are swept after commit."""
    manifest = IndexManifest.load(index_dir)
    params = (min_df, max_df_ratio, max_features)
    tag = _aux_fingerprint(manifest, params)
    aux_dir = os.path.join(index_dir, f"tfidf-aux-{tag}")
    meta_path = os.path.join(aux_dir, "meta.json")
    if os.path.exists(meta_path):
        return aux_dir

    vocab_idf = derive_vocab(
        spark, index_dir, min_df=min_df, max_df_ratio=max_df_ratio,
        max_features=max_features,
    )
    shard_paths = [
        os.path.join(index_dir, "shards", f"group-{g}")
        for g in manifest.groups
    ]
    tmp = aux_dir + ".tmp"
    (
        spark.read.parquet(*shard_paths)
        .groupBy("bucket")
        .applyInPandas(_aux_build_fn(vocab_idf), AUX_SCHEMA)
        .write.mode("overwrite")
        .parquet(os.path.join(tmp, "docs"))
    )
    # the vocab is keyed by the same fingerprint as the aux docs —
    # persisting it here lets warm queries skip the per-call
    # stats-scan + collect that derive_vocab costs
    with open(os.path.join(tmp, "vocab.json"), "w") as f:
        json.dump(vocab_idf, f)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(
            {
                "stats_gen": manifest.stats_gen,
                "groups": sorted(manifest.groups),
                "params": list(params),
                "v_size": len(vocab_idf),
            },
            f,
        )
    import shutil

    shutil.rmtree(aux_dir, ignore_errors=True)
    os.replace(tmp, aux_dir)
    # sweep superseded fingerprints (stale stats_gen/groups/params)
    import glob as _glob

    for d in _glob.glob(os.path.join(index_dir, "tfidf-aux-*")):
        if os.path.basename(d) != f"tfidf-aux-{tag}":
            shutil.rmtree(d, ignore_errors=True)
    log(f"[tfidf-aux] built {aux_dir} (vocab {len(vocab_idf)})")
    return aux_dir


def _tfidf_bucket_fn(
    term_idf: dict[str, float],
    sparse_q: dict[int, tuple[dict[str, float], float]],
    uniform_qids: list[int],
    sqrt_v: float,
    k: int,
):
    """Per-bucket cogrouped scorer: shard rows × aux rows → bucket-local
    top-k per query under the pinned (round(score,9) DESC, doc_id ASC)
    order. ``sparse_q`` maps qid → (q_hat weights, fallback constant
    Σq_hat/√V); uniform queries score every doc from aux alone."""

    def topk_local(ids: np.ndarray, scores: np.ndarray) -> np.ndarray:
        if len(ids) > k:
            return np.lexsort((ids, -np.round(scores, 9)))[:k]
        return np.arange(len(ids))

    def score(shard_pdf: pd.DataFrame, aux_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int32"),
                "doc_id": pd.Series(dtype="int64"),
                "score": pd.Series(dtype="float64"),
            }
        )
        if aux_pdf.empty:
            return empty
        aux_ids = aux_pdf["doc_id"].to_numpy(np.int64)
        order = np.argsort(aux_ids, kind="stable")
        aux_ids = aux_ids[order]
        aux_maxtf = aux_pdf["maxtf"].to_numpy(np.int64)[order]
        aux_norm = aux_pdf["norm"].to_numpy(np.float64)[order]
        aux_dsum = aux_pdf["d_sum"].to_numpy(np.float64)[order]
        sparse_mask = aux_norm > 0.0
        sparse_ids = aux_ids[sparse_mask]
        fb_ids = aux_ids[~sparse_mask]  # uniform-fallback docs, id-sorted

        # decode the bucket's posting rows for the query terms once;
        # positions resolve through each row's own group doc array
        groups: dict[int, np.ndarray] = {}
        for _, row in shard_pdf[shard_pdf["kind"] == "d"].iterrows():
            groups[int(row["grp"])] = codec.decode_doc_ids(
                bytes(row["doc_bytes"]), row["n"]
            )
        by_term: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
        for _, row in shard_pdf[shard_pdf["kind"] == "p"].iterrows():
            pos, tf = codec.decode_posting_list(row)
            ids_g = groups[int(row["grp"])]
            by_term.setdefault(row["term"], []).append((ids_g[pos], tf))

        def d_hat_for(term: str) -> tuple[np.ndarray, np.ndarray]:
            """(doc_ids, d_hat) for one vocab term in this bucket —
            the naive scorer's exact per-term weight formula."""
            parts_d, parts_w = [], []
            for d, tf in by_term.get(term, ()):  # may be absent here
                j = np.searchsorted(aux_ids, d)
                w = (
                    tf.astype(np.float64) / aux_maxtf[j] * term_idf[term]
                ) / aux_norm[j]
                parts_d.append(d)
                parts_w.append(w)
            if not parts_d:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            return np.concatenate(parts_d), np.concatenate(parts_w)

        frames = []

        def emit(qid: int, ids: np.ndarray, scores: np.ndarray) -> None:
            sel = topk_local(ids, scores)
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(len(sel), qid, dtype=np.int32),
                        "doc_id": ids[sel],
                        "score": scores[sel],
                    }
                )
            )

        dhat_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for qid, (qhat, fconst) in sparse_q.items():
            id_parts, w_parts = [], []
            for term, qw in qhat.items():
                if term not in dhat_cache:
                    dhat_cache[term] = d_hat_for(term)
                d, dh = dhat_cache[term]
                if len(d):
                    id_parts.append(d)
                    w_parts.append(qw * dh)
            if id_parts:
                ids = np.concatenate(id_parts)
                ws = np.concatenate(w_parts)
                uids, inv = np.unique(ids, return_inverse=True)
                scores = np.bincount(inv, weights=ws)
            else:
                uids = np.empty(0, np.int64)
                scores = np.empty(0, np.float64)
            # zero-overlap sparse docs score exactly 0 (the reference
            # scores its ENTIRE store): the k smallest unmatched ids
            # suffice for any bucket-local top-k
            if len(uids):
                j = np.searchsorted(uids, sparse_ids)
                j[j >= len(uids)] = len(uids) - 1
                unmatched = sparse_ids[uids[j] != sparse_ids]
            else:
                unmatched = sparse_ids
            zeros = unmatched[:k]
            # uniform-fallback docs score the closed-form constant
            fbk = fb_ids[:k]
            all_ids = np.concatenate([uids, zeros, fbk])
            all_scores = np.concatenate(
                [
                    scores,
                    np.zeros(len(zeros)),
                    np.full(len(fbk), fconst, dtype=np.float64),
                ]
            )
            emit(qid, all_ids, all_scores)

        for qid in uniform_qids:
            # uniform query × sparse doc = d_sum/√V; × uniform doc = 1.0
            u_scores = aux_dsum[sparse_mask] / sqrt_v
            all_ids = np.concatenate([sparse_ids, fb_ids[:k]])
            all_scores = np.concatenate(
                [u_scores, np.ones(len(fb_ids[:k]))]
            )
            emit(qid, all_ids, all_scores)

        return pd.concat(frames, ignore_index=True) if frames else empty

    return score


def tfidf_search_batch(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    min_df: int = MIN_DF_DEFAULT,
    max_df_ratio: float = MAX_DF_RATIO_DEFAULT,
    max_features: int | None = MAX_FEATURES_DEFAULT,
    log=print,
    merge: str = "auto",
) -> DataFrame:
    """TF-IDF + cosine top-k through the index — rank- and
    score-identical to :func:`same_same_spark.operators.tfidf.tfidf_topk`
    (differential-tested) without re-tokenizing the corpus.

    Returns (query_id INT, doc_id LONG, score DOUBLE, rank INT).
    ``merge`` routes the final bucket-top-k merge exactly like
    :func:`same_same_spark.index.query.search_batch`: bounded driver
    broker merge while small, the distributed ``topk_per_query``
    tournament when k × buckets × queries would grow
    driver-proportional."""
    manifest = IndexManifest.load(index_dir)
    if manifest.has_tombstones:
        raise ValueError(
            "tfidf_search_batch requires a compacted index (corpus-frozen "
            "stats, like the reference's vocabulary): run "
            "rewrite_touched_groups/rewrite_compacted first — compaction "
            "bumps the stats generation and the aux table follows."
        )
    empty = spark.createDataFrame([], SCORE_SCHEMA + ", rank INT")
    if not queries or manifest.n_docs == 0:
        return empty

    aux_dir = ensure_tfidf_aux(
        spark, index_dir, min_df=min_df, max_df_ratio=max_df_ratio,
        max_features=max_features, log=log,
    )
    vocab_path = os.path.join(aux_dir, "vocab.json")
    if os.path.exists(vocab_path):
        with open(vocab_path) as f:
            vocab_idf = json.load(f)
    else:  # aux dir written before vocab persistence — derive once
        vocab_idf = derive_vocab(
            spark, index_dir, min_df=min_df, max_df_ratio=max_df_ratio,
            max_features=max_features,
        )
    v_size = len(vocab_idf)
    aux = spark.read.parquet(os.path.join(aux_dir, "docs"))

    if v_size == 0:
        # degenerate corpus: zero-length embeddings, cosine 0 everywhere
        # (vector.go:49-51) — k smallest doc ids per query at score 0
        low = [
            int(r["doc_id"])
            for r in aux.select("doc_id").orderBy("doc_id").limit(k).collect()
        ]
        rows = [
            (qid, did, 0.0, rank)
            for qid, _ in queries
            for rank, did in enumerate(low, start=1)
        ]
        return spark.createDataFrame(rows, SCORE_SCHEMA + ", rank INT")

    sqrt_v = math.sqrt(float(v_size))
    sparse_q: dict[int, tuple[dict[str, float], float]] = {}
    uniform_qids: list[int] = []
    for qid, text in queries:
        qhat = query_unit_weights(text, vocab_idf)
        if not qhat:
            uniform_qids.append(qid)
        else:
            sparse_q[qid] = (qhat, sum(qhat.values()) / sqrt_v)

    term_qids: dict[str, list[int]] = {}
    for qid, (qhat, _) in sparse_q.items():
        for term in qhat:
            term_qids.setdefault(term, []).append(qid)
    term_idf = {t: vocab_idf[t] for t in term_qids}

    shard_paths = [
        os.path.join(index_dir, "shards", f"group-{g}")
        for g in manifest.groups
    ]
    # one shard read: doclens for position resolution + the query
    # terms' posting rows; kind/term predicates push into parquet
    shard = (
        spark.read.parquet(*shard_paths)
        .filter(
            (F.col("kind") == "d")
            | (
                (F.col("kind") == "p")
                & F.col("term").isin(list(term_qids))
            )
        )
        .select(
            "bucket", "grp", "kind", "term", "n", "doc_bytes", "tf_bytes",
            "block_off_doc", "block_off_tf", "block_last_doc",
        )
    )
    fn = _tfidf_bucket_fn(term_idf, sparse_q, uniform_qids, sqrt_v, k)
    scored = (
        shard.groupby("bucket")
        .cogroup(aux.groupby("bucket"))
        .applyInPandas(fn, SCORE_SCHEMA)
    )
    # bounded driver merge while small, distributed tournament when
    # k × buckets × queries would grow driver-proportional — the same
    # shared routing as search_batch
    from same_same_spark.index.query import _merge_bucket_topks

    return _merge_bucket_topks(
        spark, scored, k,
        n_candidates=manifest.num_buckets * len(queries) * k,
        merge=merge,
    )

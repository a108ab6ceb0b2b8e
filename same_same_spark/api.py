"""``SameSameSpark`` — the engine's public façade, mirroring the
reference's ``Storage`` interface semantics
(``internal/storage/storage.go:9-18``: Store/Get/List/Delete/Count/
Search/AdvancedSearch/TemporalSearch) over immutable DataFrames.

Mutations are functional (they return a new façade over the updated
frame) — the Spark-correct reading of the reference's mutex-guarded
in-place map (``memory/memory.go:25-49``). Retrieval is BM25 (the
frozen-corpus re-expression of the TF-IDF+cosine scan; see
``same_same_spark.bm25``) with the reference's filter algebra, temporal
decay, and hybrid weighting applied as column operations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import score_queries
from same_same_spark.operators.filters import compile_filters, matches_metadata
from same_same_spark.operators.hybrid import (
    HybridWeight,
    advanced_search,
    rank_topk,
)
from same_same_spark.operators.temporal import (
    DECAY_LAMBDAS,
    apply_decay_col,
    decay_factor_col,
    resolve_doc_time,
)

DEFAULT_TOP_K = 10  # models/search.go:29-31
SEARCH_BY_TEXT_DEFAULT_K = 5  # handlers/vector.go:224-226


class SameSameSpark:
    """Document store + retrieval engine over a docs DataFrame.

    Expected columns: ``id`` (string-able), ``text``, optional
    ``metadata MAP<STRING,STRING>``, optional ``created_at`` /
    ``updated_at`` timestamps.
    """

    def __init__(
        self,
        docs: DataFrame,
        id_col: str = "id",
        text_col: str = "text",
        index_dir: str | None = None,
    ):
        """``index_dir`` (optional): a built
        :mod:`same_same_spark.index` for this corpus. When set,
        unfiltered retrieval routes through the compressed-index path
        (pushed-down posting reads + bucket-local top-k) instead of
        re-scoring the corpus; filtered searches keep the naive path
        because the reference computes corpus stats over the *filtered*
        corpus (filter-then-score), which an unfiltered index cannot
        reproduce."""
        self.docs = docs
        self.id_col = id_col
        self.text_col = text_col
        self.index_dir = index_dir

    # ---- CRUD-ish -----------------------------------------------------

    def count(self) -> int:
        """A3 — corpus size (``memory/memory.go:93-98``)."""
        return self.docs.count()

    def get(self, doc_id) -> DataFrame:
        """Key lookup (``memory/memory.go:51-67``) — a pushed-down
        point filter, the broadcast-hash-join equivalent."""
        return self.docs.filter(F.col(self.id_col) == F.lit(doc_id))

    def list(self) -> DataFrame:
        """F8 — metadata-only listing: id, text length, metadata."""
        cols = [F.col(self.id_col), F.length(self.text_col).alias("text_length")]
        if "metadata" in self.docs.columns:
            cols.append(F.col("metadata"))
        return self.docs.select(*cols)

    def store(self, new_docs: DataFrame) -> "SameSameSpark":
        """K1 upsert semantics: incoming ids replace existing rows.

        The attached index (if any) is detached: it predates the new
        rows and replaced ids would serve stale postings. Use
        :meth:`upsert` to keep the index attached (tombstone + staged
        delta + compaction), or re-attach after a rebuild.
        """
        self._reject_intra_batch_dup_ids(new_docs)
        merged = self._merge_frames(new_docs)
        return SameSameSpark(merged, self.id_col, self.text_col)

    def _reject_intra_batch_dup_ids(self, new_docs: DataFrame) -> None:
        """PUT semantics are per-id (``handlers/vector.go:110-146``) —
        a batch carrying the same id twice has no reference-defined
        winner, and staging both would double the doc in N/avgdl and
        serve it twice. Raise rather than pick one nondeterministically
        (DataFrames are unordered, so "keep last" isn't well-defined).
        One bounded aggregation over the PUT-sized batch."""
        dups = (
            new_docs.groupBy(self.id_col)
            .count()
            .filter(F.col("count") > 1)
            .select(self.id_col)
            .limit(5)
            .collect()
        )
        if dups:
            raise ValueError(
                "store/upsert batch contains duplicate ids "
                f"(e.g. {[r[0] for r in dups]}); PUT semantics are "
                "per-id — deduplicate the batch first"
            )

    def _merge_frames(self, new_docs: DataFrame) -> DataFrame:
        return self.docs.join(
            new_docs.select(self.id_col), self.id_col, "left_anti"
        ).unionByName(new_docs, allowMissingColumns=True)

    @staticmethod
    def _canonical_int_ids(raw_ids) -> "list[int] | None":
        """The exact-integer index identities of ``raw_ids``, or None
        if any id lacks one (floats, bools, non-numeric or non-canonical
        strings — tombstoning a truncated id would hit the wrong doc).
        The single identity rule shared by :meth:`delete_many` and
        :meth:`upsert`."""
        out: list[int] = []
        for d in raw_ids:
            if isinstance(d, bool) or not isinstance(d, (int, str)):
                return None
            try:
                iv = int(d)
            except ValueError:
                return None
            if str(iv) != str(d).strip():
                return None
            out.append(iv)
        return out

    def upsert(self, new_docs: DataFrame) -> "SameSameSpark":
        """PUT /vectors/{id} parity THROUGH the index
        (``handlers/vector.go:110-146``): incoming ids replace existing
        rows in the frame AND the attached index stays attached —
        post-upsert index search is rank- and score-identical to a
        fresh build over the updated corpus (tested).

        Composition over the append-only layout:

        1. fold any PENDING streamed deltas first (an unfolded batch
           carrying an upserted id would later double the doc),
        2. tombstone the overwritten ids (one distributed measure pass),
        3. incremental compaction (physically removes the old postings
           — necessary because the query-time tombstone mask applies to
           every group, so it would hide the re-ingested ids too),
        4. stage the new docs as a delta batch (the streamed-ingest
           shape, content-token and all) and fold it.

        Ids without an exact integer index identity fall back to
        :meth:`store` (index detached), same rule as
        :meth:`delete_many`. Cost: two bounded compactions + one
        measure pass — PUT-request-sized batches, not corpus scans.
        """
        if not self.index_dir:
            return self.store(new_docs)
        ids = self._canonical_int_ids(
            r[0] for r in new_docs.select(self.id_col).collect()
        )
        if ids is None:
            return self.store(new_docs)
        if len(set(ids)) != len(ids):
            # under CANONICAL identity (" 12 " and "12" are the same
            # doc) — raw-form duplicates collide here too
            seen: set[int] = set()
            dup = [i for i in ids if i in seen or seen.add(i)][:5]
            raise ValueError(
                f"upsert batch contains duplicate ids (e.g. {dup}); "
                "PUT semantics are per-id — deduplicate the batch first"
            )
        if not ids:
            # nothing to overwrite — and staging an empty batch would
            # commit a permanent zero-doc shard group to the index
            return self

        from same_same_spark.index.build import IndexManifest, compact_deltas
        from same_same_spark.index.mutate import (
            delete_docs,
            rewrite_touched_groups,
        )
        from same_same_spark.streaming.ingest import stage_delta_batch

        spark = self.docs.sparkSession
        quiet = lambda *_: None  # noqa: E731
        compact_deltas(spark, self.index_dir, log=quiet)
        delete_docs(spark, self.index_dir, ids, log=quiet)
        rewrite_touched_groups(spark, self.index_dir, log=quiet)
        manifest = IndexManifest.load(self.index_dir)
        stage_delta_batch(
            new_docs, self.index_dir, id_col=self.id_col,
            text_col=self.text_col, num_buckets=manifest.num_buckets,
        )
        compact_deltas(spark, self.index_dir, log=quiet)
        # Merge the FRAME under the same canonical identities the index
        # used (the staged batch casts ids to long): a padded string id
        # (" 12 ") must replace the stored "12" row, not coexist with
        # it, or count()/naive search and index search diverge. The
        # replacement rows also carry the canonical id form so a fresh
        # build over the merged frame indexes each doc exactly once.
        canon = [str(iv) for iv in ids]
        incoming = new_docs
        if dict(new_docs.dtypes).get(self.id_col) == "string":
            incoming = new_docs.withColumn(
                self.id_col,
                F.col(self.id_col).cast("long").cast("string"),
            )
        merged = self.docs.filter(
            ~F.col(self.id_col).cast("string").isin(canon)
        ).unionByName(incoming, allowMissingColumns=True)
        return SameSameSpark(
            merged, self.id_col, self.text_col, index_dir=self.index_dir,
        )

    def delete(self, doc_id) -> "SameSameSpark":
        """DELETE /vectors/{id} parity — single-id convenience form of
        :meth:`delete_many`. For request streams, batch ids and call
        ``delete_many`` once: each call pays one distributed measure
        pass over the index."""
        return self.delete_many([doc_id])

    def delete_many(self, doc_ids: list) -> "SameSameSpark":
        """Remove docs from the frame AND tombstone the attached index
        in ONE distributed measure pass (post-delete index search is
        rank- and score-identical to a fresh build without the docs).

        The FRAME mutation is functional (a new façade is returned);
        the INDEX mutation is shared state, exactly like the
        reference's in-place store (``vector.go:110-166``): every
        façade attached to the same ``index_dir`` sees the delete. Ids
        without an exact integer index identity (floats, bools,
        non-numeric strings) detach the index instead — tombstoning a
        truncated id would delete the wrong document. Whitespace-padded
        numeric strings (" 12 ") canonicalize to their integer form for
        BOTH the index tombstone and the frame filter, so the two views
        always drop the same documents.
        """
        index_dir = self.index_dir
        # default frame-filter identities: stringified raw ids — the
        # reference keys its store by string id (vector.go), and this
        # sidesteps lit-type mismatches for ids that cannot occur in
        # the column anyway
        filter_ids = [str(d) for d in doc_ids]
        if index_dir:
            ids = self._canonical_int_ids(doc_ids)
            if ids is None:
                index_dir = None  # conservative: fall back to naive
            else:
                from same_same_spark.index.mutate import delete_docs

                delete_docs(
                    self.docs.sparkSession, index_dir, ids,
                    log=lambda *_: None,
                )
                # the index was tombstoned under the CANONICAL forms;
                # filter the frame under the same identities or a
                # padded string would vanish from index search while
                # surviving count()/naive search
                filter_ids = [str(iv) for iv in ids]
        return SameSameSpark(
            self.docs.filter(
                ~F.col(self.id_col).cast("string").isin(filter_ids)
            ),
            self.id_col,
            self.text_col,
            index_dir=index_dir,
        )

    # ---- retrieval ----------------------------------------------------

    def _index_topk(self, text: str, k: int) -> DataFrame:
        """BM25 top-k via the compressed index (production read path)."""
        from same_same_spark.index.query import search_batch

        return (
            search_batch(
                self.docs.sparkSession, self.index_dir, [(0, text)], k=k
            )
            .drop("query_id")
            .withColumnRenamed("doc_id", self.id_col)
        )

    def _index_topk_filtered(self, text: str, k: int, pred) -> DataFrame:
        """Filtered retrieval THROUGH the index under GLOBAL corpus
        stats (the opt-in ``global_stats=True`` mode): fetch the
        index's top-f BM25 candidates (f starts at k), post-filter
        with the compiled Catalyst predicate, and widen f until k
        survivors remain or every matched doc has been fetched. The
        widening is selectivity-adaptive: f jumps to ~2k over the
        observed survivor rate (with a x4 floor), so selective
        filters settle in a couple of probes instead of climbing a
        geometric ladder.

        Returns the top-k survivors as (id, score) — NO rank column
        (callers blend/re-rank). Termination is guaranteed: the index
        returns at most the set of docs matching ≥1 query term, so a
        fetch that comes back short of f has exhausted that set.

        Scale notes: each iteration is one index probe (pushed posting
        reads, bounded driver merge) plus one broadcast join of the
        ≤f-row candidate set against the docs scan — the predicate and
        the id semi-join both push into the parquet read, so the scan
        prunes instead of re-scoring the corpus like the naive
        filter-then-score path. Stats divergence vs the reference
        default is documented on the callers: here scores use the
        UNFILTERED corpus's N/avgdl/df.
        """
        from same_same_spark.index.query import _load_manifest, search_batch

        spark = self.docs.sparkSession
        n_docs = max(int(_load_manifest(self.index_dir).n_docs), 1)
        fetch = max(k, 1)
        while True:
            fetch = min(fetch, n_docs)
            cand = (
                search_batch(spark, self.index_dir, [(0, text)], k=fetch)
                .drop("query_id", "rank")
                .withColumnRenamed("doc_id", self.id_col)
            )
            # search_batch materializes its bounded merge driver-side,
            # so this count is local, not a Spark job
            n_cand = cand.count()
            survivors = (
                cand.join(self.docs, self.id_col)
                .filter(pred)
                .select(F.col(self.id_col), "score")
            )
            if fetch >= n_docs or n_cand < fetch:
                return rank_topk(survivors, k, id_col=self.id_col).drop(
                    "rank"
                )
            got = survivors.count()
            if got >= k:
                return rank_topk(survivors, k, id_col=self.id_col).drop(
                    "rank"
                )
            # selectivity-adaptive widening: estimate the survivor
            # rate from the candidates already seen (Laplace-smoothed
            # so a zero-survivor sample neither stalls nor explodes)
            # and jump near the fetch size expected to yield k
            # survivors, with 2x headroom; the x4 step stays as a
            # floor so the probe count is logarithmic even when the
            # estimate is wrong (a selective filter now typically
            # costs 2-3 probes total instead of a full x4 ladder)
            p_hat = (got + 1) / (n_cand + 2)
            fetch = max(4 * fetch, int(2 * k / p_hat) + 1)

    def search_by_text(
        self,
        text: str,
        k: int = SEARCH_BY_TEXT_DEFAULT_K,
        metadata_eq: dict[str, str] | None = None,
        scorer: str = "bm25",
        global_stats: bool = False,
    ) -> DataFrame:
        """The flagship read path (SURVEY §3.1): top-k with the legacy F1
        exact-equality metadata pre-filter.

        ``scorer`` mirrors the reference's embedder selection
        (``server.go:73-91``): ``"bm25"`` (default — the north-rule
        scoring model; unfiltered calls ride the index when attached),
        ``"tfidf"`` (the reference's own TF-IDF embed + cosine,
        frozen-corpus form), or ``"clip"`` (SimpleCLIP hash embedding).
        Unknown names fall back to bm25, like the reference's factory
        falls back to its local embedder.

        ``global_stats=True`` (opt-in) lets a FILTERED bm25 search ride
        the index: top-k with over-fetch + post-filter, scores computed
        under the unfiltered corpus's N/avgdl/df. The default keeps the
        reference's filter-THEN-score semantics
        (``advanced_search.go:25-59``: corpus stats are filtered-corpus
        stats), which an unfiltered index cannot reproduce — that path
        re-scores the filtered corpus naively.
        """
        k = k if k > 0 else SEARCH_BY_TEXT_DEFAULT_K
        if (
            scorer == "bm25"
            and metadata_eq
            and global_stats
            and self.index_dir
        ):
            out = self._index_topk_filtered(
                text, k, matches_metadata(metadata_eq)
            )
            return rank_topk(out, k, id_col=self.id_col)
        base = self.docs
        if metadata_eq:
            base = base.filter(matches_metadata(metadata_eq))
        if scorer == "tfidf":
            if self.index_dir and not metadata_eq:
                from same_same_spark.index.build import IndexManifest
                from same_same_spark.index.tfidf import tfidf_search_batch

                if not IndexManifest.load(self.index_dir).has_tombstones:
                    # unfiltered tfidf rides the index too (rank- and
                    # score-identical to the naive sparse path); a
                    # tombstoned index falls through to naive until the
                    # next compaction re-freezes the stats
                    return (
                        tfidf_search_batch(
                            self.docs.sparkSession, self.index_dir,
                            [(0, text)], k=k, log=lambda *_: None,
                        )
                        .drop("query_id")
                        .withColumnRenamed("doc_id", self.id_col)
                    )
            from same_same_spark.operators.tfidf import tfidf_topk

            return (
                tfidf_topk(
                    base, [(0, text)], k=k, id_col=self.id_col,
                    text_col=self.text_col,
                )
                .drop("query_id")
                .withColumnRenamed("doc_id", self.id_col)
            )
        if scorer == "clip":
            from same_same_spark.pipeline.clip import clip_text_topk

            return clip_text_topk(
                base, text, k=k, id_col=self.id_col, text_col=self.text_col
            ).withColumnRenamed("doc_id", self.id_col)
        if self.index_dir and not metadata_eq:
            return self._index_topk(text, k)
        return (
            score_queries(
                base, [(0, text)], k=k, id_col=self.id_col,
                text_col=self.text_col,
            )
            .drop("query_id")
            .withColumnRenamed("doc_id", self.id_col)
        )

    def search_by_text_batch(
        self, texts: list[str], k: int = SEARCH_BY_TEXT_DEFAULT_K
    ) -> DataFrame:
        """Batch form of :meth:`search_by_text` — one job for N queries
        (the broker shape a service would actually run). Returns
        (query_id, id, score, rank); query_id = position in ``texts``.
        Rides the index when attached, else the naive scorer."""
        k = k if k > 0 else SEARCH_BY_TEXT_DEFAULT_K
        queries = list(enumerate(texts))
        if self.index_dir:
            from same_same_spark.index.query import search_batch

            out = search_batch(
                self.docs.sparkSession, self.index_dir, queries, k=k
            )
        else:
            out = score_queries(
                self.docs, queries, k=k, id_col=self.id_col,
                text_col=self.text_col,
            )
        return out.withColumnRenamed("doc_id", self.id_col)

    def query(
        self,
        q,
        k: int = DEFAULT_TOP_K,
        mode: str = "terms",
        **kw,
    ) -> DataFrame:
        """Unified fulltext query dispatcher over the extended query
        surface (the Lucene-ish query-type family; each mode's pinned
        semantics live in its operator module):

        - ``"terms"``  — bag-of-words BM25 (:meth:`search_by_text`);
          ``q`` = text. Rides the index when attached.
        - ``"phrase"`` — consecutive in-order match
          (:mod:`~same_same_spark.operators.phrase`); ``q`` = text.
        - ``"bool"``   — must/should/must_not clauses
          (:mod:`~same_same_spark.operators.boolquery`); ``q`` = dict
          with any of those keys as strings.
        - ``"wildcard"`` — ``[a-z*?]`` patterns
          (:mod:`~same_same_spark.operators.wildcard`); ``q`` =
          pattern string. Rides the index term dictionary when
          attached; ``max_expansions=`` caps the rewrite.
        - ``"fuzzy"``  — edit-distance rewrite
          (:mod:`~same_same_spark.operators.fuzzy`); ``q`` = text;
          ``max_edits=`` / ``max_expansions=``.
        - ``"proximity"`` — all terms within a ``len+slop`` window
          (:mod:`~same_same_spark.operators.proximity`); ``q`` = text;
          ``slop=``.
        - ``"boosted"`` — Lucene ``term^boost`` weighting
          (:mod:`~same_same_spark.operators.boost`); ``q`` = query
          string with optional ``^<float>`` suffixes.
        - ``"synonym"`` — engine-side synonym expansion
          (:mod:`~same_same_spark.operators.synonyms`); ``q`` = text;
          ``synonyms=`` the group list.
        - ``"regexp"`` — one whole-term regex from the
          cross-engine-safe subset
          (:mod:`~same_same_spark.operators.wildcard`); ``q`` = the
          pattern. Rides the index term dictionary when attached;
          ``max_expansions=`` caps the rewrite.
        - ``"rescore"`` — BM25 window re-ranked by the exact phrase
          (:mod:`~same_same_spark.operators.rescore`); ``q`` = text;
          ``window_size=`` / ``query_weight=`` / ``rescore_weight=``.
        - ``"span_near"`` — ordered span with gaps
          (:mod:`~same_same_spark.operators.spannear`); ``q`` = text;
          ``slop=``.
        - ``"span_first"`` — any term within the first N positions
          (:mod:`~same_same_spark.operators.spannear`); ``q`` = text;
          ``end=`` the position boundary.
        - ``"dis_max"`` — best-clause combine
          (:mod:`~same_same_spark.operators.dismax`); ``q`` = list of
          clause strings; ``tie_breaker=``.
        - ``"multi_match"`` — one string over several fields, each
          with its own statistics
          (:mod:`~same_same_spark.operators.multimatch`); ``q`` =
          text; ``fields=`` {column: boost}; ``match_mode=``
          best_fields (default) or most_fields; ``tie_breaker=``.
        - ``"terms_set"`` — per-doc minimum_should_match
          (:mod:`~same_same_spark.operators.boolquery`); ``q`` = text;
          ``msm_col=`` the requirement column.
        - ``"phrase_prefix"`` — search-as-you-type
          (:mod:`~same_same_spark.operators.phrase`); ``q`` = text
          whose last chunk is the prefix; ``max_expansions=``.
        - ``"boosting"`` — positive query with negative-match
          demotion (:mod:`~same_same_spark.operators.boost`); ``q`` =
          ``(positive, negative)`` strings or a dict with those keys;
          ``negative_boost=``.
        - ``"query_string"`` — the Lucene-style boolean language
          (:mod:`~same_same_spark.operators.querystring`); ``q`` =
          the query string (``AND/OR/NOT``, parens, quotes,
          ``-prohibited``, ``field:value``).
        - ``"has_child"`` / ``"has_parent"`` — parent/child joins
          over the chunk relation
          (:mod:`~same_same_spark.operators.joinfield`); ``q`` =
          text; ``score_mode=`` / ``min_children=`` (has_child),
          chunk geometry via ``size=`` / ``overlap=``.

        Extra ``kw`` pass through to the operator. Returns
        (id, score, rank) plus the mode's extra columns
        (``n_matches`` / ``n_windows``).
        """
        k = k if k > 0 else DEFAULT_TOP_K
        if mode == "terms":
            return self.search_by_text(q, k=k, **kw)
        if mode == "phrase":
            from same_same_spark.operators.phrase import phrase_search

            out = phrase_search(
                self.docs, [(0, q)], k=k, id_col=self.id_col,
                text_col=self.text_col, **kw,
            )
        elif mode == "bool":
            from same_same_spark.operators.boolquery import boolean_search

            out = boolean_search(
                self.docs,
                [(
                    0,
                    q.get("must", ""),
                    q.get("should", ""),
                    q.get("must_not", ""),
                )],
                k=k, id_col=self.id_col, text_col=self.text_col, **kw,
            )
        elif mode == "wildcard":
            from same_same_spark.operators.wildcard import (
                wildcard_search,
                wildcard_search_indexed,
            )

            if self.index_dir:
                out = wildcard_search_indexed(
                    self.docs.sparkSession, self.index_dir, [(0, q)],
                    k=k, **kw,
                )
            else:
                out = wildcard_search(
                    self.docs, [(0, q)], k=k, id_col=self.id_col,
                    text_col=self.text_col, **kw,
                )
        elif mode == "regexp":
            from same_same_spark.operators.wildcard import (
                regexp_search,
                regexp_search_indexed,
            )

            if self.index_dir:
                out = regexp_search_indexed(
                    self.docs.sparkSession, self.index_dir, [(0, q)],
                    k=k, **kw,
                )
            else:
                out = regexp_search(
                    self.docs, [(0, q)], k=k, id_col=self.id_col,
                    text_col=self.text_col, **kw,
                )
        elif mode == "fuzzy":
            from same_same_spark.operators.fuzzy import fuzzy_search

            out = fuzzy_search(
                self.docs, [(0, q)], k=k, id_col=self.id_col,
                text_col=self.text_col, **kw,
            )
        elif mode == "proximity":
            from same_same_spark.operators.proximity import proximity_search

            out = proximity_search(
                self.docs, [(0, q)], k=k, id_col=self.id_col,
                text_col=self.text_col, **kw,
            )
        elif mode == "span_near":
            from same_same_spark.operators.spannear import span_near_search

            out = span_near_search(
                self.docs, [(0, q)], k=k, id_col=self.id_col,
                text_col=self.text_col, **kw,
            )
        elif mode == "rescore":
            from same_same_spark.operators.rescore import rescore_topk

            out = rescore_topk(
                self.docs, [(0, q)], k=k, id_col=self.id_col,
                text_col=self.text_col, **kw,
            )
        elif mode == "boosted":
            from same_same_spark.operators.boost import boosted_search

            out = boosted_search(
                self.docs, [(0, q)], k=k, id_col=self.id_col,
                text_col=self.text_col, **kw,
            )
        elif mode == "synonym":
            from same_same_spark.operators.synonyms import synonym_search

            out = synonym_search(
                self.docs, [(0, q)], kw.pop("synonyms"), k=k,
                id_col=self.id_col, text_col=self.text_col, **kw,
            )
        elif mode == "span_first":
            from same_same_spark.operators.spannear import span_first_search

            out = span_first_search(
                self.docs, [(0, q)], kw.pop("end"), k=k,
                id_col=self.id_col, text_col=self.text_col, **kw,
            )
        elif mode == "dis_max":
            from same_same_spark.operators.dismax import dismax_search

            out = dismax_search(
                self.docs, [(0, list(q))], k=k, id_col=self.id_col,
                text_col=self.text_col, **kw,
            )
        elif mode == "multi_match":
            from same_same_spark.operators.multimatch import (
                multi_match_search,
            )

            out = multi_match_search(
                self.docs, [(0, q)], kw.pop("fields"),
                mode=kw.pop("match_mode", "best_fields"), k=k,
                id_col=self.id_col, **kw,
            )
        elif mode == "terms_set":
            from same_same_spark.operators.boolquery import terms_set_search

            out = terms_set_search(
                self.docs, [(0, q)], kw.pop("msm_col"), k=k,
                id_col=self.id_col, text_col=self.text_col, **kw,
            )
        elif mode == "phrase_prefix":
            from same_same_spark.operators.phrase import (
                match_phrase_prefix_search,
            )

            out = match_phrase_prefix_search(
                self.docs, [(0, q)], k=k, id_col=self.id_col,
                text_col=self.text_col, **kw,
            )
        elif mode == "query_string":
            from same_same_spark.operators.querystring import (
                query_string_search,
            )

            out = query_string_search(
                self.docs, [(0, q)], k=k, id_col=self.id_col,
                text_col=self.text_col, **kw,
            )
        elif mode == "boosting":
            from same_same_spark.operators.boost import boosting_search

            if isinstance(q, dict):
                pos, neg = q.get("positive", ""), q.get("negative", "")
            elif isinstance(q, (tuple, list)) and len(q) == 2:
                pos, neg = q
            else:
                raise ValueError(
                    "mode='boosting' needs q = (positive, negative) "
                    "strings or a dict with those keys, got "
                    f"{type(q).__name__}"
                )
            out = boosting_search(
                self.docs, [(0, pos, neg)], k=k, id_col=self.id_col,
                text_col=self.text_col, **kw,
            )
        elif mode == "has_child":
            from same_same_spark.operators.joinfield import has_child_topk

            out = has_child_topk(
                self.docs, [(0, q)], k=k, id_col=self.id_col,
                text_col=self.text_col, **kw,
            )
        elif mode == "has_parent":
            from same_same_spark.operators.joinfield import has_parent_topk

            out = has_parent_topk(
                self.docs, [(0, q)], k=k, id_col=self.id_col,
                text_col=self.text_col, **kw,
            )
        else:
            raise ValueError(
                f"unknown query mode {mode!r} (expected terms/phrase/"
                "bool/wildcard/regexp/fuzzy/proximity/boosted/boosting/"
                "query_string/synonym/rescore/span_near/span_first/"
                "dis_max/multi_match/terms_set/phrase_prefix/"
                "has_child/has_parent)"
            )
        return out.drop("query_id").withColumnRenamed("doc_id", self.id_col)

    def facets(
        self,
        text: str,
        facet_cols: list[str],
        topn: int = 5,
    ) -> DataFrame:
        """Terms aggregations over the query's FULL match set
        (:mod:`~same_same_spark.operators.facets`): (facet, value,
        doc_count, rank) per facet column, NULLs excluded."""
        from same_same_spark.operators.facets import search_facets

        return search_facets(
            self.docs, [(0, text)], facet_cols, topn=topn,
            id_col=self.id_col, text_col=self.text_col,
        ).drop("query_id")

    def stats(
        self, text: str, value_col: str, extended: bool = False
    ) -> DataFrame:
        """Metric aggregation over the query's FULL match set
        (:mod:`~same_same_spark.operators.facets`): count/min/max/sum/
        avg of a numeric field; ``extended=True`` adds sum_of_squares,
        variance and std_deviation (Elasticsearch's ``stats`` /
        ``extended_stats``)."""
        from same_same_spark.operators.facets import stats_facets

        return stats_facets(
            self.docs, [(0, text)], value_col, extended=extended,
            id_col=self.id_col, text_col=self.text_col,
        ).drop("query_id")

    def histogram(
        self, text: str, value_col: str, interval: float
    ) -> DataFrame:
        """Fixed-interval histogram over the query's match set
        (:mod:`~same_same_spark.operators.facets`): (key, doc_count),
        every bucket between the data bounds emitted."""
        from same_same_spark.operators.facets import histogram_facets

        return histogram_facets(
            self.docs, [(0, text)], value_col, interval,
            id_col=self.id_col, text_col=self.text_col,
        ).drop("query_id")

    def percentiles(
        self,
        text: str,
        value_col: str,
        percents: list[float] = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0),
    ) -> DataFrame:
        """Exact interpolated percentiles of a numeric field over the
        query's match set: (percent, value)."""
        from same_same_spark.operators.facets import percentiles_facets

        return percentiles_facets(
            self.docs, [(0, text)], value_col, percents=percents,
            id_col=self.id_col, text_col=self.text_col,
        ).drop("query_id")

    def filters_agg(
        self,
        text: str,
        buckets: dict[str, dict],
        other_bucket: bool = False,
    ) -> DataFrame:
        """Named FilterExpr buckets over the query's match set (ES
        ``filters`` aggregation): (bucket, doc_count, avg_score) with
        a fixed shape — empty buckets emit doc_count 0."""
        from same_same_spark.operators.facets import filters_facets

        return filters_facets(
            self.docs, [(0, text)], buckets, other_bucket=other_bucket,
            metadata_col=None, id_col=self.id_col,
            text_col=self.text_col,
        ).drop("query_id")

    def rare_terms(
        self,
        text: str,
        facet_col: str,
        max_doc_count: int = 1,
        topn: int = 10,
    ) -> DataFrame:
        """Long-tail facet values over the match set (ES
        ``rare_terms``): doc_count <= max_doc_count, rarest first."""
        from same_same_spark.operators.facets import rare_terms_facets

        return rare_terms_facets(
            self.docs, [(0, text)], facet_col,
            max_doc_count=max_doc_count, topn=topn,
            id_col=self.id_col, text_col=self.text_col,
        ).drop("query_id")

    def weighted_avg(
        self, text: str, value_col: str, weight_col: str
    ) -> DataFrame:
        """Weighted average over the match set (ES ``weighted_avg``):
        sum(v*w)/sum(w), docs missing either field skipped."""
        from same_same_spark.operators.facets import weighted_avg_facets

        return weighted_avg_facets(
            self.docs, [(0, text)], value_col, weight_col,
            id_col=self.id_col, text_col=self.text_col,
        ).drop("query_id")

    def matrix_stats(self, text: str, value_cols: list[str]) -> DataFrame:
        """Pairwise covariance/correlation over the match set (ES
        ``matrix_stats``), complete-case."""
        from same_same_spark.operators.facets import matrix_stats_facets

        return matrix_stats_facets(
            self.docs, [(0, text)], value_cols,
            id_col=self.id_col, text_col=self.text_col,
        ).drop("query_id")

    def sampler_terms(
        self,
        text: str,
        facet_col: str,
        shard_size: int = 100,
        topn: int = 5,
    ) -> DataFrame:
        """Terms agg restricted to the top-``shard_size`` best-scoring
        matches (ES ``sampler`` > ``terms``, made deterministic)."""
        from same_same_spark.operators.facets import sampler_terms_facets

        return sampler_terms_facets(
            self.docs, [(0, text)], facet_col, shard_size=shard_size,
            topn=topn, id_col=self.id_col, text_col=self.text_col,
        ).drop("query_id")

    def explain(self, text: str, ids: list) -> DataFrame:
        """Per-term BM25 score breakdown for the given hits (ES
        ``_explain``): (id, term, tf, dl, df, idf, weight); weights
        sum to the hit's score."""
        from same_same_spark.operators.explain import explain_scores

        return explain_scores(
            self.docs, [(0, text)], [(0, i) for i in ids],
            id_col=self.id_col, text_col=self.text_col,
        ).drop("query_id").withColumnRenamed("doc_id", self.id_col)

    def term_vectors(self, ids: list) -> DataFrame:
        """Per-doc analyzer output with corpus-wide term statistics
        (ES ``_termvectors``): (id, term, tf, positions, df, ttf)."""
        from same_same_spark.operators.termvectors import term_vectors

        return term_vectors(
            self.docs, ids, id_col=self.id_col, text_col=self.text_col
        ).withColumnRenamed("doc_id", self.id_col)

    def percolate(self, registered: list[tuple[int, str]]) -> DataFrame:
        """Reverse search (ES percolate): every (registered query, doc)
        pair where the doc contains ALL of the query's terms,
        BM25-scored — rule-based document routing."""
        from same_same_spark.operators.percolate import percolate

        return percolate(
            self.docs, registered, id_col=self.id_col,
            text_col=self.text_col,
        ).withColumnRenamed("doc_id", self.id_col)

    def adjacency_matrix(
        self, filters: list[tuple[str, str]]
    ) -> DataFrame:
        """Named-filter overlap counts (ES ``adjacency_matrix``):
        singles plus 'a&b' pairwise intersections."""
        from same_same_spark.operators.facets import (
            adjacency_matrix_facets,
        )

        return adjacency_matrix_facets(
            self.docs, filters, id_col=self.id_col,
            text_col=self.text_col,
        )

    def terms_stats(
        self, text: str, facet_col: str, value_col: str, topn: int = 5
    ) -> DataFrame:
        """Terms buckets with a nested metric sub-aggregation over the
        query's match set (ES ``terms { stats }``)."""
        from same_same_spark.operators.facets import terms_metrics_facets

        return terms_metrics_facets(
            self.docs, [(0, text)], facet_col, value_col, topn=topn,
            id_col=self.id_col, text_col=self.text_col,
        ).drop("query_id")

    def composite(
        self,
        text: str,
        source_cols: list[str],
        size: int = 10,
        after: tuple | None = None,
    ) -> DataFrame:
        """Paginated key-ordered bucket counts over the query's match
        set (ES ``composite`` agg); ``after`` = the last key tuple of
        the previous page."""
        from same_same_spark.operators.facets import composite_facets

        return composite_facets(
            self.docs, [(0, text)], source_cols, size=size,
            after={0: after} if after is not None else None,
            id_col=self.id_col, text_col=self.text_col,
        ).drop("query_id")

    def cardinality(self, text: str, value_col: str) -> DataFrame:
        """value_count / exact distinct / missing counts of a field
        over the query's match set."""
        from same_same_spark.operators.facets import cardinality_facets

        return cardinality_facets(
            self.docs, [(0, text)], value_col,
            id_col=self.id_col, text_col=self.text_col,
        ).drop("query_id")

    def significant_terms(
        self, text: str, topn: int = 10, min_doc_count: int = 2
    ) -> DataFrame:
        """JLH-scored terms over-represented in the query's match set
        vs the corpus (:mod:`~same_same_spark.operators.sigterms`):
        (term, fg_count, bg_count, score, rank)."""
        from same_same_spark.operators.sigterms import significant_terms

        return significant_terms(
            self.docs, [(0, text)], topn=topn,
            min_doc_count=min_doc_count,
            id_col=self.id_col, text_col=self.text_col,
        ).drop("query_id")

    def top_hits(
        self,
        text: str,
        facet_col: str,
        topn: int = 5,
        k_hits: int = 3,
    ) -> DataFrame:
        """Top-hits aggregation
        (:mod:`~same_same_spark.operators.facets`): the best
        ``k_hits`` BM25 docs inside each of the query's top-``topn``
        facet buckets."""
        from same_same_spark.operators.facets import facet_top_hits

        return facet_top_hits(
            self.docs, [(0, text)], facet_col, topn=topn,
            k_hits=k_hits, id_col=self.id_col, text_col=self.text_col,
        ).drop("query_id").withColumnRenamed("doc_id", self.id_col)

    def more_like_this(
        self, doc_id, k: int = DEFAULT_TOP_K, max_terms: int = 10
    ) -> DataFrame:
        """Document-as-query retrieval
        (:mod:`~same_same_spark.operators.mlt`): the source doc's
        top-``max_terms`` tf-idf-salient terms as a BM25 query, source
        excluded."""
        from same_same_spark.operators.mlt import more_like_this

        # query_id is kept: it carries the SOURCE doc id
        return more_like_this(
            self.docs, [doc_id], k=k, max_terms=max_terms,
            id_col=self.id_col, text_col=self.text_col,
        ).withColumnRenamed("doc_id", self.id_col)

    def suggest(
        self,
        terms: list[str] | str,
        max_edits: int = 2,
        topn: int = 3,
        **kw,
    ) -> DataFrame:
        """Spelling suggestions. A LIST of terms → per-term SymSpell
        suggestions from the corpus vocabulary
        (:mod:`~same_same_spark.operators.spell`). A STRING with >= 2
        tokens → whole-phrase correction ranked by the corpus bigram
        LM (:mod:`~same_same_spark.operators.phrasesuggest`, ES's
        phrase suggester; extra ``kw`` pass through); a single-token
        string routes to the term suggester."""
        from same_same_spark.text.tokenizer import tokenize_py

        if isinstance(terms, str):
            toks = tokenize_py(terms)
            if len(toks) >= 2:
                from same_same_spark.operators.phrasesuggest import (
                    phrase_suggest,
                )

                return phrase_suggest(
                    self.docs, [(0, terms)], topn=topn,
                    max_edits=max_edits, id_col=self.id_col,
                    text_col=self.text_col, **kw,
                ).drop("query_id")
            terms = toks
        from same_same_spark.operators.spell import (
            suggest_terms,
            vocab_from_docs,
        )

        return suggest_terms(
            vocab_from_docs(
                self.docs, id_col=self.id_col, text_col=self.text_col
            ),
            terms, max_edits=max_edits, topn=topn,
        )

    def advanced_search(
        self,
        query: str,
        k: int = DEFAULT_TOP_K,
        filters: dict | None = None,
        hybrid: HybridWeight | None = None,
        global_stats: bool = False,
    ) -> DataFrame:
        """F3 FilterExpr + BM25 + A7 hybrid blend (SURVEY §3.2).

        Unfiltered calls with an attached index blend over the index's
        top ``max(4k, k)`` BM25 candidates (exact under the monotone
        affine blend — with no filters every doc's metadata score is
        1.0, so blended order == BM25 order away from 1e-9 rounding
        boundaries).

        ``global_stats=True`` (opt-in) routes FILTERED calls through the
        index too: over-fetch + compiled-filter post-filter, looping
        until k survivors (see :meth:`_index_topk_filtered`). BM25
        scores then come from UNFILTERED corpus stats; the default
        keeps the reference's filter-then-score stats and re-scores the
        filtered corpus naively. The hybrid blend stays exact either
        way: post-filter every survivor's metadata score is 1.0
        (advanced_search.go:80-91), so the blend is the monotone affine
        ``wv·score + wm`` and cannot reorder the top-k."""
        if not query:
            raise ValueError("query cannot be empty")
        k = k if k > 0 else DEFAULT_TOP_K
        if hybrid is not None:
            hybrid.validate()
        if self.index_dir and filters and global_stats:
            meta = "metadata" if "metadata" in self.docs.columns else None
            pred = compile_filters(
                filters, metadata_col=meta, df=self.docs
            )
            base = self._index_topk_filtered(query, k, pred)
            if hybrid is not None and (hybrid.vector, hybrid.metadata) != (
                1.0,
                0.0,
            ):
                base = base.withColumn(
                    "score",
                    F.lit(hybrid.vector) * F.col("score")
                    + F.lit(hybrid.metadata),
                )
            return rank_topk(base, k, id_col=self.id_col).select(
                self.id_col, "score", "rank"
            )
        if self.index_dir and not filters:
            base = self._index_topk(query, max(4 * k, k)).drop("rank")
            if hybrid is not None and (hybrid.vector, hybrid.metadata) != (
                1.0,
                0.0,
            ):
                base = base.withColumn(
                    "score",
                    F.lit(hybrid.vector) * F.col("score")
                    + F.lit(hybrid.metadata),
                )
            return rank_topk(base, k, id_col=self.id_col).select(
                self.id_col, "score", "rank"
            )
        meta = "metadata" if "metadata" in self.docs.columns else None
        return advanced_search(
            self.docs,
            query,
            k=k,
            filters=filters,
            hybrid=hybrid,
            id_col=self.id_col,
            text_col=self.text_col,
            metadata_col=meta,
        ).withColumnRenamed("doc_id", self.id_col)

    def temporal_search(
        self,
        text: str,
        k: int = DEFAULT_TOP_K,
        decay: str = "medium",
        ref_time: str | None = None,
        time_field: str = "created_at",
    ) -> DataFrame:
        """X7/X8 — BM25 then exponential time decay re-rank
        (``memory/temporal_search.go:13-81``). Returns
        (id, score, base_score, decay_factor, doc_time)."""
        lam = DECAY_LAMBDAS[decay]
        k = k if k > 0 else DEFAULT_TOP_K
        if self.index_dir:
            base = self._index_topk(text, max(k * 4, k)).drop("rank")
        else:
            base = (
                score_queries(
                    self.docs, [(0, text)], k=max(k * 4, k),
                    id_col=self.id_col, text_col=self.text_col,
                )
                .drop("query_id", "rank")
                .withColumnRenamed("doc_id", self.id_col)
            )
        meta = "metadata" if "metadata" in self.docs.columns else None
        created = "created_at" if "created_at" in self.docs.columns else None
        updated = "updated_at" if "updated_at" in self.docs.columns else None
        doc_time = resolve_doc_time(
            metadata_col=meta, time_field=time_field,
            created_at=created, updated_at=updated,
        )
        ref = (
            F.to_timestamp(F.lit(ref_time))
            if ref_time is not None
            else F.current_timestamp()
        )
        joined = self.docs.join(
            base.withColumnRenamed("score", "base_score"),
            base[self.id_col] == self.docs[self.id_col],
        ).select(
            self.docs[self.id_col],
            F.col("base_score"),
            doc_time.alias("doc_time"),
        )
        scored = joined.withColumn(
            "decay_factor", decay_factor_col(F.col("doc_time"), ref, lam)
        ).withColumn(
            "score",
            apply_decay_col(F.col("base_score"), F.col("doc_time"), ref, lam),
        )
        return rank_topk(scored, k, id_col=self.id_col).select(
            self.id_col, "score", "base_score", "decay_factor",
            "doc_time", "rank",
        )

    # ---- K3: collection export / import -------------------------------

    def export_collection(self, path: str) -> None:
        """K3 — whole collection → JSON (``local/storage.go:461-500``)."""
        self.docs.write.mode("overwrite").json(path)

    @staticmethod
    def import_collection(
        spark, path: str, id_col: str = "id", text_col: str = "text"
    ) -> "SameSameSpark":
        return SameSameSpark(spark.read.json(path), id_col, text_col)

    # ---- stats --------------------------------------------------------

    def embedder_stats(self) -> dict:
        """A5 — vocabulary size + document count
        (``tfidf.go:239-250``)."""
        from same_same_spark.stats import term_doc_freqs, tokenized

        tok = tokenized(self.docs, id_col=self.id_col, text_col=self.text_col)
        return {
            "document_count": self.docs.count(),
            "vocabulary_size": term_doc_freqs(tok).count(),
        }

"""X11 — the reference's SimpleCLIP hash embedder, text path
(``internal/embedders/clip/simple.go:75-106,261-267``,
``native.go:228-244``), bit-faithfully re-expressed.

Semantics (pinned; the goldens depend on them):

- ``t = lower(trimspace(text))``; ``words = fields(t)`` (split on
  whitespace runs); trigrams are **byte** slices ``t[j:j+3]`` of the
  UTF-8 encoding (Go string indexing is bytes, simple.go:96-100);
- ``hash(s, a, b) = big-endian uint32 of md5(utf8(s) + byte(a) + byte(b))``
  (simple.go:261-267 — seeds truncate mod 256);
- component ``i``:
  ``sum_j sin(hash(words[j], i, j)) / len(words)
    + 0.1 * sum_j cos(hash(t[j:j+3], i, 0))``;
- L2-normalise; all-zero stays all-zero (native.go:228-244), so an
  empty/short text scores cosine 0 against everything
  (``models/vector.go:37-54`` returns 0 on zero norm).

Execution: the per-(string, seed-pair) md5 work is memoised per
executor — word/trigram vocabularies are tiny relative to token counts,
so each distinct ``(word, j mod 256)`` / trigram costs ``dim`` md5
finalisations exactly once. The UDF is an Arrow-batched pandas UDF;
the cosine top-k stays JVM-side (``aggregate(zip_with(...))``).

Accumulation order matches the Go loops per component (words in
position order, each term scaled by ``1/len(words)`` before adding,
then trigrams scaled by ``0.1``), so the pandas UDF, the pure-Python
model and the Go reference agree bit-for-bit on ASCII inputs.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

DIM_DEFAULT = 512  # simple.go:29

# Go's unicode.IsSpace set (White_Space property) — what strings.Fields
# and strings.TrimSpace split/trim on. Python's str.split()/strip()
# additionally treat the information separators \x1c-\x1f as whitespace,
# which Go does NOT; using them would silently diverge from the
# reference (and from the DuckDB oracle) on texts containing \x1c-\x1f.
_GO_WS = (
    "\t\n\v\f\r \x85\xa0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000"
)
import re as _re  # after the constant: regex built from it below

_GO_WS_RE = _re.compile("[" + _re.escape(_GO_WS) + "]+")


def _go_fields(t: str) -> list[str]:
    """``strings.Fields`` — split on runs of Go whitespace."""
    return [w for w in _GO_WS_RE.split(t) if w]

# Per-executor memoisation: (bytes, seed2, dim, trig) -> the trig-applied
# hash vector over seed1 = 0..dim-1. Bounded; cleared wholesale when full.
# Trig goes through math.sin/math.cos (libm), NOT np.sin — numpy's SIMD
# path differs by ULPs and would break bit-identity with the scalar model
# and the DuckDB oracle (both libm).
_TRIG_CACHE: dict[tuple[bytes, int, int, bool], np.ndarray] = {}
_TRIG_CACHE_MAX = 200_000


def _trig_vec(s: bytes, seed2: int, dim: int, use_cos: bool) -> np.ndarray:
    """trig(uint32(md5(s + byte(i) + byte(seed2)))) for i in 0..dim-1."""
    key = (s, seed2, dim, use_cos)
    out = _TRIG_CACHE.get(key)
    if out is None:
        if len(_TRIG_CACHE) >= _TRIG_CACHE_MAX:
            _TRIG_CACHE.clear()
        base = hashlib.md5(s)
        fn = math.cos if use_cos else math.sin
        raw = np.empty(dim, dtype=np.float64)
        b2 = seed2 & 0xFF
        for i in range(dim):
            h = base.copy()
            h.update(bytes((i & 0xFF, b2)))
            raw[i] = fn(float(int.from_bytes(h.digest()[:4], "big")))
        _TRIG_CACHE[key] = out = raw
    return out


def embed_text_py(text: str | None, dim: int = DIM_DEFAULT) -> list[float]:
    """Literal scalar model of simple.go:75-106 — test/golden reference."""
    t = (text or "").strip(_GO_WS).lower()
    b = t.encode("utf-8")
    words = _go_fields(t)
    emb = [0.0] * dim
    for i in range(dim):
        v = 0.0
        for j, w in enumerate(words):
            h = hashlib.md5(
                w.encode("utf-8") + bytes((i & 0xFF, j & 0xFF))
            ).digest()
            v += math.sin(float(int.from_bytes(h[:4], "big"))) * (
                1.0 / len(words)
            )
        for j in range(len(b) - 2):
            h = hashlib.md5(b[j:j + 3] + bytes((i & 0xFF, 0))).digest()
            v += math.cos(float(int.from_bytes(h[:4], "big"))) * 0.1
        emb[i] = v
    norm = math.sqrt(sum(x * x for x in emb))
    if norm == 0:
        return emb
    return [x / norm for x in emb]


def _embed_one(text: str | None, dim: int) -> np.ndarray:
    """Vectorised (over dims) embedding with memoised hashes; preserves
    the Go per-component accumulation order exactly."""
    t = (text or "").strip(_GO_WS).lower()
    b = t.encode("utf-8")
    words = _go_fields(t)
    vec = np.zeros(dim, dtype=np.float64)
    if words:
        inv_w = 1.0 / len(words)
        for j, w in enumerate(words):
            vec += _trig_vec(w.encode("utf-8"), j & 0xFF, dim, False) * inv_w
    for j in range(len(b) - 2):
        vec += _trig_vec(b[j:j + 3], 0, dim, True) * 0.1
    # left-to-right scalar sum (not np.dot's pairwise order) so the norm
    # is bit-identical to the scalar model / Go loop
    norm = math.sqrt(sum(float(x) * float(x) for x in vec))
    if norm == 0.0:
        return vec
    return vec / norm


def clip_embed_udf(dim: int = DIM_DEFAULT):
    """Arrow-batched pandas UDF: text -> ARRAY<DOUBLE>[dim]."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [_embed_one(t, dim).tolist() for t in texts]
        )

    return _udf


def clip_text_embed(
    df: DataFrame,
    text_col: str = "content",
    dim: int = DIM_DEFAULT,
    out_col: str = "clip_emb",
) -> DataFrame:
    """Adds the SimpleCLIP text embedding column."""
    return df.withColumn(out_col, clip_embed_udf(dim)(F.col(text_col)))


def _dot_with_lit(emb_col: Column, query_vec: list[float]) -> Column:
    """JVM-side dot product against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return F.aggregate(
        F.zip_with(emb_col, q, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def clip_text_topk(
    docs_df: DataFrame,
    query: str,
    k: int = 10,
    dim: int = DIM_DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """SimpleCLIP search: embed docs + query, cosine top-k.

    Both sides are unit vectors (or zero), so cosine == dot; zero-vector
    docs score 0 like the reference (vector.go:37-54). Returns
    (doc_id, score DOUBLE, rank INT) under the pinned
    ``(round(score, 9) DESC, doc_id ASC)`` order via a global
    ``orderBy().limit(k)`` (TakeOrderedAndProject — no window).
    """
    from same_same_spark.operators.hybrid import rank_topk

    qv = embed_text_py(query, dim)
    scored = clip_text_embed(
        docs_df.select(F.col(id_col).alias("doc_id"), text_col),
        text_col=text_col, dim=dim,
    ).select(
        "doc_id", _dot_with_lit(F.col("clip_emb"), qv).alias("score")
    )
    return rank_topk(scored, k).select("doc_id", "score", "rank")


# ---------------------------------------------------------------------------
# DuckDB oracle
# ---------------------------------------------------------------------------

# ASCII-only + no vertical-tab + <128 words: on this subset DuckDB's
# char-wise substr/chr() reproduce Go's byte-wise slicing and raw-byte
# md5 seeds exactly (chr(n) is a single byte only for n < 128).
def ascii_filter_col(c: Column, max_words: int = 128) -> Column:
    from same_same_spark.pipeline.textqc import ws_token_count_col

    return (
        (F.length(c) == F.octet_length(c))
        & (~F.contains(c, F.lit("\x0b")))
        & (ws_token_count_col(c) < max_words)
    )


def ascii_filter_sql(col_expr: str, max_words: int = 128) -> str:
    from same_same_spark.pipeline.textqc import token_count_sql

    ws_count = token_count_sql(col_expr)["ws_tokens"]
    return (
        f"length({col_expr}) = strlen({col_expr})"
        f" AND NOT contains({col_expr}, chr(11))"
        f" AND {ws_count} < {max_words}"
    )


def duckdb_clip_sql(
    table: str,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 10,
    dim: int = 64,
    where: str = "TRUE",
    round_score: int | None = 6,
) -> str:
    """DuckDB twin of :func:`clip_text_topk` over the ASCII subset.

    The query vector is embedded driver-side (exact same Python model)
    and inlined — the *document* embedding math runs entirely in SQL.
    Requires ``dim <= 128`` (chr(i) must stay single-byte).
    """
    if dim > 128:
        raise ValueError("duckdb_clip_sql requires dim <= 128")
    qv = embed_text_py(query, dim)
    qvalues = ", ".join(f"({i}, {v!r})" for i, v in enumerate(qv))
    hash32 = (
        "(('0x' || substr(md5({s} || chr(i::INTEGER) || "
        "chr(({b2})::INTEGER)), 1, 8))::UBIGINT)::DOUBLE"
    )
    # byte(j) for j < 128 is just chr(j); the filter guarantees j < 128.
    word_hash = hash32.format(s="word", b2="j")
    tri_hash = hash32.format(s="tri", b2="0")
    sel_score = (
        f"round(score, {round_score}) AS score" if round_score is not None
        else "score"
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         lower(trim({text_col}, E' \\t\\n\\f\\r')) AS t
  FROM {table}
  WHERE ({where}) AND {ascii_filter_sql(text_col)}
),
words AS (
  SELECT doc_id, j, w[j + 1] AS word, len(w) AS n_words
  FROM (
    SELECT doc_id,
           CASE WHEN length(t) = 0 THEN []
                ELSE string_split_regex(t, '[ \\t\\n\\f\\r]+') END AS w
    FROM base
  ), unnest(range(len(w))) AS u(j)
),
tris AS (
  SELECT doc_id, substr(t, j, 3) AS tri
  FROM base, unnest(range(1, greatest(length(t) - 2, 0) + 1)) AS u(j)
),
dims AS ( SELECT unnest(range({dim})) AS i ),
word_part AS (
  SELECT w.doc_id, d.i,
         sum(sin({word_hash}) * (1.0 / w.n_words)) AS v
  FROM words w CROSS JOIN dims d
  GROUP BY w.doc_id, d.i
),
tri_part AS (
  SELECT t.doc_id, d.i, 0.1 * sum(cos({tri_hash})) AS v
  FROM tris t CROSS JOIN dims d
  GROUP BY t.doc_id, d.i
),
raw AS (
  SELECT b.doc_id, d.i,
         coalesce(wp.v, 0.0) + coalesce(tp.v, 0.0) AS v
  FROM base b CROSS JOIN dims d
  LEFT JOIN word_part wp ON b.doc_id = wp.doc_id AND d.i = wp.i
  LEFT JOIN tri_part tp ON b.doc_id = tp.doc_id AND d.i = tp.i
),
norms AS (
  SELECT doc_id, sqrt(sum(v * v)) AS nrm FROM raw GROUP BY doc_id
),
qv AS ( SELECT * FROM (VALUES {qvalues}) AS q(i, qv) ),
scored AS (
  SELECT r.doc_id,
         CASE WHEN n.nrm = 0 THEN 0.0
              ELSE sum(q.qv * r.v / n.nrm) END AS score
  FROM raw r
  JOIN norms n ON r.doc_id = n.doc_id
  JOIN qv q ON r.i = q.i
  GROUP BY r.doc_id, n.nrm
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (
           ORDER BY round(score, 9) DESC, doc_id ASC
         ) AS rank
  FROM scored
)
SELECT doc_id, {sel_score}, rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# image path (simple.go:107-259) — feature math is real; DECODE is gated
# ---------------------------------------------------------------------------

IMG_DIM = 512  # 256 color-histogram + 128 texture + 128 spatial


def embed_image_py(rgb) -> list[float]:
    """Literal scalar model of ``embedImage`` (simple.go:107-259) over an
    (H, W, 3) uint8 pixel array.

    Channel values are widened to Go's 16-bit ``RGBA()`` scale
    (``v16 = v8 * 0x101``, opaque images). The reference resizes to
    224x224 with Lanczos3 first — resizing belongs to the (gated) decode
    step here, so features are computed over the array as given.

    Faithful quirks preserved on purpose:
    - color histogram grayscale uses *integer* ``(r+g+b)/3`` then
      ``>> 8`` (simple.go:158-161);
    - texture edge deltas are **uint32 subtractions** — a darker
      right/lower neighbour wraps around 2^32 before the float
      conversion (simple.go:185-190), exactly as in Go;
    - spatial grid uses integer cell sizes and fills (avg, brightness)
      pairs until 128 slots are used (simple.go:225-253).
    """
    import numpy as np

    a = np.asarray(rgb, dtype=np.uint32)
    h, w = a.shape[0], a.shape[1]
    r = a[:, :, 0] * 0x101
    g = a[:, :, 1] * 0x101
    b = a[:, :, 2] * 0x101

    emb = [0.0] * IMG_DIM

    # 1. color histogram (dims 0..255), every 16th pixel
    count = 0
    for y in range(0, h, 16):
        for x in range(0, w, 16):
            gray = (int(r[y, x]) + int(g[y, x]) + int(b[y, x])) // 3
            emb[gray >> 8] += 1.0
            count += 1
    if count > 0:
        for i in range(256):
            emb[i] /= float(count)

    # 2. texture edges (dims 256..383), 2x2 patches every 8 px
    tex = [0.0] * 128
    M32 = 1 << 32
    for y in range(0, h - 8, 8):
        for x in range(0, w - 8, 8):
            d = 0.0
            for c in (r, g, b):  # horizontal: At(x+8, y) - At(x, y)
                d += float((int(c[y, x + 8]) - int(c[y, x])) % M32)
            h_edge = abs(d)
            d = 0.0
            for c in (r, g, b):  # vertical: At(x, y+8) - At(x, y)
                d += float((int(c[y + 8, x]) - int(c[y, x])) % M32)
            v_edge = abs(d)
            tex[int(h_edge / 65536.0 * 64.0) % 64] += 1.0
            tex[64 + int(v_edge / 65536.0 * 64.0) % 64] += 1.0
    s = sum(tex)
    if s > 0:
        tex = [v / s for v in tex]
    emb[256:384] = tex

    # 3. spatial grid (dims 384..511): 8x8 cell centers, (avg, brightness)
    spat = [0.0] * 128
    cw, ch = w // 8, h // 8
    idx = 0
    for gy in range(8):
        if idx >= 128:
            break
        for gx in range(8):
            if idx >= 128:
                break
            cx, cy = gx * cw + cw // 2, gy * ch + ch // 2
            if cx < w and cy < h:
                rr, gg, bb = int(r[cy, cx]), int(g[cy, cx]), int(b[cy, cx])
                spat[idx] = float(rr + gg + bb) / (3.0 * 65535.0)
                if idx + 1 < 128:
                    spat[idx + 1] = (
                        0.299 * rr + 0.587 * gg + 0.114 * bb
                    ) / 65535.0
                idx += 2
    emb[384:512] = spat

    norm = math.sqrt(sum(float(x) * float(x) for x in emb))
    if norm == 0:
        return emb
    return [x / norm for x in emb]


def _embed_image_one(rgb) -> np.ndarray:
    """Vectorised twin of :func:`embed_image_py` (bit-identical)."""
    a = np.asarray(rgb, dtype=np.uint32)
    h, w = a.shape[0], a.shape[1]
    c16 = a * np.uint32(0x101)
    r, g, b = c16[:, :, 0], c16[:, :, 1], c16[:, :, 2]

    emb = np.zeros(IMG_DIM, dtype=np.float64)

    samp = (r[::16, ::16] + g[::16, ::16] + b[::16, ::16]) // 3
    bins = (samp >> 8).ravel()
    count = bins.size
    if count:
        emb[:256] = np.bincount(bins, minlength=256)[:256] / float(count)

    ys, xs = np.arange(0, h - 8, 8), np.arange(0, w - 8, 8)
    if ys.size and xs.size:
        p = np.ix_(ys, xs)
        ph = np.ix_(ys, xs + 8)
        pv = np.ix_(ys + 8, xs)
        # uint32 wraparound, then float — same quirk as the scalar model
        h_edge = np.abs(
            (r[ph] - r[p]).astype(np.float64)
            + (g[ph] - g[p]).astype(np.float64)
            + (b[ph] - b[p]).astype(np.float64)
        )
        v_edge = np.abs(
            (r[pv] - r[p]).astype(np.float64)
            + (g[pv] - g[p]).astype(np.float64)
            + (b[pv] - b[p]).astype(np.float64)
        )
        hb = (h_edge / 65536.0 * 64.0).astype(np.int64).ravel() % 64
        vb = (v_edge / 65536.0 * 64.0).astype(np.int64).ravel() % 64
        tex = np.bincount(hb, minlength=64).astype(np.float64)
        tex = np.concatenate(
            [tex, np.bincount(vb, minlength=64).astype(np.float64)]
        )
        s = tex.sum()
        if s > 0:
            emb[256:384] = tex / s

    cw, ch = w // 8, h // 8
    idx = 0
    for gy in range(8):
        if idx >= 128:
            break
        for gx in range(8):
            if idx >= 128:
                break
            cx, cy = gx * cw + cw // 2, gy * ch + ch // 2
            if cx < w and cy < h:
                rr = int(r[cy, cx]); gg = int(g[cy, cx]); bb = int(b[cy, cx])
                emb[384 + idx] = float(rr + gg + bb) / (3.0 * 65535.0)
                if idx + 1 < 128:
                    emb[384 + idx + 1] = (
                        0.299 * rr + 0.587 * gg + 0.114 * bb
                    ) / 65535.0
                idx += 2

    norm = math.sqrt(sum(float(x) * float(x) for x in emb))
    if norm == 0.0:
        return emb
    return emb / norm


def fake_decode_rgb(payload: bytes, size: int = 32) -> np.ndarray:
    """Deterministic stand-in decoder: BINARY payload -> (size, size, 3)
    uint8 grid via md5 row seeds. The real decoder (PIL + Lanczos resize
    to 224) stays behind :func:`decode_image_rgb`'s import gate; this
    keeps the *feature* path testable end to end, mirroring
    ``multimodal.fake_features``'s role for the plumbing."""
    rows = []
    for y in range(size):
        seed = hashlib.md5(payload + b"#" + str(y).encode()).digest()
        row = hashlib.md5(seed).digest()
        while len(row) < size * 3:
            row += hashlib.md5(row[-16:]).digest()
        rows.append(np.frombuffer(row[: size * 3], dtype=np.uint8))
    return np.stack(rows).reshape(size, size, 3)


def decode_image_rgb(payload: bytes, size: tuple[int, int] = (224, 224)):
    """Real decode + Lanczos3 resize, mirroring the reference's
    ``image.Decode`` + ``resize.Lanczos3`` (``simple.go:107-143``).

    PIL handles every registered format when present; without it the
    stdlib codec (:mod:`same_same_spark.pipeline.imagecodec`) decodes
    PNG/BMP/GIF, lossless WebP and huffman-DCT JPEG (incl.
    progressive and lossless) for real — only lossy/animated WebP and
    hierarchical/arithmetic JPEG remain gated
    (``UnsupportedImageError``, a ``NotImplementedError`` subclass)."""
    try:
        import PIL.Image as Image
    except ImportError:  # no PIL in this container — stdlib codec path
        from same_same_spark.pipeline.imagecodec import (
            decode_image,
            resize_lanczos3,
        )

        return resize_lanczos3(decode_image(payload), size)
    import io

    img = Image.open(io.BytesIO(payload)).convert("RGB")
    return np.asarray(img.resize(size, Image.LANCZOS), dtype=np.uint8)


def clip_image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    decoder=fake_decode_rgb,
) -> DataFrame:
    """SimpleCLIP image embeddings over a BINARY column via mapInPandas
    (Arrow batches in, one 512-dim row out per input row). ``decoder``
    is the pluggable bytes->pixels step (real PIL decode at production,
    :func:`fake_decode_rgb` in this container)."""
    from collections.abc import Iterator

    schema = f"{id_col} LONG, clip_emb ARRAY<DOUBLE>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _embed_image_one(
                    decoder(bytes(blob) if blob is not None else b"")
                ).tolist()
                for blob in pdf[content_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "clip_emb": feats})

    return df.select(id_col, content_col).mapInPandas(extract, schema)


def fake_decode_rgb_hex(key: str, size: int = 32) -> np.ndarray:
    """ASCII-keyed stand-in decoder: pixel (x, y) channels come from the
    first three bytes of ``md5(key + ':' + x + ':' + y)``'s hex digest.
    Unlike :func:`fake_decode_rgb` every md5 input is an ASCII string, so
    a SQL engine can reproduce any sampled pixel exactly — which is what
    makes :func:`duckdb_clip_image_sql` possible."""
    grid = np.empty((size, size, 3), dtype=np.uint8)
    for y in range(size):
        for x in range(size):
            h = hashlib.md5(f"{key}:{x}:{y}".encode()).hexdigest()
            grid[y, x] = (
                int(h[0:2], 16), int(h[2:4], 16), int(h[4:6], 16)
            )
    return grid


def duckdb_clip_image_sql(
    table: str,
    id_col: str,
    size: int = 32,
    where: str = "TRUE",
    out_dims: int = 16,
    round_score: int | None = 6,
) -> str:
    """DuckDB twin of the SimpleCLIP image feature path over
    ``fake_decode_rgb_hex(str(id))`` grids.

    Computes the embedding *sparsely* — only the pixels the reference
    actually samples (simple.go:144-259): the every-16th histogram
    grid, the 8-px-stride texture patches, and the 64 spatial cell
    centers. The L2 norm is assembled from all three sections' nonzero
    entries, then the first ``out_dims`` spatial components (dims
    384..384+out_dims-1) are emitted post-normalisation as
    ``(doc_id, i, val)`` — matching the Spark entry's projection.
    """
    assert size % 16 == 0 and size >= 16, "sparse SQL assumes 16 | size"
    hist_pos = [(x, y) for y in range(0, size, 16) for x in range(0, size, 16)]
    tex_pos = [
        (x, y) for y in range(0, size - 8, 8) for x in range(0, size - 8, 8)
    ]
    cell = size // 8
    centers = [
        (c, gx * cell + cell // 2, gy * cell + cell // 2)
        for c in range(64)
        for gy, gx in [(c // 8, c % 8)]
    ]
    need = sorted(
        set(hist_pos)
        | {p for (x, y) in tex_pos for p in ((x, y), (x + 8, y), (x, y + 8))}
        | {(cx, cy) for _, cx, cy in centers}
    )
    pos_vals = ", ".join(f"({x}, {y})" for x, y in need)
    hist_vals = ", ".join(f"({x}, {y})" for x, y in hist_pos)
    tex_vals = ", ".join(f"({x}, {y})" for x, y in tex_pos)
    cen_vals = ", ".join(f"({c}, {x}, {y})" for c, x, y in centers)
    n_hist = len(hist_pos)

    def chan(off: int) -> str:
        return (
            f"('0x' || substr(md5(d.key || ':' || p.x || ':' || p.y), "
            f"{off}, 2))::BIGINT * 257"
        )

    wrap = "CASE WHEN {d} < 0 THEN {d} + 4294967296 ELSE {d} END"

    def edge(a: str, b: str) -> str:
        return " + ".join(
            wrap.format(d=f"({a}.{c} - {b}.{c})") + "::DOUBLE"
            for c in ("r", "g", "b")
        )

    sel_val = (
        f"round(val, {round_score}) AS val" if round_score is not None
        else "val"
    )
    return f"""
WITH docs AS (
  SELECT {id_col} AS doc_id, {id_col}::VARCHAR AS key
  FROM {table} WHERE {where}
),
pos AS ( SELECT * FROM (VALUES {pos_vals}) AS p(x, y) ),
pix AS (
  SELECT d.doc_id, p.x, p.y,
         {chan(1)} AS r, {chan(3)} AS g, {chan(5)} AS b
  FROM docs d CROSS JOIN pos p
),
hist AS (
  SELECT doc_id, ((r + g + b) // 3) // 256 AS bin,
         count(*)::DOUBLE / {n_hist} AS v
  FROM pix JOIN (VALUES {hist_vals}) AS h(x, y) USING (x, y)
  GROUP BY doc_id, bin
),
tex_bins AS (
  SELECT p1.doc_id, bin, count(*) AS cnt FROM (
    SELECT p1.doc_id,
           (floor(abs({edge("p2", "p1")}) / 65536.0 * 64.0))::BIGINT % 64
             AS hbin,
           64 + (floor(abs({edge("p3", "p1")}) / 65536.0 * 64.0))::BIGINT % 64
             AS vbin
    FROM (VALUES {tex_vals}) AS t(x, y)
    JOIN pix p1 ON p1.x = t.x AND p1.y = t.y
    JOIN pix p2 ON p2.doc_id = p1.doc_id AND p2.x = t.x + 8 AND p2.y = t.y
    JOIN pix p3 ON p3.doc_id = p1.doc_id AND p3.x = t.x AND p3.y = t.y + 8
  ) p1(doc_id, hbin, vbin),
  LATERAL (SELECT unnest([hbin, vbin]) AS bin) u
  GROUP BY p1.doc_id, bin
),
tex AS (
  SELECT doc_id, bin,
         cnt / (sum(cnt) OVER (PARTITION BY doc_id))::DOUBLE AS v
  FROM tex_bins
),
spat AS (
  SELECT p.doc_id, i, v FROM (
    SELECT p.doc_id,
           384 + 2 * c.c AS avg_i,
           (p.r + p.g + p.b)::DOUBLE / (3.0 * 65535.0) AS avg_v,
           384 + 2 * c.c + 1 AS br_i,
           (0.299 * p.r + 0.587 * p.g + 0.114 * p.b) / 65535.0 AS br_v
    FROM (VALUES {cen_vals}) AS c(c, x, y)
    JOIN pix p ON p.x = c.x AND p.y = c.y
  ) p(doc_id, avg_i, avg_v, br_i, br_v),
  LATERAL (SELECT unnest([avg_i, br_i]) AS i, unnest([avg_v, br_v]) AS v) u
),
norms AS (
  SELECT doc_id, sqrt(sum(vv)) AS nrm FROM (
    SELECT doc_id, v * v AS vv FROM hist
    UNION ALL SELECT doc_id, v * v FROM tex
    UNION ALL SELECT doc_id, v * v FROM spat
  ) GROUP BY doc_id
),
outv AS (
  SELECT s.doc_id, s.i,
         CASE WHEN n.nrm = 0 THEN s.v ELSE s.v / n.nrm END AS val
  FROM spat s JOIN norms n ON s.doc_id = n.doc_id
  WHERE s.i < 384 + {out_dims}
)
SELECT doc_id, i::INTEGER AS i, {sel_val} FROM outv
"""

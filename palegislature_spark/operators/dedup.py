"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

The reference's dedup is blocked pairwise name matching over members
(``find_duplicates.py:49-66``); these operators generalize that
blocking idea to document-scale near-duplicate detection, the way a
training-data pipeline needs it:

    exact_dedup        — hash-groupBy (one shuffle on a 128-bit key)
    shingles           — word n-gram shingling, all JVM-side
    jaccard_pairs      — exact all-pairs Jaccard via an inverted
                         shingle index (the correctness oracle)
    minhash_lsh_pairs  — MinHash signatures + banded LSH candidates +
                         exact verification (the 100 TB path: candidate
                         generation is linear in corpus size, the
                         quadratic step touches only same-bucket pairs)
    simhash_*          — 60-bit SimHash + banded Hamming search

Shape discipline: signatures (MinHash mins, SimHash bit votes) are
computed per-row over the token/shingle ARRAY with array expressions
— zero shuffles until the candidate join. The only exchanges left
are the ones the algorithms require (bucket join, inverted-index
join). Everything is built-in-function-only (no Python UDFs): md5 /
xxhash64 / conv / bit ops are whole-stage-codegen expressions.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from palegislature_spark.functions.expr_util import let

# --------------------------------------------------------------------------
# Exact dedup (hash-groupBy)
# --------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical texts; keep the minimum id as canonical.

    Returns (keep_id, group_size, text_md5). One shuffle on the md5
    key — the md5 is computed map-side so the wide text column never
    shuffles.
    """
    return (
        df.select(F.col(id_col).alias("__id"), F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.min("__id").alias("keep_id"), F.count(F.lit(1)).alias("group_size"))
        .select("keep_id", "group_size", "text_md5")
    )


# --------------------------------------------------------------------------
# Shingling
# --------------------------------------------------------------------------


def shingle_set_expr(toks, n: int = 3):
    """Column expression: DISTINCT word n-gram shingles of a token
    array — row-local, reusable wherever two texts' gram sets must be
    computed side by side in ONE row (delta_severity compares
    generations without a shingle-grain shuffle).

    Sliding window via zipped slices: k bulk slice ops + one struct
    concat per shingle — measurably faster than per-element
    element_at chains, and safe for short docs (slice clamps). The
    gram expression is gated on size >= n inside the row (not just by
    any outer filter): sequence(1, size-n+1) DESCENDS ([1,0]) when
    size < n, and codegen subexpression elimination can evaluate the
    projection alongside a filter predicate in the same stage, so an
    unguarded element_at would throw on short documents.
    """
    win = F.arrays_zip(
        *[F.slice(toks, j + 1, F.size(toks) - (n - 1)) for j in range(n)]
    )
    gram = F.when(
        F.size(toks) >= n,
        F.transform(win, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)])),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(gram)


def shingle_arrays(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Per-document array of DISTINCT word n-gram shingles: (id, sh).

    Small parquet inputs arrive as one partition; fan out first so
    every core shares the per-row shingling work. The within-document
    distinct is array_distinct — no shuffle.
    """
    toks = (
        df.repartition(F.col(id_col))
        .select(F.col(id_col), F.split(F.col(text_col), " ").alias("__toks"))
        .filter(F.size("__toks") >= n)
    )
    return toks.select(
        id_col, shingle_set_expr(F.col("__toks"), n).alias("sh")
    )


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle) rows."""
    return shingle_arrays(df, id_col, text_col, n).select(
        id_col, F.explode("sh").alias("shingle")
    )


def hashed_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Shingles hashed to 64-bit ints at creation: (id, sh_hash).

    Every downstream stage (MinHash family, inverted-index join,
    Jaccard counts) works on fixed-width longs instead of shingle
    strings — the string is hashed exactly once, shuffles carry 8
    bytes per shingle, and equality joins compare ints. Collisions
    (~2^-64 per shingle pair) are quantitatively irrelevant to
    near-dup detection at any realistic corpus size.
    """
    return shingle_arrays(df, id_col, text_col, n).select(
        id_col, F.explode(F.transform("sh", lambda s: F.xxhash64(s))).alias("sh_hash")
    )


def _pair_jaccard(sh: DataFrame, id_col: str, key: str = "sh_hash") -> DataFrame:
    """All same-shingle pairs -> (id_1, id_2, jaccard) via inverted index."""
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    s1 = sh.select(F.col(id_col).alias("id_1"), key)
    s2 = sh.select(F.col(id_col).alias("id_2"), key)
    common = (
        s1.join(s2, key)
        .filter(F.col("id_1") < F.col("id_2"))
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("__common"))
    )
    c1 = counts.select(F.col(id_col).alias("id_1"), F.col("__n").alias("__n1"))
    c2 = counts.select(F.col(id_col).alias("id_2"), F.col("__n").alias("__n2"))
    return (
        common.join(c1, "id_1")
        .join(c2, "id_2")
        .select(
            "id_1",
            "id_2",
            (
                F.col("__common")
                / (F.col("__n1") + F.col("__n2") - F.col("__common"))
            ).alias("jaccard"),
        )
    )


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (id_1 < id_2).

    Scale note: the shingle inverted index is exact but its join fans
    out on hot shingles; at corpus scale prefer minhash_lsh_pairs and
    keep this as the verification oracle on candidate pairs.
    """
    sh = hashed_shingles(df, id_col, text_col, n)
    return _pair_jaccard(sh, id_col).filter(F.col("jaccard") >= threshold)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    base: int = 257,
    impl: str = "arrow",
) -> DataFrame:
    """Winnowing document fingerprints (Karp-Rabin rolling-hash selection).

    Hash every character k-gram with an integer Karp-Rabin polynomial
    (``sum code(c_t) * base^(k-1-t)`` — pure 64-bit arithmetic, exact
    and collision-free for ASCII text with base > 255, and reproducible
    verbatim in DuckDB SQL), then keep the minimum of each sliding
    window of ``w`` consecutive gram hashes; the distinct minima are
    the document's fingerprints. Two documents sharing a substring of
    length >= k + w - 1 are guaranteed to share a fingerprint — the
    winnowing property that makes this the standard local-similarity
    sketch. Output: (id, fingerprint: long) rows, one linear pass
    until the caller aggregates.

    Expression discipline (the r1 perf lesson): the char-code and
    gram arrays are ``let``-bound lambda variables, so each is
    evaluated once per row.  Inlining them instead makes every window
    position re-evaluate the whole gram subtree inside interpreted
    higher-order functions — O(L*w) gram recomputations per row,
    which measured 224s at sf0.01 in round 1 vs <2s for this form.
    Overflow: max code 0x10FFFF * base^(k-1) * k must stay < 2^63 —
    holds for the defaults (k=5, base=257) by ~380x.
    """
    if base ** (k - 1) * 0x110000 * k >= 2**63:
        raise ValueError(f"k={k}, base={base} would overflow 64-bit gram hashes")
    if impl == "arrow":
        return _winnow_fingerprints_arrow(df, id_col, text_col, k, w, base)
    if impl != "expr":
        raise ValueError(f"unknown winnow impl: {impl}")

    def grams_of(codes):  # codes: bound array<long> of char codes
        # Guarded so the expression is total: Catalyst may reorder the
        # row filter below with the projection, so a too-short text
        # must yield NULL here, not an element_at out-of-bounds.
        return F.when(
            F.size(codes) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(codes) - (k - 1)),
                lambda i: sum(
                    (
                        F.element_at(codes, i + t) * F.lit(base ** (k - 1 - t))
                        for t in range(1, k)
                    ),
                    start=F.element_at(codes, i) * F.lit(base ** (k - 1)),
                ),
            ),
        )

    def wins_of(g):  # g: bound array<long> of gram hashes
        return F.when(
            F.size(g) >= w,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(g) - (w - 1)),
                    lambda j: F.array_min(F.slice(g, j, w)),
                )
            ),
        )

    # split('') chars the string in ONE pass; per-position substr()
    # inside a transform would re-scan the string per char (O(L^2)).
    codes = F.transform(
        F.split(F.col(text_col), ""), lambda c: F.ascii(c).cast("long")
    )
    fps = let(codes, lambda c: let(grams_of(c), wins_of))
    return (
        df.filter(F.length(text_col) >= k)
        .repartition(F.col(id_col))
        .select(F.col(id_col), fps.alias("__fps"))
        .filter(F.col("__fps").isNotNull())
        .select(id_col, F.explode("__fps").alias("fingerprint"))
    )


def _winnow_fingerprints_arrow(
    df: DataFrame, id_col: str, text_col: str, k: int, w: int, base: int
) -> DataFrame:
    """Vectorized winnowing over Arrow batches (the default impl).

    Winnowing's inner loop is inherently per-position sequential work,
    which interpreted Catalyst higher-order functions execute one
    lambda call at a time; numpy does the same arithmetic as three
    vectorized passes (codepoints via utf-32 decode, gram hashes via a
    sliding-window matmul, window minima via a strided view) —
    measured ~5x faster at sf0.1 (0.6s vs 3.0s warm) with a
    bit-identical fingerprint set, which the cross-impl equality test
    pins.  The ``expr`` impl remains the pure-JVM reference twin (and
    the shape the DuckDB oracle replays)."""
    import numpy as np

    from pyspark.sql import types as T

    pow_row = np.array([base ** (k - 1 - t) for t in range(k)], dtype=np.int64)
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("fingerprint", T.LongType()),
        ]
    )

    def gen(batches):
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            ids, fps = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                # NULL/short text: drop the row, matching the expr
                # impl's length(text) >= k filter semantics
                if not isinstance(text, str) or len(text) < k:
                    continue
                # utf-32-le decode = exact codepoints, matching F.ascii
                codes = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                grams = sliding_window_view(codes, k) @ pow_row
                if grams.size < w:
                    continue
                u = np.unique(sliding_window_view(grams, w).min(axis=1))
                ids.extend([did] * len(u))
                fps.extend(u.tolist())
            yield pd.DataFrame({id_col: ids, "fingerprint": fps})

    # no _fan_out here (unlike the heavier simhash/BPE kernels): the
    # winnow kernel is ~0.5s single-worker at sf0.1, so the fan-out
    # repartition costs more than it parallelizes (measured 0.75s vs
    # 0.85s), and at replica scale the scan is already parallel
    return df.select(id_col, text_col).mapInPandas(gen, out_schema)


# --------------------------------------------------------------------------
# MinHash + banded LSH
# --------------------------------------------------------------------------


def minhash_signatures(sh: DataFrame, id_col: str, num_hashes: int = 32) -> DataFrame:
    """Per-id MinHash signature: (id, h0..h{k-1}) — one wide row.

    Input is hashed_shingles() rows. Hash family: xxhash64(sh_hash,
    i) — re-hashing the 8-byte base hash per family member instead of
    re-hashing the shingle string k times (a multiply-add family
    would be cheaper still, but long-overflow errors under ANSI mode,
    which the driver's default session enables). Computed as
    `num_hashes` parallel min() aggregates in one groupBy — all
    codegen'd, map-side combine shrinks the shuffle to one wide row
    per id. (An array_min-over-transform variant avoids the shuffle
    but higher-order lambdas are interpreted per element — measurably
    slower.)
    """
    return sh.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64("sh_hash", F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )


def _verify_pairs_by_array(
    cand: DataFrame, sharr: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate (id_1, id_2) pairs by
    joining each side's distinct shingle-hash ARRAY and intersecting
    row-locally: common = |A ∩ B|, jaccard = common / (|A| + |B| -
    common) — the same integer counts (hence bit-identical division)
    as the inverted-index ``_pair_jaccard`` path, at O(candidates)
    join work instead of a chain of candidate-bounded shuffles.
    Pairs with no shared shingle fall out at any threshold > 0, like
    the inverted index (which never emits them)."""
    j = (
        cand.join(
            sharr.select(F.col(id_col).alias("id_1"), F.col("sha").alias("__a1")),
            "id_1",
        )
        .join(
            sharr.select(F.col(id_col).alias("id_2"), F.col("sha").alias("__a2")),
            "id_2",
        )
        .select(
            "id_1",
            "id_2",
            F.size(F.array_intersect("__a1", "__a2")).alias("__common"),
            F.size("__a1").alias("__n1"),
            F.size("__a2").alias("__n2"),
        )
    )
    return j.select(
        "id_1",
        "id_2",
        (
            F.col("__common")
            / (F.col("__n1") + F.col("__n2") - F.col("__common"))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def _xxh64_long_np(v, seed):
    """numpy twin of Spark's XXH64.hashLong — bit-exact (pinned in
    tests/test_dedup.py against F.xxhash64 itself). uint64 wrapping
    arithmetic everywhere; `v` may be any uint64 ndarray, `seed` a
    scalar or broadcastable ndarray."""
    import numpy as np

    P1 = np.uint64(0x9E3779B185EBCA87)
    P2 = np.uint64(0xC2B2AE3D27D4EB4F)
    P3 = np.uint64(0x165667B19E3779F9)
    P4 = np.uint64(0x85EBCA77C2B2AE63)
    P5 = np.uint64(0x27D4EB2F165667C5)
    h = seed + P5 + np.uint64(8)
    k1 = v * P2
    k1 = (k1 << np.uint64(31)) | (k1 >> np.uint64(33))
    k1 = k1 * P1
    h = h ^ k1
    h = ((h << np.uint64(27)) | (h >> np.uint64(37))) * P1 + P4
    h ^= h >> np.uint64(33)
    h *= P2
    h ^= h >> np.uint64(29)
    h *= P3
    h ^= h >> np.uint64(32)
    return h


def _xxh64_int_np(v, seed):
    """numpy twin of Spark's XXH64.hashInt (4-byte input) — bit-exact,
    same pinning as :func:`_xxh64_long_np`."""
    import numpy as np

    P1 = np.uint64(0x9E3779B185EBCA87)
    P2 = np.uint64(0xC2B2AE3D27D4EB4F)
    P3 = np.uint64(0x165667B19E3779F9)
    P5 = np.uint64(0x27D4EB2F165667C5)
    h = seed + P5 + np.uint64(4)
    h = h ^ ((v & np.uint64(0xFFFFFFFF)) * P1)
    h = ((h << np.uint64(23)) | (h >> np.uint64(41))) * P2 + P3
    h ^= h >> np.uint64(33)
    h *= P2
    h ^= h >> np.uint64(29)
    h *= P3
    h ^= h >> np.uint64(32)
    return h


def minhash_band_keys(
    sharr: DataFrame,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 16,
    impl: str = "expr",
) -> DataFrame:
    """(id, band, band_key) from a per-doc hashed-shingle ARRAY frame
    — the banded LSH key construction of :func:`minhash_lsh_pairs`,
    factored out with two bit-identical implementations.

    ``impl='expr'`` (default): the JVM expression construction
    (:func:`minhash_signatures` + the band hash array) — codegen'd
    map-side-combined aggregates, and the MEASURED winner at both
    scales (see below).

    ``impl='arrow'``: one mapInPandas pass — per-shingle family
    hashes, per-doc SIGNED minima, and per-band keys in wrapping
    uint64 numpy via the :func:`_xxh64_long_np`/:func:`_xxh64_int_np`
    twins of Spark's own XXH64; BIT-EQUAL to the expression path
    (pinned in tests/test_dedup.py).  Built on the r12 §7 theory that
    vectorizing the hash family would pay — MEASURED NEGATIVE both
    at sf0.1 (wash: 1.12 vs 1.14s in the full pipeline) and at the
    100x replica (expr 4.3s vs arrow 6-12s min-of-2, same JVM): the
    Arrow round-trip of the shingle arrays costs more than the
    trivial per-element hash work saves, exactly the r12 §8
    pagerank-fold result.  Kept as the equality anchor and the
    recorded negative result.
    """
    rows = num_hashes // bands
    if impl == "expr":
        sh = sharr.select(id_col, F.explode("sha").alias("sh_hash"))
        sig = minhash_signatures(sh, id_col, num_hashes)
        band_arr = F.array(
            *[
                F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)])
                for b in range(bands)
            ]
        )
        return sig.select(
            F.col(id_col), F.posexplode(band_arr).alias("band", "band_key")
        )
    if impl != "arrow":
        raise ValueError(f"unknown minhash band impl: {impl}")

    import numpy as np

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            sharr.schema[id_col],
            T.StructField("band", T.IntegerType(), False),
            T.StructField("band_key", T.LongType()),
        ]
    )
    seeds = np.arange(num_hashes, dtype=np.uint64)

    def gen(batches):
        import pandas as pd

        np.seterr(over="ignore")
        for pdf in batches:
            if not len(pdf):
                continue
            lens = pdf["sha"].map(len).to_numpy(dtype=np.int64)
            keep = lens > 0
            pdf = pdf[keep]
            lens = lens[keep]
            if not len(pdf):
                continue
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in pdf["sha"]]
            ).view(np.uint64)
            # family member i of shingle s: xxhash64(s, i) =
            # hashInt(i, hashLong(s, 42)) — hashLong shared across i
            base = _xxh64_long_np(flat, np.uint64(42))
            fam = _xxh64_int_np(seeds[None, :], base[:, None])
            offs = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=offs[1:])
            # Spark's min() over LongType is a SIGNED comparison —
            # reduce over the int64 view, then hash the same bits
            sig = np.minimum.reduceat(
                fam.view(np.int64), offs, axis=0
            ).view(np.uint64)  # (docs, k)
            # band key b over members [b*rows, ..., b*rows+rows-1]:
            # xxhash64(h0, h1, ...) folds hashLong left-to-right
            keys = np.empty((len(lens), bands), dtype=np.uint64)
            for b in range(bands):
                k = _xxh64_long_np(
                    sig[:, b * rows], np.uint64(42)
                )
                for r in range(1, rows):
                    k = _xxh64_long_np(sig[:, b * rows + r], k)
                keys[:, b] = k
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, bands),
                    "band": np.tile(
                        np.arange(bands, dtype=np.int32), len(lens)
                    ),
                    "band_key": keys.reshape(-1).view(np.int64),
                }
            )

    return sharr.select(id_col, "sha").mapInPandas(gen, out_schema)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    Banding: `bands` bands of `num_hashes/bands` consecutive hashes;
    two documents are candidates iff some band agrees. With the
    defaults (16 bands of 2) a pair at jaccard 0.8 is missed with
    probability (1 - 0.8^2)^16 ≈ 5e-8. Candidates are then verified
    with the exact Jaccard so the output matches jaccard_pairs.

    Scale: signature computation is a linear projection (no shuffle);
    the candidate join shuffles on (band, band_key) — skewed buckets
    split by AQE; the quadratic verify runs only on same-bucket
    survivors, pruned by a semi-join on candidate ids.

    Reuse discipline (ADVICE r1 — the previous persist()s leaked
    cached blocks across calls): the candidate PAIR set — the only
    subtree with multiple consumers (id prune + final pair semi-join)
    — is localCheckpointed once; it is output-sized (pairs, not
    shingles), so materializing it is cheap while recomputing it
    costs a full signature+band pass per consumer (measured r4:
    2.5s vs 3.5s warm at sf0.1; the r2 persist()-everything variant
    was slower than both because it cached the 3M-row shingle set).
    The candidate-id prune carries no broadcast hint — AQE picks
    broadcast vs shuffle semi-join at runtime from the OBSERVED
    candidate-set size, which is exactly the high-dup-rate guard a
    static hint can't give.

    ``max_bucket`` (opt-in) anti-joins away (band, band_key) buckets
    past that many members before the candidate self-join — the
    hot-bucket guard (VERDICT r11 #2): an identical-prefix flood or a
    boilerplate band shared corpus-wide makes one bucket quadratic,
    and the exact verify then pays O(bucket²) shingle joins.  The
    recall trade is documented at :func:`hot_bucket_audit`; default
    None keeps the operator exactly equal to the jaccard oracle.
    """
    # One corpus shingle pass, checkpointed as ARRAYS: the band-key
    # kernel reads it and the verify leg joins it per candidate id —
    # the split+slice+distinct work runs exactly once per action
    # however many consumers read it.
    sharr = (
        shingle_arrays(df, id_col, text_col, n)
        .select(
            id_col, F.transform("sh", lambda s: F.xxhash64(s)).alias("sha")
        )
        .localCheckpoint(eager=False)
    )
    # band keys via the EXPRESSION construction: the vectorized twin
    # (minhash_band_keys impl='arrow') is bit-equal but measured
    # SLOWER at the 100x replica (4.3s vs 6-12s min-of-2, same JVM —
    # the Arrow round-trip of the shingle arrays dwarfs the
    # codegen'd map-side-combined 32-min aggregates; the r12
    # pagerank-fold lesson repeating) and a wash at sf0.1 (1.12 vs
    # 1.14s).  The kernel stays as the equality-pinned negative
    # result.
    band_key = minhash_band_keys(sharr, id_col, num_hashes, bands, impl="expr")
    # b1/b2 below are DIFFERENT projections of this frame, so exchange
    # reuse never fires and the shingle+signature pipeline would run
    # twice inside the candidate join alone (guide §2.4: two consumers,
    # one computation).  The frame is narrow — `bands` rows of three
    # longs per id — so one lazy checkpoint halves the expensive pass
    # (measured 2.6s -> 1.9s on dedup_minhash_lsh at sf0.1).
    band_key = band_key.localCheckpoint(eager=False)
    if max_bucket is not None:
        band_key = _drop_hot_buckets(
            band_key, ["band", "band_key"], max_bucket
        )
    b1 = band_key.select(F.col(id_col).alias("id_1"), "band", "band_key")
    b2 = band_key.select(F.col(id_col).alias("id_2"), "band", "band_key")
    cand = (
        b1.join(b2, ["band", "band_key"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
        # single consumer now (the array verify below) — no checkpoint
    )
    # Exact verification directly on the candidate PAIRS: attach each
    # side's checkpointed shingle-hash array and count the overlap
    # with array_intersect — |A ∩ B| / (|A| + |B| - |A ∩ B|) over the
    # per-document DISTINCT shingle sets, the identical integer counts
    # (and so the identical division) the former inverted-index join
    # produced, without its cand_ids distinct + doc semi-join +
    # re-shingle + gram self-join + two count-attach joins (each a
    # scheduling round over candidate-bounded rows; the whole verify
    # leg measured ~1.1s of the 2.2s pipeline at sf0.1). Candidates
    # are output-bounded, so the pair join is two broadcast-sized
    # attaches against the single shingle pass.
    return _verify_pairs_by_array(cand, sharr, id_col, threshold)


# --------------------------------------------------------------------------
# SimHash (60-bit, md5-nibble hash family)
# --------------------------------------------------------------------------

_SIMHASH_BITS = 60


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, impl: str = "arrow"
) -> DataFrame:
    """60-bit SimHash per document from token md5s: (id, simhash).

    Token weight = occurrence count (the full token array is folded,
    duplicates included); bit b of the signature is the sign of the
    weighted vote over bit b of each token's md5 (first 15 hex
    nibbles => 60 bits, fits a BIGINT). md5 is used (not xxhash64) so
    external engines can reproduce the signature exactly.

    ``impl='arrow'`` (default): one shuffle-free mapInPandas pass —
    per-task token->md5 memo (Zipf: tokens repeat corpus-wide, guide
    §4.5), numpy bit extraction and vote sums.  BIT-IDENTICAL to the
    expression twin by construction: the whole computation is integer
    (md5 nibbles, shifts, counts) with no float anywhere, so there is
    no rounding to re-order — pinned in tests/test_dedup.py.  It also
    removes the token-explode exchange: the r12 plan paid one shuffle
    of (id, 60 partial sums) rows; this pass emits one (id, simhash)
    row per document with zero exchanges — the better 100 TB shape
    (the signature stage becomes a pure map over the corpus scan).

    ``impl='expr'`` — the JVM expression twin the DuckDB oracle
    structurally mirrors: explode tokens, md5 once per token row,
    convert the first 15 hex nibbles to ONE 60-bit long per row
    (single conv), then 60 integer-shift partial sums in a single
    groupBy(id) — map-side combine shrinks the shuffle to one
    61-column row per document. Bit numbering matches the nibble
    definition exactly: bit i lives in hex nibble i//4 at in-nibble
    position i%4, and nibble p of the big-endian 15-nibble number
    sits at integer bit 4*(14-p). (An array-fold version with
    aggregate() was tried and is ~3x slower: higher-order lambdas are
    interpreted, these sum exprs are codegen'd.)
    """
    if impl == "arrow":
        return _simhash_signatures_arrow(df, id_col, text_col)
    if impl != "expr":
        raise ValueError(f"unknown simhash impl: {impl}")
    hexed = (
        df.repartition(F.col(id_col))
        .select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
        )
        .withColumn(
            "bits", F.expr("CAST(conv(substring(md5(__tok), 1, 15), 16, 10) AS BIGINT)")
        )
    )

    def vote(i: int):
        shift = 4 * (14 - i // 4) + (i % 4)
        return F.expr(f"sum(2 * (shiftright(bits, {shift}) & 1) - 1)").alias(f"s{i}")

    votes = hexed.groupBy(id_col).agg(*[vote(i) for i in range(_SIMHASH_BITS)])
    hash_expr = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(_SIMHASH_BITS)
    )
    return votes.select(id_col, F.expr(hash_expr).alias("simhash"))


def _simhash_signatures_arrow(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Shuffle-free SimHash (the ``impl='arrow'`` path of
    :func:`simhash_signatures` — see its docstring for the equality
    argument).  NULL-text rows drop, exactly as the expression twin's
    explode of a NULL token array emits no rows for them."""
    import numpy as np

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("simhash", T.LongType())]
    )
    shifts = np.array(
        [4 * (14 - i // 4) + (i % 4) for i in range(_SIMHASH_BITS)],
        dtype=np.uint64,
    )
    bit_vals = np.uint64(1) << np.arange(_SIMHASH_BITS, dtype=np.uint64)

    def gen(batches):
        import hashlib

        import pandas as pd

        memo: dict = {}
        for pdf in batches:
            ids, sigs = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str):
                    continue
                toks = text.split(" ")
                vals = np.empty(len(toks), dtype=np.uint64)
                for j, w in enumerate(toks):
                    v = memo.get(w)
                    if v is None:
                        v = int(
                            hashlib.md5(w.encode("utf-8")).hexdigest()[:15],
                            16,
                        )
                        memo[w] = v
                    vals[j] = v
                bits = (vals[:, None] >> shifts) & np.uint64(1)
                votes = 2 * bits.astype(np.int64).sum(axis=0) - len(toks)
                sigs.append(int(bit_vals[votes > 0].sum()))
                ids.append(did)
            yield pd.DataFrame({id_col: ids, "simhash": sigs})

    from palegislature_spark.operators.multimodal import _fan_out

    return _fan_out(df, id_col, text_col).mapInPandas(gen, out_schema)


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    chunks: int = 4,
    band_chunks: int | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance <= max_hamming.

    Banded search, generalized pigeonhole (Manku et al., WWW'07): the
    60-bit signature splits into ``m`` chunks; a pair within Hamming
    distance ``k`` disturbs at most ``k`` chunks, leaving ``m - k``
    intact — so with band size ``j <= m - k`` every qualifying pair
    agrees on ALL ``j`` chunks of at least one of the C(m, j) index
    combinations. Candidates join on (band, chunk values) and the
    exact popcount verifies, so the OUTPUT is band-invariant; banding
    only controls candidate density:

    * ``band_chunks=1`` (classic one-chunk bands, m = k+1): few wide
      bands, but each key is only ~60/(k+1) bits — bucket collision
      density grows quadratically with the corpus (the 39x second-
      decade growth VERDICT r5 flagged).
    * ``band_chunks=2`` (m = k+2): C(m, 2) bands keyed on ~2x the
      bits — candidate pairs shrink by ~2^width/(m-1) (~30x at k=6)
      for a (m-1)/2-fold explode increase. The sub-quadratic lever.
    * ``band_chunks=j >= 3`` (m = k+j): the same pigeonhole scheme at
      any rung — a pair within Hamming ``k`` leaves ``m - k >= j``
      chunks intact, so SOME j-subset of chunks matches exactly and
      the C(m, j) band keys (~j*60/m bits each) catch it. Each rung
      up multiplies the explode by ~(m-1)/j but divides bucket
      collision density by another ~2^(60/m) — the knob a 10^9-doc
      corpus turns when C(m, 2) candidate density rises again
      (Manku et al. §3: the index-combination count is a tunable).
    * ``band_chunks=None``: auto — 1 below ~20k docs (explode cost
      dominates), 2 to ~1M docs, 3 above (collision density per
      j=2 key ~ n^2 * C(k+2,2) / 2^(2*60/(k+2)) passes ~10^9
      candidates near a million docs at k=6 — thresholds derived in
      BASELINE.md "SimHash banding rungs"); one count() action to
      size it, same policy as ivf_assignments(n_lists=None) — pass
      ``n_docs`` to skip the count when the cardinality is already
      known (semantic_dedup's n_vectors precedent).

    ``band_chunks`` must satisfy ``band_chunks + max_hamming <= 60``
    (every chunk needs at least one bit).
    """
    sig = simhash_signatures(df, id_col, text_col)
    return hamming_pairs(
        sig,
        id_col,
        "simhash",
        max_hamming=max_hamming,
        min_chunks=chunks,
        band_chunks=band_chunks,
        n_rows=n_docs,
    )


def chunk_plan(
    n_bits: int, max_hamming: int, band_chunks: int, min_chunks: int = 4
) -> tuple[list[int], list[int]]:
    """(widths, offsets) of the generalized-pigeonhole chunking used
    by :func:`hamming_pairs` — ``max(min_chunks, max_hamming +
    band_chunks)`` chunks, uneven widths fine for the pigeonhole
    argument (the first ``n_bits % m`` chunks get the extra bit).
    Public so SQL oracles can replay the exact band keys."""
    need = max(min_chunks, max_hamming + band_chunks)
    base, extra = divmod(n_bits, need)
    widths = [base + (1 if i < extra else 0) for i in range(need)]
    offsets = [sum(widths[:i]) for i in range(need)]
    return widths, offsets


def hamming_band_keys(
    sig: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 6,
    n_bits: int = _SIMHASH_BITS,
    min_chunks: int = 4,
    band_chunks: int = 1,
) -> DataFrame:
    """The banded candidate KEYS of :func:`hamming_pairs`, exposed:
    one row per (id, band) with the band's chunk values ``v1..vB`` —
    the exact frame the candidate self-join buckets on.  This is the
    observability seam for :func:`hot_bucket_audit`: a degenerate key
    (a constant signature region shared corpus-wide) shows up here as
    one bucket holding a large fraction of ids, BEFORE the join goes
    quadratic on it."""
    if band_chunks < 1 or band_chunks + max_hamming > n_bits:
        raise ValueError(
            f"band_chunks must be >= 1 with band_chunks + max_hamming <= "
            f"{n_bits}; got {band_chunks!r}"
        )
    widths, offsets = chunk_plan(n_bits, max_hamming, band_chunks, min_chunks)
    need = len(widths)

    def chunk_val(i: int) -> F.Column:
        return F.expr(
            f"shiftright({hash_col}, {offsets[i]}) & {(1 << widths[i]) - 1}"
        )

    from itertools import combinations

    bands = [
        F.struct(
            F.lit(b).alias("band"),
            *[chunk_val(ix).alias(f"v{t + 1}") for t, ix in enumerate(combo)],
        )
        for b, combo in enumerate(combinations(range(need), band_chunks))
    ]
    return sig.select(
        id_col, hash_col, F.explode(F.array(*bands)).alias("__b")
    ).select(id_col, hash_col, "__b.*")


def hot_bucket_audit(
    keys: DataFrame,
    key_cols: Sequence[str],
    id_col: str,
    threshold: int = 1000,
) -> DataFrame:
    """Bucket-cardinality alarm for banded candidate joins (VERDICT
    r11 #2): per bucket key, the member count and the pair count the
    self-join would expand it to — rows only for buckets at or above
    ``threshold`` (violations-as-data, the er/validate.py idiom).

    Why this exists: a degenerate band key — a constant signature
    region shared corpus-wide, like the audio pad-suffix collision
    floor (commit a667848) — turns a banded join silently QUADRATIC
    in that bucket; at 100 TB the first symptom is an executor OOM,
    not a wrong answer.  This audit is one map-side-combined
    aggregation over the key frame (O(keys), no join), so it can run
    ahead of every pair join as a gate: alarm rows mean "salt, raise
    the band resolution, or cap this bucket" before paying the join.
    The ``max_bucket`` parameter of :func:`hamming_pairs` /
    :func:`minhash_lsh_pairs` is the enforcement half."""
    n = F.count(F.lit(1))
    return (
        keys.groupBy(*key_cols)
        .agg(
            n.cast("long").alias("n_ids"),
            (n * (n - 1) / 2).cast("long").alias("n_pairs"),
        )
        .filter(F.col("n_ids") >= threshold)
    )


def _drop_hot_buckets(chunked: DataFrame, key_cols: list, max_bucket: int):
    """Anti-join away buckets past ``max_bucket`` members — the
    enforcement half of :func:`hot_bucket_audit`.  Dropping a bucket
    is a RECALL trade (pairs whose only agreeing band is the hot one
    are lost), which is the right trade exactly when the bucket is a
    collision floor: its pairs are overwhelmingly non-dups sharing a
    degenerate key, and the alternative is a quadratic join blow-up.
    The aggregation shuffles on the same key as the join it guards,
    map-side combined."""
    hot = (
        chunked.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_bucket)
        .select(*key_cols)
    )
    return chunked.join(hot, list(key_cols), "left_anti")


def hamming_pairs(
    sig: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 6,
    n_bits: int = _SIMHASH_BITS,
    min_chunks: int = 4,
    band_chunks: int | None = None,
    n_rows: int | None = None,
    max_bucket: int | None = None,
    ckpt_keys: bool | None = None,
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` over ANY <=60-bit
    integer signature column — the banded generalized-pigeonhole
    search :func:`simhash_pairs` documents (Manku et al., WWW'07),
    factored out (VERDICT r10 #5) so non-text signatures plug in: the
    image perceptual hash (operators/multimodal.py ``image_ahash``)
    rides the identical machinery.  Output is band-invariant — the
    exact popcount verifies every candidate — and the rung ladder /
    auto policy is exactly simhash_pairs' (its docstring is the
    reference; ``n_rows`` skips the sizing count() when cardinality
    is known).

    ``max_bucket`` (opt-in) drops candidate buckets past that many
    members before the self-join — the hot-bucket guard (VERDICT r11
    #2; see :func:`hot_bucket_audit` for the measurement half and the
    recall trade).  Default None keeps the operator exact over its
    band construction, as every oracle-pinned caller requires.
    """
    if band_chunks is None:
        if n_rows is None:
            n_rows = sig.count()
        band_chunks = 1 if n_rows < 20_000 else (2 if n_rows < 1_000_000 else 3)
    chunked = hamming_band_keys(
        sig, id_col, hash_col, max_hamming, n_bits, min_chunks, band_chunks
    )
    # Both sides of the candidate self-join derive from `chunked` with
    # DIFFERENT projections, so exchange reuse never fires and the whole
    # signature subtree (for the multimodal callers: synthesis + real
    # codec decode + fingerprint) executes TWICE per action.  One lazy
    # checkpoint of the band-key frame halves that (guide §2.4: two
    # consumers, one computation; measured 2.9s -> 1.7s on
    # binary_video_fingerprint at sf0.1) — but the trade FLIPS when the
    # key frame is large and the signature pass is cheap: at the 100x
    # replica (500k docs, band_chunks=2 -> 14M key rows) materializing
    # the frame costs more than recomputing the arrow SimHash pass
    # (27.7s vs 24.1s min-of-2, this session).  ``ckpt_keys=None``
    # auto-gates on the estimated key-frame row count (env-overridable
    # threshold); callers whose signatures are EXPENSIVE to recompute
    # (the multimodal codec decodes) pass ckpt_keys=True explicitly.
    if ckpt_keys is None:
        import math

        max_keys = int(
            os.environ.get("SPARK_GRAFT_HAMMING_CKPT_MAX_KEYS", "2000000")
        )
        widths, _ = chunk_plan(n_bits, max_hamming, band_chunks, min_chunks)
        n_bands = math.comb(len(widths), band_chunks)
        ckpt_keys = n_rows is None or n_rows * n_bands <= max_keys
    if ckpt_keys:
        chunked = chunked.localCheckpoint(eager=False)
    key_cols = ["band"] + [f"v{t + 1}" for t in range(band_chunks)]
    if max_bucket is not None:
        chunked = _drop_hot_buckets(chunked, key_cols, max_bucket)
    c1 = chunked.select(
        F.col(id_col).alias("id_1"), F.col(hash_col).alias("h1"), *key_cols
    )
    c2 = chunked.select(
        F.col(id_col).alias("id_2"), F.col(hash_col).alias("h2"), *key_cols
    )
    cand = (
        c1.join(c2, key_cols)
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", "h1", "h2")
        .distinct()
    )
    return cand.select(
        "id_1",
        "id_2",
        F.expr("bit_count(h1 ^ h2)").cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


# --------------------------------------------------------------------------
# Incremental MinHash-LSH (index the corpus once, dedup arriving batches)
# --------------------------------------------------------------------------


def minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
) -> DataFrame:
    """(id, band, band_key) rows — the persistable LSH index of a
    corpus. Build once per corpus generation (write to Parquet,
    partition/bucket by (band, band_key) at scale) and dedup every
    arriving batch against it WITHOUT touching historical text: the
    full-corpus signature pass is the expensive stage, and an
    incremental pipeline must not repeat it per batch."""
    sharr = shingle_arrays(df, id_col, text_col, n).select(
        id_col, F.transform("sh", lambda s: F.xxhash64(s)).alias("sha")
    )
    return minhash_band_keys(sharr, id_col, num_hashes, bands, impl="expr")


# --------------------------------------------------------------------------
# Persisted MinHash index lifecycle: save -> append xN -> compact
# --------------------------------------------------------------------------

_BAND_GEN_MARKER = "_BANDGEN-"


def _band_gen_current(spark, base: str) -> int | None:
    """Highest committed generation number, or None (no index)."""
    from palegislature_spark.sources.merge import _hadoop_fs

    fs, HPath = _hadoop_fs(spark, base)
    if not fs.exists(HPath(base)):
        return None
    gens = []
    for st in fs.listStatus(HPath(base)):
        name = st.getPath().getName()
        if name.startswith(_BAND_GEN_MARKER):
            try:
                gens.append(int(name[len(_BAND_GEN_MARKER):]))
            except ValueError:
                continue
    return max(gens) if gens else None


def _band_gen_commit(spark, base: str, gen: int) -> None:
    """Atomically publish generation ``gen``: write the marker to a tmp
    name, then rename to the fresh ``_BANDGEN-<gen>`` — rename to a
    non-existent destination is atomic on HDFS/local (the
    sources/merge.py manifest protocol, minimal form). Generations
    older than the PREVIOUS one are pruned after the commit — the
    one-generation retention window that lets a reader mid-scan on
    N-1 survive the commit of N."""
    from palegislature_spark.sources.merge import _hadoop_fs

    fs, HPath = _hadoop_fs(spark, base)
    tmp = HPath(f"{base}/{_BAND_GEN_MARKER[:-1]}.tmp")
    out = fs.create(tmp, True)
    out.close()
    fs.rename(tmp, HPath(f"{base}/{_BAND_GEN_MARKER}{gen:06d}"))
    for st in fs.listStatus(HPath(base)):
        name = st.getPath().getName()
        old = None
        if name.startswith(_BAND_GEN_MARKER):
            old = name[len(_BAND_GEN_MARKER):]
        elif name.startswith("gen-"):
            old = name[4:]
        if old is not None:
            try:
                g = int(old)
            except ValueError:
                continue
            if g < gen - 1:
                fs.delete(st.getPath(), True)


def save_minhash_index(index: DataFrame, path: str) -> None:
    """Persist a :func:`minhash_index` result as generation 0 of a
    long-lived on-disk index: ``path/gen-000000/*.parquet`` plus an
    atomically-committed generation marker. Layout contract: readers
    (:func:`load_minhash_index`) resolve the highest committed marker,
    so a generation directory becomes visible only once fully written
    — a crashed save/compact leaves the previous generation live."""
    spark = index.sparkSession
    base = path.rstrip("/")
    index.repartition("band").write.mode("overwrite").parquet(
        f"{base}/gen-000000"
    )
    _band_gen_commit(spark, base, 0)


_DELTA_MARKER = "_BANDDELTA-"


def _folded_high_water(fs, HPath, gen_dir: str) -> int:
    """Highest delta batch id folded into ``gen_dir`` (the
    ``_FOLDED-<id>`` file written by :func:`compact_minhash_index`
    before the generation commits, so it becomes visible atomically
    WITH the generation), or -1. Readers ignore committed deltas at or
    below this mark — which is what makes the compact's
    delete-after-commit of folded deltas pure garbage collection: a
    crash between commit and deletion leaves stale deltas that are
    already invisible."""
    if not fs.exists(HPath(gen_dir)):
        return -1
    best = -1
    for st in fs.listStatus(HPath(gen_dir)):
        name = st.getPath().getName()
        if name.startswith("_FOLDED-"):
            try:
                best = max(best, int(name[len("_FOLDED-"):]))
            except ValueError:
                continue
    return best


def _committed_delta_ids(fs, HPath, base: str) -> list[int]:
    """Batch ids with a committed ``_BANDDELTA-<id>`` marker."""
    ids = []
    for st in fs.listStatus(HPath(base)):
        name = st.getPath().getName()
        if name.startswith(_DELTA_MARKER):
            try:
                ids.append(int(name[len(_DELTA_MARKER):]))
            except ValueError:
                continue
    return ids


def append_minhash_index_delta(
    spark,
    path: str,
    new_docs: DataFrame,
    batch_id: int,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
) -> bool:
    """Streaming-grade append: index a micro-batch as its OWN
    ``delta-<batch_id>`` directory published by an atomic marker —
    the crash-safe twin of :func:`append_minhash_index` (which
    appends part-files into the live generation directly and so
    relies on a single well-behaved batch writer).

    Idempotence under foreachBatch's at-least-once contract: a replay
    whose ``batch_id`` already has a committed marker — or is already
    folded into the current generation (``_FOLDED`` high-water) — is
    a no-op, so replays never double-index a window.  A crash between
    the delta write and the marker rename leaves an UNCOMMITTED
    directory that readers ignore and the replay overwrites.  Returns
    True iff the batch was newly committed.  O(batch) work per batch;
    :func:`compact_minhash_index` folds accumulated deltas back into
    one band-clustered generation."""
    from palegislature_spark.sources.merge import _hadoop_fs

    base = path.rstrip("/")
    gen = _band_gen_current(spark, base)
    if gen is None:
        raise ValueError(f"no committed MinHash index at {base}")
    fs, HPath = _hadoop_fs(spark, base)
    marker = HPath(f"{base}/{_DELTA_MARKER}{batch_id:06d}")
    if fs.exists(marker):
        return False
    if batch_id <= _folded_high_water(fs, HPath, f"{base}/gen-{gen:06d}"):
        return False
    keys = minhash_index(new_docs, id_col, text_col, n, num_hashes, bands)
    keys.repartition("band").write.mode("overwrite").parquet(
        f"{base}/delta-{batch_id:06d}"
    )
    tmp = HPath(f"{base}/{_DELTA_MARKER[:-1]}.tmp")
    out = fs.create(tmp, True)
    out.close()
    fs.rename(tmp, marker)
    return True


def load_minhash_index(spark, path: str) -> DataFrame:
    """The current committed generation's (id, band, band_key) rows —
    the ``index`` input of :func:`minhash_lsh_pairs_incremental` —
    UNIONed with every committed streaming delta the generation has
    not yet folded (``_FOLDED`` high-water; uncommitted delta
    directories are invisible by construction)."""
    from palegislature_spark.sources.merge import _hadoop_fs

    base = path.rstrip("/")
    gen = _band_gen_current(spark, base)
    if gen is None:
        raise ValueError(f"no committed MinHash index at {base}")
    gen_dir = f"{base}/gen-{gen:06d}"
    fs, HPath = _hadoop_fs(spark, base)
    fw = _folded_high_water(fs, HPath, gen_dir)
    paths = [gen_dir] + [
        f"{base}/delta-{d:06d}"
        for d in sorted(_committed_delta_ids(fs, HPath, base))
        if d > fw
    ]
    return spark.read.parquet(*paths)


def append_minhash_index(
    spark,
    path: str,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
) -> None:
    """Index a NEW document batch into the current generation without
    touching historical rows: one signature pass over the batch, one
    parquet append — O(batch) per batch, the ivf_append pattern on the
    band-key index. Ids are append-only (the caller dedups re-derived
    ids via the merge layer first). Repeated appends accumulate
    per-batch files; :func:`compact_minhash_index` is the maintenance
    pass that folds them back into one band-clustered dataset.
    Single-writer convention, like every file-format table here
    without a locking catalog."""
    base = path.rstrip("/")
    gen = _band_gen_current(spark, base)
    if gen is None:
        raise ValueError(f"no committed MinHash index at {base}")
    keys = minhash_index(new_docs, id_col, text_col, n, num_hashes, bands)
    keys.repartition("band").write.mode("append").parquet(
        f"{base}/gen-{gen:06d}"
    )


def compact_minhash_index(spark, path: str) -> dict:
    """Fold the accumulated per-batch band files into ONE
    band-clustered dataset (VERDICT r9 #5): read the current
    generation PLUS every committed-but-unfolded streaming delta
    (:func:`append_minhash_index_delta`), repartition on ``band`` and
    sort each partition by
    (band, band_key) — so row-group min/max stats prune candidate
    lookups and the file count drops from O(appended batches x
    partitions) back to O(bands) — then publish as generation N+1 via
    the atomic marker commit (:func:`_band_gen_commit`; crash before
    the commit leaves N live and untouched, the
    sources/merge.py:275 staging-then-commit shape at directory
    grain). Row-set-preserving by construction — a pure
    repartition+rewrite; the pre/post candidate-equality test in
    tests/test_dedup_incremental.py pins it.

    Returns {"generation", "files_before", "files_after", "rows"}.
    """
    from palegislature_spark.sources.merge import _hadoop_fs

    base = path.rstrip("/")
    gen = _band_gen_current(spark, base)
    if gen is None:
        raise ValueError(f"no committed MinHash index at {base}")
    fs, HPath = _hadoop_fs(spark, base)

    def n_files(d: str) -> int:
        return sum(
            1
            for st in fs.listStatus(HPath(d))
            if st.getPath().getName().startswith("part-")
        )

    cur_dir = f"{base}/gen-{gen:06d}"
    nxt_dir = f"{base}/gen-{gen + 1:06d}"
    fw = _folded_high_water(fs, HPath, cur_dir)
    delta_ids = sorted(
        d for d in _committed_delta_ids(fs, HPath, base) if d > fw
    )
    # fold EXACTLY the pinned delta_ids snapshot — re-listing via
    # load_minhash_index would race a concurrent streaming commit: a
    # delta landing between the two listings would be folded into
    # gen N+1 yet excluded from its _FOLDED high-water and from GC,
    # so readers would double-count its rows forever (ADVICE r11)
    cur = spark.read.parquet(
        cur_dir, *[f"{base}/delta-{d:06d}" for d in delta_ids]
    )
    rows = cur.count()
    (
        cur.repartition("band")
        .sortWithinPartitions("band", "band_key")
        .write.mode("overwrite")
        .parquet(nxt_dir)
    )
    # the folded high-water rides INSIDE the new generation directory,
    # so it becomes visible atomically with the generation commit;
    # folded deltas are then invisible to readers even before they are
    # garbage-collected below (crash-safe delete-after-commit)
    new_fw = max([fw] + delta_ids)
    if new_fw >= 0:
        out = fs.create(HPath(f"{nxt_dir}/_FOLDED-{new_fw:06d}"), True)
        out.close()
    files_before = n_files(cur_dir) + sum(
        n_files(f"{base}/delta-{d:06d}") for d in delta_ids
    )
    _band_gen_commit(spark, base, gen + 1)
    # GC by the committed high-water, not just this pass's delta_ids:
    # a crash between a previous commit and its GC loop leaves folded
    # deltas at/below the high-water that no later pass would revisit
    # if GC were keyed on the current delta_ids — invisible to readers
    # but a permanent disk/listing leak (ADVICE r11)
    for d in _committed_delta_ids(fs, HPath, base):
        if d <= new_fw:
            fs.delete(HPath(f"{base}/delta-{d:06d}"), True)
            fs.delete(HPath(f"{base}/{_DELTA_MARKER}{d:06d}"), False)
    return {
        "generation": gen + 1,
        "files_before": files_before,
        "files_after": n_files(nxt_dir),
        "rows": rows,
    }


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    corpus: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs INVOLVING the new batch: new-vs-corpus and
    new-vs-new, exactly verified — equal to the pairs of
    ``minhash_lsh_pairs(corpus ∪ new)`` that touch a new id (asserted
    in tests/test_dedup_incremental.py). Ids must be unique across
    corpus and batch.

    Cost shape, which is the point: shingles + signatures are computed
    for the BATCH only; the corpus side contributes its prebuilt
    ``index`` rows to the candidate join, and only the candidate
    corpus documents (id-pruned semi-join, typically a vanishing
    fraction) are re-shingled for the exact verify. Per-batch work is
    O(batch + candidates), not O(corpus).
    """
    new_keys = minhash_index(
        new_docs, id_col, text_col, n, num_hashes, bands
    )
    # k1/k2 are different projections of the batch key frame — one
    # lazy checkpoint keeps the batch shingle+signature pipeline from
    # running twice in the candidate join (guide §2.4; the
    # minhash_lsh_pairs band_key discipline).
    new_keys = new_keys.localCheckpoint(eager=False)
    k1 = new_keys.select(F.col(id_col).alias("id_a"), "band", "band_key")
    k2 = new_keys.select(F.col(id_col).alias("id_b"), "band", "band_key")
    old = index.select(F.col(id_col).alias("id_b"), "band", "band_key")
    cand = (
        k1.join(k2.unionByName(old), ["band", "band_key"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_1"),
            F.greatest("id_a", "id_b").alias("id_2"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    cand_ids = (
        cand.select(F.col("id_1").alias(id_col))
        .union(cand.select("id_2"))
        .distinct()
    )
    # shingle ONLY candidate docs (batch or corpus): one union, one
    # semi-join prune, then the candidate-bounded shingle ARRAYS,
    # checkpointed once; the verify is the array-intersect path
    # (bit-identical Jaccard, see _verify_pairs_by_array) instead of
    # the inverted-index join chain
    touched = new_docs.select(id_col, text_col).unionByName(
        corpus.select(id_col, text_col)
    )
    sharr = (
        shingle_arrays(
            touched.join(cand_ids, id_col, "left_semi"), id_col, text_col, n
        )
        .select(
            id_col, F.transform("sh", lambda s: F.xxhash64(s)).alias("sha")
        )
        .localCheckpoint(eager=False)
    )
    return _verify_pairs_by_array(cand, sharr, id_col, threshold)

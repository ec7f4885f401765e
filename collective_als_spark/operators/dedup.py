"""Deduplication operators for large-scale training-data pipelines.

Five families (SURVEY §2.11 / BASELINE north star), all shuffle-
conscious and collect-free:

  exact        — content-hash groupBy; one shuffle on the hash.
  minhash+LSH  — shingle → k salted-md5 minhashes → band buckets →
                 candidate pairs via self-join on (band, band_hash).
                 Banding keeps the self-join linear-ish: only docs
                 sharing a band bucket meet, never a full cross join.
  simhash      — 32-bit sign-aggregated fingerprint; near-dups share
                 fingerprints (or low Hamming distance).
  n-gram Jaccard — exact set overlap on shingles via explode +
                 self-join on shingle + groupBy pair.
  embedding cosine — near-dup pairs above a cosine threshold; exact
                 (block nested loop) at small scale, LSH-bucketed at
                 100 TB (see similarity.py).

All hashes are md5-derived → every operator is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from collective_als_spark.functions.text import shingles, word_hash


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, content_hash, group_size, is_dup) — exact duplicates share
    an md5; one hash-shuffle, map-side combinable."""
    h = F.md5(F.col(text_col)).alias("content_hash")
    hashed = df.select(F.col(id_col), h)
    sizes = hashed.groupBy("content_hash").agg(F.count(F.lit(1)).alias("group_size"))
    return hashed.join(sizes, "content_hash").select(
        id_col,
        "content_hash",
        "group_size",
        (F.col("group_size") > 1).alias("is_dup"),
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 8, shingle_n: int = 3
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) — min over shingles of 32-bit slices of
    salted md5(seed || shingle).

    Slices of a cryptographic hash are independent uniform bits, so
    8-hex-char (32-bit) slices give ``num_hashes`` minwise permutations
    from ceil(k/4) md5 evaluations per shingle instead of k — md5 is
    the dominant cost of the signature pass at scale. Lexicographic min
    on fixed-width hex equals numeric min of the underlying bits, and
    identical strings minimize identically in any engine (the DuckDB
    oracle spells the same substr(md5(...)) expressions).

    MAP-ONLY (r04): the per-document min runs as ``array_min`` over
    the in-row shingle array instead of explode + groupBy — the
    signature pass that previously shuffled the entire shingle frame
    (rows = corpus shingle count) now emits one row per document with
    zero exchanges, the same rewrite that took winnowing to
    map-only. Documents with no shingles (< shingle_n words) are
    filtered, matching the explode form's semantics (they produced no
    groupBy rows).
    """
    from collective_als_spark.sources.testdata import spread

    n_salts = -(-num_hashes // 4)  # 4 x 8-hex slices per md5
    arr = shingles(F.col(text_col), shingle_n)
    # the salted-md5 chain below is the dominant map cost; make sure it
    # runs at core parallelism (no-op when the scan already splits)
    with_arr = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), arr.alias("_sarr")
    ).filter(F.size("_sarr") > 0)

    # single-argument lambdas with salt/slice captured via enclosing
    # scope — a two-arg lambda would make F.transform bind the second
    # parameter to the ARRAY INDEX
    def salted_hashes(j: int):
        prefix = f"{j}|"
        return F.transform(
            F.col("_sarr"), lambda s: F.md5(F.concat(F.lit(prefix), s))
        )

    def slice_min(harr_name: str, i: int):
        pos = 1 + 8 * (i % 4)
        return F.array_min(
            F.transform(F.col(harr_name), lambda h: F.substring(h, pos, 8))
        )

    with_hashes = with_arr.select(
        F.col(id_col),
        *[salted_hashes(j).alias(f"_harr{j}") for j in range(n_salts)],
    )
    mins = [
        slice_min(f"_harr{i // 4}", i).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return with_hashes.select(F.col(id_col), *mins)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, num_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one minhash band.

    Scale path: the self-join key is (band_idx, band_hash) — docs only
    meet within a bucket, so skew is bounded by bucket size, not corpus
    size; AQE skew-join splits hot buckets.
    """
    n_bands = num_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"mh_{b * band_size + j}") for j in range(band_size)]
        # the concatenated minhashes ARE the bucket key — re-hashing
        # them buys nothing (fixed-width inputs, no skew change)
        bands.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("|", *cols).alias("bh"))
        )
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bd")
    ).select(F.col(id_col), F.col("bd.band").alias("band"), F.col("bd.bh").alias("bh"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """(id, simhash) — sign of per-bit vote sums over word hashes.

    MAP-ONLY (r04): the per-bit ±1 vote (as 2·sum(bit) > n — the r02
    codegen-shrinking identity) folds over the IN-ROW word-hash array
    with one ``aggregate`` per bit, replacing the explode +
    32-aggregate groupBy — the word frame never shuffles and the
    output is one row per document straight off the scan.
    """
    from collective_als_spark.sources.testdata import spread

    harr = F.transform(
        F.split(F.col(text_col), " "), lambda w: word_hash(w, bits=bits)
    )
    # per-word md5 + 32 aggregate folds dominate; run at core
    # parallelism (no-op when the scan already splits)
    per_doc = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), harr.alias("_harr"), F.size(harr).alias("_n")
    ).filter(F.col("_n") > 0)

    def vote(b: int):
        return F.aggregate(
            F.col("_harr"),
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1)),
        )

    sig: Column = F.lit(0).cast("bigint")
    for b in range(bits):
        sig = sig + F.when(
            vote(b) * 2 > F.col("_n"), F.lit(2**b).cast("bigint")
        ).otherwise(0)
    return per_doc.select(F.col(id_col), sig.alias("simhash"))


def simhash_neardup_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    bits: int = 32,
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a < id_b, hamming) pairs with Hamming distance <=
    ``max_hamming`` between ``bits``-wide simhash fingerprints.

    Banded exactly like minhash-LSH: split the fingerprint into
    ``n_bands`` contiguous bit bands and self-join on (band, band_key)
    — candidates only meet inside a bucket, never all-pairs. With
    ``max_hamming < n_bands`` the pigeonhole principle makes recall
    exact: <= max_hamming differing bits cannot touch every band, so
    every qualifying pair shares at least one intact band. The final
    ``bit_count(a XOR b)`` filter drops band-collision false positives.
    """
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs more bands than {n_bands} "
            "for exact recall (pigeonhole requires max_hamming < n_bands)"
        )
    width = bits // n_bands
    mask = (1 << width) - 1
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col(sim_col), b * width)
            .bitwiseAND(F.lit(mask))
            .alias("bk"),
        )
        for b in range(n_bands)
    ]
    banded = signatures.select(
        F.col(id_col), F.col(sim_col), F.explode(F.array(*bands)).alias("bd")
    ).select(
        F.col(id_col),
        F.col(sim_col),
        F.col("bd.band").alias("band"),
        F.col("bd.bk").alias("bk"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{sim_col}").alias("_sa"),
            F.col(f"b.{sim_col}").alias("_sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return (
        pairs.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _distinct_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
    max_df: int | None,
) -> DataFrame:
    """(id, s, n_sh) distinct shingle rows with set sizes attached.

    Within-document dedup is ``array_distinct`` (an in-row array op)
    and the set size is ``size(arr)`` BEFORE the explode, so the
    unguarded frame is map-only: zero shuffles, no ``distinct()``
    exchange, no id-keyed size window (r03: dropped 2 exchanges from
    every shingle-join query). With the hot-shingle guard active, the
    DF window shares the downstream self-join's shingle-keyed exchange
    and set sizes are recounted post-prune so Jaccard/containment stay
    consistent over the pruned sets."""
    arr = F.array_distinct(shingles(F.col(text_col), shingle_n))
    sh = df.select(F.col(id_col), arr.alias("_arr")).select(
        F.col(id_col),
        F.explode("_arr").alias("s"),
        F.size("_arr").alias("n_sh"),
    )
    if max_df is not None:
        sh = (
            sh.withColumn("_df", F.count(F.lit(1)).over(Window.partitionBy("s")))
            .filter(F.col("_df") <= max_df)
            .drop("_df")
            .withColumn("n_sh", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
        )
    return sh


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 5000,
) -> DataFrame:
    """(id_a < id_b, jaccard) for pairs above ``threshold`` on distinct
    word n-gram sets. Exact: explode → self-join on shingle → count
    intersections → join set sizes. The shingle join only pairs docs
    sharing a shingle (inverted-index join), not a cross join.

    ``max_df`` is the hot-shingle guard: a shingle appearing in d
    documents emits d² self-join rows, so one viral boilerplate shingle
    at corpus scale is a hot-key bomb. Shingles with document frequency
    above the cap are treated as stop-shingles and removed from every
    document's set BEFORE sizes are computed (stopword semantics:
    jaccard stays consistent over the pruned sets). The default 5000
    caps any single shingle's join fan-out at 25M rows — spread across
    a cluster — while sitting far above real similarity signal (a
    5000-doc shingle distinguishes nothing) and far above the observed
    max DF at oracle scales (25 at sf0.1), so small-SF hashes are
    unchanged. ``max_df=None`` disables the guard. Callers needing
    exact semantics with NO stop-shingle pruning at scale should use
    :func:`prefix_jaccard_pairs`, whose prefix filter is lossless."""
    sh = _distinct_shingles(df, id_col, text_col, shingle_n, max_df)
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first(F.col("a.n_sh")).alias("n_a"),
            F.first(F.col("b.n_sh")).alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 5000,
) -> DataFrame:
    """Asymmetric set containment on word n-gram sets: for each
    unordered pair sharing a shingle, C(A→B) = |A∩B| / |A| and
    C(B→A) = |A∩B| / |B|; pairs where either direction ≥ ``threshold``
    are emitted. Containment is the subset-duplication detector Jaccard
    misses: a document wholly embedded in a much larger one has high
    containment but low Jaccard (|A∩B|/|A∪B| shrinks with the size
    gap) — the RefinedWeb/Gopher-style companion check to
    :func:`ngram_jaccard_pairs`.

    Same inverted-index self-join skeleton and hot-shingle ``max_df``
    guard as the Jaccard join (one d²-bounded shuffle on the shingle,
    stop-shingle pruning above the cap); the one unordered join row per
    pair carries both set sizes, so both directions come from a single
    groupBy — no second join, no direction-doubled fan-out."""
    sh = _distinct_shingles(df, id_col, text_col, shingle_n, max_df)
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first(F.col("a.n_sh")).alias("n_a"),
            F.first(F.col("b.n_sh")).alias("n_b"),
        )
        .withColumn("cont_ab", F.round(F.col("n_inter") / F.col("n_a"), 6))
        .withColumn("cont_ba", F.round(F.col("n_inter") / F.col("n_b"), 6))
        .filter(
            (F.col("cont_ab") >= threshold) | (F.col("cont_ba") >= threshold)
        )
        .select("id_a", "id_b", "cont_ab", "cont_ba")
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """PPJoin-style prefix-filtered set-similarity join: identical
    output to ``ngram_jaccard_pairs`` (it is a LOSSLESS candidate
    pruning, not an approximation), but candidate pairs meet only on
    PREFIX tokens.

    The filter (Chaudhuri et al.'s SSJoin / Xiao et al.'s PPJoin): sort
    every shingle set by a global rarity order (ascending document
    frequency, shingle text as tie-break); two sets with Jaccard >= t
    must share at least one token among each set's first
    ``n - ceil(t*n) + 1`` tokens. Rare-first ordering makes those
    prefix tokens exactly the ones that index the FEWEST documents, so
    the inverted-index self-join shrinks from the full postings list to
    the rare tail — the standard exact-similarity-join scale technique
    when LSH's false negatives are unacceptable.

    Scale: the per-doc shingle arrays are computed in ONE map-only
    pass (within-doc dedup via ``array_distinct``) and materialized,
    so the document-frequency aggregate and the rarity join both read
    the arrays instead of re-scanning and re-shingling the corpus;
    the prefix index is localCheckpoint'ed once for its self-join;
    document frequency is one vocabulary-sized aggregate; verification
    joins touch only candidate pairs (sum of candidate set sizes, not
    postings^2). No global window: the "global" token order is only a
    comparator inside per-document array sorts.
    """
    arr = F.array_distinct(shingles(F.col(text_col), shingle_n))
    # per-doc shingle arrays materialized ONCE: the document-frequency
    # aggregate and the join side below both consume the exploded
    # frame, and without this each consumer re-ran the full scan +
    # shingle computation (guide §1.2 — measured as two concurrent
    # ~1.2 s stage jobs at sf0.1; the checkpointed array frame is one
    # row per doc, smaller than the exploded postings it derives)
    from collective_als_spark.sources.testdata import spread

    docarr = (
        spread(df.select(F.col(id_col).alias("id"), F.col(text_col)))
        .select("id", arr.alias("_arr"))
        .withColumn("n_sh", F.size("_arr"))
        .localCheckpoint(eager=True)
    )
    sh = docarr.select("id", F.explode("_arr").alias("s"), "n_sh")
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_s"))
    # the ONE materialization: rarity-sorted shingle arrays per doc,
    # reused by the prefix index (map-only explode) and both sides of
    # the verification join (map-only projections)
    per_doc = (
        sh.join(dfreq, "s")
        .groupBy("id")
        .agg(
            F.sort_array(F.collect_list(F.struct("df_s", "s"))).alias("arr"),
            F.first("n_sh").alias("n_sh"),
        )
        .withColumn(
            "p",
            F.col("n_sh")
            - F.ceil(F.lit(threshold) * F.col("n_sh"))
            + F.lit(1),
        )
        .localCheckpoint(eager=True)
    )
    prefix = per_doc.select(
        "id",
        F.explode(
            F.expr("slice(transform(arr, x -> x.s), 1, CAST(p AS INT))")
        ).alias("s"),
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # verify via per-doc array intersection, not an exploded
    # cand×shingles join: candidates × set-size rows made the old
    # verification the widest stage of the plan; array_intersect does
    # the same |A∩B| count map-side on one compact row per pair, and
    # the final groupBy disappears with it. Two stages: intersecting
    # xxhash64 arrays is ~3× cheaper than string arrays (measured), so
    # the hash pass prefilters and only survivors pay the exact string
    # intersection. Lossless: cross-document hash collisions can only
    # OVERcount the overlap (superset of true pairs, removed by the
    # exact stage); the one case that could undercount — a collision
    # WITHIN a document's array — is detected per doc, and such pairs
    # fall back to the trivial min(|A|,|B|) bound, i.e. straight to
    # the exact stage.
    hsets = per_doc.select(
        "id",
        F.expr("transform(arr, x -> xxhash64(x.s))").alias("harr"),
        "n_sh",
    ).withColumn("clean", F.size(F.array_distinct("harr")) == F.col("n_sh"))
    rough = (
        cand.join(
            hsets.select(
                F.col("id").alias("id_a"),
                F.col("harr").alias("harr_a"),
                F.col("n_sh").alias("n_a"),
                F.col("clean").alias("clean_a"),
            ),
            "id_a",
        )
        .join(
            hsets.select(
                F.col("id").alias("id_b"),
                F.col("harr").alias("harr_b"),
                F.col("n_sh").alias("n_b"),
                F.col("clean").alias("clean_b"),
            ),
            "id_b",
        )
        .withColumn(
            "ub",
            F.when(
                F.col("clean_a") & F.col("clean_b"),
                F.size(F.array_intersect("harr_a", "harr_b")),
            ).otherwise(F.least("n_a", "n_b")),
        )
        .filter(F.col("ub") / (F.col("n_a") + F.col("n_b") - F.col("ub")) >= threshold)
        .select("id_a", "id_b")
    )
    sets = per_doc.select(
        "id", F.expr("transform(arr, x -> x.s)").alias("sarr"), "n_sh"
    )
    return (
        rough.join(
            sets.select(
                F.col("id").alias("id_a"),
                F.col("sarr").alias("arr_a"),
                F.col("n_sh").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("id").alias("id_b"),
                F.col("sarr").alias("arr_b"),
                F.col("n_sh").alias("n_b"),
            ),
            "id_b",
        )
        .withColumn("n_inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )

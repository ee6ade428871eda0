"""NearDup: MinHash signatures + LSH band blocking + exact-Jaccard verify.

The reference repo ships only the *outputs* of this half (cluster CSVs,
README.md:367-376); the algorithm is Lee et al. 2021 (arXiv:2107.06499)
§NearDup: 5-word shingles, MinHash, banded LSH targeting Jaccard≈0.8 pairs.

Plan shape (all DataFrame; one vectorized Arrow kernel for signatures):

  docs ── shingle_hashes (Catalyst exprs) ──► (doc_id, sh: array<long>)
       ── mapInPandas numpy kernel        ──► (doc_id, sig: array<long>)
       ── posexplode bands + xxhash64     ──► (doc_id, band, bucket)
       ── groupBy bucket (size-capped)    ──► candidate pairs (self-join)
       ── exact Jaccard on shingle sets   ──► edges(a, b, jaccard >= τ)

Skew: webtext boilerplate creates giant buckets. Buckets above
``max_bucket_size`` pair through the EXACT grid-salted self-join
(``_salted_pairs`` — per-task pair work stays bounded by cap^2, recall
unchanged); only buckets beyond ``salted_bucket_max`` are dropped with a
logged count (the analogue of frequency_threshold, main.rs:914) — their
members still pair via other bands or the exact-dup path. AQE skew-join
splitting handles the rest.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import MINHASH_SEED, MinHashConfig
from ..functions.text import tokens

MERSENNE31 = (1 << 31) - 1  # modulus for (a*h + b) % p permutations


def permutation_params(cfg: MinHashConfig) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(MINHASH_SEED)
    a = rng.randint(1, MERSENNE31, size=cfg.num_perm, dtype=np.int64)
    b = rng.randint(0, MERSENNE31, size=cfg.num_perm, dtype=np.int64)
    return a, b


def doc_shingles(docs: DataFrame, cfg: MinHashConfig, text_col: str = "text") -> DataFrame:
    """(doc_id, sh) with sh = distinct w-token-window hashes; empty docs
    (no tokens) are excluded — no content, no near-dup semantics.

    Shingle identity is the xxhash64 of the window's token-hash slice, not
    of the joined string: the token-hash array is materialized once as a
    column and each window is hash-of-slice — ~20x cheaper than building
    2M+ shingle strings per 12k docs (measured), with identical distinct-set
    semantics up to 64-bit collisions. ``functions.text.shingle_hashes``
    keeps the string-identity variant.
    """
    w = cfg.shingle_words
    d = docs.withColumn(
        "_th", F.transform(tokens(text_col), lambda t: F.xxhash64(t))
    ).filter(F.size("_th") > 0)
    sh = F.array_distinct(
        F.when(
            F.size("_th") >= w,
            F.transform(
                F.sequence(F.lit(1), F.size("_th") - w + 1),
                lambda i: F.xxhash64(F.slice("_th", i, w)),
            ),
        ).otherwise(F.array(F.xxhash64("_th")))
    )
    return d.select("doc_id", sh.alias("sh"))


SIGNATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sig", T.ArrayType(T.LongType(), False), False),
    ]
)


def minhash_signatures(shingled: DataFrame, cfg: MinHashConfig) -> DataFrame:
    """(doc_id, sh) -> (doc_id, sig[num_perm]).

    Vectorized as a loop over the num_perm permutations, each a flat
    contiguous pass ((a*h+b) % p then segment-min via np.minimum.reduceat)
    over every shingle hash in the Arrow batch. Deliberately NOT the
    (n_shingles x num_perm) broadcast matrix: a fresh multi-hundred-MB
    allocation per batch pays first-touch page-fault cost and thrashes the
    allocator; k small reused temporaries stream at SIMD speed.
    """
    a, b = permutation_params(cfg)
    k = cfg.num_perm
    p = np.int64(MERSENNE31)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v = np.empty(0, dtype=np.int64)  # reused scratch across perms
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lens = pdf["sh"].map(len).to_numpy().astype(np.int64)
            allh = np.concatenate(
                [np.asarray(x, dtype=np.int64) for x in pdf["sh"]]
            )
            h32 = allh & np.int64(0x7FFFFFFF)
            starts = np.zeros(len(pdf), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sigs = np.empty((len(pdf), k), dtype=np.int64)
            if len(v) < len(h32):
                v = np.empty(len(h32), dtype=np.int64)
            w = v[: len(h32)]
            for j in range(k):
                # (h*a + b) mod 2^31-1 WITHOUT integer division: for the
                # Mersenne prime p, x mod p folds as (x>>31)+(x&p); two
                # folds bring x < 2^62 down below 2^32, then a conditional
                # subtract finishes. Exactness is pytest-gated against the
                # literal % p (test_minhash_signatures_exact_frame).
                np.multiply(h32, a[j], out=w)
                np.add(w, b[j], out=w)
                for _ in range(2):
                    np.add(w >> np.int64(31), w & p, out=w)
                np.subtract(w, p, out=w, where=w >= p)
                np.subtract(w, p, out=w, where=w >= p)
                sigs[:, j] = np.minimum.reduceat(w, starts)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(), "sig": list(sigs)}
            )

    return shingled.mapInPandas(kernel, SIGNATURE_SCHEMA)


def lsh_buckets(signatures: DataFrame, cfg: MinHashConfig) -> DataFrame:
    """(doc_id, sig) -> (doc_id, band, bucket): one bucket key per band,
    bucket = xxhash64 of the band's signature slice (JVM-side)."""
    r = cfg.rows_per_band
    return signatures.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(cfg.bands - 1)),
                lambda band: F.xxhash64(band, F.slice("sig", band * r + 1, r)),
            )
        ).alias("band", "bucket"),
    )


def candidate_pairs(
    buckets: DataFrame, cfg: MinHashConfig, copartition: bool = True
) -> DataFrame:
    """Distinct (a, b) candidate doc pairs from shared LSH buckets.

    Bucket-size policy (north_rule: explicit salting of skewed buckets):
    buckets up to ``max_bucket_size`` self-join in one reducer task;
    buckets up to ``salted_bucket_max`` go through the EXACT grid-salted
    self-join (``_salted_pairs``) so the quadratic pair work is spread
    over ~k^2/2 tasks instead of one; only buckets beyond that are
    excluded (count observable via ``oversized_buckets``). Sizing is a
    groupBy (map-side partial agg — a boilerplate bucket with 10^8 members
    contributes one row per mapper, not 10^8 rows to one reducer) joined
    back onto the bucket frame; the filtered size frame is small enough
    for AQE to broadcast, and if not, AQE skew-join splitting applies —
    neither holds for a WindowExec partition, which is why this is not a
    count-over-window.
    """
    import os

    from ..plans.caching import probe_rows, scoped_persist
    from .salted_join import driver_bucket_pairs

    # Size-adaptive driver fast path (round-6, same guard family as the
    # driver CC / interval / offsets paths): the bucket frame is tiny next
    # to the corpus (24 B x docs x bands), and at or below the guard the
    # whole candidate machinery — bucket exchange, size agg, join-back,
    # hot probe, pair self-join, salted grid, distinct — collapses into
    # one bounded Arrow pull plus a numpy pass producing the identical
    # distinct pair set (salted_join.driver_bucket_pairs; parity pinned by
    # test). Above the row guard or the pair budget the distributed plan
    # runs unchanged from the same persisted frame (the 100-TB path).
    driver_max = int(os.environ.get("SPARK_GRAFT_LSH_DRIVER_MAX", str(1 << 22)))
    pair_cap = int(
        os.environ.get("SPARK_GRAFT_LSH_DRIVER_PAIR_MAX", str(1 << 22))
    )
    if driver_max > 0:
        raw = scoped_persist(buckets)
        pdf = probe_rows(raw, driver_max)
        if pdf is not None:
            pairs_pdf = driver_bucket_pairs(
                pdf, ["band", "bucket"], cfg.salted_bucket_max, pair_cap
            )
            if pairs_pdf is not None:
                raw.unpersist(blocking=False)
                out = buckets.sparkSession.createDataFrame(
                    pairs_pdf, "a long, b long"
                )
                # driver-resident pairs, memoized: verify_pairs_across can
                # then run the exact-Jaccard verify on the driver too
                out._driver_pairs_pdf = pairs_pdf
                return out
        buckets = raw  # persisted: the distributed plan reuses the cache

    # three consumers (size agg + join-back + both sides of the pair
    # self-join) — persist or the upstream signature kernel re-executes for
    # each. Co-partitioned on the bucket key before caching (same design as
    # suffix.self_similar copartition, BASELINE.md round-4 section): the
    # agg and the self-join then run on the cached partitioning instead of
    # re-exchanging the bucket frame per consumer — at web scale the
    # filtered size frame outgrows broadcast and those exchanges are real.
    if copartition:
        buckets = buckets.repartition("band", "bucket")
    buckets = scoped_persist(buckets)
    # consumed twice (fast-path filter + hot-bucket filter): persist the
    # tiny size frame rather than re-aggregating the bucket frame per use
    sizes = scoped_persist(
        buckets.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("bsize")
        )
    )
    sized = buckets.join(
        sizes.filter(
            (F.col("bsize") >= 2) & (F.col("bsize") <= cfg.max_bucket_size)
        ),
        ["band", "bucket"],
    )
    pairs = _bucket_pairs(sized, cfg)
    # Hot-bucket short-circuit (round-6): the salted-grid branch exists for
    # boilerplate-heavy webtext, but when the (persisted, tiny) size frame
    # shows NO bucket above the cap — the common clean-corpus case — the
    # whole branch (join-back + grid explode + union) is dead plan weight:
    # several stages whose fixed cost dominates at small scale and whose
    # scans are pure waste at large. One cheap probe on the cached sizes
    # frame prunes it; the salted path is unchanged whenever any hot
    # bucket exists (pair set identical either way, pytest-pinned).
    has_hot = bool(
        sizes.filter(F.col("bsize") > cfg.max_bucket_size).limit(1).count()
    )
    if not has_hot:
        return pairs.distinct()
    hot = buckets.join(
        sizes.filter(
            (F.col("bsize") > cfg.max_bucket_size)
            & (F.col("bsize") <= cfg.salted_bucket_max)
        ),
        ["band", "bucket"],
    )
    return pairs.unionByName(_salted_pairs(hot, cfg)).distinct()


def _bucket_pairs(sized: DataFrame, cfg: MinHashConfig) -> DataFrame:
    """All (a < b) doc pairs within each size-capped bucket via the
    copartitioned self-join. (A collect_list + Catalyst pair-expansion
    variant was A/B'd in round 6 and did not beat this once
    preferSortMergeJoin=false let the planner pick a sort-free
    shuffled-hash/broadcast join — the SMJ sorts were the actual cost.)"""
    left = sized.select("band", "bucket", F.col("doc_id").alias("a"))
    right = sized.select("band", "bucket", F.col("doc_id").alias("b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )


def _salted_pairs(hot: DataFrame, cfg: MinHashConfig) -> DataFrame:
    """EXACT all-pairs inside oversized buckets via grid salting — see
    operators/salted_join.py for the decomposition and its exactness
    argument. Per-task pair work stays bounded by ~max_bucket_size^2
    regardless of bucket size; recall is unchanged (the pair set is
    bit-identical to an uncapped plain self-join, pinned by test)."""
    from .salted_join import grid_salted_self_pairs

    return grid_salted_self_pairs(hot, ["band", "bucket"], cfg.max_bucket_size)


def oversized_buckets(buckets: DataFrame, cfg: MinHashConfig) -> DataFrame:
    """Observability for the skew policy: (band, bucket, size, action)
    for every bucket beyond the one-reducer fast path — ``action`` is
    'salted' (exact pairs via the grid-salted join) or 'dropped'."""
    return (
        buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("size"))
        .filter(F.col("size") > cfg.max_bucket_size)
        .withColumn(
            "action",
            F.when(
                F.col("size") <= cfg.salted_bucket_max, F.lit("salted")
            ).otherwise(F.lit("dropped")),
        )
    )


def _driver_verify_pairs(
    pairs_pdf: pd.DataFrame,
    sh_a: pd.DataFrame,
    sh_b: pd.DataFrame,
    num: int,
    den: int,
) -> pd.DataFrame:
    """Driver twin of the verify joins: exact shingle-set Jaccard per
    candidate pair with the SAME integer threshold test and the same
    int/int -> double division for the reported jaccard. sh frames carry
    (doc_id, sh array) — shingle sets are already distinct."""
    map_a = dict(zip(sh_a["doc_id"], sh_a["sh"]))
    map_b = sh_b if sh_b is None else dict(zip(sh_b["doc_id"], sh_b["sh"]))
    if map_b is None:
        map_b = map_a
    rows = {"a": [], "b": [], "inter": [], "union": [], "jaccard": []}
    for a, b in zip(pairs_pdf["a"], pairs_pdf["b"]):
        sa = map_a.get(a)
        sb = map_b.get(b)
        if sa is None or sb is None:
            continue  # an empty-shingle doc never entered the bucket frame
        sa = np.asarray(sa, dtype=np.int64)
        sb = np.asarray(sb, dtype=np.int64)
        inter = len(np.intersect1d(sa, sb))
        union = len(sa) + len(sb) - inter
        if inter * den >= num * union:
            rows["a"].append(int(a))
            rows["b"].append(int(b))
            rows["inter"].append(inter)
            rows["union"].append(union)
            rows["jaccard"].append(inter / union)
    return pd.DataFrame(
        {
            "a": np.array(rows["a"], np.int64),
            "b": np.array(rows["b"], np.int64),
            "inter": np.array(rows["inter"], np.int32),
            "union": np.array(rows["union"], np.int32),
            "jaccard": np.array(rows["jaccard"], np.float64),
        }
    )


def verify_pairs_across(
    pairs: DataFrame,
    shingled_a: DataFrame,
    shingled_b: DataFrame,
    cfg: MinHashConfig,
) -> DataFrame:
    """Two-sided exact-Jaccard verification: side ``a`` ids resolve against
    ``shingled_a`` ONLY and side ``b`` against ``shingled_b`` — the two
    frames may use overlapping doc_id spaces (e.g. a new crawl batch vs a
    persisted index) without cross-contamination."""
    import os

    from fractions import Fraction

    frac = Fraction(cfg.jaccard_threshold).limit_denominator(1_000_000)
    num, den = frac.numerator, frac.denominator

    # Driver fast path (round-6): when the candidate pairs are already
    # driver-resident (the LSH driver path fired) and the pair count is
    # modest, pull the shingle frames (cached — they fed the signature
    # kernel) and verify in numpy: the two joins, their broadcasts and the
    # verify stage collapse into bounded pulls + a local relation.
    # Integer threshold + int/int double division are computed identically,
    # so the edge set AND the reported jaccard are bit-equal (pinned by
    # test). Above the pair/row guards or when the memo is absent, the
    # distributed joins below run unchanged.
    pairs_pdf = getattr(pairs, "_driver_pairs_pdf", None)
    verify_max = int(
        os.environ.get("SPARK_GRAFT_VERIFY_DRIVER_MAX", str(1 << 16))
    )
    if pairs_pdf is not None and len(pairs_pdf) <= verify_max:
        from ..plans.caching import probe_rows

        row_guard = int(
            os.environ.get("SPARK_GRAFT_LSH_DRIVER_MAX", str(1 << 22))
        )
        sh_a = probe_rows(shingled_a.select("doc_id", "sh"), row_guard)
        if sh_a is not None:
            sh_b = (
                None
                if shingled_b is shingled_a
                else probe_rows(shingled_b.select("doc_id", "sh"), row_guard)
            )
            if shingled_b is shingled_a or sh_b is not None:
                edges_pdf = _driver_verify_pairs(
                    pairs_pdf, sh_a, sh_b, num, den
                )
                out = pairs.sparkSession.createDataFrame(
                    edges_pdf,
                    "a long, b long, inter int, `union` int, jaccard double",
                )
                # memoized for neardup_clusters' driver CC fast path
                out._driver_edges_pdf = edges_pdf
                return out
    sa = shingled_a.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    sb = shingled_b.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    j = (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            (F.size("sh_a") + F.size("sh_b")).alias("sz"),
        )
        .withColumn("union", F.col("sz") - F.col("inter"))
        .withColumn("jaccard", F.col("inter") / F.col("union"))
    )
    return j.filter(
        F.col("inter") * F.lit(den) >= F.lit(num) * F.col("union")
    ).select("a", "b", "inter", "union", "jaccard")


def verify_pairs(
    pairs: DataFrame, shingled: DataFrame, cfg: MinHashConfig
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs on the true shingle
    sets (removes LSH false positives): edges(a, b, inter, union, jaccard).

    The threshold test is exact integer arithmetic (inter * den >= num *
    union with num/den the rational form of the threshold), so a pair at
    exactly the threshold cannot flip on float rounding — the DuckDB
    cluster oracle uses the same integer comparison.
    """
    return verify_pairs_across(pairs, shingled, shingled, cfg)


def candidate_pairs_across(
    buckets_a: DataFrame,
    buckets_b: DataFrame,
    cfg: MinHashConfig,
    copartition: bool = True,
) -> DataFrame:
    """Distinct (a, b) candidate pairs ACROSS two corpora from shared LSH
    buckets — the doc-level analogue of the reference's across-similar
    substring runs (main.rs:962-1158): corpus-A ids never pair with each
    other, only with corpus-B ids (train-vs-eval contamination shape).

    Only buckets present in BOTH corpora matter (inner join of the two
    size frames). Skew policy mirrors ``candidate_pairs``: buckets whose
    sides both fit ``max_bucket_size`` cross-join in one reducer task;
    buckets up to ``salted_bucket_max`` per side go through the exact
    bipartite block grid (salted_join.grid_salted_cross_pairs); larger
    ones are dropped (observable via ``oversized_buckets`` per side).
    """
    import os

    from ..plans.caching import probe_rows, scoped_persist
    from .salted_join import (
        driver_bucket_cross_pairs,
        grid_salted_cross_pairs,
    )

    # Size-adaptive driver fast path (round-6): same design as
    # candidate_pairs — both bucket frames under the guard collapse the
    # joint-size agg, both join-backs, the cross-join and the salted grid
    # into two bounded pulls + one numpy pass with the identical distinct
    # pair set. Above either guard or the pair budget, the distributed
    # plan runs unchanged from the same persisted frames.
    driver_max = int(os.environ.get("SPARK_GRAFT_LSH_DRIVER_MAX", str(1 << 22)))
    pair_cap = int(
        os.environ.get("SPARK_GRAFT_LSH_DRIVER_PAIR_MAX", str(1 << 22))
    )
    if driver_max > 0:
        raw_a = scoped_persist(buckets_a)
        raw_b = scoped_persist(buckets_b)
        pdf_a = probe_rows(raw_a, driver_max)
        pdf_b = probe_rows(raw_b, driver_max) if pdf_a is not None else None
        if pdf_a is not None and pdf_b is not None:
            pairs_pdf = driver_bucket_cross_pairs(
                pdf_a,
                pdf_b,
                ["band", "bucket"],
                cfg.salted_bucket_max,
                pair_cap,
            )
            if pairs_pdf is not None:
                raw_a.unpersist(blocking=False)
                raw_b.unpersist(blocking=False)
                out = buckets_a.sparkSession.createDataFrame(
                    pairs_pdf, "a long, b long"
                )
                out._driver_pairs_pdf = pairs_pdf  # see candidate_pairs
                return out
        buckets_a, buckets_b = raw_a, raw_b  # persisted for the plans below

    if copartition:
        buckets_a = buckets_a.repartition("band", "bucket")
        buckets_b = buckets_b.repartition("band", "bucket")
    buckets_a = scoped_persist(buckets_a)
    buckets_b = scoped_persist(buckets_b)
    na = buckets_a.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("na"))
    nb = buckets_b.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("nb"))
    # joint is tiny (bucket-overlap keys only) but feeds the plain AND hot
    # branches — persist it so the two size aggs run once (round-6)
    joint = scoped_persist(na.join(nb, ["band", "bucket"]))
    cap, smax = cfg.max_bucket_size, cfg.salted_bucket_max
    plain_keys = joint.filter((F.col("na") <= cap) & (F.col("nb") <= cap))
    pa = buckets_a.join(plain_keys.select("band", "bucket"), ["band", "bucket"])
    pb = buckets_b.join(plain_keys.select("band", "bucket"), ["band", "bucket"])
    plain = (
        pa.select("band", "bucket", F.col("doc_id").alias("a"))
        .join(pb.select("band", "bucket", F.col("doc_id").alias("b")),
              ["band", "bucket"])
        .select("a", "b")
    )
    # hot-bucket short-circuit (round-6, same as candidate_pairs)
    has_hot = bool(
        joint.filter((F.col("na") > cap) | (F.col("nb") > cap)).limit(1).count()
    )
    if not has_hot:
        return plain.distinct()
    hot_keys = joint.filter(
        ((F.col("na") > cap) | (F.col("nb") > cap))
        & (F.col("na") <= smax)
        & (F.col("nb") <= smax)
    ).select("band", "bucket", "na", "nb")
    ha = buckets_a.join(hot_keys, ["band", "bucket"])
    hb = buckets_b.join(hot_keys, ["band", "bucket"])
    salted = grid_salted_cross_pairs(ha, hb, ["band", "bucket"], cap)
    return plain.unionByName(salted).distinct()


def near_duplicate_edges(
    docs: DataFrame,
    cfg: MinHashConfig,
    text_col: str = "text",
    copartition: bool = True,
) -> DataFrame:
    """documents -> verified near-duplicate edges (a, b, jaccard).

    ``shingled`` is persisted: it feeds the signature path AND both sides
    of the Jaccard verify, and tokenize+shingle is the most expensive
    Catalyst stage of the pipeline — uncached it re-executes >= 3x
    (measured as the dominant cost of the round-1 bench). MEMORY_AND_DISK
    so an executor that can't hold its slice spills instead of recomputing.
    """
    from ..plans.caching import scoped_persist

    shingled = scoped_persist(doc_shingles(docs, cfg, text_col))
    sigs = minhash_signatures(shingled, cfg)
    pairs = candidate_pairs(lsh_buckets(sigs, cfg), cfg, copartition)
    return verify_pairs(pairs, shingled, cfg)


def near_duplicate_edges_across(
    docs_a: DataFrame,
    docs_b: DataFrame,
    cfg: MinHashConfig,
    text_col: str = "text",
    copartition: bool = True,
) -> DataFrame:
    """Verified near-duplicate pairs ACROSS two corpora:
    (a from docs_a, b from docs_b, inter, union, jaccard) with exact
    shingle-Jaccard >= cfg.jaccard_threshold — the doc-level
    train-vs-eval contamination check (the reference runs its
    across-similar mode for exactly this, wiki40b-vs-C4; main.rs:962).

    The two corpora may use overlapping doc_id spaces: side ``a`` ids
    resolve against docs_a only and ``b`` against docs_b
    (verify_pairs_across). Candidate generation touches only LSH buckets
    present in BOTH corpora, so the dominant cost scales with the bucket
    OVERLAP (the eval set's footprint), not the big side's size — the
    same asymmetry argument as across_dedup's key prefilter
    (BASELINE.md round-5 section).
    """
    from ..plans.caching import scoped_persist

    sha = scoped_persist(doc_shingles(docs_a, cfg, text_col))
    shb = scoped_persist(doc_shingles(docs_b, cfg, text_col))
    ba = lsh_buckets(minhash_signatures(sha, cfg), cfg)
    bb = lsh_buckets(minhash_signatures(shb, cfg), cfg)
    pairs = candidate_pairs_across(ba, bb, cfg, copartition)
    return verify_pairs_across(pairs, sha, shb, cfg)

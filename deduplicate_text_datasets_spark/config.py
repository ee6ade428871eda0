"""Engine configuration.

Mirrors the reference's CLI knobs (src/main.rs:78-168) plus the NearDup /
scale parameters mandated by BASELINE.json. All seeds are fixed constants so
every run is re-run deterministic (reference parity requirement).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Fixed seeds — never derived from wall clock (determinism requirement).
MINHASH_SEED = 0x5EED_D00D
SIMHASH_SEED = 0x51A5_0001
ANN_SEED = 0xA771_0000

# Rolling-hash multipliers (odd => invertible mod 2^64). Two independent
# multipliers give a 128-bit window fingerprint; collision probability for
# n positions is ~n^2 / 2^128 — negligible at 10^14 positions.
ROLLHASH_X1 = 0x9E3779B97F4A7C15 | 1
ROLLHASH_X2 = 0xC2B2AE3D27D4EB4F | 1

# Reference document separator layout (scripts/load_dataset.py:57-61):
# each doc is prefixed with b"\xff\xff" + struct.pack("<I", uid) = 6 bytes.
SEP_BYTES = 6

# Production ExactSubstr shard width (the ExactSubstrConfig.shard_bytes
# default): shard text + fingerprint/SA working set (~25 bytes/byte) fits
# one executor core at 64 MiB. bench.py --stress runs at exactly this
# width so the recorded throughput reflects the production layout.
PRODUCTION_SHARD_BYTES = 64 * 1024 * 1024


@dataclass(frozen=True)
class ExactSubstrConfig:
    """ExactSubstr (suffix/window) dedup parameters.

    length_threshold: minimum duplicate span in bytes
        (reference default in walkthrough: 100 — README.md:114).
    frequency_threshold: emit clusters only with size > this
        (main.rs:914; default 0 => clusters of size >= 2).
    shard_bytes: target bytes of corpus text per shard. Each shard's
        buffer (text + fingerprint arrays, ~25 bytes/byte) must fit one
        executor core; 64 MiB => ~1.6 GiB working set. Tests use small
        values to force many shards.
    overlap_bytes: trailing bytes replicated from the next shard so every
        owned position's length-L window (and any point query) is fully
        resident — the reference's HACKSIZE design
        (scripts/make_suffix_array.py:23,47; main.rs:1208-1216).
    with_separators: emulate the reference's on-disk corpus layout
        (6-byte \\xff\\xff+uid prefix per doc). Keeps byte offsets
        reference-comparable and prevents cross-document window matches.
    """

    length_threshold: int = 100
    frequency_threshold: int = 0
    shard_bytes: int = PRODUCTION_SHARD_BYTES
    overlap_bytes: int = 1024
    with_separators: bool = True

    def __post_init__(self) -> None:
        if self.overlap_bytes < self.length_threshold - 1:
            raise ValueError(
                "overlap_bytes must be >= length_threshold - 1 so every owned "
                "position's window is resident (HACKSIZE invariant, "
                "make_suffix_array.py:23)"
            )


@dataclass(frozen=True)
class MinHashConfig:
    """NearDup MinHash+LSH parameters (Lee et al. 2021 §NearDup).

    Defaults: 5-word shingles, 128 permutations banded 32x4. Collision
    probability for a true Jaccard-0.8 pair is 1-(1-0.8^4)^32 ≈ 1-5e-8,
    comfortably above the recall >= 0.99 target (BASELINE.json); the lower
    (1/32)^(1/4) ≈ 0.42 threshold admits extra candidates that the exact
    Jaccard verify removes (cost, not correctness).
    """

    shingle_words: int = 5
    num_perm: int = 128
    bands: int = 32
    rows_per_band: int = 4
    jaccard_threshold: float = 0.8
    # Skew policy for hot LSH buckets (boilerplate-heavy webtext), two
    # thresholds (north_rule: "explicit salting of skewed LSH buckets"):
    #   size <= max_bucket_size          all-pairs in one reducer (fast path)
    #   size <= salted_bucket_max        EXACT all-pairs via a grid-salted
    #                                    self-join: k = ceil(size/cap) salt
    #                                    groups, each pair generated exactly
    #                                    once in one of k(k+1)/2 cells, so
    #                                    per-task pair work stays at the
    #                                    fast path's cap**2 bound while the
    #                                    recall-preserving ceiling rises 10x
    #   size >  salted_bucket_max        dropped with a logged counter
    #                                    (analogue of frequency_threshold
    #                                    main.rs:914) — total pair count is
    #                                    quadratic-in-size no matter how it
    #                                    is distributed, so truly degenerate
    #                                    buckets must cap somewhere; members
    #                                    still pair via other bands / the
    #                                    exact-dup path.
    max_bucket_size: int = 5000
    salted_bucket_max: int = 50_000

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError("bands * rows_per_band must equal num_perm")


@dataclass(frozen=True)
class SimHashConfig:
    """SimHash 64-bit fingerprints with Hamming-ball blocking
    (Charikar 2002; Manku et al. 2007 block-permutation scheme)."""

    bits: int = 64
    hamming_k: int = 3  # near-dup iff popcount(f1 ^ f2) <= k
    # k+1 blocks: any pair within Hamming distance k agrees on >= 1 block.
    @property
    def blocks(self) -> int:
        return self.hamming_k + 1


@dataclass(frozen=True)
class EngineConfig:
    exact: ExactSubstrConfig = field(default_factory=ExactSubstrConfig)
    minhash: MinHashConfig = field(default_factory=MinHashConfig)
    simhash: SimHashConfig = field(default_factory=SimHashConfig)


DEFAULT = EngineConfig()

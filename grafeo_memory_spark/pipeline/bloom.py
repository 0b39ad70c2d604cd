"""Portable Bloom-filter membership sketch for incremental corpus
curation: test 100 TB of new crawl against the *hashes of everything
already ingested* without joining (or even reading) the historical
corpus.

Shape at scale:

- **Build** is one explode (k positions per key) + one distinct — the
  collected result is bounded by ``min(n·k, m_bits)`` set positions,
  and the packed filter is ``m_bits/8`` bytes on the driver (a 1%-fpp
  filter for 10M keys is ~12 MB; for 100M keys ~115 MB — size it with
  :func:`bloom_parameters` and shard by key-range if you need more).
  This is the same bounded-model pattern as the IVF/PQ codebooks.
- **Query** is map-only pure codegen: the bitmap ships as ONE
  array<long> literal in the plan (no join, no shuffle, no Python) and
  each probe is k ``getbit`` tests. A miss is a guaranteed
  never-seen; hits go on to the exact (anti-join) tier — the classic
  two-tier incremental dedup: the Bloom pre-filter keeps the expensive
  tier's input to (new ∩ maybe-seen), typically a tiny fraction.

Hashes follow the repo's engine-portable convention
(``dedup.shingle_hash``: md5 → first 15 hex chars → 60-bit bigint), so
the pure-Python replay oracle in ``tests/test_bloom.py`` reproduces
positions bit-for-bit, and a DuckDB twin is
``('0x' || substr(md5(v || '#seed'), 1, 15))::BIGINT % m``.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.dedup import shingle_hash

__all__ = [
    "BloomFilter",
    "ShardedBloomFilter",
    "bloom_parameters",
    "bloom_build",
    "bloom_build_sharded",
    "bloom_might_contain",
    "bloom_filter_unseen",
    "MAX_M_BITS_DEFAULT",
]

#: seed stride separating the k hash functions (documented so the
#: oracle and any other engine can reproduce seeds as salt*1009 + i)
SEED_STRIDE = 1009

#: hard ceiling on a single filter's plan-literal size (2^30 bits =
#: 128 MiB packed ≈ the practical limit before plan serialization /
#: codegen stalls dominate; ~90M keys at 1% fpp). Larger builds must
#: go through :func:`bloom_build_sharded`.
MAX_M_BITS_DEFAULT = 1 << 30


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: optimal bits ``m = -n·ln(p)/ln(2)²`` (rounded
    up to a multiple of 64) and hash count ``k = m/n·ln(2)``."""
    if n_items <= 0:
        raise ValueError("n_items must be positive")
    if not 0 < fpp < 1:
        raise ValueError("fpp must be in (0, 1)")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


@dataclass
class BloomFilter:
    """Packed filter: ``words[i]`` holds bits ``64·i .. 64·i+63``
    (bit ``b`` of word ``b >> 6``). Plain ints → broadcasts as one
    plan literal."""

    m_bits: int
    k: int
    salt: int
    words: list[int]

    @staticmethod
    def positions(value: str, m_bits: int, k: int, salt: int) -> list[int]:
        """Driver-side replay of the k probe positions (tests /
        single-key probes): identical arithmetic to the Spark side."""
        out = []
        for i in range(k):
            seed = salt * SEED_STRIDE + i
            h = int(
                hashlib.md5(f"{value}#{seed}".encode()).hexdigest()[:15], 16
            )
            out.append(h % m_bits)
        return out

    def contains(self, value: str) -> bool:
        return all(
            (self.words[p >> 6] >> (p & 63)) & 1
            for p in self.positions(value, self.m_bits, self.k, self.salt)
        )


@dataclass
class ShardedBloomFilter:
    """Key-space-sharded filter for builds past the single-literal cap:
    shard = hash(key) % shards (seed disjoint from the probe seeds),
    each shard an independent :class:`BloomFilter` with identical
    (m_bits, k, salt). The Spark probe ships ONE array<array<bigint>>
    literal and indexes the outer array by the shard id — still
    map-only, still k getbit tests per row."""

    shards: list[BloomFilter]
    salt: int

    def __post_init__(self) -> None:
        # probes read (m_bits, k, salt) off shards[0]; heterogeneous
        # shards would silently misprobe (false negatives), so reject
        # them at construction (ADVICE r6)
        if not self.shards:
            raise ValueError("ShardedBloomFilter needs at least one shard")
        first = self.shards[0]
        for s in self.shards[1:]:
            if (s.m_bits, s.k, s.salt) != (first.m_bits, first.k, first.salt):
                raise ValueError(
                    "ShardedBloomFilter shards must share (m_bits, k, "
                    f"salt); shard 0 has {(first.m_bits, first.k, first.salt)}"
                    f" but another shard has {(s.m_bits, s.k, s.salt)}"
                )

    def contains(self, value: str) -> bool:
        seed = _shard_seed(self.salt)
        h = int(
            hashlib.md5(f"{value}#{seed}".encode()).hexdigest()[:15], 16
        )
        return self.shards[h % len(self.shards)].contains(value)


def _position_cols(col: Column, m_bits: int, k: int, salt: int) -> list[Column]:
    return [
        F.pmod(shingle_hash(col, salt * SEED_STRIDE + i), F.lit(m_bits))
        for i in range(k)
    ]


def _pack_words(m_bits: int, positions) -> list[int]:
    words = [0] * (m_bits // 64)
    for p in positions:
        words[p >> 6] |= 1 << (p & 63)
    # two's-complement signed so each word fits a Spark LongType literal
    # (Python >> is arithmetic, so `contains` reads bits unchanged)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def _shard_seed(salt: int) -> int:
    """Seed for shard routing — negative namespace, disjoint from the
    k probe seeds (which are all ``salt*SEED_STRIDE + i``, i >= 0)."""
    return -(salt * SEED_STRIDE + 1)


def bloom_build(
    df: DataFrame,
    col: str,
    *,
    n_items: int | None = None,
    fpp: float = 0.01,
    salt: int = 0,
    max_m_bits: int = MAX_M_BITS_DEFAULT,
) -> BloomFilter:
    """Build a filter over the distinct non-null values of ``col``.
    ``n_items`` sizes the filter (defaults to a count() of the input —
    pass the expected key cardinality to skip that job). One explode +
    distinct; the collect is the set-bit list, ≤ ``min(n·k, m_bits)``
    ints.

    Raises when the sized filter would exceed ``max_m_bits`` — an
    oversized filter rides the plan as a multi-hundred-MB literal and
    stalls plan serialization/codegen long before any OOM points at
    the cause. Use :func:`bloom_build_sharded` past the cap."""
    if n_items is None:
        n_items = df.select(col).where(F.col(col).isNotNull()).count()
    m_bits, k = bloom_parameters(max(n_items, 1), fpp)
    if m_bits > max_m_bits:
        import math as _math

        shards = _math.ceil(m_bits / max_m_bits)
        raise ValueError(
            f"bloom_build: n_items={n_items} at fpp={fpp} needs "
            f"m_bits={m_bits} (> max_m_bits={max_m_bits}, ~"
            f"{m_bits // (8 * 2**20)} MiB as a plan literal). Use "
            f"bloom_build_sharded(..., shards>={shards}) to split the "
            "key space, or raise fpp / shard by key-range yourself."
        )
    pos_rows = (
        df.where(F.col(col).isNotNull())
        .select(
            F.explode(
                F.array(*_position_cols(F.col(col).cast("string"), m_bits, k, salt))
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = _pack_words(m_bits, (r["pos"] for r in pos_rows))
    return BloomFilter(m_bits=m_bits, k=k, salt=salt, words=words)


def bloom_build_sharded(
    df: DataFrame,
    col: str,
    *,
    shards: int,
    n_items: int | None = None,
    fpp: float = 0.01,
    salt: int = 0,
    max_m_bits: int = MAX_M_BITS_DEFAULT,
) -> ShardedBloomFilter:
    """Build past the single-literal cap by hashing the key space into
    ``shards`` independent filters — ONE pass over the data (shard id +
    k positions per key, distinct, collect ≤ min(n·k, shards·m) pairs),
    each shard sized for n/shards keys. Probe cost is unchanged (the
    shard id picks the inner array); total literal size is the same
    m(n) bits but Spark serializes nested-array literals fine where one
    giant flat literal stalls codegen."""
    if shards < 1:
        raise ValueError("shards must be >= 1")
    if n_items is None:
        n_items = df.select(col).where(F.col(col).isNotNull()).count()
    per_shard = max(1, -(-max(n_items, 1) // shards))
    m_bits, k = bloom_parameters(per_shard, fpp)
    if m_bits > max_m_bits:
        raise ValueError(
            f"bloom_build_sharded: {per_shard} keys/shard still needs "
            f"m_bits={m_bits} > max_m_bits={max_m_bits}; raise shards"
        )
    c = F.col(col).cast("string")
    shard_col = F.pmod(shingle_hash(c, _shard_seed(salt)), F.lit(shards))
    pos_rows = (
        df.where(F.col(col).isNotNull())
        .select(
            shard_col.alias("shard"),
            F.explode(
                F.array(*_position_cols(c, m_bits, k, salt))
            ).alias("pos"),
        )
        .distinct()
        .collect()
    )
    by_shard: list[list[int]] = [[] for _ in range(shards)]
    for r in pos_rows:
        by_shard[r["shard"]].append(r["pos"])
    return ShardedBloomFilter(
        shards=[
            BloomFilter(
                m_bits=m_bits, k=k, salt=salt, words=_pack_words(m_bits, ps)
            )
            for ps in by_shard
        ],
        salt=salt,
    )


def bloom_might_contain(
    col: Column | str, bloom: BloomFilter | ShardedBloomFilter
) -> Column:
    """Codegen membership probe: true ⇒ maybe present (fpp-bounded),
    false ⇒ definitely absent. NULL input → false. The bitmap rides
    the plan as a single array<long> (or array<array<long>> for a
    sharded filter) literal; each probe is k getbit tests — map-only,
    no shuffle, no Python."""
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    if isinstance(bloom, ShardedBloomFilter):
        first = bloom.shards[0]
        # explicit cast as below; outer index = shard id
        nested = F.lit([s.words for s in bloom.shards]).cast(
            "array<array<bigint>>"
        )
        shard_ix = F.pmod(
            shingle_hash(c, _shard_seed(bloom.salt)),
            F.lit(len(bloom.shards)),
        ).cast("int")
        bits = F.element_at(nested, shard_ix + 1)
        m_bits, k, salt = first.m_bits, first.k, first.salt
    else:
        # explicit cast: an all-small-values words list would otherwise
        # infer a narrower element type and getbit would reject pos >= 32
        bits = F.lit(bloom.words).cast("array<bigint>")
        m_bits, k, salt = bloom.m_bits, bloom.k, bloom.salt
    checks = []
    for pos in _position_cols(c, m_bits, k, salt):
        word = F.element_at(bits, F.shiftright(pos, 6).cast("int") + 1)
        checks.append(F.getbit(word, pos.bitwiseAND(F.lit(63))) == 1)
    out = checks[0]
    for chk in checks[1:]:
        out = out & chk
    return F.when(c.isNull(), F.lit(False)).otherwise(out)


def bloom_filter_unseen(
    df: DataFrame, col: str, bloom: BloomFilter | ShardedBloomFilter
) -> DataFrame:
    """Keep only rows whose ``col`` is definitely NOT in the filter —
    the map-only first tier of incremental dedup (rows that pass are
    guaranteed new; rows dropped here are 'maybe seen' and belong in
    the exact anti-join tier)."""
    return df.where(~bloom_might_contain(col, bloom))

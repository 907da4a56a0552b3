"""Tiered result/table cache — the PSRAM allocator generalized (C1).

Reference ground truth: a big/slow PSRAM heap sits behind a small/fast
RAM cache, managed through an explicit allocator surface — Malloc /
Calloc / Realloc / Free / GetSize / GetAvailableBytes
(/root/reference/src/PicoPlusPsram.h:74-109, heap bring-up
PicoPlusPsram.cpp:14-29) — and the display driver keeps a 2,880-byte
RAM cache in front of the slow tier (/root/reference/README.md:3-6).

Spark-native translation: named DataFrames pinned at an explicit
storage tier. The tier ladder mirrors the board's memory hierarchy —

    hot  = MEMORY_ONLY         (pico RAM: fastest, smallest)
    warm = MEMORY_AND_DISK     (RAM cache in front of PSRAM: the default)
    cold = DISK_ONLY           (PSRAM/SD tier: big, slow, survives pressure)

Allocator-op mapping (SURVEY.md §2.A R5-R10):
    Malloc/Calloc      → pin(name, df, tier)        (eager materialize)
    Realloc            → resize(name, n_partitions) (re-layout in place)
    Free               → free(name)                 (unpersist)
    GetSize            → size_of(name)              (cached partitions/bytes)
    GetAvailableBytes  → available()                (executor storage headroom)

A cache hit is observable in the plan: a pinned relation re-enters
later queries as InMemoryTableScan (asserted in tests/test_cache.py),
the analog of the reference's RAM-cache read path. At 100 TB, `hot` is
for bounded dimensions and published snapshots; facts stay unpinned
(one-pass scans pollute the cache — the lesson of the reference's
uncached-alias write path, SinglePsramBuffer480x480.cpp:72-73).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

TIERS: dict[str, StorageLevel] = {
    "hot": StorageLevel.MEMORY_ONLY,
    "warm": StorageLevel.MEMORY_AND_DISK,
    "cold": StorageLevel.DISK_ONLY,
}


class CacheTiers:
    """Named, tier-pinned DataFrames with an explicit allocator surface."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._entries: dict[str, tuple[DataFrame, str]] = {}

    def pin(self, name: str, df: DataFrame, tier: str = "warm", eager: bool = True) -> DataFrame:
        """Malloc: pin `df` at `tier` under `name`. Eager by default so
        the first reader never pays the materialization (the reference
        allocates before the frame loop, not inside it)."""
        if tier not in TIERS:
            raise ValueError(f"unknown tier {tier!r}; tiers: {sorted(TIERS)}")
        if name in self._entries:
            raise KeyError(f"{name!r} already pinned; free() it first")
        df = df.persist(TIERS[tier])
        if eager:
            df.count()
        self._entries[name] = (df, tier)
        return df

    def get(self, name: str) -> DataFrame:
        return self._entries[name][0]

    def tier_of(self, name: str) -> str:
        return self._entries[name][1]

    def resize(self, name: str, n_partitions: int) -> DataFrame:
        """Realloc: re-layout a pinned relation across `n_partitions`
        and re-pin at the same tier (coalesce when shrinking — no
        shuffle; repartition when growing)."""
        df, tier = self._entries[name]
        cur = df.rdd.getNumPartitions()
        resized = df.coalesce(n_partitions) if n_partitions < cur else df.repartition(n_partitions)
        del self._entries[name]
        df.unpersist()
        return self.pin(name, resized, tier=tier)

    def free(self, name: str) -> None:
        """Free: release the pinned relation (blocking, so the memory is
        actually back before the next pin — lwmem frees are immediate)."""
        df, _ = self._entries.pop(name)
        df.unpersist(blocking=True)

    def size_of(self, name: str) -> dict[str, int]:
        """GetSize: cached partition count and in-memory bytes of one
        pinned relation, from the JVM block-manager master."""
        df, _ = self._entries[name]
        rdd = df.rdd
        info = {"partitions": rdd.getNumPartitions(), "memory_bytes": 0}
        jsc = self.spark.sparkContext._jsc.sc()
        for r in jsc.getRDDStorageInfo():
            if r.id() == rdd.id():
                info["memory_bytes"] = int(r.memSize())
                break
        return info

    def available(self) -> dict[str, int]:
        """GetAvailableBytes: storage-memory headroom summed over
        executors (max on-heap storage minus what caches occupy)."""
        jsc = self.spark.sparkContext._jsc.sc()
        status = jsc.getExecutorMemoryStatus()
        it = status.iterator()
        total_max, total_free = 0, 0
        while it.hasNext():
            kv = it.next()
            total_max += int(kv._2()._1())
            total_free += int(kv._2()._2())
        return {"max_bytes": total_max, "free_bytes": total_free}

    def names(self) -> list[str]:
        return sorted(self._entries)
